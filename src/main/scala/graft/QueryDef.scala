package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query. Column names and
  * types must match between the two — the driver sorts columns by name
  * and hash-compares values (see the builder contract).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  def noOracle(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
