package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2A/§2B plus the
  * training-data pipeline operators); `oracleSql` carries a DuckDB
  * equivalent for every SQL-expressible entry.
  */
object SparkEntry {

  /** All query packs, concatenated. Order matters only for docs. */
  def allDefs: Seq[QueryDef] =
    _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.Relational2.defs ++
      _root_.graft.queries.Relational3.defs ++
      _root_.graft.queries.IngestPack.defs ++
      _root_.graft.queries.TrainingOps.defs ++
      _root_.graft.queries.PipelinePack.defs ++
      _root_.graft.queries.AdvancedOps.defs ++
      _root_.graft.queries.CurationPack.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue by nation — 3-way fact join + broadcast dim + agg.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    allDefs.find(_.name == "q_join_multiway").get.run(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
