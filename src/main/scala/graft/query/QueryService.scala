package graft.query

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.io.Writer

/** Query passthrough + streaming result encoders (SURVEY §2A A9-A11,
  * A14). The reference trims the SQL (whitespace + trailing ';',
  * /root/reference/pkg/util/sql.go:9-13), hands it verbatim to the
  * backend, and streams the encoded result without ever materializing
  * it. Spark analog: `spark.sql` → `toLocalIterator` (one partition at
  * a time on the driver, executors stream) → incremental encoder.
  */
object QueryService {

  /** pkg/util/sql.go:9-13: TrimSpace, drop one trailing ';', trim again. */
  def cleanQuery(sql: String): String = {
    val t = sql.trim
    (if (t.endsWith(";")) t.dropRight(1) else t).trim
  }

  def query(spark: SparkSession, sql: String): DataFrame =
    spark.sql(cleanQuery(sql))

  /** Single JSON array, rows comma-spliced as they stream
    * (duckdb/query.go:15-116 / clickhouse/query.go:24-70). */
  def writeJson(df: DataFrame, out: Writer): Unit = {
    out.write("[")
    var first = true
    val it = df.toJSON.toLocalIterator()
    while (it.hasNext) {
      if (!first) out.write(",")
      out.write(it.next())
      first = false
    }
    out.write("]")
  }

  /** One JSON object per line (FORMAT JSONEachRow analog). */
  def writeNdjson(df: DataFrame, out: Writer): Unit = {
    val it = df.toJSON.toLocalIterator()
    while (it.hasNext) { out.write(it.next()); out.write("\n") }
  }

  /** CSV with header row; NULL renders as the literal `null`
    * (postgres/query.go:139-197 writes %v-stringified values and
    * `null` at :176). Quotes only when the value needs escaping. */
  def writeCsv(df: DataFrame, out: Writer): Unit = {
    val cols = df.columns
    out.write(cols.map(csvCell).mkString(","))
    out.write("\n")
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row: Row = it.next()
      var i = 0
      val sb = new StringBuilder
      while (i < cols.length) {
        if (i > 0) sb.append(',')
        sb.append(csvCell(stringify(row.get(i))))
        i += 1
      }
      out.write(sb.toString)
      out.write("\n")
    }
  }

  private def stringify(v: Any): String = v match {
    case null                => "null"
    case b: Array[Byte]      => java.util.Base64.getEncoder.encodeToString(b)
    // list/struct/map cells render DuckDB-CSV-style: [a, b] / {x, y} /
    // {k=v} — comma-separated, so the cell gets CSV-quoted as one value
    // collection.Seq, not scala.Seq: Row.get hands back mutable
    // ArraySeq, which the 2.13 immutable-Seq alias would miss
    case s: collection.Seq[_] => s.map(stringify).mkString("[", ", ", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => s"${stringify(k)}=${stringify(x)}" }
        .mkString("{", ", ", "}")
    case r: Row              =>
      r.toSeq.map(stringify).mkString("{", ", ", "}")
    case other               => other.toString
  }

  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
