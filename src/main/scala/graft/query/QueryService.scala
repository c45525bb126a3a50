package graft.query

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, InsertIntoStatement}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import java.io.Writer
import java.nio.file.Paths

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

  /** Raised when a tenant query breaks out of its sandbox; the server
    * maps it to 403. */
  final class QueryRejected(msg: String) extends RuntimeException(msg)

  /** Tenant-scoped passthrough. The reference hands each tenant an
    * isolated backend database, so passthrough SQL can only touch that
    * tenant's data; a shared Spark session needs the same wall rebuilt:
    *
    *   1. statements that execute eagerly inside `spark.sql` (DDL/DML
    *      commands, `INSERT ... DIRECTORY`, SET) are rejected BEFORE
    *      execution — a tenant's surface is read-only SQL, writes go
    *      through the ingest/copy APIs;
    *   2. every file-source scan in the analyzed plan must stay under
    *      `allowedRoots` (the tenant's own warehouse dir) — otherwise
    *      ``json.`/any/path` `` could read other tenants' parquet.
    *
    * Admin keys skip this via plain `query()` (parity with DuckDB's
    * unrestricted `read_ndjson_auto`).
    */
  def tenantQuery(spark: SparkSession, sql: String,
                  allowedRoots: Seq[String]): DataFrame = {
    val cleaned = cleanQuery(sql)
    val parsed = spark.sessionState.sqlParser.parsePlan(cleaned)
    // collectWithSubqueries everywhere: plain collect/foreach do NOT
    // descend into subquery-expression plans, and a scalar subquery
    // (`select (select count(*) from parquet.\`/other\`)`) is exactly
    // where an attacker would hide a foreign scan — caught by spec.
    val writes = parsed.collectWithSubqueries {
      case c: Command => c
      case i: InsertIntoStatement => i
      case d: InsertIntoDir => d
    }
    if (writes.nonEmpty)
      throw new QueryRejected("only read queries are allowed for tenant keys")
    val allowed = allowedRoots.map(r => Paths.get(r).normalize.toString)
    def pathOk(p: String): Boolean = {
      val norm = Paths.get(p).normalize.toString
      allowed.exists(a => norm == a || norm.startsWith(a + "/"))
    }
    // Parse-time gate on ``format.`/path` `` scans: rejecting here means
    // analysis never touches the foreign files (schema inference reads
    // footers during planning, which would both leak data and surface
    // as an opaque 500 instead of a clean denial).
    val fileFormats = Set("json", "parquet", "csv", "orc", "text", "textfile",
      "binaryfile", "avro")
    val badPaths = parsed.collectWithSubqueries {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
          fileFormats.contains(u.multipartIdentifier.head.toLowerCase) &&
          !pathOk(u.multipartIdentifier(1)) =>
        u.multipartIdentifier(1)
    }
    if (badPaths.nonEmpty)
      throw new QueryRejected(s"file scan outside tenant scope: ${badPaths.head}")
    val df = spark.sql(cleaned)
    // Defense in depth: whatever route a file source took into the
    // analyzed plan — subquery plans included — its resolved root
    // paths must sit inside the scope.
    val outside = df.queryExecution.analyzed.collectWithSubqueries {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.filterNot(p => pathOk(p.toUri.getPath))
        case _ => Nil
      }
    }.flatten
    if (outside.nonEmpty)
      throw new QueryRejected(
        s"file scan outside tenant scope: ${outside.head}")
    // reflect()/java_method() invoke arbitrary static JVM methods —
    // System.getenv, properties, … — an engine-host capability no
    // isolated tenant backend exposes.
    val reflected = df.queryExecution.analyzed.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case r: org.apache.spark.sql.catalyst.expressions.CallMethodViaReflection => r
      })
    }.flatten
    if (reflected.nonEmpty)
      throw new QueryRejected("reflect()/java_method() is not available to tenant keys")
    df
  }

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
