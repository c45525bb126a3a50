package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.hadoop.fs.{Path => HPath}

/** Backend-native bulk-load paths (SURVEY §2A "what's missing" #1).
  *
  * The reference feeds warehouses through their NATIVE ingest door,
  * not the JDBC row path: Redshift gets an S3 `COPY`
  * (/root/reference/pkg/destinations/redshift/insert.go:80-140),
  * BigQuery a GCS `LOAD DATA`
  * (/root/reference/pkg/destinations/bigquery/insert.go:181-211),
  * ClickHouse a native protocol batch
  * (/root/reference/pkg/destinations/clickhouse/insert.go:203-276).
  * The row path is 10-100× slower at bulk size: every row crosses one
  * JDBC connection; the native path moves files in parallel and the
  * warehouse ingests them with its own cluster.
  *
  * Spark-first re-expression: the batch is a DataFrame, so STAGING is
  * one distributed write — N part files land on the blob store in
  * parallel (s3a://, gs://, anything the Hadoop FS layer resolves) —
  * and INGEST is ONE statement naming all of them (Redshift's
  * `MANIFEST` form; BigQuery's multi-uri `FROM FILES`). Per-batch
  * warehouse work is one statement regardless of row count or
  * executor count, which is what survives a 1000-executor fleet: the
  * reference uploads one LOCAL file per batch, this uploads the same
  * batch as parallel parts.
  *
  * ClickHouse needs no statement builder here: its native-batch shape
  * (PrepareBatch/Append/Send) is exactly what Spark's JDBC sink
  * already does per partition (PreparedStatement.addBatch /
  * executeBatch, `batchsize` option) — see
  * [[JdbcDestination.append]]; the knob surfaces as `batchSize`.
  *
  * Zero-egress boundary (honest scope): statement construction,
  * staging layout, manifest contents and the one-statement-per-batch
  * property are built and spec'd here; the final `stmt.execute` runs
  * through the same executor seam [[JdbcDestination.withConn]] uses,
  * and is exercised against a recording executor in the spec — the
  * live warehouse round-trip is the one thing this container cannot
  * test.
  */
object BulkLoad {

  /** One staged batch: NDJSON part URIs + a Redshift-style manifest
    * object listing them (written last — a reader of the manifest
    * never sees missing parts, the same commit order the catalog's
    * markers use). */
  final case class Staged(table: String, batchId: String,
                          partUris: Seq[String], manifestUri: String)

  /** Distributed NDJSON staging: `df.write.json` IS newline-delimited
    * JSON (the format all three reference backends ingest), written by
    * every executor in parallel under `<stagingUri>/<table>/<batchId>/`.
    * The manifest is one atomic PUT after all parts exist. */
  def stage(df: DataFrame, stagingUri: String, table: String,
            batchId: String): Staged = {
    val dir = new HPath(new HPath(stagingUri), s"$table/$batchId")
    df.write.mode("overwrite").json(dir.toString)
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(p => fs.makeQualified(p).toString).toSeq
    require(parts.nonEmpty, s"staging wrote no parts under $dir")
    // Redshift manifest format (COPY ... MANIFEST): every entry
    // mandatory so a missing part fails the load instead of silently
    // ingesting a prefix of the batch.
    val manifest = new HPath(dir, "manifest.json")
    val body = parts.map(u => s"""{"url":${jq(u)},"mandatory":true}""")
      .mkString("""{"entries":[""", ",", "]}")
    val out = fs.create(manifest, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    Staged(table, batchId, parts, fs.makeQualified(manifest).toString)
  }

  /** Redshift `COPY ... MANIFEST`: one statement ingests every staged
    * part (insert.go:122 builds the single-file form; MANIFEST is the
    * documented multi-file generalization a distributed writer needs).
    * Credentials ride in the statement exactly as the reference's do —
    * callers that prefer IAM pass `credentials = "aws_iam_role=..."`. */
  def redshiftCopy(schemaName: String, table: String, manifestUri: String,
                   credentials: String): String =
    s"COPY ${ident(schemaName)}.${ident(table)} FROM ${q(s3Uri(manifestUri))} " +
      s"CREDENTIALS ${q(credentials)} FORMAT AS JSON 'auto' MANIFEST"

  /** BigQuery `LOAD DATA INTO table (cols) FROM FILES (...)`
    * (insert.go:181-211): the column list carries the gateway's
    * 4-type-lattice types mapped to BQ types, multi-uri form for the
    * staged parts. */
  def bigqueryLoad(table: String, columns: Seq[(String, String)],
                   partUris: Seq[String]): String = {
    val cols = columns.map { case (n, t) => s"${bqIdent(n)} ${bqType(t)}" }.mkString(", ")
    val uris = partUris.map(u => q(gsUri(u))).mkString(", ")
    s"LOAD DATA INTO ${bqIdent(table)} ($cols) FROM FILES ( format = 'JSON', uris = [$uris] )"
  }

  /** BigQuery identifier: backtick-quoted, with backticks/control
    * chars REJECTED rather than escaped — column names arrive from
    * user-ingested JSON schemas, so this is an injection boundary
    * exactly like [[ident]] on the Redshift arm. The whole dotted
    * `project.dataset.table` path quotes as one identifier, which
    * BigQuery accepts. */
  private def bqIdent(s: String): String = {
    require(s.nonEmpty && !s.contains('`') && !s.contains('\\') &&
      !s.exists(c => c < ' '), s"unsafe identifier: $s")
    "`" + s + "`"
  }

  /** The reference's jsonType→BQ mapping (bigquery jsonTypeToBQType):
    * the 4-type inference lattice (graft.functions.TypeLattice) plus
    * the timestamp the ingest path stamps. */
  private def bqType(lattice: String): String = lattice.toLowerCase match {
    case "int"              => "INT64"
    case "float" | "double" => "FLOAT64"
    case "bool" | "boolean" => "BOOL"
    case "timestamp"        => "TIMESTAMP"
    case _                  => "STRING"
  }

  /** Hadoop speaks `s3a://`, Redshift's COPY wants `s3://` — translate
    * at the statement boundary only (staging stays on the FS layer). */
  private def s3Uri(u: String): String =
    if (u.startsWith("s3a://") || u.startsWith("s3n://"))
      "s3://" + u.substring(u.indexOf("://") + 3)
    else u

  /** Same seam for GCS: Hadoop's `gs://` happens to match BigQuery's. */
  private def gsUri(u: String): String = u

  private def ident(s: String): String = {
    require(!s.contains("\"") && !s.contains(";") && s.nonEmpty,
      s"unsafe identifier: $s")
    s
  }

  /** SQL string literal. */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** JSON string literal (manifest bodies). */
  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
