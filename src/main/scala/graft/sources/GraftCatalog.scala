package graft.sources

import graft.functions.TypeLattice
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Parquet-backed table catalog with the reference's additive-only
  * schema evolution (SURVEY §2A A5): every table is a directory of
  * parquet part-files plus a JSON schema sidecar; `addColumns` is
  * ALTER TABLE ADD COLUMN IF NOT EXISTS — existing columns never change
  * type or disappear (/root/reference/pkg/destinations/duckdb/insert.go:12-26).
  *
  * Reads apply the sidecar schema over the whole directory: part files
  * written before a column existed simply yield NULL for it (Spark's
  * by-name parquet schema evolution), exactly matching the backend
  * behavior the reference relies on.
  *
  * Scale: a table is a plain parquet dir — at warehouse scale the same
  * layout partitions/buckets by any column via `df.write.partitionBy`;
  * nothing here assumes a single file or a single node.
  */
final class GraftCatalog(val spark: SparkSession, val root: String) {

  private def tableDir(db: String, table: String): Path = Paths.get(root, db, table)
  private def dataDir(db: String, table: String): Path = tableDir(db, table).resolve("data")
  private def schemaFile(db: String, table: String): Path = tableDir(db, table).resolve("schema.json")

  /** Seed column the reference creates every table with
    * (pkg/destinations/duckdb/insert.go:72-76). */
  val RowIdColumn = "__row_id"

  def tableExists(db: String, table: String): Boolean = Files.exists(schemaFile(db, table))

  def listTables(db: String): Seq[String] = {
    val d = Paths.get(root, db)
    if (!Files.exists(d)) Nil
    else Files.list(d).iterator().asScala.filter(p => Files.exists(p.resolve("schema.json")))
      .map(_.getFileName.toString).toSeq.sorted
  }

  /** CREATE TABLE IF NOT EXISTS with the __row_id seed column. */
  def ensureTable(db: String, table: String): Unit = synchronized {
    if (!tableExists(db, table)) {
      Files.createDirectories(dataDir(db, table))
      writeSchema(db, table, Vector(RowIdColumn -> TypeLattice.Int))
    }
  }

  /** ALTER TABLE ADD COLUMN IF NOT EXISTS, per column. Conflicting
    * re-adds keep the existing type (backend semantics). */
  def addColumns(db: String, table: String, types: Map[String, String]): Unit = synchronized {
    ensureTable(db, table)
    val existing = readSchemaSeq(db, table)
    val have = existing.map(_._1).toSet
    val added = types.toSeq.sortBy(_._1).filterNot { case (n, _) => have.contains(n) }
    if (added.nonEmpty) writeSchema(db, table, existing ++ added)
  }

  def schemaOf(db: String, table: String): Map[String, String] = readSchemaSeq(db, table).toMap

  def structOf(db: String, table: String): StructType =
    StructType(readSchemaSeq(db, table).map { case (n, t) =>
      StructField(n, TypeLattice.toSparkType(t), nullable = true)
    })

  /** Append a batch: project to catalog columns (missing → NULL), cast
    * to catalog types, write parquet part-files. */
  def append(db: String, table: String, df: DataFrame): Unit = {
    val target = structOf(db, table)
    val present = df.columns.toSet
    val projected = df.select(target.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    projected.write.mode("append").parquet(dataDir(db, table).toString)
  }

  /** Read the table under its full sidecar schema. */
  def read(db: String, table: String): DataFrame = {
    val dir = dataDir(db, table)
    val struct = structOf(db, table)
    val hasData = Files.exists(dir) &&
      Files.list(dir).iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    if (hasData) spark.read.schema(struct).parquet(dir.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], struct)
  }

  /** Small-file compaction (maintenance op). The rotation-based ingest
    * path writes one parquet part per NDJSON batch — at warehouse scale
    * that accretes tiny files until scan PLANNING (listing + footer
    * reads) dominates query time. One distributed job rewrites the
    * data dir into ~targetFileBytes parts, then swaps directories via
    * the Hadoop FS client (same code path on file://, s3a://, gs://).
    *
    * Not transactional, like the reference's backends: a reader racing
    * the two renames can transiently miss the table; serialize
    * compactions through the control-plane job queue in deployments.
    * Returns (files before, files after). */
  def compact(db: String, table: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = synchronized {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = spark.sparkContext.hadoopConfiguration
    val dataPath = new HPath(dataDir(db, table).toString)
    val fs = dataPath.getFileSystem(conf)
    if (!fs.exists(dataPath)) return (0, 0)
    def parquetParts(p: HPath) =
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    val parts = parquetParts(dataPath)
    if (parts.length <= 1) return (parts.length, parts.length)
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new HPath(tableDir(db, table).resolve("data.compacting").toString)
    val old = new HPath(tableDir(db, table).resolve("data.old").toString)
    fs.delete(tmp, true); fs.delete(old, true)
    read(db, table).repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    fs.rename(dataPath, old)
    fs.rename(tmp, dataPath)
    fs.delete(old, true)
    (parts.length, parquetParts(dataPath).length)
  }

  /** Register all tables of a db as temp views for SQL passthrough. */
  def registerViews(db: String): Unit =
    listTables(db).foreach(t => read(db, t).createOrReplaceTempView(t))

  def columns(db: String, table: String): Seq[(String, String)] = readSchemaSeq(db, table)

  // sidecar format: JSON array of {"name":..,"type":..} preserving order
  private def writeSchema(db: String, table: String, cols: Seq[(String, String)]): Unit = {
    val json = cols.map { case (n, t) =>
      s"""{"name":${quote(n)},"type":${quote(t)}}"""
    }.mkString("[", ",", "]")
    Files.writeString(schemaFile(db, table), json)
  }

  private def readSchemaSeq(db: String, table: String): Vector[(String, String)] = {
    import graft.functions.JValue, graft.functions.JValue._
    if (!tableExists(db, table)) return Vector.empty
    JValue.parse(Files.readString(schemaFile(db, table))) match {
      case JArr(items) => items.map {
        case o: JObj =>
          val n = o.get("name").collect { case JStr(s) => s }.get
          val t = o.get("type").collect { case JStr(s) => s }.get
          n -> t
        case other => throw new IllegalStateException(s"bad schema entry: $other")
      }
      case other => throw new IllegalStateException(s"bad schema sidecar: $other")
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
