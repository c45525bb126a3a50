package graft

import graft.functions.TypeLattice
import graft.sources.GraftCatalog
import graft.streaming.{SessionTracker, StreamingIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  test("file-source stream ingests NDJSON into a catalog table") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val srcDir = Files.createDirectories(java.nio.file.Paths.get(tmp, "src"))
    Files.writeString(srcDir.resolve("batch1.ndjson"),
      """{"user": "alice", "n": 1}
        |{"user": "bob", "n": 2}
        |""".stripMargin)

    val catalog = new GraftCatalog(spark, s"$tmp/wh")
    val types = Map("user" -> TypeLattice.String, "n" -> TypeLattice.Int)
    catalog.ensureTable("db", "s")
    catalog.addColumns("db", "s", types)

    val stream = StreamingIngest.streamNdjsonDir(spark, srcDir.toString,
      TypeLattice.toStructType(types))
    val q = StreamingIngest.ingestToCatalog(stream, catalog, "db", "s", s"$tmp/ckpt")
    q.awaitTermination(60000)

    val rows = catalog.read("db", "s").select("user", "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set("alice" -> 1L, "bob" -> 2L))

    // second file picked up by a fresh AvailableNow pass from the same
    // checkpoint (exactly-once file accounting)
    Files.writeString(srcDir.resolve("batch2.ndjson"), """{"user": "carol", "n": 3}""" + "\n")
    val q2 = StreamingIngest.ingestToCatalog(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, TypeLattice.toStructType(types)),
      catalog, "db", "s", s"$tmp/ckpt")
    q2.awaitTermination(60000)
    assert(catalog.read("db", "s").count() == 3)
  }

  test("streaming incremental dedup: micro-batches verdict against the static corpus") {
    val tmp = Files.createTempDirectory("graft-incdedup").toString
    val srcDir = Files.createDirectories(java.nio.file.Paths.get(tmp, "docs"))
    val shared = (1 to 60).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, shared + " ending one"),
      (2L, (100 to 160).map(i => s"e$i").mkString(" "))
    ).toDF("doc_id", "text")
    Files.writeString(srcDir.resolve("b1.ndjson"),
      s"""{"doc_id": 10, "text": "$shared ending two"}
         |{"doc_id": 11, "text": "${(200 to 260).map(i => s"n$i").mkString(" ")}"}
         |""".stripMargin)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val verdicts = scala.collection.mutable.Map[Long, (Boolean, Option[Long])]()
    val q = StreamingIngest.incrementalDedupStream(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, schema),
      corpus, "doc_id", "text", s"$tmp/ckpt",
      out => out.collect().foreach(r => verdicts.synchronized {
        verdicts(r.getLong(0)) =
          (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }))
    q.awaitTermination(60000)
    assert(verdicts(10L) == ((true, Some(1L))))
    assert(verdicts(11L) == ((false, None)))

    // a later file is a NEW trigger pass from the same checkpoint:
    // only the new batch is verdicted (exactly-once file accounting)
    verdicts.clear()
    Files.writeString(srcDir.resolve("b2.ndjson"),
      s"""{"doc_id": 12, "text": "$shared ending three"}""" + "\n")
    val q2 = StreamingIngest.incrementalDedupStream(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, schema),
      corpus, "doc_id", "text", s"$tmp/ckpt",
      out => out.collect().foreach(r => verdicts.synchronized {
        verdicts(r.getLong(0)) =
          (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }))
    q2.awaitTermination(60000)
    assert(verdicts.keySet == Set(12L))
    assert(verdicts(12L) == ((true, Some(1L))))
  }

  test("streaming ingest honors the table dedup policy across triggers") {
    val tmp = Files.createTempDirectory("graft-streampol").toString
    val srcDir = Files.createDirectories(java.nio.file.Paths.get(tmp, "src"))
    val catalog = new GraftCatalog(spark, s"$tmp/wh")
    val types = Map("text" -> TypeLattice.String, "tag" -> TypeLattice.String)
    catalog.ensureTable("db", "sdocs")
    catalog.addColumns("db", "sdocs", types)
    catalog.setDedupPolicy("db", "sdocs",
      graft.sources.GraftCatalog.DedupPolicy(textCol = "text", mode = "tag"))
    val shared = (1 to 50).map(i => s"sp$i").mkString(" ")
    Files.writeString(srcDir.resolve("b1.ndjson"),
      s"""{"text": "$shared one", "tag": "first"}""" + "\n")
    val schema = TypeLattice.toStructType(types)
    val q = StreamingIngest.ingestToCatalog(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, schema),
      catalog, "db", "sdocs", s"$tmp/ckpt")
    q.awaitTermination(60000)
    // second trigger re-delivers the same content with a new tag
    Files.writeString(srcDir.resolve("b2.ndjson"),
      s"""{"text": "$shared two", "tag": "second"}""" + "\n")
    val q2 = StreamingIngest.ingestToCatalog(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, schema),
      catalog, "db", "sdocs", s"$tmp/ckpt")
    q2.awaitTermination(60000)
    val rows = catalog.read("db", "sdocs").select("tag", "__is_dup")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map("first" -> false, "second" -> true), s"got $rows")
    val bands = spark.read.parquet(
      new org.apache.hadoop.fs.Path(catalog.dedupIndexDir("db", "sdocs"), "bands").toString)
    assert(bands.select("doc").distinct().count() == 1,
      "only the survivor joins the index")
  }

  test("streaming incremental dedup: prebuilt index + parameter passthrough") {
    // the production shape: the index is materialized once (here:
    // built + persisted; in production: written/reloaded as tables)
    // under a NON-default convention (md5 family, 16 bands), and the
    // stream must probe it with the SAME parameters — a mismatched
    // family would see no candidates at all.
    val tmp = Files.createTempDirectory("graft-incdedup2").toString
    val srcDir = Files.createDirectories(java.nio.file.Paths.get(tmp, "docs"))
    val shared = (1 to 60).map(i => s"m$i").mkString(" ")
    val corpus = Seq(
      (1L, shared + " ending one"),
      (2L, (100 to 160).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
    val idx = graft.operators.Dedup.buildMinhashIndex(
      corpus, "doc_id", "text", shingleK = 5, numHashes = 128,
      bands = 16, useMd5 = true)
    val pinned = graft.operators.Dedup.MinhashIndex(
      idx.bands.persist(), idx.sigs.persist())
    Files.writeString(srcDir.resolve("b1.ndjson"),
      s"""{"doc_id": 20, "text": "$shared ending two"}
         |{"doc_id": 21, "text": "${(300 to 360).map(i => s"y$i").mkString(" ")}"}
         |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val verdicts = scala.collection.mutable.Map[Long, (Boolean, Option[Long])]()
    val q = StreamingIngest.incrementalDedupStream(
      StreamingIngest.streamNdjsonDir(spark, srcDir.toString, schema),
      pinned, "doc_id", "text", s"$tmp/ckpt",
      out => out.collect().foreach(r => verdicts.synchronized {
        verdicts(r.getLong(0)) =
          (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }),
      bands = 16, useMd5 = true)
    q.awaitTermination(60000)
    pinned.bands.unpersist(); pinned.sigs.unpersist()
    assert(verdicts(20L) == ((true, Some(1L))))
    assert(verdicts(21L) == ((false, None)))
  }

  test("watermarked tumbling window drops too-late rows, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = StreamingIngest.tumblingCounts(
      mem.toDF().toDF("ts", "k"), "ts", "10 minutes", "5 minutes", "k")

    val q = counts.writeStream.format("memory")
      .queryName("tumbling_out").outputMode("update").start()

    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:01:00"), "a"), (t("2024-01-01 10:02:00"), "a"),
      (t("2024-01-01 10:11:00"), "b"))
    q.processAllAvailable()
    // advance the watermark far past the first window
    mem.addData((t("2024-01-01 11:00:00"), "c"))
    q.processAllAvailable()
    // this row is an hour late — beyond the 5 min watermark → dropped
    mem.addData((t("2024-01-01 10:03:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("tumbling_out")
      .select("window_start", "k", "n")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    // the 10:00 window for 'a' must have count 2 from the first batch
    // and NO update with count 3 afterwards
    val aRows = out.filter(r => r._2 == "a")
    assert(aRows.map(_._3).max == 2, s"late row leaked into state: ${aRows.toSeq}")
  }

  test("streaming dedup drops redelivered rows within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingIngest.dedupStream(
      mem.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", "id")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData((t("2024-01-01 10:00:00"), 1L, "a"), (t("2024-01-01 10:00:30"), 2L, "b"))
    q.processAllAvailable()
    // exact redelivery of id=1 (same ts) plus a fresh row
    mem.addData((t("2024-01-01 10:00:00"), 1L, "a"), (t("2024-01-01 10:01:00"), 3L, "c"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("flatMapGroupsWithState session tracker closes sessions on gap") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[SessionTracker.Event]
    val q = SessionTracker.track(mem.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    def e(u: Long, ts: String, k: String) =
      SessionTracker.Event(u, Timestamp.valueOf(ts), k)
    mem.addData(
      e(1, "2024-01-01 10:00:00", "view"), e(1, "2024-01-01 10:02:00", "click"),
      e(1, "2024-01-01 10:30:00", "view"), // > 5 min gap → closes first session
      e(2, "2024-01-01 10:00:00", "view"))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_out")
      .filter(col("closed")).select("userId", "nEvents")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(closed.toSeq == Seq((1L, 2)), s"got ${closed.toSeq}")
  }

  test("session windows merge events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val sessions = StreamingIngest.sessionCounts(
      mem.toDF().toDF("ts", "k"), "ts", "5 minutes", "1 minute", "k")
    val q = sessions.writeStream.format("memory")
      .queryName("session_out").outputMode("complete").start()

    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (t("2024-01-01 10:00:00"), "u"), (t("2024-01-01 10:03:00"), "u"),
      (t("2024-01-01 10:06:00"), "u"), // still chained: gaps < 5 min
      (t("2024-01-01 10:30:00"), "u")) // new session
    q.processAllAvailable()
    q.stop()

    val out = spark.table("session_out").select("session_start", "n")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).sortBy(_._1)
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out.head._2 == 3 && out.last._2 == 1)
  }
}
