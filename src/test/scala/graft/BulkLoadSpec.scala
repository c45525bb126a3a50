package graft

import graft.sources.{BulkLoad, JdbcDestination}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Backend-native bulk-load paths (reference redshift/insert.go:80-140,
  * bigquery/insert.go:181-211): everything the zero-egress container
  * CAN verify — distributed NDJSON staging that round-trips, a
  * manifest that lists exactly the parts (all mandatory), native
  * ingest statements in the reference's exact shape, and the scale
  * property that one batch costs ONE warehouse statement however many
  * parts the parallel write produced. The live warehouse connection
  * is the only untested hop (the executor seam records instead). */
class BulkLoadSpec extends SparkTestBase {

  private def sampleDf = {
    import spark.implicits._
    spark.range(0, 100, 1, 4) // 4 partitions → several staged parts
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("s"),
        (col("id") % 2 === 0).as("flag"))
  }

  test("staging writes parallel NDJSON parts that round-trip, manifest lists them all") {
    val root = Files.createTempDirectory("bulk").toString
    val df = sampleDf
    val staged = BulkLoad.stage(df, root, "t", "b1")
    assert(staged.partUris.size > 1, "a 4-partition batch should stage as parallel parts")
    // round-trip: the staged NDJSON IS the batch
    val back = spark.read.schema(df.schema).json(staged.partUris: _*)
    assert(back.count() == 100)
    assert(back.orderBy("k").collect().toSeq == df.orderBy("k").collect().toSeq)
    // manifest: every part, all mandatory (a lost part must fail the
    // COPY, not silently load a prefix of the batch)
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(staged.manifestUri))), "UTF-8")
    val o = graft.functions.JValue.parseObject(manifest)
    import graft.functions.JValue._
    val entries = o.get("entries").collect { case JArr(es) => es }.get
    assert(entries.size == staged.partUris.size)
    val urls = entries.collect { case e: JObj =>
      (e.get("url").collect { case JStr(u) => u }.get,
        e.get("mandatory").collect { case JBool(b) => b }.get)
    }
    assert(urls.map(_._1) == staged.partUris.toVector)
    assert(urls.forall(_._2), "every manifest entry must be mandatory")
  }

  test("redshift COPY statement: reference shape, manifest form, s3a→s3 translation") {
    val sql = BulkLoad.redshiftCopy("public", "events",
      "s3a://bucket/stage/events/b1/manifest.json",
      "aws_access_key_id=AKIA;aws_secret_access_key=SECRET")
    // insert.go:122 shape + MANIFEST for the multi-part distributed write
    assert(sql == "COPY public.events FROM 's3://bucket/stage/events/b1/manifest.json' " +
      "CREDENTIALS 'aws_access_key_id=AKIA;aws_secret_access_key=SECRET' " +
      "FORMAT AS JSON 'auto' MANIFEST")
  }

  test("bigquery LOAD DATA statement: reference shape, lattice→BQ types, multi-uri") {
    val sql = BulkLoad.bigqueryLoad("ds.events",
      Seq("k" -> "int", "score" -> "float", "flag" -> "bool",
        "ts" -> "timestamp", "s" -> "string"),
      Seq("gs://b/stage/events/b1/part-0.json", "gs://b/stage/events/b1/part-1.json"))
    assert(sql == "LOAD DATA INTO ds.events (`k` INT64, `score` FLOAT64, `flag` BOOL, " +
      "`ts` TIMESTAMP, `s` STRING) FROM FILES ( format = 'JSON', " +
      "uris = ['gs://b/stage/events/b1/part-0.json', 'gs://b/stage/events/b1/part-1.json'] )")
  }

  test("bulkAppend: one native statement per batch, regardless of parts; unknown dialect refuses") {
    val root = Files.createTempDirectory("bulk2").toString
    val dest = new JdbcDestination(spark,
      s"jdbc:derby:memory:bulk${System.nanoTime()};create=true")
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    val staged = dest.bulkAppend("events", sampleDf, "redshift", root,
      credentials = "aws_iam_role=arn:aws:iam::1:role/load",
      exec = Some(issued += _))
    assert(issued.size == 1, s"one batch = ONE warehouse statement, got ${issued.size}")
    assert(issued.head.startsWith("COPY public.events FROM '"))
    assert(issued.head.contains("MANIFEST"))
    assert(issued.head.contains("aws_iam_role"))
    assert(staged.partUris.nonEmpty)
    // bigquery arm through the same seam
    issued.clear()
    dest.bulkAppend("events", sampleDf, "bigquery", root, exec = Some(issued += _))
    assert(issued.size == 1 && issued.head.startsWith("LOAD DATA INTO events ("))
    assert(issued.head.contains("`k` INT64") && issued.head.contains("`flag` BOOL"))
    intercept[IllegalArgumentException] {
      dest.bulkAppend("events", sampleDf, "sqlite", root, exec = Some(issued += _))
    }
  }

  test("appendBatched: the batched JDBC wire shape lands rows on a real engine") {
    val dest = new JdbcDestination(spark,
      s"jdbc:derby:memory:batch${System.nanoTime()};create=true")
    dest.appendBatched("batched_t", sampleDf.select(col("k"), col("s")), batchSize = 7)
    assert(dest.count("batched_t") == 100L)
  }
}
