package graft

import graft.sources.{BulkLoad, JdbcDestination}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** PUT-at-close object-store semantics over the local FS: a file
  * created through this scheme is INVISIBLE at its final path until
  * the writer's close() — bytes accumulate at a hidden in-flight path
  * and land via one rename, the all-or-nothing contract of an S3/GCS
  * PUT. Used to assert [[BulkLoad.stage]]'s commit ORDER (manifest
  * strictly after all parts durable), which plain local-FS tests
  * can't distinguish from luck. */
class MockPutFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FSDataOutputStream, Path}
  override def getUri: java.net.URI = java.net.URI.create("mockput://bucket/")

  private def putAtClose(f: Path, open: Path => FSDataOutputStream): FSDataOutputStream = {
    val tmp = new Path(f.getParent, s".inflight-${f.getName}")
    val out = open(tmp)
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = out.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
      override def flush(): Unit = out.flush()
      override def close(): Unit = {
        out.close() // durable first...
        MockPutFileSystem.this.delete(f, false)
        if (!MockPutFileSystem.this.rename(tmp, f)) // ...then visible
          throw new java.io.IOException(s"PUT publish failed: $tmp -> $f")
      }
    }, null)
  }

  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : FSDataOutputStream =
    putAtClose(f, t => super.create(t, permission, true, bufferSize,
      replication, blockSize, progress))

  // RawLocalFileSystem short-circuits this overload straight to an
  // in-place stream (it never reaches the permission variant above) —
  // without this override the final path is visible EMPTY mid-write
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : FSDataOutputStream =
    putAtClose(f, t => super.create(t, true, bufferSize, replication,
      blockSize, progress))

  override def createNonRecursive(f: Path,
                                  permission: org.apache.hadoop.fs.permission.FsPermission,
                                  flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                                  bufferSize: Int, replication: Short, blockSize: Long,
                                  progress: org.apache.hadoop.util.Progressable)
      : FSDataOutputStream =
    putAtClose(f, t => super.createNonRecursive(t, permission,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE),
      bufferSize, replication, blockSize, progress))
}

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
    assert(sql == "LOAD DATA INTO `ds.events` (`k` INT64, `score` FLOAT64, `flag` BOOL, " +
      "`ts` TIMESTAMP, `s` STRING) FROM FILES ( format = 'JSON', " +
      "uris = ['gs://b/stage/events/b1/part-0.json', 'gs://b/stage/events/b1/part-1.json'] )")
  }

  test("identifier injection is rejected on every native-statement surface") {
    // BigQuery arm: backticks in a user-ingested column name would
    // break out of the identifier — rejected, not passed through
    intercept[IllegalArgumentException] {
      BulkLoad.bigqueryLoad("ds.events",
        Seq("x` STRING) FROM FILES (uris=['gs://evil']); --" -> "string"), Seq("gs://b/p"))
    }
    intercept[IllegalArgumentException] {
      BulkLoad.bigqueryLoad("ds.ev`nts", Seq("k" -> "int"), Seq("gs://b/p"))
    }
    // Redshift arm already routed through ident(); keep it pinned
    intercept[IllegalArgumentException] {
      BulkLoad.redshiftCopy("public", "t\";drop table x", "s3://m", "c")
    }
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
    assert(issued.size == 1 && issued.head.startsWith("LOAD DATA INTO `events` ("))
    assert(issued.head.contains("`k` INT64") && issued.head.contains("`flag` BOOL"))
    intercept[IllegalArgumentException] {
      dest.bulkAppend("events", sampleDf, "sqlite", root, exec = Some(issued += _))
    }
    // table doubles as a staging path component AND a statement
    // identifier: both escape shapes refuse before any work
    intercept[IllegalArgumentException] {
      dest.bulkAppend("../escape", sampleDf, "redshift", root, exec = Some(issued += _))
    }
    intercept[IllegalArgumentException] {
      dest.bulkAppend("ev`nts", sampleDf, "bigquery", root, exec = Some(issued += _))
    }
  }

  test("object-store contract: a visible manifest never names missing parts") {
    // VERDICT r15 #6: stage() writes the manifest LAST via fs.create —
    // correct on PUT-at-close stores, asserted here over a scheme that
    // ENFORCES put-at-close (invisible until close, then one rename).
    // A concurrent reader polls the staging root the whole time: the
    // instant any manifest is visible, every part it names must be
    // fully visible too. Reordering stage()'s manifest write ahead of
    // the part writes fails this test deterministically.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.mockput.impl", classOf[MockPutFileSystem].getName)
    val backing = Files.createTempDirectory("mockput-stage")
    val root = s"mockput://bucket$backing/stage"
    import org.apache.hadoop.fs.{Path => HPath}
    val fs = new HPath(root).getFileSystem(hconf)

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[String](null)
    val manifestsSeen = new java.util.concurrent.atomic.AtomicInteger
    val reader = new Thread(() => {
      import graft.functions.JValue._
      while (!stop.get() && failure.get() == null) {
        try {
          // manual recursive walk: listFiles() materializes
          // LocatedFileStatus, whose lazy permission load rejects
          // non-file URI schemes on RawLocalFileSystem. The committer's
          // _temporary scratch is not part of the visibility contract
          // and is torn down concurrently — skip it, and treat a
          // subtree vanishing mid-walk as a raced rename, not a
          // finding (manifest verification below stays strict).
          def walk(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] =
            try fs.listStatus(p).toSeq.flatMap { st =>
              if (st.getPath.getName == "_temporary") Nil
              else if (st.isDirectory) walk(st.getPath) else Seq(st) }
            catch { case _: java.io.IOException => Nil }
          val it = walk(new HPath(root)).iterator
          while (it.hasNext) {
            val st = it.next()
            if (st.getPath.getName == "manifest.json") {
              val in = fs.open(st.getPath)
              val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
              if (body.isEmpty || !body.endsWith("]}")) {
                failure.compareAndSet(null,
                  s"torn/empty manifest visible at ${st.getPath} (len=${st.getLen}): '$body'")
              } else {
              val entries = graft.functions.JValue.parseObject(body)
                .get("entries").collect { case JArr(es) => es }.getOrElse(Vector.empty)
              if (entries.isEmpty) failure.compareAndSet(null,
                s"visible manifest ${st.getPath} parsed empty: $body")
              entries.foreach {
                case e: JObj =>
                  val url = e.get("url").collect { case JStr(u) => u }.get
                  val p = new HPath(url)
                  if (!fs.exists(p) || fs.getFileStatus(p).getLen == 0)
                    failure.compareAndSet(null,
                      s"manifest ${st.getPath} names missing/empty part $url")
                case other => failure.compareAndSet(null, s"bad entry: $other")
              }
              manifestsSeen.incrementAndGet()
              }
            }
          }
        } catch {
          case _: java.io.FileNotFoundException => () // listing raced a rename
          case t: Throwable => failure.compareAndSet(null,
            t.toString + "\n" + t.getStackTrace.take(8).mkString("\n"))
        }
      }
    })
    reader.start()
    try {
      (1 to 4).foreach { i =>
        val staged = BulkLoad.stage(sampleDf, root, "events", s"b$i")
        assert(staged.partUris.forall(_.startsWith("mockput://")),
          "staging must run through the object-store scheme under test")
      }
      Thread.sleep(300) // let the reader sweep the final state too
    } finally { stop.set(true); reader.join(10000) }
    assert(failure.get() == null, String.valueOf(failure.get()))
    assert(manifestsSeen.get() > 0, "the reader must actually have observed manifests")
  }

  test("appendBatched: the batched JDBC wire shape lands rows on a real engine") {
    val dest = new JdbcDestination(spark,
      s"jdbc:derby:memory:batch${System.nanoTime()};create=true")
    dest.appendBatched("batched_t", sampleDf.select(col("k"), col("s")), batchSize = 7)
    assert(dest.count("batched_t") == 100L)
  }
}
