package graft

import graft.sources.GraftCatalog
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Measured table statistics (VERDICT r14 #5): a raw parquet scan
  * plans on COMPRESSED bytes, so a high-compression warehouse table
  * can sit far under `autoBroadcastJoinThreshold` on disk while its
  * decoded form is 10–100× the executor budget — the planner then
  * static-broadcasts it, which at fleet scale is aggregate TBs of
  * transfer and an OOM per executor. The catalog records footer-true
  * (rows, decoded bytes) at publish and [[GraftCatalog.read]]
  * installs them as table-level statistics; these tests pin the whole
  * chain: sidecar accuracy, planner-visible stats, and the broadcast
  * decision itself (with the stats sidecar as the ONLY variable). */
class TableStatsSpec extends SparkTestBase {

  private def fixture() = {
    val tmp = Files.createTempDirectory("tstats").toString
    val cat = new GraftCatalog(spark, s"$tmp/warehouse")
    cat.ensureTable("db", "t")
    cat.addColumns("db", "t", Map("k" -> "int", "body" -> "string"))
    // unique 2 KB bodies (unique suffix defeats parquet dictionary
    // encoding; the constant prefix still compresses to almost
    // nothing) → decoded size ~10 MB, on-disk size ~100× smaller
    import spark.implicits._
    val rows = spark.range(5000).select(
      col("id").cast("int").as("k"),
      concat(lit("x" * 2000), col("id").cast("string")).as("body"))
    cat.append("db", "t", rows)
    (cat, tmp)
  }

  test("publish records footer-true rows and decoded bytes; read plans on them") {
    val (cat, _) = fixture()
    val Some((rows, bytes)) = cat.tableStats("db", "t")
    assert(rows == 5000L)
    val fileBytes = {
      import org.apache.hadoop.fs.{Path => HPath}
      val d = new HPath(s"${cat.root}/db/t/data")
      val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(d).filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    assert(bytes > 10L * fileBytes,
      s"decoded bytes ($bytes) must dwarf compressed file bytes ($fileBytes) on this data")
    val planned = cat.read("db", "t").queryExecution.optimizedPlan.stats
    assert(planned.sizeInBytes == BigInt(bytes),
      s"planner must see the measured decoded size, got ${planned.sizeInBytes}")
  }

  test("high-compression table does not broadcast past the threshold; without stats it would") {
    val (cat, _) = fixture()
    val Some((_, bytes)) = cat.tableStats("db", "t")
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      // threshold strictly between on-disk (~0.1 MB) and decoded (~10 MB)
      conf.set("spark.sql.autoBroadcastJoinThreshold", (bytes / 4).toString)
      conf.set("spark.sql.adaptive.enabled", "false") // static decision under test
      def joinPlan(df: org.apache.spark.sql.DataFrame): String = {
        val other = df.select(col("k").as("k2"), col("body").as("body2"))
        df.join(other, col("k") === col("k2")).queryExecution.executedPlan.toString
      }
      val withStats = joinPlan(cat.read("db", "t"))
      assert(!withStats.contains("BroadcastHashJoin"),
        s"measured stats must stop the static broadcast:\n$withStats")
      // negative control — the ONLY change is removing the stats
      // sidecar (the pre-r15 state): the same join static-broadcasts
      // off the compressed file size
      import org.apache.hadoop.fs.{Path => HPath}
      val sf = new HPath(s"${cat.root}/db/t/stats.json")
      sf.getFileSystem(spark.sessionState.newHadoopConf()).delete(sf, false)
      val withoutStats = joinPlan(cat.read("db", "t"))
      assert(withoutStats.contains("BroadcastHashJoin"),
        s"control: compressed-size stats should have broadcast here:\n$withoutStats")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
    }
  }

  test("redelivered publish does not double-count stats; rewrite heals from footers") {
    val tmp = Files.createTempDirectory("tstats2").toString
    val cat = new GraftCatalog(spark, s"$tmp/warehouse")
    cat.ensureTable("db", "t")
    cat.addColumns("db", "t", Map("k" -> "int"))
    import spark.implicits._
    cat.append("db", "t", Seq(1, 2, 3).toDF("k"), jobKey = Some("job-1"))
    val Some((r1, b1)) = cat.tableStats("db", "t")
    assert(r1 == 3L && b1 > 0L)
    // at-least-once redelivery of the SAME job: rows and stats converge
    cat.append("db", "t", Seq(1, 2, 3).toDF("k"), jobKey = Some("job-1"))
    assert(cat.tableStats("db", "t").contains((r1, b1)),
      "idempotent republish must not double-count stats")
    assert(cat.read("db", "t").count() == 3)
    // distinct job: adds
    cat.append("db", "t", Seq(4).toDF("k"), jobKey = Some("job-2"))
    val Some((r2, _)) = cat.tableStats("db", "t")
    assert(r2 == 4L)
    // rewrite recomputes from scratch (heals any drift)
    cat.compact("db", "t")
    val Some((r3, b3)) = cat.tableStats("db", "t")
    assert(r3 == 4L && b3 > 0L)
    assert(cat.read("db", "t").queryExecution.optimizedPlan.stats.rowCount.isEmpty ||
      cat.read("db", "t").queryExecution.optimizedPlan.stats.sizeInBytes == BigInt(b3))
  }

  test("two drivers appending concurrently: stats converge to the sum of all markers") {
    // The cross-driver story (ADVICE r15): each GraftCatalog instance
    // has its OWN per-table lock, so two instances over one warehouse
    // are two drivers — their stats.json read-modify-writes can race
    // and last-writer-win a stale VALUE. The ksum fingerprint makes
    // that loss detectable: the next tableStats read recomputes from
    // the commit markers' per-batch ledger and heals the sidecar.
    val tmp = Files.createTempDirectory("tstats3").toString
    val catA = new GraftCatalog(spark, s"$tmp/warehouse")
    val catB = new GraftCatalog(spark, s"$tmp/warehouse")
    catA.ensureTable("db", "t")
    catA.addColumns("db", "t", Map("k" -> "int"))
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(8)
    val gate = new CountDownLatch(1)
    val failures = new java.util.concurrent.atomic.AtomicInteger
    (0 until 8).foreach { i =>
      val cat = if (i % 2 == 0) catA else catB
      pool.submit(new Runnable { def run(): Unit = {
        gate.await()
        try cat.append("db", "t", Seq(i * 10 + 1, i * 10 + 2).toDF("k"),
          jobKey = Some(s"job-$i"))
        catch { case _: Throwable => failures.incrementAndGet() }
      }})
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.get() == 0, "all 8 concurrent appends must publish")
    // ground truth: the marker ledger (8 jobs × 2 rows), and the data
    assert(catA.read("db", "t").count() == 16)
    // a FRESH catalog instance (third driver) must read healed stats
    // equal to the sum of all markers, whatever the RMW races left
    val catC = new GraftCatalog(spark, s"$tmp/warehouse")
    val Some((rows, bytes)) = catC.tableStats("db", "t")
    assert(rows == 16L, s"stats must equal the marker sum, got $rows")
    assert(bytes > 0L)
    // and the heal is durable: the sidecar itself now carries the sum
    val Some((rows2, _)) = catA.tableStats("db", "t")
    assert(rows2 == 16L)
  }
}
