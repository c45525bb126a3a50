package graft

import graft.operators.ScalableWindow
import org.apache.spark.sql.functions._

/** The distributed rank path must match Spark's window operator
  * exactly — including on full-key TIES (peers), where percent_rank
  * uses the peer group's min row number and cume_dist its max. */
class ScalableWindowSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map { i =>
      ("F" + (i % 3), (rnd.nextInt(40) + 1).toDouble, (i % 700).toLong, (i % 7).toLong)
    } ++ Seq.fill(25)(("F0", 7.0, 13L, 3L)) // planted peer group
    rows.toDF("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .repartition(8)
  }

  /** Force the distributed arm (the size-adaptive switch would take
    * the plain window at spec scale). */
  private def distributedArm[T](body: => T): T = {
    spark.conf.set("graft.window.singleTaskLimitBytes", "0")
    try body finally spark.conf.unset("graft.window.singleTaskLimitBytes")
  }

  test("groupRowNumber: dense 1..n per group, order respected") {
    val df = corpus
    val rn = distributedArm(ScalableWindow.groupRowNumber(df, Seq("l_returnflag"),
      Seq("l_quantity", "l_orderkey", "l_linenumber"), "rn", 8))
    val byGroup = rn.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), min("rn").as("mn"), max("rn").as("mx"),
        countDistinct("rn").as("d"))
      .collect()
    byGroup.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("n")
        && r.getAs[Long]("d") == r.getAs[Long]("n"), s"dense per group: $r")
    }
    // order: rn must be monotone in the sort key within each group
    val viol = rn.as("a").join(rn.as("b"),
        col("a.l_returnflag") === col("b.l_returnflag") &&
          col("a.rn") === col("b.rn") - 1)
      .filter(struct(col("a.l_quantity"), col("a.l_orderkey"), col("a.l_linenumber")) >
        struct(col("b.l_quantity"), col("b.l_orderkey"), col("b.l_linenumber")))
      .count()
    assert(viol == 0, "consecutive row numbers follow the sort order")
  }

  test("size-adaptive arm: plain window under the limit, distributed above, equal results") {
    val df = corpus
    val args = (Seq("l_returnflag"),
      Seq("l_quantity", "l_orderkey", "l_linenumber"), "rn", 8)
    // spec-scale input is far below the default 256 MiB limit → the
    // small arm: a single plain Window, no range exchange
    val small = ScalableWindow.groupRowNumber(df, args._1, args._2, args._3, args._4)
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(!smallPlan.contains("__gw_pid") && !smallPlan.contains("RangePartitioning"),
      s"small arm must be the plain window:\n$smallPlan")
    // forced-big (limit 0) → the distributed two-pass scheme
    val big = distributedArm(
      ScalableWindow.groupRowNumber(df, args._1, args._2, args._3, args._4))
    assert(big.queryExecution.executedPlan.toString.contains("__gw_pid"),
      "distributed arm must be the two-pass scheme")
    val key = Seq("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val diff = small.select((key :+ "rn").map(col): _*)
      .exceptAll(big.select((key :+ "rn").map(col): _*)).count()
    assert(diff == 0, "both arms must agree row-for-row")
  }

  test("groupedPrefixSum equals the single-task window form") {
    import org.apache.spark.sql.expressions.Window
    val df = corpus.withColumn("v", (col("l_orderkey") % 13 + 1).cast("long"))
    val got = distributedArm(ScalableWindow.groupedPrefixSum(df, Seq("l_returnflag"),
      Seq("l_quantity", "l_orderkey", "l_linenumber"), "v", "cum", 8))
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, 0)
    val expect = df.withColumn("cum", sum("v").over(w))
    val key = Seq("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val diff = got.select((key.map(col) :+ col("cum")): _*)
      .exceptAll(expect.select((key.map(col) :+ col("cum")): _*)).count()
    assert(diff == 0, "distributed prefix sum must equal the window operator")
    assert(got.count() == df.count())
  }

  test("distributed exact percentiles equal the builtin aggregate, nulls and ties included") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // ties (coarse ints), a continuous column, NULLs, and a group with
    // a single row (interpolation degenerates to that row)
    val rows = (1 to 4000).map { i =>
      ("G" + (i % 3), (rnd.nextInt(12) + 1).toDouble,
        if (i % 11 == 0) Option.empty[Double] else Some(rnd.nextDouble() * 1000.0))
    } :+ (("G9", 42.0, Some(17.5))) :+ (("GN", 1.0, Option.empty[Double]))
    val df = rows.toDF("g", "qty", "price").repartition(8)
    val specs = Seq(("p50", "qty", 0.5), ("p90", "qty", 0.9),
      ("p25_price", "price", 0.25), ("p99_price", "price", 0.99))
    val viaBuiltin = ScalableWindow.exactPercentiles(df, "g", specs, Long.MaxValue)
    val distributed = ScalableWindow.exactPercentiles(df, "g", specs, 0L)
    val a = viaBuiltin.orderBy("g").collect()
    val b = distributed.orderBy("g").collect()
    assert(a.length == b.length && a.length == 5)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getString(0) == rb.getString(0))
      (1 to 4).foreach { i =>
        assert(ra.isNullAt(i) == rb.isNullAt(i),
          s"${ra.getString(0)} col$i null mismatch: $ra vs $rb")
        if (!ra.isNullAt(i)) {
          val (va, vb) = (ra.getDouble(i), rb.getDouble(i))
          assert(math.abs(va - vb) < 1e-9, s"${ra.getString(0)} col$i: $va vs $vb")
        }
      }
    }
    // the all-null-price group yields NULL price percentiles both ways
    val gn = b.find(_.getString(0) == "GN").get
    assert(gn.isNullAt(3) && gn.isNullAt(4), s"all-null group: $gn")
    // the distributed plan must not contain the builtin percentile's
    // object-hash aggregate (the 100 TB OOM hazard it exists to avoid)
    val plan = distributed.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), s"builtin percentile leaked into:\n$plan")
  }

  test("reliable-checkpoint variant: ranks survive a recompute after unpersist") {
    // localCheckpoint blocks live on executors: lose them and the
    // recompute re-samples the range boundaries, shearing the offsets.
    // The reliable variant reads the pinned partitioning back from the
    // checkpoint dir, so dropping every in-memory block and re-running
    // the SAME plan must still yield the identical dense ranking.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val df = corpus
    val rn = distributedArm(ScalableWindow.groupRowNumber(df, Seq("l_returnflag"),
      Seq("l_quantity", "l_orderkey", "l_linenumber"), "rn", 8,
      checkpoint = d => d.checkpoint()))
    val first = rn.collect().map(_.toSeq).toSet
    // simulate executor-loss-and-recompute: drop every cached block
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val second = rn.collect().map(_.toSeq).toSet
    assert(first == second, "ranks must be identical after block loss")
    val dense = rn.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), countDistinct("rn").as("d"),
        min("rn").as("mn"), max("rn").as("mx")).collect()
    dense.foreach { r =>
      assert(r.getAs[Long]("mn") == 1L && r.getAs[Long]("mx") == r.getAs[Long]("n")
        && r.getAs[Long]("d") == r.getAs[Long]("n"), s"dense per group: $r")
    }
  }

  test("graft.checkpoint.reliable=true flips every consumer to reliable checkpoints") {
    // One config switch: the default checkpoint seam
    // (graft.util.Checkpoints.pin) must write to the checkpoint dir
    // instead of executor-local blocks, with identical results.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rel-ckpt").toString
    spark.conf.set("graft.checkpoint.reliable", "true")
    spark.conf.set("graft.checkpoint.dir", ckpt)
    def filesUnder(dir: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(
          new java.net.URI(dir).getPath match { case "" | null => dir; case p => p }))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
    try {
      // a prior test may already have set a context checkpoint dir —
      // the seam keeps it; baseline BEFORE construction (the eager
      // checkpoint fires while the plan is built)
      val preexisting = spark.sparkContext.getCheckpointDir
      val before = preexisting.map(filesUnder).getOrElse(0L)
      val rn = distributedArm(ScalableWindow.groupRowNumber(corpus,
        Seq("l_returnflag"), Seq("l_quantity", "l_orderkey", "l_linenumber"),
        "rn", 8))
      val effective = spark.sparkContext.getCheckpointDir.getOrElse(ckpt)
      val written = filesUnder(effective)
      assert(written > before, "reliable checkpoint must persist to the checkpoint dir")
      val dense = rn.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), countDistinct("rn").as("d")).collect()
      dense.foreach(r => assert(r.getAs[Long]("d") == r.getAs[Long]("n")))
    } finally {
      spark.conf.unset("graft.checkpoint.reliable")
      spark.conf.unset("graft.checkpoint.dir")
    }
  }

  test("topKPerGroup equals the window rank-filter form, ties on value included") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 4000).map { i =>
      ((i % 331).toLong, (rnd.nextInt(50) + 1).toDouble, i.toLong)
    } ++ Seq((5L, 50.0, 9001L), (5L, 50.0, 9002L)) // value ties → tie-key order
    val df = rows.toDF("g", "v", "id").repartition(8)
    val heap = ScalableWindow.topKPerGroup(df, Seq("g"), "v", "id", 3, "rn")
      .select("g", "v", "id", "rn").collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).sorted
    val win = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rn") <= 3)
      .select("g", "v", "id", "rn").collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).sorted
    assert(heap.toList === win.toList)
  }

  test("topKPerGroup: groups smaller than k emit all rows, ranked") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 10L), (1L, 1.0, 11L), (2L, 5.0, 20L))
      .toDF("g", "v", "id")
    val out = ScalableWindow.topKPerGroup(df, Seq("g"), "v", "id", 3, "rn")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sorted.toList
    assert(out === List((1L, 1.0, 11L, 2L), (1L, 2.0, 10L, 1L), (2L, 5.0, 20L, 1L)))
  }

  test("distributed rank-family path equals the window operator, ties included") {
    val df = corpus.cache()
    try {
      val viaWindow = ScalableWindow.analyticRankQuery(df, Long.MaxValue)
      val distributed = ScalableWindow.analyticRankQuery(df, 0L)
      val cols = viaWindow.columns.map(col)
      assert(viaWindow.exceptAll(distributed).isEmpty &&
        distributed.exceptAll(viaWindow).isEmpty,
        "both physical strategies must produce the identical multiset")
      assert(distributed.count() == df.count())
    } finally df.unpersist()
  }

  test("unique-order fast path (orderIsUnique) equals the window operator") {
    // Unique (l_orderkey, l_linenumber) per row — the lineitem-PK
    // precondition under which the big arm may skip peer recovery
    // (rank ≡ rn ≡ cume rows). Equivalence against the plain window
    // pins that skipping the peers aggregation + self-join changes
    // nothing when the precondition holds.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 5000).map { i =>
      ("F" + (i % 3), (rnd.nextInt(40) + 1).toDouble, (i / 7).toLong, (i % 7).toLong)
    }
    val df = rows.toDF("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      .repartition(8).cache()
    try {
      val viaWindow = ScalableWindow.analyticRankQuery(df, Long.MaxValue)
      val fast = ScalableWindow.analyticRankQuery(df, 0L, orderIsUnique = true)
      assert(viaWindow.exceptAll(fast).isEmpty &&
        fast.exceptAll(viaWindow).isEmpty,
        "unique-order fast path must produce the identical multiset")
      assert(fast.count() == df.count())
    } finally df.unpersist()
  }
}
