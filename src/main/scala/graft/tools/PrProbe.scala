package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness for the PageRank arm choice past the
  * driver limit — the PageRank twin of [[CcProbe]]'s synthetic mode.
  *
  * Builds a clique-dense synthetic graph (32-node cliques chained into
  * 100-clique components, the same generator shape CcProbe used to
  * earn the CC family its over-limit evidence) at ≥2× the 25M-edge
  * driver limit, then:
  *
  *   1. runs the distributed Pregel arm with the rank side on the
  *      BROADCAST bus (node count under `graft.pagerank.broadcastNodes`);
  *   2. runs it again with broadcast forced OFF — the shuffled-join
  *      mode a 100-TB graph with billions of nodes lands in;
  *   3. runs the packed-primitive DRIVER arm as the equality oracle
  *      (limit raised; maxResultSize lifted to 8g for the oracle
  *      collect only — the production arms stay under the default);
  *
  * and requires the three (node, degree, pr) fingerprints identical.
  * The fixed-point integer arithmetic makes that equality exact —
  * no float tolerance, any divergence is a real bug.
  *
  * args: [millions of edges = 50] [iters = 5]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val millions = args.headOption.map(_.toInt).getOrElse(50)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    // The production arms (1, 2) run under the DEFAULT 1g
    // maxResultSize so a regression that funnels a large collect into
    // the driver fails loudly here instead of being masked; only the
    // driver-oracle arm (3) gets a fresh session with the limit
    // raised — the core conf is fixed at context start, so "raise it
    // for the oracle only" means a second context.
    def buildSession(maxResult: Option[String]): SparkSession = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        .config("spark.ui.enabled", "false")
      maxResult.foreach(b.config("spark.driver.maxResultSize", _))
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = buildSession(None)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
    }
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("node"), col("degree"), col("pr")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    val k = 32 // clique size: k(k-1)/2 = 496 edges per clique
    val nCliques = millions * 1000000L / 496L
    val nNodes = nCliques * k
    // Deterministic generator (range-based, no randomness) so the
    // graph regenerated in the oracle arm's fresh session is
    // bit-identical to the one the distributed arms ran on.
    def gen(s: SparkSession): (org.apache.spark.sql.DataFrame,
                               org.apache.spark.sql.DataFrame) = {
      val offsets = (for (a <- 0 until k; b <- 0 until k if a < b)
        yield (a, b)).toSeq
      import s.implicits._
      val offsetsDf = offsets.toDF("i", "j")
      val cliqueEdges = s.range(nCliques).toDF("c")
        .crossJoin(broadcast(offsetsDf))
        .select((col("c") * k + col("j")).as("u"), (col("c") * k + col("i")).as("v"))
      val chains = s.range(1, nCliques).toDF("c")
        .filter(pmod(col("c"), lit(100)) =!= 0)
        .select((col("c") * k).as("u"), ((col("c") - 1) * k).as("v"))
      val edges = cliqueEdges.unionByName(chains).localCheckpoint()
      // nodes: every clique node plus 1000 isolated ids past the end
      // (base-rank rows that never touch the cluster), minus the last
      // clique's high half — foreign endpoints that carry degree but
      // hold no rank, exercising the sink path both arms must agree on
      val nodes = s.range(nNodes - k / 2).toDF("id")
        .unionByName(s.range(nNodes, nNodes + 1000).toDF("id"))
        .localCheckpoint()
      (edges, nodes)
    }
    var (edges, nodes) = gen(spark)
    val nE = edges.count()
    println(s"[probe] edges=$nE nodes=${nodes.count()} cliques=$nCliques iters=$iters " +
      s"(driver limit 25M -> distributed arm engages)")

    // 1. Pregel, rank side broadcast (3.2M nodes < default 4M limit)
    val bFp = time("distributed arm, broadcast rank side") {
      val r = graft.operators.Graph.pageRankFixedPoint(
        edges, "u", "v", nodes, "id", iters).localCheckpoint()
      val f = fp(r); r.unpersist(); f
    }
    // 2. Pregel, shuffled-join mode (the billions-of-nodes regime)
    spark.conf.set("graft.pagerank.broadcastNodes", "0")
    val sFp = time("distributed arm, shuffled rank side") {
      val r = graft.operators.Graph.pageRankFixedPoint(
        edges, "u", "v", nodes, "id", iters).localCheckpoint()
      val f = fp(r); r.unpersist(); f
    }
    spark.conf.unset("graft.pagerank.broadcastNodes")
    // 3. driver-arm oracle with the limit raised past the edge count.
    // maxResultSize is a core conf fixed at context start, so the
    // oracle's raised limit lives in its own fresh session; the graph
    // is regenerated there by the deterministic generator above.
    spark.stop()
    spark = buildSession(Some("8g"))
    val (e2, n2) = gen(spark); edges = e2; nodes = n2
    spark.conf.set("graft.pagerank.localEdgeLimit", (nE + 1).toString)
    val dFp = time("driver packed-loop oracle (raised limit)") {
      val r = graft.operators.Graph.pageRankFixedPoint(
        edges, "u", "v", nodes, "id", iters).localCheckpoint()
      val f = fp(r); r.unpersist(); f
    }
    println(s"[probe] fp broadcast=$bFp shuffled=$sFp driver=$dFp " +
      s"equal=${bFp == sFp && sFp == dFp}")
    require(bFp == sFp && sFp == dFp,
      "PageRank arms diverged on the over-limit synthetic graph")
    spark.stop()
  }
}
