package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness for the connected-components arm choice:
  * builds the threshold-0 rare-shingle pair graph of `documents`
  * (args(0) = sf dir), pins the canonical edge list once, then times
  * the driver union-find arm vs the alternating-star loop on the SAME
  * cached input (the only controlled way to compare them — a cold
  * pairs recompute inside either arm swamps the signal; see
  * BENCH_LOCAL "Round 7, connected components").
  *
  * `args(0) = synthetic` probes the SHARDED-CONTRACTION arm past the
  * driver limit instead: ~100M clique-dense edges (args(1) = millions
  * of edges, default 100) are generated distributed — 32-node cliques
  * chained into 100-clique components — and the contraction arm
  * (shard-local union-find forests, then driver finish) is checked
  * for exact equality against the driver arm given a raised limit,
  * then timed; pass `--star` to also time the pure star loop on the
  * same pinned input. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      // the raised-limit equality oracle collects the FULL edge list
      // (100M edges = 1.6 GB packed) — over the 1g maxResultSize
      // default that the production arms stay under by design
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $label: ${(System.nanoTime - t0) / 1e9}%.1f s"); r
    }
    def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("node"), col("component")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    if (args.headOption.contains("synthetic")) {
      val millions = args.lift(1).map(_.toInt).getOrElse(100)
      val k = 32 // clique size: k(k-1)/2 = 496 edges per clique
      val nCliques = millions * 1000000L / 496L
      import spark.implicits._
      val offsets = (for (a <- 0 until k; b <- 0 until k if a < b)
        yield (a, b)).toDF("i", "j")
      val cliqueEdges = spark.range(nCliques).toDF("c")
        .crossJoin(broadcast(offsets))
        .select((col("c") * k + col("j")).as("u"), (col("c") * k + col("i")).as("v"))
      // chain every run of 100 cliques into one component
      val chains = spark.range(1, nCliques).toDF("c")
        .filter(pmod(col("c"), lit(100)) =!= 0)
        .select((col("c") * k).as("u"), ((col("c") - 1) * k).as("v"))
      val edges = graft.util.Checkpoints.pin(cliqueEdges.unionByName(chains))
      val n = edges.count()
      println(s"[probe] synthetic edges=$n cliques=$nCliques nodes=${nCliques * k} pinned")

      // sharded contraction arm: edge count is over the default 50M
      // driver limit, node count is under it — one forest round lands
      spark.conf.set("graft.cc.verbose", "true")
      val sharded = time("sharded contraction arm") {
        val r = graft.util.Checkpoints.pin(
          graft.operators.Dedup.connectedComponents(edges, "u", "v"))
        (r, r.count())
      }
      println(s"[probe] sharded rows=${sharded._2}")
      // equality oracle: plain driver union-find with a raised limit
      spark.conf.set("graft.cc.contractRounds", "0")
      spark.conf.set("graft.cc.localEdgeLimit", (n + 1).toString)
      val direct = time("direct driver union-find (raised limit)") {
        val r = graft.util.Checkpoints.pin(
          graft.operators.Dedup.connectedComponents(edges, "u", "v"))
        (r, r.count())
      }
      val fpS = fingerprint(sharded._1); val fpD = fingerprint(direct._1)
      println(s"[probe] sharded fp=$fpS direct fp=$fpD equal=${fpS == fpD}")
      require(fpS == fpD, "sharded contraction arm diverged from driver union-find")
      if (args.contains("--star")) {
        spark.conf.set("graft.cc.localEdgeLimit", "0")
        val star = time("pure star loop") {
          val r = graft.operators.Dedup.connectedComponents(edges, "u", "v")
            .localCheckpoint()
          (r, r.count())
        }
        val fpStar = fingerprint(star._1)
        println(s"[probe] star fp=$fpStar equal=${fpStar == fpD}")
      }
      if (args.contains("--multiround")) {
        // The billion-edge-regime shape: the driver limit sits far
        // BELOW what one contraction round reaches (a star forest
        // floors at nodes − components edges), so the loop must run
        // round 2+, hit the <10%/round stall detector, and fall
        // through to the alternating-star loop ON the contracted list
        // — the one production path no prior probe has observed.
        // Forced here by dialing the limit under the forest floor.
        spark.conf.set("graft.cc.localEdgeLimit", "2000000")
        spark.conf.set("graft.cc.contractRounds", "5")
        val multi = time("multi-round contraction -> stall -> star loop") {
          val r = graft.operators.Dedup.connectedComponents(edges, "u", "v")
            .localCheckpoint()
          (r, r.count())
        }
        val fpM = fingerprint(multi._1)
        println(s"[probe] multiround fp=$fpM equal=${fpM == fpD}")
        require(fpM == fpD, "multi-round + star fallback diverged from driver union-find")
        spark.conf.unset("graft.cc.localEdgeLimit")
        spark.conf.unset("graft.cc.contractRounds")
      }
      spark.stop(); return
    }

    val d = graft.Tables.load(spark,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.1", "documents")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text",
      shingleK = 5, threshold = 0.0, maxShingleFreq = 100)
    // pin the edge list once so both arms read the same cached input
    val edges = pairs.select(col("doc_a").cast("long").as("u"),
        col("doc_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint()
    val n = edges.count()
    println(s"[probe] edges=$n pinned")
    // local arm: collect + union-find (limit high via conf default)
    time("local union-find arm") {
      graft.operators.Dedup.connectedComponents(edges, "u", "v").count()
    }
    // distributed arm: force via conf (contraction off for arm purity)
    spark.conf.set("graft.cc.localEdgeLimit", "0")
    spark.conf.set("graft.cc.contractRounds", "0")
    time("distributed star loop") {
      graft.operators.Dedup.connectedComponents(edges, "u", "v").count()
    }
  }
}
