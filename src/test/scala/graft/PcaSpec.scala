package graft

import graft.functions.LinAlg
import graft.operators.{Similarity, TextPipeline}
import org.apache.spark.sql.functions._

/** Invariant checks for the PCA path (driver-side Jacobi eigensolve +
  * distributed projection — the eigenbasis is not SQL-replicable, so
  * emb_pca_project is verified here rather than against DuckDB), plus
  * hand fixtures for RRF fusion, DSIR selection, and curriculum order.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("symmetricEigen: A·v = λ·v and orthonormal basis on a known matrix") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (vals, vecs) = LinAlg.symmetricEigen(a)
    val n = a.length
    // eigen residual ||A v - λ v|| ~ 0
    for (i <- 0 until n) {
      val av = Array.tabulate(n)(r => (0 until n).map(c => a(r)(c) * vecs(i)(c)).sum)
      val res = math.sqrt((0 until n).map(r => math.pow(av(r) - vals(i) * vecs(i)(r), 2)).sum)
      assert(res < 1e-9, s"residual for eigenpair $i: $res")
    }
    // orthonormality
    for (i <- 0 until n; j <- 0 until n) {
      val dot = (0 until n).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // trace preserved
    assert(math.abs(vals.sum - (0 until n).map(i => a(i)(i)).sum) < 1e-9)
  }

  test("pcaProject: planted dominant direction is PC1; Gram of projections ≈ diag") {
    // vectors spread mostly along u = (1,1,0,0)/√2, a little along
    // (0,0,1,-1)/√2 — PC1 must align with u.
    val rows = (0 until 40).map { i =>
      val t = (i - 19.5) / 4.0          // big spread
      val s = ((i * 7) % 11 - 5.0) / 20.0 // small spread
      (i.toLong, Array(t * 0.7071f + 0.01f * i, t * 0.7071f,
        s * 0.7071f, -s * 0.7071f).map(_.toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", dim = 4, nComponents = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(proj.length === 80)
    val byPc = proj.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
    def varOf(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val v1 = varOf(byPc(1L)); val v2 = varOf(byPc(2L))
    // PC1 captures the dominant direction's variance, strictly more than PC2
    assert(v1 > 10 * v2, s"v1=$v1 v2=$v2")
    // cross-PC projections are uncorrelated (off-diagonal Gram ≈ 0
    // relative to the PC1 mass)
    val p1 = proj.filter(_._2 == 1L).sortBy(_._1).map(_._3)
    val p2 = proj.filter(_._2 == 2L).sortBy(_._1).map(_._3)
    val m1 = p1.sum / p1.length; val m2 = p2.sum / p2.length
    val cross = p1.zip(p2).map { case (x, y) => (x - m1) * (y - m2) }.sum / p1.length
    assert(math.abs(cross) < 1e-3 * v1, s"cross=$cross v1=$v1")
  }

  test("covarianceUpper matches a hand covariance on a tiny fixture") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 0.0f)), (3L, Seq(5.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val cov = Similarity.covarianceUpper(df, "embedding", dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // means: (3, 2); cov11 = ((−2)²+0²+2²)/3 = 8/3; cov22 = (0+4+4)/3 = 8/3
    // cov12 = ((−2)(0)+0(−2)+2·2)/3 = 4/3
    assert(math.abs(cov((1L, 1L)) - 8.0 / 3) < 1e-5)
    assert(math.abs(cov((2L, 2L)) - 8.0 / 3) < 1e-5)
    assert(math.abs(cov((1L, 2L)) - 4.0 / 3) < 1e-5)
  }

  test("gram_matrix fails fast on a ragged vector instead of skewing denominators") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f))) // second is ragged
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.covarianceUpper(df, "embedding", dim = 2).collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("") +:
        Option(t.getCause).map(rootMsg).toSeq).mkString(" | ")
    assert(rootMsg(ex).contains("gram_matrix"), s"got: ${rootMsg(ex)}")
  }

  test("vec_sum_q: exact sums, null-vector skip, null-element row still counts, ragged throws") {
    import org.apache.spark.sql.functions.{col, lit}
    // 1.0000005 quantizes HALF_UP to 1000001 — the rounding edge the
    // kernel must share with Spark's round(x*1e6, 0).
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0000005, -0.5)),
      (2L, Seq[java.lang.Double](0.25, null)), // null element: counted row, no sum term
      (3L, null)                               // null vector: skipped entirely
    ).toDF("vec_id", "v")
    val got = df.agg(functions.VecSum.vec_sum_q(col("v").cast("array<double>"), 2).as("a"))
      .select(col("a.n"), col("a.sums")).head()
    assert(got.getLong(0) == 2L)
    assert(got.getSeq[Long](1) == Seq(1000001L + 250000L, -500000L))

    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0))).toDF("vec_id", "v")
    val ex = intercept[Exception] {
      ragged.groupBy(lit(1)).agg(functions.VecSum.vec_sum_q(col("v"), 2)).collect()
    }
    def rootMsg(t: Throwable): String =
      (Option(t.getMessage).getOrElse("") +:
        Option(t.getCause).map(rootMsg).toSeq).mkString(" | ")
    assert(rootMsg(ex).contains("vec_sum_q"), s"got: ${rootMsg(ex)}")
  }

  test("rrfFuse: exact scores and ordering on a hand fixture") {
    val lex = Seq((10L, 9.0, 1L), (20L, 8.0, 2L), (30L, 7.0, 3L))
      .toDF("doc_id", "score", "rnk")
    val dense = Seq((20L, 0.9, 1L), (40L, 0.8, 2L))
      .toDF("doc_id", "score", "rnk")
    val out = Similarity.rrfFuse(lex, dense, "doc_id", kRrf = 60, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getLong(4))).toList
    def rrf(rs: Seq[Long]): Double =
      BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20 appears in both lists (ranks 2 and 1) → wins
    assert(out.head._1 === 20L && out.head._3 === 1L)
    assert(math.abs(out.head._2 - rrf(Seq(2L, 1L))) < 1e-9)
    // then the rank-1 singletons: lex rank 1 (10) and dense... both
    // 1/(61): tie broken by doc_id → 10 before 40
    assert(out.map(_._1) === List(20L, 10L, 40L, 30L))
  }

  test("dsir_gram_buckets ≡ declarative md5 bucket form (incl. unicode, empty, 1-token)") {
    val texts = Seq(
      "The QUICK brown Fox jumps",
      "único Ünïcode ÇASE déjà vu",
      "single",
      "",
      "a a a repeated a a",
      "t1 t2")
    val df = texts.toDF("text")
    val ws = split(lower(col("text")), " ")
    val grams = concat(ws,
      when(size(ws) >= 2, transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>")))
    val declarative = df.select(transform(grams, g =>
      conv(substring(md5(g), 1, 6), 16, 10).cast("long") % 2048).as("b"))
      .collect().map(_.getSeq[Long](0).sorted)
    val kernel = df.select(graft.functions.NativeExpressions
        .dsir_gram_buckets(col("text"), 2048).as("b"))
      .collect().map(_.getSeq[Long](0).sorted)
    declarative.zip(kernel).zipWithIndex.foreach { case ((d, k), i) =>
      assert(d === k, s"mismatch on input ${i}: '${texts(i)}'")
    }
  }

  test("term_counts ≡ explode+filter counts (incl. unicode, case, empty)") {
    val terms = Seq("merge", "hash", "déjà")
    val texts = Seq(
      "Merge the HASH then merge again",
      "déjà vu DÉJÀ vu",
      "",
      "nothing matches here",
      "hash")
    val df = texts.toDF("text")
    val declarative = df.select(
      array(terms.map(t => size(filter(split(lower(col("text")), " "),
        w => w === t)).cast("long")): _*).as("c"))
      .collect().map(_.getSeq[Long](0).toList)
    val kernel = df.select(graft.functions.NativeExpressions
        .term_counts(col("text"), terms).as("c"))
      .collect().map(_.getSeq[Long](0).toList)
    declarative.zip(kernel).zipWithIndex.foreach { case ((d, k), i) =>
      assert(d === k, s"mismatch on '${texts(i)}'")
    }
  }

  test("dsirSample: docs sharing the target slice's vocabulary rank first") {
    // target docs use 'alpha beta'-family tokens; half the pool does
    // too, the other half is disjoint 'omega' vocabulary.
    val docs =
      (0L to 3L).map(i => (i, "alpha beta gamma alpha beta", "tgt")) ++
        (10L to 13L).map(i => (i, "alpha beta gamma delta beta", "poolA")) ++
        (20L to 23L).map(i => (i, "omega psi chi phi upsilon", "poolB"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = TextPipeline.dsirSample(df, "doc_id", "text",
      isTarget = col("source") === "tgt", nBuckets = 512, k = 12)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3)))
    val rankOf = out.map(t => t._1 -> t._3).toMap
    // every target/poolA doc must outrank every poolB doc
    val likeTarget = (0L to 3L) ++ (10L to 13L)
    for (a <- likeTarget; b <- 20L to 23L)
      assert(rankOf(a) < rankOf(b), s"doc $a should outrank $b")
  }

  test("winnow_fingerprints ≡ declarative window-min form; shared-run guarantee holds") {
    import org.apache.spark.sql.functions.{array_distinct, array_join, array_min, transform => ftransform}
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val texts = Seq(
      s"intro words here $shared trailing tail tokens",
      s"$shared completely different suffix material",
      "too short", // < k+w-1 tokens → no fingerprints
      "unrelated content with no overlap at all whatsoever present")
    val df = texts.toDF("text")
    val (k, w) = (5, 4)
    val ws = split(lower(col("text")), " ")
    val hs = ftransform(sequence(lit(1), size(ws) - (k - 1)),
      i => conv(substring(md5(array_join(slice(ws, i, lit(k)), " ")), 1, 15), 16, 10)
        .cast("long"))
    val declarative = df
      .select(when(size(ws) >= k + w - 1,
        array_distinct(ftransform(sequence(lit(1), size(hs) - (w - 1)),
          j => array_min(slice(hs, j, lit(w))))))
        .otherwise(array().cast("array<long>")).as("fps"))
      .collect().map(_.getSeq[Long](0).sorted.toList)
    val kernel = df.select(graft.functions.NativeExpressions
        .winnow_fingerprints(col("text"), k, w).as("fps"))
      .collect().map(_.getSeq[Long](0).sorted.toList)
    declarative.zip(kernel).zipWithIndex.foreach { case ((d, kk), i) =>
      assert(d === kk, s"mismatch on '${texts(i)}'")
    }
    // guarantee: docs 0 and 1 share an 8-token run = w+k-1 → must share ≥1 fp
    assert(kernel(0).toSet.intersect(kernel(1).toSet).nonEmpty)
    assert(kernel(2).isEmpty)
    assert(kernel(3).toSet.intersect(kernel(0).toSet).isEmpty)
  }

  test("winnowPairs: the planted shared-run pair surfaces; short docs don't") {
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"prefix a b $shared suffix c d"),
      (2L, s"$shared wholly other ending material here now"),
      (3L, "totally disjoint text with nothing in common at all whatsoever"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(docs, "doc_id", "text",
      k = 5, w = 4, maxDf = 50, minShared = 1, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("weighted sample (A-ES): key formula exact, heavier docs rank higher in expectation") {
    // formula replication on a tiny fixture: key = u^(100/n_chars),
    // u = (md5_48('ws_'||id) + 1) / 2^48
    val df = Seq((7L, 400L), (8L, 50L)).toDF("doc_id", "n_chars")
    val out = df.select(col("doc_id"),
        round(exp(log((conv(substring(md5(concat(lit("ws_"),
          col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long") + 1.0)
          / 281474976710656.0) / (col("n_chars") / 100.0)), 6).as("key"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def handKey(id: Long, nc: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ws_$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 281474976710656.0
      BigDecimal(math.exp(math.log(u) / (nc / 100.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(7L) === handKey(7L, 400L))
    assert(out(8L) === handKey(8L, 50L))
    // statistical sanity: with uniform u, E[key] grows with weight —
    // over many ids, heavy docs should dominate the top ranks
    val many = (1L to 400L).map(i => (i, if (i <= 200) 2000L else 100L))
      .toDF("doc_id", "n_chars")
    val keyed = many.select(col("doc_id"), col("n_chars"),
      exp(log((conv(substring(md5(concat(lit("ws_"),
        col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long") + 1.0)
        / 281474976710656.0) / (col("n_chars") / 100.0)).as("key"))
    val top50 = keyed.orderBy(col("key").desc).limit(50)
      .filter(col("n_chars") === 2000L).count()
    assert(top50 >= 40, s"expected heavy docs to dominate top-50, got $top50")
  }

  test("MAD modified z-score: planted outlier flagged, inliers pass") {
    // spread matters: an all-identical group has MAD = 0 and is
    // excluded by the mad > 0 guard (division degenerate)
    val vals = ((1 to 30).map(i => 10.0 + (i % 3 - 1) * 0.5) ++ Seq(1000.0))
      .zipWithIndex.map { case (v, i) => ("t", i.toLong, v) }
    val df = vals.toDF("event_type", "event_id", "value")
    val m = df.groupBy("event_type").agg(median(col("value")).as("med"))
    val d = df.join(broadcast(m), "event_type")
      .select(col("event_type"), col("event_id"), col("value"), col("med"),
        abs(col("value") - col("med")).as("adev"))
    val mad = d.groupBy("event_type").agg(median(col("adev")).as("mad"))
    val z = lit(0.6745) * (col("value") - col("med")) / col("mad")
    val flagged = d.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0 && abs(z) > 3.5)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(30L), s"only the planted outlier: $flagged")
  }

  test("recallAtK: hand fixture — hits counted, misses zero, absent query rows") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(approx, exact, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toList
    assert(out === List((1L, 1L, 0.5), (2L, 2L, 1.0)))
  }

  test("curriculumOrder: contiguous positions, phases monotone, md5 order within phase") {
    val docs = (1L to 30L).map(i => (i, if (i % 3 == 0)
      "the of and to have with that be good clean" // positive-ish score varies
    else "zzqx vvrk wwty uupl")).toDF("doc_id", "text")
    val out = TextPipeline.curriculumOrder(docs, "doc_id", "text", numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toList === (1L to 30L).toList)
    // positions respect phase blocks
    val sorted = out.sortBy(_._3)
    assert(sorted.map(_._2).toList === sorted.map(_._2).toList.sorted)
    // within a phase, order follows the md5 draw
    sorted.groupBy(_._2).foreach { case (_, rows) =>
      val keys = rows.sortBy(_._3).map(t =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"cur_${t._1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
      assert(keys.toList === keys.sorted.toList)
    }
  }
}
