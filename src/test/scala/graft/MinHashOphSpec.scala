package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** One-permutation MinHash (the fast default kernel) must estimate
  * Jaccard with the same statistical quality as the k-hash-family
  * form: unbiased, with component-agreement variance ~ J(1-J)/m.
  * Pairs with known exact Jaccard are constructed from controlled
  * token sets (shingleK = 1 → the token set IS the shingle set).
  */
class MinHashOphSpec extends SparkTestBase {
  import spark.implicits._

  /** n pairs at exact Jaccard c / (c + 2u): c shared tokens, u unique
    * per side, namespaced per pair so nothing collides across pairs. */
  private def pairsAt(c: Int, u: Int, n: Int, ns: String) = {
    val rows = (0 until n).flatMap { p =>
      val shared = (0 until c).map(i => s"${ns}_p${p}_s$i")
      val a = shared ++ (0 until u).map(i => s"${ns}_p${p}_a$i")
      val b = shared ++ (0 until u).map(i => s"${ns}_p${p}_b$i")
      Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" ")))
    }
    rows.toDF("doc_id", "text")
  }

  private def agreements(df: org.apache.spark.sql.DataFrame,
                         oph: Boolean): Map[Long, Double] = {
    val sigs = Dedup.minhashSignatures(df, "doc_id", "text",
      shingleK = 1, numHashes = 128, oph = oph)
      .select(col("doc_id"), col("signature"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs.keys.filter(_ % 2 == 0).map { a =>
      val (sa, sb) = (sigs(a), sigs(a + 1))
      a / 2 -> sa.zip(sb).count(x => x._1 == x._2).toDouble / sa.length
    }.toMap
  }

  test("OPH signature shape: length m, no sentinels, deterministic") {
    val df = pairsAt(c = 30, u = 5, n = 2, ns = "shape")
    val s1 = Dedup.minhashSignatures(df, "doc_id", "text", shingleK = 1,
      numHashes = 128, oph = true)
      .select("signature").collect().map(_.getSeq[Long](0))
    assert(s1.forall(_.length == 128))
    assert(s1.forall(_.forall(_ >= 0L)), "no sentinel survives densification")
    val s2 = Dedup.minhashSignatures(df, "doc_id", "text", shingleK = 1,
      numHashes = 128, oph = true)
      .select("signature").collect().map(_.getSeq[Long](0))
    assert(s1.toSeq == s2.toSeq, "same input, same signatures")
  }

  test("OPH est-Jaccard honors the sketch error bound at three levels") {
    // sigma = sqrt(J(1-J)/128) is ~0.035-0.044 here; with 40 pairs a
    // mean within ~1.5 sigma and max within ~4 sigma are loose enough
    // to be deterministic at a fixed hash family yet tight enough to
    // catch a broken estimator (bias shows up immediately at 40 pairs)
    val levels = Seq(
      (80, 10, 0.8), // J = 80/100
      (50, 25, 0.5), // J = 50/100
      (20, 40, 0.2)) // J = 20/100
    for (((c, u, j), li) <- levels.zipWithIndex) {
      val df = pairsAt(c, u, n = 40, ns = s"lvl$li")
      val est = agreements(df, oph = true).values.toSeq
      val meanErr = est.map(e => math.abs(e - j)).sum / est.size
      val maxErr = est.map(e => math.abs(e - j)).max
      val sigma = math.sqrt(j * (1 - j) / 128)
      assert(meanErr <= 1.5 * sigma,
        s"J=$j: mean |err| $meanErr exceeds 1.5 sigma ${1.5 * sigma}")
      assert(maxErr <= 4 * sigma,
        s"J=$j: max |err| $maxErr exceeds 4 sigma ${4 * sigma}")
    }
  }

  test("OPH and the k-family kernel agree on the same pairs") {
    val df = pairsAt(c = 60, u = 20, n = 30, ns = "x") // J = 0.6
    val oph = agreements(df, oph = true)
    val kfam = agreements(df, oph = false)
    val diffs = oph.keys.map(k => math.abs(oph(k) - kfam(k)))
    assert(diffs.sum / diffs.size < 0.1,
      "the two estimators must track each other")
  }

  test("OPH end-to-end: planted near-dups found, unrelated docs spared") {
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (0 until 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    val other = (0 until 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq(10L -> base, 20L -> nearDup, 30L -> other).toDF("doc_id", "text")
    val groups = Dedup.minhashDedup(df, "doc_id", "text",
      shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5, oph = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(10L -> 10L, 20L -> 10L, 30L -> 30L))
  }

  test("OPH incremental index round-trips through parquet and probes correctly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ophidx").toString
    val shared = (1 to 60).map(i => s"q$i").mkString(" ")
    val corpus = Seq(1L -> (shared + " one"), 2L -> ((100 to 160).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text")
    val idx = Dedup.buildMinhashIndex(corpus, "doc_id", "text", oph = true)
    idx.bands.write.mode("overwrite").parquet(s"$tmp/bands")
    idx.sigs.write.mode("overwrite").parquet(s"$tmp/sigs")
    val reloaded = Dedup.MinhashIndex(
      spark.read.parquet(s"$tmp/bands"), spark.read.parquet(s"$tmp/sigs"))
    val batch = Seq(10L -> (shared + " two"), 11L -> ((300 to 360).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val verdicts = Dedup.minhashIncrementalAgainst(reloaded, batch, "doc_id", "text",
      oph = true)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(verdicts == Map(10L -> true, 11L -> false))
  }
}
