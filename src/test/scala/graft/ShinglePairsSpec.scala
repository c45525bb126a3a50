package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeExpressions
import graft.operators.Dedup

/** The fused shingle kernel ([[NativeExpressions.ShingleHashes]] +
  * [[graft.functions.ShinglePairsAgg]]) must reproduce the string-path
  * semantics it replaced: tokenization = split(lower(text), "\\s+")
  * with Java limit -1 (leading/trailing-whitespace edge tokens kept),
  * distinct k-shingles, short-doc whole-text fallback, and the global
  * frequency cap excluding boilerplate shingles. */
class ShinglePairsSpec extends SparkTestBase {
  import spark.implicits._

  private val trickyTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "  leading whitespace here with plenty of words to shingle",
    "trailing whitespace after these several shingle words  ",
    "\tmixed\nwhitespace\r kinds separate these seven words fine",
    "double  spaces  between  every  word  pair  here",
    "short doc", // < k tokens → whole-doc fallback shingle
    "", // empty text → one empty token → one fallback shingle
    "   ", // all-whitespace → two empty edge tokens
    "UPPER Case MiXeD letters lower the SAME way always",
    "repeat repeat repeat repeat repeat repeat repeat repeat" // dup shingles collapse
  )

  test("ShingleHashes: distinct count matches the split+word_shingles string path") {
    val df = trickyTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        size(NativeExpressions.shingle_hashes(col("text"), 5)).as("n_hash"),
        size(NativeExpressions.word_shingles(
          split(lower(col("text")), "\\s+"), 5)).as("n_str"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"doc ${r.getLong(0)} '${trickyTexts(r.getLong(0).toInt)}': " +
          s"hash-path ${r.getInt(1)} != string-path ${r.getInt(2)}")
    }
  }

  test("ShingleHashes: equal shingle strings hash equal across docs (pair intersections match)") {
    // doc pairs sharing exact word windows; intersection sizes computed
    // independently over the string shingles must match n_common from
    // the fused pair pipeline
    val texts = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      2L -> "alpha beta gamma delta epsilon zeta different tail words here",
      3L -> "totally unrelated content with no overlap at all whatsoever now",
      4L -> "  alpha beta gamma delta epsilon zeta eta theta iota kappa" // leading ws shifts tokens
    )
    val df = texts.toDF("doc_id", "text")
    val expected = {
      val sh = texts.map { case (id, t) =>
        id -> t.split("\\s+", -1).map(_.toLowerCase).sliding(5).map(_.mkString(" ")).toSet
      }.toMap
      (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        common = (sa intersect sb).size if common > 0
      } yield (a, b) -> common).toMap
    }
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        shingleK = 5, threshold = 0.0, maxShingleFreq = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("shingle_pairs: frequency cap excludes boilerplate buckets, keeps exactly-at-cap") {
    val rows = Seq(
      (10L, 5L, "common"), (11L, 6L, "common"), (12L, 7L, "common"), // freq 3
      (20L, 3L, "pairish"), (21L, 4L, "pairish"), // freq 2
      (30L, 9L, "lonely")) // freq 1 → no pairs
      .toDF("doc", "set_size", "s")
    def pairsAtCap(cap: Int): Set[(Long, Long, Long, Long)] =
      rows.groupBy("s")
        .agg(graft.functions.ShinglePairs.shingle_pairs(
          col("doc"), col("set_size"), cap).as("p"))
        .select(explode(col("p")).as("p")).select("p.*")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // cap 3: the freq-3 bucket is AT cap → kept (3 pairs), plus the pair bucket
    assert(pairsAtCap(3) == Set(
      (10L, 11L, 5L, 6L), (10L, 12L, 5L, 7L), (11L, 12L, 6L, 7L),
      (20L, 21L, 3L, 4L)))
    // cap 2: freq-3 bucket overflows → only the pair bucket remains
    assert(pairsAtCap(2) == Set((20L, 21L, 3L, 4L)))
  }

  test("TokenHashes/BigramHashes: counts and equalities match split(lower, ' ') semantics") {
    val texts = Seq(
      0L -> "The quick brown Fox",
      1L -> "the  quick", // double space → empty middle token
      2L -> "", // one empty token, zero bigrams
      3L -> "single",
      4L -> "the quick brown fox") // case-folds equal to doc 0
    val df = texts.toDF("doc_id", "text")
    val counts = df.select(col("doc_id"),
        size(NativeExpressions.token_hashes(col("text"))).as("nt"),
        size(NativeExpressions.bigram_hashes(col("text"))).as("nb"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    texts.foreach { case (id, t) =>
      val nt = t.split(" ", -1).length
      assert(counts(id) == ((nt, math.max(0, nt - 1))), s"doc $id: ${counts(id)}")
    }
    // equal words hash equal across docs: docs 0 and 4 share all
    // unigrams and bigrams after lowercasing
    val uni = df.select(col("doc_id"),
        NativeExpressions.token_hashes(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(uni(0L) == uni(4L), "case-folded docs must produce identical token hashes")
    assert(uni(0L).distinct.size == 4, "distinct words stay distinct")
    val bgs = df.select(col("doc_id"),
        NativeExpressions.bigram_hashes(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(bgs(0L) == bgs(4L))
    // bigram hash is order-dependent: (the,quick) != (quick,the)
    val ab = Seq((0L, "alpha beta"), (1L, "beta alpha")).toDF("doc_id", "text")
      .select(NativeExpressions.bigram_hashes(col("text")).as("b"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).head.getLong(1))
    assert(ab(0) != ab(1), "ordered pairs must hash differently")
  }

  test("TtrStats: exact type/token/hapax counts incl. empty-token and case edges") {
    val rows = Seq(
      0L -> "the cat and the dog", // 5 tokens, 4 types, 3 hapax
      1L -> "a  b", // double space: tokens [a, "", b] → 3 tokens 3 types 3 hapax
      2L -> "Word word WORD", // case folds: 3 tokens 1 type 0 hapax
      3L -> "") // one empty token
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"), NativeExpressions.ttr_stats(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(0L) == Seq(5L, 4L, 3L), s"got ${got(0L)}")
    assert(got(1L) == Seq(3L, 3L, 3L), s"got ${got(1L)}")
    assert(got(2L) == Seq(3L, 1L, 0L), s"got ${got(2L)}")
    assert(got(3L) == Seq(1L, 1L, 1L), s"got ${got(3L)}")
  }

  test("sorted_intersect_count: merge kernel equals size(array_intersect)") {
    val rows = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)), // partial overlap
      (Seq(1L, 2L), Seq(1L, 2L)),                  // equal sets
      (Seq.empty[Long], Seq(1L)),                  // empty side
      (Seq(7L), Seq(8L)))                          // disjoint
      .toDF("a", "b")
    val got = rows.select(
        NativeExpressions.sorted_intersect_count(col("a"), col("b")).as("n"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("prefix-filtered core equals the all-rare-pairs core (Jaccard + containment, real corpus)") {
    // Equality of the two candidate-generation arms over the sf0.001
    // documents table at thresholds where both run: the prefix filter
    // must be lossless for pairs at/above threshold, and exact
    // verification must reproduce the capped-collect arm's n_common.
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) = (0 until r.length).map(r.get).mkString("|")
    for (t <- Seq(0.15, 0.5, 0.8)) {
      // legacy arm forced by calling the shared core through a
      // threshold below the switch, then filtering to t by hand
      val legacy = Dedup.ngramJaccardPairs(d, "doc_id", "text",
          shingleK = 5, threshold = 0.0, maxShingleFreq = 100)
        .filter(col("jaccard") >= t)
        .collect().map(key).toSet
      val prefix = Dedup.ngramJaccardPairs(d, "doc_id", "text",
          shingleK = 5, threshold = t, maxShingleFreq = 100)
        .collect().map(key).toSet
      assert(prefix == legacy, s"jaccard arms disagree at t=$t: " +
        s"only-prefix=${(prefix -- legacy).take(3)} only-legacy=${(legacy -- prefix).take(3)}")
    }
    for (t <- Seq(0.5, 0.9)) {
      val legacy = Dedup.containmentPairs(d, "doc_id", "text",
          shingleK = 5, threshold = 0.01, maxShingleFreq = 100)
        .filter(greatest(col("containment_a"), col("containment_b")) >= t)
        .collect().map(key).toSet
      val prefix = Dedup.containmentPairs(d, "doc_id", "text",
          shingleK = 5, threshold = t, maxShingleFreq = 100)
        .collect().map(key).toSet
      assert(prefix == legacy, s"containment arms disagree at t=$t")
    }
  }

  test("shingle_pairs: merge propagates overflow across partials") {
    // force many partitions so partial buffers merge; a 5-member
    // bucket over cap 4 must vanish regardless of partial layout
    val rows = (0 until 5).map(i => (i.toLong, i.toLong + 100, "hot")).toDF("doc", "set_size", "s")
      .repartition(5)
    val out = rows.groupBy("s")
      .agg(graft.functions.ShinglePairs.shingle_pairs(col("doc"), col("set_size"), 4).as("p"))
      .select(explode(col("p")).as("p"))
      .count()
    assert(out == 0L, "overflowed bucket must emit nothing")
  }
}
