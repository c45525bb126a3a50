package graft

import graft.functions.TextFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the curation pack. The Gopher line rules
  * (bullets, ellipsis-ends) can't be exercised by the synthetic corpus
  * (its docs are single-line, no '#'/'...'), so the fixture plants
  * every rule's trigger and checks the exact signal values.
  */
class CurationPackSpec extends SparkTestBase {
  import spark.implicits._

  test("gopherSignals: every rule computed exactly on a planted doc") {
    // 4 lines: 2 bullet starts, 1 ellipsis end. Words (single-space
    // split over the whole lowered text): the newline-joined tokens
    // count as words containing '\n' — mirror the convention exactly.
    val text = "- the cat sat\n* a dog ran off...\nplain line here\n• third bullet"
    val df = Seq(text).toDF("text")
    val sig = TextFunctions.gopherSignals(col("text"))
    val row = df.select(sig.map { case (n, c) => c.as(n) }: _*).head()

    // single-space split crosses newlines ("sat\n*" is ONE field):
    // 11 spaces → 12 fields
    assert(row.getAs[Long]("n_words") === 12L)
    // 4 newline-split lines; "- ", "* ", "• " starts → 3/4
    assert(row.getAs[Double]("bullet_line_ratio") === 0.75)
    // one line ends with "..." → 1/4
    assert(row.getAs[Double]("ellipsis_line_ratio") === 0.25)
    // one "..." occurrence, zero '#' → 1/12
    assert(row.getAs[Double]("symbol_ratio") === 0.0833)
    // of the required list only "the" appears → hits=1
    assert(row.getAs[Long]("stop_hits") === 1L)
    // keep fails (word count < 50, stop_hits < 2)
    assert(!row.getAs[Boolean]("keep"))
  }

  test("gopherSignals: keep verdict flips on a rule-passing doc") {
    val good = (Seq("the", "be", "to", "of", "and", "that", "have", "with") ++
      Seq.fill(50)("quality")).mkString(" ")
    val bad = Seq.fill(60)("###").mkString(" ") // symbol ratio >= 0.1, no stopwords
    val rows = Seq(good, bad).toDF("text")
      .select(TextFunctions.gopherSignals(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(rows(0).getAs[Boolean]("keep"))
    assert(!rows(1).getAs[Boolean]("keep"))
  }

  test("text_ttr fixture: tokens/types/hapax exact") {
    val df = Seq((1L, "a a b"), (2L, "x y z")).toDF("doc_id", "text")
    val wc = df.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
    val out = wc.groupBy("doc_id").agg(
      sum("n").as("n_tokens"), count(lit(1)).as("n_types"),
      sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 4).as("ttr"),
        round(col("n_hapax").cast("double") / col("n_types"), 4).as("hapax_ratio"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_tokens") === 3L)
    assert(out(1L).getAs[Long]("n_types") === 2L)
    assert(out(1L).getAs[Long]("n_hapax") === 1L)
    assert(out(1L).getAs[Double]("ttr") === 0.6667)
    assert(out(1L).getAs[Double]("hapax_ratio") === 0.5)
    assert(out(2L).getAs[Double]("ttr") === 1.0)
  }

  test("centroidOutliers: planted inverse vector surfaces first") {
    // 9 vectors near (1,0,0,0), one at the antipode — the antipode has
    // the lowest cosine to the centroid and must rank first.
    val base = (0 until 9).map(i =>
      (i.toLong, Array(1.0f, 0.01f * i, 0.0f, 0.0f)))
    val anti = Seq((99L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
    val df = (base ++ anti).toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "embedding", k = 3).collect()
    assert(out.head.getAs[Long]("vec_id") === 99L)
    assert(out.head.getAs[Double]("cos_centroid") < -0.9)
    // remaining rows are cluster members with high cosine
    assert(out.tail.forall(_.getAs[Double]("cos_centroid") > 0.9))
    // deterministic ordering: ties inside the cluster break by vec_id
    assert(out.length === 3)
  }
}
