package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation-diagnostics pack: the full Gopher quality-rule gate,
  * lexical-diversity stats (type-token ratio + hapax share), and
  * embedding-health outlier detection. All three are the shapes a
  * 100 TB pretraining-data pipeline runs corpus-wide: two are
  * zero-shuffle map passes, one is a wordcount-shaped aggregation.
  */
object CurationPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val defs: Seq[QueryDef] = Seq(

    // The complete Gopher rule bundle (word-count bounds, mean word
    // length, symbol/bullet/ellipsis ratios, alpha-word ratio,
    // required stopwords) + keep verdict — row-local, zero shuffle.
    QueryDef(
      "text_gopher_gate",
      """WITH w AS (
        |  SELECT doc_id, text,
        |    string_split(lower(text), ' ') AS words,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents
        |), sig AS (
        |  SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    round((length(text) - (len(words) - 1)) * 1.0 / len(words), 4) AS mean_word_len,
        |    round(((length(text) - length(replace(text, '#', '')))
        |           + (len(string_split(text, '...')) - 1)) * 1.0 / len(words), 4) AS symbol_ratio,
        |    round(len(list_filter(lines, l -> starts_with(l, '- ')
        |           OR starts_with(l, '* ') OR starts_with(l, '• ')))
        |          * 1.0 / len(lines), 4) AS bullet_line_ratio,
        |    round(len(list_filter(lines, l -> ends_with(l, '...')))
        |          * 1.0 / len(lines), 4) AS ellipsis_line_ratio,
        |    round(len(list_filter(words, x -> regexp_matches(x, '[a-z]')))
        |          * 1.0 / len(words), 4) AS alpha_word_ratio,
        |    CAST(len(list_intersect(list_distinct(words),
        |         ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
        |  FROM w)
        |SELECT *,
        |  (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
        |  AND symbol_ratio < 0.1 AND bullet_line_ratio < 0.9
        |  AND ellipsis_line_ratio < 0.3 AND alpha_word_ratio > 0.8
        |  AND stop_hits >= 2 AS keep
        |FROM sig
        |""".stripMargin) { (s, dir) =>
      val sig = TextFunctions.gopherSignals(col("text"))
      docs(s, dir).select(col("doc_id") +: sig.map { case (n, c) => c.as(n) }: _*)
    },

    // Type-token ratio + hapax share: lexical-diversity diagnostics
    // (template/boilerplate corpora score low). One wordcount-shaped
    // shuffle keyed (doc_id, word), then a doc-keyed re-reduce —
    // partial aggregation all the way, no windows.
    QueryDef(
      "text_ttr",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
        |), wc AS (
        |  SELECT doc_id, w, count(*) AS n FROM w GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  round(count(*) * 1.0 / sum(n), 4) AS ttr,
        |  round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS hapax_ratio
        |FROM wc GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val wc = docs(s, dir)
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      wc.groupBy("doc_id").agg(
        sum("n").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
          round(col("n_types").cast("double") / col("n_tokens"), 4).as("ttr"),
          round(col("n_hapax").cast("double") / col("n_types"), 4).as("hapax_ratio"))
    },

    // Temperature-smoothed language sampling weights (the multilingual
    // mixing rule of XLM/mT5: w_l ∝ p_l^α, α=0.3 — upsamples tail
    // languages). One lang-keyed aggregation (token counts via the
    // native byte-walk), then arithmetic over the LANGUAGE-cardinality
    // result — the corpus is touched once.
    QueryDef(
      "text_lang_balance",
      """WITH t AS (
        |  SELECT lang, count(*) AS n_docs,
        |    sum(len(string_split(text, ' '))) AS n_tokens
        |  FROM documents GROUP BY 1
        |), tot AS (SELECT sum(n_tokens) AS tt FROM t),
        |w AS (
        |  SELECT lang, n_docs, n_tokens,
        |    n_tokens * 1.0 / tt AS p,
        |    pow(n_tokens * 1.0 / tt, 0.3) AS pw
        |  FROM t, tot)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(p, 6) AS p,
        |  round(pw / (SELECT sum(pw) FROM w), 6) AS weight
        |FROM w
        |""".stripMargin) { (s, dir) =>
      val t = docs(s, dir).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(TextFunctions.spaceTokenCount(col("text"))).as("n_tokens"))
      val tot = t.agg(sum("n_tokens").as("tt"))
      val w = t.crossJoin(broadcast(tot))
        .withColumn("p", col("n_tokens").cast("double") / col("tt"))
        .withColumn("pw", pow(col("p"), 0.3))
      val sw = w.agg(sum("pw").as("sw"))
      w.crossJoin(broadcast(sw))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          round(col("p"), 6).as("p"),
          round(col("pw") / col("sw"), 6).as("weight"))
    },

    // Per-dimension embedding moments (mean/var/min/max): the
    // embedding-health table every vector pipeline keeps. Integer
    // micro-unit sums (decimal accumulators — overflow-proof at any
    // corpus size) make mean and variance engine-exact: both engines
    // cast the SAME exact integers to double at the very end.
    QueryDef(
      "emb_dim_stats",
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT i AS pos, CAST(round(v[i]*1000000.0) AS BIGINT) AS q
        |      FROM e, range(1, 65) r(i))
        |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n,
        |  round(CAST(sum(q) AS DOUBLE)/count(*)/1000000.0, 6) AS mean,
        |  round((CAST(sum(CAST(q AS HUGEINT)*q) AS DOUBLE)/count(*)
        |         - pow(CAST(sum(q) AS DOUBLE)/count(*), 2))/1e12, 6) AS var_pop,
        |  round(min(q)/1000000.0, 6) AS mn,
        |  round(max(q)/1000000.0, 6) AS mx
        |FROM q GROUP BY pos
        |""".stripMargin) { (s, dir) =>
      embs(s, dir)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("__p", "__x")))
        .select((col("__p") + 1).cast("long").as("pos"),
          round(col("__x") * 1e6, 0).cast("long").as("q"))
        .groupBy("pos").agg(
          count(lit(1)).as("n"),
          sum("q").as("sq"),
          sum(col("q").cast("decimal(19,0)") * col("q")).as("sq2"),
          min("q").as("mnq"), max("q").as("mxq"))
        .select(col("pos"), col("n"),
          round(col("sq").cast("double") / col("n") / 1e6, 6).as("mean"),
          round((col("sq2").cast("double") / col("n")
            - pow(col("sq").cast("double") / col("n"), 2)) / 1e12, 6).as("var_pop"),
          round(col("mnq") / 1e6, 6).as("mn"),
          round(col("mxq") / 1e6, 6).as("mx"))
    },

    // Embedding-health outliers: bottom-50 cosine-to-centroid vectors.
    // Exact micro-unit centroid (dim-bounded collect), broadcast-
    // literal scoring pass, TakeOrderedAndProject bottom-k.
    QueryDef(
      "emb_outliers",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), c AS (
        |  SELECT i AS pos,
        |    CAST(sum(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 1000000.0 AS cv
        |  FROM e, range(1, 65) r(i) GROUP BY i
        |), cent AS (
        |  SELECT list(cv ORDER BY pos) AS cl FROM c
        |)
        |SELECT e.vec_id, round(list_cosine_similarity(e.v, cent.cl), 6) AS cos_centroid
        |FROM e, cent
        |ORDER BY cos_centroid, e.vec_id LIMIT 50
        |""".stripMargin) { (s, dir) =>
      Similarity.centroidOutliers(embs(s, dir), "vec_id", "embedding", k = 50)
    }
  )
}
