package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.operators.{Similarity, TextPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation-diagnostics pack: the full Gopher quality-rule gate,
  * lexical-diversity stats (type-token ratio + hapax share), and
  * embedding-health outlier detection. All three are the shapes a
  * 100 TB pretraining-data pipeline runs corpus-wide: two are
  * zero-shuffle map passes, one is a wordcount-shaped aggregation.
  */
object CurationPack {

  // spreadIfNarrow: see TrainingOps.docs — CPU-dense consumers, and
  // replicated corpora compress a 100×-scale table into one narrow
  // file; no-op below the 1 MiB floor (all small-sf test data).
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.util.ScanParallelism.spreadIfNarrow(Tables.load(s, dir, "documents"))
  private def embs(s: SparkSession, dir: String): DataFrame =
    graft.util.ScanParallelism.spreadIfNarrow(Tables.load(s, dir, "embeddings"))

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
    // (template/boilerplate corpora score low). Pure per-doc
    // statistic → one row-local kernel (TtrStats: exact byte-compare
    // word map per doc), scan + project, no exchange at any scale.
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
      docs(s, dir)
        .select(col("doc_id"), graft.functions.NativeExpressions
          .ttr_stats(col("text")).as("__t"))
        .select(col("doc_id"),
          element_at(col("__t"), 1).as("n_tokens"),
          element_at(col("__t"), 2).as("n_types"),
          element_at(col("__t"), 3).as("n_hapax"))
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
    },

    // DSIR importance resampling (Xie et al. 2023): hashed
    // unigram+bigram LMs for target (source='src0') vs raw corpus,
    // per-doc avg log-likelihood ratio, top-100 selected. Log-ratios
    // quantize to integer nano-units before the per-doc sum, so both
    // engines fold the SAME integers in any order.
    QueryDef(
      "text_dsir_sample",
      """WITH d AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    unnest(ws || list_transform(range(1, len(ws)),
        |                                i -> ws[i] || ' ' || ws[i+1])) AS g
        |  FROM d
        |), b AS (
        |  SELECT doc_id, source,
        |    CAST('0x' || substr(md5(g), 1, 6) AS BIGINT) % 2048 AS b FROM g
        |), c AS (
        |  SELECT b, sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
        |    count(*) AS cr
        |  FROM b GROUP BY 1
        |), tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM c),
        |lam AS (
        |  SELECT b, CAST(round((ln((ct + 1.0) / (tt + 2048))
        |    - ln((cr + 1.0) / (tr + 2048))) * 1e9) AS BIGINT) AS lam_q
        |  FROM c, tot
        |), s AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    round(CAST(sum(lam_q) AS DOUBLE) / 1e9 / count(*), 6) AS dsir_score
        |  FROM b JOIN lam USING (b) GROUP BY 1
        |)
        |SELECT doc_id, n_grams, dsir_score,
        |  CAST(row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS BIGINT) AS rnk
        |FROM s ORDER BY dsir_score DESC, doc_id LIMIT 100
        |""".stripMargin) { (s, dir) =>
      TextPipeline.dsirSample(docs(s, dir), "doc_id", "text",
        isTarget = col("source") === "src0", nBuckets = 2048, k = 100)
    },

    // Quality-curriculum ordering: classifier-score phases, md5
    // within-phase shuffle, global training position — the position
    // comes from the distributed two-pass ranker, never a one-task
    // global window.
    QueryDef(
      "text_curriculum",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(sum(
        |    CAST('0x' || substr(md5('clf_' || word), 1, 6) AS BIGINT) % 2001 - 1000
        |  ) AS BIGINT) AS raw_score
        |  FROM (SELECT doc_id, unnest(w) AS word FROM t) x GROUP BY 1
        |), p AS (
        |  SELECT doc_id,
        |    CASE WHEN raw_score >= 5000 THEN 0
        |         WHEN raw_score >= 0 THEN 1 ELSE 2 END AS phase,
        |    md5('cur_' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM s
        |)
        |SELECT doc_id, CAST(phase AS BIGINT) AS phase,
        |  CAST(row_number() OVER (ORDER BY phase, k, doc_id) AS BIGINT) AS global_pos
        |FROM p
        |""".stripMargin) { (s, dir) =>
      TextPipeline.curriculumOrder(docs(s, dir), "doc_id", "text",
        numPartitions = 32)
    },

    // Hybrid retrieval: BM25 lexical top-50 + dense top-50 by cosine
    // to the label-0 class centroid, fused with Reciprocal Rank
    // Fusion (k=60), top-20 reported. The fusion stage touches ≤100
    // rows whatever the corpus size.
    QueryDef(
      "sim_hybrid_rrf",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
        |), tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) u
        |  WHERE w IN ('merge', 'hash', 'scan') GROUP BY 1, 2
        |), df AS (
        |  SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
        |), scored AS (
        |  SELECT tf.doc_id,
        |    ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5)) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
        |  FROM tf JOIN df USING (w) JOIN dl USING (doc_id), stats
        |), agg AS (
        |  SELECT doc_id, round(sum(s), 6) AS score FROM scored GROUP BY 1
        |), lexr AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rnk
        |  FROM agg ORDER BY score DESC, doc_id LIMIT 50
        |), e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        |), c AS (
        |  SELECT i AS pos,
        |    CAST(sum(CAST(round(v[i] * 1000000.0) AS BIGINT)) AS DOUBLE)
        |      / count(*) / 1000000.0 AS cv
        |  FROM e, range(1, 65) r(i) WHERE label = 0 GROUP BY i
        |), cent AS (SELECT list(cv ORDER BY pos) AS cl FROM c),
        |den AS (
        |  SELECT vec_id, round(list_cosine_similarity(v, cl), 6) AS score
        |  FROM e, cent ORDER BY score DESC, vec_id LIMIT 50
        |), denr AS (
        |  SELECT vec_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS dense_rnk
        |  FROM den
        |), f AS (
        |  SELECT coalesce(l.doc_id, d.vec_id) AS doc_id, l.lex_rnk, d.dense_rnk,
        |    round(coalesce(1.0::DOUBLE / (60 + l.lex_rnk), 0.0)
        |        + coalesce(1.0::DOUBLE / (60 + d.dense_rnk), 0.0), 6) AS rrf_score
        |  FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.vec_id
        |)
        |SELECT doc_id, lex_rnk, dense_rnk, rrf_score,
        |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rnk
        |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20
        |""".stripMargin) { (s, dir) =>
      val lex = graft.operators.TextPipeline.bm25TopK(docs(s, dir), "doc_id",
        "text", terms = Seq("merge", "hash", "scan"), k = 50)
      val dense = Similarity.centroidTopK(embs(s, dir), "vec_id", "embedding",
        isMember = col("label") === 0, k = 50)
        .withColumnRenamed("vec_id", "doc_id")
      Similarity.rrfFuse(lex, dense, "doc_id", kRrf = 60, k = 20)
    },

    // Exact upper-triangle covariance of the embedding dimensions —
    // the dense aggregate PCA starts from. Micro-unit integer sums
    // (HUGEINT/decimal products) make the 2080-row matrix
    // engine-exact; the output is dim-bounded at any corpus size.
    QueryDef(
      "emb_covariance",
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (
        |  SELECT i, j,
        |    CAST(round(v[i]*1000000.0) AS BIGINT) AS qi,
        |    CAST(round(v[j]*1000000.0) AS BIGINT) AS qj
        |  FROM e, range(1, 65) r(i), range(1, 65) r2(j)
        |  WHERE j >= i
        |)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  count(*) AS n,
        |  round((CAST(sum(CAST(qi AS HUGEINT) * qj) AS DOUBLE) / count(*)
        |    - (CAST(sum(qi) AS DOUBLE) / count(*))
        |      * (CAST(sum(qj) AS DOUBLE) / count(*))) / 1e12, 6) AS cov
        |FROM q GROUP BY i, j
        |""".stripMargin) { (s, dir) =>
      Similarity.covarianceUpper(embs(s, dir), "embedding", dim = 64)
    },

    // PCA projection onto the top-8 principal components. The
    // eigenbasis comes from a driver-side Jacobi solve of the
    // (oracled) covariance matrix — not SQL-replicable, so this query
    // is rows-gated here and invariant-checked in PcaSpec
    // (orthonormal basis, descending eigenvalues, projection Gram ≈
    // eigenvalue diagonal).
    QueryDef.noOracle("emb_pca_project") { (s, dir) =>
      Similarity.pcaProject(embs(s, dir), "vec_id", "embedding",
        dim = 64, nComponents = 8)
    },

    // Value-level oracle companion for emb_pca_project: the eigenbasis
    // itself is not SQL-replicable, but three of its defining
    // invariants ARE, so DuckDB can hash-check them from the raw
    // embeddings while Spark derives them THROUGH the projections:
    //   parseval          — full-basis (64-component) projection
    //                       conserves each vector's squared norm:
    //                       per-vector |sum(proj²) − sum(x²)| must be
    //                       ≤ 5e-4 (Jacobi orthonormality error ~1e-12
    //                       plus per-proj 1e-6 rounding accumulate to
    //                       ≤1e-4). Emitted as a per-vector 0/1 flag
    //                       with an explicit tolerance rather than
    //                       rounded-value equality — rounding both
    //                       sides to 3 decimals was only safe while no
    //                       true norm sat within ~1e-4 of a 0.0005
    //                       boundary, a data-dependent accident;
    //   proj_cov_offdiag  — projections onto distinct eigenvectors are
    //                       uncorrelated over the corpus
    //                       (cov = wᵢᵀΣwⱼ = 0 ± quantization ≤ 1e-5,
    //                       rounded to 4), for the top-8 pairs;
    //   eigen_desc        — per-component projection variance is
    //                       non-increasing in pc (eigenvalues sorted).
    // A wrong eigensolver, a non-orthonormal basis, or a mis-sorted
    // component order each flip at least one of these values.
    QueryDef(
      "emb_pca_invariants",
      """SELECT 'parseval' AS metric, vec_id AS i, CAST(0 AS BIGINT) AS j,
        |  1.0 AS value
        |FROM embeddings
        |UNION ALL
        |SELECT 'proj_cov_offdiag' AS metric, a.i, b.j, 0.0 AS value
        |FROM range(1, 9) a(i), range(1, 9) b(j) WHERE a.i < b.j
        |UNION ALL
        |SELECT 'eigen_desc' AS metric, CAST(0 AS BIGINT) AS i,
        |  CAST(0 AS BIGINT) AS j, 1.0 AS value
        |""".stripMargin) { (s, dir) =>
      val proj = Similarity.pcaProject(embs(s, dir), "vec_id", "embedding",
        dim = 64, nComponents = 64)
        .transform(graft.util.Checkpoints.pinLazy)
      val rawNorm = embs(s, dir).select(col("vec_id"),
        expr("aggregate(transform(CAST(embedding AS array<double>), x -> x * x)," +
          " 0.0D, (a, b) -> a + b)").as("__raw"))
      val pars = proj.groupBy("vec_id")
        .agg(sum(col("proj") * col("proj")).as("__pn"))
        .join(rawNorm, "vec_id")
        .select(lit("parseval").as("metric"), col("vec_id").as("i"),
          lit(0L).as("j"),
          when(abs(col("__pn") - col("__raw")) <= 5e-4, 1.0).otherwise(0.0)
            .as("value"))
      val p8 = proj.filter(col("pc") <= 8)
      val offd = p8.select(col("vec_id"), col("pc").as("i"), col("proj").as("pi"))
        .join(p8.select(col("vec_id"), col("pc").as("j"), col("proj").as("pj")), "vec_id")
        .filter(col("i") < col("j"))
        .groupBy("i", "j")
        .agg((round(covar_pop(col("pi"), col("pj")), 4) + lit(0.0)).as("value"))
        .select(lit("proj_cov_offdiag").as("metric"), col("i"), col("j"), col("value"))
      val vw = org.apache.spark.sql.expressions.Window.orderBy(col("pc"))
      val desc = proj.groupBy("pc").agg(var_pop(col("proj")).as("v"))
        .withColumn("nxt", lead(col("v"), 1).over(vw))
        .agg(min(when(col("nxt").isNull || col("v") >= col("nxt") - 1e-5, 1.0)
          .otherwise(0.0)).as("value"))
        .select(lit("eigen_desc").as("metric"), lit(0L).as("i"),
          lit(0L).as("j"), col("value"))
      pars.unionByName(offd).unionByName(desc)
    },

    // Zipf-slope fit over the vocabulary head: log-log OLS of
    // frequency against rank (natural corpora fit slope ≈ −1;
    // template/boilerplate corpora flatten). Top-1000 ranks come
    // from the TakeOrdered vocab head (per-partition heaps), the
    // regression is one regr_slope/regr_r2 aggregate over 1000 rows.
    QueryDef(
      "text_zipf_fit",
      """WITH w AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
        |), c AS (
        |  SELECT word, count(*) AS n FROM w GROUP BY 1
        |), r AS (
        |  SELECT n, row_number() OVER (ORDER BY n DESC, word) AS rnk FROM c
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_ranks,
        |  round(regr_slope(ln(n), ln(rnk)), 6) AS zipf_slope,
        |  round(regr_r2(ln(n), ln(rnk)), 6) AS r2
        |FROM r WHERE rnk <= 1000
        |""".stripMargin) { (s, dir) =>
      val head = TextPipeline.vocabTopK(docs(s, dir), "text", k = 1000)
      head.agg(count(lit(1)).as("n_ranks"),
        round(expr("regr_slope(ln(n), ln(rnk))"), 6).as("zipf_slope"),
        round(expr("regr_r2(ln(n), ln(rnk))"), 6).as("r2"))
    },

    // Weighted sampling without replacement (Efraimidis & Spirakis
    // 2006, "A-ES"): key = u^(1/w) with a deterministic md5 uniform
    // draw, top-k by key — the length-weighted "sample proportional
    // to tokens" draw pipelines use. Entirely row-local until the
    // TakeOrderedAndProject top-k; ranks are over the ROUNDED key so
    // cross-engine float noise cannot reorder the cut.
    QueryDef(
      "text_weighted_sample",
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST('0x' || substr(md5('ws_' || CAST(doc_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS h
        |  FROM documents
        |), k AS (
        |  SELECT doc_id, n_chars,
        |    round(exp(ln((h + 1.0) / 281474976710656.0)
        |      / (n_chars / 100.0)), 6) AS key
        |  FROM d
        |)
        |SELECT doc_id, n_chars, key,
        |  CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rnk
        |FROM k ORDER BY key DESC, doc_id LIMIT 100
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
        conv(substring(md5(concat(lit("ws_"), col("doc_id").cast("string"))),
          1, 12), 16, 10).cast("long").as("h"))
      val keyed = d.select(col("doc_id"), col("n_chars"),
        round(exp(log((col("h") + 1.0) / 281474976710656.0)
          / (col("n_chars") / 100.0)), 6).as("key"))
      val top = keyed.orderBy(col("key").desc, col("doc_id")).limit(100)
      top.withColumn("rnk", row_number()
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col("key").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("n_chars"), col("key"), col("rnk"))
    },

    // Population Stability Index between the train and holdout
    // splits over token-length bins — the standard drift monitor a
    // production corpus pipeline alarms on (PSI > 0.2 ⇒ investigate).
    // Bins have FIXED edges (100-token steps, capped at bin 7) and
    // add-one smoothing, so every probability is derived from exact
    // integers; the split is the engine-portable md5 per-mille draw.
    // One corpus pass → ≤8-row aggregate; arithmetic on the bin table.
    QueryDef(
      "text_psi_drift",
      """WITH d AS (
        |  SELECT len(string_split(text, ' ')) AS nt,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |      % 1000 AS b
        |  FROM documents
        |), binned AS (
        |  SELECT CASE WHEN nt // 100 > 7 THEN 7 ELSE nt // 100 END AS bin,
        |         CASE WHEN b < 800 THEN 1 ELSE 0 END AS is_train
        |  FROM d
        |), c AS (
        |  SELECT bin, sum(is_train) AS n_train, sum(1 - is_train) AS n_hold
        |  FROM binned GROUP BY 1
        |), tot AS (SELECT sum(n_train) AS tt, sum(n_hold) AS th, count(*) AS nb FROM c)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(n_train AS BIGINT) AS n_train, CAST(n_hold AS BIGINT) AS n_hold,
        |  round((n_train + 1.0) / (tt + nb), 6) AS p_train,
        |  round((n_hold + 1.0) / (th + nb), 6) AS p_hold,
        |  round(((n_train + 1.0) / (tt + nb) - (n_hold + 1.0) / (th + nb))
        |    * ln(((n_train + 1.0) / (tt + nb)) / ((n_hold + 1.0) / (th + nb))), 6)
        |    AS psi_term
        |FROM c, tot
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(
        TextFunctions.spaceTokenCount(col("text")).as("nt"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 1000).as("b"))
      val binned = d.select(
        least(expr("nt div 100"), lit(7L)).as("bin"),
        when(col("b") < 800, 1L).otherwise(0L).as("is_train"))
      val c = binned.groupBy("bin").agg(
        sum("is_train").as("n_train"),
        sum(lit(1L) - col("is_train")).as("n_hold"))
      val tot = c.agg(sum("n_train").as("tt"), sum("n_hold").as("th"),
        count(lit(1)).as("nb"))
      val pt = (col("n_train") + 1.0) / (col("tt") + col("nb"))
      val ph = (col("n_hold") + 1.0) / (col("th") + col("nb"))
      c.crossJoin(broadcast(tot)).select(
        col("bin"), col("n_train"), col("n_hold"),
        round(pt, 6).as("p_train"), round(ph, 6).as("p_hold"),
        round((pt - ph) * log(pt / ph), 6).as("psi_term"))
    },

    // Winnowing fingerprint overlap (MOSS): k=5-gram md5 hashes,
    // w=4 window minima, distinct per doc; docs sharing ≥2
    // fingerprints pair up (fingerprints hitting >50 docs are
    // boilerplate and drop, like the shingle blocker).
    QueryDef(
      "dedup_winnow",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(ws) - 3),
        |      i -> CAST('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)
        |           AS BIGINT)) AS hs
        |  FROM t WHERE len(ws) >= 8
        |), f AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(hs) - 2),
        |      j -> list_min(hs[j:j+3]))) AS fps
        |  FROM g
        |), p AS (
        |  SELECT doc_id AS doc, unnest(fps) AS fp FROM f
        |), blocked AS (
        |  SELECT fp FROM p GROUP BY fp HAVING count(*) BETWEEN 2 AND 50
        |), pb AS (SELECT p.doc, p.fp FROM p JOIN blocked USING (fp))
        |SELECT a.doc AS doc_a, b.doc AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM pb a JOIN pb b USING (fp)
        |WHERE a.doc < b.doc
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_shared DESC, doc_a, doc_b LIMIT 100
        |""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.winnowPairs(docs(s, dir), "doc_id", "text",
        k = 5, w = 4, maxDf = 50, minShared = 2, topN = 100)
    }
  )
}
