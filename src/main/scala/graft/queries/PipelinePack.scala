package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.{Behavioral, Similarity, TextPipeline}
import org.apache.spark.sql.functions._

/** Round-3 surface growth: behavioral analytics (funnel / retention —
  * the ClickHouse-function classes the reference's backends expose)
  * and the corpus-level training-pipeline operators (benchmark
  * decontamination, repetition signals, bigram-LM quality scoring,
  * BM25 retrieval, sequence packing, semantic dedup). Every entry
  * carries a full DuckDB value oracle.
  */
object PipelinePack {

  // spreadIfNarrow: see TrainingOps.docs — CPU-dense consumers, and
  // replicated corpora compress a 100×-scale table into one narrow
  // file; no-op below the 1 MiB floor (all small-sf test data).
  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.util.ScanParallelism.spreadIfNarrow(Tables.load(s, dir, "documents"))
  private def embs(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.util.ScanParallelism.spreadIfNarrow(Tables.load(s, dir, "embeddings"))
  private def events(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  /** The BPE training loop as unrolled DuckDB CTEs: per round, pair
    * counts over the distinct-word symbol table, the argmax merge
    * (ties lexicographic), greedy-left-to-right application via the
    * consecutive-run/alternate-position window trick (a match at i is
    * taken iff its offset within its run of consecutive matches is
    * even — exactly the greedy semantics, since runs only form when
    * lhs = rhs). Shared by the train and encode oracles.
    *
    * Every multi-consumer CTE is AS MATERIALIZED: s{r} feeds three
    * round-(r+1) consumers, so inlining re-expands the whole prefix
    * 3^rounds times — the un-hinted form never finished at sf0.01. */
  private def bpeCtes(n: Int): String = {
    val head =
      """WITH w0 AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents) u
        |  WHERE w <> '' GROUP BY 1
        |), s0 AS MATERIALIZED (
        |  SELECT w, c, list_transform(range(1, length(w) + 1), i -> w[i:i]) AS sym
        |  FROM w0
        |)""".stripMargin
    head + (1 to n).map { r =>
      s""", p$r AS (
         |  SELECT sym[i] AS lhs, sym[i + 1] AS rhs, CAST(sum(c) AS BIGINT) AS pc
         |  FROM (SELECT c, sym, unnest(range(1, len(sym))) AS i FROM s${r - 1}) u
         |  GROUP BY 1, 2
         |), m$r AS MATERIALIZED (
         |  SELECT lhs, rhs, pc FROM p$r ORDER BY pc DESC, lhs, rhs LIMIT 1
         |), mt$r AS (
         |  SELECT u.w, u.i
         |  FROM (SELECT w, sym, unnest(range(1, len(sym))) AS i FROM s${r - 1}) u, m$r
         |  WHERE u.sym[u.i] = m$r.lhs AND u.sym[u.i + 1] = m$r.rhs
         |), g$r AS (
         |  SELECT w, i, i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
         |  FROM mt$r
         |), sel$r AS MATERIALIZED (
         |  SELECT w, i FROM (
         |    SELECT w, i, min(i) OVER (PARTITION BY w, grp) AS mn FROM g$r) t
         |  WHERE (i - mn) % 2 = 0
         |), rb$r AS (
         |  SELECT s.w, s.c, s.i,
         |    CASE WHEN sj.i IS NOT NULL THEN s.sym[s.i] || s.sym[s.i + 1]
         |         ELSE s.sym[s.i] END AS tok,
         |    sp.i IS NOT NULL AS skip
         |  FROM (SELECT w, c, sym, unnest(range(1, len(sym) + 1)) AS i FROM s${r - 1}) s
         |  LEFT JOIN sel$r sj ON sj.w = s.w AND sj.i = s.i
         |  LEFT JOIN sel$r sp ON sp.w = s.w AND sp.i = s.i - 1
         |), s$r AS MATERIALIZED (
         |  SELECT w, c, list(tok ORDER BY i) AS sym FROM rb$r WHERE NOT skip GROUP BY 1, 2
         |)""".stripMargin
    }.mkString
  }

  private val BpeMerges = 6

  val defs: Seq[QueryDef] = Seq(

    // ---- behavioral analytics -------------------------------------
    // Sequential funnel view → click → purchase within 24 hours of the
    // first view (ClickHouse windowFunnel strict-order semantics via
    // staged minima — deterministic, so both engines must agree).
    QueryDef(
      "q_funnel",
      """WITH base AS (SELECT user_id, ts, event_type FROM events),
        |u1 AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM base GROUP BY 1
        |), u2 AS (
        |  SELECT b.user_id, u1.t1,
        |    min(CASE WHEN b.event_type = 'click' AND b.ts > u1.t1 THEN b.ts END) AS t2
        |  FROM base b JOIN u1 USING (user_id) GROUP BY 1, 2
        |), u3 AS (
        |  SELECT b.user_id, u2.t1, u2.t2,
        |    min(CASE WHEN b.event_type = 'purchase' AND b.ts > u2.t2 THEN b.ts END) AS t3
        |  FROM base b JOIN u2 USING (user_id) GROUP BY 1, 2, 3
        |)
        |SELECT user_id, CAST(
        |  CASE WHEN t1 IS NULL THEN 0
        |       WHEN t3 IS NOT NULL AND t3 <= t1 + INTERVAL 24 HOUR THEN 3
        |       WHEN t2 IS NOT NULL AND t2 <= t1 + INTERVAL 24 HOUR THEN 2
        |       ELSE 1 END AS BIGINT) AS funnel_level
        |FROM u3
        |""".stripMargin) { (s, dir) =>
      Behavioral.windowFunnel(events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSeconds = 86400L)
    },

    // Cohort retention: users bucketed by first-activity date; d1 and
    // d7+ return counts per cohort.
    QueryDef(
      "q_retention",
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
        |), a AS (
        |  SELECT e.user_id, f.d0,
        |    date_diff('day', f.d0, CAST(e.ts AS DATE)) AS dd
        |  FROM events e JOIN f USING (user_id)
        |)
        |SELECT CAST(d0 AS VARCHAR) AS cohort_date,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT CASE WHEN dd = 1 THEN user_id END) AS d1_retained,
        |  count(DISTINCT CASE WHEN dd >= 7 THEN user_id END) AS d7_retained
        |FROM a GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Behavioral.retentionCohorts(events(s, dir), "user_id", "ts")
    },

    // Top event-path transitions (Sankey / user-flow): successor pairs
    // per user ordered by (ts, event_id), counted corpus-wide.
    QueryDef(
      "q_event_paths",
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, from_type, to_type) AS BIGINT) AS rnk
        |FROM c ORDER BY n DESC, from_type, to_type LIMIT 20
        |""".stripMargin) { (s, dir) =>
      Behavioral.topTransitions(events(s, dir), "user_id", "ts", "event_type",
        tieCol = "event_id", k = 20)
    },

    // ---- training-pipeline corpus operators -----------------------
    // Benchmark decontamination: train split (md5 bucket < 80) docs
    // flagged by 8-gram overlap with the test split (bucket >= 90) —
    // the same deterministic split text_dataset_split publishes, so
    // the operator composes with it leak-free.
    QueryDef(
      "text_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8
        |    THEN list_distinct(list_transform(range(1, len(t) - 6),
        |         i -> array_to_string(t[i:i+7], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS g
        |  FROM toks
        |), buck AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS b
        |  FROM documents
        |), eg AS (
        |  SELECT DISTINCT g FROM sh JOIN buck USING (doc_id) WHERE b >= 90
        |), hits AS (
        |  SELECT sh.doc_id, count(*) AS n_hits
        |  FROM sh JOIN eg USING (g) JOIN buck ON buck.doc_id = sh.doc_id
        |  WHERE buck.b < 80 GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d JOIN buck USING (doc_id)
        |LEFT JOIN hits h ON h.doc_id = d.doc_id
        |WHERE buck.b < 80
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val bucket = graft.functions.TextFunctions.splitBucket(col("doc_id"))
      TextPipeline.contaminationHits(
        d.filter(bucket < 80), d.filter(bucket >= 90), "doc_id", "text", n = 8)
    },

    // Gopher-style repetition signals: duplicate-word fraction and the
    // dominant bigram's share — the boilerplate/spam filter inputs.
    QueryDef(
      "text_repetition",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    round(1.0 - len(list_distinct(w)) * 1.0 / len(w), 6) AS dup_word_frac,
        |    list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bg
        |  FROM t
        |), tb AS (
        |  SELECT doc_id, g AS top_bigram, CAST(c AS BIGINT) AS top_bigram_n FROM (
        |    SELECT doc_id, g, count(*) AS c,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g) AS r
        |    FROM (SELECT doc_id, unnest(bg) AS g FROM base) u
        |    GROUP BY doc_id, g) ranked
        |  WHERE r = 1
        |)
        |SELECT b.doc_id, b.n_words, b.dup_word_frac, tb.top_bigram, tb.top_bigram_n,
        |  round(tb.top_bigram_n * 1.0 / (b.n_words - 1), 6) AS top_bigram_frac
        |FROM base b LEFT JOIN tb USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextPipeline.repetitionStats(col("text")).as("__rep"))
        .select(col("doc_id"),
          col("__rep.n_words").as("n_words"),
          col("__rep.dup_word_frac").as("dup_word_frac"),
          col("__rep.top_bigram").as("top_bigram"),
          col("__rep.top_bigram_n").as("top_bigram_n"),
          col("__rep.top_bigram_frac").as("top_bigram_frac"))
    },

    // Self-trained bigram LM with add-one smoothing: per-doc mean log
    // probability — the KenLM/CCNet-shaped perplexity quality filter.
    QueryDef(
      "text_ngram_lm",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), c1 AS (
        |  SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) u GROUP BY 1
        |), v AS (
        |  SELECT count(*) AS vv FROM c1
        |), ig AS (
        |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
        |), bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM ig
        |), c12 AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
        |), scored AS (
        |  SELECT bg.doc_id, ln((c12.c12 + 1.0) / (c1.c1 + v.vv)) AS lp
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 ON c1.w = bg.w1, v
        |), agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    round(avg(lp), 6) AS avg_logp
        |  FROM scored GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, a.avg_logp
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      TextPipeline.bigramLmScore(docs(s, dir), "doc_id", "text")
    },

    // BM25 top-20 for a 3-term query — keyword retrieval over the
    // corpus, idf/avgdl trained on the corpus itself.
    QueryDef(
      "sim_bm25",
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
        |)
        |SELECT doc_id, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |FROM agg ORDER BY score DESC, doc_id LIMIT 20
        |""".stripMargin) { (s, dir) =>
      TextPipeline.bm25TopK(docs(s, dir), "doc_id", "text",
        terms = Seq("merge", "hash", "scan"), k = 20)
    },

    // Concat-and-chunk sequence packing into 2048-token training
    // sequences, doc_id order — global prefix sum, distributed.
    QueryDef(
      "text_seq_pack",
      """SELECT doc_id, n_tokens,
        |  CAST(cum // 2048 AS BIGINT) AS seq_id,
        |  CAST(cum % 2048 AS BIGINT) AS seq_offset
        |FROM (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM (SELECT doc_id,
        |          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents) c) p
        |""".stripMargin) { (s, dir) =>
      TextPipeline.packSequences(docs(s, dir), "doc_id", "text",
        seqLen = 2048, numPartitions = s.sparkContext.defaultParallelism)
    },

    // SemDeDup: IVF cells bound the comparison set; within a cell,
    // drop any vector with a lower-id cell-mate at cosine >= 0.35.
    // Same deterministic quantizer as ann_ivf_topk, so DuckDB
    // replicates cells, pairs, and verdicts exactly.
    QueryDef(
      "dedup_semantic",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), cent AS (
        |  SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 50 = 0
        |), assigned AS (
        |  SELECT vec_id, v, centroid_id AS cell FROM (
        |    SELECT e.vec_id, e.v, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.centroid_id) AS r
        |    FROM e, cent c) t WHERE r = 1
        |), dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM assigned a JOIN assigned b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35
        |)
        |SELECT a.vec_id, a.cell, d.vec_id IS NULL AS is_kept
        |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
        |""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      val centroids = Similarity.seedCentroids(e, "vec_id", "embedding", stride = 50)
      Similarity.semanticDedup(e, "vec_id", "embedding", centroids, threshold = 0.35)
    },

    // Exact repeated-substring spans (fixed 10-word windows): per doc,
    // how many words sit inside a run shared verbatim with another
    // doc — the suffix-array-style dedup signal, interval-unioned.
    QueryDef(
      "dedup_substring",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+9], ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS i
        |        FROM t WHERE len(w) >= 10) u
        |), dup AS (
        |  SELECT g FROM g GROUP BY g HAVING min(doc_id) <> max(doc_id)
        |), cov AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS s, CAST(pos + 9 AS BIGINT) AS e
        |  FROM g JOIN dup USING (g)
        |), isl AS (
        |  SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
        |      PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |    THEN 1 ELSE 0 END AS nw
        |  FROM cov
        |), num AS (
        |  SELECT doc_id, s, e,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS isl
        |  FROM isl
        |), spans AS (
        |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS span FROM (
        |    SELECT doc_id, isl, max(e) - min(s) + 1 AS len
        |    FROM num GROUP BY 1, 2) i GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
        |  coalesce(s.span, 0) AS dup_span_words,
        |  round(coalesce(s.span, 0) * 1.0 / len(t.w), 6) AS dup_span_frac
        |FROM t LEFT JOIN spans s USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.substringSpans(docs(s, dir), "doc_id", "text", k = 10)
    },

    // The rewrite the span signal feeds: duplicated 10-word runs are
    // cut from the text everywhere (symmetric remove-all policy),
    // survivors re-assemble in position order.
    QueryDef(
      "dedup_substring_rewrite",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+9], ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS i
        |        FROM t WHERE len(w) >= 10) u
        |), dup AS (
        |  SELECT g FROM g GROUP BY g HAVING min(doc_id) <> max(doc_id)
        |), cov AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS s, CAST(pos + 9 AS BIGINT) AS e
        |  FROM g JOIN dup USING (g)
        |), isl AS (
        |  SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
        |      PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |    THEN 1 ELSE 0 END AS nw
        |  FROM cov
        |), num AS (
        |  SELECT doc_id, s, e,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS isl
        |  FROM isl
        |), merged AS (
        |  SELECT doc_id, min(s) AS s, max(e) AS e FROM num GROUP BY doc_id, isl
        |), covp AS (
        |  SELECT doc_id, unnest(range(s, e + 1)) AS p FROM merged
        |), words AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, w[i] AS word
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM t) u
        |), clean AS (
        |  SELECT wo.doc_id, string_agg(wo.word, ' ' ORDER BY wo.p) AS clean_text
        |  FROM words wo ANTI JOIN covp c ON c.doc_id = wo.doc_id AND c.p = wo.p
        |  GROUP BY 1
        |), removed AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM covp GROUP BY 1
        |)
        |SELECT t.doc_id, coalesce(cl.clean_text, '') AS clean_text,
        |  coalesce(r.n_removed, 0) AS n_removed
        |FROM t LEFT JOIN clean cl USING (doc_id) LEFT JOIN removed r USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.substringDedupRewrite(docs(s, dir), "doc_id", "text", k = 10)
    },

    // Variable-length duplicated runs (the maximal-run form of the
    // suffix-array dedup signal): adjacent duplicated 10-gram anchors
    // merge into maximal islands whose lengths ARE the run lengths;
    // per doc, the longest run and the count of runs >= 20 words.
    QueryDef(
      "dedup_substring_runs",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), g AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+9], ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS i
        |        FROM t WHERE len(w) >= 10) u
        |), dup AS (
        |  SELECT g FROM g GROUP BY g HAVING min(doc_id) <> max(doc_id)
        |), cov AS (
        |  SELECT doc_id, CAST(pos AS BIGINT) AS s, CAST(pos + 9 AS BIGINT) AS e
        |  FROM g JOIN dup USING (g)
        |), isl AS (
        |  SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
        |      PARTITION BY doc_id ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |    THEN 1 ELSE 0 END AS nw
        |  FROM cov
        |), num AS (
        |  SELECT doc_id, s, e,
        |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS isl
        |  FROM isl
        |), runs AS (
        |  SELECT doc_id, max(e) - min(s) + 1 AS len FROM num GROUP BY doc_id, isl
        |), agg AS (
        |  SELECT doc_id, max(len) AS longest_run,
        |    CAST(sum(CASE WHEN len >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        |  FROM runs GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
        |  coalesce(a.longest_run, 0) AS longest_run,
        |  coalesce(a.n_runs, 0) AS n_runs_min
        |FROM t LEFT JOIN agg a USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.substringRuns(docs(s, dir), "doc_id", "text",
        k = 10, minRun = 20)
    },

    // Domain-mixture rebalancing by language: rates trained from the
    // observed counts against target per-mille weights, rows drawn by
    // engine-independent md5 bucket.
    QueryDef(
      "text_mixture_sample",
      """WITH c AS (
        |  SELECT lang, count(*) AS n,
        |    CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 150 WHEN 'es' THEN 150
        |              WHEN 'fr' THEN 150 WHEN 'zh' THEN 150 END AS w
        |  FROM documents GROUP BY 1
        |), t AS (
        |  SELECT min(n * 1000 // w) AS T FROM c WHERE w IS NOT NULL AND w > 0
        |), r AS (
        |  SELECT lang, CAST(T * w // n AS BIGINT) AS rate_per_mille
        |  FROM c, t WHERE w IS NOT NULL AND w > 0
        |)
        |SELECT d.doc_id, d.lang, r.rate_per_mille
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        |  % 1000 < r.rate_per_mille
        |""".stripMargin) { (s, dir) =>
      TextPipeline.mixtureSample(docs(s, dir), "doc_id", "lang",
        Map("en" -> 400, "de" -> 150, "es" -> 150, "fr" -> 150, "zh" -> 150))
    },

    // Vocabulary head: top-256 words with rank and cumulative share of
    // all corpus tokens.
    QueryDef(
      "text_vocab",
      """WITH w AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
        |), c AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS t FROM c
        |), top AS (
        |  SELECT word, n FROM c ORDER BY n DESC, word LIMIT 256
        |)
        |SELECT word, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rnk,
        |  round(sum(n) OVER (ORDER BY n DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot.t, 6) AS cum_share
        |FROM top, tot
        |""".stripMargin) { (s, dir) =>
      TextPipeline.vocabTopK(docs(s, dir), "text", k = 256)
    },

    // Asymmetric containment: |A∩B| / |A| per direction — catches the
    // doc-quotes-doc subsets Jaccard is blind to. Same rare-shingle
    // blocking as dedup_ngram_jaccard.
    QueryDef(
      "dedup_containment",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(range(1, len(t) - 3),
        |         i -> array_to_string(t[i:i+4], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM toks
        |), sizes AS (
        |  SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1
        |), rare AS (
        |  SELECT s FROM sh GROUP BY s HAVING count(*) <= 100
        |), blocked AS (
        |  SELECT sh.doc_id, sh.s FROM sh JOIN rare USING (s)
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
        |  FROM blocked a JOIN blocked b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, n_common,
        |  round(n_common * 1.0 / sa.set_size, 6) AS containment_a,
        |  round(n_common * 1.0 / sb.set_size, 6) AS containment_b
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE greatest(n_common * 1.0 / sa.set_size,
        |               n_common * 1.0 / sb.set_size) >= 0.5
        |""".stripMargin) { (s, dir) =>
      graft.operators.Dedup.containmentPairs(docs(s, dir), "doc_id", "text",
        shingleK = 5, threshold = 0.5, maxShingleFreq = 100)
    },

    // C4-style duplicated-sentence signal: fraction of a doc's
    // sentences (split on '.', trimmed, >= 20 chars) that appear
    // verbatim in at least one OTHER doc.
    QueryDef(
      "dedup_sentences",
      """WITH sents AS (
        |  SELECT doc_id, trim(x) AS sent
        |  FROM (SELECT doc_id, unnest(string_split(text, '.')) AS x
        |        FROM documents) u
        |  WHERE length(trim(x)) >= 20
        |), d AS (
        |  SELECT sent FROM sents GROUP BY sent HAVING min(doc_id) <> max(doc_id)
        |), per AS (
        |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
        |    CAST(sum(CASE WHEN d.sent IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
        |  FROM sents s LEFT JOIN d ON d.sent = s.sent
        |  GROUP BY 1
        |)
        |SELECT doc.doc_id,
        |  coalesce(per.n_sentences, 0) AS n_sentences,
        |  coalesce(per.n_dup, 0) AS n_dup_sentences,
        |  CASE WHEN coalesce(per.n_sentences, 0) > 0
        |       THEN round(per.n_dup * 1.0 / per.n_sentences, 6)
        |       ELSE 0.0 END AS dup_sentence_frac
        |FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id
        |""".stripMargin) { (s, dir) =>
      TextPipeline.duplicatedSentenceStats(docs(s, dir), "doc_id", "text",
        minChars = 20)
    },

    // Domain-level curation gate: per source, exact-dup rate, hashed
    // classifier score aggregates, and the keep verdict — all
    // integer-derived, so both engines agree on every boundary.
    QueryDef(
      "text_source_quality",
      """WITH s AS (
        |  SELECT d.source, md5(d.text) AS h, length(d.text) AS nc,
        |    (SELECT CAST(coalesce(sum(
        |       CAST('0x' || substr(md5('clf_' || w.w), 1, 6) AS BIGINT) % 2001 - 1000
        |     ), 0) AS BIGINT)
        |     FROM unnest(string_split(lower(d.text), ' ')) w(w)) AS sc
        |  FROM documents d
        |), a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(DISTINCT h) AS BIGINT) AS uniq,
        |    CAST(sum(sc) AS BIGINT) AS sum_score,
        |    CAST(sum(nc) AS BIGINT) AS chars
        |  FROM s GROUP BY 1
        |)
        |SELECT source, n_docs,
        |  round(1.0 - uniq * 1.0 / n_docs, 6) AS dup_rate,
        |  sum_score,
        |  round(sum_score * 1.0 / n_docs, 4) AS avg_score,
        |  round(chars * 1.0 / n_docs, 4) AS avg_chars,
        |  (sum_score > 0 AND uniq * 2 > n_docs) AS keep
        |FROM a
        |""".stripMargin) { (s, dir) =>
      TextPipeline.sourceQuality(docs(s, dir), "text", "source")
    },

    // kNN label classification over the embeddings — the probe task
    // that judges embedding quality: majority label among the top-10
    // cosine neighbors (ties -> smallest label) vs the true label.
    QueryDef(
      "ann_knn_classify",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS lb
        |  FROM embeddings
        |), q AS (SELECT vec_id AS query_id, v AS qv, lb AS true_label
        |         FROM e WHERE vec_id < 50),
        |cand AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id, e.lb,
        |    round(list_cosine_similarity(e.v, q.qv), 6) AS cs
        |  FROM q, e WHERE e.vec_id <> q.query_id
        |), topk AS (
        |  SELECT query_id, neighbor_id, lb FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cs DESC, neighbor_id) AS r FROM cand) t
        |  WHERE r <= 10
        |), votes AS (
        |  SELECT query_id, lb, count(*) AS c FROM topk GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id, lb AS pred_label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY c DESC, lb) AS r FROM votes) t
        |  WHERE r = 1
        |)
        |SELECT q.query_id, q.true_label, p.pred_label,
        |  q.true_label = p.pred_label AS correct
        |FROM q JOIN pred p USING (query_id)
        |""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      // size-adaptive: brute (the oracle's exact shape) below the
      // single-scan limit — which covers every oracled sf — IVF-routed
      // above it (sf1+ bench corpora), the analyticRankQuery pattern
      Similarity.knnClassifyAdaptive(e, "vec_id", "embedding", "label",
        e.filter(col("vec_id") < 50).select(col("vec_id").as("qid"),
          col("embedding").as("qvec")),
        "qid", "qvec", k = 10)
    },

    // Domain-frequency stats over extracted URLs — the input every
    // web-corpus blocklist/allowlist gate consumes. URLs are PLANTED
    // deterministically (same pattern as text_pii_redact: the
    // synthetic corpus carries none), extraction is a real regex scan,
    // and the per-domain aggregate is word-count-shaped.
    QueryDef(
      "text_domain_stats",
      """WITH planted AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |      THEN ' see https://site' || (doc_id % 50) || '.example.org/p/' || doc_id
        |           || ' and http://mirror' || (doc_id % 7) || '.example.net/x'
        |      ELSE '' END AS text
        |  FROM documents
        |), urls AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text,
        |    'https?://[A-Za-z0-9.-]+')) AS u
        |  FROM planted
        |), domains AS (
        |  SELECT doc_id, regexp_replace(u, '^https?://', '') AS domain FROM urls
        |)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM domains GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" see https://site"), pmod(col("doc_id"), lit(50)),
            lit(".example.org/p/"), col("doc_id"),
            lit(" and http://mirror"), pmod(col("doc_id"), lit(7)),
            lit(".example.net/x"))).otherwise(lit(""))).as("text"))
      TextPipeline.domainStats(planted, "doc_id", "text")
    },

    // Embedding-space diagnostics: per IVF cell, size, majority label
    // and purity — integer counts, engine-exact boundaries.
    QueryDef(
      "emb_cluster_purity",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS lb
        |  FROM embeddings
        |), cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 50 = 0),
        |assigned AS (
        |  SELECT vec_id, lb, centroid_id AS cell FROM (
        |    SELECT e.vec_id, e.lb, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.centroid_id) AS r
        |    FROM e, cent c) t WHERE r = 1
        |), byl AS (
        |  SELECT cell, lb, CAST(count(*) AS BIGINT) AS c
        |  FROM assigned GROUP BY 1, 2
        |), tot AS (
        |  SELECT cell, CAST(sum(c) AS BIGINT) AS n FROM byl GROUP BY 1
        |), top AS (
        |  SELECT cell, lb, c FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cell
        |      ORDER BY c DESC, lb) AS r FROM byl) t WHERE r = 1
        |)
        |SELECT t.cell, tot.n AS n_vectors, t.lb AS majority_label,
        |  t.c AS n_majority, round(t.c * 1.0 / tot.n, 6) AS purity
        |FROM top t JOIN tot USING (cell)
        |""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      val centroids = Similarity.seedCentroids(e, "vec_id", "embedding", stride = 50)
      Similarity.clusterPurity(e, "vec_id", "embedding", "label", centroids)
    },

    // The kNN-classify SCALE path: same vote/argmax, neighbors from
    // the IVF route (nProbe cells per query, not the corpus).
    QueryDef(
      "ann_knn_classify_ivf",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS lb
        |  FROM embeddings
        |), cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 50 = 0),
        |assigned AS (
        |  SELECT vec_id, v, lb, centroid_id AS cell FROM (
        |    SELECT e.vec_id, e.v, e.lb, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.centroid_id) AS r
        |    FROM e, cent c) t WHERE r = 1
        |),
        |q AS (SELECT vec_id AS query_id, v AS qv, lb AS true_label
        |      FROM e WHERE vec_id < 50),
        |qcells AS (
        |  SELECT query_id, qv, centroid_id AS cell FROM (
        |    SELECT q.query_id, q.qv, c.centroid_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.centroid_id) AS r
        |    FROM q, cent c) t WHERE r <= 3
        |),
        |cand AS (
        |  SELECT qc.query_id, a.vec_id AS neighbor_id, a.lb,
        |    round(list_cosine_similarity(a.v, qc.qv), 6) AS cs
        |  FROM assigned a JOIN qcells qc ON a.cell = qc.cell
        |  WHERE qc.query_id <> a.vec_id
        |), topk AS (
        |  SELECT query_id, lb FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cs DESC, neighbor_id) AS r FROM cand) t
        |  WHERE r <= 10
        |), votes AS (
        |  SELECT query_id, lb, count(*) AS c FROM topk GROUP BY 1, 2
        |), pred AS (
        |  SELECT query_id, lb AS pred_label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY c DESC, lb) AS r FROM votes) t
        |  WHERE r = 1
        |)
        |SELECT q.query_id, q.true_label, p.pred_label,
        |  q.true_label = p.pred_label AS correct
        |FROM q JOIN pred p USING (query_id)
        |""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      val centroids = Similarity.seedCentroids(e, "vec_id", "embedding", stride = 50)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", centroids)
      Similarity.knnClassifyIvf(assigned, "vec_id", "embedding", "label",
        centroids, e,
        e.filter(col("vec_id") < 50).select(col("vec_id").as("qid"),
          col("embedding").as("qvec")),
        "qid", "qvec", k = 10, nProbe = 3)
    },

    // Gopher-family repetition filter: per doc, the fraction of word
    // positions covered by an n-gram repeated WITHIN the doc, for
    // n = 2, 3, 4 — overlaps union via per-doc islands.
    QueryDef(
      "text_repetition_ngrams",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |)""".stripMargin +
        Seq(2, 3, 4).map { n =>
          s""", g$n AS (
             |  SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+${n - 1}], ' ') AS g
             |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i
             |        FROM t WHERE len(w) >= $n) u
             |), d$n AS (
             |  SELECT doc_id, g FROM g$n GROUP BY doc_id, g HAVING count(*) >= 2
             |), c$n AS (
             |  SELECT g.doc_id, CAST(g.pos AS BIGINT) AS s,
             |    CAST(g.pos + ${n - 1} AS BIGINT) AS e
             |  FROM g$n g JOIN d$n USING (doc_id, g)
             |), i$n AS (
             |  SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
             |      PARTITION BY doc_id ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             |    THEN 1 ELSE 0 END AS nw
             |  FROM c$n
             |), m$n AS (
             |  SELECT doc_id, s, e,
             |    sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS isl
             |  FROM i$n
             |), sp$n AS (
             |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS cov FROM (
             |    SELECT doc_id, isl, max(e) - min(s) + 1 AS len
             |    FROM m$n GROUP BY 1, 2) x GROUP BY 1
             |)""".stripMargin
        }.mkString +
        """
          |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
          |  round(coalesce(sp2.cov, 0) * 1.0 / len(t.w), 6) AS dup2_frac,
          |  round(coalesce(sp3.cov, 0) * 1.0 / len(t.w), 6) AS dup3_frac,
          |  round(coalesce(sp4.cov, 0) * 1.0 / len(t.w), 6) AS dup4_frac
          |FROM t LEFT JOIN sp2 USING (doc_id)
          |LEFT JOIN sp3 USING (doc_id) LEFT JOIN sp4 USING (doc_id)
          |""".stripMargin) { (s, dir) =>
      TextPipeline.repeatedNgramFractions(docs(s, dir), "doc_id", "text")
    },

    // Deterministic BPE training: greedy highest-count merges, ties
    // lexicographic; pair counts over the distinct-word table. The
    // merge table is the trained artifact a real tokenizer pipeline
    // ships; DuckDB replays all rounds via unrolled CTEs, so counts
    // AND the chosen merges are value-checked.
    QueryDef(
      "text_bpe_train",
      bpeCtes(BpeMerges) +
        (1 to BpeMerges).map { r =>
          s"""
             |SELECT CAST($r AS BIGINT) AS merge_rank, lhs, rhs, pc AS pair_count
             |FROM m$r""".stripMargin
        }.mkString("\n", "\nUNION ALL", "\n")) { (s, dir) =>
      TextPipeline.bpeTrain(docs(s, dir), "text", numMerges = BpeMerges)
    },

    // Tokenization under the trained merges: per doc, words and total
    // BPE tokens. Corpus-side work is one word-count-shaped join
    // against the trained vocab — the merge loop never touches
    // full documents.
    QueryDef(
      "text_bpe_encode",
      bpeCtes(BpeMerges) +
        s""", vx AS (
           |  SELECT w, CAST(len(sym) AS BIGINT) AS ns FROM s$BpeMerges
           |), dw AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
           |), dj AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |    CAST(sum(ns) AS BIGINT) AS n_bpe
           |  FROM dw JOIN vx USING (w) GROUP BY 1
           |)
           |SELECT d.doc_id, coalesce(dj.n_words, 0) AS n_words,
           |  coalesce(dj.n_bpe, 0) AS n_bpe
           |FROM documents d LEFT JOIN dj USING (doc_id)
           |""".stripMargin) { (s, dir) =>
      TextPipeline.bpeEncode(docs(s, dir), "doc_id", "text", numMerges = BpeMerges)
    },

    // Int8 scalar quantization of the embedding corpus: per-dimension
    // trained scales, exact integer quantized norms, worst-component
    // reconstruction error.
    QueryDef(
      "emb_quantize",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), x AS (
        |  SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS d FROM e
        |), m AS (
        |  SELECT d, max(abs(x)) AS ma FROM x GROUP BY 1
        |), q AS (
        |  SELECT x.vec_id,
        |    CASE WHEN m.ma = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(x.x / (m.ma / 127.0) + 0.5) AS BIGINT) END AS q,
        |    x.x AS x, m.ma / 127.0 AS s
        |  FROM x JOIN m USING (d)
        |)
        |SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS q_norm_sq,
        |  round(max(abs(q * s - x)), 6) AS max_abs_err
        |FROM q GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Similarity.quantizeInt8(embs(s, dir), "vec_id", "embedding")
    },

    // Fixed-point integer PageRank over the IVF cell-mate similarity
    // graph (same quantizer + rounded-cosine edge policy as
    // dedup_semantic, threshold 0.2): node importance in the near-dup
    // neighborhood structure. All-BIGINT arithmetic — both engines
    // land on identical bits with no float-summation negotiation.
    QueryDef(
      "graph_pagerank",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |), cent AS (
        |  SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 50 = 0
        |), assigned AS (
        |  SELECT vec_id, v, centroid_id AS cell FROM (
        |    SELECT e.vec_id, e.v, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.centroid_id) AS r
        |    FROM e, cent c) t WHERE r = 1
        |), pairs AS (
        |  SELECT a.vec_id AS u, b.vec_id AS v
        |  FROM assigned a JOIN assigned b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.2
        |), und AS (
        |  SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS degree FROM und GROUP BY 1
        |), nodes AS (
        |  SELECT vec_id AS u FROM e
        |), nd AS (
        |  SELECT n.u, coalesce(d.degree, 0) AS degree
        |  FROM nodes n LEFT JOIN deg d USING (u)
        |), r0 AS (
        |  SELECT u, CAST(1000000 AS BIGINT) AS pr FROM nodes
        |)""".stripMargin +
        (1 to 5).map { i =>
          s""", r$i AS (
             |  SELECT n.u, CAST(150000 + 85 * coalesce(s.s, 0) // 100 AS BIGINT) AS pr
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.v AS u, sum(r.pr // d.degree) AS s
             |    FROM und e JOIN r${i - 1} r ON r.u = e.u
             |    JOIN deg d ON d.u = e.u GROUP BY 1) s ON s.u = n.u
             |)""".stripMargin
        }.mkString + """
        |SELECT nd.u AS node, nd.degree, r5.pr
        |FROM nd JOIN r5 USING (u)
        |""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      val centroids = Similarity.seedCentroids(e, "vec_id", "embedding", stride = 50)
      val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", centroids)
      val edges = Similarity.cellMatePairs(assigned, "vec_id", "embedding", 0.2)
      graft.operators.Graph.pageRankFixedPoint(
        edges, "id_a", "id_b", e, "vec_id", iters = 5)
    },

    // Incremental dedup, the production ingest shape: the md5-bucket
    // >= 80 slice plays the NEW batch, deduped against the < 80 slice
    // as the existing corpus via the band index — batch-sized work.
    // Same md5 hash family as dedup_minhash so DuckDB replicates the
    // signatures, the index join, and the verdicts exactly.
    QueryDef(
      "dedup_incremental",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(range(1, len(t) - 3),
        |         i -> array_to_string(t[i:i+4], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM toks
        |), hs AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh
        |), params AS (
        |  SELECT i,
        |    1 + CAST('0x' || substr(md5('mh_a_' || i), 1, 15) AS BIGINT) % 2147483646 AS a,
        |    CAST('0x' || substr(md5('mh_b_' || i), 1, 15) AS BIGINT) % 2147483647 AS b
        |  FROM range(0, 128) r(i)
        |), sigc AS (
        |  SELECT doc_id, p.i, min((p.a * h + p.b) % 2147483647) AS c
        |  FROM hs, params p GROUP BY 1, 2
        |), sig AS (
        |  SELECT doc_id, list(c ORDER BY i) AS sig FROM sigc GROUP BY 1
        |), buck AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS b
        |  FROM documents
        |), banded AS (
        |  SELECT doc_id, b.band, sig[b.band*4+1 : b.band*4+4] AS bucket
        |  FROM sig, range(0, 32) b(band)
        |), cand AS (
        |  SELECT DISTINCT n.doc_id AS doc_new, e.doc_id AS doc_ex
        |  FROM banded n JOIN buck bn ON bn.doc_id = n.doc_id
        |  JOIN banded e ON e.band = n.band AND e.bucket = n.bucket
        |  JOIN buck be ON be.doc_id = e.doc_id
        |  WHERE bn.b >= 80 AND be.b < 80
        |), est AS (
        |  SELECT c.doc_new, c.doc_ex,
        |    list_sum(list_transform(range(1, 129),
        |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 128.0 AS ej
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_new
        |  JOIN sig sb ON sb.doc_id = c.doc_ex
        |), mt AS (
        |  SELECT doc_new, min(doc_ex) AS dup_of FROM est WHERE ej >= 0.7 GROUP BY 1
        |)
        |SELECT d.doc_id, mt.dup_of IS NOT NULL AS is_dup, mt.dup_of
        |FROM documents d JOIN buck ON buck.doc_id = d.doc_id
        |LEFT JOIN mt ON mt.doc_new = d.doc_id
        |WHERE buck.b >= 80
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val bucket = graft.functions.TextFunctions.splitBucket(col("doc_id"))
      graft.operators.Dedup.minhashIncremental(
        d.filter(bucket < 80), d.filter(bucket >= 80), "doc_id", "text",
        shingleK = 5, numHashes = 128, bands = 32, threshold = 0.7, useMd5 = true,
        oph = false) // pinned to the k-family this oracle replicates
    },

    // Corpus diagnostics: doc-length histogram in order-of-magnitude
    // buckets (decimal digit count of the word count — an integer
    // bucket rule both engines compute identically; floor(log2) would
    // hang a bucket edge on libm ulp differences).
    QueryDef(
      "text_length_histogram",
      """WITH n AS (
        |  SELECT CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words
        |  FROM documents
        |)
        |SELECT CAST(length(CAST(n_words AS VARCHAR)) AS BIGINT) AS magnitude,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_words) AS min_words, max(n_words) AS max_words,
        |  round(avg(n_words), 4) AS avg_words
        |FROM n GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      // lower() can't change space positions, so the oracle's
      // len(string_split(lower(text),' ')) is plain length arithmetic.
      docs(s, dir)
        .select(graft.functions.TextFunctions.spaceTokenCount(col("text")).as("n_words"))
        .groupBy(length(col("n_words").cast("string")).cast("long").as("magnitude"))
        .agg(count(lit(1)).as("n_docs"),
          min("n_words").as("min_words"), max("n_words").as("max_words"),
          round(avg("n_words"), 4).as("avg_words"))
    },

    // Model-based quality gate: hashed bag-of-words linear classifier,
    // integer weights from md5 so both engines score bit-identically.
    QueryDef(
      "text_classifier_score",
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |), x AS (
        |  SELECT doc_id, unnest(w) AS word FROM t
        |), s AS (
        |  SELECT doc_id, CAST(sum(
        |    CAST('0x' || substr(md5('clf_' || word), 1, 6) AS BIGINT) % 2001 - 1000
        |  ) AS BIGINT) AS raw_score
        |  FROM x GROUP BY 1
        |)
        |SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  s.raw_score, s.raw_score > 0 AS keep
        |FROM t JOIN s USING (doc_id)
        |""".stripMargin) { (s, dir) =>
      TextPipeline.classifierScore(docs(s, dir), "doc_id", "text")
    },

    // Sliding token-window chunking (128-token windows, stride 96 —
    // the RAG/pretraining pre-embedding shape). Raw single-space
    // split, no token filtering, so chunk text is an exact
    // by-token-position substring and both engines agree byte-for-byte.
    QueryDef(
      "text_doc_chunk",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), s AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 96)) AS start
        |  FROM t WHERE len(t) > 0
        |)
        |SELECT doc_id, CAST(start // 96 AS BIGINT) AS chunk_id,
        |  CAST(len(t[start+1:start+128]) AS BIGINT) AS n_tokens,
        |  array_to_string(t[start+1:start+128], ' ') AS chunk_text
        |FROM s
        |""".stripMargin) { (s, dir) =>
      TextPipeline.docChunks(docs(s, dir), "doc_id", "text",
        chunkTokens = 128, stride = 96)
    },

    // Chunk-level exact dedup: repeated 128-token windows across the
    // corpus (boilerplate/template text that doc-level dedup misses).
    // Shuffle is keyed on the md5 digest, never the chunk text.
    QueryDef(
      "dedup_chunks",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), s AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 96)) AS start
        |  FROM t WHERE len(t) > 0
        |), c AS (
        |  SELECT doc_id, md5(array_to_string(t[start+1:start+128], ' ')) AS chunk_md5
        |  FROM s
        |)
        |SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM c GROUP BY 1 HAVING count(*) > 1
        |""".stripMargin) { (s, dir) =>
      TextPipeline.chunkDupStats(docs(s, dir), "doc_id", "text",
        chunkTokens = 128, stride = 96)
    },

    // TF-IDF keyword extraction: top-5 terms per doc by tf·ln(N/df).
    // Ranking orders by the ROUNDED score so rank never hinges on a
    // sub-round-off ulp difference between engines.
    QueryDef(
      "text_tfidf",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
        |), df AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), n AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM documents)
        |SELECT doc_id, word, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
        |FROM (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |    round(tf.tf * ln(n.t / df.df), 6) AS tfidf,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY round(tf.tf * ln(n.t / df.df), 6) DESC, tf.word) AS rnk
        |  FROM tf JOIN df USING (word), n) t
        |WHERE rnk <= 5
        |""".stripMargin) { (s, dir) =>
      TextPipeline.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 5)
    },

    // Deterministic global shuffle + sharding: reproducible training
    // order (md5 sort key) across 32 shards; positions come from the
    // distributed groupRowNumber, never a whole-shard window task.
    QueryDef(
      "text_shuffle_shard",
      """WITH k AS (
        |  SELECT doc_id, md5('shuf_' || CAST(doc_id AS VARCHAR)) AS key,
        |    CAST('0x' || substr(md5('shuf_' || CAST(doc_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 32 AS shard
        |  FROM documents
        |)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
        |    AS BIGINT) AS pos,
        |  doc_id
        |FROM k
        |""".stripMargin) { (s, dir) =>
      TextPipeline.shuffleShard(docs(s, dir), "doc_id", numShards = 32,
        numPartitions = s.sparkContext.defaultParallelism)
    },

    // Fuzzy benchmark decontamination: MinHash-estimated Jaccard of
    // every training doc against the eval slice (doc_id % 97 = 0);
    // worst hit per doc survives. Same md5 hash family as
    // dedup_minhash so DuckDB replays signatures and scores exactly
    // (n/128 estimates are binary-exact rationals).
    QueryDef(
      "text_decontaminate_fuzzy",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 5
        |    THEN list_distinct(list_transform(range(1, len(t) - 3),
        |         i -> array_to_string(t[i:i+4], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM toks
        |), hs AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h FROM sh
        |), params AS (
        |  SELECT i,
        |    1 + CAST('0x' || substr(md5('mh_a_' || i), 1, 15) AS BIGINT) % 2147483646 AS a,
        |    CAST('0x' || substr(md5('mh_b_' || i), 1, 15) AS BIGINT) % 2147483647 AS b
        |  FROM range(0, 128) r(i)
        |), sigc AS (
        |  SELECT doc_id, p.i, min((p.a * h + p.b) % 2147483647) AS c
        |  FROM hs, params p GROUP BY 1, 2
        |), sig AS (
        |  SELECT doc_id, list(c ORDER BY i) AS sig FROM sigc GROUP BY 1
        |), banded AS (
        |  SELECT doc_id, b.band, sig[b.band*4+1 : b.band*4+4] AS bucket
        |  FROM sig, range(0, 32) b(band)
        |), cand AS (
        |  SELECT DISTINCT t.doc_id AS tr, e.doc_id AS ev
        |  FROM banded t JOIN banded e ON e.band = t.band AND e.bucket = t.bucket
        |  WHERE t.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
        |), est AS (
        |  SELECT c.tr, c.ev,
        |    list_sum(list_transform(range(1, 129),
        |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 128.0 AS ej
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.tr
        |  JOIN sig sb ON sb.doc_id = c.ev
        |)
        |SELECT tr AS doc_id, ev AS eval_id, ej AS est_jaccard
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY tr ORDER BY ej DESC, ev) AS r
        |      FROM est WHERE ej >= 0.5) t
        |WHERE r = 1
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val evalSel = pmod(col("doc_id"), lit(97)) === 0
      graft.operators.Dedup.fuzzyContaminationHits(
        d.filter(!evalSel), d.filter(evalSel), "doc_id", "text",
        shingleK = 5, numHashes = 128, bands = 32, threshold = 0.5,
        useMd5 = true, oph = false) // pinned to the k-family this oracle replays
    },

    // Per-source cap: keep ≤20 docs per source by a reproducible md5
    // draw — the anti-domination rebalance. Ranks come from the
    // distributed groupRowNumber, never a whole-source window task.
    QueryDef(
      "text_cap_per_source",
      """SELECT source, doc_id, CAST(r AS BIGINT) AS pick_rank
        |FROM (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5('cap_' || CAST(doc_id AS VARCHAR)), doc_id) AS r
        |      FROM documents) t
        |WHERE r <= 20
        |""".stripMargin) { (s, dir) =>
      TextPipeline.capPerSource(docs(s, dir), "doc_id", "source", cap = 20,
        numPartitions = s.sparkContext.defaultParallelism)
    },

    // Exact-k reproducible global sample: 500 docs by md5 draw, ranked.
    // TakeOrderedAndProject (per-partition heaps), never a global sort.
    QueryDef(
      "text_global_sample",
      """SELECT doc_id, CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT)
        |  AS sample_rank
        |FROM (SELECT doc_id, md5('gs_' || CAST(doc_id AS VARCHAR)) AS key
        |      FROM documents
        |      ORDER BY key, doc_id LIMIT 500) t
        |""".stripMargin) { (s, dir) =>
      TextPipeline.globalSample(docs(s, dir), "doc_id", k = 500)
    },

    // Decontamination via broadcast Bloom sketch + exact verify: the
    // 100 TB shape (bitset rides the task binary, probe is map-side,
    // the verify join is hit-sized). Result is row-identical to
    // text_decontaminate — the oracle is the same exact-overlap SQL,
    // which is precisely the claim being checked.
    QueryDef(
      "text_decontaminate_bloom",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 8
        |    THEN list_distinct(list_transform(range(1, len(t) - 6),
        |         i -> array_to_string(t[i:i+7], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS g
        |  FROM toks
        |), buck AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100 AS b
        |  FROM documents
        |), eg AS (
        |  SELECT DISTINCT g FROM sh JOIN buck USING (doc_id) WHERE b >= 90
        |), hits AS (
        |  SELECT sh.doc_id, count(*) AS n_hits
        |  FROM sh JOIN eg USING (g) JOIN buck ON buck.doc_id = sh.doc_id
        |  WHERE buck.b < 80 GROUP BY 1
        |)
        |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d JOIN buck USING (doc_id)
        |LEFT JOIN hits h ON h.doc_id = d.doc_id
        |WHERE buck.b < 80
        |""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val bucket = graft.functions.TextFunctions.splitBucket(col("doc_id"))
      TextPipeline.contaminationHitsBloom(
        d.filter(bucket < 80), d.filter(bucket >= 90), "doc_id", "text", n = 8)
    },

    // Token-budget mixing: absolute per-source token targets filled in
    // reproducible md5 order; the running count is the distributed
    // grouped prefix sum, never a whole-source window task.
    QueryDef(
      "text_token_budget_mix",
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS ok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY ok, doc_id)
        |      AS BIGINT) AS cum_tokens
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c
        |WHERE cum_tokens <= (CASE source WHEN 'src0' THEN 300
        |                                 WHEN 'src1' THEN 1200
        |                                 ELSE 700 END)
        |""".stripMargin) { (s, dir) =>
      TextPipeline.tokenBudgetSample(docs(s, dir), "doc_id", "source", "text",
        budgets = Map("src0" -> 300L, "src1" -> 1200L), defaultBudget = 700L,
        numPartitions = s.sparkContext.defaultParallelism)
    },

    // N-gram novelty: share of a doc's distinct 3-grams unique to it
    // corpus-wide, plus mean gram document frequency — the inverse-
    // boilerplate signal. One wordcount-shaped df aggregation.
    QueryDef(
      "text_ngram_novelty",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(CASE WHEN len(t) >= 3
        |    THEN list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> array_to_string(t[i:i+2], ' ')))
        |    ELSE [array_to_string(t, ' ')] END) AS g
        |  FROM toks
        |), dfreq AS (
        |  SELECT g, count(*) AS df FROM sh GROUP BY 1
        |)
        |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |  round(avg(CASE WHEN df = 1 THEN 1.0 ELSE 0.0 END), 6) AS novelty,
        |  round(avg(df), 6) AS mean_df
        |FROM sh JOIN dfreq USING (g)
        |GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      TextPipeline.ngramNovelty(docs(s, dir), "doc_id", "text", n = 3)
    },

    // CCNet-style LM-perplexity bucketing: exact tercile cutoffs over
    // the bigram-LM scores, head/middle/tail labels broadcast-mapped
    // over the corpus. Cutoffs and scores compare after round(…, 6)
    // on both engines, so boundary docs cannot flip on float noise.
    QueryDef(
      "text_perplexity_buckets",
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
        |), c1 AS (
        |  SELECT w, count(*) AS c1 FROM (SELECT unnest(t) AS w FROM toks) u GROUP BY 1
        |), v AS (
        |  SELECT count(*) AS vv FROM c1
        |), ig AS (
        |  SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
        |), bg AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM ig
        |), c12 AS (
        |  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
        |), scored AS (
        |  SELECT bg.doc_id, ln((c12.c12 + 1.0) / (c1.c1 + v.vv)) AS lp
        |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 ON c1.w = bg.w1, v
        |), agg AS (
        |  SELECT doc_id, round(avg(lp), 6) AS avg_logp FROM scored GROUP BY 1
        |), s AS (
        |  SELECT d.doc_id, a.avg_logp
        |  FROM documents d LEFT JOIN agg a USING (doc_id)
        |), cuts AS (
        |  SELECT round(quantile_cont(avg_logp, 1.0/3), 6) AS p_lo,
        |         round(quantile_cont(avg_logp, 2.0/3), 6) AS p_hi
        |  FROM s WHERE avg_logp IS NOT NULL
        |)
        |SELECT s.doc_id, s.avg_logp,
        |  CASE WHEN s.avg_logp IS NULL THEN 'na'
        |       WHEN s.avg_logp > cuts.p_hi THEN 'head'
        |       WHEN s.avg_logp > cuts.p_lo THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM s, cuts
        |""".stripMargin) { (s, dir) =>
      TextPipeline.perplexityBuckets(docs(s, dir), "doc_id", "text")
    })
}
