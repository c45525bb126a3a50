package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators beyond plain SQL passthrough: as-of join (custom
  * union+window operator — SURVEY §2B "As-of / range joins"), range
  * frames, approximate distinct sketches. */
object AdvancedOps {

  val defs: Seq[QueryDef] = Seq(

    // As-of join: each purchase matched to the user's most recent
    // click at-or-before it. Oracle: DuckDB's native ASOF LEFT JOIN.
    QueryDef(
      "q_asof_join",
      """SELECT p.user_id, p.event_id, p.ts,
        |       c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_ts"))
    },

    // Forward as-of: each purchase matched to the user's NEXT click
    // at-or-after it (time-to-next-action analyses). DuckDB's ASOF
    // accepts the <= inequality, so the oracle is native again.
    QueryDef(
      "q_asof_forward",
      """SELECT p.user_id, p.event_id, p.ts,
        |       c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      AsOfJoin.forward(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_ts"))
    },

    // Nearest-direction as-of: the click closest in time to each
    // purchase, either side, exact ties to the backward match —
    // composed from the two directional one-shuffle passes re-joined
    // on the purchase row; gap compare in exact integer micros.
    QueryDef(
      "q_asof_nearest",
      """WITH p AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
        |), b AS (
        |  SELECT p.user_id, p.event_id, p.ts,
        |    c.event_id AS b_id, c.ts AS b_ts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |), f AS (
        |  SELECT p.user_id, p.event_id, p.ts,
        |    c.event_id AS f_id, c.ts AS f_ts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
        |)
        |SELECT b.user_id, b.event_id, b.ts,
        |  CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
        |    epoch_us(b.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(b.ts))
        |    THEN b.b_id ELSE f.f_id END AS click_id,
        |  CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL OR
        |    epoch_us(b.ts) - epoch_us(b.b_ts) <= epoch_us(f.f_ts) - epoch_us(b.ts))
        |    THEN b.b_ts ELSE f.f_ts END AS click_ts
        |FROM b JOIN f
        |  ON b.user_id = f.user_id AND b.event_id = f.event_id AND b.ts = f.ts
        |""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      AsOfJoin.nearest(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_ts"), rightTsOut = "click_ts")
    },

    // As-of with a 1-hour match tolerance: DuckDB has no native
    // tolerance, so the oracle nulls out stale matches with CASE.
    QueryDef(
      "q_asof_tolerance",
      """SELECT p.user_id, p.event_id, p.ts,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.event_id END AS click_id,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.ts END AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      AsOfJoin.asof(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id", "click_ts"), "backward", toleranceMs = 60 * 60 * 1000)
    },

    // RANGE frame over a numeric ordering: peers within a value window.
    QueryDef(
      "q_window_range",
      """SELECT o_orderkey, o_totalprice,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
        |FROM orders
        |""".stripMargin) { (s, dir) =>
      // partitioned range frame — a global ORDER BY window would choke
      // one task at scale
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice")).rangeBetween(-1000, 0)
      Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_within_1k"))
    },

    // Range join: event values banded into price tiers. The bucketized
    // operator (operators/RangeJoin) replaces the nested-loop theta
    // join with an equi-join + residual filter.
    QueryDef(
      "q_range_join",
      """WITH bands(band, lo, hi) AS (
        |  SELECT * FROM (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 120.0),
        |                        ('high', 120.0, 1000.0)) v
        |)
        |SELECT e.event_id, b.band, e.value
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bands = Seq(("low", 0.0, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 1000.0))
        .toDF("band", "lo", "hi")
      graft.operators.RangeJoin.bucketed(
        Tables.load(s, dir, "events").select("event_id", "value"), "value",
        bands, "lo", "hi", step = 50.0)
        .select("event_id", "band", "value")
    },

    // native window() in batch mode: tumbling hourly buckets
    QueryDef(
      "q_tumbling_window",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    },

    // sliding windows (1h window, 30min slide → every event in 2
    // windows); oracle re-derives the window starts with epoch math
    QueryDef(
      "q_sliding_window",
      """WITH w AS (
        |  SELECT TIMESTAMP '1970-01-01 00:00:00'
        |           + CAST(floor(epoch(ts) / 1800) * 1800 - off AS BIGINT) * INTERVAL '1 second'
        |           AS window_start, value
        |  FROM events, unnest([0, 1800]) AS t(off)
        |)
        |SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes")
          .getField("start").as("window_start"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    },

    // HLL sketch distinct. Estimates differ engine-to-engine, so the
    // query reports both approx and exact; the spec asserts the error
    // bound, the driver records rows.
    QueryDef.noOracle("q_approx_distinct") { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
    },

    // The exact-mode twin of q_approx_distinct: same grouping, the
    // sketch column replaced by its exact value — gives the last
    // inventory row an oracle while the HLL form stays documented as
    // the (by-design) sketch divergence. The HLL estimate is asserted
    // within its published error bound against this exact value, so
    // the sketch itself is verified too, just not hash-compared.
    QueryDef(
      "q_approx_distinct_exact",
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1
        |""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
    },

    // Sketch MERGEABILITY — the property that makes approx distinct
    // usable at 100 TB: per-(flag, status) partial HLL sketches union
    // into per-flag estimates WITHOUT rescanning the fact table (the
    // re-aggregation pattern: daily partials → monthly rollup). The
    // exact twin rides along; the spec bounds the merged estimate.
    QueryDef.noOracle("q_sketch_merge") { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val partials = li.groupBy("l_returnflag", "l_linestatus")
        .agg(hll_sketch_agg(col("l_partkey")).as("__sk"))
      val merged = partials.groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("approx_parts"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      merged.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"))
    },

    // Approximate percentiles (KLL/GK-sketch class): the mergeable-
    // sketch path for quantiles at 100 TB — one pass, bounded memory
    // per group, no rank shuffle. No value oracle (sketch internals
    // are engine-specific); the spec bounds it against the exact
    // rank-based twin (q_percentiles) and the driver records rows>0.
    QueryDef.noOracle("q_approx_percentile") { (s, dir) =>
      Tables.load(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("p90"),
          percentile_approx(col("l_extendedprice"), lit(0.25), lit(10000))
            .as("price_p25"))
    })
}
