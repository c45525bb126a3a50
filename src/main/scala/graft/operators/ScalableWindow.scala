package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Rank-family window functions without the per-key single-task sort.
  *
  * `Window.partitionBy(k).orderBy(...)` puts EVERY row of a key into
  * one task — with 3 distinct keys over 18M rows (sf3 lineitem) that
  * is three tasks each sorting 6M rows, and at 100 TB it simply does
  * not run. When the window's order key is unique within the group,
  * every rank-family function (row_number / rank / percent_rank /
  * cume_dist) is a function of the global per-group row number, which
  * distributes cleanly with the classic two-pass ranking scheme
  * (the same idea as RDD.zipWithIndex, done per group):
  *
  *   1. range-repartition by (group ++ order) — globally ordered,
  *      non-overlapping partitions, each group's rows contiguous
  *      across partition ids — and sort within partitions;
  *   2. count rows per (partition, group) — a tiny
  *      |partitions|×|groups| table collected to the driver (the
  *      only driver data; row data never moves) and turned into
  *      per-partition starting offsets;
  *   3. second pass: local counter + broadcast offset = global row
  *      number.
  *
  * Wall-clock becomes one balanced shuffle + parallel local sorts,
  * independent of how few groups there are.
  */
object ScalableWindow {

  /** Adds `out` = 1-based global row number of each row within its
    * group, ordered by orderCols (which must be non-null and unique
    * per group for rank-family semantics to hold). */
  def groupRowNumber(df: DataFrame, groupCols: Seq[String],
                     orderCols: Seq[String], out: String,
                     numPartitions: Int): DataFrame = {
    val keyCols = (groupCols ++ orderCols).map(col)
    val sorted = df.repartitionByRange(numPartitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val schema = sorted.schema
    val groupIdx = groupCols.map(schema.fieldIndex)
    val rdd = sorted.rdd

    // pass 1: |partitions| × |groups| counts — the only driver data
    val counts: Array[(Int, Seq[Any], Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = groupIdx.map(r.get)
          m.update(k, m.getOrElse(k, 0L) + 1L)
        }
        m.iterator.map { case (k, n) => (pid, k, n) }
      }.collect()
    val offsets: Map[(Int, Seq[Any]), Long] =
      counts.groupBy(_._2).flatMap { case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, n) =>
          val entry = (pid, g) -> acc; acc += n; entry
        }
      }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)

    // pass 2: broadcast offset + local running counter
    val withRn = rdd.mapPartitionsWithIndex { (pid, it) =>
      val running = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val k = groupIdx.map(r.get)
        val rn = running.getOrElse(k,
          bc.value.getOrElse((pid, k), 0L)) + 1L
        running.update(k, rn)
        Row.fromSeq(r.toSeq :+ rn)
      }
    }
    df.sparkSession.createDataFrame(withRn,
      schema.add(out, LongType, nullable = false))
  }

  /** The q_window_analytic shape (percent_rank / cume_dist /
    * running-frame nth_value(2) / whole-partition last_value over
    * lineitem partitioned by l_returnflag), with the physical
    * strategy chosen by input size:
    *
    *   - small inputs → Spark's window operator: one sort per key,
    *     fewest passes, fastest at bench scales;
    *   - inputs past `singleTaskSortLimitBytes` (catalog stats, no
    *     extra job) → the distributed form: global per-flag row
    *     number via groupRowNumber, peers (full-key ties) recovered
    *     by one aggregation (rank = min rn, cume rows = max rn),
    *     per-flag scalars broadcast back. Identical output — the
    *     equivalence is spec-checked on a tied corpus — but no task
    *     ever sorts more than |rows|/numPartitions.
    */
  def analyticRankQuery(lineitem: DataFrame,
                        singleTaskSortLimitBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = lineitem.select(
      "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val big = base.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(singleTaskSortLimitBytes)
    if (!big) {
      val order = Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
      val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      base.select(
        col("l_orderkey"), col("l_linenumber"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("l_quantity"), 2).over(wRun).as("second_qty"),
        last(col("l_quantity")).over(wAll).as("max_qty"))
    } else {
      val par = lineitem.sparkSession.sparkContext.defaultParallelism
      val fullKey = Seq("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      val rn = groupRowNumber(base, Seq("l_returnflag"),
        Seq("l_quantity", "l_orderkey", "l_linenumber"), "__rn", par)
      val peers = rn.groupBy(fullKey.map(col): _*)
        .agg(min("__rn").as("__rank"), max("__rn").as("__cume_rn"))
      val orderKey = struct(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val stats = base.groupBy("l_returnflag").agg(
        count(lit(1)).as("__n"),
        max_by(col("l_quantity"), orderKey).as("__max_qty"))
      val second = rn.filter(col("__rn") === 2)
        .select(col("l_returnflag"), col("l_quantity").as("__q2"))
      rn.join(peers, fullKey)
        .join(broadcast(stats), Seq("l_returnflag"))
        .join(broadcast(second), Seq("l_returnflag"), "left_outer")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(when(col("__n") === 1, 0.0).otherwise(
            (col("__rank") - 1).cast("double") / (col("__n") - 1).cast("double")), 6)
            .as("pct_rank"),
          round(col("__cume_rn").cast("double") / col("__n").cast("double"), 6).as("cume"),
          when(col("__rn") >= 2, col("__q2")).as("second_qty"),
          col("__max_qty").as("max_qty"))
    }
  }
}
