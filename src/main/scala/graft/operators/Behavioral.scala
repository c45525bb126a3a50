package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over event streams — the funnel and
  * retention primitives ClickHouse ships as `windowFunnel` /
  * `retention` (reference backends expose them; cf.
  * /root/reference/pkg/destinations/servers/clickhouse).
  *
  * Both operators are one hash-shuffle by user: the funnel's staged
  * minima are consecutive whole-partition windows over the same
  * user partitioning (Catalyst reuses the single exchange+sort), and
  * retention is two aggregations over the same key. Nothing here is
  * per-event-pair, so cost is linear in events at any scale.
  */
object Behavioral {

  /** Sequential funnel: for each user, the deepest stage of `stages`
    * reached IN ORDER, with every stage completed within
    * `windowSeconds` of the first-stage entry (ClickHouse
    * `windowFunnel`'s strict-order mode, entry point = earliest
    * first-stage event).
    *
    * Chain semantics via staged minima: t1 = min ts of stage 1;
    * t_{i} = min ts of stage i strictly after t_{i-1}. Level = deepest
    * i with t_i ≤ t1 + window. Deterministic — no per-row state
    * machine, so it distributes as plain windows.
    *
    * Output: (userCol, funnel_level long).
    */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String],
                   windowSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    val w = Window.partitionBy(userCol)
    var df = events.select(col(userCol), col(tsCol).as("__ts"), col(typeCol).as("__tp"))
      .withColumn("__t1", min(when(col("__tp") === stages.head, col("__ts"))).over(w))
    stages.indices.drop(1).foreach { i =>
      df = df.withColumn(s"__t${i + 1}",
        min(when(col("__tp") === stages(i) && col("__ts") > col(s"__t$i"), col("__ts"))).over(w))
    }
    val ts = stages.indices.map(i => s"__t${i + 1}")
    val perUser = df.groupBy(userCol)
      .agg(min(ts.head).as(ts.head), ts.tail.map(t => min(t).as(t)): _*)
    val deadline = col(ts.head) + expr(s"INTERVAL $windowSeconds SECONDS")
    // deepest stage first; stage 1 needs no window check (it defines t1)
    val level = ts.zipWithIndex.drop(1).reverse
      .foldLeft(when(col(ts.head).isNull, 0L)) { case (acc, (t, i)) =>
        acc.when(col(t).isNotNull && col(t) <= deadline, (i + 1).toLong)
      }.otherwise(1L)
    perUser.select(col(userCol), level.cast("long").as("funnel_level"))
  }

  /** Cohort retention: users grouped by their first-activity date;
    * for each cohort, how many returned on day `shortDay` and on/after
    * day `longDay` (the classic d1/d7 pair).
    *
    * Output: (cohort_date, n_users, d1_retained, d7_retained).
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       shortDay: Int = 1, longDay: Int = 7): DataFrame = {
    val first = events.groupBy(userCol).agg(min(to_date(col(tsCol))).as("__d0"))
    val dd = events.select(col(userCol), to_date(col(tsCol)).as("__d"))
      .join(first, Seq(userCol))
      .select(col(userCol), col("__d0"), datediff(col("__d"), col("__d0")).as("__dd"))
    // the cohort date travels as 'yyyy-MM-dd' text: engines and their
    // client dataframes disagree on date-vs-datetime representation,
    // and the day string is the portable form
    dd.groupBy(date_format(col("__d0"), "yyyy-MM-dd").as("cohort_date"))
      .agg(
        countDistinct(col(userCol)).as("n_users"),
        countDistinct(when(col("__dd") === shortDay, col(userCol))).as("d1_retained"),
        countDistinct(when(col("__dd") >= longDay, col(userCol))).as("d7_retained"))
  }

  /** Top event-path transitions — the Sankey/user-flow query: order
    * each user's events by (ts, tiebreaker), pair each with its
    * successor via lag/lead, count (from, to) transitions corpus-wide,
    * rank the top k. One user-partition window + one word-count-shaped
    * aggregation; the tiebreaker column makes the sequence (and so the
    * counts) engine-deterministic under equal timestamps.
    *
    * Output: (from_type, to_type, n long, rnk long), top k by
    * (n desc, from, to).
    */
  def topTransitions(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("from_type"), col("to_type")).limit(k)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("n").desc, col("from_type"), col("to_type"))).cast("long"))
      .select(col("from_type"), col("to_type"), col("n"), col("rnk"))
  }
}
