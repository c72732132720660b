package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-analytics operators over the behavioral log — the queries an
 * HBase-style event store exists to answer (per-user scans in the
 * reference's world; one co-partitioned fold here).
 *
 * [[funnel]] — ordered-step conversion: a user completes step k if
 * events of types step₁, step₂, …, stepₖ occur in (ts, event_id) order
 * with each step within `windowMicros` AT OR AFTER the previous one.
 * Computed as the exact reachability DP, not a greedy anchor pick (the
 * earliest first-step event is NOT always the one that starts a viable
 * chain): a cumulative per-user window carries "latest reachable
 * step-(k−1) time so far", so step-k reachability is one CASE over it,
 * and the whole funnel is ONE shuffle-sort by user with k chained
 * window columns — linear in events, no per-user joins, no event-set
 * materialization. Timestamp math is integer microseconds, so counts
 * are bit-identical in any engine.
 *
 * [[retention]] — weekly cohort triangle: users cohort by the ISO week
 * of their first event; each (cohort week, week offset) cell counts the
 * cohort's users active that week.
 *
 * 100 TB shape: the funnel is one exchange + sort by user_id reused by
 * every window column; retention is two map-side-combined aggregations
 * and a join on the user-domain-sized cohort table. Outputs are step-
 * or cohort-domain-sized.
 */
object EventAnalytics {

  /** Step-completion counts: (step, event_type, n_users). */
  def funnel(events: DataFrame, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // the DP state a row reads must come from rows STRICTLY before it
    // (1 PRECEDING): with the current row in frame, a funnel with a
    // repeated step type would let one event complete two consecutive
    // steps. For distinct step types the frames are equivalent (a row
    // contributes only its own type), but the exclusive frame is the
    // correct DP for every step list.
    val byUser = Window.partitionBy("user_id")
      .orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"))
    // hit_k: this event completes step k; r_k: latest step-k completion
    // at or before this position (the DP state the next step reads)
    def hit(i: Int): Column =
      if (i == 0) col("event_type") === steps.head
      else col("event_type") === steps(i) && col(s"r$i").isNotNull &&
        col("tus") - col(s"r$i") <= windowMicros
    var cur = ev.withColumn("hit1",
      when(hit(0), col("tus")))
    for (i <- 1 until steps.length) {
      cur = cur
        .withColumn(s"r$i", max(col(s"hit$i")).over(byUser))
        .withColumn(s"hit${i + 1}", when(hit(i), col("tus")))
    }
    // per-user funnel depth first (one map-side-combined groupBy), then
    // the k counts from the user-domain-sized table — NOT k
    // countDistincts in one agg, which would Expand the event stream
    // k-fold (the TableStats.scala:24-32 trap)
    val depthOf = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"hit${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    val depth = cur.select(col("user_id"), depthOf.as("d"))
      .groupBy("user_id").agg(max(col("d")).as("depth"))
    val counts = steps.indices.map(i =>
      count(when(col("depth") >= i + 1, 1)).as(s"n${i + 1}"))
    val row = depth.agg(counts.head, counts.tail: _*).head
    val spark = events.sparkSession
    import spark.implicits._
    steps.indices.map(i =>
      ((i + 1).toLong, steps(i), row.getLong(i)))
      .toDF("step", "event_type", "n_users")
  }

  /** Weekly cohort retention: (cohort_week, week_offset, n_users). */
  def retention(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    // (user_id, week) is distinct here, so each user contributes one row
    // per active week — a plain count, no distinct aggregation needed
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Query-pack adapter: the view → click → purchase funnel, each step
    * within one hour of the previous. */
  def funnelQuery(spark: SparkSession, sfDir: String): DataFrame =
    funnel(Tables.load(spark, sfDir, "events"),
      Seq("view", "click", "purchase"), windowMicros = 3600L * 1000000L)

  /** Query-pack adapter: the weekly retention triangle. */
  def retentionQuery(spark: SparkSession, sfDir: String): DataFrame =
    retention(Tables.load(spark, sfDir, "events"))
}
