package graft

import graft.operators.StatsPlanner
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats-fed physical planning: the ANALYZE numbers must actually pick
  * the join strategy, and the choice must show up in the executed plan. */
class StatsPlannerSpec extends AnyFunSuite with SparkTestBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("estimate survives the 100 TB regime: no Long overflow, partitions stay pinned at max") {
    // two 5e9-row sides: nl * nr = 2.5e19 > Long.MaxValue
    val (est, parts) = StatsPlanner.estimateOut(
      nl = 5_000_000_000L, dl = 1_000_000L,
      nr = 5_000_000_000L, dr = 2_000_000L,
      outRowBytes = 200L, targetPartitionBytes = 64L << 20,
      maxPartitions = 2048)
    assert(est == 12_500_000_000_000L, s"2.5e19/2e6 rows expected, got $est")
    assert(parts == 2048, s"huge output must plan maxPartitions, got $parts")
    // full clamp: even the row estimate itself saturates instead of wrapping
    val (est2, parts2) = StatsPlanner.estimateOut(
      nl = Long.MaxValue, dl = 1L, nr = Long.MaxValue, dr = 1L,
      outRowBytes = 8L, targetPartitionBytes = 64L << 20, maxPartitions = 4096)
    assert(est2 == Long.MaxValue && parts2 == 4096)
    // degenerate ndv guards the division
    val (est3, _) = StatsPlanner.estimateOut(
      nl = 10L, dl = 0L, nr = 10L, dr = 0L,
      outRowBytes = 8L, targetPartitionBytes = 64L << 20, maxPartitions = 16)
    assert(est3 == 100L)
  }

  test("decision: small-ndv dimension is broadcast, estimate uses joinEstimate arithmetic") {
    val customer = Tables.load(spark, sf001, "customer")
    val nation = Tables.load(spark, sf001, "nation")
    val d = StatsPlanner.decide(customer, nation, "c_nationkey", "n_nationkey")
    assert(d.broadcastRight, s"25-row nation must broadcast: ${d.explain}")
    assert(d.nRight == 25L)
    // |A join B| ~ nl*nr/max(ndv): every customer has one nation, so the
    // estimate must land on ~|customer| (ndv sketches are within 5%)
    assert(math.abs(d.estOutRows - d.nLeft) <= d.nLeft / 10,
      s"FK-join estimate should be ~|customer|: ${d.explain}")
  }

  test("plan shape: stats-planned dimension join contains a broadcast, no sort-merge") {
    val customer = Tables.load(spark, sf001, "customer")
    val nation = Tables.load(spark, sf001, "nation").select(col("n_nationkey"), col("n_name"))
    val p = plan(StatsPlanner.autoJoin(customer, nation, "c_nationkey", "n_nationkey"))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("plan shape: a 0-byte broadcast budget forces the shuffle path at the stats-sized partition count") {
    val orders = Tables.load(spark, sf001, "orders").select(col("o_custkey"), col("o_totalprice"))
    val customer = Tables.load(spark, sf001, "customer").select(col("c_custkey"), col("c_name"))
    // 1-byte target partitions + a low cap force a multi-partition shuffle
    // decision even at fixture scale, so the hash partitioning is visible
    val d = StatsPlanner.decide(orders, customer, "o_custkey", "c_custkey",
      broadcastBytes = 0L, targetPartitionBytes = 1L, maxPartitions = 8)
    assert(!d.broadcastRight)
    assert(d.shufflePartitions == 8)
    val joined = StatsPlanner.joinWith(orders, customer, "o_custkey", "c_custkey", d)
    val p = plan(joined)
    assert(!p.contains("BroadcastHashJoin"), s"broadcast must be off:\n$p")
    // the explicit repartition IS the join's shuffle — its partition count
    // is the stats-sized one, and no extra exchange is planned on top
    assert(p.contains(s"hashpartitioning(o_custkey"), p)
    assert(joined.rdd.getNumPartitions == d.shufflePartitions,
      s"join must run at the stats-sized ${d.shufflePartitions} partitions")
  }

  test("explain names the decision") {
    val customer = Tables.load(spark, sf001, "customer")
    val nation = Tables.load(spark, sf001, "nation")
    val d = StatsPlanner.decide(customer, nation, "c_nationkey", "n_nationkey")
    assert(d.explain.contains("BROADCAST right"))
    val d2 = d.copy(broadcastRight = false)
    assert(d2.explain.contains("SHUFFLE"))
  }

  test("query adapter: per-nation totals match a hand-built reference") {
    val got = StatsPlanner.statsJoinQuery(spark, sf001)
    val orders = Tables.load(spark, sf001, "orders")
    val customer = Tables.load(spark, sf001, "customer")
    val nation = Tables.load(spark, sf001, "nation")
    val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
