package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * SURVEY.md §7.5 — the reference's operator inventory (§2) re-expressed as
 * relational queries over the TPC-H-ish fixtures, all DuckDB-checkable.
 *
 * Conventions for oracle parity:
 *  - every computed column is aliased identically in Spark and SQL;
 *  - money/quantity aggregates are computed over `DECIMAL(18,4)` casts so
 *    Spark and DuckDB produce bit-identical sums regardless of float
 *    summation order (double sums are order-dependent; decimal sums are
 *    exact);
 *  - rows are deterministic sets — any LIMIT is preceded by a total order.
 *
 * Scale notes are on each query: what shuffles, what broadcasts, what gets
 * pushed down.
 */
object Relational {

  private val Dec = DecimalType(18, 4)

  /**
   * S2 — point lookup by primary key. The `c_custkey = k` predicate reaches
   * the parquet scan (`PushedFilters: [EqualTo(c_custkey,42)]`) so only
   * matching row groups are read; on a key-sorted 100 TB store this is a
   * single-partition read, not a scan.
   */
  def pointLookup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "customer").filter(col("c_custkey") === 42L)

  /**
   * S1 — key-range scan in key order. BinaryType/numeric-key range predicates
   * push down to min/max row-group pruning; ordering by the key is what the
   * HBase sorted scan gives for free.
   */
  def rangeScan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") >= 100L && col("o_orderkey") < 200L)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /**
   * S3/F2 — family/column selection: projection + membership filter. The
   * projection prunes the parquet `ReadSchema` to exactly these columns.
   */
  def familyFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
           sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))

  /**
   * HBase ColumnPaginationFilter analogue: per (rowKey, family), the
   * qualifiers at positions [offset, offset+limit) in qualifier byte
   * order — BinaryType ordering matches HBase's unsigned-lex qualifier
   * order, so the page is the one the filter would return. Spark plans
   * the rank predicate with a WindowGroupLimit: each map task keeps at
   * most offset+limit cells per group BEFORE the exchange, so the wide
   * rows this filter exists for never ship whole.
   */
  def columnPaginate(cells: org.apache.spark.sql.DataFrame,
      offset: Int, limit: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // HBase's ColumnPaginationFilter counts a COLUMN once per row no
    // matter how many versions it stores, so reduce to the latest version
    // per (rowKey, family, qualifier) BEFORE paginating — otherwise a
    // multi-version frame counts each version as a column and the page
    // content depends on the (nondeterministic) version order inside the
    // window. max_by's ordering struct carries a (ts, value) tiebreak so
    // same-ts versions resolve deterministically. Counting-unit note:
    // HBase pages per ROW across families; this frame's grouping unit is
    // (rowKey, family), so a page spans ONE family's qualifiers — the
    // per-family page, not the cross-family row page.
    val latest = cells
      .groupBy("rowKey", "family", "qualifier")
      .agg(max_by(
        struct(col("ts"), col("cellType"), col("value")),
        struct(col("ts"), col("value"))).as("_v"))
      .select(col("rowKey"), col("family"), col("qualifier"),
        col("_v.ts").as("ts"), col("_v.cellType").as("cellType"),
        col("_v.value").as("value"))
    val w = Window.partitionBy("rowKey", "family")
      .orderBy(col("qualifier").asc)
    latest.withColumn("_cp", row_number().over(w))
      .filter(col("_cp") > offset && col("_cp") <= offset + limit)
      .drop("_cp")
  }

  /**
   * F1 — first-key-only: first cell per row ⇒ first lineitem per order by
   * line number. Expressed as `min_by` (hash aggregate), NOT a sort-based
   * window: the partial aggregate collapses each group to one candidate
   * map-side before the exchange — at scale that's one row per group on
   * the network instead of a full sort of every partition.
   */
  def firstPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    // l_linenumber is NOT unique per order in the synthetic data — the full
    // (linenumber, partkey, suppkey) tiebreak makes the winner well-defined
    Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(min_by(
        struct(col("l_linenumber"), col("l_partkey"), col("l_quantity")),
        struct(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))).as("_f"))
      .select(
        col("l_orderkey"),
        col("_f.l_linenumber"), col("_f.l_partkey"), col("_f.l_quantity"))
  }

  /**
   * Latest-version-wins (SURVEY §1.4) — newest order per customer, with a
   * deterministic key tiebreak. `max_by` instead of a window for the same
   * partial-aggregation reason as [[firstPerGroup]] — this is the shape the
   * multi-version cell read should take at 100 TB.
   */
  def latestVersion(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(max_by(
        struct(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
        struct(col("o_orderdate"), col("o_orderkey"))).as("_l"))
      .select(
        col("o_custkey"),
        col("_l.o_orderkey"), col("_l.o_orderdate"), col("_l.o_totalprice"))

  /**
   * M2/M4 — the probe expressed relationally: each order probes its customer;
   * a negative account balance simulates an unreadable row. The dimension
   * stays under `autoBroadcastJoinThreshold` at fixture scale so Spark/AQE
   * picks a shuffle-free broadcast join on its own — exactly the reference's
   * per-row GET pattern where only the small side moves. No explicit
   * `broadcast()` hint: a forced hint would override AQE's size check and
   * OOM the driver if the dimension ever outgrows the threshold at 100 TB.
   */
  def probeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val cust = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal")
    orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left")
      .select(
        col("o_orderkey"),
        when(col("c_acctbal") < 0, lit("FAILED")).otherwise(lit("SUCCESS")).as("status"),
        when(col("c_acctbal") < 0,
          CorruptScan.normalizeError(
            lit("NegativeBalanceException"),
            concat(lit("account balance below zero\nbal="), col("c_acctbal").cast("string"))))
          .as("error"))
  }

  /** A1 — the counter triple as a single-row aggregate over the probe. */
  def probeCounters(spark: SparkSession, sfDir: String): DataFrame =
    probeJoin(spark, sfDir).agg(
      count(lit(1)).as("total_rows"),
      count(when(col("status") === "SUCCESS", 1)).as("success_rows"),
      count(when(col("status") === "FAILED", 1)).as("failed_rows"))

  /**
   * M5 — message normalization as a SQL string pipeline over documents
   * (first line of a multiline message, blank→"n/a", class-name prefix).
   */
  def msgNormalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        CorruptScan.normalizeError(
          lit("SimulatedException"),
          concat(col("source"), lit("\nlang="), col("lang"))).as("error"))

  /** T1 — timestamp override as a projection (the CopyRow headline feature). */
  def tsOverride(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 100L)
      .select(
        col("o_orderkey"),
        to_timestamp(lit("2024-06-01 00:00:00")).as("o_orderdate"),
        col("o_totalprice"))

  /** S4 — schema/family introspection: enumerate distinct "families". */
  def families(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("family"))
      .distinct()

  /**
   * TPC-H Q1 flavor — the bench workhorse. Partial aggregation happens
   * map-side before the 6-group exchange; with AQE the post-shuffle stage
   * coalesces to a handful of partitions.
   */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // decimal accumulation (exact, order-independent), ONE cast to
        // double at output — Spark's DECIMAL(28,4) vs DuckDB's DECIMAL(38,4)
        // sum types canonicalize differently in the driver's comparator
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /**
   * Multi-way join + aggregate (TPC-H Q5 flavor): revenue by nation.
   * Join order: lineitem (fact) ⨝ orders on orderkey is the only large
   * shuffle. `nation` is fixed-size (25 rows) so the hint is always right;
   * `customer` GROWS with scale factor, so its join strategy is left to
   * AQE's runtime size check — a forced hint would OOM the build side at
   * 100 TB (same reasoning as probeJoin). At sf0.1 AQE still picks
   * broadcast for it, so the local plan is unchanged.
   */
  def joinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val nat = Tables.load(spark, sfDir, "nation").select("n_nationkey", "n_name")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(Dec)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /**
   * Top-k with a total order (price desc, key asc tiebreak). Spark plans
   * TakeOrderedAndProject — a per-partition top-k then a driver merge of k
   * rows per partition; no global sort even at 100 TB.
   */
  def topK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Anti join — customers with no 2001+ orders (NOT EXISTS). The date
    * predicate is pushed below the join; at scale the anti join shuffles on
    * the key like any join (or broadcasts the filtered side). */
  def antiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
      .select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
  }

  /** Semi join — parts that appear in any lineitem (EXISTS). */
  def semiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.load(spark, sfDir, "part").select("p_partkey", "p_brand")
    val li = Tables.load(spark, sfDir, "lineitem").select("l_partkey")
    part.join(li, part("p_partkey") === li("l_partkey"), "left_semi")
      .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
  }

  /** JSON extraction from the events props column (schema-on-read). */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .filter(col("event_id") < 1000L)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))

  /**
   * Rollup aggregate — subtotals per returnflag plus a grand total in one
   * pass (Spark expands the grouping sets before the exchange; partial
   * aggregation still applies per set, so the extra rows cost one small
   * shuffle, not extra scans).
   */
  def rollupAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"))

  /**
   * Set operations — INTERSECT/EXCEPT over key sets, labeled and unioned.
   * Spark plans these as aggregates/joins on the key; all three legs share
   * the same two scans.
   */
  def setOps(spark: SparkSession, sfDir: String): DataFrame = {
    val recent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("o_custkey").as("custkey")).distinct()
    val negative = Tables.load(spark, sfDir, "customer")
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    recent.intersect(negative).withColumn("segment", lit("both"))
      .unionByName(recent.except(negative).withColumn("segment", lit("recent_only")))
      .unionByName(negative.except(recent).withColumn("segment", lit("negative_only")))
  }

  /**
   * Window-function pack: running spend, order rank, and days since the
   * previous order per customer — one shuffle on the key, one sort within
   * partitions, all three windows share the same frame.
   */
  def runningTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, sfDir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("order_rank"),
        sum(col("o_totalprice").cast(Dec)).over(running).cast("double").as("running_spend"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate"), 1).over(w).cast("date")).cast("bigint").as("days_since_prev"))
  }

  /** The event types the pivot spreads into columns (fixed list — a pivot's
    * output schema must not depend on the data it reads). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /**
   * Pivot: daily event counts spread to one column per type. The explicit
   * value list keeps the schema static (no extra distinct-values job) and
   * `na.fill` normalizes absent combinations to 0 like the SQL CASE form.
   */
  def pivotCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)

  /** Hourly tumbling aggregation over events (batch form of the streaming
    * monitor; see graft.streaming.EventMonitor for the readStream twin). */
  def eventWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))

  /** BUILT-IN session windows — `session_window(ts, 30 min)`: Catalyst's
    * native gap-merge aggregation, the declarative twin of the custom
    * stateful [[graft.streaming.Sessionize]] (which exists for streaming
    * state control; at rest, let the optimizer own the merge). Built-in
    * semantics: a session's window ends at last-event + gap, and two
    * events merge when their distance is STRICTLY under the gap — both
    * replayed in the oracle. */
  def sessionWindowQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .select(
        col("user_id"),
        expr("unix_micros(session_window.start) div 1000").as("session_start_ms"),
        expr("unix_micros(session_window.end) div 1000").as("session_end_ms"),
        col("n_events"), col("n_errors"))

  /** SLIDING windows — `window(ts, 1 hour, 15 min)`: every event lands in
    * exactly width/slide = 4 overlapping windows (epoch-aligned), the
    * rolling-rate view a tumbling hour can't give. Spark expands the
    * window set with a generator BEFORE the hash aggregation, so the
    * shape stays one explode + one shuffle — the same cost envelope as
    * the tumbling form times the overlap factor, never a self-join. */
  def slidingWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy(
        window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
      .select(
        (unix_micros(col("window.start")) / lit(1000L)).cast("bigint")
          .as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))
}
