package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Link-graph importance (weighted PageRank) over the event stream — the
 * domain-rank signal production corpora use for importance-weighted data
 * selection (Common Crawl releases page/host rank for exactly this use;
 * CCNet/RefinedWeb-style pipelines filter and sample by it). The graph
 * here is the navigation graph the fixture affords: per user, each
 * consecutive pair of visited items (ordered by ts, event_id) is a
 * directed transition, and edge weight = transition count.
 *
 * Arithmetic is INTEGER rank units (scale 1e12), floor division at every
 * step, so the fixed iteration count yields bit-identical ranks in any
 * engine — the oracle replays the same five iterations unrolled in SQL.
 * The variant is the standard damped power iteration with dangling mass
 * dropped (a node with no out-edges donates nothing; with this graph
 * construction only terminal-only items are dangling):
 *
 *   r_0(v)    = scale // N
 *   r_t+1(v)  = (15 * scale) // (100 * N)
 *               + Σ_u ((((r_t(u) * 85) // 100) * w(u,v)) // W(u))
 *
 * The contribution product (0.85 · scale) · w outgrows Long near edge
 * weight ~1e7 at scale 1e12, so it is carried in DECIMAL(38,0) (the
 * [[EpochShuffle]] discipline — exact, overflow-checked, identical
 * floor quotients on these positive operands): there is no silent-wrap
 * cliff at any realistic weight, and per-iteration results stay
 * bit-identical to the BIGINT oracle wherever the oracle itself can
 * represent them.
 *
 * 100 TB shape: the event log collapses ONCE to the aggregated edge
 * table (map-side-combined groupBy — the only pass over raw events);
 * each iteration is one join + one map-side-combined aggregation over
 * EDGES, never events. Ranks live per node (domain-sized); the edge
 * table is localCheckpointed so the loop re-reads a pinned artifact,
 * and each iteration's rank table is checkpointed to cut the lineage
 * (at cluster scale: reliable checkpoint + edges pre-partitioned by src
 * so every iteration's join reuses one partitioning; AQE broadcasts the
 * rank side when the node domain is small).
 */
object LinkRank {

  /** 1e12 rank units ≙ total mass 1.0. */
  val Scale = 1000000000000L

  /** Aggregated transition edges (src, dst, w) from the raw event log:
    * per user, consecutive distinct items ordered by (ts, event_id). */
  def transitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .withColumn("src", lag(col("k"), 1).over(byUser))
      .filter(col("src").isNotNull && col("src") =!= col("k"))
      .groupBy(col("src"), col("k").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Damped integer power iteration; returns (node, rank) in rank units. */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = Scale): DataFrame = {
    require(iters >= 0, "iteration count must be non-negative")
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wout"))
    val linked = edges.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("wout"))
      .localCheckpoint() // the loop invariant: pinned, re-read per iteration
    val nodes = linked.select(col("src").as("node"))
      .union(linked.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty link graph")
    val base = (15L * scale) / (100L * n)
    var r = nodes.select(col("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = linked.join(r, linked("src") === r("node"))
        .select(col("dst"),
          // (rank·85 div 100)·w div wout in DECIMAL(38,0): the product
          // passes 2⁶³ near w ~1e7, and non-ANSI Long multiply would
          // wrap silently where the DuckDB oracle errors instead
          expr("CAST(CAST((CAST(rank AS DECIMAL(38,0)) * 85) div 100 AS DECIMAL(38,0))" +
            " * CAST(w AS DECIMAL(38,0)) div wout AS BIGINT)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      r = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"), (lit(base) + coalesce(col("c"), lit(0L))).as("rank"))
        .localCheckpoint() // cut the iteration lineage
    }
    r
  }

  /** Query-pack adapter: five iterations over the event transition
    * graph, every node's rank in integer units. */
  def linkRankQuery(spark: SparkSession, sfDir: String): DataFrame =
    pageRank(transitions(Tables.load(spark, sfDir, "events")), iters = 5)
      .select(col("node").as("k"), col("rank").as("rank_units"))

  /**
   * Deterministic label propagation (weighted, synchronous) — community
   * structure over the same graph, the balance/topic signal next to the
   * importance signal. Each round every node adopts the label with the
   * LARGEST incident edge weight among its (undirected) neighbors, ties
   * broken by the SMALLEST label — a total tie order, so a fixed round
   * count is bit-reproducible in any engine (the oracle unrolls the same
   * rounds in SQL). Labels start as the node ids.
   *
   * Per round: one join of the label table against the undirected edge
   * table, one map-side-combined (node, label) weight sum, one per-node
   * window argmax — all edge-table-sized, never event-sized.
   */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val und = edges.select(col("src").as("v"), col("dst").as("u"), col("w"))
      .unionByName(edges.select(col("dst").as("v"), col("src").as("u"), col("w")))
      .groupBy("v", "u").agg(sum(col("w")).as("w"))
      .localCheckpoint()
    val nodes = und.select(col("v").as("node")).distinct().localCheckpoint()
    var lab = nodes.select(col("node"), col("node").as("label"))
    val byNode = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("s").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      lab = und.join(lab, und("u") === lab("node"))
        .select(und("v").as("node"), col("label"), col("w"))
        .groupBy("node", "label").agg(sum(col("w")).as("s"))
        .withColumn("rn", row_number().over(byNode))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    lab
  }

  /** Query-pack adapter: three synchronous rounds over the transition
    * graph — (item, community) for every node. */
  def labelPropQuery(spark: SparkSession, sfDir: String): DataFrame =
    labelPropagation(transitions(Tables.load(spark, sfDir, "events")), rounds = 3)
      .select(col("node").as("k"), col("label").as("community"))

  /** Next-item transition table — the serving artifact a session-based
    * recommender reads: per item, the top-3 successors by transition
    * weight with exact micro-unit probabilities ((w·10⁶) div out-weight),
    * full (weight desc, dst asc) tie order. */
  def nextItems(events: DataFrame): DataFrame =
    nextItemsFromEdges(transitions(events))

  /** [[nextItems]] over an already-built edge table (callers that have
    * the edges in hand must not pay a second event scan). */
  def nextItemsFromEdges(e: DataFrame): DataFrame = {
    val out = e.groupBy("src").agg(sum(col("w")).as("wout"))
    val bysrc = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("w").desc, col("dst").asc)
    e.join(out, "src")
      .withColumn("rn", row_number().over(bysrc))
      .filter(col("rn") <= 3)
      .select(col("src").as("k"), col("dst").as("next_k"),
        col("w"), expr("(w * 1000000) div wout").as("p_micro"),
        col("rn").cast("long").as("rank"))
  }

  def nextItemQuery(spark: SparkSession, sfDir: String): DataFrame =
    nextItems(Tables.load(spark, sfDir, "events"))
}
