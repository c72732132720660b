package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Distribution statistics: exact forms (oracle-checked) next to the sketch
 * forms that replace them at 100 TB.
 *
 *  - Exact percentiles sort-and-interpolate within each group — fine at
 *    bench scale, a full sort of the group at 100 TB.
 *  - `approx_percentile` (KLL-style) and `approx_count_distinct` (HLL++)
 *    are one-pass, fixed-memory, mergeable map-side sketches — the shape
 *    that survives a 1000-executor aggregation. Their outputs are
 *    engine-specific, so they are covered by error-bound specs against the
 *    exact twins rather than a DuckDB hash match.
 */
object Sketches {

  private val Dec = DecimalType(18, 4)

  /** Exact interpolated percentiles of event value per type. */
  def percentilesQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"))

  /** Sketch twin of [[percentilesQuery]]: one-pass approximate quantiles. */
  def percentilesApproxQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99"))

  /** Sketch twin of TextAnalysis.vocab: HLL++ distinct-token counts —
    * fixed-size state per (lang) group instead of a (lang, token) shuffle
    * of the whole corpus. */
  def vocabApproxQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(
        approx_count_distinct(col("tok"), 0.01).as("n_distinct_tokens_approx"),
        count(lit(1)).as("n_tokens"))

  /** Driver-checkable form of [[vocabApproxQuery]]: the sketch output is
    * engine-specific (no SQL oracle can replay HLL++ registers), but its
    * CONTRACT — within the configured 1% relative standard error of the
    * exact count, checked at 5% to leave 5σ of headroom — is a boolean
    * both engines can agree on. Spark computes approx AND exact and emits
    * (exact stats, within_bound); the oracle recomputes the exact stats
    * and asserts TRUE — so the driver's hash compare verifies the exact
    * side bit-for-bit and fails loudly if the sketch ever drifts out of
    * bound. (The exact twin is verification scaffolding; at 100 TB only
    * the sketch side runs — that's [[vocabApproxQuery]].) */
  def vocabApproxCheckQuery(spark: SparkSession, sfDir: String): DataFrame =
    // dedup-first: aggregate the token stream to (lang, tok, count) once
    // (map-side combined), then sketch + count over the DISTINCT tokens.
    // HLL registers are max-folded, so the sketch over the distinct set is
    // bit-identical to the sketch over the multiset — while mixing
    // approx_count_distinct with countDistinct in ONE agg puts the ~16 KB
    // HLL buffer through the distinct rewrite's first aggregate, allocated
    // once per DISTINCT TOKEN (the TableStats.analyze trap; measured here:
    // 2.04 s → 0.99 s at sf0.1). n_tokens folds back as Σ count.
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("_c"))
      .groupBy("lang")
      .agg(
        // DataSketches HLL at lgK=14 (~0.8% RSE, >6 sigma inside the 5%
        // gate) instead of approx_count_distinct(0.01), whose 2^14 HLL++
        // registers ride as ~2,731 agg buffer attributes and cost ~0.9 s
        // of planning/codegen per execution at ANY row count (round 19 —
        // the TableStats.analyze measurement; the boolean contract below
        // is unchanged)
        hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(14))).as("_approx"),
        count(col("tok")).as("n_distinct_tokens"),
        sum(col("_c")).as("n_tokens"))
      .select(col("lang"), col("n_distinct_tokens"), col("n_tokens"),
        (abs(col("_approx") - col("n_distinct_tokens")).cast("double") <=
          lit(0.05) * col("n_distinct_tokens").cast("double"))
          .as("within_bound"))

  /**
   * Per-source vocabulary sketches as MERGEABLE STATE (Apache DataSketches
   * HLL via Spark's `hll_sketch_agg`): one fixed-size binary sketch per
   * source that can be persisted, shipped, and re-merged later with
   * `hll_union_agg` — the global-distinct answer over N sources costs a
   * union of N sketches, never a rescan of the corpus. This is the
   * 100 TB form of cross-source vocabulary accounting: each ingest job
   * emits its source's sketch; any later job unions whichever subset it
   * needs.
   */
  def vocabSketches(docs: DataFrame, lgK: Int = 14): DataFrame =
    docs.select(col("source"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("source")
      .agg(hll_sketch_agg(col("tok"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_tokens"))

  /** Union of previously-built [[vocabSketches]]: sketches in, one global
    * distinct estimate out — no corpus access. */
  def unionSketches(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("n_distinct_approx"))

  /** Driver-checkable form of the sketch-union path (the
    * [[vocabApproxCheckQuery]] pattern): per-source sketch estimates AND
    * the cross-source UNION estimate are each bound-checked against the
    * exact distinct counts Spark also computes; the oracle recomputes the
    * exact side and asserts every boolean TRUE. lgK=14 gives ~0.8%
    * relative standard error; the 5% gate leaves >5 sigma of headroom.
    * (The exact twins are verification scaffolding — at 100 TB only the
    * sketch side runs; that's [[vocabSketches]] + [[unionSketches]].) */
  def sketchUnionCheckQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("source"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
    // sketch agg kept SEPARATE from the countDistinct agg: mixing them in
    // one agg() puts the 16 KB hll buffer through the distinct-rewrite's
    // Expand (one buffer allocation per distinct value — the measured
    // 6 s-vs-0.3 s trap TableStats.analyze documents); two narrow aggs +
    // a tiny per-source join cost one extra token pass instead
    val sk = toks.groupBy("source")
      .agg(hll_sketch_agg(col("tok"), lit(14)).as("sk"))
    val per = toks.groupBy("source")
      .agg(countDistinct(col("tok")).as("n_distinct"),
        count(lit(1)).as("n_tokens"))
      .join(sk, Seq("source"))
    val perOut = per.select(col("source"), col("n_distinct"), col("n_tokens"),
      (abs(hll_sketch_estimate(col("sk")) - col("n_distinct")).cast("double") <=
        lit(0.05) * col("n_distinct").cast("double")).as("within_bound"))
    val unionEst = sk.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("_est"))
    val exactAll = toks.agg(countDistinct(col("tok")).as("n_distinct"),
      count(lit(1)).as("n_tokens"))
    val unionOut = unionEst.crossJoin(exactAll)
      .select(lit("(all)").as("source"), col("n_distinct"), col("n_tokens"),
        (abs(col("_est") - col("n_distinct")).cast("double") <=
          lit(0.05) * col("n_distinct").cast("double")).as("within_bound"))
    perOut.unionByName(unionOut)
  }

  /**
   * Cross-source vocabulary OVERLAP from theta sketches — the set
   * operation HLL cannot do, on Spark 4's BUILT-IN datasketches surface
   * (`theta_sketch_agg` / `theta_intersection` / `theta_difference` /
   * `theta_sketch_estimate` — built-ins beat a custom aggregate both for
   * codegen integration and for sketch-format compatibility with other
   * datasketches consumers). One theta sketch per source (single pass,
   * map-side combined), then every pair's intersection and difference
   * cardinality is post-aggregation arithmetic on fixed-size state —
   * never a token-level pairwise join. At 100 TB this is the only
   * tractable shape for "how much vocabulary do these N sources share":
   * the corpus is read once, and all O(S²) pairings cost nothing.
   */
  def thetaVocabOverlap(docs: DataFrame, lgK: Int = 12): DataFrame = {
    val st = docs.select(col("source"),
      explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
    // materialize the S-row sketch table: an unmaterialized self-join
    // would re-derive the aggregation — TWO corpus scans for one — and
    // the sketches are the persistable artifact anyway
    val per = st.groupBy("source")
      .agg(theta_sketch_agg(col("tok"), lgK).as("sk"))
      .localCheckpoint(true)
    per.alias("x").join(per.alias("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        theta_sketch_estimate(theta_intersection(col("x.sk"), col("y.sk")))
          .as("n_inter_approx"),
        theta_sketch_estimate(theta_difference(col("x.sk"), col("y.sk")))
          .as("n_only_a_approx"))
  }

  /** Driver-checkable form of [[thetaVocabOverlap]] (sketch-twin
    * pattern): the exact per-pair intersection/difference/union are
    * computed alongside, and the sketch answers are gated at 5% of the
    * UNION size (the scale the theta set-op error is relative to; in the
    * sketches' exact regime — under 2^lgK retained hashes — the
    * estimates are exact and the margin is 0). The oracle recomputes the
    * exact side and asserts every boolean TRUE. */
  def thetaOverlapCheckQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.load(spark, sfDir, "documents")
      .select(col("source"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .distinct()
    val per = st.groupBy("source")
      .agg(theta_sketch_agg(col("tok")).as("sk"),
        count(lit(1)).as("nd"))
    val ex = st.alias("a")
      .join(st.alias("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    per.alias("x").join(per.alias("y"), col("x.source") < col("y.source"))
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        col("x.nd").as("n_a"), col("y.nd").as("n_b"),
        theta_sketch_estimate(theta_intersection(col("x.sk"), col("y.sk")))
          .cast("double").as("_ie"),
        theta_sketch_estimate(theta_difference(col("x.sk"), col("y.sk")))
          .cast("double").as("_de"))
      .join(ex, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_a") + col("n_b") - col("n_inter")).as("n_union"),
        (abs(col("_ie") - col("n_inter").cast("double")) <=
          lit(0.05) * (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("inter_within_bound"),
        (abs(col("_de") - (col("n_a") - col("n_inter")).cast("double")) <=
          lit(0.05) * (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("diff_within_bound"))
  }

  /** Driver-checkable form of [[percentilesApproxQuery]]: KLL-style
    * `percentile_approx(accuracy = 10000)` returns an ELEMENT of the
    * group whose rank is within ε·n of q·n (ε = 1e-4), so the sound
    * bracket is in rank space: the approx value must land between the
    * order statistics at ranks q·n ∓ max(1, 0.001·n) — 10× the guarantee,
    * and a bound that follows from the rank-error contract for EVERY
    * group size. (The previous bracket used interpolated quantiles at
    * q ± 0.001, which for small groups can interpolate strictly between
    * order statistics and sit above the returned element — fixture-
    * fragile, not sketch-wrong.) Order statistics come from a per-group
    * rank (value order; ties rank arbitrarily but the VALUE at a rank is
    * tie-invariant, so the bracket is deterministic). The booleans are
    * Spark-computed; the oracle contributes the group keys and TRUE
    * literals, making a sketch regression a hash mismatch in the
    * driver's gate. */
  def percentilesApproxCheckQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, sfDir, "events").select("event_type", "value")
    val approx = ev.groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("a50"),
        percentile_approx(col("value"), lit(0.95), lit(10000)).as("a95"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("a99"),
        count(lit(1)).as("n"))
      .withColumn("d", greatest(lit(1L), floor(col("n") * 0.001).cast("long")))
    val ranked = ev.withColumn("_r", row_number().over(
      Window.partitionBy("event_type").orderBy(col("value").asc)).cast("long"))
    def rlo(q: Double) = greatest(lit(1L),
      (floor(col("n") * q).cast("long") - col("d")))
    def rhi(q: Double) = least(col("n"),
      (ceil(col("n") * q).cast("long") + col("d")))
    val bounds = ranked
      .join(broadcast(approx.select("event_type", "n", "d")), "event_type")
      .groupBy("event_type")
      .agg(
        min(when(col("_r") === rlo(0.5), col("value"))).as("lo50"),
        min(when(col("_r") === rhi(0.5), col("value"))).as("hi50"),
        min(when(col("_r") === rlo(0.95), col("value"))).as("lo95"),
        min(when(col("_r") === rhi(0.95), col("value"))).as("hi95"),
        min(when(col("_r") === rlo(0.99), col("value"))).as("lo99"),
        min(when(col("_r") === rhi(0.99), col("value"))).as("hi99"))
    approx.join(bounds, "event_type")
      .select(col("event_type"),
        col("a50").between(col("lo50"), col("hi50")).as("p50_ok"),
        col("a95").between(col("lo95"), col("hi95")).as("p95_ok"),
        col("a99").between(col("lo99"), col("hi99")).as("p99_ok"))
  }

  /** Misra-Gries state: bounded MUTABLE counter map + total stream length.
    * Counters are `long[1]` cells in a `java.util.HashMap`, so the hottest
    * path — incrementing an existing token — is one hash probe and an
    * in-place bump: zero allocation per token (the previous immutable-`Map`
    * state rebuilt the whole map per element, GC pressure in the hottest
    * agg loop of a 100 TB token stream). Serialization (java-ser, binary
    * buffer) happens only at partial-state shuffle boundaries — within a
    * partition the aggregator mutates the live object. */
  final class MGBuffer extends Serializable {
    val counters = new java.util.HashMap[String, Array[Long]]()
    var processed = 0L
  }

  /**
   * Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
   * bounded-memory answer to "top tokens over 100 TB": at most `k`
   * counters per group, single pass, MERGEABLE partial states (map-side
   * combine works), versus the exact formulation's (group, token) shuffle
   * of the whole corpus.
   *
   * Guarantees (standard MG): every item with true frequency > n/(k+1)
   * is present, and each reported count under-estimates by at most the
   * total decrement debt. When a group's distinct-item count is ≤ k no
   * decrement or merge-trim ever fires, so counts are EXACT — the regime
   * `q_heavy_hitters` runs in (fixture vocab ≈ 31 ≪ 256), which is what
   * lets DuckDB oracle-check a sketch operator at all.
   */
  class MisraGries(k: Int) extends Aggregator[String, MGBuffer, Seq[(String, Long)]] {
    require(k >= 1)
    override def zero: MGBuffer = new MGBuffer

    override def reduce(s: MGBuffer, x: String): MGBuffer = {
      val c = s.counters
      val cur = c.get(x)
      if (cur != null) cur(0) += 1L
      else if (c.size < k) c.put(x, Array(1L))
      else {
        // decrement-all step: drop zeroed counters (classic MG), in place
        val it = c.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue()(0) -= 1L
          if (e.getValue()(0) <= 0L) it.remove()
        }
      }
      s.processed += 1L
      s
    }

    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      val bit = b.counters.entrySet().iterator()
      while (bit.hasNext) {
        val e = bit.next()
        val cur = a.counters.get(e.getKey)
        if (cur != null) cur(0) += e.getValue()(0)
        else a.counters.put(e.getKey, Array(e.getValue()(0)))
      }
      if (a.counters.size > k) {
        // subtract the (k+1)-th largest count from everyone (the merge
        // analogue of decrement-all); error bounds add across merges
        val vals = new Array[Long](a.counters.size)
        var i = 0
        val vit = a.counters.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next()(0); i += 1 }
        java.util.Arrays.sort(vals)
        val kth = vals(vals.length - 1 - k)
        val it = a.counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue()(0) -= kth
          if (e.getValue()(0) <= 0L) it.remove()
        }
      }
      a.processed += b.processed
      a
    }

    /** Counters sorted (count desc, token asc) — deterministic ties. */
    override def finish(s: MGBuffer): Seq[(String, Long)] = {
      val out = Seq.newBuilder[(String, Long)]
      val it = s.counters.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out += (e.getKey -> e.getValue()(0)) }
      out.result().sortBy { case (t, n) => (-n, t) }
    }

    override def bufferEncoder: Encoder[MGBuffer] =
      Encoders.javaSerialization[MGBuffer]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Top-10 tokens per language via the MG sketch (exact regime — see
    * [[MisraGries]]; the oracle recomputes the same top-10 exactly). */
  def heavyHittersQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val mg = udaf(new MisraGries(256))
    Tables.load(spark, sfDir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(mg(col("tok")).as("hh"))
      .select(col("lang"), posexplode(expr("slice(hh, 1, 10)")))
      .select(
        col("lang"),
        (col("pos") + 1).cast("bigint").as("rank"),
        col("col._1").as("tok"),
        col("col._2").as("cnt"))
  }
}
