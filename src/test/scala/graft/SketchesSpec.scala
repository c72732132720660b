package graft

import graft.operators.{Sketches, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates: the approximate forms must track their exact twins
  * within the sketches' error bounds — that bound is the contract that
  * makes them usable as the 100 TB replacements. */
class SketchesSpec extends AnyFunSuite with SparkTestBase {

  test("approx_count_distinct tracks exact vocabulary within 5%") {
    val exact = TextAnalysis.vocab(Tables.load(spark, sf01, "documents"))
      .select("lang", "n_distinct_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.vocabApproxQuery(spark, sf01)
      .select("lang", "n_distinct_tokens_approx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, a) =>
      val e = exact(lang).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$lang: approx $a vs exact $e")
    }
  }

  test("approx percentiles bracket the exact ones") {
    val exact = Sketches.percentilesQuery(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Sketches.percentilesApproxQuery(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet == exact.keySet)
    // value-space tolerance: 2% of the per-type p99 spread
    exact.foreach { case (t, (e50, e95, e99)) =>
      val (a50, a95, a99) = approx(t)
      val tol = math.max(math.abs(e99) * 0.02, 1e-6)
      assert(math.abs(a50 - e50) <= tol, s"$t p50: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= tol, s"$t p95: $a95 vs $e95")
      assert(math.abs(a99 - e99) <= tol, s"$t p99: $a99 vs $e99")
    }
  }

  test("Misra-Gries: exact when distinct <= capacity, merge-stable across partitions") {
    import spark.implicits._
    val words = Seq.tabulate(2000)(i => s"w${i % 17}") // 17 distinct, skewed order
    val ds = scala.util.Random.shuffle(words).toDS().repartition(8) // force merges
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.operators.Sketches.MisraGries(64))
    val got = ds.toDF("tok").agg(mg(org.apache.spark.sql.functions.col("tok")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.toMap == exact, "distinct <= k: counts must be exact")
    // deterministic tiebreak: count desc then token asc
    assert(got == got.sortBy { case (t, n) => (-n, t) })
  }

  test("Misra-Gries: items above n/(k+1) survive trimming, counts never overshoot") {
    val mg = new graft.operators.Sketches.MisraGries(2)
    val stream = Seq.fill(600)("heavy") ++ Seq.tabulate(300)(i => s"rare$i")
    val s = scala.util.Random.shuffle(stream)
      .foldLeft(mg.zero)((acc, x) => mg.reduce(acc, x))
    val out = mg.finish(s).toMap
    assert(out.contains("heavy"), "item with freq > n/(k+1) must be present")
    assert(out("heavy") <= 600L, "MG counts under-estimate, never overshoot")
    assert(s.counters.size <= 2, "state bounded by capacity")
  }

  test("property: MG never overshoots, keeps guaranteed items, bounds state — reduce and merge paths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val streamGen = Gen.listOfN(400, Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")))
    val k = 3
    val mg = new graft.operators.Sketches.MisraGries(k)
    (0 until 40).foreach { i =>
      val xs = streamGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val st = xs.foldLeft(mg.zero)(mg.reduce)
      assert(st.counters.size <= k)
      mg.finish(st).foreach { case (t, c) => assert(c <= truth(t)) }
      truth.foreach { case (t, n) =>
        if (n > xs.size.toLong / (k + 1)) assert(st.counters.containsKey(t)) }
      // merge path: trim error adds, so the merged guarantee is 2n/(k+1)
      val (l, r) = xs.splitAt(xs.size / 2)
      val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce),
        r.foldLeft(mg.zero)(mg.reduce))
      assert(merged.counters.size <= k)
      mg.finish(merged).foreach { case (t, c) => assert(c <= truth(t)) }
      truth.foreach { case (t, n) =>
        if (n > 2L * xs.size / (k + 1)) assert(merged.counters.containsKey(t)) }
    }
  }

  test("rollup covers all grouping sets with consistent totals") {
    val rows = graft.operators.Relational.rollupAgg(spark, sf001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val flagSubtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == leaves.map(_.getLong(2)).sum)
    assert(flagSubtotals.map(_.getLong(2)).sum == grand.head.getLong(2))
  }

  test("HLL sketch union: mergeable across independent builds, estimates in bound") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sf01, "documents")
    // split the corpus in two, sketch each half INDEPENDENTLY (as two
    // ingest jobs would), then union the persisted sketches — the global
    // estimate must track the exact distinct of the whole corpus without
    // any rescan of the union'd data
    val a = Sketches.vocabSketches(docs.filter(col("doc_id") % 2 === 0))
    val b = Sketches.vocabSketches(docs.filter(col("doc_id") % 2 === 1))
    val est = Sketches.unionSketches(a.unionByName(b))
      .head.getLong(0).toDouble
    val exact = docs
      .select(explode(graft.operators.TextAnalysis
        .whitespaceTokens(lower(col("text")))).as("tok"))
      .agg(countDistinct(col("tok"))).head.getLong(0)
    assert(math.abs(est - exact) <= 0.05 * exact,
      s"union estimate $est vs exact $exact")
    // the check query asserts its own bounds — every boolean must be TRUE
    val chk = Sketches.sketchUnionCheckQuery(spark, sf01).collect()
    assert(chk.length > 1 && chk.forall(_.getAs[Boolean]("within_bound")))
  }
}
