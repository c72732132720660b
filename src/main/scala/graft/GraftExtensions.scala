package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctionRegistry

/**
 * Session-build hook for the whole engine surface:
 *
 * {{{
 *   spark-sql --conf spark.sql.extensions=graft.GraftExtensions \
 *             --conf spark.sql.catalog.cells=graft.sources.CellStoreCatalog
 * }}}
 *
 * registers every custom expression ([[graft.functions.GraftFunctionRegistry]])
 * at analysis time, so a pure-SQL session can run the same queries the
 * Scala Column API builds — `to_string_binary` / `to_bytes_binary` (the
 * reference's binary-string dialect, SURVEY.md C1/C2), the dedup kernels
 * (`shingle_hashes`, `minhash`, `simhash64`, `sorted_intersect_count`) and
 * the vector kernels (`cosine_sim`, `dot_product`). The cell-store side is
 * already SQL-reachable via the DSv2 catalog; this closes the function gap.
 *
 * The rollup serving rewrite rides along as an optimizer rule, so a
 * pure-SQL session gets materialized-view answering
 * ([[graft.plans.RollupRewrite]]) for registered tables without touching
 * `spark.experimental` — the rule no-ops until a rollup is registered and
 * has a session-conf kill switch. [[graft.plans.ValueIndexRewrite]] stays
 * on `spark.experimental.extraOptimizations` (its `ensureInjected`)
 * DELIBERATELY: it matches the post-pushdown `DataSourceV2ScanRelation`
 * shape, and the user-optimizer batch is the only hook that runs after
 * scan pushdown — injected here it would see pre-pushdown relations and,
 * worse, sit in the same fixed point as predicate pushdown, which could
 * re-push the re-applied condition onto the spliced scan and re-match
 * forever.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.inject(extensions)
    extensions.injectOptimizerRule(graft.plans.RollupRewriteRule(_))
  }
}
