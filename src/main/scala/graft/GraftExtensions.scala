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
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctionRegistry.inject(extensions)
}
