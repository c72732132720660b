package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cell-level visibility labels — the HBase visibility-labels model
 * (`Scan.setAuthorizations`): each cell carries a label expression; a scan
 * runs with a set of granted authorizations and returns only the cells
 * whose expression that auth set satisfies.
 *
 * Expression grammar (disjunctive normal form, evaluated per cell):
 *
 * {{{
 *   expr := term ('|' term)*        -- visible if ANY term passes
 *   term := atom ('&' atom)*        -- a term passes if ALL atoms hold
 *   atom := ['!'] label             -- label granted / NOT granted
 *   ""   := visible to everyone     -- the unlabeled-cell default
 * }}}
 *
 * DNF covers HBase's `&`/`|`/`!` operator set; what it drops is only
 * parenthesized nesting, which distributes into DNF at labeling time.
 *
 * Scale shape: evaluation is a per-row predicate over two tiny arrays
 * (split on '|', split on '&') with the auth set inlined as a literal —
 * no join, no shuffle, no per-row state; composed of built-in
 * collection expressions so it rides the scan like any other filter.
 * Each split result is referenced exactly once per lambda tree (the
 * HOF re-evaluation trap documented at TextAnalysis.repetitionStats
 * does not bite at fan-out 1).
 */
object Visibility {

  /** True iff `vis` is satisfied by the granted `auths`. */
  def visible(vis: Column, auths: Seq[String]): Column = {
    val granted = typedlit(auths)
    val atomHolds = (x: Column) =>
      when(startswith(x, lit("!")),
        !array_contains(granted, x.substr(lit(2), length(x))))
        .otherwise(array_contains(granted, x))
    (vis === "") || exists(split(vis, "\\|"),
      term => forall(split(term, "&"), atomHolds))
  }

  /** The authorized scan: only cells whose `visCol` expression the auth
    * set satisfies survive (HBase returns a cell-less row as no row, so a
    * plain filter is the whole semantics). */
  def scanWithAuths(cells: DataFrame, auths: Seq[String],
      visCol: String = "vis"): DataFrame =
    cells.filter(visible(col(visCol), auths))
}
