package graft

import graft.operators.Visibility
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cell visibility labels: DNF grammar truth table and the narrow plan. */
class VisibilitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("visibility grammar: every branch against a fixed auth set") {
    val auths = Seq("internal", "marketing")
    val cases = Seq(
      // (expression, expected visible under {internal, marketing})
      ("", true),                        // unlabeled -> public
      ("internal", true),                // granted atom
      ("pii", false),                    // ungranted atom
      ("finance&internal", false),       // conjunction needs both
      ("marketing&internal", true),      // conjunction, both granted
      ("marketing|finance", true),       // alternative, one granted
      ("pii|finance", false),            // alternative, none granted
      ("!restricted", true),             // negation of ungranted label
      ("!internal", false),              // negation of granted label
      ("!restricted&internal", true),    // negation inside conjunction
      ("pii&!partner|internal", true),   // DNF: second term carries it
      ("pii&!partner|finance", false)    // both terms fail
    )
    val got = cases.map(_._1).toDF("vis")
      .select(col("vis"), Visibility.visible(col("vis"), auths).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (vis, want) =>
      assert(got(vis) == want, s"'$vis' under $auths")
    }
  }

  test("authorized scan filters cells without a shuffle") {
    val cells = Seq(
      ("r1", "secret&internal", "v1"),
      ("r2", "", "v2"),
      ("r3", "internal", "v3")
    ).toDF("rowKey", "vis", "value")
    val out = Visibility.scanWithAuths(cells, Seq("internal"))
    assert(out.select("rowKey").as[String].collect().toSet == Set("r2", "r3"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "visibility is a per-row predicate — no shuffle")
  }
}
