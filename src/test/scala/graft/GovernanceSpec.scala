package graft

import graft.operators.{Governance, TableStats}
import org.scalatest.funsuite.AnyFunSuite

class GovernanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("purge: removes exactly the in-scope rows, audit proves none left") {
    val facts = Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, "d"))
      .toDF("user_id", "payload")
    val requests = Seq(2L, 9L).toDF("subject_id")
    val (purged, audit) =
      Governance.purgeWithAudit(facts, requests, "user_id", "subject_id")
    assert(purged.select("user_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L))
    val a = audit.head
    assert(a.getAs[Long]("n_before") == 4 && a.getAs[Long]("n_purged") == 2 &&
      a.getAs[Long]("n_after") == 2 && a.getAs[Boolean]("none_left"))
  }

  test("purge plan: the deletion list broadcasts; the fact side never shuffles") {
    val orders = graft.sources.Tables.load(spark, sf001, "orders")
    val req = graft.sources.Tables.load(spark, sf001, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 97 === 0)
    val (purged, _) =
      Governance.purgeWithAudit(orders, req, "o_custkey", "c_custkey")
    val plan = purged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"purge must be a broadcast anti-join:\n$plan")
    // only the tiny deletion list may shuffle (its distinct); every
    // exchange must be on the _pk key list, never the fact columns
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(_.contains("_pk")),
      s"fact side must not shuffle:\n$plan")
  }

  test("join estimate: exact on the uniform fixture join, gate holds") {
    val r = TableStats.joinEstimateQuery(spark, sf001).head
    // uniform synthetic FK: every order matches exactly one customer
    assert(r.getAs[Long]("actual_rows") == r.getAs[Long]("n_left"))
    assert(r.getAs[Boolean]("within_3x"))
    assert(r.getAs[Long]("est_rows") > 0)
  }
}
