package graft

import graft.operators.TableStats
import org.scalatest.funsuite.AnyFunSuite

class TableStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("analyze: nulls, ndv, min/max per column in one pass") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val r = TableStats.analyze(df, Seq("k", "s")).collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    val k = r("k")
    assert(k.getAs[Long]("n_rows") == 4 && k.getAs[Long]("n_nulls") == 1)
    assert(k.getAs[Long]("ndv") == 2)
    assert(k.getAs[String]("min_value") == "1" && k.getAs[String]("max_value") == "3")
    val s = r("s")
    assert(s.getAs[Long]("n_nulls") == 1 && s.getAs[Long]("ndv") == 2)
    assert(s.getAs[String]("min_value") == "a" && s.getAs[String]("max_value") == "b")
    assert(r.values.forall(_.getAs[Boolean]("ndv_within_bound")))
  }

  test("fixture stats: sketch bounds hold, key column is unique") {
    val r = TableStats.tableStatsQuery(spark, sf01).collect()
      .map(x => x.getAs[String]("col_name") -> x).toMap
    assert(r.size == 4)
    assert(r.values.forall(_.getAs[Boolean]("ndv_within_bound")))
    val ok = r("o_orderkey")
    assert(ok.getAs[Long]("ndv") == ok.getAs[Long]("n_rows"), "primary key unique")
  }
}
