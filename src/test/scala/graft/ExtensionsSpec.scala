package graft

import org.apache.spark.sql.{SparkSession, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** `spark.sql.extensions=graft.GraftExtensions` — a session built with only
  * the config string gets the full SQL function surface, and the SQL path
  * computes exactly what the Column API computes. */
class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    val base = spark // force shared session/context creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf — read from the SparkContext
      // at cluster start, so it cannot be exercised on this JVM's shared
      // context. `withExtensions` runs the exact same injection
      // (GraftExtensions.apply) on the new session being built.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base, "builder must create a fresh session")
      f(s2)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extension-built session answers SQL over every registered function") {
    withExtensionSession { s2 =>
      val row = s2.sql(
        """SELECT to_string_binary(to_bytes_binary('a\\x00b')) AS rt,
          |       simhash64(array('a','b','c')) AS sh,
          |       sorted_intersect_count(shingle_hashes(array('x','y','z'), 2),
          |                              shingle_hashes(array('x','y','z'), 2)) AS ic,
          |       size(minhash(shingle_hashes(array('x','y','z'), 2), 8)) AS k,
          |       cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS cs,
          |       dot_product(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
          |       zvalue(CAST(3 AS BIGINT), CAST(5 AS BIGINT)) AS zv
          |""".stripMargin).head()

      assert(row.getAs[String]("rt") == "a\\x00b")
      // SQL path ≡ Column-API path on the same session
      val shCols = s2.range(1).select(
        SimHashFunctions.simhash64(F.array(F.lit("a"), F.lit("b"), F.lit("c")))
          .as("sh")).head().getAs[Long]("sh")
      assert(row.getAs[Long]("sh") == shCols)
      assert(row.getAs[Long]("ic") == 2L) // windows xy, yz
      assert(row.getAs[Int]("k") == 8)
      assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
      assert(math.abs(row.getAs[Double]("dp") - 25.0) < 1e-12)
      assert(row.getAs[Long]("zv") == graft.functions.ZOrderImpl.interleave(3L, 5L))
    }
  }

  test("wrong arity and non-literal width fail analysis with clear messages") {
    withExtensionSession { s2 =>
      val arity = intercept[Exception](s2.sql("SELECT to_string_binary()").collect())
      assert(arity.getMessage.contains("expects 1"))
      val nonLit = intercept[Exception](
        s2.sql("SELECT shingle_hashes(array('a'), CAST(id AS INT)) FROM range(1)")
          .collect())
      assert(nonLit.getMessage.contains("integer literal"))
    }
  }

  test("registerAll exposes the same surface as session-scoped temp functions") {
    GraftFunctionRegistry.registerAll(spark)
    val r = spark.sql(
      "SELECT to_string_binary(to_bytes_binary('\\\\x00\\\\xFFok')) AS rt").head()
    assert(r.getAs[String]("rt") == "\\x00\\xFFok")
  }
}
