package graft

import graft.functions.{BytesBinaryCodec, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** C1/C2 codec: pinned examples + scalacheck round-trip + the BinaryType
  * ordering property (SURVEY.md §5 items 1–2, FIXTURES.md §C). */
class CodecSpec extends AnyFunSuite with SparkTestBase {

  private val byteArrayGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  /** Deterministic property driver (no scalatestplus in the offline cache). */
  private def forAllBytes(n: Int)(check: Array[Byte] => Unit): Unit =
    (0 until n).foreach { i =>
      check(byteArrayGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("encode: printable ASCII passes through, rest hex-escapes uppercase") {
    assert(BytesBinaryCodec.encode("r1".getBytes("UTF-8")) == "r1")
    assert(BytesBinaryCodec.encode(Array[Byte](0)) == "\\x00")
    assert(BytesBinaryCodec.encode(Array[Byte](-1, -2)) == "\\xFF\\xFE")
    assert(BytesBinaryCodec.encode("key\ttab".getBytes("UTF-8")) == "key\\x09tab")
    assert(BytesBinaryCodec.encode("back\\slash".getBytes("UTF-8")) == "back\\x5Cslash")
  }

  test("decode: pinned examples") {
    assert(BytesBinaryCodec.decode("r1").sameElements("r1".getBytes("UTF-8")))
    assert(BytesBinaryCodec.decode("\\x00").sameElements(Array[Byte](0)))
    assert(BytesBinaryCodec.decode("\\xFF\\xFE").sameElements(Array[Byte](-1, -2)))
    assert(BytesBinaryCodec.decode("key\\x09tab").sameElements("key\ttab".getBytes("UTF-8")))
    // malformed escape (lowercase hex) is taken literally, not decoded
    assert(BytesBinaryCodec.decode("\\xff").sameElements("\\xff".getBytes("UTF-8")))
  }

  test("property: decode(encode(b)) == b for arbitrary byte arrays") {
    forAllBytes(500) { bytes =>
      assert(BytesBinaryCodec.decode(BytesBinaryCodec.encode(bytes)).sameElements(bytes))
    }
  }

  test("property: Spark BinaryType ordering == unsigned lexicographic (HBase Bytes.compareTo)") {
    def hbaseCompare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(org.apache.spark.sql.types.BinaryType)
      .asInstanceOf[Ordering[Any]]
    (0 until 300).foreach { i =>
      val a = byteArrayGen.pureApply(Gen.Parameters.default, Seed(1000L + i))
      val b = byteArrayGen.pureApply(Gen.Parameters.default, Seed(2000L + i))
      assert(Integer.signum(ord.compare(a, b)) == Integer.signum(hbaseCompare(a, b)))
    }
  }

  test("expressions round-trip through a Spark plan (codegen path)") {
    import spark.implicits._
    val df = Seq("r1", "a\tb", "\\x00weird", "", "xÿy").toDF("s")
      .select(col("s"), GraftFunctions.to_bytes_binary(col("s")).as("b"))
      .select(col("s"), GraftFunctions.to_string_binary(GraftFunctions.to_bytes_binary(
        GraftFunctions.to_string_binary(col("b")))).as("round"))
    // encode(decode(encode(x))) == encode(x): second pass must be stable
    val rows = df.collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val round = r.getString(1)
      assert(round == BytesBinaryCodec.encode(BytesBinaryCodec.decode(BytesBinaryCodec.encode(
        BytesBinaryCodec.decode(s)))))
    }
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT to_string_binary(to_bytes_binary('a\\\\x09b')) AS s")
      .collect().head.getString(0)
    assert(out == "a\\x09b")
  }
}
