package graft

import graft.model.CellTable
import graft.operators.StoreMutations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** checkAndPut decision table and Append concatenation semantics. */
class StoreMutationsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def baseCells(rows: Seq[(Long, String, Long, String)]) =
    rows.toDF("k", "q", "ts", "v").select(
      CellTable.bigEndianKey(col("k")).as("rowKey"),
      lit("f").as("family"),
      col("q").cast("binary").as("qualifier"),
      col("ts"),
      lit("Put").as("cellType"),
      col("v").cast("binary").as("value"))

  test("checkAndPut: every decision case, checks run against the LATEST version") {
    val base = baseCells(Seq(
      (1L, "seg", 1000L, "OLD"),
      (1L, "seg", 2000L, "BUILDING"),  // latest wins the check
      (2L, "seg", 1000L, "AUTO")))
    val muts = Seq(
      // (k, checkQ, expected, putQ, value, wantApplied)
      (1L, "seg", Some("BUILDING"), "seg", "PROMOTED", true),  // matches latest
      (1L, "seg", Some("OLD"), "seg", "X", false),             // stale expected
      (2L, "seg", Some("BUILDING"), "seg", "X", false),        // value differs
      (1L, "flag", None: Option[String], "flag", "NEW", true), // absent-gated, absent
      (1L, "seg", None: Option[String], "seg", "X", false),    // absent-gated, present
      (3L, "seg", Some("AUTO"), "seg", "X", false)             // cell missing
    )
    val mutDf = muts.map { case (k, cq, exp, q, v, _) => (k, cq, exp, q, v) }
      .toDF("k", "cq", "exp", "q", "v").select(
        CellTable.bigEndianKey(col("k")).as("rowKey"),
        lit("f").as("family"),
        col("cq").cast("binary").as("checkQualifier"),
        col("exp").cast("binary").as("expected"),
        col("q").cast("binary").as("qualifier"),
        col("v").cast("binary").as("value"))
    val out = StoreMutations.checkAndPut(base, mutDf, newTs = 5000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        col("qualifier").cast("string").as("q"),
        col("value").cast("string").as("v"), col("applied"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getBoolean(3))
      .toMap
    muts.foreach { case (k, _, _, q, v, want) =>
      assert(out((k, q, v)) == want, s"mutation ($k,$q,$v)")
    }
    // applied cells are committable store cells; rejected is the audit rest
    val checked = StoreMutations.checkAndPut(base, mutDf, newTs = 5000L)
    assert(StoreMutations.appliedCells(checked).count() == 2)
    assert(StoreMutations.rejected(checked).count() == 4)
    assert(StoreMutations.appliedCells(checked).columns.toSeq ==
      Seq("rowKey", "family", "qualifier", "ts", "cellType", "value"))
  }

  test("append: concatenates onto latest, creates missing cells, batch in byte order") {
    val base = baseCells(Seq((1L, "name", 1000L, "alice")))
    val appends = Seq(
      (1L, "name", "#b"), (1L, "name", "#a"),  // one coordinate, sorted: #a then #b
      (2L, "name", "solo")                      // missing cell: created from empty
    ).toDF("k", "q", "s").select(
      CellTable.bigEndianKey(col("k")).as("rowKey"),
      lit("f").as("family"),
      col("q").cast("binary").as("qualifier"),
      col("s").cast("binary").as("suffix"))
    val out = StoreMutations.applyAppends(base, appends, newTs = 2000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        col("value").cast("string").as("v"), col("ts"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alice#a#b", 2000L))
    assert(out(2L) == ("solo", 2000L))
  }

  test("mutations read THROUGH delete markers: deleted coordinates are absent") {
    // k=1 seg deleted after its put; k=2 seg deleted then re-put (visible)
    val puts = baseCells(Seq(
      (1L, "seg", 1000L, "BUILDING"),
      (2L, "seg", 1000L, "BUILDING"),
      (2L, "seg", 3000L, "REBORN")))
    val base = CellTable.withDeleteMarkers(
      puts, CellTable.keyToLong(col("rowKey")).isin(1L, 2L), lit(2000L))
    // checkAndPut: expected=null must MATCH the deleted k=1 (absent), and
    // expected=BUILDING must FAIL on it; k=2's post-marker put is live
    val mutDf = Seq(
      (1L, "seg", None: Option[String], "flag", "SET"),
      (1L, "seg", Some("BUILDING"), "seg", "X"),
      (2L, "seg", Some("REBORN"), "seg", "OK"))
      .toDF("k", "cq", "exp", "q", "v").select(
        CellTable.bigEndianKey(col("k")).as("rowKey"),
        lit("f").as("family"),
        col("cq").cast("binary").as("checkQualifier"),
        col("exp").cast("binary").as("expected"),
        col("q").cast("binary").as("qualifier"),
        col("v").cast("binary").as("value"))
    val decisions = StoreMutations.checkAndPut(base, mutDf, newTs = 5000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        col("qualifier").cast("string").as("q"), col("applied"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(decisions((1L, "flag")), "null-expected must match a deleted cell")
    assert(!decisions((1L, "seg")), "concrete expected must fail on a deleted cell")
    assert(decisions((2L, "seg")), "a put AFTER the marker is visible again")
    // append: deleted k=1 starts from empty; k=2 appends onto the re-put
    val appends = Seq((1L, "seg", "+x"), (2L, "seg", "+x"))
      .toDF("k", "q", "s").select(
        CellTable.bigEndianKey(col("k")).as("rowKey"),
        lit("f").as("family"),
        col("q").cast("binary").as("qualifier"),
        col("s").cast("binary").as("suffix"))
    val appended = StoreMutations.applyAppends(base, appends, newTs = 5000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        col("value").cast("string").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(appended(1L) == "+x")
    assert(appended(2L) == "REBORN+x")
  }
}
