package graft

import graft.model.CellTable
import graft.operators.StoreCounters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HBase Increment semantics: latest-version base, batch-summed deltas,
  * create-from-zero, and untouched counters emitting no new version. */
class StoreCountersSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def cell(key: Long, qual: String, ts: Long, v: Long) =
    (key, "counters", qual, ts, "Put", v)

  private def cells(rows: Seq[(Long, String, String, Long, String, Long)]) =
    rows.toDF("k", "family", "q", "ts", "cellType", "v").select(
      CellTable.bigEndianKey(col("k")).as("rowKey"),
      col("family"),
      col("q").cast("binary").as("qualifier"),
      col("ts"),
      col("cellType"),
      StoreCounters.encodeCounter(col("v")).as("value"))

  test("increments add to the LATEST version, sum per batch, create from zero") {
    val base = cells(Seq(
      cell(1L, "hits", 1000L, 10L),
      cell(1L, "hits", 2000L, 50L),   // latest -> increments start from 50
      cell(2L, "hits", 1000L, 7L)))   // untouched -> no new version
    val deltas = Seq(
      (1L, "hits", 3L), (1L, "hits", 4L),  // same coordinate: summed first
      (9L, "hits", 5L)                      // no base cell: created from 0
    ).toDF("k", "q", "delta").select(
      CellTable.bigEndianKey(col("k")).as("rowKey"),
      lit("counters").as("family"),
      col("q").cast("binary").as("qualifier"),
      col("delta"))

    val out = StoreCounters.applyIncrements(base, deltas, newTs = 3000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        col("qualifier").cast("string").as("q"), col("ts"),
        StoreCounters.decodeCounter(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((1L, "hits", 3000L, 57L), (9L, "hits", 3000L, 5L)))

    // committed view keeps full history plus the new versions
    val all = StoreCounters.incremented(base, deltas, newTs = 3000L)
    assert(all.count() == 5)
    val latest1 = all
      .filter(CellTable.keyToLong(col("rowKey")) === 1L)
      .orderBy(col("ts").desc).limit(1)
      .select(StoreCounters.decodeCounter(col("value"))).as[Long].head()
    assert(latest1 == 57L)
  }

  test("a second identical batch re-applies on top (versions, not overwrite)") {
    val base = cells(Seq(cell(1L, "hits", 1000L, 100L)))
    val deltas = Seq((1L, "hits", 1L)).toDF("k", "q", "delta").select(
      CellTable.bigEndianKey(col("k")).as("rowKey"),
      lit("counters").as("family"),
      col("q").cast("binary").as("qualifier"),
      col("delta"))
    val after1 = StoreCounters.incremented(base, deltas, newTs = 2000L)
    val after2 = StoreCounters.incremented(after1, deltas, newTs = 3000L)
    val history = after2
      .orderBy("ts")
      .select(StoreCounters.decodeCounter(col("value"))).as[Long].collect()
    assert(history.sameElements(Array(100L, 101L, 102L)))
  }

  test("a deleted counter resumes from zero; a post-marker put is live again") {
    val puts = cells(Seq(
      cell(1L, "hits", 1000L, 100L),   // deleted at 2000 -> resumes from 0
      cell(2L, "hits", 1000L, 100L),   // deleted at 2000, re-put at 3000
      cell(2L, "hits", 3000L, 7L),     //   -> increments start from 7
      cell(3L, "hits", 1000L, 9L)))    // no marker -> starts from 9
    val base = CellTable.withDeleteMarkers(
      puts, CellTable.keyToLong(col("rowKey")).isin(1L, 2L) && col("ts") === 1000L,
      lit(2000L))
    val deltas = Seq((1L, "hits", 1L), (2L, "hits", 1L), (3L, "hits", 1L))
      .toDF("k", "q", "delta").select(
        CellTable.bigEndianKey(col("k")).as("rowKey"),
        lit("counters").as("family"),
        col("q").cast("binary").as("qualifier"),
        col("delta"))
    val out = StoreCounters.applyIncrements(base, deltas, newTs = 5000L)
      .select(CellTable.keyToLong(col("rowKey")).as("k"),
        StoreCounters.decodeCounter(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 8L, 3L -> 10L))
  }
}
