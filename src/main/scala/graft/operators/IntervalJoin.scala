package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Interval (range) join — left rows at a point in time matched to right
 * rows whose `[start, end)` interval contains them, with a key equality.
 * Spark plans the naive `ON key AND t >= start AND t < end` as an equi-join
 * on the key followed by a per-key cross filter; a hot key with many
 * intervals degenerates to a per-key cross product.
 *
 * Scalable shape: time is cut into fixed granules; each right interval is
 * exploded to one row per granule it overlaps (bounded by
 * interval-length/granule), each left point maps to exactly one granule,
 * and the join runs on `(key, granule)` — a plain equi-join shuffle whose
 * fan-out is controlled by the granule width, never by the number of
 * intervals per key. The exact `[start, end)` predicate is re-applied
 * after the granule match, so the granule width is purely a performance
 * knob (pick ≈ the median interval length; a too-small granule explodes
 * the right side, a too-large one widens candidate sets).
 */
object IntervalJoin {

  /**
   * @param granuleSeconds granule width; each right interval produces
   *                       `⌈len/granule⌉+1` rows, each left row exactly one
   * @param rightPayload   right columns to attach (inner-join semantics)
   */
  /** Shared granule preparation: left gains (_k, _g); right is projected
    * to (_rk, _s, _e, payload) and exploded to one row per overlapped
    * granule (_rg). Right meta names are disjoint from left's so the
    * outer-join form can state its condition without ambiguity even when
    * both sides derive from the same source table. */
  private def prepared(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTime: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String],
      granuleSeconds: Long): (DataFrame, DataFrame) = {
    // fail fast on inputs that would yield ambiguous/clobbered columns
    val meta0 = Set("_k", "_g", "_rk", "_rg", "_s", "_e")
    val payloadClash = rightPayload.toSet.intersect(left.columns.toSet)
    require(payloadClash.isEmpty,
      s"intervalJoin: rightPayload collides with left columns: ${payloadClash.mkString(", ")}")
    val metaClash = left.columns.toSet.intersect(meta0)
    require(metaClash.isEmpty,
      s"intervalJoin: left columns ${metaClash.mkString(", ")} are reserved meta names (${meta0.mkString(", ")})")
    val g = granuleSeconds * 1000000L // granule in microseconds
    // cast: fixture timestamps may be NTZ; session TZ is UTC so the
    // instant is unchanged and granule math is consistent on both sides
    def granuleOf(t: Column): Column = floor(unix_micros(t.cast("timestamp")) / g)

    val l = left
      .withColumn("_g", granuleOf(col(leftTime)))
      .withColumn("_k", col(leftKey))
    val r = right.select(
        (Seq(col(rightKey).as("_rk"), col(rightStart).as("_s"), col(rightEnd).as("_e")) ++
          rightPayload.map(col)): _*)
      // one row per granule the interval [start, end) overlaps
      .withColumn("_rg", explode(sequence(granuleOf(col("_s")), granuleOf(col("_e")))))
    (l, r)
  }

  private val MetaCols = Seq("_k", "_g", "_rk", "_rg", "_s", "_e")

  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String],
      granuleSeconds: Long): DataFrame = {
    val (l, r) = prepared(left, right, leftKey, rightKey, leftTime,
      rightStart, rightEnd, rightPayload, granuleSeconds)
    l.join(r, col("_k") === col("_rk") && col("_g") === col("_rg"))
      .filter(col(leftTime) >= col("_s") && col(leftTime) < col("_e"))
      .drop(MetaCols: _*)
  }

  /**
   * Left-outer interval join: every left row survives; rows matching no
   * interval carry null payload. Same granule equi-join shuffle as the
   * inner form, planned as ONE left-outer join with the exact
   * `[start, end)` predicate inside the join condition — a non-matching
   * left row falls out of the join itself with null payload. No row
   * tagging, no anti-join, no second evaluation of the left subtree: the
   * result is deterministic even when the left input's row order is not
   * recompute-stable (anything downstream of a shuffle), which the
   * previous monotonically_increasing_id + anti-join form was not.
   */
  def intervalJoinLeft(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String,
      rightStart: String, rightEnd: String,
      rightPayload: Seq[String],
      granuleSeconds: Long): DataFrame = {
    val (l, r) = prepared(left, right, leftKey, rightKey, leftTime,
      rightStart, rightEnd, rightPayload, granuleSeconds)
    l.join(r,
        col("_k") === col("_rk") && col("_g") === col("_rg") &&
          col(leftTime) >= col("_s") && col(leftTime) < col("_e"),
        "left")
      .drop(MetaCols: _*)
  }

  // Query-pack adapter ---------------------------------------------------

  /** Events inside the 30-minute window after an error event of the same
    * user — "activity in an incident's blast radius". Granule = the window
    * width, so every interval explodes to exactly 2 granule rows. (The
    * error event matches its own window; the pair (e, e) is part of the
    * result by the ≥-start semantics.) */
  def intervalQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val err = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .select(
        col("event_id").as("error_id"), col("user_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("win_end"))
    intervalJoin(ev, err,
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "ts", rightStart = "win_start", rightEnd = "win_end",
        rightPayload = Seq("error_id"),
        granuleSeconds = 30L * 60)
      .select(
        col("event_id"),
        col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("error_id"))
  }

  /** Left-outer twin of [[intervalQuery]]: every event appears; events in
    * no error window carry a null error_id. */
  def intervalLeftQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val err = Tables.load(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .select(
        col("event_id").as("error_id"), col("user_id"),
        col("ts").as("win_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("win_end"))
    intervalJoinLeft(ev, err,
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "ts", rightStart = "win_start", rightEnd = "win_end",
        rightPayload = Seq("error_id"),
        granuleSeconds = 30L * 60)
      .select(
        col("event_id"),
        col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("error_id"))
  }
}
