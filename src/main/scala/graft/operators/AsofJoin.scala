package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join — for each left row, the single right row with the same key
 * and the greatest `rightTime <= leftTime` (the "latest state at event
 * time" lookup: trade⨝quote, event⨝dimension-version). Spark has no
 * built-in; the naive formulation (`l JOIN r ON key AND r.t <= l.t` + a
 * window to keep the max) explodes into a range cross-product per key —
 * quadratic in versions per key.
 *
 * Scalable shape used here: tag both inputs, UNION them, and run ONE
 * running-`last` window over (key, time) — a single shuffle on the key and
 * a per-partition sort, the same cost as a sort-merge join, regardless of
 * how many right versions each left row skips over. Ordering inside a
 * timestamp tie: right rows sort before left rows (so an exactly-at-time
 * version matches), and among right rows the greatest `rightOrder` wins —
 * every tiebreak is explicit, so the result is deterministic.
 */
object AsofJoin {

  /**
   * @param rightPayload right columns to attach (null when no version is
   *                     at or before the left time — left-join semantics)
   * @param rightOrder   deterministic tiebreak among right rows that share
   *                     (key, time): the row with the greatest value wins
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightOrder: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // fail fast on silent-misbehavior inputs: a payload name already on the
    // left would produce ambiguous output columns, and the internal meta
    // names would clobber left columns of the same name
    val meta0 = Set("_k", "_t", "_side", "_ord", "_r", "_match")
    val payloadClash = rightPayload.toSet.intersect(leftCols.toSet)
    require(payloadClash.isEmpty,
      s"asof: rightPayload collides with left columns: ${payloadClash.mkString(", ")}")
    val metaClash = leftCols.toSet.intersect(meta0)
    require(metaClash.isEmpty,
      s"asof: left columns ${metaClash.mkString(", ")} are reserved meta names (${meta0.mkString(", ")})")
    val payloadType = StructType(rightPayload.map(right.schema(_)))
    val ordType = right.schema(rightOrder).dataType

    val lSide = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_ord", lit(null).cast(ordType))
      .withColumn("_r", lit(null).cast(payloadType))

    val rSide = leftCols.foldLeft(
        right.select(
          col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
          col(rightOrder).as("_ord"),
          struct(rightPayload.map(col): _*).as("_r"))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val meta = Seq("_k", "_t", "_side", "_ord", "_r")
    val all = lSide.select((leftCols ++ meta).map(col): _*)
      .unionByName(rSide.select((leftCols ++ meta).map(col): _*))

    // rights before lefts at equal time (_side 0 < 1); among equal-(k,t)
    // rights the greatest _ord sorts last so running-`last` picks it
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    all.withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(n => col(s"_match.$n").as(n)): _*)
  }

  // Query-pack adapter ---------------------------------------------------

  /** Each early event joined to its user's latest order at-or-before the
    * event time. Orders are first reduced to one version per
    * (customer, date) — greatest order key wins — so the as-of pick is
    * unique and the DuckDB `ASOF LEFT JOIN` oracle is deterministic. */
  def asofQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("event_id") < 2000L)
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(
        max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    asof(ev, ord,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightPayload = Seq("o_orderkey", "o_totalprice"),
        rightOrder = "o_orderkey")
      .select(
        col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000").as("ts_ms"),
        col("o_orderkey"), col("o_totalprice"))
  }
}
