package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities. Spark's partial aggregation already absorbs most
 * group-by skew, and AQE splits skewed join partitions at runtime — but two
 * cases still hot-spot a single reducer at 100 TB:
 *
 *  - `count(DISTINCT x)` / `collect_*` per key: the partial aggregate can't
 *    collapse the value set, so one giant key still lands on one task.
 *    [[saltedDistinctCount]] shards each key across `salt` sub-keys
 *    (deterministically, by hashing the VALUE — the same value always maps
 *    to the same shard, keeping per-shard distinctness exact) and then
 *    merges shard counts — exact answer, skew spread over `salt` tasks.
 *
 *  - joins against a known-skewed key set where AQE is unavailable:
 *    [[saltedJoin]] replicates the small side `salt`× and shards the big
 *    side, turning one hot partition into `salt` even ones.
 */
object Skew {

  /** Exact distinct count per key, sharded `salt` ways by value hash.
    * Phase 1 `(key, shard)` distinct-counts run in parallel; phase 2 sums
    * shard counts — correct because sharding by value partitions the value
    * space (no value is counted in two shards). */
  def saltedDistinctCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      salt: Int,
      resultName: String = "n_distinct"): DataFrame =
    df.select(col(keyCol), col(valueCol),
        pmod(xxhash64(col(valueCol)), lit(salt)).as("_shard"))
      .groupBy(col(keyCol), col("_shard"))
      .agg(countDistinct(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as(resultName))

  /** Broadcast-replicate the small side over `salt` shards and shard the
    * big side by row-content hash, so one hot join key spreads across
    * `salt` partitions. Equi-join on `keys` only; result is identical to
    * the plain inner join. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int): DataFrame = {
    val shardedBig = big.withColumn("_shard",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)))
    val replicatedSmall = small.withColumn("_shard",
      explode(sequence(lit(0L), lit(salt - 1L))))
    shardedBig.join(replicatedSmall, keys :+ "_shard")
      .drop("_shard")
  }

  /** Query-pack adapter: distinct event types per user, sharded 8 ways —
    * identical to a plain count(DISTINCT), which is exactly what the
    * DuckDB oracle computes. */
  def saltedDistinctQuery(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    saltedDistinctCount(
      graft.sources.Tables.load(spark, sfDir, "events"),
      keyCol = "user_id", valueCol = "event_type", salt = 8)
}
