package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming twin of `Dedup.exact` for a continuously-ingested corpus: keep
 * the first-seen document per content digest.
 *
 * `dropDuplicatesWithinWatermark` bounds the dedup state by the watermark
 * horizon — digests older than the lateness bound are evicted, so state is
 * O(arrival rate × horizon) instead of O(corpus) (plain `dropDuplicates`
 * on a stream retains every key forever). The trade-off is explicit: a
 * duplicate arriving later than the horizon is treated as new — the
 * horizon IS the dedup guarantee window, which is the right contract for
 * an append-only ingest pipeline (cross-horizon dedup belongs to the
 * batch compaction pass, `Dedup.exact`).
 */
object StreamDedup {

  /** One surviving row per text digest within the watermark horizon. */
  def exactDedupStream(docs: DataFrame, lateness: String = "1 hour"): DataFrame =
    docs.withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("text_hash")
}
