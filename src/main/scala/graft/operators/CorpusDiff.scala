package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff — "what changed between dataset version N and
 * N+1", the review artifact a curation team reads before promoting a
 * snapshot: per source, how many documents were added, removed, or
 * had their content change, and the token delta each class carries.
 * Paired with [[DatasetExport]]'s manifest this closes the dataset
 * release loop: export → diff against the previous release → promote.
 *
 * Mechanics: one full-outer join on doc_id comparing content digests
 * (xxhash64 of the text — the [[DatasetExport]] digest), classified
 * into added / removed / changed / unchanged, then a per-source
 * aggregation. At 100 TB the join is the cost and it shuffles once on
 * doc_id; the digests make the change test an 8-byte comparison, so
 * text ships only as far as its hash. With both snapshots exported as
 * doc-id-bucketed stores the join is co-located and exchange-free (the
 * `q_store_diff` path); this operator is the portable parquet form.
 */
object CorpusDiff {

  /** Per-source diff summary between two document frames (doc_id, text,
    * source). Output: one row per (source, change_class) with doc and
    * token counts — `added`/`changed` measure the new side's tokens,
    * `removed` the old side's. */
  def diff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def keyed(df: DataFrame, side: String) = df.select(
      col("doc_id"),
      col("source").as(s"${side}_source"),
      xxhash64(col("text")).as(s"${side}_hash"),
      size(TextAnalysis.whitespaceTokens(col("text"))).cast("long")
        .as(s"${side}_tokens"))
    keyed(oldDocs, "old").join(keyed(newDocs, "new"), Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("new_source"), col("old_source")).as("source"),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("change_class"),
        coalesce(col("new_tokens"), col("old_tokens")).as("tokens"))
      .groupBy("source", "change_class")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
  }

  /** Query-pack adapter: the "new" snapshot is synthesized from the
    * fixture deterministically — every %13 doc dropped, every %7 doc's
    * text edited (a marker prepended), every doc with id%11==0 re-added
    * under a shifted id (an addition) — so the oracle replays the same
    * synthesis and the diff classes are all exercised at any sf. */
  def diffQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val old = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val kept = old.filter(pmod(col("doc_id"), lit(13)) =!= 0)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit("EDIT "), col("text"))).otherwise(col("text")))
    val added = old.filter(pmod(col("doc_id"), lit(11)) === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        col("text"), col("source"))
    diff(old, kept.unionByName(added))
  }
}
