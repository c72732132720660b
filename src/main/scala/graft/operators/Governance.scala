package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-governance operators: subject-deletion ("right to be forgotten")
 * as an auditable pipeline step. The purge itself is one broadcast
 * anti-join (deletion lists are small against a 100 TB fact side — the
 * list broadcasts, the corpus never shuffles); the AUDIT is the part a
 * compliance review actually needs: how many rows were in scope, how
 * many were removed, and a recomputed proof that none remain.
 */
object Governance {

  /**
   * Purge `facts` rows whose `factKey` appears in `subjects.subjectKey`,
   * returning (purged frame, one-row audit frame): n_before, n_purged,
   * n_after, and none_left — a RECOMPUTED semi-join count against the
   * purged output being zero, not an assumption from the arithmetic.
   */
  def purgeWithAudit(facts: DataFrame, subjects: DataFrame,
      factKey: String, subjectKey: String): (DataFrame, DataFrame) = {
    val keys = subjects.select(col(subjectKey).as("_pk")).distinct()
    val purged = facts.join(broadcast(keys),
      col(factKey) === col("_pk"), "left_anti")
    val before = facts.agg(count(lit(1)).as("n_before"))
    val after = purged.agg(count(lit(1)).as("n_after"))
    val leftover = purged.join(broadcast(keys),
        col(factKey) === col("_pk"), "left_semi")
      .agg(count(lit(1)).as("_leftover"))
    val audit = before.crossJoin(after).crossJoin(leftover)
      .select(col("n_before"),
        (col("n_before") - col("n_after")).as("n_purged"),
        col("n_after"),
        (col("_leftover") === 0L).as("none_left"))
    (purged, audit)
  }

  /** Query-pack adapter: purge orders of every 97th customer (the
    * synthetic deletion-request list) and emit the audit row. */
  def purgeAuditQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val requests = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey") % 97 === 0)
    purgeWithAudit(orders, requests, "o_custkey", "c_custkey")._2
  }
}
