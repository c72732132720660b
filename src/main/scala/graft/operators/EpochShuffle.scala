package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic epoch reshuffling — the training-order problem at
 * 100 TB: every epoch must visit the corpus in a different
 * pseudo-random order, the order must be reproducible from a seed (job
 * restarts, audits), and NOTHING may globally sort or materialize a
 * permutation table per epoch. The classic answer is an algebraic
 * permutation: for a prime p greater than every document id,
 *
 *   key_e(doc) = (a_e * doc_id + b_e) mod p
 *
 * is a bijection on [0, p) for any a_e ≠ 0, so ordering by `key_e` IS a
 * shuffled total order; different epochs use different (a_e, b_e)
 * drawn from a seeded LCG. Properties production cares about:
 *
 *  - O(1) metadata per epoch (two integers), no permutation table;
 *  - narrow and zero-shuffle to COMPUTE (ordering is done by whatever
 *    consumes the key — range-partitioned writes, per-shard sorts);
 *  - algebraically invertible: doc = (key − b_e) · a_e⁻¹ mod p, so a
 *    resume-from-position needs arithmetic, not a lookup join;
 *  - p = 2⁶¹ − 1 admits ids to 2.3e18, so a_e · doc_id exceeds 64 bits;
 *    [[shuffleKey]] therefore carries the affine products in
 *    DECIMAL(38,0) (the oracle mirrors with HUGEINT) — exact either
 *    way, which is what makes the order bit-reproducible.
 *
 * Complements [[CorpusPipeline]]'s hash shard assignment (`md5` order
 * within static shards): this one varies per epoch and inverts.
 */
object EpochShuffle {

  /** 2⁶¹ − 1 (Mersenne prime): id headroom to 2.3e18 documents. The
    * affine products exceed 64 bits, so [[shuffleKey]] computes them in
    * DECIMAL(38,0) (exact, ≤ ~2e37 ≪ 10³⁸) and the oracle mirrors with
    * HUGEINT — bit-identical keys either way. */
  val P = 2305843009213693951L

  /** Seeded per-epoch multiplier/offset: iterates the Lehmer/Park–Miller
    * multiplier 48271 (public standard) over the field mod P in BigInt;
    * a_e is forced nonzero so the map stays a bijection. */
  def epochParams(seed: Long, epoch: Int): (Long, Long) = {
    val p = BigInt(P)
    var s = BigInt(java.lang.Math.floorMod(seed, P))
    if (s == 0) s = BigInt(1)
    // two LCG draws per epoch: first is a, second is b
    def next(x: BigInt): BigInt = (x * 48271) % p
    var x = s
    (0 until 2 * epoch).foreach(_ => x = next(x))
    val a = { val v = next(x); if (v == 0) BigInt(1) else v }
    val b = next(next(x))
    (a.toLong, b.toLong)
  }

  /** The shuffle key column for one epoch's parameters. */
  def shuffleKey(docId: Column, a: Long, b: Long): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    pmod(docId.cast(dec) * lit(a).cast(dec) + lit(b).cast(dec),
      lit(P).cast(dec)).cast("long")
  }

  /** (epoch, doc_id, shuffle_key) for `epochs` epochs — one narrow
    * projection per epoch, unioned; no shuffle anywhere. */
  def epochOrders(docs: DataFrame, seed: Long, epochs: Int): DataFrame = {
    require(epochs > 0, "need at least one epoch")
    (0 until epochs).map { e =>
      val (a, b) = epochParams(seed, e)
      docs.select(lit(e.toLong).as("epoch"), col("doc_id"),
        shuffleKey(col("doc_id"), a, b).as("shuffle_key"))
    }.reduce(_ unionByName _)
  }

  /** Query-pack adapter: three epochs under the fixed audit seed. */
  def epochShuffleQuery(spark: SparkSession, sfDir: String): DataFrame =
    epochOrders(Tables.load(spark, sfDir, "documents")
      .select(col("doc_id")), seed = 20260815L, epochs = 3)
}
