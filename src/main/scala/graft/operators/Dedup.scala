package graft.operators

import graft.functions.SimHashFunctions
import graft.functions.VectorFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline, each designed for
 * the 100 TB shape of the problem:
 *
 *  - exact: one hash-groupBy — a single shuffle on a 16-byte digest.
 *  - MinHash+LSH: shingle → k-lane minhash → band buckets → self-join within
 *    bucket → exact-Jaccard verify. Only the (band, signature) buckets
 *    shuffle; candidate verification touches candidate pairs, never the
 *    O(n²) cross product.
 *  - SimHash: one 64-bit fingerprint per doc (custom codegen'd expression),
 *    near-dups via 16-bit band collision + Hamming verify.
 *  - n-gram Jaccard: exact verification path shared with MinHash.
 *  - embedding cosine: random-hyperplane LSH buckets + cosine verify.
 *
 * All hash lanes are seeded by lane index through `xxhash64(lit(lane), col)`
 * — deterministic across runs and partitions.
 */
object Dedup {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles, distinct. Falls back to the whole token string for
    * docs shorter than n tokens, so every doc has ≥1 shingle. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** Sorted distinct 64-bit hashes of the doc's word shingles — the working
    * representation for MinHash, LSH banding, and exact-overlap verification
    * (set ops on longs are far cheaper than on shingle strings). */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.MinHashFunctions.shingle_hashes(tokens(text), n)

  /** Exact dedup: digest-groupBy. Emits one row per distinct text with its
    * cardinality and canonical (min) doc id — the "keep list". */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))

  /** Exact Jaccard between two docs' sorted shingle-hash sets: the
    * intersection is a codegen'd merge scan (sorted_intersect_count), not a
    * per-row hash set — this is the verification hot loop. */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = graft.functions.MinHashFunctions.sorted_intersect_count(a, b)
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    when(uni === 0, 0.0).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /**
   * MinHash + LSH near-dup pairs.
   *
   * @param numHashes total minhash lanes (k)
   * @param bands     LSH bands; rows-per-band = k/bands. With k=64, bands=16
   *                  the collision threshold sits near J ≈ (1/16)^(1/4) ≈ 0.5
   * @param shingleN  word-shingle width
   * @param threshold exact-Jaccard cutoff applied to verified candidates
   * @param maxBucket bucket-skew guard: buckets above this size switch from
   *                  all-pairs to star pairing (see below)
   */
  def minhashLsh(
      docs: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(maxBucket > 1, "maxBucket must exceed 1")
    val rows = numHashes / bands

    val withSh = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("shingles"))

    // One (doc, bucket) row per band; bucket key = hash of the band's slice.
    // Only (doc_id, bucket) travels through the self-join — the shingle
    // arrays would otherwise be duplicated `bands`× through the exchange.
    val banded = withSh
      .withColumn("sig",
        graft.functions.MinHashFunctions.minhash(col("shingles"), numHashes))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          xxhash64(lit(b) +: (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)
        }: _*)).as("bucket"))

    // Bucket-skew guard. A degenerate bucket — mass-identical documents all
    // landing in one signature — would make the all-pairs self-join
    // quadratic IN THAT BUCKET (10⁶ identical docs ⇒ 5·10¹¹ candidates).
    // Buckets over `maxBucket` switch to STAR pairing: every member pairs
    // with the bucket's min doc id only, O(size) candidates. Such buckets
    // are duplicate clusters by construction, so cluster membership (what
    // dedup consumes) is preserved; only intra-cluster pairwise
    // completeness is traded, and verification still scores every emitted
    // edge exactly. The window rides the same bucket-key shuffle the join
    // needs anyway. The `lsh_skew` observe metric reports how many
    // (doc, bucket) rows took the star path — the "dropped candidates" audit.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket")
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("doc_id")).over(w))
      .observe("lsh_skew",
        count(when(col("bsz") > maxBucket, 1)).as("star_routed_rows"))

    val small = sized.filter(col("bsz") <= maxBucket)
    val smallPairs = small.alias("a")
      .join(small.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val starPairs = sized
      .filter(col("bsz") > maxBucket && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("doc_a"), col("doc_id").as("doc_b"))

    // Candidate pairs, de-duplicated BEFORE verification: a pair colliding
    // in m bands would otherwise pay the exact-Jaccard merge scan m times.
    val cand = smallPairs.unionByName(starPairs).distinct()

    // Verify each candidate once against the sorted shingle-hash sets.
    val shA = withSh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val shB = withSh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash fingerprints: doc_id → 64-bit fingerprint. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      SimHashFunctions.simhash64(tokens(col("text"))).as("simhash"))

  /**
   * SimHash near-dup pairs: split the 64-bit fingerprint into four 16-bit
   * bands — any pair within Hamming distance 3 shares at least one exact
   * band (pigeonhole) — then verify with bit_count(xor).
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs)
    val banded = fp.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*)).as("bk"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.bk.band") === col("b.bk.band") &&
        col("a.bk.key") === col("b.bk.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("doc_a", "doc_b")
      .agg(min(col("hamming")).as("hamming"))
  }

  /**
   * Exact n-gram Jaccard over LSH candidates: same candidate generation as
   * [[minhashLsh]] but reported with the exact score for every candidate —
   * the auditable version of the near-dup decision.
   */
  def ngramJaccard(docs: DataFrame, shingleN: Int = 3, threshold: Double = 0.3): DataFrame =
    // rows-per-band = 4 (not 2): with r=2 the band-collision probability at
    // J≈0.3 is ~95% on this corpus — the candidate set degenerates to
    // all-pairs and verification dominates. r=4 keeps recall at the
    // threshold while staying selective.
    minhashLsh(docs, numHashes = 64, bands = 16, shingleN = shingleN, threshold = threshold)

  /**
   * Embedding near-dup: random-hyperplane LSH (sign bits over `planes`
   * pseudo-random hyperplanes, derived deterministically from a seed) buckets
   * vectors; cosine verification inside buckets. Only buckets shuffle —
   * never the O(n²) pair space.
   */
  def embeddingNearDup(
      embeddings: DataFrame,
      planes: Int = 12,
      seed: Long = 42L,
      threshold: Double = 0.95): DataFrame = {
    val hyperplanes: Seq[Seq[Float]] = Similarity.hyperplanes(planes, 64, seed)

    val bucketBits = hyperplanes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dot_product(col("embedding"), typedlit(p)) >= 0, 1L << i)
        .otherwise(0L)
    }.reduce(_ + _)

    val bucketed = embeddings
      .select(col("vec_id"), col("embedding"), bucketBits.as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorFunctions.cosine_sim(col("a.embedding"), col("b.embedding")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * Near-dup CLUSTER assignment — connected components over the verified
   * near-dup edges, cluster id = least doc id in the component. This is the
   * step a training pipeline actually consumes ("keep one doc per duplicate
   * cluster"); pairwise edges alone under-delete transitive duplicates
   * (a~b, b~c but a≁c must still collapse to ONE survivor).
   *
   * Min-label propagation as DataFrame iterations: each round every node
   * takes the min label among itself and its neighbors — one equi-join +
   * one groupBy per round, converging in graph-diameter rounds (near-dup
   * components are shallow in practice; `maxIters` bounds pathology — at
   * web scale swap in large-star/small-star, same join-shaped rounds).
   * Only (node, label) pairs ever shuffle, never documents.
   */
  def nearDupClusters(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxIters: Int = 20): DataFrame = {
    val pairs = minhashLsh(docs, shingleN = shingleN, threshold = threshold)
      .select(col("doc_a"), col("doc_b"))
    val sym = pairs
      .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .cache()
    try {
      var labels = sym.select(col("doc_a").as("node")).distinct()
        .withColumn("label", col("node"))
        .cache()
      // Convergence signal: labels only ever DECREASE under min-propagation,
      // so the label sum strictly decreases until the fixpoint — one cheap
      // aggregate over the cached frame instead of a join-diff per round.
      // (Decimal sum: immune to long overflow at any node count.)
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("label").cast("decimal(38,0)"))).collect()(0)
          .getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = false
      var i = 0
      while (!converged && i < maxIters) {
        val viaNeighbors = sym
          .join(labels, sym("doc_a") === labels("node"))
          .select(sym("doc_b").as("node"), col("label"))
        val next = labels.select("node", "label").unionByName(viaNeighbors)
          .groupBy("node").agg(min("label").as("label"))
          .cache()
        val newSum = labelSum(next)
        labels.unpersist()
        labels = next
        converged = newSum.compareTo(prevSum) == 0
        prevSum = newSum
        i += 1
      }
      labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
    } finally sym.unpersist()
  }

  // Query-pack adapters --------------------------------------------------

  def exactQuery(spark: SparkSession, sfDir: String): DataFrame =
    exact(Tables.load(spark, sfDir, "documents"))

  def minhashQuery(spark: SparkSession, sfDir: String): DataFrame =
    minhashLsh(Tables.load(spark, sfDir, "documents"))

  def simhashQuery(spark: SparkSession, sfDir: String): DataFrame =
    simhashPairs(Tables.load(spark, sfDir, "documents"))

  def ngramJaccardQuery(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccard(Tables.load(spark, sfDir, "documents"))

  def clustersQuery(spark: SparkSession, sfDir: String): DataFrame =
    nearDupClusters(Tables.load(spark, sfDir, "documents"))

  /** The synthetic embeddings have no true near-dups (max pairwise cosine
    * ≈ 0.48 at sf0.001), so the query-pack entry runs the same pipeline at a
    * looser radius — the mechanics (bucketing, verify, threshold) are
    * identical to a production 0.95 run. */
  def embeddingNearDupQuery(spark: SparkSession, sfDir: String): DataFrame =
    embeddingNearDup(Tables.load(spark, sfDir, "embeddings"),
      planes = 4, threshold = 0.1)
}
