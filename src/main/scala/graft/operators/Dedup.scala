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
  /** (doc_id, bucket) rows from a (doc_id, shingles) frame — one row per
    * band; bucket key = hash of the band's minhash slice. Only
    * (doc_id, bucket) travels through downstream joins — the shingle
    * arrays would otherwise be duplicated `bands`× through the exchange. */
  private def bandBuckets(
      withSh: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    withSh
      .withColumn("sig",
        graft.functions.MinHashFunctions.minhash(col("shingles"), numHashes))
      .select(
        col("doc_id"),
        explode(array((0 until bands).map { b =>
          xxhash64(lit(b) +: (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)
        }: _*)).as("bucket"))
  }

  /** Public banding entry for index builders ([[IncrementalDedup]]): the
    * EXACT bucket keys [[minhashLsh]] collides on, from raw documents. */
  def lshBuckets(
      docs: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3): DataFrame =
    bandBuckets(
      docs.select(col("doc_id"), shingleHashes(col("text"), shingleN).as("shingles")),
      numHashes, bands)

  def minhashLsh(
      docs: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame =
    minhashLshFromShingles(
      docs.select(col("doc_id"), shingleHashes(col("text"), shingleN).as("shingles")),
      numHashes, bands, threshold, maxBucket)

  /** [[minhashLsh]] over PRE-COMPUTED sorted shingle-hash sets
    * (`doc_id`, `shingles`) — lets a caller that needs the same shingle
    * table for something else (the recall gate's exact-truth leg) pay
    * the tokenize/shingle/hash pass once and share one checkpoint
    * between both legs. */
  private[graft] def minhashLshFromShingles(
      withSh: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      maxBucket: Int = 1024): DataFrame = {
    require(maxBucket > 1, "maxBucket must exceed 1")

    val banded = bandBuckets(withSh, numHashes, bands)

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
    // checkpointed (round 18): three consumers below (both all-pairs
    // self-join sides + the star branch) each replayed the whole
    // minhash + bucket-shuffle + window subtree — plan-verified as
    // three sibling Generate+Exchange+Window copies; the banded table
    // is (doc, band)-sized, narrow, and the one artifact every
    // candidate path shares. The observe is applied AFTER the checkpoint
    // (round 19): placed before it, the checkpoint's own eager execution
    // consumed the metric and handed consumers a bare LogicalRDD, leaving
    // queryExecution.observedMetrics empty on the returned frame.
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("doc_id")).over(w))
      .localCheckpoint()
      .observe(s"lsh_skew_${skewMetricSeq.incrementAndGet()}",
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

  /**
   * Repeated-window detection — the window-granularity form of exact
   * substring dedup (the "memorized boilerplate" cut of training-data
   * cleaning): every n-token window shared by at least `minDocs`
   * documents, with the witness doc range. Consumers either drop the
   * span from all-but-one doc or treat high `n_docs` windows as
   * boilerplate to scrub everywhere.
   *
   * 100 TB shape: ONE explode+groupBy shuffle over 64-bit window hashes
   * (never window strings); the count/min/max aggregate combines
   * map-side, so a boilerplate window present in millions of docs is a
   * single hot key with partial aggregation, not a skew blowup.
   */
  def repeatedWindows(docs: DataFrame, n: Int, minDocs: Long = 2L): DataFrame =
    docs.select(col("doc_id"), explode(shingleHashes(col("text"), n)).as("w"))
      .groupBy("w")
      .agg(
        count(lit(1)).as("n_docs"), // per-doc windows are distinct ⇒ doc count
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_docs") >= minDocs)

  /**
   * Per-document n-gram novelty: the fraction of a document's DISTINCT
   * n-gram windows that appear in no other document — the graded,
   * per-document complement of [[repeatedWindows]]'s corpus-wide pair
   * report, and the curation signal "how much of this doc is original"
   * (boilerplate-heavy docs score near 0 even when no single pair
   * crosses a near-dup threshold). Emitted in micro-units (the engine's
   * tie-rule-free quantization) so the double division is hash-safe.
   *
   * Shape: one explode into a window→doc-count aggregation (map-side
   * combined), joined back to the per-doc windows — cost ∝ corpus
   * windows, fanout bounded by docs-per-window, no all-pairs anything.
   */
  def novelty(docs: DataFrame, n: Int = 4): DataFrame = {
    val win = docs.select(col("doc_id"), explode(shingleHashes(col("text"), n)).as("w"))
    val counts = win.groupBy("w").agg(count(lit(1)).as("_nd"))
    win.join(counts, Seq("w"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_windows"),
        sum(when(col("_nd") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_windows"), col("n_unique"),
        floor((col("n_unique").cast("double") / col("n_windows").cast("double"))
          * lit(1000000.0) + lit(0.5)).as("novelty_micro"))
  }

  /**
   * Memorization-risk scan: per SOURCE, the fraction of positional
   * n-token grams that are CORPUS-UNIQUE (occur exactly once anywhere).
   * Long unique sequences are the memorizable surface of a training
   * set (the complement of the Lee-et-al repeated-substring signal):
   * a post-dedup corpus should be high-uniqueness, and a source whose
   * uniqueness sags below its peers is carrying residual boilerplate
   * the pairwise dedup tier missed.
   *
   * 100 TB shape — deliberately JOIN-FREE (contrast [[novelty]]'s
   * per-doc join): a corpus-unique gram has exactly one owner, so
   * `min(source)` inside the per-gram count aggregation IS the owning
   * source when the count is 1. Two aggregations — per-source totals
   * (map-side combined, |sources| keys) and per-gram (count, min
   * source) filtered to count==1 then regrouped — and a |sources|-row
   * join of the two summaries. No corpus-sized join back.
   *
   * Grams hash through the 48-bit md5 prefix the oracle replays
   * digit-by-digit; a hash collision merges the same two grams in both
   * engines. Whole-doc fallback for sub-n-token texts (the corpus-wide
   * shingle convention).
   */
  def rareGramStats(docs: DataFrame, n: Int = 8): DataFrame = {
    // gram strings from the codegen'd kernel (round 19,
    // graft.functions.TokenNgrams) — same space-joined strings as the
    // interpreted transform+slice+concat_ws form (DedupSpec pins it), so
    // the md5 hashes identical bytes and the oracle's digit-by-digit
    // replay (and its collision behavior) is untouched
    val grams = docs
      .select(col("source"), tokens(col("text")).as("_tk"))
      .select(col("source"),
        explode(graft.functions.MinHashFunctions.token_ngrams(col("_tk"), n))
          .as("_g"))
      .select(col("source"),
        conv(substring(md5(col("_g")), 1, 12), 16, 10).cast("long").as("_h"))
    val totals = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
    // the per-gram aggregate carries the owning source as a FIXED-WIDTH
    // sid (round 18): `min(source)` over a StringType buffer is not
    // HashAggregate-eligible, so the former form sorted the ENTIRE gram
    // stream into a SortAggregate cascade (plan-verified: Sort + Exchange
    // + Sort + SortAggregate). min(xxhash64(source)) keeps the whole pass
    // in hash aggregation; for the `_c = 1` groups this query keeps, the
    // group holds exactly one row, so ANY aggregate of sid is the owner's.
    // The tiny distinct (source, sid) dimension maps back — broadcast,
    // |sources| rows; a 64-bit sid collision between two sources is the
    // same 2⁻⁶⁴-class event the gram hash already accepts.
    val dim = docs.select(col("source")).distinct()
      .select(col("source"), xxhash64(col("source")).as("_sid"))
    val uniq = grams.select(xxhash64(col("source")).as("_sid"), col("_h"))
      .groupBy("_h")
      .agg(count(lit(1)).as("_c"), min(col("_sid")).as("_sid"))
      .filter(col("_c") === 1)
      .groupBy("_sid").agg(count(lit(1)).as("n_unique"))
      .join(broadcast(dim), Seq("_sid"))
      .select(col("source"), col("n_unique"))
    totals.join(uniq, Seq("source"), "left")
      .na.fill(0L, Seq("n_unique"))
      .select(col("source"), col("n_grams"), col("n_unique"),
        floor(col("n_unique").cast("double") / col("n_grams").cast("double")
          * lit(1000000.0) + lit(0.5)).cast("bigint").as("uniq_frac_micro"))
  }

  /** Query-pack adapter: 8-gram memorization scan over the corpus. */
  def rareGramsQuery(spark: SparkSession, sfDir: String): DataFrame =
    rareGramStats(graft.sources.Tables.load(spark, sfDir, "documents"))

  /**
   * Exact substring-span REMOVAL — the action step on top of
   * [[repeatedWindows]]'s detection (the "dedup the substrings, not the
   * documents" cut of training-data cleaning, per Lee et al. 2021,
   * "Deduplicating Training Data Makes Language Models Better"): every
   * n-token window that occurs in at least `minDocs` distinct documents
   * is treated as boilerplate, all token positions covered by any such
   * window are excised from every document, and the cleaned text is
   * re-emitted (token-normalized: single-space joined, original case).
   * Documents shorter than n tokens have no windows and pass through
   * unchanged.
   *
   * Duplicate detection hashes LOWERCASED windows (consistent with the
   * rest of the dedup family); reconstruction keeps original-case tokens.
   *
   * 100 TB shape: window occurrences shuffle ONCE on their 64-bit hash
   * (map-side combined count of distinct docs per window — a boilerplate
   * window in millions of docs is one hot key with partial aggregation);
   * covered starts ride a second hash join back and collapse to one
   * per-doc array bounded by doc length. Reconstruction is entirely
   * array-side higher-order expressions — no UDFs, no token-level
   * shuffle of the corpus text.
   */
  def removeRepeatedSpans(docs: DataFrame, n: Int = 4, minDocs: Long = 2L): DataFrame = {
    require(n >= 1 && minDocs >= 2)
    val base = tokenizedDocs(docs)
    val wins = windowOccurrences(base, n)

    // Windows present in >= minDocs distinct docs. Per-doc distinct first,
    // so the count aggregate is a doc count (same trick repeatedWindows
    // documents), both steps map-side combined on the same hash key.
    val dupW = wins.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("w")

    exciseWindowStarts(base, wins.join(dupW, "w"), n)
  }

  /** Tokenized view shared by the span/substring removers: original-case
    * tokens for reconstruction, lowercased tokens for detection. */
  private def tokenizedDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      split(col("text"), "\\s+").as("tk"),
      split(lower(col("text")), "\\s+").as("lt"))

  /** Every n-token window OCCURRENCE with its 0-based start position
    * (unlike shingleHashes, occurrences are not per-doc deduplicated — a
    * window repeated inside one doc covers both sites once it's flagged).
    *
    * Window identity is a TWO-LEVEL hash (round 18): each token is
    * xxhash64'd once, each window hashes its n token hashes — replacing
    * the former per-window `concat_ws + xxhash64(string)`, which built
    * and hashed a fresh ~n·tokenlen string PER POSITION (the dominant
    * compute of the span/suffix queries; guide §1.2 "per-task work").
    * Grouping semantics are unchanged: tokens contain no whitespace, so
    * the space-joined string was injective on token tuples — both forms
    * equate exactly the equal n-token windows, modulo the same 64-bit
    * collision odds. The hash never leaves the plan (the oracle replays
    * STRING grams), so the value change is invisible to every consumer. */
  private def windowOccurrences(base: DataFrame, n: Int): DataFrame =
    // codegen'd kernel since round 19 (graft.functions.WindowHashes): the
    // per-token transform + per-window n-way xxhash64 fold ran as
    // interpreted HOF lambdas; the kernel emits BIT-IDENTICAL hashes
    // (DedupSpec pins equality against windowOccurrencesReference)
    base.select(col("doc_id"),
      posexplode(graft.functions.MinHashFunctions.window_hashes(col("lt"), n))
        .as(Seq("pos", "w")))

  /** Pre-round-19 HOF form — the kernel's equivalence REFERENCE only. */
  private[graft] def windowOccurrencesReference(base: DataFrame, n: Int): DataFrame =
    base.select(col("doc_id"),
        transform(col("lt"), t => xxhash64(t)).as("_th"))
      .select(col("doc_id"),
        posexplode(
          when(size(col("_th")) >= n,
            transform(sequence(lit(0), size(col("_th")) - n),
              i => xxhash64((0 until n).map(j =>
                element_at(col("_th"), i + j + 1)): _*)))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "w")))

  /** Spec seam: the tokenized view the window forms share. */
  private[graft] def tokenizedDocsForTest(docs: DataFrame): DataFrame =
    tokenizedDocs(docs)

  /** Spec seam: kernel-backed window occurrences. */
  private[graft] def windowOccurrencesForTest(base: DataFrame, n: Int): DataFrame =
    windowOccurrences(base, n)

  /** Excision + reconstruction tail shared by the span/substring removers:
    * collapse flagged window starts to one sorted per-doc array, excise
    * positions `p..p+n-1` for every start, re-join the surviving tokens.
    * Entirely array-side higher-order expressions — no UDFs, no
    * token-level shuffle of the corpus text. */
  private def exciseWindowStarts(
      base: DataFrame, flagged: DataFrame, n: Int): DataFrame = {
    val starts = flagged.groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    val covered = when(col("starts").isNull, array().cast("array<int>"))
      .otherwise(array_distinct(flatten(
        transform(col("starts"), p => sequence(p, p + n - 1)))).cast("array<int>"))
    base.join(starts, Seq("doc_id"), "left")
      .withColumn("_cov", covered)
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(col("_cov")).cast("long").as("n_removed"),
        concat_ws(" ",
          transform(
            filter(sequence(lit(0), size(col("tk")) - 1),
              i => !array_contains(col("_cov"), i.cast("int"))),
            i => element_at(col("tk"), i + 1))).as("cleaned_text"))
  }

  /**
   * ALL-length exact substring dedup with keep-first semantics — the
   * suffix-array pass of Lee et al. 2021 ("Deduplicating Training Data
   * Makes Language Models Better") re-expressed as distributed anchor
   * grouping. Postcondition: no k-token substring occurs more than once
   * in the cleaned corpus (up to excision-glue adjacencies, the same
   * artifact the suffix-array form has), and the globally FIRST
   * occurrence of each repeat survives.
   *
   * Why no suffix array is needed for this semantics: a position lies
   * inside some repeated substring of length >= k iff it lies inside a
   * repeated k-token window (any >= k repeat contains its k-windows at
   * every occurrence; a repeated k-window IS a >= k repeat), so k-gram
   * anchor coverage is EXACT, not an approximation — the suffix array in
   * the paper is a single-machine efficiency device, not a semantic one.
   * What [[removeRepeatedSpans]] (the fixed-n window form) genuinely
   * lacks and this adds:
   *   - keep-one: the canonical (min (doc_id, pos)) occurrence of every
   *     repeated window survives — boilerplate keeps exactly one copy
   *     instead of being destroyed everywhere;
   *   - within-document repeats count: detection is by occurrence count,
   *     not distinct-doc count, so a phrase pasted twice in ONE doc is
   *     deduplicated (the window form misses it entirely).
   * Overlapping distinct repeats can still nibble a canonical copy whose
   * neighbours are other repeats' non-canonical sites — removal is
   * conservative, the postcondition always holds.
   *
   * 100 TB shape: identical to the span form — one shuffle of window
   * occurrences on their 64-bit anchor hash (count + min-struct both
   * map-side combined; a boilerplate window in millions of docs is one
   * hot key with partial aggregation), one hash join back, one per-doc
   * collapse bounded by doc length. The canonical site needs no global
   * sort: min of a (doc_id, pos) struct is an ordinary aggregate.
   */
  def removeRepeatedSubstrings(docs: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1)
    val base = tokenizedDocs(docs)
    val occ = windowOccurrences(base, k)
    // repeated anchors with their canonical (first) occurrence
    val dup = occ.groupBy("w")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("cnt") >= 2)
      .select(col("w"), col("canon"))
    // every NON-canonical occurrence of a repeated anchor is excised
    val bad = occ.join(dup, "w")
      .filter(col("doc_id") =!= col("canon.doc_id") ||
        col("pos") =!= col("canon.pos"))
    exciseWindowStarts(base, bad, k)
  }

  /** Query-pack adapter: scrub 4-token boilerplate windows shared by >= 2
    * docs from the documents table. */
  def spanDedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    removeRepeatedSpans(Tables.load(spark, sfDir, "documents"), n = 4)

  /** Query-pack adapter: keep-first exact substring dedup at k=4 over the
    * documents table. */
  def suffixDedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    removeRepeatedSubstrings(Tables.load(spark, sfDir, "documents"), k = 4)

  /**
   * Driver-verified dedup recall gate (the AnnRecall pattern for the
   * near-dup tier): exact ground-truth pairs at the threshold vs the
   * LSH pipeline's verified pairs, as one (n_truth, n_found_true,
   * recall_micro, within_floor) row. Every found pair is exact-verified
   * ≥ threshold, so found ⊆ truth and recall is the single quality
   * number; the pair-level correctness oracles (q_minhash_pairs,
   * q_ngram_jaccard, q_dup_clusters) all assume FULL recall on the
   * fixtures — this row pins that assumption where a regression flips a
   * driver hash instead of silently corrupting three oracles.
   *
   * The truth side is quadratic BY DEFINITION of ground truth, so the
   * gate runs on a FIXED-SIZE deterministic panel — the first
   * `sampleDocs` documents in md5 order (a TakeOrdered, never a full
   * sort) — so the audit costs the same at any corpus size. A
   * fraction-based sample would grow the pair count as frac²·n²
   * (measured: 94x slope across a 10x corpus before this was a panel);
   * a fixed panel is also the statistically honest audit — recall is a
   * per-pair property, and the panel's pair sample estimates it with a
   * corpus-size-independent error bar.
   */
  def dedupRecall(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      sampleDocs: Int = 1500,
      floorMicro: Long = 900000L,
      salt: String = "graft-dr"): DataFrame = {
    val m = md5(concat(col("doc_id").cast("string"), lit(salt)).cast("binary"))
    val sampled = docs.withColumn("_m", m)
      .orderBy(col("_m").asc, col("doc_id").asc).limit(sampleDocs)
      .drop("_m")
    // ONE shingle table shared by the truth and found legs, checkpointed:
    // without it the panel TakeOrdered AND the tokenize/shingle/hash pass
    // re-ran once per reference (truth a, truth b, banding, both verify
    // sides — 5×), which made this audit the slowest constant on the
    // board; the pair passes below re-read ~1500 local rows instead
    val withSh = sampled.select(col("doc_id"),
      shingleHashes(col("text"), shingleN).as("shingles"))
      .localCheckpoint()
    // Truth pass, two cuts that keep the COUNT provably identical:
    //  - the TakeOrdered panel is ONE partition, which serialized the
    //    O(panel²) merge scans on a single core — repartition the probe
    //    side so the pair loop uses the whole machine;
    //  - J = |∩|/|∪| ≤ min(|a|,|b|)/max(|a|,|b|), so a size-ratio bound
    //    IN THE JOIN CONDITION prunes most pairs before the merge scan
    //    ever runs (1 micro-unit of slack absorbs the double product's
    //    ulp so an exactly-at-threshold pair can never be dropped).
    val sh = withSh.select(col("doc_id"), col("shingles"),
      size(col("shingles")).cast("long").as("_sz"))
    val parts = docs.sparkSession.sparkContext.defaultParallelism
    val truth = sh.repartition(parts).alias("a")
      .join(broadcast(sh.alias("b")),
        col("a.doc_id") < col("b.doc_id") &&
          least(col("a._sz"), col("b._sz")) * lit(1000000.0) >=
            greatest(col("a._sz"), col("b._sz")) * lit(threshold * 1000000.0)
              - lit(1.0))
      .select(jaccard(col("a.shingles"), col("b.shingles")).as("j"))
      .filter(col("j") >= threshold)
      .agg(count(lit(1)).as("n_truth"))
    val found = minhashLshFromShingles(withSh, threshold = threshold)
      .agg(count(lit(1)).as("n_found_true"))
    // an empty truth set (possible on tiny samples) is vacuous full recall
    val recall = when(col("n_truth") === 0, lit(1000000L))
      .otherwise(expr("n_found_true * 1000000 div n_truth"))
    truth.crossJoin(found).select(
      col("n_truth"), col("n_found_true"),
      recall.as("recall_micro"),
      (recall >= lit(floorMicro)).as("within_floor"))
  }

  /** Query-pack adapter: recall audit over the fixed 1500-doc md5 panel
    * (the whole corpus below that size). */
  def dedupRecallQuery(spark: SparkSession, sfDir: String): DataFrame =
    dedupRecall(Tables.load(spark, sfDir, "documents"))

  /** SimHash fingerprints: doc_id → 64-bit fingerprint. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      SimHashFunctions.simhash64(tokens(col("text"))).as("simhash"))

  /**
   * SimHash near-dup pairs: split the 64-bit fingerprint into four 16-bit
   * bands — any pair within Hamming distance 3 shares at least one exact
   * band (pigeonhole) — then verify with bit_count(xor).
   *
   * Same bucket-skew guard as [[minhashLsh]]: a (band, key) bucket over
   * `maxBucket` — mass-identical documents, the shape crawled corpora
   * actually have, collapse into the same four band keys — switches from
   * the all-pairs self-join to STAR pairing against the bucket's min
   * doc_id: O(size) candidates instead of O(size²). The fingerprint rides
   * the window (one long), so star candidates Hamming-verify without a
   * re-join; star-routed rows surface in the `simhash_skew` observe
   * metric — the dropped-intra-cluster-edges audit.
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1024): DataFrame =
    simhashPairsFromFp(simhash(docs), maxHamming, maxBucket)

  /** [[simhashPairs]] over PRE-COMPUTED fingerprints — lets a caller that
    * also needs the banding for something else (the Verify-time oracle
    * precondition) pay the tokenize/fingerprint pass once. */
  private[graft] def simhashPairsFromFp(fp: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 1024): DataFrame = {
    require(maxBucket > 1, "maxBucket must exceed 1")
    val banded = fp.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        // single window/shuffle key: band in the high bits, 16-bit band
        // value in the low bits
        (shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)) +
          lit(b.toLong << 16)).as(s"_b$b")
      }: _*)).as("bucket"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket")
    val sized = banded
      .withColumn("bsz", count(lit(1)).over(w))
      // min (doc_id, simhash) carries the star center's fingerprint along,
      // so the star path verifies from the window output alone
      .withColumn("bmin", min(struct(col("doc_id"), col("simhash"))).over(w))
      .observe(s"simhash_skew_${skewMetricSeq.incrementAndGet()}",
        count(when(col("bsz") > maxBucket, 1)).as("star_routed_rows"))

    val small = sized.filter(col("bsz") <= maxBucket)
    val smallPairs = small.alias("a")
      .join(small.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
    val starPairs = sized
      .filter(col("bsz") > maxBucket && col("doc_id") =!= col("bmin.doc_id"))
      .select(
        col("bmin.doc_id").as("doc_a"), col("doc_id").as("doc_b"),
        expr("bit_count(bmin.simhash ^ simhash)").as("hamming"))

    smallPairs.unionByName(starPairs)
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
   *
   * Same bucket-skew guard as [[minhashLsh]]: a bucket over `maxBucket`
   * (mass-identical embeddings — exactly the shape a crawled corpus has)
   * switches from the all-pairs self-join to STAR pairing against the
   * bucket's min vec_id, O(size) candidates instead of O(size²). Star-routed
   * rows are counted in the `embed_skew` observe metric. Each vector lands
   * in exactly ONE bucket (unlike minhash's bands), so small-path and
   * star-path pair sets are disjoint — no distinct needed.
   */
  /** (vec_id, embedding, bucket) under `planes` signed-projection bits —
    * shared by [[embeddingNearDup]] and the occupancy-scaling spec. */
  private[graft] def embedBuckets(
      embeddings: DataFrame, planes: Int, seed: Long): DataFrame = {
    val hyperplanes: Seq[Seq[Float]] = Similarity.hyperplanes(planes, 64, seed)
    val bucketBits = hyperplanes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dot_product(col("embedding"), typedlit(p)) >= 0, 1L << i)
        .otherwise(0L)
    }.reduce(_ + _)
    embeddings.select(col("vec_id"), col("embedding"), bucketBits.as("bucket"))
  }

  def embeddingNearDup(
      embeddings: DataFrame,
      planes: Int = 12,
      seed: Long = 42L,
      threshold: Double = 0.95,
      maxBucket: Int = 1024): DataFrame = {
    require(maxBucket > 1, "maxBucket must exceed 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("bucket")
    val bucketed = embedBuckets(embeddings, planes, seed)
      .withColumn("bsz", count(lit(1)).over(w))
      .withColumn("bmin", min(col("vec_id")).over(w))
      .observe(s"embed_skew_${skewMetricSeq.incrementAndGet()}",
        count(when(col("bsz") > maxBucket, 1)).as("star_routed_rows"))

    val small = bucketed.filter(col("bsz") <= maxBucket)
      .select(col("vec_id"), col("embedding"), col("bucket"))
    val a = small.alias("a")
    val b = small.alias("b")
    val smallPairs = a
      .join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        // quantized (9 decimals) before the threshold filter so the edge
        // set — and everything built on it — is ulp-robust cross-engine
        round(VectorFunctions.cosine_sim(col("a.embedding"), col("b.embedding")), 9)
          .as("cosine"))

    // Star path re-joins the embeddings for the cosine verify (the window
    // carries only ids); every emitted edge is still scored exactly.
    val starPairs = bucketed
      .filter(col("bsz") > maxBucket && col("vec_id") =!= col("bmin"))
      .select(col("bmin").as("vec_a"), col("vec_id").as("vec_b"))
    val embA = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val embB = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    val starScored = starPairs.join(embA, "vec_a").join(embB, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(VectorFunctions.cosine_sim(col("emb_a"), col("emb_b")), 9)
          .as("cosine"))

    smallPairs.unionByName(starScored).filter(col("cosine") >= threshold)
  }

  /** Hyperplane count sized to the corpus: targets `targetBucket` expected
    * vectors per bucket (planes = ⌈log₂(n / targetBucket)⌉, clamped to
    * [4, 24]) so bucket population stays roughly constant as the corpus
    * scales — the fixed-`planes` failure mode is 16 buckets over 10⁹
    * vectors. One count() job; at 100 TB feed a known corpus size. */
  def planesFor(n: Long, targetBucket: Int = 256): Int =
    math.min(24, math.max(4,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt))

  /** [[embeddingNearDup]] with the hyperplane count sized from the corpus
    * via [[planesFor]] — the production entry point, so a 10⁹-vector run
    * can't end up hashing into 16 buckets. Costs one count() job; at
    * 100 TB pass the catalog-known size via `knownCount` instead. */
  def embeddingNearDupAuto(
      embeddings: DataFrame,
      targetBucket: Int = 256,
      seed: Long = 42L,
      threshold: Double = 0.95,
      maxBucket: Int = 1024,
      knownCount: Option[Long] = None): DataFrame = {
    val p = planesFor(knownCount.getOrElse(embeddings.count()), targetBucket)
    lastAutoPlanes.set(p)
    embeddingNearDup(embeddings, planes = p, seed = seed,
      threshold = threshold, maxBucket = maxBucket)
  }

  private val lastAutoPlanes = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Planes chosen by the last auto-sized run — lets SparkEntry emit the
    * bucket oracle with the SAME hyperplanes (Verify runs queries first,
    * then collects oracleSql — the cachedModel contract). */
  def cachedAutoPlanes: Option[Int] = {
    val v = lastAutoPlanes.get()
    if (v > 0) Some(v) else None
  }

  /**
   * Connected components over an undirected edge list via alternating
   * LARGE-STAR / SMALL-STAR rounds (Kiveris et al., "Connected Components
   * in MapReduce and Beyond", SoCC'14) — the web-scale CC algorithm:
   * rounds are bounded O(log² n) regardless of component DIAMETER (min-label
   * propagation needs diameter rounds, fatal on a long duplicate chain),
   * and each round is two groupBy+join passes over (node, node) pairs only.
   *
   *  - large-star(u): every neighbor v > u re-points to min(Γ(u) ∪ {u})
   *  - small-star(u): orient edges high→low; every low neighbor and u
   *    itself re-point to the minimum low neighbor
   *
   * At the fixpoint the edge set IS the answer: one (member, componentMin)
   * star edge per non-root member.
   *
   * Driver-loop hygiene (each was a measured defect in the naive loop):
   *  - `localCheckpoint(eager)` every round truncates lineage — otherwise
   *    Catalyst re-analyzes a plan that grows per round (single-JVM; on a
   *    real cluster use `checkpoint` to reliable storage instead);
   *  - convergence = (count, xxhash64 checksum) of the canonical edge set,
   *    computed in ONE tiny job over the just-checkpointed blocks — no
   *    separate full-recompute probe per round. Star rounds only ever
   *    shrink-or-repoint edges, so an unchanged (count, checksum) pair is
   *    the fixpoint.
   *
   * @param edges two-column DataFrame of undirected edges (src, dst names
   *              arbitrary); self-loops ignored
   * @return (node, component) rows, component = min node id in the component
   */
  def connectedComponents(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val Seq(sc, dc) = edges.columns.toSeq.map(col)
    val canonical0 = edges
      .select(least(sc, dc).as("src"), greatest(sc, dc).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    // large-star: symmetrize, m = min over each neighborhood incl. self,
    // re-point strictly larger neighbors at m.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(least(min(col("dst")), col("src")).as("m"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // small-star: orient high→low, re-point every low neighbor AND the
    // high node itself at the minimum low neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = dir.groupBy("src").agg(min(col("dst")).as("m"))
      val lows = dir.join(mins, "src")
        .select(col("dst").as("node"), col("m"))
      val highs = mins.select(col("src").as("node"), col("m"))
      lows.unionByName(highs)
        .filter(col("node") =!= col("m"))
        .select(greatest(col("node"), col("m")).as("src"),
          least(col("node"), col("m")).as("dst"))
        .distinct()
    }

    // Convergence probe piggybacks on the round's ONE materialization job:
    // the (count, order-free checksum) ride as `observe` metrics on the
    // eager localCheckpoint — the accumulators fill while the checkpoint
    // job runs, so no separate agg+collect job per round.
    def checkpointWithChecksum(e: DataFrame): (DataFrame, Long, java.math.BigDecimal) = {
      val obs = e.observe("cc_round",
        count(lit(1)).as("cnt"),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("sum"))
      val cp = obs.localCheckpoint(true)
      val row = obs.queryExecution.observedMetrics("cc_round")
      (cp, row.getLong(0), row.getDecimal(1))
    }

    var (cur, prevCnt, prevSum) = checkpointWithChecksum(canonical0)
    var converged = prevCnt == 0
    var i = 0
    while (!converged && i < maxIters) {
      val (next, cnt, sm) = checkpointWithChecksum(smallStar(largeStar(cur)))
      converged = cnt == prevCnt && sm.compareTo(prevSum) == 0
      prevCnt = cnt; prevSum = sm
      cur = next
      i += 1
    }
    lastCcRounds.set(i)
    // nodes that survive only as roots (never a src at the fixpoint) label
    // themselves; everyone else reads the star edge.
    val nodes = canonical0
      .select(col("src").as("node"))
      .unionByName(canonical0.select(col("dst").as("node")))
      .distinct()
    val out = nodes
      .join(cur.select(col("src").as("node"), col("dst").as("component")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
    out
  }

  /** Star rounds the last [[connectedComponents]] run took — lets the spec
    * assert the one-job-per-round contract via the status tracker. */
  private[graft] val lastCcRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Observed-metric names must be unique within ONE query plan — two LSH
    * runs unioned into a single plan (the incremental two-batch replay)
    * would collide on a fixed name, so each bucketing pass gets a fresh
    * suffix. Nothing reads the skew audit by name; it surfaces in the UI /
    * listener stream either way. */
  private val skewMetricSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /**
   * Near-dup CLUSTER assignment — connected components over the verified
   * near-dup edges, cluster id = least doc id in the component. This is the
   * step a training pipeline actually consumes ("keep one doc per duplicate
   * cluster"); pairwise edges alone under-delete transitive duplicates
   * (a~b, b~c but a≁c must still collapse to ONE survivor).
   * CC itself is [[connectedComponents]] (large-star/small-star).
   */
  def nearDupClusters(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxIters: Int = 30): DataFrame = {
    val pairs = minhashLsh(docs, shingleN = shingleN, threshold = threshold)
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs, maxIters)
      .select(col("node").as("doc_id"), col("component").as("cluster_id"))
  }

  /**
   * Semantic duplicate clusters (the SemDeDup shape): connected components
   * over the verified embedding near-dup edges, cluster id = least vec id.
   * What an embedding-dedup pipeline consumes — "keep one representative
   * per semantic cluster"; pairwise edges alone under-delete transitive
   * near-dups. Composes [[embeddingNearDupAuto]] (corpus-sized buckets,
   * star guard) with [[connectedComponents]] (bounded star rounds), so
   * both halves keep their 100 TB shapes.
   */
  def embeddingClusters(
      embeddings: DataFrame,
      targetBucket: Int = 256,
      threshold: Double = 0.95,
      maxIters: Int = 30): DataFrame = {
    val pairs = embeddingNearDupAuto(embeddings, targetBucket = targetBucket,
        threshold = threshold)
      .select(col("vec_a"), col("vec_b"))
    connectedComponents(pairs, maxIters)
      .select(col("node").as("vec_id"), col("component").as("cluster_id"))
  }

  /**
   * Cross-source overlap report — the corpus-curation question "how much
   * of source A is also in source B" answered two ways in one pass:
   *
   *  1. EXACT: Jaccard over each source's distinct shingle-hash set,
   *     emitted in micro-units (`floor(x·10⁶ + 0.5)` as BIGINT — the
   *     engine's tie-rule-free quantization). Pairs with an empty
   *     intersection are not emitted (the join is the intersection).
   *  2. ESTIMATED: a per-source MinHash signature of the UNION of the
   *     source's documents' shingle sets — elementwise min across docs of
   *     the per-doc minhash IS the union's minhash, because every lane
   *     applies the same permutation — compared lane-wise per pair. The
   *     estimate is checked against the exact value (`mh_within_bound`);
   *     with k=128 lanes Hoeffding puts P(|est − J| > 0.25) under 3e-7
   *     per pair, so a false red is effectively impossible while a
   *     broken signature pipeline (wrong lanes, wrong union) trips it
   *     deterministically.
   *
   * Scale shape: the exact side dedups `(source, gram)` FIRST (cost ∝
   * distinct grams, one hash aggregation) and joins on the gram hash —
   * per-gram fanout is bounded by the number of sources containing it,
   * never by document count. The signature side is k longs of state per
   * source (one map-side-combining aggregation); at 100 TB the exact side
   * is the verification scaffolding and the signature side is the
   * production report — one corpus scan, k·S state, no pair join over
   * data.
   */
  def sourceOverlap(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 128,
      bound: Double = 0.25): DataFrame = {
    // the distinct (source, gram) table is consumed THREE times (sizes +
    // both self-join sides) — checkpoint it once (round 18) so the
    // corpus explode+distinct runs once, not three times; this is the
    // verification-scaffolding side, so the materialization is bounded
    // by the distinct-gram count the exact report needs anyway
    val grams = docs.select(col("source"),
        explode(shingleHashes(col("text"), shingleN)).as("g"))
      .distinct()
      .localCheckpoint()
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = grams.toDF("source_a", "g")
      .join(grams.toDF("source_b", "g"), Seq("g"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_inter"))
    val withSizes = inter
      .join(broadcast(sizes.toDF("source_a", "_na")), Seq("source_a"))
      .join(broadcast(sizes.toDF("source_b", "_nb")), Seq("source_b"))
      .withColumn("n_union", col("_na") + col("_nb") - col("n_inter"))
    val sig = sourceSignatures(docs, shingleN, numHashes)
    val exactJ = col("n_inter").cast("double") / col("n_union").cast("double")
    withSizes
      .join(broadcast(sig.toDF("source_a", "_siga")), Seq("source_a"))
      .join(broadcast(sig.toDF("source_b", "_sigb")), Seq("source_b"))
      .withColumn("_est",
        aggregate(
          zip_with(col("_siga"), col("_sigb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
      .select(
        col("source_a"), col("source_b"), col("n_inter"), col("n_union"),
        floor(exactJ * lit(1000000.0) + lit(0.5)).as("jaccard_micro"),
        (abs(col("_est") - exactJ) <= lit(bound)).as("mh_within_bound"))
  }

  /** Per-source MinHash signature of the UNION of the source's documents'
    * shingle sets (elementwise min across docs of the per-doc minhash IS
    * the union's minhash — every lane applies the same permutation). One
    * map-side-combining aggregation, k longs of state per source. */
  private def sourceSignatures(docs: DataFrame, shingleN: Int,
      numHashes: Int): DataFrame = {
    val perDoc = docs.select(col("source"),
      graft.functions.MinHashFunctions.minhash(
        shingleHashes(col("text"), shingleN), numHashes).as("_mh"))
    val laneMins = (0 until numHashes).map(i =>
      min(element_at(col("_mh"), i + 1)).as(s"_m$i"))
    perDoc.groupBy("source")
      .agg(laneMins.head, laneMins.tail: _*)
      .select(col("source"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("_sig"))
  }

  /**
   * Signature-only overlap report — [[sourceOverlap]] without the exact
   * gram-pair join, for HIGH source cardinality: the exact side's
   * per-gram pair fanout is Σ k² over sources-per-gram, fine at tens of
   * sources but quadratic in the worst case at thousands; this path's
   * cost is one corpus scan (the signature aggregation) plus an S²
   * broadcast join over k-long signatures — no gram ever pairs with
   * another. `est_jaccard_micro` = matching lanes / k in micro-units
   * (exact integer arithmetic over the lane count, so the quantization
   * carries no float tie). With k = 128 lanes the estimate's standard
   * error is ≤ 1/√k ≈ 0.088 — a corpus-curation signal, not a measure.
   */
  def sourceOverlapEstimate(docs: DataFrame, shingleN: Int = 3,
      numHashes: Int = 128): DataFrame = {
    val sig = sourceSignatures(docs, shingleN, numHashes)
    sig.toDF("source_a", "_siga")
      .join(broadcast(sig.toDF("source_b", "_sigb")),
        col("source_a") < col("source_b"))
      .select(
        col("source_a"), col("source_b"),
        aggregate(
          zip_with(col("_siga"), col("_sigb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("_lanes"))
      .select(col("source_a"), col("source_b"),
        col("_lanes").as("n_lanes_equal"),
        expr(s"n_lanes_equal * 1000000 div $numHashes")
          .as("est_jaccard_micro"))
  }

  /** Mode selector: the exact+checked report while the source count is
    * small enough for the gram-pair join ([[sourceOverlap]]), the
    * signature-only estimate beyond it ([[sourceOverlapEstimate]]). The
    * source count is one cheap distinct-aggregate; the threshold bounds
    * the exact side's worst-case pair fanout (≤ maxExactSources² per
    * gram). Schemas differ by mode — exact rows carry (n_inter, n_union,
    * jaccard_micro, mh_within_bound), estimate rows carry
    * (n_lanes_equal, est_jaccard_micro) — because pretending an estimate
    * is an exact count invites silent misuse. */
  def sourceOverlapAuto(docs: DataFrame, shingleN: Int = 3,
      numHashes: Int = 128, bound: Double = 0.25,
      maxExactSources: Int = 64): DataFrame = {
    val nSources = docs.select(col("source")).distinct().count()
    if (nSources <= maxExactSources)
      sourceOverlap(docs, shingleN, numHashes, bound)
    else sourceOverlapEstimate(docs, shingleN, numHashes)
  }

  // Query-pack adapters --------------------------------------------------

  def exactQuery(spark: SparkSession, sfDir: String): DataFrame =
    exact(Tables.load(spark, sfDir, "documents"))

  def sourceOverlapQuery(spark: SparkSession, sfDir: String): DataFrame =
    sourceOverlap(Tables.load(spark, sfDir, "documents"))

  def noveltyQuery(spark: SparkSession, sfDir: String): DataFrame =
    novelty(Tables.load(spark, sfDir, "documents"))

  def minhashQuery(spark: SparkSession, sfDir: String): DataFrame =
    minhashLsh(Tables.load(spark, sfDir, "documents"))

  /** Largest (band, key) bucket the simhash banding would form over
    * `docs` — the quantity [[simhashPairs]]'s star guard keys on.
    * 0 on an empty corpus (no buckets → the precondition holds
    * trivially, not an opaque NPE on the NULL max). */
  private[graft] def simhashMaxBucket(docs: DataFrame): Long =
    simhashMaxBucketFromFp(simhash(docs))

  private[graft] def simhashMaxBucketFromFp(fp: DataFrame): Long =
    fp.select(explode(array((0 until 4).map { b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)) +
          lit(b.toLong << 16)
      }: _*)).as("bucket"))
      .groupBy("bucket").count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)

  /** ORACLE PRECONDITION, asserted rather than assumed: the DuckDB twin
    * of q_simhash_pairs replays the banding ALL-PAIRS, which matches the
    * engine only while no (band, key) bucket trips [[simhashPairs]]' star
    * guard. Verify fixtures stay far under the threshold today; if a
    * future fixture crosses it, fail HERE with a diagnostic instead of
    * shipping the driver a silent hash mismatch. */
  private[graft] def assertSimhashOraclePrecondition(docs: DataFrame,
      maxBucket: Int = 1024): Unit =
    assertSimhashOraclePreconditionFromFp(simhash(docs), maxBucket)

  private[graft] def assertSimhashOraclePreconditionFromFp(fp: DataFrame,
      maxBucket: Int = 1024): Unit = {
    val maxB = simhashMaxBucketFromFp(fp)
    require(maxB <= maxBucket,
      s"q_simhash_pairs oracle precondition violated: largest simhash " +
        s"(band, key) bucket has $maxB docs > maxBucket=$maxBucket, so the " +
        s"engine would star-route while the all-pairs oracle would not — " +
        s"mirror the star guard in the oracle SQL or shrink the fixture")
  }

  def simhashQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    // precondition checked only when an oracle comparison is actually in
    // play (graft.Verify sets the flag): bench/production corpora — where
    // the star guard fires BY DESIGN on mass-identical ScaleUp docs —
    // skip the extra pass, since no oracle compares their output. The
    // FINGERPRINTS are localCheckpointed under the flag so the tokenize/
    // fingerprint pass is paid once across the check and the pairs query,
    // not twice (checkpointing the raw docs would not dedupe it — the
    // expensive expression lives downstream of them).
    if (graft.Verify.oraclePreconditionsEnabled) {
      val fp = simhash(docs).localCheckpoint()
      assertSimhashOraclePreconditionFromFp(fp)
      simhashPairsFromFp(fp)
    } else simhashPairs(docs)
  }

  def ngramJaccardQuery(spark: SparkSession, sfDir: String): DataFrame =
    ngramJaccard(Tables.load(spark, sfDir, "documents"))

  def clustersQuery(spark: SparkSession, sfDir: String): DataFrame =
    docClustersCached(spark, sfDir)

  /** Per-source near-dup ATTRIBUTION — the curation diagnostic "which
    * sources feed the duplicate clusters, and how much would each lose"
    * under the keep-the-min-id survivor rule: per source, total docs,
    * cluster members, docs the dedup would drop, and the drop rate in
    * micro-units. The cluster table is dup-member-sized (broadcast side);
    * the corpus aggregates by source with map-side combine — the join
    * never shuffles the corpus. */
  def dedupBySourceQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val clusters = docClustersCached(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    docs.select(col("doc_id"), col("source"))
      .join(broadcast(clusters), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("cluster_id")).as("n_dup_members"),
        count(when(col("cluster_id").isNotNull &&
          col("cluster_id") =!= col("doc_id"), 1)).as("n_dropped"))
      .withColumn("drop_rate_micro",
        expr("n_dropped * 1000000 div n_docs"))
  }

  /** Query adapter: repeated 4-token windows across the corpus. The window
    * id is the engine's 64-bit hash (not SQL-reproducible as a value), so
    * the oracle compares the (n_docs, min_doc, max_doc) multiset. */
  def repeatedWindowsQuery(spark: SparkSession, sfDir: String): DataFrame =
    repeatedWindows(Tables.load(spark, sfDir, "documents"), n = 4)
      .select("n_docs", "min_doc", "max_doc")

  /** The synthetic embeddings have no true near-dups (max pairwise cosine
    * ≈ 0.48 at sf0.001), so the query-pack entry runs the same pipeline at a
    * looser radius — the mechanics (bucketing, verify, threshold) are
    * identical to a production 0.95 run. Planes are corpus-sized via
    * [[embeddingNearDupAuto]]; the oracle replays the same count. */
  def embeddingNearDupQuery(spark: SparkSession, sfDir: String): DataFrame =
    embeddingNearDupAuto(Tables.load(spark, sfDir, "embeddings"),
      threshold = 0.1)

  /** Cluster assignments memoized per (corpus, params) — cluster once,
    * consume many. The CC output is eagerly `localCheckpoint`ed so every
    * consumer (the cluster query itself, SemDeDup's representative pass)
    * reads materialized blocks instead of re-running the star rounds —
    * the same build-once contract as the IVF/PQ model caches and the
    * cell-store `buildOnce`: in production the assignment is a persisted
    * artifact the dedup pass joins against, not a per-query recompute. */
  /**
   * Quality-aware survivor selection — the KEEP/DROP decision a fuzzy-dedup
   * pipeline actually executes: one survivor per near-dup cluster, chosen
   * as the highest-quality member (ties broken by least doc id); documents
   * in no cluster survive as their own singleton. Composes
   * [[nearDupClusters]] (LSH + bounded-star CC) with the corpus quality
   * score, so "keep the best copy, not an arbitrary one" costs one extra
   * cluster-keyed window over the cluster assignment — never a second
   * pass over the text.
   *
   * Quality is quantized to micro units (the engine's tie-rule-free
   * convention) before ranking, so an oracle recomputing the same score
   * can never disagree on the argmax.
   */
  def clusterSurvivors(
      docs: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = nearDupClusters(docs, shingleN = shingleN, threshold = threshold)
    val scored = docs.select(col("doc_id"),
      floor(TextAnalysis.qualityColumn(col("text")) * lit(1000000.0) + lit(0.5))
        .cast("bigint").as("quality_micro"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_micro").desc, col("doc_id").asc)
    scored.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "quality_micro", "keep")
  }

  /** Query-pack adapter: survivor decision over the documents corpus at
    * the q_dup_clusters parameters, consuming the memoized cluster
    * assignment (see [[docClustersCached]]). */
  def clusterSurvivorsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    val clusters = docClustersCached(spark, sfDir)
    val scored = docs.select(col("doc_id"),
      floor(TextAnalysis.qualityColumn(col("text")) * lit(1000000.0) + lit(0.5))
        .cast("bigint").as("quality_micro"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_micro").desc, col("doc_id").asc)
    scored.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("keep", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "quality_micro", "keep")
  }

  /** Documents-corpus cluster assignment memoized per (JVM, corpus dir) —
    * the [[embeddingClustersCached]] contract applied to the text side:
    * in production the LSH+CC assignment is a persisted artifact that
    * every consumer (the cluster report, survivor selection, the
    * cluster-aware split) joins against, not a per-query recompute. The
    * checkpoint blocks die with their context, so entries revalidate. */
  private val docClusterCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def docClustersCached(spark: SparkSession, sfDir: String): DataFrame = {
    val k = s"$sfDir#docclusters"
    val cached = docClusterCache.get(k)
    if (cached != null && !cached.sparkSession.sparkContext.isStopped) cached
    else {
      val fresh = nearDupClusters(Tables.load(spark, sfDir, "documents"))
        .localCheckpoint(true)
      docClusterCache.put(k, fresh)
      fresh
    }
  }

  private val clusterCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def embeddingClustersCached(
      embeddings: DataFrame, key: String, targetBucket: Int,
      threshold: Double): DataFrame = {
    val k = s"$key#b=$targetBucket#t=$threshold"
    val cached = clusterCache.get(k)
    // checkpoint blocks die with their context — revalidate, don't trust
    if (cached != null && !cached.sparkSession.sparkContext.isStopped) cached
    else {
      val fresh = embeddingClusters(embeddings, targetBucket = targetBucket,
        threshold = threshold).localCheckpoint(true)
      clusterCache.put(k, fresh)
      fresh
    }
  }

  /** Same loose-radius regime as [[embeddingNearDupQuery]] (the synthetic
    * embeddings have no 0.95-cosine pairs); cluster mechanics identical to
    * a production run. */
  def embeddingClustersQuery(spark: SparkSession, sfDir: String): DataFrame =
    embeddingClustersCached(Tables.load(spark, sfDir, "embeddings"),
      key = sfDir, targetBucket = 256, threshold = 0.1)
}
