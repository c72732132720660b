package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline: token counting,
 * quality scoring, language ID, and content fingerprinting. Everything is
 * built-in-expression based (whole-stage codegen, no UDFs), so each operator
 * is a narrow map over documents — embarrassingly parallel at 100 TB.
 */
object TextAnalysis {

  /** BPE-ish tokenization: letter runs, digit runs, single punctuation. */
  val TokenPattern = "[\\p{L}]+|[0-9]+|[^\\s\\p{L}0-9]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  def whitespaceTokens(text: Column): Column = split(text, "\\s+")

  /** Per-document surface statistics (all DuckDB-checkable built-ins).
    * Counts are cast to BIGINT to line up with DuckDB's `length()` type. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(split(col("text"), " ", -1)).cast("bigint").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[0-9]")).cast("bigint").as("n_digits"),
      regexp_count(col("text"), lit("[.,;:!?]")).cast("bigint").as("n_punct"),
      length(regexp_replace(col("text"), "\\s", "")).cast("bigint").as("n_nonspace_chars"))

  /** Token counting under both tokenizers, aggregated per language. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
        col("lang"),
        size(whitespaceTokens(col("text"))).as("ws"),
        size(bpeTokens(col("text"))).as("bpe"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).as("total_ws_tokens"),
        sum(col("bpe")).as("total_bpe_tokens"))

  /** Tiny per-language stopword inventories for the heuristic classifier. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "les", "des", "dans"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /**
   * Heuristic language ID: stopword-hit voting over whitespace tokens, with
   * a CJK-codepoint check for zh. Scores are deterministic; argmax with a
   * fixed language-order tiebreak.
   */
  def langId(docs: DataFrame): DataFrame = {
    val toks = array_distinct(whitespaceTokens(lower(col("text"))))
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val base = size(array_intersect(toks, typedlit(words)))
      val score = if (lang == "zh")
        base + regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")).cast("int")
      else base
      struct(score.cast("int").as("score"), lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      // lexicographic lang tiebreak — array_sort gives no stability
      // guarantee, and equal scores (e.g. all-zero) must still resolve
      // deterministically
      element_at(array_sort(array(scores: _*),
        (a, b) => when(a("score") > b("score"), -1)
          .when(a("score") < b("score"), 1)
          .when(a("lang") < b("lang"), -1)
          .when(a("lang") > b("lang"), 1)
          .otherwise(0)), 1)("lang").as("predicted_lang"))
  }

  /**
   * Quality score in [0,1]: blend of length band, alpha ratio, punctuation
   * ratio, and mean token length — the usual cheap pre-filters in front of
   * expensive pipeline stages.
   */
  def qualityScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityColumn(col("text")).as("quality"))

  /** The quality blend as a plain column expression so pipelines can attach
    * it with `withColumn` (a narrow map) instead of a self-join. */
  def qualityColumn(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = size(whitespaceTokens(text)).cast("double")
    val alphaRatio = length(regexp_replace(text, "[^\\p{L} ]", "")).cast("double") /
      greatest(nChars, lit(1.0))
    val punctRatio = regexp_count(text, lit("[.,;:!?]")).cast("double") /
      greatest(nTokens, lit(1.0))
    val meanTokenLen = nChars / greatest(nTokens, lit(1.0))
    val lengthBand = when(nChars.between(100, 2000), 1.0)
      .when(nChars.between(20, 5000), 0.5).otherwise(0.0)
    val tokenBand = when(meanTokenLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    round(
      (lengthBand * 0.35 + least(alphaRatio * 1.2, lit(1.0)) * 0.35 +
        tokenBand * 0.2 + least(punctRatio * 4, lit(1.0)) * 0.1), 6)
  }

  /**
   * Document fingerprint: content digest + min-k shingle sketch (the
   * winnowing-style stable fingerprint: the k smallest shingle hashes,
   * sorted — robust to small edits, unlike the exact digest).
   * `shingle_hashes` returns sorted-ascending hashes, so the min-k sketch
   * is just its k-prefix — no per-lane hashing, no extra sort.
   */
  def fingerprint(docs: DataFrame, k: Int = 8): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text")).as("content_hash"),
      slice(Dedup.shingleHashes(col("text"), 3), 1, k).as("mink_sketch"))

  /** Vocabulary statistics per language: exact distinct-token counts (one
    * shuffle on (lang, token) with partial aggregation) next to the
    * HLL-sketch approximation that replaces the exact pass at 100 TB. */
  def vocab(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        explode(whitespaceTokens(lower(col("text")))).as("tok"))
      .groupBy("lang")
      .agg(
        countDistinct(col("tok")).as("n_distinct_tokens"),
        count(lit(1)).as("n_tokens"))

  /** Email address shape (kept RE2-and-Java-compatible so engine and
    * oracle agree on matches). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad shape. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /**
   * PII scrub — replace email addresses and IPv4 literals with typed
   * placeholder tags. A narrow, codegen'd projection (two regexp passes);
   * extend the pattern list per policy. The redaction-count column makes
   * the scrub auditable without diffing text.
   */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  def redactPii(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      redact(col("text")).as("text"),
      (regexp_count(col("text"), lit(EmailPattern)) +
        regexp_count(col("text"), lit(Ipv4Pattern))).cast("bigint").as("n_redactions"))

  /**
   * Corpus n-gram LM fluency score — the CCNet-style statistical quality
   * signal (Wenzek et al., LREC'20 score documents with an n-gram LM;
   * gibberish and mangled extractions land in the tail): train a bigram
   * model ON the corpus itself, then score each document by its average
   * add-one-smoothed bigram probability
   *
   *   p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V)
   *
   * (avg-probability rather than perplexity keeps the whole computation
   * in rational arithmetic — every per-bigram term is one IEEE division,
   * bit-identical across engines, where exp/ln would not be; the ranking
   * it induces is the same monotone fluency signal).
   *
   * 100 TB shape: the MODEL IS A TABLE, never driver state — and it is a
   * MATERIALIZED table: bigram counts are one map-side-combined
   * aggregation over the corpus, localCheckpointed (they are the model
   * artifact — |distinct bigrams| rows, corpus-independent size), and
   * prefix counts roll up from the checkpoint. Without the checkpoint the
   * explode+zip_with subtree appeared under bigramCounts, under
   * prefixCounts, AND under the scoring join — three corpus passes for
   * one model; now the corpus is exploded once for the model and once
   * (streaming, no materialization) for scoring. Hot bigrams ("of the")
   * are skewed join keys; AQE skew-join splits them. Nothing is
   * collected; V is the only scalar and rides a 1-row broadcast cross
   * join (its unigram-distinct pass stays on the corpus by definition —
   * V counts ALL tokens, including single-token documents that produce
   * no bigram).
   */
  def ngramLmScore(docs: DataFrame): DataFrame = {
    val tk = whitespaceTokens(lower(col("text")))
    val bi = docs.select(col("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(
        zip_with(slice(col("tk"), lit(1), size(col("tk")) - 1),
          slice(col("tk"), lit(2), size(col("tk")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val bigramCounts = bi.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    // rolls up from the CHECKPOINTED bigram table (Σ_w2 c12 = c1) — the
    // input is |distinct bigrams| rows, not a second corpus explode
    val prefixCounts = bigramCounts.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(tk).as("t")).agg(
      countDistinct(col("t")).as("v"))
    bi.join(bigramCounts, Seq("w1", "w2"))
      .join(prefixCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        ((col("c12") + lit(1.0)) / (col("c1") + col("v"))).as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_bigrams"),
        round(avg(col("p")), 6).as("avg_prob"))
  }

  /**
   * RAG / context-window chunking: split each document into overlapping
   * token windows (`window` tokens long, `stride` tokens apart) — the
   * standard retrieval-corpus and packing preprocessor. A document of n
   * tokens yields `1` chunk when n ≤ window, else `ceil((n−window)/stride)+1`
   * — the last chunk may be short but no chunk start ever lands beyond the
   * text, so there are no degenerate fully-contained tail chunks.
   *
   * 100 TB shape: one narrow projection + posexplode per row — zero
   * shuffles, zero joins; output size is bounded by n/stride chunks per
   * document. The token array is materialized in its own projection before
   * the per-chunk slices reference it (interpreted-HOF re-evaluation trap —
   * see repetitionStats history).
   */
  def chunkDocuments(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    docs
      .select(col("doc_id"), whitespaceTokens(col("text")).as("_tk"))
      .select(col("doc_id"), col("_tk"),
        when(size(col("_tk")) <= window, lit(1))
          .otherwise(ceil((size(col("_tk")) - window).cast("double") / stride)
            .cast("int") + 1).as("_nc"))
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), col("_nc") - 1),
        i => slice(col("_tk"), i * stride + 1, lit(window)))))
      .select(col("doc_id"),
        col("pos").cast("bigint").as("chunk_idx"),
        size(col("col")).cast("bigint").as("n_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** 48-bit md5-prefix hash of a string column — small enough for exact
    * integer arithmetic in every engine (the fixed-point idiom the split /
    * shard / mixture samplers already use), wide enough that corpus-scale
    * gram collisions are negligible. */
  private def gramHash48(g: Column): Column =
    conv(substring(md5(g), 1, 12), 16, 10).cast("long")

  /**
   * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
   * Local Algorithms for Document Fingerprinting", SIGMOD'03, the MOSS
   * algorithm): hash every k-token gram positionally, slide a window of `w`
   * consecutive gram hashes, keep each window's minimum, emit the distinct
   * selected hashes per document. Guarantee: any shared token run of at
   * least w+k−1 tokens between two documents produces at least one shared
   * fingerprint — positional, unlike the min-k sketch in [[fingerprint]],
   * so matches can be localized.
   *
   * Docs shorter than k tokens hash as one whole-doc gram (the shingle
   * fallback used corpus-wide); gram sequences shorter than w collapse to a
   * single window.
   *
   * 100 TB shape: a narrow per-row fold — zero shuffles; the O(n·w)
   * window-min pass is bounded by document length. Both the gram-hash array
   * and the token array live in their own projections (HOF re-evaluation
   * trap).
   */
  def winnow(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    docs
      .select(col("doc_id"), whitespaceTokens(lower(col("text"))).as("_tk"))
      .select(col("doc_id"), col("_tk"),
        greatest(size(col("_tk")) - (k - 1), lit(1)).as("_ng"))
      .select(col("doc_id"), col("_ng"),
        transform(sequence(lit(0), col("_ng") - 1),
          i => gramHash48(array_join(slice(col("_tk"), i + 1, lit(k)), " "))).as("_h"))
      .select(col("doc_id"), col("_h"),
        greatest(col("_ng") - (w - 1), lit(1)).as("_nw"))
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(0), col("_nw") - 1),
          j => array_min(slice(col("_h"), j + 1, lit(w)))))).as("fp"))
  }

  /**
   * Corpus data card: per-(source, length-bucket) profile — document count,
   * mean length, total whitespace tokens. The first artifact a dataset
   * release needs and the cheapest corpus-drift monitor: one map-side-
   * combined groupBy over ~10·|sources| cells, independent of corpus size.
   */
  def corpusDataCard(docs: DataFrame, bucketChars: Int = 200,
      maxBucket: Int = 9): DataFrame =
    docs
      .select(col("source"),
        least(floor(col("n_chars") / lit(bucketChars)), lit(maxBucket))
          .cast("bigint").as("len_bucket"),
        col("n_chars"),
        size(whitespaceTokens(col("text"))).cast("bigint").as("_ws"))
      .groupBy("source", "len_bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        sum(col("_ws")).as("total_ws_tokens"))

  // Query-pack adapters --------------------------------------------------

  /** Query-pack adapter: 64-token chunks, 48-token stride (25% overlap). */
  def chunkQuery(spark: SparkSession, sfDir: String): DataFrame =
    chunkDocuments(Tables.load(spark, sfDir, "documents"))

  /** Query-pack adapter: 3-gram hashes, window 4 (detects shared runs ≥ 6
    * tokens). */
  def winnowQuery(spark: SparkSession, sfDir: String): DataFrame =
    winnow(Tables.load(spark, sfDir, "documents"))

  /** Query-pack adapter: per-source 200-char length-bucket profile. */
  def corpusStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    corpusDataCard(Tables.load(spark, sfDir, "documents"))

  /**
   * Length-bucketed batch shaping — the dataloader-side economics of the
   * corpus: docs bucket by the BIT LENGTH of their token count
   * (power-of-two length buckets, `length(bin(n))` — integer-exact in
   * both engines, no libm log2), and each bucket reports the padding
   * fraction a batcher pays when it pads to the bucket max — the number
   * dynamic-batching / sequence-packing decisions are made from. One
   * map-side-combined aggregation over ≤ ~40 bucket keys; byte-linear.
   */
  def lengthBuckets(docs: DataFrame): DataFrame = {
    val n = size(whitespaceTokens(col("text"))).cast("bigint")
    docs.select(length(bin(n)).cast("bigint").as("bucket"), n.as("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_frac_micro",
        expr("(n_docs * max_tokens - sum_tokens) * 1000000 div (n_docs * max_tokens)"))
  }

  /** Query-pack adapter: power-of-two length buckets with padding cost. */
  def lengthBucketsQuery(spark: SparkSession, sfDir: String): DataFrame =
    lengthBuckets(Tables.load(spark, sfDir, "documents"))

  def textStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    textStats(Tables.load(spark, sfDir, "documents"))

  def tokenCountsQuery(spark: SparkSession, sfDir: String): DataFrame =
    tokenCounts(Tables.load(spark, sfDir, "documents"))

  def langIdQuery(spark: SparkSession, sfDir: String): DataFrame =
    langId(Tables.load(spark, sfDir, "documents"))

  def qualityQuery(spark: SparkSession, sfDir: String): DataFrame =
    qualityScore(Tables.load(spark, sfDir, "documents"))

  /** Registered form serializes the sketch to a scalar — the driver's
    * pandas comparator can't hash ARRAY columns. The array form stays
    * available via [[fingerprint]] for in-engine use. */
  def fingerprintQuery(spark: SparkSession, sfDir: String): DataFrame =
    fingerprint(Tables.load(spark, sfDir, "documents"))
      .withColumn("mink_sketch",
        array_join(col("mink_sketch").cast("array<string>"), ","))

  def vocabQuery(spark: SparkSession, sfDir: String): DataFrame =
    vocab(Tables.load(spark, sfDir, "documents"))

  /** The fixture corpus is synthetic vocabulary with no real PII, so the
    * adapter plants one email and one IP per document (derived from the
    * doc id — deterministic, oracle-reproducible) and scrubs them. */
  /**
   * Gopher-style within-document repetition signals — the quality gate that
   * catches boilerplate/templated/looping text that plain length and
   * punctuation ratios miss:
   *
   *  - `n_windows` / `n_distinct` — total vs distinct n-token windows
   *    (short docs collapse to one whole-doc window, mirroring the shingle
   *    fallback);
   *  - `dup_frac` — fraction of window occurrences that repeat an earlier
   *    one (`1 - distinct/total`);
   *  - `top_frac` — share of the single most frequent window.
   *
   * 100 TB shape: everything is one per-row native expression — zero
   * shuffles, zero joins, inside whole-stage codegen; the per-doc O(d)
   * counting pass is bounded by document length, not corpus size.
   */
  /**
   * `(n_windows, n_distinct, top)` via the codegen'd
   * [[graft.functions.RepStats]] expression — one static call per row
   * inside whole-stage codegen, O(d) hash counting.
   *
   * History, because it keeps mattering: the naive HOF formulation
   * (`array_max(transform(array_distinct(w), x -> size(filter(w, y ->
   * y = x))))`) re-evaluated the inlined window builder per lambda
   * reference — O(d³), 215 s/pass at sf0.1. A one-pass interpreted
   * `aggregate` fold over `array_sort(w)` fixed the asymptotics (3.5 s)
   * but still paid interpreted-lambda + per-element struct costs; the
   * native expression retires that constant factor too.
   */
  private def repStatsStruct(n: Int): Column =
    graft.functions.RepStatsFunctions.rep_stats(col("text"), n)

  def repetitionStats(docs: DataFrame, n: Int = 2): DataFrame =
    docs.select(col("doc_id"), repStatsStruct(n).as("_s"))
      .select(
        col("doc_id"),
        col("_s.nw").as("n_windows"),
        col("_s.nd").as("n_distinct"),
        round(lit(1.0) - col("_s.nd").cast("double")
          / col("_s.nw").cast("double"), 6).as("dup_frac"),
        round(col("_s.top").cast("double")
          / col("_s.nw").cast("double"), 6).as("top_frac"))

  /** Repetition gate for the cleaning pipeline — a per-row filter over the
    * same one-pass stats struct: no join, no shuffle. */
  def filterRepetitive(
      docs: DataFrame,
      n: Int = 2,
      maxDupFrac: Double = 0.5,
      maxTopFrac: Double = 0.2): DataFrame = {
    val s = repStatsStruct(n)
    docs
      .withColumn("_rep", s)
      .filter(
        (lit(1.0) - col("_rep.nd").cast("double") / col("_rep.nw").cast("double"))
          <= maxDupFrac &&
        (col("_rep.top").cast("double") / col("_rep.nw").cast("double"))
          <= maxTopFrac)
      .drop("_rep")
  }

  /** Query-pack adapter: corpus-trained bigram LM over the fixture docs. */
  def lmScoreQuery(spark: SparkSession, sfDir: String): DataFrame =
    ngramLmScore(Tables.load(spark, sfDir, "documents"))

  /**
   * CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
   * High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
   * per language, rank documents by LM fluency and cut the ranking into
   * `nBuckets` equal tertiles — head/middle/tail is the standard
   * quality stratification a crawl pipeline feeds into sampling. The
   * fluency signal is [[ngramLmScore]]'s rational avg-probability (its
   * monotone ranking equals the perplexity ranking, with no libm call),
   * and ties break on doc_id so the assignment is deterministic.
   *
   * Exactness vs scale: exact tertiles are DEFINED by a per-language
   * rank — one shuffle on `lang` plus a per-language sort, CCNet's own
   * computation. When a language is corpus-sized, use
   * [[pplBucketsApprox]]: two narrow passes (per-language approximate
   * thresholds, then a broadcast-join comparison) that avoid the sort
   * at the cost of boundary wobble — PipelineSpec measures agreement.
   */
  def pplBuckets(docs: DataFrame, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang")
      .orderBy(col("avg_prob").desc, col("doc_id").asc)
    docs.select(col("doc_id"), col("lang"))
      .join(ngramLmScore(docs), Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        ntile(nBuckets).over(w).cast("bigint").as("ppl_bucket"))
  }

  /** The sort-free sibling: per-language bucket thresholds from
    * `approx_percentile` (one map-side-combined aggregation, |langs|
    * rows broadcast back), assignment by comparison — the 100 TB path
    * when exact tertile boundaries are not worth a per-language sort. */
  def pplBucketsApprox(docs: DataFrame, nBuckets: Int = 3): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(ngramLmScore(docs), Seq("doc_id"))
    val cuts = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val th = scored.groupBy("lang")
      .agg(percentile_approx(col("avg_prob"), lit(cuts.toArray),
        lit(10000)).as("_th"))
    // bucket 1 = most fluent (score above the highest threshold), so
    // thresholds compare descending: score >= th[k] → bucket ≤ n-1-k
    scored.join(broadcast(th), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (lit(nBuckets.toLong) - aggregate(col("_th"), lit(0L),
          (acc, t) => acc + when(col("avg_prob") >= t, 1L).otherwise(0L)))
          .as("ppl_bucket"))
  }

  /** Query-pack adapter: exact per-language head/middle/tail buckets. */
  def pplBucketsQuery(spark: SparkSession, sfDir: String): DataFrame =
    pplBuckets(Tables.load(spark, sfDir, "documents"))

  /** Query-pack adapter: bigram repetition over the fixture corpus. */
  def repStatsQuery(spark: SparkSession, sfDir: String): DataFrame =
    repetitionStats(Tables.load(spark, sfDir, "documents"), n = 2)

  /** Unicode normalization pass over the corpus (NFC + control strip +
    * whitespace collapse — `graft.functions.NormalizeText`): the
    * canonical first stage before any hashing/dedup, since NFC-unequal
    * encodings of the same text otherwise defeat every digest. */
  def normalizeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val n = graft.functions.NormalizeFunctions.normalize_text(col("text"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), n.as("norm_text"),
        length(n).cast("bigint").as("n_chars_norm"))
  }

  def redactQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          pmod(col("doc_id"), lit(256L)).cast("string"),
          lit(".7 today")).as("text"))
    redactPii(planted)
  }

  /**
   * fastText-style quality gate: hashed bag-of-words linear margin per
   * document ([[graft.functions.HashedLinearImpl]] — one codegen'd pass
   * per row, zero shuffle), keep = margin above the threshold. The stub
   * weights are a pure function of the bucket; a trained model drops in
   * without touching the plan.
   */
  def classifyQuality(docs: DataFrame, dim: Int = 4096,
      threshold: Double = 0.0): DataFrame =
    docs.withColumn("margin",
        graft.functions.HashedLinearFunctions.hlc_margin(col("text"), dim))
      .withColumn("keep", col("margin") > threshold)

  /** Query-pack adapter: margin + keep over the fixture corpus. */
  def qualityClassifierQuery(spark: SparkSession, sfDir: String): DataFrame =
    classifyQuality(Tables.load(spark, sfDir, "documents"))
      .select(col("doc_id"), col("margin"), col("keep"))
}
