package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The composed training-data cleaning pipeline — the 100 TB use case the
 * individual operators exist for, chained end to end:
 *
 *   quality gate → language filter → exact dedup → MinHash near-dup removal
 *
 * Shuffle budget: ONE digest-groupBy for exact dedup and the LSH bucket
 * join for near-dups; the quality/language stages are narrow maps that
 * shrink the data before anything shuffles (the cheap-filters-first rule).
 * Survivor selection is deterministic (min doc_id per duplicate group),
 * and near-dup removal drops the higher id of each verified pair, so a
 * re-run over the same corpus produces byte-identical output.
 */
object CorpusPipeline {

  final case class Config(
      minQuality: Double = 0.5,
      keepLangs: Seq[String] = Seq("en", "es", "de", "fr", "zh"),
      nearDupThreshold: Double = 0.8,
      shingleN: Int = 3,
      // optional repetition gate (Gopher-style); None = off, preserving the
      // established pipeline output
      maxDupFrac: Option[Double] = None,
      maxTopFrac: Option[Double] = None,
      repetitionN: Int = 2,
      decontamN: Int = 13)

  /** Stage 1+2(+2b): narrow pre-filters (quality gate, language allowlist,
    * optional repetition gate) — single maps over the scan, no join: every
    * gate folds into the scan's filter. */
  def preFilter(docs: DataFrame, cfg: Config): DataFrame = {
    val base = docs.withColumn("quality", TextAnalysis.qualityColumn(col("text")))
      .filter(col("quality") >= cfg.minQuality)
      .filter(col("lang").isin(cfg.keepLangs: _*))
    if (cfg.maxDupFrac.isEmpty && cfg.maxTopFrac.isEmpty) base
    else TextAnalysis.filterRepetitive(base, cfg.repetitionN,
      cfg.maxDupFrac.getOrElse(1.0), cfg.maxTopFrac.getOrElse(1.0))
  }

  /** Stage 3: exact dedup — keep the min doc_id per identical text. One
    * shuffle (window min over the digest), no join-back: at 100 TB the
    * agg+join formulation would shuffle the corpus twice and build a keep
    * list the size of the corpus. */
  def exactDedup(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.withColumn("_keep",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("_keep"))
      .drop("_keep")
  }

  /** Stage 4: near-dup removal — drop the higher id of each verified pair. */
  def nearDedup(docs: DataFrame, cfg: Config): DataFrame = {
    val drop = Dedup.minhashLsh(docs,
        shingleN = cfg.shingleN, threshold = cfg.nearDupThreshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** The full pipeline.
    *
    * `materialize = true` inserts a stage boundary after the gated+exact-
    * deduped corpus: [[nearDedup]] consumes its input TWICE (the LSH
    * band self-join and the anti-join back), so the declarative form
    * recomputes the gate subtree per consumer — fine for the optimizer's
    * view and the oracle, wasteful as an operational shape at 100 TB,
    * where checkpoint-between-stages is how these pipelines actually run
    * (resume, audit, and no recompute). `localCheckpoint` demonstrates
    * the boundary in one JVM; a cluster deployment would swap in a
    * reliable checkpoint/parquet stage store — the shape is the same.
    * Output is IDENTICAL either way (spec-asserted). */
  def clean(docs: DataFrame, cfg: Config = Config(),
      materialize: Boolean = false): DataFrame = {
    val gated = exactDedup(preFilter(docs, cfg))
    nearDedup(if (materialize) gated.localCheckpoint() else gated, cfg)
  }

  /** The full pipeline plus the leakage gate: clean, then drop docs whose
    * n-grams overlap the eval/benchmark set ([[decontaminate]] — broadcast
    * probe, cleaned corpus never shuffles for it). `materialize` adds the
    * [[clean]] stage boundary AND one after the cleaned corpus —
    * [[decontaminate]] also reads its train side twice (gram probe +
    * anti-join back). */
  def cleanWithEval(
      docs: DataFrame,
      evalSet: DataFrame,
      cfg: Config = Config(),
      materialize: Boolean = false): DataFrame = {
    val cleaned = clean(docs, cfg, materialize)
    decontaminate(if (materialize) cleaned.localCheckpoint() else cleaned,
      evalSet, cfg.decontamN)
  }

  /** Source balancing — cap the corpus at `maxPerSource` documents per
    * origin, keeping the lowest doc ids (deterministic, so reruns agree).
    * The standard anti-domination step before training-data mixing: one
    * window shuffle on `source`; a skewed mega-source is bounded to the
    * cap instead of flooding the mix. */
  def capPerSource(docs: DataFrame, maxPerSource: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= maxPerSource)
      .drop("_r")
  }

  /** Query-pack adapter for the per-source cap. */
  def sourceCapQuery(spark: SparkSession, sfDir: String): DataFrame =
    capPerSource(Tables.load(spark, sfDir, "documents"), maxPerSource = 40)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  /** Query-pack adapter: cleaned corpus doc ids + audit columns.
    * `materialize = true` (round 18): the declarative form recomputed the
    * gate+exact-dedup window subtree once per nearDedup consumer — FOUR
    * sibling copies in the physical plan (band self-join ×2, star branch,
    * anti-join back). The stage boundary computes it once; output is
    * identical by the existing spec assertion, and the boundary is the
    * documented 100 TB operational shape anyway. */
  def cleanQuery(spark: SparkSession, sfDir: String): DataFrame =
    clean(Tables.load(spark, sfDir, "documents"), materialize = true)
      .select("doc_id", "lang", "source", "quality")

  /**
   * Deterministic train/val/test split assignment — the leakage-safe way
   * to split training data: the split is a pure function of (doc id, salt),
   * so it is stable across reruns, cluster sizes, and partitionings (a
   * `rand()` split is none of those). Bucket = first 24 bits of
   * `md5(doc_id‖salt)` mod 100; changing the salt resamples every split.
   * Narrow map, no shuffle, no state.
   */
  /** The split decision as a plain column expression, so pipelines attach
    * it with a narrow projection instead of a join back to [[assignSplits]]
    * (which would re-evaluate the whole upstream subtree). */
  def splitColumn(trainPct: Int = 80, valPct: Int = 10,
      salt: String = "graft-split"): org.apache.spark.sql.Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val bucket = pmod(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))
        .cast("binary")), 1, 6), 16, 10).cast("bigint"),
      lit(100L))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  def assignSplits(
      docs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10,
      salt: String = "graft-split"): DataFrame =
    docs.select(col("doc_id"),
      splitColumn(trainPct, valPct, salt).as("split"))

  /** Query-pack adapter for split assignment. */
  def splitAssignQuery(spark: SparkSession, sfDir: String): DataFrame =
    assignSplits(Tables.load(spark, sfDir, "documents"))

  /**
   * Cluster-aware split assignment — the leakage guard [[assignSplits]]
   * cannot give: the split bucket hashes the near-dup CLUSTER id, not the
   * doc id, so two near-duplicate documents can never land on opposite
   * sides of a train/test boundary (the classic eval-contamination bug
   * that per-doc hashing leaves open whenever dedup keeps more than one
   * cluster member — deliberately, via caps, or because a later re-crawl
   * re-introduces a variant: same cluster ⇒ same bucket, always).
   * Composes [[Dedup.nearDupClusters]] (LSH + bounded-star CC) with the
   * md5 split hash; singletons hash their own id, so for a fully-deduped
   * corpus this degrades to exactly [[assignSplits]].
   */
  def assignSplitsByCluster(
      docs: DataFrame,
      trainPct: Int = 80,
      valPct: Int = 10,
      salt: String = "graft-split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val clusters = Dedup.nearDupClusters(docs)
    val withCluster = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val bucket = pmod(
      conv(substring(md5(concat(col("cluster_id").cast("string"), lit(salt))
        .cast("binary")), 1, 6), 16, 10).cast("bigint"),
      lit(100L))
    withCluster.select(col("doc_id"), col("cluster_id"),
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Query-pack adapter: cluster-aware 80/10/10 split, consuming the
    * memoized cluster assignment (Dedup.docClustersCached). */
  def clusterSplitQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val withCluster = docs.select(col("doc_id"))
      .join(Dedup.docClustersCached(spark, sfDir), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val bucket = pmod(
      conv(substring(md5(concat(col("cluster_id").cast("string"), lit("graft-split"))
        .cast("binary")), 1, 6), 16, 10).cast("bigint"),
      lit(100L))
    withCluster.select(col("doc_id"), col("cluster_id"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }

  /**
   * Deterministic weighted mixture sampling — the "mixing weights" step of
   * training-data preparation: keep each document with its source's rate,
   * decided by a pure hash of (doc id, salt) against a fixed-point
   * threshold. Same stability argument as [[assignSplits]]: reruns, resizes
   * and repartitions all see the same sample, unlike `rand()`/`sample()`.
   * Narrow map, no shuffle; a new salt draws a fresh sample.
   */
  def sampleMixture(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "graft-mix"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1))
    val bucket = pmod(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))
        .cast("binary")), 1, 6), 16, 10).cast("bigint"),
      lit(1000000L))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    docs.filter(bucket.cast("double") < rate * 1000000.0)
  }

  /** Query-pack adapter: downsample two over-represented sources. */
  def mixSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleMixture(Tables.load(spark, sfDir, "documents"),
        rates = Map("src0" -> 0.25, "src1" -> 0.5))
      .select("doc_id", "source")

  /**
   * Epoch-aware mixing SCHEDULE — the planning step [[sampleMixture]]
   * executes: given per-source mixture weights and a total token budget,
   * compute what each source contributes — its target token count, how
   * many FULL EPOCHS (complete repeats) of the source that implies, and
   * the micro-rate at which to sample the final partial epoch. This is
   * the table a training-data team actually reviews before a run: a
   * weight that demands 3.4 epochs of a small source is a repetition
   * red flag (Muennighoff et al. 2023's diminishing returns past ~4
   * epochs), and the schedule makes it visible BEFORE any data moves.
   *
   * All arithmetic is integer (`div`/`%` on BIGINT) so the oracle
   * replays every column exactly; the weight is supplied as a COLUMN
   * over `source` so both engines derive it from the data.
   *
   * 100 TB shape: one map-side-combined groupBy(source) over the corpus
   * (the token counting is the scan cost), then S-row arithmetic with a
   * 1-row weight-total cross join — the [[TableStats.analyze]] pattern.
   */
  def mixSchedule(
      docs: DataFrame,
      weightOf: Column => Column,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0)
    val per = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.whitespaceTokens(col("text"))).cast("long"))
          .as("n_tokens"))
      .withColumn("weight", weightOf(col("source")).cast("long"))
    val tot = per.agg(sum(col("weight")).as("_wsum"))
    per.crossJoin(tot)
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * weight) div _wsum"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"),
        expr("target_tokens div n_tokens").as("epochs_full"),
        expr("((target_tokens % n_tokens) * 1000000L) div n_tokens")
          .as("residual_rate_micro"))
  }

  /** Query-pack adapter: 1M-token budget over weights derived from the
    * source's numeric suffix (`(idx % 4) + 1` — spans under- and
    * over-subscribed sources at every fixture sf). */
  def mixScheduleQuery(spark: SparkSession, sfDir: String): DataFrame =
    mixSchedule(Tables.load(spark, sfDir, "documents"),
      weightOf = s => pmod(substring(s, 4, 10).cast("int"), lit(4)) + lit(1),
      budgetTokens = 1000000L)

  /**
   * Temperature-flattened mixture (the multilingual "temperature sampling"
   * convention): source s keeps rate ∝ n_s^(α−1), α ∈ (0,1] — smaller α
   * flattens the head harder; the smallest source keeps everything (rates
   * scale so its rate is 1). Rates round HALF-UP to 6 decimals so the
   * generated oracle reproduces them bit-for-bit. One bounded count
   * aggregate (#sources rows), then the same narrow hash-threshold filter
   * as [[sampleMixture]] — rerun/partitioning stable.
   */
  def sampleTemperature(
      docs: DataFrame,
      alpha: Double = 0.5,
      salt: String = "graft-temp"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "corpus has no sources")
    val raw = counts.view.mapValues(n => math.pow(n.toDouble, alpha - 1.0)).toMap
    val mx = raw.values.max
    val rates = raw.view.mapValues(v => math.floor(v / mx * 1e6 + 0.5) / 1e6).toMap
    sampleMixture(docs, rates, defaultRate = 1.0, salt = salt)
  }

  /** Query-pack adapter: the fixture's sources are uniform, so a skewed
    * mega-source is derived (docs below 350 fold into one head source) and
    * α = 0.5 flattening cuts it hardest — the oracle recomputes the same
    * counts, rates, and thresholds. */
  def tempSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleTemperature(
      Tables.load(spark, sfDir, "documents").withColumn("source",
        when(col("doc_id") < 350, lit("big")).otherwise(col("source"))))
      .select("doc_id", "source")

  /**
   * Deterministic training shards: shard = md5 bucket of (doc id, salt)
   * mod `numShards`; within-shard position = rank of a SECOND independent
   * md5 — a rerun-stable global shuffle + sharding for the training
   * dataloader (same stability argument as [[assignSplits]]; `rand()` and
   * `repartition` are neither rerun- nor topology-stable). One window
   * shuffle keyed by shard.
   */
  /** The deterministic shard bucket as a plain column — first 24 bits of
    * `md5(doc_id‖salt)` mod `numShards` — so pipelines attach it with a
    * narrow projection (the [[splitColumn]] discipline). */
  def shardColumn(numShards: Int, salt: String = "graft-shard"): org.apache.spark.sql.Column = {
    require(numShards > 0)
    pmod(
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))
        .cast("binary")), 1, 6), 16, 10).cast("bigint"),
      lit(numShards.toLong))
  }

  def shardCorpus(
      docs: DataFrame,
      numShards: Int,
      salt: String = "graft-shard"): DataFrame = {
    require(numShards > 0)
    import org.apache.spark.sql.expressions.Window
    val shard = shardColumn(numShards, salt)
    val orderKey = md5(concat(col("doc_id").cast("string"), lit(salt), lit("#pos"))
      .cast("binary"))
    docs.select(col("doc_id"), shard.as("shard"), orderKey.as("_ok"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy("shard").orderBy(col("_ok"), col("doc_id")))
        .cast("bigint"))
      .drop("_ok")
  }

  /** Query-pack adapter: 8 deterministic shards with in-shard order. */
  def shardQuery(spark: SparkSession, sfDir: String): DataFrame =
    shardCorpus(Tables.load(spark, sfDir, "documents"), numShards = 8)

  /**
   * Exact stratified sample: exactly min(n, |stratum|) documents per
   * stratum, chosen by deterministic md5 order — the exact-count
   * companion to the rate-based [[sampleMixture]]/[[sampleTemperature]]
   * (a rate times a stratum only approximates a count; eval-set
   * construction and per-source quotas need the count to be exact).
   * Rerun- and partitioning-stable: membership is a pure function of
   * (doc_id, salt), never of physical row order.
   *
   * One shuffle, partitioned by the stratum. A pathologically hot
   * stratum concentrates its sort on one partition — the same bound as
   * any per-stratum top-n; for small n Spark's WindowGroupLimit pushes
   * the rank filter into the sort, so state stays O(n) per stratum.
   */
  def stratifiedSample(
      docs: DataFrame,
      perStratum: Int,
      strataCol: String = "source",
      salt: String = "graft-strat"): DataFrame = {
    require(perStratum > 0)
    import org.apache.spark.sql.expressions.Window
    val orderKey = md5(concat(col("doc_id").cast("string"), lit(salt))
      .cast("binary"))
    docs.withColumn("_ok", orderKey)
      .withColumn("sample_rank", row_number()
        .over(Window.partitionBy(col(strataCol))
          .orderBy(col("_ok"), col("doc_id")))
        .cast("bigint"))
      .filter(col("sample_rank") <= perStratum)
      .drop("_ok")
  }

  /** Query-pack adapter: 7 docs per source, deterministic. */
  def stratSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedSample(Tables.load(spark, sfDir, "documents"), perStratum = 7)
      .select(col("doc_id"), col("source"), col("sample_rank"))

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
   * "Weighted random sampling with a reservoir"): each doc draws key
   * u^(1/w) for a uniform u and weight w; the k largest keys are an
   * exact weighted-without-replacement sample. Ranking by u^(1/w) is
   * equivalent to ranking by ln(u)/w (monotone for u in (0,1)), which is
   * what's computed; u is the deterministic 48-bit md5 uniform
   * (u = (h48 + 0.5) / 2^48 — never 0 or 1), so membership is rerun- and
   * partitioning-stable, same argument as [[assignSplits]].
   *
   * Keys are quantized to NANO units (floor(ln(u)/w * 1e9 + 0.5), a
   * BIGINT) with doc_id as the total-order tiebreak — the engine's
   * tie-rule-free convention, so an oracle recomputing the same ln on a
   * different libm cannot flip the selection except on a float that
   * lands within an ulp of a nano boundary.
   *
   * 100 TB shape: the key is a narrow per-row expression; global top-k
   * is TakeOrderedAndProject (per-partition heads, never a full sort).
   */
  def weightedSample(
      docs: DataFrame,
      k: Int,
      weightCol: String = "n_chars",
      salt: String = "graft-wrs"): DataFrame = {
    require(k > 0)
    val h48 = conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))
      .cast("binary")), 1, 12), 16, 10).cast("bigint")
    val u = (h48.cast("double") + lit(0.5)) / lit(281474976710656.0) // 2^48
    val w = greatest(col(weightCol).cast("double"), lit(1.0))
    val keyNano = floor(log(u) / w * lit(1e9) + lit(0.5)).cast("bigint")
    val keyed = docs.select(col("doc_id"), col("source"),
      col(weightCol).cast("long").as("weight"), keyNano.as("key_nano"))
    val top = keyed.orderBy(col("key_nano").desc, col("doc_id").asc).limit(k)
    // rank over the k selected rows only — bounded single-partition window
    import org.apache.spark.sql.expressions.Window
    top.withColumn("sample_rank",
      row_number().over(Window.orderBy(col("key_nano").desc, col("doc_id").asc))
        .cast("bigint"))
  }

  /** Query-pack adapter: 100 docs weighted by length. */
  def weightedSampleQuery(spark: SparkSession, sfDir: String): DataFrame =
    weightedSample(Tables.load(spark, sfDir, "documents"), k = 100)

  /**
   * Sequence packing — group documents into training sequences of at most
   * `budget` tokens (greedy next-fit in doc-id order; an over-budget doc
   * gets its own bin). The packing is DETERMINISTIC and fully distributed:
   * docs are grouped into fixed id-ranges of `grpSize` (a pure function of
   * doc_id — no sampling, no partitioning dependence), each group packs
   * independently inside one `aggregate` higher-order expression (codegen,
   * no UDF), and a bin is globally identified by (grp, bin). Group size
   * bounds both the collected array and the packing fragmentation: at most
   * one under-filled trailing bin per `grpSize` docs.
   */
  /** The greedy next-fit fold over a pre-sorted `ds` struct array — each
    * element needs `doc_id` and `n_tokens` fields (extra leading sort
    * fields ride along untouched). Shared by the fixed-group and the
    * caller-ordered packers so the walk cannot drift between them. */
  private def packFoldSql(budget: Long): String =
    s"""aggregate(
          ds,
          named_struct(
            'bin', CAST(-1 AS BIGINT), 'used', CAST($budget AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, n_tokens: BIGINT, bin: BIGINT>>)),
          (acc, d) ->
            IF(acc.used + d.n_tokens <= $budget,
               named_struct('bin', acc.bin, 'used', acc.used + d.n_tokens,
                 'out', array_append(acc.out,
                   named_struct('doc_id', d.doc_id, 'n_tokens', d.n_tokens, 'bin', acc.bin))),
               named_struct('bin', acc.bin + CAST(1 AS BIGINT), 'used', d.n_tokens,
                 'out', array_append(acc.out,
                   named_struct('doc_id', d.doc_id, 'n_tokens', d.n_tokens, 'bin', acc.bin + CAST(1 AS BIGINT))))),
          acc -> acc.out)"""

  def packSequences(docs: DataFrame, budget: Long, grpSize: Long = 100L): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      (col("doc_id") / grpSize).cast("bigint").as("grp"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
    toks.groupBy("grp")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_tokens")))).as("ds"))
      .select(col("grp"), explode(expr(packFoldSql(budget))).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("grp"),
        col("p.bin").as("bin"), col("p.n_tokens").as("n_tokens"))
  }

  /** [[packSequences]] with caller-chosen group and in-group order — the
    * shape a training job actually packs in: group = shard, order = the
    * epoch shuffle key, so sequence composition follows the epoch
    * permutation instead of raw id order. Same one-shuffle plan: the
    * struct array sorts by (ord, doc_id) lexicographically, then the
    * shared next-fit fold walks it. */
  def packSequencesOrdered(docs: DataFrame,
      grp: org.apache.spark.sql.Column, ord: org.apache.spark.sql.Column,
      budget: Long): DataFrame = {
    val toks = docs.select(
      grp.cast("bigint").as("grp"), ord.cast("bigint").as("ord"),
      col("doc_id"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
    toks.groupBy("grp")
      .agg(sort_array(collect_list(
        struct(col("ord"), col("doc_id"), col("n_tokens")))).as("ds"))
      .select(col("grp"), explode(expr(packFoldSql(budget))).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("grp"),
        col("p.bin").as("bin"), col("p.n_tokens").as("n_tokens"))
  }

  /** Query-pack adapter: pack the corpus into 256-token sequences. */
  def packSequencesQuery(spark: SparkSession, sfDir: String): DataFrame =
    packSequences(Tables.load(spark, sfDir, "documents"), budget = 256L)

  /**
   * First-fit-DECREASING packing — the padding-efficiency upgrade over
   * [[packSequences]]'s next-fit: items are walked largest-first and each
   * goes into the FIRST open bin it fits (a new bin only when none fits).
   * FFD is the classic bin-packing heuristic (≤ 11/9·OPT + 6/9 bins,
   * Dósa 2007) — for sequence packing that is directly fewer padded
   * tokens per training step. Same one-shuffle shape as [[packSequences]]:
   * group → sorted struct array → one aggregate() fold; the open-bin
   * load vector lives inside the fold state, bounded by the group's bin
   * count, never materialized. Bins are 1-based in walk order.
   *
   * Determinism: ties sort (n_tokens desc, doc_id asc); the fold is a
   * left fold over that total order, so reruns and repartitionings agree.
   */
  def packSequencesFirstFit(docs: DataFrame, budget: Long,
      grpSize: Long = 100L): DataFrame = {
    // first-fit position in the open-bin loads, 1-based; Spark's
    // array_position returns 0 when no bin fits
    // lambda var is `y`: the expression is re-spliced inside a transform
    // whose own lambda binds `x`, and nested lambdas must not shadow
    val pos = s"array_position(transform(acc.loads, y -> y + d.n_tokens <= CAST($budget AS BIGINT)), true)"
    val fold =
      s"""aggregate(
            ds,
            named_struct(
              'loads', CAST(array() AS ARRAY<BIGINT>),
              'out', CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, n_tokens: BIGINT, bin: BIGINT>>)),
            (acc, d) ->
              IF($pos = 0,
                 named_struct(
                   'loads', array_append(acc.loads, d.n_tokens),
                   'out', array_append(acc.out, named_struct(
                     'doc_id', d.doc_id, 'n_tokens', d.n_tokens,
                     'bin', CAST(size(acc.loads) AS BIGINT) + 1))),
                 named_struct(
                   'loads', transform(acc.loads, (x, i) -> IF(CAST(i AS BIGINT) + 1 = $pos, x + d.n_tokens, x)),
                   'out', array_append(acc.out, named_struct(
                     'doc_id', d.doc_id, 'n_tokens', d.n_tokens, 'bin', $pos)))),
            acc -> acc.out)"""
    val toks = docs.select(
      col("doc_id"),
      (col("doc_id") / grpSize).cast("bigint").as("grp"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
    toks.groupBy("grp")
      .agg(sort_array(collect_list(
        struct((-col("n_tokens")).as("negt"), col("doc_id"), col("n_tokens")))).as("ds"))
      .select(col("grp"), explode(expr(fold)).as("p"))
      .select(col("p.doc_id").as("doc_id"), col("grp"),
        col("p.bin").as("bin"), col("p.n_tokens").as("n_tokens"))
  }

  /** Query-pack adapter: FFD-pack the corpus into 256-token sequences. */
  def packFfdQuery(spark: SparkSession, sfDir: String): DataFrame =
    packSequencesFirstFit(Tables.load(spark, sfDir, "documents"), budget = 256L)

  /**
   * Benchmark decontamination — the leakage gate of a training-data
   * pipeline: a training document is contaminated when it shares any
   * n-token window with an eval/benchmark document (the published-corpus
   * convention is n = 13 whole-word grams). Returns one row per
   * contaminated train doc with its distinct-overlapping-window count.
   *
   * 100 TB shape: the eval side is benchmark-sized (millions of windows at
   * most), so its distinct gram set stays broadcastable — AQE plans a
   * broadcast hash join and the train corpus NEVER shuffles for the probe.
   * The only exchange is the per-doc hit aggregation over the matching
   * grams (a corpus-independent, benchmark-bounded set). Windows are the
   * 64-bit [[graft.functions.MinHashImpl.shingleHashes]] hashes (one
   * codegen'd pass, each token hashed once), not materialized strings.
   */
  def contaminationHits(train: DataFrame, evalSet: DataFrame, n: Int = 13): DataFrame = {
    import graft.functions.MinHashFunctions.shingle_hashes
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(shingle_hashes(split(lower(col("text")), "\\s+"), n)).as("g"))
    val evalGrams = grams(evalSet).select("g").distinct()
    grams(train).join(evalGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** Drop every train doc with at least `minHits` overlapping windows; the
    * contaminated-id list is benchmark-bounded, so the anti-join broadcasts. */
  def decontaminate(
      train: DataFrame,
      evalSet: DataFrame,
      n: Int = 13,
      minHits: Long = 1L): DataFrame =
    train.join(
      contaminationHits(train, evalSet, n)
        .filter(col("n_hits") >= minHits).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /**
   * Global line-level dedup — the C4 rule (Raffel et al., JMLR'20: "we
   * discarded any line that occurred more than N times in the corpus"):
   * boilerplate (nav bars, cookie banners, license headers) repeats
   * across pages verbatim at line granularity, below document near-dup's
   * radar. Every line occurring more than `maxOccurrences` times
   * corpus-wide is removed from EVERY document; documents reassemble in
   * original line order, and a document whose every line is banned drops
   * entirely.
   *
   * Scale shape: the global tally groups on the line's md5 digest (the
   * [[Dedup.exact]] device — 16 bytes shuffle per line, not the text);
   * banned digests are the boilerplate set, typically tiny, so the
   * removal anti-join broadcasts under AQE and the corpus-side explode /
   * reassemble never shuffles text between stages of a different key —
   * one digest groupBy + one doc_id groupBy. Digest collisions: same
   * accepted md5 tradeoff as exact dedup.
   */
  def dedupLines(
      docs: DataFrame,
      maxOccurrences: Long = 2,
      sep: String = "\n"): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "line")))
      .withColumn("h", md5(col("line").cast("binary")))
    val banned = lines.groupBy(col("h"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > maxOccurrences)
      .select("h")
    lines.join(banned, Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line")),
        sep).as("text"))
  }

  /**
   * Token-budget corpus selection — the data-mixing primitive: per
   * source, keep documents in descending quality order while the running
   * token total stays within the budget (prefix cutoff: the first
   * overflowing document and everything below it drop — NOT next-fit
   * back-filling, which needs the full per-source prefix in memory; the
   * prefix rule is a running sum, constant state per partition).
   * Deterministic: ties break on doc_id, so a rerun selects a
   * byte-identical corpus.
   *
   * One shuffle (the per-source sort window); sources are independent
   * units of work, and the window streams — no buffering beyond the
   * running sum.
   */
  def selectWithinBudget(
      docs: DataFrame,
      tokenBudget: Long,
      quality: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(quality.desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = size(split(col("text"), "\\s+")).cast("bigint")
    docs
      .withColumn("_cumTok", sum(nTok).over(w))
      .filter(col("_cumTok") <= tokenBudget)
      .drop("_cumTok")
  }

  /**
   * SemDeDup applied (Abbas et al., "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication", 2023): drop all but ONE
   * representative per semantic duplicate cluster — the highest-`quality`
   * document, ties to the least doc_id — keeping every unclustered
   * document. Clusters come from [[Dedup.embeddingClusters]] (corpus-sized
   * LSH buckets + star-guarded verify + bounded-round connected
   * components), so transitive near-dup chains collapse to one survivor
   * where pairwise dropping would under-delete. Embeddings map to
   * documents by vec_id = doc_id.
   *
   * Shape on top of the cluster pass: one per-cluster max_by aggregation
   * (map-side combine; cluster count ≪ corpus) and one broadcast-prone
   * semi-join of survivors back to docs.
   */
  def semanticDedup(
      docs: DataFrame,
      embeddings: DataFrame,
      quality: org.apache.spark.sql.Column,
      targetBucket: Int = 256,
      threshold: Double = 0.95): DataFrame =
    semanticDedupFromClusters(docs,
      Dedup.embeddingClusters(embeddings,
        targetBucket = targetBucket, threshold = threshold),
      quality)

  /** [[semanticDedup]] against a PRE-COMPUTED (vec_id, cluster_id)
    * assignment — the production shape: the cluster pass is a persisted
    * artifact built once (see `Dedup.embeddingClustersCached`), and every
    * dedup run joins against it instead of re-running connected
    * components. */
  def semanticDedupFromClusters(
      docs: DataFrame,
      clusterAssignment: DataFrame,
      quality: org.apache.spark.sql.Column): DataFrame = {
    val clusters = clusterAssignment.withColumnRenamed("vec_id", "doc_id")
    val withCluster = docs.join(clusters, Seq("doc_id"), "left")
    val reps = withCluster.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id")
      .agg(max_by(col("doc_id"), struct(quality, -col("doc_id"))).as("doc_id"))
      .select("doc_id")
    withCluster.filter(col("cluster_id").isNull).drop("cluster_id")
      .unionByName(docs.join(reps, Seq("doc_id"), "left_semi"))
  }

  /** Query-pack adapter: same loose-radius regime as q_embed_clusters
    * (fixture embeddings have no 0.95 pairs); n_chars as quality. Shares
    * q_embed_clusters' memoized assignment — cluster once, consume many. */
  def semanticDedupQuery(spark: SparkSession, sfDir: String): DataFrame =
    semanticDedupFromClusters(
        Tables.load(spark, sfDir, "documents"),
        Dedup.embeddingClustersCached(Tables.load(spark, sfDir, "embeddings"),
          key = sfDir, targetBucket = 256, threshold = 0.1),
        quality = col("n_chars"))
      .select("doc_id", "source", "n_chars")

  /** Query-pack adapter: 700 whitespace-tokens per source, ranked by the
    * fixture's n_chars as the quality proxy. */
  def tokenBudgetQuery(spark: SparkSession, sfDir: String): DataFrame =
    selectWithinBudget(Tables.load(spark, sfDir, "documents"),
        tokenBudget = 700L, quality = col("n_chars"))
      .select("doc_id", "source", "n_chars")

  /** Query-pack adapter: fixture docs are single-line token soup, so the
    * adapter first folds them into 8-token lines (deterministic, SQL-
    * replicable), then applies the corpus-wide ban at maxOccurrences=2. */
  def lineDedupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val tk = split(col("text"), " ")
    val folded = docs.select(col("doc_id"),
      array_join(
        transform(sequence(lit(0), ceil(size(tk) / 8.0).cast("int") - 1),
          i => array_join(slice(tk, i * 8 + 1, lit(8)), " ")),
        "\n").as("text"))
    dedupLines(folded, maxOccurrences = 2)
  }

  /**
   * Semantic (embedding-level) benchmark decontamination — the companion
   * to the n-gram [[contaminationHits]]: a train example is contaminated
   * when its EMBEDDING lies within cosine `threshold` of any eval
   * example, catching the paraphrases and near-rewrites an exact-window
   * probe misses. Output: (vec_id, n_hits, max_cosine) per flagged train
   * vector.
   *
   * Same 100 TB shape as the n-gram form: both sides hash into shared
   * hyperplane buckets (narrow codegen'd dot products); the eval side is
   * benchmark-bounded so its bucketed table broadcasts, and the train
   * corpus never shuffles for the probe — each train vector meets only
   * its own bucket's eval candidates, every candidate verified with the
   * exact cosine kernel. Recall < 1 by bucketing (raise recall by
   * lowering `planes`; the eval side is small, so cost stays bounded).
   */
  def semanticContaminationHits(
      train: DataFrame,
      evalSet: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 8,
      seed: Long = 42L): DataFrame = {
    val t = Dedup.embedBuckets(train, planes, seed)
    val e = Dedup.embedBuckets(evalSet, planes, seed)
      .select(col("vec_id").as("eval_id"), col("embedding").as("eval_emb"),
        col("bucket"))
    t.join(broadcast(e), "bucket")
      .select(col("vec_id"),
        // quantized (9 decimals) before the threshold filter and the max —
        // raw IEEE tails are not portable cross-engine (Similarity.q9)
        round(graft.functions.VectorFunctions
          .cosine_sim(col("embedding"), col("eval_emb")), 9).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cosine"))
  }

  /** Drop every train vector semantically too close to the eval set; the
    * flagged-id list is benchmark-bounded, so the anti-join broadcasts. */
  def semanticDecontaminate(
      train: DataFrame,
      evalSet: DataFrame,
      threshold: Double = 0.95,
      planes: Int = 8,
      seed: Long = 42L): DataFrame =
    train.join(
      semanticContaminationHits(train, evalSet, threshold, planes, seed)
        .select("vec_id"),
      Seq("vec_id"), "left_anti")

  /** Query-pack adapter: every 5th vector is the "benchmark"; hyperplane
    * buckets at 6 planes, cosine ≥ 0.1 (fixture embeddings are near-
    * orthogonal — a production threshold would return nothing). */
  def semDecontamQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.load(spark, sfDir, "embeddings")
    semanticContaminationHits(
      train = emb.filter(pmod(col("vec_id"), lit(5)) =!= 3),
      evalSet = emb.filter(pmod(col("vec_id"), lit(5)) === 3),
      threshold = 0.1, planes = 6)
  }

  /** Query-pack adapter: every 5th doc is the "benchmark"; 4-gram overlap
    * against the rest (fixture texts are short — 13-grams would not fire). */
  def decontamQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    contaminationHits(
      train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 3),
      evalSet = docs.filter(pmod(col("doc_id"), lit(5)) === 3),
      n = 4)
  }

  /**
   * End-to-end training-data preparation as ONE declarative plan — the
   * flagship composition: quality + language gates, exact dedup, near-dup
   * removal ([[clean]]), benchmark decontamination against the held-out
   * eval slice ([[decontaminate]]), and leakage-safe split assignment
   * ([[splitColumn]] — a narrow projection, not a join). Every stage is
   * the already-oracle-verified operator; Catalyst fuses the narrow gates
   * into the scan, and the only exchanges are the dedup window, the LSH
   * band-bucket join, and AQE-broadcast anti-joins.
   */
  def pipelineE2eQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val evalSet = docs.filter(pmod(col("doc_id"), lit(5L)) === 3)
    val train = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 3)
    // materialize = true (round 18): same rationale as cleanQuery — the
    // gated window subtree otherwise replays per consumer (bands, star,
    // anti-join, decontam probe); identical output, spec-asserted
    cleanWithEval(train, evalSet, Config(decontamN = 4), materialize = true)
      .select(col("doc_id"), col("source"), col("quality"),
        splitColumn().as("split"))
  }
}
