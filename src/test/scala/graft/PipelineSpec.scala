package graft

import graft.model.CellTable
import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("corpus diff: added/removed/changed/unchanged classified with token deltas") {
    import graft.operators.CorpusDiff
    val old = Seq(
      (1L, "alpha beta gamma", "s0"),
      (2L, "delta epsilon", "s0"),
      (3L, "zeta eta theta iota", "s1")
    ).toDF("doc_id", "text", "source")
    val nw = Seq(
      (1L, "alpha beta gamma", "s0"),      // unchanged
      (2L, "delta epsilon REVISED", "s0"), // changed (3 tokens now)
      (4L, "kappa lambda", "s1")           // added; doc 3 removed
    ).toDF("doc_id", "text", "source")
    val r = CorpusDiff.diff(old, nw).collect()
      .map(x => (x.getAs[String]("source"), x.getAs[String]("change_class")) ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens")))).toMap
    assert(r(("s0", "unchanged")) == ((1L, 3L)))
    assert(r(("s0", "changed")) == ((1L, 3L)))    // new-side tokens
    assert(r(("s1", "removed")) == ((1L, 4L)))    // old-side tokens
    assert(r(("s1", "added")) == ((1L, 2L)))
    assert(r.size == 4)
  }

  test("mix schedule: integer budget split, epoch counts, residual rates") {
    // s0: 10 tokens at weight 3, s1: 10 tokens at weight 1, budget 100
    // -> targets 75/25, epochs 7/2, residual 5/10 = 500000 micro each
    val docs = Seq(
      (1L, "a b c d e", "s0"),
      (2L, "f g h i j", "s0"),
      (3L, "k l m n o p q r s t", "s1")
    ).toDF("doc_id", "text", "source")
    val r = CorpusPipeline.mixSchedule(docs,
        weightOf = s => when(s === "s0", 3).otherwise(1),
        budgetTokens = 100L)
      .collect().map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("weight"),
          x.getAs[Long]("target_tokens"), x.getAs[Long]("epochs_full"),
          x.getAs[Long]("residual_rate_micro")))).toMap
    assert(r("s0") == ((10L, 3L, 75L, 7L, 500000L)))
    assert(r("s1") == ((10L, 1L, 25L, 2L, 500000L)))
    // the split never over-spends: sum of targets <= budget (div truncation)
    assert(r.values.map(_._3).sum <= 100L)
  }

  test("corpus pipeline: dedups exactly, drops near-dups, keeps min ids") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    val docs = Seq(
      (1L, base + "today", "en", "s0"),
      (2L, base + "today", "en", "s0"),          // exact dup of 1
      (3L, base + "tonight", "en", "s1"),        // near dup of 1
      (4L, "totally different words about query engines and big shuffles " * 5, "en", "s2"),
      (5L, base + "today", "xx", "s3"),          // filtered by language
      (6L, "x", "en", "s4")                      // filtered by quality (too short)
    ).toDF("doc_id", "text", "lang", "source")

    val cleaned = CorpusPipeline.clean(docs)
    val ids = cleaned.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L))      // survivor of the dup group (min id)
    assert(!ids.contains(2L))     // exact dup removed
    assert(!ids.contains(3L))     // near dup removed
    assert(ids.contains(4L))      // distinct doc kept
    assert(!ids.contains(5L))     // language gate
    assert(!ids.contains(6L))     // quality gate
    // deterministic: same input -> same output
    assert(CorpusPipeline.clean(docs).select("doc_id").as[Long].collect().toSet == ids)
  }

  test("temperature sampling flattens the head; sharding is deterministic and complete") {
    // the fixture's sources are uniform (every rate = 1), so flattening is
    // asserted on a crafted skewed corpus: 240/50/10 docs per source
    val skewed = (1L to 300L).map(i =>
      (i, if (i <= 240) "big" else if (i <= 290) "mid" else "small"))
      .toDF("doc_id", "source")
    val before = skewed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = CorpusPipeline.sampleTemperature(skewed, alpha = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("small").toDouble / before("small") >
      after("big").toDouble / before("big"),
      s"flattening must cut the head hardest: $before -> $after")
    assert(after("small") == before("small"), "smallest source keeps everything")
    // deterministic: the same call selects the same docs
    val a = CorpusPipeline.sampleTemperature(skewed).select("doc_id").as[Long].collect().toSet
    val b = CorpusPipeline.sampleTemperature(skewed).select("doc_id").as[Long].collect().toSet
    assert(a == b)

    val docs = graft.sources.Tables.load(spark, sf001, "documents")

    val shards = CorpusPipeline.shardCorpus(docs, numShards = 8).collect()
    assert(shards.length == docs.count())
    val byShard = shards.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.values.foreach { rows =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to rows.length).toSeq, "positions are a dense rank")
    }
    // in-shard order is the hash order, not doc_id order (a real shuffle)
    assert(byShard.values.exists { rows =>
      val inOrder = rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
      inOrder.toSeq != inOrder.sorted.toSeq
    })
  }

  test("repetition gate and leakage gate compose with the cleaning pipeline") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
    val spammy = "spam ham " * 80 // length/alpha fine, bigrams almost all repeats
    val distinct = "totally different words about query engines and big shuffles " * 5
    val docs = Seq(
      (1L, base + "today", "en", "s0"),
      (4L, distinct, "en", "s2"),
      (7L, spammy, "en", "s5")
    ).toDF("doc_id", "text", "lang", "source")

    val defaultIds = CorpusPipeline.clean(docs).select("doc_id").as[Long].collect().toSet
    assert(defaultIds == Set(1L, 4L, 7L), "gate off: repetitive doc survives")

    // top_frac gate: docs 1/4 repeat a long PHRASE (top bigram ≈ 1/13 of
    // windows) but the spam doc is one bigram over and over (top ≈ 0.5)
    val gated = CorpusPipeline.clean(docs,
        CorpusPipeline.Config(maxTopFrac = Some(0.3)))
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(1L, 4L), "gate on: repetitive doc dropped")

    val evalSet = Seq((100L, distinct)).toDF("doc_id", "text")
    val decontaminated = CorpusPipeline.cleanWithEval(docs, evalSet)
      .select("doc_id").as[Long].collect().toSet
    assert(decontaminated == Set(1L, 7L), "leaked doc dropped, others kept")
  }

  test("e2e pipeline query: composition of the verified stages, leakage-safe splits") {
    val got = CorpusPipeline.pipelineE2eQuery(spark, sf001).collect()
    assert(got.nonEmpty)
    // no eval-slice doc survives; quality gate held; splits well-formed
    assert(got.forall(_.getAs[Long]("doc_id") % 5 != 3))
    assert(got.forall(_.getAs[Double]("quality") >= 0.5))
    assert(got.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    // equals the manual composition of the published operators
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val manual = CorpusPipeline.cleanWithEval(
        docs.filter(pmod(col("doc_id"), lit(5L)) =!= 3),
        docs.filter(pmod(col("doc_id"), lit(5L)) === 3),
        CorpusPipeline.Config(decontamN = 4))
    val manualIds = manual.select("doc_id").as[Long].collect().toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == manualIds)
    // split agrees with assignSplits on the same ids
    val splits = CorpusPipeline.assignSplits(manual).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(got.forall(r => splits(r.getAs[Long]("doc_id")) == r.getAs[String]("split")))
  }

  test("materialized pipeline (stage checkpoints) equals the declarative plan") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 3)
    val evalSet = docs.filter(pmod(col("doc_id"), lit(5L)) === 3)
    val cfg = CorpusPipeline.Config(decontamN = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "source", "quality")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(CorpusPipeline.cleanWithEval(train, evalSet, cfg, materialize = true)) ==
      rows(CorpusPipeline.cleanWithEval(train, evalSet, cfg)),
      "checkpointed stage boundaries must not change the output")
  }

  test("decontamination: flags n-gram overlap with the eval set, spares clean docs") {
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "tiny")  // shorter than n -> whole-doc window
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, "intro words then alpha beta gamma delta and a tail"), // shares one 4-gram
      (2L, "alpha beta gamma delta epsilon zeta verbatim run"),   // shares three 4-grams
      (3L, "completely unrelated training text with no overlap at all"),
      (4L, "tiny")                                                // whole-doc match
    ).toDF("doc_id", "text")

    val hits = CorpusPipeline.contaminationHits(train, evalSet, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 3L, 4L -> 1L))

    val kept = CorpusPipeline.decontaminate(train, evalSet, n = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // raising the hit floor keeps single-gram brushes
    val kept2 = CorpusPipeline.decontaminate(train, evalSet, n = 4, minHits = 2L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 3L, 4L))
  }

  test("line dedup: corpus-wide ban above the cap, order kept, empty docs drop") {
    val docs = Seq(
      (1L, "cookie banner\nreal content one\nfooter"),
      (2L, "cookie banner\nreal content two\nfooter"),
      (3L, "cookie banner\nreal content three\nfooter"),
      (4L, "twice-used line\nunique tail"),
      (5L, "twice-used line"),
      (6L, "cookie banner\nfooter")               // all lines banned -> doc drops
    ).toDF("doc_id", "text")
    // 'cookie banner' and 'footer' occur 4x (> 2) -> banned everywhere;
    // 'twice-used line' occurs 2x (= cap) -> kept
    val out = CorpusPipeline.dedupLines(docs, maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "real content one",
      2L -> "real content two",
      3L -> "real content three",
      4L -> "twice-used line\nunique tail",
      5L -> "twice-used line"))
  }

  test("token-budget selection: quality-ordered prefix per source, deterministic") {
    val docs = Seq(
      // source A: qualities 9 > 7 > 5; token counts 3, 3, 3; budget 7
      (1L, "a b c", "A", 9.0), (2L, "d e f", "A", 7.0), (3L, "g h i", "A", 5.0),
      // source B: the top doc alone overflows -> B contributes nothing
      (4L, "one two three four five six seven eight nine ten", "B", 8.0),
      (5L, "small", "B", 2.0)
    ).toDF("doc_id", "text", "source", "q")
    val kept = CorpusPipeline.selectWithinBudget(docs, tokenBudget = 7L, col("q"))
      .select("doc_id").as[Long].collect().toSet
    // A: 3 + 3 = 6 <= 7, third would hit 9 -> dropped; B: first hits 10 ->
    // prefix cutoff drops it AND the smaller one below it
    assert(kept == Set(1L, 2L))
    // rerun = identical selection
    val again = CorpusPipeline.selectWithinBudget(docs, tokenBudget = 7L, col("q"))
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
  }

  test("semantic dedup keeps one best-quality representative per cluster") {
    val emb = graft.sources.Tables.load(spark, sf001, "embeddings")
    // plant a 3-vector duplicate cluster: ids 1000/1001/1002 share vec 0's
    // embedding (cos 1 -> same bucket, verified edges, one component)
    val planted = emb.unionByName(
      emb.filter(col("vec_id") === 0L).crossJoin(
          spark.range(1000, 1003).select(col("id").as("nid")))
        .select(col("nid").as("vec_id"), col("embedding"),
          lit(0).as("label")))
    val docs = planted.select(col("vec_id").as("doc_id"),
      lit("x").as("text"), lit("s").as("source"),
      // quality: 1001 wins its cluster
      when(col("vec_id") === 1001L, 9L).otherwise(col("vec_id") % 7).as("n_chars"))
    val kept = CorpusPipeline.semanticDedup(docs, planted,
        quality = col("n_chars"), threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    // cluster {0, 1000, 1001, 1002}: only 1001 survives
    assert(kept.contains(1001L))
    assert(Set(0L, 1000L, 1002L).intersect(kept).isEmpty)
    // everything outside the planted cluster survives
    assert(kept.size == docs.count() - 3)
  }

  test("semantic decontamination: flags exact/near eval copies, broadcast probe") {
    val emb = graft.sources.Tables.load(spark, sf001, "embeddings")
    val evalSet = emb.filter(col("vec_id") < 5) // verbatim copies of 5 train vecs
    // at cos >= 0.9 only (near-)copies fire; identical vectors always share
    // a bucket, so the 5 planted leaks are guaranteed hits with cosine 1
    val hits = CorpusPipeline.semanticContaminationHits(emb, evalSet, threshold = 0.9)
    val flagged = hits.select("vec_id").as[Long].collect().toSet
    assert(Set(0L, 1L, 2L, 3L, 4L).subsetOf(flagged), s"planted leaks missed: $flagged")
    hits.filter(col("vec_id") < 5).select("max_cosine").collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))

    val kept = CorpusPipeline.semanticDecontaminate(emb, evalSet, threshold = 0.9)
    assert(kept.count() == emb.count() - flagged.size)
    assert(kept.filter(col("vec_id") < 5).count() == 0)

    hits.collect() // let AQE finalize the plan
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
  }

  test("decontamination probe broadcasts the eval side (train never shuffles)") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val df = CorpusPipeline.contaminationHits(
      train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 3),
      evalSet = docs.filter(pmod(col("doc_id"), lit(5)) === 3),
      n = 4)
    df.collect() // let AQE finalize the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe in:\n$plan")
  }

  test("pipeline query runs on the fixture corpus and shrinks it") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val n = CorpusPipeline.cleanQuery(spark, sf001).count()
    assert(n > 0 && n <= docs.count())
  }

  test("region layout: range-partitioned files prune point lookups") {
    val cells = CellTable.fromTable(spark, sf001, "customer")
    val dir = java.nio.file.Files.createTempDirectory("graft_regions").toString + "/cells"
    CellTable.writeRegionLayout(cells, dir, numRegions = 4)

    val files = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(files == 4)

    val reread = spark.read.parquet(dir)
    assert(reread.count() == cells.count())
    // point GET over the layout reads a pruned scan and returns the row
    val key = CellTable.bigEndianKey(lit(42L))
    val hit = reread.filter(col("rowKey") === key)
    assert(hit.count() == 4)   // 4 value columns for customer
    // with range partitioning + min/max stats, only 1 of 4 files can match;
    // observable as a single non-empty scanned partition
    val scanned = hit.select(input_file_name()).distinct().count()
    assert(scanned == 1)
  }

  test("sequence packing: budget respected, order preserved, coverage complete") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val budget = 256L
    val packed = graft.operators.CorpusPipeline.packSequences(docs, budget).collect()
    assert(packed.length == docs.count())
    val byBin = packed.groupBy(r => (r.getAs[Long]("grp"), r.getAs[Long]("bin")))
    byBin.foreach { case (_, rows) =>
      val total = rows.map(_.getAs[Long]("n_tokens")).sum
      // a bin either fits the budget or is a single over-budget document
      assert(total <= budget || rows.length == 1)
    }
    // greedy in doc-id order: bins within a group are monotone in doc_id
    packed.groupBy(_.getAs[Long]("grp")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      val bins = sorted.map(_.getAs[Long]("bin"))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
    }
  }

  test("FFD packing: valid bins, never more bins than next-fit, hand-case optimality") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val budget = 256L
    val ffd = graft.operators.CorpusPipeline
      .packSequencesFirstFit(docs, budget).collect()
    assert(ffd.length == docs.count()) // coverage complete
    ffd.groupBy(r => (r.getAs[Long]("grp"), r.getAs[Long]("bin"))).foreach {
      case (_, rows) =>
        val total = rows.map(_.getAs[Long]("n_tokens")).sum
        assert(total <= budget || rows.length == 1) // valid or lone oversized doc
    }
    // FFD never opens more bins than next-fit in any group
    val nf = graft.operators.CorpusPipeline.packSequences(docs, budget).collect()
    def binsPerGrp(rows: Array[org.apache.spark.sql.Row]) = rows
      .groupBy(_.getAs[Long]("grp"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("bin")).distinct.length }
    val (fb, nb) = (binsPerGrp(ffd), binsPerGrp(nf))
    assert(fb.keySet == nb.keySet)
    fb.foreach { case (g, n) => assert(n <= nb(g), s"grp $g: FFD $n > next-fit ${nb(g)}") }
    // hand case where next-fit provably wastes a bin: sizes 200,200,56,56
    // in id order — next-fit packs (200),(200),(56,56): 3 bins; FFD walks
    // 200,200,56,56 largest-first into (200,56),(200,56): 2 bins
    import spark.implicits._
    val hand = Seq((0L, 200), (1L, 200), (2L, 56), (3L, 56))
      .toDF("doc_id", "n")
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), col("n")), _ => lit("w"))).as("text"))
    val handFfd = graft.operators.CorpusPipeline
      .packSequencesFirstFit(hand, budget).collect()
    assert(handFfd.map(_.getAs[Long]("bin")).distinct.length == 2)
    val handNf = graft.operators.CorpusPipeline.packSequences(hand, budget).collect()
    assert(handNf.map(_.getAs[Long]("bin")).distinct.length == 3)
    // determinism across physical layouts
    val again = graft.operators.CorpusPipeline
      .packSequencesFirstFit(docs.repartition(13), budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(again == ffd.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
  }

  test("stratified sample: exact per-stratum counts, repartition-stable, salt-sensitive") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val s = CorpusPipeline.stratifiedSample(docs, perStratum = 7)
    val bySource = s.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.values.forall(_ == 7)) // 25 docs/source at sf0.001
    // membership is a function of ids, not physical layout
    val a = s.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CorpusPipeline.stratifiedSample(docs.repartition(13), perStratum = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // a different salt resamples
    val c = CorpusPipeline.stratifiedSample(docs, perStratum = 7, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != c)
    // a stratum smaller than n keeps everything
    val small = CorpusPipeline.stratifiedSample(docs.limit(3), perStratum = 7)
    assert(small.count() == 3)
  }

  test("cluster-aware split: near-dups never straddle a boundary; degrades to per-doc for singletons") {
    val doc = "the quick brown fox jumps over the lazy dog and runs far away today"
    val near = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val corpus = Seq(
      (1L, doc), (2L, doc), (3L, near),
      (4L, "completely different content about spark engines and shuffles here")
    ).toDF("doc_id", "text")
    val s = CorpusPipeline.assignSplitsByCluster(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    // the whole near-dup cluster shares one bucket
    assert(Set(s(1L), s(2L), s(3L)).size == 1, s"cluster split apart: $s")
    // a singleton's bucket equals the per-doc assignment
    val solo = CorpusPipeline.assignSplits(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s(4L)._2 == solo(4L))
    // fixtures: every cluster maps to exactly one split
    val fix = CorpusPipeline.clusterSplitQuery(spark, sf001)
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(fix == 0L)
  }

  test("weighted sample: exact size, weight-biased, deterministic, rank total order") {
    val docs = graft.sources.Tables.load(spark, sf01, "documents")
    val k = 100
    val s = CorpusPipeline.weightedSample(docs, k = k).collect()
    assert(s.length == k)
    val ranks = s.map(_.getAs[Long]("sample_rank")).sorted
    assert(ranks.toSeq == (1L to k.toLong))
    // rank order follows (key_nano desc, doc_id asc)
    val byRank = s.sortBy(_.getAs[Long]("sample_rank"))
      .map(r => (r.getAs[Long]("key_nano"), r.getAs[Long]("doc_id")))
    assert(byRank.sliding(2).forall { case Array((ka, ia), (kb, ib)) =>
      ka > kb || (ka == kb && ia < ib) })
    // repartition-stable membership (a pure function of ids)
    val again = CorpusPipeline.weightedSample(docs.repartition(13), k = k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == s.map(_.getAs[Long]("doc_id")).toSet)
    // the selection is genuinely weight-biased: the sample's mean weight
    // must exceed the corpus mean (n_chars spread is wide enough that an
    // unweighted draw of 100/500 sits below this with overwhelming margin)
    val meanAll = docs.agg(org.apache.spark.sql.functions.avg("n_chars"))
      .head.getDouble(0)
    val meanSample = s.map(_.getAs[Long]("weight").toDouble).sum / k
    assert(meanSample > meanAll,
      s"weighted sample mean $meanSample should exceed corpus mean $meanAll")
  }
}
