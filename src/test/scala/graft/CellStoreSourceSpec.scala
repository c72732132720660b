package graft

import graft.model.CellTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 cell-store source: correctness vs the plain parquet read, region
  * pruning for point/range key predicates, and column pruning. */
class CellStoreSourceSpec extends AnyFunSuite with SparkTestBase {

  private lazy val storePath = {
    val dir = java.nio.file.Files.createTempDirectory("cellstore").toString
    val cells = CellTable.fromTable(spark, sf001, "customer")
    CellTable.writeRegionLayout(cells, dir, numRegions = 8)
    dir
  }

  private def store = spark.read.format("cellstore").load(storePath)

  private def key(custkey: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(custkey).array()

  test("full scan equals the plain parquet read, one partition per region") {
    val viaSource = store.select("rowKey", "family", "qualifier", "ts", "cellType", "value")
    val viaParquet = spark.read.parquet(storePath)
      .select("rowKey", "family", "qualifier", "ts", "cellType", "value")
    assert(viaSource.count() == viaParquet.count())
    assert(viaSource.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(viaSource).isEmpty)
    assert(viaSource.rdd.getNumPartitions == 8)
  }

  test("store stats describe files from footers only; summary reads the layout") {
    val cells = CellTable.fromTable(spark, sf001, "customer")
    val stats = graft.operators.StoreStats.describe(spark, storePath).collect()
    assert(stats.length == 8)
    assert(stats.map(_.getAs[Long]("rows")).sum == cells.count())
    assert(stats.forall(r => !r.isNullAt(r.fieldIndex("minKey"))))
    val sum = graft.operators.StoreStats.summary(spark, storePath).collect().head
    assert(sum.getAs[String]("layout") == "range" && sum.getAs[Long]("files") == 8L)

    val saltedDir = java.nio.file.Files.createTempDirectory("stats_salt").toString + "/s"
    cells.write.format("cellstore").option("buckets", "4").mode("overwrite").save(saltedDir)
    val ssum = graft.operators.StoreStats.summary(spark, saltedDir).collect().head
    assert(ssum.getAs[String]("layout") == "salted" && ssum.getAs[Int]("buckets") == 4)
    val sstats = graft.operators.StoreStats.describe(spark, saltedDir).collect()
    assert(sstats.forall(r => !r.isNullAt(r.fieldIndex("bucket"))))
  }

  test("limit pushdown: readers stop early, results stay correct") {
    val limited = store.limit(3)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), s"expected pushed limit in:\n$plan")
    assert(limited.collect().length == 3)
    // limit larger than the store is a no-op
    assert(store.limit(1000000).count() == store.count())
  }

  test("whole-store COUNT/MIN/MAX answer from footers only (agg pushdown)") {
    val cells = CellTable.fromTable(spark, sf001, "customer")
    // count(*) plans the footer-only scan — one partition, no page IO
    val cnt = store.groupBy().count()
    val cntPlan = cnt.queryExecution.executedPlan.toString
    assert(cntPlan.contains("CellStoreAggScan"), s"expected pushed count in:\n$cntPlan")
    assert(cnt.collect().head.getLong(0) == cells.count())
    // min/max of the row key come from key statistics
    val mm = store.agg(min(col("rowKey")).as("lo"), max(col("rowKey")).as("hi"))
    val mmPlan = mm.queryExecution.executedPlan.toString
    assert(mmPlan.contains("CellStoreAggScan"), s"expected pushed min/max in:\n$mmPlan")
    val row = mm.collect().head
    assert(row.getAs[Array[Byte]]("lo").sameElements(key(0L)))
    // a FILTERED count must NOT push (filters stay residual) and stays right
    val filtered = store.filter(col("rowKey") >= lit(key(100L)))
    val fPlan = filtered.groupBy().count().queryExecution.executedPlan.toString
    assert(!fPlan.contains("CellStoreAggScan"), s"filtered agg must not push:\n$fPlan")
    assert(filtered.count() == cells.filter(col("rowKey") >= lit(key(100L))).count())
  }

  test("scan is vectorized: batches decode columnar, count-only scans fall back") {
    val plan = store.select("rowKey", "ts").queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"expected a columnar scan in:\n$plan")
    // values survive the vectorized decode (binary + string + long columns)
    val row = store.filter(col("rowKey") === lit(key(7L)))
      .select(col("qualifier").cast("string"), col("ts")).collect()
    assert(row.length == 4 && row.forall(_.getLong(1) == CellTable.BaseTs))
    // count-only scan (no columns) still answers through the row path
    assert(store.count() == CellTable.fromTable(spark, sf001, "customer").count())
  }

  test("a large region file splits into row-group-aligned chunk partitions") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_split").toString
    val cells = CellTable.fromTable(spark, sf01, "customer")
    // ONE region file, forced into many small row groups
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 16384)
    try cells.coalesce(1)
      .sortWithinPartitions("rowKey", "family", "qualifier", "ts")
      .write.mode("overwrite").parquet(dir)
    finally {
      if (prevBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", prevBlock)
    }
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1)
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head.getPath),
        new org.apache.hadoop.conf.Configuration()))
    val nGroups = try footer.getRowGroups.size() finally footer.close()
    assert(nGroups > 1, s"test setup needs a multi-row-group file, got $nGroups")

    val split = spark.read.format("cellstore")
      .option("splitBytes", "32768").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      s"expected chunked partitions, got ${split.rdd.getNumPartitions}")
    // identical content to the unsplit read, and GET pruning still works
    val whole = spark.read.format("cellstore").load(dir)
    assert(split.count() == cells.count())
    assert(split.exceptAll(whole).isEmpty && whole.exceptAll(split).isEmpty)
    val get = split.filter(col("rowKey") === lit(key(42L)))
    assert(get.count() == 4)
    assert(get.rdd.getNumPartitions < split.rdd.getNumPartitions,
      "key range should prune chunks")
  }

  test("point GET prunes to a single region partition") {
    val get = store.filter(col("rowKey") === lit(key(42L)))
    assert(get.rdd.getNumPartitions == 1)
    val rows = get.collect()
    assert(rows.length == 4) // one cell per non-key customer column
    assert(rows.forall(_.getAs[Array[Byte]]("rowKey").sameElements(key(42L))))
  }

  test("key-range scan reads only overlapping regions and the right rows") {
    val lo = key(10L)
    val hi = key(60L)
    val scan = store.filter(col("rowKey") >= lit(lo) && col("rowKey") < lit(hi))
    val expected = spark.read.parquet(storePath)
      .filter(col("rowKey") >= lit(lo) && col("rowKey") < lit(hi))
    assert(scan.count() == expected.count())
    assert(scan.count() == 50 * 4)
    val pruned = scan.rdd.getNumPartitions
    assert(pruned >= 1 && pruned < 8, s"expected pruning, got $pruned partitions")
  }

  test("multi-range scan (Or of key ranges) prunes the gap between the ranges") {
    def range(lo: Long, hi: Long) =
      col("rowKey") >= lit(key(lo)) && col("rowKey") < lit(key(hi))
    val multi = store.filter(range(10L, 30L) || range(120L, 140L))
    assert(multi.count() == 40 * 4)
    val expected = spark.read.parquet(storePath)
      .filter(range(10L, 30L) || range(120L, 140L))
    assert(multi.exceptAll(expected).isEmpty && expected.exceptAll(multi).isEmpty)
    // the bounds DISJUNCTION skips the gap regions a single conjunctive
    // [10, 140) envelope would read
    val prunedMulti = multi.rdd.getNumPartitions
    val envelope = store.filter(range(10L, 140L)).rdd.getNumPartitions
    assert(prunedMulti < envelope,
      s"Or pruning must beat the envelope: $prunedMulti vs $envelope partitions")
    // an Or with a non-prunable branch cannot prune (that branch could
    // match anywhere) — full scan, rows still correct via residuals
    val opaque = store.filter(range(10L, 30L) ||
      col("value") === lit("BUILDING".getBytes("UTF-8")))
    assert(opaque.rdd.getNumPartitions == 8)
  }

  test("impossible range plans zero partitions") {
    val none = store.filter(col("rowKey") === lit(Array.fill[Byte](8)(-1)))
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0)
  }

  test("column pruning: key-only scan and projected reads are correct") {
    val keysOnly = store.select("rowKey").distinct()
    assert(keysOnly.count() == spark.read.parquet(s"$sf001/customer.parquet").count())
    val proj = store.select("rowKey", "ts").filter(col("rowKey") === lit(key(7L)))
    val rows = proj.collect()
    assert(rows.length == 4 && rows.forall(_.getLong(1) == CellTable.BaseTs))
    // the scan description must reflect the pushdown reaching the source
    val planStr = proj.queryExecution.executedPlan.toString
    assert(planStr.contains("CellStoreScan"), planStr)
  }

  test("DSv2 write: planner-enforced region layout round-trips and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_w").toString
    val cells = CellTable.fromTable(spark, sf001, "customer")
    // the connector declares ordered distribution on rowKey — no manual
    // repartitionByRange/sortWithinPartitions on the caller side
    cells.write.format("cellstore")
      .option("numRegions", "4").mode("append").save(dir)

    val back = spark.read.format("cellstore").load(dir)
    assert(back.count() == cells.count())
    assert(back.rdd.getNumPartitions == 4)
    // region pruning works on the planner-produced layout too
    val get = back.filter(col("rowKey") === lit(key(42L)))
    assert(get.rdd.getNumPartitions == 1)
    assert(get.count() == 4)

    // overwrite replaces the store content
    cells.filter(col("rowKey") === lit(key(7L)))
      .write.format("cellstore").mode("overwrite").save(dir)
    val after = spark.read.format("cellstore").load(dir)
    assert(after.count() == 4)
    assert(after.collect().forall(_.getAs[Array[Byte]]("rowKey").sameElements(key(7L))))
  }

  /** A single-file store with many small row groups where ts (and family)
    * correlate with the rowKey sort order — the time-ordered-ingest shape
    * where version/time-range pruning actually bites. */
  private def timeCorrelatedStore(famSplit: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("cellstore_ts").toString
    val k = CellTable.keyToLong(col("rowKey"))
    var cells = CellTable.fromTable(spark, sf01, "customer")
      .withColumn("ts", lit(CellTable.BaseTs) + k * 1000L)
    if (famSplit)
      cells = cells.withColumn("family",
        when(k < 750L, "fam_a").otherwise("fam_b"))
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 16384)
    try cells.coalesce(1)
      .sortWithinPartitions("rowKey", "family", "qualifier", "ts")
      .write.mode("overwrite").parquet(dir)
    finally {
      if (prevBlock == null) hconf.unset("parquet.block.size")
      else hconf.set("parquet.block.size", prevBlock)
    }
    dir
  }

  test("ts-range pushdown skips row groups outside the time interval") {
    val dir = timeCorrelatedStore(famSplit = false)
    val full = spark.read.format("cellstore").option("splitBytes", "32768").load(dir)
    val hi = CellTable.BaseTs + 100000L // keys <= 100 of 0..1499
    val scan = full.filter(col("ts") <= lit(hi))
    // the ts bound reaches the scan and prunes row-group chunks
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(ts"), s"expected pushed ts bound in:\n$plan")
    assert(full.rdd.getNumPartitions > 1)
    assert(scan.rdd.getNumPartitions < full.rdd.getNumPartitions,
      s"ts filter should prune chunks: ${scan.rdd.getNumPartitions} vs ${full.rdd.getNumPartitions}")
    // and the result is exactly the plain parquet answer
    val expected = spark.read.parquet(dir).filter(col("ts") <= lit(hi))
    assert(scan.count() == expected.count() && scan.count() > 0)
    assert(scan.exceptAll(expected).isEmpty && expected.exceptAll(scan).isEmpty)
    // a ts interval before all data plans zero partitions
    val none = full.filter(col("ts") < lit(CellTable.BaseTs))
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)
  }

  test("family pushdown skips row groups of other families") {
    val dir = timeCorrelatedStore(famSplit = true)
    val full = spark.read.format("cellstore").option("splitBytes", "32768").load(dir)
    val scan = full.filter(col("family") === "fam_b")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(family,fam_b)"), s"expected pushed family in:\n$plan")
    assert(scan.rdd.getNumPartitions < full.rdd.getNumPartitions,
      s"family filter should prune chunks: ${scan.rdd.getNumPartitions} vs ${full.rdd.getNumPartitions}")
    val expected = spark.read.parquet(dir).filter(col("family") === "fam_b")
    assert(scan.count() == expected.count() && scan.count() > 0)
    // IN over families prunes too, and membership stays exact (residual)
    val in = full.filter(col("family").isin("fam_a", "no_such"))
    assert(in.count() == spark.read.parquet(dir).filter(col("family") === "fam_a").count())
    assert(in.rdd.getNumPartitions < full.rdd.getNumPartitions)
    // conjunction: ts AND family compose with rowKey pruning
    val both = full.filter(col("family") === "fam_a" &&
      col("ts") <= lit(CellTable.BaseTs + 100000L))
    val bothExpected = spark.read.parquet(dir).filter(col("family") === "fam_a" &&
      col("ts") <= lit(CellTable.BaseTs + 100000L))
    assert(both.count() == bothExpected.count() && both.count() > 0)
  }

  test("grouped COUNT/MIN/MAX push down as run-length partials") {
    // keyed aggregates answer from the store without decoding value bytes
    val gb = store.groupBy("rowKey")
      .agg(count(lit(1)).as("n_cells"), min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    val plan = gb.queryExecution.executedPlan.toString
    assert(plan.contains("CellStoreGroupByScan"), s"expected pushed group-by in:\n$plan")
    val expected = spark.read.parquet(storePath).groupBy("rowKey")
      .agg(count(lit(1)).as("n_cells"), min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    assert(gb.count() == expected.count())
    assert(gb.exceptAll(expected).isEmpty && expected.exceptAll(gb).isEmpty)
    // non-prefix grouping (family is 2nd in the sort order) is still exact:
    // more partial rows, same final answer
    val byQual = store.groupBy("qualifier").agg(count(lit(1)).as("n"))
    assert(byQual.queryExecution.executedPlan.toString.contains("CellStoreGroupByScan"))
    val byQualExp = spark.read.parquet(storePath).groupBy("qualifier").agg(count(lit(1)).as("n"))
    assert(byQual.exceptAll(byQualExp).isEmpty && byQualExp.exceptAll(byQual).isEmpty)
    // a FILTERED grouped agg must NOT push (filters stay residual)
    val filtered = store.filter(col("rowKey") >= lit(key(100L)))
      .groupBy("rowKey").agg(count(lit(1)).as("n"))
    assert(!filtered.queryExecution.executedPlan.toString.contains("CellStoreGroupByScan"))
    assert(filtered.count() ==
      spark.read.parquet(storePath).filter(col("rowKey") >= lit(key(100L)))
        .select("rowKey").distinct().count())
  }

  test("rowKey blooms: in-range absent GET skips every file; present keys never miss") {
    val dir = java.nio.file.Files.createTempDirectory("bloom_store").toString + "/s"
    // only EVEN custkeys: every odd key is inside the store's [min,max]
    // but absent — the case min/max stats cannot prune and blooms can
    val even = CellTable.fromTable(spark, sf001, "customer")
      .filter(pmod(CellTable.keyToLong(col("rowKey")), lit(2)) === 0)
    even.write.format("cellstore").option("numRegions", "4").mode("overwrite").save(dir)
    // one hidden sidecar per data file, nothing store-wide
    val dataFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName)
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(n => assert(
      new java.io.File(dir, s".$n${graft.sources.CellBloom.BloomSuffix}").exists,
      s"missing bloom sidecar for $n"))

    val st = spark.read.format("cellstore").load(dir)
    val present = st.filter(col("rowKey") === lit(key(42)))
    assert(present.count() > 0, "no false negatives ever")
    val absent = st.filter(col("rowKey") === lit(key(43)))
    assert(absent.rdd.getNumPartitions == 0,
      "bloom must eliminate every file for an in-range absent key")
    assert(absent.count() == 0)

    // append merges entries: the new key becomes visible, old ones stay
    CellTable.fromTable(spark, sf001, "customer")
      .filter(CellTable.keyToLong(col("rowKey")) === 43)
      .write.format("cellstore").mode("append").save(dir)
    val st2 = spark.read.format("cellstore").load(dir)
    assert(st2.filter(col("rowKey") === lit(key(43))).count() > 0)
    assert(st2.filter(col("rowKey") === lit(key(42))).count() > 0)

    // salted layout: partition values stay stable, absent GET reads nothing
    val sdir = java.nio.file.Files.createTempDirectory("bloom_salt").toString + "/s"
    even.write.format("cellstore").option("buckets", "4").mode("overwrite").save(sdir)
    val sst = spark.read.format("cellstore").load(sdir)
    assert(sst.filter(col("rowKey") === lit(key(42))).count() > 0)
    assert(sst.filter(col("rowKey") === lit(key(43))).count() == 0)
  }

  test("bloom sidecars: append commit cost is independent of store file count") {
    val dir = java.nio.file.Files.createTempDirectory("bloom_incr").toString + "/s"
    CellTable.fromTable(spark, sf001, "customer")
      .write.format("cellstore").option("numRegions", "16").mode("overwrite").save(dir)
    def sidecars(): Map[String, Long] = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith(".") &&
        f.getName.endsWith(graft.sources.CellBloom.BloomSuffix))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = sidecars()
    assert(before.size >= 16)
    Thread.sleep(50) // mtime granularity guard
    CellTable.fromTable(spark, sf001, "supplier")
      .write.format("cellstore").mode("append").save(dir)
    val after = sidecars()
    // every pre-existing sidecar untouched — the append wrote only its own
    before.foreach { case (n, t) =>
      assert(after(n) == t, s"append rewrote unrelated bloom sidecar $n") }
    assert(after.size > before.size, "append must add sidecars for its files")

    // truncate clears them all and records only the new files'
    CellTable.fromTable(spark, sf001, "supplier")
      .write.format("cellstore").option("numRegions", "2").mode("overwrite").save(dir)
    val reset = sidecars()
    assert(reset.keySet.intersect(after.keySet).isEmpty,
      "truncate must drop all prior sidecars")
    assert(reset.nonEmpty)
  }

  test("pushed filters stay as residuals: non-key predicates still apply") {
    val out = store
      .filter(col("rowKey") >= lit(key(0L)) && col("qualifier").cast("string") === "c_acctbal")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => new String(r.getAs[Array[Byte]]("qualifier")) == "c_acctbal"))
  }
}
