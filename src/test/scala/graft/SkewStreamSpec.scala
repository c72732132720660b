package graft

import graft.operators.Skew
import graft.streaming.EventMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewStreamSpec extends AnyFunSuite with SparkTestBase {

  test("salted distinct count is exact on a skewed distribution") {
    import spark.implicits._
    // one hot key with many values, many cold keys with few
    val rows = (1 to 5000).map(i => ("hot", s"v${i % 1234}")) ++
      (1 to 500).map(i => (s"cold${i % 50}", s"v${i % 7}"))
    val df = rows.toDF("k", "v")
    val expected = df.groupBy("k").agg(countDistinct("v").as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(df, "k", "v", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == expected)
    assert(salted("hot") == 1234L)
  }

  test("salted join equals the plain join on skewed keys") {
    import spark.implicits._
    val big = ((1 to 4000).map(i => ("hot", i)) ++
      (1 to 400).map(i => (s"k${i % 20}", i))).toDF("k", "x")
    val small = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("k", "x", "tag")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 4)
      .select("k", "x", "tag")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("hot-key corpus: the LSH star guard engages and reports via lsh_skew") {
    // 20% of the corpus is ONE text (the hot-key regime the uniform
    // fixtures never exercise); the rest is unique. The hot bucket
    // exceeds maxBucket -> star pairing, and the observe metric counts
    // the star-routed rows — the audit a production run would alert on.
    val hot = spark.range(2000).select(col("id").as("doc_id"),
      lit("alpha beta gamma delta epsilon zeta").as("text"))
    val uniq = spark.range(2000, 10000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("u"), col("id").cast("string"),
        (col("id") * 7).cast("string"), (col("id") * 13).cast("string"),
        (col("id") * 29).cast("string")).as("text"))
    val pairs = graft.operators.Dedup
      .minhashLsh(hot.unionByName(uniq), maxBucket = 256)
    val collected = pairs.collect()
    // hot docs: exactly the 1999 star edges, all centered on doc 0
    val hotPairs = collected.filter(r => r.getAs[Long]("doc_b") < 2000L)
    assert(hotPairs.length == 1999, s"star edges: ${hotPairs.length}")
    assert(hotPairs.forall(_.getAs[Long]("doc_a") == 0L))
    // the skew metric reports the routed rows (> 0 proves the guard ran)
    val star = pairs.queryExecution.observedMetrics.collectFirst {
      case (name, row) if name.startsWith("lsh_skew") =>
        row.getAs[Long]("star_routed_rows")
    }
    assert(star.exists(_ > 0L), s"lsh_skew metric missing or zero: $star")
  }

  test("AQE splits the skewed partition in a joinAgg-shaped sort-merge join") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      // force a sort-merge join and lower the skew thresholds into test
      // range (defaults are 256 MB — sized for clusters, not specs)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 80% of rows on key 0 with a fat payload -> its partition dwarfs
      // the median; the rest spread over 1000 keys
      val left = spark.range(300000).select(
        when(col("id") % 5 === 0, (col("id") % 1000) + 1).otherwise(0L).as("k"),
        concat(lit("payload-"), col("id").cast("string"),
          lpad(lit("x"), 64, "x")).as("payload"))
      val right = spark.range(0, 1001).select(
        col("id").as("k"), concat(lit("n"), col("id").cast("string")).as("name"))
      val agg = left.join(right, "k").groupBy("name")
        .agg(count(lit(1)).as("n"))
      val rows = agg.collect()
      // correctness first: every left row joins exactly once
      assert(rows.map(_.getAs[Long]("n")).sum == 300000L)
      assert(rows.find(_.getAs[String]("name") == "n0")
        .exists(_.getAs[Long]("n") == 240000L))
      // the adaptive plan must have split the hot partition
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("watermark drops events later than the lateness bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventMonitor.transform(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_test").start()
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    try {
      // batch 1: events up to 12:30 -> watermark advances to 11:30
      input.addData((ts(10, 10), "signup", 1.0), (ts(10, 20), "error", 2.0),
        (ts(12, 30), "purchase", 3.0))
      q.processAllAvailable()
      // batch 2: an event at 09:00 is older than the watermark -> dropped;
      // one at 11:45 is within the bound -> kept
      input.addData((ts(9, 0), "signup", 9.0), (ts(11, 45), "signup", 4.0))
      q.processAllAvailable()
      // batch 3: push the watermark far forward so all windows close/emit
      input.addData((ts(23, 0), "signup", 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("wm_test")
      .select(col("window_start"), col("event_type"), col("n_events"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    // the 10:00 window emitted with its two on-time events
    assert(out(("2024-01-01 10:00:00.0", "signup")) == 1L)
    assert(out(("2024-01-01 10:00:00.0", "error")) == 1L)
    // the late 09:00 event never produced a window
    assert(!out.keys.exists(_._1 == "2024-01-01 09:00:00.0"))
    // the 11:45 event (within the 1h bound when it arrived) was kept
    assert(out(("2024-01-01 11:00:00.0", "signup")) == 1L)
  }
}
