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
