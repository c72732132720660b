package graft

import org.scalatest.funsuite.{AnyFunSuite => NormalizeSuiteBase}

class NormalizeTextSpec extends NormalizeSuiteBase with SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  private def norm(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(graft.functions.NormalizeFunctions.normalize_text(col("t")))
      .head.getString(0)

  test("normalize_text: NFC composes combining marks") {
    assert(norm("café") == "café") // e + ´ -> é
    assert(norm("café") == "café")       // already composed
  }

  test("normalize_text: controls dropped, unicode spaces collapsed, ends trimmed") {
    assert(norm("ab") == "ab")
    assert(norm("  a  b\tc  ") == "a b c")
    assert(norm("a  b") == "a b") // control inside a space run
    assert(norm("​") == "​") // ZWSP is NOT whitespace — content
    assert(norm(" \t\n ") == "")
  }

  test("normalize_text: SQL surface via the registry") {
    graft.functions.GraftFunctionRegistry.registerAll(spark)
    Seq(Tuple1("x  y")).toDF("t").createOrReplaceTempView("norm_in")
    assert(spark.sql("SELECT normalize_text(t) FROM norm_in")
      .head.getString(0) == "x y")
  }
}

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("text stats: pinned example") {
    val df = Seq((1L, "Hello, world 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(df).collect().head
    assert(r.getAs[Long]("n_chars") == 16L)
    assert(r.getAs[Long]("n_ws_tokens") == 3L)
    assert(r.getAs[Long]("n_digits") == 2L)
    assert(r.getAs[Long]("n_punct") == 2L)     // comma and bang; '!' in class
    assert(r.getAs[Long]("n_nonspace_chars") == 14L)
  }

  test("bpe tokens split letter runs, digit runs, punctuation") {
    val toks = Seq((1L, "Hello, world42!")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeTokens(col("text")).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("hello", ",", "world", "42", "!"))
  }

  test("langId votes stopwords: english and spanish sentences classified") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm", "en"),
      (2L, "el gato que vive en la casa es un amigo", "es"),
      (3L, "der hund ist mit den kindern und das ist gut", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "es")
    assert(got(3L) == "de")
  }

  test("quality score stays in [0,1] over the fixture corpus") {
    val bad = TextAnalysis.qualityQuery(spark, sf001)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("repetition stats: looping text flagged, varied text clean, short-doc fallback") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // bigrams: 3x "spam spam"
      (2L, "all these words occur only once here"),
      (3L, "hi")                            // shorter than n -> one whole-doc window
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, n = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("dup_frac"), r.getAs[Double]("top_frac")))).toMap
    assert(got(1L) == ((3L, 1L, 0.666667, 1.0)))
    assert(got(2L) == ((6L, 6L, 0.0, 0.166667)))
    assert(got(3L) == ((1L, 1L, 0.0, 1.0)))

    val kept = TextAnalysis.filterRepetitive(df, n = 2, maxDupFrac = 0.5, maxTopFrac = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L)) // 1 fails dup_frac; 3 fails top_frac (whole-doc window)
  }

  test("bigram LM score: pinned hand-computed probabilities, rare docs rank low") {
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z z"))
      .toDF("doc_id", "text")
    // c12: (a,b)=3 (b,a)=1 (z,z)=1; c1: a=3 b=1 z=1; V=3
    // p(a,b)=4/6, p(b,a)=2/4, p(z,z)=2/4
    val got = TextAnalysis.ngramLmScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_prob")))).toMap
    assert(got(1L) == ((3L, 0.611111)))  // (4/6 + 2/4 + 4/6)/3
    assert(got(2L) == ((1L, 0.666667)))
    assert(got(3L) == ((1L, 0.5)))
    // the common-pattern doc outranks the rare-pattern doc
    assert(got(2L)._2 > got(3L)._2)

    // a single-token doc produces no score row but still widens the vocab
    val withSolo = df.union(Seq((4L, "solo")).toDF("doc_id", "text"))
    val got2 = TextAnalysis.ngramLmScore(withSolo).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_prob")).toMap
    assert(!got2.contains(4L))
    assert(got2(3L) == 0.4) // V=4 now: p(z,z)=2/5
  }

  test("fingerprint: identical texts share sketch; sketch has k entries") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r s t")).toDF("doc_id", "text")
    val rows = TextAnalysis.fingerprint(df, k = 4).collect()
    val sk = rows.map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](2)).toMap
    assert(sk(1L) == sk(2L))
    assert(sk(1L) != sk(3L))
    assert(sk(1L).length == 4)
  }

  test("chunkDocuments: stride coverage, tail chunk, short-doc single chunk") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "u v w x y")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, window = 4, stride = 3).collect()
    val c1 = got.filter(_.getAs[Long]("doc_id") == 1L).sortBy(_.getAs[Long]("chunk_idx"))
    // n=10, W=4, S=3 -> ceil((10-4)/3)+1 = 3 chunks at starts 0,3,6
    assert(c1.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(c1.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L))
    // every token of the source is covered by some chunk
    assert(c1.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet ==
      doc.split(" ").toSet)
    // doc shorter than the window: exactly one whole-doc chunk
    val c2 = got.filter(_.getAs[Long]("doc_id") == 2L)
    assert(c2.length == 1 && c2.head.getAs[String]("chunk_text") == "a b")
    // tail chunk may be short but never starts past the text: n=5 -> 0,3
    val c3 = got.filter(_.getAs[Long]("doc_id") == 3L).sortBy(_.getAs[Long]("chunk_idx"))
    assert(c3.map(_.getAs[String]("chunk_text")).toSeq == Seq("u v w x", "x y"))
  }

  test("winnow: shared run >= w+k-1 tokens shares a fingerprint; disjoint docs don't") {
    // k=3, w=4: the winnowing guarantee covers shared runs of >= 6 tokens
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared nine ten eleven"),
      (3L, "completely different words only here now")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(df, k = 3, w = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("fp")).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // selected fingerprints are a subset of the doc's own gram hashes
    assert(fps(1L).size >= 1 && fps(1L).size <= 9) // <= n-k+1 grams
    // doc shorter than k tokens: one whole-doc-gram fingerprint
    val solo = TextAnalysis.winnow(Seq((9L, "ab cd")).toDF("doc_id", "text")).collect()
    assert(solo.length == 1 && solo.head.getAs[Long]("doc_id") == 9L)
  }

  test("corpusDataCard: buckets partition the corpus, totals add up") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val card = TextAnalysis.corpusDataCard(docs).collect()
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val want = docs.select(sum(size(split(col("text"), "\\s+"))).cast("long"))
      .as[Long].head()
    assert(card.map(_.getAs[Long]("total_ws_tokens")).sum == want)
    assert(card.forall { r =>
      val b = r.getAs[Long]("len_bucket"); b >= 0 && b <= 9
    })
  }

  test("hashed-linear classifier: margin is the ordered weight fold, keep splits corpus") {
    import spark.implicits._
    import graft.functions.{MinHashImpl, SimHashImpl}
    val docs = Seq((0L, "a b c"), (1L, "merge sort window")).toDF("doc_id", "text")
    val got = TextAnalysis.classifyQuality(docs, dim = 4096).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("margin"), r.getAs[Boolean]("keep"))).toMap
    def expected(text: String): Double =
      text.split(" ", -1).foldLeft(0.0) { (acc, t) =>
        val b = java.lang.Math.floorMod(
          SimHashImpl.fnv1a64(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)), 4096L)
        acc + MinHashImpl.mix64(b).toDouble / Long.MaxValue.toDouble
      }
    assert(got(0L)._1 == expected("a b c")) // bit-exact: same fold, same ops
    assert(got(1L)._1 == expected("merge sort window"))
    assert(got.forall { case (_, (m, k)) => k == (m > 0.0) })
    // the stub weights split the fixture corpus nontrivially
    val corpus = TextAnalysis.classifyQuality(
      graft.sources.Tables.load(spark, sf001, "documents"))
    val kept = corpus.filter(col("keep")).count()
    assert(kept > 0 && kept < corpus.count())
  }

  test("ppl buckets: per-language tertiles are balanced and rank by fluency") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val b = TextAnalysis.pplBuckets(docs)
    val sizes = b.groupBy("lang", "ppl_bucket").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every language has all 3 buckets, sizes within 1 of each other
    sizes.keys.map(_._1).toSet.foreach { l: String =>
      val s = (1L to 3L).map(k => sizes.getOrElse((l, k), 0L))
      assert(s.forall(_ > 0), s"lang $l missing a bucket: $s")
      assert(s.max - s.min <= 1, s"lang $l unbalanced: $s")
    }
    // bucket 1 (head) is more fluent than bucket 3 (tail) per language
    val withScore = b.join(TextAnalysis.ngramLmScore(docs), Seq("doc_id"))
    val mean = withScore.groupBy("lang", "ppl_bucket")
      .agg(avg(col("avg_prob")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    mean.keys.map(_._1).toSet.foreach { l: String =>
      assert(mean((l, 1L)) > mean((l, 3L)), s"head must beat tail for $l")
    }
  }

  test("ppl buckets: approx thresholds agree with exact tertiles on most docs") {
    val docs = graft.sources.Tables.load(spark, sf001, "documents")
    val exact = TextAnalysis.pplBuckets(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = TextAnalysis.pplBucketsApprox(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(approx.keySet == exact.keySet)
    assert(approx.values.forall(b => b >= 1L && b <= 3L))
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree.toDouble / exact.size >= 0.9,
      s"approx agreement too low: $agree/${exact.size}")
  }
}
