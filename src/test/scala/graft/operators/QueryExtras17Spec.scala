package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 serving additions: the intervals combination guard,
  * multi_match phrase / phrase_prefix / fuzziness, nested documents,
  * completion contexts, normalize / moving-percentiles pipeline
  * aggs. */
class QueryExtras17Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join customer vector extra", "en", "web", 100L),
    (2L, "spark customer vector stream", "en", "book", 250L),
    (3L, "spark join join", "de", "web", 180L),
    (4L, "customer vector join", "en", "web", 120L),
    (5L, "spark vector customer", "fr", "wiki", 400L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("graft-sx17").toString
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") > 3), "b")
    root
  }

  test("intervals combination guard: a pathological high-tf doc " +
    "fails LOUDLY instead of enumerating an unbounded occurrence " +
    "product; normal docs pass under the default cap") {
    val root = Files.createTempDirectory("graft-sx17g").toString
    // doc 1: each query term 150 times interleaved -> product
    // 150^3 ≈ 3.4e6 combinations, over the 2^20 default cap but
    // cheap enough for the opt-in check below; doc 2 is benign
    val evil = ("a b c " * 150).trim
    SegmentedIndex.append(spark, root,
      Seq((1L, evil), (2L, "a b c a")).toDF("doc_id", "text"),
      "a", nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      SegmentedIndex.intervalsSearch(spark, root,
        Seq("a", "b", "c"), maxGaps = 10, k = 10)
    }
    assert(e.getMessage.contains("occurrence combinations") &&
      e.getMessage.contains("doc 1"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SegmentedIndex.intervalsQuery(spark, root,
        SegmentedIndex.IMatch(Seq("a", "b", "c"), maxGaps = 10),
        k = 10)
    }
    assert(e2.getMessage.contains("cap"), e2.getMessage)
    // an explicit cap raise lets the caller opt in
    val ok = SegmentedIndex.intervalsQuery(spark, root,
      SegmentedIndex.IMatch(Seq("a", "b", "c"), maxGaps = 10),
      k = 10, maxCombinationsPerDoc = 1L << 30)
    assert(ok.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L))
    // benign corpora are untouched: the guard passes and results
    // match the pre-guard convention (q280/q289/q306's oracles)
    val benign = freshIndex()
    val out = SegmentedIndex.intervalsSearch(spark, benign,
      Seq("spark", "vector"), maxGaps = 5, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
  }
}
