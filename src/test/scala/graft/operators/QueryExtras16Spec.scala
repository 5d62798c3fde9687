package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-16 second-wave serving additions: combined_fields,
  * intervals filter rules, terms lookup, rank_feature, script_score,
  * diversified_sampler, cumulative_cardinality, MAD. */
class QueryExtras16Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join customer vector extra", "en", "web", 100L),
    (2L, "spark customer vector stream", "en", "book", 250L),
    (3L, "spark join join", "de", "web", 180L),
    (4L, "customer vector join", "en", "web", 120L),
    (5L, "spark vector customer", "fr", "wiki", 400L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("graft-sx16").toString
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") > 3), "b")
    root
  }

  private def metaIndex(): String = {
    val root = Files.createTempDirectory("graft-sx16m").toString
    val meta = corpus.withColumn("text",
      concat_ws(" ", col("source"), col("lang")))
    SegmentedIndex.append(spark, root,
      meta.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      meta.filter(col("doc_id") > 3), "b")
    root
  }

  test("combinedFieldsSearch: weighted tf combine, synthetic df, " +
    "shared N; fractional weights refused") {
    val fields = Seq(("text", freshIndex(), 1.0),
      ("meta", metaIndex(), 2.0))
    val out = SegmentedIndex.combinedFieldsSearch(spark, fields,
      Seq("spark", "web"), k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // 'spark': text docs {1,2,3,5}, meta none -> df 4;
    // 'web': meta docs {1,3,4}, text none -> df 3, ctf = 2·1
    val ws = 5.0 / 4; val ww = 5.0 / 3
    assert(out(1L) == ((1.0 * ws + 2.0 * ww, 2L)))
    assert(out(2L) == ((1.0 * ws, 1L)))
    assert(out(4L) == ((2.0 * ww, 1L)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.combinedFieldsSearch(spark,
        Seq(("text", fields.head._2, 1.5)), Seq("spark"), 10)
    }
  }

  test("intervalsQuery filter rules: containing keeps intervals " +
    "holding a `by`; not_overlapping anti-joins; unknown rule " +
    "errors") {
    import SegmentedIndex.{IFiltered, IMatch}
    val root = freshIndex()
    // spark..vector chains: doc1 (0,3), doc2 (0,2), doc5 (0,1)
    val containing = SegmentedIndex.intervalsQuery(spark, root,
      IFiltered(IMatch(Seq("spark", "vector"), maxGaps = 5),
        "containing", IMatch(Seq("customer"))), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // doc1 holds customer@2 in (0,3); doc2 customer@1 in (0,2);
    // doc5's (0,1) holds none (customer@2 outside)
    assert(containing == Seq((1L, 1L, 4L), (2L, 1L, 3L)))
    val notOverlapping = SegmentedIndex.intervalsQuery(spark, root,
      IFiltered(IMatch(Seq("customer")), "not_overlapping",
        IMatch(Seq("spark", "vector"), maxGaps = 5)), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // customer occurrences outside every spark..vector interval:
    // doc3/doc4 have no interval at all -> doc4's customer@0 stays;
    // doc5's customer@2 is outside (0,1)
    assert(notOverlapping == Seq((4L, 1L, 1L), (5L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.intervalsQuery(spark, root,
        IFiltered(IMatch(Seq("spark")), "before",
          IMatch(Seq("vector"))), 10).collect()
    }
  }

  test("termsLookupSearch: the lookup doc's value filters the " +
    "corpus; missing lookup doc matches nothing") {
    val root = freshIndex()
    val out = SegmentedIndex.termsLookupSearch(spark, root,
      lookupId = 1L, lookupField = "lang", targetField = "lang",
      k = 10).as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "en"), (2L, "en"), (4L, "en")))
    assert(SegmentedIndex.termsLookupSearch(spark, root,
      99L, "lang", "lang", 10).count() == 0L)
    // a tombstoned lookup doc yields zero terms (ES's rule)
    SegmentedIndex.delete(spark, root, Seq(1L).toDF("doc_id"), "d1")
    assert(SegmentedIndex.termsLookupSearch(spark, root,
      1L, "lang", "lang", 10).count() == 0L)
  }

  test("rankFeatureSearch: saturation bonus, missing feature = no " +
    "bonus") {
    val root = freshIndex()
    val out = SegmentedIndex.rankFeatureSearch(spark, root,
      Seq("stream"), "n_chars", pivot = 250.0, boost = 2.0, k = 10)
      .as[(Long, Double, Double)].collect().toSeq
    // only doc2 (tf 1, df 1): base 5.0; sat = 250/(250+250) = 0.5
    assert(out == Seq((2L, 5.0 + 2.0 * 0.5, 0.5)))
  }

  test("scriptScoreSearch: the expression replaces the score") {
    val root = freshIndex()
    val out = SegmentedIndex.scriptScoreSearch(spark, root,
      Seq("stream"), Seq("n_chars"), "_score + n_chars / 10.0",
      k = 10).as[(Long, Double)].collect().toSeq
    assert(out == Seq((2L, 5.0 + 25.0)))
  }

  test("diversifiedSamplerFacet: at most N per dedup value, pinned " +
    "doc_id order, sub-agg over the sample") {
    val root = freshIndex()
    val out = SegmentedIndex.diversifiedSamplerFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), "lang",
      maxDocsPerValue = 1, "source", 10)
      .as[(String, Long)].collect().toSeq
    // all five docs hit; one per lang: en -> doc1 (web),
    // de -> doc3 (web), fr -> doc5 (wiki)
    assert(out == Seq(("web", 2L), ("wiki", 1L)))
  }

  test("cumulativeCardinalityFacet: values count from their first " +
    "bucket on") {
    val root = freshIndex()
    val out = SegmentedIndex.cumulativeCardinalityFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), "n_chars", 100L,
      "lang").as[(Long, Long, Long)].collect().toSeq
    // buckets: 100 -> docs 1(en),4(en),3(de) n=3 langs{en,de};
    // 200 -> doc2(en) no new; 400 -> doc5(fr) new
    assert(out == Seq((100L, 3L, 2L), (200L, 1L, 2L),
      (400L, 1L, 3L)))
  }

  test("plan audit: multiMatch prunes each family's postings by " +
    "term bucket; rrf windows are TakeOrderedAndProject, no global " +
    "sort") {
    val fields = Seq("text" -> freshIndex(), "meta" -> metaIndex())
    val mm = SegmentedIndex.multiMatchSearch(spark, fields,
      Seq("spark", "web"), "best_fields", 0.3, 10)
    mm.collect() // finalize AQE — the executed plan is the witness
    // formatted explain prints scan details untruncated (the
    // one-line plan string cuts before PartitionFilters)
    val p = mm.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    // both families' scans arrive with the tb partition filter —
    // the planning-time pruning every postings read here rides
    // (single-bucket probes print isnotnull(tb)+EqualTo, multi-
    // bucket ones a bare IN — match the attribute, not the shape)
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("tb#")),
      p.linesIterator.filter(_.contains("PartitionFilters"))
        .mkString("\n"))
    // frames BIGGER than the window: a maxRows-bounded literal
    // frame would let EliminateLimits legally drop the window limit
    val a = spark.range(0, 200).select(col("id").as("doc_id"),
      (col("id") % 97).cast("double").as("score"))
    val b = spark.range(100, 300).select(col("id").as("doc_id"),
      (col("id") % 89).cast("double").as("score"))
    val rr = SegmentedIndex.rrfFusion(spark,
      Seq("a" -> a, "b" -> b), 60, 50, 10)
    rr.collect()
    val rp = rr.queryExecution.executedPlan.toString
    // each retriever's 50-doc window is a TakeOrderedAndProject —
    // top-k selection, never a global sort of the hit set
    assert(rp.contains("TakeOrderedAndProject"), rp.take(900))
  }

  test("intervalsQuery unordered match: any term order, minimal " +
    "window gap budget; duplicate terms refused") {
    import SegmentedIndex.IMatch
    val root = freshIndex()
    // "customer" and "spark" in either order within window 3 (gap 1)
    val out = SegmentedIndex.intervalsQuery(spark, root,
      IMatch(Seq("customer", "spark"), maxGaps = 1, ordered = false),
      k = 10).as[(Long, Long, Long)].collect().toSeq
    // doc2: spark@0 customer@1 (gap 0); doc5: spark@0 … customer@2
    // (gap 1); doc1: spark@0 customer@2 (gap 1); docs 3,4 lack one
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 2L), (5L, 1L, 3L)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.intervalsQuery(spark, root,
        IMatch(Seq("spark", "spark"), 1, ordered = false), 10)
    }
  }

  test("tTestFacet: Welch statistic from exact moments; degenerate " +
    "group yields null") {
    val root = Files.createTempDirectory("graft-tt").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "spark", "en", 100L), (2L, "spark", "en", 200L),
      (3L, "spark", "de", 300L), (4L, "spark", "de", 400L),
      (5L, "spark", "de", 500L), (6L, "spark", "fr", 999L))
      .toDF("doc_id", "text", "lang", "n_chars"), "a", nBuckets = 4)
    val out = SegmentedIndex.tTestFacet(spark, root, Seq("spark"),
      "n_chars", "lang", "en", "de")
      .as[(Long, Long, Double, Double, Double)].collect().head
    // en: n 2, mean 150, var 5000; de: n 3, mean 400, var 10000
    val expected = (150.0 - 400.0) /
      math.sqrt(5000.0 / 2.0 + 10000.0 / 3.0)
    assert(out == ((2L, 3L, 150.0, 400.0, expected)))
    // fr has one value: variance undefined -> null statistic
    val degen = SegmentedIndex.tTestFacet(spark, root, Seq("spark"),
      "n_chars", "lang", "en", "fr").select("t_stat")
      .as[Option[Double]].collect().head
    assert(degen.isEmpty)
  }

  test("boxplotFacet: exact interpolated five-number summary") {
    val root = freshIndex()
    val out = SegmentedIndex.boxplotFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), "n_chars")
      .as[(Long, Double, Double, Double, Double, Double)]
      .collect().head
    // values 100,120,180,250,400: quartile indexes land exactly
    assert(out == ((5L, 100.0, 120.0, 180.0, 250.0, 400.0)))
  }

  test("stringStatsFacet: exact length profile") {
    val root = freshIndex()
    val out = SegmentedIndex.stringStatsFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), "source")
      .as[(Long, Long, Long, Double)].collect().head
    // web(3) book(4) web(3) web(3) wiki(4): avg 17/5
    assert(out == ((5L, 3L, 4L, 17.0 / 5.0)))
  }

  test("runtimeFieldFacet: the query-time expression buckets like a " +
    "mapped field") {
    val root = freshIndex()
    val out = SegmentedIndex.runtimeFieldFacet(spark, root,
      Seq("spark", "join", "vector", "customer"),
      Seq("lang", "n_chars"),
      "concat(lang, '/', CASE WHEN n_chars > 150 THEN 'long' " +
        "ELSE 'short' END)", 10)
      .as[(String, Long)].collect().toSeq
    // docs: 1 en/100, 2 en/250, 3 de/180, 4 en/120, 5 fr/400
    assert(out == Seq(("en/short", 2L), ("de/long", 1L),
      ("en/long", 1L), ("fr/long", 1L)))
  }

  test("rrfFusion: rank-only fusion, 1/(c+rank) per retriever, " +
    "missing docs contribute zero") {
    val a = Seq((1L, 10.0), (2L, 5.0)).toDF("doc_id", "score")
    val b = Seq((2L, 3.0), (3L, 9.0)).toDF("doc_id", "score")
    val out = SegmentedIndex.rrfFusion(spark,
      Seq("a" -> a, "b" -> b), rankConstant = 1, windowSize = 10,
      k = 10).as[(Long, Double, Long)].collect().toSeq
    // ranks: a -> 1:r1, 2:r2; b -> 3:r1, 2:r2
    // doc2: 1/3 + 1/3; doc1: 1/2; doc3: 1/2 (tie -> id order)
    assert(out == Seq(
      (2L, 1.0 / 3 + 1.0 / 3, 2L),
      (1L, 0.5, 1L), (3L, 0.5, 1L)))
    // window bounds the contribution: windowSize 1 keeps only each
    // retriever's best doc — doc2 leaves the result entirely
    val w1 = SegmentedIndex.rrfFusion(spark,
      Seq("a" -> a, "b" -> b), 1, windowSize = 1, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(w1 == Map(1L -> 1L, 3L -> 1L))
  }

  test("linearFusion: minmax within the window, weighted sum, " +
    "degenerate window normalizes to 1") {
    val a = Seq((1L, 10.0), (2L, 5.0)).toDF("doc_id", "score")
    val b = Seq((2L, 3.0), (3L, 9.0)).toDF("doc_id", "score")
    val out = SegmentedIndex.linearFusion(spark,
      Seq(("a", a, 1.0), ("b", b, 1.0)), windowSize = 10, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // a: doc1 -> 1.0, doc2 -> 0.0; b: doc3 -> 1.0, doc2 -> 0.0
    assert(out == Seq((1L, 1.0, 1L), (3L, 1.0, 1L), (2L, 0.0, 2L)))
    val degen = SegmentedIndex.linearFusion(spark,
      Seq(("a", Seq((7L, 4.0), (8L, 4.0)).toDF("doc_id", "score"),
        2.0)), windowSize = 10, k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(degen == Seq((7L, 2.0, 1L), (8L, 2.0, 1L)))
  }

  test("samplerFacet: the pinned id-order sample bounds the " +
    "sub-agg input") {
    val root = freshIndex()
    val out = SegmentedIndex.samplerFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), shardSize = 3,
      "source", 10).as[(String, Long)].collect().toSeq
    // sample = docs 1,2,3 -> web 2, book 1
    assert(out == Seq(("web", 2L), ("book", 1L)))
  }

  test("madFacet: exact interpolated medians; empty hit set reports " +
    "null MAD") {
    val root = freshIndex()
    val out = SegmentedIndex.madFacet(spark, root,
      Seq("spark", "join", "vector", "customer"), "n_chars")
      .as[(Long, Double, Double)].collect().head
    // values: 100,120,180,250,400 -> median 180;
    // |v-180|: 80,60,0,70,220 -> sorted 0,60,70,80,220 -> median 70
    assert(out == ((5L, 180.0, 70.0)))
    val empty = SegmentedIndex.madFacet(spark, root,
      Seq("zzz"), "n_chars")
      .as[(Long, Option[Double], Option[Double])].collect().head
    assert(empty == ((0L, None, None)))
  }
}
