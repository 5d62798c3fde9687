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

  // ---- multi_match phrase / phrase_prefix / fuzziness ----

  private def metaIndex(): String = {
    val root = Files.createTempDirectory("graft-sx17m").toString
    val meta = corpus.withColumn("text",
      concat_ws(" ", col("source"), col("lang")))
    SegmentedIndex.append(spark, root,
      meta.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      meta.filter(col("doc_id") > 3), "b")
    root
  }

  test("multiMatchPhraseSearch: per-field exact phrase statistics, " +
    "dis_max fold; phrase_prefix expands the last word per field") {
    val fields = Seq("text" -> freshIndex(), "meta" -> metaIndex())
    // "customer vector" adjacent: docs 1, 2, 4 (text); meta never
    val out = SegmentedIndex.multiMatchPhraseSearch(spark, fields,
      Seq("customer", "vector"), "phrase", tieBreaker = 0.5, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // pseudo-term stats: N=5, df_phrase=3 -> each occurrence 5/3
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == ((5.0 / 3, 1L)))
    // phrase_prefix: "web e*" on meta -> docs with source web AND
    // lang starting 'e' (1: web/en, 4: web/en; 3 is web/de)
    val pp = SegmentedIndex.multiMatchPhraseSearch(spark, fields,
      Seq("web", "e"), "phrase_prefix", tieBreaker = 0.5, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(pp == Set(1L, 4L))
    intercept[IllegalArgumentException] {
      SegmentedIndex.multiMatchPhraseSearch(spark, fields,
        Seq("only"), "phrase", 0.0, 10)
    }
    intercept[IllegalArgumentException] {
      SegmentedIndex.multiMatchPhraseSearch(spark, fields,
        Seq("a", "b"), "cross_phrase", 0.0, 10)
    }
  }

  test("matchFuzzySearch: SymSpell-blocked expansions, per-pair " +
    "exact sums; a term reached by two query terms counts per " +
    "pair; multi-field fuzziness dis_maxes per-field scores") {
    val fields = Seq("text" -> freshIndex(), "meta" -> metaIndex())
    val out = SegmentedIndex.matchFuzzySearch(spark, fields.head._2,
      Seq("vektor", "joim"), maxDist = 1, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // vektor->vector (df 4), joim->join (df 3); doc1 has both,
    // doc3 has join twice (tf 2)
    assert(out(1L) == ((5.0 / 3 + 5.0 / 4, 2L)))
    assert(out(3L) == ((2 * (5.0 / 3), 1L)))
    assert(!out.contains(99L))
    // two query terms hitting the SAME expansion: both pairs add
    val dup = SegmentedIndex.matchFuzzySearch(spark, fields.head._2,
      Seq("joim", "joiz"), maxDist = 1, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(dup(3L) == ((2 * (5.0 / 3) + 2 * (5.0 / 3), 2L)))
    // multi-field: wikj~1 -> wiki in meta only; vektor in text only
    val mm = SegmentedIndex.multiMatchFuzzySearch(spark, fields,
      Seq("vektor", "wikj"), maxDist = 1, tieBreaker = 0.5, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc5: vector (text, 5/4) + wiki (meta, 5/1): dis_max =
    // 5.0 + 0.5 * ((5/4 + 5) - 5)
    val st = 5.0 / 4; val sm = 5.0
    assert(mm(5L) == ((sm + 0.5 * ((st + sm) - sm), 2L)))
    assert(mm(1L) == ((st, 1L))) // text only
  }

  // ---- wave 2: rate / other_bucket / metric order / vwh ----

  test("dateHistogramRate: the divisor is the EXACT day count of " +
    "each calendar bucket (Feb != Jan); gap buckets rate 0") {
    val evts = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-02-05 00:00:00")),
      (4L, java.sql.Timestamp.valueOf("2024-04-01 00:00:00")))
      .toDF("id", "t")
    val out = TimeOps.dateHistogramRate(evts, "t", "month")
      .select("doc_count", "bucket_days", "rate_per_day")
      .as[(Long, Long, Double)].collect().toSeq
    // 2024: Jan 31, Feb 29 (leap), Mar 31 (gap), Apr 30
    assert(out == Seq((2L, 31L, 2.0 / 31), (1L, 29L, 1.0 / 29),
      (0L, 31L, 0.0), (1L, 30L, 1.0 / 30)))
    intercept[IllegalArgumentException] {
      TimeOps.dateHistogramRate(evts, "t", "hour")
    }
  }

  test("filtersFacet other_bucket: docs matching NO filter count " +
    "under '_other_'; the reserved key is refused as a name") {
    val root = freshIndex()
    val out = SegmentedIndex.filtersFacet(spark, root,
      Seq("sparky" -> Seq("spark"), "none" -> Seq("zz-absent")),
      otherBucket = true)
      .as[(String, Long)].collect().toMap
    // corpus: 5 docs; spark docs 1,2,3,5 -> other = doc 4
    assert(out == Map("sparky" -> 4L, "none" -> 0L, "_other_" -> 1L))
    intercept[IllegalArgumentException] {
      SegmentedIndex.filtersFacet(spark, root,
        Seq("_other_" -> Seq("spark")), otherBucket = true)
    }
  }

  test("facetStats orderMetric: buckets rank by the chosen sub-agg " +
    "metric instead of doc_count; unknown metrics refused") {
    val root = freshIndex()
    // spark hits 1,2,3,5: web(100,180) book(250) wiki(400)
    val byAvg = SegmentedIndex.facetStats(spark, root, Seq("spark"),
      "source", "n_chars", 10, orderMetric = "vavg")
      .select("value").as[String].collect().toSeq
    assert(byAvg == Seq("wiki", "book", "web"))
    val byMinAsc = SegmentedIndex.facetStats(spark, root,
      Seq("spark"), "source", "n_chars", 10,
      orderMetric = "vmin", orderAsc = true)
      .select("value").as[String].collect().toSeq
    assert(byMinAsc == Seq("web", "book", "wiki"))
    intercept[IllegalArgumentException] {
      SegmentedIndex.facetStats(spark, root, Seq("spark"),
        "source", "n_chars", 10, orderMetric = "median")
    }
  }

  test("variableWidthHistogramFacet: exact equal-frequency split by " +
    "distinct value, ties stay whole, DECIMAL centroids") {
    val root = Files.createTempDirectory("graft-vwh").toString
    // values: 1,1,1,2,3,4 (6 rows) into 3 buckets: cum_before of
    // 1->0, 2->3, 3->4, 4->5; bkey = cum*3 div 6 -> 1:0, 2:1, 3:2, 4:2
    SegmentedIndex.append(spark, root,
      Seq((1L, "x", 1L), (2L, "x", 1L), (3L, "x", 1L), (4L, "x", 2L),
        (5L, "x", 3L), (6L, "x", 4L)).toDF("doc_id", "text", "v"),
      "a", nBuckets = 4)
    val out = SegmentedIndex.variableWidthHistogramFacet(spark, root,
      Seq("x"), "v", buckets = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 1L, 1L, 1.0),
      (1L, 1L, 2L, 2L, 2.0),
      (2L, 2L, 3L, 4L, 3.5)))
  }

  // ---- wave 4: filtered aliases / terms partition paging ----

  test("filtered alias: searches through the alias apply the filter " +
    "BEFORE the top-k; plain aliases stay unfiltered; malformed " +
    "filters refused") {
    val root = freshIndex()
    val alias = Files.createTempDirectory("graft-fa")
      .resolve("read-alias").toString
    SegmentedIndex.setAliasFiltered(alias, root, "lang", "en")
    val out = SegmentedIndex.searchAlias(spark, alias,
      Seq("spark"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    // spark docs 1,2,3,5; en docs 1,2,4 -> 1,2
    assert(out == Set(1L, 2L))
    assert(SegmentedIndex.aliasFilterOf(alias) ==
      Some(("lang", "en")))
    // k applies after the filter: k=1 returns the best EN hit, not
    // an empty page because a non-en doc took the slot
    assert(SegmentedIndex.searchAlias(spark, alias, Seq("spark"), 1)
      .count() == 1L)
    // a plain alias to the same root sees everything
    val plain = Files.createTempDirectory("graft-fa2")
      .resolve("plain-alias").toString
    SegmentedIndex.setAlias(plain, root)
    assert(SegmentedIndex.aliasFilterOf(plain).isEmpty)
    assert(SegmentedIndex.searchAlias(spark, plain,
      Seq("spark"), 10).count() == 4L)
    intercept[IllegalArgumentException] {
      SegmentedIndex.setAliasFiltered(alias, root, "bad field", "x")
    }
    intercept[IllegalArgumentException] {
      SegmentedIndex.setAliasFiltered(alias, root, "lang", "a=b")
    }
  }

  test("terms partition paging: partitions are disjoint and their " +
    "union is the full terms agg; bounds refused") {
    val root = freshIndex()
    val full = SegmentedIndex.facet(spark, root, Seq("spark"),
      "source", 100)
      .as[(String, Long)].collect().toMap
    val parts = (0 until 3).map { p =>
      SegmentedIndex.facetPartition(spark, root, Seq("spark"),
        "source", numPartitions = 3, partition = p, kBuckets = 100)
        .as[(String, Long)].collect().toMap
    }
    // pairwise disjoint (sizes add up) and the union reconstructs
    // the full agg exactly
    assert(parts.map(_.size).sum == full.size)
    assert(parts.reduce(_ ++ _) == full)
    intercept[IllegalArgumentException] {
      SegmentedIndex.facetPartition(spark, root, Seq("spark"),
        "source", 3, 3, 10)
    }
    intercept[IllegalArgumentException] {
      SegmentedIndex.facetPartition(spark, root, Seq("spark"),
        "source", 257, 0, 10)
    }
  }

  test("fetchFields: id-pushed live read projected to the requested " +
    "columns; doc_id always returned, requesting it refused") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(2L).toDF("doc_id"), "d1")
    val out = SegmentedIndex.fetchFields(spark, root,
      Seq(1L, 2L, 4L, 99L), Seq("lang", "n_chars"))
      .as[(Long, String, Long)].collect().toSeq
    // 2 tombstoned, 99 absent
    assert(out == Seq((1L, "en", 100L), (4L, "en", 120L)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.fetchFields(spark, root, Seq(1L),
        Seq("doc_id", "lang"))
    }
  }

  test("termSuggest suggest_mode: missing returns nothing for a " +
    "KNOWN term; popular keeps only more-frequent candidates") {
    val root = Files.createTempDirectory("graft-sm").toString
    // 'grey' df 1; 'gray' df 3 — one edit apart
    SegmentedIndex.append(spark, root, Seq(
      (1L, "grey gray"), (2L, "gray"), (3L, "gray"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    // missing + present input -> empty (ES's default mode rule)
    assert(SegmentedIndex.termSuggest(spark, root, "grey", 5,
      maxDist = 1, suggestMode = "missing").count() == 0L)
    // missing + absent input -> suggests normally
    val abs = SegmentedIndex.termSuggest(spark, root, "grei", 5,
      maxDist = 1, suggestMode = "missing")
      .select("term").as[String].collect().toSet
    assert(abs == Set("grey"))
    // popular: only candidates with df > df(input)
    val pop = SegmentedIndex.termSuggest(spark, root, "grey", 5,
      maxDist = 1, suggestMode = "popular")
      .as[(String, Long, Long)].collect().toSeq
    assert(pop == Seq(("gray", 1L, 3L)))
    // always keeps the identity candidate too
    val always = SegmentedIndex.termSuggest(spark, root, "grey", 5,
      maxDist = 1, suggestMode = "always")
      .select("term").as[String].collect().toSet
    assert(always == Set("grey", "gray"))
    intercept[IllegalArgumentException] {
      SegmentedIndex.termSuggest(spark, root, "grey", 5,
        suggestMode = "sometimes")
    }
  }

  test("boolSearch minimum_should_match: candidates need >= N " +
    "distinct should terms; an unreachable bound matches nothing") {
    val root = freshIndex()
    // should = spark, join, customer: doc1 has all 3; doc2 spark+
    // customer; doc3 spark+join; doc4 join+customer; doc5 spark+cust
    val two = SegmentedIndex.boolSearch(spark, root, Seq.empty,
      should = Seq("spark", "join", "customer"), k = 10,
      minimumShouldMatch = Some(2))
      .select("doc_id").as[Long].collect().toSet
    assert(two == Set(1L, 2L, 3L, 4L, 5L))
    val three = SegmentedIndex.boolSearch(spark, root, Seq.empty,
      should = Seq("spark", "join", "customer"), k = 10,
      minimumShouldMatch = Some(3))
      .select("doc_id").as[Long].collect().toSet
    assert(three == Set(1L))
    // beside a must, the bound binds the should side too
    val mustPlus = SegmentedIndex.boolSearch(spark, root,
      must = Seq("vector"), should = Seq("join", "extra"), k = 10,
      minimumShouldMatch = Some(2))
      .select("doc_id").as[Long].collect().toSet
    assert(mustPlus == Set(1L)) // vector + (join AND extra): doc1
    // unreachable bound: nothing (Lucene's unsatisfiable bool)
    assert(SegmentedIndex.boolSearch(spark, root, Seq.empty,
      should = Seq("spark"), k = 10,
      minimumShouldMatch = Some(4)).count() == 0L)
    intercept[IllegalArgumentException] {
      SegmentedIndex.boolSearch(spark, root, Seq.empty,
        should = Seq("spark"), k = 10,
        minimumShouldMatch = Some(0))
    }
  }

  test("chunkDocuments: overlapping windows at the pinned stride " +
    "convention, trailing chunk shorter, empty-ish docs one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),
      (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(docs, windowTokens = 4,
      strideTokens = 2).orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(c => (c._2, c._3)) ==
      Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 2L)))
    assert(out.filter(_._1 == 1L).head._4 == "t1 t2 t3 t4")
    assert(out.filter(_._1 == 1L)(1)._4 == "t3 t4 t5 t6")
    assert(out.filter(_._1 == 2L).map(_._4) == Seq("a b c", "c"))
    assert(out.filter(_._1 == 3L).map(_._4) == Seq("solo"))
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(docs, 4, 5)
    }
  }

  test("facetInclude: whole-key-anchored include/exclude patterns " +
    "filter bucket keys before the top-k") {
    val root = freshIndex()
    // spark hits 1,2,3,5 -> sources web(1,3) book(2) wiki(5)
    val inc = SegmentedIndex.facetInclude(spark, root, Seq("spark"),
      "source", include = Some("w.*"), exclude = None, kBuckets = 10)
      .as[(String, Long)].collect().toMap
    assert(inc == Map("web" -> 2L, "wiki" -> 1L))
    val exc = SegmentedIndex.facetInclude(spark, root, Seq("spark"),
      "source", include = None, exclude = Some("w.*|book"),
      kBuckets = 10)
    assert(exc.count() == 0L)
    // whole-key anchor: 'eb' must NOT find-anywhere-match 'web'
    val anchored = SegmentedIndex.facetInclude(spark, root,
      Seq("spark"), "source", Some("eb"), None, 10)
    assert(anchored.count() == 0L)
    intercept[IllegalArgumentException] {
      SegmentedIndex.facetInclude(spark, root, Seq("spark"),
        "source", None, None, 10)
    }
  }

  test("filteredTopK minSimilarity: candidates below the cosine " +
    "floor leave before the rank window (sparse results)") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0L),
      (10L, Array(1.0f, 0.1f), 2L),   // cos ~ 0.995
      (11L, Array(0.0f, 1.0f), 2L),   // cos = 0
      (12L, Array(-1.0f, 0.0f), 2L))  // cos = -1
      .toDF("vec_id", "embedding", "label")
    val all = Similarity.filteredTopK(emb, "vec_id = 1", "label = 2",
      k = 5, dim = 2)
    assert(all.count() == 3L)
    val cut = Similarity.filteredTopK(emb, "vec_id = 1", "label = 2",
      k = 5, dim = 2, minSimilarity = 0.5)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(cut == Seq(10L))
    // ranks are dense WITHIN the gated set (the floor applies
    // before the window)
    val ranked = Similarity.filteredTopK(emb, "vec_id = 1",
      "label = 2", k = 5, dim = 2, minSimilarity = -0.5)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSeq
    assert(ranked == Seq((10L, 1L), (11L, 2L)))
  }

  // ---- wave 3: categorize_text / random_sampler / funnel ----

  test("categorizeTextFacet: (token count, first token) anchor, " +
    "per-position agreement, '*' generalization — deterministic") {
    val root = Files.createTempDirectory("graft-cat").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "conn to hostA failed"), (2L, "conn to hostB failed"),
      (3L, "conn to hostA failed"), (4L, "restart ok"),
      (5L, "conn reset"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    val out = SegmentedIndex.categorizeTextFacet(spark, root,
      Seq("conn", "restart"), k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(
      ("conn to * failed", 3L),
      ("conn reset", 1L),
      ("restart ok", 1L)))
  }

  test("randomSamplerFacet: seeded Knuth inclusion is deterministic " +
    "and matches the hash computed independently; estimate = n/p") {
    val root = freshIndex()
    val m = 2147483648L
    def knuth(id: Long, seed: Long): Long =
      ((id % m) * 2654435761L + seed) % m
    val p = 0.5
    val thr = (p * m).toLong
    // 'spark' hits docs 1,2,3,5 with n_chars 100,250,180,400
    val expectIds = Seq(1L, 2L, 3L, 5L)
      .filter(id => knuth(id, 3L) < thr)
    val out = SegmentedIndex.randomSamplerFacet(spark, root,
      Seq("spark"), "n_chars", probability = p, seed = 3L)
      .as[(Long, Double, Long, Long, Long)].collect().head
    assert(out._1 == expectIds.size.toLong)
    assert(out._2 == expectIds.size.toDouble / p)
    val vals = Map(1L -> 100L, 2L -> 250L, 3L -> 180L, 5L -> 400L)
    if (expectIds.nonEmpty) {
      assert(out._3 == expectIds.map(vals).min)
      assert(out._4 == expectIds.map(vals).max)
      assert(out._5 == expectIds.map(vals).sum)
    }
    // p = 1 keeps everything (the determinism sanity bound)
    val all = SegmentedIndex.randomSamplerFacet(spark, root,
      Seq("spark"), "n_chars", 1.0, 3L)
      .select("n_sampled").as[Long].collect().head
    assert(all == 4L)
  }

  test("funnel: ordered anchors — pre-anchor events don't count, " +
    "the whole-funnel window bounds later stages, conversions " +
    "divide exactly") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: clean signup -> purchase -> refund chain
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "purchase", ts("2024-01-03 00:00:00")),
      (1L, "refund", ts("2024-01-05 00:00:00")),
      // u2: purchase BEFORE signup — must not convert
      (2L, "purchase", ts("2024-01-01 00:00:00")),
      (2L, "signup", ts("2024-01-02 00:00:00")),
      // u3: purchase outside the 7-day whole-funnel window
      (3L, "signup", ts("2024-01-01 00:00:00")),
      (3L, "purchase", ts("2024-01-20 00:00:00")),
      // u4: signup only
      (4L, "signup", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "t")
    val out = TimeOps.funnel(ev, "user_id", "event_type", "t",
      Seq("signup", "purchase", "refund"), windowSec = 7L * 86400L)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (0L, "signup", 4L, 1.0),
      (1L, "purchase", 1L, 0.25),
      (2L, "refund", 1L, 0.25)))
    intercept[IllegalArgumentException] {
      TimeOps.funnel(ev, "user_id", "event_type", "t",
        Seq("signup"), 10L)
    }
  }

  // ---- nested documents ----

  /** Parent family: 3 parents. Nested family: per-parent
    * sub-documents with (author, body) chosen so cross-sub-object
    * combinations exist — the block-isolation trap. */
  private def nestedFixture(): (String, String) = {
    val pRoot = Files.createTempDirectory("graft-nd-p").toString
    SegmentedIndex.append(spark, pRoot, Seq(
      (1L, "parent one"), (2L, "parent two"), (3L, "parent three"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    val nRoot = Files.createTempDirectory("graft-nd-n").toString
    SegmentedIndex.append(spark, nRoot, Seq(
      // parent 1: alice says spark, bob says join — the trap:
      // (author=alice AND body:join) must NOT match parent 1
      (10L, 1L, 0L, "alice", "spark vector"),
      (11L, 1L, 1L, "bob", "join stream"),
      // parent 2: alice says join — the true match
      (20L, 2L, 0L, "alice", "join batch"),
      // parent 3: bob says join (wrong author)
      (30L, 3L, 0L, "bob", "join join"))
      .toDF("doc_id", "parent_id", "ord", "author", "text"),
      "a", nBuckets = 4)
    (pRoot, nRoot)
  }

  test("nested query: BLOCK ISOLATION — field A of one sub-object " +
    "plus field B of another must NOT match; one sub-object " +
    "holding both does") {
    val (pRoot, nRoot) = nestedFixture()
    val out = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), storedEq = Some(("author", "alice")),
      scoreMode = "max", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // parent 1 has alice (sub 0) and join (sub 1) in DIFFERENT
    // sub-objects -> excluded; parent 2's single sub holds both;
    // parent 3's join is bob's
    assert(out.map(_._1) == Seq(2L))
    assert(out.head._3 == 1L)
    // without the author filter, join matches parents 1, 2, 3
    val all = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), None, "none", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L))
    // score_mode none zeroes scores; max hands the best sub's score
    val none = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), None, "none", 10)
      .select("score").as[Double].collect().toSet
    assert(none == Set(0.0))
    // parent 3's doubled join outranks singles under max: tf 2
    val ranked = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), None, "max", 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(ranked.head._1 == 3L)
  }

  test("nested query: a dead parent cannot be resurrected by a " +
    "live nested block, and a tombstoned block stops matching") {
    val (pRoot, nRoot) = nestedFixture()
    // tombstone parent 2 in the PARENT family only (a stale nested
    // block survives until merge — Lucene's window)
    SegmentedIndex.delete(spark, pRoot,
      Seq(2L).toDF("doc_id"), "d1")
    val out = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), Some(("author", "alice")), "max", 10)
    assert(out.count() == 0L)
    // tombstone parent 1's BLOCK in the nested family (the block
    // delete): its sub-documents stop matching
    SegmentedIndex.delete(spark, nRoot,
      Seq(10L, 11L).toDF("doc_id"), "d2")
    val rest = SegmentedIndex.nestedQuery(spark, nRoot, pRoot,
      Seq("join"), None, "none", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(rest == Set(3L))
  }

  // ---- completion contexts ----

  test("completion contexts: the suggest filters on the context " +
    "value in the pruned slice; cross-segment max-weight dedup and " +
    "tombstones hold; a context query on a context-less mapping " +
    "errors loudly") {
    val root = Files.createTempDirectory("graft-cctx").toString
    def batch(rows: Seq[(Long, String, Long, String)]) =
      rows.toDF("doc_id", "sug", "w", "lang")
        .withColumn("text", lit("x"))
    SegmentedIndex.append(spark, root,
      batch(Seq((1L, "apple", 10L, "en"), (2L, "apple", 30L, "de"),
        (3L, "apricot", 20L, "en"))),
      "a", nBuckets = 4,
      completionField = Some(("sug", "w")),
      completionContext = Some("lang"))
    SegmentedIndex.append(spark, root,
      batch(Seq((4L, "apple", 50L, "en"))), "b")
    assert(SegmentedIndex.completionContextOf(root) == Some("lang"))
    val en = SegmentedIndex.completionFieldSuggest(spark, root,
      "sug", "w", "ap", 10, context = Some("en"))
      .as[(String, Long)].collect().toSeq
    // apple's en max spans segments (10 in a, 50 in b); de's 30
    // must not leak in
    assert(en == Seq(("apple", 50L), ("apricot", 20L)))
    val de = SegmentedIndex.completionFieldSuggest(spark, root,
      "sug", "w", "ap", 10, context = Some("de"))
      .as[(String, Long)].collect().toSeq
    assert(de == Seq(("apple", 30L)))
    // unfiltered keeps the global max-weight dedup
    val all = SegmentedIndex.completionFieldSuggest(spark, root,
      "sug", "w", "ap", 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("apple", 50L), ("apricot", 20L)))
    // tombstoning the en top drops it from the en context exactly
    SegmentedIndex.delete(spark, root, Seq(4L).toDF("doc_id"), "d1")
    val en2 = SegmentedIndex.completionFieldSuggest(spark, root,
      "sug", "w", "ap", 10, context = Some("en"))
      .as[(String, Long)].collect().toSeq
    assert(en2 == Seq(("apricot", 20L), ("apple", 10L)))
    // a context-less mapping rejects context queries (ES's rule),
    // while unfiltered suggests keep working (old-layout artifacts)
    val root2 = Files.createTempDirectory("graft-cctx2").toString
    SegmentedIndex.append(spark, root2,
      batch(Seq((1L, "apple", 10L, "en"))), "a", nBuckets = 4,
      completionField = Some(("sug", "w")))
    intercept[IllegalArgumentException] {
      SegmentedIndex.completionFieldSuggest(spark, root2,
        "sug", "w", "ap", 10, context = Some("en"))
    }
    assert(SegmentedIndex.completionFieldSuggest(spark, root2,
      "sug", "w", "ap", 10).count() == 1L)
  }

  // ---- normalize / moving_percentiles pipeline aggs ----

  test("normalizeFacet: percent_of_sum divides by the series sum, " +
    "rescale_0_1 by the range, a constant series rescales to 0; " +
    "movingPercentilesFacet interpolates exactly per window") {
    val root = freshIndex()
    // 'spark' hits docs 1,2,3,5 -> n_chars 100,250,180,400 ->
    // buckets 100:2, 200:1, 300:0, 400:1
    val pos = SegmentedIndex.normalizeFacet(spark, root,
      Seq("spark"), "n_chars", 100L, "percent_of_sum")
      .as[(Long, Long, Double)].collect().toSeq
    assert(pos == Seq((100L, 2L, 0.5), (200L, 1L, 0.25),
      (300L, 0L, 0.0), (400L, 1L, 0.25)))
    val rs = SegmentedIndex.normalizeFacet(spark, root,
      Seq("spark"), "n_chars", 100L, "rescale_0_1")
      .as[(Long, Long, Double)].collect().toSeq
    assert(rs == Seq((100L, 2L, 1.0), (200L, 1L, 0.5),
      (300L, 0L, 0.0), (400L, 1L, 0.5)))
    // constant series (one bucket): rescale pins 0.0
    val const = SegmentedIndex.normalizeFacet(spark, root,
      Seq("extra"), "n_chars", 1000L, "rescale_0_1")
      .as[(Long, Long, Double)].collect().toSeq
    assert(const == Seq((0L, 1L, 0.0)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.normalizeFacet(spark, root, Seq("spark"),
        "n_chars", 100L, "softmax")
    }
    // moving median, window 3, over [2,1,0,1]: n=1 -> 2; n=2 ->
    // 1 + (2-1)·0.5; n=3 -> middle
    val mp = SegmentedIndex.movingPercentilesFacet(spark, root,
      Seq("spark"), "n_chars", 100L, window = 3, percent = 50.0)
      .as[(Long, Long, Double)].collect().toSeq
    assert(mp == Seq((100L, 2L, 2.0), (200L, 1L, 1.5),
      (300L, 0L, 1.0), (400L, 1L, 1.0)))
  }

  test("nested inner_hits name the matched sub-objects; the nested " +
    "facet buckets sub-documents of matching parents") {
    val (pRoot, nRoot) = nestedFixture()
    val ih = SegmentedIndex.nestedInnerHits(spark, nRoot, pRoot,
      Seq("join"), None, k = 10)
      .select("doc_id", "ord").as[(Long, Long)].collect().toSeq
    // parent 3's sub 0 (tf 2) ranks first, then singles
    assert(ih.head == ((3L, 0L)))
    assert(ih.toSet == Set((1L, 1L), (2L, 0L), (3L, 0L)))
    // facet: parents matching 'parent' (all three) -> authors of
    // their live sub-documents
    val fc = SegmentedIndex.nestedFacet(spark, pRoot, nRoot,
      Seq("parent"), "author", kBuckets = 10)
      .as[(String, Long)].collect().toSeq
    assert(fc == Seq(("alice", 2L), ("bob", 2L)))
    // perParent (ES's inner_hits size): each parent keeps its best
    // N sub-documents before the global top-k — parent 1 matches
    // twice on 'spark OR join'-ish terms, capping to 1 keeps only
    // its best sub-object while other parents are untouched
    val capped = SegmentedIndex.nestedInnerHits(spark, nRoot, pRoot,
      Seq("join", "spark"), None, k = 10, perParent = Some(1))
      .select("doc_id", "ord").as[(Long, Long)].collect().toSet
    assert(capped.count(_._1 == 1L) == 1)
    assert(capped.map(_._1) == Set(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      SegmentedIndex.nestedInnerHits(spark, nRoot, pRoot,
        Seq("join"), None, 10, perParent = Some(0))
    }
  }
}
