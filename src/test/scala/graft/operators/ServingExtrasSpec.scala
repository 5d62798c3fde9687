package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 serving-surface additions: simple_query_string,
  * span_near, multi_terms / rare_terms, _update_by_query and the
  * sliced scroll. */
class ServingExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark join customer vector extra", "en", "web"),
    (2L, "spark customer vector stream", "en", "book"),
    (3L, "spark join join", "de", "web"),
    (4L, "customer vector join", "en", "web"),
    (5L, "spark vector customer", "fr", "wiki"))
    .toDF("doc_id", "text", "lang", "source")

  private def freshIndex(): String = {
    val root = Files.createTempDirectory("graft-sx15").toString
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      corpus.filter(col("doc_id") > 3), "b")
    root
  }

  test("parseSqs buckets terms and phrases by prefix; | is decoration") {
    val p = SegmentedIndex.parseSqs("""+a -b "c d" | e +"f g" -"h i"""")
    assert(p.mustTerms == Seq("a") && p.shouldTerms == Seq("e") &&
      p.mustNotTerms == Seq("b"))
    assert(p.shouldPhrases == Seq(Seq("c", "d")) &&
      p.mustPhrases == Seq(Seq("f", "g")) &&
      p.mustNotPhrases == Seq(Seq("h", "i")))
    // lenient: junk input degrades, never throws
    assert(SegmentedIndex.parseSqs("\"unclosed").shouldTerms.nonEmpty ||
      SegmentedIndex.parseSqs("\"unclosed").shouldPhrases.nonEmpty ||
      true)
  }

  test("simpleQueryString: must term + must phrase gate, must_not " +
    "excludes, should terms score") {
    val root = freshIndex()
    val out = SegmentedIndex.simpleQueryString(spark, root,
      "+spark +\"customer vector\" -stream | join", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // doc1: spark + adjacent "customer vector", no stream;
    // doc2 has stream; doc4 lacks spark; doc5's pair is reversed
    assert(out.map(_._1) == Seq(1L))
    // scoring terms (spark, join): N=5, df(spark)=4, df(join)=3
    assert(out.head._2 == 1.0 * (5.0 / 4) + 1.0 * (5.0 / 3))
    assert(out.head._3 == 2L)
  }

  test("simpleQueryString: phrase-only should query matches with " +
    "score zero, id-ordered") {
    val root = freshIndex()
    val out = SegmentedIndex.simpleQueryString(spark, root,
      "\"customer vector\"", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out == Seq((1L, 0.0, 0L), (2L, 0.0, 0L), (4L, 0.0, 0L)))
  }

  test("simpleQueryString: a negation-only query is match_all minus " +
    "the exclusions (ES parity), tombstones respected") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(3L).toDF("doc_id"), "d1")
    val out = SegmentedIndex.simpleQueryString(spark, root,
      "-stream", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // live docs {1,2,4,5} minus stream-doc 2; score 0, id order
    assert(out == Seq((1L, 0.0, 0L), (4L, 0.0, 0L), (5L, 0.0, 0L)))
    // an EMPTY query still matches nothing
    assert(SegmentedIndex.simpleQueryString(spark, root, "  | ",
      k = 10).count() == 0)
  }

  test("simpleQueryString: bare terms OR together (default_operator)") {
    val root = freshIndex()
    val ids = SegmentedIndex.simpleQueryString(spark, root,
      "join stream", k = 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSet
    assert(ids == Set(1L, 2L, 3L, 4L))
  }

  test("spanNearSearch: in-order gap arithmetic, slop bound, span_or " +
    "sides, unordered mode") {
    val root = Files.createTempDirectory("graft-span").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "a x b"), (2L, "b x x a"), (3L, "a b"),
      (4L, "a x x x b"), (5L, "c b"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    def ids(out: org.apache.spark.sql.DataFrame) =
      out.select("doc_id").as[Long].collect().toSeq
    assert(ids(SegmentedIndex.spanNearSearch(spark, root,
      Seq("a"), Seq("b"), slop = 1)) == Seq(1L, 3L))
    assert(ids(SegmentedIndex.spanNearSearch(spark, root,
      Seq("a"), Seq("b"), slop = 3)) == Seq(1L, 3L, 4L))
    assert(ids(SegmentedIndex.spanNearSearch(spark, root,
      Seq("a"), Seq("b"), slop = 2, inOrder = false))
      == Seq(1L, 2L, 3L))
    // span_or on the first side: (a OR c) near b
    assert(ids(SegmentedIndex.spanNearSearch(spark, root,
      Seq("a", "c"), Seq("b"), slop = 0)) == Seq(3L, 5L))
    // n_spans counts pairs, min_gap the tightest one
    val rows = SegmentedIndex.spanNearSearch(spark, root,
      Seq("a"), Seq("b"), slop = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, 1L), (3L, 1L, 0L), (4L, 1L, 3L)))
  }

  test("completionSuggestFuzzy: one edit in the tail matches, the " +
    "first char is exact (prefix_length 1), two edits don't") {
    val root = freshIndex()
    def terms(px: String) =
      SegmentedIndex.completionSuggestFuzzy(spark, root, px, 10)
        .as[(String, Long)].collect().toSeq
    // "vectr": substitution in the tail → vector (df 4: docs 1,2,4,5)
    assert(terms("vectr") == Seq(("vector", 4L)))
    // exact prefixes still match through the same path
    assert(terms("vecto") == Seq(("vector", 4L)))
    // first char wrong → nothing (the edit would sit at position 0)
    assert(terms("xecto").isEmpty)
    // two tail edits → nothing
    assert(terms("vezzr").isEmpty)
  }

  test("collapseInnerHits: heads rank groups, inner lists stay " +
    "group-local and ordered") {
    val root = freshIndex()
    val out = SegmentedIndex.collapseInnerHits(spark, root,
      Seq("spark"), "lang", kGroups = 5, innerN = 2)
      .as[(String, Int, Int, Long, Double)].collect().toSeq
    // spark hits {1,2,3,5}, all score 1.25 → head order by doc_id:
    // en(doc1) < de(doc3) < fr(doc5); en's inner list carries doc2
    assert(out.map(r => (r._1, r._2, r._3, r._4)) == Seq(
      ("en", 1, 1, 1L), ("en", 1, 2, 2L),
      ("de", 2, 1, 3L), ("fr", 3, 1, 5L)))
    assert(out.forall(_._5 == 1.0 * (5.0 / 4)))
  }

  test("spanNotSearch: include occurrences survive unless an " +
    "exclude term sits in the pre/post window") {
    val root = Files.createTempDirectory("graft-sn").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "c t"), (2L, "x t"), (3L, "t"), (4L, "x x t x"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    val strict = SegmentedIndex.spanNotSearch(spark, root,
      Seq("t"), Seq("x"), pre = 1, post = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(strict == Seq((1L, 1L, 1L), (3L, 1L, 0L)))
    // zero windows: only exact overlap kills — nothing overlaps here
    val loose = SegmentedIndex.spanNotSearch(spark, root,
      Seq("t"), Seq("x"), pre = 0, post = 0)
      .as[(Long, Long, Long)].collect().map(_._1).toSeq
    assert(loose == Seq(1L, 2L, 3L, 4L))
  }

  test("intervalsSearch: ordered chains under a TOTAL gap budget, " +
    "chain count and tightest span") {
    val root = Files.createTempDirectory("graft-iv").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "a b c"),          // gaps 0, span 3
      (2L, "a x b x c"),      // gaps 2, span 5
      (3L, "c b a"),          // wrong order
      (4L, "a x x x b c"),    // gaps 3 — over budget 2
      (5L, "a b x c a b c"))  // multiple chains
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    val out = SegmentedIndex.intervalsSearch(spark, root,
      Seq("a", "b", "c"), maxGaps = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // doc5 chains within budget: (a0,b1,c3 g1) (a0,b1,c6 g4✗)
    // (a0,b5,c6 g4✗) (a4,b5,c6 g0) → 2 chains, tightest span 3
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 5L), (5L, 2L, 3L)))
  }

  test("multiTermsFacet: compound keys, count desc then keys asc; " +
    "rareTermsFacet: long tail ascending under the cap") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(5L).toDF("doc_id"), "d1")
    val mt = SegmentedIndex.multiTermsFacet(spark, root,
      Seq("spark", "join", "vector"), Seq("lang", "source"), 10)
      .as[(String, String, Long)].collect().toSeq
    // live hits 1,2,3,4: (en,web)=2, (de,web)=1, (en,book)=1
    assert(mt == Seq(("en", "web", 2L), ("de", "web", 1L),
      ("en", "book", 1L)))
    val rt = SegmentedIndex.rareTermsFacet(spark, root,
      Seq("spark", "join", "vector"), "source", maxDocCount = 1L)
      .as[(String, Long)].collect().toSeq
    // web=3 over the cap; book=1 under; wiki's doc is tombstoned
    assert(rt == Seq(("book", 1L)))
  }

  test("updateByQuery rewrites matched docs as new live versions " +
    "and reports the count; unmatched docs keep their fields") {
    val root = freshIndex()
    val n = SegmentedIndex.updateByQuery(spark, root,
      Seq("stream"), Seq("source" -> "'flagged'"), "u1")
    assert(n == 1L) // only doc2 contains "stream"
    val srcs = SegmentedIndex.facet(spark, root,
      Seq("spark", "join", "vector"), "source", 10)
      .as[(String, Long)].collect().toMap
    // doc2's live version now reads flagged; its old book row is dead
    assert(srcs == Map("web" -> 3L, "flagged" -> 1L, "wiki" -> 1L))
    // text edits re-analyze: append a token, then find it
    val n2 = SegmentedIndex.updateByQuery(spark, root,
      Seq("extra"), Seq("text" -> "concat(text, ' zz')"), "u2")
    assert(n2 == 1L)
    val hits = SegmentedIndex.search(spark, root, Seq("zz"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(hits == Seq(1L))
  }

  test("extendedStatsFacet: exact decimal moments, both variance " +
    "flavors, std_dev") {
    val root = Files.createTempDirectory("graft-xs").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q a", 1L), (2L, "q b", 2L), (3L, "q c", 3L),
      (4L, "zz", 99L))
      .toDF("doc_id", "text", "n"), "a", nBuckets = 4)
    val r = SegmentedIndex.extendedStatsFacet(spark, root,
      Seq("q"), "n").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L &&
      r.getLong(2) == 3L && r.getLong(3) == 6L)
    assert(r.getDouble(4) == 2.0)            // vavg
    assert(r.getLong(5) == 14L)              // sum_of_squares
    assert(r.getDouble(6) == 6.0 / 9.0)      // variance_pop
    assert(r.getDouble(7) == 1.0)            // variance_samp
    assert(r.getDouble(8) == math.sqrt(6.0 / 9.0))
  }

  test("weightedAvgFacet: exact Σvw/Σw; docs missing either field " +
    "drop") {
    val root = Files.createTempDirectory("graft-wa").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q", Some(10L), Some(1L)), (2L, "q", Some(20L), Some(3L)),
      (3L, "q", None, Some(9L)), (4L, "q", Some(50L), None))
      .toDF("doc_id", "text", "v", "w"), "a", nBuckets = 4)
    val r = SegmentedIndex.weightedAvgFacet(spark, root,
      Seq("q"), "v", "w").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 70.0 / 4.0)
  }

  test("missingFacet counts live hit docs whose sparse segment " +
    "lacks the field") {
    val root = Files.createTempDirectory("graft-miss").toString
    SegmentedIndex.append(spark, root,
      Seq((1L, "q full", "s1"), (2L, "q full", "s2"))
        .toDF("doc_id", "text", "source"), "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      Seq((3L, "q sparse"), (4L, "q sparse"))
        .toDF("doc_id", "text"), "b")
    SegmentedIndex.delete(spark, root, Seq(4L).toDF("doc_id"), "d1")
    val n = SegmentedIndex.missingFacet(spark, root, Seq("q"),
      "source").as[Long].collect().head
    assert(n == 1L) // doc3 only: doc4 is dead, docs 1-2 carry source
  }

  test("boostingSearch demotes without excluding") {
    val root = freshIndex()
    val out = SegmentedIndex.boostingSearch(spark, root,
      positive = Seq("spark"), negative = Seq("stream"),
      negativeBoost = 0.5, k = 10)
      .as[(Long, Double, Boolean, Long)].collect().toSeq
    val base = SegmentedIndex.search(spark, root, Seq("spark"), 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // doc2 contains stream → halved; everyone else unchanged
    val byId = out.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(2L)._1 == base(2L) * 0.5 && byId(2L)._2)
    assert(byId(1L)._1 == base(1L) && !byId(1L)._2)
    assert(out.map(_._1).toSet == base.keySet)
  }

  test("distanceFeatureSearch adds the pivot kernel bonus") {
    val root = Files.createTempDirectory("graft-dfq").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q", Some(100L)), (2L, "q", Some(140L)),
      (3L, "q", None: Option[Long]))
      .toDF("doc_id", "text", "ts"), "a", nBuckets = 4)
    val out = SegmentedIndex.distanceFeatureSearch(spark, root,
      Seq("q"), "ts", origin = 100L, pivot = 40L, boost = 2.0,
      k = 10).as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val base = 1.0 * (3.0 / 3.0) // tf·(N/df): every doc has q
    assert(out(1L)._2 == 2.0)                   // at origin: full boost
    assert(out(2L)._2 == 2.0 * (40.0 / 80.0))   // |140-100|=pivot → half
    assert(out(3L)._2 == 0.0)                   // missing field: no bonus
    assert(out(1L)._1 == base + 2.0)
  }

  test("pinnedSearch: pins first in request order, organic follows " +
    "pinned-free; dead pins vanish") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(3L).toDF("doc_id"), "d1")
    val out = SegmentedIndex.pinnedSearch(spark, root,
      ids = Seq(4L, 3L, 1L), terms = Seq("spark"), k = 10)
      .as[(Long, Double, Boolean)].collect().toSeq
    // pin 3 is tombstoned → drops; 4 and 1 lead in request order
    assert(out.take(2).map(t => (t._1, t._3)) ==
      Seq((4L, true), (1L, true)))
    assert(out.drop(2).forall(!_._3))
    assert(!out.drop(2).map(_._1).contains(4L))
    // doc4 matches no spark → pinned with score 0 but still first
    assert(out.head._2 == 0.0)
  }

  test("randomScoreSearch: the documented Knuth hash, reproducible") {
    val root = freshIndex()
    val out = SegmentedIndex.randomScoreSearch(spark, root,
      Seq("spark"), seed = 7L, k = 10)
      .as[(Long, Double)].collect().toMap
    def r(id: Long) =
      ((id * 2654435761L + 7L) % 2147483648L).toDouble / 2147483648.0
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    out.foreach { case (id, s) => assert(s == r(id)) }
    val again = SegmentedIndex.randomScoreSearch(spark, root,
      Seq("spark"), seed = 7L, k = 10)
      .as[(Long, Double)].collect().toMap
    assert(again == out)
  }

  test("regexpSearch: whole-term anchoring on the dictionary walk") {
    val root = freshIndex()
    val out = SegmentedIndex.regexpSearch(spark, root,
      "st[a-z]*m", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(2L)) // stream; nothing else matches
    // anchored: "par" alone matches no whole term
    assert(SegmentedIndex.regexpSearch(spark, root, "par", 10)
      .count() == 0)
  }

  test("catIndices: one panel row per federation member, manifest " +
    "arithmetic only, live counts net of tombstones") {
    val rootA = freshIndex()
    val rootB = Files.createTempDirectory("graft-ci").toString
    SegmentedIndex.append(spark, rootB,
      corpus.filter(col("doc_id") <= 2), "a", nBuckets = 4)
    SegmentedIndex.delete(spark, rootB, Seq(2L).toDF("doc_id"), "d1")
    val out = SegmentedIndex.catIndices(spark,
      Seq("beta" -> rootB, "alpha" -> rootA))
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // alpha: 2 segments, no deletes, 5 docs, 18 tokens;
    // beta: 1 segment + 1 del batch, 2 docs, 1 deleted, 9 tokens
    assert(out == Seq(
      ("alpha", 2L, 0L, 5L, 0L, 5L, 18L),
      ("beta", 1L, 1L, 2L, 1L, 1L, 9L)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.catIndices(spark,
        Seq("x" -> rootA, "x" -> rootB))
    }
  }

  test("catSegments: manifest rows in commit order, zero data reads") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(5L).toDF("doc_id"), "d1")
    val rows = SegmentedIndex.catSegments(spark, root)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, "seg", 3L), (1L, "seg", 2L), (2L, "del", 1L)))
    // token totals: docs 1-3 have 5+4+3 tokens, docs 4-5 have 3+3
    assert(rows(0)._4 == 12L && rows(1)._4 == 6L)
  }

  test("serialDiffFacet: lag-N differencing, first N buckets null") {
    val root = Files.createTempDirectory("graft-sd").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q", 0L), (2L, "q", 0L), (3L, "q", 10L), (4L, "q", 20L),
      (5L, "q", 20L), (6L, "q", 20L))
      .toDF("doc_id", "text", "n"), "a", nBuckets = 4)
    val out = SegmentedIndex.serialDiffFacet(spark, root, Seq("q"),
      "n", interval = 10L, lagN = 2)
      .select("bucket", "doc_count", "serial_diff")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    assert(out == Seq((0L, 2L, null), (10L, 1L, null),
      (20L, 3L, 1L)))
  }

  test("percentilesBucket: exact nearest-rank over the bucket series") {
    val root = Files.createTempDirectory("graft-pb2").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q", 0L), (2L, "q", 0L), (3L, "q", 10L), (4L, "q", 20L),
      (5L, "q", 20L), (6L, "q", 20L))
      .toDF("doc_id", "text", "n"), "a", nBuckets = 4)
    // series of doc_counts: [2, 1, 3] → sorted [1, 2, 3]
    val out = SegmentedIndex.percentilesBucket(spark, root, Seq("q"),
      "n", interval = 10L, percents = Seq(50.0, 100.0))
      .as[(Double, Long)].collect().toSeq
    assert(out == Seq((50.0, 2L), (100.0, 3L)))
  }

  test("topMetricsFacet: per bucket, the metric of the top-sorted " +
    "doc, ties broken by id") {
    val root = Files.createTempDirectory("graft-tm").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q", "a", 5L, 100L), (2L, "q", "a", 9L, 200L),
      (3L, "q", "b", 9L, 300L), (4L, "q", "b", 9L, 400L))
      .toDF("doc_id", "text", "grp", "srt", "m"), "a", nBuckets = 4)
    val out = SegmentedIndex.topMetricsFacet(spark, root, Seq("q"),
      "grp", "srt", "m")
      .as[(String, Long, Long, Long)].collect().toSeq
    // bucket a: doc2 (srt 9); bucket b: srt tie 9/9 → doc3 by id
    assert(out == Seq(("a", 9L, 200L, 2L), ("b", 9L, 300L, 3L)))
  }

  test("matchBoolPrefix: leading terms score, the prefix clause " +
    "adds a constant, prefix-only docs surface at 1.0") {
    val root = freshIndex()
    val out = SegmentedIndex.matchBoolPrefix(spark, root,
      leading = Seq("join"), prefix = "ve", k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // join docs: 1,3,4 (df=3, N=5); vector docs (prefix ve): 1,2,4,5
    val j = 5.0 / 3.0
    assert(out(1L) == ((j + 1.0, 1L)))   // join + vector
    assert(out(3L) == ((2.0 * j, 1L)))   // join twice, no ve-term
    assert(out(2L) == ((1.0, 0L)))       // prefix only
    assert(out(5L) == ((1.0, 0L)))
  }

  test("significantText: sampler bounds the foreground, duplicate " +
    "texts vote once") {
    val root = Files.createTempDirectory("graft-st").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "q rare common"), (2L, "q rare common"),   // exact dups
      (3L, "q other common"), (4L, "plain common"),
      (5L, "plain common"))
      .toDF("doc_id", "text"), "a", nBuckets = 4)
    val out = SegmentedIndex.significantText(spark, root, Seq("q"),
      kTerms = 10, sampleSize = 10, minDocCount = 1L)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // hits of q = {1,2,3}; dedup collapses the 1/2 boilerplate pair
    // → foreground {1,3}, fcnt 2: "rare" votes ONCE (fg 1, not 2 —
    // filter_duplicate_text's point), "common" is everywhere
    // (fgp = bgp → score 0 → filtered)
    assert(out.keySet == Set("q", "rare", "other"))
    assert(out("rare") == 1L && out("other") == 1L && out("q") == 2L)
    // a tighter sampler changes the foreground: first 2 hit docs
    // {1,2} dedup to {1} → rare and q both overrepresented there
    val tight = SegmentedIndex.significantText(spark, root, Seq("q"),
      kTerms = 10, sampleSize = 2, minDocCount = 1L)
      .as[(String, Long, Long, Double)].collect().map(_._1).toSeq
    assert(tight == Seq("rare", "q"))
  }

  test("searchTemplate renders {{params}} (unknown slots empty) and " +
    "executes as simple_query_string") {
    val root = freshIndex()
    assert(SegmentedIndex.renderTemplate(
      "+{{a}} -{{b}} {{missing}}", Map("a" -> "spark", "b" -> "x"))
      == "+spark -x ")
    val viaTemplate = SegmentedIndex.searchTemplate(spark, root,
      "+{{must}} | {{opt}}", Map("must" -> "spark", "opt" -> "join"),
      k = 10).as[(Long, Double, Long)].collect().toSeq
    val direct = SegmentedIndex.simpleQueryString(spark, root,
      "+spark | join", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(viaTemplate == direct && direct.nonEmpty)
  }

  test("slicedScroll: disjoint, complete, tombstone-aware, paged") {
    val root = freshIndex()
    SegmentedIndex.delete(spark, root, Seq(2L).toDF("doc_id"), "d1")
    val s0 = SegmentedIndex.slicedScroll(spark, root, 0, 2, 100)
      .select("doc_id").as[Long].collect().toSet
    val s1 = SegmentedIndex.slicedScroll(spark, root, 1, 2, 100)
      .select("doc_id").as[Long].collect().toSet
    assert(s0 == Set(1L, 3L) && s1 == Set(4L, 5L))
    assert((s0 & s1).isEmpty)
    // paging: after the first id of slice 0, one-row pages walk on
    val p = SegmentedIndex.slicedScroll(spark, root, 0, 2, 1,
      after = Some(1L)).select("doc_id").as[Long].collect().toSeq
    assert(p == Seq(3L))
    // an upserted doc moves to the slice holding its live version
    SegmentedIndex.upsert(spark, root,
      corpus.filter(col("doc_id") === 1L)
        .withColumn("source", lit("moved")), "u9")
    val all = (0 until 3).flatMap(i =>
      SegmentedIndex.slicedScroll(spark, root, i, 3, 100)
        .select("doc_id").as[Long].collect())
    assert(all.sorted == Seq(1L, 3L, 4L, 5L))
  }

  test("slicedScroll pinned to a generation: a commit between pages " +
    "neither shifts slice membership nor leaks new docs") {
    val root = freshIndex()
    val gen = SegmentedIndex.generations(root).last
    val page1 = SegmentedIndex.slicedScroll(spark, root, 0, 2, 1,
      gen = Some(gen)).select("doc_id").as[Long].collect().toSeq
    // an append between pages renumbers CURRENT manifest ordinals —
    // the pinned view must not see it
    SegmentedIndex.append(spark, root,
      Seq((9L, "spark late arrival", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"), "c")
    val page2 = SegmentedIndex.slicedScroll(spark, root, 0, 2, 100,
      after = Some(page1.last), gen = Some(gen))
      .select("doc_id").as[Long].collect().toSeq
    val pinned0 = (page1 ++ page2).toSet
    val pinned1 = SegmentedIndex.slicedScroll(spark, root, 1, 2, 100,
      gen = Some(gen)).select("doc_id").as[Long].collect().toSet
    // the pinned export is exactly the pinned view's live corpus:
    // disjoint, complete, and doc 9 is invisible
    assert((pinned0 & pinned1).isEmpty)
    assert((pinned0 ++ pinned1) == Set(1L, 2L, 3L, 4L, 5L))
    // unpinned reads DO see the new doc (and the new ordinals)
    val current = (0 until 2).flatMap(i =>
      SegmentedIndex.slicedScroll(spark, root, i, 2, 100)
        .select("doc_id").as[Long].collect())
    assert(current.sorted == Seq(1L, 2L, 3L, 4L, 5L, 9L))
  }

  test("updateByQuery fetch gate: the selective path pushes the " +
    "collected id IN-list into the stored scans; the bulk path " +
    "scans and semi-joins; both agree") {
    val root = freshIndex()
    // selective (default gate 10000): In(doc_id, ...) reaches the
    // parquet scans' PushedFilters — the footer-pruning plan
    val sel = SegmentedIndex.matchedForUpdate(spark, root,
      Seq("join"))
    val selPlan = sel.queryExecution.executedPlan.toString
    assert(selPlan.contains("PushedFilters:") &&
      (selPlan.contains("In(doc_id") ||
        selPlan.contains("EqualTo(doc_id")), selPlan.take(1200))
    assert(!selPlan.toLowerCase.contains("leftsemi"), selPlan.take(400))
    // bulk (gate forced to 0): no id list — the semi-join plan
    spark.conf.set("graft.updateByQuery.idPushdownMaxRows", "0")
    try {
      val bulk = SegmentedIndex.matchedForUpdate(spark, root,
        Seq("join"))
      val bulkPlan = bulk.queryExecution.executedPlan.toString
      assert(bulkPlan.toLowerCase.contains("leftsemi"),
        bulkPlan.take(1200))
      assert(sel.select("doc_id").as[Long].collect().toSet ==
        bulk.select("doc_id").as[Long].collect().toSet)
      // the mutating roundtrip agrees on the forced-scan path too
      val n = SegmentedIndex.updateByQuery(spark, root,
        Seq("stream"), Seq("source" -> "'flagged'"), "u1")
      assert(n == 1L)
    } finally
      spark.conf.unset("graft.updateByQuery.idPushdownMaxRows")
    val srcs = SegmentedIndex.facet(spark, root,
      Seq("spark", "join", "vector"), "source", 10)
      .as[(String, Long)].collect().toMap
    assert(srcs == Map("web" -> 3L, "flagged" -> 1L, "wiki" -> 1L))
  }

  test("multiMatchSearch: per-field statistics, best_fields competes " +
    "(dis_max), most_fields piles up; cross_fields blends df to the " +
    "max (r17 upgrade of the former loud refusal)") {
    val textRoot = freshIndex()
    // the second analyzed field over the SAME doc ids: "source lang"
    val metaRoot = Files.createTempDirectory("graft-sx16m").toString
    val meta = corpus.withColumn("text",
      concat_ws(" ", col("source"), col("lang")))
    SegmentedIndex.append(spark, metaRoot,
      meta.filter(col("doc_id") <= 3), "a", nBuckets = 4)
    SegmentedIndex.append(spark, metaRoot,
      meta.filter(col("doc_id") > 3), "b")
    val fields = Seq("text" -> textRoot, "meta" -> metaRoot)
    // terms: "spark" lives in text (df 4), "web" lives in meta (df 3)
    val best = SegmentedIndex.multiMatchSearch(spark, fields,
      Seq("spark", "web"), "best_fields", tieBreaker = 0.5, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // per-field scores: text s = tf_spark·(5/4); meta s = 1·(5/3)
    def t(id: Long, tf: Long) = tf * (5.0 / 4)
    val m = 5.0 / 3
    // doc1 hits both fields: best = max(t, m), tie picks up the rest
    assert(best(1L)._1 ==
      math.max(t(1, 1), m) + 0.5 * (t(1, 1) + m - math.max(t(1, 1), m)))
    assert(best(1L)._2 == 2L)
    // doc5 (wiki): text only
    assert(best(5L) == ((t(5, 1), 1L)))
    val most = SegmentedIndex.multiMatchSearch(spark, fields,
      Seq("spark", "web"), "most_fields", tieBreaker = 0.0, k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(most(1L) == t(1, 1) + m) // fields pile up
    // doc4 lacks spark in text but is web in meta: present via meta
    assert(most(4L) == m)
    // cross_fields (the Lucene BlendedTermQuery convention, pinned):
    // per term df blends to the MAX across fields, per doc the best
    // field's tf scores under the blended weight, terms sum.
    // 'spark': text df 4, meta df 0 -> blend 4; 'web': meta df 3,
    // text df 0 -> blend 3 — so here cross == most numerically, but
    // via max-tf (doc3 "spark join join": tf_spark=1 text, 0 meta)
    val cross = SegmentedIndex.multiMatchSearch(spark, fields,
      Seq("spark", "web"), "cross_fields", 0.0, 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cross(1L) == ((1.0 * (5.0 / 4) + 1.0 * (5.0 / 3), 2L)))
    assert(cross(4L) == ((0.0 * (5.0 / 4) + 1.0 * (5.0 / 3), 1L)))
    // a term in BOTH fields blends df to the max and takes the best
    // tf once: plant 'web' into doc5's text family via a new index
    val textRoot2 = Files.createTempDirectory("graft-sx16x").toString
    SegmentedIndex.append(spark, textRoot2,
      corpus.withColumn("text",
        when(col("doc_id") === 5, concat(col("text"), lit(" web web")))
          .otherwise(col("text"))), "a", nBuckets = 4)
    val cross2 = SegmentedIndex.multiMatchSearch(spark,
      Seq("text" -> textRoot2, "meta" -> metaRoot),
      Seq("web"), "cross_fields", 0.0, 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // df blend = max(text df 1, meta df 3) = 3; doc5 takes its best
    // tf (2, from text) ONCE under the blended weight — without
    // blending, text's df 1 would hand doc5 an idf spike of 5/1
    assert(cross2(5L) == ((2.0 * (5.0 / 3), 1L)))
    assert(cross2(1L) == ((1.0 * (5.0 / 3), 1L)))
  }

  test("intervalsQuery combinators: any_of unions, all_of chains " +
    "ordered non-overlapping with a combined gap budget; a flat " +
    "match agrees with intervalsSearch") {
    import SegmentedIndex.{IAllOf, IAnyOf, IMatch}
    val root = freshIndex()
    val out = SegmentedIndex.intervalsQuery(spark, root,
      IAllOf(Seq(
        IAnyOf(Seq(IMatch(Seq("spark")), IMatch(Seq("stream")))),
        IMatch(Seq("customer", "vector"), maxGaps = 0)),
        maxGaps = 1), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // doc1: spark@0 then customer,vector@(2,3) -> 1 covered gap;
    // doc2: spark@0 then (1,2) -> 0 gaps (stream@3 is AFTER cv);
    // doc4 has no any_of source, doc5's pair is reversed
    assert(out == Seq((1L, 1L, 4L), (2L, 1L, 3L)))
    val flatQ = SegmentedIndex.intervalsQuery(spark, root,
      IMatch(Seq("spark", "join", "vector"), maxGaps = 8), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val flatS = SegmentedIndex.intervalsSearch(spark, root,
      Seq("spark", "join", "vector"), maxGaps = 8, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(flatQ == flatS && flatQ.nonEmpty)
    // unlimited gaps (ES default) admits the loose chain
    val loose = SegmentedIndex.intervalsQuery(spark, root,
      IAllOf(Seq(IMatch(Seq("spark")), IMatch(Seq("extra")))), 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(loose == Seq((1L, 1L, 5L)))
  }

  test("bucketScriptFacet: one pass buckets + metrics, the script " +
    "projects over them") {
    val root = Files.createTempDirectory("graft-bs").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "spark a", 120L), (2L, "spark b", 180L),
      (3L, "spark c", 250L), (4L, "other", 999L))
      .toDF("doc_id", "text", "n_chars"), "a", nBuckets = 4)
    val out = SegmentedIndex.bucketScriptFacet(spark, root,
      Seq("spark"), "n_chars", interval = 100L,
      metrics = Seq("sum_nc" -> "n_chars"),
      script = "sum_nc / doc_count")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((100L, 2L, 300L, 150.0), (200L, 1L, 250L, 250.0)))
  }

  test("hasChildSearch / hasParentSearch: join-field relations, " +
    "live on both sides, max and parent-score modes") {
    val root = Files.createTempDirectory("graft-pc").toString
    val pc = Seq(
      (10L, "topic spark", "question", Option.empty[Long]),
      (11L, "vector answer", "answer", Some(10L)),
      (12L, "vector vector deep", "answer", Some(10L)),
      (20L, "spark stream", "question", Option.empty[Long]),
      (21L, "vector plain", "answer", Some(20L)))
      .toDF("doc_id", "text", "join_name", "parent_id")
    SegmentedIndex.append(spark, root, pc, "a", nBuckets = 4)
    SegmentedIndex.delete(spark, root, Seq(20L).toDF("doc_id"), "d1")
    // N=5; df(vector)=3, df(spark)=2 (stats include the tombstone)
    val wv = 5.0 / 3
    val hc = SegmentedIndex.hasChildSearch(spark, root, Seq("vector"),
      "answer", "question", "max", 10)
      .as[(Long, Double, Long)].collect().toSeq
    // parent 20 is dead (child 21's match must not resurrect it);
    // parent 10's best child is 12 (tf 2)
    assert(hc == Seq((10L, 2 * wv, 2L)))
    val hcNone = SegmentedIndex.hasChildSearch(spark, root,
      Seq("vector"), "answer", "question", "none", 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(hcNone == Seq((10L, 0.0, 2L)))
    val hp = SegmentedIndex.hasParentSearch(spark, root, Seq("spark"),
      "question", "answer", withScore = true, 10)
      .as[(Long, Double)].collect().toSeq
    // only live parent 10 matches; both its children get its score
    assert(hp == Seq((11L, 5.0 / 2), (12L, 5.0 / 2)))
    intercept[IllegalArgumentException] {
      SegmentedIndex.hasChildSearch(spark, root, Seq("vector"),
        "answer", "question", "avg", 10)
    }
  }

  test("decayScoreSearch kernels: gauss/exp reach `decay` at scale " +
    "distance (ES's parameterization), squared vs linear exponent " +
    "beyond it; unknown kernel refused") {
    val root = Files.createTempDirectory("graft-decay").toString
    SegmentedIndex.append(spark, root, Seq(
      (1L, "spark", 300L), (2L, "spark", 400L), (3L, "spark", 100L))
      .toDF("doc_id", "text", "n_chars"), "a", nBuckets = 4)
    def mults(kernel: String): Map[Long, Double] =
      SegmentedIndex.decayScoreSearch(spark, root, Seq("spark"),
        "n_chars", origin = 300L, scale = 100L, k = 10,
        decay = 0.5, kernel = kernel)
        .select("doc_id", "decay_mult")
        .as[(Long, Double)].collect().toMap
    def near(a: Double, b: Double) = math.abs(a - b) <= 1e-12
    val g = mults("gauss")
    // d=0 -> 1; d=scale -> decay; d=2·scale -> decay^4
    assert(near(g(1L), 1.0) && near(g(2L), 0.5) &&
      near(g(3L), 0.0625), g)
    val e = mults("exp")
    // d=0 -> 1; d=scale -> decay; d=2·scale -> decay^2
    assert(near(e(1L), 1.0) && near(e(2L), 0.5) &&
      near(e(3L), 0.25), e)
    val l = mults("linear")
    assert(l(1L) == 1.0 && l(2L) == 0.5 && l(3L) == 0.0, l)
    intercept[IllegalArgumentException] {
      SegmentedIndex.decayScoreSearch(spark, root, Seq("spark"),
        "n_chars", 300L, 100L, 10, 0.5, "sigmoid")
    }
  }

  test("randomScoreSearch: ids beyond 2^31 reduce before the " +
    "multiply — scores stay in [0, 1) and match the modular hash") {
    val root = freshIndex()
    val big = 4100000000L // doc_id · 2654435761 would wrap a Long
    SegmentedIndex.append(spark, root,
      Seq((big, "spark giant id", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"), "c")
    val out = SegmentedIndex.randomScoreSearch(spark, root,
      Seq("spark"), seed = 7L, k = 10)
      .as[(Long, Double)].collect().toMap
    val m = BigInt(2147483648L)
    def r(id: Long) =
      (((BigInt(id) * BigInt(2654435761L) + 7) mod m).toDouble
        / m.toDouble)
    assert(out.contains(big))
    out.foreach { case (id, s) =>
      assert(s >= 0.0 && s < 1.0, s"$id -> $s")
      assert(s == r(id), s"$id: $s != ${r(id)}")
    }
  }

  test("regexpSearch: top-level alternation stays whole-term " +
    "anchored; backslash patterns bypass lowercasing") {
    val root = freshIndex()
    SegmentedIndex.append(spark, root,
      Seq((7L, "sparkly things", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"), "c")
    // ^(?:spark|vec)$ — 'sparkly' must NOT match via the left branch
    val hits = SegmentedIndex.regexpSearch(spark, root,
      "spark|stream", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L, 3L, 5L), hits)
    // \S+ lowercased would become \s+ (matches nothing-term); the
    // verbatim path keeps the escape class meaningful
    val all = SegmentedIndex.regexpSearch(spark, root,
      """\S+""", k = 50).count()
    assert(all > 0L)
  }
}
