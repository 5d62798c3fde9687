package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The analyzer chain threaded through the segmented index: ingest
  * analysis, query-side analysis, position gaps, multi-term-query
  * normalization, immutability, and the reindex migration path. */
class AnalyzedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def enIndex(): String = {
    val root = Files.createTempDirectory("graft-an").toString
    val d = Seq(
      (1L, "The Running Dogs!"),
      (2L, "a dog runs FAST"),
      (3L, "Dog, dog: DOG."),
      (4L, "nothing relevant here")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = "english")
    root
  }

  test("english index: case folds, stems align, stopwords drop on " +
    "BOTH sides; dl is the analyzed length") {
    val root = enIndex()
    assert(SegmentedIndex.analyzerOf(root) == "english")
    // query 'DOGS' → 'dog': docs 1 (dogs), 2 (dog), 3 (dog ×3)
    val hits = SegmentedIndex.search(spark, root, Seq("DOGS"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(hits.map(_._1).toSet == Set(1L, 2L, 3L), hits.toString)
    // doc 3 (tf 3) outranks: score = tf · N/df = 3·(4/3)
    assert(hits.head == ((3L, 4.0, 1L)), hits.toString)
    // an all-stopword query matches nothing (zero_terms_query: none)
    assert(SegmentedIndex.search(spark, root, Seq("The", "a"), 10)
      .count() == 0)
    // dl: doc 1 'The Running Dogs!' analyzes to 2 terms — the
    // manifest's total_len counts analyzed terms (4 docs: 2+3+3+3)
    assert(SegmentedIndex.termVectors(spark, root, 1L)
      .as[(String, Long, Seq[Long])].collect().toSeq ==
      Seq(("dog", 1L, Seq(2L)), ("runn", 1L, Seq(1L))),
      "positions must keep the stopword gap (the@0 consumed pos 0)")
  }

  test("phrase search respects stopword position gaps in BOTH " +
    "directions (ES match_phrase parity)") {
    val root = Files.createTempDirectory("graft-anp").toString
    val d = Seq(
      (1L, "big the apple"),
      (2L, "big apple pie"),
      (3L, "the big apple")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = "english")
    def ids(phrase: Seq[String]) =
      SegmentedIndex.phraseSearch(spark, root, phrase)
        .select("doc_id").as[Long].collect().toSet
    // query 'big apple' (adjacent): doc 1's gap must NOT match
    assert(ids(Seq("big", "apple")) == Set(2L, 3L))
    // query 'big the apple' (gapped): ONLY the gapped doc matches
    assert(ids(Seq("big", "the", "apple")) == Set(1L))
    // phrase-prefix: the prefix slot sits AFTER the gap
    val pp = SegmentedIndex.phrasePrefixSearch(spark, root,
      Seq("big", "the"), "app")
      .select("doc_id").as[Long].collect().toSet
    assert(pp == Set(1L), pp.toString)
  }

  test("multi-term queries NORMALIZE but never stem: prefix, " +
    "wildcard, terms-enum, fuzzy all hit the raw dictionary") {
    val root = enIndex()
    // dictionary holds 'runn' (stem of running) and 'run' (runs):
    // prefix 'RUN' (lowercased) matches both docs' terms
    val px = SegmentedIndex.prefixSearch(spark, root, "RUN", 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(px.map(_._1).toSet == Set(1L, 2L), px.toString)
    assert(SegmentedIndex.wildcardSearch(spark, root, "RU?N", 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq == Seq(1L))
    assert(SegmentedIndex.termsEnum(spark, root, "RUN", 10)
      .as[(String, Long)].collect().toSeq ==
      Seq(("run", 1L), ("runn", 1L)))
    // fuzzy 'DOGG' lowercases and matches 'dog' at distance 1
    val fz = SegmentedIndex.fuzzySearch(spark, root, Seq("DOGG"),
      k = 5, maxDist = 1)
    assert(fz.select("term").distinct().as[String].collect().toSeq ==
      Seq("dog"))
  }

  test("the analyzer is an index property: appends cannot change it, " +
    "rollover inherits it, snapshot carries it, reindex MIGRATES it " +
    "— destination equals a from-scratch index under the new chain") {
    val ws = Files.createTempDirectory("graft-anw").toString
    val d = Seq(
      (1L, "Data Running"),
      (2L, "data runs data")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, ws, d, "a", nBuckets = 4)
    // whitespace (default): case-sensitive, no stemming
    assert(SegmentedIndex.search(spark, ws, Seq("Data"), 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq == Seq(1L))
    // a later append asking for another analyzer is ignored — the
    // index's chain wins (the ES mapping contract)
    SegmentedIndex.append(spark, ws,
      Seq((3L, "MORE Data")).toDF("doc_id", "text"), "b",
      analyzer = "english")
    assert(SegmentedIndex.analyzerOf(ws) == "whitespace")
    assert(SegmentedIndex.search(spark, ws, Seq("Data"), 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSet ==
      Set(1L, 3L))
    // reindex → english: the migration re-analyzes the live _source
    val dst = Files.createTempDirectory("graft-and").toString + "/en"
    SegmentedIndex.reindex(spark, ws, dst, nBuckets = 4,
      analyzer = Some("english"))
    assert(SegmentedIndex.analyzerOf(dst) == "english")
    val fresh = Files.createTempDirectory("graft-anf").toString
    SegmentedIndex.append(spark, fresh,
      d.unionByName(Seq((3L, "MORE Data")).toDF("doc_id", "text")),
      "a", nBuckets = 4, analyzer = "english")
    val q = Seq("DATA", "run")
    assert(SegmentedIndex.search(spark, dst, q, 10).collect().toSeq ==
      SegmentedIndex.search(spark, fresh, q, 10).collect().toSeq,
      "reindexed destination must equal a from-scratch english index")
    assert(SegmentedIndex.search(spark, dst, q, 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSet ==
      Set(1L, 2L, 3L))
    // snapshot carries the chain
    val snap = Files.createTempDirectory("graft-ans").toString + "/s"
    SegmentedIndex.snapshot(dst, snap)
    assert(SegmentedIndex.analyzerOf(snap) == "english")
    assert(SegmentedIndex.search(spark, snap, q, 10).collect().toSeq ==
      SegmentedIndex.search(spark, dst, q, 10).collect().toSeq)
  }

  test("highlightPositional: marks ORIGINAL-case tokens whose " +
    "analyzed form matches an analyzed query term (ES's unified " +
    "highlighter); bit-identical to the raw-token highlighter on a " +
    "whitespace index") {
    val root = Files.createTempDirectory("graft-hlp").toString
    val d = Seq(
      (1L, "The Running Dogs are here"),
      (2L, "a dog runs FAST today"),
      (3L, "nothing to see")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = "english")
    val r = SegmentedIndex.highlightPositional(spark, root,
      Seq("dogs", "Runs"), k = 10, window = 1)
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: 'Running' analyzes to 'runn' (no match for 'run');
    // 'Dogs' → 'dog' matches — first hit at token 3 (1-based),
    // case preserved in the snippet
    // doc 2: 'dog' and 'runs' both match, first hit at token 2
    assert(r == Seq(
      (1L, 3L, 1L, "Running [Dogs] are"),
      (2L, 2L, 2L, "a [dog] [runs]")), r.toString)
    // whitespace index: positional ≡ the raw-token highlighter
    val ws = Files.createTempDirectory("graft-hlpw").toString
    SegmentedIndex.append(spark, ws, d, "a", nBuckets = 4)
    assert(SegmentedIndex.highlightPositional(spark, ws,
      Seq("dog", "FAST"), k = 10).collect().toSeq ==
      SegmentedIndex.highlight(spark, ws,
        Seq("dog", "FAST"), k = 10).collect().toSeq,
      "whitespace positional highlighting must equal the raw marker")
  }

  test("analyzed facet/bool/delete-by-query: hit sets analyze, " +
    "stored metadata unaffected; upsert re-analyzes the new text") {
    val root = Files.createTempDirectory("graft-anb").toString
    val d = Seq(
      (1L, "The Dogs bark", "news"),
      (2L, "dog sleeps", "blog"),
      (3L, "CATS everywhere", "news")).toDF("doc_id", "text", "cat")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = "english")
    assert(SegmentedIndex.facet(spark, root, Seq("Dog"), "cat", 10)
      .as[(String, Long)].collect().toSeq ==
      Seq(("blog", 1L), ("news", 1L)))
    val bs = SegmentedIndex.boolSearch(spark, root,
      must = Seq("DOGS"), mustNot = Seq("Barking"), k = 10)
    // 'Barking' stems to 'bark': doc 1 excluded, doc 2 stays
    assert(bs.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    SegmentedIndex.upsert(spark, root,
      Seq((3L, "one more DOG", "news")).toDF("doc_id", "text", "cat"),
      "u1")
    assert(SegmentedIndex.search(spark, root, Seq("dogs"), 10)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L),
      "the upserted text must analyze under the index's chain")
    SegmentedIndex.deleteByQuery(spark, root, Seq("Dogs"), "dq")
    assert(SegmentedIndex.search(spark, root, Seq("dog"), 10)
      .count() == 0, "delete-by-query must analyze its terms")
  }

  test("custom analysis settings travel with the index: synonym " +
    "stacking serves value-queries, extra stopwords filter, appends " +
    "inherit, reindex migrates") {
    val spec = Analyzer.custom("english",
      extraStopwords = Seq("noise"),
      synonyms = Seq("fast" -> "quick")).name
    val root = Files.createTempDirectory("graft-syn").toString
    val d = Seq(
      (1L, "The FAST dog"),
      (2L, "a quick cat"),
      (3L, "noise noise slow bird")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = spec)
    assert(SegmentedIndex.analyzerOf(root) == spec,
      "the manifest carries the canonical spec")
    // a query for the VALUE hits the key-only doc through the
    // stacked index tokens; df(quick) counts both docs
    val hits = SegmentedIndex.search(spark, root, Seq("Quick"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(hits.map(_._1).toSet == Set(1L, 2L), hits.toString)
    // score = tf·(N/df) = 1·(3/2) for both
    assert(hits.forall(_._2 == 1.5), hits.toString)
    // the key still matches its own doc only (no query expansion)
    assert(SegmentedIndex.search(spark, root, Seq("fast"), 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // the extra stopword is gone on both sides
    assert(SegmentedIndex.search(spark, root, Seq("noise"), 10)
      .count() == 0)
    // appends inherit the settings (the parameter is first-commit-only)
    SegmentedIndex.append(spark, root,
      Seq((4L, "another fast one")).toDF("doc_id", "text"), "b")
    assert(SegmentedIndex.search(spark, root, Seq("quick"), 10)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    // highlighting marks the ORIGINAL key token for a value query
    val hl = SegmentedIndex.highlightPositional(spark, root,
      Seq("quick"), k = 10)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(hl.map(r => (r._1, r._4)).toSet == Set(
      (1L, "The [FAST] dog"), (2L, "a [quick] cat"),
      (4L, "another [fast] one")), hl.toString)
    // reindex BACK to plain english drops the settings: value-queries
    // stop matching the key-only docs, 'noise' reappears
    val dst = Files.createTempDirectory("graft-syn-rx").toString
    SegmentedIndex.reindex(spark, root, dst, nBuckets = 4,
      analyzer = Some("english"))
    assert(SegmentedIndex.search(spark, dst, Seq("quick"), 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(SegmentedIndex.search(spark, dst, Seq("noise"), 10)
      .select("doc_id").as[Long].collect().toSeq == Seq(3L))
    // and federating the custom index with its english migration is
    // a MIXED federation — must throw
    intercept[IllegalArgumentException](SegmentedIndex.multiSearch(
      spark, Seq("c" -> root, "e" -> dst), Seq("dog"), 10))
  }

  test("synonym groups + query-time synonyms at the index level: " +
    "group members search symmetrically with pooled df; qsyn expands " +
    "the query with per-term df and never touches the index; " +
    "federation compares the full spec") {
    val spec = Analyzer.customGroups("english",
      groups = Seq(Seq("big", "large")),
      querySynonyms = Seq("rapid" -> "fast")).name
    val root = Files.createTempDirectory("graft-grp").toString
    val d = Seq(
      (1L, "a big house"),
      (2L, "a large estate"),
      (3L, "the fast train"),
      (4L, "slow boat")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = spec)
    // SYMMETRY: either member finds BOTH docs — the big doc stacks
    // large and the large doc stacks big (the directed closure), so
    // df pools to 2 and both hits score 1·(4/2)
    for (q <- Seq("big", "LARGE")) {
      val hits = SegmentedIndex.search(spark, root, Seq(q), 10)
        .as[(Long, Double, Long)].collect().toSeq
      assert(hits.map(_._1).toSet == Set(1L, 2L), s"$q: $hits")
      assert(hits.forall(_._2 == 2.0), s"$q: $hits")
    }
    // QUERY-TIME expansion: 'rapid' appears nowhere — the hit
    // arrives through the expanded term, scored with fast's OWN df
    // of 1 (score 1·(4/1); index-time stacking would have pooled it)
    val r = SegmentedIndex.search(spark, root, Seq("Rapid"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(r == Seq((3L, 4.0, 1L)), r.toString)
    // the index stores exactly what the doc says — no qsyn token
    assert(SegmentedIndex.termVectors(spark, root, 3L)
      .select("term").as[String].collect().toSet ==
      Set("fast", "train"))
    // every term-query reader rides the same expansion seam
    assert(SegmentedIndex.countQuery(spark, root, Seq("rapid"))
      .as[Long].collect().toSeq == Seq(1L))
    // federation: an identical spec federates; a divergent QUERY-side
    // map is a mixed federation and must throw (the header carries
    // qsyn, so the comparison stays exact)
    val twin = Files.createTempDirectory("graft-grp2").toString
    SegmentedIndex.append(spark, twin,
      Seq((9L, "big data")).toDF("doc_id", "text"), "a",
      nBuckets = 4, analyzer = spec)
    assert(SegmentedIndex.multiSearch(spark,
      Seq("a" -> root, "b" -> twin), Seq("large"), 10)
      .select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 9L))
    val other = Files.createTempDirectory("graft-grp3").toString
    SegmentedIndex.append(spark, other,
      Seq((9L, "big data")).toDF("doc_id", "text"), "a",
      nBuckets = 4,
      analyzer = Analyzer.customGroups("english",
        groups = Seq(Seq("big", "large")),
        querySynonyms = Seq("rapid" -> "slow")).name)
    intercept[IllegalArgumentException](SegmentedIndex.multiSearch(
      spark, Seq("a" -> root, "c" -> other), Seq("large"), 10))
  }

  test("multiSearchPerIndex: a MIXED federation analyzes per member " +
    "and pools df by term string — ES's heterogeneous semantics; " +
    "the strict multiSearch still throws for the same pair") {
    val ws = Files.createTempDirectory("graft-fpw").toString
    val en = Files.createTempDirectory("graft-fpe").toString
    val d1 = Seq((1L, "the dog runs"), (2L, "dog bowl"))
      .toDF("doc_id", "text")
    val d2 = Seq((11L, "The Dogs Running"), (12L, "cat nap"))
      .toDF("doc_id", "text")
    SegmentedIndex.append(spark, ws, d1, "a", nBuckets = 4)
    SegmentedIndex.append(spark, en, d2, "a", nBuckets = 4,
      analyzer = "english")
    val pair = Seq("w" -> ws, "e" -> en)
    intercept[IllegalArgumentException](
      SegmentedIndex.multiSearch(spark, pair, Seq("dog"), 10))
    // query 'Dogs': whitespace analyzes verbatim ('Dogs' — matches
    // nothing raw), english stems to 'dog' (doc 11). N = 4; df(dog)
    // pools BOTH dictionaries: ws raw 'dog' (docs 1,2) + en stem
    // 'dog' (doc 11) = 3; df(Dogs) = 0 (contributes nothing)
    val r = SegmentedIndex
      .multiSearchPerIndex(spark, pair, Seq("Dogs"), 10)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(r == Seq(("e", 11L, 4.0 / 3.0, 1L)), r.toString)
    // the same query string lands differently per member: 'the'
    // survives on ws (doc 1), drops on en; 'Running' stems to 'runn'
    // (en doc 11) and misses ws verbatim
    val r2 = SegmentedIndex
      .multiSearchPerIndex(spark, pair, Seq("the", "Running"), 10)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(r2.map(t => (t._1, t._2)).toSet ==
      Set(("w", 1L), ("e", 11L)), r2.toString)
    // an all-members-analyze-away query returns the empty frame
    val enOnly = Seq("e" -> en)
    assert(SegmentedIndex
      .multiSearchPerIndex(spark, enOnly, Seq("the", "a"), 10)
      .count() == 0)
  }

  test("phrase-prefix under synonym stacking: a position emitting " +
    "several matching expansions still counts each slot once") {
    val spec = Analyzer.custom("standard",
      synonyms = Seq("fast" -> "quick", "fast" -> "quicker")).name
    val root = Files.createTempDirectory("graft-synpp").toString
    val d = Seq(
      (1L, "big fast dog"),
      (2L, "big dog fast")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = spec)
    // prefix 'qui' expands to BOTH quick and quicker — doc 1's
    // position 1 stacks both; the slot must count once, so doc 1
    // matches exactly once
    val r = SegmentedIndex
      .phrasePrefixSearch(spark, root, Seq("big"), "qui")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 0L)), r.toString)
  }

  test("federation ENFORCES the uniform-analyzer precondition: a " +
    "mixed pair throws loudly, a matched pair serves unchanged") {
    val ws = Files.createTempDirectory("graft-fdw").toString
    val ws2 = Files.createTempDirectory("graft-fdw2").toString
    val en = Files.createTempDirectory("graft-fde").toString
    val d1 = Seq((1L, "dogs run fast", "a"))
      .toDF("doc_id", "text", "cat")
    val d2 = Seq((2L, "cats sleep here", "b"))
      .toDF("doc_id", "text", "cat")
    SegmentedIndex.append(spark, ws, d1, "a", nBuckets = 4)
    SegmentedIndex.append(spark, ws2, d2, "a", nBuckets = 4)
    SegmentedIndex.append(spark, en, d2, "a", nBuckets = 4,
      analyzer = "english")
    val mixed = Seq("l" -> ws, "r" -> en)
    val ok = Seq("l" -> ws, "r" -> ws2)
    // every federated reader that analyzes query terms throws on the
    // mixed pair — the silent-wrong-hits path must fail loudly
    val e = intercept[IllegalArgumentException](
      SegmentedIndex.multiSearch(spark, mixed, Seq("dogs"), 10))
    assert(e.getMessage.contains("share one analyzer"),
      e.getMessage)
    intercept[IllegalArgumentException](SegmentedIndex
      .multiFacet(spark, mixed, Seq("dogs"), "cat", 10))
    intercept[IllegalArgumentException](SegmentedIndex
      .multiStatsFacet(spark, mixed, Seq("dogs"), "doc_id"))
    intercept[IllegalArgumentException](SegmentedIndex
      .multiHistogramFacet(spark, mixed, Seq("dogs"), "doc_id", 10L))
    intercept[IllegalArgumentException](SegmentedIndex
      .multiFacetStats(spark, mixed, Seq("dogs"), "cat", "doc_id", 10))
    intercept[IllegalArgumentException](SegmentedIndex
      .multiSignificantTerms(spark, mixed, Seq("dogs"), 10, 1L))
    // the matched pair keeps serving exactly as before
    assert(SegmentedIndex.multiSearch(spark, ok, Seq("dogs"), 10)
      .select("idx", "doc_id").as[(String, Long)].collect().toSeq ==
      Seq(("l", 1L)))
    assert(SegmentedIndex
      .multiFacet(spark, ok, Seq("dogs", "cats"), "cat", 10)
      .as[(String, Long)].collect().toSeq ==
      Seq(("a", 1L), ("b", 1L)))
  }

  test("phrasePrefixSearch: a leading term ending in a separator " +
    "does not shift the prefix slot (trailing-empty-token fix)") {
    val root = Files.createTempDirectory("graft-ppx").toString
    val d = Seq(
      (1L, "foo, bar baz"),
      (2L, "foo other bar")).toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4,
      analyzer = "standard")
    // 'foo,' tokenizes to foo@0 with a TRAILING empty raw token; the
    // prefix slot must still be 1 — doc 1's 'bar' matches, doc 2's
    // bar (slot 2) must not
    assert(SegmentedIndex
      .phrasePrefixSearch(spark, root, Seq("foo,"), "ba")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // unchanged on the clean form
    assert(SegmentedIndex
      .phrasePrefixSearch(spark, root, Seq("foo"), "ba")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("moreLikeThis's rank-product guard fires BEFORE the multiply " +
    "can wrap — a wrapped value inside (0, bound] cannot pass") {
    // 3^40 wraps Long multiplication back into a small positive:
    // the per-step check must throw anyway
    val huge = Seq.fill(40)(3486784401L) // 3^20
    val e = intercept[IllegalArgumentException](SegmentedIndex
      .checkedRankProduct(huge, Long.MaxValue / 4L, "envelope"))
    assert(e.getMessage.contains("envelope"))
    // in-bound products fold exactly
    assert(SegmentedIndex.checkedRankProduct(
      Seq(3L, 5L, 7L), 1000L, "envelope") == 105L)
    // a zero/negative factor is rejected (df is always positive)
    intercept[IllegalArgumentException](SegmentedIndex
      .checkedRankProduct(Seq(0L), 10L, "envelope"))
  }

  test("highlighting survives quote-bearing analyzed terms (SQL " +
    "literal escaping) under the whitespace chain") {
    val root = Files.createTempDirectory("graft-hlq").toString
    val d = Seq((1L, "it's a don't day"))
      .toDF("doc_id", "text")
    SegmentedIndex.append(spark, root, d, "a", nBuckets = 4)
    val r = SegmentedIndex.highlightPositional(spark, root,
      Seq("don't"), k = 5)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(r == Seq((1L, 3L, 1L, "it's a [don't] day")), r.toString)
    val raw = Search.highlight(
      Seq((1L, "it's a don't day")).toDF("doc_id", "text"),
      Seq("don't"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(raw == Seq((1L, 3L, 1L, "it's a [don't] day")),
      raw.toString)
  }
}
