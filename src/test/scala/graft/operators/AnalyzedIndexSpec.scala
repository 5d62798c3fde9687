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
}
