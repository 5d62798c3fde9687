package graft.operators

import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),
    (2L, "spark engine engine"),
    (3L, "rare term here"),
    (4L, "nothing relevant at all"))
    .toDF("doc_id", "text")

  test("postings: one row per (term, doc) with tf") {
    val p = Search.postings(docs)
      .as[(String, Long, Long)].collect()
      .map { case (t, d, tf) => ((t, d), tf) }.toMap
    assert(p(("spark", 1L)) == 3L)
    assert(p(("spark", 2L)) == 1L)
    assert(p(("engine", 2L)) == 2L)
  }

  test("inverted index: postings completeness — every (doc, term) appears once") {
    val docsDf = spark.read.parquet(s"$sf001/documents.parquet")
    val idx = Search.invertedIndex(docsDf)
    val totalPostings = idx.agg(org.apache.spark.sql.functions
      .sum("doc_freq")).as[Long].head()
    val distinctPairs = Search.postings(docsDf).count()
    assert(totalPostings == distinctPairs)
    // posting lists are doc-sorted
    val first = idx.orderBy("term").select("postings")
      .as[Seq[(Long, Long)]].head()
    assert(first.map(_._1) == first.map(_._1).sorted)
  }

  test("bucketed index lookup prunes to the terms' buckets") {
    spark.sql("DROP TABLE IF EXISTS idx_b")
    val loc = new java.io.File("spark-warehouse/idx_b")
    if (loc.exists()) { loc.listFiles().foreach(_.delete()); loc.delete() }
    val docsDf = spark.read.parquet(s"$sf001/documents.parquet")
    Search.writeIndex(docsDf, "idx_b", numBuckets = 8)
    val hits = Search.lookup(spark, "idx_b", Seq("spark", "join"))
    hits.collect()
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), plan.take(900))
    val sel = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    assert(sel.exists(_ <= 2), s"expected <=2 buckets scanned: $plan")
    // results match the direct postings computation
    val direct = Search.postings(docsDf)
      .filter(col("term").isin("spark", "join"))
      .as[(String, Long, Long)].collect().toSet
    assert(hits.as[(String, Long, Long)].collect().toSet == direct)
  }

  test("tf-idf search ranks tf-heavy docs first, rare terms weigh more") {
    val hits = Search.search(docs, Seq("spark", "rare"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect()
    val scores = hits.toMap
    assert(scores(1L) > scores(2L)) // higher tf on same term
    // 'rare' appears in 1/4 docs vs 'spark' in 2/4 → idf doubles
    assert(scores(3L) == 1.0 * (4.0 / 1.0))
    assert(!scores.contains(4L))
  }

  test("phraseSearch: counts in-order adjacent occurrences per doc") {
    val d = Seq(
      (1L, "a b c a b c"),   // phrase twice
      (2L, "a b x c"),       // broken by x → no match
      (3L, "c b a"),         // reversed → no match
      (4L, "x a b c"))       // once, offset 1
      .toDF("doc_id", "text")
    val out = Search.phraseSearch(d, Seq("a", "b", "c"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(1L -> ((2L, 0L)), 4L -> ((1L, 1L))))
  }

  test("phraseSearch: overlapping matches and single-term phrases") {
    val d = Seq((1L, "a a a")).toDF("doc_id", "text")
    // self-overlapping repeat: (0,1) and (1,2) both match "a a"
    val rep = Search.phraseSearch(d, Seq("a", "a"))
      .as[(Long, Long, Long)].head()
    assert(rep == ((1L, 2L, 0L)))
    // single-term phrase degenerates to a term posting count
    val one = Search.phraseSearch(d, Seq("a"))
      .as[(Long, Long, Long)].head()
    assert(one == ((1L, 3L, 0L)))
  }

  test("phraseSearch agrees with a regex count over the fixture corpus") {
    val docsDf = spark.read.parquet(s"$sf001/documents.parquet")
    val phrase = Seq("big", "order", "scan")
    val expected = docsDf
      .select(col("doc_id"), expr(
        // count positions whose 3-token window equals the phrase
        "bigint(size(filter(sequence(0, size(split(text, ' ')) - 3), i -> " +
          "split(text, ' ')[i] = 'big' AND " +
          "split(text, ' ')[i + 1] = 'order' AND " +
          "split(text, ' ')[i + 2] = 'scan')))").as("n"))
      .filter(col("n") > 0)
      .as[(Long, Long)].collect().toMap
    val got = Search.phraseSearch(docsDf, phrase)
      .select("doc_id", "n_occurrences")
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("fuzzySearch resolves typos to every ed-1 vocab term, keeps " +
    "exact matches at distance 0, and drops unresolvable terms") {
    val d = Seq(
      (1L, "spark joins the batch table"),
      (2L, "spark spark sparks fly"),
      (3L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val out = Search.fuzzySearch(d,
      Seq("spqrk", "sparks", "zzzzzz"), k = 5)
      .select("q_term", "term", "dist", "doc_id")
      .as[(String, String, Long, Long)].collect()
    // 'spqrk' → 'spark' (substitution); docs 1 and 2 surface
    assert(out.filter(r => r._1 == "spqrk" && r._2 == "spark")
      .map(_._4).toSet == Set(1L, 2L))
    // 'sparks' resolves BOTH ways: exact 'sparks' (dist 0) and the
    // deletion-neighbor 'spark' (dist 1) — ES fuzzy semantics
    val sparks = out.filter(_._1 == "sparks")
    assert(sparks.exists(r => r._2 == "sparks" && r._3 == 0L))
    assert(sparks.exists(r => r._2 == "spark" && r._3 == 1L))
    // nothing within distance 1 of 'zzzzzz' → no rows, not an error
    assert(!out.exists(_._1 == "zzzzzz"))
  }

  test("highlight: first-occurrence window clamps at both ends, marks " +
    "every query term inside it, and drops non-matching docs") {
    val d = Seq(
      (1L, "spark at the very start of this longer document here"),
      (2L, "a b c d e f g h i spark"),            // match near the end
      (3L, "x y z spark join w v u t"),           // two terms in window
      (4L, "no matching words at all present"))
      .toDF("doc_id", "text")
    val out = Search.highlight(d, Seq("spark", "join"), window = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // pos 1 → window clamps left: snippet starts at token 1
    assert(out(1L) == ((1L, 1L, "[spark] at the very start of this")))
    // match at the last token → window clamps right
    assert(out(2L) == ((10L, 1L, "g h i [spark]")))
    // both terms inside the window are marked; pos is the FIRST hit
    assert(out(3L) == ((4L, 2L, "x y z [spark] [join] w v")))
    assert(!out.contains(4L))
  }
}
