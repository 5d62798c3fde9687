package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QueryString._

/** The strict Lucene query_string grammar: parser shape + errors,
  * and the nested boolean scoring semantics on the per-field
  * postings families. */
class QueryStringSpec extends SparkSpec {
  import spark.implicits._

  // ---- parser ----

  test("precedence: adjacency/OR lowest, AND binds tighter, NOT " +
    "tightest; parens group; && / || / ! are Lucene aliases") {
    assert(parse("a b AND c") ==
      OrNode(Seq(TermNode(None, "a", 1.0),
        AndNode(Seq(TermNode(None, "b", 1.0),
          TermNode(None, "c", 1.0))))))
    assert(parse("NOT a AND b") ==
      AndNode(Seq(NotNode(TermNode(None, "a", 1.0)),
        TermNode(None, "b", 1.0))))
    assert(parse("(a OR b) AND c") ==
      AndNode(Seq(OrNode(Seq(TermNode(None, "a", 1.0),
        TermNode(None, "b", 1.0))), TermNode(None, "c", 1.0))))
    assert(parse("a && !b || c") == parse("a AND NOT b OR c"))
  }

  test("field prefixes, boosts and phrases parse; AND/OR/NOT only " +
    "act as operators when bare") {
    assert(parse("meta:src3^2.5") ==
      TermNode(Some("meta"), "src3", 2.5))
    assert(parse("""title:"a b"~2 c""") ==
      OrNode(Seq(PhraseNode(Some("title"), Seq("a", "b"), 2),
        TermNode(None, "c", 1.0))))
    // a field named AND is a term, not an operator
    assert(parse("f:AND") == TermNode(Some("f"), "AND", 1.0))
  }

  test("unary +/- modifiers build the boolean clause list; group " +
    "boosts and mid-term wildcards parse") {
    assert(parse("+a -b c") ==
      BoolNode(Seq(TermNode(None, "a", 1.0)),
        Seq(TermNode(None, "b", 1.0)),
        Seq(TermNode(None, "c", 1.0))))
    // modifiers bind whole clause-list elements, below OR
    assert(parse("+(a b) -c^2") ==
      BoolNode(Seq(OrNode(Seq(TermNode(None, "a", 1.0),
        TermNode(None, "b", 1.0)))),
        Seq(TermNode(None, "c", 2.0)), Seq.empty))
    assert(parse("(a b)^2") ==
      BoostNode(OrNode(Seq(TermNode(None, "a", 1.0),
        TermNode(None, "b", 1.0))), 2.0))
    assert(parse("d?ta*") == WildcardNode(None, "d?ta*", 1.0))
    assert(parse("*lead") == WildcardNode(None, "*lead", 1.0))
  }

  test("malformed input errors loudly (ES 400 contract): parens, " +
    "operators, modifiers, boosts, phrases, field prefixes") {
    for (bad <- Seq("(a", "a)", "a AND", "OR a", "a OR", "NOT",
      "a ^", "a^x", "\"unclosed", "\"\"", "f:", "f:(a)", "a & b",
      "a | b", "", "+", "-", "a AND +b", "NOT -a", "\"a b\"^3",
      "\"a b\"~2^3", "*", "?*", "a AND -b"))
      withClue(s"input: '$bad'") {
        intercept[IllegalArgumentException] { parse(bad) }
      }
  }

  // ---- execution ----

  private def corpus = Seq(
    (1L, "spark join customer vector extra", "en", "web"),
    (2L, "spark customer vector stream", "en", "book"),
    (3L, "spark join join", "de", "web"),
    (4L, "customer vector join", "en", "web"),
    (5L, "spark vector customer", "fr", "wiki"))
    .toDF("doc_id", "text", "lang", "source")

  private def stage(): Seq[(String, String)] = {
    val textRoot = Files.createTempDirectory("graft-qs-t").toString
    SegmentedIndex.append(spark, textRoot, corpus, "a", nBuckets = 4)
    val metaRoot = Files.createTempDirectory("graft-qs-m").toString
    SegmentedIndex.append(spark, metaRoot,
      corpus.withColumn("text",
        concat_ws(" ", col("source"), col("lang"))), "a",
      nBuckets = 4)
    Seq("text" -> textRoot, "meta" -> metaRoot)
  }

  // text stats: N=5; df: spark 4, join 3, customer 4, vector 4,
  // stream 1, extra 1. meta stats: N=5; df: web 3, wiki 1, en 3.
  private def w(df: Long) = 5.0 / df

  test("nested boolean scoring: a failed conjunction's terms do NOT " +
    "score — (spark AND extra) OR customer") {
    val out = QueryString.search(spark, stage(), "text",
      "(spark AND extra) OR customer", k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1 matches the conjunction AND customer
    assert(out(1L) == (((1 * w(4) + 1 * w(1)) + 1 * w(4), 3L)))
    // doc2 has spark + customer but NOT extra: the conjunction
    // fails, spark must contribute nothing
    assert(out(2L) == ((1 * w(4), 2L)))
    // doc3 (spark join join): no customer, no extra -> no match
    assert(!out.contains(3L))
  }

  test("field prefixes score with each field's own statistics; " +
    "boosts multiply; NOT excludes without scoring") {
    val out = QueryString.search(spark, stage(), "text",
      "spark^2 meta:wiki AND NOT stream", k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // parse: OR(spark^2, AND(meta:wiki, NOT stream))
    // doc5: spark (2·5/4) + wiki (5/1, meta stats)
    assert(out(5L) == ((2 * w(4) + 1 * 5.0, 2L)))
    // doc2 has spark AND stream: the AND branch fails but the OR's
    // spark branch still matches
    assert(out(2L) == ((2 * w(4), 1L)))
    assert(!out.contains(4L)) // neither spark nor wiki
  }

  test("pure negation is match-all-minus; tombstones respected") {
    val fields = stage()
    SegmentedIndex.delete(spark, fields.head._2,
      Seq(4L).toDF("doc_id"), "d1")
    val out = QueryString.search(spark, fields, "text",
      "NOT spark", k = 10)
      .as[(Long, Double, Long)].collect().toSeq
    // docs without spark: 4 (tombstoned) -> none... doc4 only
    assert(out.isEmpty)
    val out2 = QueryString.search(spark, fields, "text",
      "NOT stream", k = 10).select("doc_id")
      .as[Long].collect().toSet
    assert(out2 == Set(1L, 3L, 5L)) // 2 has stream, 4 tombstoned
  }

  test("phrases gate but score zero; unknown fields error; a " +
    "stopword-free analyzer keeps terms 1:1") {
    val fields = stage()
    val out = QueryString.search(spark, fields, "text",
      "\"customer vector\" extra", k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // adjacency: docs 1, 2, 4; extra scores only doc1
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == ((1 * w(1), 1L)) && out(2L) == ((0.0, 0L)))
    intercept[IllegalArgumentException] {
      QueryString.search(spark, fields, "text", "nope:x", 10)
    }
    intercept[IllegalArgumentException] {
      QueryString.search(spark, fields, "nope", "x", 10)
    }
  }

  test("range and _exists_ filter leaves gate without scoring; " +
    "malformed ranges error") {
    val root = Files.createTempDirectory("graft-qs-f").toString
    SegmentedIndex.append(spark, root,
      Seq((1L, "spark alpha", "web"), (2L, "spark beta", "book"),
        (3L, "other", "web")).toDF("doc_id", "text", "source"),
      "a", nBuckets = 4)
    SegmentedIndex.append(spark, root,
      Seq((4L, "spark gamma"), (5L, "spark delta"))
        .toDF("doc_id", "text"), "b")
    val fields = Seq("text" -> root)
    val out = QueryString.search(spark, fields, "text",
      "spark AND _exists_:source AND doc_id:[1 TO 4]", 10)
      .as[(Long, Double, Long)].collect().toSeq
    // spark: 1,2,4,5; has source: 1,2,3; id in [1,4]: joint 1,2
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out.forall(r => r._2 == 5.0 / 4 && r._3 == 1L))
    // filter-only query: matches gate, everything scores zero
    val only = QueryString.search(spark, fields, "text",
      "_exists_:source", 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(only == Seq((1L, 0.0, 0L), (2L, 0.0, 0L), (3L, 0.0, 0L)))
    for (bad <- Seq("[1 TO 2]", "doc_id:[1 TO]", "doc_id:[a TO b]",
      "_exists_:source^2", "doc_id:[1 TO 2"))
      withClue(s"input: '$bad'") {
        intercept[IllegalArgumentException] { parse(bad) }
      }
  }

  test("prefix and fuzzy leaves: constant-score boost, capped " +
    "dictionary expansion; malformed wildcard syntax errors") {
    val fields = stage()
    val out = QueryString.search(spark, fields, "text",
      "cust*^2 vektor~1", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // cust* -> customer (docs 1,2,4,5); vektor~1 -> vector (1,2,4,5)
    // wait: every corpus doc holding customer also holds vector here
    // score = 2.0 (prefix) + 1.0 (fuzzy) where both match;
    // const leaves don't count toward n_terms_hit
    assert(out.keySet == Set(1L, 2L, 4L, 5L))
    assert(out.values.forall(_ == ((3.0, 0L))), out)
    // doc3 ("spark join join") matches neither
    for (bad <- Seq("term~3", "x~y"))
      withClue(s"input: '$bad'") {
        intercept[IllegalArgumentException] { parse(bad) }
      }
  }

  test("wildcard leaves: the anchored automaton over the dictionary " +
    "(mid-term ?, leading *), constant-score") {
    val fields = stage()
    // s?ark -> spark only (docs 1,2,3,5); *tream -> stream (doc 2)
    val out = QueryString.search(spark, fields, "text",
      "s?ark* *tream^3", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    assert(out(2L) == ((1.0 + 3.0, 0L))) // spark + stream
    assert(out(1L) == ((1.0, 0L)))
  }

  test("fuzzy leaves walk the dictionary SymSpell-BLOCKED: the " +
    "blocked expansion equals the unblocked ground truth") {
    val fields = stage()
    val root = new java.io.File(fields.head._2)
    val (_, segs, _) = SegmentedIndex.readManifest(root)
    val dict = SegmentedIndex.dictFrame(spark, root, segs)
      .select("term").distinct().as[String].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    // every (query, edits) pair: docs returned == docs holding a
    // term within `edits` of the query (incl. SHORT terms at ~2 —
    // explicit edits apply at any length, unlike Lucene-AUTO)
    for ((q, e) <- Seq(("vektor", 1), ("joim", 1), ("jon", 2),
      ("sprak", 2))) {
      val expected = dict.filter(t => lev(t, q) <= e)
      val viaQs = QueryString.search(spark, fields, "text",
        s"$q~$e", 10).select("doc_id").as[Long].collect().toSet
      val ground = corpus.collect()
        .map(r => (r.getLong(0), r.getString(1).split(" ").toSet))
        .collect { case (id, toks)
          if toks.exists(expected.contains) => id }.toSet
      withClue(s"$q~$e (expansions: $expected)") {
        assert(viaQs == ground)
      }
    }
  }

  test("the boolean clause list executes Lucene's must/must_not/" +
    "should rule; group boosts scale the group's score") {
    val fields = stage()
    // +spark -stream customer: must spark, not stream, customer
    // optional-scoring
    val out = QueryString.search(spark, fields, "text",
      "+spark -stream customer", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc2 has stream -> excluded; doc4 lacks spark -> excluded
    assert(out.keySet == Set(1L, 3L, 5L))
    assert(out(1L) == ((w(4) + w(4), 2L))) // spark + customer
    assert(out(3L) == ((w(4), 1L)))        // spark alone
    // pure-negative clause list: match-all-minus
    val neg = QueryString.search(spark, fields, "text",
      "-stream", 10).select("doc_id").as[Long].collect().toSet
    assert(neg == Set(1L, 3L, 4L, 5L))
    // group boost multiplies the group's whole score
    val gb = QueryString.search(spark, fields, "text",
      "(spark extra)^2", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(gb(1L) == 2 * (w(4) + w(1)))
    assert(gb(3L) == 2 * w(4))
  }

  test("phrase slop routes through the two-term move arithmetic: " +
    "\"customer extra\"~1 matches the transposed-gap doc") {
    val fields = stage()
    // doc1: "spark join customer vector extra" — customer..extra has
    // one intervening token (vector): gap 1 needs slop >= 1
    val strict = QueryString.search(spark, fields, "text",
      "\"customer extra\"", 10).select("doc_id")
      .as[Long].collect().toSet
    assert(strict.isEmpty)
    val sloppy = QueryString.search(spark, fields, "text",
      "\"customer extra\"~1", 10).select("doc_id")
      .as[Long].collect().toSet
    assert(sloppy == Set(1L))
    // n-term sloppy phrases are the stated out-of-scope
    intercept[IllegalArgumentException] {
      QueryString.search(spark, fields, "text",
        "\"a b c\"~1", 10)
    }
  }

  test("searchFields: unqualified clauses dis_max across the fields " +
    "list with per-field boosts and statistics; qualified clauses " +
    "untouched") {
    val fields = stage()
    // text stats: web absent; meta stats: web df 3 (N=5)
    // 'web' via the fields list scores from meta at 2x; 'spark'
    // scores from text (absent in meta)
    val out = QueryString.searchFields(spark, fields,
      Seq("text" -> 1.0, "meta" -> 2.0), "spark web", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1 (spark + meta web): max(spark_text, 0) + max(0, 2·web_meta)
    assert(out(1L) == ((w(4) + 2 * (5.0 / 3), 2L)))
    // doc5 (spark, wiki): spark alone
    assert(out(5L) == ((w(4), 1L)))
    // doc4 (no spark, web): the meta side alone
    assert(out(4L) == ((2 * (5.0 / 3), 1L)))
    // a term living in BOTH fields takes the better field's score:
    // 'en' is a meta term only; 'extra' text only — sanity that
    // qualified clauses bypass the expansion
    val q = QueryString.searchFields(spark, fields,
      Seq("text" -> 1.0, "meta" -> 2.0), "meta:en", 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(q(1L) == 5.0 / 3) // meta:en df 3, boost 1 (qualified)
    // bad boosts / unknown default fields error
    intercept[IllegalArgumentException] {
      QueryString.searchFields(spark, fields,
        Seq("text" -> 0.0), "x", 10)
    }
    intercept[IllegalArgumentException] {
      QueryString.searchFields(spark, fields,
        Seq("nope" -> 1.0), "x", 10)
    }
  }

  test("mapped families must share one doc space (the negation-base " +
    "precondition): mismatched corpora error loudly") {
    val fields = stage()
    val smallRoot = Files.createTempDirectory("graft-qs-s").toString
    SegmentedIndex.append(spark, smallRoot,
      corpus.filter(col("doc_id") < 3), "a", nBuckets = 4)
    intercept[IllegalArgumentException] {
      QueryString.search(spark,
        fields :+ ("tiny" -> smallRoot), "text", "spark", 10)
    }
  }

  test("duplicate clauses score twice; dropped clauses vanish " +
    "rather than killing the query") {
    val fields = stage()
    val out = QueryString.search(spark, fields, "text",
      "extra extra", k = 10)
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2 * w(1), 1L))) // twice the weight, one pair
  }
}
