package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The analyzer's three mirrors must agree; this spec pins the COLUMN
  * mirror against the DRIVER mirror token for token and position for
  * position over adversarial text (the DuckDB oracle mirror is pinned
  * by q202+'s hash-exact correctness rows). */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    "The Quick-Brown FOX, jumps; over 2 lazy dogs!!",
    "running RUNNING ruNNing",
    "cities ladies bodies ties s is us ss",
    "masses classes address bus status analysis",
    "wanted tested bed red fed branded",
    "a an and are as at be but by for if in into is it",
    "  leading and trailing  ",
    "",
    "no-stopwords-here-at-all",
    "number9 x2 3d 42")

  test("column mirror == driver mirror: terms AND positions, every " +
    "chain, adversarial text") {
    for (chain <- Seq(Analyzer.Whitespace, Analyzer.Standard,
      Analyzer.English)) {
      val got = nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          Analyzer.posTerms(chain, "text").as("pt"))
        .as[(Long, Seq[(Long, String)])]
        .collect().toMap
      nasty.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == Analyzer.analyzeText(chain, t),
          s"chain=${chain.name} text='$t'")
      }
    }
  }

  test("the whitespace chain is bit-compatible with the pre-analyzer " +
    "pipeline: posexplode(split(text, ' ')) exactly, empties included") {
    val df = nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val old = df.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .select(col("doc_id"), col("pos").cast("long"), col("term"))
      .collect().toSeq
    val neu = df.select(col("doc_id"),
        explode(Analyzer.posTerms(Analyzer.Whitespace, "text")).as("pt"))
      .select(col("doc_id"), col("pt.pos"), col("pt.term"))
      .collect().toSeq
    assert(neu == old)
    // and dl == size(split(text, ' ')) — the pre-analyzer length
    assert(df.select(Analyzer.dl(Analyzer.Whitespace, "text"))
      .as[Long].collect().toSeq ==
      df.select(expr("bigint(size(split(text, ' ')))"))
        .as[Long].collect().toSeq)
  }

  test("stemmer rules: first-match-wins, guards exact") {
    val cases = Seq(
      "cities" -> "city", "ladies" -> "lady", "ties" -> "tie",
      "running" -> "runn", "sing" -> "sing", "string" -> "str",
      "wanted" -> "want", "bed" -> "bed", "red" -> "red",
      "dogs" -> "dog", "mass" -> "mass", "bus" -> "bus",
      "analysis" -> "analysis", "cats" -> "cat", "is" -> "is",
      "as" -> "as", "gas" -> "gas")
    cases.foreach { case (in, want) =>
      assert(Analyzer.stemScala(in) == want, s"stem($in)")
    }
    // and the SQL mirror says the same thing
    val got = cases.map(_._1).toDF("t")
      .select(expr(Analyzer.stemSql("t"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("queryTerms analyzes, drops stopwords, dedups; normalize " +
    "lowercases only; byName fails loudly on unknown chains") {
    val en = Analyzer.English
    assert(Analyzer.queryTerms(en, Seq("The", "Running", "DOGS",
      "dogs", "and")) == Seq("runn", "dog"))
    assert(Analyzer.queryTerms(Analyzer.Whitespace,
      Seq("The", "DOGS")) == Seq("The", "DOGS"))
    assert(Analyzer.normalize(en, "RuNN*") == "runn*")
    assert(Analyzer.normalize(Analyzer.Whitespace, "RuNN*") == "RuNN*")
    intercept[IllegalArgumentException] {
      Analyzer.byName("porter2")
    }
  }

  test("custom chains: canonical spec round-trips through byName; " +
    "tokens canonicalize through the base's own analysis") {
    val c = Analyzer.custom("english",
      extraStopwords = Seq("Tables", "zulu"),
      synonyms = Seq("FAST" -> "quick", "big" -> "large",
        "big" -> "huge"))
    // extras stem+lowercase (Tables → table), sort; synonyms likewise
    assert(c.name == "custom(base=english;stop=table,zulu;" +
      "syn=big>huge,big>large,fast>quick)", c.name)
    assert(Analyzer.byName(c.name) == c)
    assert(c.stopwordSet("table") && c.stopwordSet("the"))
    assert(c.synonymMap("big") == Seq("huge", "large"))
    // non-canonical (unsorted entries) / malformed specs fail loudly
    intercept[IllegalArgumentException](Analyzer.byName(
      "custom(base=english;syn=fast>quick,big>huge)"))
    intercept[IllegalArgumentException](Analyzer.byName(
      "custom(base=porter)"))
    intercept[IllegalArgumentException](Analyzer.byName(
      "custom(stop=x)"))
    // spec-breaking tokens are rejected as settings
    intercept[IllegalArgumentException](
      Analyzer.custom("english", Seq("two words")))
    intercept[IllegalArgumentException](
      Analyzer.custom("english", synonyms = Seq("a;b" -> "c")))
    // stopword-colliding synonyms are dead entries — rejected
    intercept[IllegalArgumentException](
      Analyzer.custom("english", synonyms = Seq("the" -> "thing")))
    intercept[IllegalArgumentException](
      Analyzer.custom("english", Seq("gone"),
        synonyms = Seq("fast" -> "gone")))
    // a synonym key that stems onto its value is a self-synonym
    intercept[IllegalArgumentException](
      Analyzer.custom("english", synonyms = Seq("dogs" -> "dog")))
    // the whitespace base is rejected: its bit-compat contract keeps
    // empty tokens the general filter path drops — layering settings
    // on it would silently shift the base semantics (posTerms
    // special-cases the pure chain by equality, not by base)
    intercept[IllegalArgumentException](
      Analyzer.custom("whitespace", Seq("x")))
    intercept[IllegalArgumentException](
      Analyzer.byName("custom(base=whitespace;stop=x)"))
  }

  test("synonym groups + query-time synonyms: the group " +
    "canonicalizes to its directed closure, qsyn expands ONLY " +
    "query-side analysis, the spec round-trips, collisions reject") {
    val c = Analyzer.customGroups("english",
      groups = Seq(Seq("BIG", "large")),
      queryGroups = Seq(Seq("ml", "ai")),
      querySynonyms = Seq("rapid" -> "fast"))
    // the canonical spec IS the closure — no group field survives
    // serialization, so federation headers compare exactly
    assert(c.name == "custom(base=english;syn=big>large,large>big;" +
      "qsyn=ai>ml,ml>ai,rapid>fast)", c.name)
    assert(Analyzer.byName(c.name) == c)
    // queryTerms expands qsyn (single-pass: 'fast' does not chain
    // further) with first-occurrence dedup; index-time synonyms
    // NEVER expand there
    assert(Analyzer.queryTerms(c, Seq("Rapid")) ==
      Seq("rapid", "fast"))
    assert(Analyzer.queryTerms(c, Seq("ml", "Rapid", "fast")) ==
      Seq("ml", "ai", "rapid", "fast"))
    assert(Analyzer.queryTerms(c, Seq("big")) == Seq("big"),
      "index-time entries must not expand at query time")
    // ingest analysis stacks the INDEX-time closure only — qsyn
    // never touches what the index stores
    assert(Analyzer.analyzeIngest(c, "rapid big") ==
      Seq((0L, "rapid"), (1L, "big"), (1L, "large")))
    // phrase analysis expands nothing (documented scope)
    assert(Analyzer.analyzeText(c, "rapid big") ==
      Seq((0L, "rapid"), (1L, "big")))
    // group validation: < 2 members / duplicates reject; stopword
    // collisions and self-maps reject for qsyn like syn
    intercept[IllegalArgumentException](
      Analyzer.customGroups("english", groups = Seq(Seq("solo"))))
    intercept[IllegalArgumentException](Analyzer.customGroups(
      "english", groups = Seq(Seq("dup", "dup"))))
    intercept[IllegalArgumentException](Analyzer.custom(
      "english", querySynonyms = Seq("the" -> "thing")))
    intercept[IllegalArgumentException](Analyzer.custom(
      "english", querySynonyms = Seq("thing" -> "the")))
    intercept[IllegalArgumentException](Analyzer.custom(
      "english", querySynonyms = Seq("dogs" -> "dog")))
  }

  test("index-time synonym expansion: the column mirror stacks " +
    "values at the key's position; query-side analysis never expands") {
    val c = Analyzer.custom("english",
      synonyms = Seq("fast" -> "quick", "big" -> "large",
        "big" -> "huge"))
    val got = Seq((1L, "The FAST big dog runs"))
      .toDF("doc_id", "text")
      .select(Analyzer.posTerms(c, "text").as("pt"))
      .as[Seq[(Long, String)]].collect().head
    // the@0 dropped (gap), fast@1 stacks quick@1, big@2 stacks its
    // canonically-ordered values huge@2+large@2, dog@3, runs→run@4
    assert(got == Seq((1L, "fast"), (1L, "quick"),
      (2L, "big"), (2L, "huge"), (2L, "large"),
      (3L, "dog"), (4L, "run")), got.toString)
    // driver ingest mirror agrees token for token
    assert(got == Analyzer.analyzeIngest(c, "The FAST big dog runs"))
    // the search-analyzer mirror does NOT expand
    assert(Analyzer.analyzeText(c, "The FAST big dog runs") ==
      Seq((1L, "fast"), (2L, "big"), (3L, "dog"), (4L, "run")))
    assert(Analyzer.queryTerms(c, Seq("FAST", "quick")) ==
      Seq("fast", "quick"))
    // dl counts stacked tokens (Lucene field length counts synonyms)
    assert(Seq(("The FAST big dog runs"))
      .toDF("text").select(Analyzer.dl(c, "text"))
      .as[Long].collect().head == 7L)
    // a custom chain with no synonyms behaves like its base + stops
    val cs = Analyzer.custom("standard", Seq("filler"))
    assert(Analyzer.analyzeText(cs, "Filler content here") ==
      Seq((1L, "content"), (2L, "here")))
  }

  test("multi-word (graph) synonyms are REFUSED loudly at chain " +
    "construction — never silently flattened (the one-term-per-" +
    "position contract)") {
    for (bad <- Seq(
      "nyc" -> "new york",       // multi-word value
      "big apple" -> "nyc",      // multi-word key
      "a_b" -> "c",              // separator chars are not tokens
      "x" -> "y,z"))
      withClue(s"synonym: $bad") {
        intercept[IllegalArgumentException] {
          Analyzer.custom("standard", synonyms = Seq(bad))
        }
        intercept[IllegalArgumentException] {
          Analyzer.custom("standard", querySynonyms = Seq(bad))
        }
      }
    // the same contract guards the group sugar
    intercept[IllegalArgumentException] {
      Analyzer.customGroups("standard",
        groups = Seq(Seq("nyc", "new york")))
    }
  }
}
