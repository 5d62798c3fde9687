package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("editDistancePairs finds each edit-distance-1 shape " +
    "(substitution, insertion, deletion, equality) and rejects ed-2") {
    val strings = Seq(
      (1L, "kitten"),
      (2L, "kitzen"),  // substitution of 1
      (3L, "kittten"), // insertion into 1
      (4L, "kiten"),   // deletion from 1
      (5L, "kitten"),  // equal to 1
      (6L, "kizzen"),  // ed 2 from 1 (shares a deletion variant with 2)
      (7L, "unrelated"))
      .toDF("id", "s")
    val out = Fuzzy.editDistancePairs(strings, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 2L, 1L)), "substitution")
    assert(out.contains((1L, 3L, 1L)), "insertion")
    assert(out.contains((1L, 4L, 1L)), "deletion")
    assert(out.contains((1L, 5L, 0L)), "equality")
    // ed-2 collides in blocking (delete a different char from each
    // side) but the exact verify must reject it
    assert(!out.exists(p => p._1 == 1L && p._2 == 6L), "ed-2 rejected")
    assert(out.contains((2L, 6L, 1L)), "the true ed-1 neighbor of 6")
    assert(!out.exists(p => p._1 == 7L || p._2 == 7L), "unrelated clean")
  }

  test("editDistancePairs maxDist=2 finds every 2-edit shape on " +
    "length-6+ strings and applies the Lucene length rule") {
    val strings = Seq(
      (1L, "abcdefgh"),
      (2L, "abdefh"),   // two deletions from 1 (c, g removed)
      (3L, "xbcdefgx"), // two substitutions of 1 (ends swapped out)
      (4L, "xbcdefg"),  // substitution + deletion vs 1
      (5L, "vector"),
      (6L, "vectro"),   // transposition = two substitutions, dist 2
      (7L, "abcde"),
      (8L, "axcdy"),    // dist 2 from 7 but BOTH sides are length 5
      (9L, "abcdzzzz"), // dist 4 from 1 — blocked collisions must die
      (10L, "abcdefgx")) // dist 1 from 1 — depth-1 behavior intact
      .toDF("id", "s")
    val out = Fuzzy.editDistancePairs(strings, "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 2L, 2L)), "two deletions / two insertions")
    assert(out.contains((1L, 3L, 2L)), "two substitutions")
    assert(out.contains((1L, 4L, 2L)), "substitution + deletion")
    assert(out.contains((5L, 6L, 2L)), "transposition (as 2 subs)")
    assert(out.contains((1L, 10L, 1L)), "distance-1 pair still found")
    assert(!out.exists(p => p._1 == 7L && p._2 == 8L),
      "length-5 sides must stay at allowance 1 (Lucene AUTO rule)")
    assert(!out.exists(p => p._1 == 1L && p._2 == 9L), "dist-4 rejected")
    // maxDist=1 run on the same corpus: no distance-2 pair leaks
    val d1 = Fuzzy.editDistancePairs(strings, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(d1.forall(_._3 <= 1) && !d1.contains((1L, 2L, 2L)))
  }

  test("editDistancePairs maxDist=2 matches the all-pairs quadratic " +
    "under the per-pair allowance (blocking is recall-1 at depth 2)") {
    val titles = spark.read.parquet(s"$sf001/documents.parquet")
      .limit(60)
      .select(col("doc_id").as("id"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, 3))").as("s"))
      .cache()
    val blocked = Fuzzy.editDistancePairs(titles, "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val a = titles.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = titles.select(col("id").as("id_b"), col("s").as("s_b"))
    val exact = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("s_a"), col("s_b")) <=
          when(length(col("s_a")) >= 6 && length(col("s_b")) >= 6,
            lit(2)).otherwise(lit(1)))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == exact)
    titles.unpersist()
  }

  test("editDistancePairs matches the all-pairs quadratic on a " +
    "derived-title corpus (blocking is recall-1)") {
    val titles = spark.read.parquet(s"$sf001/documents.parquet")
      .limit(80)
      .select(col("doc_id").as("id"),
        expr("concat_ws(' ', slice(split(text, ' '), 1, 6))").as("s"))
      .cache()
    val blocked = Fuzzy.editDistancePairs(titles, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    val a = titles.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = titles.select(col("id").as("id_b"), col("s").as("s_b"))
    val exact = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        levenshtein(col("s_a"), col("s_b")) <= 1)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == exact)
    titles.unpersist()
  }

  private def quoteDocs = Seq(
    (1L, "a b c d e f g h i j k l m n o p q r s t"),
    // 2 = the first 10 tokens of 1: containment(2 -> 1) = 1.0
    (2L, "a b c d e f g h i j"),
    // 3 shares a prefix but diverges: containment < 0.8 both ways
    (3L, "a b c d e f zz yy xx ww vv uu"),
    (4L, "totally different words in this unrelated document text here"))
    .toDF("doc_id", "text")

  test("containmentPairs reports the contained side only, with exact " +
    "integer counts and the threshold respected") {
    val out = Fuzzy.containmentPairs(quoteDocs, n = 5, tauNum = 4,
      tauDen = 5)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // doc 2: 6 shingles, all inside doc 1
    assert(out.contains((2L, 1L, 6L, 6L, 1.0)), s"got $out")
    // the asymmetry: doc 1 (16 shingles, 6 shared) is NOT contained
    assert(!out.exists(p => p._1 == 1L), "container side not reported")
    // doc 3: 8 shingles, 2 shared with 1 → 0.25 < 0.8
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentPairs prefix filtering matches the exact " +
    "shared-shingle join on a real corpus slice (recall-1)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .limit(60).select("doc_id", "text").cache()
    val quotes = docs.filter(col("doc_id") % 10 === 3)
      .withColumn("toks", split(col("text"), " "))
      .select((col("doc_id") + lit(1000L)).as("doc_id"),
        expr("concat_ws(' ', slice(toks, 1, " +
          "cast((2 * size(toks) + 4) div 5 as int)))").as("text"))
    val corpus = docs.unionByName(quotes).cache()
    val got = Fuzzy.containmentPairs(corpus, n = 5, tauNum = 4, tauDen = 5)
      .select("a_id", "b_id", "n_shared", "n_a")
      .as[(Long, Long, Long, Long)].collect().toSet
    // exact twin: all intersecting pairs via the full shingle join
    val sh = graft.operators.TextOps.withShingles(corpus, 5)
      .select(col("doc_id"), explode(col("shingles")).as("g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.select(col("doc_id").as("a_id"), col("g"))
      .join(sh.select(col("doc_id").as("b_id"), col("g")), "g")
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("n_a")),
        "a_id")
      .filter(col("n_shared") * 5 >= col("n_a") * 4)
      .select("a_id", "b_id", "n_shared", "n_a")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == exact)
    assert(got.nonEmpty, "planted quotes must surface")
    corpus.unpersist(); docs.unpersist()
  }

  test("containmentPairs: a doc below the shingle width emits nothing " +
    "and cannot divide by zero") {
    val d = Seq((1L, "a b"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Fuzzy.containmentPairs(d, n = 5, tauNum = 4, tauDen = 5)
    assert(out.count() == 0)
  }
}
