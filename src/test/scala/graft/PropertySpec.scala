package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Dedup, Indexer, TextOps}

/** Property-based invariants (SURVEY §5.2): JSON round-trips, hash
  * determinism/range, dedup idempotence, jaccard bounds — checked over
  * ScalaCheck-generated inputs (fixed seeds — the raw scalacheck dep is
  * driven directly; the scalatest bridge artifact is not available in
  * the offline cache), executed through the real Spark expressions.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOfN(8, word).map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("toJSON ∘ from_json is the identity on (id, text) rows") {
    samples(Gen.listOfN(5, text), 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val json = Indexer.toJsonDocs(df)
      val back = spark.read.json(json)
      val orig = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      val round = back.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(round.toSeq == orig.toSeq)
    }
  }

  test("charHash is deterministic and in [0, P)") {
    samples(Gen.listOfN(20, word), 3).foreach { words =>
      val df = words.toDF("w")
        .withColumn("h1", expr(TextOps.charHashExpr("w")))
        .withColumn("h2", expr(TextOps.charHashExpr("w")))
      val rows = df.select("h1", "h2").as[(Long, Long)].collect()
      assert(rows.forall { case (a, b) => a == b })
      assert(rows.forall { case (a, _) => a >= 0 && a < TextOps.HashP })
    }
  }

  test("jaccard of any doc with its copy is 1; bounds hold for all pairs") {
    samples(Gen.listOfN(6, text), 3).foreach { texts =>
      val distinct = texts.distinct.filter(_.split(" ").length >= 3)
      val df = distinct.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val doubled = df.union(df.withColumn("doc_id", col("doc_id") + 1000))
      val pairs = Dedup.ngramJaccardPairs(doubled, threshold = 0.0)
        .as[(Long, Long, Double)].collect()
      distinct.indices.foreach { i =>
        assert(pairs.exists(p =>
          p._1 == i && p._2 == i + 1000 && p._3 == 1.0))
      }
      assert(pairs.forall(p => p._3 > 0.0 && p._3 <= 1.0))
    }
  }

  test("packSequences conserves tokens and stays inside window bounds") {
    samples(Gen.listOfN(12, Gen.zip(text, Gen.oneOf("en", "zh"))), 3)
      .foreach { rows =>
        val df = rows.zipWithIndex
          .map { case ((t, l), i) => (i.toLong, l, t) }
          .toDF("doc_id", "lang", "text")
        val packed = graft.operators.Pipeline.packSequences(df, capacity = 16)
          .select("lang", "n_tokens", "cum_tokens", "window_id",
            "window_offset")
          .collect()
        // conservation: per stratum, max cumsum == total tokens
        packed.groupBy(_.getString(0)).foreach { case (_, g) =>
          assert(g.map(_.getLong(2)).max == g.map(_.getLong(1)).sum)
        }
        // offsets always inside a window; window ids consistent
        assert(packed.forall { r =>
          val off = r.getLong(4)
          off >= 0 && off < 16 &&
            r.getLong(3) == (r.getLong(2) - r.getLong(1)) / 16
        })
      }
  }

  test("dupClusters is idempotent: clustering canonical survivors is a no-op") {
    samples(Gen.listOfN(10, Gen.choose(1L, 8L)), 3).foreach { picks =>
      // random small graph over ids 1..8
      val ids = (1L to 8L).toDF("doc_id")
      val pairs = picks.grouped(2).collect {
        case Seq(a, b) if a != b => (math.min(a, b), math.max(a, b))
      }.toSeq.distinct.toDF("doc_a", "doc_b")
      val clusters = Dedup.dupClusters(ids, pairs)
      // every cluster id is a member of its own cluster (canonical exists)
      val m = clusters.select("doc_id", "cluster")
        .as[(Long, Long)].collect().toMap
      assert(m.values.forall(c => m(c) == c))
      // rerun on canonical survivors with no surviving edges: all singleton
      val survivors = clusters.filter(col("is_canonical")).select("doc_id")
      val again = Dedup.dupClusters(survivors,
        Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      assert(again.filter(!col("is_canonical")).count() == 0)
    }
  }

  test("dupClusters: adversarial-diameter 2^k chain converges in <= k+2 rounds") {
    // Pointer doubling contracts path length geometrically, so a chain of
    // 2^k nodes (diameter 2^k - 1) must resolve in O(k) rounds — plain
    // min-label propagation would take 2^k. k+2 = the doubling bound plus
    // one slack round plus the final no-change round that detects
    // convergence.
    val k = 6
    val n = 1L << k
    val ids = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (out, rounds) = Dedup.dupClustersCounted(ids, chain)
    val labels = out.select("doc_id", "cluster").as[(Long, Long)].collect()
    assert(labels.length == n && labels.forall(_._2 == 1L))
    assert(rounds <= k + 2,
      s"2^$k chain took $rounds rounds; pointer-doubling bound is ${k + 2}")
  }

  test("exact dedup is idempotent over arbitrary duplication") {
    samples(Gen.zip(Gen.listOfN(4, text), Gen.choose(2, 4)), 3).foreach {
      case (texts, copies) =>
        val rows = for {
          (t, i) <- texts.zipWithIndex
          c <- 0 until copies
        } yield ((i * 100 + c).toLong, t)
        val df = rows.toDF("doc_id", "text")
        val kept = Dedup.exactDedup(df).filter(!col("is_dup"))
          .select("doc_id", "text")
        assert(kept.count() == texts.distinct.length.toLong)
        assert(Dedup.exactDedup(kept).filter(col("is_dup")).count() == 0)
    }
  }

  test("editDistancePairs equals the all-pairs quadratic on random " +
    "short strings (deletion blocking is recall-1)") {
    import graft.operators.Fuzzy
    val shortWord = Gen.choose(3, 9)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString) // tiny alphabet → dense ed-1 neighborhoods
    samples(Gen.listOfN(30, shortWord), 3).foreach { words =>
      val df = words.distinct.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "s")
      val got = Fuzzy.editDistancePairs(df, "id", "s")
        .as[(Long, Long, Long)].collect().toSet
      val a = df.select(col("id").as("ia"), col("s").as("sa"))
      val b = df.select(col("id").as("ib"), col("s").as("sb"))
      val exact = a.crossJoin(b)
        .filter(col("ia") < col("ib") &&
          levenshtein(col("sa"), col("sb")) <= 1)
        .select(col("ia"), col("ib"),
          levenshtein(col("sa"), col("sb")).cast("long"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == exact, s"words=$words")
    }
  }

  test("snapshotAt is consistent under random CDC logs: last writer " +
    "wins per key, deletes stick until re-upserted") {
    import graft.operators.Pipeline
    val op = Gen.oneOf("U", "D")
    val entry = for {
      k <- Gen.choose(0L, 9L); o <- op; v <- word
    } yield (k, v, o)
    samples(Gen.listOfN(12, entry), 4).foreach { log0 =>
      // per-batch unique keys (the documented precondition): one
      // batch per entry keeps it trivially true
      val base = (0L to 4L).map(k => (k, s"base$k")).toDF("doc_id", "text")
      val batches = log0.map(e => Seq(e).toDF("doc_id", "text", "op"))
      val got = Pipeline.snapshotAt(base, batches, batches.size, "doc_id")
        .as[(Long, String)].collect().toMap
      // reference fold in plain Scala
      val expected = log0.foldLeft(
        (0L to 4L).map(k => k -> s"base$k").toMap) {
        case (m, (k, v, "U")) => m + (k -> v)
        case (m, (k, _, "D")) => m - k
        case (m, _) => m
      }
      assert(got == expected, s"log=$log0")
    }
  }

  test("maintainAgg equals recomputation for random single batches") {
    import graft.operators.Pipeline
    val entry = for {
      k <- Gen.choose(0L, 9L); o <- Gen.oneOf("U", "D")
      g <- Gen.oneOf("x", "y", "z"); v <- Gen.choose(1L, 100L)
    } yield (k, g, v, o)
    samples(Gen.listOfN(6, entry), 4).foreach { raw =>
      val batchRows = raw.groupBy(_._1).map(_._2.head).toSeq // unique keys
      val base = (0L to 7L).map(k =>
        (k, Seq("x", "y", "z")((k % 3).toInt), k * 10 + 1))
        .toDF("doc_id", "grp", "v")
      val batch = batchRows.toDF("doc_id", "grp", "v", "op")
      val maintained = Pipeline.maintainAgg(
        base.groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s")),
        base, batch, "doc_id", "grp", "v")
        .as[(String, Long, Long)].collect().toSet
      val recomputed = Pipeline.applyCdc(base, batch, "doc_id")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .as[(String, Long, Long)].collect().toSet
      assert(maintained == recomputed, s"batch=$batchRows")
    }
  }

  test("segmented index: any batch split of a random corpus answers " +
    "term search exactly like the ad-hoc corpus scan") {
    import graft.operators.{Search, SegmentedIndex}
    samples(Gen.zip(Gen.listOfN(8, text), Gen.choose(1, 7)), 3)
      .foreach { case (texts, cut) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val root = java.nio.file.Files
          .createTempDirectory("graft-prop-sx").toString
        SegmentedIndex.append(spark, root,
          docs.filter(col("doc_id") < cut), "a", nBuckets = 4)
        SegmentedIndex.append(spark, root,
          docs.filter(col("doc_id") >= cut), "b")
        // query the three globally most frequent words of this corpus
        val terms = texts.flatMap(_.split(" "))
          .groupBy(identity).toSeq
          .sortBy { case (w, o) => (-o.size, w) }.take(3).map(_._1)
        val got = SegmentedIndex.search(spark, root, terms, 100)
          .as[(Long, Double, Long)].collect().toSeq
        val want = Search.search(docs, terms, 100)
          .as[(Long, Double, Long)].collect().toSeq
        assert(got == want,
          s"cut=$cut terms=$terms\ngot= $got\nwant=$want")
      }
  }

  test("search_after paging: for any random corpus and page size, " +
    "the page concatenation equals the one-shot ranking with no " +
    "overlap or skip") {
    import graft.operators.SegmentedIndex
    samples(Gen.zip(Gen.listOfN(10, text), Gen.choose(1, 4)), 3)
      .foreach { case (texts, pageSize) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val root = java.nio.file.Files
          .createTempDirectory("graft-prop-sa").toString
        SegmentedIndex.append(spark, root, docs, "a", nBuckets = 4)
        val terms = texts.flatMap(_.split(" "))
          .groupBy(identity).toSeq
          .sortBy { case (w, o) => (-o.size, w) }.take(3).map(_._1)
        val full = SegmentedIndex.search(spark, root, terms, 1000)
          .as[(Long, Double, Long)].collect().toSeq
        var pages = Seq(SegmentedIndex
          .search(spark, root, terms, pageSize)
          .as[(Long, Double, Long)].collect().toSeq)
        while (pages.last.size == pageSize) {
          val cur = pages.last.last
          pages = pages :+ SegmentedIndex
            .searchAfter(spark, root, terms, pageSize, cur._2, cur._1)
            .as[(Long, Double, Long)].collect().toSeq
        }
        assert(pages.flatten == full,
          s"pageSize=$pageSize terms=$terms\n" +
            s"pages=${pages.flatten}\nfull= $full")
      }
  }

  test("dynamic pruning is EXACT on random corpora, query shapes and " +
    "k: both pruned scorers (tf·idf MaxScore and WAND BM25) equal " +
    "their exhaustive twins bitwise") {
    import graft.operators.SegmentedIndex
    samples(Gen.zip(Gen.listOfN(14, text), Gen.choose(1, 6)), 3)
      .foreach { case (texts, k) =>
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val root = java.nio.file.Files
          .createTempDirectory("graft-prop-wand").toString
        SegmentedIndex.append(spark, root, docs, "a", nBuckets = 4)
        // query: the most frequent + a middling + a rare word — the
        // shape dynamic pruning exists for
        val byFreq = texts.flatMap(_.split(" "))
          .groupBy(identity).toSeq
          .sortBy { case (w, o) => (-o.size, w) }.map(_._1)
        val terms = (byFreq.take(1) ++
          byFreq.slice(byFreq.size / 2, byFreq.size / 2 + 1) ++
          byFreq.takeRight(1)).distinct
        assert(SegmentedIndex.maxScoreSearch(spark, root, terms, k)
          .as[(Long, Double, Long)].collect().toSeq ==
          SegmentedIndex.search(spark, root, terms, k)
            .as[(Long, Double, Long)].collect().toSeq,
          s"maxScoreSearch diverged: terms=$terms k=$k corpus=$texts")
        assert(SegmentedIndex.bm25MaxScoreTopK(spark, root, terms, k)
          .as[(Long, Double, Long)].collect().toSeq ==
          SegmentedIndex.bm25ExhaustiveTopK(spark, root, terms, k)
            .as[(Long, Double, Long)].collect().toSeq,
          s"bm25MaxScoreTopK diverged: terms=$terms k=$k corpus=$texts")
      }
  }

  test("analyzer mirrors agree on RANDOM ASCII text: the column " +
    "pipeline and the driver pipeline emit identical (pos, term) " +
    "sequences for every chain") {
    import graft.operators.Analyzer
    // mixed-case words, punctuation runs, digits, stopwords, empties
    val chunk = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString),
      Gen.oneOf(Analyzer.EnglishStopwords),
      Gen.nonEmptyListOf(Gen.oneOf(' ', '.', ',', '-', '!', ';'))
        .map(_.mkString),
      Gen.choose(0, 999).map(_.toString))
    val messy = Gen.listOfN(12, chunk).map(_.mkString(" "))
    // a custom chain exercises the settings tier: extra stopwords +
    // index-time synonym stacking (the ingest mirror is
    // analyzeIngest; for the synonym-free chains it IS analyzeText)
    val chains = Seq(Analyzer.Whitespace, Analyzer.Standard,
      Analyzer.English,
      Analyzer.custom("english", extraStopwords = Seq("zzz"),
        synonyms = Seq("cat" -> "feline", "dog" -> "canine",
          "dog" -> "hound")))
    samples(Gen.listOfN(8, messy), 4).foreach { texts =>
      // splice synonym keys/extra stopwords into some rows so the
      // expansion path actually fires on random surroundings
      val spiced = texts.zipWithIndex.map { case (t, i) =>
        if (i % 3 == 0) s"dog $t zzz cat" else t }
      val df = spiced.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (chain <- chains) {
        val got = df.select(col("doc_id"),
            Analyzer.posTerms(chain, "text").as("pt"))
          .as[(Long, Seq[(Long, String)])].collect().toMap
        spiced.zipWithIndex.foreach { case (t, i) =>
          assert(got(i.toLong) == Analyzer.analyzeIngest(chain, t),
            s"chain=${chain.name} text='$t'")
        }
      }
    }
  }

  test("parseSqs is total: random operator soup never throws, and " +
    "every bucketed token came from the input") {
    val soupChar = Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf(
      '+', '-', '"', '|', ' ', ' ', '(', ')', '*', '~'))
    val soup = Gen.listOfN(40, soupChar).map(_.mkString)
    samples(soup, 200).foreach { q =>
      val p = graft.operators.SegmentedIndex.parseSqs(q) // must not throw
      val toks = p.mustTerms ++ p.shouldTerms ++ p.mustNotTerms ++
        (p.mustPhrases ++ p.shouldPhrases ++ p.mustNotPhrases).flatten
      toks.foreach { t =>
        assert(t.nonEmpty && q.contains(t), s"q='$q' tok='$t'")
      }
    }
  }

  test("QueryString.parse is total-or-stated: random grammar soup " +
    "either parses or throws the documented IllegalArgumentException " +
    "— never an index/match error") {
    val soupChar = Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf(
      '(', ')', '"', '^', '~', '*', ':', '!', '&', '|', '[', ']',
      ' ', ' ', '2', '.', '+', '-', '?'))
    val soup = Gen.listOfN(30, soupChar).map(_.mkString)
    val words = Gen.listOfN(8, Gen.oneOf("AND", "OR", "NOT", "a",
      "f:b", "c^2", "\"d e\"", "NOT", "(", ")", "x~1", "pre*",
      "_exists_:f", "n:[1 TO 5]", "+m", "-n", "w?ld*", "\"d e\"~2",
      ")^2")).map(_.mkString(" "))
    (samples(soup, 150) ++ samples(words, 150)).foreach { q =>
      try { graft.operators.QueryString.parse(q); () }
      catch {
        case _: IllegalArgumentException => () // the stated contract
        case e: Throwable =>
          fail(s"q='$q' threw ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("geohashKey equals a reference bisection implementation on " +
    "random coordinates, at every precision") {
    import graft.operators.GeoOps
    // classic geohash by interval bisection — the independently
    // derived reference the closed form must reproduce
    def reference(lat: Double, lon: Double, precision: Int): String = {
      val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      var even = true
      val sb = new StringBuilder
      var bits = 0; var ch = 0
      while (sb.length < precision) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
          else { ch = ch << 1; lonHi = mid }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
          else { ch = ch << 1; latHi = mid }
        }
        even = !even; bits += 1
        if (bits == 5) { sb.append(alphabet(ch)); bits = 0; ch = 0 }
      }
      sb.toString
    }
    val coord = for {
      lat <- Gen.chooseNum(-89.99, 89.99)
      lon <- Gen.chooseNum(-179.99, 179.99)
    } yield (lat, lon)
    val pts = samples(coord, 60)
    for (precision <- Seq(1, 3, 5, 7)) {
      val got = pts.toDF("lat", "lon")
        .select(GeoOps.geohashKey(col("lat"), col("lon"), precision))
        .as[String].collect().toSeq
      pts.zip(got).foreach { case ((la, lo), h) =>
        assert(h == reference(la, lo, precision),
          s"($la, $lo) p=$precision got=$h")
      }
    }
  }
}
