package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox", "en"),
    (2L, "el perro que corre y salta", "es"),
    (3L, "le chat et le chien", "fr"),
    (4L, "der hund und die katze ist da", "de"),
    (5L, "xyzzy plugh qwerty", "??"))
    .toDF("doc_id", "text", "lang")

  test("charHash matches the reference fold (portable to DuckDB)") {
    // h('spark') via (h*31+ascii) % 1000003 = 638038 (cross-checked in
    // DuckDB: list_reduce([0] || ascii chars, same fold))
    val h = spark.range(1).select(
      expr(TextOps.charHashExpr("'spark'")).as("h")).as[Long].head()
    assert(h == 638038L)
  }

  test("shingles: distinct word 3-grams; empty under 3 tokens") {
    val sh = TextOps.withShingles(Seq((1L, "a b c d"), (2L, "a b"))
        .toDF("doc_id", "text"))
      .select("doc_id", "shingles").as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq.empty)
  }

  test("langid predicts by stopword markers with deterministic tie-break") {
    val out = TextOps.withLangId(docs)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(4L) == "de")
    assert(out(5L) == "und") // no markers hit
  }

  test("quality score is in [0,1] and penalizes stopword-heavy docs") {
    val q = TextOps.withQuality(docs)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    val stopHeavy = TextOps.withQuality(
      Seq((9L, "the the the the the the")).toDF("doc_id", "text"))
      .select("quality").as[Double].head()
    assert(stopHeavy < q(5L)) // all-stopword doc scores below content doc
  }

  test("token counts: whitespace vs BPE-ish subword chunks") {
    val out = TextOps.withTokenCounts(
      Seq((1L, "hello worldwide ab")).toDF("doc_id", "text"))
      .select("n_ws_tokens", "n_subword_tokens").as[(Long, Long)].head()
    assert(out._1 == 3L)
    // hello→[hell,o], worldwide→[worl,dwid,e], ab→[ab] = 6 chunks
    assert(out._2 == 6L)
  }

  test("fingerprint is order-sensitive (unlike set similarity)") {
    val fp = TextOps.withFingerprint(Seq(
        (1L, "a b c"), (2L, "c b a"), (3L, "a b c"))
      .toDF("doc_id", "text"))
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("subwordVocab: greedy chunks counted corpus-wide, df <= n") {
    val vocab = TextOps.subwordVocab(Seq(
        (1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'alph'+'a' from alpha, 'beta', 'gamm'+'a' from gamma
    val m = vocab.map(v => v._1 -> v).toMap
    assert(m("beta") == ("beta", 2L, 2L))
    assert(m("a")._2 == 3L) // two alphas + gamma tail
    assert(vocab.forall(v => v._3 <= v._2))
    // ordered by frequency desc then subword asc
    assert(vocab.sortBy(v => (-v._2, v._1)).toSeq == vocab.toSeq)
  }

  private def merges(text: String, rounds: Int) =
    TextOps.bpeMerges(Seq((1L, text)).toDF("doc_id", "text"), rounds)
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("bpeMerges: textbook trajectory with count-weighted dictionary") {
    // low×3 lower lowest: (l,o) ties (o,w) at 5, l < o breaks it; the
    // merged symbol then participates in the next round's pairs
    assert(merges("low low low lower lowest", 3) == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "e", "lowe", 2L)))
  }

  test("bpeMerges: runs merge greedily left-to-right, non-overlapping") {
    // 'aaaa' pairs count overlaps ((a,a)×3 per word) but the merge is
    // greedy: aaaa → (aa)(aa), so round 2 can merge (aa,aa). A
    // boundary-consuming replace would leave aa,a,a and fail this.
    assert(merges("aaaa aaaa ab", 3) == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L),
      (3, "a", "b", "ab", 1L)))
  }

  test("bpeMerges: alternating occurrences all merge") {
    // abab → (ab)(ab): the second occurrence must not lose its leading
    // boundary to the first one's match
    assert(merges("abab abab ababab", 3) == Seq(
      (1, "a", "b", "ab", 7L),
      (2, "ab", "ab", "abab", 4L),
      (3, "abab", "ab", "ababab", 1L)))
  }

  test("bpeMerges: merged symbol pairs with a preceding single char") {
    assert(merges("aaa baaa aa", 3) == Seq(
      (1, "a", "a", "aa", 5L),
      (2, "aa", "a", "aaa", 2L),
      (3, "b", "aaa", "baaa", 1L)))
  }

  test("bpeEncode: per-doc counts match hand-applied merges") {
    // corpus dict: low×4, lower×1, lowest×1 → merges (l,o), (lo,w),
    // (low,e); encoded: low→[low]=1, lower→[lowe,r]=2,
    // lowest→[lowe,s,t]=3
    val out = TextOps.bpeEncode(
      Seq((1L, "low low low"), (2L, "lower lowest low"))
        .toDF("doc_id", "text"), rounds = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 9L, 3L)))  // 3 words, 9 chars, 3 subwords
    assert(out(2L) == ((3L, 14L, 6L))) // 2 + 3 + 1 subwords
  }

  test("unigramLmScore: frequency moments from exact corpus counts") {
    val d = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramLmScore(d)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // freq: a=2, b=2, c=1
    assert(out(1L) == ((3L, 6L, 2L, 2.0)))
    assert(out(2L) == ((2L, 3L, 1L, 1.5)))
  }

  test("bpeEncode: more merges never increase the encoded length") {
    val docs = Seq((1L, "abab abab cdcd"), (2L, "ab cd abab"))
      .toDF("doc_id", "text")
    def total(rounds: Int): Long =
      TextOps.bpeEncode(docs, rounds)
        .agg(sum("n_bpe_tokens")).as[Long].head()
    val t1 = total(1); val t2 = total(2); val t4 = total(4)
    assert(t1 >= t2 && t2 >= t4)
    // and encoding is bounded: n_words <= n_bpe_tokens <= n_chars
    val rows = TextOps.bpeEncode(docs, 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(r => r._2 <= r._4 && r._4 <= r._3))
  }

  test("bpe loop stops early when the vocabulary is fully merged") {
    // "ab" is the only word: round 1 merges (a,b), after which no pair
    // remains — a 64-round request must return a 1-row merge table
    // rather than emptying the dictionary or spinning 63 no-op jobs
    val docs = Seq((1L, "ab ab"), (2L, "ab")).toDF("doc_id", "text")
    val m = TextOps.bpeMerges(docs, rounds = 64)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "b", "ab", 3L)))
    // encode still works off the exhausted dictionary: 1 subword/word
    val e = TextOps.bpeEncode(docs, rounds = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(e(1L) == ((2L, 4L, 2L)) && e(2L) == ((1L, 2L, 1L)))
  }

  test("bpeEncode/bpeMerges: repeated calls leave no session cache behind") {
    // The learn loop pins the corpus pass + one 1-row frame per round;
    // a leak means every call outside a harness's clearCache()
    // accumulates rounds+1 MEMORY_AND_DISK frames. After the fix the
    // only blocks left are each returned frame's own localCheckpoint
    // (lifetime tied to the frame, freed by the ContextCleaner when it
    // is dropped) — so 3 calls must add at most 3 persistent RDDs, not
    // 3 * (rounds + 1).
    val docs = Seq((1L, "low low lower lowest"), (2L, "ab ab abba"))
      .toDF("doc_id", "text")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val rounds = 3
    val r1 = TextOps.bpeEncode(docs, rounds); r1.count()
    val r2 = TextOps.bpeEncode(docs, rounds); r2.count()
    val r3 = TextOps.bpeMerges(docs, rounds); r3.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 3,
      s"bpe calls leaked ${after - before} persisted frames " +
        s"(expected <=3 checkpoint blocks for 3 live results)")
  }

  test("bpe local and distributed paths learn the identical merge table " +
    "and rewritten dictionary") {
    // realistic mixed corpus off the fixture — exercises ties,
    // repeated pairs and merge exhaustion edges in both paths
    val fixture = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val rounds = 12
    val (c1, d1, w1) = TextOps.bpeLoop(fixture, rounds)
    val (c2, d2, w2) = TextOps.bpeLoop(fixture, rounds,
      forceDistributed = true)
    assert(w1 == w2, s"merge tables diverged:\nlocal=$w1\ndist =$w2")
    val s1 = d1.select("word", "seq").as[(String, String)].collect().toMap
    val s2 = d2.select("word", "seq").as[(String, String)].collect().toMap
    assert(s1 == s2, "rewritten dictionaries diverged")
    c1.unpersist(); c2.unpersist(); ()
  }

  test("scrubPii redacts all occurrences of every pattern kind") {
    val in = Seq(
      (1L, "mail a.b-c%d@sub.example.org and x@y.io twice"),
      (2L, "ids 123-45-6789 then 000-00-0000 end"),
      (3L, "call +18005551212 or +1234567"),
      (4L, "host 10.0.0.1 peer 192.168.255.254"),
      (5L, "mixed u@ex.com 111-22-3333 +9998887 172.16.0.9"))
      .toDF("doc_id", "text")
    val out = in.select(col("doc_id"),
        TextOps.scrubPii(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> and <EMAIL> twice")
    assert(out(2L) == "ids <ID> then <ID> end")
    assert(out(3L) == "call <PHONE> or <PHONE>")
    assert(out(4L) == "host <IP> peer <IP>")
    assert(out(5L) == "mixed <EMAIL> <ID> <PHONE> <IP>")
  }

  test("scrubPii leaves near-misses alone and is idempotent") {
    val in = Seq(
      (1L, "not-an-email a@b no tld"),       // missing .tld
      (2L, "not-an-ip 1.2.3 and 1.2.3.4.5"), // 3 octets / embedded run
      (3L, "not-an-id x123-45-6789y"),       // no word boundary
      (4L, "bare 12345678 digits"))          // phone needs leading +
      .toDF("doc_id", "text")
    val out = in.select(col("doc_id"),
        TextOps.scrubPii(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "not-an-email a@b no tld")
    // "1.2.3.4.5": the first 4 octets match at a word boundary; the
    // RE2/Java-shared \b semantics keep this deterministic cross-engine
    assert(out(2L) == "not-an-ip 1.2.3 and <IP>.5")
    assert(out(3L) == "not-an-id x123-45-6789y")
    assert(out(4L) == "bare 12345678 digits")
    // idempotence: replacement tokens match no pattern
    val once = in.select(TextOps.scrubPii(col("text")).as("s"))
    val twice = once.select(TextOps.scrubPii(col("s")).as("s"))
    assert(once.as[String].collect().toSeq ==
      twice.as[String].collect().toSeq)
  }

  test("piiCounts audits the original text per kind") {
    val in = Seq((1L, "u@ex.com v@ex.com 111-22-3333 10.0.0.1"))
      .toDF("doc_id", "text")
    val counted = TextOps.piiCounts(col("text"))
      .foldLeft(in) { case (df, (n, c)) => df.withColumn(n, c) }
    val r = counted.select("n_emails", "n_ids", "n_phones", "n_ips")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((2L, 1L, 0L, 1L)))
  }
}
