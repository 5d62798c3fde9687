package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text search operators — the native rebuild of what the reference
  * outsources to Elasticsearch/Lucene (`api/controllers/
  * elastic_controller.go:196-229` pushes raw docs; analysis, the inverted
  * index and scoring all happen inside ES). Here they are Spark plans:
  *
  *  - analysis: tokenize (codegen'd `split`, [[TextOps.tokens]]);
  *  - inverted index: term → postings via explode + groupBy — ONE shuffle
  *    keyed by term, partial-aggregated map-side; at scale this is
  *    written out bucketed by term so lookups prune to one bucket;
  *  - scoring: tf × idf with idf as the raw N/df ratio (log-free, so the
  *    score is pure IEEE mul/div — bit-identical across engines; swap in
  *    `log` for production BM25 once cross-engine bit-equality is not a
  *    test requirement).
  */
object Search {

  /** The double-exactness envelope for the integer rank-key audits:
    * every integer at or beyond 2^53 stops being exactly
    * representable, so a rank certificate built on larger values
    * fails loudly instead of certifying rounded ordering. */
  private[operators] val TwoTo53: Double = 9007199254740992.0d

  /** Postings: one row per (term, doc) with the term frequency. */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens("text")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Fuzzy term search — the reference's Elasticsearch `fuzziness`
    * capability (`/root/reference/api/controllers/elastic_controller.go:197-224`
    * delegates matching to Lucene, whose fuzzy queries are per-segment
    * Levenshtein automata): each query term expands to every
    * vocabulary term within edit distance 1, and each (query term,
    * matched term) pair returns its top-k documents by tf·idf.
    *
    * Resolution uses the SymSpell deletion-variant blocking from
    * [[graft.operators.Fuzzy]], asymmetrically: the QUERY side's
    * variants are a driver-side literal (|terms|·|term|+1 strings —
    * query-bounded, never corpus-bounded), the VOCABULARY side
    * explodes its variants once and probes the broadcast literal — so
    * the vocabulary is never cross-joined with anything, and the
    * exact `levenshtein` verify runs on candidates only. Per-pair
    * scoring is a single mul/div chain (no cross-term float sums), so
    * every emitted score is bitwise cross-engine even though the
    * matched term set is data-dependent.
    *
    * `maxDist = 2` is Lucene's AUTO fuzziness: a QUERY term of length
    * ≥ 6 allows two edits, shorter terms one — and the vocabulary
    * side generates depth-2 variants only for its own length-≥6
    * terms, which is sufficient for recall 1 under that allowance:
    * a 2-edit match with two substitutions forces equal lengths (both
    * ≥ 6), insertions only lengthen the vocab term, and deletions
    * are covered by depth ≤ 1 on the shorter side — so the only
    * vocab terms that ever NEED depth 2 are themselves ≥ 6 chars
    * (FuzzySpec pins every edit shape). The blow-up is bounded:
    * depth 2 is O(|term|²/2) variants, applied only where the
    * allowance can use it.
    *
    * Output: (q_term, term, dist, doc_id, tfidf, rank).
    */
  def fuzzySearch(docs: DataFrame, terms: Seq[String],
                  k: Int, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2: $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._
    val p = postings(docs)
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    def del1(s: String): Seq[String] =
      s +: s.indices.map(i => s.take(i) + s.drop(i + 1))
    def variants(s: String): Seq[String] =
      if (maxDist == 2 && s.length >= 6)
        (del1(s) ++ del1(s).flatMap(del1)).distinct
      else del1(s)
    val qv = terms.flatMap(t => variants(t).map(v => (t, v))).distinct
      .toDF("q_term", "v")
    val cand = p.select("term").distinct()
      .withColumn("v", explode(expr(Fuzzy.delAutoExpr("term", maxDist))))
      .join(broadcast(qv), "v")
      .filter(levenshtein(col("term"), col("q_term")) <=
        when(length(col("q_term")) >= 6, lit(maxDist)).otherwise(lit(1)))
      .select("q_term", "term").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_term", "term")
      .orderBy(desc("tfidf"), asc("doc_id"))
    cand.join(p, "term")
      .join(dfreq, "term")
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", col("tf").cast("double") *
        (col("n_docs") / col("doc_freq").cast("double")))
      .withColumn("dist",
        levenshtein(col("q_term"), col("term")).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_term", "term", "dist", "doc_id", "tfidf", "rank")
      .orderBy("q_term", "term", "rank")
  }

  /** Search-result highlighting — the ES `highlight` response feature
    * (the reference's search results come back from Elasticsearch with
    * Lucene-built snippets): for every document containing ANY query
    * term, extract a ±`window`-token snippet around the FIRST
    * occurrence and wrap each query term inside it in `[...]` markers.
    * Pure per-row codegen'd array expressions — no shuffle, no UDF;
    * the first-occurrence rule and fixed window make the snippet a
    * deterministic function of the document, so it oracles exactly.
    * Output: (doc_id, pos, n_hits, snippet); non-matching docs drop.
    */
  /** A string as a Spark SQL single-quoted literal, backslash and
    * quote escaped — for analyzed terms embedded in `expr` strings
    * (under the whitespace chain a term can contain ANY character,
    * including a quote that would otherwise break or inject into the
    * expression). */
  private[operators] def sqlLit(t: String): String =
    "'" + t.replace("\\", "\\\\").replace("'", "\\'") + "'"

  def highlight(docs: DataFrame, terms: Seq[String],
                window: Int = 3): DataFrame = {
    val arr = terms.map(sqlLit).mkString(", ")
    docs
      .withColumn("toks", TextOps.tokens("text"))
      // first occurrence of ANY term: min over per-term first
      // positions (array_position is 1-based, 0 = absent)
      .withColumn("pos", expr(
        s"array_min(filter(transform(array($arr), " +
          "t -> array_position(toks, t)), x -> x > 0))"))
      .filter(col("pos").isNotNull)
      .withColumn("lo", greatest(lit(1L), col("pos") - window))
      .withColumn("snippet", expr(
        s"concat_ws(' ', transform(slice(toks, int(lo), " +
          s"${2 * window + 1}), " +
          s"t -> if(array_contains(array($arr), t), " +
          "concat('[', t, ']'), t)))"))
      .withColumn("n_hits", expr(
        s"bigint(size(filter(toks, t -> array_contains(array($arr), t))))"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("n_hits"), col("snippet"))
      .orderBy("doc_id")
  }

  /** Inverted index: term → document frequency, total tf and the posting
    * list (doc-id-sorted for deterministic output).
    */
  def invertedIndex(docs: DataFrame): DataFrame =
    postings(docs)
      .groupBy("term")
      .agg(count(lit(1)).as("doc_freq"),
        sum("tf").as("total_tf"),
        sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))

  /** Term search with tf-idf-ish ranking: score(doc) = Σ_terms tf ×
    * (N / df). Query terms are a literal set → the postings filter
    * pushes down to the term key; only matching postings are read.
    */
  /** Persist the inverted index as a catalog table bucketed by term:
    * a term lookup then scans only the buckets containing the queried
    * terms (bucket pruning — `SelectedBucketsCount` in the plan) plus
    * benefits from the parquet min/max term filter inside each bucket.
    * This is the write-once/query-many posture the SCALE.md story
    * requires of a 100 TB index; `numBuckets` sizes to corpus vocab.
    */
  def writeIndex(docs: DataFrame, tableName: String,
                 numBuckets: Int = 8): Unit = {
    graft.engine.Bucketing.dropTableAndLocation(docs.sparkSession, tableName)
    postings(docs)
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, "term")
      .sortBy("term")
      .saveAsTable(tableName)
  }

  /** Bucket-pruned postings lookup for a literal term set.
    * `autoBucketedScan` must be off (a session-wide Tuning default):
    * the planner's heuristic drops the bucketed read (and with it,
    * bucket pruning) when no join/agg exploits the bucketing — but
    * pruning IS the benefit here.
    */
  def lookup(spark: org.apache.spark.sql.SparkSession, tableName: String,
             terms: Seq[String]): DataFrame =
    // isin over literals, not string-spliced SQL: terms are caller data
    // (a quote in a term must stay data, never become syntax).
    spark.table(tableName).filter(col("term").isin(terms: _*))

  /** Positional postings: one row per (term, doc, 0-based position) —
    * the positional inverted index exact-phrase queries need (what
    * Lucene stores when a field is indexed with positions). `pos` is
    * widened to long up front so downstream arithmetic and the oracle
    * agree on types.
    */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(TextOps.tokens("text")).as(Seq("pos", "term")))
      .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"))

  /** Persist the POSITIONAL postings as a term-bucketed catalog table —
    * the phrase-query twin of [[writeIndex]]: a k-term phrase lookup
    * against it prunes to at most k buckets (`SelectedBucketsCount`)
    * instead of touching the corpus at all.
    */
  def writePositionalIndex(docs: DataFrame, tableName: String,
                           numBuckets: Int = 8): Unit = {
    graft.engine.Bucketing.dropTableAndLocation(docs.sparkSession, tableName)
    positionalPostings(docs)
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, "term")
      .sortBy("term")
      .saveAsTable(tableName)
  }

  /** The positional index for one immutable fixture corpus, built AT
    * MOST ONCE per catalog — the staging step of the write-once/
    * query-many posture [[phraseSearchIndexed]] documents. The table
    * name carries a fingerprint of `fixtureKey` (the fixture
    * directory), so indexes for different corpora can never shadow one
    * another, and `docs` is by-name: when the table already exists the
    * corpus frame is never even constructed, let alone tokenized or
    * written. Callers that want the build OUT of a measured query path
    * stage it up front (SparkEntry.stage); a cold catalog degrades to
    * build-on-first-probe instead of failing.
    */
  def ensurePositionalIndex(spark: org.apache.spark.sql.SparkSession,
                            fixtureKey: String, docs: => DataFrame,
                            numBuckets: Int = 8): String = {
    val fp = graft.engine.Bucketing.fingerprint8(fixtureKey)
    val tableName = s"graft_pos_idx_$fp"
    if (!spark.catalog.tableExists(tableName))
      writePositionalIndex(docs, tableName, numBuckets)
    tableName
  }

  /** Phrase matching over an arbitrary positional-postings frame — the
    * shared core of the ad-hoc and index-backed variants. One pass,
    * one shuffle: each posting of a phrase term at position p is a
    * candidate anchor `p - offset` for every offset at which that term
    * occurs in the phrase (the tiny term→offset table rides along as a
    * broadcast); an anchor with all k offsets present is an exact
    * occurrence. No k-way self-join, so the postings input is read
    * ONCE — against the raw corpus that means a single tokenize rather
    * than k+1, and the literal-term IN filter sits directly on the
    * postings scan (bucket-pruning when the input is a
    * [[writePositionalIndex]] table). Output: one row per matching doc
    * with its occurrence count and first match position.
    */
  private[operators] def phraseFromPostings(posts: DataFrame,
                                            phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val spark = posts.sparkSession
    import spark.implicits._
    val k = phrase.length
    val offsets = phrase.zipWithIndex
      .map { case (t, i) => (t, i.toLong) }.toDF("term", "off")
    posts
      .filter(col("term").isin(phrase.distinct: _*))
      .join(broadcast(offsets), "term")
      .select(col("doc_id"), (col("pos") - col("off")).as("anchor"))
      .filter(col("anchor") >= 0)
      // a position holds exactly one term, so each phrase offset
      // contributes at most one row per (doc, anchor): count == k
      // IS "every offset matched" — no distinct needed
      .groupBy("doc_id", "anchor")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === lit(k.toLong))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"), min("anchor").as("first_pos"))
      .orderBy("doc_id")
  }

  /** Exact phrase search over raw documents (ad-hoc, query-once): the
    * corpus is tokenized ONCE into positional postings and matched via
    * the single-shuffle anchor-count core ([[phraseFromPostings]]).
    * For the query-many posture, build the index once with
    * [[writePositionalIndex]] and use [[phraseSearchIndexed]], which
    * never touches the corpus.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame =
    phraseFromPostings(positionalPostings(docs), phrase)

  /** Exact phrase search against a persisted positional index: the
    * literal-term filter prunes the bucketed scan to at most k of the
    * index's buckets, so per-query cost is proportional to the queried
    * terms' posting lists — the corpus is never re-read.
    */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                          tableName: String,
                          phrase: Seq[String]): DataFrame =
    // bucket pruning needs auto-bucketed-scan OFF; that is a
    // session-wide Tuning default (one config for a whole suite), not
    // a per-call flip that would contaminate later queries' plans
    phraseFromPostings(spark.table(tableName), phrase)

  /** BM25 ranking — the scoring Lucene actually runs under the
    * reference's ES queries. `log`-based idf means results are NOT
    * bit-portable across engines (libm), so this is spec-tested with
    * tolerances rather than DuckDB-oracled; [[search]] remains the
    * exact-arithmetic surface.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = postings(docs)
    val lens = docs.select(col("doc_id"),
      expr("cast(size(split(text, ' ')) as double)").as("dl"))
    // avg_dl as one exact-integer division (never avg()'s running
    // double sum, whose value depends on accumulation order): the
    // score is then shuffle-order-deterministic and bit-identical to
    // the [[bm25TopKIndexed]] path, whose stats sidecar stores the
    // same integers
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(expr("bigint(size(split(text, ' ')))")).cast("double") /
        count(lit(1)).cast("double")).as("avg_dl"))
    val df_ = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    p.filter(col("term").isin(terms: _*))
      .join(df_, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", expr(
        "log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)"))
      .withColumn("contrib", expr(
        s"idf * (tf * ($k1 + 1.0)) / (tf + $k1 * (1.0 - $b + $b * dl / avg_dl))"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Single-term BM25 ranking with its cross-engine certificate — the
    * production scorer ([[bm25]]'s k1/b saturation + `log` idf)
    * promoted to the oracled surface. `log` output is not
    * bit-portable (libm), so the certificate rides beside the score
    * instead of the score itself: for ONE term the idf is a common
    * positive factor and the BM25 order reduces to the order of
    * `tf / (tf + k1·(1−b) + k1·b·dl/avgdl)` — which, at the default
    * k1 = 1.2, b = 0.75 (= 3/10 and 9/10 rationals) and
    * avgdl = totalLen/N, is EXACTLY the order of the integer ratio
    *
    *   tf / (10·totalLen·tf + 3·totalLen + 9·N·dl)
    *
    * `rank_key` is that ratio as one int64÷int64 double division —
    * correctly rounded, hence monotone AND bit-identical in any IEEE
    * engine (exact while 10·totalLen·tf < 2^53; a corpus past that
    * re-scales the key) — so both engines derive the same total
    * order. `rank` is the row_number under the PRODUCTION score
    * (log idf and all); `rank_agrees` certifies it equals the
    * rank_key order (ties in the exact ratio break by doc_id on both
    * sides), and `score_in_bounds` pins 0 < score < idf·(k1+1) — the
    * BM25 saturation bound. The oracle recomputes tf/dl/rank_key/rank
    * exactly and states the certificates as literal TRUE (the
    * q117/q125 sketch-tier contract shape).
    *
    * Scale shape: one postings build filtered to the term (at scale, a
    * bucket-pruned [[writeIndex]] lookup), a 1-row stats broadcast,
    * and a top-k sort of ONE term's posting list — the same
    * total-order-of-scores any search engine's top-k heap computes.
    * Output: (doc_id, tf, dl, rank, rank_key, rank_agrees,
    * score_in_bounds) for rank <= k.
    */
  def bm25RankAudit(docs: DataFrame, term: String, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k1 == 1.2 && b == 0.75,
      "the exact rank_key derivation hardcodes k1=1.2, b=0.75 " +
        "(rationals 3/10, 9/10); generalize the integer key to change them")
    val p = postings(docs).filter(col("term") === lit(term))
    val lens = docs.select(col("doc_id"),
      expr("bigint(size(split(text, ' ')))").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(expr("bigint(size(split(text, ' ')))")).as("total_len"))
    val dfreq = p.agg(count(lit(1)).as("doc_freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
    val wx = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rank_key"), asc("doc_id"))
    p.join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfreq))
      .withColumn("idf", expr(
        "log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)"))
      .withColumn("score", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / (total_len / " +
          "cast(n_docs as double))))"))
      .withColumn("rank_key",
        col("tf").cast("double") /
          (lit(10L) * col("total_len") * col("tf") +
            lit(3L) * col("total_len") +
            lit(9L) * col("n_docs") * col("dl")).cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rank_exact", row_number().over(wx).cast("long"))
      .withColumn("rank_agrees", col("rank") === col("rank_exact"))
      .withColumn("score_in_bounds",
        col("score") > 0.0 && col("score") < col("idf") * (k1 + 1.0))
      .filter(col("rank") <= k)
      .select("doc_id", "tf", "dl", "rank", "rank_key", "rank_agrees",
        "score_in_bounds")
      .orderBy("rank")
  }

  /** TWO-term BM25 ranking with an exact cross-engine rank
    * certificate — [[bm25RankAudit]]'s contract extended to the
    * multi-term sum, putting the full production scorer's ORDER on
    * the oracle surface (q157 pins matched sets and saturation
    * bounds; this pins the ranking itself for ≥ 2 terms).
    *
    * The `log` idf blocks a rational order key for arbitrary term
    * pairs (the sum idf_a·K_a + idf_b·K_b is transcendental), so the
    * pair is chosen FROM THE DATA with EQUAL document frequencies —
    * the largest df shared by ≥ 2 terms, its two lexicographically
    * smallest terms (deterministic, SQL-expressible; the chosen terms
    * ride in the output so the oracle verifies the selection too).
    * Equal df ⇒ equal idf > 0 ⇒ the two-term BM25 order is the order
    * of `K_a + K_b` with `K_t = tf_t / (tf_t + k1·(1−b+b·dl/avgdl))`
    * — at k1 = 1.2, b = 0.75 and avgdl = totalLen/N exactly
    * `10L·tf_t / D_t` with `D_t = 10L·tf_t + 3L + 9N·dl` (q156's
    * derivation), so over the common denominator, dropping the
    * constant positive factor `10L`:
    *
    *   rank_key = (tf_a·D_b + tf_b·D_a) / (D_a·D_b)
    *
    * — one int64÷int64 double division of exact integers, monotone
    * and bit-identical in any IEEE engine while `D_a·D_b < 2^53`
    * (fixture maxima leave ~5× headroom at sf0.1; a corpus past that
    * re-scales the key). A doc matching only one term enters with
    * the other tf = 0 — `K = 0`, exactly the production scorer's
    * missing-term contribution, so partial matches certify too.
    * `rank` is the row_number under the PRODUCTION score (log idf
    * and all, summed per matched term); `rank_agrees` certifies it
    * equals the rank_key order; `score_in_bounds` pins
    * `0 < score < 2·idf·(k1+1)` (two saturating contributions).
    *
    * Scale shape: the pair selection is a vocabulary-sized window +
    * 1-row broadcast (audit-only work); scoring reads two posting
    * lists and top-k's them — the serving cost shape of any two-term
    * query. Output: (doc_id, term_a, term_b, tf_a, tf_b, dl, rank,
    * rank_key, rank_agrees, score_in_bounds) for rank <= k.
    */
  def bm25PairRankAudit(docs: DataFrame, k: Int, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame = {
    require(k1 == 1.2 && b == 0.75,
      "the exact rank_key derivation hardcodes k1=1.2, b=0.75 " +
        "(rationals 3/10, 9/10); generalize the integer key to change them")
    val p = postings(docs)
    val lens = docs.select(col("doc_id"),
      expr("bigint(size(split(text, ' ')))").as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(expr("bigint(size(split(text, ' ')))")).as("total_len"))
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    // deterministic equal-df pair: largest df shared by >= 2 terms,
    // two lexicographically smallest terms there (vocabulary-sized)
    val shared = dfreq.withColumn("nshare",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_freq")))
      .filter(col("nshare") >= 2)
    val dstar = shared.agg(max("doc_freq").as("dstar"))
    val pair = shared.join(broadcast(dstar),
        col("doc_freq") === col("dstar"))
      .orderBy("term").limit(2)
      .agg(min("term").as("term_a"), max("term").as("term_b"),
        max("doc_freq").as("doc_freq"))
    val tfp = p.crossJoin(broadcast(pair))
      .filter(col("term") === col("term_a") ||
        col("term") === col("term_b"))
      .groupBy("doc_id", "term_a", "term_b", "doc_freq")
      .agg(sum(when(col("term") === col("term_a"), col("tf"))
          .otherwise(lit(0L))).as("tf_a"),
        sum(when(col("term") === col("term_b"), col("tf"))
          .otherwise(lit(0L))).as("tf_b"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
    val wx = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rank_key"), asc("doc_id"))
    def contrib(tf: String): String =
      s"idf * ($tf * ($k1 + 1.0)) / ($tf + $k1 * (1.0 - $b + " +
        s"$b * dl / (total_len / cast(n_docs as double))))"
    tfp.join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", expr(
        "log((cast(n_docs as double) - doc_freq + 0.5) / " +
          "(doc_freq + 0.5) + 1.0)"))
      .withColumn("score",
        expr(contrib("tf_a")) + expr(contrib("tf_b")))
      // da/db and the rank_key numerator are computed in DOUBLE, not
      // Long: a double product/sum of exact integers is correctly
      // rounded at any magnitude (identical bits to the Long path
      // inside the 2^53 envelope, and degrades GRACEFULLY beyond),
      // whereas the Long multiply would silently WRAP at 2^63 and
      // certify a garbage ordering. The exact-ordering derivation
      // itself still needs the integers exact, so an input outside
      // the 2^53 envelope fails the audit LOUDLY (raise_error) rather
      // than emitting a certificate the arithmetic can't back.
      .withColumn("da",
        lit(10.0d) * col("total_len").cast("double") *
          col("tf_a").cast("double") +
          lit(3.0d) * col("total_len").cast("double") +
          lit(9.0d) * col("n_docs").cast("double") *
            col("dl").cast("double"))
      .withColumn("db",
        lit(10.0d) * col("total_len").cast("double") *
          col("tf_b").cast("double") +
          lit(3.0d) * col("total_len").cast("double") +
          lit(9.0d) * col("n_docs").cast("double") *
            col("dl").cast("double"))
      .withColumn("rank_num",
        col("tf_a").cast("double") * col("db") +
          col("tf_b").cast("double") * col("da"))
      // the envelope guard sits on the PRODUCT da*db — the quantity
      // the derivation actually bounds (line ~420): for da*db in
      // [2^53, 2^106) — reachable long before any single factor hits
      // 2^53 — the denominator would round and the key would no
      // longer be monotone with the exact rational order. The product
      // check SUBSUMES the per-factor and numerator ones: da, db >= 3
      // (3·total_len with total_len >= 1), so da*db < 2^53 forces
      // each factor < 2^53, and rank_num = tf_a·db + tf_b·da <=
      // (da/10)·db/total_len + (db/10)·da/total_len < da·db.
      .withColumn("rank_key",
        when(col("da") * col("db") >= lit(TwoTo53),
          expr("raise_error('bm25PairRankAudit: integer rank-key " +
            "envelope exceeded (da*db >= 2^53) — the exact-ordering " +
            "certificate cannot hold at this corpus scale')")
            .cast("double"))
          .otherwise(col("rank_num") / (col("da") * col("db"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rank_exact", row_number().over(wx).cast("long"))
      .withColumn("rank_agrees", col("rank") === col("rank_exact"))
      .withColumn("score_in_bounds",
        col("score") > 0.0 &&
          col("score") < lit(2.0) * col("idf") * (k1 + 1.0))
      .filter(col("rank") <= k)
      .select("doc_id", "term_a", "term_b", "tf_a", "tf_b", "dl",
        "rank", "rank_key", "rank_agrees", "score_in_bounds")
      .orderBy("rank")
  }

  /** Multi-term BM25 over EVERY matching document — the production
    * scorer's multi-term path with its oracle-able projection: the
    * matched doc set, per-doc hit counts and exact (tf-sum, dl) are
    * engine-independent integers; the `log`-based score itself rides
    * only through its saturation contract
    * `0 < score < Σ_hit_terms idf·(k1+1)` (each term's contribution
    * saturates below idf·(k1+1) as tf → ∞), stated by the oracle as
    * literal TRUE. Rank properties of the score are SearchSpec
    * territory ([[bm25]]).
    * Output: (doc_id, n_terms_hit, total_tf, dl, score_in_bounds),
    * doc-id ordered.
    */
  def bm25Matches(docs: DataFrame, terms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = postings(docs)
    val lens = docs.select(col("doc_id"),
      expr("bigint(size(split(text, ' ')))").as("dl"))
    // exact-integer avg_dl — see [[bm25]]'s note
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(expr("bigint(size(split(text, ' ')))")).cast("double") /
        count(lit(1)).cast("double")).as("avg_dl"))
    val df_ = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    p.filter(col("term").isin(terms: _*))
      .join(df_, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf", expr(
        "log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)"))
      .withColumn("contrib", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / avg_dl))"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"),
        sum("tf").as("total_tf"),
        max(col("dl")).as("dl"),
        sum("contrib").as("score"),
        sum(col("idf") * (k1 + 1.0)).as("bound"))
      .withColumn("score_in_bounds",
        col("score") > 0.0 && col("score") < col("bound"))
      .select("doc_id", "n_terms_hit", "total_tf", "dl",
        "score_in_bounds")
      .orderBy("doc_id")
  }

  def search(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val p = postings(docs)
    // Corpus size as a broadcast 1-row frame — stays inside the single
    // plan (no separate driver-side count job).
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val df_ = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    // Per-term pivoted contributions summed in a FIXED order: each
    // sum() collapses exactly one non-zero value (plus 0.0s, which add
    // exactly), so the final score is order-independent → bit-identical
    // across shuffle orders and engines. Terms enter as Column literals
    // (never spliced into SQL text).
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t),
        col("tf").cast("double") *
          (col("n_docs") / col("doc_freq").cast("double")))
        .otherwise(lit(0.0d))).as(s"c_$i")
    }
    val score = terms.indices
      .map(i => col(s"c_$i"))
      .reduce(_ + _)
    p.filter(col("term").isin(terms: _*))
      .join(df_, "term")
      .crossJoin(broadcast(nDf))
      .groupBy("doc_id")
      .agg(contribs.head, contribs.tail :+ count(lit(1)).as("n_terms_hit"): _*)
      .withColumn("score", score)
      .select(col("doc_id"), col("score"), col("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Persist the FULL BM25 serving index — Lucene's on-disk shape
    * (what actually sits under the reference's delegated ES queries)
    * mapped to Spark catalog tables:
    *
    *  - `<base>_post` (term, doc_id, tf, dl): the posting lists,
    *    bucketed + sorted by term, with the per-doc length DL
    *    denormalized beside tf — Lucene's norms, stored with the
    *    posting so scoring never joins a doc-keyed side (which would
    *    re-shuffle every matched posting by doc_id at query time);
    *  - `<base>_dict` (term, doc_freq): the term dictionary, bucketed
    *    by term with the SAME bucket count — the df lookup joins the
    *    pruned postings scan bucket-to-bucket, no exchange;
    *  - `<base>_stats` (n_docs, total_len): the 1-row corpus sidecar.
    *
    * A query then reads ONLY the queried terms' buckets
    * (`SelectedBucketsCount` — PlanSpec asserts it) and NEVER touches
    * the corpus: at 100 TB the per-query cost is the queried posting
    * lists, exactly a search engine's. The corpus is tokenized ONCE
    * (the dict derives from the persisted postings).
    */
  def writeBm25Index(docs: DataFrame, baseName: String,
                     numBuckets: Int = 8): Unit = {
    val spark = docs.sparkSession
    Seq("post", "dict", "stats").foreach(sfx =>
      graft.engine.Bucketing.dropTableAndLocation(spark, s"${baseName}_$sfx"))
    docs
      .select(col("doc_id"),
        expr("bigint(size(split(text, ' ')))").as("dl"),
        explode(TextOps.tokens("text")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, "term").sortBy("term")
      .saveAsTable(s"${baseName}_post")
    spark.table(s"${baseName}_post")
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))
      .write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, "term").sortBy("term")
      .saveAsTable(s"${baseName}_dict")
    docs
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("bigint(size(split(text, ' ')))")).as("total_len"))
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${baseName}_stats")
  }

  /** The BM25 index for one immutable fixture corpus, built AT MOST
    * ONCE per catalog (same staging contract as
    * [[ensurePositionalIndex]]; `docs` is by-name so a warm catalog
    * never constructs the corpus frame). Returns the base table name. */
  def ensureBm25Index(spark: org.apache.spark.sql.SparkSession,
                      fixtureKey: String, docs: => DataFrame,
                      numBuckets: Int = 8): String = {
    val fp = graft.engine.Bucketing.fingerprint8(fixtureKey)
    val baseName = s"graft_bm25_$fp"
    if (!spark.catalog.tableExists(s"${baseName}_stats"))
      writeBm25Index(docs, baseName, numBuckets)
    baseName
  }

  /** Multi-term BM25 top-k served ENTIRELY from a [[writeBm25Index]]
    * index — the production query path: a bucket-pruned postings scan
    * joined to the equally-pruned term dictionary (same bucketing —
    * no exchange on either side), a broadcast 1-row stats sidecar,
    * one per-doc aggregation of the matched postings, and a
    * TakeOrderedAndProject top-k (per-partition partial top-k before
    * the driver merge — never a global sort). Identical scores to the
    * ad-hoc [[bm25]] (SearchSpec pins equality); the corpus is not in
    * the plan at all.
    */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession,
                      baseName: String, terms: Seq[String], k: Int,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val p = spark.table(s"${baseName}_post")
      .filter(col("term").isin(terms: _*))
    val dict = spark.table(s"${baseName}_dict")
      .filter(col("term").isin(terms: _*))
    val stats = spark.table(s"${baseName}_stats")
    p.join(dict, "term")
      .crossJoin(broadcast(stats))
      .withColumn("avg_dl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      // cast(n_docs as double) FIRST: the sidecar stores bigints, and
      // bigint - bigint + 0.5 would run in DECIMAL (SQL 0.5 is a
      // decimal literal) — a differently-rounded idf than the ad-hoc
      // [[bm25]] path, whose n_docs enters as double
      .withColumn("idf", expr(
        "log((cast(n_docs as double) - doc_freq + 0.5) / " +
          "(doc_freq + 0.5) + 1.0)"))
      .withColumn("contrib", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / avg_dl))"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** [[bm25RankAudit]] served from the persisted index — the same
    * single-term production ranking with the same exact integer-ratio
    * certificate (see [[bm25RankAudit]] for the derivation), but with
    * tf/dl from the bucket-pruned postings scan, df from the term
    * dictionary and (N, totalLen) from the stats sidecar: the corpus
    * never enters the plan, so the oracle (which recomputes from the
    * raw table) certifies the INDEX faithfully serves the live
    * ranking. Output schema identical to [[bm25RankAudit]].
    *
    * Both selections are DISTRIBUTED top-k (TakeOrderedAndProject),
    * never a corpus-wide rank window, and `rank_agrees` certifies
    * BOTH halves of order agreement: the within-page numbering
    * (rank == rank_exact over the k selected rows) AND top-k
    * MEMBERSHIP (the doc also appears in the independent top-k under
    * (rank_key desc, doc_id)) — without the membership check, a
    * rounding perturbation that swaps a boundary doc in or out of the
    * score-selected page could renumber consistently inside the
    * bounded set and mask exactly the disagreement the certificate
    * exists to flag.
    */
  def bm25RankAuditIndexed(spark: org.apache.spark.sql.SparkSession,
                           baseName: String, term: String, k: Int,
                           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k1 == 1.2 && b == 0.75,
      "the exact rank_key derivation hardcodes k1=1.2, b=0.75 " +
        "(rationals 3/10, 9/10); generalize the integer key to change them")
    val p = spark.table(s"${baseName}_post")
      .filter(col("term") === lit(term))
    val dfreq = spark.table(s"${baseName}_dict")
      .filter(col("term") === lit(term)).select("doc_freq")
    val stats = spark.table(s"${baseName}_stats")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
    val wx = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rank_key"), asc("doc_id"))
    val full = p.crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfreq))
      .withColumn("idf", expr(
        "log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0)"))
      .withColumn("score", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / (total_len / " +
          "cast(n_docs as double))))"))
      .withColumn("rank_key",
        col("tf").cast("double") /
          (lit(10L) * col("total_len") * col("tf") +
            lit(3L) * col("total_len") +
            lit(9L) * col("n_docs") * col("dl")).cast("double"))
    // the INDEPENDENT top-k under the exact key order — the
    // membership witness (k rows, broadcastable)
    val keyTop = full
      .orderBy(desc("rank_key"), asc("doc_id")).limit(k)
      .select(col("doc_id"), lit(true).as("in_key_topk"))
    // top-k FIRST (TakeOrderedAndProject — distributed partial
    // top-k under the same (score desc, doc_id) total order), THEN
    // the rank windows over the k bounded rows: the previous shape
    // ran a corpus-wide single-partition rank window over the
    // term's whole posting list. rank/rank_exact values are
    // unchanged whenever the certificate holds; the membership
    // conjunct catches the case the bounded windows alone cannot —
    // the two top-k SETS differing at the boundary
    full.orderBy(desc("score"), asc("doc_id")).limit(k)
      .join(broadcast(keyTop), Seq("doc_id"), "left")
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rank_exact", row_number().over(wx).cast("long"))
      .withColumn("rank_agrees", col("rank") === col("rank_exact") &&
        coalesce(col("in_key_topk"), lit(false)))
      .withColumn("score_in_bounds",
        col("score") > 0.0 && col("score") < col("idf") * (k1 + 1.0))
      .select("doc_id", "tf", "dl", "rank", "rank_key", "rank_agrees",
        "score_in_bounds")
      .orderBy("rank")
  }

  /** Reciprocal-rank fusion — Elasticsearch 8's `rrf` retriever
    * (Cormack & Clarke), THE standard way to hybridize a lexical and
    * a dense ranking: each input ranking contributes
    * `1 / (kRrf + rank)` for the documents it ranked (absent docs
    * contribute nothing), ranks are row_numbers under that ranking's
    * own (score desc, id) total order, and the fused list orders by
    * the summed contribution. Purely RANK-based — no score
    * calibration between heterogeneous rankers, which is exactly why
    * ES adopted it for BM25 + kNN hybrid search.
    *
    * Inputs are (frame, idCol, scoreCol) triples; each frame MUST be
    * an already-computed top-k ranking — that boundedness is the
    * CONTRACT that makes the global (un-partitioned) rank windows
    * safe: they run over k-sized frames, not the corpus. Passing an
    * unbounded frame funnels it through one window partition — cap it
    * with the ranker's own top-k first (nothing type-level can check
    * this; the contract is the caller's). With TWO rankers the fused
    * score sums ≤ 2 doubles — commutative, so shuffle order cannot
    * change a bit (the oracle leans on this); with ≥ 3 the float sum
    * order is unpinned and only the rank order is contractual.
    * Output: (doc_id, rrf_score, n_rankers), top-k by
    * (rrf_score desc, doc_id). */
  def rrfFuse(rankings: Seq[(DataFrame, String, String)],
              kRrf: Int = 60, k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val ranked = rankings.map { case (df, idCol, scoreCol) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc(scoreCol), asc("doc_id"))
      df.select(col(idCol).cast("long").as("doc_id"), col(scoreCol))
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("doc_id"),
          (lit(1.0d) /
            (lit(kRrf).cast("double") + col("rank").cast("double")))
            .as("contrib"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(sum("contrib").as("rrf_score"),
        count(lit(1)).as("n_rankers"))
      .orderBy(desc("rrf_score"), asc("doc_id"))
      .limit(k)
  }

  /** Percolation — ES's percolator, search REVERSED: queries are
    * registered up front and each incoming document reports which
    * registered queries it matches (the alerting/routing/
    * saved-search primitive). `queries` is (query_id, qtext); a
    * document matches when EVERY analyzed term of the query's text
    * appears in the document's analyzed term set (ES's `match` with
    * `operator: and` — the alerting default; an all-stopword query
    * matches nothing, zero_terms_query:none).
    *
    * Scale shape: both sides tokenize once (codegen'd analyzer SQL),
    * distinct to (id, term), and meet in ONE equi-join on `term` —
    * batch×registry only through shared vocabulary, never a cross
    * product; the conjunction check is a count aggregation against
    * the query's term count. At 10^5 registered alerts over a
    * streaming batch this is a broadcast-sized build side. Output:
    * (doc_id, query_id), both ascending. */
  def percolate(docs: DataFrame, queries: DataFrame,
                an: Analyzer.Chain = Analyzer.Whitespace): DataFrame = {
    val qTerms = queries
      .select(col("query_id"),
        explode(Analyzer.posTerms(an, "qtext")).as("pt"))
      .select(col("query_id"), col("pt.term").as("term"))
      .distinct()
    val qSizes = qTerms.groupBy("query_id")
      .agg(count(lit(1)).as("n_q_terms"))
    val docTerms = docs
      .select(col("doc_id"),
        explode(Analyzer.posTerms(an, "text")).as("pt"))
      .select(col("doc_id"), col("pt.term").as("term"))
      .distinct()
    docTerms.join(qTerms, "term")
      .groupBy("doc_id", "query_id")
      .agg(count(lit(1)).as("n_hit"))
      .join(qSizes, "query_id")
      .filter(col("n_hit") === col("n_q_terms"))
      .select("doc_id", "query_id")
      .orderBy("doc_id", "query_id")
  }
}
