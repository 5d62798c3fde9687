package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segmented full-text index — Lucene's actual storage architecture
  * (the engine under the reference's delegated Elasticsearch search:
  * `/root/reference/api/controllers/elastic_controller.go:197-224`
  * pushes documents into ES, and every ES shard IS a Lucene index of
  * immutable segments + live-docs tombstones) rebuilt on Spark:
  *
  *  - each ingested batch lands as an IMMUTABLE segment
  *    `seg=<fp>/tb=<bucket>/` of postings (term, doc_id, tf, dl),
  *    hive-partitioned by a term-hash bucket so a query's literal
  *    terms prune to their buckets at planning time across every
  *    segment at once;
  *  - deletes are TOMBSTONE segments `del=<fp>/` of doc_ids — Lucene's
  *    live-docs bitmap: the postings of a deleted doc stay in place
  *    until a merge, results just skip them;
  *  - visibility is a single `_SEGMENTS` manifest committed by one
  *    atomic rename (the Delta commit shape): data directories are
  *    invisible until referenced, so a crashed writer leaves only an
  *    orphan (reclaimed by [[vacuum]]), never a torn index;
  *  - [[merge]] folds all live segments into one, APPLIES the
  *    tombstones, and supersedes the olds — Lucene's segment merge
  *    ([[vacuum]] reclaims the retired directories once aged).
  *
  * Scoring follows Lucene's statistics semantics EXACTLY: corpus
  * stats (N, total length) come from the per-segment header rows
  * written at ingest and df from the (still tombstone-bearing)
  * postings — deleted documents keep counting toward N and df UNTIL A
  * MERGE rewrites the segments (Lucene's IndexSearcher does the same:
  * deletes affect hit lists immediately, stats only after merge).
  * q165/q166 pin both phases against a DuckDB oracle.
  *
  * Scale shape: ingest is O(batch) — one postings write + one
  * manifest rename, the standing index is never read or rewritten;
  * a query reads only the queried terms' buckets of each live segment
  * (planning-time `tb IN` partition filters) plus a driver-side
  * O(segments) manifest parse; merge is the one full-index pass,
  * amortized over every batch it retires. Segment count stays bounded
  * by merge cadence, exactly Lucene's tiered-merge contract.
  */
object SegmentedIndex {

  private val Seed = 42L // xxhash64() SQL function's fixed seed

  /** The term's bucket, computed identically on the driver (literal
    * term → partition filter) and in the ingest plan (column). */
  private def termBucket(term: String, nBuckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions
      .XxHash64(Seq(org.apache.spark.sql.catalyst.expressions
        .Literal(org.apache.spark.unsafe.types.UTF8String.fromString(term),
          org.apache.spark.sql.types.StringType)), Seed)
      .eval().asInstanceOf[Long]
    ((h % nBuckets) + nBuckets).toInt % nBuckets
  }

  private case class Seg(kind: String, name: String, nDocs: Long,
                         totalLen: Long)

  /** Parse the manifest: (nBuckets, live segments in commit order).
    * O(segments) driver work — bounded by merge cadence, never by
    * corpus size. */
  private def readManifest(root: java.io.File): (Int, Seq[Seg]) = {
    val f = new java.io.File(root, "_SEGMENTS")
    require(f.isFile, s"no segmented index at $root")
    val lines = java.nio.file.Files
      .readAllLines(f.toPath).toArray(Array.empty[String]).toSeq
    val nBuckets = lines.head.stripPrefix("nb=").toInt
    (nBuckets, lines.tail.map { l =>
      val Array(kind, name, nd, tl) = l.split(",")
      Seg(kind, name, nd.toLong, tl.toLong)
    })
  }

  /** Commit a new manifest generation: full rewrite, one atomic
    * rename — readers see the previous generation or this one, never
    * a prefix. */
  private def writeManifest(root: java.io.File, nBuckets: Int,
                            segs: Seq[Seg]): Unit = {
    val tmp = new java.io.File(root, "_SEGMENTS.tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    val body = (s"nb=$nBuckets" +: segs.map(s =>
      s"${s.kind},${s.name},${s.nDocs},${s.totalLen}")).mkString("\n")
    java.nio.file.Files.writeString(tmp.toPath, body)
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(root, "_SEGMENTS").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Postings of one batch with the partition bucket column. The
    * per-occurrence POSITIONS ride inline as a sorted array — what
    * Lucene stores in its postings lists when a field is indexed
    * with positions — so the same segment family serves term, BM25
    * AND exact-phrase queries; tf stays materialized beside them
    * (it is `size(positions)`, but scoring reads it constantly). */
  private def segPostings(docs: DataFrame, nBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"),
        expr("bigint(size(split(text, ' ')))").as("dl"),
        posexplode(TextOps.tokens("text")).as(Seq("pos", "term")))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast("long")))
          .as("positions"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(nBuckets))
        .cast("int"))
      // one write task per bucket: without this, every shuffle
      // partition writes into every tb directory — up to
      // (shuffle.partitions × nBuckets) tiny files PER SEGMENT, which
      // bloats both the ingest and every later pruned read's file
      // listing. Per-batch segments are batch-sized; nBuckets tasks
      // is the right parallelism for them.
      .repartition(nBuckets, col("tb"))

  /** Ingest one batch as an immutable segment. Idempotent per
    * `batchKey` (the manifest membership check + the staged dir's
    * marker make warm retries no-ops); crash-safe (data first,
    * manifest rename second — a writer that dies mid-way leaves an
    * invisible orphan). Single-writer appends, the streaming-sink
    * model; concurrent SAME-batch appenders commit one segment. */
  def append(spark: SparkSession, rootDir: String, docs: DataFrame,
             batchKey: String, nBuckets: Int = 8): Unit = {
    val root = new java.io.File(rootDir)
    root.mkdirs()
    val nb =
      if (new java.io.File(root, "_SEGMENTS").isFile)
        readManifest(root)._1
      else nBuckets
    val fp = graft.engine.Bucketing.fingerprint8("sx4|" + batchKey)
    val name = s"seg=$fp"
    val (_, segs) =
      if (new java.io.File(root, "_SEGMENTS").isFile) readManifest(root)
      else (nb, Seq.empty[Seg])
    if (segs.exists(_.name == name)) return
    val d = docs.persist()
    val stats = d.agg(count(lit(1)).as("n"),
      sum(expr("bigint(size(split(text, ' ')))")).as("tl"))
      .collect().head
    graft.engine.Bucketing.atomicStage(new java.io.File(root, name)) {
      tmp =>
        segPostings(d, nb).write.mode("overwrite")
          .partitionBy("tb").parquet(tmp.getPath)
        writeStored(d, tmp)
        writeDict(d.sparkSession, tmp)
    }
    d.unpersist()
    writeManifest(root, nb,
      segs :+ Seg("seg", name, stats.getLong(0), stats.getLong(1)))
  }

  /** Per-segment TERM DICTIONARY — Lucene's terms index: (term,
    * doc_freq) under `_dict/`, derived by reading the segment's
    * just-written postings back (one tokenize per batch, ever). The
    * dictionary is VOCABULARY-sized, so [[fuzzySearch]]'s pass-1 walk
    * reads it instead of distinct-ing the corpus-sized postings —
    * at 100 TB that is the difference between scanning the corpus
    * and scanning the vocabulary. Summed per-segment doc_freq equals
    * the stats-phase df (tombstoned docs included), same as the
    * postings aggregation the scorers use. */
  private def writeDict(spark: SparkSession,
                        segTmp: java.io.File): Unit =
    spark.read.parquet(segTmp.getPath)
      .groupBy("term").agg(count(lit(1)).as("doc_freq"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(segTmp, "_dict").getPath)

  /** The live segments' dictionaries unioned (term, doc_freq, seg).
    * Vocabulary-sized per segment. */
  private def dictFrame(spark: SparkSession, root: java.io.File,
                        segs: Seq[Seg]): DataFrame =
    segs.filter(_.kind == "seg").map { sg =>
      spark.read.parquet(
        new java.io.File(new java.io.File(root, sg.name), "_dict").getPath)
    }.reduce(_ unionByName _)

  /** Stored fields — ES's `_source` / Lucene's stored fields: the
    * original (doc_id, text) rows ride INSIDE the segment under
    * `_stored/` (the underscore prefix hides the subtree from the
    * postings scans' file listing, so term queries never touch it),
    * committed by the same manifest rename as the postings. [[fetch]]
    * and [[highlight]] read them; nothing else does. */
  private def writeStored(d: DataFrame, segTmp: java.io.File): Unit =
    d.select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(segTmp, "_stored").getPath)

  /** The live segments' stored fields tagged with their segment fp —
    * one explicit read per segment (the `_stored` subtree is hidden
    * from partition discovery by design, so each is addressed
    * directly). O(segments) plan nodes, bounded by merge cadence. */
  private def storedFrame(spark: SparkSession, root: java.io.File,
                          segs: Seq[Seg]): DataFrame =
    segs.filter(_.kind == "seg").map { sg =>
      spark.read.parquet(
        new java.io.File(new java.io.File(root, sg.name), "_stored").getPath)
        .withColumn("seg", lit(sg.name.stripPrefix("seg=")))
    }.reduce(_ unionByName _)

  /** GET by id — ES's document fetch, from the index's stored fields:
    * live (tombstone-filtered) rows for the requested ids, the id
    * filter pushed into every segment's stored read. Output:
    * (doc_id, text), id-ordered. */
  def fetch(spark: SparkSession, rootDir: String,
            ids: Seq[Long]): DataFrame = {
    val root = new java.io.File(rootDir)
    val (_, segs) = readManifest(root)
    val stored = storedFrame(spark, root, segs)
      .filter(col("doc_id").isin(ids: _*))
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        stored.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => stored
    }
    live.select("doc_id", "text").orderBy("doc_id")
  }

  /** Highlighting from the index — ES's actual flow: the QUERY phase
    * ranks top-k doc ids from the postings ([[search]]), the FETCH
    * phase pulls only those k documents' stored fields, and the
    * snippet builder ([[Search.highlight]]'s codegen'd per-row array
    * exprs) runs over the k fetched rows. The corpus is never read;
    * the stored-field read is k-bounded. Output:
    * (doc_id, pos, n_hits, snippet), id-ordered. */
  def highlight(spark: SparkSession, rootDir: String,
                terms: Seq[String], k: Int,
                window: Int = 3): DataFrame = {
    val root = new java.io.File(rootDir)
    val (_, segs) = readManifest(root)
    val top = search(spark, rootDir, terms, k).select("doc_id")
    val stored = storedFrame(spark, root, segs)
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        stored.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => stored
    }
    Search.highlight(
      live.join(broadcast(top), Seq("doc_id"), "left_semi")
        .select("doc_id", "text"),
      terms, window)
  }

  /** Tombstone a set of doc_ids — Lucene's live-docs delete: the
    * postings stay until [[merge]]; queries skip the docs now, the
    * statistics keep counting them (Lucene parity). A tombstone
    * applies ONLY to segments committed BEFORE it in the manifest —
    * Lucene's exact rule (a delete never affects documents added
    * later), which is also what lets [[upsert]] commit
    * delete-old + add-new in one manifest write. Same idempotence
    * and crash contract as [[append]]. */
  def delete(spark: SparkSession, rootDir: String, docIds: DataFrame,
             batchKey: String): Unit = {
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val fp = graft.engine.Bucketing.fingerprint8("sx4del|" + batchKey)
    val name = s"del=$fp"
    if (segs.exists(_.name == name)) return
    val ids = docIds.select(col("doc_id").cast("long")).persist()
    val n = ids.count()
    graft.engine.Bucketing.atomicStage(new java.io.File(root, name)) {
      tmp => ids.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    }
    ids.unpersist()
    writeManifest(root, nb, segs :+ Seg("del", name, n, 0L))
  }

  /** Update documents — Elasticsearch's update model (delete the old
    * version, index the new one), committed ATOMICALLY: the tombstone
    * segment for the batch's doc_ids and the new postings segment are
    * both staged first, then ONE manifest rename publishes both lines
    * — readers see the old versions or the new, never an index with
    * the delete but not the add. The tombstone line precedes the new
    * segment's, so by the prefix rule it hits only the OLD versions;
    * brand-new doc_ids in `docs` simply append. Idempotent per
    * `batchKey`; O(batch) like [[append]]. */
  def upsert(spark: SparkSession, rootDir: String, docs: DataFrame,
             batchKey: String): Unit = {
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val segFp = graft.engine.Bucketing.fingerprint8("sx4|" + batchKey)
    val segName = s"seg=$segFp"
    if (segs.exists(_.name == segName)) return
    val delFp = graft.engine.Bucketing
      .fingerprint8("sx4del|upsert|" + batchKey)
    val delName = s"del=$delFp"
    val d = docs.persist()
    val stats = d.agg(count(lit(1)).as("n"),
      sum(expr("bigint(size(split(text, ' ')))")).as("tl"))
      .collect().head
    graft.engine.Bucketing.atomicStage(new java.io.File(root, delName)) {
      tmp => d.select(col("doc_id").cast("long")).coalesce(1)
        .write.mode("overwrite").parquet(tmp.getPath)
    }
    graft.engine.Bucketing.atomicStage(new java.io.File(root, segName)) {
      tmp =>
        segPostings(d, nb).write.mode("overwrite")
          .partitionBy("tb").parquet(tmp.getPath)
        writeStored(d, tmp)
        writeDict(d.sparkSession, tmp)
    }
    d.unpersist()
    writeManifest(root, nb,
      segs :+ Seg("del", delName, stats.getLong(0), 0L)
        :+ Seg("seg", segName, stats.getLong(0), stats.getLong(1)))
  }

  /** The live postings of the queried terms only: every live
    * segment's scan arrives with `tb IN (term buckets)` as a
    * planning-time partition filter plus the term IN pushdown —
    * per-query cost is the queried posting lists, never a segment
    * scan. Tombstones NOT yet applied (callers choose the Lucene
    * phase: df before, hits after). */
  private def prunedPostings(spark: SparkSession, root: java.io.File,
      segs: Seq[Seg], terms: Seq[String], nb: Int): DataFrame = {
    val buckets = terms.map(termBucket(_, nb)).distinct
    spark.read.option("basePath", root.getPath)
      .parquet(segs.filter(_.kind == "seg")
        .map(s => new java.io.File(root, s.name).getPath): _*)
      .filter(col("tb").isin(buckets: _*) &&
        col("term").isin(terms: _*))
  }

  /** Tombstoned (doc_id, seg) pairs — each delete segment expanded
    * against the postings segments committed BEFORE it in the
    * manifest (the prefix rule: a delete never touches documents
    * added later, which is what keeps [[upsert]]'s new versions
    * alive). Batch-bounded × O(segments) rows — rides as a broadcast
    * into the anti join on (doc_id, seg). */
  private def tombstones(spark: SparkSession, root: java.io.File,
                         segs: Seq[Seg]): Option[DataFrame] = {
    val frames = segs.zipWithIndex
      .filter(_._1.kind == "del")
      .flatMap { case (del, i) =>
        val applies = segs.take(i).filter(_.kind == "seg")
          .map(_.name.stripPrefix("seg="))
        if (applies.isEmpty) None
        else Some(spark.read
          .parquet(new java.io.File(root, del.name).getPath)
          .withColumn("seg",
            explode(array(applies.map(lit): _*))))
      }
    frames.reduceOption(_ unionByName _)
  }

  /** Term search over the segmented index with Lucene's statistics
    * semantics: N and df INCLUDE tombstoned documents (stats shift
    * only at [[merge]]), the hit list EXCLUDES them immediately.
    * Scoring is the exact tf·(N/df) surface ([[Search.search]]'s
    * fixed-order pivoted sums — bit-identical across engines and
    * shuffle orders). Output: (doc_id, score, n_terms_hit), top-k by
    * (score desc, doc_id) — a TakeOrderedAndProject, never a global
    * sort. */
  def search(spark: SparkSession, rootDir: String, terms: Seq[String],
             k: Int): DataFrame = {
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val nDocs = segs.filter(_.kind == "seg").map(_.nDocs).sum
    val p = prunedPostings(spark, root, segs, terms, nb)
    // df BEFORE tombstones — Lucene counts deleted docs' postings in
    // its term statistics until a merge rewrites them
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        p.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => p
    }
    val contribs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === lit(t),
        col("tf").cast("double") *
          (lit(nDocs).cast("double") / col("doc_freq").cast("double")))
        .otherwise(lit(0.0d))).as(s"c_$i")
    }
    val score = terms.indices.map(i => col(s"c_$i")).reduce(_ + _)
    live.join(dfreq, "term")
      .groupBy("doc_id")
      .agg(contribs.head,
        contribs.tail :+ count(lit(1)).as("n_terms_hit"): _*)
      .withColumn("score", score)
      .select(col("doc_id"), col("score"), col("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Multi-term BM25 top-k over the segmented index — the production
    * serving path under Lucene's statistics phases: N and avg_dl from
    * the manifest headers, df aggregated from the (still
    * tombstone-bearing) pruned postings, per-doc saturated
    * contributions summed over the LIVE postings only, then a
    * TakeOrderedAndProject top-k. Scores are bit-identical to the
    * ad-hoc [[Search.bm25]] on an equivalent corpus (the spec pins a
    * one-segment index against it); the `log` idf keeps this off the
    * DuckDB-hash surface, like every bm25 scorer — the segment tier's
    * oracled BM25 entry is the single-term rank certificate
    * ([[bm25RankAudit]], q167). Output: (doc_id, score, n_terms_hit).
    */
  def bm25TopK(spark: SparkSession, rootDir: String,
               terms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75): DataFrame = {
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val nDocs = segs.filter(_.kind == "seg").map(_.nDocs).sum
    val totalLen = segs.filter(_.kind == "seg").map(_.totalLen).sum
    val p = prunedPostings(spark, root, segs, terms, nb)
      .filter(col("term").isin(terms: _*))
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        p.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => p
    }
    live.join(dfreq, "term")
      .withColumn("avg_dl",
        lit(totalLen).cast("double") / lit(nDocs).cast("double"))
      // cast to double FIRST — the decimal-literal pitfall documented
      // at [[Search.bm25TopKIndexed]]
      .withColumn("idf", expr(
        s"log((cast(${nDocs}L as double) - doc_freq + 0.5) / " +
          "(doc_freq + 0.5) + 1.0)"))
      .withColumn("contrib", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / avg_dl))"))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
  }

  /** Single-term BM25 over the segmented index with its exact
    * integer-ratio rank certificate — [[Search.bm25RankAudit]]'s
    * contract served from the segment tier, under Lucene's statistics
    * phases: N and totalLen come from the per-segment manifest
    * headers and df from the still-tombstone-bearing postings (all of
    * which COUNT deleted docs until a [[merge]]), while the ranked
    * hit list excludes tombstoned docs immediately. tf and dl ride in
    * the pruned postings rows; the corpus is never read. Output
    * schema identical to [[Search.bm25RankAudit]]; the k1=1.2/b=0.75
    * integer-key derivation is documented there.
    */
  def bm25RankAudit(spark: SparkSession, rootDir: String, term: String,
                    k: Int, k1: Double = 1.2,
                    b: Double = 0.75): DataFrame = {
    require(k1 == 1.2 && b == 0.75,
      "the exact rank_key derivation hardcodes k1=1.2, b=0.75 " +
        "(rationals 3/10, 9/10); generalize the integer key to change them")
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val nDocs = segs.filter(_.kind == "seg").map(_.nDocs).sum
    val totalLen = segs.filter(_.kind == "seg").map(_.totalLen).sum
    val p = prunedPostings(spark, root, segs, Seq(term), nb)
      .filter(col("term") === lit(term))
    val dfreq = p.agg(count(lit(1)).as("doc_freq"))
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        p.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => p
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), asc("doc_id"))
    val wx = org.apache.spark.sql.expressions.Window
      .orderBy(desc("rank_key"), asc("doc_id"))
    live.crossJoin(broadcast(dfreq))
      .withColumn("idf", expr(
        s"log((cast(${nDocs}L as double) - doc_freq + 0.5) / " +
          "(doc_freq + 0.5) + 1.0)"))
      .withColumn("score", expr(
        s"idf * (tf * ($k1 + 1.0)) / " +
          s"(tf + $k1 * (1.0 - $b + $b * dl / (${totalLen}L / " +
          s"cast(${nDocs}L as double))))"))
      .withColumn("rank_key",
        col("tf").cast("double") /
          (lit(10L) * lit(totalLen) * col("tf") +
            lit(3L) * lit(totalLen) +
            lit(9L) * lit(nDocs) * col("dl")).cast("double"))
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

  /** Fuzzy term search over the SEGMENTED index — Lucene's fuzzy
    * query shape exactly: pass 1 walks the TERM DICTIONARY (here: the
    * distinct term column of every live segment — pre-tombstone, as
    * Lucene's dictionary keeps deleted docs' terms until merge) with
    * SymSpell deletion-variant blocking against the broadcast query
    * variants, resolving the data-dependent matched-term set
    * (query-bounded — it collects to the driver the way Lucene
    * enumerates the automaton's matches); pass 2 reads ONLY the
    * matched terms' postings, bucket-pruned at planning time with the
    * now-literal term list. Lucene-AUTO allowance: query terms of
    * length ≥ 6 allow two edits, shorter one ([[graft.operators
    * .Fuzzy]] proves recall 1 for the blocking). Scoring is the exact
    * tf·(N/df) per (q_term, term) with the usual stats phases: N and
    * df count tombstoned docs, the ranked hits exclude them. Output:
    * (q_term, term, dist, doc_id, tfidf, rank), rank ≤ k per pair. */
  def fuzzySearch(spark: SparkSession, rootDir: String,
                  terms: Seq[String], k: Int,
                  maxDist: Int = 1): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2: $maxDist")
    import spark.implicits._
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val nDocs = segs.filter(_.kind == "seg").map(_.nDocs).sum
    // pass 1: dictionary walk over the per-segment TERM DICTIONARIES
    // — a vocabulary-sized read (Lucene's terms index), never the
    // corpus-sized postings
    val vocab = dictFrame(spark, root, segs).select("term").distinct()
    def del1(s: String): Seq[String] =
      s +: s.indices.map(i => s.take(i) + s.drop(i + 1))
    def variants(s: String): Seq[String] =
      if (maxDist == 2 && s.length >= 6)
        (del1(s) ++ del1(s).flatMap(del1)).distinct
      else del1(s)
    val qv = terms.flatMap(t => variants(t).map(v => (t, v))).distinct
      .toDF("q_term", "v")
    val cand = vocab
      .withColumn("v", explode(expr(Fuzzy.delAutoExpr("term", maxDist))))
      .join(broadcast(qv), "v")
      .filter(levenshtein(col("term"), col("q_term")) <=
        when(length(col("q_term")) >= 6, lit(maxDist)).otherwise(lit(1)))
      .select("q_term", "term").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val matched = cand.map(_._2).distinct
    // pass 2: the matched terms are now literals — the postings read
    // prunes to their buckets at planning time, like any term query
    val p = prunedPostings(spark, root, segs, matched, nb)
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        p.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => p
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_term", "term")
      .orderBy(desc("tfidf"), asc("doc_id"))
    live
      .join(broadcast(cand.toDF("q_term", "term")), Seq("term"))
      .join(dfreq, "term")
      .withColumn("tfidf", col("tf").cast("double") *
        (lit(nDocs).cast("double") / col("doc_freq").cast("double")))
      .withColumn("dist",
        levenshtein(col("q_term"), col("term")).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("q_term", "term", "dist", "doc_id", "tfidf", "rank")
      .orderBy("q_term", "term", "rank")
  }

  /** Exact phrase search over the SEGMENTED index — the positional
    * postings ride inline in the same segments the term and BM25
    * queries read (Lucene's layout), so phrase queries work on the
    * live, updatable index: the pruned per-term read (planning-time
    * `tb IN` partition filters across every segment), the tombstone
    * anti join (live-docs — a deleted doc's phrase hits vanish
    * immediately), then [[Search.phraseFromPostings]]'s single-pass
    * anchor-count core over the exploded positions. Output:
    * (doc_id, n_occurrences, first_pos). */
  def phraseSearch(spark: SparkSession, rootDir: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val p = prunedPostings(spark, root, segs, phrase.distinct, nb)
    val live = tombstones(spark, root, segs) match {
      case Some(dead) =>
        p.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => p
    }
    Search.phraseFromPostings(
      live.select(col("doc_id"), col("term"),
        explode(col("positions")).as("pos")),
      phrase)
  }

  /** Live segment/tombstone counts and the Lucene-phase corpus stats
    * — (n_segments, n_tombstone_segments, n_docs_stat). */
  def stats(rootDir: String): (Long, Long, Long) = {
    val (_, segs) = readManifest(new java.io.File(rootDir))
    (segs.count(_.kind == "seg").toLong,
      segs.count(_.kind == "del").toLong,
      segs.filter(_.kind == "seg").map(_.nDocs).sum)
  }

  /** Segment merge — Lucene's compaction: fold every live segment
    * into one, APPLY the tombstones (their postings drop, and the
    * corpus statistics finally shift), commit the single-segment
    * manifest atomically. The superseded directories stay on disk —
    * a reader that loaded the previous manifest generation may still
    * be mid-scan of them, so reclaiming is [[vacuum]]'s
    * age-thresholded job, never the merge's (the Delta model: the
    * commit flips visibility, vacuum reclaims space later). Returns
    * (segments folded, tombstone segments applied). */
  def merge(spark: SparkSession, rootDir: String): (Int, Int) = {
    val root = new java.io.File(rootDir)
    val (_, segs) = readManifest(root)
    mergePrefix(spark, root, segs.size)
  }

  /** Tiered merge — Lucene's TieredMergePolicy, simplified to one
    * tier: a no-op while the live segment count stays within
    * `maxSegments`; above it, fold the OLDEST manifest prefix down to
    * the bound. Folding a prefix is exactly semantics-preserving
    * under the prefix tombstone rule: every tombstone inside the
    * prefix scopes only to prefix segments (fully absorbed by the
    * fold), and every later tombstone follows the merged segment in
    * the manifest, so it still applies to it. This is what bounds
    * merge WRITE AMPLIFICATION under steady streaming ingest: each
    * maybeMerge rewrites the oldest few batches, never the whole
    * index; [[merge]] stays the full checkpoint. Returns
    * (segments folded, tombstone segments applied). */
  def maybeMerge(spark: SparkSession, rootDir: String,
                 maxSegments: Int): (Int, Int) = {
    require(maxSegments >= 1, s"maxSegments must be >= 1: $maxSegments")
    val root = new java.io.File(rootDir)
    val (_, segs) = readManifest(root)
    val liveCount = segs.count(_.kind == "seg")
    if (liveCount <= maxSegments) return (0, 0)
    val toFold = liveCount - maxSegments + 1
    // manifest prefix up to (and including) the toFold-th seg entry
    val prefixEnd = segs.zipWithIndex.filter(_._1.kind == "seg")
      .apply(toFold - 1)._2 + 1
    mergePrefix(spark, root, prefixEnd)
  }

  /** Fold the first `prefixLen` manifest entries into one segment:
    * read their postings, apply their tombstones (prefix-scoped, so
    * all-in-prefix by construction), publish the fold, commit the
    * manifest with the merged segment at the FRONT followed by the
    * untouched remainder, then retire the folded directories. */
  private def mergePrefix(spark: SparkSession, root: java.io.File,
                          prefixLen: Int): (Int, Int) = {
    val (nb, segs) = readManifest(root)
    val prefix = segs.take(prefixLen)
    val rest = segs.drop(prefixLen)
    val posts = prefix.filter(_.kind == "seg")
    val dels = prefix.filter(_.kind == "del")
    if (posts.size <= 1 && dels.isEmpty) return (0, 0)
    val all = spark.read.option("basePath", root.getPath)
      .parquet(posts.map(s => new java.io.File(root, s.name).getPath): _*)
    val live = tombstones(spark, root, prefix) match {
      case Some(dead) =>
        all.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => all
    }
    val fp = graft.engine.Bucketing.fingerprint8(
      "sx4merge|" + prefix.map(_.name).mkString("|"))
    val name = s"seg=$fp"
    val merged = live.persist()
    // post-merge stats recomputed from the surviving postings: every
    // doc holds >= 1 posting (tokenize never returns an empty array),
    // so (doc_id, dl) pairs recover exact doc counts and lengths
    val st = merged.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n"), sum("dl").as("tl")).collect().head
    val storedAll = storedFrame(spark, root, prefix)
    val storedLive = tombstones(spark, root, prefix) match {
      case Some(dead) =>
        storedAll.join(broadcast(dead), Seq("doc_id", "seg"), "left_anti")
      case None => storedAll
    }
    graft.engine.Bucketing.atomicStage(new java.io.File(root, name)) {
      tmp =>
        merged.select("term", "doc_id", "dl", "tf", "positions", "tb")
          .repartition(nb, col("tb")) // one write task per bucket
          .write.mode("overwrite").partitionBy("tb").parquet(tmp.getPath)
        writeStored(storedLive, tmp)
        writeDict(spark, tmp)
    }
    merged.unpersist()
    writeManifest(root, nb,
      Seg("seg", name, st.getLong(0), st.getLong(1)) +: rest)
    // retirement is [[vacuum]]'s job, NOT the merge's: a reader that
    // loaded the previous manifest generation an instant before this
    // commit may still be mid-scan of the folded directories —
    // deleting them here would fail it with file-not-found. The
    // Delta model: the commit flips visibility, the age-thresholded
    // vacuum reclaims space once no plausible reader holds the old
    // generation.
    (posts.size, dels.size)
  }

  /** Snapshot — ES's repository snapshot, structurally: copy every
    * manifest-referenced directory to `destDir`, then commit the
    * manifest there by the same atomic rename (data first, manifest
    * last — a crashed snapshot leaves the destination readable at its
    * previous generation). INCREMENTAL exactly the way ES snapshots
    * are: segments are immutable and content-addressed by name, so a
    * directory already present in the destination is skipped — a
    * re-snapshot after N new batches copies N directories, never the
    * index. The destination IS a working index (the manifest is
    * self-contained), so restore = read it; orphans and retired
    * generations are excluded by construction (only referenced names
    * copy). Returns the number of directories copied. At 100 TB this
    * file list is exactly what an object-store copy service takes.
    */
  def snapshot(rootDir: String, destDir: String): Int = {
    val root = new java.io.File(rootDir)
    val (nb, segs) = readManifest(root)
    val dest = new java.io.File(destDir)
    dest.mkdirs()
    var copied = 0
    segs.foreach { sg =>
      val to = new java.io.File(dest, sg.name)
      if (!to.exists()) {
        copyTree(new java.io.File(root, sg.name), to)
        copied += 1
      }
    }
    writeManifest(dest, nb, segs)
    copied
  }

  private def copyTree(from: java.io.File, to: java.io.File): Unit = {
    if (from.isDirectory) {
      to.mkdirs()
      Option(from.listFiles()).toSeq.flatten
        .foreach(f => copyTree(f, new java.io.File(to, f.getName)))
    } else
      java.nio.file.Files.copy(from.toPath, to.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reclaim unreferenced segment directories — crashed writers'
    * orphans and retired generations whose deferred delete never ran.
    * Age-thresholded like [[graft.engine.Bucketing.vacuumStaging]] so
    * an in-flight writer's data (committed by the manifest rename
    * that FOLLOWS its writes) is never pulled down first. Returns the
    * number of directories reclaimed. */
  def vacuum(rootDir: String, olderThanMs: Long = 3600L * 1000): Int = {
    val root = new java.io.File(rootDir)
    val (_, segs) = readManifest(root)
    val liveNames = segs.map(_.name).toSet
    val now = System.currentTimeMillis()
    def newestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified() +:
          Option(f.listFiles()).toSeq.flatten.map(newestMtime)).max
      else f.lastModified()
    val orphans = Option(root.listFiles()).toSeq.flatten.filter { f =>
      (f.isDirectory &&
        (f.getName.startsWith("seg=") || f.getName.startsWith("del=")) &&
        !liveNames.contains(f.getName) ||
        // a crashed writeManifest's un-renamed temp commit file
        f.isFile && f.getName.startsWith("_SEGMENTS.tmp-")) &&
        now - newestMtime(f) >= olderThanMs
    }
    orphans.foreach(graft.engine.Bucketing.deleteTree)
    orphans.size
  }
}
