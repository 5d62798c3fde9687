package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, (1 to 80).map(i => s"w$i").mkString(" ")), // 80 tokens
    (2L, "short doc here"))
    .toDF("doc_id", "text")

  test("chunk: sliding windows cover every token; short docs get one chunk") {
    val c = Pipeline.chunk(docs, size = 32, stride = 16)
      .as[(Long, Long, String, Long)].collect()
    val doc1 = c.filter(_._1 == 1L).sortBy(_._2)
    // 80 tokens, size 32, stride 16 → ceil((80-32)/16)=3 → chunks 0..3
    assert(doc1.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(doc1.take(3).forall(_._4 == 32L))
    assert(doc1.head._3.startsWith("w1 w2 "))
    // last chunk starts at 3*16+1 = 49 → 32 tokens to 80 exactly
    assert(doc1.last._4 == 32L)
    val doc2 = c.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._4 == 3L)
    // coverage: every token of doc1 appears in some chunk
    val covered = doc1.flatMap(_._3.split(" ")).toSet
    assert((1 to 80).forall(i => covered.contains(s"w$i")))
  }

  test("redact replaces emails before digits and counts rewrites") {
    val r = Pipeline.redact(Seq(
        (1L, "mail me at bob99@mail.com or call 555 1234"),
        (2L, "nothing sensitive here"))
      .toDF("doc_id", "text"))
      .select("doc_id", "redacted", "n_redactions")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(r(0)._2 == "mail me at <email> or call <num> <num>")
    assert(r(0)._3 == 3L)
    assert(r(1)._2 == "nothing sensitive here" && r(1)._3 == 0L)
  }

  test("split is content-based: identical text → identical split") {
    val df = Seq((1L, "same text alpha beta"), (2L, "same text alpha beta"),
      (3L, "totally different content"))
      .toDF("doc_id", "text")
    val s = Pipeline.split(df).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s(1L) == s(2L))
  }

  test("split buckets partition [0,100) into train/val/test") {
    val sf = spark.read.parquet(s"$sf001/documents.parquet")
    val s = Pipeline.split(sf)
    val bad = s.filter(
      (col("split") === "train" && col("bucket") >= 80) ||
        (col("split") === "val" && (col("bucket") < 80 || col("bucket") >= 90)) ||
        (col("split") === "test" && col("bucket") < 90)).count()
    assert(bad == 0L)
    assert(s.select("split").distinct().count() == 3)
  }

  test("systematicSample is stable and roughly proportional") {
    val sf = spark.read.parquet(s"$sf001/documents.parquet")
    val a = Pipeline.systematicSample(sf, 10).select("doc_id")
      .as[Long].collect().sorted
    val b = Pipeline.systematicSample(sf, 10).select("doc_id")
      .as[Long].collect().sorted
    assert(a.toSeq == b.toSeq) // deterministic
    assert(a.length > 10 && a.length < 150) // ~10% of 500, loose bounds
  }

  test("mixturePlan: binding language keeps everything, shares are exact") {
    val docs = Seq(
      (1L, "en", ("w " * 99).trim + " w"),  // en: 100 tokens
      (2L, "zh", ("w " * 9).trim + " w"),   // zh: 10 tokens
      (3L, "de", ("w " * 499).trim + " w")  // de: 500 tokens
    ).toDF("doc_id", "lang", "text")
    val plan = Pipeline.mixturePlan(docs,
        Seq("en" -> 0.5, "zh" -> 0.25, "de" -> 0.25))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // zh binds: 10 / 0.25 = 40 total budget
    assert(plan("zh") == (("zh", 10L, 10L, 1048576L))) // rate exactly 1.0
    assert(plan("en")._3 == 20L) // 0.5 * 40
    assert(plan("de")._3 == 10L) // 0.25 * 40
    assert(plan("en")._4 == (1048576L * 20 / 100)) // rate 0.2 in fx
    // a targeted language ABSENT from the corpus zeroes the budget —
    // the mixture is not servable at those shares at all
    val impossible = Pipeline.mixturePlan(docs,
        Seq("en" -> 0.5, "fr" -> 0.5))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(impossible.keySet == Set("en", "fr"))
    assert(impossible("fr") == (("fr", 0L, 0L, 0L)))
    assert(impossible("en")._3 == 0L && impossible("en")._4 == 0L)
  }

  test("stratifiedSample applies per-stratum rates deterministically") {
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
    val rates = Map("en" -> 5, "zh" -> 30)
    val kept = Pipeline.stratifiedSample(corpus, rates, defaultPct = 15)
    // every kept row satisfies its stratum's rate
    val viol = kept.filter(col("bucket") >= col("keep_rate")).count()
    assert(viol == 0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = corpus.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rare-kept stratum is sampled harder than the boosted one
    assert(byLang.getOrElse("en", 0L).toDouble / totals("en") <
      byLang.getOrElse("zh", 0L).toDouble / totals("zh"))
    // content-hash determinism: repartitioning changes nothing
    val again = Pipeline.stratifiedSample(corpus.repartition(7), rates, 15)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("weightedSample: exact IPPS thresholds, hand-computed") {
    // replicate char_poly_hash in the test so expected keeps are
    // derived independently of the operator
    def h(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)
    val M = 1000003L
    val texts = Seq("a b", "x y z", "p q r s t") // weights 2, 3, 5; W=10
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Pipeline.weightedSample(corpus, targetDocs = 1L)
      .select("doc_id", "n_tokens", "thresh", "ht_weight")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      val w = t.split(" ").length.toLong
      val thresh = math.min(M, 1L * w * M / 10L)
      if (h(t) % M < thresh)
        Some((i.toLong, w, thresh, M.toDouble / thresh.toDouble))
      else None
    }
    assert(got == expected)
    // hand-check one threshold: floor(5 * 1000003 / 10) = 500001
    assert(expected.forall { case (_, w, th, _) =>
      th == math.min(M, w * M / 10L) })
  }

  test("weightedSample: oversize docs are certainty draws, ht = 1") {
    // one doc holds >half the mass with targetDocs=2 → p=1, always kept
    val big = (1 to 300).map("w" + _).mkString(" ")
    val corpus = (Seq((0L, big)) ++
      (1 to 50).map(i => (i.toLong, s"tiny doc $i"))).toDF("doc_id", "text")
    val got = Pipeline.weightedSample(corpus, targetDocs = 2L)
      .select("doc_id", "thresh", "ht_weight")
      .as[(Long, Long, Double)].collect()
    val bigRow = got.find(_._1 == 0L)
    assert(bigRow.isDefined, "certainty draw must be present")
    assert(bigRow.get._2 == 1000003L && bigRow.get._3 == 1.0)
    // determinism under repartitioning
    val again = Pipeline.weightedSample(corpus.repartition(7), 2L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == got.map(_._1).sorted.toSeq)
  }

  test("shardedShuffle: permutation is complete, repartition-invariant, " +
    "and salt-keyed") {
    val corpus = (1L to 500L).map(i => (i, s"doc body $i"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, salt: String) =
      Pipeline.shardedShuffle(df, nShards = 8, salt = salt)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = run(corpus, "shuffle")
    // complete permutation: every doc exactly once, shards in [0, 8),
    // within-shard positions are 1..size(shard) with no gaps
    assert(base.map(_._1) == (1L to 500L))
    assert(base.forall(r => r._2 >= 0 && r._2 < 8))
    base.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq,
        s"shard $shard positions have gaps")
    }
    // no degenerate assignment: the hash spreads docs over every shard
    assert(base.map(_._2).distinct.size == 8)
    // repartition invariance: a different physical layout yields the
    // SAME logical permutation row-for-row
    assert(run(corpus.repartition(7), "shuffle") == base)
    assert(run(corpus.repartition(3, col("doc_id")), "shuffle") == base)
    // a new salt is a genuinely different epoch permutation
    assert(run(corpus, "epoch2") != base)
  }

  test("mergeUpsert: updates replace same-key rows, new keys append, " +
    "untouched rows survive verbatim") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "text")
    val updates = Seq((2L, "B2"), (9L, "new"))
      .toDF("doc_id", "text")
    val out = Pipeline.mergeUpsert(base, updates, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
    // idempotence: merging the same updates again changes nothing
    val again = Pipeline.mergeUpsert(
      Pipeline.mergeUpsert(base, updates, "doc_id"), updates, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(again == out)
  }

  test("mergeUpsert: the documented key precondition is real — " +
    "duplicate update keys emit both rows, null keys never match") {
    val base = Seq((Some(1L), "a"), (None, "nullbase"))
      .toDF("doc_id", "text")
    // duplicate key in updates → MERGE cardinality violation: both
    // update rows survive the union (2 rows for key 1)
    val dupUpd = Seq((Some(1L), "u1"), (Some(1L), "u2"))
      .toDF("doc_id", "text")
    val dupOut = Pipeline.mergeUpsert(base, dupUpd, "doc_id")
      .as[(Option[Long], String)].collect()
    assert(dupOut.count(_._1.contains(1L)) == 2,
      "duplicate update keys must surface as duplicate rows (documented)")
    // null key in updates → anti join can't match it, so the null-key
    // base row survives ALONGSIDE the null-key update
    val nullUpd = Seq((Option.empty[Long], "nullupd"))
      .toDF("doc_id", "text")
    val nullOut = Pipeline.mergeUpsert(base, nullUpd, "doc_id")
      .as[(Option[Long], String)].collect()
    assert(nullOut.count(_._1.isEmpty) == 2,
      "null-key rows must not merge (SQL null semantics, documented)")
    // the caller-side guard the scaladoc prescribes: pre-aggregated
    // unique non-null keys restore MERGE semantics
    val clean = dupUpd.filter(col("doc_id").isNotNull)
      .groupBy("doc_id").agg(max(col("text")).as("text"))
    val cleanOut = Pipeline.mergeUpsert(base, clean, "doc_id")
      .as[(Option[Long], String)].collect()
    assert(cleanOut.count(_._1.contains(1L)) == 1)
  }

  test("writeShards: shard dirs partition the corpus in permutation " +
    "order; rewrite from any layout is identical") {
    val corpus = (1L to 300L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Pipeline.writeShards(corpus, dir, nShards = 4)
    // the audit view is the ground truth for order within each shard
    val expected = Pipeline.shardedShuffle(corpus, nShards = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).map { case (s, rows) =>
        s -> rows.sortBy(_._3).map(_._1).toSeq
      }
    def shardDocs(d: String, s: Int): Seq[Long] =
      spark.read.parquet(s"$d/shard=$s").select("doc_id")
        .as[Long].collect().toSeq
    (0 until 4).foreach { s =>
      assert(shardDocs(dir, s) == expected(s.toLong),
        s"shard $s not in permutation order")
    }
    // determinism: rewriting from a different physical layout
    // reproduces every shard file row-for-row
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Pipeline.writeShards(corpus.repartition(7), dir2, nShards = 4)
    (0 until 4).foreach { s =>
      assert(shardDocs(dir2, s) == shardDocs(dir, s))
    }
  }

  test("applyCdc: upserts replace, appends land, deletes remove — in " +
    "one batch") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val batch = Seq((2L, "B2", "U"), (9L, "new", "U"), (3L, "", "D"))
      .toDF("doc_id", "text", "op")
    val out = Pipeline.applyCdc(base, batch, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (9L, "new")))
  }

  test("snapshotAt: every version stays readable after newer batches " +
    "exist, version 0 is the base, bounds are enforced") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val b1 = Seq((1L, "a1", "U"), (3L, "c", "U"))
      .toDF("doc_id", "text", "op")
    val b2 = Seq((2L, "", "D"), (3L, "c2", "U"))
      .toDF("doc_id", "text", "op")
    val log = Seq(b1, b2)
    def snap(v: Int) = Pipeline.snapshotAt(base, log, v, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(snap(0) == Seq((1L, "a"), (2L, "b")))
    assert(snap(1) == Seq((1L, "a1"), (2L, "b"), (3L, "c")))
    assert(snap(2) == Seq((1L, "a1"), (3L, "c2")))
    // time travel: v1 re-read AFTER v2 was computed is unchanged
    assert(snap(1) == Seq((1L, "a1"), (2L, "b"), (3L, "c")))
    intercept[IllegalArgumentException](snap(3))
    intercept[IllegalArgumentException](snap(-1))
  }

  test("maintainAgg equals the from-scratch aggregation, including a " +
    "group vanishing entirely") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L),
      (4L, "c", 7L)).toDF("doc_id", "grp", "v")
    val batch = Seq(
      (2L, "a", 25L, "U"),  // update in place
      (9L, "c", 3L, "U"),   // append
      (3L, "b", 0L, "D"))   // delete the ONLY b row → group b vanishes
      .toDF("doc_id", "grp", "v", "op")
    val maintained = Pipeline
      .maintainAgg(base.groupBy("grp")
          .agg(count(lit(1)).as("n"), sum("v").as("s")),
        base, batch, "doc_id", "grp", "v")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val recomputed = Pipeline.applyCdc(base, batch, "doc_id")
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(maintained == recomputed)
    assert(!maintained.exists(_._1 == "b"), "emptied group must drop")
    assert(maintained == Seq(("a", 2L, 35L), ("c", 2L, 10L)))
  }

  test("maintainTopK equals the from-scratch top-k view — including " +
    "a member deletion (k+1 promotion), a cross-group move, and an " +
    "untouched group passing through") {
    val base = Seq(
      (1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "b", 90L), (6L, "b", 80L),
      (7L, "c", 5L)).toDF("doc_id", "grp", "v")
    val batch = Seq(
      (1L, "a", 0L, "D"),   // delete a's rank-1 → lower ranks promote
      (6L, "a", 85L, "U"),  // MOVE 6 from b to a (both groups touched)
      (8L, "b", 70L, "U"))  // append into b
      .toDF("doc_id", "grp", "v", "op")
    val view = Pipeline.topKView(base, "doc_id", "grp", "v", 2)
    val maintained = Pipeline
      .maintainTopK(view, base, batch, "doc_id", "grp", "v", 2)
      .as[(String, Long, Long, Long)].collect().sortBy(t => (t._1, t._4))
      .toSeq
    val recomputed = Pipeline
      .topKView(Pipeline.applyCdc(base, batch, "doc_id"),
        "doc_id", "grp", "v", 2)
      .as[(String, Long, Long, Long)].collect().sortBy(t => (t._1, t._4))
      .toSeq
    assert(maintained == recomputed)
    assert(maintained == Seq(
      ("a", 6L, 85L, 1L), ("a", 2L, 40L, 2L),   // mover wins a
      ("b", 5L, 90L, 1L), ("b", 8L, 70L, 2L),   // 6 left, 8 entered
      ("c", 7L, 5L, 1L)))                       // untouched group intact
  }

  test("rebaseLog: snapshot identical across the checkpoint, replay " +
    "depth resets, later batches land on the rebased base") {
    import java.nio.file.Files
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "t")
    val root = Files.createTempDirectory("graft-rebase").toString
    def seg(rows: Seq[(Long, String, String)], e: Int): Unit =
      rows.toDF("doc_id", "t", "op").coalesce(1)
        .write.mode("overwrite").parquet(s"$root/log/batch=$e")
    seg(Seq((2L, "Y2", "U"), (9L, "n", "U")), 0)
    seg(Seq((1L, "", "D")), 1)
    def snap() = Pipeline.snapshotOf(spark, base, root, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val before = snap()
    assert(Pipeline.rebaseLog(spark, base, root, "doc_id") == 2)
    assert(snap() == before, "rebase changed the snapshot")
    assert(!new java.io.File(s"$root/log/batch=0").exists(),
      "folded segments must retire")
    // replay after rebase folds ONLY the new segment
    seg(Seq((9L, "n2", "U"), (3L, "", "D")), 2)
    assert(snap() == Seq((2L, "Y2"), (9L, "n2")))
    // an empty log re-bases to a no-op
    assert(Pipeline.rebaseLog(spark, base, root, "doc_id") == 1)
    assert(Pipeline.rebaseLog(spark, base, root, "doc_id") == 0)
    assert(snap() == Seq((2L, "Y2"), (9L, "n2")))
  }

  test("pruneSummaries keeps the newest versions, fails loudly at " +
    "pruned ones, and maintenance continues off the survivor") {
    import java.nio.file.Files
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("doc_id", "source", "n_chars")
    val scratch = Files.createTempDirectory("graft-prune").toString
    val logDir = s"$scratch/log"
    val sumDir = s"$scratch/summary"
    def absorb(rows: Seq[(Long, String, Long, String)], e: Long): Unit =
      Pipeline.absorbSummaryBatch(
        rows.toDF("doc_id", "source", "n_chars", "op"),
        base, logDir, sumDir, "doc_id", "source", "n_chars", e)
    absorb(Seq((2L, "a", 25L, "U")), 0L)
    absorb(Seq((4L, "b", 40L, "U")), 1L)
    absorb(Seq((1L, "", 0L, "D")), 2L)
    assert(Pipeline.summaryVersions(sumDir) == Seq(0L, 1L, 2L))
    val latest = Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet
    assert(Pipeline.pruneSummaries(sumDir, keepLast = 2) == 1)
    assert(Pipeline.summaryVersions(sumDir) == Seq(1L, 2L))
    // the surviving latest is byte-for-byte the same frame
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet == latest)
    // time travel to a pruned version fails loudly, never serves a
    // newer version silently
    intercept[IllegalArgumentException] {
      Pipeline.readSummary(spark, sumDir, 0L)
    }
    // maintenance continues: the next epoch absorbs off version 2
    absorb(Seq((5L, "c", 50L, "U")), 3L)
    val want = Pipeline.replayLog(spark, base, logDir, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet == want)
    // pruning is idempotent at the same retention
    assert(Pipeline.pruneSummaries(sumDir, keepLast = 3) == 0)
    intercept[IllegalArgumentException] {
      Pipeline.pruneSummaries(sumDir, keepLast = 0)
    }
  }

  test("pruneSummaries spares an in-flight absorb's staged delta " +
    "(epochs newer than the newest committed manifest), tolerates " +
    "foreign dirs, and no-ops on an empty store") {
    import java.nio.file.Files
    val base = Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("doc_id", "source", "n_chars")
    val scratch = Files.createTempDirectory("graft-prace").toString
    val logDir = s"$scratch/log"
    val sumDir = s"$scratch/summary"
    def absorb(rows: Seq[(Long, String, Long, String)], e: Long): Unit =
      Pipeline.absorbSummaryBatch(
        rows.toDF("doc_id", "source", "n_chars", "op"),
        base, logDir, sumDir, "doc_id", "source", "n_chars", e)
    // empty store: every delta dir belongs to a replayable first
    // epoch — prune must return 0 and sweep NOTHING
    val early = new java.io.File(s"$sumDir/delta/e=0/gb=1")
    early.mkdirs()
    assert(Pipeline.pruneSummaries(sumDir, keepLast = 1) == 0)
    assert(early.exists(), "an uncommitted first epoch was swept")
    graft.engine.Bucketing.deleteTree(
      new java.io.File(s"$sumDir/delta/e=0"))
    absorb(Seq((1L, "a", 15L, "U")), 0L)
    absorb(Seq((3L, "c", 30L, "U")), 1L)
    // plant an IN-FLIGHT absorb's staged delta (manifest not yet
    // committed) and a foreign dir beside the real epochs
    val staged = new java.io.File(s"$sumDir/delta/e=9/gb=0")
    staged.mkdirs()
    Files.writeString(
      new java.io.File(staged, "part-00000").toPath, "staged")
    val foreign = new java.io.File(s"$sumDir/delta/e=notanepoch")
    foreign.mkdirs()
    val before = Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet
    assert(Pipeline.pruneSummaries(sumDir, keepLast = 1) == 1)
    assert(staged.exists(),
      "prune swept an in-flight epoch's staged buckets — the race " +
        "its epoch guard exists to close")
    assert(foreign.exists(), "foreign dirs must be tolerated")
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet == before)
    // the in-flight absorb now COMMITS — its staged data serves
    absorb(Seq((9L, "z", 90L, "U")), 9L)
    assert(Pipeline.summaryVersions(sumDir).last == 9L)
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet
      .exists(_._1 == "z"), "the committed absorb must serve")
  }

  test("the versioned view store rewrites ONLY the buckets an epoch " +
    "touches: a one-group batch writes one bucket directory, " +
    "untouched buckets carry forward by manifest reference") {
    import java.nio.file.Files
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 7L), (5L, "d", 9L), (6L, "e", 11L))
      .toDF("doc_id", "source", "n_chars")
    val scratch = Files.createTempDirectory("graft-buckets").toString
    val logDir = s"$scratch/log"
    val sumDir = s"$scratch/summary"
    def gbDirs(e: Long): Seq[String] =
      Option(new java.io.File(sumDir, s"delta/e=$e").listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("gb=")).map(_.getName).sorted
    // epoch 0 bootstraps the full store
    Pipeline.absorbSummaryBatch(
      Seq((2L, "a", 25L, "U")).toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, sumDir, "doc_id", "source", "n_chars", 0L)
    val boot = gbDirs(0L)
    assert(boot.nonEmpty)
    // epoch 1 touches ONE group → exactly ONE bucket directory written
    Pipeline.absorbSummaryBatch(
      Seq((3L, "b", 35L, "U")).toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, sumDir, "doc_id", "source", "n_chars", 1L)
    assert(gbDirs(1L).size == 1,
      s"one-group epoch rewrote ${gbDirs(1L)} — must be one bucket")
    // the untouched buckets' data directories were NOT rewritten:
    // epoch 0's bucket dirs are all still present and the epoch-1
    // manifest must reference epoch 0 for every untouched bucket
    assert(gbDirs(0L) == boot)
    val manifest = Files.readAllLines(new java.io.File(
      sumDir, "_VERSIONS/v=1").toPath)
    val remapped = manifest.toArray(Array.empty[String]).toSeq.tail
      .map(_.split(",")).count(_.apply(1) == "1")
    assert(remapped == 1, s"manifest remapped $remapped buckets")
    // and the composed view still equals the from-scratch replay
    val got = Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet
    val want = Pipeline.replayLog(spark, base, logDir, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
    // version 0 re-read AFTER version 1 exists is unchanged (time
    // travel through shared bucket references)
    val v0want = base.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .as[(String, Long, Long)].collect().toSet
      .map((t: (String, Long, Long)) =>
        if (t._1 == "a") (t._1, t._2, t._3 + 5L) else t)
    assert(Pipeline.readSummary(spark, sumDir, 0L)
      .as[(String, Long, Long)].collect().toSet == v0want)
  }

  test("the top-k view store shares the bucket protocol: a one-group " +
    "epoch rewrites one bucket and the composed view matches the " +
    "from-scratch top-k of the replayed log") {
    import java.nio.file.Files
    val base = Seq(
      (1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L),
      (5L, "b", 90L), (6L, "b", 80L), (7L, "c", 5L))
      .toDF("doc_id", "source", "n_chars")
    val scratch = Files.createTempDirectory("graft-tkbuckets").toString
    val logDir = s"$scratch/log"
    val viewDir = s"$scratch/view"
    def gbDirs(e: Long): Seq[String] =
      Option(new java.io.File(viewDir, s"delta/e=$e").listFiles())
        .toSeq.flatten.filter(f => f.isDirectory &&
          f.getName.startsWith("gb=")).map(_.getName).sorted
    Pipeline.absorbTopKBatch(
      Seq((2L, "a", 45L, "U")).toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, viewDir, "doc_id", "source", "n_chars", 2, 0L)
    Pipeline.absorbTopKBatch(
      Seq((8L, "c", 70L, "U")).toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, viewDir, "doc_id", "source", "n_chars", 2, 1L)
    assert(gbDirs(1L).size == 1,
      s"one-group epoch rewrote ${gbDirs(1L)} — must be one bucket")
    val got = Pipeline.readSummary(spark, viewDir)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._4)).toSeq
    val want = Pipeline.topKView(
      Pipeline.replayLog(spark, base, logDir, "doc_id"),
      "doc_id", "source", "n_chars", 2)
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._4)).toSeq
    assert(got == want)
  }

  test("readSummaryGroups is a bucket-pruned point lookup: only the " +
    "looked-up group's bucket directory is scanned and the rows " +
    "equal the full read filtered") {
    import java.nio.file.Files
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 7L), (5L, "d", 9L), (6L, "e", 11L), (7L, "f", 13L))
      .toDF("doc_id", "source", "n_chars")
    val scratch = Files.createTempDirectory("graft-lookup").toString
    val logDir = s"$scratch/log"
    val sumDir = s"$scratch/summary"
    Pipeline.absorbSummaryBatch(
      Seq((2L, "a", 25L, "U")).toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, sumDir, "doc_id", "source", "n_chars", 0L)
    val out = Pipeline.readSummaryGroups(spark, sumDir, "source",
      Seq("a"))
    val files = out.inputFiles
    assert(files.nonEmpty)
    val bucketDirs = files.map(_.replaceAll("/[^/]*$", "")).toSet
    assert(bucketDirs.size == 1,
      s"one-group lookup scanned ${bucketDirs.size} bucket dirs: " +
        bucketDirs.mkString(", "))
    val got = out.as[(String, Long, Long)].collect().toSeq
    val want = Pipeline.readSummary(spark, sumDir)
      .filter(col("source") === "a")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want && got == Seq(("a", 2L, 35L)))
    // an absent group resolves through its bucket to zero rows,
    // never an error
    assert(Pipeline.readSummaryGroups(spark, sumDir, "source",
      Seq("zz-missing")).count() == 0L)
  }

  test("pruneRebaseMarkers retires all but the newest marker") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-marks").toString
    Seq(0L, 5L, 9L).foreach(e =>
      new java.io.File(root, s"_REBASED_$e").createNewFile())
    assert(Pipeline.pruneRebaseMarkers(root) == 2)
    val left = Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("_REBASED_"))
    assert(left == Seq("_REBASED_9"))
    assert(Pipeline.pruneRebaseMarkers(root) == 0)
  }

  test("contamination finds planted train/test n-gram overlap") {
    val train = Seq((1L, (1 to 20).map("t" + _).mkString(" ")),
      (2L, "unrelated train words only here padding pad pad pad")).toDF("doc_id", "text")
    val test = Seq((10L, (5 to 16).map("t" + _).mkString(" ")), // overlaps doc 1
      (11L, "clean test document with fresh tokens pad2 pad2")).toDF("doc_id", "text")
    val c = Pipeline.contamination(train, test, n = 8)
      .as[(Long, Long, Long)].collect()
    assert(c.exists(r => r._1 == 10L && r._2 == 1L))
    assert(!c.exists(_._1 == 11L))
  }
}
