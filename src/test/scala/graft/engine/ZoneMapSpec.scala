package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZoneMapSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir =
    graft.queries.SqlSurface.ensureZonemappedLineitem(spark, sf001)
  private lazy val plain = spark.read.parquet(s"$sf001/lineitem.parquet")

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("l_orderkey", "l_linenumber", "l_partkey")
    .as[(Long, Long, Long)].collect().toSet

  test("zone-mapped copy is lossless: a Bloom-pruned point lookup " +
    "returns exactly the plain table's rows") {
    val (survivors, df) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 777L)
    assert(rows(df) == rows(plain.filter(col("l_orderkey") === 777)))
    assert(rows(df).nonEmpty, "fixture must contain order 777")
    // the Bloom lever: order 777 has a handful of lineitems, so at
    // most that many units (plus rare false positives) survive out
    // of 16 — the layout column cannot prune this predicate at all
    assert(survivors.size < 16,
      s"Bloom pruned nothing: $survivors")
    assert(survivors.size <= 8, s"pruning too weak: $survivors")
  }

  test("range lever prunes to the low buckets; absent key prunes to " +
    "(almost) nothing; both stay lossless") {
    // partkey <= 24 of span 0..199 over 16 units → units 0..1 only
    val (sLow, dfLow) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, 24L, point = 777L)
    assert(sLow.forall(_ <= 1), s"range lever failed: $sLow")
    assert(rows(dfLow) == rows(plain.filter(
      col("l_partkey") <= 24 && col("l_orderkey") === 777)))
    // a key that was never written: only Bloom false positives can
    // survive, and the residual filter still yields zero rows
    val (sAbsent, dfAbsent) = ZoneMap.zonemapScan(spark, dir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 99999999L)
    assert(sAbsent.size <= 2, s"absent-key pruning too weak: $sAbsent")
    assert(dfAbsent.count() == 0)
  }

  test("appendOnce: appended keys become probe-able through their own " +
    "manifest segment, replay is a no-op, the base manifest never " +
    "rewrites, and out-of-geometry values clamp losslessly") {
    val src = new java.io.File(s"$sf001/lineitem.parquet")
    // v2 = batch-content version: the staged dir and its append
    // markers outlive the JVM, so a changed spec batch needs its own
    // lineage
    val key = s"$sf001|${src.lastModified}|${src.length}#spec-append-v2"
    val adir = ZoneMap.ensureZonemapped(spark, key, plain,
      "l_partkey", "l_orderkey", "lineitem_spec")
    def census(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(adir)).map(f => f.getPath -> f.length()).toMap
    }
    val baseManifest = new java.io.File(adir, "zonemap").listFiles()
      .map(f => f.getName -> f.length()).toMap
    // batch: order 777 shifted, plus one row whose partkey sits ABOVE
    // the staged geometry (clamps into the last unit)
    val batch = plain.filter(col("l_orderkey") === 777)
      .withColumn("l_orderkey", col("l_orderkey") + lit(5000000L))
      .withColumn("l_partkey",
        when(col("l_linenumber") === 3, lit(99999L))
          .otherwise(col("l_partkey")))
    ZoneMap.appendOnce(spark, adir, batch, "l_partkey", "l_orderkey",
      "spec-b1")
    val after = census()
    ZoneMap.appendOnce(spark, adir, batch, "l_partkey", "l_orderkey",
      "spec-b1")
    assert(census() == after, "replayed append mutated the index")
    assert(new java.io.File(adir, "zonemap").listFiles()
      .map(f => f.getName -> f.length()).toMap == baseManifest,
      "append rewrote the base manifest")
    // the appended key resolves — including the clamped row
    val (sv, df) = ZoneMap.zonemapScan(spark, adir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 5000777L)
    val got = df.select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Long, Long)].collect().toSet
    val want = batch.select("l_orderkey", "l_linenumber", "l_partkey")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"survivors=$sv")
    assert(got.exists(_._3 == 99999L), "clamped row must be readable")
    // base keys stay intact behind the appended segments
    val (_, base777) = ZoneMap.zonemapScan(spark, adir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, point = 777L)
    assert(rows(base777) == rows(plain.filter(col("l_orderkey") === 777)))
  }

  test("compactManifest folds every segment into one, probes admit " +
    "the same rows, folded appends stay replay-proof, and appends " +
    "after the fold still work") {
    // fresh staged dir per run: compaction mutates the segment layout,
    // so a memoized dir from an earlier JVM would start post-fold
    val key = s"$sf001#spec-compact-" +
      java.util.UUID.randomUUID().toString.take(8)
    val cdir = ZoneMap.ensureZonemapped(spark, key, plain,
      "l_partkey", "l_orderkey", "lineitem_cmp")
    def shifted(order: Long, by: Long) =
      plain.filter(col("l_orderkey") === order)
        .withColumn("l_orderkey", col("l_orderkey") + lit(by))
    ZoneMap.appendOnce(spark, cdir, shifted(777, 5000000L),
      "l_partkey", "l_orderkey", "cmp-b1")
    ZoneMap.appendOnce(spark, cdir, shifted(778, 6000000L),
      "l_partkey", "l_orderkey", "cmp-b2")
    def segCount = new java.io.File(cdir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("zonemap"))
    def probe(p: Long) = {
      val (sv, df) = ZoneMap.zonemapScan(spark, cdir,
        "l_partkey", "l_orderkey", 0L, Long.MaxValue, p)
      (sv, rows(df))
    }
    val points = Seq(5000777L, 6000778L, 777L)
    val before = points.map(probe)
    assert(before.forall(_._2.nonEmpty), "probes must hit pre-fold")
    assert(segCount == 3)
    assert(ZoneMap.compactManifest(spark, cdir) == 3)
    assert(segCount == 1, "fold must leave exactly one segment")
    assert(points.map(probe) == before,
      "fold changed an admitted unit set or result")
    // a folded batch's replay is still a no-op (marker preserved)
    ZoneMap.appendOnce(spark, cdir, shifted(777, 5000000L),
      "l_partkey", "l_orderkey", "cmp-b1")
    assert(segCount == 1, "replay of a folded batch re-appended")
    // the index keeps accepting appends after the fold
    ZoneMap.appendOnce(spark, cdir, shifted(779, 7000000L),
      "l_partkey", "l_orderkey", "cmp-b3")
    assert(probe(7000779L)._2 ==
      rows(shifted(779, 7000000L)))
    assert(probe(777L)._2 == before.last._2)
  }

  test("vacuum reclaims only unreferenced data files; probes and " +
    "replays are unaffected; a second vacuum removes nothing") {
    val key = s"$sf001#spec-vacuum-" +
      java.util.UUID.randomUUID().toString.take(8)
    val vdir = ZoneMap.ensureZonemapped(spark, key, plain,
      "l_partkey", "l_orderkey", "lineitem_vac")
    val batch = plain.filter(col("l_orderkey") === 777)
      .withColumn("l_orderkey", col("l_orderkey") + lit(5000000L))
    ZoneMap.appendOnce(spark, vdir, batch, "l_partkey", "l_orderkey",
      "vac-b1")
    // plant a crashed appender's leftovers: data no manifest commits
    batch.coalesce(1).write.mode("overwrite")
      .parquet(s"$vdir/data_orphan/zf=0")
    def probe(p: Long) = rows(ZoneMap.zonemapScan(spark, vdir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, p)._2)
    val before = (probe(777L), probe(5000777L))
    assert(ZoneMap.vacuum(spark, vdir) == 1,
      "exactly the planted orphan file must go")
    assert(!new java.io.File(s"$vdir/data_orphan").exists(),
      "fully-orphaned data tree must be swept")
    assert((probe(777L), probe(5000777L)) == before,
      "vacuum changed a scan result")
    assert(ZoneMap.vacuum(spark, vdir) == 0, "vacuum must be idempotent")
    // the appended batch's committed files survived the sweep
    assert(probe(5000777L).nonEmpty)
  }

  test("an INT bloom column prunes WITHOUT false negatives: build-" +
    "side hashing casts to bigint to match the Long probe hash") {
    import spark.implicits._
    // bc is INT: before the cast fix, xxhash64(INT) != xxhash64(BIGINT)
    // made every probe a silent false negative (missing rows)
    val df = (0 until 200).map(i => (i.toLong, i)).toDF("rk", "bc")
    val idir = ZoneMap.ensureZonemapped(spark, "spec-intbloom-v1", df,
      rangeCol = "rk", bloomCol = "bc", "intbloom", numFiles = 4)
    val (sv, out) = ZoneMap.zonemapScan(spark, idir, "rk", "bc",
      0L, 300L, point = 57L)
    assert(out.count() == 1, s"INT bloom key lost rows (survivors=$sv)")
    assert(sv.nonEmpty && sv.size < 4, s"pruning shape off: $sv")
  }

  test("a fold preserves the replay marker of an append whose " +
    "fingerprint starts with 'c' — the fold-name/fingerprint " +
    "collision regression") {
    // find a batchKey whose MD5-prefix fingerprint starts with 'c':
    // before the exact-pattern marker rule, compactManifest classified
    // its segment as a fold (zonemap_c*), left no _APPENDED_ marker,
    // and a replay silently re-appended the batch (duplicated rows)
    val cKey = Iterator.from(0).map(i => s"cfp-batch-$i")
      .find(k => Bucketing.fingerprint8(k).startsWith("c")).get
    val key = s"$sf001#spec-cfp-" +
      java.util.UUID.randomUUID().toString.take(8)
    val cdir = ZoneMap.ensureZonemapped(spark, key, plain,
      "l_partkey", "l_orderkey", "lineitem_cfp")
    val batch = plain.filter(col("l_orderkey") === 777)
      .withColumn("l_orderkey", col("l_orderkey") + lit(5000000L))
    ZoneMap.appendOnce(spark, cdir, batch, "l_partkey", "l_orderkey",
      cKey)
    def probe() = rows(ZoneMap.zonemapScan(spark, cdir,
      "l_partkey", "l_orderkey", 0L, Long.MaxValue, 5000777L)._2)
    val before = probe()
    assert(before.nonEmpty)
    assert(ZoneMap.compactManifest(spark, cdir) == 2)
    assert(new java.io.File(cdir,
      s"_APPENDED_${Bucketing.fingerprint8(cKey)}").isFile,
      "fold must leave the replay marker for a 'c'-fingerprint append")
    // the replay must be a no-op — no duplicated rows
    ZoneMap.appendOnce(spark, cdir, batch, "l_partkey", "l_orderkey",
      cKey)
    assert(probe() == before, "replay after fold duplicated the batch")
    val folds = new java.io.File(cdir).listFiles()
      .count(_.getName.startsWith("zonemap_fold-"))
    assert(folds == 1, "fold segment must carry the fold- name")
  }

  test("the manifest is bounded by the layout: one stats row per " +
    "file unit") {
    val stats = spark.read.parquet(s"$dir/zonemap")
    assert(stats.count() <= 16)
    // min/max really describe the files: unit ranges are disjoint
    val ranges = stats.select("zf", "mn", "mx")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, mxA), (_, mnB, _)) => assert(mxA < mnB)
      case _ =>
    }
  }
}
