package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit file-level data-skipping index — the fourth layout lever
  * next to bucketing (join co-location), z-order (correlated
  * multi-column ranges) and hive partitioning (categorical pruning):
  * a ZONE MAP. The staged copy is range-bucketed into `numFiles`
  * units by one column, and a separate tiny stats manifest records,
  * PER FILE UNIT, the min/max of that column plus a Bloom filter over
  * a SECOND, non-layout column. A probe consults the manifest first
  * and reads only the surviving units — file pruning the scan planner
  * cannot do itself, because the Bloom column's values are scattered
  * across the layout (parquet footer min/max on a scattered column
  * spans everything; a Bloom still answers point lookups).
  *
  * Layout (version `zm3`) is the Delta/Iceberg shape made literal:
  * DATA FILES ARE IMMUTABLE AND INVISIBLE UNTIL A MANIFEST ROW
  * REFERENCES THEM. Every manifest row carries (unit, min, max,
  * bloom, file list); readers resolve data through manifests only,
  * never by listing data directories. That one rule buys the three
  * properties a shared 100 TB index needs:
  *
  *  - crash-safe appends: a batch's data files land first (orphaned
  *    and unreadable if the writer dies), then ONE atomic rename
  *    publishes the manifest segment that makes them visible;
  *  - concurrent writers: two JVMs appending the same batch each
  *    write private data files; only the one whose manifest rename
  *    wins publishes — the loser's files stay orphaned (vacuum
  *    fodder), never half-visible;
  *  - manifest compaction: folding segments into one is a pure
  *    manifest rewrite — data files never move — and because readers
  *    de-duplicate by file path, a reader racing the compactor sees
  *    either manifest generation (or briefly both) and always the
  *    same file set.
  *
  * The manifest side is O(numFiles) — bounded by the LAYOUT, not the
  * data — so the probe's driver-side consult stays a constant-size
  * read at any corpus size (at 100 TB the manifest is thousands of
  * rows where the data is billions; reading it on the driver is the
  * same O(files) listing every table scan already performs).
  *
  * Reference basis: the reference's Elasticsearch side gets this from
  * Lucene per-segment terms indexes
  * (`/root/reference/api/controllers/elastic_controller.go:197-224`);
  * this is the columnar-lakehouse equivalent (SURVEY §2.5).
  */
object ZoneMap {

  /** Stage the zone-mapped copy of `df` AT MOST ONCE per (fixture,
    * layout): range-bucket rows by `rangeCol` into `numFiles` leaf
    * directories (exact integer boundaries — deterministic, no
    * sampling), with the base manifest `zonemap/` holding per-unit
    * (min, max, bloom, file list). `_SUCCESS` lands only after BOTH
    * writes (the whole root publishes by one rename), so a torn
    * staging re-runs. Returns the staged root.
    */
  def ensureZonemapped(spark: SparkSession, fixtureKey: String,
      df: => DataFrame, rangeCol: String, bloomCol: String,
      baseName: String, numFiles: Int = 16,
      bloomItems: Long = 100000L): String = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    // "zm3" = manifest layout version: rows carry explicit file lists
    // and the Bloom hashes cast($bloomCol as bigint) — see [[manifestFor]]
    val fp = Bucketing.fingerprint8(
      s"$fixtureKey|$baseName|zm3|$rangeCol|$bloomCol|$numFiles")
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_zm_${baseName}_$fp")
    Bucketing.atomicStage(dir) { tmp =>
      graft.functions.GraftFunctions.register(spark)
      val src = df
      val head = src.agg(min(col(rangeCol)).cast("long"),
        max(col(rangeCol)).cast("long")).head()
      val (mn, mx) = (head.getLong(0), head.getLong(1))
      require(mx - mn < Long.MaxValue / numFiles,
        s"$rangeCol span ${mx - mn} * $numFiles files overflows int64 " +
          "bucket math — raise the bucket width or use BigInt boundaries")
      writeDataFiles(tmp, "data", src, rangeCol, mn, mx, numFiles)
      manifestFor(spark, tmp, "data", rangeCol, bloomCol, bloomItems)
        .write.mode("overwrite")
        .parquet(new java.io.File(tmp, "zonemap").getPath)
      // persist the bucket geometry so APPENDS route rows into the
      // same units the base layout established
      import spark.implicits._
      Seq((mn, mx, numFiles, bloomItems))
        .toDF("mn", "mx", "num_files", "bloom_items")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(tmp, "layout").getPath)
    }
    dir.getPath
  }

  /** Land one batch's data files under `root/<dataRel>/zf=*`: rows
    * bucket by the FIXED geometry (values outside [mn, mx] clamp into
    * the edge units — their manifest stats still carry the true
    * min/max, so pruning stays lossless). Write-only: nothing becomes
    * readable until a manifest row references these files.
    */
  private def writeDataFiles(root: java.io.File, dataRel: String,
      src: DataFrame, rangeCol: String, mn: Long, mx: Long,
      numFiles: Int): Unit = {
    val span = mx - mn + 1
    // exact integer bucket math (`div`, not `/` — Column./ is IEEE
    // division, lossy past 2^53), clamped to the geometry
    src.withColumn("zf", expr(
        s"int(greatest(0L, least(${numFiles - 1}L, " +
          s"((cast($rangeCol as bigint) - ${mn}L) * ${numFiles}L) " +
          s"div ${span}L)))"))
      .repartition(col("zf"))
      .write.mode("overwrite").partitionBy("zf")
      .parquet(new java.io.File(root, dataRel).getPath)
  }

  /** Manifest rows for the files under `root/<dataRel>`: one row per
    * unit with (zf, mn, mx, bloom, files) where `files` are
    * root-relative paths. Stats come from re-reading the JUST-WRITTEN
    * files (not the in-flight batch frame), so a manifest row
    * describes exactly what its files hold. The Bloom hashes
    * `xxhash64(cast(bloomCol AS BIGINT))` — the probe side hashes a
    * Long literal, and Spark's xxhash64 hashes INT and BIGINT
    * DIFFERENTLY, so without the cast an INT bloom column would
    * silently produce false negatives (missing rows, not just missed
    * pruning).
    */
  private def manifestFor(spark: SparkSession, root: java.io.File,
      dataRel: String, rangeCol: String, bloomCol: String,
      bloomItems: Long): DataFrame = {
    import spark.implicits._
    val dataDir = new java.io.File(root, dataRel)
    val fileRows = Option(dataDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("zf="))
      .flatMap { unit =>
        val zf = unit.getName.stripPrefix("zf=").toInt
        unit.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (zf, s"$dataRel/${unit.getName}/${f.getName}"))
      }
    val files = fileRows.toDF("zf", "path")
      .groupBy("zf").agg(sort_array(collect_list("path")).as("files"))
    spark.read.parquet(dataDir.getPath)
      .groupBy("zf")
      .agg(min(col(rangeCol)).cast("long").as("mn"),
        max(col(rangeCol)).cast("long").as("mx"),
        expr(s"graft_bloom_agg(xxhash64(cast($bloomCol as bigint)), " +
          s"${bloomItems}L)").as("bloom"))
      .join(files, "zf")
      .coalesce(1)
  }

  /** Incremental zone-map upkeep — the ingest path that keeps the
    * staged index fresh without a re-stage (the
    * [[graft.operators.Similarity.ivfAppendOnce]] contract for the
    * layout tier): `batch` rows route into the EXISTING bucket
    * geometry (read from `layout/`) as NEW immutable data files, made
    * visible by a NEW manifest segment `zonemap_<fp>/` — the base
    * manifest is never rewritten, exactly the Delta/Iceberg
    * append-a-manifest-segment shape. [[zonemapScan]] consults every
    * segment; a unit survives if ANY segment admits it, which keeps
    * pruning lossless (a unit whose only match lives in the appended
    * segment is admitted by that segment's row).
    *
    * Crash- and cross-JVM-safe: the data files land under a
    * per-attempt directory first (orphaned, hence invisible, if the
    * writer dies — the Delta posture; a vacuum reclaims them), and the
    * manifest segment publishes via [[Bucketing.atomicStage]]'s
    * UUID-sibling + atomic-rename, so concurrent appenders of the
    * same batch commit exactly one manifest. Idempotent per
    * `batchKey`: a committed segment (or the `_APPENDED_<fp>` marker
    * [[compactManifest]] leaves when it folds one away) makes replays
    * no-ops. Cost is O(|batch|): standing data files and manifest
    * segments are never read or rewritten.
    */
  def appendOnce(spark: SparkSession, dir: String, batch: => DataFrame,
                 rangeCol: String, bloomCol: String,
                 batchKey: String): String = {
    val root = new java.io.File(dir)
    require(new java.io.File(root, "_SUCCESS").isFile,
      s"appendOnce($dir): not a staged zone map")
    val fp = Bucketing.fingerprint8(batchKey)
    val seg = new java.io.File(root, s"zonemap_$fp")
    val folded = new java.io.File(root, s"_APPENDED_$fp")
    if (!new java.io.File(seg, "_SUCCESS").isFile && !folded.isFile) {
      graft.functions.GraftFunctions.register(spark)
      val l = spark.read.parquet(s"$dir/layout").head()
      // per-attempt data dir: two JVMs appending the same batchKey
      // write disjoint files; only the winning manifest's list is
      // ever readable
      val dataRel = s"data_${fp}_" +
        java.util.UUID.randomUUID().toString.take(8)
      writeDataFiles(root, dataRel, batch, rangeCol,
        l.getAs[Long]("mn"), l.getAs[Long]("mx"),
        l.getAs[Int]("num_files"))
      val manifest = manifestFor(spark, root, dataRel, rangeCol,
        bloomCol, l.getAs[Long]("bloom_items"))
      Bucketing.atomicStage(seg) { tmp =>
        manifest.write.mode("overwrite").parquet(tmp.getPath)
      }
    }
    dir
  }

  /** Fold every manifest segment (base + appends + earlier foldings)
    * into ONE — the Delta checkpoint shape, closing the O(batches)
    * growth of per-append segments: the compacted manifest carries the
    * union of all rows (file lists untouched — data never moves), and
    * the folded segments are deleted after an `_APPENDED_<fp>` marker
    * is left for each append segment so [[appendOnce]] replays stay
    * no-ops. Readers de-duplicate by file path, so one racing this
    * fold sees the old segments, the new one, or briefly both — always
    * the same admitted file set (every interleaving of the
    * publish-then-delete sequence is readable). Cost is O(manifest):
    * the data tier is untouched at any scale. Returns the number of
    * segments folded.
    */
  def compactManifest(spark: SparkSession, dir: String): Int = {
    val root = new java.io.File(dir)
    require(new java.io.File(root, "_SUCCESS").isFile,
      s"compactManifest($dir): not a staged zone map")
    val segs = manifestSegments(root)
    if (segs.size <= 1) return segs.size
    val rows = spark.read.parquet(segs.map(_.getPath): _*)
    // fold-segment names carry a character that can NEVER appear in a
    // hex fingerprint ('-'): an append segment is zonemap_<8 hex> and
    // the marker decision below matches that pattern EXACTLY, so a
    // batch whose fingerprint happens to start with any given letter
    // can never be misclassified as a fold (and silently lose its
    // replay marker before its directory is deleted)
    val out = new java.io.File(root, "zonemap_fold-" +
      java.util.UUID.randomUUID().toString.take(8))
    Bucketing.atomicStage(out) { tmp =>
      rows.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    }
    segs.foreach { s =>
      // preserve append idempotence across the fold: the segment dir
      // WAS the replay marker — exact-pattern match, see [[appendOnce]]
      appendFp(s.getName).foreach(fp =>
        new java.io.File(root, s"_APPENDED_$fp").createNewFile())
      Bucketing.deleteTree(s)
    }
    segs.size
  }

  /** The batch fingerprint IFF `name` is an APPEND segment
    * (`zonemap_` + exactly 8 hex chars) — base `zonemap` and
    * `zonemap_fold-*` segments yield None. */
  private def appendFp(name: String): Option[String] = {
    val fp = name.stripPrefix("zonemap_")
    if (name.startsWith("zonemap_") && fp.length == 8 &&
        fp.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))
      Some(fp)
    else None
  }

  /** Reclaim orphaned data files — the vacuum half of the
    * write-invisible-then-commit contract: a crashed appender, or the
    * loser of a concurrent same-batch race, leaves data files that no
    * committed manifest references. They are invisible to every scan
    * ([[zonemapScan]] resolves files through manifests only), so
    * deleting them can never change a result; they are pure disk
    * waste. Walks each `data*` tree once (O(files) driver work, the
    * same class as the manifest listing), deletes unreferenced
    * `.parquet` files plus any data directory emptied by the sweep,
    * and returns the number of files removed.
    *
    * The standard vacuum caveat applies: an append whose data is
    * written but whose manifest has not COMMITTED yet looks orphaned —
    * callers sequence vacuum against in-flight ingest (Delta's
    * retention window is the production form of the same rule).
    */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val root = new java.io.File(dir)
    require(new java.io.File(root, "_SUCCESS").isFile,
      s"vacuum($dir): not a staged zone map")
    val referenced = spark.read.parquet(
        manifestSegments(root).map(_.getPath): _*)
      .select("files").collect()
      .flatMap(_.getSeq[String](0)).toSet
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    val dataRoots = Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("data"))
    var removed = 0
    dataRoots.foreach { d =>
      walk(d).foreach { f =>
        val rel = root.toPath.relativize(f.toPath).toString
        if (f.getName.endsWith(".parquet") && !referenced.contains(rel)) {
          if (f.delete()) removed += 1
        }
      }
      // a data tree left with NO parquet at all is a husk (fully
      // orphaned append attempt) — remove it wholesale, except the
      // base `data/` dir, which the empty-survivor scan path reads
      // for its schema
      if (d.getName != "data" &&
          walk(d).forall(f => !f.getName.endsWith(".parquet")))
        Bucketing.deleteTree(d)
    }
    removed
  }

  /** Committed manifest segments, oldest-name-first: the base
    * `zonemap/` plus every `zonemap_<fp>/` append and `zonemap_c*`
    * fold whose atomic publish completed (`_SUCCESS` present — a
    * mid-rename or crashed segment never qualifies).
    */
  private def manifestSegments(root: java.io.File): Seq[java.io.File] =
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("zonemap") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .sortBy(_.getName)

  /** Probe the staged zone map under the conjunctive predicate
    * `rangeCol BETWEEN lo AND hi AND bloomCol = point`: consult the
    * manifest (O(numFiles) rows per segment — the bounded manifest
    * read), keep rows whose [min, max] overlaps the range AND whose
    * Bloom admits the point (no false negatives ⇒ recall-1 pruning; a
    * false positive only costs a read), then scan ONLY the surviving
    * rows' data files with the exact residual filter on top. File
    * paths de-duplicate across segments, so duplicated manifest rows
    * (a reader racing [[compactManifest]]) never double-read. Returns
    * the surviving unit ids (for the pruning assertion in PlanSpec)
    * and the result frame.
    */
  def zonemapScan(spark: SparkSession, dir: String, rangeCol: String,
      bloomCol: String, lo: Long, hi: Long,
      point: Long): (Seq[Int], DataFrame) = {
    val root = new java.io.File(dir)
    val stats = spark.read.parquet(
      manifestSegments(root).map(_.getPath): _*)
    // The manifest consult happens ON THE DRIVER — the same place the
    // planner prunes partitions — over O(numFiles) rows. The Bloom
    // probe key is xxhash64(cast(point as bigint)), matching the
    // hashing the build side fed into graft_bloom_agg. (The codegen'd
    // might_contain expression requires a CONSTANT filter, so a
    // per-manifest-row probe deserializes each sketch here instead.)
    // seed 42 = the xxhash64() SQL function's fixed seed
    val hash = org.apache.spark.sql.catalyst.expressions
      .XxHash64(Seq(org.apache.spark.sql.catalyst.expressions
        .Literal(point)), 42L).eval().asInstanceOf[Long]
    val admitted = stats
      .filter(col("mx") >= lo && col("mn") <= hi)
      .select("zf", "bloom", "files").collect()
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          .mightContainLong(hash)
      }
    val survivors = admitted.map(_.getInt(0)).distinct.sorted.toSeq
    val files = admitted
      .flatMap(_.getSeq[String](2)).distinct.sorted
    val raw =
      if (files.isEmpty)
        // empty survivor set: keep the output schema without touching
        // any data file beyond the footer of the root read
        spark.read.parquet(s"$dir/data").filter(lit(false))
      else
        spark.read.parquet(files.map(p => s"$dir/$p"): _*)
    val out = raw.drop("zf")
      .filter(col(rangeCol).between(lo, hi) && col(bloomCol) === point)
    (survivors, out)
  }
}
