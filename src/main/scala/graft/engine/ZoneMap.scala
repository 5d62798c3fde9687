package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit file-level data-skipping index — the fourth layout lever
  * next to bucketing (join co-location), z-order (correlated
  * multi-column ranges) and hive partitioning (categorical pruning):
  * a ZONE MAP. The staged copy is range-bucketed into `numFiles`
  * units by one column, and a separate tiny stats table records, PER
  * FILE UNIT, the min/max of that column plus a Bloom filter over a
  * SECOND, non-layout column. A probe consults the stats table first
  * and reads only the surviving units — file pruning the scan planner
  * cannot do itself, because the Bloom column's values are scattered
  * across the layout (parquet footer min/max on a scattered column
  * spans everything; a Bloom still answers point lookups).
  *
  * This is exactly the Delta/Iceberg file-statistics manifest shape:
  * the stats side is O(numFiles) — bounded by the LAYOUT, not the
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
    * sampling), then write `_zonemap/` holding per-unit (min, max,
    * bloom(xxhash64(`bloomCol`))). `_SUCCESS` lands only after BOTH
    * writes, so a torn staging re-runs. Returns the staged root.
    */
  def ensureZonemapped(spark: SparkSession, fixtureKey: String,
      df: => DataFrame, rangeCol: String, bloomCol: String,
      baseName: String, numFiles: Int = 16,
      bloomItems: Long = 100000L): String = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    // "zm2" = manifest-segment layout version (adds `layout/`)
    val fp = Bucketing.fingerprint8(
      s"$fixtureKey|$baseName|zm2|$rangeCol|$bloomCol|$numFiles")
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
      writeSegment(spark, tmp, src, rangeCol, bloomCol, mn, mx,
        numFiles, bloomItems, segment = "zonemap")
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

  /** One data+manifest write: bucket rows by the FIXED geometry
    * (values outside [mn, mx] clamp into the edge units — their
    * segment stats still carry the true min/max, so pruning stays
    * lossless), append the data files, and write this segment's
    * per-unit manifest rows.
    */
  private def writeSegment(spark: SparkSession, root: java.io.File,
      src: DataFrame, rangeCol: String, bloomCol: String, mn: Long,
      mx: Long, numFiles: Int, bloomItems: Long,
      segment: String): Unit = {
    val span = mx - mn + 1
    // exact integer bucket math (`div`, not `/` — Column./ is IEEE
    // division, lossy past 2^53), clamped to the geometry
    val data = src.withColumn("zf", expr(
      s"int(greatest(0L, least(${numFiles - 1}L, " +
        s"((cast($rangeCol as bigint) - ${mn}L) * ${numFiles}L) " +
        s"div ${span}L)))"))
    data.repartition(col("zf"))
      .write.mode("append").partitionBy("zf")
      .parquet(new java.io.File(root, "data").getPath)
    // Stats from the segment's OWN rows: the manifest must describe
    // what this append made readable.
    data.groupBy("zf")
      .agg(min(col(rangeCol)).cast("long").as("mn"),
        max(col(rangeCol)).cast("long").as("mx"),
        expr(s"graft_bloom_agg(xxhash64($bloomCol), ${bloomItems}L)")
          .as("bloom"))
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(new java.io.File(root, segment).getPath)
  }

  /** Incremental zone-map upkeep — the ingest path that keeps the
    * staged index fresh without a re-stage (the
    * [[graft.operators.Similarity.ivfAppendOnce]] contract for the
    * layout tier): `batch` rows route into the EXISTING bucket
    * geometry (read from `layout/`) as appended data files, and the
    * batch's per-unit stats land as a NEW manifest segment — the base
    * manifest is never rewritten, exactly the Delta/Iceberg
    * append-a-manifest-segment shape. [[zonemapScan]] consults every
    * segment; a unit survives if ANY segment admits it, which keeps
    * pruning lossless (a unit whose only match lives in the appended
    * segment is admitted by that segment's row).
    *
    * Idempotent per `batchKey` via an in-dir marker that a re-stage's
    * rebuild clears with the data. Cost is O(|batch|): the standing
    * data files and manifest segments are never read or rewritten.
    */
  def appendOnce(spark: SparkSession, dir: String, batch: => DataFrame,
                 rangeCol: String, bloomCol: String,
                 batchKey: String): String = {
    val root = new java.io.File(dir)
    require(new java.io.File(root, "_SUCCESS").isFile,
      s"appendOnce($dir): not a staged zone map")
    val fp = Bucketing.fingerprint8(batchKey)
    val marker = new java.io.File(root, s"_APPENDED_$fp")
    if (!marker.isFile) {
      graft.functions.GraftFunctions.register(spark)
      val l = spark.read.parquet(s"$dir/layout").head()
      writeSegment(spark, root, batch, rangeCol, bloomCol,
        l.getAs[Long]("mn"), l.getAs[Long]("mx"),
        l.getAs[Int]("num_files"), l.getAs[Long]("bloom_items"),
        segment = s"zonemap_$fp")
      marker.createNewFile()
    }
    dir
  }

  /** Probe the staged zone map under the conjunctive predicate
    * `rangeCol BETWEEN lo AND hi AND bloomCol = point`: consult the
    * stats table (O(numFiles) rows — the bounded manifest read), keep
    * units whose [min, max] overlaps the range AND whose Bloom admits
    * the point (no false negatives ⇒ recall-1 pruning; a false
    * positive only costs a read), then scan ONLY the surviving leaf
    * directories with the exact residual filter on top. Returns the
    * surviving unit ids (for the pruning assertion in PlanSpec) and
    * the result frame.
    */
  def zonemapScan(spark: SparkSession, dir: String, rangeCol: String,
      bloomCol: String, lo: Long, hi: Long,
      point: Long): (Seq[Int], DataFrame) = {
    // every manifest segment (base + appends) — an O(segments) driver
    // listing, the same bounded-manifest contract as the stats read
    val segs = Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("zonemap"))
      .map(_.getPath).sorted
    val stats = spark.read.parquet(segs: _*)
    // The manifest consult happens ON THE DRIVER — the same place the
    // planner prunes partitions — over O(numFiles) rows. The Bloom
    // probe key is xxhash64(point), matching the hashing the build
    // side fed into graft_bloom_agg. (The codegen'd might_contain
    // expression requires a CONSTANT filter, so a per-manifest-row
    // probe deserializes each sketch here instead.)
    // seed 42 = the xxhash64() SQL function's fixed seed
    val hash = org.apache.spark.sql.catalyst.expressions
      .XxHash64(Seq(org.apache.spark.sql.catalyst.expressions
        .Literal(point)), 42L).eval().asInstanceOf[Long]
    val survivors = stats
      .filter(col("mx") >= lo && col("mn") <= hi)
      .select("zf", "bloom").collect()
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          .mightContainLong(hash)
      }
      .map(_.getInt(0)).distinct.sorted.toSeq
    val raw =
      if (survivors.isEmpty)
        // empty survivor set: keep the output schema without touching
        // any data file beyond the footer of the root read
        spark.read.parquet(s"$dir/data").filter(lit(false))
      else
        spark.read.parquet(survivors.map(z => s"$dir/data/zf=$z"): _*)
    val out = raw.drop("zf")
      .filter(col(rangeCol).between(lo, hi) && col(bloomCol) === point)
    (survivors, out)
  }
}
