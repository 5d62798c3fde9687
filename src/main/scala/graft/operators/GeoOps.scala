package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial query/aggregation tier — Elasticsearch's geo family
  * (`geo_bounding_box`, `geo_distance`, the `geo_distance` ring
  * aggregation and the tile-grid bucketing agg) re-expressed as Spark
  * plans over plain `lat`/`lon` double columns.
  *
  * The reference delegates every search capability to Elasticsearch
  * (`api/controllers/elastic_controller.go:196-229` pushes documents;
  * querying happens in ES), whose geo queries run on Lucene's BKD
  * tree: a coarse spatial pre-filter over tree blocks, then an exact
  * per-point check. This module reproduces that two-phase shape with
  * lake primitives:
  *
  *  - COARSE: points are staged into tile directories (
  *    `pt=t{z}_{x}_{y}/`, [[tileKey]]) so a spatial query prunes whole
  *    partitions at planning time (`PartitionFilters` — the directory
  *    tree IS the BKD upper levels), and lat/lon range predicates push
  *    into the parquet scan so row groups drop on footer min/max stats
  *    (the BKD leaves);
  *  - EXACT: the surviving rows run the precise predicate
  *    (box-containment or ring membership) as codegen'd arithmetic.
  *
  * Determinism contract (the reason every formula below avoids libm):
  * distances use ES's `distance_type: plane` model — degrees scaled by
  * [[MetersPerDegree]] — built ONLY from IEEE-exact operations
  * (subtract, multiply, add in fixed order, `sqrt` — all correctly
  * rounded per IEEE-754), so scores hash bit-identically against the
  * DuckDB oracle. Haversine (`sin`/`cos`/`atan2`) is a one-line swap
  * where its libm variance is acceptable; plane is what ES itself
  * recommends for small-extent, sort-dominated workloads. Same for
  * the tile y-axis: ES's `geotile_grid` rows are WebMercator
  * (`ln`/`tan` — libm); [[tileKey]] uses the equirectangular row
  * (pure floor arithmetic) with the identical `z/x/y` key shape.
  */
object GeoOps {

  /** Meters per degree of great-circle arc at the mean earth radius
    * (6371008.8 m · π / 180). Exact-literal so both engines scale by
    * the same IEEE double. */
  val MetersPerDegree = 111195.0

  /** Deterministic synthetic coordinates for a keyed fixture — the
    * sandbox's geo enrichment (the testdata tables carry no
    * coordinates): lat in [-85, 84.99], lon in [-180, 179.99], both
    * on a 0.01° lattice from pure integer arithmetic on the key, so
    * the DuckDB oracle derives bit-identical doubles. -85/85 keeps
    * the lattice inside every tile zoom's defined range. */
  def withSyntheticGeo(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("lat",
        (((col(keyCol) * 37L) % 17000L).cast("double") / lit(100.0))
          - lit(85.0))
      .withColumn("lon",
        (((col(keyCol) * 73L) % 36000L).cast("double") / lit(100.0))
          - lit(180.0))

  /** The equirectangular `z/x/y` tile key for a point:
    * `x = floor((lon+180)/360 · 2^z)`, `y = floor((90−lat)/180 · 2^z)`
    * (y grows southward like slippy tiles), both clamped into
    * [0, 2^z−1] so the lat=−90 / lon=180 edges land in the last tile
    * (ES clamps the same way). Pure floor arithmetic — see the object
    * doc for why the WebMercator row is not used. `sep` swaps the
    * ES-shape `/` for a filesystem-safe `_` when the key names hive
    * partition directories (a `/` would URL-escape in dir names). */
  def tileKey(lat: Column, lon: Column, zoom: Int,
              sep: String = "/"): Column = {
    require(zoom >= 0 && zoom <= 16, s"zoom out of range: $zoom")
    val n = 1L << zoom
    val x = least(lit(n - 1), greatest(lit(0L),
      floor((lon + lit(180.0)) / lit(360.0) * lit(n.toDouble))))
    val y = least(lit(n - 1), greatest(lit(0L),
      floor((lit(90.0) - lat) / lit(180.0) * lit(n.toDouble))))
    concat_ws(sep, lit(zoom.toString), x.cast("string"),
      y.cast("string"))
  }

  /** The tile keys a lat/lon box overlaps at `zoom` — driver-side
    * arithmetic on four constants (never data), used to turn a
    * spatial predicate into a partition-column IN-list so the staged
    * tile layout prunes at planning time. */
  def tilesCovering(top: Double, left: Double, bottom: Double,
                    right: Double, zoom: Int): Seq[String] = {
    val n = 1L << zoom
    def clamp(v: Long) = math.min(n - 1, math.max(0L, v))
    val x0 = clamp(math.floor((left + 180.0) / 360.0 * n).toLong)
    val x1 = clamp(math.floor((right + 180.0) / 360.0 * n).toLong)
    val y0 = clamp(math.floor((90.0 - top) / 180.0 * n).toLong)
    val y1 = clamp(math.floor((90.0 - bottom) / 180.0 * n).toLong)
    for (x <- x0 to x1; y <- y0 to y1)
      yield s"$zoom/$x/$y"
  }

  /** ES `geo_bounding_box` (filter context): points inside the box,
    * edges inclusive (ES's rule). Two range predicates — they push
    * into the parquet scan (footer min/max pruning), and when `df`
    * reads the tile-partitioned staging and carries its `pt` column,
    * [[tilesCovering]]'s IN-list prunes directories first. */
  def boundingBox(df: DataFrame, top: Double, left: Double,
                  bottom: Double, right: Double): DataFrame = {
    require(top >= bottom, s"box inverted: top=$top bottom=$bottom")
    require(right >= left,
      s"dateline-crossing boxes unsupported: left=$left right=$right")
    df.filter(col("lat") <= lit(top) && col("lat") >= lit(bottom) &&
      col("lon") >= lit(left) && col("lon") <= lit(right))
  }

  /** ES `distance_type: plane` distance in meters from a fixed
    * origin: `MetersPerDegree · sqrt(dlat² + dlon²)`. IEEE-exact
    * pipeline (see object doc) — bit-stable cross-engine. */
  def planeDistanceM(olat: Double, olon: Double): Column = {
    val dlat = col("lat") - lit(olat)
    val dlon = col("lon") - lit(olon)
    lit(MetersPerDegree) * sqrt(dlat * dlat + dlon * dlon)
  }

  /** ES `geo_distance` query + `sort: _geo_distance`: live points
    * within `radiusM` of the origin, nearest first (`idCol` the
    * tiebreaker), top-k.
    *
    * Two-phase like Lucene: the radius converts to its bounding box
    * (driver arithmetic on constants) whose range predicates push
    * down / prune tiles; survivors run the exact ring check as a
    * SQUARED-degree comparison (no sqrt in the filter — one less
    * rounding site), and only reported rows compute the distance
    * column. The top-k is a TakeOrderedAndProject, never a full
    * sort. Output: (idCol, lat, lon, distance_m). */
  def distanceSearch(df: DataFrame, idCol: String, olat: Double,
                     olon: Double, radiusM: Double, k: Int)
      : DataFrame = {
    require(radiusM > 0, s"radius must be positive: $radiusM")
    val rDeg = radiusM / MetersPerDegree
    val boxed = boundingBox(df, olat + rDeg, olon - rDeg,
      olat - rDeg, olon + rDeg)
    val dlat = col("lat") - lit(olat)
    val dlon = col("lon") - lit(olon)
    boxed
      .filter(dlat * dlat + dlon * dlon <= lit(rDeg * rDeg))
      .withColumn("distance_m", planeDistanceM(olat, olon))
      .select(col(idCol), col("lat"), col("lon"), col("distance_m"))
      .orderBy(asc("distance_m"), asc(idCol))
      .limit(k)
  }

  /** ES `geo_distance` AGGREGATION: ring buckets around an origin —
    * `edges` are the boundary radii in meters; ring i spans
    * [edges(i-1), edges(i)) (from inclusive, to exclusive — ES's
    * range rule), ring 0 spans [0, edges(0)), and points at or beyond
    * the last edge fall out (ES only emits requested ranges). Every
    * requested ring appears in the output, empty ones with
    * doc_count 0 (ES emits all ranges). The outermost edge's bounding
    * box pre-filters (pushdown / tile pruning); ring assignment
    * compares SQUARED degree distances against squared edge radii —
    * zero transcendentals, zero sqrt. Output: (ring, from_m, to_m,
    * doc_count), ring-ascending. */
  def distanceRings(df: DataFrame, olat: Double, olon: Double,
                    edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted &&
      edges.head > 0, s"edges must be ascending positive: $edges")
    val spark = df.sparkSession
    val rMax = edges.last / MetersPerDegree
    val boxed = boundingBox(df, olat + rMax, olon - rMax,
      olat - rMax, olon + rMax)
    val dlat = col("lat") - lit(olat)
    val dlon = col("lon") - lit(olon)
    val d2 = dlat * dlat + dlon * dlon
    // ring = index of the first edge strictly above the distance;
    // built as a fixed-order CASE chain so assignment is exact
    val ring = edges.zipWithIndex.foldRight(lit(-1)) {
      case ((edge, i), tail) =>
        val e = edge / MetersPerDegree
        when(d2 < lit(e * e), lit(i)).otherwise(tail)
    }
    val counts = boxed.withColumn("ring", ring)
      .filter(col("ring") >= 0)
      .groupBy("ring").agg(count(lit(1)).as("doc_count"))
    val rings = spark.createDataFrame(
      edges.zipWithIndex.map { case (edge, i) =>
        (i, if (i == 0) 0.0 else edges(i - 1), edge)
      }).toDF("ring", "from_m", "to_m")
    broadcast(rings).join(counts, Seq("ring"), "left")
      .na.fill(0L, Seq("doc_count"))
      .orderBy("ring")
  }

  /** The real geohash cell key at `precision` (1–7 chars) — ES's
    * `geohash_grid` bucket key. Geohash is interval bisection, which
    * closed-forms to pure integer arithmetic: quantize lon to
    * ceil(5p/2) bits and lat to floor(5p/2) bits, bit-interleave
    * MSB-first starting with lon (the geohash convention), emit
    * 5-bit groups through the base-32 alphabet. Every step is floor/
    * shift/modulo on exact integers — no libm, bit-stable, and the
    * oracle replays the identical expression. */
  def geohashKey(lat: Column, lon: Column, precision: Int): Column = {
    require(precision >= 1 && precision <= 7,
      s"precision out of range: $precision")
    val bits = precision * 5
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    val x = least(lit((1L << lonBits) - 1), greatest(lit(0L),
      floor((lon + lit(180.0)) / lit(360.0) *
        lit((1L << lonBits).toDouble))))
    val y = least(lit((1L << latBits) - 1), greatest(lit(0L),
      floor((lat + lit(90.0)) / lit(180.0) *
        lit((1L << latBits).toDouble))))
    val interleaved = (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      val (src, bitIdx) =
        if (j % 2 == 0) (x, lonBits - 1 - j / 2)
        else (y, latBits - 1 - (j - 1) / 2)
      acc + (shiftright(src, bitIdx) % lit(2L)) *
        lit(1L << (bits - 1 - j))
    }
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    val chars = array(alphabet.map(c => lit(c.toString)): _*)
    concat((0 until precision).map { i =>
      element_at(chars,
        ((shiftright(interleaved, bits - 5 * (i + 1)) % lit(32L))
          .cast("int") + lit(1)))
    }: _*)
  }

  /** ES `geohash_grid` aggregation: points bucket by [[geohashKey]],
    * top-k cells by (doc_count desc, key). Same one-pass hash
    * aggregation shape as [[tileGrid]]. Output: (geohash,
    * doc_count). */
  def geohashGrid(df: DataFrame, precision: Int, k: Int): DataFrame =
    df.withColumn("geohash",
        geohashKey(col("lat"), col("lon"), precision))
      .groupBy("geohash").agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), asc("geohash"))
      .limit(k)

  /** Point-in-polygon — ES's `geo_polygon` query (the `geo_shape`
    * polygon filter for point fields): PNPOLY ray casting, the
    * crossing-parity fold over the polygon's edges. Every edge term
    * is comparisons plus one multiply and one divide of IEEE doubles
    * in a fixed order, so containment is bit-deterministic and the
    * oracle unrolls the identical expression; points exactly ON an
    * edge resolve by the algorithm's documented >-vs-≥ asymmetry —
    * consistently, both engines computing the same arithmetic.
    * `vertices` are (lat, lon) pairs, ≥ 3, no closing repeat. */
  def polygonContains(vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3,
      s"polygon needs >= 3 vertices: ${vertices.size}")
    val edges = vertices.zip(
      vertices.tail :+ vertices.head)
    edges.map { case ((yi, xi), (yj, xj)) =>
      ((lit(yi) > col("lat")) =!= (lit(yj) > col("lat"))) &&
        (col("lon") < (lit(xj) - lit(xi)) *
          (col("lat") - lit(yi)) / (lit(yj) - lit(yi)) + lit(xi))
    }.reduce(_ =!= _)
  }

  /** ES `geo_polygon` query: live points inside the polygon,
    * id-ordered first k. The polygon's bounding box (driver
    * arithmetic over the vertex constants) pre-filters exactly like
    * [[distanceSearch]]'s radius box — tile pruning + footer
    * pushdown — and the parity fold runs codegen'd on survivors.
    * Output: (idCol, lat, lon). */
  def polygonSearch(df: DataFrame, idCol: String,
                    vertices: Seq[(Double, Double)], k: Int)
      : DataFrame = {
    val lats = vertices.map(_._1); val lons = vertices.map(_._2)
    boundingBox(df, lats.max, lons.min, lats.min, lons.max)
      .filter(polygonContains(vertices))
      .select(col(idCol), col("lat"), col("lon"))
      .orderBy(asc(idCol))
      .limit(k)
  }

  /** ES `geo_bounds` aggregation: the tightest box around the
    * points — top_left = (max lat, min lon), bottom_right =
    * (min lat, max lon), ES's corner convention. Min/max of doubles
    * are exact (no arithmetic), one reduce. Output: (top, left,
    * bottom, right, n_points), 1 row. */
  def bounds(df: DataFrame): DataFrame =
    df.filter(col("lat").isNotNull && col("lon").isNotNull)
      .agg(max("lat").as("top"), min("lon").as("left"),
        min("lat").as("bottom"), max("lon").as("right"),
        count(lit(1)).as("n_points"))

  /** ES `geo_centroid` aggregation: the coordinate mean. ES
    * accumulates doubles (order-dependent); here the coordinates
    * quantize to their lattice (`scale` — the synthetic fixture is a
    * 0.01° lattice, scale 100), sum EXACTLY as longs in
    * DECIMAL(38,0), and the mean is one double division per axis —
    * bit-stable cross-engine and shuffle-invariant
    * ([[graft.operators.StatsOps]]' determinism scheme on the geo
    * axis). Output: (lat, lon, n_points), 1 row. */
  def centroid(df: DataFrame, scale: Long = 100L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    val dec = "decimal(38,0)"
    df.filter(col("lat").isNotNull && col("lon").isNotNull)
      .select(
        round(col("lat") * lit(scale.toDouble)).cast("long").as("qla"),
        round(col("lon") * lit(scale.toDouble)).cast("long").as("qlo"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("qla").cast(dec)).as("sla"),
        sum(col("qlo").cast(dec)).as("slo"))
      .select(
        ((col("sla").cast("double") / col("n").cast("double")) /
          lit(scale.toDouble)).as("lat"),
        ((col("slo").cast("double") / col("n").cast("double")) /
          lit(scale.toDouble)).as("lon"),
        col("n").cast("long").as("n_points"))
  }

  /** ES `geotile_grid` aggregation (equirectangular row — object
    * doc): points bucket by [[tileKey]] at `zoom`, top-k cells by
    * (doc_count desc, key) — ES's ordering. One hash aggregation;
    * at 100 TB the staged tile layout makes this a per-directory
    * metadata count for full-extent requests, and a pruned scan
    * when combined with a [[boundingBox]] filter. Output:
    * (tile, doc_count). */
  def tileGrid(df: DataFrame, zoom: Int, k: Int): DataFrame =
    df.withColumn("tile", tileKey(col("lat"), col("lon"), zoom))
      .groupBy("tile").agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), asc("tile"))
      .limit(k)
}
