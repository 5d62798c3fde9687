package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeoOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq(
    (1L, 0.0, 0.0),
    (2L, 10.0, 10.0),
    (3L, -10.0, -10.0),
    (4L, 30.0, -40.0),    // box corner — inclusive edge
    (5L, 30.01, -40.0),   // just above the top edge
    (6L, 84.99, 179.99),  // lattice extremes
    (7L, -85.0, -180.0))
    .toDF("id", "lat", "lon")

  test("withSyntheticGeo is the documented lattice") {
    val g = GeoOps.withSyntheticGeo(Seq(1L, 100L, 9999L).toDF("k"), "k")
      .select("k", "lat", "lon").as[(Long, Double, Double)]
      .collect().map { case (k, la, lo) => k -> ((la, lo)) }.toMap
    assert(g(1L) == ((1 * 37 % 17000) / 100.0 - 85.0,
      (1 * 73 % 36000) / 100.0 - 180.0))
    assert(g(9999L) == ((9999L * 37 % 17000) / 100.0 - 85.0,
      (9999L * 73 % 36000) / 100.0 - 180.0))
    // range contract
    val all = GeoOps.withSyntheticGeo(
      spark.range(1, 5000).toDF("k"), "k")
    assert(all.filter(col("lat") < -85.0 || col("lat") >= 85.0 ||
      col("lon") < -180.0 || col("lon") >= 180.0).count() == 0)
  }

  test("boundingBox keeps inclusive edges and drops outside points") {
    val in = GeoOps.boundingBox(pts, 30.0, -40.0, -10.0, 20.0)
      .select("id").as[Long].collect().toSet
    assert(in == Set(1L, 2L, 3L, 4L))
  }

  test("tileKey clamps the poles/antimeridian into the last tile") {
    val t = Seq((90.0, 180.0), (-90.0, -180.0), (0.0, 0.0))
      .toDF("lat", "lon")
      .select(GeoOps.tileKey(col("lat"), col("lon"), 2).as("t"))
      .as[String].collect().toSeq
    assert(t == Seq("2/3/0", "2/0/3", "2/2/2"))
  }

  test("tilesCovering contains every box point's tile (prune-safety)") {
    val zoom = 3
    val (top, left, bottom, right) = (42.0, -77.0, -3.5, 61.0)
    val covering = GeoOps.tilesCovering(top, left, bottom, right, zoom)
      .toSet
    val tiles = GeoOps.boundingBox(
        GeoOps.withSyntheticGeo(spark.range(1, 3000).toDF("k"), "k"),
        top, left, bottom, right)
      .select(GeoOps.tileKey(col("lat"), col("lon"), zoom).as("t"))
      .as[String].collect().toSet
    assert(tiles.nonEmpty && tiles.subsetOf(covering),
      s"missing: ${tiles -- covering}")
  }

  test("distanceSearch equals the brute-force ring, nearest first") {
    val g = GeoOps.withSyntheticGeo(spark.range(1, 2000).toDF("k"), "k")
    val two = GeoOps.distanceSearch(g, "k", 10.0, 20.0,
      radiusM = 1500000.0, k = 15)
      .select("k", "distance_m").as[(Long, Double)].collect().toSeq
    // brute force: exact plane distance on every point, no prefilter
    val rDeg = 1500000.0 / GeoOps.MetersPerDegree
    val brute = g
      .withColumn("d2", (col("lat") - lit(10.0)) * (col("lat") - lit(10.0))
        + (col("lon") - lit(20.0)) * (col("lon") - lit(20.0)))
      .filter(col("d2") <= lit(rDeg * rDeg))
      .withColumn("distance_m", lit(GeoOps.MetersPerDegree) * sqrt(col("d2")))
      .orderBy(asc("distance_m"), asc("k"))
      .limit(15).select("k", "distance_m")
      .as[(Long, Double)].collect().toSeq
    assert(two == brute)
    assert(two.map(_._2) == two.map(_._2).sorted)
  }

  test("distanceRings emits every requested ring, empty ones at zero") {
    val g = Seq((1L, 0.0, 0.0), (2L, 0.0, 1.0), (3L, 0.0, 50.0))
      .toDF("id", "lat", "lon")
    // edges at ~1.1°, ~2.2°, ~3.3°: point 3 (50° away) falls out,
    // ring 1 and 2 are empty, ring 0 holds points 1 and 2
    val edges = Seq(125000.0, 250000.0, 375000.0)
    val out = GeoOps.distanceRings(g, 0.0, 0.0, edges)
      .select("ring", "from_m", "to_m", "doc_count")
      .as[(Int, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0, 0.0, 125000.0, 2L),
      (1, 125000.0, 250000.0, 0L),
      (2, 250000.0, 375000.0, 0L)))
  }

  test("distanceRings boundary: a point exactly at an edge goes to " +
    "the NEXT ring (from inclusive, to exclusive)") {
    // place a point exactly one edge-radius east of the origin
    val eDeg = 111195.0 / GeoOps.MetersPerDegree // = 1.0 degree
    val g = Seq((1L, 0.0, eDeg)).toDF("id", "lat", "lon")
    val out = GeoOps.distanceRings(g, 0.0, 0.0,
      Seq(111195.0, 222390.0))
      .select("ring", "doc_count").as[(Int, Long)].collect().toMap
    assert(out == Map(0 -> 0L, 1 -> 1L))
  }

  test("tileGrid counts by cell, top-k by (count desc, key)") {
    val g = Seq(
      (1L, 1.0, 1.0), (2L, 2.0, 2.0),   // same zoom-2 tile (2/2/1)
      (3L, 50.0, -100.0))               // 2/0/0
      .toDF("id", "lat", "lon")
    val out = GeoOps.tileGrid(g, 2, 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("2/2/1", 2L), ("2/0/0", 1L)))
  }

  test("bounds: ES corner convention; centroid: exact lattice mean") {
    val g = Seq((1L, 10.0, -20.0), (2L, 30.0, 40.0), (3L, -5.0, 0.0))
      .toDF("id", "lat", "lon")
    val b = GeoOps.bounds(g).collect().head
    assert((b.getDouble(0), b.getDouble(1), b.getDouble(2),
      b.getDouble(3), b.getLong(4)) == ((30.0, -20.0, -5.0, 40.0, 3L)))
    val c = GeoOps.centroid(g).collect().head
    // lattice sums: (1000+3000-500)/3/100, (-2000+4000+0)/3/100
    assert(c.getDouble(0) == (3500.0 / 3.0) / 100.0)
    assert(c.getDouble(1) == (2000.0 / 3.0) / 100.0)
    assert(c.getLong(2) == 3L)
  }

  test("polygonSearch: ray-cast containment on known points; the " +
    "bbox prefilter is lossless") {
    // a diamond centered at (0, 0) with radius 10 degrees
    val diamond = Seq((10.0, 0.0), (0.0, 10.0), (-10.0, 0.0),
      (0.0, -10.0))
    val pts = Seq(
      (1L, 0.0, 0.0),    // center: in
      (2L, 4.0, 4.0),    // inside (|lat|+|lon| = 8 < 10)
      (3L, 6.0, 6.0),    // outside (12 > 10)
      (4L, 9.99, 0.0),   // just inside the top vertex
      (5L, 10.01, 0.0),  // just above
      (6L, -3.0, -6.0))  // inside
      .toDF("id", "lat", "lon")
    val in = GeoOps.polygonSearch(pts, "id", diamond, 10)
      .select("id").as[Long].collect().toSeq
    assert(in == Seq(1L, 2L, 4L, 6L))
    // prefilter losslessness: parity alone agrees on every point
    val parity = pts.filter(GeoOps.polygonContains(diamond))
      .select("id").as[Long].collect().toSeq.sorted
    assert(parity == in)
  }

  test("geohashKey matches the published geohash of a known point") {
    // geohash.org: (57.64911, 10.40744) → "u4pruyd..."
    val g = Seq((57.64911, 10.40744)).toDF("lat", "lon")
    val h5 = g.select(GeoOps.geohashKey(col("lat"), col("lon"), 5))
      .as[String].collect().head
    assert(h5 == "u4pru", h5)
    val h7 = g.select(GeoOps.geohashKey(col("lat"), col("lon"), 7))
      .as[String].collect().head
    assert(h7 == "u4pruyd", h7)
  }

  test("geohashGrid buckets and orders like the tile grid") {
    val g = Seq(
      (1L, 57.64911, 10.40744), (2L, 57.649, 10.407),  // same cell
      (3L, -33.9, 18.4))
      .toDF("id", "lat", "lon")
    val out = GeoOps.geohashGrid(g, 4, 10)
      .as[(String, Long)].collect().toSeq
    assert(out.head == (("u4pr", 2L)) && out.size == 2)
  }

  test("bounding-box predicates push into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("geo_push")
      .toFile.getPath
    GeoOps.withSyntheticGeo(spark.range(1, 500).toDF("k"), "k")
      .write.mode("overwrite").parquet(dir)
    val plan = GeoOps.boundingBox(spark.read.parquet(dir),
      30.0, -40.0, -10.0, 20.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThanOrEqual(lat,30.0)"), plan.take(1200))
  }

  test("a tile IN-list prunes the staged partition layout at planning") {
    val dir = java.nio.file.Files.createTempDirectory("geo_part")
      .toFile.getPath
    GeoOps.withSyntheticGeo(spark.range(1, 500).toDF("k"), "k")
      .withColumn("pt", GeoOps.tileKey(col("lat"), col("lon"), 2, "_"))
      .write.mode("overwrite").partitionBy("pt").parquet(dir)
    val tiles = GeoOps.tilesCovering(30.0, -40.0, -10.0, 20.0, 2)
      .map(_.replace('/', '_'))
    val q = spark.read.parquet(dir)
      .filter(col("pt").isin(tiles: _*))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [pt"), plan.take(1200))
    // and the pruned read still contains the whole box
    val boxed = GeoOps.boundingBox(q, 30.0, -40.0, -10.0, 20.0).count()
    val full = GeoOps.boundingBox(spark.read.parquet(dir),
      30.0, -40.0, -10.0, 20.0).count()
    assert(boxed == full && full > 0)
  }
}
