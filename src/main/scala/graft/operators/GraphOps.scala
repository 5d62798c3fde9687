package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames.
  *
  * Extension beyond the reference surface (SURVEY §2 additions): the
  * near-dup pair sets ([[Dedup]]) and co-occurrence joins produce
  * graphs, and corpus curation asks graph questions of them — how
  * clustered is the duplicate graph, which items co-occur in tight
  * communities. Connected components live in [[Dedup.dupClusters]];
  * this hosts the counting-style primitives.
  */
object GraphOps {

  /** Per-vertex triangle count, degree, and local clustering
    * coefficient for an undirected graph given as canonical edges
    * `(src, dst)` with `src < dst`, distinct.
    *
    * Algorithm: the "forward" oriented-edge count. Orient every edge
    * toward the endpoint with the LARGER (degree, id) — a total order —
    * and count each triangle exactly once as a path x→y→z closed by
    * x→z. The orientation is the 100 TB load-bearing choice: out-degree
    * under it is bounded by O(√m) regardless of skew, so the wedge join
    * (the only quadratic-risk step) produces O(m^1.5) rows worst-case
    * instead of Σ deg² — a hub vertex of degree 10⁶ contributes zero
    * wedges from its in-edges rather than 10¹² pairs. Both joins are
    * equi-joins on vertex ids (hash-partitioned, AQE-skew-splittable);
    * nothing is ever collected.
    *
    * Local clustering = 2·T(v) / (deg(v)·(deg(v)−1)) — one IEEE double
    * division of exactly-representable integers, so results are
    * bitwise reproducible across engines.
    */
  def triangleStats(undirected: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = undirected.select(col("src"), col("dst")).persist(lvl)
    val deg = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist(lvl)
    // Materialize deg BEFORE its three consumers (orientation ×2 +
    // final join): concurrent first-fill serializes tasks on per-block
    // cache locks (same pattern as simhashNearDups).
    deg.count()
    // src < dst canonically, so orientation only decides keep-or-flip
    val keep = col("ds") < col("dd") ||
      (col("ds") === col("dd") && col("src") < col("dst"))
    val oriented = e
      .join(deg.select(col("v").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("deg").as("dd")), "dst")
      .select(when(keep, col("src")).otherwise(col("dst")).as("u"),
        when(keep, col("dst")).otherwise(col("src")).as("w"))
      .persist(lvl)
    // oriented feeds three self-join consumers — eager fill, then the
    // edge frame is no longer needed by anything downstream
    oriented.count()
    e.unpersist()
    // deg + oriented stay cached for the returned LAZY frame (the
    // caller's clearCache() releases them — unpersisting here would
    // silently recompute the whole pipeline at the caller's action)
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.w") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.w").as("y"), col("e2.w").as("z"))
      .join(oriented.as("e3"),
        col("x") === col("e3.u") && col("z") === col("e3.w"),
        "left_semi")
    val perV = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.join(perV, Seq("v"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("v").as("node_id"), col("deg").as("degree"),
        col("n_triangles"),
        when(col("deg") >= 2,
          (col("n_triangles") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Bounded-iteration PageRank over a DIRECTED edge list `(src, dst)`
    * in fixed-point integer arithmetic, so the result is bitwise
    * identical on any engine and any partitioning.
    *
    * Floating-point PageRank sums contributions in a
    * partition-dependent order, so no two runs (let alone two engines)
    * agree bitwise. Here rank is an integer in units of 1e-6
    * (`Scale`), and the two inexact steps are explicit floor
    * divisions computed as `(a - a % b) / b` — the numerator is made
    * exactly divisible first, so the IEEE division is exact and the
    * BIGINT cast is engine-independent (DuckDB rounds double→BIGINT,
    * Spark truncates; on exact integers they agree):
    *
    *   r₀(v)   = Scale
    *   rₜ₊₁(v) = (1−d)·Scale + d · Σ_{u→v} floor(rₜ(u) / outdeg(u))
    *   with d = 85/100 applied as floor(85·Σ / 100).
    *
    * Magnitudes: total mass never grows (floors only lose), so every
    * intermediate is ≤ 85 · n · Scale — exact in a double (< 2^53) up
    * to ~10^8 vertices and in a BIGINT far beyond. Dangling vertices
    * (no out-edges) leak their mass, the standard simplification; the
    * symmetrized graphs we feed it have none.
    *
    * Scale shape: one hash-partitioned join + agg per iteration over
    * the cached edge/degree frames. Unlike [[Dedup.dupClusters]] the
    * rounds need no per-round materialization: each round's plan
    * references the previous round exactly ONCE (no self-join), so
    * the logical tree grows linearly and the whole bounded recursion
    * evaluates in a single action — per-round persist+count would only
    * add a scheduling-floor cost per iteration (measured ~1.2 s/round
    * at local[32] on a 400k-edge graph, dominated by stage scheduling,
    * not compute). For large iteration counts the loop still
    * materializes and rebases lineage every [[PageRankCheckpoint]]
    * rounds to bound plan depth. Nothing is collected; the iteration
    * count is a caller-fixed bound, not a data-dependent convergence
    * test. The returned frame is lazy and reads the persisted
    * edge/vertex caches — the caller's `clearCache()` releases them.
    */
  /** Materialize-and-rebase interval for [[pageRank]]'s lazy rounds. */
  val PageRankCheckpoint = 8

  def pageRank(directed: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    val Scale = 1000000L
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def floorDiv(a: Column, b: Column): Column =
      ((a - a % b) / b).cast("long")
    val spark = directed.sparkSession
    val e = directed.select(col("src"), col("dst")).persist(lvl)
    // ONE aggregation yields both the vertex set and out-degrees: src
    // rows carry weight 1, dst rows 0, so every vertex gets a row and
    // `d` is the out-degree (two separate distinct/count aggs would
    // pay a second shuffle + cache fill for the same information)
    val vd = e.select(col("src").as("v"), lit(1L).as("o"))
      .union(e.select(col("dst").as("v"), lit(0L).as("o")))
      .groupBy("v").agg(sum(col("o")).as("d")).persist(lvl)
    // eager fill (also fills e): feeds every iteration; concurrent
    // first fill would serialize tasks on per-block cache locks
    vd.count()
    val verts = vd.select("v")
    val outdeg = vd.filter(col("d") > 0)
      .select(col("v").as("src"), col("d"))
    var r = verts.select(col("v"), lit(Scale).as("r"))
    for (it <- 1 to iterations) {
      val msgs = e
        .join(r.withColumnRenamed("v", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("v"), floorDiv(col("r"), col("d")).as("c"))
        .groupBy("v").agg(sum(col("c")).as("m"))
      r = verts.join(msgs, Seq("v"), "left")
        .select(col("v"),
          (lit((Scale * 15L - Scale * 15L % 100L) / 100L) +
            floorDiv(lit(85L) * coalesce(col("m"), lit(0L)), lit(100L)))
            .as("r"))
      // bound plan depth for long runs: materialize + rebase lineage
      // every few rounds (a plain persist would keep the deep plan)
      if (it % PageRankCheckpoint == 0 && it < iterations) {
        val snap = r.persist(lvl)
        snap.count()
        r = spark.createDataFrame(snap.rdd, snap.schema)
      }
    }
    r.select(col("v").as("node_id"), col("r").as("rank_fp"),
      (col("r").cast("double") / Scale.toDouble).as("rank"))
  }
}
