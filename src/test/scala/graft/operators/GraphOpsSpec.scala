package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonical(pairs: Seq[(Long, Long)]) =
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("src", "dst")

  test("triangleStats: 4-clique plus pendant, known counts") {
    // {1,2,3,4} complete + pendant 5-1
    val edges = canonical(Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L)))
    val rows = GraphOps.triangleStats(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // vertex 1: degree 4, in all 3 triangles that contain it, cc = 6/12
    assert(rows(1L) == ((4L, 3L, 0.5)))
    // clique-only vertices: degree 3, 3 triangles, cc = 1.0
    Seq(2L, 3L, 4L).foreach(v => assert(rows(v) == ((3L, 3L, 1.0)), s"v=$v"))
    // pendant: degree 1, no triangles, cc = 0 by convention
    assert(rows(5L) == ((1L, 0L, 0.0)))
    // Σ per-vertex = 3 × total triangles (4 in the clique)
    assert(rows.values.map(_._2).sum == 3L * 4L)
  }

  test("triangleStats: counts invariant under vertex relabeling") {
    // id-reversal flips every (degree, id) tie-break the orientation
    // uses — triangle counts must not care
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L))
    val a = GraphOps.triangleStats(canonical(base))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val b = GraphOps.triangleStats(canonical(base.map {
        case (x, y) => (100L - x, 100L - y) }))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (100L - r._1) -> ((r._2, r._3))).toMap
    assert(a == b)
  }

  test("triangleStats agrees with a naive O(n^3) count on random graphs") {
    // scalacheck driven directly with fixed seeds (the scalatest bridge
    // is not in the offline cache) — same pattern as PropertySpec
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val pairGen = for {
      n <- Gen.choose(4, 9)
      pairs <- Gen.listOf(Gen.zip(Gen.choose(1L, n.toLong),
        Gen.choose(1L, n.toLong)))
    } yield pairs.filter(p => p._1 != p._2)
    (0 until 8).foreach { i =>
      val pairs = pairGen.pureApply(Gen.Parameters.default, Seed(7L + i))
      if (pairs.nonEmpty) {
        val es = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct
        val vs = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val eset = es.toSet
        def adjacent(a: Long, b: Long) =
          eset((math.min(a, b), math.max(a, b)))
        val naive = vs.map { v =>
          val nbrs = vs.filter(u => u != v && adjacent(v, u))
          v -> nbrs.combinations(2)
            .count { case Seq(a, b) => adjacent(a, b); case _ => false }
            .toLong
        }.toMap
        val got = GraphOps.triangleStats(es.toDF("src", "dst"))
          .as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> r._3).toMap
        assert(got == naive, s"seed ${7L + i}: got $got expected $naive")
      }
    }
  }

  test("pageRank: a directed cycle is an exact fixed point") {
    // outdeg 1 everywhere: contribution = rank exactly, and
    // 150000 + floor(85 * 1000000 / 100) = 1000000 — no floor loss
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(ranks == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: two-node chain, hand-computed trajectory") {
    // 1→2 only. it1: r=(150000, 1000000); it2 onward r2 =
    // 150000 + floor(.85*150000) = 277500 and stays (source pins at
    // the teleport mass, sink one damping step behind)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    def at(n: Int) = GraphOps.pageRank(edges, n)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(at(1) == Map(1L -> 150000L, 2L -> 1000000L))
    assert(at(2) == Map(1L -> 150000L, 2L -> 277500L))
    assert(at(3) == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("pageRank: floor division is exact-integer, not rounded") {
    // star 1→{2,3,4}: contribution = floor(1000000/3) = 333333 (not
    // 333333.33 rounded to 333334), then leaf rank =
    // 150000 + floor(85 * 333333 / 100) = 433333 (floor, not 433334)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, 1)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(ranks == Map(1L -> 150000L, 2L -> 433333L, 3L -> 433333L,
      4L -> 433333L))
  }

  test("pageRank: mass never grows, and rank is relabel-invariant") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L),
      (2L, 4L), (4L, 1L))
    val a = GraphOps.pageRank(base.toDF("src", "dst"), 4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(a.values.sum <= 4L * 1000000L)
    val b = GraphOps.pageRank(base.map { case (x, y) => (50L - x, 50L - y) }
        .toDF("src", "dst"), 4)
      .as[(Long, Long, Double)].collect()
      .map(r => (50L - r._1) -> r._2).toMap
    assert(a == b)
  }

  test("triangleStats: triangle-free graph yields all zeros") {
    // a path and a star — bipartite-ish, no triangles
    val edges = canonical(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L)))
    val rows = GraphOps.triangleStats(edges)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.forall(_._3 == 0L), rows.mkString(","))
    assert(rows.forall(_._4 == 0.0))
  }
}
