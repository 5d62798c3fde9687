package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong, s"v$i")).toDF("k", "payload")
    val right = Seq((1L, "hot"), (950L, "cold"), (2000L, "unmatched"))
      .toDF("rk", "attr")
    val plain = left.join(right, left("k") === right("rk"))
      .select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", salts = 8)
      .select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 901)
  }

  test("AQE splits a skewed join partition at runtime (the no-salt path)") {
    // The modern default for skew: leave the query declarative and let
    // adaptive execution split oversized partitions. Thresholds are
    // lowered so the fixture-sized skew actually trips the optimization;
    // production keeps the defaults and the same plan shape.
    val conf = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (1 to 60000).map(i =>
        (if (i <= 54000) 1L else (i % 1999L) + 2L, s"payload-$i-${"x" * 40}"))
        .toDF("k", "payload")
      val right = (1 to 2000).map(i => (i.toLong, s"attr$i")).toDF("rk", "attr")
      val joined = left.join(right, left("k") === right("rk"))
      // collect THIS frame so its adaptive plan is finalized (count()
      // would plan a separate query execution)
      assert(joined.collect().length == 60000) // every left row matches once
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed side:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt spreads the hot key across sub-partitions deterministically") {
    val left = (1 to 400).map(i => (1L, s"p$i")).toDF("k", "payload")
    val salted1 = SkewJoin.saltedJoin(left,
      Seq((1L, "x")).toDF("rk", "a"), "k", "rk", salts = 8)
    val salted2 = SkewJoin.saltedJoin(left,
      Seq((1L, "x")).toDF("rk", "a"), "k", "rk", salts = 8)
    assert(salted1.count() == 400)
    // determinism: same content → same result either run
    assert(salted1.select("payload").as[String].collect().sorted.toSeq ==
      salted2.select("payload").as[String].collect().sorted.toSeq)
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks tf-heavy docs first and saturates with k1") {
    val docs = Seq(
      (1L, "spark spark spark spark engine"),
      (2L, "spark engine"),
      (3L, "other words entirely here"))
      .toDF("doc_id", "text")
    val hits = Search.bm25(docs, Seq("spark"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(hits(1L) > hits(2L))
    assert(!hits.contains(3L))
    // saturation: quadrupled tf must NOT quadruple the score
    assert(hits(1L) < 4 * hits(2L))
  }

  test("bm25 rare terms outweigh common ones (idf)") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common alpha"), (3L, "common beta"),
      (4L, "common gamma"))
      .toDF("doc_id", "text")
    val hits = Search.bm25(docs, Seq("common", "rare"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(hits(1L) > hits(2L)) // doc 1 has the rare term
  }
}
