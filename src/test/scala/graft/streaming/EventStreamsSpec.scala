package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60L * 1000L)

  private def runToMemory[T](q: org.apache.spark.sql.Dataset[T],
                             name: String, mode: OutputMode)(
      feed: => Unit): Unit = {
    val query = q.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation",
        Files.createTempDirectory(s"ck-$name").toString)
      .start()
    feed
    query.processAllAvailable()
    query.stop()
  }

  test("windowedCounts: watermark closes windows, append emits once") {
    val in = MemoryStream[Event](spark)
    val out = EventStreams.windowedCounts(
      in.toDF(), window_ = "10 minutes", watermark = "5 minutes")
    runToMemory(out, "wc", OutputMode.Append) {
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(4), 10, "click", 2.0),
        Event(3, ts(11), 11, "view", 5.0))
      // advance event time far enough to close the first two windows
      in.addData(Event(9, ts(60), 12, "click", 0.5))
    }
    val rows = spark.table("wc")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().sortBy(_._1.getTime)
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(10), "view", 1L, 5.0)))
  }

  test("dedupedEvents drops duplicate event_ids within the watermark") {
    val in = MemoryStream[Event](spark)
    val out = EventStreams.dedupedEvents(in.toDF(), watermark = "10 minutes")
    runToMemory(out.select("event_id"), "dd", OutputMode.Append) {
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(1, ts(1), 10, "click", 1.0), // exact dup, same batch
        Event(2, ts(2), 10, "click", 2.0))
      in.addData(Event(1, ts(3), 10, "click", 1.0)) // dup, later batch
      in.addData(Event(3, ts(4), 11, "view", 3.0))
    }
    val ids = spark.table("dd").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("sessionize closes a session after the event-time gap") {
    val in = MemoryStream[Event](spark)
    val out = EventStreams.sessionize(in.toDS(), gapMinutes = 10,
      watermark = "0 minutes")
    runToMemory(out, "sess", OutputMode.Append) {
      in.addData(
        Event(1, ts(1), 42, "click", 1.0),
        Event(2, ts(5), 42, "click", 2.0)) // same session (gap 4 < 10)
      in.addData(Event(3, ts(30), 42, "view", 4.0)) // 25 min gap → new session
      in.addData(Event(4, ts(120), 99, "click", 0.0)) // push watermark on
    }
    val sessions = spark.table("sess").as[Session].collect()
      .sortBy(_.started.getTime)
    assert(sessions.length >= 1)
    val first = sessions.head
    assert(first.user_id == 42L && first.n_events == 2 &&
      first.total_value == 3.0 &&
      first.started == ts(1) && first.ended == ts(5))
  }

  test("nearDupCandidates: dup arriving in a later batch pairs with the resident") {
    val in = MemoryStream[StreamDoc](spark)
    val out = EventStreams.nearDupCandidates(in.toDS())
    runToMemory(out, "ndc", OutputMode.Append) {
      in.addData(
        StreamDoc(1L, "the quick brown fox jumps over the lazy dog"),
        StreamDoc(4L, "completely different words about spark engines here"))
      in.addData( // near-dup of resident doc 1, arriving later
        StreamDoc(3L, "the quick brown fox jumps over the lazy cat"))
    }
    val pairs = spark.table("ndc").as[CandidatePair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairs.contains((1L, 3L)), pairs.toString)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc entered a candidate pair: $pairs")
  }

  test("nearDupCandidates: bucket cap bounds state, pairs stop at the cap") {
    val in = MemoryStream[StreamDoc](spark)
    // cap 2: the third identical doc may pair with at most 2 residents
    val out = EventStreams.nearDupCandidates(in.toDS(), maxPerBucket = 2)
    runToMemory(out, "ndc3", OutputMode.Append) {
      val t = "the quick brown fox jumps over the lazy dog"
      in.addData(StreamDoc(1L, t), StreamDoc(2L, t))
      in.addData(StreamDoc(3L, t))
      in.addData(StreamDoc(4L, t)) // beyond cap: pairs only with residents 1,2
    }
    val pairs = spark.table("ndc3").as[CandidatePair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    // doc 3 never became a resident (cap 2), so (3,4) cannot appear;
    // doc 4 still pairs with the capped residents
    assert(!pairs.contains((3L, 4L)), pairs.toString)
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
  }

  test("nearDupCandidates replay equals the batch LSH candidate set") {
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
    val in = MemoryStream[StreamDoc](spark)
    val out = EventStreams.nearDupCandidates(in.toDS())
    runToMemory(out, "ndc2", OutputMode.Append) {
      in.addData(corpus.select("doc_id", "text").as[StreamDoc].collect()
        .toIndexedSeq)
    }
    val streamed = spark.table("ndc2").as[CandidatePair].collect()
      .map(p => (p.doc_a, p.doc_b)).toSet
    val batch = graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashSignatures(
          graft.operators.TextOps.withShingles(corpus)))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("bulkIndexSink appends ES-bulk NDJSON per micro-batch") {
    val in = MemoryStream[Event](spark)
    val dir = Files.createTempDirectory("graft-stream-idx").toString
    val ck = Files.createTempDirectory("graft-stream-ck").toString
    val query = EventStreams.bulkIndexSink(in.toDF(), dir, "events_idx", ck)
    in.addData(Event(1, ts(1), 10, "click", 1.0),
      Event(2, ts(2), 10, "view", 2.0))
    query.processAllAvailable()
    in.addData(Event(3, ts(3), 11, "click", 3.0))
    query.processAllAvailable()
    query.stop()
    val lines = spark.read.textFile(s"$dir/events_idx").collect()
    assert(lines.count(_.startsWith("""{"index":{""")) == 3)
    assert(lines.count(_.contains("\"event_type\":")) == 3)
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    val in = MemoryStream[Event](spark)
    val users = spark.read.parquet(s"$sf001/customer.parquet")
      .select("c_custkey", "c_mktsegment")
    val out = EventStreams.enriched(in.toDF(), users)
      .select("event_id", "user_id", "c_mktsegment")
    runToMemory(out, "enr", OutputMode.Append) {
      in.addData(Event(1, ts(1), 1, "click", 1.0),   // custkey 1 exists
        Event(2, ts(2), 999999, "view", 2.0))        // no such user
    }
    val rows = spark.table("enr")
      .as[(Long, Long, Option[String])].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0)._3.isDefined)  // enriched
    assert(rows(1)._3.isEmpty)    // left join preserved the event
  }

  test("stream-stream interval join matches within the bounded window only") {
    val clicks = MemoryStream[Event](spark)
    val views = MemoryStream[Event](spark)
    val out = EventStreams.intervalJoin(clicks.toDF(), views.toDF(),
      maxGapMinutes = 10)
    runToMemory(out.select("click_id", "view_id"), "ssj", OutputMode.Append) {
      clicks.addData(Event(1, ts(10), 7, "click", 0))
      views.addData(
        Event(100, ts(12), 7, "view", 0),  // within 10 min → joins
        Event(101, ts(35), 7, "view", 0),  // outside window → no join
        Event(102, ts(12), 8, "view", 0))  // other user → no join
      clicks.addData(Event(2, ts(200), 9, "click", 0)) // advance watermark
      views.addData(Event(103, ts(200), 9, "view", 0))
    }
    val pairs = spark.table("ssj").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)))
    assert(!pairs.contains((1L, 101L)) && !pairs.contains((1L, 102L)))
  }

  test("stream-stream LEFT OUTER interval join: unmatched clicks emit " +
    "null views only after the watermark closes their interval") {
    val clicks = MemoryStream[Event](spark)
    val views = MemoryStream[Event](spark)
    val out = EventStreams.intervalJoinOuter(clicks.toDF(), views.toDF(),
      maxGapMinutes = 10)
    runToMemory(out.select("click_id", "view_id"), "ssjo",
      OutputMode.Append) {
      clicks.addData(
        Event(1, ts(10), 7, "click", 0),  // will match view 100
        Event(2, ts(10), 8, "click", 0))  // never matches
      views.addData(Event(100, ts(12), 7, "view", 0))
      // advance the watermark far past click_ts + gap on BOTH sides
      // (the join watermark is the min across inputs) so the
      // unmatched click's interval provably closed
      clicks.addData(Event(3, ts(300), 9, "click", 0))
      views.addData(Event(103, ts(300), 9, "view", 0))
      clicks.addData(Event(4, ts(600), 9, "click", 0))
      views.addData(Event(104, ts(600), 9, "view", 0))
    }
    val rows = spark.table("ssjo")
      .as[(Long, Option[Long])].collect()
    assert(rows.count(r => r._1 == 1L) == 1, s"got ${rows.toSeq}")
    assert(rows.contains((1L, Some(100L))), "matched click keeps its view")
    assert(rows.contains((2L, None)),
      "unmatched click must emit with a null view after the watermark")
    assert(!rows.contains((1L, None)),
      "a matched click must not ALSO emit an outer null row")
  }

  test("stream-stream interval join replay equals the batch twin (q63)") {
    import org.apache.spark.sql.functions.col
    // the REAL fixture through BOTH streaming sides — same operator
    // code as the oracled batch q63, so set-equality here closes the
    // loop: the streaming plumbing adds/drops/duplicates nothing
    val clicksS = EventStreams.readEventStream(spark, sf001)
      .filter(col("event_type") === "click")
    val viewsS = EventStreams.readEventStream(spark, sf001)
      .filter(col("event_type") === "view")
    // sf0.001 events are sparse — widen the interval so the fixture
    // actually produces matches (same widening on both twins)
    runToMemory(EventStreams.intervalJoin(clicksS, viewsS,
        maxGapMinutes = 1440)
      .select("click_id", "view_id"), "ssj_replay", OutputMode.Append) { () }
    val streamed = spark.table("ssj_replay")
      .as[(Long, Long)].collect().toSet
    val e = graft.engine.Tables.table(spark, sf001, "events")
    val batch = EventStreams.intervalJoin(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "view"), maxGapMinutes = 1440)
      .select("click_id", "view_id").as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty, "replay produced no joined pairs")
    assert(streamed == batch,
      s"stream vs batch diverged: only-stream=${(streamed -- batch).take(5)}" +
        s" only-batch=${(batch -- streamed).take(5)}")
  }

  test("funnelStream: the stage automaton advances in order within " +
    "the whole-funnel window; replay equals the batch twin's " +
    "per-stage counts") {
    // hand-built edge cases first (MemoryStream, single batch)
    val in = MemoryStream[Event](spark)
    val out = EventStreams.funnelStream(in.toDS(),
      Seq("signup", "purchase", "refund"), windowSec = 7L * 86400L)
    runToMemory(out, "fnl", OutputMode.Append) {
      in.addData(
        // u1 full chain (in-batch out-of-order arrival: fn sorts)
        Event(3, ts(300), 1, "refund", 0),
        Event(1, ts(10), 1, "signup", 0),
        Event(2, ts(100), 1, "purchase", 0),
        // u2: purchase BEFORE signup must not convert
        Event(4, ts(5), 2, "purchase", 0),
        Event(5, ts(6), 2, "signup", 0),
        // u3: second signup must not re-anchor (earliest wins)
        Event(6, ts(1), 3, "signup", 0),
        Event(7, ts(2), 3, "signup", 0))
    }
    val hits = spark.table("fnl")
      .as[FunnelHit].collect()
      .map(h => (h.user_id, h.stage_idx)).toSet
    assert(hits == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (3L, 0)))

    // replay-equality on the REAL fixture: per-stage distinct users
    // from the stream equal the oracled batch twin's counts
    val stages = Seq("signup", "purchase", "error")
    val w = 14L * 86400L
    val evS = EventStreams.readEventStream(spark, sf001)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
    runToMemory(EventStreams.funnelStream(evS, stages, w),
      "fnl_replay", OutputMode.Append) { () }
    val streamed = spark.table("fnl_replay").as[FunnelHit].collect()
      .groupBy(_.stage_idx).view.mapValues(_.map(_.user_id).distinct
        .size.toLong).toMap
    val batch = graft.operators.TimeOps.funnel(
      graft.engine.Tables.table(spark, sf001, "events"),
      "user_id", "event_type", "ts", stages, w)
      .select("stage_idx", "n_users")
      .as[(Long, Long)].collect().toMap
    assert(streamed.getOrElse(0, 0L) > 0, "replay produced no hits")
    stages.indices.foreach { i =>
      assert(streamed.getOrElse(i, 0L) == batch(i.toLong),
        s"stage $i: stream=${streamed.get(i)} batch=${batch(i.toLong)}")
    }
  }

  test("readEventStream replays the fixture table with proper timestamps") {
    val stream = EventStreams.readEventStream(spark, sf001)
    assert(stream.isStreaming)
    val agg = EventStreams.windowedCounts(stream,
      window_ = "1 hour", watermark = "1 minute")
    val q = agg.writeStream.format("memory").queryName("replay")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation",
        Files.createTempDirectory("ck-replay").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    // bounded replay: only windows older than max(ts) - watermark close;
    // the fixture spans many hours so most do
    assert(spark.table("replay").count() > 0)
  }

  test("degreeCounts: stream-end state equals the batch degree column") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.degreeCounts(in.toDS().toDF("src", "dst"))
    runToMemory(out, "deg", OutputMode.Complete) {
      in.addData(edges.take(2): _*) // arrivals split across two batches
      in.addData(edges.drop(2): _*)
    }
    val streamed = spark.table("deg").as[(Long, Long)].collect().toMap
    val batch = graft.operators.GraphOps
      .triangleStats(edges.toDF("src", "dst"))
      .select("node_id", "degree").as[(Long, Long)].collect().toMap
    assert(streamed == batch)
    assert(streamed == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("wedgeStream closure equals batch triangle counts across batches") {
    // K4 on {1,2,3,4}: every vertex is in C(3,2) = 3 triangles
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.wedgeStream(in.toDS().toDF("src", "dst"))
    runToMemory(out, "wedges", OutputMode.Append) {
      in.addData(edges.take(3): _*)
      in.addData(edges.drop(3): _*)
    }
    val batchEdges = edges.toDF("src", "dst")
    val streamed = EventStreams
      .triangleCountsOf(spark.table("wedges"), batchEdges)
      .as[(Long, Long)].collect().toMap
    val batch = graft.operators.GraphOps.triangleStats(batchEdges)
      .select("node_id", "n_triangles").as[(Long, Long)].collect().toMap
    assert(streamed == batch && streamed == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"streamed=$streamed batch=$batch")
    // exactly one wedge per (center, neighbor-pair): 4 vertices × C(3,2)
    assert(spark.table("wedges").count() == 12L)
    assert(spark.table("wedges").distinct().count() == 12L)
  }

  test("wedgeStream: duplicate/flipped redelivery and self-loops leave " +
    "the wedge set unchanged") {
    val canonical = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L))
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.wedgeStream(in.toDS().toDF("src", "dst"))
    runToMemory(out, "wedges_dup", OutputMode.Append) {
      in.addData((1L, 2L), (1L, 3L), (2L, 2L))  // first delivery + self-loop
      in.addData((2L, 1L), (3L, 1L))            // both redelivered flipped
      in.addData((2L, 3L), (3L, 4L), (2L, 4L))
      in.addData((4L, 3L), (2L, 3L))            // redeliveries again
    }
    val batchEdges = canonical.toDF("src", "dst")
    val streamed = EventStreams
      .triangleCountsOf(spark.table("wedges_dup"), batchEdges)
      .as[(Long, Long)].collect().toMap
    val batch = graft.operators.GraphOps.triangleStats(batchEdges)
      .select("node_id", "n_triangles").as[(Long, Long)].collect().toMap
    // triangles {1,2,3} and {2,3,4}; vertices 2,3 are in both
    assert(streamed == batch.filter(_._2 > 0) &&
      streamed == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      s"streamed=$streamed batch=$batch")
  }

  test("wedgeStream replay equals batch triangle counts on a real graph") {
    // the q97-shaped co-occurrence graph at sf0.001: parts sharing an
    // order, canonical distinct edges
    val li = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
    val edges = li.as("a").join(li.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("src"), $"b.l_partkey".as("dst"))
      .distinct()
    val data = edges.as[(Long, Long)].collect().toIndexedSeq
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.wedgeStream(in.toDS().toDF("src", "dst"))
    runToMemory(out, "wedges_replay", OutputMode.Append) {
      // arrivals split across three micro-batches, one slice flipped
      val (h, t) = data.splitAt(data.size / 3)
      val (m, l) = t.splitAt(t.size / 2)
      in.addData(h: _*)
      in.addData(m.map(e => (e._2, e._1)): _*) // flipped delivery
      in.addData(l: _*)
      in.addData(h.take(20): _*)               // redelivery
    }
    val streamed = EventStreams
      .triangleCountsOf(spark.table("wedges_replay"), edges)
      .as[(Long, Long)].collect().toMap
    val batch = graft.operators.GraphOps.triangleStats(edges)
      .select("node_id", "n_triangles").as[(Long, Long)].collect().toMap
      .filter(_._2 > 0)
    assert(streamed == batch,
      s"stream-only=${streamed.toSet -- batch.toSet} batch-only=${batch.toSet -- streamed.toSet}")
  }

  test("wedgeStreamCapped: low-degree vertices stay exact, the hub " +
    "saturates into a flagged lower bound with bounded emission") {
    // star hub 100 → {1..6} (degree 6 > cap 4) plus partner edges
    // (1,2), (3,4), (5,6): exact triangles at the hub = 3. Arrival
    // order sends 5 and 6 to the hub AFTER the cap fills, so the
    // hub's capped count misses (100,5,6); every other vertex has
    // degree 2 ≤ cap and must match the exact twin.
    val edges = Seq(
      (100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (100L, 5L), (100L, 6L),
      (1L, 2L), (3L, 4L), (5L, 6L))
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.wedgeStreamCapped(in.toDS().toDF("src", "dst"),
      cap = 4)
    runToMemory(out, "wedges_cap", OutputMode.Append) {
      in.addData(edges.take(4): _*)  // hub fills to cap
      in.addData(edges.slice(4, 6): _*) // 5th/6th neighbor → marker
      in.addData(edges.drop(6): _*)  // partner edges
    }
    val batchEdges = edges.toDF("src", "dst")
    val streamed = EventStreams
      .cappedTriangleCountsOf(spark.table("wedges_cap"), batchEdges)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = graft.operators.GraphOps.triangleStats(batchEdges)
      .select("node_id", "n_triangles").as[(Long, Long)].collect().toMap
    // exactly one saturation marker, at the hub
    val marks = spark.table("wedges_cap").filter($"saturated")
      .as[CappedWedge].collect()
    assert(marks.toSeq == Seq(CappedWedge(100L, -1L, -1L, saturated = true)))
    // hub: flagged lower bound, strictly below the exact count here
    assert(streamed(100L) == ((2L, true)) && exact(100L) == 3L)
    // every unsaturated vertex matches the exact twin
    streamed.filterNot(_._1 == 100L).foreach { case (v, (n, lb)) =>
      assert(!lb && n == exact(v), s"vertex $v: capped=$n exact=${exact(v)}")
    }
    // emission at the hub is bounded by C(cap, 2), not C(deg, 2)
    val hubWedges = spark.table("wedges_cap")
      .filter($"center" === 100L && !$"saturated").count()
    assert(hubWedges <= 6L, s"hub emitted $hubWedges wedges > C(4,2)")
  }

  test("cappedTriangleEstimate: HT correction recovers the hub's " +
    "triangle count within the variance bound, exact elsewhere") {
    // hub 0 → {1..200} with ring edges (i, i+1): 199 triangles at the
    // hub, degree 200 ≫ cap 60. Ring vertices have degree ≤ 3 — exact.
    val hubEdges = (1L to 200L).map(i => (0L, i))
    val ringEdges = (1L to 199L).map(i => (i, i + 1))
    val all = (hubEdges ++ ringEdges).toIndexedSeq
    // exchangeable arrival = a fixed shuffled order (seeded: the test
    // is deterministic end-to-end; the operator itself stays RNG-free)
    val shuffled = new scala.util.Random(7).shuffle(all)
    val in = MemoryStream[(Long, Long)](spark)
    val cap = 60
    val out = EventStreams.wedgeStreamCapped(in.toDS().toDF("src", "dst"),
      cap = cap)
    runToMemory(out, "wedges_ht", OutputMode.Append) {
      shuffled.grouped(100).foreach(chunk => in.addData(chunk: _*))
    }
    val batchEdges = all.toDF("src", "dst")
    val est = EventStreams.cappedTriangleEstimate(
        spark.table("wedges_ht"), batchEdges, cap)
      .as[(Long, Long, Boolean, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = graft.operators.GraphOps.triangleStats(batchEdges)
      .select("node_id", "n_triangles").as[(Long, Long)].collect().toMap
    // the hub: flagged lower bound strictly below truth, HT estimate
    // within ~2σ of it (rel σ = sqrt((1-p)/(p·T)) ≈ 0.23 here)
    val (hubRaw, hubLb, hubEst) = est(0L)
    assert(hubLb, "hub did not saturate")
    assert(hubRaw < 199L, s"raw capped count $hubRaw not a strict bound")
    assert(hubEst > hubRaw.toDouble, "estimate must exceed the raw bound")
    val relErr = math.abs(hubEst - 199.0) / 199.0
    assert(relErr < 0.5,
      s"HT estimate $hubEst vs exact 199 — rel err $relErr > 2σ bound")
    // every unsaturated vertex: estimate IS the exact count
    est.filterNot(_._1 == 0L).foreach { case (v, (n, lb, e)) =>
      assert(!lb && e == exact(v).toDouble && n == exact(v),
        s"vertex $v: est=$e capped=$n exact=${exact(v)}")
    }
  }

  test("wedgeStreamCapped: redelivery to a saturated vertex emits " +
    "nothing and replays reproduce the same output") {
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L), (1L, 2L))
    def run(name: String, extra: Seq[(Long, Long)]): Set[CappedWedge] = {
      val in = MemoryStream[(Long, Long)](spark)
      val out = EventStreams.wedgeStreamCapped(in.toDS().toDF("src", "dst"),
        cap = 2)
      runToMemory(out, name, OutputMode.Append) {
        in.addData(edges: _*)
        if (extra.nonEmpty) in.addData(extra: _*)
      }
      spark.table(name).as[CappedWedge].collect().toSet
    }
    val base = run("wcap_base", Nil)
    // flipped + duplicate redeliveries, including to the saturated hub,
    // plus a self-loop: the output set must not change
    val replayed = run("wcap_replay",
      Seq((1L, 9L), (3L, 9L), (9L, 3L), (2L, 1L), (9L, 9L)))
    assert(base == replayed, s"base=$base replayed=$replayed")
    // hub 9 saturated at cap=2 (3 distinct neighbors): one marker
    assert(base.count(_.saturated) == 1)
  }

  test("wedgeStreamCapped with cap >= max degree equals the exact twin") {
    // K4: every vertex has degree 3 = cap, so nothing saturates
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.wedgeStreamCapped(in.toDS().toDF("src", "dst"),
      cap = 3)
    runToMemory(out, "wcap_k4", OutputMode.Append) {
      in.addData(edges.take(3): _*)
      in.addData(edges.drop(3): _*)
    }
    val rows = spark.table("wcap_k4").as[CappedWedge].collect()
    assert(!rows.exists(_.saturated))
    val asWedges = rows.map(c => Wedge(c.center, c.a, c.b)).toSet
    val in2 = MemoryStream[(Long, Long)](spark)
    val exact = EventStreams.wedgeStream(in2.toDS().toDF("src", "dst"))
    runToMemory(exact, "wcap_k4_exact", OutputMode.Append) {
      in2.addData(edges.take(3): _*)
      in2.addData(edges.drop(3): _*)
    }
    assert(asWedges == spark.table("wcap_k4_exact").as[Wedge].collect().toSet)
    // closure agrees and nothing is a lower bound
    val counts = EventStreams
      .cappedTriangleCountsOf(spark.table("wcap_k4"), edges.toDF("src", "dst"))
      .as[(Long, Long, Boolean)].collect()
    assert(counts.forall(!_._3) &&
      counts.map(r => r._1 -> r._2).toMap ==
        Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degreeCounts: duplicate/flipped redelivery and self-loops do not " +
    "diverge from the batch twin") {
    // the canonical distinct edge set the batch twin sees
    val canonical = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    // an at-least-once source: every edge delivered twice across
    // batches, one redelivery flipped, plus a self-loop that the
    // canonical-edge contract excludes entirely
    val in = MemoryStream[(Long, Long)](spark)
    val out = EventStreams.degreeCounts(in.toDS().toDF("src", "dst"))
    runToMemory(out, "deg_dup", OutputMode.Complete) {
      in.addData((1L, 2L), (1L, 3L), (2L, 2L)) // first delivery + self-loop
      in.addData((2L, 1L), (1L, 3L))           // redelivered (one flipped)
      in.addData((2L, 3L), (3L, 4L), (4L, 3L)) // rest + flipped redelivery
    }
    val streamed = spark.table("deg_dup").as[(Long, Long)].collect().toMap
    val batch = graft.operators.GraphOps
      .triangleStats(canonical.toDF("src", "dst"))
      .select("node_id", "degree").as[(Long, Long)].collect().toMap
    assert(streamed == batch,
      s"streamed=$streamed batch=$batch")
  }

  test("windowedCms: merged window sketches estimate the whole stream exactly") {
    graft.functions.GraftFunctions.register(spark)
    val in = MemoryStream[Event](spark)
    val out = EventStreams.windowedCms(
      in.toDF(), window_ = "10 minutes", watermark = "5 minutes")
    runToMemory(out, "wcms", OutputMode.Append) {
      // window [0,10): 3 clicks, 1 view; window [10,20): 2 views
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(4), 10, "click", 1.0),
        Event(3, ts(8), 11, "view", 1.0))
      in.addData(
        Event(4, ts(9), 12, "click", 1.0),
        Event(5, ts(12), 10, "view", 1.0),
        Event(6, ts(14), 11, "view", 1.0))
      in.addData(Event(7, ts(40), 10, "click", 1.0)) // advances watermark
    }
    // two closed windows, one sketch each
    val emitted = spark.table("wcms")
    assert(emitted.count() == 2, emitted.collect().mkString(","))
    // linearity: the rollup of window sketches IS the stream's sketch —
    // estimates over the union must equal the exact replayed counts
    emitted.createOrReplaceTempView("wcms_emitted")
    val est = spark.sql(
      """WITH u AS (SELECT graft_cms_merge_agg(sk) AS s FROM wcms_emitted)
        |SELECT t, graft_cms_estimate((SELECT s FROM u), xxhash64(t)) AS n
        |FROM (SELECT 'click' AS t UNION ALL SELECT 'view')""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(est == Map("click" -> 3L, "view" -> 3L), est)
  }

  test("windowedHll: union of window sketches deduplicates users " +
    "across windows") {
    val in = MemoryStream[Event](spark)
    val out = EventStreams.windowedHll(
      in.toDF(), window_ = "10 minutes", watermark = "5 minutes")
    runToMemory(out, "whll", OutputMode.Append) {
      // window [0,10): users 10, 11; window [10,20): users 10, 12 —
      // user 10 is active in BOTH windows
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(4), 11, "click", 1.0),
        Event(3, ts(8), 10, "view", 1.0))
      in.addData(
        Event(4, ts(12), 10, "view", 1.0),
        Event(5, ts(14), 12, "view", 1.0))
      in.addData(Event(6, ts(40), 10, "click", 1.0)) // advances watermark
    }
    val emitted = spark.table("whll")
    assert(emitted.count() == 2, emitted.collect().mkString(","))
    emitted.createOrReplaceTempView("whll_emitted")
    // per-window distinct users: 2 and 2 (HLL is exact at these sizes)
    val per = spark.sql(
      """SELECT window_start, hll_sketch_estimate(sk) FROM whll_emitted
        |ORDER BY window_start""".stripMargin)
      .as[(java.sql.Timestamp, Long)].collect().map(_._2).toSeq
    assert(per == Seq(2L, 2L), per)
    // register-max union counts the cross-window user ONCE: 3 distinct
    // users overall, not 4 — the property a sum of per-window counts
    // cannot deliver
    val total = spark.sql(
      "SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM whll_emitted")
      .as[Long].head()
    assert(total == 3L, s"union estimate $total")
  }

  test("windowedHistogram: sparse per-window buckets, clamping, and " +
    "LINEARITY — vector-adding windows is the union-stream histogram") {
    val in = MemoryStream[Event](spark)
    val out = EventStreams.windowedHistogram(
      in.toDF(), window_ = "10 minutes", watermark = "5 minutes",
      width = 50.0, nBuckets = 4)
    runToMemory(out, "whist", OutputMode.Append) {
      in.addData(
        Event(1, ts(1), 10, "click", 10.0), // bucket 0
        Event(2, ts(4), 11, "click", 60.0), // bucket 1
        Event(3, ts(8), 10, "view", 70.0)) // bucket 1
      in.addData(
        Event(4, ts(12), 10, "view", 10.0), // bucket 0, window 2
        Event(5, ts(14), 12, "view", 990.0)) // clamps to bucket 3
      in.addData(Event(6, ts(40), 10, "click", 1.0)) // advances watermark
    }
    val emitted = spark.table("whist")
      .as[(Timestamp, Long, Long)].collect().toSeq
    // sparse emission: only occupied (window, bucket) cells appear
    assert(emitted.map(_._1).distinct.size == 2, emitted.mkString(","))
    assert(emitted.size == 4, emitted.mkString(","))
    val w1 = emitted.filter(_._1 == ts(0)).map(t => t._2 -> t._3).toMap
    val w2 = emitted.filter(_._1 == ts(10)).map(t => t._2 -> t._3).toMap
    assert(w1 == Map(0L -> 1L, 1L -> 2L), w1)
    assert(w2 == Map(0L -> 1L, 3L -> 1L), w2)
    // linearity — the CMS/HLL merge property in its simplest form:
    // summing per-window counters by bucket IS the histogram of the
    // union stream, so any later granularity is a KB-sized vector add
    val merged = spark.table("whist").groupBy("bucket")
      .agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(0L -> 2L, 1L -> 2L, 3L -> 1L), merged)
  }

  test("decontaminateStream replay equals the batch decontaminate counts") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "one two three four"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      StreamDoc(1L, "x alpha beta gamma delta epsilon y"),
      StreamDoc(2L, "zero one two three four"),
      StreamDoc(3L, "alpha beta gamma delta and one two three four"),
      StreamDoc(4L, "alpha beta x gamma delta y epsilon"), // near-miss
      StreamDoc(5L, "unrelated content entirely different words here"),
      StreamDoc(6L, "too short"))
    val digests = graft.operators.Dedup.benchmarkDigests(bench, n = 4)
    val in = MemoryStream[StreamDoc](spark)
    val out = EventStreams.decontaminateStream(in.toDF(), digests, n = 4)
    runToMemory(out, "decon", OutputMode.Append) {
      in.addData(corpus.take(3))
      in.addData(corpus.drop(3)) // flagging is per-row: batch boundaries free
    }
    val streamed = spark.table("decon")
      .as[(Long, Long)].collect().toSet
    val batch = graft.operators.Dedup
      .decontaminate(corpus.toDF(), bench, n = 4)
      .select("doc_id", "n_hit_grams").as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.map(_._1) == Set(1L, 2L, 3L))
  }

  test("maintainedSummarySink: every summary version equals the " +
    "from-scratch aggregation of the replayed log, and epoch replays " +
    "are idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.Pipeline
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("doc_id", "source", "n_chars")
    val in = MemoryStream[(Long, String, Long, String)](spark)
    val dir = Files.createTempDirectory("graft-msl").toString
    val logDir = s"$dir/log"
    val sumDir = s"$dir/sum"
    val ck = Files.createTempDirectory("graft-msl-ck").toString
    val changes = in.toDF().toDF("doc_id", "source", "n_chars", "op")
    val q = EventStreams.maintainedSummarySink(changes, base, logDir,
      sumDir, ck, "doc_id", "source", "n_chars")
    in.addData((2L, "a", 25L, "U"), (9L, "b", 90L, "U"))
    q.processAllAvailable()
    in.addData((1L, "", 0L, "D"), (9L, "b", 95L, "U"),
      (10L, "c", 100L, "U"))
    q.processAllAvailable()
    q.stop()
    val vs = Pipeline.summaryVersions(sumDir)
    assert(vs.size == 2, s"expected 2 summary versions, got $vs")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
        .as[(String, Long, Long)].collect().toSet
    // replay-equality AT EVERY VERSION: the maintained summary is
    // indistinguishable from re-aggregating that version's snapshot
    vs.foreach { e =>
      val want = aggOf(
        Pipeline.replayLogBefore(spark, base, logDir, "doc_id", e + 1))
      val got = Pipeline.readSummary(spark, sumDir, e)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"version $e: $got != $want")
    }
    val fin = Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet
    assert(fin == Set(("a", 1L, 25L), ("b", 2L, 125L), ("c", 1L, 100L)))
    // a re-delivered epoch (crash-retry) reconstructs, never doubles
    val b2 = Seq((1L, "", 0L, "D"), (9L, "b", 95L, "U"),
      (10L, "c", 100L, "U")).toDF("doc_id", "source", "n_chars", "op")
    Pipeline.absorbSummaryBatch(b2, base, logDir, sumDir,
      "doc_id", "source", "n_chars", vs.last)
    assert(Pipeline.summaryVersions(sumDir) == vs)
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet == fin)
  }

  test("maintainedSummarySink with retention cadence: the version " +
    "count stays at keepLast across triggers and the surviving " +
    "summary still equals the fully-replayed truth") {
    import org.apache.spark.sql.functions._
    import graft.operators.Pipeline
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("doc_id", "source", "n_chars")
    val in = MemoryStream[(Long, String, Long, String)](spark)
    val dir = Files.createTempDirectory("graft-mslr").toString
    val logDir = s"$dir/log"
    val sumDir = s"$dir/sum"
    val ck = Files.createTempDirectory("graft-mslr-ck").toString
    val changes = in.toDF().toDF("doc_id", "source", "n_chars", "op")
    val q = EventStreams.maintainedSummarySink(changes, base, logDir,
      sumDir, ck, "doc_id", "source", "n_chars", keepLast = 2)
    (1 to 4).foreach { i =>
      in.addData((100L + i, s"g$i", 10L * i, "U"))
      q.processAllAvailable()
      assert(Pipeline.summaryVersions(sumDir).size <= 2,
        s"retention cadence failed after trigger $i")
    }
    q.stop()
    val want = Pipeline.replayLog(spark, base, logDir, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(Pipeline.readSummary(spark, sumDir)
      .as[(String, Long, Long)].collect().toSet == want)
    // pruned versions fail loudly, never serve a newer one silently
    intercept[IllegalArgumentException] {
      Pipeline.readSummary(spark, sumDir, 0L)
    }
  }

  test("maintained-view sinks REFUSE keepLast = 1: an epoch replay " +
    "needs its predecessor version to survive the prune, so the " +
    "floor is 2 (0 = retention off stays allowed)") {
    import graft.operators.Pipeline
    val dir = Files.createTempDirectory("graft-floor").toString
    val base = Seq((1L, "a", 10L)).toDF("doc_id", "source", "n_chars")
    val changes = Seq.empty[(Long, String, Long, String)]
      .toDF("doc_id", "source", "n_chars", "op")
    intercept[IllegalArgumentException] {
      EventStreams.maintainedSummarySink(changes, base, s"$dir/l1",
        s"$dir/s1", s"$dir/ck1", "doc_id", "source", "n_chars",
        keepLast = 1)
    }
    intercept[IllegalArgumentException] {
      EventStreams.maintainedTopKSink(changes, base, s"$dir/l2",
        s"$dir/s2", s"$dir/ck2", "doc_id", "source", "n_chars",
        k = 3, keepLast = 1)
    }
    // the batch-side prune keeps its own floor at 1 (no replay there)
    intercept[IllegalArgumentException] {
      Pipeline.pruneSummaries(s"$dir/nowhere", keepLast = 0)
    }
  }

  test("rolloverIndexSink: streamed ingest rolls the write alias at " +
    "the doc threshold, the sealed family serves exactly like one " +
    "combined index, and a re-delivered epoch is a family-wide no-op") {
    import graft.operators.SegmentedIndex
    val in = MemoryStream[(Long, String)](spark)
    val dir = Files.createTempDirectory("graft-rosink").toString
    val stem = dir + "/logs"
    val alias = dir + "/write-alias"
    SegmentedIndex.createIndex(stem + "-000001", nBuckets = 4)
    SegmentedIndex.setAlias(alias, stem + "-000001")
    val ck = Files.createTempDirectory("graft-rosink-ck").toString
    val q = EventStreams.rolloverIndexSink(
      in.toDF().toDF("doc_id", "text"), alias, ck, maxDocs = 2L,
      nBuckets = 4)
    val batches = Seq(
      Seq((1L, "spark data"), (2L, "spark vector")),
      Seq((3L, "data only"), (4L, "vector vector")),
      Seq((5L, "spark new")))
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // each 2-doc batch filled an index to the threshold and rolled
    val family = SegmentedIndex.familyRoots(alias)
    assert(family.size == 3, family.map(_._1).toString)
    // the family serves exactly like one combined index
    val all = Files.createTempDirectory("graft-rosink-all").toString
    SegmentedIndex.append(spark, all,
      batches.flatten.toDF("doc_id", "text"), "a", nBuckets = 4)
    val terms = Seq("spark", "vector")
    assert(SegmentedIndex.searchFamily(spark, alias, terms, 10)
      .select("doc_id", "score", "n_terms_hit").collect().toSet ==
      SegmentedIndex.search(spark, all, terms, 10).collect().toSet)
    // the post-flip replay guard: epoch 0's batch lives in member 1;
    // a re-delivery arriving at the CURRENT alias target must be
    // seen as already-held family-wide
    assert(SegmentedIndex.hasBatch(stem + "-000001", "epoch=0"))
    assert(!SegmentedIndex.hasBatch(
      SegmentedIndex.resolveAlias(alias), "epoch=0"))
    assert(SegmentedIndex.familyRoots(alias).exists { case (_, r) =>
      SegmentedIndex.hasBatch(r, "epoch=0") },
      "the family-wide guard must catch a post-flip re-delivery")
  }

  test("percolateSink: streamed documents alert against the " +
    "registered queries — the match log's union equals the batch " +
    "percolation of the unioned documents, per-epoch segments " +
    "readable independently") {
    import graft.operators.{Analyzer, Search}
    val in = MemoryStream[(Long, String)](spark)
    val matchesDir = Files.createTempDirectory("graft-perc").toString
    val ck = Files.createTempDirectory("graft-perc-ck").toString
    val registered = Seq(
      (1L, "spark join"),
      (2L, "Vector"),
      (3L, "the a")).toDF("query_id", "qtext")
    val docsStream = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.percolateSink(docsStream, registered,
      matchesDir, ck, Analyzer.English)
    val b1 = Seq((1L, "spark join here"), (2L, "VECTOR math"))
    val b2 = Seq((3L, "join spark"), (4L, "nothing"))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val segs = new java.io.File(matchesDir).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(segs.length == 2, segs.toSeq.toString)
    val streamed = spark.read.parquet(s"$matchesDir/batch=*")
      .as[(Long, Long)].collect().toSet
    val batch = Search.percolate(
      (b1 ++ b2).toDF("doc_id", "text"), registered, Analyzer.English)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"streamed=$streamed batch=$batch")
    // the english chain did its work: case folded (doc 2 matched
    // query 2) and the stopword-only query 3 matched nothing
    assert(streamed.contains((2L, 2L)))
    assert(!streamed.exists(_._2 == 3L))
    // each epoch's segment reads independently
    assert(spark.read.parquet(s"$matchesDir/batch=0")
      .as[(Long, Long)].collect().toSet == Set((1L, 1L), (2L, 2L)))
  }

  test("cdcLogSink + replayLog: streamed change batches replay to the " +
    "same snapshots as the batch CDC path, every version readable") {
    import graft.operators.Pipeline
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String, String)](spark)
    val logDir = Files.createTempDirectory("graft-cdc-log").toString
    val ck = Files.createTempDirectory("graft-cdc-ck").toString
    val changes = in.toDF().toDF("doc_id", "text", "op")
    val query = EventStreams.cdcLogSink(changes, logDir, ck)
    in.addData((2L, "B2", "U"), (9L, "new", "U"))
    query.processAllAvailable()
    in.addData((1L, "", "D"), (9L, "new2", "U"))
    query.processAllAvailable()
    query.stop()
    def snap(v: Int) = Pipeline.replayLog(spark, base, logDir, "doc_id", v)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // version 1: first micro-batch only
    assert(snap(1) == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
    // full log: delete applied, second upsert wins
    assert(snap(Int.MaxValue) ==
      Seq((2L, "B2"), (3L, "c"), (9L, "new2")))
    // v1 unchanged after the log grew — time travel over the stream log
    assert(snap(1) == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (9L, "new")))
    // equality with the all-batch path on the same change sets
    val b1 = Seq((2L, "B2", "U"), (9L, "new", "U"))
      .toDF("doc_id", "text", "op")
    val b2 = Seq((1L, "", "D"), (9L, "new2", "U"))
      .toDF("doc_id", "text", "op")
    val direct = Pipeline.snapshotAt(base, Seq(b1, b2), 2, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(snap(Int.MaxValue) == direct)
  }

  test("maintainedTopKSink: every view version equals the from-scratch " +
    "top-k of the replayed log; epoch replays are idempotent") {
    import org.apache.spark.sql.functions._
    import graft.operators.Pipeline
    val base = Seq((1L, "a", 50L), (2L, "a", 40L), (3L, "a", 30L),
      (4L, "a", 20L), (5L, "b", 90L), (6L, "b", 80L))
      .toDF("doc_id", "source", "n_chars")
    val in = MemoryStream[(Long, String, Long, String)](spark)
    val dir = Files.createTempDirectory("graft-tks").toString
    val logDir = s"$dir/log"
    val viewDir = s"$dir/view"
    val ck = Files.createTempDirectory("graft-tks-ck").toString
    val q = EventStreams.maintainedTopKSink(
      in.toDF().toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, viewDir, ck, "doc_id", "source", "n_chars", k = 2)
    in.addData((1L, "a", 0L, "D"), (7L, "b", 85L, "U"))
    q.processAllAvailable()
    in.addData((6L, "a", 95L, "U"), (8L, "c", 5L, "U"))
    q.processAllAvailable()
    q.stop()
    val vs = Pipeline.summaryVersions(viewDir)
    assert(vs.size == 2, s"expected 2 view versions, got $vs")
    def viewOf(df: org.apache.spark.sql.DataFrame) =
      df.select("source", "doc_id", "n_chars", "rank")
        .as[(String, Long, Long, Long)].collect().toSet
    vs.foreach { e =>
      val want = viewOf(Pipeline.topKView(
        Pipeline.replayLogBefore(spark, base, logDir, "doc_id", e + 1),
        "doc_id", "source", "n_chars", 2))
      val got = viewOf(Pipeline.readSummary(spark, viewDir, e))
      assert(got == want, s"version $e: $got != $want")
    }
    // the k+1 promotion actually happened: doc 1's delete promoted
    // doc 3 into a's top-2 at version 0, then the doc-6 move (b->a)
    // reshaped both groups at version 1
    val fin = viewOf(Pipeline.readSummary(spark, viewDir))
    assert(fin == Set(("a", 6L, 95L, 1L), ("a", 2L, 40L, 2L),
      ("b", 5L, 90L, 1L), ("b", 7L, 85L, 2L), ("c", 8L, 5L, 1L)), fin)
    // a re-delivered epoch reconstructs, never diverges
    Pipeline.absorbTopKBatch(
      Seq((6L, "a", 95L, "U"), (8L, "c", 5L, "U"))
        .toDF("doc_id", "source", "n_chars", "op"),
      base, logDir, viewDir, "doc_id", "source", "n_chars", 2, vs.last)
    assert(viewOf(Pipeline.readSummary(spark, viewDir)) == fin)
    assert(Pipeline.summaryVersions(viewDir) == vs)
  }

  test("searchIndexSink: streamed batches build the same searchable " +
    "index as batch appends; each trigger is one committed segment") {
    import graft.operators.SegmentedIndex
    val in = MemoryStream[(Long, String)](spark)
    val root = Files.createTempDirectory("graft-sxs").toString + "/idx"
    val ck = Files.createTempDirectory("graft-sxs-ck").toString
    val q = EventStreams.searchIndexSink(
      in.toDF().toDF("doc_id", "text"), root, ck, nBuckets = 4)
    in.addData((1L, "x x y"), (2L, "x z"))
    q.processAllAvailable()
    // refresh semantics: the first trigger's docs are searchable NOW
    assert(SegmentedIndex.stats(root)._1 == 1L)
    val mid = SegmentedIndex.search(spark, root, Seq("x"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(mid.map(_._1) == Seq(1L, 2L), mid.toString)
    in.addData((3L, "y y y z"), (4L, "w only"))
    q.processAllAvailable()
    q.stop()
    assert(SegmentedIndex.stats(root) == ((2L, 0L, 4L)))
    // replay-equality: the streamed index answers exactly like a
    // batch-built twin of the same two batches
    val twin = Files.createTempDirectory("graft-sxt").toString + "/idx"
    SegmentedIndex.append(spark, twin,
      Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text"), "a",
      nBuckets = 4)
    SegmentedIndex.append(spark, twin,
      Seq((3L, "y y y z"), (4L, "w only")).toDF("doc_id", "text"), "b")
    val streamed = SegmentedIndex.search(spark, root, Seq("x", "y"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    val batch = SegmentedIndex.search(spark, twin, Seq("x", "y"), 10)
      .as[(Long, Double, Long)].collect().toSeq
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("streamed index serves the aggregation and bool surface: " +
    "facet, stats and bool queries over streamed segments equal the " +
    "batch-built twin") {
    import graft.operators.SegmentedIndex
    val in = MemoryStream[(Long, String, String, Long)](spark)
    val root = Files.createTempDirectory("graft-sxa").toString + "/idx"
    val ck = Files.createTempDirectory("graft-sxa-ck").toString
    val q = EventStreams.searchIndexSink(
      in.toDF().toDF("doc_id", "text", "cat", "n"), root, ck,
      nBuckets = 4)
    in.addData((1L, "x x y", "news", 10L), (2L, "x z", "blog", 20L))
    q.processAllAvailable()
    in.addData((3L, "y z", "news", 40L))
    q.processAllAvailable()
    q.stop()
    val twin = Files.createTempDirectory("graft-sxb").toString + "/idx"
    SegmentedIndex.append(spark, twin,
      Seq((1L, "x x y", "news", 10L), (2L, "x z", "blog", 20L))
        .toDF("doc_id", "text", "cat", "n"), "a", nBuckets = 4)
    SegmentedIndex.append(spark, twin,
      Seq((3L, "y z", "news", 40L))
        .toDF("doc_id", "text", "cat", "n"), "b")
    def eq(f: String => org.apache.spark.sql.DataFrame): Unit =
      assert(f(root).collect().toSeq == f(twin).collect().toSeq)
    eq(SegmentedIndex.facet(spark, _, Seq("x", "y"), "cat", 10))
    eq(SegmentedIndex.statsFacet(spark, _, Seq("x", "y"), "n"))
    eq(SegmentedIndex.boolSearch(spark, _, must = Seq("x"),
      mustNot = Seq("z"), k = 10))
    eq(SegmentedIndex.sortedSearch(spark, _, Seq("x", "y"), "n", 10,
      ascending = false))
  }

  test("searchIndexSink with a merge tier: the live segment count " +
    "stays at the bound across many triggers and searches keep " +
    "answering (ES's refresh + merge scheduler in one loop)") {
    import graft.operators.SegmentedIndex
    val in = MemoryStream[(Long, String)](spark)
    val root = Files.createTempDirectory("graft-sxm").toString + "/idx"
    val ck = Files.createTempDirectory("graft-sxm-ck").toString
    val q = EventStreams.searchIndexSink(
      in.toDF().toDF("doc_id", "text"), root, ck, nBuckets = 4,
      maxSegments = 2)
    (1 to 5).foreach { i =>
      in.addData((i.toLong, s"x doc$i"))
      q.processAllAvailable()
      assert(SegmentedIndex.stats(root)._1 <= 2L,
        s"segment count exceeded the tier bound after trigger $i")
    }
    q.stop()
    // every streamed doc is searchable after the folds, stats exact
    assert(SegmentedIndex.stats(root)._3 == 5L)
    val hits = SegmentedIndex.search(spark, root, Seq("x"), 10)
      .as[(Long, Double, Long)].collect().map(_._1).toSeq
    assert(hits == (1L to 5L), hits.toString)
  }
}
