package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Indexer

/** Typed event row (events.parquet schema, FIXTURES.md). Top-level —
  * encoder codegen requires non-nested case classes. */
final case class Event(event_id: Long, ts: java.sql.Timestamp,
                       user_id: Long, event_type: String, value: Double)

/** One closed session per user: bounded by a gap of event-time silence. */
final case class Session(user_id: Long, n_events: Int, total_value: Double,
                         started: java.sql.Timestamp,
                         ended: java.sql.Timestamp)

/** Mutable-free per-user session accumulator (stream state). */
final case class SessionState(n: Int, total: Double, start: Long, last: Long)

/** A document arriving on a stream (near-dup candidate detection). */
final case class StreamDoc(doc_id: Long, text: String)

/** Per-user funnel automaton state: the stage-0 anchor, the previous
  * stage's anchor and the reached stage index (all epoch millis —
  * fixed-size, O(users) total state). */
final case class FunnelState(t0: Long, tprev: Long, idx: Int)

/** One funnel advancement: `user_id` reached `stage_idx` at `ts`. */
final case class FunnelHit(user_id: Long, stage_idx: Int,
                           ts: java.sql.Timestamp)

/** One banded-signature row of a streaming doc. */
final case class DocBand(band_id: Int, band_key: String, doc_id: Long)

/** Resident doc ids of one LSH bucket (stream state). */
final case class BucketState(ids: List[Long])

/** A near-dup candidate pair emitted by the stream (doc_a < doc_b). */
final case class CandidatePair(doc_a: Long, doc_b: Long)

/** A wedge emitted by the streaming triangle twin: `center` is adjacent
  * to both `a` and `b` (`a < b`); the wedge is a triangle iff `(a, b)`
  * is itself an edge.
  */
final case class Wedge(center: Long, a: Long, b: Long)

/** Adjacency of one vertex (stream state for the triangle twin). */
final case class AdjState(nbrs: List[Long])

/** A wedge or saturation marker from the CAPPED triangle twin: wedge
  * rows carry `saturated = false`; the one-time marker row a vertex
  * emits when its adjacency first overflows the cap carries
  * `saturated = true` with `a = b = -1`.
  */
final case class CappedWedge(center: Long, a: Long, b: Long,
                             saturated: Boolean)

/** Capped adjacency of one vertex (stream state for the capped twin):
  * `sat` latches once a (cap+1)-th distinct neighbor has been seen, so
  * the marker is emitted exactly once.
  */
final case class CapAdjState(nbrs: List[Long], sat: Boolean)

/** Structured Streaming surface over the `events` shape.
  *
  * The reference is strictly one-shot batch per HTTP request
  * (`api/controllers/routes.go:9-15` — no streaming anywhere), but its
  * indexing role (continuous feeding of a search index,
  * `api/controllers/elastic_controller.go:253-301`) is inherently a
  * streaming workload the moment data keeps arriving. This module gives
  * the engine that capability natively:
  *
  *  - event-time tumbling-window aggregation with a watermark (late-data
  *    bound ⇒ state is evicted, memory is bounded at any scale);
  *  - streaming exact dedup within the watermark horizon;
  *  - session windows via [[flatMapGroupsWithState]] — arbitrary typed
  *    state per key, the escape hatch the built-in operators can't cover;
  *  - a micro-batch bulk-index sink (`foreachBatch` → [[Indexer]]) —
  *    the streaming version of the reference's E2 path.
  *
  * All transforms are expressed on the streaming DataFrame exactly as on
  * a batch one; the same Catalyst plan runs incrementally. State store
  * partitioning follows `spark.sql.shuffle.partitions` — size it to the
  * key cardinality, not the data volume.
  */
object EventStreams {

  /** Tumbling event-time window counts with a watermark. Output mode
    * `append` emits each window exactly once, after the watermark passes
    * its end — the streaming analogue of batch `q22_timebucket`.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Windowed count-min sketches: each event-time window folds its key
    * stream into ONE bounded-size CMS binary (Spark's native
    * `count_min_sketch` aggregate running in streaming state), emitted
    * when the watermark closes the window — the sketch-at-ingest
    * posture for FREQUENCIES. Because CMS counters are linear,
    * any downstream rollup of emitted window sketches with
    * `graft_cms_merge_agg` is EXACTLY the sketch of the union stream
    * (spec pins this against a batch whole-stream build): ingest pays
    * one pass, every later granularity — hour, day, corpus — is a
    * KB-sized merge, never a re-read. State per window is the sketch
    * itself (eps/confidence-bounded, independent of key cardinality),
    * evicted on close.
    */
  def windowedCms(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", eps: Double = 0.001,
      conf: Double = 0.99, seed: Int = 42): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(expr(s"count_min_sketch(xxhash64(event_type), " +
        s"${eps}d, ${conf}d, $seed)").as("sk"))
      .select(col("window.start").as("window_start"), col("sk"))
  }

  /** [[windowedCms]]'s DISTINCT-count twin: one HLL sketch of
    * `user_id` per event-time window, emitted when the watermark
    * closes the window. HLL registers merge by MAX, so unioning
    * emitted window sketches (`hll_union_agg`) gives exactly the
    * whole-stream sketch — and unlike summing per-window distinct
    * COUNTS, the union deduplicates across windows for free: a user
    * active in every window still counts once. State per window is one
    * fixed-size sketch (2^lgK registers), independent of user
    * cardinality — the q119 rollup posture running at ingest.
    */
  def windowedHll(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", lgK: Int = 12): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
      .select(col("window.start").as("window_start"), col("sk"))

  /** The QUANTILE twin of [[windowedCms]]/[[windowedHll]]: per
    * event-time window, a fixed-width bucket histogram of `value` —
    * `bucket = clamp(floor(value / width), 0, nBuckets-1)` — emitted
    * as sparse (window_start, bucket, n) rows when the watermark
    * closes the window. Chosen over a randomized KLL-style sketch
    * deliberately: bucketing is a pure integer function of the value,
    * so the sketch is deterministic, cross-engine exact (the batch
    * twin q139 is hash-oracled against DuckDB), and LINEAR like CMS —
    * vector-adding window histograms IS the histogram of the union
    * stream, so hour→day→corpus rollups are KB-sized merges, never
    * re-reads, and any quantile reads off the merged cumulative walk
    * with error bounded by one bucket width.
    *
    * State per open window is ≤ nBuckets counters — bounded,
    * independent of event cardinality — evicted on close.
    */
  def windowedHistogram(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", width: Double = 50.0,
      nBuckets: Int = 32): DataFrame = {
    require(width > 0 && nBuckets >= 1, s"bad histogram: $width/$nBuckets")
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_),
        least(greatest(floor(col("value") / lit(width)), lit(0L)),
          lit(nBuckets - 1L)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("bucket"),
        col("n"))
  }

  /** Streaming exact dedup on event_id within the watermark horizon:
    * duplicates arriving inside the late-data bound are dropped; state
    * for ids older than the watermark is evicted (bounded memory —
    * the property a naive global `dropDuplicates` lacks on streams).
    */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Event-time sessionization: a session closes after `gapMinutes` of
    * silence per user (enforced via event-time timeout). Arbitrary
    * per-key state — the `flatMapGroupsWithState` tier of the custom-
    * operator preference order.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, s.n, s.total,
          new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last)))
      } else {
        val sorted = batch.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(SessionState(s.n + 1, s.total + e.value, s.start, t))
            case Some(s) =>
              closed += Session(userId, s.n, s.total,
                new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last))
              cur = Some(SessionState(1, e.value, t, t))
            case None =>
              cur = Some(SessionState(1, e.value, t, t))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** STREAMING funnel — [[graft.operators.TimeOps.funnel]]'s
    * mapGroupsWithState twin (the live conversion dashboard): a
    * per-user STAGE AUTOMATON advances on each qualifying event —
    * stage 0 anchors on the user's first stage-0 event, stage i
    * advances on the first stage-i event at/after the previous
    * anchor and within `windowSec` of the stage-0 anchor (the
    * whole-funnel window — the batch twin's pinned definition) —
    * emitting one [[FunnelHit]] per advancement. Within each
    * micro-batch the group's events process in event-time order
    * (the [[sessionize]] sort), so for in-order delivery the greedy
    * automaton's anchors ARE the batch twin's per-user minima — the
    * replay-equality the spec pins: per-stage distinct users equal
    * [[graft.operators.TimeOps.funnel]]'s counts on the same data.
    * State is one fixed-size triple per user (O(users), the
    * mapGroupsWithState contract); a user who completes the funnel
    * keeps a terminal state and emits nothing further. */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
                   windowSec: Long, watermark: String = "2 hours")
      : Dataset[FunnelHit] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct event types")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    import events.sparkSession.implicits._
    def fn(userId: Long, batch: Iterator[Event],
           state: GroupState[FunnelState]): Iterator[FunnelHit] = {
      val hits = Seq.newBuilder[FunnelHit]
      var cur = state.getOption
      batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
        cur match {
          case None if e.event_type == stages.head =>
            cur = Some(FunnelState(e.ts.getTime, e.ts.getTime, 0))
            hits += FunnelHit(userId, 0, e.ts)
          case Some(s) if s.idx < stages.size - 1 &&
              e.event_type == stages(s.idx + 1) &&
              e.ts.getTime >= s.tprev &&
              e.ts.getTime <= s.t0 + windowSec * 1000L =>
            cur = Some(FunnelState(s.t0, e.ts.getTime, s.idx + 1))
            hits += FunnelHit(userId, s.idx + 1, e.ts)
          case _ => ()
        }
      }
      cur.foreach(state.update)
      hits.result().iterator
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Micro-batch bulk-index sink: every trigger's data is appended to
    * the file-backed index in ES `_bulk` NDJSON form — the streaming
    * version of the reference's `POST /elastic/save/` path
    * (`elastic_controller.go:253-301`), with Spark's epoch tracking
    * standing in for the reference's at-most-once HTTP semantics.
    */
  def bulkIndexSink(events: DataFrame, indexDir: String, indexName: String,
                    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty)
          Indexer.bulkIndex(batch.toDF(), indexDir, indexName,
            Seq(col("event_id")), mode = "append")
        ()
      }
      .start()

  /** Streaming CDC ingest — the write half of the q143 time-travel
    * pair: every micro-batch of change rows (`op` ∈ {U, D} + payload)
    * lands as an IMMUTABLE log segment `batch=<epoch>/`. The write per
    * trigger is append-only at the log level but `overwrite` at the
    * segment level, so a replayed epoch (failure/retry under Spark's
    * epoch tracking) rewrites its own segment instead of duplicating
    * it — exactly-once log growth without a transaction coordinator.
    * [[graft.operators.Pipeline.replayLog]] folds the segments back
    * into any version's snapshot; nothing here ever rewrites the base
    * table, which is the property that makes CDC ingest O(batch) at a
    * 100 TB base.
    */
  def cdcLogSink(changes: DataFrame, logDir: String,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty)
          batch.coalesce(1).write.mode("overwrite")
            .parquet(s"$logDir/batch=$epoch")
        ()
      }
      .start()

  /** Streaming PERCOLATION sink — ES's percolator in its actual
    * deployment shape (alerting / saved-search notification): each
    * micro-batch of incoming documents percolates against the
    * REGISTERED query set ([[graft.operators.Search.percolate]]'s
    * conjunction semantics under the given analyzer chain) and the
    * (doc_id, query_id) matches land as an immutable
    * `batch=<epoch>/` log segment — [[cdcLogSink]]'s exactly-once
    * shape verbatim (per-epoch directory overwrite; a replayed epoch
    * rewrites identical bytes, its inputs being the batch and the
    * frozen registry). Downstream alert consumers read the match log
    * incrementally by epoch. Scale shape: per trigger one term
    * equi-join of batch × registry through shared vocabulary — the
    * registry tokenizes once per micro-batch, never per document. */
  def percolateSink(docs: DataFrame, queries: DataFrame,
      matchesDir: String, checkpoint: String,
      an: graft.operators.Analyzer.Chain =
        graft.operators.Analyzer.Whitespace)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty)
          graft.operators.Search.percolate(batch.toDF(), queries, an)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$matchesDir/batch=$epoch")
        ()
      }
      .start()

  /** Near-real-time search ingestion — Elasticsearch's refresh model
    * (the reference pushes documents into ES and they become
    * searchable at the next refresh, which in Lucene terms is "the
    * open segments so far"): every micro-batch of documents lands as
    * ONE immutable [[graft.operators.SegmentedIndex]] segment, made
    * visible by its atomic manifest commit — searches between
    * triggers see exactly the segments committed so far, never a
    * half-written batch.
    *
    * Exactly-once under Spark's epoch re-delivery: the segment is
    * keyed by the epoch id, and [[graft.operators.SegmentedIndex
    * .append]]'s manifest-membership check makes a replayed epoch a
    * no-op (the crash window between data publish and manifest
    * commit re-runs the rename onto the already-staged directory —
    * same segment, committed once). The batch-twin contract is q165's
    * append body — this is only the `foreachBatch` plumbing around
    * it, exactly the [[maintainedSummarySink]] pattern.
    *
    * `maxSegments > 0` folds ES's merge scheduler into the loop: after
    * each epoch's append, [[graft.operators.SegmentedIndex
    * .maybeMerge]] runs at that tier bound — the size-aware fold that
    * rewrites the CHEAPEST contiguous batches, so a long-running
    * stream's segment count (and with it every query's per-segment
    * plan fan-out and the manifest parse) stays bounded instead of
    * growing one segment per trigger forever. Running the merge
    * INSIDE `foreachBatch` keeps the single-manifest-writer contract
    * by construction (appends and merges serialize on the same
    * thread; a racing external writer would trip the generation
    * collision loudly). Exactly-once survives because a merge is
    * ALWAYS semantics-preserving: a crash between append-commit and
    * merge replays the epoch as a no-op append, and the re-run merge
    * adopts its own staged fold (same run members → same
    * fingerprint) or simply folds later — query results are
    * identical in every interleaving.
    */
  def searchIndexSink(docs: DataFrame, rootDir: String,
                      checkpoint: String, nBuckets: Int = 8,
                      maxSegments: Int = 0,
                      analyzer: String =
                        graft.operators.Analyzer.Whitespace.name)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty) {
          // the analyzer takes effect on the index's FIRST commit
          // only — later epochs inherit the manifest's chain (the
          // append contract), so a restarted stream can't drift
          graft.operators.SegmentedIndex.append(batch.sparkSession,
            rootDir, batch.toDF(), s"epoch=$epoch", nBuckets, analyzer)
          if (maxSegments > 0)
            graft.operators.SegmentedIndex.maybeMerge(
              batch.sparkSession, rootDir, maxSegments)
        }
        ()
      }
      .start()

  /** Streaming ingestion through a ROLLOVER alias — ES's ILM hot
    * phase in one loop: every micro-batch appends through the write
    * alias's CURRENT index and then [[graft.operators.SegmentedIndex
    * .rollover]] seals it and flips the alias once it holds
    * `maxDocs` (the O(1) manifest-header check) — the stream keeps
    * writing bounded, fresh indices while the sealed family stays
    * immutable and searchable through [[graft.operators
    * .SegmentedIndex.searchFamily]].
    *
    * Exactly-once composition: append's own batch-key membership
    * check only covers the index it TARGETS, and a crash after the
    * alias flip re-delivers the epoch to the NEW index — so the sink
    * asks the WHOLE FAMILY first ([[graft.operators.SegmentedIndex
    * .hasBatch]] over [[graft.operators.SegmentedIndex
    * .familyRoots]], an O(family) driver-side manifest parse): a
    * re-delivered epoch whose segment any member already holds is a
    * no-op, wherever the alias points now. The alias flip itself is
    * one atomic rename, idempotent under replay (rollover re-checks
    * the doc threshold against the already-rolled index and declines). */
  def rolloverIndexSink(docs: DataFrame, aliasPath: String,
                        checkpoint: String, maxDocs: Long,
                        nBuckets: Int = 8,
                        analyzer: String =
                          graft.operators.Analyzer.Whitespace.name)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty) {
          val key = s"epoch=$epoch"
          val held = graft.operators.SegmentedIndex
            .familyRoots(aliasPath)
            .exists { case (_, r) =>
              graft.operators.SegmentedIndex.hasBatch(r, key) }
          if (!held)
            graft.operators.SegmentedIndex.append(batch.sparkSession,
              graft.operators.SegmentedIndex.resolveAlias(aliasPath),
              batch.toDF(), key, nBuckets, analyzer)
          graft.operators.SegmentedIndex.rollover(aliasPath, maxDocs)
        }
        ()
      }
      .start()

  /** Streaming maintained TOP-K view sink — the NON-ABELIAN twin of
    * [[maintainedSummarySink]]: every change micro-batch lands as an
    * immutable log segment AND advances a versioned per-group top-`k`
    * view through [[graft.operators.Pipeline.absorbTopKBatch]]'s
    * shared per-epoch body (touched groups re-read from the pre-batch
    * snapshot — min/max/top-k cannot absorb deletes from the view
    * alone — untouched groups pass through). Same exactly-once
    * argument as the summary sink: per-epoch overwrites whose inputs
    * are bounded by id < epoch. q173 is the oracled batch twin.
    * `keepLast >= 2` additionally folds retention into the loop —
    * see [[maintainedSummarySink]]'s note.
    */
  def maintainedTopKSink(changes: DataFrame, base: DataFrame,
      logDir: String, viewDir: String, checkpoint: String,
      key: String, grp: String, v: String,
      k: Int, keepLast: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    require(keepLast == 0 || keepLast >= 2,
      s"streaming retention needs keepLast >= 2 (epoch-replay safety" +
        s" — the retried epoch's predecessor version must survive the" +
        s" prune): $keepLast")
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Pipeline.absorbTopKBatch(batch.toDF(), base,
            logDir, viewDir, key, grp, v, k, epoch)
          if (keepLast > 0)
            graft.operators.Pipeline.pruneSummaries(viewDir, keepLast)
        }
        ()
      }
      .start()
  }

  /** Streaming maintained-summary sink — the FULL streaming-lakehouse
    * loop, composing [[cdcLogSink]]'s exactly-once log growth with
    * [[graft.operators.Pipeline.maintainAgg]]'s O(batch) view upkeep:
    * every change micro-batch lands as an immutable `batch=<epoch>/`
    * log segment AND advances a versioned per-group (count, sum)
    * summary table `v=<epoch>/` — so downstream readers get (a) every
    * historical snapshot via
    * [[graft.operators.Pipeline.replayLog]], (b) a fresh materialized
    * aggregate at every epoch WITHOUT a corpus re-aggregation, and
    * (c) a summary history aligned with the log's versions.
    *
    * Exactly-once composition: Spark's epoch tracking re-delivers a
    * failed micro-batch with the same epoch id, and
    * [[graft.operators.Pipeline.absorbSummaryBatch]] makes the whole
    * epoch an idempotent pair of directory overwrites whose inputs
    * (log prefix, previous summary) are bounded by id < epoch —
    * EventStreamsSpec pins streamed-summary ≡ from-scratch
    * re-aggregation of the replayed log at EVERY version.
    *
    * `keepLast > 0` folds RETENTION into the loop (the
    * [[searchIndexSink]] merge-cadence pattern on the view tier):
    * after each epoch's absorb, [[graft.operators.Pipeline
    * .pruneSummaries]] keeps the newest `keepLast` version manifests
    * and reference-counts the shared bucket directories — a
    * long-running stream's version count stays bounded instead of
    * growing one manifest per trigger forever. `keepLast >= 2` is
    * required for epoch-replay safety (the retry of the one possibly
    * uncommitted epoch needs its predecessor version, see
    * [[graft.operators.Pipeline.pruneSummaries]]); running it inside
    * `foreachBatch` keeps pruning serialized with absorbs — the
    * single-writer posture this tier already assumes.
    */
  def maintainedSummarySink(changes: DataFrame, base: DataFrame,
      logDir: String, summaryDir: String, checkpoint: String,
      key: String, grp: String, v: String,
      keepLast: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    require(keepLast == 0 || keepLast >= 2,
      s"streaming retention needs keepLast >= 2 (epoch-replay safety" +
        s" — the retried epoch's predecessor version must survive the" +
        s" prune): $keepLast")
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epoch: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Pipeline.absorbSummaryBatch(batch.toDF(), base,
            logDir, summaryDir, key, grp, v, epoch)
          if (keepLast > 0)
            graft.operators.Pipeline.pruneSummaries(summaryDir, keepLast)
        }
        ()
      }
      .start()
  }

  /** Streaming twin of [[graft.operators.Dedup.decontaminate]]: flag
    * arriving documents that share any word n-gram with a fixed
    * benchmark — decontamination AT INGEST, before a contaminated doc
    * ever lands in the corpus.
    *
    * The benchmark's gram digests (from
    * [[graft.operators.Dedup.benchmarkDigests]] — eval-set-sized by
    * construction) ride the plan as ONE array literal, so the probe is
    * a per-row `array_intersect` against a constant: STATELESS, no
    * watermark, no streaming aggregation, no shuffle — append mode with
    * zero state store, the strongest posture a streaming operator can
    * have. `n_hit_grams` (distinct grams hit) matches the batch
    * operator exactly; per-benchmark-doc attribution (`n_bench_docs`)
    * is deliberately absent — it needs the gram→doc map, which is the
    * batch audit's job, not the ingest filter's.
    */
  def decontaminateStream(docs: DataFrame, benchDigests: Seq[String],
      n: Int = 4): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= n)
      .withColumn("grams",
        expr(graft.operators.Dedup.gramDigestArrayExpr(n)))
      .withColumn("n_hit_grams",
        size(array_intersect(col("grams"), typedLit(benchDigests)))
          .cast("long"))
      .filter(col("n_hit_grams") > 0)
      .select("doc_id", "n_hit_grams")

  /** Stream-static enrichment: join the event stream against a batch
    * dimension (the reference-shaped use: tag each indexed event with
    * its user's attributes). The static side is re-planned per
    * micro-batch — broadcast when small — and needs no watermark; this
    * is the streaming analogue of the q03 broadcast-dimension join.
    */
  def enriched(events: DataFrame, users: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(users),
      events("user_id") === users("c_custkey"), "left")

  /** Stream-stream interval join: correlate two event streams per user
    * within a bounded event-time window (right event within 0..maxGap
    * AFTER the left event). Both sides carry watermarks so the join
    * state is evicted once the interval can no longer match — the
    * condition that keeps a stream-stream join's state finite at any
    * scale (an unbounded-interval join would accumulate forever).
    */
  def intervalJoin(clicks: DataFrame, views: DataFrame,
                   maxGapMinutes: Int = 10,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val r = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user_id"), col("ts").as("view_ts"))
    l.join(r,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") +
          expr(s"INTERVAL $maxGapMinutes MINUTES"))
      .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
  }

  /** [[intervalJoin]] with LEFT OUTER semantics: a click that sees no
    * view inside its interval still emits — view columns null — but
    * only once the WATERMARK proves no matching view can still
    * arrive (the outer row is a negative claim; emitting it earlier
    * could be contradicted by a late view). Same bounded-state
    * posture as the inner join: both sides' state evicts at the
    * watermark, so "no match" is decidable in finite state at any
    * stream length — the streaming analogue of q06's outer-join
    * semantics on the q63 interval shape.
    */
  def intervalJoinOuter(clicks: DataFrame, views: DataFrame,
                        maxGapMinutes: Int = 10,
                        watermark: String = "30 minutes"): DataFrame = {
    val l = clicks.withWatermark("ts", watermark)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val r = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"),
        col("user_id").as("v_user_id"), col("ts").as("view_ts"))
    l.join(r,
      col("user_id") === col("v_user_id") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") +
          expr(s"INTERVAL $maxGapMinutes MINUTES"),
      "left_outer")
      .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
  }

  /** Streaming near-dup CANDIDATE detection — the streaming twin of
    * [[graft.operators.Dedup.incrementalNearDups]]: every arriving doc
    * is shingled and min-hashed PER ROW (scalar expressions, no
    * streaming aggregate needed), banded, and grouped by
    * (band_id, band_key); [[flatMapGroupsWithState]] keeps each
    * bucket's resident doc ids as state and emits one candidate pair
    * per (arrival, resident) — the bucket-local join that cannot wait
    * for a batch window. Exact Jaccard verification stays a batch
    * concern over the emitted pairs ([[graft.operators.Dedup.verifyJaccard]]),
    * exactly as in the batch two-phase design.
    *
    * Signature arithmetic matches the batch path bit-for-bit
    * (xxhash64 base fold + the [[graft.operators.TextOps.permHashExpr]]
    * family), so stream-emitted candidates are a superset-compatible
    * feed into the same verification (spec asserts equality with
    * [[graft.operators.Dedup.lshCandidates]] on a replay).
    *
    * State per bucket is capped at `maxPerBucket` resident ids (a giant
    * duplicate cluster would otherwise grow one bucket's state — and
    * its per-arrival fan-out — without bound; residents beyond the cap
    * stop acquiring NEW pair edges, which connected-components closure
    * downstream absorbs). State never times out by default: dedup
    * is against the full corpus history, the deliberate opposite of the
    * watermark-bounded operators above — bound it by cap, not by time.
    */
  def nearDupCandidates(docs: Dataset[StreamDoc], k: Int = 64,
                        bands: Int = 16, maxPerBucket: Int = 64)
      : Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val rows = k / bands
    val P = graft.operators.TextOps.PermP
    // per-row signature: sig[i] = min over shingles of perm_i(base(s));
    // base = xxhash64 folded into [0, P) — Dedup.xxBaseHash verbatim
    val sigExpr = s"transform(sequence(0, ${k - 1}), i -> " +
      "array_min(transform(shingles, s -> " +
      graft.operators.TextOps.permHashExpr(
        s"(((xxhash64(s) % ${P}L) + ${P}L) % ${P}L)", "i") + ")))"
    val withSig = docs.toDF()
      .withColumn("toks", graft.operators.TextOps.tokens("text"))
      .withColumn("shingles",
        expr(graft.operators.TextOps.shingleExpr("toks", 3)))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", expr(sigExpr))
    // the SAME banding as the batch path (Dedup.bandedSigs) — the
    // replay-equality spec depends on the band keys never diverging
    val banded = graft.operators.Dedup.bandedSigs(withSig, bands, rows)
      .select("band_id", "band_key", "doc_id")
      .as[DocBand]
    def fn(key: (Int, String), arrivals: Iterator[DocBand],
           state: GroupState[BucketState]): Iterator[CandidatePair] = {
      var resident = state.getOption.map(_.ids).getOrElse(Nil)
      val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
      arrivals.foreach { a =>
        resident.foreach { r =>
          if (r != a.doc_id)
            out += CandidatePair(math.min(r, a.doc_id), math.max(r, a.doc_id))
        }
        if (resident.size < maxPerBucket && !resident.contains(a.doc_id))
          resident = a.doc_id :: resident
      }
      state.update(BucketState(resident))
      out.distinct.iterator
    }
    banded
      .groupByKey(b => (b.band_id, b.band_key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming degree maintenance — the streaming twin of the
    * [[graft.operators.GraphOps]] degree computation. The batch twin
    * defines degree over DISTINCT CANONICAL edges (`src < dst`, no
    * self-loops), so the stream must too: each arriving edge is
    * canonicalized (`least`/`greatest`, self-loops dropped) and passed
    * through a stateful `dropDuplicates` keyed by the canonical pair —
    * an at-least-once source redelivering an edge, or delivering it
    * flipped, leaves the degrees unchanged. Then ONE stateful
    * aggregation keyed by vertex id maintains the running counts
    * (state = one long per vertex, hash-partitioned — the same key
    * distribution the batch `groupBy` shuffles on, so the twin scales
    * exactly as far; dedup state is one row per distinct edge,
    * edge-partitioned). The same plan runs unchanged on a batch frame;
    * the replay spec asserts stream-end state equals
    * [[graft.operators.GraphOps.triangleStats]]'s degree column under
    * duplicate and flipped redelivery. Like near-dup residency (and
    * unlike the watermarked operators above), degree — and the edge
    * dedup backing it — is corpus-lifetime state: bound it by
    * partitioning, not by time.
    */
  def degreeCounts(edges: DataFrame): DataFrame =
    canonicalEdges(edges)
      .dropDuplicates("a", "b")
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** Canonical undirected edges — (min, max) as (a, b), self-loops
    * dropped: the normalization every graph twin in this file shares.
    */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))

  /** Each canonical edge routed to BOTH endpoint groups as (v, w). */
  private def routedByEndpoint(edges: DataFrame): Dataset[(Long, Long)] = {
    import edges.sparkSession.implicits._
    canonicalEdges(edges)
      .select(explode(array(
        struct(col("a").as("v"), col("b").as("w")),
        struct(col("b").as("v"), col("a").as("w")))).as("r"))
      .select(col("r.v").as("v"), col("r.w").as("w"))
      .as[(Long, Long)]
  }

  /** Streaming wedge maintenance — the incremental half of the
    * [[graft.operators.GraphOps.triangleStats]] twin. Each arriving edge
    * is canonicalized (self-loops dropped) and routed to BOTH endpoint
    * groups; per-vertex state is the adjacency list, and a NEW neighbor
    * emits one [[Wedge]] per existing neighbor — redeliveries (exact or
    * flipped) are already resident and emit nothing, so an
    * at-least-once source leaves the wedge set unchanged. Over any
    * arrival order the final output is exactly one wedge per
    * `(vertex, neighbor pair)` — in particular 3 wedges per triangle,
    * one per corner — so closing wedges against the edge set
    * ([[triangleCountsOf]]) reproduces the batch per-vertex triangle
    * counts; the replay spec asserts that equality under duplicate and
    * flipped redelivery.
    *
    * Scale shape: state is hash-partitioned by vertex id (one adjacency
    * list per vertex, corpus-lifetime — like near-dup residency, bound
    * it by partitioning, not time). Per-arrival emission is O(deg) —
    * the inherent cost of EXACT incremental wedge maintenance (a
    * forgotten neighbor is a missed triangle), so total emission is
    * Σ C(deg,2) where the batch twin's degree orientation caps it at
    * O(m^1.5); that gap is the price of online results. For hub-heavy
    * graphs where it matters, sample or cap adjacency as
    * [[nearDupCandidates]] caps residency and treat counts as lower
    * bounds — the exact twin stays the default.
    */
  def wedgeStream(edges: DataFrame): Dataset[Wedge] = {
    import edges.sparkSession.implicits._
    def fn(v: Long, arrivals: Iterator[(Long, Long)],
           state: GroupState[AdjState]): Iterator[Wedge] = {
      var nbrs = state.getOption.map(_.nbrs).getOrElse(Nil)
      // O(1) membership: redeliveries must not pay an O(deg) list walk
      // (on a hub, a duplicate-heavy stream would otherwise make the
      // no-op dedup check as costly as worst-case emission)
      val seen = scala.collection.mutable.HashSet.empty[Long]
      seen ++= nbrs
      val out = scala.collection.mutable.ArrayBuffer.empty[Wedge]
      arrivals.foreach { case (_, w) =>
        if (seen.add(w)) {
          nbrs.foreach { x =>
            out += Wedge(v, math.min(x, w), math.max(x, w))
          }
          nbrs = w :: nbrs
        }
      }
      state.update(AdjState(nbrs))
      out.iterator
    }
    routedByEndpoint(edges).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Hub-capped variant of [[wedgeStream]] — the bounded-memory,
    * bounded-emission posture for adversarial (hub-heavy) graphs.
    *
    * [[wedgeStream]] is exact and therefore pays Σ C(deg, 2) emission
    * and O(deg) state at every vertex: one 10M-degree hub in a 100 TB
    * web graph means a 10M-entry adjacency list in one state-store key
    * and ~5·10¹³ wedges from that key alone. This variant caps the
    * resident adjacency at `cap` neighbors per vertex:
    *
    *  - a vertex whose final canonical degree is ≤ `cap` can never
    *    saturate (only DISTINCT new neighbors grow the list), so its
    *    wedges — and its closed triangle counts — are exactly the
    *    uncapped twin's, independent of arrival order;
    *  - a (cap+1)-th distinct neighbor emits a one-time saturation
    *    MARKER row instead of wedges, and further new neighbors are
    *    dropped: that center's counts become deterministic lower
    *    bounds over the first-`cap` arrivals, its state stays O(cap),
    *    and its total emission is bounded by C(cap, 2);
    *  - redeliveries (exact or flipped) and self-loops emit nothing,
    *    saturated or not — at-least-once sources stay safe.
    *
    * No sampling, no RNG: the kept set is the arrival prefix, so a
    * replay of the same stream reproduces the same output bit-for-bit.
    * Close with [[cappedTriangleCountsOf]], which surfaces the marker
    * as a per-vertex `lower_bound` flag. The exact twin stays the
    * default; this is the switch a 100 TB deployment flips when hub
    * state or emission becomes the bottleneck.
    */
  def wedgeStreamCapped(edges: DataFrame, cap: Int): Dataset[CappedWedge] = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    import edges.sparkSession.implicits._
    def fn(v: Long, arrivals: Iterator[(Long, Long)],
           state: GroupState[CapAdjState]): Iterator[CappedWedge] = {
      val st = state.getOption.getOrElse(CapAdjState(Nil, sat = false))
      var nbrs = st.nbrs
      var sat = st.sat
      var size = nbrs.size
      val seen = scala.collection.mutable.HashSet.empty[Long]
      seen ++= nbrs
      val out = scala.collection.mutable.ArrayBuffer.empty[CappedWedge]
      arrivals.foreach { case (_, w) =>
        if (!seen.contains(w)) {
          if (size < cap) {
            nbrs.foreach { x =>
              out += CappedWedge(v, math.min(x, w), math.max(x, w),
                saturated = false)
            }
            nbrs = w :: nbrs
            seen += w
            size += 1
          } else if (!sat) {
            out += CappedWedge(v, -1L, -1L, saturated = true)
            sat = true
          }
        }
      }
      state.update(CapAdjState(nbrs, sat))
      out.iterator
    }
    routedByEndpoint(edges).groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Close streamed wedges against the (canonical, distinct) edge set:
    * a wedge is a triangle iff its outer pair is an edge. One hash
    * semi-join on `(a, b)` + one vertex-keyed count — per-vertex
    * triangle counts identical to
    * [[graft.operators.GraphOps.triangleStats]]'s `n_triangles`.
    */
  def triangleCountsOf(wedges: DataFrame, edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).distinct()
    wedges.join(canon, Seq("a", "b"), "left_semi")
      .groupBy("center").agg(count(lit(1)).as("n_triangles"))
      .select(col("center").as("node_id"), col("n_triangles"))
  }

  /** Close a [[wedgeStreamCapped]] output: wedge rows close exactly as
    * [[triangleCountsOf]]; marker rows become a per-vertex
    * `lower_bound` flag (true ⇒ that count covers only the first-`cap`
    * arrival prefix and the true count may be higher). A saturated
    * vertex with no closed wedges still appears, with count 0.
    * Output: (node_id, n_triangles, lower_bound).
    */
  def cappedTriangleCountsOf(wedges: DataFrame,
                             edges: DataFrame): DataFrame = {
    val canon = canonicalEdges(edges).distinct()
    val closed = wedges.filter(!col("saturated"))
      .join(canon, Seq("a", "b"), "left_semi")
      .groupBy("center").agg(count(lit(1)).as("n_triangles"))
    // rename the marker-side key: both branches share the streamed
    // frame's lineage and an eponymous join would self-conflict
    val marks = wedges.filter(col("saturated"))
      .select(col("center").as("sat_center")).distinct()
    closed.join(marks, col("center") === col("sat_center"), "full_outer")
      .select(coalesce(col("center"), col("sat_center")).as("node_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        col("sat_center").isNotNull.as("lower_bound"))
  }

  /** Horvitz–Thompson-corrected per-vertex triangle estimate over a
    * [[wedgeStreamCapped]] output — the unbiased companion to (never a
    * replacement for) the deterministic `lower_bound`.
    *
    * A saturated center kept the first `cap` DISTINCT arrivals of its
    * deg(v) true neighbors. When arrival order is exchangeable (any
    * permutation equally likely — a shuffled replay or hash-ordered
    * shard merge qualifies; an adversarially sorted feed does not),
    * that kept set is a uniform cap-subset of the neighbors, so a
    * given neighbor PAIR survives with inclusion probability
    * p = cap·(cap−1) / (deg·(deg−1)) and `closed / p` is unbiased for
    * the true triangle count at v. Unsaturated vertices pass through
    * exact (p = 1). Variance: `closed` is a sum of T_v negatively
    * correlated Bernoulli(p) indicators, so Var[est] ≤ T_v·(1−p)/p
    * ⇒ relative σ ≤ sqrt((1−p)/(p·T_v)) — tighten by raising cap
    * (the spec realizes ~23% σ at cap 60 / deg 200). deg(v) comes
    * exact from [[degreeCounts]] over the same edge stream — an
    * O(1)-per-vertex counter that never saturates, so the correction
    * needs no extra state class.
    *
    * Output: (node_id, n_triangles, lower_bound, est_triangles) —
    * the deterministic bound stays authoritative; `est_triangles`
    * annotates it.
    */
  def cappedTriangleEstimate(wedges: DataFrame, edges: DataFrame,
                             cap: Int): DataFrame = {
    require(cap >= 2, s"pair estimation needs cap >= 2, got $cap")
    val base = cappedTriangleCountsOf(wedges, edges)
    val degs = degreeCounts(edges)
    base.join(degs, base("node_id") === degs("v"), "left")
      .select(base("node_id"), col("n_triangles"), col("lower_bound"),
        when(!col("lower_bound"), col("n_triangles").cast("double"))
          .otherwise(col("n_triangles").cast("double") *
            (col("deg") * (col("deg") - lit(1L))).cast("double") /
            lit((cap.toLong * (cap - 1L)).toDouble))
          .as("est_triangles"))
  }

  /** Open the events table as a file stream (one-file-per-trigger going
    * forward; the batch fixtures replay as a bounded stream). Applies
    * the same TIMESTAMP(NANOS) → microsecond truncation as
    * [[graft.engine.Tables.table]].
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet") // schema only
    // FileStreamSource wants a directory: stream the sf dir filtered to
    // the events file(s).
    val stream = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else stream
  }
}
