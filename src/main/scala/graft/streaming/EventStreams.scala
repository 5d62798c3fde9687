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
