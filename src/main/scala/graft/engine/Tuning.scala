package graft.engine

import org.apache.spark.sql.SparkSession

/** Session knob the engine's sketch aggregates depend on.
  *
  * `minhash_agg` / `simhash_agg` are `TypedImperativeAggregate`s, so
  * they execute under `ObjectHashAggregateExec`, which falls back to
  * SORT-based aggregation once a task holds
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * aggregation buffers — and Spark's default is 128. Grouping by
  * `doc_id` is high-cardinality (thousands of groups per partition at
  * any realistic scale), so under the default every sketch aggregation
  * silently degrades into a full sort of its exploded token rows —
  * measured as the q32/q34 driver-bench instability in rounds 2–3.
  *
  * The sketch buffers are small and fixed-size (simhash: 64 longs ≈
  * 0.5 KB; minhash: k longs), so 128Ki buffers ≈ 64–128 MB per task —
  * within executor budgets at 100 TB shuffle-partition sizing — and the
  * hash path stays hash. Applied by every engine entry point's session
  * builder and, defensively, by [[graft.functions.GraftFunctions
  * .register]] when the session still has the Spark default.
  */
object Tuning {
  val ObjectAggFallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val ObjectAggFallbackEntries: Int = 128 * 1024

  /** Keep bucketed layouts authoritative: with auto-bucketed-scan on,
    * Spark may discard a table's bucketing when it judges it unhelpful,
    * which also discards the bucket PRUNING that
    * [[graft.operators.Search.phraseSearchIndexed]] and the persisted
    * TF-IDF index rely on (a k-term phrase reads k buckets, not the
    * table). Session-wide so every query in a suite plans under ONE
    * config — a mid-suite per-operator flip would make later queries'
    * timings incomparable to earlier ones.
    */
  val AutoBucketedScanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"

  /** Read parquet naive (isAdjustedToUTC=false) timestamps as
    * TIMESTAMP, not TIMESTAMP_NTZ. The fixture generator writes plain
    * `timestamp[us]` columns; under Spark 4's NTZ inference those
    * become TIMESTAMP_NTZ, which cannot carry a streaming watermark
    * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), cannot cast to BIGINT
    * epoch seconds, and diverges from the instant semantics every
    * oracle comparison was verified under. Sessions here run in UTC,
    * where the two readings denote the same wall-clock values — this
    * knob just keeps the engine-facing type stable.
    */
  val InferTimestampNtzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config(ObjectAggFallbackKey, ObjectAggFallbackEntries.toString)
      .config(AutoBucketedScanKey, "false")
      .config(InferTimestampNtzKey, "false")

  /** Apply both knobs on a live session iff the user never set them —
    * never overrides an explicit user setting. "Explicitly set" is
    * membership in `spark.conf.getAll` (the session's settings map,
    * which holds only set entries, not registered defaults): comparing
    * against the default VALUE would clobber a user who deliberately
    * set a knob back to its default.
    */
  def ensure(spark: SparkSession): Unit = {
    val explicitlySet = spark.conf.getAll.keySet
    if (!explicitlySet.contains(ObjectAggFallbackKey))
      spark.conf.set(ObjectAggFallbackKey, ObjectAggFallbackEntries.toString)
    if (!explicitlySet.contains(AutoBucketedScanKey))
      spark.conf.set(AutoBucketedScanKey, "false")
    if (!explicitlySet.contains(InferTimestampNtzKey))
      spark.conf.set(InferTimestampNtzKey, "false")
  }
}
