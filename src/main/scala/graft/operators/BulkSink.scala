package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator

/** Live bulk-sink semantics — the executor-side mechanics of the
  * reference's ES bulk path, reproduced faithfully and testably without
  * a cluster to talk to:
  *
  *  - byte-threshold flush: buffer serialized docs until `flushBytes`,
  *    then ship one batch (reference: 5 MB, `api/controllers/
  *    elastic_controller.go:46,148`);
  *  - bounded retries with exponential backoff on retryable failures
  *    (reference: max 5, cenkalti/backoff on HTTP 429/502/503/504,
  *    `elastic_controller.go:52-64`);
  *  - lock-free success/failure accounting (reference: `atomic.AddUint64`
  *    in OnSuccess, `elastic_controller.go:37,211` → Spark
  *    `LongAccumulator`s, which are exactly that across executors);
  *  - workers = partitions (reference: NumCPU goroutines,
  *    `elastic_controller.go:45`).
  *
  * The destination is a [[BulkTransport]] — an ES `_bulk` HTTP client in
  * production, a controllable in-memory/file transport in tests. The
  * factory is a `Serializable` thunk created per partition, so
  * connection state lives executor-side and is amortized per task.
  */
object BulkSink {

  /** One bulk destination connection. `send` throws [[RetryableFailure]]
    * for transient errors (the 429/502/503/504 class) and any other
    * exception for permanent ones.
    */
  trait BulkTransport extends AutoCloseable {
    def send(batch: Seq[String]): Unit
    override def close(): Unit = ()
  }

  /** Transient sink failure — eligible for backoff+retry. */
  final class RetryableFailure(msg: String) extends RuntimeException(msg)

  final case class SinkStats(flushed: Long, failedBatches: Long,
                             retries: Long, batches: Long,
                             durationMs: Long,
                             failedDocs: Long = 0L) {
    def docsPerSec: Double = flushed * 1000.0 / math.max(1L, durationMs)
  }

  /** Stream `docs` (one serialized doc per row, single string column)
    * into the transport with byte-budgeted batching and bounded
    * exponential-backoff retry.
    *
    * Failure semantics are two-mode, mirroring the reference's split
    * between OnFailure accounting (`elastic_controller.go:215-229`:
    * log, count, keep going) and request failure:
    *  - `continueOnError = false` (default): a batch that exhausts its
    *    retries throws — Spark then retries the task
    *    (`spark.task.maxFailures`) and the job fails only after both
    *    budgets are spent (all-or-nothing).
    *  - `continueOnError = true`: a permanently-failing batch is
    *    counted (`failedBatches` / `failedDocs` accumulators — the
    *    Spark twin of the reference's `atomic.AddUint64` failure
    *    counters) and the job completes, reporting the losses.
    */
  def write(docs: DataFrame,
            transportFactory: () => BulkTransport,
            flushBytes: Long = 5000000L,
            maxRetries: Int = 5,
            backoffMs: Long = 10L,
            continueOnError: Boolean = false): SinkStats = {
    val spark = docs.sparkSession
    val flushedAcc = spark.sparkContext.longAccumulator("bulk.flushed")
    val retriesAcc = spark.sparkContext.longAccumulator("bulk.retries")
    val batchesAcc = spark.sparkContext.longAccumulator("bulk.batches")
    val failedBatchesAcc = spark.sparkContext.longAccumulator("bulk.failedBatches")
    val failedDocsAcc = spark.sparkContext.longAccumulator("bulk.failedDocs")
    val t0 = System.nanoTime()
    val ds = docs.toDF("doc")
    ds.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val transport = transportFactory()
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var bufBytes = 0L
        def flush(): Unit = if (buf.nonEmpty) {
          try {
            sendWithRetry(transport, buf.toSeq, maxRetries, backoffMs, retriesAcc)
            flushedAcc.add(buf.size)
          } catch {
            case scala.util.control.NonFatal(_) if continueOnError =>
              failedBatchesAcc.add(1)
              failedDocsAcc.add(buf.size)
          }
          batchesAcc.add(1)
          buf.clear()
          bufBytes = 0L
        }
        rows.foreach { r =>
          val doc = r.getString(0)
          buf += doc
          bufBytes += doc.length
          if (bufBytes >= flushBytes) flush()
        }
        flush()
      } finally transport.close()
    }
    val ms = (System.nanoTime() - t0) / 1000000L
    SinkStats(flushedAcc.value, failedBatchesAcc.value, retriesAcc.value,
      batchesAcc.value, ms, failedDocsAcc.value)
  }

  private def sendWithRetry(transport: BulkTransport, batch: Seq[String],
                            maxRetries: Int, backoffMs: Long,
                            retries: LongAccumulator): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        transport.send(batch)
        done = true
      } catch {
        case e: RetryableFailure =>
          attempt += 1
          if (attempt > maxRetries) throw e
          retries.add(1)
          Thread.sleep(backoffMs << (attempt - 1)) // exponential backoff
      }
    }
  }
}
