package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.SparkException

import graft.SparkSpec
import graft.operators.BulkSink.{BulkTransport, RetryableFailure}

/** File-backed test transport: each send appends one line per doc to a
  * per-partition file; a shared fail-countdown file makes the first N
  * sends across the job fail retryably (executor-side state must live
  * on disk — the closure is serialized per task).
  */
object TestTransports {
  def fileTransport(dir: String, failFirst: Int = 0): () => BulkTransport =
    () => new BulkTransport {
      private val id = java.util.UUID.randomUUID().toString
      override def send(batch: Seq[String]): Unit = {
        if (failFirst > 0) {
          val marker = Paths.get(dir, "failures-remaining")
          synchronized {
            val left =
              if (Files.exists(marker)) Files.readString(marker).trim.toInt
              else failFirst
            if (left > 0) {
              Files.writeString(marker, (left - 1).toString)
              throw new RetryableFailure(s"transient, $left left")
            }
          }
        }
        Files.write(Paths.get(dir, s"part-$id.ndjson"),
          (batch.mkString("\n") + "\n").getBytes,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }

  /** Transport where any batch containing a "poison" doc fails
    * PERMANENTLY (non-retryable) — exercises continue-on-error
    * accounting.
    */
  def poisonTransport(dir: String): () => BulkTransport =
    () => new BulkTransport {
      private val id = java.util.UUID.randomUUID().toString
      override def send(batch: Seq[String]): Unit = {
        if (batch.exists(_.contains("poison")))
          throw new RuntimeException("permanent mapping failure")
        Files.write(Paths.get(dir, s"part-$id.ndjson"),
          (batch.mkString("\n") + "\n").getBytes,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
}

class BulkSinkSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => s"""{"id":$i,"body":"${"x" * 50}"}""").toDF("doc")

  private def written(dir: String): Seq[String] =
    new File(dir).listFiles().filter(_.getName.endsWith(".ndjson"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines()).toSeq

  test("byte-threshold flush produces multiple batches per partition") {
    val dir = Files.createTempDirectory("bulk-flush").toString
    val stats = BulkSink.write(docs(100).repartition(2),
      TestTransports.fileTransport(dir), flushBytes = 500L)
    assert(stats.flushed == 100L)
    assert(stats.batches > 10L, s"batches=${stats.batches}") // ~7 docs/batch
    assert(written(dir).length == 100)
    assert(stats.docsPerSec > 0)
  }

  test("retryable failures back off and eventually succeed") {
    val dir = Files.createTempDirectory("bulk-retry").toString
    val stats = BulkSink.write(docs(20).repartition(1),
      TestTransports.fileTransport(dir, failFirst = 3),
      flushBytes = 100000L, maxRetries = 5, backoffMs = 1L)
    assert(stats.flushed == 20L)
    assert(stats.retries == 3L)
    assert(written(dir).length == 20)
  }

  test("exhausted retries fail the job (no silent data loss)") {
    val dir = Files.createTempDirectory("bulk-fail").toString
    assertThrows[SparkException] {
      BulkSink.write(docs(5).repartition(1),
        TestTransports.fileTransport(dir, failFirst = 1000),
        flushBytes = 100000L, maxRetries = 2, backoffMs = 1L)
    }
  }

  test("continue-on-error: failed batches are counted, job completes") {
    val dir = Files.createTempDirectory("bulk-poison").toString
    // every ~7-doc batch containing a multiple of 10 carries "poison"
    val mixed = (1 to 100)
      .map(i => if (i % 10 == 0) s"""{"id":$i,"tag":"poison"}"""
                else s"""{"id":$i,"body":"${"x" * 50}"}""")
      .toDF("doc")
    val stats = BulkSink.write(mixed.repartition(2),
      TestTransports.poisonTransport(dir), flushBytes = 400L,
      continueOnError = true)
    assert(stats.failedBatches > 0L, s"stats=$stats")
    assert(stats.failedDocs > 0L)
    assert(stats.flushed + stats.failedDocs == 100L, s"stats=$stats")
    assert(written(dir).length.toLong == stats.flushed)
    assert(written(dir).forall(!_.contains("poison")))
  }

  test("without continue-on-error, a permanent failure fails the job") {
    val dir = Files.createTempDirectory("bulk-poison-strict").toString
    val mixed = (1 to 20)
      .map(i => if (i == 10) s"""{"id":$i,"tag":"poison"}"""
                else s"""{"id":$i}""").toDF("doc")
    assertThrows[SparkException] {
      BulkSink.write(mixed.repartition(1),
        TestTransports.poisonTransport(dir), flushBytes = 100000L)
    }
  }

  test("end-to-end: query result → JSON docs → transport") {
    val dir = Files.createTempDirectory("bulk-e2e").toString
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .filter($"o_totalprice" > 300000)
    val jsonDocs = Indexer.toJsonDocs(orders).toDF("doc")
    val stats = BulkSink.write(jsonDocs, TestTransports.fileTransport(dir))
    assert(stats.flushed == orders.count())
    assert(written(dir).forall(_.contains("\"o_orderkey\":")))
  }
}
