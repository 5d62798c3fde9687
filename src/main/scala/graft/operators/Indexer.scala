package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Observation, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Document-indexing sink — the Spark-native rebuild of the reference's
  * Elasticsearch bulk path (`api/controllers/elastic_controller.go`):
  *
  *  - O8 (HTTP self-call extraction, elastic_controller.go:103-140)
  *    disappears: the DataFrame flows from query to sink in-process,
  *    never serialized to JSON and re-parsed, never buffered on one node.
  *    The reference's full materialization (`[]string`, :118,136) is its
  *    scale ceiling; here every step below is executed per-partition on
  *    executors.
  *  - O9 row→JSON: `to_json(struct(*))` — whole-stage-codegen'd, one JSON
  *    object string per row, exactly the shape `json.Marshal` of a row map
  *    produced.
  *  - O11 index lifecycle (exists/create, :161-181): `SaveMode` semantics
  *    of the DataFrameWriter (create-if-absent / append / overwrite).
  *  - O12 parallel batched workers (NumCPU workers, 5 MB flush, :143-158):
  *    Spark tasks ARE the workers; `numWorkers` maps to partition count and
  *    flush bytes to per-file size.
  *  - O13 sequential 1-based DocumentID (`strconv.Itoa(i+1)`, :204):
  *    `row_number()` over an explicit total order.
  *  - O14 stats (:236-249): {flushed, failed, duration, docs/sec} computed
  *    with the `Observation` API — counted during the SAME pass as the
  *    write, no second job.
  */
object Indexer {

  /** Mirror of the reference's bulk-stats record (elastic_controller.go:236-249,
    * log format api/logger/logger.go:38-39).
    */
  final case class IndexStats(numFlushed: Long, numFailed: Long,
                              durationMs: Long, docsPerSec: Double) {
    def jsonLine: String =
      s"""{"docs":$numFlushed,"errors":$numFailed,"duration_ms":$durationMs,"docs_per_sec":$docsPerSec}"""
  }

  /** O13: assign dense 1-based `_id` in the order given by `orderBy`.
    *
    * Exact parity with the reference's sequential ids. A single
    * `row_number()` over an un-partitioned window funnels all rows through
    * one task — fine for result sets a human indexes into ES, wrong for
    * 100 TB. Use [[withScalableDocIds]] for the distributed id assignment.
    */
  def withDocIds(df: DataFrame, orderBy: Seq[Column]): DataFrame =
    df.withColumn("_id", row_number().over(Window.orderBy(orderBy: _*)).cast(LongType))

  /** O13 at scale: dense 1-based ids without a single-task window.
    *
    * Range-repartition on the order keys (distributed sort), then compute
    * per-partition offsets with one tiny count pass and add the local row
    * index. Equivalent output to [[withDocIds]], but every stage is
    * parallel; the only driver-side data is one Long per partition.
    */
  def withScalableDocIds(df: DataFrame, orderBy: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex {
      case (i, it) => Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val withId = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = offsets(i)
      it.map { r => n += 1; Row.fromSeq(r.toSeq :+ n) }
    }
    spark.createDataFrame(withId,
      StructType(sorted.schema.fields :+ StructField("_id", LongType, nullable = false)))
  }

  /** O9: one JSON object string per row (column-name keyed), streamed
    * per-partition — the reference's `json.Marshal(row)` loop
    * (elastic_controller.go:129-137) without the driver-side buffer.
    */
  def toJsonDocs(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.map(col): _*)).as("doc")).as[String]
  }

  /** O12+O13+O14: bulk-index `df` into a file-backed index.
    *
    * Output is ES `_bulk`-shaped NDJSON: for every row an action line
    * `{"index":{"_index":name,"_id":N}}` followed by the document source —
    * the exact wire format `esutil.BulkIndexer` emits
    * (elastic_controller.go:196-229), replayable against a live cluster.
    *
    * `numWorkers` = output partitions (the reference's NumCPU goroutines,
    * :45); file sizing replaces the 5 MB flush threshold (:46,148).
    */
  def bulkIndex(df: DataFrame, indexDir: String, indexName: String,
                orderBy: Seq[Column], numWorkers: Int = 0,
                mode: String = "errorifexists"): IndexStats = {
    // Defense in depth below the HTTP gate's [A-Za-z0-9_-]+ check: the
    // name is spliced into both the output PATH (a traversal-shaped
    // name + overwrite mode would destroy the target directory) and the
    // JSON action line (a quote/backslash would corrupt every action).
    require(indexName.nonEmpty && !indexName.contains("/") &&
      !indexName.contains("\\") && !indexName.contains("\"") &&
      !indexName.contains("..") && !indexName.exists(_.isControl),
      s"unsafe indexName: $indexName")
    val withId = withDocIds(df.drop("_id"), orderBy)
    val docCols = withId.columns.filter(_ != "_id").map(col)
    val lines = withId.select(concat(
      lit(s"""{"index":{"_index":"$indexName","_id":"""),
      col("_id"), lit("}}\n"),
      to_json(struct(docCols: _*))).as("value"))
    val sized = if (numWorkers > 0) lines.repartition(numWorkers) else lines
    val obs = Observation(s"bulk-$indexName")
    val observed = sized.observe(obs, count(lit(1)).as("flushed"))
    val t0 = System.nanoTime()
    observed.write.mode(mode).text(s"$indexDir/$indexName")
    val ms = math.max(1L, (System.nanoTime() - t0) / 1000000L)
    val flushed = obs.get("flushed").asInstanceOf[Long]
    // A completed Spark write is all-or-nothing (task retries + job abort
    // on failure) — the per-item OnFailure path (:215-222) maps to thrown
    // exceptions, so a returned stats record always has numFailed = 0.
    IndexStats(flushed, 0L, ms, flushed * 1000.0 / ms)
  }
}
