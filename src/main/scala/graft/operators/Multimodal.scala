package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `BinaryType` columns plus a typed metadata struct —
  * the layout a 100 TB training-data lake actually uses (parquet with a
  * binary payload column, partitioned by modality/date; payloads never
  * pass through the driver). The decode step is a STUB in this container
  * (no image/audio codecs are installed): [[fakeDecode]] derives
  * deterministic pseudo-features from the bytes so the surrounding
  * plumbing — schema, batched per-partition processing, feature schema,
  * partition sizing — is real and testable end-to-end. Swap the stub for
  * a JNI/codec call without touching anything else.
  *
  * Scala-side the batch shape is `mapPartitions` over an iterator of rows
  * (the JVM analogue of arrow-batched Python UDFs): decode state (codec
  * contexts, model weights) is initialized once per partition, amortized
  * over every row in the batch.
  */
object Multimodal {

  /** Metadata carried next to every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Full media-table schema: metadata + opaque payload. */
  val mediaSchema: StructType =
    StructType(metaSchema.fields :+
      StructField("payload", BinaryType, nullable = false))

  /** Feature record produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** STUB decoder: a real implementation would hand `payload` to an
    * image/audio codec here. The deterministic fake derives an 8-dim
    * "feature" from byte statistics (mean of each of 8 byte-position
    * strides) so tests can assert exact values. Runs per-partition —
    * decoder init happens once per task, not once per row.
    */
  def fakeDecode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "payload").rdd
      .mapPartitions { rows =>
        // per-partition init (codec context stand-in)
        val dims = 8
        rows.map { r =>
          val id = r.getLong(0)
          val mod = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val sums = new Array[Double](dims)
          val counts = new Array[Long](dims)
          var i = 0
          while (i < bytes.length) {
            val d = i % dims
            sums(d) += (bytes(i) & 0xff).toDouble
            counts(d) += 1L
            i += 1
          }
          var checksum = 0L
          i = 0
          while (i < bytes.length) {
            checksum = (checksum * 131 + (bytes(i) & 0xff)) % 2147483647L
            i += 1
          }
          val feat = (0 until dims).map(d =>
            if (counts(d) == 0) 0.0 else sums(d) / counts(d)).toArray
          Row(id, mod, bytes.length.toLong, checksum, feat.toSeq)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** STUB frame sampler: every `stride`-th fixed-size block of the
    * payload stands in for a decoded video frame. Output one row per
    * sampled frame: (media_id, frame_no, frame_bytes). The exploded
    * shape (and the fact that it multiplies row counts — repartition
    * after sampling) is the part that matters at scale.
    */
  def sampleFrames(media: DataFrame, blockSize: Int = 1024,
                   stride: Int = 4): DataFrame =
    media
      .withColumn("n_frames",
        expr(s"int(ceil(octet_length(payload) / cast($blockSize as double)))"))
      .withColumn("frame_no",
        explode(expr(s"filter(sequence(0, greatest(n_frames - 1, 0)), " +
          s"f -> f % $stride = 0)")))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_no * $blockSize + 1, $blockSize)"))
      .select("media_id", "frame_no", "frame_bytes")

  /** STUB resize: a real implementation decodes, scales and re-encodes
    * the payload; the stub keeps every `factor`-th byte (deterministic,
    * byte-exact testable) so the payload shrinks ~factor×. The plumbing
    * that matters at scale is real: a per-partition binary transform
    * (resize state — scaler context, target profile — initialized once
    * per task), payload bytes never touch the driver, and the output
    * keeps the (media_id, payload) contract every downstream operator
    * expects. Output: (media_id, orig_bytes, payload).
    */
  def resizeStub(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, "resize factor must be >= 1")
    val spark = media.sparkSession
    val out = media.select("media_id", "payload").rdd
      .mapPartitions { rows =>
        // per-partition init (scaler context stand-in)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val resized = Array.tabulate((bytes.length + factor - 1) / factor)(
            j => bytes(j * factor))
          Row(id, bytes.length.toLong, resized)
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("orig_bytes", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false))))
  }

  /** Byte-level metadata extraction as pure codegen'd SQL — the part of
    * the pipeline that needs no codec at all: sizes, digests, magic-byte
    * sniffing. Works on any BinaryType column.
    */
  def withByteStats(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media
      .withColumn("n_bytes", expr(s"bigint(octet_length($payloadCol))"))
      .withColumn("digest", md5(col(payloadCol)))
      .withColumn("head_hex", expr(s"hex(substring($payloadCol, 1, 4))"))

  /** Synthesize a deterministic in-memory media table (for tests and the
    * demo query): payload bytes derive from the id. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val mod = Seq("image", "audio", "video")(i % 3)
      val len = 64 + (i * 37) % 512
      val bytes = Array.tabulate[Byte](len)(j => ((i * 31 + j * 7) % 251).toByte)
      Row(i.toLong, mod, s"application/x-fake-$mod",
        if (mod == "image") Integer.valueOf(64 + i % 64) else null,
        if (mod == "image") Integer.valueOf(64 + i % 48) else null,
        if (mod != "image") java.lang.Long.valueOf(1000L + i) else null,
        bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
