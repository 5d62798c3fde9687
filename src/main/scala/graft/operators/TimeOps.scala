package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar-time aggregations — Elasticsearch's `date_histogram`
  * (calendar intervals) and `date_range` aggs over a timestamp
  * column, the backbone of every Kibana time-series panel.
  *
  * The reference delegates aggregations to Elasticsearch
  * (`api/controllers/elastic_controller.go:196-229` only indexes;
  * aggregation queries run in ES). The numeric histogram tier
  * ([[SegmentedIndex.histogramFacet]]) covers fixed-width buckets;
  * this module adds what fixed width cannot express: CALENDAR
  * intervals (months and years are not constant-width — ES
  * distinguishes `calendar_interval` from `fixed_interval` for
  * exactly this reason). Bucketing is `date_trunc` (codegen'd,
  * partial-aggregated map-side), and the `min_doc_count: 0`
  * gap-fill explodes a month `sequence` between the occupied
  * bounds — a single-row frame, O(range/interval) rows, never a
  * driver loop. At 100 TB the time column is the classic hive
  * partition key: a `WHERE ts >= …` window prunes date partitions
  * at planning time and the truncation shuffles only
  * (bucket, partial-count) pairs.
  */
object TimeOps {

  private val CalendarIntervals =
    Set("year", "quarter", "month", "week", "day", "hour", "minute")

  /** ES `date_histogram` with `calendar_interval` semantics and its
    * `min_doc_count: 0` default: rows bucket by the calendar
    * truncation of `tsCol`, and EVERY interval between the lowest
    * and highest occupied bucket appears, empty ones with
    * doc_count 0 (the gap-fill that makes the series chartable and
    * derivative-safe). `pred` is the query half of the request
    * (`query` + `aggs` in one ES body) — it pushes into the scan.
    * Output: (bucket timestamp, doc_count), bucket-ascending. */
  def dateHistogram(df: DataFrame, tsCol: String, interval: String,
                    pred: Option[String] = None): DataFrame = {
    require(CalendarIntervals(interval),
      s"unsupported calendar_interval: $interval")
    val src = pred.fold(df)(df.filter(_))
    val counts = src
      .withColumn("bucket", date_trunc(interval, col(tsCol)))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("doc_count"))
    val step = interval match {
      case "quarter" => expr("interval 3 months")
      case other     => expr(s"interval 1 $other")
    }
    val buckets = counts
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .filter(col("lo").isNotNull)
      .select(explode(sequence(col("lo"), col("hi"), step))
        .as("bucket"))
    buckets.join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("doc_count"))
      .orderBy("bucket")
  }

  /** The auto_date_histogram interval ladder, finest→coarsest, with
    * PINNED nominal spans (seconds) for the bucket-count estimate:
    * months count as 30 days, quarters 90, years 365 — the rough
    * rounding ES's own interval picker uses (the estimate picks the
    * unit; the BUCKETS are then true calendar buckets). Pinned
    * constants keep the pick engine-reproducible. */
  private val AutoLadder: Seq[(String, Long)] = Seq(
    "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L,
    "week" -> 604800L, "month" -> 2592000L,
    "quarter" -> 7776000L, "year" -> 31536000L)

  /** ES `auto_date_histogram`: the caller names a TARGET bucket
    * count, the engine picks the interval — the finest [[AutoLadder]]
    * unit whose estimated bucket count (span/unit + 1, the pinned
    * nominal spans) stays within `targetBuckets`; coarser than a
    * year is a year (ES tops out the same way). The span comes off
    * one (min, max) aggregation — a SINGLE-ROW driver collect, the
    * coordinator-side pick ES itself performs — and the result is
    * [[dateHistogram]]'s gap-filled calendar series under the chosen
    * unit, with the pick reported in `auto_interval` (ES returns the
    * chosen `interval` in the response for exactly this reason).
    * Output: (bucket, doc_count, auto_interval), bucket-ascending;
    * an empty source yields zero rows. */
  def autoDateHistogram(df: DataFrame, tsCol: String,
                        targetBuckets: Int,
                        pred: Option[String] = None): DataFrame = {
    require(targetBuckets >= 1,
      s"targetBuckets must be >= 1: $targetBuckets")
    val src = pred.fold(df)(df.filter(_))
    val b = src.filter(col(tsCol).isNotNull)
      .agg(min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi"))
      .collect().head
    if (b.isNullAt(0))
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("doc_count",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("auto_interval",
            org.apache.spark.sql.types.StringType))))
    val spanSec = (b.getTimestamp(1).getTime -
      b.getTimestamp(0).getTime) / 1000L
    val chosen = AutoLadder
      .find { case (_, s) => spanSec / s + 1 <= targetBuckets }
      .map(_._1).getOrElse("year")
    dateHistogram(src, tsCol, chosen)
      .withColumn("auto_interval", lit(chosen))
  }

  /** ES `rate` aggregation under a `date_histogram` parent — "how
    * many per day", computed per calendar bucket: rate =
    * doc_count / (days in THAT bucket), which is the whole point of
    * the agg under calendar intervals (a 28-day February and a
    * 31-day January normalize to comparable per-day rates; a fixed
    * divisor would lie). The divisor is exact integer calendar
    * arithmetic (datediff to the next bucket start) and the rate is
    * ONE division of exactly-representable longs — bit-stable on the
    * hash-oracle surface. `unit` is pinned to `day` (ES's other
    * units are the same single scaling; day is the one that
    * exercises variable bucket lengths). Output: (bucket, doc_count,
    * bucket_days, rate_per_day), bucket-ascending, gap-filled like
    * [[dateHistogram]] (empty buckets rate 0.0). */
  def dateHistogramRate(df: DataFrame, tsCol: String,
                        interval: String,
                        pred: Option[String] = None): DataFrame = {
    require(Set("year", "quarter", "month", "week", "day")(interval),
      s"rate needs a day-divisible calendar interval: $interval")
    val step = interval match {
      case "quarter" => expr("interval 3 months")
      case other     => expr(s"interval 1 $other")
    }
    dateHistogram(df, tsCol, interval, pred)
      .withColumn("bucket_days",
        datediff(to_date(col("bucket") + step), to_date(col("bucket")))
          .cast("long"))
      .withColumn("rate_per_day",
        col("doc_count").cast("double") /
          col("bucket_days").cast("double"))
      .orderBy("bucket")
  }

  /** Event FUNNEL — the ordered-conversion question every event
    * analytics stack asks ("signup → purchase within 7 days": how
    * many users reach each stage?): per user, stage 1 anchors at the
    * user's EARLIEST stage-1 event; each later stage i anchors at
    * the earliest stage-i event AT OR AFTER the previous stage's
    * anchor and within `windowSec` of the STAGE-1 anchor (the
    * whole-funnel window — the common product-analytics definition,
    * pinned). Conversion is each stage's user count over stage 1's —
    * one exact long division per stage.
    *
    * Plan shape: one filtered scan per stage (the event-type
    * predicate pushes down), each stage a (user, min ts) aggregation
    * joined user-keyed to the previous anchor — stage frames shrink
    * monotonically, joins are user-keyed shuffles (co-partitioned
    * after the first), nothing is ever per-event quadratic. Output:
    * (stage_idx, stage, n_users, conversion), stage order. */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String],
             windowSec: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct event types")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    val spark = df.sparkSession
    val first = df.filter(col(typeCol) === lit(stages.head))
      .groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("t0"))
    val anchors = stages.zipWithIndex.tail
      .scanLeft(first.withColumn("tprev", col("t0"))) {
        case (prev, (stage, _)) =>
          df.filter(col(typeCol) === lit(stage))
            .select(col(userCol).as("u"), col(tsCol).as("ts"))
            .join(prev.select("u", "t0", "tprev"), Seq("u"))
            .filter(col("ts") >= col("tprev") &&
              col("ts") <= col("t0") +
                expr(s"interval $windowSec seconds"))
            .groupBy("u")
            .agg(min(col("ts")).as("tnew"),
              min(col("t0")).as("t0"))
            .select(col("u"), col("t0"), col("tnew").as("tprev"))
      }
    val counts = anchors.map(_.agg(count(lit(1)).as("n")))
    val labeled = stages.zip(counts).zipWithIndex.map {
      case ((stage, c), i) =>
        c.select(lit(i.toLong).as("stage_idx"),
          lit(stage).as("stage"), col("n").as("n_users"))
    }
    val base = counts.head.select(col("n").as("n0"))
    labeled.reduce(_ unionByName _)
      .crossJoin(broadcast(base))
      .withColumn("conversion",
        when(col("n0") === 0L, lit(0.0d))
          .otherwise(col("n_users").cast("double") /
            col("n0").cast("double")))
      .select("stage_idx", "stage", "n_users", "conversion")
      .orderBy("stage_idx")
  }

  /** ES `date_range` aggregation: explicit [from, to) windows over a
    * timestamp column (from inclusive, to exclusive — ES's range
    * rule), open ends allowed (`None`), every requested range in the
    * output (empty → 0) in request order — ES keeps request order
    * for explicit ranges. Each range is a pair of pushdown-able
    * comparisons; the counts reduce in ONE conditional aggregation
    * pass (no per-range rescan). Output: (range_key, from_ts, to_ts,
    * doc_count). */
  def dateRange(df: DataFrame, tsCol: String,
                ranges: Seq[(String, Option[String], Option[String])])
      : DataFrame = {
    require(ranges.nonEmpty, "dateRange needs at least one range")
    val spark = df.sparkSession
    // boundary strings parse DRIVER-SIDE, inside a loud require: an
    // in-plan to_timestamp(lit(...)) turns a typo'd boundary into
    // null, the range condition evaluates null, and the window
    // silently reports doc_count 0 — a malformed REQUEST must error
    // (ES 400s it), only the DATA may be lenient. The parsed
    // timestamp then enters the plan as a literal, so pushdown is
    // unchanged. The wall-clock string converts to an instant in the
    // SESSION time zone (spark.sql.session.timeZone — the zone every
    // in-plan timestamp comparison uses), NOT the JVM default that
    // java.sql.Timestamp.valueOf would bake in: when the two zones
    // differ the boundaries must not silently shift by the offset.
    // Both ISO-8601 'T' and space separators are accepted.
    def parseTs(key: String, s: String): java.sql.Timestamp = {
      val txt =
        if (s.contains(" ") || s.contains("T")) s.replace(' ', 'T')
        else s + "T00:00:00"
      try {
        val zone = java.time.ZoneId.of(
          spark.sessionState.conf.sessionLocalTimeZone)
        java.sql.Timestamp.from(
          java.time.LocalDateTime.parse(txt).atZone(zone).toInstant)
      } catch {
        case _: java.time.format.DateTimeParseException |
             _: java.time.DateTimeException =>
          throw new IllegalArgumentException(
            s"date_range '$key': unparseable boundary '$s' " +
              "(expected yyyy-MM-dd[[T| ]HH:mm:ss[.f...]])")
      }
    }
    val conds: Seq[Column] = ranges.map { case (key, from, to) =>
      val lo = from.fold(lit(true))(f =>
        col(tsCol) >= lit(parseTs(key, f)))
      val hi = to.fold(lit(true))(t =>
        col(tsCol) < lit(parseTs(key, t)))
      lo && hi
    }
    val aggs = conds.zipWithIndex.map { case (c, i) =>
      // coalesce: sum over an EMPTY source is null — an empty index
      // still answers every requested range with doc_count 0 (ES)
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"c$i")
    }
    val counted = df.filter(col(tsCol).isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    val keys = spark.createDataFrame(
      ranges.zipWithIndex.map { case ((key, from, to), i) =>
        (i, key, from.orNull, to.orNull)
      }).toDF("ord", "range_key", "from_ts", "to_ts")
    keys.crossJoin(broadcast(counted))
      .withColumn("doc_count",
        ranges.indices.foldLeft(lit(0L)) { (acc, i) =>
          when(col("ord") === i, col(s"c$i")).otherwise(acc)
        })
      .select("range_key", "from_ts", "to_ts", "doc_count", "ord")
      .orderBy("ord").drop("ord")
  }
}
