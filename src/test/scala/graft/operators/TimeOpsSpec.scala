package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TimeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def evts = Seq(
    (1L, ts("2024-01-05 10:00:00")),
    (2L, ts("2024-01-28 23:59:59")),
    (3L, ts("2024-04-01 00:00:00")),   // gap: feb, mar empty
    (4L, ts("2024-04-15 12:00:00")))
    .toDF("id", "t")

  test("dateHistogram(month) buckets by calendar month and " +
    "gap-fills empty months with zero") {
    val out = TimeOps.dateHistogram(evts, "t", "month")
      .as[(Timestamp, Long)].collect().toSeq
    assert(out == Seq(
      (ts("2024-01-01 00:00:00"), 2L),
      (ts("2024-02-01 00:00:00"), 0L),
      (ts("2024-03-01 00:00:00"), 0L),
      (ts("2024-04-01 00:00:00"), 2L)))
  }

  test("dateHistogram pred filters before bucketing") {
    val out = TimeOps.dateHistogram(evts, "t", "month",
      pred = Some("id >= 3"))
      .as[(Timestamp, Long)].collect().toSeq
    assert(out == Seq((ts("2024-04-01 00:00:00"), 2L)))
  }

  test("dateHistogram rejects a fixed-interval spelling") {
    intercept[IllegalArgumentException] {
      TimeOps.dateHistogram(evts, "t", "30s")
    }
  }

  test("dateRange on an EMPTY source still answers every range " +
    "with zero (never null)") {
    val out = TimeOps.dateRange(evts.filter("id > 100"), "t", Seq(
      ("all", None, None), ("w", Some("2024-01-01 00:00:00"), None)))
      .select("range_key", "doc_count")
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("all", 0L), ("w", 0L)))
  }

  test("dateRange: from inclusive, to exclusive, open ends, " +
    "request order, empty range at zero") {
    val out = TimeOps.dateRange(evts, "t", Seq(
      ("early", None, Some("2024-01-28 23:59:59")),
      ("edge", Some("2024-01-28 23:59:59"), Some("2024-04-01 00:00:00")),
      ("late", Some("2024-04-01 00:00:00"), None),
      ("empty", Some("2025-01-01 00:00:00"), None)))
      .select("range_key", "doc_count")
      .as[(String, Long)].collect().toSeq
    // id2 sits exactly at "edge"'s from → inclusive there, excluded
    // from "early" (to exclusive); id3 exactly at "late"'s from
    assert(out == Seq(("early", 1L), ("edge", 1L), ("late", 2L),
      ("empty", 0L)))
  }

  test("autoDateHistogram picks the finest ladder unit fitting the " +
    "target, reports it, and gap-fills under it") {
    // evts span ~3.2 months: week estimates 13 buckets, month 3
    val m = TimeOps.autoDateHistogram(evts, "t", targetBuckets = 5)
      .select("bucket", "doc_count", "auto_interval")
      .as[(Timestamp, Long, String)].collect().toSeq
    assert(m.forall(_._3 == "month"))
    assert(m.map(r => (r._1, r._2)) == Seq(
      (ts("2024-01-01 00:00:00"), 2L), (ts("2024-02-01 00:00:00"), 0L),
      (ts("2024-03-01 00:00:00"), 0L), (ts("2024-04-01 00:00:00"), 2L)))
    // a larger budget zooms in: the ~101-day span estimates 102
    // day buckets, within 200
    val d = TimeOps.autoDateHistogram(evts, "t", targetBuckets = 200)
      .select("auto_interval").distinct().as[String].collect().toSeq
    assert(d == Seq("day"))
    // empty source: zero rows, schema intact
    val e = TimeOps.autoDateHistogram(
      evts.filter("id < 0"), "t", 10)
    assert(e.collect().isEmpty &&
      e.columns.toSeq == Seq("bucket", "doc_count", "auto_interval"))
  }

  test("dateRange: an unparseable boundary errors loudly instead of " +
    "reading as an empty range; bare dates parse as midnight") {
    val e = intercept[IllegalArgumentException] {
      TimeOps.dateRange(evts, "t",
        Seq(("w", Some("2024-13-99 oops"), None)))
    }
    assert(e.getMessage.contains("unparseable boundary"), e.getMessage)
    // a bare yyyy-MM-dd boundary means midnight (ES date math's day
    // floor), so request ergonomics don't force a time suffix
    val out = TimeOps.dateRange(evts, "t",
      Seq(("d", Some("2024-04-01"), None)))
      .select("doc_count").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("dateRange boundaries parse in the SESSION time zone (not " +
    "the JVM default) and accept the ISO-8601 'T' separator") {
    // ISO 'T' separator: same boundary as the space form
    val iso = TimeOps.dateRange(evts, "t",
      Seq(("d", Some("2024-04-01T00:00:00"), None)))
      .select("doc_count").as[Long].collect().toSeq
    assert(iso == Seq(2L))
    // with the session zone moved 14h west of the stored instants'
    // zone, the wall-clock boundary names a LATER instant: the
    // 2024-04-01 00:00:00 boundary read in Pacific/Kiritimati
    // (UTC+14) is 10:00 UTC the previous day — doc 3 (stored at
    // 2024-04-01 00:00:00 session-default-zone) must still count
    // under the SESSION zone's midnight, and a JVM-default parse
    // would shift it out whenever the zones differ
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone",
        "Pacific/Kiritimati")
      // evts' timestamps were created under the JVM zone; recreate
      // the frame under the session zone so data and boundary share
      // one zone — the operator contract is "boundary wall-clock in
      // session zone"
      val d = Seq((1L, "2024-03-31 23:59:59"),
        (2L, "2024-04-01 00:00:00"))
        .toDF("id", "s")
        .selectExpr("id", "to_timestamp(s) AS t")
      val out = TimeOps.dateRange(d, "t",
        Seq(("d", Some("2024-04-01"), None)))
        .select("doc_count").as[Long].collect().toSeq
      // exactly the on-or-after-session-midnight row counts
      assert(out == Seq(1L))
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
    }
  }
}
