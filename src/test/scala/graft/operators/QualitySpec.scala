package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (Some(1L), 10L, "A"),
    (Some(2L), 200L, "A"),   // out of range
    (Some(2L), 20L, "X"),    // dup key + bad flag
    (None, 30L, "N"))        // null key
    .toDF("id", "qty", "flag")

  test("rowRules: one scan, one counter per rule, exact counts") {
    val m = Quality.rowRules(rows, Seq(
      "id.not_null" -> col("id").isNull,
      "qty.range" -> !col("qty").between(1, 50),
      "flag.in_set" -> !col("flag").isin("A", "N")))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("id.not_null") == ((1L, 4L)))
    assert(m("qty.range") == ((1L, 4L)))
    assert(m("flag.in_set") == ((1L, 4L)))
  }

  test("uniqueKey: duplicates and null keys are violations") {
    val out = Quality.uniqueKey(rows, "id.unique", Seq("id"))
      .as[(String, Long, Long)].collect().head
    // 4 rows, 2 distinct non-null keys → 2 violations (the dup AND
    // the null-key row)
    assert(out == (("id.unique", 2L, 4L)))
    val clean = Quality.uniqueKey(
      rows.filter(col("id").isNotNull && col("qty") =!= 20L),
      "id.unique", Seq("id"))
      .as[(String, Long, Long)].collect().head
    assert(clean == (("id.unique", 0L, 2L)))
  }

  test("uniqueKey composite: a PARTIAL-null key is a violation (the " +
    "q148 oracle filters partial nulls before its DISTINCT to match)") {
    val comp = Seq(
      (Some(1L), Some(1L)),
      (Some(1L), Some(2L)),
      (Some(1L), Some(2L)),  // dup composite key
      (Some(3L), None),      // partial null — violation, NOT a key
      (None, Some(4L)))      // partial null — violation
      .toDF("a", "b")
    val out = Quality.uniqueKey(comp, "ab.unique", Seq("a", "b"))
      .as[(String, Long, Long)].collect().head
    // 5 rows, 2 distinct fully-non-null keys → 3 violations: the dup
    // plus BOTH partial-null rows (a struct-distinct count would have
    // admitted (3, NULL) and (NULL, 4) as keys and reported only 1)
    assert(out == (("ab.unique", 3L, 5L)))
  }

  test("refIntegrity: orphans counted, null FK is an orphan") {
    val parent = Seq(1L, 2L).toDF("pk")
    val out = Quality.refIntegrity(rows, parent, "id.refs", "id", "pk")
      .as[(String, Long, Long)].collect().head
    // the null-id row is an orphan; ids 1 and 2 resolve
    assert(out == (("id.refs", 1L, 4L)))
  }

  test("audit unions every check ordered by rule name") {
    val out = Quality.audit(Seq(
      Quality.uniqueKey(rows, "b.unique", Seq("id")),
      Quality.rowRules(rows, Seq("a.rule" -> col("id").isNull))))
      .as[(String, Long, Long)].collect().map(_._1).toSeq
    assert(out == Seq("a.rule", "b.unique"))
  }
}
