package graft.operators

import graft.SparkSpec

/** Ingest pipelines — ES's processor chains: order, overwrite and
  * loud-missing semantics. */
class IngestSpec extends SparkSpec {
  import spark.implicits._
  import Ingest._

  private def docs = Seq(
    (1L, "Hello World", "web", "en", 11L),
    (2L, "Spark Rocks", "book", "de", 11L))
    .toDF("doc_id", "text", "source", "lang", "n_chars")

  test("processors apply in order as one projection: rename → " +
    "uppercase sees the NEW name; set mints and overwrites; script " +
    "is Catalyst SQL; remove drops") {
    val out = Ingest(docs, Seq(
      RenameProc("source", "src"),
      UppercaseProc("src"),
      GsubProc("text", "o", "0"),
      SetProc("tag", "v1"),
      SetProc("tag", "v2"), // overwrite (ES's override:true default)
      ScriptProc("n2", "n_chars * 2"),
      RemoveProc("lang")))
    assert(out.columns.toSet ==
      Set("doc_id", "text", "src", "n_chars", "tag", "n2"))
    val r = out.orderBy("doc_id")
      .select("text", "src", "tag", "n2")
      .as[(String, String, String, Long)].collect().toSeq
    assert(r == Seq(("Hell0 W0rld", "WEB", "v2", 22L),
      ("Spark R0cks", "BOOK", "v2", 22L)))
  }

  test("missing fields fail LOUDLY (ignore_missing:false); rename " +
    "refuses an existing target; empty pipelines refused") {
    for (bad <- Seq(
      Seq(RenameProc("nope", "x")),
      Seq(RemoveProc("nope")),
      Seq(LowercaseProc("nope")),
      Seq(GsubProc("nope", "a", "b")),
      Seq(RenameProc("text", "lang"))))
      withClue(bad.toString) {
        intercept[IllegalArgumentException] { Ingest(docs, bad) }
      }
    intercept[IllegalArgumentException] { Ingest(docs, Seq.empty) }
  }

  test("simulate returns the transformed slice doc_id-ordered") {
    val out = Ingest.simulate(docs,
      Seq(LowercaseProc("text")), "doc_id >= 2")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "spark rocks")))
  }
}
