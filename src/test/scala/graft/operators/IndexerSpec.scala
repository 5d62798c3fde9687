package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Indexer sink parity (reference `api/controllers/elastic_controller.go`):
  * sequential 1-based ids (:204), row→JSON shape (:129-137), ES-bulk
  * NDJSON wire format (:196-229), stats record (:236-249).
  */
class IndexerSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (3L, "c", 30.0), (1L, "a", 10.0), (2L, "b", 20.0))
    .toDF("k", "name", "v")

  test("withDocIds assigns dense 1-based ids in the given order") {
    val ids = Indexer.withDocIds(sample, Seq(col("k")))
      .orderBy("_id").select("_id", "k").as[(Long, Long)].collect()
    assert(ids.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("withScalableDocIds matches withDocIds output") {
    val df = spark.read.parquet(s"$sf001/orders.parquet")
    val a = Indexer.withDocIds(df, Seq(col("o_orderkey")))
      .select("o_orderkey", "_id").as[(Long, Long)].collect().sorted
    val b = Indexer.withScalableDocIds(df, Seq(col("o_orderkey")))
      .select("o_orderkey", "_id").as[(Long, Long)].collect().sorted
    assert(a.toSeq == b.toSeq)
    // dense 1..N
    assert(b.map(_._2).toSeq.sorted == (1L to df.count()).toSeq)
  }

  test("toJsonDocs emits one column-name-keyed JSON object per row") {
    val docs = Indexer.toJsonDocs(sample.orderBy("k")).collect()
    assert(docs.length == 3)
    assert(docs.forall(d => d.startsWith("{") && d.contains("\"name\":")))
  }

  test("bulkIndex writes ES-bulk NDJSON with action lines and stats") {
    val dir = Files.createTempDirectory("graft-bulk").toString
    val stats = Indexer.bulkIndex(sample, dir, "idx", Seq(col("k")),
      numWorkers = 2)
    assert(stats.numFlushed == 3 && stats.numFailed == 0)
    assert(stats.docsPerSec > 0)
    val lines = spark.read.textFile(s"$dir/idx").collect()
    val actions = lines.filter(_.startsWith("""{"index":{"""))
    assert(actions.length == 3)
    assert(actions.exists(_.contains(""""_index":"idx","_id":1}""")))
    // every action is followed by a doc body in the same record
    assert(lines.count(_.contains("\"name\":")) == 3)
  }

  test("bulkIndex rejects names that would corrupt the path or action line") {
    val dir = Files.createTempDirectory("graft-bulk3").toString
    Seq("../escape", "a/b", "a\\b", "a\"b", "", "a\nb").foreach { bad =>
      assertThrows[IllegalArgumentException](
        Indexer.bulkIndex(sample, dir, bad, Seq(col("k"))))
    }
    // a plain name still works
    assert(Indexer.bulkIndex(sample, dir, "ok-name_1", Seq(col("k")))
      .numFlushed == 3)
  }

  test("bulkIndex create-if-absent semantics: second write fails, append works") {
    val dir = Files.createTempDirectory("graft-bulk2").toString
    Indexer.bulkIndex(sample, dir, "idx", Seq(col("k")))
    assertThrows[Exception](
      Indexer.bulkIndex(sample, dir, "idx", Seq(col("k"))))
    val s = Indexer.bulkIndex(sample, dir, "idx", Seq(col("k")),
      mode = "append")
    assert(s.numFlushed == 3)
  }
}
