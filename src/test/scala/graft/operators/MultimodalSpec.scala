package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media table conforms to the media schema") {
    val m = Multimodal.synthetic(spark, 30)
    assert(m.schema == Multimodal.mediaSchema)
    assert(m.count() == 30)
    assert(m.select("modality").distinct().count() == 3)
  }

  test("fakeDecode yields deterministic per-row features, batched per partition") {
    val m = Multimodal.synthetic(spark, 30)
    val f1 = Multimodal.fakeDecode(m).collect().sortBy(_.getLong(0))
    val f2 = Multimodal.fakeDecode(m.repartition(7)).collect()
      .sortBy(_.getLong(0))
    assert(f1.length == 30)
    // partitioning must not change results
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq)
    val r0 = f1.head
    assert(r0.getSeq[Double](r0.fieldIndex("feature")).length == 8)
    assert(r0.getLong(r0.fieldIndex("n_bytes")) == 64L)
  }

  test("fakeDecode checksum matches an independent computation") {
    val m = Multimodal.synthetic(spark, 3)
    val payloads = m.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    val decoded = Multimodal.fakeDecode(m)
      .select("media_id", "checksum").as[(Long, Long)].collect().toMap
    payloads.foreach { case (id, bytes) =>
      val expect = bytes.foldLeft(0L)((h, b) => (h * 131 + (b & 0xff)) % 2147483647L)
      assert(decoded(id) == expect)
    }
  }

  test("sampleFrames explodes every stride-th block") {
    val m = Multimodal.synthetic(spark, 5)
    val frames = Multimodal.sampleFrames(m, blockSize = 64, stride = 2)
    val byId = frames.select("media_id", "frame_no")
      .as[(Long, Int)].collect().groupBy(_._1)
    // media 0 has 64 bytes → 1 block → frame 0 only
    assert(byId(0L).map(_._2).toSeq.sorted == Seq(0))
    // frames are stride-aligned
    assert(frames.select("frame_no").as[Int].collect().forall(_ % 2 == 0))
  }

  test("resizeStub keeps every factor-th byte, byte-exactly") {
    val m = Multimodal.synthetic(spark, 5)
    val orig = m.select("media_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    val resized = Multimodal.resizeStub(m, factor = 3)
      .select("media_id", "orig_bytes", "payload")
      .as[(Long, Long, Array[Byte])].collect()
    assert(resized.length == 5)
    resized.foreach { case (id, nOrig, bytes) =>
      val o = orig(id)
      assert(nOrig == o.length.toLong)
      assert(bytes.length == (o.length + 2) / 3)
      assert(bytes.toSeq == o.indices.collect {
        case i if i % 3 == 0 => o(i)
      }.toSeq)
    }
  }

  test("withByteStats computes sizes and digests in pure SQL") {
    val m = Multimodal.synthetic(spark, 4)
    val s = Multimodal.withByteStats(m)
      .select("media_id", "n_bytes", "digest", "head_hex")
      .collect()
    assert(s.forall(_.getString(2).length == 32)) // md5 hex
    assert(s.forall(_.getString(3).length == 8))  // 4 bytes hex
  }
}
