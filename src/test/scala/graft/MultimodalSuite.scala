package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** The multimodal plumbing is real even though the codec is a documented
  * stub: these tests pin the schemas, the per-partition batch shape, the
  * frame-sampling explode, and determinism of the stubbed feature vectors.
  */
class MultimodalSuite extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.demoMediaTable(docs)

  test("media metadata struct has the typed schema and sane ranges") {
    val row = media.select("media_meta.*").limit(1).collect().head
    val got = media.schema("media_meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    // literals are non-nullable — compare field names + types only
    assert(got.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val widths = media.select("media_meta.width").as[Int].collect()
    val heights = media.select("media_meta.height").as[Int].collect()
    assert(widths.forall(w => w >= 64 && w < 64 + 1920))
    assert(heights.forall(h => h >= 64 && h < 64 + 1080))
    assert(row.getAs[String]("media_type") == "image/fake")
  }

  test("feature extraction: fixed dim, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media, "blob", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), "blob", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.values.forall(_.length == 16))
    assert(f1 == f2, "features must not depend on partitioning")
  }

  test("frame sampling emits n frames per blob with bounded bytes") {
    val frames = Multimodal.sampleFrames(media, "blob", "doc_id", n = 4)
    val perDoc = frames.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(_ == 4), "every blob must yield exactly n frames")
    val lens = frames.select(length(col("frame_bytes"))).as[Int].collect()
    assert(lens.forall(l => l >= 0 && l <= 16))
  }

  test("stub resize bounds the byte length") {
    val b = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")
    val small = Multimodal.FakeCodec.resize(b, 32, 32)
    assert(small.length == 16)
    val big = Multimodal.FakeCodec.resize(b, 1920, 1080)
    assert(big.length == b.length)
  }
}
