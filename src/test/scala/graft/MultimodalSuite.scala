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

  // ---- the REAL Netpbm codec ----------------------------------------

  import Multimodal.Netpbm

  test("Netpbm decode: hand-built P6 with comments, exact pixels and means") {
    // 2x2 RGB: red, green, blue, white — header with a comment line
    val raster = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    val bytes = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII")) ++ raster
    val img = Netpbm.decode(bytes)
    assert((img.width, img.height, img.channels) == (2, 2, 3))
    assert(img.sample(0, 0, 0) == 255 && img.sample(0, 0, 1) == 0)
    assert(img.sample(1, 1, 2) == 255)
    val means = Netpbm.channelMeans(img)
    // per channel: (255+0+0+255)/4, (0+255+0+255)/4, (0+0+255+255)/4
    assert(means.toSeq == Seq(127.5, 127.5, 127.5))
  }

  test("Netpbm encode/decode round-trips; truncated raster fails loudly") {
    val img = Netpbm.decode(Netpbm.synthetic(42L, 16, 12))
    val again = Netpbm.decode(Netpbm.encode(img))
    assert(again.width == 16 && again.height == 12)
    assert(java.util.Arrays.equals(again.pixels, img.pixels))
    val truncated = Netpbm.encode(img).dropRight(10)
    val e = intercept[IllegalArgumentException](Netpbm.decode(truncated))
    assert(e.getMessage.contains("truncated"))
  }

  test("Netpbm resize: nearest-neighbor picks exact source pixels") {
    // 4x2 grayscale, distinct values; resize to 2x1 must pick (0,0) and (2,0)
    val img = Netpbm.Image(4, 2, 1, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val r = Netpbm.resize(img, 2, 1)
    assert(r.pixels.toSeq == Seq[Byte](10, 30))
    // upscale keeps corner fidelity
    val up = Netpbm.resize(img, 8, 4)
    assert(up.sample(0, 0, 0) == 10 && up.sample(7, 3, 0) == 80)
  }

  test("Netpbm grid features: uniform image pools to its intensity") {
    val px = Array.fill(8 * 8 * 3)(102.toByte) // 102/255 = 0.4
    val f = Netpbm.gridFeatures(Netpbm.Image(8, 8, 3, px), grid = 2)
    assert(f.length == 2 * 2 * 3)
    assert(f.forall(v => math.abs(v - 0.4f) < 1e-6f))
  }

  test("Spark image path: decode, resize, features over synthetic blobs") {
    val images = Multimodal.demoImageTable(docs.limit(50))
    val meta = Multimodal.decodeImages(images, "blob", "doc_id")
    assert(meta.count() == 50)
    val row = meta.orderBy("doc_id").limit(1).collect().head
    assert(row.getInt(1) == 32 && row.getInt(2) == 24 && row.getInt(3) == 3)
    // mean_r of the synthetic gradient = mean of x*255/(w-1) = 127.5
    assert(math.abs(row.getDouble(4) - 127.5) < 1.0)

    val resized = Multimodal.resizeImages(images, "blob", "doc_id", 8, 6)
    val rmeta = Multimodal.decodeImages(resized, "blob", "doc_id")
    assert(rmeta.select("width", "height").collect().forall(r => r.getInt(0) == 8 && r.getInt(1) == 6))

    val feats = Multimodal.imageGridFeatures(images, "blob", "doc_id", grid = 4)
    val dims = feats.select(size(col("features"))).as[Int].collect()
    assert(dims.forall(_ == 4 * 4 * 3))
    // partitioning must not change features
    val f1 = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.imageGridFeatures(images.repartition(7), "blob", "doc_id", grid = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
  }

  test("ImageIO PNG round-trip reproduces the raster byte-exactly") {
    val img = Multimodal.Netpbm.decode(Multimodal.Netpbm.synthetic(42))
    val png = Multimodal.ImageIoCodec.encodePng(img)
    assert(Multimodal.ImageIoCodec.formatOf(png) == "png")
    val back = Multimodal.ImageIoCodec.decode(png)
    assert(back.width == img.width && back.height == img.height && back.channels == 3)
    assert(java.util.Arrays.equals(back.pixels, img.pixels),
      "PNG decode raster differs from the encoded one")
  }

  test("ImageIO JPEG decodes (lossy, so only shape-checked)") {
    val img = Multimodal.Netpbm.decode(Multimodal.Netpbm.synthetic(7))
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width)
      bi.setRGB(x, y, (img.sample(x, y, 0) << 16) | (img.sample(x, y, 1) << 8) | img.sample(x, y, 2))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpeg", bos), "no JPEG writer in this JDK")
    val jpeg = bos.toByteArray
    assert(Multimodal.ImageIoCodec.formatOf(jpeg) == "jpeg")
    val back = Multimodal.ImageIoCodec.decode(jpeg)
    assert(back.width == img.width && back.height == img.height)
  }

  test("PNG-path grid features match the Netpbm-path features exactly") {
    val pngs = Multimodal.demoPngTable(docs.limit(30))
    val viaPng = Multimodal.imageIoGridFeatures(pngs, "blob", "doc_id", grid = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaPbm = Multimodal.imageGridFeatures(
        Multimodal.demoImageTable(docs.limit(30)), "blob", "doc_id", grid = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaPng == viaPbm, "lossless PNG path must produce identical features")
  }

  // ---- the REAL WAV codec ---------------------------------------------

  test("Wav: encode/decode round-trips samples, rate and channels exactly") {
    val a = Multimodal.Wav.Audio(44100, 2, Array[Short](0, -1, 32767, -32768, 100, -100))
    val back = Multimodal.Wav.decode(Multimodal.Wav.encode(a))
    assert(back.sampleRate == 44100 && back.channels == 2)
    assert(back.samples.toSeq == a.samples.toSeq)
    assert(back.nFrames == 3)
  }

  test("Wav: unknown chunks are skipped; truncated/ non-PCM fail loudly") {
    val a = Multimodal.Wav.Audio(8000, 1, Array[Short](1, 2, 3, 4))
    val base = Multimodal.Wav.encode(a)
    // splice a LIST chunk (odd size -> exercises the word-align pad)
    // between fmt and data
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 'I', 'N', 'F', 'O', 7, 0)
    val spliced = base.take(36) ++ list ++ base.drop(36)
    spliced(4) = (spliced.length - 8).toByte // RIFF size (fits in one byte here)
    val back = Multimodal.Wav.decode(spliced)
    assert(back.samples.toSeq == a.samples.toSeq)
    intercept[IllegalArgumentException](Multimodal.Wav.decode(base.dropRight(3)))
    val nonPcm = base.clone(); nonPcm(20) = 3 // format tag != 1
    intercept[IllegalArgumentException](Multimodal.Wav.decode(nonPcm))
  }

  test("Wav: synthetic blob decodes to the closed-form waveform") {
    val id = 42L
    val a = Multimodal.Wav.decode(Multimodal.Wav.synthetic(id))
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.nFrames == 1600 + (id % 7) * 160)
    val k = 3 + id % 5
    (0 until a.nFrames).foreach { i =>
      assert(a.samples(i) == (((i * k + id) % 4096 - 2048) * 8).toShort)
    }
  }

  test("audioFeatures: hand-computed stats on a tiny known signal") {
    val samples = Array[Short](100, -200, 300, 0, -400)
    val bytes = Multimodal.Wav.encode(Multimodal.Wav.Audio(1000, 1, samples))
    val df = Seq((1L, bytes)).toDF("doc_id", "blob")
    val r = Multimodal.audioFeatures(df, "blob", "doc_id").collect().head
    assert(r.getLong(1) == 5) // n_samples
    assert(r.getInt(2) == 1000 && r.getInt(3) == 1)
    assert(r.getLong(4) == 5L * 1000 / 1000) // duration_ms
    assert(r.getLong(5) == 400) // peak
    assert(r.getLong(6) == 2, s"zero crossings ${r.getLong(6)}") // strict sign flips: 100/-200, -200/300
    assert(r.getLong(7) == 1000) // sum_abs
    assert(r.getLong(8) == 100L * 100 + 200L * 200 + 300L * 300 + 400L * 400)
  }

  // ---- the REAL Y4M codec ---------------------------------------------

  test("Y4m: encode/decode round-trips planes, fps and frame count") {
    val v = Multimodal.Y4m.decode(Multimodal.Y4m.synthetic(7L))
    assert(v.width == 16 && v.height == 12 && v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.length == 4 + 7 % 3)
    val again = Multimodal.Y4m.decode(Multimodal.Y4m.encode(v))
    assert(again.frames.length == v.frames.length)
    assert(again.frames.zip(v.frames).forall { case (a, b) => a.toSeq == b.toSeq })
  }

  test("Y4m: synthetic planes match the closed form; truncation fails loudly") {
    val id = 13L
    val v = Multimodal.Y4m.decode(Multimodal.Y4m.synthetic(id))
    val f1 = v.frames(1)
    assert((f1(0) & 0xFF) == ((0 * 7 + 0 * 5 + 1 * 11 + id) % 256).toInt) // Y(0,0,1)
    assert((f1(v.lumaSize) & 0xFF) == ((0 * 3 + 0 + 1 + id) % 256).toInt) // U(0,0,1)
    assert((f1(v.lumaSize + v.chromaSize) & 0xFF) == ((0 + 0 * 3 + 2 + id) % 256).toInt) // V(0,0,1)
    val whole = Multimodal.Y4m.encode(v)
    intercept[IllegalArgumentException](Multimodal.Y4m.decode(whole.dropRight(5)))
    intercept[IllegalArgumentException](
      Multimodal.Y4m.decode("MPEG4 W2 H2\n".getBytes("US-ASCII")))
  }

  test("sampleFramesReal keeps every 2nd frame with exact luma sums") {
    val rows = Multimodal.sampleFramesReal(
        Multimodal.demoY4mTable(docs.limit(9)), "blob", "doc_id", step = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    rows.foreach { case (id, fi, got) =>
      assert(fi % 2 == 0 && fi < 4 + id % 3)
      val want = (for (y <- 0 until 12; x <- 0 until 16)
        yield (x * 7 + y * 5 + fi * 11 + id) % 256).sum
      assert(got == want, s"doc $id frame $fi")
    }
    val perDoc = rows.groupBy(_._1).view.mapValues(_.length)
    perDoc.foreach { case (id, n) => assert(n == (4 + id % 3 + 1) / 2) }
  }

  test("imageCellSums: exact tile sums on a hand-checkable cell") {
    val pngs = Multimodal.demoPngTable(docs.limit(5))
    val sums = Multimodal.imageCellSums(pngs, "blob", "doc_id", grid = 4)
    assert(sums.count() == 5 * 16)
    // cell 0 of any doc: x in [0,8), y in [0,6) -> n_px = 48,
    // sum_r = 6 * sum(x*255/31 for x<8), sum_g = 8 * sum(y*255/23 for y<6)
    val r0 = (0 until 8).map(x => x * 255 / 31).sum * 6L
    val g0 = (0 until 6).map(y => y * 255 / 23).sum * 8L
    val c0 = sums.filter("cell = 0").orderBy("doc_id").limit(1).collect().head
    assert(c0.getLong(2) == 48L, s"n_px ${c0.getLong(2)}")
    assert(c0.getLong(3) == r0, s"sum_r ${c0.getLong(3)} want $r0")
    assert(c0.getLong(4) == g0, s"sum_g ${c0.getLong(4)} want $g0")
  }
}
