package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs.
  *
  * Netpbm binary images (P5 grayscale / P6 RGB) are decoded, resized and
  * feature-extracted FOR REAL — the format is a plain header + raster, so a
  * genuine pure-JVM codec needs no external libraries (`Netpbm` below).
  * Compressed codecs (JPEG, audio, video) whose libraries are not in this
  * container stay STUBBED behind `FakeCodec`, a deterministic pure function
  * of the bytes; swapping it for javacv/ImageIO changes no Spark plumbing.
  * Everything Spark-side is real and tested: schemas, partition-preserving
  * batch processing via mapPartitions (the Scala analogue of mapInPandas
  * batch UDFs), metadata pushdown, and the blob-pointer layout used at
  * 100 TB (store bytes out-of-line, keep pointers + metadata in the table
  * so scans that only need metadata never touch blob storage).
  */
object Multimodal {

  /** A real, dependency-free image codec for binary Netpbm (P5/P6):
    * `P6\n<width> <height>\n<maxval>\n<raster>`, `#` comments allowed
    * between header tokens, 1 byte per sample (maxval <= 255).
    */
  object Netpbm {

    final case class Image(width: Int, height: Int, channels: Int,
                           pixels: Array[Byte]) {
      def sample(x: Int, y: Int, c: Int): Int =
        pixels((y * width + x) * channels + c) & 0xFF
    }

    /** Header tokenizer: skips whitespace and `#` comments. Returns the
      * next integer token and the position after it.
      */
    private def nextInt(b: Array[Byte], from: Int): (Int, Int) = {
      var i = from
      while (i < b.length && (b(i).toChar.isWhitespace || b(i) == '#')) {
        if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else i += 1
      }
      var v = 0
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
      require(i > start, s"Netpbm: expected integer at byte $start")
      (v, i)
    }

    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 2 && bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'),
        "Netpbm: not a P5/P6 image")
      val channels = if (bytes(1) == '6') 3 else 1
      val (w, i1) = nextInt(bytes, 2)
      val (h, i2) = nextInt(bytes, i1)
      val (maxval, i3) = nextInt(bytes, i2)
      require(maxval > 0 && maxval <= 255, s"Netpbm: unsupported maxval $maxval")
      // spec: exactly ONE whitespace byte after maxval, and it must BE
      // whitespace — 'P6 2 2 255' straight into the raster, or a CRLF
      // two-byte terminator, would otherwise shift every sample silently
      require(i3 < bytes.length && bytes(i3).toChar.isWhitespace,
        "Netpbm: missing whitespace after maxval")
      require(bytes(i3) != '\r', "Netpbm: CRLF header terminator not supported (raster offset would be ambiguous)")
      val rasterStart = i3 + 1
      require(w > 0 && h > 0 && w.toLong * h * channels <= Int.MaxValue,
        s"Netpbm: implausible dimensions ${w}x$h")
      val n = w * h * channels
      require(bytes.length >= rasterStart + n,
        s"Netpbm: raster truncated (${bytes.length - rasterStart} of $n bytes)")
      Image(w, h, channels, java.util.Arrays.copyOfRange(bytes, rasterStart, rasterStart + n))
    }

    def encode(img: Image): Array[Byte] = {
      val header = s"P${if (img.channels == 3) 6 else 5}\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    /** Real nearest-neighbor resample. */
    def resize(img: Image, w: Int, h: Int): Image = {
      val out = new Array[Byte](w * h * img.channels)
      var y = 0
      while (y < h) {
        val sy = math.min(img.height - 1, y * img.height / h)
        var x = 0
        while (x < w) {
          val sx = math.min(img.width - 1, x * img.width / w)
          var c = 0
          while (c < img.channels) {
            out((y * w + x) * img.channels + c) =
              img.pixels((sy * img.width + sx) * img.channels + c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      Image(w, h, img.channels, out)
    }

    /** Per-channel mean intensities in [0, 255]. */
    def channelMeans(img: Image): Array[Double] = {
      val sums = new Array[Double](img.channels)
      var i = 0
      while (i < img.pixels.length) {
        sums(i % img.channels) += img.pixels(i) & 0xFF
        i += 1
      }
      sums.map(_ / (img.width.toLong * img.height))
    }

    /** Grid-pooled mean-intensity features (`grid`×`grid` cells × channels,
      * normalized to [0,1]) — the classic pre-CNN baseline descriptor, and a
      * real stand-in for an embedding in the ANN/dedup operators.
      */
    def gridFeatures(img: Image, grid: Int = 4): Array[Float] = {
      val out = new Array[Float](grid * grid * img.channels)
      val counts = new Array[Int](grid * grid)
      val sums = new Array[Double](grid * grid * img.channels)
      var y = 0
      while (y < img.height) {
        val gy = math.min(grid - 1, y * grid / img.height)
        var x = 0
        while (x < img.width) {
          val gx = math.min(grid - 1, x * grid / img.width)
          val cell = gy * grid + gx
          counts(cell) += 1
          var c = 0
          while (c < img.channels) {
            sums(cell * img.channels + c) += img.sample(x, y, c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      var cell = 0
      while (cell < grid * grid) {
        var c = 0
        while (c < img.channels) {
          out(cell * img.channels + c) =
            if (counts(cell) == 0) 0f
            else (sums(cell * img.channels + c) / counts(cell) / 255.0).toFloat
          c += 1
        }
        cell += 1
      }
      out
    }

    /** Deterministic synthetic P6 image (id-seeded gradient + stripe) for
      * tests and the demo table — the container ships no real media files.
      */
    def synthetic(id: Long, w: Int = 32, h: Int = 24): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (y * w + x) * 3
          px(base) = (x * 255 / math.max(1, w - 1)).toByte
          px(base + 1) = (y * 255 / math.max(1, h - 1)).toByte
          px(base + 2) = (((x + y + id) % 16) * 16).toByte
          x += 1
        }
        y += 1
      }
      encode(Image(w, h, 3, px))
    }
  }

  /** A real, dependency-free audio codec for RIFF/WAVE PCM (the canonical
    * uncompressed audio container): `RIFF<size>WAVE` + `fmt ` chunk
    * (PCM, 16-bit little-endian) + `data` chunk. Unknown chunks (LIST,
    * fact, ...) are skipped by their declared size, as the format requires.
    */
  object Wav {

    /** Interleaved 16-bit samples; `samples.length` = frames × channels. */
    final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
      def nFrames: Int = samples.length / channels
    }

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    def decode(bytes: Array[Byte]): Audio = {
      require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
        "Wav: not a RIFF/WAVE stream")
      var i = 12
      var rate = -1; var channels = -1; var bits = -1
      var data: Array[Short] = null
      while (i + 8 <= bytes.length && (data == null || rate < 0)) {
        val id = tag(bytes, i)
        val sz = le32(bytes, i + 4)
        require(sz >= 0 && i + 8 + sz <= bytes.length, s"Wav: chunk '$id' overruns the stream")
        id match {
          case "fmt " =>
            require(sz >= 16, "Wav: fmt chunk too short")
            val fmt = le16(bytes, i + 8)
            require(fmt == 1, s"Wav: only PCM (format 1) supported, got $fmt")
            channels = le16(bytes, i + 10)
            rate = le32(bytes, i + 12)
            bits = le16(bytes, i + 22)
            require(bits == 16, s"Wav: only 16-bit PCM supported, got $bits")
            require(channels >= 1 && channels <= 8 && rate > 0, "Wav: implausible fmt")
          case "data" =>
            require(sz % 2 == 0, "Wav: odd data chunk size for 16-bit PCM")
            data = new Array[Short](sz / 2)
            var j = 0
            while (j < data.length) { data(j) = le16(bytes, i + 8 + j * 2).toShort; j += 1 }
          case _ => // LIST/fact/...: skip by declared size
        }
        i += 8 + sz + (sz & 1) // chunks are word-aligned; odd sizes carry a pad byte
      }
      require(rate > 0, "Wav: missing fmt chunk")
      require(data != null, "Wav: missing data chunk")
      require(data.length % channels == 0, "Wav: sample count not divisible by channels")
      Audio(rate, channels, data)
    }

    def encode(a: Audio): Array[Byte] = {
      val dataBytes = a.samples.length * 2
      val out = new Array[Byte](44 + dataBytes)
      def putTag(i: Int, s: String): Unit = { var j = 0; while (j < 4) { out(i + j) = s.charAt(j).toByte; j += 1 } }
      def put32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte; out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
      def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      putTag(0, "RIFF"); put32(4, 36 + dataBytes); putTag(8, "WAVE")
      putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, a.channels)
      put32(24, a.sampleRate); put32(28, a.sampleRate * a.channels * 2)
      put16(32, a.channels * 2); put16(34, 16)
      putTag(36, "data"); put32(40, dataBytes)
      var j = 0
      while (j < a.samples.length) { put16(44 + j * 2, a.samples(j)); j += 1 }
      out
    }

    /** Deterministic synthetic mono sawtooth, closed-form per sample so the
      * decode path is oracle-checkable:
      * `s(i) = ((i * (3 + id % 5) + id) % 4096 - 2048) * 8` at 8 kHz,
      * `n = 1600 + (id % 7) * 160` samples (0.20–0.32 s).
      */
    def synthetic(id: Long): Array[Byte] = {
      val n = (1600 + (id % 7) * 160).toInt
      val k = 3 + (id % 5)
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = (((i * k + id) % 4096 - 2048) * 8).toShort
        i += 1
      }
      encode(Audio(8000, 1, samples))
    }
  }

  /** A real, dependency-free video codec for YUV4MPEG2 (the uncompressed
    * planar-YUV interchange format used by ffmpeg/mjpegtools): one ASCII
    * header line `YUV4MPEG2 W<w> H<h> F<num>:<den> ...`, then per frame an
    * ASCII `FRAME...\n` marker followed by a raw 4:2:0 plane dump
    * (w·h luma + 2·(w/2)·(h/2) chroma bytes).
    */
  object Y4m {

    /** Each frame is one planar 4:2:0 buffer: Y then U then V. */
    final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                           frames: Array[Array[Byte]]) {
      def lumaSize: Int = width * height
      def chromaSize: Int = (width / 2) * (height / 2)
    }

    def decode(bytes: Array[Byte]): Video = {
      var eol = 0
      while (eol < bytes.length && bytes(eol) != '\n') eol += 1
      require(eol < bytes.length, "Y4m: missing header terminator")
      val header = new String(bytes, 0, eol, "US-ASCII")
      val toks = header.split(" ")
      require(toks.nonEmpty && toks(0) == "YUV4MPEG2", "Y4m: not a YUV4MPEG2 stream")
      var w = -1; var h = -1; var fn = 25; var fd = 1
      toks.drop(1).foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'F' =>
            val Array(a, b) = t.substring(1).split(":")
            fn = a.toInt; fd = b.toInt
          case 'C' => require(t.startsWith("C420"), s"Y4m: only 4:2:0 supported, got $t")
          case _ => // I (interlace), A (aspect), X (extensions): ignored
        }
      }
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, s"Y4m: implausible/odd dimensions ${w}x$h")
      val frameSize = w * h + 2 * (w / 2) * (h / 2)
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      var i = eol + 1
      while (i < bytes.length) {
        require(i + 5 <= bytes.length && new String(bytes, i, 5, "US-ASCII") == "FRAME",
          s"Y4m: expected FRAME marker at byte $i")
        var j = i + 5
        while (j < bytes.length && bytes(j) != '\n') j += 1 // frame params: skip
        require(j < bytes.length && j + 1 + frameSize <= bytes.length,
          s"Y4m: frame ${frames.length} truncated")
        frames += java.util.Arrays.copyOfRange(bytes, j + 1, j + 1 + frameSize)
        i = j + 1 + frameSize
      }
      require(frames.nonEmpty, "Y4m: no frames")
      Video(w, h, fn, fd, frames.toArray)
    }

    def encode(v: Video): Array[Byte] = {
      val header = s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C420\n"
        .getBytes("US-ASCII")
      val marker = "FRAME\n".getBytes("US-ASCII")
      val frameSize = v.lumaSize + 2 * v.chromaSize
      val out = new Array[Byte](header.length + v.frames.length * (marker.length + frameSize))
      System.arraycopy(header, 0, out, 0, header.length)
      var pos = header.length
      v.frames.foreach { f =>
        require(f.length == frameSize, "Y4m: frame buffer size mismatch")
        System.arraycopy(marker, 0, out, pos, marker.length); pos += marker.length
        System.arraycopy(f, 0, out, pos, frameSize); pos += frameSize
      }
      out
    }

    /** Deterministic synthetic 16x12 4:2:0 clip, closed-form per plane so
      * the decode path is oracle-checkable: `nFrames = 4 + id % 3`,
      * `Y(x,y,f) = (x*7 + y*5 + f*11 + id) % 256`,
      * `U = (x*3 + y + f + id) % 256`, `V = (x + y*3 + f*2 + id) % 256`
      * on the 8x6 chroma grid.
      */
    def synthetic(id: Long, w: Int = 16, h: Int = 12): Array[Byte] = {
      val nFrames = (4 + id % 3).toInt
      val (cw, ch) = (w / 2, h / 2)
      val frames = Array.tabulate(nFrames) { f =>
        val buf = new Array[Byte](w * h + 2 * cw * ch)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { buf(y * w + x) = ((x * 7 + y * 5 + f * 11 + id) % 256).toByte; x += 1 }
          y += 1
        }
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            buf(w * h + cy * cw + cx) = ((cx * 3 + cy + f + id) % 256).toByte
            buf(w * h + cw * ch + cy * cw + cx) = ((cx + cy * 3 + f * 2 + id) % 256).toByte
            cx += 1
          }
          cy += 1
        }
        buf
      }
      encode(Video(w, h, 25, 1, frames))
    }
  }

  /** REAL compressed-image codec on the JDK's built-in `javax.imageio`
    * (PNG/JPEG/BMP/GIF — no external libraries). PNG is lossless, so
    * `decode(encodePng(img))` reproduces the raster byte-exactly, which is
    * what makes the mm_features oracle closed-form. The raster is always
    * surfaced as 3-channel RGB (ImageIO normalizes palettes/grayscale).
    */
  object ImageIoCodec {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    def encodePng(img: Netpbm.Image): Array[Byte] = {
      val bi = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val r = img.sample(x, y, 0)
          val g = if (img.channels == 3) img.sample(x, y, 1) else r
          val b = if (img.channels == 3) img.sample(x, y, 2) else r
          bi.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(ImageIO.write(bi, "png", bos), "ImageIO: no PNG writer available")
      bos.toByteArray
    }

    def decode(bytes: Array[Byte]): Netpbm.Image = {
      val bi = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(bi != null, "ImageIO: unsupported or corrupt image bytes")
      val (w, h) = (bi.getWidth, bi.getHeight)
      require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue,
        s"ImageIO: implausible dimensions ${w}x$h")
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = bi.getRGB(x, y)
          val base = (y * w + x) * 3
          px(base) = ((rgb >> 16) & 0xFF).toByte
          px(base + 1) = ((rgb >> 8) & 0xFF).toByte
          px(base + 2) = (rgb & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      Netpbm.Image(w, h, 3, px)
    }

    /** Container format by magic bytes (metadata without a full decode). */
    def formatOf(bytes: Array[Byte]): String =
      if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) "jpeg"
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
      else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
      else if (bytes.length >= 2 && bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6')) "netpbm"
      else "unknown"
  }

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)
  ))

  /** Deterministic fake codec: derives plausible metadata and "features"
    * purely from the byte content. Replace with a real decoder (javacv /
    * ImageIO) by swapping these functions — the Spark plumbing is unchanged.
    */
  object FakeCodec {
    def decodeMeta(bytes: Array[Byte], mediaType: String): Row = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 1920)
      val ht = 64 + math.abs((h / 7) % 1080)
      Row(mediaType, w, ht, 3, math.abs(h.toLong % 600000L), "fake")
    }
    /** Stubbed feature extraction: a fixed-length deterministic float
      * vector per blob (stands in for a CNN embedding).
      */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var acc = 1469598103934665603L // FNV offset
      var i = 0
      while (i < bytes.length) { acc = (acc ^ bytes(i)) * 1099511628211L; i += 1 }
      var j = 0
      while (j < dim) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        out(j) = ((acc >>> 40).toInt % 1000) / 1000.0f
        j += 1
      }
      out
    }
    /** Stubbed resize: at 100 TB this re-encodes the blob; here it tags the
      * metadata and truncates bytes deterministically.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, math.min(bytes.length, math.max(16, (w * h) / 64)))
  }

  /** Build a media table from any frame with a binary column: attaches the
    * typed metadata struct. Narrow, batch-at-a-time via mapPartitions (the
    * batch shape a real decoder needs — amortized codec init per partition).
    */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame = {
    // the stub metadata is a deterministic SQL expression of the bytes —
    // stays inside codegen; a real decoder would use extractFeatures' shape
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      (lit(64) + pmod(abs(xxhash64(col(binCol))), lit(1920)).cast("int")).as("width"),
      (lit(64) + pmod(abs(xxhash64(col(binCol), lit(7))), lit(1080)).cast("int")).as("height"),
      lit(3).as("channels"),
      pmod(abs(xxhash64(col(binCol), lit(13))), lit(600000L)).as("duration_ms"),
      lit("fake").as("codec")))
  }

  /** Feature-extraction over binary blobs with partition-batch processing —
    * the real-decoder integration point. Returns (id, features array).
    */
  def extractFeatures(df: DataFrame, binCol: String, idCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { iter =>
      // per-partition: init codec once (here: nothing to init for the stub)
      iter.map { case (id, bytes) => (id, FakeCodec.features(bytes, dim)) }
    }.toDF(idCol, "features")
  }

  /** Frame-sampling plumbing for video-ish blobs: emits `n` (frame_index,
    * frame_bytes) rows per blob — the explode shape used for frame-level
    * datasets. Frame bytes are stub slices.
    */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String, n: Int = 4): DataFrame = {
    df.select(col(idCol), col(binCol).as("__b"))
      .withColumn("frame_index", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_bytes",
        substring(col("__b"), (col("frame_index") * greatest(length(col("__b")) / n, lit(1))).cast("int") + 1,
          lit(16)))
      .drop("__b")
  }

  /** Synthesize a demo media table from the documents table (text bytes as
    * blobs) — used by tests and SparkEntry since the container ships no
    * real media files.
    */
  def demoMediaTable(documents: DataFrame): DataFrame = {
    val withBin = documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
    withMediaMeta(withBin, "blob", "image/fake")
  }

  /** A demo IMAGE table: one deterministic synthetic P6 blob per document
    * id. Real bytes, real decode path — only the pixels are synthetic.
    */
  def demoImageTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, Netpbm.synthetic(id))))
      .toDF("doc_id", "blob")
  }

  /** A demo PNG table: the same deterministic gradient raster as
    * demoImageTable, but compressed through the real PNG encoder — the
    * decode side then exercises a genuine compressed-codec path.
    */
  def demoPngTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        (id, ImageIoCodec.encodePng(Netpbm.decode(Netpbm.synthetic(id))))))
      .toDF("doc_id", "blob")
  }

  /** REAL media metadata from compressed blobs: ImageIO decode for
    * dimensions, magic bytes for the container format. Same mapPartitions
    * batch shape as the stub it replaces.
    */
  def imageMediaMeta(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = ImageIoCodec.decode(bytes)
        (id, "image/" + ImageIoCodec.formatOf(bytes), img.width, img.height,
          img.channels, 0L, ImageIoCodec.formatOf(bytes))
      })
      .toDF(idCol, "media_type", "width", "height", "channels", "duration_ms", "codec")
  }

  /** REAL grid-pooled features from compressed (PNG/JPEG) blobs — the
    * embedding-shaped Array[Float] for the ANN/dedup operators.
    */
  def imageIoGridFeatures(df: DataFrame, binCol: String, idCol: String,
                          grid: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, Netpbm.gridFeatures(ImageIoCodec.decode(bytes), grid))
      })
      .toDF(idCol, "features")
  }

  /** Integer-exact grid pooling over compressed blobs: one row per (id,
    * cell) with per-channel pixel SUMS. This is the oracle-checkable twin of
    * imageIoGridFeatures — sums of decoded bytes are integers, so a DuckDB
    * closed form hash-matches exactly where float division cannot.
    */
  def imageCellSums(df: DataFrame, binCol: String, idCol: String,
                    grid: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val img = ImageIoCodec.decode(bytes)
        val cells = grid * grid
        val nPx = new Array[Long](cells)
        val sums = Array.ofDim[Long](3, cells)
        var y = 0
        while (y < img.height) {
          val gy = math.min(grid - 1, y * grid / img.height)
          var x = 0
          while (x < img.width) {
            val cell = gy * grid + math.min(grid - 1, x * grid / img.width)
            nPx(cell) += 1
            var c = 0
            while (c < 3) { sums(c)(cell) += img.sample(x, y, c); c += 1 }
            x += 1
          }
          y += 1
        }
        (0 until cells).iterator.map(cell =>
          (id, cell, nPx(cell), sums(0)(cell), sums(1)(cell), sums(2)(cell)))
      })
      .toDF(idCol, "cell", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** REAL image decode over Netpbm blobs with partition-batch processing:
    * metadata + per-channel means from the actual raster. One decode per
    * blob; at 100 TB this is the mapInPandas batch shape with the codec
    * initialized once per partition.
    */
  def decodeImages(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = Netpbm.decode(bytes)
        val m = Netpbm.channelMeans(img)
        (id, img.width, img.height, img.channels,
          m(0), if (img.channels == 3) m(1) else m(0), if (img.channels == 3) m(2) else m(0))
      })
      .toDF(idCol, "width", "height", "channels", "mean_r", "mean_g", "mean_b")
  }

  /** REAL nearest-neighbor image resize: blobs in, re-encoded blobs out. */
  def resizeImages(df: DataFrame, binCol: String, idCol: String,
                   w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, Netpbm.encode(Netpbm.resize(Netpbm.decode(bytes), w, h)))
      })
      .toDF(idCol, binCol)
  }

  /** REAL grid-pooled image features — embedding-shaped `Array[Float]`,
    * directly usable by the Similarity/Dedup ANN operators.
    */
  def imageGridFeatures(df: DataFrame, binCol: String, idCol: String,
                        grid: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, Netpbm.gridFeatures(Netpbm.decode(bytes), grid))
      })
      .toDF(idCol, "features")
  }

  /** A demo AUDIO table: one deterministic synthetic WAV blob per document
    * id. Real RIFF/PCM bytes, real decode path — only the waveform is
    * synthetic.
    */
  def demoWavTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, Wav.synthetic(id))))
      .toDF("doc_id", "blob")
  }

  /** REAL audio decode + feature extraction over WAV blobs: parses the
    * RIFF container for real and reduces the PCM samples to integer-exact
    * signal statistics (peak, zero crossings, absolute/squared energy) —
    * every column hash-checkable against a closed-form oracle. Same
    * mapPartitions batch shape as the image codecs.
    */
  def audioFeatures(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val a = Wav.decode(bytes)
        var peak = 0L; var zc = 0L; var sumAbs = 0L; var sumSq = 0L
        var i = 0
        while (i < a.samples.length) {
          val v = a.samples(i).toLong
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && a.samples(i - 1).toLong * v < 0) zc += 1
          sumAbs += math.abs(v); sumSq += v * v
          i += 1
        }
        (id, a.nFrames.toLong, a.sampleRate, a.channels,
          a.nFrames.toLong * 1000 / a.sampleRate, peak, zc, sumAbs, sumSq)
      })
      .toDF(idCol, "n_samples", "sample_rate", "channels", "duration_ms",
        "peak_abs", "n_zero_cross", "sum_abs", "sum_sq")
  }

  /** A demo VIDEO table: one deterministic synthetic Y4M clip per document
    * id. Real YUV4MPEG2 bytes, real frame parsing.
    */
  def demoY4mTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, Y4m.synthetic(id))))
      .toDF("doc_id", "blob")
  }

  /** REAL video decode over Y4M blobs: metadata plus integer-exact plane
    * sums across all frames — the whole container walk (header, frame
    * markers, plane offsets) is hash-gated by the closed-form oracle.
    */
  def videoFeatures(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = Y4m.decode(bytes)
        var ySum = 0L; var uSum = 0L; var vSum = 0L
        v.frames.foreach { f =>
          var i = 0
          while (i < v.lumaSize) { ySum += (f(i) & 0xFF); i += 1 }
          while (i < v.lumaSize + v.chromaSize) { uSum += (f(i) & 0xFF); i += 1 }
          while (i < f.length) { vSum += (f(i) & 0xFF); i += 1 }
        }
        (id, v.width, v.height, v.fpsNum, v.fpsDen, v.frames.length.toLong,
          ySum, uSum, vSum)
      })
      .toDF(idCol, "width", "height", "fps_num", "fps_den", "n_frames",
        "y_sum", "u_sum", "v_sum")
  }

  /** REAL frame sampling: decode the clip, keep every `step`-th frame, emit
    * one row per kept frame with its integer-exact luma sum — the
    * frame-level explode shape used to build frame datasets, with genuine
    * per-frame decode behind it.
    */
  def sampleFramesReal(df: DataFrame, binCol: String, idCol: String,
                       step: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val v = Y4m.decode(bytes)
        (0 until v.frames.length by step).iterator.map { fi =>
          val f = v.frames(fi)
          var s = 0L; var i = 0
          while (i < v.lumaSize) { s += (f(i) & 0xFF); i += 1 }
          (id, fi, s)
        }
      })
      .toDF(idCol, "frame_index", "frame_y_sum")
  }
}
