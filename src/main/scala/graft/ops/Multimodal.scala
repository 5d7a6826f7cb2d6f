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
}
