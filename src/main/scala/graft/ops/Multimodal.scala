package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs.
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — the image/audio libraries are not in this container — behind
  * `FakeCodec`, a deterministic pure function of the bytes. Everything
  * Spark-side is real and tested: schemas, partition-preserving batch
  * processing via mapPartitions (the Scala analogue of mapInPandas batch
  * UDFs), metadata pushdown, and the blob-pointer layout used at 100 TB
  * (store bytes out-of-line, keep pointers + metadata in the table so scans
  * that only need metadata never touch blob storage).
  */
object Multimodal {

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
}
