package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * "decoders".
  *
  * The actual image/audio codecs are NOT available in this container, so the
  * decode step is a clearly-marked deterministic STUB (`fakeDecode`) — the
  * Spark-side contract (schema, batch shape, partitioning, decode-once
  * fusion) is real and tested, and swapping in a real codec only replaces
  * the stub function body.
  */
object Multimodal {

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),   // image | audio | video
    StructField("bytes", BinaryType, nullable = false),  // opaque payload
    StructField("width", IntegerType),                   // typed metadata…
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)
  ))

  /** Deterministic synthetic media table (payload bytes derived from the
    * asset id — reproducible across partitionings like Transcripts).
    */
  def synthesize(spark: SparkSession, n: Int, payloadBytes: Int = 4096): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, n.toLong).map { i =>
      val rng = new java.util.Random(0x5eed ^ i)
      val bytes = new Array[Byte](payloadBytes)
      rng.nextBytes(bytes)
      val kind = kinds((i % 3).toInt)
      (i, kind, bytes, 64 + rng.nextInt(64), 64 + rng.nextInt(64), 16000, 1 + rng.nextInt(64))
    }.toDF("asset_id", "kind", "bytes", "width", "height", "sample_rate", "n_frames")
  }

  /** STUB decoder: a real implementation would JNI/FFI into an image/audio
    * codec here; this deterministic fake turns the payload into a 16-bin
    * byte histogram (normalized), preserving the real contract: one call
    * per row inside mapPartitions, Array[Float] feature output.
    */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xf0) >>> 4) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < 16) { hist(j) /= bytes.length; j += 1 }
    }
    hist
  }

  /** Frame sampling STUB: pick every k-th "frame" index deterministically —
    * the real version would seek in the container; the plumbing (explode of
    * (asset, frame_idx) rows, partition preserved) is the same.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.where(col("kind") === "video")
      .select(col("asset_id"),
        explode(expr(s"sequence(0, n_frames - 1, $everyK)")).as("frame_idx"))

  /** Feature-extract: mapPartitions over the binary column, one decode per
    * row, codegen-friendly downstream (features are a plain array column).
    * Partitioning note: media rows are large (the payload); repartition by
    * asset_id first so a handful of giant assets do not pile up on one
    * task — same skew discipline as the series explode.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(col("asset_id"))
      .select(col("asset_id"), col("kind"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) => (id, kind, fakeDecode(bytes)) }
      }
      .toDF("asset_id", "kind", "features")
  }
}
