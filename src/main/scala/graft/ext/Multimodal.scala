package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded/featurized media row. `features` is what a real decoder
  * would emit; the shape (fixed-length float vector per item) is the real
  * contract downstream similarity/dedup operators consume. */
final case class MediaFeatures(
    media_id: Long,
    mime: String,
    n_bytes: Long,
    features: Array[Float])

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode/feature-extract operators.
  *
  * The decode kernels themselves are STUBBED — this container has no
  * image/audio libraries — with clearly-marked deterministic fakes. The
  * Spark-side contract is real and tested: schema (binary + metadata
  * struct), partition-sized batch iteration (the `mapPartitions` shape a
  * JNI/FFI decoder needs to amortize model/codec init per batch), and the
  * fixed-dimension feature output that feeds Similarity/Dedup.
  */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 64

  /** Attach a fake binary payload + metadata struct to a text corpus so the
    * multimodal path has realistic shape at any scale: (id, content BINARY,
    * meta STRUCT<mime, n_bytes, width, height>). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bytes = encode(col(textCol), "UTF-8")
    // deterministic fake metadata from the engine-portable md5-prefix
    // family (graft.functions.HashFunctions.md5PrefixLong — DuckDB computes
    // the identical number via ('0x' || substr(md5(...), 1, 8))::UBIGINT,
    // so the metadata derivation is value-checkable; xxhash64 is not).
    // 8 hex chars suffice here: the value is consumed mod small constants,
    // never mod a corpus-sized stride
    def hash32(salt: String): Column =
      graft.functions.HashFunctions.md5PrefixLong(salt, col(idCol), 8)
    df.select(
      col(idCol).as("media_id"),
      bytes.as("content"),
      struct(
        // mime derived deterministically — stand-in for real sniffing
        element_at(array(lit("image/png"), lit("image/jpeg"), lit("audio/wav")),
          ((hash32("mime:") % 3) + 1).cast("int")).as("mime"),
        length(bytes).cast("long").as("n_bytes"),
        ((hash32("w:") % 1920) + 1).cast("int").as("width"),
        ((hash32("h:") % 1080) + 1).cast("int").as("height")).as("meta"))
  }

  /** STUB decode kernel — deterministic fake features from the payload
    * bytes. A real implementation decodes the image/audio and runs a
    * feature extractor; only this function changes, the operator plumbing
    * around it stays. */
  private def decodeStub(bytes: Array[Byte], mime: String): Array[Float] = {
    // ??? <- real decoder goes here; deterministic fake keeps tests running
    val h = java.util.Arrays.hashCode(bytes)
    Array.tabulate(FeatureDim)(i => ((h * (i + 1)).toFloat / Int.MaxValue))
  }

  /** Batch-shaped feature extraction: iterate each partition in batches of
    * [[BatchSize]] (mirrors `mapInPandas` batch semantics — a real codec or
    * model amortizes per-batch setup), emitting fixed-dim features. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"), col("meta.mime").as("mime"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          // per-batch setup happens here (decoder/model init in real impl).
          // NULL payloads (a null source column encodes to null bytes)
          // become zero-byte features instead of a task-killing NPE.
          batch.map { case (id, bytes, mime) =>
            val b = if (bytes == null) Array.emptyByteArray else bytes
            MediaFeatures(id, mime, b.length.toLong, decodeStub(b, mime))
          }
        }
      }
  }

  /** STUB resize: clamp dimensions to fit (maxW, maxH) preserving aspect
    * ratio, and stand in for the re-encoded payload by truncating bytes
    * proportionally to the area change. A real implementation swaps the
    * payload transform for a decoder+scaler; the metadata arithmetic and
    * the (id, content, meta) -> same-schema contract are the real parts —
    * a narrow per-row projection, no batch state needed. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    // scale = min(maxW/w, maxH/h, 1.0)
    val scale = least(lit(maxW).cast("double") / w, lit(maxH).cast("double") / h, lit(1.0d))
    val newW = greatest(floor(w * scale), lit(1)).cast("int")
    val newH = greatest(floor(h * scale), lit(1)).cast("int")
    val keepBytes = greatest(
      floor(length(col("content")) * (newW * newH).cast("double") / (w * h)), lit(1)).cast("int")
    media.select(
      col("media_id"),
      // real impl: decode + rescale + re-encode; stub keeps a proportional prefix
      col("content").substr(lit(1), keepBytes).as("content"),
      struct(
        col("meta.mime").as("mime"),
        keepBytes.cast("long").as("n_bytes"),
        newW.as("width"),
        newH.as("height")).as("meta"))
  }

  /** STUB frame sampling for video payloads: every `everyN`-th fixed-size
    * slice of the payload stands in for a decoded frame; real impl swaps
    * the slicer for a video decoder, the exploded output shape is real. */
  def sampleFrames(media: DataFrame, everyN: Int = 10, frameBytes: Int = 256): DataFrame = {
    val nFrames = greatest(floor(length(col("content")) / lit(frameBytes * everyN)), lit(1))
    media.select(
      col("media_id"),
      posexplode(transform(
        sequence(lit(0), (nFrames - 1).cast("int")),
        i => substring(col("content"), (i * frameBytes * everyN + 1).cast("int"), lit(frameBytes))))
        .as(Seq("frame_idx", "frame_bytes")))
  }
}
