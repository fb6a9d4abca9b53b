package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata structs, processed per-partition in batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are NOT available in this container, so the decode kernels are
  * deterministic STUBS (clearly marked) — the Spark-side contract that
  * matters at 100 TB is real and tested: schema, batch shape, partition
  * sizing, and the mapPartitions pipeline that would host a JNI/FFI codec.
  *
  * Layout guidance: binary payloads dominate partition size, so callers
  * should write with a small `spark.sql.files.maxPartitionBytes` /
  * `parquet.block.size` and partition on the metadata, never the payload.
  */
object Multimodal {

  /** Typed metadata carried beside every blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // "jpeg" | "wav" | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a raw binary column with a parsed metadata struct.
    * STUB decode: header fields are derived deterministically from the bytes
    * (length/first bytes), standing in for a real format parser.
    */
  def attachMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      when(lit(mediaType) === "image", lit("jpeg")).otherwise(lit("wav")).as("format"),
      (pmod(xxhash64(col(binCol)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(binCol), lit(1)), lit(1080)) + 1).cast("int").as("height"),
      (length(col(binCol)).cast("long") * 8).as("duration_ms")))

  /** ??? in spirit — the real decoder goes here. Deterministic fake:
    * "features" are 8 doubles derived from byte statistics, so tests can
    * assert exact values and the pipeline shape is runnable end-to-end.
    */
  private[ops] def decodeFeaturesStub(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(8)(0.0)
    val out = new Array[Double](8)
    var i = 0
    while (i < bytes.length) { out(i % 8) += (bytes(i) & 0xff) / 255.0; i += 1 }
    out.map(x => math.round(x / bytes.length * 1e6) / 1e6)
  }

  /** Feature extraction over binary media, batched per partition
    * (mapPartitions — the Scala analogue of mapInPandas batches; a real
    * impl would hand each partition's iterator to a native codec thread
    * pool). Output: id, media_meta, features array<double>.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // batch boundary: one partition = one codec session (real impl would
      // pin native resources here, amortized across the whole partition)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        Row(id, decodeFeaturesStub(bytes).toSeq)
      }
    }
  }

  /** Deterministic frame sampling plan for video blobs: every `everyMs`
    * milliseconds of the (stubbed) duration, capped at `maxFrames`. Pure
    * column math — the real frame *decode* would consume this plan in
    * [[extractFeatures]]-style batches.
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long, maxFrames: Int = 32): DataFrame =
    df.withColumn("frame_ts_ms",
      slice(sequence(lit(0L), col("media_meta.duration_ms"), lit(everyMs)), 1, maxFrames))

  /** Resize contract (STUB): records the target size in metadata; a real
    * impl rewrites the payload. Keeps schema evolution honest in tests.
    */
  def resizePlan(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media_meta", struct(
      col("media_meta.media_type"),
      col("media_meta.format"),
      lit(w).cast("int").as("width"),
      lit(h).cast("int").as("height"),
      col("media_meta.duration_ms")))
}
