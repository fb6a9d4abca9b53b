package graft.ktk

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.UrlCodec

/** Dataset catalog metadata, the Spark-side equivalent of
  * `DatasetMetadataBase` (kartothek/core/dataset.py:62-96): uuid, explicit
  * partition list (label → relative file path), partition keys, secondary
  * index registry, schema (`_common_metadata` equivalent, stored as Spark
  * StructType JSON), and free-form user metadata.
  *
  * Storage layout (≙ docs/spec/storage_layout.rst):
  * {{{
  *   <base>/<uuid>.by-dataset-metadata.json        // THE single-blob commit point
  *   <base>/<uuid>/table/<k1>=<v1>/.../part-*.parquet
  *   <base>/<uuid>/indices/<column>.parquet        // (value, partitions array<string>)
  * }}}
  */
final case class DatasetMetadata(
    uuid: String,
    metadataVersion: Int = 4,
    partitionKeys: Seq[String] = Nil,
    // label (relative file path under <uuid>/table/) → byte size
    partitions: Map[String, Long] = Map.empty,
    // label → commit sequence number; later commits override earlier ones in
    // overlay (keep-last) reads. This pins the reference's "later-loaded
    // partitions win" contract (_group.py:139-144) to commit order, which
    // Spark's random part-file names cannot provide.
    partitionSeq: Map[String, Long] = Map.empty,
    // indexed column → relative index file path under <uuid>/indices/
    indices: Map[String, String] = Map.empty,
    // LEGACY inline zone maps: column → label → [min, max] strings. Older
    // blobs carry ranges inline; new writes keep the blob O(#files) labels
    // only and store ranges in the `zones` sidecar registry below. Read
    // paths honor both; the first update/compact migrates inline → sidecar.
    zoneMaps: Map[String, Map[String, Seq[String]]] = Map.empty,
    // zone-map sidecar registry: column → relative parquet path under
    // <uuid>/zones/ holding one (label, mn, mx) row per data file (null
    // mn/mx = all-null file). Metadata-level range skipping: files whose
    // [min, max] excludes a predicate are never SCHEDULED. Same pattern as
    // `blooms` — the catalog blob carries only this registry, so planning
    // loads stay distributed and the commit object never inlines ranges.
    zones: Map[String, String] = Map.empty,
    // per-file Bloom filters: column → relative sidecar path under
    // <uuid>/blooms/. Equality/IN data skipping on high-cardinality columns
    // where zone ranges are too wide and a full secondary index too big:
    // the sidecar holds one (label, bloom bytes) row per file, the catalog
    // blob only this registry — probe passes stay distributed.
    blooms: Map[String, String] = Map.empty,
    schemaJson: String = "",
    metadata: Map[String, String] = Map.empty) {

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** Commit version this blob was stored at (0 = legacy, pre-versioning). */
  def version: Long =
    metadata.get(DatasetMetadata.VersionKey).map(_.toLong).getOrElse(0L)

  def tableDir(base: String): String = s"$base/$uuid/table"

  def fileFor(base: String, label: String): String = s"${tableDir(base)}/$label"

  def seqOf(label: String): Long =
    // Jackson deserializes the erased Map[String, Long] values as the
    // narrowest integral type; widen via Number instead of unboxing
    Option(partitionSeq).map(_.asInstanceOf[Map[String, Any]]).flatMap(_.get(label)) match {
      case Some(num: Number) => num.longValue()
      case Some(other)       => other.toString.toLong
      case None              => 0L
    }

  /** Byte size of a partition label, widening-safe like [[seqOf]] (Jackson
    * narrows integral map values on deserialization).
    */
  def sizeOf(label: String): Long =
    Option(partitions).map(_.asInstanceOf[Map[String, Any]]).flatMap(_.get(label)) match {
      case Some(num: Number) => num.longValue()
      case Some(other)       => other.toString.toLong
      case None              => 0L
    }

  /** Decode the Hive-style key=value pairs of one partition label. */
  def partitionValues(label: String): Map[String, String] =
    UrlCodec.decodePartitionPath(label).toMap

  def indexPath(base: String, column: String): String =
    s"$base/$uuid/indices/${indices(column)}"

  /** Bloom registry, null-safe against pre-bloom metadata blobs (Jackson
    * leaves absent fields null rather than applying case-class defaults).
    */
  def bloomRegistry: Map[String, String] = Option(blooms).getOrElse(Map.empty)

  def bloomPath(base: String, column: String): String =
    s"$base/$uuid/blooms/${bloomRegistry(column)}"

  /** Zone sidecar registry, null-safe against pre-zones metadata blobs. */
  def zoneRegistry: Map[String, String] = Option(zones).getOrElse(Map.empty)

  def zonePath(base: String, column: String): String =
    s"$base/$uuid/zones/${zoneRegistry(column)}"

  /** Legacy inline zone maps, null-safe. */
  def inlineZoneMaps: Map[String, Map[String, Seq[String]]] =
    Option(zoneMaps).getOrElse(Map.empty)

  /** All columns with zone-range skipping available (sidecar or legacy). */
  def zoneColumns: Set[String] = zoneRegistry.keySet ++ inlineZoneMaps.keySet
}

/** A commit raced another writer and lost: the version it tried to claim
  * was already written. Reload the dataset and re-apply the change.
  */
final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

object DatasetMetadata {
  val Suffix = ".by-dataset-metadata.json"

  /** Commit version of a blob, stamped into `metadata` on every store —
    * the monotonically increasing snapshot id time travel addresses.
    */
  val VersionKey = "graft.version"

  /** High watermark of assigned commit sequence numbers. Seq numbers drive
    * overlay (keep-last) ordering and the change feed's rewrite detection;
    * the watermark keeps them MONOTONE even when a delete scope removes the
    * newest labels before an append.
    */
  val SeqHwmKey = "graft.seq_hwm"

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def metadataKey(base: String, uuid: String): String = s"$base/$uuid$Suffix"

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(hadoopConf(spark))

  private def hadoopConf(spark: SparkSession): Configuration =
    spark.sessionState.newHadoopConf()

  def versionsDir(base: String, uuid: String): String = s"$base/$uuid/_versions"

  def versionKey(base: String, uuid: String, v: Long): String =
    f"${versionsDir(base, uuid)}/v$v%08d.json"

  /** All snapshot versions present, ascending. O(#versions) flat listing —
    * bounded by [[graft.ktk.Ktk.garbageCollect]]'s retention pruning.
    */
  def listVersions(spark: SparkSession, base: String, uuid: String): Seq[Long] = {
    val dir = new Path(versionsDir(base, uuid))
    val filesystem = fs(spark, base)
    if (!filesystem.exists(dir)) Nil
    else filesystem.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  /** Load the immutable snapshot of one commit (time travel). */
  def loadVersion(spark: SparkSession, base: String, uuid: String, v: Long): DatasetMetadata = {
    val key = new Path(versionKey(base, uuid, v))
    val filesystem = fs(spark, base)
    if (!filesystem.exists(key))
      throw new NoSuchElementException(
        s"Dataset '$uuid' has no version $v at $key (vacuumed by gc, or never committed); " +
          s"available: ${listVersions(spark, base, uuid).mkString(",")}")
    val in = filesystem.open(key)
    try mapper.readValue(in: java.io.InputStream, classOf[DatasetMetadata])
    finally in.close()
  }

  /** Single-put commit (≙ store_dataset_from_partitions' one-blob write,
    * io_components/write.py:232-241), versioned: first CLAIM the next
    * version by writing the immutable snapshot blob
    * `<uuid>/_versions/v<n>.json` with create-no-overwrite — on HDFS an
    * atomic namespace claim, so of two racing writers that both loaded
    * version n-1 exactly one creates v<n> and the loser gets
    * [[ConcurrentCommitException]] (optimistic concurrency, the guarantee
    * the reference's last-writer-wins blob never had). CAVEAT: the claim is
    * only as atomic as the filesystem's create-no-overwrite — HDFS enforces
    * it in the namespace, but local ChecksumFileSystem and S3A implement it
    * as check-then-create, leaving a narrow window where two racers can
    * both "win" v<n>; on such stores treat the guarantee as best-effort
    * (S3 users should front commits with a conditional-put or locking
    * layer). Then publish the LATEST pointer by rename WITH OVERWRITE
    * (`FileContext.rename(..., Options.Rename.OVERWRITE)`) — atomic on
    * HDFS/local, so a concurrent reader observes either the previous or the
    * next complete commit, never an absent dataset (SPEC.md §commit). On
    * S3A a rename is copy+delete but the pointer is still
    * last-writer-wins; the version claim stays conditional.
    *
    * The parent version is taken from `metadata(VersionKey)` as stamped by
    * the load the caller mutated — metadata never loaded (fresh store,
    * legacy blob) falls back to the max snapshot on disk.
    */
  def store(spark: SparkSession, base: String, md0: DatasetMetadata): DatasetMetadata = {
    val filesystem = fs(spark, base)
    val parent = md0.metadata.get(VersionKey).map(_.toLong)
      .getOrElse(listVersions(spark, base, md0.uuid).lastOption.getOrElse(0L))
    val newV = parent + 1
    val md = md0.copy(metadata = md0.metadata + (VersionKey -> newV.toString))
    val key = new Path(metadataKey(base, md.uuid))
    val tmp = new Path(key.getParent, s".${key.getName}.tmp")
    // pretty JSON is a debugging aid; past ~1k partitions the blob is
    // machine-read only and the indentation roughly doubles its size, so
    // large catalogs switch to compact form (same Jackson model both ways)
    val writer =
      if (md.partitions.size > 1000) mapper.writer()
      else mapper.writerWithDefaultPrettyPrinter()
    val bytes = writer.writeValueAsBytes(md)

    // 1. the conditional version claim (immutable snapshot)
    val vKey = new Path(versionKey(base, md.uuid, newV))
    filesystem.mkdirs(vKey.getParent)
    val vOut =
      try filesystem.create(vKey, false)
      catch { case e: java.io.IOException =>
        if (filesystem.exists(vKey))
          throw new ConcurrentCommitException(
            s"Dataset '${md.uuid}' version $newV was committed concurrently " +
              s"(this writer loaded version $parent); reload and retry")
        else throw e
      }
    try vOut.write(bytes) finally vOut.close()

    // 2. the latest pointer
    val out = filesystem.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        key.toUri, hadoopConf(spark))
      fc.rename(filesystem.makeQualified(tmp), filesystem.makeQualified(key),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        // object stores without FileContext: non-atomic fallback, still
        // last-writer-wins at the blob level
        if (filesystem.exists(key)) filesystem.delete(key, false)
        if (!filesystem.rename(tmp, key))
          throw new java.io.IOException(s"Failed to commit dataset metadata at $key")
    }
    md
  }

  def load(spark: SparkSession, base: String, uuid: String): DatasetMetadata = {
    val key = new Path(metadataKey(base, uuid))
    val filesystem = fs(spark, base)
    // Readers can race the latest-pointer swap: checksum filesystems
    // (file://) rename data + crc non-atomically, and the non-FileContext
    // fallback has a delete→rename window. A reader catching either moment
    // sees a transient checksum error / absent key while the _versions dir
    // proves the dataset exists — retry briefly before concluding anything.
    var attempt = 0
    while (true) {
      val transientlyAbsent =
        !filesystem.exists(key) && filesystem.exists(new Path(versionsDir(base, uuid)))
      if (!filesystem.exists(key) && !transientlyAbsent)
        throw new NoSuchElementException(s"Dataset '$uuid' not found at $key")
      try {
        if (transientlyAbsent) throw new java.io.IOException(s"mid-commit: $key absent")
        val in = filesystem.open(key)
        try return mapper.readValue(in: java.io.InputStream, classOf[DatasetMetadata])
        finally in.close()
      } catch {
        case e: java.io.IOException if attempt < 5 =>
          attempt += 1
          Thread.sleep(20L * attempt)
        case e: java.io.FileNotFoundException =>
          throw new NoSuchElementException(s"Dataset '$uuid' not found at $key")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def exists(spark: SparkSession, base: String, uuid: String): Boolean =
    fs(spark, base).exists(new Path(metadataKey(base, uuid)))

  /** List dataset uuids under a base path (≙ cube discovery's store scan,
    * api/discover.py:87-190).
    */
  def listDatasets(spark: SparkSession, base: String): Seq[String] = {
    val dir = new Path(base)
    val filesystem = fs(spark, base)
    if (!filesystem.exists(dir)) Nil
    else filesystem.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(Suffix))
      .map(_.dropRight(Suffix.length))
      .sorted
  }

  /** Recursive metadata-dict merge keeping only globally-consistent keys
    * (≙ combine_metadata, io_components/utils.py:45-118): a key kept only if
    * every input that has it agrees on the value.
    */
  def combineMetadata(metas: Seq[Map[String, String]]): Map[String, String] = {
    val keys = metas.flatMap(_.keySet).distinct
    keys.flatMap { k =>
      val vals = metas.flatMap(_.get(k)).distinct
      if (vals.size == 1) Some(k -> vals.head) else None
    }.toMap
  }

  /** Delete dataset: files and indices first, metadata blob LAST, preserving
    * the reference's ordering guarantee (io_components/delete.py:8-26) —
    * a dataset is discoverable only while fully present.
    */
  def delete(spark: SparkSession, base: String, uuid: String): Unit = {
    val filesystem = fs(spark, base)
    filesystem.delete(new Path(s"$base/$uuid"), true)
    filesystem.delete(new Path(metadataKey(base, uuid)), false)
  }
}
