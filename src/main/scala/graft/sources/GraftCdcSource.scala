package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, PrunedScan, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ktk.{DatasetMetadata, Ktk}

/** Streaming FULL-CDC source over a graft dataset
  * (`spark.readStream.format("graft-cdc").option("uuid", u).load(base)`):
  * each micro-batch is `Ktk.readChangeFeed` over one commit-version range —
  * row-level INSERTS **and DELETES**, tagged `_change_type` /
  * `_commit_version` — the streaming complement of the append-only
  * `graft` stream (which, by contract, never emits deletes). The offset IS
  * the commit version, so restarts resume from the checkpoint with no
  * bookkeeping of our own, exactly like the append stream. This is the
  * public CHANGE DATA FEED streaming pattern (Delta's CDF source): a V1
  * `Source` whose `getBatch` re-tags the batch change-feed plan as a
  * streaming micro-batch.
  *
  * Options:
  *  - `startingVersion` (default 0): first batch starts AFTER this commit
  *    (0 = emit the whole current content as inserts first).
  *  - `maxVersionsPerTrigger`: admission control — each micro-batch
  *    advances at most this many commit versions (bounded catch-up after
  *    lag, like the append stream and `consumeChanges`).
  *  - `maxBytesPerTrigger`: byte-based admission (Delta's analog) — admit
  *    whole versions while their cumulative added data bytes fit, always
  *    at least one; composes with the version cap (tighter wins).
  *
  * Contract notes (same as `readChangeFeed`): snapshots and referenced
  * files/fragments in the consumer's lag window must survive gc
  * (`retainVersions`); a range containing a `rollback` commit fails
  * LOUDLY — restored content surfaces only as removes, so a CDC consumer
  * must re-seed (see `Ktk.mirrorChanges`), never trust the delta stream.
  * Column set is fixed at stream start: columns added by later
  * `evolveSchema` commits are projected away until the stream restarts.
  */
final class GraftCdcSource(
    spark: SparkSession,
    base: String,
    uuid: String,
    startingVersion: Long,
    maxVersionsPerTrigger: Option[Long],
    maxBytesPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** Admission rule shared with the append stream ([[StreamAdmission]]):
    * version cap, then byte cap (whole versions, cumulative ADDED data
    * bytes, always at least one — deletes ride along as fragment-sized
    * sidecars). Snapshot-cached walks, no data reads.
    */
  private def capEnd(base0: Long, cur: Long): Long =
    StreamAdmission.capEnd(spark, base, uuid, base0, cur,
      maxVersionsPerTrigger, maxBytesPerTrigger)

  private val tableSchema: StructType = DatasetMetadata.load(spark, base, uuid).schema

  override val schema: StructType = StructType(
    tableSchema.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))

  // end of the last range handed to getBatch — the admission-control base.
  // The engine restores it on restart by replaying/initializing the last
  // checkpointed batch through getBatch before the first getOffset.
  private var lastEnd: Option[Long] = None

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    // same capped/pinned computation as latestOffset — the engine drives
    // admission through that path once the mixin is present, but direct
    // callers and tests still land here and must see identical behavior
    val cur = availableNowCap.getOrElse(DatasetMetadata.load(spark, base, uuid).version)
    val base0 = lastEnd.getOrElse(startingVersion)
    val target = capEnd(base0, cur)
    if (target <= base0) None else Some(LongOffset(target))
  }

  // ---- Trigger.AvailableNow (the FileStreamSource pattern: a V1 Source
  // mixing in the V2 admission interfaces). The head version is FIXED once
  // at query start, so an AvailableNow run drains `(start, cap]` in
  // `maxVersionsPerTrigger`-bounded batches and terminates even while
  // writers keep committing; without the interface Spark falls back to
  // Trigger.Once and strands everything past the first capped batch.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(DatasetMetadata.load(spark, base, uuid).version)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Admission-controlled head for the engine's SupportsAdmissionControl
    * path (which replaces [[getOffset]] once the mixin is present).
    */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val cur = availableNowCap.getOrElse(DatasetMetadata.load(spark, base, uuid).version)
    val startV = Option(start).map {
      case l: LongOffset       => l.offset
      case s: SerializedOffset => s.json.trim.toLong
      case other               => other.json.trim.toLong
    }
    val base0 = math.max(startV.getOrElse(startingVersion), lastEnd.getOrElse(startingVersion))
    LongOffset(math.max(capEnd(base0, cur), base0))
  }

  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(DatasetMetadata.load(spark, base, uuid).version)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    // monotone ratchet: never let a stale offer re-open emitted history
    lastEnd = Some(math.max(lastEnd.getOrElse(Long.MinValue), math.max(from, to)))
    if (to <= from)
      return GraftBridge.asStreamingBatch(spark,
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    val rb = Ktk.rollbackVersions(spark, base, uuid, from, to)
    val feed =
      if (rb.isEmpty) Ktk.readChangeFeed(spark, base, uuid, from, to)
      else if (from == startingVersion) {
        // FRESH consumer (no prior state to reconcile): replaying deltas
        // across a rollback would lose the restored content (it surfaces
        // only as removes), but the snapshot at `to` IS the correct
        // bootstrap — emit it whole as inserts, exactly like a from-0
        // first batch on a rollback-free history
        Ktk.readTableAsOf(spark, base, uuid, to)
          .withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
          .withColumn("_commit_version", org.apache.spark.sql.functions.lit(to))
      } else
        throw new IllegalStateException(
          s"dataset '$uuid' was rolled back at version ${rb.head._1} (to ${rb.head._2}) " +
            "inside this stream's range: the change feed reports restored content " +
            "only as removes, so a consumer with prior state cannot continue " +
            "faithfully. Re-seed it from a snapshot at version " +
            s"${rb.last._1} or later and restart with a FRESH checkpoint (a fresh " +
            "graft-cdc stream bootstraps from the snapshot automatically); " +
            "Ktk.mirrorChanges handles the re-seed for mirror tables.")
    // stream schema is FIXED at start: later-evolved columns project away,
    // and a bootstrap snapshot that PREdates an evolution commit null-fills
    // the columns it doesn't carry yet
    val have = feed.columns.toSet
    GraftBridge.asStreamingBatch(spark,
      feed.select(schema.fields.toSeq.map { f =>
        if (have(f.name)) col(s"`${f.name}`")
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }: _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftCdcSource[$uuid @ $base]"
}

class GraftCdcSourceProvider extends StreamSourceProvider with RelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  /** BATCH change-feed read over an explicit commit range (the Delta CDF
    * batch-read pattern: `spark.read.format("delta").option("readChangeFeed",
    * true)` ≙ this format without the flag — the format name IS the flag):
    *
    * {{{
    * spark.read.format("graft-cdc")
    *   .option("uuid", u)
    *   .option("startingVersion", 3)      // changes in (3, ending]
    *   .option("endingVersion", 7)        // default: current version
    *   .load(base)
    * }}}
    *
    * `startingTimestamp` / `endingTimestamp` (ISO instant or epoch millis)
    * resolve against each commit's committed_at exactly as SQL `TIMESTAMP
    * AS OF` does: starting = every commit at-or-after the instant is
    * included; ending = latest commit at-or-before it. A range containing
    * a `rollback` commit REFUSES by default (the feed reports restored
    * content only as removes — a consumer replaying the range would lose
    * it); pass `allowRollback=true` for forensic reads that understand
    * the removes-only contract.
    */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val base = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc requires .load(<base path>)"))
    val uuid = parameters.getOrElse("uuid",
      throw new IllegalArgumentException("graft-cdc requires .option(\"uuid\", <dataset>)"))
    val cur = DatasetMetadata.load(spark, base, uuid)

    def parseTs(s: String): Long =
      if (s.matches("-?\\d+")) s.toLong
      else java.time.Instant.parse(s).toEpochMilli
    def oneOf(a: String, b: String): Unit = require(
      !(parameters.contains(a) && parameters.contains(b)),
      s"options '$a' and '$b' are mutually exclusive")
    oneOf("startingVersion", "startingTimestamp")
    oneOf("endingVersion", "endingTimestamp")

    val from: Long = parameters.get("startingVersion").map(_.toLong).orElse {
      parameters.get("startingTimestamp").map { s =>
        // include every commit whose committed_at >= ts: from = the last
        // version strictly BEFORE the instant (feed range is (from, to])
        Ktk.versionAtTimestamp(spark, base, uuid, parseTs(s) - 1L).getOrElse(0L)
      }
    }.getOrElse(0L)
    val to: Long = parameters.get("endingVersion").map(_.toLong).orElse {
      parameters.get("endingTimestamp").map { s =>
        val ts = parseTs(s)
        Ktk.versionAtTimestamp(spark, base, uuid, ts).getOrElse(throw
          new IllegalArgumentException(
            s"dataset '$uuid' has no commit at or before endingTimestamp $s"))
      }
    }.getOrElse(cur.version)
    require(from >= 0 && to <= cur.version,
      s"change range ($from, $to] outside the dataset's history (0, ${cur.version}]")
    require(from <= to, s"empty change range: startingVersion=$from > endingVersion=$to")

    val allowRollback = parameters.get("allowRollback").exists(_.toBoolean)
    if (!allowRollback) {
      val rb = Ktk.rollbackVersions(spark, base, uuid, from, to)
      if (rb.nonEmpty) throw new IllegalStateException(
        s"dataset '$uuid' was rolled back at version ${rb.head._1} (to ${rb.head._2}) " +
          "inside the requested range: the change feed reports restored content only " +
          "as removes, so replaying this range loses it. Read a snapshot " +
          "(VERSION AS OF) to re-seed, start after the rollback commit, or pass " +
          "option(\"allowRollback\", \"true\") if the removes-only view is intended.")
    }
    new GraftCdcRelation(sqlContext, base, uuid, from, to)
  }

  private def params(parameters: Map[String, String])
      : (String, String, Long, Option[Long], Option[Long]) = {
    val base = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-cdc source requires .load(<base path>)"))
    val uuid = parameters.getOrElse("uuid",
      throw new IllegalArgumentException("graft-cdc source requires .option(\"uuid\", <dataset>)"))
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val maxPer = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxPer.foreach(n => require(n >= 1L, "maxVersionsPerTrigger must be >= 1"))
    val maxBytes = parameters.get("maxBytesPerTrigger").map(_.toLong)
    maxBytes.foreach(n => require(n >= 1L, "maxBytesPerTrigger must be >= 1"))
    (base, uuid, starting, maxPer, maxBytes)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (base, uuid, _, _, _) = params(parameters)
    val table = DatasetMetadata.load(sqlContext.sparkSession, base, uuid).schema
    (shortName(), StructType(
      table.fields.toSeq :+
        StructField("_change_type", StringType, nullable = false) :+
        StructField("_commit_version", LongType, nullable = false)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val (base, uuid, starting, maxPer, maxBytes) = params(parameters)
    new GraftCdcSource(sqlContext.sparkSession, base, uuid, starting, maxPer, maxBytes)
  }
}

/** Batch relation for one bounded slice of the change feed. The plan IS
  * `Ktk.readChangeFeed`'s (balanced union of per-version scans, row-precise
  * deletes joined from the commit's own fragments — O(changed rows) per
  * version); `needConversion=false` hands its InternalRow RDD straight
  * through, so the veneer adds no row-format round-trip.
  */
final class GraftCdcRelation(
    override val sqlContext: SQLContext,
    base: String,
    uuid: String,
    fromVersion: Long,
    toVersion: Long) extends BaseRelation with PrunedScan {

  override val schema: StructType = StructType(
    DatasetMetadata.load(sqlContext.sparkSession, base, uuid).schema.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false))

  override def needConversion: Boolean = false

  override def buildScan(
      requiredColumns: Array[String]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val spark = sqlContext.sparkSession
    val feed =
      if (fromVersion == toVersion)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else Ktk.readChangeFeed(spark, base, uuid, fromVersion, toVersion)
    // project to exactly the requested columns in the requested order (the
    // pruning reaches the per-version parquet scans through Catalyst), then
    // hand over internal rows (the sanctioned needConversion=false contract)
    feed.select(requiredColumns.map(c => col(s"`$c`")).toSeq: _*)
      .queryExecution.toRdd
      .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
  }

  override def toString: String = s"GraftCdcRelation[$uuid ($fromVersion, $toVersion]]"
}
