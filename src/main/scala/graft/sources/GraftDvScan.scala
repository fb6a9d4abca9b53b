package graft.sources

import java.util.OptionalLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** Deletion-vector-aware DSv2 batch scan (the merge-on-read read path of
  * SURVEY §2.9's connector, same split as `Ktk.readTable`): CLEAN files —
  * the overwhelming majority after routine maintenance — scan through the
  * stock vectorized [[ParquetScan]] exactly as if no delete had ever
  * happened; only the files the deletion vectors touch pay a row-position
  * filter. Dirty files read through a second ParquetScan whose
  * readDataSchema carries Spark's temporary row-index column (the same
  * file-absolute position `_metadata.row_index` exposes — and the same
  * coordinate the vectors were recorded in), one file per input partition
  * so each reader knows its label; the reader drops rows whose position is
  * in the label's broadcast tombstone set and projects the index column
  * away. This is how Delta/Iceberg readers apply DVs, re-expressed over
  * Spark's own reader instead of a custom one.
  *
  * This COMBINED scan is the fallback shape (one BatchScanExec, uniformly
  * row-based, because Spark refuses mixed columnar/row partitions in one
  * scan exec). Sessions built with [[graft.functions.GraftExtensions]]
  * instead plan the split at the LOGICAL level ([[GraftDvSplitRule]]): the
  * relation rewrites to a Union of a clean-side relation (fully vectorized
  * ParquetScan, as if no DV existed) and a dirty-side relation
  * ([[GraftDvDirtyScan]], row-based tombstone filter over only the touched
  * files) — so one pending GDPR delete no longer de-vectorizes a 100 TB
  * table read.
  */
final class GraftDvScan(
    clean: GraftStreamableScan,
    dirty: ParquetScan,
    dv: Broadcast[Map[String, Array[Long]]])
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = clean.readSchema()

  // runtime (DPP) filtering passes through: the clean delegate prunes its
  // own planning, the dirty side prunes here with the same best-effort
  // evaluator over the planned files' typed partition values
  @volatile private var runtimePreds:
    Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    clean.filterAttributes()

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    clean.filter(predicates)
    runtimePreds = predicates
  }

  override def description(): String = {
    val tombstones = dv.value.valuesIterator.map(_.length.toLong).sum
    s"GraftDvScan(dirtyFiles=${dv.value.size}, tombstones=$tombstones) " +
      clean.description()
  }

  override def toBatch: Batch = this

  // Spark refuses to mix columnar and row-based partitions inside one
  // BatchScanExec (DataSourceV2ScanExecBase.supportsColumnar), so while
  // tombstones are pending the WHOLE scan reads row-based — clean files
  // still skip the tombstone lookup entirely (dirtyLabel=None branch);
  // materializeDeletes/compact shed the vectors and restore the fully
  // vectorized plain scan
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.UNSUPPORTED

  // the change feed is append-only by contract (deletes don't stream);
  // it never consults the file index, so the clean scan's stream is THE
  // stream
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    clean.toMicroBatchStream(checkpointLocation)

  override def estimateStatistics(): Statistics = new Statistics {
    private val c = clean.estimateStatistics()
    private val d = dirty.estimateStatistics()
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(c.sizeInBytes.orElse(0L) + d.sizeInBytes.orElse(0L))
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val cleanParts = clean.toBatch.planInputPartitions().map {
      case fp: FilePartition => GraftDvInputPartition(fp, None)
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
    // dirty side: regroup the planned splits ONE FILE PER PARTITION so the
    // reader knows which label's tombstone set applies (splits of the same
    // file stay together; positions are file-absolute either way)
    val files = GraftRuntimePrune(dirty.toBatch.planInputPartitions(),
        dirty.readPartitionSchema, runtimePreds).flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
    val dirtyParts = files.groupBy(_.filePath.toString).toSeq.sortBy(_._1)
      .zipWithIndex.map { case ((path, fs), i) =>
        val label = path.replaceFirst("^.*/table/", "")
        GraftDvInputPartition(FilePartition(cleanParts.length + i, fs.toArray), Some(label))
      }
    (cleanParts ++ dirtyParts).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftDvReaderFactory(
      clean.createReaderFactory(), dirty.createReaderFactory(), dv,
      from = dirty.readSchema(), to = readSchema())
}

/** Clean partitions delegate untouched (columnar included); dirty ones are
  * forced row-based and wrapped with the tombstone filter + projection.
  */
final case class GraftDvInputPartition(
    delegate: FilePartition, dirtyLabel: Option[String]) extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

final case class GraftDvReaderFactory(
    cleanF: PartitionReaderFactory,
    dirtyF: PartitionReaderFactory,
    dv: Broadcast[Map[String, Array[Long]]],
    from: StructType,
    to: StructType)
  extends PartitionReaderFactory {

  // uniformly row-based: see GraftDvScan.columnarSupportMode
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    throw new UnsupportedOperationException(
      "DV-bearing scans read row-based (tombstone filter)")

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case GraftDvInputPartition(d, None) => cleanF.createReader(d)
      case GraftDvInputPartition(d, Some(label)) =>
        val inner = dirtyF.createReader(d)
        val deleted = dv.value.getOrElse(label, Array.emptyLongArray)
        val fromAttrs = DataTypeUtils.toAttributes(from)
        val exprs = to.fields.toSeq.map(f => fromAttrs(from.fieldIndex(f.name)))
        val project = UnsafeProjection.create(exprs, fromAttrs)
        val posIdx = from.fieldIndex(ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (inner.next()) {
              val r = inner.get()
              if (java.util.Arrays.binarySearch(deleted, r.getLong(posIdx)) < 0) {
                cur = r
                return true
              }
            }
            false
          }
          override def get(): InternalRow = project(cur)
          override def close(): Unit = inner.close()
        }
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
}
