package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, Expression => V2Expression, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportOrdering, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.PartitionedFileUtil
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType

/** A [[FilePartition]] that exposes its hive partition values as a
  * storage-partition key, which is what lets Spark's `BatchScanExec` group
  * co-partitioned scans for a storage-partitioned join.
  */
final class KeyedFilePartition(
    idx: Int,
    files0: Array[PartitionedFile],
    key: InternalRow) extends FilePartition(idx, files0) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Storage-partitioned scan over a graft dataset: reports
  * [[KeyGroupedPartitioning]] on the dataset's hive partition columns
  * (identity transforms) with ONE input partition per partition-value group,
  * so joins/aggregations clustered on those columns plan WITHOUT an
  * Exchange — the Spark-native re-expression of the reference's
  * partition-aligned dataset-merge join (io_components/merge.py:25-128,
  * which zips equal-labelled partitions and merges them pairwise).
  *
  * Row reading is delegated verbatim to [[ParquetScan]]'s reader factory, so
  * vectorized decode, row-group pruning and partition-column reconstruction
  * are identical to the non-keyed path.
  *
  * Scale tradeoff (documented, as for any SPJ source): task parallelism
  * equals the number of surviving partition groups, so this scan is the
  * right choice when the join/groupBy saves a 100 TB shuffle and the
  * partitioning is reasonably fine-grained; the default (non-keyed) scan
  * remains the choice for coarse layouts. Requires
  * `spark.sql.sources.v2.bucketing.enabled=true` for the exec-side grouping.
  */
final class GraftKeyedScan(delegate: ParquetScan, partitionCols: Seq[String])
    extends Scan with Batch with SupportsReportPartitioning with SupportsReportOrdering
    with SupportsReportStatistics {

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftKeyedScan(keys=${partitionCols.mkString(",")}) " + delegate.description()

  // one group per partition directory; computed once so numPartitions and
  // planInputPartitions agree (all O(metadata), driver-side)
  private lazy val groups = delegate.fileIndex.listFiles(Nil, Nil)

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      partitionCols.map(c => Expressions.identity(c): V2Expression).toArray,
      groups.length)

  /** Every input partition holds exactly ONE partition-value group (see
    * [[planInputPartitions]]), and exec-side SPJ grouping only ever merges
    * partitions that share a key — so within any task all rows carry equal
    * key tuples and "sorted by the partition columns" holds for free. With
    * the [[KeyGroupedPartitioning]] above, `EnsureRequirements` then plans
    * the co-partitioned sort-merge join with NO Exchange and NO Sort on
    * either side: the join degenerates to zipping equal-keyed groups, the
    * exact shape of the reference's partition-aligned merge.
    */
  override def outputOrdering(): Array[V2SortOrder] =
    partitionCols.map(c => Expressions.sort(
      Expressions.identity(c), SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)).toArray

  override def planInputPartitions(): Array[InputPartition] =
    groups.zipWithIndex.map { case (dir, i) =>
      val files = dir.files.flatMap { f =>
        PartitionedFileUtil.splitFiles(f, f.getPath, isSplitable = false,
          maxSplitBytes = Long.MaxValue, partitionValues = dir.values)
      }
      new KeyedFilePartition(i, files.toArray, dir.values.copy())
    }.toArray

  /** Size stats delegate to the wrapped [[ParquetScan]] (FileScan's
    * listing-based estimate) — without them a DSv2 relation defaults to
    * `spark.sql.defaultSizeInBytes` (max), and a small keyed dim read
    * through this scan could never qualify for a broadcast join.
    */
  override def estimateStatistics(): Statistics = delegate.estimateStatistics()

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.createReaderFactory()
}
