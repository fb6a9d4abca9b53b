package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** The one `private[sql]` bridge the streaming sink needs, isolated in an
  * `org.apache.spark.sql` subpackage (the standard connector pattern —
  * Delta and Iceberg ship their sinks the same way).
  *
  * A V1 [[org.apache.spark.sql.execution.streaming.Sink]] receives each
  * micro-batch as a STREAMING DataFrame: its logical plan is an incremental-
  * execution fragment that cannot be re-planned by ordinary writer code
  * (re-running it would re-read the source offsets). Spark's own
  * `ForeachBatchSink` re-wraps the batch as a non-streaming frame over the
  * SAME physical rows via `LogicalRDD.fromDataset(qe.toRdd, ds,
  * isStreaming = false)`; this shim exposes exactly that mechanism so
  * [[graft.streaming.KtkSink]]'s commit path (one atomic versioned commit
  * per batch) can consume the rows without recomputation.
  */
object BatchShim {
  def materializeBatch(data: DataFrame): DataFrame = {
    val ds = data.asInstanceOf[ClassicDataset[_]]
    val node = LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds, isStreaming = false)
    ClassicDataset.ofRows(ds.sparkSession, node)
  }

  /** The local-property key under which StreamExecution publishes the
    * STABLE streaming query id (same across restarts of one checkpoint) on
    * its micro-batch thread — the scope for per-query replay guards.
    */
  def queryIdKey: String =
    org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY
}
