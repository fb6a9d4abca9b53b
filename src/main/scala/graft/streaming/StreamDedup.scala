package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup-on-ingest for streaming training-data pipelines (beyond the
  * reference, which has no streaming — SURVEY §2.8): exact duplicate
  * suppression over an unbounded stream with BOUNDED state.
  *
  * Scale shape: state is keyed by `xxhash64(normalized text)` — 8 bytes per
  * distinct document in the state store, partitioned across the cluster —
  * and the watermark bounds how long each key is retained, so state size
  * tracks the distinct-document rate within the dedup horizon, not the
  * stream's lifetime. The same pipeline runs batch-incrementally under
  * `Trigger.AvailableNow`.
  */
object StreamDedup {

  /** Whitespace/case-robust content key (same normalization as
    * [[graft.ops.TextAnalysis.fingerprint]]).
    */
  def contentKey(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Keep the first occurrence of each distinct (normalized) text within
    * the watermark horizon. `eventTimeCol` must be a timestamp column; rows
    * later than `delayThreshold` behind the max observed event time may be
    * dropped by the engine (standard watermark semantics).
    */
  def dedupStream(
      stream: DataFrame,
      textCol: String,
      eventTimeCol: String,
      delayThreshold: String = "1 hour"): DataFrame =
    stream
      .withColumn("__ck", contentKey(col(s"`$textCol`")))
      .withWatermark(eventTimeCol, delayThreshold)
      .dropDuplicatesWithinWatermark("__ck")
      .drop("__ck")
}
