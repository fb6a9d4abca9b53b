package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) encoding over quantile-bucketed column values — the
  * math behind [[graft.ktk.Ktk.clusterZOrder]]. Each column value maps to
  * an 8-bit bucket id via upper-bound search over its own quantile
  * boundaries (so skewed distributions still spread evenly across
  * buckets), and the bucket ids bit-interleave into one Long rank. Files
  * written in rank ranges are tight in EVERY clustered dimension at once,
  * which is what lets zone-map sidecars prune on a predicate over any of
  * them — a plain sort gives that only for the leading column.
  *
  * No analog in the reference (its layout control is partition_on +
  * sort_partitions_by, io_components/write.py:82-83); this is the
  * Delta/Iceberg OPTIMIZE ZORDER technique applied to graft's zone maps.
  */
object ZOrder {

  val Bits: Int = 8
  val Buckets: Int = 1 << Bits // 256 per column

  /** Bucket id of `v` = the number of boundaries <= v (upper-bound binary
    * search over the ascending, possibly-repeating quantile `boundaries`,
    * length [[Buckets]]-1). Exactly [[rankColumn]]'s `size(filter(v >= b))`
    * — the two implementations must agree row-for-row even when skewed
    * data makes quantile boundaries repeat (ZOrderSpec pins the parity).
    * Nulls sort first (bucket 0), matching parquet min/max semantics where
    * null rows never widen a range.
    */
  def bucketOf(v: Double, boundaries: Array[Double]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave the low [[Bits]] bits of up to 8 bucket ids, column 0 in
    * the least-significant interleave slot. Monotone per dimension: raising
    * one column's bucket never lowers the code.
    */
  def interleave(buckets: Array[Int]): Long = {
    val k = buckets.length
    require(k >= 1 && k <= 8, s"z-order supports 1..8 columns, got $k")
    var z = 0L
    var bit = 0
    while (bit < Bits) {
      var c = 0
      while (c < k) {
        if (((buckets(c) >> bit) & 1) == 1) z |= 1L << (bit * k + c)
        c += 1
      }
      bit += 1
    }
    z
  }

  /** Full encode: one (possibly null) double per clustered column. */
  def encode(values: Array[java.lang.Double], boundaries: Array[Array[Double]]): Long = {
    val b = new Array[Int](values.length)
    var c = 0
    while (c < values.length) {
      b(c) = if (values(c) == null) 0 else bucketOf(values(c), boundaries(c))
      c += 1
    }
    interleave(b)
  }

  /** The z-rank as a codegen'd Column — no UDF in the rewrite's hot path.
    * `inputs` are the clustered columns already projected to double
    * ([[graft.ktk.Ktk.clusterZOrder]] handles date/timestamp conversion);
    * per column, bucket = `size(filter(boundariesLit, b -> v >= b))`
    * (= count of boundaries <= v; a null value filters to an empty array,
    * bucket 0), then the buckets bit-interleave with shift/and/sum
    * arithmetic — the terms occupy disjoint bit positions, so plain
    * addition IS the bitwise-or.
    */
  def rankColumn(inputs: Seq[Column], boundaries: Array[Array[Double]]): Column = {
    val k = inputs.length
    require(k >= 1 && k <= 8, s"z-order supports 1..8 columns, got $k")
    require(boundaries.length == k, "one boundary array per input column")
    val buckets: Seq[Column] = inputs.zipWithIndex.map { case (v, i) =>
      if (boundaries(i).isEmpty) lit(0L) // all-null column: single bucket
      else {
        val arr = array(boundaries(i).toSeq.map(lit): _*)
        size(filter(arr, b => v >= b)).cast("long")
      }
    }
    val terms = for {
      bit <- 0 until Bits
      c <- 0 until k
    } yield shiftleft(shiftright(buckets(c), bit).bitwiseAND(lit(1L)), bit * k + c)
    terms.reduce(_ + _)
  }
}
