package graft.core

/** Z-order (Morton) encoding over quantile-bucketed column values — the
  * math behind [[graft.ktk.Ktk.clusterZOrder]]. Each column value maps to
  * an 8-bit bucket id via binary search over its own quantile boundaries
  * (so skewed distributions still spread evenly across buckets), and the
  * bucket ids bit-interleave into one Long rank. Files written in rank
  * ranges are tight in EVERY clustered dimension at once, which is what
  * lets zone-map sidecars prune on a predicate over any of them — a plain
  * sort gives that only for the leading column.
  *
  * No analog in the reference (its layout control is partition_on +
  * sort_partitions_by, io_components/write.py:82-83); this is the
  * Delta/Iceberg OPTIMIZE ZORDER technique applied to graft's zone maps.
  */
object ZOrder {

  val Bits: Int = 8
  val Buckets: Int = 1 << Bits // 256 per column

  /** Bucket id of `v` given ascending quantile `boundaries` (length
    * [[Buckets]]-1). Nulls sort first (bucket 0), matching parquet
    * min/max semantics where null rows never widen a range.
    */
  def bucketOf(v: Double, boundaries: Array[Double]): Int = {
    val i = java.util.Arrays.binarySearch(boundaries, v)
    if (i >= 0) i + 1 else -(i + 1)
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
}
