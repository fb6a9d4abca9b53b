package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Predicates
import graft.ktk.Ktk

/** Scale probe for the Bloom sidecar: 1.2M-row dataset spread over 48
  * unpartitioned files with a high-cardinality key (no partition keys, no
  * zone ordering — the case where ONLY blooms can skip). Measures
  * (a) pruning ratio of queryLabels for point lookups, (b) driver-side probe
  * latency, (c) end-to-end point-read vs a full-scan filter. At 100 TB the
  * same probe cost is O(#files) executor work + O(matching labels) driver
  * memory, while the read touches only the surviving files.
  * Run: sbt "Test/runMain graft.tools.StressBloom"
  */
object StressBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "48")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("bloom-stress").toString

    // ids deliberately NOT clustered by file: repartition by a hash of an
    // unrelated column so zone maps on id would be useless (each file spans
    // the full id range) — blooms are the only skipping that can work
    val n = 1200000L
    val df = spark.range(n).toDF("id")
      .withColumn("payload", concat(lit("row-"), col("id")))
      .withColumn("scatter", pmod(xxhash64(col("id")), lit(48)))
      .repartition(48, col("scatter"))
      .drop("scatter")

    def time[A](tag: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $s%.2f s"); (r, s)
    }

    val (md, _) = time("store 1.2M rows, 48 files, bloomFor=id")(
      Ktk.store(spark, base, "big", df, bloomFor = Seq("id"), overwrite = true))
    println(s"files: ${md.partitions.size}")
    require(md.partitions.size > 1, "probe needs multiple files")

    // point lookups: each id lives in exactly one file
    val ids = Seq(7L, 123456L, 999999L, 1199999L)
    var pruned = 0
    ids.foreach { id =>
      val (labels, t) = time(s"queryLabels id=$id")(
        Ktk.queryLabels(spark, base, md, Predicates.of(Seq(("id", "==", id)))))
      println(s"  kept ${labels.size}/${md.partitions.size} files")
      pruned += (md.partitions.size - labels.size)
      require(t < 10.0, "bloom probe too slow")
    }
    val keptTotal = ids.size * md.partitions.size - pruned
    println(f"avg kept files per lookup: ${keptTotal.toDouble / ids.size}%.2f")
    // with fpp=1% over 48 files, a lookup should keep ~1 + 0.01*47 ≈ 1.5 files
    require(pruned >= ids.size * (md.partitions.size - 4),
      s"bloom pruning too weak: pruned $pruned of ${ids.size * md.partitions.size}")

    // end-to-end: bloom-pruned read vs full-scan filter
    val (a, tBloom) = time("bloom-pruned point read")(
      Ktk.readTable(spark, base, "big",
        predicates = Predicates.of(Seq(("id", "==", 999999L)))).collect())
    val (b, tScan) = time("full-scan filter")(
      spark.read.parquet(s"$base/big/table").where(col("id") === 999999L).collect())
    require(a.map(_.getString(1)).toSeq == b.map(_.getString(1)).toSeq, "results disagree")
    // at this scale the page-cached full scan is already sub-second while the
    // probe pays a fixed ~0.2 s sidecar job — the ratio only matters at real
    // scale, where the scan grows O(data) and the probe stays O(#files)
    println(f"point read ${tBloom}%.2f s (probe + 1 file) vs full scan ${tScan}%.2f s (all files)")
    spark.stop()
  }
}
