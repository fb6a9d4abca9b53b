package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ktk.Ktk
import graft.sources.GraftRuntimePrune

/** Scale probe for runtime filtering (dynamic partition pruning) through
  * the DSv2 connector: lineitem sf0.1 hash-partitioned into 64 directories
  * joined to a file-backed dim whose selective (non-join-column) filter
  * keeps 4 of the 64 join keys. With SupportsRuntimeV2Filtering the fact
  * scan must read ~4/64ths of the files; with the rule disabled it reads
  * all of them. Reports both wall times, the pruned-file counts, and
  * verifies the results agree. Run: sbt "Test/runMain graft.tools.StressDpp"
  */
object StressDpp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("dpp-stress").toString
    // 8x-replicated fact (~4.8M rows at sf0.1) so the read cost dominates
    // the fixed join/planning overhead and the prune is visible in wall time
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("rep", explode(lit((0 until 8).toArray)))
      .withColumn("p", pmod(col("l_orderkey") + col("rep"), lit(64)))
      .drop("rep")
    Ktk.store(spark, base, "fact", li, partitionOn = Seq("p"))
    spark.range(64).select(col("id").as("dp"),
      (col("id") < 4).cast("int").as("keep"))
      .write.mode("overwrite").parquet(s"$base/dim")

    def run(tag: String, dppOn: Boolean): (Double, Double) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dppOn)
      GraftRuntimePrune.lastKept.set(0); GraftRuntimePrune.lastDropped.set(0)
      val fact = spark.read.format("graft").option("uuid", "fact").load(base)
      val dim = spark.read.parquet(s"$base/dim").filter(col("keep") === 1)
      val t0 = System.nanoTime()
      val total = fact.join(dim, col("p") === col("dp"))
        .agg(sum("l_extendedprice")).head.getDouble(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $secs%.2f s total=$total%.2f " +
        s"kept=${GraftRuntimePrune.lastKept.get()} dropped=${GraftRuntimePrune.lastDropped.get()}")
      (secs, total)
    }

    // warm the reader paths once so JIT/FS cache don't bias the comparison
    run("warmup (dpp on)", dppOn = true)
    val (tOn, totalOn) = run("dpp ON ", dppOn = true)
    val (keptOn, droppedOn) =
      (GraftRuntimePrune.lastKept.get(), GraftRuntimePrune.lastDropped.get())
    val (tOff, totalOff) = run("dpp OFF", dppOn = false)
    require(math.abs(totalOn - totalOff) < 1e-6 * math.max(1.0, math.abs(totalOff)),
      s"DPP changed the result: $totalOn vs $totalOff")
    require(droppedOn > 0, "the ON run must prune files at runtime")
    require(GraftRuntimePrune.lastDropped.get() == 0,
      "with the rule disabled no runtime predicates may arrive")
    // the IO actually skipped is the primary metric: on local NVMe with a
    // warm page cache the absolute read cost is tiny, but at cluster scale
    // (object-store reads) skipping 60/64 of the fact bytes IS the win
    println(f"speedup: ${tOff / tOn}%.2fx wall (page-cache-bound locally); " +
      s"runtime prune kept $keptOn / dropped $droppedOn files")
    spark.stop()
  }
}
