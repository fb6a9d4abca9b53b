package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Predicates
import graft.ktk.{DatasetMetadata, Ktk}

/** Commit-machinery cost profile for the q_ktk_cdf shape (store →
  * deleteRows → merge → readChangeFeed): prints the METADATA I/O each step
  * performs — full-record reads, delta reads, listings, pointer reads —
  * so per-commit features (in-commit timestamps, operation attribution,
  * history metrics) can be audited for O(1)-per-commit behavior instead of
  * guessed at from wall-clock drift. Run on sf0.01:
  *
  *   sbt "Test/runMain graft.tools.ProbeCdfCommits"
  */
object ProbeCdfCommits {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val base = java.nio.file.Files.createTempDirectory("cdfprobe").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")

    def counters(): (Long, Long, Long, Long) = (
      DatasetMetadata.recordReads.get(), DatasetMetadata.listingReads.get(),
      DatasetMetadata.pointerReads.get(), DatasetMetadata.cacheHits.get())
    def step[A](name: String)(f: => A): A = {
      val (r0, l0, p0, c0) = counters()
      val t0 = System.nanoTime()
      val out = f
      val dt = (System.nanoTime() - t0) / 1e9
      val (r1, l1, p1, c1) = counters()
      println(f"[cdfprobe] $name%-16s ${dt}%6.2fs records=${r1 - r0}%3d " +
        f"listings=${l1 - l0}%3d pointers=${p1 - p0}%3d cacheHits=${c1 - c0}%3d")
      out
    }

    step("store") {
      Ktk.store(spark, base, "orders_cdf", orders,
        partitionOn = Seq("o_orderstatus"), overwrite = true)
    }
    val v1 = DatasetMetadata.load(spark, base, "orders_cdf").version
    step("deleteRows") {
      Ktk.deleteRows(spark, base, "orders_cdf",
        predicates = Predicates.of(Seq(("o_totalprice", ">", 200000.0))))
    }
    val src = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(500.0))
    step("merge") {
      Ktk.merge(spark, base, "orders_cdf", src, keys = Seq("o_orderkey"))
    }
    val n = step("readChangeFeed") {
      Ktk.readChangeFeed(spark, base, "orders_cdf", v1)
        .groupBy(col("_change_type"), col("o_orderstatus"))
        .agg(count(lit(1))).collect().length
    }
    println(s"[cdfprobe] feed groups: $n")
    spark.stop()
  }
}
