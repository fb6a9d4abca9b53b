package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Predicates
import graft.ktk.Ktk
object ProbeCdfTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    val base = java.nio.file.Files.createTempDirectory("cdfprobe").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    (1 to 2).foreach { rep =>
      time(s"rep$rep store") { Ktk.store(spark, base, "orders_cdf", orders,
        partitionOn = Seq("o_orderstatus"), overwrite = true) }
      val v1 = graft.ktk.DatasetMetadata.load(spark, base, "orders_cdf").version
      time(s"rep$rep delete") { Ktk.deleteRows(spark, base, "orders_cdf",
        predicates = Predicates.of(Seq(("o_totalprice", ">", 200000.0)))) }
      val src = orders.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(500.0))
      time(s"rep$rep merge") { Ktk.merge(spark, base, "orders_cdf", src, keys = Seq("o_orderkey")) }
      time(s"rep$rep plan") { Ktk.readChangeFeed(spark, base, "orders_cdf", v1).queryExecution.analyzed }
      time(s"rep$rep feed") {
        Ktk.readChangeFeed(spark, base, "orders_cdf", v1)
          .groupBy(col("_change_type"), col("o_orderstatus"))
          .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect()
      }
    }
    spark.stop()
  }
}
