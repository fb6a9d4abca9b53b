package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Predicates
import graft.cube.{Cube, CubeDef}
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val base = java.nio.file.Files.createTempDirectory("plan").toString
    val cube = CubeDef("tpch", Seq("o_custkey", "o_orderkey"), Seq("bucket"))
    val seed = spark.read.parquet(s"$dir/orders.parquet").withColumn("bucket", pmod(col("o_custkey"), lit(4)))
    val cust = spark.read.parquet(s"$dir/customer.parquet").withColumnRenamed("c_custkey", "o_custkey")
      .withColumn("bucket", pmod(col("o_custkey"), lit(4)))
    Cube.build(spark, base, cube, Map("seed" -> seed, "cust" -> cust))
    val q = Cube.query(spark, base, cube,
      conditions = Predicates.of(Seq(("c_mktsegment", "==", "BUILDING"), ("o_totalprice", ">", 100000.0))),
      payload = Seq("o_totalprice", "c_mktsegment"))
    println("=== cube query plan ===")
    q.explain("formatted")
    spark.stop()
  }
}
