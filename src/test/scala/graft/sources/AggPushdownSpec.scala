package graft.sources

import graft.SparkSpec
import graft.ktk.Ktk

/** Aggregate pushdown through the DSv2 connector: COUNT/MIN/MAX answered
  * from parquet footer statistics, no data pages read (scan-level twin of
  * Ktk.footerStats / the reference's get_parquet_metadata).
  */
class AggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tmpDir("aggpd")
    val df = (0 until 5000).map(i => (i % 4, i.toLong, s"s${i % 97}")).toDF("p", "k", "tag")
    Ktk.store(spark, b, "ds", df, partitionOn = Seq("p"), overwrite = true)
    b
  }

  private def withAggPushdown[A](body: => A): A = {
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try body finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("count/min/max answered from footers (PushedAggregation in plan)") {
    withAggPushdown {
      val df = spark.read.format("graft").option("uuid", "ds").load(base)
      val agg = df.agg(
        org.apache.spark.sql.functions.count("*").as("cnt"),
        org.apache.spark.sql.functions.min("k").as("mn"),
        org.apache.spark.sql.functions.max("k").as("mx"))
      agg.queryExecution.executedPlan.toString should include("PushedAggregation: [COUNT(*)")
      val r = agg.collect().head
      r.getLong(0) shouldBe 5000L
      r.getLong(1) shouldBe 0L
      r.getLong(2) shouldBe 4999L
    }
  }

  test("group-by partition column count pushes down") {
    withAggPushdown {
      val df = spark.read.format("graft").option("uuid", "ds").load(base)
      val agg = df.groupBy("p").count()
      agg.queryExecution.executedPlan.toString should include("PushedAggregation: [COUNT(*)")
      agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        (0L until 4L).map(p => p -> 1250L).toMap
    }
  }

  test("a residual filter blocks pushdown and falls back to an exact scan") {
    withAggPushdown {
      val df = spark.read.format("graft").option("uuid", "ds").load(base)
      val agg = df.filter($"tag" === "s3").agg(org.apache.spark.sql.functions.count("*"))
      agg.queryExecution.executedPlan.toString should include("PushedAggregation: []")
      agg.collect().head.getLong(0) shouldBe
        (0 until 5000).count(i => i % 97 == 3).toLong
    }
  }

  test("pushdown disabled by default (conf off) still answers correctly") {
    val df = spark.read.format("graft").option("uuid", "ds").load(base)
    val agg = df.agg(org.apache.spark.sql.functions.count("*"))
    agg.queryExecution.executedPlan.toString should include("PushedAggregation: []")
    agg.collect().head.getLong(0) shouldBe 5000L
  }
}
