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

  test("exact-partition filters are CONSUMED: footer-only count under a WHERE") {
    withAggPushdown {
      val df = spark.read.format("graft").option("uuid", "ds").load(base)
      // p = 1 is enforced by the label list; no residual remains, so the
      // count answers from the pruned files' footers alone
      val agg = df.filter($"p" === 1).agg(org.apache.spark.sql.functions.count("*"))
      agg.queryExecution.executedPlan.toString should include("PushedAggregation: [COUNT(*)")
      agg.collect().head.getLong(0) shouldBe 1250L
      // IN over the partition key consumes the same way
      val agg2 = df.filter($"p".isin(1, 2)).agg(org.apache.spark.sql.functions.count("*"))
      agg2.queryExecution.executedPlan.toString should include("PushedAggregation: [COUNT(*)")
      agg2.collect().head.getLong(0) shouldBe 2500L
      // a no-match partition value counts zero (empty pruned index)
      df.filter($"p" === 99).agg(org.apache.spark.sql.functions.count("*"))
        .collect().head.getLong(0) shouldBe 0L
      // mixing in a payload filter keeps THAT residual: pushdown off, exact
      val mixed = df.filter($"p" === 1 && $"tag" === "s3")
        .agg(org.apache.spark.sql.functions.count("*"))
      mixed.queryExecution.executedPlan.toString should include("PushedAggregation: []")
      mixed.collect().head.getLong(0) shouldBe
        (0 until 5000).count(i => i % 4 == 1 && i % 97 == 3).toLong
    }
  }

  test("consumed partition filters stay exact on plain (non-agg) reads") {
    val df = spark.read.format("graft").option("uuid", "ds").load(base)
    df.filter($"p" === 2).count() shouldBe 1250L
    df.filter($"p".isin(0, 3)).select("k").as[Long].collect().sorted.toSeq shouldBe
      (0 until 5000).filter(i => i % 4 == 0 || i % 4 == 3).map(_.toLong).sorted
    // string partition values with unsafe characters are NOT consumed —
    // Spark re-applies them, results stay exact
    val b2 = tmpDir("aggpd2")
    Ktk.store(spark, b2, "ds2",
      Seq((1L, "a b"), (2L, "a b"), (3L, "c")).toDF("k", "p"), partitionOn = Seq("p"))
    val d2 = spark.read.format("graft").option("uuid", "ds2").load(b2)
    d2.filter($"p" === "a b").select("k").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
    d2.filter($"p" === "c").count() shouldBe 1L
    // null-safe equality consumes AND is enforced by the pruning ladder
    d2.filter($"p" <=> "c").select("k").as[Long].collect().toSeq shouldBe Seq(3L)
    d2.filter($"p" <=> "a b").count() shouldBe 2L
  }

  test("date partition equality consumes: footer-only count under a date WHERE") {
    withAggPushdown {
      val b4 = tmpDir("aggpd4")
      Ktk.store(spark, b4, "ds4",
        Seq((1L, java.sql.Date.valueOf("2026-01-15")),
            (2L, java.sql.Date.valueOf("2026-01-15")),
            (3L, java.sql.Date.valueOf("2026-02-01"))).toDF("k", "d"),
        partitionOn = Seq("d"))
      val d4 = spark.read.format("graft").option("uuid", "ds4").load(b4)
      val agg = d4.filter($"d" === java.sql.Date.valueOf("2026-01-15"))
        .agg(org.apache.spark.sql.functions.count("*"))
      agg.queryExecution.executedPlan.toString should include("PushedAggregation: [COUNT(*)")
      agg.collect().head.getLong(0) shouldBe 2L
      d4.filter($"d" === java.sql.Date.valueOf("2026-02-01")).select("k")
        .as[Long].collect().toSeq shouldBe Seq(3L)
    }
  }

  test("long partition values above 2^53 stay residual (Double comparator)") {
    val b3 = tmpDir("aggpd3")
    val big = (1L << 53) // 9007199254740992; +1 is not Double-representable
    Ktk.store(spark, b3, "ds3",
      Seq((1L, big), (2L, big + 1)).toDF("k", "p"), partitionOn = Seq("p"))
    val d3 = spark.read.format("graft").option("uuid", "ds3").load(b3)
    // label coercion goes through Double where these collide — the filter
    // must NOT be consumed, and Spark's residual keeps the result exact
    d3.filter($"p" === big).select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    d3.filter($"p" === (big + 1)).select("k").as[Long].collect().toSeq shouldBe Seq(2L)
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
