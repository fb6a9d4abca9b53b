package graft.sources

import graft.SparkSpec
import graft.ktk.Ktk
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Storage-partitioned join: merging two datasets co-partitioned on the
  * same hive columns must plan with ZERO shuffle — Spark groups the keyed
  * input partitions instead (the reference's partition-aligned merge,
  * io_components/merge.py:25-128, re-expressed via DSv2
  * KeyGroupedPartitioning).
  */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tmpDir("spj")
    val facts = (0 until 2000).map(i => (i % 8, i.toLong, i * 1.5)).toDF("p", "k", "x")
    val dims = (0 until 160).map(i => (i % 8, i.toLong, s"d$i")).toDF("p", "k", "name")
    Ktk.store(spark, b, "facts", facts, partitionOn = Seq("p"), overwrite = true)
    Ktk.store(spark, b, "dims", dims, partitionOn = Seq("p"), overwrite = true)
    b
  }

  private def withSpjConfs[A](body: => A): A = {
    // self-contained: set the SPJ confs explicitly rather than relying on a
    // previous mergeDatasets call having leaked them into the shared session
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("co-partitioned mergeDatasets joins with zero Exchange") {
    withSpjConfs {
      val merged = Ktk.mergeDatasets(spark, base, "facts", "dims", "inner")
      val shuffles = merged.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      shuffles shouldBe empty
      merged.queryExecution.executedPlan.toString should include("SortMergeJoin")

      // results identical to a plain (shuffled) join of the raw tables
      val plain = Ktk.readTable(spark, base, "facts")
        .join(Ktk.readTable(spark, base, "dims"), Seq("k", "p"), "inner")
      merged.select("p", "k", "x", "name").collect().toSet shouldBe
        plain.select("p", "k", "x", "name").collect().toSet
      merged.count() shouldBe 160
    }
  }

  test("keyed scan option alone reports grouped partitions (groupBy on partition col: no shuffle)") {
    withSpjConfs {
      val df = spark.read.format("graft").option("uuid", "facts")
        .option("keyed", "true").load(base)
      val agg = df.groupBy("p").count()
      val shuffles = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      shuffles shouldBe empty
      agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
        (0L until 8L).map(p => p -> 250L).toMap
    }
  }

  test("join on the partition columns alone plans with zero Exchange AND zero Sort") {
    // SupportsReportOrdering: every keyed input partition holds exactly one
    // partition-value group, so "sorted by the partition columns" holds for
    // free — a merge keyed on them needs neither a shuffle nor a sort.
    withSpjConfs {
      val merged = Ktk.mergeDatasets(spark, base, "facts", "dims", "inner",
        mergeFunc = Some((l, r) => l.join(r.withColumnRenamed("k", "dk"), Seq("p"), "inner")))
      val plan = merged.queryExecution.executedPlan
      plan.collect { case e: ShuffleExchangeExec => e } shouldBe empty
      plan.collect { case s: org.apache.spark.sql.execution.SortExec => s } shouldBe empty
      merged.count() shouldBe 2000L / 8 * 160 / 8 * 8 // per-group cross size
      // spot-check against the shuffled plain join
      val plain = Ktk.readTable(spark, base, "facts")
        .join(Ktk.readTable(spark, base, "dims").withColumnRenamed("k", "dk"), Seq("p"))
      merged.count() shouldBe plain.count()
    }
  }

  test("keyed scan with the partition column pruned away still reads (reported ordering/partitioning reference a dropped column)") {
    withSpjConfs {
      val df = spark.read.format("graft").option("uuid", "facts")
        .option("keyed", "true").load(base)
      df.selectExpr("sum(k) AS s").collect()(0).getLong(0) shouldBe (0L until 2000L).sum
      df.select("x").filter($"x" > 0).count() shouldBe 1999
    }
  }

  test("non-keyed scan is unchanged (default path still size-planned)") {
    val df = spark.read.format("graft").option("uuid", "facts").load(base)
    df.count() shouldBe 2000
  }

  test("left merge keeps unmatched fact rows under SPJ") {
    withSpjConfs {
      val merged = Ktk.mergeDatasets(spark, base, "facts", "dims", "left")
      merged.count() shouldBe 2000
      merged.filter("name IS NULL").count() shouldBe 1840
      merged.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      } shouldBe empty
    }
  }
}
