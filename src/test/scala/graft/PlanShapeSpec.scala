package graft

import graft.core.Predicates
import graft.ktk.Ktk
import org.apache.spark.sql.functions._

/** Plan-shape regression tests: the physical plans that make this engine
  * scale must not silently degrade. Asserting on executedPlan text keeps
  * pushdown/broadcast/codegen properties pinned.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tmpDir("plan")
    val df = (0 until 1000).map(i => (i % 4, i.toLong, i * 1.0, s"t${i % 7}"))
      .toDF("p", "k", "x", "tag")
    Ktk.store(spark, b, "ds", df, partitionOn = Seq("p"), secondaryIndices = Seq("tag"))
    b
  }

  test("ktk read pushes payload filter to parquet and prunes columns") {
    val df = Ktk.readTable(spark, base, "ds",
      columns = Seq("k", "x"),
      predicates = Predicates.of(Seq(("p", "==", 1), ("x", ">", 10.0))))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(x), GreaterThan(x,10.0)")
    plan should include("ReadSchema: struct<k:bigint,x:double>")
    df.inputFiles.forall(_.contains("p=1")) shouldBe true
  }

  test("broadcast join is chosen for a small dimension side") {
    val big = (0 until 10000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "name")
    val plan = big.join(broadcast(dim), Seq("k")).groupBy("name").count()
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("aggregation uses partial (map-side) combine") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    // two HashAggregate nodes: partial + final
    "HashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    val df = Ktk.readTable(spark, base, "ds", predicates = Predicates.of(Seq(("x", ">", 100.0))))
    // `*(n)` prefixes mark WholeStageCodegen stages in the rendered plan
    df.queryExecution.executedPlan.toString should include regex """\*\(\d+\)"""
  }

  test("index pruning plan reads only index row groups for the literal") {
    // the index lookup itself must push the value filter into the index scan
    val md = graft.ktk.DatasetMetadata.load(spark, base, "ds")
    val idx = Ktk.loadIndex(spark, base, md, "tag").filter(col("value") === "t3")
    idx.queryExecution.executedPlan.toString should include("EqualTo(value,t3)")
  }
}
