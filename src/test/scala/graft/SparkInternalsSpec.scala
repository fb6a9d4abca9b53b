package graft

/** Spark-upgrade canary: ONE place that enumerates every Spark-internal
  * (non-public-API) surface this library touches, and fails with a clear
  * checklist when the Spark version moves. Most internal drift breaks the
  * COMPILE first (we build against the Spark jars); this spec covers what
  * a compile cannot — arities and string constants read reflectively, and
  * the "one place to look" inventory itself.
  *
  * When this fails after a Spark upgrade, re-verify each surface below at
  * its landing site, then update `ExpectedSparkLine`.
  */
class SparkInternalsSpec extends SparkSpec {

  private val ExpectedSparkLine = "4.1."

  /** Every internal surface, its landing site, and why it is needed. */
  private val inventory = Seq(
    "org.apache.spark.sql.classic.ExpressionUtils.column/expression (private[sql]) — org/apache/spark/sql/GraftBridge.scala: Column <-> Expression for custom Catalyst expressions",
    "org.apache.spark.sql.classic.ColumnNodeToExpressionConverter — GraftBridge.eagerExpression: eager conversion for FunctionRegistry builders",
    "org.apache.spark.sql.classic.SparkSession.internalCreateDataFrame(isStreaming=true) — GraftBridge.asStreamingBatch: V1 streaming Source getBatch shape",
    "org.apache.spark.sql.classic.Dataset.ofRows — GraftBridge.ofRows: hand a resolved LogicalPlan to the engine (SQL MERGE rule)",
    "org.apache.spark.sql.connector.expressions.LiteralValue (private[sql] ctor) — GraftBridge.v2Literal: DSv2 runtime-filter literals in tests",
    "org.apache.spark.sql.execution.LogicalRDD.fromDataset — org/apache/spark/sql/graft/BatchShim.scala: re-wrap a streaming micro-batch as batch rows (ForeachBatchSink's own mechanism)",
    "org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY — BatchShim.queryIdKey: stable query id for per-query replay guards",
    "org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan 12-arg constructor — sources/GraftDataSource.scala:596, sources/GraftStreamSource.scala:45,323: delegate scans to Spark's parquet reader over a pruned file index",
    "org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder — sources/GraftDataSource.scala: pushdown plumbing",
    "org.apache.spark.sql.execution.datasources.InMemoryFileIndex — pruned file listings fed to ParquetScan",
    "org.apache.spark.sql.execution.datasources.FilePartition / PartitionedFileUtil — sources/KeyedScan.scala: co-partitioned SPJ file splits",
    "org.apache.spark.sql.execution.streaming.{Source, Sink, Offset} + runtime.{LongOffset, SerializedOffset} — sources/GraftStreamSource.scala, streaming/GraftSink.scala: V1 streaming source/sink SPI",
    "org.apache.spark.sql.execution.command.LeafRunnableCommand — sources/GraftDml.scala: CALL procedures",
    "org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation — sources/GraftDml.scala: DML target resolution",
    "org.apache.spark.sql.catalyst.* (Expression/codegen/InternalRow/rules/plans) — functions/*, sources/GraftDml.scala: semi-stable extension points, compile-checked")

  test("Spark version is the one the internal surfaces were verified against") {
    withClue(
      "Spark version moved — re-verify every internal surface below at its " +
        "landing site, then bump ExpectedSparkLine:\n" +
        inventory.mkString("  - ", "\n  - ", "\n")) {
      spark.version should startWith(ExpectedSparkLine)
    }
  }

  test("ParquetScan primary constructor arity is what our call sites pass") {
    // the constructor is internal API: Spark adds parameters across minor
    // versions (12 args in 4.1.2); call sites use named defaults so a pure
    // APPEND compiles silently — pin the arity so an upgrade surfaces here
    val ctor = classOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .getConstructors.maxBy(_.getParameterCount)
    withClue("ParquetScan constructor changed — re-check GraftDataSource.scala:596 " +
      "and GraftStreamSource.scala:45,323 argument lists: ") {
      ctor.getParameterCount shouldBe 12
    }
  }

  test("GraftBridge Column <-> Expression roundtrip still resolves") {
    import org.apache.spark.sql.functions._
    val c = col("a") + lit(1)
    val e = org.apache.spark.sql.GraftBridge.expression(c)
    val back = org.apache.spark.sql.GraftBridge.column(e)
    import spark.implicits._
    Seq(1, 2).toDF("a").select(back.as("r")).collect().map(_.getInt(0)).sorted shouldBe Array(2, 3)
  }

  test("BatchShim.materializeBatch preserves rows without recomputation") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val out = org.apache.spark.sql.graft.BatchShim.materializeBatch(df)
    out.collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    out.isStreaming shouldBe false
  }

  test("StreamExecution.QUERY_ID_KEY is the property our replay guard scopes on") {
    // the KEY STRING rides into persisted dataset metadata
    // (stream.last_batch_id.<queryId>) — a silent rename would orphan the
    // per-query high-water marks of existing datasets
    org.apache.spark.sql.graft.BatchShim.queryIdKey shouldBe "sql.streaming.queryId"
  }

  test("v2Literal builds the runtime-filter literal shape") {
    val l = org.apache.spark.sql.GraftBridge.v2Literal(7L, org.apache.spark.sql.types.LongType)
    l.value shouldBe 7L
    l.dataType shouldBe org.apache.spark.sql.types.LongType
  }
}
