package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f), Array(-1.0f, -1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)) // zero vector
  ).toDF("id", "a", "b")

  test("native expression matches the composable HOF form bit-for-bit") {
    // id=3 (zero vector): HOF form divides by zero under ANSI; the native
    // expression defines it as 0.0 — compare the others exactly
    val rows = vecs.filter($"id" =!= 3).select($"id",
      CosineSimilarity($"a", $"b").as("native"),
      Similarity.cosineHof($"a", $"b").as("hof")).collect()
    rows.foreach(r => r.getDouble(1) shouldBe r.getDouble(2))
    rows.find(_.getLong(0) == 0L).get.getDouble(1) shouldBe 1.0 +- 1e-12
    rows.find(_.getLong(0) == 1L).get.getDouble(1) shouldBe 0.0
    rows.find(_.getLong(0) == 2L).get.getDouble(1) shouldBe -1.0 +- 1e-12
    vecs.filter($"id" === 3).select(CosineSimilarity($"a", $"b")).head.getDouble(0) shouldBe 0.0
  }

  test("null inputs yield null (null-intolerant)") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    df.select(CosineSimilarity(col("a"), col("b"))).head.isNullAt(0) shouldBe true
  }

  test("wrong input type fails analysis") {
    val df = Seq((Array(1.0), Array(1.0))).toDF("a", "b") // double arrays
    an[Exception] should be thrownBy
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
  }

  test("registered as SQL function via extensions") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("v")
    val out = spark.sql("SELECT id, cosine_sim(a, b) AS c FROM v WHERE id = 0").head
    out.getDouble(1) shouldBe 1.0 +- 1e-12
  }

  test("text/sampling functions work from plain SQL and match the Column API") {
    import graft.ops.{Sampling, TextAnalysis}
    GraftExtensions.register(spark)
    Seq((1L, "Hello, world! This is a test line.\nHello again."),
        (2L, "short"))
      .toDF("id", "text").createOrReplaceTempView("docs")
    val sqlOut = spark.sql(
      """SELECT id, token_count(text) AS tc, quality_score(text) AS q,
        |  dup_line_fraction(text) AS dlf, redact_pii(text) AS red,
        |  hash_unit('s1', id) AS h
        |FROM docs ORDER BY id""".stripMargin).collect()
    val apiOut = spark.table("docs").select($"id",
        TextAnalysis.tokenCount($"text").as("tc"),
        TextAnalysis.qualityScore($"text").as("q"),
        TextAnalysis.dupLineFraction($"text").as("dlf"),
        TextAnalysis.redactPii($"text").as("red"),
        Sampling.hashUnit("s1", $"id").as("h"))
      .orderBy("id").collect()
    sqlOut.toSeq shouldBe apiOut.toSeq
    // the UDF-backed classifier registers too
    spark.sql("SELECT lang_id('the quick brown fox and the lazy dog')").head
      .getString(0) should not be empty
  }

  test("codegen actually runs (plan contains the expression inside WholeStageCodegen)") {
    // LocalTableScan constant-folds; force a real columnar scan
    val dir = tmpDir("cos")
    vecs.write.parquet(s"$dir/v")
    val fromDisk = spark.read.parquet(s"$dir/v")
    val df = fromDisk.select(CosineSimilarity(col("a"), col("b")).as("c"))
    // `*(n)` marks a WholeStageCodegen stage in the plan rendering
    df.queryExecution.executedPlan.toString should include regex """\*\(\d+\) Project \[cosine_sim"""
    df.agg(sum("c")).head.getDouble(0).isNaN shouldBe false
  }
}
