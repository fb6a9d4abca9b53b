package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native sig_overlap expression: the minhash-verification kernel as a
  * codegen'd Catalyst expression (replaces the Scala UDF in r15).
  */
class SigOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Array[Byte](1, 2, 3, 4), Array[Byte](1, 2, 3, 4)),   // 4/4
    (2L, Array[Byte](1, 2, 3, 4), Array[Byte](1, 0, 3, 0)),   // 2/4
    (3L, Array[Byte](1, 2, 3, 4), Array[Byte](0, 0, 0, 0))    // 0/4
  ).toDF("id", "a", "b")

  test("overlap fraction on hand-checked byte signatures") {
    df.select($"id", SigOverlap($"a", $"b").as("o"))
      .as[(Long, Double)].collect().toMap shouldBe
      Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.0)
  }

  test("length mismatch fails loudly (the cross-numHashes guard)") {
    val bad = Seq((Array[Byte](1, 2, 3), Array[Byte](1, 2))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(SigOverlap($"a", $"b")).collect()
    }
    e.getMessage should include("signature length mismatch")
  }

  test("null inputs yield null; non-binary inputs fail analysis") {
    Seq((Array[Byte](1), null.asInstanceOf[Array[Byte]])).toDF("a", "b")
      .select(SigOverlap($"a", $"b")).collect()(0).isNullAt(0) shouldBe true
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1, 2)).toDF("a", "b").select(SigOverlap($"a", $"b")).collect()
    }
    e.getMessage should include("binary")
  }

  test("registered as SQL function and runs inside whole-stage codegen") {
    GraftExtensions.register(spark)
    spark.sql("SELECT sig_overlap(X'01020304', X'01000300')")
      .as[Double].head() shouldBe 0.5
    // LocalTableScan constant-folds; force a real columnar scan so the
    // expression actually reaches codegen (`*(n)` marks a codegen stage)
    val dir = tmpDir("sig")
    df.write.parquet(s"$dir/v")
    val plan = spark.read.parquet(s"$dir/v")
      .select(SigOverlap($"a", $"b").as("o"))
      .queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Project \[sig_overlap"""
    (plan.toLowerCase should not).include("scalaudf")
  }

  test("minhash verification plans carry the native expression, not a UDF") {
    def doc(i: Int) = s"the quick brown fox $i jumps over the lazy dog $i " * 5
    val d = ((0 until 20).map(i => (i.toLong, doc(i))) ++
      (0 until 5).map(i => (100L + i, "xq " + doc(i)))).toDF("doc_id", "text")
    val cand = graft.ops.Dedup.minhashCandidates(d, "doc_id", "text", maxBucket = 1000)
    val plan = cand.queryExecution.executedPlan.toString
    plan should include("sig_overlap")
    (plan.toLowerCase should not).include("scalaudf".toLowerCase)
    // behavior unchanged: planted near-dups verify above 0.6
    cand.filter($"est_jaccard" >= 0.6).count() should be >= 5L
  }
}
