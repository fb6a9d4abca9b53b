package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Decontamination

/** Stage-by-stage timing of the decontamination pipeline, plus a 10×
  * amplified run. Run: sbt "Test/runMain graft.tools.StressDecontam"
  */
object StressDecontam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bench = d.filter(col("doc_id") % 19 === 0)
    val corpus = d.filter(col("doc_id") % 19 =!= 0)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s  (rows=$n)")
    }
    // warm codegen
    d.count()
    time("minimal: explode(split) only") {
      bench.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t")).count()
    }
    time("tokens as column, then grams") {
      val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
      bench.select(toks.as("toks"))
        .select(explode(when(size(col("toks")) < 5, array().cast("array<bigint>"))
          .otherwise(array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
            i => xxhash64(concat_ws(" ", slice(col("toks"), i, lit(5)))))))).as("g"))
        .count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("bench grams distinct, codegen OFF") {
      bench.select(explode(Decontamination.wordNgramHashes(col("text"), 5)).as("g"))
        .distinct().count()
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("bench grams distinct") {
      bench.select(explode(Decontamination.wordNgramHashes(col("text"), 5)).as("g"))
        .distinct().count()
    }
    time("corpus grams explode") {
      corpus.select(col("doc_id"), explode(Decontamination.wordNgramHashes(col("text"), 5)).as("g"))
        .count()
    }
    time("full report") {
      Decontamination.contaminationReport(corpus, "doc_id", "text", bench, "text", 5, 3).count()
    }
    time("full report x2") {
      Decontamination.contaminationReport(corpus, "doc_id", "text", bench, "text", 5, 3).count()
    }
    // 10× corpus amplification
    val big = (0 until 10).map(i => corpus.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    time("full report 10x corpus") {
      Decontamination.contaminationReport(big, "doc_id", "text", bench, "text", 5, 3).count()
    }
    spark.stop()
  }
}
