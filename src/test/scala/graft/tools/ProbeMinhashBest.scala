package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: stage timings + candidate volume for the
  * q_dedup_minhash_best shape on sf0.1 documents.
  */
object ProbeMinhashBest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val m1 = d.withColumn("doc_id", col("doc_id") + 1000000)
      .withColumn("text", concat(lit("v1 "), col("text")))
    val m2 = d.withColumn("doc_id", col("doc_id") + 2000000)
      .withColumn("text", concat(lit("v2 v2 "), col("text")))
    val all = d.unionByName(m1).unionByName(m2)

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = time("signatures") {
      val s = Dedup.minhashSignatures(all, "doc_id", "text").cache()
      s.count(); s
    }
    val banded = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band", "bucket")))
    val buckets = time("bucket agg") {
      val b = banded.groupBy("band", "bucket").agg(count(lit(1)).as("n")).cache()
      b.count(); b
    }
    buckets.agg(max("n").as("max_bucket"), sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2)).as("pairs_upper")).show()
    buckets.filter(col("n") > 100).agg(count(lit(1)).as("big_buckets"), sum(col("n")).as("rows_in_big")).show()
    val edges = time("full keep-best") {
      Dedup.minhashDedupCCKeepBest(all, "doc_id", "text", length(col("text")), threshold = 0.6).count()
    }
    println(s"survivors: $edges")
    spark.stop()
  }
}
