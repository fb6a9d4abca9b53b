package graft.tools

import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing for the q_pipeline_curation composite (quiet-host
  * adjudication aid): doc-frequency paragraph scrub → keep-best exact dedup
  * → token-budget selection → shard assignment. Each stage is forced with a
  * count so the stage boundary is a real materialization, mirroring what an
  * end-to-end run pays in aggregate.
  */
object ProbeCuration {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val dir = "/root/testdata/sf0.1"
    def docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs
      .select(col("doc_id"),
        concat(lit("CURATION HEADER\n"),
          regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n")).as("text"))
      .unionByName(docs
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(lit("CURATION HEADER\n"),
            regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n")).as("text")))

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      time("input union + regex")(d.count())
      val scrubbed = time("paragraphDedupFrequent") {
        val s = Dedup.paragraphDedupFrequent(d, "doc_id", "text", maxDf = 2L)
          .withColumn("tok", TextAnalysis.tokenCount(col("text"))).cache()
        s.count(); s
      }
      val deduped = time("exactKeepBest") {
        val x = Dedup.exactKeepBest(scrubbed, "doc_id", "text", col("tok")).cache()
        x.count(); x
      }
      val selected = time("takeByBudget") {
        val x = Sampling.takeByBudget(deduped,
          Seq(col("tok").desc, col("doc_id")), "tok", budget = 20000L).cache()
        x.count(); x
      }
      time("shard + final agg") {
        val sharded = Sampling.shardCorpus(selected, col("doc_id"), "tok",
          shardTokens = 2000L, seed = "cur0")
        sharded.groupBy("shard_id").agg(sum("tok").as("load"), count(lit(1)).as("n"))
          .agg(count(lit(1)).as("shards"), sum("n").as("docs_selected"))
          .collect()
      }
      scrubbed.unpersist(); deduped.unpersist(); selected.unpersist()
    }
    spark.stop()
  }
}
