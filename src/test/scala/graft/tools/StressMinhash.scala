package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
/** Scale probe: minhash dedup over 100k documents (sf0.1 x 10 mutations).
  * Run: sbt "Test/runMain graft.tools.StressMinhash"
  */
object StressMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // 10 variants per doc: 1 exact + 9 near-mutations
    val big = (0 until 10).map { i =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", if (i == 0) col("text") else concat(lit(s"variant$i "), col("text")))
    }.reduce(_ unionByName _)
    println(s"docs=${big.count()}")
    val t0 = System.nanoTime()
    val survivors = Dedup.minhashDedup(big, "doc_id", "text", threshold = 0.6).count()
    println(f"minhashDedup 100k docs: ${(System.nanoTime()-t0)/1e9}%.1f s, survivors=$survivors")
    val t1 = System.nanoTime()
    val cc = Dedup.minhashDedupCC(big, "doc_id", "text", threshold = 0.6).count()
    println(f"minhashDedupCC 100k docs: ${(System.nanoTime()-t1)/1e9}%.1f s, survivors=$cc")
    spark.stop()
  }
}
