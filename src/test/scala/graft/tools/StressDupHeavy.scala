package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Pathological-skew probe: a 90%-duplicate corpus, where naive LSH
  * bucketing degenerates into one giant bucket per band (quadratic pair
  * blowup). The capped collect-per-bucket pattern must keep the pair count
  * bounded and finish.
  * Run: sbt "Test/runMain graft.tools.StressDupHeavy"
  */
object StressDupHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 50000
    // 90% of rows share ONE text (one hot simhash bucket); 10% distinct
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 9, lit("the same duplicated document body appearing everywhere"))
        .otherwise(concat(lit("unique text number "), col("id"))).as("text"))

    val t0 = System.nanoTime()
    val simPairs = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3, maxBucket = 1000).count()
    println(f"simhash 90%%-dup $n docs: ${(System.nanoTime() - t0) / 1e9}%.1f s, pairs=$simPairs")
    // uncapped this would be ~(0.9*n)^2/2 ≈ 1.0e9 pairs; the cap bounds it
    require(simPairs <= 1000L * 1000 * 4, s"pair count $simPairs not bounded")

    // embeddings: 90% identical vector -> one hot LSH bucket
    val emb = spark.range(n).select(col("id").as("vec_id"),
      when(pmod(col("id"), lit(10)) < 9,
        array((0 until 16).map(d => lit(0.5f + d * 0.01f)): _*))
        .otherwise(array((0 until 16).map(d => pmod(col("id") * (d + 1), lit(97)).cast("float")): _*))
        .as("embedding"))
    val t1 = System.nanoTime()
    val embPairs = Similarity.embeddingNearDupCandidates(
      emb, "vec_id", "embedding", dim = 16, minCosine = 0.9, bits = 8, maxBucket = 1000).count()
    println(f"emb-neardup 90%%-dup $n docs: ${(System.nanoTime() - t1) / 1e9}%.1f s, pairs=$embPairs")
    require(embPairs <= 1000L * 1000 * 256, s"pair count $embPairs not bounded")
    println("bounded-bucket stress OK")
    spark.stop()
  }
}
