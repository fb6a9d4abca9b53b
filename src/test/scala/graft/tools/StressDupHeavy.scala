package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Pathological-skew probe: a 90%-duplicate corpus, where naive LSH
  * bucketing degenerates into one giant bucket per band (quadratic pair
  * blowup). The capped collect-per-bucket pattern must keep the pair count
  * bounded and finish; minhashDedup must keep per-task shuffle reads
  * balanced (no bucket funnels into a single window-sort task).
  * Run: sbt "Test/runMain graft.tools.StressDupHeavy"
  */
object StressDupHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // scale AQE's skew-split thresholds down to probe size so the same
      // machinery that splits a hot join partition at 100 TB (default
      // threshold 256 MB) engages here; the assertion below then proves the
      // plan has no skew AQE *cannot* fix (windows are unsplittable)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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

    // ---- minhashDedup task-balance probe: 10x corpus, 90% one dup cluster.
    // The dup cluster makes every band's hot bucket hold ~0.9*N ids; with a
    // per-bucket window that entire bucket sorts in ONE task. The agg+join
    // shape must keep each heavy stage's max task read within 2x its mean.
    val nBig = 500000
    val bigDocs = spark.range(nBig).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 9,
        lit("the same duplicated document body appearing everywhere in the corpus over and over"))
        .otherwise(concat_ws(" ", md5(col("id").cast("string")),
          sha2(col("id").cast("string"), 256))).as("text"))

    val stageReads = TrieMap.empty[Int, ArrayBuffer[Long]]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) stageReads.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
          .synchronized { stageReads(t.stageId) += m.shuffleReadMetrics.totalBytesRead }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t2 = System.nanoTime()
    val survivors = Dedup.minhashDedup(bigDocs, "doc_id", "text", threshold = 0.8).count()
    println(f"minhashDedup 90%%-dup $nBig docs: ${(System.nanoTime() - t2) / 1e9}%.1f s, survivors=$survivors")
    spark.sparkContext.removeSparkListener(listener)
    // 1 survivor from the dup cluster + the 10% uniques
    require(survivors == nBig / 10 + 1, s"expected ${nBig / 10 + 1} survivors, got $survivors")

    // only stages moving real data matter; tiny stages are noise
    val heavy = stageReads.toSeq.map { case (sid, reads) => (sid, reads.toSeq) }
      .filter(_._2.sum > 16L * 1024 * 1024).sortBy(_._1)
    require(heavy.nonEmpty, "probe expected at least one heavy shuffle stage")
    heavy.foreach { case (sid, reads) =>
      val mean = reads.sum.toDouble / reads.length
      val max = reads.max.toDouble
      println(f"stage $sid: tasks=${reads.length} total=${reads.sum / 1e6}%.1f MB " +
        f"mean=${mean / 1e6}%.1f MB max=${max / 1e6}%.1f MB ratio=${max / mean}%.2f")
      require(max <= 2.0 * mean,
        f"stage $sid skewed: max task read ${max / 1e6}%.1f MB > 2x mean ${mean / 1e6}%.1f MB")
    }
    println("minhash task-balance stress OK")
    spark.stop()
  }
}
