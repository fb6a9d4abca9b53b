package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ktk.{DatasetMetadata, Ktk}
import graft.streaming.KtkSink

/** Scale probe for the near-dup dedup-on-ingest sink (r16): waves of
  * crawl-shaped batches commit through
  * [[KtkSink.commitBatchNearDeduped]] at 1x and 10x batch size against a
  * growing persisted-signature history, measuring per-wave commit time
  * and verifying exact invariants with no statistical slack:
  *
  *  - FRESH docs are synthetic with per-doc-disjoint token universes
  *    (pairwise Jaccard 0 by construction), so every fresh doc must
  *    admit;
  *  - PLANTS are 5-char-prefix near-copies of rows read back from the
  *    ALREADY-ADMITTED table (J >= 0.9 vs their source by construction),
  *    so every plant must drop;
  *  - the persisted signature history must be bit-equal to a
  *    recomputation from the admitted text.
  *
  * Per-wave cost must track the BATCH, not the accumulated history —
  * the history side is one narrow column-pruned scan, candidate-pruned
  * by the batch's banded broadcast.
  * Run: sbt "Test/runMain graft.tools.StressNearDedupSink"
  */
object StressNearDedupSink {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val perWaveBase = 5000L

    for (mult <- Seq(1, 10)) {
      val base = java.nio.file.Files.createTempDirectory(s"neardedup$mult").toString
      val uuid = "crawl"
      Ktk.createEmpty(spark, base, uuid, StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("sig", BinaryType), StructField("bands", ArrayType(LongType)))))
      val n = perWaveBase * mult
      // per-doc-disjoint CHARACTER content (minhash shingles are 5-char):
      // each token is a 16-hex-char md5 slice of (wave, doc, k), so two
      // distinct docs share ~1e-3 of their 5-gram sets — far below any
      // threshold, while a 5-char-prefix plant of the same doc shares
      // ~99% of them
      def fresh(w: Int) = spark.range(n)
        .select((col("id") + w * 1000000000L).as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(39)),
            k => substring(md5(concat(lit(s"w${w}d"), col("id"), lit("x"), k)), 1, 16)))
            .as("text"))
      var history = 0L
      for (w <- 0 until 3) {
        val plants =
          if (w == 0) fresh(0).limit(0)
          else Ktk.readTable(spark, base, uuid)
            .select((col("doc_id") + 5000000000L * w).as("doc_id"),
              concat(lit("xqzy "), col("text")).as("text"))
        val batch = fresh(w).unionByName(plants)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bn = batch.count()
        val t0 = System.nanoTime()
        KtkSink.commitBatchNearDeduped(batch, base, uuid, "doc_id", "text",
          batchId = w, threshold = 0.6)
        val dt = (System.nanoTime() - t0) / 1e9
        val total = Ktk.readTable(spark, base, uuid).count()
        val admitted = total - history
        println(f"  x$mult wave $w: batch=$bn (plants=${bn - n}) commit=$dt%.1f s admitted=$admitted (history now $total)")
        // exact: every fresh doc admits, every plant drops
        require(admitted == n, s"wave $w admitted $admitted, expected $n")
        history = total
        batch.unpersist()
      }
      // the persisted signatures ARE the history: bit-equal to a
      // recomputation from the admitted text
      val persisted = Ktk.readTable(spark, base, uuid)
      val drift = persisted.select(col("doc_id").as("id"), col("sig"), col("bands"))
        .exceptAll(graft.ops.Dedup.minhashSignatures(
          persisted.select("doc_id", "text"), "doc_id", "text")).count()
      require(drift == 0L, s"signature history drifted: $drift rows")
      println(s"  x$mult: signature history bit-equal to recomputation; exact invariants hold")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    }
    println("StressNearDedupSink OK")
    spark.stop()
  }
}
