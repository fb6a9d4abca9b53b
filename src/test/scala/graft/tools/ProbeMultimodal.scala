package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Stage-level timing probe for the multimodal dedup gates: how much of
  * q_image_dedup is synthesis, fingerprint, GraphX CC, and how much is the
  * re-execution of the pipeline for the invariant collect + final output.
  * Run: Test/runMain graft.tools.ProbeMultimodal /root/testdata/sf0.1
  */
object ProbeMultimodal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def png(seed: Int, perturb: Boolean): Array[Byte] = {
      val (w, h) = (36, 32)
      val px = Array.tabulate(w * h) { i =>
        val (x, y) = (i % w, i / w)
        val v = (128 + 90 * math.sin(x * 0.4 + seed * 1.7) * math.cos(y * 0.3 + seed)).toInt +
          (if (perturb && (i == 40 || i == 500)) 40 else 0)
        v.max(0).min(255).toByte
      }
      Multimodal.encodeGrayPng(px, w, h)
    }
    // driver-side kernel costs
    time("synth 2000 png (driver)") { (0 until 2000).foreach(i => png(i % 32, i % 3 == 0)) }
    val blobs = (0 until 2000).map(i => png(i % 32, i % 3 == 0)).toArray
    time("dHash 2000 png (driver)") { blobs.foreach(Multimodal.imageDHash) }
    time("dHash 2000 png again") { blobs.foreach(Multimodal.imageDHash) }

    for (rep <- 1 to 2) {
      println(s"rep $rep")
      val clsUdf = udf((id: Long) => (id % 32).toInt)
      val imgUdf = udf((cls: Int, perturb: Boolean) => png(cls, perturb))
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id")).orderBy("doc_id").limit(2000)
        .withColumn("cls", clsUdf(col("doc_id")))
        .withColumn("img", imgUdf(col("cls"), col("doc_id") % 3 === 0))
      time("docs synth+fingerprint only") {
        Multimodal.nearDupImagePairs(docs, "doc_id", "img", 3, 1000).count()
      }
      val kept = time("dedupImagesNearDup build+cc") {
        Multimodal.dedupImagesNearDup(docs, "doc_id", "img", maxHamming = 3)
      }
      val ids = time("collect keptIds") { kept.select("doc_id").collect() }
      time("expIds groupBy") { docs.groupBy("cls").agg(min("doc_id")).collect() }
      time("final re-exec (noop)") {
        kept.select("doc_id", "cls").write.format("noop").mode("overwrite").save()
      }
      println(s"  kept=${ids.length}")
    }
    spark.stop()
  }
}
