package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Decontamination

/** The semantic decontaminator's cost cliff: the BNLJ is O(corpus × bench)
  * pair tests map-side, documented as fine for eval-suite-sized
  * benchmarks. This probe measures where that stops being true — bench
  * sizes 1×, 10×, 100× the embeddings fixture's query slice — with the
  * prefix-bound prefilter ON vs OFF, so the prefilter's per-pair saving
  * (an unrolled 8-term bound ahead of the full 64-dim cosine) is a pinned
  * number, not a guess. Also asserts ON ≡ OFF row counts at every size:
  * a prefilter that changed the answer would be a bug, not a speedup.
  * Run: sbt "Test/runMain graft.tools.StressDecontamSemantic"
  */
object StressDecontamSemantic {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.persist(); emb.count()
    val corpus = emb.filter(col("vec_id") % 7 =!= 0)
    // benchmark = jittered copies of IN-CORPUS rows (every 13th), so real
    // leakage exists and the ON≡OFF row-count check has teeth, plus
    // out-of-corpus rows (every 7th) for the non-matching bulk
    val bench1 = emb.filter(col("vec_id") % 7 === 0)
      .select(col("embedding").as("bvec"))
      .unionByName(emb.filter(col("vec_id") % 7 =!= 0 && col("vec_id") % 13 === 0)
        .select(transform(col("embedding"),
          x => x * lit(1.01f) + lit(0.001f)).as("bvec")))
    bench1.persist()
    val n1 = bench1.count()
    def amplify(times: Int) = // jitter a tail dim so rows stay distinct
      (0 until times).map(i => bench1.select(
        transform(col("bvec"), (x, j) =>
          when(j === 63, x + lit(i * 1e-4f)).otherwise(x)).as("bvec")))
        .reduce(_ unionByName _)
    def time(label: String)(f: => Long): Long = {
      // min-of-2: host-window noise swung a single-shot 100x measurement
      // 1.9x between runs; the min is the comparable number
      var n = 0L
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); n = f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label: $secs%.2f s  (rows=$n)")
      n
    }
    println(s"corpus=${corpus.count()} bench 1x=$n1")
    // warm codegen/JIT on both shapes so the first timed round is honest
    Decontamination.semanticContaminationReport(
      corpus, "vec_id", "embedding", bench1, "bvec", 0.95).count()
    Decontamination.semanticContaminationReport(
      corpus, "vec_id", "embedding", bench1, "bvec", 0.95,
      prefilterDims = 0).count()
    for (mult <- Seq(1, 10, 100)) {
      val bench = amplify(mult); bench.persist(); bench.count()
      val on = time(f"bench ${mult}%3dx, prefilter ON ") {
        Decontamination.semanticContaminationReport(
          corpus, "vec_id", "embedding", bench, "bvec", 0.95).count()
      }
      val off = time(f"bench ${mult}%3dx, prefilter OFF") {
        Decontamination.semanticContaminationReport(
          corpus, "vec_id", "embedding", bench, "bvec", 0.95,
          prefilterDims = 0).count()
      }
      require(on == off, s"prefilter changed the answer at ${mult}x: $on != $off")
      bench.unpersist()
    }
    spark.stop()
  }
}
