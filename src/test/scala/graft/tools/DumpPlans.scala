package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for the scale-critical queries — the
  * evidence behind PLANS.md. Run:
  * sbt "Test/runMain graft.tools.DumpPlans /root/testdata/sf0.001"
  */
object DumpPlans {
  private val Picked = Seq(
    "q_ktk_pushdown", "q1_agg", "q_ann_ivf", "q_dedup_simhash",
    "q_range_join", "q_salted_join", "q_ktk_zonemap", "q_ann_pq",
    "q_spj_merge", "q_dsv2_agg", "q_bloom_semijoin", "q_dedup_paragraph",
    "q_dedup_minhash", "q_ann_ivfpq", "q_dedup_keepbest",
    "q_dedup_spans", "q_dup_ngrams", "q_tfidf")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Picked.foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
