package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** One-off: print measured LSH / IVF recall per scale dir so the gate
  * floors can sit just under the deterministic observed values.
  */
object MeasureRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("measure-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      Seq("q_ann_lsh", "q_ann_ivf", "q_ann_pq", "q_ann_ivfpq").foreach { q =>
        val rows = SparkEntry.queries(q)(spark, dir).collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
        println(s"RECALL $sf $q ${rows.map(_._2).mkString(",")}")
      }
    }
    spark.stop()
  }
}
