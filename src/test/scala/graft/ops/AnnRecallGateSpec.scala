package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The ANN recall gates must have TEETH: a deliberately degraded
  * configuration (dropping the radius-2 probes the gate configuration
  * uses) has to measure recall BELOW the pinned floor, proving the floor
  * actually trips on a bucketing regression rather than waving anything
  * through. Deterministic: hyperplanes are seeded, the corpus is fixed.
  */
class AnnRecallGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("healthy gate config clears the per-dir floors at sf0.001") {
    val rows = SparkEntry.queries("q_ann_lsh")(spark, dir).collect()
      .map(r => r.getDouble(1))
    val (minFloor, meanFloor) = SparkEntry.recallFloors(dir, "lsh")
    rows.min should be >= minFloor
    rows.sum / rows.length should be >= meanFloor
  }

  test("degraded LSH (no multi-probe) measures recall under the floor") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val approx = Similarity.lshTopKMultiProbe(
      e, q, "vec_id", "embedding", "query_id", "qvec", k = 10, dim = 64, bits = 6,
      probeRadius = 0)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "query_id", "qvec", 10)
    val recs = Similarity.recallVs(approx, exact, "query_id", "vec_id")
      .collect().map(_.getDouble(1))
    val (_, meanFloor) = SparkEntry.recallFloors(dir, "lsh")
    // the degradation is visible: mean recall falls under the gate floor
    (recs.sum / recs.length) should be < meanFloor
  }
}
