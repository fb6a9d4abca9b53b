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

  test("healthy pq and ivfpq gates clear the per-dir floors at sf0.001") {
    Seq("pq" -> "q_ann_pq", "ivfpq" -> "q_ann_ivfpq").foreach { case (kind, q) =>
      val rows = SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getDouble(1))
      val (minFloor, meanFloor) = SparkEntry.recallFloors(dir, kind)
      withClue(kind) {
        rows.min should be >= minFloor
        rows.sum / rows.length should be >= meanFloor
      }
    }
  }

  test("degraded ivfpq (nprobe=1) measures recall under the floor") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = Similarity.trainPq(e, "embedding", dim = 64, m = 8)
    val ivf = Similarity.buildIvfIndex(e, "embedding", nlist = 16)
    val codes = Similarity.ivfPqEncode(e, "vec_id", "embedding", ivf, cb)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val approx = Similarity.ivfPqTopK(
      codes, q, "vec_id", "query_id", "qvec", ivf, cb, k = 10, nprobe = 1)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", "query_id", "qvec", 10)
    val recs = Similarity.recallVs(approx, exact, "query_id", "vec_id")
      .collect().map(_.getDouble(1))
    val (_, meanFloor) = SparkEntry.recallFloors(dir, "ivfpq")
    (recs.sum / recs.length) should be < meanFloor
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
