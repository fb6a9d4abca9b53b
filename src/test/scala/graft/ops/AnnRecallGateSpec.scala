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

  test("healthy near-dup gate clears its floor; degraded bucketing trips it") {
    // healthy: the gate itself asserts in-query — collecting it proves the
    // floor clears and surfaces the measured recall
    val row = SparkEntry.queries("q_emb_neardup")(spark, dir).collect().head
    val (minFloor, _) = SparkEntry.recallFloors(dir, "neardup")
    row.getDouble(2) should be >= minFloor
    // teeth: many more hyperplane bits split near-copies across buckets —
    // pair recall on the SAME planted corpus must fall under the floor
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = e.unionByName(e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.01f) + lit(0.001f)).as("embedding")))
    val cand = Similarity.embeddingNearDupCandidates(
        corpus, "vec_id", "embedding", dim = 64, minCosine = 0.9, bits = 48)
      .select("id_a", "id_b")
    val exact = Similarity.bruteForceNearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b")
    val hits = cand.join(exact, Seq("id_a", "id_b"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    recall should be < minFloor
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
