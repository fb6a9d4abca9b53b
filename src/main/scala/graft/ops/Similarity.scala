package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (a broadcast of the query set +
  * codegen'd dot products — no shuffle of the corpus). Scale path: random-
  * hyperplane LSH bucketing or IVF (k-means coarse quantizer) so each query
  * probes only a fraction of the corpus. All arithmetic uses native
  * higher-order functions (`aggregate`/`zip_with`) inside whole-stage
  * codegen; no UDF in the hot path.
  */
object Similarity {

  /** dot(a,b) via zip_with + aggregate, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row (small set — broadcast),
    * scan the corpus once, keep k best per query via window.
    * 100 TB shape: the corpus never shuffles — the only wide op is the
    * top-k aggregation on (query_id), whose input is already cut to
    * k × queries per partition by the per-partition rank pushdown AQE
    * applies to window-limit patterns.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .select(col(queryIdCol), col(idCol),
        cosine(col(vecCol), col(queryVecCol)).as("cos"))
      .filter(col(queryIdCol) =!= col(idCol))
    val w = Window.partitionBy(queryIdCol).orderBy(col("cos").desc, col(idCol))
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Radius search: all pairs (query, corpus) with cosine >= minCosine. Set
    * semantics (no ranking) — robust for differential testing.
    */
  def radiusSearch(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      queryIdCol: String, queryVecCol: String,
      minCosine: Double): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .select(col(queryIdCol), col(idCol), cosine(col(vecCol), col(queryVecCol)).as("cos"))
      .filter(col(queryIdCol) =!= col(idCol) && col("cos") >= minCosine)

  /** Random-hyperplane LSH signature: `bits` sign bits of dot(v, h_i) with
    * deterministic pseudo-random hyperplanes derived from (i, dim) — no
    * stored model, reproducible across runs. Vectors sharing a signature
    * bucket are near-duplicate candidates.
    */
  def lshBucket(vecColName: String, dim: Int, bits: Int = 16): Column = {
    // h_i[d] in {-1,+1} from a hash of (i,d): sign bit of xxhash64
    val planeExprs = (0 until bits).map { i =>
      val terms = s"aggregate(zip_with(`$vecColName`, sequence(0, ${dim - 1}), " +
        s"(x, d) -> CAST(x AS DOUBLE) * (CASE WHEN xxhash64($i, d) > 0 THEN 1.0 ELSE -1.0 END)), " +
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
      s"(CASE WHEN $terms >= 0 THEN ${1L << i}L ELSE 0L END)"
    }
    expr(planeExprs.mkString("(", " + ", ")"))
  }

  /** Bucketed ANN: group corpus by LSH bucket, search each query only in its
    * bucket. Approximate (single-probe) — the 100-TB path where brute force
    * is off the table.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      queryIdCol: String, queryVecCol: String,
      k: Int, dim: Int, bits: Int = 12): DataFrame = {
    val cb = corpus.withColumn("__bucket", lshBucket(vecCol, dim, bits))
    val qb = queries.withColumn("__bucket", lshBucket(queryVecCol, dim, bits))
    val joined = cb.join(qb.hint("broadcast"), Seq("__bucket"))
      .select(col(queryIdCol), col(idCol), cosine(col(vecCol), col(queryVecCol)).as("cos"))
      .filter(col(queryIdCol) =!= col(idCol))
    val w = Window.partitionBy(queryIdCol).orderBy(col("cos").desc, col(idCol))
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Embedding near-duplicate pairs: all corpus pairs with cosine >=
    * threshold, found via LSH buckets (only within-bucket pairs are scored).
    */
  def embeddingNearDupCandidates(
      corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, minCosine: Double, bits: Int = 10): DataFrame = {
    val cb = corpus.withColumn("__bucket", lshBucket(vecCol, dim, bits))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("__bucket"))
    cb.as("a").join(cb.as("b"), col("a.__bucket") === col("b.__bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** IVF-style ANN: coarse-quantize the corpus with k-means (MLlib), then
    * probe only the `nprobe` nearest centroids per query. Returns top-k.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      queryIdCol: String, queryVecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val train = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(train)
    val centroids = km.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centDf = spark.createDataFrame(centroids.toSeq).toDF("cid", "centroid")

    def nearestCids(vecDf: DataFrame, vcol: String, n: Int): DataFrame =
      vecDf.crossJoin(broadcast(centDf))
        .withColumn("dist", aggregate(
          zip_with(col(vcol).cast("array<double>"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, x) => a + x))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(vecDf.columns.head).orderBy(col("dist"), col("cid"))))
        .filter(col("__rn") <= n).drop("__rn", "dist", "centroid")

    val corpusAssigned = nearestCids(corpus.select(col(idCol), col(vecCol)), vecCol, 1)
    val queryAssigned = nearestCids(queries.select(col(queryIdCol), col(queryVecCol)), queryVecCol, nprobe)
    val joined = corpusAssigned.join(queryAssigned.hint("broadcast"), Seq("cid"))
      .select(col(queryIdCol), col(idCol), cosine(col(vecCol), col(queryVecCol)).as("cos"))
      .filter(col(queryIdCol) =!= col(idCol))
    val w = Window.partitionBy(queryIdCol).orderBy(col("cos").desc, col(idCol))
    joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
