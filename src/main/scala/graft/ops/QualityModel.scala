package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the GPT-3 /
  * CCNet-style curation pipeline (train a linear model on a small
  * "high-quality vs crawl" labeled set, score the whole corpus, keep
  * documents above a probability threshold). The reference has no model
  * stage (heuristics only, ≙ [[TextAnalysis.qualityScore]]); this is the
  * beyond-reference operator a training-data pipeline needs next to it.
  *
  * Features are hashed term frequencies of unigrams (+ optional bigrams,
  * fastText-style) via MLlib's [[HashingTF]]; the model is an L2 logistic
  * regression. Training runs on the LABELED set only — quality-labeled
  * sets are small (thousands to millions of rows), so the distributed
  * L-BFGS fit is incidental; SCORING is the 100 TB-scale path and is a
  * pure per-row projection: hash tokens, one sparse dot product against
  * the broadcast coefficient vector — no shuffle, no model state on
  * executors beyond the closure-broadcast weights.
  */
object QualityModel {

  /** A trained quality classifier: hashed-TF featurization parameters plus
    * the fitted coefficients. Small (numFeatures doubles at most, sparse in
    * practice) — rides task closures as a broadcast.
    */
  final case class QualityClassifier(
      numFeatures: Int,
      useBigrams: Boolean,
      intercept: Double,
      coefficients: Vector) {

    /** p(quality=1) for one token array (driver-side convenience). */
    def scoreTokens(tokens: Seq[String]): Double = {
      val tf = new HashingTF().setNumFeatures(numFeatures)
      val all = if (useBigrams) QualityModel.withBigrams(tokens) else tokens
      var margin = intercept
      all.groupBy(tf.indexOf).foreach { case (i, ts) =>
        margin += coefficients(i) * ts.size
      }
      1.0 / (1.0 + math.exp(-margin))
    }
  }

  private[ops] def withBigrams(tokens: Seq[String]): Seq[String] =
    tokens ++ tokens.iterator.sliding(2).withPartial(false)
      .map(_.mkString("\u0001")).toSeq

  /** Lowercase whitespace tokens + optional fastText-style bigram tokens,
    * as a pure Column projection (no UDF on the train path's hot side).
    * NULL text is the EMPTY token bag (scores at the intercept), not an
    * executor NPE inside HashingTF — crawl corpora do carry null texts.
    */
  private def tokensCol(textCol: Column, useBigrams: Boolean): Column = {
    val toks = filter(split(lower(trim(coalesce(textCol, lit("")))), "\\s+"),
      t => length(t) > 0)
    if (!useBigrams) toks
    else concat(toks,
      // zip_with pads the shorter side with null; dropping those keeps
      // exactly the n-1 full bigram windows, matching withBigrams
      filter(
        // slice length must stay clear of Int overflow (start+length)
        zip_with(toks, slice(toks, lit(2), size(toks)),
          (a, b) => when(b.isNotNull, concat_ws("\u0001", a, b))),
        x => x.isNotNull))
  }

  /** Fit on a labeled frame (`labelCol` ∈ {0, 1}). The labeled set is
    * small by construction — this is NOT the corpus-scale path.
    */
  def train(
      labeled: DataFrame, textCol: String, labelCol: String,
      numFeatures: Int = 1 << 18, useBigrams: Boolean = true,
      regParam: Double = 1e-3, maxIter: Int = 100): QualityClassifier = {
    val withToks = labeled.select(
      col(s"`$labelCol`").cast("double").as("label"),
      tokensCol(col(s"`$textCol`"), useBigrams).as("__toks"))
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    // Every L-BFGS iteration is one treeAggregate over the featurized set;
    // on a SMALL labeled set spread across many partitions the per-task
    // scheduling overhead dominates the fit (30 iterations × 32 near-empty
    // tasks). Cache once, count, and coalesce to ~20k rows/partition so an
    // iteration launches only as many tasks as the data warrants — a large
    // labeled set keeps its parallelism untouched.
    val featurized = tf.transform(withToks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = featurized.count()
      val curParts = featurized.rdd.getNumPartitions
      val wantParts = math.max(1L, math.min(curParts.toLong, n / 20000L + 1L)).toInt
      val shaped = if (wantParts < curParts) featurized.coalesce(wantParts) else featurized
      val lr = new LogisticRegression()
        .setRegParam(regParam).setMaxIter(maxIter).setStandardization(false)
      val model: LogisticRegressionModel = lr.fit(shaped)
      QualityClassifier(numFeatures, useBigrams, model.intercept, model.coefficients)
    } finally featurized.unpersist()
  }

  /** p(quality=1) per row as `probCol` — the corpus-scale path: hash + one
    * sparse dot against the closure-broadcast coefficients, a narrow map
    * (zero shuffle; the UDF is the featurizer itself, same as MLlib's own
    * transform, with no per-row model object churn).
    */
  def score(df: DataFrame, textCol: String, model: QualityClassifier,
      probCol: String = "quality_prob"): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(model.numFeatures)
    val w = model.coefficients
    val b = model.intercept
    val dot = udf { (v: Vector) =>
      var s = b
      v.foreachActive((i, x) => s += w(i) * x)
      1.0 / (1.0 + math.exp(-s))
    }
    tf.transform(df.withColumn("__toks", tokensCol(col(s"`$textCol`"), model.useBigrams)))
      .withColumn(probCol, dot(col("__feat")))
      .drop("__toks", "__feat")
  }

  /** REPLAYABLE scoring twin of [[score]]: the same hashed-bag-of-tokens
    * dot product + sigmoid, but with an md5-based feature index
    * (`bigint(md5(token)[0:15 hex]) % numFeatures`) built ENTIRELY from
    * portable SQL functions — every stage (tokenize, hash, weight lookup,
    * sum, sigmoid) replays bit-comparably in DuckDB, which is what makes
    * the q_quality_model gate an exact oracle (the md5RowHash playbook).
    * Production corpus scoring stays [[score]] (murmur3 HashingTF at 2^18
    * features — an array literal that size would bloat the plan); this
    * path is for oracle replay and for SMALL inlineable weight vectors,
    * where it is also the faster shape: one codegen'd expression, no UDF,
    * no Vector object churn.
    *
    * Determinism note: pick weights that are exactly representable
    * dyadic rationals (multiples of 2^-k) and the token-order float sum
    * is EXACT, so the only cross-engine wobble left is exp()'s last ulp —
    * `scale`-digit rounding (default 6) absorbs it. Null text scores like
    * the empty document (margin = intercept), matching [[score]] on the
    * empty token bag.
    */
  def scoreReplayable(df: DataFrame, textCol: String, weights: Seq[Double],
      intercept: Double, probCol: String = "quality_prob",
      scale: Int = 6): DataFrame = {
    require(weights.nonEmpty, "scoreReplayable needs a non-empty weight vector")
    val nf = weights.size
    val wArr = array(weights.map(lit): _*) // all-literal: constant-folded once
    val toks = filter(
      split(lower(trim(coalesce(col(s"`$textCol`"), lit("")))), "\\s+"),
      t => length(t) > 0)
    def widx(t: Column): Column =
      ((conv(substring(md5(t), 1, 15), 16, 10).cast("long") % nf) + 1).cast("int")
    val margin = lit(intercept) +
      aggregate(toks, lit(0.0), (acc, t) => acc + element_at(wArr, widx(t)))
    df.withColumn(probCol, round(lit(1.0) / (lit(1.0) + exp(-margin)), scale))
  }

  /** Keep rows scoring at least `minProb` (the GPT-3 pipeline kept a
    * noisy-thresholded sample; plain thresholding is its deterministic
    * core).
    */
  def filterByQuality(df: DataFrame, textCol: String, model: QualityClassifier,
      minProb: Double): DataFrame =
    score(df, textCol, model).filter(col("quality_prob") >= minProb)
      .drop("quality_prob")

  // ------------------------------------------------------------ persistence

  /** Persist as a tiny managed parquet (one row of params + the coefficient
    * array) — same pattern as the IVF quantizer: a model is data, stored
    * next to the datasets it curates.
    */
  def saveModel(spark: SparkSession, model: QualityClassifier, path: String): Unit = {
    import spark.implicits._
    Seq((model.numFeatures, model.useBigrams, model.intercept,
      model.coefficients.toArray))
      .toDF("num_features", "use_bigrams", "intercept", "coefficients")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: SparkSession, path: String): QualityClassifier = {
    val fs = graft.ktk.DatasetMetadata.fs(spark, path)
    require(fs.exists(new Path(path)), s"no quality model at $path")
    val r = spark.read.parquet(path).head()
    QualityClassifier(
      r.getAs[Int]("num_features"),
      r.getAs[Boolean]("use_bigrams"),
      r.getAs[Double]("intercept"),
      Vectors.dense(r.getAs[Seq[Double]]("coefficients").toArray))
  }
}
