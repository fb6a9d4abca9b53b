package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — importance resampling of a raw corpus
  * toward a target distribution (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", 2023): fit hashed-n-gram
  * bag-of-words models on the target set and on the raw corpus, weight
  * every raw document by its log likelihood ratio, and Gumbel-top-k
  * resample so the kept subset is distributed like the target. The
  * classifier-free sibling of [[QualityModel]] for "make pretraining
  * data look like the high-quality reference" curation.
  *
  * Beyond-reference scope (the reference has no selection stage at all);
  * built on the REPLAYABLE md5 feature kernel (feature index =
  * bigint(md5(gram)[0:15 hex]) % buckets, the same playbook as
  * [[QualityModel.scoreReplayable]] / Sampling.hashUnit), so the whole
  * pipeline — tokenize, gram, hash, count, smooth, log-ratio, sum,
  * Gumbel — replays bit-comparably in DuckDB and the gates are EXACT.
  *
  * Scale shape (the 100 TB path):
  *  - one map-side explode of corpus grams; bucket counts are a single
  *    map-side-combining groupBy on a key space bounded by `buckets`
  *    (default 10k) — never by corpus size;
  *  - the log-ratio table is at most `buckets` rows and BROADCASTS to
  *    the per-gram join, so the corpus stream never shuffles on gram
  *    values (no hot-token key skew possible);
  *  - per-doc weights are one map-side-combining sum keyed on the
  *    uniformly distributed id — the only corpus-sized shuffle;
  *  - totals ride 1-row broadcast cross joins (no eager driver jobs);
  *  - top-k selection is TakeOrderedAndProject (per-partition heads,
  *    driver merges k per partition — size k accordingly, or filter by
  *    a weight threshold for unbounded selection).
  */
object Dsir {

  /** Hashed gram buckets (unigrams + optional space-joined bigrams,
    * counts preserved — DSIR weights are bag-of-words sums, not sets).
    * Pure built-ins: stays in whole-stage codegen and replays in DuckDB.
    */
  private[ops] def gramBuckets(textCol: Column, buckets: Int,
      useBigrams: Boolean): Column = {
    val toks = filter(split(lower(trim(coalesce(textCol, lit("")))), "\\s+"),
      t => length(t) > 0)
    // space-joined bigram windows: cannot collide with unigrams (tokens
    // are \s+-split so carry no spaces); zip_with pads with null, filter
    // keeps exactly the n-1 full windows
    val grams =
      if (!useBigrams) toks
      else concat(toks, filter(
        zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => when(b.isNotNull, concat_ws(" ", a, b))),
        x => x.isNotNull))
    transform(grams, t =>
      (conv(substring(md5(t), 1, 15), 16, 10).cast("long") % buckets).cast("int"))
  }

  /** `(idCol, log_weight)` for every corpus row: the DSIR importance
    * log-weight `sum_g [ln p_target(bucket(g)) - ln p_raw(bucket(g))]`
    * over the document's grams, under add-`smoothing` estimates of both
    * bucket distributions. Documents with no grams (empty/null text)
    * weigh 0. Deterministic given (corpus, target, parameters).
    */
  def importanceWeights(
      corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 10000, smoothing: Double = 1.0,
      useBigrams: Boolean = true): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(smoothing > 0, s"smoothing must be positive, got $smoothing")
    // The gram stream feeds TWO consumers (the raw bucket counts and the
    // per-doc ratio sum) — materialize it through ONE id-keyed exchange so
    // Spark plans the second read as a ReusedExchange and the
    // tokenize/gram/md5 pass (THE dominant CPU stage at corpus scale) runs
    // once. Net-zero added shuffle: the per-doc sum's groupBy(id) needed
    // this exact partitioning anyway, so its exchange disappears.
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val corpusGrams = corpus.select(col(idCol),
      explode(gramBuckets(col(s"`$textCol`"), buckets, useBigrams)).as("__b"))
      .repartition(par, col(idCol))
    val rawCounts = corpusGrams.groupBy("__b").agg(count(lit(1)).as("__rc"))
    val tgtCounts = target
      .select(explode(gramBuckets(col(s"`$targetTextCol`"), buckets, useBigrams)).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__tc"))
    val rawTotal = rawCounts.agg(sum("__rc").as("__rt"))
    val tgtTotal = tgtCounts.agg(sum("__tc").as("__tt"))
    // buckets unseen in the corpus can't appear in any corpus doc — the
    // raw side is the ratio table's spine; target-absent buckets smooth
    // to ln(a) - ln(tt + a*B). Totals are 1-row aggregates riding
    // broadcast cross joins (lazy; no driver-side collect).
    val a = lit(smoothing)
    val aB = lit(smoothing * buckets)
    val ratio = rawCounts
      // both count tables are bounded by `buckets`, never by data size —
      // the target side broadcasts so no stage ever sorts on gram buckets
      .join(broadcast(tgtCounts), Seq("__b"), "left")
      .crossJoin(broadcast(rawTotal))
      .crossJoin(broadcast(tgtTotal))
      .select(col("__b"),
        (log(coalesce(col("__tc"), lit(0L)) + a) - log(coalesce(col("__tt"), lit(0L)) + aB)
          - log(col("__rc") + a) + log(coalesce(col("__rt"), lit(0L)) + aB)).as("__lr"))
    val summed = corpusGrams
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol)).agg(sum("__lr").as("log_weight"))
    corpus.select(col(idCol))
      .join(summed, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** Gumbel-top-k importance resampling: select `k` corpus rows with
    * probability proportional to their importance weight (the Gumbel-max
    * trick — key = log_weight + Gumbel(0,1), take the k largest), with
    * DETERMINISTIC noise from `Sampling.hashUnit(seed, id)` so the same
    * inputs select the same rows on any engine and any run. Returns the
    * selected corpus rows plus the `sample_key` column (descending =
    * selection order).
    */
  def resampleTopK(
      corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      k: Int, seed: String = "dsir",
      buckets: Int = 10000, smoothing: Double = 1.0,
      useBigrams: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = importanceWeights(corpus, idCol, textCol, target, targetTextCol,
      buckets, smoothing, useBigrams)
    // clamp the unit draw away from 0 (ln(0) = -Inf; the clamp is the
    // replayable floor 2^-32, the draw's own resolution)
    val u = greatest(Sampling.hashUnit(seed, col(idCol)), lit(1.0 / 4294967296.0))
    val keyed = w.withColumn("sample_key", col("log_weight") - log(-log(u)))
    corpus.join(keyed.orderBy(col("sample_key").desc).limit(k), Seq(idCol))
  }

  /** Threshold form of [[resampleTopK]] for UNBOUNDED selection sizes:
    * keep every row whose Gumbel-perturbed key reaches `minKey` — a pure
    * map-side filter (no top-k driver merge, no global sort), the shape
    * that survives selecting billions of documents. Calibrate `minKey`
    * with [[calibrateThreshold]] (the k-th-key order statistic of a
    * deterministic subsample — the classic threshold-from-quantile
    * pattern, turnkey). Same deterministic noise
    * and keys as [[resampleTopK]]: equal inputs select equal rows.
    */
  def resampleByThreshold(
      corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      minKey: Double, seed: String = "dsir",
      buckets: Int = 10000, smoothing: Double = 1.0,
      useBigrams: Boolean = true): DataFrame = {
    val w = importanceWeights(corpus, idCol, textCol, target, targetTextCol,
      buckets, smoothing, useBigrams)
    val u = greatest(Sampling.hashUnit(seed, col(idCol)), lit(1.0 / 4294967296.0))
    val keyed = w.withColumn("sample_key", col("log_weight") - log(-log(u)))
      .filter(col("sample_key") >= minKey)
    corpus.join(keyed, Seq(idCol))
  }

  /** Turnkey `minKey` calibration for [[resampleByThreshold]]: estimate
    * the k-th largest Gumbel key of the FULL corpus from a deterministic
    * id-hash subsample. Keys are computed with the run's own seed and
    * parameters over the full-corpus importance weights, so a sampled
    * row's key is IDENTICAL to its key in the full run — the estimator is
    * the classic scaled order statistic: the `ceil(k·fraction)`-th largest
    * key among rows whose calibration draw falls below `fraction`.
    *
    * Error bound: selecting at the returned threshold keeps a count
    * concentrated around k with standard deviation ~ `sqrt(k/fraction)`
    * (binomial rank noise of the sample quantile) — at k = 1e8 and a 1%
    * sample that is ±0.1% relative. At `fraction = 1.0` the estimate is
    * EXACT: thresholding at it reproduces [[resampleTopK]]'s selection
    * (continuous keys make ties measure-zero). The driver merges
    * `k·fraction` keys (TakeOrderedAndProject) — size `fraction`
    * accordingly; a sample smaller than `k·fraction` returns its minimum
    * key (select-everything, the right degenerate answer).
    */
  def calibrateThreshold(
      corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      k: Int, fraction: Double = 0.01, seed: String = "dsir",
      buckets: Int = 10000, smoothing: Double = 1.0,
      useBigrams: Boolean = true): Double = {
    require(k > 0, s"k must be positive, got $k")
    require(fraction > 0 && fraction <= 1,
      s"fraction must be in (0, 1], got $fraction")
    val w = importanceWeights(corpus, idCol, textCol, target, targetTextCol,
      buckets, smoothing, useBigrams)
    val u = greatest(Sampling.hashUnit(seed, col(idCol)), lit(1.0 / 4294967296.0))
    val keyed = w.withColumn("sample_key", col("log_weight") - log(-log(u)))
    val sampled =
      if (fraction >= 1.0) keyed
      else keyed.filter(Sampling.hashUnit(s"$seed:calib", col(idCol)) < fraction)
    val kSample = math.max(1L, math.round(k * fraction)).toInt
    val heads = sampled.select("sample_key")
      .orderBy(col("sample_key").desc).limit(kSample)
      .collect().map(_.getDouble(0))
    require(heads.nonEmpty,
      "calibration sample is empty — raise fraction or check the corpus")
    heads.last
  }
}
