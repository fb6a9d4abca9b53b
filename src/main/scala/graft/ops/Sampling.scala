package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / mixture / packing operators for training-data
  * pipelines. Everything is reproducible across engines and runs: the
  * "random" draw is `md5(seed:key)` mapped to a unit double, so the same
  * (seed, key) always lands on the same side of the threshold — on Spark,
  * on DuckDB, on any engine with md5. That property is what makes
  * sampled corpora auditable (and what makes these queries exactly
  * oracle-checkable).
  *
  * Scale notes: sampling/mixture are pure map-side filters after a
  * vocabulary-sized (per-domain) count aggregate — no data shuffle.
  * Sequence packing avoids the classic global-window scale-killer with a
  * two-level cumulative sum (per-partition window + a prefix over the
  * tiny per-partition totals).
  */
object Sampling {

  /** Uniform [0,1) draw from md5(seed:key) — first 8 hex chars as a 32-bit
    * integer over 2^32. Codegen'd (conv/substring/md5 are all built-ins).
    */
  def hashUnit(seed: String, key: Column): Column = hashUnitCol(lit(seed), key)

  /** [[hashUnit]] with a column-valued seed (the SQL-surface form). */
  def hashUnitCol(seed: Column, key: Column): Column =
    conv(substring(md5(concat_ws(":", seed, key.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Deterministic Bernoulli sample: keep rows with hashUnit < fraction.
    * Same (seed, key) ⇒ same decision on every engine and every run.
    */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          seed: String = "graft"): DataFrame =
    df.filter(hashUnit(seed, key) < lit(fraction))

  /** Deterministic global shuffle (epoch permutation for training runs):
    * order the corpus by md5(seed:key) — a reproducible pseudo-random
    * permutation that any engine replays bit-for-bit, unlike
    * `df.orderBy(rand(seed))` whose draw is tied to partitioning. Different
    * `seed` (e.g. the epoch number) ⇒ an independent permutation; appended
    * documents slot in without reshuffling the rest's relative order.
    * Plans as ONE range-partitioned sort: each output partition holds a
    * contiguous hash range, globally ordered — ready to write as training
    * shards.
    */
  def deterministicShuffle(df: DataFrame, key: Column, seed: String = "graft",
                           numPartitions: Option[Int] = None): DataFrame = {
    val h = md5(concat_ws(":", lit(seed), key.cast("string")))
    val parted = numPartitions match {
      case Some(n) => df.repartitionByRange(n, h)
      case None    => df.repartitionByRange(h)
    }
    parted.sortWithinPartitions(h)
  }

  /** Stratified deterministic sample: per-stratum fractions, with a default
    * for strata not in the map. One map-side filter — no shuffle.
    */
  def stratifiedSample(df: DataFrame, key: Column, strata: Column,
                       fractions: Map[String, Double], default: Double = 0.0,
                       seed: String = "graft"): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (value, f)) =>
      when(strata === lit(value), lit(f)).otherwise(acc)
    }
    df.filter(hashUnit(seed, key) < frac)
  }

  /** Deterministic train/val/test (or any-way) split: the unit draw is cut
    * into consecutive ranges sized by `splits` fractions (must sum to ≤ 1;
    * any remainder is dropped). Adds a `split` column — one map-side
    * projection, no shuffle, engine-reproducible, and stable under corpus
    * growth: a document's split never changes when other documents are
    * added or removed.
    */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
                seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    val u = hashUnit(seed, key)
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = splits.zip(bounds).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, ((name, _), hi)) =>
        when(u < lit(hi), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr).filter(col("split").isNotNull)
  }

  /** Exact-size deterministic sample: the `n` rows with the smallest hash
    * draw, per group when `groups` is non-empty. The "take exactly n"
    * primitive (Bernoulli gives binomial sizes). Global case plans as a
    * distributed top-n (TakeOrderedAndProject — per-partition heads merged
    * on the driver, no single-partition shuffle); grouped case is one
    * shuffle on the group keys. The (draw, key) sort is a total order, so
    * results are engine-reproducible.
    */
  def deterministicSampleN(df: DataFrame, key: Column, n: Int,
                           groups: Seq[String] = Nil,
                           seed: String = "graft"): DataFrame = {
    val withU = df.withColumn("__u", hashUnit(seed, key)).withColumn("__k", key)
    val out =
      if (groups.isEmpty) withU.orderBy(col("__u"), col("__k")).limit(n)
      else {
        val w = Window.partitionBy(groups.map(c => col(s"`$c`")): _*)
          .orderBy(col("__u"), col("__k"))
        withU.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= n).drop("__rn")
      }
    out.drop("__u", "__k")
  }

  /** Domain-mixture resampling: downsample each domain so the kept corpus
    * follows `weights` (e.g. uniform across languages), keeping the corpus
    * as large as the scarcest domain allows. N = min_g floor(count_g /
    * w_g); domain g keeps N*w_g rows in expectation via the deterministic
    * draw. Domains absent from `weights` are dropped.
    *
    * Scale shape: the count aggregate produces #domains rows (tiny); it is
    * broadcast back — the corpus itself is never shuffled, only filtered.
    */
  def mixtureResample(df: DataFrame, key: Column, domain: Column,
                      weights: Map[String, Double],
                      seed: String = "graft"): DataFrame = {
    val w = weights.foldLeft(lit(null).cast("double")) { case (acc, (value, f)) =>
      when(col("__domain") === lit(value), lit(f)).otherwise(acc)
    }
    val counts = df.select(domain.as("__domain"))
      .groupBy("__domain").agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", w)
      .filter(col("__w").isNotNull)
    // N = min_g floor(cnt_g / w_g): the largest total respecting every weight
    val n = counts.agg(min(floor(col("__cnt") / col("__w"))).as("__n"))
    val fracs = counts.crossJoin(broadcast(n))
      .select(col("__domain"),
        least(lit(1.0), col("__n") * col("__w") / col("__cnt")).as("__frac"))
    df.withColumn("__domain", domain)
      .join(broadcast(fracs), "__domain")
      .filter(hashUnit(seed, key) < col("__frac"))
      .drop("__domain", "__frac")
  }

  /** Temperature-scaled domain mixing (the `p_g ∝ count_g^alpha` rule of
    * multilingual/multi-domain pretraining mixes — alpha 1 keeps natural
    * proportions, alpha 0 makes domains uniform, the usual 0.3–0.7 range
    * up-samples the tail without letting the head drown it): computes the
    * target weights from the OBSERVED domain counts and delegates to
    * [[mixtureResample]]'s deterministic membership draw. Domain counts
    * are one partial agg (broadcast back as a literal map); the corpus
    * itself never shuffles.
    */
  def temperatureResample(df: DataFrame, key: Column, domain: Column,
                          alpha: Double, seed: String = "graft"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    // sorted: the normalizer's float summation order is run-deterministic
    val counts = df.select(domain.as("__domain"))
      .groupBy("__domain").agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.get(0).toString -> r.getLong(1).toDouble)
      .sortBy(_._1)
    val powed = counts.map { case (d, c) => d -> math.pow(c, alpha) }
    val z = powed.map(_._2).sum
    val weights = powed.map { case (d, p) => d -> p / z }.toMap
    mixtureResample(df, key, domain, weights, seed)
  }

  /** Sequence packing by deterministic chunking: order documents by
    * `orderCol`, accumulate `tokenCol`, and cut a new pack every `budget`
    * tokens — each document lands in the pack where its first token falls.
    * This is the SQL-expressible contract (equal to
    * `floor((cumsum - tokens) / budget)` over a global ORDER BY).
    *
    * Implemented scalably: a naive global window would funnel the corpus
    * through ONE task. Instead: range-partition by `orderCol`, local
    * cumulative sums per partition (parallel window), then offset each
    * partition by the prefix sum of the per-partition totals — a window
    * over #partitions rows, not #rows.
    */
  /** Sliding-window document chunking — the context-window prep step before
    * packing: each document becomes ⌈(n − overlap) / (maxTokens −
    * overlap)⌉ chunks of at most `maxTokens` whitespace tokens, consecutive
    * chunks sharing `overlap` tokens (the standard long-document treatment
    * for pretraining and embedding pipelines). Chunk starts are 0, stride,
    * 2·stride, … while `start == 0 || start < n − overlap`, so a trailing
    * window that would only repeat already-covered tokens is never emitted.
    * Returns (idCol, chunk_index, text, n_tokens); docs with zero tokens
    * produce zero chunks.
    *
    * Scale shape: a pure projection + one explode — no shuffle, no UDF;
    * the slice/filter lambdas are Catalyst higher-order functions.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got maxTokens=$maxTokens overlap=$overlap")
    val stride = maxTokens - overlap
    val toks = filter(split(trim(col(s"`$textCol`")), "\\s+"), t => length(t) > 0)
    val n = size(col("__toks"))
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(stride)),
      s => s === 0 || s < n - overlap)
    df.select(col(s"`$idCol`"), toks.as("__toks"))
      .filter(n > 0)
      .select(col(s"`$idCol`"),
        posexplode(transform(starts, s => slice(col("__toks"), s + lit(1), lit(maxTokens))))
          .as(Seq("chunk_index", "__chunk")))
      .select(col(s"`$idCol`"), col("chunk_index"),
        concat_ws(" ", col("__chunk")).as(textCol),
        size(col("__chunk")).cast("long").as("n_tokens"))
  }

  def packChunks(df: DataFrame, orderCol: String, tokenCol: String,
                 budget: Long, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
    val local = ranged.withColumn("__run", sum(col(tokenCol)).over(localW))
    // per-partition totals: #partitions rows — the ONLY single-task window
    val offsetW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(sum(col(tokenCol)).as("__psum"))
      .withColumn("__offset", coalesce(sum("__psum").over(offsetW), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .withColumn("pack_id",
        floor((col("__offset") + col("__run") - col(tokenCol)) / lit(budget)))
      .drop("__pid", "__run", "__offset")
  }

  /** Global token-budget selection: rank the corpus by `orderBy` (MUST be a
    * total order — include a unique tiebreaker like the id column) and keep
    * the longest ranked prefix whose cumulative `tokenCol` stays within
    * `budget` (inclusive). This is the "best documents until the token
    * budget is spent" step of corpus curation under a fixed training budget.
    *
    * Same two-level cumulative sum as [[packChunks]]: range-partition on the
    * rank order, per-partition parallel windows, then a prefix over the
    * #partitions-row totals frame — the corpus never funnels through one
    * task. `tokenCol` must be non-negative (cumsum monotone ⇒ the kept set
    * is a true prefix).
    */
  def takeByBudget(df: DataFrame, orderBy: Seq[Column], tokenCol: String,
                   budget: Long, numPartitions: Int = 0): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, orderBy: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy("__pid").orderBy(orderBy: _*)
    val local = ranged.withColumn("__run", sum(col(tokenCol)).over(localW))
    val offsetW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("__pid").agg(sum(col(tokenCol)).as("__psum"))
      .withColumn("__offset", coalesce(sum("__psum").over(offsetW), lit(0L)))
      .select("__pid", "__offset")
    local.join(broadcast(offsets), "__pid")
      .filter(col("__offset") + col("__run") <= budget)
      .drop("__pid", "__run", "__offset")
  }

  /** Per-group [[takeByBudget]]: every `groupCol` value (domain, language)
    * gets the same token budget, spent on its own ranked prefix. The naive
    * form — one window partitioned by group — funnels each group through a
    * single task, and real corpora have dominant groups (English is half the
    * web). Here the range partitioner spreads (group, rank) so a hot group
    * spans MANY partitions; the offsets frame is #groups × #partitions rows.
    */
  def takeByBudgetPerGroup(df: DataFrame, groupCol: String, orderBy: Seq[Column],
      tokenCol: String, budget: Long, numPartitions: Int = 0): DataFrame =
    takeByBudgetPerGroupExpr(df, groupCol, orderBy, tokenCol, lit(budget),
      numPartitions)

  /** [[takeByBudgetPerGroup]] with a DISTINCT budget per group (the real
    * mixture-curation shape: 300B tokens of English, 30B of German, …).
    * Groups absent from `budgets` get `defaultBudget` (0 = dropped). The
    * budget lookup is a broadcast map literal evaluated map-side — no extra
    * join, same two-level cumsum, hot groups still span many partitions.
    */
  def takeByBudgetPerGroupMap(df: DataFrame, groupCol: String,
      orderBy: Seq[Column], tokenCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, numPartitions: Int = 0): DataFrame = {
    val budgetExpr =
      coalesce(element_at(typedLit(budgets), col(s"`$groupCol`").cast("string")),
        lit(defaultBudget))
    takeByBudgetPerGroupExpr(df, groupCol, orderBy, tokenCol, budgetExpr,
      numPartitions)
  }

  /** Keep at most `n` rows per group, ranked by `orderBy` (per-source /
    * per-domain caps: "no host contributes more than N pages"). `orderBy`
    * must be a total order for determinism. The naive
    * `row_number().over(partitionBy(group))` funnels each group through one
    * task; this is [[takeByBudgetPerGroup]] with a unit token, so a hot
    * group's ranking spreads over many range partitions.
    */
  def takeTopNPerGroup(df: DataFrame, groupCol: String, orderBy: Seq[Column],
      n: Long, numPartitions: Int = 0): DataFrame =
    takeByBudgetPerGroupExpr(df.withColumn("__unit", lit(1L)), groupCol,
      orderBy, "__unit", lit(n), numPartitions)
      .drop("__unit")

  private def takeByBudgetPerGroupExpr(df: DataFrame, groupCol: String,
      orderBy: Seq[Column], tokenCol: String, budget: Column,
      numPartitions: Int): DataFrame = {
    val parts = if (numPartitions > 0) numPartitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val g = col(s"`$groupCol`")
    // materialize the budget BEFORE the offsets join: after it both sides
    // carry groupCol, so a budget expression referencing the group would be
    // ambiguous there
    val ranged = df.repartitionByRange(parts, (g +: orderBy): _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__budget", budget)
    val localW = Window.partitionBy(g, col("__pid")).orderBy(orderBy: _*)
    val local = ranged.withColumn("__run", sum(col(tokenCol)).over(localW))
    // backticked Column form everywhere groupCol appears: a raw-string
    // reference would resolve a dotted name as a nested-field path.
    val offsetW = Window.partitionBy(g).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(g, col("__pid")).agg(sum(col(tokenCol)).as("__psum"))
      .withColumn("__offset", coalesce(sum(col("__psum")).over(offsetW), lit(0L)))
      .select(g, col("__pid"), col("__offset"))
    local.join(broadcast(offsets),
        local(s"`$groupCol`") === offsets(s"`$groupCol`") &&
          local("__pid") === offsets("__pid"))
      .filter(col("__offset") + col("__run") <= col("__budget"))
      .drop(offsets(s"`$groupCol`"))
      .drop("__pid", "__run", "__offset", "__budget")
  }

  /** Training-shard assignment: a reproducible pseudo-random permutation
    * ([[deterministicShuffle]]'s md5 order) chunked into ~`shardTokens`-sized
    * shards ([[packChunks]]). Every engine replays the same (shard, order)
    * for the same seed — write the result partitioned by `shard_id` and the
    * training job streams byte-balanced shards in a fixed global order.
    */
  def shardCorpus(df: DataFrame, key: Column, tokenCol: String,
      shardTokens: Long, seed: String = "graft", numPartitions: Int = 0): DataFrame = {
    val withH = df.withColumn("__shuf",
      md5(concat_ws(":", lit(seed), key.cast("string"))))
    packChunks(withH, "__shuf", tokenCol, shardTokens, numPartitions)
      .withColumnRenamed("pack_id", "shard_id")
      .drop("__shuf")
  }

  /** Greedy first-fit-decreasing packing WITHIN each partition: documents
    * sorted by descending token count are placed into the first open bin
    * with room; oversized documents get a singleton bin. Bin ids are
    * `partitionId * 2^40 + localBin` so they are globally unique without
    * coordination. This is the non-SQL, higher-utilization variant of
    * [[packChunks]]; bins never cross partition boundaries, so it scales
    * embarrassingly.
    */
  def packGreedy(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
    val packed = pairs.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      val docs = it.toArray.sortBy { case (id, tok) => (-tok, id) }
      docs.iterator.zip(ffdBins(docs.iterator.map(_._2), budget))
        .map { case ((id, tok), b) => (id, tok, pid * (1L << 40) + b) }
    }
    packed.toDF(idCol, tokenCol, "pack_id")
  }

  /** First-fit bin index per token count, in the given order: place into
    * the first open bin with room, else open a new one (oversized ⇒
    * singleton). The sequential kernel behind both packGreedy variants.
    */
  private def ffdBins(toks: Iterator[Long], budget: Long): Iterator[Int] = {
    val binLoad = scala.collection.mutable.ArrayBuffer.empty[Long]
    toks.map { tok =>
      var b = binLoad.indexWhere(_ + tok <= budget)
      if (b < 0) { b = binLoad.length; binLoad += tok }
      else binLoad(b) += tok
      b
    }
  }

  /** [[packGreedy]] with ENGINE-REPRODUCIBLE bin ids: rows are first
    * assigned to one of `numGroups` groups by the md5 [[hashUnit]] (so the
    * grouping is a pure function of the id, not of physical partitioning),
    * then first-fit-decreasing packs each group independently. Bin ids are
    * `group * 2^40 + localBin` — identical on every engine, every run and
    * every cluster size, which is what makes the result resumable (re-run
    * the pipeline, get the same shards) and exactly verifiable. Groups are
    * the parallelism unit: one shuffle by group, sequential FFD per group,
    * so throughput scales with `numGroups` while utilization stays
    * FFD-grade within each group.
    */
  def packGreedyDeterministic(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, numGroups: Int = 64, seed: String = "graft"): DataFrame = {
    require(numGroups > 0, s"numGroups must be positive, got $numGroups")
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df.select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("tok"),
        floor(hashUnit(seed, col(idCol)) * numGroups).cast("long").as("grp"))
    // one hash shuffle co-locates each group; a partition may hold several
    // whole groups, so FFD state is keyed per group inside the partition
    val packed = grouped
      .repartition(math.min(numGroups, 2 * spark.sparkContext.defaultParallelism),
        col("grp"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        it.toArray.groupBy(_._3).iterator.flatMap { case (g, rows) =>
          val docs = rows.sortBy { case (id, tok, _) => (-tok, id) }
          docs.iterator.zip(ffdBins(docs.iterator.map(_._2), budget))
            .map { case ((id, tok, _), b) => (id, tok, g * (1L << 40) + b) }
        }
      }
    packed.toDF(idCol, tokenCol, "pack_id")
  }
}
