package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(0, 2000).toDF("id")

  test("deterministicSample is repeatable and near the target fraction") {
    val a = Sampling.deterministicSample(ids, col("id"), 0.3, "t1")
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(ids, col("id"), 0.3, "t1")
      .select("id").as[Long].collect().sorted.toSeq
    a shouldBe b
    a.size.toDouble should be(600.0 +- 80.0) // binomial(2000, 0.3)
  }

  test("different seeds draw different samples; nested fractions nest") {
    val s1 = Sampling.deterministicSample(ids, col("id"), 0.3, "t1")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(ids, col("id"), 0.3, "t2")
      .select("id").as[Long].collect().toSet
    s1 should not be s2
    // threshold monotonicity: a 10% sample is a subset of the 30% sample
    val s1small = Sampling.deterministicSample(ids, col("id"), 0.1, "t1")
      .select("id").as[Long].collect().toSet
    s1small.subsetOf(s1) shouldBe true
  }

  test("deterministicSampleN takes exactly n per group, repeatably; global plans as top-n") {
    val df = ids.withColumn("g", (col("id") % 3).cast("string"))
    val a = Sampling.deterministicSampleN(df, col("id"), 7, groups = Seq("g"), seed = "t1")
    a.groupBy("g").count().as[(String, Long)].collect().toMap.values.toSet shouldBe Set(7L)
    val b = Sampling.deterministicSampleN(df, col("id"), 7, groups = Seq("g"), seed = "t1")
    a.select("id").as[Long].collect().sorted.toSeq shouldBe
      b.select("id").as[Long].collect().sorted.toSeq
    // global variant: distributed top-n, never a single-partition sort
    val g = Sampling.deterministicSampleN(df, col("id"), 25, seed = "t1")
    g.count() shouldBe 25
    g.queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
  }

  test("stratifiedSample applies per-stratum fractions, default drops") {
    val df = ids.withColumn("g", when(col("id") % 2 === 0, "even").otherwise("odd"))
    val out = Sampling.stratifiedSample(df, col("id"), col("g"),
      Map("even" -> 1.0), default = 0.0, seed = "t1")
    val got = out.select("id").as[Long].collect()
    got.forall(_ % 2 == 0) shouldBe true
    got.length shouldBe 1000 // fraction 1.0 keeps every even row
  }

  test("hashSplit: disjoint covering assignment, stable under corpus growth") {
    val out = Sampling.hashSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "t1").cache()
    out.count() shouldBe 2000 // fractions sum to 1 → full cover
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    counts("train").toDouble should be(1600.0 +- 120.0)
    counts("val").toDouble should be(200.0 +- 60.0)
    // stability: a doc keeps its split when the corpus doubles
    val assign1 = out.select("id", "split").as[(Long, String)].collect().toMap
    val bigger = spark.range(0, 4000).toDF("id")
    val assign2 = Sampling.hashSplit(bigger, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "t1")
      .select("id", "split").as[(Long, String)].collect().toMap
    assign1.foreach { case (id, sp) => assign2(id) shouldBe sp }
  }

  test("deterministicShuffle: reproducible permutation, seed-independent orders") {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5}
    val df = (0L until 500L).toDF("id")
    def order(seed: String): Seq[Long] =
      Sampling.deterministicShuffle(df, col("id"), seed, numPartitions = Some(4))
        .select("id").collect().map(_.getLong(0)).toSeq
    val e1 = order("epoch1")
    // a true permutation, identical on replay
    e1.sorted shouldBe (0L until 500L)
    order("epoch1") shouldBe e1
    // another epoch reorders
    order("epoch2") should not be e1
    e1 should not be (0L until 500L) // actually shuffled
    // globally ordered by the hash: collect order == hash-sorted order
    val expected = df.select(col("id"),
        md5(concat_ws(":", lit("epoch1"), col("id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0))).sortBy(_._1).map(_._2).toSeq
    e1 shouldBe expected
  }

  test("mixtureResample hits the target mixture, drops unweighted domains") {
    val df = ids.withColumn("dom",
      when(col("id") < 1200, "big").when(col("id") < 1800, "mid").otherwise("tiny"))
    // uniform target: N = min(floor(1200/.5)=2400, floor(600/.5)=1200) = 1200
    val out = Sampling.mixtureResample(df, col("id"), col("dom"),
      Map("big" -> 0.5, "mid" -> 0.5), seed = "t1").cache()
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    counts.keySet shouldBe Set("big", "mid") // "tiny" dropped
    counts("mid") shouldBe 600L // frac 1.0: all of the scarcest domain
    counts("big").toDouble should be(600.0 +- 80.0) // frac 0.5 of 1200
  }

  test("temperatureResample flattens the head, keeps the tail, stays deterministic") {
    val df = ids.withColumn("dom",
      when(col("id") < 1600, "big").when(col("id") < 1900, "mid").otherwise("tiny"))
    // natural shares 80/15/5; alpha 0 targets uniform thirds
    val out = Sampling.temperatureResample(df, col("id"), col("dom"),
      alpha = 0.0, seed = "t2").cache()
    val counts = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    counts("tiny") shouldBe 100L // scarcest domain kept whole (frac 1.0)
    // head flattened toward the tail's size
    counts("big").toDouble should be(100.0 +- 40.0)
    counts("mid").toDouble should be(100.0 +- 40.0)
    // alpha 1 reproduces (a deterministic subsample of) natural proportions
    val nat = Sampling.temperatureResample(df, col("id"), col("dom"),
      alpha = 1.0, seed = "t2").groupBy("dom").count().as[(String, Long)].collect().toMap
    nat("big").toDouble / nat("tiny") should be(16.0 +- 5.0)
    // deterministic under the seed
    val again = Sampling.temperatureResample(df, col("id"), col("dom"),
      alpha = 0.0, seed = "t2")
    again.select("id").as[Long].collect().sorted.toSeq shouldBe
      out.select("id").as[Long].collect().sorted.toSeq
  }

  test("packChunks equals the naive global cumulative-sum contract") {
    val df = Seq((1L, 100L), (2L, 300L), (3L, 250L), (4L, 50L), (5L, 400L), (6L, 10L))
      .toDF("id", "tok")
    val got = Sampling.packChunks(df, "id", "tok", budget = 500, numPartitions = 3)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // cumsum-exclusive: 0,100,400,650,700,1100 → /500 → 0,0,0,1,1,2
    got shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L)
  }

  test("packChunks is partition-count independent") {
    val df = ids.withColumn("tok", col("id") % 97 + 1)
    val p1 = Sampling.packChunks(df, "id", "tok", 1000, numPartitions = 1)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    val p8 = Sampling.packChunks(df, "id", "tok", 1000, numPartitions = 8)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    p8 shouldBe p1
  }

  test("takeByBudget keeps the exact ranked prefix within the budget") {
    val df = Seq((1L, 100L), (2L, 300L), (3L, 250L), (4L, 50L), (5L, 400L), (6L, 10L))
      .toDF("id", "tok")
    // rank by tok desc, id: 5(400),2(700),3(950),1(1050)… budget 1000 keeps 5,2,3
    val got = Sampling.takeByBudget(df, Seq(col("tok").desc, col("id")), "tok",
      budget = 1000L, numPartitions = 3)
    got.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L, 5L)
    // exact boundary is inclusive: budget 950 still keeps 3
    Sampling.takeByBudget(df, Seq(col("tok").desc, col("id")), "tok", 950L, 3)
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 3L, 5L)
    Sampling.takeByBudget(df, Seq(col("tok").desc, col("id")), "tok", 949L, 3)
      .select("id").as[Long].collect().sorted.toSeq shouldBe Seq(2L, 5L)
  }

  test("takeByBudget is partition-count independent") {
    val df = ids.withColumn("tok", col("id") % 97 + 1)
    val p1 = Sampling.takeByBudget(df, Seq(col("tok").desc, col("id")), "tok", 20000L, 1)
      .select("id").as[Long].collect().sorted.toSeq
    val p8 = Sampling.takeByBudget(df, Seq(col("tok").desc, col("id")), "tok", 20000L, 8)
      .select("id").as[Long].collect().sorted.toSeq
    p8 shouldBe p1
    p1.nonEmpty shouldBe true
  }

  test("takeByBudget matches the sequential reference on random corpora") {
    val rnd = new scala.util.Random(7)
    (0 until 4).foreach { _ =>
      val n = 200 + rnd.nextInt(300)
      val rows = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(500).toLong + 1))
      val budget = rows.map(_._2).sum / (2 + rnd.nextInt(3))
      val got = Sampling.takeByBudget(rows.toDF("id", "tok"),
          Seq(col("tok").desc, col("id")), "tok", budget, 1 + rnd.nextInt(7))
        .select("id").as[Long].collect().toSet
      val expected = rows.sortBy { case (id, tok) => (-tok, id) }
        .scanLeft((0L, 0L)) { case ((_, acc), (id, tok)) => (id, acc + tok) }
        .drop(1).takeWhile(_._2 <= budget).map(_._1).toSet
      got shouldBe expected
    }
  }

  test("takeByBudgetPerGroup spends the budget independently per group") {
    val df = Seq(
      ("en", 1L, 600L), ("en", 2L, 300L), ("en", 3L, 200L),  // en keeps 1,2 (900)
      ("de", 4L, 900L), ("de", 5L, 150L),                    // de keeps 4 (900)
      ("fr", 6L, 50L)                                        // fr keeps 6
    ).toDF("lang", "id", "tok")
    val got = Sampling.takeByBudgetPerGroup(df, "lang",
      Seq(col("tok").desc, col("id")), "tok", budget = 1000L, numPartitions = 4)
    got.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 4L, 6L)
  }

  test("takeByBudgetPerGroup is partition-count independent") {
    val df = ids.withColumn("lang", concat(lit("l"), col("id") % 3))
      .withColumn("tok", col("id") % 97 + 1)
    val p1 = Sampling.takeByBudgetPerGroup(df, "lang",
      Seq(col("tok").desc, col("id")), "tok", 5000L, 1)
      .select("id").as[Long].collect().sorted.toSeq
    val p8 = Sampling.takeByBudgetPerGroup(df, "lang",
      Seq(col("tok").desc, col("id")), "tok", 5000L, 8)
      .select("id").as[Long].collect().sorted.toSeq
    p8 shouldBe p1
  }

  test("takeByBudgetPerGroupMap applies distinct budgets, default for absent groups") {
    val df = Seq(
      ("en", 1L, 600L), ("en", 2L, 300L), ("en", 3L, 200L),  // en budget 900 → 1,2
      ("de", 4L, 900L), ("de", 5L, 150L),                    // de budget 1100 → 4,5
      ("fr", 6L, 50L), ("fr", 7L, 40L)                       // default 60 → 6
    ).toDF("lang", "id", "tok")
    val got = Sampling.takeByBudgetPerGroupMap(df, "lang",
      Seq(col("tok").desc, col("id")), "tok",
      budgets = Map("en" -> 900L, "de" -> 1100L), defaultBudget = 60L,
      numPartitions = 4)
    got.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 4L, 5L, 6L)
  }

  test("takeByBudgetPerGroupMap default 0 drops unlisted groups; partition independent") {
    val df = ids.withColumn("lang", concat(lit("l"), col("id") % 4))
      .withColumn("tok", col("id") % 97 + 1)
    val p1 = Sampling.takeByBudgetPerGroupMap(df, "lang",
      Seq(col("tok").desc, col("id")), "tok", Map("l0" -> 3000L, "l2" -> 500L),
      numPartitions = 1)
      .select("id", "lang").as[(Long, String)].collect().sortBy(_._1).toSeq
    val p8 = Sampling.takeByBudgetPerGroupMap(df, "lang",
      Seq(col("tok").desc, col("id")), "tok", Map("l0" -> 3000L, "l2" -> 500L),
      numPartitions = 8)
      .select("id", "lang").as[(Long, String)].collect().sortBy(_._1).toSeq
    p8 shouldBe p1
    p1.map(_._2).toSet shouldBe Set("l0", "l2") // l1/l3 dropped entirely
  }

  test("takeTopNPerGroup keeps exactly min(n, group size) rows, the ranked head") {
    val df = ids.withColumn("g", concat(lit("g"), col("id") % 5))
      .withColumn("tok", (col("id") * 31) % 199)
    val got = Sampling.takeTopNPerGroup(df, "g",
      Seq(col("tok").desc, col("id")), n = 7L, numPartitions = 6)
      .select("id", "g", "tok").as[(Long, String, Long)].collect()
    got.groupBy(_._2).foreach { case (_, rows) => rows.length shouldBe 7 }
    // agrees with the sequential reference head per group
    val all = df.select("id", "g", "tok").as[(Long, String, Long)].collect()
    val ref = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(7)
    }.map(_._1).toSet
    got.map(_._1).toSet shouldBe ref
    // a group smaller than n survives whole
    val tiny = Seq(("solo", 1L, 10L), ("solo", 2L, 5L)).toDF("g", "id", "tok")
    Sampling.takeTopNPerGroup(tiny, "g", Seq(col("tok").desc, col("id")), 7L)
      .count() shouldBe 2L
  }

  test("shardCorpus shards are token-balanced and reproducible across runs") {
    val df = ids.limit(800).withColumn("tok", col("id") % 211 + 20)
    val a = Sampling.shardCorpus(df, col("id"), "tok", shardTokens = 5000L, seed = "e1")
    val b = Sampling.shardCorpus(df, col("id"), "tok", shardTokens = 5000L, seed = "e1")
    val mapA = a.select("id", "shard_id").as[(Long, Long)].collect().toMap
    mapA shouldBe b.select("id", "shard_id").as[(Long, Long)].collect().toMap
    // every shard except the last carries > 5000 - max(tok) tokens, none
    // starts past the budget boundary rule (chunking contract)
    val loads = a.groupBy("shard_id").agg(sum("tok").as("load"))
      .orderBy("shard_id").select("load").as[Long].collect()
    loads.dropRight(1).foreach(_ should be > (5000L - 230L))
    // a different seed yields a different permutation → different sharding
    val c = Sampling.shardCorpus(df, col("id"), "tok", 5000L, seed = "e2")
    c.select("id", "shard_id").as[(Long, Long)].collect().toMap should not be mapA
  }

  test("chunkDocuments: sliding windows with overlap, no redundant tail") {
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, mk(10)), // max 8, overlap 4 → [1..8], [5..10]; NOT a third window
      (2L, mk(3)),  // shorter than max → single whole chunk
      (3L, mk(8)),  // exactly max → single chunk
      (4L, "   "),  // zero tokens → zero chunks
      (5L, mk(13))  // [1..8], [5..12], [9..13]
    ).toDF("doc_id", "text")
    val out = Sampling.chunkDocuments(df, "doc_id", "text", maxTokens = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    byDoc(1L).sortBy(_._2).map(_._3) shouldBe Seq(
      (1 to 8).map("w" + _).mkString(" "), (5 to 10).map("w" + _).mkString(" "))
    byDoc(2L).map(_._3).toSeq shouldBe Seq("w1 w2 w3")
    byDoc(3L) should have length 1
    byDoc.contains(4L) shouldBe false
    byDoc(5L).sortBy(_._2).map(_._4).toSeq shouldBe Seq(8L, 8L, 5L)
    // every token of every doc is covered by at least one chunk
    byDoc(5L).flatMap(_._3.split(" ")).toSet shouldBe (1 to 13).map("w" + _).toSet
    // plan: pure projection + explode, no shuffle, no UDF
    val plan = Sampling.chunkDocuments(df, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should not include "scalaudf"
    // overlap must be smaller than the window
    intercept[IllegalArgumentException] {
      Sampling.chunkDocuments(df, "doc_id", "text", 4, 4)
    }
  }

  test("packGreedy: bins respect the budget, every doc lands exactly once") {
    val df = ids.limit(500).withColumn("tok", col("id") % 400 + 50)
    val out = Sampling.packGreedy(df.repartition(4), "id", "tok", budget = 512)
      .as[(Long, Long, Long)].collect()
    out.length shouldBe 500
    out.map(_._1).distinct.length shouldBe 500
    val loads = out.groupBy(_._3).map { case (_, rows) => rows.map(_._2).sum }
    // every multi-doc bin is within budget (oversized singletons impossible
    // here: max tok 449 < 512)
    loads.foreach(_ should be <= 512L)
  }

  test("packGreedyDeterministic: partition-count independent, budget-safe") {
    val df = ids.limit(500).withColumn("tok", col("id") % 400 + 50)
    def run(parts: Int): Map[Long, Long] =
      Sampling.packGreedyDeterministic(df.repartition(parts), "id", "tok",
          budget = 512, numGroups = 8, seed = "s")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val a = run(1)
    // bin ids are a pure function of the id — identical on ANY layout
    run(7) shouldBe a
    run(32) shouldBe a
    a.size shouldBe 500
    val out = Sampling.packGreedyDeterministic(df, "id", "tok",
        budget = 512, numGroups = 8, seed = "s")
      .as[(Long, Long, Long)].collect()
    out.groupBy(_._3).values.map(_.map(_._2).sum).foreach(_ should be <= 512L)
    // a different seed re-shuffles the grouping (sanity that seed matters)
    run(4) should not be Sampling.packGreedyDeterministic(df, "id", "tok",
      budget = 512, numGroups = 8, seed = "s2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
  }
}
