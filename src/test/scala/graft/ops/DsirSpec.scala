package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance resampling: hashed-ngram likelihood-ratio weights pull
  * the selected subset toward the target distribution.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val targetish = (i: Int) =>
    s"insightful thorough analysis of study $i with careful evidence and reasoning " * 3
  private val crawlish = (i: Int) =>
    s"click here free prize $i winner buy now limited offer subscribe " * 3

  private def fixture(n: Int) = {
    val corpus = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) targetish(i) else crawlish(i))
    }.toDF("doc_id", "text")
    val target = (100 until 120).map(i => Tuple1(targetish(i))).toDF("ttext")
    (corpus, target)
  }

  test("importanceWeights rank target-like docs above off-target docs") {
    val (corpus, target) = fixture(40)
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", target, "ttext",
      buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w.size shouldBe 40
    val tgtMin = (0 until 40 by 2).map(i => w(i.toLong)).min
    val offMax = (1 until 40 by 2).map(i => w(i.toLong)).max
    tgtMin should be > offMax // clean separation on disjoint vocabularies
    offMax should be < 0.0 // off-target mass is raw-only: negative ratio
    // empty / null docs weigh exactly 0 and stay in the output
    val extra = corpus.unionByName(
      Seq((900L, ""), (901L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val w2 = Dsir.importanceWeights(extra, "doc_id", "text", target, "ttext",
      buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w2(900L) shouldBe 0.0
    w2(901L) shouldBe 0.0
    // determinism: a recomputation is bit-identical
    val again = Dsir.importanceWeights(corpus, "doc_id", "text", target, "ttext",
      buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    again shouldBe w
  }

  test("resampleTopK selects k rows, overwhelmingly target-like") {
    val (corpus, target) = fixture(200)
    val out = Dsir.resampleTopK(corpus, "doc_id", "text", target, "ttext",
      k = 50, buckets = 4096)
    out.count() shouldBe 50
    // weights differ by hundreds of nats across the two vocabularies, so
    // Gumbel noise (O(1) nats) cannot flip any cross-class pair
    out.filter(col("doc_id") % 2 === 0).count() shouldBe 50
    out.columns should contain allOf ("doc_id", "text", "sample_key")
    // same seed reselects the same set; a different seed may not
    val again = Dsir.resampleTopK(corpus, "doc_id", "text", target, "ttext",
      k = 50, buckets = 4096)
    again.select("doc_id").as[Long].collect().sorted shouldBe
      out.select("doc_id").as[Long].collect().sorted
  }

  test("resampleByThreshold equals top-k at the k-th key, as a pure filter") {
    val (corpus, target) = fixture(200)
    val top = Dsir.resampleTopK(corpus, "doc_id", "text", target, "ttext",
      k = 50, buckets = 4096)
    val kthKey = top.agg(min(col("sample_key"))).head().getDouble(0)
    val thr = Dsir.resampleByThreshold(corpus, "doc_id", "text", target, "ttext",
      minKey = kthKey, buckets = 4096)
    thr.select("doc_id").as[Long].collect().sorted shouldBe
      top.select("doc_id").as[Long].collect().sorted
    // the selection itself is a filter: no global sort, no limit
    val plan = thr.queryExecution.executedPlan.toString
    (plan should not).include("TakeOrderedAndProject")
    (plan should not).include("GlobalLimit")
  }

  test("calibrateThreshold: exact at fraction 1; near-k selection from a subsample") {
    val (corpus, target) = fixture(400)
    // fraction = 1: the calibrated threshold IS the k-th largest key, so
    // thresholding reproduces top-k exactly (continuous keys, no ties)
    val t1 = Dsir.calibrateThreshold(corpus, "doc_id", "text", target, "ttext",
      k = 60, fraction = 1.0, buckets = 4096)
    val thr = Dsir.resampleByThreshold(corpus, "doc_id", "text", target, "ttext",
      minKey = t1, buckets = 4096)
    val top = Dsir.resampleTopK(corpus, "doc_id", "text", target, "ttext",
      k = 60, buckets = 4096)
    thr.select("doc_id").as[Long].collect().sorted shouldBe
      top.select("doc_id").as[Long].collect().sorted
    // subsampled calibration: selected count concentrates around k
    // (binomial rank noise ~ sqrt(k/fraction) = ~17 here; 3 sigma bound)
    val tHalf = Dsir.calibrateThreshold(corpus, "doc_id", "text", target, "ttext",
      k = 150, fraction = 0.5, buckets = 4096)
    val nHalf = Dsir.resampleByThreshold(corpus, "doc_id", "text", target, "ttext",
      minKey = tHalf, buckets = 4096).count()
    nHalf.toDouble shouldBe 150.0 +- 52.0
    // determinism: recalibration returns the same threshold bit-for-bit
    Dsir.calibrateThreshold(corpus, "doc_id", "text", target, "ttext",
      k = 150, fraction = 0.5, buckets = 4096) shouldBe tHalf
    // degenerate sample smaller than k*fraction: min key (select all)
    val tiny = Dsir.calibrateThreshold(corpus.limit(3), "doc_id", "text",
      target, "ttext", k = 1000, fraction = 1.0, buckets = 4096)
    Dsir.resampleByThreshold(corpus.limit(3), "doc_id", "text", target, "ttext",
      minKey = tiny, buckets = 4096).count() shouldBe 3
  }

  test("scale shape: ratio table broadcasts, corpus gram stream never sort-merges") {
    val (corpus, target) = fixture(40)
    val conf = spark.conf
    val savedAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val savedAuto = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Dsir.importanceWeights(corpus, "doc_id", "text", target, "ttext",
        buckets = 4096).queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin") // per-gram ratio lookup
      plan should include("BroadcastNestedLoopJoin") // 1-row totals
      // the only sort-merge-eligible join is the final id re-attach; gram
      // values must never become a sort-merge key (hot-token skew)
      ("SortMergeJoin.*__b".r.findFirstIn(plan)) shouldBe None
    } finally {
      conf.set("spark.sql.adaptive.enabled", savedAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedAuto)
    }
  }
}
