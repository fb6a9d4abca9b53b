package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-run incremental dedup: a new ingest batch filtered against the
  * already-ingested corpus through a broadcast Bloom sketch + exact
  * broadcast confirm — per-batch cost O(batch + one history hash scan),
  * history never shuffles.
  */
class DedupIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("exactAgainstHistory keeps exactly the content not already ingested") {
    val history = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val batch = Seq((10L, "beta"), (11L, "delta"), (12L, "delta"), (13L, "ALPHA"))
      .toDF("doc_id", "text")
    val out = Dedup.exactAgainstHistory(batch, history, "text")
    // beta dropped (already ingested); both deltas kept (intra-batch dedup
    // is exactByHash's job, documented); ALPHA kept (hash-exact, case
    // differs from history's alpha)
    out.select("doc_id").as[Long].collect().sorted.toSeq shouldBe Seq(11L, 12L, 13L)
    // the helper hash column never leaks into the result
    out.columns.toSeq shouldBe Seq("doc_id", "text")
    // empty history: everything passes
    Dedup.exactAgainstHistory(batch, history.filter(lit(false)), "text")
      .count() shouldBe 4
    // full-overlap batch: nothing passes
    Dedup.exactAgainstHistory(
      Seq((20L, "alpha"), (21L, "gamma")).toDF("doc_id", "text"), history, "text")
      .count() shouldBe 0
  }

  test("minhashAgainstHistory drops near-copies of ingested docs, keeps fresh ones") {
    def doc(i: Int) =
      s"the quick brown fox $i jumps over the lazy dog wearing hat $i " * 5
    val history = (0 until 40).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(history, "doc_id", "text")
    val nearCopies = (0 until 10).map(i => (1000L + i, "xqzy " + doc(i)))
    val fresh = (0 until 10).map(i =>
      (2000L + i, s"completely different content number $i with unrelated words entirely " * 5))
    val batch = (nearCopies ++ fresh).toDF("doc_id", "text")
    val out = Dedup.minhashAgainstHistory(batch, "doc_id", "text", sigs, threshold = 0.6)
    out.select("doc_id").as[Long].collect().sorted.toSeq shouldBe (2000L until 2010L)
    // the signature table is the PERSISTED artifact: parquet roundtrip
    // gives identical decisions (the continuous-ingest contract)
    val p = tmpDir("sigs")
    sigs.write.parquet(s"$p/t")
    val loaded = spark.read.parquet(s"$p/t")
    Dedup.minhashAgainstHistory(batch, "doc_id", "text", loaded, threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted.toSeq shouldBe (2000L until 2010L)
    // over-cap buckets are skipped AND counted, never silent
    val acc = spark.sparkContext.longAccumulator("skipped")
    val capped = Dedup.minhashAgainstHistory(batch, "doc_id", "text", sigs,
      threshold = 0.6, maxBucket = 0, skippedBuckets = Some(acc))
    capped.count() shouldBe 20 // nothing verified: every bucket skipped
    acc.value.toLong should be > 0L
  }

  test("history never shuffles: broadcast joins only, no sort-merge") {
    val history = (0 until 5000).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val dupPart = (4000 until 4200).map(i => (100000L + i, s"doc body $i"))
    val freshPart = (0 until 50).map(i => (200000L + i, s"fresh body $i"))
    val batch = (dupPart ++ freshPart).toDF("doc_id", "text")
    val out = Dedup.exactAgainstHistory(batch, history, "text")
    out.count() shouldBe 50
    val plan = out.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("SortMergeJoin")
    (plan should not).include("ShuffledHashJoin")
  }
}
