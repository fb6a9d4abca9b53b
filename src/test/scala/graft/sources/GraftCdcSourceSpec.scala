package graft.sources

import graft.SparkSpec
import graft.core.Predicates
import graft.ktk.Ktk
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming full CDC: `readStream.format("graft-cdc")` emits row-level
  * inserts AND deletes with `_change_type` / `_commit_version`, resumes
  * from the checkpointed commit version, and bounds catch-up via
  * `maxVersionsPerTrigger`. The delete-emitting complement of the
  * append-only `graft` stream.
  */
class GraftCdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def kv = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)
  ).toDF("k", "p", "v")

  private def startCdc(base: String, sink: String, extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream.format("graft-cdc").option("uuid", "ds")
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load(base).writeStream.format("memory").queryName(sink).start()
  }

  private def rows(sink: String): Seq[(Long, String, Long)] =
    spark.table(sink).select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq

  test("emits inserts AND row-level deletes with version attribution") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    val q = startCdc(base, "cdc1")
    try {
      q.processAllAvailable()
      rows("cdc1") shouldBe Seq(
        (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L))
      Ktk.deleteRows(spark, base, "ds",
        predicates = Predicates.of(Seq(("k", "==", 2)))) // v2
      Ktk.merge(spark, base, "ds",
        Seq((3L, "b", 333.0)).toDF("k", "p", "v"), keys = Seq("k")) // v3
      q.processAllAvailable()
      rows("cdc1") shouldBe Seq(
        (1L, "insert", 1L), (2L, "delete", 2L), (2L, "insert", 1L),
        (3L, "delete", 3L), (3L, "insert", 1L), (3L, "insert", 3L))
      // deleted row VALUES ride along (full row images)
      spark.table("cdc1").filter(col("_change_type") === "delete" && col("k") === 2L)
        .select("v").as[Double].head() shouldBe 20.0
    } finally q.stop()
  }

  test("checkpointed restart resumes from the committed version") {
    val base = tmpDir("cdcs")
    val ckpt = tmpDir("cdcs-ckpt")
    val out = tmpDir("cdcs-out")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc").option("uuid", "ds").load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    spark.read.parquet(out).count() shouldBe 3
    Ktk.deleteRows(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", "==", 1)))) // v2 while stopped
    run()
    // only the NEW delete arrived — v1's inserts were not replayed
    spark.read.parquet(out).select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq shouldBe Seq(
      (1L, "delete", 2L), (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L))
  }

  test("consumer-aware gc keeps the replayed batch readable for a V1 restart") {
    // a V1 source's restart re-runs the LAST COMMITTED batch
    // (getBatch(prevOffset, lastOffset) restores source state), so the gc
    // floor must be the PREVIOUS committed batch's offset — flooring on
    // the newest one would vacuum the replay range and kill the stream
    // the registration was meant to protect
    val base = tmpDir("cdcs")
    val ckpt = tmpDir("cdcs-ckpt")
    val out = tmpDir("cdcs-out")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc").option("uuid", "ds").load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // batch 0: v1
    (2L to 4L).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((10L + i, "a", i * 1.0)).toDF("k", "p", "v"))))
    run() // batch 1: v2..v4
    // floor = batch 0's offset (v1): gc keeps the v2..v4 replay range AND v1
    graft.ktk.Ktk.readChangeCheckpoint(spark, ckpt) shouldBe 1L
    Ktk.garbageCollect(spark, base, "ds",
      retainVersions = 0, consumerCheckpoints = Seq(ckpt))
    graft.ktk.DatasetMetadata.listVersions(spark, base, "ds").min shouldBe 1L
    // the restart (which replays batch 1 through getBatch) must survive
    Ktk.update(spark, base, "ds", Some(Seq((20L, "b", 9.0)).toDF("k", "p", "v"))) // v5
    run()
    spark.read.parquet(out).filter(col("k") === 20L).count() shouldBe 1L
  }

  test("maxVersionsPerTrigger bounds each micro-batch") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    (2 to 5).foreach(i => Ktk.update(spark, base, "ds",
      Some(Seq((10L + i, "c", i * 1.0)).toDF("k", "p", "v")))) // v2..v5
    val q = startCdc(base, "cdc3", Map("maxVersionsPerTrigger" -> "2"))
    try {
      q.processAllAvailable()
      spark.table("cdc3").count() shouldBe 7
      // admission control: at most 2 versions per batch → >= 3 batches
      val batches = spark.table("cdc3").select("_commit_version").distinct().count()
      batches shouldBe 5
      q.lastProgress // stream alive
      val progress = q.recentProgress
      progress.count(_.numInputRows > 0) should be >= 3
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the whole backlog in bounded batches, then terminates") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    (2 to 5).foreach(i => Ktk.update(spark, base, "ds",
      Some(Seq((10L + i, "c", i * 1.0)).toDF("k", "p", "v")))) // v2..v5
    // the pre-mixin behavior was the Trigger.Once fallback: ONE capped
    // batch (v1's 3 bootstrap rows), the other 4 versions silently
    // stranded until the next manual run
    val q = spark.readStream.format("graft-cdc").option("uuid", "ds")
      .option("maxVersionsPerTrigger", "1").load(base)
      .writeStream.format("memory").queryName("cdc_an")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
      spark.table("cdc_an").count() shouldBe 7
      spark.table("cdc_an").select("_commit_version").distinct().count() shouldBe 5
      q.recentProgress.count(_.numInputRows > 0) should be >= 5
    } finally q.stop()
  }

  test("maxBytesPerTrigger admits whole versions by added bytes, at least one") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    (2 to 4).foreach(i => Ktk.update(spark, base, "ds",
      Some(Seq((10L + i, "c", i * 1.0)).toDF("k", "p", "v")))) // v2..v4
    val q = startCdc(base, "cdc_bytes", Map("maxBytesPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      // one version per batch under the 1-byte cap, nothing stranded
      spark.table("cdc_bytes").count() shouldBe 6
      spark.table("cdc_bytes").select("_commit_version").distinct().count() shouldBe 4
      q.recentProgress.count(_.numInputRows > 0) should be >= 4
    } finally q.stop()
  }

  test("a FRESH stream over a rollback-bearing history bootstraps from the snapshot") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    Ktk.deleteRows(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", "==", 1)))) // v2
    Ktk.rollback(spark, base, "ds", 1L) // v3 restores k=1
    val q = startCdc(base, "cdc4")
    try {
      q.processAllAvailable()
      // no prior state to reconcile: the snapshot at the batch end arrives
      // whole as inserts — including the rollback-restored row
      rows("cdc4") shouldBe Seq(
        (1L, "insert", 3L), (2L, "insert", 3L), (3L, "insert", 3L))
      // and the stream keeps tailing normally afterwards
      Ktk.update(spark, base, "ds", Some(Seq((9L, "c", 90.0)).toDF("k", "p", "v"))) // v4
      q.processAllAvailable()
      rows("cdc4").map(_._1).sorted shouldBe Seq(1L, 2L, 3L, 9L)
    } finally q.stop()
  }

  test("a rollback mid-stream (prior state exists) fails loudly with re-seed guidance") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    val q = startCdc(base, "cdc4b")
    try {
      q.processAllAvailable() // consumer now HAS state up to v1
      Ktk.deleteRows(spark, base, "ds",
        predicates = Predicates.of(Seq(("k", "==", 1)))) // v2
      Ktk.rollback(spark, base, "ds", 1L) // v3
      val e = intercept[Exception] { q.processAllAvailable() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      msg should include("rolled back")
      msg should include("FRESH checkpoint")
    } finally q.stop()
  }

  test("delete_scope removals stream as deletes") {
    val base = tmpDir("cdcs")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    val q = startCdc(base, "cdc5", Map("startingVersion" -> "1"))
    try {
      Ktk.update(spark, base, "ds", None,
        deleteScope = Predicates.of(Seq(("p", "==", "a")))) // v2 drops p=a
      q.processAllAvailable()
      rows("cdc5") shouldBe Seq((1L, "delete", 2L), (2L, "delete", 2L))
    } finally q.stop()
  }

  // ------------------------------------------------------------ batch reads

  private def batchRead(base: String, opts: (String, String)*) = {
    val r = spark.read.format("graft-cdc").option("uuid", "ds")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(base)
  }

  private def batchRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
    df.select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq

  test("batch read: full history, explicit range, empty range") {
    val base = tmpDir("cdcb")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    Ktk.deleteRows(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", "==", 2)))) // v2
    Ktk.merge(spark, base, "ds",
      Seq((3L, "b", 333.0)).toDF("k", "p", "v"), keys = Seq("k")) // v3
    batchRows(batchRead(base)) shouldBe Seq(
      (1L, "insert", 1L), (2L, "delete", 2L), (2L, "insert", 1L),
      (3L, "delete", 3L), (3L, "insert", 1L), (3L, "insert", 3L))
    batchRows(batchRead(base, "startingVersion" -> "1")) shouldBe Seq(
      (2L, "delete", 2L), (3L, "delete", 3L), (3L, "insert", 3L))
    batchRows(batchRead(base, "endingVersion" -> "1")) shouldBe Seq(
      (1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L))
    batchRows(batchRead(base, "startingVersion" -> "3")) shouldBe Seq.empty
    // deleted row VALUES ride along in batch too
    batchRead(base).filter(col("_change_type") === "delete" && col("k") === 2L)
      .select("v").as[Double].head() shouldBe 20.0
  }

  test("batch read: timestamp options resolve like TIMESTAMP AS OF") {
    val base = tmpDir("cdcb")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    Ktk.update(spark, base, "ds", Some(Seq((9L, "c", 90.0)).toDF("k", "p", "v"))) // v2
    // epoch 0 start = whole history; far-future end = current version
    batchRows(batchRead(base,
      "startingTimestamp" -> "0", "endingTimestamp" -> "9999999999999"))
      .map(_._1).sorted shouldBe Seq(1L, 2L, 3L, 9L)
    // a start AFTER the last commit -> empty slice (from == to)
    batchRead(base, "startingTimestamp" -> "9999999999999").count() shouldBe 0L
    // ISO instants parse too
    batchRead(base, "startingTimestamp" -> "1970-01-01T00:00:00Z")
      .count() shouldBe 4L
    // an end BEFORE the first commit refuses with guidance
    val e = intercept[IllegalArgumentException] {
      batchRead(base, "endingTimestamp" -> "0").collect()
    }
    e.getMessage should include("no commit at or before")
    // version and timestamp bounds are mutually exclusive
    intercept[IllegalArgumentException] {
      batchRead(base, "startingVersion" -> "0", "startingTimestamp" -> "0").collect()
    }
  }

  test("batch read: a rollback inside the range refuses unless allowRollback") {
    val base = tmpDir("cdcb")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    Ktk.deleteRows(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", "==", 1)))) // v2
    Ktk.rollback(spark, base, "ds", 1L) // v3
    val e = intercept[IllegalStateException] { batchRead(base).collect() }
    e.getMessage should include("rolled back")
    e.getMessage should include("allowRollback")
    // the forensic override serves the removes-only view
    val df = batchRead(base, "allowRollback" -> "true")
    df.filter(col("_change_type") === "delete").count() shouldBe 1L
    // a range that STARTS AFTER the rollback commit needs no override
    batchRows(batchRead(base, "startingVersion" -> "3")) shouldBe Seq.empty
    Ktk.update(spark, base, "ds", Some(Seq((9L, "c", 90.0)).toDF("k", "p", "v"))) // v4
    batchRows(batchRead(base, "startingVersion" -> "3")) shouldBe Seq((9L, "insert", 4L))
  }
}
