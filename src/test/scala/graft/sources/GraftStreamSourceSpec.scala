package graft.sources

import graft.SparkSpec
import graft.ktk.{DatasetMetadata, Ktk}
import org.apache.spark.sql.functions._

/** The commit-aware change feed: `readStream.format("graft")` tails dataset
  * COMMITS (not directory contents) using the version snapshots as offsets.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def startFeed(base: String, uuid: String, sinkName: String) =
    spark.readStream.format("graft")
      .option("uuid", uuid)
      .load(base)
      .writeStream.format("memory").queryName(sinkName)
      .start()

  test("feed emits current content, then exactly the appended commits") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val q = startFeed(base, "ds", "feed1")
    try {
      q.processAllAvailable()
      spark.table("feed1").select("k").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
      // two more commits while the stream runs
      Ktk.update(spark, base, "ds", Some(Seq((3L, "c")).toDF("k", "v")))
      Ktk.update(spark, base, "ds", Some(Seq((4L, "d")).toDF("k", "v")))
      q.processAllAvailable()
      spark.table("feed1").select("k").as[Long].collect().sorted.toSeq shouldBe
        Seq(1L, 2L, 3L, 4L)
    } finally q.stop()
  }

  test("compaction does not re-emit already-delivered rows") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a")).toDF("k", "v"))
    Ktk.update(spark, base, "ds", Some(Seq((2L, "b")).toDF("k", "v")))
    val q = startFeed(base, "ds", "feed2")
    try {
      q.processAllAvailable()
      spark.table("feed2").count() shouldBe 2
      // compact rewrites both files into one, preserving victim seq numbers
      Ktk.compact(spark, base, "ds")
      Ktk.update(spark, base, "ds", Some(Seq((3L, "c")).toDF("k", "v")))
      q.processAllAvailable()
      // only the genuinely new row arrives; the rewrite is silent
      spark.table("feed2").select("k").as[Long].collect().sorted.toSeq shouldBe
        Seq(1L, 2L, 3L)
    } finally q.stop()
  }

  test("row-level delete commits stay silent (append-only feed contract)") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val q = startFeed(base, "ds", "feed_dv")
    try {
      q.processAllAvailable()
      spark.table("feed_dv").count() shouldBe 2
      // a deletion-vector commit adds no labels → nothing re-emits, nothing
      // retracts (the feed is append-only, not full CDC), and later appends
      // keep flowing with their offsets intact
      Ktk.deleteRows(spark, base, "ds",
        predicates = graft.core.Predicates.of(Seq(("k", "==", 1))))
      Ktk.update(spark, base, "ds", Some(Seq((3L, "c")).toDF("k", "v")))
      q.processAllAvailable()
      spark.table("feed_dv").select("k").as[Long].collect().sorted.toSeq shouldBe
        Seq(1L, 2L, 3L)
    } finally q.stop()
  }

  test("restart resumes from the checkpointed version; startingVersion skips history") {
    val base = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("out")
    Ktk.store(spark, base, "ds", Seq((1L, "a")).toDF("k", "v"))
    def start() = spark.readStream.format("graft").option("uuid", "ds").load(base)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    spark.read.parquet(out).count() shouldBe 1
    Ktk.update(spark, base, "ds", Some(Seq((2L, "b")).toDF("k", "v")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // resumed from the checkpointed offset: row 1 is NOT re-emitted
      spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq shouldBe
        Seq(1L, 2L)
    } finally q2.stop()

    // startingVersion: begin after v1 -> only post-v1 commits flow
    val q3 = spark.readStream.format("graft").option("uuid", "ds")
      .option("startingVersion", 1L).load(base)
      .writeStream.format("memory").queryName("feed4").start()
    try {
      q3.processAllAvailable()
      spark.table("feed4").select("k").as[Long].collect().toSeq shouldBe Seq(2L)
    } finally q3.stop()
  }

  test("maxVersionsPerTrigger bounds each batch while draining a backlog") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    (3L to 5L).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((i, s"v$i")).toDF("k", "v"))))
    // 4 commits of backlog; admission control must slice them into
    // one-version batches instead of one unbounded replay
    val q = spark.readStream.format("graft").option("uuid", "ds")
      .option("maxVersionsPerTrigger", 1L).load(base)
      .writeStream.format("memory").queryName("feed_ac").start()
    try {
      q.processAllAvailable()
      // nothing lost across the bounded batches
      spark.table("feed_ac").select("k").as[Long].collect().sorted.toSeq shouldBe
        (1L to 5L)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      batches.length should be >= 4 // one per admitted version
      // the FIRST batch carried only version 1's content, not the backlog
      batches.head.numInputRows shouldBe 2
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds batches by added data volume, whole versions, >= 1") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    (3L to 5L).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((i, s"v$i")).toDF("k", "v"))))
    // every commit adds ~1 small parquet file (hundreds of bytes); a 1-byte
    // cap still admits ONE version per batch (a commit can't split), so the
    // backlog drains one version at a time — byte admission, not starvation
    val q = spark.readStream.format("graft").option("uuid", "ds")
      .option("maxBytesPerTrigger", 1L).load(base)
      .writeStream.format("memory").queryName("feed_bytes")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
      spark.table("feed_bytes").select("k").as[Long].collect().sorted.toSeq shouldBe
        (1L to 5L)
      q.recentProgress.count(_.numInputRows > 0) should be >= 4
    } finally q.stop()
    // a generous cap admits the whole backlog in one batch
    val q2 = spark.readStream.format("graft").option("uuid", "ds")
      .option("maxBytesPerTrigger", 1L << 30).load(base)
      .writeStream.format("memory").queryName("feed_bytes2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q2.awaitTermination(120000))
      q2.recentProgress.count(_.numInputRows > 0) shouldBe 1
      spark.table("feed_bytes2").count() shouldBe 5
    } finally q2.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches, then terminates") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    (3L to 6L).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((i, s"v$i")).toDF("k", "v"))))
    // 5 commits of backlog; AvailableNow must drain ALL of them through
    // one-version admitted batches and then stop on its own — the
    // Trigger.Once fallback (no SupportsTriggerAvailableNow) would quit
    // after a single capped batch and silently strand the backlog
    val q = spark.readStream.format("graft").option("uuid", "ds")
      .option("maxVersionsPerTrigger", 1L).load(base)
      .writeStream.format("memory").queryName("feed_an")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
      spark.table("feed_an").select("k").as[Long].collect().sorted.toSeq shouldBe
        (1L to 6L)
      q.recentProgress.count(_.numInputRows > 0) should be >= 5
    } finally q.stop()
  }

  test("batch planning is O(delta): record reads per batch = versions in the batch") {
    val base = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("out")
    // stop/restart per phase: a continuously-triggering stream would race
    // the counter windows with its own in-flight batches
    def drainOnce(): Unit = {
      val q = spark.readStream.format("graft").option("uuid", "ds").load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    Ktk.store(spark, base, "ds", Seq((1L, "a")).toDF("k", "v")) // v1
    drainOnce() // checkpointed at v1
    // same-JVM commits seed the snapshot cache — the next batch plans with
    // ZERO commit-record reads
    (0 until 3).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((10L + i, "x")).toDF("k", "v")))) // v2..v4
    val warm0 = DatasetMetadata.recordReads.get
    drainOnce()
    (DatasetMetadata.recordReads.get - warm0) shouldBe 0L
    spark.read.parquet(out).count() shouldBe 4
    // commits from ANOTHER JVM (simulated: evict exactly the new versions):
    // resolving the batch reads ONLY the (start, end] delta records — the
    // walk-back stops at the previous batch's cached snapshot instead of
    // replaying from a checkpoint
    (0 until 3).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((20L + i, "y")).toDF("k", "v")))) // v5..v7
    (5L to 7L).foreach(v => DatasetMetadata.uncacheVersion(base, "ds", v))
    val cold0 = DatasetMetadata.recordReads.get
    drainOnce()
    (DatasetMetadata.recordReads.get - cold0) shouldBe 3L
    spark.read.parquet(out).count() shouldBe 7
  }

  test("maxVersionsPerTrigger = 0 is rejected, not silently unlimited") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "ds", Seq((1L, "a")).toDF("k", "v"))
    val q = spark.readStream.format("graft").option("uuid", "ds")
      .option("maxVersionsPerTrigger", 0L).load(base)
      .writeStream.format("memory").queryName("feed_zero").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    // the explicit 0 fails loudly instead of meaning "no limit"
    Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => t.getMessage != null &&
        t.getMessage.contains("must be >= 1")) shouldBe true
  }

  test("a dataset with no versioned commits fails the stream loudly, not silently") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "legacy", Seq((1L, "a")).toDF("k", "v"))
    // forge a pre-versioning dataset: strip graft.version from the blob
    // and drop the _versions dir, the exact state of a legacy catalog
    val md = DatasetMetadata.load(spark, base, "legacy")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    val stripped = md.copy(metadata = md.metadata - DatasetMetadata.VersionKey)
    val fs = DatasetMetadata.fs(spark, base)
    val key = new org.apache.hadoop.fs.Path(DatasetMetadata.metadataKey(base, "legacy"))
    val out = fs.create(key, true)
    try out.write(mapper.writeValueAsBytes(stripped)) finally out.close()
    fs.delete(new org.apache.hadoop.fs.Path(
      DatasetMetadata.versionsDir(base, "legacy")), true)

    val q = spark.readStream.format("graft").option("uuid", "legacy").load(base)
      .writeStream.format("memory").queryName("feed_v0").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    err.getMessage should include("predates versioned commits")
  }

  test("partition columns and filters work on the feed") {
    val base = tmpDir("feed")
    Ktk.store(spark, base, "pds",
      Seq((1L, "x"), (2L, "y")).toDF("k", "p"), partitionOn = Seq("p"))
    val q = spark.readStream.format("graft").option("uuid", "pds").load(base)
      .filter(col("p") === "x")
      .writeStream.format("memory").queryName("feed5").start()
    try {
      q.processAllAvailable()
      spark.table("feed5").select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    } finally q.stop()
  }

  test("gc's consumer floor understands a STREAMING checkpoint directory") {
    val base = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    val out = tmpDir("out")
    Ktk.store(spark, base, "ds", Seq((1L, "a")).toDF("k", "v")) // v1
    // consume v1, then stop while upstream keeps committing
    val q1 = spark.readStream.format("graft").option("uuid", "ds").load(base)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try q1.processAllAvailable() finally q1.stop()
    (2L to 5L).foreach(i =>
      Ktk.update(spark, base, "ds", Some(Seq((i, s"v$i")).toDF("k", "v")))) // v2..v5
    // one committed batch: the floor is the PREVIOUS committed batch's
    // offset — none yet, so 0 (V1 sources replay the last committed batch
    // on restart; its whole input range must stay readable)
    Ktk.readChangeCheckpoint(spark, ckpt) shouldBe 0L
    Ktk.garbageCollect(spark, base, "ds",
      retainVersions = 0, consumerCheckpoints = Seq(ckpt))
    DatasetMetadata.listVersions(spark, base, "ds").min shouldBe 1L
    // the lagging stream resumes and drains the whole backlog
    def drain(): Unit = {
      val q = spark.readStream.format("graft").option("uuid", "ds").load(base)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq shouldBe
      (1L to 5L)
    // caught up through batch 1 (offset v5): floor = batch 0's offset (v1)
    Ktk.readChangeCheckpoint(spark, ckpt) shouldBe 1L
    // one more commit + batch advances the floor to v5; gc may reap v1..v4
    Ktk.update(spark, base, "ds", Some(Seq((6L, "v6")).toDF("k", "v"))) // v6
    drain()
    Ktk.readChangeCheckpoint(spark, ckpt) shouldBe 5L
    Ktk.garbageCollect(spark, base, "ds",
      retainVersions = 0, consumerCheckpoints = Seq(ckpt))
    DatasetMetadata.listVersions(spark, base, "ds").min shouldBe 5L
    // and the protected stream still restarts cleanly after that gc
    drain()
    spark.read.parquet(out).select("k").as[Long].collect().sorted.toSeq shouldBe
      (1L to 6L)
  }
}
