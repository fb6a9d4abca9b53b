package graft.ktk

import graft.SparkSpec
import graft.core.Predicates

/** Incremental CDC poller (`Ktk.mirrorChanges`): a downstream mirror
  * converges on the upstream under mixed insert/update/delete traffic in
  * BOUNDED batches, and a rollback — whose restored content the change
  * feed reports only as removes — is detected via the commit marker
  * (`rollbackVersions`) and handled by re-seeding, never by trusting the
  * delta stream.
  */
class MirrorSpec extends SparkSpec {
  import spark.implicits._

  private def content(base: String, uuid: String): Seq[(Long, String, Double)] =
    Ktk.readTable(spark, base, uuid).select("k", "p", "v")
      .as[(Long, String, Double)].collect().sorted.toSeq

  private def drain(src: String, dst: String, ckpt: String, maxPer: Int): Int = {
    var polls = 0
    while (Ktk.mirrorChanges(spark, src, "src", dst, "dst", Seq("k"), ckpt,
        maxVersionsPerPoll = maxPer) > 0) polls += 1
    polls
  }

  test("mirror converges under mixed traffic with bounded versions per poll") {
    val src = tmpDir("mir-src"); val dst = tmpDir("mir-dst")
    val ckpt = s"${tmpDir("mir-ckpt")}/mirror.v"
    Ktk.store(spark, src, "src", Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0)
    ).toDF("k", "p", "v"), partitionOn = Seq("p")) // v1
    Ktk.update(spark, src, "src", Some(Seq((5L, "c", 50.0)).toDF("k", "p", "v"))) // v2
    Ktk.deleteRows(spark, src, "src",
      predicates = Predicates.of(Seq(("k", "==", 2)))) // v3
    Ktk.merge(spark, src, "src",
      Seq((3L, "b", 333.0)).toDF("k", "p", "v"), keys = Seq("k")) // v4: update k=3
    Ktk.mergeCdc(spark, src, "src", Seq(
      (4L, "b", 0.0, "D"), (6L, "c", 60.0, "I")
    ).toDF("k", "p", "v", "op"), keys = Seq("k"), opCol = "op") // v5
    val polls = drain(src, dst, ckpt, maxPer = 2)
    polls should be >= 3 // bounded batches, not one mega-poll
    content(dst, "dst") shouldBe content(src, "src")
    content(dst, "dst") shouldBe Seq(
      (1L, "a", 10.0), (3L, "b", 333.0), (5L, "c", 50.0), (6L, "c", 60.0))
    // idempotent when drained
    Ktk.mirrorChanges(spark, src, "src", dst, "dst", Seq("k"), ckpt) shouldBe 0L
  }

  test("a key deleted then re-inserted across the same poll range survives") {
    val src = tmpDir("mir-src"); val dst = tmpDir("mir-dst")
    val ckpt = s"${tmpDir("mir-ckpt")}/mirror.v"
    Ktk.store(spark, src, "src",
      Seq((1L, "a", 10.0)).toDF("k", "p", "v"), partitionOn = Seq("p")) // v1
    Ktk.deleteRows(spark, src, "src",
      predicates = Predicates.of(Seq(("k", "==", 1)))) // v2
    Ktk.update(spark, src, "src",
      Some(Seq((1L, "a", 11.0)).toDF("k", "p", "v"))) // v3: re-insert
    // ONE poll spans delete+re-insert: last-op-per-key keeps the insert
    drain(src, dst, ckpt, maxPer = 10)
    content(dst, "dst") shouldBe Seq((1L, "a", 11.0))
  }

  test("rollback is detected and the mirror re-seeds to the restored state") {
    val src = tmpDir("mir-src"); val dst = tmpDir("mir-dst")
    val ckpt = s"${tmpDir("mir-ckpt")}/mirror.v"
    Ktk.store(spark, src, "src", Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)
    ).toDF("k", "p", "v"), partitionOn = Seq("p")) // v1
    drain(src, dst, ckpt, maxPer = 10)
    Ktk.deleteRows(spark, src, "src",
      predicates = Predicates.of(Seq(("k", "<=", 2)))) // v2
    drain(src, dst, ckpt, maxPer = 10)
    content(dst, "dst") shouldBe Seq((3L, "b", 30.0))
    Ktk.rollback(spark, src, "src", 1L) // v3: restores k=1,2 (feed: silent)
    Ktk.update(spark, src, "src", Some(Seq((9L, "c", 90.0)).toDF("k", "p", "v"))) // v4
    val dstVerBefore = DatasetMetadata.listVersions(spark, dst, "dst").max
    drain(src, dst, ckpt, maxPer = 10)
    content(dst, "dst") shouldBe content(src, "src")
    content(dst, "dst") shouldBe Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (9L, "c", 90.0))
    // the re-seed is a DIFF commit on the mirror's existing version line:
    // history survives (no restart at v1), and the recovery writes only
    // the restored keys — k=3 (unchanged through the rollback) is never
    // rewritten, so the mirror's own feed shows inserts {1,2} then {9}
    val dstVers = DatasetMetadata.listVersions(spark, dst, "dst")
    dstVers should contain(dstVerBefore)
    val feed = Ktk.readChangeFeed(spark, dst, "dst", fromVersion = dstVerBefore)
    feed.filter($"_change_type" === "insert").select("k")
      .as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 9L)
    feed.filter($"_change_type" === "delete").count() shouldBe 0L
    // the marker identifies exactly the rollback commit — versions AFTER
    // it inherit the metadata but do NOT read as rollbacks
    Ktk.rollbackVersions(spark, src, "src", 0L, 4L) shouldBe Seq(3L -> 1L)
    Ktk.rollbackVersions(spark, src, "src", 3L, 4L) shouldBe empty
  }

  test("reseedFromSnapshot writes only the diff and reconciles schema drift both ways") {
    val dst = tmpDir("reseed-dst")
    // mirror holds an EXTRA column 'm' the snapshot lacks; the snapshot
    // carries a NEW column 'x' the mirror lacks (a rollback can restore a
    // pre-evolution upstream while the mirror already evolved, and vice versa)
    Ktk.store(spark, dst, "dst", Seq(
      (1L, 10.0, "keep"), (2L, 20.0, "stale"), (3L, 30.0, "gone")
    ).toDF("k", "v", "m"))
    val snapshot = Seq(
      (1L, 10.0, Option.empty[String]), // unchanged (m null-aligns? no: mirror m="keep")
      (2L, 22.0, Some("x2")),           // changed v + new column
      (4L, 40.0, None)                  // new key
    ).toDF("k", "v", "x")
    val vBefore = DatasetMetadata.load(spark, dst, "dst").version
    Ktk.reseedFromSnapshot(spark, dst, "dst", snapshot, keys = Seq("k"))
    val got = Ktk.readTable(spark, dst, "dst")
      .select("k", "v", "m", "x")
      .as[(Long, Double, Option[String], Option[String])].collect().sorted.toSeq
    // k=1: mirror-only column m="keep" vs snapshot null → counts as changed,
    //      upsert nulls it (the snapshot is the source of truth)
    // k=3: gone upstream → tombstoned
    got shouldBe Seq(
      (1L, 10.0, None, None),
      (2L, 22.0, None, Some("x2")),
      (4L, 40.0, None, None))
    // ONE commit, diff-bounded: feed shows exactly the 3 upserts (existing
    // keys 1,2 appear as delete+insert pairs — the feed's update shape)
    // plus the tombstone for 3
    val feed = Ktk.readChangeFeed(spark, dst, "dst", fromVersion = vBefore)
    feed.filter($"_change_type" === "insert").select("k")
      .as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 4L)
    feed.filter($"_change_type" === "delete").select("k")
      .as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L, 3L)
  }

  test("reseedFromSnapshot with an identical snapshot writes no rows") {
    val dst = tmpDir("reseed-noop")
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    Ktk.store(spark, dst, "dst", df)
    val vBefore = DatasetMetadata.load(spark, dst, "dst").version
    Ktk.reseedFromSnapshot(spark, dst, "dst", df, keys = Seq("k"))
    val feed = Ktk.readChangeFeed(spark, dst, "dst", fromVersion = vBefore)
    feed.count() shouldBe 0L
    Ktk.readTable(spark, dst, "dst").select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq shouldBe Seq((1L, 10.0), (2L, 20.0))
  }

  test("mirror follows upstream additive schema evolution") {
    val src = tmpDir("mir-src"); val dst = tmpDir("mir-dst")
    val ckpt = s"${tmpDir("mir-ckpt")}/mirror.v"
    Ktk.store(spark, src, "src",
      Seq((1L, "a", 10.0)).toDF("k", "p", "v"), partitionOn = Seq("p")) // v1
    Ktk.merge(spark, src, "src",
      Seq((2L, "a", 20.0, "tag2")).toDF("k", "p", "v", "extra"),
      keys = Seq("k"), evolveSchema = true) // v2
    drain(src, dst, ckpt, maxPer = 10)
    val got = Ktk.readTable(spark, dst, "dst").select("k", "extra")
      .as[(Long, Option[String])].collect().sorted.toSeq
    got shouldBe Seq((1L, None), (2L, Some("tag2")))
  }

  test("consumer-aware gc preserves a lagging mirror's window; unregistered fails loudly") {
    def seed(): (String, String, String) = {
      val src = tmpDir("mir-src"); val dst = tmpDir("mir-dst")
      val ckpt = s"${tmpDir("mir-ckpt")}/mirror.v"
      Ktk.store(spark, src, "src",
        Seq((1L, "a", 10.0)).toDF("k", "p", "v"), partitionOn = Seq("p")) // v1
      // mirror consumes v1, then falls behind while upstream commits on
      Ktk.mirrorChanges(spark, src, "src", dst, "dst", Seq("k"), ckpt,
        maxVersionsPerPoll = 1) shouldBe 1L
      (2 to 6).foreach(i =>
        Ktk.update(spark, src, "src",
          Some(Seq((i.toLong, "a", i * 10.0)).toDF("k", "p", "v")))) // v2..v6
      (src, dst, ckpt)
    }
    // REGISTERED: the checkpoint (at v1) floors gc — versions 2..6 and the
    // snapshot they diff against stay replayable even though
    // retainVersions=0 would otherwise vacuum everything before v6
    locally {
      val (src, dst, ckpt) = seed()
      Ktk.readChangeCheckpoint(spark, ckpt) shouldBe 1L
      Ktk.garbageCollect(spark, src, "src",
        retainVersions = 0, consumerCheckpoints = Seq(ckpt))
      DatasetMetadata.listVersions(spark, src, "src").min shouldBe 1L
      drain(src, dst, ckpt, maxPer = 2)
      content(dst, "dst") shouldBe content(src, "src")
      // caught up: the floor advances with the checkpoint, gc may reap now
      Ktk.garbageCollect(spark, src, "src",
        retainVersions = 0, consumerCheckpoints = Seq(ckpt))
      DatasetMetadata.listVersions(spark, src, "src").min shouldBe 6L
    }
    // UNREGISTERED: same lag, gc unaware — the next poll fails loudly
    // (vacuumed version), never silently skips changes
    locally {
      val (src, dst, ckpt) = seed()
      Ktk.garbageCollect(spark, src, "src", retainVersions = 0)
      val e = intercept[Exception] { drain(src, dst, ckpt, maxPer = 2) }
      e.getMessage.toLowerCase should include("gc")
    }
    // a registered checkpoint that does not exist yet keeps everything
    locally {
      val (src, _, _) = seed()
      Ktk.garbageCollect(spark, src, "src", retainVersions = 0,
        consumerCheckpoints = Seq(s"${tmpDir("mir-new")}/never-polled.v"))
      DatasetMetadata.listVersions(spark, src, "src").min shouldBe 1L
    }
    // a TYPO'D checkpoint path — neither the path nor its parent exists —
    // must fail loudly instead of silently flooring retention at 0 forever
    // (indistinguishable, byte-wise, from a real not-yet-started consumer;
    // the parent directory is the intent signal)
    locally {
      val (src, _, _) = seed()
      val e = intercept[IllegalArgumentException] {
        Ktk.garbageCollect(spark, src, "src", retainVersions = 0,
          consumerCheckpoints = Seq(s"${tmpDir("mir-typo")}/no/such/dir/ckpt.v"))
      }
      e.getMessage should include("parent")
      // and nothing was reaped by the failed call
      DatasetMetadata.listVersions(spark, src, "src").min shouldBe 1L
    }
  }
}
