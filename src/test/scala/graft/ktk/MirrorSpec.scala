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
    drain(src, dst, ckpt, maxPer = 10)
    content(dst, "dst") shouldBe content(src, "src")
    content(dst, "dst") shouldBe Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (9L, "c", 90.0))
    // the marker identifies exactly the rollback commit — versions AFTER
    // it inherit the metadata but do NOT read as rollbacks
    Ktk.rollbackVersions(spark, src, "src", 0L, 4L) shouldBe Seq(3L -> 1L)
    Ktk.rollbackVersions(spark, src, "src", 3L, 4L) shouldBe empty
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
}
