package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Properties of the pure byte-admission walk shared by the `graft` and
  * `graft-cdc` streaming sources — the invariants a catch-up consumer
  * relies on, checked over arbitrary per-version byte sequences:
  *
  *  1. the result never exceeds the version cap and never regresses;
  *  2. at least one version is admitted whenever any is available
  *     (a commit cannot split, so a tiny cap must not starve the stream);
  *  3. beyond the forced first version, cumulative admitted bytes stay
  *     within the cap;
  *  4. stopping early is justified: the next version would have burst it.
  */
class StreamAdmissionSpec extends graft.SparkSpec {

  private val caseGen = for {
    base0 <- Gen.choose(0L, 5L)
    avail <- Gen.choose(0, 30)
    cap <- Gen.choose(1L, 5000L)
    bytes <- Gen.listOfN(avail, Gen.choose(0L, 2000L))
  } yield (base0, base0 + avail, cap, bytes)

  test("capWalk invariants over arbitrary byte sequences") {
    val prop = Prop.forAll(caseGen) { case (base0, byVersions, cap, bytes) =>
      def bytesOf(v: Long): Long = bytes((v - base0 - 1).toInt)
      val end = StreamAdmission.capWalk(base0, byVersions, cap)(bytesOf)
      val admitted = (base0 + 1) to end
      val cum = admitted.map(bytesOf).sum
      val inRange = end >= base0 && end <= byVersions
      val noStarve = byVersions == base0 || end > base0
      // the forced first admission may alone exceed the cap; every
      // further admission must have fit at its time
      val capped = admitted.size <= 1 || cum <= math.max(cap, bytesOf(base0 + 1))
      val stopJustified = end == byVersions || cum + bytesOf(end + 1) > cap
      inRange && noStarve && capped && stopJustified
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("bytesAddedAt survives a blob with an absent partitions field") {
    // Jackson leaves an absent `partitions` null on deserialized blobs
    // (bloomRegistry/zoneRegistry precedent) — the admission arithmetic
    // must guard like Ktk.history's diff does, not NPE the offset
    // computation when maxBytesPerTrigger is set
    val base = tmpDir("admission")
    val dir = java.nio.file.Paths.get(base, "ds", "_versions")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("v00000001.json"),
      """{"uuid":"ds"}""".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("v00000002.json"),
      """{"uuid":"ds","partitions":{"f1.parquet":123}}""".getBytes("UTF-8"))
    StreamAdmission.bytesAddedAt(spark, base, "ds", 2L) shouldBe 123L
    StreamAdmission.bytesAddedAt(spark, base, "ds", 1L) shouldBe 0L
  }

  test("readChangeCheckpoint parses streaming checkpoint shapes") {
    import graft.ktk.Ktk
    def write(dir: java.nio.file.Path, name: String, body: String): Unit = {
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(name), body.getBytes("UTF-8")); ()
    }
    val root = java.nio.file.Paths.get(tmpDir("sckpt"), "q")
    // empty / offsets-less checkpoint dirs: nothing consumed
    java.nio.file.Files.createDirectories(root)
    Ktk.readChangeCheckpoint(spark, root.toString) shouldBe 0L
    // planned batches 0..2, committed 0..1, a .tmp straggler ignored:
    // floor = batch BEFORE the newest committed (batch 0 → version 2),
    // taking the MIN of multi-source offset lines
    write(root.resolve("offsets"), "0", "v1\n{}\n2\n9")
    write(root.resolve("offsets"), "1", "v1\n{}\n5")
    write(root.resolve("offsets"), "2", "v1\n{}\n7")
    write(root.resolve("offsets"), "0.tmp", "garbage")
    Ktk.readChangeCheckpoint(spark, root.toString) shouldBe 0L // none committed
    write(root.resolve("commits"), "0", "v1\n{}")
    Ktk.readChangeCheckpoint(spark, root.toString) shouldBe 0L // replay floor of batch 0
    write(root.resolve("commits"), "1", "v1\n{}")
    Ktk.readChangeCheckpoint(spark, root.toString) shouldBe 2L // batch 0's min offset
    write(root.resolve("commits"), "2", "v1\n{}")
    Ktk.readChangeCheckpoint(spark, root.toString) shouldBe 5L
    // an offset file with no numeric line fails loudly
    val bad = java.nio.file.Paths.get(tmpDir("sckpt"), "bad")
    write(bad.resolve("offsets"), "0", "v1\n{}\n{\"notAGraftOffset\":true}")
    write(bad.resolve("offsets"), "1", "v1\n{}\n{\"notAGraftOffset\":true}")
    write(bad.resolve("commits"), "0", "v1\n{}")
    write(bad.resolve("commits"), "1", "v1\n{}")
    val e = intercept[IllegalStateException] {
      Ktk.readChangeCheckpoint(spark, bad.toString)
    }
    e.getMessage should include("graft version offset")
  }

  test("hand-checked walks") {
    // cap admits exactly the versions that fit
    StreamAdmission.capWalk(0L, 4L, 100L)(Map(1L -> 40L, 2L -> 40L, 3L -> 40L, 4L -> 40L)) shouldBe 2L
    // first version alone over the cap is still admitted
    StreamAdmission.capWalk(0L, 3L, 10L)(Map(1L -> 500L, 2L -> 1L, 3L -> 1L)) shouldBe 1L
    // zero-byte versions all fit
    StreamAdmission.capWalk(2L, 6L, 1L)(_ => 0L) shouldBe 6L
    // nothing available
    StreamAdmission.capWalk(5L, 5L, 1L)(_ => 0L) shouldBe 5L
  }
}
