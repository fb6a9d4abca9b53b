package graft.ktk

import graft.SparkSpec
import graft.core.Predicates
import org.apache.spark.sql.functions._

/** Row-level UPDATE (merge-on-read): matched rows tombstone + re-append
  * transformed in ONE commit; untouched files never rewrite; time travel
  * and constraints behave like every other commit.
  */
class UpdateRowsSpec extends SparkSpec {
  import spark.implicits._

  private def kv = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0)
  ).toDF("k", "p", "v")

  private def contentOf(base: String): Seq[(Long, String, Double)] =
    Ktk.readTable(spark, base, "ds").select("k", "p", "v")
      .as[(Long, String, Double)].collect().sorted.toSeq

  test("SET with old-value reference; untouched files keep their bytes") {
    val base = tmpDir("upd")
    val md0 = Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p"))
    val (md1, n) = Ktk.updateRows(spark, base, "ds",
      set = Map("v" -> (col("v") * 2)),
      predicates = Predicates.of(Seq(("p", "==", "a"))))
    n shouldBe 2L
    md1.version shouldBe md0.version + 1 // ONE commit
    // every original file survives untouched (merge-on-read, no rewrite)
    md0.partitions.keySet.subsetOf(md1.partitions.keySet) shouldBe true
    contentOf(base) shouldBe Seq(
      (1L, "a", 20.0), (2L, "a", 40.0), (3L, "b", 30.0), (4L, "b", 40.0))
    // time travel sees the pre-update values
    Ktk.readTableAsOf(spark, base, "ds", md0.version).select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq shouldBe Seq(
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
  }

  test("updating a partition column moves rows to the new directory") {
    val base = tmpDir("upd")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p"))
    Ktk.updateRows(spark, base, "ds",
      set = Map("p" -> lit("c")),
      predicates = Predicates.of(Seq(("k", "==", 1))))._2 shouldBe 1L
    contentOf(base) shouldBe Seq(
      (1L, "c", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
    // partition pruning finds the moved row in its NEW dir
    val pruned = Ktk.readTable(spark, base, "ds",
      predicates = Predicates.of(Seq(("p", "==", "c"))))
    pruned.select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    pruned.inputFiles.forall(_.contains("p=c")) shouldBe true
  }

  test("no match commits nothing; filterQuery variant works") {
    val base = tmpDir("upd")
    val md0 = Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p"))
    val (mdSame, n0) = Ktk.updateRows(spark, base, "ds",
      set = Map("v" -> lit(0.0)),
      predicates = Predicates.of(Seq(("k", "==", 99))))
    n0 shouldBe 0L
    mdSame.version shouldBe md0.version
    val (_, n1) = Ktk.updateRows(spark, base, "ds",
      set = Map("v" -> (col("v") + 1)),
      filterQuery = Some("k >= 3 AND p = 'b'"))
    n1 shouldBe 2L
    contentOf(base).filter(_._1 >= 3L).map(_._3) shouldBe Seq(31.0, 41.0)
  }

  test("repeated updates compose; already-dead rows never double-update") {
    val base = tmpDir("upd")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p"))
    Ktk.updateRows(spark, base, "ds", set = Map("v" -> (col("v") + 100)),
      predicates = Predicates.of(Seq(("k", "==", 2))))
    Ktk.updateRows(spark, base, "ds", set = Map("v" -> (col("v") + 100)),
      predicates = Predicates.of(Seq(("k", "==", 2))))
    // 20 -> 120 -> 220: the second update matches only the LIVE row
    contentOf(base).find(_._1 == 2L).get._3 shouldBe 220.0
    Ktk.readTable(spark, base, "ds").count() shouldBe 4
  }

  test("CHECK constraints gate the updated rows; violating batch leaves nothing") {
    val base = tmpDir("upd")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p"))
    Ktk.addCheckConstraint(spark, base, "ds", "v_pos", "v >= 0")
    val md1 = DatasetMetadata.load(spark, base, "ds")
    intercept[IllegalArgumentException] {
      Ktk.updateRows(spark, base, "ds", set = Map("v" -> (col("v") - 1000.0)),
        predicates = Predicates.of(Seq(("p", "==", "a"))))
    }
    // nothing landed: same version, same content, no tombstones
    val md2 = DatasetMetadata.load(spark, base, "ds")
    md2.version shouldBe md1.version
    md2.deleteFragments shouldBe md1.deleteFragments
    contentOf(base) shouldBe Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
  }

  test("change feed reports an update as delete + insert at one version") {
    val base = tmpDir("upd")
    Ktk.store(spark, base, "ds", kv, partitionOn = Seq("p")) // v1
    Ktk.updateRows(spark, base, "ds", set = Map("v" -> lit(99.0)),
      predicates = Predicates.of(Seq(("k", "==", 3)))) // v2
    Ktk.readChangeFeed(spark, base, "ds", 1)
      .select("k", "v", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().sorted.toSeq shouldBe Seq(
      (3L, 30.0, "delete", 2L), (3L, 99.0, "insert", 2L))
  }
}
