package graft.sources

import graft.SparkSpec
import graft.core.Predicates
import graft.ktk.Ktk
import org.apache.spark.sql.functions._

/** Randomized equivalence: after EVERY commit of a random
  * store/append/delete/merge history, the connector read (which plans the
  * GraftDvSplitRule union while tombstones pend) must return exactly what
  * `Ktk.readTable` returns — same rows, any DV state, with and without
  * filters/projections. Seeded RNG keeps failures reproducible.
  */
class DvSplitEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("connector union split ≡ readTable across random DV histories") {
    val rnd = new scala.util.Random(20260815L)
    val base = tmpDir("dveq")
    val uuid = "eq"

    def rows(n: Int, tag: Int): Seq[(Long, Long, Double)] =
      (0 until n).map(_ => (rnd.nextInt(400).toLong, rnd.nextInt(4).toLong, tag * 1.0))

    Ktk.store(spark, base, uuid,
      rows(200, 0).toDF("k", "p", "v"), partitionOn = Seq("p"))

    def connector = spark.read.format("graft").option("uuid", uuid).load(base)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.select("k", "p", "v").as[(Long, Long, Double)].collect().sorted.toSeq

    def check(step: String): Unit = withClue(s"[$step] ") {
      val expected = canon(Ktk.readTable(spark, base, uuid))
      canon(connector) shouldBe expected
      // filter + projection push through both union branches
      val f = col("p") === 1L && col("v") >= 0.0
      canon(connector.filter(f)) shouldBe
        canon(Ktk.readTable(spark, base, uuid).filter(f))
      connector.filter(col("k") < 50).agg(count(lit(1))).head.getLong(0) shouldBe
        expected.count(_._1 < 50)
    }

    (1 to 12).foreach { i =>
      rnd.nextInt(3) match {
        case 0 => // append
          Ktk.update(spark, base, uuid, Some(rows(40, i).toDF("k", "p", "v")))
        case 1 => // row-level delete (may be a no-op predicate — fine)
          val cut = rnd.nextInt(400)
          Ktk.deleteRows(spark, base, uuid,
            predicates = Predicates.of(Seq(("k", "==", cut.toLong))))
        case 2 => // keyed merge (tombstone + append in one commit)
          Ktk.merge(spark, base, uuid,
            rows(30, 100 + i).toDF("k", "p", "v").dropDuplicates("k"),
            keys = Seq("k"))
      }
      check(s"step $i")
    }
    // maintenance drains the vectors; equivalence must survive that too
    Ktk.materializeDeletes(spark, base, uuid)
    check("post-materialize")
  }
}
