package graft.ktk

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The commit-manifest write path: labels come from the write job itself,
  * never a directory listing — so concurrent writers cannot claim each
  * other's files and failed jobs leave nothing visible.
  */
class ManifestProtocolSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("p", IntegerType), StructField("k", LongType)))

  test("concurrent writePartition jobs get disjoint, complete manifests") {
    val base = tmpDir("maniconc")
    Ktk.createEmpty(spark, base, "tp", schema, partitionOn = Seq("p"))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val perWriter = (0 until 4).map { w =>
      Future {
        Ktk.writePartition(spark, base, "tp",
          (0 until 50).map(i => (w, (w * 1000 + i).toLong)).toDF("p", "k")
            .repartition(3))
      }
    }
    val labelSets = Await.result(Future.sequence(perWriter), 2.minutes)
    labelSets.foreach(_ should not be empty)
    // every writer's labels point at its own partition dir — a crossed
    // manifest would hand writer A a file from writer B's p=<B> dir
    labelSets.zipWithIndex.foreach { case (ls, w) =>
      ls.foreach(_ should startWith(s"p=$w/"))
    }
    val all = labelSets.flatten
    all.distinct.size shouldBe all.size
    Ktk.commit(spark, base, "tp", all)
    Ktk.readTable(spark, base, "tp").count() shouldBe 200
  }

  test("a failed write job leaves nothing visible; later commits stay clean") {
    val base = tmpDir("manifail")
    Ktk.store(spark, base, "ds", (0 until 10).map(i => (i % 2, i.toLong)).toDF("p", "k"),
      partitionOn = Seq("p"))
    val boom = udf { (k: Long) =>
      if (k >= 0) throw new RuntimeException("injected failure"); k
    }
    intercept[Exception] {
      Ktk.update(spark, base, "ds",
        Some(spark.range(100, 110).select(lit(3).as("p"), boom(col("id")).as("k"))))
    }
    // the dataset is untouched: same rows, no phantom partitions
    Ktk.readTable(spark, base, "ds").count() shouldBe 10
    DatasetMetadata.load(spark, base, "ds").partitions.keySet
      .exists(_.startsWith("p=3/")) shouldBe false
    // the next commit proceeds normally and never resurrects orphans
    Ktk.update(spark, base, "ds", Some(Seq((3, 999L)).toDF("p", "k")))
    val rows = Ktk.readTable(spark, base, "ds").select("k").as[Long].collect()
    rows.length shouldBe 11
    rows should contain(999L)
    rows.count(_ >= 100) shouldBe 1 // only 999 — nothing from the failed job
  }
}
