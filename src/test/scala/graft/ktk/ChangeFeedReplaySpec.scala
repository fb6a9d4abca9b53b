package graft.ktk

import graft.SparkSpec
import graft.core.Predicates
import org.apache.spark.sql.functions._

/** The change feed's fundamental contract, property-tested: for ANY
  * sequence of operations, replaying `readChangeFeed(0, current)` —
  * inserted rows minus deleted rows, as multisets — reconstructs the
  * current table exactly. Maintenance (compact / materialize / z-order is
  * covered elsewhere) must not disturb the ledger.
  */
class ChangeFeedReplaySpec extends SparkSpec {
  import spark.implicits._

  private def runSequence(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = tmpDir(s"replay$seed")
    var nextId = 100L
    def freshRows(n: Int) = {
      val rows = (0 until n).map { _ =>
        nextId += 1
        (nextId, if (rnd.nextBoolean()) "a" else "b", nextId * 1.0 + rnd.nextInt(5))
      }
      rows.toDF("k", "p", "v")
    }
    Ktk.store(spark, base, "ds", freshRows(6), partitionOn = Seq("p"))
    (0 until 10).foreach { _ =>
      rnd.nextInt(5) match {
        case 0 => Ktk.update(spark, base, "ds", Some(freshRows(1 + rnd.nextInt(3))))
        case 1 =>
          Ktk.deleteRows(spark, base, "ds",
            predicates = Predicates.of(Seq(("k", "<=", 101L + rnd.nextInt(nextId.toInt - 95)))))
          ()
        case 2 =>
          // upsert: mutate a random live-key range + insert fresh rows
          val lo = 101L + rnd.nextInt(math.max(1, nextId.toInt - 101))
          val upd = spark.range(lo, math.min(lo + 2, nextId + 1)).toDF("k")
            .withColumn("p", lit("a")).withColumn("v", lit(-rnd.nextInt(1000).toDouble))
          Ktk.merge(spark, base, "ds", upd.unionByName(freshRows(1)), keys = Seq("k"))
          ()
        case 3 => Ktk.compact(spark, base, "ds", smallFileBytes = Long.MaxValue)
        case 4 => Ktk.materializeDeletes(spark, base, "ds")
      }
    }
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "p", "v").as[(Long, String, Double)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    val feed = Ktk.readChangeFeed(spark, base, "ds", 0)
    val ins = multiset(feed.filter(col("_change_type") === "insert"))
    val del = multiset(feed.filter(col("_change_type") === "delete"))
    val replayed = ins.map { case (row, n) => row -> (n - del.getOrElse(row, 0)) }
      .filter(_._2 > 0)
    val actual = multiset(Ktk.readTable(spark, base, "ds"))
    assert(replayed == actual,
      s"seed $seed: replay mismatch — extra=${replayed.toSet -- actual.toSet} " +
        s"missing=${actual.toSet -- replayed.toSet}")
    // sanity: deletes never exceed inserts for any row identity
    del.foreach { case (row, n) =>
      assert(ins.getOrElse(row, 0) >= n, s"seed $seed: over-delete of $row")
    }
  }

  test("feed replay reconstructs the table through random op sequences") {
    Seq(1, 7, 23).foreach(runSequence)
  }
}
