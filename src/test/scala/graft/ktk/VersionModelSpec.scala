package graft.ktk

import graft.SparkSpec
import graft.core.Predicates
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField}

/** Time travel's fundamental contract, model-tested across EVERY commit
  * kind the engine can produce — append, delete-rows (deletion vectors),
  * keyed merge, full content swap (`replaceAll`, the INSERT OVERWRITE
  * commit), metadata-only additive evolution (`addColumns`), table
  * properties, compaction and tombstone materialization: a driver-side
  * model records the expected content after each commit, and every
  * recorded version must read back EXACTLY that content via
  * `readTableAsOf` at the end — no commit kind may disturb any snapshot
  * before it.
  */
class VersionModelSpec extends SparkSpec {
  import spark.implicits._

  // model row: (k, p, v, w) with w = None before the schema evolved
  private type R = (Long, String, Double, Option[Double])

  private def runSequence(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = tmpDir(s"vmodel$seed")
    var nextId = 100L
    var evolved = false
    var model = Vector.empty[R]
    var snapshots = Vector.empty[(Long, Boolean, Vector[R])] // (version, evolvedAtV, content)

    def freshRows(n: Int): Vector[R] = (0 until n).toVector.map { _ =>
      nextId += 1
      (nextId, if (rnd.nextBoolean()) "a" else "b", nextId * 1.0,
        if (evolved && rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None)
    }
    def toDf(rows: Vector[R]) =
      if (!evolved) rows.map(r => (r._1, r._2, r._3)).toDF("k", "p", "v")
      else rows.toDF("k", "p", "v", "w")
        .withColumn("w", col("w").cast("double"))

    def snap(): Unit = {
      val v = DatasetMetadata.load(spark, base, "ds").version
      snapshots :+= ((v, evolved, model))
    }

    model = freshRows(6)
    Ktk.store(spark, base, "ds", toDf(model), partitionOn = Seq("p"))
    snap()

    (0 until 12).foreach { _ =>
      rnd.nextInt(7) match {
        case 0 => // append
          val rows = freshRows(1 + rnd.nextInt(3))
          Ktk.update(spark, base, "ds", Some(toDf(rows)))
          model ++= rows; snap()
        case 1 => // row-level delete
          val cut = 101L + rnd.nextInt(math.max(1, nextId.toInt - 99))
          Ktk.deleteRows(spark, base, "ds",
            predicates = Predicates.of(Seq(("k", "<=", cut))))
          model = model.filterNot(_._1 <= cut); snap()
        case 2 => // keyed upsert
          val live = model.map(_._1)
          val hit = if (live.isEmpty) Vector.empty
            else Vector(live(rnd.nextInt(live.size))).map { k =>
              (k, "a", -rnd.nextInt(1000).toDouble, Option.empty[Double])
            }
          val rows = hit ++ freshRows(1)
          Ktk.merge(spark, base, "ds", toDf(rows), keys = Seq("k"))
          model = model.filterNot(r => rows.exists(_._1 == r._1)) ++ rows; snap()
        case 3 => // INSERT OVERWRITE: full versioned content swap
          val rows = freshRows(2 + rnd.nextInt(3))
          Ktk.update(spark, base, "ds", Some(toDf(rows)), replaceAll = true)
          model = rows; snap()
        case 4 if !evolved => // metadata-only additive evolution
          Ktk.addColumns(spark, base, "ds", Seq(StructField("w", DoubleType)))
          evolved = true; snap() // content unchanged, all w read null
        case 4 => // user-property commit (content-neutral, still versioned)
          Ktk.setTableProperties(spark, base, "ds",
            set = Map("touch" -> rnd.nextInt(10).toString))
          snap()
        case 5 => Ktk.compact(spark, base, "ds", smallFileBytes = Long.MaxValue)
          // content-neutral maintenance: NOT snapshotted (rewrites labels)
        case 6 => Ktk.materializeDeletes(spark, base, "ds"); ()
      }
    }

    def multiset(rows: Seq[R]) = rows.groupBy(identity).view.mapValues(_.size).toMap
    // every recorded snapshot reads back exactly, with ITS schema
    snapshots.foreach { case (v, evolvedAtV, content) =>
      val df = Ktk.readTableAsOf(spark, base, "ds", v)
      val got: Seq[R] =
        if (evolvedAtV)
          df.select(col("k"), col("p"), col("v"), col("w").cast("double"))
            .as[(Long, String, Double, Option[Double])].collect().toSeq
        else {
          assert(!df.columns.contains("w"),
            s"seed $seed v$v: pre-evolution snapshot must not carry the evolved column")
          df.select("k", "p", "v").as[(Long, String, Double)].collect().toSeq
            .map(t => (t._1, t._2, t._3, Option.empty[Double]))
        }
      // pre-evolution appends read w as null at post-evolution versions:
      // the model's None aligns
      assert(multiset(got) == multiset(content),
        s"seed $seed: version $v mismatch — got ${got.sorted.take(8)}… " +
          s"expected ${content.sorted.take(8)}…")
    }
    // final state equals the last snapshot through the LIVE read too
    val last = snapshots.last._3
    val liveRead = Ktk.readTable(spark, base, "ds")
      .select(col("k"), col("p"), col("v"),
        (if (evolved) col("w") else lit(null)).cast("double").as("w"))
      .as[(Long, String, Double, Option[Double])].collect().toSeq
    assert(multiset(liveRead) == multiset(last), s"seed $seed: live read diverged")
  }

  test("every commit kind preserves every earlier snapshot exactly") {
    Seq(3, 11, 42).foreach(runSequence)
  }
}
