package graft.ktk

import graft.SparkSpec
import graft.core.Predicates
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def frag(n: Int) = (0 until n).map(i => (i % 3, i.toLong, s"v$i"))
    .toDF("p", "k", "v")

  test("compact merges small files per partition, one commit, content identical") {
    val base = tmpDir("compact")
    // 6 input partitions × 3 key values → many small files per directory
    Ktk.store(spark, base, "ds", frag(600).repartition(6),
      partitionOn = Seq("p"), secondaryIndices = Seq("v"), zoneMapFor = Seq("k"))
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val beforeFiles = md0.partitions.size
    beforeFiles should be >= 18 // 6 files in each of 3 dirs

    val beforeRows = Ktk.readTable(spark, base, "ds")
      .collect().map(_.toString).sorted

    val md1 = Ktk.compact(spark, base, "ds", smallFileBytes = 32 << 20,
      targetFileBytes = 128 << 20)
    md1.partitions.size should be < beforeFiles
    md1.partitions.size shouldBe 3 // one rewritten file per partition dir

    // content identical through every read path
    Ktk.readTable(spark, base, "ds").collect().map(_.toString).sorted shouldBe beforeRows
    // index still prunes correctly after the merge
    val hit = Ktk.readTable(spark, base, "ds",
      predicates = Predicates.of(Seq(("v", "==", "v7"))))
    hit.count() shouldBe 1
    // zone maps rebuilt for the new labels
    Ktk.zoneMapOf(spark, base, md1, "k").keySet shouldBe md1.partitions.keySet
    // old files unreferenced → GC removes them, reads still whole
    Ktk.garbageCollect(spark, base, "ds").size should be >= beforeFiles - 3
    Ktk.readTable(spark, base, "ds").count() shouldBe 600
  }

  test("scoped compact rewrites only matching partitions") {
    val base = tmpDir("compact")
    Ktk.store(spark, base, "ds", frag(600).repartition(6), partitionOn = Seq("p"))
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val p1Before = md0.partitions.keySet.filter(_.contains("p=1"))
    val othersBefore = md0.partitions.keySet.filterNot(_.contains("p=1"))
    p1Before.size should be >= 6
    val md1 = Ktk.compact(spark, base, "ds", scope = Predicates.of(Seq(("p", "==", 1))))
    // p=1 merged to one file; every out-of-scope file untouched
    md1.partitions.keySet.filter(_.contains("p=1")) should have size 1
    md1.partitions.keySet.filterNot(_.contains("p=1")) shouldBe othersBefore
    Ktk.readTable(spark, base, "ds").count() shouldBe 600
    // non-partition scope refuses
    intercept[IllegalArgumentException] {
      Ktk.compact(spark, base, "ds", scope = Predicates.of(Seq(("k", ">", 0))))
    }
  }

  test("gc reaps many orphans through the distributed delete path") {
    val base = tmpDir("gcmany")
    // 30 input partitions x 3 dirs -> ~90 small files; compact orphans them
    Ktk.store(spark, base, "ds", frag(900).repartition(30), partitionOn = Seq("p"))
    val before = DatasetMetadata.load(spark, base, "ds").partitions.size
    before should be >= 60
    Ktk.compact(spark, base, "ds")
    val deleted = Ktk.garbageCollect(spark, base, "ds")
    deleted.size should be >= before - 3 // all victims gone, > the 16-file driver cutoff
    Ktk.readTable(spark, base, "ds").count() shouldBe 900
  }

  test("compact never merges across commits: overlay seq preserved") {
    val base = tmpDir("compactseq")
    Ktk.store(spark, base, "ds", frag(90).repartition(3), partitionOn = Seq("p"))
    Ktk.update(spark, base, "ds",
      Some((600 until 690).map(i => (i % 3, i.toLong, s"u$i")).toDF("p", "k", "v")
        .repartition(3)))
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val seqs0 = md0.partitions.keySet.groupBy(md0.seqOf).view.mapValues(_.size).toMap
    seqs0.keySet.size shouldBe 2 // two commits

    val md1 = Ktk.compact(spark, base, "ds")
    // both seq groups still present, each compacted within itself
    val seqs1 = md1.partitions.keySet.groupBy(md1.seqOf).view.mapValues(_.size).toMap
    seqs1.keySet shouldBe seqs0.keySet
    seqs1.values.foreach(n => n should be <= 3)
    Ktk.readTable(spark, base, "ds").count() shouldBe 180
  }

  test("compact racing a concurrent update: no lost labels, no stale staging dirs") {
    val base = tmpDir("crace")
    // enough small fragments that the compact rewrite takes long enough
    // for the update to land mid-flight
    Ktk.store(spark, base, "ds", frag(900).repartition(30), partitionOn = Seq("p"))
    val before = Ktk.readTable(spark, base, "ds").count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    // both sides run under commit retries: whoever loses the version CAS
    // re-derives its decision from a fresh load
    val fCompact = Future {
      Ktk.withCommitRetries(maxRetries = 10) { Ktk.compact(spark, base, "ds") }
    }
    val fUpdates = Future {
      (0 until 3).foreach { i =>
        Ktk.withCommitRetries(maxRetries = 10) {
          Ktk.update(spark, base, "ds",
            Some(Seq((1, 10000L + i, s"new$i")).toDF("p", "k", "v")))
        }
      }
    }
    try Await.result(Future.sequence(Seq(fCompact, fUpdates)), 180.seconds)
    finally pool.shutdown()
    // every pre-existing row and every concurrent append is present
    Ktk.readTable(spark, base, "ds").count() shouldBe before + 3
    Ktk.readTable(spark, base, "ds")
      .filter(col("v").startsWith("new")).count() shouldBe 3
    // no staging leftovers: each attempt cleans its own nonce dir
    val fs = DatasetMetadata.fs(spark, base)
    val stray = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/ds"))
      .map(_.getPath.getName).filter(_.startsWith(".compacting"))
    stray shouldBe empty
    // the losing attempt's moved-but-uncommitted rewrites are unreferenced
    // orphans — gc reclaims them and reads stay whole
    Ktk.garbageCollect(spark, base, "ds")
    Ktk.readTable(spark, base, "ds").count() shouldBe before + 3
  }

  test("stale-staging reaper keys on the heartbeat file, not the directory mtime") {
    val base = tmpDir("compacthb")
    Ktk.store(spark, base, "ds", frag(120).repartition(4), partitionOn = Seq("p"))
    val fs = DatasetMetadata.fs(spark, base)
    val hb = Ktk.CompactHeartbeat
    val P = (s: String) => new org.apache.hadoop.fs.Path(s)
    val stale = P(s"$base/ds/.compacting-stale000")
    val live = P(s"$base/ds/.compacting-live0000")
    fs.mkdirs(stale); fs.mkdirs(live)
    fs.create(new org.apache.hadoop.fs.Path(stale, hb), true).close()
    fs.create(new org.apache.hadoop.fs.Path(live, hb), true).close()
    val twoHoursAgo = System.currentTimeMillis() - 2L * 3600 * 1000
    // stale: DEAD owner (old heartbeat) but a fresh-looking directory —
    // an mtime-keyed reaper would wrongly keep it
    fs.setTimes(new org.apache.hadoop.fs.Path(stale, hb), twoHoursAgo, -1)
    // live: beating heart but an ancient-looking directory (HDFS dirs
    // don't refresh on child writes; object stores report zero) — an
    // mtime-keyed reaper would delete a LIVE compact's staging mid-run
    fs.setTimes(live, twoHoursAgo, -1)
    Ktk.compact(spark, base, "ds", smallFileBytes = 64L << 20)
    fs.exists(stale) shouldBe false
    fs.exists(live) shouldBe true
    // reads whole after the maintenance pass
    Ktk.readTable(spark, base, "ds").count() shouldBe 120
  }

  test("compact preserves the recorded sort layout inside merged files") {
    import org.apache.spark.sql.expressions.Window
    val base = tmpDir("compact")
    val rows = spark.range(0, 3000).selectExpr(
      "id % 7 AS p", "(id * 2654435761) % 100000 AS k", "id AS v")
    // 3 small files per partition dir, each sorted on k at write time
    Ktk.store(spark, base, "srt", rows.repartition(3), partitionOn = Seq("p"),
      sortBy = Seq("k"))
    val md1 = Ktk.compact(spark, base, "srt",
      smallFileBytes = Long.MaxValue, targetFileBytes = Long.MaxValue)
    md1.metadata.get(DatasetMetadata.SortByKey) shouldBe Some("k")
    // every rewritten file is still sorted on k
    val tableDir = md1.tableDir(base)
    val scanned = spark.read.option("basePath", tableDir)
      .parquet(md1.partitions.keys.map(l => s"$tableDir/$l").toSeq: _*)
      .select(col("k"), col("_metadata.file_path").as("f"),
        col("_metadata.row_index").as("i"))
    val w = Window.partitionBy("f").orderBy("i")
    scanned.withColumn("prev", lag("k", 1).over(w))
      .filter(col("prev") > col("k")).count() shouldBe 0
  }

  test("optimize: one call drains small files, tombstones and history") {
    val base = tmpDir("compact")
    val rows = spark.range(0, 200).selectExpr("id AS k", "id % 3 AS p", "id * 1.0 AS v")
    Ktk.store(spark, base, "opt", rows.repartition(3), partitionOn = Seq("p"))
    Ktk.deleteRows(spark, base, "opt",
      predicates = Predicates.of(Seq(("k", "<", 50))))
    val md = Ktk.optimize(spark, base, "opt",
      smallFileBytes = Long.MaxValue, gcRetainVersions = 0)
    md.deleteFragments shouldBe empty
    Ktk.readTable(spark, base, "opt").count() shouldBe 150
    // history pruned to the current commit; physical rows match the logical
    Ktk.listVersions(spark, base, "opt").size shouldBe 1
    val tableDir = md.tableDir(base)
    spark.read.parquet(md.partitions.keys.map(l => s"$tableDir/$l").toSeq: _*)
      .count() shouldBe 150
  }

  test("compact with nothing to do is a no-op") {
    val base = tmpDir("compactnoop")
    Ktk.store(spark, base, "ds", frag(10).coalesce(1), partitionOn = Seq("p"))
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val md1 = Ktk.compact(spark, base, "ds")
    md1.partitions shouldBe md0.partitions
  }
}
