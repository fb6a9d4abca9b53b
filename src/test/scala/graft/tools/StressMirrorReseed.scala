package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Predicates
import graft.ktk.{DatasetMetadata, Ktk}

/** Rollback-recovery probe for the CDC mirror: a 500k-row upstream takes
  * a rollback that restores 1% of its keys; the poller must recover the
  * mirror with a DIFF-BOUNDED write, not a full overwrite. What a
  * 100 TB mirror operator cares about:
  *
  *  1. the re-seed commit's NEW data volume is O(diff) — here ~1% of the
  *     table (measured via the bytes added by the recovery commit vs a
  *     full re-write of the table);
  *  2. the mirror's version line SURVIVES recovery (no restart at v1);
  *  3. the recovered mirror equals the upstream exactly.
  *
  * Run: sbt "Test/runMain graft.tools.StressMirrorReseed"
  */
object StressMirrorReseed {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val n = 500000L
    val src = java.nio.file.Files.createTempDirectory("reseed-src").toString
    val dst = java.nio.file.Files.createTempDirectory("reseed-dst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("reseed-ck").toString + "/m.v"

    def rows(upTo: Long) = spark.range(upTo)
      .select(col("id").as("k"), (col("id") % 16).cast("string").as("p"),
        (col("id") * 1.0).as("v"))

    Ktk.store(spark, src, "up", rows(n), partitionOn = Seq("p")) // v1
    // drain: mirror bootstraps with the full content
    while (Ktk.mirrorChanges(spark, src, "up", dst, "m", Seq("k"), ckpt) > 0) ()
    // delete 1% of the keys, then roll back: the feed reports the
    // restore only as removes, so recovery MUST come from the snapshot
    Ktk.deleteRows(spark, src, "up",
      predicates = Predicates.of(Seq(("k", "<", (n / 100).toInt)))) // v2
    while (Ktk.mirrorChanges(spark, src, "up", dst, "m", Seq("k"), ckpt) > 0) ()
    val mirrorVersBefore = DatasetMetadata.listVersions(spark, dst, "m").max
    val bytesBefore = DatasetMetadata.load(spark, dst, "m").partitions.values.sum
    Ktk.rollback(spark, src, "up", 1L) // v3: restores the 1%

    val (_, tRec) = time {
      while (Ktk.mirrorChanges(spark, src, "up", dst, "m", Seq("k"), ckpt) > 0) ()
    }
    val mdAfter = DatasetMetadata.load(spark, dst, "m")
    val mirrorVers = DatasetMetadata.listVersions(spark, dst, "m")
    require(mirrorVers.contains(mirrorVersBefore),
      s"mirror version line must survive recovery (had $mirrorVersBefore, now $mirrorVers)")
    // diff-bounded: the recovery commit adds ~1% of the table's bytes.
    // (bytes is the honest proxy — the merge appends only restored rows.)
    val addedBytes = mdAfter.partitions.values.sum - bytesBefore
    val fullBytes = DatasetMetadata.load(spark, src, "up").partitions.values.sum
    println(f"recovery took $tRec%.2f s; added bytes = $addedBytes " +
      f"(${100.0 * addedBytes / fullBytes}%.1f%% of a full re-write)")
    require(addedBytes.toDouble < 0.2 * fullBytes,
      s"re-seed wrote $addedBytes bytes — not diff-bounded vs full $fullBytes")
    // exactness
    val upC = Ktk.readTable(spark, src, "up").select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq
    val mC = Ktk.readTable(spark, dst, "m").select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq
    require(upC == mC, s"mirror diverged: ${upC.size} vs ${mC.size} rows")
    println(s"mirror reseed probe OK: ${mC.size} rows, versions $mirrorVers")
    spark.stop()
  }
}
