package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ktk.Ktk

/** Scale probe for the uncollectable-key merge path: a CDC batch whose
  * distinct keys exceed `maxCollectKeys` must still prune its candidate
  * scan through the batch's per-key-column min/max envelope (partition
  * values + zone maps + row-group stats) instead of scanning the whole
  * table. What a 100 TB operator cares about:
  *
  *  1. a time/id-clustered 100k-key batch plans a candidate set bounded
  *     by the files its envelope intersects — NOT the full label set;
  *  2. wall time tracks the candidate set, not the table;
  *  3. a genuinely scattered batch (envelope = whole table) degrades to
  *     the full scan and stays exact — the pre-round-9 behavior is the
  *     worst case, never exceeded.
  *
  * Run: sbt "Test/runMain graft.tools.StressMergeFallback"
  */
object StressMergeFallback {
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

    val n = 2000000L
    val base = java.nio.file.Files.createTempDirectory("mfstress").toString
    // 2M rows, 8 partition dirs x 8 files, id sorted so zone maps are tight;
    // two-column key (id, p) keeps the batch on the multi-key path
    val df = spark.range(n)
      .select(col("id"), (col("id") / 250000).cast("long").as("p"),
        (col("id") % 997).cast("double").as("v"))
      .repartition(8).sortWithinPartitions("id")
    Ktk.store(spark, base, "ds", df, partitionOn = Seq("p"),
      sortBy = Seq("id"), zoneMapFor = Seq("id"))
    val md0 = graft.ktk.DatasetMetadata.load(spark, base, "ds")
    val total = md0.partitions.size
    println(s"table: $n rows, $total files")

    // clustered batch: 100k keys (>> maxCollectKeys=10k) inside p=3,
    // id in [750000, 850000)
    val clustered = spark.range(750000, 850000)
      .select(col("id"), lit(3L).as("p"), lit(-1.0).as("v"))
    val (_, tClustered) = time {
      Ktk.merge(spark, base, "ds", clustered, keys = Seq("id", "p"))
    }
    val candClustered = Ktk.lastMergeCandidates.get()
    println(f"clustered 100k-key merge: $tClustered%.2f s, candidates " +
      s"$candClustered / $total")
    require(candClustered < total,
      s"clustered fallback merge scanned the whole table ($candClustered/$total)")

    // scattered batch: 100k keys spread uniformly — envelope covers all
    val scattered = spark.range(100000)
      .select((col("id") * 20).as("id"), ((col("id") * 20) / 250000).cast("long").as("p"),
        lit(-2.0).as("v"))
    val total2 = graft.ktk.DatasetMetadata.load(spark, base, "ds").partitions.size
    val (_, tScattered) = time {
      Ktk.merge(spark, base, "ds", scattered, keys = Seq("id", "p"))
    }
    println(f"scattered 100k-key merge: $tScattered%.2f s, candidates " +
      s"${Ktk.lastMergeCandidates.get()} / $total2")

    // exactness: both batches fully applied
    val counts = Ktk.readTable(spark, base, "ds")
      .groupBy("v").count().filter(col("v") < 0)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    println(s"applied rows: $counts")
    // the scattered batch overwrote ids divisible by 20 inside the
    // clustered range too, so -1.0 keeps 100k minus those collisions
    val overlap = (750000 until 850000).count(_ % 20 == 0)
    require(counts(-1.0) == 100000L - overlap, s"clustered rows: ${counts(-1.0)}")
    require(counts(-2.0) == 100000L, s"scattered rows: ${counts(-2.0)}")

    // STRING-keyed table (the LLM-pipeline shape: doc-id keys): a
    // clustered 100k-key CDC batch must prune through the dedicated
    // UTF8-binary string envelope (partition values + zone sidecar), not
    // fall back to the full candidate scan
    val sdf = spark.range(n)
      .select(format_string("doc%08d", col("id")).as("sk"),
        (col("id") / 250000).cast("long").as("p"),
        (col("id") % 997).cast("double").as("v"))
      .repartition(8).sortWithinPartitions("sk")
    Ktk.store(spark, base, "dss", sdf, partitionOn = Seq("p"),
      sortBy = Seq("sk"), zoneMapFor = Seq("sk"))
    val totalS = graft.ktk.DatasetMetadata.load(spark, base, "dss").partitions.size
    val strBatch = spark.range(750000, 850000)
      .select(format_string("doc%08d", col("id")).as("sk"),
        lit(3L).as("p"), lit(-3.0).as("v"))
    val (_, tString) = time {
      Ktk.merge(spark, base, "dss", strBatch, keys = Seq("sk", "p"))
    }
    val candString = Ktk.lastMergeCandidates.get()
    println(f"string-keyed clustered 100k-key merge: $tString%.2f s, candidates " +
      s"$candString / $totalS")
    require(candString < totalS,
      s"string-keyed clustered merge scanned the whole table ($candString/$totalS)")
    val appliedS = Ktk.readTable(spark, base, "dss")
      .filter(col("v") === -3.0).count()
    require(appliedS == 100000L, s"string-keyed applied rows: $appliedS")
    println("OK")
    spark.stop()
  }
}
