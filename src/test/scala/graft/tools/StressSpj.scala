package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ktk.Ktk

/** Scale probe for the storage-partitioned merge: two BIG lineitem-sized
  * datasets co-partitioned into 32 hash groups, joined 1:1 on
  * (p, l_orderkey, l_linenumber) at sf0.1 — the big⋈big case SPJ exists
  * for (neither side fits a broadcast; the plain plan shuffles both).
  * The SPJ plan must (a) contain no shuffle and (b) be competitive with
  * the double-shuffle plan. Run: sbt "Test/runMain graft.tools.StressSpj"
  */
object StressSpj {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE off so executedPlan is the real physical plan (the shuffle
      // counts below would be vacuous through an AdaptiveSparkPlanExec)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("spj-stress").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("p", pmod(col("l_orderkey"), lit(32)))

    Ktk.store(spark, base, "li_a", li, partitionOn = Seq("p"), overwrite = true)
    val payload = li.select(col("p"), col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("price2"), col("l_discount").as("disc2"),
      col("l_tax").as("tax2"), col("l_shipdate").as("ship2"))
    Ktk.store(spark, base, "li_b", payload, partitionOn = Seq("p"), overwrite = true)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm FS cache / codegen
    spark.read.parquet(s"$base/li_a/table").count()
    spark.read.parquet(s"$base/li_b/table").count()

    // at 100 TB neither side fits a broadcast; emulate that so the probe
    // measures the SPJ-vs-shuffle contest (at default thresholds Spark's
    // cost model broadcasts a borderline ~7 MB side instead — correct, and
    // exactly the small-side case where SPJ isn't needed)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val spj = Ktk.mergeDatasets(spark, base, "li_a", "li_b", "inner")
    val shuffles = spj.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    println(s"SPJ plan shuffle count: ${shuffles.size} (expect 0)")
    time("colocated merge (SPJ, 32 groups) cold")(spj.count())
    val nSpj = time("colocated merge (SPJ, 32 groups) warm")(spj.count())

    // the same join through plain reads: both 600k-row sides shuffle
    val plain = Ktk.readTable(spark, base, "li_a")
      .join(Ktk.readTable(spark, base, "li_b"),
        Seq("p", "l_orderkey", "l_linenumber"), "inner")
    val plainShuffles = plain.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    println(s"plain plan shuffle count: ${plainShuffles.size}")
    time("shuffled join (plain reads) cold")(plain.count())
    val nPlain = time("shuffled join (plain reads) warm")(plain.count())

    println(s"rows: spj=$nSpj plain=$nPlain match=${nSpj == nPlain}")
    require(nSpj == nPlain, "SPJ and shuffled join disagree")
    require(shuffles.isEmpty, "SPJ plan contains a shuffle")
    spark.stop()
  }
}
