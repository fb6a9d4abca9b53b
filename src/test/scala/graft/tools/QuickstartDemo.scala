package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.Predicates
import graft.ktk.Ktk

/** The README Quickstart, verbatim and runnable — keeps the doc honest.
  * Run: sbt "Test/runMain graft.tools.QuickstartDemo"
  */
object QuickstartDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("graft-demo").toString

    // 1. STORE: Hive-layout parquet + a versioned metadata commit (v1)
    Ktk.store(spark, base, "demo",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v"),
      partitionOn = Seq("p"))

    // 2. QUERY: DNF predicates prune partitions/files driver-side
    val q = Ktk.readTable(spark, base, "demo", columns = Seq("k", "v"),
      predicates = Predicates.of(Seq(("p", "==", "a"))))
    q.show()
    require(q.count() == 2, "partition 'a' holds two rows")

    // 3. UPDATE: append a batch and delete a scope in ONE commit (v2)
    Ktk.update(spark, base, "demo",
      Some(Seq((4L, "c", 40.0)).toDF("k", "p", "v")),
      deleteScope = Predicates.of(Seq(("p", "==", "b"))))
    require(Ktk.readTable(spark, base, "demo").count() == 3,
      "v2 = v1 + appended c - deleted b")

    // 4. TIME TRAVEL: every commit is an immutable snapshot
    Ktk.history(spark, base, "demo").show()
    val v1 = Ktk.readTableAsOf(spark, base, "demo", 1L)
    v1.show()
    require(v1.count() == 3, "v1 still reads its original three rows")

    // 5. GC: drop snapshots past retention, reap unreferenced files
    Ktk.garbageCollect(spark, base, "demo", retainVersions = 1)

    // SQL surface: catalog plugin, time travel, metadata tables
    spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.base", base)
    spark.sql("SELECT * FROM g.default.demo WHERE p = 'a'").show()
    require(spark.sql("SELECT * FROM g.default.demo WHERE p = 'a'").count() == 2)
    require(spark.sql("SELECT * FROM g.default.demo VERSION AS OF 2").count() == 3)
    spark.sql("SELECT * FROM g.default.demo.history").show()
    require(spark.sql("SELECT count(*) FROM g.default.demo.orphans")
      .head.getLong(0) == 0L, "gc left no orphans")
    println("quickstart: all steps green")
    spark.stop()
  }
}
