package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ktk.Ktk
import graft.sources.{GraftDvDirtyScan, GraftRuntimePrune, GraftStreamableScan}

/** Scale probe for runtime filtering (dynamic partition pruning) through
  * the DSv2 connector: lineitem sf0.1 hash-partitioned into 64 directories
  * joined to a file-backed dim whose selective (non-join-column) filter
  * keeps 4 of the 64 join keys. With SupportsRuntimeV2Filtering the fact
  * scan must read ~4/64ths of the files; with the rule disabled it reads
  * all of them. Reports both wall times, the pruned-file counts, and
  * verifies the results agree.
  *
  * Phase 2 (pending-DV variant, round 11): tombstones rows in one KEPT and
  * one DROPPED partition so GraftDvSplitRule rewrites the relation to
  * Union(clean, dirty), then requires that runtime pruning reaches BOTH
  * branches (each BatchScanExec carries a runtime filter and each branch
  * drops files) and that the kept/dropped FILE COUNTS exactly match the
  * no-DV run — the split partitions the same file set, so a DV-bearing
  * fact table must never silently lose DPP.
  * Run: sbt "Test/runMain graft.tools.StressDpp"
  */
object StressDpp {
  private def scans(p: SparkPlan): Seq[BatchScanExec] = graft.PlanWalk.batchScans(p)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory("dpp-stress").toString
    // 8x-replicated fact (~4.8M rows at sf0.1) so the read cost dominates
    // the fixed join/planning overhead and the prune is visible in wall time
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("rep", explode(lit((0 until 8).toArray)))
      .withColumn("p", pmod(col("l_orderkey") + col("rep"), lit(64)))
      .drop("rep")
    Ktk.store(spark, base, "fact", li, partitionOn = Seq("p"))
    spark.range(64).select(col("id").as("dp"),
      (col("id") < 4).cast("int").as("keep"))
      .write.mode("overwrite").parquet(s"$base/dim")

    def query(): DataFrame = {
      val fact = spark.read.format("graft").option("uuid", "fact").load(base)
      val dim = spark.read.parquet(s"$base/dim").filter(col("keep") === 1)
      fact.join(dim, col("p") === col("dp")).agg(sum("l_extendedprice"))
    }

    def run(tag: String, dppOn: Boolean): (Double, Double, DataFrame) = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dppOn)
      GraftRuntimePrune.lastKept.set(0); GraftRuntimePrune.lastDropped.set(0)
      val df = query()
      val t0 = System.nanoTime()
      val total = df.head.getDouble(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$tag: $secs%.2f s total=$total%.2f " +
        s"kept=${GraftRuntimePrune.lastKept.get()} dropped=${GraftRuntimePrune.lastDropped.get()}")
      (secs, total, df)
    }

    // warm the reader paths once so JIT/FS cache don't bias the comparison
    run("warmup (dpp on)", dppOn = true)
    val (tOn, totalOn, _) = run("dpp ON ", dppOn = true)
    val (keptOn, droppedOn) =
      (GraftRuntimePrune.lastKept.get(), GraftRuntimePrune.lastDropped.get())
    val (tOff, totalOff, _) = run("dpp OFF", dppOn = false)
    require(math.abs(totalOn - totalOff) < 1e-6 * math.max(1.0, math.abs(totalOff)),
      s"DPP changed the result: $totalOn vs $totalOff")
    require(droppedOn > 0, "the ON run must prune files at runtime")
    require(GraftRuntimePrune.lastDropped.get() == 0,
      "with the rule disabled no runtime predicates may arrive")
    // the IO actually skipped is the primary metric: on local NVMe with a
    // warm page cache the absolute read cost is tiny, but at cluster scale
    // (object-store reads) skipping 60/64 of the fact bytes IS the win
    println(f"speedup: ${tOff / tOn}%.2fx wall (page-cache-bound locally); " +
      s"runtime prune kept $keptOn / dropped $droppedOn files")

    // ---------------------------------------------------- pending-DV phase
    // tombstone rows in one KEPT (p=1) and one DROPPED (p=10) partition:
    // the relation now rewrites to Union(clean, dirty) and both branches
    // must keep pruning — same files, just split across two scans
    val expectDeletedPrice = spark.read.format("graft").option("uuid", "fact")
      .load(base).filter(col("p") === 1 && col("l_linenumber") === 1)
      .agg(sum("l_extendedprice")).head.getDouble(0)
    Ktk.deleteRows(spark, base, "fact",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("l_linenumber", "==", 1))))
    Ktk.deleteRows(spark, base, "fact",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 10), ("l_linenumber", "==", 1))))

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", true)
    GraftRuntimePrune.resetCounters()
    val dvDf = query()
    val t0 = System.nanoTime()
    val totalDv = dvDf.head.getDouble(0)
    val tDv = (System.nanoTime() - t0) / 1e9
    val (keptDv, droppedDv) =
      (GraftRuntimePrune.lastKept.get(), GraftRuntimePrune.lastDropped.get())
    println(f"dpp ON, pending DVs: $tDv%.2f s total=$totalDv%.2f kept=$keptDv dropped=$droppedDv")

    // 1. exact: the DV run loses exactly the tombstoned rows' contribution
    require(math.abs(totalDv - (totalOn - expectDeletedPrice)) <
      1e-6 * math.max(1.0, math.abs(totalOn)),
      s"DV run wrong: $totalDv vs ${totalOn - expectDeletedPrice}")
    // 2. the split planned BOTH branches and the runtime filter reached both
    val branchScans = scans(dvDf.queryExecution.executedPlan)
    val clean = branchScans.filter(_.scan.isInstanceOf[GraftStreamableScan])
    val dirty = branchScans.filter(_.scan.isInstanceOf[GraftDvDirtyScan])
    require(clean.size == 1 && dirty.size == 1,
      s"expected a clean+dirty union split, got ${branchScans.map(_.scan.getClass.getSimpleName)}")
    require(clean.head.runtimeFilters.nonEmpty, "clean branch lost the DPP runtime filter")
    require(dirty.head.runtimeFilters.nonEmpty, "dirty branch lost the DPP runtime filter")
    // 3. file conservation: clean ∪ dirty = the no-DV file set, disjoint —
    // kept/dropped across the two branches must match the no-DV run exactly
    require(keptDv == keptOn && droppedDv == droppedOn,
      s"DV split changed pruning: kept $keptDv (was $keptOn), dropped $droppedDv (was $droppedOn)")
    // 4. each branch pruned DURING the execution (per-tag counters — the
    // final-plan scan instances may be AQE re-plans whose runtime preds
    // were never set, so replanning them proves nothing)
    val (cleanKept, cleanDrops) =
      Option(GraftRuntimePrune.byTag.get("clean")).getOrElse((0L, 0L))
    val (dirtyKept, dirtyDrops) =
      Option(GraftRuntimePrune.byTag.get("dirty")).getOrElse((0L, 0L))
    println(s"per-branch runtime prune: clean kept=$cleanKept dropped=$cleanDrops; " +
      s"dirty kept=$dirtyKept dropped=$dirtyDrops")
    require(cleanDrops > 0, "clean branch pruned nothing at runtime")
    require(dirtyDrops > 0, "dirty branch pruned nothing at runtime")
    require(dirtyKept >= 1, "the kept dirty file (p=1) must survive the prune")
    println(f"pending-DV DPP intact: ${tOff / tDv}%.2fx vs no-dpp baseline wall")
    spark.stop()
  }
}
