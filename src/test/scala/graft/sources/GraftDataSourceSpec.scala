package graft.sources

import graft.SparkSpec
import graft.ktk.Ktk
import org.apache.spark.sql.functions._

class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def setup(): String = {
    val base = tmpDir("dsv2")
    val df = Seq(
      (1, "a", 10.0, "x"), (1, "b", 20.0, "y"),
      (2, "c", 30.0, "x"), (3, "d", 40.0, "z")
    ).toDF("p", "l", "target", "tag")
    Ktk.store(spark, base, "ds", df, partitionOn = Seq("p"), secondaryIndices = Seq("tag"))
    base
  }

  private def read(base: String) =
    spark.read.format("graft").option("uuid", "ds").load(base)

  test("full scan through the connector matches the dataset") {
    val base = setup()
    val df = read(base)
    // connector surface presents SCAN order: payload then partition keys
    df.columns.toSeq shouldBe Seq("l", "tag", "target", "p")
    df.count() shouldBe 4
    df.agg(sum("target")).head.getDouble(0) shouldBe 100.0
  }

  test("partition-key filter prunes files at plan time") {
    val base = setup()
    val df = read(base).filter(col("p") === 1)
    df.count() shouldBe 2
    df.inputFiles.forall(_.contains("p=1")) shouldBe true
  }

  test("secondary-index filter prunes files the index rules out") {
    val base = setup()
    val df = read(base).filter(col("tag") === "z")
    df.select("l").as[String].collect().toSeq shouldBe Seq("d")
    df.inputFiles.forall(_.contains("p=3")) shouldBe true
  }

  test("projection reaches the parquet reader (pruned read schema)") {
    val base = setup()
    val df = read(base).filter(col("p") === 2).select("l")
    df.as[String].collect().toSeq shouldBe Seq("c")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("ReadSchema: struct<l:string>")
  }

  test("residual filters stay exact (non-prunable predicate)") {
    val base = setup()
    read(base).filter(col("target") > 15.0 && col("tag") =!= "z")
      .select("l").as[String].collect().sorted.toSeq shouldBe Seq("b", "c")
  }

  test("sql over the connector via temp view") {
    val base = setup()
    read(base).createOrReplaceTempView("ds_v")
    spark.sql("SELECT count(*) FROM ds_v WHERE p = 1").head.getLong(0) shouldBe 2
  }

  test("DataFrame writer appends as one atomic versioned commit") {
    val base = setup()
    val v0 = graft.ktk.DatasetMetadata.load(spark, base, "ds").version
    Seq((9, "z", 90.0, "w")).toDF("p", "l", "target", "tag")
      .write.format("graft").option("uuid", "ds").mode("append").save(base)
    val md = graft.ktk.DatasetMetadata.load(spark, base, "ds")
    md.version shouldBe v0 + 1
    read(base).count() shouldBe 5
    // index maintained by the commit: the new tag prunes through it
    read(base).filter(col("tag") === "w").count() shouldBe 1
    // overwrite mode is a VERSIONED content swap, not a clobber: one
    // commit replaces the referenced set, earlier versions stay travelable
    Seq((9, "z", 1.0, "q")).toDF("p", "l", "target", "tag")
      .write.format("graft").option("uuid", "ds").mode("overwrite").save(base)
    read(base).count() shouldBe 1
    graft.ktk.DatasetMetadata.load(spark, base, "ds").version shouldBe v0 + 2
    Ktk.readTableAsOf(spark, base, "ds", v0 + 1).count() shouldBe 5
    // schema mismatches are rejected by the commit's validation
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .write.format("graft").option("uuid", "ds").mode("append").save(base)
    }
    read(base).count() shouldBe 1
  }

  test("asOfVersion option time-travels through the SQL surface") {
    val base = setup()
    Ktk.update(spark, base, "ds",
      Some(Seq((9, "z", 90.0, "q")).toDF("p", "l", "target", "tag")))
    read(base).count() shouldBe 5
    val v1 = spark.read.format("graft").option("uuid", "ds")
      .option("asOfVersion", 1L).load(base)
    v1.count() shouldBe 4
    v1.createOrReplaceTempView("ds_v1")
    spark.sql("SELECT count(*) FROM ds_v1 WHERE p = 9").head.getLong(0) shouldBe 0
    // partition pruning still applies on the snapshot
    v1.filter(col("p") === 1).inputFiles.forall(_.contains("p=1")) shouldBe true
  }

  private def dvScanOf(base: String, opts: Map[String, String] = Map.empty) = {
    val md = graft.ktk.DatasetMetadata.load(spark, base, "ds")
    new GraftScanBuilder(base, md,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(opts).asJava)).build()
  }

  test("dynamic partition pruning drops fact partitions at runtime") {
    val base = tmpDir("dpp")
    // fact: 6 partitions; dim: selective filter keeps 2 join keys
    Ktk.store(spark, base, "fact",
      (1 to 60).map(i => (i % 6, i.toLong, i * 1.0)).toDF("p", "k", "v"),
      partitionOn = Seq("p"))
    // dim must be a FILE source: a local relation folds its filter at
    // planning, leaving no selective predicate for PartitionPruning
    Seq((0L, "keep"), (1L, "keep"), (2L, "drop"), (3L, "drop"), (4L, "drop"),
      (5L, "drop")).toDF("dp", "flag").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val fact = spark.read.format("graft").option("uuid", "fact").load(base)
    GraftRuntimePrune.lastKept.set(0); GraftRuntimePrune.lastDropped.set(0)
    val joined = fact.join(dim.filter(col("flag") === "keep"), col("p") === col("dp"))
    val total = joined.agg(sum("v")).head.getDouble(0)
    total shouldBe (1 to 60).filter(i => i % 6 <= 1).map(_ * 1.0).sum
    // the optimizer planted a runtime filter on the scan's partition column
    // and the planner dropped the 4 non-matching partitions' files
    joined.queryExecution.executedPlan.toString should include("dynamicpruning")
    GraftRuntimePrune.lastDropped.get() should be > 0L
    GraftRuntimePrune.lastKept.get() should be > 0L
  }

  test("DPP runtime filters land on BOTH union branches in join subtrees") {
    // the r10 open item: GraftDvSplitRule's Union(clean, dirty) must not
    // silently lose runtime (DPP) pruning when the DV-bearing fact sits in
    // a join subtree — PushDownPredicates pushes the inserted
    // DynamicPruningSubquery filter through the Union into each branch,
    // and each branch's scan consumes it via SupportsRuntimeV2Filtering.
    // Pin the plan shape on the nastier shapes, not just dim ⋈ fact.
    val base = tmpDir("dppdvsub")
    Ktk.store(spark, base, "fact",
      (1 to 60).map(i => (i % 6, i.toLong, i * 1.0)).toDF("p", "k", "v"),
      partitionOn = Seq("p"))
    // tombstones in one KEPT (p=0) and one DROPPED (p=2) partition, so the
    // dirty branch has something to prune at runtime too
    Ktk.deleteRows(spark, base, "fact",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 0), ("k", "==", 6L))))
    Ktk.deleteRows(spark, base, "fact",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 2), ("k", "==", 2L))))
    Seq((0L, "keep"), (1L, "keep"), (2L, "drop"), (3L, "drop"), (4L, "drop"),
      (5L, "drop")).toDF("dp", "flag").write.parquet(s"$base/dim")
    Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("ok", "w").write.parquet(s"$base/other")
    val dim = spark.read.parquet(s"$base/dim").filter(col("flag") === "keep")
    val other = spark.read.parquet(s"$base/other")
    def fact = spark.read.format("graft").option("uuid", "fact").load(base)

    val shapes = Seq(
      "join-of-join" ->
        fact.join(dim, col("p") === col("dp"))
          .join(other, col("k") % 3 === col("ok")).agg(sum("w")),
      "agg-above-join" ->
        fact.join(dim, col("p") === col("dp"))
          .groupBy("p").agg(sum("v").as("sv")).agg(max("sv")),
      "fact-under-outer-join" ->
        other.join(fact.join(dim, col("p") === col("dp")),
          col("ok") === col("p")).agg(sum("v")),
      "project-between" ->
        fact.withColumn("p2", col("p")).select("p2", "v")
          .join(dim, col("p2") === col("dp")).agg(sum("v")))
    for ((name, df) <- shapes) {
      GraftRuntimePrune.resetCounters()
      df.collect()
      val scans = graft.PlanWalk.batchScans(df.queryExecution.executedPlan)
      val clean = scans.filter(_.scan.isInstanceOf[GraftStreamableScan])
      val dirty = scans.filter(_.scan.isInstanceOf[GraftDvDirtyScan])
      withClue(s"shape $name: ") {
        clean.size shouldBe 1
        dirty.size shouldBe 1
        // the pin: the DPP subquery filter reached EACH branch...
        clean.head.runtimeFilters should not be empty
        dirty.head.runtimeFilters should not be empty
        // ...and each branch actually pruned with it DURING the execution
        // (per-tag counters; final-plan instances can be AQE re-plans)
        Option(GraftRuntimePrune.byTag.get("clean"))
          .getOrElse((0L, 0L))._2 should be > 0L
        Option(GraftRuntimePrune.byTag.get("dirty"))
          .getOrElse((0L, 0L))._2 should be > 0L
      }
    }
  }

  test("runtime pruning also reaches DV-bearing scans, both sides") {
    val base = tmpDir("dppdv")
    Ktk.store(spark, base, "fact",
      (1 to 60).map(i => (i % 6, i.toLong, i * 1.0)).toDF("p", "k", "v"),
      partitionOn = Seq("p"))
    // tombstone one row in p=0 (kept by the join) so the scan splits
    Ktk.deleteRows(spark, base, "fact",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 0), ("k", "==", 6L))))
    Seq((0L, "keep"), (1L, "keep"), (2L, "drop"), (3L, "drop"), (4L, "drop"),
      (5L, "drop")).toDF("dp", "flag").write.parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val fact = spark.read.format("graft").option("uuid", "fact").load(base)
    GraftRuntimePrune.lastDropped.set(0)
    val joined = fact.join(dim.filter(col("flag") === "keep"), col("p") === col("dp"))
    val total = joined.agg(sum("v")).head.getDouble(0)
    total shouldBe (1 to 60).filter(i => i % 6 <= 1 && i != 6).map(_ * 1.0).sum
    GraftRuntimePrune.lastDropped.get() should be > 0L
  }

  test("deletion vectors are applied by the batch scan (clean/dirty split)") {
    val base = setup()
    // tombstone ONE row in partition p=1; p=2/p=3 files stay clean
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("target", ">", 15.0))))
    val df = read(base)
    df.count() shouldBe 3
    df.select("l").as[String].collect().sorted.toSeq shouldBe Seq("a", "c", "d")
    // filters + projection still work through the split
    df.filter(col("p") === 1).select("target").as[Double].collect().toSeq shouldBe Seq(10.0)
    df.agg(sum("target")).head.getDouble(0) shouldBe 80.0
  }

  test("clean files take the stock path; only dirty files pay the filter") {
    val base = setup()
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("target", ">", 15.0))))
    val scan = dvScanOf(base)
    scan shouldBe a[GraftDvScan]
    val parts = scan.asInstanceOf[GraftDvScan].planInputPartitions()
      .collect { case p: GraftDvInputPartition => p }
    val dirty = parts.filter(_.dirtyLabel.isDefined)
    val clean = parts.filter(_.dirtyLabel.isEmpty)
    dirty.map(_.dirtyLabel.get).foreach(l => l should include("p=1"))
    dirty.size shouldBe 1
    clean.size should be >= 2
    // dirtyLabel=None IS the no-tombstone-lookup branch: the factory hands
    // those partitions straight to the stock delegate reader
    val factory = scan.asInstanceOf[GraftDvScan].toBatch.createReaderFactory()
    factory shouldBe a[GraftDvReaderFactory]
    // uniform row-based while vectors pend (Spark can't mix modes in one
    // BatchScanExec); materialization restores the vectorized plain scan
    parts.foreach(p => factory.supportColumnarReads(p) shouldBe false)
  }

  test("pending DVs keep clean files COLUMNAR: logical union split") {
    // GraftDvSplitRule (active via GraftExtensions in TestSpark) rewrites a
    // DV-bearing relation to Union(clean, dirty): the clean majority plans
    // its own fully-VECTORIZED BatchScanExec, only tombstone-touched files
    // read row-based — one pending GDPR delete must not de-vectorize the
    // whole table read
    val base = setup()
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("target", ">", 15.0))))
    val df = read(base)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    scans.size shouldBe 2
    val clean = scans.filter(_.scan.isInstanceOf[GraftStreamableScan])
    val dirty = scans.filter(_.scan.isInstanceOf[GraftDvDirtyScan])
    clean.size shouldBe 1
    dirty.size shouldBe 1
    clean.head.supportsColumnar shouldBe true // the point of the split
    dirty.head.supportsColumnar shouldBe false
    // clean side plans only the untouched files; dirty side only p=1's
    clean.head.inputRDD.getNumPartitions should be >= 1
    val dirtyParts = dirty.head.scan.toBatch.planInputPartitions()
      .collect { case p: GraftDvInputPartition => p }
    dirtyParts.map(_.dirtyLabel.get).foreach(_ should include("p=1"))
    // and the read is exact, with pushdown still working per branch
    df.count() shouldBe 3
    df.filter(col("p") === 1).select("target").as[Double].collect().toSeq shouldBe Seq(10.0)
    df.agg(sum("target")).head.getDouble(0) shouldBe 80.0
    // projection prunes both branches' read schemas
    val proj = read(base).select("l")
    val projScans = proj.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    projScans.size shouldBe 2
    projScans.foreach { s =>
      s.readSchema().fieldNames should contain("l")
      s.readSchema().fieldNames should contain noneOf ("target", "tag")
    }
    proj.as[String].collect().sorted.toSeq shouldBe Seq("a", "c", "d")
  }

  test("DV union split composes with time travel and self-joins") {
    val base = setup()
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("target", ">", 15.0)))) // v2
    Ktk.update(spark, base, "ds",
      Some(Seq((4, "e", 50.0, "w")).toDF("p", "l", "target", "tag"))) // v3
    // v1: before any delete — no split, all four original rows
    spark.read.format("graft").option("uuid", "ds").option("asOfVersion", "1")
      .load(base).count() shouldBe 4
    // v2: THAT version's tombstones apply through the split
    val v2 = spark.read.format("graft").option("uuid", "ds").option("asOfVersion", "2")
      .load(base)
    v2.count() shouldBe 3
    v2.select("l").as[String].collect().sorted.toSeq shouldBe Seq("a", "c", "d")
    // head: delete + append both visible
    val head = read(base)
    head.count() shouldBe 4
    // self-join: two relation instances, each rewritten independently
    val l = read(base).select(col("p").as("lp"), col("target").as("lt"))
    val r = read(base).select(col("p").as("rp"), col("target").as("rt"))
    val joined = l.join(r, col("lp") === col("rp"))
    joined.count() shouldBe 4 // p values are unique post-delete
    joined.agg(sum(col("lt") + col("rt"))).head.getDouble(0) shouldBe 260.0
  }

  test("DV scan honors the maxDvScanRows guard with a recoverable error") {
    val base = setup()
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("target", ">", 15.0))))
    val e = intercept[IllegalStateException] { dvScanOf(base, Map("maxDvScanRows" -> "1")) }
    e.getMessage should include("materializeDeletes")
    // default limit reads fine
    read(base).count() shouldBe 1
  }

  test("materialization returns the dataset to the plain keyed-capable scan") {
    val base = setup()
    Ktk.deleteRows(spark, base, "ds",
      predicates = graft.core.Predicates.of(Seq(("p", "==", 1), ("target", ">", 15.0))))
    dvScanOf(base) shouldBe a[GraftDvScan]
    Ktk.materializeDeletes(spark, base, "ds")
    dvScanOf(base) should not be a[GraftDvScan]
    read(base).count() shouldBe 3
  }
}
