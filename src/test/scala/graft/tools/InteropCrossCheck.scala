package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Predicates
import graft.ktk.KartothekInterop

/** Scala half of the reference cross-validation (tools/interop_crosscheck.py
  * is the python half): read the dataset the REFERENCE CODE wrote
  * (`ref_ds`), validate content + pruning, then write `our_ds` with
  * [[KartothekInterop.write]] for the reference to load back.
  * Run: sbt "Test/runMain graft.tools.InteropCrossCheck /tmp/xval"
  */
object InteropCrossCheck {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- read the reference-written dataset
    val ds = KartothekInterop.load(spark, base, "ref_ds")
    require(ds.metadataVersion == 4 && ds.partitionKeys == Seq("p"), s"metadata: $ds")
    require(ds.partitions.size == 3, s"partitions: ${ds.partitions.keySet}")
    require(ds.externalIndices.contains("tag"), s"indices: $ds")
    val all = KartothekInterop.readTable(spark, base, ds)
    require(all.count() == 4, s"rows: ${all.count()}")
    require(all.columns.toSet == Set("l", "v", "tag", "p"), all.columns.toSeq)

    // partition-key pruning against the reference layout
    val p2 = KartothekInterop.readTable(spark, base, ds,
      predicates = Predicates.of(Seq(("p", "==", 2))))
    require(p2.select("l").as[String].collect().toSeq == Seq("c"), "p=2 content")
    require(p2.inputFiles.forall(_.contains("p=2")), "p=2 file pruning")

    // EXTERNAL index pruning (the reference's .by-dataset-index.parquet)
    val labels = KartothekInterop.queryLabels(spark, base, ds, "table",
      Predicates.of(Seq(("tag", "==", "z"))))
    require(labels == Seq("p=3/part2"), s"index labels: $labels")
    val viaIdx = KartothekInterop.readTable(spark, base, ds,
      predicates = Predicates.of(Seq(("tag", "==", "z"))))
    require(viaIdx.select("l").as[String].collect().toSeq == Seq("d"), "tag=z content")
    println("graft read reference-written ref_ds OK (content, partition + external-index pruning)")

    // ---- adopt the reference-written dataset in place, then manage it
    val adopted = KartothekInterop.adoptAsGraft(spark, base, ds,
      secondaryIndices = Seq("tag"), zoneMapFor = Seq("v"))
    require(adopted.partitions.size == 3, s"adopted: ${adopted.partitions.keySet}")
    val viaKtk = graft.ktk.Ktk.readTable(spark, base, "ref_ds",
      predicates = Predicates.of(Seq(("tag", "==", "x"))))
    require(viaKtk.count() == 2, s"adopted index read: ${viaKtk.count()}")
    println("graft adopted ref_ds in place (typed index + zone maps over the same files)")

    // ---- multi-table form (deprecated in the reference but real in v4
    // archives, metapartition.py:77-333): one file per table per partition
    val fs = graft.ktk.DatasetMetadata.fs(spark, base)
    if (fs.exists(new org.apache.hadoop.fs.Path(
        s"$base/ref_multi${KartothekInterop.JsonSuffix}"))) {
      val multi = KartothekInterop.load(spark, base, "ref_multi")
      require(multi.tables == Seq("aux", "core"), s"tables: ${multi.tables}")
      val core = KartothekInterop.readTable(spark, base, multi, table = "core")
      require(core.columns.toSet == Set("id", "v", "p"), core.columns.toSeq)
      require(core.count() == 3, s"core rows: ${core.count()}")
      val aux = KartothekInterop.readTable(spark, base, multi, table = "aux",
        predicates = Predicates.of(Seq(("p", "==", 1))))
      require(aux.select("note").as[String].collect().sorted.toSeq == Seq("a", "b"),
        "aux p=1 content")
      require(aux.inputFiles.forall(f => f.contains("/aux/") && f.contains("p=1")),
        "aux pruning must scan only aux's p=1 file")
      val both = KartothekInterop.readTables(spark, base, multi)
      require(both.keySet == Set("aux", "core"), both.keySet)
      require(both("core").join(both("aux"), Seq("id", "p")).count() == 3,
        "cross-table join on shared keys")
      println("graft read reference-written MULTI-TABLE ref_multi OK (per-table scan + pruning)")
    }

    // ---- write our_ds for the reference to load
    val df = Seq((1, "a", "x", 1.5), (2, "b", "y", 2.5)).toDF("p", "l", "tag", "v")
    KartothekInterop.write(spark, base, "our_ds", df,
      partitionOn = Seq("p"), secondaryIndices = Seq("tag"), overwrite = true)
    println("graft wrote our_ds")

    // ---- and the EXTERNAL-index export form (distributed build, the
    // shape for large datasets) for the reference to load back
    KartothekInterop.write(spark, base, "our_ds_ext", df,
      partitionOn = Seq("p"), externalIndices = Seq("tag"), overwrite = true)
    println("graft wrote our_ds_ext (external index)")

    // ---- and the MULTI-TABLE form for the reference to load back:
    // two tables with different schemas sharing partition labels
    val coreDf = Seq((1, 1L, 1.0), (1, 2L, 2.0), (2, 3L, 3.0)).toDF("p", "id", "v")
    val auxDf = Seq((1, 1L, "a"), (1, 2L, "b"), (2, 3L, "c")).toDF("p", "id", "note")
    val wrote = KartothekInterop.writeMulti(spark, base, "our_multi",
      Map("core" -> coreDf, "aux" -> auxDf), partitionOn = Seq("p"), overwrite = true)
    require(wrote.partitions.size == 2, s"our_multi labels: ${wrote.partitions.keySet}")
    require(wrote.partitions.values.forall(_.keySet == Set("core", "aux")),
      s"every label must carry both tables: ${wrote.partitions}")
    // graft round-trips its own multi-table write
    val ours = KartothekInterop.load(spark, base, "our_multi")
    val tbls = KartothekInterop.readTables(spark, base, ours)
    require(tbls("core").count() == 3 && tbls("aux").count() == 3, "multi round-trip rows")
    require(tbls("core").join(tbls("aux"), Seq("id", "p")).count() == 3,
      "multi round-trip join")
    println("graft wrote our_multi (multi-table) and round-tripped it")
    spark.stop()
  }
}
