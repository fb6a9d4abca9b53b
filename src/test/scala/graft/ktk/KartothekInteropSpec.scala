package graft.ktk

import graft.SparkSpec
import graft.core.{Msgpack, Predicates}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Interop against the reference's v4 storage layout
  * (docs/spec/storage_layout.rst): fixtures are HAND-BUILT to the spec —
  * payload files without partition columns under key=value dirs, explicit
  * `files` dicts in the metadata blob, embedded and external indices —
  * then loaded and queried through [[KartothekInterop]].
  */
class KartothekInteropSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as a SINGLE parquet file at exactly `target`. */
  private def writeOne(df: org.apache.spark.sql.DataFrame, target: String): Unit = {
    val tmp = tmpDir("interop-one")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = DatasetMetadata.fs(spark, tmp)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet")).get
    fs.mkdirs(new Path(target).getParent)
    fs.rename(part, new Path(target))
  }

  /** Hand-build a reference-layout dataset: 3 partitions of p, table
    * 'table', files dicts, embedded index on 'tag'.
    */
  private def buildFixture(base: String, uuid: String, msgpack: Boolean = false): Unit = {
    writeOne(Seq(("a", 1.0), ("b", 2.0)).toDF("l", "v"), s"$base/$uuid/table/p=1/f1.parquet")
    writeOne(Seq(("c", 3.0)).toDF("l", "v"), s"$base/$uuid/table/p=2/f2.parquet")
    writeOne(Seq(("d", 4.0)).toDF("l", "v"), s"$base/$uuid/table/p=3/f3.parquet")
    val meta: Map[String, Any] = Map(
      "dataset_metadata_version" -> 4L,
      "dataset_uuid" -> uuid,
      "metadata" -> Map("creation_time" -> "2020-01-01 00:00:00"),
      "partition_keys" -> Seq("p"),
      "partitions" -> Map(
        "p=1/f1" -> Map("files" -> Map("table" -> s"$uuid/table/p=1/f1.parquet")),
        "p=2/f2" -> Map("files" -> Map("table" -> s"$uuid/table/p=2/f2.parquet")),
        "p=3/f3" -> Map("files" -> Map("table" -> s"$uuid/table/p=3/f3.parquet"))),
      "indices" -> Map(
        "tag" -> Map("x" -> Seq("p=1/f1"), "y" -> Seq("p=2/f2", "p=3/f3"))))
    val fs = DatasetMetadata.fs(spark, base)
    if (msgpack) {
      val packed = com.github.luben.zstd.Zstd.compress(Msgpack.pack(meta))
      val out = fs.create(new Path(s"$base/$uuid${KartothekInterop.MsgpackSuffix}"), true)
      try out.write(packed) finally out.close()
    } else writeJsonBlob(meta, s"$base/$uuid${KartothekInterop.JsonSuffix}")
  }

  /** Hand-rolled JSON blob writer, independent of our own serializer. */
  private def writeJsonBlob(meta: Map[String, Any], target: String): Unit = {
    def js(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case m: Map[_, _] => m.map { case (k, x) => js(k.toString) + ": " + js(x) }.mkString("{", ", ", "}")
      case s: Seq[_] => s.map(js).mkString("[", ", ", "]")
      case other => other.toString
    }
    val fs = DatasetMetadata.fs(spark, target)
    val out = fs.create(new Path(target), true)
    try out.write(js(meta).getBytes("UTF-8")) finally out.close()
  }

  test("multi-table v4 dataset: each named table reads independently") {
    // ≙ io_components/metapartition.py:220-333 — one partition may hold a
    // file per TABLE; each table is its own parquet tree under the uuid
    val base = tmpDir("ktkv4multi")
    val uuid = "multids"
    writeOne(Seq(("a", 1.0), ("b", 2.0)).toDF("l", "v"), s"$base/$uuid/core/p=1/c1.parquet")
    writeOne(Seq(("c", 3.0)).toDF("l", "v"), s"$base/$uuid/core/p=2/c2.parquet")
    writeOne(Seq((10L, "x")).toDF("n", "t"), s"$base/$uuid/aux/p=1/a1.parquet")
    writeOne(Seq((20L, "y")).toDF("n", "t"), s"$base/$uuid/aux/p=2/a2.parquet")
    writeJsonBlob(Map(
      "dataset_metadata_version" -> 4L,
      "dataset_uuid" -> uuid,
      "partition_keys" -> Seq("p"),
      "partitions" -> Map(
        "p=1/f1" -> Map("files" -> Map(
          "core" -> s"$uuid/core/p=1/c1.parquet",
          "aux" -> s"$uuid/aux/p=1/a1.parquet")),
        "p=2/f2" -> Map("files" -> Map(
          "core" -> s"$uuid/core/p=2/c2.parquet",
          "aux" -> s"$uuid/aux/p=2/a2.parquet")))),
      s"$base/$uuid${KartothekInterop.JsonSuffix}")

    val ds = KartothekInterop.load(spark, base, uuid)
    ds.tables shouldBe Seq("aux", "core")
    val core = KartothekInterop.readTable(spark, base, ds, table = "core")
    core.count() shouldBe 3
    core.columns.toSet shouldBe Set("l", "v", "p")
    // per-table partition pruning: only p=2's aux file is read
    val aux = KartothekInterop.readTable(spark, base, ds, table = "aux",
      predicates = Predicates.of(Seq(("p", "==", 2))))
    aux.select("n").as[Long].collect().toSeq shouldBe Seq(20L)
    aux.inputFiles.forall(_.contains("p=2")) shouldBe true
    // a missing table name fails clearly
    intercept[IllegalArgumentException] {
      KartothekInterop.readTable(spark, base, ds, table = "nope")
    }
    // in-place adoption stays single-table-only, with a clear error
    intercept[IllegalArgumentException] {
      KartothekInterop.adoptAsGraft(spark, base, ds)
    }

    // readTables: all tables at once; predicates apply per table with
    // WHOLE-conjunction semantics — a conjunction touching a column a
    // table lacks is dropped wholesale for that table (superset), never
    // partially applied as its surviving half
    val both = KartothekInterop.readTables(spark, base, ds,
      predicates = Predicates.of(Seq(("p", "==", 2), ("v", ">", 0.0))))
    both.keySet shouldBe Set("aux", "core")
    both("core").select("l").as[String].collect().toSeq shouldBe Seq("c")
    // aux has no 'v': the conjunction cannot apply AT ALL there — filtering
    // by the p==2 half alone would be a subset with no defined meaning
    both("aux").select("n").as[Long].collect().sorted.toSeq shouldBe Seq(10L, 20L)
    // p-only predicate applies to every table via the path keys
    val pruned = KartothekInterop.readTables(spark, base, ds,
      predicates = Predicates.of(Seq(("p", "==", 2))))
    pruned("aux").select("n").as[Long].collect().toSeq shouldBe Seq(20L)
    pruned("core").select("l").as[String].collect().toSeq shouldBe Seq("c")

    // an EMPTY multi-table dataset yields schema-only empty frames from the
    // _common_metadata blobs instead of throwing on partitions.head
    val emptyUuid = "emptyds"
    KartothekInterop.writeCommonMetadata(spark,
      s"$base/$emptyUuid/core", Seq(("x", 1.0)).toDF("l", "v").schema)
    writeJsonBlob(Map(
      "dataset_metadata_version" -> 4L,
      "dataset_uuid" -> emptyUuid,
      "partition_keys" -> Seq[String](),
      "partitions" -> Map[String, Any]()),
      s"$base/$emptyUuid${KartothekInterop.JsonSuffix}")
    val emptyDs = KartothekInterop.load(spark, base, emptyUuid)
    val emptyTables = KartothekInterop.readTables(spark, base, emptyDs)
    emptyTables.keySet shouldBe Set("core")
    emptyTables("core").count() shouldBe 0
    emptyTables("core").columns.toSet shouldBe Set("l", "v")
  }

  test("load + full read of a hand-built reference-layout dataset") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    val ds = KartothekInterop.load(spark, base, "refds")
    ds.metadataVersion shouldBe 4
    ds.partitionKeys shouldBe Seq("p")
    ds.tables shouldBe Seq("table")
    ds.partitions.keySet shouldBe Set("p=1/f1", "p=2/f2", "p=3/f3")
    val df = KartothekInterop.readTable(spark, base, ds)
    df.count() shouldBe 4
    // partition column reconstructed from the path
    df.columns.toSet shouldBe Set("l", "v", "p")
    df.filter(col("p") === 1).select("l").as[String].collect().sorted.toSeq shouldBe Seq("a", "b")
  }

  test("partition-key pruning reads only matching reference files") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    val ds = KartothekInterop.load(spark, base, "refds")
    val df = KartothekInterop.readTable(spark, base, ds,
      predicates = Predicates.of(Seq(("p", "==", 2))))
    df.select("l").as[String].collect().toSeq shouldBe Seq("c")
    df.inputFiles.forall(_.contains("p=2")) shouldBe true
  }

  test("embedded secondary index prunes labels; nulls skip pruning") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    val ds = KartothekInterop.load(spark, base, "refds")
    val labels = KartothekInterop.queryLabels(spark, base, ds, "table",
      Predicates.of(Seq(("tag", "==", "x"))))
    labels shouldBe Seq("p=1/f1")
    // a null literal on the indexed column must not prune everything
    KartothekInterop.queryLabels(spark, base, ds, "table",
      Predicates.of(Seq(("tag", "==", null)))).size shouldBe 3
  }

  test("write with external indices: distributed build, roundtrip pruning") {
    val base = tmpDir("ktkv4extw")
    val df = (0 until 40).map(i => (i % 4, i.toLong, s"t${i % 5}")).toDF("p", "k", "tag")
    val ds = KartothekInterop.write(spark, base, "extds", df,
      partitionOn = Seq("p"), externalIndices = Seq("tag"))
    ds.externalIndices.keySet shouldBe Set("tag")
    // the blob round-trips the string key and the index file exists
    val reloaded = KartothekInterop.load(spark, base, "extds")
    reloaded.externalIndices shouldBe ds.externalIndices
    DatasetMetadata.fs(spark, base)
      .exists(new Path(s"$base/${ds.externalIndices("tag")}")) shouldBe true
    // index pruning through the external file: only labels holding t3
    val hit = KartothekInterop.readTable(spark, base, reloaded,
      predicates = Predicates.of(Seq(("tag", "==", "t3"))))
    hit.count() shouldBe 8
    val labels = KartothekInterop.queryLabels(spark, base, reloaded, "table",
      Predicates.of(Seq(("tag", "==", "t3"))))
    labels.size should be < reloaded.partitions.size
  }

  test("external .by-dataset-index.parquet prunes labels") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    // replace the embedded index with an external one, reference layout:
    // indices/<col>/<ts>.by-dataset-index.parquet, columns (col, partition)
    val idxKey = "refds/indices/tag/2020-01-01T00%3A00%3A00.by-dataset-index.parquet"
    writeOne(
      Seq(("x", Seq("p=1/f1")), ("y", Seq("p=2/f2", "p=3/f3"))).toDF("tag", "partition"),
      s"$base/$idxKey")
    val ds0 = KartothekInterop.load(spark, base, "refds")
    val ds = ds0.copy(embeddedIndices = Map.empty, externalIndices = Map("tag" -> idxKey))
    KartothekInterop.queryLabels(spark, base, ds, "table",
      Predicates.of(Seq(("tag", "==", "y")))).toSet shouldBe Set("p=2/f2", "p=3/f3")
  }

  test("explicit_partitions=False: partitions discovered from the file listing") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    // strip the partitions key (and the index, which references labels)
    val fs = DatasetMetadata.fs(spark, base)
    val blob = """{"dataset_metadata_version": 4, "dataset_uuid": "refds",
                  |"metadata": {}}""".stripMargin
    val out = fs.create(new Path(s"$base/refds${KartothekInterop.JsonSuffix}"), true)
    try out.write(blob.getBytes("UTF-8")) finally out.close()
    val ds = KartothekInterop.load(spark, base, "refds")
    ds.partitions.keySet shouldBe Set("p=1/f1", "p=2/f2", "p=3/f3")
    ds.partitionKeys shouldBe Seq("p") // derived from the key structure
    val df = KartothekInterop.readTable(spark, base, ds,
      predicates = Predicates.of(Seq(("p", "==", 1))))
    df.select("l").as[String].collect().sorted.toSeq shouldBe Seq("a", "b")
  }

  test("msgpack.zstd metadata variant loads identically") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "packds", msgpack = true)
    val ds = KartothekInterop.load(spark, base, "packds")
    ds.uuid shouldBe "packds"
    ds.partitions.size shouldBe 3
    ds.embeddedIndices("tag")("y").toSet shouldBe Set("p=2/f2", "p=3/f3")
    KartothekInterop.readTable(spark, base, ds).count() shouldBe 4
  }

  test("msgpack codec roundtrips the metadata value shapes") {
    val v: Map[String, Any] = Map(
      "s" -> "täxt", "n" -> 42L, "neg" -> -7L, "big" -> 1234567890123L,
      "d" -> 1.5, "b" -> true, "nil" -> null,
      "arr" -> Seq("a", 1L), "nested" -> Map("k" -> Seq("v1", "v2")))
    Msgpack.unpack(Msgpack.pack(v)) shouldBe v
  }

  test("adoptAsGraft: reference dataset becomes fully Ktk-managed in place") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    val v4 = KartothekInterop.load(spark, base, "refds")
    val md = KartothekInterop.adoptAsGraft(spark, base, v4,
      secondaryIndices = Seq("l"), zoneMapFor = Seq("v"), bloomFor = Seq("l"))
    md.partitions.size shouldBe 3
    // bloom sidecar built over the adopted files prunes equality lookups
    md.bloomRegistry.keySet shouldBe Set("l")
    Ktk.queryLabels(spark, base, md,
      Predicates.of(Seq(("l", "==", "c")))).size should be < 3
    // the full Ktk surface now works over the SAME files
    val back = Ktk.readTable(spark, base, "refds")
    back.count() shouldBe 4
    back.columns.toSet shouldBe Set("l", "v", "p")
    // typed index rebuilt from data prunes
    Ktk.readTable(spark, base, "refds",
      predicates = Predicates.of(Seq(("l", "==", "c"))))
      .select("v").as[Double].collect().toSeq shouldBe Seq(3.0)
    // zone maps prune by value range
    Ktk.queryLabels(spark, base, DatasetMetadata.load(spark, base, "refds"),
      Predicates.of(Seq(("v", ">=", 4.0)))) shouldBe Seq("p=3/f3.parquet")
    // incremental update over the adopted dataset
    Ktk.update(spark, base, "refds",
      Some(Seq((4, "e", 5.0)).toDF("p", "l", "v")))
    Ktk.readTable(spark, base, "refds").count() shouldBe 5
    // loading an adopted blob as v4 gives a clear error, not a key crash
    val err = intercept[IllegalArgumentException] {
      KartothekInterop.load(spark, base, "refds")
    }
    err.getMessage should include("GRAFT format")
  }

  test("adoptAsGraft default is metadata-only: no sidecar builds, retrofit later") {
    val base = tmpDir("ktkv4")
    buildFixture(base, "refds")
    val v4 = KartothekInterop.load(spark, base, "refds")
    // no sidecar args → adoption writes ONE metadata commit and touches no
    // data (schema comes from footers); every data-scanning build is a
    // deliberate opt-in or a later retrofit
    val md = KartothekInterop.adoptAsGraft(spark, base, v4)
    md.indices shouldBe empty
    md.bloomRegistry shouldBe empty
    md.zoneRegistry shouldBe empty
    val fs = DatasetMetadata.fs(spark, base)
    fs.exists(new Path(s"$base/refds/indices")) shouldBe false
    fs.exists(new Path(s"$base/refds/zones")) shouldBe false
    // reads (with partition pruning) work immediately
    Ktk.readTable(spark, base, "refds").count() shouldBe 4
    // the documented lazy path: retrofit sidecars when pruning is wanted
    Ktk.addZoneMaps(spark, base, "refds", Seq("v"))
    Ktk.queryLabels(spark, base, DatasetMetadata.load(spark, base, "refds"),
      Predicates.of(Seq(("v", ">=", 4.0)))) shouldBe Seq("p=3/f3.parquet")
  }

  test("writeMulti emits the deprecated dict-of-tables v4 form; graft round-trips it") {
    val base = tmpDir("ktkv4")
    val coreDf = Seq((1, 1L, 1.0), (1, 2L, 2.0), (2, 3L, 3.0)).toDF("p", "id", "v")
    val auxDf = Seq((1, 1L, "a"), (1, 2L, "b"), (2, 3L, "c")).toDF("p", "id", "note")
    val wrote = KartothekInterop.writeMulti(spark, base, "multiout",
      Map("core" -> coreDf, "aux" -> auxDf), partitionOn = Seq("p"))
    // labels align across tables: every partition carries one file per table
    wrote.partitions.keySet shouldBe Set("p=1/part-0", "p=2/part-0")
    wrote.partitions.values.foreach(_.keySet shouldBe Set("core", "aux"))
    val fs = DatasetMetadata.fs(spark, base)
    fs.exists(new Path(s"$base/multiout/core/_common_metadata")) shouldBe true
    fs.exists(new Path(s"$base/multiout/aux/_common_metadata")) shouldBe true
    val ds = KartothekInterop.load(spark, base, "multiout")
    ds.tables shouldBe Seq("aux", "core")
    val tbls = KartothekInterop.readTables(spark, base, ds)
    tbls("core").count() shouldBe 3
    tbls("aux").count() shouldBe 3
    tbls("core").join(tbls("aux"), Seq("id", "p")).count() shouldBe 3
    // per-table partition pruning through the multi-table read
    val p1 = KartothekInterop.readTable(spark, base, ds, table = "aux",
      predicates = Predicates.of(Seq(("p", "==", 1))))
    p1.select("note").as[String].collect().sorted.toSeq shouldBe Seq("a", "b")
    p1.inputFiles.forall(f => f.contains("/aux/") && f.contains("p=1")) shouldBe true
    // the legacy driver-side export refuses past its label cap instead of
    // grinding per-file renames against an object store
    val wide = (0 until 8).map(i => (i, i.toLong)).toDF("p", "id")
    val ex = intercept[IllegalArgumentException] {
      KartothekInterop.writeMulti(spark, base, "multicap", Map("core" -> wide),
        partitionOn = Seq("p"), maxLabels = 4)
    }
    ex.getMessage should include("cap")
  }

  test("write produces a reference-shaped layout that round-trips") {
    val base = tmpDir("ktkv4")
    val df = Seq((1, "a", "x", 10.0), (1, "b", "y", 20.0), (2, "c", "x", 30.0))
      .toDF("p", "l", "tag", "v")
    KartothekInterop.write(spark, base, "outds", df,
      partitionOn = Seq("p"), secondaryIndices = Seq("tag"))
    val fs = DatasetMetadata.fs(spark, base)
    fs.exists(new Path(s"$base/outds${KartothekInterop.JsonSuffix}")) shouldBe true
    fs.exists(new Path(s"$base/outds/table/_common_metadata")) shouldBe true
    val ds = KartothekInterop.load(spark, base, "outds")
    ds.partitionKeys shouldBe Seq("p")
    ds.partitions.values.foreach(_.keySet shouldBe Set("table"))
    ds.embeddedIndices("tag")("x").size shouldBe 2
    val back = KartothekInterop.readTable(spark, base, ds,
      predicates = Predicates.of(Seq(("tag", "==", "y"))))
    back.select("l").as[String].collect().toSeq shouldBe Seq("b")
    back.inputFiles.forall(_.contains("p=1")) shouldBe true
  }
}
