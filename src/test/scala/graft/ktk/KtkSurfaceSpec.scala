package graft.ktk

import graft.SparkSpec
import graft.core.{PredLiteral, PredOp, Predicates}
import org.apache.spark.sql.functions._

/** New surface: addIndex, mergeDatasets, bucketed store, metadata combine,
  * condition parsing, CLI plumbing.
  */
class KtkSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("addIndex on existing dataset enables pruned reads") {
    val base = tmpDir("ktk")
    val df = Seq((1, "a", "x"), (2, "b", "y"), (3, "c", "x")).toDF("p", "v", "tag")
    Ktk.store(spark, base, "ds", df, partitionOn = Seq("p"))
    Ktk.addIndex(spark, base, "ds", "tag")
    val md = DatasetMetadata.load(spark, base, "ds")
    md.indices.keySet shouldBe Set("tag")
    val labels = Ktk.queryLabels(spark, base, md, Predicates.of(Seq(("tag", "==", "x"))))
    labels.size shouldBe 2
    Ktk.readTable(spark, base, "ds", predicates = Predicates.of(Seq(("tag", "==", "x"))))
      .select("v").as[String].collect().sorted.toSeq shouldBe Seq("a", "c")
  }

  test("mergeDatasets joins on shared columns with pushdown per side") {
    val base = tmpDir("ktk")
    Ktk.store(spark, base, "l", Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("k", "lv", "x"))
    Ktk.store(spark, base, "r", Seq((1, "A"), (3, "C")).toDF("k", "rv"))
    val inner = Ktk.mergeDatasets(spark, base, "l", "r")
    inner.columns.toSeq.sorted shouldBe Seq("k", "lv", "rv", "x")
    inner.select("k").as[Long].collect().toSeq shouldBe Seq(1L)
    val left = Ktk.mergeDatasets(spark, base, "l", "r", how = "left",
      predicates = Predicates.of(Seq(("x", ">", 0.0))))
    left.count() shouldBe 2
    // custom merge_func hook fully replaces the default join
    val custom = Ktk.mergeDatasets(spark, base, "l", "r",
      mergeFunc = Some((a, b) => a.crossJoin(b.withColumnRenamed("k", "rk"))))
    custom.count() shouldBe 4
    custom.columns.toSet shouldBe Set("k", "lv", "x", "rk", "rv")
  }

  test("bucketed store bounds files per partition and preserves content") {
    val base = tmpDir("ktk")
    val df = (0 until 1000).map(i => (i % 2, i.toLong, s"v$i")).toDF("p", "k", "v")
      .repartition(16) // simulate many input tasks
    Ktk.store(spark, base, "b", df, partitionOn = Seq("p"), bucketBy = Seq("k"), numBuckets = 4)
    val md = DatasetMetadata.load(spark, base, "b")
    // without bucketing this would be up to 16 files per dir; bucketed <= 4
    md.partitions.keys.groupBy(_.split('/').head).values.foreach(_.size should be <= 4)
    Ktk.readTable(spark, base, "b").count() shouldBe 1000
  }

  test("nested payload columns (struct, array-of-struct) roundtrip end-to-end") {
    val base = tmpDir("ktk")
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'a', named_struct('city', 'berlin', 'zip', 10115L),
        |   array(named_struct('sku', 'x', 'qty', 2L))),
        |  (2L, 'a', named_struct('city', 'paris', 'zip', 75001L),
        |   array(named_struct('sku', 'y', 'qty', 5L), named_struct('sku', 'z', 'qty', 1L))),
        |  (3L, 'b', named_struct('city', 'rome', 'zip', 184L), array())
        |AS t(k, p, addr, items)""".stripMargin)
    Ktk.store(spark, base, "nested", df, partitionOn = Seq("p"))
    val back = Ktk.readTable(spark, base, "nested")
    back.count() shouldBe 3
    // nested field access + filterQuery over nested paths
    back.filter(col("addr.city") === "paris").select("k")
      .as[Long].collect().toSeq shouldBe Seq(2L)
    Ktk.readTable(spark, base, "nested",
      filterQuery = Some("addr.zip > 1000 AND size(items) > 0"))
      .select("k").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 2L)
    // aggregate through the array of structs
    back.select(explode(col("items")).as("it")).agg(sum("it.qty"))
      .head.getLong(0) shouldBe 8L
    // DSv2 connector reads the same nested shapes
    val dsv2 = spark.read.format("graft").option("uuid", "nested").load(base)
    dsv2.filter(col("p") === "a").select("addr.city")
      .as[String].collect().sorted.toSeq shouldBe Seq("berlin", "paris")
    // incremental update with the identical nested schema
    Ktk.update(spark, base, "nested", Some(spark.sql(
      """SELECT 4L AS k, 'b' AS p,
        |  named_struct('city', 'oslo', 'zip', 150L) AS addr,
        |  array(named_struct('sku', 'w', 'qty', 7L)) AS items""".stripMargin)))
    Ktk.readTable(spark, base, "nested").count() shouldBe 4
    // additive evolution may ADD a nested column; changing one refuses
    Ktk.addColumns(spark, base, "nested", Seq(
      org.apache.spark.sql.types.StructField("meta",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src",
            org.apache.spark.sql.types.StringType))))))
    Ktk.readTable(spark, base, "nested").select("meta").schema.head.dataType shouldBe
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.StringType)))
  }

  test("combineMetadata keeps only globally consistent keys") {
    DatasetMetadata.combineMetadata(Seq(
      Map("a" -> "1", "b" -> "2"), Map("a" -> "1", "b" -> "3", "c" -> "4"))) shouldBe
      Map("a" -> "1", "c" -> "4")
  }

  test("condition-string parser: ops, types, in-lists, disjunction") {
    Predicates.parse("x > 5 & name == 'a b'") shouldBe
      Predicates(Seq(Seq(PredLiteral("x", PredOp.Gt, 5L), PredLiteral("name", PredOp.Eq, "a b"))))
    Predicates.parse("f >= 1.5") shouldBe
      Predicates(Seq(Seq(PredLiteral("f", PredOp.Ge, 1.5))))
    Predicates.parse("s in [a, b, 3]") shouldBe
      Predicates(Seq(Seq(PredLiteral("s", PredOp.In, Seq("a", "b", 3L)))))
    Predicates.parse("a == null || b != 2") shouldBe
      Predicates(Seq(Seq(PredLiteral("a", PredOp.Eq, null)), Seq(PredLiteral("b", PredOp.Ne, 2L))))
  }

  test("cli: info/query/index/cleanup run against a real dataset") {
    val base = tmpDir("cli")
    Ktk.store(spark, base, "ds", Seq((1, "a"), (2, "b")).toDF("p", "v"), partitionOn = Seq("p"))
    graft.tools.Cli.run(spark, Array("list", base))
    graft.tools.Cli.run(spark, Array("info", base, "ds"))
    graft.tools.Cli.run(spark, Array("query", base, "ds", "p == 1"))
    graft.tools.Cli.run(spark, Array("index", base, "ds", "v"))
    DatasetMetadata.load(spark, base, "ds").indices.keySet shouldBe Set("v")
    graft.tools.Cli.run(spark, Array("bloom", base, "ds", "v"))
    DatasetMetadata.load(spark, base, "ds").bloomRegistry.keySet shouldBe Set("v")
    graft.tools.Cli.run(spark, Array("zonemap", base, "ds", "v"))
    DatasetMetadata.load(spark, base, "ds").zoneRegistry.keySet shouldBe Set("v")
    graft.tools.Cli.run(spark, Array("versions", base, "ds"))
    graft.tools.Cli.run(spark, Array("fsck", base, "ds"))
    graft.tools.Cli.run(spark, Array("asof", base, "ds", "1", "p == 1"))
    graft.tools.Cli.run(spark, Array("copy", base, "ds", "ds2"))
    Ktk.readTable(spark, base, "ds2").count() shouldBe 2
    graft.tools.Cli.run(spark, Array("delete", base, "ds2"))
    graft.tools.Cli.run(spark, Array("cleanup", base, "ds"))
    graft.tools.Cli.run(spark, Array("delete", base, "ds"))
    DatasetMetadata.listDatasets(spark, base) shouldBe Nil
  }

  test("cli: delete-rows/materialize/changes/optimize/constraint verbs") {
    val base = tmpDir("cli2")
    Ktk.store(spark, base, "dv",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v"),
      partitionOn = Seq("p"))
    graft.tools.Cli.run(spark, Array("constraint", base, "dv", "add", "v_pos", "v > 0.0"))
    Ktk.constraints(DatasetMetadata.load(spark, base, "dv")).keySet shouldBe Set("v_pos")
    graft.tools.Cli.run(spark, Array("constraint", base, "dv", "list"))
    graft.tools.Cli.run(spark, Array("delete-rows", base, "dv", "v > 25.0"))
    Ktk.readTable(spark, base, "dv").count() shouldBe 2
    DatasetMetadata.load(spark, base, "dv").deleteFragments should have size 1
    graft.tools.Cli.run(spark, Array("changes", base, "dv", "0"))
    // scoped materialize: out-of-scope-only condition leaves the vectors
    graft.tools.Cli.run(spark, Array("materialize", base, "dv", "p == a"))
    DatasetMetadata.load(spark, base, "dv").deleteFragments should have size 1
    graft.tools.Cli.run(spark, Array("materialize", base, "dv"))
    DatasetMetadata.load(spark, base, "dv").deleteFragments shouldBe empty
    // scoped compact accepts the same condition-string argument
    graft.tools.Cli.run(spark, Array("compact", base, "dv", "p == a"))
    graft.tools.Cli.run(spark, Array("cleanup", base, "dv", "--dry-run"))
    graft.tools.Cli.run(spark, Array("optimize", base, "dv", "0"))
    Ktk.readTable(spark, base, "dv").count() shouldBe 2
    graft.tools.Cli.run(spark, Array("constraint", base, "dv", "drop", "v_pos"))
    Ktk.constraints(DatasetMetadata.load(spark, base, "dv")) shouldBe empty
  }

  test("cli: update-rows and mirror verbs") {
    val base = tmpDir("cli3")
    Ktk.store(spark, base, "src",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "p", "v"),
      partitionOn = Seq("p"))
    graft.tools.Cli.run(spark, Array("update-rows", base, "src",
      "k <= 2", "v = v + greatest(5.0, least(10.0, v))"))
    import spark.implicits._
    Ktk.readTable(spark, base, "src").select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq shouldBe Seq(
      (1L, 20.0), (2L, 30.0), (3L, 30.0))
    val ckpt = s"${tmpDir("cli3-ckpt")}/m.v"
    graft.tools.Cli.run(spark, Array("mirror", base, "src", base, "dst", "k", ckpt))
    Ktk.readTable(spark, base, "dst").select("k", "v")
      .as[(Long, Double)].collect().sorted.toSeq shouldBe Seq(
      (1L, 20.0), (2L, 30.0), (3L, 30.0))
    graft.tools.Cli.splitAssignments("a=f(x, y), b = 2, c=g(h(1,2),3)") shouldBe
      Seq("a=f(x, y)", "b = 2", "c=g(h(1,2),3)")
  }

  test("cli: add-columns and set-props verbs") {
    val base = tmpDir("cli4")
    Ktk.store(spark, base, "ddl", Seq((1L, 10.0)).toDF("k", "v"))
    graft.tools.Cli.run(spark, Array("add-columns", base, "ddl", "note string, n int"))
    val md = DatasetMetadata.load(spark, base, "ddl")
    md.schema.fieldNames.toSeq shouldBe Seq("k", "n", "note", "v") // normalized order
    md.version shouldBe 2L
    graft.tools.Cli.run(spark, Array("set-props", base, "ddl", "set", "tier=gold,team=data"))
    DatasetMetadata.load(spark, base, "ddl").metadata("tier") shouldBe "gold"
    graft.tools.Cli.run(spark, Array("set-props", base, "ddl", "unset", "tier"))
    DatasetMetadata.load(spark, base, "ddl").metadata.contains("tier") shouldBe false
  }

  test("cli shell: scripted interactive query session") {
    val base = tmpDir("clishell")
    Ktk.store(spark, base, "sh",
      Seq((1, "a", 10.0), (1, "b", 20.0), (2, "c", 30.0)).toDF("p", "v", "x"),
      partitionOn = Seq("p"))
    val script =
      """help
        |info
        |p == 1
        |cols v
        |limit 1
        |run
        |cond x >= 30
        |cols
        |run
        |v ~~ bogus syntax
        |cols nope
        |run
        |complete cond p == 1 & v
        |complete cols v,
        |complete nope
        |cols __all__
        |run
        |quit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val bos = new java.io.ByteArrayOutputStream()
    graft.tools.Cli.shell(spark, base, "sh", in,
      new java.io.PrintStream(bos, true, "UTF-8"))
    val out = bos.toString("UTF-8")
    // header + help
    out should include("dataset sh: ")
    out should include("commands: <condition>")
    // bare condition runs immediately: both p=1 rows with all columns
    out should include("(2 rows, limit 20, conditions: p == 1")
    // cols+limit narrow the next run to one single-column row
    out should include("(1 rows, limit 1")
    // cond+cols-reset: the x >= 30 row with all columns again
    out should include("(1 rows, limit 1, conditions: x >= 30, columns: all)")
    // completion (≙ the reference's prompt-toolkit WordCompleters): the
    // conditions prompt completes the word under the cursor from the
    // column set; the payload prompt from columns + __all__ (here the
    // empty token after 'v,' lists everything); unknown context errors
    val lines = out.split("\n").map(_.trim).toSeq
    lines should contain("v") // 'complete cond ... & v' → column v
    lines should contain("__all__") // payload completer includes __all__
    // bad syntax + bad column + bad complete context
    out.split("\n").count(_.contains("error: ")) shouldBe 3
    // a REJECTED cols leaves the selection untouched (the run after
    // 'cols nope' still uses all columns), and cols __all__ behaves as
    // the reference's __all__ — three identical all-column runs total
    out.split("\n").count(
      _.contains("(1 rows, limit 1, conditions: x >= 30, columns: all)")) shouldBe 3
    out should include("bye")
    out.split("\n").count(_.contains("graft>")) should be >= 1
  }

  test("cli shell: condition VALUE completion from the secondary index") {
    val base = tmpDir("clishellval")
    Ktk.store(spark, base, "sh",
      Seq((1, "alpha", 10.0), (1, "beta", 20.0), (2, "alto", 30.0)).toDF("p", "v", "x"),
      partitionOn = Seq("p"))
    Ktk.addIndex(spark, base, "sh", "v")
    val script =
      """complete cond v ==
        |complete cond v == al
        |complete cond x ==
        |complete cond p == 1 & v == b
        |quit
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val bos = new java.io.ByteArrayOutputStream()
    graft.tools.Cli.shell(spark, base, "sh", in,
      new java.io.PrintStream(bos, true, "UTF-8"))
    // the prompt prints without a newline, so a completion's first
    // candidate lands on the prompt line — strip the prompt prefix
    val lines = bos.toString("UTF-8").split("\n")
      .map(_.replace("graft>", "").trim).toSeq
    // `v == <Tab>` offers every indexed value; a partial narrows it; an
    // UNINDEXED column (x) offers nothing (values would need a data scan);
    // the value position is found mid-condition too
    lines.count(_ == "alpha") shouldBe 2 // bare + 'al' prefix
    lines.count(_ == "alto") shouldBe 2
    lines.count(_ == "beta") shouldBe 2 // bare + mid-condition 'b' prefix
    lines.filter(_.startsWith("score")) shouldBe empty
  }

  test("alltypes roundtrip: normalized schema, values preserved") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("part", IntegerType),
      StructField("b", BooleanType), StructField("i8", ByteType),
      StructField("i16", ShortType), StructField("i32", IntegerType),
      StructField("i64", LongType), StructField("f32", FloatType),
      StructField("f64", DoubleType), StructField("d", DateType),
      StructField("ts", TimestampType), StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("arr_i", ArrayType(IntegerType)),
      StructField("arr_s", ArrayType(StringType))))
    val rows = Seq(
      Row(1, true, 1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, java.sql.Date.valueOf("2018-01-31"),
        java.sql.Timestamp.valueOf("2018-01-01 12:34:56.789"), "uniçøde",
        Array[Byte](1, 2, 255.toByte), Seq(1, 2), Seq("x", "y")),
      Row(2, false, null, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val base = tmpDir("ktk")
    Ktk.store(spark, base, "all", df, partitionOn = Seq("part"))
    val back = Ktk.readTable(spark, base, "all")
    // normalization: ints -> long, floats -> double (incl. array elements)
    val types = back.schema.fields.map(f => f.name -> f.dataType).toMap
    types("i8") shouldBe LongType
    types("i32") shouldBe LongType
    types("f32") shouldBe DoubleType
    types("arr_i") shouldBe ArrayType(LongType)
    val r1 = back.filter(col("part") === 1).head()
    r1.getAs[Long]("i8") shouldBe 1L
    r1.getAs[Double]("f32") shouldBe 1.5
    r1.getAs[String]("s") shouldBe "uniçøde"
    r1.getAs[Array[Byte]]("bin").toSeq shouldBe Seq[Byte](1, 2, 255.toByte)
    r1.getAs[Seq[Long]]("arr_i") shouldBe Seq(1L, 2L)
    r1.getAs[java.sql.Date]("d").toString shouldBe "2018-01-31"
    assert(back.filter(col("part") === 2).head().isNullAt(back.columns.indexOf("i64")))
  }
}
