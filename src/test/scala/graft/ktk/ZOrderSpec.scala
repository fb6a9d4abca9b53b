package graft.ktk

import graft.SparkSpec
import graft.core.{Predicates, ZOrder}
import org.apache.spark.sql.functions._

/** Z-order layout: rank-math parity (codegen Column vs JVM reference), and
  * the point of the whole exercise — a file layout tight in EVERY
  * clustered dimension, so zone maps prune on a NON-LEADING column where a
  * plain leading-column sort prunes nothing.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("rankColumn (codegen) agrees with ZOrder.encode (JVM) row-for-row") {
    val rows = (0 until 2000).map { i =>
      val x = ((i * 2654435761L) % 997).toDouble
      val y = if (i % 17 == 0) None else Some((i % 251).toDouble)
      (i.toLong, x, y)
    }
    val df = rows.toDF("id", "x", "y")
    val probs = (1 until ZOrder.Buckets).map(_.toDouble / ZOrder.Buckets).toArray
    val bounds = df.stat.approxQuantile(Array("x", "y"), probs, 0.001)
    val got = df.withColumn("z",
        ZOrder.rankColumn(Seq(col("x").cast("double"), col("y").cast("double")), bounds))
      .select("id", "x", "y", "z").collect()
    got.length shouldBe 2000
    got.foreach { r =>
      val x: java.lang.Double = r.getDouble(1)
      val y: java.lang.Double = if (r.isNullAt(2)) null else r.getDouble(2)
      withClue(s"id=${r.getLong(0)} x=$x y=$y: ") {
        r.getLong(3) shouldBe ZOrder.encode(Array(x, y), bounds)
      }
    }
  }

  test("z-order prunes on the NON-LEADING clustered column; a plain sort cannot") {
    val base = tmpDir("zorder")
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong, s"v$x-$y"))
      .toDF("x", "y", "v")
    // plain leading-column sort: 16 x-tight files, each spanning ALL of y
    Ktk.store(spark, base, "sorted", grid.repartitionByRange(16, col("x")),
      zoneMapFor = Seq("x", "y"))
    // same data z-ordered: files tile BOTH dimensions at once
    Ktk.store(spark, base, "zord", grid.repartition(16))
    val mdPre = DatasetMetadata.load(spark, base, "zord")
    val total = mdPre.partitions.keys.map(mdPre.sizeOf).sum
    Ktk.clusterZOrder(spark, base, "zord", Seq("x", "y"),
      targetFileBytes = math.max(1L, total / 16))
    val mdZ = DatasetMetadata.load(spark, base, "zord")
    mdZ.partitions.size should be >= 8
    val pred = Predicates.of(Seq(("y", "==", 7L)))
    // plain sort layout: the y predicate prunes NOTHING
    val mdS = DatasetMetadata.load(spark, base, "sorted")
    Ktk.queryLabels(spark, base, mdS, pred).size shouldBe mdS.partitions.size
    // z-order layout: only the tiles whose y-range covers 7 are scheduled
    val zLabels = Ktk.queryLabels(spark, base, mdZ, pred)
    (zLabels.size.toDouble / mdZ.partitions.size) should be < 0.5
    // the leading dimension still prunes as well
    Ktk.queryLabels(spark, base, mdZ,
      Predicates.of(Seq(("x", "==", 3L)))).size should be < mdZ.partitions.size
    // correctness: filtered and full reads identical to the source grid
    Ktk.readTable(spark, base, "zord", predicates = pred)
      .select("x").as[Long].collect().sorted.toSeq shouldBe (0L until n)
    Ktk.readTable(spark, base, "zord").count() shouldBe (n.toLong * n)
  }

  test("clusterZOrder never merges commits; content identical; bad columns rejected") {
    val base = tmpDir("zorder2")
    Ktk.store(spark, base, "ds",
      (0 until 300).map(i => (i.toLong, (i % 50).toLong, s"a$i")).toDF("k", "g", "v")
        .repartition(4))
    Ktk.update(spark, base, "ds",
      Some((300 until 400).map(i => (i.toLong, (i % 50).toLong, s"b$i")).toDF("k", "g", "v")
        .repartition(3)))
    val before = Ktk.readTable(spark, base, "ds").collect().map(_.toString).sorted
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val seqs0 = md0.partitions.keys.map(md0.seqOf).toSet
    seqs0.size shouldBe 2
    Ktk.clusterZOrder(spark, base, "ds", Seq("k", "g"), targetFileBytes = 4096)
    val md1 = DatasetMetadata.load(spark, base, "ds")
    // every rewritten file inherits one of the original commit seqs —
    // overlay keep-last semantics survive the layout rewrite
    md1.partitions.keys.map(md1.seqOf).toSet shouldBe seqs0
    Ktk.readTable(spark, base, "ds").collect().map(_.toString).sorted shouldBe before
    // zone registry gained the clustered columns
    md1.zoneRegistry.keySet should contain allOf ("k", "g")
    // non-numeric and unknown columns are rejected loudly
    intercept[IllegalArgumentException] { Ktk.clusterZOrder(spark, base, "ds", Seq("v")) }
    intercept[IllegalArgumentException] { Ktk.clusterZOrder(spark, base, "ds", Seq("nope")) }
  }

  test("scoped clusterZOrder rewrites only matching partitions, DVs composed") {
    val base = tmpDir("zorder3")
    Ktk.store(spark, base, "ds",
      (0 until 400).map(i => (i % 2, i.toLong, (i % 37).toLong)).toDF("p", "k", "g")
        .repartition(4),
      partitionOn = Seq("p"))
    // tombstones in BOTH partitions: the rewrite folds p=0's, keeps p=1's
    Ktk.deleteRows(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", "<", 4L))))
    val md0 = DatasetMetadata.load(spark, base, "ds")
    val p1Before = md0.partitions.keySet.filter(_.contains("p=1"))
    val before = Ktk.readTable(spark, base, "ds").collect().map(_.toString).sorted
    Ktk.clusterZOrder(spark, base, "ds", Seq("k", "g"),
      scope = Predicates.of(Seq(("p", "==", 0))))
    val md1 = DatasetMetadata.load(spark, base, "ds")
    // out-of-scope files byte-identical; in-scope files rewritten
    md1.partitions.keySet.filter(_.contains("p=1")) shouldBe p1Before
    (md1.partitions.keySet.filter(_.contains("p=0")) intersect
      md0.partitions.keySet.filter(_.contains("p=0"))) shouldBe empty
    // content identical (p=0's tombstones folded in, p=1's still applied)
    Ktk.readTable(spark, base, "ds").collect().map(_.toString).sorted shouldBe before
    // p=1's fragments must survive the commit or its deletes resurrect
    md1.deleteFragments should not be empty
    // a NEW zone column must NOT register from a scoped rewrite: the
    // sidecar would cover only in-scope labels and zone pruning treats
    // coverage as total — out-of-scope files would silently vanish from
    // predicate reads. (k/g registered nothing here because the rewrite
    // was scoped and they were previously unregistered.)
    md1.zoneRegistry.keySet should not contain "g"
    // a predicate read over the clustered column must still see BOTH
    // partitions (a partial sidecar would have pruned p=1 away entirely)
    val expected = Ktk.readTable(spark, base, "ds").filter(col("k") > 100L).count()
    Ktk.readTable(spark, base, "ds",
      predicates = Predicates.of(Seq(("k", ">", 100L)))).count() shouldBe expected
    expected should be > 0L
    // non-partition scope refuses
    intercept[IllegalArgumentException] {
      Ktk.clusterZOrder(spark, base, "ds", Seq("k"),
        scope = Predicates.of(Seq(("k", ">", 0L))))
    }
  }
}
