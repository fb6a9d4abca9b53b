package graft.cube

import graft.SparkSpec

/** The reference's OWN golden cube fixtures, transcribed data + expected
  * output (kartothek/io/testing/query_cube.py:85-378: `fullrange_data` /
  * `fullrange_df`, `sparse_outer_data` / `sparse_outer_df`,
  * `massive_partitions_data` / `massive_partitions_df`) — our Cube must
  * reproduce the reference's query results on its own test cases.
  */
class CubeReferenceFixturesSpec extends SparkSpec {
  import spark.implicits._

  private val cube = CubeDef("reffix",
    dimensionColumns = Seq("x", "y", "z"), partitionColumns = Seq("p", "q"))

  private def row(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("x", "y", "z", "p", "q")
      .select("x", "y", "z", "p", "q", "v1", "v2", "v3")
      .collect().map(_.toSeq.map {
        case null => null
        case n: Number => n.longValue()
        case other => other
      }.toSeq).toSeq

  test("fullrange: dense + sparse enrichments join back to the expected frame") {
    val base = tmpDir("reffix")
    val xs = Seq(0, 1, 0, 1, 0, 1, 0, 1, 2, 3, 2, 3, 2, 3, 2, 3)
    val ys = Seq(0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2, 3, 3)
    val ps = Seq(0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1)
    val qs = Seq(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1)
    val seed = xs.indices.map(i => (xs(i), ys(i), 0, ps(i), qs(i), i, i))
      .toDF("x", "y", "z", "p", "q", "v1", "i1")
    val dense = xs.indices.map(i => (xs(i), ys(i), 0, ps(i), qs(i), i, i))
      .toDF("x", "y", "z", "p", "q", "v2", "i2")
    val sparse = Seq(
      (0, 0, 0, 0, 0, 0), (1, 0, 0, 0, 1, 1), (2, 0, 1, 0, 2, 2), (3, 0, 1, 0, 3, 3),
      (0, 0, 0, 1, 4, 4), (1, 0, 0, 1, 5, 5), (2, 0, 1, 1, 6, 6), (3, 0, 1, 1, 7, 7)
    ).toDF("y", "z", "p", "q", "v3", "i3")
    Cube.build(spark, base, cube,
      Map("seed" -> seed, "enrich_dense" -> dense, "enrich_sparse" -> sparse))

    val expectedV3 = Seq(0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7)
    val expected = xs.indices.map(i =>
      Seq[Any](xs(i).toLong, ys(i).toLong, 0L, ps(i).toLong, qs(i).toLong,
        i.toLong, i.toLong, expectedV3(i).toLong))
      .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long]))
    row(Cube.query(spark, base, cube)) shouldBe expected
  }

  test("sparse_outer: missing enrichment cells stay as nulls (left join)") {
    val base = tmpDir("reffix")
    val seed = Seq(
      (0, 0, 0, 0, 0, 0, 0), (1, 0, 0, 1, 0, 3, 3), (0, 1, 0, 2, 0, 7, 7)
    ).toDF("x", "y", "z", "p", "q", "v1", "i1")
    val dense = Seq(
      (0, 0, 0, 0, 0, 0, 0), (0, 1, 0, 2, 0, 7, 7)
    ).toDF("x", "y", "z", "p", "q", "v2", "i2")
    val sparse = Seq(
      (0, 0, 0, 0, 0, 0), (0, 0, 1, 0, 3, 3)
    ).toDF("y", "z", "p", "q", "v3", "i3")
    Cube.build(spark, base, cube,
      Map("seed" -> seed, "enrich_dense" -> dense, "enrich_sparse" -> sparse))

    row(Cube.query(spark, base, cube)) shouldBe Seq(
      Seq[Any](0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
      Seq[Any](0L, 1L, 0L, 2L, 0L, 7L, 7L, null),
      Seq[Any](1L, 0L, 0L, 1L, 0L, 3L, null, 3L))
  }

  test("massive_partitions: 17 single-row partitions reassemble exactly") {
    val base = tmpDir("reffix")
    val n = 17
    val seed = (0 until n).map(i => (i, i, i, i, i, i, i))
      .toDF("x", "y", "z", "p", "q", "v1", "i1")
    val d1 = (0 until n).map(i => (i, i, i, i, i, i, i))
      .toDF("x", "y", "z", "p", "q", "v2", "i2")
    val d2 = (0 until n).map(i => (i, i, i, i, i, i, i))
      .toDF("x", "y", "z", "p", "q", "v3", "i3")
    Cube.build(spark, base, cube,
      Map("seed" -> seed, "enrich_1" -> d1, "enrich_2" -> d2))
    val md = graft.ktk.DatasetMetadata.load(spark, base, s"${cube.uuidPrefix}++seed")
    md.partitions.size should be >= n // one dir per (p, q) pair at minimum
    row(Cube.query(spark, base, cube)) shouldBe
      (0 until n).map(i => Seq.fill(8)(i.toLong: Any).toSeq)
  }
}
