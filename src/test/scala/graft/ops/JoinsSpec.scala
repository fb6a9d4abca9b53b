package graft.ops

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left ts") {
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 25L, 200.0), ("A", 5L, 50.0), ("B", 12L, 99.0)
    ).toDF("sym", "t", "qty")
    val quotes = Seq(
      ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0), ("B", 30L, 9.0)
    ).toDF("sym", "qt", "price")

    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt", Seq("price"))
      .orderBy("sym", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) null else r.getDouble(3)))
    out.toSeq shouldBe Seq(
      ("A", 5L, null),   // before any quote
      ("A", 10L, 2.0),   // inclusive: quote at exactly t=10 wins
      ("A", 25L, 3.0),   // latest quote <= 25
      ("B", 12L, null))  // B's only quote is later
  }

  test("asofJoin keeps all left columns and rows") {
    val l = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 50L, 7.7)).toDF("k", "rt", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v"))
    out.columns.toSeq shouldBe Seq("k", "t", "tag", "v")
    out.collect().head.getDouble(3) shouldBe 7.7
  }

  test("asofJoin: a right row with NULL payload wins over an earlier non-null row") {
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val r = Seq((1L, 50L, Some(7.7)), (1L, 150L, Option.empty[Double])).toDF("k", "rt", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v")).orderBy("t").collect()
    out(0).getDouble(2) shouldBe 7.7
    // the latest right row at t<=200 is rt=150 whose payload is NULL — it is
    // the as-of match and must NOT be skipped in favor of the rt=50 value
    out(1).isNullAt(2) shouldBe true
  }

  test("rangeJoin matches rows inside [start, end) across chunk boundaries") {
    val events = Seq(
      (1L, 5L), (1L, 10L), (1L, 19L), (1L, 20L), (1L, 35L), (2L, 10L)
    ).toDF("k", "t")
    val intervals = Seq(
      (1L, 10L, 20L, "A"),  // spans chunks 1..1 at chunk=10
      (1L, 5L, 36L, "B"),   // spans several chunks
      (1L, 7L, 7L, "EMPTY"),
      (2L, 0L, 11L, "C")
    ).toDF("k", "s", "e", "tag")
    val out = Joins.rangeJoin(events, intervals, Seq("k"), "t", "s", "e", chunk = 10)
      .select("k", "t", "tag").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    out shouldBe Set(
      (1L, 10L, "A"), (1L, 19L, "A"),              // [10,20): 10 in, 20 out
      (1L, 5L, "B"), (1L, 10L, "B"), (1L, 19L, "B"), (1L, 20L, "B"), (1L, 35L, "B"),
      (2L, 10L, "C"))
    // no duplicate pairs despite multi-chunk intervals
    Joins.rangeJoin(events, intervals, Seq("k"), "t", "s", "e", chunk = 3)
      .select("k", "t", "tag").count() shouldBe 8
  }

  test("saltedJoin equals the plain join for inner and left") {
    val big = (0 until 500).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v") // hot keys
    val small = Seq((0L, "a"), (1L, "b"), (9L, "z")).toDF("k", "name")
    val plainInner = big.join(small, Seq("k")).collect().map(_.toSeq).toSet
    Joins.saltedJoin(big, small, Seq("k"), salt = 4)
      .collect().map(_.toSeq).toSet shouldBe plainInner
    val plainLeft = big.join(small, Seq("k"), "left").collect().map(_.toSeq).toSet
    Joins.saltedJoin(big, small, Seq("k"), salt = 4, how = "left")
      .collect().map(_.toSeq).toSet shouldBe plainLeft
  }

  test("asofJoin: all payload columns come from the SAME right row") {
    val l = Seq((1L, 200L)).toDF("k", "t")
    val r = Seq(
      (1L, 50L, Some("a"), Option.empty[String]),
      (1L, 150L, Option.empty[String], Some("b"))).toDF("k", "rt", "p1", "p2")
    val out = Joins.asofJoin(l, r, Seq("k"), "t", "rt", Seq("p1", "p2")).collect().head
    // match is the rt=150 row: (null, "b") — never the cross-row mix ("a", "b")
    out.isNullAt(2) shouldBe true
    out.getString(3) shouldBe "b"
  }
}
