package graft.core

import graft.SparkSpec

/** DNF semantics matrix from the reference's filter tests
  * (tests/serialization/test_filter.py, _generic.py:477-521).
  */
class PredicatesSpec extends SparkSpec {
  import spark.implicits._

  test("reference filter edge matrix: bool columns with nulls, typed date literals") {
    // ≙ tests/serialization/test_filter.py:178-199 (bool + None) and
    // :128-146 (date literal against a datetime column)
    val b = Seq((Option(true), 1L), (Option(false), 2L), (Option.empty[Boolean], 3L), (Option(true), 4L))
      .toDF("b", "i")
    b.filter(Predicates.of(Seq(("b", "==", true))).toColumn)
      .select("i").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 4L)
    // != true excludes nulls (pandas semantics)
    b.filter(Predicates.of(Seq(("b", "!=", true))).toColumn)
      .select("i").as[Long].collect().toSeq shouldBe Seq(2L)
    val ts = Seq(
      (java.sql.Timestamp.valueOf("2019-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2019-01-02 00:00:00"), 2L)).toDF("t", "i")
    // java.sql.Date literal against a timestamp column coerces like the
    // reference's normalize_value
    ts.filter(Predicates.of(Seq(("t", "==", java.sql.Date.valueOf("2019-01-01")))).toColumn)
      .select("i").as[Long].collect().toSeq shouldBe Seq(1L)
    ts.filter(Predicates.of(Seq(("t", ">", java.sql.Timestamp.valueOf("2019-01-01 12:00:00")))).toColumn)
      .select("i").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  test("C() condition sugar compiles to the DNF predicate core") {
    val p = ((C("a") === 1) & C("b").inInterval(10, 20)).toPredicates
    p.disjunction shouldBe Seq(Seq(
      PredLiteral("a", PredOp.Eq, 1),
      PredLiteral("b", PredOp.Ge, 10),
      PredLiteral("b", PredOp.Lt, 20)))
    // one-sided intervals per conditions.py predicate_part
    C("x").inInterval(stop = 5).toPredicates.disjunction.head shouldBe
      Seq(PredLiteral("x", PredOp.Lt, 5))
    C("x").inInterval(start = 5).toPredicates.disjunction.head shouldBe
      Seq(PredLiteral("x", PredOp.Ge, 5))
    an[IllegalArgumentException] should be thrownBy C("x").inInterval()
    // `|` builds a 2-conjunction disjunction (beyond the reference's C)
    ((C("a") === 1) | (C("b") > 2)).disjunction.size shouldBe 2
    // other ops map one-to-one
    (C("t").isIn(Seq("u", "v"))).toPredicates.disjunction.head.head.op shouldBe PredOp.In
    (C("t") =!= 3).toPredicates.disjunction.head.head.op shouldBe PredOp.Ne
  }

  private def df = Seq(
    (1, Some("a"), Some(1.0)),
    (2, Some("b"), None),
    (3, None, Some(3.0)),
    (4, Some("d"), Some(4.0))
  ).toDF("id", "s", "x")

  private def ids(p: Predicates): Seq[Int] =
    df.filter(p.toColumn).select("id").collect().map(_.getInt(0)).sorted.toSeq

  test("== on value excludes nulls") {
    ids(Predicates.of(Seq(("s", "==", "a")))) shouldBe Seq(1)
  }
  test("== null matches nulls") {
    ids(Predicates.of(Seq(("s", "==", null)))) shouldBe Seq(3)
  }
  test("!= null matches non-nulls") {
    ids(Predicates.of(Seq(("s", "!=", null)))) shouldBe Seq(1, 2, 4)
  }
  test("!= value excludes nulls (pandas semantics)") {
    ids(Predicates.of(Seq(("s", "!=", "a")))) shouldBe Seq(2, 4)
  }
  test("in with null matches nulls") {
    ids(Predicates.of(Seq(("s", "in", Seq("a", null))))) shouldBe Seq(1, 3)
  }
  test("empty in matches nothing") {
    ids(Predicates.of(Seq(("s", "in", Seq.empty[Any])))) shouldBe Seq()
  }
  test("in with duplicates does not duplicate rows") {
    ids(Predicates.of(Seq(("s", "in", Seq("a", "a"))))) shouldBe Seq(1)
  }
  test("ordering op with null value rejects") {
    an[IllegalArgumentException] should be thrownBy
      Predicates.of(Seq(("x", ">", null))).toColumn
  }
  test("disjunction of conjunctions") {
    ids(Predicates.of(Seq(("id", "<=", 1)), Seq(("s", "==", "d"), ("x", ">=", 4.0)))) shouldBe Seq(1, 4)
  }
  test("ordering excludes nulls") {
    ids(Predicates.of(Seq(("x", ">", 0.0)))) shouldBe Seq(1, 3, 4)
  }
  test("restrictToColumns drops foreign literals; vacuous conj => None") {
    val p = Predicates.of(Seq(("a", "==", 1), ("b", "==", 2)), Seq(("b", "==", 3)))
    p.restrictToColumns(Set("a")) shouldBe None // second conj becomes vacuous true
    val q = Predicates.of(Seq(("a", "==", 1), ("b", "==", 2)))
    q.restrictToColumns(Set("a")).get shouldBe Predicates.of(Seq(("a", "==", 1)))
  }
  test("matchesValues driver-side eval with string-decoded values") {
    val p = Predicates.of(Seq(("p", "==", 1), ("q", ">", 5)))
    p.matchesValues(Map("p" -> "1", "q" -> "7")) shouldBe true
    p.matchesValues(Map("p" -> "2", "q" -> "7")) shouldBe false
    p.matchesValues(Map("p" -> "1")) shouldBe true // missing col indeterminate => keep
  }
  test("urlcodec roundtrip") {
    val s = "a b/c=д%1"
    UrlCodec.unquote(UrlCodec.quote(s)) shouldBe s
    UrlCodec.quote("a b") shouldBe "a%20b"
    UrlCodec.partitionPath(Seq("p" -> "x y", "q" -> "1")) shouldBe "p=x%20y/q=1"
  }
}
