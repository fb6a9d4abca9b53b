package graft.core

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based DNF tests (≙ the reference's hypothesis suites,
  * io/testing/query_cube.py:1398-1437): the compiled Column filter must
  * agree with a reference row-by-row evaluator for arbitrary predicates.
  */
class PredicatePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(Int, Long, String)] =
    (0 until 40).map(i => (i, (i % 7).toLong, if (i % 5 == 0) null else s"s${i % 4}"))

  private lazy val df = rows.toDF("id", "k", "s").cache()

  private val opGen = Gen.oneOf("==", "!=", "<", "<=", ">", ">=")
  private val litGen: Gen[(String, String, Any)] = for {
    col <- Gen.oneOf("k", "s")
    op <- opGen
    v <- if (col == "k") Gen.choose(0L, 7L).map(x => x: Any)
         else Gen.oneOf[Any]("s0", "s1", "s2", "s3", null)
  } yield (col, op, v)

  private val predGen: Gen[List[List[(String, String, Any)]]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(litGen).map(_.take(3))).map(_.take(3))

  private def evalRow(row: (Int, Long, String), p: Seq[Seq[(String, String, Any)]]): Boolean =
    p.exists(_.forall { case (c, op, v) =>
      val cell: Any = if (c == "k") row._2 else row._3
      (op, v) match {
        case ("==", null) => cell == null
        case ("!=", null) => cell != null
        case (_, null)    => false
        case (o, value) =>
          if (cell == null) false
          else {
            val cmp = (cell, value) match {
              case (a: Long, b: Long)     => a.compareTo(b)
              case (a: String, b: String) => a.compareTo(b)
              case _                      => 0
            }
            o match {
              case "==" => cmp == 0
              case "!=" => cmp != 0
              case "<"  => cmp < 0
              case "<=" => cmp <= 0
              case ">"  => cmp > 0
              case ">=" => cmp >= 0
            }
          }
      }
    })

  private def check(prop: Prop, n: Int = 40): Unit = {
    // fixed seed: deterministic across runs (driver CI must not flake)
    val params = SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("compiled DNF filter == row-by-row reference evaluator") {
    check(Prop.forAll(predGen) { p0 =>
      // drop malformed combos the API rejects (ordering op on null)
      val p = p0.map(_.filterNot { case (_, op, v) => v == null && op != "==" && op != "!=" })
        .filter(_.nonEmpty)
      if (p.isEmpty) true
      else {
        val pred = Predicates.of(p: _*)
        val got = df.filter(pred.toColumn).select("id").collect().map(_.getInt(0)).toSet
        val want = rows.filter(r => evalRow(r, p)).map(_._1).toSet
        got == want
      }
    })
  }

  test("hashed IN lookup == linear compare scan for every value mix") {
    // the >=8-value fast path must agree with the linear reference on
    // string candidates across numeric strings, plain strings, booleans,
    // dates, longs, doubles and nulls (the compare() coercion tower)
    val mixGen: Gen[Any] = Gen.oneOf(
      Gen.choose(-100L, 100L).map(x => x: Any),
      Gen.choose(-10.0, 10.0).map(x => math.rint(x * 4) / 4: Any),
      Gen.oneOf("a", "b", "7", "7.0", "true", "x y").map(x => x: Any),
      Gen.oneOf(true, false).map(x => x: Any),
      Gen.const(java.sql.Date.valueOf("2026-01-15"): Any),
      Gen.const(null: Any))
    val candGen: Gen[String] = Gen.oneOf(
      "a", "b", "c", "7", "7.0", "-3", "true", "x y", "2026-01-15", "0.25")
    def linear(vs: Seq[Any], v: String): Boolean =
      vs.exists(x => if (x == null) false
        else Predicates.evalLiteral(PredLiteral("c", PredOp.Eq, x), v))
    check(Prop.forAll(Gen.listOfN(12, mixGen), candGen) { (vs, cand) =>
      Predicates.evalLiteral(PredLiteral("c", PredOp.In, vs), cand) == linear(vs, cand)
    })
    // null candidate matches iff the list carries null (both paths)
    val withNull = PredLiteral("c", PredOp.In, Seq("a", null, "b", 1L, 2L, 3L, 4L, 5L))
    Predicates.evalLiteral(withNull, null) shouldBe true
    val noNull = PredLiteral("c", PredOp.In, Seq("a", "b", 1L, 2L, 3L, 4L, 5L, 6L))
    Predicates.evalLiteral(noNull, null) shouldBe false
  }

  test("urlcodec quote/unquote roundtrip for arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr)(s => UrlCodec.unquote(UrlCodec.quote(s)) == s), 60)
    check(Prop.forAll(Gen.listOf(Gen.choose(0x20.toChar, 0x2FF.toChar)).map(_.mkString))(
      s => UrlCodec.unquote(UrlCodec.quote(s)) == s))
  }
}
