package graft.cube

import graft.SparkSpec
import graft.core.Predicates
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized cube-query property suite — the reference's hypothesis twin
  * (io/testing/query_cube.py:1398-1437): arbitrary condition sets
  * (including null ops and in_interval pairs) × payload projections ×
  * partition_by choices over the fullrange and sparse_outer fixture
  * cubes, each checked against an in-memory join/overlay reference
  * evaluator that mirrors the documented query semantics independently:
  * per-dataset restricted pre-filter (restrictToColumns: a conjunction
  * emptied by restriction makes the whole predicate vacuous), inner joins
  * for restrictive datasets (conditions or partition_by touching an
  * exclusive payload column) before left joins for the rest, shared-KEY
  * equi-join columns only, exact full-condition residual re-filter over
  * the joined rows (left-join nulls fail non-null literals), then
  * keys ++ payload projection.
  */
class CubeQueryPropertySpec extends SparkSpec {
  import spark.implicits._

  private val cubeDef = CubeDef("proptest",
    dimensionColumns = Seq("x", "y", "z"), partitionColumns = Seq("p", "q"))

  // ---------------------------------------------------------------- fixtures

  /** One fixture = dataset name -> (schema column order, in-memory rows). */
  private type Fixture = Map[String, (Seq[String], Seq[Map[String, Any]])]

  private def rowsOf(cols: Seq[String], tuples: Seq[Seq[Int]]): (Seq[String], Seq[Map[String, Any]]) =
    (cols, tuples.map(t => cols.zip(t.map(v => v: Any)).toMap))

  private lazy val fullrange: (String, Fixture) = {
    val base = tmpDir("cubeprop-full")
    val xs = Seq(0, 1, 0, 1, 0, 1, 0, 1, 2, 3, 2, 3, 2, 3, 2, 3)
    val ys = Seq(0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2, 3, 3)
    val ps = Seq(0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1)
    val qs = Seq(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1)
    val seedT = xs.indices.map(i => Seq(xs(i), ys(i), 0, ps(i), qs(i), i, i))
    val denseT = xs.indices.map(i => Seq(xs(i), ys(i), 0, ps(i), qs(i), i * 2, i * 3))
    val sparseT = Seq(
      Seq(0, 0, 0, 0, 0, 0), Seq(1, 0, 0, 0, 1, 1), Seq(2, 0, 1, 0, 2, 2),
      Seq(3, 0, 1, 0, 3, 3), Seq(0, 0, 0, 1, 4, 4), Seq(1, 0, 0, 1, 5, 5),
      Seq(2, 0, 1, 1, 6, 6), Seq(3, 0, 1, 1, 7, 7))
    val seed = seedT.map { case Seq(a, b, c, d, e, f, g) => (a, b, c, d, e, f, g) }
      .toDF("x", "y", "z", "p", "q", "v1", "i1")
    val dense = denseT.map { case Seq(a, b, c, d, e, f, g) => (a, b, c, d, e, f, g) }
      .toDF("x", "y", "z", "p", "q", "v2", "i2")
    val sparse = sparseT.map { case Seq(a, b, c, d, e, f) => (a, b, c, d, e, f) }
      .toDF("y", "z", "p", "q", "v3", "i3")
    Cube.build(spark, base, cubeDef,
      Map("seed" -> seed, "enrich_dense" -> dense, "enrich_sparse" -> sparse))
    base -> Map(
      "seed" -> rowsOf(Seq("x", "y", "z", "p", "q", "v1", "i1"), seedT),
      "enrich_dense" -> rowsOf(Seq("x", "y", "z", "p", "q", "v2", "i2"), denseT),
      "enrich_sparse" -> rowsOf(Seq("y", "z", "p", "q", "v3", "i3"), sparseT))
  }

  private lazy val sparseOuter: (String, Fixture) = {
    val base = tmpDir("cubeprop-sparse")
    val seedT = Seq(Seq(0, 0, 0, 0, 0, 0, 0), Seq(1, 0, 0, 1, 0, 3, 3), Seq(0, 1, 0, 2, 0, 7, 7))
    val denseT = Seq(Seq(0, 0, 0, 0, 0, 0, 0), Seq(0, 1, 0, 2, 0, 7, 7))
    val sparseT = Seq(Seq(0, 0, 0, 0, 0, 0), Seq(0, 0, 1, 0, 3, 3))
    val seed = seedT.map { case Seq(a, b, c, d, e, f, g) => (a, b, c, d, e, f, g) }
      .toDF("x", "y", "z", "p", "q", "v1", "i1")
    val dense = denseT.map { case Seq(a, b, c, d, e, f, g) => (a, b, c, d, e, f, g) }
      .toDF("x", "y", "z", "p", "q", "v2", "i2")
    val sparse = sparseT.map { case Seq(a, b, c, d, e, f) => (a, b, c, d, e, f) }
      .toDF("y", "z", "p", "q", "v3", "i3")
    Cube.build(spark, base, cubeDef,
      Map("seed" -> seed, "enrich_dense" -> dense, "enrich_sparse" -> sparse))
    base -> Map(
      "seed" -> rowsOf(Seq("x", "y", "z", "p", "q", "v1", "i1"), seedT),
      "enrich_dense" -> rowsOf(Seq("x", "y", "z", "p", "q", "v2", "i2"), denseT),
      "enrich_sparse" -> rowsOf(Seq("y", "z", "p", "q", "v3", "i3"), sparseT))
  }

  // ------------------------------------------------- reference evaluator

  private case class Lit(col: String, op: String, v: Any)

  private def cmp(a: Any, b: Any): Int =
    (a, b) match { case (x: Int, y: Int) => x.compareTo(y); case _ => 0 }

  private def evalLit(cell: Any, l: Lit): Boolean = (l.op, l.v) match {
    case ("==", null) => cell == null
    case ("!=", null) => cell != null
    case ("in", vs: Seq[_]) =>
      if (cell == null) vs.contains(null)
      else vs.filter(_ != null).exists(v => cmp(cell, v) == 0)
    case (_, null) => false
    case (op, v) =>
      if (cell == null) false
      else {
        val c = cmp(cell, v)
        op match {
          case "==" => c == 0
          case "!=" => c != 0
          case "<"  => c < 0
          case "<=" => c <= 0
          case ">"  => c > 0
          case ">=" => c >= 0
        }
      }
  }

  private def evalDnf(row: Map[String, Any], dnf: Seq[Seq[Lit]]): Boolean =
    dnf.isEmpty || dnf.exists(_.forall(l => evalLit(row.getOrElse(l.col, null), l)))

  /** restrictToColumns semantics: drop foreign literals per conjunction;
    * an emptied conjunction makes the whole predicate vacuously true.
    */
  private def restrict(dnf: Seq[Seq[Lit]], cols: Set[String]): Seq[Seq[Lit]] = {
    if (dnf.isEmpty) return Nil
    val r = dnf.map(_.filter(l => cols.contains(l.col)))
    if (r.exists(_.isEmpty)) Nil else r
  }

  private def refQuery(fixture: Fixture, dnf: Seq[Seq[Lit]],
      payload: Seq[String], partitionBy: Seq[String]): Seq[Seq[Any]] = {
    val keys = cubeDef.dimensionColumns ++ cubeDef.partitionColumns
    val keySet = keys.toSet
    val maskCols = dnf.flatten.map(_.col).toSet ++ partitionBy
    val restrictive = fixture.collect {
      case (n, (schema, _)) if n != "seed" &&
        maskCols.exists(c => schema.contains(c) && !keySet.contains(c)) => n
    }.toSet
    def load(n: String): Seq[Map[String, Any]] = {
      val (schema, rows) = fixture(n)
      val r = restrict(dnf, schema.toSet)
      rows.filter(row => evalDnf(row, r))
    }
    var acc = load("seed")
    var accCols = fixture("seed")._1
    val ordered = (fixture.keySet - "seed").toSeq.sorted
      .sortBy(n => (!restrictive.contains(n), n))
    for (n <- ordered) {
      val (schema, _) = fixture(n)
      val right = load(n)
      val shared = accCols.filter(c => schema.contains(c) && keySet.contains(c))
      val rightOnly = schema.filterNot(accCols.contains)
      val idx = right.groupBy(r => shared.map(r(_)))
      val inner = restrictive.contains(n)
      acc = acc.flatMap { a =>
        idx.get(shared.map(a(_))) match {
          case Some(ms) => ms.map(m => a ++ m.view.filterKeys(rightOnly.contains).toMap)
          case None =>
            if (inner) Nil else Seq(a ++ rightOnly.map(_ -> (null: Any)).toMap)
        }
      }
      accCols = accCols ++ rightOnly
    }
    val residual = acc.filter(row => evalDnf(row, dnf))
    val outCols =
      if (payload.isEmpty) keys ++ accCols.filterNot(keySet.contains).sorted
      else keys ++ payload.distinct.filterNot(keySet.contains)
    residual.map(row => outCols.map(c => row.getOrElse(c, null)))
  }

  // ------------------------------------------------------------ generators

  private val allCols = Seq("x", "y", "z", "p", "q", "v1", "i1", "v2", "i2", "v3", "i3")
  private val payloadCols = Seq("v1", "i1", "v2", "i2", "v3", "i3")

  private val valueGen: Gen[Int] = Gen.choose(0, 8)
  private val litGen: Gen[Seq[Lit]] = Gen.frequency(
    // plain comparison
    7 -> (for {
      c <- Gen.oneOf(allCols); op <- Gen.oneOf("==", "!=", "<", "<=", ">", ">=")
      v <- valueGen
    } yield Seq(Lit(c, op, v))),
    // null ops
    2 -> (for {
      c <- Gen.oneOf(allCols); op <- Gen.oneOf("==", "!=")
    } yield Seq(Lit(c, op, null))),
    // in list, sometimes with null
    3 -> (for {
      c <- Gen.oneOf(allCols)
      vs <- Gen.nonEmptyListOf(Gen.frequency(8 -> valueGen.map(v => v: Any),
        1 -> Gen.const(null: Any))).map(_.take(4))
    } yield Seq(Lit(c, "in", vs))),
    // in_interval start/stop pair (C(col).inInterval form)
    2 -> (for {
      c <- Gen.oneOf(allCols); lo <- Gen.choose(0, 5); len <- Gen.choose(0, 5)
    } yield Seq(Lit(c, ">=", lo), Lit(c, "<", lo + len))))

  private val dnfGen: Gen[Seq[Seq[Lit]]] =
    Gen.choose(0, 2).flatMap { n =>
      Gen.listOfN(n,
        Gen.nonEmptyListOf(litGen).map(_.take(2).flatten)).map(_.map(_.toSeq).toSeq)
    }

  private val payloadGen: Gen[Seq[String]] = Gen.frequency(
    3 -> Gen.const(Seq.empty[String]),
    7 -> Gen.someOf(payloadCols).map(_.toSeq).suchThat(_.nonEmpty))

  private val partitionByGen: Gen[Seq[String]] =
    Gen.oneOf(Seq.empty[String], Seq("p"), Seq("q"), Seq("p", "q"))

  // ------------------------------------------------------------- the check

  private def normalize(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.map(_.map { case null => null; case n: Number => n.longValue(); case o => o })
      .sortBy(_.map(v => if (v == null) " " else v.toString).mkString("|"))

  private def checkOne(base: String, fixture: Fixture,
      dnf: Seq[Seq[Lit]], payload: Seq[String], partitionBy: Seq[String]): Boolean = {
    val preds =
      if (dnf.isEmpty) Predicates.empty
      else Predicates.of(dnf.map(_.map(l => (l.col, l.op, l.v))): _*)
    val got = Cube.query(spark, base, cubeDef, preds, payload, partitionBy)
      .collect().map(_.toSeq).toSeq
    val want = refQuery(fixture, dnf, payload, partitionBy)
    val ok = normalize(got) == normalize(want)
    if (!ok) {
      info(s"MISMATCH dnf=$dnf payload=$payload partitionBy=$partitionBy")
      info(s"got  = ${normalize(got).take(5)}")
      info(s"want = ${normalize(want).take(5)}")
    }
    ok
  }

  private def checkFixture(name: String, fx: => (String, Fixture), cases: Int): Unit = {
    val (base, fixture) = fx
    val params = SCTest.Parameters.default.withMinSuccessfulTests(cases)
      .withInitialSeed(org.scalacheck.rng.Seed(4242L))
    val prop = Prop.forAll(dnfGen, payloadGen, partitionByGen) {
      (dnf, payload, partitionBy) => checkOne(base, fixture, dnf, payload, partitionBy)
    }
    val res = SCTest.check(params, prop)
    withClue(s"$name: ${res.status}") { res.passed shouldBe true }
  }

  test("fullrange: 60 random condition/payload/partition_by cases == reference evaluator") {
    checkFixture("fullrange", fullrange, 60)
  }

  test("sparse_outer: 60 random cases == reference evaluator (left-join nulls)") {
    checkFixture("sparse_outer", sparseOuter, 60)
  }
}
