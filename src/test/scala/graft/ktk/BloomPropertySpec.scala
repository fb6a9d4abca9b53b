package graft.ktk

import graft.SparkSpec
import graft.core.Predicates

/** Property net for Bloom-sidecar pruning: for MANY random equality/IN
  * predicates over mixed types (long, string; with nulls; values present
  * and absent), a bloom-registered dataset read must return exactly the
  * rows of the raw DataFrame filter — pruning may only skip files, never
  * rows. False positives are allowed (they cost IO, not correctness);
  * false negatives are the bug class this net exists to catch.
  */
class BloomPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val (base, raw) = {
    val b = tmpDir("bloomprop")
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      val k = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(150).toLong * 3)
      val s = if (rnd.nextInt(9) == 0) None else Some(f"tok${rnd.nextInt(60)}%03d")
      (i.toLong, i % 3, k, s)
    }.toDF("id", "p", "k", "s")
    Ktk.store(spark, b, "bp", rows, partitionOn = Seq("p"), bloomFor = Seq("k", "s"))
    (b, rows)
  }

  private def check(preds: Predicates, tag: String): Unit = {
    val got = Ktk.readTable(spark, base, "bp", predicates = preds)
      .select("id").as[Long].collect().sorted.toSeq
    val want = raw.filter(preds.toColumn).select("id").as[Long].collect().sorted.toSeq
    withClue(s"$tag / $preds: ") { got shouldBe want }
  }

  test("random Eq/In literals (present, absent, null, mixed types) match the raw filter") {
    val rnd = new scala.util.Random(29)
    for (i <- 0 until 40) {
      val (colName, value): (String, Any) = rnd.nextInt(4) match {
        case 0 => ("k", rnd.nextInt(500).toLong)            // maybe present
        case 1 => ("k", rnd.nextInt(500))                   // int literal on bigint
        case 2 => ("s", f"tok${rnd.nextInt(80)}%03d")       // maybe present
        case _ => ("s", s"absent-$i")                       // never present
      }
      check(Predicates.of(Seq((colName, "==", value))), s"eq-$colName")
    }
    for (_ <- 0 until 20) {
      val vals = Seq.fill(1 + new scala.util.Random(31).nextInt(6))(
        rnd.nextInt(500).toLong: Any)
      check(Predicates.of(Seq(("k", "in", vals))), "in-k")
    }
    // null cases: never index/bloom-prunable, must still be exact
    check(Predicates.of(Seq(("k", "==", null))), "k-null")
    check(Predicates.of(Seq(("s", "in", Seq("tok001", null)))), "s-in-null")
    // conjunction across both bloom columns + disjunction union
    check(Predicates.of(Seq(("k", "==", 30L), ("s", "==", "tok010"))), "conj")
    check(Predicates.of(Seq(("k", "==", 30L)), Seq(("s", "==", "tok010"))), "disj")
    // large IN through bloom + batch literal hashing
    check(Predicates.of(Seq(("k", "in", (0 until 200).map(_.toLong * 5: Any)))), "in-large")
  }
}
