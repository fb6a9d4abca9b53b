package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: Decontamination.decontaminateParagraphs must agree with
  * a sequential reference (drop a paragraph iff one of its lowercase word
  * n-grams appears in any benchmark document's gram set; rebuild docs
  * from survivors in order, dropping fully-contaminated docs) on
  * arbitrary corpora over a small vocabulary — dense accidental overlaps
  * exercise the gram matching far harder than the fixture gate does.
  */
class DecontaminationPropertySpec extends SparkSpec {
  import spark.implicits._

  private val N = 3
  private val word: Gen[String] = Gen.oneOf("a", "b", "c", "dd", "E")
  private val paraGen: Gen[String] =
    Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, paraGen)).map(_.mkString("\n"))
  // ~10% NULL texts: the operator must keep them (as empty docs, the
  // blank-paragraph rule) rather than letting posexplode(split(null))
  // silently drop the rows
  private val docOrNullGen: Gen[String] =
    Gen.frequency(9 -> docGen, 1 -> Gen.const(null: String))

  private def grams(text: String): Set[String] = {
    val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < N) Set.empty
    else toks.sliding(N).map(_.mkString(" ")).toSet
  }

  private def reference(corpus: Seq[(Long, String)], bench: Seq[String]): Map[Long, String] = {
    val bg = bench.flatMap(grams).toSet
    corpus.flatMap { case (id, text) =>
      val kept = Option(text).getOrElse("")
        .split("\n", -1).filter(p => grams(p).intersect(bg).isEmpty)
      if (kept.isEmpty) None else Some(id -> kept.mkString("\n"))
    }.toMap
  }

  test("decontaminateParagraphs equals the sequential gram-set reference") {
    val caseGen = for {
      nDocs <- Gen.chooseNum(1, 10)
      docs <- Gen.listOfN(nDocs, docOrNullGen)
      nBench <- Gen.chooseNum(1, 3)
      bench <- Gen.listOfN(nBench, docGen)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, bench)
    val prop = Prop.forAll(caseGen) { case (corpus, bench) =>
      val got = Decontamination.decontaminateParagraphs(
          corpus.toDF("id", "text"), "id", "text",
          bench.map(Tuple1(_)).toDF("btext"), "btext", n = N)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == reference(corpus, bench)
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    withClue(result.status.toString)(result.passed shouldBe true)
  }

  test("empty benchmark is the identity: every document survives verbatim") {
    val corpus = Seq((1L, "a b c\n\nE dd a"), (2L, "")).toDF("id", "text")
    val bench = Seq.empty[Tuple1[String]].toDF("btext")
    Decontamination.decontaminateParagraphs(corpus, "id", "text", bench, "btext", n = N)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap shouldBe
      Map(1L -> "a b c\n\nE dd a", 2L -> "")
  }
}
