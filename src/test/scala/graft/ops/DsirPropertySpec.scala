package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: Dsir.importanceWeights must agree (to float tolerance)
  * with a sequential reference — tokenize, uni+bigram, md5-bucket, add-1
  * smoothed raw/target counts, per-doc log-ratio sum — on arbitrary small-
  * vocabulary corpora, where accidental bucket collisions and repeated
  * grams exercise the counting far harder than the fixture test does.
  */
class DsirPropertySpec extends SparkSpec {
  import spark.implicits._

  private val B = 64 // tiny bucket space: collisions guaranteed
  private val word: Gen[String] = Gen.oneOf("a", "bb", "c", "d", "ee", "f")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def bucket(t: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(d.take(15), 16) % B).toInt
  }

  private def grams(text: String): Seq[Int] = {
    val toks = Option(text).getOrElse("").toLowerCase.trim
      .split("\\s+").filter(_.nonEmpty).toSeq
    (toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))).map(bucket)
  }

  private def reference(corpus: Seq[(Long, String)], target: Seq[String]): Map[Long, Double] = {
    val raw = corpus.flatMap(d => grams(d._2)).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val tgt = target.flatMap(grams).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rt = raw.values.sum; val tt = tgt.values.sum
    corpus.map { case (id, text) =>
      id -> grams(text).map { b =>
        math.log(tgt.getOrElse(b, 0.0) + 1) - math.log(tt + B) -
          math.log(raw(b) + 1) + math.log(rt + B)
      }.sum
    }.toMap
  }

  test("importanceWeights equals the sequential likelihood-ratio reference") {
    val caseGen = for {
      nDocs <- Gen.chooseNum(1, 12)
      docs <- Gen.listOfN(nDocs, docGen)
      nTgt <- Gen.chooseNum(1, 4)
      tgt <- Gen.listOfN(nTgt, docGen)
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, tgt)
    val prop = Prop.forAll(caseGen) { case (corpus, target) =>
      val got = Dsir.importanceWeights(
          corpus.toDF("id", "text"), "id", "text",
          target.map(Tuple1(_)).toDF("ttext"), "ttext",
          buckets = B)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = reference(corpus, target)
      got.keySet == want.keySet &&
        got.forall { case (id, w) => math.abs(w - want(id)) < 1e-9 }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    withClue(result.status.toString)(result.passed shouldBe true)
  }
}
