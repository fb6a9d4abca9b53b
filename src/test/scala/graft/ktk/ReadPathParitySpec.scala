package graft.ktk

import graft.SparkSpec
import graft.core.Predicates
import org.apache.spark.sql.functions._

/** The reference's signature test pattern, re-expressed: identical results
  * from every access path over the same dataset (its backend-parametrized
  * suites under kartothek/io/testing/). Our "backends" are the direct Ktk
  * API, the DataSource V2 connector, the iterator read, dispatch_by
  * regrouping, and the indexOn sorted layout — all must agree row-for-row
  * under the same predicates.
  */
class ReadPathParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val b = tmpDir("parity")
    val df = (0 until 400).map { i =>
      (i.toLong, i % 4, s"tag${i % 7}", i * 1.5, if (i % 11 == 0) None else Some(s"s$i"))
    }.toDF("id", "p", "tag", "x", "opt")
    Ktk.store(spark, b, "ds", df, partitionOn = Seq("p"),
      secondaryIndices = Seq("tag"), zoneMapFor = Seq("x"))
    b
  }

  private val predicateCases = Seq(
    "none" -> Predicates.empty,
    "partition" -> Predicates.of(Seq(("p", "==", 2))),
    "index" -> Predicates.of(Seq(("tag", "==", "tag3"))),
    "zone" -> Predicates.of(Seq(("x", ">", 300.0))),
    "mixed" -> Predicates.of(Seq(("p", "in", Seq(1, 3)), ("tag", "!=", "tag0"), ("x", "<=", 500.0))),
    "null" -> Predicates.of(Seq(("opt", "==", null))),
    "disjunction" -> Predicates.of(Seq(("p", "==", 0)), Seq(("x", ">=", 580.0))))

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().sorted.toSeq

  test("Ktk API, DSv2, iterator, dispatchBy and indexOn agree on every predicate") {
    for ((name, preds) <- predicateCases) {
      val direct = ids(Ktk.readTable(spark, base, "ds", predicates = preds))
      withClue(s"case '$name': ") {
        // DSv2: push the equivalent Catalyst filter through format("graft")
        val dsv2 = spark.read.format("graft").option("uuid", "ds").load(base)
          .filter(preds.toColumn)
        ids(dsv2) shouldBe direct
        // iterator backend
        Ktk.readTableAsIterator(spark, base, "ds", predicates = preds)
          .map(_.getAs[Long]("id")).toSeq.sorted shouldBe direct
        // dispatch_by regrouping must not change content
        ids(Ktk.readTable(spark, base, "ds", predicates = preds,
          dispatchBy = Seq("tag"))) shouldBe direct
        // indexOn sorted layout must not change content
        ids(Ktk.readTable(spark, base, "ds", predicates = preds,
          indexOn = Some("x"))) shouldBe direct
      }
    }
  }
}
