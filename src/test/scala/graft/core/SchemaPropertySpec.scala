package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the schema normalization/compatibility rules
  * (≙ hypothesis strategies over typed arrays, core/testing.py:73-157).
  */
class SchemaPropertySpec extends SparkSpec {

  private val primGen: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BooleanType, StringType, BinaryType, DateType, TimestampType, NullType)

  private val typeGen: Gen[DataType] =
    Gen.frequency(4 -> primGen, 1 -> primGen.map(ArrayType(_)))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 8)
    types <- Gen.listOfN(n, typeGen)
  } yield StructType(types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })

  private def check(prop: Prop, n: Int = 60): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, prop)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  test("normalizeType is idempotent") {
    check(Prop.forAll(typeGen) { t =>
      SchemaUtil.normalizeType(SchemaUtil.normalizeType(t)) == SchemaUtil.normalizeType(t)
    })
  }

  test("a normalized schema is always self-compatible") {
    check(Prop.forAll(schemaGen) { s =>
      val n = SchemaUtil.normalizeSchema(s)
      SchemaUtil.validateCompatible(n, n)
      true
    })
  }

  test("column order: payload alphabetical after partition keys") {
    check(Prop.forAll(schemaGen) { s =>
      val keys = s.fieldNames.take(1).toSeq
      val n = SchemaUtil.normalizeSchema(s, keys)
      val payload = n.fieldNames.drop(keys.size).toSeq
      n.fieldNames.take(keys.size).toSeq == keys && payload == payload.sorted
    })
  }

  test("NullType columns are compatible with any concrete type, both ways") {
    check(Prop.forAll(schemaGen) { s =>
      val asNull = StructType(s.fields.map(_.copy(dataType = NullType)))
      SchemaUtil.validateCompatible(s, asNull)
      SchemaUtil.validateCompatible(asNull, s)
      // merge resolves NullType toward the concrete side
      val merged = SchemaUtil.mergeSchemas(asNull, s)
      merged.fields.zip(s.fields).forall { case (m, o) => m.dataType == o.dataType }
    })
  }

  test("incompatible concrete types are rejected with a diff-style message") {
    val a = StructType(Seq(StructField("x", LongType)))
    val b = StructType(Seq(StructField("x", StringType)))
    val e = intercept[IllegalArgumentException](SchemaUtil.validateCompatible(a, b))
    e.getMessage should include("column 'x'")
    e.getMessage should include("bigint")
    e.getMessage should include("string")
  }
}
