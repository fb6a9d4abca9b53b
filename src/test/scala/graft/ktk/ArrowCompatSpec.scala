package graft.ktk

import graft.SparkSpec
import graft.core.SchemaUtil
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-version Parquet interop (≙ tests/serialization/test_arrow_compat.py:
  * 14-60): the reference ships the SAME all-types fixture written by 13
  * historical pyarrow versions (reference-data/arrow-compat/). Our engine
  * must read every vintage, normalize it, and see identical values.
  * The fixtures are read-only inputs from the reference checkout.
  */
class ArrowCompatSpec extends SparkSpec {

  private val dir = "/root/reference/reference-data/arrow-compat"

  private def vintages: Seq[String] = {
    val d = new java.io.File(dir)
    assume(d.exists(), s"$dir not present")
    d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted.toSeq
  }

  /** Load one vintage into comparison-stable form: drop pandas index cols,
    * cast unsigned (decimal-mapped) into long space (SURVEY §7.5 caveat),
    * hex-render binary for value equality.
    */
  private def loadStable(path: String) = {
    val df0 = spark.read.parquet(path)
    val cols = df0.columns.sorted.filterNot(_.startsWith("__index_level_"))
    val df = df0.select(cols.map { c =>
      val col0 = col(s"`$c`")
      df0.schema(c).dataType match {
        case _: DecimalType => col0.cast(LongType).as(c)
        case ArrayType(_: DecimalType, _) => col0.cast(ArrayType(LongType)).as(c)
        case BinaryType => hex(col0).as(c)
        // old vintages lack isAdjustedToUTC -> Spark infers NTZ; with a UTC
        // session the wall values are identical, unify the type
        case TimestampNTZType => col0.cast(TimestampType).as(c)
        case _ => col0
      }
    }.toIndexedSeq: _*)
    SchemaUtil.normalize(df)
  }

  test("every pyarrow vintage loads with the same normalized schema and values") {
    val frames = vintages.map(v => v -> loadStable(s"$dir/$v"))
    val (firstV, first) = frames.head
    val reference = first.collect().map(_.toString).sorted.toSeq
    frames.tail.foreach { case (v, df) =>
      withClue(s"vintage $v vs $firstV: ") {
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
          first.schema.fields.map(f => (f.name, f.dataType)).toSeq
        df.collect().map(_.toString).sorted.toSeq shouldBe reference
      }
    }
    frames.size should be >= 10
  }

  test("a vintage file roundtrips through the ktk store/read path") {
    val base = tmpDir("compat")
    val df = loadStable(s"$dir/${vintages.last}")
    Ktk.store(spark, base, "compat", df)
    val back = Ktk.readTable(spark, base, "compat")
    back.count() shouldBe df.count()
    back.collect().map(_.toString).sorted.toSeq shouldBe
      df.select(back.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
        .collect().map(_.toString).sorted.toSeq
  }
}
