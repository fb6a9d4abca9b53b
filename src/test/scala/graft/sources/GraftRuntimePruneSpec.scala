package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Expressions}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.paths.SparkPath

/** The runtime (DPP) prune evaluator in isolation: it may only drop a file
  * when the predicates PROVABLY exclude its partition values — every
  * uncertain shape (unknown op, unknown column, type-mismatched literal,
  * nested reference) must keep the file.
  */
class GraftRuntimePruneSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("p", StringType), StructField("q", LongType)))

  private def file(p: String, q: Long, idx: Int): PartitionedFile =
    PartitionedFile(
      InternalRow(UTF8String.fromString(p), q),
      SparkPath.fromPathString(s"/x/f$idx"), 0L, 10L, Array.empty)

  private def parts(fs: PartitionedFile*): Array[InputPartition] =
    Array(FilePartition(0, fs.toArray))

  private def kept(preds: Predicate*)(fs: PartitionedFile*): Seq[String] =
    GraftRuntimePrune(parts(fs: _*), schema, preds.toArray)
      .collect { case fp: FilePartition => fp.files }.flatten
      .map(_.filePath.toString).toSeq

  private def eq(col: String, v: Any): Predicate =
    new Predicate("=", Array[V2Expr](Expressions.column(col), Expressions.literal(v)))
  private def in(col: String, vs: Any*): Predicate =
    new Predicate("IN",
      (Expressions.column(col) +: vs.map(Expressions.literal(_): V2Expr)).toArray)

  private val fA = file("a", 1L, 0)
  private val fB = file("b", 2L, 1)
  private val fC = file("c", 3L, 2)

  test("= and IN prune provably-excluded files, in both literal representations") {
    // external JVM literal (Expressions.literal -> java String)
    kept(eq("p", "a"))(fA, fB, fC) shouldBe Seq("/x/f0")
    kept(in("p", "a", "c"))(fA, fB, fC) shouldBe Seq("/x/f0", "/x/f2")
    kept(eq("q", 2L))(fA, fB, fC) shouldBe Seq("/x/f1")
    // catalyst-internal literal (what Spark's runtime-filter translation
    // actually sends): UTF8String must compare equal too
    val internal = new Predicate("=", Array[V2Expr](
      Expressions.column("p"),
      org.apache.spark.sql.GraftBridge.v2Literal(UTF8String.fromString("b"), StringType)))
    kept(internal)(fA, fB, fC) shouldBe Seq("/x/f1")
  }

  test("AND intersects, OR unions, empty partitions drop, indexes renumber") {
    kept(new Predicate("AND", Array[V2Expr](in("p", "a", "b"), eq("q", 2L))))(
      fA, fB, fC) shouldBe Seq("/x/f1")
    kept(new Predicate("OR", Array[V2Expr](eq("p", "a"), eq("q", 3L))))(
      fA, fB, fC) shouldBe Seq("/x/f0", "/x/f2")
    // all files of a partition pruned -> the partition disappears and the
    // survivors renumber from 0
    val out = GraftRuntimePrune(
      Array(FilePartition(0, Array(fA)), FilePartition(1, Array(fB))),
      schema, Array(eq("p", "b")))
    out.map(_.asInstanceOf[FilePartition].index).toSeq shouldBe Seq(0)
    out.head.asInstanceOf[FilePartition].files.head.filePath.toString shouldBe "/x/f1"
  }

  test("every uncertain shape keeps the file (never wrongly prunes)") {
    // unknown operator
    kept(new Predicate("STARTS_WITH", Array[V2Expr](
      Expressions.column("p"), Expressions.literal("a"))))(fA, fB) should have size 2
    // unknown column
    kept(eq("nope", "a"))(fA, fB) should have size 2
    // type-mismatched literal (long column, int literal): boxed == would be
    // false for every row — must keep, not prune
    kept(eq("q", 2))(fA, fB) should have size 2
    // no predicates / no partition columns: untouched
    GraftRuntimePrune(parts(fA), schema, Array.empty) should have size 1
    GraftRuntimePrune(parts(fA), StructType(Nil), Array(eq("p", "a"))) should have size 1
    // NOT is unsupported -> keeps everything rather than inverting wrongly
    kept(new Predicate("NOT", Array[V2Expr](eq("p", "a"))))(fA, fB) should have size 2
  }
}
