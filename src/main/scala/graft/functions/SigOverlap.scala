package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Native Catalyst expression: fraction of agreeing byte slots between two
  * b-bit minhash signatures — the Jaccard estimate every minhash
  * verification stage computes, once per CANDIDATE PAIR. On dup-heavy
  * corpora the candidate set is the hot path (orders of magnitude more
  * pairs than documents), so like [[CosineSimilarity]] this earns a
  * `doGenCode`: the Scala-UDF form it replaces boxed two byte arrays and
  * broke whole-stage codegen at exactly the stage with the most rows.
  * Mismatched lengths (a batch probing a table built with a different
  * numHashes) fail loudly, matching the UDF's contract.
  */
case class SigOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_overlap"

  private def lengthError(la: Int, lb: Int): String =
    s"signature length mismatch ($la vs $lb): history table and batch " +
      "were built with different numHashes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length)
      throw new IllegalArgumentException(lengthError(x.length, y.length))
    var m = 0; var i = 0
    while (i < x.length) { if (x(i) == y(i)) m += 1; i += 1 }
    m.toDouble / x.length
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "signature length mismatch (" + $a.length + " vs " + $b.length +
         |    "): history table and batch were built with different numHashes");
         |}
         |int $m = 0;
         |for (int $i = 0; $i < $a.length; $i++) { if ($a[$i] == $b[$i]) $m++; }
         |${ev.value} = ((double) $m) / $a.length;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigOverlap =
    copy(left = l, right = r)
}

object SigOverlap {
  import org.apache.spark.sql.GraftBridge

  /** Column API: `SigOverlap(col("sigA"), col("sigB"))`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SigOverlap(GraftBridge.expression(a), GraftBridge.expression(b)))
}
