package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: distinct 64-bit hashes of a document's word
  * n-grams, in one pass — `lower → whitespace-tokenize → FNV-1a per token →
  * order-sensitive chain per window → dedup`.
  *
  * The composable alternative (`transform(sequence(...), i →
  * xxhash64(concat_ws(" ", slice(toks, i, n))))`) re-evaluates an
  * interpreted lambda per WINDOW and re-tokenizes per reference (~20 µs/row
  * measured) — on the decontamination hot path over a 100 TB corpus that
  * is the dominant cost. This kernel is one JVM call per DOCUMENT and keeps
  * the surrounding projection inside whole-stage codegen.
  *
  * Only hash distinctness matters to callers (overlap counting); any
  * 64-bit collision-resistant hash of the gram token sequence is
  * equivalent to comparing gram strings (odds ~m²/2⁶⁵).
  */
/** Positional sibling of [[WordNgramHashes]]: the hash of EVERY n-gram
  * window in token order (index j = gram starting at token j, NOT deduped)
  * — the form span-level dedup needs, where a gram's position in the
  * document matters as much as its identity. Same kernel, same hash chain,
  * so positional and distinct views of one document agree bit-for-bit.
  */
case class WordNgramHashesPos(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes_pos"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WordNgramHashes.kernelAll(input.toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.WordNgramHashes.kernelAll($in.toString(), $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashesPos =
    copy(child = newChild)
}

object WordNgramHashesPos {
  import org.apache.spark.sql.GraftBridge

  /** Column API: every n-gram window's hash, in token order. */
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramHashesPos(GraftBridge.expression(text), n))
}

case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      WordNgramHashes.kernel(input.toString, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  graft.functions.WordNgramHashes.kernel($in.toString(), $n));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object WordNgramHashes {
  import org.apache.spark.sql.GraftBridge

  /** Column API: distinct n-gram hashes of a text column. */
  def apply(text: Column, n: Int): Column =
    GraftBridge.column(WordNgramHashes(GraftBridge.expression(text), n))

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One-pass kernel: token FNV-1a hashes, then an order-sensitive chain
    * over each n-window, deduped. Public + static-forwarded so generated
    * code can call it.
    */
  def kernel(text: String, n: Int): Array[Long] = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val L = t.length
    val tokH = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    while (i < L) {
      while (i < L && isWs(t.charAt(i))) i += 1
      if (i < L) {
        var h = FnvOffset
        while (i < L && !isWs(t.charAt(i))) { h = (h ^ t.charAt(i)) * FnvPrime; i += 1 }
        tokH += h
      }
    }
    val m = tokH.length
    if (m < n) Array.emptyLongArray
    else {
      val seen = new java.util.HashSet[java.lang.Long](m * 2)
      val out = new scala.collection.mutable.ArrayBuffer[Long](m - n + 1)
      var j = 0
      while (j + n <= m) {
        var g = FnvOffset
        var k = 0
        while (k < n) { g = (g ^ tokH(j + k)) * FnvPrime; k += 1 }
        if (seen.add(g)) out += g
        j += 1
      }
      out.toArray
    }
  }

  /** Positional kernel: hash of every window, index = window start. Shares
    * tokenization and the hash chain with [[kernel]] exactly.
    */
  def kernelAll(text: String, n: Int): Array[Long] = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    val L = t.length
    val tokH = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    while (i < L) {
      while (i < L && isWs(t.charAt(i))) i += 1
      if (i < L) {
        var h = FnvOffset
        while (i < L && !isWs(t.charAt(i))) { h = (h ^ t.charAt(i)) * FnvPrime; i += 1 }
        tokH += h
      }
    }
    val m = tokH.length
    if (m < n) Array.emptyLongArray
    else {
      val out = new Array[Long](m - n + 1)
      var j = 0
      while (j + n <= m) {
        var g = FnvOffset
        var k = 0
        while (k < n) { g = (g ^ tokH(j + k)) * FnvPrime; k += 1 }
        out(j) = g
        j += 1
      }
      out
    }
  }
}
