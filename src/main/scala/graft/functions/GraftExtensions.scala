package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ops.{Sampling, TextAnalysis}

/** Session extensions registering graft's functions on the SQL surface.
  * Use either:
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions   // at build time
  *   GraftExtensions.register(spark)                        // on a live session
  * }}}
  * After registration the pipeline kernels compose in plain SQL:
  * {{{
  *   SELECT doc_id, token_count(text), quality_score(text)
  *   FROM docs WHERE dup_line_fraction(text) < 0.3
  * }}}
  * `cosine_sim` is a native codegen'd expression; the text/sampling
  * functions expand to the same Catalyst trees the Column API builds, so
  * SQL and DataFrame callers share one implementation (and its codegen).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    // SQL UPDATE / MERGE INTO over graft tables → merge-on-read operators
    // (post-hoc resolution rules apply only at session BUILD time — set
    // spark.sql.extensions; the runtime register() path covers functions
    // only)
    ext.injectPostHocResolutionRule(session => graft.sources.GraftDmlRule(session))
    // logical clean/dirty split for DV-bearing tables: the clean-file
    // majority keeps the fully-vectorized scan, only tombstone-touched
    // files read row-based (see GraftDvSplitRule)
    ext.injectOptimizerRule(_ => graft.sources.GraftDvSplitRule)
  }
}

object GraftExtensions {

  private type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, arity: Int)(f: Seq[Column] => Column): Descriptor = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftExtensions.getClass.getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == arity, s"$name takes exactly $arity argument(s)")
      GraftBridge.eagerExpression(f(exprs.map(GraftBridge.column)))
    })

  private def descriptors: Seq[Descriptor] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(exprs(0), exprs(1))
      }),
    (FunctionIdentifier("sig_overlap"),
      new ExpressionInfo(classOf[SigOverlap].getName, "sig_overlap"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "sig_overlap takes exactly 2 arguments")
        SigOverlap(exprs(0), exprs(1))
      }),
    descriptor("token_count", 1)(c => TextAnalysis.tokenCount(c.head)),
    descriptor("subword_count", 1)(c => TextAnalysis.subwordCount(c.head)),
    descriptor("punct_ratio", 1)(c => TextAnalysis.punctRatio(c.head)),
    descriptor("stopword_ratio", 1)(c => TextAnalysis.stopwordRatio(c.head)),
    descriptor("mean_token_length", 1)(c => TextAnalysis.meanTokenLength(c.head)),
    descriptor("quality_score", 1)(c => TextAnalysis.qualityScore(c.head)),
    descriptor("dup_line_fraction", 1)(c => TextAnalysis.dupLineFraction(c.head)),
    descriptor("dup_line_char_fraction", 1)(c => TextAnalysis.dupLineCharFraction(c.head)),
    descriptor("dup_bigram_fraction", 1)(c => TextAnalysis.dupBigramFraction(c.head)),
    descriptor("redact_pii", 1)(c => TextAnalysis.redactPii(c.head)),
    descriptor("clean_text", 1)(c => TextAnalysis.cleanText(c.head)),
    descriptor("doc_fingerprint", 1)(c => TextAnalysis.fingerprint(c.head)),
    descriptor("hash_unit", 2)(c => Sampling.hashUnitCol(c(0), c(1))))

  /** Register on an already-running session (expressions + the UDF-backed
    * language classifier, which has no expression form).
    */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    spark.udf.register("lang_id", TextAnalysis.langIdUdf)
    ()
  }
}
