package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions. Use either:
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions   // at build time
  *   GraftExtensions.register(spark)                        // on a live session
  * }}}
  * After registration: `SELECT cosine_sim(a.embedding, b.embedding) ...`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
}

object GraftExtensions {
  private def cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(exprs(0), exprs(1))
    })

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = cosineSimDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
