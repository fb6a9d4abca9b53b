package graft.core

/** Typed condition sublanguage — the cube query builder's `C` re-expressed
  * in Scala (≙ kartothek/core/cube/conditions.py:123-127 `in_interval`,
  * 242-428 the Simple/InInterval condition classes and their
  * `predicate_part` translation):
  *
  * {{{
  *   (C("a") === 1) & C("price").inInterval(100.0, 200.0)
  * }}}
  *
  * compiles to the DNF [[Predicates]] core, so everything downstream
  * (partition pruning, index lookup, residual filter) is shared with the
  * tuple-literal form. `inInterval(start, stop)` is start-INclusive,
  * stop-EXclusive, each bound optional, exactly like the reference.
  */
final case class Conjunction(literals: Seq[PredLiteral]) {
  def &(other: Conjunction): Conjunction = Conjunction(literals ++ other.literals)
  def toPredicates: Predicates = Predicates(Seq(literals))

  /** Disjunction with another conjunction (beyond the reference's `C`,
    * which is conjunction-only; the DNF core supports it for free).
    */
  def |(other: Conjunction): Predicates = Predicates(Seq(literals, other.literals))
}

object Conjunction {
  import scala.language.implicitConversions
  implicit def toPredicates(c: Conjunction): Predicates = c.toPredicates
}

final case class C(name: String) {
  private def one(op: PredOp, v: Any): Conjunction =
    Conjunction(Seq(PredLiteral(name, op, v)))

  def ===(v: Any): Conjunction = one(PredOp.Eq, v)
  def =!=(v: Any): Conjunction = one(PredOp.Ne, v)
  def <(v: Any): Conjunction = one(PredOp.Lt, v)
  def <=(v: Any): Conjunction = one(PredOp.Le, v)
  def >(v: Any): Conjunction = one(PredOp.Gt, v)
  def >=(v: Any): Conjunction = one(PredOp.Ge, v)
  def isIn(vs: Seq[Any]): Conjunction = one(PredOp.In, vs)

  /** `start` inclusive, `stop` exclusive; either bound may be omitted
    * (conditions.py:415-428 `predicate_part`).
    */
  def inInterval(start: Any = null, stop: Any = null): Conjunction = {
    val lits =
      Option(start).map(s => PredLiteral(name, PredOp.Ge, s)).toSeq ++
        Option(stop).map(s => PredLiteral(name, PredOp.Lt, s)).toSeq
    require(lits.nonEmpty, s"in_interval on '$name' needs at least one bound")
    Conjunction(lits)
  }
}
