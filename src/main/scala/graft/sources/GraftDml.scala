package graft.sources

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.LongType

import graft.ktk.Ktk

/** SQL `UPDATE` and `MERGE INTO` for graft tables as a custom resolution
  * rule ([[graft.functions.GraftExtensions]] injects it post-hoc): instead
  * of Spark's group-based copy-on-write rewrite (SupportsRowLevelOperations,
  * which rewrites every file containing a match), both statements route to
  * the engine's MERGE-ON-READ operators — matched rows tombstone via one
  * deletion-vector fragment and replacements append, ONE atomic commit,
  * O(matched rows), zero rewrites of untouched files:
  *
  *  - `UPDATE t SET c = expr, ... [WHERE cond]` → [[Ktk.updateRows]]
  *    (arbitrary conditions and old-value-referencing SET expressions).
  *  - `MERGE INTO t USING s ON t.k = s.k ...` → [[Ktk.merge]] /
  *    [[Ktk.mergeCdc]] for the canonical CDC shapes:
  *    `WHEN MATCHED THEN UPDATE SET *` (optionally
  *    `WHEN NOT MATCHED THEN INSERT *`) and
  *    `WHEN MATCHED THEN DELETE`. Conditioned actions, partial-column
  *    updates and not-matched-by-source clauses fail with a clear error —
  *    refusing beats silently wrong merge semantics.
  *
  * The rule fires only on fully-resolved plans over [[GraftTable]]
  * relations; everything else is untouched.
  */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(rel, assignments, condition)
        if u.resolved && graftTable(rel).isDefined =>
      val t = graftTable(rel).get
      val set = assignments.map { a =>
        a.key match {
          case attr: Attribute => attr.name -> toColumn(a.value)
          case other => throw new UnsupportedOperationException(
            s"graft UPDATE supports top-level column assignments only, got $other")
        }
      }.toMap
      GraftUpdateCommand(t.basePath, t.datasetMetadata.uuid, set,
        condition.map(toColumn).getOrElse(lit(true)))

    case m @ MergeIntoTable(target, source, cond, matched, notMatched, notMatchedBySource,
        schemaEvolution)
        if m.resolved && graftTable(target).isDefined =>
      val t = graftTable(target).get
      if (notMatchedBySource.nonEmpty)
        throw new UnsupportedOperationException(
          "graft MERGE does not support WHEN NOT MATCHED BY SOURCE clauses")
      if (schemaEvolution)
        throw new UnsupportedOperationException(
          "graft MERGE does not support WITH SCHEMA EVOLUTION; evolve through " +
            "Ktk.merge(evolveSchema = true)")
      val targetAttrs = target.outputSet
      val sourceAttrs = source.outputSet
      val keys = splitConjunction(cond).map {
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if targetAttrs.contains(a) && sourceAttrs.contains(b) => (a, b)
        case EqualTo(a: AttributeReference, b: AttributeReference)
            if targetAttrs.contains(b) && sourceAttrs.contains(a) => (b, a)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE requires ON to be a conjunction of target-column = " +
            s"source-column equalities, got $other")
      }
      val targetCols = t.datasetMetadata.schema.fieldNames.toSeq
      // the source as a DataFrame projected to TARGET column names: the
      // resolved actions' assignment values (expressions over SOURCE
      // attributes only) define the projection
      def projectSource(assigns: Seq[Assignment]): DataFrame = {
        val byName = assigns.map { a =>
          val name = a.key match {
            case attr: Attribute => attr.name
            case other => throw new UnsupportedOperationException(
              s"graft MERGE supports top-level column assignments only, got $other")
          }
          a.value.references.foreach { r =>
            if (!sourceAttrs.contains(r))
              throw new UnsupportedOperationException(
                s"graft MERGE assignment for '$name' references target column " +
                  s"'${r.name}' — only full-row replacement (UPDATE SET * / " +
                  "INSERT *) shapes are supported")
          }
          name -> toColumn(a.value)
        }.toMap
        val missing = targetCols.filterNot(byName.contains)
        if (missing.nonEmpty)
          throw new UnsupportedOperationException(
            s"graft MERGE requires every target column assigned (SET * / " +
              s"INSERT * shapes); missing: ${missing.mkString(", ")}")
        GraftBridge.ofRows(session, source)
          .select(targetCols.map(c => byName(c).as(c)): _*)
      }
      def sourceKeyed: DataFrame =
        GraftBridge.ofRows(session, source)
          .select(keys.map { case (tk, sk) => col(s"`${sk.name}`").as(tk.name) }: _*)

      val unconditioned: PartialFunction[MergeAction, MergeAction] = {
        case a @ UpdateAction(None, _, _) => a
        case a @ DeleteAction(None)    => a
        case a @ InsertAction(None, _) => a
        case other => throw new UnsupportedOperationException(
          s"graft MERGE does not support conditioned actions, got $other")
      }
      (matched.map(unconditioned), notMatched.map(unconditioned)) match {
        case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins))) =>
          // classic upsert; both projections must agree (SET * + INSERT *)
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => {
              val a = projectSource(up); val b = projectSource(ins)
              require(a.schema == b.schema,
                "graft MERGE requires UPDATE SET * and INSERT * to project the same row")
              a
            }, keys.map(_._1.name), mode = "upsert")
        case (Seq(UpdateAction(None, up, _)), Seq()) =>
          // update-only: restrict the source to keys that already match
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => projectSource(up), keys.map(_._1.name), mode = "update-only")
        case (Seq(), Seq(InsertAction(None, ins))) =>
          // insert-only: append source rows whose keys are absent
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => projectSource(ins), keys.map(_._1.name), mode = "insert-only")
        case (Seq(DeleteAction(None)), Seq()) =>
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => sourceKeyed, keys.map(_._1.name), mode = "delete")
        case other => throw new UnsupportedOperationException(
          s"unsupported graft MERGE action combination: $other. Supported: " +
            "UPDATE SET * [+ INSERT *], INSERT * alone, or DELETE alone")
      }
  }

  private def graftTable(plan: LogicalPlan): Option[GraftTable] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        r.table.asInstanceOf[GraftTable]
    }

  private def splitConjunction(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunction(l) ++ splitConjunction(r)
    case other     => Seq(other)
  }

  /** Resolved expression → Column usable over a FRESH scan of the same
    * table/source: attribute references rebind BY NAME (exprIds belong to
    * the statement's plan, not the engine's own scans).
    */
  private def toColumn(e: Expression): Column =
    GraftBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

/** Driver-side merge-on-read UPDATE; returns (rows_updated, version). */
case class GraftUpdateCommand(
    base: String, uuid: String, set: Map[String, Column], cond: Column)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rows_updated", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (md, n) = Ktk.updateRows(session, base, uuid, set, conditionCol = Some(cond))
    Seq(Row(n, md.version))
  }
}

/** Driver-side merge-on-read MERGE; `mode` picks the engine call. The
  * source thunk defers DataFrame construction to execution time (the
  * command node itself must stay analyzable).
  */
case class GraftMergeCommand(
    base: String, uuid: String, sourceDf: () => DataFrame,
    keys: Seq[String], mode: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rows_affected", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val src = sourceDf()
    val (md, n) = mode match {
      case "upsert" =>
        Ktk.merge(session, base, uuid, src, keys)
      case "update-only" =>
        // keys that already exist in the target (pruned key-column read)
        val existing = Ktk.readTable(session, base, uuid, columns = keys)
        Ktk.merge(session, base, uuid,
          src.join(existing.distinct(), keys, "left_semi"), keys)
      case "insert-only" =>
        val existing = Ktk.readTable(session, base, uuid, columns = keys)
        val fresh = src.join(existing.distinct(), keys, "left_anti")
        val md1 = Ktk.update(session, base, uuid, Some(fresh))
        (md1, 0L)
      case "delete" =>
        // empty upsert side in the FULL target schema; only deleteKeys act
        val md0 = graft.ktk.DatasetMetadata.load(session, base, uuid)
        val empty = session.createDataFrame(
          session.sparkContext.emptyRDD[Row], md0.schema)
        Ktk.merge(session, base, uuid, empty, keys, deleteKeys = Some(src))
      case other => throw new IllegalStateException(s"unknown merge mode $other")
    }
    Seq(Row(n, md.version))
  }
}
