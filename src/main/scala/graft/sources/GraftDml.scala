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
  *    [[Ktk.mergeCdc]]: `WHEN MATCHED THEN UPDATE SET *` (optionally
  *    `WHEN NOT MATCHED THEN INSERT *`), `WHEN MATCHED THEN DELETE`, and
  *    PARTIAL-COLUMN / target-referencing updates
  *    (`UPDATE SET t.v = t.v + s.delta`) — the latter build full
  *    replacement images by joining live target rows with the source on
  *    the merge keys (the same read Spark's row-level MERGE does) while
  *    the write stays merge-on-read. CONDITIONED actions
  *    (`WHEN MATCHED AND cond THEN ...`) route every joined row to its
  *    first-true action and apply the whole batch (updates + deletes +
  *    filtered inserts) as ONE [[Ktk.mergeCdc]] commit, and
  *    `WHEN NOT MATCHED BY SOURCE` UPDATE/DELETE routes target orphans
  *    the same way (the full-sync shape). `WITH SCHEMA EVOLUTION` works
  *    through the analyzer: [[GraftTable]] declares
  *    AUTOMATIC_SCHEMA_EVOLUTION, so ResolveMergeIntoSchemaEvolution adds
  *    the source's new columns via `alterTable` (one additive commit)
  *    before the merge lowers. Only non-equi ON still refuses — refusing
  *    beats silently wrong merge semantics.
  *
  * The rule fires only on fully-resolved plans over [[GraftTable]]
  * relations; everything else is untouched.
  */
case class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // dynamic partition overwrite (partitionOverwriteMode=dynamic): Spark
    // plans OverwritePartitionsDynamicExec, which has NO V1 write fallback
    // (it calls Write.toBatch directly), so lower the logical node here to
    // the engine's one-pass dynamic-overwrite commit: the scope — exactly
    // the partitions the batch lands in — derives from the appended files'
    // labels inside Ktk.update, no pre-computed distinct over the source.
    case o @ OverwritePartitionsDynamic(rel, query, _, _, _)
        if o.resolved && graftTable(rel).isDefined =>
      val t = graftTable(rel).get
      GraftDynamicOverwriteCommand(t.basePath, t.datasetMetadata.uuid,
        () => GraftBridge.ofRows(session, query))

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
      // conditions expressible in the DNF algebra go through as typed
      // Predicates so updateRows prunes candidate files through the full
      // skipping ladder (partition / index / zone / bloom); everything
      // else falls back to the exact Column condition over all candidates
      val asPredicates = condition.flatMap(exprToPredicates)
      GraftUpdateCommand(t.basePath, t.datasetMetadata.uuid, set,
        asPredicates, condition.map(toColumn).getOrElse(lit(true)))

    case m @ MergeIntoTable(target, source, cond, matched, notMatched, notMatchedBySource,
        schemaEvolution)
        if m.resolved && graftTable(target).isDefined =>
      // WITH SCHEMA EVOLUTION: GraftTable declares
      // AUTOMATIC_SCHEMA_EVOLUTION, so the analyzer's
      // ResolveMergeIntoSchemaEvolution already widened the table (one
      // additive ADD COLUMN commit via GraftCatalog.alterTable) and
      // reloaded the relation before this rule fires — the target below
      // carries the union schema and old files read the new columns null.
      // CAVEAT: that rule rewrites pre-evolution target attributes into the
      // reloaded relation by POSITIONAL zip, assuming evolved tables append
      // new columns at the END. This connector surfaces payload-alphabetical
      // + partition-keys-last order, so a new column can land mid-list and
      // the rewrite then stitches each old attribute to the WRONG new
      // column: names survive but exprIds/types come from the positional
      // partner, and the star expansion's store-assignment artifacts
      // (cast/assertnotnull) are built from those corrupted types. Detect it
      // directly — an attribute whose exprId belongs to a differently-named
      // output column — and when present (a) restrict to the star shapes
      // whose assignment values are bare source attributes under the
      // artifacts, (b) strip the artifacts and re-apply by-name casts from
      // the table's REAL schema (the by-name lowering below is immune to
      // exprId corruption).
      val t = graftTable(target).get
      val targetAttrs = target.outputSet
      val sourceAttrs = source.outputSet
      val idToName = target.output.map(a => a.exprId -> a.name).toMap
      val evolutionCorrupted = schemaEvolution && {
        val actionExprs = (matched ++ notMatched ++ notMatchedBySource).flatMap {
          case UpdateAction(c, assigns, _) => c.toSeq ++ assigns.map(_.key)
          case DeleteAction(c)             => c.toSeq
          case InsertAction(c, assigns)    => c.toSeq ++ assigns.map(_.key)
          case _                           => Nil
        }
        (cond +: actionExprs).exists(_.collectFirst {
          case a: AttributeReference if idToName.get(a.exprId).exists(_ != a.name) => a
        }.nonEmpty)
      }
      // store-assignment / coercion artifacts the analyzer derived from the
      // CORRUPTED attr types: peel down to the underlying expression
      def stripArtifacts(e: Expression): Expression = e match {
        case a: org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull =>
          stripArtifacts(a.child)
        case c: org.apache.spark.sql.catalyst.expressions.Cast => stripArtifacts(c.child)
        case other => other
      }
      // under corruption the ON equalities may carry type coercions derived
      // from the mismapped attr types; names are still right, so unwrap —
      // but a stripped cast could also be USER-written (e.g. ON t.k =
      // CAST(s.ks AS BIGINT)), which the plain path refuses. Distinguish by
      // the REAL types: the corruption-only case has declared-target type ==
      // source attr type once the bogus cast is gone; anything else refuses
      // rather than silently matching on different semantics.
      val keys = splitConjunction(cond).map { c0 =>
        val c = if (evolutionCorrupted) c0 match {
          case EqualTo(l, r) => EqualTo(stripArtifacts(l), stripArtifacts(r))
          case other         => other
        } else c0
        val pair = c match {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if targetAttrs.contains(a) && sourceAttrs.contains(b) => (a, b)
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if targetAttrs.contains(b) && sourceAttrs.contains(a) => (b, a)
          case other => throw new UnsupportedOperationException(
            s"graft MERGE requires ON to be a conjunction of target-column = " +
              s"source-column equalities, got $other")
        }
        if (evolutionCorrupted) {
          val declared = t.datasetMetadata.schema(pair._1.name).dataType
          if (declared != pair._2.dataType)
            throw new UnsupportedOperationException(
              s"MERGE WITH SCHEMA EVOLUTION: ON clause for key '${pair._1.name}' " +
                s"is not a plain same-type column equality (target $declared vs " +
                s"source ${pair._2.dataType}); ALTER TABLE ... ADD COLUMNS first " +
                "and re-run the MERGE with the explicit ON expression")
        }
        pair
      }
      val targetCols = t.datasetMetadata.schema.fieldNames.toSeq
      // the source as a DataFrame projected to TARGET column names: the
      // resolved actions' assignment values (expressions over SOURCE
      // attributes only) define the projection
      def assignmentName(a: Assignment): String = a.key match {
        case attr: Attribute => attr.name
        case other => throw new UnsupportedOperationException(
          s"graft MERGE supports top-level column assignments only, got $other")
      }
      // corrupted star-expanded values are a bare source attribute under
      // store-assignment artifacts; peel those (their types came from the
      // corrupted key) and re-cast by name from the table's real schema
      def repairedColumn(name: String, value: Expression): Column = {
        stripArtifacts(value) match {
          case a: AttributeReference if sourceAttrs.contains(a) =>
            val declared = t.datasetMetadata.schema(name).dataType
            if (a.dataType == declared) toColumn(a) else toColumn(a).cast(declared)
          case _ => throw new UnsupportedOperationException(
            s"MERGE WITH SCHEMA EVOLUTION supports UPDATE SET * / INSERT * when " +
              s"the added columns reorder the table (assignment for '$name' is not " +
              "a plain source column); ALTER TABLE ... ADD COLUMNS first and re-run " +
              "a plain MERGE for richer shapes")
        }
      }
      def projectSource(assigns: Seq[Assignment]): DataFrame = {
        val byName = assigns.map { a =>
          val name = assignmentName(a)
          a.value.references.foreach { r =>
            if (!sourceAttrs.contains(r))
              throw new UnsupportedOperationException(
                s"graft MERGE INSERT assignment for '$name' references target " +
                  s"column '${r.name}' — inserted rows have no target image")
          }
          name -> (if (evolutionCorrupted) repairedColumn(name, a.value)
                   else toColumn(a.value))
        }.toMap
        val missing = targetCols.filterNot(byName.contains)
        if (missing.nonEmpty)
          throw new UnsupportedOperationException(
            s"graft MERGE requires every target column assigned in INSERT " +
              s"(INSERT * shape); missing: ${missing.mkString(", ")}")
        GraftBridge.ofRows(session, source)
          .select(targetCols.map(c => byName(c).as(c)): _*)
      }
      // full-source-row SET *: every target column assigned from SOURCE
      // attrs only — lowers WITHOUT reading the target (the fast path)
      def isFullSourceRow(assigns: Seq[Assignment]): Boolean =
        targetCols.forall(assigns.map(assignmentName).contains) &&
          assigns.forall(_.value.references.forall(sourceAttrs.contains))
      // Partial-column / target-referencing UPDATE SET: build the matched
      // rows' FULL replacement images by joining live target rows with the
      // source on the merge keys — assigned columns evaluate their
      // expressions (which may mix target and source attrs), unassigned
      // columns keep the target's value. Source columns are renamed
      // `__s_<name>` before the join so same-named columns never collide;
      // attribute refs rebind by SIDE (they are resolved, so membership in
      // sourceAttrs/targetAttrs is exact). One inner join per MERGE —
      // exactly the read Spark's own row-level MERGE would do, but the
      // write stays merge-on-read.
      def joinedUpdateRows(assigns: Seq[Assignment]): DataFrame = {
        if (evolutionCorrupted)
          throw new UnsupportedOperationException(
            "MERGE WITH SCHEMA EVOLUTION supports the unconditioned UPDATE SET * / " +
              "INSERT * / DELETE shapes when the added columns reorder the table; " +
              "ALTER TABLE ... ADD COLUMNS first and re-run the partial-column MERGE")
        require(!targetCols.exists(_.startsWith("__s_")),
          "target columns may not start with the reserved prefix __s_")
        val assignBy: Map[String, Column] = assigns.map { a =>
          assignmentName(a) -> GraftBridge.column(a.value.transform {
            case r: AttributeReference if sourceAttrs.contains(r) =>
              UnresolvedAttribute.quoted(s"__s_${r.name}")
            case r: AttributeReference => UnresolvedAttribute.quoted(r.name)
          })
        }.toMap
        val src = GraftBridge.ofRows(session, source)
        val srcRenamed = src.select(src.columns.toSeq.map(c =>
          col(s"`$c`").as(s"__s_$c")): _*)
        val tgt = Ktk.readTable(session, t.basePath, t.datasetMetadata.uuid)
        val joinCond = keys.map { case (tk, sk) =>
          col(s"`${tk.name}`") === col(s"`__s_${sk.name}`") }.reduce(_ && _)
        tgt.join(srcRenamed, joinCond, "inner")
          .select(targetCols.map(c => assignBy.getOrElse(c, col(s"`$c`")).as(c)): _*)
      }
      def sourceKeyed: DataFrame =
        GraftBridge.ofRows(session, source)
          .select(keys.map { case (tk, sk) => col(s"`${sk.name}`").as(tk.name) }: _*)

      // GENERAL lowering for conditioned matched actions — `WHEN MATCHED
      // [AND cond] THEN UPDATE/DELETE ...` in declaration order (first
      // true condition wins per row, SQL semantics; a NULL condition is
      // false): route every joined row to its winning action with one
      // `when`-chain, project each action's replacement image (DELETE
      // rows carry only their keys), and apply the whole batch as ONE
      // [[Ktk.mergeCdc]] commit — updates and deletes land atomically,
      // still merge-on-read. Conditioned NOT MATCHED inserts filter the
      // source (first-true-wins across insert actions) before the
      // anti-join against existing keys.
      def generalMerge(): LogicalPlan = {
        val keyNames = keys.map(_._1.name)
        matched.foreach {
          case _: UpdateAction | _: DeleteAction => ()
          case other => throw new UnsupportedOperationException(
            s"unsupported matched MERGE action: $other")
        }
        notMatched.foreach {
          case _: InsertAction => ()
          case other => throw new UnsupportedOperationException(
            s"unsupported not-matched MERGE action: $other")
        }
        notMatchedBySource.foreach {
          case a: UpdateAction =>
            (a.condition.toSeq.flatMap(_.references) ++
              a.assignments.flatMap(_.value.references)).foreach { r =>
              if (sourceAttrs.contains(r))
                throw new UnsupportedOperationException(
                  s"NOT MATCHED BY SOURCE references source column '${r.name}' — " +
                    "these rows have no source image")
            }
          case a: DeleteAction =>
            a.condition.toSeq.flatMap(_.references).foreach { r =>
              if (sourceAttrs.contains(r))
                throw new UnsupportedOperationException(
                  s"NOT MATCHED BY SOURCE references source column '${r.name}'")
            }
          case other => throw new UnsupportedOperationException(
            s"unsupported not-matched-by-source MERGE action: $other")
        }
        def joinedCond(e: Expression): Column =
          GraftBridge.column(e.transform {
            case r: AttributeReference if sourceAttrs.contains(r) =>
              UnresolvedAttribute.quoted(s"__s_${r.name}")
            case r: AttributeReference => UnresolvedAttribute.quoted(r.name)
          })
        GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
          () => {
            require(!targetCols.exists(_.startsWith("__s_")),
              "target columns may not start with the reserved prefix __s_")
            val src = GraftBridge.ofRows(session, source)
            val srcRenamed = src.select(src.columns.toSeq.map(c =>
              col(s"`$c`").as(s"__s_$c")): _*)
            val tgt = Ktk.readTable(session, t.basePath, t.datasetMetadata.uuid)
            val joinCond = keys.map { case (tk, sk) =>
              col(s"`${tk.name}`") === col(s"`__s_${sk.name}`") }.reduce(_ && _)
            // winning matched action per row: index of the first action
            // whose condition holds (missing condition = always true)
            val pick = matched.zipWithIndex.foldLeft(lit(null).cast("int")) {
              case (acc, (a, i)) =>
                val c = a.condition.map(joinedCond).getOrElse(lit(true))
                org.apache.spark.sql.functions.coalesce(acc,
                  org.apache.spark.sql.functions.when(c, lit(i)))
            }
            val joined = tgt.join(srcRenamed, joinCond, "inner")
              .withColumn("__action", pick)
            val matchedParts = matched.zipWithIndex.map {
              case (UpdateAction(_, assigns, _), i) =>
                val assignBy: Map[String, Column] = assigns.map { a =>
                  assignmentName(a) -> joinedCond(a.value)
                }.toMap
                joined.filter(col("__action") === i)
                  .select(targetCols.map(c =>
                    assignBy.getOrElse(c, col(s"`$c`")).as(c)) :+
                    lit("U").as("__op"): _*)
              case (DeleteAction(_), i) =>
                joined.filter(col("__action") === i)
                  .select(targetCols.map(c =>
                    (if (keyNames.contains(c)) col(s"`$c`")
                     else lit(null).cast(tgt.schema(c).dataType)).as(c)) :+
                    lit("D").as("__op"): _*)
              case (other, _) => throw new IllegalStateException(s"$other")
            }
            // NOT MATCHED BY SOURCE: target rows whose keys the source
            // lacks, routed first-true-wins exactly like the matched side
            // (conditions/assignments reference target attrs only)
            val nmbsParts = if (notMatchedBySource.isEmpty) Nil else {
              val tgtOrphans = tgt.join(
                  srcRenamed.select(keys.map { case (_, sk) =>
                    col(s"`__s_${sk.name}`") }: _*).distinct(),
                  joinCond, "left_anti")
              val pickO = notMatchedBySource.zipWithIndex.foldLeft(lit(null).cast("int")) {
                case (acc, (a, i)) =>
                  val c = a.condition.map(joinedCond).getOrElse(lit(true))
                  org.apache.spark.sql.functions.coalesce(acc,
                    org.apache.spark.sql.functions.when(c, lit(i)))
              }
              val routed = tgtOrphans.withColumn("__action", pickO)
              notMatchedBySource.zipWithIndex.map {
                case (UpdateAction(_, assigns, _), i) =>
                  val assignBy: Map[String, Column] = assigns.map { a =>
                    assignmentName(a) -> joinedCond(a.value)
                  }.toMap
                  routed.filter(col("__action") === i)
                    .select(targetCols.map(c =>
                      assignBy.getOrElse(c, col(s"`$c`")).as(c)) :+
                      lit("U").as("__op"): _*)
                case (DeleteAction(_), i) =>
                  routed.filter(col("__action") === i)
                    .select(targetCols.map(c =>
                      (if (keyNames.contains(c)) col(s"`$c`")
                       else lit(null).cast(tgt.schema(c).dataType)).as(c)) :+
                      lit("D").as("__op"): _*)
                case (other, _) => throw new IllegalStateException(s"$other")
              }
            }
            // inserts: first-true-wins across insert actions over the
            // UNMATCHED source rows only
            val existing = Ktk.readTable(session, t.basePath,
              t.datasetMetadata.uuid, columns = keyNames).distinct()
            var remaining = GraftBridge.ofRows(session, source)
            val insertParts = notMatched.map { case InsertAction(condOpt, assigns) =>
              val take = condOpt match {
                case Some(c) => remaining.filter(toColumn(c))
                case None    => remaining
              }
              condOpt.foreach { c =>
                c.references.foreach { r =>
                  if (!sourceAttrs.contains(r))
                    throw new UnsupportedOperationException(
                      s"NOT MATCHED condition references target column '${r.name}'")
                }
                remaining = remaining.filter(
                  !org.apache.spark.sql.functions.coalesce(toColumn(c), lit(false)))
              }
              val assignBy: Map[String, Column] = assigns.map { a =>
                a.value.references.foreach { r =>
                  if (!sourceAttrs.contains(r))
                    throw new UnsupportedOperationException(
                      s"graft MERGE INSERT assignment references target column '${r.name}'")
                }
                assignmentName(a) -> toColumn(a.value)
              }.toMap
              val missing = targetCols.filterNot(assignBy.contains)
              if (missing.nonEmpty)
                throw new UnsupportedOperationException(
                  s"INSERT must assign every target column; missing: ${missing.mkString(", ")}")
              take.select(targetCols.map(c => assignBy(c).as(c)) :+
                lit("I").as("__op"): _*)
                .join(existing, keyNames, "left_anti")
            }
            (matchedParts ++ nmbsParts ++ insertParts).reduce(_ unionByName _)
          }, keys.map(_._1.name), mode = "cdc")
      }

      val unconditioned: PartialFunction[MergeAction, MergeAction] = {
        case a @ UpdateAction(None, _, _) => a
        case a @ DeleteAction(None)    => a
        case a @ InsertAction(None, _) => a
      }
      val allUnconditioned =
        (matched ++ notMatched).forall(unconditioned.isDefinedAt)
      if (evolutionCorrupted && (!allUnconditioned || notMatchedBySource.nonEmpty))
        throw new UnsupportedOperationException(
          "MERGE WITH SCHEMA EVOLUTION supports the unconditioned UPDATE SET * / " +
            "INSERT * / DELETE shapes when the added columns reorder the table; " +
            "ALTER TABLE ... ADD COLUMNS first and re-run the conditioned MERGE")
      if (!allUnconditioned || notMatchedBySource.nonEmpty) generalMerge()
      else (matched.map(unconditioned), notMatched.map(unconditioned)) match {
        case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins)))
            if isFullSourceRow(up) =>
          // classic upsert; both projections must agree (SET * + INSERT *)
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => {
              val a = projectSource(up); val b = projectSource(ins)
              require(a.schema == b.schema,
                "graft MERGE requires UPDATE SET * and INSERT * to project the same row")
              a
            }, keys.map(_._1.name), mode = "upsert")
        case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins))) =>
          // partial-column UPDATE + INSERT *: matched rows get joined
          // replacement images; inserts are the source rows whose keys are
          // ABSENT from the target (the joined images already cover the
          // matched ones — unioning the full insert projection would
          // double-apply them)
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => {
              val keyNames = keys.map(_._1.name)
              val existing = Ktk.readTable(session, t.basePath,
                t.datasetMetadata.uuid, columns = keyNames).distinct()
              joinedUpdateRows(up).unionByName(
                projectSource(ins).join(existing, keyNames, "left_anti"))
            }, keys.map(_._1.name), mode = "upsert")
        case (Seq(UpdateAction(None, up, _)), Seq()) if isFullSourceRow(up) =>
          // update-only: restrict the source to keys that already match
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => projectSource(up), keys.map(_._1.name), mode = "update-only")
        case (Seq(UpdateAction(None, up, _)), Seq()) =>
          // partial-column / target-referencing update-only: the joined
          // images exist in the target by construction — plain upsert
          GraftMergeCommand(t.basePath, t.datasetMetadata.uuid,
            () => joinedUpdateRows(up), keys.map(_._1.name), mode = "upsert")
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

  /** Resolved condition → the engine's DNF predicate algebra when every
    * leaf is a `col <op> literal` shape — None otherwise (the caller then
    * uses the exact Column path without file skipping).
    */
  private def exprToPredicates(e: Expression): Option[graft.core.Predicates] = {
    import org.apache.spark.sql.catalyst.expressions._
    import graft.core.{PredLiteral, PredOp}
    def leaf(x: Expression): Option[PredLiteral] = x match {
      case EqualTo(a: AttributeReference, l: Literal)                => lit1(a, PredOp.Eq, l)
      case EqualTo(l: Literal, a: AttributeReference)                => lit1(a, PredOp.Eq, l)
      case GreaterThan(a: AttributeReference, l: Literal)            => lit1(a, PredOp.Gt, l)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal)     => lit1(a, PredOp.Ge, l)
      case LessThan(a: AttributeReference, l: Literal)               => lit1(a, PredOp.Lt, l)
      case LessThanOrEqual(a: AttributeReference, l: Literal)        => lit1(a, PredOp.Le, l)
      case GreaterThan(l: Literal, a: AttributeReference)            => lit1(a, PredOp.Lt, l)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference)     => lit1(a, PredOp.Le, l)
      case LessThan(l: Literal, a: AttributeReference)               => lit1(a, PredOp.Gt, l)
      case LessThanOrEqual(l: Literal, a: AttributeReference)        => lit1(a, PredOp.Ge, l)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(PredLiteral(a.name, PredOp.In,
          vs.map(v => scalaValue(v.asInstanceOf[Literal]))))
      case IsNull(a: AttributeReference)                             => Some(PredLiteral(a.name, PredOp.Eq, null))
      case IsNotNull(a: AttributeReference)                          => Some(PredLiteral(a.name, PredOp.Ne, null))
      case _                                                         => None
    }
    def lit1(a: AttributeReference, op: PredOp, l: Expression): Option[PredLiteral] =
      Some(PredLiteral(a.name, op, scalaValue(l.asInstanceOf[Literal])))
    def dnf(x: Expression): Option[Seq[Seq[PredLiteral]]] = x match {
      case And(l, r) =>
        for { a <- dnf(l); b <- dnf(r) } yield for { p <- a; q <- b } yield p ++ q
      case Or(l, r) =>
        for { a <- dnf(l); b <- dnf(r) } yield a ++ b
      case other => leaf(other).map(p => Seq(Seq(p)))
    }
    dnf(e).map(graft.core.Predicates(_))
  }

  private def scalaValue(l: org.apache.spark.sql.catalyst.expressions.Literal): Any =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .convertToScala(l.value, l.dataType)
}

/** Driver-side merge-on-read UPDATE; returns (rows_updated, version).
  * DNF-expressible conditions go through as [[graft.core.Predicates]]
  * (candidate files prune through the full skipping ladder); anything
  * else takes the exact Column over all candidate files.
  */
case class GraftUpdateCommand(
    base: String, uuid: String, set: Map[String, Column],
    predicates: Option[graft.core.Predicates], cond: Column)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rows_updated", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    val (md, n) = predicates match {
      case Some(p) => Ktk.updateRows(session, base, uuid, set, predicates = p)
      case None    => Ktk.updateRows(session, base, uuid, set, conditionCol = Some(cond))
    }
    Seq(Row(n, md.version))
  }
}

/** Driver-side dynamic partition overwrite: ONE versioned commit that
  * appends the batch and drops exactly the existing files whose partition
  * tuple the batch re-wrote (scope derived from the appended labels — a
  * single pass over the source). Ktk.update itself degenerates an
  * unpartitioned dataset to a full versioned replace.
  */
case class GraftDynamicOverwriteCommand(
    base: String, uuid: String, sourceDf: () => DataFrame)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    Ktk.update(session, base, uuid, Some(sourceDf()),
      dynamicPartitionOverwrite = true)
    Nil
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
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = fresh.count()
          val md1 = Ktk.update(session, base, uuid, Some(fresh))
          (md1, n)
        } finally fresh.unpersist()
      case "delete" =>
        // empty upsert side in the FULL target schema; only deleteKeys act
        val md0 = graft.ktk.DatasetMetadata.load(session, base, uuid)
        val empty = session.createDataFrame(
          session.sparkContext.emptyRDD[Row], md0.schema)
        Ktk.merge(session, base, uuid, empty, keys, deleteKeys = Some(src))
      case "cdc" =>
        // routed batch from the conditioned-action lowering: rows carry
        // their winning action in __op (U/I upsert, D tombstones keys)
        Ktk.mergeCdc(session, base, uuid, src, keys, opCol = "__op", deleteOp = "D")
      case other => throw new IllegalStateException(s"unknown merge mode $other")
    }
    Seq(Row(n, md.version))
  }
}
