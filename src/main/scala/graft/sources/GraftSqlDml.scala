package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, Expression, PredicateHelper, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, OverwritePartitionsDynamic, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.StreamingFrameBridge
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{StructField, StructType}

import graft.weblog.IcebergLikeTable
import graft.weblog.IcebergLikeTable.{MergeDelete, MergeInsert, MergeUpdate, MergeWhen}

/** SQL `UPDATE` and `MERGE INTO` for graft catalog tables — a
  * post-resolution analyzer rule (the Delta-style bridge; Spark's own
  * group-based row-level framework needs a native `BatchWrite`, while
  * the engine's commit protocol is the better executor anyway)
  * rewriting the resolved [[UpdateTable]]/[[MergeIntoTable]] plans
  * into commands that run [[IcebergLikeTable.update]] /
  * [[IcebergLikeTable.mergeInto]]:
  *
  * {{{
  *   UPDATE g.web.events SET host = 'x' WHERE user_id = 'u1';
  *   MERGE INTO g.web.events t USING updates s ON t.user_id = s.user_id
  *   WHEN MATCHED AND s.op = 'del' THEN DELETE
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *;
  * }}}
  *
  * Installed by [[graft.GraftExtensions]]. Target attribute references
  * are rebound by NAME (qualified `t.`/`s.` for MERGE) against the
  * engine's own frames; source-side expressions keep their resolved
  * attribute ids and resolve against the captured source plan. The
  * target-only conjuncts of the ON condition become the candidate-file
  * predicate, so a merge keyed to a stats/bloom-stamped column rewrites
  * candidate files, not the table. Plans with subqueries or nested-field
  * assignments are left untouched (Spark surfaces its standard
  * unsupported error).
  */
final case class GraftDmlRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private object GraftTarget {
    def unapply(p: LogicalPlan): Option[(DataSourceV2Relation, GraftSqlTable)] =
      p match {
        case r: DataSourceV2Relation => r.table match {
          case g: GraftSqlTable => Some((r, g))
          case _ => None
        }
        case SubqueryAlias(_, child) => unapply(child)
        case _ => None
      }
  }

  private def hasSubquery(e: Expression): Boolean =
    SubqueryExpression.hasSubquery(e)

  /** A resolved assignment key must be a top-level target column. */
  private def keyOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // arbitrary-condition DELETE (the SupportsDelete V1-filter path only
    // covers exactly-translatable predicates; this bridge covers the rest)
    case dft: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable
        if dft.resolved && dft.childrenResolved =>
      dft.table match {
        case GraftTarget(rel, tbl)
            if tbl.pinned.isEmpty && !hasSubquery(dft.condition) =>
          val tIds = rel.output.map(_.exprId).toSet
          val cond = StreamingFrameBridge.column(dft.condition.transform {
            case a: AttributeReference if tIds.contains(a.exprId) =>
              UnresolvedAttribute.quoted(a.name)
          })
          GraftDeleteCommand(tbl, cond)
        case _ => dft
      }

    // dynamic-partition INSERT OVERWRITE (partitionOverwriteMode=
    // dynamic): Spark's OverwritePartitionsDynamic node demands a
    // native BatchWrite capability the V1 bridge cannot provide; the
    // engine's one-commit leaf swap IS the dynamic overwrite, so the
    // resolved plan bridges straight to
    // [[IcebergLikeTable.overwritePartitions]]. Rewritten here (post-
    // resolution, pre-check), so TableCapabilityCheck never sees it.
    case o: OverwritePartitionsDynamic if o.resolved && o.query.resolved =>
      o.table match {
        case GraftTarget(rel, tbl) if tbl.pinned.isEmpty =>
          GraftDynamicOverwriteCommand(tbl.iceberg, o.query,
            rel.output.map(_.name))
        case _ => o
      }

    case u: UpdateTable if u.resolved && u.childrenResolved =>
      u.table match {
        case GraftTarget(rel, tbl)
            if tbl.pinned.isEmpty &&
              u.assignments.forall(a => keyOf(a.key).isDefined &&
                !hasSubquery(a.value)) &&
              !u.condition.exists(hasSubquery) =>
          val tIds = rel.output.map(_.exprId).toSet
          def c(e: Expression): Column = StreamingFrameBridge.column(e.transform {
            case a: AttributeReference if tIds.contains(a.exprId) =>
              UnresolvedAttribute.quoted(a.name)
          })
          GraftUpdateCommand(tbl.iceberg,
            u.condition.map(c).getOrElse(lit(true)),
            u.assignments.map(a => keyOf(a.key).get -> c(a.value)))
        case _ => u
      }

    case m: MergeIntoTable
        if m.resolved && m.childrenResolved && !m.withSchemaEvolution =>
      m.targetTable match {
        case GraftTarget(rel, tbl) if tbl.pinned.isEmpty && supported(m) =>
          val tIds = rel.output.map(_.exprId).toSet
          val sOut = m.sourceTable.output
          def conv(e: Expression): Column = StreamingFrameBridge.column(e.transform {
            case a: AttributeReference if tIds.contains(a.exprId) =>
              UnresolvedAttribute(Seq("t", a.name))
          })
          def srcByName(n: String): Option[Column] =
            sOut.find(_.name.equalsIgnoreCase(n))
              .map(a => StreamingFrameBridge.column(a))
          def assigns(as: Seq[Assignment]): Seq[(String, Column)] =
            as.map(a => keyOf(a.key).get -> conv(a.value))
          def star(cond: Option[Expression]): Option[MergeUpdate] = {
            val byName = rel.output.map(a => a.name -> srcByName(a.name))
            if (byName.exists(_._2.isEmpty)) None
            else Some(MergeUpdate(cond.map(conv),
              byName.map { case (n, v) => n -> v.get }))
          }
          def matchedWhen(a: MergeAction): Option[MergeWhen] = a match {
            case UpdateAction(cond, as, _) => Some(MergeUpdate(cond.map(conv), assigns(as)))
            case DeleteAction(cond) => Some(MergeDelete(cond.map(conv)))
            case UpdateStarAction(cond) => star(cond)
            case _ => None
          }
          def insertWhen(a: MergeAction): Option[MergeInsert] = a match {
            case InsertAction(cond, as) => Some(MergeInsert(cond.map(conv), assigns(as)))
            case InsertStarAction(cond) =>
              star(cond).map(u => MergeInsert(u.condition, u.set))
            case _ => None
          }
          val matched = m.matchedActions.map(matchedWhen)
          val notMatched = m.notMatchedActions.map(insertWhen)
          val bySource = m.notMatchedBySourceActions.map(matchedWhen)
          if ((matched ++ bySource).exists(_.isEmpty) || notMatched.exists(_.isEmpty)) m
          else {
            // candidate pruning only composes when NO NOT MATCHED BY
            // SOURCE clause exists — those act on exactly the target
            // rows pruning would skip
            val canPrune = m.notMatchedBySourceActions.isEmpty
            // target-only ON conjuncts → static candidate predicate
            val targetOnly =
              if (!canPrune) Nil
              else splitConjunctivePredicates(m.mergeCondition)
                .filter(p => p.references.subsetOf(AttributeSet(rel.output)) &&
                  !hasSubquery(p))
            val candidate = targetOnly.reduceOption(And).map(e =>
              StreamingFrameBridge.column(e.transform {
                case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
              }))
            // equi-join ON conjuncts (t.k = <source expr>) → dynamic
            // source-key file pruning in the engine
            val equiKeys: Seq[(String, Column)] =
              if (!canPrune) Nil
              else splitConjunctivePredicates(m.mergeCondition).collect {
                case org.apache.spark.sql.catalyst.expressions.EqualTo(
                    t: AttributeReference, sExpr)
                    if tIds.contains(t.exprId) && !hasSubquery(sExpr) &&
                      sExpr.references.forall(a => !tIds.contains(a.exprId)) =>
                  t.name -> StreamingFrameBridge.column(sExpr)
                case org.apache.spark.sql.catalyst.expressions.EqualTo(
                    sExpr, t: AttributeReference)
                    if tIds.contains(t.exprId) && !hasSubquery(sExpr) &&
                      sExpr.references.forall(a => !tIds.contains(a.exprId)) =>
                  t.name -> StreamingFrameBridge.column(sExpr)
              }
            val targetSchema = StructType(rel.output.map(a =>
              StructField(a.name, a.dataType, a.nullable)))
            GraftMergeCommand(tbl.iceberg, m.sourceTable,
              conv(m.mergeCondition), matched.flatten, notMatched.flatten,
              bySource.flatten, candidate, targetSchema, equiKeys)
          }
        case _ => m
      }
  }

  private def supported(m: MergeIntoTable): Boolean = {
    def cleanAction(a: MergeAction): Boolean = a match {
      case UpdateAction(cond, as, _) =>
        !cond.exists(hasSubquery) &&
          as.forall(x => keyOf(x.key).isDefined && !hasSubquery(x.value))
      case InsertAction(cond, as) =>
        !cond.exists(hasSubquery) &&
          as.forall(x => keyOf(x.key).isDefined && !hasSubquery(x.value))
      case DeleteAction(cond) => !cond.exists(hasSubquery)
      case UpdateStarAction(cond) => !cond.exists(hasSubquery)
      case InsertStarAction(cond) => !cond.exists(hasSubquery)
      case _ => false
    }
    !hasSubquery(m.mergeCondition) &&
      (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
        .forall(cleanAction)
  }
}

private[sources] final case class GraftDeleteCommand(
    table: GraftSqlTable, condition: Column) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    table.deleteRows(condition)
    Seq.empty
  }
}

private[sources] final case class GraftDynamicOverwriteCommand(
    table: IcebergLikeTable, queryPlan: LogicalPlan,
    cols: Seq[String]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    // the query is already resolved/coerced against the table schema;
    // positional inserts may carry different output NAMES, so rebind
    // to the table's column names before the engine routes leaves
    val df = StreamingFrameBridge.ofRows(sparkSession, queryPlan)
      .toDF(cols: _*)
    table.overwritePartitions(df)
    Seq.empty
  }
}

private[sources] final case class GraftUpdateCommand(
    table: IcebergLikeTable, condition: Column,
    set: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    table.update(condition, set)
    Seq.empty
  }
}

private[sources] final case class GraftMergeCommand(
    table: IcebergLikeTable, sourcePlan: LogicalPlan, on: Column,
    matched: Seq[MergeWhen], notMatched: Seq[MergeInsert],
    notMatchedBySource: Seq[MergeWhen], candidate: Option[Column],
    targetSchema: StructType,
    equiKeys: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    val src = StreamingFrameBridge.ofRows(sparkSession, sourcePlan)
    table.mergeInto(src, on, matched, notMatched, notMatchedBySource,
      candidate, Some(targetSchema), equiKeys)
    Seq.empty
  }
}
