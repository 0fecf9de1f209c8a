package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL DML completion for graft-lake tables: `UPDATE` and upsert-shaped
  * `MERGE INTO` convert to copy-on-write lake mutations at RESOLUTION
  * time — before Spark's row-level-operation rewrite rejects the table
  * (graft-lake doesn't implement `SupportsRowLevelOperations`; its
  * mutations are partition-granular CoW through [[graft.sources.LakeIO]],
  * which is the same execution the V2 rewrite would have planned, with
  * manifest-stats pruning on top). `DELETE FROM` needs no rule — it
  * reaches [[graft.sources.LakeIO.deleteWhere]] through `SupportsDelete`.
  *
  * Installed by [[GraftExtensions]] (`injectResolutionRule`). Expressions
  * travel to the command as SQL text (`Expression.sql`) so they re-resolve
  * by NAME against the freshly-read table, not by exprId.
  */
case class GraftDmlRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def lakeRoot(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => lakeRoot(child)
    case r: DataSourceV2Relation => r.table match {
      case t: org.apache.spark.sql.graft.GraftLakeTable
        if t.pinnedTableVersion.isEmpty => t.lakeRoot
      case _ => None
    }
    case _ => None
  }

  /** Re-target a resolved expression at a fresh read of the same table:
    * exprIds won't match, names will — swap every attribute for its
    * unqualified unresolved form and let the command's DataFrame ops
    * resolve by name.
    */
  private def unqualify(e: Expression): Expression = e.transform {
    case a: Attribute =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(table, assignments, condition) if u.resolved =>
      lakeRoot(table) match {
        case Some(root) =>
          // SQL text, not Expression objects: a RunnableCommand's fields
          // are scanned by checkAnalysis, so carried UnresolvedAttributes
          // would fail analysis of the converted plan
          val sets = assignments.map { a =>
            a.key match {
              case attr: Attribute => attr.name -> unqualify(a.value).sql
              case other => throw new UnsupportedOperationException(
                s"graft-lake UPDATE supports top-level columns only, got: ${other.sql}")
            }
          }
          GraftUpdateCommand(root, condition.map(c => unqualify(c).sql), sets)
        case None => u
      }

    // the reference's upsert: MERGE … ON t.k = s.k WHEN MATCHED THEN
    // UPDATE SET * WHEN NOT MATCHED THEN INSERT * — exactly
    // LakeIO.mergeInto. The analyzer may have expanded the star actions
    // into per-column identity assignments; both spellings are accepted,
    // anything with extra conditions/actions rejects loudly.
    case m @ MergeIntoTable(target, source, cond,
        matched, notMatched, Seq(), false)
        if m.resolved && isUpsertShape(matched, notMatched) =>
      lakeRoot(target) match {
        case Some(root) =>
          cond match {
            case EqualTo(l: Attribute, r: Attribute) if l.name == r.name =>
              GraftMergeCommand(root, source, l.name)
            case _ => throw new UnsupportedOperationException(
              "graft-lake MERGE supports a single same-named equi-key " +
              s"(ON t.k = s.k); got: ${cond.sql}")
          }
        case None => m
      }

    // INSERT OVERWRITE under partitionOverwriteMode=dynamic: Spark plans
    // OverwritePartitionsDynamic, which has NO V1 write fallback exec —
    // convert at resolution time into the lake's partition-granular CoW
    // (the same conversion class as UPDATE/MERGE above). Static
    // overwrite needs no rule: it reaches overwriteLake through the
    // V1 bridge's SupportsTruncate.
    case o @ OverwritePartitionsDynamic(table, query, _, _, _) if o.resolved =>
      lakeRoot(table) match {
        case Some(root) => GraftDynamicOverwriteCommand(root, query)
        case None => o
      }

    case other => other
  }

  /** WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *,
    * either as star actions or analyzer-expanded same-name identity
    * assignment lists.
    */
  private def isUpsertShape(matched: Seq[MergeAction],
      notMatched: Seq[MergeAction]): Boolean = {
    def identityAssigns(as: Seq[Assignment]): Boolean = as.forall { a =>
      (a.key, a.value) match {
        case (k: Attribute, v: Attribute) => k.name == v.name
        case _ => false
      }
    }
    (matched, notMatched) match {
      case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) => true
      case (Seq(UpdateAction(None, ua, _)), Seq(InsertAction(None, ia))) =>
        identityAssigns(ua) && identityAssigns(ia)
      case _ => false
    }
  }
}

/** `UPDATE <lake table> SET … [WHERE …]` → stats-pruned CoW update. */
case class GraftUpdateCommand(root: String, condSql: Option[String],
    sets: Seq[(String, String)]) extends LeafRunnableCommand {
  import org.apache.spark.sql.functions.expr
  override def run(session: SparkSession): Seq[Row] = {
    val cond: Column = condSql.map(expr).getOrElse(
      org.apache.spark.sql.functions.lit(true))
    // strategy is deployment config, like MERGE: cow rewrites touched
    // partitions; mor records a DV + appends the updated images
    session.conf.get("spark.graft.update.strategy", "cow") match {
      case "mor" =>
        graft.sources.LakeIO.updateWhereMoR(session, root, cond,
          sets.map { case (n, v) => n -> expr(v) })
      case "cow" =>
        graft.sources.LakeIO.updateWhere(session, root, cond,
          sets.map { case (n, v) => n -> expr(v) })
      case other => throw new IllegalArgumentException(
        s"spark.graft.update.strategy must be cow|mor, got '$other'")
    }
    Seq.empty
  }
}

/** Upsert-shaped `MERGE INTO` → [[graft.sources.LakeIO.mergeInto]] (the
  * copy-on-write default) or [[graft.sources.LakeIO.mergeIntoMoR]]
  * (deletion-vector + append, no file rewrites) when the session sets
  * `spark.graft.merge.strategy=mor` — strategy is deployment config, not
  * query text, exactly like Delta's merge tuning knobs. The two are
  * observationally equivalent (LakeMorMergeSpec / identical oracles).
  */
/** `INSERT OVERWRITE` (dynamic mode) → replace exactly the hour
  * partitions the query's rows touch, as one snapshot commit.
  */
case class GraftDynamicOverwriteCommand(root: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftBridge.ofRows(session, query)
    graft.sources.LakeIO.overwritePartitionsDynamic(
      session, root, df.drop("ts_hour"))
    Seq.empty
  }
}

case class GraftMergeCommand(root: String, source: LogicalPlan, key: String)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftBridge.ofRows(session, source)
    session.conf.get("spark.graft.merge.strategy", "cow") match {
      case "mor" =>
        graft.sources.LakeIO.mergeIntoMoR(session, root, src.drop("ts_hour"), Seq(key))
      case "cow" =>
        graft.sources.LakeIO.mergeInto(session, root, src.drop("ts_hour"), key)
      case other => throw new IllegalArgumentException(
        s"spark.graft.merge.strategy must be cow|mor, got '$other'")
    }
    Seq.empty
  }
}
