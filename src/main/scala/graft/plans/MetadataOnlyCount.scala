package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.{GraftLakeSource, GraftLakeTable, ManifestFileIndex}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.unsafe.types.UTF8String

/** Answers COUNT-shaped queries over a graft-lake table from the MANIFEST
  * — zero data files opened. Every committed file carries its parquet
  * footer row count in the manifest (`rows:` field), so
  *
  *   `SELECT COUNT(*) FROM t`                        → one summed literal
  *   `SELECT ts_hour, COUNT(*) FROM t GROUP BY 1`    → one row per live
  *                                                     partition value
  *
  * rewrite to a [[LocalRelation]]. At 100 TB this turns the most common
  * sanity query a pipeline runs (row-count the table / per-partition
  * ingest accounting) from a 400k-task scan into a metadata read — the
  * same trick Iceberg/Delta pull from their manifests, and the lake-side
  * sibling of Spark's own `OptimizeMetadataOnlyQuery` (which needs a
  * catalog table and only covers partition-key DISTINCT).
  *
  * Strictly guarded — the rewrite declines (leaving the scan untouched)
  * unless:
  *  - every live entry of the resolved snapshot records a row count
  *    (manifests written before row-count tracking fall back to scanning);
  *  - the snapshot carries NO live deletion vectors (DV'd rows are
  *    subtracted at read time; the manifest alone over-counts);
  *  - the aggregate is exactly global `COUNT(1)`s, or `COUNT(1)`s grouped
  *    on the partition column alone (any filter, any other aggregate, any
  *    DISTINCT/FILTER clause → no match);
  *  - the scan has no WAP/changefeed options (`stagedAsOf`/`changesFrom`).
  *
  * Time travel IS covered: `versionAsOf`/`timestampAsOf`/catalog-pinned
  * versions resolve to that snapshot's manifest, so a historical count is
  * also metadata-only. Disable with
  * `spark.graft.metadataCount.enabled=false`.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.metadataCount.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        unwrap(child) match {
          case Some(r) =>
            r.table match {
              case t: GraftLakeTable if t.lakeRoot.isDefined &&
                  !r.options.containsKey("stagedAsOf") &&
                  !r.options.containsKey("changesFrom") =>
                tryRewrite(agg, grouping, aggExprs, r, t).getOrElse(agg)
              case _ => agg
            }
          case None => agg
        }
    }
  }

  /** Accept the relation bare or under attribute-only Projects (column
    * pruning); anything computed in between defeats the match.
    */
  private def unwrap(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
    case r: DataSourceV2Relation => Some(r)
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) => unwrap(child)
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => !ae.isDistinct && ae.filter.isEmpty
      case _ => false
    }
    case _ => false
  }

  private def tryRewrite(agg: Aggregate, grouping: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      aggExprs: Seq[NamedExpression], r: DataSourceV2Relation, t: GraftLakeTable)
    : Option[LogicalPlan] = {
    val root = t.lakeRoot.get
    // a travel spec that does not RESOLVE must decline (not silently
    // count head) so the scan path raises its canonical loud error
    val version: Option[Int] =
      (Option(r.options.get("versionAsOf")), Option(r.options.get("timestampAsOf"))) match {
        case (Some(raw), _) =>
          Some(scala.util.Try(ManifestFileIndex.resolveVersionSpec(root, raw.trim))
            .getOrElse(return None))
        case (None, Some(raw)) =>
          Some(scala.util.Try(ManifestFileIndex.versionAt(root,
              GraftLakeSource.parseCutoffMillis(raw.trim)))
            .toOption.flatten.getOrElse(return None))
        case (None, None) => t.pinnedTableVersion
      }
    if (ManifestFileIndex.readDvs(root, version).nonEmpty) return None
    val (partCol, entries) = ManifestFileIndex.read(root, version).getOrElse(return None)
    if (!entries.forall(_.rowCount >= 0L)) return None

    grouping match {
      case Seq() if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
        val total = entries.iterator.map(_.rowCount).sum
        Some(LocalRelation(
          aggExprs.map(_.toAttribute),
          Seq(InternalRow.fromSeq(aggExprs.map(_ => total)))))
      case Seq(g: AttributeReference) if g.name == partCol &&
          aggExprs.nonEmpty && aggExprs.forall(e => isCountStar(e) || refersTo(e, g)) =>
        val byPart = entries.groupBy(_.partValue).toSeq.sortBy(_._1)
          .map { case (pv, es) => (pv, es.iterator.map(_.rowCount).sum) }
        val rows = byPart.map { case (pv, n) =>
          InternalRow.fromSeq(aggExprs.map { e =>
            if (isCountStar(e)) n else UTF8String.fromString(pv)
          })
        }
        Some(LocalRelation(aggExprs.map(_.toAttribute), rows))
      case _ => None
    }
  }

  /** The grouping attribute itself, or a rename of it. */
  private def refersTo(e: NamedExpression, g: Attribute): Boolean = e match {
    case a: AttributeReference        => a.exprId == g.exprId
    case Alias(a: AttributeReference, _) => a.exprId == g.exprId
    case _                            => false
  }
}
