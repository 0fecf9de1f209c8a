package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, Expression, Literal, NamedExpression, Predicate}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.{GraftLakeSource, GraftLakeTable, ManifestFileIndex}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Answers COUNT / MIN / MAX / partition-DISTINCT queries over a
  * graft-lake table from the MANIFEST — zero data files opened. Every
  * committed file carries its parquet footer row count (`rows:` field)
  * and per-column INT64/DOUBLE bounds, so
  *
  *   `SELECT COUNT(*) FROM t`                        → one summed literal
  *   `SELECT ts_hour, COUNT(*) FROM t GROUP BY 1`    → one row per live
  *                                                     partition value
  *   `SELECT MIN(event_id), MAX(value) FROM t`       → folded file bounds
  *   `SELECT DISTINCT ts_hour FROM t`                → the partition list
  *
  * rewrite to a [[LocalRelation]]. At 100 TB this turns the sanity
  * queries every pipeline runs (row counts, ingest watermarks, partition
  * inventory) from 400k-task scans into metadata reads — the manifest
  * trick Iceberg/Delta pull, and a lake-side generalization of Spark's
  * own `OptimizeMetadataOnlyQuery` (catalog tables, partition keys only).
  *
  * Strictly guarded — the rewrite declines (leaving the scan untouched)
  * unless:
  *  - every live entry of the resolved snapshot records a row count
  *    (COUNT) / bounds for the referenced column (MIN/MAX) — manifests or
  *    columns without stats fall back to scanning. String MIN/MAX is
  *    answered only for the partition column (partition VALUES are exact;
  *    data-file string stats may be writer-truncated); doubles whose NaN
  *    rows poisoned the file bounds carry no dblStats entry and decline.
  *  - the snapshot carries NO live deletion vectors (a DV could hide the
  *    counted/extreme row);
  *  - the aggregate is built ONLY of `COUNT(1)` (no DISTINCT/FILTER),
  *    `MIN`/`MAX` of an answerable column, and the grouping attribute,
  *    grouped globally or on the partition column alone (any other
  *    aggregate → no match);
  *  - WHERE clauses, if present, reference ONLY the partition column —
  *    they evaluate against the partition VALUES (whole files in or
  *    out), so `COUNT(*) WHERE ts_hour BETWEEN …` is also metadata-only;
  *    any predicate touching a data column falls back to the scan;
  *  - the scan has no WAP/changefeed options (`stagedAsOf`/`changesFrom`).
  *
  * Time travel IS covered: `versionAsOf`/`timestampAsOf`/catalog-pinned
  * versions resolve to that snapshot's manifest — a travel spec that
  * fails to resolve declines so the scan raises its canonical error.
  * Disable with `spark.graft.metadataCount.enabled=false`.
  */
object MetadataOnlyCount extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.metadataCount.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(grouping, aggExprs, child, _) =>
        unwrap(child) match {
          case Some((r, filters)) =>
            r.table match {
              case t: GraftLakeTable if t.lakeRoot.isDefined &&
                  !r.options.containsKey("stagedAsOf") &&
                  !r.options.containsKey("branch") && // staged-read sugar
                  !r.options.containsKey("changesFrom") =>
                tryRewrite(grouping, aggExprs, filters, r, t).getOrElse(agg)
              case _ => agg
            }
          case None => agg
        }
    }
  }

  /** Accept the relation bare or under attribute-only Projects (column
    * pruning) and Filters (collected for partition-only evaluation);
    * anything computed in between defeats the match.
    */
  private def unwrap(p: LogicalPlan): Option[(DataSourceV2Relation, Seq[Expression])] =
    p match {
      case r: DataSourceV2Relation => Some((r, Nil))
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) => unwrap(child)
      case Filter(cond, child) =>
        unwrap(child).map { case (r, fs) => (r, cond +: fs) }
      case _ => None
    }

  /** What one output expression asks for, when answerable from metadata. */
  private sealed trait Ask
  private case object CountStar extends Ask
  private case object GroupRef extends Ask
  private case class Bound(colName: String, isMin: Boolean,
      dt: org.apache.spark.sql.types.DataType) extends Ask

  private def classify(e: NamedExpression, group: Option[Attribute]): Option[Ask] = e match {
    case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _)))    => Some(CountStar)
        case Min(a: AttributeReference)   => Some(Bound(a.name, isMin = true, a.dataType))
        case Max(a: AttributeReference)   => Some(Bound(a.name, isMin = false, a.dataType))
        case _ => None
      }
    case a: AttributeReference if group.exists(_.exprId == a.exprId) => Some(GroupRef)
    case Alias(a: AttributeReference, _) if group.exists(_.exprId == a.exprId) =>
      Some(GroupRef)
    case _ => None
  }

  /** Fold a column bound over an entry set; None = some file lacks the
    * stat (decline — conservativeness is the whole contract).
    */
  private def fold(entries: Seq[ManifestFileIndex.Entry], b: Bound,
      partCol: String): Option[Any] = b.dt match {
    case LongType =>
      val vs = entries.map(e => e.stats.get(b.colName))
      if (vs.exists(_.isEmpty)) None
      else Some(if (b.isMin) vs.map(_.get._1).min else vs.map(_.get._2).max)
    case DoubleType =>
      val vs = entries.map(e => e.dblStats.get(b.colName))
      if (vs.exists(_.isEmpty)) None
      else {
        val v = if (b.isMin) vs.map(_.get._1).min else vs.map(_.get._2).max
        // parquet footers order -0.0 < 0.0; Spark's execution path
        // normalizes -0.0 to 0.0 (UnsafeRow), so a scan-computed MIN
        // would report 0.0 — match it
        Some(if (v == 0.0d) 0.0d else v)
      }
    case StringType if b.colName == partCol =>
      // partition VALUES are exact (they are the directory layout);
      // ASCII ts_hour strings order identically in JVM and SQL
      Some(UTF8String.fromString(
        if (b.isMin) entries.map(_.partValue).min else entries.map(_.partValue).max))
    case _ => None
  }

  private def tryRewrite(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression], filters: Seq[Expression],
      r: DataSourceV2Relation, t: GraftLakeTable)
    : Option[LogicalPlan] = {
    val root = t.lakeRoot.get
    // a travel spec that does not RESOLVE must decline (not silently
    // answer head) so the scan path raises its canonical loud error
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
    val (partCol, allEntries) = ManifestFileIndex.read(root, version).getOrElse(return None)
    // a MIXED-ERA manifest (partition evolution mid-convergence) must
    // decline: a day-era file's partValue is NOT a value of the current
    // partition column — grouping or filtering on it would emit wrong
    // group keys / wrong membership
    if (allEntries.exists(!_.relPath.startsWith(partCol + "="))) return None

    // partition-only filters evaluate against the partition VALUE — a
    // predicate that touches any data column (or is nondeterministic)
    // declines; partition membership is exact, so whole files are in or
    // out and every downstream sum/bound stays correct
    val entries: Seq[ManifestFileIndex.Entry] =
      if (filters.isEmpty) allEntries
      else {
        val partAttr = r.output.find(a => a.name == partCol && a.dataType == StringType)
          .getOrElse(return None)
        if (!filters.forall(f =>
          f.deterministic && f.references.subsetOf(AttributeSet(partAttr)))) return None
        val preds = filters.map(f => Predicate.create(f, Seq(partAttr)))
        allEntries.filter { e =>
          val row = InternalRow(UTF8String.fromString(e.partValue))
          preds.forall(_.eval(row))
        }
      }

    val group: Option[Attribute] = grouping match {
      case Seq()                                         => None
      case Seq(g: AttributeReference) if g.name == partCol => Some(g)
      case _                                             => return None
    }
    if (aggExprs.isEmpty) return None
    val asks = aggExprs.map(e => classify(e, group).getOrElse(return None))
    if (asks.contains(CountStar) && !entries.forall(_.rowCount >= 0L)) return None

    def row(es: Seq[ManifestFileIndex.Entry], pv: Option[String]): Option[InternalRow] = {
      val vals = asks.map {
        case CountStar => es.iterator.map(_.rowCount).sum
        case GroupRef  => UTF8String.fromString(pv.get)
        case b: Bound  =>
          if (es.isEmpty) null // SQL MIN/MAX of empty input
          else fold(es, b, partCol).getOrElse(return None)
      }
      Some(InternalRow.fromSeq(vals))
    }

    group match {
      case None =>
        row(entries, None).map(r0 =>
          LocalRelation(aggExprs.map(_.toAttribute), Seq(r0)))
      case Some(_) =>
        val rows = entries.groupBy(_.partValue).toSeq.sortBy(_._1).map {
          case (pv, es) => row(es, Some(pv)).getOrElse(return None)
        }
        Some(LocalRelation(aggExprs.map(_.toAttribute), rows))
    }
  }
}
