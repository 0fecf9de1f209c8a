package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.graft.{GraftLakeScan, GraftLakeSource, GraftLakeTable, ManifestFileIndex}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.LakeIO

/** Makes merge-on-read deletes VISIBLE TO EVERY READER, not just
  * [[LakeIO.readMoR]]: any graft-lake relation whose resolved snapshot
  * carries live deletion vectors (`#dv` manifest lines) is rewritten to
  * the DV-applied scan — the same broadcast anti-join on (file, row
  * index) `readMoR` performs — so plain `spark.read.format("graft-lake")`
  * loads, catalog SQL, time travel (`versionAsOf`/`timestampAsOf`, each
  * with its OWN snapshot's DV set), and WAP audits (`stagedAsOf`) all see
  * the logical table state. Without this, a `deleteWhereMoR` (the GDPR-
  * delete path) would be honored only by callers who remembered to use
  * `readMoR` — Delta/Iceberg apply DVs on all reads, and so does this.
  *
  * Snapshots with NO live DVs (the steady state — `compactDeletes` folds
  * them away) are untouched: the manifest-planned V2 fast path stays.
  *
  * Two match shapes, because the rule is installable two ways:
  *  - via `GraftExtensions` (`injectOptimizerRule`): runs inside operator
  *    optimization, BEFORE V2 pushdown — matches [[DataSourceV2Relation]]
  *    and the rewrite is unconditionally safe (no filters consumed yet);
  *  - via `Graft.install` (`experimental.extraOptimizations`): runs AFTER
  *    pushdown — matches [[DataSourceV2ScanRelation]]; a scan whose
  *    partition/data filters were already consumed cannot be re-planned
  *    faithfully here, so a DV-carrying FILTERED scan REFUSES loudly
  *    rather than silently resurrecting deleted rows.
  *
  * Change-feed scans (`changesFrom`/`changesTo`) are excluded: each diff
  * side has a different DV baseline, handled exactly in
  * [[LakeIO.readChanges]].
  */
object ApplyDeletionVectors extends Rule[LogicalPlan] {

  /** Sessions this rule has PROVABLY run in. `GraftLakeSource`'s
    * renamed/mixed-era scan guard needs to know whether the rewrite is
    * active, but a session built with
    * `SparkSession.builder().withExtensions(...)` leaves
    * `spark.sql.extensions` unset and `experimental.extraOptimizations`
    * empty — undetectable from configuration. The rule itself is the
    * ground truth: injected optimizer rules run on EVERY query's plan,
    * in the operator-optimization batch BEFORE V2 pushdown invokes the
    * scan guard, so within the very first query the session is marked
    * before the guard ever asks.
    */
  private val ranInSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Did this rule run in `s` (any install path)? Keyed on the session
    * object itself through a weak map: identity-exact (no hash reuse
    * after GC, unlike `identityHashCode`) and entries die with their
    * session, so the set cannot grow without bound in a long-lived JVM
    * cycling many sessions.
    */
  def ranIn(s: SparkSession): Boolean = ranInSessions.containsKey(s)

  /** Is the rewrite ACTIVE in `s`, deciding cold-start exactly? `ranIn`
    * is ground truth but only populated once a query has been optimized
    * in the session; the conf sniff covers `spark.sql.extensions`
    * installs before their first query; and for `builder()
    * .withExtensions(...)` installs (which leave the conf unset) the
    * last resort is a PROBE — optimize one trivial `range(1)` plan: if
    * the rule is injected it runs and marks the session, if not the
    * probe is a few-microsecond no-op and the answer is a true negative.
    * The probe never touches a graft-lake relation, so it cannot recurse
    * into the scan guard that calls this.
    */
  def activeIn(s: SparkSession): Boolean =
    ranIn(s) ||
      s.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")) ||
      s.experimental.extraOptimizations
        .exists(_.ruleName.endsWith("ApplyDeletionVectors")) || {
        // `apply` marks the thread's ACTIVE session, so pin it to `s`
        // for the probe (a bare queryExecution access is not wrapped in
        // `withActive` the way actions are)
        val prev = SparkSession.getActiveSession
        try {
          SparkSession.setActiveSession(s)
          s.range(1).queryExecution.optimizedPlan
        } finally {
          prev match {
            case Some(p) => SparkSession.setActiveSession(p)
            case None    => SparkSession.clearActiveSession()
          }
        }
        ranIn(s)
      }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    SparkSession.getActiveSession.foreach(s =>
      ranInSessions.put(s, java.lang.Boolean.TRUE))
    applyImpl(plan)
  }

  private def applyImpl(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: DataSourceV2Relation => r.table match {
      case t: GraftLakeTable if eligible(t, r.options) =>
        resolve(t, r.options) match {
          case None => r
          case Some((entries, dvs, schema)) =>
            rewrite(r.output, t.lakeRoot.get, entries, dvs, schema)
              .getOrElse(refuse(t))
        }
      case _ => r
    }
    case sr: DataSourceV2ScanRelation => (sr.relation.table, sr.scan) match {
      case (t: GraftLakeTable, g: GraftLakeScan)
          if eligible(t, sr.relation.options) =>
        resolve(t, sr.relation.options) match {
          case None => sr
          case Some((entries, dvs, schema)) =>
            if (g.initial.partitionFilters.nonEmpty ||
                g.initial.dataFilters.nonEmpty ||
                g.initial.pushedAggregate.nonEmpty) refuse(t)
            else rewrite(sr.output, t.lakeRoot.get, entries, dvs, schema)
              .getOrElse(refuse(t))
        }
      case _ => sr
    }
  }

  private def eligible(t: GraftLakeTable, opts: CaseInsensitiveStringMap): Boolean =
    t.lakeRoot.isDefined && !opts.containsKey("changesFrom")

  private def refuse(t: GraftLakeTable): Nothing =
    throw new UnsupportedOperationException(
      s"table ${t.lakeRoot.getOrElse(t.name())} has live deletion vectors " +
        "and this scan shape cannot apply them (already-pushed filters or " +
        "aggregates) — read via LakeIO.readMoR, install GraftExtensions " +
        "(spark.sql.extensions=graft.plans.GraftExtensions), or fold the " +
        "deletes with LakeIO.compactDeletes")

  /** (live entries, live DV paths, snapshot schema) of the snapshot this
    * relation's reader options resolve to — None when that snapshot has
    * no deletion vectors AND the table has no column-rename history
    * (leave the plan alone: the manifest-planned V2 fast path is exact).
    * A rename history forces the rewrite even with zero DVs, because the
    * delegated parquet scan would null-fill the renamed column on files
    * written before the rename — [[LakeIO.mappedScan]] resolves them by
    * coalescing the field's historical names.
    */
  private def resolve(t: GraftLakeTable, opts: CaseInsensitiveStringMap)
    : Option[(Seq[ManifestFileIndex.Entry], Seq[String], Option[StructType])] = {
    val root = t.lakeRoot.get
    val renamed = LakeIO.columnHistories(root).nonEmpty
    // a mixed-ERA manifest (partition evolution mid-convergence) also
    // forces the V1 rewrite: the delegated V2 scan would parse day-era
    // directory values as the current partition column
    def mixedEra(partCol: String, es: Seq[ManifestFileIndex.Entry]): Boolean =
      es.exists(!_.relPath.startsWith(partCol + "="))
    Option(opts.get("stagedAsOf")).map(_.trim) match {
      case Some(id) =>
        // staged (WAP) reads are base + staged files: the BASE's live DVs
        // still apply (a staged append neither adds nor clears DVs)
        val dvs = ManifestFileIndex.readDvs(root)
        ManifestFileIndex.readStaged(root, id).flatMap { case (pc, entries) =>
          if (dvs.isEmpty && !renamed && !mixedEra(pc, entries)) None
          else Some((entries, dvs, LakeIO.tableSchema(root)))
        }
      case None =>
        val version: Option[Int] =
          Option(opts.get("versionAsOf"))
            .map(raw => ManifestFileIndex.resolveVersionSpec(root, raw.trim))
            .orElse(Option(opts.get("timestampAsOf")).flatMap(raw =>
              ManifestFileIndex.versionAt(root,
                GraftLakeSource.parseCutoffMillis(raw.trim))))
            .orElse(t.pinnedTableVersion)
        val dvs = ManifestFileIndex.readDvs(root, version)
        ManifestFileIndex.read(root, version).flatMap { case (pc, entries) =>
          if (dvs.isEmpty && !renamed && !mixedEra(pc, entries)) None
          else Some((entries, dvs,
            version.flatMap(v => ManifestFileIndex.snapshotSchema(root, v))
              .orElse(LakeIO.tableSchema(root))))
        }
    }
  }

  /** Splice the DV-applied scan in, preserving the relation's output
    * attribute ids/names/types so the substitution is invisible to the
    * rest of the plan.
    */
  private def rewrite(
      output: Seq[org.apache.spark.sql.catalyst.expressions.AttributeReference],
      root: String, entries: Seq[ManifestFileIndex.Entry], dvs: Seq[String],
      schema: Option[StructType]): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val outCols = output.map(_.name)
    val df = LakeIO.dvAppliedScan(spark, root, entries, dvs, schema, outCols)
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    if (!outCols.forall(byName.contains)) None
    else Some(Project(
      output.map { o =>
        val n = byName(o.name)
        val e = if (n.dataType == o.dataType) n
                else Cast(n, o.dataType)
        Alias(e, o.name)(exprId = o.exprId)
      },
      analyzed))
  }
}
