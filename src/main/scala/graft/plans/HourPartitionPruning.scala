package graft.plans

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType, TimestampType}

/** Iceberg-style *hidden* partition pruning for the graft lake layout
  * (reference: trino/sql/init-tables.sql:11 `partitioning=ARRAY['hour(ts)']`
  * — Trino prunes on raw `ts` predicates because Iceberg tracks the
  * hour(ts) transform; Spark's directory partitioning only prunes on the
  * physical `ts_hour` column).
  *
  * This optimizer rule closes that gap: for any Filter over a relation
  * exposing both `ts: timestamp` and `ts_hour: string` (the LakeIO
  * layout), it derives the implied `ts_hour` predicates from `ts`
  * comparisons and `hour(ts) = k` equalities and conjoins them, so
  * Catalyst's PruneFileSourcePartitions can skip directories. Users write
  * `WHERE ts >= '…'` as if partitioning were invisible — at 100 TB this
  * turns full-lake listings into a handful of hour directories.
  *
  * Derivations (UTC session, `ts_hour = date_format(ts,'yyyy-MM-dd-HH')`):
  *  - `ts >= T` / `ts > T`  → `ts_hour >= hour_str(T)` (truncation-safe)
  *  - `ts <= T` / `ts < T`  → `ts_hour <= hour_str(T)`
  *  - `hour(ts) = k`        → `ts_hour LIKE '%-kk'` (endsWith)
  */
object HourPartitionPruning extends Rule[LogicalPlan] {

  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd-HH").withZone(ZoneOffset.UTC)

  private def hourStr(micros: Long): String =
    fmt.format(Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L)))

  private def lit(s: String): Literal = Literal.create(s, StringType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val tsOpt = child.output.find(a =>
        a.name == "ts" && a.dataType == TimestampType)
      val hrOpt = child.output.find(a =>
        a.name == "ts_hour" && a.dataType == StringType)
      (tsOpt, hrOpt) match {
        // cond already touching ts_hour ⇒ user-managed or already
        // rewritten; leave it (also makes the rule idempotent).
        case (Some(ts), Some(hr)) if !cond.references.contains(hr) =>
          val derived = splitConjuncts(cond).flatMap(derive(_, ts, hr))
          if (derived.isEmpty) f
          else Filter(And(derived.reduce(And), cond), child)
        case _ => f
      }
  }

  /** Public so the DataSourceV2 lake source (GraftLakeSource) can run the
    * same ts→ts_hour derivation at the scan-builder boundary.
    */
  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  def derive(e: Expression, ts: Attribute, hr: Attribute): Option[Expression] =
    e match {
      case GreaterThanOrEqual(a: Attribute, Literal(v: Long, TimestampType))
          if a.semanticEquals(ts) => Some(GreaterThanOrEqual(hr, lit(hourStr(v))))
      case GreaterThan(a: Attribute, Literal(v: Long, TimestampType))
          if a.semanticEquals(ts) => Some(GreaterThanOrEqual(hr, lit(hourStr(v))))
      case LessThanOrEqual(a: Attribute, Literal(v: Long, TimestampType))
          if a.semanticEquals(ts) => Some(LessThanOrEqual(hr, lit(hourStr(v))))
      case LessThan(a: Attribute, Literal(v: Long, TimestampType))
          if a.semanticEquals(ts) => Some(LessThanOrEqual(hr, lit(hourStr(v))))
      // mirrored operand order
      case GreaterThanOrEqual(Literal(v: Long, TimestampType), a: Attribute)
          if a.semanticEquals(ts) => Some(LessThanOrEqual(hr, lit(hourStr(v))))
      case LessThanOrEqual(Literal(v: Long, TimestampType), a: Attribute)
          if a.semanticEquals(ts) => Some(GreaterThanOrEqual(hr, lit(hourStr(v))))
      case GreaterThan(Literal(v: Long, TimestampType), a: Attribute)
          if a.semanticEquals(ts) => Some(LessThanOrEqual(hr, lit(hourStr(v))))
      case LessThan(Literal(v: Long, TimestampType), a: Attribute)
          if a.semanticEquals(ts) => Some(GreaterThanOrEqual(hr, lit(hourStr(v))))
      // hour(ts) = k  →  ts_hour endsWith "-kk"
      case EqualTo(h: Hour, Literal(k: Int, IntegerType))
          if h.child.semanticEquals(ts) => Some(EndsWith(hr, lit(f"-$k%02d")))
      case EqualTo(Literal(k: Int, IntegerType), h: Hour)
          if h.child.semanticEquals(ts) => Some(EndsWith(hr, lit(f"-$k%02d")))
      case _ => None
    }

  /** Install into an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` entry point:
  * the pruning rule, the as-of strategy, and the engine's native SQL
  * functions (so the SQL text path can call `vector_dot(a, b)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApplyDeletionVectors)
    e.injectOptimizerRule(_ => MetadataOnlyCount)
    e.injectOptimizerRule(_ => HourPartitionPruning)
    e.injectOptimizerRule(_ => MaterializedViewRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL UPDATE / upsert-shaped MERGE INTO on graft-lake tables →
    // stats-pruned copy-on-write commands (resolution-time, before
    // Spark's row-level rewrite rejects the table)
    e.injectResolutionRule(s => GraftDmlRewrite(s))
    // lake maintenance SQL (OPTIMIZE / VACUUM / DESCRIBE HISTORY) —
    // full-match intercepts only; everything else reaches Spark's parser
    e.injectParser((s, p) => GraftSqlParser(s, p))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.VectorDot].getName, "vector_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VectorDot(children(0), children(1))))
  }
}
