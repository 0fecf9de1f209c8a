package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the (c) tier of the custom-operator ladder: a
  * custom `LogicalPlan` + `Strategy` + `SparkPlan` for an operator Spark
  * lacks. Each left row is matched to the LAST right row of the same key
  * with `right.time <= left.time` (inclusive, inner semantics).
  *
  * Compared to the composed union+window form
  * ([[graft.operators.TemporalJoins.asofJoin]]): both sides hash-cluster
  * on the key and sort by (key, time) — the same shuffle cost — but the
  * merge is a single forward pass per partition holding ONE retained row,
  * instead of a window operator buffering the unioned stream. At 100 TB
  * the state difference (O(1) vs O(window frame)) and the absence of the
  * union materialization are the win.
  *
  * Contract: `leftKey`/`rightKey` and `leftTime`/`rightTime` are LongType
  * attributes of the respective children (the API wrapper converts
  * timestamps to epoch micros); right output columns must be pre-renamed
  * to avoid collisions. Output = left.output ++ right.output.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // co-cluster both sides on the key (EnsureRequirements inserts
  // compatible hash shuffles), then sort each by (key, time) so the
  // per-partition merge is one forward pass.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val kL = left.output.indexWhere(_.exprId == leftKey.exprId)
    val tL = left.output.indexWhere(_.exprId == leftTime.exprId)
    val kR = right.output.indexWhere(_.exprId == rightKey.exprId)
    val tR = right.output.indexWhere(_.exprId == rightTime.exprId)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // retained right rows outlive the iterator step → copy on read
      val rCopied = rIter.map(_.copy())
      new Iterator[InternalRow] {
        private val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        private var rNext: InternalRow = if (rCopied.hasNext) rCopied.next() else null
        private var last: InternalRow = null
        private var out: InternalRow = _

        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = l.getLong(kL)
            val lt = l.getLong(tL)
            // consume right rows that are now "in the past" for this left
            while (rNext != null && (rNext.getLong(kR) < lk ||
                (rNext.getLong(kR) == lk && rNext.getLong(tR) <= lt))) {
              if (rNext.getLong(kR) == lk) last = rNext
              rNext = if (rCopied.hasNext) rCopied.next() else null
            }
            if (last != null && last.getLong(kR) == lk) {
              out = joined(l, last)
              return true
            }
            // inner semantics: left rows with no prior right row drop
          }
          false
        }

        private var ready = false
        override def hasNext: Boolean = { if (!ready) ready = advance(); ready }
        override def next(): InternalRow = { if (!ready) advance(); ready = false; out }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, kL, kR, tL, tR) =>
      AsOfJoinExec(planLater(l), planLater(r), kL, kR, tL, tR) :: Nil
    case _ => Nil
  }

  /** Install into an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(this))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ this
}

object AsOfJoin {

  /** DataFrame API: as-of join `l` with `r` on `keyCol`, matching the
    * last `r` row with `r.timeCol <= l.timeCol`. `r`'s columns must not
    * collide with `l`'s (rename first). Key and time columns must be
    * LongType on both sides (epoch micros for timestamps).
    */
  def apply(l: DataFrame, r: DataFrame, lKey: String, rKey: String,
      lTime: String, rTime: String): DataFrame = {
    val spark = l.sparkSession
    AsOfJoinStrategy.install(spark)
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, lKey), attr(rp, rKey), attr(lp, lTime), attr(rp, rTime)))
  }
}
