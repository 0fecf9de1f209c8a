package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Merging t-digest buffer (Dunning & Ertl's streaming quantile sketch,
  * https://arxiv.org/abs/1902.04023): a sorted list of (mean, weight)
  * centroids whose sizes are bounded by the k1 scale function
  * `k(q) = δ/2π · asin(2q−1)` — clusters may span at most one unit of
  * k-space, so resolution concentrates at the tails (q→0, q→1) where
  * quantile queries need it, and the centroid count stays O(δ)
  * regardless of input size.
  *
  * Mergeable by construction: merging = concatenate centroid lists and
  * re-compress, the exact operation partial aggregation needs. Unlike
  * KMV-style sketches the merge is not bit-identical to a single-pass
  * sketch of the union, but the k-space size bound (and thus the error
  * bound) is preserved through any merge tree — the property proved in
  * TDigestSpec.
  *
  * δ=100 ⇒ ≤ ~200 centroids ⇒ 3.2 KiB shuffled per group; mid-quantile
  * error ~0.3% in q-space, tail quantiles an order better.
  */
final class TDigestBuffer(val compression: Double) {
  var means: Array[Double] = Array.emptyDoubleArray
  var weights: Array[Double] = Array.emptyDoubleArray
  var total: Double = 0.0
  var lo: Double = Double.PositiveInfinity
  var hi: Double = Double.NegativeInfinity

  // unmerged points; compressed in batches so add() is O(1) amortized
  private var bufN = 0
  private var bufM = new Array[Double](math.max(64, 4 * compression.toInt))
  private var bufW = new Array[Double](bufM.length)

  def add(x: Double, w: Double = 1.0): Unit = {
    if (bufN == bufM.length) compress()
    bufM(bufN) = x; bufW(bufN) = w; bufN += 1
    if (x < lo) lo = x
    if (x > hi) hi = x
  }

  def mergeIn(other: TDigestBuffer): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      add(other.means(i), other.weights(i)); i += 1
    }
    if (other.lo < lo) lo = other.lo
    if (other.hi > hi) hi = other.hi
    compress()
  }

  private def k1(q: Double): Double =
    compression / (2 * math.Pi) *
      math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Fold the unmerged buffer into the centroid list: sort everything by
    * mean, then one greedy pass merging neighbours while the combined
    * cluster spans ≤ 1 unit of k-space.
    */
  def compress(): Unit = {
    if (bufN == 0) return
    val n = means.length + bufN
    val idx = (0 until n).sortBy(i =>
      if (i < means.length) means(i) else bufM(i - means.length))
    def m(i: Int) = if (i < means.length) means(i) else bufM(i - means.length)
    def w(i: Int) = if (i < means.length) weights(i) else bufW(i - means.length)
    val newTotal = idx.iterator.map(w).sum

    val outM = new scala.collection.mutable.ArrayBuffer[Double](n)
    val outW = new scala.collection.mutable.ArrayBuffer[Double](n)
    var cm = m(idx.head); var cw = w(idx.head)
    var cumBefore = 0.0
    var kLo = k1(0.0)
    var j = 1
    while (j < n) {
      val i = idx(j)
      val proposed = cw + w(i)
      if (k1((cumBefore + proposed) / newTotal) - kLo <= 1.0) {
        // weighted-mean update keeps the cluster centroid exact
        cm += (m(i) - cm) * (w(i) / proposed)
        cw = proposed
      } else {
        outM += cm; outW += cw; cumBefore += cw
        kLo = k1(cumBefore / newTotal)
        cm = m(i); cw = w(i)
      }
      j += 1
    }
    outM += cm; outW += cw
    means = outM.toArray; weights = outW.toArray
    total = newTotal
    bufN = 0
  }

  /** Quantile estimate: linear interpolation between centroid midpoints
    * in cumulative-weight space, anchored at the exact min/max.
    *
    * Interpolation hygiene (caught by PropertySpec): `a + f*(b - a)` at
    * f = 1 is not exactly `b` in floating point (cancellation can land
    * 1 ulp past it), which both escapes the [min, max] envelope and
    * breaks monotonicity across segment boundaries — so f ≥ 1 returns
    * the segment endpoint exactly, and the result is clamped to the
    * observed range (a quantile of the data cannot lie outside it).
    */
  def quantile(q: Double): Double = {
    compress()
    if (total == 0.0) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * total
    def lerp(a: Double, b: Double, f: Double): Double = {
      val v = if (f >= 1.0) b else if (f <= 0.0) a else a + f * (b - a)
      math.min(hi, math.max(lo, v))
    }
    var prevMean = lo
    var prevC = 0.0
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val c = cum + weights(i) / 2
      if (target <= c) {
        val f = if (c == prevC) 1.0 else (target - prevC) / (c - prevC)
        return lerp(prevMean, means(i), f)
      }
      prevMean = means(i); prevC = c; cum += weights(i); i += 1
    }
    val f = if (total == prevC) 1.0 else (target - prevC) / (total - prevC)
    lerp(prevMean, hi, f)
  }

  def centroidCount: Int = { compress(); means.length }
}

/** `tdigest_quantile(x, q)` as a native mergeable aggregate: partial
  * sketches per task, ≤ ~2δ centroids (3.2 KiB at δ=100) shuffled per
  * group, centroid-list merge at the final stage — the same
  * partial/final shape as [[KmvSketchAgg]], so a 100 TB percentile costs
  * one scan plus a kilobytes-per-group shuffle. Spark's own
  * `percentile_approx` (GK sketch) is the built-in alternative; t-digest
  * holds relative accuracy at the extreme tails (p99.9 latency shapes),
  * which is the reason to carry a custom kernel.
  */
case class TDigestQuantileAgg(
    child: Expression,
    q: Double,
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] with UnaryLike[Expression] {

  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantile expects a numeric input, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(compression)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case d: Double => d
        case f: Float  => f.toDouble
        case l: Long   => l.toDouble
        case i: Int    => i.toDouble
      }
      buf.add(x)
    }
    buf
  }

  override def merge(buf: TDigestBuffer, other: TDigestBuffer): TDigestBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TDigestBuffer): Any = {
    val est = buf.quantile(q)
    if (est.isNaN) null else est
  }

  override def serialize(buf: TDigestBuffer): Array[Byte] = {
    buf.compress()
    val n = buf.means.length
    val bb = java.nio.ByteBuffer.allocate(4 + 16 + 16 * n)
    bb.putInt(n).putDouble(buf.lo).putDouble(buf.hi)
    var i = 0
    while (i < n) { bb.putDouble(buf.means(i)).putDouble(buf.weights(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TDigestBuffer(compression)
    buf.lo = bb.getDouble; buf.hi = bb.getDouble
    val ms = new Array[Double](n); val ws = new Array[Double](n)
    var i = 0
    var t = 0.0
    while (i < n) { ms(i) = bb.getDouble; ws(i) = bb.getDouble; t += ws(i); i += 1 }
    buf.means = ms; buf.weights = ws; buf.total = t
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantileAgg =
    copy(child = newChild)
}

object TDigest {
  /** Column-API entry point: approximate q-quantile of `c`. */
  def tdigestQuantile(c: Column, q: Double, compression: Double = 100.0): Column =
    GraftBridge.column(
      TDigestQuantileAgg(GraftBridge.expression(c), q, compression)
        .toAggregateExpression())
}
