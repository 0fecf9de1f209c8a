package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * distinct 64-bit hashes seen so far. Union of two sketches = k smallest
  * of the merged hash sets — EXACTLY the sketch of the union of the
  * inputs, which is what makes KMV mergeable across partitions /
  * partial-aggregation boundaries with no accuracy loss at merge time
  * (unlike naive sampling). Estimate: exact size while < k values are
  * held; otherwise (k-1)/r where r is the k-th smallest hash mapped to
  * (0,1].
  */
final class KmvBuffer(val k: Int) {
  // sorted set of the k smallest distinct hashes
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last) {
      if (set.add(h)) { set.pollLast(); () }
    }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next())
  }

  /** Distinct-count estimate. */
  def estimate: Long =
    if (set.size < k) set.size.toLong
    else {
      // fraction of the 64-bit hash space at or below the k-th smallest
      // SIGNED hash (the TreeSet orders signed, so the position of
      // Long.MinValue is 0 and Long.MaxValue is 1)
      val r = math.max(
        set.last.toDouble / 1.8446744073709552e19 + 0.5, // 2^64
        1e-18)
      math.round((k - 1) / r)
    }
}

/** Mergeable approximate-distinct aggregate over long/int/string keys —
  * a native `TypedImperativeAggregate`, so Spark runs it partial+final:
  * each task keeps one k-entry sketch, shuffles `8*k` bytes per group,
  * and the final merge unions sketches (set-union semantics, proved in
  * KmvSketchSpec). The Catalyst-level analog of a DataSketches theta
  * union; k=1024 ⇒ ~3% relative standard error.
  *
  * Reference parity: stands in for the serving layer's approximate
  * rollups (reference delegates distinct counts to Trino/Postgres —
  * trino/sql/init-tables.sql); here the sketch itself is the engine
  * object so re-aggregation over coarser keys stays one shuffle.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 1024,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects long/int/string input, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  private def hashOf(v: Any): Long = v match {
    case l: Long  => XXH64.hashLong(l, 42L)
    case i: Int   => XXH64.hashLong(i.toLong, 42L)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  /** Portable hash family (cross-engine oracle-checkable, same recipe as
    * the md5-MinHash in Dedup.scala): the first 8 bytes of
    * `md5(string-rendering)` read big-endian are exactly DuckDB's
    * `('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 16))::UBIGINT`. The
    * sign bit is flipped so the signed TreeSet orders by the UNSIGNED
    * value — the order the estimator is defined on.
    */
  private def portableHash(v: Any): Long = {
    val s = v match {
      case l: Long       => java.lang.Long.toString(l)
      case i: Int        => java.lang.Integer.toString(i)
      case u: UTF8String => u.toString
    }
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong ^ Long.MinValue
  }

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(if (portable) portableHash(v) else hashOf(v))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeIn(other); buf
  }

  /** Portable estimate uses EXACT 128-bit integer math —
    * `floor((k-1) * 2^64 / h_k)` with h_k unsigned — so JVM and DuckDB
    * agree bit-for-bit (no IEEE rounding at the compare boundary).
    */
  override def eval(buf: KmvBuffer): Any =
    if (!portable) buf.estimate
    else if (buf.set.size < k) buf.set.size.toLong
    else {
      val hU = (BigInt(buf.set.last ^ Long.MinValue)) & ((BigInt(1) << 64) - 1)
      ((BigInt(k - 1) << 64) / hU).toLong
    }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketch {
  /** Column-API entry point: approximate distinct count of `c`. */
  def kmvDistinct(c: Column, k: Int = 1024): Column =
    GraftBridge.column(
      KmvSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** Portable-hash variant (md5 family + exact integer estimator): same
    * buffer and merge machinery, but every bit reproducible in ANSI-ish
    * SQL — the keyed `approx_distinct_kmv` query uses this so the sketch
    * pipeline carries a real cross-engine oracle.
    */
  def kmvDistinctPortable(c: Column, k: Int = 64): Column =
    GraftBridge.column(
      KmvSketchAgg(GraftBridge.expression(c), k, portable = true)
        .toAggregateExpression())
}
