package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters buffer: at most k item counters plus a global
  * `offset` of purged mass. An item's estimate is `count + offset` and its
  * error bound is `offset`, giving the overestimate-only guarantee
  * `est ≥ true ≥ est − err` for every retained item.
  *
  * This is the Misra-Gries summary with an explicit offset — the form
  * Agarwal et al. ("Mergeable Summaries", PODS'12) prove isomorphic to
  * SpaceSaving and, crucially, MERGEABLE: merge sums the per-item counts
  * and the offsets, then purges back to k counters. The naive
  * evict-and-inherit SpaceSaving merge is NOT safe — an item evicted on
  * one side but still present on the other loses its folded-in mass and
  * can under-estimate (caught by PropertySpec's scalacheck merge
  * property). Purging subtracts the (k+1)-th largest count from every
  * counter and drops the non-positive remainder; the subtracted mass
  * moves into `offset`, so every surviving `est = count + offset` is
  * invariant under the purge.
  */
final class SpaceSavingBuffer(val k: Int) {
  // item → Array(localCount); est = localCount + offset
  val m = new java.util.HashMap[String, Array[Long]]()
  var offset: Long = 0L

  def add(item: String): Unit = {
    val cur = m.get(item)
    if (cur != null) cur(0) += 1
    else { m.put(item, Array(1L)); if (m.size > k) trim() }
  }

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    offset += other.offset
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = m.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0)
      else m.put(e.getKey, e.getValue().clone())
    }
    if (m.size > k) trim()
  }

  /** Misra-Gries decrement step: subtract the (k+1)-th largest count from
    * every counter, drop the non-positive, move the mass into `offset`.
    */
  def trim(): Unit = if (m.size > k) {
    val counts = new Array[Long](m.size)
    var i = 0
    val vit = m.values().iterator()
    while (vit.hasNext) { counts(i) = vit.next()(0); i += 1 }
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - 1 - k) // (k+1)-th largest
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      e.getValue()(0) -= cut
      if (e.getValue()(0) <= 0L) it.remove()
    }
    offset += cut
  }

  /** (item, est, err) sorted by est desc, item asc. */
  def sorted: Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    m.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue()(0) + offset, offset))
      .sortBy { case (item, est, _) => (-est, item) }
  }
}

object SpaceSavingBuffer {
  /** Wire format shared by the batch aggregate's shuffle and the
    * streaming processor's ValueState. */
  def toBytes(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.offset)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue()(0))
    }
    out.flush(); bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte], k: Int): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(k)
    buf.offset = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.m.put(in.readUTF(), Array(in.readLong())); i += 1
    }
    buf
  }
}

/** Mergeable approximate top-k aggregate over string/long keys — the
  * heavy-hitters companion to [[KmvSketchAgg]]: each task keeps one
  * k-counter SpaceSaving buffer, partials shuffle O(k) entries per group,
  * and the final merge preserves the overestimate-only bound. While the
  * group's cardinality stays ≤ k the sketch is EXACT (no eviction) —
  * which is how the keyed query stays oracle-checkable while the specs
  * exercise the eviction/merge regime with tiny k.
  *
  * Output: array<struct<item, est, err>> sorted by est desc, item asc.
  */
case class TopKSketchAgg(
    child: Expression,
    k: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"approx_top_k expects string/long/int input, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType),
    StructField("err", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "approx_top_k"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(k)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (item, est, err) =>
      InternalRow(UTF8String.fromString(item), est, err)
    })

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] =
    SpaceSavingBuffer.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketchAgg =
    copy(child = newChild)
}

object TopKSketch {
  /** Column-API entry point: approximate top-k items of `c`. */
  def approxTopK(c: Column, k: Int = 4096): Column =
    GraftBridge.column(
      TopKSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())
}
