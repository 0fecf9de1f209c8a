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

/** SpaceSaving heavy-hitters buffer: at most k (item → (count, err))
  * counters. Insertion of an unseen item at capacity evicts the minimum
  * counter m and inherits its count (est = m+1, err = m) — the classic
  * overestimate-only guarantee: `est ≥ true ≥ est − err` for every item
  * the buffer retains.
  *
  * Merge sums the per-side counters (each side's est ≥ its true share, so
  * the sum keeps est ≥ true) and trims back to the k largest — globally
  * heavy items are heavy in the sum, so they survive; only tail mass is
  * dropped. This is the practical mergeable variant (DataSketches
  * frequent-items shape), proved on skewed data in TopKSketchSpec.
  */
final class SpaceSavingBuffer(val k: Int) {
  // item → Array(count, err)
  val m = new java.util.HashMap[String, Array[Long]]()

  def add(item: String): Unit = {
    val cur = m.get(item)
    if (cur != null) cur(0) += 1
    else if (m.size < k) { m.put(item, Array(1L, 0L)); () }
    else {
      var minKey: String = null; var minCnt = Long.MaxValue
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minCnt
          || (e.getValue()(0) == minCnt && (minKey == null || e.getKey < minKey))) {
          minCnt = e.getValue()(0); minKey = e.getKey
        }
      }
      m.remove(minKey)
      m.put(item, Array(minCnt + 1, minCnt))
      ()
    }
  }

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = m.get(e.getKey)
      if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
      else m.put(e.getKey, e.getValue().clone())
    }
    trim()
  }

  /** Keep the k largest counters (count desc, item asc for determinism). */
  def trim(): Unit = if (m.size > k) {
    val entries = new java.util.ArrayList(m.entrySet())
    entries.sort { (a: java.util.Map.Entry[String, Array[Long]],
        b: java.util.Map.Entry[String, Array[Long]]) =>
      val c = java.lang.Long.compare(b.getValue()(0), a.getValue()(0))
      if (c != 0) c else a.getKey.compareTo(b.getKey)
    }
    var i = k
    while (i < entries.size()) { m.remove(entries.get(i).getKey); i += 1 }
  }

  /** (item, est, err) sorted by est desc, item asc. */
  def sorted: Seq[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    m.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue()(0), e.getValue()(1)))
      .sortBy { case (item, cnt, _) => (-cnt, item) }
  }
}

object SpaceSavingBuffer {
  /** Wire format shared by the batch aggregate's shuffle and the
    * streaming processor's ValueState. */
  def toBytes(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue()(0)); out.writeLong(e.getValue()(1))
    }
    out.flush(); bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte], k: Int): SpaceSavingBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.m.put(in.readUTF(), Array(in.readLong(), in.readLong())); i += 1
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
