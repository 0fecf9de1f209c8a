package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable Bloom-filter aggregate: each group builds one membership
  * sketch of its input values. A native `TypedImperativeAggregate`, so
  * Spark runs it partial+final — tasks keep one fixed-size bit array per
  * group and the shuffle moves sketches, not values (the same shape as
  * [[KmvSketchAgg]]). Built on Spark's own `util.sketch.BloomFilter`
  * (split-block Bloom, the sketch `DataFrameStatFunctions.bloomFilter`
  * uses), emitted as its serialized bytes so the sketch can be persisted
  * as a file-level index and probed later with `mightContainLong`.
  *
  * The engine's use: per-data-file membership indexes on high-cardinality
  * columns where min/max bounds never skip (BloomIndex) — Iceberg's
  * puffin blooms / Delta file-skipping indexes, as one aggregate query.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects long/int/string input, got $t")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long       => buf.putLong(l)
      case i: Int        => buf.putLong(i.toLong)
      case s: UTF8String => buf.putBinary(s.getBytes)
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other); buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomSketch {
  /** Column-API entry point: Bloom sketch (serialized bytes) of `c`. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    GraftBridge.column(
      BloomAgg(GraftBridge.expression(c), expectedItems, fpp).toAggregateExpression())

  /** Probe a serialized sketch for a long value (planning-side helper). */
  def mightContainLong(bloom: Array[Byte], value: Long): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom)).mightContainLong(value)

  /** Probe for a string value (matches `putBinary` of UTF-8 bytes). */
  def mightContainString(bloom: Array[Byte], value: String): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloom))
      .mightContainBinary(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
