package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per key as a typed [[Aggregator]] — the scale-true form
  * of "keep the last K rows per key" (reference:
  * visualization-server/public/index.html:336-339 `slice(-100)`).
  *
  * The window-function form (`row_number() OVER (PARTITION BY key ORDER
  * BY ts DESC) <= K`) shuffles EVERY row to its key's partition before
  * discarding all but K. This aggregator keeps a bounded buffer per key
  * inside the partial (map-side) aggregate, so only ≤K rows per key per
  * partition ever reach the shuffle — at 100 TB that's the difference
  * between shuffling the table and shuffling K×keys×partitions rows.
  *
  * Buffer = an Array-backed bounded min-heap over (ts, event_id): the
  * root is the smallest kept key, so a full buffer rejects a below-min
  * row with one comparison and otherwise replaces the root in O(log K)
  * with ZERO steady-state allocation. (An earlier immutable sorted-List
  * buffer was O(K) cons-rebuild per row on time-ascending input — ~60M
  * allocated cells per sf0.1 pass — and collapsed under GC pressure.)
  *
  * Ordering: (ts desc, event_id desc), matching the window form exactly.
  */
object TopKByTime {

  case class In(ts: Long, event_id: Long, value: Double)

  /** Min-heap on (ts, id) lexicographic; parallel primitive arrays of
    * fixed capacity K, `n` live entries. Mutated in place by the
    * aggregator (ObjectHashAggregate keeps buffers as objects between
    * rows; encoding only happens at the shuffle boundary).
    */
  case class Buf(var n: Int, ts: Array[Long], id: Array[Long], v: Array[Double])

  val K = 100

  val agg: Aggregator[In, Buf, Seq[In]] =
    new Aggregator[In, Buf, Seq[In]] {

      private def lt(t1: Long, i1: Long, t2: Long, i2: Long): Boolean =
        t1 < t2 || (t1 == t2 && i1 < i2)

      private def siftUp(b: Buf, from: Int): Unit = {
        var k = from
        val t = b.ts(k); val i = b.id(k); val x = b.v(k)
        while (k > 0 && lt(t, i, b.ts((k - 1) >> 1), b.id((k - 1) >> 1))) {
          val p = (k - 1) >> 1
          b.ts(k) = b.ts(p); b.id(k) = b.id(p); b.v(k) = b.v(p)
          k = p
        }
        b.ts(k) = t; b.id(k) = i; b.v(k) = x
      }

      private def siftDown(b: Buf): Unit = {
        var k = 0
        val t = b.ts(0); val i = b.id(0); val x = b.v(0)
        var done = false
        while (!done) {
          var c = 2 * k + 1
          if (c >= b.n) done = true
          else {
            if (c + 1 < b.n && lt(b.ts(c + 1), b.id(c + 1), b.ts(c), b.id(c))) c += 1
            if (lt(b.ts(c), b.id(c), t, i)) {
              b.ts(k) = b.ts(c); b.id(k) = b.id(c); b.v(k) = b.v(c)
              k = c
            } else done = true
          }
        }
        b.ts(k) = t; b.id(k) = i; b.v(k) = x
      }

      private def insert(b: Buf, t: Long, i: Long, x: Double): Buf = {
        if (b.n < K) {
          b.ts(b.n) = t; b.id(b.n) = i; b.v(b.n) = x
          b.n += 1
          siftUp(b, b.n - 1)
        } else if (lt(b.ts(0), b.id(0), t, i)) {
          b.ts(0) = t; b.id(0) = i; b.v(0) = x
          siftDown(b)
        }
        b
      }

      override def zero: Buf =
        Buf(0, new Array[Long](K), new Array[Long](K), new Array[Double](K))

      override def reduce(b: Buf, a: In): Buf = insert(b, a.ts, a.event_id, a.value)

      override def merge(b1: Buf, b2: Buf): Buf = {
        var j = 0
        while (j < b2.n) { insert(b1, b2.ts(j), b2.id(j), b2.v(j)); j += 1 }
        b1
      }

      /** Desc by (ts, event_id): rank 1 = newest. */
      override def finish(b: Buf): Seq[In] =
        Array.tabulate(b.n)(j => In(b.ts(j), b.id(j), b.v(j)))
          .sortBy(r => (-r.ts, -r.event_id)).toSeq

      override def bufferEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
      override def outputEncoder: Encoder[Seq[In]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
    }
}
