package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact distributed top-k by (score DESC, id ASC) as a typed
  * [[Aggregator]] — the generic scale-true substitute for a GLOBAL
  * `row_number() OVER (ORDER BY score DESC, id)` ranking window.
  *
  * The window form funnels the whole scored set into ONE task for the
  * sort (or, partitioned by a low-cardinality key, into one task per
  * key); at corpus scale that single task sorts billions of rows. This
  * aggregator's partial (map-side) aggregate caps every partition's
  * contribution at k rows BEFORE the shuffle, the final merge heap-merges
  * ≤ k×partitions rows, and `posexplode` of the sorted output yields the
  * rank — identical results (top-k of a union IS the top-k of the local
  * top-k's under a strict total order), no corpus-sized sort anywhere.
  *
  * Scores ride as SCALED LONGS: every graft ranking score is either an
  * exact DECIMAL(18,6) (BM25/RRF sums — unscaled value IS the long) or a
  * 6-dp-rounded double (cosine — `round(x*1e6)` recovers the integer
  * exactly), so long comparison reproduces the engine-independent decimal
  * order bit-for-bit, and ids are unique per group, making the order
  * STRICT — merge order can never change the result.
  *
  * Buffer: parallel primitive arrays as a bounded min-heap (root = worst
  * kept pair), same zero-steady-state-allocation shape as
  * [[TopKByTime]] — see that file for why an immutable buffer collapses
  * under GC pressure at sf0.1.
  */
object TopKByScore {

  case class In(score: Long, id: Long)

  case class Buf(var n: Int, s: Array[Long], id: Array[Long])

  /** Strict total order: (s1,i1) ranks WORSE than (s2,i2) iff lower
    * score, or equal score and higher id.
    */
  private def worse(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def agg(k: Int): Aggregator[In, Buf, Seq[In]] =
    new Aggregator[In, Buf, Seq[In]] {

      private def siftUp(b: Buf, from: Int): Unit = {
        var j = from
        val s = b.s(j); val i = b.id(j)
        while (j > 0 && worse(s, i, b.s((j - 1) >> 1), b.id((j - 1) >> 1))) {
          val p = (j - 1) >> 1
          b.s(j) = b.s(p); b.id(j) = b.id(p)
          j = p
        }
        b.s(j) = s; b.id(j) = i
      }

      private def siftDown(b: Buf): Unit = {
        var j = 0
        val s = b.s(0); val i = b.id(0)
        var done = false
        while (!done) {
          var c = 2 * j + 1
          if (c >= b.n) done = true
          else {
            if (c + 1 < b.n && worse(b.s(c + 1), b.id(c + 1), b.s(c), b.id(c))) c += 1
            if (worse(b.s(c), b.id(c), s, i)) {
              b.s(j) = b.s(c); b.id(j) = b.id(c)
              j = c
            } else done = true
          }
        }
        b.s(j) = s; b.id(j) = i
      }

      private def insert(b: Buf, s: Long, i: Long): Buf = {
        if (b.n < k) {
          b.s(b.n) = s; b.id(b.n) = i
          b.n += 1
          siftUp(b, b.n - 1)
        } else if (worse(b.s(0), b.id(0), s, i)) {
          b.s(0) = s; b.id(0) = i
          siftDown(b)
        }
        b
      }

      override def zero: Buf = Buf(0, new Array[Long](k), new Array[Long](k))

      override def reduce(b: Buf, a: In): Buf = insert(b, a.score, a.id)

      override def merge(b1: Buf, b2: Buf): Buf = {
        var j = 0
        while (j < b2.n) { insert(b1, b2.s(j), b2.id(j)); j += 1 }
        b1
      }

      /** Best-first: rank r = element r-1 after (score desc, id asc). */
      override def finish(b: Buf): Seq[In] =
        Array.tabulate(b.n)(j => In(b.s(j), b.id(j)))
          .sortBy(r => (-r.score, r.id)).toSeq

      override def bufferEncoder: Encoder[Buf] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
      override def outputEncoder: Encoder[Seq[In]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
    }
}
