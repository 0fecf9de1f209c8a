package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TopKByTime
import graft.operators.Dedup.MinHashKernel

/** Pure-JVM property tests of the engine's kernel functions (scalacheck;
  * SURVEY §5.4) — no SparkSession needed, so thousands of cases run in
  * milliseconds.
  */
object PropertySpec extends Properties("graft.kernels") {

  private val word = Gen.oneOf("spark", "batch", "row", "key", "join",
    "scan", "the", "a", "merge", "sort", "window", "stream")
  private val text = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
    .map(_.mkString(" "))

  property("shingles: count = max(tokens-2, 0) before dedup; all 3-word") =
    forAll(text) { t =>
      val toks = t.toLowerCase.split(' ')
      val sh = MinHashKernel.shingles(t)
      val expectedRaw = math.max(toks.length - 2, 0)
      sh.length <= expectedRaw &&
        (expectedRaw == 0 || sh.nonEmpty) &&
        sh.forall(_.split(' ').length == 3)
    }

  property("minhash bands: identical docs collide in every band") =
    forAll(text.suchThat(_.split(' ').length >= 3)) { t =>
      MinHashKernel.bandKeys(MinHashKernel.shingles(t)).toSeq ==
        MinHashKernel.bandKeys(MinHashKernel.shingles(t)).toSeq
    }

  property("minhash bands: band count and ids fixed") =
    forAll(text.suchThat(_.split(' ').length >= 3)) { t =>
      val b = MinHashKernel.bandKeys(MinHashKernel.shingles(t))
      b.length == MinHashKernel.NumBands &&
        b.map(_._1).toSeq == (0 until MinHashKernel.NumBands)
    }

  private val inGen = for {
    ts <- Gen.chooseNum(0L, 1000L)
    id <- Gen.chooseNum(0L, 100000L)
    v <- Gen.chooseNum(-1000, 1000).map(_ / 10.0)
  } yield TopKByTime.In(ts, id, v)

  property("topK reduce: bounded at K, sorted asc, equals sort-take") =
    forAll(Gen.listOf(inGen)) { ins =>
      val buf = ins.foldLeft(List.empty[TopKByTime.In])(TopKByTime.agg.reduce)
      val expected = ins.distinct.sortBy(r => (r.ts, r.event_id))
        .takeRight(TopKByTime.K)
      // duplicates (same ts,id) may both survive; compare on keys
      buf.length <= TopKByTime.K &&
        buf.map(r => (r.ts, r.event_id)) == buf.map(r => (r.ts, r.event_id)).sorted &&
        (ins.distinct.size != ins.size ||
          buf.map(r => (r.ts, r.event_id)) == expected.map(r => (r.ts, r.event_id)))
    }

  property("topK merge: associative-equivalent to reducing the concatenation") =
    forAll(Gen.listOf(inGen), Gen.listOf(inGen)) { (a, b) =>
      val all = (a ++ b).distinct
      val left = all.foldLeft(List.empty[TopKByTime.In])(TopKByTime.agg.reduce)
      val split = TopKByTime.agg.merge(
        a.distinct.foldLeft(List.empty[TopKByTime.In])(TopKByTime.agg.reduce),
        b.distinct.filterNot(a.distinct.contains(_))
          .foldLeft(List.empty[TopKByTime.In])(TopKByTime.agg.reduce))
      left.map(r => (r.ts, r.event_id)).toSet == split.map(r => (r.ts, r.event_id)).toSet
    }

  property("fnv1a: deterministic and spreads") =
    forAll(text, text) { (a, b) =>
      MinHashKernel.fnv1a(a) == MinHashKernel.fnv1a(a) &&
        (a == b || MinHashKernel.fnv1a(a) != MinHashKernel.fnv1a(b) || a.isEmpty)
    }
}
