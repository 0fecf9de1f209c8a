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

  property("topK reduce: bounded at K, finish desc, equals sort-take") =
    forAll(Gen.listOf(inGen)) { ins =>
      val buf = ins.foldLeft(TopKByTime.agg.zero)(TopKByTime.agg.reduce)
      val out = TopKByTime.agg.finish(buf)
      val expected = ins.distinct.sortBy(r => (r.ts, r.event_id))
        .takeRight(TopKByTime.K).reverse
      // duplicates (same ts,id) may both survive; compare on keys
      out.length <= TopKByTime.K &&
        out.map(r => (r.ts, r.event_id)) ==
          out.map(r => (r.ts, r.event_id)).sorted(Ordering[(Long, Long)].reverse) &&
        (ins.distinct.size != ins.size ||
          out.map(r => (r.ts, r.event_id)) == expected.map(r => (r.ts, r.event_id)))
    }

  property("topK merge: associative-equivalent to reducing the concatenation") =
    forAll(Gen.listOf(inGen), Gen.listOf(inGen)) { (a, b) =>
      val all = (a ++ b).distinct
      val left = all.foldLeft(TopKByTime.agg.zero)(TopKByTime.agg.reduce)
      val split = TopKByTime.agg.merge(
        a.distinct.foldLeft(TopKByTime.agg.zero)(TopKByTime.agg.reduce),
        b.distinct.filterNot(a.distinct.contains(_))
          .foldLeft(TopKByTime.agg.zero)(TopKByTime.agg.reduce))
      TopKByTime.agg.finish(left).map(r => (r.ts, r.event_id)).toSet ==
        TopKByTime.agg.finish(split).map(r => (r.ts, r.event_id)).toSet
    }

  property("fnv1a: deterministic and spreads") =
    forAll(text, text) { (a, b) =>
      MinHashKernel.fnv1a(a) == MinHashKernel.fnv1a(a) &&
        (a == b || MinHashKernel.fnv1a(a) != MinHashKernel.fnv1a(b) || a.isEmpty)
    }

  // ── manifest stats skipping: a file is kept iff its [min,max] range
  //    intersects every required bound — never drop a file that could
  //    hold a matching row (the only unsafe direction)
  import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo, Literal}
  import org.apache.spark.sql.types.LongType
  import org.apache.spark.sql.graft.ManifestFileIndex

  private val boundVal = Gen.chooseNum(-1000L, 1000L)

  property("requiredBounds: every long in a file range satisfying the filters is inside the bounds") =
    forAll(boundVal, boundVal, boundVal) { (v1, v2, x) =>
      val a = AttributeReference("c", LongType)()
      val filters = Seq(
        GreaterThanOrEqual(a, Literal(math.min(v1, v2))),
        LessThanOrEqual(a, Literal(math.max(v1, v2))))
      val b = ManifestFileIndex.requiredBounds(filters)
      val (lo, hi) = b("c")
      val satisfies = x >= math.min(v1, v2) && x <= math.max(v1, v2)
      !satisfies || (x >= lo && x <= hi)
    }

  property("requiredBounds: strict comparisons tighten by one, equality pins") =
    forAll(boundVal) { v =>
      val a = AttributeReference("c", LongType)()
      ManifestFileIndex.requiredBounds(Seq(GreaterThan(a, Literal(v))))("c") ==
        ((v + 1, Long.MaxValue): (Long, Long)) &&
      ManifestFileIndex.requiredBounds(Seq(LessThan(a, Literal(v))))("c") ==
        ((Long.MinValue, v - 1): (Long, Long)) &&
      ManifestFileIndex.requiredBounds(Seq(EqualTo(a, Literal(v))))("c") ==
        ((v, v): (Long, Long))
    }

  // ── SpaceSaving: est ≥ true ≥ est − err for every retained item, under
  //    arbitrary insert sequences and random two-way merges
  import graft.functions.SpaceSavingBuffer

  private val itemGen = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")

  property("SpaceSaving: overestimate-only bound holds after inserts and merge") =
    forAll(Gen.listOf(itemGen), Gen.listOf(itemGen)) { (xs, ys) =>
      val b1 = new SpaceSavingBuffer(3); xs.foreach(b1.add)
      val b2 = new SpaceSavingBuffer(3); ys.foreach(b2.add)
      b1.mergeIn(b2)
      val truth = (xs ++ ys).groupBy(identity).view.mapValues(_.size.toLong)
      b1.sorted.forall { case (item, est, err) =>
        val t = truth.getOrElse(item, 0L)
        est >= t && est - err <= t
      }
    }

  property("SpaceSaving: serialization round-trips") =
    forAll(Gen.listOf(itemGen)) { xs =>
      val b = new SpaceSavingBuffer(4); xs.foreach(b.add)
      val rt = SpaceSavingBuffer.fromBytes(SpaceSavingBuffer.toBytes(b), 4)
      rt.sorted == b.sorted
    }

  // ── KMV: the k smallest of a union of k-smallest subsets IS the k
  //    smallest of the union — merge is exactly lossless, so any split
  //    of the stream (partial aggregation) yields the single-pass state
  import graft.functions.KmvBuffer

  private val hashGen = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  property("KMV: merge of any split equals the single-pass sketch") =
    forAll(Gen.listOf(hashGen), Gen.listOf(hashGen)) { (a, b) =>
      val whole = new KmvBuffer(8); (a ++ b).foreach(whole.add)
      val left = new KmvBuffer(8); a.foreach(left.add)
      val right = new KmvBuffer(8); b.foreach(right.add)
      left.mergeIn(right)
      left.set == whole.set && left.estimate == whole.estimate
    }

  property("KMV: insertion order never changes the state; exact below k") =
    forAll(Gen.listOf(hashGen)) { xs =>
      val fwd = new KmvBuffer(8); xs.foreach(fwd.add)
      val rev = new KmvBuffer(8); xs.reverse.foreach(rev.add)
      fwd.set == rev.set &&
        (xs.distinct.size >= 8 || fwd.estimate == xs.distinct.size.toLong)
    }

  // ── t-digest: estimates stay inside the data range, are monotone in q,
  //    and a merged digest keeps the rank error bounded
  import graft.functions.TDigestBuffer

  private val valGen = Gen.chooseNum(-1000, 1000).map(_ / 7.0)

  property("t-digest: quantiles bounded by min/max and monotone in q") =
    forAll(Gen.nonEmptyListOf(valGen)) { xs =>
      val d = new TDigestBuffer(100.0); xs.foreach(d.add(_))
      val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(d.quantile)
      qs.forall(v => v >= xs.min && v <= xs.max) && qs == qs.sorted
    }

  property("t-digest: merged digest's median stays rank-accurate") =
    forAll(Gen.nonEmptyListOf(valGen), Gen.listOf(valGen)) { (a, b) =>
      val l = new TDigestBuffer(100.0); a.foreach(l.add(_))
      val r = new TDigestBuffer(100.0); b.foreach(r.add(_))
      l.mergeIn(r)
      val all = (a ++ b).sorted
      val est = l.quantile(0.5)
      // two-sided rank check (one-sided counts misfire on ties): est is a
      // valid (0.5 ± ε) quantile iff strictly-below mass ≤ 0.5+ε and
      // at-or-below mass ≥ 0.5−ε. At δ=100 the k1-scale bound is ~1-2%
      // of n — 10% + discreteness slack is a loose structural ceiling.
      val n = all.length.toDouble
      val eps = 0.1 + 2.0 / n
      all.count(_ < est) / n <= 0.5 + eps &&
        all.count(_ <= est) / n >= 0.5 - eps
    }
}
