package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.{spark, sf}

class TDigestSpec extends AnyFunSuite {
  import spark.implicits._

  private def sketchOf(xs: Seq[Double], compression: Double = 100): TDigestBuffer = {
    val b = new TDigestBuffer(compression)
    xs.foreach(b.add(_))
    b
  }

  // deterministic LCG so the spec never flakes
  private def lcg(n: Int, seed: Long = 42): Seq[Double] = {
    var s = seed
    Seq.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble)
    }
  }

  test("quantile accuracy: ≤1% q-space error on 100k uniform values") {
    val xs = lcg(100000)
    val sorted = xs.sorted.toIndexedSeq
    val b = sketchOf(xs)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = b.quantile(q)
      // uniform(0,1): value IS the quantile, so |est − q| is q-space error
      assert(math.abs(est - q) < 0.01, s"q=$q est=$est")
      val exact = sorted((q * (xs.size - 1)).toInt)
      assert(math.abs(est - exact) < 0.01, s"q=$q est=$est exact=$exact")
    }
    // size bound: O(compression) centroids regardless of input size
    assert(b.centroidCount < 2 * 100 + 10, s"centroids=${b.centroidCount}")
  }

  test("merge preserves the error bound (8-shard merge tree ≈ global sketch)") {
    val xs = lcg(80000, seed = 7)
    val shards = xs.grouped(10000).map(sketchOf(_)).toSeq
    val merged = shards.reduce { (a, c) => a.mergeIn(c); a }
    for (q <- Seq(0.05, 0.5, 0.95))
      assert(math.abs(merged.quantile(q) - q) < 0.015,
        s"q=$q est=${merged.quantile(q)}")
    assert(merged.centroidCount < 2 * 100 + 10)
  }

  test("exact tails: min and max are anchored") {
    val b = sketchOf(Seq(5.0, 1.0, 9.0, 3.0))
    assert(b.quantile(0.0) === 1.0)
    assert(b.quantile(1.0) === 9.0)
  }

  test("end-to-end: grouped aggregate tracks the exact percentile on events") {
    import graft.functions.TDigest.tdigestQuantile
    import org.apache.spark.sql.functions.expr
    val out = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(tdigestQuantile($"value", 0.5).as("p50"),
        tdigestQuantile($"value", 0.95).as("p95"),
        tdigestQuantile($"value", 0.99).as("p99"),
        expr("percentile(value, 0.5)").as("exact_p50"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p95, p99, exact) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(p50 - exact) <= 0.05 * math.max(1.0, math.abs(exact)),
        s"${r.getString(0)}: p50=$p50 exact=$exact")
      assert(p50 <= p95 && p95 <= p99, s"monotone: $p50 $p95 $p99")
    }
    // and the keyed op's oracle-checkable form reports every group within
    // its rank-error bound
    val op = graft.operators.TemporalJoins.ops
      .find(_.key == "quantile_tdigest").get.run(spark, sf).collect()
    assert(op.nonEmpty)
    op.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: rank bound violated")
    }
  }

  test("every digest quantile is RANK-error-bounded against the exact data") {
    // t-digest's contract is RANK accuracy (a value-space bound is
    // meaningless in a sparse tail, where one rank step moves the value
    // arbitrarily): for each emitted quantile q, the fraction of actual
    // values ≤ the estimate must sit within ~1.5% of q (k1 scale at
    // compression=100 bounds rank error well under that, tails tighter).
    // The exact side is plain counting — ANSI, engine-independent — so
    // this is the error-bounded exact-twin check for the no-oracle op.
    val values: Map[String, Array[Double]] = graft.sources.Tables.events(spark, sf)
      .select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    import graft.functions.TDigest.tdigestQuantile
    val got = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(tdigestQuantile($"value", 0.5).as("p50"),
        tdigestQuantile($"value", 0.95).as("p95"),
        tdigestQuantile($"value", 0.99).as("p99"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = values(r.getString(0))
      for ((q, est) <- Seq((0.5, r.getDouble(1)), (0.95, r.getDouble(2)),
          (0.99, r.getDouble(3)))) {
        val rank = xs.count(_ <= est).toDouble / xs.length
        assert(math.abs(rank - q) <= 0.015,
          s"${r.getString(0)} q=$q: est=$est has rank $rank (n=${xs.length})")
      }
    }
  }

  test("serialization roundtrips through the aggregate's codec") {
    val agg = TDigestQuantileAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0), q = 0.5)
    val b = sketchOf(lcg(5000, seed = 3))
    val back = agg.deserialize(agg.serialize(b))
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(back.quantile(q) - b.quantile(q)) < 1e-12)
  }
}
