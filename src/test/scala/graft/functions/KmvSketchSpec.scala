package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.spark

class KmvSketchSpec extends AnyFunSuite {
  import spark.implicits._

  test("exact below k: sketch returns the true distinct count") {
    val df = (1 to 500).map(i => i.toLong % 200).toDF("v")
      .agg(KmvSketch.kmvDistinct($"v", k = 1024).as("d"))
    assert(df.collect().head.getLong(0) === 200L)
  }

  test("estimate within KMV error bound above k") {
    val n = 50000
    val df = (1 to n).map(_.toLong).toDF("v")
      .agg(KmvSketch.kmvDistinct($"v", k = 1024).as("d"))
    val est = df.collect().head.getLong(0).toDouble
    // RSE ≈ 1/sqrt(k-2) ≈ 3.1%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.125, s"estimate $est vs $n")
  }

  test("merge(sk(A), sk(B)) == sk(A ∪ B): set-union semantics, exactly") {
    val k = 256
    // A and B overlap on 1..2000; union is 1..6000
    val a = (1 to 4000).map(_.toLong)
    val b = (1 to 2000).map(_.toLong) ++ (4001 to 6000).map(_.toLong)
    // partitioned path: tag rows by source, 16 partitions → many partial
    // buffers merged by the final aggregation
    val merged = (a ++ b).toDF("v").repartition(16)
      .agg(KmvSketch.kmvDistinct($"v", k).as("d"))
      .collect().head.getLong(0)
    // single-partition path over the deduplicated union
    val direct = (1 to 6000).map(_.toLong).toDF("v").coalesce(1)
      .agg(KmvSketch.kmvDistinct($"v", k).as("d"))
      .collect().head.getLong(0)
    // KMV union keeps the k smallest of the merged hash set — identical
    // to sketching the union directly, so the estimates are EQUAL, not
    // just close
    assert(merged === direct)
    // and both are within the error bound of the truth
    assert(math.abs(merged.toDouble - 6000) / 6000 < 0.25)
  }

  test("string keys hash and estimate too; nulls ignored") {
    val df = ((1 to 300).map(i => s"user_$i") :+ null)
      .toDF("v").agg(KmvSketch.kmvDistinct($"v", k = 1024).as("d"))
    assert(df.collect().head.getLong(0) === 300L)
  }

  test("portable mode reproduces the md5 hash family and integer estimator exactly") {
    val k = 64
    val vals = (1 to 500).map(_.toLong)
    // independent model of the contract: big-endian first-8-bytes of
    // md5(decimal string), ordered UNSIGNED; estimate floor((k-1)*2^64/h_k)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = vals.map { v =>
      md.reset()
      java.nio.ByteBuffer.wrap(md.digest(v.toString.getBytes("UTF-8"))).getLong
    }.distinct.sortBy(h => h ^ Long.MinValue)
    val hk = BigInt(hashes(k - 1)) & ((BigInt(1) << 64) - 1)
    val expected = ((BigInt(k - 1) << 64) / hk).toLong
    val got = vals.toDF("v").repartition(8)
      .agg(KmvSketch.kmvDistinctPortable($"v", k).as("d"))
      .collect().head.getLong(0)
    assert(got === expected)
    // and the estimate is a sane distinct-count at this k
    assert(math.abs(got.toDouble - 500) / 500 < 0.5, s"estimate $got vs 500")
  }

  test("keyed query runs partial+final (Partial/Final ObjectHashAggregate in plan)") {
    val q = graft.operators.TemporalJoins.ops
      .find(_.key == "approx_distinct_kmv").get.run(spark, graft.SharedSpark.sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("kmv_distinct"), plan.take(2000))
    val rows = q.collect()
    assert(rows.nonEmpty)
    // at sf0.001 distinct users per type < k=1024 → sketch is exact
    rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"${r.getString(0)}: kmv=${r.getLong(1)} exact=${r.getLong(2)}"))
  }
}
