package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.spark

class TopKSketchSpec extends AnyFunSuite {
  import spark.implicits._

  test("exact regime (distinct <= k): estimates are true counts, err 0") {
    val df = (1 to 1000).map(i => s"u${i % 20}").toDF("v")
      .agg(TopKSketch.approxTopK($"v", k = 64).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item", $"e.est", $"e.err")
    val rows = df.collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getLong(1) === 50L))
    assert(rows.forall(_.getLong(2) === 0L))
  }

  test("eviction regime: overestimate-only bound holds, heavy hitter ranks first") {
    // skewed single-partition stream: "hot" 500×, 50 cold items 10× each
    val items = scala.util.Random.shuffle(
      Seq.fill(500)("hot") ++ (1 to 50).flatMap(i => Seq.fill(10)(s"c$i")))
    val buf = new SpaceSavingBuffer(8)
    items.foreach(buf.add)
    val top = buf.sorted
    assert(top.head._1 === "hot", top.take(3).toString)
    // est >= true >= est - err for the survivor
    val (_, est, err) = top.head
    assert(est >= 500L && est - err <= 500L, s"est=$est err=$err")
    assert(buf.m.size <= 8)
  }

  test("merge: sums common counters, keeps global heavy hitters, bound survives") {
    val a = new SpaceSavingBuffer(8)
    val b = new SpaceSavingBuffer(8)
    (1 to 300).foreach(_ => a.add("hot"))
    (1 to 40).foreach(i => a.add(s"a$i"))   // evictions in a
    (1 to 200).foreach(_ => b.add("hot"))
    (1 to 40).foreach(i => b.add(s"b$i"))   // evictions in b
    a.mergeIn(b)
    val (item, est, err) = a.sorted.head
    assert(item === "hot")
    assert(est >= 500L, s"merged est must stay >= true 500, got $est")
    assert(est - err <= 500L, s"lower bound est-err=${est - err} must be <= 500")
    assert(a.m.size <= 8)
  }

  test("distributed partial+final agrees with exact counts in exact regime") {
    val df = (1L to 10000L).map(i => i % 100).toDF("v").repartition(16)
      .agg(TopKSketch.approxTopK($"v".cast("string"), k = 256).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.item".as("item"), $"e.est".as("est"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size === 100)
    assert(got.values.forall(_ === 100L))
  }

  test("keyed query matches exact top-10 (plan runs ObjectHashAggregate partial+final)") {
    val q = graft.operators.TemporalJoins.ops
      .find(_.key == "approx_top_users").get.run(spark, graft.SharedSpark.sf)
    assert(q.queryExecution.executedPlan.toString.contains("approx_top_k"))
    val got = q.collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.sources.Tables.events(spark, graft.SharedSpark.sf)
      .groupBy($"user_id".cast("string").as("user")).count()
      .orderBy($"count".desc, $"user").limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === exact.toSeq)
  }
}
