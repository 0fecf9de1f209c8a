package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

/** Per-operator semantics + the FIXTURES.md A1 edge cases: non-numeric
  * cast → null, unparseable timestamp → null, malformed JSON → dropped.
  */
class EventOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("cast edge: non-numeric string casts to null, not error") {
    val df = Seq("80.59", "not-a-number", "", "1e2").toDF("temperature")
      .select($"temperature".cast("double").as("d"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ===
      Seq(Some(80.59), None, None, Some(100.0)))
  }

  test("timestamp edge: unparseable ts parses to null") {
    val df = Seq("2024-01-08 14:30:00", "garbage", "2024-13-45 99:99:99")
      .toDF("ts")
      .select(to_timestamp($"ts", "yyyy-MM-dd HH:mm:ss").as("t"))
    val got = df.collect().map(r => Option(r.get(0)))
    assert(got(0).nonEmpty && got(1).isEmpty && got(2).isEmpty)
  }

  test("json edge: malformed JSON row yields null struct and is dropped") {
    val df = Seq("""{"k": 7}""", "not json {", """{"other": 1}""")
      .toDF("props")
      .select(from_json($"props", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).as("p"))
      .where($"p".isNotNull && $"p.k".isNotNull)
    assert(df.count() === 1)
  }

  test("tumble window bounds are on the 5s grid and end-start == 5s") {
    val rows = EventOps.tumbleAvg(spark, sf)
      .select($"window_start".cast("long"), $"window_end".cast("long")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 5 === 0)
      assert(r.getLong(1) - r.getLong(0) === 5)
    }
  }

  test("windowed avg*count recombines to the global decimal-exact sum") {
    // property: Σ(avg_value × cnt) over windows == Σ value (both exact via
    // decimal) — the re-aggregation identity behind reagg_avg_sum.
    val ev = graft.sources.Tables.events(spark, sf)
    val exact = ev.agg(sum($"value".cast("decimal(18,6)"))).head.getDecimal(0)
    val win = ev.groupBy(window($"ts", "5 seconds"))
      .agg(sum($"value".cast("decimal(18,6)")).as("s"))
      .agg(sum($"s")).head.getDecimal(0)
    assert(win === exact)
  }

  test("keep_last_100 never exceeds 100 rows per key") {
    val op = EventOps.ops.find(_.key == "keep_last_100").get
    val counts = op.run(spark, sf).groupBy($"event_type").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) <= 100))
  }

  test("last_per_key picks the max-ts row per key") {
    val op = EventOps.ops.find(_.key == "last_per_key").get
    val got = op.run(spark, sf).select($"event_type", $"ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    val expected = graft.sources.Tables.events(spark, sf)
      .groupBy($"event_type").agg(max($"ts").as("m")).collect()
      .map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    assert(got === expected)
  }

  test("keep_last_100_agg runs as a two-phase (partial) object aggregate") {
    val op = EventOps.ops.find(_.key == "keep_last_100_agg").get
    val df = op.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // typed Aggregator → ObjectHashAggregate, with a partial (map-side)
    // phase capping each key's buffer before the shuffle
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial_topkbytime") || plan.contains("partial_"),
      plan.take(400))
  }

  test("session_gap_sweep: one window pass, sessions monotone in the gap") {
    val op = EventOps.ops.find(_.key == "session_gap_sweep").get
    val df = op.run(spark, sf)
    // one scan: exactly one Window exec despite four gap parameters
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.size
    assert(windows === 1, s"gap sweep must sessionize in one pass, saw $windows")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // a larger gap can only merge sessions, never split them
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val byGap = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(byGap.zip(byGap.tail).forall { case (a, b) => b <= a },
        s"$t: sessions must be non-increasing in gap, got ${byGap.toSeq}")
      // every event alone is an upper bound; one session is the floor
      assert(byGap.head <= rs.head.getLong(3) && byGap.last >= 1)
    }
  }

  test("filter ops only keep qualifying rows") {
    val hourOp = EventOps.ops.find(_.key == "filter_hour").get
    assert(hourOp.run(spark, sf).where(hour($"ts") =!= 14).count() === 0)
    val inOp = EventOps.ops.find(_.key == "filter_in_list").get
    assert(inOp.run(spark, sf)
      .where(!$"event_type".isin("click", "purchase", "signup")).count() === 0)
  }
}
