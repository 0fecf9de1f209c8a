package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.{spark, sf}

class TemporalJoinsSpec extends AnyFunSuite {

  test("asof join: every match is the latest right row at or before left ts") {
    val rows = TemporalJoins.asofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getTimestamp(4).after(r.getTimestamp(2)),
        s"r_ts ${r.getTimestamp(4)} must be <= ts ${r.getTimestamp(2)}")
    }
  }

  test("asof join plan: one window pass, no inequality join") {
    val plan = TemporalJoins.asofJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "asof must compose via union+window, not an inequality join")
    assert(plan.contains("Window"), plan.take(300))
  }

  test("range join: containment holds and plan is an equi-join") {
    val df = TemporalJoins.rangeJoinSessions(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, e) = (r.getTimestamp(2), r.getTimestamp(3))
      assert(s.before(e))
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "bucketized range join must be an equi-join")
  }

  test("native as-of operator: row-identical to the composed form, custom exec in plan") {
    val native = TemporalJoins.asofJoinNative(spark, sf)
    val composed = TemporalJoins.asofJoin(spark, sf)
    assert(native.collect().map(_.toString).toSeq ===
      composed.collect().map(_.toString).toSeq)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(400))
    // the join itself is the custom exec fed by exchanges+sorts; the only
    // Window allowed is the right-side dedup prep, not a join-side
    // union+last_value fallback
    assert(!plan.contains("last("), "native path must not fall back to the window-last form")
  }

  test("approx distinct sketch stays within 5% of exact") {
    import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct}
    graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect().foreach { r =>
        val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        assert(math.abs(approx - exact) / exact <= 0.05,
          s"approx=$approx exact=$exact")
      }
    // the keyed op emits the same bound as an oracle-checkable boolean
    TemporalJoins.ops.find(_.key == "approx_distinct_users").get
      .run(spark, sf).collect().foreach { r =>
        assert(r.getBoolean(2), s"${r.getString(0)}: hll bound violated")
      }
  }
}
