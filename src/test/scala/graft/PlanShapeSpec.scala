package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

/** Cross-cutting plan-shape guarantees the 100 TB design leans on. */
class PlanShapeSpec extends AnyFunSuite {

  test("AQE coalesces over-provisioned shuffle partitions") {
    val df = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      "AQE must be active and coalescing small shuffle partitions:\n" + plan.take(600))
  }

  test("no keyed query collects to the driver mid-plan") {
    // structural: every registered op returns a DataFrame whose plan is
    // pure Catalyst (a .collect() inside a query function would surface
    // as a LocalRelation of materialized rows at the root)
    SparkEntry.allOps.foreach { op =>
      val plan = op.run(spark, sf).queryExecution.logical.toString
      assert(!plan.startsWith("LocalRelation"),
        s"${op.key} appears to materialize on the driver")
    }
  }
}
