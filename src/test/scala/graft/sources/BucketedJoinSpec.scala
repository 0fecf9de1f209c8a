package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** Co-located (bucketed) joins — the 100 TB pattern for repeated fact-fact
  * joins on the same key: bucket both sides once, then every join on the
  * bucket key runs with ZERO shuffle exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite {

  test("join of co-bucketed tables has no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    Tables.customer(spark, sf).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val n = joined.count()
      assert(n === Tables.orders(spark, sf).join(
        Tables.customer(spark, sf), $"o_custkey" === $"c_custkey").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle either side:\n" + plan.take(800))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
