package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** Bucketed co-location: join and aggregation on the bucket key must
  * plan with ZERO shuffle exchanges once broadcast is ruled out.
  */
class BucketedSpec extends AnyFunSuite {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    "ShuffleExchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
  }

  private def withNoBroadcast(body: => Unit): Unit = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed join is exchange-free under SortMergeJoin") {
    withNoBroadcast {
      val (evT, usrT) = Bucketed.ensure(spark, sf)
      val j = spark.table(evT).join(spark.table(usrT), Seq("user_id"))
        .select($"event_id", $"n_events")
      assert(shuffles(j) === 0,
        j.queryExecution.executedPlan.toString.take(1000))
      assert(j.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    }
  }

  test("groupBy on the bucket key is exchange-free") {
    val (evT, _) = Bucketed.ensure(spark, sf)
    val g = spark.table(evT).groupBy($"user_id").agg(avg($"value"))
    assert(shuffles(g) === 0,
      g.queryExecution.executedPlan.toString.take(1000))
  }

  test("DDL re-registration over existing bucketed files keeps co-location") {
    withNoBroadcast {
      // ensure() twice: second call takes the marker path (DROP + CREATE
      // TABLE ... CLUSTERED BY over the same files)
      Bucketed.ensure(spark, sf)
      val (evT, usrT) = Bucketed.ensure(spark, sf)
      val j = spark.table(evT).join(spark.table(usrT), Seq("user_id"))
      assert(shuffles(j.select($"event_id", $"n_events")) === 0)
      // and the data is intact
      assert(spark.table(evT).count() ===
        Tables.events(spark, sf).count())
    }
  }
}
