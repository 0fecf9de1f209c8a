package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.RunningStats._

class RunningStatsSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("transformWithState: per-key running count + EMA across micro-batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Reading]
    val q = RunningStats.run(input.toDS())
      .writeStream.format("memory").queryName("rstats")
      .outputMode("update").start()
    try {
      input.addData(Reading("A", 10.0), Reading("A", 20.0), Reading("B", 5.0))
      q.processAllAvailable()
      input.addData(Reading("A", 40.0))
      q.processAllAvailable()
      val last = spark.table("rstats").as[CityStats].collect()
        .groupBy(_.city).view.mapValues(_.maxBy(_.n)).toMap
      // A: ema = 0.5*20 + 0.5*10 = 15 after b1; 0.5*40 + 0.5*15 = 27.5 after b2
      assert(last("A") === CityStats("A", 3L, 27.5))
      assert(last("B") === CityStats("B", 1L, 5.0))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
