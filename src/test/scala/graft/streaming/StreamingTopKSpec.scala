package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.StreamingTopK.TopEntry

class StreamingTopKSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDB(body: => Unit): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
  }

  test("sharded sketch state accumulates exact counts across micro-batches") {
    withRocksDB {
      val input = MemoryStream[String]
      val q = StreamingTopK.run(input.toDS(), k = 8, shards = 4)
        .writeStream.format("memory").queryName("stopk")
        .outputMode("update").start()
      try {
        input.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
        q.processAllAvailable()
        input.addData(Seq.fill(4)("a") ++ Seq.fill(6)("d"): _*)
        q.processAllAvailable()
        // latest row per item (same item always lands in the same shard,
        // so its est is never split — and with cardinality ≤ k it's exact)
        val latest = spark.table("stopk").as[TopEntry].collect()
          .groupBy(_.item).view.mapValues(_.maxBy(_.est)).toMap
        assert(latest("a").est === 9L && latest("a").err === 0L)
        assert(latest("b").est === 3L)
        assert(latest("c").est === 1L)
        assert(latest("d").est === 6L)
        // global top-2 from the query-side merge
        val top2 = latest.values.toSeq.sortBy(e => (-e.est, e.item)).take(2).map(_.item)
        assert(top2 === Seq("a", "d"))
      } finally q.stop()
    }
  }

  test("per-shard eviction keeps the overestimate-only bound under tiny k") {
    withRocksDB {
      val input = MemoryStream[String]
      // k=2 forces eviction inside a shard once >2 distinct items hash there
      val q = StreamingTopK.run(input.toDS(), k = 2, shards = 1)
        .writeStream.format("memory").queryName("stopk_evict")
        .outputMode("update").start()
      try {
        input.addData(Seq.fill(10)("hot") ++ Seq.fill(4)("warm") ++
          Seq("cold1", "cold2", "cold3"): _*)
        q.processAllAvailable()
        val rows = spark.table("stopk_evict").as[TopEntry].collect()
        assert(rows.length === 2)
        val hot = rows.find(_.item == "hot").get
        assert(hot.est >= 10L && hot.est - hot.err <= 10L)
        rows.foreach(e => assert(e.est >= e.err))
      } finally q.stop()
    }
  }
}
