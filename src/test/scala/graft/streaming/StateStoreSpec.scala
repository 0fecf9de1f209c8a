package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.StreamingDedup._

/** The state-store provider seam: the SAME keyed-dedup semantics must
  * hold under the RocksDB provider (the ≥10⁹-key scale path — state on
  * local SSD, bounded heap) as under the default on-heap provider, and
  * the query must verifiably RUN on RocksDB (provider metrics present),
  * not silently fall back.
  */
class StateStoreSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("providerClass resolves names and rejects junk") {
    assert(StateStores.providerClass("rocksdb") == StateStores.RocksDb)
    assert(StateStores.providerClass("memory") == StateStores.Memory)
    assert(StateStores.providerClass("com.example.MyProvider") ==
      "com.example.MyProvider")
    intercept[IllegalArgumentException] { StateStores.providerClass("bogus") }
  }

  test("stateful dedup runs identically on the RocksDB provider") {
    StateStores.withProvider(spark, "rocksdb") {
      val input = MemoryStream[DocRecord]
      val q = dedupStream(input.toDS())
        .writeStream.format("memory").queryName("dedup_rocks_out")
        .outputMode("append").start()
      try {
        input.addData(
          DocRecord(3L, "fpA", "hello"),
          DocRecord(1L, "fpA", "hello"),
          DocRecord(2L, "fpB", "world"))
        q.processAllAvailable()
        input.addData(
          DocRecord(9L, "fpA", "hello"),
          DocRecord(5L, "fpC", "fresh"))
        q.processAllAvailable()
        val got = spark.table("dedup_rocks_out").as[DocRecord].collect()
          .map(d => d.fp -> d.doc_id).toMap
        assert(got === Map("fpA" -> 1L, "fpB" -> 2L, "fpC" -> 5L))
        // prove RocksDB actually carried the state: its provider reports
        // rocksdb-prefixed custom metrics on the state operator
        import scala.jdk.CollectionConverters._
        val metrics = q.lastProgress.stateOperators.head.customMetrics
          .keySet().asScala
        assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
          s"expected RocksDB state metrics, got: ${metrics.mkString(",")}")
      } finally q.stop()
    }
    // the seam restored the prior provider
    assert(spark.conf.getOption(StateStores.ProviderConf).isEmpty ||
      spark.conf.get(StateStores.ProviderConf) != StateStores.RocksDb)
  }
}
