package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.StreamingDedup.DocRecord

/** transformWithState (arbitrary-state API v2) dedup must match the
  * flatMapGroupsWithState form exactly: first occurrence per
  * fingerprint wins across micro-batches, min doc_id wins within one.
  * Runs under RocksDB (the only provider v2 supports — the same
  * pairing [[StateStores]] prescribes at the ≥10⁹-key tier).
  */
class StreamingDedupV2Spec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("v2 stateful dedup drops repeats within and across micro-batches") {
    StateStores.withProvider(spark, "rocksdb") {
      val input = MemoryStream[DocRecord]
      val q = StreamingDedupV2.dedupStreamV2(input.toDS())
        .writeStream.format("memory").queryName("dedup_v2_out")
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
        val got = spark.table("dedup_v2_out").as[DocRecord].collect()
          .map(d => d.fp -> d.doc_id).toMap
        assert(got === Map("fpA" -> 1L, "fpB" -> 2L, "fpC" -> 5L))
      } finally q.stop()
    }
  }

}
