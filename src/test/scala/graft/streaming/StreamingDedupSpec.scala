package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.StreamingDedup._

class StreamingDedupSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stateful dedup drops repeats within and across micro-batches") {
    val input = MemoryStream[DocRecord]
    val q = dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(
        DocRecord(3L, "fpA", "hello"),
        DocRecord(1L, "fpA", "hello"),   // same batch dup → min doc_id wins
        DocRecord(2L, "fpB", "world"))
      q.processAllAvailable()
      input.addData(
        DocRecord(9L, "fpA", "hello"),   // cross-batch dup → dropped by state
        DocRecord(5L, "fpC", "fresh"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[DocRecord].collect()
        .map(d => d.fp -> d.doc_id).toMap
      assert(got === Map("fpA" -> 1L, "fpB" -> 2L, "fpC" -> 5L))
    } finally q.stop()
  }
}
