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

  private def ev(id: Long, fp: String, t: String) =
    DocEvent(id, fp, "txt", java.sql.Timestamp.valueOf(t))

  test("TTL dedup: fingerprint state expires once the watermark passes first-seen + TTL") {
    val input = MemoryStream[DocEvent]
    val q = dedupStreamTTL(
        input.toDS().withWatermark("event_time", "5 seconds"),
        java.time.Duration.ofSeconds(30))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      // batch 1: first occurrence kept, in-batch + cross-batch dups dropped
      input.addData(
        ev(3L, "fpA", "2024-01-01 10:00:01"),
        ev(1L, "fpA", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      input.addData(ev(7L, "fpA", "2024-01-01 10:00:02")) // within TTL → drop
      q.processAllAvailable()
      // batches 2-3: advance the watermark past first-seen(10:00:00) + 30s
      // (watermark for batch N comes from batch N-1's max event time, and
      // timed-out groups fire on the NEXT batch after it passes)
      input.addData(ev(100L, "fpW", "2024-01-01 10:01:05"))
      q.processAllAvailable()
      input.addData(ev(101L, "fpW2", "2024-01-01 10:01:06"))
      q.processAllAvailable()
      // batch 4: fpA's state was evicted → same fingerprint emits again
      input.addData(ev(9L, "fpA", "2024-01-01 10:01:10"))
      q.processAllAvailable()
      val got = spark.table("dedup_ttl_out").as[DocEvent].collect()
        .filter(_.fp == "fpA").map(_.doc_id).sorted
      assert(got.toSeq === Seq(1L, 9L),
        "fpA must be emitted once per TTL horizon (first-seen wins inside one)")
    } finally q.stop()
  }
}
