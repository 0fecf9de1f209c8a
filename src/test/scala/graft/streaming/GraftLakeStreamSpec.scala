package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.spark
import graft.sources.LakeIO
import graft.syntax._

/** The lake as a Structured Streaming SOURCE: snapshot versions are
  * offsets, manifest diffs are micro-batches — Delta streaming-table
  * semantics (backfill first, then exactly the appended files, restart
  * resumes from the checkpointed version with no re-delivery).
  */
class GraftLakeStreamSpec extends AnyFunSuite {

  private val root = "/tmp/graft_lake_test/stream_src/events"
  private val ckpt = "/tmp/graft_lake_test/stream_src/ckpt"
  private val out = "/tmp/graft_lake_test/stream_src/out"

  private def rm(p: String): Unit = {
    def go(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(go)); f.delete()
    }
    go(new java.io.File(p))
  }

  private def batch(fromId: Long, n: Long) =
    spark.range(fromId, fromId + n).select(
      $"id".as("event_id"),
      expr("timestampadd(MINUTE, CAST(id % 120 AS INT), timestamp'2024-05-01 00:00:00')")
        .as("ts"),
      ($"id" % 97).cast("double").as("value"))

  test("lake streaming source: backfill, per-snapshot increments, checkpoint restart") {
    rm(root); rm(ckpt); rm(out)
    LakeIO.writeLake(batch(0, 100), root)                    // v1
    def startQuery() = spark.readStream.format("graft-lake-stream").load(root)
      .select($"event_id")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    def sunk = spark.read.parquet(out)
    val q = startQuery()
    try {
      q.processAllAvailable()
      // first batch = the full backfill (version 0 -> head)
      assert(sunk.count() === 100L)
      LakeIO.evolveAppend(batch(100, 50), root)              // v2
      q.processAllAvailable()
      assert(sunk.count() === 150L)
      // increment only -- no event_id delivered twice
      assert(sunk.select($"event_id").distinct().count() === 150L)
    } finally q.stop()

    // append while the stream is DOWN, then restart from the checkpoint:
    // only the unseen snapshot arrives (no backfill re-delivery)
    LakeIO.evolveAppend(batch(150, 30), root)                // v3
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(sunk.count() === 180L, "restart must deliver only the unseen snapshot")
      assert(sunk.select($"event_id").distinct().count() === 180L)
    } finally q2.stop()
  }
}
