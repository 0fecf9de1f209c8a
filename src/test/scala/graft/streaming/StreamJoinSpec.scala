package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SharedSpark.spark

case class Impression(user_id: Long, campaign: String, imp_time: java.sql.Timestamp)
case class Conversion(user_id: Long, conv_time: java.sql.Timestamp, amount: Double)

/** Stream-stream interval join: attribution within a horizon, watermark-
  * bounded state, outer rows emitted only when the watermark closes them.
  */
class StreamJoinSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def startQuery(df: org.apache.spark.sql.DataFrame, name: String) =
    df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()

  test("inner: conversions attribute only within the horizon, across micro-batches") {
    val imps = MemoryStream[Impression]
    val convs = MemoryStream[Conversion]
    val q = startQuery(
      StreamJoins.attribute(imps.toDF(), convs.toDF(), within = "10 seconds"),
      "attr_inner")
    try {
      imps.addData(
        Impression(1L, "c1", ts("2024-01-01 10:00:00")),
        Impression(2L, "c2", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // conversion arrives a LATER micro-batch — state must hold the open
      // impressions until the watermark passes the horizon
      convs.addData(
        Conversion(1L, ts("2024-01-01 10:00:05"), 9.99),   // inside horizon
        Conversion(2L, ts("2024-01-01 10:00:30"), 5.00))   // outside horizon
      q.processAllAvailable()
      val rows = spark.table("attr_inner")
        .select($"user_id", $"campaign", $"amount").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, "c1", 9.99)))
    } finally q.stop()
  }

  test("leftOuter: unmatched impression emits with nulls once the watermark closes it") {
    val imps = MemoryStream[Impression]
    val convs = MemoryStream[Conversion]
    val q = startQuery(
      StreamJoins.attribute(imps.toDF(), convs.toDF(),
        within = "10 seconds", leftOuter = true),
      "attr_outer")
    try {
      imps.addData(Impression(7L, "c7", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // nothing can emit yet: the horizon is still open
      assert(spark.table("attr_outer").count() == 0L)
      // push BOTH watermarks far past imp_time + horizon → the join
      // state closes and the unmatched row emits with null conv side
      imps.addData(Impression(8L, "c8", ts("2024-01-01 10:05:00")))
      convs.addData(Conversion(9L, ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      q.processAllAvailable()
      val closed = spark.table("attr_outer")
        .where($"user_id" === 7L).collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Any]("conv_time") == null)
      assert(closed.head.getAs[Any]("amount") == null)
    } finally q.stop()
  }

  test("matched conversion joins exactly once even when horizon windows overlap") {
    val imps = MemoryStream[Impression]
    val convs = MemoryStream[Conversion]
    val q = startQuery(
      StreamJoins.attribute(imps.toDF(), convs.toDF(), within = "10 seconds"),
      "attr_multi")
    try {
      // two impressions for the same user, both horizons cover the click →
      // interval-join semantics attribute it to BOTH (it's a join, not
      // last-touch; dedup policy is a downstream choice)
      imps.addData(
        Impression(3L, "early", ts("2024-01-01 10:00:00")),
        Impression(3L, "late", ts("2024-01-01 10:00:04")))
      convs.addData(Conversion(3L, ts("2024-01-01 10:00:05"), 2.0))
      q.processAllAvailable()
      val campaigns = spark.table("attr_multi")
        .where($"user_id" === 3L).select($"campaign").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(campaigns == Seq("early", "late"))
    } finally q.stop()
  }
}
