package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAM-STREAM JOINS — the one Structured-Streaming join class the
  * engine still lacked (stream-static enrichment lives in
  * [[WeatherPipeline.enrichWithLake]]). Shape: event-time INTERVAL join,
  * the ad-attribution / conversion-funnel query — match each right-stream
  * event to the left-stream event it follows within a bounded horizon.
  *
  * Spark's state story makes this scale: BOTH sides are watermarked and
  * the join condition carries an explicit event-time bound, so the state
  * store retains only rows inside `[watermark, watermark + within]` per
  * key — without the time bound the state would grow forever (Spark
  * rejects outer variants outright in that case). At 100 TB/day the state
  * is `rate × horizon`, not history. Batch twins with oracles:
  * `range_join_sessions` / `asof_join` (TemporalJoins).
  */
object StreamJoins {

  /** Attribute `conversions` (user_id, conv_time, amount) to the
    * `impressions` (user_id, imp_time, campaign) they follow within
    * `within`. Inner = attributed conversions only; leftOuter = every
    * impression, matched or not — an unmatched impression emits (with
    * null conversion columns) only once the watermark proves no
    * conversion can still arrive for it (state-store eviction, not a
    * timer).
    */
  def attribute(impressions: DataFrame, conversions: DataFrame,
      within: String = "10 seconds", watermark: String = "5 seconds",
      leftOuter: Boolean = false): DataFrame = {
    val imp = impressions.withWatermark("imp_time", watermark)
    val conv = conversions
      .withColumnRenamed("user_id", "conv_user")
      .withWatermark("conv_time", watermark)
    imp.join(conv,
      expr(s"""user_id = conv_user AND
              |conv_time >= imp_time AND
              |conv_time <= imp_time + interval '$within'""".stripMargin),
      if (leftOuter) "leftOuter" else "inner")
      .select(col("user_id"), col("campaign"), col("imp_time"),
        col("conv_time"), col("amount"))
  }
}
