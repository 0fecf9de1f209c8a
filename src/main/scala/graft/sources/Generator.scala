package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.syntax._

/** S1 — synthetic row generator, the Spark form of the reference's client
  * (reference: client/producer.py:34-39,57-78): key × bounded uniform
  * 2-dp "temperature" × second-grid timestamp.
  *
  * Deterministic LCG arithmetic instead of `rand()` so the DuckDB oracle
  * reproduces the rows bit-for-bit. Scale: `spark.range` is an embarrassingly
  * parallel source — n rows split across partitions, no shuffle anywhere.
  */
object Generator {

  val RowCount = 10000L

  def genRows(s: SparkSession, n: Long = RowCount): DataFrame =
    s.range(n).select(
      $"id",
      concat(lit("city_"), ($"id" % 10).cast("string")).as("city"),
      round((($"id" * 9301L + 49297L) % 233280L) / lit(233280.0) * 120, 2)
        .as("temperature"),
      round((($"id" * 9301L + 49297L) % 233280L) / lit(233280.0) * 120, 2)
        .cast("string").as("temperature_str"),
      expr("timestampadd(SECOND, CAST(id * 5 AS INT), TIMESTAMP '2024-01-01 00:00:00')")
        .as("ts"))
      .orderBy($"id")

  def ops: Seq[Op] = Seq(
    Op("gen_rows",
      (s, _) => genRows(s),
      s"""SELECT range AS id,
         |       'city_' || CAST(range % 10 AS VARCHAR) AS city,
         |       round(CAST((range * 9301 + 49297) % 233280 AS DOUBLE) / 233280.0 * 120, 2) AS temperature,
         |       CAST(round(CAST((range * 9301 + 49297) % 233280 AS DOUBLE) / 233280.0 * 120, 2) AS VARCHAR) AS temperature_str,
         |       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (range * 5) SECOND AS ts
         |FROM range($RowCount) ORDER BY id""".stripMargin)
  )
}
