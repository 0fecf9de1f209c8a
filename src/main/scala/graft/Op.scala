package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One keyed operator of the engine: the Spark implementation plus (where
  * SQL-expressible) an equivalent ANSI-SQL oracle string run by the driver
  * in DuckDB over the same parquet tables (SURVEY.md §5 plan).
  *
  * Ops without an oracle (LSH dedup, ANN, streaming) get a weaker
  * rows-only check from the driver and a dedicated scalatest instead.
  */
final case class Op(
    key: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(key: String, run: (SparkSession, String) => DataFrame, oracle: String): Op =
    Op(key, run, Some(oracle))
}
