package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. These are the workload
  * carriers for the engine: `events` plays the reference's Kafka
  * "weather" stream in batch form (reference:
  * logging-server/server.py:63-70 record shape), the TPC-H-ish tables
  * carry relational breadth, `documents`/`embeddings` carry the
  * LLM-pipeline operators.
  *
  * At 100 TB these would be directory- or bucket-partitioned tables;
  * all readers go through this single seam so a catalog/partitioned
  * layout swap touches one file.
  *
  * Note: `documents` and `embeddings` are present on disk at every scale
  * factor but undocumented in TESTDATA.md (see FIXTURES.md §B for their
  * verified schemas).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot read
    * natively; read it as epoch-nanos long and truncate to microseconds
    * (same truncation DuckDB applies on CAST(ts_ns AS TIMESTAMP), so the
    * oracle sees identical instants).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
