package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The INGEST SEAM: one config-driven factory for the pipeline's
  * streaming source, so swapping the test transport (file-drop
  * directory, MemoryStream) for the production one (Kafka) is a CONFIG
  * change, not a code change — the reference wires the same swap in
  * compose.yaml:96-183 (Kafka broker) + flink/sql/weather-aggregation
  * .sql:8-17 (`connector = kafka`, JSON value format).
  *
  * {{{
  * // test:        Sources.stream(spark, SourceConf.file("/drop/dir"))
  * // production:  Sources.stream(spark, SourceConf.kafka("broker:9092", "weather"))
  * }}}
  *
  * Every branch yields the SAME shape — untyped rows of
  * (city, temperature, ts) strings, the wire schema of
  * [[WeatherPipeline.WeatherRecord]] (reference: server.py:63-70) — so
  * everything downstream of the seam ([[WeatherPipeline.run]],
  * [[JdbcUpsert.run]], the lake sinks) is transport-agnostic.
  *
  * The kafka branch BUILDS the full reader (format, subscribe options,
  * value-JSON projection); this sandbox ships no kafka-sql connector
  * jar, so constructing it throws Spark's missing-data-source error at
  * `load()` — [[SourcesSpec]] asserts the config wiring up to that
  * boundary, and on a cluster with the standard
  * `spark-sql-kafka-0-10` jar the same config line just works.
  */
object Sources {

  /** Wire schema of the weather records (all strings on the wire;
    * parsing/validation is [[WeatherPipeline.parse]]'s job, AFTER the
    * transport seam).
    */
  val WireSchema: StructType = StructType(Seq(
    StructField("city", StringType), StructField("temperature", StringType),
    StructField("ts", StringType)))

  sealed trait SourceConf
  object SourceConf {
    /** File-drop directory of JSON-lines records (the offline stand-in
      * for the HTTP→Kafka edge; FileIngestSpec drops real files).
      */
    final case class FileDrop(dir: String, maxFilesPerTrigger: Option[Int] = None)
      extends SourceConf
    /** Kafka topic of JSON-valued records — the production transport. */
    final case class Kafka(bootstrapServers: String, topic: String,
        startingOffsets: String = "latest",
        extraOptions: Map[String, String] = Map.empty) extends SourceConf
    /** A pre-built streaming DataFrame (MemoryStream tests inject here). */
    final case class Direct(df: DataFrame) extends SourceConf

    def file(dir: String): SourceConf = FileDrop(dir)
    def kafka(bootstrapServers: String, topic: String): SourceConf =
      Kafka(bootstrapServers, topic)
    def direct(df: DataFrame): SourceConf = Direct(df)

    /** Config-map form (`source.kind` = file|kafka) for wiring from
      * properties files / spark-submit `--conf`.
      */
    def fromMap(m: Map[String, String]): SourceConf =
      m.getOrElse("source.kind", "file") match {
        case "file" => FileDrop(m("source.path"),
          m.get("source.maxFilesPerTrigger").map(_.toInt))
        case "kafka" => Kafka(
          m("source.kafka.bootstrap.servers"), m("source.kafka.topic"),
          m.getOrElse("source.kafka.startingOffsets", "latest"),
          m.view.filterKeys(_.startsWith("source.kafka.option."))
            .map { case (k, v) => k.stripPrefix("source.kafka.option.") -> v }
            .toMap)
        case other => sys.error(s"unknown source.kind '$other' (file|kafka)")
      }
  }

  /** Build the streaming source for `conf` — always (city, temperature,
    * ts) string rows.
    */
  def stream(spark: SparkSession, conf: SourceConf): DataFrame = conf match {
    case SourceConf.FileDrop(dir, maxFiles) =>
      val r = spark.readStream.schema(WireSchema)
      maxFiles.fold(r)(n => r.option("maxFilesPerTrigger", n)).json(dir)
    case SourceConf.Kafka(servers, topic, starting, extra) =>
      import org.apache.spark.sql.functions.{col, from_json}
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .options(extra)
        .load()
        // value is the JSON record body, exactly the Flink source's
        // `'format' = 'json'` projection (weather-aggregation.sql:14-16)
        .select(from_json(col("value").cast("string"), WireSchema).as("r"))
        .select("r.city", "r.temperature", "r.ts")
    case SourceConf.Direct(df) => df
  }
}
