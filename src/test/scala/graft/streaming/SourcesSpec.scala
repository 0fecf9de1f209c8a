package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SharedSpark.spark
import graft.streaming.Sources.SourceConf

/** The transport seam: config picks the source; everything downstream is
  * transport-agnostic. The kafka branch constructs the full reader —
  * offline (no connector jar) it must fail at the data-source LOOKUP
  * boundary, i.e. the config wiring itself is exercised end-to-end.
  */
class SourcesSpec extends AnyFunSuite {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("config map dispatches file | kafka | rejects unknown kinds") {
    assert(SourceConf.fromMap(Map("source.kind" -> "file", "source.path" -> "/x"))
      === SourceConf.FileDrop("/x", None))
    assert(SourceConf.fromMap(Map(
      "source.kind" -> "kafka",
      "source.kafka.bootstrap.servers" -> "broker:9092",
      "source.kafka.topic" -> "weather",
      "source.kafka.option.kafka.group.id" -> "g1"))
      === SourceConf.Kafka("broker:9092", "weather", "latest",
        Map("kafka.group.id" -> "g1")))
    val e = intercept[RuntimeException] {
      SourceConf.fromMap(Map("source.kind" -> "carrier-pigeon"))
    }
    assert(e.getMessage.contains("carrier-pigeon"))
  }

  test("direct (MemoryStream) source flows through the same seam") {
    val input = MemoryStream[WeatherPipeline.WeatherRecord]
    val store = new WeatherPipeline.UpsertStore
    val src = Sources.stream(spark, SourceConf.direct(input.toDF()))
    val q = WeatherPipeline.run(src, store)
    try {
      input.addData(WeatherPipeline.WeatherRecord("A", "10.0", "2024-01-01 10:00:01"))
      q.processAllAvailable()
      assert(store.size === 1)
    } finally q.stop()
  }

  test("kafka branch wires the connector config; offline it stops at source lookup") {
    val e = intercept[Throwable] {
      Sources.stream(spark, SourceConf.kafka("broker:9092", "weather")).schema
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.toLowerCase.contains("kafka")),
      s"failure must be the missing kafka CONNECTOR, not our wiring: $e")
  }
}
