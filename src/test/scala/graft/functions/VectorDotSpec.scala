package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

class VectorDotSpec extends AnyFunSuite {
  import spark.implicits._

  test("vector_dot matches hand math") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))
    ).toDF("a", "b").select(VectorDot($"a", $"b").as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(32.0, 0.0))
  }

  test("vector_dot is null-safe") {
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]]))
      .toDF("a", "b").select(VectorDot($"a", $"b").as("d"))
    assert(df.collect().head.isNullAt(0))
  }

  test("vector_dot is bit-identical to the aggregate(zip_with) fold") {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(transform($"embedding", x => x.cast("double")).as("e"))
    val native = e.select(VectorDot($"e", $"e").as("d")).collect().map(_.getDouble(0))
    val folded = e.select(
      aggregate(zip_with($"e", $"e", (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
        .as("d")).collect().map(_.getDouble(0))
    assert(native.toSeq === folded.toSeq)
  }

  test("vector_dot participates in whole-stage codegen") {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(transform($"embedding", x => x.cast("double")).as("e"))
      .select(VectorDot($"e", $"e").as("d"))
    e.collect() // force codegen compilation; a fallback would log + interpret
    val formatted = e.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the Project evaluating vector_dot must carry a codegen id (the
    // neighbouring higher-order-function transform() Project does not —
    // that asymmetry is the point of the native expression)
    val sections = formatted.split("\n\n")
    val vdSection = sections.find(s => s.contains("Project") && s.contains("vector_dot"))
    assert(vdSection.isDefined, formatted.take(800))
    assert(vdSection.get.contains("codegen id"), vdSection.get)
  }
}
