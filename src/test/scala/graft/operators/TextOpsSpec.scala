package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

class TextOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("token counts: regex tokens ignore punctuation, whitespace doesn't") {
    val df = Seq((1L, "hello, world! 42 times")).toDF("doc_id", "text")
      .select(
        size(split(lower($"text"), " ")).as("ws"),
        regexp_count(lower($"text"), lit("[a-z0-9]+")).as("re"))
    val r = df.head
    assert(r.getInt(0) === 4)
    assert(r.getInt(1) === 4) // hello, world, 42, times
  }

  test("lang_id stopword ratio: english-ish text scores over threshold") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is a good mat"),
      (2L, "zx qwv brr lorem ipsum dolor sit amet consectetur")
    ).toDF("doc_id", "text")
    val stops = array(TextOps.Stopwords.map(lit): _*)
    val out = df.select($"doc_id",
      (size(filter(split(lower($"text"), " "), t => array_contains(stops, t)))
        .cast("double") / size(split(lower($"text"), " "))).as("ratio"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) >= 0.05)
    assert(out(2L) < 0.05)
  }

  test("fingerprint normalization: case/whitespace variants share fp_norm") {
    val df = Seq((1L, "Hello World"), (2L, "  hello world "), (3L, "bye"))
      .toDF("doc_id", "text")
      .select($"doc_id", md5(lower(trim($"text")).cast("binary")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("winnow sketch: deterministic, discriminative, edit-tolerant") {
    val op = TextOps.ops.find(_.key == "doc_winnow_fingerprint").get
    // keyed query emits the sketch CSV-serialized (harness can't sort arrays)
    val a = op.run(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = op.run(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.map(_._1).toSeq === b.map(_._1).toSeq)
    assert(a.map(_._2).toSeq === b.map(_._2).toSeq)
    assert(a.map(_._2).distinct.length > a.length / 2, "sketches discriminate")

    // one-char edit mid-doc keeps most sketch entries
    val base = "the quick brown fox jumps over the lazy dog while spark " +
      "shuffles parquet partitions across the cluster every single day"
    val edited = base.replace("lazy", "hazy")
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
      .select($"doc_id", TextOps.winnowSketch($"text").as("s"))
    val sk = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlap = sk(1L).intersect(sk(2L)).size.toDouble / sk(1L).union(sk(2L)).size
    assert(overlap >= 0.5, s"edit tolerance: overlap=$overlap")
  }

  test("multimodal stub features are deterministic and sized right") {
    val a = Multimodal.extractFeatures(spark, sf).collect()
    val b = Multimodal.extractFeatures(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === graft.sources.Tables.documents(spark, sf).count())
  }

  test("generator is deterministic across invocations") {
    val a = graft.sources.Generator.genRows(spark, 100).collect()
    val b = graft.sources.Generator.genRows(spark, 100).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.forall { r =>
      val t = r.getDouble(2); t >= 0.0 && t < 120.0
    })
  }
}
