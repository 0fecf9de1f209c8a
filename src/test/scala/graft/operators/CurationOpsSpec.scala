package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** Curation operators: plan shapes the 100 TB design requires plus the
  * semantic properties the SQL oracle can't express structurally.
  */
class CurationOpsSpec extends AnyFunSuite {

  private def op(key: String) =
    graft.SparkEntry.queries(key)(spark, sf)

  test("contamination join broadcasts the eval side and never goes cartesian") {
    val df = op("contamination_ngram")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "eval side must broadcast:\n" + plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "no cartesian candidate generation:\n" + plan.take(800))
  }

  test("quality_repetition keep flag is consistent and splits the corpus") {
    val rows = op("quality_repetition").collect()
    rows.foreach { r =>
      val expect = r.getDouble(1) <= 0.55 && r.getDouble(2) <= 0.06
      assert(r.getBoolean(3) === expect, s"row $r")
    }
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length, s"thresholds must split: $kept/${rows.length}")
  }

  test("redact_denylist leaves no denylisted term behind") {
    val redacted = graft.sources.Tables.documents(spark, sf)
      .select(regexp_replace($"text", "\\b(customer|vector)\\b", "[TERM]").as("t"))
      .where(regexp_count($"t", lit("\\b(customer|vector)\\b")) > 0)
    assert(redacted.isEmpty)
    val hits = op("redact_denylist").agg(sum($"n_hits")).head.getLong(0)
    assert(hits > 0, "corpus should contain denylisted terms")
  }

  test("sample_stratified is balanced and deterministic") {
    val a = op("sample_stratified").collect()
    val b = op("sample_stratified").collect()
    assert(a.toSeq === b.toSeq)
    val perLang = a.groupBy(_.getString(1)).view.mapValues(_.length)
    perLang.foreach { case (lang, n) => assert(n <= 50, s"$lang: $n > 50") }
  }

  test("pack_greedy bins are contiguous per lang and conserve tokens") {
    val bins = op("pack_greedy").collect()
    bins.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head === 0L, s"$lang bins must start at 0")
      assert(ids.toSeq === (0L until ids.length).toSeq, s"$lang bins must be contiguous")
    }
    val packed = bins.map(_.getLong(3)).sum
    val total = graft.sources.Tables.documents(spark, sf)
      .select(size(split(lower($"text"), " ")).cast("long").as("t"))
      .agg(sum($"t")).head.getLong(0)
    assert(packed === total, "packing must conserve tokens")
  }

  test("sample_importance recovers a planted target-domain vocabulary under either hash") {
    // The driver's synthetic documents share ONE 31-word vocabulary
    // across every lang (no real lexical signal), so the semantic claim
    // is proven on a PLANTED corpus (the dedup-quality pattern): target
    // docs mix domain words with shared filler, distractors use a
    // disjoint domain vocabulary at the same length — the importance
    // ranking must surface the target docs under both hash knobs.
    val tgtVocab = Seq("alpha", "beta", "gamma", "delta")
    val othVocab = Seq("omega", "sigma", "tau", "rho")
    val shared = Seq("the", "of", "and", "data")
    def text(i: Int, domain: Seq[String]): String =
      (0 until 24).map { j =>
        if (j % 2 == 0) domain((i + j) % domain.length)
        else shared((i * 7 + j) % shared.length)
      }.mkString(" ")
    val rows = (0 until 100).map(i => (i.toLong, "en", text(i, tgtVocab))) ++
      (100 until 200).map(i => (i.toLong, "de", text(i, othVocab)))
    val corpus = {
      import spark.implicits._
      rows.toDF("doc_id", "lang", "text")
    }
    Seq(true, false).foreach { portable =>
      val top = CurationOps.importanceTopK(corpus, k = 50, portableHash = portable).collect()
      assert(top.length === 50)
      assert(top.map(_.getLong(3)).toSeq === (1L to 50L), "ranks must be 1..50")
      val en = top.count(_.getString(1) == "en")
      assert(en >= 45, s"portableHash=$portable: expected >=45/50 target docs, got $en")
    }
    // and on the driver data the ranking stays deterministic end-to-end
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = CurationOps.importanceTopK(docs, k = 20).collect()
    val b = CurationOps.importanceTopK(docs, k = 20).collect()
    assert(a.toSeq === b.toSeq)
  }
}
