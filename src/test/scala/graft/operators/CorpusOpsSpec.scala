package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

class CorpusOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def fp = md5(lower(trim($"text")).cast("binary"))

  test("incremental bloom dedup equals the naive anti-join, through the bloom plan") {
    val all = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", fp.as("fp"))
    val batch = all.where($"doc_id" % 5 === 0)
    val corpus = all.where($"doc_id" % 5 =!= 0)

    val viaBloom = CorpusOps.incrementalDedup(batch, corpus, 1000000L)
    // plan shape: a bloom might_contain probe fed by a scalar subquery,
    // plus the exact anti-join on the candidate branch only
    val plan = viaBloom.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1500))
    assert(plan.toLowerCase.contains("scalar-subquery"), plan.take(1500))
    assert(viaBloom.queryExecution.sparkPlan.toString.contains("LeftAnti"))

    val naive = batch.join(corpus.select($"fp"), Seq("fp"), "left_anti")
    val a = viaBloom.select($"doc_id").collect().map(_.getLong(0)).sorted
    val b = naive.select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.toSeq === b.toSeq)
  }

  test("bloom prefilter: definitely-new docs bypass the join (no false negatives)") {
    // planted: corpus {a,b}, batch {b (dup), c, d}; bloom must never rule
    // out b, and c/d must survive regardless of bloom false positives
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "fp")
    val batch = Seq((10L, "bbb"), (11L, "ccc"), (12L, "ddd")).toDF("doc_id", "fp")
    val out = CorpusOps.incrementalDedup(batch, corpus, 100L)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(11L, 12L))
  }

  test("KMV-auto-sized bloom dedup: estimate within sketch error, result exact") {
    val all = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", fp.as("fp"))
    val batch = all.where($"doc_id" % 5 === 0)
    val corpus = all.where($"doc_id" % 5 =!= 0)

    // the statistics job: KMV estimate tracks the exact distinct count
    val est = corpus
      .select(graft.functions.KmvSketch.kmvDistinct($"fp").as("n"))
      .head().getLong(0)
    val exact = corpus.select($"fp").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.10,
      s"KMV estimate $est vs exact $exact drifted past 10%")

    // sizing keeps headroom above the estimate and floors tiny corpora
    assert(CorpusOps.bloomSizeFor(est) >= est)
    assert(CorpusOps.bloomSizeFor(10L) === 1024L)

    // end-to-end: auto-sized plan is still exact vs the naive anti-join
    val auto = CorpusOps.incrementalDedupAuto(batch, corpus)
    assert(auto.queryExecution.optimizedPlan.toString.contains("might_contain"))
    val a = auto.select($"doc_id").collect().map(_.getLong(0)).sorted
    val naive = batch.join(corpus.select($"fp"), Seq("fp"), "left_anti")
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.toSeq === naive.toSeq)
  }

  test("hash split is deterministic and approximately 80/10/10") {
    val q = CorpusOps.ops.find(_.key == "split_hash_assign").get
    val out = q.run(spark, sf).cache()
    val n = out.count().toDouble
    val frac = out.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.797) < 0.08, frac.toString)
    assert(frac("val") > 0.03 && frac("test") > 0.03, frac.toString)
    // determinism: same assignment on a second run
    val again = q.run(spark, sf)
    assert(out.unionByName(again).distinct().count() === out.count())
    out.unpersist()
  }

  test("pipeline_curate: gates drop rows, dedup keeps min doc_id per fingerprint") {
    val out = CorpusOps.ops.find(_.key == "pipeline_curate").get
      .run(spark, sf).cache()
    val n = out.count()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(n > 0 && n < total, s"gates should drop some of $total, kept $n")
    assert(out.select($"fp_norm").distinct().count() === n, "one row per fingerprint")
    // single plan: one fp_norm aggregation exchange + the final sort's
    // range exchange, nothing else (counted as physical Exchange nodes —
    // the AQE plan STRING repeats them in its initial-plan section)
    val shuffles = out.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.size
    assert(shuffles <= 2, s"curate pipeline must stay one-shuffle-ish, saw $shuffles")
    out.unpersist()
  }

  test("chunkTokens: boundary arithmetic, overlap, and lossless coverage") {
    import spark.implicits._
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, doc(5)),    // shorter than window → one clamped chunk
      (2L, doc(64)),   // exactly one window — NO redundant tail chunk
      (3L, doc(96)),   // 2 chunks, second clamped to 48
      (4L, doc(150))   // 1 + ceil((150-64)/48) = 3 chunks
    ).toDF("doc_id", "text")
    val out = CorpusOps.chunkTokens(docs, window = 64, stride = 48)
      .orderBy($"doc_id", $"chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    assert(byDoc(1L).map(_.getLong(2)).toSeq === Seq(5L))
    assert(byDoc(2L).map(_.getLong(2)).toSeq === Seq(64L))
    assert(byDoc(3L).map(_.getLong(2)).toSeq === Seq(64L, 48L))
    assert(byDoc(4L).map(_.getLong(2)).toSeq === Seq(64L, 64L, 54L))
    // consecutive chunks share exactly window - stride = 16 tokens
    val c4 = byDoc(4L).map(_.getString(3).split(" ").toSeq)
    assert(c4(0).takeRight(16) === c4(1).take(16), "overlap carries context")
    // dropping each chunk's first 16 overlap tokens (after chunk 0)
    // reconstructs the full token stream exactly — nothing lost, nothing
    // duplicated
    val rebuilt = c4.head ++ c4.tail.flatMap(_.drop(16))
    assert(rebuilt === doc(150).split(" ").toSeq)
  }

  test("corpusShuffle: contiguous permutation, seed-sensitive, no global window over data") {
    val docs = (1L to 300L).toDF("doc_id")
    val ep1 = CorpusOps.corpusShuffle(docs, "ep1").collect()
    // positions are exactly 1..N (the bucketed rank is globally contiguous)
    assert(ep1.map(_.getLong(0)).sorted.toSeq === (1L to 300L).toSeq)
    // reproducible: same seed → identical permutation
    val ep1b = CorpusOps.corpusShuffle(docs, "ep1").collect()
    assert(ep1.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      ep1b.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    // a new epoch seed is a genuinely different permutation
    val ep2 = CorpusOps.corpusShuffle(docs, "ep2").collect()
    assert(ep1.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq !==
      ep2.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
    // the only unpartitioned window runs over the 256-row bucket counts,
    // never the documents: every data-side Window node must carry keys
    val plan = CorpusOps.corpusShuffle(docs, "ep1").queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "per-bucket rank must be a partitioned window")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.forall(w =>
      !w.child.output.map(_.name).contains("doc_id")),
      "an unpartitioned window may only consume the 256-row bucket counts, " +
        "never the document stream")
  }
}
