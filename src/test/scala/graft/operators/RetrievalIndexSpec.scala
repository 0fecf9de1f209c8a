package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** The inverted-index serving contract: (1) the index answers EXACTLY
  * what the corpus scan answers, (2) the probe partition-prunes to the
  * query terms' bucket dirs instead of scanning the whole postings
  * layout, (3) batch-appended growth is row-identical to a full
  * rebuild, and (4) the driver-side bucket literal equals the
  * executor-side pmod(xxhash64) it must prune against.
  */
class RetrievalIndexSpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("driver-side termBucket equals Spark's pmod(xxhash64(term), B)") {
    val sparkSide = {
      import spark.implicits._
      RetrievalOps.QueryTerms.toDF("term")
    }
      .select($"term",
        pmod(xxhash64($"term"), lit(RetrievalOps.IndexBuckets.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    RetrievalOps.QueryTerms.foreach { t =>
      assert(RetrievalOps.termBucket(t).toLong == sparkSide(t),
        s"bucket mismatch for '$t'")
    }
  }

  test("index-served BM25 == corpus-scan BM25, and incremental == full") {
    val scan = rows(graft.SparkEntry.queries("bm25_topk")(spark, sf))
    val full = rows(graft.SparkEntry.queries("bm25_index_topk")(spark, sf))
    val incr = rows(graft.SparkEntry.queries("bm25_index_incremental")(spark, sf))
    assert(scan.nonEmpty)
    assert(full == scan)
    assert(incr == scan)
  }

  test("probe partition-prunes to the query terms' buckets") {
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // populate scan metrics
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val (postings, stats) = RetrievalOps.invertedIndex(spark, sf)
    val total = filesRead(postings)
    val probed = filesRead(RetrievalOps.bm25TopKFromIndex(postings, stats))
    // the probe reads the postings scan (pruned, twice: df + score) plus
    // the 1-file stats scan; even doubled it must be far under one full
    // postings pass — 3 query terms hit ≤ 3 of the populated bucket dirs
    // (22 at the sf0.001 vocabulary; 64 once the vocab saturates).
    assert(total >= 10, s"expected a multi-bucket postings layout, got $total")
    assert(probed < total / 2,
      s"expected bucket pruning: probe read $probed files vs $total total")
  }

  test("bulk probe: per-query contiguous ranks, descending scores, no window") {
    val (postings, stats) = RetrievalOps.invertedIndex(spark, sf)
    val bulk = RetrievalOps.bm25BulkFromIndex(postings, stats)
    val rws = bulk.collect()
    val byQ = rws.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
      val scores = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // per-query rank comes from the bounded heap, never a ranking window
    assert(!bulk.queryExecution.executedPlan.toString.contains("Window"),
      "bulk ranking must not plan a window")
  }

  test("tombstoned probe == fresh rebuild over the live corpus") {
    val out = graft.SparkEntry.queries("bm25_index_tombstoned")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(0) % 7 == 3), "deleted docs must never rank")
    // ground truth: an index REBUILT over the live corpus answers the same
    val liveDir = java.nio.file.Files.createTempDirectory("graft_live_idx").toString
    val live = graft.sources.Tables.documents(spark, sf).where($"doc_id" % 7 =!= 3)
    RetrievalOps.writeIndex(liveDir, live, "overwrite")
    val rebuilt = RetrievalOps.bm25TopKFromIndex(
      spark.read.parquet(liveDir + "/postings"),
      spark.read.parquet(liveDir + "/stats")).collect()
    assert(out.map(_.toString).toSeq == rebuilt.map(_.toString).toSeq,
      "stale index + CDF corrections must equal a fresh rebuild")
  }

  test("postings layout is bucket-partitioned with denormalized dl") {
    val (postings, _) = RetrievalOps.invertedIndex(spark, sf)
    assert(postings.columns.sorted.toSeq ==
      Seq("bucket", "dl", "doc_id", "term", "tf"))
    // derive the dir from the build API — a hardcoded versioned path
    // goes stale on every idxDir layout bump (r12's v1->v2 bump left
    // this passing only while a leftover v1 dir survived in /tmp)
    val dirs = new java.io.File(RetrievalOps.ensureIndex(spark, sf), "postings")
      .listFiles().filter(_.getName.startsWith("bucket="))
    assert(dirs.length > 1, "expected bucket=N partition directories")
  }
}
