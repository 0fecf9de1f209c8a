package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

/** MinHash/LSH + SimHash behavior on planted duplicates, and the
  * no-cartesian scale guarantee.
  */
class DedupSpec extends AnyFunSuite {
  import spark.implicits._

  test("minhash LSH finds the planted near-duplicates in testdata") {
    // The synthetic corpus plants near-dup pairs (observed jaccard ≥0.95).
    val pairs = Dedup.nearDupPairs(spark, sf, threshold = 0.9).collect()
    assert(pairs.nonEmpty, "expected planted near-dups above 0.9")
  }

  test("identical docs collide in every LSH band; disjoint docs in none") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark parquet shuffle joins")
    ).toDF("doc_id", "text")
    val sigs = docs
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .withColumn("sig", Dedup.minhashSig($"sh"))
      .select($"doc_id", explode(Dedup.bands($"sig")).as("b"))
      .select($"doc_id", $"b.band", $"b.bh")
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L).intersect(sigs(3L)).isEmpty)
  }

  test("near-dup plan contains no cartesian product") {
    val plan = Dedup.nearDupPairs(spark, sf, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidate generation must be a bucket join, not all-pairs")
    assert(!plan.contains("BroadcastNestedLoop"),
      "LSH candidate generation must be an equi-join on (band, bh)")
  }

  test("simhash: near-identical docs are close in hamming distance") {
    val docs = Seq(
      (1L, "spark streaming window aggregation over event time with state"),
      (2L, "spark streaming window aggregation over event time with stats"),
      (3L, "zebra yoga xylophone walrus violin umbrella turtle squid")
    ).toDF("doc_id", "text")
    val hs = docs
      .select($"doc_id", Dedup.tokenHashes($"text").as("th"))
      .select($"doc_id", Dedup.simhash($"th").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) < hamming(hs(1L), hs(3L)))
    assert(hamming(hs(1L), hs(2L)) <= 16)
  }

  test("exact dedup keeps one row per distinct normalized text") {
    val op = Dedup.ops.find(_.key == "dedup_exact").get
    val out = op.run(spark, sf)
    val distinctTexts = graft.sources.Tables.documents(spark, sf)
      .select(lower(trim($"text"))).distinct().count()
    assert(out.count() === distinctTexts)
  }

  test("segment dedup: first occurrence wins, later copies drop, docs reassemble in order") {
    // doc 1: two segments (a b, c d); doc 2 repeats segment (a b) then
    // adds a fresh one; doc 3 is entirely a copy of earlier segments.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, segWords = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (1L, 2L, 2L, "a b c d"),   // all segments first-seen
      (2L, 2L, 1L, "x y"),       // "a b" already owned by doc 1
      (3L, 2L, 0L, "")))         // fully deduplicated away
  }
}
