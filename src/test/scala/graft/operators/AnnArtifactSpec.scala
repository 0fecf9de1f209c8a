package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}
import graft.syntax._

/** The frozen ANN artifacts' 100 TB write shape: corpus-sized artifacts
  * (PQ codes, IVF cell assignment — one row per vector) must write
  * PARTITIONED BY CELL, never funneled through coalesce(1); the
  * clustering arity follows the SemDeDup k ≈ n/1000 regime with a
  * small-corpus floor that keeps every test-scale build at k=8 (the
  * unrolled-Lloyd's oracles' seeded arity).
  */
class AnnArtifactSpec extends AnyFunSuite {

  test("dedupK: n/1000 regime with floor 8 and cap 65536") {
    assert(Similarity.dedupK(0L) == 8)
    assert(Similarity.dedupK(500L) == 8)      // sf0.01 corpus
    assert(Similarity.dedupK(2000L) == 8)     // sf0.1 corpus
    assert(Similarity.dedupK(8000L) == 8)
    assert(Similarity.dedupK(10000000L) == 10000)   // paper regime: 10M → 10k cells
    assert(Similarity.dedupK(1000000000L) == 65536) // capped
  }

  test("corpus artifacts are cell-partitioned directories, not one file") {
    // force-build via the public accessors (marker-guarded write-once)
    val codes = Similarity.annCodes(spark, sf)
    val cells = Similarity.annCells(spark, sf)
    val dir = "/tmp/graft_lake/v6_ann_" + sf.replaceAll("[^A-Za-z0-9.]", "_")
    for (art <- Seq("codes", "cells")) {
      val parts = Option(new java.io.File(s"$dir/$art").listFiles())
        .getOrElse(Array.empty).filter(_.getName.startsWith("cell="))
      assert(parts.length > 1,
        s"$art must be written partitioned by cell (found ${parts.length} cell dirs)")
    }
    // the cell column reads back as LONG (partition inference would
    // narrow to int and flip downstream schemas)
    assert(codes.schema("cell").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(cells.schema("cell").dataType ==
      org.apache.spark.sql.types.LongType)
    // codes carry one row per corpus vector, same as the assignment
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(codes.count() == n && cells.count() == n)
  }

  test("incremental IVF append: identical to full rebuild, base files untouched") {
    // build the incremental index (base batch + appended delta batch)
    val incr = Similarity.incrementalCells(spark, sf)
    // capture the on-disk file set, then re-read: append must have added
    // files inside cell dirs without rewriting the base batch's files
    val dir = new java.io.File(
      "/tmp/graft_lake/v6_ann_" + sf.replaceAll("[^A-Za-z0-9.]", "_"),
      "cells_incr")
    def parquets(f: java.io.File): Seq[String] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        c => if (c.isDirectory) parquets(c)
             else if (c.getName.endsWith(".parquet")) Seq(c.getPath) else Nil
      }
    val files = parquets(dir)
    assert(files.size > Similarity.dedupK(0L),
      "append must add files beyond one per cell dir")

    // row-identical to the full single-shot assignment: cell choice is a
    // pure function of (vector, frozen centroids) — arrival order is
    // invisible in the index
    val full = Similarity.annCells(spark, sf)
    assert(incr.count() == full.count())
    assert(incr.except(full).isEmpty && full.except(incr).isEmpty)

    // the PQ codes artifact grows the same way (frozen codebook): the
    // incremental codes table is row-identical to the full encode
    val codesIncr = Similarity.incrementalCodes(spark, sf)
    val codesFull = Similarity.annCodes(spark, sf)
      .select(codesIncr.columns.map(col): _*)
    assert(codesIncr.count() == codesFull.count())
    assert(codesIncr.except(codesFull).isEmpty &&
      codesFull.except(codesIncr).isEmpty)

    // and the served query over the grown index equals the trained query
    val viaIncr = Similarity.ivfTopKOverCells(
      graft.sources.Tables.embeddings(spark, sf),
      Similarity.annCentroids(spark, sf), incr, numQueries = 5, k = 10)
    val viaFull = Similarity.ivfTopKTrained(
      graft.sources.Tables.embeddings(spark, sf),
      Similarity.annCentroids(spark, sf), numQueries = 5, k = 10)
    assert(viaIncr.collect().toSeq == viaFull.collect().toSeq)
  }

  test("cell sizes stay bounded: Σ|cell|² is a real reduction from n²") {
    val cells = Similarity.annCells(spark, sf)
    val n = cells.count()
    val sizes = cells.groupBy($"cell").count().collect().map(_.getLong(1))
    assert(sizes.length == Similarity.dedupK(n))
    // the within-cell pairwise work must be far below all-pairs; at the
    // paper's k ≈ n/1000 this is ~n×1000 — at the test floor (k=8) the
    // sound bound is a constant-factor reduction plus no degenerate
    // one-cell collapse
    val pairWork = sizes.map(s => s * s).sum
    assert(pairWork < n.toDouble * n / 2,
      s"semantic-dedup candidate work $pairWork is not a reduction of n²=${n * n}")
    assert(sizes.max < n, "all vectors collapsed into one cell")
  }

  test("IVF-PQ search over the cell-carrying codes artifact stays correct") {
    // enc already carries its cell: the probe must use it directly (no
    // assignment join) and return the same rows as the joined form
    val enc = Similarity.annCodes(spark, sf)
    val cells = Similarity.annCells(spark, sf)
    val cents = Similarity.annCentroids(spark, sf)
    val cb = Similarity.annCodebook(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val direct = Similarity.ivfPqTopK(emb, cents, cells, enc, cb,
      numQueries = 3, k = 5).collect()
    val joined = Similarity.ivfPqTopK(emb, cents, cells,
      enc.drop("cell"), cb, numQueries = 3, k = 5).collect()
    assert(direct.nonEmpty)
    assert(direct.map(_.toString).toSeq == joined.map(_.toString).toSeq)
  }
}
