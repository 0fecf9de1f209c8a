package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.spark

/** Degenerate inputs for the iterative operators — the shapes a pipeline
  * hits in production (clean corpus, tiny tables) must not wedge the
  * fixpoint loops.
  */
class IterativeEdgeSpec extends AnyFunSuite {
  import spark.implicits._

  test("clusterDocs: an all-distinct corpus is all singletons (no edges, loop exits)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo")
    ).toDF("doc_id", "text")
    val got = Dedup.clusterDocs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L)))
  }

  test("clusterDocs: docs too short to shingle stay singletons") {
    val docs = Seq((1L, "just two"), (2L, "just two"), (3L, "a b c a b c a b c"))
      .toDF("doc_id", "text")
    val got = Dedup.clusterDocs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // 1 and 2 are identical but sub-shingle-length — they cannot match
    // (documented: shingle-based dedup floors at k tokens; exact dedup
    // catches them), 3 shingles normally
    assert(got.toMap === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("connectedComponents: empty edge list yields empty labels, no iterations hang") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.connectedComponents(edges).collect().isEmpty)
  }

  test("kmeansFit: k larger than the table degrades to one centroid per vector") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, k = 5, iters = 2).collect()
    // 2 vectors → 2 surviving clusters × 2 dims
    assert(cents.length === 4)
    assert(cents.map(_.getLong(0)).distinct.sorted === Array(0L, 1L))
  }

  test("ivfTopKTrained: nprobe beyond the cell count still answers (probes all cells)") {
    val df = (0L until 20L).map(i =>
      (i, Array.tabulate(4)(d => if (d == (i % 2).toInt) 1.0f else 0.1f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, k = 2, iters = 2)
    val out = Similarity.ivfTopKTrained(df, cents, numQueries = 2, k = 5, nprobe = 10)
    assert(out.count() === 10) // 2 queries × top-5
  }
}
