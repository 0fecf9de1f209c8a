package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

/** Distributed spherical k-means: blob recovery, exact determinism
  * across partitionings, and the broadcast-assignment plan shape.
  */
class KMeansSpec extends AnyFunSuite {
  import spark.implicits._

  // 3 well-separated direction blobs in 8-dim, deterministic jitter
  private def blobs(n: Int): org.apache.spark.sql.DataFrame = {
    (0 until n).map { i =>
      val blob = i % 3
      val e = Array.tabulate(8) { d =>
        val base = if (d == blob) 10.0f else 0.0f
        base + ((i * 31 + d * 7) % 5) * 0.1f
      }
      (i.toLong, e, blob)
    }.toDF("vec_id", "embedding", "blob")
  }

  test("planted blobs: every vector lands nearest the centroid of its blob") {
    val data = blobs(60)
    val cents = Similarity.kmeansFit(data, k = 3, iters = 4)
    // rebuild centroid vectors and check each is dominated by one axis,
    // one per blob — recovered structure, not init leftovers
    val byCluster = cents.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2))).toMap
    assert(byCluster.size === 3)
    val domAxes = byCluster.values.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(domAxes === Set(0, 1, 2),
      s"each blob axis must dominate exactly one centroid: $byCluster")
    // sizes: 60 vectors split 20/20/20
    val sizes = cents.select($"cluster", $"size").distinct()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.toSeq === Seq(20L, 20L, 20L))
  }

  test("centroids are bit-identical across input partitionings") {
    val a = Similarity.kmeansFit(blobs(60).repartition(1), k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Similarity.kmeansFit(blobs(60).repartition(17), k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "decimal-sum recompute must be order-independent")
  }

  test("keyed kmeans_fit on testdata: k×dim rows, no cartesian, sizes cover the table") {
    val op = Similarity.ops.find(_.key == "kmeans_fit").get
    val out = op.run(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val rows = out.collect()
    assert(rows.length === 8 * 64)
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    val sizeSum = rows.groupBy(_.getLong(0)).values
      .map(_.head.getLong(3)).sum
    assert(sizeSum === total, "every vector is assigned to exactly one cluster")
  }
}
