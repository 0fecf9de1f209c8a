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

  test("trained IVF (nprobe=2) recall@10 >= 0.8 on clustered vectors") {
    // same clustered regime as the ANN recall test: true neighbours live
    // in the query's own cluster, which trained centroids carve out
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(24)(Array.fill(64)(rnd.nextGaussian()))
    val rows = (0 until 1200).map { i =>
      val c = centers(i % 24)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(df, numQueries = 5, k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val cents = Similarity.kmeansFit(df, k = 24, iters = 3)
    val ivf = Similarity.ivfTopKTrained(df, cents, numQueries = 5, k = 10, nprobe = 2)
      .collect()
    // integrity: each query's candidates come from at most nprobe cells
    ivf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(1)).distinct.length <= 2, s"query $q probed too many cells")
    }
    val got = ivf.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean (per-query: ${recalls.toSeq})")
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
