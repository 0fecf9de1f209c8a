package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

/** Transitive near-dup clustering: connected components, the portable
  * md5-MinHash family, and the bucket-join plan guarantee.
  */
class DedupClusterSpec extends AnyFunSuite {
  import spark.implicits._

  test("connectedComponents: chain floods to the min id (multi-iteration)") {
    // 1-2-3-4-5 is a diameter-4 path — label 1 needs 4 propagation
    // rounds to reach node 5, so this exercises the loop, not one pass
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val got = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("clusterDocs: A~A'~A'' chain lands in ONE cluster; outsider alone") {
    // ~0.9 Jaccard neighbors (3 of 60 tokens changed): well inside the
    // 4×4-band LSH recall zone; base↔far alone is weaker (6 changed) —
    // the cluster must form through the chain
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val mid = (1 to 60).map(i => if (i > 57) s"x$i" else s"w$i").mkString(" ")
    val far = (1 to 60).map(i =>
      if (i > 57) s"x$i" else if (i <= 3) s"y$i" else s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, mid), (3L, far),
      (4L, "zebra yoga xylophone walrus violin umbrella turtle squid nine ten")
    ).toDF("doc_id", "text")
    val got = Dedup.clusterDocs(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 1L)))
  }

  test("portable kernel band keys equal the column-expression form") {
    val sample = graft.sources.Tables.documents(spark, sf).limit(50)
    val viaKernel = Dedup.shingleSets(sample)
      .as[(Long, Array[String])]
      .flatMap { case (id, sh) =>
        Dedup.PortableMinHash.bandKeys(sh).map { case (b, h) => (id, b, h) }
      }.collect().toSet
    val viaColumns = sample
      .select($"doc_id", Dedup.shingles($"text").as("sh"))
      .where(size($"sh") > 0)
      .select($"doc_id", explode(Dedup.portableBands($"sh")).as("b"))
      .select($"doc_id", $"b.band", $"b.bh")
      .as[(Long, Int, String)].collect().toSet
    assert(viaKernel.nonEmpty && viaKernel === viaColumns)
  }

  test("dedup_cluster finds the planted multi-doc cluster in testdata") {
    val out = Dedup.ops.find(_.key == "dedup_cluster").get.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists(_._3 >= 2L), "expected planted near-dup clusters")
    // cluster_id is the min doc_id of its cluster
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
      assert(members.forall(_._3 === members.length.toLong))
    }
  }

  test("cluster candidate generation has no cartesian product") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val plan = Dedup.clusterDocs(docs, 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "portable-LSH candidates must bucket-join on (band, bh)")
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
