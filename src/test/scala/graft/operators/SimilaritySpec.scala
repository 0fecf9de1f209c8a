package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark.{spark, sf}

class SimilaritySpec extends AnyFunSuite {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0)),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)),
      (Array(3.0, 4.0, 0.0), Array(3.0, 4.0, 0.0))
    ).toDF("a", "b").select(round(Similarity.cosine($"a", $"b"), 9).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(1.0, 0.0, 1.0))
  }

  test("brute-force top-k is ordered desc and self-excluded") {
    val rows = Similarity.bruteForceTopK(spark, sf, numQueries = 3, k = 5).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qId, rs) =>
      val cos = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y }, "desc order")
      assert(rs.forall(_.getLong(1) != qId), "self excluded")
      assert(rs.length <= 5)
    }
  }

  test("ANN results come from hamming≤1 probe buckets, ranked like brute force") {
    // single-table config: the hamming≤1 assertion only holds within one
    // hyperplane family (the keyed query runs L=4 — see the recall test)
    val ann = Similarity.annTopK(spark, sf, numQueries = 3, k = 5, numTables = 1).collect()
    assert(ann.nonEmpty)
    val planes = Similarity.hyperplanes(4, 64)
    val buckets = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id",
        Similarity.bucketOf(transform($"embedding", x => x.cast("double")), planes)
          .as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // multiprobe: every (q, hit) bucket pair differs in at most one plane bit
    ann.foreach { r =>
      val (q, hit) = (r.getLong(0), r.getLong(1))
      assert(java.lang.Long.bitCount(buckets(q) ^ buckets(hit)) <= 1,
        s"q=$q hit=$hit outside the multiprobe radius")
    }
    // within the probed region, ANN ranking equals brute-force ranking
    val bf = Similarity.bruteForceTopK(spark, sf, numQueries = 3, k = 500)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2)))).toMap
    ann.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val annIds = rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      val expected = bf(q)
        .filter(p => java.lang.Long.bitCount(buckets(p._1) ^ buckets(q)) <= 1)
        .map(_._1).take(annIds.size).toSeq
      assert(annIds === expected)
    }
  }

  test("cosine dedup finds planted near-identical vectors") {
    // plant: 100 base vectors + 1 near-copy of vec 0 (tiny perturbation)
    val base = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("e"))
      .limit(100)
    val planted = base.where($"vec_id" === 0)
      .select(lit(100000L).as("vec_id"),
        transform($"e", x => x * 1.000001).as("e"))
    val all = base.union(planted)
    val planes = Similarity.hyperplanes(4, 64)
    val v = all.withColumn("bucket", Similarity.bucketOf($"e", planes))
    val a = v.select($"bucket", $"vec_id".as("id_a"), $"e".as("e_a"))
    val b = v.select($"bucket", $"vec_id".as("id_b"), $"e".as("e_b"))
    val pairs = a.join(b, Seq("bucket")).where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", Similarity.cosine($"e_a", $"e_b").as("cos"))
      .where($"cos" >= 0.999)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((0L, 100000L)))
  }

  test("IVF: hits share the query's cell and rank like brute force in-cell") {
    val ivf = Similarity.ivfTopK(spark, sf, numQueries = 3, k = 5).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val cells = rs.map(_.getLong(1)).distinct
      assert(cells.length === 1, s"query $q probed cells ${cells.toSeq}")
      val cos = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (x, y) => x >= y })
    }
  }

  test("L=4 ANN recall@10 >= 0.8 on planted clustered vectors") {
    // 24 clusters × 50 members in 64-dim: center from a seeded RNG,
    // members = center + small noise → true top-10 of any query is
    // dominated by its own cluster, the regime LSH is built for.
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(24)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 1200).map { i =>
      val c = centers(i % 24)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(df, numQueries = 5, k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = Similarity.annTopK(df, numQueries = 5, k = 10, numPlanes = 4, numTables = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      ann.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean (per-query: ${recalls.toSeq})")
  }

  test("semantic dedup: within-cluster policy, smallest id survives, partition sound") {
    val out = Similarity.semanticDedup(spark, sf, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == total, "every vector gets a verdict")
    assert(out.map(_._3).forall(k => k == 0L || k == 1L))
    assert(out.exists(_._3 == 0L), "demo threshold must find duplicates")
    // the FIRST vector of every cluster can have no earlier neighbor
    out.groupBy(_._2).foreach { case (_, vs) =>
      assert(vs.minBy(_._1)._3 == 1L, "cluster's smallest id must be kept")
    }
    // every duplicate has an earlier in-threshold neighbor IN ITS CLUSTER
    // (spot-check via the exact pair list restricted to same-cell pairs)
    val cellOf = out.map(v => v._1 -> v._2).toMap
    val pairs = graft.SparkEntry.queries("embedding_dedup_exact")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val dupIds = out.filter(_._3 == 0L).map(_._1).toSet
    val explained = pairs.filter { case (a, b, _) =>
      cellOf(a) == cellOf(b) && dupIds(b)
    }.map(_._2).toSet
    assert(dupIds == explained,
      "dup verdicts must coincide with same-cell earlier-neighbor pairs")
  }

  test("similarity plans broadcast the query side (no shuffle of candidates)") {
    val plan = Similarity.bruteForceTopK(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), "query vectors must be broadcast")
  }

  test("int8 quantization: codes in [-127,127], integers, absmax hits ±127") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val q = emb.select($"vec_id",
      Similarity.quantizeInt8(transform($"embedding", x => x.cast("double"))).as("q"))
    val bad = q.where(exists($"q",
      c => abs(c) > 127.0 || c =!= floor(c))).count()
    assert(bad === 0, "every code must be an integer in [-127, 127]")
    // per-vector absmax maps to exactly ±127 (scale calibration)
    val noPeak = q.where(array_max(transform($"q", c => abs(c))) =!= 127.0).count()
    assert(noPeak === 0, "the absmax element must quantize to ±127")
  }

  test("quantized top-10 agrees with the float metric (recall >= 0.8)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(Similarity.bruteForceTopK(emb, numQueries = 5, k = 10))
    val quant = sets(Similarity.quantizedTopK(emb, numQueries = 5, k = 10))
    val recalls = exact.map { case (qid, t) =>
      quant.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean quantized recall@10 = $mean")
  }

  test("exact all-pairs tiers refuse over-limit inputs, pointing at the ANN tier") {
    // own session: spark.graft.exact.maxRows is session conf, must not
    // leak into sibling tests
    val s = spark.newSession()
    s.conf.set("spark.graft.exact.maxRows", "7")
    import s.implicits._
    val big = (0L until 8L).map(i => (i, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val eBrute = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(big, numQueries = 2, k = 3)
    }
    assert(eBrute.getMessage.contains("spark.graft.exact.maxRows"))
    assert(eBrute.getMessage.contains("similarity_ivf"))
    // at/under the limit the guard is silent and results are unchanged
    s.conf.set("spark.graft.exact.maxRows", "8")
    assert(Similarity.bruteForceTopK(big, numQueries = 1, k = 3).count() === 3)
  }
}
