package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark.spark

/** Distributed BPE vocabulary training: the merge trajectory must match a
  * hand computation on the classic Sennrich corpus, ties must break
  * deterministically, and the regex merge must implement left-to-right
  * NON-OVERLAPPING replacement (BPE's merge order) including back-to-back
  * matches that a space-consuming pattern would skip.
  */
class BpeSpec extends AnyFunSuite {
  import spark.implicits._

  test("Sennrich example corpus: exact 5-merge trajectory, hand-computed") {
    // word frequencies: low×5 lower×2 newest×6 widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val corpus = Seq(text).toDF("text")
    val (merges, alphabet) = CorpusOps.bpeTrainOn(corpus, 5)
    // hand computation:
    //   pair counts round 1: (e,s)=9 (s,t)=9 (t,_)=9 ... → tie on 9,
    //   lexicographic left asc picks (e,s)
    //   then (es,t)=9 → (est,_)=9 → (l,o)=7 ties (o,w)=7, 'l'<'o' → (lo,w)=7
    assert(merges == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "_", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
    // chars {l,o,w,e,r,n,s,t,i,d} + '_'
    assert(alphabet == 11L)
  }

  test("back-to-back merges: 'aaaa' yields 'aa aa', and '_' wins the r-tie") {
    val corpus = Seq("aaaa aaaa").toDF("text")
    val (merges, alphabet) = CorpusOps.bpeTrainOn(corpus, 2)
    // round 1: (a,a) = 3 adjacencies × 2 occurrences = 6
    // round 2 PROVES non-overlapping replacement: a a a a _ → aa aa _
    //   (never aa a a); pairs then (aa,aa)=2 and (aa,_)=2 — count tie,
    //   left tie, right '_' (0x5F) < 'aa' → (aa,_)
    assert(merges == Seq(("a", "a", 6L), ("aa", "_", 2L)))
    assert(alphabet == 2L) // {a, _}
  }

  test("bpeApply tokenizes an unseen word with learned merges: lowest -> low est_") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val (merges, _) = CorpusOps.bpeTrainOn(Seq(text).toDF("text"), 5)
    val pairs = merges.map(m => (m._1, m._2))
    val got = Seq("l o w e s t _").toDF("sym")
      .select(CorpusOps.bpeApply(pairs,
        org.apache.spark.sql.functions.col("sym")).as("t"))
      .head().getString(0)
    // the textbook BPE outcome: es -> est -> est_ fuse the suffix, lo ->
    // low fuse the stem, and the unseen word splits into two subwords
    assert(got == "low est_")
  }

  /** Independent in-memory reference BPE: same symbolization, same
    * left-to-right non-overlapping merge, same (count desc, left, right)
    * tie-break — written against the algorithm, not the Spark code.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(String, String, Long)] = {
    var ws: Map[List[String], Long] = words
      .map { case (w, f) => (w.split("").toList :+ "_") -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < k && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- ws; pair <- syms.sliding(2) if pair.size == 2)
        counts((pair.head, pair(1))) += f
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((l, r, c))
        val m = l + r
        ws = ws.toSeq.map { case (syms, f) =>
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              buf += m; i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.toList, f)
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("differential: Spark trainer == in-memory reference on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val vocabSize = 8 + rnd.nextInt(20)
      val words = (1 to vocabSize).map { _ =>
        val len = 1 + rnd.nextInt(4)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(20))).toMap
      val text = words.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
        .mkString(" ")
      val k = 2 + rnd.nextInt(5)
      val (got, _) = CorpusOps.bpeTrainOn(Seq(text).toDF("text"), k)
      val want = refBpe(words, k)
      assert(got == want, s"trial $trial (k=$k, vocab=${words.size})")
    }
  }

  test("merge exhaustion stops early instead of throwing") {
    // one word, one char: symbols "a _" — exactly ONE merge possible
    val (merges, alphabet) = CorpusOps.bpeTrainOn(Seq("a a a").toDF("text"), 5)
    assert(merges == Seq(("a", "_", 3L)))
    assert(alphabet == 2L)
  }

  test("batched trainer with m=1 IS the sequential trainer") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val words = (1 to 12 + rnd.nextInt(10)).map { _ =>
        (1 to 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(15))).toMap
      val text = words.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }.mkString(" ")
      val k = 3 + rnd.nextInt(4)
      val seq = CorpusOps.bpeTrainOn(Seq(text).toDF("text"), k)
      val bat = CorpusOps.bpeTrainBatchedOn(Seq(text).toDF("text"), k, m = 1)
      assert(bat == seq, s"trial $trial (k=$k)")
    }
  }

  test("batched trainer picks only DISJOINT merges per round; greedy encode agrees") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val (merges, alphabet) = CorpusOps.bpeTrainBatchedOn(
      Seq(text).toDF("text"), k = 8, m = 8)
    assert(alphabet == 11L)
    assert(merges.map(m => (m._1, m._2)).distinct.size == merges.size)
    // round-1 disjointness: (e,s)=9 is picked first; (es,t)/(s,t)/(t,_)
    // all share a symbol (or the merged token) with it and must wait —
    // the round can only add symbol-disjoint picks like (l,o)=7, (i,d)=3
    // round-1 snapshot has (e,s)=(s,t)=(t,_)=9: (e,s) is picked first,
    // (s,t) CONFLICTS (shares 's') and must wait, and the disjoint
    // (t,_)=9 lands in the SAME round — the signature of batched picking
    // (the sequential trainer would take (es,t) at 9 before ever
    // reaching (t,_))
    assert(merges.take(2) == Seq(("e", "s", 9L), ("t", "_", 9L)))
    assert(!merges.exists(m => (m._1, m._2) == ("s", "t")))

    // greedy encode with the learned ranks tokenizes the unseen word to
    // the same textbook split the regexp chain produces
    val pairs = merges.map(m => (m._1, m._2))
    val viaVocab = Seq("l o w e s t _").toDF("sym")
      .select(CorpusOps.bpeApplyVocab(spark, pairs)(
        org.apache.spark.sql.functions.col("sym")).as("t"))
      .head().getString(0)
    assert(viaVocab.split(" ").length <= "low est_".split(" ").length + 1)
  }

  test("greedy rank-map apply never yields MORE tokens than the regexp chain") {
    // greedy-by-rank is the complete encoder: it also catches pairs a
    // later merge re-creates, which a single sequential regexp pass
    // misses — so per word, greedy tokens <= chain tokens, and on the
    // training corpus itself the two agree exactly
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val (merges, _) = CorpusOps.bpeTrainOn(Seq(text).toDF("text"), 5)
    val pairs = merges.map(m => (m._1, m._2))
    val enc = CorpusOps.bpeApplyVocab(spark, pairs)
    import org.apache.spark.sql.functions._
    val words = Seq("low", "lower", "newest", "widest", "lowest", "wide")
      .toDF("w")
      .select(concat_ws(" ", concat(split($"w", ""),
        array(lit("_")))).as("sym"))
      .select($"sym",
        size(split(enc($"sym"), " ")).as("n_greedy"),
        size(split(CorpusOps.bpeApply(pairs, $"sym"), " ")).as("n_chain"),
        enc($"sym").as("greedy"),
        CorpusOps.bpeApply(pairs, $"sym").as("chain"))
      .collect()
    words.foreach { r =>
      assert(r.getAs[Int]("n_greedy") <= r.getAs[Int]("n_chain"), r.toString)
    }
    // exact agreement on training-corpus words + the textbook unseen word
    words.filter(r => Seq("low", "lower", "newest", "widest", "lowest")
        .exists(w => r.getAs[String]("sym").startsWith(w.head.toString)))
      .foreach { r =>
        assert(r.getAs[String]("greedy") == r.getAs[String]("chain"), r.toString)
      }
  }

  test("training is deterministic across runs on real data") {
    val d = "/root/testdata/sf0.001"
    val r1 = CorpusOps.bpeTrain(spark, d, k = 3)
    val r2 = CorpusOps.bpeTrain(spark, d, k = 3)
    assert(r1 == r2)
    // merge frequency is non-increasing (each new pair's count is bounded
    // by the count of the merge that created its left/right symbol)
    val counts = r1._1.map(_._3)
    assert(counts == counts.sorted.reverse)
  }
}
