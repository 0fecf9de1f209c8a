package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables
import graft.syntax._

/** Deduplication operators over `documents` — exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard (north-star training-data-pipeline surface).
  *
  * Scale design (the part that matters at 100 TB):
  * - Candidate generation is ALWAYS bucket-join shaped — explode to
  *   (bucket, doc) and self-join on the bucket key. Never an all-pairs
  *   crossJoin: cost is Σ bucket_size², not n².
  * - Signatures are a pure map stage — the hot path uses the compiled
  *   [[Dedup.MinHashKernel]] (see its scaladoc for the measured
  *   HOF-vs-kernel numbers); the column-expression forms remain the
  *   semantic reference used by the specs. No shuffle until the bucket
  *   groupBy.
  * - Verification (exact Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** Granular (sub-document) dedup on a (doc_id, text) frame: fixed
    * `segWords`-word segments, corpus-wide first-occurrence-wins (by
    * doc_id, then position), docs reassembled from surviving segments.
    * Segmentation is map-side array math (no word-level explode row
    * blow-up before the shuffle); the only shuffle is the segment-key
    * window — one hash partition per distinct segment, the same
    * single-shuffle shape as dedup_exact. Reassembly sorts each doc's
    * surviving segments via array_sort over collect_list (collect_list
    * alone has no ordering guarantee).
    */
  def segmentDedup(docsDf: DataFrame, segWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val segs = docsDf
      .withColumn("words", split($"text", " "))
      .select($"doc_id", posexplode(expr(
        s"transform(sequence(0, CAST(ceil(size(words) / $segWords.0) AS INT) - 1), " +
          s"i -> array_join(slice(words, i * $segWords + 1, $segWords), ' '))"))
        .as(Seq("seg_no", "seg")))
      .withColumn("seg_no", $"seg_no".cast("long"))
    segs
      .withColumn("rn", row_number().over(
        Window.partitionBy($"seg").orderBy($"doc_id", $"seg_no")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"),
        expr("array_join(transform(filter(array_sort(collect_list(" +
          "struct(seg_no, rn, seg))), x -> x.rn = 1), x -> x.seg), ' ')")
          .as("text_dedup"))
      .orderBy($"doc_id")
  }

  /** Word k-shingles of the lowercased text, distinct. Texts shorter
    * than k tokens yield an empty array (an unguarded
    * `sequence(0, size-k)` would count DOWN for size < k and emit
    * negative-index garbage slices).
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = split(lower(text), " ")
    when(size(t) >= k,
      array_distinct(
        transform(sequence(lit(0), size(t) - k),
          i => concat_ws(" ", slice(t, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Deterministic odd multipliers/offsets for the affine minhash family. */
  private def mhA(i: Int): Long = 0x9E3779B97F4A7C15L * (2 * i + 1)
  private def mhB(i: Int): Long = 0xC2B2AE3D27D4EB4FL * (i + 1)

  /** MinHash signature from pre-hashed shingles: shingle strings are
    * xxhash64'd ONCE, then each of the `numHashes` families is a cheap
    * affine transform `h*a+b` over the longs (the classic one-hash
    * minhash construction — 16 string hashes per shingle would cost 16×
    * the string traversals for the same estimator quality).
    */
  def minhashSig(sh: Column, numHashes: Int = 16): Column = {
    val hs = transform(sh, x => xxhash64(x))
    array((0 until numHashes).map { i =>
      array_min(transform(hs, h => h * lit(mhA(i)) + lit(mhB(i))))
    }: _*)
  }

  /** (band_id, band_hash) pairs for LSH banding of a minhash signature. */
  def bands(sig: Column, numBands: Int = 4, rowsPerBand: Int = 4): Column =
    array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }: _*)

  /** Compiled shingle/minhash kernel for the hot path. The column-function
    * pipeline above it is semantically identical but measured ~30× slower
    * per doc (nested higher-order functions interpret per element and
    * allocate a list per shingle; 0.33 ms/doc steady-state vs ~10 µs
    * here) — at 100 TB the constant factor IS the job, so this is the
    * documented `mapPartitions`-tier exception of the design rules.
    */
  object MinHashKernel {
    val NumHashes = 16; val NumBands = 4; val RowsPerBand = 4; val K = 3

    def fnv1a(s: String): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      h
    }

    def shingles(text: String): Array[String] = {
      val t = text.toLowerCase.split(' ')
      if (t.length < K) Array.empty
      else Array.tabulate(t.length - K + 1)(i =>
        t(i) + " " + t(i + 1) + " " + t(i + 2)).distinct
    }

    /** (band, band-hash) keys from the affine-minhash signature. */
    def bandKeys(sh: Array[String]): Array[(Int, Long)] = {
      val hs = sh.map(fnv1a)
      val sig = Array.tabulate(NumHashes) { i =>
        val a = mhA(i); val b = mhB(i)
        var m = Long.MaxValue
        var j = 0
        while (j < hs.length) { val v = hs(j) * a + b; if (v < m) m = v; j += 1 }
        m
      }
      Array.tabulate(NumBands) { bnd =>
        var h = 0xcbf29ce484222325L
        var r = 0
        while (r < RowsPerBand) { h ^= sig(bnd * RowsPerBand + r); h *= 0x100000001b3L; r += 1 }
        (bnd, h)
      }
    }
  }

  /** PORTABLE MinHash family: `sig_i = min over shingles of
    * md5(i ":" shingle)` (lexicographic min of the lowercase hex), bands
    * hashed as `md5(sig_4b ∥ … ∥ sig_4b+3)`. Unlike the xxhash64/fnv
    * families above, md5 exists with identical semantics in every SQL
    * engine — so the WHOLE near-dup pipeline (LSH candidates → Jaccard
    * verify → transitive clustering) becomes oracle-checkable
    * end-to-end, not just rows-only. ~1 ms/doc (1600 tiny md5s) — fine
    * as a map-only stage; the fnv/xxhash kernel stays the hot path when
    * cross-engine reproducibility isn't required.
    */
  object PortableMinHash {
    val NumHashes = 16; val RowsPerBand = 4
    val NumBands: Int = NumHashes / RowsPerBand

    private def md5hex(md: java.security.MessageDigest, s: String): String = {
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hex(d, 0)
    }

    private def hex(d: Array[Byte], off: Int): String = {
      val sb = new java.lang.StringBuilder(32)
      var i = off
      while (i < off + 16) {
        sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
        sb.append(Character.forDigit(d(i) & 0xF, 16))
        i += 1
      }
      sb.toString
    }

    /** Unsigned lexicographic compare of raw digests — EQUAL to comparing
      * their lowercase-hex renderings ('0'-'9' < 'a'-'f' is monotone in
      * the nibble), which is the order the SQL oracle's `min(md5(...))`
      * uses. Lets the signature mins stay raw 16-byte buffers.
      */
    private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < 16) {
        val x = a(i) & 0xFF; val y = b(i) & 0xFF
        if (x != y) return x < y
        i += 1
      }
      false
    }

    /** (band, band-hash-hex) keys; empty input → no keys.
      *
      * Allocation-lean by construction: shingle UTF-8 bytes are encoded
      * ONCE (not once per hash function), each md5 lands in a reused
      * 16-byte scratch via `digest(buf, off, len)`, and only the 16
      * winning signatures are hex-encoded. The naive form (a hex string
      * per (hash, shingle) = ~8k strings/doc) is pure GC pressure at
      * corpus scale — this computes the same mins with ~0 steady-state
      * garbage. Semantics unchanged (DedupClusterSpec asserts equality
      * with the column-expression reference).
      */
    def bandKeys(sh: Array[String]): Array[(Int, String)] =
      if (sh.isEmpty) Array.empty
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val utf8 = java.nio.charset.StandardCharsets.UTF_8
        val shBytes = new Array[Array[Byte]](sh.length)
        var j = 0
        while (j < sh.length) { shBytes(j) = sh(j).getBytes(utf8); j += 1 }
        val scratch = new Array[Byte](16)
        val mins = Array.fill(NumHashes)(new Array[Byte](16))
        var h = 0
        while (h < NumHashes) {
          val prefix = (h.toString + ":").getBytes(utf8)
          val min = mins(h)
          var first = true
          j = 0
          while (j < shBytes.length) {
            md.reset()
            md.update(prefix)
            md.update(shBytes(j))
            md.digest(scratch, 0, 16)
            if (first || less(scratch, min)) {
              System.arraycopy(scratch, 0, min, 0, 16); first = false
            }
            j += 1
          }
          h += 1
        }
        Array.tabulate(NumBands) { b =>
          (b, md5hex(md, hex(mins(b * RowsPerBand), 0)
            + hex(mins(b * RowsPerBand + 1), 0)
            + hex(mins(b * RowsPerBand + 2), 0)
            + hex(mins(b * RowsPerBand + 3), 0)))
        }
      }
  }

  /** Column-expression reference form of [[PortableMinHash.bandKeys]] —
    * the cross-check that the compiled kernel computes exactly what the
    * SQL oracle computes (asserted equal in DedupClusterSpec).
    */
  def portableBands(sh: Column): Column = {
    val sigs = (0 until PortableMinHash.NumHashes).map { h =>
      array_min(transform(sh,
        x => md5(concat(lit(h.toString), lit(":"), x).cast("binary"))))
    }
    array((0 until PortableMinHash.NumBands).map { b =>
      val r = PortableMinHash.RowsPerBand
      struct(lit(b).as("band"),
        md5(concat(sigs(b * r), sigs(b * r + 1), sigs(b * r + 2), sigs(b * r + 3))
          .cast("binary")).as("bh"))
    }: _*)
  }

  /** Doc → distinct shingle set (compiled kernel). Expects columns
    * `doc_id: long`, `text: string` — any corpus DataFrame works.
    */
  def shingleSets(docsDf: DataFrame): DataFrame = {
    implicit val tupEnc = org.apache.spark.sql.Encoders.product[(Long, String)]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[(Long, Array[String])]
    // The signature stage downstream is CPU-bound; a corpus that arrives
    // in fewer splits than cores (one parquet file here) would hash on a
    // single thread. Spread it first — but only then: at real scale the
    // input already has thousands of splits and the raw text should NOT
    // pay an extra shuffle.
    val spread = {
      val cores = docsDf.sparkSession.sparkContext.defaultParallelism
      val src = docsDf.select(col("doc_id"), col("text"))
      if (src.rdd.getNumPartitions < cores) src.repartition(cores) else src
    }
    spread.as[(Long, String)]
      .map { case (id, t) => (id, MinHashKernel.shingles(t)) }
      .filter(_._2.nonEmpty)
      .toDF("doc_id", "sh")
  }

  /** Doc → exploded LSH bucket keys (band, band-hash). */
  private def lshBuckets(sh: DataFrame): DataFrame = {
    implicit val inEnc = org.apache.spark.sql.Encoders.product[(Long, Array[String])]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[(Long, Int, Long)]
    sh.as[(Long, Array[String])]
      .flatMap { case (id, shs) =>
        MinHashKernel.bandKeys(shs).map { case (b, h) => (id, b, h) }
      }
      .toDF("doc_id", "band", "bh")
  }

  /** Candidate near-dup pairs from LSH bucket collisions, verified with
    * exact Jaccard over shingle sets. Bucket-join, never n² — and the
    * candidate `distinct` runs over bare (doc_a, doc_b) id pairs so the
    * heavy shingle arrays never enter a shuffle until the (much smaller)
    * verify join.
    */
  def nearDupPairs(s: SparkSession, d: String, threshold: Double): DataFrame =
    nearDupPairs(docs(s, d), threshold)

  /** [[nearDupPairs]] with the PORTABLE md5-MinHash family instead of the
    * fnv/xxhash kernel: identical pipeline shape (bucket-join candidates →
    * exact-Jaccard verify), but every hash is reproducible in any SQL
    * engine, so the op is hash-exact against the DuckDB oracle instead of
    * rows-only. Same candidates as [[clusterDocs]]'s first two stages.
    */
  def nearDupPairsPortable(docsDf: DataFrame, threshold: Double): DataFrame = {
    implicit val inEnc = org.apache.spark.sql.Encoders.product[(Long, Array[String])]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[(Long, Int, String)]
    val sh = shingleSets(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bnds = sh.as[(Long, Array[String])]
      .flatMap { case (id, shs) =>
        PortableMinHash.bandKeys(shs).map { case (b, h) => (id, b, h) }
      }
      .toDF("doc_id", "band", "bh")
    val cands = bnds.select($"band", $"bh", $"doc_id".as("doc_a"))
      .join(bnds.select($"band", $"bh", $"doc_id".as("doc_b")), Seq("band", "bh"))
      .where($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    cands
      .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .withColumn("jaccard",
        round(size(array_intersect($"sh_a", $"sh_b")).cast("double")
          / size(array_union($"sh_a", $"sh_b")), 4))
      .where($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** DataFrame-first form: near-dup pairs over any (doc_id, text) corpus. */
  def nearDupPairs(docsDf: DataFrame, threshold: Double): DataFrame = {
    // Materialize the per-doc shingle sets once: they feed the signature
    // pass and both verify-join legs (≈3× recompute of the tokenize+
    // shingle+hash pipeline otherwise). Doc-id + shingles is tiny
    // relative to the corpus; MEMORY_AND_DISK spills safely at scale.
    val sh = shingleSets(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = lshBuckets(sh)
    val cands = l.select($"band", $"bh", $"doc_id".as("doc_a"))
      .join(l.select($"band", $"bh", $"doc_id".as("doc_b")), Seq("band", "bh"))
      .where($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b").distinct()
    cands
      .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .withColumn("jaccard",
        round(size(array_intersect($"sh_a", $"sh_b")).cast("double")
          / size(array_union($"sh_a", $"sh_b")), 4))
      .where($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
      .orderBy($"doc_a", $"doc_b")
  }

  /** Distributed connected components over an undirected edge list
    * `(src: long, dst: long)` → `(id, label)` where `label` is the
    * minimum node id reachable from `id` (nodes with no edge are absent —
    * callers coalesce singletons to themselves).
    *
    * Iterative min-label propagation: each round every node takes the min
    * of its own label and its neighbors' labels, so a component's minimum
    * id floods outward one hop per round and the loop converges after
    * `diameter` rounds. Per round: one equi-join of the (persisted,
    * symmetric) edge list with the current labels + one min-aggregation —
    * all distributed; the driver reads back a single 0/1 "anything
    * changed?" scalar (`limit(1).count`), never data. Near-dup graphs
    * have tiny diameters (dup chains a few hops long), so rounds ≈ 3-5
    * regardless of corpus size; for adversarial long-path graphs the
    * alternating star-contraction algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) drops rounds to
    * O(log n) at the cost of re-keying edges each round — not needed for
    * dedup workloads.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // RDD loop, deliberately (the one other mapPartitions-tier exception
    // besides the MinHash kernel): a DataFrame implementation re-plans,
    // re-optimizes and re-CODEGENS a growing lineage on every iteration —
    // measured ~3 s of pure overhead for a 256-edge graph at sf0.1 —
    // while the RDD loop plans nothing per round and keeps both sides of
    // every join co-partitioned (narrow). Per round exactly ONE shuffle
    // (labels flowing along edges, irreducible) and ONE action (the
    // materializing count doubles as the convergence probe). This is
    // GraphX's own substrate; at 100 TB the shape is unchanged — state is
    // (id, label) pairs of edge-touched docs, partitioned by id.
    val spark2 = edges.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Long)]
    val e0 = edges.select($"src", $"dst").as[(Long, Long)].rdd.persist(lvl)
    val nEdges = e0.count() // one cached pass; sizes the loop's partitioner
    // ~100k adjacency entries per partition: a dedup edge graph is tiny
    // relative to its corpus (only near-dup pairs), so a few-hundred-edge
    // local graph runs each round in ONE task (below that, scheduling —
    // not data — dominates: 32 empty tasks × 4 stages × rounds), while a
    // billion-edge graph still fans out to full cluster parallelism.
    val part = new org.apache.spark.HashPartitioner(
      math.max(1, math.min(
        math.max(spark2.sparkContext.defaultParallelism, e0.getNumPartitions),
        (nEdges * 2 / 100000L).toInt)))
    // symmetric adjacency (node -> neighbor), hash-partitioned by node
    val sym = e0.flatMap { case (s, d) => Iterator((s, d), (d, s)) }
      .partitionBy(part).persist(lvl)
    sym.count() // materialize BEFORE the loop reuses it every round
    e0.unpersist(blocking = false)
    // seed with the first hop already taken: label = min(id, neighbors) —
    // a clique-shaped dup cluster (the common case) converges on the very
    // first probe instead of after a no-op round
    var labels = sym.foldByKey(Long.MaxValue, part)(math.min)
      .mapPartitions(_.map { case (id, nbr) => (id, math.min(id, nbr)) },
        preservesPartitioning = true)
      .persist(lvl)
    // the persisted RDD the current labels read through (element type
    // changes across rounds: seed is (id, label), rounds are (id, (label, chg)))
    var owner: org.apache.spark.rdd.RDD[_] = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // label(node) flows to each neighbor; min per receiver. sym and
      // labels share `part`, so the join is narrow — the reduceByKey is
      // the round's one shuffle.
      val nbrMin = sym.join(labels)
        .map { case (_, (nbr, lbl)) => (nbr, lbl) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val updated = labels.leftOuterJoin(nbrMin) // co-partitioned, narrow
        .mapPartitions(_.map { case (id, (l, mn)) =>
          val m = mn.getOrElse(l)
          (id, (math.min(l, m), m < l))
        }, preservesPartitioning = true)
        .persist(lvl)
      // ONE job: pulling the filter through `updated` materializes its
      // cache (full, while the previous round's cache is still live — only
      // then is it safe to drop the old generation) AND returns the
      // changed-row count that decides convergence.
      converged = updated.filter(_._2._2).count() == 0L
      owner.unpersist(blocking = false)
      owner = updated
      labels = updated.mapValues(_._1) // narrow view over the cached round
      iter += 1
    }
    sym.unpersist(blocking = false)
    // `owner` (one small (id, label) state RDD) stays persisted for the
    // caller's downstream joins — the heavy inputs are all released.
    spark2.createDataset(labels)(enc).toDF("id", "label")
  }

  /** Full corpus dedup: portable LSH candidates → exact-Jaccard verify →
    * connected components → `(doc_id, cluster_id, cluster_size)` with
    * `cluster_id` = min doc_id of the duplicate cluster (singletons are
    * their own cluster). Downstream keeps `doc_id == cluster_id` rows.
    *
    * The transitive step is what pair-listing dedup misses: A≈A' and
    * A'≈A'' put all three in ONE cluster even when A vs A'' alone falls
    * below the threshold — dropping per-pair would keep A and A''.
    * Candidate generation stays bucket-join shaped (no cartesian,
    * asserted in DedupClusterSpec); the component loop shuffles only
    * (id, label) pairs of edge-touched docs — a tiny fraction of the
    * corpus at any scale.
    */
  def clusterDocs(docsDf: DataFrame, threshold: Double): DataFrame = {
    implicit val inEnc = org.apache.spark.sql.Encoders.product[(Long, Array[String])]
    implicit val outEnc = org.apache.spark.sql.Encoders.product[(Long, Int, String)]
    val sh = shingleSets(docsDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bnds = sh.as[(Long, Array[String])]
      .flatMap { case (id, shs) =>
        PortableMinHash.bandKeys(shs).map { case (b, h) => (id, b, h) }
      }
      .toDF("doc_id", "band", "bh")
    val cands = bnds.select($"band", $"bh", $"doc_id".as("src"))
      .join(bnds.select($"band", $"bh", $"doc_id".as("dst")), Seq("band", "bh"))
      .where($"src" < $"dst")
      .select($"src", $"dst").distinct()
    val edges = cands
      .join(sh.select($"doc_id".as("src"), $"sh".as("sh_a")), "src")
      .join(sh.select($"doc_id".as("dst"), $"sh".as("sh_b")), "dst")
      .where(size(array_intersect($"sh_a", $"sh_b")).cast("double")
        / size(array_union($"sh_a", $"sh_b")) >= threshold)
      .select($"src", $"dst")
    val labels = connectedComponents(edges)
    // the component loop materialized its label state eagerly — the
    // shingle sets have no further consumer; release them now rather than
    // leaking a heavy cache entry per call
    sh.unpersist(blocking = false)
    val asg = docsDf.select($"doc_id")
      .join(labels.select($"id".as("doc_id"), $"label"), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("cluster_id"))
    asg.join(asg.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size")),
        "cluster_id")
      .select($"doc_id", $"cluster_id", $"cluster_size")
      .orderBy($"doc_id")
  }

  /** PORTABLE SimHash: per-token 64 bits come from the first 16 hex chars
    * of md5(token) — bit b is bit (b%4) of hex digit b/4 — so any SQL
    * engine reproduces the exact same sign sums and the op is hash-exact
    * against the oracle (same portability move as [[PortableMinHash]]).
    * Bit 63's weight is Long.MinValue; bitwise-OR of the disjoint bit
    * terms equals the oracle's two's-complement sum.
    */
  def portableSimhash(text: Column): Column = {
    val th = transform(split(lower(text), " "), t => md5(t.cast("binary")))
    (0 until 64).map { b =>
      when(
        aggregate(th, lit(0L), (s2, h) =>
          s2 + when(shiftright(conv(substring(h, b / 4 + 1, 1), 16, 10).cast("int"), b % 4)
            .bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Token xxhash64 array for [[simhash]] — materialize once per row. */
  def tokenHashes(text: Column): Column =
    transform(split(lower(text), " "), t => xxhash64(t))

  /** 64-bit SimHash from a token-hash array: per bit, sign of Σ±1 across
    * token hashes. Bits unrolled at plan-build time — pure column math.
    */
  def simhash(hashes: Column): Column =
    (0 until 64).map { b =>
      when(
        aggregate(hashes, lit(0L),
          (s2, h) => s2 + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
          > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  def ops: Seq[Op] = Seq(

    // Exact dedup on normalized text: keep min doc_id per content group
    // (hash-groupBy — the 100 TB shape: one shuffle on the fingerprint).
    Op("dedup_exact",
      (s, d) => docs(s, d)
        .groupBy(md5(lower(trim($"text")).cast("binary")).as("fp"))
        .agg(min($"doc_id").as("keep_doc_id"), count(lit(1)).as("dup_count"))
        .orderBy($"keep_doc_id"),
      """SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_doc_id,
        |       count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin),

    // MinHash+LSH near-dup candidate pairs w/ exact-Jaccard verification,
    // in the portable md5-MinHash family — the oracle reproduces the
    // WHOLE pipeline (shingles → signatures → bands → bucket join →
    // Jaccard verify) so the op is hash-exact, not rows-only. The
    // fnv/xxhash kernel form ([[nearDupPairs]]) stays the hot path when
    // cross-engine reproducibility isn't needed (DedupSpec covers it).
    Op("dedup_minhash_lsh",
      (s, d) => nearDupPairsPortable(docs(s, d), threshold = 0.5),
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([array_to_string(toks[i:i+2], ' ')
        |                        for i in range(1, len(toks) - 1)]) AS s
        |       FROM tok),
        |shn AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |sig AS (SELECT doc_id,
        |         [list_aggregate([md5(CAST(h AS VARCHAR) || ':' || x) for x in s], 'min')
        |          for h in range(0, 16)] AS sg
        |        FROM shn),
        |bnd AS (SELECT doc_id, b AS band,
        |         md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bh
        |        FROM sig, range(0, 4) t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh
        |                                AND a.doc_id < b.doc_id),
        |p AS (SELECT doc_a, doc_b,
        |        round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |          / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
        |      FROM cand JOIN shn x ON x.doc_id = cand.doc_a
        |                JOIN shn y ON y.doc_id = cand.doc_b)
        |SELECT doc_a, doc_b, jaccard FROM p
        |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin),

    // Transitive near-dup CLUSTERING: portable md5-MinHash LSH candidates
    // → exact-Jaccard verify → distributed connected components. The md5
    // hash family computes identically in DuckDB, so — uniquely among the
    // LSH ops — the full pipeline is hash-exact against the oracle, whose
    // recursive CTE is the transitive closure the Spark label-propagation
    // loop computes distributively.
    Op("dedup_cluster",
      (s, d) => clusterDocs(docs(s, d), threshold = 0.5),
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([array_to_string(toks[i:i+2], ' ')
        |                        for i in range(1, len(toks) - 1)]) AS s
        |       FROM tok),
        |shn AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |sig AS (SELECT doc_id,
        |         [list_aggregate([md5(CAST(h AS VARCHAR) || ':' || x) for x in s], 'min')
        |          for h in range(0, 16)] AS sg
        |        FROM shn),
        |bnd AS (SELECT doc_id, b AS band,
        |         md5(sg[4*b+1] || sg[4*b+2] || sg[4*b+3] || sg[4*b+4]) AS bh
        |        FROM sig, range(0, 4) t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |         FROM bnd a JOIN bnd b ON a.band = b.band AND a.bh = b.bh
        |                                AND a.doc_id < b.doc_id),
        |edges AS (SELECT src, dst FROM cand
        |          JOIN shn x ON x.doc_id = cand.src
        |          JOIN shn y ON y.doc_id = cand.dst
        |          WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
        |                / len(list_distinct(list_concat(x.s, y.s))) >= 0.5),
        |sym AS (SELECT src, dst FROM edges
        |        UNION ALL SELECT dst AS src, src AS dst FROM edges),
        |reach(id, r) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT reach.id, sym.dst FROM reach JOIN sym ON sym.src = reach.r),
        |lbl AS (SELECT id, min(r) AS cl FROM reach GROUP BY id),
        |asg AS (SELECT d.doc_id, coalesce(l.cl, d.doc_id) AS cluster_id
        |        FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
        |SELECT doc_id, cluster_id,
        |       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        |FROM asg ORDER BY doc_id""".stripMargin),

    // SimHash per doc + 4×16-bit LSH band values for bucketing, in the
    // portable md5 bit family ([[portableSimhash]]) — hash-exact against
    // the oracle. The arithmetic >> then & 65535 masks off the sign
    // extension identically on both engines.
    Op("dedup_simhash",
      (s, d) => docs(s, d)
        .select($"doc_id", portableSimhash($"text").as("sim64"))
        .select(Seq($"doc_id".as("doc_id"), $"sim64".as("sim64")) ++
          (0 until 4).map(b =>
            shiftright($"sim64", b * 16).bitwiseAND(0xFFFFL).as(s"band$b")): _*)
        .orderBy($"doc_id"),
      """WITH tok AS (
        |  SELECT doc_id, [md5(t) for t in string_split(lower(text), ' ')] AS th
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN list_sum([CASE WHEN ((strpos('0123456789abcdef',
        |                 substr(h, (b // 4) + 1, 1)) - 1) >> (b % 4)) & 1 = 1
        |               THEN 1 ELSE -1 END for h in th]) > 0
        |         THEN (CASE WHEN b = 63 THEN (-9223372036854775807 - 1)
        |               ELSE (CAST(1 AS BIGINT) << b) END)
        |         ELSE 0 END AS bit
        |  FROM tok, range(0, 64) t(b)),
        |sim AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sim64
        |        FROM bits GROUP BY doc_id)
        |SELECT doc_id, sim64,
        |  (sim64 >> 0) & 65535 AS band0, (sim64 >> 16) & 65535 AS band1,
        |  (sim64 >> 32) & 65535 AS band2, (sim64 >> 48) & 65535 AS band3
        |FROM sim ORDER BY doc_id""".stripMargin),

    // Exact n-gram Jaccard similarity for a fixed candidate set — the
    // verification kernel alone, SQL-expressible and oracle-checked:
    // consecutive doc_id pairs as a deterministic stand-in candidate list.
    Op("ngram_jaccard",
      (s, d) => {
        val sh = docs(s, d).select($"doc_id", shingles($"text").as("sh"))
        val a = sh.select(($"doc_id").as("doc_a"), $"sh".as("sh_a"))
        val b = sh.select(($"doc_id").as("doc_b"), $"sh".as("sh_b"))
        a.join(b, $"doc_b" === $"doc_a" + 1)
          .select($"doc_a", $"doc_b",
            round(size(array_intersect($"sh_a", $"sh_b")).cast("double")
              / size(array_union($"sh_a", $"sh_b")), 4).as("jaccard"))
          .orderBy($"doc_a")
      },
      """WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct([array_to_string(toks[i:i+2], ' ')
        |                        for i in range(1, len(toks) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |ORDER BY doc_a""".stripMargin),

    // Cross-document REPEATED-SUBSTRING detection (Lee et al.,
    // "Deduplicating Training Data Makes Language Models Better", ACL
    // 2022 — arXiv:2107.06499): unlike [[dedup_segments]]' fixed bins,
    // every OVERLAPPING 8-token window is keyed, windows occurring in
    // more than one document are the repeated spans, and each doc
    // reports its repeated-window fraction (the paper's removal
    // criterion; here surfaced as a keep flag). 100 TB shape: one
    // shuffle on the window key (the suffix-array build is replaced by
    // hash-grouping fixed-length windows — linear, distributable, and
    // the known approximation of the paper's exact-substring variant);
    // per-doc coverage is a second key-bounded join, never pairwise.
    Op("dedup_substring",
      (s, d) => {
        val k = 8
        val toks = docs(s, d).select($"doc_id", split(lower($"text"), " ").as("t"))
        val grams = toks
          .where(size($"t") >= k)
          .select($"doc_id", explode(expr(
            s"transform(sequence(0, size(t) - $k), " +
              s"i -> array_join(slice(t, i + 1, $k), ' '))")).as("g"))
        val repeated = grams.groupBy($"g")
          .agg(countDistinct($"doc_id").as("nd")).where($"nd" > 1)
          .select($"g")
        val perDoc = grams.join(repeated.withColumn("_rep", lit(1)),
            Seq("g"), "left")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_windows"),
            sum(when($"_rep".isNotNull, 1L).otherwise(0L)).as("n_repeated"))
        docs(s, d).select($"doc_id").join(perDoc, Seq("doc_id"), "left")
          .select($"doc_id",
            coalesce($"n_windows", lit(0L)).as("n_windows"),
            coalesce($"n_repeated", lit(0L)).as("n_repeated"))
          .withColumn("rep_frac", when($"n_windows" === 0, 0.0)
            .otherwise(round($"n_repeated".cast("double") / $"n_windows", 4)))
          .withColumn("keep", $"rep_frac" < 0.5)
          .orderBy($"doc_id")
      },
      """WITH toks AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, t,
        |          unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i
        |        FROM toks)),
        |rep AS (
        |  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g)
        |  WHERE nd > 1),
        |m AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_windows,
        |         CAST(sum(CASE WHEN rep.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
        |  FROM g LEFT JOIN rep ON g.g = rep.g GROUP BY g.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(m.n_windows, 0) AS n_windows,
        |  COALESCE(m.n_repeated, 0) AS n_repeated,
        |  CASE WHEN COALESCE(m.n_windows, 0) = 0 THEN 0.0
        |       ELSE round(CAST(m.n_repeated AS DOUBLE) / m.n_windows, 4) END AS rep_frac,
        |  (CASE WHEN COALESCE(m.n_windows, 0) = 0 THEN 0.0
        |        ELSE round(CAST(m.n_repeated AS DOUBLE) / m.n_windows, 4) END < 0.5) AS keep
        |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // Granular (sub-document) dedup — the C4/RefinedWeb "line dedup"
    // shape on this corpus's single-line docs (see [[segmentDedup]]).
    Op("dedup_segments",
      (s, d) => segmentDedup(docs(s, d), segWords = 10),
      """WITH words AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS idx
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(floor((idx - 1) / 10) AS BIGINT) AS seg_no,
        |         string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, floor((idx - 1) / 10)),
        |flagged AS (
        |  SELECT doc_id, seg_no, seg,
        |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
        |  FROM segs)
        |SELECT doc_id,
        |       count(*) AS n_segs,
        |       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       COALESCE(string_agg(seg, ' ' ORDER BY seg_no) FILTER (WHERE rn = 1), '') AS text_dedup
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )
}
