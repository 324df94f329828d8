package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.XHash

/** Document deduplication for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All hash functions are the
  * md5-based [[XHash]] family so results are deterministic across cluster
  * sizes AND reproducible by the DuckDB oracle.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup = one hash aggregate on a 16-byte digest (shuffle by
  *    digest, never by the document text);
  *  - MinHash/LSH = per-row signature (narrow), explode to `bands` rows per
  *    doc, shuffle by band key (bounded by band-bucket size, not corpus
  *    size), pair-join only inside buckets — the classic way to avoid the
  *    O(n²) all-pairs comparison;
  *  - SimHash = per-row 60-bit sketch (narrow), candidate generation by
  *    rotating band bits, exact Hamming verify after;
  *  - Jaccard verify = array intersect/union on the (distinct) shingle
  *    sets of candidate pairs only.
  */
object Dedup {

  /** Exact dedup: content digest → keep the first (lowest `keep`) row per
    * digest. Implemented as `min_by` over the digest groups rather than a
    * row_number window: min_by is map-side combinable (partial aggregation
    * before the exchange), so at 100 TB the shuffle carries one candidate
    * row per digest per partition instead of every row. */
  def exactDedup(df: DataFrame, text: Column, keep: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(md5(text).as("__digest"))
      .agg(min_by(struct(cols.map(col): _*), keep).as("__row"))
      .select(cols.map(c => col(s"__row.$c")): _*)
  }

  /** Distinct word n-gram shingles; short docs fall back to the whole token
    * list as a single shingle so every doc has ≥1 shingle. Evaluated by the
    * native [[graft.plans.ShinglesExpr]] kernel — bit-identical to the
    * composed-built-ins formulation, spec-locked by VecKernelsSpec against
    * the test-side ReferenceKernels. */
  def wordShingles(toks: Column, n: Int): Column =
    graft.plans.ShinglesExpr(toks, n)

  /** Per-function xor masks, derived once on the driver from the same md5
    * family ([[XHash.bucketHashJvm]]) so the oracle can reproduce them. */
  def minhashMasks(k: Int): Seq[Long] =
    (0 until k).map(j => XHash.bucketHashJvm("mhmask", j.toString))

  /** MinHash signature: each shingle is md5-hashed ONCE; the k hash
    * functions are xor-masked views of that hash (h_j = h ⊕ mask_j, a
    * bijection per j). signature[j] = min over shingles. This keeps the
    * per-row cost at |shingles| md5 + k·|shingles| xors instead of
    * k·|shingles| md5 — the difference between 48 s and 5 s at sf0.1.
    * Evaluated by the native [[graft.plans.MinHashSigExpr]] kernel —
    * bit-identical to the composed-built-ins formulation, spec-locked by
    * VecKernelsSpec against the test-side ReferenceKernels. */
  def minhashSig(shingles: Column, k: Int): Column =
    graft.plans.MinHashSigExpr(shingles, "mh0", minhashMasks(k))

  /** LSH band keys: hash of each signature slice of `rowsPerBand` values.
    * Docs sharing ANY band key are near-dup candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws("\u0001", b.cast("string"),
        array_join(transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")), "\u0001"))))

  /** Candidate stage shared by [[minhashLshPairs]] and the candidate-mass
    * audit (q230): distinct (a_id < b_id) pairs sharing ANY band key, from
    * an exploded (id, __bk) band frame. Ids-only bucket self-join — the
    * shuffle carries 16-byte keys, not shingle arrays. */
  private[graft] def bandJoinCandidates(bandsDf: DataFrame): DataFrame =
    bandsDf.select(col("id").as("a_id"), col("__bk"))
      .join(bandsDf.select(col("id").as("b_id"), col("__bk")), Seq("__bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")

  /** The EXACT candidate set [[minhashLshPairs]] verifies — exposed so the
    * candidate-mass audit certifies the real band join (md5 slice keys:
    * unbounded key space, so random collisions track Jaccard, never
    * corpus²). Returns (a_id, b_id). `cleanup = true` frees the persisted
    * signature barrier eagerly (see [[CacheScope]]). */
  def minhashBandCandidates(docs: DataFrame, idCol: String,
      shinglesCol: String, k: Int = 16, bands: Int = 4,
      cleanup: Boolean = false): DataFrame = {
    val sigDf = docs.select(col(idCol).as("id"),
        minhashSig(col(shinglesCol), k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandJoinCandidates(sigDf.select(col("id"),
      explode(bandKeys(col("sig"), bands, k / bands)).as("__bk")))
    CacheScope.scoped(cand, Seq(sigDf), cleanup)
  }

  /** MinHash+LSH near-duplicate pairs over (id, shingles):
    * explode band keys → self-join per bucket (a.id < b.id) → distinct
    * candidate pairs → exact Jaccard verify ≥ `threshold`.
    * Returns (a_id, b_id, n_common, n_union). `cleanup = true` frees the
    * signature/shingle barriers eagerly (see [[CacheScope]]).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, shinglesCol: String,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      cleanup: Boolean = false): DataFrame = {
    // Materialize shingles and band keys once: the self-join and the two
    // verify joins would otherwise each re-evaluate the full signature
    // subtree (at 100 TB these are checkpointed tables, not recomputes).
    val sh = docs.select(col(idCol).as("id"), col(shinglesCol).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Materialize the signature BEFORE banding: Catalyst collapses adjacent
    // projections and re-inlines lambda expressions, so without this
    // barrier every band key would recompute the full signature (and every
    // signature slot would recompute every shingle hash) — measured 64×
    // the md5 work at sf0.1.
    val sigDf = sh.select(col("id"), minhashSig(col("sh"), k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bandJoinCandidates(sigDf.select(col("id"),
      explode(bandKeys(col("sig"), bands, k / bands)).as("__bk")))
    // exact verify: join the shingle sets back per side
    val out = cand
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("n_common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("n_union", size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("n_common").cast("double") / col("n_union") >= threshold)
      .select("a_id", "b_id", "n_common", "n_union")
    CacheScope.scoped(out, Seq(sh, sigDf), cleanup)
  }

  /** Incremental near-dup pairing: candidate pairs are (corpus × delta)
    * band matches only — pair generation scales with the DELTA's band
    * rows, never corpus². This is how a standing corpus absorbs a crawl
    * increment: old-old pairs are (by contract) already known from the
    * previous run and are never regenerated; only pairs touching a new
    * document appear. `deltaPred` marks the new rows inside `docs`; output
    * pairs are oriented a_id < b_id and verified with exact Jaccard like
    * [[minhashLshPairs]] — on the same corpus, this equals the full run's
    * pairs restricted to those touching the delta.
    */
  def minhashLshPairsDelta(docs: DataFrame, idCol: String, shinglesCol: String,
      deltaPred: Column, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, cleanup: Boolean = false): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(shinglesCol).as("sh"),
        deltaPred.as("__new"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigDf = sh.select(col("id"), col("__new"),
        minhashSig(col("sh"), k).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsDf = sigDf.select(col("id"), col("__new"),
      explode(bandKeys(col("sig"), bands, k / bands)).as("__bk"))
    val cand = bandsDf.select(col("id").as("x_id"), col("__bk"))
      .join(bandsDf.filter(col("__new"))
        .select(col("id").as("y_id"), col("__bk")), Seq("__bk"))
      .filter(col("x_id") =!= col("y_id"))
      .select(least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val out = cand
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("n_common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("n_union", size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("n_common").cast("double") / col("n_union") >= threshold)
      .select("a_id", "b_id", "n_common", "n_union")
    CacheScope.scoped(out, Seq(sh, sigDf), cleanup)
  }

  /** Candidate stage of [[editDistancePairs]] — exposed so candidate-mass
    * audits certify the REAL blocking, not a re-derivation. Returns
    * (a_id, b_id, a_txt, b_txt), a_id < b_id, one row per candidate pair.
    *
    * Block key = (prefix, length band). The prefix alone is a skew trap: a
    * corpus where many docs share one `blockLen`-char prefix (boilerplate
    * headers, templated records) turns that block into a Θ(block²) pair
    * bomb. Banding by ⌊len/(maxDist+1)⌋ splits such a block by length at
    * ZERO recall cost: |len(a)−len(b)| ≤ edit distance, so any pair within
    * `maxDist` differs in length by ≤ maxDist < bandWidth and lands in the
    * same or adjacent band — the A side replicates into its own and both
    * neighbor bands (3× one side's key rows, never 3× the pairs: each pair
    * matches on exactly B's band). Pairs ≥2 bands apart are provably
    * > maxDist and never candidates. The length prefilter then drops
    * adjacent-band pairs past maxDist before any DP runs.
    */
  def editDistanceCandidates(docs: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 24, maxDist: Int = 4): DataFrame = {
    val bandW = maxDist + 1
    val keyed = docs.select(col(idCol).as("id"), col(textCol).as("txt"),
      substring(col(textCol), 1, blockLen).as("__pfx"),
      floor(length(col(textCol)) / lit(bandW)).cast("long").as("__band"))
    keyed
      .withColumn("__jb", explode(array(
        col("__band") - 1, col("__band"), col("__band") + 1)))
      .select(col("id").as("a_id"), col("txt").as("a_txt"),
        col("__pfx"), col("__jb").as("__band"))
      .join(keyed.select(col("id").as("b_id"), col("txt").as("b_txt"),
        col("__pfx"), col("__band")), Seq("__pfx", "__band"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(length(col("a_txt")) - length(col("b_txt"))) <= maxDist)
      .select("a_id", "b_id", "a_txt", "b_txt")
  }

  /** Edit-distance near-duplicate pairs via (prefix, length-band) blocking
    * — the classic record-linkage shape for typo-class duplicates that
    * shingle Jaccard misses (single-character edits leave most shingles
    * intact but exact dedup apart).
    *
    * Candidate pairs form only inside a block (one shuffle on the block
    * key, pair fan-out bounded by block size — see
    * [[editDistanceCandidates]] for the skew-proof key design), then each
    * candidate is verified with the exact Levenshtein DP — O(|a|·|b|) per
    * PAIR, never per corpus. Returns (a_id, b_id, dist ≤ maxDist),
    * a_id < b_id.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 24, maxDist: Int = 4): DataFrame = {
    editDistanceCandidates(docs, idCol, textCol, blockLen, maxDist)
      // native banded DP (graft.plans.EditDistAtMost): 3-arg-levenshtein
      // semantics (exact dist ≤ maxDist, −1 past it) at ~2 orders of
      // magnitude less per-pair cost than the builtin — measured
      // ~1.1 ms/pair for the builtin at ~300 chars (threshold variant
      // included), which at 100× ladder scale (34.8 M candidate pairs)
      // made the verify stage the whole operator. Result set is
      // unchanged (we only keep dist ≤ maxDist), so the full-DP oracle
      // still matches.
      .withColumn("dist",
        graft.plans.TextKernels.editDistAtMost(
          col("a_txt"), col("b_txt"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("int").as("dist"))
  }

  /** SimHash sketch (60-bit to fit [[XHash.bucketHash]]'s range): bit j is
    * the majority vote of bit j across all token hashes. Near-dups differ
    * in few bits (verify with [[hammingDist]]). */
  def simhash60(toks: Column): Column = {
    val hs = transform(toks, t => XHash.bucketHash("sim", t))
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, j) => acc + when(
        size(filter(hs, h =>
          call_function("shiftright", h, j.cast("int")).bitwiseAND(1) === 1)) * 2
          > size(hs),
        call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L))
  }

  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram Jaccard similarity of two shingle sets. */
  def jaccard(aSh: Column, bSh: Column): Column =
    size(array_intersect(aSh, bSh)).cast("double") /
      size(array_union(aSh, bSh))

  /** Near-dup clustering: connected components over a candidate-pair edge
    * list via min-label propagation — each node ends with the minimum id
    * reachable in its component (converges in ≤ diameter iterations; near-
    * dup components are shallow, so a small fixed bound suffices and keeps
    * the loop deterministic). Returns (id, cluster_rep).
    *
    * Scale shape: each iteration is one grouped min over the edge list —
    * the standard big-graph CC kernel (no driver-side graph).
    */
  /** Lineage-truncation point for the CC loop. Default: `localCheckpoint`
    * — executor-local blocks, fastest, fine on local[n]. On a REAL cluster
    * localCheckpoint loses fault-tolerance (an executor loss kills the
    * lineage-free blocks with no way to recompute) and pins executor
    * storage for the whole loop; set `spark.graft.cc.checkpointDir` to a
    * reliable path (HDFS/S3) to switch every loop checkpoint to the
    * fault-tolerant `checkpoint()` instead. The spark-wide checkpoint dir
    * is initialized from the config once per session (Spark appends a
    * per-call UUID subdir, so re-setting it every call would leak dirs).
    *
    * Returns the created `rdd-*` checkpoint path (reliable mode only) so
    * the loop can PRUNE superseded checkpoints: Spark never deletes
    * reliable checkpoint data unless `spark.cleaner.referenceTracking
    * .cleanCheckpoints` is on (default off), so without pruning every CC
    * call would leave ~2·iterations directories on HDFS/S3 forever. The
    * edges checkpoint and the FINAL labels checkpoint stay (the returned
    * frame's lineage reads them) — bounded at 2 per call, cleaned with
    * the app's checkpoint dir. */
  private def ccCheckpoint(df: DataFrame)
      : (DataFrame, Option[org.apache.hadoop.fs.Path]) = {
    val sc = df.sparkSession.sparkContext
    df.sparkSession.conf.getOption("spark.graft.cc.checkpointDir") match {
      case Some(dir) =>
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        val root = new org.apache.hadoop.fs.Path(sc.getCheckpointDir.get)
        val fs = root.getFileSystem(sc.hadoopConfiguration)
        def rddDirs(): Set[String] =
          if (!fs.exists(root)) Set.empty
          else fs.listStatus(root).map(_.getPath.getName)
            .filter(_.startsWith("rdd-")).toSet
        val before = rddDirs()
        val out = df.checkpoint() // eager + reliable
        val created = (rddDirs() -- before).toSeq.sorted.lastOption
          .map(n => new org.apache.hadoop.fs.Path(root, n))
        (out, created)
      case None => (df.localCheckpoint(), None)
    }
  }

  /** Best-effort delete of a superseded reliable checkpoint. */
  private def dropCheckpoint(sc: org.apache.spark.SparkContext,
      p: Option[org.apache.hadoop.fs.Path]): Unit =
    p.foreach { path =>
      try { path.getFileSystem(sc.hadoopConfiguration).delete(path, true); () }
      catch { case _: Throwable => () }
    }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // checkpoint (not persist): an iterative loop's logical plan
    // otherwise nests every previous iteration, and Catalyst re-analysis
    // grows super-linearly — measured 5 s -> 24 s per iteration by iter 3.
    // Checkpointing truncates lineage each round ([[ccCheckpoint]] picks
    // local vs reliable).
    //
    // IMPORTANT: edges materializes HERE, at the session's full shuffle
    // width — the upstream pair-generation pipeline (band joins, verify)
    // is the heavy part and must not run under the narrowed width below.
    val (edges, _) = ccCheckpoint(
      pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst"))))
    // The label table is |nodes|-sized — tiny next to the corpus that
    // produced the pairs. Iterating it across the session's full shuffle
    // width (32+) pays fixed per-partition cost each round for near-empty
    // partitions; scope a narrow width to the LOOP ONLY (same trick as
    // the streaming state store).
    val spark = pairs.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try connectedComponentsLoop(edges, maxIter)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def connectedComponentsLoop(edges: DataFrame, maxIter: Int): DataFrame = {
    var (labels, labelsCkpt) = ccCheckpoint(
      edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")))
    // Convergence test: per-node labels are monotonically non-increasing
    // (every step takes a `least`), so the label sum strictly decreases
    // until the fixpoint — one aggregate over the checkpointed labels
    // replaces a join+count against the previous iteration. Decimal-typed
    // INPUT (not just output): a LongType sum of billions of large ids
    // overflows; and a sum over ZERO rows is SQL NULL, never a long.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = lblSum(labels)
    var i = 0
    var changed = 1L
    while (changed > 0 && i < maxIter) {
      // neighbor-min step
      val fromNeighbors = edges
        .join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("id2"))
        .agg(min(col("lbl")).as("nlbl"))
      val stepped = labels.join(fromNeighbors, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer-doubling step: lbl := lbl(lbl) — makes convergence
      // logarithmic in component diameter instead of linear, which is what
      // keeps the iteration count (and driver round trips) down on chains
      val jump = stepped.select(col("id").as("jid"), col("lbl").as("jlbl"))
      val (next, nextCkpt) = ccCheckpoint(
        stepped.join(jump, stepped("lbl") === col("jid"), "left")
          .select(stepped("id"),
            least(stepped("lbl"), coalesce(col("jlbl"), stepped("lbl"))).as("lbl")))
      val t0 = System.nanoTime()
      val curSum = lblSum(next)
      changed = if (curSum.compareTo(prevSum) == 0) 0L else 1L
      prevSum = curSum
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(f"[cc] iter=$i changed=$changed sum_s=${(System.nanoTime()-t0)/1e9}%.1f")
      // the previous labels checkpoint is dead once `next` materialized —
      // prune it so a long session doesn't accumulate loop checkpoints
      dropCheckpoint(edges.sparkSession.sparkContext, labelsCkpt)
      labels = next
      labelsCkpt = nextCkpt
      i += 1
    }
    labels.select(col("id"), col("lbl").as("cluster_rep"))
  }
}
