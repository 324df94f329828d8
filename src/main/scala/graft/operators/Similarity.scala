package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.XHash

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * stream the corpus once, per-partition top-k via a window. Scale path:
  * random-hyperplane LSH bucketing — candidates only within a bucket, so
  * the join is bucket-local instead of all-pairs. Hyperplane weights are
  * derived from [[XHash]] so buckets are deterministic and
  * oracle-reproducible (no RNG state to ship).
  *
  * All dot products fold left-to-right in index order after casting floats
  * to double, which both Spark's `aggregate` and DuckDB's `list_reduce`
  * reproduce bit-for-bit — rankings need no rounding fudge.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors, in double.
    * Evaluated by the native [[graft.plans.FloatVecDot]] kernel — one loop
    * over primitive array data, bit-identical to the composed built-ins
    * `aggregate(zip_with(a, b, (x,y) -> xd*yd), 0d, +)` that the oracle
    * runs (equivalence locked by VecKernelsSpec). */
  def dot(a: Column, b: Column): Column = graft.plans.VecKernels.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), rank deterministic via (sim desc, id).
    *
    * 100 TB shape: `queries` is broadcast (it is the small side by
    * construction); the corpus scans once with no shuffle until the final
    * per-query top-k, which is a partial (per-partition) top-k under AQE.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", cId: String = "n_id"): DataFrame = {
    // norms hoist (r16, the ivfSearch discipline): one dot per candidate
    // pair instead of cosine()'s three — ‖q‖ once per query row, ‖c‖ once
    // per corpus row. Bit-identical: dot/(qn·cn) is the same IEEE op
    // order cosine() uses.
    val joined = corpus.withColumn("__cn", norm(col("c_vec")))
      .crossJoin(broadcast(queries.withColumn("__qn", norm(col("q_vec")))))
      .filter(col(qId) =!= col(cId))
      .withColumn("__sim",
        dot(col("q_vec"), col("c_vec")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(qId).orderBy(col("__sim").desc, col(cId).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * uniform in [-1, 1] with 1/1000 resolution — exact in double. Constant
    * per (plane, dim), so evaluated ONCE on the driver and embedded as a
    * literal (never per-row md5 — that alone was 38M hashes at sf0.1). */
  def planeWeightConst(plane: Int, d: Int): Double =
    (XHash.bucketHashJvm("plane", plane.toString, d.toString) % 2001 - 1000) / 1000.0

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a
    * long. Cosine-similar vectors land in the same bucket with high
    * probability (Charikar's SimHash for angles). `dims` fixes the weight
    * vector length (test embeddings are 64-dim). */
  def lshBucket(vec: Column, planes: Int, maxDims: Int = 64): Column =
    (0 until planes).map { p =>
      val w = typedLit((0 until maxDims).map(d => planeWeightConst(p, d)))
      when(
        // slice the weight literal to the vector's length — the kernel
        // (like zip_with) treats a length mismatch as null
        graft.plans.VecKernels.dot(vec, slice(w, lit(1), size(vec))) >= 0,
        lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN top-k: candidates restricted to the query's LSH bucket.
    * Returns (q_id, n_id, rank) within-bucket. */
  def lshTopK(df: DataFrame, id: String, vec: String, planes: Int, k: Int,
      queryPred: Column): DataFrame = {
    val withB = df.withColumn("__b", lshBucket(col(vec), planes))
    // norms hoist: one dot per in-bucket candidate instead of cosine()'s
    // three (bit-identical — same dot/(qn·cn) IEEE op order)
    val q = withB.filter(queryPred)
      .select(col(id).as("q_id"), col(vec).as("q_vec"), col("__b"))
      .withColumn("__qn", norm(col("q_vec")))
    val c = withB.select(col(id).as("n_id"), col(vec).as("c_vec"), col("__b"))
      .withColumn("__cn", norm(col("c_vec")))
    val joined = c.join(broadcast(q), Seq("__b"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("__sim",
        dot(col("q_vec"), col("c_vec")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy("q_id").orderBy(col("__sim").desc, col("n_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"))
  }

  /** Deterministic Lloyd k-means refinement of IVF centroids: start from
    * the fixed seed centroids (lowest ids), alternate assignment
    * ([[ivfAssign]]) and per-cell elementwise means for `iters` rounds.
    * All DataFrame ops — assignment is a broadcast cross join, the update
    * is one grouped aggregate per round; localCheckpoint truncates the
    * iterative lineage. Deterministic: seed choice, tie-breaks, and means
    * are all order-independent (means use exact decimal sums).
    */
  def kmeansCentroids(df: DataFrame, id: String, vec: String, k: Int,
      iters: Int, dims: Int = 64): DataFrame = {
    var centroids = df.orderBy(col(id).asc).limit(k)
      .select(col(id).as("cid"), col(vec).as("cvec"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val assigned = ivfAssign(df, id, vec,
        centroids.select(col("cid").as(id), col("cvec").as(vec)))
      // exact per-dimension mean: decimal sums are merge-order independent
      val joined = df.join(assigned, id)
      val sums = joined.groupBy(col("cell").as("cid")).agg(
        count(lit(1)).as("n"),
        (0 until dims).map(d =>
          // coalesce: a dimension absent from every member vector (ragged
          // input) must mean 0, not a null that poisons later distance folds
          sum(try_element_at(col(vec), lit(d + 1)).cast("decimal(28,10)"))
            .as(s"s$d")): _*)
      val means = sums.select(col("cid"),
        array((0 until dims).map(d =>
          (coalesce(col(s"s$d"), lit(java.math.BigDecimal.ZERO)).cast("double")
            / col("n")).cast("float")): _*).as("cvec_new"))
      // a cell that captured no points keeps its previous centroid — a
      // plain grouped aggregate would silently shrink the set below k
      centroids = centroids.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cvec_new"), col("cvec")).as("cvec"))
        .localCheckpoint()
      it += 1
    }
    centroids
  }

  /** Corpus-adaptive banded-LSH parameters (bands, bitsPerBand).
    *
    * A FIXED bits-per-band r is a scale defect: the band key space is 2^r
    * buckets, so random-collision candidate pairs grow Θ(b·n²/2^r+1) —
    * quadratic in the corpus regardless of how many true near-dups exist
    * (at 100k vectors and r=8 that is ~58M random candidates dwarfing
    * ~2.4M true pairs; at 100-TB vector counts it is catastrophic).
    *
    * Fix: grow r with the corpus — r = min k ≥ baseBits with 2^k·slack ≥ n
    * — which pins expected random collisions per band at ≤ n·slack/2, i.e.
    * LINEAR in n (the same discipline as q116's df-constant tag modulus).
    * Growing r shrinks per-band recall p^r, so bands grow alongside:
    * b = baseBands + ⌈(r − baseBits)/2⌉ holds pair recall ≈0.99 for
    * cosine-0.99 near-dups (p ≈ 0.955: r=8,b=3 → 0.971; r=13,b=6 → 0.992;
    * r=24,b=11 → 0.988) while total random candidates stay ≤ b·n·slack/2.
    * n ≤ 2^baseBits·slack (all certification SFs) yields exactly
    * (baseBands, baseBits) — results there are bit-identical to the fixed
    * form. The n lookup is one driver-side scalar, same class as the
    * literal-set guards; the oracle mirrors the formula in SQL.
    */
  def bandParams(n: Long, baseBands: Int = 3, baseBits: Int = 8,
      slack: Int = 16): (Int, Int) = {
    require(n >= 0 && baseBands >= 1 && baseBits >= 1 && slack >= 1)
    var r = baseBits
    while ((1L << r) * slack < n && r < 40) r += 1
    (baseBands + (r - baseBits + 1) / 2, r)
  }

  /** Banded (multi-table) LSH keys: `planes` sign bits split into `bands`
    * groups of planes/bands bits; vectors sharing ANY band key are
    * candidates. With r bits per band and b bands, a pair agreeing on each
    * plane with prob p is recalled with prob 1-(1-p^r)^b — near-certain for
    * near-dups while random pairs stay below b/2^r. The cosine analogue of
    * MinHash banding, and the recall fix for the single-bucket variant.
    * Callers pairing a whole corpus must size (bands, planes/bands) to the
    * corpus via [[bandParams]] — see [[bandedNearDupPairs]].
    */
  def lshBandKeys(vec: Column, planes: Int, bands: Int, maxDims: Int = 64): Column =
    // native kernel (graft.plans.LshBandKeysExpr): one loop nest over a
    // cached primitive weight matrix instead of bands·r composed
    // expressions that each SLICE the 64-double weight literal per row —
    // bit-identical to the composed form (LshBandKeysKernelSpec locks
    // parity on randomized float/double/null/ragged inputs; the long
    // `1L << j` bit discipline for r > 31 carries over)
    graft.plans.LshKernels.lshBandKeys(vec, planes, bands, maxDims)

  /** Squared L2 distance, sequential fold (oracle-reproducible); native
    * kernel, see [[dot]]. */
  def l2sq(a: Column, b: Column): Column = graft.plans.VecKernels.l2sq(a, b)

  /** IVF-style cell assignment: nearest of a fixed, deterministic centroid
    * set (here: the first `k` vectors by id — a deterministic "sample"; a
    * production build would k-means them offline). Ties break on centroid
    * id. The corpus partitioner for cell-local ANN search: at 100 TB the
    * corpus is written bucketed by cell, and a query probes one (or
    * `nprobe`) cells instead of scanning everything.
    */
  def ivfAssign(df: DataFrame, id: String, vec: String,
      centroids: DataFrame): DataFrame = {
    val c = broadcast(centroids.select(
      col(id).as("__cid"), col(vec).as("__cvec")))
    // min_by, NOT a row_number window: all k candidate rows for an id are
    // produced in the same task (broadcast cross join), so the grouped
    // min_by partial-aggregates them map-side and the exchange carries ~1
    // row per id — a k× shuffle reduction on what is, at 100 TB, the
    // bucketed-write pass. The struct orders (dist asc, cid asc), the same
    // deterministic tie-break the window had.
    df.crossJoin(c)
      .withColumn("__dist", l2sq(col(vec), col("__cvec")))
      .groupBy(col(id))
      .agg(min_by(col("__cid"), struct(col("__dist"), col("__cid"))).as("cell"))
  }

  /** Full IVF search: each query probes its `nprobe` nearest cells and
    * ranks the candidates there exactly — the complete coarse-quantizer
    * ANN flow (assignment = [[ivfAssign]], which at 100 TB is a bucketed
    * write executed once, not per query). Probing >1 cell is the standard
    * recall fix for queries near cell boundaries. Returns (q_id, n_id,
    * rank) with deterministic (cosine desc, id) ranking.
    *
    * `negLabel`: hard-negative mining mode — candidates must carry a
    * DIFFERENT value of this column than the query (contrastive-training
    * mining: the most similar wrong-label neighbors are the hard
    * negatives; Robinson et al. 2021, arXiv:2010.04592). Same plan shape,
    * one extra small column through the broadcast.
    */
  def ivfSearch(df: DataFrame, id: String, vec: String, centroids: DataFrame,
      nprobe: Int, k: Int, queryPred: Column,
      negLabel: Option[String] = None): DataFrame = {
    val cells = ivfAssign(df, id, vec, centroids)
    val c = broadcast(centroids.select(
      col(id).as("__cid"), col(vec).as("__cvec")))
    // norms hoist out of the candidate loop: cosine(q, c) would fold THREE
    // dot products per candidate pair; computing ‖q‖ once per probe row and
    // ‖c‖ once per corpus row leaves one fold + one divide per candidate.
    // Bit-identical: dot/(qn·cn) is the same IEEE op order cosine() uses.
    val qCols = Seq(col(id).as("q_id"), col(vec).as("q_vec")) ++
      negLabel.map(lc => col(lc).as("__qlbl"))
    val q = df.filter(queryPred)
      .select(qCols: _*)
      .withColumn("__qn", norm(col("q_vec")))
    val wp = Window.partitionBy("q_id").orderBy(col("__dist").asc, col("__cid").asc)
    val probeCols = Seq(col("q_id"), col("q_vec"), col("__qn"),
      col("__cid").as("cell")) ++ negLabel.map(_ => col("__qlbl"))
    val probes = q.crossJoin(c)
      .withColumn("__dist", l2sq(col("q_vec"), col("__cvec")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nprobe)
      .select(probeCols: _*)
    val corpusCols = Seq(col(id).as("n_id"), col(vec).as("c_vec")) ++
      negLabel.map(lc => col(lc).as("__nlbl"))
    val corpus = df.select(corpusCols: _*)
      .withColumn("__cn", norm(col("c_vec")))
      .join(cells.select(col(id).as("n_id"), col("cell")), Seq("n_id"))
    val w = Window.partitionBy("q_id").orderBy(col("__sim").desc, col("n_id").asc)
    val cand = corpus.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
    negLabel.fold(cand)(_ => cand.filter(col("__nlbl") =!= col("__qlbl")))
      .withColumn("__sim",
        dot(col("q_vec"), col("c_vec")) / (col("__qn") * col("__cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"))
  }

  /** The EXACT candidate set [[bandedNearDupPairs]] verifies — exposed so
    * the candidate-mass audit (q231) certifies the real band join under
    * the adaptive geometry. Returns (a_id, b_id). `cleanup = true` frees
    * the persisted band-key frame eagerly (see [[CacheScope]]). */
  def bandedCandidates(df: DataFrame, id: String, vec: String,
      baseBits: Int, baseBands: Int,
      corpusSize: Option[Long] = None,
      cleanup: Boolean = false): DataFrame = {
    val (cand, keyed) = bandedCandidatesKeyed(
      df, id, vec, baseBits, baseBands, corpusSize)
    CacheScope.scoped(cand, Seq(keyed), cleanup)
  }

  /** Corpus row count WITHOUT a Spark job when the frame is a bare
    * row-preserving projection over a parquet file scan: sum the row
    * counts recorded in the parquet footers (driver-side metadata reads,
    * O(files), no cluster stage — vs `df.count()`'s full scan job, which
    * at 100 TB is an extra pass over the corpus just to pick band
    * geometry). Returns None when the plan filters/joins/aggregates (row
    * count not derivable from metadata) or the source is not parquet. */
  private[graft] def metadataRowCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    @annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case Project(_, child)       => unwrap(child) // row-preserving
      case SubqueryAlias(_, child) => unwrap(child)
      case other                   => other
    }
    unwrap(df.queryExecution.analyzed) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.getClass.getName.toLowerCase.contains("parquet") =>
          scala.util.Try {
            val conf = df.sparkSession.sessionState.newHadoopConf()
            val paths = fs.location.listFiles(Nil, Nil).iterator
              .flatMap(_.files).filter(_.getLen > 0).map(_.getPath).toArray
            def footerCount(p: org.apache.hadoop.fs.Path): Long = {
              val in = org.apache.parquet.hadoop.util.HadoopInputFile
                .fromPath(p, conf)
              val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
              try r.getRecordCount finally r.close()
            }
            // footer reads are independent I/O round-trips — run them on
            // a bounded pool so a many-file corpus costs
            // O(files / parallelism) wall, not minutes of serial driver
            // I/O (each open is one footer round-trip, 1-100 ms on
            // object storage)
            if (paths.length <= 4) paths.map(footerCount).sum
            else {
              val pool = java.util.concurrent.Executors.newFixedThreadPool(
                math.min(32, paths.length))
              try {
                val futures = paths.map(p => pool.submit(
                  new java.util.concurrent.Callable[Long] {
                    override def call(): Long = footerCount(p)
                  }))
                futures.map(_.get()).sum
                // shutdownNow, not shutdown: on a failed footer read the
                // enclosing Try abandons the result, so the queued reads
                // must be CANCELLED, not drained to completion (wasted
                // driver I/O on the error path); on success nothing is
                // left queued and it degenerates to shutdown()
              } finally pool.shutdownNow()
            }
          }.toOption
        case _ => None
      }
      case _ => None
    }
  }

  private def bandedCandidatesKeyed(df: DataFrame, id: String, vec: String,
      baseBits: Int, baseBands: Int,
      corpusSize: Option[Long]): (DataFrame, DataFrame) = {
    // geometry needs n before the plan runs; prefer caller-supplied, then
    // parquet-footer metadata, and only fall back to a count() job when
    // the input is a derived frame whose size metadata cannot know
    val n = corpusSize.orElse(metadataRowCount(df)).getOrElse(df.count())
    val (bands, r) = bandParams(n, baseBands, baseBits)
    val exploded = df.select(col(id).as("id"), col(vec).as("v"))
      .withColumn("__bk", explode(lshBandKeys(col("v"), bands * r, bands)))
    // persist hash-partitioned on the band key: the self-join below then
    // reads BOTH sides co-partitioned straight from cache (zero join-time
    // exchange) instead of re-shuffling the n·bands exploded rows twice —
    // one up-front exchange at materialization replaces two at the join
    // (the q231 audit's candidate-generation long pole at the 100× rung,
    // 132.2 → 29.8 s at 400k vectors). Gated on corpus size (r12 verdict
    // #4): at small n the fixed repartition+persist overhead exceeds the
    // saved exchange (q231's sf0.1 entry doubled 0.96 → 1.97 s on a ~4k
    // corpus), so small inputs keep the direct self-join — candidate SET
    // is identical either way, only the physical plan differs.
    val keyed =
      if (n < 50000) exploded
      else exploded.repartition(col("__bk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = keyed.select(col("id").as("a_id"), col("__bk"))
      .join(keyed.select(col("id").as("b_id"), col("__bk")), Seq("__bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
    (cand, keyed)
  }

  /** Banded ANN near-dup pairs: distinct candidate pairs from any shared
    * band key, verified at `minCosine`. Returns (a_id, b_id).
    *
    * Band geometry ADAPTS to the corpus via [[bandParams]] so random
    * collisions stay linear in n instead of Θ(n²/2^r) — `corpusSize`
    * short-circuits the driver-side count when the caller already knows it
    * (e.g. a metadata-only parquet count-star). */
  def bandedNearDupPairs(df: DataFrame, id: String, vec: String,
      baseBits: Int, baseBands: Int, minCosine: Double,
      corpusSize: Option[Long] = None,
      cleanup: Boolean = false): DataFrame = {
    val (cand, keyed) = bandedCandidatesKeyed(
      df, id, vec, baseBits, baseBands, corpusSize)
    val vecs = df.select(col(id).as("id"), col(vec).as("v"))
    val out = cand
      .join(vecs.select(col("id").as("a_id"), col("v").as("a_v")), Seq("a_id"))
      .join(vecs.select(col("id").as("b_id"), col("v").as("b_v")), Seq("b_id"))
      .filter(cosine(col("a_v"), col("b_v")) >= minCosine)
      .select("a_id", "b_id")
    CacheScope.scoped(out, Seq(keyed), cleanup)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the corpus in embedding space — here
    * [[ivfAssign]] against a fixed offline-trained centroid set (the
    * paper's k-means step ≈ [[kmeansCentroids]]) — then, WITHIN each cell
    * only, drop every vector that has a strictly-lower-id neighbor at
    * cosine ≥ `minCosine`. One representative per epsilon-ball survives;
    * lowest id is the deterministic stand-in for the paper's
    * keep-low-centroid-similarity policy.
    *
    * Scale shape: pairwise similarity is confined to a cell — the paper's
    * own device for making all-pairs tractable (cost Σ|cell|², set by the
    * clustering granularity k, never corpus²). The self-join
    * hash-partitions on cell id and the corpus+cells frame is persisted so
    * assignment runs once, not three times. Returns kept rows (id, cell).
    *
    * `maxCell` guards the quadratic term against a HOT cell (a centroid set
    * that under-fits one dense region): any cell above the bound is
    * deterministically sharded by `xxhash64(id) mod ceil(|cell|/maxCell)`
    * and the pairwise check runs within a shard only — in-cell cost drops
    * from |cell|² to ~|cell|·maxCell. Sharding is the paper's own
    * cluster-size-cap approximation: cross-shard near-dups in an oversized
    * cell are missed (recall knob, like k itself). The default never
    * triggers at certification scale, so the oracle needs no shard
    * replication; size it so maxCell² pairwise cosines fit one task at
    * production scale.
    */
  def semanticDedup(df: DataFrame, id: String, vec: String,
      centroids: DataFrame, minCosine: Double,
      maxCell: Int = 1 << 14, cleanup: Boolean = false): DataFrame = {
    require(maxCell >= 1, "semanticDedup: maxCell must be >= 1")
    // row norm rides in the persisted frame: the quadratic in-cell check
    // then folds ONE dot per pair instead of cosine()'s three (same IEEE
    // op order — dot/(na·nb) — so the threshold test is bit-identical)
    val cells = df.select(col(id), col(vec))
      .join(ivfAssign(df, id, vec, centroids), Seq(id))
      .withColumn("__nrm", norm(col(vec)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cell sizes are ≤ |centroids| rows after the map-side combine; the
    // shard count rides back on a broadcast join, never a shuffle of cells
    val sizes = cells.groupBy("cell")
      .agg(count(lit(1)).as("__cn"))
      .select(col("cell"),
        expr(s"(__cn + ${maxCell.toLong - 1}) div ${maxCell.toLong}")
          .as("__shards"))
    val sharded = cells.join(broadcast(sizes), Seq("cell"))
      .withColumn("__shard", pmod(xxhash64(col(id)), col("__shards")))
    val dups = sharded.select(col("cell"), col("__shard"),
        col(id).as("a_id"), col(vec).as("a_v"), col("__nrm").as("a_n"))
      .join(sharded.select(col("cell"), col("__shard"),
        col(id).as("b_id"), col(vec).as("b_v"), col("__nrm").as("b_n")),
        Seq("cell", "__shard"))
      .filter(col("b_id") < col("a_id"))
      .filter(dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))
        >= minCosine)
      .select(col("a_id").as(id)).distinct()
    CacheScope.scoped(
      cells.join(dups, Seq(id), "left_anti").select(col(id), col("cell")),
      Seq(cells), cleanup)
  }

  /** Margin-based cross-side nearest-neighbor mining (Artetxe & Schwenk
    * 2019, arXiv:1811.01136): score candidate pairs by the RATIO margin
    * `cos(x,y) / ((S_x + S_y)/2)` where S_x is the mean cosine of x's `k`
    * nearest opposite-side neighbors (symmetrically S_y) — the hubness
    * correction raw cosine thresholds lack — and return each A-side
    * vector's best B-side partner by margin. The bitext-mining /
    * cross-source alignment primitive of multilingual data pipelines.
    *
    * Scale shape: candidates (and the k-NN statistics) are confined to
    * the vector's IVF cell — one cell-keyed self-join on the persisted
    * corpus+cells frame, the SemDeDup discipline, never corpus². Means
    * fold the rank-sorted sims left-to-right from a 0.0 accumulator, so
    * the double arithmetic is cross-engine reproducible. Norms hoist out
    * of the pairwise loop as in [[ivfSearch]]. Returns (a_id, b_id,
    * margin), one row per A-side vector with ≥1 candidate.
    */
  def marginMining(df: DataFrame, id: String, vec: String,
      centroids: DataFrame, sideA: Column, k: Int,
      cleanup: Boolean = false): DataFrame = {
    require(k >= 1, "marginMining: k must be >= 1")
    val cells = df.select(col(id), col(vec), sideA.as("__sa"))
      .join(ivfAssign(df, id, vec, centroids), Seq(id))
      .withColumn("__nrm", norm(col(vec)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sims = cells.filter(col("__sa"))
      .select(col("cell"), col(id).as("a_id"), col(vec).as("a_v"),
        col("__nrm").as("a_n"))
      .join(cells.filter(!col("__sa"))
        .select(col("cell"), col(id).as("b_id"), col(vec).as("b_v"),
          col("__nrm").as("b_n")), Seq("cell"))
      .withColumn("sim",
        dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .select(col("a_id"), col("b_id"), col("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // mean of the top-k sims, folded in rank order (deterministic double
    // sum; ties rank by the partner id)
    def topMean(keyCol: String, tieCol: String): DataFrame = {
      val w = Window.partitionBy(keyCol).orderBy(col("sim").desc, col(tieCol))
      sims.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .groupBy(keyCol)
        .agg(sort_array(collect_list(struct(col("__rn"), col("sim"))))
          .as("__l"))
        .select(col(keyCol),
          (aggregate(col("__l"), lit(0.0),
            (acc, x) => acc + x.getField("sim")) / size(col("__l"))).as("__s"))
    }
    val wM = Window.partitionBy("a_id").orderBy(col("margin").desc, col("b_id"))
    val out = sims
      .join(topMean("a_id", "b_id").withColumnRenamed("__s", "__sx"), "a_id")
      .join(topMean("b_id", "a_id").withColumnRenamed("__s", "__sy"), "b_id")
      .withColumn("margin",
        col("sim") / ((col("__sx") + col("__sy")) / 2))
      .withColumn("__r", row_number().over(wM))
      .filter(col("__r") === 1)
      .select(col("a_id"), col("b_id"), col("margin"))
    CacheScope.scoped(out, Seq(cells, sims), cleanup)
  }

  /** Product-quantization encode: split each vector into `m` equal
    * subspaces and store, per subspace, the id of the nearest codebook
    * centroid (L2, ties → lowest id). With the codebook trained offline
    * (e.g. [[kmeansCentroids]] per subspace), a 64-dim float vector
    * compresses to `m` small codes — the memory step that makes
    * billion-vector ANN (IVF-PQ) fit a cluster.
    *
    * Scale shape: the codebook is bounded by construction (k·d doubles);
    * it is collected ONCE behind a size guard and embedded as plan
    * literals, so encoding is a single narrow codegen'd projection over
    * the corpus — zero shuffle, zero join, scan speed at any corpus size
    * (the same guarded literal/driver boundary as the frequent-set path,
    * CleanOps C10).
    */
  /** Full IVF-PQ search with asymmetric distance computation (ADC):
    * queries probe their `nprobe` nearest coarse cells, and candidates in
    * those cells are ranked by the PQ-approximated L2 — the query stays
    * exact, the candidate is its `m` codebook codes, and the distance is
    * `Σ_s LUT[s][code_s]` where the per-query lookup table holds the L2²
    * from each query subvector to every codeword (Jégou et al., the
    * billion-vector ANN query path).
    *
    * Scale shape: the LUT is m·|codebook| doubles computed ONCE per query
    * as a narrow projection (codebook rides as plan literals, the pqEncode
    * discipline); the candidate scan then does m array lookups + adds per
    * row — it never touches the 64-dim float vectors. The fold over
    * subspaces runs in ascending s order, so the double sum is
    * reproducible (and matched by the oracle's ordered list_reduce).
    * Codebook ids must be dense 0..n-1 (they index the LUT directly).
    * Returns (q_id, n_id, rank, adc).
    */
  def ivfPqSearch(df: DataFrame, id: String, vec: String,
      centroids: DataFrame, codebook: DataFrame, m: Int,
      nprobe: Int, k: Int, queryPred: Column,
      maxCodebook: Int = 65536): DataFrame = {
    val rows = codebook.select(col(id).cast("long"), col(vec))
      .limit(maxCodebook + 1).collect()
    require(rows.nonEmpty && rows.length <= maxCodebook,
      s"ivfPqSearch: codebook must hold 1..$maxCodebook entries")
    val cents: Seq[(Long, Seq[Double])] = rows.toSeq.map { r =>
      (r.getLong(0), r.getSeq[Any](1).map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
      })
    }.sortBy(_._1)
    require(cents.map(_._1) == (0L until cents.length.toLong),
      "ivfPqSearch: codebook ids must be dense 0..n-1 (they index the LUT)")
    val dims = cents.head._2.length
    require(dims % m == 0, s"ivfPqSearch: $dims dims not divisible by m=$m")
    val sub = dims / m

    val codes = pqEncode(df, id, vec, codebook, id, vec, m, maxCodebook)
    val cells = ivfAssign(df, id, vec, centroids)
    val c = broadcast(centroids.select(
      col(id).as("__cid"), col(vec).as("__cvec")))
    val wp = Window.partitionBy("q_id")
      .orderBy(col("__dist").asc, col("__cid").asc)
    val lut = array((0 until m).map { s =>
      array(cents.map { case (_, cv) =>
        graft.plans.VecKernels.l2sq(
          slice(col("q_vec"), s * sub + 1, sub),
          typedLit(cv.slice(s * sub, (s + 1) * sub)))
      }: _*)
    }: _*)
    val probes = df.filter(queryPred)
      .select(col(id).as("q_id"), col(vec).as("q_vec"))
      .withColumn("__lut", lut)
      .crossJoin(c)
      .withColumn("__dist", l2sq(col("q_vec"), col("__cvec")))
      .withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__lut"), col("__cid").as("cell"))
    val cand = codes.select(col(id).as("n_id"), col("codes"))
      .join(cells.select(col(id).as("n_id"), col("cell")), Seq("n_id"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(
        element_at(col("__lut"), s + 1),
        element_at(col("codes"), s + 1) + 1))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("n_id").asc)
    cand.withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"), col("adc"))
  }

  def pqEncode(corpus: DataFrame, id: String, vec: String,
      codebook: DataFrame, cbId: String, cbVec: String,
      m: Int, maxCodebook: Int = 65536): DataFrame = {
    val rows = codebook.select(col(cbId).cast("long"), col(cbVec))
      .limit(maxCodebook + 1).collect()
    require(rows.nonEmpty, "pqEncode: empty codebook")
    require(rows.length <= maxCodebook,
      s"pqEncode: codebook exceeds $maxCodebook entries — train a smaller one")
    val cents: Seq[(Long, Seq[Double])] = rows.toSeq.map { r =>
      (r.getLong(0), r.getSeq[Any](1).map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
      })
    }.sortBy(_._1)
    val dims = cents.head._2.length
    require(dims % m == 0, s"pqEncode: $dims dims not divisible by m=$m")
    val sub = dims / m
    val codes = (0 until m).map { s =>
      // argmin via least(struct(dist, cid)): struct order = (dist asc,
      // cid asc), exactly the oracle's ORDER BY dist, cid / rn = 1
      val cands = cents.map { case (cid, cv) =>
        struct(
          graft.plans.VecKernels.l2sq(
            slice(col(vec), s * sub + 1, sub),
            typedLit(cv.slice(s * sub, (s + 1) * sub))).as("d"),
          lit(cid).as("cid"))
      }
      least(cands: _*).getField("cid").cast("int")
    }
    corpus.select(col(id), array(codes: _*).as("codes"))
  }
}
