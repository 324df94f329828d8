package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational graph kernels over edge lists — the join-only formulation
  * that scales on Spark without a graph runtime (each step is a hash join
  * or a map-side-combinable aggregate; AQE's skew-join split handles hub
  * vertices).
  */
object GraphOps {

  /** Persist an iterative loop's edge list hash-partitioned on its join
    * key. InMemoryTableScan PRESERVES the repartition's output
    * partitioning (with the default
    * `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false`
    * AQE may not rewrite it), so every round's frontier⋈edges /
    * dist⋈edges join finds the edge side's required distribution already
    * satisfied by the cache and exchanges ONLY the (much smaller)
    * frontier/dist side — without this, each relaxation round re-shuffles
    * the full persisted edge list (the dominant cost at ladder scale:
    * r11 measured q158_sssp 200.6 s / q141_bfs 156.2 s at 100× edges,
    * most of it edge re-exchange). One up-front exchange at persist time
    * buys `rounds` edge-side exchanges. PlanSpec locks the contract
    * (single Exchange per round, on the frontier side). */
  private[graft] def persistByKey(df: DataFrame, key: String): DataFrame =
    df.repartition(col(key))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** One relaxation round's frontier⋈edges join — the per-round plan
    * contract [[bfsLevels]] and [[ssspRounds]] share: SHUFFLE_HASH on the
    * (small) frontier/dist side builds the hash table there and STREAMS
    * the hash(src)-partitioned edge cache unsorted, so the round
    * exchanges ONLY the frontier side (SMJ would re-sort the full edge
    * list every round — the cache satisfies the join's distribution, not
    * its ordering). Extracted so PlanSpec locks the PRODUCTION join
    * shape, not a hand-built replica of it: `frontier` must carry the
    * vertex in column `v`, `e` must be a [[persistByKey]](_, "src")
    * edge frame. */
  private[graft] def frontierEdgeJoin(frontier: DataFrame, e: DataFrame): DataFrame =
    frontier.hint("SHUFFLE_HASH").join(e, frontier("v") === e("src"))

  /** Undirected co-occurrence edges from a (groupKey, item) fact: items
    * sharing a group become an edge, oriented a < b so each undirected edge
    * appears exactly once. One self-join per group (fan-out bounded by
    * group size — basket-sized here) + a combining count.
    *
    * `minSupport` is the market-basket noise gate: a random pair of popular
    * items co-occurs once somewhere by chance, so the support-1 graph on a
    * large corpus is near-complete and every downstream graph kernel
    * drowns (measured here: 1.2M edges → 3.9k at support 2 on the same
    * fact table). Keeping only pairs seen ≥ minSupport times is the
    * standard frequent-pair projection; the count aggregate is map-side
    * combinable, so the shuffle carries (a, b, partial count), never the
    * raw pair stream.
    */
  def cooccurrenceEdges(df: DataFrame, group: Column, item: Column,
      minSupport: Long = 1L): DataFrame = {
    val g = df.select(group.as("__g"), item.as("__i"))
    // explicit-width pre-join exchange (r16): the self-join's OUTPUT is
    // quadratic per group while its shuffle INPUT is slim, so AQE's
    // byte-based partition coalescing squeezed the pair-explosion +
    // partial-count stage onto 3 tasks of a 32-core session (q94
    // JobProbe: a 1.9 s near-serial job). The exchange exists either way
    // — pinning it at the session's shuffle width only opts this one
    // stage out of coalescing; the width still tracks the session/cluster
    // config, not a constant.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    g.repartition(width, col("__g")).select(col("__g"), col("__i").as("a"))
      .join(g.repartition(width, col("__g"))
        .select(col("__g"), col("__i").as("b")), Seq("__g"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= minSupport)
      .select("a", "b")
  }

  /** Exact triangle count of an undirected edge list (each edge once, any
    * orientation) via the degree-ordered "forward" algorithm: re-orient
    * every edge from its (degree, id)-smaller endpoint to the larger, form
    * wedges between out-neighbor pairs, and close each wedge against the
    * oriented edge list. Each triangle is counted exactly once — at its
    * (degree, id)-minimal vertex — and the wedge fan-out is Σ outdeg(u)²
    * with outdeg bounded ~O(√E) on any graph (the hub-vertex mitigation:
    * a hub's edges mostly point INTO it, so it never explodes a wedge
    * join). The closure count is orientation-invariant, so a plain a<b
    * SQL formulation is a valid oracle.
    *
    * The edge list is persisted: it feeds four consumers (degrees, wedges
    * twice via orientation, stats) and at corpus scale it is the
    * checkpointed artifact, not a recompute.
    * Returns one row: (n_nodes, n_edges, n_triangles).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before fan-out (r16): e feeds deg + withDeg + the final
    // edge count, and deg joins withDeg TWICE — left lazy, their
    // concurrent first-use stages race past the empty cache and re-run
    // the (often expensive) upstream edge build several times in parallel
    // (the personalizedPagerankScaled lesson; q94's JobProbe showed the
    // duplicated task time)
    e.count()
    val deg = e.select(col("a").as("v")).unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    deg.count()
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented u→v with v's (deg, id) carried for wedge-side ordering
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the wedge join self-joins this frame, and the closure join scans it
    // a third time — eager, or both sides race the empty cache
    oriented.count()
    // wedges (v, w) at u, ordered so (v, w) matches the closing edge's
    // orientation: v ≺ w in the same (deg, id) order
    val wedges = oriented.select(col("u"), col("v"), col("dv"))
      .join(oriented.select(col("u"), col("v").as("w"), col("dv").as("dw")),
        Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v").as("u"), col("w").as("v"))
    val tris = wedges.join(oriented.select("u", "v"), Seq("u", "v"))
    tris.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Fixed-iteration PageRank over a directed edge list (`src`, `dst`)
    * where EVERY node has out-degree ≥ 1 (callers close the graph first,
    * e.g. by adding reverse edges — no dangling-mass redistribution term
    * needed). Ranks are integers at a fixed scale (`scale` ≙ rank 1.0),
    * advanced with floor division only: `r' = 0.15·scale +
    * (85·Σ_in (r div outdeg)) div 100`. Truncating division on
    * non-negative integers is bit-identical across engines, so the whole
    * iteration is exact — no float accumulation-order sensitivity, which
    * is what makes a distributed PageRank reproducible run-to-run.
    *
    * Per iteration: one join of edges⋈deg⋈ranks co-partitioned on `src`
    * + one combining sum keyed on `dst` — the canonical bounded-shuffle
    * propagation loop. The edge list and node set persist across
    * iterations; at real iteration depth, checkpoint `ranks` every few
    * rounds to keep lineage flat (3 fixed rounds here stay shallow).
    * Returns (v, r) for every node.
    */
  /** Multi-source BFS levels over a directed edge list (`src`, `dst`):
    * every node reachable from `seeds` (column `v`) within `maxIters`
    * hops, labeled with its hop distance (seeds = 0). Frontier-style
    * Pregel loop: each round is ONE hash join frontier⋈edges (the edge
    * side reads hash(src)-partitioned straight from cache, so only the
    * FRONTIER exchanges) + a distinct + an anti-join against the visited
    * set — the per-round shuffle is bounded by the frontier and its
    * out-edges, never the whole graph. A node enters `visited` the first round it
    * is reached, so its recorded level IS the minimum hop count; the
    * anti-join keeps later sightings from re-expanding it (each vertex
    * is expanded exactly once across the whole run — total work O(E)
    * like sequential BFS). `visited` is localCheckpoint'ed each round to
    * keep the lineage flat at real iteration depths; the early-stop on
    * an empty frontier is one cheap `isEmpty` action per round. Returns
    * (v, lvl). */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, maxIters: Int): DataFrame = {
    val e = persistByKey(edges.select(col("src"), col("dst")), "src")
    var visited = seeds.select(col("v"), lit(0).as("lvl")).localCheckpoint()
    var frontier = visited.select("v")
    var i = 1
    while (i <= maxIters && !frontier.isEmpty) {
      val next = frontierEdgeJoin(frontier, e)
        .select(col("dst").as("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .withColumn("lvl", lit(i))
      // ONE materialization per round: the frontier re-reads the new
      // level out of the checkpointed union instead of checkpointing
      // `next` separately (which would write ~the same rows twice)
      visited = visited.unionByName(next).localCheckpoint()
      frontier = visited.filter(col("lvl") === i).select("v")
      i += 1
    }
    e.unpersist()
    visited
  }

  /** k-core peeling, `rounds` synchronous iterations: repeatedly delete
    * every node of degree < `k` (with all its edges) from an undirected
    * edge list (each edge once, `a` < `b`). The fixpoint is the k-core;
    * a fixed round count keeps the loop cross-engine-checkable and is
    * how production peeling runs anyway (bounded passes, converged-%
    * monitored). Each round is one combining degree count + two
    * semi-joins (edges keep both endpoints alive) — all hash
    * partitioned, nothing driver-side; edges localCheckpoint each round
    * so lineage stays flat. Returns the surviving edge list. */
  def kCoreEdges(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    var e = edges.select(col("a"), col("b")).localCheckpoint()
    (1 to rounds).foreach { _ =>
      val deg = e.select(col("a").as("v"))
        .unionByName(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("v")
      e = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    e
  }

  /** Bellman-Ford SSSP, `rounds` synchronous min-plus relaxations over a
    * weighted directed edge list (`src`, `dst`, `w` ≥ 0): shortest
    * known distance from the `seeds` (column `v`, distance 0) within
    * `rounds` hops. Each round is ONE dist⋈edges hash join (edge side
    * hash(src)-partitioned from cache — only `dist` exchanges) + a
    * combining `min` per destination + a `min` merge with the standing
    * distances —
    * the weighted generalization of [[bfsLevels]] (min-plus semiring
    * instead of hop counting; no frontier short-circuit because a longer
    * path can still be cheaper). Distances localCheckpoint per round.
    * Returns (v, d). */
  def ssspRounds(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val e = persistByKey(edges.select(col("src"), col("dst"), col("w")), "src")
    var dist = seeds.select(col("v"), lit(0L).as("d")).localCheckpoint()
    (1 to rounds).foreach { _ =>
      val relaxed = frontierEdgeJoin(dist, e)
        .select(col("dst").as("v"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("v").agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    e.unpersist()
    dist
  }

  def pagerankScaled(edges: DataFrame, iters: Int, scale: Long): DataFrame = {
    // src-partitioned cache: deg's groupBy("src"), the edges⋈deg join AND
    // every round's edges⋈ranks join all consume hash(src) straight from
    // the cache — per round only the ranks side exchanges
    val e = persistByKey(edges.select(col("src"), col("dst")), "src")
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val nodes = e.select(col("src").as("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = lit(scale * 15L / 100L)
    var ranks = nodes.withColumn("r", lit(scale))
    (1 to iters).foreach { _ =>
      val contrib = e.join(deg.hint("SHUFFLE_HASH"), "src")
        .join(ranks.select(col("v").as("src"), col("r")).hint("SHUFFLE_HASH"),
          Seq("src"))
        .select(col("dst").as("v"), expr("r div od").as("c"))
        .groupBy("v").agg(sum(col("c")).as("m"))
      ranks = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"), (base +
          expr("(85 * coalesce(m, cast(0 as bigint))) div 100")).as("r"))
        // NOT cached: at 3 rounds the lineage replay is cheaper than a
        // per-round materialization (measured 2.4 s uncached vs 9 s with
        // either persist or localCheckpoint per round); at real iteration
        // depth, checkpoint every few rounds as the scaladoc says
    }
    ranks
  }

  /** Personalized PageRank, scaled-integer like [[pagerankScaled]] but the
    * 15% restart mass goes ONLY to the `seeds` set (column `v`): ranks
    * concentrate around the seeds' neighborhoods — the
    * "recommendations-for-this-user / expand-this-domain" primitive. Seed
    * membership is a broadcast left-join flag; everything else is the same
    * exact-integer contribute/damp loop (r div od per edge, 85% damped,
    * integer floors), so any engine replays it bit-for-bit. Nodes start at
    * `scale` on seeds and 0 elsewhere. Unnormalized (mass leaks at sinks
    * and floors) — rankings, not probabilities, are the contract. */
  def personalizedPagerankScaled(edges: DataFrame, seeds: DataFrame,
      iters: Int, scale: Long): DataFrame = {
    val e0 = persistByKey(edges.select(col("src"), col("dst")), "src")
    // materialize ONCE before fan-out: deg, the weighted-edge join, and
    // nodes all scan e0 — left lazy, their concurrent first-round stages
    // race past the empty cache and recompute the (often expensive) edge
    // lineage up to three times in parallel
    e0.count()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("od"))
    // out-degree rides the edge table ONCE (weighted-edge shape) instead
    // of re-joining deg inside every round — saves iters−1 edge-wide joins
    val e = e0.join(deg, "src").select(col("src"), col("dst"), col("od"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.select(col("src").as("v")).distinct()
      .join(broadcast(seeds.select(col("v"), lit(1).as("__s"))), Seq("v"), "left")
      .select(col("v"), coalesce(col("__s"), lit(0)).as("is_seed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = when(col("is_seed") === 1, lit(scale * 15L / 100L)).otherwise(lit(0L))
    var ranks = nodes.select(col("v"),
      when(col("is_seed") === 1, lit(scale)).otherwise(lit(0L)).as("r"))
    var prevCached: DataFrame = null
    // persist+count CADENCE (r16, guide §1.2 "cut actions per iteration"):
    // materializing every round (the r7-era discipline) costs one action —
    // one full AQE job tree plus its planning — per round; materializing
    // every SECOND round halves that while still truncating lineage and
    // freeing the previous round's blocks promptly. Within one materialized
    // step every intermediate has exactly ONE consumer, so nothing is
    // recomputed by riding the lineage one extra round.
    val persistEvery = 2
    (1 to iters).foreach { i =>
      // NO SHUFFLE_HASH hint here, unlike bfs/sssp: measured at the 100×
      // rung the hinted SHJ ran 163.5 s vs 125.2 s for the default SMJ —
      // the ranks side is large (every node, not a frontier) and skewed
      // toward hub sources, and SMJ under AQE keeps the skew-split option
      val contrib = e
        .join(ranks.select(col("v").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("v"), expr("r div od").as("c"))
        .groupBy("v").agg(sum(col("c")).as("m"))
      ranks = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"), (base +
          expr("(85 * coalesce(m, cast(0 as bigint))) div 100")).as("r"))
      if (i % persistEvery == 0 || i == iters) {
        // cached EAGERLY: unlike pagerankScaled, the PPR replay re-runs
        // the broadcast seed join at every lineage level and measured
        // SLOWER uncached (8.1 s) than cached (6.2 s). The materialized
        // round is forced with count() so earlier blocks free IMMEDIATELY
        // — a lazily-persisted chain kept every round's blocks alive
        // through the terminal action and taxed whole-sweep runs ~4×
        // (r7 verdict)
        ranks = ranks
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        ranks.count()
        if (prevCached != null) prevCached.unpersist(false)
        prevCached = ranks
      }
    }
    // the final ranks are materialized in cache, so the loop inputs can
    // free now (eviction just replays from source — correctness-safe);
    // the RETURNED frame stays cached — callers unpersist() when done
    e0.unpersist(false)
    e.unpersist(false)
    nodes.unpersist(false)
    ranks
  }
}
