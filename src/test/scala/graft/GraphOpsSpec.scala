package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Join-only graph kernels: co-occurrence edge derivation and exact
  * triangle counting (q94). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceEdges: distinct ascending pairs within groups only") {
    val df = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 20L), (2L, 10L),   // re-derives (10,20) — must stay distinct
      (2L, 10L),              // duplicate item in one basket: no self-edge
      (3L, 5L))               // singleton basket: no edges
      .toDF("g", "i")
    val edges = GraphOps.cooccurrenceEdges(df, col("g"), col("i"))
      .as[(Long, Long)].collect().toSet
    assert(edges == Set((10L, 20L), (10L, 30L), (20L, 30L)))
    // support gate: only (10,20) co-occurs in two distinct baskets
    val frequent = GraphOps.cooccurrenceEdges(df, col("g"), col("i"),
      minSupport = 2L).as[(Long, Long)].collect().toSet
    assert(frequent == Set((10L, 20L)))
  }

  test("triangleStats: each triangle counted once; open wedges don't count") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4};
    // the isolated edge (7,8) adds nodes/edges but no closure.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (7L, 8L))
      .toDF("a", "b")
    val row = GraphOps.triangleStats(edges)
      .as[(Long, Long, Long)].head()
    assert(row == ((6L, 6L, 2L)))
  }

  test("triangleStats matches brute force on pseudo-random graphs") {
    // deterministic LCG-built graphs across densities; brute force counts
    // closed triples over the adjacency set
    for (seed <- 1 to 4) {
      var s = seed.toLong
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
      val n = 12
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if java.lang.Long.remainderUnsigned(next(), 100) < 30 + seed * 10
      } yield (a.toLong, b.toLong)).toSeq
      val adj = edges.toSet
      val expect = (for {
        a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj((a, b)) && adj((b, c)) && adj((a, c))
      } yield 1).size.toLong
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
      val got = GraphOps.triangleStats(edges.toDF("a", "b"))
        .as[(Long, Long, Long)].head()
      assert(got == ((nodes, edges.size.toLong, expect)), s"seed=$seed")
    }
  }

  test("triangleStats: full K4 has 4 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    assert(GraphOps.triangleStats(k4).as[(Long, Long, Long)].head() ==
      ((4L, 6L, 4L)))
  }

  test("pagerankScaled is exactly stationary at `scale` on a cycle") {
    // out-degree 1 everywhere: r' = 0.15S + (85·S) div 100 = S exactly in
    // integer arithmetic (S = 1e12), every iteration — any drift means the
    // floor-division recurrence is wrong
    val n = 7
    val cycle = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val s = 1000000000000L
    val ranks = GraphOps.pagerankScaled(cycle, 5, s)
      .as[(Long, Long)].collect().toMap
    assert(ranks.size == n)
    assert(ranks.values.forall(_ == s), s"cycle ranks drifted: $ranks")
  }

  test("pagerankScaled matches the scalar floor-division recurrence on random graphs") {
    // LCG-built digraphs, every node given a self-loop so out-degree ≥ 1;
    // the brute force replays the identical integer recurrence in plain
    // Scala — any divergence is a distribution bug (join/agg mis-keying),
    // since the arithmetic itself is exact in both
    val s = 1000000000000L
    for (seed <- 1 to 3) {
      var st = seed.toLong
      def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
      val n = 9
      val edges = ((0 until n).map(i => (i.toLong, i.toLong)) ++ (for {
        a <- 0 until n; b <- 0 until n
        if a != b && java.lang.Long.remainderUnsigned(next(), 100) < 25
      } yield (a.toLong, b.toLong))).distinct
      val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = (0 until n).map(i => i.toLong -> s).toMap
      (1 to 3).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => r(u) / outDeg(u) }.sum).toMap
        r = r.keys.map(v =>
          v -> (s * 15L / 100L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
      }
      val got = GraphOps.pagerankScaled(edges.toDF("src", "dst"), 3, s)
        .as[(Long, Long)].collect().toMap
      assert(got == r, s"seed=$seed: spark $got vs scalar $r")
    }
  }

  test("pagerankScaled concentrates rank on a star hub") {
    // leaves all point at the hub; hub's mass returns split across leaves.
    // closed graph (hub has out-edges), so ranks order hub >> any leaf
    val leaves = (1L to 10L).toSeq
    val edges = (leaves.map(l => (l, 0L)) ++ leaves.map(l => (0L, l)))
      .toDF("src", "dst")
    val ranks = GraphOps.pagerankScaled(edges, 3, 1000000000000L)
      .as[(Long, Long)].collect().toMap
    val hub = ranks(0L)
    assert(leaves.forall(l => ranks(l) < hub / 2),
      s"hub does not dominate: $ranks")
    // leaves are symmetric: identical ranks, exactly
    assert(leaves.map(ranks).distinct.size == 1)
  }

  test("bfsLevels: hop distances on a planted path + branch; iteration cap") {
    // 1→2→3→4→5 path, 2→6 branch, 9 isolated-from-seed; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (9L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val got = GraphOps.bfsLevels(edges, seeds, 10)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3, 5L -> 4))
    // cap stops expansion: maxIters=2 never reaches 4 or 5
    val capped = GraphOps.bfsLevels(edges, seeds, 2)
      .as[(Long, Int)].collect().toMap
    assert(capped == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2))
    // an isolated seed still reports level 0
    val iso = GraphOps.bfsLevels(edges, Seq(42L).toDF("v"), 3)
      .as[(Long, Int)].collect().toMap
    assert(iso == Map(42L -> 0))
  }

  test("bfsLevels matches brute-force BFS on pseudo-random graphs") {
    val rnd = new scala.util.Random(61L)
    (0 until 3).foreach { trial =>
      val n = 40
      val dir = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 7L)
      val adj = dir.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      // sequential frontier BFS
      var visited = seeds.map(_ -> 0).toMap
      var frontier = seeds
      var lvl = 0
      while (frontier.nonEmpty && lvl < 5) {
        lvl += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)).distinct
          .filterNot(visited.contains)
        visited = visited ++ next.map(_ -> lvl)
        frontier = next
      }
      val got = GraphOps.bfsLevels(dir.toDF("src", "dst"),
          seeds.toDF("v"), 5)
        .as[(Long, Int)].collect().toMap
      assert(got == visited, s"trial $trial")
    }
  }

  test("ssspRounds: planted cheap detour beats the direct hop; == brute force") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 — needs 2 rounds to win
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("v")
    val r1 = GraphOps.ssspRounds(edges, seeds, 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0, 2L -> 2, 3L -> 10))
    val r3 = GraphOps.ssspRounds(edges, seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 0, 2L -> 2, 3L -> 5, 4L -> 6))
    val rnd = new scala.util.Random(29L)
    (0 until 3).foreach { trial =>
      val n = 25
      val es = (0 until 100).map(_ => (rnd.nextInt(n).toLong,
        rnd.nextInt(n).toLong, rnd.nextInt(20).toLong))
        .filter(e => e._1 != e._2)
        .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
      def relax(d: Map[Long, Long]): Map[Long, Long] = {
        val cand = es.flatMap { case (s, t, w) =>
          d.get(s).map(ds => (t, ds + w))
        }.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
        cand.foldLeft(d) { case (acc, (v, nd)) =>
          acc.updated(v, math.min(acc.getOrElse(v, Long.MaxValue), nd))
        }
      }
      val expect = (1 to 3).foldLeft(Map(0L -> 0L, 5L -> 0L))((d, _) => relax(d))
      val got = GraphOps.ssspRounds(
          es.toDF("src", "dst", "w"), Seq(0L, 5L).toDF("v"), 3)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("kCoreEdges: planted K4 survives peeling that strips the tail") {
    // K4 on {1,2,3,4} (degree 3 each) + a pendant path 4–5–6: after one
    // k=3 round the path is gone, the clique intact; extra rounds no-op
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    (1 to 3).foreach { rounds =>
      val got = GraphOps.kCoreEdges(edges, 3L, rounds)
        .as[(Long, Long)].collect().toSet
      assert(got == k4.toSet, s"rounds=$rounds")
    }
    // k=4: only node 4 reaches degree 4, no edge keeps both ends
    assert(GraphOps.kCoreEdges(edges, 4L, 3).count() == 0L)
  }

  test("kCoreEdges matches brute-force synchronous peeling") {
    val rnd = new scala.util.Random(97L)
    (0 until 3).foreach { trial =>
      val n = 30
      val und = (0 until 120).map { _ =>
        val (x, y) = (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
        (math.min(x, y), math.max(x, y))
      }.distinct.filter(e => e._1 != e._2)
      def peel(es: Seq[(Long, Long)], k: Long): Seq[(Long, Long)] = {
        val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
          .map { case (v, occ) => v -> occ.size.toLong }
        val keep = deg.filter(_._2 >= k).keySet
        es.filter(e => keep(e._1) && keep(e._2))
      }
      (1 to 3).foreach { rounds =>
        val expect = (1 to rounds)
          .foldLeft(und: Seq[(Long, Long)])((es, _) => peel(es, 3L)).toSet
        val got = GraphOps.kCoreEdges(und.toDF("a", "b"), 3L, rounds)
          .as[(Long, Long)].collect().toSet
        assert(got == expect, s"trial $trial rounds=$rounds")
      }
    }
  }
}
