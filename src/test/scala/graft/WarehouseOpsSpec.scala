package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Brute-force equivalence for the warehouse-maintenance operators
  * (q174/q177/q179): the distributed formulations must equal a plain
  * in-memory fold/scan on small randomized inputs — deterministic seeds,
  * so a failure reproduces.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q174 CDC compaction equals the sequential changelog fold") {
    val rnd = new Random(41)
    val ops = (0 until 400).map { i =>
      (rnd.nextInt(25).toLong, i.toLong, // (key, opId ~ arrival order)
        Seq("upsert", "upsert", "delete")(rnd.nextInt(3)), rnd.nextInt(1000).toLong)
    }
    // brute force: fold per key in opId order, keep the last op
    val expected = ops.groupBy(_._1).flatMap { case (k, os) =>
      val last = os.maxBy(_._2)
      if (last._3 == "delete") None
      else Some((k, last._2, last._4, os.size.toLong,
        os.count(_._3 == "delete").toLong))
    }.toSet
    val df = ops.toDF("key", "op_id", "op", "v")
    val got = df.groupBy("key")
      .agg(max(struct(col("op_id"), col("op"), col("v"))).as("last"),
        count(lit(1)).as("n_ops"),
        count(when(col("op") === "delete", 1)).as("n_del"))
      .filter(col("last.op") =!= "delete")
      .select(col("key"), col("last.op_id"), col("last.v"), col("n_ops"),
        col("n_del"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("q177 CUSUM argmax equals the windowed brute force (ties → earliest)") {
    val rnd = new Random(42)
    val rows = (0 until 300).map { i =>
      (s"g${rnd.nextInt(3)}", i.toLong, (rnd.nextInt(200) - 100).toLong)
    }
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      val n = sorted.size.toLong
      val sTot = sorted.map(_._3).sum
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      val ds = sorted.zip(cums).zipWithIndex.map { case (((_, id, _), sk), idx) =>
        (math.abs(n * sk - (idx + 1) * sTot), id)
      }
      val best = ds.maxBy(d => (d._1, -d._2))
      (g, n, sTot, best._2, best._1)
    }.toSet
    val df = rows.toDF("event_type", "event_id", "c").withColumn("__one", lit(1L))
    val withS = graft.operators.Relational
      .prefixSumOrderedBy(df, Seq("event_type"), "event_id", "c")
      .withColumnRenamed("__cum", "s_k")
    val withK = graft.operators.Relational
      .prefixSumOrderedBy(withS, Seq("event_type"), "event_id", "__one")
      .withColumnRenamed("__cum", "k")
    val tot = df.groupBy("event_type")
      .agg(sum(col("c")).as("s_tot"), count(lit(1)).as("n"))
    val got = withK.join(broadcast(tot), "event_type")
      .withColumn("dn", abs(col("n") * col("s_k") - col("k") * col("s_tot")))
      .groupBy("event_type")
      .agg(min(col("n")).as("n"), min(col("s_tot")).as("s_tot"),
        max(struct(col("dn"), (-col("event_id")).as("neg"))).as("best"))
      .select(col("event_type"), col("n"), col("s_tot"),
        (-col("best.neg")).as("cut"), col("best.dn"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("q179 containment: planted subset found; reported intersections exact") {
    // corpus: random token docs + one doc embedded verbatim inside another
    val rnd = new Random(43)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    def doc(n: Int) = (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
    val host = doc(40)
    val quote = host.slice(10, 25) // 15 tokens => subset of host's shingles
    val docs = Seq((0L, host.mkString(" ")), (1L, quote.mkString(" "))) ++
      (2L until 30L).map(i => (i, doc(20 + rnd.nextInt(20)).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    def shingles(s: String): Set[String] = {
      val t = s.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - 5).map(p => t.slice(p, p + 5).mkString(" ")).toSet
    }
    val sh = df
      .select(col("doc_id"), graft.functions.ArrayOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 5)," +
          " p -> array_join(slice(toks, p + 1, 5), ' '))")).as("sh"))
      .distinct()
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("c"))
      .filter(col("c").between(2, 10)).select("sh")
    val inv = sh.join(rare, "sh")
    val cand = inv.select(col("sh"), col("doc_id").as("a_id"))
      .join(inv.select(col("sh"), col("doc_id").as("b_id")), "sh")
      .filter(col("a_id") < col("b_id")).select("a_id", "b_id").distinct()
    val na = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val got = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
      .join(na.select(col("doc_id").as("a_id"), col("n").as("n_a")), "a_id")
      .join(na.select(col("doc_id").as("b_id"), col("n").as("n_b")), "b_id")
      .filter(lit(2) * col("n_inter") >= least(col("n_a"), col("n_b")))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._1, r._3, r._4, r._5)) // (a_id, b_id, ...) join reorders
    val byPair = got.map(r => (r._1, r._2) -> r).toMap
    // the planted quote: every quote shingle is a host shingle
    val hostSh = shingles(host.mkString(" "))
    val quoteSh = shingles(quote.mkString(" "))
    assert(quoteSh.subsetOf(hostSh))
    val planted = byPair.get((0L, 1L))
    assert(planted.isDefined, s"planted pair not found in ${byPair.keySet}")
    // all reported numbers are the exact brute-force set sizes
    got.foreach { case (a, b, ni, nA, nB) =>
      val sa = shingles(docs.find(_._1 == a).get._2)
      val sb = shingles(docs.find(_._1 == b).get._2)
      assert(ni == (sa intersect sb).size, s"pair ($a,$b) n_inter")
      assert(nA == sa.size && nB == sb.size, s"pair ($a,$b) sizes")
      assert(2 * ni >= math.min(sa.size, sb.size))
    }
  }

  test("q240 markov transitions: rows normalize to 1 and conserve sequence mass") {
    val out = SparkEntry.queries("q240_markov_transitions")(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty)
    // each source row is a probability distribution over successors
    out.groupBy(_._1).foreach { case (src, rows) =>
      val pSum = rows.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"src $src p-sum $pSum")
      assert(rows.map(_._2).distinct.length == rows.length, s"src $src dup dst")
    }
    // Σ n over the matrix = Σ_users (events_u − 1): every adjacent pair in
    // every user's sequence is counted exactly once, none invented
    val total = out.map(_._3).sum
    val expected = Tables.events(spark, sf0001)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).as[Long].head()
    assert(total == expected, s"transition mass $total vs $expected")
  }

  test("q241 trigram paths: contiguous deterministic rank, counts consistent with q240") {
    val tri = SparkEntry.queries("q241_trigram_paths")(spark, sf0001)
      .as[(String, String, String, Long, Int)].collect()
    assert(tri.nonEmpty && tri.length <= 20)
    assert(tri.map(_._5).sorted.toSeq == (1 to tri.length))
    // ranks follow (n desc, a, b, c) — re-sorting by that key preserves rnk
    val resorted = tri.sortBy(t => (-t._4, t._1, t._2, t._3)).map(_._5).toSeq
    assert(resorted == (1 to tri.length))
    // a trigram (a,b,c) is a refinement of the (a,b) transition: its count
    // can never exceed q240's n for that pair
    val bi = SparkEntry.queries("q240_markov_transitions")(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    tri.foreach { case (a, b, _, n, _) =>
      assert(n <= bi.getOrElse((a, b), 0L), s"trigram ($a,$b) exceeds bigram")
    }
  }
}
