package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Persist-hygiene contract (r8): with cleanup=true an operator's
  * materialization barriers must NOT survive its action — only the
  * returned (cached) frame may hold blocks, and unpersisting it leaves
  * no block the operator created. Assertions are DELTA-based against a
  * pre-call snapshot: the shared test session can carry localCheckpoint
  * RDDs from other suites that clearCache does not remove. */
class CacheScopeSpec extends SparkSpec {

  private def cachedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("minhashLshPairs cleanup=true frees barriers; result identical") {
    import spark.implicits._
    val docs = (0 until 60)
      .map(i => (i.toLong, Seq(s"s${i % 7}", s"t${i % 3}", s"u$i")))
      .toDF("id", "sh")
    val lazyRun = Dedup.minhashLshPairs(docs, "id", "sh")
    val lazyPairs = lazyRun.orderBy("a_id", "b_id").collect().toSeq
    lazyRun.unpersist(false)
    spark.catalog.clearCache()
    val before = cachedIds
    val pairs = Dedup.minhashLshPairs(docs, "id", "sh", cleanup = true)
    // the operator already ran its action; ONLY the result block remains
    assert((cachedIds -- before).size === 1, (cachedIds -- before).toString)
    assert(pairs.orderBy("a_id", "b_id").collect().toSeq === lazyPairs)
    pairs.unpersist(true)
    assert((cachedIds -- before).isEmpty)
  }

  test("semanticDedup cleanup=true leaves only the kept-rows frame") {
    import spark.implicits._
    spark.catalog.clearCache()
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(d => ((i % 5) + d).toFloat))
    }.toDF("id", "vec")
    // ivfAssign selects the centroid frame by the same (id, vec) names
    val centroids = Seq((0L, Array(0f, 1f, 2f, 3f)), (1L, Array(4f, 5f, 6f, 7f)))
      .toDF("id", "vec")
    val before = cachedIds
    val kept = Similarity.semanticDedup(vecs, "id", "vec", centroids,
      minCosine = 0.999999, cleanup = true)
    assert((cachedIds -- before).size === 1, (cachedIds -- before).toString)
    assert(kept.count() > 0)
    kept.unpersist(true)
    assert((cachedIds -- before).isEmpty)
  }
}
