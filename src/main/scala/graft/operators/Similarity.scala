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

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

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
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col(qId) =!= col(cId))
      .withColumn("__sim", cosine(col("q_vec"), col("c_vec")))
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
        aggregate(
          // slice the weight literal to the vector's length — zip_with
          // null-pads the shorter side, which would poison the fold
          zip_with(vec, slice(w, lit(1), size(vec)), (x, wd) => x.cast("double") * wd),
          lit(0.0), (s, v) => s + v) >= 0,
        lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN top-k: candidates restricted to the query's LSH bucket.
    * Returns (q_id, n_id, rank) within-bucket. */
  def lshTopK(df: DataFrame, id: String, vec: String, planes: Int, k: Int,
      queryPred: Column): DataFrame = {
    val withB = df.withColumn("__b", lshBucket(col(vec), planes))
    val q = withB.filter(queryPred)
      .select(col(id).as("q_id"), col(vec).as("q_vec"), col("__b"))
    val c = withB.select(col(id).as("n_id"), col(vec).as("c_vec"), col("__b"))
    val joined = c.join(broadcast(q), Seq("__b"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("__sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("__sim").desc, col("n_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank"))
  }
}
