package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed linear algebra over quantized embeddings.
  *
  * The Gram matrix G = Σ_rows q qᵀ (and with centering, the covariance) is
  * the front door to PCA/whitening over an embedding corpus. Floats don't
  * survive cross-engine summation, so rows are first quantized to int8 with
  * the same deterministic floor rule as the q52 quantizer — after that every
  * product and sum is exact 64-bit integer arithmetic, reproducible by any
  * engine in any order.
  */
object LinearAlgebra {

  /** Deterministic per-row int8 quantization column (floor(x·127/max|x|),
    * the q52 rule — floor, not round: round's tie rule is not
    * engine-portable). */
  private def quantized(embCol: String) = {
    val m = array_max(transform(col(embCol), x => abs(x.cast("double"))))
    struct(m.as("m"), col(embCol).as("e"))
  }

  /** Upper-triangular exact Gram matrix of the int8-quantized `embCol`:
    * one output row per (i ≤ j) dimension pair, `dot = Σ_rows q_i · q_j`,
    * 1-indexed to match SQL list indexing.
    *
    * The 100 TB shape: each task folds its whole partition into ONE dense
    * `long[d(d+1)/2]` accumulator and emits d(d+1)/2 partial rows, so the
    * shuffle carries O(partitions · d²) rows — independent of corpus size.
    * The naive alternative (explode each row into d² pair terms and
    * groupBy) is map-side combinable too but pays a d²× row blow-up through
    * the aggregate's hash path; the dense fold is a plain array walk.
    * `mapPartitions` is justified here per the (d) rule: the per-partition
    * state is a mutable dense matrix no Column expression models.
    */
  def gramInt8(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(quantized(embCol).as("me"))
      .select(when(col("me.m") === 0,
          transform(col("me.e"), _ => lit(0)))
        .otherwise(transform(col("me.e"),
          x => floor(x.cast("double") * (lit(127.0) / col("me.m"))).cast("int")))
        .as("q"))
    val n = dim * (dim + 1) / 2
    val partials = q.as[Seq[Int]].mapPartitions { it =>
      val acc = new Array[Long](n)
      var any = false
      it.foreach { row =>
        any = true
        val a = row.toArray
        var idx = 0
        var i = 0
        while (i < dim) {
          val ai = a(i).toLong
          var j = i
          while (j < dim) { acc(idx) += ai * a(j); idx += 1; j += 1 }
          i += 1
        }
      }
      if (!any) Iterator.empty
      else {
        val out = new Array[(Int, Int, Long)](n)
        var idx = 0
        var i = 0
        while (i < dim) {
          var j = i
          while (j < dim) { out(idx) = (i + 1, j + 1, acc(idx)); idx += 1; j += 1 }
          i += 1
        }
        out.iterator
      }
    }.toDF("i", "j", "dot")
    partials.groupBy("i", "j").agg(sum("dot").as("dot"))
  }
}
