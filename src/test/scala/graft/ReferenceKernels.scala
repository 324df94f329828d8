package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.XHash
import graft.operators.Dedup

/** Composed-built-ins formulations of the native dedup kernels — the
  * oracle semantics the spec-locked `Expression`s must match bit for bit.
  * Test-only: production code runs [[graft.plans.ShinglesExpr]] /
  * [[graft.plans.MinHashSigExpr]] via [[Dedup.wordShingles]] /
  * [[Dedup.minhashSig]].
  */
object ReferenceKernels {

  /** Composed form of [[graft.operators.TextOps.winnow]]: frequency
    * n-grams hashed under the "winnow" seed, per-window minima over `w`
    * consecutive hashes, first-occurrence distinct; ≤ w grams → the single
    * global min, < k tokens → empty. The hash array is let-bound through a
    * singleton transform so the interpreted path evaluates it once per row
    * (the naive capture re-hashed all grams per window — O(n²) md5). */
  def winnowReference(toks: Column, k: Int, w: Int): Column = {
    val hsExpr = transform(graft.operators.TextOps.ngrams(toks, k),
      g => XHash.bucketHash("winnow", g))
    try_element_at(transform(array(hsExpr), hs =>
      when(size(hs) === 0, array().cast("array<bigint>"))
        .when(size(hs) <= w, array(array_min(hs)))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(hs) - (w - 1)),
          i => array_min(slice(hs, i, lit(w))))))), lit(1))
  }

  /** Composed form of [[graft.operators.Similarity.lshBandKeys]]: bands·r
    * sign-of-dot bits, each plane's dot against the weight literal SLICED
    * to the vector's length (len > maxDims ⇒ mismatch ⇒ null ⇒ bit 0),
    * band key = "b:bits". The formulation the native
    * [[graft.plans.LshBandKeysExpr]] must match bit for bit. */
  def lshBandKeysReference(vec: Column, planes: Int, bands: Int,
      maxDims: Int = 64): Column = {
    import graft.operators.Similarity.planeWeightConst
    val r = planes / bands
    array((0 until bands).map { b =>
      val bits = (0 until r).map { j =>
        val p = b * r + j
        val w = typedLit((0 until maxDims).map(d => planeWeightConst(p, d)))
        when(
          graft.plans.VecKernels.dot(vec, slice(w, lit(1), size(vec))) >= 0,
          lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
      concat_ws(":", lit(b.toString), bits.cast("string"))
    }: _*)
  }

  /** Composed form of [[Dedup.wordShingles]]: distinct word n-gram
    * shingles; short docs fall back to the whole token list as one
    * shingle. */
  def wordShinglesReference(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))

  /** Composed form of [[Dedup.minhashSig]]: each shingle md5-hashed once,
    * k xor-masked views folded to their minima in a single `aggregate`
    * (a transform-per-j formulation re-inlines the hash array k times
    * under Catalyst's CollapseProject — k× the hashing cost). */
  def minhashSigReference(shingles: Column, k: Int): Column = {
    val masks = typedLit(Dedup.minhashMasks(k))
    val hs = transform(shingles, s => XHash.bucketHash("mh0", s))
    aggregate(hs,
      typedLit(Seq.fill(k)(Long.MaxValue)),
      (acc, h) => zip_with(acc, masks, (a, m) => least(a, h.bitwiseXOR(m))))
  }

  /** Composed form of [[graft.operators.Similarity.dot]]. */
  def dotReference(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, p) => acc + p)

  /** Composed form of [[graft.operators.Similarity.l2sq]]. */
  def l2sqReference(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (s, v) => s + v)

  /** Composed form of [[XHash.bucketHash]]. */
  def bucketHashReference(seed: String, keys: Column*): Column =
    conv(substring(md5(concat_ws("\u0001", (lit(seed) +: keys): _*)), 1, 15), 16, 10)
      .cast("long")
}
