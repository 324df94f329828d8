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
    * digest. The digest aggregate shuffles 16-byte keys, not documents. */
  def exactDedup(df: DataFrame, text: Column, keep: Column): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(keep.asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles; short docs fall back to the whole token
    * list as a single shingle so every doc has ≥1 shingle. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))

  /** MinHash signature: k independent hash functions via seed-mixed
    * [[XHash.bucketHash]]; signature[j] = min over shingles. */
  def minhashSig(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), j =>
      array_min(transform(shingles, s =>
        XHash.bucketHash("mh", j.cast("string"), s))))

  /** LSH band keys: hash of each signature slice of `rowsPerBand` values.
    * Docs sharing ANY band key are near-dup candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws("", b.cast("string"),
        array_join(transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")), ""))))

  /** MinHash+LSH near-duplicate pairs over (id, shingles):
    * explode band keys → self-join per bucket (a.id < b.id) → distinct
    * candidate pairs → exact Jaccard verify ≥ `threshold`.
    * Returns (a_id, b_id, n_common, n_union).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, shinglesCol: String,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    val sig = docs.select(col(idCol), col(shinglesCol))
      .withColumn("__bk", explode(bandKeys(minhashSig(col(shinglesCol), k), bands, k / bands)))
    val a = sig.select(col(idCol).as("a_id"), col(shinglesCol).as("a_sh"), col("__bk"))
    val b = sig.select(col(idCol).as("b_id"), col(shinglesCol).as("b_sh"), col("__bk"))
    val cand = a.join(b, Seq("__bk")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").dropDuplicates("a_id", "b_id")
    cand
      .withColumn("n_common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("n_union", size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("n_common").cast("double") / col("n_union") >= threshold)
      .select("a_id", "b_id", "n_common", "n_union")
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
}
