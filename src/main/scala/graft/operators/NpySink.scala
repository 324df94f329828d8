package graft.operators

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.operators.Fingerprints.FpRow

/** S7 — `.npy` byte-compatible fingerprint sink. The reference saves the
  * feature matrix with `np.save` (gen_fp/fingerprints.py:50-54) and the
  * condition-prediction stage consumes it with `np.load`
  * (condition_prediction/run.py:113-114); this writer emits the identical
  * NPY v1.0 int64 C-order artifact, so the parquet-native pipeline can
  * still hand a drop-in file to the reference's downstream.
  *
  * Scale shape: a `.npy` file is inherently a single sequential artifact, so
  * the matrix streams through the driver via `toLocalIterator` — one
  * partition in memory at a time, never the whole matrix. That bounds driver
  * memory at (largest partition), which is the right trade for an artifact
  * whose consumer is single-node numpy anyway; cluster-scale feature
  * matrices stay in parquet (the primary sink).
  */
object NpySink {

  /** NPY v1.0 header for a C-order little-endian int64 matrix — byte-equal
    * to numpy's own (dict text, space padding to a 64-byte boundary,
    * trailing newline; fixture-locked in NpySinkSpec). */
  private[operators] def header(rows: Long, cols: Int): Array[Byte] = {
    val dict = s"{'descr': '<i8', 'fortran_order': False, 'shape': ($rows, $cols), }"
    val base = 6 + 2 + 2 // magic + version + header-length field
    val unpadded = base + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val full = dict + (" " * pad) + "\n"
    val bb = ByteBuffer.allocate(base + full.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put("NUMPY".getBytes(StandardCharsets.US_ASCII))
    bb.put(1.toByte).put(0.toByte)
    bb.putShort(full.length.toShort)
    bb.put(full.getBytes(StandardCharsets.US_ASCII))
    bb.array()
  }

  /** Write the fingerprint rows as one `.npy`, ordered by original_index.
    * `swapHalves` re-emits each row `[p | d]` as `[d | p]` while streaming —
    * the reference's layout is `np.concatenate([rxn_diff_fp, product_fp],
    * axis=1)` (fingerprints.py:50) while [[Fingerprints]] carries
    * `concat(product, diff)`. */
  def write(ds: Dataset[FpRow], path: String, swapHalves: Boolean = false): Unit = {
    // Two actions total: the count for the header (NPY's shape precedes the
    // data), then one sorted streaming pass; the column width comes from
    // the first streamed row, not a separate head() job. Callers writing a
    // derived dataset they also use elsewhere should persist() it.
    val n = ds.count()
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    try {
      val it = ds.orderBy(col("original_index")).toLocalIterator()
      if (!it.hasNext) { out.write(header(0L, 0)); return }
      val first = it.next()
      val cols = first.fp.length
      // Guard the single-file boundary: a .npy is a driver-written local
      // artifact whose consumer is single-node numpy — refuse matrices past
      // the point where that consumer (and the driver-side ordered stream)
      // stops being the right tool. Cluster-scale matrices belong in the
      // sharded-parquet sink. Override via -Dgraft.npy.maxBytes for a host
      // that really wants a bigger local file.
      val bytes = n * cols.toLong * 8L
      val maxBytes = java.lang.Long.getLong("graft.npy.maxBytes", 64L << 30)
      require(bytes <= maxBytes,
        s"refusing .npy of $bytes bytes ($n x $cols int64 > $maxBytes); " +
          "use the sharded parquet sink for cluster-scale matrices " +
          "(or raise -Dgraft.npy.maxBytes)")
      out.write(header(n, cols))
      val half = cols / 2
      val bb = ByteBuffer.allocate(cols * 8).order(ByteOrder.LITTLE_ENDIAN)
      def writeRow(row: FpRow): Unit = {
        val fp = row.fp
        // a ragged row would otherwise overflow the buffer or silently
        // leave the previous row's bytes in place (clear() does not zero)
        require(fp.length == cols,
          s"ragged fp row ${row.original_index}: ${fp.length} != $cols")
        bb.clear()
        if (swapHalves) {
          var i = half
          while (i < cols) { bb.putLong(fp(i).toLong); i += 1 }
          i = 0
          while (i < half) { bb.putLong(fp(i).toLong); i += 1 }
        } else fp.foreach(v => bb.putLong(v.toLong))
        out.write(bb.array())
      }
      writeRow(first)
      while (it.hasNext) writeRow(it.next())
    } finally out.close()
  }

  /** The reference-layout artifact for run.py: `[rxn_diff_fp | product_fp]`. */
  def writeReferenceLayout(ds: Dataset[FpRow], path: String): Unit =
    write(ds, path, swapHalves = true)
}
