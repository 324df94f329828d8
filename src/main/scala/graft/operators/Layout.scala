package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest predicate is the one that never reads a file:
  * parquet min/max footer stats prune whole files when the data is
  * clustered on the filtered column. A single sort key only prunes ONE
  * dimension; interleaving the bits of two keys (Morton / Z-order) keeps
  * rows close in BOTH dimensions, so range-partitioning by the z-key
  * yields files whose min/max boxes are tight in each dimension — the
  * standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) re-expressed
  * as plain Spark: a pure integer Column expression + `repartitionByRange`.
  */
object Layout {

  /** Scale-adaptive scan fan-out for compute-heavy map stages: round-robin
    * repartition `df` when — and only when — the source is ONE small
    * parquet file, the measured pathology this exists for, and leave it
    * UNTOUCHED whenever the scan can parallelize itself (a sharded corpus
    * at the 25×/100× ladder rungs, a real cluster table, or a single file
    * big enough that `maxPartitionBytes` splits it), so this never ADDS a
    * shuffle at scale.
    *
    * Why it exists (guide §2.5 "input skew: one huge unsplittable file"):
    * the driver test tables are single one-row-group parquet files, so
    * every scan is exactly ONE task and everything narrow above it — a
    * cross-join cosine pass, shingling, fingerprinting — runs serially on
    * one core however many the session has (r15 JobProbe: q238's three
    * pair-scoring jobs ran 2.4/1.2/0.6 s each as single-task stages on a
    * 32-core session). One tiny exchange of the slim input rows buys a
    * parallel compute stage; partition-count-dependent results would be
    * the only hazard, so callers must be value-pure (no spark_partition_id
    * / monotonically_increasing_id downstream — every current caller is a
    * plain aggregate/join/window consumer).
    *
    * Gate (r15 verdict items 1–2): the old `inputFiles.length <
    * defaultParallelism` gate fanned SHARDED corpora whose file count was
    * merely below the session width (e.g. 100 × 1 GB files on 512 cores —
    * a full round-robin shuffle of the table the scan never needed, since
    * Spark splits multi-row-group files by `maxPartitionBytes` anyway).
    * Now: fan ONLY a single-file source whose byte size the scan cannot
    * split into `defaultParallelism` partitions on its own. Width is
    * capped by INPUT SIZE, not session width (r15: a 594 KB documents
    * file fanned to 32 tasks manufactured 32-way scheduling overhead that
    * made the 32-core bench slower than the 8-core one — q217 8c/32c
    * ratio 0.23): one task per `bytesPerTask` (64 KB of compressed
    * parquet ≈ a few hundred docs / a few thousand vectors — enough rows
    * to amortize a task, small enough to fill a many-core box on the
    * sf0.1 bench corpus), so the fanned width is a property of the data,
    * and an 8-core and a 32-core session build nearly the same tasks.
    *
    * `df.inputFiles` reads the already-built FileIndex — no physical
    * planning (a `.rdd` probe would pre-execute AQE stages on non-scan
    * inputs and replan on every call); the single file's length is one
    * driver-side FileSystem stat. */
  def fanOut(df: DataFrame): DataFrame = fanOut(df, 64L << 10)

  /** [[fanOut]] with an explicit bytes-per-task budget — heavy quadratic
    * consumers (|A|·|B| pair scoring) may want more width per input byte
    * than the linear-pass default. */
  def fanOut(df: DataFrame, bytesPerTask: Long): DataFrame = {
    val sess = df.sparkSession
    val para = sess.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length != 1) return df // sharded (or non-file) source: scan parallelizes itself
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(files(0))
        p.getFileSystem(sess.sparkContext.hadoopConfiguration)
          .getFileStatus(p).getLen
      } catch { case _: Throwable => return df }
    val maxPart = sess.sessionState.conf.filesMaxPartitionBytes
    // a file the scan itself splits into >= para partitions needs no help
    // (and a single file THAT big must never be round-robin shuffled)
    if ((bytes + maxPart - 1) / maxPart >= para) return df
    val width = math.min(para.toLong,
      (bytes + bytesPerTask - 1) / bytesPerTask).toInt
    if (width >= 2) df.repartition(width) else df
  }

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure shift/mask arithmetic (codegen'd, scan-speed, exact in both
    * engines — the disjoint-bit sum is the bitwise OR). Higher bits are
    * ignored by construction; callers bucket wider domains first. */
  def zorder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The matching DuckDB fragment for [[zorder2]] — oracle authors. */
  def zorder2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Cluster `df` for writing: range-partition on the z-key and sort
    * within partitions, so every output file covers a tight box in both
    * dimensions and parquet min/max stats prune scans on EITHER column.
    * `numPartitions` ≈ target file count. */
  def clusterByZOrder(df: DataFrame, a: Column, b: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("__z", zorder2(a, b, bits))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hilbert-curve index of a point on the 2^order × 2^order grid — the
    * stronger locality cousin of [[zorder2]]: consecutive indices are
    * ALWAYS adjacent cells (unit Manhattan step; Z-order jumps across the
    * grid at power-of-two seams), so range-partitioned files cover even
    * tighter boxes. Standard xy→d walk (per-level quadrant + rotate, cf.
    * the classic iterative formulation): folded over the bit levels with
    * `aggregate` over a LITERAL level array and a struct accumulator —
    * one O(order) pass per row, no expression-tree duplication, exact
    * integer arithmetic in both engines. Inputs must already lie on the
    * grid (callers bucket wider domains first, e.g. `% (1 << order)`) —
    * the reflection step `n-1-x` is only meaningful inside the grid. */
  def hilbert2(a: Column, b: Column, order: Int): Column = {
    require(order >= 1 && order <= 31, s"order out of range: $order")
    val n = 1L << order
    val levels = ((order - 1) to 0 by -1).map(i => 1L << i).toArray
    aggregate(
      lit(levels),
      struct(a.cast("long").as("x"), b.cast("long").as("y"),
        lit(0L).as("d")),
      (acc, s) => {
        val x = acc.getField("x")
        val y = acc.getField("y")
        val d = acc.getField("d")
        val rx = x.bitwiseAND(s) =!= 0L
        val ry = y.bitwiseAND(s) =!= 0L
        // quadrant index (3*rx XOR ry) spelled as a when-chain: 0,1,2,3
        val quad = when(ry, when(rx, 2L).otherwise(1L))
          .otherwise(when(rx, 3L).otherwise(0L))
        // rotate/flip: identity when ry=1; reflect-iff-rx then swap when ry=0
        val nx = when(ry, x).otherwise(when(rx, lit(n - 1) - y).otherwise(y))
        val ny = when(ry, y).otherwise(when(rx, lit(n - 1) - x).otherwise(x))
        struct(nx.as("x"), ny.as("y"), (d + s * s * quad).as("d"))
      }
    ).getField("d")
  }

  /** The matching DuckDB oracle for [[hilbert2]], as a `WITH RECURSIVE`
    * statement (the per-level fold carries (x, y) state, which DuckDB's
    * list_reduce struct accumulator mishandles — documented in q84).
    * `srcSql` must select the carried key columns `keyCols` plus integer
    * grid coordinates named `x` and `y`; the result exposes the keys and
    * the index as `hkey`. */
  def hilbert2OracleSql(srcSql: String, keyCols: Seq[String],
      order: Int): String = {
    val n1 = (1L << order) - 1
    val ks = keyCols.mkString(", ")
    s"""WITH RECURSIVE hwalk AS (
       |  SELECT $ks, cast(x as bigint) AS x, cast(y as bigint) AS y,
       |         cast(0 as bigint) AS d, ${order - 1} AS lvl
       |  FROM ($srcSql)
       |  UNION ALL
       |  SELECT $ks,
       |    CASE WHEN ((y >> lvl) & 1) = 1 THEN x
       |         WHEN ((x >> lvl) & 1) = 1 THEN $n1 - y ELSE y END,
       |    CASE WHEN ((y >> lvl) & 1) = 1 THEN y
       |         WHEN ((x >> lvl) & 1) = 1 THEN $n1 - x ELSE x END,
       |    d + (cast(1 as bigint) << lvl) * (cast(1 as bigint) << lvl) *
       |      (CASE WHEN ((y >> lvl) & 1) = 1
       |            THEN CASE WHEN ((x >> lvl) & 1) = 1 THEN 2 ELSE 1 END
       |            ELSE CASE WHEN ((x >> lvl) & 1) = 1 THEN 3 ELSE 0 END
       |       END),
       |    lvl - 1
       |  FROM hwalk WHERE lvl >= 0)
       |SELECT $ks, d AS hkey FROM hwalk WHERE lvl = -1""".stripMargin
  }

  /** [[clusterByZOrder]] with the Hilbert key: range-partition + sort on
    * the curve index. Same write-path contract, tighter per-file boxes. */
  def clusterByHilbert(df: DataFrame, a: Column, b: Column, order: Int,
      numPartitions: Int): DataFrame = {
    val keyed = df.withColumn("__h", hilbert2(a, b, order))
    keyed.repartitionByRange(numPartitions, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
  }

  /** Scalar [[hilbert2]] — the same walk in plain Scala, for driver-side
    * planning (range covering) and spec cross-checks. */
  def hilbertIndex(order: Int, x0: Long, y0: Long): Long = {
    val n = 1L << order
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Query-side complement of [[clusterByHilbert]]: cover the box
    * [x0,x1]×[y0,y1] (inclusive, grid coordinates) with a minimal-ish set
    * of CONTIGUOUS curve-index ranges, so a 2-D box predicate becomes a
    * disjunction of `hkey BETWEEN lo AND hi` — the form parquet min/max
    * stats and range-partition pruning can actually use. Correctness
    * rests on the Hilbert recursion: every aligned power-of-two
    * sub-square is one contiguous curve segment (each quadrant is a
    * rotated copy of the whole curve, entered and left exactly once), and
    * its segment start is the minimum of its four corner indices. The
    * quadtree descent emits fully-contained sub-squares whole and splits
    * boundary ones, so the range count is O(perimeter · order), not
    * O(area); adjacent ranges merge afterwards. Pure driver-side planning
    * arithmetic — no data touched. */
  def hilbertBoxRanges(order: Int, x0: Long, x1: Long, y0: Long,
      y1: Long): Seq[(Long, Long)] = {
    require(order >= 1 && order <= 31)
    val n = 1L << order
    require(0 <= x0 && x0 <= x1 && x1 < n && 0 <= y0 && y0 <= y1 && y1 < n,
      s"box out of grid: [$x0,$x1]x[$y0,$y1] on $n")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def walk(qx: Long, qy: Long, s: Long): Unit = {
      val (qx1, qy1) = (qx + s - 1, qy + s - 1)
      if (qx1 < x0 || qx > x1 || qy1 < y0 || qy > y1) return // disjoint
      if (qx >= x0 && qx1 <= x1 && qy >= y0 && qy1 <= y1) {  // contained
        val dStart = Seq((qx, qy), (qx1, qy), (qx, qy1), (qx1, qy1))
          .map { case (cx, cy) => hilbertIndex(order, cx, cy) }.min
        out += ((dStart, dStart + s * s - 1))
      } else {
        val h = s >> 1
        walk(qx, qy, h); walk(qx + h, qy, h)
        walk(qx, qy + h, h); walk(qx + h, qy + h, h)
      }
    }
    walk(0L, 0L, n)
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 >= lo)
        merged(merged.size - 1) = (merged.last._1, math.max(merged.last._2, hi))
      else merged += ((lo, hi))
    }
    merged.toSeq
  }
}
