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
}
