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
}
