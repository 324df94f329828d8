package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ArrayOps

/** C1 + the wide→array source codec: load the reference's numbered-column
  * parquet layout (`reactant_000, …`, SURVEY.md §1.2) into the array-typed
  * working representation (§7.1), unifying ragged per-file schemas the way
  * the reference's merge does (clean/cleaner.py:98-135: concat + fillna
  * sentinel + back to null).
  *
  * `mergeSchema=true` performs the reference's width unification at scan
  * time; `original_index` lineage comes from a window over
  * (file, row-position) — deterministic, unlike monotonically_increasing_id
  * across repartitions.
  */
object ReactionTable {

  val componentPrefixes = Seq("reactant", "agent", "reagent", "solvent",
    "catalyst", "product")

  private def widthOf(df: DataFrame, prefix: String): Seq[String] =
    df.columns.filter(_.matches(s"${prefix}_\\d{3}")).sorted.toSeq

  /** Collapse `prefix_nnn` columns into one clean array (sentinel/null
    * dropped); products keep their yields aligned through the collapse. */
  def fromWide(spark: SparkSession, wide: DataFrame): DataFrame = {
    var df = wide
    val prodCols = widthOf(df, "product")
    val yieldCols = widthOf(df, "yield")

    componentPrefixes.filterNot(_ == "product").foreach { p =>
      val cols = widthOf(df, p)
      df = df.withColumn(s"${p}s",
        if (cols.isEmpty) array().cast("array<string>")
        else ArrayOps.fromWide(cols.map(col)))
    }
    // products + yields: aligned collapse (E16 discipline)
    val prodArr =
      if (prodCols.isEmpty) array().cast("array<string>")
      else array(prodCols.map(col): _*)
    val yieldArr =
      if (yieldCols.isEmpty) array().cast("array<double>")
      else array(yieldCols.map(c => col(c).cast("double")): _*)
    val padded = concat(yieldArr,
      array_repeat(lit(null).cast("double"),
        greatest(lit(0), (size(prodArr) - size(yieldArr)).cast("int"))))
    val zipped = filter(
      zip_with(prodArr, padded, (p, y) => struct(p.as("p"), y.as("y"))),
      z => z.getField("p").isNotNull && z.getField("p") =!= "<missing>")
    df = df
      .withColumn("products", transform(zipped, z => z.getField("p")))
      .withColumn("yields", transform(zipped, z => z.getField("y")))

    df.drop((componentPrefixes.flatMap(p => widthOf(wide, p)) ++ yieldCols): _*)
  }

  /** Load a directory of per-file extracted parquet (ragged widths) into
    * one array-typed reaction table with `original_index` lineage. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val wide = spark.read.option("mergeSchema", "true").parquet(dir)
    val arr = fromWide(spark, wide)
    // replace the reference's sentinel with null in scalar string columns
    val restored = Seq("rxn_str", "procedure_details", "extracted_from_file")
      .filter(arr.columns.contains)
      .foldLeft(arr)((d, c) =>
        d.withColumn(c, when(col(c) === "<missing>", lit(null)).otherwise(col(c))))
    addOriginalIndex(restored)
  }

  /** Deterministic `original_index` without a global single-partition sort:
    * per-file row numbers (parallel windows) plus a broadcast per-file
    * offset computed from the (tiny) per-file counts — the scalable version
    * of the reference's running row number (clean/cleaner.py:112-114). */
  def addOriginalIndex(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byFile = Window.partitionBy("extracted_from_file")
      .orderBy("rxn_str", "original_order_key")
    val keyed = df.withColumn("original_order_key",
      md5(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*)))
    val counts = keyed.groupBy("extracted_from_file")
      .agg(count(lit(1)).as("__n"))
      .orderBy("extracted_from_file")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (counts.isEmpty)
      return keyed.withColumn("original_index", lit(0L))
        .drop("original_order_key").filter(lit(false))
    val offsets = counts.scanLeft(("", 0L)) { case ((_, acc), (f, n)) =>
      (f, acc + n)
    }.sliding(2).map { case Array((_, off), (f, _)) => (f, off) }.toSeq
    // Broadcast join on the per-file offset table (one row per file): at
    // real ORD scale (100k+ files) a when-chain literal would be a 100k-deep
    // expression tree; the join stays a single BroadcastHashJoin.
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toDF("__file", "__off")
    keyed
      .join(broadcast(offDf), keyed("extracted_from_file") <=> offDf("__file"), "left")
      .withColumn("original_index",
        coalesce(col("__off"), lit(0L)) + row_number().over(byFile) - 1)
      .drop("original_order_key", "__file", "__off")
  }
}
