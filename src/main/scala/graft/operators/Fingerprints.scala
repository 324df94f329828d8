package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.extract.Chemistry

/** F1/F2 — the gen_fp stage (gen_fp/fingerprints.py:37-99): per-molecule
  * fingerprints and the reaction-difference feature matrix.
  *
  * Reference shape: numpy vstack of the whole dataset in RAM. Spark shape:
  * a narrow projection producing `array<int>` columns written to parquet —
  * no driver materialization, linear scan, scales to any row count. The
  * fingerprint kernel itself is pluggable [[Chemistry]] (RDKit Morgan in a
  * real deployment, stable-hash stand-in for engine tests).
  */
object Fingerprints {

  /** F2 — elementwise difference fingerprint:
    * product_fp − reactant0_fp − reactant1_fp (fingerprints.py:58-74). */
  def diffFp(product: Column, r0: Column, r1: Column): Column =
    zip_with(zip_with(product, r0, (a, b) => a - b), r1, (a, b) => a - b)

  /** The gen_fp output: concat(product_fp, diff_fp) per reaction over
    * (product_000, reactant_000, reactant_001), null molecules → zero
    * vector (fingerprints.py:46-54, 76-99). */
  def reactionFingerprints(df: DataFrame, chem: Chemistry, nBits: Int): DataFrame = {
    def fpOrZero(c: Column): Column =
      when(c.isNotNull, chem.fingerprint(c, nBits))
        .otherwise(array_repeat(lit(0), nBits))
    val p = fpOrZero(try_element_at(col("products"), lit(1)))
    val r0 = fpOrZero(try_element_at(col("reactants"), lit(1)))
    val r1 = fpOrZero(try_element_at(col("reactants"), lit(2)))
    df.select(
      col("original_index"),
      concat(p, diffFp(p, r0, r1)).as("fp"))
  }
}
