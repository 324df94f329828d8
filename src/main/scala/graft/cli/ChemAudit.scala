package graft.cli

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.extract.{OrdSource, Smiles}

/** One-off corpus audit of the canonicalizer's documented boundary
  * envelope (r13 verdict #5): how many REAL molecules hit each
  * identity-passthrough / claim-trusted branch that the Chemistry TODO
  * section records only as a possibility? Runs
  * [[Smiles.boundaryClasses]] over every molecule-level SMILES in the 12
  * golden ORD test files (component + product SMILES identifiers, itype
  * 2 — the exact population the reference's RDKit round-trip
  * canonicalises, orderly/extract/canonicalise.py:12-72) and over the
  * solvents.csv dimension, and prints per-class counts with up to three
  * sample strings each. A class at ~0 closes its boundary empirically; a
  * class above ~0.1% of molecules is the next extension candidate.
  *
  * Usage: ChemAudit [ordDir] [solventsCsv] — or set SPARK_GRAFT_ORD_DIR /
  * SPARK_GRAFT_SOLVENTS_CSV (no machine-specific paths baked into the
  * binary; the audited corpus is always an explicit input).
  */
object ChemAudit {
  def main(args: Array[String]): Unit = {
    val ordDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_ORD_DIR"))
      .getOrElse(sys.error(
        "ChemAudit: pass ordDir as arg 1 or set SPARK_GRAFT_ORD_DIR"))
    val solventsCsv = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SOLVENTS_CSV"))
      .getOrElse(sys.error(
        "ChemAudit: pass solventsCsv as arg 2 or set SPARK_GRAFT_SOLVENTS_CSV"))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nested = OrdSource.readNested(spark, ordDir)
    def smilesOfIds(ids: org.apache.spark.sql.Column) =
      try_element_at(filter(ids, i => i.getField("itype") === 2), lit(1))
        .getField("value")
    val compSmiles = nested.select(explode(flatten(
        transform(col("inputs"), e => e.getField("components")))).as("c"))
      .select(smilesOfIds(col("c.ids")).as("smiles"))
    val prodSmiles = nested.select(explode(col("products")).as("p"))
      .select(smilesOfIds(col("p.ids")).as("smiles"))
    val solvSmiles = spark.read.option("header", "true").csv(solventsCsv)
      .select(col("smiles"))
    val all = compSmiles.unionByName(prodSmiles).unionByName(solvSmiles)
      .filter(col("smiles").isNotNull && col("smiles") =!= "")
      .as[String]

    val total = all.count()
    val distinctMols = all.distinct().count()
    // per-COMPONENT classes: molecule-level SMILES may be multi-component
    val hits = all.flatMap(s =>
        Smiles.boundaryClasses(s).map(c => (c, s)))
      .toDF("cls", "smiles")
    val counts = hits.groupBy("cls")
      .agg(count(lit(1)).as("n"),
        slice(collect_set(col("smiles")), 1, 3).as("samples"))
      .orderBy(col("n").desc)
      .as[(String, Long, Seq[String])].collect()

    println(s"[chem-audit] molecules_total=$total distinct=$distinctMols")
    if (counts.isEmpty) println("[chem-audit] no boundary class hit — envelope empirically closed on this corpus")
    counts.foreach { case (cls, n, samples) =>
      println(f"[chem-audit] $cls n=$n (${100.0 * n / total}%.4f%% of molecules) samples=${samples.mkString(" | ")}")
    }
    spark.stop()
  }
}
