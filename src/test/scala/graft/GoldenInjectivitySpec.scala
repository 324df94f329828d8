package graft

import org.apache.spark.sql.functions._

import graft.extract.Smiles

/** Wrong-merge detector for the structural canonicalizer.
  *
  * The reference's golden extracted parquet carries RDKit-canonical SMILES
  * (extract/canonicalise.py:12-31 round-trips every molecule), so two
  * DISTINCT strings there are distinct molecules. Mapping two of them to the
  * same canonical output would be a wrong merge — the failure mode that
  * corrupts dictionaries, dedup and every frequency-derived result. The only
  * permitted collisions are the documented stereo boundaries (pseudo-
  * asymmetric r/s and allene flags are cleaned rather than kept): members of
  * a collision group must become IDENTICAL once stereo marks are deleted,
  * i.e. we may merge stereoisomer writings at a documented boundary but
  * never constitutionally different molecules.
  *
  * The same sweep checks formula preservation: the canonical output must
  * parse back to the same atom multiset (element, charge, isotope) and total
  * H count as its input — an emission that drops, duplicates, or mutates an
  * atom cannot pass.
  */
class GoldenInjectivitySpec extends SparkSpec {

  private val goldenDir =
    "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/extracted_ords"

  private def formula(s: String): Option[Map[(String, Int, Int), Int]] = {
    val parts = s.split("\\.", -1)
    val acc = scala.collection.mutable.Map[(String, Int, Int), Int]().withDefaultValue(0)
    parts.foreach { p =>
      Smiles.parseComponent(p) match {
        case None => return None
        case Some(mol) =>
          mol.atoms.foreach { a =>
            acc((a.elem, a.charge, a.isotope)) += 1
            acc(("H", 0, 0)) += a.hCount
          }
      }
    }
    Some(acc.toMap)
  }

  test("golden corpus: canonicalization never merges distinct molecules") {
    assume(new java.io.File(goldenDir).exists(), "reference checkout not present")
    val wide = spark.read.option("mergeSchema", "true").parquet(goldenDir)
    val molCols = wide.columns.filter(c => Seq(
      "reactant_", "agent_", "solvent_", "product_", "reagent_", "catalyst_")
      .exists(c.startsWith))
    val mols = wide
      .select(explode(array(molCols.map(col): _*)).as("m"))
      .filter(col("m").isNotNull && col("m") =!= "<missing>")
      .distinct()
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()

    // distinct RDKit-canonical input -> our canonical output (parseable only;
    // identity passthroughs map to themselves and cannot collide)
    val canon = mols.flatMap(m => Smiles.canonical(m).map(m -> _))
    assert(canon.length > 15000, s"only ${canon.length} molecules parsed")

    val collisions = canon.groupBy(_._2).filter(_._2.length > 1)
    def stripStereo(s: String): String =
      s.replaceAll("[@/\\\\]", "").replace("[CH]", "C") // [C@H] debracketizes
    val constitutional = collisions.filter { case (_, grp) =>
      grp.map(g => stripStereo(g._1)).distinct.length > 1
    }
    assert(constitutional.isEmpty,
      s"constitutional wrong merges: ${constitutional.take(5).map {
        case (c, grp) => s"${grp.map(_._1).mkString(" | ")} -> $c"
      }.mkString("; ")}")
    info(s"${canon.length} molecules, ${collisions.size} stereo-boundary collision groups")
    collisions.take(8).foreach { case (_, grp) =>
      info(s"  merged stereoisomer writings: ${grp.map(_._1).mkString("  |  ")}")
    }

    // formula preservation input -> canonical output. Identity passthroughs
    // (out == in: stereo the subset can't re-express, e.g. ring-digit
    // direction marks) are exempt — parseComponent rejects those inputs by
    // design, and an unchanged string cannot have mutated an atom.
    val broken = canon.filter { case (in, out) =>
      in != out && ((formula(in), formula(out)) match {
        case (Some(a), Some(b)) => a != b
        case _ => true // both sides of a real rewrite must parse
      })
    }
    assert(broken.isEmpty,
      s"formula not preserved: ${broken.take(5).map { case (i, o) => s"$i -> $o" }.mkString("; ")}")
  }
}
