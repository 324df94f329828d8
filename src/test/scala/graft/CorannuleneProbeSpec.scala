package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Smiles

/** Probe: corannulene (C20H10 — a hub 5-ring fused to five 6-rings, the
  * canonical 3+-ring combined-perimeter system). If every kekulé writing
  * unifies with the aromatic form, the per-ring + fused-pair passes cover
  * this class and corannulene graduates into KekuleInvarianceSpec's
  * permanent battery; if not, it documents the exact boundary.
  */
class CorannuleneProbeSpec extends AnyFunSuite {

  private val arom = "c1cc2ccc3ccc4ccc5ccc1c1c2c3c4c51"

  test("corannulene aromatic writing parses and canonicalizes") {
    val c = Smiles.canonical(arom)
    assert(c.nonEmpty)
    info(s"canonical: ${c.get}")
  }

  test("structure sanity: 20 carbons, 10 implicit H") {
    val mol = Smiles.parseComponent(arom).get
    assert(mol.atoms.length == 20)
    assert(mol.atoms.count(_.elem == "C") == 20)
    assert(mol.atoms.map(_.hCount).sum == 10)
    assert(mol.bonds.length == 25) // 20 atoms, 6 rings => E = V + R - 1
  }
}
