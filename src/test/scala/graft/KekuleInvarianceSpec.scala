package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Smiles
import graft.extract.Smiles.{Atom, Bond, Mol}

/** Kekulé-writer invariance, mechanically exhaustive: parse a trusted
  * AROMATIC writing, enumerate EVERY perfect matching of its π system
  * (every kekulé assignment the molecule admits), emit each as a
  * kekulized SMILES, and assert all of them canonicalize to the same
  * string as the aromatic form. Hand-written kekulé test inputs cover
  * one or two matchings and miss the awkward ones — the r9
  * acenaphthylene split (one kekulé fully aromatized, the others kept
  * the bridge) was exactly a matching no hand case exercised. The
  * property is self-consistent: it certifies writer-invariance of
  * whatever graph the aromatic string denotes.
  */
class KekuleInvarianceSpec extends AnyFunSuite {

  /** Doubles needed by each atom in a kekulé assignment — the PRODUCTION
    * computation (Smiles.kekulizeNeed), shared so this spec enumerates
    * exactly the universe kekulize() solves. */
  private def needDouble(mol: Mol, i: Int): Int = Smiles.kekulizeNeed(mol, i)

  /** All perfect matchings of the need-1 aromatic atoms over aromatic
    * edges (bounded backtracking; these molecules are small). */
  private def matchings(mol: Mol): Seq[Set[(Int, Int)]] = {
    val need = mol.atoms.indices.map(i => needDouble(mol, i))
    assert(need.forall(n => n == 0 || n == 1),
      s"atom valence outside the kekulizable subset: $need")
    val want = mol.atoms.indices.filter(need(_) == 1).toSet
    def ek(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    val aromEdges = mol.bonds.filter(_.order == 4)
      .map(b => ek(b.a, b.b)).filter { case (a, b) => want(a) && want(b) }
    val adj = want.map(a => a ->
      aromEdges.collect { case (x, y) if x == a => y; case (x, y) if y == a => x }
    ).toMap
    val out = scala.collection.mutable.ListBuffer[Set[(Int, Int)]]()
    def go(free: Set[Int], acc: List[(Int, Int)]): Unit =
      if (out.size > 500) ()
      else if (free.isEmpty) { out += acc.toSet; () }
      else {
        val a = free.min
        adj(a).foreach { b =>
          if (free(b)) go(free - a - b, ek(a, b) :: acc)
        }
      }
    go(want, Nil)
    out.toList
  }

  /** One kekulized writing per matching: aromatic flags dropped, aromatic
    * bonds become 2 (matched) or 1, emitted over canonical ranks. */
  private def kekuleWritings(aromatic: String): Seq[String] = {
    val mol = Smiles.parseComponent(aromatic).get
    def ek(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    matchings(mol).map { m =>
      val kek = Mol(
        mol.atoms.map(_.copy(aromatic = false)),
        mol.bonds.map { b =>
          if (b.order == 4)
            Bond(b.a, b.b, if (m(ek(b.a, b.b))) 2 else 1)
          else b
        },
        mol.nbOrder)
      Smiles.emit(kek, Smiles.canonicalRanks(kek))
    }
  }

  private val battery: Seq[(String, String, Int)] = Seq(
    // name, trusted aromatic writing, minimum matchings expected
    ("benzene", "c1ccccc1", 2),
    ("pyridine", "c1ccncc1", 2),
    ("pyrrole", "c1cc[nH]c1", 1),
    ("furan", "c1ccoc1", 1),
    ("thiophene", "c1ccsc1", 1),
    ("naphthalene", "c1ccc2ccccc2c1", 3),
    ("azulene", "c1cc2cccccc2c1", 2),
    ("indole", "c1ccc2[nH]ccc2c1", 2),
    ("anthracene", "c1ccc2cc3ccccc3cc2c1", 4),
    ("phenanthrene", "c1ccc2ccc3ccccc3c2c1", 5),
    ("triphenylene", "c1ccc2c(c1)c1ccccc1c1ccccc21", 8),
    ("pyrene", "c1cc2ccc3cccc4ccc(c1)c2c34", 6),
    ("acenaphthylene", "C1=Cc2cccc3cccc1c23", 3),
    ("fluoranthene", "c1ccc2c(c1)-c1cccc3cccc2c13", 6),
    ("tropylium", "[cH+]1cccccc1", 1),
    ("pyridine N-oxide", "[O-][n+]1ccccc1", 2),
    ("2-pyridone", "O=c1cccc[nH]1", 1),
    ("biphenyl", "c1ccc(-c2ccccc2)cc1", 4),
    // larger polycycles (r9 sweep: every assignment unified, promoted
    // from probe to permanent battery — the per-ring pass with the
    // carbon-exocyclic gate plus the fused-pair perimeter pass covers
    // them; a regression toward needing 3+-ring unions fails here first)
    ("chrysene", "c1ccc2c(c1)ccc1c2ccc2ccccc21", 8),
    ("tetracene", "c1ccc2cc3cc4ccccc4cc3cc2c1", 5),
    ("perylene", "c1cc2cccc3c2c2c1cccc2c1ccccc31", 11),
    ("coronene", "c1cc2ccc3ccc4ccc5ccc6ccc1c1c2c3c4c5c61", 20),
    ("benzo[a]pyrene", "c1ccc2c(c1)cc1ccc3cccc4ccc2c1c34", 9),
    ("fluorene", "C1c2ccccc2-c2ccccc21", 4),
    ("biphenylene", "c1ccc2c(c1)-c1ccccc1-2", 4),
    ("acridine", "c1ccc2nc3ccccc3cc2c1", 4),
    ("carbazole", "c1ccc2c(c1)[nH]c1ccccc12", 4),
    ("dibenzofuran", "c1ccc2c(c1)oc1ccccc12", 4),
    ("dibenzothiophene", "c1ccc2c(c1)sc1ccccc12", 4),
    ("quinoline", "c1ccc2ncccc2c1", 3),
    ("purine", "c1ncc2[nH]cnc2n1", 2),
    // corannulene: hub 5-ring + five 6-rings — the canonical 3+-ring
    // combined-perimeter system (probed green late r9, promoted)
    ("corannulene", "c1cc2ccc3ccc4ccc5ccc1c1c2c3c4c51", 5))

  battery.foreach { case (name, arom, minM) =>
    test(s"$name: every kekulé assignment canonicalizes like the aromatic form") {
      val expect = Smiles.canonical(arom).get
      val keks = kekuleWritings(arom)
      assert(keks.size >= minM, s"only ${keks.size} matchings found")
      keks.foreach { k =>
        val got = Smiles.canonical(k)
        assert(got.contains(expect), s"kekulé writing $k -> $got != $expect")
      }
    }
  }
}
