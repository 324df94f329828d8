package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Smiles
import graft.extract.Smiles.{Atom, Bond, Mol}

/** Kekulé invariance for PERICONDENSED benzenoids built programmatically
  * on the honeycomb lattice (hexagon centers in doubled coordinates;
  * adjacent hexagons share one edge). Construction-from-geometry removes
  * any hand-written-SMILES transcription risk for the big systems, and
  * the enumeration harness is the same exhaustive-matching property as
  * KekuleInvarianceSpec. These are the 3+-ring combined-perimeter
  * systems of the r9 verdict: interior atoms, so no single ring nor any
  * one-edge fused pair sees the full π count in every kekulé.
  */
class PericondensedProbeSpec extends AnyFunSuite {

  /** Hexagon at doubled-coordinate center (x, y): its six corners. */
  private def corners(c: (Int, Int)): Vector[(Int, Int)] = {
    val (x, y) = c
    Vector((x, y + 2), (x + 1, y + 1), (x + 1, y - 1),
      (x, y - 2), (x - 1, y - 1), (x - 1, y + 1))
  }

  /** Benzenoid from hexagon centers: all-carbon, all-aromatic, H filled
    * to valence (1 on degree-2 corners, 0 on junctions). */
  private def benzenoid(centers: Seq[(Int, Int)]): Mol = {
    val verts = centers.flatMap(corners).distinct.sorted.toVector
    val idx = verts.zipWithIndex.toMap
    def ek(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    val edges = centers.flatMap { c =>
      val cs = corners(c)
      cs.indices.map(i => ek(idx(cs(i)), idx(cs((i + 1) % 6))))
    }.distinct
    val deg = new Array[Int](verts.length)
    edges.foreach { case (a, b) => deg(a) += 1; deg(b) += 1 }
    Mol(
      verts.indices.toVector.map(i =>
        Atom("C", aromatic = true, 0, 0, if (deg(i) == 2) 1 else 0, 0)),
      edges.toVector.map { case (a, b) => Bond(a, b, 4) })
  }

  /** Every perfect matching of the aromatic system (same universe as
    * KekuleInvarianceSpec, production kekulizeNeed). */
  private def matchings(mol: Mol): Seq[Set[(Int, Int)]] = {
    val need = mol.atoms.indices.map(i => Smiles.kekulizeNeed(mol, i))
    assert(need.forall(n => n == 0 || n == 1), s"bad valence: $need")
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
        adj(a).foreach { b => if (free(b)) go(free - a - b, ek(a, b) :: acc) }
      }
    go(want, Nil)
    out.toList
  }

  /** (aromatic writing, every kekulized writing). */
  private def writings(mol: Mol): (String, Seq[String]) = {
    def ek(a: Int, b: Int) = if (a < b) (a, b) else (b, a)
    val arom = Smiles.emit(mol, Smiles.canonicalRanks(mol))
    val keks = matchings(mol).map { m =>
      val kek = Mol(
        mol.atoms.map(_.copy(aromatic = false)),
        mol.bonds.map { b =>
          if (b.order == 4) Bond(b.a, b.b, if (m(ek(b.a, b.b))) 2 else 1)
          else b
        },
        mol.nbOrder)
      Smiles.emit(kek, Smiles.canonicalRanks(kek))
    }
    (arom, keks)
  }

  // doubled-coordinate hexagon centers; adjacency = centers differing by
  // (±2, 0) or (±1, ±3)
  private val systems: Seq[(String, Seq[(Int, Int)], Int)] = Seq(
    // name, hex centers, expected atom count
    ("pyrene (sanity: battery-green)",
      Seq((0, 0), (2, 0), (1, 3), (1, -3)), 16),
    ("coronene (sanity: battery-green)",
      Seq((0, 0), (2, 0), (-2, 0), (1, 3), (1, -3), (-1, 3), (-1, -3)), 24),
    ("anthanthrene (22C, 6 rings, two opposite peri extensions)",
      Seq((0, 0), (2, 0), (1, 3), (1, -3), (3, 3), (-1, -3)), 22),
    ("pyrene ladder (22C, 6 rings, 4 interior atoms)",
      Seq((0, 0), (2, 0), (1, 3), (1, -3), (3, 3), (2, 6)), 22),
    ("peropyrene-class (22C, 6 rings, pyrene fused to pyrene)",
      Seq((0, 0), (2, 0), (1, 3), (1, -3), (3, 3), (4, 0)), 22))

  test("phenalenyl frame (19C, odd): non-Kekulé system degrades to trusted flags") {
    // an odd-atom π frame has NO perfect matching — kekulize() must give
    // up and the aromatic writing canonicalize on its trusted flags
    val mol = benzenoid(Seq((0, 0), (2, 0), (1, 3), (1, -3), (3, 3)))
    assert(mol.atoms.length == 19)
    assert(matchings(mol).isEmpty)
    val arom = Smiles.emit(mol, Smiles.canonicalRanks(mol))
    val c = Smiles.canonical(arom)
    assert(c.isDefined && c.get.contains("c"), s"aromatic flags lost: $c")
  }

  systems.foreach { case (name, centers, nAtoms) =>
    test(s"$name: every kekulé writing unifies with the aromatic writing") {
      val mol = benzenoid(centers)
      assert(mol.atoms.length == nAtoms,
        s"lattice construction drifted: ${mol.atoms.length} atoms")
      val (arom, keks) = writings(mol)
      val expect = Smiles.canonical(arom)
      assert(expect.isDefined, s"aromatic writing failed to parse: $arom")
      assert(keks.nonEmpty, "no perfect matching — not a closed-shell benzenoid")
      val bad = keks.flatMap { k =>
        val got = Smiles.canonical(k)
        if (got == expect) None else Some(s"$k -> $got")
      }
      assert(bad.isEmpty,
        s"${bad.size}/${keks.size} kekulé writings split from $expect:\n" +
          bad.take(3).mkString("\n"))
    }
  }
}
