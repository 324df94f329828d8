package graft

import scala.util.Random

import graft.extract.Smiles
import graft.extract.Smiles.{Atom, Bond, Mol}

/** Property-style stress test of the canonicalizer: hundreds of RANDOM
  * molecular graphs — trees with optional ring edges, valence-checked
  * double bonds, random tetrahedral flags and E/Z marks — each emitted
  * under many random atom permutations. Every alternative writing must
  * canonicalize to one string, and that string must be idempotent. This
  * exercises the parser/rank/emission parity chain over a much larger
  * space than the curated corpus in SmilesSpec.
  */
class SmilesPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val valence = Map("C" -> 4, "N" -> 3, "O" -> 2)

  /** Build a random chemically-consistent Mol. */
  private def randomMol(rnd: Random): Mol = {
    val n = 4 + rnd.nextInt(9) // 4..12 atoms
    val elems = Vector.fill(n)(Seq("C", "C", "C", "N", "O")(rnd.nextInt(5)))
    // random tree: parent chosen among atoms with spare valence
    val bonds = collection.mutable.ArrayBuffer[Bond]()
    val used = Array.fill(n)(0)
    (1 until n).foreach { i =>
      val candidates = (0 until i).filter(p => used(p) < valence(elems(p)))
      val p = if (candidates.isEmpty) i - 1 else candidates(rnd.nextInt(candidates.length))
      bonds += Bond(p, i, 1)
      used(p) += 1; used(i) += 1
    }
    // optional ring edge between distant atoms with spare valence
    if (rnd.nextBoolean()) {
      val spare = (0 until n).filter(a => used(a) < valence(elems(a)))
      if (spare.length >= 2) {
        val a = spare(rnd.nextInt(spare.length))
        val b = spare(rnd.nextInt(spare.length))
        val already = bonds.exists(bd =>
          (bd.a == a && bd.b == b) || (bd.a == b && bd.b == a))
        if (a != b && !already) { bonds += Bond(a, b, 1); used(a) += 1; used(b) += 1 }
      }
    }
    // upgrade some bonds to double where valence allows
    val ringEdgeIdx = bonds.length - 1
    bonds.indices.foreach { i =>
      val bd = bonds(i)
      if (rnd.nextDouble() < 0.3 &&
        used(bd.a) < valence(elems(bd.a)) && used(bd.b) < valence(elems(bd.b))) {
        bonds(i) = bd.copy(order = 2)
        used(bd.a) += 1; used(bd.b) += 1
      }
    }
    val degree = Array.fill(n)(0)
    bonds.foreach { bd => degree(bd.a) += 1; degree(bd.b) += 1 }
    val hCount = Array.tabulate(n)(a => valence(elems(a)) - used(a))
    // random tetrahedral flags on 3/4-connected carbons (meaningless ones
    // must be CLEANED deterministically, so invariance holds either way)
    val chiral = Array.tabulate(n) { a =>
      val conns = degree(a) + hCount(a)
      if (elems(a) == "C" && conns == 4 && degree(a) >= 3 && rnd.nextDouble() < 0.4)
        1 + rnd.nextInt(2)
      else 0
    }
    // random E/Z marks on ACYCLIC double bonds (ring-bond marks are
    // exercised separately by the macrocycle test below, which controls
    // ring size across the ezCapable boundary): one substituent bond per
    // end
    def isRingEdge(i: Int) =
      i == ringEdgeIdx && bonds.length == n // ring edge exists iff extra bond
    bonds.zipWithIndex.foreach { case (db, di) =>
      if (db.order == 2 && !isRingEdge(di) && rnd.nextDouble() < 0.5) {
        def pickSub(e: Int, other: Int): Option[Int] =
          rnd.shuffle(bonds.zipWithIndex.toList).collectFirst {
            case (sb, si) if sb.order == 1 && sb.dir == 0 && !isRingEdge(si) &&
              ((sb.a == e && sb.b != other) || (sb.b == e && sb.a != other)) => si
          }
        (pickSub(db.a, db.b), pickSub(db.b, db.a)) match {
          case (Some(i1), Some(i2)) if i1 != i2 =>
            bonds(i1) = bonds(i1).copy(dir = if (rnd.nextBoolean()) 1 else -1)
            bonds(i2) = bonds(i2).copy(dir = if (rnd.nextBoolean()) 1 else -1)
          case _ => ()
        }
      }
    }
    val atoms = Vector.tabulate(n)(a =>
      Atom(elems(a), aromatic = false, 0, 0, hCount(a), 0, chiral(a)))
    // fabricated "written" neighbor order: bond insertion order, phantom
    // slot first for 3-connected chiral atoms (any consistent convention
    // is a valid ground truth for the parity chain)
    val nbOrder = {
      val m = Vector.fill(n)(collection.mutable.ArrayBuffer[Int]())
      bonds.foreach { bd => m(bd.a) += bd.b; m(bd.b) += bd.a }
      Vector.tabulate(n) { a =>
        if (chiral(a) != 0 && degree(a) == 3) (-1 +: m(a)).toVector
        else m(a).toVector
      }
    }
    Mol(atoms, bonds.toVector, nbOrder)
  }

  test("random molecules: every writing canonicalizes to one idempotent string") {
    val rnd = new Random(20260812)
    var tested = 0
    (1 to 400).foreach { _ =>
      val mol = randomMol(rnd)
      val n = mol.atoms.length
      val first = Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)
      Smiles.canonical(first) match {
        case None =>
          fail(s"generated molecule failed to parse: $first")
        case Some(canon) if canon == first && first.exists("/\\@".contains(_)) =>
          // identity passthrough (e.g. stereo the subset can't re-express
          // from THIS writing) — skip: different writings may not unify
          ()
        case Some(canon) =>
          tested += 1
          assert(Smiles.canonical(canon).contains(canon), s"not idempotent: $canon")
          (1 to 8).foreach { _ =>
            val alt = Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)
            val back = Smiles.canonical(alt)
            assert(back.contains(canon),
              s"writing $alt of $first canonicalized to $back, expected $canon")
          }
      }
    }
    assert(tested > 200, s"only $tested non-passthrough molecules exercised")
  }

  /** In-ring E/Z across the ezCapable boundary: a plain carbocycle of size
    * 6..14 with one stereo-marked double bond. Every random writing of one
    * geometry (including writings where the marked bond lands on a
    * ring-closure digit) must canonicalize to ONE string; below ring size
    * 8 the marks must drop (marked ≡ unmarked); at 8+ the two geometries
    * must stay distinct.
    */
  test("macrocycle E/Z: writings unify, size-8 boundary, geometries distinct") {
    val rnd = new Random(20260813)
    def ringMol(n: Int, d1: Int, d2: Int): Mol = {
      // cycle 0-1-...-(n-1)-0; double bond 0=1; marks on bonds 1-2 and (n-1)-0
      val bonds = Vector.tabulate(n) { i =>
        val j = (i + 1) % n
        val order = if (i == 0) 2 else 1
        val dir = if (i == 1) d1 else if (i == n - 1) d2 else 0
        Bond(i, j, order, dir)
      }
      val used = Array.fill(n)(2); used(0) += 1; used(1) += 1
      val atoms = Vector.tabulate(n)(a =>
        Atom("C", aromatic = false, 0, 0, 4 - used(a), 0))
      val nbOrder = {
        val m = Vector.fill(n)(collection.mutable.ArrayBuffer[Int]())
        bonds.foreach { bd => m(bd.a) += bd.b; m(bd.b) += bd.a }
        Vector.tabulate(n)(a => m(a).toVector)
      }
      Mol(atoms, bonds, nbOrder)
    }
    (6 to 14).foreach { n =>
      val geomA = ringMol(n, 1, 1)
      val geomB = ringMol(n, 1, -1) // one mark flipped = other isomer
      val plain = ringMol(n, 0, 0)
      def canonOf(mol: Mol): String = {
        val writings = (1 to 12).map { _ =>
          Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)
        }
        val canons = writings.map(w => Smiles.canonical(w).getOrElse(
          fail(s"ring($n) writing failed to parse: $w")))
        assert(canons.distinct.size == 1,
          s"ring($n) writings did not unify: ${writings.zip(canons).distinct}")
        // canonical form is a fixpoint
        assert(Smiles.canonical(canons.head).contains(canons.head))
        canons.head
      }
      val (ca, cb, cp) = (canonOf(geomA), canonOf(geomB), canonOf(plain))
      if (n < 8) {
        assert(ca == cp && cb == cp,
          s"ring($n) < 8: marks must drop, got $ca / $cb vs plain $cp")
      } else {
        assert(ca != cb, s"ring($n): geometries merged: $ca")
        assert(!cp.contains("/") && !cp.contains("\\"))
      }
    }
  }
}
