package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Smiles

/** Allene axial stereo ([C@]/[C@@] with two double bonds, the @AL1/@AL2
  * aliases): every writing of one axial configuration must canonicalize
  * to one string, the two enantiomers must stay distinct, and a center
  * with two identical substituents on either end is not stereogenic.
  * Until r9 these inputs were identity passthrough.
  */
class AlleneStereoSpec extends AnyFunSuite {

  private def c(s: String): String = Smiles.canonical(s).get

  test("explicit-substituent allene: rewritings of one configuration unify") {
    val ref = c("NC(Br)=[C@]=C(O)C")
    // swap the two far-end substituents in the writing = one transposition
    // = the flag flips for the same configuration
    assert(c("NC(Br)=[C@@]=C(C)O") == ref)
    // read from the other end: blocks swap (even) + one within-end
    // transposition (odd) = flip
    assert(c("CC(O)=[C@@]=C(N)Br") == ref)
    // other-end reading with end1's pair order kept: block swap (even) +
    // one reversed pair (odd) = flip again
    assert(c("OC(C)=[C@@]=C(Br)N") == ref)
  }

  test("enantiomers canonicalize differently") {
    assert(c("NC(Br)=[C@]=C(O)C") != c("NC(Br)=[C@@]=C(O)C"))
    assert(c("CC=[C@]=CC") != c("CC=[C@@]=CC"))
  }

  test("implicit-H ends: phantom slot follows the preceder rule") {
    val ref = c("CC=[C@]=CC") // penta-2,3-diene, one enantiomer
    // writing the first end with a branch moves its phantom from slot 1
    // (after the preceder) to slot 0 (no preceder) = one transposition
    assert(c("C(C)=[C@@]=CC") == ref)
    // a TRAILING branch is order-neutral (=C(C) reads like =CC), so the
    // branch form equals the plain form with the same flag — here the
    // OTHER enantiomer
    assert(c("C(C)=[C@]=C(C)") == c("CC=[C@@]=CC"))
    assert(c("C(C)=[C@]=C(C)") != ref)
  }

  test("@AL1/@AL2 named classes read as @/@@ aliases") {
    assert(c("CC=[C@AL1]=CC") == c("CC=[C@]=CC"))
    assert(c("CC=[C@AL2]=CC") == c("CC=[C@@]=CC"))
    assert(c("NC(Br)=[C@AL1]=C(O)C") == c("NC(Br)=[C@]=C(O)C"))
  }

  test("named class on the WRONG geometry degrades to passthrough, never merges") {
    // @AL on a 4-connected tetrahedral atom: the shape assertion fails —
    // identity passthrough, NOT silently canonicalized as @TH1
    assert(c("C[C@AL1](N)(O)F") == "C[C@AL1](N)(O)F")
    assert(c("C[C@AL2](N)(O)F") == "C[C@AL2](N)(O)F")
    assert(c("C[C@AL1](N)(O)F") != c("C[C@](N)(O)F"))
    // @AL on a 3-connected (implicit-H) tetrahedral atom likewise
    assert(c("C[C@AL1](N)O") == "C[C@AL1](N)O")
    assert(c("C[C@AL1](N)O") != c("C[C@](N)O"))
    // @TH on a cumulene axial center: same degradation the other way
    assert(c("CC=[C@TH1]=CC") == "CC=[C@TH1]=CC")
    assert(c("CC=[C@TH1]=CC") != c("CC=[C@]=CC"))
    assert(c("NC(Br)=[C@TH2]=C(O)C") == "NC(Br)=[C@TH2]=C(O)C")
    // correctly-shaped named classes still canonicalize (not passthrough)
    assert(c("C[C@TH1](N)(O)F") == c("C[C@](N)(O)F"))
    assert(c("CC=[C@AL1]=CC") != "CC=[C@AL1]=CC")
  }

  test("idempotence: canonical of canonical is canonical") {
    for (s <- Seq("NC(Br)=[C@]=C(O)C", "CC=[C@]=CC", "CC=[C@@]=CC")) {
      val k = c(s)
      assert(c(k) == k, s"not idempotent for $s -> $k")
    }
  }

  test("two identical substituents on an end kill the axis") {
    assert(c("CC=[C@]=C(C)C") == c("CC=C=C(C)C"))
    assert(c("CC=[C@]=C(C)C") == c("CC=[C@@]=C(C)C"))
  }

  test("even cumulenes and malformed centers stay identity passthrough") {
    // mark on C2 of butatriene: walks are 1 vs 2 steps — off-center
    assert(Smiles.canonical("C=[C@]=C=C").contains("C=[C@]=C=C"))
    assert(Smiles.canonical("C[C@]=C=C").contains("C[C@]=C=C"))
  }

  test("randomized allenes: every writing unifies; enantiomers distinct; symmetric ends clean") {
    import scala.util.Random
    import graft.extract.Smiles.{Atom, Bond, Mol}
    val rnd = new Random(20260814)
    val subElems = Vector("C", "N", "O", "F", "Cl", "Br")
    // Build: end1=0, center=1, end2=2, then 1-2 substituent atoms per end.
    // Returns the Mol plus whether both ends are stereogenic.
    def randomAllene(flag: Int, forceSymmetricEnd: Boolean): (Mol, Boolean) = {
      val atoms = collection.mutable.ArrayBuffer[Atom]()
      val bonds = collection.mutable.ArrayBuffer[Bond]()
      val nbOrder = collection.mutable.ArrayBuffer[collection.mutable.ArrayBuffer[Int]]()
      def add(elem: String, h: Int, chiral: Int = 0): Int = {
        atoms += Atom(elem, aromatic = false, 0, 0, h, 0, chiral)
        nbOrder += collection.mutable.ArrayBuffer[Int]()
        atoms.length - 1
      }
      def link(a: Int, b: Int, o: Int): Unit = {
        bonds += Bond(a, b, o); nbOrder(a) += b; nbOrder(b) += a
      }
      val e1 = add("C", 0); val c = add("C", 0, flag); val e2 = add("C", 0)
      link(e1, c, 2); link(c, e2, 2)
      var stereogenic = true
      def subsFor(e: Int, symmetric: Boolean): Unit = {
        val two = rnd.nextBoolean()
        if (two) {
          val s1 = subElems(rnd.nextInt(subElems.length))
          val s2 = if (symmetric) s1
            else subElems((subElems.indexOf(s1) + 1 + rnd.nextInt(subElems.length - 1)) % subElems.length)
          if (s1 == s2) stereogenic = false
          def hFor(el: String) = el match {
            case "C" => 3; case "N" => 2; case "O" => 1; case _ => 0 }
          val a1 = add(s1, hFor(s1)); link(e, a1, 1)
          val a2 = add(s2, hFor(s2)); link(e, a2, 1)
        } else {
          // one explicit sub + implicit H phantom (always distinguishable)
          val s1 = subElems(rnd.nextInt(subElems.length))
          def hFor(el: String) = el match {
            case "C" => 3; case "N" => 2; case "O" => 1; case _ => 0 }
          val a1 = add(s1, hFor(s1)); link(e, a1, 1)
          atoms(e) = atoms(e).copy(hCount = 1)
          // phantom at a random valid slot — any consistent position is a
          // legitimate ground-truth written order
          val pos = rnd.nextInt(nbOrder(e).length + 1)
          nbOrder(e).insert(pos, -2 - e)
        }
      }
      subsFor(e1, symmetric = false)
      subsFor(e2, symmetric = forceSymmetricEnd)
      (Mol(atoms.toVector, bonds.toVector, nbOrder.map(_.toVector).toVector),
        stereogenic)
    }
    var stereoTested = 0
    (1 to 150).foreach { _ =>
      val flag = 1 + rnd.nextInt(2)
      val (mol, stereogenic) = randomAllene(flag, forceSymmetricEnd = false)
      val n = mol.atoms.length
      val canon = Smiles.canonical(
        Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)).get
      assert(Smiles.canonical(canon).contains(canon), s"not idempotent: $canon")
      (1 to 6).foreach { _ =>
        val alt = Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)
        assert(Smiles.canonical(alt).contains(canon),
          s"writing $alt canonicalized away from $canon")
      }
      if (stereogenic) {
        stereoTested += 1
        val (flip, _) = (Mol(
          mol.atoms.updated(1, mol.atoms(1).copy(chiral = 3 - flag)),
          mol.bonds, mol.nbOrder), ())
        val fc = Smiles.canonical(
          Smiles.emit(flip, rnd.shuffle((0 until n).toList).toArray)).get
        assert(fc != canon, s"enantiomers merged: $canon")
      }
    }
    assert(stereoTested > 60, s"only $stereoTested stereogenic allenes exercised")
    // symmetric second end: flag must clean to the unflagged form
    (1 to 40).foreach { _ =>
      val (mol, _) = randomAllene(1 + rnd.nextInt(2), forceSymmetricEnd = true)
      if (mol.atoms.count(_.elem != "H") == mol.atoms.length &&
          mol.nbOrder(2).count(_ >= 0) == 3) { // end2 has two explicit subs
        val subs = mol.nbOrder(2).filter(x => x >= 0 && x != 1)
        if (subs.length == 2 &&
            mol.atoms(subs(0)).elem == mol.atoms(subs(1)).elem) {
          val n = mol.atoms.length
          val flagged = Smiles.canonical(
            Smiles.emit(mol, rnd.shuffle((0 until n).toList).toArray)).get
          val plain = Mol(mol.atoms.updated(1, mol.atoms(1).copy(chiral = 0)),
            mol.bonds, mol.nbOrder)
          val pc = Smiles.canonical(
            Smiles.emit(plain, rnd.shuffle((0 until n).toList).toArray)).get
          assert(flagged == pc, s"symmetric-end flag not cleaned: $flagged vs $pc")
        }
      }
    }
  }

  test("achiral allene without flags is untouched") {
    assert(c("CC=C=CC") == c("C(C)=C=CC"))
    assert(!c("CC=C=CC").contains("@"))
  }
}
