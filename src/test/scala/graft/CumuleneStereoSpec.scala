package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Smiles

/** Longer odd-cumulene axial stereo (r9 closes the last cumulene tier):
  * a `[C@]`/`[C@@]` on the CENTER of an odd cumulene (pentatetraene = 2
  * double bonds per side, heptahexaene = 3, ...) canonicalizes with
  * extended tetrahedral parity over the four substituents on the chain
  * TERMINI, exactly like allene. Marks off-center or on even cumulenes
  * stay identity passthrough; until this change ALL longer cumulenes
  * were passthrough.
  */
class CumuleneStereoSpec extends AnyFunSuite {

  private def c(s: String): String = Smiles.canonical(s).get

  test("pentatetraene: rewritings of one configuration unify") {
    val ref = c("NC(Br)=C=[C@]=C=C(O)C")
    // swapping the two far-end substituents in the writing is one
    // transposition = flag flips for the same configuration
    assert(c("NC(Br)=C=[C@@]=C=C(C)O") == ref)
    // read from the other end: blocks swap (even) + one within-end
    // transposition (odd) = flip
    assert(c("CC(O)=C=[C@@]=C=C(N)Br") == ref)
    // both pair orders reversed: two transpositions = even = same flag
    assert(c("BrC(N)=C=[C@]=C=C(C)O") == ref)
  }

  test("heptahexaene (3 doubles per side) canonicalizes too") {
    val ref = c("NC(Br)=C=C=[C@]=C=C=C(O)C")
    assert(ref.contains("@"))
    assert(c("CC(O)=C=C=[C@@]=C=C=C(N)Br") == ref)
    assert(c(ref) == ref, "not idempotent")
  }

  test("enantiomers canonicalize differently") {
    assert(c("NC(Br)=C=[C@]=C=C(O)C") != c("NC(Br)=C=[C@@]=C=C(O)C"))
    assert(c("CC=C=[C@]=C=CC") != c("CC=C=[C@@]=C=CC"))
  }

  test("implicit-H termini: phantom slot follows the preceder rule") {
    val ref = c("CC=C=[C@]=C=CC") // hepta-2,3,4,5-tetraene, one enantiomer
    // writing the first terminus with a branch moves its phantom from
    // slot 1 (after the preceder) to slot 0 = one transposition
    assert(c("C(C)=C=[C@@]=C=CC") == ref)
    assert(c("C(C)=C=[C@]=C=CC") != ref)
  }

  test("@AL1/@AL2 aliases apply to longer cumulenes") {
    assert(c("CC=C=[C@AL1]=C=CC") == c("CC=C=[C@]=C=CC"))
    assert(c("CC=C=[C@AL2]=C=CC") == c("CC=C=[C@@]=C=CC"))
  }

  test("two identical substituents on a terminus kill the axis") {
    assert(c("CC=C=[C@]=C=C(C)C") == c("CC=C=C=C=C(C)C"))
    assert(c("CC=C=[C@]=C=C(C)C") == c("CC=C=[C@@]=C=C(C)C"))
  }

  test("off-center and even-cumulene marks stay identity passthrough") {
    // pentatetraene marked on C2: walks 1 vs 3 — not the center
    assert(Smiles.canonical("CC=[C@]=C=C=CC").contains("CC=[C@]=C=C=CC"))
    // butatriene (even cumulene) has no axial center at all
    assert(Smiles.canonical("CC=[C@]=C=CC").contains("CC=[C@]=C=CC"))
    // a flag next to a single bond is not an axial candidate at all
    assert(Smiles.canonical("CC=C(C)[C@]=C=CC")
      .contains("CC=C(C)[C@]=C=CC"))
  }

  test("even-cumulene directional marks drop RDKit-style (merge with unmarked)") {
    // legacy perception assigns bond stereo only when BOTH immediate ends
    // of one double bond carry marks; butatriene's interior carbons can't,
    // so the marks serve nothing and are dropped — both marked writings
    // merge with the unmarked form, exactly like the reference's
    // canonicalizer. This is a deliberate, documented drop (the
    // never-drop passthrough guarantee covers ATOM stereo flags only).
    val plain = c("FC=C=C=CF")
    assert(c("F/C=C=C=C/F") == plain)
    assert(c("F/C=C=C=C\\F") == plain)
    assert(!plain.contains("/") && !plain.contains("\\"))
  }

  test("unflagged long cumulenes still canonicalize structurally") {
    assert(c("CC=C=C=C=CC") == c("C(C)=C=C=C=CC"))
    assert(!c("CC=C=C=C=CC").contains("@"))
  }

  test("coexists with tetrahedral centers and E/Z elsewhere") {
    val ref = c("N[C@@H](O)CC=C=[C@]=C=CC")
    // reading from the other end reverses the whole 4-substituent list —
    // an even permutation, so the same configuration keeps the same flag
    assert(c("CC=C=[C@]=C=CC[C@@H](N)O") == ref)
    assert(c("CC=C=[C@@]=C=CC[C@@H](N)O") != ref)
    assert(ref.count(_ == '@') >= 2)
  }

  test("randomized odd cumulenes: every writing unifies; enantiomers distinct") {
    import scala.util.Random
    import graft.extract.Smiles.{Atom, Bond, Mol}
    val rnd = new Random(20260815)
    val subElems = Vector("C", "N", "O", "F", "Cl", "Br")
    def hFor(el: String) = el match {
      case "C" => 3; case "N" => 2; case "O" => 1; case _ => 0 }
    // Build a (2L+1)-carbon cumulated chain, center flagged, then 1-2
    // substituents per terminus. Returns (mol, centerIdx, stereogenic).
    def randomCumulene(flag: Int, halfLen: Int): (Mol, Int, Boolean) = {
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
      // chain: t1, L-1 interiors, center, L-1 interiors, t2
      val t1 = add("C", 0)
      var prev = t1
      (1 until halfLen).foreach { _ =>
        val x = add("C", 0); link(prev, x, 2); prev = x
      }
      val ctr = add("C", 0, flag); link(prev, ctr, 2); prev = ctr
      (1 until halfLen).foreach { _ =>
        val x = add("C", 0); link(prev, x, 2); prev = x
      }
      val t2 = add("C", 0); link(prev, t2, 2)
      var stereogenic = true
      def subsFor(e: Int): Unit = {
        if (rnd.nextBoolean()) {
          val s1 = subElems(rnd.nextInt(subElems.length))
          val s2 = subElems(rnd.nextInt(subElems.length))
          if (s1 == s2) stereogenic = false
          val a1 = add(s1, hFor(s1)); link(e, a1, 1)
          val a2 = add(s2, hFor(s2)); link(e, a2, 1)
        } else {
          val s1 = subElems(rnd.nextInt(subElems.length))
          val a1 = add(s1, hFor(s1)); link(e, a1, 1)
          atoms(e) = atoms(e).copy(hCount = 1)
          val pos = rnd.nextInt(nbOrder(e).length + 1)
          nbOrder(e).insert(pos, -2 - e)
        }
      }
      subsFor(t1); subsFor(t2)
      (Mol(atoms.toVector, bonds.toVector,
        nbOrder.map(_.toVector).toVector), ctr, stereogenic)
    }
    var stereoTested = 0
    (1 to 120).foreach { k =>
      val flag = 1 + rnd.nextInt(2)
      val halfLen = 2 + (k % 2) // pentatetraene and heptahexaene tiers
      val (mol, ctr, stereogenic) = randomCumulene(flag, halfLen)
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
        val flip = Mol(
          mol.atoms.updated(ctr, mol.atoms(ctr).copy(chiral = 3 - flag)),
          mol.bonds, mol.nbOrder)
        val fc = Smiles.canonical(
          Smiles.emit(flip, rnd.shuffle((0 until n).toList).toArray)).get
        assert(fc != canon, s"enantiomers merged: $canon")
      } else {
        // a tied terminus cleans the flag: flagged == plain
        val plain = Mol(
          mol.atoms.updated(ctr, mol.atoms(ctr).copy(chiral = 0)),
          mol.bonds, mol.nbOrder)
        val pc = Smiles.canonical(
          Smiles.emit(plain, rnd.shuffle((0 until n).toList).toArray)).get
        assert(canon == pc, s"tied-terminus flag not cleaned: $canon vs $pc")
      }
    }
    assert(stereoTested > 50, s"only $stereoTested stereogenic cumulenes exercised")
  }
}
