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

  test("longer cumulenes and malformed centers stay identity passthrough") {
    assert(Smiles.canonical("C=[C@]=C=C").contains("C=[C@]=C=C"))
    assert(Smiles.canonical("C[C@]=C=C").contains("C[C@]=C=C"))
  }

  test("achiral allene without flags is untouched") {
    assert(c("CC=C=CC") == c("C(C)=C=CC"))
    assert(!c("CC=C=CC").contains("@"))
  }
}
