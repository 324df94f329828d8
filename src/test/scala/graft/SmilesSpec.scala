package graft

import scala.util.Random

import graft.extract.Smiles

/** Structural canonicalization: equivalent writings of the same molecular
  * graph — different atom orders, ring numberings, branch orders — must
  * produce one canonical string. The strongest check is the randomized
  * rewriter: emitting the parsed graph under MANY random rank permutations
  * produces many valid alternative SMILES, and every one must canonicalize
  * back to the same string.
  */
class SmilesSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val molecules = Seq(
    "CCO", "CC(C)O", "CC(N)C(=O)O", "C1CCCCC1", "c1ccccc1", "c1ccncc1",
    "CC(=O)Oc1ccccc1C(=O)O", // aspirin
    "C1CC2CCC1CC2", // bridged bicycle
    "O=C(O)c1ccccc1", "N#Cc1ccccc1", "ClC(Cl)(Cl)Cl",
    "[NH4+]", "[13CH3]O", "[O-]C(=O)C", "[Fe+2]", "[Pd]",
    "CC[N+](C)(C)CC", "C%10CCCCC%10", "O.CCO", "[CH2:5]=[CH:6]C",
    // kekulized aromatics (must unify with the lowercase forms above)
    "C1=CC=CC=C1", "C1=CC=CN1", "C1=CC2=CC=CC=C2C=C1",
    "CC(=O)OC1=CC=CC=C1C(=O)O",
    // 7-ring aromatics (r8): tropylium + azulene, kekulé and aromatic
    "C1=CC=CC=C[CH+]1", "[cH+]1cccccc1", "C1=CC2=CC=CC=CC2=C1",
    "c1cc2cccccc2c1",
    // genuinely non-aromatic unsaturated rings (must NOT aromatize)
    "O=C1C=CC(=O)C=C1", "C1=CCCCC1",
    // tetrahedral stereo: chain, ring-closure, first-atom, lone-pair forms,
    // a cleaned non-stereocenter, and the meso/chiral diol pair
    "C[C@H](N)O", "N[C@@H](C)C(=O)O", "O[C@H]1CCCC1", "C[C@H]1CCCO1",
    "[C@](F)(Cl)(Br)I", "CC[S@](=O)C",
    "C[C@H](O)[C@H](O)C", "C[C@H](O)[C@@H](O)C",
    // pentane-2,3,4-triol: pseudo-asymmetric C3 (meso forms keep r/s;
    // chiral form cleans C3)
    "C[C@H](O)[C@@H](O)[C@H](O)C", "C[C@H](O)[C@H](O)[C@H](O)C",
    "C[C@H](O)[C@@H](O)[C@@H](O)C",
    // E/Z: simple trans/cis, trisubstituted, conjugated diene, styrene-like
    "F/C=C/F", "C/C=C\\C", "C/C(F)=C/Br", "C/C=C/C=C/C",
    "c1ccccc1/C=C/C",
    // axial cumulenes (late r9): allene, pentatetraene, and unflagged;
    // then the descriptor-interplay combos — tetrahedral + axial,
    // E/Z + axial, and all three stereo kinds in one molecule
    "NC(Br)=[C@]=C(O)C", "NC(Br)=C=[C@]=C=C(O)C", "CC=C=[C@]=C=CC",
    "CC=C=C=C=CC",
    "N[C@@H](O)CC=C=[C@]=C=CC",
    "F/C=C/CC=C=[C@]=C=CC",
    "F/C=C/C[C@H](O)C=[C@]=CC")

  test("equivalent writings unify") {
    def c(s: String) = Smiles.canonical(s).get
    assert(c("OCC") == c("CCO"))
    assert(c("C(C)O") == c("CCO"))
    assert(c("C1CCCCC1") == c("C2CCCCC2"))
    assert(c("C1CCCCC1") == c("C%12CCCCC%12"))
    assert(c("c1ccncc1") == c("n1ccccc1"))
    assert(c("CC(N)O") == c("CC(O)N"))
    assert(c("O.CCO") == c("CCO.O"))
    assert(c("[CH3]C") == c("C[CH3]"))
  }

  test("kekulized and aromatic writings unify") {
    def c(s: String) = Smiles.canonical(s).get
    assert(c("C1=CC=CC=C1") == c("c1ccccc1")) // benzene
    assert(c("C1=CC=NC=C1") == c("c1ccncc1")) // pyridine
    assert(c("C1=CC=CN1") == c("c1cc[nH]c1")) // pyrrole
    assert(c("C1=CC=CO1") == c("c1ccoc1")) // furan
    assert(c("C1=CC=CS1") == c("c1ccsc1")) // thiophene
    assert(c("CN1C=CC=C1") == c("Cn1cccc1")) // N-methylpyrrole
    assert(c("C1=CC=C2C=CC=CC2=C1") == c("c1ccc2ccccc2c1")) // naphthalene
    assert(c("C1=CC2=CC=CC=C2C=C1") == c("c1ccc2ccccc2c1")) // alt. kekulé
    assert(c("C1=CC=C2NC=CC2=C1") == c("c1ccc2[nH]ccc2c1")) // indole
    assert(c("CC(=O)OC1=CC=CC=C1C(=O)O") == c("CC(=O)Oc1ccccc1C(=O)O")) // aspirin
    assert(c("[O-][N+]1=CC=CC=C1") == c("[O-][n+]1ccccc1")) // pyridine N-oxide
    // 7-ring aromatics (r8: flipped from documented passthrough)
    assert(c("C1=CC=CC=C[CH+]1") == c("[cH+]1cccccc1")) // tropylium
    assert(c("[CH+]1C=CC=CC=C1") == c("[cH+]1cccccc1")) // alt. kekulé
    // azulene: 5+7 fused, aromatic only as the 10-atom perimeter system —
    // both kekulé assignments and the aromatic writing unify
    assert(c("C1=CC2=CC=CC=CC2=C1") == c("c1cc2cccccc2c1"))
    assert(c("C1=CC=C2C=CC=C2C=C1") == c("c1ccc2cccc2cc1"))
  }

  test("non-aromatic unsaturated rings stay kekulized") {
    def c(s: String) = Smiles.canonical(s).get
    assert(!c("C1CCCCC1").exists(_.isLower)) // cyclohexane
    assert(!c("C1=CCCCC1").exists(_.isLower)) // cyclohexene
    assert(!c("C1=CC=CCC1").exists(_.isLower)) // 1,3-cyclohexadiene
    assert(!c("O=C1C=CC(=O)C=C1").exists(_.isLower)) // p-quinone: 4 pi e-
    // quinoid core whose exocyclic =C partners sit in saturated rings:
    // the cross-ring electron credit must NOT fire (exec-confirmed bug)
    assert(!c("C1(=C2CCCC2)C=CC(=C2CCCC2)C=C1").exists(_.isLower))
    // neutral 7-rings with an exocyclic double must stay kekulized —
    // 3 endocyclic doubles + a 0-electron sp2 atom hit 6 e⁻, but only
    // the tropylium CATION is aromatic (r8 review find)
    assert(!c("O=C1C=CC=CC=C1").exists(_.isLower)) // tropone
    assert(!c("C=C1C=CC=CC=C1").exists(_.isLower)) // heptafulvene
    assert(!c("C1=CC=CC=CC1").exists(_.isLower)) // cycloheptatriene
    assert(!c("C(=C)1C=CC(=C)C=C1").exists(_.isLower)) // p-quinodimethane
    // endocyclic-only counting still cascades through fused systems
    assert(c("C1=CC=C2C=C3C=CC=CC3=CC2=C1") == c("c1ccc2cc3ccccc3cc2c1")) // anthracene
    assert(c("C1=CC=CC=C1") != c("C1=CCCCC1"))
  }

  test("bracket-H and organic-subset forms unify") {
    def c(s: String) = Smiles.canonical(s).get
    assert(c("[CH4]") == "C")
    assert(c("[NH3]") == "N")
    assert(c("[OH2]") == "O")
    assert(c("[CH3]C") == "CC")
    assert(c("[CH3][CH2][OH]") == c("CCO"))
    assert(c("[CH3]") == "[CH3]") // methyl radical: H != reader default 4
    assert(c("[NH4+]") == "[NH4+]") // charge keeps the bracket
    assert(c("[13CH4]") == "[13CH4]") // isotope keeps the bracket
  }

  test("distinct molecules stay distinct") {
    def c(s: String) = Smiles.canonical(s).get
    assert(c("CCO") != c("CCN"))
    assert(c("CCO") != c("CC=O"))
    assert(c("C1CCCCC1") != c("C1CCCC1"))
    assert(c("[NH4+]") != c("[NH3]"))
    assert(c("[13CH3]O") != c("[CH3]O"))
  }

  test("idempotence over the corpus") {
    molecules.foreach { m =>
      val once = Smiles.canonical(m)
      assert(once.isDefined, m)
      assert(Smiles.canonical(once.get) == once, m)
    }
  }

  test("randomized rewriter: every alternative writing canonicalizes equal") {
    val rnd = new Random(42)
    molecules.filterNot(_.contains('.')).foreach { m =>
      val mol = Smiles.parseComponent(m).getOrElse(fail(s"parse $m"))
      val canon = Smiles.canonical(m).get
      (1 to 25).foreach { _ =>
        val perm = rnd.shuffle((0 until mol.atoms.length).toList).toArray
        val alt = Smiles.emit(mol, perm) // valid alternative writing
        val back = Smiles.canonical(alt)
        assert(back.contains(canon), s"$m via $alt → $back != $canon")
      }
    }
  }

  test("bracket properties round-trip") {
    def c(s: String) = Smiles.canonical(s).get
    assert(c("[13CH3]O").contains("13"))
    assert(c("[NH4+]") == "[NH4+]")
    assert(c("[Fe+2]") == "[Fe+2]")
    assert(c("[O-]C(=O)C") == c("CC(=O)[O-]"))
    assert(c("[CH2:5]=[CH:6]C").contains(":5"))
    assert(Smiles.canonicalNoMaps("[CH2:5]=[CH:6]C") ==
      Smiles.canonicalNoMaps("[CH2]=[CH]C"))
  }

  test("out-of-subset and invalid inputs") {
    assert(Smiles.canonical("sodium chloride").isEmpty) // free name
    assert(Smiles.canonical("C1CC").isEmpty) // unclosed ring
    assert(Smiles.canonical("C(").isEmpty) // unclosed branch
    assert(Smiles.canonical("C=").isEmpty) // dangling bond
    // named tetrahedral classes are aliases; other classes pass through
    assert(Smiles.canonical("[C@TH1](C)(N)(O)F") == Smiles.canonical("[C@](C)(N)(O)F"))
    assert(Smiles.canonical("[C@TH2](C)(N)(O)F") == Smiles.canonical("[C@@](C)(N)(O)F"))
    assert(Smiles.canonical("C[C@SP1](N)O").contains("C[C@SP1](N)O"))
    // contradictory double-marked closure (both ends `/`, but dir is
    // antisymmetric) fails the parse → identity passthrough, never a
    // silent stereo drop
    assert(Smiles.canonical("C/1=C/CCCCCC/1").contains("C/1=C/CCCCCC/1"))
  }

  test("E/Z double-bond stereo: writings unify, E and Z distinct") {
    def c(s: String) = Smiles.canonical(s).get
    // global sign flip is the same geometry
    assert(c("F/C=C/F") == c("F\\C=C\\F")) // trans, both writings
    assert(c("F/C=C\\F") == c("F\\C=C/F")) // cis, both writings
    assert(c("F/C=C/F") != c("F/C=C\\F")) // E != Z
    // moving the mark to the branch form flips it
    assert(c("F/C=C/F") == c("C(\\F)=C/F"))
    // branch-form rewriting of a trisubstituted alkene: dir(Me→C) must be
    // preserved, so the branch bond C→Me carries the opposite mark
    assert(c("C/C(F)=C/C") == c("C(\\C)(/F)=C/C"))
    assert(c("C/C(F)=C/C") != c("C(/C)(\\F)=C/C")) // that's the other isomer
    // E-2-butene from either end
    assert(c("C/C=C/C") == c("C/C=C/C"))
    assert(c("C/C=C\\C") != c("C/C=C/C"))
    // unmarked double bond stays unmarked; lone marks are dropped
    assert(!c("CC=CC").contains("/"))
    assert(c("C/C=CC") == c("CC=CC")) // incomplete spec → no stereo
    // non-stereogenic: identical substituents on one side → cleaned
    assert(c("C/C(C)=C/F") == c("CC(C)=CF"))
    // conjugated diene: both bonds stereo, shared middle bond
    assert(c("C/C=C/C=C/C") == c("C\\C=C\\C=C\\C"))
    assert(c("C/C=C/C=C/C") != c("C/C=C/C=C\\C"))
    // E/Z through an aromatic substituent (styrene-like)
    assert(c("c1ccccc1/C=C/C") == c("C(\\c1ccccc1)=C/C"))
    // in-ring double-bond stereo (cyclooctene, ring size 8 = smallest
    // where RDKit keeps bond stereo): marks canonicalize onto the
    // ring-closure digit; every writing of one geometry unifies, and
    // cis/trans stay distinct
    assert(c("C1CCCC/C=C/C1") == c("C1CCC/C=C/CC1")) // trans, chain marks
    assert(c("C1CCCC/C=C\\C1") == c("C/1=C/CCCCCC1")) // cis: chain vs digit marks
    assert(c("C/1=C/CCCCCC1") == c("C\\1=C\\CCCCCC1")) // global sign flip
    assert(c("C/1=C/CCCCCC1") == c("C/1=C/CCCCCC\\1")) // agreeing double mark
    assert(c("C1CCCC/C=C/C1") != c("C1CCCC/C=C\\C1")) // trans != cis
    // the emitted form carries its mark on the ring-closure digit and
    // round-trips to itself (true canonical fixpoint)
    val transOct = c("C1CCCC/C=C/C1")
    assert(c(transOct) == transOct)
    // ezCapable boundary: rings <8 force the geometry, marks are dropped
    // (cyclohexene, cycloheptene) — marked and unmarked writings merge
    assert(c("C1CC/C=C/C1") == c("C1CCC=CC1")) // 6-ring
    assert(c("C1CC/C=C\\C1") == c("C1CCC=CC1"))
    assert(c("C1CCC/C=C/C1") == c("C1CCCC=CC1")) // 7-ring
    assert(c("C1CCC/C=C\\C1") == c("C1CCCC=CC1"))
    assert(!c("C1CCC/C=C/C1").contains("/") && !c("C1CCC/C=C/C1").contains("\\"))
    // macrocycle (12-ring): digit and chain writings of one geometry unify
    assert(c("C/1=C/CCCCCCCCCC1") == c("C1CCCCCCCC/C=C\\C1"))
    assert(c("C1CCCCCCCC/C=C/C1") != c("C1CCCCCCCC/C=C\\C1"))
  }

  test("tetrahedral stereo: equivalent writings unify, enantiomers distinct") {
    def c(s: String) = Smiles.canonical(s).get
    // swapping two written neighbors flips the flag → same configuration
    assert(c("C[C@H](N)O") == c("C[C@@H](O)N"))
    assert(c("C[C@H](O)N") == c("C[C@@H](N)O"))
    // chirality first-in-string: the phantom H is FIRST when there is no
    // preceding atom, so moving the preceder flips parity once
    assert(c("[C@H](C)(N)O") == c("C[C@@H](N)O"))
    // enantiomers must stay distinct
    assert(c("C[C@H](N)O") != c("C[C@@H](N)O"))
    // 4 explicit neighbors, no phantom
    assert(c("[C@](F)(Cl)(Br)I") == c("[C@@](Cl)(F)(Br)I"))
    assert(c("[C@](F)(Cl)(Br)I") != c("[C@@](F)(Cl)(Br)I"))
    // genuine ring stereocenter: distinct arms → enantiomers distinct
    assert(c("C[C@H]1CCCO1") != c("C[C@@H]1CCCO1"))
    assert(c("C[C@H]1CCCO1") == c("C[C@@H]1OCCC1")) // arm swap flips flag
    // atom-map stripping preserves configuration identity
    assert(Smiles.canonicalNoMaps("C[C@H:2](N)O")
      == Smiles.canonicalNoMaps("C[C@@H](O)N"))
  }

  test("pseudo-asymmetric (r/s) centers: kept on meso forms, cleaned on chiral") {
    def c(s: String) = Smiles.canonical(s).get
    // pentane-2,3,4-triol has 4 stereoisomers: two meso diastereomers
    // (C2/C4 = R+S; distinguished ONLY by the pseudo-asymmetric C3, which
    // RDKit keeps as r/s) and one chiral enantiomer pair (C2/C4 same
    // config; C3's branches are then homomorphic — flag cleaned).
    val meso1 = c("C[C@H](O)[C@@H](O)[C@H](O)C")
    val meso2 = c("C[C@H](O)[C@H](O)[C@H](O)C")
    val chi1 = c("C[C@H](O)[C@@H](O)[C@@H](O)C")
    val chi2 = c("C[C@@H](O)[C@@H](O)[C@H](O)C")
    // meso forms: achiral — the full-mirror writing is the SAME molecule
    assert(meso1 == c("C[C@@H](O)[C@H](O)[C@@H](O)C"))
    assert(meso2 == c("C[C@@H](O)[C@@H](O)[C@@H](O)C"))
    // the two meso diastereomers differ ONLY at C3 — keeping the
    // pseudo-asymmetric flag is what separates them
    assert(meso1 != meso2)
    assert(meso1.count(_ == '@') == 4 || meso1.count(_ == '@') == 3,
      s"C3's flag must survive in $meso1")
    assert(meso1.replace("@@", "@").count(_ == '@') == 3,
      s"three flagged centers expected in $meso1")
    // chiral forms: C3 cleaned (two flagged centers), enantiomers distinct
    assert(chi1.replace("@@", "@").count(_ == '@') == 2,
      s"C3 must be cleaned in $chi1")
    assert(chi1 != chi2)
    // meso vs chiral never merge
    assert(Set(meso1, meso2).intersect(Set(chi1, chi2)).isEmpty)
    // idempotence through the kept pseudo-asymmetric flag
    assert(c(meso1) == meso1 && c(meso2) == meso2)
    // amino acid with both bracket-H and stereo through the full pipeline
    assert(c("N[C@@H](C)C(=O)O") == c("C(=O)(O)[C@H](C)N"))
  }

  test("non-stereogenic flags are cleaned; meso symmetry ranks canonically") {
    def c(s: String) = Smiles.canonical(s).get
    // identical ring arms: not a stereocenter — flag dropped (RDKit cleanIt)
    assert(c("O[C@H]1CCCC1") == c("OC1CCCC1"))
    assert(c("O[C@@H]1CCCC1") == c("OC1CCCC1"))
    // meso 2,3-butanediol: same achiral molecule under both flag writings
    assert(c("C[C@H](O)[C@H](O)C") == c("C[C@@H](O)[C@@H](O)C"))
    // (R,R)/(S,S): chiral pair — distinct from each other and from meso
    assert(c("C[C@H](O)[C@@H](O)C") != c("C[C@@H](O)[C@H](O)C"))
    assert(c("C[C@H](O)[C@H](O)C") != c("C[C@H](O)[C@@H](O)C"))
  }

  test("transition-metal detection from parsed atoms") {
    assert(Smiles.hasTransitionMetalParsed("[Pd]").contains(true))
    assert(Smiles.hasTransitionMetalParsed("[Fe+2]").contains(true))
    // elements ending in lowercase 'h' (Rh) must parse like any other
    assert(Smiles.hasTransitionMetalParsed("[Rh]").contains(true))
    assert(Smiles.canonical("[Rh+3]") == Some("[Rh+3]"))
    assert(Smiles.hasTransitionMetalParsed("CCO").contains(false))
    assert(Smiles.hasTransitionMetalParsed("CCO.[Pt]").contains(true))
    // F in CF4 is not iron; Co in [Co] is cobalt, C+o would not parse
    assert(Smiles.hasTransitionMetalParsed("FC(F)(F)F").contains(false))
    assert(Smiles.hasTransitionMetalParsed("[Co]").contains(true))
  }

  test("boundaryClasses mirrors canonicalVia's whole-input passthrough rule") {
    // the audit's classification must agree with what canonical() DOES:
    // an unparseable component downgrades the WHOLE input to verbatim
    // passthrough iff stereo appears anywhere in the string (r14 advice:
    // per-component stereo testing undercounted the passthrough envelope)
    val plain = "O(CC[*:2])[*:1]" // wildcard attachment: unparseable
    assert(Smiles.canonical(plain).isEmpty)
    assert(Smiles.boundaryClasses(plain) == Seq("unparseable"))
    // same unparseable component + stereo in a DIFFERENT component:
    // canonical() returns the entire input verbatim -> the audit must
    // count a stereo passthrough, not an unparseable
    val mixed = s"$plain.C[C@H](O)CC"
    assert(Smiles.canonical(mixed).contains(mixed))
    assert(Smiles.boundaryClasses(mixed) == Seq("stereo_passthrough"))
    // stereo in the unparseable component itself still classifies
    val inComp = "CC[C@H]1ON[*:3]1"
    if (Smiles.canonical(inComp).contains(inComp))
      assert(Smiles.boundaryClasses(inComp) == Seq("stereo_passthrough"))
    // parseable clean input hits no boundary class
    assert(Smiles.boundaryClasses("CCO.c1ccccc1").isEmpty)
  }

  test("morgan fingerprint: writing-invariant, molecule-sensitive") {
    val a = Smiles.morganBits("CCO", 3, 256).get.toSeq
    val b = Smiles.morganBits("OCC", 3, 256).get.toSeq
    val other = Smiles.morganBits("CCN", 3, 256).get.toSeq
    assert(a == b)
    assert(a != other)
    assert(a.sum > 0)
    assert(Smiles.morganBits("not a molecule", 3, 256).isEmpty)
  }
}
