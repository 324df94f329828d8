package graft.extract

import scala.collection.mutable

/** Minimal SMILES parser + canonicalizer (E13 — the chemistry boundary,
  * extract/canonicalise.py:12-72 is an RDKit round-trip; this is an
  * independent structural implementation over a documented SMILES subset).
  *
  * Scope: organic-subset and bracket atoms (isotope, charge, explicit H,
  * atom map), single/double/triple/aromatic bonds, branches, ring closures
  * (incl. %nn). Canonical form = Morgan-style invariant refinement with
  * deterministic tie-breaking, emitted as a rank-ordered DFS; disconnected
  * components canonicalize independently and sort. Guarantees: idempotent;
  * invariant under atom re-ordering / alternative ring numbering / branch
  * order of the SAME graph (spec-locked with a randomized re-writer).
  *
  * Normalization (matching the RDKit round-trip the reference performs):
  *
  *  - '''Implicit hydrogens are made structural.''' Every parsed atom gets a
  *    concrete total-H count — bracket atoms as written, organic-subset
  *    atoms by the Daylight valence rule (smallest standard valence ≥ bond
  *    order sum). Canonical ranking uses that count, so `[CH4]` ≡ `C`,
  *    `[NH3]` ≡ `N`, `[CH3]C` ≡ `CC`. Emission re-derives the reader's
  *    default and brackets only atoms the bare form cannot represent
  *    (isotope/charge/map, non-default H like `[CH3]` radical or `[nH]`).
  *  - '''Kekulized rings are aromatized.''' 5- and 6-membered rings over
  *    aromatic-capable atoms (B C N O P S) are tested with a Hückel-style
  *    electron count (in-conjugation double bond → 1 e⁻, pyrrole-type
  *    N/P/O/S lone pair → 2 e⁻, exocyclic double / B / C⁺ → 0 e⁻; 4n+2
  *    passes) and rewritten to aromatic form, iterating to a fixpoint so
  *    fused systems (naphthalene, indole, quinoline) resolve ring by ring.
  *    So `C1=CC=CC=C1` ≡ `c1ccccc1` and `C1=CC=CN1` ≡ `c1cc[nH]c1`, while
  *    quinones, cyclohexadienes and other non-aromatic rings keep their
  *    double bonds.
  *
  * Documented boundaries (vs RDKit): stereo markers (`@`, `/`, `\`) are out
  * of the subset — inputs containing them are returned unchanged (identity
  * fallback), like unparsable strings return null in the reference;
  * aromatization covers 5/6-rings only (no tropylium/azulene 7-rings), and
  * a kekulé assignment of a large fused polycycle in which no 5/6-ring
  * reaches 4n+2 even iteratively stays kekulized.
  */
object Smiles {

  /** `hCount` is the concrete total hydrogen count — parseComponent fills
    * it in for organic-subset atoms via [[readerImplicitH]]. */
  final case class Atom(elem: String, aromatic: Boolean, isotope: Int,
      charge: Int, hCount: Int, atomMap: Int)
  /** order: 1, 2, 3; 4 = aromatic. */
  final case class Bond(a: Int, b: Int, order: Int)
  final case class Mol(atoms: Vector[Atom], bonds: Vector[Bond]) {
    lazy val adj: Vector[Vector[(Int, Int)]] = { // atom -> (neighbor, order)
      val m = Vector.fill(atoms.length)(mutable.ArrayBuffer[(Int, Int)]())
      bonds.foreach { bd => m(bd.a) += ((bd.b, bd.order)); m(bd.b) += ((bd.a, bd.order)) }
      m.map(_.toVector)
    }
  }

  private val organicSubset = Set("B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I")
  private val aromaticSubset = Set("b", "c", "n", "o", "p", "s")
  private val twoLetter = Set("Cl", "Br")

  /** Transition metals by symbol (atomic number ∈ [22,29]∪[40,47]∪[72,79],
    * extract/defaults.py:10-39). */
  val transitionMetals: Set[String] = Set(
    "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu",
    "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag",
    "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au")

  // ---- implicit hydrogens --------------------------------------------------

  private val defaultValences: Map[String, Seq[Int]] = Map(
    "B" -> Seq(3), "C" -> Seq(4), "N" -> Seq(3, 5), "O" -> Seq(2),
    "P" -> Seq(3, 5), "S" -> Seq(2, 4, 6),
    "F" -> Seq(1), "Cl" -> Seq(1), "Br" -> Seq(1), "I" -> Seq(1))

  /** H count a SMILES reader infers for the BARE (unbracketed) form of this
    * atom given its incident bond orders. Aromatic atoms: each aromatic bond
    * counts 1 plus one valence unit for the π system (benzene `c` → 1,
    * fusion `c` → 0, pyridine `n` → 0 — which is why pyrrole N must be
    * written `[nH]`). Returns -1 for elements with no bare form.
    */
  private def readerImplicitH(a: Atom, orders: Seq[Int]): Int =
    defaultValences.get(a.elem) match {
      case None => -1 // non-subset elements are always bracketed
      case Some(vals) =>
        if (a.aromatic) {
          val s = orders.map(o => if (o == 4) 1 else o).sum + 1
          math.max(0, vals.head - s)
        } else {
          val s = orders.map(o => if (o == 4) 1 else o).sum
          vals.find(_ >= s).map(_ - s).getOrElse(0)
        }
    }

  // ---- parser --------------------------------------------------------------

  /** Parse one component (no '.'). None on anything outside the subset.
    * Organic-subset atoms come back with their implicit H count made
    * concrete (hCount ≥ 0 for every atom).
    */
  def parseComponent(s: String): Option[Mol] = {
    if (s.isEmpty) return None
    val atoms = mutable.ArrayBuffer[Atom]()
    val bonds = mutable.ArrayBuffer[Bond]()
    val implicitH = mutable.ArrayBuffer[Boolean]() // subset atoms: H not yet known
    val stack = mutable.Stack[Int]()
    val ringOpen = mutable.Map[Int, (Int, Int)]() // ring# -> (atom, pendingOrder)
    var prev = -1
    var pendingOrder = 0 // 0 = unset (default)
    var i = 0

    def defaultOrder(a: Int, b: Int): Int =
      if (atoms(a).aromatic && atoms(b).aromatic) 4 else 1

    def addBond(a: Int, b: Int, explicit: Int): Unit = {
      val o = if (explicit != 0) explicit else defaultOrder(a, b)
      bonds += Bond(a, b, o)
    }

    def addAtom(a: Atom, hImplicit: Boolean): Unit = {
      atoms += a
      implicitH += hImplicit
      val idx = atoms.length - 1
      if (prev >= 0) { addBond(prev, idx, pendingOrder); pendingOrder = 0 }
      prev = idx
    }

    def ringBond(n: Int): Unit = {
      ringOpen.remove(n) match {
        case Some((other, opening)) =>
          // bond type may be written at either end; they must agree if both
          val o = if (pendingOrder != 0) pendingOrder
            else if (opening != 0) opening else 0
          addBond(other, prev, o)
          pendingOrder = 0
        case None =>
          ringOpen(n) = (prev, pendingOrder)
          pendingOrder = 0
      }
    }

    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '(' =>
          if (prev < 0) return None
          stack.push(prev); i += 1
        case ')' =>
          if (stack.isEmpty) return None
          prev = stack.pop(); i += 1
        case '-' => pendingOrder = 1; i += 1
        case '=' => pendingOrder = 2; i += 1
        case '#' => pendingOrder = 3; i += 1
        case ':' => pendingOrder = 4; i += 1
        case d if d.isDigit =>
          if (prev < 0) return None
          ringBond(d - '0'); i += 1
        case '%' =>
          if (i + 2 >= s.length || !s.charAt(i + 1).isDigit || !s.charAt(i + 2).isDigit)
            return None
          ringBond((s.charAt(i + 1) - '0') * 10 + (s.charAt(i + 2) - '0'))
          i += 3
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) return None
          parseBracket(s.substring(i + 1, close)) match {
            case Some(a) => addAtom(a, hImplicit = false)
            case None => return None
          }
          i = close + 1
        case _ =>
          // organic subset (two-letter first)
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          if (twoLetter(two)) { addAtom(Atom(two, aromatic = false, 0, 0, 0, 0), hImplicit = true); i += 2 }
          else {
            val one = c.toString
            if (organicSubset(one)) { addAtom(Atom(one, aromatic = false, 0, 0, 0, 0), hImplicit = true); i += 1 }
            else if (aromaticSubset(one)) { addAtom(Atom(one.toUpperCase, aromatic = true, 0, 0, 0, 0), hImplicit = true); i += 1 }
            else return None // incl. stereo /\, '@' outside brackets, unknown
          }
      }
    }
    if (stack.nonEmpty || ringOpen.nonEmpty || atoms.isEmpty || pendingOrder != 0) None
    else {
      val mol0 = Mol(atoms.toVector, bonds.toVector)
      val resolved = mol0.atoms.zipWithIndex.map { case (a, idx) =>
        if (implicitH(idx))
          a.copy(hCount = math.max(0, readerImplicitH(a, mol0.adj(idx).map(_._2))))
        else a
      }
      Some(Mol(resolved, mol0.bonds))
    }
  }

  /** `[isotope? symbol H<n>? charge? :map?]` — no stereo (`@` → None). */
  private def parseBracket(b: String): Option[Atom] = {
    var i = 0
    def digits(): Int = {
      val st = i
      while (i < b.length && b.charAt(i).isDigit) i += 1
      if (i == st) -1 else b.substring(st, i).toInt
    }
    val isotope = math.max(digits(), 0)
    if (i >= b.length) return None
    // element symbol: uppercase+lowercase?, or aromatic lowercase
    val (elem, aromatic) = {
      val c = b.charAt(i)
      if (c.isUpper) {
        // a lowercase letter after an uppercase one is always part of the
        // element symbol inside brackets (H-count is uppercase 'H') — no
        // exclusions, or two-letter elements ending in 'h' (Rh, Th) break
        val two = if (i + 1 < b.length && b.charAt(i + 1).isLower)
          b.substring(i, i + 2) else c.toString
        i += two.length
        (two, false)
      } else if (aromaticSubset(c.toString)) {
        i += 1
        (c.toUpper.toString, true)
      } else return None
    }
    var h = 0
    var charge = 0
    var map = 0
    while (i < b.length) {
      b.charAt(i) match {
        case 'H' =>
          i += 1
          val d = digits()
          h = if (d < 0) 1 else d
        case '+' =>
          i += 1
          val d = digits()
          charge += (if (d < 0) { var n = 1; while (i < b.length && b.charAt(i) == '+') { n += 1; i += 1 }; n } else d)
        case '-' =>
          i += 1
          val d = digits()
          charge -= (if (d < 0) { var n = 1; while (i < b.length && b.charAt(i) == '-') { n += 1; i += 1 }; n } else d)
        case ':' =>
          i += 1
          val d = digits()
          if (d < 0) return None
          map = d
        case _ => return None // '@' stereo and anything else: out of subset
      }
    }
    Some(Atom(elem, aromatic, isotope, charge, h, map))
  }

  // ---- aromatization -------------------------------------------------------

  private val aromaticCapable = Set("B", "C", "N", "O", "P", "S")

  /** All simple cycles of length 5 or 6, in cycle order, deduped by atom
    * set. Bounded DFS (each cycle enumerated from its minimum atom only);
    * molecules are small so this is cheap.
    */
  def simpleRings(mol: Mol): Vector[Vector[Int]] = {
    val n = mol.atoms.length
    val seen = mutable.Set[Set[Int]]()
    val out = mutable.ArrayBuffer[Vector[Int]]()
    val path = mutable.ArrayBuffer[Int]()
    val onPath = new Array[Boolean](n)
    def dfs(start: Int, a: Int): Unit = {
      path += a; onPath(a) = true
      mol.adj(a).foreach { case (b, _) =>
        if (b == start && path.length >= 5) {
          if (seen.add(path.toSet)) out += path.toVector
        } else if (!onPath(b) && b > start && path.length < 6) dfs(start, b)
      }
      path.remove(path.length - 1); onPath(a) = false
    }
    (0 until n).foreach(s => dfs(s, s))
    out.toVector
  }

  /** Hückel-style aromatization to a fixpoint (see object scaladoc). The
    * reference gets this from RDKit's SanitizeMol aromaticity perception
    * (extract/canonicalise.py:12-31); this is an independent 5/6-ring
    * electron-counting implementation.
    */
  def aromatize(mol: Mol): Mol = {
    val rings = simpleRings(mol)
    if (rings.isEmpty) return mol
    def ek(a: Int, b: Int): (Int, Int) = if (a < b) (a, b) else (b, a)
    val n = mol.atoms.length
    val arom = Array.tabulate(n)(mol.atoms(_).aromatic)
    val order = mutable.Map[(Int, Int), Int]()
    mol.bonds.foreach(b => order(ek(b.a, b.b)) = b.order)
    val ringSystem: Set[Int] = rings.flatten.toSet
    val degree = Array.tabulate(n)(mol.adj(_).length)
    var changed = true
    while (changed) {
      changed = false
      rings.foreach { ring =>
        val allMarked = ring.forall(arom) &&
          ring.indices.forall(i => order(ek(ring(i), ring((i + 1) % ring.length))) == 4)
        if (!allMarked && ring.forall(a => aromaticCapable(mol.atoms(a).elem))) {
          var ok = true
          var electrons = 0
          ring.foreach { a =>
            val at = mol.atoms(a)
            val nbs = mol.adj(a).map { case (b, _) => (b, order(ek(a, b))) }
            val conns = degree(a) + at.hCount
            if (nbs.exists(_._2 == 3) || conns > 3) ok = false
            else if (arom(a)) electrons += 1
            else {
              val doubles = nbs.filter(_._2 == 2)
              if (doubles.nonEmpty) {
                // double into the conjugated ring system → 1 π e⁻; purely
                // exocyclic double (quinone C=O) → sp2 but 0 π e⁻
                if (doubles.exists { case (b, _) => ringSystem(b) }) electrons += 1
              } else at.elem match {
                case "C" =>
                  if (at.charge == -1) electrons += 2 // cyclopentadienyl
                  else if (at.charge != 1) ok = false // sp3 carbon
                case "N" | "P" => electrons += 2 // pyrrole-type lone pair
                case "O" | "S" =>
                  if (at.charge == 0 && degree(a) == 2 && at.hCount == 0) electrons += 2
                  else ok = false
                case "B" => () // empty p orbital
                case _ => ok = false
              }
            }
          }
          if (ok && electrons % 4 == 2) {
            ring.foreach { a => if (!arom(a)) { arom(a) = true; changed = true } }
            ring.indices.foreach { i =>
              val e = ek(ring(i), ring((i + 1) % ring.length))
              if (order(e) != 4) { order(e) = 4; changed = true }
            }
          }
        }
      }
    }
    Mol(
      mol.atoms.zipWithIndex.map { case (a, i) => a.copy(aromatic = arom(i)) },
      mol.bonds.map(b => b.copy(order = order(ek(b.a, b.b)))))
  }

  // ---- canonical ranking ---------------------------------------------------

  /** Morgan-style refinement: start from local invariants, refine by sorted
    * neighbor (order, rank) multisets, break ties deterministically on the
    * smallest ambiguous class, re-refine. Returns a permutation-invariant
    * rank per atom (classic limitation: non-automorphic ties in pathological
    * regular graphs — not observed on chemical graphs in the spec corpus).
    */
  def canonicalRanks(mol: Mol): Array[Int] = {
    val n = mol.atoms.length
    // Full strings as refinement keys — NOT 32-bit hashes, whose collisions
    // would silently merge distinct invariant classes and break canonical
    // invariance. Molecules are small; string keys are cheap here.
    def squash(keys: Array[String]): Array[Int] = {
      val idx = keys.distinct.sorted.zipWithIndex.toMap
      keys.map(idx)
    }
    def refine(init: Array[String]): Array[Int] = {
      var ranks = squash(init)
      var distinct = ranks.distinct.length
      var changed = true
      while (changed) {
        val keys = Array.tabulate(n) { a =>
          val nb = mol.adj(a).map { case (b, o) => f"$o:${ranks(b)}%09d" }
            .sorted.mkString(",")
          // old rank as a fixed-width prefix: refinement never merges classes
          f"${ranks(a)}%09d|$nb"
        }
        val next = squash(keys)
        val nd = next.distinct.length
        changed = nd != distinct
        ranks = next
        distinct = nd
      }
      ranks
    }
    val initial: Array[String] = Array.tabulate(n) { i =>
      val a = mol.atoms(i)
      Seq(a.elem, a.aromatic, a.isotope, a.charge, a.hCount, a.atomMap,
        mol.adj(i).length).mkString("|")
    }
    var ranks = refine(initial)
    while (ranks.distinct.length < n) {
      val tie = ranks.groupBy(identity).collect {
        case (r, g) if g.length > 1 => r
      }.min
      val r = ranks.zipWithIndex.filter(_._1 == tie).map(_._2).min
      val lifted = Array.tabulate(n)(i =>
        f"${ranks(i)}%09d|${if (i == r) 0 else 1}")
      ranks = refine(lifted)
    }
    ranks
  }

  // ---- canonical emission --------------------------------------------------

  /** Bare (unbracketed) emission is possible iff the reader would re-infer
    * exactly this atom: no isotope/charge/map, H count = reader default.
    */
  private def emitAtom(a: Atom, readerH: Int): String = {
    val bareOk = a.isotope == 0 && a.charge == 0 && a.atomMap == 0 &&
      a.hCount == readerH &&
      (if (a.aromatic) aromaticSubset(a.elem.toLowerCase)
       else organicSubset(a.elem))
    if (bareOk) { if (a.aromatic) a.elem.toLowerCase else a.elem }
    else {
      val sb = new StringBuilder("[")
      if (a.isotope > 0) sb.append(a.isotope)
      sb.append(if (a.aromatic) a.elem.toLowerCase else a.elem)
      if (a.hCount == 1) sb.append("H")
      else if (a.hCount > 1) sb.append("H").append(a.hCount)
      if (a.charge > 0) sb.append(if (a.charge == 1) "+" else s"+${a.charge}")
      else if (a.charge < 0) sb.append(if (a.charge == -1) "-" else s"-${-a.charge}")
      if (a.atomMap > 0) sb.append(":").append(a.atomMap)
      sb.append("]").toString
    }
  }

  private def bondStr(o: Int, a: Atom, b: Atom): String = o match {
    case 2 => "="
    case 3 => "#"
    case 4 => if (a.aromatic && b.aromatic) "" else ":"
    case 1 => if (a.aromatic && b.aromatic) "-" else ""
    case _ => ""
  }

  /** Rank-ordered DFS emission with ring-closure numbering. */
  def emit(mol: Mol, ranks: Array[Int]): String = {
    val n = mol.atoms.length
    val visited = new Array[Boolean](n)
    // ring bonds: DFS back-edges, discovered during traversal
    val ringNum = mutable.Map[(Int, Int), Int]() // edge -> number
    // atom -> (number, order, partner atom)
    val atomRings = mutable.Map[Int, mutable.ArrayBuffer[(Int, Int, Int)]]()
    var nextRing = 1
    // first pass: find tree/back edges in rank-DFS order
    def neighbors(a: Int): Vector[(Int, Int)] =
      mol.adj(a).sortBy { case (b, _) => ranks(b) }
    val inTree = mutable.Set[(Int, Int)]()
    def key(a: Int, b: Int): (Int, Int) = if (a < b) (a, b) else (b, a)
    def walk(a: Int, from: Int): Unit = {
      visited(a) = true
      neighbors(a).foreach { case (b, o) =>
        if (b != from) {
          if (!visited(b)) { inTree += key(a, b); walk(b, a) }
          else if (!inTree(key(a, b)) && !ringNum.contains(key(a, b))) {
            ringNum(key(a, b)) = nextRing
            atomRings.getOrElseUpdate(a, mutable.ArrayBuffer()) += ((nextRing, o, b))
            atomRings.getOrElseUpdate(b, mutable.ArrayBuffer()) += ((nextRing, o, a))
            nextRing += 1
          }
        }
      }
    }
    val start = ranks.zipWithIndex.minBy(_._1)._2
    walk(start, -1)
    // second pass: emit
    java.util.Arrays.fill(visited, false)
    val sb = new StringBuilder
    val ringOpened = mutable.Set[Int]()
    def ringToken(num: Int): String = if (num < 10) num.toString else f"%%$num%02d"
    def emitFrom(a: Int, from: Int, bondO: Int): Unit = {
      visited(a) = true
      if (from >= 0) sb.append(bondStr(bondO, mol.atoms(from), mol.atoms(a)))
      sb.append(emitAtom(mol.atoms(a),
        readerImplicitH(mol.atoms(a), mol.adj(a).map(_._2))))
      atomRings.get(a).foreach(_.foreach { case (num, o, partner) =>
        // bond char on the ring-opening digit only (first appearance)
        if (ringOpened.add(num))
          sb.append(bondStr(o, mol.atoms(a), mol.atoms(partner)) + ringToken(num))
        else sb.append(ringToken(num))
      })
      val kids = neighbors(a).filter { case (b, _) =>
        b != from && !visited(b) && inTree(key(a, b))
      }
      kids.zipWithIndex.foreach { case ((b, o), idx) =>
        if (!visited(b)) {
          val isLast = idx == kids.length - 1
          if (!isLast) {
            sb.append("(")
            emitFrom(b, a, o)
            sb.append(")")
          } else emitFrom(b, a, o)
        }
      }
    }
    emitFrom(start, -1, 0)
    sb.toString
  }

  // ---- public API ----------------------------------------------------------

  private def hasStereo(s: String): Boolean =
    s.contains('@') || s.contains('/') || s.contains('\\')

  /** Canonical SMILES of the (possibly multi-component) input; None when
    * outside the parseable subset; stereo-bearing inputs pass through
    * unchanged (documented boundary).
    */
  def canonical(s: String): Option[String] = {
    if (s == null || s.isEmpty) return None
    if (hasStereo(s)) return Some(s)
    val parts = s.split("\\.", -1)
    val canon = parts.map { p =>
      parseComponent(p) match {
        case Some(mol) =>
          val norm = aromatize(mol)
          emit(norm, canonicalRanks(norm))
        case None => return None
      }
    }
    Some(canon.sorted.mkString("."))
  }

  /** Strip atom maps structurally, then canonicalize. */
  def canonicalNoMaps(s: String): Option[String] = {
    if (s == null || s.isEmpty) return None
    if (hasStereo(s)) return Some(s)
    val parts = s.split("\\.", -1)
    val canon = parts.map { p =>
      parseComponent(p) match {
        case Some(mol) =>
          val stripped = aromatize(Mol(mol.atoms.map(_.copy(atomMap = 0)), mol.bonds))
          emit(stripped, canonicalRanks(stripped))
        case None => return None
      }
    }
    Some(canon.sorted.mkString("."))
  }

  /** Exact transition-metal test from parsed atoms (E14). */
  def hasTransitionMetalParsed(s: String): Option[Boolean] = {
    if (s == null || s.isEmpty || hasStereo(s)) return None
    val parts = s.split("\\.", -1)
    var any = false
    parts.foreach { p =>
      parseComponent(p) match {
        case Some(mol) => any ||= mol.atoms.exists(a => transitionMetals(a.elem))
        case None => return None
      }
    }
    Some(any)
  }

  /** Graph-based Morgan-style fingerprint (F1): per-atom neighborhood
    * hashes for radii 0..r, each scattered into nBits buckets. Structurally
    * faithful to hashed-Morgan semantics (not RDKit-bit-compatible).
    * Runs on the aromatized graph so kekulized and aromatic writings of the
    * same molecule fingerprint identically.
    */
  def morganBits(s: String, radius: Int, nBits: Int): Option[Array[Int]] = {
    if (s == null || s.isEmpty || hasStereo(s)) return None
    val fp = new Array[Int](nBits)
    val parts = s.split("\\.", -1)
    parts.foreach { p =>
      parseComponent(p) match {
        case Some(raw) =>
          val mol = aromatize(raw)
          val n = mol.atoms.length
          var h = Array.tabulate(n) { i =>
            val a = mol.atoms(i)
            graft.functions.XHash.bucketHashJvm("mg0",
              a.elem, a.aromatic.toString, a.charge.toString,
              a.isotope.toString, a.hCount.toString, mol.adj(i).length.toString)
          }
          (0 to radius).foreach { r =>
            h.foreach(v => fp(((v % nBits) + nBits).toInt % nBits) = 1)
            if (r < radius) {
              h = Array.tabulate(n) { i =>
                val nb = mol.adj(i).map { case (b, o) => s"$o:${h(b)}" }.sorted
                graft.functions.XHash.bucketHashJvm("mgr",
                  (h(i).toString +: nb): _*)
              }
            }
          }
        case None => return None
      }
    }
    Some(fp)
  }
}
