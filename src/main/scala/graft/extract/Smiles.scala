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
  * Documented boundaries (vs RDKit): no aromatization/kekulization — the
  * aromatic flags are taken as written, so `c1ccccc1` and `C1=CC=CC=C1`
  * stay distinct; bracket-vs-organic-subset H equivalence (`[CH4]` vs `C`)
  * is not unified; stereo markers (`@`, `/`, `\`) are out of the subset —
  * inputs containing them are returned unchanged (identity fallback), like
  * unparsable strings return null in the reference.
  */
object Smiles {

  final case class Atom(elem: String, aromatic: Boolean, isotope: Int,
      charge: Int, hCount: Int, atomMap: Int, bracket: Boolean)
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

  // ---- parser --------------------------------------------------------------

  /** Parse one component (no '.'). None on anything outside the subset. */
  def parseComponent(s: String): Option[Mol] = {
    if (s.isEmpty) return None
    val atoms = mutable.ArrayBuffer[Atom]()
    val bonds = mutable.ArrayBuffer[Bond]()
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

    def addAtom(a: Atom): Unit = {
      atoms += a
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
            case Some(a) => addAtom(a)
            case None => return None
          }
          i = close + 1
        case _ =>
          // organic subset (two-letter first)
          val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
          if (twoLetter(two)) { addAtom(Atom(two, aromatic = false, 0, 0, -1, 0, bracket = false)); i += 2 }
          else {
            val one = c.toString
            if (organicSubset(one)) { addAtom(Atom(one, aromatic = false, 0, 0, -1, 0, bracket = false)); i += 1 }
            else if (aromaticSubset(one)) { addAtom(Atom(one.toUpperCase, aromatic = true, 0, 0, -1, 0, bracket = false)); i += 1 }
            else return None // incl. stereo /\, '@' outside brackets, unknown
          }
      }
    }
    if (stack.nonEmpty || ringOpen.nonEmpty || atoms.isEmpty || pendingOrder != 0) None
    else Some(Mol(atoms.toVector, bonds.toVector))
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
    Some(Atom(elem, aromatic, isotope, charge, h, map, bracket = true))
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
        a.bracket, mol.adj(i).length).mkString("|")
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

  private def emitAtom(a: Atom): String =
    if (!a.bracket) { if (a.aromatic) a.elem.toLowerCase else a.elem }
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
      sb.append(emitAtom(mol.atoms(a)))
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
        case Some(mol) => emit(mol, canonicalRanks(mol))
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
          val stripped = Mol(mol.atoms.map(_.copy(atomMap = 0)), mol.bonds)
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
    */
  def morganBits(s: String, radius: Int, nBits: Int): Option[Array[Int]] = {
    if (s == null || s.isEmpty || hasStereo(s)) return None
    val fp = new Array[Int](nBits)
    val parts = s.split("\\.", -1)
    parts.foreach { p =>
      parseComponent(p) match {
        case Some(mol) =>
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
