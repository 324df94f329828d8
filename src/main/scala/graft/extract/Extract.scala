package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayOps, Conversions}

/** E1–E23 — the extraction pipeline (SURVEY.md §2.2), re-expressed as one
  * declarative Column pipeline over the nested reaction rows produced by
  * [[OrdSource.readNested]]. The reference walks each reaction in Python
  * (extract/extractor.py:595-1073 `handle_reaction_object`); here every
  * step is a higher-order array expression, so the whole extract is one
  * narrow codegen'd projection — no shuffle at all until the sink.
  *
  * Chemistry-dependent steps (canonicalisation) go through a [[Chemistry]]
  * instance; with [[IdentityChemistry]] the pipeline is exact for inputs
  * that are already canonical (the reference's own golden corpus is).
  */
final case class ExtractConfig(
    trustLabelling: Boolean = false,
    considerMoleculeNames: Boolean = false,
    mergeConditionsToAgents: Boolean = true,
    includeUnaddedLabelledMolecules: Boolean = true,
    useLabellingIfExtractFails: Boolean = true)

object Extract {

  /** Atom-mapped-molecule test: any `:n]` atom map present
    * (extract/extractor.py:244-249 uses RDKit atom map numbers; on the
    * SMILES string this is exactly the `:digits]` token). */
  def hasMappedAtom(c: Column): Column = c.rlike(":\\d+\\]")

  /** E2 — reaction CXSMILES (LAST identifier of type 6 — the reference's
    * loop overwrites, extractor.py:165-168), extension stripped, exactly
    * two `>` required (extract/extractor.py:160-180). */
  def rxnStrCol: Column = {
    val ident = try_element_at(
      filter(col("identifiers"), i => i.getField("itype") === 6), lit(-1))
    val raw = split(ident.getField("value"), " ").getItem(0)
    when(size(split(raw, ">", -1)) === 3, raw)
  }

  /** is_mapped is false whenever no valid rxn string exists
    * (extractor.py:683-686). */
  def isMappedCol: Column =
    when(rxnStrCol.isNotNull,
      coalesce(try_element_at(
        filter(col("identifiers"), i => i.getField("itype") === 6), lit(-1))
        .getField("isMapped"), lit(false)))
      .otherwise(lit(false))

  /** E1 — first SMILES identifier of an identifier list, else (optionally)
    * its NAME (extract/extractor.py:112-158). */
  private def idsSmiles(ids: Column, allowName: Boolean): Column = {
    val smiles = try_element_at(
      filter(ids, i => i.getField("itype") === 2), lit(1))
      .getField("value")
    if (!allowName) smiles
    else coalesce(smiles,
      try_element_at(
        filter(ids, i => i.getField("itype") === 6), lit(1))
        .getField("value"))
  }

  private def compSmiles(comp: Column, allowName: Boolean): Column =
    idsSmiles(comp.getField("ids"), allowName)

  /** E4 — route input components by reaction_role into labelled lists,
    * splitting multi-molecule SMILES on '.' (extract/extractor.py:308-375).
    * Roles: 1=reactant 2=reagent 3=solvent 4=catalyst 8=product. */
  def labelled(role: Int, cfg: ExtractConfig): Column = {
    val comps = flatten(transform(col("inputs"), e => e.getField("components")))
    val ofRole = filter(comps, c => c.getField("role") === role)
    val smiles = transform(ofRole, c => compSmiles(c, cfg.considerMoleculeNames))
    val nonNull = filter(smiles, s => s.isNotNull && s =!= "")
    flatten(transform(nonNull, s => split(s, "[.]")))
  }

  /** E19 — Pd/C exception (extract/extractor.py:1024-1048): when a
    * transition metal sits among the conditions or the procedure text
    * mentions charcoal, bare carbon ("C"/"[C]") is the catalyst support,
    * not an agent — drop it from the condition list. */
  def pdCException(agents: Column, procedure: Column, chem: Chemistry): Column =
    when(exists(agents, a => chem.hasTransitionMetal(a)) ||
      contains(lower(coalesce(procedure, lit(""))), lit("charcoal")),
      array_except(agents, array(lit("[C]"), lit("C"))))
      .otherwise(agents)

  /** E20 — ice defaults a missing temperature to 0 °C
    * (extract/extractor.py:432-441 ice handling). */
  def iceTemperature(temperature: Column, ice: Column): Column =
    coalesce(temperature, when(ice, lit(0.0)))

  /** E4 ice detection: "ice" / "ice water" NAME among inputs. */
  def icePresent: Column = {
    val comps = flatten(transform(col("inputs"), e => e.getField("components")))
    exists(comps, c => exists(c.getField("ids"),
      i => lower(i.getField("value")).isin("ice", "ice water")))
  }

  /** E5 — labelled products + aligned yields; multi-part products split on
    * '.', longest part keeps the yield, others padded null
    * (extract/extractor.py:377-421). A product with no resolvable
    * identifier is skipped entirely — the reference `continue`s past it
    * (extractor.py:400-401) — rather than contributing a null entry; the
    * identifier lookup honours considerMoleculeNames like find_smiles. */
  def labelledProducts(cfg: ExtractConfig): Column =
    flatten(transform(
      filter(col("products"),
        p => idsSmiles(p.getField("ids"), cfg.considerMoleculeNames).isNotNull),
      p => {
        val first = idsSmiles(p.getField("ids"), cfg.considerMoleculeNames)
        val parts = array_sort(
          split(first, "[.]"),
          (l, r) => when(length(l) > length(r), -1)
            .when(length(l) < length(r), 1).otherwise(0))
        transform(parts, (part, i) =>
          struct(part.as("smiles"),
            when(i === 0, round(p.getField("yieldPct"), 2)).as("yield")))
      }))

  /** E3 — participation logic over the reaction string
    * (extract/extractor.py:182-306). With is_mapped: an LHS molecule is a
    * true reactant iff it has ≥1 mapped atom AND is not among products;
    * otherwise it demotes to agents; an RHS molecule is a product iff
    * mapped and not on the LHS; `[H][H]` lands in reactants whenever it is
    * not a product (extractor.py:286-296: the demoted copy survives the
    * agent cleanup exactly when not in reactants/products, then moves).
    * WITHOUT is_mapped the reference keeps every slot as written — no
    * participation filtering, the reactant/agent partition preserved, with
    * only the [H][H] agents→reactants move (extractor.py:294-296). All
    * outputs sorted distinct. Returns struct(reactants, agents, products).
    */
  def fromRxnStr(rxnStr: Column, isMapped: Column, chem: Chemistry): Column = {
    val parts = split(rxnStr, ">", -1)
    def mols(i: Int): Column =
      filter(transform(split(parts.getItem(i), "[.]"),
        m => chem.canonicalize(m)), m => m.isNotNull && m =!= "")
    val lhs = concat(mols(0), mols(1)) // reactants + declared agents
    val rhsRaw = mols(2)
    // mapped branch: participation logic
    val mProducts = array_sort(array_distinct(
      filter(rhsRaw, m => hasMappedAtom(m) && !array_contains(lhs, m))))
    val mReactants = array_sort(array_distinct(filter(lhs,
      m => (hasMappedAtom(m) || m === "[H][H]") && !array_contains(mProducts, m))))
    val mAgents = array_sort(array_distinct(filter(lhs,
      m => !array_contains(mReactants, m) && !array_contains(mProducts, m))))
    // unmapped branch: everything kept as written
    val uReactants = array_sort(array_distinct(
      when(array_contains(mols(1), "[H][H]"),
        concat(mols(0), array(lit("[H][H]")))).otherwise(mols(0))))
    val uAgents = array_sort(array_distinct(array_remove(mols(1), "[H][H]")))
    val uProducts = array_sort(array_distinct(rhsRaw))
    struct(
      when(isMapped, mReactants).otherwise(uReactants).as("reactants"),
      when(isMapped, mAgents).otherwise(uAgents).as("agents"),
      when(isMapped, mProducts).otherwise(uProducts).as("products"))
  }

  /** E12 — merge labelled conditions into (solvents, agents): union with
    * rxn-string agents, intersect/except against the solvents dimension,
    * order agents transition-metal-first then alphabetical
    * (extract/extractor.py:545-593). */
  def mergeToAgents(rxnAgents: Column, labelledConds: Column,
      solventSet: Seq[String], chem: Chemistry): (Column, Column) = {
    val all = array_distinct(concat(rxnAgents, labelledConds))
    val solvents = array_sort(ArrayOps.intersectSet(all, solventSet))
    val agentsRaw = array_sort(ArrayOps.exceptSet(all, solventSet))
    // stable metal-first: sort key (not-metal, value)
    val keyed = transform(agentsRaw, a =>
      struct(when(chem.hasTransitionMetal(a), 0).otherwise(1).as("k"), a.as("v")))
    val agents = transform(array_sort(keyed), s => s.getField("v"))
    (solvents, agents)
  }

  /** Full no-trust extraction (the paper's default path,
    * extractor.py:689-780 branch trust_labelling=False): rxn-string
    * reactants/products when mapped, labelled conditions merged to
    * solvents/agents, E15/E17/E18/E19/E20/E21 cleanups applied.
    * Output: array-typed reaction table (SURVEY.md §7.1 internal model).
    */
  def extractReactions(nested: DataFrame, cfg: ExtractConfig,
      chem: Chemistry, solventSet: Seq[String],
      replacements: Map[String, String] = Map.empty): DataFrame = {

    // Per-reaction branch (extractor.py:689-740): rxn-string-derived
    // molecules when a valid mapped reaction string exists (and labelling
    // is not trusted); labelled data otherwise — both for
    // trust_labelling=true (always) and as the
    // use_labelling_if_extract_fails fallback (the default).
    val labelledInfo = struct(
      labelled(1, cfg).as("reactants"),
      array().cast("array<string>").as("agents"),
      transform(col("lab_products"), p => p.getField("smiles"))
        .as("products"))
    val withRxn = nested
      .withColumn("rxn_str", rxnStrCol)
      .withColumn("is_mapped", isMappedCol)
      .withColumn("lab_products", labelledProducts(cfg))
      // use_labelling_if_extract_fails=false: a reaction with no valid rxn
      // string is DROPPED instead of falling back to the labelled data
      // (handle_reaction_object returns None, extractor.py:734-735)
      .filter(
        if (cfg.trustLabelling || cfg.useLabellingIfExtractFails) lit(true)
        else col("rxn_str").isNotNull)
      .withColumn("info",
        if (cfg.trustLabelling) labelledInfo
        else when(col("rxn_str").isNotNull,
          fromRxnStr(col("rxn_str"), col("is_mapped"), chem))
          .otherwise(labelledInfo))

    val labelledConds = array_distinct(concat(
      labelled(2, cfg), labelled(3, cfg), labelled(4, cfg)))

    // include_unadded_labelled_molecules_as_agents (extractor.py:714-733,
    // default true): in the rxn-string branch, any labelled molecule (of
    // ANY role, products included) absent from the string-derived
    // reactants/agents/products joins the agents before merge_to_agents.
    val infoAgents: Column =
      if (cfg.trustLabelling || !cfg.includeUnaddedLabelledMolecules)
        col("info.agents")
      else {
        val allLabelled = array_distinct(concat(
          labelled(1, cfg), labelled(2, cfg), labelled(3, cfg), labelled(4, cfg),
          transform(col("lab_products"), p => p.getField("smiles"))))
        val added = concat(col("info.reactants"), col("info.agents"),
          col("info.products"))
        when(col("rxn_str").isNotNull,
          concat(col("info.agents"),
            filter(allLabelled, x => !array_contains(added, x))))
          .otherwise(col("info.agents"))
      }

    val (solv, agents) = mergeToAgents(
      infoAgents, col("labelled_conds"), solventSet, chem)

    val repl: Column => Column =
      c => filter(transform(c, x => ArrayOps.applyReplacements(x, replacements)),
        x => x.isNotNull)

    // trust_labelling keeps the labelled role split (no merge-to-agents,
    // extractor.py:689-697: separate catalyst/reagent/solvent columns)
    val (solvCol, agentsCol) =
      if (cfg.trustLabelling) (array_distinct(labelled(3, cfg)), array().cast("array<string>"))
      else (solv, agents)

    val df = withRxn
      .withColumn("labelled_conds", labelledConds)
      .withColumn("reactants", repl(col("info.reactants")))
      .withColumn("products_raw", repl(col("info.products")))
      .withColumn("reagents",
        if (cfg.trustLabelling) array_distinct(labelled(2, cfg))
        else array().cast("array<string>"))
      .withColumn("catalysts",
        if (cfg.trustLabelling) array_distinct(labelled(4, cfg))
        else array().cast("array<string>"))
      .withColumn("solvents", solvCol)
      .withColumn("agents_pre", agentsCol)
      // E18 — conditions must be disjoint from reactants ∪ products
      .withColumn("agents_pre", array_except(col("agents_pre"),
        concat(col("reactants"), col("products_raw"))))
      .withColumn("solvents", array_except(col("solvents"),
        concat(col("reactants"), col("products_raw"))))
      // E19 — Pd/C exception: metal or charcoal present → drop bare carbon
      .withColumn("agents_pre",
        pdCException(col("agents_pre"), col("procedureDetails"), chem))
      // E15 — drop numeric-string "molecules"
      .withColumn("agents", ArrayOps.dropNumeric(col("agents_pre")))
      // E6/E7 — unit conversions
      .withColumn("temperature", Conversions.temperatureToCelsius(
        col("tempValue"), col("tempUnits"), col("tempControl")))
      // E20 — ice defaults temperature to 0°C
      .withColumn("temperature", iceTemperature(col("temperature"), icePresent))
      .withColumn("rxn_time", Conversions.rxnTimeToHours(
        col("timeValue"), col("timeUnits")))
      // E9 — experiment date
      .withColumn("date_of_experiment",
        Conversions.parseUsDate(col("experimentStart")))
      // E24 — grant date from filename
      .withColumn("grant_date", Conversions.grantDateFromFilename(col("fileName")))
      // E11/E5 — yields re-aligned onto the final products by equality scan
      .withColumn("yields", transform(col("products_raw"), p =>
        try_element_at(
          filter(col("lab_products"), lp => lp.getField("smiles") === p), lit(1))
          .getField("yield")))
      .withColumn("products", col("products_raw"))

    val roleCols =
      if (cfg.trustLabelling)
        Seq(col("reagents"), col("catalysts"))
      else Seq.empty
    df.select(Seq(
      col("fileName").as("extracted_from_file"), col("rxnOrdinal"),
      col("rxn_str"), col("is_mapped"),
      col("reactants"), col("agents"), col("solvents")) ++ roleCols ++ Seq(
      col("products"), col("yields"),
      col("temperature"), col("rxn_time"),
      col("procedureDetails").as("procedure_details"),
      col("date_of_experiment"), col("grant_date")): _*)
  }

  /** E23 — numbered-wide sink view with the reference's sentinel/column
    * conventions (extract/extractor.py:1075-1279). */
  def toWideSink(arrayTyped: DataFrame, widths: Map[String, Int]): DataFrame = {
    val wideCols =
      widths.toSeq.sortBy(_._1).flatMap { case (c, n) =>
        if (c == "yields")
          (0 until n).map(i => try_element_at(col(c), lit(i + 1)).as(f"yield_$i%03d"))
        else ArrayOps.toWide(col(c), c.stripSuffix("s"), n)
      }
    val scalarCols = arrayTyped.columns.filterNot(widths.contains).map(col)
    arrayTyped.select((scalarCols ++ wideCols): _*)
  }
}
