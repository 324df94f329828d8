package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.XHash

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, document fingerprinting. Pure Column expressions —
  * narrow, codegen'd, no shuffles; at 100 TB these run at scan speed.
  */
object TextOps {

  /** Marker-token sets for the n-gram-heuristic language identifier.
    * (Tiny stand-in lexica; the operator shape — per-language token-set
    * intersection scoring + deterministic argmax — is the point.) */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "es" -> Seq("el", "la", "de", "y", "es"))

  /** Language-ID: score = |tokens ∩ markers(lang)|, argmax with fixed
    * preference order (registration order) on ties; "und" (undetermined)
    * when no marker hits. */
  def langId(toks: Column): Column = {
    val scored = langMarkers.map { case (lang, markers) =>
      lang -> size(array_intersect(toks, typedLit(markers)))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), rest) =>
      when(best > 0 && score === best, lit(lang)).otherwise(rest)
    }
  }

  /** Quality-scoring signals (length/punct/stopword ratios). Each ratio is
    * a single division of exact integer counts — deterministic. */
  def nChars(text: Column): Column = length(text)
  def nTokens(toks: Column): Column = size(toks)
  def nUniqueTokens(toks: Column): Column = size(array_distinct(toks))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  def stopwordRatio(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => t.isin(stop: _*))).cast("double") /
      greatest(size(toks), lit(1))

  def meanTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1))

  /** Whitespace vs BPE-ish token counting: alpha runs, digit runs, and
    * single non-space symbols counted separately (a cheap proxy for
    * subword tokenizers; regex kept RE2-compatible for the oracle). */
  def alphaTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+"), lit(0)))
  def digitTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]+"), lit(0)))

  /** PII patterns for [[piiRedact]]. Deliberately RE2-compatible (no
    * lookaround, no backreferences) so the DuckDB oracle runs the SAME
    * pattern text: email local@domain.tld, dotted-quad IPv4, and a
    * phone-shaped 3-3/4 digit-group run. Order matters — emails are
    * redacted first so their digit runs can't half-match as phones. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3,4}\\b", "<PHONE>"))

  /** PII scrubbing: redact emails, IPv4 addresses, and phone-shaped digit
    * groups, each replaced by a typed tag, with per-type match counts
    * (the audit trail a compliance pass needs). Pure regexp Column
    * expressions — scan-speed, codegen'd, no shuffle at any scale. Counts
    * are taken per-pattern on the text as that pattern sees it (after the
    * earlier redactions), so counts always agree with what was replaced.
    * Returns (cleanText, Seq(type -> count)).
    */
  def piiRedact(text: Column): (Column, Seq[(String, Column)]) = {
    val (cleaned, counts) =
      piiPatterns.foldLeft((text, Seq.empty[(String, Column)])) {
        case ((t, acc), (name, pat, tag)) =>
          val n = size(regexp_extract_all(t, lit(pat), lit(0)))
          (regexp_replace(t, pat, tag), acc :+ (name -> n))
      }
    (cleaned, counts)
  }

  /** Text normalization for robust exact-dedup: collapse all whitespace
    * runs to single spaces, trim, lowercase. The cheap high-recall
    * normalizer every corpus dedup runs before hashing (case/format
    * variants of the same page hash identically afterwards). */
  def normalizeWs(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact-duplicate groups under a normalizer: return each doc with its
    * canonical representative (lowest id in its normalized-text group) and
    * the group size. One window over the md5 digest of the normalized text
    * — a single exchange of (id, 32-byte digest) pairs, with the
    * normalize+hash projection evaluated exactly once per doc. The
    * agg+join alternative re-shuffles the keyed rows a second time for the
    * join and re-evaluates the normalizer on the probe side; dup groups
    * are small, so the per-key window sort is bounded. Never pairwise
    * (same digest-key convention as q26's exactDedup). */
  def normalizedDupGroups(docs: org.apache.spark.sql.DataFrame, id: String,
      text: String): org.apache.spark.sql.DataFrame = {
    val keyed = docs.select(col(id), md5(normalizeWs(col(text))).as("__nk"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__nk")
    keyed.select(col(id),
      min(col(id)).over(w).as("canonical_id"),
      count(lit(1)).over(w).as("group_size"))
  }

  /** Fixed-width "lines": the token array cut into consecutive `chunk`-token
    * segments (last one partial) — the deterministic stand-in for paragraph
    * boundaries on corpora without newlines. Entirely map-side: one
    * transform over the chunk-index sequence, two slices per line. */
  def docLines(toks: Column, chunk: Int): Column =
    when(size(toks) > 0,
      transform(sequence(lit(0), ((size(toks) - 1) / chunk).cast("int")),
        i => array_join(slice(toks, i * chunk + 1, lit(chunk)), " ")))
      .otherwise(array().cast("array<string>"))

  /** CCNet/C4-style boilerplate removal: drop every line that appears (as
    * an exact token sequence) in >= `minDocs` DISTINCT documents, then
    * reassemble each document from its surviving lines in order. The
    * corpus-frequency analogue of [[normalizedDupGroups]] at line rather
    * than document granularity (Wenzek et al. 2019 dedup common crawl
    * paragraphs this way before LM training).
    *
    * Scale shape: chunking is map-side ([[docLines]]); one shuffle counts
    * line document-frequency; the frequent set joins back as a left_anti
    * on the line text; reassembly is one groupBy(id) whose per-group state
    * is the document's own lines (bounded by doc length). No windows, no
    * per-token shuffle — the exchanged rows are (id, line), ~1/chunk of
    * the token count. Documents whose every line is boilerplate drop out
    * (nothing left to keep) — callers wanting them keep an outer join on
    * ids. */
  def removeFrequentLines(docs: org.apache.spark.sql.DataFrame, id: String,
      textCol: String, chunk: Int, minDocs: Long): org.apache.spark.sql.DataFrame = {
    val lines = docs.select(col(id),
      posexplode(docLines(split(col(textCol), " "), chunk)).as(Seq("lineno", "line")))
    val frequent = lines.groupBy("line")
      .agg(countDistinct(col(id)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("line")
    lines.join(frequent, Seq("line"), "left_anti")
      .groupBy(col(id))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("lineno"), col("line")))),
          s => s.getField("line")), " ").as("text_clean"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** Non-distinct word n-grams (frequency semantics — unlike
    * [[Dedup.wordShingles]], which distincts per doc for set containment).
    * Empty when the document has fewer than n tokens. n=2 runs as one
    * zip_with over the array and its shifted self (two slices total)
    * instead of a per-position slice+join allocation — ~2× on the bigram
    * scan, same output. */
  def ngrams(toks: Column, n: Int): Column = {
    // the general path let-binds toks (singleton transform) so a CALLER'S
    // computed expression — e.g. tokens(text), a regexp split — evaluates
    // once per row, not once per gram position inside the window lambda
    // (the same quadratic capture the winnowing fix removed)
    val general =
      try_element_at(transform(array(toks), t =>
        when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => array_join(slice(t, i, lit(n)), " ")))
          .otherwise(array().cast("array<string>"))), lit(1))
    if (n == 2)
      when(size(toks) >= 2,
        zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => concat_ws(" ", a, b)))
        .otherwise(array().cast("array<string>"))
    else general
  }

  /** Document fingerprint: rolling polynomial hash over token hashes,
    * mod 2^31-1 — order-sensitive (unlike a bag-of-words hash), sequential
    * fold reproduced exactly by the oracle's list_reduce. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => XHash.bucketHash("fp", t) % 1000000007L),
      lit(7L),
      (acc, h) => (acc * 31 + h) % 2147483647L)

  /** Frequency-ranked vocabulary fit: the top-`k` corpus terms get dense
    * ids 0..k-1 (count desc, term asc on ties) — the tokenizer-fit /
    * label-index boundary of a training pipeline. Input: exploded (term)
    * rows.
    *
    * Scale shape: hash aggregate (map-side partial) → optional count-floor
    * prune → `orderBy.limit(k)`, which Spark plans as TakeOrderedAndProject:
    * each partition keeps its own top-k and only k·p candidate rows merge —
    * the full vocabulary is NEVER sorted on one reducer. The final dense-id
    * rank window runs over exactly k rows and reuses the limit's
    * single-partition output, so no extra exchange appears (PlanSpec).
    */
  def fitVocab(terms: org.apache.spark.sql.DataFrame, k: Int,
      minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term").asc)
    terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .withColumn("tid", (row_number().over(w) - 1).cast("int"))
      .select("term", "tid")
  }

  /** TF-IDF term scores over a tokenized corpus: score(d, t) =
    * tf(d,t) · idf(t) with tf = term_count/doc_len and idf = N/df — kept as
    * the exact rational (tc·N)/(dl·df) evaluated in ONE double division, so
    * Spark and the DuckDB oracle produce bit-identical scores (no
    * transcendental log, whose last-ulp behaviour differs across libm
    * implementations).
    *
    * Scale shape: one explode, two hash aggregates (per-(doc,term) and
    * per-term), a vocabulary-bounded join on term, a doc-bounded join on id,
    * and the corpus count N broadcast as a 1-row cross join. No all-pairs
    * anything; shuffles are bounded by |vocab| and |docs|, not tokens².
    * Returns (id, term, tc, dl, df, score).
    */
  def tfIdfScores(docs: org.apache.spark.sql.DataFrame, id: String,
      toks: String): org.apache.spark.sql.DataFrame = {
    val u = docs.select(col(id), explode(col(toks)).as("term"))
    val tf = u.groupBy(col(id), col("term")).agg(count(lit(1)).as("tc"))
    // dl from tf, not a second pass over the exploded tokens: sum(tc) over
    // the doc partition (bounded by per-doc vocabulary, skew-safe). df as a
    // map-side-combinable aggregate over tf — NOT a count-over-term window,
    // which would co-locate every row of a hot term on one reducer. Both
    // consumers read the same tf exchange, which Spark reuses.
    val withDl = tf.withColumn("dl",
      sum(col("tc")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(id)))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = docs.select(count(lit(1)).as("nd"))
    withDl
      .join(df, Seq("term"))
      .crossJoin(broadcast(nd))
      .withColumn("score",
        (col("tc") * col("nd")).cast("double") / (col("dl") * col("df")))
      .select(col(id), col("term"), col("tc"), col("dl"), col("df"), col("score"))
  }

  /** Sequence packing (concat-and-chunk): order documents deterministically
    * (seeded hash shuffle — the packing order a pretraining pipeline
    * randomizes), lay them on one global token tape, and give each document
    * its start offset plus the id of the fixed-size context chunk that
    * offset falls in. This is the standard LLM-pretraining packing step
    * (documents concatenate; the tape is sliced every `ctxLen` tokens).
    *
    * Scale shape: a global running total with NO global-order window. The
    * 60-bit order hash's top 12 bits form 4096 order-preserving buckets;
    * pass 1 aggregates per-bucket token totals map-side (≤4096 rows) and a
    * cumulative sum over that TINY histogram yields each bucket's tape
    * start; pass 2 adds a within-bucket running sum (windows partitioned by
    * bucket — ~n/4096 rows each, never one reducer). Offsets are identical
    * to the single-window formulation: global prefix = bucket start +
    * in-bucket prefix.
    *
    * Returns (id, n_tokens, tok_offset, chunk_id).
    */
  def packChunks(docs: org.apache.spark.sql.DataFrame, id: String,
      nTokens: Column, ctxLen: Long, seed: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    // Both passes consume `rows`, and `nTokens` typically hides the full
    // tokenizer (regex over every document) — unpinned, pass 2 re-tokenizes
    // the corpus (r6 bench: 8.4 s at sf0.1 vs 0.5 warm). Four narrow longs
    // per row; MEMORY_AND_DISK spills/evicts safely at 100 TB.
    val rows = docs.select(col(id), nTokens.cast("long").as("__t"))
      .withColumn("__h", XHash.bucketHash(seed, col(id).cast("string")))
      .withColumn("__b", shiftright(col("__h"), 48))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: bucket histogram + exclusive prefix sum. The cumsum window is
    // deliberately unpartitioned — it runs over the ≤4096-row histogram,
    // not the data (same trick as Relational.stratifiedSample).
    val hist = rows.groupBy("__b").agg(sum(col("__t")).as("__bktot"))
      .withColumn("__start", coalesce(
        sum(col("__bktot")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__b", "__start")
    // pass 2: in-bucket exclusive running sum, bucket-partitioned
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(id))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(hist), "__b")
      .withColumn("tok_offset",
        col("__start") + coalesce(sum(col("__t")).over(w), lit(0L)))
      .select(col(id), col("__t").as("n_tokens"), col("tok_offset"),
        // integral div, not floor(double /): exact past 2^53 tokens
        expr(s"tok_offset div ${ctxLen}L").as("chunk_id"))
  }

  /** T5-style span corruption (Raffel et al. 2020, arXiv:1910.10683 §3.1.4):
    * mask deterministic token spans, replace each span with one numbered
    * sentinel in the input, and emit the target as sentinel-prefixed masked
    * spans — the denoising-pretraining pair generator.
    *
    * The randomness is re-specified as a hash phase (the engine's
    * seeded-random discipline): with phase h = hash(seed, id) mod `period`,
    * position p is masked iff (p+h) mod period < `spanLen` — fixed-length
    * spans every `period` tokens (corruption rate spanLen/period), offset
    * differently per document, reproducible across engines and cluster
    * sizes. A document beginning mid-span (p=0 masked, phase≠0) starts a
    * clipped span there.
    *
    * Pure Column expression (HOFs over the token array) — map-only, no
    * shuffle, scan speed at 100 TB. Returns struct(n_spans, input_text,
    * target_text); interleaving input sentinels with target spans
    * reconstructs the original (LlmOpsSpec locks the round-trip).
    */
  def spanCorrupt(toks: Column, idKey: Column, seed: String = "t5",
      period: Int = 10, spanLen: Int = 3): Column = {
    require(period > spanLen && spanLen > 0,
      s"need 0 < spanLen < period: $spanLen/$period")
    val h = pmod(XHash.bucketHash(seed, idKey.cast("string")), lit(period.toLong))
    val n = size(toks)
    val pos = when(n > lit(0), sequence(lit(0), n - 1))
      .otherwise(array().cast("array<int>"))
    def phase(p: Column): Column = pmod(p + h, lit(period.toLong))
    val starts = filter(pos, p =>
      phase(p) === 0 || (p === 0 && phase(p) < spanLen))
    def sentinel(j: Column): Column =
      concat(lit("<extra_id_"), j.cast("string"), lit(">"))
    val inputArr = filter(
      transform(pos, p =>
        when(phase(p) >= spanLen, element_at(toks, p + 1))
          .when(array_position(starts, p) > 0,
            sentinel(array_position(starts, p) - 1))
          .otherwise(lit(null))),
      x => x.isNotNull)
    val targetArr = flatten(transform(starts, (p, j) =>
      concat(array(sentinel(j)),
        slice(toks, p + 1, (lit(spanLen.toLong) - phase(p)).cast("int")))))
    struct(
      size(starts).cast("long").as("n_spans"),
      array_join(inputArr, " ").as("input_text"),
      array_join(targetArr, " ").as("target_text"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, arXiv:2207.14255):
    * split the token sequence at two deterministic cut points and emit the
    * PSM (prefix–suffix–middle) reordering `prefix <SUF> suffix <MID>
    * middle` — the infilling-pretraining rewrite for code models. Cuts are
    * hash-derived (uniform over the n+1 gap positions, second cut uniform
    * past the first), so the transform is reproducible across engines and
    * partitionings. Map-only narrow projection; returns struct(n_prefix,
    * n_middle, n_suffix, fim_text).
    */
  def fimSplit(toks: Column, idKey: Column, seed: String = "fim"): Column = {
    val n = size(toks).cast("long")
    val c1 = pmod(XHash.bucketHash(seed + "1", idKey.cast("string")), n + 1)
    val c2 = c1 + pmod(XHash.bucketHash(seed + "2", idKey.cast("string")),
      n - c1 + 1)
    val prefix = slice(toks, lit(1), c1.cast("int"))
    val middle = slice(toks, (c1 + 1).cast("int"), (c2 - c1).cast("int"))
    val suffix = slice(toks, (c2 + 1).cast("int"), (n - c2).cast("int"))
    struct(
      c1.as("n_prefix"),
      (c2 - c1).as("n_middle"),
      (n - c2).as("n_suffix"),
      array_join(
        concat(prefix, array(lit("<SUF>")), suffix, array(lit("<MID>")), middle),
        " ").as("fim_text"))
  }

  /** Per-document sliding-window chunking with overlap — the RAG-indexing /
    * long-context-eval counterpart of [[packChunks]] (that one concatenates
    * across documents; this one windows WITHIN each document, preserving
    * provenance). Window `win` tokens, stride `stride` (< win ⇒ overlap of
    * win−stride tokens); the last window is the trailing partial one, and a
    * document shorter than `win` yields exactly one chunk.
    *
    * Pure per-row generate (sequence + explode of start offsets, then an
    * array slice): no shuffle, no state — chunking 100 TB is a map-only
    * stage whose output partitioning follows the input.
    *
    * Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    */
  def slidingChunks(docs: org.apache.spark.sql.DataFrame, id: String,
      toks: Column, win: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(win > 0 && stride > 0 && stride <= win,
      s"need 0 < stride <= win: win=$win stride=$stride")
    // #chunks = 1 + ceil(max(0, n-win)/stride); integer-only, and the div
    // numerator is clamped non-negative first (floor-vs-trunc division
    // semantics differ between engines on negative operands)
    docs.select(col(id), toks.as("__toks"))
      .withColumn("__nc", lit(1) +
        expr(s"(greatest(size(__toks) - $win, 0) + $stride - 1) div $stride"))
      .select(col(id), col("__toks"),
        posexplode(sequence(lit(0), col("__nc") - 1)))
      .select(col(id), col("pos").cast("long").as("chunk_id"),
        slice(col("__toks"), col("pos") * stride + 1, lit(win)).as("__c"))
      .select(col(id), col("chunk_id"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** Greedy maximal-munch subword segmentation — the WordPiece/BPE
    * vocabulary-application step (Wu et al. 2016, arXiv:1609.08144 §4.1;
    * Sennrich et al. 2016, arXiv:1508.07909 learn the vocab, this applies
    * it): from the current position, emit the LONGEST vocabulary entry
    * matching there and advance past it; a position no entry matches
    * collapses the whole token to `<unk>` (WordPiece semantics). The vocab
    * is an offline-trained artifact embedded as a plan literal (same
    * guarded driver boundary as the PQ codebook) — encoding is a narrow
    * codegen'd projection, scan-speed at any corpus size, no shuffle.
    *
    * Expressed as a fold over the token's character positions with a
    * (pos, pieces) struct accumulator: steps before the cursor pass
    * through, the step AT the cursor matches-and-advances. Longest-match
    * selection is `element_at(filter(vocabByLenDesc, prefix-match), 1)`
    * with the literal pre-sorted (length desc, value asc) — so ties and
    * order are deterministic and the DuckDB oracle replays the identical
    * fold with list_reduce.
    */
  def subwordEncode(tok: Column, vocab: Seq[String]): Column = {
    require(vocab.nonEmpty && vocab.forall(_.nonEmpty),
      "subwordEncode: vocab entries must be non-empty")
    val sorted = typedLit(sortVocab(vocab))
    val init = struct(lit(1).as("pos"), array().cast("array<string>").as("pieces"))
    val folded = aggregate(
      sequence(lit(1), length(tok)), init,
      (st, i) => when(i =!= st.getField("pos"), st).otherwise {
        // try_element_at: under ANSI semantics a plain element_at throws
        // on the no-match empty array instead of yielding the unk branch
        val m = try_element_at(
          filter(sorted, v => substring(tok, st.getField("pos"), length(v)) === v), lit(1))
        when(m.isNull,
          struct((length(tok) + 1).as("pos"),
            array(lit("<unk>")).as("pieces")))
          .otherwise(struct((st.getField("pos") + length(m)).as("pos"),
            concat(st.getField("pieces"), array(m)).as("pieces")))
      })
    // empty input guard: sequence(1, 0) would DESCEND in Spark
    when(length(tok) === 0, array().cast("array<string>"))
      .otherwise(folded.getField("pieces"))
  }

  /** [[subwordEncode]]'s deterministic match order: length desc, value
    * asc. Shared with oracle-SQL generation so both engines scan the
    * vocabulary identically. */
  def sortVocab(vocab: Seq[String]): Seq[String] =
    vocab.distinct.sortBy(v => (-v.length, v))

  /** Composite Gopher-style document quality rules (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", arXiv:2112.11446 §A1.1 — the same heuristic family as C4,
    * Raffel et al. 2020): token-count bounds, mean-token-length bounds,
    * minimum distinct-stopword evidence, minimum alphabetic-token ratio,
    * and maximum single-token dominance. Thresholds are parameters — the
    * published constants assume web prose; callers tune them per corpus.
    *
    * Emits each signal alongside the composite `keep`, because a corpus
    * pipeline audits WHY documents die, not just how many. Every ratio is
    * one integer division in double (cross-engine exact). Pure Column
    * expressions over the token array — a map-only scan at any corpus
    * size; the single-token-dominance fold is O(distinct·n) per row,
    * bounded by document length, never a shuffle.
    *
    * Returns (signals in order): n_toks, mean_len, stop_hits, alpha_frac,
    * top_frac, keep.
    */
  def gopherQuality(toks: Column, stop: Seq[String],
      minToks: Int, maxToks: Int,
      minMeanLen: Double, maxMeanLen: Double,
      minStopHits: Int, minAlphaFrac: Double,
      maxTopFrac: Double): Seq[(String, Column)] = {
    val n = size(toks)
    val nSafe = greatest(n, lit(1))
    val meanLen = meanTokenLen(toks)
    val stopHits = size(array_intersect(toks, typedLit(stop)))
    val alphaFrac =
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / nSafe
    // let-bound (see ngrams): the distinct-token outer loop must not
    // re-evaluate a computed toks expression once per distinct element
    val topCnt = try_element_at(transform(array(toks), bound =>
      aggregate(array_distinct(bound), lit(0),
        (m, d) => greatest(m, size(filter(bound, t => t === d))))), lit(1))
    val topFrac = topCnt.cast("double") / nSafe
    val keep = n.between(minToks, maxToks) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      stopHits >= minStopHits && alphaFrac >= minAlphaFrac &&
      topFrac <= maxTopFrac
    Seq("n_toks" -> n.cast("long"), "mean_len" -> meanLen,
      "stop_hits" -> stopHits.cast("long"), "alpha_frac" -> alphaFrac,
      "top_frac" -> topFrac, "keep" -> keep)
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD —
    * the MOSS algorithm): hash every `k`-token gram, slide a window of `w`
    * consecutive gram hashes, record each window's minimum hash; the
    * distinct recorded hashes are the document's fingerprint set. The
    * local-selection guarantee: any shared token run of length ≥ w+k−1
    * between two documents shares at least one fingerprint, at ~2/(w+1)
    * the storage of the full gram set — the classic recall/size dial
    * between exact shingling (q49) and MinHash (q27).
    *
    * Pure Column expression — narrow, codegen'd: fingerprinting 100 TB is
    * a map-only scan whose output partitioning follows the input. Fewer
    * than `w` gram hashes ⇒ a single window over them all; no grams ⇒
    * empty set.
    */
  def winnow(toks: Column, k: Int, w: Int): Column =
    graft.plans.WinnowExpr(toks, "winnow", k, w)

  /** Exact duplicated-substring spans — the distributable n-gram
    * formulation of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499), whose suffix-array pass
    * finds byte runs repeated in the corpus. Here a repeated run is a
    * maximal chain of `n`-token grams each occurring ≥ 2 times corpus-wide
    * (intra- or cross-document); grams whose start positions lie within
    * `n` tokens merge into one span (their token ranges overlap or touch).
    * Returns one row per maximal span: (id, span_start, span_end, n_grams),
    * token positions 1-based inclusive.
    *
    * Scale shape: explode to (id, pos, gram-hash) → one hash aggregate
    * over the gram dictionary (map-side combined) → hash join back → two
    * per-document windows (lag + running sum; per-doc partitions, never a
    * global sort). Shuffles are bounded by token and dictionary counts —
    * nothing is pairwise. A suffix array finds arbitrary-length repeats;
    * the fixed-n gram chain is the standard approximation that
    * distributes, and misses only repeats shorter than n tokens.
    */
  def duplicateSpans(docs: org.apache.spark.sql.DataFrame, id: String,
      toks: Column, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs.select(col(id),
        posexplode(ngrams(toks, n)).as(Seq("__p", "__g")))
      .select(col(id), (col("__p") + 1).cast("long").as("pos"),
        XHash.bucketHash("sdup", col("__g")).as("__h"))
    val dupHash = grams.groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= 2).select("__h")
    val hits = grams.join(dupHash, Seq("__h")).select(col(id), col("pos"))
    val wl = Window.partitionBy(id).orderBy("pos")
    hits
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(wl) <= n, 0).otherwise(1))
      .withColumn("__grp",
        sum(col("__brk")).over(wl.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(id), col("__grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(id), col("span_start"), col("span_end"), col("n_grams"))
  }

  /** n-gram LM coverage scoring — the exact-arithmetic stand-in for
    * perplexity-based corpus filtering (CCNet, Wenzek et al. 2020,
    * arXiv:1911.00359 score documents with a KenLM model; a transcendental
    * log's last-ulp behavior differs across engines, so this scores by the
    * fraction of a document's distinct n-grams attested in a reference
    * corpus — one integer division, cross-engine exact). Low coverage ⇒
    * out-of-domain or noisy text, same decision boundary shape.
    *
    * Scale shape: identical to [[contaminationCheck]] — the reference side
    * collapses to distinct grams, the scored side semi-joins against it;
    * shuffles bounded by distinct-gram counts, nothing pairwise. Returns
    * (id, n_grams, n_hit, coverage).
    */
  def lmCoverage(scored: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      id: String, grams: String): org.apache.spark.sql.DataFrame = {
    val refSet = reference.select(explode(col(grams)).as("g")).distinct()
    val sizes = scored.select(col(id), size(col(grams)).cast("long").as("n_grams"))
    val hits = scored.select(col(id), explode(col(grams)).as("g"))
      .join(refSet, Seq("g"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq(id), "left")
      .select(col(id), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L))).as("coverage"))
  }

  /** Benchmark decontamination: flag evaluation documents sharing any word
    * n-gram with the training corpus (the standard containment check run
    * before training on scraped data; the reference's C20 leakage move is
    * the same shape at reaction granularity).
    *
    * Scale shape: training shingles explode to (shingle) keys and the check
    * is one left-semi-style aggregate join — shuffle is bounded by distinct
    * shingles, never pairs of documents. Returns (id, n_shared, is_clean).
    */
  def contaminationCheck(test: org.apache.spark.sql.DataFrame,
      train: org.apache.spark.sql.DataFrame,
      id: String, shingles: String): org.apache.spark.sql.DataFrame = {
    val trainShingles = train
      .select(explode(col(shingles)).as("sh")).distinct()
    val testExploded = test.select(col(id), explode(col(shingles)).as("sh"))
    val hits = testExploded.join(trainShingles, Seq("sh"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("n_shared"))
    test.select(col(id))
      .join(hits, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) === 0).as("is_clean"))
  }

  /** [[contaminationCheck]] with a bloom prefilter on the training side —
    * the 100 TB shape. The exact check's cost driver is `distinct()` over
    * ALL training shingles: a full-width shuffle of the big corpus. Here a
    * bloom filter is built over the (small) benchmark side's shingles with
    * `df.stat.bloomFilter` (distributed aggregate, ~1.2 MB per 1M items at
    * 1% fpp), broadcast to the scan of the training side, and only bloom
    * hits — true overlaps plus the fpp sliver — reach the exchange. The
    * final semi-join against those candidates keeps the result EXACT: a
    * bloom has no false negatives, so candidates ⊇ train∩test shingles,
    * and candidates ⊆ train shingles means false positives cannot match a
    * test shingle that the exact check would not match. Returns the same
    * (id, n_shared, is_clean) as [[contaminationCheck]], bit-identical.
    */
  def contaminationCheckBloom(test: org.apache.spark.sql.DataFrame,
      train: org.apache.spark.sql.DataFrame,
      id: String, shingles: String,
      expectedTestShingles: Long = -1L, fpp: Double = 0.01): org.apache.spark.sql.DataFrame = {
    val testShingles = test.select(explode(col(shingles)).as("sh"))
      .filter(col("sh").isNotNull)
    // Sizing: callers may pass an expected count; otherwise one cheap count
    // of the small benchmark side keeps the fpp honest at any scale (a
    // non-distinct count only oversizes the filter, which is safe). The
    // shingle set is persisted so the count and the bloom aggregate share
    // one computation — both are eager actions, so the persist lifecycle
    // never escapes this method.
    val derive = expectedTestShingles <= 0
    if (derive) testShingles.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected =
      if (derive) testShingles.count() else expectedTestShingles
    // eager: one aggregate job over the SMALL side builds the filter
    val bf = testShingles.stat.bloomFilter("sh", math.max(expected, 1L), fpp)
    if (derive) testShingles.unpersist(blocking = false)
    // The filter rides inside the UDF closure — part of the per-stage task
    // binary, which Spark itself torrent-broadcasts once per stage and whose
    // lifecycle the ContextCleaner owns. No explicit Broadcast handle means
    // nothing driver-resident leaks across invocations.
    val bloomHit = udf((s: String) => s != null && bf.mightContainString(s))
      .withName("bloom_might_contain")
    val candidates = train
      .select(explode(col(shingles)).as("sh"))
      .filter(bloomHit(col("sh")))
      .distinct()
    val testExploded = test.select(col(id), explode(col(shingles)).as("sh"))
    val hits = testExploded.join(candidates, Seq("sh"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("n_shared"))
    test.select(col(id))
      .join(hits, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) === 0).as("is_clean"))
  }

  /** Learn `rounds` BPE merges over a (word, freq) table — the
    * vocabulary-induction loop of a subword tokenizer (q84 consumes the
    * RESULT of such a fit; this is the fit itself). Each round counts
    * adjacent-symbol pairs weighted by word frequency (one map-side-
    * combined aggregate over the distinct-word table, never the raw
    * corpus), pulls ONLY the single best pair to the driver (the bounded
    * driver-pull discipline: 1 row, like the codebook guard), and rewrites
    * the symbol sequences with one narrow string projection. The merge
    * rewrite is leftmost non-overlapping with scan-continue-after
    * (`replace` semantics, identical in Spark and DuckDB) — the documented
    * variant of BPE's greedy pass; ties break to the lexicographically
    * smallest pair.
    *
    * Returns `rounds` rows: (step, pair, cnt, n_tokens) where n_tokens is
    * the corpus token count AFTER that round's merge. Sequences are
    * re-checkpointed per round so lineage stays flat across iterations.
    */
  def bpeLearn(words: org.apache.spark.sql.DataFrame, wordCol: String,
      freqCol: String, rounds: Int): org.apache.spark.sql.DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    var cur = words.select(
        trim(regexp_replace(col(wordCol), "(.)", "$1 ")).as("r"),
        col(freqCol).cast("long").as("f"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    var step = 1
    while (step <= rounds) {
      val best = cur
        .select(explode(ngrams(split(col("r"), " "), 2)).as("g"), col("f"))
        .groupBy("g").agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("g")).limit(1).collect()
      if (best.isEmpty) { step = rounds + 1 } // nothing left to merge
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        cur = cur.select(
            trim(call_function("replace",
              concat(lit(" "), col("r"), lit(" ")),
              lit(" " + pair + " "), lit(" " + merged + " "))).as("r"),
            col("f"))
          .localCheckpoint()
        val nTokens = cur
          .agg(sum(col("f") * size(split(col("r"), " "))).as("n"))
          .head().getLong(0)
        out += ((step, pair, cnt, nTokens))
        step += 1
      }
    }
    out.toSeq.toDF("step", "pair", "cnt", "n_tokens")
  }

  /** Gopher-style repetition signals, computed entirely map-side: the
    * most-repeated bigram's multiplicity via a run-length fold over the
    * SORTED bigram list (sorting groups equal grams adjacently, so the
    * longest run IS the max multiplicity), plus the duplicated-token
    * fraction. No per-doc shuffle — repetition scoring must ride the scan
    * at corpus scale, not round-trip through a (doc, gram) exchange. The
    * fold state is a (prev, run, best) struct; empty/one-token docs yield
    * top count 0. */
  def repetitionSignals(toks: Column): Column = {
    val bg = sort_array(ngrams(toks, 2))
    val top = aggregate(
      bg,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val nTokens = size(toks)
    val nDistinct = size(array_distinct(toks))
    // |bigrams| = max(n_tokens - 1, 0): don't re-evaluate the sorted array
    val nBigrams = when(nTokens >= 2, nTokens - 1).otherwise(lit(0))
    struct(
      nTokens.cast("long").as("n_tokens"),
      top.as("top_bigram_n"),
      nBigrams.cast("long").as("n_bigrams"),
      when(nTokens > 0,
        (nTokens - nDistinct).cast("double") / nTokens.cast("double"))
        .as("dup_token_frac"))
  }
}
