package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayOps, XHash}
import graft.operators.Dedup

/** Deduplication operator coverage on the `documents` table. Since the
  * synthetic corpus has no natural duplicates, each query constructs a
  * deterministic duplicated/mutated corpus first (exact copies of every
  * 10th doc; near-dup "mutants" with the first token replaced), so the
  * dedup machinery demonstrably *finds* something and the oracle can
  * reproduce it.
  */
object DedupQueries {

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  /** Shingle CTE over an aliased (doc_id, toks) relation. */
  private def shingleSql(src: String): String =
    s"""SELECT doc_id,
       |  CASE WHEN len(toks) >= 3
       |       THEN list_distinct(list_transform(range(1, len(toks) - 1),
       |              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |       ELSE [array_to_string(toks, ' ')] END AS sh
       |FROM $src""".stripMargin

  // Mirrors Dedup.minhashSig: one md5 per shingle, k xor-masked views.
  private val mhHash0 = XHash.bucketHashSql("mh0", "s")
  private val mhMask = XHash.bucketHashSql("mhmask", "cast(j as varchar)")

  private def sigSql(src: String): String =
    s"""SELECT doc_id, sh,
       |  list_transform(range(0, 16), j ->
       |    list_min(list_transform(
       |      list_transform(sh, s -> $mhHash0), h -> xor(h, $mhMask)))) AS sig
       |FROM $src""".stripMargin

  /** Spark-side mutated corpus: docs ∪ first-token-replaced copies.
    * Fanned out below the tokenize projection — the shingle/signature
    * stages above this scan otherwise run single-task (Layout.fanOut). */
  private def mutantCorpus(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val t = graft.operators.Layout.fanOut(Tables.documents(s, dir))
      .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
    val m = t.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(array(lit("zzz")),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0)))).as("toks"))
    t.unionByName(m)
  }

  private val mutantCorpusSql =
    s"""$toksCte,
       |m AS (SELECT doc_id + 1000000 AS doc_id, ['zzz'] || toks[2:] AS toks FROM t),
       |c AS (SELECT doc_id, toks FROM t UNION ALL SELECT doc_id, toks FROM m)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: content-digest aggregate, keep lowest id.
    QueryDef(
      "q26_exact_dedup",
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT doc_id FROM c
        |QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
      val corpus = d.select("doc_id", "text").unionByName(
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      Dedup.exactDedup(corpus, col("text"), col("doc_id")).select("doc_id")
    },

    // MinHash signature + LSH band key (per-doc sketch columns).
    QueryDef(
      "q27_minhash_sig",
      s"""$toksCte,
         |sh AS (${shingleSql("t")}),
         |sig AS (${sigSql("sh")})
         |SELECT doc_id, sig[1] AS mh0, sig[2] AS mh1,
         |  md5(concat('0', chr(1), array_to_string(
         |    list_transform(sig[1:4], v -> cast(v as varchar)), chr(1)))) AS band0
         |FROM sig""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
      t.withColumn("sh", Dedup.wordShingles(col("toks"), 3))
        .withColumn("sig", Dedup.minhashSig(col("sh"), 16))
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("mh0"),
          element_at(col("sig"), 2).as("mh1"),
          element_at(Dedup.bandKeys(col("sig"), 4, 4), 1).as("band0"))
    },

    // MinHash+LSH near-dup pairs: band-bucket join + exact Jaccard verify.
    QueryDef(
      "q28_minhash_lsh_pairs",
      s"""$mutantCorpusSql,
         |sh AS (${shingleSql("c")}),
         |sig AS (${sigSql("sh")}),
         |bk AS (SELECT doc_id, unnest(list_transform(range(0, 4), b ->
         |         md5(concat(cast(b as varchar), chr(1), array_to_string(
         |           list_transform(sig[(b*4+1):(b*4+4)], v -> cast(v as varchar)),
         |           chr(1)))))) AS bk
         |       FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bk a JOIN bk b USING (bk) WHERE a.doc_id < b.doc_id)
         |SELECT a_id, b_id,
         |  cast(len(list_intersect(x.sh, y.sh)) as int) AS n_common,
         |  cast(len(list_distinct(x.sh || y.sh)) as int) AS n_union
         |FROM cand
         |JOIN sh x ON x.doc_id = a_id
         |JOIN sh y ON y.doc_id = b_id
         |WHERE cast(len(list_intersect(x.sh, y.sh)) as double)
         |      / len(list_distinct(x.sh || y.sh)) >= 0.5""".stripMargin) { (s, dir) =>
      val corpus = mutantCorpus(s, dir)
        .withColumn("sh", Dedup.wordShingles(col("toks"), 3))
      Dedup.minhashLshPairs(corpus, "doc_id", "sh", k = 16, bands = 4, threshold = 0.5)
    },

    // SimHash 60-bit sketch.
    QueryDef(
      "q29_simhash",
      s"""$toksCte,
         |hs AS (SELECT doc_id,
         |         list_transform(toks, tk -> ${XHash.bucketHashSql("sim", "tk")}) AS hs
         |       FROM t)
         |SELECT doc_id,
         |  cast(list_sum(list_transform(range(0, 60), j ->
         |    CASE WHEN 2 * len(list_filter(hs, h -> ((h >> j) & 1) = 1)) > len(hs)
         |         THEN (cast(1 as bigint) << j) ELSE 0 END)) as bigint) AS simhash
         |FROM hs""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), Dedup.simhash60(col("toks")).as("simhash"))
    },

    // n-gram Jaccard similarity kernel: each doc vs its mutant.
    QueryDef(
      "q30_ngram_jaccard",
      s"""$mutantCorpusSql,
         |sh AS (${shingleSql("c")})
         |SELECT a.doc_id AS doc_id,
         |  cast(len(list_intersect(a.sh, b.sh)) as int) AS n_common,
         |  cast(len(list_distinct(a.sh || b.sh)) as int) AS n_union,
         |  cast(len(list_intersect(a.sh, b.sh)) as double)
         |    / len(list_distinct(a.sh || b.sh)) AS jacc
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000""".stripMargin) { (s, dir) =>
      val sh = mutantCorpus(s, dir)
        .withColumn("sh", Dedup.wordShingles(col("toks"), 3))
      val a = sh.select(col("doc_id"), col("sh").as("a_sh"))
      val b = sh.select((col("doc_id") - 1000000L).as("doc_id"), col("sh").as("b_sh"))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          size(array_intersect(col("a_sh"), col("b_sh"))).as("n_common"),
          size(array_union(col("a_sh"), col("b_sh"))).as("n_union"),
          Dedup.jaccard(col("a_sh"), col("b_sh")).as("jacc"))
    },

    // Incremental near-dup pairing: the mutants play the "newly crawled"
    // delta against the standing corpus — the band join is corpus×delta,
    // never corpus×corpus, so an increment's dedup cost scales with the
    // increment. Same signatures/verify as q28; old-old pairs never
    // regenerate.
    QueryDef(
      "q106_incremental_neardup",
      s"""$mutantCorpusSql,
         |sh AS (${shingleSql("c")}),
         |sig AS (${sigSql("sh")}),
         |bk AS (SELECT doc_id, unnest(list_transform(range(0, 4), b ->
         |         md5(concat(cast(b as varchar), chr(1), array_to_string(
         |           list_transform(sig[(b*4+1):(b*4+4)], v -> cast(v as varchar)),
         |           chr(1)))))) AS bk
         |       FROM sig),
         |cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS a_id,
         |                greatest(a.doc_id, b.doc_id) AS b_id
         |         FROM bk a JOIN bk b USING (bk)
         |         WHERE b.doc_id >= 1000000 AND a.doc_id <> b.doc_id)
         |SELECT a_id, b_id,
         |  cast(len(list_intersect(x.sh, y.sh)) as int) AS n_common,
         |  cast(len(list_distinct(x.sh || y.sh)) as int) AS n_union
         |FROM cand
         |JOIN sh x ON x.doc_id = a_id
         |JOIN sh y ON y.doc_id = b_id
         |WHERE cast(len(list_intersect(x.sh, y.sh)) as double)
         |      / len(list_distinct(x.sh || y.sh)) >= 0.5""".stripMargin) { (s, dir) =>
      val corpus = mutantCorpus(s, dir)
        .withColumn("sh", Dedup.wordShingles(col("toks"), 3))
      Dedup.minhashLshPairsDelta(corpus, "doc_id", "sh",
        deltaPred = col("doc_id") >= 1000000L, k = 16, bands = 4,
        threshold = 0.5)
    },

    // Edit-distance near-dup pairs (typo-class duplicates): prefix-blocked
    // candidate generation + exact Levenshtein verify. Planted variants —
    // a character substituted at position 40 (every 9th doc, dist 1) and a
    // character deleted at position 45 (every 15th doc, dist 1) — edit past
    // the 24-char blocking prefix, so each variant lands in its base's
    // block; every-45th docs yield the variant-variant dist-2 pair too.
    QueryDef(
      "q91_editdist_neardup",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         substr(text, 1, 39) || 'X' || substr(text, 41)
        |  FROM documents WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, substr(text, 1, 44) || substr(text, 46)
        |  FROM documents WHERE doc_id % 15 = 0),
        |k AS (SELECT doc_id, text, substr(text, 1, 24) AS blk FROM corpus)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  cast(levenshtein(a.text, b.text) as int) AS dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 4""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val subbed = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(substring(col("text"), 1, 39), lit("X"),
            substring(col("text"), 41, Int.MaxValue)).as("text"))
      val deleted = docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(substring(col("text"), 1, 44),
            substring(col("text"), 46, Int.MaxValue)).as("text"))
      val corpus = docs.unionByName(subbed).unionByName(deleted)
      Dedup.editDistancePairs(corpus, "doc_id", "text",
        blockLen = 24, maxDist = 4)
    },

    // Candidate-mass audit, MinHash band family: a standing certifier that
    // the band join's candidate set tracks TRUE near-dup output, never
    // corpus² — the regression-proof form of the scale-ladder adjudication
    // (md5 slice band keys have an unbounded key space, so random
    // collisions scale with Jaccard⁴, not N²/keyspace). The bound
    // candidates ≤ 2·pairs + 2·n has ~2× headroom at both certification
    // SFs (sf0.1: 5,963 candidates = exactly the 5,963 verified pairs) and
    // fails loudly if a bounded-key-space defect (the q46 class) ever
    // creeps in. Audits [[Dedup.minhashBandCandidates]] — the EXACT
    // candidate stage minhashLshPairs verifies.
    QueryDef(
      "q230_minhash_cand_audit",
      s"""$mutantCorpusSql,
         |sh AS (${shingleSql("c")}),
         |sig AS (${sigSql("sh")}),
         |bk AS (SELECT doc_id, unnest(list_transform(range(0, 4), b ->
         |         md5(concat(cast(b as varchar), chr(1), array_to_string(
         |           list_transform(sig[(b*4+1):(b*4+4)], v -> cast(v as varchar)),
         |           chr(1)))))) AS bk
         |       FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |         FROM bk a JOIN bk b USING (bk) WHERE a.doc_id < b.doc_id),
         |outp AS (SELECT a_id FROM cand
         |         JOIN sh x ON x.doc_id = a_id
         |         JOIN sh y ON y.doc_id = b_id
         |         WHERE cast(len(list_intersect(x.sh, y.sh)) as double)
         |               / len(list_distinct(x.sh || y.sh)) >= 0.5)
         |SELECT cast((SELECT count(*) FROM c) as bigint) AS n_corpus,
         |  cast((SELECT count(*) FROM cand) as bigint) AS n_candidates,
         |  cast((SELECT count(*) FROM outp) as bigint) AS n_pairs,
         |  ((SELECT count(*) FROM cand) <=
         |   2 * (SELECT count(*) FROM outp) + 2 * (SELECT count(*) FROM c))
         |    AS within_bound,
        |  cast(1 as int) AS sample_mod""".stripMargin) { (s, dir) =>
      val m = AuditSampling.mod(s)
      val sh = mutantCorpus(s, dir)
        .select(col("doc_id").as("id"),
          Dedup.wordShingles(col("toks"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = AuditSampling.sample(
          Dedup.minhashBandCandidates(sh, "id", "sh", k = 16, bands = 4),
          "a_id", "b_id", m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = cand
        .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
        .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
        .filter(Dedup.jaccard(col("a_sh"), col("b_sh")) >= 0.5)
      sh.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .select(col("n_corpus"),
          AuditSampling.scaled(col("n_candidates"), m).as("n_candidates"),
          AuditSampling.scaled(col("n_pairs"), m).as("n_pairs"),
          AuditSampling.bound(col("n_candidates"), col("n_pairs"),
            alpha = 2, linear = lit(2) * col("n_corpus"), m = m)
            .as("within_bound"),
          // the effective sampling modulus rides the output row: a sampled
          // run is self-marking (a leaked SPARK_GRAFT_AUDIT_SAMPLE_MOD can
          // never pass as an exact certification)
          lit(m).as("sample_mod"))
    },

    // Candidate-mass audit, prefix-block family (q91): certifies the
    // (prefix, length-band) blocking — candidates ≤ 2·pairs + 2·n. After
    // the length band the candidate set is EXACTLY {same prefix ∧
    // |len(a)−len(b)| ≤ maxDist} (bands ≥2 apart are provably > maxDist),
    // which the oracle states directly. sf0.1: 1,341 candidates for 1,261
    // verified pairs. Audits [[Dedup.editDistanceCandidates]].
    QueryDef(
      "q233_prefixblock_cand_audit",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         substr(text, 1, 39) || 'X' || substr(text, 41)
        |  FROM documents WHERE doc_id % 9 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, substr(text, 1, 44) || substr(text, 46)
        |  FROM documents WHERE doc_id % 15 = 0),
        |k AS (SELECT doc_id, text, substr(text, 1, 24) AS blk FROM corpus),
        |cand AS (SELECT a.doc_id AS a_id, a.text AS a_t, b.text AS b_t
        |         FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |         WHERE abs(len(a.text) - len(b.text)) <= 4),
        |outp AS (SELECT a_id FROM cand WHERE levenshtein(a_t, b_t) <= 4)
        |SELECT cast((SELECT count(*) FROM corpus) as bigint) AS n_corpus,
        |  cast((SELECT count(*) FROM cand) as bigint) AS n_candidates,
        |  cast((SELECT count(*) FROM outp) as bigint) AS n_pairs,
        |  ((SELECT count(*) FROM cand) <=
        |   2 * (SELECT count(*) FROM outp) + 2 * (SELECT count(*) FROM corpus))
        |    AS within_bound,
        |  cast(1 as int) AS sample_mod""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val subbed = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(substring(col("text"), 1, 39), lit("X"),
            substring(col("text"), 41, Int.MaxValue)).as("text"))
      val deleted = docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(substring(col("text"), 1, 44),
            substring(col("text"), 46, Int.MaxValue)).as("text"))
      val m = AuditSampling.mod(s)
      val corpus = docs.unionByName(subbed).unionByName(deleted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = AuditSampling.sample(
          Dedup.editDistanceCandidates(corpus, "doc_id", "text",
            blockLen = 24, maxDist = 4),
          "a_id", "b_id", m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = cand
        .withColumn("dist",
          graft.plans.TextKernels.editDistAtMost(col("a_txt"), col("b_txt"), 4))
        .filter(col("dist") >= 0 && col("dist") <= 4)
      corpus.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .select(col("n_corpus"),
          AuditSampling.scaled(col("n_candidates"), m).as("n_candidates"),
          AuditSampling.scaled(col("n_pairs"), m).as("n_pairs"),
          AuditSampling.bound(col("n_candidates"), col("n_pairs"),
            alpha = 2, linear = lit(2) * col("n_corpus"), m = m)
            .as("within_bound"),
          // the effective sampling modulus rides the output row: a sampled
          // run is self-marking (a leaked SPARK_GRAFT_AUDIT_SAMPLE_MOD can
          // never pass as an exact certification)
          lit(m).as("sample_mod"))
    },

    // Per-document duplication-density score: the doc-level FILTER signal
    // of exact-substring dedup à la Lee et al. 2022 ("Deduplicating
    // Training Data Makes Language Models Better", arXiv:2107.06499) —
    // what fraction of a doc's 8-token spans also occur verbatim in some
    // OTHER doc. Complements q81 (which extracts the maximal duplicated
    // span EXTENTS for surgical removal): a pipeline scores docs with
    // q234 to drop boilerplate-heavy ones wholesale, and q81-cuts the
    // spans out of the keepers. Machinery: every 8-token window becomes a
    // span key, a combining count gives each span's cross-corpus
    // frequency, and each doc rolls up how many of its distinct spans are
    // shared. Scale shape: spans ∝ tokens (linear), ONE hash shuffle on
    // the span key for the df count (map-side combinable) + one shuffle
    // join back (AQE handles hot-span skew); per-doc rollup is a
    // combining aggregate. No pairwise stage at all — inherently linear
    // where the pair-emitting family members need blocking.
    QueryDef(
      "q234_dup_span_detect",
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |t8 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
        |s AS (SELECT DISTINCT doc_id,
        |        array_to_string(toks[p + 1 : p + 8], ' ') AS sp
        |      FROM t8, unnest(range(0, len(toks) - 7)) u(p)),
        |df AS (SELECT sp, count(*) AS d FROM s GROUP BY sp),
        |per AS (SELECT doc_id, count(*) AS n_spans,
        |          sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS dup_spans
        |        FROM s JOIN df USING (sp) GROUP BY doc_id)
        |SELECT doc_id, cast(n_spans as bigint) AS n_spans,
        |       cast(dup_spans as bigint) AS dup_spans
        |FROM per WHERE dup_spans >= 1""".stripMargin) { (s, dir) =>
      // fan the corpus out BELOW the tokenize/span projections — the
      // single-row-group test file otherwise runs the whole spanning
      // stage as one task (r15 JobProbe: 1.48 s serial; Layout.fanOut doc)
      val sp = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 8)," +
            " p -> array_join(slice(toks, p + 1, 8), ' '))")).as("sp"))
        .distinct()
        // feeds the df count AND the per-doc rollup
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = sp.groupBy("sp").agg(count(lit(1)).as("d"))
      sp.join(df, "sp")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("d") >= 2, 1L).otherwise(0L)).as("dup_spans"))
        .filter(col("dup_spans") >= 1)
        .select(col("doc_id"), col("n_spans"), col("dup_spans"))
    }
  )
}
