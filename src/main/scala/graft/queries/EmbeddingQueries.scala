package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.XHash
import graft.operators.Similarity

/** Similarity-search coverage on the `embeddings` table: brute-force cosine
  * top-k (baseline) and random-hyperplane LSH bucketing + bucketed ANN
  * (scale path). Dot products fold sequentially in double in both engines,
  * so ranks match exactly without rounding.
  */
object EmbeddingQueries {

  /** DuckDB sequential dot product of two float lists (double math,
    * left-fold — mirrors Spark's `aggregate`). */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65),
       |  i -> cast($a[i] as double) * cast($b[i] as double)), (x, y) -> x + y)""".stripMargin

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** DuckDB LSH bucket: 12 hyperplane sign bits (mirrors
    * Similarity.lshBucket with planes=12). */
  private val planeW = XHash.bucketHashSql("plane", "cast(p as varchar)", "cast(i - 1 as varchar)")
  private def bucketSqlOver(vec: String): String =
    s"""cast(list_sum(list_transform(range(0, 12), p ->
       |  CASE WHEN list_reduce(list_transform(range(1, 65),
       |         i -> cast($vec[i] as double)
       |              * (cast(($planeW % 2001 - 1000) as double) / 1000.0)),
       |       (x, y) -> x + y) >= 0
       |  THEN (cast(1 as bigint) << p) ELSE 0 END)) as bigint)""".stripMargin
  private val bucketSql = bucketSqlOver("embedding")

  val defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k (k=5) for the first 10 vectors.
    QueryDef(
      "q31_cosine_topk",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id AS n_id, embedding AS c_vec FROM embeddings),
         |p AS (SELECT q_id, n_id, ${cosSql("q_vec", "c_vec")} AS sim
         |      FROM q CROSS JOIN c WHERE q_id <> n_id)
         |SELECT q_id, n_id, cast(rank as int) AS rank FROM (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM p) WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("c_vec"))
      Similarity.bruteForceTopK(q, c, 5, "q_id", "n_id")
        .select(col("q_id"), col("n_id"), col("rank").cast("int"))
    },

    // Random-hyperplane LSH bucket assignment (the ANN partitioner).
    QueryDef(
      "q32_lsh_buckets",
      s"""SELECT vec_id, $bucketSql AS bucket FROM embeddings""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("vec_id"), Similarity.lshBucket(col("embedding"), 12).as("bucket"))
    },

    // Bucketed ANN: top-3 within the query's LSH bucket.
    QueryDef(
      "q33_ann_lsh_topk",
      s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bk FROM embeddings),
         |q AS (SELECT vec_id AS q_id, embedding AS q_vec, bk FROM b WHERE vec_id < 20),
         |c AS (SELECT vec_id AS n_id, embedding AS c_vec, bk FROM b),
         |p AS (SELECT q_id, n_id, ${cosSql("q_vec", "c_vec")} AS sim
         |      FROM q JOIN c USING (bk) WHERE q_id <> n_id)
         |SELECT q_id, n_id, cast(rank as int) AS rank FROM (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
         |  FROM p) WHERE rank <= 3""".stripMargin) { (s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          planes = 12, k = 3, queryPred = col("vec_id") < 20)
        .select(col("q_id"), col("n_id"), col("rank").cast("int"))
    },

    // Embedding-cosine near-dup detection: corpus ∪ deterministically
    // perturbed copies; candidates via banded (multi-table) LSH, pairs
    // sharing ANY band key, verified at cosine ≥ 0.99. The embedding-space
    // flavour of MinHash banding; the single-bucket variant recalled ~8% of
    // planted pairs, this ≥99%. Band geometry ADAPTS to the corpus
    // (Similarity.bandParams): bits-per-band r = min k ≥ 8 with 2^k·16 ≥ n
    // pins random collisions linear in n (a FIXED r made them Θ(n²/2^r):
    // the 25× ladder measured ~58M random candidates vs 2.4M true pairs),
    // and bands = 3 + ⌈(r−8)/2⌉ holds recall ≈0.99. n ≤ 4096 (all
    // certification SFs) yields r=8, b=3 — bit-identical to the fixed form.
    QueryDef(
      "q46_embed_neardup",
      s"""WITH o AS (SELECT vec_id,
         |             list_transform(range(1, 65),
         |               i -> cast(embedding[i] as double)) AS v
         |           FROM embeddings),
         |m AS (SELECT vec_id + 1000000 AS vec_id,
         |        list_transform(range(1, 65),
         |          i -> CASE WHEN i = 1 THEN cast(embedding[1] as double) + 0.05
         |               ELSE cast(embedding[i] as double) END) AS v
         |      FROM embeddings),
         |c AS (SELECT * FROM o UNION ALL SELECT * FROM m),
         |params AS (SELECT cast(r as int) AS r, cast(3 + (r - 7) // 2 as int) AS b
         |           FROM (SELECT min(k) AS r FROM range(8, 41) t(k)
         |                 WHERE (cast(1 as bigint) << cast(k as int)) * 16
         |                       >= (SELECT count(*) FROM c))),
         |b AS (SELECT vec_id, unnest(list_transform(range(0, p.b), bb ->
         |        concat(bb, ':', cast(list_sum(list_transform(range(0, p.r), j ->
         |          CASE WHEN list_reduce(list_transform(range(1, 65), i ->
         |                 cast(v[i] as double) *
         |                 (cast((${XHash.bucketHashSql("plane",
                              "cast(bb*p.r + j as varchar)", "cast(i - 1 as varchar)")}
         |                   % 2001 - 1000) as double) / 1000.0)),
         |               (x, y) -> x + y) >= 0
         |          THEN (cast(1 as bigint) << j) ELSE 0 END)) as varchar)))) AS bk
         |      FROM c, params p),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
         |         FROM b a JOIN b b2 USING (bk) WHERE a.vec_id < b2.vec_id)
         |SELECT a_id, b_id FROM cand
         |JOIN c x ON x.vec_id = a_id
         |JOIN c y ON y.vec_id = b_id
         |WHERE ${cosSql("x.v", "y.v")} >= 0.99""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val o = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val m = e.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") + 0.05).otherwise(x.cast("double"))).as("v"))
      Similarity.bandedNearDupPairs(o.unionByName(m), "vec_id", "v",
        baseBits = 8, baseBands = 3, minCosine = 0.99,
        corpusSize = Some(2L * e.count()))
    },

    // Candidate-mass audit, banded-LSH family (q46): the standing
    // certifier for the r10 fix — with adaptive geometry, random band
    // collisions are ≤ b·slack·n/2 in expectation (slack=16), so
    // candidates ≤ 2·pairs + 2·slack·b·n holds with ~3× headroom at the
    // certification SFs (sf0.1: 114,256 candidates, bound 396k) and FAILS
    // on the pre-fix fixed-256-bucket geometry at ladder scale (25×: ~58M
    // random candidates vs a 24M bound). Audits
    // [[Similarity.bandedCandidates]] — the EXACT candidate stage
    // bandedNearDupPairs verifies.
    QueryDef(
      "q231_lshband_cand_audit",
      s"""WITH o AS (SELECT vec_id,
         |             list_transform(range(1, 65),
         |               i -> cast(embedding[i] as double)) AS v
         |           FROM embeddings),
         |m AS (SELECT vec_id + 1000000 AS vec_id,
         |        list_transform(range(1, 65),
         |          i -> CASE WHEN i = 1 THEN cast(embedding[1] as double) + 0.05
         |               ELSE cast(embedding[i] as double) END) AS v
         |      FROM embeddings),
         |c AS (SELECT * FROM o UNION ALL SELECT * FROM m),
         |params AS (SELECT cast(r as int) AS r, cast(3 + (r - 7) // 2 as int) AS b
         |           FROM (SELECT min(k) AS r FROM range(8, 41) t(k)
         |                 WHERE (cast(1 as bigint) << cast(k as int)) * 16
         |                       >= (SELECT count(*) FROM c))),
         |b AS (SELECT vec_id, unnest(list_transform(range(0, p.b), bb ->
         |        concat(bb, ':', cast(list_sum(list_transform(range(0, p.r), j ->
         |          CASE WHEN list_reduce(list_transform(range(1, 65), i ->
         |                 cast(v[i] as double) *
         |                 (cast((${XHash.bucketHashSql("plane",
                              "cast(bb*p.r + j as varchar)", "cast(i - 1 as varchar)")}
         |                   % 2001 - 1000) as double) / 1000.0)),
         |               (x, y) -> x + y) >= 0
         |          THEN (cast(1 as bigint) << j) ELSE 0 END)) as varchar)))) AS bk
         |      FROM c, params p),
         |cand AS (SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
         |         FROM b a JOIN b b2 USING (bk) WHERE a.vec_id < b2.vec_id),
         |outp AS (SELECT a_id FROM cand
         |         JOIN c x ON x.vec_id = a_id
         |         JOIN c y ON y.vec_id = b_id
         |         WHERE ${cosSql("x.v", "y.v")} >= 0.99)
         |SELECT cast((SELECT count(*) FROM c) as bigint) AS n_corpus,
         |  cast((SELECT count(*) FROM cand) as bigint) AS n_candidates,
         |  cast((SELECT count(*) FROM outp) as bigint) AS n_pairs,
         |  ((SELECT count(*) FROM cand) <=
         |   2 * (SELECT count(*) FROM outp)
         |   + 32 * (SELECT b FROM params) * (SELECT count(*) FROM c))
         |    AS within_bound,
        |  cast(1 as int) AS sample_mod""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val n = 2L * e.count()
      val (bands, _) = Similarity.bandParams(n)
      val o = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val m = e.select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x.cast("double") + 0.05).otherwise(x.cast("double"))).as("v"))
      val smod = AuditSampling.mod(s)
      val c = o.unionByName(m)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = AuditSampling.sample(
          Similarity.bandedCandidates(c, "vec_id", "v",
            baseBits = 8, baseBands = 3, corpusSize = Some(n)),
          "a_id", "b_id", smod)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // norms ride the candidate joins (one per vector side), so the
      // verify filter folds ONE dot per candidate pair instead of
      // cosine()'s three — bit-identical (same dot/(a_n·b_n) IEEE order)
      val pairs = cand
        .join(c.select(col("vec_id").as("a_id"), col("v").as("a_v"),
          Similarity.norm(col("v")).as("a_n")), Seq("a_id"))
        .join(c.select(col("vec_id").as("b_id"), col("v").as("b_v"),
          Similarity.norm(col("v")).as("b_n")), Seq("b_id"))
        .filter(Similarity.dot(col("a_v"), col("b_v"))
          / (col("a_n") * col("b_n")) >= 0.99)
      c.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
        .select(col("n_corpus"),
          AuditSampling.scaled(col("n_candidates"), smod).as("n_candidates"),
          AuditSampling.scaled(col("n_pairs"), smod).as("n_pairs"),
          AuditSampling.bound(col("n_candidates"), col("n_pairs"),
            alpha = 2, linear = lit(32L) * lit(bands) * col("n_corpus"),
            m = smod).as("within_bound"),
          // self-marking sampled output (see q230)
          lit(smod).as("sample_mod"))
    },

    // Per-label corpus statistics over exact-selection aggregates (norms are
    // per-row deterministic; min/max pick identical doubles in both engines).
    QueryDef(
      "q34_embedding_stats",
      s"""SELECT label, cast(count(*) as bigint) AS cnt,
         |  min(${normSql("embedding")}) AS min_norm,
         |  max(${normSql("embedding")}) AS max_norm
         |FROM embeddings GROUP BY label""".stripMargin) { (s, dir) =>
      Tables.embeddings(s, dir)
        .groupBy("label")
        .agg(count(lit(1)).as("cnt"),
          min(Similarity.norm(col("embedding"))).as("min_norm"),
          max(Similarity.norm(col("embedding"))).as("max_norm"))
    },

    // kNN label probe — the standard embedding-quality eval: each query
    // vector's label predicted by majority vote over its k nearest
    // neighbours (cosine, exact sequential fold), scored against the true
    // label, for k ∈ {1, 5, 10} in one pass over a single top-10 ranking.
    // Tie-breaks are total orders in both engines: neighbour rank by
    // (sim DESC, n_id), vote by (count DESC, label ASC).
    QueryDef(
      "q126_knn_probe",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
         |           FROM embeddings WHERE vec_id < 50),
         |c AS (SELECT vec_id AS n_id, embedding AS c_vec, label AS n_label
         |      FROM embeddings),
         |p AS (SELECT q_id, q_label, n_label,
         |        row_number() OVER (PARTITION BY q_id
         |          ORDER BY ${cosSql("q_vec", "c_vec")} DESC, n_id) AS rnk
         |      FROM q CROSS JOIN c WHERE q_id <> n_id),
         |ks AS (SELECT unnest([1, 5, 10]) AS k),
         |votes AS (SELECT ks.k, q_id, q_label, n_label, count(*) AS c
         |          FROM p, ks WHERE rnk <= ks.k GROUP BY 1, 2, 3, 4),
         |pred AS (SELECT k, q_id, q_label, n_label AS p_label,
         |           row_number() OVER (PARTITION BY k, q_id
         |             ORDER BY c DESC, n_label) AS vr
         |         FROM votes)
         |SELECT cast(k as int) AS k,
         |  cast(count(*) FILTER (WHERE p_label = q_label) as bigint) AS n_correct,
         |  cast(count(*) as bigint) AS n_total,
         |  cast(count(*) FILTER (WHERE p_label = q_label) as double)
         |    / cast(count(*) as double) AS acc
         |FROM pred WHERE vr = 1 GROUP BY 1""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_label"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("c_vec"),
        col("label").as("n_label"))
      // fan the SCORED corpus side at the site (r16 re-scope of the r15
      // loader-level fan-out; solo 1.75 → 0.95 came from parallelizing
      // this q×|corpus| cosine pass — q and the label lookups broadcast)
      val top = Similarity.bruteForceTopK(
          q.select("q_id", "q_vec"),
          graft.operators.Layout.fanOut(c.select("n_id", "c_vec")), 10)
        .join(broadcast(c.select("n_id", "n_label")), Seq("n_id"))
        .join(broadcast(q.select("q_id", "q_label")), Seq("q_id"))
      val votes = top
        .crossJoin(broadcast(
          s.range(1, 2).select(explode(typedLit(Seq(1, 5, 10))).as("k"))))
        .filter(col("rank") <= col("k"))
        .groupBy("k", "q_id", "q_label", "n_label")
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k", "q_id")
        .orderBy(col("c").desc, col("n_label"))
      votes.withColumn("vr", row_number().over(w))
        .filter(col("vr") === 1)
        .groupBy("k")
        .agg(count(when(col("n_label") === col("q_label"), lit(1)))
            .as("n_correct"),
          count(lit(1)).as("n_total"))
        .select(col("k").cast("int"), col("n_correct"), col("n_total"),
          (col("n_correct").cast("double") / col("n_total").cast("double"))
            .as("acc"))
    },

    // Sparse retrieval (the token-space counterpart of the dense ANN path):
    // docs as integer tf vectors, candidate pairs from an inverted index on
    // RARE terms only (a planted zipf-tail tag per doc — the synthetic
    // corpus has no natural rare vocabulary), then the full sparse cosine
    // over ALL shared tokens. Dot products and norms are exact integer
    // sums — order-independent under any shuffle — and the cosine is one
    // double expression. Candidate fan-out is Σ df² over rare terms only;
    // common terms never generate pairs. The tag modulus ADAPTS to corpus
    // size — greatest(97, N/52) keeps per-term df ~constant (≈52), so
    // candidate mass stays LINEAR in N (a fixed modulus made df ∝ N and
    // pairs ∝ N²/97: the 25× ladder measured 123k → 80.4M candidates,
    // 274× wall). N ≤ 5000 (all certification SFs) yields 97 — results
    // there are bit-identical to the fixed-modulus form. The N lookup is
    // one driver-side scalar, same class as the literal-set guards.
    QueryDef(
      "q116_sparse_retrieval",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'zrare' || cast(doc_id %
        |    (SELECT greatest(97, count(*) // 52) FROM documents) as varchar)
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |       FROM toks GROUP BY 1, 2),
        |norms AS (SELECT doc_id, sum(tf * tf) AS nn FROM tf GROUP BY 1),
        |inv AS (SELECT doc_id, token FROM tf WHERE token LIKE 'zrare%'),
        |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |         FROM inv a JOIN inv b
        |           ON a.token = b.token AND a.doc_id < b.doc_id),
        |dots AS (SELECT cand.a, cand.b, sum(ta.tf * tb.tf) AS dot
        |         FROM cand
        |         JOIN tf ta ON ta.doc_id = cand.a
        |         JOIN tf tb ON tb.doc_id = cand.b AND tb.token = ta.token
        |         GROUP BY 1, 2)
        |SELECT a, b, cast(dot as bigint) AS dot,
        |  cast(dot as double)
        |    / (sqrt(cast(na.nn as double)) * sqrt(cast(nb.nn as double))) AS cos
        |FROM dots
        |JOIN norms na ON na.doc_id = a
        |JOIN norms nb ON nb.doc_id = b
        |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin) { (s, dir) =>
      import graft.functions.ArrayOps
      val docs = Tables.documents(s, dir)
      val tagModulus = math.max(97L, docs.count() / 52L)
      val toks = docs
        .select(col("doc_id"), explode(ArrayOps.tokens(col("text"))).as("token"))
        .unionByName(docs.select(col("doc_id"),
          concat(lit("zrare"), (col("doc_id") % tagModulus).cast("string"))
            .as("token")))
      val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val norms = tf.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("nn"))
      val inv = tf.filter(col("token").startsWith("zrare"))
        .select(col("doc_id"), col("token"))
      val cand = inv.select(col("doc_id").as("a"), col("token"))
        .join(inv.select(col("doc_id").as("b"), col("token")), Seq("token"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val dots = cand
        .join(tf.select(col("doc_id").as("a"), col("token"),
          col("tf").as("tfa")), Seq("a"))
        .join(tf.select(col("doc_id").as("b"), col("token"),
          col("tf").as("tfb")), Seq("b", "token"))
        .groupBy("a", "b").agg(sum(col("tfa") * col("tfb")).as("dot"))
      dots
        .join(norms.select(col("doc_id").as("a"), col("nn").as("na")), Seq("a"))
        .join(norms.select(col("doc_id").as("b"), col("nn").as("nb")), Seq("b"))
        .select(col("a"), col("b"), col("dot"),
          (col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cos"))
        .orderBy(col("cos").desc, col("a"), col("b"))
        .limit(20)
    }
  )
}
