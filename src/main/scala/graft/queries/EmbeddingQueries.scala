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
    // perturbed copies; candidates via banded (multi-table) LSH — 24 planes
    // in 3 bands of 8 bits, pairs sharing ANY band key — verified at
    // cosine ≥ 0.99. The embedding-space flavour of MinHash banding; the
    // single-bucket variant recalled ~8% of planted pairs, this ≥99%.
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
         |b AS (SELECT vec_id, unnest(list_transform(range(0, 3), bb ->
         |        concat(bb, ':', cast(list_sum(list_transform(range(0, 8), j ->
         |          CASE WHEN list_reduce(list_transform(range(1, 65), i ->
         |                 cast(v[i] as double) *
         |                 (cast((${XHash.bucketHashSql("plane",
                              "cast(bb*8 + j as varchar)", "cast(i - 1 as varchar)")}
         |                   % 2001 - 1000) as double) / 1000.0)),
         |               (x, y) -> x + y) >= 0
         |          THEN (1 << j) ELSE 0 END)) as varchar)))) AS bk
         |      FROM c),
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
        planes = 24, bands = 3, minCosine = 0.99)
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
    }
  )
}
