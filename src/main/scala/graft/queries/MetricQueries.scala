package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ArrayOps

/** F8–F10 — the plot-stage aggregations (plot/plotter.py): component-count
  * histogram, min-frequency sweep, popularity top-k.
  */
object MetricQueries {

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // F8 — components-per-row histogram (plot/plotter.py:74-134).
    QueryDef(
      "q43_component_histogram",
      s"""$toksCte
         |SELECT cast(len(toks) // 10 as int) AS n_tokens_bucket,
         |       cast(count(*) as bigint) AS n_docs
         |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", ArrayOps.tokens(col("text")))
        .groupBy(floor(size(col("toks")) / 10).cast("int").as("n_tokens_bucket"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // F9 — min-frequency sweep (plot/plotter.py:211-273): for each
    // threshold, how many rows survive rare-value removal. One pass: each
    // row's minimum token frequency decides every threshold at once —
    // replaces the reference's filter-per-threshold loop.
    QueryDef(
      "q44_minfreq_sweep",
      s"""$toksCte,
         |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |vc AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
         |m AS (SELECT u.doc_id, min(vc.c) AS mn FROM u JOIN vc USING (tok)
         |      GROUP BY u.doc_id)
         |SELECT f.f AS threshold,
         |       cast(count(*) FILTER (WHERE m.mn >= f.f) as bigint) AS n_rows
         |FROM (VALUES (0),(10),(20),(30),(40),(50)) f(f) CROSS JOIN m
         |GROUP BY f.f""".stripMargin) { (s, dir) =>
      import s.implicits._
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), explode(ArrayOps.tokens(col("text"))).as("tok"))
      val vc = t.groupBy("tok").agg(count(lit(1)).as("c"))
      val m = t.join(vc, "tok").groupBy("doc_id").agg(min(col("c")).as("mn"))
      val thDf = Seq(0, 10, 20, 30, 40, 50).toDF("threshold")
      m.crossJoin(broadcast(thDf))
        .groupBy("threshold")
        .agg(count(when(col("mn") >= col("threshold"), 1)).as("n_rows"))
    },

    // F10 — popularity top-k (plot/plotter.py:289-369).
    QueryDef(
      "q45_popularity_topk",
      s"""$toksCte
         |SELECT tok, cast(count(*) as bigint) AS cnt
         |FROM (SELECT unnest(toks) AS tok FROM t)
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(ArrayOps.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(10)
    }
  )
}
