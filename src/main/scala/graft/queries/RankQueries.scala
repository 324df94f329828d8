package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayOps, FxLog, XHash}
import graft.operators.TextOps

/** Log-scored ranking/filter operators — BM25 relevance, token-entropy
  * quality filtering, PMI collocations — unblocked by the fixed-point log2
  * contract ([[graft.plans.FxLog2]]): every score is integer arithmetic
  * end-to-end, so the DuckDB oracle replays the exact same values instead
  * of diverging in IEEE `log()` ulps. The reference's only quality signal
  * is frequency pruning (/root/reference/orderly/clean/cleaner.py:318-396);
  * these are the log-based scores a real pretraining pipeline layers on
  * top of it.
  */
object RankQueries {

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id, text, lang,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // BM25 top-k: the classic sparse-retrieval ranking (Robertson et al.,
    // k1=1.2, b=0.75) over the documents table for a fixed 3-term query.
    // Everything is integer: idf_fx = log2fx(2N-2df+1) - log2fx(2df+1)
    // (the +0.5 smoothing doubled through), the length norm rides
    // avg_fx = (L*256) div N fixed-point average doc length, and each
    // term's contribution is one exact integer division. Scale shape:
    // the term filter lands BEFORE the tf aggregation (only query terms
    // survive the shuffle), df/idf is a tiny per-term table that
    // broadcast-joins back, totals broadcast as one row, and the top-20
    // is a TakeOrdered, never a global sort. int64 bounds: the score
    // numerator is idf_fx(≤64·2^16)·22·avg_fx·tf — safe to ~1e5-token
    // docs and ~4e9-doc corpora; past that, pre-divide avg_fx's 256
    // scale out (documented, same discipline as q148).
    QueryDef(
      "q214_bm25_topk",
      s"""$toksCte,
         |d AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
         |tot AS (SELECT count(*) AS nd, sum(dl) AS ltot,
         |               (sum(dl) * 256) // count(*) AS avg_fx FROM d),
         |u AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM u
         |       WHERE term IN ('spark', 'window', 'hash') GROUP BY 1, 2, 3),
         |dfc AS (SELECT term, count(*) AS df, nd FROM tf CROSS JOIN tot
         |        GROUP BY 1, 3),
         |${FxLog.sqlCtes("ln1", "dfc", "2 * nd - 2 * df + 1", "idf_num")},
         |${FxLog.sqlCtes("ln2", "ln1", "2 * df + 1", "idf_den")},
         |idf AS (SELECT term, idf_num - idf_den AS idf_fx FROM ln2),
         |sc AS (SELECT doc_id,
         |         sum(CASE WHEN idf_fx >= 0
         |           THEN (idf_fx * 22 * avg_fx * tf)
         |                // (10 * avg_fx * tf + 3 * avg_fx + 2304 * dl)
         |           ELSE -(((-idf_fx) * 22 * avg_fx * tf)
         |                // (10 * avg_fx * tf + 3 * avg_fx + 2304 * dl))
         |         END) AS score_fx
         |       FROM tf JOIN idf USING (term) CROSS JOIN tot GROUP BY 1)
         |SELECT cast(doc_id as bigint) AS doc_id,
         |  cast(score_fx as bigint) AS score_fx, cast(rank as int) AS rank
         |FROM (SELECT doc_id, score_fx,
         |        row_number() OVER (ORDER BY score_fx DESC, doc_id) AS rank
         |      FROM sc)
         |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      val terms = Seq("spark", "window", "hash")
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("dl"))
      val tot = d.agg(count(lit(1)).as("nd"), sum(col("dl")).as("ltot"))
        .select(col("nd"), col("ltot"),
          expr("(ltot * 256) div nd").as("avg_fx"))
      val tf = d.select(col("doc_id"), col("dl"),
          explode(col("toks")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(tot))
        .select(col("term"),
          (FxLog.log2fx(lit(2) * col("nd") - lit(2) * col("df") + 1) -
            FxLog.log2fx(lit(2) * col("df") + 1)).as("idf_fx"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_fx").desc, col("doc_id").asc)
      // idf is NEGATIVE for terms in more than half the docs (true at
      // every test SF — the synthetic vocab is dense): sign-decompose the
      // scaled division per the q194 discipline so the contribution is
      // identical under truncating AND flooring integer division
      tf.join(broadcast(idf), "term")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          expr("""CASE WHEN idf_fx >= 0
                 |  THEN (idf_fx * 22 * avg_fx * tf)
                 |       div (10 * avg_fx * tf + 3 * avg_fx + 2304 * dl)
                 |  ELSE -(((-idf_fx) * 22 * avg_fx * tf)
                 |       div (10 * avg_fx * tf + 3 * avg_fx + 2304 * dl))
                 |END""".stripMargin).as("c"))
        .groupBy("doc_id").agg(sum(col("c")).as("score_fx"))
        .orderBy(col("score_fx").desc, col("doc_id").asc)
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // Token-entropy quality filter: per-document Shannon entropy of the
    // token distribution, H = log2(n) − (Σ c·log2 c)/n, entirely in
    // fixed-point integers — the low-entropy tail IS the boilerplate/
    // keyword-stuffing detector a quality pipeline runs after the q36
    // ratio heuristics. One narrow tf aggregation per (doc, term), one
    // combining per-doc sum (map-side partial), a TakeOrdered bottom-25;
    // no window over the corpus, no doc×vocab blowup. Ties (synthetic
    // vocab → identical distributions) break on doc_id.
    QueryDef(
      "q215_entropy_filter",
      s"""$toksCte,
         |u AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY 1, 2),
         |${FxLog.sqlCtes("lt", "tf", "tf", "lg_tf")},
         |agg AS (SELECT doc_id, sum(tf) AS n, sum(tf * lg_tf) AS s
         |        FROM lt GROUP BY 1),
         |${FxLog.sqlCtes("ln", "agg", "n", "lg_n")},
         |h AS (SELECT doc_id, cast(n as bigint) AS n_tokens,
         |             lg_n - s // n AS h_fx FROM ln)
         |SELECT cast(doc_id as bigint) AS doc_id, n_tokens,
         |  cast(h_fx as bigint) AS h_fx, cast(rank as int) AS rank
         |FROM (SELECT doc_id, n_tokens, h_fx,
         |        row_number() OVER (ORDER BY h_fx, doc_id) AS rank FROM h)
         |WHERE rank <= 25""".stripMargin) { (s, dir) =>
      val tf = Tables.documents(s, dir)
        .select(col("doc_id"), explode(ArrayOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("h_fx").asc, col("doc_id").asc)
      tf.select(col("doc_id"), col("tf"),
          (col("tf") * FxLog.log2fx(col("tf"))).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n"), sum(col("c")).as("s"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          (FxLog.log2fx(col("n")) - expr("s div n")).as("h_fx"))
        .orderBy(col("h_fx").asc, col("doc_id").asc)
        .limit(25)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // PMI collocations: pointwise mutual information over adjacent token
    // pairs, pmi = log2(c_ab·N / (c_a·c_b)) with all marginals drawn from
    // the same bigram sample space (c_a = bigrams starting with a, c_b =
    // bigrams ending with b) — the collocation miner behind phrase
    // vocabularies. Fixed-point: pmi_fx = log2fx(c_ab·N) − log2fx(c_a·c_b),
    // exact integers end-to-end. Scale shape: one bigram aggregation,
    // two tiny marginal aggregations that broadcast back, support gate
    // c_ab ≥ 5 BEFORE the joins, TakeOrdered top-20. int64 bound:
    // c_ab·N ≤ N² needs N < 3e9 bigrams per corpus slice — shard the
    // corpus (or pre-scale counts) past that, same caveat as q177.
    QueryDef(
      "q217_pmi_collocations",
      s"""$toksCte,
         |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
         |c AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY 1),
         |tot AS (SELECT sum(cnt) AS nb FROM c),
         |ma AS (SELECT split_part(bg, ' ', 1) AS a, sum(cnt) AS ca
         |       FROM c GROUP BY 1),
         |mb AS (SELECT split_part(bg, ' ', 2) AS b, sum(cnt) AS cb
         |       FROM c GROUP BY 1),
         |j AS (SELECT bg, cnt, ca, cb, nb
         |      FROM c JOIN ma ON split_part(bg, ' ', 1) = a
         |             JOIN mb ON split_part(bg, ' ', 2) = b
         |             CROSS JOIN tot
         |      WHERE cnt >= 5),
         |${FxLog.sqlCtes("lp", "j", "cnt * nb", "lg_num")},
         |${FxLog.sqlCtes("lq", "lp", "ca * cb", "lg_den")},
         |p AS (SELECT bg, cnt, lg_num - lg_den AS pmi_fx FROM lq)
         |SELECT bg, cast(cnt as bigint) AS cnt,
         |  cast(pmi_fx as bigint) AS pmi_fx, cast(rank as int) AS rank
         |FROM (SELECT bg, cnt, pmi_fx,
         |        row_number() OVER (ORDER BY pmi_fx DESC, bg) AS rank FROM p)
         |WHERE rank <= 20""".stripMargin) { (s, dir) =>
      // bigram counts feed FOUR consumers (tot, ma, mb, the scored join):
      // unpinned, each re-ran the tokenize+explode serially above the
      // one-row-group scan (r15 JobProbe: 4 × ~0.8 s single-task jobs).
      // Fan the corpus out (Layout.fanOut doc) and persist the counts —
      // one parallel tokenize, three cheap re-reads.
      val c = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(explode(TextOps.ngrams(ArrayOps.tokens(col("text")), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = c.agg(sum(col("cnt")).as("nb"))
      val ma = c.groupBy(split(col("bg"), " ").getItem(0).as("a"))
        .agg(sum(col("cnt")).as("ca"))
      val mb = c.groupBy(split(col("bg"), " ").getItem(1).as("b"))
        .agg(sum(col("cnt")).as("cb"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("pmi_fx").desc, col("bg").asc)
      c.filter(col("cnt") >= 5)
        .join(broadcast(ma), split(col("bg"), " ").getItem(0) === col("a"))
        .join(broadcast(mb), split(col("bg"), " ").getItem(1) === col("b"))
        .crossJoin(broadcast(tot))
        .select(col("bg"), col("cnt"),
          (FxLog.log2fx(col("cnt") * col("nb")) -
            FxLog.log2fx(col("ca") * col("cb"))).as("pmi_fx"))
        .orderBy(col("pmi_fx").desc, col("bg").asc)
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // KL-divergence drift monitor: per source, KL(P_source || P_corpus)
    // of the language distribution — the "did this feed's mix shift"
    // alarm a data pipeline runs per ingest batch. Fixed point:
    // KL = Σ p_i·log2(p_i/q_i) scaled by the source size A, so
    // kl_milli_fx = (Σ a_i·(log2fx(a_i·B) − log2fx(b_i·A))) · 1000 // A
    // — all integers (a_i = source-lang count, b_i = corpus-lang count,
    // B = corpus total). P is absolutely continuous wrt Q by
    // construction (every source doc is a corpus doc), so no zero-q
    // guard is needed. Two tiny aggregations + a broadcast join; the
    // per-source sum is one combining aggregate. int64 bound: a_i·B ≤
    // N² needs N < 3e9 docs per monitored slice.
    QueryDef(
      "q218_kl_drift",
      s"""WITH a AS (SELECT source, lang, count(*) AS a_i FROM documents
         |           GROUP BY 1, 2),
         |b AS (SELECT lang, count(*) AS b_i FROM documents GROUP BY 1),
         |tot AS (SELECT cast(sum(b_i) as bigint) AS nb FROM b),
         |sa AS (SELECT source, cast(sum(a_i) as bigint) AS na FROM a
         |       GROUP BY 1),
         |j AS (SELECT a.source, a.lang, a.a_i, b.b_i, sa.na, tot.nb
         |      FROM a JOIN b USING (lang) JOIN sa ON a.source = sa.source
         |      CROSS JOIN tot),
         |${FxLog.sqlCtes("k1", "j", "a_i * nb", "lg_p")},
         |${FxLog.sqlCtes("k2", "k1", "b_i * na", "lg_q")},
         |g AS (SELECT source, max(na) AS na,
         |        sum(a_i * (lg_p - lg_q)) AS s FROM k2 GROUP BY 1)
         |SELECT source, cast(na as bigint) AS n_docs,
         |  cast(CASE WHEN s >= 0 THEN s * 1000 // na
         |            ELSE -((-s) * 1000 // na) END as bigint) AS kl_milli_fx
         |FROM g""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select("source", "lang")
      val a = d.groupBy("source", "lang").agg(count(lit(1)).as("a_i"))
      val b = d.groupBy("lang").agg(count(lit(1)).as("b_i"))
      val tot = b.agg(sum(col("b_i")).cast("long").as("nb"))
      val sa = a.groupBy("source").agg(sum(col("a_i")).cast("long").as("na"))
      a.join(broadcast(b), "lang")
        .join(broadcast(sa), "source")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("na"),
          (col("a_i") * (FxLog.log2fx(col("a_i") * col("nb")) -
            FxLog.log2fx(col("b_i") * col("na")))).as("c"))
        .groupBy("source")
        .agg(max(col("na")).cast("long").as("n_docs"), sum(col("c")).as("s"))
        // KL >= 0 in exact math but the ~2e-5 fx error can dip a
        // zero-drift source negative — sign-decompose the scaled division
        // so DuckDB // (floors) and Spark div (truncates) agree (q194)
        .select(col("source"), col("n_docs"),
          expr("""CASE WHEN s >= 0 THEN s * 1000 div n_docs
                 |     ELSE -((-s) * 1000 div n_docs) END""".stripMargin)
            .cast("long").as("kl_milli_fx"))
    },

    // Unigram cross-entropy quality score (the perplexity filter, with
    // the corpus unigram LM standing in for the neural LM this container
    // cannot host): per doc, H = (Σ_t tf·(log2 C − log2 c_t)) / n_d —
    // the average surprisal of the doc's tokens under the corpus
    // distribution. HIGH scores = rare-token-stuffed outliers, LOW =
    // common-token boilerplate; both tails are the filter's targets.
    // Fixed-point end-to-end; term counts broadcast back to the tf
    // table; top-25 surprisal via TakeOrdered. The LM table is
    // vocab-sized (bounded); at 100 TB shard the vocab join by term
    // hash, never by doc.
    QueryDef(
      "q219_surprisal_filter",
      s"""$toksCte,
         |u AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM u GROUP BY 1, 2),
         |c AS (SELECT term, count(*) AS c_t FROM u GROUP BY 1),
         |tot AS (SELECT cast(sum(c_t) as bigint) AS ctot FROM c),
         |${FxLog.sqlCtes("s1", "c", "c_t", "lg_c")},
         |jj AS (SELECT tf.doc_id, tf.tf, s1.lg_c, tot.ctot
         |       FROM tf JOIN s1 USING (term) CROSS JOIN tot),
         |${FxLog.sqlCtes("s2", "jj", "ctot", "lg_tot")},
         |h AS (SELECT doc_id,
         |        cast(sum(tf) as bigint) AS n_tokens,
         |        cast(sum(tf * (lg_tot - lg_c)) // sum(tf) as bigint)
         |          AS h_fx
         |      FROM s2 GROUP BY 1)
         |SELECT cast(doc_id as bigint) AS doc_id, n_tokens, h_fx,
         |  cast(rank as int) AS rank
         |FROM (SELECT doc_id, n_tokens, h_fx,
         |        row_number() OVER (ORDER BY h_fx DESC, doc_id) AS rank
         |      FROM h)
         |WHERE rank <= 25""".stripMargin) { (s, dir) =>
      val u = Tables.documents(s, dir)
        .select(col("doc_id"), explode(ArrayOps.tokens(col("text"))).as("term"))
      val tf = u.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val c = u.groupBy("term").agg(count(lit(1)).as("c_t"))
      val tot = c.agg(sum(col("c_t")).cast("long").as("ctot"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("h_fx").desc, col("doc_id").asc)
      tf.join(c.select(col("term"), FxLog.log2fx(col("c_t")).as("lg_c")),
          "term")
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("tf"),
          (col("tf") * (FxLog.log2fx(col("ctot")) - col("lg_c"))).as("s"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).cast("long").as("n_tokens"),
          expr("sum(s) div sum(tf)").cast("long").as("h_fx"))
        .orderBy(col("h_fx").desc, col("doc_id").asc)
        .limit(25)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // Mutual information between two categorical columns (lang ×
    // source): MI = Σ_xy p_xy·log2(p_xy/(p_x·p_y)) — the feature-
    // dependence probe behind leakage checks ("does source give away
    // the label?"). Fixed point over the contingency table:
    // mi_micro_fx = (Σ c_xy·(log2fx(c_xy·N) − log2fx(c_x·c_y)))·10^6//N.
    // The contingency table is |langs|·|sources| rows — tiny at any
    // corpus size; the only corpus-wide work is three combining counts.
    QueryDef(
      "q220_mutual_information",
      s"""WITH xy AS (SELECT lang, source, count(*) AS c_xy FROM documents
         |            GROUP BY 1, 2),
         |x AS (SELECT lang, count(*) AS c_x FROM documents GROUP BY 1),
         |y AS (SELECT source, count(*) AS c_y FROM documents GROUP BY 1),
         |tot AS (SELECT cast(count(*) as bigint) AS n FROM documents),
         |j AS (SELECT xy.lang, xy.source, xy.c_xy, x.c_x, y.c_y, tot.n
         |      FROM xy JOIN x USING (lang) JOIN y USING (source)
         |      CROSS JOIN tot),
         |${FxLog.sqlCtes("m1", "j", "c_xy * n", "lg_p")},
         |${FxLog.sqlCtes("m2", "m1", "c_x * c_y", "lg_q")},
         |g AS (SELECT sum(c_xy * (lg_p - lg_q)) AS s, max(n) AS n,
         |        count(*) AS cells FROM m2)
         |SELECT cast(CASE WHEN s >= 0 THEN s * 1000000 // n
         |                 ELSE -((-s) * 1000000 // n) END as bigint)
         |    AS mi_micro_fx,
         |  cast(n as bigint) AS n_docs,
         |  cast(cells as bigint) AS n_cells
         |FROM g""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir).select("lang", "source")
      val xy = d.groupBy("lang", "source").agg(count(lit(1)).as("c_xy"))
      val x = d.groupBy("lang").agg(count(lit(1)).as("c_x"))
      val y = d.groupBy("source").agg(count(lit(1)).as("c_y"))
      val tot = d.agg(count(lit(1)).as("n"))
      xy.join(broadcast(x), "lang")
        .join(broadcast(y), "source")
        .crossJoin(broadcast(tot))
        .select((col("c_xy") * (FxLog.log2fx(col("c_xy") * col("n")) -
            FxLog.log2fx(col("c_x") * col("c_y")))).as("c"),
          col("n"))
        .agg(sum(col("c")).as("s"), max(col("n")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_cells"))
        // same sign-decomposition as q218: MI >= 0 exact, fx error can
        // dip an independent pair negative
        .select(expr("""CASE WHEN s >= 0 THEN s * 1000000 div n_docs
                       |     ELSE -((-s) * 1000000 div n_docs) END"""
            .stripMargin).cast("long").as("mi_micro_fx"),
          col("n_docs"), col("n_cells"))
    },

    // Zipf slope: least-squares fit of log2(freq) on log2(rank) over the
    // top-32 vocabulary terms — natural text sits near slope −1, so the
    // fit is the corpus-naturalness screen (synthetic/templated data
    // flattens it). All moments are exact integers over fixed-point logs
    // (x = log2fx(rank), y = log2fx(freq)); the slope ships as the exact
    // rational (num, den) PLUS a sign-decomposed milli quotient (slope is
    // negative — the q194 floor/truncate corner). Only the ≤32-row
    // ranked head ever sorts; term counting is one combining aggregate.
    QueryDef(
      "q222_zipf_slope",
      s"""$toksCte,
         |u AS (SELECT unnest(toks) AS term FROM t),
         |c AS (SELECT term, count(*) AS cnt FROM u GROUP BY 1),
         |r AS (SELECT term, cnt,
         |        row_number() OVER (ORDER BY cnt DESC, term) AS rk
         |      FROM c QUALIFY rk <= 32),
         |${FxLog.sqlCtes("zx", "r", "rk", "x")},
         |${FxLog.sqlCtes("zy", "zx", "cnt", "y")},
         |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         |        sum(x * y) AS sxy, sum(x * x) AS sxx FROM zy),
         |g AS (SELECT n, n * sxy - sx * sy AS num,
         |        n * sxx - sx * sx AS den FROM m)
         |SELECT cast(n as bigint) AS n_terms,
         |  cast(num as bigint) AS slope_num, cast(den as bigint) AS slope_den,
         |  cast(CASE WHEN num >= 0 THEN num * 1000 // den
         |            ELSE -((-num) * 1000 // den) END as bigint)
         |    AS slope_milli
         |FROM g WHERE den > 0""".stripMargin) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .select(explode(ArrayOps.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("term").asc)
      c.orderBy(col("cnt").desc, col("term").asc).limit(32)
        .withColumn("rk", row_number().over(w))
        .select(FxLog.log2fx(col("rk").cast("long")).as("x"),
          FxLog.log2fx(col("cnt")).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("n").cast("long").as("n_terms"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
        // den = 0 only in the degenerate single-distinct-term corpus —
        // where the oracle's // would error while Spark div yields NULL;
        // both sides drop the row instead (review find)
        .filter(col("den") > 0)
        .select(col("n_terms"), col("num").as("slope_num"),
          col("den").as("slope_den"),
          expr("""CASE WHEN num >= 0 THEN num * 1000 div den
                 |     ELSE -((-num) * 1000 div den) END""".stripMargin)
            .cast("long").as("slope_milli"))
    },

    // NDCG@20 offline ranking evaluation: rank parts by first-period
    // revenue (the "prediction"), score against second-period revenue
    // (the "relevance") — the recommender/search eval primitive. DCG
    // terms are exact integers: rel_k·2^32 // log2fx(i+1) (discount in
    // the FxLog2 contract, rel in revenue dollars), the ideal DCG
    // re-ranks the same 20 relevances descending, and ndcg itself is the
    // ONE IEEE division both engines compute identically. Everything
    // after the two per-part revenue aggregates touches ≤20 rows.
    QueryDef(
      "q223_ndcg_eval",
      s"""WITH r1 AS (SELECT l_partkey,
         |    sum(cast(cast(l_extendedprice as decimal(18,4)) * 100 as bigint))
         |      AS rev1
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
         |r2 AS (SELECT l_partkey,
         |    sum(cast(cast(l_extendedprice as decimal(18,4)) * 100 as bigint))
         |      AS rev2
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY 1),
         |top AS (SELECT l_partkey, rev1,
         |          row_number() OVER (ORDER BY rev1 DESC, l_partkey) AS i
         |        FROM r1 QUALIFY i <= 20),
         |rel AS (SELECT top.i, coalesce(r2.rev2, 0) // 100 AS rel_k
         |        FROM top LEFT JOIN r2 USING (l_partkey)),
         |${FxLog.sqlCtes("nd", "rel", "i + 1", "lg_i")},
         |ideal AS (SELECT rel_k,
         |            row_number() OVER (ORDER BY rel_k DESC) AS j
         |          FROM rel),
         |${FxLog.sqlCtes("ni", "ideal", "j + 1", "lg_j")},
         |d AS (SELECT sum(rel_k * 4294967296 // lg_i) AS dcg_fx FROM nd),
         |e AS (SELECT sum(rel_k * 4294967296 // lg_j) AS idcg_fx FROM ni)
         |SELECT cast(dcg_fx as bigint) AS dcg_fx,
         |  cast(idcg_fx as bigint) AS idcg_fx,
         |  cast(dcg_fx as double) / cast(idcg_fx as double) AS ndcg
         |FROM d, e""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val or = Tables.orders(s, dir)
      def rev(pred: Column) = li
        .join(or, li("l_orderkey") === or("o_orderkey"))
        .filter(pred)
        .groupBy("l_partkey")
        .agg(sum((col("l_extendedprice").cast("decimal(18,4)") * 100)
          .cast("long")).as("rev"))
      val split = lit("1998-01-01").cast("timestamp")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("rev1").desc, col("l_partkey").asc)
      val top = rev(col("o_orderdate") < split)
        .withColumnRenamed("rev", "rev1")
        .orderBy(col("rev1").desc, col("l_partkey").asc).limit(20)
        .withColumn("i", row_number().over(w))
      val rel = top
        .join(rev(col("o_orderdate") >= split).withColumnRenamed("rev", "rev2"),
          Seq("l_partkey"), "left")
        .select(col("i"),
          expr("coalesce(rev2, 0) div 100").as("rel_k"))
      // ideal ranking needs no tiebreak: tied rel_k values contribute the
      // same (rel, discount) multiset whichever order row_number picks
      val wI = org.apache.spark.sql.expressions.Window
        .orderBy(col("rel_k").desc)
      val dcgFx = rel
        .select(expr("rel_k * 4294967296").as("num"),
          FxLog.log2fx(col("i").cast("long") + 1).as("lg"))
        .agg(sum(expr("num div lg")).as("dcg_fx"))
      val idcgFx = rel
        .withColumn("j", row_number().over(wI))
        .select(expr("rel_k * 4294967296").as("num"),
          FxLog.log2fx(col("j").cast("long") + 1).as("lg"))
        .agg(sum(expr("num div lg")).as("idcg_fx"))
      dcgFx.crossJoin(broadcast(idcgFx))
        .select(col("dcg_fx").cast("long").as("dcg_fx"),
          col("idcg_fx").cast("long").as("idcg_fx"),
          (col("dcg_fx").cast("double") / col("idcg_fx").cast("double"))
            .as("ndcg"))
    },

    // Rendezvous (highest-random-weight) sharding: each doc goes to the
    // shard whose hash(doc, shard) is LARGEST — the consistent-hashing
    // assignment whose defining property is minimal movement: removing a
    // shard relocates ONLY that shard's docs (each survivor keeps its
    // argmax). Emitted per shard under the full 8-shard ring AND under
    // the ring with shard 5 removed, plus the xor content checksum — the
    // audit pair that proves the stability property cross-engine. One
    // 8-way expression fan-out per doc (no join), two combining
    // aggregates; at 100 TB the candidate count stays the shard count,
    // never the corpus.
    QueryDef(
      "q224_rendezvous_shards",
      s"""WITH a AS (SELECT doc_id,
         |    ${(0 until 8).map(i => XHash.bucketHashSql(s"hrw$i",
                "cast(doc_id as varchar)")).mkString("greatest(", ", ", ")")}
         |      AS best8,
         |    ${(0 until 8).filter(_ != 5).map(i => XHash.bucketHashSql(s"hrw$i",
                "cast(doc_id as varchar)")).mkString("greatest(", ", ", ")")}
         |      AS best7,
         |    ${XHash.bucketHashSql("chk", "cast(doc_id as varchar)", "text")}
         |      AS h
         |  FROM documents),
         |b AS (SELECT doc_id, h,
         |    ${(0 until 8).map(i => s"CASE WHEN ${XHash.bucketHashSql(s"hrw$i",
                "cast(doc_id as varchar)")} = best8 THEN $i END")
                .mkString("coalesce(", ", ", ")")} AS s8,
         |    ${(0 until 8).filter(_ != 5).map(i =>
                s"CASE WHEN ${XHash.bucketHashSql(s"hrw$i",
                "cast(doc_id as varchar)")} = best7 THEN $i END")
                .mkString("coalesce(", ", ", ")")} AS s7
         |  FROM a)
         |SELECT cast(s8 as int) AS shard, cast(count(*) as bigint) AS n_docs,
         |  bit_xor(h) AS checksum_xor,
         |  cast(count(CASE WHEN s7 <> s8 THEN 1 END) as bigint) AS n_moved
         |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
      def hrw(i: Int) = XHash.bucketHash(s"hrw$i", col("doc_id").cast("string"))
      def argmax(idx: Seq[Int]) = {
        val best = greatest(idx.map(hrw): _*)
        coalesce(idx.map(i => when(hrw(i) === best, lit(i))): _*)
      }
      Tables.documents(s, dir)
        .select(col("doc_id"),
          XHash.bucketHash("chk", col("doc_id").cast("string"), col("text"))
            .as("h"),
          argmax(0 until 8).as("s8"),
          argmax((0 until 8).filter(_ != 5)).as("s7"))
        .groupBy(col("s8").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(h)").as("checksum_xor"),
          count(when(col("s7") =!= col("s8"), 1)).as("n_moved"))
    },

    // Temperature-scaled (α = 0.5) language-sampling mixture: the
    // multilingual-LM standard — sample languages ∝ n^α so low-resource
    // languages are upweighted relative to their raw share (Conneau &
    // Lample's exponentiated sampling). n^0.5 is computed EXACTLY in the
    // fixed-point contract as exp2fx(log2fx(n) >> 1) — the log/exp pair
    // closing under the oracle gate — and the per-language probability
    // ships in ppm against the broadcast weight total. One combining
    // count per language; everything after is |langs| rows.
    QueryDef(
      "q225_alpha_sampling",
      s"""WITH l AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |${FxLog.sqlCtes("al", "l", "n", "lgn")},
         |${FxLog.sqlExpCtes("aw", "al", "lgn >> 1", "w")},
         |t AS (SELECT cast(sum(w) as bigint) AS tw FROM aw)
         |SELECT lang, cast(n as bigint) AS n_docs,
         |  cast(w as bigint) AS w_fx,
         |  cast(w * 1000000 // tw as bigint) AS p_ppm
         |FROM aw CROSS JOIN t""".stripMargin) { (s, dir) =>
      val l = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .select(col("lang"), col("n"),
          FxLog.exp2fx(shiftright(FxLog.log2fx(col("n")), 1)).as("w"))
      val t = l.agg(sum(col("w")).cast("long").as("tw"))
      l.crossJoin(broadcast(t))
        .select(col("lang"), col("n").cast("long").as("n_docs"),
          col("w").cast("long").as("w_fx"),
          expr("w * 1000000 div tw").cast("long").as("p_ppm"))
    },

    // Deterministic weighted sampling without replacement (Efraimidis &
    // Spirtakis 2006): each row draws u = h/2^60 from its md5 hash and
    // ranks by u^(1/w) — equivalently by log2(u)/w, which the fixed-point
    // log makes EXACT integer arithmetic: key = −((60·2^16 −
    // log2fx(h))·2^16 // w), larger = more likely, P(selected) ∝ w in
    // the without-replacement sense. The top-50 by key IS the weighted
    // sample — a TakeOrdered, no RNG, reproducible across cluster sizes
    // and replayable by the oracle. THE data-mixing primitive for
    // quality- or length-weighted corpus subsampling; weight here =
    // n_chars, so long docs are proportionally favored.
    QueryDef(
      "q226_weighted_sample",
      s"""WITH d AS (SELECT doc_id, n_chars,
         |    ${XHash.bucketHashSql("ws", "cast(doc_id as varchar)")} AS h
         |  FROM documents WHERE n_chars > 0),
         |${FxLog.sqlCtes("wl", "d", "h + 1", "lg_h")},
         |k AS (SELECT doc_id, n_chars,
         |        -(((3932160 - lg_h) * 65536) // n_chars) AS key_fx
         |      FROM wl)
         |SELECT cast(doc_id as bigint) AS doc_id,
         |  cast(n_chars as bigint) AS n_chars,
         |  cast(key_fx as bigint) AS key_fx, cast(rank as int) AS rank
         |FROM (SELECT doc_id, n_chars, key_fx,
         |        row_number() OVER (ORDER BY key_fx DESC, doc_id) AS rank
         |      FROM k)
         |WHERE rank <= 50""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("key_fx").desc, col("doc_id").asc)
      Tables.documents(s, dir)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"),
          // h + 1 keeps the log argument strictly positive (h = 0 is a
          // 2^-60 event but the null would silently drop the row);
          // 3932160 = 60·2^16 = log2fx(2^60), so the lg term <= 0 always
          FxLog.log2fx(XHash.bucketHash("ws", col("doc_id").cast("string"))
            + 1).as("lg_h"))
        .select(col("doc_id"), col("n_chars"),
          // integer div, never `/`: Spark's `/` is double division and a
          // quotient rounding up across an integer boundary would drift
          // off the oracle's exact integer quotient
          expr("-(((3932160 - lg_h) * 65536) div n_chars)").as("key_fx"))
        .orderBy(col("key_fx").desc, col("doc_id").asc)
        .limit(50)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // Markov transition entropy: per from-state, the Shannon entropy of
    // the next-event distribution — the behavioral-predictability score
    // on top of q144's transition counts (low entropy = a deterministic
    // funnel step, high = a branching point; the per-state drill-down a
    // journey-analytics pipeline alarms on). Fixed point: H_f =
    // log2fx(n_from) − Σ n·log2fx(n) // n_from, non-negative by log2fx
    // monotonicity. The per-user ordering window is per-user-sized
    // (high-cardinality key), the transition matrix is |states|² rows.
    QueryDef(
      "q227_transition_entropy",
      s"""WITH s AS (SELECT user_id, event_type,
         |             lead(event_type) OVER (PARTITION BY user_id
         |               ORDER BY ts, event_id) AS next_type
         |           FROM events),
         |p AS (SELECT event_type AS from_type, next_type AS to_type
         |      FROM s WHERE next_type IS NOT NULL),
         |t AS (SELECT from_type, to_type, count(*) AS n FROM p GROUP BY 1, 2),
         |${FxLog.sqlCtes("te", "t", "n", "lg_n")},
         |a AS (SELECT from_type, sum(n) AS n_from, count(*) AS n_states,
         |        sum(n * lg_n) AS s2 FROM te GROUP BY 1),
         |${FxLog.sqlCtes("tf", "a", "n_from", "lg_f")}
         |SELECT from_type, cast(n_from as bigint) AS n_from,
         |  cast(n_states as bigint) AS n_states,
         |  cast(lg_f - s2 // n_from as bigint) AS h_fx
         |FROM tf""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("from_type"), col("n"),
          (col("n") * FxLog.log2fx(col("n"))).as("c"))
        .groupBy("from_type")
        .agg(sum(col("n")).as("n_from"),
          count(lit(1)).cast("long").as("n_states"),
          sum(col("c")).as("s2"))
        .select(col("from_type"), col("n_from").cast("long").as("n_from"),
          col("n_states"),
          (FxLog.log2fx(col("n_from")) - expr("s2 div n_from"))
            .cast("long").as("h_fx"))
    },

    // DoReMi-style softmax domain weights (Xie et al. 2023): reweight
    // training domains by exp(λ · excess_loss_d), normalized — the
    // remaining log-family shape q225's α-sampling doesn't cover (softmax
    // over a per-domain SCORE, not a power of the count). The per-domain
    // loss proxy here is log2fx(avg doc length) — a deterministic stand-in
    // for a reference model's held-out loss, which would arrive as just
    // another per-domain bigint column — excess is against the MIN domain
    // (so all exponents are ≥ 0) and CLAMPED at 27·2^16: beyond that,
    // w·10^6 would overflow int64 (and at 46·2^16 exp2fx itself NULLs),
    // so extreme >10^8-fold weight spreads saturate deterministically on
    // both engines instead of failing or silently dropping the heaviest
    // domain (λ = 8 by left shift). Everything after the one combining
    // per-domain aggregate is |domains| rows against two broadcast
    // scalars; the weight vector a data-mixing loader consumes ships as
    // exact ppm.
    QueryDef(
      "q229_doremi_weights",
      s"""WITH l AS (SELECT source, count(*) AS n,
         |             sum(n_chars) // count(*) AS avg_chars
         |           FROM documents WHERE n_chars > 0 GROUP BY 1),
         |${FxLog.sqlCtes("dl", "l", "avg_chars", "lg")},
         |m AS (SELECT min(lg) AS mn FROM dl),
         |x AS (SELECT *, least((lg - mn) * 8, 1769472) AS ex
         |      FROM dl CROSS JOIN m),
         |${FxLog.sqlExpCtes("dw", "x", "ex", "w")},
         |t AS (SELECT cast(sum(w) as bigint) AS tw FROM dw)
         |SELECT source, cast(n as bigint) AS n_docs,
         |  cast(avg_chars as bigint) AS avg_chars,
         |  cast(w as bigint) AS w_fx,
         |  cast(w * 1000000 // tw as bigint) AS p_ppm
         |FROM dw CROSS JOIN t""".stripMargin) { (s, dir) =>
      val l = Tables.documents(s, dir)
        .filter(col("n_chars") > 0)
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"))
        .select(col("source"), col("n"), expr("sc div n").as("avg_chars"))
        .withColumn("lg", FxLog.log2fx(col("avg_chars")))
      val m = l.agg(min(col("lg")).as("mn"))
      val w = l.crossJoin(broadcast(m))
        .withColumn("w",
          FxLog.exp2fx(least((col("lg") - col("mn")) * 8, lit(1769472L))))
      val t = w.agg(sum(col("w")).cast("long").as("tw"))
      w.crossJoin(broadcast(t))
        .select(col("source"), col("n").cast("long").as("n_docs"),
          col("avg_chars").cast("long").as("avg_chars"),
          col("w").cast("long").as("w_fx"),
          expr("w * 1000000 div tw").cast("long").as("p_ppm"))
    }
  )
}
