package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.extract.{Extract, IdentityChemistry}
import graft.functions.{ArrayOps, Exact, XHash}
import graft.operators.{Relational, Sketches, TextOps}
import graft.streaming.Streams

/** Round-2 coverage extensions: TF-IDF scoring, exact stratified sampling,
  * salted-join parity, and batch sessionization — each oracle-gated.
  */
object ExtendedQueries {

  /** IdentityChemistry's transition-metal alternation (extract/defaults.py:
    * 10-39), inlined into the q63 oracle regex. */
  private val TmAlt: String =
    "Ti|V|Cr|Mn|Fe|Co|Ni|Cu|Zr|Nb|Mo|Tc|Ru|Rh|Pd|Ag|Hf|Ta|W|Re|Os|Ir|Pt|Au"

  val defs: Seq[QueryDef] = Seq(

    // TF-IDF: top-scoring term per document. Scores are the exact rational
    // (tc·N)/(dl·df) in one double division → bit-identical across engines.
    QueryDef(
      "q53_tfidf_top",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tf AS (SELECT doc_id, term, count(*) AS tc FROM u GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM u GROUP BY doc_id),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM u GROUP BY term),
        |n AS (SELECT count(*) AS nd FROM t),
        |s AS (SELECT tf.doc_id, tf.term,
        |        cast(tf.tc * nd as double) / (dl.dl * df.df) AS score
        |      FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term AS top_term, score FROM s
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, term) = 1""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
      val scored = TextOps.tfIdfScores(docs, "doc_id", "toks")
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("term").as("top_term"), col("score"))
    },

    // Exact stratified sample: 10% of lineitem per return flag, exact
    // per-stratum ceil counts, deterministic hash order.
    QueryDef(
      "q54_stratified_sample",
      s"""WITH b AS (
         |  SELECT l_orderkey, l_linenumber, l_returnflag,
         |    ${XHash.bucketHashSql("strat", "l_orderkey", "cast(l_linenumber as varchar)")} AS h
         |  FROM lineitem),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY l_returnflag
         |                           ORDER BY h, l_orderkey, l_linenumber) AS rn,
         |        count(*) OVER (PARTITION BY l_returnflag) AS n
         |      FROM b)
         |SELECT l_orderkey, l_linenumber, l_returnflag FROM r
         |WHERE (rn - 1) * 100 < n * 10""".stripMargin) { (s, dir) =>
      // project before the window: the per-stratum sort payload is the
      // selected columns, not the full fact-table row
      Relational.stratifiedSample(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_linenumber", "l_returnflag"),
          Seq("l_returnflag"), 10, "strat",
          Seq(col("l_orderkey"), col("l_linenumber")),
          col("l_orderkey"), col("l_linenumber").cast("string"))
    },

    // Per-source cap (corpus-mix rebalancing): at most 3 documents per
    // source, picked by deterministic hash order. Same two-pass histogram
    // execution as q54 — a dominant source never lands on one reducer.
    QueryDef(
      "q68_source_cap",
      s"""WITH b AS (
         |  SELECT doc_id, source,
         |    ${XHash.bucketHashSql("cap", "cast(doc_id as varchar)")} AS h
         |  FROM documents),
         |r AS (SELECT *,
         |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
         |      FROM b)
         |SELECT doc_id, source FROM r WHERE rn <= 3""".stripMargin) { (s, dir) =>
      Relational.capPerGroup(
          Tables.documents(s, dir).select("doc_id", "source"),
          Seq("source"), 3L, "cap",
          Seq(col("doc_id")), col("doc_id").cast("string"))
        .select("doc_id", "source")
    },

    // Exact global quantiles of document length WITHOUT a global sort: the
    // mergeable-histogram two-pass (≤4096-row shuffle, then rank only the
    // boundary bins). The oracle runs the naive global-window formulation —
    // selection must be bit-identical.
    QueryDef(
      "q75_quantiles",
      """WITH r AS (SELECT n_chars,
        |             row_number() OVER (ORDER BY n_chars) AS rn,
        |             count(*) OVER () AS n
        |           FROM documents),
        |p AS (SELECT unnest([1, 25, 50, 75, 90, 99]) AS pct)
        |SELECT cast(p.pct as int) AS pct,
        |       cast((r.n * p.pct + 99) // 100 as bigint) AS qrank,
        |       cast(r.n_chars as bigint) AS qvalue
        |FROM p JOIN r ON r.rn = (r.n * p.pct + 99) // 100""".stripMargin) { (s, dir) =>
      Sketches.histogramQuantiles(Tables.documents(s, dir),
        col("n_chars"), Seq(1, 25, 50, 75, 90, 99))
    },

    // Temperature-weighted source resampling (α = 0.5): per-source keep
    // probability √(n_min/n_s), applied as a deterministic hash threshold —
    // the corpus-mix flattening step before training. One narrow filter
    // pass over the corpus; thresholds derive from a tiny broadcast agg.
    QueryDef(
      "q76_temp_resample",
      s"""WITH c AS (SELECT source, count(*) AS ns FROM documents GROUP BY source),
         |m AS (SELECT min(ns) AS nmin FROM c),
         |t AS (SELECT source,
         |        cast(floor(sqrt(cast(nmin as double) / cast(ns as double))
         |             * 1152921504606846976.0) as bigint) AS thr
         |      FROM c CROSS JOIN m)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN t USING (source)
         |WHERE ${XHash.bucketHashSql("tr", "cast(doc_id as varchar)")} < t.thr""".stripMargin) { (s, dir) =>
      Relational.temperatureResample(
          Tables.documents(s, dir).select("doc_id", "source"),
          "source", "tr", col("doc_id").cast("string"))
        .select("doc_id", "source")
    },

    // Salted skew join: result must be IDENTICAL to the plain join — the
    // oracle runs the unsalted formulation, proving the salt is semantics-
    // preserving (the skew tool for pathological fact-table keys).
    QueryDef(
      "q55_salted_join",
      """SELECT s_nationkey,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))
        |           * (1 - cast(l_discount as decimal(18,4)))) as varchar) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_lines
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin) { (s, dir) =>
      val big = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("suppkey"),
        col("l_extendedprice"), col("l_discount"))
      val small = Tables.supplier(s, dir).select(
        col("s_suppkey").as("suppkey"), col("s_nationkey"))
      Relational.saltedJoin(big, small, "suppkey", 8)
        .groupBy("s_nationkey")
        .agg(
          sum(Exact.dec(col("l_extendedprice")) * (lit(1) - Exact.dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Batch sessionization via the typed groupByKey/flatMapGroups fold (the
    // same state logic the streaming flavour applies incrementally); oracle
    // is the classic gaps-and-islands window formulation.
    QueryDef(
      "q56_sessionize",
      """WITH e AS (SELECT user_id, epoch_us(cast(ts as timestamp)) AS us FROM events),
        |x AS (SELECT user_id, us,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |               OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |                  > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |g AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM x)
        |SELECT user_id, min(us) AS start_us, max(us) AS end_us,
        |       cast(count(*) as bigint) AS n
        |FROM g GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val evs = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
        .as[Streams.Ev]
      Streams.sessionize(evs, 30).toDF()
        .select(col("user_id"), col("startMicros").as("start_us"),
          col("endMicros").as("end_us"), col("n").cast("long").as("n"))
    },

    // Gopher-style repetition signals: top-token dominance and distinct
    // ratio per document (exact integer counts, single double divisions).
    QueryDef(
      "q57_repetition_quality",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM u GROUP BY doc_id, term)
        |SELECT doc_id,
        |  cast(max(c) as bigint) AS max_tok,
        |  cast(sum(c) as bigint) AS n_toks,
        |  cast(max(c) as double) / sum(c) AS top_frac,
        |  cast(count(*) as double) / sum(c) AS distinct_ratio
        |FROM tc GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(ArrayOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          max(col("c")).as("max_tok"),
          sum(col("c")).as("n_toks"),
          (max(col("c")).cast("double") / sum(col("c"))).as("top_frac"),
          (count(lit(1)).cast("double") / sum(col("c"))).as("distinct_ratio"))
    },

    // Vocabulary fit + token-id encoding: top-32 corpus terms get dense ids,
    // each doc's first 5 tokens encode to ids (OOV → -1) — the tokenizer
    // boundary of a training pipeline.
    QueryDef(
      "q58_vocab_encode",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS term FROM t),
        |v AS (SELECT term,
        |        cast(row_number() OVER (ORDER BY count(*) DESC, term) - 1 as int) AS tid
        |      FROM u GROUP BY term
        |      QUALIFY row_number() OVER (ORDER BY count(*) DESC, term) <= 32),
        |f AS (SELECT doc_id, s.pos AS pos, s.term AS term FROM (
        |        SELECT doc_id,
        |          unnest(list_transform(range(1, 6), i ->
        |            CASE WHEN i <= len(toks)
        |                 THEN {'pos': i, 'term': toks[i]} END)) AS s
        |        FROM t)
        |      WHERE s IS NOT NULL),
        |e AS (SELECT f.doc_id, f.pos, coalesce(v.tid, -1) AS tid
        |      FROM f LEFT JOIN v USING (term))
        |SELECT doc_id, array_to_string(list(tid ORDER BY pos), ',') AS ids
        |FROM e GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
      val vocab = TextOps.fitVocab(
        docs.select(explode(col("toks")).as("term")), 32)
      val first5 = docs.select(col("doc_id"),
        posexplode(slice(col("toks"), 1, 5))).toDF("doc_id", "pos", "term")
      first5.join(broadcast(vocab), Seq("term"), "left")
        .withColumn("tid", coalesce(col("tid"), lit(-1)))
        .groupBy("doc_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("tid")))),
            p => p.getField("tid").cast("string")), ",").as("ids"))
    },

    // Exact order statistics per source: median bracketed as the two
    // adjacent order-statistic VALUES (no interpolation — engines differ in
    // percentile_cont float formulae, order statistics are exact ints).
    QueryDef(
      "q60_order_stats",
      """WITH r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source,
        |  cast(max(n) as bigint) AS n_docs,
        |  cast(min(n_chars) as bigint) AS min_chars,
        |  cast(max(n_chars) as bigint) AS max_chars,
        |  cast(max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) as bigint) AS median_lo,
        |  cast(max(CASE WHEN rn = n // 2 + 1 THEN n_chars END) as bigint) AS median_hi
        |FROM r GROUP BY source""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("source")
      Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          row_number().over(w.orderBy(col("n_chars"), col("doc_id"))).as("rn"),
          count(lit(1)).over(w).as("n"))
        // integral div (`div`), matching DuckDB's `//`: `/` on longs would
        // promote to double and x.5 positions would match no row_number
        .withColumn("mlo", expr("(n + 1) div 2"))
        .withColumn("mhi", expr("n div 2 + 1"))
        .groupBy("source")
        .agg(
          max(col("n")).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          max(when(col("rn") === col("mlo"), col("n_chars"))).as("median_lo"),
          max(when(col("rn") === col("mhi"), col("n_chars"))).as("median_hi"))
    },

    // Rolling 1-hour event analytics via a RANGE window frame (event-time
    // neighborhood, not row neighborhood — tie-safe by construction).
    QueryDef(
      "q61_rolling_range",
      """WITH e AS (SELECT event_id, user_id, value,
        |             epoch_us(cast(ts as timestamp)) AS us FROM events)
        |SELECT event_id,
        |  cast(count(*) OVER w as bigint) AS cnt_1h,
        |  cast(cast(sum(cast(value as decimal(18,4))) OVER w as varchar) as double) AS sum_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("cnt_1h"),
          sum(Exact.dec(col("value"))).over(w).cast("double").as("sum_1h"))
    },

    // Corpus mixture report: per (source, lang) doc/token counts, mean doc
    // length, and exact token share of the whole corpus — the composition
    // summary a data-mixing stage consumes.
    QueryDef(
      "q59_source_mix",
      """WITH t AS (
        |  SELECT source, lang,
        |         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n
        |  FROM documents),
        |tot AS (SELECT sum(n) AS tot FROM t)
        |SELECT source, lang,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(n) as bigint) AS n_tokens,
        |  cast(sum(n) as double) / count(*) AS mean_len,
        |  cast(sum(n) as double) / tot AS token_share
        |FROM t CROSS JOIN tot GROUP BY source, lang, tot""".stripMargin) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          size(ArrayOps.tokens(col("text"))).cast("long").as("n"))
      val tot = t.agg(sum(col("n")).as("tot"))
      t.crossJoin(broadcast(tot))
        .groupBy("source", "lang", "tot")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n")).as("n_tokens"),
          (sum(col("n")).cast("double") / count(lit(1))).as("mean_len"),
          (sum(col("n")).cast("double") / col("tot")).as("token_share"))
        .drop("tot")
    },

    // E19 — Pd/C exception as an oracle-gated operator: a synthetic agents
    // list and procedure text are derived deterministically from documents
    // rows so all three branches fire (metal present / charcoal mentioned /
    // neither), then Extract.pdCException runs with IdentityChemistry's
    // transition-metal regex, replicated verbatim on the DuckDB side.
    QueryDef(
      "q63_pdc_exception",
      // the duplicated `lang` entry pins the duplicate semantics of BOTH
      // branches: Spark's array_except dedups the surviving agents in the
      // drop branch (list_distinct here), while the otherwise-branch
      // passes the list through untouched (duplicates kept)
      raw"""WITH t AS (
         |  SELECT doc_id,
         |    ['C', lang, lang, CASE WHEN doc_id % 3 = 0 THEN '[Pd]' ELSE source END] AS agents,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' over charcoal' ELSE text END AS proc
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, agents,
         |    list_filter(agents, a -> a <> 'C' AND a <> '[C]') AS fl,
         |    len(list_filter(agents, a ->
         |        regexp_matches(a, '\[($TmAlt)[^A-Za-z]')
         |        OR regexp_matches(a, '\[($TmAlt)\]'))) > 0
         |      OR contains(lower(proc), 'charcoal') AS dropc
         |  FROM t),
         |v AS (
         |  SELECT doc_id,
         |    CASE WHEN dropc
         |      -- first-occurrence dedup: DuckDB list_distinct reorders,
         |      -- Spark array_except keeps first-occurrence order
         |      THEN list_filter(fl, (x, i) -> list_position(fl, x) = i)
         |      ELSE agents END AS res
         |  FROM u)
         |SELECT doc_id, cast(len(res) as int) AS n_agents,
         |  array_to_string(res, '|') AS agents_str
         |FROM v""".stripMargin) { (s, dir) =>
      val agents = array(lit("C"), col("lang"), col("lang"),
        when(col("doc_id") % 3 === 0, lit("[Pd]")).otherwise(col("source")))
      val proc = when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" over charcoal"))).otherwise(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Extract.pdCException(agents, proc, IdentityChemistry).as("res"))
        .select(col("doc_id"),
          size(col("res")).cast("int").as("n_agents"),
          array_join(col("res"), "|").as("agents_str"))
    },

    // E20 — ice→0 °C default, oracle-gated: temperature is nulled above a
    // cutoff, "ice" presence is a deterministic predicate, and
    // Extract.iceTemperature fills exactly the null-and-ice rows.
    QueryDef(
      "q64_ice_default",
      """SELECT event_id,
        |  coalesce(CASE WHEN value < 150 THEN value END,
        |           CASE WHEN event_type = 'click' THEN cast(0.0 as double) END)
        |    AS temp_c
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        Extract.iceTemperature(
          when(col("value") < 150, col("value")),
          col("event_type") === "click").as("temp_c"))
    },

    // Mergeable quantile sketch: a deterministic 5% hash sample's exact
    // quantiles next to the full-data truth, per percentile. Samples merge
    // by union (the sketch property); both paths run the q75 two-pass
    // histogram — no global sort on either. Money quantiles run on exact
    // integer cents (a double→long cast truncates in Spark but rounds in
    // DuckDB; decimal cents sidestep the difference).
    QueryDef(
      "q86_sampled_quantiles",
      s"""WITH v AS (SELECT
         |    cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint) AS cents,
         |    ${XHash.bucketSql("qsk", 20, "cast(o_orderkey as varchar)")} = 0 AS samp
         |  FROM orders),
         |rs AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         |              count(*) OVER () AS n
         |       FROM v WHERE samp),
         |rf AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         |              count(*) OVER () AS n
         |       FROM v),
         |p AS (SELECT unnest([1, 25, 50, 75, 90, 99]) AS pct)
         |SELECT cast(p.pct as int) AS pct,
         |       s.cents AS est_cents, f.cents AS exact_cents
         |FROM p
         |JOIN rs s ON s.rn = (s.n * p.pct + 99) // 100
         |JOIN rf f ON f.rn = (f.n * p.pct + 99) // 100""".stripMargin) { (s, dir) =>
      val pcts = Seq(1, 25, 50, 75, 90, 99)
      val o = Tables.orders(s, dir).select(
        (Exact.dec(col("o_totalprice")) * 100).cast("long").as("cents"),
        col("o_orderkey"))
      val est = Sketches.histogramQuantiles(
          o.filter(XHash.bucket("qsk", 20, col("o_orderkey").cast("string")) === 0),
          col("cents"), pcts)
        .select(col("pct"), col("qvalue").as("est_cents"))
      val exact = Sketches.histogramQuantiles(o, col("cents"), pcts)
        .select(col("pct"), col("qvalue").as("exact_cents"))
      est.join(exact, Seq("pct"))
        .select(col("pct"), col("est_cents"), col("exact_cents"))
    },

    // SQL-standard percentile_cont, exact and sort-free: interpolates
    // between the two order statistics around h = 1 + (n−1)p/100, both
    // fetched by the two-pass histogram; the interpolation is exact
    // long→double + one multiply/add, IEEE-identical in both engines.
    QueryDef(
      "q107_percentile_cont",
      """WITH v AS (SELECT
        |    cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint) AS c
        |  FROM orders),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
        |             count(*) OVER () AS n
        |      FROM v),
        |p AS (SELECT unnest([25, 50, 75, 90]) AS pct),
        |s AS (SELECT p.pct,
        |        max(CASE WHEN rn = (100 + (n-1) * pct) // 100 THEN c END) AS lo,
        |        max(CASE WHEN rn = (100 + (n-1) * pct + 99) // 100 THEN c END) AS hi,
        |        min(n) AS n
        |      FROM r CROSS JOIN p GROUP BY p.pct)
        |SELECT cast(pct as int) AS pct,
        |  cast(lo as double) + (cast(hi as double) - cast(lo as double))
        |    * (((n-1) * pct % 100) / 100.0) AS q_cont
        |FROM s""".stripMargin) { (s, dir) =>
      val v = Tables.orders(s, dir)
        .select((Exact.dec(col("o_totalprice")) * 100).cast("long").as("c"))
      Sketches.histogramQuantilesCont(v, col("c"), Seq(25, 50, 75, 90))
    },

    // Median absolute deviation — the robust scale estimate: median of
    // |x − median(x)|, both medians exact order statistics from the
    // two-pass histogram (integer cents throughout; no sort, no float
    // until the emitted columns).
    QueryDef(
      "q109_mad",
      """WITH v AS (SELECT
        |    cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint) AS c
        |  FROM orders),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn,
        |             count(*) OVER () AS n
        |      FROM v),
        |med AS (SELECT c AS m FROM r WHERE rn = (n * 50 + 99) // 100),
        |dev AS (SELECT abs(v.c - med.m) AS d FROM v, med),
        |dr AS (SELECT d, row_number() OVER (ORDER BY d) AS rn,
        |              count(*) OVER () AS n
        |       FROM dev)
        |SELECT med.m AS median_cents, dr.d AS mad_cents
        |FROM dr, med WHERE dr.rn = (dr.n * 50 + 99) // 100""".stripMargin) { (s, dir) =>
      val v = Tables.orders(s, dir)
        .select((Exact.dec(col("o_totalprice")) * 100).cast("long").as("c"))
      // one row; pin it — the deviation pipeline's three passes would
      // otherwise each recompute the whole median subtree
      val med = Sketches.histogramQuantiles(v, col("c"), Seq(50))
        .select(col("qvalue").as("m")).localCheckpoint()
      val dev = v.crossJoin(broadcast(med))
        .select(abs(col("c") - col("m")).as("d"), col("m"))
      val mad = Sketches.histogramQuantiles(dev, col("d"), Seq(50))
        .select(col("qvalue").as("mad_cents"))
      med.select(col("m").as("median_cents")).crossJoin(mad)
    },

    // Per-category IQR outlier screen: exact q1/q3 per event_type from the
    // GROUPED two-pass histogram (no per-group sort — a window partitioned
    // by a 5-value category would funnel the corpus through 5 reducers),
    // then Tukey fences in pure integer cents: 2v < 2·q1 − 3·IQR avoids
    // the 1.5 float multiplier entirely.
    QueryDef(
      "q92_iqr_outliers",
      """WITH v AS (SELECT event_type,
        |    cast(cast(value as decimal(18,4)) * 100 as bigint) AS c
        |  FROM events),
        |r AS (SELECT event_type, c,
        |        row_number() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM v),
        |q AS (SELECT event_type,
        |        max(CASE WHEN rn = (n * 25 + 99) // 100 THEN c END) AS q1,
        |        max(CASE WHEN rn = (n * 75 + 99) // 100 THEN c END) AS q3
        |      FROM r GROUP BY event_type)
        |SELECT v.event_type,
        |  min(q1) AS q1_cents, min(q3) AS q3_cents,
        |  cast(count(*) FILTER (WHERE 2*c < 2*q1 - 3*(q3-q1)) as bigint) AS n_low,
        |  cast(count(*) FILTER (WHERE 2*c > 2*q3 + 3*(q3-q1)) as bigint) AS n_high,
        |  cast(count(*) as bigint) AS n
        |FROM v JOIN q USING (event_type)
        |GROUP BY v.event_type""".stripMargin) { (s, dir) =>
      val v = Tables.events(s, dir).select(col("event_type"),
        (Exact.dec(col("value")) * 100).cast("long").as("c"))
      val thr = Sketches.groupedHistogramQuantiles(v, "event_type", col("c"),
          Seq(25, 75))
        .groupBy("event_type").agg(
          max(when(col("pct") === 25, col("qvalue"))).as("q1"),
          max(when(col("pct") === 75, col("qvalue"))).as("q3"))
      val iqr = col("q3") - col("q1")
      v.join(broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(min(col("q1")).as("q1_cents"), min(col("q3")).as("q3_cents"),
          count(when(lit(2) * col("c") < lit(2) * col("q1") - lit(3) * iqr,
            1)).as("n_low"),
          count(when(lit(2) * col("c") > lit(2) * col("q3") + lit(3) * iqr,
            1)).as("n_high"),
          count(lit(1)).as("n"))
    },

    // Pathological-skew salted join: q55 certifies salting on NATURAL key
    // distribution; this plants the worst case — ~42% of all lineitem
    // rows remapped onto ONE key (the "hot partition owns the table"
    // shape that stalls a plain shuffle join at 100 TB, where AQE's
    // skew-split handles sort-merge spills but a single reducer key still
    // serializes) — and proves the salted path is value-identical to the
    // plain join the oracle runs. The dimension replicates saltFactor=16
    // ways via a broadcast range (25·16 rows), so the hot key fans out
    // over 16 reducer groups; SaltedJoinSpec locks the fan-out property
    // itself on a planted-skew fixture.
    QueryDef(
      "q228_skew_salted_agg",
      """WITH f AS (SELECT CASE WHEN l_orderkey % 10 < 4 THEN 0
        |                       ELSE l_orderkey % 25 END AS skew_key,
        |             l_extendedprice, l_discount
        |           FROM lineitem)
        |SELECT n_name,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))
        |           * (1 - cast(l_discount as decimal(18,4)))) as varchar) as double)
        |    AS revenue,
        |  cast(count(*) as bigint) AS n_lines
        |FROM f JOIN nation ON skew_key = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val fact = Tables.lineitem(s, dir).select(
        when(col("l_orderkey") % 10 < 4, lit(0L))
          .otherwise(col("l_orderkey") % 25).as("skew_key"),
        col("l_extendedprice"), col("l_discount"))
      val dim = Tables.nation(s, dir).select(
        col("n_nationkey").cast("long").as("skew_key"), col("n_name"))
      Relational.saltedJoin(fact, dim, "skew_key", 16)
        .groupBy("n_name")
        .agg(
          sum(Exact.dec(col("l_extendedprice"))
            * (lit(1) - Exact.dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }
  )
}
