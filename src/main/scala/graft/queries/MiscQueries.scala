package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Source-format breadth + feature-engineering extras: semi-structured JSON
  * column access, as-of join (composed from built-ins per the §4.3
  * preference order), deterministic int8 embedding quantization.
  */
object MiscQueries {

  val defs: Seq[QueryDef] = Seq(

    // Corpus snapshot diff (CDC-style): digest-keyed comparison of a table
    // against its next version (planted: every 7th doc edited, every 13th
    // dropped, 50 appended). Emits one row per changed key with a status —
    // the incremental-refresh primitive of a pipeline that re-crawls.
    // Shape: md5 digests computed map-side, one full outer hash join on
    // the id; no content ever shuffles at full width.
    QueryDef(
      "q87_snapshot_diff",
      """WITH old AS (SELECT doc_id, md5(text) AS d FROM documents),
        |new AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END) AS d
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5('appended doc') FROM documents
        |  WHERE doc_id < 50),
        |j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |             old.d AS od, new.d AS nd
        |      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
        |SELECT doc_id,
        |  CASE WHEN od IS NULL THEN 'added'
        |       WHEN nd IS NULL THEN 'removed'
        |       ELSE 'changed' END AS status
        |FROM j WHERE od IS NULL OR nd IS NULL OR od <> nd""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.select(col("doc_id"), md5(col("text")).as("d"))
      val newer = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text"))).as("d"))
        .unionByName(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            md5(lit("appended doc")).as("d")))
      graft.operators.Relational.snapshotDiff(old, newer, "doc_id", "d")
    },

    // SCD2 dimension history from the q87 snapshot pair: unchanged keys
    // keep one open version, changed keys close v0 at day 1 and open v1,
    // removed close, added open. One full outer hash join; the 0-2 row
    // fan-out per key is a map-side explode, never a second shuffle.
    QueryDef(
      "q101_scd2_history",
      """WITH old AS (SELECT doc_id, md5(text) AS d FROM documents),
        |new AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END) AS d
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, md5('appended doc') FROM documents
        |  WHERE doc_id < 50),
        |j AS (SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |             old.d AS od, new.d AS nd
        |      FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
        |SELECT doc_id, nd AS d, 1 AS valid_from, cast(NULL as int) AS valid_to
        |  FROM j WHERE od IS NULL
        |UNION ALL
        |SELECT doc_id, od, 0, 1 FROM j WHERE nd IS NULL
        |UNION ALL
        |SELECT doc_id, od, 0, cast(NULL as int) FROM j WHERE od = nd
        |UNION ALL
        |SELECT doc_id, od, 0, 1
        |  FROM j WHERE od IS NOT NULL AND nd IS NOT NULL AND od <> nd
        |UNION ALL
        |SELECT doc_id, nd, 1, cast(NULL as int)
        |  FROM j WHERE od IS NOT NULL AND nd IS NOT NULL AND od <> nd""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.select(col("doc_id"), md5(col("text")).as("d"))
      val newer = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text"))).as("d"))
        .unionByName(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            md5(lit("appended doc")).as("d")))
      graft.operators.Relational.scd2FromSnapshots(old, newer, "doc_id", "d",
        d0 = 0, d1 = 1)
    },

    // Rollup (grouping sets): revenue totals at (flag, status), per-flag,
    // and grand-total levels in ONE pass — partial aggregates expand the
    // grouping sets map-side, so the fact table is read and shuffled once
    // instead of once per level. grouping() flags disambiguate NULLs.
    QueryDef(
      "q88_rollup_revenue",
      """SELECT l_returnflag, l_linestatus,
        |  cast(grouping(l_returnflag) as int) AS g_flag,
        |  cast(grouping(l_linestatus) as int) AS g_status,
        |  cast(count(*) as bigint) AS n,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))) as varchar) as double) AS revenue
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          count(lit(1)).as("n"),
          graft.functions.Exact.sumMoney(col("l_extendedprice")).as("revenue"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("g_flag").cast("int"), col("g_status").cast("int"),
          col("n"), col("revenue"))
    },

    // Pivot: per-user event counts spread across the five fixed event
    // types — the wide-report sink shape. Explicit pivot values keep the
    // plan a single pass (no distinct-values pre-query); the oracle is the
    // equivalent FILTER aggregation.
    QueryDef(
      "q89_pivot_events",
      """SELECT user_id,
        |  cast(count(*) FILTER (WHERE event_type = 'click') as bigint) AS evt_click,
        |  cast(count(*) FILTER (WHERE event_type = 'error') as bigint) AS evt_error,
        |  cast(count(*) FILTER (WHERE event_type = 'purchase') as bigint) AS evt_purchase,
        |  cast(count(*) FILTER (WHERE event_type = 'signup') as bigint) AS evt_signup,
        |  cast(count(*) FILTER (WHERE event_type = 'view') as bigint) AS evt_view
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // absent (user, type) cells come back null from pivot; the oracle's
      // FILTER counts say 0. evt_ prefix keeps 'view' off the column list.
      pivoted.select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"evt_$t")): _*)
    },

    // Cube (all grouping-set combinations): q88's rollup covers the
    // hierarchy levels; CUBE adds the cross combinations ((), (pri), (st),
    // (pri, st)) — still ONE scan and one shuffle, the partial aggregate
    // expanding each input row into every grouping set map-side.
    QueryDef(
      "q90_cube_orders",
      """SELECT o_orderpriority, o_orderstatus,
        |  cast(grouping(o_orderpriority) as int) AS g_pri,
        |  cast(grouping(o_orderstatus) as int) AS g_st,
        |  cast(count(*) as bigint) AS n,
        |  cast(cast(sum(cast(o_totalprice as decimal(18,4))) as varchar) as double) AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping(col("o_orderpriority")).as("g_pri"),
          grouping(col("o_orderstatus")).as("g_st"),
          count(lit(1)).as("n"),
          graft.functions.Exact.sumMoney(col("o_totalprice")).as("revenue"))
        .select(col("o_orderpriority"), col("o_orderstatus"),
          col("g_pri").cast("int"), col("g_st").cast("int"),
          col("n"), col("revenue"))
    },

    // Arbitrary GROUPING SETS (beyond rollup's hierarchy and cube's full
    // cross): two unrelated 2-D breakdowns plus a 1-D margin in ONE scan
    // and one shuffle — the grouping-set expansion happens map-side in the
    // partial aggregate, exactly like q88/q90. Sets that would repeat
    // under cube never materialize.
    QueryDef(
      "q119_grouping_sets",
      """WITH li AS (SELECT l_returnflag, l_linestatus,
        |  cast(extract(month from l_shipdate) as int) AS ship_month, l_quantity
        |  FROM lineitem)
        |SELECT l_returnflag, l_linestatus, ship_month,
        |  cast(grouping(l_returnflag) as int) AS g_flag,
        |  cast(grouping(l_linestatus) as int) AS g_status,
        |  cast(grouping(ship_month) as int) AS g_month,
        |  cast(count(*) as bigint) AS n,
        |  cast(cast(sum(cast(l_quantity as decimal(18,4))) as varchar) as double) AS qty
        |FROM li
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag, ship_month),
        |                        (ship_month))""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .withColumn("ship_month", month(col("l_shipdate")))
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag"), col("ship_month")),
            Seq(col("ship_month"))),
          col("l_returnflag"), col("l_linestatus"), col("ship_month"))
        .agg(grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          grouping(col("ship_month")).as("g_month"),
          count(lit(1)).as("n"),
          graft.functions.Exact.sumMoney(col("l_quantity")).as("qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("ship_month"),
          col("g_flag").cast("int"), col("g_status").cast("int"),
          col("g_month").cast("int"), col("n"), col("qty"))
    },

    // Bag-semantics set operations: EXCEPT ALL / INTERSECT ALL between the
    // open-order and urgent-order customer multisets (a customer with 3
    // open and 1 urgent order keeps 2 'except' copies). Spark plans both
    // as a single aggregate over a tagged union (count-difference
    // replication) — one shuffle, no join; the result is re-aggregated so
    // the multiplicities themselves are what the oracle checks.
    QueryDef(
      "q120_bag_set_ops",
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |ex AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b),
        |ix AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
        |SELECT 'except_all' AS op, o_custkey AS custkey,
        |       cast(count(*) as bigint) AS n
        |FROM ex GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all', o_custkey, cast(count(*) as bigint)
        |FROM ix GROUP BY 2""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val a = orders.filter(col("o_orderstatus") === "O").select("o_custkey")
      val b = orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
      val ex = a.exceptAll(b).groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"),
          col("o_custkey").as("custkey"), col("n"))
      val ix = a.intersectAll(b).groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"),
          col("o_custkey").as("custkey"), col("n"))
      ex.unionByName(ix)
    },

    // Time-series gap fill: per-user daily event counts densified over each
    // user's own [first, last] day span — missing days appear as zero rows
    // and the day's max spend carries forward. Integer day axis (epoch-day
    // offset from the corpus start) keeps both engines in exact arithmetic.
    QueryDef(
      "q93_gap_fill_daily",
      """WITH d AS (
        |  SELECT user_id,
        |    cast(date_diff('day', DATE '2024-01-01', cast(ts as date)) as int) AS day_idx,
        |    cast(count(*) as bigint) AS n_events,
        |    max(cast(cast(value as decimal(18,4)) * 100 as bigint)) AS cents
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, min(day_idx) AS d0, max(day_idx) AS d1
        |      FROM d GROUP BY 1),
        |dense AS (SELECT user_id, cast(unnest(range(d0, d1 + 1)) as int) AS day_idx
        |          FROM s),
        |j AS (SELECT dense.user_id, dense.day_idx,
        |             coalesce(d.n_events, 0) AS n_events, d.cents
        |      FROM dense LEFT JOIN d USING (user_id, day_idx))
        |SELECT user_id, day_idx, n_events,
        |  last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY day_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill
        |FROM j""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      val daily = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).cast("int").as("day_idx"),
          (Exact.dec(col("value")) * 100).cast("long").as("cents"))
        .groupBy("user_id", "day_idx")
        .agg(count(lit(1)).as("n_events"), max(col("cents")).as("cents"))
      graft.operators.Relational.gapFillDaily(daily, "user_id", "day_idx",
          zeroCols = Seq("n_events"), ffillCols = Seq("cents"))
        .select(col("user_id"), col("day_idx"), col("n_events"),
          col("cents").as("cents_ffill"))
    },

    // Ordered conversion funnel: users with a view, users whose first view
    // precedes a click, and users completing view → click → purchase in
    // order. Each stage is a keyed aggregate + one equi-join on user_id —
    // no per-user event-sequence sort, no window over the raw stream.
    QueryDef(
      "q95_funnel",
      """WITH v AS (SELECT user_id, min(cast(ts as timestamp)) AS t1
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(cast(e.ts as timestamp)) AS t2
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND cast(e.ts as timestamp) >= v.t1
        |      GROUP BY 1),
        |p AS (SELECT e.user_id
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND cast(e.ts as timestamp) >= c.t2
        |      GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_view_click,
        |       (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") >= col("t2"))
        .select("user_id").distinct()
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
    },

    // Data-quality constraint report (deequ/dbt-test flavor): five checks,
    // each one aggregate or anti-join, unioned into (check, n_violations).
    // Two constraints genuinely fail on this corpus (value cap, accepted
    // event types) and three genuinely hold — the report proves the checks
    // run, not just that the data is clean.
    QueryDef(
      "q112_dq_report",
      """SELECT 'events_value_le_300' AS check,
        |  cast(count(*) FILTER (WHERE NOT (value >= 0 AND value <= 300)) as bigint)
        |    AS n_violations
        |FROM events
        |UNION ALL
        |SELECT 'events_type_accepted',
        |  cast(count(*) FILTER (WHERE event_type NOT IN
        |    ('click', 'view', 'purchase', 'signup')) as bigint)
        |FROM events
        |UNION ALL
        |SELECT 'events_props_not_null',
        |  cast(count(*) FILTER (WHERE props IS NULL) as bigint) FROM events
        |UNION ALL
        |SELECT 'events_id_unique',
        |  cast(coalesce((SELECT sum(c) FROM (
        |    SELECT count(*) AS c FROM events GROUP BY event_id HAVING count(*) > 1)),
        |    0) as bigint)
        |UNION ALL
        |SELECT 'events_user_in_customer',
        |  cast((SELECT count(*) FROM events e
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                          WHERE c.c_custkey = e.user_id)) as bigint)""".stripMargin) { (s, dir) =>
      import graft.operators.DataQuality._
      report(Tables.events(s, dir), Seq(
        Predicate("events_value_le_300",
          !(col("value") >= 0 && col("value") <= 300)),
        Predicate("events_type_accepted",
          !col("event_type").isin("click", "view", "purchase", "signup")),
        NotNull("events_props_not_null", "props"),
        Unique("events_id_unique", Seq("event_id")),
        RefIntegrity("events_user_in_customer", "user_id",
          Tables.customer(s, dir), "c_custkey")))
    },

    // Window-function breadth over the event stream: lag delta, ntile
    // quartile, cume_dist — all under a deterministic (ts, event_id)
    // ordering. Partitioned by user, so parallelism is the user count;
    // ties cannot occur (event_id unique), so cume_dist is exactly
    // row_number/n in both engines.
    QueryDef(
      "q113_window_breadth",
      """SELECT event_id,
        |  cast(c - lag(c) OVER w as bigint) AS delta_cents,
        |  cast(ntile(4) OVER w as int) AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM (SELECT event_id, user_id, ts,
        |        cast(cast(value as decimal(18,4)) * 100 as bigint) AS c
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          (Exact.dec(col("value")) * 100).cast("long").as("c"))
        .select(col("event_id"),
          (col("c") - lag(col("c"), 1).over(w)).as("delta_cents"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cd"))
    },

    // Corrupt-record quarantine: planted truncation (final '}' chopped on
    // every 11th event) must route rows to the bad counter, not crash the
    // scan and not silently zero the field — the PERMISSIVE-ingestion
    // contract. Validity check is a real JSON parse on both engines
    // (get_json_object / json_valid), one narrow projection + aggregate.
    QueryDef(
      "q111_corrupt_quarantine",
      """SELECT event_type,
        |  cast(count(*) FILTER (WHERE json_valid(p)) as bigint) AS n_ok,
        |  cast(count(*) FILTER (WHERE NOT json_valid(p)) as bigint) AS n_bad
        |FROM (SELECT event_type,
        |        CASE WHEN event_id % 11 = 0
        |             THEN substr(props, 1, length(props) - 1)
        |             ELSE props END AS p
        |      FROM events)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val p = when(col("event_id") % 11 === 0,
        expr("substring(props, 1, length(props) - 1)")).otherwise(col("props"))
      Tables.events(s, dir)
        .withColumn("ok", get_json_object(p, "$").isNotNull)
        .groupBy("event_type")
        .agg(count(when(col("ok"), 1)).as("n_ok"),
          count(when(!col("ok"), 1)).as("n_bad"))
    },

    // Semi-structured access: JSON props column → typed field → aggregate.
    QueryDef(
      "q50_json_props",
      """SELECT event_type,
        |  cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS k_sum,
        |  cast(min(cast(json_extract_string(props, '$.k') as int)) as int) AS k_min,
        |  cast(max(cast(json_extract_string(props, '$.k') as int)) as int) AS k_max,
        |  cast(count(json_extract_string(props, '$.k')) as bigint) AS k_cnt
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k")
      Tables.events(s, dir).groupBy("event_type").agg(
        sum(k.cast("long")).as("k_sum"),
        min(k.cast("int")).as("k_min"),
        max(k.cast("int")).as("k_max"),
        count(k).as("k_cnt"))
    },

    // Z-order (Morton) key: bit-interleave of (user_id, event_id) — the
    // multi-dimensional clustering key for min/max file skipping (the write
    // path is Layout.clusterByZOrder; this verifies the key arithmetic,
    // exact integer shifts in both engines).
    QueryDef(
      "q74_zorder_key",
      s"""SELECT event_id, user_id,
         |  cast(${graft.operators.Layout.zorder2Sql("user_id", "event_id", 20)}
         |    as bigint) AS zkey
         |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        graft.operators.Layout.zorder2(col("user_id"), col("event_id"), 20)
          .as("zkey"))
    },

    // Hilbert-curve key: the stronger-locality clustering index next to
    // q74's Morton key (consecutive indices are always-adjacent cells, so
    // range-partitioned files cover tighter boxes — write path is
    // Layout.clusterByHilbert, pruning proven in HilbertPruningSpec).
    // Exact integer walk in both engines; the oracle carries the per-level
    // (x, y) rotation state through a recursive CTE.
    QueryDef(
      "q117_hilbert_key",
      graft.operators.Layout.hilbert2OracleSql(
        "SELECT event_id, user_id, user_id % 1024 AS x, event_id % 1024 AS y FROM events",
        Seq("event_id", "user_id"), 10)) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        graft.operators.Layout.hilbert2(
          col("user_id") % 1024, col("event_id") % 1024, 10).as("hkey"))
    },

    // Query-side Hilbert pruning: a 2-D box predicate rewritten to a
    // disjunction of contiguous hkey ranges (Layout.hilbertBoxRanges —
    // driver-side planning arithmetic, the form range-partition/file
    // pruning consumes). Self-checking: the range-predicate count must
    // EQUAL the direct box count. The range list is computed once at
    // query build and embedded as literals in BOTH engines.
    {
      val (o, bx0, bx1, by0, by1) = (6, 10L, 39L, 20L, 51L)
      val rs = graft.operators.Layout.hilbertBoxRanges(o, bx0, bx1, by0, by1)
      val rangeSql = rs
        .map { case (lo, hi) => s"(hkey BETWEEN $lo AND $hi)" }
        .mkString(" OR ")
      val inner = graft.operators.Layout.hilbert2OracleSql(
        s"SELECT event_id, user_id, user_id % 64 AS x, event_id % 64 AS y FROM events",
        Seq("event_id", "user_id"), o)
      QueryDef(
        "q125_hilbert_range_pruning",
        s"""WITH hk AS (SELECT event_id, user_id, hkey FROM ($inner))
           |SELECT
           |  (SELECT cast(count(*) as bigint) FROM events
           |   WHERE user_id % 64 BETWEEN $bx0 AND $bx1
           |     AND event_id % 64 BETWEEN $by0 AND $by1) AS n_box,
           |  cast(count(*) FILTER (WHERE $rangeSql) as bigint) AS n_range_pred,
           |  cast(${rs.size} as int) AS n_ranges
           |FROM hk""".stripMargin) { (s, dir) =>
        val ev = Tables.events(s, dir)
        val hk = ev.select(
          graft.operators.Layout.hilbert2(
            col("user_id") % 64, col("event_id") % 64, o).as("hkey"))
        val rangePred = rs
          .map { case (lo, hi) => col("hkey").between(lo, hi) }
          .reduce(_ || _)
        val nBox = ev.filter(
            (col("user_id") % 64).between(bx0, bx1) &&
            (col("event_id") % 64).between(by0, by1))
          .agg(count(lit(1)).as("n_box"))
        val nRange = hk.agg(
          count(when(rangePred, lit(1))).as("n_range_pred"))
        nBox.crossJoin(nRange)
          .withColumn("n_ranges", lit(rs.size).cast("int"))
      }
    },

    // As-of join composed from built-ins: each purchase joined to the most
    // recent prior click of the same user (union + running last-non-null —
    // no custom physical operator needed, SURVEY §4.3 preference (a)).
    QueryDef(
      "q51_asof_join",
      """SELECT event_id, asof_click FROM (
        |  SELECT event_id, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("asof_click",
          last(when(col("event_type") === "click", col("event_id")), true).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "asof_click")
    },

    // Deterministic int8 embedding quantization (floor, not round — floor
    // is bit-identical across engines; round's tie rule is not).
    QueryDef(
      "q52_quantize_int8",
      """SELECT vec_id,
        |  cast(list_sum(list_transform(q, x -> abs(x))) as bigint) AS q_l1,
        |  cast(list_min(q) as int) AS q_min,
        |  cast(list_max(q) as int) AS q_max
        |FROM (
        |  SELECT vec_id,
        |    CASE WHEN m = 0 THEN list_transform(embedding, x -> 0)
        |         ELSE list_transform(embedding,
        |                x -> cast(floor(cast(x as double) * (127.0 / m)) as int)) END AS q
        |  FROM (SELECT vec_id, embedding,
        |          list_max(list_transform(embedding, x -> abs(cast(x as double)))) AS m
        |        FROM embeddings))""".stripMargin) { (s, dir) =>
      val m = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
      val q = when(col("m") === 0,
        transform(col("embedding"), _ => lit(0)))
        .otherwise(transform(col("embedding"),
          x => floor(x.cast("double") * (lit(127.0) / col("m"))).cast("int")))
      Tables.embeddings(s, dir)
        .withColumn("m", m)
        .withColumn("q", q)
        .select(col("vec_id"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_l1"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"))
    },

    // ANALYZE-style column profile: min/max/nulls/exact-NDV for five
    // heterogeneous lineitem columns in ONE scan (the multi-distinct plans
    // as a single Expand, not five rescans — locked in PlanSpec). Doubles
    // enter as exact cents and dates as DATE so min/max stringification is
    // engine-portable.
    QueryDef(
      "q130_column_profile",
      """WITH s AS (SELECT l_orderkey, l_returnflag, l_linestatus,
        |    cast(cast(l_quantity as decimal(18,4)) * 100 as bigint) AS qty_cents,
        |    cast(l_shipdate as date) AS ship_date
        |  FROM lineitem)
        |SELECT 'l_orderkey' AS column_name,
        |  cast(min(l_orderkey) as varchar) AS min_v,
        |  cast(max(l_orderkey) as varchar) AS max_v,
        |  cast(count(*) - count(l_orderkey) as bigint) AS n_nulls,
        |  cast(count(DISTINCT l_orderkey) as bigint) AS ndv FROM s
        |UNION ALL
        |SELECT 'l_returnflag', cast(min(l_returnflag) as varchar),
        |  cast(max(l_returnflag) as varchar),
        |  cast(count(*) - count(l_returnflag) as bigint),
        |  cast(count(DISTINCT l_returnflag) as bigint) FROM s
        |UNION ALL
        |SELECT 'l_linestatus', cast(min(l_linestatus) as varchar),
        |  cast(max(l_linestatus) as varchar),
        |  cast(count(*) - count(l_linestatus) as bigint),
        |  cast(count(DISTINCT l_linestatus) as bigint) FROM s
        |UNION ALL
        |SELECT 'qty_cents', cast(min(qty_cents) as varchar),
        |  cast(max(qty_cents) as varchar),
        |  cast(count(*) - count(qty_cents) as bigint),
        |  cast(count(DISTINCT qty_cents) as bigint) FROM s
        |UNION ALL
        |SELECT 'ship_date', cast(min(ship_date) as varchar),
        |  cast(max(ship_date) as varchar),
        |  cast(count(*) - count(ship_date) as bigint),
        |  cast(count(DISTINCT ship_date) as bigint) FROM s""".stripMargin) { (s, dir) =>
      val src = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        (graft.functions.Exact.dec(col("l_quantity")) * 100).cast("long")
          .as("qty_cents"),
        col("l_shipdate").cast("date").as("ship_date"))
      graft.operators.DataQuality.columnProfile(src,
        Seq("l_orderkey", "l_returnflag", "l_linestatus", "qty_cents", "ship_date"))
    },

    // Time-weighted average (TWAP): each event's value holds until the
    // user's next event; the average weights by holding duration, not
    // event count — the telemetry/pricing aggregate where sampling rates
    // vary. Exact integer core: value in 1e-4 units (long) × duration in
    // whole ms (truncating div on both engines); the only doubles are the
    // final correctly-rounded casts and one division. One shuffle
    // (partitionBy user) for the lead window, then a combining aggregate.
    QueryDef(
      "q131_twap",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    cast(cast(value as decimal(18,4)) * 10000 as bigint) AS v
        |  FROM events),
        |n AS (SELECT user_id, v, tus,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
        |      AS next_tus
        |  FROM e),
        |a AS (SELECT user_id,
        |    cast(sum(v * ((next_tus - tus) // 1000)) as bigint) AS num,
        |    cast(sum((next_tus - tus) // 1000) as bigint) AS den
        |  FROM n WHERE next_tus IS NOT NULL GROUP BY user_id)
        |SELECT user_id, num, den,
        |  cast(num as double) / nullif(cast(den as double), 0) AS twap
        |FROM a""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
          (graft.functions.Exact.dec(col("value")) * 10000).cast("long").as("v"))
        .withColumn("next_tus", lead(col("tus"), 1).over(w))
        .filter(col("next_tus").isNotNull)
        .withColumn("dur_ms", expr("(next_tus - tus) div 1000"))
        .groupBy("user_id")
        .agg(sum(col("v") * col("dur_ms")).as("num"),
          sum(col("dur_ms")).as("den"))
        .select(col("user_id"), col("num"), col("den"),
          (col("num").cast("double") /
            nullif(col("den").cast("double"), lit(0.0))).as("twap"))
    },

    // 2-D Pareto frontier per brand (minimize price, maximize size) — the
    // skyline operator, done as two bounded passes (per-key best + a
    // bucket-decomposed strict-prefix max) instead of the quadratic
    // dominance self-join the NOT EXISTS oracle spells out. Prices keyed
    // as cents so the ordering axis is integral.
    QueryDef(
      "q143_pareto_frontier",
      """WITH p AS (SELECT p_brand,
        |             cast(round(p_retailprice * 100) as bigint) AS cents,
        |             p_size
        |           FROM part),
        |f AS (SELECT DISTINCT p_brand, cents, p_size FROM p a
        |      WHERE NOT EXISTS (
        |        SELECT 1 FROM p b
        |        WHERE b.p_brand = a.p_brand
        |          AND b.cents <= a.cents AND b.p_size >= a.p_size
        |          AND (b.cents < a.cents OR b.p_size > a.p_size)))
        |SELECT f.p_brand, f.cents, f.p_size, cast(count(*) as bigint) AS n_parts
        |FROM f JOIN p ON p.p_brand = f.p_brand AND p.cents = f.cents
        |              AND p.p_size = f.p_size
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val p = Tables.part(s, dir).select(col("p_brand"),
        expr("cast(round(p_retailprice * 100) as bigint)").as("cents"),
        col("p_size"))
      graft.operators.Relational
        .paretoFrontier2d(p, Seq("p_brand"), "cents", "p_size")
        .join(p, Seq("p_brand", "cents", "p_size"))
        .groupBy("p_brand", "cents", "p_size")
        .agg(count(lit(1)).as("n_parts"))
    },

    // First-order Markov transitions over each user's event sequence:
    // (from→to) counts and the transition probability as a scaled
    // integer (exact across engines — no float accumulation). The
    // successor comes from a lead() hash-partitioned on user_id — high-
    // cardinality partitioning, bounded per-user rows, never a global
    // sort. The sequence-mining/session-model primitive.
    QueryDef(
      "q144_event_transitions",
      """WITH s AS (SELECT user_id, event_type,
        |             lead(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS next_type
        |           FROM events),
        |p AS (SELECT event_type AS from_type, next_type AS to_type
        |      FROM s WHERE next_type IS NOT NULL),
        |f AS (SELECT from_type, cast(count(*) as bigint) AS n_from
        |      FROM p GROUP BY 1),
        |t AS (SELECT from_type, to_type, cast(count(*) as bigint) AS n
        |      FROM p GROUP BY 1, 2)
        |SELECT t.from_type, t.to_type, t.n, f.n_from,
        |       (t.n * 1000000000) // f.n_from AS p_e9
        |FROM t JOIN f USING (from_type)""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      val fromCnt = pairs.groupBy("from_type").agg(count(lit(1)).as("n_from"))
      pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .join(fromCnt, "from_type")
        .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
          expr("(n * 1000000000) div n_from").as("p_e9"))
    },

    // Weekly cohort retention matrix: users bucketed by first-seen week,
    // counted in every later week they return — the engagement/decay
    // audit every event warehouse runs. Three combining aggregates and
    // one hash join on user_id (high-cardinality key, never a window):
    // first-seen is a min-agg, activity weeks a map-side distinct, the
    // matrix a count per (cohort, offset). Week offsets stay exact
    // integers (datediff of Monday-truncated dates div 7).
    QueryDef(
      "q147_retention",
      """WITH f AS (SELECT user_id, cast(date_trunc('week', min(ts)) as date) AS cohort
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id,
        |        cast(date_trunc('week', e.ts) as date) AS aw
        |      FROM events e)
        |SELECT f.cohort,
        |       cast(date_diff('day', f.cohort, a.aw) // 7 as int) AS wk,
        |       cast(count(*) as bigint) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id").agg(min(col("ts")).as("fts"))
        .select(col("user_id"),
          date_trunc("week", col("fts")).cast("date").as("cohort"))
      val act = ev
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("aw"))
        .distinct()
      act.join(first, "user_id")
        .select(col("cohort"),
          expr("cast(datediff(aw, cohort) div 7 as int)").as("wk"))
        .groupBy("cohort", "wk")
        .agg(count(lit(1)).as("n_users"))
    },

    // Longest consecutive-day activity streak per user — the
    // gaps-and-islands classic (login streaks, SLA uptime runs). The
    // island label is (epoch day − per-user row_number): constant within
    // a consecutive run, and the window partitions on the
    // high-cardinality user_id with bounded rows per user — the safe
    // window shape (contrast: the ordered-primitive family exists for
    // windows over FEW groups).
    QueryDef(
      "q149_max_streak",
      """WITH d AS (SELECT DISTINCT user_id,
        |             cast(date_trunc('day', ts) as date) AS day
        |           FROM events),
        |i AS (SELECT user_id,
        |        date_diff('day', DATE '2020-01-01', day)
        |          - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
        |      FROM d),
        |r AS (SELECT user_id, isl, cast(count(*) as bigint) AS run
        |      FROM i GROUP BY 1, 2)
        |SELECT user_id, max(run) AS max_streak
        |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy(col("day"))
      d.withColumn("isl",
          datediff(col("day"), to_date(lit("2020-01-01")))
            - row_number().over(w))
        .groupBy("user_id", "isl").agg(count(lit(1)).as("run"))
        .groupBy("user_id").agg(max(col("run")).as("max_streak"))
    },

    // Interval×interval overlap join: each click/purchase event expands to
    // a variable-length activity interval (duration derived from its
    // value, exact cents arithmetic) and pairs with the same user's
    // overlapping intervals of the other type — the temporal-join shape
    // point-in-interval (q82/q128) can't express. The binned operator
    // replicates each interval onto the 10-minute bins it covers and
    // dedups by first-overlap-bin, so the oracle's theta join becomes a
    // hash equi-join on (user, bin). Overlap micros sum exactly (bigint).
    QueryDef(
      "q150_interval_overlap_join",
      """WITH e AS (SELECT user_id, event_type,
        |             epoch_us(cast(ts as timestamp)) AS lo,
        |             epoch_us(cast(ts as timestamp))
        |               + (cast(cast(value as decimal(18,4)) * 100 as bigint)
        |                  % 1800 + 60) * 1000000 AS hi
        |           FROM events),
        |c AS (SELECT user_id, lo AS c_lo, hi AS c_hi FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, lo AS p_lo, hi AS p_hi FROM e
        |      WHERE event_type = 'purchase')
        |SELECT c.user_id, cast(count(*) as bigint) AS n_pairs,
        |       cast(sum(least(c_hi, p_hi) - greatest(c_lo, p_lo)) as bigint)
        |         AS overlap_us
        |FROM c JOIN p ON p.user_id = c.user_id
        |              AND c_lo <= p_hi AND p_lo <= c_hi
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) +
            ((Exact.dec(col("value")) * 100).cast("long") % 1800 + 60)
              * 1000000L).as("hi"))
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("lo").as("c_lo"), col("hi").as("c_hi"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("lo").as("p_lo"), col("hi").as("p_hi"))
      graft.operators.Relational
        .binnedOverlapJoin(c, "c_lo", "c_hi", p, "p_lo", "p_hi",
          Seq("user_id"), 600000000L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum(least(col("c_hi"), col("p_hi"))
            - greatest(col("c_lo"), col("p_lo"))).as("overlap_us"))
    },

    // Compaction planner: pack doc_id-ordered files into ~1 MB output
    // bins by EXCLUSIVE running size div target — the small-file
    // compaction pass every lakehouse table needs. The running sum is the
    // bucket-decomposed prefix sum over ONE global group (never a
    // single-reducer window); the plan emits one row per output bin.
    QueryDef(
      "q151_compaction_bins",
      """WITH c AS (SELECT doc_id, n_chars,
        |        sum(n_chars) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM documents)
        |SELECT cast((cum - n_chars) // 1000000 as bigint) AS bin,
        |       cast(count(*) as bigint) AS n_files,
        |       cast(sum(n_chars) as bigint) AS bytes
        |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"))
        .withColumn("__g", lit(0))
      graft.operators.Relational
        .prefixSumOrderedBy(d, Seq("__g"), "doc_id", "n_chars")
        .select(expr("(__cum - n_chars) div 1000000").as("bin"),
          col("n_chars"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"))
    },

    // Trailing 7-day distinct users per day (rolling WAU): each (user,
    // active day) projects onto the 7 days it keeps the user "active in
    // the trailing week", then a distinct + count per day. Replication is
    // bounded by the window length — the EXACT shape; the mergeable-HLL
    // register path (q133) is the approximate one when the window or
    // cardinality explodes. A range-frame distinct window can't do this
    // (count distinct isn't frame-mergeable).
    QueryDef(
      "q152_trailing_wau",
      """WITH d AS (SELECT DISTINCT user_id,
        |             cast(date_trunc('day', ts) as date) AS day
        |           FROM events),
        |t AS (SELECT DISTINCT user_id, day + CAST(o AS INT) AS tday
        |      FROM d CROSS JOIN (SELECT unnest(range(7)) AS o))
        |SELECT tday, cast(count(*) as bigint) AS wau
        |FROM t GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("o", explode(sequence(lit(0), lit(6))))
        .select(col("user_id"), date_add(col("day"), col("o")).as("tday"))
        .distinct()
        .groupBy("tday")
        .agg(count(lit(1)).as("wau"))
    },

    // Merkle-style bucket-digest sync: two table versions (q87's planted
    // edit/drop/append) compare by ORDER-INDEPENDENT per-bucket digests
    // (sum of per-row hashes mod 2^31) — the anti-entropy primitive that
    // finds which of B buckets differ while shipping only B digest rows,
    // not the table (at 100 TB: compare 2×4096 digests, re-sync only
    // differing buckets; q87's per-key diff then runs inside those).
    // Digest sums stay exact under ~4e9 rows/bucket.
    QueryDef(
      "q153_merkle_bucket_diff", {
        val h = graft.functions.XHash.bucketHashSql(
          "mrk", "cast(doc_id as varchar)", "text")
        s"""WITH old AS (SELECT doc_id %% 256 AS bucket,
           |               ($h %% 2147483648) AS rh
           |             FROM documents),
           |newv AS (
           |  SELECT doc_id, CASE WHEN doc_id %% 7 = 0 THEN text || ' edited'
           |                      ELSE text END AS text
           |  FROM documents WHERE doc_id %% 13 <> 0
           |  UNION ALL
           |  SELECT doc_id + 1000000, 'appended doc' FROM documents
           |  WHERE doc_id %% 10 = 3),
           |nw AS (SELECT doc_id %% 256 AS bucket, ($h %% 2147483648) AS rh
           |       FROM newv),
           |od AS (SELECT bucket, cast(sum(rh) as bigint) AS dg,
           |         cast(count(*) as bigint) AS n FROM old GROUP BY 1),
           |nd AS (SELECT bucket, cast(sum(rh) as bigint) AS dg,
           |         cast(count(*) as bigint) AS n FROM nw GROUP BY 1)
           |SELECT coalesce(od.bucket, nd.bucket) AS bucket,
           |       coalesce(od.n, 0) AS old_n, coalesce(nd.n, 0) AS new_n
           |FROM od FULL OUTER JOIN nd ON od.bucket = nd.bucket
           |WHERE od.dg IS DISTINCT FROM nd.dg""".stripMargin
          .replace("%%", "%")
      }) { (s, dir) =>
      import graft.functions.XHash
      def digests(df: org.apache.spark.sql.DataFrame) = df
        .select(pmod(col("doc_id"), lit(256L)).as("bucket"),
          pmod(XHash.bucketHash("mrk", col("doc_id"), col("text")),
            lit(2147483648L)).as("rh"))
        .groupBy("bucket")
        .agg(sum(col("rh")).as("dg"), count(lit(1)).as("n"))
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val newv = base.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
        .unionByName(base.filter(col("doc_id") % 10 === 3)
          .select((col("doc_id") + 1000000).as("doc_id"),
            lit("appended doc").as("text")))
      val od = digests(base)
      val nd = digests(newv)
      od.select(col("bucket"), col("dg").as("odg"), col("n").as("old_n"))
        .join(nd.select(col("bucket"), col("dg").as("ndg"),
          col("n").as("new_n")), Seq("bucket"), "full_outer")
        .filter(not(col("odg") <=> col("ndg")))
        .select(col("bucket"), coalesce(col("old_n"), lit(0L)).as("old_n"),
          coalesce(col("new_n"), lit(0L)).as("new_n"))
    },

    // Incremental aggregate maintenance: a per-customer (count, revenue)
    // aggregate kept current under a CDC batch (drop every 17th order,
    // +10.00 on every 11th, append a copy of every 23rd) by MERGING the
    // stored base aggregate with SIGNED delta partials — one full outer
    // join on the group key; the 100-TB base fact table is never
    // rescanned (here base partials are computed once from v0 to make
    // the query self-contained; in production they ARE the stored MV).
    // Oracle recomputes from the updated table — merge algebra == rescan.
    QueryDef(
      "q155_ivm_merge",
      """WITH v0 AS (SELECT o_orderkey AS k, o_custkey AS c,
        |              cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint)
        |                AS cents
        |            FROM orders),
        |v1 AS (SELECT k, c,
        |         cents + CASE WHEN k % 11 = 0 THEN 1000 ELSE 0 END AS cents
        |       FROM v0 WHERE k % 17 <> 0
        |       UNION ALL
        |       SELECT k + 10000000, c, cents + 500 FROM v0 WHERE k % 23 = 0)
        |SELECT c AS custkey, cast(count(*) as bigint) AS n,
        |       cast(sum(cents) as bigint) AS cents
        |FROM v1 GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      val v0 = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        col("o_custkey").as("c"),
        (Exact.dec(col("o_totalprice")) * 100).cast("long").as("cents"))
      val base = v0.groupBy("c")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      // signed delta partials, derived map-side from the CDC batch alone
      val delta = v0.filter(col("k") % 17 === 0)
        .select(col("c"), lit(-1L).as("dn"), (-col("cents")).as("dsc"))
        .unionByName(v0.filter(col("k") % 11 === 0 && col("k") % 17 =!= 0)
          .select(col("c"), lit(0L).as("dn"), lit(1000L).as("dsc")))
        .unionByName(v0.filter(col("k") % 23 === 0)
          .select(col("c"), lit(1L).as("dn"), (col("cents") + 500).as("dsc")))
        .groupBy("c").agg(sum(col("dn")).as("dn"), sum(col("dsc")).as("dsc"))
      base.join(delta, Seq("c"), "full_outer")
        .select(col("c").as("custkey"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("sc"), lit(0L)) + coalesce(col("dsc"), lit(0L)))
            .as("cents"))
        .filter(col("n") > 0)
    },

    // Hourly OHLC bars (open/high/low/close/volume) per event type — the
    // time-bucketed downsampling every metrics/market pipeline runs. One
    // combining aggregate per (type, hour); open/close resolve by joining
    // the min/max COMPOSITE key (in-hour micros ⊙ event_id — total order,
    // so ties at the same microsecond break deterministically) back to
    // the value table. The key packs into one bigint (event_id < the 1e7
    // stride through sf≈1; wider stride beyond). All values exact cents.
    QueryDef(
      "q156_ohlc_bars",
      """WITH e AS (SELECT event_type,
        |             epoch_us(cast(ts as timestamp)) AS us,
        |             cast(cast(value as decimal(18,4)) * 100 as bigint) AS cents,
        |             event_id
        |           FROM events),
        |k AS (SELECT event_type, us // 3600000000 AS hr,
        |        (us % 3600000000) * 10000000 + event_id AS key, cents FROM e),
        |a AS (SELECT event_type, hr, min(key) AS ok, max(key) AS ck,
        |        max(cents) AS high_cents, min(cents) AS low_cents,
        |        cast(count(*) as bigint) AS n
        |      FROM k GROUP BY 1, 2)
        |SELECT a.event_type, cast(a.hr as bigint) AS hr, o.cents AS open_cents,
        |       a.high_cents, a.low_cents, c.cents AS close_cents, a.n
        |FROM a
        |JOIN k o ON o.event_type = a.event_type AND o.hr = a.hr AND o.key = a.ok
        |JOIN k c ON c.event_type = a.event_type AND c.hr = a.hr AND c.key = a.ck
        |""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      val k = Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          (Exact.dec(col("value")) * 100).cast("long").as("cents"),
          col("event_id"))
        .select(col("event_type"), expr("us div 3600000000").as("hr"),
          expr("(us % 3600000000) * 10000000 + event_id").as("key"),
          col("cents"))
      val a = k.groupBy("event_type", "hr")
        .agg(min(col("key")).as("ok"), max(col("key")).as("ck"),
          max(col("cents")).as("high_cents"), min(col("cents")).as("low_cents"),
          count(lit(1)).as("n"))
      a.join(k.select(col("event_type"), col("hr"), col("key").as("ok"),
          col("cents").as("open_cents")), Seq("event_type", "hr", "ok"))
        .join(k.select(col("event_type"), col("hr"), col("key").as("ck"),
          col("cents").as("close_cents")), Seq("event_type", "hr", "ck"))
        .select(col("event_type"), col("hr"), col("open_cents"),
          col("high_cents"), col("low_cents"), col("close_cents"), col("n"))
    },

    // Time-series resample + linear interpolation: each event type's value
    // series re-sampled onto an hourly grid, v(t) lerped between the
    // neighboring readings (exact integer arithmetic in seconds×cents —
    // no float accumulation; edges extend flat). Both as-of directions
    // come from strictPrefixMaxOrderedBy over the readings∪grid stack
    // (forward pass keyed on 2·us / 2·t+1, backward on the negation) —
    // the distributed as-of for FEW groups, where q51's per-user window
    // would put a whole 200k-row type on one reducer. Lookups join the
    // recovered neighbor timestamp back to the value table by hash.
    QueryDef(
      "q157_lerp_resample",
      """WITH e AS (SELECT event_type,
        |             epoch_us(cast(ts as timestamp)) AS us,
        |             cast(cast(value as decimal(18,4)) * 100 as bigint) AS cents
        |           FROM events),
        |r AS (SELECT event_type, us, min(cents) AS cents FROM e GROUP BY 1, 2),
        |b AS (SELECT event_type, min(us) // 3600000000 AS h0,
        |             max(us) // 3600000000 AS h1 FROM r GROUP BY 1),
        |g AS (SELECT event_type, unnest(range(h0, h1 + 1)) * 3600000000 AS t
        |      FROM b),
        |st AS (SELECT event_type, us * 2 AS k, us, 1 AS is_r FROM r
        |       UNION ALL SELECT event_type, t * 2 + 1, t, 0 FROM g),
        |w AS (SELECT event_type, us, is_r,
        |        max(CASE WHEN is_r = 1 THEN us END) OVER (
        |          PARTITION BY event_type ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pus,
        |        min(CASE WHEN is_r = 1 THEN us END) OVER (
        |          PARTITION BY event_type ORDER BY k DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nus
        |      FROM st)
        |SELECT w.event_type, w.us // 1000000 AS t_s,
        |  CASE WHEN w.pus IS NULL THEN nv.cents
        |       WHEN w.nus IS NULL THEN pv.cents
        |       WHEN w.nus // 1000000 = w.pus // 1000000 THEN pv.cents
        |       ELSE (pv.cents * (w.nus // 1000000 - w.us // 1000000)
        |             + nv.cents * (w.us // 1000000 - w.pus // 1000000))
        |            // (w.nus // 1000000 - w.pus // 1000000) END AS v_cents
        |FROM w
        |LEFT JOIN r pv ON pv.event_type = w.event_type AND pv.us = w.pus
        |LEFT JOIN r nv ON nv.event_type = w.event_type AND nv.us = w.nus
        |WHERE w.is_r = 0""".stripMargin) { (s, dir) =>
      import graft.functions.Exact
      import graft.operators.Relational
      val r = Tables.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          (Exact.dec(col("value")) * 100).cast("long").as("cents"))
        .groupBy("event_type", "us").agg(min(col("cents")).as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // eager: the grid agg, both stack branches, and the two lookup
      // joins all scan r — materialize once so their concurrent stages
      // read cache instead of racing to recompute the events parse
      r.count()
      val g = r.groupBy("event_type")
        .agg(expr("min(us) div 3600000000").as("h0"),
          expr("max(us) div 3600000000").as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"))).as("hr"))
        .select(col("event_type"), (col("hr") * 3600000000L).as("t"))
      val stack = r.select(col("event_type"), (col("us") * 2).as("key"),
          col("us").as("v"))
        .unionByName(g.select(col("event_type"), (col("t") * 2 + 1).as("key"),
          lit(null).cast("long").as("v")))
      // one dual-direction pass replaces the old forward + negated-backward
      // strictPrefixMax pair and their re-join (r8 adjudication: halves the
      // stack scans and drops two joins from the plan)
      val both = Relational
        .strictNeighborsOrderedBy(stack, Seq("event_type"), "key", "v")
        .filter(col("v").isNull)
        .select(col("event_type"), expr("(key - 1) div 2").as("t"),
          col("__pmax").as("pus"), col("__smin").as("nus"))
      both
        .join(r.select(col("event_type"), col("us").as("pus"),
          col("cents").as("pc")), Seq("event_type", "pus"), "left")
        .join(r.select(col("event_type"), col("us").as("nus"),
          col("cents").as("nc")), Seq("event_type", "nus"), "left")
        .select(col("event_type"), expr("t div 1000000").as("t_s"),
          expr("""CASE WHEN pus IS NULL THEN nc
                 |     WHEN nus IS NULL THEN pc
                 |     WHEN nus div 1000000 = pus div 1000000 THEN pc
                 |     ELSE (pc * (nus div 1000000 - t div 1000000)
                 |           + nc * (t div 1000000 - pus div 1000000))
                 |          div (nus div 1000000 - pus div 1000000)
                 |END""".stripMargin).as("v_cents"))
    }
  )
}
