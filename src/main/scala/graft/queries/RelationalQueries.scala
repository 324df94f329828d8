package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.operators.Relational

/** Core relational coverage: scan/filter/project, hash aggregate, star join,
  * top-k, keep-first dedup, windows, semi/anti join, union-with-lineage,
  * melt+value-counts — the generic layer under SURVEY.md §2.3's cleaning
  * operators, exercised on the driver test tables.
  */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Hash aggregate with exact decimal sums (TPC-H Q1 shape; the engine
    // analogue of the reference's groupBy statistics, plot/plotter.py:74-134).
    QueryDef(
      "q01_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  cast(cast(sum(cast(l_quantity as decimal(18,4))) as varchar) as double) AS sum_qty,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))) as varchar) as double) AS sum_base,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))
        |           * (1 - cast(l_discount as decimal(18,4)))) as varchar) as double) AS sum_disc,
        |  cast(count(*) as bigint) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Exact.sumMoney(col("l_quantity")).as("sum_qty"),
          Exact.sumMoney(col("l_extendedprice")).as("sum_base"),
          sum(Exact.dec(col("l_extendedprice")) * (lit(1) - Exact.dec(col("l_discount"))))
            .cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
    },

    // Filter + projection; predicate and column pruning reach the parquet
    // scan (SURVEY.md §4.1 — the reference's manual early filters).
    QueryDef(
      "q02_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND l_quantity > 45""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_returnflag") === "R" && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // Star join: fact ⋈ fact ⋈ dims, dims broadcast (100 TB: lineitem and
    // orders shuffle-join on orderkey; customer/nation are broadcast so the
    // big side never reshuffles for them).
    QueryDef(
      "q03_star_join_revenue",
      """SELECT n_name,
        |  cast(cast(sum(cast(l_extendedprice as decimal(18,4))
        |           * (1 - cast(l_discount as decimal(18,4)))) as varchar) as double) AS revenue,
        |  cast(count(*) as bigint) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(Exact.dec(col("l_extendedprice")) * (lit(1) - Exact.dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // Top-k with deterministic tie-break (F10, plot/plotter.py:289-369).
    QueryDef(
      "q04_topk_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, dir) =>
      Relational.topK(Tables.orders(s, dir), col("o_totalprice"), col("o_orderkey"), 25)
        .select("o_orderkey", "o_totalprice")
    },

    // C13 keep-first dedup via row_number window (clean/cleaner.py:767-794).
    QueryDef(
      "q05_dedup_keepfirst",
      """SELECT event_id, user_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts, event_id) = 1""".stripMargin) { (s, dir) =>
      Relational.dedupKeepFirst(Tables.events(s, dir),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select("event_id", "user_id", "event_type")
    },

    // Running window aggregate (exact decimal running sum).
    QueryDef(
      "q06_window_running",
      """SELECT event_id,
        |  cast(cast(sum(cast(value as decimal(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as varchar) as double) AS running,
        |  cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) as bigint) AS rn
        |FROM events""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir).select(
        col("event_id"),
        sum(Exact.dec(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running"),
        row_number().over(w).cast("long").as("rn"))
    },

    // Left-semi join — the C20 "movers" side (clean/cleaner.py:885-945).
    QueryDef(
      "q07_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
      Tables.customer(s, dir)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // Left-anti join — the C20 "kept" side / C2 delete mode.
    QueryDef(
      "q08_anti_join",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    },

    // C1 union-with-lineage (clean/cleaner.py:98-135 concat of per-file
    // extracts + extracted_from_file lineage column).
    QueryDef(
      "q09_union_lineage",
      """SELECT o_orderkey, src FROM (
        |  SELECT o_orderkey, 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, 'open' AS src FROM orders WHERE o_orderstatus = 'O')""".stripMargin) { (s, dir) =>
      val o = Tables.orders(s, dir)
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), lit("finished").as("src"))
        .unionByName(
          o.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), lit("open").as("src")))
    },

    // C9 multi-column value counts as one melt + hash aggregate
    // (clean/cleaner.py:318-339).
    QueryDef(
      "q10_value_counts",
      """SELECT value, cast(count(*) as bigint) AS cnt FROM (
        |  SELECT l_returnflag AS value FROM lineitem
        |  UNION ALL SELECT l_linestatus FROM lineitem)
        |WHERE value IS NOT NULL GROUP BY value""".stripMargin) { (s, dir) =>
      Relational.valueCounts(Tables.lineitem(s, dir), Seq("l_returnflag", "l_linestatus"))
    },

    // Mode aggregate with deterministic tie-break: most frequent quantity
    // per return flag, ties to the smaller value. A map-side-combined
    // (flag, qty) count, then min_by over a (−cnt, qty) struct — the argmax
    // without a per-group sort or window.
    QueryDef(
      "q108_mode_per_group",
      """SELECT l_returnflag, q AS mode_qty, cast(cnt as bigint) AS cnt FROM (
        |  SELECT l_returnflag, q, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, q) AS rn
        |  FROM (SELECT l_returnflag, cast(l_quantity as bigint) AS q,
        |               count(*) AS cnt
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(
          min_by(col("q"), struct((-col("cnt")).as("nc"), col("q"))).as("mode_qty"),
          max(col("cnt")).as("cnt"))
    },

    // Ordered string aggregation: deterministic csv of the statuses seen
    // per priority — collect_set is unordered by contract, so the sort is
    // explicit before the join (string_agg ORDER BY on the oracle side).
    QueryDef(
      "q110_string_agg",
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses,
        |  cast(count(DISTINCT o_orderstatus) as int) AS n_statuses
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(collect_set(col("o_orderstatus")).as("ss"))
        .select(col("o_orderpriority"),
          array_join(array_sort(col("ss")), ",").as("statuses"),
          size(col("ss")).cast("int").as("n_statuses"))
    },

    // Ratio-to-report + ranking windows on top of the q03 star join:
    // each nation's share of its region's revenue and its dense rank
    // within the region. Revenue stays exact decimal through the window
    // sum; doubles appear only in the final division (IEEE-determined).
    // The windows run over the ≤|nations|-row aggregate, never the fact
    // table.
    QueryDef(
      "q102_revenue_share",
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    sum(cast(l_extendedprice as decimal(18,4))
        |        * (1 - cast(l_discount as decimal(18,4)))) AS revd
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, cast(cast(revd as varchar) as double) AS revenue,
        |  cast(cast(revd as varchar) as double)
        |    / cast(cast(sum(revd) OVER (PARTITION BY r_name) as varchar) as double) AS share,
        |  cast(dense_rank() OVER (PARTITION BY r_name
        |         ORDER BY revd DESC, n_name) as int) AS rk
        |FROM rev""".stripMargin) { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(Exact.dec(col("l_extendedprice"))
          * (lit(1) - Exact.dec(col("l_discount")))).as("revd"))
      val wp = Window.partitionBy("r_name")
      rev.select(col("r_name"), col("n_name"),
        col("revd").cast("double").as("revenue"),
        (col("revd").cast("double") /
          sum(col("revd")).over(wp).cast("double")).as("share"),
        dense_rank().over(wp.orderBy(col("revd").desc, col("n_name")))
          .cast("int").as("rk"))
    },

    // Join-cardinality audit: predict a self-join's output size from the
    // per-key histogram BEFORE paying the shuffle (Σ c², with max c² as
    // the skew headline — the "will this join explode" check a pipeline
    // runs before an expensive equi-join at 100 TB, where a single hot key
    // can dominate the whole output). The audit itself costs one combining
    // aggregate over the key column. The actual join count is computed too
    // and must EQUAL the prediction — the query is self-checking.
    QueryDef(
      "q124_join_size_audit",
      """WITH h AS (SELECT l_partkey AS k, count(*) AS c
        |           FROM lineitem GROUP BY 1)
        |SELECT cast(sum(c * c) as bigint) AS predicted,
        |  cast(max(c * c) as bigint) AS max_key_pairs,
        |  cast(count(*) as bigint) AS n_keys,
        |  (SELECT cast(count(*) as bigint)
        |   FROM lineitem a JOIN lineitem b ON a.l_partkey = b.l_partkey)
        |    AS actual
        |FROM h""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir).select(col("l_partkey").as("k"))
      val h = li.groupBy("k").agg(count(lit(1)).as("c"))
      val stats = h.agg(sum(col("c") * col("c")).as("predicted"),
        max(col("c") * col("c")).as("max_key_pairs"),
        count(lit(1)).as("n_keys"))
      val actual = li.join(li.select(col("k")), Seq("k"))
        .agg(count(lit(1)).as("actual"))
      stats.crossJoin(actual)
    },

    // Systematic weighted sampling: every order whose cents interval on
    // the cumulative-weight axis crosses a multiple of T = total/1000 —
    // deterministic, weight-proportional, integer-exact (no u^(1/w)
    // priorities). The oracle uses the textbook single global-order
    // window; Spark uses the DISTRIBUTED prefix sum (order-aligned range
    // buckets + per-bucket window + broadcast offsets), so the equality
    // also proves the two-pass prefix decomposition.
    QueryDef(
      "q127_systematic_sample",
      """WITH t AS (SELECT o_orderkey AS k,
        |    cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint) AS w
        |  FROM orders),
        |c AS (SELECT k, w, cast(sum(w) OVER (ORDER BY k) as bigint) AS cum
        |      FROM t),
        |tot AS (SELECT cast(sum(w) as bigint) AS total FROM t)
        |SELECT k AS o_orderkey, w AS w_cents, cum AS cum_cents
        |FROM c, tot
        |WHERE cum // (total // 1000) > (cum - w) // (total // 1000)""".stripMargin) { (s, dir) =>
      val t = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
        (graft.functions.Exact.dec(col("o_totalprice")) * 100)
          .cast("long").as("w"))
      graft.operators.Relational.systematicSample(t, "k", "w", 1000L)
        .select(col("k").as("o_orderkey"), col("w").as("w_cents"),
          col("__cum").as("cum_cents"))
    },

    // Binned range join: heavy lineitems (points = ship day) against
    // per-order validity windows (intervals = order day .. +1..7 days).
    // The oracle runs the textbook theta join (p BETWEEN lo AND hi); Spark
    // runs the binned equi-join (intervals replicated onto 8-day bins,
    // hash join on bin, exact containment as residual) — the equality
    // proves the binning decomposition, and PlanSpec locks that no
    // nested-loop/cartesian survives in the physical plan.
    QueryDef(
      "q128_binned_range_join",
      """WITH pt AS (SELECT l_orderkey, l_linenumber,
        |    date_diff('day', DATE '1970-01-01', cast(l_shipdate as date)) AS p
        |  FROM lineitem WHERE l_quantity > 49),
        |iv AS (SELECT o_orderkey,
        |    date_diff('day', DATE '1970-01-01', cast(o_orderdate as date)) AS lo,
        |    date_diff('day', DATE '1970-01-01', cast(o_orderdate as date))
        |      + o_orderkey % 7 + 1 AS hi
        |  FROM orders)
        |SELECT l_orderkey, l_linenumber,
        |  cast(count(*) as bigint) AS n_cover, min(o_orderkey) AS first_order
        |FROM pt JOIN iv ON p >= lo AND p <= hi
        |GROUP BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val pt = Tables.lineitem(s, dir).filter(col("l_quantity") > 49)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("p"))
      val iv = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("lo"))
        .withColumn("hi", col("lo") + col("o_orderkey") % 7 + 1)
      graft.operators.Relational.binnedIntervalJoin(pt, "p", iv, "lo", "hi", 8L)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n_cover"), min(col("o_orderkey")).as("first_order"))
    },

    // CDC MERGE apply: a derived change batch (deletes for keys %10=0, one
    // update for %10=1, a SECOND higher-version update for %20=1 — latest
    // must win — and inserts for %10=2 under shifted keys) applied to the
    // customer snapshot. One window over the batch + one anti-join on the
    // snapshot; money kept in exact cents.
    QueryDef(
      "q134_cdc_merge",
      """WITH snap AS (SELECT c_custkey AS k, c_nationkey AS nk,
        |    cast(cast(c_acctbal as decimal(18,4)) * 100 as bigint) AS bal_cents,
        |    c_mktsegment AS seg
        |  FROM customer),
        |ch AS (
        |  SELECT k, nk, bal_cents, seg, 'D' AS op, 1 AS v FROM snap WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k, nk, bal_cents + 100, 'UPDATED', 'U', 1 FROM snap WHERE k % 10 = 1
        |  UNION ALL
        |  SELECT k, nk, bal_cents + 200, 'UPDATED2', 'U', 2 FROM snap WHERE k % 20 = 1
        |  UNION ALL
        |  SELECT k + 1000000, nk, 4200, 'NEW', 'I', 1 FROM snap WHERE k % 10 = 2),
        |latest AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |    FROM ch) WHERE rn = 1),
        |surv AS (SELECT s.* FROM snap s WHERE NOT EXISTS (
        |  SELECT 1 FROM latest l WHERE l.k = s.k AND l.op IN ('D', 'U'))),
        |appl AS (SELECT k, nk, bal_cents, seg FROM latest WHERE op IN ('U', 'I'))
        |SELECT k, nk, bal_cents, seg FROM surv
        |UNION ALL SELECT * FROM appl""".stripMargin) { (s, dir) =>
      val snap = Tables.customer(s, dir).select(
        col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        (graft.functions.Exact.dec(col("c_acctbal")) * 100).cast("long")
          .as("bal_cents"),
        col("c_mktsegment").as("seg"))
      val ch = snap.filter(col("k") % 10 === 0)
        .withColumn("op", lit("D")).withColumn("v", lit(1))
        .unionByName(snap.filter(col("k") % 10 === 1)
          .withColumn("bal_cents", col("bal_cents") + 100)
          .withColumn("seg", lit("UPDATED"))
          .withColumn("op", lit("U")).withColumn("v", lit(1)))
        .unionByName(snap.filter(col("k") % 20 === 1)
          .withColumn("bal_cents", col("bal_cents") + 200)
          .withColumn("seg", lit("UPDATED2"))
          .withColumn("op", lit("U")).withColumn("v", lit(2)))
        .unionByName(snap.filter(col("k") % 10 === 2)
          .withColumn("k", col("k") + 1000000)
          .withColumn("bal_cents", lit(4200L))
          .withColumn("seg", lit("NEW"))
          .withColumn("op", lit("I")).withColumn("v", lit(1)))
      graft.operators.Relational.applyCdc(snap, ch, "k", "op", "v")
    }
  )
}
