package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.XHash
import graft.operators.Features
import graft.streaming.Streams

/** Structured-Streaming + ML-boundary coverage. The streaming query runs
  * the event backlog through a real `readStream → window → writeStream`
  * pipeline (Trigger.AvailableNow, memory sink); on bounded input its
  * result equals the batch epoch-aligned bucket aggregate, which is the
  * oracle.
  */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q40_stream_window",
      """SELECT strftime(make_timestamp((epoch_us(cast(ts as timestamp))
        |         // 21600000000) * 21600000000), '%Y-%m-%d %H:%M') AS win_start,
        |       event_type, cast(count(*) as bigint) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Streams.runWindowedCounts(s, dir,
        "q40_win_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // Stream-stream interval join (click→purchase attribution within 1h,
    // per user). Watermarks on both sides + the time-range conjunct bound
    // the join state; bounded input ⇒ equals the batch interval self-join.
    QueryDef(
      "q82_stream_interval_join",
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  cast(ts as timestamp) AS ts
        |           FROM events)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM e c JOIN e p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
      Streams.runIntervalJoin(s, dir,
        "q82_ssj_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // LEFT OUTER stream-stream interval join: q82 plus the null-extended
    // rows for clicks with no purchase in the hour — emitted only when the
    // watermark passes each click's horizon (outer emission is a state
    // eviction, not a join result). Bounded input + watermark flush ⇒
    // equals the batch left interval join.
    QueryDef(
      "q121_stream_left_interval_join",
      """WITH e AS (SELECT event_id, user_id, event_type,
        |                  cast(ts as timestamp) AS ts
        |           FROM events),
        |c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM c LEFT JOIN p
        |  ON p.user_id = c.user_id
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
      Streams.runIntervalJoinLeftOuter(s, dir,
        "q121_ssj_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // Stream-static enrichment: the purchase stream joins the broadcast
    // customer→nation dimension each micro-batch (no join state), then a
    // stateful aggregate rolls up count + exact decimal revenue per nation.
    QueryDef(
      "q100_stream_static_enrich",
      """SELECT n.n_name,
        |  cast(count(*) as bigint) AS n_purchases,
        |  cast(cast(sum(cast(e.value as decimal(18,4))) as varchar) as double) AS revenue
        |FROM events e
        |JOIN customer c ON e.user_id = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      Streams.runStreamStaticJoin(s, dir,
        "q100_ssj_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // Streaming keyed distinct: dropDuplicatesWithinWatermark on
    // (user_id, event_type) — a key with real duplicates, so the state
    // store genuinely suppresses repeats (the event_id variant had
    // nothing to drop). Key-only projection ⇒ deterministic; with the
    // delay spanning the backlog it equals batch DISTINCT.
    QueryDef(
      "q145_stream_distinct",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, dir) =>
      Streams.runStreamingDistinctKeys(s, dir,
        "q145_sdk_" + java.util.UUID.randomUUID().toString.replace("-", ""),
        Seq("user_id", "event_type"), "3650 days")
    },

    // Native session_window aggregation (30-minute gap) — certifies
    // Spark's built-in session operator (merging-session hash aggregate)
    // against the classic gaps-and-islands formulation. end = last event
    // + gap by session_window's definition, replayed in the oracle.
    QueryDef(
      "q159_session_window",
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
        |SELECT user_id, min(us) AS start_us,
        |       max(us) + 1800000000 AS end_us,
        |       cast(count(*) as bigint) AS n
        |FROM g GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n"))
    },

    // Custom-state streaming sessionization (flatMapGroupsWithState):
    // the explicit-GroupState companion to q159's built-in session_window.
    // AvailableNow delivers the whole backlog as one micro-batch, so every
    // session a later event closes emits; each user's final session stays
    // open in state (unbounded-stream semantics). The oracle is therefore
    // gaps-and-islands MINUS each user's last session — certifying the
    // state logic without pretending open sessions are closed.
    QueryDef(
      "q164_stream_sessions",
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
        |      FROM x),
        |s AS (SELECT user_id, sid, min(us) AS start_us, max(us) AS end_us,
        |             cast(count(*) as bigint) AS n
        |      FROM g GROUP BY user_id, sid),
        |last AS (SELECT user_id, max(sid) AS msid FROM s GROUP BY user_id)
        |SELECT s.user_id, s.start_us, s.end_us, s.n
        |FROM s JOIN last ON s.user_id = last.user_id AND s.sid < last.msid""".stripMargin) { (s, dir) =>
      Streams.runStreamingSessions(s, dir,
          "q164_ss_" + java.util.UUID.randomUUID().toString.replace("-", ""),
          gapMinutes = 30)
        .select(col("user_id"), col("startMicros").as("start_us"),
          col("endMicros").as("end_us"), col("n").cast("long").as("n"))
    },

    // F3 — fit-on-train label index, encode the test split.
    QueryDef(
      "q41_onehot_index",
      s"""WITH b AS (SELECT *, ${XHash.bucketSql("ohe", 100, "cast(event_id as varchar)")} AS bk
         |           FROM events),
         |idx AS (SELECT event_type AS label,
         |          cast(row_number() OVER (ORDER BY count(*) DESC, event_type) - 1 as int)
         |            AS label_index
         |        FROM b WHERE bk < 90 GROUP BY event_type)
         |SELECT e.event_id,
         |  cast(coalesce(idx.label_index, (SELECT count(*) FROM idx)) as int) AS idx
         |FROM b e LEFT JOIN idx ON e.event_type = idx.label
         |WHERE e.bk >= 90""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).withColumn("bk",
        XHash.bucket("ohe", 100, col("event_id").cast("string")))
      val train = ev.filter(col("bk") < 90)
      val test = ev.filter(col("bk") >= 90)
      val index = Features.fitLabelIndex(train, "event_type")
      Features.encodeLabel(test, "event_type", index)
        .select(col("event_id"), col("event_type_idx").as("idx"))
    },

    // F6 — top-n beam combination accuracy over two heads.
    QueryDef(
      "q42_beam_accuracy",
      s"""WITH li AS (
         |  SELECT l_returnflag, l_linestatus,
         |    CASE WHEN ${XHash.bucketSql("fb", 100, "l_orderkey", "cast(l_linenumber as varchar)")} < 90
         |         THEN 'train' ELSE 'test' END AS split
         |  FROM lineitem),
         |tr AS (SELECT * FROM li WHERE split = 'train'),
         |p1 AS (SELECT l_returnflag AS v1,
         |         cast(count(*) as double) / (SELECT count(*) FROM tr) AS p
         |       FROM tr GROUP BY 1),
         |p2 AS (SELECT l_linestatus AS v2,
         |         cast(count(*) as double) / (SELECT count(*) FROM tr) AS p
         |       FROM tr GROUP BY 1),
         |combos AS (SELECT v1 || '|' || v2 AS combo FROM p1 CROSS JOIN p2
         |           ORDER BY p1.p * p2.p DESC, combo LIMIT 3),
         |te AS (SELECT l_returnflag || '|' || l_linestatus AS combo FROM li
         |       WHERE split = 'test')
         |SELECT
         |  cast(count(*) FILTER (WHERE combo IN (SELECT combo FROM combos)) as bigint)
         |    AS matched,
         |  cast(count(*) as bigint) AS total,
         |  cast(count(*) FILTER (WHERE combo IN (SELECT combo FROM combos)) as double)
         |    / count(*) AS acc
         |FROM te""".stripMargin) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .withColumn("split",
          when(XHash.bucket("fb", 100, col("l_orderkey"),
            col("l_linenumber").cast("string")) < 90, "train").otherwise("test"))
      Features.beamAccuracy2(
        li.filter(col("split") === "train"),
        li.filter(col("split") === "test"),
        "l_returnflag", "l_linestatus", 3)
    },

    // Late-data drop audit: the windowed aggregate re-run with the backlog
    // ARRIVING OUT OF ORDER (stragglers one micro-batch behind), certifying
    // Spark's late-row rule — a row is dropped iff its window end ≤ the
    // watermark committed before its batch (max on-time ts − 1 h). The
    // oracle replays that rule arithmetically: on-time rows always count;
    // straggler (event_id % 11 = 0) rows count only in windows still open
    // at the straggler batch's watermark.
    QueryDef(
      "q185_stream_late_audit",
      """WITH e AS (SELECT event_id,
        |             epoch_us(cast(ts as timestamp)) AS us, event_type
        |           FROM events),
        |w AS (SELECT max(us) - 3600000000 AS wm FROM e
        |      WHERE event_id % 11 <> 0),
        |k AS (SELECT event_type, (us // 21600000000) * 21600000000 AS ws
        |      FROM e, w
        |      WHERE event_id % 11 <> 0
        |         OR (us // 21600000000) * 21600000000 + 21600000000 > wm)
        |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M') AS win_start,
        |       event_type, cast(count(*) as bigint) AS cnt
        |FROM k GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Streams.runLateAudit(s, dir,
        "q185_late_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // Late-data drop audit for the stream-stream interval join: purchases
    // straggling one micro-batch behind (event_id % 13 = 0) are dropped by
    // RAW EVENT TIME (p_ts ≤ max on-time ts − 1 h) — a different rule from
    // q185's aggregation drop (window end), which is exactly why both
    // audits exist. The oracle is the batch interval join minus the
    // filtered stragglers.
    QueryDef(
      "q186_stream_join_late_audit",
      """WITH e AS (SELECT event_id, user_id, event_type,
        |             epoch_us(cast(ts as timestamp)) AS us
        |           FROM events),
        |w AS (SELECT max(us) - 3600000000 AS wm FROM e
        |      WHERE NOT (event_type = 'purchase' AND event_id % 13 = 0)),
        |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, us FROM e, w
        |      WHERE event_type = 'purchase'
        |        AND (event_id % 13 <> 0 OR us > wm))
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM c JOIN p
        |  ON p.user_id = c.user_id
        | AND p.us >= c.us AND p.us <= c.us + 3600000000""".stripMargin) { (s, dir) =>
      Streams.runIntervalJoinLateAudit(s, dir,
        "q186_jlate_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    },

    // Streaming window entropy: the per-window event-type distribution
    // entropy in fixed point — the "did this window's traffic mix
    // collapse" monitor a streaming pipeline alarms on. The stateful part
    // is the real watermarked windowed count (q40's certified path); the
    // entropy layer rides the FxLog2 contract over the per-window counts,
    // so the oracle replays H = log2fx(n) − Σc·log2fx(c)//n exactly.
    QueryDef(
      "q221_stream_entropy",
      s"""WITH c AS (SELECT strftime(make_timestamp(
         |    (epoch_us(cast(ts as timestamp)) // 21600000000) * 21600000000),
         |    '%Y-%m-%d %H:%M') AS win_start,
         |    event_type, count(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |${graft.functions.FxLog.sqlCtes("lt", "c", "cnt", "lg_c")},
         |a AS (SELECT win_start, sum(cnt) AS n, sum(cnt * lg_c) AS s2,
         |        count(*) AS n_types FROM lt GROUP BY 1),
         |${graft.functions.FxLog.sqlCtes("ln", "a", "n", "lg_n")}
         |SELECT win_start, cast(n as bigint) AS n_events,
         |  cast(n_types as bigint) AS n_types,
         |  cast(lg_n - s2 // n as bigint) AS h_fx
         |FROM ln""".stripMargin) { (s, dir) =>
      import graft.functions.FxLog
      val counts = Streams.runWindowedCounts(s, dir,
        "q221_went_" + java.util.UUID.randomUUID().toString.replace("-", ""))
      counts.groupBy("win_start")
        .agg(sum(col("cnt")).as("n"),
          sum(col("cnt") * FxLog.log2fx(col("cnt"))).as("s2"),
          count(lit(1)).cast("long").as("n_types"))
        .select(col("win_start"), col("n").cast("long").as("n_events"),
          col("n_types"),
          (FxLog.log2fx(col("n")) - expr("s2 div n")).cast("long").as("h_fx"))
    }
  )
}
