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
    }
  )
}
