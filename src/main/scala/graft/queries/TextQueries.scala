package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayOps, XHash}
import graft.operators.{Multimodal, TextOps}

/** Text-analysis + multimodal-plumbing coverage on `documents`. */
object TextQueries {

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id, text, lang,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  private val stop = Seq("the", "a", "of", "and", "is")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  val defs: Seq[QueryDef] = Seq(

    // Language ID: marker-set intersection scoring, fixed-order argmax.
    QueryDef(
      "q35_langid",
      s"""$toksCte,
         |s AS (SELECT doc_id, lang,
         |  ${TextOps.langMarkers.map { case (l, ms) =>
              s"len(list_intersect(toks, [${ms.map(m => s"'$m'").mkString(",")}])) AS s_$l"
            }.mkString(",\n  ")}
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |       ${TextOps.langMarkers.map { case (l, _) =>
              s"WHEN s_$l = greatest(s_en, s_de, s_fr, s_es) THEN '$l'"
            }.mkString("\n       ")}
         |  END AS pred,
         |  cast(CASE WHEN (CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         |       ${TextOps.langMarkers.map { case (l, _) =>
              s"WHEN s_$l = greatest(s_en, s_de, s_fr, s_es) THEN '$l'"
            }.mkString("\n       ")}
         |       END) = lang THEN 1 ELSE 0 END as int) AS hit
         |FROM s""".stripMargin) { (s, dir) =>
      val toks = ArrayOps.tokens(col("text"))
      val pred = TextOps.langId(toks)
      Tables.documents(s, dir).select(
        col("doc_id"), pred.as("pred"),
        when(pred === col("lang"), 1).otherwise(0).cast("int").as("hit"))
    },

    // Quality-scoring signals.
    QueryDef(
      "q36_quality",
      s"""$toksCte
         |SELECT doc_id,
         |  cast(length(text) as int) AS n_chars,
         |  cast(len(toks) as int) AS n_tokens,
         |  cast(len(list_distinct(toks)) as int) AS n_uniq,
         |  cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) as int)
         |    AS punct_cnt,
         |  cast(len(list_filter(toks, tk -> tk IN ($stopSql))) as double)
         |    / greatest(len(toks), 1) AS stop_ratio,
         |  cast(list_sum(list_transform(toks, tk -> length(tk))) as double)
         |    / greatest(len(toks), 1) AS mean_tok_len
         |FROM t""".stripMargin) { (s, dir) =>
      val toks = ArrayOps.tokens(col("text"))
      Tables.documents(s, dir)
        .withColumn("toks", toks)
        .select(col("doc_id"),
          TextOps.nChars(col("text")).cast("int").as("n_chars"),
          TextOps.nTokens(col("toks")).as("n_tokens"),
          TextOps.nUniqueTokens(col("toks")).as("n_uniq"),
          TextOps.punctCount(col("text")).cast("int").as("punct_cnt"),
          TextOps.stopwordRatio(col("toks"), stop).as("stop_ratio"),
          TextOps.meanTokenLen(col("toks")).as("mean_tok_len"))
    },

    // Whitespace + BPE-ish token counting.
    QueryDef(
      "q37_token_count",
      s"""$toksCte
         |SELECT doc_id,
         |  cast(len(toks) as int) AS ws_tokens,
         |  cast(len(regexp_extract_all(text, '[a-zA-Z]+')) as int) AS alpha_tokens,
         |  cast(len(regexp_extract_all(text, '[0-9]+')) as int) AS digit_tokens
         |FROM t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", ArrayOps.tokens(col("text")))
        .select(col("doc_id"),
          size(col("toks")).as("ws_tokens"),
          TextOps.alphaTokenCount(col("text")).as("alpha_tokens"),
          TextOps.digitTokenCount(col("text")).as("digit_tokens"))
    },

    // Rolling-hash document fingerprint (order-sensitive).
    QueryDef(
      "q38_fingerprint",
      s"""$toksCte
         |SELECT doc_id,
         |  cast(list_reduce(
         |    [cast(7 as bigint)] || list_transform(toks,
         |      tk -> ${XHash.bucketHashSql("fp", "tk")} % 1000000007),
         |    (acc, h) -> (acc * 31 + h) % 2147483647) as bigint) AS fp
         |FROM t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("toks", ArrayOps.tokens(col("text")))
        .select(col("doc_id"), TextOps.fingerprint(col("toks")).as("fp"))
    },

    // Multimodal plumbing with a REAL decode in the loop: each row
    // synthesizes an actual PNG whose dimensions come from the byte-length
    // formula, then ImageIO header-decodes the payload — the oracle's
    // formula only matches if the real decode recovers the real dimensions.
    // (Frame counts remain length-derived: video decode is the stub half.)
    QueryDef(
      "q39_multimodal_meta",
      """SELECT doc_id,
        |  cast(octet_length(encode(text)) % 512 + 64 as int) AS width,
        |  cast(octet_length(encode(text)) % 384 + 48 as int) AS height,
        |  cast(greatest(octet_length(encode(text)) // 100, 1) as int) AS n_frames,
        |  cast((greatest(octet_length(encode(text)) // 100, 1) - 1) // 3 + 1 as int)
        |    AS n_sampled
        |FROM documents""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .withColumn("blen", length(col("text").cast("binary")).cast("int"))
        .withColumn("payload", Multimodal.synthPng(
          col("blen") % 512 + 64, col("blen") % 384 + 48, col("doc_id")))
        .withColumn("dims", Multimodal.imageDims(col("payload")))
        .withColumn("n_frames",
          greatest(floor(col("blen") / 100), lit(1)).cast("int"))
      d.select(col("doc_id"),
        col("dims._1").as("width"),
        col("dims._2").as("height"),
        col("n_frames"),
        size(Multimodal.sampleFrameIdx(col("n_frames"), 3)).as("n_sampled"))
    },

    // Sequence packing (concat-and-chunk): seeded-hash document order, global
    // token-tape offsets, fixed-size context chunks. The oracle is the
    // single-global-window formulation; the engine computes identical
    // offsets with the two-pass bucket-histogram pattern (no global window
    // over data — PlanSpec).
    QueryDef(
      "q65_pack_chunks",
      s"""$toksCte,
         |o AS (SELECT doc_id, cast(len(toks) as bigint) AS n_tokens,
         |        ${XHash.bucketHashSql("pack", "cast(doc_id as varchar)")} AS h
         |      FROM t)
         |SELECT doc_id, n_tokens,
         |  cast(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint)
         |    AS tok_offset,
         |  cast(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 as bigint)
         |    AS chunk_id
         |FROM o""".stripMargin) { (s, dir) =>
      TextOps.packChunks(
        Tables.documents(s, dir).withColumn("toks", ArrayOps.tokens(col("text"))),
        "doc_id", size(col("toks")), 2048L, "pack")
    }
  )
}
