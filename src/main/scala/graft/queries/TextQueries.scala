package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayOps, XHash}
import graft.operators.{Multimodal, Sketches, TextOps}

/** Text-analysis + multimodal-plumbing coverage on `documents`. */
object TextQueries {

  private val toksCte =
    """WITH t AS (
      |  SELECT doc_id, text, lang,
      |         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents)""".stripMargin

  private val stop = Seq("the", "a", "of", "and", "is")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  /** q83's stoplist: frequent corpus words standing in for prose
    * stopwords (the synthetic documents are tech-word soup). Defined
    * before `defs`, which captures it during object initialization. */
  val gopherStop: Seq[String] = Seq("join", "hash", "row", "scan", "data")

  /** q84's subword vocabulary: every lowercase letter (full coverage — no
    * `<unk>` on the alpha corpus) plus frequent multi-character merges,
    * the shape a BPE fit on this corpus would produce. Order-insensitive
    * (TextOps.sortVocab fixes the match order). */
  val subwordVocab: Seq[String] =
    ('a' to 'z').map(_.toString) ++ Seq(
      "data", "join", "hash", "scan", "row", "col", "umn", "ort",
      "er", "an", "in", "st", "ch", "ta", "ba", "me", "cust", "om")

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

    // Multimodal plumbing with REAL decodes in the loop: each row
    // synthesizes an actual PNG whose dimensions come from the byte-length
    // formula, then ImageIO header-decodes the payload; likewise a real PCM
    // WAV whose rate/sample-count come from the formula, then the RIFF
    // chunk walk re-reads them from the header — the oracle's formulas only
    // match if the real decodes recover the real values. (Video frame
    // counts remain length-derived: video decode is the stub half.)
    QueryDef(
      "q39_multimodal_meta",
      """SELECT doc_id,
        |  cast(octet_length(encode(text)) % 512 + 64 as int) AS width,
        |  cast(octet_length(encode(text)) % 384 + 48 as int) AS height,
        |  cast(greatest(octet_length(encode(text)) // 100, 1) as int) AS n_frames,
        |  cast((greatest(octet_length(encode(text)) // 100, 1) - 1) // 3 + 1 as int)
        |    AS n_sampled,
        |  cast(8000 + octet_length(encode(text)) % 8 * 1000 as int) AS sample_rate,
        |  cast(octet_length(encode(text)) % 4000 + 16 as bigint) AS n_samples,
        |  cast((octet_length(encode(text)) % 4000 + 16) * 1000
        |    // (8000 + octet_length(encode(text)) % 8 * 1000) as bigint) AS duration_ms
        |FROM documents""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .withColumn("blen", length(col("text").cast("binary")).cast("int"))
        .withColumn("payload", Multimodal.synthPng(
          col("blen") % 512 + 64, col("blen") % 384 + 48, col("doc_id")))
        .withColumn("dims", Multimodal.imageDims(col("payload")))
        .withColumn("n_frames",
          greatest(floor(col("blen") / 100), lit(1)).cast("int"))
        .withColumn("wav", Multimodal.synthWav(
          lit(8000) + col("blen") % 8 * 1000, col("blen") % 4000 + 16,
          col("doc_id")))
        .withColumn("audio", Multimodal.audioInfo(col("wav")))
      d.select(col("doc_id"),
        col("dims._1").as("width"),
        col("dims._2").as("height"),
        col("n_frames"),
        size(Multimodal.sampleFrameIdx(col("n_frames"), 3)).as("n_sampled"),
        col("audio.sampleRate").as("sample_rate"),
        col("audio.nSamples").as("n_samples"),
        floor(col("audio.nSamples") * 1000L / col("audio.sampleRate"))
          .cast("long").as("duration_ms"))
    },

    // Same pattern for video: each row synthesizes a real minimal MP4
    // (ftyp + moov/mvhd + trak stubs + mdat) whose timescale/duration/
    // track count come from the byte-length formula, then the ISO-BMFF box
    // walk re-reads them from moov — the oracle only matches if the parse
    // recovers the real header values. mdat is never touched.
    QueryDef(
      "q78_video_meta",
      """SELECT doc_id,
        |  cast(600 + octet_length(encode(text)) % 5 * 100 as int) AS timescale,
        |  cast(octet_length(encode(text)) * 3 as bigint) AS duration,
        |  cast(1 + octet_length(encode(text)) % 3 as int) AS n_tracks,
        |  cast((1 + octet_length(encode(text)) % 3)
        |    * (octet_length(encode(text)) % 7 + 2) as bigint) AS n_samples,
        |  cast(octet_length(encode(text)) * 3 * 1000
        |    // (600 + octet_length(encode(text)) % 5 * 100) as bigint) AS duration_ms
        |FROM documents""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .withColumn("blen", length(col("text").cast("binary")).cast("int"))
        .withColumn("mp4", Multimodal.synthMp4(
          lit(600) + col("blen") % 5 * 100, (col("blen") * 3L).cast("long"),
          lit(1) + col("blen") % 3, col("blen") % 7 + 2, col("doc_id")))
        .withColumn("video", Multimodal.videoInfo(col("mp4")))
      d.select(col("doc_id"),
        col("video.timescale").as("timescale"),
        col("video.duration").as("duration"),
        col("video.nTracks").as("n_tracks"),
        // summed from the per-trak stts tables by the real box walk
        col("video.nSamples").as("n_samples"),
        floor(col("video.duration") * 1000L / col("video.timescale"))
          .cast("long").as("duration_ms"))
    },

    // BPE vocabulary induction (the fit whose RESULT q84 consumes): three
    // merge rounds over the corpus word-frequency table. Per round: pair
    // counts are one combining aggregate over distinct words, only the
    // single best pair crosses to the driver, and the rewrite is one
    // narrow string projection. The oracle replays the three rounds as
    // chained CTEs with identical replace/tie-break semantics.
    QueryDef(
      "q115_bpe_merges", {
        def round(k: Int): String = {
          val prev = s"s${k - 1}"
          s"""p$k AS (SELECT g, sum(f) AS c FROM (
             |  SELECT unnest(list_transform(range(1, len(tk)),
             |           i -> tk[i] || ' ' || tk[i+1])) AS g, f
             |  FROM (SELECT string_split(r, ' ') AS tk, f FROM $prev))
             |  GROUP BY g),
             |b$k AS (SELECT g, c FROM p$k ORDER BY c DESC, g LIMIT 1),
             |s$k AS (SELECT trim(replace(' ' || r || ' ',
             |          ' ' || (SELECT g FROM b$k) || ' ',
             |          ' ' || replace((SELECT g FROM b$k), ' ', '') || ' '))
             |          AS r, f FROM $prev),
             |n$k AS (SELECT sum(f * len(string_split(r, ' '))) AS n FROM s$k)""".stripMargin
        }
        s"""$toksCte,
           |w AS (SELECT word, count(*) AS f
           |      FROM (SELECT unnest(toks) AS word FROM t) GROUP BY word),
           |s0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS r, f
           |       FROM w),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT 1 AS step, (SELECT g FROM b1) AS pair,
           |  cast((SELECT c FROM b1) as bigint) AS cnt,
           |  cast((SELECT n FROM n1) as bigint) AS n_tokens
           |UNION ALL
           |SELECT 2, (SELECT g FROM b2), cast((SELECT c FROM b2) as bigint),
           |  cast((SELECT n FROM n2) as bigint)
           |UNION ALL
           |SELECT 3, (SELECT g FROM b3), cast((SELECT c FROM b3) as bigint),
           |  cast((SELECT n FROM n3) as bigint)""".stripMargin
      }) { (s, dir) =>
      // fan out below the tokenize/explode (Layout.fanOut doc): measured
      // solo 2.35 → 1.39 in the r15 doc-family A/B
      val words = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(explode(ArrayOps.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("f"))
      TextOps.bpeLearn(words, "word", "f", rounds = 3)
    },

    // Perceptual image dedup: REAL PNG decode → 8×7 block-average aHash →
    // group-by-hash near-dup clusters. Payloads are two-tone split images
    // whose split column comes from doc_id and whose absolute brightness
    // jitters with the seed — the mean-relative threshold cancels the
    // jitter, so images of the same composition at different exposures
    // collapse to one hash, and the expected hash is the closed-form bit
    // pattern (256 − 2^p)·0x01010101010101. The oracle only matches if the
    // real decode + integer block-average recovers exactly that pattern.
    QueryDef(
      "q99_image_ahash_dedup",
      """WITH h AS (SELECT doc_id,
        |    cast((256 - (1 << (cast(doc_id % 7 as int) + 1)))
        |         * 282578800148737 as bigint) AS ahash
        |  FROM documents)
        |SELECT ahash, cast(count(*) as bigint) AS n_docs,
        |       min(doc_id) AS rep
        |FROM h GROUP BY ahash""".stripMargin) { (s, dir) =>
      val p = (col("doc_id") % 7 + 1).cast("int")
      Tables.documents(s, dir)
        .withColumn("payload",
          Multimodal.synthSplitPng(lit(64), lit(56), p * 8, col("doc_id")))
        .withColumn("ahash", Multimodal.averageHashMemo(col("payload"), 8, 7))
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep"))
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
    },

    // Per-document sliding-window chunking (window 32 tokens, stride 24 →
    // overlap 8): the RAG-indexing counterpart of q65's cross-document
    // packing. Map-only generate — no shuffle; chunk counts, boundaries,
    // and text must match the oracle's list-slicing formulation exactly.
    QueryDef(
      "q77_sliding_chunks",
      s"""$toksCte,
         |c AS (SELECT doc_id, toks,
         |        unnest(range(0, 1 + (greatest(len(toks) - 32, 0) + 23) // 24))
         |          AS chunk_id
         |      FROM t)
         |SELECT doc_id, cast(chunk_id as bigint) AS chunk_id,
         |  cast(len(toks[chunk_id*24+1 : chunk_id*24+32]) as bigint)
         |    AS n_chunk_tokens,
         |  array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' ')
         |    AS chunk_text
         |FROM c""".stripMargin) { (s, dir) =>
      TextOps.slidingChunks(Tables.documents(s, dir), "doc_id",
        ArrayOps.tokens(col("text")), win = 32, stride = 24)
    },

    // PII scrubbing with typed tags + per-type audit counts. PII is planted
    // deterministically (synthetic docs carry none), then redacted in the
    // fixed piiPatterns order; the oracle runs the IDENTICAL pattern text
    // (RE2-compatible by construction) over the same progressive chain.
    QueryDef(
      "q67_pii_redact", {
        val chain = TextOps.piiPatterns.zipWithIndex.map {
          case ((pname, pat, tag), i) =>
            s"""p${i + 1} AS (SELECT doc_id,
               |  regexp_replace(t$i, '$pat', '$tag', 'g') AS t${i + 1},
               |  ${(0 until i).map(j => s"n_${TextOps.piiPatterns(j)._1}, ").mkString}
               |  cast(len(regexp_extract_all(t$i, '$pat')) as int) AS n_$pname
               |FROM p$i)""".stripMargin
        }.mkString(",\n")
        s"""WITH p0 AS (SELECT doc_id,
           |  text || ' contact user' || cast(doc_id as varchar)
           |       || '@mail.example or 10.0.' || cast(doc_id % 256 as varchar)
           |       || '.7 ext 555-' || cast(doc_id % 9000 + 1000 as varchar) AS t0
           |  FROM documents),
           |$chain
           |SELECT doc_id, t${TextOps.piiPatterns.size} AS clean_text,
           |  ${TextOps.piiPatterns.map(p => s"n_${p._1}").mkString(", ")}
           |FROM p${TextOps.piiPatterns.size}""".stripMargin
      }) { (s, dir) =>
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example or 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 ext 555-"), (col("doc_id") % 9000 + 1000).cast("string"))
      val (clean, counts) = TextOps.piiRedact(planted)
      Tables.documents(s, dir).select(
        (col("doc_id") +: clean.as("clean_text") +:
          counts.map { case (n, c) => c.as(s"n_$n") }): _*)
    },

    // Corpus-wide bigram top-k (Zipf head): non-distinct n-gram frequency,
    // deterministic rank (count desc, bigram asc). Scale shape: explode →
    // map-side hash aggregate → orderBy.limit(k) = TakeOrderedAndProject
    // (per-partition top-k; the full bigram dictionary is never globally
    // sorted) — same discipline as fitVocab/q58.
    QueryDef(
      "q69_bigram_topk",
      s"""$toksCte,
         |bg AS (SELECT unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
         |c AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY bg)
         |SELECT bg, cast(cnt as bigint) AS cnt, cast(rank as int) AS rank FROM (
         |  SELECT bg, cnt, row_number() OVER (ORDER BY cnt DESC, bg) AS rank
         |  FROM c) WHERE rank <= 20""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("bg").asc)
      Tables.documents(s, dir)
        .select(explode(TextOps.ngrams(ArrayOps.tokens(col("text")), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bg").asc)
        .limit(20)
        .withColumn("rank", row_number().over(w).cast("int"))
    },

    // Count-min sketch heavy hitters: estimate the top-10 tokens' counts
    // from a fixed 4×1024 counter grid instead of the unbounded exact
    // dictionary — the mergeable-sketch shape for vocabularies too large to
    // materialize. Same md5 hash family as the engine, so the oracle
    // reproduces every cell (and the up-only collision bias) bit-for-bit.
    QueryDef(
      "q72_cms_heavy_hitters",
      s"""$toksCte,
         |u AS (SELECT unnest(toks) AS term FROM t),
         |ex AS (SELECT term, count(*) AS exact_cnt FROM u GROUP BY term),
         |top AS (SELECT term, exact_cnt FROM (
         |  SELECT term, exact_cnt,
         |    row_number() OVER (ORDER BY exact_cnt DESC, term) AS rn FROM ex)
         |  WHERE rn <= 10),
         |cell AS (SELECT r.range AS r,
         |           ${XHash.bucketSql("cms", 1024,
                        "cast(r.range as varchar)", "term")} AS c,
         |           count(*) AS cnt
         |         FROM u CROSS JOIN range(0, 4) r GROUP BY 1, 2),
         |probe AS (SELECT term, exact_cnt, r.range AS r,
         |            ${XHash.bucketSql("cms", 1024,
                         "cast(r.range as varchar)", "term")} AS c
         |          FROM top CROSS JOIN range(0, 4) r)
         |SELECT term, cast(exact_cnt as bigint) AS exact_cnt,
         |  cast(min(coalesce(cell.cnt, 0)) as bigint) AS cms_cnt
         |FROM probe LEFT JOIN cell USING (r, c)
         |GROUP BY term, exact_cnt""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(explode(ArrayOps.tokens(col("text"))).as("term"))
      val top = toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("term").asc).limit(10)
      val counters = Sketches.cmsCounters(toks, "term", depth = 4, width = 1024)
      Sketches.cmsEstimate(counters, top, "term", depth = 4, width = 1024)
        .join(top, Seq("term"))
        .select(col("term"), col("exact_cnt"), col("cms_cnt"))
    },

    // HyperLogLog distinct-token estimate vs the exact count: 64 max-rank
    // registers (mergeable max aggregate — the shuffle carries 64 rows per
    // partition at any corpus size), raw harmonic estimate folded in
    // register order. Integer bin()-length rank (no float log), dyadic
    // 2^-rank terms, shared literal alpha: the estimate is bit-identical
    // across engines.
    QueryDef(
      "q73_hll_distinct",
      s"""$toksCte,
         |u AS (SELECT unnest(toks) AS term FROM t),
         |hx AS (SELECT ${XHash.bucketHashSql("hll", "term")} AS h FROM u),
         |rr AS (SELECT h % 64 AS reg,
         |         CASE WHEN (h // 64) = 0 THEN 55
         |              ELSE 55 - length(bin(h // 64)) END AS rank
         |       FROM hx),
         |regs AS (SELECT reg, max(rank) AS rank FROM rr GROUP BY reg),
         |f AS (SELECT r.range AS reg, coalesce(regs.rank, 0) AS rank
         |      FROM range(0, 64) r LEFT JOIN regs ON regs.reg = r.range),
         |s AS (SELECT list_reduce(
         |        [cast(0.0 as double)] || list(pow(0.5, rank) ORDER BY reg),
         |        (x, y) -> x + y) AS hsum FROM f),
         |ex AS (SELECT count(DISTINCT term) AS exact_distinct FROM u)
         |SELECT cast(cast(${Sketches.hllAlpha} as double) * 64 * 64 / hsum
         |         as double) AS est_distinct,
         |       cast(exact_distinct as bigint) AS exact_distinct
         |FROM s CROSS JOIN ex""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(explode(ArrayOps.tokens(col("text"))).as("term"))
      val est = Sketches.hllEstimate(Sketches.hllRegisters(toks, "term"))
      val exact = toks.agg(count_distinct(col("term")).as("exact_distinct"))
      est.crossJoin(exact)
    },

    // Per-source HLL distinct-token profile: q73's sketch, grouped — ≤64
    // register rows per source cross the wire at any corpus size (exact
    // per-group NDV would exchange every (source, token) pair). Absent
    // registers enter the harmonic sum as one exact integer term; the
    // estimates stay bit-identical across engines.
    QueryDef(
      "q133_hll_grouped",
      s"""WITH t AS (
         |  SELECT source,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |u AS (SELECT source, unnest(toks) AS term FROM t),
         |hx AS (SELECT source, ${XHash.bucketHashSql("hll", "term")} AS h FROM u),
         |rr AS (SELECT source, h % 64 AS reg,
         |         CASE WHEN (h // 64) = 0 THEN 55
         |              ELSE 55 - length(bin(h // 64)) END AS rank
         |       FROM hx),
         |regs AS (SELECT source, reg, max(rank) AS rank
         |         FROM rr GROUP BY source, reg),
         |s AS (SELECT source,
         |        list_reduce(
         |          [cast(0.0 as double)] || list(pow(0.5, rank) ORDER BY reg),
         |          (x, y) -> x + y) + (64 - count(*)) AS hsum
         |      FROM regs GROUP BY source),
         |ex AS (SELECT source, count(DISTINCT term) AS exact_distinct
         |       FROM u GROUP BY source)
         |SELECT s.source,
         |  cast(cast(${Sketches.hllAlpha} as double) * 64 * 64 / hsum
         |    as double) AS est_distinct,
         |  cast(exact_distinct as bigint) AS exact_distinct
         |FROM s JOIN ex ON s.source = ex.source""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(ArrayOps.tokens(col("text"))).as("term"))
      val est = Sketches.hllEstimateGrouped(
        Sketches.hllRegistersGrouped(toks, "source", "term"), "source")
      val exact = toks.groupBy("source")
        .agg(count_distinct(col("term")).as("exact_distinct"))
      est.join(exact, Seq("source"))
    },

    // q133 recomputed through the NATIVE one-pass aggregate (plans/
    // Hll64Agg): update folds each (source, term) row into the 64-int
    // buffer map-side, merge is zip_with max — the (source, term) pairs
    // never shuffle (vs the composed pipeline's explode + two groupBys).
    // The oracle folds filled registers in order, so equality proves the
    // native buffer produced exactly the composed registers.
    QueryDef(
      "q135_hll_native_agg",
      s"""WITH t AS (
         |  SELECT source,
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |u AS (SELECT source, unnest(toks) AS term FROM t),
         |hx AS (SELECT source, ${XHash.bucketHashSql("hll", "term")} AS h FROM u),
         |rr AS (SELECT source, h % 64 AS reg,
         |         CASE WHEN (h // 64) = 0 THEN 55
         |              ELSE 55 - length(bin(h // 64)) END AS rank
         |       FROM hx),
         |regs AS (SELECT source, reg, max(rank) AS rank
         |         FROM rr GROUP BY source, reg),
         |f AS (SELECT s.source, r.range AS reg, coalesce(regs.rank, 0) AS rank
         |      FROM (SELECT DISTINCT source FROM regs) s
         |      CROSS JOIN range(0, 64) r
         |      LEFT JOIN regs ON regs.source = s.source AND regs.reg = r.range),
         |hs AS (SELECT source,
         |         list_reduce(
         |           [cast(0.0 as double)] || list(pow(0.5, rank) ORDER BY reg),
         |           (x, y) -> x + y) AS hsum
         |       FROM f GROUP BY source)
         |SELECT source,
         |  cast(cast(${Sketches.hllAlpha} as double) * 64 * 64 / hsum
         |    as double) AS est_distinct
         |FROM hs""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("source"), explode(ArrayOps.tokens(col("text"))).as("term"))
      toks.groupBy("source")
        .agg(graft.plans.Hll64Agg(col("term")).as("regs"))
        .select(col("source"),
          (lit(Sketches.hllAlpha) * 64 * 64 /
            aggregate(col("regs"), lit(0.0),
              (acc, x) => acc + pow(lit(0.5), x))).as("est_distinct"))
    },

    // Normalized exact-dup groups: whitespace/case variants (planted: two
    // leading spaces + uppercased copies) collapse to one canonical id via
    // a hash aggregate on the normalized text — dedup robustness without
    // any pairwise comparison.
    QueryDef(
      "q71_norm_dup_groups",
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, '  ' || upper(text) FROM documents),
        |k AS (SELECT doc_id,
        |        lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        |      FROM c),
        |g AS (SELECT norm, min(doc_id) AS canonical_id, count(*) AS group_size
        |      FROM k GROUP BY norm)
        |SELECT k.doc_id, canonical_id, cast(group_size as bigint) AS group_size
        |FROM k JOIN g USING (norm)""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
      val corpus = d.select(col("doc_id"), col("text"))
        .unionByName(d.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("  "), upper(col("text"))).as("text")))
      TextOps.normalizedDupGroups(corpus, "doc_id", "text")
    },

    // Winnowing fingerprints (MOSS): 3-gram hashes, window 4, per-window
    // min — exploded to (doc_id, fp) rows. Map-only in Spark; the oracle
    // replays the identical windows over the identical md5-derived hashes.
    QueryDef(
      "q80_winnow_fingerprint",
      s"""$toksCte,
         |g AS (SELECT doc_id,
         |        CASE WHEN len(toks) >= 3
         |             THEN list_transform(range(1, len(toks) - 1),
         |                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |             ELSE cast([] as varchar[]) END AS grams
         |      FROM t),
         |h AS (SELECT doc_id,
         |        list_transform(grams, g -> ${XHash.bucketHashSql("winnow", "g")}) AS hs
         |      FROM g),
         |f AS (SELECT doc_id,
         |        CASE WHEN len(hs) = 0 THEN cast([] as bigint[])
         |             WHEN len(hs) <= 4 THEN [list_min(hs)]
         |             ELSE list_distinct(list_transform(range(1, len(hs) - 2),
         |                    i -> list_min(hs[i:i+3]))) END AS fps
         |      FROM h)
         |SELECT doc_id, unnest(fps) AS fp FROM f""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(TextOps.winnow(ArrayOps.tokens(col("text")), 3, 4)).as("fp"))
    },

    // Exact duplicated-substring spans: corpus ∪ full copies of every
    // 10th doc (planted whole-document repeats), 8-gram chains with ≥2
    // corpus-wide occurrences merged into maximal spans.
    QueryDef(
      "q81_substring_spans",
      s"""$toksCte,
         |c AS (SELECT doc_id, toks FROM t
         |      UNION ALL
         |      SELECT doc_id + 1000000, toks FROM t WHERE doc_id % 10 = 0),
         |g AS (SELECT doc_id,
         |        unnest(range(1, len(toks) - 6)) AS pos,
         |        unnest(list_transform(range(1, len(toks) - 6),
         |          i -> ${XHash.bucketHashSql("sdup",
                       "array_to_string(toks[i:i+7], ' ')")})) AS h
         |      FROM c WHERE len(toks) >= 8),
         |d AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos FROM g JOIN d USING (h)),
         |b AS (SELECT doc_id, pos,
         |        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
         |             THEN 0 ELSE 1 END AS brk
         |      FROM hits),
         |w AS (SELECT doc_id, pos,
         |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |                       ROWS UNBOUNDED PRECEDING) AS grp
         |      FROM b)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
         |       count(*) AS n_grams
         |FROM w GROUP BY doc_id, grp""".stripMargin) { (s, dir) =>
      // fan the corpus out BELOW the tokenize projection — the gram
      // explode + hash stage otherwise runs as one task on the
      // single-row-group test file (Layout.fanOut doc)
      val t = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
      val corpus = t.unionByName(
        t.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("toks")))
      TextOps.duplicateSpans(corpus, "doc_id", col("toks"), 8)
    },

    // Gopher-rules composite quality filter, thresholds tuned to the
    // synthetic corpus (token bounds 30..80, stoplist = frequent corpus
    // words) so both keep outcomes occur. Signals + verdict per doc.
    QueryDef(
      "q83_gopher_quality", {
        val stopSqlList = TextQueries.gopherStop.map(s => s"'$s'").mkString(", ")
        s"""$toksCte
           |SELECT doc_id,
           |  cast(len(toks) as bigint) AS n_toks,
           |  cast(list_sum([0] || list_transform(toks, t -> length(t))) as double)
           |    / greatest(len(toks), 1) AS mean_len,
           |  cast(len(list_intersect(list_distinct(toks), [$stopSqlList])) as bigint)
           |    AS stop_hits,
           |  cast(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) as double)
           |    / greatest(len(toks), 1) AS alpha_frac,
           |  cast(list_max([0] || list_transform(list_distinct(toks),
           |         d -> len(list_filter(toks, t -> t = d)))) as double)
           |    / greatest(len(toks), 1) AS top_frac,
           |  (len(toks) BETWEEN 30 AND 80
           |   AND (cast(list_sum([0] || list_transform(toks, t -> length(t))) as double)
           |        / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0
           |   AND len(list_intersect(list_distinct(toks), [$stopSqlList])) >= 2
           |   AND (cast(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) as double)
           |        / greatest(len(toks), 1)) >= 0.8
           |   AND (cast(list_max([0] || list_transform(list_distinct(toks),
           |          d -> len(list_filter(toks, t -> t = d)))) as double)
           |        / greatest(len(toks), 1)) <= 0.12) AS keep
           |FROM t""".stripMargin
      }) { (s, dir) =>
      val sigs = TextOps.gopherQuality(col("toks"), TextQueries.gopherStop,
        minToks = 30, maxToks = 80, minMeanLen = 3.0, maxMeanLen = 10.0,
        minStopHits = 2, minAlphaFrac = 0.8, maxTopFrac = 0.12)
      Tables.documents(s, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
        .select(col("doc_id") +: sigs.map { case (n, c) => c.as(n) }: _*)
    },

    // Subword tokenization: greedy maximal-munch against an offline vocab
    // (all single letters guarantee coverage; multi-char merges compress
    // frequent substrings) applied to each doc's first 10 tokens. The
    // oracle replays the identical (pos, pieces) fold with list_reduce.
    QueryDef(
      "q84_subword_encode", {
        val sortedVocab = TextOps.sortVocab(TextQueries.subwordVocab)
        val vocabSql = sortedVocab.map(v => s"'$v'").mkString("[", ", ", "]")
        // Two DuckDB 1.0 list_reduce quirks shape this oracle. (1) List
        // growth inside a struct accumulator is dropped (probed: {pos,
        // pieces||[x]} keeps only the last append) — so the fold state is
        // ONE string 'pos#p1|p2|…'; scalar accumulators fold correctly
        // ('#'/'|' never occur in the alpha corpus tokens). (2) An outer
        // column captured in a nested lambda misaligns rows when the fold
        // list length varies per row (probed: 'customer' came back with
        // the neighboring 'order' row's encoding) — so every row folds a
        // UNIFORM 64-step range, steps past the token's end passing
        // through untouched. Tokens over 64 chars would need a bigger
        // constant; the corpus tops out near 10.
        val cursorSql = "cast(split_part(st, '#', 1) as bigint)"
        val piecesSql = "split_part(st, '#', 2)"
        val matchesSql =
          s"list_filter($vocabSql, v -> substr(tok, $cursorSql, length(v)) = v)"
        s"""$toksCte,
           |u AS (SELECT doc_id,
           |        unnest(range(1, least(len(toks), 10) + 1)) AS pos,
           |        unnest(toks[1:least(len(toks), 10)]) AS tok
           |      FROM t),
           |enc AS (SELECT doc_id, pos, tok,
           |  CASE WHEN length(tok) = 0 THEN ''
           |  ELSE split_part(list_reduce(
           |    ['1#'] || list_transform(range(1, 65),
           |                i -> cast(i as varchar)),
           |    (st, x) -> CASE WHEN cast(x as bigint) > length(tok)
           |                      OR x <> split_part(st, '#', 1) THEN st
           |      ELSE CASE WHEN len($matchesSql) = 0
           |        THEN cast(length(tok) + 1 as varchar) || '#<unk>'
           |        ELSE cast($cursorSql + length(($matchesSql)[1]) as varchar)
           |             || '#'
           |             || CASE WHEN $piecesSql = '' THEN ($matchesSql)[1]
           |                ELSE $piecesSql || '|' || ($matchesSql)[1] END
           |      END END), '#', 2)
           |  END AS piece_str FROM u)
           |SELECT doc_id, pos, tok, piece_str,
           |  cast(CASE WHEN piece_str = '' THEN 0
           |       ELSE len(string_split(piece_str, '|')) END as bigint) AS n_pieces
           |FROM enc""".stripMargin
      }) { (s, dir) =>
      val pieces = TextOps.subwordEncode(col("tok"), TextQueries.subwordVocab)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(slice(ArrayOps.tokens(col("text")), 1, 10))
            .as(Seq("__p", "tok")))
        .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"),
          col("tok"), pieces.as("__pieces"))
        .select(col("doc_id"), col("pos"), col("tok"),
          array_join(col("__pieces"), "|").as("piece_str"),
          size(col("__pieces")).cast("long").as("n_pieces"))
    },

    // Gopher repetition rules (the family q83's length/punct/stopword
    // rules left out): most-repeated-bigram multiplicity and duplicated-
    // token fraction per doc. Spark computes both map-side — a run-length
    // fold over the SORTED per-doc bigram list replaces the (doc, gram)
    // shuffle a groupBy formulation would pay; the oracle uses the plain
    // unnest + GROUP BY formulation, so the fold is checked against the
    // textbook definition.
    QueryDef(
      "q122_repetition_signals",
      """WITH t AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n_tokens,
        |             len(list_distinct(toks)) AS n_distinct,
        |             list_transform(range(1, len(toks)),
        |               i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
        |      FROM t WHERE len(toks) > 0),
        |e AS (SELECT doc_id, unnest(bigrams) AS bg FROM b),
        |m AS (SELECT doc_id, max(c) AS top_n, sum(c) AS n_bg
        |      FROM (SELECT doc_id, bg, count(*) AS c FROM e GROUP BY 1, 2)
        |      GROUP BY 1)
        |SELECT b.doc_id, cast(b.n_tokens as bigint) AS n_tokens,
        |  cast(coalesce(m.top_n, 0) as bigint) AS top_bigram_n,
        |  cast(coalesce(m.n_bg, 0) as bigint) AS n_bigrams,
        |  cast(b.n_tokens - b.n_distinct as double)
        |    / cast(b.n_tokens as double) AS dup_token_frac
        |FROM b LEFT JOIN m ON m.doc_id = b.doc_id""".stripMargin) { (s, dir) =>
      val sig = TextOps.repetitionSignals(ArrayOps.tokens(col("text")))
      Tables.documents(s, dir)
        .select(col("doc_id"), sig.as("__s"))
        .filter(col("__s.n_tokens") > 0)
        .select(col("doc_id"), col("__s.n_tokens").as("n_tokens"),
          col("__s.top_bigram_n").as("top_bigram_n"),
          col("__s.n_bigrams").as("n_bigrams"),
          col("__s.dup_token_frac").as("dup_token_frac"))
    },

    // Cross-source vocabulary overlap matrix: shared distinct tokens and
    // lexical Jaccard for every source pair — the "how similar are my
    // corpus slices" audit before mixing weights are chosen. Bounded by
    // construction: the join key is the token, and a token contributes at
    // most |sources|² pairs regardless of corpus size, so the shuffle
    // carries the (source, token) VOCABULARY, never the corpus.
    QueryDef(
      "q123_vocab_overlap",
      """WITH v AS (SELECT DISTINCT source, unnest(
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |n AS (SELECT source, count(*) AS nv FROM v GROUP BY 1),
        |sh AS (SELECT a.source AS src_a, b.source AS src_b,
        |              count(*) AS n_shared
        |       FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT src_a, src_b, cast(n_shared as bigint) AS n_shared,
        |  cast(n_shared as double)
        |    / cast(na.nv + nb.nv - n_shared as double) AS jaccard
        |FROM sh
        |JOIN n na ON na.source = src_a
        |JOIN n nb ON nb.source = src_b""".stripMargin) { (s, dir) =>
      // fan out below the tokenize/explode (Layout.fanOut doc): measured
      // solo 3.04 → 1.49 in the r15 doc-family A/B
      val v = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(col("source"),
          explode(ArrayOps.tokens(col("text"))).as("tok"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = v.groupBy("source").agg(count(lit(1)).as("nv"))
      val sh = v.select(col("source").as("src_a"), col("tok"))
        .join(v.select(col("source").as("src_b"), col("tok")), Seq("tok"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      sh.join(broadcast(n.select(col("source").as("src_a"), col("nv").as("na"))),
          Seq("src_a"))
        .join(broadcast(n.select(col("source").as("src_b"), col("nv").as("nb"))),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          (col("n_shared").cast("double") /
            (col("na") + col("nb") - col("n_shared")).cast("double"))
            .as("jaccard"))
    },

    // CCNet/C4-style boilerplate-line removal. The corpus has no newlines,
    // so "lines" are aligned 8-token chunks, and a per-source boilerplate
    // line is PLANTED as a prepended chunk on both engines (25+ docs per
    // source at sf0.01 >= minDocs=10 → it is the frequent line; removal
    // must reconstruct exactly the original text for every document).
    QueryDef(
      "q129_boilerplate_lines",
      """WITH base AS (
        |  SELECT doc_id, concat('boiler plate for ', source,
        |    ' subscribe now thanks bye ', text) AS t
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(t, ' ') AS tk FROM base),
        |lines AS (
        |  SELECT doc_id, i AS lineno,
        |    array_to_string(list_slice(tk, i*8+1, i*8+8), ' ') AS line
        |  FROM toks, unnest(range((len(tk) + 7) // 8)) AS r(i)),
        |freq AS (SELECT line FROM lines
        |         GROUP BY line HAVING count(DISTINCT doc_id) >= 10),
        |kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM freq))
        |SELECT doc_id, string_agg(line, ' ' ORDER BY lineno) AS text_clean,
        |  cast(count(*) as bigint) AS n_lines_kept
        |FROM kept GROUP BY doc_id""".stripMargin) { (s, dir) =>
      // fan out below the concat/split projections: the chunking pass ran
      // single-task above the one-row-group scan (r15 JobProbe: 0.75 s +
      // 0.51 s serial jobs; Layout.fanOut doc)
      val planted = graft.operators.Layout.fanOut(Tables.documents(s, dir))
        .select(col("doc_id"),
          concat(lit("boiler plate for "), col("source"),
            lit(" subscribe now thanks bye "), col("text")).as("t"))
      TextOps.removeFrequentLines(planted, "doc_id", "t", 8, 10L)
    },

    // Weighted cosine between source unigram distributions — q123's
    // set-Jaccard upgraded to frequency-weighted similarity (the corpus-
    // mixing / source-redundancy signal). The shuffle carries only the
    // (source, token) count table, never the corpus; the dot product is
    // an exact integer sum over the token-keyed self-join, norms are
    // per-source scalars that broadcast, and the only doubles are two
    // correctly-rounded sqrts and one divide. c·c sums stay under 2^63
    // to ~1e9-token vocabularies; past that, fold counts to a 2^31 cap
    // first (cosine is scale-invariant).
    QueryDef(
      "q154_source_cosine",
      """WITH t AS (SELECT source, unnest(
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok, cast(count(*) as bigint) AS c
        |      FROM t GROUP BY 1, 2),
        |nrm AS (SELECT source, cast(sum(c * c) as bigint) AS ss FROM c GROUP BY 1),
        |d AS (SELECT a.source AS src_a, b.source AS src_b,
        |             cast(sum(a.c * b.c) as bigint) AS dot
        |      FROM c a JOIN c b ON a.tok = b.tok AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, dot,
        |  cast(dot as double)
        |    / (sqrt(cast(na.ss as double)) * sqrt(cast(nb.ss as double))) AS cosine
        |FROM d
        |JOIN nrm na ON na.source = src_a
        |JOIN nrm nb ON nb.source = src_b""".stripMargin) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .select(col("source"), explode(ArrayOps.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nrm = c.groupBy("source").agg(sum(col("c") * col("c")).as("ss"))
      val d = c.select(col("source").as("src_a"), col("tok"), col("c").as("ca"))
        .join(c.select(col("source").as("src_b"), col("tok"), col("c").as("cb")),
          Seq("tok"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(sum(col("ca") * col("cb")).as("dot"))
      d.join(broadcast(nrm.select(col("source").as("src_a"), col("ss").as("na"))),
          Seq("src_a"))
        .join(broadcast(nrm.select(col("source").as("src_b"), col("ss").as("nb"))),
          Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("dot"),
          (col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
            .as("cosine"))
    }
  )
}
