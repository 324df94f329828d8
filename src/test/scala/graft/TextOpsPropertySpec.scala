package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Property-style stress tests for the corpus text operators, on batches of
  * RANDOM documents (one Spark job per property, all cases in one frame).
  *
  *  - winnowing: the paper's local-selection guarantee — two documents
  *    sharing any token run of length ≥ w+k−1 share a fingerprint — plus
  *    fingerprints ⊆ gram hashes;
  *  - subword encode: pieces reassemble the token exactly whenever no
  *    `<unk>` fired, every piece is a vocab entry, and a token containing
  *    an uncovered character collapses to exactly [<unk>];
  *  - duplicate spans: a planted shared run is covered by a reported span
  *    in both documents, and an all-unique corpus reports nothing.
  */
class TextOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260813L)

  private def word(r: Random): String =
    (0 until (3 + r.nextInt(5))).map(_ => ('a' + r.nextInt(26)).toChar).mkString

  test("winnow: shared (w+k-1)-run implies a shared fingerprint (200 random pairs)") {
    val (k, w) = (3, 4)
    val runLen = w + k - 1
    val cases = (0 until 200).map { c =>
      // distinct-token pools so the shared run is the ONLY overlap
      val shared = (0 until runLen).map(i => s"sh${c}_$i")
      val pad1 = (0 until rnd.nextInt(20)).map(i => s"a${c}_$i")
      val pad2 = (0 until rnd.nextInt(20)).map(i => s"b${c}_$i")
      val pad3 = (0 until rnd.nextInt(20)).map(i => s"c${c}_$i")
      (c.toLong, pad1 ++ shared ++ pad2, pad3 ++ shared)
    }
    val df = cases.map { case (id, d1, d2) => (id, d1, d2) }
      .toDF("id", "d1", "d2")
      .select(col("id"),
        TextOps.winnow(col("d1"), k, w).as("f1"),
        TextOps.winnow(col("d2"), k, w).as("f2"),
        size(array_intersect(col("f1"), col("f2"))).as("shared"))
    val bad = df.filter(col("shared") < 1).count()
    assert(bad == 0, s"$bad of 200 shared runs produced no shared fingerprint")
  }

  test("subwordEncode: reassembly, vocab membership, unk coverage (300 random tokens)") {
    // vocab: letters a-m + random merges over that alphabet; n-z uncovered
    val merges = (0 until 12).map { _ =>
      (0 until (2 + rnd.nextInt(3))).map(_ => ('a' + rnd.nextInt(13)).toChar).mkString
    }
    val vocab = ('a' to 'm').map(_.toString) ++ merges
    val vocabSet = vocab.toSet
    val toks = (0 until 300).map { i =>
      if (i % 3 == 0) // guaranteed-covered token
        (0 until (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(13)).toChar).mkString
      else // may contain uncovered chars
        (0 until (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val out = toks.toDF("tok")
      .select(col("tok"), TextOps.subwordEncode(col("tok"), vocab).as("p"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (tok, pieces) =>
      val covered = tok.forall(c => c >= 'a' && c <= 'm')
      if (covered) {
        assert(pieces.mkString == tok, s"'$tok' reassembled as '${pieces.mkString}'")
        assert(pieces.forall(vocabSet), s"'$tok' produced non-vocab piece in $pieces")
      } else assert(pieces == Seq("<unk>"), s"uncovered '$tok' gave $pieces")
    }
  }

  test("duplicateSpans: planted runs covered in both docs; unique corpus silent (100 cases)") {
    val n = 8
    val runLen = n + rnd.nextInt(8) // ≥ n tokens so a gram fits
    val cases = (0 until 100).flatMap { c =>
      val shared = (0 until runLen).map(i => s"sh${c}_$i")
      val pre1 = rnd.nextInt(10)
      val d1 = (0 until pre1).map(i => s"a${c}_$i") ++ shared ++
        (0 until rnd.nextInt(10)).map(i => s"z${c}_$i")
      val pre2 = rnd.nextInt(10)
      val d2 = (0 until pre2).map(i => s"b${c}_$i") ++ shared
      // planted gram block: starts pre+1 .. pre+runLen-n+1, covers tokens
      // pre+1 .. pre+runLen
      Seq((c * 2L, d1, pre1 + 1L, pre1 + runLen.toLong),
        (c * 2L + 1, d2, pre2 + 1L, pre2 + runLen.toLong))
    }
    val docs = cases.map { case (id, toks, _, _) => (id, toks) }.toDF("id", "toks")
    val spans = TextOps.duplicateSpans(docs, "id", col("toks"), n)
      .select("id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    cases.foreach { case (id, _, lo, hi) =>
      val covering = spans.getOrElse(id, Array.empty)
        .exists { case (_, s, e) => s <= lo && e >= hi }
      assert(covering, s"doc $id: planted run [$lo,$hi] not covered by ${spans.get(id)}")
    }
    // all-unique corpus: nothing reported
    val unique = (0 until 50).map(i =>
      (i.toLong, (0 until 30).map(j => s"u${i}_$j"))).toDF("id", "toks")
    assert(TextOps.duplicateSpans(unique, "id", col("toks"), n).count() == 0)
  }

  test("repetitionSignals: sorted-run fold equals brute-force max bigram multiplicity (300 random docs)") {
    // small alphabet forces heavy repetition, so runs genuinely merge
    val cases = (0 until 300).map { c =>
      val vocab = (0 until (1 + rnd.nextInt(5))).map(i => s"w$i")
      val toks = (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
      (c.toLong, toks)
    }
    val got = cases.toDF("id", "toks")
      .select(col("id"), TextOps.repetitionSignals(col("toks")).as("s"))
      .select(col("id"), col("s.n_tokens"), col("s.top_bigram_n"),
        col("s.n_bigrams"), col("s.dup_token_frac"))
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    cases.foreach { case (id, toks) =>
      val bigrams = toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity).values.map(_.size).max.toLong
      val (nt, tb, nb, df) = got(id)
      assert(nt == toks.size.toLong, s"doc $id n_tokens")
      assert(tb == top, s"doc $id: fold said $tb, brute force $top")
      assert(nb == bigrams.size.toLong, s"doc $id n_bigrams")
      if (toks.isEmpty) assert(df.isEmpty, s"doc $id dup_frac should be null")
      else assert(df.contains(
        (toks.size - toks.distinct.size).toDouble / toks.size),
        s"doc $id dup_frac")
    }
  }
}
