package graft.cli

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators._

/** Scale benchmark against BASELINE.md's headline number: the reference's
  * clean stage takes ~19 min at USPTO scale (~1.2M–3.7M reactions), ~15 min
  * of it in split-leakage hashing (clean/cleaner.py:885).
  *
  * We replicate that scale by unioning the golden extracted corpus N times
  * (deterministic per-copy yield epsilon keeps rows distinct through dedup
  * while leaving molecule frequency distributions — and therefore the
  * rare-molecule path — unchanged), then run the full clean + leakage-aware
  * split and report wall time.
  *
  * Usage: sbt "runMain graft.cli.ScaleBench [copies]"  (default 200 ≈ 3.0M rows)
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(200)
    val spark = GraftSession.local()
    val goldenDir =
      "/root/reference/orderly/data/test_data/extracted_ord_test_data_dont_trust_labelling/extracted_ords"

    val base = ReactionTable.load(spark, goldenDir)
      .localCheckpoint() // materialize the (small) base once

    import spark.implicits._
    val copyIdx = spark.range(copies).toDF("copy")
    val big = base.crossJoin(copyIdx)
      .withColumn("original_index",
        col("original_index") * copies + col("copy"))
      .withColumn("yields",
        transform(col("yields"), y => y + col("copy") * lit(1e-7)))
      .drop("copy")
      .repartition(64)
      .localCheckpoint() // build cost excluded from the clean timing

    val n = big.count()
    println(s"[scale] input rows: $n")

    // Extract throughput over the raw ORD corpus (12 .pb.gz files; the
    // reference calls its per-file extraction "pretty slow",
    // extract/main.py:36-38).
    val te = System.nanoTime()
    val extracted = graft.extract.Extract.extractReactions(
      graft.extract.OrdSource.readNested(spark,
        "/root/reference/orderly/data/test_data/ord_test_data"),
      graft.extract.ExtractConfig(), graft.extract.IdentityChemistry,
      Seq("O", "CO", "CCO")).count()
    println(f"[scale] extract: $extracted reactions from raw protobuf in " +
      f"${(System.nanoTime() - te) / 1e9}%.1f s")

    val cfg = CleanConfig(
      numReactant = 2, numProduct = 1, numAgent = 3, numCat = 0, numReag = 0,
      numSolv = 2, consistentYield = false, minFrequencyOfOccurrence = 100,
      mapRareMoleculesToOther = false, scramble = true, trainSize = 0.9)

    val t0 = System.nanoTime()
    val cleaned = Cleaner.clean(big, cfg)
    val (train, test) = Cleaner.splitWithLeakageMove(cleaned, cfg)
    val (nTrain, nTest) = (train.count(), test.count())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[scale] clean+split over $n rows: $secs%.1f s " +
      f"(train=$nTrain test=$nTest) — reference: ~19 min at this scale")
    spark.stop()
  }
}
