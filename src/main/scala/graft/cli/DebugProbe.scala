package graft.cli

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.Tables
import graft.functions.ArrayOps
import graft.operators.Dedup

/** Scratch stage-timing probe for the minhash pair pipeline (dev tool). */
object DebugProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // JIT warm-up: run the whole pipeline once, then measure
    Dedup.minhashLshPairs(
      Tables.documents(spark, dir)
        .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
        .withColumn("sh", Dedup.wordShingles(col("toks"), 3)),
      "doc_id", "sh").count()

    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), ArrayOps.tokens(col("text")).as("toks"))
    val m = t.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(array(lit("zzz")),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0)))).as("toks"))
    val corpus = t.unionByName(m)
      .withColumn("sh", Dedup.wordShingles(col("toks"), 3))

    val sh = corpus.select(col("doc_id").as("id"), col("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle materialize")(sh.count())
    val sig = sh.select(col("id"), Dedup.minhashSig(col("sh"), 16).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures")(sig.count())
    val bands = sig.select(col("id"),
      explode(Dedup.bandKeys(col("sig"), 4, 4)).as("__bk"))
    val cand = bands.select(col("id").as("a_id"), col("__bk"))
      .join(bands.select(col("id").as("b_id"), col("__bk")), Seq("__bk"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").dropDuplicates("a_id", "b_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("band join + distinct")(println("[probe] cand=" + cand.count()))
    val verified = cand
      .join(sh.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("n_common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("n_union", size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("n_common").cast("double") / col("n_union") >= 0.5)
    time("verify joins")(verified.count())
    spark.stop()
  }
}
