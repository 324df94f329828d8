package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.extract._

/** Incremental (streaming) extract: the reference re-runs its whole joblib
  * loop when new ORD files arrive; our `binaryFile` file-stream source +
  * `Trigger.AvailableNow` processes each file exactly once, checkpointed.
  * Verified against the batch path on the reference's own corpus.
  */
class IncrementalExtractSpec extends SparkSpec {

  private val ordDir = "/root/reference/orderly/data/test_data/ord_test_data"
  private val solvents = Seq("O", "CO", "CCO", "C1CCOC1", "ClCCl")

  private def copyIn(dst: java.io.File, names: String*): Unit =
    names.foreach { n =>
      val src = Files.walk(Paths.get(ordDir)).filter(_.toString.endsWith(s"$n.pb.gz"))
        .findFirst().get()
      Files.copy(src, Paths.get(dst.toString, src.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }

  test("AvailableNow drains the backlog; a re-run extracts only new files") {
    val root = Files.createTempDirectory("graft_inc_").toFile
    val in = new java.io.File(root, "in"); in.mkdirs()
    val out = new java.io.File(root, "out").toString
    val ckpt = new java.io.File(root, "ckpt").toString

    val f1 = "ord_dataset-85c00026681b46f89ef8634d2b8618c3"
    val f2 = "ord_dataset-a0eff6fe4b4143f284f0fc5ac503acad"
    val f3 = "ord_dataset-0b70410902ae4139bd5d334881938f69"

    def run(): Unit = OrdSource.incrementalExtract(
      spark, in.toString, out, ckpt, ExtractConfig(), IdentityChemistry, solvents)
    def batchCount(files: String*): Long =
      Extract.extractReactions(
        OrdSource.readNested(spark, in.toString), ExtractConfig(),
        IdentityChemistry, solvents).count()

    copyIn(in, f1, f2)
    run()
    val afterFirst = spark.read.parquet(out)
    val firstCount = afterFirst.count()
    assert(firstCount == batchCount(f1, f2),
      "first drain must equal the batch extract over the same files")
    assert(afterFirst.select("extracted_from_file").distinct().count() == 2)

    copyIn(in, f3)
    run()
    val afterSecond = spark.read.parquet(out)
    assert(afterSecond.count() == batchCount(f1, f2, f3),
      "second drain must append exactly the new file's reactions")
    assert(afterSecond.select("extracted_from_file").distinct().count() == 3)
    // exactly-once: the first two files were NOT re-extracted
    val perFile = afterSecond.groupBy("extracted_from_file").count()
    val batchPerFile = Extract.extractReactions(
      OrdSource.readNested(spark, in.toString), ExtractConfig(),
      IdentityChemistry, solvents)
      .groupBy("extracted_from_file").count()
    val got = perFile.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = batchPerFile.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
