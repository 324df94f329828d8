package graft

import org.apache.spark.sql.functions._

/** Sink/scan breadth: the cleaned reaction table round-trips through
  * parquet, ORC, JSON, and CSV (scalars) without value loss. */
class FormatRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files
    .createTempDirectory("graft_fmt").toString

  private lazy val sample = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("lang"), col("n_chars"))
    .orderBy("doc_id").limit(50).cache()

  private def sameAsSample(df: org.apache.spark.sql.DataFrame): Boolean = {
    val a = sample.as[(Long, String, Long)].collect().toSet
    val b = df.select(col("doc_id").cast("long"), col("lang"),
      col("n_chars").cast("long")).as[(Long, String, Long)].collect().toSet
    a == b
  }

  test("parquet round trip") {
    sample.write.mode("overwrite").parquet(s"$tmp/p")
    assert(sameAsSample(spark.read.parquet(s"$tmp/p")))
  }

  test("orc round trip") {
    sample.write.mode("overwrite").orc(s"$tmp/o")
    assert(sameAsSample(spark.read.orc(s"$tmp/o")))
  }

  test("json round trip") {
    sample.write.mode("overwrite").json(s"$tmp/j")
    assert(sameAsSample(spark.read.json(s"$tmp/j")))
  }

  test("csv round trip (header + schema)") {
    sample.write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
    assert(sameAsSample(
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(s"$tmp/c")))
  }

  test("array-typed table round trips via parquet (the engine sink)") {
    val arr = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.functions.ArrayOps.tokens(col("text")).as("toks")).limit(20)
    arr.write.mode("overwrite").parquet(s"$tmp/a")
    val back = spark.read.parquet(s"$tmp/a")
    val a = arr.as[(Long, Seq[String])].collect().toMap
    val b = back.as[(Long, Seq[String])].collect().toMap
    assert(a == b)
  }
}
