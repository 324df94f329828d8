package graft

import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer}
import org.apache.spark.sql.functions._

import graft.operators.Features

/** F3 interop: our broadcast-join label indexing matches spark.ml's
  * StringIndexer (frequencyDesc = count desc, ties alphabetical), and the
  * pipeline composes with spark.ml's OneHotEncoder.
  */
class SparkMlSpec extends SparkSpec {
  import spark.implicits._

  test("fitLabelIndex matches StringIndexer(frequencyDesc)") {
    val ev = Tables.events(spark, sf0001)
    val ours = Features.fitLabelIndex(ev, "event_type")
      .as[(String, Int)].collect().toMap
    val indexer = new StringIndexer()
      .setInputCol("event_type").setOutputCol("idx")
      .setStringOrderType("frequencyDesc")
      .fit(ev)
    val theirs = indexer.labelsArray(0).zipWithIndex.toMap
    assert(ours == theirs.map { case (k, v) => k -> v })
  }

  test("OneHotEncoder composes on the indexed column") {
    val ev = Tables.events(spark, sf0001)
    val indexed = new StringIndexer()
      .setInputCol("event_type").setOutputCol("idx")
      .fit(ev).transform(ev)
    val encoded = new OneHotEncoder()
      .setInputCols(Array("idx")).setOutputCols(Array("vec"))
      .fit(indexed).transform(indexed)
    val first = encoded.select("vec").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(first.size == 4) // 5 classes, dropLast default
    assert(encoded.count() == ev.count())
  }

  test("beamAccuracyN three-head hand-computed case") {
    // train: h1 p(a)=3/4 p(b)=1/4; h2 p(x)=1/2 p(y)=1/2; h3 p(u)=3/4 p(v)=1/4
    val train = Seq(
      ("a", "x", "u"), ("a", "y", "u"), ("a", "x", "v"), ("b", "y", "u"))
      .toDF("h1", "h2", "h3")
    // top-2 combos by probability product (ties by combo string):
    // a|x|u = 3/4*1/2*3/4 = 9/32 ; a|y|u = 9/32 ; others lower
    // tie-break: "a|x|u" < "a|y|u" — both kept at n=2
    val test = Seq(
      ("a", "x", "u"), // hit
      ("a", "y", "u"), // hit
      ("a", "x", "v"), // miss (p=3/32)
      ("b", "x", "u")) // miss
      .toDF("h1", "h2", "h3")
    val r = Features.beamAccuracyN(train, test, Seq("h1", "h2", "h3"), 2)
      .as[(Long, Long, Double)].head()
    assert(r == ((2L, 4L, 0.5)))
  }

  test("beamAccuracyN survives 5 heads with 10k-class dictionaries") {
    // Unpruned, this cartesian is 10^20 rows; per-head top-n caps it at n^5.
    val heads = (1 to 5).map(i => s"h$i")
    def classes(df: org.apache.spark.sql.DataFrame) = heads.foldLeft(df) {
      (d, h) => d.withColumn(h,
        concat(lit(h + "_"), pmod(xxhash64(col("id"), lit(h)), lit(10000))))
    }
    val train = classes(spark.range(50000).toDF("id"))
    val test = classes(spark.range(50000, 51000).toDF("id"))
    val r = Features.beamAccuracyN(train, test, heads, 3)
      .as[(Long, Long, Double)].head()
    assert(r._2 == 1000L) // completed a full test pass
  }
}
