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
}
