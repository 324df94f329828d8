package graft

import org.apache.spark.sql.functions._

import graft.operators.LinearAlgebra

/** gramInt8: the per-partition dense fold must equal a driver-side
  * brute-force Gram over identically quantized rows, on any partitioning. */
class LinearAlgebraSpec extends SparkSpec {

  private def quantize(v: Array[Float]): Array[Int] = {
    val m = v.map(x => math.abs(x.toDouble)).max
    if (m == 0) Array.fill(v.length)(0)
    else v.map(x => math.floor(x.toDouble * (127.0 / m)).toInt)
  }

  test("gram matrix equals brute force on the sf0.001 embeddings") {
    val df = Tables.embeddings(spark, sf0001)
    val rows = df.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dim = rows.head.length
    val expected = scala.collection.mutable.Map[(Int, Int), Long]()
    rows.map(quantize).foreach { q =>
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val k = (i + 1, j + 1)
          expected(k) = expected.getOrElse(k, 0L) + q(i).toLong * q(j)
          j += 1
        }
        i += 1
      }
    }
    for (parts <- Seq(1, 7)) {
      val got = LinearAlgebra.gramInt8(df.repartition(parts), "embedding", dim)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got.size == dim * (dim + 1) / 2, s"parts=$parts")
      assert(got == expected.toMap, s"parts=$parts")
    }
  }

  test("all-zero rows contribute nothing") {
    import spark.implicits._
    val df = Seq(Array(0f, 0f), Array(1f, -1f)).toDF("embedding")
    val got = LinearAlgebra.gramInt8(df, "embedding", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((1, 1) -> 16129L, (1, 2) -> -16129L, (2, 2) -> 16129L))
  }
}
