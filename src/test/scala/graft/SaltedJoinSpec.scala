package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relational}

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key") {
    // 90% of the fact rows share one key — the pathological shape
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "v")
    val plain = big.join(small, "k").select("k", "payload", "v")
      .as[(Long, Int, String)].collect().toSet
    val salted = Relational.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "v").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("min_by exact dedup equals window semantics") {
    val df = Seq((5L, "x"), (1L, "x"), (3L, "y")).toDF("id", "text")
    val out = Dedup.exactDedup(df, col("text"), col("id"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (3L, "y")))
  }
}
