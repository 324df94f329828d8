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

  test("salt actually fans the hot key out across the salt range") {
    // the property q228 relies on at 100 TB: the hot key's rows must land
    // in (close to) saltFactor distinct reducer groups, shrinking the max
    // per-group row count by ~saltFactor — otherwise salting is a no-op
    // that still serializes one reducer. Distinct payloads hash to
    // distinct salts with overwhelming probability.
    val saltFactor = 16
    val big = (1 to 4000).map(i => (if (i % 10 < 9) 0L else i.toLong, i))
      .toDF("k", "payload")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)))
    val hot = salted.filter(col("k") === 0L)
      .groupBy("__salt").count().as[(Long, Long)].collect()
    assert(hot.length == saltFactor,
      s"hot key used only ${hot.length} of $saltFactor salts")
    val maxGroup = hot.map(_._2).max
    val hotRows = hot.map(_._2).sum
    assert(maxGroup <= hotRows / saltFactor * 2,
      s"skew not dispersed: max group $maxGroup of $hotRows hot rows")
  }

  test("min_by exact dedup equals window semantics") {
    val df = Seq((5L, "x"), (1L, "x"), (3L, "y")).toDF("id", "text")
    val out = Dedup.exactDedup(df, col("text"), col("id"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (3L, "y")))
  }
}
