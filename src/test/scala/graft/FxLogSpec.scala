package graft

import org.apache.spark.sql.functions._

import graft.functions.FxLog
import graft.plans.FxLog2

/** Fixed-point log2 kernel contract: exact on powers of two, monotone,
  * within table-granularity accuracy of true log2, and the codegen'd
  * column path agrees with the static kernel. */
class FxLogSpec extends SparkSpec {

  test("exact on powers of two") {
    for (k <- 0 to 62)
      assert(FxLog2.log2fx(1L << k) === k.toLong * 65536L, s"2^$k")
  }

  test("monotone non-decreasing and close to true log2") {
    var prev = Long.MinValue
    for (n <- 1L to 5000L) {
      val v = FxLog2.log2fx(n)
      assert(v >= prev, s"monotonicity broke at $n")
      prev = v
      val err = math.abs(v / 65536.0 - math.log(n.toDouble) / math.log(2.0))
      assert(err < 1e-4, s"n=$n err=$err")
    }
    // large-magnitude spot checks (mantissa truncation path)
    for (n <- Seq(123456789012345L, Long.MaxValue)) {
      val err = math.abs(
        FxLog2.log2fx(n) / 65536.0 - math.log(n.toDouble) / math.log(2.0))
      assert(err < 1e-4, s"n=$n err=$err")
    }
  }

  test("exp2fx: exact on integer exponents, monotone, inverts log2fx") {
    import graft.plans.FxExp2
    for (k <- 0 to 45)
      assert(FxExp2.exp2fx(k.toLong * 65536L) === (65536L << k), s"2^$k")
    var prev = Long.MinValue
    for (x <- 0L until 200000L) {
      val v = FxExp2.exp2fx(x)
      assert(v >= prev, s"monotonicity broke at $x")
      prev = v
      val rel = math.abs(v / 65536.0 - math.pow(2.0, x / 65536.0)) /
        math.pow(2.0, x / 65536.0)
      assert(rel < 1e-4, s"x=$x rel=$rel")
    }
    // roundtrip: exp2fx(log2fx(n)) returns to n (scaled 2^16) within the
    // composed table error
    for (n <- Seq(1L, 7L, 100L, 12345L, 99999937L)) {
      val rt = FxExp2.exp2fx(FxLog2.log2fx(n)) / 65536.0
      assert(math.abs(rt - n) / n < 1e-4, s"roundtrip n=$n got $rt")
    }
  }

  test("exp2fx column path: domain guard nulls, kernel parity") {
    import spark.implicits._
    import graft.plans.FxExp2
    val rows = Seq[java.lang.Long](0L, 65536L, 1234567L, 3014655L,
      3014656L, -1L, null).toDF("x")
      .select(col("x"), FxLog.exp2fx(col("x")).as("v"))
      .collect()
    rows.foreach { r =>
      val x = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      if (x == null || x < 0L || x >= FxExp2.MAX_X)
        assert(r.isNullAt(1), s"x=$x")
      else assert(r.getLong(1) === FxExp2.exp2fx(x), s"x=$x")
    }
  }

  test("column path matches static kernel; null and non-positive -> null") {
    import spark.implicits._
    val rows = Seq[java.lang.Long](1L, 2L, 3L, 1023L, 1024L, 999999937L,
      0L, -5L, null).toDF("n")
      .select(col("n"), FxLog.log2fx(col("n")).as("lg"))
      .collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      if (n == null || n <= 0L) assert(r.isNullAt(1), s"n=$n")
      else assert(r.getLong(1) === FxLog2.log2fx(n), s"n=$n")
    }
  }

  test("non-integral child is an analysis error, not a runtime failure") {
    import spark.implicits._
    val df = Seq("abc").toDF("s")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(FxLog.log2fx(col("s"))).collect()
    }
    assert(e1.getMessage.contains("log2fx"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(FxLog.exp2fx(col("s"))).collect()
    }
    assert(e2.getMessage.contains("exp2fx"), e2.getMessage)
  }

  test("expression survives whole-stage codegen (no fallback)") {
    val df = spark.range(1, 1000)
      .select(FxLog.log2fx(col("id")).as("lg"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [log2fx"), p)
    assert(df.agg(sum("lg")).head().getLong(0) > 0L)
  }
}
