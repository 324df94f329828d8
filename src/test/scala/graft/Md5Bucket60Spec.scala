package graft

import org.apache.spark.sql.functions._

import graft.functions.XHash

/** The native [[graft.plans.Md5Bucket60]] expression must be bit-identical
  * to the composed built-ins formulation the DuckDB oracle evaluates —
  * across the interpreted path, whole-stage codegen, lambda contexts, and
  * the driver-side constant evaluator.
  */
class Md5Bucket60Spec extends SparkSpec {
  import spark.implicits._

  test("native == reference formulation over real data (codegen path)") {
    val d = Tables.documents(spark, sf0001)
    val diff = d.select(
      XHash.bucketHash("s1", col("text"), col("lang")).as("a"),
      ReferenceKernels.bucketHashReference("s1", col("text"), col("lang")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("native matches inside higher-order-function lambdas") {
    val df = Seq(Tuple1(Seq("x", "yy", "zzz"))).toDF("l")
    val a = df.select(transform(col("l"), x => XHash.bucketHash("s", x)).as("h"))
      .as[Seq[Long]].collect()(0)
    val b = df.select(transform(col("l"), x => ReferenceKernels.bucketHashReference("s", x)).as("h"))
      .as[Seq[Long]].collect()(0)
    assert(a == b)
  }

  test("null parts are skipped like concat_ws") {
    val df = Seq(("a", Option.empty[String], "c")).toDF("x", "y", "z")
    val a = df.select(XHash.bucketHash("s", col("x"), col("y"), col("z")))
      .as[Long].collect()(0)
    val b = df.select(ReferenceKernels.bucketHashReference("s", col("x"), col("y"), col("z")))
      .as[Long].collect()(0)
    assert(a == b)
  }

  test("SQL registration (extension function is callable from SQL text)") {
    graft.plans.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT md5bucket60('seed', 'k1', 7) AS h")
      .collect()(0).getLong(0)
    assert(viaSql == XHash.bucketHashJvm("seed", "k1", "7"))
  }

  test("driver-side constant evaluator agrees") {
    val df = Seq(("k1", "k2")).toDF("x", "y")
    val sql = df.select(XHash.bucketHash("seed", col("x"), col("y")))
      .as[Long].collect()(0)
    assert(sql == XHash.bucketHashJvm("seed", "k1", "k2"))
  }

  test("optimizer rule rewrites the portable formulation to the native kernel") {
    // scoped to this test: globally active it would turn the equivalence
    // tests above into native-vs-native comparisons
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.RewriteToMd5Bucket60
    try {
      val df = Tables.documents(spark, sf0001)
        .select(col("doc_id"),
          ReferenceKernels.bucketHashReference("s1", col("text"), col("lang"))
            .as("h"))
      val rewritten = df.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.Md5Bucket60]))
      assert(rewritten, df.queryExecution.optimizedPlan.toString)
      // and the rewritten plan's values equal the kernel's directly
      val viaRule = df.as[(Long, Long)].collect().toMap
      val native = Tables.documents(spark, sf0001)
        .select(col("doc_id"),
          XHash.bucketHash("s1", col("text"), col("lang")).as("h"))
        .as[(Long, Long)].collect().toMap
      assert(viaRule == native)
      // a near-miss (different substring length) must NOT rewrite
      val miss = Tables.documents(spark, sf0001).select(
        conv(substring(md5(concat_ws("", lit("s1"), col("text"))), 1, 14),
          16, 10).cast("long").as("h"))
      assert(!miss.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.Md5Bucket60])))
    } finally spark.experimental.extraOptimizations = prev
  }
}
