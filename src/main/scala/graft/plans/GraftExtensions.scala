package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions wiring for the engine's custom expressions —
  * register with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`, after which
  * `md5bucket60(...)` is available from SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("md5bucket60"),
      new ExpressionInfo(classOf[Md5Bucket60].getName, "md5bucket60"),
      GraftExtensions.builder))
    e.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "fvec_dot"),
      exprs => FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("fvec_l2sq"),
      new ExpressionInfo(classOf[FloatVecL2Sq].getName, "fvec_l2sq"),
      exprs => FloatVecL2Sq(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("edit_dist_at_most"),
      new ExpressionInfo(classOf[EditDistAtMost].getName, "edit_dist_at_most"),
      exprs => EditDistAtMost(exprs(0), exprs(1),
        GraftExtensions.litInt(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("lsh_band_keys"),
      new ExpressionInfo(classOf[LshBandKeysExpr].getName, "lsh_band_keys"),
      exprs => LshBandKeysExpr(exprs(0),
        GraftExtensions.litInt(exprs(1)), GraftExtensions.litInt(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier("hll64_agg"),
      new ExpressionInfo(classOf[Hll64Agg].getName, "hll64_agg"),
      exprs => new Hll64Agg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("kmv_bottom_k"),
      new ExpressionInfo(classOf[KmvBottomK].getName, "kmv_bottom_k"),
      exprs => new KmvBottomK(exprs(0), GraftExtensions.litInt(exprs(1)))
        .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "bottom_k"),
      exprs => new BottomKAgg(exprs(0), GraftExtensions.litInt(exprs(1)))
        .toAggregateExpression()))
    // portable-SQL hash form → native kernel (semantics-preserving;
    // NOT added by register() so the equivalence specs keep comparing
    // genuinely distinct formulations)
    e.injectOptimizerRule(_ => RewriteToMd5Bucket60)
    // theta range join → binned equi-join; no-op unless
    // spark.graft.rangeJoin.binWidth is set positive
    e.injectOptimizerRule(_ => RewriteRangeJoinToBinned)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}

  /** Same implicit string casts as the Column builder. */
  val builder: Seq[Expression] => Expression = exprs =>
    Md5Bucket60(exprs.map(e => Cast(e, org.apache.spark.sql.types.StringType)))

  /** The k argument of the sketch aggregates must be a foldable int. */
  def litInt(e: Expression): Int = {
    require(e.foldable, s"k must be a literal, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Register on an already-running session (withExtensions only applies
    * to sessions built fresh with the extension config). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("md5bucket60", builder, "built-in")
    reg.createOrReplaceTempFunction("fvec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("fvec_l2sq",
      exprs => FloatVecL2Sq(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("hll64_agg",
      exprs => new Hll64Agg(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("kmv_bottom_k",
      exprs => new KmvBottomK(exprs(0), litInt(exprs(1)))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("bottom_k",
      exprs => new BottomKAgg(exprs(0), litInt(exprs(1)))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("edit_dist_at_most",
      exprs => EditDistAtMost(exprs(0), exprs(1), litInt(exprs(2))),
      "built-in")
    reg.createOrReplaceTempFunction("lsh_band_keys",
      exprs => LshBandKeysExpr(exprs(0), litInt(exprs(1)), litInt(exprs(2))),
      "built-in")
  }
}
