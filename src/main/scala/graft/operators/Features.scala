package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F3/F6 — the ML-boundary feature/metric operators
  * (condition_prediction/utils.py), re-expressed as DataFrame aggregations.
  */
object Features {

  /** F3 — fit-on-train label indexing with unseen→"other"/overflow class
    * (utils.py:27-71 OneHotEncoder semantics; spark.ml's StringIndexer
    * frequencyDesc order = count desc, ties alphabetical). Returns the
    * label→index dimension table to broadcast-join against any split.
    */
  def fitLabelIndex(train: DataFrame, c: String): DataFrame =
    train.groupBy(c).agg(count(lit(1)).as("__cnt"))
      .withColumn("label_index",
        row_number().over(Window.orderBy(col("__cnt").desc, col(c).asc)) - 1)
      .select(col(c).as("label"), col("label_index"))

  /** Encode a column against a fitted index; unseen labels get index
    * `numClasses` (the handleInvalid="keep" overflow slot). */
  def encodeLabel(df: DataFrame, c: String, index: DataFrame): DataFrame = {
    val n = index.count()
    df.join(broadcast(index), df(c) === index("label"), "left")
      .withColumn(s"${c}_idx",
        coalesce(col("label_index"), lit(n)).cast("int"))
      .drop("label", "label_index")
  }

  /** One-hot vector from an index (dense 0/1 array — parquet-friendly). */
  /** Deterministic hash-based negative sampling — the contrastive/recsys
    * training primitive: for every user, draw `k` pseudo-random item ids
    * that the user has NO positive interaction with. Draws come from the
    * engine's cross-engine md5 hash ([[graft.functions.XHash.bucketHash]])
    * of (user, draw-index), so the sample is reproducible across engines,
    * runs, and cluster sizes — `rand()` negatives are none of those.
    *
    * `numItems` is a one-row frame (column `__np`) so the item-id domain
    * [0, __np) is derived at runtime and broadcast, never hard-coded.
    * Overdrawing `k*overdraw` candidates absorbs collisions with the
    * user's positives and duplicate draws; per-user survivors are ranked
    * by draw index and trimmed to `k`.
    *
    * Scale shape: candidates are |users|·k·overdraw rows built map-side;
    * one left_anti hash join against the positives (shuffles candidates +
    * positives once on (user, item)); the two windows partition by user —
    * group size is bounded by k·overdraw, so no skew. Users whose
    * positives swallow too many draws return fewer than k rows (raise
    * `overdraw` if the item catalog is small relative to positives). */
  def negativeSamples(users: DataFrame, userCol: String,
      positives: DataFrame, puCol: String, piCol: String,
      numItems: DataFrame, k: Int, overdraw: Int = 2,
      seed: String = "negsamp"): DataFrame = {
    val cands = users.select(col(userCol)).distinct()
      .crossJoin(broadcast(numItems))
      .select(col(userCol), explode(sequence(lit(0), lit(k * overdraw - 1))).as("draw"),
        col("__np"))
      .withColumn("neg_item",
        pmod(graft.functions.XHash.bucketHash(seed,
          col(userCol).cast("string"), col("draw").cast("string")), col("__np")))
      .drop("__np")
    val neg = cands.join(
      positives.select(col(puCol).as(userCol), col(piCol).as("neg_item")).distinct(),
      Seq(userCol, "neg_item"), "left_anti")
    val wDedup = Window.partitionBy(col(userCol), col("neg_item")).orderBy("draw")
    val wRank = Window.partitionBy(col(userCol)).orderBy("draw")
    neg.withColumn("__rd", row_number().over(wDedup)).filter(col("__rd") === 1)
      .withColumn("__rk", row_number().over(wRank)).filter(col("__rk") <= k)
      .select(col(userCol), col("neg_item"), col("draw"))
  }

  def oneHot(idx: Column, numClasses: Int): Column =
    transform(sequence(lit(0), lit(numClasses)),
      i => when(i === idx, 1).otherwise(0))

  /** F6 — top-n beam combination accuracy over two heads (utils.py:106-208
    * shape, 2-head instance): per-head class probabilities from train
    * frequencies, candidate combos scored by probability product, top-n
    * kept (ties broken by combo string), a test row hits iff its true
    * combo is among them. Returns a 1-row (matched, total, acc) frame.
    */
  def beamAccuracy2(train: DataFrame, test: DataFrame,
      h1: String, h2: String, n: Int): DataFrame =
    beamAccuracyN(train, test, Seq(h1, h2), n)

  /** F6, general form — the reference's full five-head cascade shape
    * (solvent1, solvent2, agent1-3; utils.py:106-208): per-head class
    * probabilities from train frequencies, the cartesian candidate space
    * scored by probability product, top-n kept (ties broken by combo
    * string), a test row hits iff its true combo is among them.
    *
    * Scale shape: each head is pruned to its top-n classes FIRST (like the
    * reference, utils.py:117-130), so the candidate cartesian is at most
    * n^k rows regardless of dictionary size — the product score is monotone
    * per head, so a combo in the global top-n can only be built from
    * per-head top-n classes. Then top-n combos are taken BEFORE touching
    * the test split, which does one broadcast-join pass.
    *
    * Tie caveat: the per-head cut breaks probability ties by class value
    * while the global cut breaks score ties by the '|'-joined combo string;
    * for variable-length labels those orders can disagree at the per-head
    * boundary, so a combo built from a tied-out class could in principle
    * belong to the exact unpruned top-n. The reference prunes per-head the
    * same way, so this matches its semantics exactly.
    */
  def beamAccuracyN(train: DataFrame, test: DataFrame,
      heads: Seq[String], n: Int): DataFrame = {
    require(heads.nonEmpty)
    val total = train.count().toDouble // one driver action, reused per head
    def probs(c: String) =
      train.groupBy(c).agg((count(lit(1)) / total).as(s"p_$c"))
        .orderBy(col(s"p_$c").desc, col(c).asc) // deterministic tie-break
        .limit(n) // TakeOrderedAndProject over a dictionary-sized table
    val combos = heads.map(probs).reduce(_.crossJoin(_))
      .withColumn("score", heads.map(c => col(s"p_$c")).reduce(_ * _))
      .withColumn("combo", concat_ws("|", heads.map(col): _*))
      .orderBy(col("score").desc, col("combo").asc)
      .limit(n)
      .select(col("combo"), lit(1).as("__hit"))
    // single pass over test: broadcast left join + conditional count
    test.withColumn("combo", concat_ws("|", heads.map(col): _*))
      .join(broadcast(combos), Seq("combo"), "left")
      .agg(count(when(col("__hit").isNotNull, 1)).as("matched"),
        count(lit(1)).as("total"))
      .select(col("matched"), col("total"),
        (col("matched").cast("double") / col("total")).as("acc"))
  }
}
