package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a larger scale factor from an existing driver test-data
  * directory by unioning `factor` key-remapped replicas of each table —
  * the empirical scale ladder (VERDICT r8 item 2): run the registry bench
  * against the output and any super-linear candidate-generation term
  * shows up as a per-query scaling ratio well above the row ratio.
  *
  * Key columns shift by replica·10^9 so referential integrity holds
  * within each replica and joins fan out linearly. Replicas > 0 perturb
  * document text (a replica token appended, n_chars kept consistent) and
  * embedding contents (one coordinate nudged) — otherwise every doc/vec
  * would gain `factor` EXACT copies and pair-generating dedup operators
  * would measure a planted quadratic in duplicate-group size rather than
  * their real scaling. Dimension tables (region/nation) stay fixed, as
  * they would at any real scale.
  *
  * Usage: ScaleUp <srcDir> <outDir> <factor>
  */
object ScaleUp {

  private val Stride = 1000000000L

  private def shifted(df: DataFrame, keys: Seq[String], i: Int): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Stride)))

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.coalesce(8).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed dims: copy once
    Seq("region", "nation").foreach(t => write(read(t), t))

    val plainKeys: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"))
    plainKeys.foreach { case (t, keys) =>
      val base = read(t)
      val u = (0 until factor).map(i => shifted(base, keys, i))
        .reduce(_ unionAll _)
      write(u, t)
    }

    locally {
      val d = read("documents")
      val u = (0 until factor).map { i =>
        val s = shifted(d, Seq("doc_id"), i)
        if (i == 0) s
        else s
          .withColumn("text", concat(col("text"), lit(s" r$i")))
          .withColumn("n_chars", col("n_chars") + lit(s" r$i".length))
      }.reduce(_ unionAll _)
      write(u, "documents")
    }

    locally {
      val e = read("embeddings")
      val u = (0 until factor).map { i =>
        val s = shifted(e, Seq("vec_id"), i)
        if (i == 0) s
        else s.withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> " +
            s"IF(j = 0, cast(x + ${i * 0.003} as float), x))"))
      }.reduce(_ unionAll _)
      write(u, "embeddings")
    }

    println(s"[scaleup] wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
