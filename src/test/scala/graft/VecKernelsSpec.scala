package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The native vector-fold kernels must be BIT-identical to the composed
  * built-ins formulation (which the DuckDB oracle mirrors), including null
  * semantics: null array, length mismatch, and null element all yield null.
  */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf001)
    .select(col("vec_id"), col("embedding"))

  test("dot kernel is bit-identical to the built-ins fold on real embeddings") {
    val a = vecs.select(col("vec_id"), col("embedding").as("va"))
    val b = vecs.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("vb"))
    val joined = a.join(b, "vec_id")
    val diff = joined.select(
      Similarity.dot(col("va"), col("vb")).as("native"),
      ReferenceKernels.dotReference(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed") ||
        col("native").isNull =!= col("composed").isNull)
    assert(diff.count() == 0)
  }

  test("l2sq kernel is bit-identical to the built-ins fold") {
    val a = vecs.select(col("vec_id"), col("embedding").as("va"))
    val b = vecs.select((col("vec_id") - 7).as("vec_id"), col("embedding").as("vb"))
    val joined = a.join(b, "vec_id")
    val diff = joined.select(
      Similarity.l2sq(col("va"), col("vb")).as("native"),
      ReferenceKernels.l2sqReference(col("va"), col("vb")).as("composed"))
      .filter(col("native") =!= col("composed") ||
        col("native").isNull =!= col("composed").isNull)
    assert(diff.count() == 0)
  }

  test("null semantics: null array, length mismatch, null element") {
    val df = Seq(
      (1, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (2, Seq(1.0f), Seq(3.0f, 4.0f)), // length mismatch
      (3, null, Seq(1.0f, 2.0f)) // null side
    ).toDF("id", "a", "b")
      .union(Seq((4, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
        .withColumn("b", array(lit(1.0f), lit(null).cast("float")))) // null element
    val out = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      ReferenceKernels.dotReference(col("a"), col("b")).as("composed"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    out.foreach { case (id, n, c) => assert(n == c, s"id=$id native=$n composed=$c") }
    assert(out.find(_._1 == 1).get._2 == 11.0)
    assert(out.find(_._1 == 2).get._2 == null)
    assert(out.find(_._1 == 3).get._2 == null)
  }

  test("minhash kernel is bit-identical to the composed form on real shingles") {
    import graft.functions.ArrayOps
    import graft.operators.Dedup
    val sh = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        Dedup.wordShingles(ArrayOps.tokens(col("text")), 3).as("sh"))
    val diff = sh.select(
      Dedup.minhashSig(col("sh"), 16).as("native"),
      ReferenceKernels.minhashSigReference(col("sh"), 16).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
    // empty + null-element edges
    val edge = Seq(Tuple1(Seq.empty[String]), Tuple1(Seq("a", null)))
      .toDF("sh")
    val out = edge.select(
      Dedup.minhashSig(col("sh"), 4).as("n"),
      ReferenceKernels.minhashSigReference(col("sh"), 4).as("c"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (n, c) => assert(n == c) }
  }

  test("shingle kernel is bit-identical to the composed form") {
    import graft.functions.ArrayOps
    import graft.operators.Dedup
    val toks = Tables.documents(spark, sf001)
      .select(ArrayOps.tokens(col("text")).as("toks"))
    for (n <- Seq(3, 8)) {
      val diff = toks.select(
        Dedup.wordShingles(col("toks"), n).as("native"),
        ReferenceKernels.wordShinglesReference(col("toks"), n).as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(diff.count() == 0, s"n=$n")
    }
    // short-doc fallback + null-token skip + NULL array (must give [null]
    // like the composed form, not a null result)
    val edge = Seq(
      Tuple1(Seq("a", "b")), // shorter than n
      Tuple1(Seq.empty[String]),
      Tuple1(null.asInstanceOf[Seq[String]]),
      Tuple1(Seq("a", null, "c", "d"))).toDF("toks")
    val out = edge.select(
      Dedup.wordShingles(col("toks"), 3).as("n"),
      ReferenceKernels.wordShinglesReference(col("toks"), 3).as("c"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (n, c) => assert(n == c, s"native=$n composed=$c") }
  }

  test("winnow kernel is bit-identical to the composed form") {
    import graft.functions.ArrayOps
    import graft.operators.TextOps
    val toks = Tables.documents(spark, sf001)
      .select(ArrayOps.tokens(col("text")).as("toks"))
    for ((k, w) <- Seq((3, 4), (2, 8), (5, 2))) {
      val diff = toks.select(
        TextOps.winnow(col("toks"), k, w).as("native"),
        ReferenceKernels.winnowReference(col("toks"), k, w).as("composed"))
        .filter(col("native") =!= col("composed"))
      assert(diff.count() == 0, s"k=$k w=$w")
    }
    // short docs (≤ w grams → global min; < k tokens → empty), null array,
    // null-token skip in the gram join
    val edge = Seq(
      Tuple1(Seq("a", "b")),
      Tuple1(Seq("a", "b", "c", "d")),
      Tuple1(Seq.empty[String]),
      Tuple1(null.asInstanceOf[Seq[String]]),
      Tuple1(Seq("a", null, "c", "d", "e", "f", "g", "h", "i"))).toDF("toks")
    val out = edge.select(
      TextOps.winnow(col("toks"), 3, 4).as("n"),
      ReferenceKernels.winnowReference(col("toks"), 3, 4).as("c"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (n, c) => assert(n == c, s"native=$n composed=$c") }
  }

  test("connected components: empty pair set and chain graph") {
    import graft.operators.Dedup
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(empty).count() == 0)
    // a 5-node chain + an isolated pair: min label must propagate end-to-end
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
  }

  test("connected components: reliable checkpoint path (spark.graft.cc.checkpointDir)") {
    import graft.operators.Dedup
    // off-box clusters set this to HDFS/S3 for fault-tolerant lineage
    // truncation; localCheckpoint blocks die with their executor
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      .toString
    spark.conf.set("spark.graft.cc.checkpointDir", dir)
    try {
      val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
        .toDF("a_id", "b_id")
      val got = Dedup.connectedComponents(chain)
        .as[(Long, Long)].collect().toMap
      assert((1L to 5L).forall(got(_) == 1L))
      assert(got(10L) == 10L && got(11L) == 10L)
      // the reliable path really engaged: checkpoint data landed on disk
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "no reliable checkpoint files written")
      // superseded loop checkpoints were pruned: only the edges frame and
      // the final labels frame may remain (Spark never cleans reliable
      // checkpoint data on its own)
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isDirectory(p)
          && p.getFileName.toString.startsWith("rdd-")).count()
      assert(rddDirs <= 3, s"loop checkpoints leaked: $rddDirs rdd-* dirs")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }

  test("kernels are SQL-callable after extension registration") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT fvec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                array(cast(3.0 as float), cast(4.0 as float))) AS d,
        |       fvec_l2sq(array(cast(1.0 as float)), array(cast(3.0 as float))) AS l
        |""".stripMargin).as[(Double, Double)].head()
    assert(r == ((11.0, 4.0)))
  }

  test("mixed float/double sides (LSH weight vectors) agree with zip_with") {
    val w = typedLit((0 until 64).map(d => Similarity.planeWeightConst(0, d)))
    val diff = vecs.select(
      graft.plans.VecKernels.dot(col("embedding"), slice(w, lit(1), size(col("embedding"))))
        .as("native"),
      aggregate(
        zip_with(col("embedding"), slice(w, lit(1), size(col("embedding"))),
          (x, wd) => x.cast("double") * wd),
        lit(0.0), (s, v) => s + v).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.count() == 0)
  }
}
