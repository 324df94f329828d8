package graft

import org.apache.spark.sql.functions._

/** Parity of the native banded-LSH key kernel against the composed
  * built-ins formulation it replaced — the kernel feeds the banded
  * near-dup family (q46/q231/q106-class), so the contract is exact
  * equality of every band key on arbitrary inputs: float and double
  * arrays, ragged lengths (incl. > maxDims ⇒ all-zero bits), empty
  * vectors (bit 1 on every plane), null elements and null vectors
  * (all-zero bits, never a null array). */
class LshBandKeysKernelSpec extends SparkSpec {
  import spark.implicits._

  private val geometries = Seq((24, 3), (33, 3), (55, 5), (8, 1))

  test("randomized parity with the composed form (double vectors)") {
    val rnd = new scala.util.Random(20261)
    val rows = (0 until 600).map { i =>
      val len = i % 7 match {
        case 0 => 0                   // empty: every plane folds 0.0 >= 0
        case 1 => 64                  // exact maxDims
        case 2 => 65 + rnd.nextInt(8) // > maxDims: mismatch, bits 0
        case _ => 1 + rnd.nextInt(64)
      }
      val v = Seq.fill(len)(rnd.nextDouble() * 2 - 1)
      // NaN poisons the dot: Spark's SQL ordering puts NaN ABOVE 0 (bit
      // set) where Java's >= would say false — the kernel must follow SQL
      val poisoned =
        if (i % 13 == 0 && len > 0) v.updated(rnd.nextInt(len), Double.NaN)
        else if (i % 17 == 0 && len > 0)
          v.updated(rnd.nextInt(len), Double.PositiveInfinity)
        else v
      (i.toLong, poisoned)
    }
    val df = rows.toDF("id", "v")
    geometries.foreach { case (planes, bands) =>
      val bad = df
        .withColumn("native",
          graft.plans.LshKernels.lshBandKeys(col("v"), planes, bands))
        .withColumn("composed",
          ReferenceKernels.lshBandKeysReference(col("v"), planes, bands))
        .filter(not(col("native") <=> col("composed")))
      assert(bad.count() === 0,
        s"($planes, $bands): " + bad.take(3).mkString("; "))
    }
  }

  test("float vectors, null elements, and null vectors match the composed form") {
    val rnd = new scala.util.Random(7171)
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] = (0 until 300).map { i =>
      if (i % 11 == 0) (i.toLong, None) // null vector
      else {
        val len = rnd.nextInt(66)
        (i.toLong, Some(Seq.tabulate(len)(d =>
          // sprinkle null elements: they null the dot → bit 0
          if ((i + d) % 17 == 0) None
          else Some(rnd.nextFloat() * 2 - 1))))
      }
    }
    val df = rows.toDF("id", "v")
    val bad = df
      .withColumn("native",
        graft.plans.LshKernels.lshBandKeys(col("v"), 24, 3))
      .withColumn("composed",
        ReferenceKernels.lshBandKeysReference(col("v"), 24, 3))
      .filter(not(col("native") <=> col("composed")))
    assert(bad.count() === 0, bad.take(5).mkString("; "))
    // null vector: keys exist with all-zero bits (never a null array)
    val nullKeys = df.filter(col("v").isNull)
      .select(graft.plans.LshKernels.lshBandKeys(col("v"), 24, 3).as("k"))
      .as[Seq[String]].head()
    assert(nullKeys === Seq("0:0", "1:0", "2:0"))
  }

  test("interpreted eval matches codegen output") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val v = new GenericArrayData(Array[Any](0.5, -0.25, 0.125))
    val a = graft.plans.LshBandKeysExpr.compute(v, 24, 3, 64, isFloat = false)
    val b = graft.plans.LshBandKeysExpr.compute(v, 24, 3, 64, isFloat = false)
    assert((0 until 3).map(a.getUTF8String(_).toString) ===
      (0 until 3).map(b.getUTF8String(_).toString))
    val nul = graft.plans.LshBandKeysExpr.compute(null, 16, 2, 64, isFloat = false)
    assert((0 until 2).map(nul.getUTF8String(_).toString) === Seq("0:0", "1:0"))
  }
}
