package graft

import org.apache.spark.sql.functions._

import graft.plans.{EditDistAtMost, TextKernels}

/** Parity of the native banded edit-distance kernel against Spark's
  * 3-arg `levenshtein` builtin — the kernel is a drop-in on the q91/q233
  * verify path, so the contract is exact equality (distance when ≤ k,
  * −1 past it, null-in null-out) on arbitrary strings incl. multibyte. */
class EditDistKernelSpec extends SparkSpec {
  import spark.implicits._

  private val alphabets = Seq(
    "ab",                       // dense collisions, many near pairs
    "abcdefgh",                 // moderate
    "aé漢🎉b",            // multibyte: 2/3/4-byte code points
    " \tx")

  private def randString(rnd: scala.util.Random, alpha: String,
      maxLen: Int): String = {
    val cps = alpha.codePoints().toArray
    val n = rnd.nextInt(maxLen + 1)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
    sb.toString
  }

  test("randomized parity with the levenshtein builtin across thresholds") {
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 4000).map { i =>
      val alpha = alphabets(i % alphabets.length)
      val a = randString(rnd, alpha, 40)
      // half the pairs are mutations of a (near pairs), half independent
      val b =
        if (i % 2 == 0) randString(rnd, alpha, 40)
        else {
          val sb = new java.lang.StringBuilder(a)
          val edits = rnd.nextInt(7)
          (0 until edits).foreach { _ =>
            if (sb.length() == 0) sb.append(alpha.charAt(0))
            else rnd.nextInt(3) match {
              case 0 => sb.deleteCharAt(rnd.nextInt(sb.length()))
              case 1 => sb.insert(rnd.nextInt(sb.length() + 1),
                alpha.charAt(rnd.nextInt(alpha.length)))
              case _ => sb.setCharAt(rnd.nextInt(sb.length()),
                alpha.charAt(rnd.nextInt(alpha.length)))
            }
          }
          sb.toString
        }
      (a, b)
    }
    val df = rows.toDF("a", "b")
    Seq(0, 1, 4, 9).foreach { k =>
      val bad = df
        .withColumn("builtin", levenshtein(col("a"), col("b"), k))
        .withColumn("native", TextKernels.editDistAtMost(col("a"), col("b"), k))
        .filter(col("builtin") =!= col("native"))
      assert(bad.count() === 0, s"k=$k: ${bad.take(5).mkString("; ")}")
    }
  }

  test("boundary cases: empty, equal, null, exactly-at-threshold") {
    val df = Seq(
      (Some(""), Some("")),
      (Some(""), Some("abcd")),
      (Some("abcd"), Some("")),
      (Some("same"), Some("same")),
      (Some("kitten"), Some("sitting")),   // dist 3
      (Some("aaaa"), Some("bbbb")),        // dist 4
      (None: Option[String], Some("x")),
      (Some("x"), None: Option[String])
    ).toDF("a", "b")
    Seq(3, 4).foreach { k =>
      val bad = df
        .withColumn("builtin", levenshtein(col("a"), col("b"), k))
        .withColumn("native", TextKernels.editDistAtMost(col("a"), col("b"), k))
        .filter(not(col("builtin") <=> col("native")))
      assert(bad.count() === 0, s"k=$k: ${bad.take(8).mkString("; ")}")
    }
  }

  test("SQL-text invocation via register() matches the Column API") {
    graft.plans.GraftExtensions.register(spark)
    Seq(("kitten", "sitting"), ("same", "same"), ("aé漢🎉", "aéx🎉"))
      .toDF("a", "b").createOrReplaceTempView("edit_dist_sql_probe")
    val got = spark.sql(
      "SELECT edit_dist_at_most(a, b, 3) AS d FROM edit_dist_sql_probe")
      .as[Int].collect().toSeq
    assert(got === Seq(3, 0, 1))
    // threshold must be a literal — non-foldable k is rejected at build
    val err = intercept[Exception] {
      spark.sql(
        "SELECT edit_dist_at_most(a, b, length(a)) FROM edit_dist_sql_probe")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("interpreted eval path matches codegen semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq(
      ("kitten", "sitting", 4, 3),
      ("kitten", "sitting", 2, -1),
      ("", "abc", 4, 3),
      ("aé漢🎉", "aé漢🎉", 1, 0),
      ("aé漢🎉", "aéx🎉", 1, 1),
      ("aé漢🎉", "xxxx", 2, -1),
      ("abc", "abc", 0, 0),
      ("abc", "abd", 0, -1),
      // byte-length pre-gate: diff 11 > 4·2 ⇒ reject before decode
      ("aaaaaaaaaaaa", "a", 2, -1),
      // 4-byte cps vs ASCII: byte diff 9 > 4·2 gates at k=2 (true dist 3)…
      ("🎉🎉🎉", "abc", 2, -1),
      // …and at k=3 the gate must NOT fire (9 ≤ 12): exact dist 3
      ("🎉🎉🎉", "abc", 3, 3))
    cases.foreach { case (a, b, k, want) =>
      assert(EditDistAtMost.compute(
        UTF8String.fromString(a), UTF8String.fromString(b), k) === want,
        s"compute($a, $b, $k)")
    }
  }
}
