package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.NativeFunctions

/** The native codegen expressions must agree byte-for-byte with their
  * pure-Scala reference implementations, in both codegen and interpreted
  * (eval) regimes, and be SQL-callable after registration. */
class NativeExprSpec extends AnyFunSuite with SparkSuite {

  private val samples = Seq(
    "café résumé naïve", "plain ascii", "ÀÉÎÕÜ mixed Ånd", "", "ñ",
    "Ḽơᶉëᶆ ȋṕšᶙṁ", "tabs\tand\nnewlines")

  test("strip_diacritics matches Text.stripDiacritics (codegen + interpreted)") {
    import spark.implicits._
    val df = samples.toDF("s")
    val got = df.select(NativeFunctions.stripDiacritics(col("s"))).as[String].collect()
    assert(got.toSeq == samples.map(functions.Text.stripDiacritics))
    // interpreted path (eval) via a LocalRelation constant-fold
    val folded = spark.sql(
      "SELECT 1").select(NativeFunctions.stripDiacritics(lit("Ålesund café")))
      .as[String].head()
    assert(folded == functions.Text.stripDiacritics("Ålesund café"))
  }

  test("strip_diacritics propagates null") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("é"))
      .toDF("s").select(NativeFunctions.stripDiacritics(col("s")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, Some("e")))
  }

  test("simhash64 matches the pure-Scala simhash") {
    import spark.implicits._
    val toks = Seq(
      Seq("a", "b", "a", "c"), Seq("x"), Seq.empty[String],
      "the quick brown fox the quick".split(" ").toSeq)
    val got = toks.toDF("t").select(NativeFunctions.simhash64(col("t")))
      .as[Long].collect()
    assert(got.toSeq == toks.map(operators.Dedup.simhash))
  }

  test("native functions are SQL-callable after registration") {
    plans.NativeFunctions.register(spark)
    val r = spark.sql(
      "SELECT strip_diacritics('très tôt') AS s, simhash64(array('a','b')) AS h")
      .head()
    assert(r.getString(0) == "tres tot")
    assert(r.getLong(1) == operators.Dedup.simhash(Seq("a", "b")))
  }

  test("hyperplane_sig matches the plane-row formula") {
    import spark.implicits._
    // plane parity between the native cache and the driver-side formula
    for (j <- 0 until 40)
      assert(plans.HyperplaneSig.plane(j, 64).toSeq == operators.Similarity.planeRow(j, 64))
    val vecs = Seq(Seq.fill(64)(1L), (1L to 64L).toSeq, Seq.fill(64)(-3L))
    val got = vecs.toDF("v")
      .select(NativeFunctions.hyperplaneSig(col("v"), 8, 8)).as[Long].collect()
    val want = vecs.map { v =>
      (0 until 8).map { b =>
        val p = operators.Similarity.planeRow(8 + b, 64)
        val proj = v.zip(p).map { case (x, s) => x * s }.sum
        if (proj >= 0) 1L << b else 0L
      }.sum
    }
    assert(got.toSeq == want)
  }

  test("hyperplane family: planes are balanced and mutually distinct") {
    // Regression for the parity-hash bug: the old sign hash took the low
    // bit of (k * odd) mod 2^31, which preserves the parity of k, so
    // every plane was ±plane(0) — signatures took 2 values and the LSH
    // band join silently ran all-pairs. Real planes must (a) carry a
    // near-balanced sign mix and (b) be pairwise non-identical AND
    // non-opposite.
    val planes = (0 until 64).map(j => plans.HyperplaneSig.plane(j, 64).toSeq)
    for ((p, j) <- planes.zipWithIndex) {
      val pos = p.count(_ == 1L)
      assert(pos >= 16 && pos <= 48, s"plane $j badly unbalanced: $pos/64 positive")
    }
    for (a <- planes.indices; b <- a + 1 until planes.size) {
      assert(planes(a) != planes(b), s"planes $a and $b identical")
      assert(planes(a) != planes(b).map(-_), s"planes $a and $b are negations")
    }
  }

  test("dot_long matches a plain Scala dot product") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 9L), Seq(2L, 2L, 2L)),
      (Seq.empty[Long], Seq.empty[Long]))
    val got = pairs.toDF("a", "b")
      .select(NativeFunctions.dotLong(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq == pairs.map { case (a, b) => a.zip(b).map(t => t._1 * t._2).sum })
  }

  test("word_kgrams matches the sliding-window reference semantics") {
    import spark.implicits._
    val cases = Seq("a b c d e", "one two", "solo", "", "x y x y x")
    val got = cases.toDF("s")
      .select(NativeFunctions.wordKGrams(col("s"), 3)).as[Seq[String]].collect()
    val want = cases.map { s =>
      val words = s.split(" ", -1)
      val m = math.max(words.length - 2, 1)
      (0 until m).map(i => words.slice(i, i + 3).mkString(" ")).distinct
    }
    assert(got.toSeq == want)
  }

  test("word_kgrams_all preserves duplicates and returns empty below k words") {
    import spark.implicits._
    val cases = Seq("a b a b a", "one two", "solo", "", "x y z")
    val got = cases.toDF("s")
      .select(NativeFunctions.wordKGramsAll(col("s"), 2)).as[Seq[String]].collect()
    val want = cases.map { s =>
      val words = s.split(" ", -1)
      if (words.length < 2) Seq.empty[String]
      else (0 until words.length - 1).map(i => s"${words(i)} ${words(i + 1)}")
    }
    assert(got.toSeq == want)
    // duplicates preserved: "a b" appears twice in the first case
    assert(got(0).count(_ == "a b") == 2)
  }

  test("the expressions do not break whole-stage codegen") {
    import spark.implicits._
    val df = samples.toDF("s").repartition(2) // defeat LocalRelation fold
      .select(NativeFunctions.stripDiacritics(col("s")).as("f"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "no codegen span")
    assert(!plan.contains("ScalaUDF"), "still a UDF in the plan")
  }
}
