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
