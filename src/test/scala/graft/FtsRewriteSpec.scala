package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fts
import graft.plans.{FtsRewrite, RewriteFtsMatch}

/** The fts_match marker must be rewritten by the optimizer rule into
  * the term-index prefix-AND semi-join, with results identical to the
  * explicit Fts.search API and the marker gone from the final plan. */
class FtsRewriteSpec extends AnyFunSuite with SparkSuite {

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteFtsMatch(spark)
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_.isInstanceOf[RewriteFtsMatch])
  }

  test("marker predicate rewrites to a left-semi join with identical results") {
    withRule {
      val docs = Tables.documents(spark, sf)
      val declarative = docs
        .where(FtsRewrite.ftsMatch(col("doc_id"), col("text"), "Spar Wind!"))
        .select("doc_id")
      val got = declarative.collect().map(_.getLong(0)).toSet
      val want = Fts.search(docs, "doc_id", Seq("text"), Seq("spar", "wind"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want && got.nonEmpty)
      val plan = declarative.queryExecution.executedPlan.toString
      assert(!plan.contains("fts_match"), "marker survived optimization")
      assert(plan.contains("LeftSemi"), s"no semi-join in plan:\n$plan")
    }
  }

  test("marker composes with ordinary predicates (rest of the filter kept)") {
    withRule {
      val docs = Tables.documents(spark, sf)
      val got = docs
        .where(FtsRewrite.ftsMatch(col("doc_id"), col("text"), "spar") &&
          col("doc_id") < 100)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = Fts.search(docs.where(col("doc_id") < 100), "doc_id",
        Seq("text"), Seq("spar"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want)
    }
  }

  test("all-punctuation query degrades to no FTS filter (reference null query)") {
    withRule {
      val docs = Tables.documents(spark, sf)
      val n = docs.where(FtsRewrite.ftsMatch(col("doc_id"), col("text"), "!!! ...")).count()
      assert(n == docs.count())
    }
  }
}
