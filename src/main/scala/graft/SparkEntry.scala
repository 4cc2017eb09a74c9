package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by QueryModules under graft.operators; each
  * carries its DuckDB oracle SQL when SQL-expressible.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    operators.StarPredicates,
    operators.StarAggs,
    operators.StarSorts,
    operators.FnQueries,
    operators.FtsQueries,
    entries.EntryQueries,
    operators.DedupQueries,
    operators.SimilarityQueries,
    operators.TextAnalysisQueries,
    operators.GovernanceQueries,
    operators.AnalyticsQueries,
    operators.InferenceQueries,
  )

  lazy val allDefs: Seq[QueryDef] = {
    val defs = modules.flatMap(_.defs)
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    defs
  }

  /** Flagship: the SURVEY §7 minimum slice — listEntries with a corrected
    * date overlay, range filter, corrected-date sort, and first page
    * (reference path src/lib/db/entries.ts:87-139). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    operators.Star.withCorrectedDate(spark, Tables.orders(spark, d))
      .where(col("o_orderstatus").isin("O", "F") &&
        col("corrected_date") >= to_date(lit("1996-01-01")))
      .orderBy(col("corrected_date").desc_nulls_last, col("o_orderkey").asc)
      .limit(50)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
