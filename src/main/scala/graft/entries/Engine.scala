package graft.entries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Cols
import graft.operators.Fts

/** The reference's user-facing search options
  * (EntrySearchOptions + PageCursor, src/lib/utils.ts:61-86). */
final case class SearchOptions(
    q: Option[String] = None,
    agency: Option[String] = None,
    resolutions: Seq[String] = Nil,
    requestedFrom: Option[String] = None,
    requestedTo: Option[String] = None,
    completedFrom: Option[String] = None,
    completedTo: Option[String] = None,
    sort: String = "newest",
    page: Int = 1,
    pageSize: Int = 50)

final case class ListPage(rows: DataFrame, total: Long, page: Int, totalPages: Int)

/** Parameterized entries API — the engine a reference user calls instead
  * of `listEntries`/`distinctResolutions`/`resolutionCounts`
  * (src/lib/db/entries.ts:87-204). The registered q_* gate queries pin
  * one fixed instantiation each; this surface accepts arbitrary options
  * and composes the same shared transforms (corrections overlay, alias
  * candidates, FTS semi-join, sort dispatch, count+clamp+page).
  */
object Engine {

  /** Query-side FTS tokenizer (buildFtsQuery, entries.ts:12-20):
    * lowercase, split on whitespace, strip non-alnum per term; empty →
    * no FTS filter. */
  def ftsPrefixes(q: String): Seq[String] =
    q.toLowerCase.split("\\s+").toSeq
      .map(_.replaceAll("[^a-z0-9]", "")).filter(_.nonEmpty)

  /** Corrected-date columns for filter/sort (correctedDateExpr,
    * src/lib/db/shared.ts:55-66) — broadcast overlay + coalesce. */
  private def withCorrected(spark: SparkSession, entries: DataFrame): DataFrame =
    entries
      .join(broadcast(Normalize.correctionsDf(spark)), Seq("id"), "left")
      .withColumn("corrected_request", coalesce(col("req_fix"), col("request_date")))
      .withColumn("corrected_completion", coalesce(col("comp_fix"), col("completion_date")))
      .drop("req_fix", "comp_fix")

  /** Sort dispatch (utils.ts:3-9, entries.ts:65-85). SQLite treats NULL
    * as smallest (first under ASC, last under DESC); id is the unique
    * tiebreak the reference gets implicitly from its rowid scan. */
  def sortKeys(sort: String): Seq[Column] = sort match {
    case "newest"             => Seq(col("corrected_request").desc_nulls_last, col("id").asc)
    case "oldest"             => Seq(col("corrected_request").asc_nulls_first, col("id").asc)
    case "recently_completed" => Seq(col("corrected_completion").desc_nulls_last, col("id").asc)
    case "highest_fee"        => Seq(Cols.sqliteFeeInt(col("fee")).desc, col("id").asc)
    case _                    => Seq(col("id").desc)
  }

  /** The 8 FTS-indexed columns (migrations/0002_fts.sql:2-10). */
  private val FtsCols = Seq("agency", "organization", "first_name", "last_name",
    "subject", "details", "resolution", "response")

  def listEntries(spark: SparkSession, entries: DataFrame,
                  opts: SearchOptions): ListPage = {
    var df = withCorrected(spark, entries)

    // P6/J1 — FTS prefix-AND semi-join over the term index
    opts.q.map(ftsPrefixes).filter(_.nonEmpty).foreach { prefixes =>
      df = Fts.search(df, "id", FtsCols, prefixes)
    }
    // P1/J2 — alias-candidate case-insensitive equality disjunction
    opts.agency.foreach { a =>
      val cands = Normalize.aliasCandidates(a).map(_.toLowerCase)
      df = df.where(lower(col("agency")).isin(cands: _*))
    }
    // P2 — resolution IN-list
    if (opts.resolutions.nonEmpty)
      df = df.where(col("resolution").isin(opts.resolutions: _*))
    // P3 — ISO-string range predicates on corrected columns
    opts.requestedFrom.foreach(v => df = df.where(col("corrected_request") >= v))
    opts.requestedTo.foreach(v => df = df.where(col("corrected_request") <= v))
    opts.completedFrom.foreach(v => df = df.where(col("corrected_completion") >= v))
    opts.completedTo.foreach(v => df = df.where(col("corrected_completion") <= v))

    // A1/O2 — count, clamp the requested page, slice (entries.ts:102-116).
    // One cached filtered plan feeds both actions (the reference's two
    // SQLite round-trips share nothing).
    df = df.persist()
    val total = df.count()
    val totalPages = math.max(math.ceil(total / opts.pageSize.toDouble).toInt, 1)
    val page = math.min(math.max(opts.page, 1), totalPages)
    val w = Window.orderBy(sortKeys(opts.sort): _*)
    val slice = df
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") > (page - 1) * opts.pageSize &&
        col("__rn") <= page.toLong * opts.pageSize)
      .drop("__rn")
    // P9 — row post-processor on the returned page only
    val rows = Normalize.normalizeEntries(spark,
      slice.drop("corrected_request", "corrected_completion"))
    ListPage(rows, total, page, totalPages)
  }

  /** distinctResolutions (entries.ts:180-187). */
  def distinctResolutions(entries: DataFrame): DataFrame =
    entries.where(col("resolution").isNotNull && col("resolution") =!= "")
      .select("resolution").distinct().orderBy("resolution")

  /** resolutionCounts facets (entries.ts:189-204). */
  def resolutionCounts(entries: DataFrame): DataFrame =
    entries.where(col("resolution").isNotNull && col("resolution") =!= "")
      .groupBy("resolution").agg(count(lit(1)).as("cnt"))

  /** latest sync cursor — COALESCE(MAX(id),0) (entries.ts:147-150). */
  def latestEntryId(entries: DataFrame): Long =
    entries.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0)
}
