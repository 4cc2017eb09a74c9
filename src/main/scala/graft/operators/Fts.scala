package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Cols

/** Full-text search subsystem — SURVEY §2.8.
  *
  * The reference uses an FTS5 contentless-delegate table over 8 text
  * columns with `unicode61 remove_diacritics 1` tokenization and
  * prefix-AND MATCH queries (migrations/0002_fts.sql:1-13,
  * src/lib/db/entries.ts:12-26). The Spark-native design is a derived
  * inverted term index `(id, term)` + semi-join:
  *
  *   - Index build: diacritic-fold -> lower -> split on non-alnum ->
  *     explode -> distinct. Recomputed per batch (replaces FTS5's
  *     triggers, 0002_fts.sql:17-34); at scale it is written bucketed
  *     BY (term) so prefix probes touch few buckets.
  *   - Query: each prefix term becomes a range predicate
  *     [prefix, prefix + U+10FFFF) against the SORTED term column —
  *     sargable, so parquet min/max pruning and bucket pruning apply,
  *     unlike a contains() scan. AND-of-terms = count of distinct
  *     matched prefixes per id == nTerms, then a left-semi join back.
  */
object Fts {

  /** S6 — build the inverted term index over arbitrary text columns. */
  def termIndex(docs: DataFrame, idCol: String, textCols: Seq[String]): DataFrame = {
    val joined = concat_ws(" ", textCols.map(col): _*)
    docs.select(col(idCol).as("id"), explode(Cols.ftsTokens(joined)).as("term"))
      .distinct()
  }

  /** Range predicate for one prefix over the term column (sargable). */
  private def prefixPred(term: Column, prefix: String): Column =
    term >= prefix && term < (prefix + "􏿿")

  /** P6 — ids whose terms match EVERY prefix (FTS5 `a* AND b*`). */
  def matchingIds(index: DataFrame, prefixes0: Seq[String]): DataFrame = {
    // Dedupe first: 'new new' must need only one hit. And a term can hit
    // SEVERAL prefixes at once ('news' hits both 'new' and 'news'), so
    // each row emits the array of ALL prefixes it matches — crediting
    // only the first match would make n_hit unable to ever reach
    // prefixes.size when one query prefix is a prefix of another.
    val prefixes = prefixes0.distinct
    require(prefixes.nonEmpty)
    val hits = filter(
      array(prefixes.map(p => when(prefixPred(col("term"), p), lit(p))): _*),
      _.isNotNull)
    index
      .where(prefixes.map(p => prefixPred(col("term"), p)).reduce(_ || _))
      .select(col("id"), explode(hits).as("hit_prefix"))
      .groupBy("id")
      .agg(countDistinct(col("hit_prefix")).as("n_hit"))
      .where(col("n_hit") === prefixes.size)
      .select("id")
  }

  /** Search pipeline: docs ⋉ prefix-AND matches. */
  def search(docs: DataFrame, idCol: String, textCols: Seq[String],
             prefixes: Seq[String]): DataFrame =
    docs.join(matchingIds(termIndex(docs, idCol, textCols), prefixes)
      .withColumnRenamed("id", idCol + "__m"),
      col(idCol) === col(idCol + "__m"), "left_semi")
}

/** FTS queries registered for the correctness gate, over `documents`. */
object FtsQueries extends graft.QueryModule {

  def defs: Seq[graft.QueryDef] = Seq(

    // S6 — the term index itself (restricted to a deterministic id slice
    // to keep the dump bounded).
    graft.QueryDef("s6_fts_index", Some(
      """SELECT DISTINCT doc_id AS id, term FROM (
        |  SELECT doc_id, unnest(string_split_regex(lower(strip_accents(text)), '[^a-z0-9]+')) AS term
        |  FROM documents WHERE doc_id < 200)
        |WHERE term <> ''""".stripMargin))((s, d) =>
      Fts.termIndex(Tables.documents(s, d).where(col("doc_id") < 200), "doc_id", Seq("text"))),

    // P6 — prefix-AND membership: docs where some token starts with
    // 'spar' AND some token starts with 'wind' (buildFtsQuery of
    // "spark windows" after truncation — exercises true prefix
    // semantics, not whole-token equality). The oracle states the same
    // predicate as word-boundary regexes over the raw text.
    graft.QueryDef("p6_fts_search", Some(
      """SELECT doc_id, lang, source FROM documents
        |WHERE regexp_matches(lower(strip_accents(text)), '(^|[^a-z0-9])spar')
        |  AND regexp_matches(lower(strip_accents(text)), '(^|[^a-z0-9])wind')""".stripMargin))((s, d) =>
      Fts.search(Tables.documents(s, d), "doc_id", Seq("text"), Seq("spar", "wind"))
        .select("doc_id", "lang", "source")),

    // P6c — overlapping prefixes ('wind' is a prefix of 'window'): a term
    // matching several query prefixes must credit ALL of them, or the
    // AND-count can never be satisfied (FTS5 'wind* AND window*' matches
    // any doc with a window-token). Regression oracle for the
    // first-match-only bug.
    graft.QueryDef("p6_fts_overlap", Some(
      """SELECT doc_id FROM documents
        |WHERE regexp_matches(lower(strip_accents(text)), '(^|[^a-z0-9])wind')
        |  AND regexp_matches(lower(strip_accents(text)), '(^|[^a-z0-9])window')""".stripMargin))((s, d) =>
      Fts.search(Tables.documents(s, d), "doc_id", Seq("text"), Seq("wind", "window"))
        .select("doc_id")),

    // P6b — multi-column FTS over the entries fixture: the reference
    // indexes 8 text columns (0002_fts.sql:2-10); a prefix may match in
    // ANY of them, AND across prefixes. The oracle states the predicate
    // as word-boundary regexes over the concatenated columns.
    graft.QueryDef("p6_fts_multicol", Some {
      def hit(p: String) =
        s"regexp_matches(lower(strip_accents(concat_ws(' ', agency, subject, details))), '(^|[^a-z0-9])$p')"
      s"""SELECT id, agency, subject FROM ${graft.entries.Fixture.entriesSql}
         |WHERE ${hit("bud")} AND ${hit("spar")}""".stripMargin
    })((s, d) =>
      Fts.search(graft.entries.Fixture.df(s), "id",
        Seq("agency", "subject", "details"), Seq("bud", "spar"))
        .select("id", "agency", "subject"))
  )
}
