package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Cols, Udfs}
import graft.util.SqlLit

/** Scalar-function operators (SURVEY §2.7) exercised over shared edge-case
  * fixtures. Each fixture is ONE Scala value rendered both into the Spark
  * DataFrame and into the oracle's VALUES clause, so the engines see
  * byte-identical inputs — nulls, junk fees, typo'd dates and all
  * (FIXTURES.md family A; the synthetic star tables contain no nulls or
  * dirty strings, which is exactly what these functions are about).
  *
  * SQL-expressible functions get an oracle; titlify/normalizeAgencyName
  * (F2/F3) are UDF-backed and covered by ScalaTest goldens plus
  * rows-only registrations here.
  */
object FnQueries extends graft.QueryModule {

  /** Fixture years put "future" completions after this — the reference's
    * hidden `new Date().getFullYear()` (utils.ts:132) made explicit. */
  private val FixYear = 2025

  private def df1(s: SparkSession, rows: Seq[(Long, Option[String])], col2: String): DataFrame = {
    import s.implicits._
    rows.toDF("id", col2)
  }
  private def sql1(rows: Seq[(Long, Option[String])], col2: String): String =
    SqlLit.values(rows.map(r => Seq[Any](r._1, r._2)), "t", Seq("id", col2))

  // ---- fixtures ----------------------------------------------------------

  private val names: Seq[(Long, Option[String])] = Seq(
    1L -> Some("Department of Health"),
    2L -> Some("A + B/C  Agency"),
    3L -> Some(" WV Sec-of-State!! "),
    4L -> Some("McDowell County Sheriff's Office"),
    5L -> Some("CITY OF CHARLESTON"),
    6L -> Some("---"),
    7L -> Some(""),
    8L -> Some("Café Bureau | Unit #9"))

  /** F3 fixtures: typo-fix paths (Departmint/Tcity), alias-map hits,
    * Mc-names, WV token, whitespace collapse — corrections.ts:44-57. */
  private val agencyVariants: Seq[(Long, Option[String])] = Seq(
    1L -> Some("Departmint of Health"),
    2L -> Some("Tcity of Charleston"),
    3L -> Some("  wv  state   police "),
    4L -> Some("McDowell County Sheriff's Office"),
    5L -> Some("DEPARTMENT OF TRANSPORTATION"),
    6L -> Some("Departmen of Education"),
    7L -> Some(""),
    8L -> None)

  private val rawDates: Seq[(Long, Option[String])] = Seq(
    1L -> Some("3/5/2024"),
    2L -> Some("2024-03-05"),
    3L -> Some(" 12/31/1999 "),
    4L -> Some("13/45/2024"),
    5L -> Some("not a date"),
    6L -> Some(""),
    7L -> None,
    8L -> Some("1/1/2024"))

  private val datePairs: Seq[(Long, Option[String], Option[String])] = Seq(
    (1L, Some("2024-01-01"), Some("2024-01-31")),
    (2L, Some("2024-01-31"), Some("2024-01-01")), // negative diff survives (JS floor)
    (3L, Some("2024-01-01"), Some("2026-01-01")), // future-year -> -1
    (4L, None, Some("2024-01-01")),
    (5L, Some("2024-01-01"), None),
    (6L, Some("garbage"), Some("2024-01-01")),
    (7L, Some("2024-02-28"), Some("2024-03-01")),
    (8L, Some("2020-06-15"), Some("2024-06-14")))

  private val fees: Seq[(Long, Option[String])] = Seq(
    1L -> Some("$1,250.00"),
    2L -> Some("0"),
    3L -> Some(""),
    4L -> Some("25 (waived)"),
    5L -> Some("-$13.50"),
    6L -> None,
    7L -> Some("fee pending"),
    8L -> Some("100.5"))

  private val requestors: Seq[(Long, Option[String], Option[String], Option[String], Option[String])] = Seq(
    (1L, Some("Jane"), Some("Q"), Some("Public"), Some("ACME Org")),
    (2L, Some("Jane"), None, Some("Public"), None),
    (3L, None, None, None, Some("ACME Org")),
    (4L, None, None, None, None),
    (5L, Some(""), Some(""), Some(""), Some("Org Only")))

  private val rawKeys: Seq[(Long, Option[String])] = Seq(
    1L -> Some("Request Date:"),
    2L -> Some("  Fee ($) "),
    3L -> Some("First Name"),
    4L -> Some("__Odd--Key__"),
    5L -> Some("::"),
    6L -> Some("Amended?"))

  private val rawTexts: Seq[(Long, Option[String])] = Seq(
    1L -> Some("  hello   world  "),
    2L -> Some("a\tb\nc"),
    3L -> Some("<a href=\"x\">R&D 'quote'</a>"),
    4L -> Some(""),
    5L -> None)

  private val resolutions: Seq[(Long, Option[String])] = Seq(
    1L -> Some("Granted"),
    2L -> Some(" granted in part "),
    3L -> Some("EXEMPTED"),
    4L -> Some("Rejected"),
    5L -> Some(""),
    6L -> None,
    7L -> Some("No Responsive Documents"))

  private val dayCounts: Seq[(Long, Option[String])] = Seq() // unused shape
  private val days: Seq[(Long, Long)] = Seq(
    1L -> 0L, 2L -> 5L, 3L -> 7L, 4L -> 30L, 5L -> 100L,
    6L -> 365L, 7L -> 400L, 8L -> 1000L, 9L -> -1L, 10L -> 366L)

  private val amounts: Seq[(Long, Double)] = Seq(
    1L -> 0.0, 2L -> 1234.4, 3L -> 1234.5, 4L -> 1234567.89, 5L -> -9876.5)

  private val timestamps: Seq[(Long, Option[String])] = Seq(
    1L -> Some("2025-06-01 11:59:30"),
    2L -> Some("2025-06-01 11:30:00"),
    3L -> Some("2025-06-01 02:00:00"),
    4L -> Some("2025-05-25 12:00:00"),
    5L -> Some("2025-03-01 12:00:00"),
    6L -> Some("2023-06-01 12:00:00"),
    7L -> None)
  private val NowTs = "2025-06-01 12:00:00"

  private val searches: Seq[(Long, Option[String])] = Seq(
    1L -> Some("hello world"),
    2L -> Some("   "),
    3L -> Some("a.b c!"),
    4L -> Some(""),
    5L -> Some("Café au lait"),
    6L -> Some("...  ---"))

  // ---- queries -----------------------------------------------------------

  def defs: Seq[graft.QueryDef] = Seq(

    // F1 — slugify as a pure regexp_replace chain.
    graft.QueryDef("f1_slugify", Some(
      s"""SELECT id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |  lower(name), '[\\s+|/]', '-', 'g'), '[^a-z0-9-]', '', 'g'), '-+', '-', 'g'),
         |  '^-|-${"$"}', '', 'g') AS slug
         |FROM ${sql1(names, "name")}""".stripMargin))((s, d) =>
      df1(s, names, "name").select(col("id"), Cols.slugify(col("name")).as("slug"))),

    // F4 — normalizeToken (titlify washes out under lower+strip).
    graft.QueryDef("f4_normalize_token", Some(
      s"""SELECT id, regexp_replace(lower(name), '[^a-z0-9]', '', 'g') AS token
         |FROM ${sql1(names, "name")}""".stripMargin))((s, d) =>
      df1(s, names, "name").select(col("id"), Cols.normalizeToken(col("name")).as("token"))),

    // F2 — titlify. The fixture inputs are fixed, so the expected outputs
    // are closed-form: a hand-checked VALUES golden (same pattern as
    // s1_sync_drift) — reference behavior src/lib/utils.ts:51-59;
    // TextSpec goldens pin the Scala function itself.
    graft.QueryDef("f2_titlify", Some(
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'Department of Health', 'Department of Health'),
        |  (CAST(2 AS BIGINT), 'A + B/C  Agency', 'A + B/C  Agency'),
        |  (CAST(3 AS BIGINT), ' WV Sec of State!! ', ' WV Sec of State!! '),
        |  (CAST(4 AS BIGINT), 'McDowell County Sheriff''s Office', 'McDowell County Sheriff''s Office'),
        |  (CAST(5 AS BIGINT), 'CITY of CHARLESTON', 'CITY of CHARLESTON'),
        |  (CAST(6 AS BIGINT), '   ', '   '),
        |  (CAST(7 AS BIGINT), '', ''),
        |  (CAST(8 AS BIGINT), 'Café Bureau | Unit #9', 'Café Bureau | Unit #9')
        |) AS t(id, titled, titled_noacro)""".stripMargin))((s, d) =>
      df1(s, names, "name").select(col("id"),
        Udfs.titlify(col("name"), lit(false)).as("titled"),
        Udfs.titlify(col("name"), lit(true)).as("titled_noacro"))),

    // F3 — normalizeAgencyName (UDF over typo-fix regexes + alias map,
    // reference src/lib/corrections.ts:44-57). Fixed inputs → VALUES
    // golden: typo fixes (Departmint→Department, Tcity→City; 'Departmen'
    // has no trailing t so the regex leaves it), WV token and Mc-name
    // preservation, whitespace collapse, '' and NULL pass-throughs.
    graft.QueryDef("f3_normalize_agency", Some(
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'Department of Health'),
        |  (CAST(2 AS BIGINT), 'City of Charleston'),
        |  (CAST(3 AS BIGINT), 'WV State Police'),
        |  (CAST(4 AS BIGINT), 'McDowell County Sheriff''s Office'),
        |  (CAST(5 AS BIGINT), 'Department of Transportation'),
        |  (CAST(6 AS BIGINT), 'Departmen of Education'),
        |  (CAST(7 AS BIGINT), ''),
        |  (CAST(8 AS BIGINT), CAST(NULL AS VARCHAR))
        |) AS t(id, canonical)""".stripMargin))((s, d) =>
      df1(s, agencyVariants, "raw").select(col("id"),
        graft.entries.Normalize.agencyNameUdf(col("raw")).as("canonical"))),

    // S3 — normalizeDate: pure string transform, no calendar validation.
    graft.QueryDef("s3_normalize_date", Some(
      s"""SELECT id, CASE
         |  WHEN raw IS NULL OR trim(raw) = '' THEN NULL
         |  WHEN regexp_matches(trim(raw), '^\\d{1,2}/\\d{1,2}/\\d{4}$$')
         |    THEN concat(regexp_extract(trim(raw), '^(\\d{1,2})/(\\d{1,2})/(\\d{4})$$', 3), '-',
         |      lpad(regexp_extract(trim(raw), '^(\\d{1,2})/(\\d{1,2})/(\\d{4})$$', 1), 2, '0'), '-',
         |      lpad(regexp_extract(trim(raw), '^(\\d{1,2})/(\\d{1,2})/(\\d{4})$$', 2), 2, '0'))
         |  WHEN regexp_matches(trim(raw), '^\\d{4}-\\d{2}-\\d{2}$$') THEN trim(raw)
         |  ELSE NULL END AS normalized
         |FROM ${sql1(rawDates, "raw")}""".stripMargin))((s, d) =>
      df1(s, rawDates, "raw").select(col("id"), Cols.normalizeDate(col("raw")).as("normalized"))),

    // F6 — diffDays with the -1 null/unparseable/future-year rules.
    graft.QueryDef("f6_diffdays", Some(
      s"""SELECT id, CAST(CASE
         |  WHEN f IS NULL OR t IS NULL OR try_cast(f AS DATE) IS NULL OR try_cast(t AS DATE) IS NULL THEN -1
         |  WHEN EXTRACT(year FROM try_cast(t AS DATE)) > $FixYear THEN -1
         |  ELSE date_diff('day', try_cast(f AS DATE), try_cast(t AS DATE)) END AS INTEGER) AS days
         |FROM ${SqlLit.values(datePairs.map(p => Seq[Any](p._1, p._2, p._3)), "t", Seq("id", "f", "t"))}""".stripMargin))((s, d) => {
      import s.implicits._
      datePairs.toDF("id", "f", "t")
        .select(col("id"), Cols.diffDays(col("f"), col("t"), FixYear).as("days"))
    }),

    // F7 — diffHuman decomposition over representative day counts.
    graft.QueryDef("f7_diffhuman", Some(
      s"""SELECT id, CASE
         |  WHEN total < 0 THEN '--' WHEN total = 0 THEN 'same day'
         |  ELSE concat_ws(', ',
         |    CASE WHEN total // 365 > 0 THEN concat(CAST(total // 365 AS VARCHAR), ' year', CASE WHEN total // 365 = 1 THEN '' ELSE 's' END) END,
         |    CASE WHEN (total % 365) // 30 > 0 THEN concat(CAST((total % 365) // 30 AS VARCHAR), ' month', CASE WHEN (total % 365) // 30 = 1 THEN '' ELSE 's' END) END,
         |    CASE WHEN ((total % 365) % 30) // 7 > 0 THEN concat(CAST(((total % 365) % 30) // 7 AS VARCHAR), ' week', CASE WHEN ((total % 365) % 30) // 7 = 1 THEN '' ELSE 's' END) END,
         |    CASE WHEN ((total % 365) % 30) % 7 > 0 THEN concat(CAST(((total % 365) % 30) % 7 AS VARCHAR), ' day', CASE WHEN ((total % 365) % 30) % 7 = 1 THEN '' ELSE 's' END) END)
         |  END AS human
         |FROM ${SqlLit.values(days.map(p => Seq[Any](p._1, p._2)), "t", Seq("id", "total"))}""".stripMargin))((s, d) => {
      import s.implicits._
      days.toDF("id", "total").select(col("id"), Cols.diffHuman(col("total")).as("human"))
    }),

    // F9 — formatCurrency's parse core + SQLite CAST-prefix semantics.
    graft.QueryDef("f9_fee_parse", Some(
      s"""SELECT id,
         |  try_cast(nullif(regexp_replace(fee, '[^0-9.-]+', '', 'g'), '') AS DOUBLE) AS fee_num,
         |  coalesce(try_cast(nullif(regexp_extract(trim(fee), '^-?[0-9]+', 0), '') AS BIGINT), 0) AS fee_int_sqlite,
         |  CASE WHEN try_cast(nullif(regexp_replace(fee, '[^0-9.-]+', '', 'g'), '') AS DOUBLE) IS NULL
         |    OR try_cast(nullif(regexp_replace(fee, '[^0-9.-]+', '', 'g'), '') AS DOUBLE) = 0
         |    THEN '--' ELSE 'render' END AS display_class
         |FROM ${sql1(fees, "fee")}""".stripMargin))((s, d) => {
      val amt = Cols.feeAmount(col("fee"))
      df1(s, fees, "fee").select(col("id"),
        amt.as("fee_num"),
        Cols.sqliteFeeInt(col("fee")).as("fee_int_sqlite"),
        when(amt.isNull || amt === 0, "--").otherwise("render").as("display_class"))
    }),

    // F10 — formatRequestor coalesce chain (concat_ws skips nulls in both
    // engines; '' names collapse to the org fallback via nullif).
    graft.QueryDef("f10_requestor", Some(
      s"""SELECT id, coalesce(nullif(concat_ws(' ', first_name, middle_name, last_name), ''), organization, '--') AS requestor
         |FROM ${SqlLit.values(requestors.map(p => Seq[Any](p._1, p._2, p._3, p._4, p._5)), "t",
        Seq("id", "first_name", "middle_name", "last_name", "organization"))}""".stripMargin))((s, d) => {
      import s.implicits._
      requestors.toDF("id", "first_name", "middle_name", "last_name", "organization")
        .select(col("id"), Cols.formatRequestor(col("first_name"), col("middle_name"),
          col("last_name"), col("organization")).as("requestor"))
    }),

    // F12 — normalizeKey ingest chain.
    graft.QueryDef("f12_normalize_key", Some(
      s"""SELECT id, regexp_replace(regexp_replace(lower(trim(regexp_replace(raw_key, ':', '', 'g'))),
         |  '[^a-z0-9]+', '_', 'g'), '^_+|_+$$', '', 'g') AS key
         |FROM ${sql1(rawKeys, "raw_key")}""".stripMargin))((s, d) =>
      df1(s, rawKeys, "raw_key").select(col("id"), Cols.normalizeKey(col("raw_key")).as("key"))),

    // F13 — cleanText whitespace collapse.
    graft.QueryDef("f13_cleantext", Some(
      s"""SELECT id, trim(regexp_replace(coalesce(raw_text, ''), '\\s+', ' ', 'g')) AS cleaned
         |FROM ${sql1(rawTexts, "raw_text")}""".stripMargin))((s, d) =>
      df1(s, rawTexts, "raw_text").select(col("id"), Cols.cleanText(col("raw_text")).as("cleaned"))),

    // F17 — escapeXml 5-entity chain (& first).
    graft.QueryDef("f17_escape_xml", Some(
      s"""SELECT id, replace(replace(replace(replace(replace(coalesce(raw_text, ''),
         |  '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '''', '&apos;') AS escaped
         |FROM ${sql1(rawTexts, "raw_text")}""".stripMargin))((s, d) =>
      df1(s, rawTexts, "raw_text").select(col("id"),
        Cols.escapeXml(coalesce(col("raw_text"), lit(""))).as("escaped"))),

    // F5 — resolutionBucketKey 5-way normalization.
    graft.QueryDef("f5_resolution_bucket", Some(
      s"""SELECT id, CASE
         |  WHEN lower(trim(coalesce(resolution, ''))) = 'granted' THEN 'granted'
         |  WHEN lower(trim(coalesce(resolution, ''))) = 'granted in part' THEN 'granted_in_part'
         |  WHEN lower(trim(coalesce(resolution, ''))) = 'exempted' THEN 'exempted'
         |  WHEN lower(trim(coalesce(resolution, ''))) = 'rejected' THEN 'rejected'
         |  ELSE 'other' END AS bucket
         |FROM ${sql1(resolutions, "resolution")}""".stripMargin))((s, d) =>
      df1(s, resolutions, "resolution")
        .select(col("id"), Cols.resolutionBucket(col("resolution")).as("bucket"))),

    // F14 — fmtNumber: round to integer + en-US thousands separators.
    graft.QueryDef("f14_fmt_number", Some(
      s"""SELECT id, format('{:,}', CAST(round(x) AS BIGINT)) AS formatted
         |FROM ${SqlLit.values(amounts.map(p => Seq[Any](p._1, p._2)), "t", Seq("id", "x"))}""".stripMargin))((s, d) => {
      import s.implicits._
      amounts.toDF("id", "x").select(col("id"), Cols.fmtNumber(col("x")).as("formatted"))
    }),

    // F15 — formatTimeAgo with an explicit `now`.
    graft.QueryDef("f15_time_ago", Some(
      s"""SELECT id, CASE
         |  WHEN ts IS NULL THEN NULL
         |  WHEN delta_ms < 60000 THEN 'just now'
         |  WHEN delta_ms < 3600000 THEN concat(CAST(CAST(floor(delta_ms / 60000) AS BIGINT) AS VARCHAR), ' minute', CASE WHEN CAST(floor(delta_ms / 60000) AS BIGINT) = 1 THEN '' ELSE 's' END, ' ago')
         |  WHEN delta_ms < 86400000 THEN concat(CAST(CAST(floor(delta_ms / 3600000) AS BIGINT) AS VARCHAR), ' hour', CASE WHEN CAST(floor(delta_ms / 3600000) AS BIGINT) = 1 THEN '' ELSE 's' END, ' ago')
         |  WHEN delta_ms < 2592000000 THEN concat(CAST(CAST(floor(delta_ms / 86400000) AS BIGINT) AS VARCHAR), ' day', CASE WHEN CAST(floor(delta_ms / 86400000) AS BIGINT) = 1 THEN '' ELSE 's' END, ' ago')
         |  WHEN delta_ms < 31536000000 THEN concat(CAST(CAST(floor(delta_ms / 2592000000) AS BIGINT) AS VARCHAR), ' month', CASE WHEN CAST(floor(delta_ms / 2592000000) AS BIGINT) = 1 THEN '' ELSE 's' END, ' ago')
         |  ELSE concat(CAST(CAST(floor(delta_ms / 31536000000) AS BIGINT) AS VARCHAR), ' year', CASE WHEN CAST(floor(delta_ms / 31536000000) AS BIGINT) = 1 THEN '' ELSE 's' END, ' ago') END AS ago
         |FROM (SELECT id, ts, (epoch(TIMESTAMP '$NowTs') - epoch(CAST(ts AS TIMESTAMP))) * 1000 AS delta_ms
         |  FROM ${sql1(timestamps, "ts")})""".stripMargin))((s, d) =>
      df1(s, timestamps, "ts").select(col("id"),
        Cols.formatTimeAgo(try_to_timestamp(col("ts")), to_timestamp(lit(NowTs))).as("ago"))),

    // F16 — parseFeedDate: ISO day -> UTC noon, else plain parse. Output
    // as epoch seconds (BIGINT) — timestamp dtype rendering differs
    // across comparator layers, epoch doesn't.
    graft.QueryDef("f16_feed_date", Some(
      s"""SELECT id, CAST(epoch(CASE
         |  WHEN regexp_matches(raw, '^\\d{4}-\\d{2}-\\d{2}$$')
         |    THEN CAST(raw AS TIMESTAMP) + INTERVAL 12 HOUR
         |  ELSE try_cast(raw AS TIMESTAMP) END) AS BIGINT) AS feed_epoch
         |FROM ${sql1(Seq(
        1L -> Some("2024-03-05"),
        2L -> Some("2024-03-05 08:30:00"),
        3L -> Some("junk"),
        4L -> None), "raw")}""".stripMargin))((s, d) =>
      df1(s, Seq(
        1L -> Some("2024-03-05"),
        2L -> Some("2024-03-05 08:30:00"),
        3L -> Some("junk"),
        4L -> None), "raw")
        .select(col("id"), Cols.parseFeedDate(col("raw")).cast(LongType).as("feed_epoch"))),

    // F11 — buildFtsQuery tokenizer: clean terms, `term*`, AND-join, null
    // when nothing survives.
    graft.QueryDef("f11_fts_query", Some(
      s"""SELECT id, CASE WHEN len(cleaned) = 0 THEN NULL
         |  ELSE array_to_string(list_transform(cleaned, x -> concat(x, '*')), ' AND ') END AS fts_query
         |FROM (SELECT id, list_filter(list_transform(string_split_regex(lower(q), '\\s+'),
         |  x -> regexp_replace(x, '[^a-z0-9]', '', 'g')), x -> x <> '') AS cleaned
         |  FROM ${sql1(searches, "q")})""".stripMargin))((s, d) =>
      df1(s, searches, "q").select(col("id"), Cols.buildFtsQuery(col("q")).as("fts_query"))),

    // F18 — buildPageNumbers (reference src/lib/utils.ts:160-172). Fixed
    // (page, total) inputs → VALUES golden; PropertySpec pins the
    // window-shape laws of the function itself.
    graft.QueryDef("f18_page_numbers", Some(
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), '1'),
        |  (CAST(2 AS BIGINT), '1|2|3|4|5'),
        |  (CAST(3 AS BIGINT), '1|2|3|4|5|6|...|10'),
        |  (CAST(4 AS BIGINT), '1|2|3|4|5|6|...|10'),
        |  (CAST(5 AS BIGINT), '1|...|5|6|7|8|9|10'),
        |  (CAST(6 AS BIGINT), '1|...|48|49|50|51|52|...|100')
        |) AS t(id, pages)""".stripMargin))((s, d) => {
      import s.implicits._
      Seq((1L, 1, 1), (2L, 1, 5), (3L, 4, 10), (4L, 1, 10), (5L, 10, 10), (6L, 50, 100))
        .toDF("id", "page", "total")
        .select(col("id"), concat_ws("|",
          Udfs.buildPageNumbers(col("page"), col("total"))).as("pages"))
    }),

    // F8 — formatDate en-US long/short renders with '--' fallback. Only
    // the ISO-day branch of parseDateLocal is modeled (the reference's JS
    // `new Date(value)` free-parse fallback, utils.ts:100, is a JS-engine
    // behavior no SQL engine reproduces; normalized ingest dates are ISO).
    graft.QueryDef("f8_format_date", Some(
      s"""SELECT id,
         |  CASE WHEN regexp_matches(raw, '^\\d{4}-\\d{2}-\\d{2}$$')
         |    THEN strftime(CAST(raw AS DATE), '%B %-d, %Y') ELSE '--' END AS long_fmt,
         |  CASE WHEN regexp_matches(raw, '^\\d{4}-\\d{2}-\\d{2}$$')
         |    THEN strftime(CAST(raw AS DATE), '%b %-d, %Y') ELSE '--' END AS short_fmt
         |FROM ${sql1(rawDates.map { case (i, v) => i -> v.map(_.trim) }, "raw")}""".stripMargin))((s, d) => {
      val iso = col("raw").rlike("^\\d{4}-\\d{2}-\\d{2}$")
      df1(s, rawDates.map { case (i, v) => i -> v.map(_.trim) }, "raw").select(col("id"),
        when(iso, date_format(to_date(col("raw")), "MMMM d, yyyy")).otherwise("--").as("long_fmt"),
        when(iso, date_format(to_date(col("raw")), "MMM d, yyyy")).otherwise("--").as("short_fmt"))
    })
  )
}
