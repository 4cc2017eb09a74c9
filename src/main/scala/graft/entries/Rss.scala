package graft.entries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** RSS document assembly (reference buildRssDocument + parseFeedDate,
  * src/lib/rss.ts:32-66) as reusable column transforms, shared by the
  * site-wide feed (src/pages/entries/feed.xml.ts) and the per-agency
  * feed (src/pages/agencies/[slug]/feed.xml.ts).
  *
  * Scale shape: per-item XML is map-side scalar work; the ordered
  * item concatenation is an aggregation over the bounded FEED_LIMIT
  * slice (sorted collect_list), so only <=limit strings ever reach the
  * final row.
  */
object Rss {

  /** ISO day-string guard — the branch of parseFeedDate this engine
    * models (rss.ts:34-39; the JS free-parse fallback is a JS-engine
    * behavior, and ingest dates are normalized ISO). */
  def isIso(c: Column): Column = c.rlike("^\\d{4}-\\d{2}-\\d{2}$")

  /** formatDate(value, short=true) (utils.ts:102-109): '--' for
    * null/empty/non-ISO, else "MMM d, yyyy". */
  def fdShort(c: Column): Column =
    when(c.isNotNull && c =!= "" && isIso(c), date_format(to_date(c), "MMM d, yyyy"))
      .otherwise("--")

  /** parseFeedDate(iso).toUTCString(): the day at UTC noon, RFC1123. */
  def rfc1123Noon(c: Column): Column =
    concat(date_format(to_timestamp(c) + expr("INTERVAL 12 HOURS"),
      "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT"))

  /** `${subject or "No subject"}` (both feed routes). */
  def subjectOrDefault: Column =
    when(col("subject").isNull || col("subject") === "", "No subject")
      .otherwise(col("subject"))

  /** Item description shared by both feeds: short-format dates +
    * resolution with '--' defaults. */
  def itemDescription: Column = Cols.escapeXml(concat(
    lit("Request: "), fdShort(col("request_date")),
    lit(". Completed: "), fdShort(col("completion_date")),
    lit(". Resolution: "),
    when(col("resolution").isNull || col("resolution") === "", "--")
      .otherwise(col("resolution")),
    lit(".")))

  /** pubDate source: entry_date ?? completion_date ?? request_date
    * (null-coalescing, both feed routes). */
  def pubDateSource: Column =
    coalesce(col("entry_date"), col("completion_date"), col("request_date"))

  /** One `<item>` element; `title` and `guid` are the per-feed knobs.
    * maybeTag semantics: pubDate is omitted when the source date is
    * absent or non-ISO (parseFeedDate -> null). */
  def itemXml(title: Column, guid: Column): Column = {
    val link = concat(lit("https://example.org/entries/"), col("id").cast("string"))
    concat(
      lit("<item><title>"), Cols.escapeXml(title),
      lit("</title><link>"), link,
      lit("</link><guid isPermaLink=\"false\">"), guid,
      lit("</guid><description>"), itemDescription,
      lit("</description>"),
      when(pubDateSource.isNotNull && isIso(pubDateSource),
        concat(lit("<pubDate>"), rfc1123Noon(pubDateSource), lit("</pubDate>")))
        .otherwise(""),
      lit("</item>"))
  }

  /** Ordered id-DESC concatenation of an `item_xml` column — an
    * aggregate expression over (id, item_xml) rows. */
  def itemsConcat: Column =
    array_join(transform(
      reverse(array_sort(collect_list(struct(col("id"), col("item_xml"))))),
      x => x.getField("item_xml")), "")

  /** The complete document around pre-aggregated `items_xml` +
    * `build_src` (the lastBuildDate source day) columns. Channel title,
    * link, and description are per-feed columns (escaped here). */
  def document(channelTitle: Column, channelLink: String,
               channelDescription: Column): Column = concat(
    lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?><rss version=\"2.0\"><channel><title>"),
    Cols.escapeXml(channelTitle),
    lit(s"</title><link>$channelLink</link><description>"),
    Cols.escapeXml(channelDescription),
    lit("</description><language>en-us</language>"),
    when(col("build_src").isNotNull && isIso(col("build_src")),
      concat(lit("<lastBuildDate>"), rfc1123Noon(col("build_src")),
        lit("</lastBuildDate>"))).otherwise(""),
    coalesce(col("items_xml"), lit("")),
    lit("</channel></rss>"))

  /** The per-agency feed (agencies/[slug]/feed.xml.ts): newest-entry
    * slice of the agency's alias-scoped rows, title without the agency
    * prefix, slug-qualified guids, lastBuildDate from the FIRST entry
    * of the slice (max id). */
  def agencyFeed(entries: DataFrame, canonicalName: String, slug: String,
                 aliasCandidates: Seq[String], limit: Int = 100): DataFrame = {
    val scoped = entries
      .where(lower(col("agency")).isin(aliasCandidates.map(_.toLowerCase): _*))
      .orderBy(col("id").desc).limit(limit)
    val item = itemXml(
      title = concat(subjectOrDefault, lit(" (#"), col("id").cast("string"), lit(")")),
      guid = concat(lit(s"agency-$slug-entry-"), col("id").cast("string")))
    // The reference reads the FIRST entry's date even when it is null
    // (feed route line 59's ?? chain on entries[0]); max_by would skip a
    // null at the max id and fall back to an older row — struct-max
    // carries the max-id row's value verbatim, null included.
    val agg = scoped
      .select(col("id"), pubDateSource.as("pub_src"), item.as("item_xml"))
      .agg(max(struct(col("id"), col("pub_src"))).getField("pub_src").as("build_src"),
        itemsConcat.as("items_xml"))
    agg.select(document(
      channelTitle = lit(s"$canonicalName - wvfoia entries"),
      channelLink = s"https://example.org/agencies/$slug",
      channelDescription = lit(s"Newest WVFOIA entries for $canonicalName."))
      .as("rss_xml"))
  }
}
