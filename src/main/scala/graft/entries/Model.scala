package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.SqlLit

/** The reference's row type — migrations/0001_init.sql:1-17 /
  * src/lib/types.ts:4. Dates are ISO strings with parse-on-use semantics
  * (SURVEY §1.2): invalid dates are NULL at ingest, diffDays applies the
  * -1 rules downstream. */
final case class Entry(
    id: Long,
    agency: String,
    organization: Option[String],
    first_name: Option[String],
    middle_name: Option[String],
    last_name: Option[String],
    request_date: Option[String],
    completion_date: Option[String],
    entry_date: Option[String],
    fee: Option[String],
    is_amended: Int,
    subject: Option[String],
    details: Option[String],
    resolution: Option[String],
    response: Option[String])

/** Fixture corpus + corrections overlay (FIXTURES.md family A): one Scala
  * value rendered into both the Spark DataFrame and the oracle's VALUES
  * clause. Covers alias variants, typo agencies, Mc-names, WV tokens,
  * doubled apostrophes, null/invalid/future dates, junk fees, accented
  * FTS text, and the full resolution spectrum. */
object Fixture {

  /** Deterministic stand-in for the reference's hidden `new Date()`. */
  val AsOf = "2025-06-01"
  val AsOfYear = 2025

  /** Agency alias groups — shape of corrections.json `agencies`
    * (reference src/data/corrections.json, loader corrections.ts:17-24). */
  val aliasGroups: Seq[(String, Seq[String])] = Seq(
    "Department of Environmental Protection" -> Seq("DEP", "WV Dep"),
    "West Virginia State Police" -> Seq("WVSP"),
    "Office of the Governor" -> Seq("Governor's Office"))

  /** Per-id date patches — shape of corrections.json `entries`. */
  val dateCorrections: Seq[(Long, Option[String], Option[String])] = Seq(
    (3L, Some("2025-02-24"), None),
    (12L, None, Some("2025-03-01")),
    (17L, Some("2025-01-05"), Some("2025-01-20")))

  /** Organization remaps — corrections.json `organizations`. */
  val orgCorrections: Seq[(String, String)] = Seq(
    "ACLU-WV" -> "ACLU of West Virginia")

  private def e(id: Long, agency: String, org: String = null, first: String = null,
                middle: String = null, last: String = null, req: String = null,
                comp: String = null, ent: String = null, fee: String = null,
                amended: Int = 0, subject: String = null, details: String = null,
                resolution: String = null, response: String = null): Entry =
    Entry(id, agency, Option(org), Option(first), Option(middle), Option(last),
      Option(req), Option(comp), Option(ent), Option(fee), amended,
      Option(subject), Option(details), Option(resolution), Option(response))

  val entries: Seq[Entry] = Seq(
    e(1, "Department of Environmental Protection", org = "ACLU-WV",
      req = "2025-05-10", comp = "2025-05-20", ent = "2025-05-21", fee = "$25.00",
      subject = "water quality records", details = "All permits for Kanawha river",
      resolution = "Granted", response = "Records provided"),
    e(2, "DEP", first = "Jane", last = "Doe",
      req = "2025-05-01", comp = "2025-05-15", ent = "2025-05-16", fee = "0",
      subject = "air monitoring data", resolution = "Granted in part"),
    e(3, "WV Dep", first = "Sam", last = "Smith",
      req = "2025-01-01", comp = "2025-03-10", ent = "2025-03-11", fee = "$1,250.00",
      subject = "mining violation notices", resolution = "Exempted"),
    e(4, "Departmint of Health", org = "Health Watch",
      req = "2025-04-02", comp = "2025-04-01", ent = "2025-04-03",
      subject = "inspection reports café", resolution = "Rejected"),
    e(5, "Department of Health", first = "Ana", middle = "M", last = "García",
      req = "2025-03-15", comp = null, ent = "2025-03-16", fee = "fee pending",
      subject = "vaccination statistics", resolution = null),
    e(6, "Tcity of Morgantown", first = "Bob", last = "Lee",
      req = "2025-02-10", comp = "2025-02-20", ent = "2025-02-21", fee = "15",
      subject = "police budget spark", resolution = "Granted"),
    e(7, "City  of   Morgantown", org = "Local News LLC",
      req = "2024-12-01", comp = "2025-01-10", ent = "2025-01-11", fee = "25 (waived)",
      subject = "zoning board minutes", resolution = "Granted"),
    e(8, "McDowell County Sheriff's Office", first = "Cara", last = "O'Neil",
      req = "2025-05-25", comp = "2026-01-15", ent = "2025-05-26",
      subject = "incident reports Straße", resolution = ""),
    e(9, "MCDOWELL COUNTY SHERIFF''S OFFICE", org = "Court Watch",
      req = "2024-06-15", comp = "2024-07-30", ent = "2024-07-31", fee = "$5",
      subject = "jail logs", resolution = "Granted in part"),
    e(10, "wv state police", first = "Dan", last = "Reyes",
      req = "2025-05-28", comp = "2025-05-30", ent = "2025-05-31", fee = "0",
      amended = 1, subject = "traffic stop data", resolution = "Granted"),
    e(11, "WVSP", org = "Transparency Project",
      req = "2025-04-20", comp = null, ent = "2025-04-21",
      subject = "body camera footage", resolution = "No Responsive Documents"),
    e(12, "West Virginia State Police", first = "Eve", last = "Hall",
      req = "2025-02-14", comp = "2025-02-10", ent = "2025-02-15", fee = "$100",
      subject = "training manuals", resolution = "Rejected"),
    e(13, "Office of the Governor", org = "Press Corps",
      req = "2025-05-05", comp = "2025-05-06", ent = "2025-05-07",
      subject = "schedule and calendar", resolution = "Granted"),
    e(14, "Governor's Office", first = "Finn", last = "Berg",
      req = "2025-03-01", comp = "2025-03-20", ent = "2025-03-21", fee = "$0.00",
      subject = "email correspondence spark window", resolution = "Exempted"),
    e(15, "governors office", org = "ACLU-WV",
      req = "2024-11-11", comp = "2024-12-24", ent = "2024-12-26",
      subject = "travel expenses", resolution = "Granted"),
    e(16, "Department of Education", first = "Gus", last = "Diaz",
      req = null, comp = "2025-01-15", ent = "2025-01-16",
      subject = "curriculum review", resolution = "Granted"),
    e(17, "Department of Education", org = "Parents United",
      req = "2025-04-15", comp = "2025-04-18", ent = "2025-04-19", fee = "250",
      subject = "school closure plans", resolution = "Granted in part"),
    e(18, "dept of education", first = "Hana", last = "Kim",
      req = "2025-05-18", comp = "2025-05-29", ent = "2025-05-30",
      subject = "budget spreadsheets", resolution = "Granted"),
    e(19, "Secretary of State", org = "Election Integrity Now",
      req = "2025-05-30", comp = null, ent = "2025-05-31",
      subject = "voter roll maintenance", resolution = null),
    e(20, "Secretary of State", first = "Ian", last = "Poe",
      req = "2025-03-03", comp = "2025-03-17", ent = "2025-03-18", fee = "$42.50",
      subject = "business filings", resolution = "Granted"),
    e(21, "Division of Highways", org = "Road Safety Org",
      req = "2024-09-01", comp = "2024-10-15", ent = "2024-10-16",
      subject = "bridge inspection records", resolution = "Exempted"),
    e(22, "Division of Highways", first = "Joy", last = "Wu",
      req = "2025-05-22", comp = "2025-05-27", ent = "2025-05-28", fee = "18",
      subject = "pothole complaints", resolution = "Granted"),
    e(23, "Kanawha County Commission", first = "Kai", last = "Ford",
      req = "2025-01-20", comp = "2025-02-05", ent = "2025-02-06",
      subject = "meeting minutes", resolution = "Rejected"),
    e(24, "kanawha county commission", org = "Civic League",
      req = "2025-05-12", comp = "2025-05-19", ent = "2025-05-20", fee = "$7.25",
      subject = "contract awards", resolution = "Granted"),
    e(25, "Department of Environmental Protection", first = "Lia", last = "Chen",
      req = "2025-05-26", comp = null, ent = "2025-05-27",
      subject = "permit applications window", resolution = ""),
    e(26, "DEP", org = "River Keepers",
      req = "2024-08-10", comp = "2024-08-25", ent = "2024-08-26", fee = "30",
      subject = "discharge monitoring reports", resolution = "Granted"))

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.createDataset(entries).toDF()
  }

  /** The corpus as a DuckDB VALUES clause (row 1 is fully non-null so
    * DuckDB's type inference never sees a NULL-first column). */
  val entriesSql: String = SqlLit.values(
    entries.map(x => Seq[Any](x.id, x.agency, x.organization, x.first_name,
      x.middle_name, x.last_name, x.request_date, x.completion_date,
      x.entry_date, x.fee, x.is_amended, x.subject, x.details, x.resolution,
      x.response)),
    "e",
    Seq("id", "agency", "organization", "first_name", "middle_name", "last_name",
      "request_date", "completion_date", "entry_date", "fee", "is_amended",
      "subject", "details", "resolution", "response"))

  val correctionsSql: String = SqlLit.values(
    dateCorrections.map(c => Seq[Any](c._1, c._2, c._3)),
    "corr", Seq("id", "req_fix", "comp_fix"))

  /** Canonical identity of every distinct raw agency in the corpus,
    * computed once with the exact reference semantics (typo fixes, alias
    * match, titlify, slugify — graft.functions.Text). Rendered as the
    * oracle's lookup table; the Spark side recomputes it through the UDF
    * so the oracle genuinely checks the UDF's output. Note identity runs
    * on the apostrophe-cleaned agency (applyCorrections,
    * corrections.ts:76-80). */
  val identityMap: Seq[(String, String, String)] = {
    import graft.functions.Text
    entries.map(_.agency).distinct.map { raw =>
      val cleaned = raw.replaceAll("'{2,}", "'")
      val (name, slug) = Text.agencyIdentity(cleaned, aliasGroups)
      (raw, name, slug)
    }
  }

  val identitySql: String = SqlLit.values(
    identityMap.map(t => Seq[Any](t._1, t._2, t._3)),
    "ident", Seq("raw_agency", "name", "slug"))
}
