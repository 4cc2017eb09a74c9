package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Sorts, limits, and pagination — SURVEY.md §2.5. Null ordering is
  * explicit everywhere (SQLite treats NULL as smallest: first under ASC,
  * last under DESC — reference src/lib/utils.ts:3-9 inherits that), and
  * every LIMIT sits on a total order with a unique tiebreaker so the
  * selected row SET is deterministic across partitionings.
  */
object StarSorts extends graft.QueryModule {

  def defs: Seq[graft.QueryDef] = Seq(

    // O1 — sort-key dispatch on a corrected, nullable date:
    // `request_date DESC` with SQLite's NULLS-LAST-under-DESC semantics
    // (reference src/lib/db/entries.ts:65-85). A synthetic NULL stripe
    // (every 7th key) exercises the null ordering; o_orderkey breaks ties.
    graft.QueryDef("o1_sort_dispatch", Some(
      """SELECT o_orderkey, CAST(sort_date AS VARCHAR) AS sort_date FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE CAST(o_orderdate AS DATE) END AS sort_date
        |  FROM orders
        |  ORDER BY sort_date DESC NULLS LAST, o_orderkey ASC
        |  LIMIT 100)""".stripMargin))((s, d) => {
      val sortDate = when(col("o_orderkey") % 7 === 0, lit(null).cast(DateType))
        .otherwise(col("o_orderdate").cast(DateType))
      Tables.orders(s, d)
        .select(col("o_orderkey"), sortDate.as("sort_date"))
        .orderBy(col("sort_date").desc_nulls_last, col("o_orderkey").asc)
        .limit(100)
        .select(col("o_orderkey"), col("sort_date").cast(StringType).as("sort_date"))
    }),

    // O1b — highest_fee sort: SQLite `CAST(fee AS INTEGER) DESC`
    // (reference src/lib/utils.ts:8). Double→int casts round differently
    // across engines, so the integer view is floor() on both sides.
    graft.QueryDef("o1_fee_sort", Some(
      """SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS fee_int
        |FROM orders
        |ORDER BY fee_int DESC NULLS LAST, o_orderkey ASC
        |LIMIT 100""".stripMargin))((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          floor(col("o_totalprice")).cast(LongType).as("fee_int"))
        .orderBy(col("fee_int").desc_nulls_last, col("o_orderkey").asc)
        .limit(100)),

    // O2 — LIMIT/OFFSET pagination with page clamping (reference counts,
    // clamps page into [1,totalPages], then offsets:
    // src/lib/db/entries.ts:102-116). Two actions like the reference's two
    // SQLite round-trips: a count to clamp the requested page (99999 →
    // last page), then ORDER BY + OFFSET + LIMIT — which plans to ONE
    // TakeOrderedAndProject (per-partition heaps of offset+limit rows,
    // bounded driver merge), never a global single-partition row_number
    // sort. Arbitrary depth at 100 TB uses the keyed cursor instead
    // (`WHERE key > last` — Engine.listEntriesAfter / o5_topn pattern).
    graft.QueryDef("o2_offset_page", Some(
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey,
        |    row_number() OVER (ORDER BY o_orderkey) AS rn,
        |    count(*) OVER () AS total
        |  FROM orders)
        |SELECT o_orderkey, o_custkey FROM w
        |WHERE rn > (LEAST(GREATEST(CAST(ceil(total / 50.0) AS BIGINT), 1), 99999) - 1) * 50
        |  AND rn <= LEAST(GREATEST(CAST(ceil(total / 50.0) AS BIGINT), 1), 99999) * 50""".stripMargin))((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val totalPages = math.max(math.ceil(o.count() / 50.0).toLong, 1L)
      val page = math.min(math.max(99999L, 1L), totalPages).toInt
      o.orderBy(col("o_orderkey").asc).offset((page - 1) * 50).limit(50)
    }),

    // O3 — comparator sorts over aggregated stats (agencies page
    // most_requests, src/lib/db/agencies.ts:31-36): agg then top-10 with
    // a unique tiebreak.
    graft.QueryDef("o3_comparator_sort", Some(
      """SELECT c_nationkey, count(*) AS customers FROM customer
        |GROUP BY c_nationkey
        |ORDER BY customers DESC, c_nationkey ASC
        |LIMIT 10""".stripMargin))((s, d) =>
      Tables.customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("customers"))
        .orderBy(col("customers").desc, col("c_nationkey").asc)
        .limit(10)),

    // O4 — custom-rank sort: fixed rank list then lexicographic
    // (resolution facet ordering, reference src/lib/utils.ts:19-31).
    graft.QueryDef("o4_custom_rank", Some(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
        |    WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
        |    WHEN '5-LOW' THEN 4 ELSE 9007199254740991 END AS BIGINT) AS rank
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY rank ASC, o_orderpriority ASC""".stripMargin))((s, d) => {
      val rank = when(col("o_orderpriority") === "1-URGENT", 0L)
        .when(col("o_orderpriority") === "2-HIGH", 1L)
        .when(col("o_orderpriority") === "3-MEDIUM", 2L)
        .when(col("o_orderpriority") === "4-NOT SPECIFIED", 3L)
        .when(col("o_orderpriority") === "5-LOW", 4L)
        .otherwise(9007199254740991L)
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rank", rank)
        .orderBy(col("rank").asc, col("o_orderpriority").asc)
    }),

    // O5 — top-N slice (RSS feed head, src/pages/entries/feed.xml.ts:11):
    // TakeOrderedAndProject, no global sort materialization.
    graft.QueryDef("o5_topn", Some(
      """SELECT o_orderkey, CAST(order_date AS VARCHAR) AS order_date FROM (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders
        |  ORDER BY order_date DESC, o_orderkey DESC
        |  LIMIT 200)""".stripMargin))((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("order_date"))
        .orderBy(col("order_date").desc, col("o_orderkey").desc)
        .limit(200)
        .select(col("o_orderkey"), col("order_date").cast(StringType).as("order_date"))),

    // O6 — `ORDER BY id DESC` snapshot of the latest reported date
    // (latestEntriesByLastReportedDate, src/lib/db/entries.ts:152-178):
    // scalar-subquery max then an equality filter.
    graft.QueryDef("o6_snapshot_sort", Some(
      """SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date FROM orders
        |WHERE CAST(o_orderdate AS DATE) = (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)
        |ORDER BY o_orderkey DESC""".stripMargin))((s, d) => {
      val o = Tables.orders(s, d)
      // The scalar subquery stays in the plan as a broadcast 1-row join —
      // no driver-side head() materialization.
      val maxDf = o.agg(max(col("o_orderdate").cast(DateType)).as("max_date"))
      o.select(col("o_orderkey"), col("o_orderdate").cast(DateType).as("order_date"))
        .join(broadcast(maxDf), col("order_date") === col("max_date"))
        .select(col("o_orderkey"), col("order_date").cast(StringType).as("order_date"))
        .orderBy(col("o_orderkey").desc)
    }),

    // O7 — per-group top-k via the typed TopKAggregator (SURVEY §2.10):
    // bounded partial/merge buffers, shuffle O(groups*k) — vs the window
    // row_number formulation (the oracle) which sorts every group fully.
    graft.QueryDef("o7_topk_agg", Some(
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin))((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .as[(String, Long, Double)]
      ds.groupByKey(_._1)
        .agg(new graft.functions.TopKAggregator(3).toColumn)
        .flatMap { case (prio, top) => top.map(t => (prio, t._1, t._2)) }
        .toDF("o_orderpriority", "o_orderkey", "o_totalprice")
    })
  )
}
