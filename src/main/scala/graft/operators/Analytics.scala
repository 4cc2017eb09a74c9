package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Event-stream analytics beyond sessionization (e1) and drift (e3):
  * the ordered-funnel and cohort-retention shapes every product/usage
  * pipeline runs over its event table, plus the SCD Type-2 history
  * view of the CDC changelog (the warehouse-side completion of s11's
  * last-writer-wins apply — reference analog: the sync loop's
  * versioned upserts, entries updated in place per
  * /root/reference/src/lib/sync.ts with only the latest revision
  * served; SCD2 is what a warehouse keeps when it must answer "what
  * did this row say between revisions" instead).
  *
  * Scale shape (all three): every aggregation keys on user_id or the
  * natural entity key — one hash-partition chain a 1000-executor
  * cluster spreads evenly (user_id is high-cardinality and unskewed);
  * each funnel stage STRICTLY SHRINKS the frame before the next join,
  * and the final outputs are O(stages), O(weeks²), and O(keys) — never
  * O(events) — so nothing here collects or re-shuffles the raw stream
  * twice.
  */
object AnalyticsQueries extends graft.QueryModule {

  private lazy val streamRoot: String = graft.util.TmpRoot("analytics-incr")
  private def dirTag(d: String): String = d.replaceAll("[^a-zA-Z0-9]", "_")

  /** Shared by e5 (batch) and e5b (streaming-partials twin): weekly
    * cohort retention triangle. */
  private val e5OracleSql: String =
    """WITH first_seen AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
      |  FROM events GROUP BY 1)
      |SELECT CAST(f.cw AS VARCHAR) AS cohort_week,
      |  CAST(datediff('day', f.cw, CAST(date_trunc('week', e.ts) AS DATE)) // 7
      |    AS BIGINT) AS week_offset,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM events e JOIN first_seen f ON f.user_id = e.user_id
      |GROUP BY 1, 2""".stripMargin

  /** Ordered view→click→purchase funnel over an events frame with
    * (user_id, event_type, ts). Exposed for direct testing of the
    * ordering constraint on synthetic streams. */
  def funnel(events: DataFrame, windowHours: Option[Int] = None): DataFrame = {
    // Conversion window: stage N counts only within `windowHours` of
    // the stage-N-1 entry (None = unbounded, the e4 semantics). The
    // bound composes with the ordering constraint in the same
    // post-join filter, so the join/agg shape — and its scale
    // behavior — is unchanged.
    def inWindow(ts: Column, from: Column): Column = windowHours match {
      case Some(h) => ts >= from && ts <= from + expr(s"INTERVAL $h HOURS")
      case None    => ts >= from
    }
    val e = events.select("user_id", "event_type", "ts")
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(inWindow(col("ts"), col("t1")))
      .groupBy("user_id").agg(min(col("t1")).as("t1"), min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c.select("user_id", "t2"), Seq("user_id"))
      .where(inWindow(col("ts"), col("t2")))
      .groupBy("user_id").agg(min(col("t2")).as("t2"), min(col("ts")).as("t3"))
    // Sum the BIGINT microsecond deltas through DECIMAL(38,0) and cast
    // back — Spark's LongType sum wraps silently without ANSI mode while
    // the DuckDB oracle sums into HUGEINT, so the decimal accumulator is
    // what keeps the two engines value-identical at extreme event counts.
    // The cast back is guarded: a non-ANSI Decimal→Long cast returns
    // NULL on overflow, which a bare coalesce would silently turn into
    // 0 in exactly the extreme-count regime the accumulator exists for.
    // DuckDB's CAST(HUGEINT AS BIGINT) errors on overflow, so the
    // loud-failure branch is also the behavior-matching one.
    def row(stage: String, frame: DataFrame, lag: org.apache.spark.sql.Column) = {
      val dec = sum(lag.cast(DecimalType(38, 0)))
      val lagUs = when(dec.isNull, lit(0L))
        .when(dec.between(lit(Long.MinValue), lit(Long.MaxValue)), dec.cast(LongType))
        .otherwise(raise_error(concat(
          lit("total_lag_us overflows BIGINT: "), dec.cast(StringType))).cast(LongType))
      frame.agg(count(lit(1)).as("n_users"), lagUs.as("total_lag_us"))
        .select(lit(stage).as("stage"), col("n_users"), col("total_lag_us"))
    }
    row("1_view", v, lit(0L))
      .unionByName(row("2_click", c,
        unix_micros(col("t2")) - unix_micros(col("t1"))))
      .unionByName(row("3_purchase", p,
        unix_micros(col("t3")) - unix_micros(col("t2"))))
  }

  /** The cohort-retention triangle from its two normalized inputs:
    * `firstSeen` (user_id, cw: DATE — Monday of the user's first
    * event) and `userWeeks` (user_id, wk: DATE — Monday of an active
    * week; duplicates fine, countDistinct dedups). Shared by the batch
    * e5 query and the streaming read path (Streams.readCohortRetention)
    * so batch/stream equivalence holds by construction, the e1–e3
    * discipline. One user_id join + one O(weeks²) agg. */
  def cohortTriangle(firstSeen: DataFrame, userWeeks: DataFrame): DataFrame =
    userWeeks.join(firstSeen, Seq("user_id"))
      .select(col("cw").cast(StringType).as("cohort_week"),
        expr("datediff(wk, cw) div 7").cast(LongType).as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Growth accounting over an events frame with (user_id, ts): weekly
    * NEW / RETAINED / RESURRECTED / CHURNED counts (see the e7 QueryDef
    * for semantics and scale shape). Exposed for direct testing of the
    * classification and churn-boundary rules on synthetic streams. */
  def growthAccounting(events: DataFrame): DataFrame =
    growthFromUserWeeks(events
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct())

  /** The growth rollup from an already-distinct (user_id, wk: Monday
    * DATE) activity frame — shared with the streaming read path
    * (Streams.readGrowthAccounting), which feeds it the SAME
    * (user, week) sufficient statistic the e5 cohort partials carry,
    * so batch/stream equivalence holds by construction (the
    * cohortTriangle discipline). */
  def growthFromUserWeeks(userWeeks: DataFrame): DataFrame = {
    val uw = userWeeks.select("user_id", "wk").distinct()
    val w = Window.partitionBy("user_id").orderBy(col("wk"))
    val m = uw
      .withColumn("prev", lag(col("wk"), 1).over(w))
      .withColumn("nxt", lead(col("wk"), 1).over(w))
    val bounds = uw.agg(min(col("wk")).as("w0"), max(col("wk")).as("w1"))
    val spine = bounds
      .select(explode(expr("sequence(w0, w1, interval 7 day)")).as("wk"))
    val act = m.groupBy("wk").agg(
      count(when(col("prev").isNull, 1)).as("n_new"),
      count(when(datediff(col("wk"), col("prev")) === 7, 1)).as("n_retained"),
      count(when(datediff(col("wk"), col("prev")) > 7, 1)).as("n_resurrected"))
    val chn = m.join(broadcast(bounds))
      .where((col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7) &&
        date_add(col("wk"), 7) <= col("w1"))
      .select(date_add(col("wk"), 7).as("wk"))
      .groupBy("wk").agg(count(lit(1)).as("n_churned"))
    spine.join(act, Seq("wk"), "left_outer")
      .join(chn, Seq("wk"), "left_outer")
      .select(col("wk").cast(StringType).as("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** The DAU/WAU/MAU rollup from an already-distinct (user_id, day:
    * DATE) activity frame — shared by the batch e6 query and the
    * streaming read path (Streams.readActiveUsers), which feeds it the
    * distinct pairs of the incremental (user, day) rollup, so
    * batch/stream equivalence holds by construction (the
    * cohortTriangle / growthFromUserWeeks discipline). */
  def activeUsersFromDays(userDays: DataFrame): DataFrame = {
    val uday = userDays.select("user_id", "day").distinct()
    val spine = uday.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    // A (user, day) activity contributes to window days day..day+w-1
    // — u ∈ window(d) ⟺ u.day ∈ [d-w+1, d] — turning the range join
    // into equality keys.
    def rolling(w: Int, name: String) =
      uday.select(col("user_id"),
          explode(expr(s"sequence(day, date_add(day, ${w - 1}), interval 1 day)"))
            .as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as(name))
    val dau = uday.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    spine.join(dau, Seq("day"), "left_outer")
      .join(rolling(7, "wau"), Seq("day"), "left_outer")
      .join(rolling(30, "mau"), Seq("day"), "left_outer")
      .select(col("day").cast(StringType).as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
  }

  /** The e8 decayed-activity rollup from per-(user, day) event COUNTS
    * (user_id, day: DATE, cnt) — count partials are merge-associative,
    * so the streaming path re-sums its per-batch partials and lands
    * here (Streams.readDecayedActivity); the batch e8 query reduces
    * raw events to the same frame first. Weights stay exact dyadic
    * integers; cnt multiplies the weight in integer space. */
  def decayedFromDayCounts(dayCounts: DataFrame): DataFrame = {
    val e = dayCounts.groupBy("user_id", "day").agg(sum(col("cnt")).as("cnt"))
    val asof = e.agg(max(col("day")).as("anchor"))
    val dec = sum((col("cnt") * col("w1")).cast(DecimalType(38, 0)))
    val scaled = when(dec.between(lit(Long.MinValue), lit(Long.MaxValue)),
      dec.cast(LongType))
      .otherwise(raise_error(concat(
        lit("decayed_scaled overflows BIGINT: "),
        dec.cast(StringType))).cast(LongType))
    e.join(broadcast(asof))
      .withColumn("w1", expr(
        "shiftleft(1L, cast(30 - least(datediff(anchor, day) div 7, 30) as int))"))
      .groupBy("user_id")
      .agg(sum(col("cnt")).as("n_events"),
        max(col("day")).cast(StringType).as("last_day"),
        scaled.as("decayed_scaled"))
      .select(col("user_id"), col("n_events"), col("last_day"),
        col("decayed_scaled"),
        (col("decayed_scaled").cast(DoubleType) / 1073741824.0)
          .as("decayed_score"))
  }

  /** Last-touch attribution over an events frame with (user_id, ts,
    * event_id, event_type) — see the e11 QueryDef for semantics.
    * Exposed for direct testing of the lookback boundary and the
    * same-timestamp tiebreak on synthetic streams. */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isChan = col("event_type").isin("view", "click")
    val m = events
      .withColumn("last_chan",
        last(when(isChan, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("last_ts",
        last(when(isChan, col("ts")), ignoreNulls = true).over(w))
    m.where(col("event_type") === "purchase")
      .select(coalesce(
        when(col("last_ts") >= col("ts") - expr("INTERVAL 7 DAYS"),
          col("last_chan")), lit("none")).as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_purchases"))
  }

  /** e13's final stage over a (event_type, day, c) daily-count frame —
    * SHARED between the batch query and the streaming read path
    * ([[graft.streaming.Streams.readRateAnomaly]]) so the two cannot
    * drift: daily counts are merge-associative, so a rollup re-summed
    * across micro-batches feeds this stage identically to one pass
    * over the raw events. */
  def rateAnomalyFromDailyCounts(dc: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val st = dc.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(col("c").cast(dec)).as("s"),
      sum((col("c") * col("c")).cast(dec)).as("sq"))
    val varNum = col("n_days").cast(dec) * col("sq") - col("s") * col("s")
    val zRaw = (col("c").cast(dec) * col("n_days").cast(dec) - col("s"))
      .cast(DoubleType) / sqrt(varNum.cast(DoubleType))
    val z = when(varNum === lit(0).cast(dec), lit(0.0).cast(DoubleType))
      .otherwise(round(zRaw * 1000000) / 1000000.0)
    dc.join(broadcast(st), Seq("event_type"))
      .select(col("event_type"), col("day").cast(StringType).as("day"),
        col("c"), z.as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 2.0)
  }

  /** e21's final stage over a (event_type, day, c) daily-count frame —
    * SHARED between the batch query and the streaming read path
    * ([[graft.streaming.Streams.readForecastBaseline]]): daily counts
    * are merge-associative, so the incremental rollup feeds the
    * identical calendar-correct day-over-week join. */
  def forecastBaselineFromDaily(daily: DataFrame): DataFrame = {
    val f = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("c").as("forecast"))
    daily.join(f, Seq("event_type", "day"))
      .select(col("event_type"), col("day").cast(StringType).as("day"),
        col("c").as("actual"), col("forecast"),
        abs(col("c") - col("forecast")).as("abs_err"))
  }

  /** e22's final stage over the same daily-count frame — SHARED with
    * [[graft.streaming.Streams.readWeekdayProfile]]: the day-of-week
    * re-aggregation of merged daily counts equals the one-pass
    * (type, dow) agg because counts are merge-associative. */
  def weekdayProfileFromDaily(daily: DataFrame): DataFrame = {
    val g = daily
      .groupBy(col("event_type"),
        (dayofweek(col("day")) - 1).cast(IntegerType).as("dow"))
      .agg(sum(col("c")).as("c"))
    val t = g.groupBy("event_type")
      .agg(sum(col("c")).as("total"), max(col("c")).as("mx"))
    g.join(broadcast(t), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("c"),
        (col("c").cast(DoubleType) / col("total")).as("share"),
        (col("c") === col("mx")).as("is_peak"))
  }

  /** a21's final stage over the same daily-count frame — SHARED with
    * [[graft.streaming.Streams.readDailyCorrelation]]: the co-movement
    * moments are sums over (day, pair) rows of the merged rollup. */
  def dailyCorrelationFromDaily(daily: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val a = daily.select(col("event_type").as("type_a"),
      col("day"), col("c").as("x"))
    val b = daily.select(col("event_type").as("type_b"),
      col("day"), col("c").as("y"))
    val st = a.join(b, Seq("day")).where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
    val nD = col("n_days").cast(dec)
    val num = nD * col("sxy") - col("sx") * col("sy")
    val denx = nD * col("sxx") - col("sx") * col("sx")
    val deny = nD * col("syy") - col("sy") * col("sy")
    st.where(col("n_days") >= 2 &&
        denx > lit(0).cast(dec) && deny > lit(0).cast(dec))
      .select(col("type_a"), col("type_b"), col("n_days"),
        (round(num.cast(DoubleType)
          / sqrt(denx.cast(DoubleType) * deny.cast(DoubleType))
          * 1000000) / 1000000.0).as("corr"))
  }

  /** e15's final stage over a (user_id, day) activity-pair frame —
    * SHARED between the batch query and the streaming read path
    * ([[graft.streaming.Streams.readPowerUserCurve]]): the histogram
    * depends only on the DISTINCT pair set, which is batch-split-
    * invariant (a pair appears iff the user was active that day,
    * regardless of which micro-batch saw it). */
  def powerUserCurve(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("user_id"))
      .agg(countDistinct(col("day")).as("active_days"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))

  /** e18's final stage over a (user_id, day) activity-pair frame —
    * SHARED between the batch query and the streaming read path
    * ([[graft.streaming.Streams.readUserStreaks]]): the gaps-and-
    * islands derivation depends only on the DISTINCT pair set, which
    * is batch-split-invariant, so the incremental (user, day) rollup
    * feeds the identical streak computation. */
  def userStreaks(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("day"))
    pairs.select(col("user_id"), col("day")).distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("best_streak"))
      .groupBy(col("best_streak"))
      .agg(count(lit(1)).as("n_users"))
  }

  def defs: Seq[graft.QueryDef] = Seq(

    // E4 — ORDERED event funnel (view → click → purchase): a user
    // counts at stage N only if stage N's earliest qualifying event is
    // at-or-after their stage-N-1 entry time — the ordering constraint
    // that a naive per-type count ignores (a purchase BEFORE first view
    // is attribution noise, not conversion). Each stage is one
    // min-aggregate on user_id joined forward; the frames shrink
    // monotonically, so at 100 TB the expensive join is the first one
    // and every later stage rides a smaller exchange. total_lag_us sums
    // EXACT BIGINT microsecond deltas (no float accumulation — the
    // Num.dsum discipline), so stage-to-stage latency is value-exact.
    graft.QueryDef("e4_event_funnel", Some(
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(v.t1) AS t1, min(e.ts) AS t2
        |  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(c.t2) AS t2, min(e.ts) AS t3
        |  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(0 AS BIGINT) AS total_lag_us FROM v
        |UNION ALL
        |SELECT '2_click', count(*),
        |  CAST(coalesce(SUM(epoch_us(t2) - epoch_us(t1)), 0) AS BIGINT) FROM c
        |UNION ALL
        |SELECT '3_purchase', count(*),
        |  CAST(coalesce(SUM(epoch_us(t3) - epoch_us(t2)), 0) AS BIGINT) FROM p""".stripMargin))(
      (s, d) => funnel(Tables.events(s, d))),

    // E9 — WINDOWED conversion funnel: e4's ordered view → click →
    // purchase with a 24-hour conversion window per stage — the form
    // marketing/product attribution actually uses ("converted within a
    // day"), where e4's unbounded variant answers "ever converted".
    // Same min-agg join chain and monotone frame shrinkage (the window
    // is one more predicate in the existing post-join filter, so the
    // scale shape is identical to e4); a stage's entry event must land
    // in [prev, prev + 24h], which both tightens counts and bounds
    // every lag at 24h·stage — the spec pins counts(e9) ≤ counts(e4)
    // and the lag ceiling.
    graft.QueryDef("e9_windowed_funnel", Some(
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(v.t1) AS t1, min(e.ts) AS t2
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |    AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOURS
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(c.t2) AS t2, min(e.ts) AS t3
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |    AND e.ts >= c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOURS
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(0 AS BIGINT) AS total_lag_us FROM v
        |UNION ALL
        |SELECT '2_click', count(*),
        |  CAST(coalesce(SUM(epoch_us(t2) - epoch_us(t1)), 0) AS BIGINT) FROM c
        |UNION ALL
        |SELECT '3_purchase', count(*),
        |  CAST(coalesce(SUM(epoch_us(t3) - epoch_us(t2)), 0) AS BIGINT) FROM p""".stripMargin))(
      (s, d) => funnel(Tables.events(s, d), windowHours = Some(24))),

    // E5 — weekly cohort retention: users bucket into the ISO week of
    // their FIRST event (one min-agg on user_id), and every later
    // active week counts them at its week offset — the retention
    // triangle. Week arithmetic stays integral end to end (Monday
    // truncation on both engines, day-diff of Mondays is exactly
    // divisible by 7), so no calendar float can drift the bucket edges.
    // The heavy step is the one user_id join of the stream against its
    // own first-seen frame; output is O(weeks²).
    graft.QueryDef("e5_cohort_retention", Some(e5OracleSql))((s, d) => {
      val e = Tables.events(s, d)
      val firstSeen = e.groupBy("user_id")
        .agg(to_date(date_trunc("week", min(col("ts")))).as("cw"))
      // cohortTriangle uses `div` (integral division), not `/` (true
      // division through Double) — the oracle floor-divides with
      // `// 7`, and the equivalence of round-trip-through-double must
      // hold by construction, not by the inputs happening to be exact.
      cohortTriangle(firstSeen,
        e.select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk")))
    }),

    // E5b — the SAME retention triangle through the STREAMING cohort
    // partials (Streams.incrementalCohortPartials) against e5's own
    // oracle — the e1b/e3b discipline applied to a rollup whose merge
    // is a re-MINIMIZATION, not a re-sum: the corpus splits mid
    // event-id range, so users' first-seen weeks span the two batches
    // and the read path's min-of-mins is genuinely exercised (a
    // last-writer-wins merge, or a rollup keyed on the wrong grain,
    // moves users into later cohorts and changes the triangle). The
    // triangle stage is the batch query's own cohortTriangle, so this
    // gate pins the MAINTENANCE, not the math.
    graft.QueryDef("e5b_retention_stream", Some(e5OracleSql))((s, d) => {
      val root = s"$streamRoot/${dirTag(d)}_cohort"
      val src = s"$root/src"; val roll = s"$root/rollup"
      val ckpt = s"$root/ckpt"
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val mid = ev.agg(expr(
        "min(event_id) + (max(event_id) - min(event_id)) div 2").as("m"))
        .head().getLong(0)
      graft.util.Chunks.add(ev.where(col("event_id") < mid), src, "c1.parquet")
      graft.streaming.Streams.incrementalCohortPartials(s, src, roll, ckpt)
      graft.util.Chunks.add(ev.where(col("event_id") >= mid), src, "c2.parquet")
      graft.streaming.Streams.incrementalCohortPartials(s, src, roll, ckpt)
      graft.streaming.Streams.readCohortRetention(s, roll)
    }),

    // E6 — rolling active users (DAU / WAU / MAU): the product-health
    // triple over the event stream. The scale-relevant choice is HOW
    // the rolling distinct is computed: a range join (spine day ⋈
    // events in [d-29, d]) re-scans every event ~30× through a
    // non-equi join, while the fan-out formulation explodes the
    // DISTINCT (user, day) frame — already ≪ events — by exactly the
    // window width into EQUALITY keys, so each rolling distinct is one
    // hash aggregation on (window-day) with bounded 7×/30× inflation
    // of the small frame, co-partitioned with the daily agg. Output is
    // one row per day in the observed range; days with no activity
    // still row (coalesced 0) — a gap in a health dashboard must be a
    // zero, not a missing row. The oracle replays it as the range
    // join, so the two formulations' equivalence is itself checked.
    graft.QueryDef("e6_active_users", Some(
      """WITH uday AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM uday),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM uday GROUP BY day),
        |wau AS (
        |  SELECT s.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
        |  FROM spine s JOIN uday u ON u.day BETWEEN s.day - 6 AND s.day
        |  GROUP BY s.day),
        |mau AS (
        |  SELECT s.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
        |  FROM spine s JOIN uday u ON u.day BETWEEN s.day - 29 AND s.day
        |  GROUP BY s.day)
        |SELECT CAST(s.day AS VARCHAR) AS day,
        |  coalesce(dau.dau, 0) AS dau,
        |  coalesce(wau.wau, 0) AS wau,
        |  coalesce(mau.mau, 0) AS mau
        |FROM spine s
        |LEFT JOIN dau ON dau.day = s.day
        |LEFT JOIN wau ON wau.day = s.day
        |LEFT JOIN mau ON mau.day = s.day""".stripMargin))((s, d) =>
      activeUsersFromDays(Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct())),

    // E7 — growth accounting (weekly user lifecycle): every active
    // (user, week) is classified NEW (no prior activity), RETAINED
    // (active the immediately preceding week) or RESURRECTED (a gap of
    // ≥2 weeks), and CHURNED rows at week w count users active in w-7
    // with no activity in w — the standard startup growth-accounting
    // identity (active(w) = new + retained + resurrected; churned(w) =
    // active(w-7) - retained(w)). The scale shape is ONE window over
    // the distinct (user, week) frame — already ≪ events — partitioned
    // by user_id (high-cardinality, unskewed), so lag/lead run without
    // any global sort; the per-week rollup is O(weeks) and the spine
    // left-joins zero-fill gap weeks (a dashboard gap must be a 0, not
    // a missing row). Churn at the final week + 7 is out of the
    // observation range and excluded via the 1-row broadcast bounds
    // join — weeks beyond max(wk) are unobservable, not zero.
    graft.QueryDef("e7_growth_accounting", Some(
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |m AS (
        |  SELECT user_id, wk,
        |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
        |    lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
        |  FROM uw),
        |b AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM uw),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(w0, w1, INTERVAL 7 DAY)) AS DATE) AS wk
        |  FROM b),
        |act AS (
        |  SELECT wk,
        |    CAST(count(*) FILTER (WHERE prev IS NULL) AS BIGINT) AS n_new,
        |    CAST(count(*) FILTER (WHERE datediff('day', prev, wk) = 7) AS BIGINT)
        |      AS n_retained,
        |    CAST(count(*) FILTER (WHERE datediff('day', prev, wk) > 7) AS BIGINT)
        |      AS n_resurrected
        |  FROM m GROUP BY 1),
        |chn AS (
        |  SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM m WHERE (nxt IS NULL OR datediff('day', wk, nxt) > 7)
        |    AND wk + 7 <= (SELECT w1 FROM b)
        |  GROUP BY 1)
        |SELECT CAST(s.wk AS VARCHAR) AS week,
        |  coalesce(a.n_new, 0) AS n_new,
        |  coalesce(a.n_retained, 0) AS n_retained,
        |  coalesce(a.n_resurrected, 0) AS n_resurrected,
        |  coalesce(c.n_churned, 0) AS n_churned
        |FROM spine s
        |LEFT JOIN act a ON a.wk = s.wk
        |LEFT JOIN chn c ON c.wk = s.wk""".stripMargin))((s, d) =>
      growthAccounting(Tables.events(s, d))),

    // E8 — half-life DECAYED activity score per user (the RFM-style
    // recency-weighted engagement feature): each event contributes
    // 2^(-age_weeks) with a one-week half-life, so recent activity
    // dominates and stale users decay toward 0. The determinism trick
    // makes it hash-gateable where exp-decay never could be: dyadic
    // weights ONLY — the per-event weight is the exact integer
    // 2^(30-k), k = min(age div 7, 30) (ages past 30 half-lives clamp
    // to the quantization floor), summed in integer space and divided
    // by 2^30 once at the end, so no float accumulates in any order.
    // asof = max event day (derived, never current_date — the Verify
    // gotcha), joined as a 1-row broadcast. One user_id hash agg over
    // map-side weights; O(users) output. The BIGINT sum rides the e4
    // decimal accumulator with the loud-overflow guard (weights reach
    // 2^30, so ~2^33 events could wrap a raw long).
    // (`anchor`, not `asof` — ASOF is a reserved word in the oracle's
    // SQL dialect and an unquoted alias fails to parse.)
    graft.QueryDef("e8_decayed_activity", Some(
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |a AS (SELECT max(e.day) AS anchor FROM e),
        |w AS (
        |  SELECT user_id, e.day,
        |    (CAST(1 AS BIGINT) <<
        |      CAST(30 - least(datediff('day', e.day, anchor) // 7, 30) AS INTEGER))
        |      AS ws
        |  FROM e, a)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(w.day) AS VARCHAR) AS last_day,
        |  CAST(SUM(ws) AS BIGINT) AS decayed_scaled,
        |  CAST(SUM(ws) AS DOUBLE) / 1073741824.0 AS decayed_score
        |FROM w GROUP BY 1""".stripMargin))((s, d) =>
      decayedFromDayCounts(Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt")))),

    // E11 — LAST-TOUCH ATTRIBUTION: every purchase credits the most
    // recent preceding channel event (view or click) within a 7-day
    // lookback, else 'none' — the standard marketing-attribution
    // assignment, and the event-stream application of the as-of-join
    // shape (j7) WITHOUT a join: one ignore-nulls running `last` over
    // the per-user (ts, event_id) order carries the latest channel and
    // its timestamp forward, so attribution is a map-side CASE on the
    // windowed frame — no self-join, no range join, one user_id
    // shuffle. The (ts, event_id) tiebreak makes a same-timestamp
    // channel event deterministically attributable; the lookback test
    // is pure timestamp arithmetic. O(channels) output.
    graft.QueryDef("e11_last_touch_attribution", Some(
      """WITH m AS (
        |  SELECT user_id, ts, event_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN event_type END IGNORE NULLS)
        |      OVER w AS last_chan,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN ts END IGNORE NULLS)
        |      OVER w AS last_ts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT coalesce(CASE WHEN last_ts >= ts - INTERVAL 7 DAY
        |    THEN last_chan END, 'none') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM m WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin))((s, d) =>
      lastTouchAttribution(Tables.events(s, d))),

    // E12 — event-type TRANSITION MATRIX (first-order Markov counts):
    // for every consecutive event pair in a user's (ts, event_id)
    // order, count (prev → next) and its row-normalized probability.
    // One user_id shuffle for the lag window (the e11 frame), then a
    // hash agg down to O(types²) rows; the per-prev normalization
    // windows over those O(types²) rows only — never the raw stream.
    // Determinism: p is one double division of two exact counts
    // (IEEE-deterministic); the lag tiebreaks on (ts, event_id).
    graft.QueryDef("e12_transition_matrix", Some(
      """WITH m AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
        |      FROM m WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, next, n,
        |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE)
        |    AS p
        |FROM c""".stripMargin))((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val wp = Window.partitionBy("prev")
      pairs.withColumn("p",
        col("n").cast(DoubleType) / sum(col("n")).over(wp).cast(DoubleType))
    }),

    // E13 — daily RATE-ANOMALY detection: per event type, each day's
    // count is z-scored against that type's own daily distribution and
    // flagged when |z| > 2 — the ops-dashboard "traffic spike/drop"
    // monitor. Two hash aggs (events → O(days×types) daily counts →
    // O(types) moment rows) and a broadcast join back; output is the
    // bounded O(days×types) frame. Determinism: the z formula is
    // rearranged to keep EVERYTHING integer until one final division —
    // z = (c·n − s) / sqrt(n·sq − s²) with s = Σc, sq = Σc² summed in
    // DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), so both engines divide
    // the SAME two exact integers (good to ~1e19 in the products, far
    // past 100 TB daily counts); var = 0 (constant counts) short-
    // circuits on an exact integer comparison, and z is quantized to
    // 1e-6 at the boundary. The |z| > 2 flag compares the quantized
    // value, so the boolean is as deterministic as z itself.
    graft.QueryDef("e13_rate_anomaly", Some(
      """WITH dc AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    SUM(c) AS s, SUM(c * c) AS sq
        |  FROM dc GROUP BY 1),
        |z AS (
        |  SELECT dc.event_type, dc.day, dc.c,
        |    CASE WHEN n_days * sq - s * s = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE round(CAST(dc.c * n_days - s AS DOUBLE)
        |        / sqrt(CAST(n_days * sq - s * s AS DOUBLE)) * 1000000)
        |        / 1000000.0 END AS z
        |  FROM dc JOIN st USING (event_type))
        |SELECT event_type, CAST(day AS VARCHAR) AS day, c, z,
        |  abs(z) > 2.0 AS is_anomaly
        |FROM z""".stripMargin))((s, d) =>
      rateAnomalyFromDailyCounts(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))),

    // E14 — per-type INTER-ARRIVAL percentiles (p50/p90/p99 of the gap
    // between a user's consecutive events of the same type): the
    // cadence profile behind rate-limiter budgets, bot detection, and
    // sessionization gap tuning. EXACT, with no global sort — the a18
    // histogram method grouped by event_type: gaps floor to integer
    // seconds (bounded VALUE range, so the histogram is O(types ×
    // distinct gaps), never O(events)), one cumulative window over
    // histogram rows only, and an O(types×3) broadcast rank probe
    // picks each percentile as the smallest gap whose cumulative count
    // reaches ceil(p·n). The oracle re-derives the same values
    // independently from the order-statistics definition (row_number =
    // rank) — the histogram formulation proven against the law.
    // Determinism: the gap floors an IEEE division of exact integer
    // microseconds, identical in both engines; ranks are integers.
    graft.QueryDef("e14_interarrival_pctl", Some(
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(floor((epoch_us(ts) - epoch_us(lag(ts) OVER
        |      (PARTITION BY user_id, event_type ORDER BY ts, event_id)))
        |      / 1000000.0) AS BIGINT) AS gap_s
        |  FROM events),
        |gg AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
        |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM gg GROUP BY 1),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS p),
        |ranked AS (
        |  SELECT event_type, gap_s,
        |    row_number() OVER (PARTITION BY event_type ORDER BY gap_s) AS rn
        |  FROM gg)
        |SELECT nn.event_type, q.p, CAST(ceil(q.p * nn.n) AS BIGINT) AS rank,
        |  r.gap_s AS gap_seconds
        |FROM q, nn
        |JOIN ranked r ON r.event_type = nn.event_type
        |  AND r.rn = CAST(ceil(q.p * nn.n) AS BIGINT)""".stripMargin))((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("event_type"), col("ts"),
          lag(col("ts"), 1).over(w).as("prev"))
        .where(col("prev").isNotNull)
        .select(col("event_type"),
          floor((unix_micros(col("ts")) - unix_micros(col("prev")))
            / 1000000.0).cast(LongType).as("gap_s"))
      val hist = gaps.groupBy("event_type", "gap_s").agg(count(lit(1)).as("cnt"))
      val wc = Window.partitionBy("event_type").orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(wc))
      val n = gaps.groupBy("event_type").agg(count(lit(1)).as("n"))
      val ranks = n
        .select(col("event_type"),
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"), col("n"))
        .withColumn("rank", ceil(col("p") * col("n")).cast(LongType))
        .select("event_type", "p", "rank")
      cum.join(broadcast(ranks),
          Seq("event_type"), "inner")
        .where(col("cum") >= col("rank"))
        .groupBy("event_type", "p", "rank")
        .agg(min(col("gap_s")).as("gap_seconds"))
    }),

    // S12 — SCD Type-2 history from the CDC changelog: every I/U op
    // becomes a VERSION row valid from its sequence number until the
    // next op on the same key (lead over the per-key order); a final D
    // closes the last version and contributes no row itself, so a
    // deleted key has history but no current row. One per-key window —
    // the same single shuffle as the s11 apply, just keeping every
    // revision instead of the last. valid_to is NULL on the open
    // version (is_current), matching the standard warehouse encoding.
    graft.QueryDef("s12_scd2_history", Some(
      """WITH log AS (
        |  SELECT o_orderkey, o_orderstatus, 0 AS seq, 'I' AS op FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'U' AS o_orderstatus, 1 AS seq, 'U' AS op
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, NULL AS o_orderstatus, 2 AS seq, 'D' AS op
        |  FROM orders WHERE o_orderkey % 20 = 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1 AS o_orderkey, 'N' AS o_orderstatus,
        |    1 AS seq, 'I' AS op
        |  FROM orders WHERE o_orderkey % 25 = 0)
        |SELECT o_orderkey, o_orderstatus, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM (
        |  SELECT o_orderkey, o_orderstatus, op, CAST(seq AS INTEGER) AS valid_from,
        |    CAST(lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq)
        |      AS INTEGER) AS valid_to
        |  FROM log) v
        |WHERE op <> 'D'""".stripMargin))((s, d) => {
      val o = Tables.orders(s, d)
      val base = o.select(col("o_orderkey"), col("o_orderstatus"),
        lit(0).as("seq"), lit("I").as("op"))
      val updates = o.where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          lit(1).as("seq"), lit("U").as("op"))
      val deletes = o.where(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), lit(null).cast(StringType).as("o_orderstatus"),
          lit(2).as("seq"), lit("D").as("op"))
      // Synthetic new-key inserts map k → -k-1: strictly negative for
      // every non-negative real key (this testdata includes orderkey 0,
      // so plain -k would collide there), hence disjoint by construction
      // at every scale factor — a fixed "+10M" offset collides with real
      // keys once max(o_orderkey) = 6M·SF crosses it (~SF 1.67), putting
      // two seq=1 rows in one window partition and making the lead()
      // tie-break nondeterministic across engines.
      val inserts = o.where(col("o_orderkey") % 25 === 0)
        .select((-col("o_orderkey") - 1).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(1).as("seq"), lit("I").as("op"))
      val w = Window.partitionBy("o_orderkey").orderBy(col("seq"))
      base.unionByName(updates).unionByName(deletes).unionByName(inserts)
        .withColumn("valid_to", lead(col("seq"), 1).over(w))
        .where(col("op") =!= "D")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("seq").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    }),

    // A19 — CUBE with grouping_id: every subtotal combination of
    // (returnflag, linestatus) in ONE pass, each output row tagged with
    // the grouping bitmask (MSB = first key) so a consumer can route
    // grand totals / per-flag totals / leaf cells without re-querying.
    // Complements a14's ROLLUP: CUBE is the full lattice, and gid is
    // the disambiguator that coalesced '<all>' labels alone can't give
    // when a real key value could collide with the placeholder. Spark
    // plans this as one Expand (4 replicas of each input row) feeding
    // one partial+final hash agg — a single shuffle of the expanded
    // keys, no per-subtotal rescan; at 100 TB the Expand multiplies
    // map-side rows only, and the map-side combine collapses them
    // before the exchange (group cardinality is O(flags × statuses)).
    // Determinism: quantity sums ride the Num.dsum DECIMAL discipline;
    // both engines' GROUPING bitmask puts the first argument in the
    // high bit.
    graft.QueryDef("a19_cube", Some(
      """SELECT coalesce(l_returnflag, '<all>') AS rflag,
        |  coalesce(l_linestatus, '<all>') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin))((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          graft.Num.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("lstatus"),
          col("gid"), col("sum_qty"), col("n"))),

    // A23 — arbitrary GROUPING SETS: the lattice family's general form
    // (a14 ROLLUP and a19 CUBE are its two fixed shapes). The set list
    // here — (flag, status), (flag), (status) — is deliberately
    // NON-lattice (two incomparable single-column subtotals, no grand
    // total), the case only grouping_id can disambiguate: a
    // (value, NULL) row could be a (flag) subtotal OR a (flag, status)
    // group whose status IS NULL; gid separates them without the
    // placeholder-collision hazard a19 documents. Plan shape is the
    // same ONE Expand (3 replicas per input row, one per set) feeding
    // one partial+final hash agg — a single shuffle of the expanded
    // keys whose map-side combine collapses to O(flags × statuses)
    // rows before the exchange; at 100 TB the Expand multiplies
    // map-side rows only (PlanSpec pins Expand-not-Union). Both
    // engines' GROUPING bitmask puts the first argument in the high
    // bit; sums ride the Num.dsum DECIMAL discipline.
    graft.QueryDef("a23_grouping_sets", Some(
      """SELECT coalesce(l_returnflag, '<all>') AS rflag,
        |  coalesce(l_linestatus, '<all>') AS lstatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))""".stripMargin))((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          graft.Num.dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("<all>")).as("rflag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("lstatus"),
          col("gid"), col("sum_qty"), col("n"))),

    // E15 — POWER-USER CURVE (the "L28"-style engagement histogram):
    // users bucketed by how many DISTINCT days they were active, the
    // canonical shape for "how sticky is the product" (a spike at 1 =
    // drive-by traffic; mass at the right edge = daily habit). Two
    // hash aggs: countDistinct(day) expands to a partial-distinct on
    // (user_id, day) — map-side combine removes same-partition
    // duplicates before the user_id exchange — then the O(users) frame
    // collapses to the O(days) histogram. Nothing is ever wider than
    // (user, day), so the 100 TB cost is one deduplicating shuffle of
    // the event stream's (user, day) projection.
    graft.QueryDef("e15_power_user_curve", Some(
      """WITH ad AS (
        |  SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS active_days
        |  FROM events GROUP BY 1)
        |SELECT active_days, CAST(count(*) AS BIGINT) AS n_users
        |FROM ad GROUP BY 1""".stripMargin))((s, d) =>
      powerUserCurve(Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")))),

    // E18 — longest ACTIVITY STREAK per user, histogrammed: the
    // gaps-and-islands pattern (consecutive-day runs found by the
    // day − row_number invariant: days in one unbroken run all map to
    // the same anchor date) — the engagement metric behind "N-day
    // streak" product mechanics and habit analysis. Everything is
    // user_id-partitioned: distinct (user, day) → per-user ordered
    // row_number → island groupBy → per-user max → O(streak lengths)
    // histogram; the raw stream shuffles once (the distinct), windows
    // run over per-user day frames (bounded by the calendar), and no
    // global sort exists. Determinism: pure date/integer arithmetic.
    graft.QueryDef("e18_user_streaks", Some(
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |isl AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS anchor
        |  FROM days),
        |runs AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY user_id, anchor),
        |best AS (
        |  SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak
        |  FROM runs GROUP BY 1)
        |SELECT best_streak, CAST(count(*) AS BIGINT) AS n_users
        |FROM best GROUP BY 1""".stripMargin))((s, d) =>
      userStreaks(Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")))),

    // E19 — BOT / AUTOMATION FLAGS: per user, event-type ENTROPY plus
    // raw volume — the two cheapest behavioural signals (a scripted
    // client hammers one endpoint → low type entropy at high volume;
    // a human mixes types). Flag rule is ALL-INTEGER so both engines
    // decide identically: volume 1.5× the fleet mean as the exact
    // cross-multiplication 2·n·users > 3·total, entropy below 0.8
    // nats compared in quantized nano-space. Everything is one
    // (user, type) agg (map-side combined: O(users × types) groups)
    // plus O(users) joins; the 1-row fleet total broadcasts. Entropy
    // terms follow the t45/t48 ln rule: each −p·ln p term quantizes
    // to integer nanos before the exact long sum; p is a single IEEE
    // division of exact counts; events_per_day likewise.
    graft.QueryDef("e19_bot_flags", Some(
      """WITH peru AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n
        |      FROM peru GROUP BY 1),
        |d AS (SELECT user_id,
        |        CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
        |      FROM events GROUP BY 1),
        |h AS (
        |  SELECT p.user_id,
        |    CAST(SUM(CAST(round(-(CAST(p.c AS DOUBLE) / n.n)
        |      * ln(CAST(p.c AS DOUBLE) / n.n)
        |      * 1000000000) AS BIGINT)) AS BIGINT) AS hq
        |  FROM peru p JOIN n ON n.user_id = p.user_id GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS te,
        |               CAST(count(DISTINCT user_id) AS BIGINT) AS tu
        |        FROM events)
        |SELECT n.user_id, n.n AS n_events, d.days AS active_days,
        |  CAST(h.hq AS DOUBLE) / 1000000000.0 AS entropy,
        |  CAST(n.n AS DOUBLE) / d.days AS events_per_day,
        |  (n.n * tu * 2 > te * 3 AND h.hq < 800000000) AS is_bot
        |FROM n JOIN d ON d.user_id = n.user_id
        |JOIN h ON h.user_id = n.user_id CROSS JOIN tot""".stripMargin))((s, d) => {
      val e = Tables.events(s, d)
      val peru = e.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val n = peru.groupBy(col("user_id")).agg(sum(col("c")).as("n"))
      val days = e.groupBy(col("user_id"))
        .agg(countDistinct(to_date(col("ts"))).as("days"))
      val p = col("c").cast(DoubleType) / col("n")
      val h = peru.join(n, Seq("user_id"))
        .withColumn("tq", round(-p * log(p) * 1000000000L).cast(LongType))
        .groupBy(col("user_id")).agg(sum(col("tq")).as("hq"))
      val tot = e.agg(count(lit(1)).as("te"),
        countDistinct(col("user_id")).as("tu"))
      n.join(days, Seq("user_id")).join(h, Seq("user_id"))
        .join(broadcast(tot))
        .select(col("user_id"), col("n").as("n_events"),
          col("days").as("active_days"),
          (col("hq").cast(DoubleType) / 1000000000.0).as("entropy"),
          (col("n").cast(DoubleType) / col("days")).as("events_per_day"),
          (col("n") * col("tu") * 2 > col("te") * 3 &&
            col("hq") < 800000000L).as("is_bot"))
    }),

    // A21 — DAILY CO-MOVEMENT MATRIX: Pearson correlation of daily
    // counts between every event-type pair — the co-movement audit
    // that separates "these two metrics move together" from
    // coincidence before anyone ships a derived KPI. All five moments
    // are EXACT integer sums (counts are ints, products through
    // DECIMAL(38,0) — the e13/t45 moment discipline), so r is two
    // IEEE ops over exact ints, quantized 1e-6; the self-join runs on
    // the O(types × days) rollup, output O(types²)/2. Days where
    // either type is absent drop via the inner day join (documented
    // semantics: correlation over co-observed days).
    graft.QueryDef("a21_daily_correlation", Some(
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.c AS x, b.c AS y
        |  FROM daily a JOIN daily b
        |    ON b.day = a.day AND a.event_type < b.event_type),
        |s AS (
        |  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p GROUP BY 1, 2)
        |SELECT type_a, type_b, n_days,
        |  round(CAST(n_days * sxy - sx * sy AS DOUBLE)
        |    / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
        |           * CAST(n_days * syy - sy * sy AS DOUBLE))
        |    * 1000000) / 1000000.0 AS corr
        |FROM s WHERE n_days >= 2
        |  AND n_days * sxx - sx * sx > 0
        |  AND n_days * syy - sy * sy > 0""".stripMargin))((s, d) =>
      dailyCorrelationFromDaily(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))),

    // E23 — USER-ACTIVITY POWER-LAW FIT: the t45 Zipf regression
    // applied to the user dimension — slope/r² of ln(count) on
    // ln(rank) over the top-200 most active users, the one-row answer
    // to "is activity heavy-tailed enough to need per-user caps and
    // skew-aware partitioning". The top-200 frame arrives via a
    // bounded TakeOrdered (total order, user_id tiebreak) so the only
    // window runs over 200 rows; lns quantize to exact integers
    // before the DECIMAL moment sums (the t45 discipline).
    graft.QueryDef("e23_user_zipf", Some(
      """WITH cnt AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS r
        |  FROM cnt),
        |q AS (
        |  SELECT CAST(round(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM ranked WHERE r <= 200),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM q)
        |SELECT n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000) / 1000000.0
        |    AS slope,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE))
        |    * 1000000) / 1000000.0 AS r2
        |FROM s WHERE n >= 2""".stripMargin))((s, d) => {
      val dec = DecimalType(38, 0)
      val top = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id").asc).limit(200)
      val w = Window.orderBy(col("c").desc, col("user_id").asc)
      val q = top.withColumn("r", row_number().over(w))
        .select(
          round(log(col("r").cast(DoubleType)) * 1000000).cast(LongType).as("x"),
          round(log(col("c").cast(DoubleType)) * 1000000).cast(LongType).as("y"))
      val st = q.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"))
      val nD = col("n").cast(dec)
      val num = nD * col("sxy") - col("sx") * col("sy")
      val denx = nD * col("sxx") - col("sx") * col("sx")
      val deny = nD * col("syy") - col("sy") * col("sy")
      st.where(col("n") >= 2).select(col("n"),
        (round(num.cast(DoubleType) / denx.cast(DoubleType) * 1000000)
          / 1000000.0).as("slope"),
        (round(num.cast(DoubleType) * num.cast(DoubleType)
          / (denx.cast(DoubleType) * deny.cast(DoubleType))
          * 1000000) / 1000000.0).as("r2"))
    }),

    // E25 — ACTIVITY GINI COEFFICIENT: inequality of the per-user
    // event distribution (0 = uniform, →1 = one user does everything)
    // — the one-number complement to e23's power-law fit that capacity
    // planning quotes. NO user-wide rank window: ranks derive from the
    // count-value HISTOGRAM (t50 discipline) — a tie block of k users
    // at value c starting after cumulative rank r0 contributes exactly
    // c·(k·r0 + k(k+1)/2) to Σ rank·count, in closed form — so every
    // sum is an exact integer (DECIMAL against overflow) and the Gini
    // is two IEEE divisions at the end, quantized 1e-6. The oracle
    // derives the same number from the textbook row_number formula —
    // histogram formulation proven against the law.
    graft.QueryDef("e25_activity_gini", Some(
      """WITH cnt AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM cnt),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(i * c) AS si, CAST(SUM(c) AS BIGINT) AS t
        |  FROM ranked)
        |SELECT n, t AS total_events,
        |  round((2.0 * si / (n * t) - (n + 1.0) / n) * 1000000)
        |    / 1000000.0 AS gini
        |FROM s""".stripMargin))((s, d) => {
      val dec = DecimalType(38, 0)
      val cnt = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      val hist = cnt.groupBy("c").agg(count(lit(1)).as("k"))
      val wc = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
      val blocks = hist
        .withColumn("r0", coalesce(sum(col("k")).over(wc), lit(0L)))
        .select(col("c"), col("k"),
          (col("c").cast(dec) * (col("k").cast(dec) * col("r0").cast(dec)
            + expr("k * (k + 1) div 2").cast(dec))).as("si_block"),
          (col("c").cast(dec) * col("k").cast(dec)).as("t_block"))
      val st = blocks.agg(sum(col("k")).as("n"),
        sum(col("si_block")).as("si"), sum(col("t_block")).as("t"))
      st.select(col("n"), col("t").cast(LongType).as("total_events"),
        (round((lit(2.0) * col("si").cast(DoubleType)
          / (col("n").cast(dec) * col("t")).cast(DoubleType)
          - (col("n") + lit(1.0)) / col("n")) * 1000000)
          / 1000000.0).as("gini"))
    }),

    // E22 — WEEKDAY SEASONALITY PROFILE: per event type, the
    // day-of-week distribution (share of the type's volume landing on
    // each weekday) with the peak day flagged — the seasonality prior
    // behind e21's day-over-week baseline, and the capacity-planning
    // chart every ops dashboard carries. One (type, dow) agg off the
    // raw stream (map-side combined: O(types × 7) groups), totals and
    // maxima broadcast back; share is one IEEE division of exact
    // counts, the peak flag an exact integer compare (ties flag every
    // tied day on both engines). DOW convention: 0 = Sunday (DuckDB
    // dayofweek; Spark's 1-based value minus 1).
    graft.QueryDef("e22_weekday_profile", Some(
      """WITH g AS (
        |  SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS total,
        |        CAST(max(c) AS BIGINT) AS mx
        |      FROM g GROUP BY 1)
        |SELECT g.event_type, CAST(g.dow AS INTEGER) AS dow, g.c,
        |  CAST(g.c AS DOUBLE) / t.total AS share,
        |  g.c = t.mx AS is_peak
        |FROM g JOIN t ON t.event_type = g.event_type""".stripMargin))((s, d) =>
      weekdayProfileFromDaily(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))),

    // E21 — NAIVE SEASONAL FORECAST BASELINE: per event type, each
    // day's count against the same-weekday-last-week count (the
    // forecast every real model must beat) with the absolute error —
    // the backtest report an anomaly/forecast service publishes.
    // CALENDAR-correct by construction: the forecast joins on
    // (type, day−7) rather than lagging 7 ROWS, so missing days
    // can't misalign the baseline. All-integer output; the join runs
    // on the O(types × days) rollup, never the raw stream.
    graft.QueryDef("e21_forecast_baseline", Some(
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, CAST(a.day AS VARCHAR) AS day, a.c AS actual,
        |  f.c AS forecast, abs(a.c - f.c) AS abs_err
        |FROM daily a JOIN daily f
        |  ON f.event_type = a.event_type AND f.day = a.day - 7""".stripMargin))((s, d) =>
      forecastBaselineFromDaily(Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")))),

    // E20 — RFM SEGMENTATION: every user quartile-ranked on Recency
    // (days since last event vs the stream's max day), Frequency
    // (event count) and Monetary (exact cent-summed value), then
    // mapped to a named segment by an all-integer rule — the classic
    // lifecycle segmentation run off any event stream. Monetary sums
    // round each value to integer CENTS before the exact long sum (no
    // float accumulation); quartiles ride the SHARED distributedNtile
    // (t38/t41): key histogram + cumulative window over histogram rows
    // + broadcast offsets — never a single-partition global sort, so
    // the O(users) frame ranks at any scale. Quartile 1 = best (most
    // recent / most frequent / highest spend via negated keys).
    graft.QueryDef("e20_rfm_segments", Some(
      """WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS a FROM events),
        |peru AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    max(CAST(ts AS DATE)) AS last_day,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT user_id, n, cents,
        |    CAST(date_diff('day', last_day, a) AS BIGINT) AS rec_days
        |  FROM peru, anchor),
        |rk AS (
        |  SELECT user_id, n, cents, rec_days,
        |    NTILE(4) OVER (ORDER BY rec_days, user_id) AS r,
        |    NTILE(4) OVER (ORDER BY -n, user_id) AS f,
        |    NTILE(4) OVER (ORDER BY -cents, user_id) AS mq
        |  FROM m)
        |SELECT user_id, rec_days, n AS n_events, cents,
        |  CAST(r AS INTEGER) AS r, CAST(f AS INTEGER) AS f,
        |  CAST(mq AS INTEGER) AS m,
        |  CASE WHEN r <= 2 AND f <= 2 AND mq <= 2 THEN 'champion'
        |    WHEN r >= 3 AND f <= 2 THEN 'at_risk'
        |    WHEN r <= 2 AND f >= 3 THEN 'new'
        |    ELSE 'hibernating' END AS segment
        |FROM rk""".stripMargin))((s, d) => {
      import graft.operators.TextAnalysisQueries.distributedNtile
      val e = Tables.events(s, d)
      val anchor = e.agg(max(to_date(col("ts"))).as("a"))
      val peru = e.groupBy(col("user_id")).agg(
        count(lit(1)).as("n"),
        max(to_date(col("ts"))).as("last_day"),
        sum(round(col("value") * 100).cast(LongType)).as("cents"))
      val m = peru.join(broadcast(anchor))
        .withColumn("rec_days", datediff(col("a"), col("last_day")).cast(LongType))
        .select("user_id", "n", "cents", "rec_days")
      def ranked(key: Column, name: String): DataFrame =
        distributedNtile(
          m.select(col("user_id").as("doc_id"), key.as("key")), 4)
          .select(col("doc_id").as("user_id"), col("bin").as(name))
      m.join(ranked(col("rec_days"), "r"), Seq("user_id"))
        .join(ranked(-col("n"), "f"), Seq("user_id"))
        .join(ranked(-col("cents"), "m"), Seq("user_id"))
        .select(col("user_id"), col("rec_days"), col("n").as("n_events"),
          col("cents"), col("r"), col("f"), col("m"),
          when(col("r") <= 2 && col("f") <= 2 && col("m") <= 2, "champion")
            .when(col("r") >= 3 && col("f") <= 2, "at_risk")
            .when(col("r") <= 2 && col("f") >= 3, "new")
            .otherwise("hibernating").as("segment"))
    }),

    // S13 — INCREMENTAL ROLLUP MAINTENANCE (materialized-view delta
    // merge): the daily (day, type) rollup is maintained as
    // base-partial ⊎ delta-partial re-aggregated — the nightly pattern
    // that updates a 100 TB rollup by scanning ONLY the new partition
    // and merging O(days×types) summary rows, never recomputing
    // history. The split replays e2's id-watermark convention (base =
    // ids ≤ 80% max, delta = the rest). The ORACLE is the one-shot
    // full aggregate — so the hash gate literally proves the merge law
    // (count and DECIMAL-sum are associative/commutative over the
    // partition) that incremental maintenance rests on. Determinism:
    // counts are longs; value sums ride the Num.dsum DECIMAL
    // discipline through BOTH partials and the merge, so no float ever
    // accumulates.
    graft.QueryDef("s13_incremental_rollup", Some(
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))((s, d) => {
      val e = Tables.events(s, d)
      val wm = e.agg(floor(max(col("event_id")) * 0.8).cast(LongType).as("wm"))
      val dec = DecimalType(18, 2)
      def partial(df: DataFrame): DataFrame = df
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(dec)).as("pv"))
      val base  = partial(e.join(broadcast(wm), col("event_id") <= col("wm")))
      val delta = partial(e.join(broadcast(wm), col("event_id") > col("wm")))
      base.unionByName(delta)
        .groupBy(col("day"), col("event_type"))
        .agg(sum(col("pn")).as("n_events"),
          sum(col("pv")).cast(DoubleType).as("sum_value"))
        .select(col("day").cast(StringType).as("day"), col("event_type"),
          col("n_events"), col("sum_value"))
    })
  )
}
