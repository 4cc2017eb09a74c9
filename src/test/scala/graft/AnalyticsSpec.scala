package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics the oracle compare can't pin by itself: the funnel's
  * ordering constraint, the cohort triangle's invariants, and the SCD2
  * version chain (contiguous, delete-closed, one current row per live
  * key). */
class AnalyticsSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("e4: funnel stages strictly shrink and lags are non-negative") {
    val rows = run("e4_event_funnel")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(rows("1_view")._1 >= rows("2_click")._1)
    assert(rows("2_click")._1 >= rows("3_purchase")._1)
    // ordered-min lags: each stage's entry is at-or-after the previous
    assert(rows("2_click")._2 >= 0L && rows("3_purchase")._2 >= 0L)
  }

  test("e4: a purchase BEFORE first view does not convert") {
    import spark.implicits._
    val e = Seq(
      (1L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, "view", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (2L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "click", java.sql.Timestamp.valueOf("2024-01-01 01:00:00")),
      (2L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 02:00:00")))
      .toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    e.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // user 1 never clicks; user 2 converts fully with 1h+1h lag
    val out = operators.AnalyticsQueries.funnel(
      spark.read.parquet(s"$dir/events.parquet"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("1_view") == ((2L, 0L)))
    assert(out("2_click") == ((1L, 3600000000L)))
    assert(out("3_purchase") == ((1L, 3600000000L)))
  }

  test("e5: cohort triangle — offset 0 exists per cohort, offsets non-negative") {
    val rows = run("e5_cohort_retention")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0L))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, rs) =>
      val at0 = rs.find(_._2 == 0L)
      // every user is active in their own first week
      assert(at0.nonEmpty)
      // week-0 count is the cohort max (retention can only lose users)
      assert(rs.map(_._3).max == at0.get._3)
    }
  }

  test("e6: active-user windows nest (dau <= wau <= mau) and the spine has no gaps") {
    val rows = run("e6_active_users")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // window containment: a user active today is active this week and
    // this month — any violation means a fan-out off-by-one
    rows.foreach { case (day, dau, wau, mau) =>
      assert(dau <= wau && wau <= mau, s"$day: $dau/$wau/$mau not nested")
    }
    // the spine is contiguous days, min to max, no missing rows
    val days = rows.map(r => java.time.LocalDate.parse(r._1))
    days.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0).plusDays(1) == p(1), s"gap after ${p(0)}")
    }
    // wau at day d is exactly the distinct union of the trailing 7
    // dau populations — spot-verified structurally by the oracle's
    // range-join replay; here pin the cheap lower bound max(trailing
    // dau) <= wau
    rows.sliding(7).foreach { w =>
      assert(w.map(_._2).max <= w.last._3, s"wau below a trailing dau at ${w.last._1}")
    }
  }

  test("e7: growth-accounting identity holds week over week") {
    val rows = run("e7_growth_accounting")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // weekly spine is contiguous Mondays
    val weeks = rows.map(r => java.time.LocalDate.parse(r._1))
    weeks.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0).plusDays(7) == p(1), s"gap after ${p(0)}")
    }
    // the growth-accounting identity: churned(w) = active(w-7) - retained(w)
    // (a user active last week either retains or churns — no third door)
    rows.sliding(2).foreach { p =>
      if (p.length == 2) {
        val activePrev = p(0)._2 + p(0)._3 + p(0)._4
        assert(p(1)._5 == activePrev - p(1)._3,
          s"churn identity broken at ${p(1)._1}")
      }
    }
    // first week is all-new by definition, and nothing can churn there
    assert(rows.head._3 == 0L && rows.head._4 == 0L && rows.head._5 == 0L)
  }

  test("e7: classification and churn boundary on a synthetic stream") {
    import spark.implicits._
    // user 1 active weeks 1,2,4 of Jan 2024 (Mondays 1st, 8th, 22nd):
    // new@w1, retained@w2, churned@w3, resurrected@w4; the would-be
    // churn at w5 is beyond max(wk) and must NOT row.
    // user 2 active w1 only: new@w1, churned@w2.
    val e = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-10 10:00:00"),
      (1L, "2024-01-25 10:00:00"), (2L, "2024-01-03 09:00:00"))
      .map { case (u, t) => (u, java.sql.Timestamp.valueOf(t)) }
      .toDF("user_id", "ts")
    val out = operators.AnalyticsQueries.growthAccounting(e)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "2024-01-01" -> ((2L, 0L, 0L, 0L)),
      "2024-01-08" -> ((0L, 1L, 0L, 1L)),
      "2024-01-15" -> ((0L, 0L, 0L, 1L)),
      "2024-01-22" -> ((0L, 0L, 1L, 0L))))
  }

  test("e9: the conversion window only tightens e4, and caps every lag") {
    val e4 = run("e4_event_funnel")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val e9 = run("e9_windowed_funnel")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(e9.keySet == e4.keySet)
    e9.foreach { case (stage, (n9, lag9)) =>
      // a window can only remove conversions, never add them
      assert(n9 <= e4(stage)._1, s"$stage: windowed count exceeds unbounded")
      // every per-user lag is <= 24h by construction
      assert(lag9 <= n9 * 86400000000L, s"$stage: lag exceeds the 24h window")
    }
    // the fixture is dense enough that the window actually bites
    assert(e9("2_click")._1 < e4("2_click")._1,
      "24h window removed nothing — degenerate fixture")
  }

  test("e8: decayed scores are exact dyadic sums, bounded by event count") {
    val rows = run("e8_decayed_activity")
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val anchor = rows.map(_._3).max
    rows.foreach { case (u, n, last, scaled, score) =>
      // the double score IS the integer sum / 2^30 — no rounding leaks
      assert(score == scaled.toDouble / 1073741824.0, s"user $u: score drifted")
      // every weight <= 1, so score <= n_events; > 0 always
      assert(score > 0.0 && score <= n.toDouble, s"user $u: score out of range")
      // an event on the anchor day carries full weight 1
      if (last == anchor) assert(score >= 1.0, s"user $u: anchor-day event under-weighted")
    }
  }

  test("e11: lookback boundary and same-timestamp tiebreak on a synthetic stream") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      // user 1: click 8 days before purchase — outside lookback → none
      (1L, 1L, "click", "2024-01-01 00:00:00"),
      (2L, 1L, "purchase", "2024-01-09 00:00:01"),
      // user 2: view then click then purchase — LAST touch (click) wins
      (3L, 2L, "view", "2024-01-01 00:00:00"),
      (4L, 2L, "click", "2024-01-02 00:00:00"),
      (5L, 2L, "purchase", "2024-01-03 00:00:00"),
      // user 3: view at the SAME ts as the purchase, lower event_id —
      // the (ts, event_id) order makes it visible and attributable
      (6L, 3L, "view", "2024-01-05 12:00:00"),
      (7L, 3L, "purchase", "2024-01-05 12:00:00"),
      // user 4: purchase with no channel history at all
      (8L, 4L, "purchase", "2024-01-04 00:00:00"))
      .map { case (id, u, et, ts) => (id, u, et, t(ts)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = operators.AnalyticsQueries.lastTouchAttribution(e)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("none" -> 2L, "click" -> 1L, "view" -> 1L))
    // real data: every purchase is attributed exactly once
    val rows = run("e11_last_touch_attribution")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    assert(rows.values.sum == purchases)
    assert(rows.keySet.subsetOf(Set("view", "click", "none")))
  }

  test("s12: version chains are contiguous; deleted keys have no current row") {
    val rows = run("s12_scd2_history").map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getInt(2), if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getBoolean(4)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._3)
      // chain: each valid_to equals the next valid_from
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._4.contains(pair(1)._3), s"gap in chain for $k")
      }
      // exactly the last version may be current
      assert(vs.count(_._5) == (if (sorted.last._4.isEmpty) 1 else 0))
    }
    // a key hit by the delete branch (key % 20 == 0, not re-inserted id)
    val deleted = byKey.filter { case (k, _) => k % 20 == 0 && k < 10000000L }
    assert(deleted.nonEmpty)
    // delete closes the chain: every version has valid_to, none current
    deleted.values.foreach { vs =>
      assert(vs.forall(v => v._4.nonEmpty && !v._5))
    }
  }
}
