package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.EventAnalytics

/** Event-analytics layer (q114–q116): ordered min-time funnel,
  * first-touch weekly cohort retention, and the event-type Markov
  * transition matrix. Fixtures have hand-computable answers; the
  * DuckDB oracle covers engine parity at sf scale.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, Long, String)]) =
    rows.map { case (id, t, u, ty) => (id, ts(t), u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("rfmSegments: four users land one per quartile on every dimension") {
    // user u (1..4): u events, all on day Jan (6+u), each value 10·u →
    // r = 4−u (recent = high score), f = u, m = 1000·u² cents. With
    // n = 4 the interpolated quartiles separate the four values, so
    // user u scores (u, u, u) and total_monetary = 10·u² dollars.
    val rows = (1 to 4).flatMap { u =>
      (1 to u).map(i => ((u * 10 + i).toLong,
        ts(f"2024-01-${6 + u}%02d 10:0$i:00"), u.toLong, "buy", 10.0 * u, "{}"))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.rfmSegments(df).collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq(
      (1, 1, 1, 1L, 10.0), (2, 2, 2, 1L, 40.0),
      (3, 3, 3, 1L, 90.0), (4, 4, 4, 1L, 160.0)), r.mkString(";"))
  }

  test("rfmSegments on the events table: grid cells partition the user population") {
    val ev = Tables.events(spark, sfDir)
    val r = EventAnalytics.rfmSegments(ev).collect()
    assert(r.map(_.getLong(3)).sum == ev.select("user_id").distinct().count())
    r.foreach { x =>
      for (i <- 0 to 2) assert(x.getInt(i) >= 1 && x.getInt(i) <= 4)
      assert(x.getLong(3) >= 1L)
    }
  }

  test("duplicateEventAudit: gap boundary, per-(user,type) isolation, rates") {
    // user 1 click: t, t+30 (dup), t+60-after-that (not: gap 61... use
    // explicit seconds) — and user 2's click never pairs with user 1's
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:30"), 1L, "click", 1.0, "{}"),  // +30 s: dup
      (3L, ts("2024-01-01 10:01:30"), 1L, "click", 1.0, "{}"),  // +60 s: dup (boundary)
      (4L, ts("2024-01-01 10:03:00"), 1L, "click", 1.0, "{}"),  // +90 s: clean
      (5L, ts("2024-01-01 10:00:10"), 2L, "click", 1.0, "{}"),  // other user: clean
      (6L, ts("2024-01-01 10:00:20"), 1L, "view", 1.0, "{}"))   // other type: clean
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.duplicateEventAudit(df).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("click") == ((5L, 2L, 0.4)), r("click").toString)
    assert(r("view") == ((1L, 0L, 0.0)))
  }

  // ---- q143 OHLC bars ------------------------------------------------

  test("ohlcBars: open/close follow (second, event_id) order; H/L exact") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:05"), 1L, "view", 3.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "view", 9.0, "{}"),
      (3L, ts("2024-01-01 10:59:59"), 2L, "view", 5.0, "{}"),
      // same second as event 1, higher id → NOT the open
      (4L, ts("2024-01-01 10:00:05"), 2L, "view", 7.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 1L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.ohlcBars(df).collect()
    assert(res.length == 2)
    val bar = res(0)
    assert(bar.getString(0) == "view")
    assert(bar.getDouble(2) == 3.0)  // open
    assert(bar.getDouble(3) == 9.0)  // high
    assert(bar.getDouble(4) == 3.0)  // low
    assert(bar.getDouble(5) == 5.0)  // close
    assert(bar.getLong(6) == 4L)
    assert(res(1).getDouble(2) == 2.0) // 11:00 bar: single event
  }

  test("ohlcBars on the corpus: every bar internally consistent") {
    val res = EventAnalytics.ohlcBars(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= l && h >= o && h >= c && l <= o && l <= c)
    }
  }

  // ---- q158 histogram percentiles ------------------------------------

  test("histogramPercentilesHourly: step quantiles read off the grid by hand") {
    // one hour, values 1.0 1.2 2.0 9.9 → bins 2 2 4 19 (width 0.5),
    // n = 4: p50 needs cum ≥ 2 → bin 2 (edge 1.0); p90 needs cum ≥
    // ceil(3.6) = 4 → bin 19 (edge 9.5); p99 likewise 9.5
    val df = Seq(
      (1L, ts("2024-01-01 10:00:05"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "view", 1.2, "{}"),
      (3L, ts("2024-01-01 10:20:00"), 2L, "view", 2.0, "{}"),
      (4L, ts("2024-01-01 10:30:00"), 2L, "view", 9.9, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.histogramPercentilesHourly(df).collect()
    assert(res.length == 1)
    val r = res.head
    assert(r.getLong(1) == 4L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 9.5 && r.getDouble(4) == 9.5)
  }

  test("histogramPercentilesHourly on the corpus: monotone percentiles, mass accounted") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.histogramPercentilesHourly(ev).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getLong(1)).sum == ev.count())
    res.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4))
    }
  }

  // ---- q175 SCD2 point-in-time lookup --------------------------------

  test("scdLookup: purchases read the state valid AT the purchase second") {
    // user 1: purchase BEFORE any state event (drops), view (opens
    // v1), purchase inside v1, cart (opens v2), purchase at EXACTLY
    // v2's open second (boundary: belongs to v2)
    val df = eventsDf(Seq(
      (0L, "2024-01-01 09:00:00", 1L, "purchase"),
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "purchase"),
      (3L, "2024-01-01 10:10:00", 1L, "cart"),
      (4L, "2024-01-01 10:10:00", 1L, "purchase")))
    val res = EventAnalytics.scdLookup(df).collect()
    assert(res.length == 2, "the pre-state probe must drop, loudly")
    assert(res(0).getLong(0) == 2L && res(0).getString(4) == "view" &&
      res(0).getInt(3) == 1)
    assert(res(1).getLong(0) == 4L && res(1).getString(4) == "cart" &&
      res(1).getInt(3) == 2, "a boundary probe belongs to the OPENING interval")
  }

  test("scdLookup on the corpus: exactly one match per in-span purchase") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.scdLookup(ev).collect()
    // expected probe count: purchases at-or-after the user's first
    // non-purchase event second (earlier ones have no state to read)
    val firstState = ev.filter(col("event_type") =!= "purchase")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min(unix_timestamp(col("ts"))).as("f"))
    val expected = ev.filter(col("event_type") === "purchase")
      .join(firstState, "user_id")
      .filter(unix_timestamp(col("ts")) >= col("f")).count()
    assert(res.length == expected,
      "interval tiling must match each in-span probe exactly once")
    assert(res.map(_.getLong(0)).distinct.length == res.length, "no fan-out")
  }

  // ---- q160 EWMA level -----------------------------------------------

  test("ewmaLastPerUser: two-event user renormalizes over present lags") {
    // user 1: values 10 then 20 → at the last event x0=20, x1=10;
    // ewma = (20·0.3 + 10·0.21) / (0.3 + 0.21) = 8.1 / 0.51
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 10.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 20.0, "{}"),
      (3L, ts("2024-01-01 10:30:00"), 2L, "view", 7.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.ewmaLastPerUser(df).collect()
    assert(res.length == 2)
    val u1 = res(0)
    assert(u1.getLong(0) == 1L && u1.getLong(1) == 2L && u1.getLong(2) == 2L)
    assert(math.abs(u1.getDouble(3) - math.rint(8.1 / 0.51 * 1e4) / 1e4) < 1e-12)
    // single-event user: all weight on x0 → ewma = value exactly
    assert(res(1).getDouble(3) == 7.5)
  }

  test("ewmaLastPerUser: order is (second, event_id), not raw sub-second ts") {
    // same second, higher id wins the "last" pick and the lag order
    val df = Seq(
      (5L, ts("2024-01-01 10:00:05"), 1L, "view", 100.0, "{}"),
      (4L, ts("2024-01-01 10:00:05"), 1L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.ewmaLastPerUser(df).collect()(0)
    assert(r.getLong(2) == 5L)
    // last row: x0=100 (id 5), x1=0 (id 4) → 100·0.3 / 0.51
    assert(math.abs(r.getDouble(3) - math.rint(30.0 / 0.51 * 1e4) / 1e4) < 1e-12)
  }

  test("ewmaLastPerUser on the corpus: one row per user, ewma within value range") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.ewmaLastPerUser(ev).collect()
    assert(res.length == ev.select("user_id").distinct().count().toInt)
    val (lo, hi) = {
      val r = ev.agg(min("value"), max("value")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    res.foreach { r =>
      assert(r.getDouble(3) >= lo - 1e-4 && r.getDouble(3) <= hi + 1e-4,
        s"ewma outside the convex hull of values: $r")
    }
  }

  // ---- q164 inter-arrival burstiness ---------------------------------

  test("burstiness: hand-computed gaps 10,10,20; single-gap type is NULL") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:10"), 1L, "view", 1.0, "{}"),
      (3L, ts("2024-01-01 10:00:20"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 10:01:00"), 1L, "view", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 1L, "buy", 1.0, "{}"),
      (6L, ts("2024-01-01 10:00:30"), 1L, "buy", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.burstiness(df).collect()
    val buy = res(0); val view = res(1)
    // view: gaps 10, 10, 40 → n=3, s1=60, s2=1800
    assert(view.getLong(1) == 3L)
    val mean = 60.0 / 3
    val sd = math.sqrt((3.0 * 1800 - 60.0 * 60) / (3.0 * 2))
    assert(view.getDouble(2) == math.rint(mean * 1e4) / 1e4)
    assert(view.getDouble(3) == math.rint(sd / mean * 1e4) / 1e4)
    assert(view.getDouble(4) == math.rint((sd - mean) / (sd + mean) * 1e4) / 1e4)
    // buy: one gap → mean defined, cv/burstiness NULL
    assert(buy.getLong(1) == 1L && buy.getDouble(2) == 30.0)
    assert(buy.isNullAt(3) && buy.isNullAt(4))
  }

  test("burstiness: gaps are within-user — interleaved users don't cross") {
    // two users alternate seconds; per-user gaps are all 2 s (regular),
    // so burstiness is strongly negative, not the spurious cross-user 1 s
    val rows = (0 until 10).map(i =>
      ((i + 1).toLong, ts(f"2024-01-01 10:00:${i}%02d"),
        (i % 2 + 1).toLong, "view", 1.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.burstiness(df).collect()(0)
    assert(r.getLong(1) == 8L)
    assert(r.getDouble(2) == 2.0, "within-user gap, not the 1 s cross-user gap")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == -1.0,
      "perfectly regular stream pins CV at 0 and burstiness at -1")
  }

  test("burstiness on the corpus: every type covered, B in (-1, 1)") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.burstiness(ev).collect()
    assert(res.length == ev.select("event_type").distinct().count().toInt)
    res.foreach { r =>
      assert(r.getDouble(2) > 0)
      if (!r.isNullAt(4))
        assert(r.getDouble(4) > -1.0 - 1e-9 && r.getDouble(4) < 1.0)
    }
  }

  // ---- q165 seasonal anomalies ---------------------------------------

  test("seasonalAnomalies: burst flagged against its own hour-of-day; >= boundary") {
    def burst(day: Int, hour: Int, tpe: String, n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        ts(f"2024-01-$day%02d $hour%02d:${10 + i}%02d:00"), 1L, tpe, 1.0, "{}"))
    val rows =
      // view @ hod 10: counts 1, 1, 10 → s=12, m=3, base 4; 10 → ratio 2.5
      burst(1, 10, "view", 1, 100) ++ burst(2, 10, "view", 1, 200) ++
        burst(3, 10, "view", 10, 300) ++
        // buy @ hod 11: counts 2, 2, 8 → 8·3 = 24 = 2·12 → flagged at 2.0 exactly
        burst(1, 11, "buy", 2, 400) ++ burst(2, 11, "buy", 2, 500) ++
        burst(3, 11, "buy", 8, 600)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.seasonalAnomalies(df).collect()
    assert(res.length == 2)
    val buy = res(0); val view = res(1)
    assert(buy.getString(0) == "buy" && buy.getLong(2) == 8L &&
      buy.getDouble(3) == 4.0 && buy.getDouble(4) == 2.0)
    assert(view.getString(0) == "view" && view.getLong(2) == 10L &&
      view.getDouble(3) == 4.0 && view.getDouble(4) == 2.5)
  }

  test("seasonalAnomalies on the corpus: flagged rows honor the threshold") {
    val res = EventAnalytics.seasonalAnomalies(Tables.events(spark, sfDir)).collect()
    res.foreach(r => assert(r.getDouble(4) >= 2.0))
  }

  // ---- q161 hourly autocorrelation -----------------------------------

  test("autocorrHourly: linear count ramp gives acf1 = acf2 = 1; constant series NULL") {
    // "view": counts 1,2,3,4 over four hours → perfectly linear lags;
    // "buy": constant 2,2,2 → zero variance → NULL (not NaN)
    def burst(tpe: String, hour: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        ts(f"2024-01-01 $hour%02d:0${i % 6}:00"), 1L, tpe, 1.0, "{}"))
    val rows = burst("view", 10, 1, 100) ++ burst("view", 11, 2, 200) ++
      burst("view", 12, 3, 300) ++ burst("view", 13, 4, 400) ++
      burst("buy", 10, 2, 500) ++ burst("buy", 11, 2, 600) ++
      burst("buy", 12, 2, 700)
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.autocorrHourly(df).collect()
    val buy = res(0); val view = res(1)
    assert(view.getString(0) == "view" && view.getLong(1) == 4L)
    assert(view.getDouble(2) == 1.0 && view.getDouble(3) == 1.0)
    assert(buy.getString(0) == "buy" && buy.isNullAt(2) && buy.isNullAt(3))
  }

  test("autocorrHourly on the corpus: coefficients in [-1, 1], hours accounted") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.autocorrHourly(ev).collect()
    assert(res.nonEmpty)
    val gridRows = ev.select(col("event_type"),
      date_trunc("hour", col("ts"))).distinct().count()
    assert(res.map(_.getLong(1)).sum == gridRows)
    res.foreach { r =>
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
      if (!r.isNullAt(3)) assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  // ---- q153 SCD Type-2 history ---------------------------------------

  test("scdHistory: no-op repeats compact; intervals chain; one open row per user") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "view"),     // repeat → compacts away
      (3L, "2024-01-01 10:10:00", 1L, "cart"),
      (4L, "2024-01-01 10:20:00", 1L, "view"),     // state can recur later
      (5L, "2024-01-01 09:00:00", 2L, "purchase")))
    val res = EventAnalytics.scdHistory(df).collect()
    val u1 = res.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq == Seq("view", "cart", "view"))
    assert(u1.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // each interval closes exactly where the next one opens
    u1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) == b.getLong(3))
    }
    // exactly the last version is open/current
    assert(u1.takeRight(1).forall(r => r.isNullAt(4) && r.getInt(5) == 1))
    assert(u1.dropRight(1).forall(_.getInt(5) == 0))
    val u2 = res.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2.head.getInt(5) == 1)
  }

  test("scdHistory on the corpus: versions dense, runs compacted, one current each") {
    val res = EventAnalytics.scdHistory(Tables.events(spark, sfDir)).collect()
    val byUser = res.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length))
      // compaction invariant: consecutive versions never share a state
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2))
        case _ => ()
      }
      assert(sorted.count(_.getInt(5) == 1) == 1)
      assert(sorted.last.isNullAt(4))
    }
  }

  // ---- q114 funnel ---------------------------------------------------

  test("funnel: steps must happen strictly after the previous step") {
    val df = eventsDf(Seq(
      // user 1 converts fully: view → click → purchase
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "click"),
      (3L, "2024-01-01 10:10:00", 1L, "purchase"),
      // user 2: purchase BEFORE the first view — step 3 not reached
      (4L, "2024-01-01 09:00:00", 2L, "purchase"),
      (5L, "2024-01-01 10:00:00", 2L, "view"),
      (6L, "2024-01-01 10:05:00", 2L, "click"),
      // user 3: view only
      (7L, "2024-01-01 11:00:00", 3L, "view"),
      // user 4: click without any view — enters no step
      (8L, "2024-01-01 11:00:00", 4L, "click")))
    val res = EventAnalytics.funnel(df).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(res.toSeq == Seq(
      (1, "view", 3L, 1.0),      // users 1, 2, 3
      (2, "click", 2L, 0.6667),  // users 1, 2 (user 4 had no view)
      (3, "purchase", 1L, 0.5))) // user 1 only (user 2's purchase was early)
  }

  test("funnel: simultaneous events do NOT advance (strict inequality)") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:00", 1L, "click"))) // same instant as the view
    val res = EventAnalytics.funnel(df, Seq("view", "click")).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(res.toSeq == Seq((1, 1L), (2, 0L)))
  }

  test("funnel on the events table: monotone counts, rates in (0,1]") {
    val res = EventAnalytics.funnel(Tables.events(spark, sfDir)).collect()
    assert(res.length == 3)
    val users = res.map(_.getLong(2))
    assert(users.zip(users.tail).forall { case (a, b) => b <= a })
    assert(res.map(_.getDouble(3)).forall(c => c > 0.0 && c <= 1.0))
  }

  // ---- q115 retention cohorts ----------------------------------------

  test("retentionCohorts: offsets count whole weeks from the first-touch week") {
    val df = eventsDf(Seq(
      // user 1 first seen week of Mon 2024-01-01; active weeks 0 and 2
      (1L, "2024-01-02 10:00:00", 1L, "view"),
      (2L, "2024-01-17 10:00:00", 1L, "view"),
      // user 2 same cohort, week 0 only (two events, one distinct user)
      (3L, "2024-01-03 10:00:00", 2L, "click"),
      (4L, "2024-01-05 10:00:00", 2L, "view"),
      // user 3 cohort of Mon 2024-01-08, week 1
      (5L, "2024-01-08 10:00:00", 3L, "view"),
      (6L, "2024-01-15 10:00:00", 3L, "view")))
    val res = EventAnalytics.retentionCohorts(df).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(res.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 1, 1L)))
  }

  test("retentionCohorts on the events table: offset 0 has every cohort user") {
    val ev = Tables.events(spark, sfDir)
    val res = EventAnalytics.retentionCohorts(ev)
    val week0 = res.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    val users = ev.select(countDistinct("user_id")).as[Long].head()
    assert(week0 == users) // everyone is active in their own first week
  }

  // ---- q117 trend regression -------------------------------------------

  test("activityTrend: recovers an exact linear daily ramp") {
    // type 'a': 1 event on day 0, 2 on day 1, 3 on day 2 → slope 1,
    // intercept 1, r² 1; type 'b': constant 2/day → slope 0, r² NaN→null?
    val rows = (0 until 3).flatMap { d =>
      (0 to d).map(k => (d * 10L + k, f"2024-01-${d + 1}%02d 0$k:00:00", 1L, "a"))
    } ++ (0 until 3).flatMap { d =>
      (0 to 1).map(k => (100 + d * 10L + k, f"2024-01-${d + 1}%02d 1$k:00:00", 2L, "b"))
    }
    val res = EventAnalytics.activityTrend(eventsDf(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(res.toSeq == Seq(("a", 3L, 1.0, 1.0), ("b", 3L, 0.0, 2.0)))
  }

  test("activityTrend on the events table: every type covers the full month") {
    val res = EventAnalytics.activityTrend(Tables.events(spark, sfDir)).collect()
    assert(res.length == 5)
    assert(res.forall(_.getLong(1) >= 28)) // daily coverage, Jan 2024
    assert(res.forall(r => !r.isNullAt(2) && r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  // ---- q118 KS test ------------------------------------------------------

  test("ksTest: identical distributions give 0, disjoint ones give 1") {
    val same = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "purchase")))
      // both samples hold the single value 1.0 → same bin → KS = 0
    val r0 = EventAnalytics.ksTest(same).collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(3)) == (1L, 1L, 0.0))

    import org.apache.spark.sql.functions.{col, when => w}
    val disjoint = same.withColumn("value",
      w(col("event_type") === "purchase", 100.0).otherwise(1.0))
    val r1 = EventAnalytics.ksTest(disjoint).collect().head
    assert(r1.getDouble(3) == 1.0) // CDFs never overlap below the max gap
  }

  test("ksTest on the events table: statistic in [0,1], bins bounded by range") {
    val r = EventAnalytics.ksTest(Tables.events(spark, sfDir)).collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getLong(2) <= 1200) // value range ~[0, 500) / 0.5-wide bins
  }

  // ---- q125 conversion latency -------------------------------------------

  test("conversionLatency: exact interpolated percentiles over whole-second latencies") {
    val df = eventsDf(Seq(
      // user 1 converts in 120 s
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:30", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "purchase"),
      // user 2 converts in 60 s
      (4L, "2024-01-01 11:00:00", 2L, "view"),
      (5L, "2024-01-01 11:00:10", 2L, "click"),
      (6L, "2024-01-01 11:01:00", 2L, "purchase"),
      // user 3 never purchases — excluded
      (7L, "2024-01-01 12:00:00", 3L, "view"),
      (8L, "2024-01-01 12:00:05", 3L, "click")))
    val res = EventAnalytics.conversionLatency(df).collect()
    assert(res.length == 1)
    val r = res.head
    assert(r.getDate(0).toString == "2024-01-01") // Monday of the t1 week
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 90.0)  // cont-interpolated median of {60, 120}
    assert(r.getDouble(3) == 114.0) // 60 + 0.9·(120−60)
  }

  test("conversionLatency on the events table: positive latencies, cohorts cover converters") {
    val res = EventAnalytics.conversionLatency(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(1) > 0))
    assert(res.forall(r => r.getDouble(2) > 0 && r.getDouble(3) >= r.getDouble(2)))
    val totalConverted = res.map(_.getLong(1)).sum
    val funnelLast = EventAnalytics.funnel(Tables.events(spark, sfDir))
      .collect().last.getLong(2)
    assert(totalConverted == funnelLast) // same chain, same converters
  }

  // ---- q123 rolling WAU --------------------------------------------------

  test("rollingActiveUsers: trailing window counts distinct users, clipped at max day") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "view"),  // same (day,user): no double count
      (3L, "2024-01-03 10:00:00", 2L, "view"),
      (4L, "2024-01-10 10:00:00", 1L, "view")))
    val res = EventAnalytics.rollingActiveUsers(df).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(res("2024-01-01") == 1L) // user 1
    assert(res("2024-01-03") == 2L) // users 1 (Jan 1 ∈ trailing 7d) and 2
    assert(res("2024-01-07") == 2L) // Jan 1 still inside [Jan 1, Jan 7]
    assert(res("2024-01-08") == 1L) // user 1's Jan 1 presence aged out
    assert(res("2024-01-09") == 1L) // user 2's Jan 3 presence still in
    assert(res("2024-01-10") == 1L) // only user 1's fresh presence remains
    assert(!res.contains("2024-01-11")) // past the corpus's last day
  }

  test("rollingActiveUsers on the events table: WAU >= DAU, bounded by user count") {
    val ev = Tables.events(spark, sfDir)
    val wau = EventAnalytics.rollingActiveUsers(ev)
    val dau = ev.select(to_date(col("ts")).as("report_day"), col("user_id"))
      .groupBy("report_day").agg(countDistinct("user_id").as("dau"))
    val joined = wau.join(dau, Seq("report_day")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(1) >= r.getLong(2)))
    val total = ev.select(countDistinct("user_id")).as[Long].head()
    assert(joined.forall(_.getLong(1) <= total))
  }

  // ---- q124 chi-square -----------------------------------------------------

  test("chiSquare: independent margins give 0; concentrated cells blow up") {
    // 2 types x 2 days, perfectly independent (every cell = product of
    // margins / n): chi2 = 0
    val indep = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),      // Mon
      (2L, "2024-01-02 10:00:00", 1L, "view"),      // Tue
      (3L, "2024-01-01 11:00:00", 1L, "click"),
      (4L, "2024-01-02 11:00:00", 1L, "click")))
    val r0 = EventAnalytics.chiSquare(indep).collect().head
    assert((r0.getLong(0), r0.getLong(1), r0.getDouble(2)) == (4L, 1L, 0.0))

    // all views Monday, all clicks Tuesday → maximal association:
    // chi2 = n for a 2x2 table
    val dep = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 1L, "view"),
      (3L, "2024-01-02 10:00:00", 1L, "click"),
      (4L, "2024-01-02 11:00:00", 1L, "click")))
    val r1 = EventAnalytics.chiSquare(dep).collect().head
    assert(r1.getDouble(2) == 4.0)
  }

  test("chiSquare on the events table: full 5x7 table, near-uniform corpus") {
    val r = EventAnalytics.chiSquare(Tables.events(spark, sfDir)).collect().head
    assert(r.getLong(1) == 24L) // (5-1)*(7-1)
    assert(r.getDouble(2) >= 0.0)
  }

  // ---- q116 transitions ------------------------------------------------

  test("eventTransitions: counts consecutive pairs per user, rows sum to 1") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "view"),
      (3L, "2024-01-01 10:02:00", 1L, "click"),
      (4L, "2024-01-01 10:00:00", 2L, "view"),
      (5L, "2024-01-01 10:01:00", 2L, "click"),
      // user 3's single event yields no transition
      (6L, "2024-01-01 10:00:00", 3L, "purchase")))
    val res = EventAnalytics.eventTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(res.toSeq == Seq(
      ("view", "click", 2L, 0.666667),
      ("view", "view", 1L, 0.333333)))
  }

  test("eventTransitions: ties on ts break by event_id") {
    val df = eventsDf(Seq(
      (2L, "2024-01-01 10:00:00", 1L, "click"),
      (1L, "2024-01-01 10:00:00", 1L, "view"))) // same ts, lower id first
    val res = EventAnalytics.eventTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(res.toSeq == Seq(("view", "click", 1L)))
  }

  test("eventTransitions on the events table: probabilities sum to 1 per from_type") {
    val sums = EventAnalytics.eventTransitions(Tables.events(spark, sfDir))
      .groupBy("from_type").agg(sum("p").as("s")).select("s").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-3))
  }

  // ---- q131 time-weighted average ------------------------------------

  private def valuedEvents(rows: Seq[(Long, String, Long, Double)]) =
    rows.map { case (id, t, u, v) => (id, ts(t), u, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("timeWeightedAvg: LOCF weights, single-event and zero-span users excluded") {
    val df = valuedEvents(Seq(
      // user 1: v=10 holds 10 s, v=20 holds 30 s, last carries nothing
      (1L, "2024-01-01 10:00:00", 1L, 10.0),
      (2L, "2024-01-01 10:00:10", 1L, 20.0),
      (3L, "2024-01-01 10:00:40", 1L, 99.0),
      // user 2: single event — no span
      (4L, "2024-01-01 10:00:00", 2L, 5.0),
      // user 3: two events inside one second — zero span
      (5L, "2024-01-01 10:00:00", 3L, 1.0),
      (6L, "2024-01-01 10:00:00", 3L, 2.0)))
    val res = EventAnalytics.timeWeightedAvg(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(res.keySet == Set(1L))
    assert(res(1L) == ((3L, 40L, 17.5))) // (10·10 + 20·30) / 40
  }

  test("timeWeightedAvg: within-second order is whole-second + event_id (parity rule)") {
    val df = valuedEvents(Seq(
      // ids disagree with sub-second ts order inside 10:00:00 —
      // the contract orders by (sec, event_id), so id 99 comes first
      // and takes the zero weight; id 100 bridges the 5 s gap
      (100L, "2024-01-01 10:00:00.9", 7L, 1.0),
      (99L, "2024-01-01 10:00:00.1", 7L, 2.0),
      (101L, "2024-01-01 10:00:05", 7L, 0.0)))
    val res = EventAnalytics.timeWeightedAvg(df).collect()
    assert(res.length == 1)
    assert(res(0).getLong(1) == 3L && res(0).getLong(2) == 5L)
    assert(res(0).getDouble(3) == 1.0) // id 100's value rides the span
  }

  test("timeWeightedAvg on the events table: spans positive, TWA within value range") {
    val res = EventAnalytics.timeWeightedAvg(Tables.events(spark, sfDir))
    val rows = res.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) > 0))
    val (lo, hi) = {
      val mm = Tables.events(spark, sfDir)
        .agg(min("value"), max("value")).collect()(0)
      (mm.getDouble(0), mm.getDouble(1))
    }
    assert(rows.forall { r =>
      val v = r.getDouble(3); v >= lo - 1e-9 && v <= hi + 1e-9 })
  }

  // ---- q150 event-type association rules -----------------------------

  test("eventAssociations: support/confidence/lift on a hand-computed basket set") {
    // user 1: {a,b}, user 2: {a}, user 3: {a,b,c}
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "a"), (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "a"), // duplicate event, same basket
      (4L, "2024-01-01 11:00:00", 2L, "a"),
      (5L, "2024-01-01 12:00:00", 3L, "a"), (6L, "2024-01-01 12:01:00", 3L, "b"),
      (7L, "2024-01-01 12:02:00", 3L, "c")))
    val r = EventAnalytics.eventAssociations(df).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(5), x.getDouble(6), x.getDouble(7),
          x.getDouble(8)))).toMap
    assert(r.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // (a,b): n_ab=2 of 3 users; conf a→b 2/3, b→a 2/2; lift 2·3/(3·2)=1
    assert(r(("a", "b")) == ((2L, 0.6667, 0.6667, 1.0, 1.0)))
    // (b,c): n_ab=1; conf b→c 1/2, c→b 1/1; lift 1·3/(2·1)=1.5
    assert(r(("b", "c")) == ((1L, 0.3333, 0.5, 1.0, 1.5)))
    assert(r(("a", "c")) == ((1L, 0.3333, 0.3333, 1.0, 1.0)))
  }

  test("eventAssociations on the events table: full pair grid, ratios in range") {
    val ev = Tables.events(spark, sfDir)
    val types = ev.select("event_type").distinct().count().toInt
    val r = EventAnalytics.eventAssociations(ev).collect()
    // near-uniform synthetic corpus: every pair co-occurs somewhere
    assert(r.length == types * (types - 1) / 2)
    r.foreach { x =>
      assert(x.getDouble(5) > 0 && x.getDouble(5) <= 1)
      assert(x.getDouble(6) > 0 && x.getDouble(6) <= 1)
      assert(x.getDouble(7) > 0 && x.getDouble(7) <= 1)
      assert(x.getDouble(8) > 0, s"non-positive lift: $x")
    }
  }

  // ---- q186 interpolation at probes ----------------------------------

  test("interpolateAtProbes: exact midpoint, same-second degeneracy, LOCF/backfill edges") {
    def ev(id: Long, t: String, u: Long, ty: String, v: Double) =
      (id, ts(t), u, ty, v, "{}")
    val df = Seq(
      ev(1L, "2024-01-01 10:00:00", 1L, "view", 10.0),
      ev(2L, "2024-01-01 10:00:30", 1L, "purchase", 0.0), // midpoint → 15.0
      ev(3L, "2024-01-01 10:01:00", 1L, "view", 20.0),
      ev(4L, "2024-01-01 10:01:00", 1L, "purchase", 0.0), // same second: Δt=0 → 20.0
      ev(8L, "2024-01-01 10:30:00", 1L, "view", 40.0),
      ev(5L, "2024-01-01 11:00:00", 1L, "purchase", 0.0), // after last → locf 40.0
      ev(6L, "2024-01-01 09:00:00", 1L, "purchase", 0.0), // before first → backfill 10.0
      ev(7L, "2024-01-01 12:00:00", 2L, "purchase", 0.0)) // no readings → none
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = EventAnalytics.interpolateAtProbes(df).collect()
      .map(r => (r.getLong(0), r.getString(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toSeq
    assert(res(0) == ((2L, "interp", 15.0)))
    assert(res(1) == ((4L, "interp", 20.0)))
    assert(res(2) == ((5L, "locf", 40.0)))
    assert(res(3) == ((6L, "backfill", 10.0)))
    assert(res(4)._2 == "none" && res(4)._3.isNaN)
  }

  test("interpolateAtProbes on the corpus: interp values inside the bracket") {
    val events = Tables.events(spark, sfDir)
    val res = EventAnalytics.interpolateAtProbes(events).collect()
    assert(res.length == events.filter(col("event_type") === "purchase").count())
    val vals = events.filter(col("event_type") === "view")
      .agg(min("value"), max("value")).head()
    val (lo, hi) = (vals.getDouble(0), vals.getDouble(1))
    res.filter(r => !r.isNullAt(4)).foreach { r =>
      assert(r.getDouble(4) >= lo - 1e-9 && r.getDouble(4) <= hi + 1e-9, r)
    }
  }

  // ---- q180 top session paths ----------------------------------------

  test("topSessionPaths: event-time order, gap split, prefix cap, tie order") {
    val df = eventsDf(Seq(
      // u1 session: view > click > purchase (order by sec, not id)
      (3L, "2024-01-02 10:02:00", 1L, "purchase"),
      (1L, "2024-01-02 10:00:00", 1L, "view"),
      (2L, "2024-01-02 10:01:00", 1L, "click"),
      // u2: same journey
      (4L, "2024-01-03 09:00:00", 2L, "view"),
      (5L, "2024-01-03 09:05:00", 2L, "click"),
      (6L, "2024-01-03 09:06:00", 2L, "purchase"),
      // u3: 1-hour gap → two single-event sessions
      (7L, "2024-01-04 09:00:00", 3L, "view"),
      (8L, "2024-01-04 10:30:01", 3L, "view"),
      // u4: 10 clicks in one session → path capped at 8
      ) ++ (1 to 10).map(i => (100L + i, f"2024-01-05 10:$i%02d:00", 4L, "click")))
    val res = EventAnalytics.topSessionPaths(df).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(res.toSeq == Seq(
      ("view", 2L),
      ("click>click>click>click>click>click>click>click", 1L),
      ("view>click>purchase", 2L)).sortBy { case (p, n) => (-n, p) })
  }

  test("topSessionPaths on the corpus: ≤ 20 rows, counts descend, caps hold") {
    val res = EventAnalytics.topSessionPaths(Tables.events(spark, sfDir)).collect()
    assert(res.length <= 20 && res.nonEmpty)
    val counts = res.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    res.foreach(r => assert(r.getString(0).split(">").length <= 8))
  }

  // ---- q179 peak concurrency -----------------------------------------

  test("peakConcurrency: overlap peak, midnight clipping, gap-split sessions") {
    val df = eventsDf(Seq(
      (1L, "2024-01-02 10:00:00", 1L, "view"),  // u1 session 10:00–10:10
      (2L, "2024-01-02 10:10:00", 1L, "view"),
      (3L, "2024-01-02 10:05:00", 2L, "view"),  // u2 inside u1's span → peak 2
      (4L, "2024-01-02 12:00:00", 3L, "view"),  // u3 later, alone
      (5L, "2024-01-03 23:50:00", 4L, "view"),  // u4 crosses midnight
      (6L, "2024-01-04 00:10:00", 4L, "view"),  //   (20-min gap: one session)
      (7L, "2024-01-05 09:00:00", 5L, "view"),  // u5: 1-hour gap → TWO
      (8L, "2024-01-05 10:00:00", 5L, "view"))) //   sessions, never overlap
    def sec(s: String) = ts(s).getTime / 1000L
    val res = EventAnalytics.peakConcurrency(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(res.toSeq == Seq(
      ("2024-01-02", 3L, 2L, sec("2024-01-02 10:05:00")),
      ("2024-01-03", 1L, 1L, sec("2024-01-03 23:50:00")),
      // the carried-over session re-enters at the day-4 boundary
      ("2024-01-04", 1L, 1L, sec("2024-01-04 00:00:00")),
      ("2024-01-05", 2L, 1L, sec("2024-01-05 09:00:00"))))
  }

  test("peakConcurrency on the corpus: peaks within [1, n_sessions]") {
    val res = EventAnalytics.peakConcurrency(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1), r)
    }
  }

  // ---- q178 multi-touch attribution ----------------------------------

  test("multiTouchAttribution: recency ranks, lookback cutoff, same-second exclusion") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click"),  // > 7 days before: out
      (2L, "2024-01-09 10:00:00", 1L, "click"),  // rank 2 → 1/4
      (3L, "2024-01-10 09:00:00", 1L, "view"),   // rank 1 → 1/2
      (4L, "2024-01-10 10:00:00", 1L, "purchase"),
      (5L, "2024-01-05 10:00:00", 2L, "click"),  // same second as purchase
      (6L, "2024-01-05 10:00:00", 2L, "purchase"))) // strictly-before: out
    val res = EventAnalytics.multiTouchAttribution(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(res.toSeq == Seq(("click", 1L, 0L, 0.25), ("view", 1L, 1L, 0.5)))
  }

  test("multiTouchAttribution on the corpus: credit is an exact dyadic sum") {
    val res = EventAnalytics.multiTouchAttribution(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      // every credit is a multiple of 2^-20 — the exactness invariant
      val scaled = r.getDouble(3) * (1L << 20)
      assert(scaled == math.rint(scaled), s"non-dyadic credit: $r")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  // ---- q177 CUSUM changepoint ----------------------------------------

  test("cusumChangepoint: hand-computed level shift, zero-filled gaps, flat-series tie") {
    // type a: 1,1,5,5 → S·n = −8,−16,−8,0 → peak day 2, below, −16
    // type b: 2,_,_,2 → zero-filled 2,0,0,2 → S·n = 4,0,−4,0 →
    //         |4| ties at days 1 and 3 → earliest wins: day 1, above
    // type c: 1,1,1,1 → all zero → day 1, above, 0
    var id = 0L
    def burst(day: Int, ty: String, k: Int) = (1 to k).map { _ =>
      id += 1; (id, s"2024-01-0$day 10:00:00", id, ty)
    }
    val rows = burst(1, "a", 1) ++ burst(2, "a", 1) ++ burst(3, "a", 5) ++
      burst(4, "a", 5) ++ burst(1, "b", 2) ++ burst(4, "b", 2) ++
      (1 to 4).flatMap(d => burst(d, "c", 1))
    val res = EventAnalytics.cusumChangepoint(eventsDf(rows)).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDate(2).toString,
        r.getLong(3), r.getString(4)))
    assert(res.toSeq == Seq(
      ("a", 4, "2024-01-02", -16L, "below"),
      ("b", 4, "2024-01-01", 4L, "above"),
      ("c", 4, "2024-01-01", 0L, "above")))
  }

  test("cusumChangepoint on the corpus: shared calendar, exact-zero total CUSUM") {
    val res = EventAnalytics.cusumChangepoint(Tables.events(spark, sfDir)).collect()
    assert(res.nonEmpty)
    val nDays = res.map(_.getInt(1)).distinct
    assert(nDays.length == 1, "all types share the global calendar")
    res.foreach(r => assert(r.getString(4) == "above" || r.getString(4) == "below"))
  }

  // ---- q214 CDC log compaction ---------------------------------------

  test("cdcCompact: last writer wins, tombstones null, delete-then-insert resurrects") {
    def ev(id: Long, t: String, u: Long, ty: String, v: Double) =
      (id, ts(t), u, ty, v, "{}")
    val df = Seq(
      // u1: I(10) then U(25) → alive at 25
      ev(1, "2024-01-01 10:00:00", 1, "signup", 10.0),
      ev(2, "2024-01-01 11:00:00", 1, "purchase", 25.0),
      // u2: I then D → dead, value null
      ev(3, "2024-01-01 10:00:00", 2, "signup", 10.0),
      ev(4, "2024-01-02 10:00:00", 2, "error", 0.0),
      // u3: D then I → resurrected
      ev(5, "2024-01-01 10:00:00", 3, "error", 0.0),
      ev(6, "2024-01-01 12:00:00", 3, "signup", 7.5),
      // u4: same-second tie → higher event_id wins
      ev(7, "2024-01-01 10:00:00", 4, "purchase", 1.0),
      ev(8, "2024-01-01 10:00:00", 4, "purchase", 2.0),
      // u5: only reads → absent from the compacted state
      ev(9, "2024-01-01 10:00:00", 5, "view", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.cdcCompact(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert((r(1L).getLong(1), r(1L).getInt(3), r(1L).getDouble(4)) == ((2L, 1, 25.0)))
    assert((r(2L).getLong(2), r(2L).getInt(3)) == ((1L, 0)))
    assert(r(2L).isNullAt(4))
    assert((r(3L).getInt(3), r(3L).getDouble(4)) == ((1, 7.5)))
    assert(r(4L).getDouble(4) == 2.0)
  }

  // ---- q221 WOE / information value ----------------------------------

  test("woeAudit: hand-computed WOE on a perfectly separating feature") {
    // users u=1..10 with u observation events; holdout purchase of
    // $1 (u <= 5) vs $100 (u >= 6) → median split labels 6..10 hi.
    // Quintiles of 1..10 put {1,2} in bin 1 (0/2 hi): woe =
    // ln((0.5/5)/(2.5/5)) = −ln 5, iv_term = (0/5 − 2/5)·(−ln 5).
    val rows = (1 to 10).flatMap { u =>
      (1 to u).map(i => ((u * 100 + i).toLong,
        ts(f"2024-01-0${1 + (i - 1) % 6}%01d 10:${i % 60}%02d:00"), u.toLong,
        "view", 1.0, "{}"))
    } ++ (1 to 10).map(u => ((u * 100 + 99).toLong,
      ts("2024-01-20 10:00:00"), u.toLong, "purchase",
      if (u >= 6) 100.0 else 1.0, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.woeAudit(df).collect()
      .map(x => x.getInt(0) -> x).toMap
    assert(r.keySet == Set(1, 2, 3, 4, 5))
    assert((r(1).getLong(1), r(1).getLong(2)) == ((2L, 0L)))
    assert(r(1).getDouble(3) == 0.0)
    assert(r(1).getDouble(4) == -1.6094)         // −ln 5, floor-4dp
    assert(r(1).getDouble(5) == 0.643775)        // 0.4·ln 5, floor-6dp
    assert(r(5).getLong(2) == 2L)                // high-activity bin is all hi
    assert(r(5).getDouble(4) > 0)
  }

  test("woeAudit on the corpus: five bins partition the users, both classes present") {
    val r = EventAnalytics.woeAudit(Tables.events(spark, sfDir)).collect()
    // tied quintile thresholds can empty a bin at tiny scale — the
    // emitted bins are a nonempty subset of 1..5
    val bins = r.map(_.getInt(0)).sorted.toSeq
    assert(bins.nonEmpty && bins.forall((1 to 5).contains) && bins == bins.distinct)
    val labeled = EventAnalytics.churnLabels(Tables.events(spark, sfDir))
    assert(r.map(_.getLong(1)).sum == labeled.count())
    val hi = r.map(_.getLong(2)).sum
    assert(hi > 0 && hi < r.map(_.getLong(1)).sum,
      "the median split must produce both classes")
  }

  // ---- q230 inter-arrival latency SLO --------------------------------

  test("latencySlo: hand-built gaps give exact interpolated percentiles") {
    // one user, one type, events at 0/10/30/70/150 s → gaps
    // {10, 20, 40, 80}: p50 = 30 (midpoint 20..40), p90 interpolates
    // 40..80 at 0.7 → 68, max 80.
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:10", 1L, "view"),
      (3L, "2024-01-01 10:00:30", 1L, "view"),
      (4L, "2024-01-01 10:01:10", 1L, "view"),
      (5L, "2024-01-01 10:02:30", 1L, "view")))
    val r = EventAnalytics.latencySlo(df).collect()
    assert(r.length == 1)
    val x = r.head
    assert(x.getLong(1) == 4L)
    assert(x.getDouble(2) == 30.0)
    assert(x.getDouble(3) == 68.0)
    assert(x.getLong(5) == 80L)
  }

  test("latencySlo on the corpus: ordered tails per type") {
    val r = EventAnalytics.latencySlo(Tables.events(spark, sfDir)).collect()
    assert(r.length == 5)
    r.foreach { x =>
      assert(x.getDouble(2) <= x.getDouble(3) && x.getDouble(3) <= x.getDouble(4))
      assert(x.getDouble(4) <= x.getLong(5))
      assert(x.getDouble(2) > 0)
    }
  }

  // ---- q228 session entry/exit/bounce --------------------------------

  test("sessionEntryExit: entries, exits and bounces per hand-built session") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view"),     // S1: view → click
      (2L, "2024-01-01 10:10:00", 1L, "click"),
      (3L, "2024-01-01 12:00:00", 1L, "purchase"), // S2: purchase bounce
      (4L, "2024-01-01 10:00:00", 2L, "click")))   // S3: click bounce
    val r = EventAnalytics.sessionEntryExit(df).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("view", "click", "purchase"))
    assert((r("view").getLong(1), r("view").getLong(2), r("view").getLong(3),
      r("view").getDouble(4)) == ((1L, 0L, 0L, 0.0)))
    assert((r("click").getLong(1), r("click").getLong(2), r("click").getLong(3),
      r("click").getDouble(4)) == ((1L, 2L, 1L, 1.0)))
    assert((r("purchase").getLong(1), r("purchase").getLong(2),
      r("purchase").getLong(3), r("purchase").getDouble(4)) == ((1L, 1L, 1L, 1.0)))
  }

  test("sessionEntryExit on the corpus: entries = exits = sessions; bounces bounded") {
    val r = EventAnalytics.sessionEntryExit(Tables.events(spark, sfDir)).collect()
    val (en, ex, bo) = (r.map(_.getLong(1)).sum, r.map(_.getLong(2)).sum,
      r.map(_.getLong(3)).sum)
    assert(en == ex, "every session has exactly one entry and one exit")
    assert(bo <= en)
    val sessions = graft.operators.Aggregates.sessionize(Tables.events(spark, sfDir))
      .select("user_id", "session_idx").distinct().count()
    assert(en == sessions)
  }

  // ---- q227 time-constrained funnel ----------------------------------

  test("timedFunnel: the window disqualifies late steps the plain funnel counts") {
    val df = eventsDf(Seq(
      // u1: view → click 30 min → purchase 30 min: full pass
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:30:00", 1L, "click"),
      (3L, "2024-01-01 11:00:00", 1L, "purchase"),
      // u2: click 2 h after the view — ordered, but outside the window
      (4L, "2024-01-01 10:00:00", 2L, "view"),
      (5L, "2024-01-01 12:00:00", 2L, "click"),
      (6L, "2024-01-01 12:30:00", 2L, "purchase"),
      // u3: click in window, purchase 100 min after the click — drops at 3
      (7L, "2024-01-01 10:00:00", 3L, "view"),
      (8L, "2024-01-01 10:10:00", 3L, "click"),
      (9L, "2024-01-01 11:50:00", 3L, "purchase")))
    val r = EventAnalytics.timedFunnel(df).collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1))).toSeq ==
      Seq((1, 3L), (2, 2L), (3, 1L)))
    // step latencies: clicks at 30 and 10 min → median 20 min
    assert(r(1).getDouble(2) == 1200.0)
    assert(r(2).getDouble(2) == 1800.0)
    assert(r(1).getDouble(3) == 0.6667 && r(2).getDouble(3) == 0.5)
    // the unconstrained funnel would count u2/u3 at every step
    val plain = EventAnalytics.funnel(df).collect()
    assert(plain.map(_.getLong(2)).toSeq == Seq(3L, 3L, 3L))
  }

  test("timedFunnel on the corpus: monotone counts, latencies inside the window") {
    val r = EventAnalytics.timedFunnel(Tables.events(spark, sfDir)).collect()
    val u = r.map(_.getLong(1))
    assert(u.zip(u.tail).forall { case (a, b) => a >= b })
    r.drop(1).filter(!_.isNullAt(2)).foreach { x =>
      assert(x.getDouble(2) > 0 && x.getDouble(2) <= 3600)
    }
  }

  // ---- q222 trending keys --------------------------------------------

  test("trendingKeys: smoothed log-lift orders new > rising > falling") {
    // span Jan 1-4 → halves {1,2} vs {3,4}. k=3 appears only in the
    // second half (lift ln 5), k=1 rises 1→4 (ln 3), k=2 falls 4→1
    // (−ln 3).
    var id = 0L
    def ev(day: Int, k: Int) = { id += 1
      (id, ts(f"2024-01-0$day%01d 10:00:00"), id % 7, "view", 1.0, s"""{"k": $k}""") }
    val rows = Seq(ev(1, 1)) ++ (1 to 4).map(_ => ev(3, 1)) ++
      (1 to 4).map(_ => ev(1, 2)) ++ Seq(ev(4, 2)) ++
      (1 to 2).map(_ => ev(4, 3))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.trendingKeys(df).collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (3, 0L, 2L, 1.6094), (1, 1L, 4L, 1.0986), (2, 4L, 1L, -1.0986)))
  }

  test("q173/q222 cached twins: materialized parsed-props frame ≡ self-computed") {
    import graft.operators.JsonRouting
    val ev = Tables.events(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-props").toString
    val dir = JsonRouting.propsDir(spark, s"$sfDir/events.parquet", base)
    // first touch builds, second reuses (the _SUCCESS gate)
    assert(JsonRouting.prebuildPropsLong(ev, dir), "first touch must build")
    assert(!JsonRouting.prebuildPropsLong(ev, dir), "second touch must reuse")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: cached and self-computed runs diverge")
    same(JsonRouting.propsProfileCached(ev, dir),
      JsonRouting.propsProfile(ev), "q173 props profile")
    same(EventAnalytics.trendingKeysCached(ev, dir),
      EventAnalytics.trendingKeys(ev), "q222 trending keys")
  }

  // ---- q223 lead-lag cross-correlation -------------------------------

  test("crossCorrelation: a series shifted by 2 days peaks at lag +2 with r = 1") {
    // purchases alternate 1/2 per day over Jan 1-10; errors replay the
    // same pattern 2 days later — the lag-2 pairs align perfectly.
    var id = 1000L
    def evs(day: Int, n: Int, ty: String) = (1 to n).map { _ =>
      id += 1; (id, ts(f"2024-01-${day}%02d 10:00:00"), id % 5, ty, 1.0, "{}") }
    val rows = (1 to 10).flatMap(d => evs(d, 1 + (d % 2), "purchase")) ++
      (3 to 10).flatMap(d => evs(d, 1 + ((d - 2) % 2), "error"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.crossCorrelation(df).collect()
      .map(x => x.getInt(0) -> (x.getLong(1), if (x.isNullAt(2)) Double.NaN else x.getDouble(2)))
      .toMap
    assert(r.size == 15)
    // n_days shrinks by |lag| off the 10-day spine
    assert(r(0)._1 == 10L && r(7)._1 == 3L && r(-7)._1 == 3L)
    assert(r(2)._2 == 1.0, s"lag +2 must align perfectly: ${r(2)}")
    assert(r(1)._2 < 1.0 && r(3)._2 < 1.0)
  }

  // ---- q218 Markov stationary distribution ---------------------------

  test("markovStationary: two-state chain converges to (4/5, 1/5)") {
    // one user, sequence A A A A B A → counts A→A 3, A→B 1, B→A 1:
    // P = [[3/4, 1/4], [1, 0]], stationary (0.8, 0.2); the second
    // eigenvalue is −1/4, so 8 iterations land within (1/4)^8 ≈ 2e-5.
    val seq = Seq("A", "A", "A", "A", "B", "A")
    val df = seq.zipWithIndex.map { case (ty, i) =>
      (i.toLong, ts(s"2024-01-01 10:0$i:00"), 1L, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.markovStationary(df).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r.keySet == Set("A", "B"))
    assert(math.abs(r("A") - 0.8) < 1e-3, r)
    assert(math.abs(r("B") - 0.2) < 1e-3, r)
  }

  test("markovStationary: an absorbing (destination-only) state keeps its mass") {
    // one user, A B A B C → A→B twice, B→A once, B→C once; C has no
    // outgoing transitions. Pre-fix, C was dropped from the state set
    // and the mass flowing into it vanished. Now C gets the standard
    // implicit self-loop: P = [[0,1,0],[.5,0,.5],[0,0,1]] — absorbing,
    // so after 8 steps nearly all mass sits on C (exact chain from
    // x0 = 1/3: C₈ = 0.958…), and total mass is conserved up to floor
    // leakage.
    val seq = Seq("A", "B", "A", "B", "C")
    val df = seq.zipWithIndex.map { case (ty, i) =>
      (i.toLong, ts(s"2024-01-01 10:0$i:00"), 1L, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.markovStationary(df).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r.keySet == Set("A", "B", "C"), s"absorbing C must appear: $r")
    assert(r("C")._2 > 0.9 && r("A")._2 < 0.05 && r("B")._2 < 0.06, r.toString)
    val mass = r.values.map(_._1).sum
    assert(mass <= 1000000000L && mass >= 1000000000L - 1000,
      s"self-loop must conserve mass up to floor leaks, got $mass")
  }

  test("markovStationary on the corpus: a near-stochastic mass vector over all types") {
    val r = EventAnalytics.markovStationary(Tables.events(spark, sfDir)).collect()
    assert(r.length == 5)
    val mass = r.map(_.getLong(1)).sum
    // floor leakage only: each of 8 steps loses < |S| units per target
    // state (per-term floors) plus the rate quantization's < |S| units
    // per source row — ≤ 8·(25 + 25) = 400 units of 1e-9 total
    assert(mass <= 1000000000L && mass >= 1000000000L - 400)
    r.foreach(x => assert(x.getDouble(2) >= 0 && x.getDouble(2) <= 1))
  }

  // ---- q216 leakage-safe churn labels --------------------------------

  test("churnLabels: temporal split — observation features, holdout label") {
    def ev(id: Long, t: String, u: Long, ty: String, v: Double) =
      (id, ts(t), u, ty, v, "{}")
    // max day = Jan 20 → cutoff = Jan 6. u1 active only on/before the
    // cutoff → churned; u2 active both sides → retained; u3 only in
    // the holdout → no training row at all.
    val df = Seq(
      ev(1, "2024-01-04 10:00:00", 1, "purchase", 10.0),
      ev(2, "2024-01-06 10:00:00", 1, "view", 1.0),
      ev(3, "2024-01-05 10:00:00", 2, "purchase", 20.0),
      ev(4, "2024-01-05 11:00:00", 2, "purchase", 2.5),
      ev(5, "2024-01-20 10:00:00", 2, "view", 1.0),
      ev(6, "2024-01-19 10:00:00", 3, "signup", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventAnalytics.churnLabels(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L))
    // u1: 2 events, 1 purchase, $10, 2 active days, recency 0, oldest 2, churned
    assert((r(1L).getLong(1), r(1L).getLong(2), r(1L).getDouble(3)) == ((2L, 1L, 10.0)))
    assert((r(1L).getLong(4), r(1L).getLong(5), r(1L).getLong(6), r(1L).getInt(7)) ==
      ((2L, 0L, 2L, 1)))
    // u2: both purchases same day, $22.50, recency 1, retained
    assert((r(2L).getLong(1), r(2L).getLong(2), r(2L).getDouble(3)) == ((2L, 2L, 22.5)))
    assert((r(2L).getLong(4), r(2L).getLong(5), r(2L).getInt(7)) == ((1L, 1L, 0)))
  }

  test("churnLabels on the corpus: features never see the holdout") {
    val events = Tables.events(spark, sfDir)
    val r = EventAnalytics.churnLabels(events).cache()
    assert(r.count() > 0)
    // churned users have, by definition, no holdout presence: total
    // events across labeled users equals the observation-window count
    val cutoff = events.agg(
      (max(unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("bigint") - 14))
      .head().getLong(0)
    val obs = events.filter(
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("bigint") <= cutoff)
    assert(r.agg(sum("n_events")).head().getLong(0) == obs.count())
    assert(r.count() == obs.select("user_id").distinct().count())
    assert(r.filter(col("recency_days") < 0 || col("oldest_gap") < col("recency_days"))
      .count() == 0)
    r.unpersist()
  }

  test("cdcCompact on the corpus: every changed user has one row, reads never count") {
    val events = Tables.events(spark, sfDir)
    val res = EventAnalytics.cdcCompact(events).cache()
    val changed = events
      .filter(col("event_type").isin("signup", "purchase", "error"))
    assert(res.count() == changed.select("user_id").distinct().count())
    assert(res.agg(sum("n_ops")).head().getLong(0) == changed.count())
    assert(res.filter(col("alive") === 0 && col("final_value").isNotNull).count() == 0)
    res.unpersist()
  }
}
