package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.RobustStats

/** Robust-statistics layer (q126–q129): MAD outlier gate, per-nation
  * Gini, Zipf slope, event-type entropy. Fixtures are hand-computable
  * closed forms (exact Zipf corpus → slope −1, uniform mix → ln 2,
  * single whale → known Gini); the DuckDB oracle covers sf-scale
  * engine parity.
  */
class RobustStatsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String, Long)]) =
    rows.map { case (id, text, src, n) => (id, text, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- q126 MAD outliers ---------------------------------------------

  test("madOutliers: median/MAD exact, single extreme flagged") {
    // lengths 1,2,3,4,100: median 3, |dev| = 2,1,0,1,97 → MAD 1;
    // only 100 has absdev > 3·MAD
    val df = docsDf((1 to 5).map(i =>
      (i.toLong, "t", "a", Seq(1L, 2L, 3L, 4L, 100L)(i - 1))))
    val r = RobustStats.madOutliers(df).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 5L)
    assert(r(0).getDouble(2) == 3.0)
    assert(r(0).getDouble(3) == 1.0)
    assert(r(0).getLong(4) == 1L)
  }

  test("madOutliers: even count interpolates the median") {
    // lengths 1,2,3,4: median 2.5, absdev 1.5,0.5,0.5,1.5 → MAD 1.0
    val df = docsDf((1 to 4).map(i => (i.toLong, "t", "a", i.toLong)))
    val r = RobustStats.madOutliers(df).collect()(0)
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 1.0 && r.getLong(4) == 0L)
  }

  test("madOutliers: a 10 MB whale does not move the gate (vs z-score it would)") {
    val df = docsDf((1 to 9).map(i => (i.toLong, "t", "a", 100L + i)) :+
      (10L, "t", "a", 10000000L))
    val r = RobustStats.madOutliers(df).collect()(0)
    assert(r.getDouble(2) == 105.5, "median unmoved by the whale")
    assert(r.getLong(4) == 1L, "whale itself is the only outlier")
  }

  // ---- q127 Gini -----------------------------------------------------

  test("gini: equal spend → 0, single whale → closed form") {
    val orders = Seq(
      // nation 1 customers 1..4 spend 10 each → G = 0
      (1L, 1L, 50.0), (2L, 2L, 10.0), (3L, 3L, 10.0), (4L, 4L, 10.0),
      // customer 1 spends 10 over two orders (splitting must not matter)
      (5L, 1L, -40.0),
      // nation 2: spends 0,0,0,10 → G = 2·(4·10)/(4·10) − 5/4 = 0.75
      (6L, 5L, 0.0), (7L, 6L, 0.0), (8L, 7L, 0.0), (9L, 8L, 10.0))
      .map { case (ok, ck, tp) =>
        (ok, ck, "F", tp, Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val customer = (1 to 8).map(i =>
      (i.toLong, s"c$i", if (i <= 4) 1 else 2, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = RobustStats.giniByNation(orders, customer).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(3)))).toMap
    assert(r(1) == ((4L, 0.0)))
    assert(r(2) == ((4L, 0.75)))
  }

  test("gini on the orders table: values in [0,1), all nations present") {
    val r = RobustStats.giniByNation(
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir)).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val g = x.getDouble(3)
      assert(g >= 0.0 && g < 1.0, s"gini $g out of range")
    }
  }

  // ---- q128 Zipf slope -----------------------------------------------

  test("zipfSlope: exact 1/rank corpus fits slope −1 with r² = 1") {
    // freqs 6,3,2 at ranks 1,2,3 = 6/rank exactly →
    // ln f = ln 6 − 1·ln rank
    val df = docsDf(Seq(
      (1L, "a a a a a a", "s", 11L),
      (2L, "b b b c c", "s", 9L)))
    val r = RobustStats.zipfSlope(df).collect()(0)
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == -1.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("zipfSlope: topK caps the frame; ties rank by token text") {
    // four equal-frequency tokens, topK=2 → ranks a=1, b=2 by text
    val df = docsDf(Seq((1L, "d c b a", "s", 7L)))
    val r = RobustStats.zipfSlope(df, topK = 2).collect()(0)
    assert(r.getLong(0) == 2L)
    // equal freqs → flat fit, slope 0
    assert(r.getDouble(1) == 0.0)
  }

  // ---- q129 event-type entropy ---------------------------------------

  private def eventsDf(rows: Seq[(Long, String, String)]) =
    rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (i.toLong, Timestamp.valueOf(t), u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("entropy: uniform two-type day → ln 2; single-type day → 0") {
    val df = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-02 11:00:00", "view")))
    val r = RobustStats.eventTypeEntropy(df).collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r("2024-01-01") == ((2L, 2L, 0.6931)))
    assert(r("2024-01-02") == ((2L, 1L, 0.0)))
  }

  test("entropy on the events table: 0 ≤ H ≤ ln(n_types)") {
    val r = RobustStats.eventTypeEntropy(Tables.events(spark, sfDir)).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val h = x.getDouble(3)
      val cap = math.log(x.getLong(2).toDouble)
      assert(h >= 0.0 && h <= cap + 1e-9, s"entropy $h exceeds ln(n_types) $cap")
    }
  }

  // ---- q136 PSI drift ------------------------------------------------

  test("psiDrift: a single source IS the corpus → PSI 0, shift 0") {
    val df = docsDf((1 to 6).map(i => (i.toLong, "t", "only", i * 40L)))
    val r = RobustStats.psiDrift(df).collect()
    assert(r.length == 1)
    assert(r(0).getDouble(4) == 0.0)
    assert(r(0).getDouble(3) == 0.0)
  }

  test("psiDrift: shifted source drifts positive, matching source near zero") {
    // "short" all in bin 0 (len 10), "long" all in bin 12 (len 900):
    // maximally separated → both PSI large; shifts have opposite sign
    val df = docsDf(
      (1 to 10).map(i => (i.toLong, "t", "short", 10L)) ++
        (11 to 20).map(i => (i.toLong, "t", "long", 900L)))
    val r = RobustStats.psiDrift(df).collect().map(x =>
      x.getString(0) -> ((x.getDouble(3), x.getDouble(4)))).toMap
    assert(r("short")._1 < 0 && r("long")._1 > 0)
    assert(r("short")._2 > 0.25 && r("long")._2 > 0.25)
  }

  test("psiDrift on the documents table: PSI ≥ 0, shifts sum to ~0 weighted") {
    val docs = Tables.documents(spark, sfDir)
    val r = RobustStats.psiDrift(docs).collect()
    assert(r.nonEmpty)
    r.foreach(x => assert(x.getDouble(4) >= 0.0, s"negative PSI: $x"))
    // n_docs-weighted mean shift is 0 by construction (vs corpus mean)
    val wsum = r.map(x => x.getLong(1) * x.getDouble(3)).sum
    val n = r.map(_.getLong(1)).sum
    assert(math.abs(wsum / n) < 0.01)
  }

  // ---- q147 anchored power-sum moments -------------------------------

  test("powerMoments: hand-computed mean/var/skew/kurtosis on a symmetric set") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => (i.toLong, Timestamp.valueOf("2024-01-01 10:00:00"),
        1L, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.powerMoments(df).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 4)
    // population moments of {1,2,3,4}: mean 2.5, var 1.25,
    // skew 0 (symmetric), kurtosis m4/m2² = 2.5625/1.5625 = 1.64 → ex −1.36
    assert(row.getDouble(2) == 2.5)
    assert(row.getDouble(3) == 1.25)
    assert(row.getDouble(4) == 0.0)
    assert(row.getDouble(5) == -1.36)
  }

  test("powerMoments on the events table: all types, positive variance, sane skew") {
    val r = RobustStats.powerMoments(Tables.events(spark, sfDir)).collect()
    assert(r.length == Tables.events(spark, sfDir)
      .select("event_type").distinct().count())
    r.foreach { x =>
      assert(x.getDouble(3) > 0, s"non-positive variance: $x")
      // value is right-skewed (mean ≈ 50, heavy upper tail)
      assert(x.getDouble(4) > 0, s"expected right skew: $x")
      assert(math.abs(x.getDouble(5)) < 50, s"wild kurtosis: $x")
    }
  }

  // ---- q162 Theil–Sen robust trend -----------------------------------

  test("theilSenTrend: median of pairwise slopes, outlier hour shrugged off") {
    // hours h, h+1, h+2 with counts 1, 2, 10:
    // slopes (2−1)/1 = 1, (10−1)/2 = 4.5, (10−2)/1 = 8 → median 4.5
    def burst(hour: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        Timestamp.valueOf(f"2024-01-01 $hour%02d:${10 + i}%02d:00"),
        1L, "view", 1.0, "{}"))
    val df = (burst(10, 1, 100) ++ burst(11, 2, 200) ++ burst(12, 10, 300))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.theilSenTrend(df).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3L)
    assert(r(0).getDouble(2) == 4.5)
  }

  test("theilSenTrend: even pair count interpolates the two middle slopes") {
    // counts 1,2,3,5 over consecutive hours → slopes sorted
    // 1, 1, 1, 4/3, 1.5, 2 → median = (1 + 4/3)/2 ≈ 1.1667
    def burst(hour: Int, n: Int, base: Long) =
      (0 until n).map(i => (base + i,
        Timestamp.valueOf(f"2024-01-01 $hour%02d:${10 + i}%02d:00"),
        1L, "view", 1.0, "{}"))
    val df = (burst(10, 1, 100) ++ burst(11, 2, 200) ++
      burst(12, 3, 300) ++ burst(13, 5, 400))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.theilSenTrend(df).collect()(0)
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == math.rint((1.0 + 4.0 / 3) / 2 * 1e4) / 1e4)
  }

  test("dailyOlsTrend: exact line recovered (slope, intercept, r2 = 1); types fit independently") {
    // type "lin": one event per day, value = 10 + 2·day → a perfect
    // line: slope 2, intercept 10, r² = 1. type "flat": constant 7 →
    // slope 0, intercept 7, r² NULL (vyy = 0).
    val rows = (0 until 5).flatMap { day =>
      Seq((100L + day, Timestamp.valueOf(f"2024-03-${day + 1}%02d 09:00:00"),
            1L, "lin", 10.0 + 2 * day, "{}"),
          (200L + day, Timestamp.valueOf(f"2024-03-${day + 1}%02d 10:00:00"),
            1L, "flat", 7.0, "{}"))
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.dailyOlsTrend(df).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("lin").getLong(1) == 5L)
    assert(r("lin").getDouble(2) == 2.0 && r("lin").getDouble(3) == 10.0 &&
      r("lin").getDouble(4) == 1.0)
    assert(r("flat").getDouble(2) == 0.0 && r("flat").getDouble(3) == 7.0 &&
      r("flat").isNullAt(4), "zero variance in y must yield r2 NULL, not NaN")
  }

  test("dailyOlsTrend: daily MEAN is fit (not the sum) and noise drops r2 below 1") {
    // day 0 has TWO events averaging 10 (8 and 12): the fit sees the
    // mean. days 0..3 means: 10, 12, 14, 17 — not collinear → r² < 1,
    // and the slope is the OLS closed form on the quantized means.
    val base = Seq(
      (1L, "2024-03-01 09:00:00", 8.0), (2L, "2024-03-01 10:00:00", 12.0),
      (3L, "2024-03-02 09:00:00", 12.0), (4L, "2024-03-03 09:00:00", 14.0),
      (5L, "2024-03-04 09:00:00", 17.0))
    val df = base.map { case (id, ts, v) =>
      (id, Timestamp.valueOf(ts), 1L, "m", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.dailyOlsTrend(df).collect()(0)
    assert(r.getLong(1) == 4L)
    // closed form over x=0..3, y=10,12,14,17: slope = 2.3, r² ≈ 0.9915
    assert(r.getDouble(2) == 2.3, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(4) > 0.98 && r.getDouble(4) < 1.0)
  }

  test("cupedAdjustedLift: hand-computed theta, lifts, and variance reduction") {
    // four users, one pre event (day 0) and one post event (day 20)
    // each: (x, y) pairs A = {(100,110), (200,230)}, B = {(150,170),
    // (250,280)}. Closed form (cents): cov = 4·15.25e8 − 70000·79000
    // = 5.7e8, vxx = 5e8 → theta = 1.14; lift_raw = (22500−17000)/100
    // = 55; lift_cuped = 55 − 1.14·50 = −2; vyy = 6.51e8 → rho² =
    // 32.49/32.55 = 0.99816 → 0.9982.
    val rows = Seq(
      (0L, 100.0, 110.0), (2L, 200.0, 230.0),   // grp A (even ids)
      (1L, 150.0, 170.0), (3L, 250.0, 280.0))   // grp B (odd ids)
      .flatMap { case (u, x, y) => Seq(
        (u * 10 + 1, Timestamp.valueOf("2024-03-01 10:00:00"), u, "m", x, "{}"),
        (u * 10 + 2, Timestamp.valueOf("2024-03-21 10:00:00"), u, "m", y, "{}")) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.cupedAdjustedLift(df).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.14, s"theta ${r.getDouble(2)}")
    assert(r.getDouble(3) == 55.0, s"lift_raw ${r.getDouble(3)}")
    assert(r.getDouble(4) == -2.0, s"lift_cuped ${r.getDouble(4)}")
    assert(r.getDouble(5) == 0.9982, s"var_reduction ${r.getDouble(5)}")
  }

  test("cupedAdjustedLift: users missing a period are excluded; vxx = 0 yields NULLs, not Inf/NaN") {
    // user 5 has ONLY a post event → excluded (n_a counts only user 0).
    // Both retained users share the SAME pre-period value (100.0) →
    // vxx = 0: theta/lift_cuped/var_reduction are undefined and must be
    // NULL (the dailyOlsTrend guard), never Infinity/NaN; lift_raw
    // needs no covariate and stays defined.
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 0L, "m", 100.0, "{}"),
      (2L, Timestamp.valueOf("2024-03-21 10:00:00"), 0L, "m", 120.0, "{}"),
      (3L, Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "m", 100.0, "{}"),
      (4L, Timestamp.valueOf("2024-03-21 10:00:00"), 1L, "m", 260.0, "{}"),
      (5L, Timestamp.valueOf("2024-03-21 10:00:00"), 5L, "m", 999.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.cupedAdjustedLift(rows).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L, "post-only user 5 excluded")
    assert(r.isNullAt(2), s"theta must be NULL at vxx=0, got ${r.get(2)}")
    assert(r.getDouble(3) == 140.0, s"lift_raw ${r.getDouble(3)}")
    assert(r.isNullAt(4), s"lift_cuped must be NULL at vxx=0, got ${r.get(4)}")
    assert(r.isNullAt(5), s"var_reduction must be NULL at vxx=0, got ${r.get(5)}")
  }

  test("theilSenTrend on the events table: pair counts match the grid exactly") {
    val ev = Tables.events(spark, sfDir)
    val r = RobustStats.theilSenTrend(ev).collect()
    assert(r.nonEmpty)
    val grid = ev.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.date_trunc("hour",
          org.apache.spark.sql.functions.col("ts"))).as("h"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      val h = grid(x.getString(0))
      assert(x.getLong(1) == h * (h - 1) / 2,
        s"pair count is not the full grid for ${x.getString(0)}")
    }
  }

  // ---- q190 deterministic permutation test ---------------------------

  test("permutationTest: extreme separation → minimal p; identical groups → p = 1") {
    import spark.implicits._
    // A = ten 100.0s, B = ten 1.0s: no relabeling can match |T_obs|
    // unless it re-picks exactly the A set (never among 200 draws) →
    // the add-one p-value floor 1/201
    val strong = ((1 to 10).map(i => (i.toLong, "purchase", 100.0)) ++
      (11 to 20).map(i => (i.toLong, "click", 1.0)))
      .toDF("event_id", "event_type", "value")
    val rs = RobustStats.permutationTest(strong).collect().head
    assert(rs.getLong(0) == 10L && rs.getLong(1) == 10L)
    assert(rs.getDouble(2) == 99.0)
    assert(rs.getLong(3) == 0L)
    assert(rs.getDouble(4) == math.rint(1e4 / 201.0) / 1e4)
    // all-equal values: every permuted statistic equals T_obs = 0 → p = 1
    val flat = (1 to 20).map(i =>
      (i.toLong, if (i <= 10) "purchase" else "click", 5.0))
      .toDF("event_id", "event_type", "value")
    val rf = RobustStats.permutationTest(flat).collect().head
    assert(rf.getDouble(2) == 0.0 && rf.getLong(3) == 200L && rf.getDouble(4) == 1.0)
  }

  test("permutationTest on the corpus: valid p, deterministic under repartition") {
    val ev = Tables.events(spark, sfDir)
    val a = RobustStats.permutationTest(ev).collect().head
    assert(a.getDouble(4) > 0 && a.getDouble(4) <= 1.0)
    val b = RobustStats.permutationTest(ev.repartition(13)).collect().head
    assert(a == b, "the md5 permutations are a pure function of the data")
  }

  // ---- q182 Hill tail index ------------------------------------------

  test("hillTailIndex: exact closed form on a geometric tail; flat tail → NULL") {
    // lengths 16,8,4,2 with k=3: x_ref = 2, Σ ln = ln 8 + ln 4 + ln 2
    // + ln 1 = 6·ln 2 → α = 3 / (6 ln 2) = 0.7213
    val df = docsDf(Seq((1L, "t", "a", 16L), (2L, "t", "a", 8L),
      (3L, "t", "a", 4L), (4L, "t", "a", 2L)))
    val r = RobustStats.hillTailIndex(df, k = 3).collect()
    assert(r.length == 1)
    assert(r(0).getInt(0) == 3 && r(0).getLong(1) == 2L)
    assert(r(0).getDouble(3) == 0.7213, r(0))
    // all-equal top: Σ = 0 → α undefined, NULL not NaN/∞
    val flat = docsDf((1 to 4).map(i => (i.toLong, "t", "a", 7L)))
    val rf = RobustStats.hillTailIndex(flat, k = 3).collect()
    assert(rf(0).getLong(2) == 0L && rf(0).isNullAt(3))
  }

  test("hillTailIndex on the corpus: positive finite alpha, one row") {
    val r = RobustStats.hillTailIndex(Tables.documents(spark, sfDir)).collect()
    assert(r.length == 1)
    assert(!r(0).isNullAt(3) && r(0).getDouble(3) > 0)
  }

  // ---- q224 difference-in-differences --------------------------------

  test("didEstimate: hand-built 2x2 — (25-10) - (8-5) = 12") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "purchase", 25.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "purchase", 5.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-03 11:00:00"), 2L, "purchase", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = RobustStats.didEstimate(df).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 1L, 1L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)) ==
      ((10.0, 25.0, 5.0, 8.0)))
    assert(r.getDouble(8) == 12.0)
  }

  test("didEstimate on the corpus: cells partition the events, identity holds") {
    val ev = Tables.events(spark, sfDir)
    val r = RobustStats.didEstimate(ev).head()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) == ev.count())
    val did = (r.getDouble(5) - r.getDouble(4)) - (r.getDouble(7) - r.getDouble(6))
    assert(math.abs(r.getDouble(8) - did) < 3e-4) // four floor-4dp roundings
  }

  // ---- q220 Poisson bootstrap ----------------------------------------

  test("poissonBootstrap: CI brackets the point mean; deterministic across runs") {
    val ev = Tables.events(spark, sfDir)
    val r1 = RobustStats.poissonBootstrap(ev).head()
    val (n, mean, lo, hi) =
      (r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(n > 0)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket $mean")
    assert(hi - lo > 0, "replicate means cannot all coincide")
    // a 95% bootstrap CI of a ~uniform money metric is narrow: the
    // half-width shrinks like 1/sqrt(n)
    assert((hi - lo) / mean < 0.5)
    val r2 = RobustStats.poissonBootstrap(ev).head()
    assert(r1 == r2, "md5-derived weights make the bootstrap a pure function")
  }

  test("poissonBootstrap: md5-Poisson weights average to ~1 (unit-mean resampling)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val rows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), explode(sequence(lit(0), lit(40))).as("r"))
    val w = rows
      .withColumn("u",
        conv(substring(md5(concat_ws(":", col("event_id"), col("r"))), 1, 15), 16, 10)
          .cast("long") / lit(1152921504606846976.0))
      .selectExpr("CASE WHEN u < 3.6787944117144233e-1 THEN 0 " +
        "WHEN u < 7.357588823428847e-1 THEN 1 " +
        "WHEN u < 9.196986029286058e-1 THEN 2 " +
        "WHEN u < 9.810118431238463e-1 THEN 3 ELSE 4 END AS w")
      .agg(avg("w")).head().getDouble(0)
    assert(math.abs(w - 1.0) < 0.03, s"mean Poisson(1) weight was $w")
  }

  // ---- q217 Kaplan–Meier time-to-conversion --------------------------

  test("kmConversion: hand-built cohort with censoring") {
    // u1/u3 convert at day 2, u4 at day 5, u2 never (censored at the
    // global end, day 10). Day 2: n=4, d=2 → S=1/2. Day 5: n=2, d=1
    // → S=1/4. The censor-only day 10 emits no row.
    val df = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-03 00:00:00", "purchase"),
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-11 00:00:00", "view"),
      (3L, "2024-01-02 00:00:00", "signup"),
      (3L, "2024-01-04 00:00:00", "purchase"),
      (4L, "2024-01-01 00:00:00", "signup"),
      (4L, "2024-01-06 00:00:00", "purchase")))
    val r = RobustStats.kmConversion(df).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.toSeq == Seq((2L, 4L, 2L, 0L, 0.5), (5L, 2L, 1L, 0L, 0.25)))
  }

  test("kmConversion on the corpus: survival is monotone non-increasing in [0, 1]") {
    val r = RobustStats.kmConversion(Tables.events(spark, sfDir)).collect()
    assert(r.nonEmpty)
    val s = r.map(_.getDouble(4))
    assert(s.forall(v => v >= 0 && v <= 1))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    // risk sets shrink strictly along the curve
    val n = r.map(_.getLong(1))
    assert(n.zip(n.tail).forall { case (a, b) => a > b })
  }

  // ---- q241 Mann-Whitney U --------------------------------------------

  test("mannWhitney: disjoint samples hit the closed form; full ties are symmetric") {
    import graft.operators.RobustStats
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((ty, v), i) => (i.toLong, ty, v) }
        .toDF("event_id", "event_type", "value")
    // A = {1,2} strictly below B = {3,4}: no (a > b) pair, so
    // 2U_A = 0, P(A>B) = 0, and z = -(nA*nB/2)/sqrt(nA*nB/12*(n+1))
    // = -2/sqrt(5/3) = -1.5492 (no ties: tie3 = 0)
    val lo = RobustStats.mannWhitney(
      ev(Seq("view" -> 1.0, "view" -> 2.0,
        "purchase" -> 3.0, "purchase" -> 4.0))).collect().head
    assert((lo.getLong(0), lo.getLong(1), lo.getLong(3)) == ((2L, 2L, 0L)), lo.toString)
    assert(lo.getDouble(4) == 0.0 && lo.getDouble(5) == -1.5492, lo.toString)
    // identical samples with ties: U_A = nA*nB/2 exactly -> z = 0,
    // P(A>B) (with half-tie credit) = 0.5
    val tie = RobustStats.mannWhitney(
      ev(Seq("view" -> 1.0, "view" -> 3.0,
        "purchase" -> 1.0, "purchase" -> 3.0))).collect().head
    assert(tie.getLong(3) == 4L && tie.getDouble(4) == 0.5 &&
      tie.getDouble(5) == 0.0, tie.toString)
  }

  test("mannWhitney: degenerate inputs yield NULL, never NaN") {
    import graft.operators.RobustStats
    def ev(rows: Seq[(String, Double)]) =
      rows.zipWithIndex.map { case ((ty, v), i) => (i.toLong, ty, v) }
        .toDF("event_id", "event_type", "value")
    // one arm empty: n_a*n_b = 0 — both float outputs NULL (the
    // nullif guards), not NaN from a 0/0
    val oneArm = RobustStats.mannWhitney(
      ev(Seq("view" -> 1.0, "view" -> 2.0))).collect().head
    assert(oneArm.getLong(0) == 2L && oneArm.getLong(1) == 0L)
    assert(oneArm.isNullAt(4) && oneArm.isNullAt(5), oneArm.toString)
    // a single observation total: n_a+n_b-1 = 0 inside the tie term
    val single = RobustStats.mannWhitney(
      ev(Seq("purchase" -> 1.0))).collect().head
    assert(single.isNullAt(4) && single.isNullAt(5), single.toString)
  }

  test("mannWhitney on the corpus: totals reconcile, effect size in [0, 1]") {
    import graft.operators.RobustStats
    val ev = graft.engine.Tables.events(spark, sfDir)
    val r = RobustStats.mannWhitney(ev).collect().head
    val nAB = ev.filter(org.apache.spark.sql.functions.col("event_type").isin("view", "purchase")).count()
    assert(r.getLong(0) + r.getLong(1) == nAB)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    assert(!r.isNullAt(5) && !r.getDouble(5).isNaN)
  }
}
