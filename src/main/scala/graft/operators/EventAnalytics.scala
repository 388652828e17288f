package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/event analytics over the events stream: ordered-step
  * funnels, first-touch cohort retention, and event-type transition
  * matrices. The reference's EDA layer stops at per-hour/per-day
  * rollups (eda/eda_analysis.py:111-130); these are the next queries
  * any team asks of the same feed, and each is a driver-contract
  * extension with an exact DuckDB oracle.
  *
  * Scale shape shared by all three: ONE hash partition on `user_id`
  * (the natural analytics key — ~uniform cardinality, no hot user at
  * corpus scale) and per-user window passes that all reuse that same
  * partitioning, so Catalyst plans a single Exchange however many
  * window stages an operator stacks. Post-aggregation frames are
  * #steps / #cohort-weeks / #type² rows — driver-safe everywhere.
  */
object EventAnalytics {

  /** Ordered conversion funnel: for each user, step k is reached at
    * the EARLIEST event of type `steps(k)` that happens STRICTLY
    * AFTER the user reached step k-1 (the classic min-time funnel, so
    * a purchase logged before the first view does not count as a
    * conversion). Output is one row per step with the surviving user
    * count and the step-over-step conversion rate.
    *
    * Each step adds one more windowed conditional-min over the SAME
    * user partition — k steps = k Window nodes, one Exchange. The
    * final stack/lag runs on a #steps-row frame (the only
    * unpartitioned window here, bounded by the funnel definition
    * itself, not the data).
    */
  /** Per-user step-reach times t1..tk of the min-time funnel chain —
    * one row per user, shared by [[funnel]] and [[conversionLatency]].
    * k conditional-min windows over ONE user_id partition.
    */
  private def stepTimes(ev: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy("user_id")
    var df = ev.select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("t1", min(when(col("event_type") === steps.head, col("ts"))).over(w))
    for (i <- 2 to steps.length)
      df = df.withColumn(s"t$i",
        min(when(col("event_type") === steps(i - 1) && col("ts") > col(s"t${i - 1}"),
          col("ts"))).over(w))
    // one row per user (the tK are window-constants; max just picks them)
    df.groupBy("user_id")
      .agg(max(col("t1")).as("t1"),
        (2 to steps.length).map(i => max(col(s"t$i")).as(s"t$i")): _*)
  }

  /** RFM segmentation — the classic customer-value grid (recency /
    * frequency / monetary, each scored 1–4 by corpus quartile),
    * computed SCALE-RIGHT: quartile thresholds come from one exact
    * `percentile` aggregate (broadcast back as a 1-row frame), never
    * a global `ntile` sort over the user population — the difference
    * between a 9-double broadcast and a full shuffle-sort of every
    * user at 100 TB. Recency scores ascending (recent = 4), frequency
    * and monetary descending (high = 4); threshold ties resolve by
    * the same `<=`/`>=` comparisons in both engines. Output is the
    * ≤ 64-cell segment grid with user counts and total monetary.
    */
  def rfmSegments(ev: DataFrame): DataFrame = {
    val per = ev.select(col("user_id"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("bigint").as("d"),
        floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
      .groupBy("user_id")
      .agg(max("d").as("last_d"), count(lit(1)).as("f"), sum("cents").as("m"))
    val maxd = per.agg(max("last_d").as("dmax"))
    val rfm = per.crossJoin(broadcast(maxd))
      .select(col("user_id"), (col("dmax") - col("last_d")).as("r"),
        col("f"), col("m"))
    val th = rfm.agg(
      percentile(col("r"), lit(0.25)).as("r1"), percentile(col("r"), lit(0.5)).as("r2"),
      percentile(col("r"), lit(0.75)).as("r3"),
      percentile(col("f"), lit(0.25)).as("f1"), percentile(col("f"), lit(0.5)).as("f2"),
      percentile(col("f"), lit(0.75)).as("f3"),
      percentile(col("m"), lit(0.25)).as("m1"), percentile(col("m"), lit(0.5)).as("m2"),
      percentile(col("m"), lit(0.75)).as("m3"))
    rfm.crossJoin(broadcast(th))
      .withColumn("r_score",
        when(col("r") <= col("r1"), 4).when(col("r") <= col("r2"), 3)
          .when(col("r") <= col("r3"), 2).otherwise(1))
      .withColumn("f_score",
        when(col("f") >= col("f3"), 4).when(col("f") >= col("f2"), 3)
          .when(col("f") >= col("f1"), 2).otherwise(1))
      .withColumn("m_score",
        when(col("m") >= col("m3"), 4).when(col("m") >= col("m2"), 3)
          .when(col("m") >= col("m1"), 2).otherwise(1))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum(col("m")).as("mc"))
      .selectExpr("r_score", "f_score", "m_score", "n_users",
        "CAST(mc AS DOUBLE) / 1e2 AS total_monetary")
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Double-fire audit: events of the same (user, type) landing
    * within `gapSeconds` of the previous one — the client-retry /
    * at-least-once-ingest artifact that silently inflates every
    * downstream count, reported as a per-type rate BEFORE anyone
    * trusts the funnel. The lag window runs inside natural
    * (user_id, event_type) partitions — per-key event counts, never
    * a global sort — then collapses to #types rows.
    */
  def duplicateEventAudit(ev: DataFrame, gapSeconds: Long = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("sec"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("is_dup",
        when(col("prev").isNotNull && col("sec") - col("prev") <= gapSeconds, 1)
          .otherwise(0))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("is_dup")).cast("bigint").as("n_dups"))
      .selectExpr("event_type", "n_events", "n_dups",
        "floor(CAST(n_dups AS DOUBLE) / CAST(n_events AS DOUBLE) * 1e4 + 0.5) / 1e4 AS dup_rate")
      .orderBy("event_type")
  }

  def funnel(ev: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val perUser = stepTimes(ev, steps)
    // #steps-row funnel frame: step index, label, surviving users
    val stackArgs = steps.indices
      .map(i => s"${i + 1}, '${steps(i)}', count(t${i + 1})").mkString(", ")
    val counts = perUser
      .selectExpr(s"stack(${steps.length}, $stackArgs) as (step, event_type, users)")
    val ws = Window.orderBy("step")
    counts
      .withColumn("conv_from_prev",
        coalesce(round(col("users") / lag(col("users"), 1).over(ws), 4), lit(1.0)))
      .orderBy("step")
  }

  /** Session entry/exit/bounce profile — the landing-page report over
    * gap-based sessions (q47's 30-minute rule): per event type, how
    * many sessions OPEN with it, how many CLOSE with it, and how many
    * are single-event bounces of it, with the bounce rate among its
    * entries. The first/last tie within a second breaks on event_id —
    * the q204 ingest-order contract.
    *
    * Scale: the session assignment is the standard one user-partition
    * window chain (one Exchange); sessions then collapse to one
    * (entry, exit, n) row each before the #types-row rollup — the
    * aggregate never carries event payloads.
    */
  def sessionEntryExit(ev: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val sess = ev.select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("sec") - col("prev") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("sid",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = sess.groupBy("user_id", "sid").agg(
      min(struct(col("sec"), col("event_id"), col("event_type"))).as("fst"),
      max(struct(col("sec"), col("event_id"), col("event_type"))).as("lst"),
      count(lit(1)).as("n_events"))
      .select(col("fst.event_type").as("entry_type"),
        col("lst.event_type").as("exit_type"), col("n_events"))
    val entries = perSession.groupBy(col("entry_type").as("event_type"))
      .agg(count(lit(1)).as("n_entries"),
        sum(when(col("n_events") === 1, 1).otherwise(0)).cast("bigint").as("n_bounces"))
    val exits = perSession.groupBy(col("exit_type").as("event_type"))
      .agg(count(lit(1)).as("n_exits"))
    entries.join(exits, Seq("event_type"), "full_outer")
      .selectExpr("event_type",
        "CAST(coalesce(n_entries, 0) AS BIGINT) AS n_entries",
        "CAST(coalesce(n_exits, 0) AS BIGINT) AS n_exits",
        "CAST(coalesce(n_bounces, 0) AS BIGINT) AS n_bounces",
        "CASE WHEN coalesce(n_entries, 0) = 0 THEN CAST(NULL AS DOUBLE) " +
          "ELSE floor(CAST(n_bounces AS DOUBLE) / n_entries * 1e4 + 0.5) / 1e4 END AS bounce_rate")
      .orderBy("event_type")
  }

  /** Time-constrained funnel — the SLA-aware counterpart of [[funnel]]
    * (which asks "did the steps ever happen in order"; this asks "did
    * each step happen within `windowSeconds` of the previous one"):
    * per user, the earliest view, then the FIRST click within the
    * window after it, then the first purchase within the window after
    * that click. Greedy-earliest anchoring is deterministic and
    * matches how funnel SLAs are actually reported (time-to-next-step
    * from the first qualifying event, not the best retrospective
    * alignment).
    *
    * Scale: three #users-bounded frames chained by user_id equi-joins
    * (the range predicate evaluates inside the per-user hash match,
    * the q175 discipline); min() aggregates keep every frame one row
    * per user. Output is the 3-row funnel with within-window
    * conversion and median step latency (exact integer seconds).
    */
  def timedFunnel(ev: DataFrame, windowSeconds: Long = 3600): DataFrame = {
    val base = ev.select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("sec"))
    val v = base.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("t1"))
    val c = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec").as("cs"))
      .join(v, Seq("user_id"))
      .filter(col("cs") > col("t1") && col("cs") <= col("t1") + windowSeconds)
      .groupBy("user_id").agg(min("t1").as("t1"), min("cs").as("t2"))
    val p = base.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec").as("ps"))
      .join(c, Seq("user_id"))
      .filter(col("ps") > col("t2") && col("ps") <= col("t2") + windowSeconds)
      .groupBy("user_id").agg(min("t2").as("t2"), min("ps").as("t3"))
    val n1 = v.agg(count(lit(1)).as("users"),
      lit(null).cast("double").as("med_step_sec")).selectExpr("1 AS step", "*")
    val n2 = c.agg(count(lit(1)).as("users"),
      percentile(col("t2") - col("t1"), lit(0.5)).as("med_step_sec"))
      .selectExpr("2 AS step", "*")
    val n3 = p.agg(count(lit(1)).as("users"),
      percentile(col("t3") - col("t2"), lit(0.5)).as("med_step_sec"))
      .selectExpr("3 AS step", "*")
    val ws = Window.orderBy("step")
    n1.unionByName(n2).unionByName(n3)
      .withColumn("prev", lag(col("users"), 1).over(ws))
      .withColumn("conv_from_prev",
        when(col("prev").isNull, lit(1.0))
          .when(col("prev") === 0, lit(0.0))
          .otherwise(round(col("users") / col("prev"), 4)))
      .select("step", "users", "med_step_sec", "conv_from_prev")
      .orderBy("step")
  }

  /** First-touch weekly cohort retention: users are assigned to the
    * ISO week of their first event, and each (cohort, week-offset)
    * cell counts the distinct users of that cohort active in that
    * week — the standard retention triangle. Week arithmetic stays in
    * whole truncated weeks on both engines, so the day-difference is
    * always an exact multiple of 7 and the integer division is exact.
    *
    * One user-partition window for the cohort assignment (reusing the
    * scan's shuffle), then a countDistinct over (cohort, offset) —
    * distinct-aggregate shuffle rows are (date, int, long) triples,
    * never wider.
    */
  def retentionCohorts(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    ev.select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .withColumn("cohort", min(col("wk")).over(w))
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort", "week_offset")
  }

  /** Per-type activity trend: ordinary least squares of daily event
    * counts against the day index, one (slope, intercept, r²) row per
    * event type — the "is this signal growing?" screen run over every
    * metric of a pipeline health dashboard. Uses the SQL-standard
    * `regr_*` aggregates (codegen'd, one pass, map-side partial), NOT
    * a driver-side fit.
    *
    * The x axis is centered on the corpus's own first day (a 1-row
    * broadcast) before the regression: with raw epoch-day x values
    * (~20k) the covariance formula subtracts two ~4×10⁸ terms and the
    * cancellation amplifies engine-level ulp differences past the
    * oracle's rounding; centered x ∈ [0, ~30) keeps it
    * well-conditioned on both engines.
    */
  def activityTrend(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val anchor = daily.agg(min(col("day")).as("day0"))
    daily.crossJoin(broadcast(anchor))
      .select(col("event_type"),
        datediff(col("day"), col("day0")).cast("double").as("x"),
        col("n").cast("double").as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("y"), col("x")), 4).as("slope"),
        round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
        round(regr_r2(col("y"), col("x")), 4).as("r2"))
      .orderBy("event_type")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the value
    * distributions of two event types, at fixed-bin granularity: both
    * samples are histogrammed onto the same `binWidth` grid in one
    * pass, the empirical CDFs are cumulated over the bins frame, and
    * the statistic is the max CDF gap. Binning is what makes this
    * 100 TB-shaped: the exact KS needs a global sort of every
    * observation, while this plan's only ordered window runs over the
    * #bins-row histogram (value-range/binWidth rows, data-size
    * independent). CDF values are exact integer ratios, so the
    * statistic is bit-identical across engines before its rounding.
    */
  def ksTest(ev: DataFrame, typeA: String = "view", typeB: String = "purchase",
             binWidth: Double = 0.5): DataFrame = {
    val counts = ev.filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("nb"))
    val tot = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    // the bins frame is tiny; the unpartitioned cumulative window is
    // bounded by the grid, never by the data
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(tot))
      .withColumn("cdfa", sum(col("na")).over(w) / col("ta"))
      .withColumn("cdfb", sum(col("nb")).over(w) / col("tb"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        count(lit(1)).as("n_bins"),
        round(max(abs(col("cdfa") - col("cdfb"))), 6).as("ks_stat"))
  }

  /** Time-to-convert distribution per first-touch cohort: for users
    * who completed the whole funnel, the seconds from reaching step 1
    * to reaching the final step, summarized as exact p50/p90 per
    * weekly cohort — the product question behind every funnel ("HOW
    * LONG does conversion take, and is it drifting by cohort?").
    * Reuses [[stepTimes]]' single user-partition chain; the converted
    * frame is one row per converting user, and the exact percentiles
    * group over #cohort-weeks partitions. Latency is whole seconds
    * (both engines truncate to the second before subtracting), so the
    * percentile inputs are integers and interpolation is the only
    * float step, rounded at 4.
    */
  def conversionLatency(ev: DataFrame,
                        steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val last = s"t${steps.length}"
    stepTimes(ev, steps)
      .filter(col(last).isNotNull)
      .select(date_trunc("week", col("t1")).cast("date").as("cohort"),
        (unix_timestamp(col(last)) - unix_timestamp(col("t1"))).as("latency_sec"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_converted"),
        round(percentile(col("latency_sec"), lit(0.5)), 4).as("p50_sec"),
        round(percentile(col("latency_sec"), lit(0.9)), 4).as("p90_sec"))
      .orderBy("cohort")
  }

  /** Rolling 7-day active users (the WAU curve): for each calendar
    * day, the count of distinct users active in the trailing
    * `windowDays` window — computed EXACTLY, without a sliding
    * distinct-window sort: the (day, user) presence pairs are
    * deduplicated once, each pair fans out to the `windowDays` report
    * days it supports (a generate-over-scan, the q91 shape), and the
    * rolling distinct collapses to a plain per-day countDistinct.
    * Shuffle rows are (date, long) pairs; the fan-out factor is the
    * window length, a constant — this is how a rolling-distinct stays
    * linear at 100 TB where a naive per-day self-join goes quadratic.
    * Days past the corpus's last day are clipped (their windows are
    * not fully observed).
    */
  def rollingActiveUsers(ev: DataFrame, windowDays: Int = 7): DataFrame = {
    val dayUsers = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val maxDay = dayUsers.agg(max(col("day")).as("max_day"))
    dayUsers
      .select(col("user_id"), explode(
        expr(s"sequence(day, date_add(day, ${windowDays - 1}))")).as("report_day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("report_day") <= col("max_day"))
      .groupBy("report_day").agg(countDistinct("user_id").as("wau"))
      .orderBy("report_day")
  }

  /** Pearson χ² test of independence between event type and ISO day
    * of week: observed counts from one grouped pass, expected counts
    * from the contingency frame's own marginals (three windows over
    * the #types·#days rows — never a rescan of the input), and the
    * statistic with its degrees of freedom. The only data-sized work
    * is the first groupBy; everything after runs on ≤ 35 rows. Counts
    * are integers held exactly in doubles, so the expected values are
    * bit-identical across engines and only the final 35-term sum sees
    * float ordering (≈1e-12, rounded at 4).
    */
  def chiSquare(ev: DataFrame): DataFrame = {
    val obs = ev.groupBy(col("event_type").as("t"),
        (((dayofweek(col("ts")) + lit(5)) % lit(7)) + lit(1)).as("d"))
      .agg(count(lit(1)).cast("double").as("o"))
    // densify: a zero cell still contributes (0−e)²/e — the grouped
    // frame only carries OBSERVED cells, so cross the margins back in
    // (tiny × tiny, broadcast) and fill the holes with 0
    val grid = obs.select("t").distinct()
      .crossJoin(broadcast(obs.select("d").distinct()))
    val full = grid.join(obs, Seq("t", "d"), "left")
      .withColumn("o", coalesce(col("o"), lit(0.0)))
    val expected = sum(col("o")).over(Window.partitionBy("t")) *
      sum(col("o")).over(Window.partitionBy("d")) /
      sum(col("o")).over(Window.partitionBy())
    full.withColumn("e", expected)
      .agg(sum(col("o")).cast("long").as("n_obs"),
        ((countDistinct(col("t")) - 1) * (countDistinct(col("d")) - 1)).as("dof"),
        round(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")), 4)
          .as("chi2"))
  }

  /** First-order Markov transition matrix of event types: per user,
    * consecutive event pairs (ordered by time, event_id tiebreak) are
    * counted into a #types² matrix with the conditional transition
    * probability P(to | from). The per-user lead() reuses the same
    * user-partition sort every per-user operator here pays; the
    * probability window runs on the aggregated #types²-row frame.
    */
  def eventTransitions(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    counts
      .withColumn("p",
        round(col("n") / sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy("from_type", "to_type")
  }

  /** Time-weighted average of the value signal, per user: each
    * reading holds until the next one (the step/LOCF interpretation a
    * sensor or price feed needs — a plain avg() over-weights bursts),
    * so value vᵢ gets weight = seconds until event i+1, and
    * TWA = Σ vᵢ·wᵢ / Σ wᵢ over the user's observation span. The last
    * event has no successor and carries no weight; users whose span
    * is zero (single event, or all events in the same second) have no
    * well-defined TWA and are excluded.
    *
    * One lead() window over the standard user_id partition (the same
    * single Exchange every operator in this file reuses), then a
    * per-user partial aggregate. Timestamps are truncated to whole
    * epoch seconds BEFORE differencing — the q125 cross-engine parity
    * contract — and the weighted sum is exact integer·double
    * arithmetic, rounded at 4.
    */
  def timeWeightedAvg(ev: DataFrame): DataFrame = {
    // order at the SAME whole-second resolution the weights use
    // (event_id tie-break): ordering by sub-second ts while weighting
    // by truncated seconds would let two engines pair a zero weight
    // with different events inside the same second
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    ev.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("wgt", (lead(col("sec"), 1).over(w) - col("sec")).cast("double"))
      .filter(col("wgt").isNotNull)
      .groupBy("user_id")
      .agg(
        (count(lit(1)) + 1).as("n_events"),
        sum(col("wgt")).cast("bigint").as("span_sec"),
        round(sum(col("value") * col("wgt")) / sum(col("wgt")), 4).as("twa_value"))
      .filter(col("span_sec") > 0)
      .orderBy("user_id")
  }

  /** Hourly OHLC bars per event type — the time-series resample every
    * metrics store needs (open/high/low/close/count of `value`). Every
    * output is order-independent — min/max/count of raw parquet
    * doubles — so the bars are exact on any engine; a mean would carry
    * sum-order ulps (the one-ulp round-boundary lesson).
    *
    * Scale: open and close come from `min`/`max` over a
    * (second, event_id, value) struct — lexicographic struct ordering
    * IS arg-min/arg-max, and unlike a row_number window it is a
    * partial aggregate: map-side combine reduces every partition to
    * one row per (type, bar) before the exchange, where a window
    * would shuffle every event. Tie order is (whole second, event_id)
    * — the engine-neutral key of q131: Spark sees microseconds where
    * the raw parquet has nanos, so raw-ts ordering could disagree;
    * truncated-to-second ordering cannot.
    */
  def ohlcBars(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bar_ts"))
      .agg(
        min(struct(date_trunc("second", col("ts")).as("s"),
          col("event_id").as("e"), col("value").as("v")))
          .getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(date_trunc("second", col("ts")).as("s"),
          col("event_id").as("e"), col("value").as("v")))
          .getField("v").as("close"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type", "bar_ts")

  /** Event-type association rules (market-basket over user histories):
    * for every ordered type pair a < b, the support (fraction of users
    * doing both), both conditional confidences, and the lift vs
    * independence — the co-occurrence diagnostic behind "users who
    * hit `error` also churn" style findings, and the exact-count twin
    * of q124's chi-square screen.
    *
    * Everything happens AFTER the (user, type) distinct projection,
    * which bounds all downstream work at #users × #types rows
    * regardless of event volume; the self-join key is user_id (narrow
    * rows, ≤ #types matches per user), the pair aggregate is
    * ≤ #types² rows, and the per-type/user totals come back as
    * broadcast frames. Counts are exact integers; the three final
    * ratios are single IEEE divisions — bit-stable in both engines.
    */
  def eventAssociations(ev: DataFrame): DataFrame = {
    val ut = ev.select(col("user_id"), col("event_type")).distinct()
    val users = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val perType = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id")
        && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(users))
      .selectExpr("type_a", "type_b", "n_ab", "n_a", "n_b",
        "floor(CAST(n_ab AS DOUBLE) / n_users * 10000 + 0.5) / 10000 AS support",
        "floor(CAST(n_ab AS DOUBLE) / n_a * 10000 + 0.5) / 10000 AS conf_a_b",
        "floor(CAST(n_ab AS DOUBLE) / n_b * 10000 + 0.5) / 10000 AS conf_b_a",
        "floor(CAST(n_ab AS DOUBLE) * n_users / (CAST(n_a AS DOUBLE) * n_b) * 10000 + 0.5) / 10000 AS lift")
      .orderBy("type_a", "type_b")
  }

  /** Hourly value-percentile monitor on a FIXED-GRID histogram — the
    * observability pattern behind every latency dashboard: per
    * tumbling hour, p50/p90/p99 of `value` read off cumulative bin
    * counts (the quantile is the lower edge of the first bin whose
    * cumulative count reaches ⌈p·n⌉ — a step quantile, deliberately
    * NOT interpolated). The histogram method is what makes the metric
    * STREAMABLE: bin counts are mergeable partial state (see the
    * [[graft.streaming.StreamPipeline.histogramCountsStream]] live
    * twin), where an exact percentile() would need every raw value at
    * finalization. Grid resolution is the accuracy knob, amortized at
    * zero extra cost.
    *
    * Scale: one partial-aggregated (hour, bin) count — shuffle rows
    * are (timestamp, long, long); the cumulative window and the
    * ⌈p·n⌉ threshold compare run per hour over #bins rows (grid-
    * bounded, corpus-independent). Every decision value is an exact
    * integer (counts, ceil of an integer-scaled product); the only
    * doubles are the emitted bin edges, exact multiples of a
    * power-of-two binWidth — bit-stable on any engine.
    */
  def histogramPercentilesHourly(ev: DataFrame,
                                 binWidth: Double = 0.5): DataFrame = {
    val counts = ev.select(date_trunc("hour", col("ts")).as("bar_ts"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy("bar_ts", "bin").agg(count(lit(1)).as("c"))
    val byBar = Window.partitionBy("bar_ts")
    val cum = byBar.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = counts
      .withColumn("n", sum(col("c")).over(byBar))
      .withColumn("cumc", sum(col("c")).over(cum))
    def pEdge(p: Double, name: String) =
      min(when(col("cumc") * 100 >= ceil(col("n") * lit(p * 100)),
        col("bin") * binWidth)).as(name)
    withCum.groupBy("bar_ts")
      .agg(max(col("n")).as("n"),
        pEdge(0.50, "p50_lo"), pEdge(0.90, "p90_lo"), pEdge(0.99, "p99_lo"))
      .orderBy("bar_ts")
  }

  /** SCD Type-2 history build — the warehouse pattern that turns a
    * CDC/event feed into validity intervals: the tracked attribute
    * here is the user's current event_type "state", and the output is
    * one row per STATE RUN (consecutive repeats of the same state
    * compact away — the no-op-update rule every SCD2 merge needs)
    * with `[valid_from_sec, valid_to_sec)` bounds, a per-user version
    * number, and an is_current flag on the open interval. The batch
    * twin of [[graft.operators.TrainingData.latestPerKey]] (SCD1 —
    * latest only) and the state LINEAGE the transition matrix (q116)
    * aggregates away.
    *
    * Two window passes (change detection, then interval bounds over
    * the surviving change rows) — both partition by user_id with the
    * (whole-second, event_id) order of q131/q143, so Catalyst plans
    * ONE Exchange and the filter between the passes never reshuffles.
    * No global sort, no driver state; output is bounded by the number
    * of state changes, never event volume.
    */
  def scdHistory(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    ev.select(col("user_id"), col("event_type").as("state"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("valid_to_sec", lead(col("sec"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("version"), col("state"),
        col("sec").as("valid_from_sec"), col("valid_to_sec"),
        col("valid_to_sec").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "version")
  }

  /** Point-in-time SCD2 lookup — the classic warehouse pattern over
    * [[scdHistory]]'s intervals: for each PURCHASE event, the state
    * the user was in WHEN the purchase happened (first-touch
    * attribution against the history dimension, not the current
    * state). The probe is deliberately a filtered slice of the feed —
    * the realistic shape, and what keeps the non-equi join's probe
    * side small relative to the interval build.
    *
    * Join semantics: user equi-key + containment
    * `valid_from ≤ sec < coalesce(valid_to, ∞)` against the state
    * machine of the NON-probe events (a probe measures the state, it
    * does not change it). Intervals tile each user's span gap-free
    * (PropertiesSpec), so every probe at-or-after the user's first
    * state event matches EXACTLY one interval — no fan-out; an
    * earlier probe has no state to read and drops (inner join,
    * loudly visible in the count).
    *
    * Scale: both sides hash-partition on user_id — the equi half of
    * the condition drives a normal shuffled join; the range predicate
    * evaluates inside each user's bucket (#intervals per user is
    * state-change-bounded, tiny). No broadcast needed, no product:
    * this is the q107 bucketized-range-join reasoning with the bucket
    * key given for free by the user dimension.
    */
  def scdLookup(ev: DataFrame, probeType: String = "purchase"): DataFrame = {
    // the history is the state machine of the NON-probe events: a
    // probe is a measurement against the state, not a state change —
    // otherwise every purchase would trivially read its own interval.
    // A probe before the user's first state event has no state to
    // read and drops (inner join, loud in the count).
    val hist = scdHistory(ev.filter(col("event_type") =!= probeType))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from_sec"), col("valid_to_sec"))
    val probes = ev.filter(col("event_type") === probeType)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
    // both sides derive from `ev`, so unaliased probes("user_id") ===
    // hist("user_id") resolves same-lineage and trips Spark's
    // "trivially true equals predicate" warning (the plan was already
    // an equi-join — PlanAuditSpec pins it); explicit aliases make the
    // two lineages unambiguous, the `transitions` a/b pattern
    probes.as("p").join(hist.as("h"),
        col("p.user_id") === col("h.user_id")
          && col("h.valid_from_sec") <= col("p.sec")
          && (col("h.valid_to_sec").isNull || col("p.sec") < col("h.valid_to_sec")))
      .select(col("p.event_id"), col("p.user_id"), col("p.sec"),
        col("h.version").as("state_version"), col("h.state").as("state_at_event"))
      .orderBy("event_id")
  }

  /** EWMA weight ladder α·(1−α)^j, j = 0..k−1 — exposed so the DuckDB
    * oracle interpolates the SAME double literals (via
    * `java.lang.Double.toString`, whose shortest-round-trip repr both
    * engines parse back to the identical bits).
    */
  def ewmaWeights(alpha: Double, lookback: Int): Seq[Double] =
    (0 until lookback).map(j => alpha * math.pow(1 - alpha, j))

  /** Per-user exponentially weighted moving average of `value` at the
    * user's LAST event — the smoothed "current level" a monitoring or
    * personalization store keeps per entity. Bounded lookback (k = 8
    * lags, weights α(1−α)^j renormalized over the lags that exist) so
    * the computation is a FIXED window frame, not a recursive scan:
    * the truncation error vs the infinite EWMA is (1−α)^k ≈ 5.8% of
    * weight for α = 0.3, and — unlike the recursive form — the
    * bounded form is expressible as pure lag arithmetic in any SQL
    * engine, which is what makes the operator hash-checkable.
    *
    * Determinism: the weight literals are shared with the oracle via
    * [[ewmaWeights]]; numerator and denominator are the same
    * left-associated chain of IEEE multiply-adds in both engines, one
    * final division, round(4). Ordering is the (whole-second,
    * event_id) key of q131/q143/q153.
    *
    * Scale: k lag() calls over ONE user_id hash partition (the same
    * single Exchange every operator in this file reuses), then the
    * last-per-user row via max(struct) — a PARTIAL aggregate that
    * map-side combines to one row per user before the shuffle, where
    * a rank window would move every event. Output is #users rows.
    */
  def ewmaLastPerUser(ev: DataFrame, alpha: Double = 0.3,
                      lookback: Int = 8): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val ws = ewmaWeights(alpha, lookback)
    val base = ev.select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("value").as("x0"))
    val lagged = (1 until lookback).foldLeft(base) { (df, j) =>
      df.withColumn(s"x$j", lag(col("x0"), j).over(w))
    }
    // left-associated weighted sums — identical association in the oracle
    val num = ws.zipWithIndex.map { case (wj, j) =>
      when(col(s"x$j").isNotNull, col(s"x$j") * lit(wj)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val den = ws.zipWithIndex.map { case (wj, j) =>
      when(col(s"x$j").isNotNull, lit(wj)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    lagged
      .withColumn("ewma", num / den)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("sec"), col("event_id"), col("ewma"))).as("l"))
      .select(col("user_id"), col("n_events"),
        col("l.event_id").as("last_event_id"),
        round(col("l.ewma"), 4).as("ewma_value"))
      .orderBy("user_id")
  }

  /** Inter-arrival burstiness per event type, measured over PER-USER
    * gaps: for each (user, type) stream ordered by the (whole-second,
    * event_id) contract key, gap = seconds since that user's previous
    * event of the type; per type we report the gap count, mean, the
    * coefficient of variation, and Goh–Barabási burstiness
    * B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B ≈ 0 is Poisson, B → 1 is bursty,
    * B < 0 is pacemaker-regular. The timing twin of q147's value
    * moments.
    *
    * Exactness: gaps are exact integer seconds; per-type sufficient
    * statistics (n, Σg, Σg²) are exact BIGINTs; μ, the SAMPLE σ
    * (n·Σg² − (Σg)², over n·(n−1)) and the two ratios are the
    * identical closing-formula text in both engines — √ is
    * IEEE-exact, round(4) closes. Types with fewer than two gaps are
    * NULL via NULLIF. (Hourly gap counts stay well inside int64 here;
    * a corpus where Σg² could overflow moves the sums to
    * decimal(38,0) — the q147 pattern — with no plan change.)
    *
    * Scale: one lag() over a (user_id, event_type) hash partition —
    * narrow 16-byte rows — then a 5-row partial aggregate. No global
    * sort: ordering per type happens inside each user's stream, which
    * is what makes the operator shippable where a per-type global
    * ordering (one partition per type) would not be.
    */
  /** Inter-arrival latency SLO report — the p50/p90/p99 tail summary
    * per event type over the same per-(user, type) gap stream q164's
    * burstiness reads (mean/CV say "bursty"; the SLO percentiles say
    * "how late is the tail", which is what gets paged on). Gaps are
    * exact integer seconds; the percentiles are broadcast exact
    * aggregates per type (the q206 discipline — never a global ntile
    * sort), interpolation parity via percentile ≡ quantile_cont on
    * BIGINT inputs.
    *
    * Scale: one (user_id, type) lag window inside the standard user
    * partitioning, then a #types-row percentile aggregate.
    */
  def latencySlo(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("sec"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        percentile(col("gap"), lit(0.5)).as("p50"),
        percentile(col("gap"), lit(0.9)).as("p90"),
        percentile(col("gap"), lit(0.99)).as("p99"),
        max("gap").as("max_gap"))
      .selectExpr("event_type", "n_gaps", "p50", "p90", "p99",
        "CAST(max_gap AS BIGINT) AS max_gap")
      .orderBy("event_type")
  }

  def burstiness(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("sec"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("s1"),
        sum(col("gap") * col("gap")).as("s2"))
      .selectExpr("event_type", "n_gaps",
        "round(CAST(s1 AS DOUBLE) / n_gaps, 4) AS mean_gap_sec",
        "round(sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /" +
          " nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0)) /" +
          " (CAST(s1 AS DOUBLE) / n_gaps), 4) AS cv",
        "round((sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /" +
          " nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0))" +
          " - CAST(s1 AS DOUBLE) / n_gaps) /" +
          " (sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /" +
          " nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0))" +
          " + CAST(s1 AS DOUBLE) / n_gaps), 4) AS burstiness")
      .orderBy("event_type")
  }

  /** Seasonal-baseline anomaly hours: each (type, calendar-hour)
    * count is compared to that type's average count for the SAME
    * hour-of-day across the observed span (the diurnal profile —
    * "3 AM Tuesday vs every other 3 AM"), and hours at ≥ `threshold`×
    * their seasonal baseline are flagged. The seasonal complement of
    * q95's trailing-window z-score: a 2× burst at peak hour is
    * invisible to a global baseline but obvious against its own
    * hour-of-day.
    *
    * Baseline = Σcounts / #observed-hours for that (type, hour-of-day)
    * — observed means the type logged ≥ 1 event that calendar hour
    * (zero-count hours never materialize rows; with dense feeds like
    * this one the distinction is empty). ratio = cnt·m/S computed as
    * ONE IEEE division of exact integer products — bit-stable, no
    * intermediate baseline rounding in the flag decision; round(4)
    * only on the two REPORTED doubles.
    *
    * Scale: the corpus-scale pass is the (type, hour) partial count;
    * the profile is a ≤ #types×24-row aggregate OF THE GRID joined
    * back by broadcast. Nothing after the first aggregate touches
    * events.
    */
  /** The (type, hour-of-day) diurnal profile [[seasonalAnomalies]]
    * scores against — exposed so the streaming twin
    * ([[graft.streaming.StreamPipeline.seasonalAnomalyStream]]) can
    * train it in batch and join it static: s = Σ hourly counts,
    * m = #observed calendar hours for that slot.
    */
  def seasonalProfile(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"), hour(col("hr")).as("hod"))
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("m"))

  def seasonalAnomalies(ev: DataFrame, threshold: Double = 2.0): DataFrame = {
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val profile = seasonalProfile(ev)
    hourly.withColumn("hod", hour(col("hr")))
      .join(broadcast(profile), Seq("event_type", "hod"))
      .filter(col("cnt") * col("m") >= lit(threshold) * col("s"))
      .selectExpr("event_type", "hr", "cnt",
        "round(CAST(s AS DOUBLE) / m, 4) AS baseline",
        "round(CAST(cnt AS DOUBLE) * m / s, 4) AS ratio")
      .orderBy("event_type", "hr")
  }

  /** Lag-1/lag-2 autocorrelation of the hourly event-count series per
    * event type — the seasonality diagnostic behind "is this feed
    * self-similar hour over hour?". The series is hourly COUNTS
    * (exact integers), not hourly means, so the sufficient statistics
    * carry zero upstream ulps — the q145/q147 integer discipline
    * applied to Pearson's r.
    *
    * r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)),
    * computed from exact BIGINT sums in BOTH engines with identical
    * association (not each engine's own Welford `corr`, whose
    * accumulation order differs): the closing doubles are
    * bit-identical, √ is IEEE-correctly-rounded, one division,
    * round(4). A constant series yields NULL via NULLIF in both
    * engines — no NaN-vs-NULL divergence.
    *
    * Scale: the only corpus-scale pass is the (type, hour) count — a
    * partial aggregate that map-side combines before its exchange.
    * The lag windows and the final conditional sums run on the
    * calendar-bounded grid (#types × #hours rows), never on events.
    */
  def autocorrHourly(ev: DataFrame): DataFrame = {
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    val withLags = hourly
      .withColumn("l1", lag(col("cnt"), 1).over(w))
      .withColumn("l2", lag(col("cnt"), 2).over(w))
    def stats(lagCol: String, k: Int) = Seq(
      sum(when(col(lagCol).isNotNull, lit(1L)).otherwise(lit(0L))).as(s"n$k"),
      sum(when(col(lagCol).isNotNull, col("cnt")).otherwise(lit(0L))).as(s"sx$k"),
      sum(when(col(lagCol).isNotNull, col(lagCol)).otherwise(lit(0L))).as(s"sy$k"),
      sum(when(col(lagCol).isNotNull, col("cnt") * col(lagCol)).otherwise(lit(0L))).as(s"sxy$k"),
      sum(when(col(lagCol).isNotNull, col("cnt") * col("cnt")).otherwise(lit(0L))).as(s"sxx$k"),
      sum(when(col(lagCol).isNotNull, col(lagCol) * col(lagCol)).otherwise(lit(0L))).as(s"syy$k"))
    val aggs = count(lit(1)).as("n_hours") +: (stats("l1", 1) ++ stats("l2", 2))
    def acf(k: Int) =
      s"""round((CAST(n$k AS DOUBLE) * sxy$k - CAST(sx$k AS DOUBLE) * sy$k) /
         | nullif(sqrt(CAST(n$k AS DOUBLE) * sxx$k - CAST(sx$k AS DOUBLE) * sx$k) *
         |        sqrt(CAST(n$k AS DOUBLE) * syy$k - CAST(sy$k AS DOUBLE) * sy$k), 0.0),
         | 4) AS acf$k""".stripMargin.replaceAll("\n", "")
    withLags.groupBy("event_type")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("event_type", "n_hours", acf(1), acf(2))
      .orderBy("event_type")
  }

  /** CUSUM changepoint detection over each type's daily-count series —
    * the offline complement of the trailing z-score (q95) and the
    * seasonal baseline (q165): where those flag POINT anomalies, the
    * cumulative sum S_i = Σ_{j≤i}(x_j − x̄) peaks at the most likely
    * LEVEL-SHIFT boundary (Page's CUSUM, the standard
    * retrospective-changepoint screen a data-quality pipeline runs
    * when a feed's volume steps up or down mid-history).
    *
    * Exactness: S_i·n = prefix_i·n − i·total is computed in BIGINT —
    * the argmax over |S_i| equals the argmax over |S_i·n| since n > 0,
    * so the changepoint day, the direction, and the reported
    * numerator are all EXACT integers; no mean, no division, no float
    * anywhere (a float mean would make the peak day itself
    * order-dependent). Ties break to the earliest day. The calendar
    * densifies to the GLOBAL [min_day, max_day] span with zero-count
    * days — a silent feed outage is exactly the level shift CUSUM
    * must see, and all types share one calendar so numerators are
    * comparable across types.
    *
    * Scale: the corpus is touched ONCE by the map-combined
    * (type, day) count; everything after — calendar broadcast, grid
    * left-join, prefix windows, argmax rank — runs on the
    * #types×#days aggregated frame. Output is #types rows.
    */
  /** Top session paths — the navigation-pattern report: each gap-based
    * session (q47 rule) is rendered as the '>'-joined sequence of its
    * first `maxLen` event types in event-time order, and the most
    * frequent paths win. Where q116's transition matrix sees only
    * consecutive PAIRS, paths keep whole journeys — the report a
    * funnel designer reads before hard-coding funnel steps (q114).
    *
    * Determinism: the per-session order is the engine-neutral
    * (second, event_id) key used by q131/q143; the in-Spark path is
    * built by sorting the collected (sec, event_id, type) structs —
    * `collect_list` alone has NO deterministic order, the documented
    * trap — and ties at the top-k boundary break on the path string.
    *
    * Scale: the per-session prefix filter (row_number ≤ maxLen) runs
    * on a (user_id, sid) window WHOSE DISTRIBUTION IS ALREADY
    * SATISFIED by the user_id exchange every operator here shares
    * (hash(user_id) clusters (user_id, sid) for free — no second
    * exchange, plan-pinned), so no session ever collects more than
    * `maxLen` structs however pathological the stream; the path
    * aggregate map-combines and the global top-k is a TakeOrdered,
    * never a full sort.
    */
  def topSessionPaths(ev: DataFrame, gapSeconds: Long = 1800,
                      maxLen: Int = 8, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val marked = ev
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag("sec", 1).over(byUser))
      .withColumn("new_s", when(col("prev").isNull ||
        col("sec") - col("prev") > gapSeconds, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id", "sid").orderBy("sec", "event_id")))
      .filter(col("rk") <= maxLen)
    marked.groupBy("user_id", "sid")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("sec"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Linear interpolation at probe times — the two-sided completion of
    * the as-of family: q60/q175 read the LAST value before a probe
    * (LOCF), q131 integrates it; this estimates the value AT the
    * probe by interpolating between the bracketing readings, falling
    * back to LOCF after the last reading and to backfill before the
    * first — the standard sensor-alignment kernel (pandas
    * merge_asof + interpolate in one operator).
    *
    * Mechanics: readings and probes union into ONE per-user ordered
    * stream (tag 0 readings before tag 1 probes at the same second,
    * so a same-second reading is "previous" with Δt = 0 and the
    * interpolation degenerates to it exactly); carry-forward
    * last-IGNORE-NULLS and carry-backward first-IGNORE-NULLS give
    * the brackets in two frame passes over the SAME user_id
    * partition — never a range join. The closing expression is
    * textually identical in both engines over exact integer seconds
    * and raw parquet doubles, so even the interpolated values
    * hash-match with no rounding.
    *
    * Scale: one user_id exchange shared by both window frames;
    * output is #probes rows; nothing ever fans out.
    */
  def interpolateAtProbes(ev: DataFrame, readingType: String = "view",
                          probeType: String = "purchase"): DataFrame = {
    val readings = ev.filter(col("event_type") === readingType)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), lit(0).as("tag"),
        col("value").as("v"))
    val probes = ev.filter(col("event_type") === probeType)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), lit(1).as("tag"),
        lit(null).cast("double").as("v"))
    val w = Window.partitionBy("user_id").orderBy("sec", "tag", "event_id")
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rsec = when(col("tag") === 0, col("sec"))
    val bracketed = readings.unionByName(probes)
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pt", last(rsec, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(rsec, ignoreNulls = true).over(fwd))
      .filter(col("tag") === 1)
    bracketed.select(col("event_id"), col("user_id"), col("sec"),
        when(col("pt").isNotNull && col("nt").isNotNull, lit("interp"))
          .when(col("pt").isNotNull, lit("locf"))
          .when(col("nt").isNotNull, lit("backfill"))
          .otherwise(lit("none")).as("method"),
        when(col("pt").isNotNull && col("nt").isNotNull,
          col("pv") + (col("nv") - col("pv")) *
            ((col("sec") - col("pt")).cast("double") / (col("nt") - col("pt"))))
          .when(col("pt").isNotNull, col("pv"))
          .otherwise(col("nv")).as("est_value"))
      .orderBy("event_id")
  }

  /** Daily peak concurrency — the sweep-line answer to "how many users
    * were active AT ONCE": gap-based sessions (the q47 rule, 30-min
    * inactivity splits) become [first-event, last-event] intervals,
    * each interval emits +1 at its start second and −1 one past its
    * end, and the per-day running sum's maximum is the day's peak —
    * capacity planning's load number, which no per-hour count (q01)
    * can produce because overlap, not volume, is what's being
    * measured. Same-user sessions can never overlap (the gap rule
    * separates them by > gap), so the peak is a true concurrent-USERS
    * high-water mark.
    *
    * Exactness: everything is BIGINT second arithmetic; per-second
    * deltas are SUMMED per tick before the running sum, so no
    * intra-second event ordering can change any prefix value; the
    * peak second is the earliest tick attaining the max. Days are
    * integer epoch-day indices (sec ÷ 86400) — no timezone, no
    * calendar functions on the hot path.
    *
    * Scale: sessions from the one per-user window pass every
    * event-analytics operator shares; intervals clip to the days they
    * span (fan-out = span length in days, ~1 for real sessions), and
    * the sweep partitions BY DAY — there is no global sort at any
    * scale, and each day's frame is #sessions-that-day ticks, not
    * events. Output is #days rows.
    */
  def peakConcurrency(ev: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("sec", "event_id")
    val marked = ev
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev", lag("sec", 1).over(byUser))
      .withColumn("new_s", when(col("prev").isNull ||
        col("sec") - col("prev") > gapSeconds, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = marked.groupBy("user_id", "sid")
      .agg(min("sec").as("s_sec"), max("sec").as("e_sec"))
    val clipped = spans
      .withColumn("di", explode(sequence(
        (col("s_sec") / 86400L).cast("long"),
        (col("e_sec") / 86400L).cast("long"))))
      .withColumn("cs", greatest(col("s_sec"), col("di") * 86400L))
      .withColumn("ce", least(col("e_sec"), col("di") * 86400L + 86399L))
      .persist()
    val deltas = clipped.select(col("di"), col("cs").as("sec"), lit(1L).as("d"))
      .unionByName(clipped.select(col("di"), (col("ce") + 1L).as("sec"),
        lit(-1L).as("d")))
      .groupBy("di", "sec").agg(sum("d").as("net"))
    val run = deltas.withColumn("active", sum("net").over(
        Window.partitionBy("di").orderBy("sec")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // peak + its earliest tick in ONE aggregate: the lexicographic max
    // over (active, -sec) IS "max(active), then min(sec) among the
    // attaining ticks" — all-BIGINT, so the struct ordering is exact
    // (replaces a whole-partition max window + filter + re-aggregate)
    val peaks = run.groupBy("di").agg(
        max(struct(col("active"), (-col("sec")).as("ns"))).as("pk"))
      .select(col("di"), col("pk.active").as("peak_concurrency"),
        (-col("pk.ns")).as("peak_sec"))
    val daySessions = clipped.groupBy("di").agg(count(lit(1)).as("n_sessions"))
    peaks.join(daySessions, "di")
      .select(date_add(to_date(lit("1970-01-01")), col("di").cast("int"))
          .as("day"),
        col("n_sessions"), col("peak_concurrency"), col("peak_sec"))
      .orderBy("day")
  }

  /** Multi-touch attribution report — the fractional-credit complement
    * of q60's last-touch as-of join: every click/view in the 7 days
    * before a purchase earns credit, weighted by recency. The decay
    * scheme is BASE-2 by recency rank (most recent touch = 1/2, next
    * = 1/4, …, capped at rank 20): every weight is a dyadic rational
    * ≥ 2⁻²⁰, so the cross-purchase credit sums are EXACT in IEEE
    * double regardless of summation order — the one decay ladder
    * whose aggregate is bit-reproducible across engines without any
    * quantization trick (a λ·e^{−Δt} decay would make the report
    * order-dependent). Alongside: raw touch counts and the exact
    * last-touch counts (rank 1), tying the report back to q60.
    *
    * Scale: purchases ⋈ touches is a user_id equi-join (never a
    * product); fan-out is per-user purchases × 7-day touches, and the
    * recency rank caps each purchase's credit list at 20 rows before
    * the final #channels-row aggregate. The rank window partitions by
    * purchase_id — uniform small partitions by construction.
    */
  def multiTouchAttribution(ev: DataFrame, lookbackDays: Int = 7,
                            maxTouches: Int = 20): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_timestamp(col("ts")).as("p_sec"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"),
        unix_timestamp(col("ts")).as("t_sec"))
    val joined = p.join(t, "user_id")
      .filter(col("t_sec") < col("p_sec") &&
        col("t_sec") >= col("p_sec") - lit(lookbackDays.toLong * 86400L))
    joined
      .withColumn("rnk", row_number().over(
        Window.partitionBy("purchase_id")
          .orderBy(col("t_sec").desc, col("touch_id").desc)))
      .filter(col("rnk") <= maxTouches)
      .groupBy("touch_type").agg(
        count(lit(1)).as("n_touches"),
        sum(when(col("rnk") === 1, 1L).otherwise(0L)).as("n_last_touch"),
        // 1 / 2^rank via shift-then-divide: both steps exact in IEEE
        sum(lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), rnk)"))
          .as("decay_credit"))
      .orderBy("touch_type")
  }

  def cusumChangepoint(ev: DataFrame): DataFrame =
    cusumFromDaily(ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))

  /** The CUSUM finisher over an ALREADY-AGGREGATED (event_type, day,
    * cnt) frame — the shared closing arithmetic of the batch operator
    * above and the streaming twin
    * ([[graft.streaming.StreamPipeline.dailyCountsStream]] emits
    * finalized daily counts; a foreachBatch consumer runs THIS on the
    * accumulated rows to refresh the live changepoint alert — the
    * q187 registers-plus-shared-finisher pattern). The global
    * [min, max] calendar derives from the daily frame itself
    * (min/max day with ≥1 event — identical to deriving it from raw
    * events). Everything here runs on #types×#days rows.
    */
  def cusumFromDaily(daily: DataFrame): DataFrame = {
    val cal = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    // the grid's columns are re-aliased so their attribute ids are
    // FRESH: grid and right side both derive from `daily`, and when
    // the caller's `daily` is one materialized table read (the
    // streaming twin's memory sink) all three uses would otherwise
    // share ids and fail join resolution outright
    val dense = daily.select(col("event_type").as("event_type")).distinct()
      .crossJoin(broadcast(cal))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val whole = Window.partitionBy("event_type")
    val scored = dense
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("prefix", sum("cnt").over(byDay))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("total", sum("cnt").over(whole))
      .withColumn("m", col("prefix") * col("n") - col("i") * col("total"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(abs(col("m")).desc, col("day").asc)))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").cast("int").as("n_days"),
        col("day").as("peak_day"), col("m").as("cusum_num"),
        when(col("m") >= 0, lit("above")).otherwise(lit("below"))
          .as("direction"))
      .orderBy("event_type")
  }

  /** CDC log compaction — the SCD1 / last-writer-wins MERGE every
    * lakehouse table maintenance job runs: a change log of
    * insert/update/delete ops per entity collapses to the final
    * entity state (the Delta/Hudi "compact the deltas into the
    * snapshot" step, expressed engine-side). Op mapping from the
    * events feed: `signup` → I, `purchase` → U (new value), `error`
    * → D (tombstone); `view`/`click` are reads, not changes. Order
    * within an entity is (second, event_id) — the ingest tiebreak —
    * and a D followed by a later I correctly resurrects the entity.
    *
    * Scale: one hash partition on `user_id` drives both the
    * last-writer window (row_number inside natural per-key
    * partitions, never a global sort) and the op-count aggregate;
    * Catalyst shares the Exchange. Values quantize to cents BIGINT
    * on the way in (the q206 money discipline) and only the final
    * per-entity row re-scales to display dollars.
    */
  def cdcCompact(ev: DataFrame): DataFrame = {
    val ops = ev.select(col("user_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "purchase", "U")
          .when(col("event_type") === "error", "D").as("op"),
        floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
      .filter(col("op").isNotNull)
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec").desc, col("event_id").desc)
    val last = ops.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("op").as("final_op"), col("cents"))
    val counts = ops.groupBy("user_id").agg(
      count(lit(1)).as("n_ops"),
      sum(when(col("op") === "D", 1).otherwise(0)).cast("bigint").as("n_deletes"))
    counts.join(last, Seq("user_id"))
      .selectExpr("user_id", "n_ops", "n_deletes",
        "CASE WHEN final_op = 'D' THEN 0 ELSE 1 END AS alive",
        "CASE WHEN final_op = 'D' THEN NULL " +
          "ELSE CAST(cents AS DOUBLE) / 1e2 END AS final_value")
      .orderBy("user_id")
  }

  /** Leakage-safe churn training-set builder: features strictly from
    * the observation window (days ≤ cutoff = last day − `horizon`),
    * label strictly from the holdout window after it — the temporal
    * split every churn/propensity model needs and every naive
    * "features from all history" job silently violates. Emits one
    * row per user active in the observation window: activity volume,
    * purchase behaviour, breadth (active days), recency at cutoff,
    * and churned = 1 iff the user has NO event in the holdout.
    *
    * Scale: one groupBy(user_id) over the observation slice builds
    * every feature; the label is a left-anti-shaped left join against
    * the DISTINCT holdout users (ids only — the holdout's payload
    * never shuffles). The cutoff ships as a broadcast 1-row frame,
    * never a driver collect. Money stays cents-BIGINT until display.
    */
  def churnLabels(ev: DataFrame, horizon: Int = 14): DataFrame = {
    val days = ev.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("bigint").as("d"),
      col("event_type"),
      floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
    val cutoff = days.agg((max("d") - horizon).as("cutoff"))
    val tagged = days.crossJoin(broadcast(cutoff))
    val feat = tagged.filter(col("d") <= col("cutoff"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("bigint").as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).cast("bigint").as("spend_cents"),
        countDistinct(col("d")).as("n_active_days"),
        max(col("cutoff") - col("d")).as("oldest_gap"),
        min(col("cutoff") - col("d")).as("recency_days"))
    val holdout = tagged.filter(col("d") > col("cutoff"))
      .select("user_id").distinct().withColumn("seen", lit(1))
    feat.join(holdout, Seq("user_id"), "left")
      .selectExpr("user_id", "n_events", "n_purchases",
        "CAST(spend_cents AS DOUBLE) / 1e2 AS spend",
        "n_active_days", "recency_days", "oldest_gap",
        "CASE WHEN seen IS NULL THEN 1 ELSE 0 END AS churned")
      .orderBy("user_id")
  }

  /** Weight-of-evidence / information-value audit — the
    * credit-scoring-born screen that answers "does this feature
    * actually separate the target" BEFORE a model trains on it.
    * Feature: observation-window activity (events on days ≤ cutoff =
    * last − `horizon`, the [[churnLabels]] temporal split). Target:
    * top-half holdout spender — holdout purchase cents above the
    * labeled population's median, a median split so BOTH classes
    * exist at every corpus scale by construction (churn/purchase
    * incidence in this feed is degenerate — every user stays active).
    * Quintile-binned: WOEᵢ = ln((hiᵢ/hi)/(loᵢ/lo)) with +0.5 Laplace
    * smoothing (an empty cell must not produce ln(0)), IVᵢ =
    * (hiᵢ/hi − loᵢ/lo)·WOEᵢ.
    *
    * Scale: one observation-window groupBy for the feature, one
    * holdout groupBy for the target, an id-only join between them;
    * thresholds and the median are ONE broadcast percentile
    * aggregate each (the q206 discipline — never a global ntile
    * sort); output is 5 rows. Counts exact BIGINTs, each rate one
    * IEEE divide, ln/closing formula text shared, display
    * floor-quantized.
    */
  def woeAudit(ev: DataFrame, horizon: Int = 14): DataFrame = {
    val days = ev.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("bigint").as("d"),
      col("event_type"),
      floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
    val cutoff = days.agg((max("d") - horizon).as("cutoff"))
    val tagged = days.crossJoin(broadcast(cutoff))
    val feat = tagged.filter(col("d") <= col("cutoff"))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val spend = tagged.filter(col("d") > col("cutoff") &&
        col("event_type") === "purchase")
      .groupBy("user_id").agg(sum("cents").as("ho_cents"))
    val joined = feat.join(spend, Seq("user_id"), "left")
      .withColumn("ho_cents", coalesce(col("ho_cents"), lit(0L)))
    val med = joined.agg(percentile(col("ho_cents"), lit(0.5)).as("med"))
    val labeled = joined.crossJoin(broadcast(med))
      .withColumn("hi", when(col("ho_cents") > col("med"), 1).otherwise(0))
      .select("user_id", "n_events", "hi")
    val th = labeled.agg(
      percentile(col("n_events"), lit(0.2)).as("t1"),
      percentile(col("n_events"), lit(0.4)).as("t2"),
      percentile(col("n_events"), lit(0.6)).as("t3"),
      percentile(col("n_events"), lit(0.8)).as("t4"))
    val tot = labeled.agg(
      sum(when(col("hi") === 1, 1).otherwise(0)).cast("bigint").as("hi_tot"),
      sum(when(col("hi") === 0, 1).otherwise(0)).cast("bigint").as("lo_tot"))
    labeled.crossJoin(broadcast(th))
      .withColumn("bin",
        when(col("n_events") <= col("t1"), 1)
          .when(col("n_events") <= col("t2"), 2)
          .when(col("n_events") <= col("t3"), 3)
          .when(col("n_events") <= col("t4"), 4).otherwise(5))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("hi") === 1, 1).otherwise(0)).cast("bigint").as("n_hi"))
      .crossJoin(broadcast(tot))
      .selectExpr("bin", "n_users", "n_hi",
        "floor(CAST(n_hi AS DOUBLE) / n_users * 1e4 + 0.5) / 1e4 AS hi_rate",
        "floor(ln(((CAST(n_hi AS DOUBLE) + 0.5) / hi_tot) / " +
          "((CAST(n_users - n_hi AS DOUBLE) + 0.5) / lo_tot)) * 1e4 + 0.5) / 1e4 AS woe",
        "floor((CAST(n_hi AS DOUBLE) / hi_tot - " +
          "CAST(n_users - n_hi AS DOUBLE) / lo_tot) * " +
          "ln(((CAST(n_hi AS DOUBLE) + 0.5) / hi_tot) / " +
          "((CAST(n_users - n_hi AS DOUBLE) + 0.5) / lo_tot)) * 1e6 + 0.5) / 1e6 AS iv_term")
      .orderBy("bin")
  }

  /** Half-over-half trending keys: smoothed log-lift of each props-`k`
    * key's event count in the span's second half vs its first — the
    * what-took-off screen (bot surges, feature launches, data-feed
    * shifts) run before anyone eyeballs dashboards. +0.5 smoothing
    * keeps new keys (c1 = 0) finite instead of infinite, and the
    * lift is symmetric: a disappearing key scores the mirror-image
    * negative.
    *
    * Scale: one map pass (day + JSON key extraction) → one groupBy(k)
    * with two conditional BIGINT counts → #keys rows; the top-N is
    * TakeOrdered (heap per partition + N-row driver merge), never a
    * full sort. The span ships as a broadcast 1-row frame.
    */
  def trendingKeys(ev: DataFrame, topN: Int = 20): DataFrame =
    trendingFromDayKeys(
      ev.select(
          (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
            .cast("bigint").as("d"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k").isNotNull),
      topN)

  /** [[trendingKeys]] served from the materialized parsed-props frame
    * ([[JsonRouting.propsLongCached]]): the probe reads an
    * already-parsed (d, prop_key, value) parquet — no per-row JSON
    * extraction, no timestamp truncation — filters the one key and
    * runs the same bounded groupBy + TakeOrdered. `try_cast(value AS
    * INT)` on the map-extracted string ≡ `get_json_object(...$.k)
    * CAST INT` on valid JSON (both null out non-numeric and absent
    * keys; malformed JSON is dropped by both parses) — spec-asserted
    * identical to self-computing.
    */
  def trendingKeysCached(ev: DataFrame, dir: String,
                         topN: Int = 20): DataFrame =
    trendingFromDayKeys(
      JsonRouting.propsLongCached(ev, dir)
        .filter(col("prop_key") === "k")
        .select(col("d"), expr("try_cast(value AS INT)").as("k"))
        .filter(col("k").isNotNull),
      topN)

  private def trendingFromDayKeys(days: DataFrame, topN: Int): DataFrame = {
    val span = days.agg(min("d").as("d0"), max("d").as("d1"))
    days.crossJoin(broadcast(span))
      .withColumn("half",
        when(col("d") < expr("(d0 + d1 + 1) div 2"), 0).otherwise(1))
      .groupBy("k")
      .agg(sum(when(col("half") === 0, 1).otherwise(0)).cast("bigint").as("c1"),
        sum(when(col("half") === 1, 1).otherwise(0)).cast("bigint").as("c2"))
      .selectExpr("k", "c1", "c2",
        "floor(ln((CAST(c2 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5)) * 1e4 + 0.5) / 1e4 AS lift")
      .orderBy(col("lift").desc, col("k")).limit(topN)
  }

  /** Lead–lag cross-correlation between two event types' daily count
    * series (default: does `error` volume LEAD `purchase` volume?) —
    * the q161 autocorrelation's bivariate sibling: Pearson r of
    * x(d) = a-count vs y(d+lag) = b-count for lag ∈ [−maxLag,
    * +maxLag], a positive peak at lag +L reading "a at day d
    * co-moves with b L days later". The calendar densifies to the
    * global span with zero-fill (a missing day is a 0-count
    * observation, not an absent row — dropping it biases r toward
    * the busy days).
    *
    * Scale: events collapse to the #days×2 daily frame first; the
    * lag fan-out and the shifted self-join run entirely on that
    * bounded spine. All sufficient statistics are exact BIGINTs;
    * r's closing formula is the q161 text (each variance under its
    * own sqrt — the BIGINT product of the two would overflow).
    */
  def crossCorrelation(ev: DataFrame, typeA: String = "purchase",
                       typeB: String = "error", maxLag: Int = 7): DataFrame = {
    val daily = ev.select(
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("bigint").as("d"),
        col("event_type"))
      .groupBy("d")
      .agg(sum(when(col("event_type") === typeA, 1).otherwise(0))
          .cast("bigint").as("a"),
        sum(when(col("event_type") === typeB, 1).otherwise(0))
          .cast("bigint").as("b"))
    val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
    val spine = span.select(explode(sequence(col("d0"), col("d1"))).as("d"))
      .join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shifted join: y at day d + lag
    val pairs = spine.select(col("d"), col("a"))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .join(spine.select(col("d").as("dy"), col("b")),
        col("dy") === col("d") + col("lag"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_days"),
        sum("a").cast("bigint").as("sx"), sum("b").cast("bigint").as("sy"),
        sum(expr("a * b")).cast("bigint").as("sxy"),
        sum(expr("a * a")).cast("bigint").as("sxx"),
        sum(expr("b * b")).cast("bigint").as("syy"))
      .selectExpr("lag", "n_days",
        "round((CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /" +
          " nullif(sqrt(CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *" +
          "        sqrt(CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0.0)," +
          " 4) AS xcorr")
      .orderBy("lag")
  }

  /** Stationary distribution of the empirical event-type Markov chain
    * (q116's transition matrix) by bounded power iteration — "where
    * does the user journey spend its time in the long run", the
    * one-number-per-state summary the transition MATRIX doesn't give.
    *
    * Exactness: probabilities never exist as floats. Transition rates
    * quantize once to q9 = ⌊c(a,b)·10⁹ / tot(a)⌋ (integer div of
    * exact BIGINTs), the mass vector lives at the same 10⁹ scale, and
    * each step is x'ᵢ = Σⱼ ⌊xⱼ·q9(j,i) / 10⁹⌋ — every term an exact
    * BIGINT (≤ 10¹⁸, no overflow), every sum order-free, so both
    * engines run bit-identical integer arithmetic for all `iters`
    * steps (the floor leaks ≤ |S|·iters units of 10⁻⁹ mass — the
    * audit column makes the leak visible instead of renormalizing it
    * away).
    *
    * Scale: ONE pass over events builds the |S|²-row rate frame; the
    * iteration then never touches data again — each step is a join
    * between two ≤ |S|²-row broadcast-sized frames. iters is a
    * compile-time bound, not a convergence loop: the plan is a fixed
    * 8-deep chain, no driver-side convergence collect.
    */
  def markovStationary(ev: DataFrame, iters: Int = 8): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = ev
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val tot = counts.groupBy("from_type").agg(sum("n").as("tot"))
    val rates = counts.join(tot, Seq("from_type"))
      .selectExpr("from_type", "to_type",
        "CAST((n * 1000000000) div tot AS BIGINT) AS q9")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // union of sources AND destinations: an absorbing state (appears
    // only as to_type, no outgoing transitions) must stay in the
    // output, else the mass flowing into it silently vanishes —
    // invisible even to the mass_e9 floor-leak audit column. Dangling
    // states get the standard implicit self-loop (q9 = 10⁹) so their
    // mass ACCUMULATES instead of evaporating each step; on a corpus
    // with no absorbing types the self-loop set is empty and the
    // result is bit-identical to the pre-fix output.
    val states = rates.select(col("from_type").as("state"))
      .union(rates.select(col("to_type").as("state"))).distinct()
    val dangling = states.join(
      rates.select(col("from_type").as("state")).distinct(),
      Seq("state"), "left_anti")
    val ratesFull = rates.unionByName(dangling.selectExpr(
      "state AS from_type", "state AS to_type",
      "CAST(1000000000 AS BIGINT) AS q9"))
    val nStates = states.agg(count(lit(1)).as("n_states"))
    var x = states.crossJoin(broadcast(nStates))
      .selectExpr("state", "CAST(1000000000 div n_states AS BIGINT) AS xv")
    // r18: broadcast the #states-row mass vector into each step —
    // x is tiny by construction (one row per event type), so a
    // broadcast-hash join replaces the per-iteration sort + exchange
    // of both join sides (guide §3.1); the transition frame stays
    // persisted and is re-read, never re-shuffled
    for (_ <- 1 to iters)
      x = ratesFull.join(broadcast(x.withColumnRenamed("state", "from_type")),
          Seq("from_type"))
        .groupBy(col("to_type").as("state"))
        .agg(sum(expr("(xv * q9) div 1000000000")).cast("bigint").as("xv"))
    states.join(x, Seq("state"), "left")
      .withColumn("mass_e9", coalesce(col("xv"), lit(0L)))
      .selectExpr("state", "mass_e9",
        "CAST(mass_e9 AS DOUBLE) / 1e9 AS stationary")
      .orderBy("state")
  }
}
