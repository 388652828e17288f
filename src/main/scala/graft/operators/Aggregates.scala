package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation layer (SURVEY.md §2.6): grouped counts with derived
  * percentages, multi-column averages, one-pass null counts,
  * describe-style stats, exact + approximate quantiles, Pearson
  * correlation, confusion-matrix counts, and time-bucketed aggregates.
  *
  * Scale notes: every groupBy here is a hash aggregate with map-side
  * partial aggregation (HashAggregateExec partial → shuffle on the
  * group key → final), so shuffled bytes are proportional to the
  * number of groups, not rows. Group keys are tiny (flag/status/hour)
  * → the shuffle is a few KB even at 100 TB input. `orderBy` on the
  * post-aggregation frame sorts only the group rows.
  */
object Aggregates {

  /** A12+X2: the flagship hourly-activity rollup, reproducing
    * eda/eda_analysis.py:111-118 (hour-of-day occupancy pattern) over
    * the events table.
    */
  def hourlyActivity(ev: DataFrame): DataFrame =
    ev.select(hour(col("ts")).as("hour"), col("value"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("hour")

  /** A12+X3: day-of-week rollup with the reference's Monday=1 remap
    * `((dayofweek + 5) % 7) + 1` (eda/eda_analysis.py:103-107; Spark
    * dayofweek is 1=Sunday).
    */
  def dowActivity(ev: DataFrame): DataFrame =
    ev.withColumn("dow_mon1", ((dayofweek(col("ts")) + lit(5)) % lit(7)) + lit(1))
      .groupBy("dow_mon1")
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .orderBy("dow_mon1")

  /** A2+A3: class-distribution count with derived percentage
    * (eda/eda_analysis.py:62-68). The total comes from an empty-frame
    * window over the already-aggregated (tiny) result, not a second
    * scan of the input.
    */
  def statusDistribution(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy() // post-agg frame is #distinct-statuses rows; single task is fine
    orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .withColumn("pct", round(col("n") * lit(100.0) / sum("n").over(w), 2))
      .orderBy("o_orderstatus")
  }

  /** A4+X1: multi-column rounded averages per group
    * (eda/eda_analysis.py:79-88).
    */
  def avgByGroup(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        round(avg("l_quantity"), 3).as("avg_qty"),
        round(avg("l_extendedprice"), 3).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        round(avg("l_tax"), 4).as("avg_tax"))
      .orderBy("l_returnflag")

  /** A5+X11+F3: per-column null counts in ONE pass via
    * sum(isNull.cast(int)) (eda/eda_analysis.py:35-39). The testdata
    * has no nulls, so nulls are injected deterministically
    * (event_type='error' → null; value<5 → null) to exercise the op.
    */
  def nullCounts(ev: DataFrame): DataFrame = {
    val etype = when(col("event_type") === "error", lit(null)).otherwise(col("event_type"))
    val v     = when(col("value") < lit(5.0), lit(null)).otherwise(col("value"))
    ev.select(etype.as("etype"), v.as("v"))
      .select(
        sum(col("etype").isNull.cast("int")).as("null_etype"),
        sum(col("v").isNull.cast("int")).as("null_v"),
        count(lit(1)).as("n"))
  }

  /** A7: describe()-equivalent as an explicit single-pass aggregate
    * (count/mean/stddev/min/max per numeric column,
    * eda/eda_analysis.py:48) so the oracle can check it column by
    * column. `df.describe()` itself returns stringly rows — tested in
    * ScalaTest instead.
    */
  def describeStats(li: DataFrame): DataFrame =
    li.agg(
      count(lit(1)).as("n"),
      round(avg("l_quantity"), 4).as("qty_mean"),
      round(stddev("l_quantity"), 4).as("qty_std"),
      min("l_quantity").as("qty_min"),
      max("l_quantity").as("qty_max"),
      round(avg("l_extendedprice"), 4).as("price_mean"),
      round(stddev("l_extendedprice"), 4).as("price_std"),
      min("l_extendedprice").as("price_min"),
      max("l_extendedprice").as("price_max"))

  /** A8 (exact twin): per-group exact percentiles via the `percentile`
    * aggregate — linear interpolation, same definition as DuckDB's
    * quantile_cont, so it is hash-comparable. approxQuantile itself is
    * the next method.
    */
  def quantilesByGroup(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("q25"),
        round(percentile(col("l_quantity"), lit(0.5)), 4).as("q50"),
        round(percentile(col("l_quantity"), lit(0.75)), 4).as("q75"))
      .orderBy("l_returnflag")

  /** A8 (approximate, the reference's actual call —
    * eda/eda_analysis.py:52 uses approxQuantile relErr 0.01):
    * `percentile_approx` (Greenwald–Khanna). Approximate ⇒ no DuckDB
    * hash oracle; driver records a rows-only check, ScalaTest bounds
    * it against the exact values. Emitted as three SCALAR columns
    * (not array&lt;double&gt;) so any tabular comparator can consume the
    * result.
    */
  def approxQuantilesByGroup(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("aq"))
      .select(col("l_returnflag"),
        element_at(col("aq"), 1).as("q25_approx"),
        element_at(col("aq"), 2).as("q50_approx"),
        element_at(col("aq"), 3).as("q75_approx"))
      .orderBy("l_returnflag")

  /** A9: Pearson correlation as an aggregate (eda/eda_analysis.py:133-141
    * uses df.stat.corr — same `corr` expression under the hood).
    */
  def correlations(li: DataFrame): DataFrame =
    li.agg(
      round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
      round(corr("l_discount", "l_tax"), 6).as("corr_disc_tax"))

  /** A10: confusion-matrix-style two-key grouped count
    * (ml/train_model.py:239-243), with deterministic stand-in
    * label/prediction columns derived from the events table.
    */
  def confusionMatrix(ev: DataFrame): DataFrame =
    ev.withColumn("label", (col("value") > lit(50.0)).cast("int"))
      .withColumn("prediction", (col("event_id") % 2 === 0).cast("int"))
      .groupBy("label", "prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")

  /** ROLLUP hierarchy: (flag, status) → (flag) → grand total, with
    * per-dimension grouping indicators. Super-aggregate rows surface
    * their key as '(all)' so null semantics can't diverge between
    * engines. One pass, same partial-aggregation shape as a flat
    * groupBy.
    */
  def rollupFlagStatus(li: DataFrame): DataFrame =
    li.rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("qty_sum"),
        grouping("l_returnflag").cast("int").as("g_flag"),
        grouping("l_linestatus").cast("int").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("g_flag"), col("g_status"), col("n"), col("qty_sum"))
      .orderBy("g_flag", "g_status", "flag", "status")

  /** CUBE over (returnflag, linestatus): all four grouping-set
    * combinations in one pass — same partial-aggregation shape as a
    * flat groupBy, one shuffle, the expansion happens map-side.
    * Super-aggregate keys surface as '(all)' and the grouping
    * indicators disambiguate them from genuine nulls (mirrors
    * [[rollupFlagStatus]], which only emits the rollup prefix sets).
    */
  def cubeFlagStatus(li: DataFrame): DataFrame =
    li.cube("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        round(sum("l_quantity"), 2).as("qty_sum"),
        grouping("l_returnflag").cast("int").as("g_flag"),
        grouping("l_linestatus").cast("int").as("g_status"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("status"),
        col("g_flag"), col("g_status"), col("n"), col("qty_sum"))
      .orderBy("g_flag", "g_status", "flag", "status")

  /** GROUPING SETS with hand-picked sets — the general form
    * [[cubeFlagStatus]]'s cube and a rollup can't express: BOTH
    * independent marginal breakdowns (by status, by priority) of the
    * orders fact in ONE scan, with no cross-product stratum. Exactly
    * the shape a reporting layer wants when two dashboards share one
    * pass over the fact table; at 100 TB the scan is the cost, and
    * this halves it vs two groupBys. `grouping()` flags disambiguate
    * the strata (the coalesce sentinel alone can't — a real "(all)"
    * key would collide). Spark expands the sets BEFORE the exchange
    * (one Expand + one partial-aggregated shuffle, same plan family
    * as cube) — map-side combine still applies per set.
    */
  def marginalsGroupingSets(ord: DataFrame): DataFrame =
    ord.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("revenue"),
        grouping("o_orderstatus").cast("int").as("g_status"),
        grouping("o_orderpriority").cast("int").as("g_priority"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("g_status"), col("g_priority"), col("n"), col("revenue"))
      .orderBy("g_status", "status", "priority")

  /** Trailing-window anomaly detection: z-score of each event's value
    * against the previous `lookback` events of the same type (frame
    * excludes the current row, so the baseline can't absorb the
    * outlier). Partitioned by event_type ⇒ the sort is per-partition,
    * never global; ties on ts break by event_id so the frame content
    * is deterministic on both engines. The threshold compares the
    * ROUNDED z-score, keeping the row set stable against sub-ulp
    * engine differences in the windowed avg/stddev.
    */
  def movingZscore(ev: DataFrame, lookback: Int = 10,
                   zThreshold: Double = 3.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    ev.withColumn("ma", avg("value").over(w))
      .withColumn("sd", stddev_samp("value").over(w))
      .withColumn("zscore", round((col("value") - col("ma")) / col("sd"), 4))
      .filter(col("sd") > 0 && abs(col("zscore")) > zThreshold)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"), col("zscore"))
      .orderBy("event_id")
  }

  /** Distribution-rank family per group: quartile (ntile), percent
    * rank and cumulative distribution of order value within each
    * priority class. Unique tiebreak (orderkey) ⇒ every rank is
    * deterministic; one per-group sort, no global ordering until the
    * final presentation orderBy.
    */
  def priceRankFamily(orders: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** Pivot: day-of-week × event-type count matrix. The pivot values
    * are declared (never discovered via an extra job) — the scale-safe
    * form; absent combinations coalesce to 0.
    */
  def pivotDowByType(ev: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = ev
      .withColumn("dow_mon1", ((dayofweek(col("ts")) + lit(5)) % lit(7)) + lit(1))
      .groupBy("dow_mon1")
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("dow_mon1")
  }

  /** Exact distinct-count per group (shuffles the distinct values). */
  def distinctUsersByType(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** HyperLogLog++ distinct sketch (SURVEY §2.13) — fixed-size
    * mergeable state, ONE pass, no distinct shuffle: the 100 TB path
    * when ±2% suffices. Approximate ⇒ rows-only check; accuracy is
    * bounded against the exact twin in ScalaTest.
    */
  def approxDistinctUsersByType(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Sessionization: gap-based session ids per user via lag + running
    * sum — both windows partition by user_id, so the work distributes
    * by user; no global ordering anywhere. The canonical time-series
    * shape for clickstream/training-log data at scale.
    */
  def sessionize(ev: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("session_idx").cast("int").as("session_idx"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** Tumbling event-time window aggregate — the batch twin of the
    * Structured Streaming windowed count in
    * [[graft.streaming.StreamPipeline]]. `window().start` ≡
    * date_trunc('hour', ts) for a 1-hour tumble.
    */
  /** Native session-window aggregate: Spark's `session_window`
    * (dynamic-gap windows that merge while events arrive within the
    * gap; end = last event + gap). The declarative twin of the manual
    * lag/running-sum [[sessionize]] — and the form that runs unchanged
    * as a streaming aggregation with a watermark. Boundary semantics
    * (verified empirically, spec-pinned): an event exactly `gap` after
    * the previous one still MERGES — a new session starts only when
    * the difference EXCEEDS the gap, the same `> gap` rule as
    * [[sessionize]].
    */
  def sessionWindowAgg(ev: DataFrame, gap: String = "30 minutes"): DataFrame =
    ev.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("value_sum"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("value_sum"))
      .orderBy("user_id", "session_start")

  def hourWindowCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("value_sum"))
      .orderBy("window_start", "event_type")

  /** Per-group winsorization — the outlier-taming stage of metric/
    * sensor cleaning: clip each value to its own event type's exact
    * [pLo, pHi] quantile band, with a clipped audit flag. The bounds
    * frame is #groups rows broadcast back onto the facts, so the
    * corpus pays one quantile shuffle and the clip itself is a
    * narrow map — the same broadcast-calibration shape as
    * [[graft.operators.TextAnalysis.sourceQualityGate]]. Bounds are
    * ROUNDED to 4 decimals before the comparison on both engines, so
    * a sub-ulp interpolation difference can't flip a clip verdict.
    */
  def winsorize(ev: DataFrame, pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = ev.groupBy("event_type").agg(
      round(percentile(col("value"), lit(pLo)), 4).as("lo"),
      round(percentile(col("value"), lit(pHi)), 4).as("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        round(greatest(least(col("value"), col("hi")), col("lo")), 4).as("value_w"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clipped"))
      .orderBy("event_id")
  }

  /** Last-observation-carried-forward imputation — the canonical
    * sensor-gap fill (the reference's occupancy domain reads exactly
    * this kind of feed): per user, a missing value takes the most
    * recent earlier observation; leading gaps (no prior observation)
    * stay null, loudly. One per-key window with a bounded-entry
    * running `last(ignoreNulls)` — the same single hash-partition +
    * sort any per-user operator pays, no extra shuffle.
    *
    * The synthetic events table has no gaps, so the query tier seeds
    * them deterministically (value nulled where event_id % 7 = 0 —
    * the q73 PII-seeding convention, mirrored token-for-token in the
    * oracle) and then imputes them for real.
    */
  def locfImpute(ev: DataFrame): DataFrame = {
    val gapped = ev.withColumn("v_gap",
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gapped
      .withColumn("v_filled", last(col("v_gap"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"),
        col("v_gap").isNull.as("was_gap"),
        round(col("v_filled"), 4).as("v_filled"))
      .orderBy("event_id")
  }

  /** Hot-key detector — the skew audit run BEFORE a big join or
    * repartition: top-k keys by frequency with each key's share of
    * the table. A key whose frac approaches a task's worth of rows is
    * the one that needs salting ([[SetOps.saltedEventTypeCounts]]) or
    * an AQE skew split; this query is how you find it without reading
    * executor logs post-mortem.
    *
    * Shape: map-side-combined count per key, the corpus total folded
    * in as a broadcast 1-row frame (the [[TextAnalysis.tfidfTopTerm]]
    * idiom — no driver collect), selection via TakeOrdered (heap
    * per partition + k-row driver merge, never a full sort).
    */
  def hotKeys(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    // the total re-aggregates the #keys-row counts frame, NOT the
    // input — a second full scan of the fact table would double the
    // audit's read cost on exactly the table it exists to protect
    // (ReuseExchange shares the counts shuffle between the two sides)
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        round(col("n") / col("total"), 6).as("frac"))
      .orderBy(col("n").desc, col("key")).limit(k)
  }

  /** Benford first-digit audit — the data-forensics screen run on any
    * money/size column before trusting a new feed: naturally-grown
    * multiplicative quantities follow log₁₀(1+1/d) first-digit
    * frequencies, and a synthetic, truncated, or hand-edited feed
    * visibly doesn't. Emits observed share vs the Benford expectation
    * per digit 1–9 with the per-digit deviation.
    *
    * Exactness discipline: values quantize to integer cents
    * (moneyRound's floor convention), and the leading digit is
    * `cents ÷ 10^(len(str(cents))−1)` — STRING length of an exact
    * integer, identical on every engine, where float log₁₀ at a
    * power-of-ten boundary could flip a digit. One map-side-combined
    * 9-row aggregate; shares are single divisions off exact counts;
    * the ln-based expectation is rounded at 6 (the q128 ln
    * convention).
    */
  def benfordAudit(ord: DataFrame, valueCol: String = "o_totalprice"): DataFrame = {
    val cents = floor(col(valueCol) * 100 + 0.5).cast("long")
    // explicit floor: Spark's double→int cast truncates but DuckDB's
    // ROUNDS — floor on both sides is the engine-neutral form
    val digit = floor(cents / pow(lit(10.0), length(cents.cast("string")) - 1))
      .cast("int")
    ord.filter(col(valueCol) > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 6).as("share"),
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6)
          .as("benford"),
        round(abs(col("n") / col("total") -
          log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))), 6)
          .as("abs_dev"))
      .orderBy("digit")
  }

  /** Declarative data-quality expectations (the Deequ pattern) over
    * the orders table, evaluated in ONE scan: completeness
    * (non-null rate), key uniqueness (distinct/total), accepted-value
    * membership, a positivity bound, and a format regex — the
    * constraint suite a nightly ingest gate runs before anything
    * downstream trusts the load. One row per check with the exact
    * pass counts, the rate, and a pass flag.
    *
    * Determinism: every metric is an exact integer count (nulls fail
    * their check via CASE semantics in both engines); the rate is one
    * IEEE division rounded at 6; `passed` is an INTEGER comparison
    * (n_ok = n_total), never a double threshold — no boundary ulps
    * can flip a verdict.
    *
    * Scale: a single partial aggregate over one scan — the distinct
    * count rides the same pass via Spark's expand (and at extreme
    * cardinality would swap to HLL, q49's sketch, with the check
    * becoming approximate and flagged as such). The stack() to rows
    * happens on the ONE aggregated row.
    */
  def expectationsAudit(ord: DataFrame): DataFrame =
    ord.agg(
        count(lit(1)).as("n"),
        sum(col("o_custkey").isNotNull.cast("long")).as("c_cust"),
        countDistinct(col("o_orderkey")).as("d_key"),
        sum(col("o_orderstatus").isin("O", "F", "P").cast("long")).as("c_status"),
        sum((col("o_totalprice") > 0).cast("long")).as("c_price"),
        sum(col("o_orderpriority").rlike("^[1-5]-").cast("long")).as("c_prio"))
      .selectExpr(
        """stack(5,
          |'accepted_values:o_orderstatus', c_status, n,
          |'completeness:o_custkey', c_cust, n,
          |'format:o_orderpriority', c_prio, n,
          |'positive:o_totalprice', c_price, n,
          |'unique:o_orderkey', d_key, n) AS (checkname, n_ok, n_total)"""
          .stripMargin)
      .selectExpr("checkname", "n_ok", "n_total",
        "round(CAST(n_ok AS DOUBLE) / n_total, 6) AS rate",
        "CAST(n_ok = n_total AS INT) AS passed")
      .orderBy("checkname")

  /** Pivot (long → wide): monthly order counts spread across status
    * columns — the `groupBy().pivot()` surface every dashboard query
    * reaches for. The status domain is DECLARED (`Seq("O","F","P")`),
    * which is the scale-correct form: an undeclared pivot runs a
    * distinct-collect job on the driver to discover columns before
    * the real plan exists. Missing cells coalesce to 0 so the wide
    * frame is total. Exact integer counts — nothing to round.
    *
    * Scale: one partial-aggregated (month, status) pass; the pivot
    * itself is a projection over the #months × 3 grid.
    */
  def pivotMonthlyStatus(ord: DataFrame): DataFrame =
    ord.select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderstatus"))
      .groupBy("month").pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("month"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_pending"))
      .orderBy("month")

  /** Unpivot (wide → long, `Dataset.unpivot`/melt) + per-metric
    * profile: the four lineitem measures melt into (metric, value)
    * rows and aggregate to count / min / max / mean — the long-format
    * summary a metrics store or feature-stats job wants, and the
    * inverse surface of [[pivotMonthlyStatus]].
    *
    * The mean is exact-by-quantization (q147): values are 2-decimal
    * money / quantities / rates, so ×10⁴ scaling is lossless; the
    * BIGINT sum is order-free and the mean ONE closing division,
    * round(6). min/max are order-free raw doubles.
    *
    * Scale: unpivot is a per-row Expand (4 rows out per row in, no
    * shuffle), then one partial-aggregated 4-group pass.
    */
  def unpivotMetricSummary(li: DataFrame): DataFrame =
    li.unpivot(
        Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .select(col("metric"),
        col("value"),
        floor(col("value") * 10000 + 0.5).cast("long").as("v4"))
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("v4")).as("s4"))
      .selectExpr("metric", "n", "min_value", "max_value",
        "round(CAST(s4 AS DOUBLE) / n / 10000, 6) AS mean_value")
      .orderBy("metric")

  /** k-anonymity / l-diversity privacy audit over the customer
    * dimension: treat (nation, market segment) as the quasi-identifier
    * an attacker could link on, and the account-balance band
    * (floor(acctbal/1000)) as the sensitive attribute. Each
    * quasi-identifier equivalence class reports its size (k-anonymity:
    * a class smaller than k re-identifies its members) and its
    * distinct sensitive values (l-diversity: a class with fewer than l
    * bands leaks the attribute even when k holds — the classic
    * homogeneity attack). The release-gate audit a data-sharing
    * pipeline runs before exporting "anonymized" rows.
    *
    * Everything is exact integer counting: class sizes, distinct
    * bands, and INTEGER flag comparisons — nothing to round anywhere.
    * The band floor runs on the same double in both engines.
    *
    * Scale: one scan, one partial-aggregated groupBy on the
    * quasi-identifier (the distinct-band count rides the same pass as
    * q166's key-grouped partial); output is #classes rows — bounded
    * by the quasi-identifier domain, not the table.
    */
  def kAnonymityAudit(cust: DataFrame, k: Int = 10, l: Int = 3): DataFrame =
    cust.select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band")).as("l_div"))
      .selectExpr("c_nationkey", "c_mktsegment", "n", "l_div",
        s"CAST(n >= $k AS INT) AS k_anonymous",
        s"CAST(l_div >= $l AS INT) AS l_diverse")
      .orderBy("c_nationkey", "c_mktsegment")

  /** Mergeable partial state for the hourly rollup: (hour, n, s) with
    * s the ×10⁴-QUANTIZED BIGINT value sum (the q147/q171 pattern) —
    * the sufficient statistics a stored materialized view keeps so
    * refreshes never rescan history. Quantization is what makes the
    * state truly mergeable: a raw double sum re-associates on every
    * merge, so two different base/delta splits can round(4) to
    * DIFFERENT averages (observed: 53.2497 vs 53.2498 on the sf0.001
    * events) — integer sums are bit-identical under any grouping.
    */
  def hourlyPartials(ev: DataFrame): DataFrame =
    ev.select(hour(col("ts")).as("hour"), col("value"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000).cast("long")).as("s"))

  /** Incremental view maintenance for the q01 hourly rollup: merge the
    * STORED partial state of the base corpus with the partials of a
    * newly-arrived delta batch — count and sum are commutative
    * monoids, so `union → re-aggregate` IS the refresh, and the
    * result provably equals the full recompute (the DuckDB oracle
    * RECOMPUTES from scratch over base ∪ delta; the hash match is the
    * incremental ≡ full proof). This is the 100 TB answer to "refresh
    * the dashboard": scan the delta, never the history — the base
    * side of this plan is 24 stored rows, not a corpus scan.
    *
    * The average materializes only at read time (round(s/n, 4), one
    * division) — storing it would make the state non-mergeable, the
    * classic IVM mistake.
    */
  def applyHourlyDelta(baseAgg: DataFrame, delta: DataFrame): DataFrame =
    baseAgg.unionByName(hourlyPartials(delta))
      .groupBy("hour")
      .agg(sum("n").as("n"), sum("s").as("s"))
      .select(col("hour"), col("n"),
        round(col("s").cast("double") / (col("n") * 10000L), 4)
          .as("avg_value"))
      .orderBy("hour")

  /** Right-to-be-forgotten propagation audit: scrub every event of the
    * users in `forget` (left_anti join — the deletion plan itself)
    * and then PROVE the propagation from the scrubbed frame: the
    * audit's residual count is computed over the output of the
    * scrub, not assumed, so a broken join condition shows up as
    * residual > 0 and a red `clean` flag rather than a silent
    * partial delete. All counts exact integers in one pass each;
    * the forget-list side of both joins is the small side (broadcast
    * or shuffle is the planner's call — at 100 TB a deletion batch
    * is still ≪ corpus).
    */
  def forgetUsersAudit(ev: DataFrame, forget: DataFrame): DataFrame = {
    val scrubbed = ev.join(forget, Seq("user_id"), "left_anti")
    val requested = forget.select(countDistinct("user_id").as("n_users_requested"))
    val affected = ev.join(forget, Seq("user_id"), "left_semi")
      .select(count(lit(1)).as("n_events_removed"),
        countDistinct("user_id").as("n_users_matched"))
    val before = ev.select(count(lit(1)).as("n_events_before"))
    val after = scrubbed.select(count(lit(1)).as("n_events_after"))
    val residual = scrubbed.join(forget, Seq("user_id"), "left_semi")
      .select(count(lit(1)).as("n_residual"))
    before.crossJoin(affected).crossJoin(after)
      .crossJoin(requested).crossJoin(residual)
      .select(col("n_events_before"), col("n_events_removed"),
        col("n_events_after"), col("n_users_requested"),
        col("n_users_matched"), col("n_residual"),
        (col("n_residual") === 0 &&
          col("n_events_after") + col("n_events_removed") ===
            col("n_events_before")).cast("int").as("clean"))
  }

  /** Per-source dataset fingerprint — the content-addressed identity
    * a data-versioning layer stamps on every snapshot: each row
    * collapses to a 60-bit md5 key over ALL its fields and the
    * per-source identity is the XOR of those keys plus the row count.
    * XOR is commutative/associative, so the fingerprint is
    * ORDER-FREE — two snapshots match iff their row SETS match,
    * regardless of partitioning, shuffle order, or file layout; this
    * is the one-line equality test behind q90's full snapshot diff
    * (run the cheap fingerprint first; diff only the sources whose
    * fingerprints moved). The documented XOR caveat — exactly
    * duplicated rows cancel pairwise — is void here because doc_id
    * is part of the hashed tuple and unique by schema contract.
    *
    * Scale: one map-side hash + a partial-aggregated XOR/count per
    * source; the shuffle carries one (source, long, long) row per
    * partition per source. Output is #sources rows.
    */
  def sourceFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        conv(substring(md5(concat_ws("\u0001", col("doc_id"), col("text"),
          col("lang"), col("n_chars"))), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_fp"))
      .orderBy("source")

  /** Self-join size estimation by key sampling — the optimizer
    * statistic that predicts a shuffle blowup BEFORE the join runs:
    * |R ⋈_k R| = Σ_k c(k)² (the second frequency moment F2), and a
    * 1-in-`rate` KEY sample (md5 of the key — sampling ROWS instead
    * biases F2 toward heavy keys) scaled by `rate` estimates it from
    * a fraction of the statistics build cost. Emitted as exact vs
    * estimate with the relative error — on `lineitem ⋈ lineitem` on
    * `l_partkey`, the textbook part-popularity self-join.
    *
    * Scale: one groupBy(key) builds c(k); exact and estimate are two
    * aggregates over that #keys frame (ReuseExchange shares the
    * shuffle). Everything to the error's single divide is exact
    * BIGINT; the md5 key sample is the engine-neutral determinism
    * trick (h % rate = 0 picks the same keys everywhere).
    */
  def selfJoinSizeEstimate(lineitem: DataFrame, rate: Int = 10): DataFrame = {
    val counts = lineitem.groupBy(col("l_partkey").as("k"))
      .agg(count(lit(1)).as("c"))
      .withColumn("h", conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
        .cast("long"))
    counts.agg(
        count(lit(1)).as("n_keys"),
        sum(expr("c * c")).cast("bigint").as("exact_f2"),
        sum(when(col("h") % rate === 0, 1).otherwise(0)).cast("bigint").as("n_sampled"),
        (sum(when(col("h") % rate === 0, expr("c * c")).otherwise(0L))
          * rate).cast("bigint").as("est_f2"))
      .selectExpr("n_keys", "exact_f2", "n_sampled", "est_f2",
        "floor(abs(CAST(est_f2 AS DOUBLE) - exact_f2) / exact_f2 * 1e4 + 0.5) / 1e4 AS rel_error")
  }
}
