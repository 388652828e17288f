package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust / distributional statistics the reference's EDA layer
  * (eda/eda_analysis.py:86-130) approaches with mean/std describe()
  * but never hardens: median-absolute-deviation outlier gates, the
  * Gini concentration coefficient, Shannon entropy of categorical
  * mixes, and the Zipf rank-frequency slope. Mean/std outlier rules
  * break on the heavy-tailed length/price distributions a 100 TB
  * corpus actually has; these are their robust replacements, each an
  * exact deterministic computation with a DuckDB oracle twin.
  *
  * Scale shapes: every operator aggregates FIRST (per-source /
  * per-customer / per-day partials) and only then applies the
  * order-statistic machinery, so full-table sorts never happen; the
  * only windows run inside small natural partitions (source, nation,
  * day) or over frames already capped to a constant (Zipf top-k).
  */
object RobustStats {

  /** Per-source MAD outlier gate over document lengths: median and
    * median-absolute-deviation of `n_chars`, plus how many documents
    * sit outside median ± 3·MAD — the robust twin of a z-score gate
    * (a single 10 MB document moves a std-based gate corpus-wide;
    * it moves MAD not at all).
    *
    * Three passes over a 2-column scan (source, n_chars): per-source
    * exact median (percentile, partial-aggregated), per-source MAD of
    * the absolute deviations, then the outlier count — the per-source
    * frames are broadcast back both times, so the document side never
    * shuffles and the whole plan is BroadcastHashJoins over one
    * narrow column scan per pass. At 1000 executors each pass is an
    * embarrassingly-parallel partial aggregate on #sources keys.
    */
  def madOutliers(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"), col("n_chars").cast("double").as("x"))
    val meds = base.groupBy("source")
      .agg(expr("percentile(x, 0.5)").as("med"))
    val withDev = base.join(broadcast(meds), "source")
      .withColumn("absdev", abs(col("x") - col("med")))
    val mads = withDev.groupBy("source")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    withDev.join(broadcast(mads), "source")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(max("med"), 4).as("median_len"),
        round(max("mad"), 4).as("mad_len"),
        sum(when(col("absdev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("source")
  }

  /** Gini coefficient of customer spend, per nation: how concentrated
    * is revenue among customers inside each market (0 = everyone
    * spends the same, →1 = one whale). Uses the rank formulation
    * G = (2·Σ i·xᵢ) / (n·Σ xᵢ) − (n+1)/n over per-customer totals
    * sorted ascending (ties broken by custkey, so the rank sum — and
    * therefore the result — is deterministic; G itself is
    * tie-order-invariant because equal x contribute a constant to
    * either ordering).
    *
    * Aggregates orders to per-customer totals FIRST (the big shuffle,
    * keyed on custkey), joins the small customer dim for the nation
    * key, and only then ranks — inside per-nation window partitions,
    * never a global sort. #customers/#nations rows per partition is
    * flat at any corpus scale.
    */
  def giniByNation(orders: DataFrame, customer: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spend = orders.groupBy("o_custkey")
      .agg(sum("o_totalprice").as("spend"))
    val byNation = spend.join(
      customer.select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
      "o_custkey")
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("spend").asc, col("o_custkey").asc)
    byNation.withColumn("rk", row_number().over(w))
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum("spend"), 2).as("total_spend"),
        round(
          lit(2.0) * sum(col("rk") * col("spend")) / (count(lit(1)) * sum("spend"))
            - (count(lit(1)) + lit(1.0)) / count(lit(1)),
          4).as("gini"))
      .orderBy("c_nationkey")
  }

  /** Shannon entropy (nats) of the event-type mix, per day: a one-
    * number drift monitor for an ingest feed — a collapsing mix
    * (entropy → 0) or a novel flood (entropy jump) shows up before
    * any per-type dashboard does. H = −Σ p·ln p over the per-day
    * type distribution, with the per-(day,type) counts computed
    * exactly.
    *
    * Two partial-aggregated groupBys (day×type, then day) and a
    * broadcast of nothing — the day totals ride along via a window
    * over the tiny aggregated frame. #days × #types rows after the
    * first aggregate: driver-safe at any corpus scale.
    */
  def eventTypeEntropy(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = events
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("c"))
    val withTotal = counts.withColumn("total",
      sum("c").over(Window.partitionBy("day")))
    withTotal.groupBy("day")
      .agg(
        sum("c").as("n_events"),
        count(lit(1)).as("n_types"),
        round(-sum((col("c") / col("total")) * log(col("c") / col("total"))), 4)
          .as("entropy_nats"))
      .orderBy("day")
  }

  /** Zipf rank-frequency slope of the token distribution: OLS fit of
    * ln(freq) on ln(rank) over the top-k tokens. Natural-language
    * corpora sit near slope −1; machine-generated or template spam
    * flattens the head — a one-row corpus-health check.
    *
    * One explode → partial-aggregated term count (the only big
    * shuffle, keyed on the term), then TakeOrderedAndProject caps the
    * frame to k rows BEFORE the rank window — the window and the
    * regression run on a constant-size frame, so corpus size only
    * affects the aggregate. Ties in frequency rank by token text on
    * both engines, making rank — and the fit — deterministic.
    */
  def zipfSlope(docs: DataFrame, topK: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freqs = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(topK)
    val ranked = freqs.withColumn("rk",
      row_number().over(Window.orderBy(col("freq").desc, col("term").asc)))
    ranked
      .select(log(col("rk").cast("double")).as("lx"),
        log(col("freq").cast("double")).as("ly"))
      .agg(
        count(lit(1)).as("n_terms"),
        round(expr("regr_slope(ly, lx)"), 4).as("zipf_slope"),
        round(expr("regr_intercept(ly, lx)"), 4).as("zipf_intercept"),
        round(expr("regr_r2(ly, lx)"), 4).as("r2"))
  }

  /** Population Stability Index of each source's document-length
    * distribution against the whole corpus: PSI = Σ (q−p)·ln(q/p)
    * over fixed-width length bins (p = corpus share, q = source
    * share, both floored at ε so empty bins contribute finitely).
    * The standard drift monitor between a reference distribution and
    * an incoming feed: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * act. Reported with the mean-length shift for direction.
    *
    * Two partial-aggregated groupBys over a 2-column scan; after
    * aggregation everything is (#sources × #bins) rows — the bin
    * frames are cross-joined (both tiny, broadcast) and left-joined
    * so a source's EMPTY bins still contribute their (0−p)·ln(ε/p)
    * term. Corpus size touches only the first aggregate.
    */
  def psiDrift(docs: DataFrame, binWidth: Int = 50, maxBin: Int = 12,
               eps: Double = 1e-6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = docs.select(col("source"),
      // integer div, not double-divide (the q132 cast-truncation trap)
      least(expr(s"n_chars div $binWidth"), lit(maxBin.toLong)).as("bin"),
      col("n_chars"))
    val corpus = binned.groupBy("bin").agg(count(lit(1)).as("cp"))
      // unpartitioned window over the ≤ maxBin+1-row aggregated frame
      .withColumn("p", col("cp") / sum("cp").over(Window.partitionBy()))
    val srcTotals = binned.groupBy("source").agg(
      count(lit(1)).as("n_docs"), avg("n_chars").as("mean_len"))
    val srcBins = binned.groupBy("source", "bin").agg(count(lit(1)).as("cq"))
    val corpusMean = docs.agg(avg("n_chars").as("corpus_mean"))
    val grid = srcTotals.crossJoin(broadcast(corpus)) // #sources × #bins
      .join(srcBins, Seq("source", "bin"), "left")
      .withColumn("q", coalesce(col("cq"), lit(0L)) / col("n_docs"))
    grid
      .withColumn("pf", greatest(col("p"), lit(eps)))
      .withColumn("qf", greatest(col("q"), lit(eps)))
      .groupBy("source", "n_docs", "mean_len")
      .agg(round(sum((col("qf") - col("pf")) * log(col("qf") / col("pf"))), 4)
        .as("psi"))
      .crossJoin(broadcast(corpusMean))
      .select(col("source"), col("n_docs"), round(col("mean_len"), 4).as("mean_len"),
        round(col("mean_len") - col("corpus_mean"), 4).as("mean_shift"),
        col("psi"))
      .orderBy("source")
  }

  /** Per-type distribution moments — mean, variance, skewness, excess
    * kurtosis — via MERGEABLE anchored power sums, the one-combiner
    * shape that survives any partitioning: each partition emits
    * (n, Σd, Σd², Σd³, Σd⁴) and combiners just add.
    *
    * Exactness by construction (the q145 integer discipline, extended
    * to fourth powers): values quantize to integer cents; pass 1 takes
    * the exact per-type count and cent sum (decimal — never wraps) and
    * derives an integer anchor (the truncated mean). Pass 2 sums
    * powers of the SHIFTED residual d = c − anchor, each power exact
    * in decimal(38,0). Shifting does the numerical work: central
    * moments are shift-invariant, and with |mean(d)| < 1 cent the
    * naive-sum cancellation (E[x⁴] − …, catastrophic for raw
    * moments) never materializes. The handful of closing double ops
    * run on bit-identical inputs with identical association, so both
    * engines land the same doubles; rounding is floor(x·1e4+½)
    * (moneyRound convention), and skew uses m2·√m2, not pow(x,1.5)
    * (√ is IEEE-exact; pow is not).
    *
    * Two narrow scans + one 5-row broadcast back; no window, no sort
    * — the same plan at 100 TB, and the sums double as the sufficient
    * statistics an incremental/streaming refresh would merge.
    */
  def powerMoments(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val cents = ev.select(col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("c"))
    val anchors = cents.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c").cast("decimal(38,0)")).as("s1c"))
      .withColumn("anchor", expr("CAST(s1c div n AS BIGINT)"))
    cents.join(broadcast(anchors), "event_type")
      .withColumn("d", col("c") - col("anchor"))
      .withColumn("d2", col("d") * col("d"))
      .groupBy("event_type", "n", "s1c")
      .agg(
        sum(col("d").cast("decimal(38,0)")).as("S1"),
        sum(col("d2").cast("decimal(38,0)")).as("S2"),
        sum(col("d2").cast("decimal(38,0)") * col("d")).as("S3"),
        sum(col("d2").cast("decimal(38,0)") * col("d2")).as("S4"))
      .selectExpr("event_type", "n",
        "CAST(s1c AS DOUBLE) AS t1",
        "CAST(n AS DOUBLE) AS nd",
        "CAST(S1 AS DOUBLE) AS x1", "CAST(S2 AS DOUBLE) AS x2",
        "CAST(S3 AS DOUBLE) AS x3", "CAST(S4 AS DOUBLE) AS x4")
      // formula text kept IDENTICAL to the DuckDB oracle — same
      // association, same literals, so the IEEE ops replay exactly
      .selectExpr("event_type", "n",
        "t1 / nd / 100.0 AS mean",
        "(nd * x2 - x1 * x1) / (nd * nd) / 10000.0 AS var_",
        "(nd * nd * x3 - 3 * nd * x1 * x2 + 2 * x1 * x1 * x1) / (nd * nd * nd) AS m3",
        "(nd * nd * nd * x4 - 4 * nd * nd * x1 * x3 + 6 * nd * x1 * x1 * x2 - 3 * x1 * x1 * x1 * x1) / (nd * nd * nd * nd) AS m4",
        "(nd * x2 - x1 * x1) / (nd * nd) AS m2")
      .selectExpr("event_type", "n",
        "floor(mean * 10000 + 0.5) / 10000 AS mean",
        "floor(var_ * 10000 + 0.5) / 10000 AS variance",
        "floor(m3 / (m2 * sqrt(m2)) * 10000 + 0.5) / 10000 AS skewness",
        "floor((m4 / (m2 * m2) - 3) * 10000 + 0.5) / 10000 AS ex_kurtosis")
      .orderBy("event_type")
  }

  /** Theil–Sen robust trend per event type: the MEDIAN of all pairwise
    * slopes between hourly event counts — the estimator that shrugs
    * off the outlier hours an OLS fit (q117) chases. Slope units:
    * events/hour per hour.
    *
    * Exactness: hourly counts and hour indices are exact integers;
    * each slope is ONE IEEE division of exact ints, so both engines
    * materialize bit-identical slope multisets; the median of an even
    * count is the average of the two middles in Spark's `median` and
    * DuckDB's `median` alike (one add + one halving on identical
    * doubles), and ties need no ordering contract. round(4) closes.
    *
    * Scale: the ONLY corpus-scale pass is the (type, hour) count — a
    * map-side-combined partial aggregate. The pairwise self-join runs
    * on the CALENDAR-bounded grid (#types × #hours rows; 720 hours ⇒
    * ≤ 259k pairs per type), so its cost is fixed by the time span,
    * not the event volume — the property that makes exact Theil–Sen
    * (normally O(n²)) shippable at 100 TB. The grid frame is
    * broadcast to the self-join; no corpus-scale shuffle follows the
    * first aggregate.
    */
  def theilSenTrend(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val hourly = ev.groupBy(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
          .cast("bigint").as("h"))
      .agg(count(lit(1)).as("cnt"))
    val a = hourly.select(col("event_type"), col("h").as("h1"), col("cnt").as("c1"))
    val b = hourly.select(col("event_type"), col("h").as("h2"), col("cnt").as("c2"))
    a.join(broadcast(b), Seq("event_type"))
      .filter(col("h1") < col("h2"))
      .select(col("event_type"),
        ((col("c2") - col("c1")).cast("double") /
          (col("h2") - col("h1")).cast("double")).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        round(median(col("slope")), 4).as("ts_slope"))
      .orderBy("event_type")
  }

  /** CUPED-adjusted A/B lift — the variance-reduction standard for
    * online experimentation (Deng et al., WSDM'13), deterministic end
    * to end: users split by `user_id % 2` (the hash-bucket assignment
    * an experimentation platform uses), the first `preDays` days are
    * the pre-period covariate window, and the adjusted metric
    * y* = y − θ(x − x̄) removes the pre-period component of the
    * variance (fraction ρ² — reported as `var_reduction`). Because
    * the adjustment is linear, group means of y* need only GROUP SUMS:
    * one pass to per-user (pre-mean, post-mean) pairs, one 1-row
    * aggregate with conditional sums — no per-user second pass.
    *
    * Exactness: per-user period means are cent-quantized BIGINTs
    * (one division + floor each); θ's sufficient statistics are
    * BIGINT sums, exact in any order; every closing formula is a
    * double expression with identical text in DuckDB. Users lacking
    * either period are excluded (CUPED is undefined without the
    * covariate) — identically on both engines.
    *
    * Scale: groupBy user (the one data-sized shuffle, carrying two
    * quantized longs), then a single-row conditional aggregate.
    */
  def cupedAdjustedLift(ev: DataFrame, preDays: Int = 15): DataFrame = {
    val days = ev.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L).cast("bigint").as("d"),
      floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
    val split = days.agg(min("d").as("d0"))
    val per = days.crossJoin(broadcast(split))
      .withColumn("pre", col("d") < col("d0") + preDays)
      .groupBy("user_id")
      .agg(sum(when(col("pre"), col("cents"))).as("sxc"),
        count(when(col("pre"), lit(1))).as("nx"),
        sum(when(!col("pre"), col("cents"))).as("syc"),
        count(when(!col("pre"), lit(1))).as("ny"))
      .filter(col("nx") > 0 && col("ny") > 0)
      .selectExpr("user_id",
        "CAST(floor(CAST(sxc AS DOUBLE) / CAST(nx AS DOUBLE) + 0.5) AS BIGINT) AS xq",
        "CAST(floor(CAST(syc AS DOUBLE) / CAST(ny AS DOUBLE) + 0.5) AS BIGINT) AS yq",
        "CAST(user_id % 2 AS INT) AS grp")
    per.agg(
        count(lit(1)).as("n"),
        sum("xq").as("sx"), sum("yq").as("sy"),
        sum(col("xq") * col("xq")).as("sxx"),
        sum(col("yq") * col("yq")).as("syy"),
        sum(col("xq") * col("yq")).as("sxy"),
        count(when(col("grp") === 0, lit(1))).as("n_a"),
        sum(when(col("grp") === 0, col("xq"))).as("sxa"),
        sum(when(col("grp") === 0, col("yq"))).as("sya"),
        count(when(col("grp") === 1, lit(1))).as("n_b"),
        sum(when(col("grp") === 1, col("xq"))).as("sxb"),
        sum(when(col("grp") === 1, col("yq"))).as("syb"))
      .selectExpr("n", "n_a", "n_b",
        "n * sxy - sx * sy AS cov", "n * sxx - sx * sx AS vxx",
        "n * syy - sy * sy AS vyy",
        "sx", "sxa", "sya", "sxb", "syb")
      // vxx = 0 (constant pre-period covariate across all users) makes
      // θ undefined: NULL, not Infinity/NaN — mirroring dailyOlsTrend's
      // guard of the identical degenerate case (vyy = 0 likewise for
      // var_reduction)
      .selectExpr("n_a", "n_b",
        "CASE WHEN vxx = 0 THEN NULL ELSE floor(CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS theta",
        "floor((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)) / 1e2 * 1e4 + 0.5) / 1e4 AS lift_raw",
        "CASE WHEN vxx = 0 THEN NULL ELSE floor(((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)) " +
          "- CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * " +
          "(CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE))) / 1e2 * 1e4 + 0.5) / 1e4 END AS lift_cuped",
        "CASE WHEN vxx = 0 OR vyy = 0 THEN NULL ELSE floor(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE) / (CAST(vxx AS DOUBLE) * CAST(vyy AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS var_reduction")
  }

  /** Per-type ordinary-least-squares trend of the DAILY MEAN event
    * value — the parametric complement to [[theilSenTrend]] (which is
    * robust but reports only a median slope): slope, intercept, and
    * r² per event_type, the "is this metric actually drifting and how
    * well does a line explain it" report a pipeline runs before
    * alerting on [[cusumChangepoint]]-style level shifts.
    *
    * Exactness (the engine-parity discipline): per-day value sums are
    * cent-quantized BIGINTs (order-free), the daily mean is ONE
    * double division then re-quantized to 1e-4 units, and all five
    * OLS sufficient statistics (Σx, Σy, Σx², Σy², Σxy) are BIGINT
    * sums over (day-index, quantized-mean) — exact integers in any
    * summation order, with x re-based per type (x = d − min d) so the
    * products stay far from int64 range. Only the three closing
    * formulas run in doubles, with identical formula text in DuckDB.
    *
    * Scale: one map-side-combinable groupBy to the #types×#days daily
    * frame (bounded: 100 TB of events still yields #types×#days
    * rows), a window over that bounded frame, and a #types-row
    * reduce. Nothing downstream of the first aggregate sees data
    * volume.
    */
  def dailyOlsTrend(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(col("event_type"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("bigint").as("d"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("bigint")).as("s_cents"),
        count(lit(1)).as("n_ev"))
      .selectExpr("event_type", "d",
        "CAST(floor(CAST(s_cents AS DOUBLE) / CAST(n_ev AS DOUBLE) * 100 + 0.5) AS BIGINT) AS yq")
    // x rebase: the window is over the BOUNDED daily frame
    // (#types×#days rows), never the raw events
    val based = daily.withColumn("x",
      col("d") - min("d").over(Window.partitionBy("event_type")))
    based.groupBy("event_type").agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("yq") * col("yq")).as("syy"),
        sum(col("x") * col("yq")).as("sxy"))
      .selectExpr("event_type", "n_days",
        "n_days * sxy - sx * sy AS cov",
        "n_days * sxx - sx * sx AS vxx",
        "n_days * syy - sy * sy AS vyy",
        "sx", "sy")
      .selectExpr("event_type", "n_days",
        "CASE WHEN vxx = 0 THEN NULL ELSE " +
          "floor(CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 END AS slope",
        "CASE WHEN vxx = 0 THEN NULL ELSE " +
          "floor((CAST(sy AS DOUBLE) - CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * CAST(sx AS DOUBLE)) " +
          "/ CAST(n_days AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 END AS intercept",
        "CASE WHEN vxx = 0 OR vyy = 0 THEN NULL ELSE " +
          "floor(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE) / (CAST(vxx AS DOUBLE) * CAST(vyy AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS r2")
      .orderBy("event_type")
  }

  /** Hill tail-index estimate over the document-length distribution —
    * the quantitative answer to "HOW heavy is the tail" that the Zipf
    * slope (q128) gives for term frequencies and PSI (q136) cannot
    * give at all: α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the k largest
    * lengths. α below ~2 means the length distribution has infinite
    * variance — the number that decides whether mean-based shard
    * sizing (q66) is safe or a q112-style winsorize must run first.
    *
    * Tie-proofing: the reference value x₍ₖ₊₁₎ is the MINIMUM of the
    * top-(k+1) VALUE multiset, and the sum runs over all k+1 rows —
    * the reference row contributes ln(1) = 0, so which of several
    * tied rows "is" the reference cannot matter. Determinism: each
    * ln term is quantized to an integer number of nano-units before
    * the sum (Σ of BIGINTs — order-free), leaving one closing
    * division with identical formula text in both engines.
    *
    * Scale: the only corpus-wide step is TakeOrdered(k+1) on a
    * single projected column; everything after runs on k+1 rows with
    * the 1-row reference broadcast back. Output is one row.
    */
  /** Two-sample permutation test on event values (purchase vs click
    * mean difference) with DETERMINISTIC permutations — the md5 trick
    * applied to Monte-Carlo inference: permutation b assigns group A
    * to the n_a rows with the smallest md5(b:event_id), which is a
    * uniform random relabeling to the statistic but a pure function
    * of the data, so the whole test — every permuted statistic and
    * the p-value itself — is hash-checkable in DuckDB, where a
    * seeded-RNG test could only ever be rows-only. The exceedance
    * comparison |T_b| ≥ |T_obs| is EXACT integer arithmetic: with
    * cent-quantized sums, T = s_a/n_a − s_b/n_b compares as
    * |s_a·n_b − s_b·n_a| over the common denominator — no float
    * enters until the presentation columns.
    *
    * p = (#extreme + 1)/(B + 1), the standard add-one permutation
    * p-value (Phipson–Smyth), so p can never be 0.
    *
    * Scale: the B-way explode is the cost knob — B·n narrow
    * (int, long, long) rows, one rank window per permutation
    * partition, everything else #B-row frames; at corpus scale run
    * it on a sample (the statistic converges at thousands of rows —
    * the 100 TB answer is subsample-then-test, not test-everything).
    */
  def permutationTest(ev: DataFrame, typeA: String = "purchase",
                      typeB: String = "click", b: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = ev.filter(col("event_type").isin(typeA, typeB))
      .select(col("event_id"),
        (col("event_type") === typeA).cast("int").as("is_a"),
        round(col("value") * 100).cast("long").as("cents"))
    val counts = rows.agg(
      sum(col("is_a").cast("long")).as("n_a"),
      sum(lit(1L) - col("is_a")).as("n_b"),
      sum(col("cents") * col("is_a")).as("s_a_obs"),
      sum(col("cents") * (lit(1) - col("is_a"))).as("s_b_obs"),
      sum(col("cents")).as("s_tot"))
    val perms = rows.crossJoin(broadcast(counts))
      .withColumn("b", explode(sequence(lit(1), lit(b))))
      .withColumn("h", md5(concat(col("b"), lit(":"), col("event_id"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("b").orderBy("h", "event_id")))
      .withColumn("sel", (col("rk") <= col("n_a")).cast("long"))
      .groupBy("b").agg(
        sum(col("cents") * col("sel")).as("s_a"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("s_tot")).as("s_tot"),
        max(col("s_a_obs")).as("s_a_obs"), max(col("s_b_obs")).as("s_b_obs"))
      // |T| ≥ |T_obs| over the shared denominator n_a·n_b — exact ints
      .withColumn("num_b",
        abs(col("s_a") * col("n_b") - (col("s_tot") - col("s_a")) * col("n_a")))
      .withColumn("num_obs",
        abs(col("s_a_obs") * col("n_b") - col("s_b_obs") * col("n_a")))
      .withColumn("extreme", (col("num_b") >= col("num_obs")).cast("long"))
    perms.groupBy("n_a", "n_b", "s_a_obs", "s_b_obs").agg(
        sum("extreme").as("n_extreme"))
      .select(col("n_a"), col("n_b"),
        round((col("s_a_obs").cast("double") / (col("n_a") * 100L)) -
          (col("s_b_obs").cast("double") / (col("n_b") * 100L)), 4)
          .as("t_obs"),
        col("n_extreme"),
        round((col("n_extreme") + 1L).cast("double") / (b + 1), 4)
          .as("p_value"))
  }

  def hillTailIndex(docs: DataFrame, k: Int = 100): DataFrame = {
    val top = docs.select(col("n_chars")).orderBy(col("n_chars").desc)
      .limit(k + 1)
    val ref = top.agg(min(col("n_chars")).as("x_ref"))
    top.crossJoin(broadcast(ref))
      .select(col("x_ref"),
        round(log(col("n_chars").cast("double") / col("x_ref")) * 1e9)
          .cast("long").as("tq"))
      .groupBy("x_ref")
      .agg(sum(col("tq")).as("sum_ln_e9"))
      .select(lit(k).as("k"), col("x_ref"), col("sum_ln_e9"),
        when(col("sum_ln_e9") === 0, lit(null).cast("double"))
          .otherwise(round(lit(k.toDouble) * lit(1.0e9) / col("sum_ln_e9"), 4))
          .as("alpha"))
  }

  /** Kaplan–Meier time-to-conversion curve with right-censoring: per
    * user, birth = first event, the event of interest = first
    * `purchase`, duration in whole days; users who never convert are
    * censored at the global observation end. S(t) = Π_{tᵢ ≤ t}
    * (1 − dᵢ/nᵢ) over event days tᵢ, with the risk set nᵢ counting
    * both future converters and future-censored users — the estimator
    * product teams reach for the moment "average days to convert"
    * is biased by the users who haven't converted YET.
    *
    * Scale: subjects collapse to one (duration, converted) row per
    * user in a single groupBy; the curve is then #distinct-day rows
    * — the cumulative windows (exits before t, running Σln factor)
    * order by day inside that tiny frame, so no window ever sees the
    * raw events. Engine parity: dᵢ/nᵢ is one IEEE divide of exact
    * BIGINTs; the running Σ ln(1 − dᵢ/nᵢ) accumulates in the same
    * day order in both engines (identical op sequence, the q138 ln
    * discipline), and the closing exp quantizes via floor(·1e4+0.5).
    */
  /** Poisson bootstrap confidence interval for the mean purchase
    * value — THE distributed bootstrap: classic resampling needs n
    * draws-with-replacement per replicate (a shuffle per replicate);
    * the Poisson approximation gives every (row, replicate) an
    * independent Poisson(1) weight, so all `b` replicates ride ONE
    * pass over the data and aggregate map-side. Deterministic end to
    * end: the uniform is md5(event_id:replicate)'s top-60-bits / 2⁶⁰
    * (exact parity on both engines) inverted through the Poisson(1)
    * CDF as literal-double thresholds (e-notation so neither engine
    * parses DECIMAL), weights cap at 8 (≈1.1e-6 tail mass, same cap
    * both sides).
    *
    * Exactness: per-replicate Σw·cents and Σw are BIGINT-exact in
    * any order; each replicate mean is one IEEE divide. `b` = 41
    * replicates make the 2.5/97.5 percentile indexes exact integers
    * (0.025·40 = 1), so the CI bounds are order statistics — no
    * interpolation formula to diverge between engines.
    */
  def poissonBootstrap(ev: DataFrame, b: Int = 41): DataFrame = {
    require(b == 41, "the exact-index percentile argument needs b = 41")
    val rows = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val point = rows.agg(count(lit(1)).as("n"), sum("cents").as("cs"))
    val reps = rows
      .select(col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(b - 1))).as("r"))
      .withColumn("u",
        conv(substring(md5(concat_ws(":", col("event_id"), col("r"))), 1, 15), 16, 10)
          .cast("long") / lit(1152921504606846976.0))
      .selectExpr("r", "cents",
        "CASE WHEN u < 3.6787944117144233e-1 THEN 0 " +
          "WHEN u < 7.357588823428847e-1 THEN 1 " +
          "WHEN u < 9.196986029286058e-1 THEN 2 " +
          "WHEN u < 9.810118431238463e-1 THEN 3 " +
          "WHEN u < 9.963401531726563e-1 THEN 4 " +
          "WHEN u < 9.994058151824183e-1 THEN 5 " +
          "WHEN u < 9.99916758850712e-1 THEN 6 " +
          "WHEN u < 9.999897508033253e-1 THEN 7 ELSE 8 END AS w")
      .groupBy("r")
      .agg(sum(expr("w * cents")).cast("bigint").as("cw"),
        sum("w").cast("bigint").as("wsum"))
      .selectExpr("CAST(cw AS DOUBLE) / wsum AS mean_cents")
    reps.agg(percentile(col("mean_cents"), lit(0.025)).as("pl"),
        percentile(col("mean_cents"), lit(0.975)).as("ph"))
      .crossJoin(broadcast(point))
      .selectExpr("n",
        "floor(CAST(cs AS DOUBLE) / n / 1e2 * 1e4 + 0.5) / 1e4 AS mean_value",
        "floor(pl / 1e2 * 1e4 + 0.5) / 1e4 AS boot_lo",
        "floor(ph / 1e2 * 1e4 + 0.5) / 1e4 AS boot_hi")
  }

  /** Difference-in-differences estimator — the quasi-experimental
    * workhorse when there's no randomized control: with deterministic
    * arms (user_id % 2, the q205 assignment) and the span's midpoint
    * as the "intervention", DiD = (T̄post − T̄pre) − (C̄post − C̄pre)
    * cancels both the arms' level difference and the common time
    * trend. Emitted with all four cell means and counts so the
    * parallel-trends eyeball check has its inputs.
    *
    * Scale: ONE conditional aggregate over the cents-quantized
    * event frame — four BIGINT sums + four counts, a 1-row result;
    * the span midpoint rides a broadcast 1-row frame. Every mean is
    * one IEEE divide of exact integers; the closing formula text is
    * shared with the oracle.
    */
  def didEstimate(ev: DataFrame): DataFrame = {
    val days = ev.select(col("user_id"),
      (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
        .cast("bigint").as("d"),
      floor(col("value") * 100 + 0.5).cast("bigint").as("cents"))
    val span = days.agg(min("d").as("d0"), max("d").as("d1"))
    days.crossJoin(broadcast(span))
      .selectExpr("CAST(user_id % 2 AS INT) AS arm",
        "CASE WHEN d < (d0 + d1 + 1) div 2 THEN 0 ELSE 1 END AS post", "cents")
      .agg(
        sum(when(col("arm") === 1 && col("post") === 1, col("cents"))).as("s_t1"),
        count(when(col("arm") === 1 && col("post") === 1, lit(1))).as("n_t1"),
        sum(when(col("arm") === 1 && col("post") === 0, col("cents"))).as("s_t0"),
        count(when(col("arm") === 1 && col("post") === 0, lit(1))).as("n_t0"),
        sum(when(col("arm") === 0 && col("post") === 1, col("cents"))).as("s_c1"),
        count(when(col("arm") === 0 && col("post") === 1, lit(1))).as("n_c1"),
        sum(when(col("arm") === 0 && col("post") === 0, col("cents"))).as("s_c0"),
        count(when(col("arm") === 0 && col("post") === 0, lit(1))).as("n_c0"))
      .selectExpr("n_t0", "n_t1", "n_c0", "n_c1",
        "floor(CAST(s_t0 AS DOUBLE) / n_t0 / 1e2 * 1e4 + 0.5) / 1e4 AS t_pre",
        "floor(CAST(s_t1 AS DOUBLE) / n_t1 / 1e2 * 1e4 + 0.5) / 1e4 AS t_post",
        "floor(CAST(s_c0 AS DOUBLE) / n_c0 / 1e2 * 1e4 + 0.5) / 1e4 AS c_pre",
        "floor(CAST(s_c1 AS DOUBLE) / n_c1 / 1e2 * 1e4 + 0.5) / 1e4 AS c_post",
        "floor(((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) - " +
          "(CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0)) / 1e2 * 1e4 + 0.5) / 1e4 AS did")
  }

  def kmConversion(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val secs = ev.select(col("user_id"),
      unix_timestamp(col("ts")).as("sec"), col("event_type"))
    val horizon = secs.agg(max("sec").as("end_sec"))
    val subjects = secs.groupBy("user_id")
      .agg(min("sec").as("birth"),
        min(when(col("event_type") === "purchase", col("sec"))).as("conv"))
      .crossJoin(broadcast(horizon))
      .selectExpr("user_id",
        "CASE WHEN conv IS NULL THEN 0 ELSE 1 END AS converted",
        "CAST(floor(CAST(coalesce(conv, end_sec) - birth AS DOUBLE) / 86400.0) AS BIGINT) AS dur")
    val total = subjects.agg(count(lit(1)).as("n_total"))
    val byDay = subjects.groupBy("dur")
      .agg(sum(when(col("converted") === 1, 1).otherwise(0)).cast("bigint").as("d"),
        sum(when(col("converted") === 0, 1).otherwise(0)).cast("bigint").as("c"))
      .crossJoin(broadcast(total))
    val wPrev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    byDay
      .withColumn("n_risk", col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("lnf",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk"))).otherwise(lit(0.0)))
      .withColumn("cum", sum("lnf").over(wRun))
      .filter(col("d") > 0)
      // d = n_risk empties the risk set (only possible on the final
      // event day): S drops to exactly 0 — the factor is excluded
      // from the ln sum so neither engine evaluates ln(0)
      .selectExpr("dur AS t_day", "n_risk", "d AS n_events", "c AS n_censored",
        "CASE WHEN d = n_risk THEN 0.0 " +
          "ELSE floor(exp(cum) * 1e4 + 0.5) / 1e4 END AS survival")
      .orderBy("t_day")
  }

  /** q241: Mann–Whitney U rank-sum test on two event types' value
    * distributions — the nonparametric "did the distribution shift"
    * companion to the binned KS test (q117's grid discipline): KS
    * reports the worst CDF gap, U reports stochastic dominance
    * P(A > B), and heavy-tailed metric distributions (every revenue
    * column) violate the t-test both replace.
    *
    * Exactness: ranks never exist. Values bin to the q117 integer
    * grid; with per-bin counts (na, nb), midrank arithmetic collapses
    * to 2·U_A = Σ_bins na·(2·cumNb(<bin) + nb) — an exact BIGINT (the
    * ×2 absorbs the tie half-credit), as is the tie-correction term
    * Σ(t³ − t). The z-score's normal approximation is the ONLY float
    * step: one formula text over the exact integers, both engines
    * replaying it identically. At corpus scales where a single bin
    * exceeds ~2M rows, t³ nears BIGINT range — the grid (binWidth)
    * is the documented lever, exactly as in q117.
    *
    * Scale: one grouped count over the event scan, then a cumulative
    * window over the BIN GRID (aggregate-bounded — the q117 shape),
    * closing in a 1-row report. No global rank sort anywhere — the
    * textbook formulation's fatal flaw at 100 TB.
    */
  def mannWhitney(ev: DataFrame, typeA: String = "view",
                  typeB: String = "purchase",
                  binWidth: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = ev.filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(
        sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("nb"))
    val wPrev = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("cnb", coalesce(sum(col("nb")).over(wPrev), lit(0L)))
      .withColumn("u2term", col("na") * (lit(2L) * col("cnb") + col("nb")))
      .withColumn("t", col("na") + col("nb"))
      .agg(sum("na").cast("bigint").as("n_a"),
        sum("nb").cast("bigint").as("n_b"),
        count(lit(1)).as("n_bins"),
        sum("u2term").cast("bigint").as("u2_a"),
        sum(expr("t * t * t - t")).cast("bigint").as("tie3"))
      .selectExpr("n_a", "n_b", "n_bins", "u2_a",
        // P(A > B) + P(tie)/2 — the common-language effect size; one
        // divide over exact integers
        "floor(CAST(u2_a AS DOUBLE) / nullif(2.0 * n_a * n_b, 0.0) * 1e6 + 0.5) / 1e6 AS p_superiority",
        // tie-corrected normal approximation; identical formula text
        // in the oracle so the doubles replay bit-for-bit. Both
        // denominators nullif-guarded (the labelCentroidDrift
        // discipline): one empty side (n_a·n_b = 0) or a single
        // observation (n_a+n_b ≤ 1) yields NULL, never NaN.
        "round((CAST(u2_a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2) / " +
          "nullif(sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0 * " +
          "((n_a + n_b + 1) - CAST(tie3 AS DOUBLE) / " +
          "nullif(CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1), 0.0))), 0.0), 4) AS z")
  }
}
