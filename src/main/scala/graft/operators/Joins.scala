package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join layer (SURVEY.md §2.5). The reference has zero joins; these
  * exist for the driver's star-schema contract and are written in the
  * shape a 1000-executor cluster wants:
  *
  *  - fact⋈fact (lineitem⋈orders⋈customer) as equi-joins → Catalyst
  *    picks shuffled hash / sort-merge on the join key; AQE can
  *    convert to broadcast at runtime if a side turns out small.
  *  - dimension joins (nation 25 rows, region 5 rows) explicitly
  *    `broadcast()` so no shuffle of the fact side ever happens for
  *    them.
  *  - semi/anti as left_semi/left_anti (no payload duplication, early
  *    short-circuit per probe row).
  */
object Joins {

  /** J1 (inner, multi-way) + A2: revenue rollup by region/nation.
    * Per-row revenue is rounded to 2 decimals before the sum so the
    * group total is exactly reproducible (multiple of 0.01).
    */
  def revenueByNation(li: DataFrame, ord: DataFrame, cust: DataFrame,
                      nat: DataFrame, reg: DataFrame): DataFrame =
    // r18 (guide §2.3 "aggregate before you shuffle"): the per-nation
    // rollup only needs each order's item count and summed item
    // revenue, so the fact side is pre-aggregated by l_orderkey — the
    // map-side partial collapses ~4 lineitems/order BEFORE the join
    // exchange, and the orderkey join then moves one row per order
    // instead of one per item. Per-item money rounding (the oracle
    // contract) still happens before any sum; the final round(2)
    // absorbs double-summation order as it always did. At 100 TB this
    // is the difference between shuffling the lineitem table and
    // shuffling one row per order.
    li.withColumn("rev", Projections.moneyRound(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("li_n"), sum("rev").as("li_rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum("li_n").cast("bigint").as("n_items"),
        round(sum("li_rev"), 2).as("revenue"))
      .orderBy("r_name", "n_name")

  /** J1 (left outer) + A2: per-customer order count/total including
    * customers with zero orders (count of the right key is null-aware).
    */
  def ordersPerCustomer(cust: DataFrame, ord: DataFrame): DataFrame =
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey", "c_name")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_spent"))
      .orderBy("c_custkey")

  /** J1 (left semi): customers having at least one finished order. */
  def customersWithFinishedOrders(cust: DataFrame, ord: DataFrame): DataFrame =
    cust.join(ord.filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J1 (left anti): customers with no pending ('P') orders. */
  def customersWithoutPendingOrders(cust: DataFrame, ord: DataFrame): DataFrame =
    cust.join(ord.filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** As-of join, composed from built-ins (tier (a) of the extension
    * ladder — no custom node needed): for each purchase event, the
    * same user's most recent click at or before the purchase
    * timestamp (click attribution — the canonical time-series as-of).
    *
    * Shape: tag both sides, union, ONE window over (user, time) with a
    * running last_value(click, ignoreNulls) carry-forward, keep the
    * purchase rows. Cost is a single hash-partition on user_id plus a
    * per-partition sort — the same exchange any per-user operator
    * needs — instead of the range-join's candidate explosion. Clicks
    * are pre-collapsed to one row per (user, ts) so ties are
    * deterministic on both engines (DuckDB oracle uses its native
    * ASOF JOIN against this plan).
    */
  def clickAttribution(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    // tag 0 sorts before tag 1 at equal ts ⇒ a click at exactly the
    // purchase instant is attributable (ASOF's ts >= semantics)
    val tagged = clicks
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        col("click_id"), lit(null).cast("long").as("purchase_id"))
      .unionByName(purchases
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("long").as("click_id"), col("purchase_id")))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("attr_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("attr_click_ts",
        last(when(col("click_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("attr_click_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("attr_click_id"), col("attr_click_ts"))
      .orderBy("purchase_id")
  }

  /** Range join via interval bucketization — the scale-right answer
    * to `fact.value BETWEEN interval.lo AND interval.hi` when the
    * interval table is too large to broadcast: Spark plans a raw
    * non-equi join as BroadcastNestedLoop (or worse, a cartesian),
    * which is O(facts × intervals). Instead each interval EXPLODES to
    * the fixed-width buckets it overlaps (fan-out =
    * width/bucketWidth + 1, a generator over the interval scan — no
    * shuffle), each fact maps to exactly ONE bucket, and the match is
    * an equi-join on bucket_id plus a residual BETWEEN filter. A
    * (fact, interval) pair can only meet in the fact's own bucket, so
    * no post-join dedup is needed. Work scales with facts × avg
    * overlapping intervals — the output's own size — not the cross
    * product.
    *
    * `intervals` must have (interval_id, lo, hi) columns; emits one
    * row per (fact row, covering interval) with half-open [lo, hi)
    * semantics.
    */
  def rangeBucketJoin(facts: DataFrame, intervals: DataFrame,
                      valueCol: String, bucketWidth: Double): DataFrame = {
    val bucketed = intervals.select(col("interval_id"), col("lo"), col("hi"),
        explode(sequence(
          floor(col("lo") / bucketWidth).cast("long"),
          floor(col("hi") / bucketWidth).cast("long"))).as("bucket_id"))
    facts
      .withColumn("bucket_id", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(bucketed, Seq("bucket_id"))
      .filter(col(valueCol) >= col("lo") && col(valueCol) < col("hi"))
      .drop("bucket_id")
  }

  /** Salted fact⋈fact equi-join — the skew-survival pattern for a
    * join key whose hottest value overwhelms one reducer (see
    * [[Aggregates.hotKeys]] for finding it, and
    * [[SetOps.saltedEventTypeCounts]] for the aggregation twin): the
    * probe side gets a deterministic md5-derived salt in [0, nSalts),
    * the build side replicates each row nSalts times (a generator —
    * build-side rows only, never the probe side), and the join runs
    * on (key, salt), spreading each hot key over nSalts reducers.
    * Results are EXACTLY the plain join's (spec + oracle-asserted);
    * cost is nSalts× the build side's shuffle bytes, which is why the
    * dimension-broadcast path stays the default and salting is the
    * escape hatch for fact⋈fact skew.
    *
    * The merge hints force a real shuffle join: without them, a
    * test-scale build side would auto-broadcast and the salt would be
    * decorative.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 saltBy: org.apache.spark.sql.Column,
                 nSalts: Int = 8): DataFrame = {
    // the salt derives from a row-unique probe expression, NOT the
    // join key: all copies of the hot key must land on DIFFERENT
    // salts or the salting is a no-op (md5 keeps it deterministic —
    // rerun-stable, engine-neutral)
    val salted = probe.withColumn("salt",
      (conv(substring(md5(saltBy.cast("string")), 1, 8), 16, 10) % nSalts)
        .cast("int"))
    val replicated = build.withColumn("salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.hint("merge")
      .join(replicated.hint("merge"),
        salted(probeKey) === replicated(buildKey) &&
          salted("salt") === replicated("salt"))
      .drop("salt")
  }

  /** Referential-integrity audit over the two fact→parent foreign-key
    * edges (orders.o_custkey → customer, lineitem.l_orderkey →
    * orders): orphan counts, null-FK counts, rates, and an integer
    * intact flag — the cross-table companion of q166's single-table
    * expectations, and the warehouse QA check that catches a
    * truncated parent load before a join silently drops fact rows.
    *
    * Each edge is ONE left join of the projected FK column against
    * the parent's PRIMARY KEY (unique by schema contract, so the join
    * cannot multiply rows) with null-probe counting — equivalent to
    * an anti-join count but also yielding total/null counts in the
    * same pass. Counts exact, rate one division round(6), flag an
    * integer comparison. The customer PK frame broadcasts (true
    * dimension); the orders PK side is left to the planner — at
    * 100 TB an orders key column is itself fact-sized, so that edge
    * is a narrow (8-byte key) shuffle join, which is the correct
    * plan, not a broadcast. Output is one row per FK edge.
    */
  def refIntegrityAudit(ord: DataFrame, cust: DataFrame,
                        li: DataFrame): DataFrame = {
    def edge(fact: DataFrame, fkCol: String, parent: DataFrame,
             pkCol: String, name: String, bcast: Boolean) = {
      val pk0 = parent.select(col(pkCol).as("pk"))
      fact.select(col(fkCol).as("fk"))
        .join(if (bcast) broadcast(pk0) else pk0,
          col("fk") === col("pk"), "left")
        .agg(
          count(lit(1)).as("n_rows"),
          sum((col("fk").isNotNull && col("pk").isNull).cast("long"))
            .as("n_orphans"),
          sum(col("fk").isNull.cast("long")).as("n_null_fk"))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
          col("n_null_fk"))
    }
    edge(ord, "o_custkey", cust, "c_custkey",
        "orders.o_custkey->customer", bcast = true)
      .unionByName(edge(li, "l_orderkey", ord, "o_orderkey",
        "lineitem.l_orderkey->orders", bcast = false))
      .selectExpr("fk_edge", "n_rows", "n_orphans", "n_null_fk",
        "round(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate",
        "CAST(n_orphans = 0 AND n_null_fk = 0 AS INT) AS intact")
      .orderBy("fk_edge")
  }
}
