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
    li.withColumn("rev", Projections.moneyRound(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_items"), round(sum("rev"), 2).as("revenue"))
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
}
