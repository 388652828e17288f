package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Union / dedup / window / sort layer (SURVEY.md §2.7, §2.8),
  * re-expressing the reference's merge-ETL
  * (eda/merge_datasets.py:50-81: unionByName → dropDuplicates on a
  * column subset → row_number re-id over a full ordering).
  */
object SetOps {

  /** U1+U3+U4+W1+W2 composite. Three status slices are merged with
    * unionByName, one slice is re-appended with union (the notebook's
    * unionAll oversampling idiom, cell 2e3922dd59cc83d) to create real
    * duplicates, dropDuplicates removes them, and row_number assigns a
    * fresh contiguous id (merge_datasets.py:65-69).
    *
    * SCALE NOTE: the global (unpartitioned) row_number window is
    * single-task by construction — kept deliberately for reference
    * parity, and safe here because it runs on the deduped projection.
    * At 100 TB use [[distributedReid]] instead, which stays fully
    * parallel.
    */
  def unionDedupReid(orders: DataFrame): DataFrame = {
    val proj = orders.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val f = proj.filter(col("o_orderstatus") === "F")
    val o = proj.filter(col("o_orderstatus") === "O")
    val p = proj.filter(col("o_orderstatus") === "P")
    val merged = f.unionByName(o).unionByName(p).union(f)
    val deduped = merged.dropDuplicates(Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
    deduped
      .withColumn("new_id", row_number().over(Window.orderBy("o_orderkey")))
      .orderBy("new_id")
  }

  /** Scale-safe re-id: sort once, then compute a globally contiguous id
    * as (partition offset + intra-partition index) via zipWithIndex —
    * no single-task window, no second shuffle. Semantics match
    * row_number().over(Window.orderBy(sortCols)) when the ordering is
    * total.
    */
  def distributedReid(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField("new_id", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Partitioned-window top-N — the scale-correct shape for "N best per
    * key" (per-partition sort, no global single task). Ties broken by
    * the unique order key so results are deterministic.
    */
  def topNPerGroup(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      .orderBy("o_custkey", "rk")
  }

  /** W1+F8: global sort + limit (top-K). Spark runs this as
    * TakeOrderedAndProject — each partition keeps only K rows, then the
    * driver merges: no full global sort is materialized at any scale.
    */
  def topOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** INTERSECT (distinct semantics): customers that placed both an 'F'
    * and an 'O' order. Planned as a left-semi aggregate join — scales
    * like any equi-join.
    */
  def customersInBothStatuses(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")

  /** EXCEPT (distinct semantics): customers with an 'F' order but no
    * 'O' order — the set-op twin of the anti join.
    */
  def customersOnlyFinished(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")

  /** Two-stage salted aggregation — the skew-mitigation shape for
    * heavy-hitter group keys: stage 1 aggregates on (key, salt) so a
    * hot key spreads over `salts` reducers, stage 2 merges the partial
    * counts. Semantics identical to a direct groupBy (the oracle
    * checks exactly that); the salt here is deterministic
    * (event_id % salts) so results are reproducible — production code
    * can use any uniform salt.
    */
  def saltedEventTypeCounts(ev: DataFrame, salts: Int = 8): DataFrame =
    ev.withColumn("salt", (col("event_id") % salts).cast("int"))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("partial_n"), sum("value").as("partial_sum"))
      .groupBy("event_type")
      .agg(sum("partial_n").as("n"), round(sum("partial_sum"), 2).as("value_sum"))
      .orderBy("event_type")

  /** Relational set algebra over two sources' content-fingerprint
    * sets via `Dataset.intersect` / `Dataset.except` — the last of
    * the classic relational surfaces (U1–U4 cover union/distinct)
    * and the set-semantics view of cross-source duplication that
    * q102's count matrix reports per-pair. Emits the five cardinals:
    * |A|, |B|, |A∩B|, |A∖B|, |B∖A| — the inclusion–exclusion sanity
    * identity |A| = |A∩B| + |A∖B| is spec-asserted.
    *
    * intersect/except ARE set operators (distinct semantics built
    * in); each plans as a distinct-aggregate + hash join on the
    * 33-byte fingerprint — text never crosses a shuffle, and the
    * five counts are exact integers with nothing to round.
    */
  def setRelations(docs: DataFrame, srcA: String = "src0",
                   srcB: String = "src1"): DataFrame = {
    val a = docs.filter(col("source") === srcA)
      .select(md5(col("text")).as("fp")).distinct()
    val b = docs.filter(col("source") === srcB)
      .select(md5(col("text")).as("fp")).distinct()
    Seq(
      "a_distinct" -> a, "a_minus_b" -> a.except(b),
      "b_distinct" -> b, "b_minus_a" -> b.except(a),
      "intersect" -> a.intersect(b))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n"))
          .select(lit(name).as("relation"), col("n")) }
      .reduce(_.unionByName(_))
      .orderBy("relation")
  }
}
