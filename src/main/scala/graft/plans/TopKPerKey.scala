package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator extension (tier c of the ladder: custom LogicalPlan
  * + SparkStrategy + SparkPlan): per-key top-k WITHOUT a window sort.
  *
  * The composable form — `row_number().over(partitionBy(key).orderBy(o))`
  * then `filter(rk <= k)` — must fully SORT every key group
  * (O(n log n) per group) and materialize the rank just to discard
  * rows. This operator keeps a bounded k-element heap per key instead:
  * O(n log k) comparisons, O(#keys · k) memory, and no sort buffer.
  * Catalyst still plans the shuffle (requiredChildDistribution =
  * ClusteredDistribution(keys)), so AQE/exchange reuse apply as usual.
  *
  * Results are bit-identical to the window formulation when the
  * ordering is total (ties broken by a unique column) — asserted in
  * TopKPlanSpec.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] into [[TopKPerKeyExec]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Memory contract: the per-partition heap map holds O(#keys-in-
  * partition · k) UnsafeRow copies and does NOT spill. After the
  * ClusteredDistribution shuffle a partition sees ≈ #distinct-keys /
  * #partitions keys, so the resident set is (keys/partitions) · k ·
  * rowSize — for real top-k use (k ≤ ~100, bounded key domains) that
  * is a few MB per task even at 100 TB input. If #keys · k rows per
  * partition could rival partition input size, this operator buys
  * nothing over the sort-based window form — use that instead (the
  * bit-identical formulation in [[graft.operators.SetOps.topNPerGroup]]);
  * a size-triggered fallback would need spill hooks the exercise of
  * which the window operator already IS.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** One shuffle on the grouping keys — same exchange a window or
    * aggregation would need; the saving is downstream (heap vs sort).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      // "row a sorts before row b" ordering; the heap's head is the
      // WORST retained row (max by this ordering) and gets evicted
      val ordering = GenerateOrdering.generate(orderExprs, childOutput)
      val heaps = scala.collection.mutable.LinkedHashMap.empty[
        UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(rowProj(row).copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowProj(row).copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // ascending sort order per key
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level API + session wiring. */
object TopK {

  /** keep the first `k` rows per key group under `orderBy` (make the
    * ordering total — e.g. tie-break on a unique id — for
    * deterministic results).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    ColumnBridge.addStrategy(spark, TopKStrategy)
    val child = ColumnBridge.logicalPlan(df)
    val resolve = child.output.map(a => a.name -> a).toMap
    val keyExprs: Seq[Expression] = keyCols.map(c =>
      resolve.getOrElse(c, throw new IllegalArgumentException(s"unknown column $c")))
    val sortOrders: Seq[SortOrder] = orderBy.map { c =>
      ColumnBridge.expressionEager(c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    ColumnBridge.ofRows(spark, TopKPerKey(keyExprs, sortOrders, k, child))
  }
}
