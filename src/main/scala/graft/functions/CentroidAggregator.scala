package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass mean-vector aggregator (the custom-UDAF tier of the
  * extension ladder): accumulates per-dimension sums + a count, merges
  * associatively, emits the centroid. Unlike the posexplode+avg
  * formulation it never widens the data to one row per dimension —
  * at 100 TB of wide embeddings that's a 64× row-count difference in
  * the aggregation input.
  *
  * Register with `functions.udaf(CentroidAggregator)` or use on a
  * typed `KeyValueGroupedDataset`.
  */
object CentroidAggregator extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(acc: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sums, n) = acc
    if (v == null) acc
    else if (sums.isEmpty) (v.toArray, n + 1)
    else {
      var i = 0
      while (i < sums.length && i < v.length) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(acc: (Array[Double], Long)): Seq[Double] =
    if (acc._2 == 0L) Seq.empty
    else acc._1.toSeq.map(_ / acc._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
