package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators. The engine already carries HLL
  * (q49 approx_count_distinct) and Bloom admission (q77); this adds
  * the Count-Min sketch — the classic mergeable frequency summary for
  * heavy-hitter tracking over unbounded key domains.
  *
  * The hashing is the repo's engine-neutral md5 convention, so unlike
  * most sketches the ENTIRE structure — every counter cell and every
  * estimate — is exactly reproducible in DuckDB and hash-checked, not
  * just "approximately right".
  */
object Sketches {

  /** CMS row `d`'s bucket for string key column `k`. */
  private def cmBucket(k: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cm$d:"), k)), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-Min heavy hitters over `keyCol`: build a depth×width
    * counter matrix, then report the top `topN` keys by TRUE count
    * alongside their CMS estimate and its overestimate — the sketch-
    * accuracy audit a pipeline runs before trusting CMS numbers at
    * full scale (where the exact groupBy is the thing being avoided;
    * here it doubles as ground truth).
    *
    * Build: each occurrence increments one counter per depth row —
    * expressed as a `depth`-way posexplode then a hash aggregate on
    * (depth, bucket). Spark's partial aggregation IS the per-partition
    * sketch accumulate, and the exchange merges counter matrices by
    * cell addition — exactly the CMS merge operator, shuffling only
    * depth·width counter cells regardless of input size. The estimate
    * is min over depth rows; collisions only ever inflate, so
    * overestimate ≥ 0 always (spec-pinned).
    */
  def countMinHeavyHitters(events: DataFrame, keyCol: String = "user_id",
                           depth: Int = 4, width: Int = 64,
                           topN: Int = 20): DataFrame = {
    val keys = events.select(col(keyCol).cast("string").as("k"))
    val counters = keys
      .select(posexplode(array((0 until depth).map(d =>
        cmBucket(col("k"), d, width)): _*)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("c"))
    val top = keys.groupBy("k").agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("k").asc).limit(topN)
    top
      .select(col("k"), col("true_count"),
        posexplode(array((0 until depth).map(d =>
          cmBucket(col("k"), d, width)): _*)).as(Seq("depth", "bucket")))
      // counter matrix is depth·width rows — always the broadcast side
      .join(broadcast(counters), Seq("depth", "bucket"))
      .groupBy("k", "true_count").agg(min("c").as("cms_count"))
      .withColumn("overestimate", col("cms_count") - col("true_count"))
      .orderBy(col("true_count").desc, col("k").asc)
  }
}
