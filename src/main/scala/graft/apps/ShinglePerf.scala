package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.ShingleGenerator.shingles

/** A/B timing of the two shingle producers (composable split/
  * transform/explode vs the native Generator) under the cascade's
  * real downstream (distinct-shingle aggregate), alternating runs so
  * neither side owns the warm-up:
  *   runMain graft.apps.ShinglePerf [sfDir]
  */
object ShinglePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      assert(n > 0); dt
    }
    // the composable built-in pipeline the generator replaced — inlined
    // here (NOT Dedup.shingleDocs, which now runs the generator itself;
    // PipelineOpsSpec asserts this form's multiset-equivalence)
    def composed(): Long = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"))
        .as("shingle"))
      .groupBy("shingle").agg(count(lit(1))).count()
    def native(): Long = docs
      .select(col("doc_id"), shingles(col("text"), 3).as("shingle"))
      .groupBy("shingle").agg(count(lit(1))).count()
    composed(); native() // warm both paths
    val rounds = 5
    val (c, nv) = (Array.ofDim[Double](rounds), Array.ofDim[Double](rounds))
    for (i <- 0 until rounds) { c(i) = time(composed()); nv(i) = time(native()) }
    println(f"PERF composed  min=${c.min}%.3f  median=${c.sorted.apply(rounds / 2)}%.3f")
    println(f"PERF generator min=${nv.min}%.3f  median=${nv.sorted.apply(rounds / 2)}%.3f")
    spark.stop()
  }
}
