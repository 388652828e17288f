package graft

import org.apache.spark.sql.SparkSession

/** Builder-side quiet micro-bench: time a named subset of
  * [[SparkEntry.queries]] against one dataset dir, printing
  * `name,seconds,rows` lines — the tool for adjudicating a single
  * query's cost outside the full [[Bench]] run (load-spike
  * re-confirmation, before/after checks while iterating on one
  * operator). Same measurement discipline as Bench: each query's
  * result is fully consumed (`count` after the action the driver
  * takes), caches and leftover persisted RDDs dropped between
  * queries so no measurement inherits its predecessor's state.
  *
  * Usage: `runMain graft.TimeQueries <sfDir> <prefix,prefix,...> [reps]`
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val prefixes = args(1).split(",").toSet
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .sortBy { case (n, _) => (n.drop(1).takeWhile(_.isDigit).toInt, n) }
    for (r <- 1 to reps; (name, fn) <- picked) {
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMEQ $name%s rep$r%d ${sec}%.2f sec $rows%d rows")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
