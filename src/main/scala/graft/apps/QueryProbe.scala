package graft.apps

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Repeat-timing probe for any driver-contract query — the builder's
  * per-query hotspot loupe (the Q41Probe pattern, generalized):
  *   runMain graft.apps.QueryProbe <queryName> [sfDir] [reps]
  * Prints one PROBE line per rep; rep 1 carries JVM/codegen warm-up,
  * the later reps are the steady-state cost a bench segment sees.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_hourly_agg")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
