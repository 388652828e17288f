package graft.apps

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Repeat-timing probe for any driver-contract queries — the builder's
  * per-query hotspot loupe (the Q41Probe pattern, generalized):
  *   runMain graft.apps.QueryProbe <name[,name…]> [sfDir] [reps]
  * Names are comma-separated and may be bare qNN prefixes. Prints one
  * PROBE line per rep per query; each query's rep 1 carries its
  * plan/codegen warm-up (the JVM warm-up lands entirely on the first
  * query probed), the later reps are the steady-state cost a bench
  * segment sees. Load average rides along so a stretched rep is
  * attributable on the spot.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sel = args.headOption.getOrElse("q01").split(',').toSeq
    val names = SparkEntry.queries.keys.toSeq
      .filter(k => sel.exists(s => k == s || k.startsWith(s + "_") ||
        k.startsWith(s)))
      .sortBy(n => (n.drop(1).takeWhile(_.isDigit).toInt, n))
    require(names.nonEmpty, s"no queries match ${sel.mkString(",")}")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    for (name <- names; i <- 1 to reps) {
      val c0 = graft.Bench.processCpuNanos
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = System.nanoTime() - t0
      // effective cores = process-CPU / wall over the measured span —
      // the single-thread-bound detector (a heavy query reading ~1.0
      // on a 32-core session is serialized, not slow)
      val cores = (graft.Bench.processCpuNanos - c0).toDouble / wall
      println(f"PROBE $name rep $i: ${wall / 1e9}%.2f s ($n rows, load $load%.1f, cores $cores%.1f)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
