package graft.apps

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for selected driver-contract queries,
  * one file per query — the per-change plan evidence backing
  * OPTIMIZATION_r18.md (plans/r18/<query>_{before,after}.txt):
  *   runMain graft.apps.QueryPlan <name[,name…]> <outDir> <suffix> [sfDir]
  * Names may be bare qNN prefixes (the QueryProbe convention).
  */
object QueryPlan {
  def main(args: Array[String]): Unit = {
    val sel = args(0).split(',').toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val names = SparkEntry.queries.keys.toSeq
      .filter(k => sel.exists(s => k == s || k.startsWith(s + "_") ||
        k.startsWith(s)))
      .sortBy(n => (n.drop(1).takeWhile(_.isDigit).toInt, n))
    require(names.nonEmpty, s"no queries match ${sel.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val qNum = name.takeWhile(_ != '_')
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${qNum}_$suffix.txt"),
        s"== $name ($suffix) ==\n" + plan)
      println(s"PLAN $name -> $outDir/${qNum}_$suffix.txt")
    }
    spark.stop()
  }
}
