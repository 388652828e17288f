package graft.apps

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Print each driver query's parquet-scan ReadSchema lines — the
  * column-pruning audit: a scan reading columns the query never uses
  * wastes IO proportionally at 100 TB.
  *   runMain graft.apps.ScanAudit [sfDir] [qPrefix...]
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.isEmpty || wanted.exists(n.startsWith))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val scans = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).map(_.trim).toSeq.distinct
      println(s"SCAN $name")
      scans.foreach(s => println(s"  $s"))
    }
    spark.stop()
  }
}
