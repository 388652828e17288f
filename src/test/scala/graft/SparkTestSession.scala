package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (tests fork a
  * single JVM — see build.sbt Test/fork).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** sf0.001 testdata (read-only fixture from the driver). */
  val sfDir = "/root/testdata/sf0.001"
}
