package graft.apps

import org.apache.spark.sql.SparkSession

import graft.engine.Tables
import graft.operators.Dedup

/** Stage timing for the connected-components bench entries (q68/q72):
  * splits the LSH verify cascade from the CC rounds and from q72's
  * canonicalization + anti-join, so optimization effort goes where
  * the time actually is.
  *   runMain graft.apps.CcProbe [sfDir]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val docs = Tables.documents(spark, sfDir)
    t("q68 dupClusters (all)") { Dedup.dupClusters(docs).count() }
    spark.catalog.clearCache()
    val pairs = t("  cascade: nearDupPairs") {
      val p = Dedup.nearDupPairs(docs).select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    t("  cc: fromPairs (cached)") { Dedup.dupClustersFromPairs(pairs).count() }
    pairs.unpersist(blocking = true)
    spark.catalog.clearCache()
    t("q72 clustered (all)") { Dedup.cleaningPipelineClustered(docs).count() }
    spark.stop()
  }
}
