package graft.engine

import org.apache.spark.sql.DataFrame

/** ORC sink — the columnar twin of [[ParquetSink]] for Hive-era
  * consumers: same partitioned-directory layout contract, same
  * downstream partition-pruning story ([[Tables.orc]] reads it back
  * with pushdown intact). Kept deliberately thin: compaction,
  * bucketing, and the training-shard layout live on the parquet path,
  * which is this engine's primary storage format; ORC exists for
  * interchange with warehouses that already speak it.
  */
object OrcSink {

  /** Parallel ORC parts, optionally partitioned by columns. */
  def writePartitioned(df: DataFrame, outDir: String,
                       partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(outDir)
  }
}
