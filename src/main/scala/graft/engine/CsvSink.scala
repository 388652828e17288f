package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** K1: single-file CSV export (reference: eda/merge_datasets.py:87-119
  * — coalesce(1) → write to a temp dir → move the part file out and
  * delete the dir).
  *
  * SCALE NOTE: coalesce(1) serializes the final write through one task
  * — correct for small report exports (the reference's use case), wrong
  * for bulk data. For large outputs use [[writePartitioned]] and let
  * downstream consumers read the directory.
  */
object CsvSink {

  /** Write df as exactly one headered CSV file at outFile (local fs). */
  def writeSingleFile(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".tmpdir"
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(throw new IllegalStateException(s"no part file produced in $tmp"))
    Files.move(part.toPath, Paths.get(outFile), StandardCopyOption.REPLACE_EXISTING)
    dir.listFiles().foreach(_.delete())
    dir.delete()
    ()
  }

  /** The scale path: parallel headered CSV parts, optionally
    * partitioned by columns for downstream partition pruning.
    */
  def writePartitioned(df: DataFrame, outDir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.option("header", "true").mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).csv(outDir)
  }
}
