package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** Parquet maintenance sinks — the write-side operations a 100 TB
  * corpus needs beyond plain `df.write.parquet`:
  *
  *  - small-file compaction (streaming ingest and fine-grained
  *    partitioning both produce file counts that grind NameNode/
  *    listing and scan planning to a halt; periodic rewrite to
  *    size-targeted files is standard table maintenance);
  *  - training-shard layout (documents written in [[TrainingData
  *    .sequencePack]] order, one file per shard, so a training job
  *    streams each shard sequentially with zero query-time work).
  */
object ParquetSink {

  /** Rewrite a parquet directory into ~`targetFileBytes` files:
    * output file count = ceil(total bytes / target), min 1. Returns
    * (input file count, output file count). One shuffle
    * (`repartition`) sized from the actual directory footprint — the
    * same rewrite runs identically over a 100 TB table, where
    * `targetFileBytes` ≈ the HDFS/object-store block size keeps scans
    * one-block-per-file.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    // in-place compaction would delete the input mid-scan (overwrite
    // drops the directory before the lazy read executes), and an
    // outDir NESTED in dir would leave the table reading originals +
    // compacted copies (every row duplicated) — reject both; write to
    // a sibling and swap atomically at the table layer
    val inC = new java.io.File(dir).getCanonicalPath
    val outC = new java.io.File(outDir).getCanonicalPath
    require(outC != inC && !outC.startsWith(inC + java.io.File.separator),
      "compact cannot write into its input: outDir must be outside dir")
    val df = spark.read.parquet(dir)
    val inFiles = df.inputFiles.length
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val parts = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    df.repartition(parts).write.mode("overwrite").parquet(outDir)
    (inFiles, spark.read.parquet(outDir).inputFiles.length)
  }

  /** Materialize the training corpus in [[TrainingData.sequencePack]]
    * layout: one directory per shard, rows physically ordered by pack
    * offset, so a reader consumes each shard as a sequential stream of
    * already-packed sequences. `repartition(shard)` + `partitionBy
    * (shard)` yields one file per shard directory (no small-file
    * explosion); `sortWithinPartitions` fixes the physical row order
    * parquet preserves within a file.
    */
  def writeTrainingShards(docs: org.apache.spark.sql.DataFrame, outDir: String,
                          nShards: Int = 8, seqLen: Int = 256): Unit =
    TrainingData.sequencePack(docs, nShards, seqLen)
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "start_offset")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Dynamic partition overwrite — the incremental-refresh write mode
    * a recurring corpus pipeline needs: overwrite ONLY the partitions
    * present in `df`, leaving every other partition untouched. Plain
    * `mode("overwrite") + partitionBy` would truncate the whole
    * directory tree first (full-corpus data loss on an incremental
    * run); with `partitionOverwriteMode=dynamic` the commit replaces
    * exactly the partitions the job wrote — the daily-crawl refresh
    * pattern (re-land today's source=X partition, history intact).
    * The conf is set per-write and restored, so the session default
    * (static — the safer failure mode for full rewrites) is preserved.
    */
  def overwritePartitions(df: org.apache.spark.sql.DataFrame, outDir: String,
                          partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionBy: _*).parquet(outDir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Bucketed table write — the co-location half of SCALE.md §Joins:
    * two fact tables bucketed on their join key into the same bucket
    * count join WITHOUT a shuffle (each bucket pair joins in place;
    * `EnsureRequirements` sees the bucketed output partitioning
    * already satisfies the join's distribution and inserts no
    * Exchange — spec-proven in PlanAuditSpec). At 100 TB this is the
    * difference between re-shuffling both fact tables on every run of
    * a recurring join and paying the partition once at write time.
    * `sortCol` additionally orders within buckets so single-file
    * buckets skip the join's sort. Bucketing requires the table
    * catalog (`saveAsTable`) — bucket metadata lives there, not in
    * the parquet files.
    */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, table: String,
                    bucketCol: String, numBuckets: Int = 32,
                    sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(w.sortBy(_)).saveAsTable(table)
  }
}
