package graft.engine

import org.apache.spark.sql.DataFrame

/** JSONL (newline-delimited JSON) export — the interchange twin of the
  * [[Tables.jsonl]] source: training-data pipelines hand corpora to
  * tokenizers and external tools as JSONL shards far more often than
  * as parquet. Spark's native json writer emits one JSON object per
  * line per row, gzip-compressible and splittable by file.
  *
  * Scale posture mirrors [[CsvSink]]: the partitioned directory write
  * is the bulk path (parallel part files, optional `partitionBy` for
  * downstream pruning); there is deliberately NO single-file variant —
  * JSONL consumers read directories/globs natively, so serializing
  * 100 TB through one task for cosmetics would be a scale bug with no
  * consumer benefit.
  */
object JsonlSink {

  /** Parallel JSONL part files, optionally partitioned by columns and
    * compressed (`codec`: e.g. "gzip", "none").
    */
  def writePartitioned(df: DataFrame, outDir: String,
                       partitionBy: Seq[String] = Nil,
                       codec: String = "none"): Unit = {
    val w = df.write.mode("overwrite").option("compression", codec)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(outDir)
  }
}
