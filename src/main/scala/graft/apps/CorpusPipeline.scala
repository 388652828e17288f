package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.engine.{JsonlSink, ParquetSink}
import graft.operators.{Dedup, TextAnalysis, TrainingData}

/** The end-to-end LLM-training-corpus pipeline — every stage an
  * already-oracled operator, composed the way a production batch run
  * would chain them:
  *
  *   raw docs
  *     → quality gate (schema-preserving)   [[TextAnalysis.gopherGateFilter]]
  *     → boilerplate-coverage cut (opt-in)  [[TextAnalysis.boilerplateCoverage]]
  *     → exact + cluster-canonical near-dup [[Dedup.cleaningPipelineClustered]]
  *     → PII scrub                          [[TextAnalysis.piiScrub]]
  *     → eval-set decontamination filter    [[TrainingData.evalDecontaminate]]
  *     → temperature reweighting (opt-in)   [[TrainingData.temperatureMixture]]
  *     → PPS ship budget (opt-in)           [[TrainingData.ppsSample]]
  *     → packed training shards             [[ParquetSink.writeTrainingShards]]
  *     → JSONL interchange export           [[JsonlSink.writePartitioned]]
  *
  * Stage order is the batch twin of the streaming tier's
  * ([[graft.streaming.StreamPipeline.cleanIngest]]) reasoning: the
  * stateless gate runs first so rejected docs never reach the dedup
  * cascade; dedup runs on the RAW text (the same identity the
  * incremental tiers admit on); the regex scrub runs after cleaning so
  * only surviving documents pay it; decontamination sees the final
  * text it will actually train on.
  *
  * The returned [[Report]] counts are hash-aggregate actions over
  * already-computed frames (one count per stage, no data collected) —
  * the audit numbers a production run records anyway. On exit the run
  * clears EVERY cached frame in the session (`clearCacheOnExit`,
  * default true): the interior stages (`cleaningPipelineClustered`,
  * `evalDecontaminate`) persist corpus-sized frames whose handles they
  * do not expose, so a targeted unpersist cannot reach them and a
  * long-lived session invoking the pipeline repeatedly would
  * accumulate them. Pass false only when the caller owns other live
  * caches and accepts releasing this run's blocks lazily via GC.
  */
object CorpusPipeline {

  /** Per-stage document counts: raw input → gate survivors (incl. the
    * optional boilerplate-coverage cut) → dedup canonical survivors →
    * decontamination survivors → shipped (= kept, unless the optional
    * temperature-mixture or PPS-budget stages downsampled it).
    */
  case class Report(input: Long, gated: Long, cleaned: Long, kept: Long,
                    shipped: Long)

  def run(docs: DataFrame, evalDocs: DataFrame,
          shardDir: String, jsonlDir: String,
          maxContamRatio: Double = 0.5,
          nShards: Int = 4, seqLen: Int = 256,
          checkpointDir: Option[String] = None,
          clearCacheOnExit: Boolean = true,
          maxBoilerplate: Option[Double] = None,
          mixtureTemperature: Option[Double] = None,
          maxShipDocs: Option[Int] = None): Report = {
    // Stage counts ride the write pass as `observe` metrics
    // (CollectMetrics nodes) instead of per-stage count() actions:
    // every observed frame is upstream of the shard write, so ONE
    // action fills every counter — at 100 TB this is the difference
    // between auditing the run and re-scanning the corpus five times
    // (the persists only soften the latter on a single box).
    //
    // Placement rule (easy to get wrong): a CollectMetrics node that
    // sits ABOVE a cache and is consumed more than once inside one
    // action accumulates per consumption — the count silently doubles.
    // Every observe here therefore sits INSIDE a persisted subtree
    // (fires exactly once, when the cache materializes) or on a
    // single-consumer chain; the spec pins the totals against the
    // count() formulation.
    val obsInput   = org.apache.spark.sql.Observation()
    val obsGate    = org.apache.spark.sql.Observation()
    val obsCleaned = org.apache.spark.sql.Observation()
    val obsKept    = org.apache.spark.sql.Observation()
    val nRows = org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n")
    val gopherGated0 = TextAnalysis.gopherGateFilter(docs.observe(obsInput, nRows))
    // optional template cut: mine the corpus top-20 boilerplate grams
    // and drop documents whose coverage exceeds the threshold. Runs on
    // the gopher survivors, whose min-token rule guarantees every doc
    // has grams (so absence from the coverage frame cannot occur and
    // the semi-join is exact). Before dedup on purpose: boilerplate
    // docs are exactly the ones that explode LSH buckets.
    val gated = maxBoilerplate match {
      case Some(t) =>
        val gg = gopherGated0.persist(StorageLevel.MEMORY_AND_DISK)
        gg.join(
            TextAnalysis.boilerplateCoverage(gg)
              .filter(col("boiler_fraction") <= t).select("doc_id"),
            Seq("doc_id"), "left_semi")
          .observe(obsGate, nRows)
          .persist(StorageLevel.MEMORY_AND_DISK)
      case None =>
        gopherGated0.observe(obsGate, nRows)
          .persist(StorageLevel.MEMORY_AND_DISK)
    }
    // cleaningPipelineClustered emits (doc_id, n_tokens, fingerprint);
    // the text rides back in via a doc_id equi-join against the gated
    // frame (cheap: survivors-sized build side, no text re-derivation)
    val cleaned = Dedup.cleaningPipelineClustered(
        gated, checkpointDir = checkpointDir)
      .observe(obsCleaned, nRows)
    val survivors = gated.join(
      cleaned.select("doc_id"), Seq("doc_id"), "left_semi")
    val scrubbed = TextAnalysis.piiScrub(survivors, ordered = false)
      .select(col("doc_id"), col("clean_text").as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the eval corpus is scrubbed IDENTICALLY before shingling: the
    // training side compares post-scrub text, so an unscrubbed eval
    // vocabulary would mismatch every shingle spanning a redacted
    // token and let PII-bearing eval documents leak past the filter
    val scrubbedEval = TextAnalysis.piiScrub(evalDocs, ordered = false)
      .select(col("doc_id"), col("clean_text").as("text"))
    val contamOk = TrainingData.evalDecontaminate(
        scrubbed, evalDocs = Some(scrubbedEval))
      .filter(col("contam_ratio") <= maxContamRatio)
      .select("doc_id")
    val kept = scrubbed.join(contamOk, Seq("doc_id"), "left_semi")
      .observe(obsKept, nRows)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // optional temperature reweighting of the FINAL corpus (rates are
    // computed on what survived cleaning, which is what trains): lang
    // rides back in on doc_id since the scrub projection dropped it
    val reweighted = mixtureTemperature match {
      case Some(t) => kept.join(
        TrainingData.temperatureMixture(
            kept.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")),
            temperature = t)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
      case None => kept
    }
    // optional fixed-size ship budget: PPS (length-weighted) selection
    // over the post-scrub text the run actually ships — long documents
    // are proportionally favored, and the md5-priority draw keeps the
    // cut rerun-stable. Runs LAST so the budget is spent on documents
    // that survived every quality stage.
    val shipped = maxShipDocs match {
      case Some(n) => reweighted.join(
        TrainingData.ppsSample(
            reweighted.withColumn("source", org.apache.spark.sql.functions.lit("kept"))
              .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text"))),
            n = n)
          .select("doc_id"),
        Seq("doc_id"), "left_semi")
      case None => reweighted
    }
    // the shard write is the ONE action that fills every observation
    // (each observed frame is on its lineage); the JSONL export reuses
    // the persisted `kept` cache and the already-completed observations.
    // shipped gets NO observe: writeTrainingShards consumes the frame
    // twice in one action (pack + text join), which would double a
    // CollectMetrics above the kept cache — when no downsampling stage
    // is active, shipped IS kept; otherwise one cache-read count pays
    // for the audit
    ParquetSink.writeTrainingShards(shipped, shardDir, nShards, seqLen)
    JsonlSink.writePartitioned(shipped, jsonlDir)
    def n(o: org.apache.spark.sql.Observation): Long =
      o.get("n") match { case l: java.lang.Long => l.longValue }
    val report = Report(n(obsInput), n(obsGate), n(obsCleaned), n(obsKept),
      if (shipped eq kept) n(obsKept) else shipped.count())
    if (clearCacheOnExit) docs.sparkSession.catalog.clearCache()
    else {
      gated.unpersist(blocking = false)
      scrubbed.unpersist(blocking = false)
      kept.unpersist(blocking = false)
    }
    report
  }

  /** spark-submit entry: `runMain graft.apps.CorpusPipeline [sfDir outDir]`.
    * Uses the corpus's own `doc_id % 10 == 0` slice as the eval set —
    * the same convention [[TrainingData.evalDecontaminate]] defaults
    * to when no explicit eval corpus is supplied.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-corpus").toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val docs = graft.engine.Tables.documents(spark, sfDir)
      val r = run(docs, docs.filter(col("doc_id") % 10 === 0),
        s"$outDir/shards", s"$outDir/jsonl")
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"corpus pipeline: input=${r.input} gated=${r.gated} " +
        s"cleaned=${r.cleaned} kept=${r.kept} shipped=${r.shipped} " +
        f"wall=$sec%.1fs out=$outDir")
    } finally spark.stop()
  }
}
