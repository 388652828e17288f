package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis layer for LLM-training-data pipelines: token
  * counting (whitespace + regex "BPE-ish"), quality scoring, language
  * ID heuristics, and rolling-hash document fingerprinting.
  *
  * All functions are built from codegen'd Spark built-ins (split,
  * regexp_extract_all, higher-order filter/aggregate) — no UDFs — so
  * they stay inside WholeStageCodegen and scale linearly with no
  * shuffle (per-document narrow transforms).
  */
object TextAnalysis {

  /** Function-word markers used by the ratio features and the language
    * heuristic. Kept tiny and deterministic.
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  private def toks: Column = split(col("text"), " ")

  /** Per-document text statistics: whitespace token count, a
    * regex-word count (the "BPE-ish" lower bound — alnum runs), char
    * length, stopword ratio, and mean token length.
    */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("n_words_re"),
        length(col("text")).as("len_chars"),
        round(size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / size(toks), 4)
          .as("stopword_ratio"),
        round(length(col("text")).cast("double") / size(toks), 4).as("avg_token_len"))
      .orderBy("doc_id")

  /** Composite quality score in [0,1]: longer documents with healthy
    * stopword presence and moderate token length score higher.
    * Deterministic arithmetic only — reproducible everywhere.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(toks)
    val stopRatio = size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / nTok
    val lengthScore = least(nTok.cast("double") / lit(50.0), lit(1.0))
    val stopScore = least(stopRatio * lit(10.0), lit(1.0))
    docs.select(
        col("doc_id"),
        round(lengthScore, 4).as("length_score"),
        round(stopScore, 4).as("stop_score"),
        round((lengthScore + stopScore) / lit(2.0), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Marker-token language heuristic: documents with ≥3 English
    * function words are tagged 'en'. Output is the agreement matrix
    * against the labelled lang column. (A char-n-gram profile version
    * is in [[charNgramProfile]] for richer scoring.)
    */
  def langIdAgreement(docs: DataFrame): DataFrame = {
    val enMarkers = size(filter(toks, t => t.isin("the", "a")))
    docs.withColumn("pred_lang", when(enMarkers >= 3, lit("en")).otherwise(lit("other")))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** Character-bigram profile per document: top bigrams with counts,
    * the building block of a real n-gram language identifier (compare
    * against per-language reference profiles with cosine/overlap).
    */
  def charNgramProfile(docs: DataFrame, n: Int = 2, top: Int = 8): DataFrame = {
    val grams = expr(
      s"transform(sequence(1, greatest(length(text) - ${n - 1}, 0)), i -> substring(text, i, $n))")
    docs.select(col("doc_id"), explode(grams).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rk") <= top)
      .select("doc_id", "gram", "cnt", "rk")
      .orderBy("doc_id", "rk")
  }

  /** TF-IDF top term per document: term frequency from one explode +
    * aggregate, document frequency from a second small aggregate on
    * distinct (doc, term), idf = ln(N/df), ranked per document. All
    * shuffles are keyed on the term or the doc id — standard scale
    * shape for corpus statistics. The corpus size N is a 1-row
    * aggregate broadcast-joined INTO the plan (not a driver-side
    * count()), so building the query triggers no eager scan and the
    * whole thing stays one lazy plan.
    */
  def tfidfTopTerm(docs: DataFrame): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // rank on a 6-decimal rounding so engine-level ln() ulp differences
    // can never reorder near-equal scores (ties fall to the term)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf_r").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf_r", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        round(col("tfidf_r"), 4).as("tfidf"))
      .orderBy("doc_id")
  }

  /** Rolling-hash document fingerprint: md5 of the
    * whitespace-normalized, lowercased text. Identical fingerprints ⇒
    * exact duplicates modulo whitespace/case (the first stage of a
    * dedup cascade — see [[Dedup]]).
    */
  /** The normalization+hash expression itself — the single definition
    * [[fingerprints]] and [[Dedup.incrementalDedup]] both key on, so
    * the "admit only if the full recompute would" contract can't
    * drift.
    */
  val fingerprintCol: org.apache.spark.sql.Column =
    md5(regexp_replace(lower(col("text")), "\\s+", " "))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintCol.as("fingerprint"))
      .orderBy("doc_id")
}
