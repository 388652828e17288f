package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators._

/** Corpus-diagnostics layer (q102–q105): cross-source duplication
  * matrix, sequence-length histogram, near-dup cluster-size
  * distribution, and the hot-key skew audit. Fixtures have
  * hand-computable answers; the DuckDB oracle covers engine parity.
  */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ---- materialized token-tf + retrieval-arm frames -------------------

  test("token-family cached twins: materialized tf frame ≡ self-computed") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val dir = TextAnalysis.tokenTfDir(spark, s"$sfDir/documents.parquet", base)
    // first touch builds, second reuses (the _SUCCESS gate)
    assert(TextAnalysis.prebuildTokenTf(docs, dir), "first touch must build")
    assert(!TextAnalysis.prebuildTokenTf(docs, dir), "second touch must reuse")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: cached and self-computed runs diverge")
    same(TextAnalysis.tokenPmiCached(docs, dir),
      TextAnalysis.tokenPmi(docs), "q130 token PMI")
    same(TextAnalysis.textRankCached(docs, dir),
      TextAnalysis.textRank(docs), "q137 textRank")
    same(TextAnalysis.invertedIndexCached(docs, dir),
      TextAnalysis.invertedIndex(docs), "q139 inverted index")
    same(TextAnalysis.tokenTrianglesCached(docs, dir),
      TextAnalysis.tokenTriangles(docs), "q144 triangles")
    same(TextAnalysis.oovRateCached(docs, dir),
      TextAnalysis.oovRate(docs), "q146 OOV rate")
  }

  test("appendToTokenTf: tier ≡ rebuild; resident linked; chain; guards") {
    val docs = Tables.documents(spark, sfDir)
    val day0 = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 6)
    val b1 = docs.filter(col("doc_id") % 10 === 7)
    val b2 = docs.filter(col("doc_id") % 10 === 6)
    val base = java.nio.file.Files.createTempDirectory("graft-tokapp").toString
    val path = s"$sfDir/documents.parquet"
    val d0 = TextAnalysis.tokenTfDir(spark, path, base, variant = "d0_")
    val d1 = TextAnalysis.tokenTfDir(spark, path, base, variant = "d1_")
    val d2 = TextAnalysis.tokenTfDir(spark, path, base, variant = "d2_")
    val full = TextAnalysis.tokenTfDir(spark, path, base)
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0, what)
    assert(TextAnalysis.prebuildTokenTf(day0, d0))
    val snap0 = TierFiles.snapshot(s"$d0/tf")
    assert(TextAnalysis.appendToTokenTf(b1, d0, d1), "first append must build")
    // resident files byte-identical and hard-linked into the new tier
    assert(TierFiles.snapshot(s"$d0/tf") == snap0,
      "append changed the resident old tier")
    snap0.foreach { case (name, _, _) =>
      assert(java.nio.file.Files.isSameFile(
        new java.io.File(s"$d0/tf", name).toPath,
        new java.io.File(s"$d1/tf", name).toPath),
        s"tf/$name: expected a hard link, found a copy")
    }
    // chain: day-2 lands on day-1's appended frame; union ≡ rebuild
    assert(TextAnalysis.appendToTokenTf(b2, d1, d2))
    assert(TextAnalysis.prebuildTokenTf(docs, full))
    same(spark.read.parquet(s"$d2/tf"), spark.read.parquet(s"$full/tf"),
      "chained append diverges from the rebuild")
    // reuse no-op; overlapping batch rejected loudly
    assert(!TextAnalysis.appendToTokenTf(b1, d0, d1))
    intercept[IllegalArgumentException] {
      TextAnalysis.appendToTokenTf(b1.unionByName(day0.limit(1)), d0,
        TextAnalysis.tokenTfDir(spark, path, base, variant = "g_"))
    }
  }

  test("retrieval-arm cached twins: materialized rankings ≡ self-computed") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-arms").toString
    val dir = TextAnalysis.retrievalArmsDir(
      spark, s"$sfDir/documents.parquet", base)
    assert(TextAnalysis.prebuildRetrievalArms(docs, dir),
      "first touch must build")
    assert(!TextAnalysis.prebuildRetrievalArms(docs, dir),
      "second touch must reuse")
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"$what: cached and self-computed runs diverge")
    same(TextAnalysis.bm25TopKCached(docs, dir),
      TextAnalysis.bm25TopK(docs), "q138 BM25 top-k (k = 5 cut)")
    same(TextAnalysis.hybridRrfTopKCached(docs, dir),
      TextAnalysis.hybridRrfTopK(docs), "q152 hybrid RRF")
    same(TextAnalysis.rboRankingsCached(docs, dir),
      TextAnalysis.rboRankings(docs), "q213 RBO")
    same(TextAnalysis.retrievalQualityCached(docs, dir),
      TextAnalysis.retrievalQuality(docs), "q237 retrieval quality")
    // per-frame resume: losing ONE tier rebuilds just that tier (the
    // overlapped build must keep the per-frame _SUCCESS gating)
    def rm(x: java.io.File): Unit = {
      Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
    }
    rm(new java.io.File(s"$dir/tfidf"))
    assert(TextAnalysis.prebuildRetrievalArms(docs, dir),
      "losing a tier must trigger a rebuild")
    same(TextAnalysis.rboRankingsCached(docs, dir),
      TextAnalysis.rboRankings(docs), "q213 RBO after per-frame resume")
  }

  test("phrase-index cached twin: materialized postings ≡ self-computed phraseSearch") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-post").toString
    val dir = TextAnalysis.phraseIndexDir(
      spark, s"$sfDir/documents.parquet", base)
    assert(TextAnalysis.prebuildPhraseIndex(docs, dir),
      "first touch must build")
    assert(!TextAnalysis.prebuildPhraseIndex(docs, dir),
      "second touch must reuse")
    val cached = TextAnalysis.phraseSearchCached(docs, dir)
    val self = TextAnalysis.phraseSearch(docs)
    assert(cached.exceptAll(self).count() == 0 &&
      self.exceptAll(cached).count() == 0,
      "q196 phrase search: cached and self-computed runs diverge")
  }

  test("textRank cached twin: materialized converged ranks ≡ self-computed") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-tr").toString
    val dir = TextAnalysis.textRankDir(
      spark, s"$sfDir/documents.parquet", base)
    assert(TextAnalysis.prebuildTextRank(docs, dir),
      "first touch must build")
    assert(!TextAnalysis.prebuildTextRank(docs, dir),
      "second touch must reuse")
    val cached = TextAnalysis.textRankMaterialized(docs, dir)
    val self = TextAnalysis.textRank(docs)
    assert(cached.exceptAll(self).count() == 0 &&
      self.exceptAll(cached).count() == 0,
      "q137 textRank: materialized and self-computed runs diverge")
    // a sub-vocab topK cut is a row filter on identically-built ranks
    val cut = TextAnalysis.textRankMaterialized(docs, dir, topK = 7)
    val selfCut = TextAnalysis.textRank(docs, topK = 7)
    assert(cut.exceptAll(selfCut).count() == 0 &&
      selfCut.exceptAll(cut).count() == 0,
      "q137 textRank topK=7: materialized and self-computed runs diverge")
  }

  test("armAgreement: the bm25~tfidf cell IS q213; all cells inside the RBO envelope") {
    val docs = Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft-agree").toString
    val dir = TextAnalysis.retrievalArmsDir(
      spark, s"$sfDir/documents.parquet", base)
    val res = TextAnalysis.armAgreement(docs, dir)
    assert(res.count() == 24) // 3 pairs x 8 panel queries
    // the bm25~tfidf cell is exactly the q213 comparison
    val cell = res.filter(col("pair") === "bm25~tfidf")
      .select("q_id", "n_overlap", "rbo")
    val q213 = TextAnalysis.rboRankings(docs)
    assert(cell.exceptAll(q213).count() == 0 &&
      q213.exceptAll(cell).count() == 0,
      "bm25~tfidf must equal rboRankings")
    // every cell obeys the suffix-weight envelope: overlap <= 10 and
    // rbo <= 1 - 2^-10 (identical depth-10 lists), >= 0
    res.collect().foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L, r.toString)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 0.999024, r.toString)
    }
  }

  // ---- q163 Flesch readability ---------------------------------------

  test("readability: hand-counted words/sentences/vowel-groups and the formula") {
    // "The cat sat. It ran! Did it?" → 7 words, 3 sentence runs,
    // 7 vowel groups → 206.835 − 1.015·(7/3) − 84.6·(7/7)
    val df = docsDf(Seq(
      (1L, "The cat sat. It ran! Did it?", "s"),
      (2L, "", "s")))
    val res = TextAnalysis.readability(df).collect()
    val r = res(0)
    assert(r.getInt(1) == 7 && r.getInt(2) == 3 && r.getInt(3) == 7)
    val expected = math.rint(
      (206.835 - 1.015 * (7.0 / 3) - 84.6 * (7.0 / 7)) * 1e4) / 1e4
    assert(r.getDouble(4) == expected)
    // empty doc: zero words → NULL score, sentence floor holds at 1
    assert(res(1).getInt(1) == 0 && res(1).getInt(2) == 1 && res(1).isNullAt(4))
  }

  test("readability on the corpus: every doc scored, unpunctuated = one sentence") {
    val docs = Tables.documents(spark, sfDir)
    val res = TextAnalysis.readability(docs).collect()
    assert(res.length == docs.count())
    res.foreach { r =>
      assert(r.getInt(2) == 1, "corpus has no terminal punctuation")
      assert(!r.isNullAt(4))
    }
  }

  // ---- q156 Heaps-law vocabulary growth ------------------------------

  test("vocabGrowth: first-seen tranches and cumulative totals, by hand") {
    // dense ids 0..3, buckets=2 → docs 0/1 in tranche 1, 2/3 in 2
    val df = docsDf(Seq(
      (0L, "a b", "s"), (1L, "b c", "s"),
      (2L, "a d", "s"), (3L, "d e", "s")))
    val res = TextAnalysis.vocabGrowth(df, buckets = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(res.toSeq == Seq(
      (1, 4L, 3L, 4L, 3L),   // tokens a b b c → new {a,b,c}
      (2, 4L, 2L, 8L, 5L)))  // tokens a d d e → new {d,e}
  }

  test("vocabGrowth on the corpus: curve closes over the full vocab and token count") {
    val docs = Tables.documents(spark, sfDir)
    val res = TextAnalysis.vocabGrowth(docs).collect()
    assert(res.length == 10)
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
    assert(res.last.getLong(3) == toks.count())
    assert(res.last.getLong(4) == toks.distinct().count())
    // both cumulative series strictly increase (every tranche adds
    // tokens; on this corpus every tranche also mints new vocab)
    res.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) > a.getLong(3) && b.getLong(4) >= a.getLong(4))
    }
  }

  // ---- q102 cross-source duplication --------------------------------

  test("crossSourceDups: off-diagonal shares, diagonal internal dups only") {
    val df = docsDf(Seq(
      (1L, "X", "src0"), (2L, "Y", "src0"), (3L, "dup", "src0"),
      (4L, "X", "src1"), (5L, "Z", "src1"),
      (6L, "dup", "src2"), (7L, "dup", "src2")))
    val res = Dedup.crossSourceDups(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(res == Map(
      ("src0", "src1") -> 1L,  // "X"
      ("src0", "src2") -> 1L,  // "dup"
      ("src2", "src2") -> 1L)) // "dup" twice within src2
    // src0 has no internal duplicate and (src1, src2) share nothing —
    // absent rows, not zero rows
  }

  test("crossSourceDups at paragraph level catches shared chunks inside distinct docs") {
    // two sources share one 20-token paragraph embedded in otherwise
    // different documents — invisible at doc level, one shared fp at
    // paragraph level
    val para = (1 to 20).map("shared" + _).mkString(" ")
    val df = docsDf(Seq(
      (1L, para + " " + (1 to 20).map("a" + _).mkString(" "), "src0"),
      (2L, para + " " + (1 to 20).map("b" + _).mkString(" "), "src1")))
    assert(Dedup.crossSourceDups(df).collect().isEmpty)
    val res = Dedup.crossSourceDups(df, level = "paragraph").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(res == Map(("src0", "src1") -> 1L))
  }

  test("crossSourceDups counts distinct fingerprints, not copy pairs") {
    // 3 copies in one source + 2 in another: still ONE shared fp
    val df = docsDf(Seq(
      (1L, "t", "a"), (2L, "t", "a"), (3L, "t", "a"),
      (4L, "t", "b"), (5L, "t", "b")))
    val res = Dedup.crossSourceDups(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(res == Map(("a", "a") -> 1L, ("a", "b") -> 1L, ("b", "b") -> 1L))
  }

  // ---- q103 length histogram ----------------------------------------

  test("lengthHistogram: buckets and cumulative coverage are exact") {
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val df = docsDf(Seq(
      (1L, words(1), "s"), (2L, words(33), "s"),
      (3L, words(40), "s"), (4L, words(100), "s")))
    val res = TrainingData.lengthHistogram(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(res.toSeq == Seq((0, 1L, 0.25), (32, 2L, 0.75), (96, 1L, 1.0)))
  }

  test("lengthHistogram covers the corpus: counts sum to total, cum_frac ends at 1") {
    val docs = Tables.documents(spark, sfDir)
    val res = TrainingData.lengthHistogram(docs).collect()
    assert(res.map(_.getLong(1)).sum == docs.count())
    assert(res.last.getDouble(2) == 1.0)
    val fracs = res.map(_.getDouble(2))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b })
  }

  // ---- q104 cluster sizes -------------------------------------------

  test("clusterSizeDistribution: chain of 3 + pair of 2 → {3: 1, 2: 1}") {
    // reuse the transitive-chain fixture (A~B~C without A~C) plus an
    // independent near-identical pair; the lone doc must NOT appear
    val df = docsDf(Seq(
      (1L, "a b c d e f g h i j", "s"),
      (2L, "a b c d e f g h x y", "s"),
      (3L, "p q c d e f g h x y", "s"),
      (4L, "m n o p q r s t u v", "s"),
      (5L, "m n o p q r s t u w", "s"),
      (9L, "completely different words with no shared shingles at all", "s")))
    val res = Dedup.clusterSizeDistribution(df, threshold = 0.4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(3L -> 1L, 2L -> 1L))
  }

  // ---- q106 pipeline funnel -----------------------------------------

  test("pipelineFunnel: one doc per attrition stage, counted per source") {
    val good  = "the quick brown fox jumps over a lazy dog today"
    val evalT = "the big red car drives down a long empty road"
    val goodB = "a small green bird sings near the quiet old tree"
    val df = docsDf(Seq(
      (1L, good, "a"),   // survives everything
      (2L, good, "a"),   // exact duplicate → removed at dedup
      (3L, "x y", "a"),  // gate fail (too short)
      (4L, evalT, "a"),  // gate-pass, unique, contaminated (= eval doc)
      (5L, goodB, "b"))) // clean source
    val evalDocs = docsDf(Seq((100L, evalT, "eval")))
    val res = TrainingData.pipelineFunnel(df, evalDocs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(res == Map(
      "a" -> ((4L, 3L, 2L, 1L)),
      "b" -> ((1L, 1L, 1L, 1L))))
  }

  test("pipelineFunnel on the corpus: monotone stages, input total preserved") {
    val docs = Tables.documents(spark, sfDir)
    val res = TrainingData.pipelineFunnel(
      docs, docs.filter(col("doc_id") % 10 === 0)).collect()
    assert(res.map(_.getLong(1)).sum == docs.count())
    for (r <- res) {
      assert(r.getLong(1) >= r.getLong(2), r.toString)
      assert(r.getLong(2) >= r.getLong(3), r.toString)
      assert(r.getLong(3) >= r.getLong(4), r.toString)
    }
  }

  // ---- q107 range-bucket join ---------------------------------------

  test("rangeBucketJoin equals the brute-force BETWEEN join") {
    val facts = Seq((1L, 0.5), (2L, 3.7), (3L, 9.99), (4L, 25.0))
      .toDF("fact_id", "value")
    val intervals = Seq((10L, 0.0, 2.0), (11L, 3.0, 4.0), (12L, 3.5, 10.0))
      .toDF("interval_id", "lo", "hi")
    val res = Joins.rangeBucketJoin(facts, intervals, "value", 1.0)
      .select("fact_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = facts.crossJoin(intervals)
      .filter(col("value") >= col("lo") && col("value") < col("hi"))
      .select("fact_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res == brute)
    assert(res == Set((1L, 10L), (2L, 11L), (2L, 12L), (3L, 12L)))
    // 4 is outside every interval; each matching pair appears ONCE
    val rows = Joins.rangeBucketJoin(facts, intervals, "value", 1.0).count()
    assert(rows == 4)
  }

  test("rangeBucketJoin handles intervals wider than many buckets and null values") {
    val facts = Seq((1L, Some(5.0)), (2L, None)).toDF("fact_id", "value")
    val intervals = Seq((1L, 0.0, 100.0)).toDF("interval_id", "lo", "hi")
    val res = Joins.rangeBucketJoin(facts, intervals, "value", 1.0).collect()
    assert(res.length == 1 && res.head.getLong(0) == 1L) // null never matches
  }

  // ---- q108 salted join ---------------------------------------------

  test("saltedJoin result is exactly the plain join's") {
    val probe = (1 to 100).map(i => (if (i <= 90) 7L else i.toLong, i.toLong))
      .toDF("k", "row_id") // 90% of rows share the hot key 7
    val build = Seq((7L, "hot"), (95L, "cold"), (999L, "unmatched"))
      .toDF("bk", "tag")
    val res = Joins.saltedJoin(probe, build, "k", "bk",
        col("row_id"), nSalts = 4)
      .select("row_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val plain = probe.join(build, col("k") === col("bk"))
      .select("row_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(res == plain)
    assert(res.size == 91) // 90 hot + 1 cold
  }

  test("saltedJoin spreads the hot key over multiple salts") {
    val probe = (1 to 100).map(i => (7L, i.toLong)).toDF("k", "row_id")
    val salts = probe.withColumn("salt",
        (conv(substring(md5(col("row_id").cast("string")), 1, 8), 16, 10) % 4).cast("int"))
      .select("salt").distinct().count()
    assert(salts > 1, "identical-key rows must not all share one salt")
  }

  // ---- q109 quality quantile normalize ------------------------------

  test("qualityQuantileNormalize ranks within source, 0 to 1, by quality") {
    def w(n: Int) = (1 to n).map("w" + _).mkString(" ") // no stopwords
    val df = docsDf(Seq(
      (1L, w(10), "a"), (2L, w(25), "a"), (3L, w(50), "a"),
      (4L, w(10), "b"), (5L, w(50), "b")))
    val res = TextAnalysis.qualityQuantileNormalize(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // stopword term is 0 for all ⇒ quality = min(ntok/50, 1)/2
    assert(res(1L) == ((0.1, 0.0)) && res(2L) == ((0.25, 0.5)) && res(3L) == ((0.5, 1.0)))
    assert(res(4L)._2 == 0.0 && res(5L)._2 == 1.0) // ranks reset per source
  }

  // ---- q110 LSH recall audit ----------------------------------------

  test("lshRecallReport: identical pairs are always found; recall bounded") {
    val same = "alpha beta gamma delta epsilon zeta eta theta"
    val df = docsDf(Seq(
      (1L, same, "s"), (2L, same, "s"),
      (3L, "one two three four five six seven eight", "s"),
      (4L, "completely different tokens here nine ten eleven twelve", "s")))
    val res = Dedup.lshRecallReport(df, sampleSize = 100).collect()
    // the only qualifying pair is (1,2) at jaccard 1.0 — every band of
    // an identical pair collides, so banding cannot miss it
    assert(res.length == 1)
    assert(res.head.getDouble(0) == 1.0)
    assert(res.head.getLong(1) == 1L && res.head.getLong(2) == 1L)
    assert(res.head.getDouble(3) == 1.0)
  }

  test("lshRecallReport on the corpus: found never exceeds truth, recall in [0,1]") {
    val docs = Tables.documents(spark, sfDir)
    val res = Dedup.lshRecallReport(docs).collect()
    assert(res.nonEmpty)
    for (r <- res) {
      assert(r.getLong(2) <= r.getLong(1), r.toString)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, r.toString)
    }
  }

  // ---- q111 per-source PPS ------------------------------------------

  test("ppsSamplePerSource matches the rank-window formulation per source") {
    val docs = Tables.documents(spark, sfDir)
    val res = TrainingData.ppsSamplePerSource(docs, nPerSource = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("priority"), col("doc_id"))
    val ref = docs.select(col("doc_id"), col("source"),
        (u / col("n_chars")).as("priority"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(res == ref)
    // every source contributes its own full quota (corpus has ≥10/source)
    val bySource = res.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySource.values.forall(_ == 10), bySource.toString)
  }

  // ---- q112 winsorize -----------------------------------------------

  test("winsorize clips exactly at the group quantile band and flags it") {
    val events = Tables.events(spark, sfDir)
    val res = Aggregates.winsorize(events).collect()
    assert(res.length == events.count())
    // clipped rows moved to a bound; unclipped rows are untouched
    for (r <- res) {
      val (v, w, clipped) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      if (!clipped) assert(v == w, r.toString)
      else assert(v != w || v == w, r.toString) // boundary-equal clips allowed
    }
    // ~10% of each group sits outside the [p05, p95] band
    val frac = res.count(_.getBoolean(4)).toDouble / res.length
    assert(frac > 0.05 && frac < 0.15, s"clip fraction $frac")
    // winsorized values sit inside independently computed group bounds
    // (the interpolated bound need not equal any observed value)
    val bounds = events.groupBy("event_type").agg(
        percentile(col("value"), lit(0.05)).as("lo"),
        percentile(col("value"), lit(0.95)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (r <- res) {
      val (lo, hi) = bounds(r.getString(1))
      val w = r.getDouble(3)
      assert(w >= lo - 1e-4 && w <= hi + 1e-4, r.toString)
    }
  }

  // ---- q113 LOCF imputation -----------------------------------------

  test("locfImpute carries the previous observation; leading gaps stay null") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: gap at id 7 takes value of id 5; gap at 14 takes 9
      (5L, ts("2026-01-01 10:00:00"), 1L, "view", 50.0, "{}"),
      (7L, ts("2026-01-01 10:01:00"), 1L, "view", 999.0, "{}"), // seeded gap
      (9L, ts("2026-01-01 10:02:00"), 1L, "view", 90.0, "{}"),
      (14L, ts("2026-01-01 10:03:00"), 1L, "view", 999.0, "{}"), // seeded gap
      // user 2: FIRST event is a gap → stays null
      (21L, ts("2026-01-01 11:00:00"), 2L, "view", 999.0, "{}"),
      (22L, ts("2026-01-01 11:01:00"), 2L, "view", 22.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val res = Aggregates.locfImpute(ev).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(res(5L)  == ((false, Some(50.0))))
    assert(res(7L)  == ((true,  Some(50.0)))) // carried forward
    assert(res(9L)  == ((false, Some(90.0))))
    assert(res(14L) == ((true,  Some(90.0)))) // carried forward
    assert(res(21L) == ((true,  None)))       // leading gap: loud null
    assert(res(22L) == ((false, Some(22.0))))
  }

  // ---- q105 hot keys ------------------------------------------------

  test("hotKeys: frequencies, shares, and deterministic tie-break") {
    val df = (Seq.fill(5)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L) ++ Seq.fill(3)(5L))
      .toDF("user_id")
    val res = Aggregates.hotKeys(df, "user_id", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 12 rows total; tie between key 20 and key 5 at n=3 breaks by key
    assert(res.toSeq == Seq(
      (10L, 5L, 0.416667), (5L, 3L, 0.25), (20L, 3L, 0.25)))
  }

  test("hotKeys on events: k rows, fracs in (0, 1], descending counts") {
    val events = Tables.events(spark, sfDir)
    val res = Aggregates.hotKeys(events, "user_id").collect()
    val nKeys = events.select("user_id").distinct().count()
    assert(res.length == math.min(20L, nKeys))
    val ns = res.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(res.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1))
  }

  // ---- q130 token PMI -----------------------------------------------

  test("tokenPmi: closed-form PMI, support threshold enforced") {
    // N=10 docs; (a,b) co-occur in 5, a alone in 1 (df_a=6), b alone
    // in 1 (df_b=6); (c,d) co-occur in only 3 — below minSupport
    val df = docsDf(
      (1 to 5).map(i => (i.toLong, "a b", "s")) ++ Seq(
        (6L, "a", "s"), (7L, "b", "s")) ++
        (8 to 10).map(i => (i.toLong, "c d", "s")))
    val res = TextAnalysis.tokenPmi(df).collect()
    assert(res.length == 1)
    val r = res(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == (("a", "b", 5L)))
    assert(r.getDouble(3) == math.floor(math.log(10.0 * 5 / 36) * 1e4 + 0.5) / 1e4)
  }

  test("tokenPmi: duplicate tokens inside a doc count once (df semantics)") {
    val df = docsDf(Seq(
      (1L, "a a a b", "s"), (2L, "a b b", "s"), (3L, "a b", "s"),
      (4L, "a b", "s"), (5L, "a b", "s")))
    val r = TextAnalysis.tokenPmi(df).collect()(0)
    // df_a = df_b = df_ab = 5 over N = 5 → PMI = ln(5·5/25) = 0
    assert(r.getLong(2) == 5L && r.getDouble(3) == 0.0)
  }

  test("tokenPmi: vocabulary cut excludes low-df tokens before pairing") {
    val df = docsDf(
      (1 to 5).map(i => (i.toLong, "a b rare" + i, "s")))
    // vocab=2 keeps only a and b; the rareN tokens never form pairs
    val res = TextAnalysis.tokenPmi(df, vocab = 2, minSupport = 1).collect()
    assert(res.length == 1)
    assert((res(0).getString(0), res(0).getString(1)) == (("a", "b")))
  }

  test("tokenPmi on the documents table: bounded output, finite scores") {
    val res = TextAnalysis.tokenPmi(Tables.documents(spark, sfDir)).collect()
    assert(res.length <= 20)
    assert(res.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // descending by rounded pmi with (ta, tb) tie-break
    val ps = res.map(_.getDouble(3))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  // ---- q137 TextRank keywords ---------------------------------------

  test("textRank: hub token outranks leaves; symmetric leaves tie exactly") {
    // graph from docs {a b}, {a c}: a—b and a—c (w=1 each); a is the
    // hub. By symmetry r(b) = r(c) exactly; mass sums to 1 (no
    // dangling nodes) up to the final rounding.
    val df = docsDf(Seq((1L, "a b", "s"), (2L, "a c", "s")))
    val res = TextAnalysis.textRank(df).collect()
    assert(res.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    val scores = res.map(_.getDouble(2))
    assert(scores(0) > scores(1))
    assert(scores(1) == scores(2))
    assert(math.abs(scores.sum - 1.0) < 0.002)
  }

  test("textRank: vocabulary cut keeps rare tokens out of the graph") {
    val df = docsDf(
      (1 to 5).map(i => (i.toLong, s"a b unique$i", "s")))
    val res = TextAnalysis.textRank(df, vocab = 2).collect()
    assert(res.map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
  }

  test("textRank on the corpus: topK rows, positive scores, descending") {
    val res = TextAnalysis.textRank(Tables.documents(spark, sfDir)).collect()
    assert(res.length == 20)
    assert(res.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0))
    val s = res.map(_.getDouble(2))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  // ---- q138 BM25 retrieval ------------------------------------------

  test("bm25TopK: both-term doc first; rare-term match outranks common") {
    // q0 = "apple banana". df(apple)=4 > df(banana)=3, all candidate
    // docs have dl=3 and tf=1, so ranking reduces to idf: doc1 (both
    // terms) > doc4 (rare banana) > doc2 > doc3 (common apple, id tie).
    val df = docsDf(Seq(
      (0L, "apple banana", "s"), (1L, "apple banana filler", "s"),
      (2L, "apple x1 x2", "s"), (3L, "apple y1 y2", "s"),
      (4L, "banana z1 z2", "s")))
    val r0 = TextAnalysis.bm25TopK(df).collect()
      .filter(_.getLong(0) == 0L)
    assert(r0.map(_.getLong(1)).toSeq == Seq(1L, 4L, 2L, 3L))
    val s = r0.map(_.getDouble(2))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  test("bm25TopK on the corpus: 8 queries x 5 hits, ranks complete") {
    val res = TextAnalysis.bm25TopK(Tables.documents(spark, sfDir)).collect()
    assert(res.length == 40)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 5))
      val s = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- q139 inverted index ------------------------------------------

  test("invertedIndex: cap truncates postings; df/cf count the full data") {
    // "x" is in 4 docs (twice in doc 1): df=4, cf=5, postings capped
    // to the 2 lowest doc ids; "y" in 1 doc.
    val df = docsDf(Seq(
      (1L, "x x y", "s"), (2L, "x", "s"), (3L, "x", "s"), (4L, "x", "s")))
    val res = TextAnalysis.invertedIndex(df, topTerms = 10, postingsCap = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(res.toSeq == Seq(("x", 4L, 5L, "1,2"), ("y", 1L, 1L, "1")))
  }

  test("invertedIndex on the corpus: topTerms rows, df descending, sorted csv") {
    val res = TextAnalysis.invertedIndex(Tables.documents(spark, sfDir)).collect()
    // the synthetic corpus vocabulary is ~31 terms — smaller than the cut
    assert(res.length > 0 && res.length <= 50)
    val dfs = res.map(_.getLong(1))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
    res.foreach { r =>
      val ids = r.getString(3).split(",").map(_.toLong)
      assert(ids.length <= 20 && ids.length <= r.getLong(1))
      assert(ids.zip(ids.tail).forall { case (a, b) => a < b })
      assert(r.getLong(2) >= r.getLong(1)) // cf >= df
    }
  }

  test("SubwordGenerator: maximal munch, UNK fallback, word boundaries, double spaces") {
    import graft.functions.SubwordGenerator
    val df = docsDf(Seq((1L, "tablex qu  zz", "s")))
    val toks = df.select(col("doc_id"),
        SubwordGenerator.subwords(col("text"), Seq("table", "ta", "qu", "z"))
          .as(Seq("word_idx", "sub_idx", "token", "is_unk")))
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    assert(toks.toSeq == Seq(
      (0, 0, "table", 0), (0, 1, "x", 1),  // longest match beats "ta"; x is UNK
      (1, 0, "qu", 0),                     // whole word
      (2, 0, "z", 0), (2, 1, "z", 0)),     // double space: no empty word emitted
      toks.mkString(";"))
  }

  test("subwordStats and subwordFertility: hand-segmented counts and rollup") {
    val vocab = Seq("table", "ta", "qu", "z", "b")
    val df = Seq(
      (1L, "tablex qu", "en", "s", 0L),   // 2 words, 3 subs, 1 unk
      (2L, "zz b", "en", "s", 0L),        // 2 words, 3 subs, 0 unk
      (3L, "qqq", "de", "s", 0L))         // 1 word, 3 subs, 3 unk ("q" not in vocab)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val st = TextAnalysis.subwordStats(df, vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(st(1L) == ((2L, 3L, 1L, 1.5)))
    assert(st(2L) == ((2L, 3L, 0L, 1.5)))
    assert(st(3L) == ((1L, 3L, 3L, 3.0)))
    val f = TextAnalysis.subwordFertility(df, vocab).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(f("en") == ((2L, 4L, 6L, 1L, 1.5, math.rint(1.0 / 6 * 1e4) / 1e4)))
    assert(f("de") == ((1L, 1L, 3L, 3L, 3.0, 1.0)))
  }

  test("subwordStats on the corpus: every doc covered, fertility >= 1, unk bounded by subwords") {
    val docs = Tables.documents(spark, sfDir)
    val res = TextAnalysis.subwordStats(docs).collect()
    assert(res.length == docs.count())
    res.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "at least one subword per word")
      assert(r.getLong(3) <= r.getLong(2) && r.getDouble(4) >= 1.0)
    }
  }

  test("bpeMergeCandidates: hand-counted pairs; applying the top merge reduces fertility") {
    val vocab = Seq("ab", "c", "d")
    val df = docsDf(Seq((1L, "abcd abab abcd", "s")))
    val r = TextAnalysis.bpeMergeCandidates(df, topN = 10, vocab = vocab).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
    // "abcd" → [ab, c, d] twice; "abab" → [ab, ab] once
    assert(r.toSeq == Seq(
      ("ab", "c", "abc", 2L), ("c", "d", "cd", 2L), ("ab", "ab", "abab", 1L)),
      r.mkString(";"))
    // the trainer loop's invariant: adding the top merge shrinks the
    // corpus token count (that is WHAT the count ranking maximizes)
    def totalSubwords(v: Seq[String]) = TextAnalysis.subwordStats(df, v)
      .agg(sum("n_subwords")).head().getLong(0)
    assert(totalSubwords(vocab :+ "abc") < totalSubwords(vocab))
  }

  test("bpeTrain: the hand-traced 3-iteration loop on the toy corpus") {
    val vocab = Seq("ab", "c", "d")
    // distinct words: "abcd" ×2, "abab" ×1 → 3 word instances
    val df = docsDf(Seq((1L, "abcd abab abcd", "s")))
    val r = TextAnalysis.bpeTrain(df, iters = 3, baseVocab = vocab).collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2), x.getString(3),
        x.getLong(4), x.getDouble(5)))
    // iter 1: pairs (ab,c)=2, (c,d)=2, (ab,ab)=1 → tie breaks on t1
    //   ("ab" < "c") → merge "abc"; abcd→[abc,d]×2, abab→[ab,ab]×1
    //   → 6 subwords / 3 words = 2.0
    // iter 2: (abc,d)=2 beats (ab,ab)=1 → "abcd"; 4/3 → 1.3333
    // iter 3: only (ab,ab)=1 → "abab"; 3/3 = 1.0
    assert(r.toSeq == Seq(
      (1, "ab", "c", "abc", 2L, 2.0),
      (2, "abc", "d", "abcd", 2L, math.floor(4.0 / 3 * 1e4 + 0.5) / 1e4),
      (3, "ab", "ab", "abab", 1L, 1.0)), r.mkString(";"))
  }

  test("bpeTrain on the corpus: fertility ratchets down, merges are new tokens, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val r = TextAnalysis.bpeTrain(docs, iters = 3).collect()
    assert(r.length == 3)
    r.foreach { x =>
      assert(x.getString(3) == x.getString(1) + x.getString(2), "merged = t1||t2")
      assert(x.getLong(4) >= 1L, "adopted merge has support")
      assert(!graft.functions.SubwordGenerator.DefaultVocab.contains(x.getString(3)),
        "adopted merge is genuinely new")
    }
    // each merge can only shrink (or hold) the greedy token total on
    // the corpus it was mined from — the trainer's ratchet
    val ferts = r.map(_.getDouble(5)).toSeq
    assert(ferts == ferts.sorted.reverse, s"fertility non-increasing: $ferts")
    assert(r.map(_.getString(3)).distinct.length == 3, "three distinct merges")
    val again = TextAnalysis.bpeTrain(docs, iters = 3).collect()
    assert(r.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("scalingAudit: per-family counts equal the family functions' own counts") {
    val docs = Tables.documents(spark, sfDir)
    val cc = java.nio.file.Files.createTempDirectory("graft-audit-cc").toString
    val sh = java.nio.file.Files.createTempDirectory("graft-audit-sh").toString
    val r = Dedup.scalingAudit(docs, cc, sh).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r.keySet == Set("containment", "minhash_cand", "minhash_cand_capped",
      "minhash_cand_r2", "minhash_verified", "prefix_jaccard", "simhash",
      "snm", "video_frames", "winnow"))
    val nDocs = docs.count()
    r.values.foreach { case (nd, np, ppk) =>
      assert(nd == nDocs)
      assert(ppk == math.floor(np.toDouble / nd * 1e6 + 0.5) / 1e3)
    }
    // the audit counts the SAME frames the family queries emit
    assert(r("minhash_cand")._2 == Dedup.minhashCandidatePairsCached(docs, cc).count())
    assert(r("minhash_verified")._2 == Dedup.nearDupPairsCached(docs, cc).count())
    assert(r("simhash")._2 == Dedup.simhashPairsCached(docs, sh).count())
    assert(r("snm")._2 == Dedup.snmNearDups(docs).count())
    assert(r("winnow")._2 == Dedup.winnowedPairs(docs).count())
    // verified ⊆ candidates; the cap only ever removes candidates
    // (r2 uses fresh salts — a different hash family — so it is
    // compared to its own function, not asserted a subset of r1)
    assert(r("minhash_verified")._2 <= r("minhash_cand")._2)
    assert(r("minhash_cand_capped")._2 <= r("minhash_cand")._2)
    assert(r("minhash_cand_capped")._2 ==
      Dedup.minhashCandidatePairs(docs, maxBucketSize = Some(50)).count())
    assert(r("minhash_cand_r2")._2 ==
      Dedup.minhashCandidatePairsFine(docs).count())
    assert(r("video_frames")._2 ==
      graft.operators.Multimodal.videoNearDups(docs).count())
  }

  test("phraseSearch: adjacency in order, df vs occurrences, top-doc ranking") {
    // doc 1: "x y z x y z" → trigrams [x y z, y z x, z x y, x y z]
    //   ("x y z" twice). doc 2: "x y z q". doc 3: too short for any.
    val df = docsDf(Seq(
      (1L, "x y z x y z", "s"), (2L, "x y z q", "s"), (3L, "a b", "s")))
    val rows = TextAnalysis.phraseSearch(df, topN = 2, topDocs = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    val top = rows.filter(_._1 == "x y z")
    // "x y z": occurrences 3 (2 in doc 1, 1 in doc 2), df 2; doc 1
    // ranks first on per-doc count
    assert(top.toSeq == Seq(("x y z", 2L, 3L, 1L, 2L, 1),
      ("x y z", 2L, 3L, 2L, 1L, 2)), rows.mkString(";"))
    // order matters: a reversed phrase never appears
    assert(!rows.exists(_._1 == "z y x"))
    // panel is capped at topN phrases
    assert(rows.map(_._1).distinct.length <= 2)
  }

  test("phraseSearch on the corpus: rk caps at topDocs, df <= occurrences, deterministic panel") {
    val res = TextAnalysis.phraseSearch(Tables.documents(spark, sfDir), topN = 5, topDocs = 3).collect()
    assert(res.nonEmpty && res.map(_.getString(0)).distinct.length <= 5)
    res.foreach { r =>
      assert(r.getInt(5) >= 1 && r.getInt(5) <= 3)
      assert(r.getLong(1) <= r.getLong(2), "df <= occurrences")
      assert(r.getLong(4) >= 1L)
    }
    // rerun is identical (deterministic tie-breaks end to end)
    val again = TextAnalysis.phraseSearch(Tables.documents(spark, sfDir), topN = 5, topDocs = 3).collect()
    assert(res.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  // ---- q135 prefix-filtering Jaccard join ---------------------------

  test("prefixJaccardJoin: identical docs J=1, disjoint docs absent") {
    val df = docsDf(Seq(
      (1L, "a b c d e f g h", "s"),
      (2L, "a b c d e f g h", "s"),   // identical shingle set → J = 1
      (3L, "x y z w v u t q", "s")))  // disjoint → no pair
    val res = Dedup.prefixJaccardJoin(df).collect()
    assert(res.length == 1)
    assert((res(0).getLong(0), res(0).getLong(1)) == ((1L, 2L)))
    assert(res(0).getLong(4) == 6L)        // 8 tokens → 6 shingles
    assert(res(0).getDouble(5) == 1.0)
  }

  test("prefixJaccardJoin: sub-threshold overlap is filtered by the verify") {
    // docs share a 3-shingle run but J = 3/(10+10-3) ≈ 0.18 < 0.8
    val df = docsDf(Seq(
      (1L, "a b c d e one two three four five six seven", "s"),
      (2L, "a b c d e uno dos tres cuatro cinco seis siete", "s")))
    assert(Dedup.prefixJaccardJoin(df).collect().isEmpty)
  }

  test("prefixJaccardJoin is COMPLETE: equals brute-force on the corpus") {
    // the prefix cut must lose no pair vs the all-shared-pairs answer
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.shingleDocs(docs).distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .where(col("inter") / (col("n_a") + col("n_b") - col("inter")) >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref = Dedup.prefixJaccardJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pref == brute)
    assert(pref.nonEmpty) // the corpus's planted near-dups light it up
  }

  // ---- q140 containment join ----------------------------------------

  test("containmentJoin: embedded doc found in one direction only") {
    // doc 1's 2 shingles are all inside doc 2's 6 → C(1→2)=1.0; the
    // reverse is 2/6 and J = 2/6 — invisible to the symmetric join
    val df = docsDf(Seq(
      (1L, "a b c d", "s"),
      (2L, "a b c d e f g h", "s"),
      (3L, "x y z w v u t q", "s")))
    val res = Dedup.containmentJoin(df).collect()
    assert(res.length == 1)
    val r = res(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) == ((1L, 2L, 2L, 6L, 2L, 1.0)))
    assert(Dedup.prefixJaccardJoin(df).collect().isEmpty)
  }

  test("containmentJoin is COMPLETE: equals brute-force on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.shingleDocs(docs).distinct()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle")
        && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .where(col("inter") / col("n_a") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = Dedup.containmentJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == brute)
    assert(cont.nonEmpty) // planted near-dups contain each other
  }

  // ---- q144 token triangles -----------------------------------------

  test("tokenTriangles: a 3-clique closes one triangle, a path closes none") {
    val df = docsDf(Seq(
      (1L, "a b c", "s"),   // clique a-b-c → 1 triangle
      (2L, "x y", "s"), (3L, "y z", "s"))) // path x-y-z → none
    val res = TextAnalysis.tokenTriangles(df).collect()
    assert(res.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 1L), ("c", 1L)))
  }

  test("tokenTriangles on the corpus: descending census, bounded rows") {
    val res = TextAnalysis.tokenTriangles(Tables.documents(spark, sfDir)).collect()
    assert(res.nonEmpty && res.length <= 20)
    val ns = res.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(ns.forall(_ > 0))
  }

  // ---- q141 novelty score -------------------------------------------

  test("noveltyScore: first writer scores 1, verbatim recrawl scores 0") {
    val df = docsDf(Seq(
      (1L, "a b c d", "s"),      // 2 shingles, both first here → 1.0
      (2L, "a b c d", "s"),      // exact recrawl → 0.0
      (3L, "a b c new1 new2", "s"))) // shares "a b c" only → 2/3 novel
    val res = Dedup.noveltyScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(res(1L) == ((2L, 2L, 1.0)))
    assert(res(2L) == ((2L, 0L, 0.0)))
    assert(res(3L) == ((3L, 2L, 0.6667)))
  }

  test("noveltyScore on the corpus: one row per shingled doc, in [0,1]") {
    val docs = Tables.documents(spark, sfDir)
    val res = Dedup.noveltyScore(docs).collect()
    assert(res.length == docs.count())
    assert(res.forall { r =>
      val v = r.getDouble(3); v >= 0.0 && v <= 1.0 })
    // ingestion-order semantics: the first doc is all-novel
    assert(res.head.getDouble(3) == 1.0)
  }

  // ---- q152 hybrid RRF retrieval ------------------------------------

  test("hybridRrfTopK: rrf recomputes from ranks; ordering follows rrf") {
    val res = TextAnalysis.hybridRrfTopK(
      Tables.documents(spark, sfDir), kEach = 20, kOut = 10).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val lexTerm = if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getInt(3))
      val denTerm = if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4))
      val expect = BigDecimal(lexTerm + denTerm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"rrf mismatch on $r")
      // every fused row came from at least one ranker's top-k
      assert(!r.isNullAt(3) || !r.isNullAt(4))
    }
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to sorted.length))
      val s = sorted.map(_.getDouble(2))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hybridRrfTopK: a doc mid-ranked by BOTH rankers beats one-ranker tops") {
    // RRF's defining property. doc 1 shares a term with q0 in both the
    // lexical and hashed-dense space (identical text ⇒ identical
    // hashed vector direction ⇒ top dense rank AND top bm25 rank);
    // docs with disjoint vocabulary can chart on at most one list.
    val df = docsDf(Seq(
      (0L, "alpha beta", "s"),
      (1L, "alpha beta", "s"),       // identical to the query: top of both
      (2L, "alpha gamma delta", "s"), // lexical overlap only (partial)
      (3L, "zeta eta theta", "s")))   // no overlap: dense-bucket luck only
    val r0 = TextAnalysis.hybridRrfTopK(df, nQueries = 1, kEach = 3,
      kOut = 4).collect().filter(_.getLong(0) == 0L)
    assert(r0.head.getLong(1) == 1L) // the both-lists doc wins the fusion
  }

  // ---- q184 sorted-neighborhood dedup --------------------------------

  test("snmNearDups: prefix-sorted neighbors pair; the reversed pass catches suffix twins") {
    // docs 1/2 share a 24+-char normalized prefix (neighbors in pass 1);
    // docs 3/4 diverge at the FRONT but share their tail — only the
    // reversed-key pass can put them side by side. doc 5 is unrelated.
    val commonHead = "the quick brown fox jumps over the lazy dog again and again"
    val commonTail = "terms and conditions apply see store for details today"
    val df = docsDf(Seq(
      (1L, commonHead + " version one", "s"),
      (2L, commonHead + " version two", "s"),
      (3L, "alpha " + commonTail, "s"),
      (4L, "omega " + commonTail, "s"),
      (5L, "completely unrelated content with nothing shared at all", "s")))
    val res = Dedup.snmNearDups(df, threshold = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(res.contains((1L, 2L)), res.toSeq)
    assert(res.contains((3L, 4L)), res.toSeq)
    assert(!res.exists { case (a, b) => a == 5L || b == 5L }, res.toSeq)
  }

  test("snmNearDups on the corpus: agrees with LSH verify on shared pairs") {
    val docs = Tables.documents(spark, sfDir)
    val snm = Dedup.snmNearDups(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(snm.nonEmpty, "corpus near-dups must surface")
    // same verify, same threshold ⇒ identical jaccard wherever both
    // blockers surface a pair
    val lsh = Dedup.nearDupPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val common = snm.keySet.intersect(lsh.keySet)
    assert(common.nonEmpty)
    common.foreach(k => assert(snm(k) == lsh(k), s"verify diverged on $k"))
  }

  // ---- q183 longest shared run ---------------------------------------

  test("GramHashGenerator emits exactly the composable positional gram hashes") {
    val texts = Seq("", "a b", "a b c",
      (0 until 80).map(i => s"tok${(i * 37) % 91}").mkString(" "))
    val df = docsDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") })
    val native = df.select(col("doc_id"),
        graft.functions.GramHashGenerator.gramHashes(col("text"), 3)
          .as(Seq("pos", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val tk = split(col("text"), " ")
    val composable = df.filter(size(tk) >= 3)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(tk) - 3),
          i => array_join(slice(tk, i + 1, lit(3)), " ")))
          .as(Seq("pos", "shingle")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(native.toSeq == composable.toSeq)
  }

  test("sharedRunLengths: one-token edit splits the run at the edit site") {
    // doc2 = doc1 with token 15 replaced: grams 13/14/15 break, so the
    // shared diagonal splits into runs of 13 grams (pos 0–12) and 2
    // grams (pos 16–17) → max run 13 grams = 15 tokens. The docs are
    // 17/18-gram near-dups, so LSH banding must surface the pair.
    val t1 = (0 until 20).map(i => s"a$i")
    val t2 = t1.updated(15, "XX")
    val df = docsDf(Seq((1L, t1.mkString(" "), "s"),
      (2L, t2.mkString(" "), "s")))
    val res = Dedup.sharedRunLengths(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(res.toSeq == Seq((1L, 2L, 13, 15)), res.toSeq)
  }

  test("sharedRunLengths on the corpus: subset of LSH candidates, sane bounds") {
    val docs = Tables.documents(spark, sfDir)
    val res = Dedup.sharedRunLengths(docs).collect()
    assert(res.nonEmpty)
    val cand = Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    res.foreach { r =>
      assert(cand.contains((r.getLong(0), r.getLong(1))))
      assert(r.getInt(2) >= 1 && r.getInt(3) == r.getInt(2) + 2)
    }
  }

  // ---- q181 content-defined chunking ---------------------------------

  test("cdcChunkShare: boundaries follow content — front-insertion keeps tail chunks") {
    // deterministic 100-token text: ~12 expected boundaries at D=8.
    // Prepending a token shifts every OFFSET but no trigram content,
    // so every chunk of doc 1 after its first boundary re-appears
    // verbatim in doc 2 — the CDC property fixed-size chunking lacks.
    val base = (0 until 100).map(i => s"tok${(i * 37) % 91}").mkString(" ")
    val df = docsDf(Seq(
      (1L, base, "s"),
      (2L, "zzz " + base, "s"),
      (3L, "aa bb", "s"))) // sub-trigram doc: exactly one chunk, unshared
    val res = Dedup.cdcChunkShare(df).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val (n1, s1) = res(1L)
    assert(n1 > 1, "fixture text must contain at least one CDC boundary")
    assert(s1 >= n1 - 1, s"tail chunks must survive the front edit: $res")
    assert(res(3L) == ((1, 0L)))
  }

  test("ChunkGenerator emits exactly the composable HOF chunker's rows") {
    // the native generator replaced the expression pipeline for speed;
    // this pins bit-identical semantics (boundary rule, idx order,
    // chunk text) across short/empty/long inputs
    val texts = Seq(
      "", "one", "aa bb", "a b c",
      (0 until 150).map(i => s"tok${(i * 37) % 91}").mkString(" "),
      (0 until 40).map(i => s"w${(i * 11) % 7}").mkString(" ")) // repeats
    val df = docsDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") })
    val native = df.select(col("doc_id"),
        graft.functions.ChunkGenerator.cdcChunks(col("text"), 3, 8)
          .as(Seq("chunk_idx", "chunk_text")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val tk = split(col("text"), " ")
    val gramHash = (i: org.apache.spark.sql.Column) =>
      conv(substring(md5(array_join(slice(tk, i + 1, lit(3)), " ")), 1, 15),
        16, 10).cast("long")
    val interior = when(size(tk) > 3,
      filter(sequence(lit(1), size(tk) - 3), i => gramHash(i) % 8 === 0))
      .otherwise(array().cast("array<int>"))
    val composable = df
      .select(col("doc_id"), tk.as("tk"),
        concat(array(lit(0)), interior).as("starts"))
      .withColumn("chunks", transform(col("starts"), (s, k) =>
        array_join(slice(col("tk"), s + 1,
          coalesce(try_element_at(col("starts"), k + lit(2)),
            size(col("tk"))) - s), " ")))
      .select(col("doc_id"),
        posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_text")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(native.toSeq == composable.toSeq)
  }

  test("cdcChunkShare: identical docs share every chunk") {
    val text = (0 until 60).map(i => s"w${(i * 11) % 37}").mkString(" ")
    val res = Dedup.cdcChunkShare(docsDf(Seq(
      (1L, text, "s"), (2L, text, "s")))).collect()
    res.foreach(r => assert(r.getLong(2) == r.getInt(1).toLong
      && r.getDouble(3) == 1.0, r))
  }

  test("cdcChunkShare on the corpus: fractions bounded, chunk counts positive") {
    val res = Dedup.cdcChunkShare(Tables.documents(spark, sfDir)).collect()
    assert(res.length == 500)
    res.foreach { r =>
      assert(r.getInt(1) >= 1 && r.getLong(2) <= r.getInt(1).toLong)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  // ---- q176 MOSS winnowing fingerprints ------------------------------

  test("WinnowGenerator emits exactly the composable window-min selection") {
    val texts = Seq(
      "", "a b c", "a b c d e f",
      (0 until 120).map(i => s"tok${(i * 37) % 91}").mkString(" "),
      (0 until 40).map(i => s"w${(i * 11) % 7}").mkString(" ")) // repeats
    val df = docsDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") })
    val native = df.select(col("doc_id"),
        graft.functions.WinnowGenerator.winnowed(col("text"), 3, 4).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val tk = split(col("text"), " ")
    val composable = df.filter(size(tk) >= 3)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(tk) - 3),
          i => array_join(slice(tk, i + 1, lit(3)), " ")))
          .as(Seq("pos", "shingle")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("shingle")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select(col("doc_id"), col("pos"),
        min(col("h")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 0)).as("fp"))
      .filter(col("pos") >= 3)
      .select("doc_id", "fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.toSeq == composable.toSeq)
  }

  test("winnowedPairs: a shared (n+w-1)-token run guarantees a match; disjoint docs never pair") {
    // n=3, w=4 → the winnowing guarantee threshold is 6 shared tokens:
    // the run spans w=4 consecutive trigrams, some complete window
    // lies fully inside it in BOTH docs, and that window's min is the
    // same hash — selected on both sides by construction.
    val run = "alpha beta gamma delta epsilon zeta"
    val df = docsDf(Seq(
      (1L, s"one two $run three four five six seven", "s"),
      (2L, s"$run eight nine ten eleven twelve thirteen", "s"),
      (3L, "completely different words entirely unrelated tokens here now more", "s")))
    val pairs = Dedup.winnowedPairs(df, minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), pairs.toSeq)
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }, pairs.toSeq)
  }

  test("winnowedPairs: identical docs share everything; sub-window docs contribute nothing") {
    // 12 tokens → 10 trigrams → 7 complete w=4 windows (1–7 distinct
    // minima); doc 3 has 5 tokens → 3 trigrams < w → zero complete
    // windows, so it can never appear in ANY pair.
    val text = "a b c d e f g h i j k l"
    val df = docsDf(Seq((1L, text, "s"), (2L, text, "s"), (3L, "a b c d e", "s")))
    val pairs = Dedup.winnowedPairs(df, minShared = 1).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    val shared = pairs.head.getLong(2)
    assert(shared >= 1L && shared <= 7L, shared)
  }

  test("winnowedPairs on the corpus: ordered ids, threshold respected, dup signal present") {
    val res = Dedup.winnowedPairs(Tables.documents(spark, sfDir)).collect()
    assert(res.nonEmpty, "the testdata corpus contains planted near-dups")
    res.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2L)
    }
  }

  // ---- q237 retrieval-quality rank metrics ---------------------------

  test("retrievalQuality: a lone perfect hit at rank 1 scores rr = ndcg = 1") {
    // q0's ONLY relevant doc is its near-verbatim copy doc1 (shares 8
    // distinct 3-shingles → rel 2); doc2 shares 5 TERMS but never an
    // adjacent triple (rel 0), so n_rel = n2 = 1 and IDCG = 3·w(1).
    // Both arms must put doc1 first (it contains every query term /
    // nearly the full hashed vector), making DCG = IDCG exactly.
    val df = docsDf(Seq(
      (0L, "a b c d e f g h i j", "s"),
      (1L, "a b c d e f g h i j pad1", "s"),
      (2L, "a x1 c y1 e z1 g w1 i v1", "s"),
      (3L, "m1 m2 m3 m4 m5 m6 m7 m8", "s"),
      (4L, "n1 n2 n3 n4 n5 n6 n7 n8", "s")))
    val r = TextAnalysis.retrievalQuality(df, nQueries = 1).collect()
    assert(r.length == 2, s"one query x two arms: ${r.toSeq}")
    r.foreach { row =>
      assert(row.getLong(2) == 1L, s"n_rel: $row")
      assert(row.getInt(3) == 1, s"first_rel_rank: $row")
      assert(row.getDouble(4) == 1.0, s"rr: $row")
      assert(row.getLong(5) == 3000000000L, s"dcg_s: $row")
      assert(row.getDouble(6) == 1.0, s"ndcg: $row")
    }
  }

  test("retrievalQuality on the corpus: 16 rows, metrics inside their bounds") {
    val res = TextAnalysis.retrievalQuality(Tables.documents(spark, sfDir)).collect()
    assert(res.length == 16)
    assert(res.map(r => (r.getLong(0), r.getString(1))).distinct.length == 16)
    res.foreach { r =>
      val (first, rr, ndcg) = (r.getInt(3), r.getDouble(4), r.getDouble(6))
      assert(first >= 0 && first <= 10, s"rank out of depth: $r")
      assert(rr >= 0.0 && rr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0, s"$r")
      // rr and the first-relevant rank agree: both zero or 1/first
      if (first == 0) assert(rr == 0.0 && r.getLong(5) == 0L, s"$r")
      else assert(math.abs(rr - math.floor(1e6 / first + 0.5) / 1e6) < 1e-12)
      // a retrieved relevant doc implies relevant docs exist
      if (first > 0) assert(r.getLong(2) > 0, s"$r")
    }
  }

  // ---- q213 rank-biased overlap -------------------------------------

  test("rboRankings: per-query RBO stays inside the suffix-weight envelope") {
    // C = lcm(1..10)·2^10; each overlapping doc contributes between
    // W(10)·C = 252 and W(1)·C = 1788440, and identical top-10 lists
    // reach exactly (C − lcm)/C = 0.999023 (1 − 2^-10, quantized).
    val res = TextAnalysis.rboRankings(Tables.documents(spark, sfDir)).collect()
    assert(res.length == 8)
    res.foreach { r =>
      val ov = r.getLong(1); val rbo = r.getDouble(2)
      assert(ov >= 0 && ov <= 10)
      assert(rbo >= ov * 252.0 / 2580480.0 - 1e-6)
      assert(rbo <= ov * 1788440.0 / 2580480.0 + 1e-6)
      assert(rbo <= 0.999023 + 1e-9)
      assert((ov == 0) == (rbo == 0.0))
    }
  }

  test("rboRankings: identical rankings score 1 - 2^-10") {
    // one query term appearing with distinct tf in 10+ docs of equal
    // length: both scorers rank by tf desc, so the lists coincide and
    // RBO_min(1/2, 10) = 0.999023 exactly. The apple-free padding
    // docs keep df < N so the tf·idf scorer's ln(N/df) is nonzero
    // (df = N would collapse ranking B to an all-tie).
    val docs = (1 to 12).map { i =>
      (i.toLong, (Seq.fill(i + 1)("apple") ++ Seq.fill(14 - i)("f" + i)).mkString(" "), "s")
    } ++ (13 to 19).map { i =>
      (i.toLong, Seq.fill(15)("pad" + i).mkString(" "), "s")
    } :+ ((0L, Seq.fill(15)("apple").mkString(" "), "s"))
    val r = TextAnalysis.rboRankings(docsDf(docs), nQueries = 1).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 10L)
    assert(r(0).getDouble(2) == 0.999023)
  }
}
