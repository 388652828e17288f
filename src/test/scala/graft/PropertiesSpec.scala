package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Projections}

/** Property-based invariants (SURVEY §5 test strategy): union
  * row-count additivity, dedup idempotence, class-weight formula,
  * money-rounding laws — checked over ScalaCheck-generated inputs
  * (sampled with fixed seeds; the scalatest-scalacheck glue artifact
  * is not in the offline cache, so sampling is driven manually).
  */
class PropertiesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("union row-count additivity: |A union-all B| = |A| + |B|") {
    val lists = samples(Gen.listOf(Gen.choose(0, 100)), 10)
    lists.sliding(2, 2).foreach {
      case Seq(a, b) =>
        assert(a.toDF("v").unionByName(b.toDF("v")).count() == a.size + b.size)
      case _ =>
    }
  }

  test("dropDuplicates is idempotent and bounded by distinct count") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 20)), 8).foreach { xs =>
      val once = xs.toDF("v").dropDuplicates("v")
      assert(once.count() == xs.distinct.size)
      assert(once.dropDuplicates("v").count() == once.count())
    }
  }

  test("moneyRound output is always an exact multiple of 0.01 within a half-cent") {
    val values = samples(Gen.choose(0.0, 1e6), 40)
    val rs = values.toDF("x")
      .select(col("x"), Projections.moneyRound(col("x")).as("r")).collect()
    rs.foreach { row =>
      val (x, r) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(r - x) <= 0.005 + 1e-9, s"x=$x r=$r")
      val cents = r * 100.0
      assert(math.abs(cents - math.rint(cents)) < 1e-6, s"x=$x r=$r")
    }
  }

  test("class weights are inversely proportional to class frequency") {
    val pairs = samples(Gen.zip(Gen.choose(1, 50), Gen.choose(1, 50)), 6)
    pairs.foreach { case (n0, n1) =>
      val df = (List.fill(n0)(0) ++ List.fill(n1)(1)).toDF("label")
      val w = graft.ml.OccupancyMl.withClassWeights(df)
        .select("label", "classWeight").distinct().collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val total = (n0 + n1).toDouble
      assert(math.abs(w(0) - total / (2.0 * n0)) < 1e-9)
      assert(math.abs(w(1) - total / (2.0 * n1)) < 1e-9)
      assert(math.abs(w(0) * n0 - w(1) * n1) < 1e-6) // balanced weighted mass
    }
  }

  test("minhash candidate pairs are reflexive-free, ordered, and duplicate-free") {
    val textsGen = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    samples(textsGen, 4).foreach { ts =>
      val df = ts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val pairs = Dedup.minhashCandidatePairs(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      pairs.foreach { case (a, b) => assert(a < b) }
      assert(pairs.distinct.length == pairs.length)
    }
  }

  test("dupNgramFraction laws on random corpora: range, duplicate saturation") {
    // random 6–12-token docs over a tiny vocabulary (so shared grams
    // actually occur), each duplicated under a second doc_id — a doc
    // sharing EVERY gram with its copy must report fraction 1.0, and
    // every fraction must lie in [0, 1]
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val textGen = Gen.choose(6, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val base = samples(textGen, 20).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = (base ++ base.map { case (i, t) => (i + 1000L, t) })
      .toDF("doc_id", "text")
    val r = Dedup.dupNgramFraction(docs).collect()
    assert(r.length == base.count(_._2.split(" ").length >= 5) * 2)
    r.foreach { row =>
      val f = row.getDouble(2)
      assert(f >= 0.0 && f <= 1.0, row)
      assert(f == 1.0, s"duplicated doc must saturate: $row")
    }
  }

  test("piiScrub is idempotent and count-consistent on adversarial random text") {
    import graft.operators.TextAnalysis
    // fragments that tile into strings straddling the pattern
    // boundaries: partial emails, dotted digit runs, dashed digits
    val frag = Gen.oneOf("a@b.co", "x@y", "1.2.3.4", "10.0.0", "555-0199",
      "12-345", "@@", "..", "user.name+x", "example.com", "--", "7",
      "t", " ")
    val textGen = Gen.listOfN(12, frag).map(_.mkString(" "))
    val docs = samples(textGen, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = TextAnalysis.piiScrub(docs)
      .select(col("doc_id"), col("clean_text"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("n"))
    val rows1 = once.collect().map(r => r.getLong(0) -> r).toMap
    // placeholder-count consistency: redactions reported = placeholder
    // tokens emitted, class by class
    TextAnalysis.piiScrub(docs).collect().foreach { r =>
      def occurrences(s: String, sub: String): Int =
        s.sliding(sub.length).count(_ == sub)
      assert(occurrences(r.getString(1), "<EMAIL>") == r.getInt(2), r)
      assert(occurrences(r.getString(1), "<IP>") == r.getInt(3), r)
      assert(occurrences(r.getString(1), "<PHONE>") == r.getInt(4), r)
    }
    // idempotence: scrubbing a scrubbed corpus changes nothing
    val twice = TextAnalysis.piiScrub(
        once.select(col("doc_id"), col("clean_text").as("text")))
      .select(col("doc_id"), col("clean_text"),
        (col("n_emails") + col("n_ips") + col("n_phones")).as("n"))
    twice.collect().foreach { r =>
      assert(r.getInt(2) == 0, s"rescrub found new PII: $r")
      assert(r.getString(1) == rows1(r.getLong(0)).getString(1),
        s"rescrub changed text: $r")
    }
  }

  test("semDedup is a fixpoint: keepers contain no within-cluster pair above τ") {
    // the keep-first-seen rule's defining guarantee — after removing
    // every condemned doc, re-running the pair scan over the SURVIVORS
    // finds nothing (τ-similar within-cluster pairs cannot both keep)
    import graft.engine.Tables
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, SparkTestSession.sfDir)
    val tau = 0.35
    val drops = Similarity.semDedup(emb, tau).collect().map(_.getLong(0)).toSet
    val cluster = Similarity.kmeans(emb).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => a(i) * b(i)).foldLeft(0.0)(_ + _)
    val kept = vecs.keys.toSeq.filterNot(drops).sorted
    for (i <- kept; j <- kept if i < j && cluster(i) == cluster(j)) {
      val cos = dot(vecs(i), vecs(j)) /
        (math.sqrt(dot(vecs(i), vecs(i))) * math.sqrt(dot(vecs(j), vecs(j))))
      assert(cos < tau, s"kept pair ($i, $j) still τ-similar: $cos")
    }
  }

  test("theilSenTrend is invariant under a constant count shift (level ignored)") {
    // slopes are differences of counts: adding c events to EVERY hour
    // must leave the slope multiset, hence the median, unchanged
    import graft.operators.RobustStats
    def events(counts: Seq[Int], base: Long) =
      counts.zipWithIndex.flatMap { case (n, h) =>
        (0 until n).map(i => (base + h * 100 + i,
          java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + h}%02d:${10 + i}%02d:00"),
          1L, "view", 1.0, "{}"))
      }
    samples(Gen.listOfN(4, Gen.choose(1, 20)), 6).foreach { counts =>
      val df0 = events(counts, 0)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val df1 = events(counts.map(_ + 7), 10000)
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val s0 = RobustStats.theilSenTrend(df0).collect()(0)
      val s1 = RobustStats.theilSenTrend(df1).collect()(0)
      assert(s0.getLong(1) == s1.getLong(1))
      assert(s0.getDouble(2) == s1.getDouble(2),
        s"slope moved under a level shift: $counts")
    }
  }

  test("burstiness is invariant under a whole-second time shift") {
    import graft.operators.EventAnalytics
    def at(sec: Long, id: Long) = (id,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704100000L + sec)),
      1L, "view", 1.0, "{}")
    samples(Gen.nonEmptyListOf(Gen.choose(1, 500)), 6)
      .filter(_.size >= 3).foreach { gaps =>
      val times = gaps.scanLeft(0L)(_ + _)
      def df(shift: Long) = times.zipWithIndex
        .map { case (t, i) => at(t + shift, i.toLong + 1) }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val a = EventAnalytics.burstiness(df(0)).collect()(0)
      val b = EventAnalytics.burstiness(df(86400)).collect()(0)
      assert(a.getLong(1) == b.getLong(1) && a.getDouble(2) == b.getDouble(2) &&
        a.getDouble(3) == b.getDouble(3) && a.getDouble(4) == b.getDouble(4))
    }
  }

  test("ewmaLastPerUser is invariant under input row order (set semantics)") {
    import graft.operators.EventAnalytics
    val rows = (1 to 20).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"),
      (i % 3 + 1).toLong, "view", i * 1.5, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val shuffled = new scala.util.Random(42).shuffle(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(7)
    val a = EventAnalytics.ewmaLastPerUser(df).collect().map(_.toSeq)
    val b = EventAnalytics.ewmaLastPerUser(shuffled).collect().map(_.toSeq)
    assert(a.sameElements(b))
  }

  test("scdHistory tiles each user's observed span: contiguous, gap-free, compacted") {
    import graft.engine.Tables
    import graft.operators.EventAnalytics
    val ev = Tables.events(spark, SparkTestSession.sfDir)
    val hist = EventAnalytics.scdHistory(ev).collect()
      .groupBy(_.getLong(0))
    val spans = ev.groupBy("user_id")
      .agg(min(unix_timestamp(col("ts"))).as("lo"), max(unix_timestamp(col("ts"))).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    hist.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      // first interval opens at the user's first event second; every
      // close meets the next open; the last interval never closes
      assert(sorted.head.getLong(3) == spans(uid)._1)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) == b.getLong(3))
        case _ => ()
      }
      assert(sorted.last.isNullAt(4))
      // all intermediate bounds stay inside the observed span
      assert(sorted.forall(r => r.getLong(3) >= spans(uid)._1 &&
        r.getLong(3) <= spans(uid)._2))
    }
  }

  test("CharGramGenerator laws: count, width, reassembly over random strings") {
    import graft.functions.CharGramGenerator.chargrams
    val texts = samples(Gen.listOfN(12,
      Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('é')))
      .map(_.mkString), 30) :+ "" :+ "a" :+ "  "
    for (n <- Seq(1, 2, 3)) {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), chargrams(col("text"), n).as("g"))
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getString(1)).toSeq).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val gs = rows.getOrElse(i.toLong, Seq.empty)
        // exactly max(len−n+1, 0) grams, each n chars, in order, and
        // adjacent grams overlap by n−1 — the sliding-window law
        assert(gs.size == math.max(t.length - n + 1, 0), s"n=$n '$t'")
        assert(gs.forall(_.length == n))
        assert(gs == (0 to t.length - n).map(j => t.substring(j, j + n)))
      }
    }
  }

  test("SignProjectGenerator laws: linearity and sign-flip symmetry on random vectors") {
    import graft.functions.SignProjectGenerator.signProject
    val vecs = samples(Gen.listOfN(8, Gen.choose(-8.0, 8.0))
      .map(_.map(x => math.rint(x * 16) / 16.0)), 20) // dyadic inputs: exact sums
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "v")
      .select(col("vec_id"), signProject(col("v"), 4, 16).as(Seq("j", "rp")))
    val rp = df.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // negating the input negates every projection (the ±1 matrix is
    // linear); dyadic inputs make the fold exact so this is EQUALITY
    val neg = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.map(-_).toArray) }
      .toDF("vec_id", "v")
      .select(col("vec_id"), signProject(col("v"), 4, 16).as(Seq("j", "rp")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    rp.foreach { case (k, x) =>
      val y = neg(k)
      assert(x == -y || (x == 0.0 && y == 0.0), s"$k: $x vs $y")
    }
    // and each projection is bounded by the L1 norm (all signs ±1)
    vecs.zipWithIndex.foreach { case (v, i) =>
      val l1 = v.map(math.abs).sum
      (0 until 4).foreach(j =>
        assert(math.abs(rp((i.toLong, j))) <= l1 + 1e-9))
    }
  }

  test("mannWhitney anti-symmetry: swapping the arms negates z and complements P(A>B)") {
    import graft.operators.RobustStats
    // with ties, 2U_A + 2U_B = 2*nA*nB exactly — so the swapped run's
    // p_superiority complements and its z negates, on ANY sample
    val valGen = Gen.listOfN(14, Gen.choose(0, 6).map(_ * 0.5))
    samples(Gen.zip(valGen, valGen), 6).foreach { case (as, bs) =>
      val rows = as.map(("view", _)) ++ bs.map(("purchase", _))
      val df = rows.zipWithIndex
        .map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
      val fwd = RobustStats.mannWhitney(df).collect().head
      val rev = RobustStats.mannWhitney(df, typeA = "purchase",
        typeB = "view").collect().head
      assert(fwd.getLong(3) + rev.getLong(3) ==
        2L * fwd.getLong(0) * fwd.getLong(1),
        s"2U_A + 2U_B must equal 2*nA*nB: $fwd vs $rev")
      assert(math.abs(fwd.getDouble(4) + rev.getDouble(4) - 1.0) <= 2e-6,
        s"effect sizes must complement: $fwd vs $rev")
      assert(math.abs(fwd.getDouble(5) + rev.getDouble(5)) <= 2e-4,
        s"z must negate: $fwd vs $rev")
    }
  }

  test("urlGateKeepers laws: keepers are a deduped subset, cap monotone in coverage") {
    import graft.operators.UrlCuration
    // random doc populations: keepers are distinct real ids, a larger
    // cap never keeps fewer, and an unbounded cap keeps one per page
    val docsGen = Gen.choose(5, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 400L), Gen.oneOf("src0", "src1", "src2"))))
    samples(docsGen, 5).foreach { rows =>
      val df = rows.distinct.map { case (id, src) =>
        (id, s"text body $id", "en", src, 20L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val k2 = UrlCuration.urlGateKeepers(df, cap = 2)
      val k8 = UrlCuration.urlGateKeepers(df, cap = 8)
      val kAll = UrlCuration.urlGateKeepers(df, cap = Int.MaxValue)
      assert(k2.count() <= k8.count() && k8.count() <= kAll.count())
      assert(kAll.join(df, Seq("doc_id"), "left_anti").count() == 0)
      assert(kAll.distinct().count() == kAll.count())
      // a doc set with no two docs on one page keeps everything
      val pages = UrlCuration.perHostCap(df, cap = 1000000).collect()
      assert(kAll.count() == pages.map(_.getLong(2)).sum)
    }
  }

  test("contaminationProvenance: padding the training side never lowers a hit count") {
    import graft.operators.TrainingData
    val base = Seq(
      (0L, "a b c d e"), (10L, "f g h i j"),
      (1L, "a b c x y"), (2L, "f g h z w"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val more = Seq((3L, "a b c d q"), (4L, "f g h i q"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def hits(df: org.apache.spark.sql.DataFrame) =
      TrainingData.contaminationProvenance(df).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val before = hits(base)
    val after = hits(base.unionByName(more))
    before.foreach { case (e, n) =>
      assert(after(e) >= n, s"eval $e lost hits after adding training docs")
    }
  }

  test("dataBudgetPlan laws: weights scale-invariant (±1 bp quantization); budget closes; epochs reconcile") {
    import graft.operators.TrainingData
    // uniform 4x token growth multiplies every sqrt(n) by exactly 2, so
    // weight ratios — hence weight_bp — are invariant up to the 1-bp
    // floor-quantization slack; allocation never exceeds the budget and
    // the epoch count is exactly alloc*1e4 div n on every row
    val srcGen = Gen.choose(2, 5).flatMap(k => Gen.listOfN(k,
      Gen.choose(1, 200)))
    samples(srcGen, 5).foreach { tokenCounts =>
      def corpus(mult: Int) = tokenCounts.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n * mult)("w").mkString(" "), "en", s"s$i", 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      def plan(mult: Int) = TrainingData.dataBudgetPlan(corpus(mult))
        .collect().map(r => r.getString(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val p1 = plan(1)
      val p4 = plan(4)
      p1.foreach { case (src, (n, w, alloc, epochs)) =>
        assert(math.abs(p4(src)._2 - w) <= 1L,
          s"$src: weight not scale-invariant: $w vs ${p4(src)._2}")
        assert(epochs == alloc * 10000L / n, s"$src: epochs reconcile")
      }
      val totalTokens = p1.values.map(_._1).sum
      assert(p1.values.map(_._3).sum <= 2L * totalTokens, "budget closes")
    }
  }
}
