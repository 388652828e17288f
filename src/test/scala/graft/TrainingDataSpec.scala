package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.TrainingData

/** Corpus-management operators: reproducible splitting, eval-set
  * decontamination, repetition quality gate (q57-q59).
  */
class TrainingDataSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val docs = Tables.documents(spark, sfDir)

  test("leakageSafeFolds: exact duplicates can never straddle a fold boundary") {
    import spark.implicits._
    // docs 1/3/5 share one text across THREE sources; docs 2/4 share
    // another — content-keyed folding must put each dup group in one
    // fold regardless of source or id
    val df = Seq(
      (1L, "same text", "en", "src0", 9L), (3L, "same text", "en", "src1", 9L),
      (5L, "same text", "en", "src2", 9L), (2L, "other words", "en", "src0", 11L),
      (4L, "other words", "en", "src1", 11L), (6L, "unique", "en", "src0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.leakageSafeFolds(df).collect()
    // reconstruct each text's fold set from the audit: a dup group in
    // k folds would make its text count toward k (fold) rows — sum of
    // n_docs per fold/source reconciles, and every per-row fold of
    // the same text must agree (checked via the raw assignment below)
    assert(res.map(_.getLong(2)).sum == 6)
    val folds = df.select(
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 5)
          .cast("int").as("fold"), col("text"))
      .distinct().collect().groupBy(_.getString(1)).view.mapValues(_.length)
    assert(folds.values.forall(_ == 1))
    // n_texts counts distinct content per cell — never exceeds n_docs
    assert(res.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("neymanSample: exact Hamilton quotas — hand-checked integer allocation") {
    import spark.implicits._
    // stratum a: n_chars {10,20} → σ = √50, w = floor(2·√50·1e6 + ½)
    //          = 14142136; b: {10,20,30} → σ = 10, w = 30000000.
    // totalN = 3: base quotas (3w) div W = 0 and 2; the one leftover
    // goes to a (larger remainder 42426408 > 1715728) → alloc a=1, b=2
    val df = Seq(
      (1L, "x", "en", "a", 10L), (2L, "x", "en", "a", 20L),
      (3L, "x", "en", "b", 10L), (4L, "x", "en", "b", 20L),
      (5L, "x", "en", "b", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.neymanSample(df, totalN = 3).collect()
    assert(res.length == 3)
    val bySource = res.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(bySource == Map("a" -> 1, "b" -> 2))
    assert(res.filter(_.getString(0) == "a").head.getLong(4) == 1L)
    assert(res.filter(_.getString(0) == "b").head.getLong(4) == 2L)
  }

  test("neymanSample: a zero-variance stratum draws nothing") {
    import spark.implicits._
    val df = (
      (1 to 10).map(i => (i.toLong, "x", "en", "flat", 100L)) ++
      (11 to 20).map(i => (i.toLong, "x", "en", "varied", (i % 5 + 1) * 50L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.neymanSample(df, totalN = 5).collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getString(0) == "varied"),
      "σ = 0 stratum must receive zero allocation under pure Neyman")
    assert(res.length == 5)
  }

  test("neymanSample on the corpus: allocations close to the budget, " +
    "more variable strata get at least proportional share") {
    val res = TrainingData.neymanSample(docs).collect()
    val allocs = res.map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(allocs.values.sum <= 100)
    // each stratum emits exactly its allocation (none is starved of docs)
    val emitted = res.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    emitted.foreach { case (s, n) => assert(n.toLong == allocs(s)) }
    assert(res.map(r => (r.getString(0), r.getLong(1))).distinct.length == res.length)
  }

  test("dsirSelect: micro-log weights replay the smoothed ratio formula exactly") {
    import spark.implicits._
    // target (id 10): "alpha alpha"; pool: doc 1 = "alpha", doc 2 =
    // "beta". With add-1 smoothing over 512 buckets:
    //   q(alpha) = floor((ln(3/514) − ln(2/514))·1e6 + ½) = floor(ln 1.5·1e6 + ½)
    //   q(beta)  = floor((ln(1/514) − ln(2/514))·1e6 + ½) = floor(−ln 2·1e6 + ½)
    // (alpha and beta hash to distinct buckets — deterministic md5)
    val df = Seq(
      (10L, "alpha alpha", "en", "s", 11L),
      (1L, "alpha", "en", "s", 5L),
      (2L, "beta", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.dsirSelect(df).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val qAlpha = math.floor((math.log(3.0 / 514) - math.log(2.0 / 514)) * 1e6 + 0.5).toLong
    val qBeta = math.floor((math.log(1.0 / 514) - math.log(2.0 / 514)) * 1e6 + 0.5).toLong
    assert(res == Map(1L -> qAlpha, 2L -> qBeta))
    assert(qAlpha > 0 && qBeta < 0, "target-like up, pool-only down")
  }

  test("dsirSelect on the corpus: top-100 pool docs, weights non-increasing") {
    val res = TrainingData.dsirSelect(docs).collect()
    assert(res.length == 100)
    assert(res.forall(_.getLong(0) % 10 != 0), "target slice never selects itself")
    val ws = res.map(_.getLong(3))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("leakageSafeFolds on the corpus: every doc assigned once, folds cover 0..4") {
    val res = TrainingData.leakageSafeFolds(docs).collect()
    assert(res.map(_.getLong(2)).sum == docs.count())
    val foldIds = res.map(_.getInt(0)).toSet
    assert(foldIds.subsetOf((0 until 5).toSet) && foldIds.size == 5)
  }

  test("weightedMedianLength: half the characters sit below the answer") {
    import spark.implicits._
    // srcA: lengths 10, 20, 70 → total 100; cum 10, 30, 100 → the
    // 2·cum ≥ 100 crossing is the 70-char doc (plain median = 20:
    // already a divergence, the big doc holds 70% of the chars)
    // srcB: 10×9 + one 910 megadoc → total 1000; the megadoc holds
    // 91% of the chars → weighted median = 910, plain median = 10 —
    // exactly the skew the char-weighted form exists to expose
    val rows =
      Seq((1L, "a", "en", "srcA", 10L), (2L, "b", "en", "srcA", 20L),
        (3L, "c", "en", "srcA", 70L)) ++
      (1 to 9).map(i => (10L + i, "d", "en", "srcB", 10L)) :+
      (20L, "e", "en", "srcB", 910L)
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.weightedMedianLength(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(res("srcA") == ((3L, 100L, 70L)))
    assert(res("srcB") == ((10L, 1000L, 910L)))
  }

  test("weightedMedianLength on the corpus: bounds and exact-half tie rule") {
    val res = TrainingData.weightedMedianLength(docs).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(2) >= r.getLong(3))
      assert(r.getLong(1) > 0)
    }
    // cross-check one source against a driver-side fold
    val one = docs.filter(col("source") === res.head.getString(0))
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val total = one.sum
    val expected = one.scanLeft(0L)(_ + _).tail.zip(one)
      .find { case (cum, _) => cum * 2 >= total }.get._2
    assert(res.head.getLong(3) == expected)
  }

  test("CorpusPipeline end-to-end: monotone stages, eval overlap dropped, shards + JSONL land") {
    import org.apache.spark.sql.types._
    val evalSet = docs.filter(col("doc_id") < 3) // verbatim corpus docs → contam 1.0
    val shardDir = java.nio.file.Files.createTempDirectory("graft-cp-shards").toString
    val jsonlDir = java.nio.file.Files.createTempDirectory("graft-cp-jsonl").toString
    val r = graft.apps.CorpusPipeline.run(docs, evalSet, shardDir, jsonlDir, nShards = 2)
    assert(r.input >= r.gated && r.gated >= r.cleaned && r.cleaned >= r.kept)
    assert(r.kept > 0, s"pipeline shipped nothing: $r")
    // the single-pass audit counters must equal the per-stage count()
    // formulation exactly (the audit is a flags-join aggregate, so a
    // join-key duplication bug would inflate these); input and gate
    // pin the two ends of the chain
    assert(r.input == docs.count(), s"audited input diverged: $r")
    assert(r.gated == graft.operators.TextAnalysis.gopherGateFilter(docs).count(),
      s"audited gate count diverged: $r")
    // the planted eval docs can never reach the training set
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val shipped = Tables.jsonl(spark, jsonlDir, schema)
    assert(shipped.filter(col("doc_id") < 3).count() == 0)
    assert(shipped.count() == r.kept) // JSONL export is the full kept set
    // shard layout exists as written
    assert(new java.io.File(shardDir).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("shard=")))
  }

  test("CorpusPipeline opt-in stages: boilerplate cut and mixture only ever shrink the set") {
    val evalSet = docs.filter(col("doc_id") < 3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-opt").toString
    val r = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards", s"$base/jsonl", nShards = 2,
      maxBoilerplate = Some(0.9), mixtureTemperature = Some(2.0))
    // both stages are filters: every stage count is monotone, and the
    // mixture stage makes shipped a strict subset contract (<= kept)
    assert(r.input >= r.gated && r.gated >= r.cleaned && r.cleaned >= r.kept)
    assert(r.shipped <= r.kept && r.shipped > 0, s"$r")
    // disabled stages are the identity: shipped == kept
    val r0 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards0", s"$base/jsonl0", nShards = 2)
    assert(r0.shipped == r0.kept)
    // PPS ship budget: shipped is exactly the budget when enough survive
    val rb = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shardsb", s"$base/jsonlb", nShards = 2, maxShipDocs = Some(50))
    assert(rb.shipped == 50, s"budget cut must ship exactly 50: $rb")
    // DSIR budget: exactly n survivors, all from the kept set
    val rd = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shardsd", s"$base/jsonld", nShards = 2, dsirTopN = Some(40))
    assert(rd.shipped == 40, s"DSIR cut must ship exactly 40: $rd")
    assert(rd.kept == r0.kept, "DSIR must not change the upstream stages")
  }

  test("cappedBudgetPlan: cap binds, excess redistributes pro rata, spill conserves the budget") {
    import spark.implicits._
    // exact Long-arithmetic reference: recompute the capped plan from
    // dataBudgetPlan's own rows and demand cell-for-cell equality
    def reference(plan: Seq[(String, Long, Long, Long)], capQ4: Long)
        : Map[String, (Long, Boolean, Long, Long, Long)] = {
      val withCap = plan.map { case (src, n, w, a) =>
        (src, n, w, a, capQ4 * n / 10000L)
      }
      val et = withCap.map { case (_, _, _, a, c) => math.max(a - c, 0L) }.sum
      val uwt = withCap.collect { case (_, _, w, a, c) if a <= c => w }.sum
      withCap.map { case (src, n, w, a, c) =>
        val capped = math.min(a, c)
        val redist =
          if (a <= c && w > 0 && uwt > 0) et * w / uwt else 0L
        val fin = math.min(capped + redist, c)
        src -> ((a, a > c, fin, fin * 10000L / n, capped + redist - fin))
      }.toMap
    }
    def check(docs: org.apache.spark.sql.DataFrame, capQ4: Long): Unit = {
      val plan = TrainingData.dataBudgetPlan(docs).collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      val want = reference(plan, capQ4)
      val got = TrainingData.cappedBudgetPlan(docs, capEpochsQ4 = capQ4).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(3), r.getBoolean(4), r.getLong(5), r.getLong(6), r.getLong(7))))
        .toMap
      assert(got == want, s"capped plan diverges from the Long reference at cap $capQ4")
      // hard laws: nobody ends over the cap, the pot never grows
      got.values.foreach { case (_, _, fin, epQ4, spill) =>
        assert(epQ4 <= capQ4 && spill >= 0, got.toString)
        assert(fin >= 0)
      }
      assert(got.values.map(_._3).sum <= plan.map(_._4).sum,
        "redistribution grew the budget")
    }
    // planted: one tiny source over-epochs under the √-flattened
    // mixture; the two large sources absorb its excess
    val fix = ((1 to 2).map(i => (i.toLong, Seq.fill(10)(s"t$i").mkString(" "), "en", "tiny", 0L)) ++
      (3 to 42).map(i => (i.toLong, Seq.fill(50)(s"a$i").mkString(" "), "en", "bigA", 0L)) ++
      (43 to 82).map(i => (i.toLong, Seq.fill(50)(s"b$i").mkString(" "), "en", "bigB", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fres = TrainingData.cappedBudgetPlan(fix).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fres("tiny").getBoolean(4), "the tiny source must hit the cap")
    assert(!fres("bigA").getBoolean(4) && !fres("bigB").getBoolean(4))
    assert(fres("bigA").getLong(5) > fres("bigA").getLong(3),
      "uncapped sources must receive redistribution")
    check(fix, 20000L)
    check(fix, 40000L)
    // corpus at the default: equivalence + at least one binding cap
    // (the sf sources straddle 2.0 epochs under budgetMult = 2)
    check(docs, 20000L)
    val corpus = TrainingData.cappedBudgetPlan(docs).collect()
    assert(corpus.exists(_.getBoolean(4)), "default cap never binds on the corpus")
    assert(corpus.exists(r => !r.getBoolean(4)), "default cap binds everywhere")
  }

  test("capSweep: every cap row equals the single-cap plan's rollup; binding shrinks and budget holds as the cap grows") {
    import spark.implicits._
    val caps = Seq(10000L, 20000L, 30000L, 40000L)
    // the law that matters: the sweep is the SAME allocation as q253
    // at each cap (catches any drift in the explode / per-cap window
    // wiring), plus the theorems the shared arithmetic guarantees
    def check(d: org.apache.spark.sql.DataFrame): Unit = {
      val tot = d.select(sum(size(split(col("text"), " "))).cast("long"))
        .head().getLong(0)
      val got = TrainingData.capSweep(d).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
      assert(got.keySet == caps.toSet)
      caps.foreach { c =>
        val rows = TrainingData.cappedBudgetPlan(d, capEpochsQ4 = c).collect()
        val want = (rows.count(_.getBoolean(4)).toLong,
          rows.map(_.getLong(7)).sum, rows.map(_.getLong(5)).sum,
          rows.map(_.getLong(6)).max)
        val (gn, gs, ga, gm, gbp) = got(c)
        assert((gn, gs, ga, gm) == want,
          s"cap $c: sweep row diverges from the single-cap plan rollup")
        assert(gm <= c, s"cap $c: a source ended over the cap")
        assert(gbp == ga * 10000L / (tot * 2L) && gbp <= 10000L,
          s"cap $c: achieved_bp inconsistent with the achieved tokens")
      }
      // cap_tokens is monotone in the cap with alloc fixed, so the
      // binding set can only shrink and the achieved budget only grow
      val ordered = caps.map(got)
      assert(ordered.map(_._1).sliding(2).forall(p => p.head >= p.last),
        "n_capped must be nonincreasing in the cap")
      assert(ordered.map(_._3).sliding(2).forall(p => p.head <= p.last),
        "achieved_tokens must be nondecreasing in the cap")
    }
    // planted: the q253 fixture — one tiny source the low caps bind
    val fix = ((1 to 2).map(i => (i.toLong, Seq.fill(10)(s"t$i").mkString(" "), "en", "tiny", 0L)) ++
      (3 to 42).map(i => (i.toLong, Seq.fill(50)(s"a$i").mkString(" "), "en", "bigA", 0L)) ++
      (43 to 82).map(i => (i.toLong, Seq.fill(50)(s"b$i").mkString(" "), "en", "bigB", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    check(fix)
    check(docs)
    // the sweep must actually discriminate on the corpus: some cap
    // binds somewhere and the top cap achieves at least as much as
    // every other (already implied by monotonicity, kept explicit)
    val corpus = TrainingData.capSweep(docs).collect()
    assert(corpus.exists(_.getLong(1) > 0L), "no cap ever binds — sweep is vacuous")
  }

  test("cappedEpochExpand: non-binding cap replays the raw expansion; a binding cap bounds every source's passes") {
    // a cap no source reaches — the capped rollup must be
    // row-identical to the uncapped q250 rollup
    val free = TrainingData.cappedEpochExpand(docs, capEpochsQ4 = 10000000L)
      .collect().map(_.toSeq).toSeq
    val raw = TrainingData.epochExpandByPlan(docs).collect().map(_.toSeq).toSeq
    assert(free == raw, "non-binding cap diverged from the raw expansion")
    // the binding default (2 epochs): no source may expand past
    // ceil(cap) passes, epochs are contiguous from 1, and every
    // full epoch replays the whole source
    val rolled = TrainingData.cappedEpochExpand(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val bySrc = rolled.groupBy(_._1)
    val plan = TrainingData.cappedBudgetPlan(docs).collect()
      .map(r => r.getString(0) -> r.getLong(6)).toMap // epochs_final_q4
    val srcDocs = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, rows) =>
      val eps = rows.map(_._2).sorted
      assert(eps.last <= 2, s"$src expanded past the 2-epoch cap: ${eps.last}")
      assert(eps.toSeq == (1 to eps.last), s"$src has non-contiguous epochs")
      val full = (plan(src) / 10000L).toInt
      rows.filter(_._2 <= full).foreach { case (_, ep, nDocs, _) =>
        assert(nDocs == srcDocs(src), s"$src full epoch $ep is not a whole pass")
      }
    }
    // the capped corpus is never larger than the raw one, and on this
    // corpus the cap actually bites somewhere (q253 spec guarantees a
    // binding source)
    val rawBySrc = TrainingData.epochExpandByPlan(docs).collect()
      .map(r => (r.getString(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val capBySrc = bySrc.view.mapValues(_.map(_._4).sum).toMap
    assert(capBySrc.exists { case (s, t) => t < rawBySrc(s) },
      "the default cap never reduced any source — vacuous on this corpus")
  }

  test("CorpusPipeline capped profile: shard manifest follows the capped expansion, no source over the cap") {
    import org.apache.spark.sql.types._
    val evalSet = docs.filter(col("doc_id") < 3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-cap").toString
    val m = 3
    val r = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards", s"$base/jsonl", nShards = 2,
      budgetMult = Some(m), capEpochsQ4 = Some(20000L))
    assert(r.shipped > 0, s"$r")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val shippedIds = Tables.jsonl(spark, s"$base/jsonl", schema).select("doc_id")
    val withSrc = shippedIds
      .join(docs.select("doc_id", "source", "text"), Seq("doc_id"))
    // the multiplier, recomputed from the CAPPED plan as the pipeline
    // derives it
    val maxRow = TrainingData.cappedBudgetPlan(withSrc, m, 20000L)
      .agg(max(expr("CAST(epochs_final_q4 div 10000 AS BIGINT)"))).head()
    val maxEpoch = (if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)) + 1L
    val mult = java.lang.Long.highestOneBit(math.max(maxEpoch, 1L)) * 4L
    val shards = spark.read.parquet(s"$base/shards")
    val manifest = shards
      .select((col("doc_id") divide mult).cast("long").as("orig"),
        (col("doc_id") % mult).cast("int").as("epoch"))
      .join(docs.select(col("doc_id").as("orig"), col("source")), Seq("orig"))
      .groupBy("source", "epoch").count()
    val want = TrainingData.cappedExpandedDocs(withSrc, m, 20000L)
      .groupBy("source", "epoch").count()
    assert(manifest.exceptAll(want).count() == 0 &&
      want.exceptAll(manifest).count() == 0,
      "shard manifest diverges from the capped expansion")
    assert(manifest.agg(max("epoch")).head().getInt(0) <= 2,
      "a shard carries an epoch past the cap")
  }

  test("mixtureDrift: hand-computed shares on a planted pair; identity snapshot drifts zero; corpus shares close") {
    import spark.implicits._
    def mk(rows: (Long, String, String)*) = rows.toSeq
      .map { case (id, t, s) => (id, t, "en", s, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val oldSnap = mk((1L, ten, "srcA"), (2L, ten, "srcA"),
      (3L, ten, "srcB"), (4L, ten, "srcB"))
    val newSnap = mk((1L, ten, "srcA"),
      (3L, ten, "srcB"), (4L, ten, "srcB"), (5L, ten, "srcB"),
      (6L, ten, "srcC"))
    val got = TrainingData.mixtureDrift(oldSnap, newSnap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // ot = 40, nt = 50; srcC absent old -> coalesced 0
    assert(got.toSeq == Seq(
      ("srcA", 20L, 10L, 5000L, 2000L, -3000L),
      ("srcB", 20L, 30L, 5000L, 6000L, 1000L),
      ("srcC", 0L, 10L, 0L, 2000L, 2000L)), got.toSeq.toString)
    // identity pair: every drift is exactly zero
    val same = TrainingData.mixtureDrift(docs, docs).collect()
    assert(same.forall(_.getLong(5) == 0L), "identical snapshots must not drift")
    // corpus laws: shares fill the bp grid up to floor loss, drift sums
    // to the difference of the two floor losses (bounded by #sources)
    val n = same.length
    Seq(3, 4).foreach { c =>
      val s = same.map(_.getLong(c)).sum
      assert(s <= 10000L && s >= 10000L - n, s"share column $c sums to $s")
    }
  }

  test("CorpusPipeline semantic decontam tier: the top-K eval-nearest docs leave the kept set; off = identity") {
    import org.apache.spark.sql.types._
    val evalSet = docs.filter(col("doc_id") < 3)
    val emb = Tables.embeddings(spark, sfDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def shippedIds(jsonlDir: String): Set[Long] =
      Tables.jsonl(spark, jsonlDir, schema).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    // baseline: embeddings tier on, no eval embeddings
    val b0 = java.nio.file.Files.createTempDirectory("graft-cp-dc0").toString
    val r0 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$b0/shards", s"$b0/jsonl", nShards = 2, embeddings = Some(emb))
    val s0 = shippedIds(s"$b0/jsonl")
    assert(s0.size == r0.shipped.toInt && s0.size > 10)
    // eval embeddings: exact copies of three SURVIVING corpus vectors
    // under fresh ids — their source docs score cosine 1.0 and must
    // head the rank-based cut
    val planted = s0.toSeq.sorted.take(3)
    val evEmb = emb.filter(col("vec_id").isin(planted: _*))
      .withColumn("vec_id", col("vec_id") + 100000L)
    val b1 = java.nio.file.Files.createTempDirectory("graft-cp-dc1").toString
    val r1 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$b1/shards", s"$b1/jsonl", nShards = 2, embeddings = Some(emb),
      evalEmbeddings = Some(evEmb), decontamTopK = 5)
    val s1 = shippedIds(s"$b1/jsonl")
    assert(r1.kept == r0.kept - 5 && s1.size == s0.size - 5,
      s"the K=5 cut must remove exactly 5 survivors (${r0.kept} -> ${r1.kept})")
    val dropped = s0 -- s1
    // the cut is exactly decontamDropIds over the baseline survivors
    val want = graft.operators.Similarity.decontamDropIds(
        emb.join(spark.createDataset(s0.toSeq)(org.apache.spark.sql.Encoders.scalaLong)
          .toDF("vec_id"), Seq("vec_id"), "left_semi"),
        evEmb, topK = 5)
      .collect().map(_.getLong(0)).toSet
    assert(dropped == want, s"dropped $dropped != queue cut $want")
    assert(planted.forall(dropped.contains),
      "a planted exact eval copy survived the decontamination cut")
    // every stage before the tier is untouched
    assert((r1.input, r1.urlKept, r1.gated, r1.cleaned) ==
      ((r0.input, r0.urlKept, r0.gated, r0.cleaned)))
  }

  test("clusterSafeSplit: cluster members share a split even when their own hashes straddle; unclustered follow their own draw") {
    import spark.implicits._
    def docBucket(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(h, 16) % 100).toInt
    }
    // find two ids whose OWN buckets land on opposite sides of a
    // 50-pct cut — the exact pair a doc-keyed split would straddle
    val a = (1L to 200L).find(docBucket(_) < 50).get
    val b = (1L to 200L).find(docBucket(_) >= 50).get
    val fixture = Seq(a, b, 999L).toDF("doc_id")
    val labels = Seq((a, math.min(a, b)), (b, math.min(a, b)))
      .toDF("doc_id", "cluster_id")
    val got = TrainingData.clusterSafeSplit(fixture, labels, testPct = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the near-dup pair shares the CLUSTER draw — no straddle possible
    assert(got(a)._2 == got(b)._2,
      s"cluster members straddled: ${got(a)} vs ${got(b)}")
    assert(got(a)._1 == math.min(a, b) && got(b)._1 == math.min(a, b))
    // the unclustered doc keys on its own id, matching the doc draw
    val expect999 = if (docBucket(999L) < 50) "test" else "train"
    assert(got(999L) == ((999L, expect999)))
    // corpus law over the REAL cascade labels: every cluster lands
    // entirely on one side
    val base = java.nio.file.Files
      .createTempDirectory("graft-css-base").toString
    val dir = graft.operators.Dedup.cascadeDir(
      spark, s"$sfDir/documents.parquet", base)
    val corpus = TrainingData.clusterSafeSplit(docs,
      graft.operators.Dedup.dupClustersCached(docs, dir))
    assert(corpus.count() == docs.count(), "split must cover every doc")
    assert(corpus.groupBy("cluster_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count() == 0,
      "a near-dup cluster straddles train/test")
  }

  test("CorpusPipeline typology decontam tier: the cut equals leakTypologyDropIds; boilerplate docs provably kept") {
    import org.apache.spark.sql.types._
    val evalSet = docs.filter(col("doc_id") < 3)
    val emb = Tables.embeddings(spark, sfDir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def shippedIds(jsonlDir: String): Set[Long] =
      Tables.jsonl(spark, jsonlDir, schema).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    // baseline: embeddings tier on, no typology cut
    val b0 = java.nio.file.Files.createTempDirectory("graft-cp-ty0").toString
    val r0 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$b0/shards", s"$b0/jsonl", nShards = 2, embeddings = Some(emb))
    val s0 = shippedIds(s"$b0/jsonl")
    // eval embeddings: exact copies of three surviving corpus vectors
    val planted = s0.toSeq.sorted.take(3)
    val evEmb = emb.filter(col("vec_id").isin(planted: _*))
      .withColumn("vec_id", col("vec_id") + 100000L)
    val b1 = java.nio.file.Files.createTempDirectory("graft-cp-ty1").toString
    val r1 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$b1/shards", s"$b1/jsonl", nShards = 2, embeddings = Some(emb),
      evalEmbeddings = Some(evEmb), decontamTopK = 5,
      typologyDecontam = true)
    val s1 = shippedIds(s"$b1/jsonl")
    val dropped = s0 -- s1
    // the cut is exactly leakTypologyDropIds over the baseline
    // survivors, scoring the SAME post-scrub text the pipeline used
    val survDocs = graft.operators.TextAnalysis
      .piiScrub(docs, ordered = false)
      .select(col("doc_id"), col("clean_text").as("text"))
      .join(spark.createDataset(s0.toSeq)(org.apache.spark.sql.Encoders.scalaLong)
        .toDF("doc_id"), Seq("doc_id"), "left_semi")
    val scrubbedEval = graft.operators.TextAnalysis
      .piiScrub(evalSet, ordered = false)
      .select(col("doc_id"), col("clean_text").as("text"))
    val embAlive = emb.join(survDocs.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val wantRows = graft.operators.Similarity.leakTypologyDropIds(
        embAlive, evEmb, survDocs, scrubbedEval, topK = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(dropped == wantRows.map(_._1).toSet,
      s"dropped $dropped != typology cut ${wantRows.map(_._1).toSet}")
    assert(r1.kept == r0.kept - dropped.size)
    // the planted exact copies are queue members and must be cut
    assert(planted.forall(dropped.contains),
      "a planted exact eval copy survived the typology cut")
    // boilerplate docs provably KEPT: every doc whose quadrant is
    // boilerplate (eval n-gram overlap, not in the queue) still ships
    val quads = graft.operators.Similarity.leakQuadrants(
        embAlive, evEmb, survDocs, scrubbedEval, topK = 5)
      .filter(col("quadrant") === "boilerplate")
      .collect().map(_.getLong(0))
    assert(quads.nonEmpty,
      "fixture produced no boilerplate doc — the kept-proof is vacuous")
    assert(quads.forall(s1.contains),
      "a boilerplate-quadrant doc was cut by the typology tier")
    // the strict policy (dropParaphrase = false — the path that
    // actually reads the n-gram flag in-run): only verbatim docs go,
    // the cut is a subset of the default policy's, and it equals the
    // operator over the baseline survivors
    val b2 = java.nio.file.Files.createTempDirectory("graft-cp-ty2").toString
    val r2 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$b2/shards", s"$b2/jsonl", nShards = 2, embeddings = Some(emb),
      evalEmbeddings = Some(evEmb), decontamTopK = 5,
      typologyDecontam = true, dropParaphrase = false)
    val dropped2 = s0 -- shippedIds(s"$b2/jsonl")
    val want2 = graft.operators.Similarity.leakTypologyDropIds(
        embAlive, evEmb, survDocs, scrubbedEval, topK = 5,
        dropParaphrase = false)
      .collect().map(_.getLong(0)).toSet
    assert(dropped2 == want2, s"strict cut $dropped2 != operator $want2")
    assert(dropped2.subsetOf(dropped),
      "the strict (verbatim-only) cut must be a subset of the default cut")
    assert(r2.kept == r0.kept - dropped2.size)
  }

  test("CorpusPipeline: evalEmbeddings without corpus embeddings fails loudly, never skips silently") {
    val evalSet = docs.filter(col("doc_id") < 3)
    val evEmb = Tables.embeddings(spark, sfDir).limit(3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-req").toString
    val ex = intercept[IllegalArgumentException] {
      graft.apps.CorpusPipeline.run(docs, evalSet,
        s"$base/shards", s"$base/jsonl", nShards = 2,
        evalEmbeddings = Some(evEmb))
    }
    assert(ex.getMessage.contains("semantic decontamination"),
      s"wrong failure: ${ex.getMessage}")
    // same hazard, other direction: the typology cut without the
    // frames it scores must fail, not silently skip
    val ex2 = intercept[IllegalArgumentException] {
      graft.apps.CorpusPipeline.run(docs, evalSet,
        s"$base/shards2", s"$base/jsonl2", nShards = 2,
        typologyDecontam = true)
    }
    assert(ex2.getMessage.contains("typologyDecontam"),
      s"wrong failure: ${ex2.getMessage}")
  }

  test("decontamDropIds minCos floor: the cut never extends past the similarity floor") {
    val emb = Tables.embeddings(spark, sfDir)
    // panel = exact copies of two corpus vectors (cosine 1.0 hits)
    val evEmb = emb.filter(col("vec_id").isin(1L, 2L))
      .withColumn("vec_id", col("vec_id") + 100000L)
    // floor-free: always exactly topK drops, however weak the tail
    val free = graft.operators.Similarity
      .decontamDropIds(emb, evEmb, topK = 10)
      .collect().map(_.getLong(0))
    assert(free.length == 10)
    // a floor above the synthetic corpus's near-orthogonal background
    // (but below 1.0) keeps only the planted exact copies droppable
    val floored = graft.operators.Similarity
      .decontamDropIds(emb, evEmb, topK = 10, minCos = Some(0.9))
      .collect().map(_.getLong(0)).toSet
    assert(floored == Set(1L, 2L),
      s"floored cut $floored != the planted exact copies")
    // an unreachable floor drops nothing — K can never force a cut
    assert(graft.operators.Similarity
      .decontamDropIds(emb, evEmb, topK = 10, minCos = Some(1.1)).count() == 0L)
  }

  test("CorpusPipeline production profile: gate→guarded dedup→budget epochs→shards; manifest pinned") {
    import org.apache.spark.sql.types._
    // the q250/q251 closed loops ON together — the composition a
    // production run ships, not just the stages: guarded canonical
    // cleaning + data-budget epoch expansion feeding the shard packer
    val evalSet = docs.filter(col("doc_id") < 3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-prod").toString
    val m = 3
    val r = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards", s"$base/jsonl", nShards = 2,
      cohesionFloorBp = Some(5000L), budgetMult = Some(m))
    assert(r.input >= r.gated && r.gated >= r.cleaned &&
      r.cleaned >= r.kept && r.shipped > 0, s"$r")
    // the JSONL export is the pre-expansion shipped set — reconstruct
    // the expansion the pipeline performed from IT, not from pipeline
    // internals, so the test pins observable behavior only
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val shippedIds = Tables.jsonl(spark, s"$base/jsonl", schema)
      .select("doc_id")
    assert(shippedIds.count() == r.shipped)
    val withSrc = shippedIds
      .join(docs.select("doc_id", "source", "text"), Seq("doc_id"))
    // the synthetic-id multiplier, recomputed exactly as the pipeline
    // derives it (power-of-two headroom over the plan's max epoch)
    val maxRow = TrainingData.dataBudgetPlan(withSrc, m)
      .agg(max(expr("CAST(epochs_q4 div 10000 AS BIGINT)"))).head()
    val maxEpoch = (if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)) + 1L
    val mult = java.lang.Long.highestOneBit(math.max(maxEpoch, 1L)) * 4L
    val expected = TrainingData.epochExpandedDocs(withSrc, m)
    val shards = spark.read.parquet(s"$base/shards")
    // id-collision freedom at the expanded budget: one shard row per
    // (doc, pass), every synthetic id unique
    assert(shards.count() == expected.count(), "shard rows != expanded (doc, pass) rows")
    assert(shards.select("doc_id").distinct().count() == shards.count(),
      "synthetic doc_ids collide")
    // the shard manifest: decode (orig, epoch) from the synthetic id
    // and pin row counts per source×epoch against the budget plan's
    // own expansion
    val manifest = shards
      .select((col("doc_id") divide mult).cast("long").as("orig"),
        (col("doc_id") % mult).cast("int").as("epoch"))
      .join(docs.select(col("doc_id").as("orig"), col("source")), Seq("orig"))
      .groupBy("source", "epoch").count()
    val want = expected.groupBy("source", "epoch").count()
    assert(manifest.exceptAll(want).count() == 0 &&
      want.exceptAll(manifest).count() == 0,
      "shard manifest diverges from the plan's source×epoch expansion")
    // every decoded original shipped, and each carries its full text
    val decoded = shards.select((col("doc_id") divide mult).cast("long").as("doc_id"))
      .distinct()
    assert(decoded.exceptAll(shippedIds).count() == 0,
      "a shard row decodes to a document that never shipped")
  }

  test("CorpusPipeline URL stage: gate runs first, report stays monotone, off = identity") {
    val evalSet = docs.filter(col("doc_id") < 3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-url").toString
    val r = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards", s"$base/jsonl", nShards = 2, urlHostCap = Some(8))
    assert(r.input >= r.urlKept && r.urlKept >= r.gated &&
      r.gated >= r.cleaned && r.cleaned >= r.kept, s"stage order violated: $r")
    assert(r.kept > 0, s"pipeline shipped nothing: $r")
    // the URL stage count is exactly the standalone gate's
    assert(r.urlKept ==
      graft.operators.UrlCuration.urlGateKeepers(docs, cap = 8).count(),
      s"audited URL count diverged: $r")
    assert(r.urlKept < r.input, "this corpus has mirrors — the gate must drop some")
    // stage off → identity: urlKept == input and downstream unchanged
    val r0 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards0", s"$base/jsonl0", nShards = 2)
    assert(r0.urlKept == r0.input, s"disabled URL stage must be identity: $r0")
  }

  test("CorpusPipeline semantic tier: semDedup drops leave the kept set, others untouched") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val evalSet = docs.filter(col("doc_id") < 3)
    val base = java.nio.file.Files.createTempDirectory("graft-cp-sem").toString
    val emb = Tables.embeddings(spark, sfDir)
    val r0 = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards0", s"$base/jsonl0", nShards = 2)
    val r = graft.apps.CorpusPipeline.run(docs, evalSet,
      s"$base/shards", s"$base/jsonl", nShards = 2, embeddings = Some(emb))
    assert(r.kept <= r0.kept, s"semantic tier grew the corpus: $r vs $r0")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val shippedIds = Tables.jsonl(spark, s"$base/jsonl", schema)
      .collect().map(_.getLong(0)).toSet
    val shipped0 = Tables.jsonl(spark, s"$base/jsonl0", schema)
      .collect().map(_.getLong(0)).toSet
    // the tier scores ONLY the lexical survivors (the no-tier shipped
    // set): a drop pair whose keeper was already removed upstream must
    // not condemn anyone — that would ship the content with no
    // representative (the chain-drop data-loss bug)
    val embAlive = emb.join(
      shipped0.toSeq.toDF("vec_id"), Seq("vec_id"), "left_semi")
    val drops = graft.operators.Similarity.semDedup(embAlive)
      .collect().map(_.getLong(0)).toSet
    assert(shippedIds.intersect(drops).isEmpty)
    // the tier removes EXACTLY the survivor-scored drop set
    assert((shipped0 -- shippedIds) == drops.intersect(shipped0))
    // chain-safety: any full-table drop whose keeper did not survive
    // the lexical cascade must itself still ship (unless condemned by
    // a SURVIVING keeper in the re-scored pass)
    val fullPairs = graft.operators.Similarity.semDedup(emb)
      .collect().map(r2 => r2.getLong(0) -> r2.getLong(1))
    val chainVictims = fullPairs.collect {
      case (drop, keeper)
        if !shipped0.contains(keeper) && shipped0.contains(drop) &&
          !drops.contains(drop) => drop
    }
    chainVictims.foreach(v => assert(shippedIds.contains(v),
      s"doc $v was chain-dropped by an already-removed keeper"))
  }

  test("deterministic split is a pure function of doc_id: stable across runs and text changes") {
    val a = TrainingData.deterministicSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val b = TrainingData.deterministicSplit(docs.withColumn("text", lit("mutated")))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(a.sameElements(b), "split must not depend on anything but doc_id")
    val bySplit = a.groupBy(_._2).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    assert(bySplit.values.sum == a.length, "every doc lands in exactly one split")
    // md5 buckets are uniform: fractions near the 80/10/10 targets
    assert(math.abs(bySplit("train") / n - 0.80) < 0.10, bySplit.toString)
    assert(math.abs(bySplit.getOrElse("val", 0) / n - 0.10) < 0.07, bySplit.toString)
    assert(math.abs(bySplit.getOrElse("test", 0) / n - 0.10) < 0.07, bySplit.toString)
  }

  test("mixture sampling is deterministic and nested: raising a weight only adds docs") {
    val f = Map("src0" -> 1.0, "src1" -> 0.5)
    val a = TrainingData.mixtureSample(docs, f).collect().map(_.getLong(0)).toSet
    val b = TrainingData.mixtureSample(docs, f).collect().map(_.getLong(0)).toSet
    assert(a == b, "same fractions must select the same documents")
    // every fully-weighted source keeps ALL its docs
    val src0Total = docs.filter(col("source") === "src0").count()
    val src0Kept = TrainingData.mixtureSample(docs, f).filter(col("source") === "src0").count()
    assert(src0Kept == src0Total)
    // nested: kept-at-0.25 ⊆ kept-at-0.5 ⊆ kept-at-1.0 for the same source
    def keptSrc1(frac: Double) = TrainingData.mixtureSample(docs, Map("src1" -> frac))
      .filter(col("source") === "src1").collect().map(_.getLong(0)).toSet
    val k25 = keptSrc1(0.25); val k50 = keptSrc1(0.5); val k100 = keptSrc1(1.0)
    assert(k25.subsetOf(k50) && k50.subsetOf(k100))
    assert(k100.size > k50.size && k50.size >= k25.size)
  }

  test("temperatureMixture: smallest group keeps all, larger groups downsample toward it") {
    val tm = TrainingData.temperatureMixture(docs).cache()
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = byLang.values.min
    val kept = tm.groupBy("lang").agg(count(lit(1)).as("kept"),
        first("keep_rate").as("rate")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // the min-count group's rate is exactly 1.0 and it keeps every doc
    val minLang = byLang.minBy(_._2)._1
    assert(kept(minLang)._2 == 1.0)
    assert(kept(minLang)._1 == byLang(minLang))
    // rates are sqrt(n_min/n): monotone decreasing in group size, and
    // the realized kept share tracks the rate (md5 buckets ≈ uniform)
    kept.foreach { case (lang, (k, rate)) =>
      assert(math.abs(rate - math.sqrt(minN.toDouble / byLang(lang))) < 1e-6)
      assert(math.abs(k.toDouble / byLang(lang) - rate) < 0.15, s"$lang kept=$k rate=$rate")
    }
    // admission is the nested md5 draw: T=2's kept set ⊆ T=1.25's
    // (higher alpha ⇒ higher rate per group ⇒ supersets, same buckets)
    val hot = TrainingData.temperatureMixture(docs, temperature = 1.25)
      .collect().map(_.getLong(0)).toSet
    val cold = tm.collect().map(_.getLong(0)).toSet
    assert(cold.subsetOf(hot))
    tm.unpersist()
  }

  test("mixture fractions are accurate: 32-bit bucket keeps requested share within 1%") {
    import spark.implicits._
    // 100k synthetic ids: binomial noise ~0.16%, so a 1% band passes a
    // uniform bucket but fails the old 16-bit formula (which kept 53.4%
    // at a requested 0.5 — the 65536 % 10000 skew)
    val big = spark.range(100000)
      .select(col("id").as("doc_id"), lit("srcX").as("source"))
    for (f <- Seq(0.25, 0.5, 0.75)) {
      val kept = TrainingData.mixtureSample(big, Map("srcX" -> f)).count()
      assert(math.abs(kept / 100000.0 - f) < 0.01,
        s"requested $f, kept ${kept / 100000.0}")
    }
  }

  test("decontamination counts planted eval overlap exactly") {
    import spark.implicits._
    // doc 10 is EVAL (10 % 10 == 0); doc 11 shares 1 of its 2 shingles
    // with it; doc 12 shares none
    val df = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma epsilon"),
      (12L, "one two three four"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.evalDecontaminate(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(!res.contains(10L), "eval docs are not themselves scored")
    assert(res(11L) == ((2L, 1L, 0.5)))
    assert(res(12L) == ((2L, 0L, 0.0)))
  }

  test("shingle width rides the frame: metadata tag, parquet roundtrip, mismatch rejected") {
    import spark.implicits._
    import graft.operators.Dedup
    val df = Seq((1L, "a b c d e", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // the tag is the width the frame was built at, and it survives the
    // materialized tier's parquet roundtrip (the contract that lets a
    // consumer validate a provided frame instead of trusting the call)
    assert(Dedup.shingleWidthOf(Dedup.shingleDocs(df, 4)) == Some(4))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shn").toString + "/sh4"
    Dedup.shingleDocs(df, 4).dropDuplicates("doc_id", "shingle")
      .write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(Dedup.shingleWidthOf(back) == Some(4))
    // a cached 3-gram frame fed into an n=4 report would read as
    // near-zero contamination — the width check fails loudly instead
    val sh3 = Dedup.shingleDocs(df, 3).dropDuplicates("doc_id", "shingle")
    intercept[IllegalArgumentException] {
      TrainingData.evalDecontaminate(df, n = 4, shingles = Some(sh3))
    }
    intercept[IllegalArgumentException] {
      TrainingData.contaminationProvenance(df, n = 4, shingles = Some(sh3))
    }
    // matched widths pass (both the tagged and the untagged=3 default)
    TrainingData.evalDecontaminate(df, n = 4, shingles = Some(back))
    val untagged = sh3.select(col("doc_id"),
      col("shingle").cast("string").as("shingle")) // cast strips metadata
    assert(Dedup.shingleWidthOf(untagged).isEmpty)
    TrainingData.evalDecontaminate(df, n = 3, shingles = Some(untagged))
    // an untagged frame at n≠3 is rejected with an UNKNOWN-width
    // message (ADVICE r17): the validator must not claim the frame
    // "was built at 3" when it cannot know — only that it cannot be
    // verified at the requested width
    val e = intercept[IllegalArgumentException] {
      TrainingData.evalDecontaminate(df, n = 4, shingles = Some(untagged))
    }
    assert(e.getMessage.contains("no shingle_n tag"), e.getMessage)
    assert(!e.getMessage.contains("built at n=3"), e.getMessage)
  }

  test("contaminationProvenance: worst offender, compromise count, zero-hit row") {
    import spark.implicits._
    // eval doc 0: "a b c d e" → 3 distinct shingles. Training doc 1 is
    // a verbatim copy (3/3 = ratio 1.0, compromised), doc 2 shares
    // exactly one shingle "a b c" (1/3 = 0.3333), doc 3 is disjoint.
    // Eval doc 10 ("p q r s") shares nothing → the zero-hit row.
    val df = Seq(
      (0L, "a b c d e"), (10L, "p q r s"),
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "m n o u v"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.contaminationProvenance(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(res.keySet == Set(0L, 10L), s"one row per eval doc: $res")
    assert(res(0L) == ((3L, 2L, 1L, 1L, 1.0)), s"eval 0: ${res(0L)}")
    assert(res(10L) == ((2L, 0L, 0L, -1L, 0.0)), s"zero-hit eval: ${res(10L)}")
    // tie on ratio → smallest doc_id wins: two verbatim copies
    val tie = Seq((0L, "a b c d e"), (7L, "a b c d e"), (4L, "a b c d e"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t0 = TrainingData.contaminationProvenance(tie).collect().head
    assert(t0.getLong(4) == 4L, s"tie must go to the smallest doc_id: $t0")
  }

  test("contaminationProvenance on the corpus: reconciles with evalDecontaminate") {
    // the two directions describe the SAME overlap frame: a training
    // doc with n_overlap > 0 hits at least one eval doc, so the total
    // hit-pair count seen from the eval side is bounded below by the
    // number of contaminated training docs
    val res = TrainingData.contaminationProvenance(docs).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(3) <= r.getLong(2), s"compromised <= hits: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"$r")
      assert((r.getLong(2) == 0L) == (r.getLong(4) == -1L), s"$r")
    }
    val evalHitPairs = res.map(_.getLong(2)).sum
    val contaminatedTrain = TrainingData.evalDecontaminate(docs)
      .filter(col("n_overlap") > 0).count()
    assert(evalHitPairs >= contaminatedTrain,
      s"pair count $evalHitPairs < contaminated train docs $contaminatedTrain")
  }

  test("decontamination: explicit eval corpus, broadcast and shuffle paths agree") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) = rows
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // explicit eval corpus: no %10 stand-in — doc 10 is TRAIN here and
    // gets scored against the external benchmark text
    val train = mk(Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "alpha beta gamma epsilon"),
      (12L, "one two three four")))
    val eval_ = mk(Seq((99L, "alpha beta gamma")))
    def run(bc: Boolean) =
      TrainingData.evalDecontaminate(train, evalDocs = Some(eval_), broadcastVocab = bc)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val shuffled = run(bc = false)
    val hinted = run(bc = true)
    assert(shuffled.sameElements(hinted), "join strategy must not change results")
    val byId = shuffled.map(r => r._1 -> r).toMap
    assert(byId(10L) == ((10L, 2L, 1L, 0.5)), "1 of doc 10's 2 shingles is in the eval vocab")
    assert(byId(11L) == ((11L, 2L, 1L, 0.5)))
    assert(byId(12L) == ((12L, 2L, 0L, 0.0)))
    // the default (%10 stand-in) path also matches its hinted twin
    val docsSf = docs
    val defShuffled = TrainingData.evalDecontaminate(docsSf).collect().map(_.toString)
    val defHinted = TrainingData.evalDecontaminate(docsSf, broadcastVocab = true)
      .collect().map(_.toString)
    assert(defShuffled.sameElements(defHinted))
  }

  test("shardAssign is a deterministic dense layout per shard") {
    val a = TrainingData.shardAssign(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = TrainingData.shardAssign(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sameElements(b), "layout must be a pure function of doc ids")
    // positions are dense 1..n within each shard, every doc placed once
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    assert(a.map(_._1).distinct.length == a.length)
  }

  test("sequencePack: contiguous offsets, packs filled to the token budget") {
    val rows = TrainingData.sequencePack(docs, seqLen = 256).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4)))
    // per shard: offsets are the running token sum (no gaps, no overlap)
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      val ordered = shardRows.sortBy(_._4)
      ordered.foldLeft(0L) { case (expectedStart, (_, _, n, start, pack)) =>
        assert(start == expectedStart, s"gap at offset $start, expected $expectedStart")
        assert(pack == (start / 256).toInt)
        start + n
      }
    }
    // packing wastes no token budget: every pack except a shard's last
    // STARTS within seqLen of the previous one (docs span boundaries
    // rather than leaving padding holes)
    val n = rows.length
    assert(n == docs.count())
  }

  test("sourceCap keeps exactly min(k, source size) docs via the heap operator") {
    val capped = TrainingData.sourceCap(docs, k = 50)
    capped.collect()
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"must run on the custom operator:\n$plan")
    val perSource = capped.collect().map(_.getString(1))
      .groupBy(identity).view.mapValues(_.length).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, n) =>
      assert(perSource(src) == math.min(50L, n), s"$src: ${perSource(src)} vs $n")
    }
    // rerun-stable: same kept set
    val again = TrainingData.sourceCap(docs, k = 50).collect().map(_.getLong(0)).toSet
    assert(again == capped.collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudget shares sum to 1 and counts every doc") {
    val rows = TrainingData.tokenBudget(docs).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 0.01, s"shares sum to $shareSum")
  }

  test("dataBudgetPlan: hand-computed integer plan; flattening over-epochs the tiny source") {
    import spark.implicits._
    // token counts 100 / 400 / 4 → r = ⌊√n·1e6+½⌋ = 10e6 / 20e6 / 2e6,
    // Σr = 32e6, budget = 2·504 = 1008:
    //   weights  3125 / 6250 / 625 bp
    //   alloc    1008·w div 1e4 = 315 / 630 / 63
    //   epochs   315e4/100 = 31500; 630e4/400 = 15750; 63e4/4 = 157500
    // — only the 4-token source crosses the 4-epoch line: flattening
    // turned its share into 15.75 epochs of repetition
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src, 0L)
    val df = Seq(doc(1, "a", 100), doc(2, "b", 400), doc(3, "c", 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TrainingData.dataBudgetPlan(df).collect()
      .map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5), x.getBoolean(6)))).toMap
    assert(r("a") == ((100L, 3125L, 315L, 31500L, false)), r("a").toString)
    assert(r("b") == ((400L, 6250L, 630L, 15750L, false)), r("b").toString)
    assert(r("c") == ((4L, 625L, 63L, 157500L, true)), r("c").toString)
  }

  test("dataBudgetPlan on the corpus: weights and allocation close within rounding") {
    val rows = TrainingData.dataBudgetPlan(docs).collect()
    val nSources = rows.length
    val totalTokens = rows.map(_.getLong(2)).sum
    // weights sum to 10000 less at most one floor unit per source
    val wSum = rows.map(_.getLong(3)).sum
    assert(wSum <= 10000L && wSum > 10000L - nSources, s"wSum=$wSum")
    // allocation never exceeds the budget; epochs flag is consistent
    assert(rows.map(_.getLong(4)).sum <= 2L * totalTokens)
    rows.foreach { x =>
      assert(x.getBoolean(6) == (x.getLong(5) > 40000L), x.toString)
      assert(x.getLong(4) >= 0L && x.getLong(5) >= 0L)
    }
  }

  test("epochExpandByPlan: full epochs replay the whole source; the fractional epoch stays inside the remainder's source") {
    // q250 consumes q247's plan: for each source the rollup must show
    // epochs 1..full carrying EXACTLY the source's full doc/token
    // counts, and at most ONE extra (fractional) epoch carrying a
    // strict subset
    val plan = TrainingData.dataBudgetPlan(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(5))))
      .toMap
    val res = TrainingData.epochExpandByPlan(docs).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    plan.foreach { case (src, (nDocs, nTokens, epochsQ4)) =>
      val full = (epochsQ4 / 10000L).toInt
      (1 to full).foreach { ep =>
        assert(res((src, ep)) == ((nDocs, nTokens)),
          s"$src epoch $ep must replay the whole source")
      }
      val frac = res.get((src, full + 1))
      frac.foreach { case (d, t) =>
        assert(d >= 1L && d <= nDocs && t >= 1L && t <= nTokens,
          s"$src fractional epoch out of range: $d docs / $t tokens")
      }
      // no epoch beyond full+1 can exist
      assert(!res.contains((src, full + 2)), s"$src over-expanded")
      // realized tokens bracket the allocation: at least the full
      // passes, at most one more whole source
      val realized = (1 to full + 1).flatMap(ep => res.get((src, ep))).map(_._2).sum
      assert(realized >= full * nTokens && realized <= (full + 1) * nTokens)
    }
    // nothing outside the plan's sources appears
    assert(res.keySet.map(_._1) subsetOf plan.keySet)
  }

  test("epochExpandByPlan fixture: hand-computed full-epoch counts") {
    import spark.implicits._
    // the q247 fixture: epochs_q4 = 31500 / 15750 / 157500 → full
    // passes 3 / 1 / 15
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", src, 0L)
    val df = Seq(doc(1, "a", 100), doc(2, "b", 400), doc(3, "c", 4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.epochExpandByPlan(df).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    (1 to 3).foreach(ep => assert(res((("a"), ep)) == ((1L, 100L))))
    assert(res((("b"), 1)) == ((1L, 400L)))
    (1 to 15).foreach(ep => assert(res((("c"), ep)) == ((1L, 4L))))
    // single-doc sources: the fractional epoch either admits the one
    // doc whole or not at all
    res.foreach { case ((_, _), (d, _)) => assert(d == 1L) }
  }

  test("compact rewrites a fragmented parquet directory to size-targeted files") {
    val frag = java.nio.file.Files.createTempDirectory("graft-frag").toString
    // 64 tiny files — the post-ingest shape compaction exists to fix
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val (inFiles, outFiles) = graft.engine.ParquetSink.compact(spark, frag, out,
      targetFileBytes = 1L << 20)
    assert(inFiles == 64)
    assert(outFiles < 8, s"expected a handful of ~1MB files, got $outFiles")
    // lossless: same rows, any order
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(out)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // in-place rewrite would destroy the input mid-scan, and a nested
    // outDir would duplicate every row on later reads: both rejected
    intercept[IllegalArgumentException] {
      graft.engine.ParquetSink.compact(spark, frag, frag)
    }
    intercept[IllegalArgumentException] {
      graft.engine.ParquetSink.compact(spark, frag, frag + "/compacted")
    }
  }

  test("training shards land one ordered file per shard directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    graft.engine.ParquetSink.writeTrainingShards(docs, dir, nShards = 4)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: one file per shard, got ${parts.length}")
    }
    // physical row order within a shard file is the packing order
    val one = spark.read.parquet(shardDirs.head.getAbsolutePath)
      .select("start_offset").collect().map(_.getLong(0))
    assert(one.sameElements(one.sorted), "rows must stream in pack-offset order")
    // layout is complete: every document appears exactly once
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("repetition ratio: hand-computed on a looping document") {
    import spark.implicits._
    // "a b a b a b" → shingles (a b a),(b a b),(a b a),(b a b): 4 total,
    // 2 distinct → ratio 0.5; a no-repeat doc scores 0
    val df = Seq((1L, "a b a b a b"), (2L, "w x y z"))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val res = TrainingData.repetitionRatio(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(res(1L) == ((4L, 2L, 0.5)))
    assert(res(2L) == ((2L, 2L, 0.0)))
  }

  test("ppsSample: fixed size, sorted priorities, and a length-biased draw") {
    val s = TrainingData.ppsSample(docs, n = 200).cache()
    assert(s.count() == 200)
    // rk follows the (priority, doc_id) order with no gaps
    val rows = s.orderBy("rk").collect()
    assert(rows.map(_.getInt(0)).sameElements(1 to 200))
    // rounded priorities can merge near-equal neighbors, so the
    // collected column is only guaranteed non-decreasing
    assert(rows.sliding(2).forall {
      case Array(a, b) => a.getDouble(4) <= b.getDouble(4)
      case _ => true
    })
    // PPS property: inclusion ∝ n_chars, so the sample over-represents
    // long documents relative to the corpus mean
    val sampleMean = s.agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"PPS should favor long docs: sample $sampleMean vs corpus $corpusMean")
    s.unpersist()
  }

  test("ppsSample is rerun-stable: identical selection across two invocations") {
    val a = TrainingData.ppsSample(docs, n = 200).select("doc_id")
    val b = TrainingData.ppsSample(docs, n = 200).select("doc_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("snapshotDiff: hand-built added/removed/changed/unchanged quartet") {
    import spark.implicits._
    val oldS = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("doc_id", "text")
    val newS = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val d = TrainingData.snapshotDiff(oldS, newS).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff on the corpus stand-in: statuses match the residue rules") {
    val oldSnap = docs.filter(col("doc_id") % 11 =!= 3)
    val newSnap = docs.filter(col("doc_id") % 11 =!= 0)
      .withColumn("text", when(col("doc_id") % 13 === 0,
        concat(col("text"), lit(" (rev2)"))).otherwise(col("text")))
    val d = TrainingData.snapshotDiff(oldSnap, newSnap).cache()
    assert(d.filter(col("status") === "added")
      .filter(col("doc_id") % 11 =!= 3).count() == 0)
    assert(d.filter(col("status") === "removed")
      .filter(col("doc_id") % 11 =!= 0).count() == 0)
    assert(d.filter(col("status") === "changed")
      .filter(col("doc_id") % 13 =!= 0).count() == 0)
    // every edited doc present in both snapshots is reported changed
    val expectedChanged = docs.filter(col("doc_id") % 13 === 0)
      .filter(col("doc_id") % 11 =!= 0).filter(col("doc_id") % 11 =!= 3).count()
    assert(d.filter(col("status") === "changed").count() == expectedChanged)
    d.unpersist()
  }

  test("epochExpand: per-doc repeats follow the factor, epochs are 1..n_rep") {
    val e = TrainingData.epochExpand(docs).cache()
    val perDoc = e.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("max_e"), min("epoch").as("min_e"))
      .cache()
    // epochs are a dense 1..n_rep sequence
    assert(perDoc.filter(col("min_e") =!= 1 || col("max_e") =!= col("n")).count() == 0)
    // integer-factor source: exactly 1 copy each
    assert(perDoc.filter(col("source") === "src1")
      .filter(col("n") =!= 1).count() == 0)
    // fractional factors: floor(f) or floor(f)+1 copies only
    assert(perDoc.filter(col("source") === "src0")
      .filter(col("n") =!= 2 && col("n") =!= 3).count() == 0)
    // aggregate rate approaches the factor (md5 admission ≈ uniform)
    val src0Docs = docs.filter(col("source") === "src0").count().toDouble
    val src0Rows = e.filter(col("source") === "src0").count().toDouble
    assert(math.abs(src0Rows / src0Docs - 2.5) < 0.1,
      s"src0 expansion ${src0Rows / src0Docs} should be ≈2.5")
    perDoc.unpersist(); e.unpersist()
  }

  // ---- q151 corpus health report -------------------------------------

  test("corpusReport: hand-computed dashboard, dups counted corpus-wide") {
    import spark.implicits._
    // src0: "x" twice + "y" once (en, en, de); src1: "x" once (fr) —
    // "x" has 3 copies CORPUS-wide, so src1's single doc is a dup too
    val df = Seq(
      (1L, "x", "en", "src0", 1L), (2L, "x", "en", "src0", 1L),
      (3L, "y", "de", "src0", 3L),
      (4L, "x", "fr", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TrainingData.corpusReport(df).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4), x.getLong(5), x.getDouble(6)))).toMap
    assert(r("src0") == ((3L, 2L, 5L, 1.0, 2L, 0.6667)))
    assert(r("src1") == ((1L, 1L, 1L, 1.0, 1L, 1.0)))
  }

  test("corpusReport on the corpus: totals conserved, fractions in range") {
    val r = TrainingData.corpusReport(docs).collect()
    assert(r.map(_.getLong(1)).sum == docs.count())
    val totalChars = docs.agg(sum("n_chars")).head().getLong(0)
    assert(r.map(_.getLong(3)).sum == totalChars)
    r.foreach { x =>
      assert(x.getDouble(6) >= 0 && x.getDouble(6) <= 1)
      assert(x.getLong(5) <= x.getLong(1))
    }
  }

  // ---- q226 packing sweep --------------------------------------------

  test("packingSweep: uniform 60-token docs pack order-independently") {
    import spark.implicits._
    // 10 docs × 60 tokens, one shard: L=128 fits 2/pack → 5 packs
    // (waste 40/640), L=256 fits 4 → 3 packs, L=512 fits 8 → 2,
    // L=1024 → 1; equal sizes make the greedy independent of the
    // md5 visit order, so the exact pack counts are forced.
    val text = Seq.fill(60)("w").mkString(" ")
    val docs = (1 to 10).map(i => (i.toLong, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TrainingData.packingSweep(docs, nShards = 1).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(128) == ((5L, 600L, 0.0625)))
    assert(r(256) == ((3L, 600L, 0.2188)))
    assert(r(512) == ((2L, 600L, 0.4141)))
    assert(r(1024) == ((1L, 600L, 0.4141)))
  }

  test("packingSweep on the corpus: waste bounded, used tokens monotone in L") {
    val r = TrainingData.packingSweep(Tables.documents(spark, sfDir)).collect()
    assert(r.map(_.getInt(0)).toSeq == Seq(128, 256, 512, 1024))
    r.foreach(x => assert(x.getDouble(3) >= 0 && x.getDouble(3) < 1))
    val used = r.map(_.getLong(2))
    assert(used.zip(used.tail).forall { case (a, b) => a <= b },
      "longer contexts truncate less")
  }
}
