package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{Dedup, Similarity}

/** MLlib LSH variants (SURVEY §2.13 built-ins) and the bucketed-table
  * co-located join — the shuffle-elimination demonstration SCALE.md
  * promises for fact⋈fact joins at 100 TB.
  */
class LshAndBucketingSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("MLlib MinHashLSH finds a planted near-duplicate") {
    import spark.implicits._
    val base = "spark engines shuffle data between stages while catalyst optimizes plans for execution speed"
    val near = base.replace("speed", "latency")
    val far1 = "completely different subject matter entirely unrelated to query processing or anything similar"
    val far2 = "one more standalone document with its own vocabulary set and nothing shared whatsoever again"
    val docs = Seq((1L, base), (2L, near), (3L, far1), (4L, far2))
      .map { case (i, t) => (i, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.minhashLshMllib(docs, distanceThreshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"planted pair missing from ${pairs.toSeq}")
    assert(!pairs.contains((3L, 4L)))
  }

  test("native candidate join reproduces approxSimilarityJoin exactly (q52 r19 rewrite)") {
    // the r19 q52 rewrite keeps MLlib's hash family (fit + transform)
    // but replaces approxSimilarityJoin's full-row-struct join with a
    // narrow native one — this pins OUTPUT equality against the MLlib
    // join itself, on the real corpus, at the query's own threshold
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val docs = Tables.documents(spark, sfDir)
    val shingled = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .withColumn("shingles",
        expr("transform(sequence(0, size(tk) - 3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))"))
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val featured = tf.transform(shingled)
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(4).setSeed(42L).fit(featured)
    // the pre-r19 q52 path, verbatim
    val mllib = model.approxSimilarityJoin(featured, featured, 0.8, "jaccard_dist")
      .filter(col("datasetA.doc_id") < col("datasetB.doc_id"))
      .select(col("datasetA.doc_id").as("id_a"), col("datasetB.doc_id").as("id_b"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val native = Dedup.minhashLshMllib(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native == mllib,
      s"native-vs-mllib diff: extra=${(native -- mllib).take(5)} missing=${(mllib -- native).take(5)}")
    assert(native.nonEmpty)
  }

  test("native candidate join reproduces the BRP approxSimilarityJoin exactly (q53 r19 rewrite)") {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sfDir)
    val base = emb.select(col("vec_id"),
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42L).fit(base)
    val queries = base.filter(col("vec_id") < 8)
    // the pre-r19 q53 path, verbatim
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("neighbor_id"))
    val mllib = model.approxSimilarityJoin(queries, base, 2.0, "dist")
      .select(col("datasetA.vec_id").as("q_id"), col("datasetB.vec_id").as("neighbor_id"),
        round(col("dist"), 6).as("dist"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val native = Similarity.annMllib(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(native == mllib,
      s"native-vs-mllib diff: native=${native.take(5)} mllib=${mllib.take(5)}")
    assert(native.nonEmpty)
  }

  test("MLlib BucketedRandomProjectionLSH ANN returns ranked neighbors consistent with cosine") {
    val emb = Tables.embeddings(spark, sfDir)
    val ann = Similarity.annMllib(emb, nQueries = 4, k = 5).collect()
    assert(ann.nonEmpty)
    // per query: ranks contiguous from 1, distances non-decreasing
    ann.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.head.getInt(3) == 1)
      val dists = sorted.map(_.getDouble(2))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    // euclidean rank order on unit vectors ≈ cosine rank order:
    // the top-1 euclidean neighbor should appear in the cosine top-5
    val cosTop = Similarity.bruteForceTopK(emb, nQueries = 4, k = 5).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    ann.filter(_.getInt(3) == 1).foreach { r =>
      assert(cosTop(r.getLong(0)).contains(r.getLong(1)),
        s"euclidean top-1 ${r.getLong(1)} for query ${r.getLong(0)} not in cosine top-5")
    }
  }

  test("partitioned parquet writes enable partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sfDir)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type#") && scan.contains("click"), scan)
    // the pruned read touches only the matching directory's rows
    val direct = Tables.events(spark, sfDir).filter(col("event_type") === "click").count()
    assert(pruned.count() == direct)
  }

  test("ANN probe over a bucket-partitioned corpus is a partition-pruned scan (IVF shape)") {
    val emb = Tables.embeddings(spark, sfDir)
    val withBucket = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      Similarity.lshBucketId(col("embedding").cast("array<double>")).as("bucket_id"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    withBucket.write.mode("overwrite").partitionBy("bucket_id").parquet(dir)
    val corpus = spark.read.parquet(dir)
    // single-probe ANN reads ONLY the query's bucket directory — the
    // SCALE.md claim that probes become partition-pruned scans, not
    // shuffles, once the corpus is written bucketed
    val someBucket = withBucket.select("bucket_id").head().getInt(0)
    val probed = corpus.filter(col("bucket_id") === someBucket)
    val scan = probed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("bucket_id"), scan)
    assert(probed.count() ==
      withBucket.filter(col("bucket_id") === someBucket).count())
  }

  test("annTopKIvf: materialized index probe equals in-memory ANN and dynamically prunes partitions") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-q").toString
    val ivf = Similarity.annTopKIvf(emb, dir)
    // identical semantics to the in-memory single-probe ANN — the index
    // only changes WHERE candidates are read from, never the result
    val mem = Similarity.annTopK(emb)
    assert(ivf.exceptAll(mem).count() == 0 && mem.exceptAll(ivf).count() == 0)
    // the probe scan carries a dynamic pruning predicate on the
    // partition column: only the queried bucket directories are read
    ivf.collect()
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") && plan.contains("bucket_id"),
      s"expected a dynamic partition-pruning filter on bucket_id in:\n$plan")
  }

  test("annTopKIvfMultiProbe equals the in-memory multi-probe and dynamically prunes") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-mp").toString
    val ivf = Similarity.annTopKIvfMultiProbe(emb, dir)
    val mem = Similarity.annTopKMultiProbe(emb)
    assert(ivf.exceptAll(mem).count() == 0 && mem.exceptAll(ivf).count() == 0)
    ivf.collect()
    val plan = ivf.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") && plan.contains("bucket_id"),
      s"expected a dynamic partition-pruning filter on bucket_id in:\n$plan")
    // recall dominance: every single-probe neighbor set is a subset of
    // what multi-probe considered, so per-query top-1 cosine can only
    // improve or stay equal
    val single = Similarity.annTopKIvf(emb, dir)
      .filter(col("rk") === 1).select(col("q_id"), col("cos_sim").as("s1"))
    val multi = ivf.filter(col("rk") === 1)
      .select(col("q_id"), col("cos_sim").as("m1"))
    assert(single.join(multi, "q_id").filter(col("m1") < col("s1")).count() == 0)
  }

  test("annQuality: one-bucket fixture scores perfect metrics on both arms") {
    import spark.implicits._
    // scalar multiples of one direction: every vector lands in the
    // same LSH bucket and every pairwise cosine is 1.0, so both arms
    // see the full corpus and rank exactly like the ground truth —
    // the metric plumbing must report a perfect score
    val emb = (0L until 14L)
      .map(i => (i, Array.fill(64)((i + 1).toFloat), "a"))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-annq").toString
    val rows = Similarity.annQuality(emb, dir, nQueries = 2).collect()
    assert(rows.length == 4) // 2 queries x 2 arms
    rows.foreach { r =>
      assert(r.getLong(2) == 10L, s"n_rel: $r")           // exact top-10
      assert(r.getInt(3) == 1, s"first_rel_rank: $r")
      assert(r.getDouble(4) == 1.0, s"rr: $r")
      assert(r.getDouble(6) == 1.0, s"ndcg: $r")
    }
  }

  test("annQuality on the corpus: bounds hold; multi-probe dominates single-probe") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-annq-c").toString
    val rows = Similarity.annQuality(emb, dir).collect()
    // the materialized-ground-truth path is row-identical to
    // self-computing (INT grades — exact parquet roundtrip)
    val gtDir = java.nio.file.Files.createTempDirectory("graft-annq-gt").toString
    assert(Similarity.prebuildAnnGroundTruth(emb, gtDir),
      "first touch must build")
    assert(!Similarity.prebuildAnnGroundTruth(emb, gtDir),
      "second touch must reuse")
    val cached = Similarity.annQuality(emb, dir, gtDir = Some(gtDir)).collect()
    assert(rows.map(_.toString).toSeq == cached.map(_.toString).toSeq,
      "gt-cached and self-computed runs diverge")
    assert(rows.length == 16) // 8 queries x 2 arms
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, s"rr: $r")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, s"ndcg: $r")
    }
    // dominance law: the multi-probe candidate set is a superset of
    // the single-probe set ranked by the same (cos desc, vec_id) total
    // order, and relevance grades are non-increasing along that order
    // — so at every rank position the multi-probe gain >= the
    // single-probe gain, hence nDCG and MRR can only improve
    val byQ = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r => r.getString(1) ->
        (r.getDouble(4), r.getDouble(6))).toMap }
    byQ.foreach { case (q, arms) =>
      assert(arms("multiprobe")._1 >= arms("ivf")._1, s"q$q rr regressed")
      assert(arms("multiprobe")._2 >= arms("ivf")._2, s"q$q ndcg regressed")
    }
  }

  test("appendToIvfIndex: probe-identical to a full rebuild; resident partitions untouched") {
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") < 300)
    val newer = emb.filter(col("vec_id") >= 300)
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivf-full").toString
    assert(Similarity.prebuildIvfIndex(old, dirA))
    def partFiles(dir: String): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("bucket_id="))
        .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val before = partFiles(dirA)
    Similarity.appendToIvfIndex(newer, dirA)
    val after = partFiles(dirA)
    val newBuckets = Similarity.lshBuckets(newer)
      .select("bucket_id").distinct().collect().map(r => s"bucket_id=${r.getInt(0)}").toSet
    // append wrote SOMETHING, and only into the batch's own buckets
    assert(newBuckets.exists(b => after(b) != before.getOrElse(b, Set.empty[String])))
    before.keys.filterNot(newBuckets).foreach { b =>
      assert(after(b) == before(b), s"resident partition $b must be untouched") }
    // the appended index answers probes identically to a full rebuild
    assert(Similarity.prebuildIvfIndex(emb, dirB))
    val viaAppend = Similarity.annTopKIvf(emb, dirA)
    val viaFull = Similarity.annTopKIvf(emb, dirB)
    assert(viaAppend.exceptAll(viaFull).count() == 0 &&
      viaFull.exceptAll(viaAppend).count() == 0,
      "append must be bit-identical to rebuild (fixed coarse quantizer)")
    // multi-probe agrees too (partition layout unchanged semantics)
    val mpA = Similarity.annTopKIvfMultiProbe(emb, dirA)
    val mpB = Similarity.annTopKIvfMultiProbe(emb, dirB)
    assert(mpA.exceptAll(mpB).count() == 0 && mpB.exceptAll(mpA).count() == 0)
  }

  test("appendToPqIndex: frozen-book encode ≡ stored codes; resident files linked; ADC probes identical") {
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val base = java.nio.file.Files.createTempDirectory("graft-pqapp").toString
    val oldDir = s"$base/pq2x4i3_old"
    val newDir = s"$base/pq2x4i3_app"
    def snap(dir: String): Set[(String, Long, String)] = TierFiles.snapshot(dir)
    assert(Similarity.prebuildPqIndex(old, oldDir))
    // the identity the whole append rests on: re-encoding the TRAINING
    // vectors against the frozen STORED books reproduces their stored
    // codes bit-exactly (round-6 centroids roundtrip parquet; the
    // repacked cs row equals the live training centroids)
    val enc = Similarity.encodeAgainstBooks(old, oldDir, 2)
    val stored = spark.read.parquet(s"$oldDir/codes")
    assert(enc.exceptAll(stored).count() == 0 &&
      stored.exceptAll(enc).count() == 0,
      "frozen-book encode diverges from the build-time codes")
    val snapC = snap(s"$oldDir/codes")
    val snapB = snap(s"$oldDir/books")
    assert(Similarity.appendToPqIndex(batch, oldDir, newDir))
    // resident files byte-identical, and both tiers entered the new
    // address by hard link (books pure, codes + the batch delta)
    assert(snap(s"$oldDir/codes") == snapC && snap(s"$oldDir/books") == snapB,
      "append touched the frozen old index")
    (snapB.map(("books", _)) ++ snapC.map(("codes", _))).foreach {
      case (tier, (name, _, _)) =>
        assert(java.nio.file.Files.isSameFile(
          new java.io.File(s"$oldDir/$tier", name).toPath,
          new java.io.File(s"$newDir/$tier", name).toPath),
          s"$tier/$name: expected a hard link, found a copy")
    }
    assert(snap(s"$newDir/books") == snapB, "books must be a pure link tier")
    assert(snap(s"$newDir/codes").size > snapC.size, "no code delta landed")
    // the appended address serves the union's codes (m=2 rows per vec)
    assert(spark.read.parquet(s"$newDir/codes").count() == emb.count() * 2)
    // full reuse is a no-op
    assert(!Similarity.appendToPqIndex(batch, oldDir, newDir))
    // ADC probes over the appended address ≡ a clone index whose codes
    // were written monolithically from the same frozen books — the
    // "bit-identical probes" contract
    val cloneDir = s"$base/pq2x4i3_clone"
    spark.read.parquet(s"$oldDir/books").write.parquet(s"$cloneDir/books")
    spark.read.parquet(s"$oldDir/codes")
      .unionByName(Similarity.encodeAgainstBooks(batch, oldDir, 2))
      .write.parquet(s"$cloneDir/codes")
    val viaAppend = Similarity.pqAnnCached(emb, newDir)
    val viaClone = Similarity.pqAnnCached(emb, cloneDir)
    assert(viaAppend.exceptAll(viaClone).count() == 0 &&
      viaClone.exceptAll(viaAppend).count() == 0,
      "ADC probes diverge between appended and monolithic layouts")
    // resident ids in the batch are rejected loudly, never double-coded
    intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(emb, oldDir, s"$base/pq2x4i3_g")
    }
    // an address for another subspace split is rejected
    intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(batch, oldDir, s"$base/pq4x4i3_g", m = 4)
    }
    // CHAINED day-2 (the q264/q265 chain law on the PQ tier): a second
    // disjoint batch lands on the APPENDED address; the two-step chain
    // equals the one-step append of both batches, and day-1's files
    // stay byte-identical under day-2's landing
    val b1 = batch.filter(col("vec_id") % 20 === 7)
    val b2 = batch.filter(col("vec_id") % 20 === 17)
    val d1 = s"$base/pq2x4i3_day1"
    val d2 = s"$base/pq2x4i3_day2"
    assert(Similarity.appendToPqIndex(b1, oldDir, d1))
    val day1Codes = snap(s"$d1/codes")
    assert(Similarity.appendToPqIndex(b2, d1, d2))
    assert(snap(s"$d1/codes") == day1Codes, "day-2 changed day-1's files")
    val chained = spark.read.parquet(s"$d2/codes")
    assert(chained.exceptAll(spark.read.parquet(s"$newDir/codes")).count() == 0 &&
      spark.read.parquet(s"$newDir/codes").exceptAll(chained).count() == 0,
      "two-day chain diverges from the one-step append")
  }

  test("compactPqIndex / compactIvfIndex: row-equal, files folded, ingest continues") {
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val b1 = emb.filter(col("vec_id") % 20 === 7)
    val b2 = emb.filter(col("vec_id") % 20 === 17)
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
             what: String): Unit =
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0, what)
    def nFiles(dir: String): Int =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    // --- PQ: flat link+delta tiers fold via coalesce ---
    val base = java.nio.file.Files.createTempDirectory("graft-cptpq").toString
    val oldDir = s"$base/pq2x4i3_old"
    val d1 = s"$base/pq2x4i3_d1"
    val cmp = s"$base/pq2x4i3_cmp"
    assert(Similarity.prebuildPqIndex(old, oldDir))
    assert(Similarity.appendToPqIndex(b1, oldDir, d1))
    assert(nFiles(s"$d1/codes") > 1,
      "fixture must present a multi-file codes tier (linked base + delta)")
    assert(Similarity.compactPqIndex(spark, d1, cmp), "first compaction must build")
    Seq("codes", "books").foreach { t =>
      same(spark.read.parquet(s"$cmp/$t"), spark.read.parquet(s"$d1/$t"),
        s"$t: compaction changed tier content")
      assert(nFiles(s"$cmp/$t") == 1, s"$t: expected 1 compacted file")
    }
    assert(!Similarity.compactPqIndex(spark, d1, cmp), "reuse must be a no-op")
    intercept[IllegalArgumentException] {
      Similarity.compactPqIndex(spark, d1, cmp, k = 8)
    }
    // day-2's ingest on the COMPACTED address codes-equals day-2 on
    // the uncompacted one — the chain is layout-blind
    val viaCmp = s"$base/pq2x4i3_viacmp"
    val viaRaw = s"$base/pq2x4i3_viaraw"
    assert(Similarity.appendToPqIndex(b2, cmp, viaCmp))
    assert(Similarity.appendToPqIndex(b2, d1, viaRaw))
    same(spark.read.parquet(s"$viaCmp/codes"),
      spark.read.parquet(s"$viaRaw/codes"),
      "append-on-compacted diverged from append-on-raw")
    // --- IVF: the bucket-partitioned layout folds per partition ---
    val i0 = java.nio.file.Files.createTempDirectory("graft-cptivf-live").toString
    val icmp = java.nio.file.Files.createTempDirectory("graft-cptivf-cmp")
      .toString + "/idx"
    val ifull = java.nio.file.Files.createTempDirectory("graft-cptivf-full").toString
    assert(Similarity.prebuildIvfIndex(old, i0))
    Similarity.appendToIvfIndex(b1, i0)
    def bucketDirs(dir: String) =
      new java.io.File(dir).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("bucket_id=")).toSeq
    assert(bucketDirs(i0).exists(d =>
        d.listFiles().count(_.getName.endsWith(".parquet")) > 1),
      "fixture must present a multi-file bucket partition")
    assert(Similarity.compactIvfIndex(spark, i0, icmp), "first compaction must build")
    assert(!Similarity.compactIvfIndex(spark, i0, icmp), "reuse must be a no-op")
    val cols = Seq("vec_id", "v", "bucket_id").map(col)
    same(spark.read.parquet(icmp).select(cols: _*),
      spark.read.parquet(i0).select(cols: _*),
      "IVF compaction changed index content")
    bucketDirs(icmp).foreach(d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName}: expected 1 file per compacted bucket"))
    // ingest continues IN PLACE on the compacted index, and probes
    // over it equal a monolithic full build
    Similarity.appendToIvfIndex(b2, icmp)
    assert(Similarity.prebuildIvfIndex(old.unionByName(b1).unionByName(b2), ifull))
    val q = old.unionByName(b1).unionByName(b2)
    val viaC = Similarity.annTopKIvf(q, icmp)
    val viaF = Similarity.annTopKIvf(q, ifull)
    assert(viaC.exceptAll(viaF).count() == 0 && viaF.exceptAll(viaC).count() == 0,
      "probes over the compacted+appended index diverge from a full build")
  }

  test("appendToIvfIndex: re-appending resident vec_ids is a no-op; staging never leaks") {
    val emb = Tables.embeddings(spark, sfDir)
    val old = emb.filter(col("vec_id") < 300)
    val newer = emb.filter(col("vec_id") >= 300)
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivf-reapp").toString
    assert(Similarity.prebuildIvfIndex(old, dirA))
    Similarity.appendToIvfIndex(newer, dirA)
    val rowsOnce = spark.read.parquet(dirA).count()
    assert(rowsOnce == emb.count())
    // the WHOLE corpus again — every vec_id already resident: the
    // id-disjointness anti-join must make this a no-op instead of
    // silently duplicating index rows / double-reporting neighbors
    Similarity.appendToIvfIndex(emb, dirA)
    assert(spark.read.parquet(dirA).count() == rowsOnce,
      "re-append of resident ids must not grow the index")
    assert(spark.read.parquet(dirA).groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0, "no duplicate vec_ids")
    // probes still equal a clean rebuild
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivf-reapp-full").toString
    assert(Similarity.prebuildIvfIndex(emb, dirB))
    val a = Similarity.annTopKIvf(emb, dirA)
    val b = Similarity.annTopKIvf(emb, dirB)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // the staged batch is moved in and the staging dir removed
    val parent = new java.io.File(dirA).getParentFile
    val stem = new java.io.File(dirA).getName + ".append-staging"
    assert(!parent.listFiles().exists(_.getName.startsWith(stem)),
      "staging directories must be cleaned up")
  }

  test("ivfIndexDir is content-addressed and prunes superseded indexes") {
    val embPath = s"$sfDir/embeddings.parquet"
    val base = java.nio.file.Files.createTempDirectory("graft-ivf-addr").toString
    val d1 = Similarity.ivfIndexDir(spark, embPath, base)
    assert(Similarity.ivfIndexDir(spark, embPath, base) == d1, "stable for unchanged data")
    // a rewritten source (new files/mtimes) must resolve to a NEW
    // index address — the stale-index-reuse failure mode is unreachable
    val copy = java.nio.file.Files.createTempDirectory("graft-ivf-copy").toString
    val base2 = java.nio.file.Files.createTempDirectory("graft-ivf-addr2").toString
    Tables.embeddings(spark, sfDir).write.mode("overwrite").parquet(copy)
    val d2 = Similarity.ivfIndexDir(spark, copy, base2)
    assert(d2 != d1)
    // simulate a built index for the old content, then rewrite the
    // corpus: re-addressing must prune the superseded directory so
    // the per-corpus footprint stays bounded at one live index
    assert(new java.io.File(d2).mkdirs())
    Thread.sleep(1100) // mtime granularity
    Tables.embeddings(spark, sfDir).write.mode("overwrite").parquet(copy)
    val d3 = Similarity.ivfIndexDir(spark, copy, base2)
    assert(d3 != d2, "rewritten corpus must get a fresh index address")
    assert(!new java.io.File(d2).exists(), "superseded index must be pruned")
    // a path with no data files has no identity to address by: refused
    val empty = java.nio.file.Files.createTempDirectory("graft-ivf-empty").toString
    intercept[IllegalArgumentException] { Similarity.ivfIndexDir(spark, empty, base) }
  }

  test("bucketed tables join with zero exchanges (co-located fact join)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    joined.collect()

    val plan = joined.queryExecution.executedPlan
    val helper = new AdaptiveSparkPlanHelper {}
    val exchanges = helper.collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join should not shuffle, found ${exchanges.size} exchanges:\n$plan")

    // same join on the raw (unbucketed) parquet DOES shuffle — the
    // contrast that makes the bucketing win visible
    val rawJoin = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum("l_quantity"))
    rawJoin.collect()
    val rawExchanges = helper.collectWithSubqueries(rawJoin.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(rawExchanges.nonEmpty)
  }

  test("decontamQueue: planted paraphrase tops the queue, eval members excluded, ties break low") {
    import spark.implicits._
    // ids 0 and 23 form the eval panel (0 mod 23); vec 7 duplicates
    // eval 0's direction exactly (the paraphrase), vec 1 ties at c6
    // between both eval items, vec 3 is anti-aligned
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0), (23L, Seq(0f, 1f, 0f), 0),
      (7L, Seq(2f, 0f, 0f), 1), (1L, Seq(1f, 1f, 0f), 1),
      (2L, Seq(0f, 3f, 1f), 1), (3L, Seq(-1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val q = Similarity.decontamQueue(emb).collect()
    assert(q.map(_.getLong(1)).toSeq == Seq(7L, 2L, 1L, 3L),
      "queue order must follow max cosine with vec_id tie-break")
    assert(q.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(q.head.getDouble(4) == 1.0 && q.head.getLong(3) == 0L)
    assert(q(1).getDouble(4) == 0.948683) // 3/√10 at q6
    // vec 1's cosine is 1/√2 to BOTH eval items — argmax keeps eval 0
    val id1 = q.find(_.getLong(1) == 1L).get
    assert(id1.getLong(3) == 0L && id1.getDouble(4) == 0.707107,
      "c6 tie must keep the smallest eval_id")
  }

  test("decontamQueue on the corpus: equals the HOF-cosine recompute with identical tie orders") {
    val emb = Tables.embeddings(spark, sfDir)
    val got = Similarity.decontamQueue(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.length == 50 && got.map(_._1).toSeq == (1 to 50))
    // alternative formulation: zip_with/aggregate HOF cosine, argmax
    // and cut replayed driver-side with the same tie-breaks
    val base = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
    val ev = base.filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("eval_id"), col("v").as("ev"))
    val pairs = base.filter(col("vec_id") % 23 =!= 0)
      .crossJoin(broadcast(ev))
      .select(col("vec_id"), col("label"), col("eval_id"),
        floor(Similarity.cosineHof(col("v"), col("ev")) * 1e6 + 0.5)
          .cast("long").as("c6"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = pairs.groupBy(_._1).values
      .map(_.minBy(p => (-p._4, p._3)))        // argmax c6, ties low eval_id
      .toSeq.sortBy(p => (-p._4, p._1)).take(50) // cut, ties low vec_id
      .zipWithIndex
      .map { case ((vid, lab, eid, c6), i) =>
        (i + 1, vid, lab, eid, c6.toDouble / 1e6) }
    assert(got.toSeq == want, "native-expression queue diverges from the HOF recompute")
  }

  test("decontamBySource: hand-computed rollup on the planted fixture; corpus totals reconcile with the queue") {
    import spark.implicits._
    // the q255 fixture + a source map: docs 7/1 in srcA, 2/3 in srcB
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0), (23L, Seq(0f, 1f, 0f), 0),
      (7L, Seq(2f, 0f, 0f), 1), (1L, Seq(1f, 1f, 0f), 1),
      (2L, Seq(0f, 3f, 1f), 1), (3L, Seq(-1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val docs = Seq((0L, "srcZ"), (23L, "srcZ"), (7L, "srcA"),
      (1L, "srcA"), (2L, "srcB"), (3L, "srcB"))
      .toDF("doc_id", "source")
    val got = Similarity.decontamBySource(emb, docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // srcA: max c6 {1000000, 707107} -> max 1.0, mean floor(1707107/2+.5)=853554
    // srcB: {948683, 0} -> max .948683, mean floor(948683/2+.5)=474342
    // srcZ holds only eval ids -> absent from the report
    assert(got.toSeq == Seq(
      ("srcA", 2L, 1.0, 0.853554), ("srcB", 2L, 0.948683, 0.474342)))
    // corpus reconciliation: every source's max_cos must equal the
    // best q255 per-doc score among its docs (recomputed corpus-wide)
    val embC = Tables.embeddings(spark, sfDir)
    val docsC = Tables.documents(spark, sfDir)
    val bySrc = Similarity.decontamBySource(embC, docsC).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = embC.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") % 23 === 0)
      .select(col("vec_id").as("eval_id"), col("v").as("ev"))
    val perDocMax = embC.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") % 23 =!= 0)
      .crossJoin(broadcast(ev))
      .select(col("vec_id"),
        floor(Similarity.cosineHof(col("v"), col("ev")) * 1e6 + 0.5)
          .cast("long").as("c6"))
      .groupBy("vec_id").agg(max("c6").as("mc6"))
      .join(docsC.select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
      .collect().map(r => (r.getString(2), r.getLong(1)))
    val wantMax = perDocMax.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).max.toDouble / 1e6)).toMap
    assert(bySrc == wantMax, "per-source rollup diverges from the HOF recompute")
  }

  test("leakTypology: one planted doc per quadrant, hand-computed means; corpus partition is total") {
    import spark.implicits._
    // id 0 is the eval panel on BOTH levels: text "alpha beta gamma
    // delta" (two eval 3-grams) + direction [1,0,0]
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (7L, Seq(2f, 0f, 0f), 1),      // cos 1.0      -> queue
      (1L, Seq(1f, 0.1f, 0f), 1),    // cos ~0.995   -> queue
      (2L, Seq(0f, 0f, 1f), 1),      // cos 0        -> out
      (3L, Seq(0f, -1f, 0f), 1))     // cos 0        -> out
      .toDF("vec_id", "embedding", "label")
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "ev", 0L),
      (7L, "alpha beta gamma extra tokens", "en", "s", 0L), // 1/3 overlap
      (1L, "unrelated words entirely different", "en", "s", 0L),
      (2L, "alpha beta gamma unrelated", "en", "s", 0L),    // 1/2 overlap
      (3L, "zzz yyy xxx www", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Similarity.leakTypology(emb, docs, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc 1's cosine through the exact double chain the engine runs
    val c1 = math.floor(
      (1.0 * 2.0) / (math.sqrt(1.0 + 0.1f.toDouble * 0.1f.toDouble) * 2.0)
        * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq(
      ("boilerplate", 1L, 0.0, 5000L),   // doc 2: 1 of 2 shingles shared
      ("clean", 1L, 0.0, 0L),            // doc 3
      ("paraphrase", 1L, c1, 0L),        // doc 1: queue, no overlap
      ("verbatim", 1L, 1.0, 3333L)),     // doc 7: queue + 1 of 3 shingles
      s"got ${got.toSeq}")
    // corpus: the quadrants partition every non-eval vector, and the
    // queue quadrants together hold exactly topK docs
    val embC = Tables.embeddings(spark, sfDir)
    val docsC = Tables.documents(spark, sfDir)
    val corpus = Similarity.leakTypology(embC, docsC).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCorpus = embC.filter(col("vec_id") % 23 =!= 0).count()
    assert(corpus.values.sum == nCorpus, "quadrants must partition the corpus")
    assert(corpus.getOrElse("verbatim", 0L) + corpus.getOrElse("paraphrase", 0L) == 50L,
      "queue quadrants must hold exactly topK docs")
  }

  test("leakTypologyDropIds: verbatim always cut, paraphrase by policy, boilerplate NEVER") {
    import spark.implicits._
    // the q258 planted fixture: doc 7 verbatim, doc 1 paraphrase,
    // doc 2 boilerplate, doc 3 clean
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (7L, Seq(2f, 0f, 0f), 1),
      (1L, Seq(1f, 0.1f, 0f), 1),
      (2L, Seq(0f, 0f, 1f), 1),
      (3L, Seq(0f, -1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "ev", 0L),
      (7L, "alpha beta gamma extra tokens", "en", "s", 0L),
      (1L, "unrelated words entirely different", "en", "s", 0L),
      (2L, "alpha beta gamma unrelated", "en", "s", 0L),
      (3L, "zzz yyy xxx www", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val full = Similarity.leakTypologyDropIdsQ(emb, docs, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(full.toSeq == Seq((1L, "paraphrase"), (7L, "verbatim")),
      s"got ${full.toSeq}")
    // policy off: the paraphrase doc survives, verbatim still goes
    val strict = Similarity.leakTypologyDropIdsQ(emb, docs, topK = 2,
        dropParaphrase = false)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(strict.toSeq == Seq((7L, "verbatim")), s"got ${strict.toSeq}")
    // corpus reconciliation: the drop set is exactly the queue
    // quadrants of the q258 report, and no boilerplate/clean doc ever
    // appears — however large K gets
    val embC = Tables.embeddings(spark, sfDir)
    val docsC = Tables.documents(spark, sfDir)
    val drops = Similarity.leakTypologyDropIdsQ(embC, docsC).collect()
    val quad = Similarity.leakTypology(embC, docsC).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(drops.length ==
      quad.getOrElse("verbatim", 0L) + quad.getOrElse("paraphrase", 0L))
    assert(drops.forall(r => Set("verbatim", "paraphrase")(r.getString(1))))
  }
}
