package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{Aggregates, SetOps, TextAnalysis}

/** Second-wave analytics operators: set ops, rollup, pivot,
  * sessionization, distinct counting (exact + HLL), TF-IDF, salted
  * aggregation.
  */
class AnalyticsExtSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val orders = Tables.orders(spark, sfDir).cache()
  private lazy val events = Tables.events(spark, sfDir).cache()

  test("intersect ∪ except partition the F-customer set") {
    val fCust = orders.filter(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().count()
    val both = SetOps.customersInBothStatuses(orders).count()
    val onlyF = SetOps.customersOnlyFinished(orders).count()
    assert(both + onlyF == fCust)
  }

  test("rollup: grand total row equals table count; level sums are consistent") {
    val res = Aggregates.rollupFlagStatus(Tables.lineitem(spark, sfDir)).collect()
    val grand = res.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(grand.length == 1)
    assert(grand.head.getLong(4) == Tables.lineitem(spark, sfDir).count())
    val leaves = res.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0)
    assert(leaves.map(_.getLong(4)).sum == grand.head.getLong(4))
    val mids = res.filter(r => r.getInt(2) == 0 && r.getInt(3) == 1)
    assert(mids.map(_.getLong(4)).sum == grand.head.getLong(4))
  }

  test("pivot row sums equal the per-dow counts") {
    val res = Aggregates.pivotDowByType(events).collect()
    val rowSums = res.map(r => r.getInt(0) -> (1 to 5).map(r.getLong).sum).toMap
    val direct = Aggregates.dowActivity(events).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowSums == direct)
  }

  test("sessionize: indices start at 1, increase only at >30min gaps") {
    val res = Aggregates.sessionize(events).cache()
    assert(res.count() == events.count())
    val perUser = res.orderBy("user_id", "ts", "event_id").collect()
      .groupBy(_.getLong(0))
    perUser.values.foreach { rows =>
      assert(rows.head.getInt(3) == 1) // first event opens session 1
      rows.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getTimestamp(2).getTime / 1000 - a.getTimestamp(2).getTime / 1000
          val step = b.getInt(3) - a.getInt(3)
          assert(step == 0 || step == 1)
          if (gap <= 1800) assert(step == 0, s"gap=$gap step=$step")
        case _ =>
      }
    }
  }

  test("HLL approx distinct is within 5% of exact") {
    val exact = Aggregates.distinctUsersByType(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Aggregates.approxDistinctUsersByType(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k exact=$n approx=${approx(k)}")
    }
  }

  test("tf-idf: rare discriminative term beats ubiquitous term") {
    import spark.implicits._
    val df = Seq(
      (1L, "common common rare common", "en", "s", 0L),
      (2L, "common common common common", "en", "s", 0L),
      (3L, "common common common other", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = TextAnalysis.tfidfTopTerm(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare")   // df=1 dominates despite tf=1
    assert(top(3L) == "other")
    assert(top(2L) == "common") // only term present
  }

  test("multi-probe ANN recall dominates single-probe against brute force") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val truth = Similarity.bruteForceTopK(emb, nQueries = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame) = {
      val got = df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val single = recall(Similarity.annTopK(emb, nQueries = 8, k = 5))
    val multi = recall(Similarity.annTopKMultiProbe(emb, nQueries = 8, k = 5))
    // uniform random vectors are the adversarial case for sign-LSH
    // (true neighbors sit near cos≈0.4, weakly aligned with sign
    // buckets) — assert the probing mechanism, not an absolute recall
    // bar the data can't support: more probes never lose recall, and
    // the probe set must actually find something
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.0, s"multi-probe found nothing: $multi")
  }

  test("cleaning pipeline removes exactly the short docs and near-dup losers") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sfDir)
    val result = Dedup.cleaningPipeline(docs).cache()
    val gatedCanonical = docs
      .filter(size(split(col("text"), " ")) >= 10)
      .groupBy("text").agg(min("doc_id").as("doc_id"))
    val losers = Dedup.nearDupPairs(
        gatedCanonical.select(col("doc_id"), col("text")), 0.2)
      .select("id_b").distinct().count()
    assert(result.count() == gatedCanonical.count() - losers)
    assert(result.filter(col("n_tokens") < 10).count() == 0)
  }

  test("salted aggregation equals the direct groupBy") {
    val salted = SetOps.saltedEventTypeCounts(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("value_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
