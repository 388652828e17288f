package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators. The engine already carries HLL
  * (q49 approx_count_distinct) and Bloom admission (q77); this adds
  * the Count-Min sketch — the classic mergeable frequency summary for
  * heavy-hitter tracking over unbounded key domains.
  *
  * The hashing is the repo's engine-neutral md5 convention, so unlike
  * most sketches the ENTIRE structure — every counter cell and every
  * estimate — is exactly reproducible in DuckDB and hash-checked, not
  * just "approximately right".
  */
object Sketches {

  /** CMS row `d`'s bucket for string key column `k`. */
  private def cmBucket(k: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cm$d:"), k)), 1, 8), 16, 10)
      .cast("long") % width

  /** The depth-way bucket array for one key — posexplode it to get a
    * key's (depth, bucket) increment rows. Shared by the batch
    * builder, the estimate finisher, and the streaming twin
    * ([[graft.streaming.StreamPipeline.cmsCountersStream]]) so the
    * hash family can never drift between tiers. */
  private[graft] def cmBucketArray(k: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d => cmBucket(k, d, width)): _*)

  /** CMS point estimates for a key panel over ANY (depth, bucket, c)
    * counter frame — the finisher shared by the batch heavy-hitter
    * report and a streamed-register consumer (the q187
    * registers-plus-shared-finisher pattern): estimate = min over the
    * key's depth cells; the counter matrix is depth·width rows and
    * always broadcasts. Counter frames are SPARSE (a never-touched
    * (depth, bucket) cell has no row — the normal shape for the
    * streamed counter tier), so the join is a LEFT join with absent
    * cells coalesced to 0: a key with any empty cell estimates 0/its
    * true sparse minimum instead of overestimating past the CMS bound
    * or vanishing from the report. */
  def cmsEstimates(counters: DataFrame, keys: DataFrame,
                   depth: Int = 4, width: Int = 64): DataFrame =
    keys.select(col("k"))
      .select(col("k"),
        posexplode(cmBucketArray(col("k"), depth, width)).as(Seq("depth", "bucket")))
      .join(broadcast(counters), Seq("depth", "bucket"), "left")
      .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("cms_count"))

  /** Count-Min heavy hitters over `keyCol`: build a depth×width
    * counter matrix, then report the top `topN` keys by TRUE count
    * alongside their CMS estimate and its overestimate — the sketch-
    * accuracy audit a pipeline runs before trusting CMS numbers at
    * full scale (where the exact groupBy is the thing being avoided;
    * here it doubles as ground truth).
    *
    * Build: each occurrence increments one counter per depth row —
    * expressed as a `depth`-way posexplode then a hash aggregate on
    * (depth, bucket). Spark's partial aggregation IS the per-partition
    * sketch accumulate, and the exchange merges counter matrices by
    * cell addition — exactly the CMS merge operator, shuffling only
    * depth·width counter cells regardless of input size. The estimate
    * is min over depth rows; collisions only ever inflate, so
    * overestimate ≥ 0 always (spec-pinned).
    */
  def countMinHeavyHitters(events: DataFrame, keyCol: String = "user_id",
                           depth: Int = 4, width: Int = 64,
                           topN: Int = 20): DataFrame = {
    val keys = events.select(col(keyCol).cast("string").as("k"))
    val counters = keys
      .select(posexplode(cmBucketArray(col("k"), depth, width)).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("c"))
    val top = keys.groupBy("k").agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("k").asc).limit(topN)
    top.join(cmsEstimates(counters, top, depth, width), Seq("k"))
      .withColumn("overestimate", col("cms_count") - col("true_count"))
      .select("k", "true_count", "cms_count", "overestimate")
      .orderBy(col("true_count").desc, col("k").asc)
  }

  /** HyperLogLog distinct-user estimate per event type, EXACTLY
    * oracle-checkable — the property Spark's own
    * `approx_count_distinct` (q49, xxhash64 + private seed) can never
    * have. Three determinism moves make the whole sketch replayable
    * in any engine:
    *
    *  1. register index = top p bits of the 60-bit md5 key; the rank
    *     ρ = (position of the highest set bit in the remaining 51
    *     bits, from the top) is computed as `51 − length(bin(rest)) +
    *     1` — STRING-based bit length, no float log2 near a power of
    *     two to disagree on;
    *  2. the harmonic denominator Σ 2^−M_j is summed as INTEGER
    *     numerators over the common denominator 2^(61−p): each
    *     register contributes the BIGINT 2^(61−p−M_j), the sum is
    *     exact in int64 (≤ m·2^(60−p) = 2^60), and one final
    *     cast-to-double ÷ 2^(61−p) is the only rounding step — both
    *     engines round the identical integer identically, in ANY
    *     summation order. (A plain double Σ of up to 512 dyadic terms
    *     spanning 2^−1..2^−52 can need ~60 significand bits, so
    *     extreme register mixes could make it order-dependent.)
    *     Empty registers contribute 2⁰ = 1 via the register count;
    *  3. the closing α_m·m²/Σ (and the small-range linear-counting
    *     branch m·ln(m/V)) is one formula with identical text in
    *     both engines.
    *
    *  Build: one hash aggregate to per-(type, register) maxima — the
    *  exchange merges sketches by register max, which IS the HLL
    *  merge operator; the shuffle carries ≤ #types·2^p rows no
    *  matter the input size. The exact distinct count rides along
    *  for the accuracy audit (at 100 TB it would be dropped — it is
    *  the thing the sketch avoids).
    */
  def hllUsersByType(events: DataFrame, p: Int = 9): DataFrame = {
    val regs = events.select(col("event_type"),
        hllReg(col("user_id"), p), hllRho(col("user_id"), p))
      .groupBy("event_type", "reg")
      .agg(max(col("rho")).as("mj"))
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    hllEstimate(regs, Seq("event_type"), p)
      .join(exact, "event_type")
      .select(col("event_type"), col("exact_distinct"), col("n_present"),
        col("n_zero"), col("method"), col("estimate"))
      .orderBy("event_type")
  }

  /** Sliding-window distinct users via HLL register merge — the
    * mergeability story applied to TIME: distinct users over the
    * trailing `windowHours` hours, for every hour, computed entirely
    * in register arithmetic. The corpus is touched ONCE (the hourly
    * register aggregate, ≤ #hours·2^p rows); the trailing merge is a
    * bounded `windowHours`-way explode of SKETCH rows — at 100 TB the
    * sliding-distinct dashboard costs register math, never a second
    * data pass, and that is the entire point of keeping per-hour
    * sketches. Same md5 registers as q187, so every merged register
    * and estimate is DuckDB-hash-exact; the exact trailing distinct
    * rides along as the accuracy audit (computed from per-hour
    * DISTINCT (hour, user) rows — also a bounded explode, of the
    * distinct tier, not the event stream).
    */
  def hllSlidingDistinct(events: DataFrame, windowHours: Int = 24,
                         p: Int = 9): DataFrame = {
    val hourCol = (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
      .cast("bigint").as("h")
    val regsHourly = events.select(hourCol, hllReg(col("user_id"), p),
        hllRho(col("user_id"), p))
      .groupBy("h", "reg").agg(max(col("rho")).as("mj"))
    val realHours = events.select(hourCol).distinct()
    val exact = events
      .select(hourCol, col("user_id")).distinct()
      .select(explode(sequence(lit(0), lit(windowHours - 1))).as("off"),
        col("h"), col("user_id"))
      .select((col("h") + col("off")).as("h"), col("user_id"))
      .join(realHours, Seq("h"), "left_semi")
      .groupBy("h").agg(countDistinct(col("user_id")).as("exact_distinct"))
    hllSlidingEstimates(regsHourly, windowHours, p)
      .join(exact, "h")
      .select(col("h"), col("exact_distinct"), col("n_present"),
        col("n_zero"), col("method"), col("estimate"))
      .orderBy("h")
  }

  /** The trailing-merge + estimate FINISHER over any (h, reg, mj)
    * hourly register frame — shared by the batch operator above and a
    * [[graft.streaming.StreamPipeline.hllRegistersStream]] consumer
    * (the q187 registers-plus-shared-finisher pattern): bounded
    * `windowHours`-way explode of sketch rows, register-wise max (the
    * HLL union), then the dyadic-exact closer; output hours are
    * restricted to hours that actually have registers (no phantom
    * trailing hours). Batch ≡ streamed-registers is spec-asserted.
    */
  def hllSlidingEstimates(regsHourly: DataFrame, windowHours: Int = 24,
                          p: Int = 9): DataFrame = {
    val realHours = regsHourly.select("h").distinct()
    val merged = regsHourly
      .select(explode(sequence(lit(0), lit(windowHours - 1))).as("off"),
        col("h"), col("reg"), col("mj"))
      .select((col("h") + col("off")).as("h"), col("reg"), col("mj"))
      .groupBy("h", "reg").agg(max(col("mj")).as("mj"))
      .join(realHours, Seq("h"), "left_semi")
    hllEstimate(merged, Seq("h"), p)
      .select(col("h"), col("n_present"), col("n_zero"),
        col("method"), col("estimate"))
  }

  /** HLL set algebra — the mergeability story completed: the UNION of
    * two user sets costs one register-wise max (never a data pass),
    * and inclusion–exclusion then prices the INTERSECTION from three
    * estimates: |A∩B| ≈ est(A) + est(B) − est(A∪B). This is why a
    * 100 TB engine keeps per-segment sketches — any cross-segment
    * overlap question becomes register arithmetic. Exact distincts
    * ride along per set as the accuracy audit (the thing the sketch
    * avoids at scale). Same md5 registers as q187, so every register,
    * estimate, and the intersection row are DuckDB-hash-exact; the
    * inclusion–exclusion closer is float-deterministic (three fixed
    * operands, one expression).
    *
    * Output: one row per set (a, b, union, intersection) with exact
    * and estimated cardinalities.
    */
  def hllOverlap(events: DataFrame, typeA: String = "click",
                 typeB: String = "view", p: Int = 9): DataFrame = {
    val keyed = events.filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"), col("user_id"),
        hllReg(col("user_id"), p), hllRho(col("user_id"), p))
    val perType = keyed.groupBy("event_type", "reg")
      .agg(max(col("rho")).as("mj"))
    // union = register-wise max across the two sketches — NO data pass
    val unionRegs = perType.groupBy("reg").agg(max(col("mj")).as("mj"))
      .withColumn("set_name", lit("union"))
    val est = hllEstimate(
      perType.withColumn("set_name",
        when(col("event_type") === typeA, lit("a")).otherwise(lit("b")))
        .select("set_name", "reg", "mj")
        .unionByName(unionRegs.select("set_name", "reg", "mj")),
      Seq("set_name"), p)
      .select(col("set_name"), col("estimate"))
    // exact counts per set via one grouped pass (no driver branching)
    val perUser = events.filter(col("event_type").isin(typeA, typeB))
      .groupBy("user_id").agg(
        max((col("event_type") === typeA).cast("int")).as("in_a"),
        max((col("event_type") === typeB).cast("int")).as("in_b"))
    val exact = perUser.agg(
      sum(col("in_a").cast("long")).as("a"),
      sum(col("in_b").cast("long")).as("b"),
      count(lit(1)).as("union"),
      sum((col("in_a") === 1 && col("in_b") === 1).cast("long"))
        .as("intersection"))
    val exactLong = exact.selectExpr(
      "stack(4, 'a', a, 'b', b, 'union', `union`, 'intersection', intersection) AS (set_name, exact_distinct)")
    val estA = est.filter(col("set_name") === "a")
      .select(col("estimate").as("ea"))
    val estB = est.filter(col("set_name") === "b")
      .select(col("estimate").as("eb"))
    val estU = est.filter(col("set_name") === "union")
      .select(col("estimate").as("eu"))
    val interEst = estA.crossJoin(estB).crossJoin(estU)
      .select(lit("intersection").as("set_name"),
        round(col("ea") + col("eb") - col("eu"), 2).as("estimate"))
    exactLong.join(est.unionByName(interEst), "set_name")
      .select(col("set_name"), col("exact_distinct"), col("estimate"))
      .orderBy("set_name")
  }

  /** Register index (top p bits of the 60-bit md5 key) — shared by the
    * batch report and the streaming register twin so the two can
    * never de-sync. */
  def hllReg(key: Column, p: Int = 9): Column =
    shiftright(hllHash(key), 60 - p).as("reg")

  /** Register rank ρ: highest-set-bit position (from the top) of the
    * remaining 60−p bits, via STRING bit-length — no float log2. */
  def hllRho(key: Column, p: Int = 9): Column = {
    val restBits = 60 - p
    val rest = hllHash(key).bitwiseAND(lit((1L << restBits) - 1))
    when(rest > 0, lit(restBits) - length(bin(rest)) + 1)
      .otherwise(lit(restBits) + 1).as("rho")
  }

  private def hllHash(key: Column): Column =
    conv(substring(md5(concat(lit("hll:"), key.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** The HLL finisher over a (groupCols*, reg, mj) register frame:
    * dyadic-exact harmonic sum, α·m²/Σ, linear-counting small-range
    * branch — the same closing arithmetic whether the registers came
    * from the one-pass batch aggregate or a finalized streaming
    * window. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
                  p: Int = 9): DataFrame = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // Σ 2^−mj as exact int64 numerators over 2^(61−p) — see the
    // hllUsersByType doc, move 2: order-independent by construction
    regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n_present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${61 - p} - mj)")).as("num_present"))
      .withColumn("sum_present",
        col("num_present").cast("double") / lit(math.pow(2.0, 61 - p)))
      .withColumn("n_zero", lit(m) - col("n_present"))
      .withColumn("denom", col("n_zero").cast("double") + col("sum_present"))
      .withColumn("raw", lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("denom"))
      .withColumn("method",
        when(col("raw") <= lit(2.5 * m) && col("n_zero") > 0, lit("linear"))
          .otherwise(lit("raw")))
      .withColumn("estimate", round(
        when(col("method") === "linear",
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
          .otherwise(col("raw")), 2))
      .drop("num_present", "sum_present", "denom", "raw")
  }
}
