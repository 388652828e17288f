package graft.operators

import org.apache.spark.sql.DataFrame

/** URL / domain-tier curation — the standard web-corpus curation
  * family (RefinedWeb §3's URL filtering + per-site capping recipe,
  * re-expressed Spark-first): canonicalize raw URLs, deduplicate
  * mirror pages at the canonical-URL level, cap any one site's share
  * of the corpus, and audit per-site concentration.
  *
  * The documents table carries no URL column, so each doc gets a
  * DETERMINISTIC synthetic raw URL derived from md5(text) bits and the
  * doc's own fields — messy on purpose (mixed-case hosts, www/WWW
  * prefixes, default and non-default ports, duplicate slashes,
  * trailing slashes, tracking params out of order, fragments) so the
  * canonicalizer has real work to do, and identical in DuckDB (md5 and
  * integer div/mod are engine-exact), so every operator here is
  * hash-oracled end to end. Mirror pages are real too: the path keys
  * on (doc_id div 200, doc_id mod 40), so ~5 docs per corpus block
  * share a page and collapse only after canonicalization.
  *
  * Scale: everything is per-row string work (codegen'd, no UDF, no
  * shuffle) until ONE groupBy on (host, page-key) — the natural
  * partitioning for per-site curation at 100 TB, where a host's pages
  * co-locate and no site's skew leaks into another's partition. The
  * share audit's window runs over the #hosts-row aggregate, never raw
  * docs.
  */
object UrlCuration {

  /** Deterministic synthetic raw URL per doc (see class doc). All
    * variant bits come from one 24-bit md5 prefix; all page identity
    * comes from doc_id arithmetic — both bit-identical in DuckDB.
    */
  private val synthExpr: String =
    """CASE WHEN b % 2 = 0 THEN 'http' ELSE 'https' END ||
      |'://' ||
      |CASE (b div 2) % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'WWW.' END ||
      |CASE WHEN (b div 12) % 2 = 0 THEN upper(source) ELSE source END ||
      |'.example' ||
      |CASE WHEN length(source) % 2 = 0 THEN '.com' ELSE '.org' END ||
      |CASE (b div 24) % 4
      |  WHEN 0 THEN CASE WHEN b % 2 = 0 THEN ':80' ELSE ':443' END
      |  WHEN 1 THEN ':8080' ELSE '' END ||
      |'/s' || CAST(doc_id div 200 AS STRING) ||
      |'//docs/' || CAST(doc_id % 40 AS STRING) ||
      |CASE WHEN (b div 96) % 2 = 0 THEN '/' ELSE '' END ||
      |'?z=' || CAST((doc_id % 40) % 7 AS STRING) ||
      |'&utm_source=feed&a=' || CAST((doc_id % 40) % 3 AS STRING) ||
      |'&utm_campaign=x' ||
      |CASE WHEN (b div 192) % 2 = 0 THEN '#top' ELSE '' END""".stripMargin

  private def withRawUrls(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "n_chars",
        "CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT) AS b",
        "source")
      .selectExpr("doc_id", "n_chars", s"$synthExpr AS raw_url")

  /** Parse + canonicalize: lowercase scheme/host, strip the fragment,
    * strip default ports (80/http, 443/https — :8080 survives), strip
    * the www. prefix, collapse duplicate slashes and the trailing
    * slash, drop tracking params (utm_* / fbclid / gclid), sort the
    * survivors. Emits the pieces every downstream operator needs:
    * canon_url (scheme kept), host, and the scheme-insensitive
    * page_key (host ‖ port ‖ path ‖ query) mirror-dedup joins on —
    * http/https variants of one page are the same page.
    */
  private def canonPieces(docs: DataFrame): DataFrame =
    withRawUrls(docs)
      .selectExpr("doc_id", "n_chars", "raw_url",
        "regexp_replace(raw_url, '#.*$', '') AS nf")
      .selectExpr("doc_id", "n_chars", "raw_url",
        "lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme",
        "lower(regexp_extract(nf, '^[A-Za-z]+://([^/?]*)', 1)) AS auth",
        "regexp_extract(nf, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path",
        "regexp_extract(nf, '\\\\?(.*)$', 1) AS qs")
      .selectExpr("doc_id", "n_chars", "raw_url", "scheme",
        "regexp_replace(regexp_extract(auth, '^([^:]*)', 1), '^www\\\\.', '') AS host",
        "regexp_extract(auth, ':([0-9]+)$', 1) AS port",
        "regexp_replace(regexp_replace(path, '/{2,}', '/'), '/+$', '') AS pc",
        "coalesce(array_join(array_sort(filter(split(qs, '&'), " +
          "x -> NOT (substr(x, 1, 4) = 'utm_' OR substr(x, 1, 7) = 'fbclid=' " +
          "OR substr(x, 1, 6) = 'gclid='))), '&'), '') AS cq")
      .selectExpr("doc_id", "n_chars", "raw_url", "scheme", "host",
        "CASE WHEN port = '' THEN ''" +
          " WHEN scheme = 'http'  AND port = '80'  THEN ''" +
          " WHEN scheme = 'https' AND port = '443' THEN ''" +
          " ELSE ':' || port END AS cport",
        "CASE WHEN pc = '' THEN '/' ELSE pc END AS cpath",
        "CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS cqs")
      .selectExpr("doc_id", "n_chars", "raw_url", "host",
        "scheme || '://' || host || cport || cpath || cqs AS canon_url",
        "host || cport || cpath || cqs AS page_key")

  /** q231: the canonicalization report — raw → canonical URL, host,
    * and the 2-label registered-domain heuristic (a public-suffix
    * list is the production upgrade; the heuristic is exact for
    * .com/.org and documented as such).
    */
  def urlCanonicalize(docs: DataFrame): DataFrame =
    canonPieces(docs)
      .selectExpr("doc_id", "raw_url", "canon_url", "host",
        "regexp_extract(host, '([^.]+\\\\.[^.]+)$', 1) AS domain")
      .orderBy("doc_id")

  /** q232: mirror-page dedup + per-site cap — the RefinedWeb recipe.
    * Docs whose URLs canonicalize to one page_key collapse to the
    * min-doc_id keeper; each host then keeps at most `cap` pages by
    * md5-priority (deterministic, oracle-able). Per host: raw docs,
    * distinct pages, pages kept, mirror copies dropped, cap drops.
    * All-integer output — engine-exact.
    */
  def perHostCap(docs: DataFrame, cap: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val pages = canonPieces(docs)
      .groupBy(col("host"), col("page_key"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_doc"))
    val ranked = pages.withColumn("rk",
      row_number().over(Window.partitionBy("host")
        .orderBy(expr("md5(page_key)"), col("page_key"))))
    ranked.groupBy("host")
      .agg(sum("n_copies").cast("bigint").as("n_docs"),
        count(lit(1)).cast("bigint").as("n_pages"),
        sum(when(col("rk") <= cap, 1L).otherwise(0L)).cast("bigint").as("n_kept"),
        (sum("n_copies") - count(lit(1))).cast("bigint").as("n_mirror_dropped"),
        sum(when(col("rk") > cap, 1L).otherwise(0L)).cast("bigint").as("n_cap_dropped"))
      .orderBy("host")
  }

  /** q233: per-site concentration audit — docs, chars, exact
    * basis-point shares (integer div — no doubles anywhere), size
    * rank, cumulative share down the rank, and the head/torso/tail
    * tier cut a mixture designer reads first. The window runs over the
    * #hosts-row aggregate (bounded by the site vocabulary, never doc
    * volume).
    */
  def hostShareAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val per = canonPieces(docs).groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast("bigint").as("n_chars"))
    val tot = per.agg(sum("n_docs").cast("bigint").as("tot_docs"),
      sum("n_chars").cast("bigint").as("tot_chars"))
    val w = Window.orderBy(col("n_docs").desc, col("host"))
    per.crossJoin(broadcast(tot))
      .selectExpr("host", "n_docs", "n_chars",
        "CAST((n_docs * 10000) div tot_docs AS BIGINT) AS doc_share_bp",
        "CAST((n_chars * 10000) div tot_chars AS BIGINT) AS char_share_bp")
      .withColumn("size_rank", row_number().over(w))
      .withColumn("cum_share_bp",
        sum("doc_share_bp").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .selectExpr("host", "n_docs", "n_chars", "doc_share_bp",
        "char_share_bp", "CAST(size_rank AS INT) AS size_rank",
        "CAST(cum_share_bp AS BIGINT) AS cum_share_bp",
        "CASE WHEN doc_share_bp >= 800 THEN 'head' " +
          "WHEN doc_share_bp >= 400 THEN 'torso' ELSE 'tail' END AS tier")
      .orderBy("size_rank")
  }

  /** The per-doc (doc_id, host, page_key) canonical identity frame —
    * the projection both the batch gate and the streaming mirror twin
    * key on. Pure per-row string work (codegen'd, no shuffle), so it
    * runs unchanged on a stream.
    */
  def pageKeys(docs: DataFrame): DataFrame =
    canonPieces(docs).select("doc_id", "host", "page_key")

  /** The DOC-LEVEL survivors of the URL gate — the filter
    * [[perHostCap]] reports on: mirror copies of one page collapse to
    * the min-doc_id keeper, then each host keeps at most `cap` pages
    * by the same md5-priority [[perHostCap]] ranks with (so `count(
    * urlGateKeepers) = sum(perHostCap.n_kept)` by construction).
    * Returns a (doc_id) frame ready for a left-semi join — the shape
    * every other pipeline stage filter uses.
    */
  def urlGateKeepers(docs: DataFrame, cap: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    canonPieces(docs)
      .groupBy(col("host"), col("page_key"))
      .agg(min("doc_id").as("doc_id"))
      .withColumn("rk",
        row_number().over(Window.partitionBy("host")
          .orderBy(expr("md5(page_key)"), col("page_key"))))
      .filter(col("rk") <= cap)
      .select("doc_id")
  }

  /** q242: per-host quality audit — the domain-level curation readout
    * that turns q233's "who is big" into "who is big AND bad": per
    * host, doc count, exact mean quality score, and Gopher-gate pass
    * rate. RefinedWeb/C4-style domain blocklists are cut from exactly
    * this table — a head host with a tail gate-rate is the first
    * candidate. Same exactness as q240 (quality quantizes to a q4
    * BIGINT before the per-host sum, means close with one divide);
    * the rollup is per-row string work + ONE (host) groupBy — the
    * q232 partitioning, host skew stays in its partition.
    */
  def hostQualityAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val hostOf = canonPieces(docs).select("doc_id", "host")
    val q4 = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        floor(col("quality") * 1e4 + 0.5).cast("long").as("q4"))
    val gated = TextAnalysis.gopherGateFilter(docs)
      .select(col("doc_id"), lit(1L).as("g"))
    hostOf.join(q4, "doc_id")
      .join(gated, Seq("doc_id"), "left")
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum("q4").cast("bigint").as("sum_q4"),
        sum(coalesce(col("g"), lit(0L))).cast("bigint").as("n_gated"))
      .selectExpr("host", "n_docs",
        "floor(CAST(sum_q4 AS DOUBLE) / n_docs + 0.5) / 1e4 AS mean_quality",
        "n_gated",
        "floor(CAST(n_gated AS DOUBLE) * 1e4 / n_docs + 0.5) / 1e4 AS gate_rate")
      .orderBy("host")
  }

  /** q236: the per-source attrition funnel WITH the URL stage first —
    * q106's report extended the way a web-corpus run actually orders
    * its gates (RefinedWeb §3: URL curation before any content look):
    * input → URL keepers (mirror dedup + per-host cap) → Gopher gate →
    * exact dedup → eval decontamination. Everything downstream runs on
    * URL survivors only, so the report shows the real marginal
    * attrition of each stage, and a monotone non-increasing row is a
    * machine-checkable invariant (spec-pinned).
    *
    * Scale: the URL stage is one (host, page_key) groupBy + a per-host
    * window (bounded by pages per host); the rest is q106's shape —
    * id-keyed semi-joins, one final #sources-group aggregation.
    *
    * Caching contract (the [[graft.operators.TrainingData.pipelineFunnel]]
    * rule): the URL-survivor and gate-survivor frames persist for the
    * duration of the returned plan; the caller releases them
    * (`clearCache`/`unpersist`) once the report is consumed — the
    * bench harness does so between probes.
    */
  def urlPipelineFunnel(docs: DataFrame, evalDocs: DataFrame,
                        cap: Int = 8,
                        maxContamRatio: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.functions._
    val urlKept = docs.join(urlGateKeepers(docs, cap), Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gated = TextAnalysis.gopherGateFilter(urlKept).select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // md5-keyed keepers (Dedup.exactKeeperIds): no text on the exchange
    val canonical = Dedup.exactKeeperIds(gated)
    val deduped = gated.join(canonical, Seq("doc_id"), "left_semi")
    val contamOk = TrainingData.evalDecontaminate(deduped, evalDocs = Some(evalDocs))
      .filter(col("contam_ratio") <= maxContamRatio)
      .select("doc_id")
    val kept = deduped.join(contamOk, Seq("doc_id"), "left_semi")
    docs.select(col("doc_id"), col("source"))
      .join(urlKept.select(col("doc_id"), lit(1).as("u")), Seq("doc_id"), "left")
      .join(gated.select(col("doc_id"), lit(1).as("g")), Seq("doc_id"), "left")
      .join(deduped.select(col("doc_id"), lit(1).as("dd")), Seq("doc_id"), "left")
      .join(kept.select(col("doc_id"), lit(1).as("k")), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_input"), count(col("u")).as("n_url"),
        count(col("g")).as("n_gated"), count(col("dd")).as("n_deduped"),
        count(col("k")).as("n_kept"))
      .orderBy("source")
  }
}
