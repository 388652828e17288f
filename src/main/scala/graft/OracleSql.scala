package graft

import graft.operators.{Similarity, TextAnalysis}

/** DuckDB oracle twins for [[SparkEntry.queries]] (driver contract:
  * same column NAMES and comparable types as the Spark results —
  * Verify.scala dumps this map as oracle_sql.json).
  *
  * Conventions that keep the hash compare exact:
  *  - every aggregate / computed column aliased identically on both
  *    sides;
  *  - DuckDB integer sums CAST to BIGINT (DuckDB widens to HUGEINT,
  *    Spark to long), len()/row_number() CAST to INT (Spark returns
  *    int);
  *  - floating aggregates rounded on BOTH sides; money-style sums
  *    round per-row to 2 decimals first so group totals are exact
  *    multiples of 0.01;
  *  - engine-neutral hashing (md5 of identical strings) for the dedup
  *    cascade, so even MinHash/SimHash signatures hash-match;
  *  - the LSH hyperplane constants are inlined from
  *    [[Similarity.planes]] — one source of truth for both engines.
  */
object OracleSql {

  /** Unrolled deterministic-k-means CTE chain (q142's recurrence,
    * shared with the q155 SemDeDup oracle): e (vectors), c0 (first-k
    * init), then per iteration an assign CTE a_i and an update pair
    * u_i/c_i; the FINAL assign a{iters+1} carries (vec_id, v, cluster,
    * dist_r). Every centroid coordinate is round(6)-re-synced per
    * update and every distance round(6)-ed before the argmin, so the
    * trajectories are bit-identical to the Spark operator;
    * list_position/array_position both return the FIRST match →
    * identical tie-breaks; list_reduce folds like Spark's aggregate
    * (q97 precedent); len(v)=0 guards DuckDB's empty-fold error. An
    * emptied cluster keeps its previous centroid (slot-wise coalesce
    * over range(1, k+1)) — ids stay stable, mirroring the Spark side's
    * map_from_entries + try_element_at guard.
    */
  /** `p` prefixes every CTE name so several chains can coexist in one
    * query (the q192/q193 PQ oracles run one chain PER SUBSPACE);
    * `eSql` overrides the vector source (PQ feeds subvector slices).
    * Defaults reproduce the original single-chain names verbatim.
    */
  private def kmeansCtes(k: Int, iters: Int,
      eSql: String = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      p: String = ""): String = {
    def assignCte(i: Int, cPrev: String) =
      s"""${p}a$i AS (SELECT vec_id, v,
         |  CAST(list_position(d, list_aggregate(d, 'min')) AS INT) AS cluster,
         |  list_aggregate(d, 'min') AS dist_r
         |  FROM (SELECT vec_id, v, list_transform($cPrev.cs, c ->
         |    CASE WHEN len(v) = 0 THEN 0.0 ELSE
         |    round(list_reduce(list_transform(v, (el, j) ->
         |      (el - c[j]) * (el - c[j])), (x, y) -> x + y), 6) END) AS d
         |    FROM ${p}e CROSS JOIN $cPrev))""".stripMargin
    def updateCte(i: Int) =
      s"""${p}u$i AS (SELECT cluster, list(m ORDER BY dim) AS cm FROM (
         |    SELECT cluster, i AS dim, round(avg(v[CAST(i AS INT)]), 6) AS m
         |    FROM ${p}a$i, unnest(range(1, len(v) + 1)) AS t(i)
         |    GROUP BY 1, 2) GROUP BY 1),
         |${p}c$i AS (SELECT list(coalesce(u.cm, p.cs[g.cluster]) ORDER BY g.cluster) AS cs
         |  FROM range(1, $k + 1) AS g(cluster)
         |  LEFT JOIN ${p}u$i u ON u.cluster = g.cluster
         |  CROSS JOIN ${p}c${i - 1} p)""".stripMargin
    val ctes = (1 to iters).flatMap(i =>
      Seq(assignCte(i, s"${p}c${i - 1}"), updateCte(i))) :+
      assignCte(iters + 1, s"${p}c$iters")
    s"""${p}e AS ($eSql),
       |${p}c0 AS (SELECT list(v ORDER BY vec_id) AS cs FROM ${p}e WHERE vec_id < $k),
       |${ctes.mkString(",\n")}""".stripMargin
  }

  /** Subspace-sliced vector source for the PQ oracles: subspace `s`
    * (0-based, of `m`) covers dims [s·⌊d/m⌋+1 ..], the LAST takes the
    * remainder — the identical split as the Spark side's `subSlice`.
    */
  private def pqSubSql(s: Int, m: Int, where: String = ""): String = {
    val hi = if (s == m - 1) "len(v)" else s"${s + 1} * (len(v) // $m)"
    s"""SELECT vec_id, v[$s * (len(v) // $m) + 1 : $hi] AS v
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) $where""".stripMargin
  }

  /** The shingle → minhash → banding cascade CTEs (3-token shingles,
    * 4 bands) over an arbitrary source relation — DuckDB lists are
    * 1-based, hence tk[i..i+2] over range(1, len-1).
    */
  private def shingleCascade(src: String): String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $src),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
       |       FROM toks WHERE len(tk) >= 3),
       |sig AS (SELECT doc_id,
       |        min(md5('b0:' || shingle)) AS mh0, min(md5('b1:' || shingle)) AS mh1,
       |        min(md5('b2:' || shingle)) AS mh2, min(md5('b3:' || shingle)) AS mh3
       |        FROM sh GROUP BY doc_id),
       |bands AS (SELECT doc_id, 0 AS band, mh0 AS mh FROM sig
       |UNION ALL SELECT doc_id, 1, mh1 FROM sig
       |UNION ALL SELECT doc_id, 2, mh2 FROM sig
       |UNION ALL SELECT doc_id, 3, mh3 FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a
       |         JOIN bands b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)""".stripMargin

  /** Jaccard-verify CTEs appended after [[shingleCascade]]. */
  private val jaccardVerify =
    """sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sset FROM sh GROUP BY doc_id),
      |j AS (SELECT id_a, id_b,
      |round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
      |(len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))), 4) AS jaccard
      |FROM cand JOIN sets a ON cand.id_a = a.doc_id JOIN sets b ON cand.id_b = b.doc_id)""".stripMargin

  private val shingleCte =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      |       FROM toks WHERE len(tk) >= 3),
      |sig AS (SELECT doc_id,
      |        min(md5('b0:' || shingle)) AS mh0, min(md5('b1:' || shingle)) AS mh1,
      |        min(md5('b2:' || shingle)) AS mh2, min(md5('b3:' || shingle)) AS mh3
      |        FROM sh GROUP BY doc_id),
      |bands AS (SELECT doc_id, 0 AS band, mh0 AS mh FROM sig
      |UNION ALL SELECT doc_id, 1, mh1 FROM sig
      |UNION ALL SELECT doc_id, 2, mh2 FROM sig
      |UNION ALL SELECT doc_id, 3, mh3 FROM sig),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM bands a
      |         JOIN bands b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared greedy-subword-segmentation CTEs ending in
    * `st(doc_id, n_words, n_subwords, n_unk)` — a recursive CTE
    * running the IDENTICAL maximal-munch recurrence as
    * [[graft.functions.SubwordGenerator]] (whose DefaultVocab is
    * inlined here: one source of truth for both engines). Each
    * DISTINCT word segments once (pos advances by the longest vocab
    * match, else 1 with an UNK count); per-document stats then join
    * word instances back — identical counts to the per-instance
    * Spark generator.
    */
  private val subwordCtes: String = {
    val vocabList = graft.functions.SubwordGenerator.DefaultVocab
      .map(v => s"'$v'").mkString(", ")
    val munch = "(SELECT v FROM vocab WHERE substr(w, CAST(pos AS INT), len(v)) = v " +
      "ORDER BY len(v) DESC, v LIMIT 1)"
    s"""WITH RECURSIVE vocab(v) AS (SELECT unnest([$vocabList])),
       |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dw AS (SELECT DISTINCT w FROM words WHERE len(w) > 0),
       |seg AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, 0 AS n_sub, 0 AS n_unk FROM dw
       |  UNION ALL
       |  SELECT w, pos + coalesce(len($munch), 1), n_sub + 1,
       |    n_unk + CASE WHEN $munch IS NULL THEN 1 ELSE 0 END
       |  FROM seg WHERE pos <= len(w)),
       |done AS (SELECT w, n_sub, n_unk FROM seg WHERE pos = len(w) + 1),
       |st AS (SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |  CAST(sum(n_unk) AS BIGINT) AS n_unk
       |  FROM words JOIN done ON words.w = done.w GROUP BY 1)""".stripMargin
  }

  /** The q200 recursion extended to CARRY the consumed token per step
    * (UNK steps carry the single character), ending in
    * `pairs(w, t1, t2)` (adjacent subword pairs per DISTINCT word)
    * and `wc(w, mult)` (word instance multiplicity) — the q207 BPE
    * merge-candidate oracle's inputs.
    */
  private val subwordSeqCtes: String = {
    val vocabList = graft.functions.SubwordGenerator.DefaultVocab
      .map(v => s"'$v'").mkString(", ")
    val munch = "(SELECT v FROM vocab WHERE substr(w, CAST(pos AS INT), len(v)) = v " +
      "ORDER BY len(v) DESC, v LIMIT 1)"
    s"""WITH RECURSIVE vocab(v) AS (SELECT unnest([$vocabList])),
       |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dw AS (SELECT DISTINCT w FROM words WHERE len(w) > 0),
       |seg AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, 0 AS step,
       |    CAST(NULL AS VARCHAR) AS tok FROM dw
       |  UNION ALL
       |  SELECT w, pos + coalesce(len($munch), 1), step + 1,
       |    coalesce($munch, substr(w, CAST(pos AS INT), 1))
       |  FROM seg WHERE pos <= len(w)),
       |pairs AS (SELECT s1.w, s1.tok AS t1, s2.tok AS t2
       |  FROM seg s1 JOIN seg s2 ON s1.w = s2.w AND s2.step = s1.step + 1
       |  WHERE s1.step >= 1),
       |wc AS (SELECT w, count(*) AS mult FROM
       |  (SELECT w FROM words WHERE len(w) > 0) GROUP BY w)""".stripMargin
  }

  /** Shared simhash CTEs ending in `ssig(doc_id, simhash)`. */
  private val simhashCtes: String = {
    val votes = (0 until 32)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bit$b")
      .mkString(", ")
    val sig = (0 until 32)
      .map(b => s"(CASE WHEN bit$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""th AS (SELECT doc_id, CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS h
       |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
       |v AS (SELECT doc_id, $votes FROM th GROUP BY doc_id),
       |ssig AS (SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM v)""".stripMargin
  }

  private val simhashSql: String =
    s"WITH $simhashCtes\nSELECT doc_id, simhash FROM ssig ORDER BY doc_id"

  /** The 8-plane sign-LSH bucket id over a DOUBLE[] expression — the
    * hyperplane constants inlined from [[Similarity.planes]] (one
    * source of truth for both engines).
    */
  private def bucketTerms(vecExpr: String): String =
    Similarity.planes.zipWithIndex.map { case (p, i) =>
      val arr = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vecExpr, $arr) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  private val lshBucketsSql: String =
    s"SELECT vec_id, CAST(${bucketTerms("CAST(embedding AS DOUBLE[])")} AS INT) AS bucket_id " +
      "FROM embeddings ORDER BY vec_id"

  /** Single-probe ANN (q39) — and, verbatim, the IVF probe (q64):
    * the materialized index changes WHERE the corpus is scanned
    * (bucket-partitioned parquet + dynamic partition pruning), never
    * WHAT is computed, so both queries share one oracle. Everything is
    * deterministic at query time: the planes are fixed-seed constants
    * inlined by [[bucketTerms]], the candidate set is a bucket
    * equi-join, and ties break on vec_id.
    */
  private val annProbeSql: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
       |q AS (SELECT vec_id AS q_id, v AS qv, bucket_id FROM b WHERE vec_id < 8),
       |s AS (SELECT q.q_id, b.vec_id,
       |list_dot_product(b.v, q.qv) /
       |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
       |FROM b JOIN q ON b.bucket_id = q.bucket_id WHERE b.vec_id <> q.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
       |SELECT q_id, vec_id AS neighbor_id, round(cos, 6) AS cos_sim, CAST(rk AS INT) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** Multi-probe ANN over the same deterministic buckets (q74): each
    * query probes its own bucket plus the 8 single-bit flips. The
    * probe list is generated per query; a corpus vector lives in
    * exactly one bucket and the 9 probed buckets are distinct, so no
    * candidate appears twice and no DISTINCT is needed.
    */
  private val annMultiProbeSql: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
       |q0 AS (SELECT vec_id AS q_id, v AS qv, bucket_id FROM b WHERE vec_id < 8),
       |probes AS (SELECT q_id, qv, bucket_id FROM q0
       |UNION ALL SELECT q_id, qv, CAST(xor(bucket_id, (1 << i)) AS INT) AS bucket_id
       |FROM q0, range(0, 8) t(i)),
       |s AS (SELECT p.q_id, b.vec_id,
       |list_dot_product(b.v, p.qv) /
       |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS cos
       |FROM b JOIN probes p ON b.bucket_id = p.bucket_id WHERE b.vec_id <> p.q_id),
       |r AS (SELECT q_id, vec_id, cos,
       |row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
       |SELECT q_id, vec_id AS neighbor_id, round(cos, 6) AS cos_sim, CAST(rk AS INT) AS rk
       |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin

  /** q65 and q77 share this: the Bloom-admission variant is
    * result-identical to the exact fingerprint anti-join by
    * construction (see the q77 comment at the binding site).
    */
  private val incrementalDedupSql: String =
    """WITH corpus AS (SELECT DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents WHERE source <> 'src2'),
      |batch AS (SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint,
      |min(doc_id) AS doc_id
      |FROM documents WHERE source = 'src2' GROUP BY 1)
      |SELECT b.doc_id, b.fingerprint FROM batch b
      |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fingerprint = b.fingerprint)
      |ORDER BY b.doc_id""".stripMargin

  private val base: Map[String, String] = Map(
    "q01_hourly_agg" ->
      """SELECT CAST(hour(ts) AS INT) AS hour, count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q02_project_cast" ->
      """SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS lineno,
        |CAST(floor(l_quantity) AS INT) AS qty_floor, l_returnflag AS returnflag,
        |CAST(l_shipdate AS DATE) AS ship_date,
        |l_returnflag || '-' || l_linestatus AS flag_status, 'li' AS src
        |FROM lineitem ORDER BY okey, lineno""".stripMargin,

    "q03_filter_conj" ->
      """SELECT l_orderkey AS okey, l_linenumber AS lineno, l_quantity AS qty, l_discount AS disc
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05 ORDER BY okey, lineno""".stripMargin,

    "q04_price_bands" ->
      """WITH t AS (SELECT CASE WHEN l_extendedprice < 10000 THEN 'low'
        |WHEN l_extendedprice < 30000 THEN 'mid' ELSE 'high' END AS band,
        |floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100.0 + 0.5) / 100.0 AS net FROM lineitem)
        |SELECT band, count(*) AS n, round(sum(net), 2) AS net_sum FROM t GROUP BY band ORDER BY band""".stripMargin,

    "q05_filtered_avg" ->
      """SELECT count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events WHERE event_type = 'click'""".stripMargin,

    "q06_dow_agg" ->
      """SELECT CAST(isodow(ts) AS INT) AS dow_mon1, count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_status_pct" ->
      """SELECT o_orderstatus, count(*) AS n,
        |round(count(*) * 100.0 / (SELECT count(*) FROM orders), 2) AS pct
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q08_multi_avg" ->
      """SELECT l_returnflag, round(avg(l_quantity), 3) AS avg_qty,
        |round(avg(l_extendedprice), 3) AS avg_price, round(avg(l_discount), 4) AS avg_disc,
        |round(avg(l_tax), 4) AS avg_tax FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_null_counts" ->
      """SELECT CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS null_etype,
        |CAST(sum(CASE WHEN value < 5 THEN 1 ELSE 0 END) AS BIGINT) AS null_v,
        |count(*) AS n FROM events""".stripMargin,

    "q10_describe" ->
      """SELECT count(*) AS n,
        |round(avg(l_quantity), 4) AS qty_mean, round(stddev(l_quantity), 4) AS qty_std,
        |min(l_quantity) AS qty_min, max(l_quantity) AS qty_max,
        |round(avg(l_extendedprice), 4) AS price_mean, round(stddev(l_extendedprice), 4) AS price_std,
        |min(l_extendedprice) AS price_min, max(l_extendedprice) AS price_max FROM lineitem""".stripMargin,

    "q11_quantiles" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.25), 4) AS q25,
        |round(quantile_cont(l_quantity, 0.5), 4) AS q50,
        |round(quantile_cont(l_quantity, 0.75), 4) AS q75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_correlations" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |round(corr(l_discount, l_tax), 6) AS corr_disc_tax FROM lineitem""".stripMargin,

    "q14_confusion" ->
      """SELECT CAST(value > 50 AS INT) AS label, CAST(event_id % 2 = 0 AS INT) AS prediction,
        |count(*) AS n FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q15_hour_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n,
        |round(sum(value), 2) AS value_sum FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q16_union_dedup_reid" ->
      """WITH proj AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |m AS (SELECT * FROM proj WHERE o_orderstatus = 'F'
        |UNION ALL SELECT * FROM proj WHERE o_orderstatus = 'O'
        |UNION ALL SELECT * FROM proj WHERE o_orderstatus = 'P'
        |UNION ALL SELECT * FROM proj WHERE o_orderstatus = 'F'),
        |d AS (SELECT DISTINCT * FROM m)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |CAST(row_number() OVER (ORDER BY o_orderkey) AS INT) AS new_id FROM d ORDER BY new_id""".stripMargin,

    "q17_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM
        |(SELECT o_custkey, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |FROM orders) t WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q18_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q19_join_revenue" ->
      """WITH li AS (SELECT l_orderkey, floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) / 100.0 AS rev FROM lineitem)
        |SELECT r_name, n_name, count(*) AS n_items, round(sum(rev), 2) AS revenue
        |FROM li JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q20_join_left" ->
      """SELECT c_custkey, c_name, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |round(sum(coalesce(o_totalprice, 0)), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q21_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q22_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q23_json_roundtrip" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |'{"event_id":' || event_id || ',"k":' || CAST(json_extract_string(props, '$.k') AS INT) || '}' AS payload_json
        |FROM events ORDER BY event_id""".stripMargin,

    "q24_validity_routing" ->
      """SELECT event_id,
        |CASE WHEN event_id % 10 = 0 THEN -1 ELSE CAST(json_extract_string(props, '$.k') AS INT) END AS k,
        |CASE WHEN event_id % 10 = 0 THEN -1 ELSE CAST(json_extract_string(props, '$.k') AS INT) % 2 END AS prediction
        |FROM events ORDER BY event_id""".stripMargin,

    "q25_response_envelope" ->
      """WITH r AS (SELECT event_id,
        |CASE WHEN event_id % 10 = 0 THEN -1 ELSE CAST(json_extract_string(props, '$.k') AS INT) END AS k,
        |CASE WHEN event_id % 10 = 0 THEN -1 ELSE CAST(json_extract_string(props, '$.k') AS INT) % 2 END AS prediction
        |FROM events)
        |SELECT event_id, CASE WHEN prediction >= 0 THEN 'success' ELSE 'error' END AS status,
        |'{"event_id":' || event_id || ',"status":"' ||
        |(CASE WHEN prediction >= 0 THEN 'success' ELSE 'error' END) ||
        |'","result":{"k":' || k || ',"prediction":' || prediction || '}}' AS response_json
        |FROM r ORDER BY event_id""".stripMargin,

    "q26_text_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)
        |SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_words_re,
        |CAST(length(text) AS INT) AS len_chars,
        |round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
        |round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS avg_token_len
        |FROM t ORDER BY doc_id""".stripMargin,

    "q27_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS ntok,
        |CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk) AS sr FROM t)
        |SELECT doc_id, round(least(ntok / 50.0, 1.0), 4) AS length_score,
        |round(least(sr * 10.0, 1.0), 4) AS stop_score,
        |round((least(ntok / 50.0, 1.0) + least(sr * 10.0, 1.0)) / 2.0, 4) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,

    "q28_lang_id" ->
      """WITH t AS (SELECT doc_id, lang,
        |CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) >= 3
        |THEN 'en' ELSE 'other' END AS pred_lang FROM documents)
        |SELECT lang, pred_lang, count(*) AS n FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q29_fingerprints" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q30_exact_dedup" ->
      """SELECT text, min(doc_id) AS keeper_id, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY keeper_id""".stripMargin,

    "q31_minhash_sig" ->
      (shingleCte + "\nSELECT doc_id, mh0, mh1, mh2, mh3 FROM sig ORDER BY doc_id"),

    "q32_minhash_pairs" ->
      (shingleCte + "\nSELECT id_a, id_b FROM cand ORDER BY id_a, id_b"),

    "q33_near_dup" ->
      (shingleCte +
        """,
          |sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sset FROM sh GROUP BY doc_id),
          |j AS (SELECT id_a, id_b,
          |round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
          |(len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))), 4) AS jaccard
          |FROM cand JOIN sets a ON cand.id_a = a.doc_id JOIN sets b ON cand.id_b = b.doc_id)
          |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin),

    "q34_simhash" -> simhashSql,

    "q35_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS checksum,
        |'utf-8' AS format, CAST(octet_length(encode(text)) % 64 AS INT) AS stub_width
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q36_frame_sample" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        |f AS (SELECT doc_id, nb, unnest(range(0, greatest(CAST(floor(nb / 32) AS INT), 1))) AS fi FROM p)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |CAST(least(32, nb - fi * 32) AS INT) AS frame_bytes
        |FROM f WHERE fi % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin,

    "q37_cosine_topk" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 8),
        |s AS (SELECT q_id, vec_id,
        |list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
        |FROM base CROSS JOIN q WHERE vec_id <> q_id),
        |r AS (SELECT q_id, vec_id, cos,
        |row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
        |SELECT q_id, vec_id AS neighbor_id, round(cos, 6) AS cos_sim, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,

    "q38_lsh_buckets" -> lshBucketsSql,

    // Embedding near-dup: candidates share a deterministic LSH bucket
    // (same inlined hyperplanes as q38), the threshold filter runs on
    // the RAW cosine on both engines (rounding happens only in the
    // projection), and the cosine arithmetic is the bit-reproducible
    // sequential fold q37 already hash-matches on.
    "q40_embedding_neardup" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
         |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |list_dot_product(a.v, c.v) /
         |(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
         |FROM b a JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id)
         |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM p
         |WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin,

    "q39_ann_topk" -> annProbeSql,

    "q64_ann_ivf" -> annProbeSql,

    "q74_ann_multiprobe" -> annMultiProbeSql,

    "q43_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q44_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q45_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |coalesce(l_linestatus, '(all)') AS status,
        |CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |count(*) AS n, round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,

    "q46_pivot" ->
      """SELECT CAST(isodow(ts) AS INT) AS dow_mon1,
        |CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_sessionize" ->
      """WITH t AS (SELECT user_id, event_id, ts,
        |lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |FROM events),
        |s AS (SELECT user_id, event_id, ts,
        |CASE WHEN prev_ts IS NULL
        |  OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |  THEN 1 ELSE 0 END AS new_session
        |FROM t)
        |SELECT user_id, event_id, ts,
        |CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx
        |FROM s ORDER BY user_id, ts, event_id""".stripMargin,

    "q48_distinct_users" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |count(*) AS n_events FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q50_tfidf_top_term" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (SELECT doc_id, term,
        |round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS tfidf_r
        |FROM tf JOIN dfreq USING (term)),
        |ranked AS (SELECT doc_id, term, tfidf_r,
        |row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_r DESC, term) AS rk FROM scored)
        |SELECT doc_id, term AS top_term, round(tfidf_r, 4) AS tfidf
        |FROM ranked WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q51_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q54_label_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS pos,
        |round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS dim_mean
        |FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q56_topk_custom" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM
        |(SELECT o_custkey, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |FROM orders) t WHERE rk <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q57_deterministic_split" ->
      """WITH t AS (SELECT doc_id,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
        |FROM documents)
        |SELECT doc_id, bucket,
        |CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM t ORDER BY doc_id""".stripMargin,

    "q58_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM toks WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
        |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
        |o AS (SELECT doc_id, count(*) AS n_overlap FROM tr
        |      WHERE shingle IN (SELECT shingle FROM ev) GROUP BY doc_id),
        |s AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id)
        |SELECT s.doc_id, s.n_shingles,
        |CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
        |round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles, 4) AS contam_ratio
        |FROM s LEFT JOIN o ON s.doc_id = o.doc_id ORDER BY s.doc_id""".stripMargin,

    "q59_repetition_ratio" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM toks WHERE len(tk) >= 3)
        |SELECT doc_id, count(*) AS n_shingles,
        |CAST(count(DISTINCT shingle) AS BIGINT) AS n_distinct,
        |round(1.0 - CAST(count(DISTINCT shingle) AS DOUBLE) / count(*), 4) AS rep_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q60_asof_attribution" ->
      """WITH clicks AS (SELECT user_id, ts, max(event_id) AS click_id
        |FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purchases AS (SELECT user_id, ts, event_id AS purchase_id
        |FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
        |c.click_id AS attr_click_id, c.ts AS attr_click_ts
        |FROM purchases p ASOF JOIN clicks c
        |ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.purchase_id""".stripMargin,

    "q61_session_window" ->
      """WITH t AS (SELECT user_id, ts, value,
        |lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
        |s AS (SELECT user_id, ts, value,
        |CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |THEN 1 ELSE 0 END AS ns FROM t),
        |g AS (SELECT user_id, ts, value,
        |sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s)
        |SELECT user_id, min(ts) AS session_start,
        |max(ts) + INTERVAL 30 MINUTE AS session_end,
        |count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q62_mixture_sample" ->
      """WITH t AS (SELECT doc_id, source,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS INT) AS bucket
        |FROM documents)
        |SELECT doc_id, source, bucket FROM t
        |WHERE bucket < (CASE WHEN source = 'src0' THEN 1.0
        |WHEN source = 'src1' THEN 0.5 ELSE 0.25 END) * 10000
        |ORDER BY doc_id""".stripMargin,

    "q68_dup_clusters" ->
      ("WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
        """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |und AS (SELECT id_a AS a, id_b AS b FROM pairs
          |UNION ALL SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (SELECT a, b FROM und
          |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a)
          |SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
          |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin),

    "q72_cleaning_clustered" ->
      ("""WITH RECURSIVE gated AS (SELECT doc_id, text FROM documents
         |WHERE len(string_split(text, ' ')) >= 10),
         |canon AS (SELECT min(doc_id) AS doc_id, text FROM gated GROUP BY text),
         |""".stripMargin +
        shingleCascade("canon") + ",\n" + jaccardVerify + ",\n" +
        """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |und AS (SELECT id_a AS a, id_b AS b FROM pairs
          |UNION ALL SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (SELECT a, b FROM und
          |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          |losers AS (SELECT a AS doc_id FROM reach GROUP BY a
          |           HAVING least(a, min(b)) <> a)
          |SELECT c.doc_id, CAST(len(string_split(c.text, ' ')) AS INT) AS n_tokens,
          |md5(c.text) AS fingerprint
          |FROM canon c WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = c.doc_id)
          |ORDER BY c.doc_id""".stripMargin),

    "q71_simhash_pairs" ->
      (s"WITH $simhashCtes,\n" +
        """blocks AS (SELECT doc_id, 0 AS blk, (simhash >> 0) & 255 AS bv FROM ssig
          |UNION ALL SELECT doc_id, 1, (simhash >> 8) & 255 FROM ssig
          |UNION ALL SELECT doc_id, 2, (simhash >> 16) & 255 FROM ssig
          |UNION ALL SELECT doc_id, 3, (simhash >> 24) & 255 FROM ssig),
          |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM blocks a
          |JOIN blocks b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
          |SELECT c.id_a, c.id_b,
          |CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
          |FROM scand c JOIN ssig sa ON c.id_a = sa.doc_id
          |JOIN ssig sb ON c.id_b = sb.doc_id
          |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin),

    "q69_source_cap" ->
      """WITH t AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT doc_id, source,
        |row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk FROM t)
        |SELECT doc_id, source FROM r WHERE rk <= 50
        |ORDER BY source, doc_id""".stripMargin,

    "q70_token_budget" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 4) AS token_share
        |FROM a ORDER BY source""".stripMargin,

    "q66_shard_assign" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard
        |FROM documents)
        |SELECT doc_id, shard,
        |CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos
        |FROM t ORDER BY shard, pos""".stripMargin,

    "q67_sequence_pack" ->
      """WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard,
        |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |FROM documents),
        |o AS (SELECT doc_id, shard, n_tokens,
        |CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
        |FROM t)
        |SELECT doc_id, shard, n_tokens, start_offset,
        |CAST(floor(start_offset / 256.0) AS INT) AS pack_id
        |FROM o ORDER BY shard, start_offset, doc_id""".stripMargin,

    "q65_incremental_dedup" -> incrementalDedupSql,

    // Bloom admission only decides who SKIPS the exact anti-join —
    // might_contain=false is a guarantee of absence, the maybe-set is
    // re-checked exactly — so the result set is identical to q65's by
    // construction and the two queries share one oracle.
    "q77_bloom_dedup" -> incrementalDedupSql,

    "q63_paragraph_dedup" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |p0 AS (SELECT doc_id,
        |  list_transform(range(0, CAST(ceil(len(tk)/20.0) AS BIGINT)),
        |    i -> {'pos': i, 'fp': md5(array_to_string(tk[i*20+1 : i*20+20], ' '))}) AS pf FROM tok),
        |paras AS (SELECT doc_id, unnest(pf) AS u FROM p0),
        |flat AS (SELECT doc_id, u.pos AS pos, u.fp AS fp FROM paras),
        |shared AS (SELECT fp FROM flat GROUP BY fp HAVING count(DISTINCT doc_id) > 1),
        |marked AS (SELECT f.doc_id, f.pos, f.fp, s.fp IS NOT NULL AS is_dup
        |           FROM flat f LEFT JOIN shared s ON f.fp = s.fp)
        |SELECT doc_id, CAST(count(*) AS INT) AS n_paras,
        |CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS INT) AS n_dropped,
        |md5(coalesce(string_agg(fp, '|' ORDER BY pos) FILTER (WHERE NOT is_dup), '')) AS cleaned_fp
        |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q55_cleaning_pipeline" ->
      ("""WITH gated AS (SELECT doc_id, text FROM documents
         |WHERE len(string_split(text, ' ')) >= 10),
         |canon AS (SELECT min(doc_id) AS doc_id, text FROM gated GROUP BY text),
         |""".stripMargin +
        shingleCascade("canon") + ",\n" + jaccardVerify + ",\n" +
        """losers AS (SELECT DISTINCT id_b AS doc_id FROM j WHERE jaccard >= 0.2)
          |SELECT c.doc_id, CAST(len(string_split(c.text, ' ')) AS INT) AS n_tokens,
          |md5(c.text) AS fingerprint
          |FROM canon c WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = c.doc_id)
          |ORDER BY c.doc_id""".stripMargin),

    // Gopher-style quality gate: thresholds compare the ROUNDED
    // feature columns on both engines (the Spark operator reads back
    // its own projected columns); concat_ws skips NULL branches in
    // DuckDB exactly as array_join drops null elements in Spark, so
    // the reason list and the keep verdict match byte-for-byte. The
    // 3-gram denominator is len(tk)-2, the size of the gram list both
    // engines build; docs under 3 tokens short-circuit to 0.0.
    "q75_gopher_gate" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents),
        |f AS (SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS mean_token_len,
        |round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
        |CASE WHEN len(tk) < 3 THEN 0.0 ELSE
        |round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
        |i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2), 4) END AS rep_ratio
        |FROM t),
        |g AS (SELECT *, concat_ws(',',
        |CASE WHEN n_tokens < 10 OR n_tokens > 1000 THEN 'length' END,
        |CASE WHEN mean_token_len < 2.0 OR mean_token_len > 10.0 THEN 'token_len' END,
        |CASE WHEN stopword_ratio < 0.01 THEN 'stopwords' END,
        |CASE WHEN rep_ratio > 0.5 THEN 'repetition' END) AS reasons FROM f)
        |SELECT doc_id, n_tokens, mean_token_len, stopword_ratio, rep_ratio, reasons,
        |reasons = '' AS keep FROM g ORDER BY doc_id""".stripMargin,

    // int8 quantization roundtrip: scale = max|v_i|/127 computed once
    // and divided through exactly as the Spark side does, round() on
    // identical IEEE doubles, codes summarized as integer stats (no
    // array column in the compare), reconstruction error as the same
    // max-fold both engines evaluate component-in-order.
    "q76_quant_rt" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM base),
        |q AS (SELECT vec_id, v, scale,
        |CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS TINYINT))
        |ELSE list_transform(v, x -> CAST(round(x / scale) AS TINYINT)) END AS qvec FROM s),
        |d AS (SELECT vec_id, v, scale, qvec,
        |list_transform(qvec, c -> CAST(c AS DOUBLE) * scale) AS dv FROM q)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |CAST(list_sum(qvec) AS BIGINT) AS q_sum,
        |CAST(list_min(qvec) AS INT) AS q_min, CAST(list_max(qvec) AS INT) AS q_max,
        |round(list_max(list_transform(range(1, len(v) + 1), i -> abs(v[i] - dv[i]))), 6) AS max_abs_err
        |FROM d ORDER BY vec_id""".stripMargin,

    // Duplicated 5-gram fraction: the DISTINCT (doc, gram) projection
    // mirrors the Spark side's dropDuplicates; after it, a plain
    // count(*) per gram IS the distinct-doc count, so `shared` is the
    // same vocabulary both engines build. Docs under 5 tokens have no
    // grams and are absent from both results.
    "q78_dup_ngram_fraction" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM
        |  (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
        |   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS gram
        |   FROM toks WHERE len(tk) >= 5)),
        |shared AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
        |dup AS (SELECT doc_id, count(*) AS n_dup FROM g
        |        WHERE gram IN (SELECT gram FROM shared) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |round(coalesce(d.n_dup, 0) / CAST(t.n_grams AS DOUBLE), 4) AS dup_fraction
        |FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id ORDER BY t.doc_id""".stripMargin,

    // Semantic dedup: q40's bucketed-cosine pairs (same inlined
    // hyperplanes, same raw-cosine threshold) fed through the q68-style
    // recursive-CTE connected components; every vector is labeled with
    // its component min (its own id when unclustered) and the keep
    // verdict — the embedding-space twin of q72's cluster-canonical
    // convention.
    "q79_semantic_dedup" ->
      s"""WITH RECURSIVE base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
         |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
         |list_dot_product(a.v, c.v) /
         |(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
         |FROM b a JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id),
         |pairs AS (SELECT id_a, id_b FROM p WHERE cos >= 0.3),
         |und AS (SELECT id_a AS a, id_b AS b FROM pairs
         |UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (SELECT a, b FROM und
         |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |lbl AS (SELECT a AS vec_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
         |SELECT e.vec_id, CAST(coalesce(l.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
         |coalesce(l.cluster_id, e.vec_id) = e.vec_id AS keep
         |FROM embeddings e LEFT JOIN lbl l ON l.vec_id = e.vec_id ORDER BY e.vec_id""".stripMargin,

    // Boilerplate mining: the same 3-token shingle stream as q31's
    // cascade (incl. the len>=3 guard the UDTF implies), distinct per
    // (doc, gram) so each document votes once, tie-break on the gram
    // string so the top-20 cut is deterministic on both engines.
    "q80_boilerplate_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM toks WHERE len(tk) >= 3),
        |g AS (SELECT DISTINCT doc_id, shingle FROM sh)
        |SELECT shingle AS gram, count(*) AS doc_freq FROM g
        |GROUP BY 1 ORDER BY doc_freq DESC, gram LIMIT 20""".stripMargin,

    // Quantized ANN: codes built exactly as q76 (same scale, same
    // round), then cosine over the INTEGER codes — every product and
    // sum exact in double (≤127² per term, 64 terms), so no float
    // accumulation order exists and the scores hash-match.
    "q81_quantized_topk" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM base),
        |q AS (SELECT vec_id, CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |ELSE list_transform(v, x -> round(x / scale)) END AS qv FROM s),
        |qs AS (SELECT vec_id AS q_id, qv AS qqv FROM q WHERE vec_id < 8),
        |sc AS (SELECT qs.q_id, q.vec_id,
        |CASE WHEN list_dot_product(q.qv, q.qv) = 0 OR list_dot_product(qs.qqv, qs.qqv) = 0 THEN 0.0
        |ELSE list_dot_product(q.qv, qs.qqv) /
        |(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(qs.qqv, qs.qqv))) END AS qcos
        |FROM q CROSS JOIN qs WHERE q.vec_id <> qs.q_id),
        |r AS (SELECT q_id, vec_id, qcos,
        |row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, vec_id) AS rk FROM sc)
        |SELECT q_id, vec_id AS neighbor_id, round(qcos, 6) AS qcos_sim, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // Per-source quality calibration: quality rounded to 4 decimals
    // BEFORE the median so quantile_cont and Spark's percentile
    // interpolate identical multisets (the q11-proven pairing).
    "q82_source_quality_gate" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |sc AS (SELECT doc_id, source,
        |round((least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) +
        |least(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk) * 10.0, 1.0)) / 2.0, 4) AS quality
        |FROM t),
        |m AS (SELECT source, round(quantile_cont(quality, 0.5), 4) AS src_median FROM sc GROUP BY source)
        |SELECT sc.doc_id, sc.source, sc.quality, m.src_median,
        |sc.quality >= m.src_median AS keep
        |FROM sc JOIN m USING (source) ORDER BY sc.doc_id""".stripMargin,

    // Matryoshka truncation report: v[1:16] is DuckDB's inclusive
    // 1-based slice = Spark's slice(v, 1, 16); norms via the
    // bit-identical sequential-fold pairing (q37-proven); min/max/
    // element-pick commute, so every reported number is order-free.
    "q83_normalize_truncate" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |t AS (SELECT vec_id, v, v[1:16] AS tv FROM base),
        |n AS (SELECT vec_id, tv, sqrt(list_dot_product(v, v)) AS norm_full,
        |sqrt(list_dot_product(tv, tv)) AS norm_t FROM t),
        |r AS (SELECT vec_id, norm_full, norm_t,
        |list_transform(tv, x -> x / norm_t) AS rn FROM n)
        |SELECT vec_id, round(norm_full, 6) AS norm_full,
        |round(norm_t / norm_full, 6) AS energy_ratio,
        |round(rn[1], 6) AS t_first, round(list_min(rn), 6) AS t_min,
        |round(list_max(rn), 6) AS t_max
        |FROM r ORDER BY vec_id""".stripMargin,

    // Boilerplate coverage: the q80 top-20 list rebuilt inline (same
    // deterministic tie-break), then per-doc membership fractions over
    // the same distinct (doc, gram) stream.
    "q84_boilerplate_coverage" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM toks WHERE len(tk) >= 3),
        |g AS (SELECT DISTINCT doc_id, shingle FROM sh),
        |hot AS (SELECT shingle FROM (
        |  SELECT shingle, count(*) AS doc_freq FROM g GROUP BY 1
        |  ORDER BY doc_freq DESC, shingle LIMIT 20)),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
        |onl AS (SELECT doc_id, count(*) AS n_boiler FROM g
        |        WHERE shingle IN (SELECT shingle FROM hot) GROUP BY doc_id)
        |SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
        |round(coalesce(o.n_boiler, 0) / CAST(t.n_grams AS DOUBLE), 4) AS boiler_fraction
        |FROM tot t LEFT JOIN onl o ON t.doc_id = o.doc_id ORDER BY t.doc_id""".stripMargin,

    // Hard negatives: the q37 cosine pairing with the label
    // inequality in the join — deterministic scores, ties on vec_id.
    "q85_hard_negatives" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |a AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM base WHERE vec_id < 8),
        |s AS (SELECT a.q_id, b.vec_id, b.label AS n_label,
        |list_dot_product(b.v, a.qv) /
        |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(a.qv, a.qv))) AS cos
        |FROM base b JOIN a ON b.label <> a.q_label),
        |r AS (SELECT q_id, vec_id, n_label, cos,
        |row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s)
        |SELECT q_id, vec_id AS neighbor_id, n_label, round(cos, 6) AS cos_sim, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // Temperature mixture (T=2): keep rate = sqrt(n_min/n_grp) — IEEE
    // sqrt is correctly rounded in both engines, so the rounded rates
    // and the bucket<rate*10000 admissions match exactly. Bucket =
    // the q62/q66 md5 idiom.
    "q86_temperature_mixture" ->
      """WITH c AS (SELECT lang, count(*) AS n_grp FROM documents GROUP BY lang),
        |m AS (SELECT min(n_grp) AS n_min FROM c),
        |r AS (SELECT lang, n_grp,
        |round(sqrt(CAST(n_min AS DOUBLE) / n_grp), 6) AS keep_rate FROM c CROSS JOIN m),
        |t AS (SELECT doc_id, lang,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS INT) AS bucket
        |FROM documents)
        |SELECT t.doc_id, t.lang, CAST(r.n_grp AS BIGINT) AS n_grp, r.keep_rate
        |FROM t JOIN r USING (lang)
        |WHERE t.bucket < r.keep_rate * 10000
        |ORDER BY t.doc_id""".stripMargin,

    // Diversity sample: the q38 bucket terms + a per-bucket md5-order
    // cap — row_number twin of the heap operator's selection.
    "q92_diversity_sample" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, CAST(${bucketTerms("v")} AS INT) AS bucket_id,
         |md5(CAST(vec_id AS VARCHAR)) AS h FROM base),
         |r AS (SELECT bucket_id, vec_id,
         |row_number() OVER (PARTITION BY bucket_id ORDER BY h, vec_id) AS rk FROM b)
         |SELECT bucket_id, vec_id FROM r WHERE rk <= 4
         |ORDER BY bucket_id, vec_id""".stripMargin,

    // ANN recall: the q37 exact ranking LEFT JOIN the q39 bucketed
    // ranking, per-query hit counting — the report is deterministic
    // because both neighbor sets are.
    "q93_ann_recall" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket_id FROM b WHERE vec_id < 8),
         |ex AS (SELECT q.q_id, base.vec_id, row_number() OVER (PARTITION BY q.q_id
         |ORDER BY list_dot_product(base.v, q.qv) /
         |(sqrt(list_dot_product(base.v, base.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
         |base.vec_id) AS rk FROM base CROSS JOIN q WHERE base.vec_id <> q.q_id),
         |an AS (SELECT q.q_id, b.vec_id, row_number() OVER (PARTITION BY q.q_id
         |ORDER BY list_dot_product(b.v, q.qv) /
         |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
         |b.vec_id) AS rk FROM b JOIN q ON b.bucket_id = q.bucket_id WHERE b.vec_id <> q.q_id),
         |e5 AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
         |a5 AS (SELECT q_id, vec_id FROM an WHERE rk <= 5)
         |SELECT e5.q_id, CAST(count(*) AS INT) AS k_exact, CAST(count(a5.vec_id) AS INT) AS hits,
         |round(count(a5.vec_id) / CAST(count(*) AS DOUBLE), 4) AS recall
         |FROM e5 LEFT JOIN a5 ON e5.q_id = a5.q_id AND e5.vec_id = a5.vec_id
         |GROUP BY e5.q_id ORDER BY e5.q_id""".stripMargin,

    // Centroid outliers: the q54 per-dim centroid (rounded to 6 on
    // both sides — the one order-sensitive reduction, quantized
    // identically) reassembled into a list, then the q37 cosine
    // pairing and a worst-k-per-label window (ascending cosine).
    "q87_centroid_outliers" ->
      """WITH base AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT label, i, round(avg(v[i]), 6) AS m
        |      FROM base, range(1, 65) t(i) GROUP BY label, i),
        |cent AS (SELECT label, list(m ORDER BY i) AS cv FROM c GROUP BY label),
        |s AS (SELECT b.vec_id, b.label,
        |list_dot_product(b.v, cent.cv) /
        |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(cent.cv, cent.cv))) AS cos
        |FROM base b JOIN cent USING (label)),
        |r AS (SELECT label, vec_id, cos,
        |row_number() OVER (PARTITION BY label ORDER BY cos ASC, vec_id) AS rk FROM s)
        |SELECT label, vec_id, round(cos, 6) AS cos_centroid, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 5 ORDER BY label, rk""".stripMargin,

    // kNN prediction: q37's neighbor ranking, then integer voting —
    // majority label, ties toward the smaller label.
    "q88_knn_predict" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS true_label FROM base WHERE vec_id < 8),
        |s AS (SELECT q_id, true_label, vec_id, label,
        |list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
        |FROM base CROSS JOIN q WHERE vec_id <> q_id),
        |r AS (SELECT q_id, true_label, label, cos,
        |row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rk FROM s),
        |v AS (SELECT q_id, true_label, label, CAST(count(*) AS INT) AS votes
        |      FROM r WHERE rk <= 10 GROUP BY q_id, true_label, label),
        |p AS (SELECT q_id, true_label, label, votes,
        |row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label ASC) AS vr FROM v)
        |SELECT q_id, true_label, label AS pred_label, votes FROM p WHERE vr = 1
        |ORDER BY q_id""".stripMargin,

    // Sequential Poisson sampling: priority = exact md5 integer / w —
    // ONE IEEE division, bit-identical in both engines; top-n by
    // (priority, doc_id). The md5 integer idiom is q86's.
    "q89_pps_sample" ->
      """WITH p AS (SELECT doc_id, source, n_chars,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
        |  / n_chars AS priority
        |FROM documents),
        |k AS (SELECT doc_id, source, n_chars, priority FROM p
        |      ORDER BY priority, doc_id LIMIT 200)
        |SELECT CAST(row_number() OVER (ORDER BY priority, doc_id) AS INT) AS rk,
        |doc_id, source, n_chars, round(priority, 6) AS priority
        |FROM k ORDER BY rk""".stripMargin,

    // Snapshot diff: both revisions derived by the same residue rules
    // as the Spark entry, compared on md5 fingerprints only.
    "q90_snapshot_diff" ->
      """WITH s_old AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 3),
        |s_new AS (SELECT doc_id,
        |CASE WHEN doc_id % 13 = 0 THEN md5(text || ' (rev2)') ELSE md5(text) END AS fp
        |FROM documents WHERE doc_id % 11 <> 0),
        |j AS (SELECT o.doc_id AS o_id, o.fp AS o_fp, n.doc_id AS n_id, n.fp AS n_fp
        |      FROM s_old o FULL OUTER JOIN s_new n ON o.doc_id = n.doc_id)
        |SELECT coalesce(o_id, n_id) AS doc_id,
        |CASE WHEN o_id IS NULL THEN 'added' WHEN n_id IS NULL THEN 'removed'
        |     WHEN o_fp <> n_fp THEN 'changed' END AS status
        |FROM j WHERE o_id IS NULL OR n_id IS NULL OR o_fp <> n_fp
        |ORDER BY doc_id""".stripMargin,

    // Epoch expansion: floor(f) repeats + one more when the q86-idiom
    // md5 bucket clears the fractional part; range() is exclusive at
    // the top, mirroring Spark's inclusive sequence(1, n_rep).
    "q91_epoch_expand" ->
      """WITH f AS (SELECT doc_id, source,
        |CASE WHEN source = 'src0' THEN 2.5 WHEN source = 'src1' THEN 1.0 ELSE 0.5 END AS f,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS INT) AS bucket
        |FROM documents),
        |n AS (SELECT doc_id, source,
        |CAST(floor(f) + CASE WHEN bucket < (f - floor(f)) * 10000 THEN 1 ELSE 0 END AS INT) AS n_rep
        |FROM f)
        |SELECT doc_id, source, n_rep, CAST(unnest(range(1, n_rep + 1)) AS INT) AS epoch
        |FROM n WHERE n_rep >= 1 ORDER BY doc_id, epoch""".stripMargin,

    // PII scrub: the seeding CTE mirrors TextAnalysis.seedPii
    // token-for-token; the patterns interpolate from the SAME Scala
    // constants the Spark side compiles (Java-regex/RE2 common
    // subset). Sequential counting mirrors the operator: each class
    // counted on the text its replacement pass sees, so counts
    // reconcile exactly with emitted placeholders.
    "q73_pii_scrub" ->
      s"""WITH dirty AS (SELECT doc_id, text ||
         |CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |CASE WHEN doc_id % 5 = 0 THEN ' host ' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 7 % 256 AS VARCHAR) || '.10.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
         |CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS text
         |FROM documents),
         |passes AS (SELECT doc_id, text,
         |regexp_replace(text, '${TextAnalysis.emailPattern}', '<EMAIL>', 'g') AS after_email,
         |regexp_replace(regexp_replace(text, '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
         |'${TextAnalysis.ipv4Pattern}', '<IP>', 'g') AS after_ip
         |FROM dirty)
         |SELECT doc_id,
         |regexp_replace(after_ip, '${TextAnalysis.phonePattern}', '<PHONE>', 'g') AS clean_text,
         |CAST(len(regexp_extract_all(text, '${TextAnalysis.emailPattern}')) AS INT) AS n_emails,
         |CAST(len(regexp_extract_all(after_email, '${TextAnalysis.ipv4Pattern}')) AS INT) AS n_ips,
         |CAST(len(regexp_extract_all(after_ip, '${TextAnalysis.phonePattern}')) AS INT) AS n_phones
         |FROM passes ORDER BY doc_id""".stripMargin,

    // CUBE: q45's rollup twin with the full grouping-set lattice.
    "q94_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |coalesce(l_linestatus, '(all)') AS status,
        |CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |count(*) AS n, round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,

    // Trailing-frame z-score. NULLS FIRST pinned explicitly: Spark's
    // ASC default is nulls-first, DuckDB's is nulls-last — the frame
    // CONTENT depends on it. Filter on the rounded z like the operator.
    "q95_moving_zscore" ->
      """WITH w AS (SELECT event_id, event_type, value,
        |avg(value) OVER fr AS ma, stddev_samp(value) OVER fr AS sd
        |FROM events WINDOW fr AS (PARTITION BY event_type
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |  ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, round(value, 4) AS value,
        |round((value - ma) / sd, 4) AS zscore
        |FROM w WHERE sd > 0 AND abs(round((value - ma) / sd, 4)) > 3.0
        |ORDER BY event_id""".stripMargin,

    "q96_rank_family" ->
      """SELECT o_orderkey, o_orderpriority,
        |CAST(ntile(4) OVER w AS INT) AS quartile,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cume
        |FROM orders WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // Random projection: the sign matrix is md5-derived on both
    // engines. list_reduce folds left-to-right exactly like Spark's
    // aggregate (0 + t1 starts both folds at t1), so the double
    // summation ORDER is identical — the round(…, 4) is exact parity,
    // not a tolerance.
    "q97_random_projection" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, v, unnest(range(0, 16)) AS j FROM e)
        |SELECT vec_id, CAST(j AS INT) AS rp_dim,
        |CASE WHEN len(v) = 0 THEN 0.0 ELSE
        |round(list_reduce(list_transform(v, (el, i) -> el *
        |  CASE WHEN substring(md5(CAST(j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)), 1, 1) < '8'
        |       THEN 1.0 ELSE -1.0 END), (a, b) -> a + b), 4) END AS rp_val
        |FROM x ORDER BY vec_id, rp_dim""".stripMargin,

    // k-means: the assign/update recurrence is unrolled from the same
    // Scala loop shape as the operator; every centroid coordinate is
    // round(6)-re-synced per update and every distance round(6)-ed
    // before the argmin, so the trajectories are bit-identical.
    // list_position/array_position both return the FIRST match →
    // identical tie-breaks. list_reduce folds like Spark's aggregate
    // (q97 precedent); len(v)=0 guard for DuckDB's empty-fold error.
    "q142_kmeans" ->
      s"""WITH ${kmeansCtes(4, 3)}
         |SELECT vec_id, cluster, round(dist_r, 4) AS dist2
         |FROM a4 ORDER BY vec_id""".stripMargin,

    // OHLC: open/close via row_number in DuckDB ≡ Spark's struct
    // min/max (same (whole-second, event_id) tie key — the q131
    // engine-neutral order; raw-ts order could differ, nanos vs
    // micros). O/H/L/C are raw parquet doubles — no rounding needed.
    "q143_ohlc_bars" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS bar_ts,
        |  date_trunc('second', ts) AS sec, event_id, value FROM events),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY event_type, bar_ts
        |    ORDER BY sec, event_id) AS rn_a,
        |  row_number() OVER (PARTITION BY event_type, bar_ts
        |    ORDER BY sec DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, bar_ts,
        |max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |max(value) AS high, min(value) AS low,
        |max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |count(*) AS n_events
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Triangles: ordered-triple join counts each triangle once; the
    // per-token census explodes [a, b, c].
    "q144_triangles" ->
      """WITH t AS (SELECT DISTINCT doc_id,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
        |top AS (SELECT term FROM dfreq ORDER BY df DESC, term LIMIT 50),
        |dt AS (SELECT t.doc_id, t.term FROM t JOIN top USING (term)),
        |e AS (SELECT DISTINCT a.term AS src, b.term AS dst
        |      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term),
        |tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        |        FROM e e1 JOIN e e2 ON e1.dst = e2.src
        |        JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst),
        |x AS (SELECT unnest([a, b, c]) AS term FROM tri)
        |SELECT term, count(*) AS n_triangles FROM x GROUP BY 1
        |ORDER BY n_triangles DESC, term ASC LIMIT 20""".stripMargin,

    // Hashed linear classifier: per-token INTEGER weights (exact,
    // order-independent sum) and one final IEEE division — the margin
    // is bit-identical across engines; floor(x·1e4+½) rounding (the
    // moneyRound convention), no transcendental anywhere.
    "q145_hashed_classifier" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |              FROM documents),
        |w AS (SELECT doc_id,
        |      CAST(concat('0x', substring(md5('w:' || tok), 1, 8)) AS BIGINT)
        |        % 4096 % 1001 - 500 AS wt FROM toks),
        |s AS (SELECT doc_id, count(*) AS n_tokens, sum(wt) AS ws
        |      FROM w GROUP BY doc_id),
        |m AS (SELECT doc_id, n_tokens,
        |      CAST(ws AS DOUBLE) / (n_tokens * 1000.0) AS margin FROM s)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |floor(margin * 10000 + 0.5) / 10000 AS margin,
        |margin >= 0 AS keep FROM m ORDER BY doc_id""".stripMargin,

    // OOV rate vs the corpus top-100 head; (cnt desc, term asc)
    // tie-break pins the same head in both engines.
    "q146_oov_rate" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |              FROM documents),
        |tf AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        |vocab AS (SELECT term FROM tf ORDER BY cnt DESC, term ASC LIMIT 16),
        |agg AS (SELECT t.doc_id, count(*) AS n_tokens,
        |        CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_oov
        |        FROM toks t LEFT JOIN vocab v ON t.term = v.term
        |        GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_oov,
        |floor(n_oov / CAST(n_tokens AS DOUBLE) * 10000 + 0.5) / 10000
        |  AS oov_rate FROM agg ORDER BY doc_id""".stripMargin,

    // Anchored power-sum moments: every sum is an exact integer
    // (cents / HUGEINT); the closing double formulas are TEXTUALLY
    // identical to the Spark selectExpr, so the few IEEE ops replay
    // bit-for-bit. `//` is DuckDB's integral division (Spark `div`);
    // both truncate identically on the non-negative sums here.
    "q147_power_moments" ->
      """WITH cents AS (SELECT event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events),
        |a AS (SELECT event_type, count(*) AS n, sum(c) AS s1c
        |      FROM cents GROUP BY event_type),
        |an AS (SELECT event_type, n, s1c,
        |       CAST(s1c // n AS BIGINT) AS anchor FROM a),
        |d AS (SELECT c.event_type, n, s1c, c.c - anchor AS d,
        |      (c.c - anchor) * (c.c - anchor) AS d2
        |      FROM cents c JOIN an USING (event_type)),
        |s AS (SELECT event_type, n, s1c, sum(d) AS S1, sum(d2) AS S2,
        |      sum(CAST(d2 AS HUGEINT) * d) AS S3,
        |      sum(CAST(d2 AS HUGEINT) * d2) AS S4
        |      FROM d GROUP BY event_type, n, s1c),
        |x AS (SELECT event_type, n, CAST(s1c AS DOUBLE) AS t1,
        |      CAST(n AS DOUBLE) AS nd, CAST(S1 AS DOUBLE) AS x1,
        |      CAST(S2 AS DOUBLE) AS x2, CAST(S3 AS DOUBLE) AS x3,
        |      CAST(S4 AS DOUBLE) AS x4 FROM s),
        |m AS (SELECT event_type, n,
        |      t1 / nd / 100.0 AS mean,
        |      (nd * x2 - x1 * x1) / (nd * nd) / 10000.0 AS var_,
        |      (nd * nd * x3 - 3 * nd * x1 * x2 + 2 * x1 * x1 * x1) / (nd * nd * nd) AS m3,
        |      (nd * nd * nd * x4 - 4 * nd * nd * x1 * x3 + 6 * nd * x1 * x1 * x2 - 3 * x1 * x1 * x1 * x1) / (nd * nd * nd * nd) AS m4,
        |      (nd * x2 - x1 * x1) / (nd * nd) AS m2 FROM x)
        |SELECT event_type, n,
        |floor(mean * 10000 + 0.5) / 10000 AS mean,
        |floor(var_ * 10000 + 0.5) / 10000 AS variance,
        |floor(m3 / (m2 * sqrt(m2)) * 10000 + 0.5) / 10000 AS skewness,
        |floor((m4 / (m2 * m2) - 3) * 10000 + 0.5) / 10000 AS ex_kurtosis
        |FROM m ORDER BY event_type""".stripMargin,

    // Embedding dimension audit: parallel unnests zip positionally, so
    // dim matches Spark's posexplode ordinal; micro-unit quantization
    // keeps every sum an exact integer.
    "q148_embedding_dims" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT unnest(range(0, len(v))) AS dim, unnest(v) AS x FROM e),
        |q AS (SELECT dim, CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS xq FROM x),
        |s AS (SELECT dim, count(*) AS n, sum(xq) AS S1, sum(xq * xq) AS S2
        |      FROM q GROUP BY dim),
        |v AS (SELECT dim, n, S1, n * S2 - S1 * S1 AS vnum FROM s),
        |t AS (SELECT dim, n, S1, vnum, sum(vnum) OVER () AS vtot,
        |      CAST(row_number() OVER (ORDER BY vnum DESC, dim ASC) AS INT)
        |        AS var_rank FROM v)
        |SELECT CAST(dim AS INT) AS dim, n,
        |floor(CAST(S1 AS DOUBLE) / n / 1000000.0 * 1000000 + 0.5) / 1000000 AS mean,
        |floor(CAST(vnum AS DOUBLE) / (CAST(n AS DOUBLE) * n) / 1000000000000.0 * 1000000 + 0.5) / 1000000 AS variance,
        |floor(CAST(vnum AS DOUBLE) / CAST(vtot AS DOUBLE) * 10000 + 0.5) / 10000 AS var_share,
        |var_rank FROM t ORDER BY dim""".stripMargin,

    // Compaction planner: integer byte model, cumulative-before
    // binning; every emitted aggregate cast back to BIGINT (DuckDB
    // sums integers into HUGEINT, which pandas would read as float).
    "q149_compaction_plan" ->
      """WITH f AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  count(*) AS n_rows,
        |  sum(len(o_orderstatus) + len(o_orderpriority) + 96) AS bytes
        |  FROM orders GROUP BY day),
        |c AS (SELECT day, n_rows, bytes,
        |      coalesce(sum(bytes) OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |        AS cum_before FROM f),
        |g AS (SELECT day, n_rows, bytes,
        |      CAST(cum_before // 65536 AS BIGINT) AS grp FROM c)
        |SELECT grp, count(*) AS n_files,
        |CAST(sum(n_rows) AS BIGINT) AS n_rows,
        |CAST(sum(bytes) AS BIGINT) AS group_bytes,
        |min(day) AS first_day, max(day) AS last_day,
        |CAST(sum(CASE WHEN bytes < 8192 THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_undersized
        |FROM g GROUP BY grp ORDER BY grp""".stripMargin,

    // Association rules: all counts exact on the distinct (user, type)
    // projection; ratio formulas textually identical to the Spark side.
    "q150_event_assoc" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
        |t AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY event_type),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |      count(*) AS n_ab
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id
        |        AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |floor(CAST(n_ab AS DOUBLE) / n_users * 10000 + 0.5) / 10000 AS support,
        |floor(CAST(n_ab AS DOUBLE) / ta.n_t * 10000 + 0.5) / 10000 AS conf_a_b,
        |floor(CAST(n_ab AS DOUBLE) / tb.n_t * 10000 + 0.5) / 10000 AS conf_b_a,
        |floor(CAST(n_ab AS DOUBLE) * n_users / (CAST(ta.n_t AS DOUBLE) * tb.n_t) * 10000 + 0.5) / 10000 AS lift
        |FROM p JOIN t ta ON p.type_a = ta.event_type
        |JOIN t tb ON p.type_b = tb.event_type
        |CROSS JOIN u ORDER BY type_a, type_b""".stripMargin,

    // Corpus health report: canonical fingerprint (q29's normalization)
    // + q11's exact-percentile convention, rolled up per source.
    "q151_corpus_report" ->
      """WITH fp AS (SELECT source, lang, n_chars,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |ff AS (SELECT fingerprint, count(*) AS n_fp FROM fp GROUP BY fingerprint)
        |SELECT source, count(*) AS n_docs,
        |count(DISTINCT lang) AS n_langs,
        |CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
        |CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |floor(CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*) * 10000 + 0.5) / 10000 AS dup_fraction
        |FROM fp JOIN ff USING (fingerprint)
        |GROUP BY source ORDER BY source""".stripMargin,

    // Hybrid RRF: the q138 BM25 CTEs at k=20 + a hashed signed-BoW
    // dense ranker (q145's md5 idiom; integer dots/norms so the one
    // cosine per candidate replays bit-exactly) fused by
    // 1/(60+rank). CAST(1 AS DOUBLE): a bare 1.0 is DECIMAL in
    // DuckDB and decimal division rounds differently than IEEE.
    "q152_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM tf GROUP BY 1),
        |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 8),
        |scored AS (SELECT q.q_id, tf.doc_id,
        |    round(sum(
        |      ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |        * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
        |            + 0.75 * dl.dl * n.n_docs / tot.total))), 6) AS score_r
        |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
        |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
        |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
        |lex AS (SELECT q_id, doc_id, rk_lex FROM (
        |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY score_r DESC, doc_id) AS INT) AS rk_lex FROM scored)
        |  WHERE rk_lex <= 20),
        |sp AS (SELECT doc_id,
        |    CAST(concat('0x', substring(md5('d:' || term), 1, 8)) AS BIGINT)
        |      % 64 AS j,
        |    CASE WHEN CAST(concat('0x', substring(md5('s:' || term), 1, 8))
        |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s FROM t),
        |sv AS (SELECT doc_id, j, CAST(sum(s) AS BIGINT) AS v
        |       FROM sp GROUP BY 1, 2 HAVING sum(s) <> 0),
        |nrm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS nrm
        |        FROM sv GROUP BY 1),
        |qv AS (SELECT doc_id AS q_id, j, v AS vq FROM sv WHERE doc_id < 8),
        |dotp AS (SELECT qv.q_id, sv.doc_id,
        |    CAST(sum(sv.v * qv.vq) AS BIGINT) AS dot
        |  FROM sv JOIN qv USING (j) WHERE sv.doc_id <> qv.q_id
        |  GROUP BY 1, 2),
        |dsc AS (SELECT dp.q_id, dp.doc_id,
        |    round(CAST(dp.dot AS DOUBLE)
        |      / sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6)
        |      AS cos_r
        |  FROM dotp dp JOIN nrm n1 ON n1.doc_id = dp.doc_id
        |  JOIN nrm n2 ON n2.doc_id = dp.q_id),
        |dense AS (SELECT q_id, doc_id, rk_dense FROM (
        |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_r DESC, doc_id) AS INT) AS rk_dense FROM dsc)
        |  WHERE rk_dense <= 20),
        |fused AS (SELECT coalesce(l.q_id, de.q_id) AS q_id,
        |    coalesce(l.doc_id, de.doc_id) AS doc_id,
        |    l.rk_lex, de.rk_dense,
        |    round(coalesce(CAST(1 AS DOUBLE) / (60 + l.rk_lex), 0)
        |      + coalesce(CAST(1 AS DOUBLE) / (60 + de.rk_dense), 0), 6)
        |      AS rrf
        |  FROM lex l FULL OUTER JOIN dense de
        |    ON l.q_id = de.q_id AND l.doc_id = de.doc_id)
        |SELECT q_id, doc_id, rrf, rk_lex, rk_dense, rk FROM (
        |  SELECT q_id, doc_id, rrf, rk_lex, rk_dense,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY rrf DESC, doc_id) AS INT) AS rk FROM fused)
        |WHERE rk <= 10 ORDER BY q_id, rk""".stripMargin,

    // Normalization audit: EXPLICIT whitespace class (Java \s includes
    // \x0B, RE2's does not — the explicit class is the engine-neutral
    // subset); only lengths + md5 cross the wire.
    "q98_normalize_text" ->
      """WITH n AS (SELECT doc_id, text,
        |trim(regexp_replace(regexp_replace(regexp_replace(
        |  lower(text), '[ \t\n\f\r]+', ' ', 'g'), '[^ -~]', '', 'g'), ' +', ' ', 'g')) AS nt
        |FROM documents)
        |SELECT doc_id, CAST(length(text) AS INT) AS n_raw,
        |CAST(length(nt) AS INT) AS n_norm, md5(nt) AS norm_fp
        |FROM n ORDER BY doc_id""".stripMargin,

    // Character entropy: the oracle groups exploded characters — after
    // array_sort, Spark's run lengths ARE the per-character counts, so
    // Σ c·ln(c) over runs ≡ Σ cnt·ln(cnt) over distinct chars. Empty
    // docs fall out of the WHERE and re-enter via the left join with
    // 0/0/NULL, matching the operator's guard branches.
    "q99_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |FROM documents WHERE length(text) > 0),
        |rc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
        |e AS (SELECT doc_id, CAST(sum(cnt) AS INT) AS len_chars,
        |CAST(count(*) AS INT) AS n_distinct_chars,
        |round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4) AS char_entropy
        |FROM rc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(e.len_chars, 0) AS len_chars,
        |coalesce(e.n_distinct_chars, 0) AS n_distinct_chars, e.char_entropy
        |FROM documents d LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Chunking: DuckDB list slices are 1-based inclusive-inclusive, so
    // tk[start : start + 63] ≡ Spark slice(tk, start, 64); both
    // truncate past the end. start ≡ 1 (mod 48) ⇒ the idx division is
    // exact and round-vs-truncate cast semantics can't diverge.
    "q100_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, tk,
        |CAST(unnest(range(1, len(tk) + 1, 48)) AS INT) AS start
        |FROM t WHERE len(tk) >= 1)
        |SELECT doc_id, CAST((start - 1) // 48 AS INT) AS chunk_idx,
        |CAST(len(tk[start : start + 63]) AS INT) AS chunk_tokens,
        |md5(array_to_string(tk[start : start + 63], ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // Latest-per-key: row_number twin of the max(struct) — (ts,
    // event_id) DESC with event_id unique picks the same survivor the
    // lexicographic struct max does.
    "q101_latest_per_key" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value,
        |row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events)
        |SELECT user_id, event_id AS last_event_id,
        |event_type AS last_event_type, round(value, 4) AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Cross-source duplication: per-(fp, source) counts self-joined on
    // fp; diagonal keeps only fingerprints with ≥ 2 copies in-source.
    // Paragraph level — q63's 20-token chunking CTE provides the fps.
    "q102_cross_source_dups" ->
      """WITH tok AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
        |p0 AS (SELECT source,
        |  list_transform(range(0, CAST(ceil(len(tk)/20.0) AS BIGINT)),
        |    i -> md5(array_to_string(tk[i*20+1 : i*20+20], ' '))) AS pf FROM tok),
        |fps AS (SELECT source, unnest(pf) AS fp FROM p0),
        |fs AS (SELECT fp, source, count(*) AS n FROM fps GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |count(*) AS shared_fps
        |FROM fs a JOIN fs b ON a.fp = b.fp
        |WHERE a.source < b.source OR (a.source = b.source AND a.n >= 2)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Length histogram: integer floor-division bucketing is exact on
    // both engines; the cumulative window's RANGE default equals
    // Spark's ROWS frame because bucket_lo is distinct per row.
    "q103_length_histogram" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) // 32 AS INT) * 32 AS bucket_lo
        |FROM documents),
        |g AS (SELECT bucket_lo, count(*) AS n_docs FROM t GROUP BY 1)
        |SELECT bucket_lo, n_docs,
        |round(CAST(sum(n_docs) OVER (ORDER BY bucket_lo) AS DOUBLE) /
        |      CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS cum_frac
        |FROM g ORDER BY bucket_lo""".stripMargin,

    // Cluster-size distribution: q68's recursive-CTE labeling, then
    // two group-bys (cluster → size, size → count).
    "q104_cluster_sizes" ->
      ("WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
        """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |und AS (SELECT id_a AS a, id_b AS b FROM pairs
          |UNION ALL SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (SELECT a, b FROM und
          |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
          |        FROM reach GROUP BY a),
          |cs AS (SELECT cluster_id, count(*) AS sz FROM lab GROUP BY 1)
          |SELECT CAST(sz AS BIGINT) AS cluster_size, count(*) AS n_clusters
          |FROM cs GROUP BY 1 ORDER BY 1""".stripMargin),

    // Hot keys: ties on n break by key in both engines' ORDER BY.
    "q105_hot_keys" ->
      """WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM events)
        |SELECT key, n, round(CAST(n AS DOUBLE) / total, 6) AS frac
        |FROM c, t ORDER BY n DESC, key LIMIT 20""".stripMargin,

    // Pipeline funnel: q75's gate rules → exact dedup among survivors
    // → q58's shingle-overlap decontamination (explicit %10 eval set),
    // counted per source via the same left-join flags the operator
    // aggregates.
    "q106_pipeline_funnel" ->
      """WITH t AS (SELECT doc_id, source, text, string_split(text, ' ') AS tk FROM documents),
        |f AS (SELECT doc_id, source, text, tk,
        |CAST(len(tk) AS INT) AS n_tokens,
        |round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS mean_token_len,
        |round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
        |CASE WHEN len(tk) < 3 THEN 0.0 ELSE
        |round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
        |i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2), 4) END AS rep_ratio
        |FROM t),
        |gated AS (SELECT doc_id, source, text, tk FROM f
        |WHERE n_tokens >= 10 AND n_tokens <= 1000
        |  AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
        |  AND stopword_ratio >= 0.01 AND rep_ratio <= 0.5),
        |canon AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
        |ded AS (SELECT g.doc_id, g.tk FROM gated g JOIN canon c ON g.doc_id = c.doc_id),
        |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM ded WHERE len(tk) >= 3),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
        |ev0 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
        |evsh AS (SELECT DISTINCT unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |       FROM ev0 WHERE len(tk) >= 3),
        |o AS (SELECT doc_id, count(*) AS n_overlap FROM sh
        |      WHERE shingle IN (SELECT shingle FROM evsh) GROUP BY doc_id),
        |s AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
        |keptids AS (SELECT s.doc_id FROM s LEFT JOIN o ON s.doc_id = o.doc_id
        |WHERE round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles, 4) <= 0.5)
        |SELECT d.source, count(*) AS n_input,
        |count(g.doc_id) AS n_gated, count(dd.doc_id) AS n_deduped,
        |count(k.doc_id) AS n_kept
        |FROM documents d
        |LEFT JOIN gated g ON d.doc_id = g.doc_id
        |LEFT JOIN ded dd ON d.doc_id = dd.doc_id
        |LEFT JOIN keptids k ON d.doc_id = k.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // Range join: DuckDB evaluates the BETWEEN directly; the Spark
    // side's bucketization is an implementation detail the residual
    // filter makes invisible. lo/hi are exact halves (i * 0.5), so the
    // boundary comparisons agree bit-for-bit.
    "q107_range_join" ->
      """WITH iv AS (SELECT i AS interval_id, i * 0.5 AS lo, i * 0.5 + 2.0 AS hi
        |FROM range(0, 200) t(i))
        |SELECT interval_id, lo, hi, count(*) AS n_events,
        |round(min(value), 4) AS v_min, round(max(value), 4) AS v_max
        |FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    // Salted join: the salt cancels by construction, so the oracle is
    // the PLAIN join — equality IS the correctness claim.
    "q108_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |round(sum(l_quantity), 2) AS qty_sum
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quality quantile: q27's score terms + a per-source percent_rank.
    "q109_quality_quantile" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |s AS (SELECT doc_id, source, CAST(len(tk) AS DOUBLE) AS ntok,
        |CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk) AS sr FROM t),
        |q AS (SELECT doc_id, source,
        |round((least(ntok / 50.0, 1.0) + least(sr * 10.0, 1.0)) / 2.0, 4) AS quality FROM s)
        |SELECT doc_id, source, quality,
        |round(percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id), 6) AS q_norm
        |FROM q ORDER BY doc_id""".stripMargin,

    // LSH recall: the banded cascade (q33's CTEs over the sample) vs
    // exact all-pairs truth from DISTINCT (doc, shingle) rows; both
    // sides round jaccard to 4 exactly like the operators do.
    "q110_lsh_recall" ->
      ("""WITH sample AS (SELECT * FROM documents WHERE doc_id < 500),
         |""".stripMargin +
        shingleCascade("sample") + ",\n" + jaccardVerify + ",\n" +
        """found AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
          |sizes AS (SELECT doc_id, count(*) AS nsh FROM shd GROUP BY 1),
          |tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          |       FROM shd a JOIN shd b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          |       GROUP BY 1, 2),
          |truth AS (SELECT tp.id_a, tp.id_b,
          |round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 4) AS jaccard
          |FROM tp JOIN sizes sa ON tp.id_a = sa.doc_id
          |        JOIN sizes sb ON tp.id_b = sb.doc_id
          |WHERE round(CAST(inter AS DOUBLE) / (sa.nsh + sb.nsh - inter), 4) >= 0.2)
          |SELECT round(floor(jaccard / 0.2) * 0.2, 1) AS band_lo,
          |count(*) AS n_true, count(f.id_a) AS n_found,
          |round(CAST(count(f.id_a) AS DOUBLE) / count(*), 4) AS recall
          |FROM truth t LEFT JOIN found f ON t.id_a = f.id_a AND t.id_b = f.id_b
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Per-source PPS: q89's priority (one IEEE division on the md5
    // integer) ranked within source — the row_number window is the
    // oracle twin of the heap operator's per-key selection.
    "q111_pps_per_source" ->
      """WITH p AS (SELECT doc_id, source, n_chars,
        |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / n_chars AS priority
        |FROM documents),
        |r AS (SELECT doc_id, source, n_chars, priority,
        |row_number() OVER (PARTITION BY source ORDER BY priority, doc_id) AS rn
        |FROM p)
        |SELECT source, doc_id, n_chars, round(priority, 6) AS priority
        |FROM r WHERE rn <= 10 ORDER BY source, priority, doc_id""".stripMargin,

    // Winsorize: Spark percentile ≡ DuckDB quantile_cont (both linear
    // interpolation — the q11 recipe); bounds rounded BEFORE the
    // comparison on both sides.
    "q112_winsorize" ->
      """WITH b AS (SELECT event_type,
        |round(quantile_cont(value, 0.05), 4) AS lo,
        |round(quantile_cont(value, 0.95), 4) AS hi
        |FROM events GROUP BY 1)
        |SELECT event_id, e.event_type, round(value, 4) AS value,
        |round(greatest(least(value, hi), lo), 4) AS value_w,
        |(value < lo OR value > hi) AS clipped
        |FROM events e JOIN b USING (event_type) ORDER BY event_id""".stripMargin,

    // LOCF: the %7 gap seeding mirrors the operator token-for-token;
    // NULLS-FIRST pinned like q95 (frame content depends on it).
    "q113_locf_impute" ->
      """WITH g AS (SELECT event_id, user_id, ts,
        |CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v_gap
        |FROM events)
        |SELECT event_id, user_id, v_gap IS NULL AS was_gap,
        |round(last_value(v_gap IGNORE NULLS) OVER (PARTITION BY user_id
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_filled
        |FROM g ORDER BY event_id""".stripMargin,

    // Funnel: step-k time = earliest step-k event strictly after the
    // user's step-(k-1) time; the join formulation here is equivalent
    // to the operator's windowed conditional-min chain. Counts are
    // integers, so the conversion division is exact on both engines.
    "q114_event_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |c AS (SELECT (SELECT count(*) FROM s1) AS u1,
        |             (SELECT count(*) FROM s2) AS u2,
        |             (SELECT count(*) FROM s3) AS u3)
        |SELECT 1 AS step, 'view' AS event_type, u1 AS users,
        |       CAST(1.0 AS DOUBLE) AS conv_from_prev FROM c
        |UNION ALL SELECT 2, 'click', u2, round(u2 * 1.0 / u1, 4) FROM c
        |UNION ALL SELECT 3, 'purchase', u3, round(u3 * 1.0 / u2, 4) FROM c
        |ORDER BY step""".stripMargin,

    // Cohort retention: both engines truncate to ISO Monday weeks, so
    // the day difference is an exact multiple of 7 and the /7 + int
    // cast is exact (no float rounding can flip a cell).
    "q115_retention_cohort" ->
      """WITH u AS (SELECT user_id,
        |  CAST(date_trunc('week', ts) AS DATE) AS wk,
        |  min(CAST(date_trunc('week', ts) AS DATE))
        |    OVER (PARTITION BY user_id) AS cohort FROM events)
        |SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_offset,
        |count(DISTINCT user_id) AS n_users
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Markov transitions: ts carries microseconds (ties broken by
    // event_id anyway), counts are exact ints, p rounded at 6.
    "q116_event_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |round(n * 1.0 / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY 1, 2""".stripMargin,

    // Trend: x is centered on the corpus's first day (see the
    // operator's conditioning note); both engines then run the same
    // regr_* aggregates over small, well-conditioned doubles.
    "q117_trend_regression" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |a AS (SELECT min(day) AS day0 FROM d)
        |SELECT event_type, count(*) AS n_days,
        |round(regr_slope(n * 1.0, date_diff('day', day0, day) * 1.0), 4) AS slope,
        |round(regr_intercept(n * 1.0, date_diff('day', day0, day) * 1.0), 4) AS intercept,
        |round(regr_r2(n * 1.0, date_diff('day', day0, day) * 1.0), 4) AS r2
        |FROM d, a GROUP BY 1 ORDER BY 1""".stripMargin,

    // KS: histogram counts are exact ints, CDFs are exact integer
    // ratios — the max gap is bit-identical pre-rounding. floor() of a
    // double division is IEEE-identical on both engines.
    "q118_ks_test" ->
      """WITH b AS (SELECT CAST(floor(value / 0.5) AS BIGINT) AS bin,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
        |t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM b),
        |c AS (SELECT CAST(sum(na) OVER (ORDER BY bin) AS BIGINT) * 1.0 / ta AS cdfa,
        |             CAST(sum(nb) OVER (ORDER BY bin) AS BIGINT) * 1.0 / tb AS cdfb
        |      FROM b, t)
        |SELECT (SELECT ta FROM t) AS n_a, (SELECT tb FROM t) AS n_b,
        |(SELECT count(*) FROM b) AS n_bins,
        |round(max(abs(cdfa - cdfb)), 6) AS ks_stat FROM c""".stripMargin,

    // Fuzzy pairs: q32's deterministic LSH candidates (shared
    // shingleCte), verified by levenshtein on the 200-char prefix.
    // Both engines count edits per codepoint with unit costs.
    "q119_fuzzy_dedup" ->
      (shingleCte +
        """
          |SELECT id_a AS doc_a, id_b AS doc_b,
          |CAST(levenshtein(substring(a.text, 1, 200), substring(b.text, 1, 200)) AS INT) AS dist,
          |a.n_chars AS len_a, b.n_chars AS len_b
          |FROM cand JOIN documents a ON cand.id_a = a.doc_id
          |JOIN documents b ON cand.id_b = b.doc_id
          |WHERE levenshtein(substring(a.text, 1, 200), substring(b.text, 1, 200)) <= 20
          |ORDER BY 1, 2""".stripMargin),

    // Priority dedup: q63's paragraph-chunk convention, survivor =
    // lowest (tier, doc_id, pos) per duplicated fingerprint; the
    // src<N> → tier map is N div 5 capped at 2 on both engines.
    "q120_priority_dedup" ->
      """WITH tok AS (SELECT doc_id, source,
        |  least(CAST(floor(CAST(substring(source, 4) AS INT) / 5) AS INT), 2) AS tier,
        |  string_split(text, ' ') AS tk FROM documents),
        |p0 AS (SELECT doc_id, source, tier,
        |  list_transform(range(0, CAST(ceil(len(tk)/20.0) AS BIGINT)),
        |    i -> {'pos': i, 'fp': md5(array_to_string(tk[i*20+1 : i*20+20], ' '))}) AS pf FROM tok),
        |flat AS (SELECT doc_id, source, tier, unnest(pf) AS u FROM p0),
        |f AS (SELECT doc_id, source, tier, CAST(u.pos AS INT) AS pos, u.fp AS fp FROM flat),
        |r AS (SELECT *, row_number() OVER (PARTITION BY fp
        |    ORDER BY tier, doc_id, pos) AS rn,
        |  CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_copies FROM f)
        |SELECT fp AS fingerprint, doc_id AS keeper_id, source AS keeper_source,
        |tier, pos AS keeper_pos, n_copies FROM r
        |WHERE rn = 1 AND n_copies > 1 ORDER BY fingerprint""".stripMargin,

    // Bigram LM: both engines build the identical integer bigram
    // counts, take ln of the identical double ratio, and round the
    // per-doc mean at 4 — ulp-level libm differences sit ~12 digits
    // below the rounding.
    "q121_bigram_lm" ->
      """WITH gr AS (SELECT doc_id,
        |  unnest([substring(text, i, 2) for i in range(1, length(text))]) AS bg
        |  FROM documents WHERE length(text) >= 2),
        |m AS (SELECT bg, count(*) AS ng FROM gr GROUP BY 1),
        |m2 AS (SELECT bg, ln(ng * 1.0 /
        |  CAST(sum(ng) OVER (PARTITION BY substring(bg, 1, 1)) AS DOUBLE)) AS logp FROM m),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, avg(logp) AS al
        |      FROM gr JOIN m2 USING (bg) GROUP BY 1)
        |SELECT doc_id, n_bigrams, round(al, 4) AS avg_logp,
        |round(exp(-al), 4) AS ppl FROM s ORDER BY doc_id""".stripMargin,

    // Weighted median: cumulative sums are exact ints; the crossing
    // test (2·cumw ≥ total) never touches a float.
    "q122_weighted_median" ->
      """WITH c AS (SELECT source, n_chars,
        |  sum(n_chars) OVER (PARTITION BY source
        |    ORDER BY n_chars ASC NULLS FIRST, doc_id ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |  sum(n_chars) OVER (PARTITION BY source) AS total,
        |  count(*) OVER (PARTITION BY source) AS n_docs FROM documents)
        |SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
        |CAST(max(total) AS BIGINT) AS total_chars, min(n_chars) AS wmedian_len
        |FROM c WHERE cumw * 2 >= total GROUP BY 1 ORDER BY 1""".stripMargin,

    // Rolling WAU: each distinct (day, user) presence supports the 7
    // report days starting at `day`; clipping at the corpus max day
    // mirrors the operator. Pure integer/date arithmetic.
    "q123_rolling_wau" ->
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |mx AS (SELECT max(day) AS max_day FROM du),
        |e AS (SELECT user_id,
        |  unnest([day + CAST(i AS INT) for i in range(0, 7)]) AS report_day FROM du)
        |SELECT report_day, count(DISTINCT user_id) AS wau FROM e, mx
        |WHERE report_day <= max_day GROUP BY 1 ORDER BY 1""".stripMargin,

    // Chi-square: expected counts are exact products/quotients of
    // integer-valued doubles; only the final 35-term sum sees float
    // ordering, ~1e-12 below the rounding.
    "q124_chi_square" ->
      """WITH o0 AS (SELECT event_type AS t, CAST(isodow(ts) AS INT) AS d,
        |  count(*) * 1.0 AS o FROM events GROUP BY 1, 2),
        |g AS (SELECT a.t, b.d FROM (SELECT DISTINCT t FROM o0) a,
        |      (SELECT DISTINCT d FROM o0) b),
        |o AS (SELECT g.t, g.d, coalesce(o0.o, 0.0) AS o
        |      FROM g LEFT JOIN o0 ON g.t = o0.t AND g.d = o0.d),
        |e AS (SELECT o,
        |  sum(o) OVER (PARTITION BY t) * sum(o) OVER (PARTITION BY d)
        |    / sum(o) OVER () AS e,
        |  t, d FROM o)
        |SELECT CAST(sum(o) AS BIGINT) AS n_obs,
        |(count(DISTINCT t) - 1) * (count(DISTINCT d) - 1) AS dof,
        |round(sum((o - e) * (o - e) / e), 4) AS chi2 FROM e""".stripMargin,

    // Conversion latency: q114's step chain, then whole-second
    // latencies (both engines truncate to the second before
    // subtracting) with exact interpolated percentiles per cohort.
    "q125_conversion_latency" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |conv AS (SELECT s1.user_id,
        |  CAST(date_trunc('week', s1.t1) AS DATE) AS cohort,
        |  date_diff('second', s1.t1, s3.t3) AS latency_sec
        |  FROM s1 JOIN s3 USING (user_id))
        |SELECT cohort, count(*) AS n_converted,
        |round(quantile_cont(latency_sec, 0.5), 4) AS p50_sec,
        |round(quantile_cont(latency_sec, 0.9), 4) AS p90_sec
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,

    // MAD gate: Spark percentile and DuckDB quantile_cont are both
    // the exact interpolated quantile over doubles; the deviations
    // and the 3·MAD comparison are reproducible double arithmetic,
    // and round(4) absorbs summation-order ulps in the medians.
    "q126_mad_outliers" ->
      """WITH b AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |m AS (SELECT source, quantile_cont(x, 0.5) AS med FROM b GROUP BY 1),
        |d AS (SELECT b.source, b.x, m.med, abs(b.x - m.med) AS absdev
        |      FROM b JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(absdev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.source, count(*) AS n_docs,
        |round(max(d.med), 4) AS median_len, round(max(md.mad), 4) AS mad_len,
        |CAST(sum(CASE WHEN d.absdev > 3.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_outliers
        |FROM d JOIN md USING (source) GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gini by rank formulation: ranks are deterministic (spend, then
    // custkey), the rank·spend sum is the same double arithmetic on
    // both engines, and G is tie-order invariant; round(4) covers the
    // remaining summation-order ulps.
    "q127_gini_spend" ->
      """WITH sp AS (SELECT o_custkey, sum(o_totalprice) AS spend
        |            FROM orders GROUP BY 1),
        |j AS (SELECT sp.o_custkey, c.c_nationkey, sp.spend
        |      FROM sp JOIN customer c ON sp.o_custkey = c.c_custkey),
        |r AS (SELECT c_nationkey, spend, row_number() OVER (
        |  PARTITION BY c_nationkey ORDER BY spend ASC, o_custkey ASC) AS rk
        |      FROM j)
        |SELECT c_nationkey, count(*) AS n_customers,
        |round(sum(spend), 2) AS total_spend,
        |round(2.0 * sum(rk * spend) / (count(*) * sum(spend))
        |      - (count(*) + 1.0) / count(*), 4) AS gini
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // Zipf: the top-200 cut and the ranks are deterministic (freq
    // desc, term asc) on both engines; regr_* over 200 ln pairs is
    // the same closed-form arithmetic, rounded at 4.
    "q128_zipf_slope" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |f AS (SELECT term, count(*) AS freq FROM t GROUP BY 1
        |      ORDER BY freq DESC, term ASC LIMIT 200),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, term ASC)
        |  AS DOUBLE)) AS lx, ln(CAST(freq AS DOUBLE)) AS ly FROM f)
        |SELECT count(*) AS n_terms,
        |round(regr_slope(ly, lx), 4) AS zipf_slope,
        |round(regr_intercept(ly, lx), 4) AS zipf_intercept,
        |round(regr_r2(ly, lx), 4) AS r2 FROM r""".stripMargin,

    // Entropy: per-(day,type) counts are exact ints; −Σ p·ln p over
    // ≤ #types terms per day sees only ulp-level ordering noise,
    // ~1e-15 below the rounding.
    "q129_type_entropy" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT day, event_type, c,
        |      sum(c) OVER (PARTITION BY day) AS total FROM c)
        |SELECT day, CAST(sum(c) AS BIGINT) AS n_events,
        |count(*) AS n_types,
        |round(-sum((c * 1.0 / total) * ln(c * 1.0 / total)), 4) AS entropy_nats
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    // PMI: the vocab cut, the pair counts, and the df values are all
    // exact integers with deterministic tie-breaks; ln over an exact
    // rational is the same libm call, rounded at 4 before the final
    // (pmi, ta, tb) sort on both engines.
    "q130_token_pmi" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |dt0 AS (SELECT DISTINCT doc_id, term FROM t),
        |dfreq AS (SELECT term, count(*) AS df FROM dt0 GROUP BY 1),
        |top AS (SELECT term, df FROM dfreq ORDER BY df DESC, term ASC LIMIT 50),
        |dt AS (SELECT dt0.doc_id, dt0.term FROM dt0 JOIN top USING (term)),
        |pairs AS (SELECT a.term AS ta, b.term AS tb, count(*) AS df_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |n AS (SELECT count(*) * 1.0 AS n_docs FROM documents)
        |SELECT p.ta, p.tb, CAST(p.df_ab AS BIGINT) AS df_ab,
        |round(ln(n.n_docs * p.df_ab / (fa.df * fb.df)), 4) AS pmi
        |FROM pairs p
        |JOIN top fa ON p.ta = fa.term JOIN top fb ON p.tb = fb.term, n
        |ORDER BY pmi DESC, ta ASC, tb ASC LIMIT 20""".stripMargin,

    // Time-weighted average: epoch seconds via date_diff from the
    // epoch origin ≡ Spark's unix_timestamp floor (the q125 parity
    // contract); weights and spans are exact integers, and the
    // weighted sum is rounded at 4.
    "q131_time_weighted" ->
      """WITH s AS (SELECT user_id, event_id, value,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |d AS (SELECT user_id, value,
        |  lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec
        |    AS wgt FROM s)
        |SELECT user_id, count(*) + 1 AS n_events,
        |CAST(sum(wgt) AS BIGINT) AS span_sec,
        |round(sum(value * wgt) / sum(wgt), 4) AS twa_value
        |FROM d WHERE wgt IS NOT NULL
        |GROUP BY 1 HAVING sum(wgt) > 0 ORDER BY 1""".stripMargin,

    // Z-order audit: the Morton interleave is pure integer shift/mask
    // arithmetic — the identical OR-chain is generated for both
    // engines from the same loop, so the buckets and their min/max
    // spans are bit-exact. Keys are positive, so % ≡ pmod.
    "q132_zorder_layout" -> {
      val z = (0 until 8).flatMap { i =>
        Seq(s"(((bx >> $i) & 1) << ${2 * i + 1})",
            s"(((by >> $i) & 1) << ${2 * i})")
      }.mkString(" | ")
      s"""WITH b AS (SELECT l_partkey % 256 AS bx, l_suppkey % 256 AS by
         |           FROM lineitem),
         |z AS (SELECT bx, by, $z AS z FROM b)
         |SELECT z // 1024 AS zbucket, count(*) AS n_rows,
         |min(bx) AS min_bx, max(bx) AS max_bx,
         |min(by) AS min_by, max(by) AS max_by
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Count-Min sketch: the counter matrix is exact integer counts
    // over engine-neutral md5 buckets, the estimate a min over 4
    // cells — every cell and every estimate is reproducible, so even
    // the sketch's ERROR (overestimate column) hash-matches.
    "q134_countmin" ->
      """WITH k AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
        |d AS (SELECT unnest([0, 1, 2, 3]) AS depth),
        |kb AS (SELECT k.k, d.depth,
        |  CAST(concat('0x', substring(
        |    md5('cm' || d.depth || ':' || k.k), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM k, d),
        |counters AS (SELECT depth, bucket, count(*) AS c
        |             FROM kb GROUP BY 1, 2),
        |truth AS (SELECT k, count(*) AS true_count FROM k GROUP BY 1
        |          ORDER BY true_count DESC, k ASC LIMIT 20),
        |probe AS (SELECT t.k, t.true_count, d.depth,
        |  CAST(concat('0x', substring(
        |    md5('cm' || d.depth || ':' || t.k), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM truth t, d)
        |SELECT p.k, p.true_count, min(c.c) AS cms_count,
        |CAST(min(c.c) - p.true_count AS BIGINT) AS overestimate
        |FROM probe p JOIN counters c USING (depth, bucket)
        |GROUP BY 1, 2 ORDER BY true_count DESC, k ASC""".stripMargin,

    // Prefix-filtering completeness proof: the oracle computes the
    // SAME pair set from ALL shared-shingle pairs (no prefix cut) —
    // if Spark's prefix-prefix candidate join ever dropped a true
    // pair, this hash would catch it.
    "q135_prefix_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |  FROM toks WHERE len(tk) >= 3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle
        |       AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, sa.n AS n_a, sb.n AS n_b,
        |CAST(p.inter AS BIGINT) AS inter,
        |round(p.inter * 1.0 / (sa.n + sb.n - p.inter), 4) AS jaccard
        |FROM p JOIN sz sa ON p.doc_a = sa.doc_id
        |JOIN sz sb ON p.doc_b = sb.doc_id
        |WHERE p.inter * 1.0 / (sa.n + sb.n - p.inter) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Containment: all DIRECTED shared-shingle pairs from raw
    // shingles (no prefix cut — a dropped true pair in the Spark
    // candidate generator would hash-mismatch); * 1.0 forces real
    // division as in q135.
    "q140_containment" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |  FROM toks WHERE len(tk) >= 3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |      FROM sh a JOIN sh b ON a.shingle = b.shingle
        |       AND a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, sa.n AS n_a, sb.n AS n_b,
        |CAST(p.inter AS BIGINT) AS inter,
        |round(p.inter * 1.0 / sa.n, 4) AS containment
        |FROM p JOIN sz sa ON p.doc_a = sa.doc_id
        |JOIN sz sb ON p.doc_b = sb.doc_id
        |WHERE p.inter * 1.0 / sa.n >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Novelty: min-doc_id per raw shingle, one join back; counts are
    // exact ints (sum → HUGEINT → cast BIGINT), * 1.0 for real
    // division.
    "q141_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |  unnest(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |  FROM toks WHERE len(tk) >= 3),
        |f AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
        |  AS BIGINT) AS n_novel,
        |round(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
        |  * 1.0 / count(*), 4) AS novelty
        |FROM sh JOIN f USING (shingle)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // PSI: bin counts are exact ints, shares exact rationals; the
    // ε-floor and the (q−p)·ln(q/p) sum are identical double
    // arithmetic over ≤ 13 bins, rounded at 4.
    "q136_psi_drift" ->
      """WITH b AS (SELECT source, least(n_chars // 50, 12) AS bin, n_chars
        |           FROM documents),
        |corpus AS (SELECT bin, count(*) * 1.0 / (SELECT count(*) FROM b) AS p
        |           FROM b GROUP BY 1),
        |st AS (SELECT source, count(*) AS n_docs, avg(n_chars) AS mean_len
        |       FROM b GROUP BY 1),
        |sb AS (SELECT source, bin, count(*) AS cq FROM b GROUP BY 1, 2),
        |grid AS (SELECT st.source, st.n_docs, st.mean_len, c.bin, c.p,
        |  coalesce(sb.cq, 0) * 1.0 / st.n_docs AS q
        |  FROM st CROSS JOIN corpus c
        |  LEFT JOIN sb ON sb.source = st.source AND sb.bin = c.bin),
        |cm AS (SELECT avg(n_chars) AS corpus_mean FROM b)
        |SELECT g.source, g.n_docs, round(g.mean_len, 4) AS mean_len,
        |round(g.mean_len - cm.corpus_mean, 4) AS mean_shift,
        |round(sum((greatest(g.q, 1e-6) - greatest(g.p, 1e-6))
        |  * ln(greatest(g.q, 1e-6) / greatest(g.p, 1e-6))), 4) AS psi
        |FROM grid g, cm
        |GROUP BY g.source, g.n_docs, g.mean_len, cm.corpus_mean
        |ORDER BY 1""".stripMargin,

    // TextRank: the damped recurrence is unrolled to the same 10
    // fixed iterations from the same Scala loop; constants are
    // CAST(<shortest-roundtrip-double> AS DOUBLE) so both engines
    // iterate bit-identical IEEE arithmetic (group-sum ordering ulps
    // are absorbed by the final round(4), as q127-q131).
    "q137_textrank" -> {
      val d = 0.85
      val num = (1.0 - d).toString // exact 1−d as a round-trip literal
      val iterCtes = (1 to 10).map { k =>
        s"""r$k AS (SELECT tp.term,
           |  CAST($num AS DOUBLE)/nn.n + CAST($d AS DOUBLE)
           |    * coalesce(inc.c, CAST(0 AS DOUBLE)) AS r
           |  FROM top tp CROSS JOIN n nn LEFT JOIN (
           |    SELECT e.dst AS term, sum(r${k - 1}.r * e.w / deg.deg) AS c
           |    FROM e JOIN r${k - 1} ON e.src = r${k - 1}.term
           |    JOIN deg ON deg.src = e.src GROUP BY 1) inc USING (term))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT DISTINCT doc_id,
         |  unnest(string_split(text, ' ')) AS term FROM documents),
         |dfreq AS (SELECT term, count(*) AS df FROM t GROUP BY 1),
         |top AS (SELECT term, df FROM dfreq
         |        ORDER BY df DESC, term ASC LIMIT 50),
         |dt AS (SELECT t.doc_id, t.term FROM t JOIN top USING (term)),
         |e0 AS (SELECT a.term AS src, b.term AS dst, count(*) AS w
         |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2),
         |e AS (SELECT src, dst, w FROM e0
         |      UNION ALL SELECT dst, src, w FROM e0),
         |deg AS (SELECT src, sum(w) AS deg FROM e GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM top),
         |r0 AS (SELECT term, CAST(1 AS DOUBLE)/nn.n AS r FROM top, n nn),
         |$iterCtes
         |SELECT top.term, top.df, round(r10.r, 4) AS score
         |FROM top JOIN r10 USING (term)
         |ORDER BY score DESC, term ASC LIMIT 20""".stripMargin
    },

    // BM25: same left-assoc IEEE expression order as the Spark plan;
    // dl/avgdl is dl*n_docs/total with all three exact integers (one
    // IEEE divide — no double-mean sum-order ulps); per-(q,d) sums
    // round(6) before ranking, round(4) on output.
    "q138_bm25_topk" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM tf GROUP BY 1),
        |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 8),
        |scored AS (SELECT q.q_id, tf.doc_id,
        |    round(sum(
        |      ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |        * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
        |            + 0.75 * dl.dl * n.n_docs / tot.total))), 6) AS score_r
        |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
        |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
        |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
        |ranked AS (SELECT q_id, doc_id, score_r,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_r DESC, doc_id) AS INT) AS rk FROM scored)
        |SELECT q_id, doc_id, round(score_r, 4) AS bm25, rk
        |FROM ranked WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    // Inverted index: postings capped via row_number (≡ the Spark
    // heap's min-k per term), csv-encoded; sum(tf) widens to HUGEINT
    // in DuckDB → cast BIGINT to match Spark.
    "q139_inverted_index" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
        |stats AS (SELECT term, count(*) AS df,
        |          CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
        |capped AS (SELECT term, doc_id FROM (
        |  SELECT term, doc_id, row_number() OVER (PARTITION BY term
        |    ORDER BY doc_id) AS rn FROM tf) WHERE rn <= 20),
        |postings AS (SELECT term,
        |    array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |  FROM capped GROUP BY 1)
        |SELECT term, df, cf, postings FROM stats JOIN postings USING (term)
        |ORDER BY df DESC, term ASC LIMIT 50""".stripMargin,

    // Stats manifest: month buckets, exact int counts, min/max over
    // raw parquet values (timestamps cast to date, doubles untouched)
    // — no arithmetic at all, so no rounding is needed anywhere.
    "q133_stats_manifest" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
        |count(*) AS n_rows,
        |CAST(min(o_orderdate) AS DATE) AS min_date,
        |CAST(max(o_orderdate) AS DATE) AS max_date,
        |min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |CAST(CASE WHEN max(o_totalprice) >= 100000.0
        |           AND min(o_totalprice) <= 150000.0
        |     THEN 1 ELSE 0 END AS INT) AS scanned
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    // SCD2: identical lag/filter/lead/row_number recurrence; whole
    // epoch seconds + event_id — the q131 engine-neutral tie order.
    "q153_scd_history" ->
      """WITH s AS (SELECT user_id, event_type AS state, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |c AS (SELECT *, lag(state) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS prev_state FROM s),
        |f AS (SELECT user_id, state, sec, event_id FROM c
        |  WHERE prev_state IS NULL OR prev_state <> state)
        |SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
        |state, sec AS valid_from_sec, lead(sec) OVER w AS valid_to_sec,
        |CAST(CASE WHEN lead(sec) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
        |  AS is_current
        |FROM f WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |ORDER BY user_id, version""".stripMargin,

    // GROUPING SETS: DuckDB's GROUPING() flags ≡ Spark's grouping();
    // revenue rounds like q19/q20's accepted double-sum convention.
    "q154_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |coalesce(o_orderpriority, '(all)') AS priority,
        |CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        |count(*) AS n, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, status, priority""".stripMargin,

    // SemDeDup: the q142 kmeans CTEs verbatim (a4 = final assignment),
    // then a within-cluster equi-join with the q37 cosine form — the
    // raw-cosine threshold compare is bit-stable because both engines
    // fold the identical IEEE sequence.
    "q155_semdedup" ->
      s"""WITH ${kmeansCtes(4, 3)},
         |m AS (SELECT vec_id, cluster, v FROM a4),
         |p AS (SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
         |  list_dot_product(a.v, b.v) /
         |  (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
         |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
         |SELECT drop_id, min(keep_id) AS kept_by, round(max(cos), 4) AS max_cos
         |FROM p WHERE cos >= 0.35 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Heaps-law growth: every output column is an exact integer —
    // counts, a min, and #bucket-row cumulative sums; casts match
    // Spark (bucket INT, counts BIGINT).
    "q156_vocab_growth" ->
      """WITH n AS (SELECT count(*) AS nd FROM documents),
        |t AS (SELECT CAST(floor(doc_id * 10 / nd) AS INT) + 1 AS bucket,
        |  unnest(string_split(text, ' ')) AS term
        |  FROM documents CROSS JOIN n),
        |fs AS (SELECT term, min(bucket) AS first_bucket FROM t GROUP BY 1),
        |nt AS (SELECT first_bucket AS bucket, count(*) AS n_new_terms
        |  FROM fs GROUP BY 1),
        |tc AS (SELECT bucket, count(*) AS n_tokens FROM t GROUP BY 1)
        |SELECT tc.bucket, n_tokens,
        |coalesce(n_new_terms, 0) AS n_new_terms,
        |CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
        |CAST(sum(coalesce(n_new_terms, 0)) OVER w AS BIGINT) AS vocab_size
        |FROM tc LEFT JOIN nt ON tc.bucket = nt.bucket
        |WINDOW w AS (ORDER BY tc.bucket
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY tc.bucket""".stripMargin,

    // Content-keyed folds: md5 of the SAME text bytes + the 0x-prefix
    // first-8-hex bucket arithmetic (the q57 shard convention) — the
    // assignment is engine-neutral, so even the fold ids hash-match.
    "q157_kfold_audit" ->
      """SELECT CAST(CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT)
        |  % 5 AS INT) AS fold, source,
        |count(*) AS n_docs, count(DISTINCT md5(text)) AS n_texts
        |FROM documents GROUP BY 1, 2 ORDER BY fold, source""".stripMargin,

    // Histogram step-quantiles: every decision value is an exact
    // integer (counts; ceil of n*p with p*100 integer) and the edges
    // are multiples of the power-of-two binWidth — no interpolation,
    // nothing to round. Window sums widen to HUGEINT -> the threshold
    // compare stays exact; emitted n CAST to BIGINT.
    "q158_hist_percentiles" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS bar_ts,
        |  CAST(floor(value / 0.5) AS BIGINT) AS bin, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *, sum(c) OVER (PARTITION BY bar_ts) AS n,
        |  sum(c) OVER (PARTITION BY bar_ts ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc FROM c)
        |SELECT bar_ts, CAST(max(n) AS BIGINT) AS n,
        |min(CASE WHEN cumc * 100 >= ceil(n * 50.0) THEN bin * 0.5 END) AS p50_lo,
        |min(CASE WHEN cumc * 100 >= ceil(n * 90.0) THEN bin * 0.5 END) AS p90_lo,
        |min(CASE WHEN cumc * 100 >= ceil(n * 99.0) THEN bin * 0.5 END) AS p99_lo
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,

    // Benford: digit via string length of exact integer cents (float
    // log10 at a power-of-ten boundary could flip a digit); explicit
    // floor both sides (DuckDB double->int cast ROUNDS, Spark
    // truncates); ln-ratio expectation rounded 6 (q128 convention).
    "q159_benford" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders WHERE o_totalprice > 0),
        |d AS (SELECT CAST(floor(cents / POWER(10, LENGTH(CAST(cents AS VARCHAR)) - 1)) AS INT) AS digit FROM c),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n, round(n / total, 6) AS share,
        |round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford,
        |round(abs(n / total - ln(1.0 + 1.0 / digit) / ln(10.0)), 6) AS abs_dev
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    // Bounded-lookback EWMA: the weight literals are the SAME
    // shortest-round-trip doubles the Spark plan embeds (shared
    // generator: EventAnalytics.ewmaWeights), CAST AS DOUBLE so DuckDB
    // doesn't route them through DECIMAL arithmetic; numerator and
    // denominator are the identical left-associated chains, one
    // division, round(4). Last-per-user here is a rank window — the
    // Spark side's max(struct) partial aggregate is the scale form of
    // the same (sec DESC, event_id DESC) pick.
    "q160_ewma_level" -> {
      val ws = graft.operators.EventAnalytics.ewmaWeights(0.3, 8)
      def w(j: Int) = s"CAST(${ws(j)} AS DOUBLE)"
      val lags = (1 until 8).map(j =>
        s"lag(x0, $j) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS x$j")
        .mkString(",\n|  ")
      val num = (0 until 8).map(j =>
        s"CASE WHEN x$j IS NOT NULL THEN x$j * ${w(j)} ELSE 0.0 END")
        .mkString(" + ")
      val den = (0 until 8).map(j =>
        s"CASE WHEN x$j IS NOT NULL THEN ${w(j)} ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH s AS (SELECT user_id, event_id, value AS x0,
         |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
         |  FROM events),
         |l AS (SELECT user_id, event_id, sec, x0,
         |  $lags FROM s),
         |e AS (SELECT user_id, event_id, sec, ($num) / ($den) AS ewma FROM l),
         |r AS (SELECT user_id, event_id, ewma,
         |  count(*) OVER (PARTITION BY user_id) AS n_events,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY sec DESC, event_id DESC) AS rn FROM e)
         |SELECT user_id, n_events, event_id AS last_event_id,
         |round(ewma, 4) AS ewma_value
         |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
    },

    // Hourly-count autocorrelation: Pearson's r from exact integer
    // sufficient statistics with the identical closing-formula text as
    // the Spark side (NOT each engine's own Welford corr); NULLIF keeps
    // the constant-series case NULL in both engines.
    "q161_autocorr" -> {
      def stats(k: Int) = Seq(
        s"sum(CASE WHEN l$k IS NOT NULL THEN 1 ELSE 0 END) AS n$k",
        s"sum(CASE WHEN l$k IS NOT NULL THEN cnt ELSE 0 END) AS sx$k",
        s"sum(CASE WHEN l$k IS NOT NULL THEN l$k ELSE 0 END) AS sy$k",
        s"sum(CASE WHEN l$k IS NOT NULL THEN cnt * l$k ELSE 0 END) AS sxy$k",
        s"sum(CASE WHEN l$k IS NOT NULL THEN cnt * cnt ELSE 0 END) AS sxx$k",
        s"sum(CASE WHEN l$k IS NOT NULL THEN l$k * l$k ELSE 0 END) AS syy$k")
      def acf(k: Int) =
        s"round((CAST(n$k AS DOUBLE) * sxy$k - CAST(sx$k AS DOUBLE) * sy$k) /" +
        s" nullif(sqrt(CAST(n$k AS DOUBLE) * sxx$k - CAST(sx$k AS DOUBLE) * sx$k) *" +
        s"        sqrt(CAST(n$k AS DOUBLE) * syy$k - CAST(sy$k AS DOUBLE) * sy$k), 0.0)," +
        s" 4) AS acf$k"
      s"""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
         |  count(*) AS cnt FROM events GROUP BY 1, 2),
         |l AS (SELECT event_type, cnt,
         |  lag(cnt, 1) OVER w AS l1, lag(cnt, 2) OVER w AS l2
         |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
         |g AS (SELECT event_type, count(*) AS n_hours,
         |  ${(stats(1) ++ stats(2)).mkString(",\n|  ")}
         |  FROM l GROUP BY 1)
         |SELECT event_type, n_hours, ${acf(1)}, ${acf(2)}
         |FROM g ORDER BY event_type""".stripMargin
    },

    // Theil–Sen: slopes are single IEEE divisions of exact integers,
    // so both engines materialize the identical slope multiset; DuckDB
    // and Spark both define even-count median as the mean of the two
    // middles. The pair join runs on the calendar-bounded hourly grid.
    "q162_theil_sen" ->
      """WITH h AS (SELECT event_type,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |       date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |  CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
        |  FROM h a JOIN h b ON a.event_type = b.event_type AND a.h < b.h)
        |SELECT event_type, count(*) AS n_pairs,
        |round(median(slope), 4) AS ts_slope
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,

    // Readability: regex-run counts behave identically in RE2 and Java
    // regex for these character classes; counts cast to INT to match
    // Spark's size(); identical closing-formula text, round(4).
    "q163_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT)
        |    AS n_words,
        |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS INT)
        |    AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
        |  - 84.6 * (CAST(n_syllables AS DOUBLE) / nullif(n_words, 0)), 4)
        |  AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,

    // Burstiness: exact integer-second gaps over (user, type) streams;
    // per-type (n, Σg, Σg²) BIGINT sums into the identical sample-σ /
    // CV / (σ−μ)/(σ+μ) formula text; sub-two-gap types NULL via NULLIF.
    "q164_burstiness" ->
      """WITH s AS (SELECT user_id, event_type, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |g AS (SELECT event_type,
        |  sec - lag(sec) OVER (PARTITION BY user_id, event_type
        |    ORDER BY sec, event_id) AS gap FROM s),
        |a AS (SELECT event_type, count(*) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS s1,
        |  CAST(sum(gap * gap) AS BIGINT) AS s2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps,
        |round(CAST(s1 AS DOUBLE) / n_gaps, 4) AS mean_gap_sec,
        |round(sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        | nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0)) /
        | (CAST(s1 AS DOUBLE) / n_gaps), 4) AS cv,
        |round((sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        | nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0))
        | - CAST(s1 AS DOUBLE) / n_gaps) /
        | (sqrt((CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        | nullif(CAST(n_gaps AS DOUBLE) * (n_gaps - 1), 0.0))
        | + CAST(s1 AS DOUBLE) / n_gaps), 4) AS burstiness
        |FROM a ORDER BY event_type""".stripMargin,

    // Seasonal anomalies: the flag decision is exact integer
    // cross-multiplication (cnt·m ≥ 2·s avoids any intermediate
    // rounding); only the two reported doubles round.
    "q165_seasonal_anomaly" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, hour(hr) AS hod,
        |  CAST(sum(cnt) AS BIGINT) AS s, count(*) AS m
        |  FROM h GROUP BY 1, 2)
        |SELECT h.event_type, h.hr, h.cnt,
        |round(CAST(p.s AS DOUBLE) / p.m, 4) AS baseline,
        |round(CAST(h.cnt AS DOUBLE) * p.m / p.s, 4) AS ratio
        |FROM h JOIN p ON h.event_type = p.event_type AND hour(h.hr) = p.hod
        |WHERE h.cnt * p.m >= 2.0 * p.s
        |ORDER BY h.event_type, h.hr""".stripMargin,

    // Expectations: every pass count is exact (a null condition falls
    // to ELSE 0, matching Spark's null-skipping sum over the cast);
    // `passed` is an integer comparison, never a double threshold.
    "q166_expectations" ->
      """WITH a AS (SELECT count(*) AS n,
        |  sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS c_cust,
        |  count(DISTINCT o_orderkey) AS d_key,
        |  sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
        |    AS c_status,
        |  sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS c_price,
        |  sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
        |    THEN 1 ELSE 0 END) AS c_prio
        |  FROM orders),
        |s AS (
        |  SELECT 'accepted_values:o_orderstatus' AS checkname,
        |    CAST(c_status AS BIGINT) AS n_ok, n FROM a
        |  UNION ALL SELECT 'completeness:o_custkey',
        |    CAST(c_cust AS BIGINT), n FROM a
        |  UNION ALL SELECT 'format:o_orderpriority',
        |    CAST(c_prio AS BIGINT), n FROM a
        |  UNION ALL SELECT 'positive:o_totalprice',
        |    CAST(c_price AS BIGINT), n FROM a
        |  UNION ALL SELECT 'unique:o_orderkey',
        |    CAST(d_key AS BIGINT), n FROM a)
        |SELECT checkname, n_ok, n AS n_total,
        |round(CAST(n_ok AS DOUBLE) / n, 6) AS rate,
        |CAST(n_ok = n AS INT) AS passed
        |FROM s ORDER BY checkname""".stripMargin,

    // Neyman: σ from exact BIGINT sums (identical formula text),
    // scaled to an integer weight immediately; Hamilton quotas in
    // exact integer div/mod so no summation-order ulp can flip an
    // allocation; selection is the q111 md5-priority rank.
    "q167_neyman_sample" ->
      """WITH st AS (SELECT source, count(*) AS nh,
        |  CAST(sum(n_chars) AS BIGINT) AS s1,
        |  CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents GROUP BY 1),
        |sg AS (SELECT source, nh,
        |  coalesce(sqrt((CAST(nh AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) /
        |   nullif(CAST(nh AS DOUBLE) * (nh - 1), 0.0)), 0.0) AS sigma FROM st),
        |wts AS (SELECT source, nh, sigma,
        |  CAST(floor(CAST(nh AS DOUBLE) * sigma * 1000000 + 0.5) AS BIGINT)
        |    AS w FROM sg),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM wts),
        |q AS (SELECT source, w, (100 * w) // wt AS base, (100 * w) % wt AS rem
        |      FROM wts, tot),
        |x AS (SELECT CAST(100 - sum(base) AS BIGINT) AS extra FROM q),
        |al AS (SELECT source, base + (CASE WHEN row_number()
        |    OVER (ORDER BY rem DESC, source ASC) <= extra
        |    THEN 1 ELSE 0 END) AS alloc FROM q, x),
        |sc AS (SELECT doc_id, source, n_chars,
        |  CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) / n_chars AS priority
        |  FROM documents),
        |rk AS (SELECT doc_id, source, n_chars, priority,
        |  row_number() OVER (PARTITION BY source ORDER BY priority, doc_id)
        |    AS rn FROM sc)
        |SELECT r.source, r.doc_id, r.n_chars,
        |round(r.priority, 6) AS priority, a.alloc
        |FROM rk r JOIN al a USING (source) WHERE r.rn <= a.alloc
        |ORDER BY source, priority, doc_id""".stripMargin,

    // k-anonymity/l-diversity: exact integer class sizes and distinct
    // bands; the flags are integer comparisons. floor(x/1000) runs on
    // the same double in both engines.
    "q168_k_anonymity" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS band FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  count(DISTINCT band) AS l_div FROM b GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n, l_div,
        |CAST(n >= 10 AS INT) AS k_anonymous,
        |CAST(l_div >= 3 AS INT) AS l_diverse
        |FROM g ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // DSIR: the quantize-early discipline — per-bucket micro-log
    // ratios floor once on the 512-row LM frame (identical integer
    // inputs → identical doubles), then every document sums exact
    // BIGINTs, so no reduction order can move the hash.
    "q169_dsir_select" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tb AS (SELECT doc_id,
        |  CAST(CAST(concat('0x', substring(md5(term), 1, 8)) AS BIGINT) % 512
        |    AS INT) AS b FROM tok),
        |tgt AS (SELECT b, count(*) AS tg FROM tb WHERE doc_id % 10 = 0
        |        GROUP BY 1),
        |src AS (SELECT b, count(*) AS sg FROM tb WHERE doc_id % 10 <> 0
        |        GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT count(*) FROM tb WHERE doc_id % 10 = 0) AS tt,
        |  (SELECT count(*) FROM tb WHERE doc_id % 10 <> 0) AS st),
        |grid AS (SELECT unnest(range(0, 512)) AS b),
        |lm AS (SELECT g.b,
        |  CAST(floor((ln((coalesce(tg, 0) + 1) / CAST(tt + 512 AS DOUBLE))
        |    - ln((coalesce(sg, 0) + 1) / CAST(st + 512 AS DOUBLE)))
        |    * 1000000 + 0.5) AS BIGINT) AS q
        |  FROM grid g LEFT JOIN tgt ON g.b = tgt.b
        |  LEFT JOIN src ON g.b = src.b CROSS JOIN tot),
        |w AS (SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(l.q) AS BIGINT) AS qlogw
        |  FROM tb t JOIN lm l ON t.b = l.b WHERE t.doc_id % 10 <> 0
        |  GROUP BY 1)
        |SELECT w.doc_id, d.source, w.n_tokens, w.qlogw
        |FROM w JOIN documents d ON w.doc_id = d.doc_id
        |ORDER BY qlogw DESC, w.doc_id LIMIT 100""".stripMargin,

    // Pivot: Spark's declared-domain pivot ≡ conditional counts; all
    // cells exact integers, missing cells 0 on both sides.
    "q170_pivot_status" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
        |  AS month, o_orderstatus AS st FROM orders)
        |SELECT month,
        |CAST(sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |CAST(sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |CAST(sum(CASE WHEN st = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM m GROUP BY 1 ORDER BY month""".stripMargin,

    // Unpivot: UNION ALL is the engine-neutral melt; the mean divides
    // an exact quantized BIGINT sum in the same (s/n)/10000 order.
    "q171_unpivot_metrics" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n,
        |min(value) AS min_value, max(value) AS max_value,
        |round(CAST(CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
        |  AS BIGINT) AS DOUBLE) / count(*) / 10000, 6) AS mean_value
        |FROM u GROUP BY 1 ORDER BY metric""".stripMargin,

    // Referential integrity: left join against the unique parent key,
    // orphan = non-null FK with no parent; counts exact, one division.
    "q172_ref_integrity" ->
      """WITH e1 AS (SELECT 'orders.o_custkey->customer' AS fk_edge,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |  CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_null_fk
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |e2 AS (SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |  count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |  CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_null_fk
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
        |SELECT fk_edge, n_rows, n_orphans, n_null_fk,
        |round(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate,
        |CAST(n_orphans = 0 AND n_null_fk = 0 AS INT) AS intact
        |FROM u ORDER BY fk_edge""".stripMargin,

    // Props mining: unnest(json_keys) + json_extract_string ≡ Spark's
    // map explode on valid JSON (malformed → null map → dropped ≡
    // json_valid filter); raw string values never emitted (quoting
    // diverges), numeric parses and counts agree exactly.
    "q173_props_profile" ->
      """WITH kv AS (SELECT event_type,
        |  unnest(json_keys(props)) AS prop_key, props
        |  FROM events WHERE json_valid(props)),
        |v AS (SELECT event_type, prop_key,
        |  try_cast(json_extract_string(props, '$.' || prop_key) AS DOUBLE)
        |    AS num FROM kv)
        |SELECT event_type, prop_key, count(*) AS n,
        |CAST(sum(CASE WHEN num IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_numeric,
        |min(num) AS min_num, max(num) AS max_num
        |FROM v GROUP BY 1, 2 ORDER BY event_type, prop_key""".stripMargin,

    // Set relations: INTERSECT/EXCEPT carry distinct semantics in
    // both engines; the five cardinals are exact integers.
    "q174_set_relations" ->
      """WITH a AS (SELECT DISTINCT md5(text) AS fp FROM documents
        |           WHERE source = 'src0'),
        |b AS (SELECT DISTINCT md5(text) AS fp FROM documents
        |      WHERE source = 'src1')
        |SELECT 'a_distinct' AS relation, count(*) AS n FROM a
        |UNION ALL SELECT 'a_minus_b', count(*) FROM
        |  (SELECT fp FROM a EXCEPT SELECT fp FROM b)
        |UNION ALL SELECT 'b_distinct', count(*) FROM b
        |UNION ALL SELECT 'b_minus_a', count(*) FROM
        |  (SELECT fp FROM b EXCEPT SELECT fp FROM a)
        |UNION ALL SELECT 'intersect', count(*) FROM
        |  (SELECT fp FROM a INTERSECT SELECT fp FROM b)
        |ORDER BY relation""".stripMargin,

    // SCD2 point-in-time lookup: the history CTE is q153's oracle
    // verbatim; containment is half-open [from, to) with NULL = ∞, so
    // exactly one interval matches each probe.
    "q175_scd_lookup" ->
      """WITH s AS (SELECT user_id, event_type AS state, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events WHERE event_type <> 'purchase'),
        |c AS (SELECT *, lag(state) OVER (PARTITION BY user_id
        |    ORDER BY sec, event_id) AS prev_state FROM s),
        |f AS (SELECT user_id, state, sec, event_id FROM c
        |  WHERE prev_state IS NULL OR prev_state <> state),
        |h AS (SELECT user_id, CAST(row_number() OVER w AS INT) AS version,
        |  state, sec AS valid_from_sec, lead(sec) OVER w AS valid_to_sec
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
        |p AS (SELECT event_id, user_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.sec,
        |h.version AS state_version, h.state AS state_at_event
        |FROM p JOIN h ON p.user_id = h.user_id
        |  AND h.valid_from_sec <= p.sec
        |  AND (h.valid_to_sec IS NULL OR p.sec < h.valid_to_sec)
        |ORDER BY p.event_id""".stripMargin,

    // Winnowing: the fingerprint is substring(md5(shingle),1,15) —
    // Spark minimizes it as a 60-bit long, this oracle as the raw hex
    // string; fixed-width lowercase hex orders identically both ways,
    // so both engines select the same window minima. Positions are
    // 1-based here vs 0-based in Spark: first complete w=4 window
    // ends at pos 4 ≡ Spark pos 3. Output carries no hash columns.
    "q176_winnow_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT doc_id, i AS pos,
        |  substring(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 15) AS h
        |  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
        |m AS (SELECT doc_id, pos,
        |  min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
        |  FROM g),
        |sel AS (SELECT DISTINCT doc_id, fp FROM m WHERE pos >= 4)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(*) AS n_shared
        |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_shared DESC, doc_a, doc_b""".stripMargin,

    // CUSUM: S_i·n = prefix·n − i·total in exact BIGINT — argmax,
    // direction, and the reported numerator are all integer; no mean,
    // no division, no float. Calendar densified to the global span.
    "q177_cusum_changepoint" ->
      """WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |  max(CAST(ts AS DATE)) AS d1 FROM events),
        |cal AS (SELECT CAST(unnest(generate_series(d0, d1,
        |  INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS cnt FROM events GROUP BY 1, 2),
        |dense AS (SELECT t.event_type, c.day, coalesce(d.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT event_type FROM events) t
        |  CROSS JOIN cal c
        |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = c.day),
        |s AS (SELECT event_type, day, cnt,
        |  CAST(row_number() OVER w AS BIGINT) AS i,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS prefix,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |m AS (SELECT *, prefix * n - i * total AS mm FROM s),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |  ORDER BY abs(mm) DESC, day ASC) AS rn FROM m)
        |SELECT event_type, CAST(n AS INT) AS n_days, day AS peak_day,
        |  mm AS cusum_num,
        |  CASE WHEN mm >= 0 THEN 'above' ELSE 'below' END AS direction
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,

    // Multi-touch: every decay weight is 1/2^rank (rank ≤ 20) — a
    // dyadic rational, so the cross-purchase sums are exact in double
    // in ANY order; no rounding anywhere. Last-touch = rank 1 counts.
    "q178_multi_touch" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS p_sec
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS t_sec
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT p.purchase_id, t.touch_id, t.touch_type, t.t_sec, p.p_sec
        |  FROM p JOIN t ON p.user_id = t.user_id
        |  WHERE t.t_sec < p.p_sec AND t.t_sec >= p.p_sec - 7 * 86400),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY purchase_id
        |  ORDER BY t_sec DESC, touch_id DESC) AS INT) AS rnk FROM j)
        |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last_touch,
        |  sum(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << rnk)) AS decay_credit
        |FROM r WHERE rnk <= 20 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Sweep-line: per-second deltas SUM per tick before the running
    // sum, so no intra-second ordering exists; days are integer
    // epoch-day indices — all-BIGINT end to end.
    "q179_peak_concurrency" ->
      """WITH e AS (SELECT user_id, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |t AS (SELECT user_id, event_id, sec,
        |  lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM e),
        |s AS (SELECT user_id, sec, event_id,
        |  CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM t),
        |m AS (SELECT user_id, sec,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s),
        |spans AS (SELECT user_id, sid, min(sec) AS s_sec, max(sec) AS e_sec
        |  FROM m GROUP BY 1, 2),
        |clipped AS (SELECT di,
        |    greatest(s_sec, di * 86400) AS cs,
        |    least(e_sec, di * 86400 + 86399) AS ce
        |  FROM spans, UNNEST(range(s_sec // 86400, e_sec // 86400 + 1)) AS u(di)),
        |deltas AS (SELECT di, sec, CAST(sum(d) AS BIGINT) AS net FROM (
        |    SELECT di, cs AS sec, 1 AS d FROM clipped
        |    UNION ALL SELECT di, ce + 1 AS sec, -1 AS d FROM clipped)
        |  GROUP BY 1, 2),
        |run AS (SELECT di, sec,
        |  sum(net) OVER (PARTITION BY di ORDER BY sec
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
        |  FROM deltas),
        |mx AS (SELECT di, sec, active, max(active) OVER (PARTITION BY di) AS m
        |  FROM run),
        |peaks AS (SELECT di, CAST(max(active) AS BIGINT) AS peak_concurrency,
        |  min(sec) AS peak_sec FROM mx WHERE active = m GROUP BY 1),
        |ds AS (SELECT di, count(*) AS n_sessions FROM clipped GROUP BY 1)
        |SELECT DATE '1970-01-01' + CAST(p.di AS INT) AS day, ds.n_sessions,
        |  p.peak_concurrency, p.peak_sec
        |FROM peaks p JOIN ds USING (di) ORDER BY day""".stripMargin,

    // Session paths: list(... ORDER BY sec, event_id) ≡ Spark's
    // array_sort(collect_list(struct)) — the ordered-collect parity;
    // the ≤8 prefix filter bounds every session in both engines.
    "q180_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |t AS (SELECT *, lag(sec) OVER (PARTITION BY user_id
        |  ORDER BY sec, event_id) AS prev FROM e),
        |s AS (SELECT user_id, event_id, event_type, sec,
        |  CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM t),
        |m AS (SELECT user_id, event_id, event_type, sec,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM s),
        |f AS (SELECT * FROM (SELECT *, row_number() OVER (
        |    PARTITION BY user_id, sid ORDER BY sec, event_id) AS rk FROM m)
        |  WHERE rk <= 8),
        |p AS (SELECT user_id, sid,
        |  array_to_string(list(event_type ORDER BY sec, event_id), '>') AS path
        |  FROM f GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // CDC chunks: h % 8 == 0 on the 60-bit md5 prefix ⇔ the 15th hex
    // char is '0' or '8' — the divisor-8 boundary test needs no hex→int
    // conversion. 1-based i here ≡ Spark's 0-based i−1; boundary before
    // token i for i in 2..m−2 (trigram start exists).
    "q181_cdc_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tok AS (SELECT doc_id, i, tk[i] AS t, len(tk) AS m, tk
        |  FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |flags AS (SELECT doc_id, i, t,
        |  CASE WHEN i >= 2 AND i <= m - 2 AND substring(md5(
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 15, 1) IN ('0', '8')
        |  THEN 1 ELSE 0 END AS b FROM tok),
        |cid AS (SELECT doc_id, i, t,
        |  sum(b) OVER (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM flags),
        |chunks AS (SELECT doc_id, c, md5(string_agg(t, ' ' ORDER BY i)) AS fp
        |  FROM cid GROUP BY 1, 2),
        |withn AS (SELECT doc_id, fp,
        |  CAST(count(*) OVER (PARTITION BY doc_id) AS INT) AS n_chunks
        |  FROM chunks),
        |dpf AS (SELECT fp, count(DISTINCT doc_id) AS n_docs FROM withn GROUP BY 1)
        |SELECT w.doc_id, max(w.n_chunks) AS n_chunks,
        |  CAST(sum(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  round(CAST(sum(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / max(w.n_chunks), 4) AS shared_frac
        |FROM withn w JOIN dpf d USING (fp)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Hill: the x_ref term contributes ln(1)=0 so the sum runs over
    // all k+1 rows (tie-proof); each ln term quantizes to integer
    // nano-units before the order-free BIGINT sum; identical closing
    // division text in both engines.
    "q182_hill_tail" ->
      """WITH top AS (SELECT n_chars FROM documents
        |  ORDER BY n_chars DESC LIMIT 101),
        |ref AS (SELECT min(n_chars) AS x_ref FROM top),
        |terms AS (SELECT x_ref,
        |  CAST(round(ln(CAST(n_chars AS DOUBLE) / x_ref) * 1e9) AS BIGINT) AS tq
        |  FROM top, ref),
        |s AS (SELECT x_ref, CAST(sum(tq) AS BIGINT) AS sum_ln_e9
        |  FROM terms GROUP BY 1)
        |SELECT 100 AS k, x_ref, sum_ln_e9,
        |  CASE WHEN sum_ln_e9 = 0 THEN NULL
        |    ELSE round(CAST(100 AS DOUBLE) * 1e9 / sum_ln_e9, 4) END AS alpha
        |FROM s""".stripMargin,

    // Shared runs: raw gram text is the match key here vs the 60-bit
    // hash in Spark — set semantics identical (collisions ~2⁻⁴⁰ would
    // surface as a hash mismatch, not be absorbed).
    "q183_shared_runs" ->
      (shingleCte + """,
        |pg AS (SELECT doc_id, i AS pos,
        |  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
        |  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
        |uniq AS (SELECT doc_id, min(pos) AS pos, g FROM pg
        |  GROUP BY doc_id, g HAVING count(*) = 1),
        |mt AS (SELECT cand.id_a, cand.id_b, a.pos AS pa, b.pos AS pb
        |  FROM cand JOIN uniq a ON a.doc_id = cand.id_a
        |  JOIN uniq b ON b.doc_id = cand.id_b AND b.g = a.g),
        |runs AS (SELECT id_a, id_b, pa - pb AS d,
        |  pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb
        |    ORDER BY pa) AS rid FROM mt),
        |rl AS (SELECT id_a, id_b, CAST(count(*) AS INT) AS rg
        |  FROM runs GROUP BY id_a, id_b, d, rid)
        |SELECT id_a, id_b, max(rg) AS max_run_grams,
        |  max(rg) + 2 AS max_run_tokens
        |FROM rl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // SNM: lead() neighbors inside (bucket, key, doc_id) sort order —
    // a deterministic total order, so both engines see the identical
    // candidate set; verify is the q33 count-based Jaccard.
    "q184_snm_neardups" ->
      """WITH nk AS (SELECT doc_id,
        |  substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 24) AS k1,
        |  substring(reverse(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 24) AS k2
        |  FROM documents),
        |l1 AS (SELECT doc_id, lead(doc_id, 1) OVER w AS y1,
        |  lead(doc_id, 2) OVER w AS y2, lead(doc_id, 3) OVER w AS y3
        |  FROM (SELECT doc_id, k1 AS k, substring(k1, 1, 2) AS bkt FROM nk)
        |  WINDOW w AS (PARTITION BY bkt ORDER BY k, doc_id)),
        |l2 AS (SELECT doc_id, lead(doc_id, 1) OVER w AS y1,
        |  lead(doc_id, 2) OVER w AS y2, lead(doc_id, 3) OVER w AS y3
        |  FROM (SELECT doc_id, k2 AS k, substring(k2, 1, 2) AS bkt FROM nk)
        |  WINDOW w AS (PARTITION BY bkt ORDER BY k, doc_id)),
        |pairs0 AS (
        |  SELECT doc_id AS x, y1 AS y FROM l1 UNION ALL SELECT doc_id, y2 FROM l1
        |  UNION ALL SELECT doc_id, y3 FROM l1 UNION ALL SELECT doc_id, y1 FROM l2
        |  UNION ALL SELECT doc_id, y2 FROM l2 UNION ALL SELECT doc_id, y3 FROM l2),
        |cand AS (SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b
        |  FROM pairs0 WHERE y IS NOT NULL),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
        |  FROM toks WHERE len(tk) >= 3),
        |sz AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY 1),
        |it AS (SELECT c.id_a, c.id_b, count(*) AS inter
        |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY 1, 2),
        |j AS (SELECT it.id_a, it.id_b, a.nsh AS na, b.nsh AS nb, it.inter
        |  FROM it JOIN sz a ON a.doc_id = it.id_a JOIN sz b ON b.doc_id = it.id_b)
        |SELECT id_a, id_b,
        |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
        |FROM j WHERE round(CAST(inter AS DOUBLE) / (na + nb - inter), 4) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    // Fingerprints: ('0x' || hex)::BIGINT is DuckDB's conv(hex,16,10);
    // chr(1) ≡ the \u0001 field separator; xor is order-free so both
    // engines agree whatever their scan order.
    "q185_source_fingerprints" ->
      """WITH h AS (SELECT source,
        |  CAST(('0x' || substring(md5(concat_ws(chr(1), doc_id, text,
        |    lang, n_chars)), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS xor_fp
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    // Interpolation: the closing expression is textually identical to
    // Spark's over exact integer seconds and raw parquet doubles —
    // no rounding anywhere. Same-second readings sort before probes
    // (tag), so Δt = 0 degenerates to the reading exactly; nt > pt
    // whenever both exist, so the division is never by zero.
    "q186_interpolate" ->
      """WITH u AS (
        |  SELECT user_id, event_id,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    0 AS tag, value AS v
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, event_id,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |    1 AS tag, NULL AS v
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY sec, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |  last_value(CASE WHEN tag = 0 THEN sec END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY sec, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY sec, tag, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |  first_value(CASE WHEN tag = 0 THEN sec END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY sec, tag, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        |  FROM u)
        |SELECT event_id, user_id, sec,
        |  CASE WHEN pt IS NOT NULL AND nt IS NOT NULL THEN 'interp'
        |       WHEN pt IS NOT NULL THEN 'locf'
        |       WHEN nt IS NOT NULL THEN 'backfill'
        |       ELSE 'none' END AS method,
        |  CASE WHEN pt IS NOT NULL AND nt IS NOT NULL
        |         THEN pv + (nv - pv) * (CAST(sec - pt AS DOUBLE) / (nt - pt))
        |       WHEN pt IS NOT NULL THEN pv
        |       ELSE nv END AS est_value
        |FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin,

    // HLL: rank via length(bin(rest)) — string-based bit position, no
    // float log2; Σ 2^−M is dyadic-exact in any order; the α·m²/Σ and
    // m·ln(m/V) closers share formula text with the Spark side.
    "q187_hll_exact" ->
      """WITH h0 AS (SELECT event_type,
        |  CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)),
        |    1, 15)) AS BIGINT) AS h
        |  FROM events),
        |k AS (SELECT event_type, h >> 51 AS reg,
        |  h & ((CAST(1 AS BIGINT) << 51) - 1) AS rest FROM h0),
        |r AS (SELECT event_type, reg,
        |  CASE WHEN rest > 0 THEN 51 - length(bin(rest)) + 1
        |       ELSE 52 END AS rho FROM k),
        |regs AS (SELECT event_type, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_present,
        |  CAST(sum(CAST(1 AS BIGINT) << (52 - mj)) AS DOUBLE)
        |    / 4503599627370496.0 AS sum_present
        |  FROM regs GROUP BY 1),
        |e AS (SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |  FROM events GROUP BY 1),
        |f AS (SELECT pt.event_type, n_present, 512 - n_present AS n_zero,
        |  CAST(512 - n_present AS DOUBLE) + sum_present AS denom FROM pt),
        |g AS (SELECT *,
        |  (0.7213 / (1 + 1.079 / 512.0)) * 512.0 * 512.0 / denom AS raw FROM f)
        |SELECT g.event_type, e.exact_distinct, n_present,
        |  CAST(n_zero AS BIGINT) AS n_zero,
        |  CASE WHEN raw <= 2.5 * 512 AND n_zero > 0 THEN 'linear'
        |       ELSE 'raw' END AS method,
        |  round(CASE WHEN raw <= 2.5 * 512 AND n_zero > 0
        |    THEN 512.0 * ln(512.0 / n_zero) ELSE raw END, 2) AS estimate
        |FROM g JOIN e USING (event_type) ORDER BY 1""".stripMargin,

    // IVM: this oracle RECOMPUTES from scratch over the whole table —
    // a hash match against the merged-partials Spark side is the
    // incremental ≡ full proof.
    "q188_incremental_hourly" ->
      """SELECT CAST(hour(ts) AS INT) AS hour,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE)
        |    / (count(*) * 10000), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Permutation test: permutation b = "group A is the n_a rows with
    // the smallest md5(b:event_id)" — deterministic, so even the
    // Monte-Carlo p-value hash-matches; exceedance compares exact
    // integers over the shared n_a·n_b denominator.
    "q190_permutation_test" ->
      """WITH rows0 AS (SELECT event_id,
        |  CAST(event_type = 'purchase' AS INT) AS is_a,
        |  CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |c AS (SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
        |  CAST(sum(1 - is_a) AS BIGINT) AS n_b,
        |  CAST(sum(cents * is_a) AS BIGINT) AS s_a_obs,
        |  CAST(sum(cents * (1 - is_a)) AS BIGINT) AS s_b_obs,
        |  CAST(sum(cents) AS BIGINT) AS s_tot FROM rows0),
        |x AS (SELECT r.event_id, r.cents, b, md5(b || ':' || r.event_id) AS h,
        |  c.n_a, c.n_b, c.s_tot, c.s_a_obs, c.s_b_obs
        |  FROM rows0 r CROSS JOIN c CROSS JOIN UNNEST(range(1, 201)) AS u(b)),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY b
        |  ORDER BY h, event_id) AS rkn FROM x),
        |p AS (SELECT b,
        |  CAST(sum(CASE WHEN rkn <= n_a THEN cents ELSE 0 END) AS BIGINT) AS s_a,
        |  max(n_a) AS n_a, max(n_b) AS n_b, max(s_tot) AS s_tot,
        |  max(s_a_obs) AS s_a_obs, max(s_b_obs) AS s_b_obs
        |  FROM rk GROUP BY b),
        |e AS (SELECT *, abs(s_a * n_b - (s_tot - s_a) * n_a) AS num_b,
        |  abs(s_a_obs * n_b - s_b_obs * n_a) AS num_obs FROM p)
        |SELECT n_a, n_b,
        |  round(CAST(s_a_obs AS DOUBLE) / (n_a * 100) -
        |        CAST(s_b_obs AS DOUBLE) / (n_b * 100), 4) AS t_obs,
        |  CAST(sum(CASE WHEN num_b >= num_obs THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_extreme,
        |  round(CAST(sum(CASE WHEN num_b >= num_obs THEN 1 ELSE 0 END) + 1
        |    AS DOUBLE) / 201, 4) AS p_value
        |FROM e GROUP BY 1, 2, 3""".stripMargin,

    // HLL set algebra: union = register-wise max (no data pass);
    // intersection via inclusion–exclusion on the three rounded
    // estimates — same registers as q187, so every row hash-matches.
    "q191_hll_overlap" ->
      """WITH keyed AS (SELECT event_type, user_id,
        |  CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)),
        |    1, 15)) AS BIGINT) AS h
        |  FROM events WHERE event_type IN ('click', 'view')),
        |kr AS (SELECT event_type, user_id, h >> 51 AS reg,
        |  h & ((CAST(1 AS BIGINT) << 51) - 1) AS rest FROM keyed),
        |krr AS (SELECT event_type, user_id, reg,
        |  CASE WHEN rest > 0 THEN 51 - length(bin(rest)) + 1
        |       ELSE 52 END AS rho FROM kr),
        |pt AS (SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END
        |  AS set_name, reg, max(rho) AS mj FROM krr GROUP BY 1, 2),
        |un AS (SELECT 'union' AS set_name, reg, max(mj) AS mj FROM pt GROUP BY 2),
        |allr AS (SELECT * FROM pt UNION ALL SELECT * FROM un),
        |agg AS (SELECT set_name, CAST(count(*) AS BIGINT) AS n_present,
        |  CAST(sum(CAST(1 AS BIGINT) << (52 - mj)) AS DOUBLE)
        |    / 4503599627370496.0 AS sum_present
        |  FROM allr GROUP BY 1),
        |f AS (SELECT set_name, n_present, 512 - n_present AS n_zero,
        |  CAST(512 - n_present AS DOUBLE) + sum_present AS denom FROM agg),
        |g AS (SELECT set_name,
        |  (0.7213 / (1 + 1.079 / 512.0)) * 512.0 * 512.0 / denom AS raw,
        |  n_zero FROM f),
        |est AS (SELECT set_name,
        |  round(CASE WHEN raw <= 2.5 * 512 AND n_zero > 0
        |    THEN 512.0 * ln(512.0 / n_zero) ELSE raw END, 2) AS estimate
        |  FROM g),
        |ie AS (SELECT 'intersection' AS set_name,
        |  round((SELECT estimate FROM est WHERE set_name = 'a')
        |      + (SELECT estimate FROM est WHERE set_name = 'b')
        |      - (SELECT estimate FROM est WHERE set_name = 'union'), 2)
        |  AS estimate),
        |alle AS (SELECT * FROM est UNION ALL SELECT * FROM ie),
        |pu AS (SELECT user_id,
        |  max(CAST(event_type = 'click' AS INT)) AS in_a,
        |  max(CAST(event_type = 'view' AS INT)) AS in_b
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |ex AS (SELECT CAST(sum(in_a) AS BIGINT) AS a,
        |  CAST(sum(in_b) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS u,
        |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS i FROM pu),
        |exl AS (SELECT 'a' AS set_name, a AS exact_distinct FROM ex
        |  UNION ALL SELECT 'b', b FROM ex
        |  UNION ALL SELECT 'union', u FROM ex
        |  UNION ALL SELECT 'intersection', i FROM ex)
        |SELECT e.set_name, e.exact_distinct, alle.estimate
        |FROM exl e JOIN alle USING (set_name) ORDER BY set_name""".stripMargin,

    // PQ codes: one kmeans CTE chain PER SUBSPACE (prefixes s0/s1)
    // over //-sliced vectors — the q142 recurrence twice.
    "q192_pq_codes" ->
      s"""WITH ${kmeansCtes(4, 3, pqSubSql(0, 2), "s0")},
         |${kmeansCtes(4, 3, pqSubSql(1, 2), "s1")}
         |SELECT vec_id, 0 AS sub, cluster AS code,
         |  floor(dist_r * 10000 + 0.5) / 10000 AS dist2
         |FROM s0a4
         |UNION ALL
         |SELECT vec_id, 1 AS sub, cluster AS code,
         |  floor(dist_r * 10000 + 0.5) / 10000 AS dist2
         |FROM s1a4
         |ORDER BY vec_id, sub""".stripMargin,

    // PQ ADC: codebooks from the FINAL update CTEs (s0c3/s1c3), the
    // kmeans round-6 distance kernel for the query-side LUT, integer
    // micro-unit promotion before the cross-subspace sum (a 2-term
    // double sum is order-safe, but the BIGINT form stays exact at
    // any m), rank ties on vec_id.
    "q193_pq_ann" ->
      s"""WITH ${kmeansCtes(4, 3, pqSubSql(0, 2), "s0")},
         |${kmeansCtes(4, 3, pqSubSql(1, 2), "s1")},
         |codes AS (SELECT vec_id, 0 AS sub, cluster AS code FROM s0a4
         |  UNION ALL SELECT vec_id, 1, cluster FROM s1a4),
         |cb AS (SELECT 0 AS sub, CAST(g.i AS INT) AS code,
         |    c.cs[CAST(g.i AS INT)] AS cv
         |  FROM range(1, 5) AS g(i) CROSS JOIN s0c3 c
         |  UNION ALL SELECT 1, CAST(g.i AS INT), c.cs[CAST(g.i AS INT)]
         |  FROM range(1, 5) AS g(i) CROSS JOIN s1c3 c),
         |q AS (SELECT 0 AS sub, vec_id AS q_id, v AS qv FROM s0e WHERE vec_id < 8
         |  UNION ALL SELECT 1, vec_id, v FROM s1e WHERE vec_id < 8),
         |lut AS (SELECT q_id, sub, code,
         |  CAST(round(round(CASE WHEN len(qv) = 0 THEN 0.0 ELSE
         |    list_reduce(list_transform(qv, (el, j) ->
         |      (el - cv[j]) * (el - cv[j])), (x, y) -> x + y) END, 6)
         |    * 1000000) AS BIGINT) AS pdm
         |  FROM q JOIN cb USING (sub)),
         |sc AS (SELECT q_id, vec_id, CAST(sum(pdm) AS BIGINT) AS adcm
         |  FROM codes JOIN lut USING (sub, code) GROUP BY 1, 2),
         |r AS (SELECT q_id, vec_id,
         |  CAST((adcm + 50) // 100 AS DOUBLE) / 10000 AS adc_dist2,
         |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adcm, vec_id)
         |    AS INT) AS rk FROM sc)
         |SELECT q_id, vec_id, adc_dist2, rk FROM r WHERE rk <= 5
         |ORDER BY q_id, rk""".stripMargin,

    // PQ recall: the q193 ADC block verbatim for the approx set, a
    // broadcast-panel exact-L2 scan for the truth set, semi-join count
    // per query (0-hit queries kept by the left join off the panel).
    "q194_pq_recall" ->
      s"""WITH ${kmeansCtes(4, 3, pqSubSql(0, 2), "s0")},
         |${kmeansCtes(4, 3, pqSubSql(1, 2), "s1")},
         |codes AS (SELECT vec_id, 0 AS sub, cluster AS code FROM s0a4
         |  UNION ALL SELECT vec_id, 1, cluster FROM s1a4),
         |cb AS (SELECT 0 AS sub, CAST(g.i AS INT) AS code,
         |    c.cs[CAST(g.i AS INT)] AS cv
         |  FROM range(1, 5) AS g(i) CROSS JOIN s0c3 c
         |  UNION ALL SELECT 1, CAST(g.i AS INT), c.cs[CAST(g.i AS INT)]
         |  FROM range(1, 5) AS g(i) CROSS JOIN s1c3 c),
         |q AS (SELECT 0 AS sub, vec_id AS q_id, v AS qv FROM s0e WHERE vec_id < 8
         |  UNION ALL SELECT 1, vec_id, v FROM s1e WHERE vec_id < 8),
         |lut AS (SELECT q_id, sub, code,
         |  CAST(round(round(CASE WHEN len(qv) = 0 THEN 0.0 ELSE
         |    list_reduce(list_transform(qv, (el, j) ->
         |      (el - cv[j]) * (el - cv[j])), (x, y) -> x + y) END, 6)
         |    * 1000000) AS BIGINT) AS pdm
         |  FROM q JOIN cb USING (sub)),
         |sc AS (SELECT q_id, vec_id, CAST(sum(pdm) AS BIGINT) AS adcm
         |  FROM codes JOIN lut USING (sub, code) GROUP BY 1, 2),
         |ap AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY adcm, vec_id) AS rk
         |  FROM sc) WHERE rk <= 5),
         |fe AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |exd AS (SELECT p.vec_id AS q_id, e.vec_id,
         |  round(CASE WHEN len(e.v) = 0 THEN 0.0 ELSE
         |    list_reduce(list_transform(e.v, (el, j) ->
         |      (el - p.v[j]) * (el - p.v[j])), (x, y) -> x + y) END, 6) AS d2
         |  FROM fe e CROSS JOIN (SELECT vec_id, v FROM fe WHERE vec_id < 8) p),
         |ext AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
         |  row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rk
         |  FROM exd) WHERE rk <= 5),
         |hit AS (SELECT ext.q_id, CAST(count(ap.vec_id) AS BIGINT) AS n_hit
         |  FROM ext LEFT JOIN ap ON ext.q_id = ap.q_id AND ext.vec_id = ap.vec_id
         |  GROUP BY 1)
         |SELECT p.q_id, coalesce(h.n_hit, 0) AS n_hit,
         |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5 AS recall
         |FROM (SELECT DISTINCT vec_id AS q_id FROM fe WHERE vec_id < 8) p
         |LEFT JOIN hit h USING (q_id) ORDER BY q_id""".stripMargin,

    "q189_forget_audit" ->
      """WITH f AS (SELECT DISTINCT user_id FROM events WHERE user_id % 53 = 0),
        |s AS (SELECT e.* FROM events e LEFT JOIN f ON e.user_id = f.user_id
        |  WHERE f.user_id IS NULL)
        |SELECT (SELECT count(*) FROM events) AS n_events_before,
        |  (SELECT count(*) FROM events WHERE user_id IN (SELECT user_id FROM f))
        |    AS n_events_removed,
        |  (SELECT count(*) FROM s) AS n_events_after,
        |  (SELECT count(*) FROM f) AS n_users_requested,
        |  (SELECT count(DISTINCT user_id) FROM events
        |    WHERE user_id IN (SELECT user_id FROM f)) AS n_users_matched,
        |  (SELECT count(*) FROM s WHERE user_id IN (SELECT user_id FROM f))
        |    AS n_residual,
        |  CAST((SELECT count(*) FROM s WHERE user_id IN (SELECT user_id FROM f)) = 0
        |    AND (SELECT count(*) FROM s) +
        |        (SELECT count(*) FROM events WHERE user_id IN (SELECT user_id FROM f))
        |      = (SELECT count(*) FROM events) AS INT) AS clean""".stripMargin,

    // Per-type OLS drift line over DAILY MEAN values. Engine parity:
    // per-day cent-quantized BIGINT sums; ONE double division to the
    // daily mean, re-quantized to 1e-4 units; the five OLS sufficient
    // statistics are BIGINT sums (order-free, x re-based per type);
    // the three closing formulas share identical text with the Spark
    // side, and the 4-decimal displays use the floor(x*1e4+0.5)/1e4
    // computed-double convention.
    "q195_ols_trend" ->
      """WITH daily AS (SELECT event_type,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |       date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s_cents,
        |  count(*) AS n_ev FROM events GROUP BY 1, 2),
        |q AS (SELECT event_type, d,
        |  CAST(floor(CAST(s_cents AS DOUBLE) / CAST(n_ev AS DOUBLE) * 100 + 0.5) AS BIGINT) AS yq
        |  FROM daily),
        |b AS (SELECT event_type, d - min(d) OVER (PARTITION BY event_type) AS x, yq FROM q),
        |s AS (SELECT event_type, count(*) AS n_days,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(yq * yq) AS BIGINT) AS syy,
        |  CAST(sum(x * yq) AS BIGINT) AS sxy FROM b GROUP BY 1),
        |m AS (SELECT event_type, n_days,
        |  n_days * sxy - sx * sy AS cov, n_days * sxx - sx * sx AS vxx,
        |  n_days * syy - sy * sy AS vyy, sx, sy FROM s)
        |SELECT event_type, n_days,
        |CASE WHEN vxx = 0 THEN NULL ELSE
        |  floor(CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0 END AS slope,
        |CASE WHEN vxx = 0 THEN NULL ELSE
        |  floor((CAST(sy AS DOUBLE) - CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * CAST(sx AS DOUBLE))
        |  / CAST(n_days AS DOUBLE) / 10000.0 * 10000.0 + 0.5) / 10000.0 END AS intercept,
        |CASE WHEN vxx = 0 OR vyy = 0 THEN NULL ELSE
        |  floor(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE) / (CAST(vxx AS DOUBLE) * CAST(vyy AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 END AS r2
        |FROM m ORDER BY event_type""".stripMargin,

    // Phrase search: the oracle mines trigrams row-locally (the q58
    // shingle pattern) — semantically identical to the Spark side's
    // positional-postings adjacency joins. Panel ties: count desc,
    // phrase asc; per-phrase doc rank: n_in_doc desc, doc_id asc.
    "q196_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tri AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS phrase
        |       FROM toks WHERE len(tk) >= 3),
        |pd AS (SELECT phrase, doc_id, count(*) AS n_in_doc FROM tri GROUP BY 1, 2),
        |panel AS (SELECT phrase, CAST(sum(n_in_doc) AS BIGINT) AS occurrences,
        |  count(*) AS df FROM pd GROUP BY 1
        |  ORDER BY occurrences DESC, phrase LIMIT 5),
        |r AS (SELECT pd.phrase, panel.df, panel.occurrences, pd.doc_id,
        |  pd.n_in_doc, CAST(row_number() OVER (PARTITION BY pd.phrase
        |    ORDER BY pd.n_in_doc DESC, pd.doc_id) AS INT) AS rk
        |  FROM pd JOIN panel USING (phrase))
        |SELECT phrase, df, occurrences, doc_id, n_in_doc, rk FROM r
        |WHERE rk <= 3 ORDER BY occurrences DESC, phrase, rk""".stripMargin,

    // Truncation recall sweep: q93's exact-vs-approx recall pattern,
    // with the approx tier = brute-force cosine on v[1:d] prefixes.
    // One ranked CTE per dim, identical cosine formula text per tier.
    "q197_truncation_recall" -> {
      val dims = Seq(8, 16, 32)
      def rankedCte(name: String, vec: String, qvec: String) =
        s"""$name AS (SELECT q.q_id, b.vec_id, row_number() OVER (PARTITION BY q.q_id
           |ORDER BY list_dot_product($vec, $qvec) /
           |(sqrt(list_dot_product($vec, $vec)) * sqrt(list_dot_product($qvec, $qvec))) DESC,
           |b.vec_id) AS rk FROM base b CROSS JOIN q WHERE b.vec_id <> q.q_id)""".stripMargin
      val sweepCtes = dims.map(d =>
        rankedCte(s"a$d", s"b.v[1:$d]", s"q.qv[1:$d]") + ",\n" +
          s"s$d AS (SELECT CAST($d AS INT) AS dim, q_id, vec_id FROM a$d WHERE rk <= 5)")
        .mkString(",\n")
      val sweepUnion = dims.map(d => s"SELECT * FROM s$d").mkString(" UNION ALL ")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 8),
         |${rankedCte("ex", "b.v", "q.qv")},
         |e5 AS (SELECT q_id, vec_id FROM ex WHERE rk <= 5),
         |$sweepCtes,
         |sw AS ($sweepUnion),
         |dims AS (SELECT CAST(unnest([${dims.mkString(", ")}]) AS INT) AS dim),
         |expd AS (SELECT d.dim, e.q_id, e.vec_id FROM e5 e CROSS JOIN dims d)
         |SELECT expd.dim, CAST(count(*) AS INT) AS n_expected,
         |CAST(count(sw.vec_id) AS INT) AS hits,
         |floor(CAST(count(sw.vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS recall
         |FROM expd LEFT JOIN sw ON expd.dim = sw.dim AND expd.q_id = sw.q_id
         |  AND expd.vec_id = sw.vec_id
         |GROUP BY expd.dim ORDER BY expd.dim""".stripMargin
    },

    // LSH bucket balance: exact integer stats off the q38 bucket ids;
    // the two closing divisions use the computed-double floor display.
    "q198_bucket_balance" ->
      s"""WITH b AS (SELECT CAST(${bucketTerms("CAST(embedding AS DOUBLE[])")} AS INT)
         |  AS bucket_id FROM embeddings),
         |s AS (SELECT bucket_id, count(*) AS n FROM b GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_vecs, count(*) AS n_buckets,
         |  CAST(max(n) AS BIGINT) AS max_bucket,
         |  CAST(sum(n * (n - 1)) AS BIGINT) AS cand2 FROM s)
         |SELECT n_vecs, n_buckets, max_bucket,
         |cand2 // 2 AS candidate_pairs,
         |n_vecs * (n_vecs - 1) // 2 AS brute_pairs,
         |floor(CAST(cand2 AS DOUBLE) / CAST(n_vecs * (n_vecs - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cand_frac,
         |floor(CAST(max_bucket AS DOUBLE) / (CAST(n_vecs AS DOUBLE) / CAST(n_buckets AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS imbalance
         |FROM t""".stripMargin,

    // MinHash estimator calibration: q33's cand + exact-Jaccard tail
    // at the cascade's operating threshold 0.2, an independent md5
    // "c<i>:" 16-component signature, and integer-quantized error
    // means. (The Spark side serves the pair frame from the
    // materialized cascade; this oracle recomputes it — same rows.)
    "q199_minhash_calibration" -> {
      val k = 16
      val compCols = (0 until k).map(i => s"min(md5('c$i:' || shingle)) AS c$i").mkString(", ")
      val mExpr = (0 until k).map(i => s"(CASE WHEN a.c$i = b.c$i THEN 1 ELSE 0 END)").mkString(" + ")
      shingleCte +
        s""",
           |sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sset FROM sh GROUP BY doc_id),
           |j AS (SELECT id_a, id_b,
           |round(CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) /
           |(len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))), 4) AS jaccard
           |FROM cand JOIN sets sa ON cand.id_a = sa.doc_id JOIN sets sb ON cand.id_b = sb.doc_id),
           |jp AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.2),
           |comps AS (SELECT doc_id, $compCols FROM sh GROUP BY doc_id),
           |sc AS (SELECT jp.jaccard, ($mExpr) AS m
           |  FROM jp JOIN comps a ON jp.id_a = a.doc_id JOIN comps b ON jp.id_b = b.doc_id),
           |e AS (SELECT CAST(m AS DOUBLE) / CAST($k AS DOUBLE) AS est,
           |  CAST(floor(jaccard * 1e4 + 0.5) AS BIGINT) AS tq,
           |  CAST(floor(abs(CAST(m AS DOUBLE) / CAST($k AS DOUBLE) - jaccard) * 1e6 + 0.5) AS BIGINT) AS eq
           |  FROM sc)
           |SELECT est, count(*) AS n_pairs,
           |floor(CAST(sum(tq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 AS mean_true,
           |floor(CAST(sum(eq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS mean_abs_err
           |FROM e GROUP BY est ORDER BY est""".stripMargin
    },

    "q200_subword_stats" -> (subwordCtes +
      """
        |SELECT doc_id, n_words, n_subwords, n_unk,
        |floor(CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e4 + 0.5) / 1e4 AS fertility
        |FROM st ORDER BY doc_id""".stripMargin),

    "q201_subword_fertility" -> (subwordCtes +
      """,
        |stl AS (SELECT d.lang, st.n_words, st.n_subwords, st.n_unk
        |  FROM st JOIN documents d USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        |CAST(sum(n_words) AS BIGINT) AS n_words,
        |CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
        |CAST(sum(n_unk) AS BIGINT) AS n_unk,
        |floor(CAST(sum(n_subwords) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS fertility,
        |floor(CAST(sum(n_unk) AS DOUBLE) / CAST(sum(n_subwords) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS unk_rate
        |FROM stl GROUP BY lang ORDER BY lang""".stripMargin),

    // Arrival-order semantic dedup: the q79 bucket join restricted to
    // the vec_id prefix, with the earliest-prior-match and prior
    // count per vector; raw-double cosine threshold compares
    // identically (q93-proven formula text).
    "q202_semantic_prefix_dedup" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  CAST(${bucketTerms("CAST(embedding AS DOUBLE[])")} AS INT) AS bucket_id
         |  FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b FROM b a
         |  JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id
         |  WHERE list_dot_product(a.v, c.v) /
         |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) >= 0.3),
         |h AS (SELECT id_b AS vec_id, CAST(min(id_a) AS BIGINT) AS dup_of,
         |  count(*) AS n_prior FROM p GROUP BY 1)
         |SELECT e.vec_id,
         |CAST(CASE WHEN h.dup_of IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup,
         |h.dup_of, CAST(coalesce(h.n_prior, 0) AS BIGINT) AS n_prior
         |FROM embeddings e LEFT JOIN h ON e.vec_id = h.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // Sliding-window HLL: the q187 register pipeline grouped hourly,
    // merged over trailing offsets by register max (a sketch-row
    // explode, never a second data pass), same dyadic-exact finisher.
    "q203_hll_sliding" ->
      """WITH h0 AS (SELECT
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('hour', ts)) / 3600 AS BIGINT) AS h, user_id,
        |  CAST(('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)),
        |    1, 15)) AS BIGINT) AS hsh FROM events),
        |k AS (SELECT h, hsh >> 51 AS reg,
        |  hsh & ((CAST(1 AS BIGINT) << 51) - 1) AS rest FROM h0),
        |r AS (SELECT h, reg, CASE WHEN rest > 0
        |  THEN 51 - length(bin(rest)) + 1 ELSE 52 END AS rho FROM k),
        |regs AS (SELECT h, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
        |hours AS (SELECT DISTINCT h FROM h0),
        |mg0 AS (SELECT regs.h + o.off AS h, reg, mj
        |  FROM regs, unnest(range(0, 24)) AS o(off)),
        |mg AS (SELECT m.h, reg, max(mj) AS mj FROM mg0 m
        |  JOIN hours ON m.h = hours.h GROUP BY 1, 2),
        |ex0 AS (SELECT DISTINCT h, user_id FROM h0),
        |ex1 AS (SELECT e.h + o.off AS h, user_id
        |  FROM ex0 e, unnest(range(0, 24)) AS o(off)),
        |ex AS (SELECT e.h, CAST(count(DISTINCT user_id) AS BIGINT)
        |  AS exact_distinct FROM ex1 e JOIN hours ON e.h = hours.h GROUP BY 1),
        |pt AS (SELECT h, CAST(count(*) AS BIGINT) AS n_present,
        |  CAST(sum(CAST(1 AS BIGINT) << (52 - mj)) AS DOUBLE)
        |    / 4503599627370496.0 AS sum_present FROM mg GROUP BY 1),
        |f AS (SELECT h, n_present, 512 - n_present AS n_zero,
        |  CAST(512 - n_present AS DOUBLE) + sum_present AS denom FROM pt),
        |g AS (SELECT *,
        |  (0.7213 / (1 + 1.079 / 512.0)) * 512.0 * 512.0 / denom AS raw FROM f)
        |SELECT g.h, ex.exact_distinct, n_present,
        |  CAST(n_zero AS BIGINT) AS n_zero,
        |  CASE WHEN raw <= 2.5 * 512 AND n_zero > 0 THEN 'linear'
        |       ELSE 'raw' END AS method,
        |  round(CASE WHEN raw <= 2.5 * 512 AND n_zero > 0
        |    THEN 512.0 * ln(512.0 / n_zero) ELSE raw END, 2) AS estimate
        |FROM g JOIN ex USING (h) ORDER BY h""".stripMargin,

    // Double-fire audit: lag inside natural (user, type) partitions.
    "q204_duplicate_events" ->
      """WITH s AS (SELECT user_id, event_type, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |l AS (SELECT event_type, sec, lag(sec) OVER (PARTITION BY user_id,
        |  event_type ORDER BY sec, event_id) AS prev FROM s),
        |d AS (SELECT event_type, CASE WHEN prev IS NOT NULL
        |  AND sec - prev <= 60 THEN 1 ELSE 0 END AS is_dup FROM l)
        |SELECT event_type, count(*) AS n_events,
        |CAST(sum(is_dup) AS BIGINT) AS n_dups,
        |floor(CAST(sum(is_dup) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS dup_rate
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    // CUPED: per-user cent-quantized period means, BIGINT sufficient
    // statistics, double closing formulas shared textually.
    "q205_cuped_lift" ->
      """WITH days AS (SELECT user_id,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |sp AS (SELECT min(d) AS d0 FROM days),
        |per0 AS (SELECT user_id,
        |  CAST(sum(CASE WHEN d < d0 + 15 THEN cents END) AS BIGINT) AS sxc,
        |  count(CASE WHEN d < d0 + 15 THEN 1 END) AS nx,
        |  CAST(sum(CASE WHEN NOT (d < d0 + 15) THEN cents END) AS BIGINT) AS syc,
        |  count(CASE WHEN NOT (d < d0 + 15) THEN 1 END) AS ny
        |  FROM days CROSS JOIN sp GROUP BY user_id),
        |per AS (SELECT user_id,
        |  CAST(floor(CAST(sxc AS DOUBLE) / CAST(nx AS DOUBLE) + 0.5) AS BIGINT) AS xq,
        |  CAST(floor(CAST(syc AS DOUBLE) / CAST(ny AS DOUBLE) + 0.5) AS BIGINT) AS yq,
        |  CAST(user_id % 2 AS INT) AS grp
        |  FROM per0 WHERE nx > 0 AND ny > 0),
        |s AS (SELECT count(*) AS n,
        |  CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |  CAST(sum(xq * xq) AS BIGINT) AS sxx, CAST(sum(yq * yq) AS BIGINT) AS syy,
        |  CAST(sum(xq * yq) AS BIGINT) AS sxy,
        |  count(CASE WHEN grp = 0 THEN 1 END) AS n_a,
        |  CAST(sum(CASE WHEN grp = 0 THEN xq END) AS BIGINT) AS sxa,
        |  CAST(sum(CASE WHEN grp = 0 THEN yq END) AS BIGINT) AS sya,
        |  count(CASE WHEN grp = 1 THEN 1 END) AS n_b,
        |  CAST(sum(CASE WHEN grp = 1 THEN xq END) AS BIGINT) AS sxb,
        |  CAST(sum(CASE WHEN grp = 1 THEN yq END) AS BIGINT) AS syb
        |  FROM per),
        |m AS (SELECT n, n_a, n_b, n * sxy - sx * sy AS cov,
        |  n * sxx - sx * sx AS vxx, n * syy - sy * sy AS vyy,
        |  sx, sxa, sya, sxb, syb FROM s)
        |SELECT n_a, n_b,
        |CASE WHEN vxx = 0 THEN NULL ELSE floor(CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS theta,
        |floor((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)) / 1e2 * 1e4 + 0.5) / 1e4 AS lift_raw,
        |CASE WHEN vxx = 0 THEN NULL ELSE floor(((CAST(syb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sya AS DOUBLE) / CAST(n_a AS DOUBLE)) - CAST(cov AS DOUBLE) / CAST(vxx AS DOUBLE) * (CAST(sxb AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(sxa AS DOUBLE) / CAST(n_a AS DOUBLE))) / 1e2 * 1e4 + 0.5) / 1e4 END AS lift_cuped,
        |CASE WHEN vxx = 0 OR vyy = 0 THEN NULL ELSE floor(CAST(cov AS DOUBLE) * CAST(cov AS DOUBLE) / (CAST(vxx AS DOUBLE) * CAST(vyy AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS var_reduction
        |FROM m""".stripMargin,

    // RFM: per-user (recency, frequency, cent-quantized monetary),
    // quartile thresholds via quantile_cont (= Spark's exact
    // percentile, q11-proven), identical <=/>= tie comparisons.
    "q206_rfm_segments" ->
      """WITH per AS (SELECT user_id,
        |  max(CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT)) AS last_d,
        |  count(*) AS f,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(last_d) AS dmax FROM per),
        |rfm AS (SELECT user_id, dmax - last_d AS r, f, m FROM per CROSS JOIN mx),
        |th AS (SELECT quantile_cont(r, 0.25) AS r1, quantile_cont(r, 0.5) AS r2,
        |  quantile_cont(r, 0.75) AS r3,
        |  quantile_cont(f, 0.25) AS f1, quantile_cont(f, 0.5) AS f2,
        |  quantile_cont(f, 0.75) AS f3,
        |  quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
        |  quantile_cont(m, 0.75) AS m3 FROM rfm),
        |s AS (SELECT
        |  CASE WHEN r <= r1 THEN 4 WHEN r <= r2 THEN 3 WHEN r <= r3 THEN 2
        |    ELSE 1 END AS r_score,
        |  CASE WHEN f >= f3 THEN 4 WHEN f >= f2 THEN 3 WHEN f >= f1 THEN 2
        |    ELSE 1 END AS f_score,
        |  CASE WHEN m >= m3 THEN 4 WHEN m >= m2 THEN 3 WHEN m >= m1 THEN 2
        |    ELSE 1 END AS m_score, m
        |  FROM rfm CROSS JOIN th)
        |SELECT r_score, f_score, m_score, count(*) AS n_users,
        |CAST(CAST(sum(m) AS BIGINT) AS DOUBLE) / 1e2 AS total_monetary
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q207_bpe_merges" -> (subwordSeqCtes +
      """
        |SELECT t1, t2, t1 || t2 AS merged, CAST(sum(mult) AS BIGINT) AS pair_count
        |FROM pairs JOIN wc USING (w)
        |GROUP BY 1, 2 ORDER BY pair_count DESC, t1, t2 LIMIT 20""".stripMargin),

    // Centroid-based silhouette over the q142 k-means chain: the
    // per-centroid distances are the trainer's own round-6 values,
    // per-point s quantized to 1e-6 before the BIGINT mean sums.
    "q208_silhouette" ->
      s"""WITH ${kmeansCtes(4, 3)},
         |sd AS (SELECT a4.vec_id, a4.cluster,
         |  list_sort(list_transform(c3.cs, c ->
         |    CASE WHEN len(a4.v) = 0 THEN 0.0 ELSE
         |    round(list_reduce(list_transform(a4.v, (el, j) ->
         |      (el - c[j]) * (el - c[j])), (x, y) -> x + y), 6) END)) AS ds
         |  FROM a4 CROSS JOIN c3),
         |sil AS (SELECT cluster,
         |  CAST(floor(sqrt(ds[1]) * 1e6 + 0.5) AS BIGINT) AS aq,
         |  CAST(floor(CASE WHEN greatest(sqrt(ds[1]), sqrt(ds[2])) = 0 THEN 0.0
         |    ELSE (sqrt(ds[2]) - sqrt(ds[1])) /
         |    greatest(sqrt(ds[1]), sqrt(ds[2])) END * 1e6 + 0.5) AS BIGINT) AS sq
         |  FROM sd)
         |SELECT cluster, count(*) AS n_points,
         |floor(CAST(sum(aq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS mean_dist,
         |floor(CAST(sum(sq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 * 1e4 + 0.5) / 1e4 AS mean_silhouette
         |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin,

    // Shared-run excision: gram STRINGS stand in for the Spark side's
    // 60-bit gram hashes (the q183 equivalence), coverage via a
    // bounded offset explode, the run/grp/size windows inside doc
    // partitions, coalesce('') for the fully-excised-document edge.
    "q209_excise_runs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |pg AS (SELECT doc_id, i - 1 AS pos,
        |  tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g
        |  FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)),
        |sh AS (SELECT g FROM pg GROUP BY g HAVING count(DISTINCT doc_id) > 1),
        |cs AS (SELECT DISTINCT doc_id, pos + o.off AS j
        |  FROM pg, unnest(range(0, 3)) AS o(off)
        |  WHERE g IN (SELECT g FROM sh)),
        |t AS (SELECT doc_id, i - 1 AS j, tk[i] AS tok
        |  FROM toks, UNNEST(range(1, len(tk) + 1)) AS u(i)),
        |f AS (SELECT t.doc_id, t.j, t.tok,
        |  CASE WHEN cs.j IS NULL THEN 0 ELSE 1 END AS cov
        |  FROM t LEFT JOIN cs ON t.doc_id = cs.doc_id AND t.j = cs.j),
        |r AS (SELECT *, j - row_number() OVER (PARTITION BY doc_id, cov
        |  ORDER BY j) AS grp FROM f),
        |rs AS (SELECT *, count(*) OVER (PARTITION BY doc_id, cov, grp) AS rsz
        |  FROM r),
        |k AS (SELECT doc_id, j, tok, (cov = 0 OR rsz < 6) AS keep FROM rs)
        |SELECT doc_id, count(*) AS n_tokens,
        |CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |coalesce(string_agg(CASE WHEN keep THEN tok END, ' ' ORDER BY j), '')
        |  AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // aHash: byte extraction via the hex STRING (both engines hex
    // uppercase), exact-integer threshold bits (48·g_i > Σg), the
    // whole signature one list_reduce.
    "q210_image_ahash" ->
      """WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
        |h AS (SELECT doc_id, CAST(octet_length(b) AS BIGINT) AS n_bytes,
        |  upper(hex(b)) AS hx FROM p WHERE octet_length(b) >= 1),
        |g AS (SELECT doc_id, n_bytes, list_transform(range(0, 48), i ->
        |  ('0x' || substring(hx, CAST(2 * (1 + i * n_bytes // 48) - 1 AS INT), 2))::BIGINT) AS g
        |  FROM h),
        |s AS (SELECT *, list_reduce(g, (a, x) -> a + x) AS s FROM g)
        |SELECT doc_id, n_bytes,
        |list_reduce(list_transform(range(0, 48), i ->
        |  CASE WHEN 48 * g[CAST(i + 1 AS INT)] > s
        |  THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |  (a, x) -> a + x) AS ahash
        |FROM s ORDER BY doc_id""".stripMargin,

    // aHash pairs: the q34-family pigeonhole (6 byte blocks on the
    // 48-bit signature) + bit_count verify.
    "q211_ahash_pairs" ->
      """WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
        |h AS (SELECT doc_id, CAST(octet_length(b) AS BIGINT) AS n_bytes,
        |  upper(hex(b)) AS hx FROM p WHERE octet_length(b) >= 1),
        |g AS (SELECT doc_id, n_bytes, list_transform(range(0, 48), i ->
        |  ('0x' || substring(hx, CAST(2 * (1 + i * n_bytes // 48) - 1 AS INT), 2))::BIGINT) AS g
        |  FROM h),
        |s AS (SELECT *, list_reduce(g, (a, x) -> a + x) AS s FROM g),
        |sig AS (SELECT doc_id,
        |  list_reduce(list_transform(range(0, 48), i ->
        |    CASE WHEN 48 * g[CAST(i + 1 AS INT)] > s
        |    THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
        |    (a, x) -> a + x) AS ahash FROM s),
        |blocks AS (SELECT doc_id, o.blk,
        |  (ahash >> CAST(o.blk * 8 AS INT)) & 255 AS bv
        |  FROM sig, unnest(range(0, 6)) AS o(blk)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.bv = b.bv
        |  AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |CAST(bit_count(xor(sa.ahash, sb.ahash)) AS INT) AS hamming
        |FROM cand JOIN sig sa ON cand.id_a = sa.doc_id
        |JOIN sig sb ON cand.id_b = sb.doc_id
        |WHERE bit_count(xor(sa.ahash, sb.ahash)) <= 4
        |ORDER BY id_a, id_b""".stripMargin,

    // Golden-record survivorship over the q68 CC labels: longest text
    // wins, ties to the smallest doc_id; provenance breadth from the
    // same attribute join. The label CTEs are q68's verbatim.
    "q212_golden_record" ->
      ("WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
        """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |und AS (SELECT id_a AS a, id_b AS b FROM pairs
          |UNION ALL SELECT id_b, id_a FROM pairs),
          |reach(a, b) AS (SELECT a, b FROM und
          |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
          |labels AS (SELECT a AS doc_id,
          |  CAST(least(a, min(b)) AS BIGINT) AS cluster_id
          |  FROM reach GROUP BY a),
          |m AS (SELECT l.cluster_id, d.doc_id, d.source, d.lang, d.n_chars
          |  FROM labels l JOIN documents d ON l.doc_id = d.doc_id),
          |agg AS (SELECT cluster_id, count(*) AS n_members,
          |  count(DISTINCT source) AS n_sources,
          |  count(DISTINCT lang) AS n_langs,
          |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
          |  FROM m GROUP BY 1),
          |surv AS (SELECT cluster_id, doc_id AS survivor_id,
          |  source AS survivor_source FROM (SELECT m.*, row_number() OVER
          |    (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
          |    FROM m) WHERE rk = 1)
          |SELECT a.cluster_id, a.n_members, a.n_sources, a.n_langs,
          |a.min_chars, a.max_chars, s.survivor_id, s.survivor_source
          |FROM agg a JOIN surv s ON a.cluster_id = s.cluster_id
          |ORDER BY a.cluster_id""".stripMargin),

    // RBO p=1/2 depth 10: the bm25 CTEs are q138's verbatim; the
    // second ranking drops length normalization. Suffix weights
    // W(m)·C are exact integers under C = lcm(1..10)·2^10 = 2580480;
    // the closing divide is the only float op.
    "q213_rbo_rankings" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
        |       FROM t GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
        |          FROM tf GROUP BY 1),
        |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 8),
        |sa AS (SELECT q.q_id, tf.doc_id,
        |    round(sum(
        |      ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |        * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
        |            + 0.75 * dl.dl * n.n_docs / tot.total))), 6) AS score_r
        |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
        |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
        |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
        |ra AS (SELECT q_id, doc_id, ra FROM (SELECT q_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_r DESC, doc_id) AS INT) AS ra FROM sa)
        |  WHERE ra <= 10),
        |sb AS (SELECT q.q_id, tf.doc_id,
        |    round(sum(ln(n.n_docs / d.df) * tf.tf), 6) AS score_r
        |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term) CROSS JOIN n
        |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
        |rb AS (SELECT q_id, doc_id, rb FROM (SELECT q_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score_r DESC, doc_id) AS INT) AS rb FROM sb)
        |  WHERE rb <= 10),
        |rj AS (SELECT a.q_id, greatest(a.ra, b.rb) AS m
        |  FROM ra a JOIN rb b ON a.q_id = b.q_id AND a.doc_id = b.doc_id),
        |agg AS (SELECT q_id, count(*) AS n_overlap,
        |  sum(CASE m WHEN 1 THEN 1788440 WHEN 2 THEN 498200
        |    WHEN 3 THEN 175640 WHEN 4 THEN 68120 WHEN 5 THEN 27800
        |    WHEN 6 THEN 11672 WHEN 7 THEN 4952 WHEN 8 THEN 2072
        |    WHEN 9 THEN 812 ELSE 252 END) AS sc
        |  FROM rj GROUP BY 1),
        |qs AS (SELECT DISTINCT q_id FROM ra)
        |SELECT qs.q_id, CAST(coalesce(a.n_overlap, 0) AS BIGINT) AS n_overlap,
        |floor(CAST(coalesce(a.sc, 0) AS DOUBLE) / 2580480.0 * 1e6 + 0.5) / 1e6 AS rbo
        |FROM qs LEFT JOIN agg a ON qs.q_id = a.q_id
        |ORDER BY qs.q_id""".stripMargin,

    // CDC compaction: last (sec, event_id) writer wins per user,
    // D tombstones null the value; cents-BIGINT in, dollars out.
    "q214_cdc_compact" ->
      """WITH ops AS (SELECT user_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |  event_id,
        |  CASE event_type WHEN 'signup' THEN 'I' WHEN 'purchase' THEN 'U'
        |    WHEN 'error' THEN 'D' END AS op,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE event_type IN ('signup', 'purchase', 'error')),
        |last AS (SELECT user_id, op AS final_op, cents FROM
        |  (SELECT ops.*, row_number() OVER (PARTITION BY user_id
        |    ORDER BY sec DESC, event_id DESC) AS rk FROM ops)
        |  WHERE rk = 1),
        |counts AS (SELECT user_id, count(*) AS n_ops,
        |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
        |  FROM ops GROUP BY 1)
        |SELECT c.user_id, c.n_ops, c.n_deletes,
        |CASE WHEN l.final_op = 'D' THEN 0 ELSE 1 END AS alive,
        |CASE WHEN l.final_op = 'D' THEN NULL
        |  ELSE CAST(l.cents AS DOUBLE) / 1e2 END AS final_value
        |FROM counts c JOIN last l ON c.user_id = l.user_id
        |ORDER BY c.user_id""".stripMargin,

    // Source-overlap matrix: DISTINCT (source, 60-bit md5 8-gram)
    // sets, |S|²/2 closed matrix with zeros; jaccard/containment
    // floor-quantized to 1e-6 (single divides of exact BIGINTs).
    "q215_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
        |g AS (SELECT DISTINCT source,
        |  ('0x' || substring(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
        |    || ' ' || tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5]
        |    || ' ' || tk[i+6] || ' ' || tk[i+7]), 1, 15))::BIGINT AS h
        |  FROM toks, UNNEST(range(1, len(tk) - 6)) AS u(i)
        |  WHERE len(tk) >= 8),
        |sz AS (SELECT source, count(*) AS n_grams FROM g GROUP BY 1),
        |inter AS (SELECT a.source AS source_a, b.source AS source_b,
        |  count(*) AS n_shared FROM g a JOIN g b
        |  ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
        |pairs AS (SELECT a.source AS source_a, b.source AS source_b,
        |  a.n_grams AS grams_a, b.n_grams AS grams_b
        |  FROM sz a JOIN sz b ON a.source < b.source)
        |SELECT p.source_a, p.source_b, p.grams_a, p.grams_b,
        |CAST(coalesce(i.n_shared, 0) AS BIGINT) AS n_shared,
        |floor(CAST(coalesce(i.n_shared, 0) AS DOUBLE)
        |  / (p.grams_a + p.grams_b - coalesce(i.n_shared, 0)) * 1e6 + 0.5) / 1e6 AS jaccard,
        |floor(CAST(coalesce(i.n_shared, 0) AS DOUBLE)
        |  / least(p.grams_a, p.grams_b) * 1e6 + 0.5) / 1e6 AS containment
        |FROM pairs p LEFT JOIN inter i
        |ON p.source_a = i.source_a AND p.source_b = i.source_b
        |ORDER BY p.source_a, p.source_b""".stripMargin,

    // Churn labels: features from days <= cutoff, label from the
    // holdout; cents-BIGINT money, integer day arithmetic throughout.
    "q216_churn_labels" ->
      """WITH days AS (SELECT user_id,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |cut AS (SELECT max(d) - 14 AS cutoff FROM days),
        |feat AS (SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS spend_cents,
        |  count(DISTINCT d) AS n_active_days,
        |  max(cutoff - d) AS oldest_gap,
        |  min(cutoff - d) AS recency_days
        |  FROM days CROSS JOIN cut WHERE d <= cutoff GROUP BY 1),
        |holdout AS (SELECT DISTINCT user_id FROM days CROSS JOIN cut
        |  WHERE d > cutoff)
        |SELECT f.user_id, f.n_events, f.n_purchases,
        |CAST(f.spend_cents AS DOUBLE) / 1e2 AS spend,
        |f.n_active_days, f.recency_days, f.oldest_gap,
        |CASE WHEN h.user_id IS NULL THEN 1 ELSE 0 END AS churned
        |FROM feat f LEFT JOIN holdout h ON f.user_id = h.user_id
        |ORDER BY f.user_id""".stripMargin,

    // Kaplan–Meier: exact-integer risk sets; the running Σln factor
    // accumulates in identical day order in both engines; exp closes
    // through the floor(·1e4+0.5) display quantizer.
    "q217_km_conversion" ->
      """WITH secs AS (SELECT user_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
        |  event_type FROM events),
        |hz AS (SELECT max(sec) AS end_sec FROM secs),
        |subj AS (SELECT user_id,
        |  CASE WHEN min(CASE WHEN event_type = 'purchase' THEN sec END)
        |    IS NULL THEN 0 ELSE 1 END AS converted,
        |  CAST(floor(CAST(coalesce(min(CASE WHEN event_type = 'purchase'
        |      THEN sec END), max(end_sec)) - min(sec) AS DOUBLE) / 86400.0)
        |    AS BIGINT) AS dur
        |  FROM secs CROSS JOIN hz GROUP BY user_id),
        |tot AS (SELECT count(*) AS n_total FROM subj),
        |byday AS (SELECT dur,
        |  CAST(sum(CASE WHEN converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |  CAST(sum(CASE WHEN converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM subj GROUP BY 1),
        |risk AS (SELECT dur, d, c,
        |  n_total - coalesce(sum(d + c) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM byday CROSS JOIN tot),
        |run AS (SELECT dur, d, c, n_risk,
        |  sum(CASE WHEN d > 0 AND d < n_risk
        |    THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk) ELSE 0.0 END)
        |    OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum
        |  FROM risk)
        |SELECT dur AS t_day, CAST(n_risk AS BIGINT) AS n_risk,
        |d AS n_events, c AS n_censored,
        |CASE WHEN d = n_risk THEN 0.0
        |  ELSE floor(exp(cum) * 1e4 + 0.5) / 1e4 END AS survival
        |FROM run WHERE d > 0 ORDER BY t_day""".stripMargin,

    // Markov stationary: the q116 chain, rates quantized once to
    // ⌊c·10⁹/tot⌋, 8 unrolled integer power-iteration steps — every
    // op BIGINT (// is DuckDB integer division ≡ Spark's div).
    "q218_markov_stationary" -> {
      val steps = (1 to 8).map { t =>
        s"""x$t AS (SELECT e.to_type AS state,
           |  CAST(sum((x.xv * e.q9) // 1000000000) AS BIGINT) AS xv
           |  FROM x${t - 1} x JOIN e2 e ON x.state = e.from_type GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT event_type AS from_type,
         |  lead(event_type) OVER (PARTITION BY user_id
         |    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS to_type
         |  FROM events),
         |c AS (SELECT from_type, to_type, count(*) AS n FROM p
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
         |e AS (SELECT c.from_type, c.to_type,
         |  CAST((c.n * 1000000000) // t.tot AS BIGINT) AS q9
         |  FROM c JOIN tot t ON c.from_type = t.from_type),
         |states AS (SELECT from_type AS state FROM e
         |  UNION SELECT to_type FROM e),
         |e2 AS (SELECT * FROM e UNION ALL
         |  SELECT s.state, s.state, CAST(1000000000 AS BIGINT) FROM states s
         |  WHERE s.state NOT IN (SELECT from_type FROM e)),
         |ns AS (SELECT count(*) AS n_states FROM states),
         |x0 AS (SELECT state,
         |  CAST(1000000000 // n_states AS BIGINT) AS xv
         |  FROM states CROSS JOIN ns),
         |$steps
         |SELECT s.state, CAST(coalesce(x8.xv, 0) AS BIGINT) AS mass_e9,
         |CAST(coalesce(x8.xv, 0) AS DOUBLE) / 1e9 AS stationary
         |FROM states s LEFT JOIN x8 ON s.state = x8.state
         |ORDER BY s.state""".stripMargin
    },

    // MMR: q37's cosine CTEs; 5 unrolled greedy steps, each an
    // argmax window over the shortlist minus the selected set, with
    // the penalty join against the intra-shortlist sim matrix.
    // Weights are 7e-1/3e-1 DOUBLE literals — matching the Spark
    // side's explicit 0.7/0.3 (never a computed 1−λ).
    "q219_mmr_rerank" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
      val steps = (2 to 5).map { t =>
        s"""p$t AS (SELECT q_id, vec_id, rel, score, $t AS pick FROM (
           |  SELECT c.q_id, c.vec_id, c.rel,
           |    c.rel * 7e-1 - mx.pen * 3e-1 AS score,
           |    row_number() OVER (PARTITION BY c.q_id
           |      ORDER BY c.rel * 7e-1 - mx.pen * 3e-1 DESC, c.vec_id) AS rk
           |  FROM cand c
           |  JOIN (SELECT s.q_id, s.id_a AS vec_id, max(s.sim) AS pen
           |        FROM sims s JOIN sel${t - 1} ss
           |        ON s.q_id = ss.q_id AND s.id_b = ss.vec_id
           |        GROUP BY 1, 2) mx
           |  ON c.q_id = mx.q_id AND c.vec_id = mx.vec_id
           |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} ex
           |    WHERE ex.q_id = c.q_id AND ex.vec_id = c.vec_id)
           |) WHERE rk = 1),
           |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 8),
         |sc AS (SELECT q_id, vec_id, v, ${cos("v", "qv")} AS rel
         |  FROM base CROSS JOIN q WHERE vec_id <> q_id),
         |cand AS (SELECT q_id, vec_id, v, rel FROM
         |  (SELECT sc.*, row_number() OVER (PARTITION BY q_id
         |    ORDER BY rel DESC, vec_id) AS rk FROM sc)
         |  WHERE rk <= 20),
         |sims AS (SELECT a.q_id, a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cos("a.v", "b.v")} AS sim
         |  FROM cand a JOIN cand b
         |  ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
         |sel1 AS (SELECT q_id, vec_id, rel, rel * 7e-1 AS score, 1 AS pick FROM
         |  (SELECT q_id, vec_id, rel, row_number() OVER (PARTITION BY q_id
         |    ORDER BY rel * 7e-1 DESC, vec_id) AS rk FROM cand)
         |  WHERE rk = 1),
         |$steps
         |SELECT q_id, pick, vec_id AS neighbor_id,
         |floor(rel * 1e6 + 0.5) / 1e6 AS relevance,
         |floor(score * 1e6 + 0.5) / 1e6 AS mmr_score
         |FROM sel5 ORDER BY q_id, pick""".stripMargin
    },

    // Poisson bootstrap: md5 top-60-bit uniform inverted through
    // Poisson(1) CDF literal thresholds (e-notation DOUBLEs both
    // engines); BIGINT replicate sums; b=41 makes the CI percentile
    // indexes exact (order statistics, no interpolation).
    "q220_poisson_bootstrap" ->
      """WITH rows_ AS (SELECT event_id,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |point AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cs FROM rows_),
        |reps AS (SELECT r.r, cents,
        |  ('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':'
        |    || CAST(r.r AS VARCHAR)), 1, 15))::BIGINT
        |    / 1152921504606846976.0 AS u
        |  FROM rows_, UNNEST(range(0, 41)) AS r(r)),
        |wts AS (SELECT r, cents,
        |  CASE WHEN u < 3.6787944117144233e-1 THEN 0
        |    WHEN u < 7.357588823428847e-1 THEN 1
        |    WHEN u < 9.196986029286058e-1 THEN 2
        |    WHEN u < 9.810118431238463e-1 THEN 3
        |    WHEN u < 9.963401531726563e-1 THEN 4
        |    WHEN u < 9.994058151824183e-1 THEN 5
        |    WHEN u < 9.99916758850712e-1 THEN 6
        |    WHEN u < 9.999897508033253e-1 THEN 7 ELSE 8 END AS w
        |  FROM reps),
        |means AS (SELECT CAST(CAST(sum(w * cents) AS BIGINT) AS DOUBLE)
        |    / CAST(sum(w) AS BIGINT) AS mean_cents
        |  FROM wts GROUP BY r),
        |ci AS (SELECT quantile_cont(mean_cents, 0.025) AS pl,
        |  quantile_cont(mean_cents, 0.975) AS ph FROM means)
        |SELECT n,
        |floor(CAST(cs AS DOUBLE) / n / 1e2 * 1e4 + 0.5) / 1e4 AS mean_value,
        |floor(pl / 1e2 * 1e4 + 0.5) / 1e4 AS boot_lo,
        |floor(ph / 1e2 * 1e4 + 0.5) / 1e4 AS boot_hi
        |FROM ci CROSS JOIN point""".stripMargin,

    // WOE/IV: observation-activity quintiles vs the top-half-holdout-
    // spender median split (both classes exist by construction);
    // quantile_cont ≡ Spark percentile (q206 parity), +0.5 Laplace
    // smoothing keeps ln off zero; formula text shared.
    "q221_woe_audit" ->
      """WITH days AS (SELECT user_id,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |cut AS (SELECT max(d) - 14 AS cutoff FROM days),
        |feat AS (SELECT user_id, count(*) AS n_events
        |  FROM days CROSS JOIN cut WHERE d <= cutoff GROUP BY 1),
        |spend AS (SELECT user_id, CAST(sum(cents) AS BIGINT) AS ho_cents
        |  FROM days CROSS JOIN cut
        |  WHERE d > cutoff AND event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT f.user_id, f.n_events,
        |  coalesce(s.ho_cents, 0) AS ho_cents
        |  FROM feat f LEFT JOIN spend s ON f.user_id = s.user_id),
        |med AS (SELECT quantile_cont(ho_cents, 0.5) AS med FROM j),
        |lab AS (SELECT user_id, n_events,
        |  CASE WHEN ho_cents > med THEN 1 ELSE 0 END AS hi
        |  FROM j CROSS JOIN med),
        |th AS (SELECT quantile_cont(n_events, 0.2) AS t1,
        |  quantile_cont(n_events, 0.4) AS t2,
        |  quantile_cont(n_events, 0.6) AS t3,
        |  quantile_cont(n_events, 0.8) AS t4 FROM lab),
        |tot AS (SELECT
        |  CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hi_tot,
        |  CAST(sum(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT) AS lo_tot
        |  FROM lab),
        |binned AS (SELECT CASE WHEN n_events <= t1 THEN 1
        |    WHEN n_events <= t2 THEN 2 WHEN n_events <= t3 THEN 3
        |    WHEN n_events <= t4 THEN 4 ELSE 5 END AS bin, hi
        |  FROM lab CROSS JOIN th),
        |agg AS (SELECT bin, count(*) AS n_users,
        |  CAST(sum(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |  FROM binned GROUP BY 1)
        |SELECT bin, n_users, n_hi,
        |floor(CAST(n_hi AS DOUBLE) / n_users * 1e4 + 0.5) / 1e4 AS hi_rate,
        |floor(ln(((CAST(n_hi AS DOUBLE) + 0.5) / hi_tot) /
        |  ((CAST(n_users - n_hi AS DOUBLE) + 0.5) / lo_tot)) * 1e4 + 0.5) / 1e4 AS woe,
        |floor((CAST(n_hi AS DOUBLE) / hi_tot -
        |  CAST(n_users - n_hi AS DOUBLE) / lo_tot) *
        |  ln(((CAST(n_hi AS DOUBLE) + 0.5) / hi_tot) /
        |  ((CAST(n_users - n_hi AS DOUBLE) + 0.5) / lo_tot)) * 1e6 + 0.5) / 1e6 AS iv_term
        |FROM agg CROSS JOIN tot ORDER BY bin""".stripMargin,

    // Trending keys: half-over-half smoothed log-lift per props.k,
    // top-N by (lift DESC, k).
    "q222_trending_keys" ->
      """WITH days AS (SELECT
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events),
        |f AS (SELECT d, k FROM days WHERE k IS NOT NULL),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM f),
        |h AS (SELECT k, CASE WHEN d < (d0 + d1 + 1) // 2 THEN 0 ELSE 1 END AS half
        |  FROM f CROSS JOIN span),
        |c AS (SELECT k,
        |  CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |  CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM h GROUP BY 1)
        |SELECT k, c1, c2,
        |floor(ln((CAST(c2 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5)) * 1e4 + 0.5) / 1e4 AS lift
        |FROM c ORDER BY lift DESC, k LIMIT 20""".stripMargin,

    // Cross-correlation: zero-filled daily spine, lag fan-out on the
    // bounded frame, q161's corr formula text per lag.
    "q223_cross_correlation" ->
      """WITH daily AS (SELECT
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events GROUP BY 1),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
        |spine AS (SELECT s.d, coalesce(daily.a, 0) AS a, coalesce(daily.b, 0) AS b
        |  FROM (SELECT unnest(range(d0, d1 + 1)) AS d FROM span) s
        |  LEFT JOIN daily ON s.d = daily.d),
        |pairs AS (SELECT l.lag, x.a, y.b
        |  FROM spine x, UNNEST(range(-7, 8)) AS l(lag)
        |  JOIN spine y ON y.d = x.d + l.lag),
        |g AS (SELECT lag, count(*) AS n_days,
        |  CAST(sum(a) AS BIGINT) AS sx, CAST(sum(b) AS BIGINT) AS sy,
        |  CAST(sum(a * b) AS BIGINT) AS sxy,
        |  CAST(sum(a * a) AS BIGINT) AS sxx,
        |  CAST(sum(b * b) AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, n_days,
        |round((CAST(n_days AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        | nullif(sqrt(CAST(n_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
        |        sqrt(CAST(n_days AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0.0),
        | 4) AS xcorr
        |FROM g ORDER BY lag""".stripMargin,

    // DiD: q205's deterministic arms, q222's midpoint split, four
    // BIGINT cell sums in ONE conditional aggregate; formula text
    // shared.
    "q224_did_estimate" ->
      """WITH days AS (SELECT user_id,
        |  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
        |    date_trunc('day', ts)) / 86400 AS BIGINT) AS d,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM days),
        |t AS (SELECT CAST(user_id % 2 AS INT) AS arm,
        |  CASE WHEN d < (d0 + d1 + 1) // 2 THEN 0 ELSE 1 END AS post, cents
        |  FROM days CROSS JOIN span),
        |g AS (SELECT
        |  CAST(sum(CASE WHEN arm = 1 AND post = 1 THEN cents END) AS BIGINT) AS s_t1,
        |  count(CASE WHEN arm = 1 AND post = 1 THEN 1 END) AS n_t1,
        |  CAST(sum(CASE WHEN arm = 1 AND post = 0 THEN cents END) AS BIGINT) AS s_t0,
        |  count(CASE WHEN arm = 1 AND post = 0 THEN 1 END) AS n_t0,
        |  CAST(sum(CASE WHEN arm = 0 AND post = 1 THEN cents END) AS BIGINT) AS s_c1,
        |  count(CASE WHEN arm = 0 AND post = 1 THEN 1 END) AS n_c1,
        |  CAST(sum(CASE WHEN arm = 0 AND post = 0 THEN cents END) AS BIGINT) AS s_c0,
        |  count(CASE WHEN arm = 0 AND post = 0 THEN 1 END) AS n_c0
        |  FROM t)
        |SELECT n_t0, n_t1, n_c0, n_c1,
        |floor(CAST(s_t0 AS DOUBLE) / n_t0 / 1e2 * 1e4 + 0.5) / 1e4 AS t_pre,
        |floor(CAST(s_t1 AS DOUBLE) / n_t1 / 1e2 * 1e4 + 0.5) / 1e4 AS t_post,
        |floor(CAST(s_c0 AS DOUBLE) / n_c0 / 1e2 * 1e4 + 0.5) / 1e4 AS c_pre,
        |floor(CAST(s_c1 AS DOUBLE) / n_c1 / 1e2 * 1e4 + 0.5) / 1e4 AS c_post,
        |floor(((CAST(s_t1 AS DOUBLE) / n_t1 - CAST(s_t0 AS DOUBLE) / n_t0) -
        |  (CAST(s_c1 AS DOUBLE) / n_c1 - CAST(s_c0 AS DOUBLE) / n_c0)) / 1e2 * 1e4 + 0.5) / 1e4 AS did
        |FROM g""".stripMargin,

    // F2 self-join estimate: exact Σc² vs the ×rate-scaled sum over
    // the h%10=0 md5 key sample — BIGINT to the single error divide.
    "q225_selfjoin_estimate" ->
      """WITH c AS (SELECT l_partkey AS k, count(*) AS c,
        |  ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT count(*) AS n_keys,
        |  CAST(sum(c * c) AS BIGINT) AS exact_f2,
        |  CAST(sum(CASE WHEN h % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN h % 10 = 0 THEN c * c ELSE 0 END) * 10 AS BIGINT) AS est_f2
        |  FROM c)
        |SELECT n_keys, exact_f2, n_sampled, est_f2,
        |floor(abs(CAST(est_f2 AS DOUBLE) - exact_f2) / exact_f2 * 1e4 + 0.5) / 1e4 AS rel_error
        |FROM g""".stripMargin,

    // Packing sweep: the greedy no-split recurrence replayed per
    // shard as a recursive CTE carrying (fill, packs) for all four
    // lengths; used tokens are a plain aggregate. Sentinel fill >
    // every L forces the first doc to open a pack.
    "q226_packing_sweep" -> {
      val ls = Seq(128, 256, 512, 1024)
      val carry = ls.indices.map(i => s"f$i, b$i").mkString(", ")
      val anchor = ls.indices.map(_ => "999999, 0").mkString(", ")
      val stepCols = ls.zipWithIndex.map { case (l, i) =>
        s"""CASE WHEN s.f$i + least(d.n, $l) <= $l
           |  THEN s.f$i + least(d.n, $l) ELSE least(d.n, $l) END,
           |s.b$i + CASE WHEN s.f$i + least(d.n, $l) <= $l THEN 0 ELSE 1 END"""
          .stripMargin
      }.mkString(",\n")
      val usedCols = ls.zipWithIndex.map { case (l, i) =>
        s"CAST(sum(least(n, $l)) AS BIGINT) AS u$i" }.mkString(", ")
      val perL = ls.zipWithIndex.map { case (l, i) =>
        s"""SELECT $l AS seq_len, CAST(sum(fin.b$i) AS BIGINT) AS n_packs,
           |CAST(sum(used.u$i) AS BIGINT) AS used_tokens
           |FROM fin JOIN used ON fin.shard = used.shard"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH RECURSIVE t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         |CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard,
         |CAST(len(string_split(text, ' ')) AS INT) AS n FROM documents),
         |idx AS (SELECT shard, n,
         |  row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS i FROM t),
         |mx AS (SELECT shard, max(i) AS m FROM idx GROUP BY 1),
         |step(shard, i, $carry) AS (
         |  SELECT shard, 0, $anchor FROM mx
         |  UNION ALL
         |  SELECT s.shard, s.i + 1,
         |$stepCols
         |  FROM step s JOIN idx d ON d.shard = s.shard AND d.i = s.i + 1),
         |fin AS (SELECT st.* FROM step st JOIN mx ON st.shard = mx.shard AND st.i = mx.m),
         |used AS (SELECT shard, $usedCols FROM idx GROUP BY 1),
         |allL AS (
         |$perL)
         |SELECT seq_len, n_packs, used_tokens,
         |floor(CAST(n_packs * seq_len - used_tokens AS DOUBLE) /
         |  (n_packs * seq_len) * 1e4 + 0.5) / 1e4 AS waste
         |FROM allL ORDER BY seq_len""".stripMargin
    },

    // Timed funnel: greedy-earliest chaining with the 1 h window
    // evaluated inside the user equi-join; integer-second latencies,
    // quantile_cont ≡ Spark percentile.
    "q227_timed_funnel" ->
      """WITH base AS (SELECT user_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |v AS (SELECT user_id, min(sec) AS t1 FROM base
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT b.user_id, min(v.t1) AS t1, min(b.sec) AS t2
        |  FROM base b JOIN v ON b.user_id = v.user_id
        |  WHERE b.event_type = 'click' AND b.sec > v.t1
        |    AND b.sec <= v.t1 + 3600 GROUP BY 1),
        |p AS (SELECT b.user_id, min(c.t2) AS t2, min(b.sec) AS t3
        |  FROM base b JOIN c ON b.user_id = c.user_id
        |  WHERE b.event_type = 'purchase' AND b.sec > c.t2
        |    AND b.sec <= c.t2 + 3600 GROUP BY 1),
        |r AS (SELECT 1 AS step, (SELECT count(*) FROM v) AS users,
        |    CAST(NULL AS DOUBLE) AS med_step_sec
        |  UNION ALL SELECT 2, (SELECT count(*) FROM c),
        |    (SELECT quantile_cont(t2 - t1, 0.5) FROM c)
        |  UNION ALL SELECT 3, (SELECT count(*) FROM p),
        |    (SELECT quantile_cont(t3 - t2, 0.5) FROM p)),
        |w AS (SELECT step, users, med_step_sec,
        |  lag(users) OVER (ORDER BY step) AS prev FROM r)
        |SELECT step, users, med_step_sec,
        |CASE WHEN prev IS NULL THEN 1.0 WHEN prev = 0 THEN 0.0
        |  ELSE round(users / prev, 4) END AS conv_from_prev
        |FROM w ORDER BY step""".stripMargin,

    // Session entry/exit/bounce: q47's gap sessions on whole-second
    // (sec, event_id) order; first/last via twin row_numbers.
    "q228_session_entries" ->
      """WITH t AS (SELECT user_id, event_id, event_type,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |l AS (SELECT t.*, lag(sec) OVER
        |  (PARTITION BY user_id ORDER BY sec, event_id) AS prev FROM t),
        |s AS (SELECT user_id, event_id, event_type, sec,
        |  CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |g AS (SELECT user_id, event_id, event_type, sec,
        |  sum(ns) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s),
        |n AS (SELECT user_id, sid, event_type,
        |  row_number() OVER (PARTITION BY user_id, sid ORDER BY sec, event_id) AS ra,
        |  row_number() OVER (PARTITION BY user_id, sid ORDER BY sec DESC, event_id DESC) AS rd
        |  FROM g),
        |ps AS (SELECT user_id, sid,
        |  max(CASE WHEN ra = 1 THEN event_type END) AS entry_type,
        |  max(CASE WHEN rd = 1 THEN event_type END) AS exit_type,
        |  count(*) AS n_events
        |  FROM n GROUP BY 1, 2),
        |en AS (SELECT entry_type AS event_type, count(*) AS n_entries,
        |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces
        |  FROM ps GROUP BY 1),
        |ex AS (SELECT exit_type AS event_type, count(*) AS n_exits
        |  FROM ps GROUP BY 1)
        |SELECT coalesce(en.event_type, ex.event_type) AS event_type,
        |CAST(coalesce(n_entries, 0) AS BIGINT) AS n_entries,
        |CAST(coalesce(n_exits, 0) AS BIGINT) AS n_exits,
        |CAST(coalesce(n_bounces, 0) AS BIGINT) AS n_bounces,
        |CASE WHEN coalesce(n_entries, 0) = 0 THEN CAST(NULL AS DOUBLE)
        |  ELSE floor(CAST(n_bounces AS DOUBLE) / n_entries * 1e4 + 0.5) / 1e4 END AS bounce_rate
        |FROM en FULL OUTER JOIN ex ON en.event_type = ex.event_type
        |ORDER BY 1""".stripMargin,

    // Dedup family agreement: the cascade's verified pairs vs the
    // q71 simhash pairs, full-outer on (id_a, id_b) → 1-row summary.
    "q229_dedup_agreement" ->
      ("WITH " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
        s"$simhashCtes,\n" +
        """jp AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
          |blocks AS (SELECT doc_id, 0 AS blk, (simhash >> 0) & 255 AS bv FROM ssig
          |UNION ALL SELECT doc_id, 1, (simhash >> 8) & 255 FROM ssig
          |UNION ALL SELECT doc_id, 2, (simhash >> 16) & 255 FROM ssig
          |UNION ALL SELECT doc_id, 3, (simhash >> 24) & 255 FROM ssig),
          |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM blocks a
          |JOIN blocks b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id),
          |sp AS (SELECT c.id_a, c.id_b
          |FROM scand c JOIN ssig sa ON c.id_a = sa.doc_id
          |JOIN ssig sb ON c.id_b = sb.doc_id
          |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
          |fo AS (SELECT coalesce(jp.id_a, sp.id_a) AS id_a,
          |  CASE WHEN jp.id_a IS NOT NULL THEN 1 ELSE 0 END AS inj,
          |  CASE WHEN sp.id_a IS NOT NULL THEN 1 ELSE 0 END AS ins
          |  FROM jp FULL OUTER JOIN sp
          |  ON jp.id_a = sp.id_a AND jp.id_b = sp.id_b),
          |g AS (SELECT CAST(sum(inj) AS BIGINT) AS n_jaccard,
          |  CAST(sum(ins) AS BIGINT) AS n_simhash,
          |  CAST(sum(CASE WHEN inj = 1 AND ins = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
          |  FROM fo)
          |SELECT n_jaccard, n_simhash, n_both,
          |n_jaccard - n_both AS jaccard_only,
          |n_simhash - n_both AS simhash_only,
          |CASE WHEN least(n_jaccard, n_simhash) = 0 THEN CAST(NULL AS DOUBLE)
          |  ELSE floor(CAST(n_both AS DOUBLE) / least(n_jaccard, n_simhash) * 1e4 + 0.5) / 1e4
          |  END AS overlap_coefficient
          |FROM g""".stripMargin),

    // Latency SLO: q164's per-(user, type) integer-second gap stream,
    // p50/p90/p99 via quantile_cont ≡ Spark percentile.
    "q230_latency_slo" ->
      """WITH s AS (SELECT user_id, event_type, event_id,
        |  date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec
        |  FROM events),
        |g AS (SELECT event_type,
        |  sec - lag(sec) OVER (PARTITION BY user_id, event_type
        |    ORDER BY sec, event_id) AS gap FROM s)
        |SELECT event_type, count(*) AS n_gaps,
        |quantile_cont(gap, 0.5) AS p50,
        |quantile_cont(gap, 0.9) AS p90,
        |quantile_cont(gap, 0.99) AS p99,
        |CAST(max(gap) AS BIGINT) AS max_gap
        |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    // URL curation family: the deterministic synth + canonicalization
    // CTE is shared verbatim by q231/q232/q233 (urlCanonCte below).
    "q231_url_canonicalize" ->
      s"""$urlCanonCte
         |SELECT doc_id, raw_url, canon_url, host,
         |regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain
         |FROM canon ORDER BY doc_id""".stripMargin,

    "q232_per_host_cap" ->
      s"""$urlCanonCte,
         |pages AS (SELECT host, page_key, count(*) AS n_copies
         |  FROM canon GROUP BY 1, 2),
         |ranked AS (SELECT host, n_copies,
         |  row_number() OVER (PARTITION BY host
         |    ORDER BY md5(page_key), page_key) AS rk FROM pages)
         |SELECT host, CAST(sum(n_copies) AS BIGINT) AS n_docs,
         |CAST(count(*) AS BIGINT) AS n_pages,
         |CAST(sum(CASE WHEN rk <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |CAST(sum(n_copies) - count(*) AS BIGINT) AS n_mirror_dropped,
         |CAST(sum(CASE WHEN rk > 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_cap_dropped
         |FROM ranked GROUP BY host ORDER BY host""".stripMargin,

    "q233_host_share" ->
      s"""$urlCanonCte,
         |per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars FROM canon GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS tot_chars FROM per),
         |shares AS (SELECT host, n_docs, n_chars,
         |  CAST((n_docs * 10000) // tot_docs AS BIGINT) AS doc_share_bp,
         |  CAST((n_chars * 10000) // tot_chars AS BIGINT) AS char_share_bp
         |  FROM per CROSS JOIN tot)
         |SELECT host, n_docs, n_chars, doc_share_bp, char_share_bp,
         |CAST(row_number() OVER (ORDER BY n_docs DESC, host) AS INT) AS size_rank,
         |CAST(sum(doc_share_bp) OVER (ORDER BY n_docs DESC, host
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_share_bp,
         |CASE WHEN doc_share_bp >= 800 THEN 'head'
         |  WHEN doc_share_bp >= 400 THEN 'torso' ELSE 'tail' END AS tier
         |FROM shares ORDER BY size_rank""".stripMargin
  )

  /** One blocking family's pair count: the family's OWN oracle SQL
    * wrapped verbatim as a counted subquery — one source of truth, so
    * the q234 audit can never drift from the per-family oracles.
    */
  private def famCount(fam: String, q: String): String =
    s"SELECT '$fam' AS family, CAST(count(*) AS BIGINT) AS n_pairs FROM (${base(q)})"

  /** The capped minhash candidate tier's twin: [[shingleCte]]'s band
    * rows restricted to buckets of ≤ `cap` members before the
    * self-join — `Dedup.capBuckets` in SQL. Counted in the q234 audit
    * so the mitigation's effect is measured next to the uncapped
    * tier it mitigates.
    */
  private def cappedCandSql(cap: Int): String =
    shingleCte + s""",
      |ok AS (SELECT band, mh FROM bands GROUP BY band, mh
      |  HAVING count(*) <= $cap),
      |candc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM (SELECT bands.* FROM bands JOIN ok USING (band, mh)) a
      |  JOIN (SELECT bands.* FROM bands JOIN ok USING (band, mh)) b
      |  ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)
      |SELECT id_a, id_b FROM candc""".stripMargin

  /** q234: per-family pair-set sizes + pairs-per-kdoc density (the
    * scaling-exponent audit's single-SF leg — SCALE.md carries the
    * cross-SF table). Derived AFTER `base` so it composes the
    * already-defined family twins.
    */
  /** The AND-amplified (r = 2) candidate tier's twin
    * (`Dedup.minhashCandidatePairsFine`): band key = concatenation of
    * two salted MinHashes, collisions need agreement on both.
    */
  private val fineCandSql: String = {
    val sigCols = (for (b <- 0 to 3; j <- 0 to 1)
      yield s"min(md5('b${b}_$j:' || shingle)) AS mh_${b}_$j").mkString(", ")
    val bandSel = (0 to 3).map(b =>
      s"SELECT doc_id, $b AS band, mh_${b}_0 || mh_${b}_1 AS mh FROM sigf")
      .mkString("\nUNION ALL ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
       |       FROM toks WHERE len(tk) >= 3),
       |sigf AS (SELECT doc_id, $sigCols FROM sh GROUP BY doc_id),
       |bandsf AS ($bandSel),
       |candf AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandsf a JOIN bandsf b
       |  ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b FROM candf""".stripMargin
  }

  private val scalingAuditSql: String = {
    val fams = Seq(
      "containment"      -> "q140_containment",
      "minhash_cand"     -> "q32_minhash_pairs",
      "minhash_verified" -> "q33_near_dup",
      "prefix_jaccard"   -> "q135_prefix_jaccard",
      "simhash"          -> "q71_simhash_pairs",
      "snm"              -> "q184_snm_neardups",
      "winnow"           -> "q176_winnow_pairs")
    "WITH fams AS (\n" +
      (fams.map { case (f, q) => famCount(f, q) } ++ Seq(
        "SELECT 'minhash_cand_capped' AS family, " +
          s"CAST(count(*) AS BIGINT) AS n_pairs FROM (${cappedCandSql(50)})",
        "SELECT 'minhash_cand_r2' AS family, " +
          s"CAST(count(*) AS BIGINT) AS n_pairs FROM ($fineCandSql)",
        "SELECT 'video_frames' AS family, " +
          s"CAST(count(*) AS BIGINT) AS n_pairs FROM ($videoNearDupsSql)"))
        .mkString("\nUNION ALL\n") +
      "\n),\nnd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)\n" +
      "SELECT family, n_docs, n_pairs,\n" +
      "floor(CAST(n_pairs AS DOUBLE) / n_docs * 1e6 + 0.5) / 1e3 AS pairs_per_kdoc\n" +
      "FROM fams, nd ORDER BY family"
  }

  /** q235: the multi-iteration BPE trainer unrolled — vocab_i chains
    * as plain CTEs over the previous iteration's top merge (vocab_i =
    * vocab_{i-1} ∪ merge_i), each seg_i a maximal-munch segmentation
    * of the distinct-word frame under vocab_i. m_i picks the top pair
    * from seg_{i-1}; f_i reports corpus fertility under seg_i —
    * exactly the two scalars the Spark trainer collects per iteration.
    *
    * TWO load-bearing DuckDB-1.0 engineering choices (each measured):
    *
    *  - NO recursive CTEs and NO correlated munch subquery: a CTE
    *    referenced from inside a recursive arm (or a correlated
    *    subquery) is re-evaluated per iteration/row, and here every
    *    re-evaluation would drag the whole vocab_i ← m_i ← seg_{i-1}
    *    chain with it — measured 511 s at sf0.01 for the recursive
    *    form vs 0.16 s for this one. Instead the munch is a JOIN
    *    (bm_i = best vocab match per (word, pos) via one window
    *    rank), and the walk is unrolled into `hops` non-recursive
    *    single-step CTEs (hops ≥ max word length — 8 in every
    *    testdata SF, 12 used; a longer word would drop from done_i
    *    and hash-mismatch loudly, never silently pass);
    *  - the shared/multi-referenced CTEs are AS MATERIALIZED:
    *    DuckDB 1.0 inlines every CTE reference by default, which
    *    re-reads the parquet per reference (measured: "Too many open
    *    files" at 4 segmentations × 12 hops). MATERIALIZED is safe
    *    here precisely BECAUSE nothing is recursive — combining
    *    MATERIALIZED with WITH RECURSIVE mis-evaluates this chain on
    *    1.0 (measured: wrong merges), which is why the recursion had
    *    to go first.
    */
  private def bpeTrainSql(iters: Int, hops: Int = 12): String = {
    val vocabList = graft.functions.SubwordGenerator.DefaultVocab
      .map(v => s"'$v'").mkString(", ")
    def segCtes(i: Int): String = {
      val bm =
        s"""bm$i AS MATERIALIZED (SELECT w, pos, v FROM (
           |  SELECT p.w, p.pos, v.v,
           |    row_number() OVER (PARTITION BY p.w, p.pos
           |      ORDER BY len(v.v) DESC, v.v) AS rk
           |  FROM posn p JOIN vocab$i v
           |    ON substr(p.w, CAST(p.pos AS INT), len(v.v)) = v.v
           |) WHERE rk = 1)""".stripMargin
      val h0 = s"h${i}_0 AS (SELECT w, CAST(1 AS BIGINT) AS pos, " +
        "0 AS step, CAST(NULL AS VARCHAR) AS tok FROM wc)"
      val steps = (1 to hops).map { j =>
        s"""h${i}_$j AS (
           |  SELECT s.w, s.pos + coalesce(len(b.v), 1) AS pos,
           |    s.step + 1 AS step,
           |    coalesce(b.v, substr(s.w, CAST(s.pos AS INT), 1)) AS tok
           |  FROM h${i}_${j - 1} s
           |  LEFT JOIN bm$i b ON b.w = s.w AND b.pos = s.pos
           |  WHERE s.pos <= len(s.w))""".stripMargin
      }
      val union = (0 to hops).map(j => s"SELECT * FROM h${i}_$j")
        .mkString("\nUNION ALL ")
      (Seq(bm, h0) ++ steps :+ s"seg$i AS MATERIALIZED ($union)")
        .mkString(",\n")
    }
    def iterCtes(i: Int) =
      s"""pc$i AS (SELECT s1.tok AS t1, s2.tok AS t2,
         |  CAST(sum(mult) AS BIGINT) AS cnt
         |  FROM seg${i - 1} s1 JOIN seg${i - 1} s2
         |    ON s1.w = s2.w AND s2.step = s1.step + 1
         |  JOIN wc ON wc.w = s1.w
         |  WHERE s1.step >= 1 GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT t1, t2, t1 || t2 AS merged, cnt
         |  FROM pc$i ORDER BY cnt DESC, t1, t2 LIMIT 1),
         |vocab$i(v) AS MATERIALIZED (SELECT v FROM vocab${i - 1}
         |  UNION ALL SELECT merged FROM m$i),
         |${segCtes(i)},
         |f$i AS (SELECT floor(CAST(sum(d.step * wc.mult) AS DOUBLE) /
         |  (SELECT n FROM nw) * 1e4 + 0.5) / 1e4 AS fertility
         |  FROM (SELECT w, step FROM seg$i WHERE pos = len(w) + 1) d
         |  JOIN wc ON wc.w = d.w)""".stripMargin
    val header =
      s"""WITH vocab0(v) AS MATERIALIZED (SELECT unnest([$vocabList])),
         |words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |wc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS mult
         |  FROM words WHERE len(w) > 0 GROUP BY w),
         |nw AS (SELECT CAST(sum(mult) AS DOUBLE) AS n FROM wc),
         |posn AS MATERIALIZED (SELECT w, unnest(range(1, len(w) + 1)) AS pos
         |  FROM wc),
         |${segCtes(0)},
         |${(1 to iters).map(iterCtes).mkString(",\n")}""".stripMargin
    val rowsSel = (1 to iters).map { i =>
      s"SELECT $i AS iter, t1, t2, merged, cnt AS pair_count, " +
        s"(SELECT fertility FROM f$i) AS fertility FROM m$i"
    }.mkString("\nUNION ALL\n")
    header + s"\nSELECT * FROM (\n$rowsSel\n) ORDER BY iter"
  }

  val all: Map[String, String] =
    base +
      ("q234_scaling_audit" -> scalingAuditSql) +
      ("q235_bpe_train" -> bpeTrainSql(3)) +
      ("q236_url_funnel" -> urlFunnelSql) +
      ("q237_retrieval_quality" -> retrievalQualitySql) +
      ("q238_contam_provenance" -> contamProvenanceSql) +
      ("q239_video_neardups" -> videoNearDupsSql) +
      ("q240_dup_quality" -> dupQualitySql) +
      ("q241_mann_whitney" -> mannWhitneySql) +
      ("q242_host_quality" -> hostQualitySql) +
      ("q243_centroid_drift" -> centroidDriftSql) +
      ("q244_ann_quality" -> annQualitySql) +
      ("q245_cluster_cohesion" -> clusterCohesionSql) +
      ("q246_arm_agreement" -> armAgreementSql) +
      ("q247_data_budget" -> dataBudgetSql) +
      ("q248_ahash_hot_blocks" -> ahashHotBlocksSql) +
      ("q249_neardup_sources" -> nearDupSourcesSql) +
      ("q250_budget_epochs" -> budgetEpochsSql) +
      ("q251_guarded_clean" -> guardedCleanSql) +
      ("q252_guard_delta" -> guardDeltaSql) +
      ("q253_capped_budget" -> cappedBudgetSql) +
      ("q254_cap_sweep" -> capSweepSql) +
      ("q255_decontam_queue" -> decontamQueueSql) +
      ("q256_capped_epochs" -> cappedEpochsSql) +
      ("q257_decontam_sources" -> decontamSourcesSql) +
      ("q258_leak_typology" -> leakTypologySql) +
      ("q259_mixture_drift" -> mixtureDriftSql) +
      ("q260_leak_drop_ids" -> leakDropIdsSql) +
      ("q261_cluster_safe_split" -> clusterSafeSplitSql) +
      ("q262_threshold_sweep" -> thresholdSweepSql) +
      ("q263_semantic_sweep" -> semanticSweepSql) +
      // q264: the union cascade is bit-identical to a full rebuild, so
      // the batch-attributable pairs are exactly q33's verified pairs
      // with ≥1 endpoint in the batch (id ≡ 7 mod 10 on either side)
      ("q264_cascade_append" ->
        (shingleCte +
          """,
            |sets AS (SELECT doc_id, list_distinct(list(shingle)) AS sset FROM sh GROUP BY doc_id),
            |j AS (SELECT id_a, id_b,
            |round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
            |(len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))), 4) AS jaccard
            |FROM cand JOIN sets a ON cand.id_a = a.doc_id JOIN sets b ON cand.id_b = b.doc_id)
            |SELECT id_a, id_b, jaccard FROM j
            |WHERE jaccard >= 0.2 AND (id_a % 10 = 7 OR id_b % 10 = 7)
            |ORDER BY id_a, id_b""".stripMargin)) +
      // q265: same argument on the embedding side — the appended semcc
      // frame equals a full rebuild, so the batch-attributable pairs
      // are q40's verified pairs with ≥1 endpoint ≡ 7 (mod 10)
      ("q265_semcc_append" ->
        s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
           |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           |list_dot_product(a.v, c.v) /
           |(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
           |FROM b a JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id)
           |SELECT id_a, id_b, round(cos, 6) AS cos_sim FROM p
           |WHERE cos >= 0.3 AND (id_a % 10 = 7 OR id_b % 10 = 7)
           |ORDER BY id_a, id_b""".stripMargin) +
      // q266: the appended PQ index's batch codes — the codebooks
      // train on YESTERDAY's slice only (the q192 kmeans recurrence
      // over vec_id % 10 <> 7), the batch assigns against those FROZEN
      // books with the same round-6 distance kernel and floor-
      // quantized dist2; the Spark side must land exactly these rows
      // as its code delta
      ("q266_pq_append" ->
        s"""WITH ${kmeansCtes(4, 3, pqSubSql(0, 2, "WHERE vec_id % 10 <> 7"), "s0")},
           |${kmeansCtes(4, 3, pqSubSql(1, 2, "WHERE vec_id % 10 <> 7"), "s1")},
           |b0 AS (${pqSubSql(0, 2, "WHERE vec_id % 10 = 7")}),
           |b1 AS (${pqSubSql(1, 2, "WHERE vec_id % 10 = 7")}),
           |f0 AS (SELECT vec_id,
           |  CAST(list_position(d, list_aggregate(d, 'min')) AS INT) AS code,
           |  list_aggregate(d, 'min') AS dist_r
           |  FROM (SELECT vec_id, list_transform(c.cs, cc ->
           |    CASE WHEN len(v) = 0 THEN 0.0 ELSE
           |    round(list_reduce(list_transform(v, (el, j) ->
           |      (el - cc[j]) * (el - cc[j])), (x, y) -> x + y), 6) END) AS d
           |    FROM b0 CROSS JOIN s0c3 c)),
           |f1 AS (SELECT vec_id,
           |  CAST(list_position(d, list_aggregate(d, 'min')) AS INT) AS code,
           |  list_aggregate(d, 'min') AS dist_r
           |  FROM (SELECT vec_id, list_transform(c.cs, cc ->
           |    CASE WHEN len(v) = 0 THEN 0.0 ELSE
           |    round(list_reduce(list_transform(v, (el, j) ->
           |      (el - cc[j]) * (el - cc[j])), (x, y) -> x + y), 6) END) AS d
           |    FROM b1 CROSS JOIN s1c3 c))
           |SELECT vec_id, 0 AS sub, code,
           |  floor(dist_r * 10000 + 0.5) / 10000 AS dist2 FROM f0
           |UNION ALL
           |SELECT vec_id, 1, code, floor(dist_r * 10000 + 0.5) / 10000 FROM f1
           |ORDER BY vec_id, sub""".stripMargin) +
      // q267: the appended simhash frame equals a full rebuild, so the
      // batch-attributable pairs are exactly q71's verified pairs with
      // ≥1 endpoint ≡ 7 (mod 10)
      ("q267_simhash_append" ->
        (s"WITH $simhashCtes,\n" +
          """blocks AS (SELECT doc_id, 0 AS blk, (simhash >> 0) & 255 AS bv FROM ssig
            |UNION ALL SELECT doc_id, 1, (simhash >> 8) & 255 FROM ssig
            |UNION ALL SELECT doc_id, 2, (simhash >> 16) & 255 FROM ssig
            |UNION ALL SELECT doc_id, 3, (simhash >> 24) & 255 FROM ssig),
            |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM blocks a
            |JOIN blocks b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id)
            |SELECT c.id_a, c.id_b,
            |CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
            |FROM scand c JOIN ssig sa ON c.id_a = sa.doc_id
            |JOIN ssig sb ON c.id_b = sb.doc_id
            |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
            |AND (c.id_a % 10 = 7 OR c.id_b % 10 = 7)
            |ORDER BY id_a, id_b""".stripMargin)) +
      // q268: compaction is content-identity, so every tier count off
      // the compacted address must equal a from-raw-text re-derivation:
      // cand = the LSH candidate tier, pairs = jaccard-verified at 0.2,
      // labels = one row per pair endpoint (CC relabels, never drops),
      // sh3 = distinct (doc_id, 3-gram), shsets = distinct 60-bit
      // hashed shingles (md5 prefix, the Spark conv(...,16,10) twin)
      ("q268_compact_tiers" ->
        (shingleCte +
          ",\n" + jaccardVerify +
          """,
            |vp AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
            |dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
            |hs AS (SELECT DISTINCT doc_id,
            |  CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h FROM sh),
            |lnodes AS (SELECT id_a AS d FROM vp UNION SELECT id_b FROM vp)
            |SELECT 'cand' AS tier, CAST(count(*) AS BIGINT) AS n_rows FROM cand
            |UNION ALL SELECT 'labels', CAST(count(*) AS BIGINT) FROM lnodes
            |UNION ALL SELECT 'pairs', CAST(count(*) AS BIGINT) FROM vp
            |UNION ALL SELECT 'sh3', CAST(count(*) AS BIGINT) FROM dsh
            |UNION ALL SELECT 'shsets', CAST(count(*) AS BIGINT) FROM hs
            |ORDER BY tier""".stripMargin)) +
      // q269: the q268 argument over the OTHER four families — each
      // compacted tier's row count re-derived from the raw tables:
      // simhash sig = one signature per document, pairs = the q71
      // block-collision + Hamming verify; semcc pairs = the q40 bucket
      // join at cos >= 0.3, labels = one row per pair endpoint; pq
      // codes = m rows per vector (m=2), books = m*k (8); ivf index =
      // one row per vector
      ("q269_compact_families" ->
        (s"WITH $simhashCtes,\n" +
          """blocks AS (SELECT doc_id, 0 AS blk, (simhash >> 0) & 255 AS bv FROM ssig
            |UNION ALL SELECT doc_id, 1, (simhash >> 8) & 255 FROM ssig
            |UNION ALL SELECT doc_id, 2, (simhash >> 16) & 255 FROM ssig
            |UNION ALL SELECT doc_id, 3, (simhash >> 24) & 255 FROM ssig),
            |scand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM blocks a
            |JOIN blocks b ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id),
            |sp AS (SELECT c.id_a, c.id_b FROM scand c
            |JOIN ssig sa ON c.id_a = sa.doc_id JOIN ssig sb ON c.id_b = sb.doc_id
            |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3),
            |""".stripMargin +
          s"""eb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |bk AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM eb),
             |cp AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
             |list_dot_product(a.v, c.v) /
             |(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
             |FROM bk a JOIN bk c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id),
             |sp2 AS (SELECT id_a, id_b FROM cp WHERE cos >= 0.3),
             |sno AS (SELECT id_a AS x FROM sp2 UNION SELECT id_b FROM sp2)
             |SELECT 'ivf' AS family, 'index' AS tier, CAST(count(*) AS BIGINT) AS n_rows FROM embeddings
             |UNION ALL SELECT 'pq', 'books', CAST(8 AS BIGINT)
             |UNION ALL SELECT 'pq', 'codes', CAST(2 * count(*) AS BIGINT) FROM embeddings
             |UNION ALL SELECT 'semcc', 'labels', CAST(count(*) AS BIGINT) FROM sno
             |UNION ALL SELECT 'semcc', 'pairs', CAST(count(*) AS BIGINT) FROM sp2
             |UNION ALL SELECT 'simhash', 'pairs', CAST(count(*) AS BIGINT) FROM sp
             |UNION ALL SELECT 'simhash', 'sig', CAST(count(*) AS BIGINT) FROM ssig
             |ORDER BY family, tier""".stripMargin)) +
      // q270: the appended token-tf frame equals a rebuild (per-doc
      // purity), so the batch's landed rows are exactly a re-tokenize
      // of the batch slice — q130's split semantics verbatim
      ("q270_tokentf_append" ->
        """SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          |      FROM documents WHERE doc_id % 10 = 7)
          |GROUP BY doc_id, term
          |ORDER BY doc_id, term""".stripMargin)

  /** q250: q247's plan CTEs verbatim, joined back per document; full
    * epochs = epochs_q4 div 10⁴, the fractional epoch admits docs
    * whose md5 32-bit prefix clears the integer threshold
    * floor(rem/src · 2³²) — one double op chain, identical IEEE steps
    * in both engines; epochs unroll via range() and roll up per
    * (source, epoch).
    */
  private def budgetEpochsSql: String =
    """WITH a AS (SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u32
      |  FROM documents),
      |b AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens FROM a GROUP BY 1),
      |c AS (SELECT source, src_tokens,
      |  CAST(floor(sqrt(CAST(src_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS r
      |  FROM b),
      |t AS (SELECT CAST(sum(r) AS BIGINT) AS rt,
      |  CAST(sum(src_tokens) * 2 AS BIGINT) AS bt FROM c),
      |p AS (SELECT source, src_tokens,
      |  CAST((bt * ((r * 10000) // rt)) // 10000 AS BIGINT) AS alloc_tokens
      |  FROM c, t),
      |q AS (SELECT source, src_tokens, alloc_tokens,
      |  CAST(((alloc_tokens * 10000) // src_tokens) // 10000 AS INT) AS eps_full
      |  FROM p),
      |j AS (SELECT a.doc_id, a.source, a.n_tok, a.u32, q.eps_full,
      |  CAST(floor(CAST(alloc_tokens - eps_full * src_tokens AS DOUBLE)
      |    / CAST(src_tokens AS DOUBLE) * 4294967296.0) AS BIGINT) AS thresh
      |  FROM a JOIN q USING (source)),
      |e AS (SELECT doc_id, source, n_tok,
      |  eps_full + (CASE WHEN u32 < thresh THEN 1 ELSE 0 END) AS n_ep FROM j),
      |x AS (SELECT source, n_tok, CAST(unnest(range(1, n_ep + 1)) AS INT) AS epoch
      |  FROM e WHERE n_ep > 0)
      |SELECT source, epoch, CAST(count(*) AS BIGINT) AS n_docs,
      |CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q251: q245's recursive CC labels + edge-density CTEs, closed as a
    * per-document verdict — guarded members of low-density clusters
    * survive, dense clusters keep only their root.
    */
  private def guardedCleanSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |e AS (SELECT l.cluster_id FROM pairs p JOIN lab l ON p.id_a = l.doc_id),
        |ea AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM e GROUP BY 1),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM lab GROUP BY 1),
        |dens AS (SELECT cluster_id,
        |  CAST((n_edges * 2 * 10000) // (n_docs * (n_docs - 1)) AS BIGINT) AS density_bp
        |  FROM sz JOIN ea USING (cluster_id)),
        |v AS (SELECT lab.doc_id, lab.cluster_id,
        |  CASE WHEN dens.density_bp < 5000 THEN 'keep_guarded'
        |       WHEN lab.doc_id = lab.cluster_id THEN 'keep_canonical'
        |       ELSE 'drop_dup' END AS action
        |  FROM lab JOIN dens USING (cluster_id))
        |SELECT d.doc_id, v.cluster_id, coalesce(v.action, 'keep_unique') AS action
        |FROM documents d LEFT JOIN v USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin

  /** q252: q251's verdict CTEs verbatim, rolled up per source —
    * drops vs guard-spared non-root members, integer-bp share with a
    * zero-denominator CASE.
    */
  private def guardDeltaSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |e AS (SELECT l.cluster_id FROM pairs p JOIN lab l ON p.id_a = l.doc_id),
        |ea AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges
        |  FROM e GROUP BY 1),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM lab GROUP BY 1),
        |dens AS (SELECT cluster_id,
        |  CAST((n_edges * 2 * 10000) // (n_docs * (n_docs - 1)) AS BIGINT) AS density_bp
        |  FROM sz JOIN ea USING (cluster_id)),
        |v AS (SELECT lab.doc_id, lab.cluster_id,
        |  CASE WHEN dens.density_bp < 5000 THEN 'keep_guarded'
        |       WHEN lab.doc_id = lab.cluster_id THEN 'keep_canonical'
        |       ELSE 'drop_dup' END AS action
        |  FROM lab JOIN dens USING (cluster_id)),
        |g AS (SELECT d.doc_id, d.source, v.cluster_id,
        |  coalesce(v.action, 'keep_unique') AS action
        |  FROM documents d LEFT JOIN v USING (doc_id)),
        |r AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN action = 'drop_dup' THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN action = 'keep_guarded' AND doc_id <> cluster_id
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spared
        |  FROM g GROUP BY 1)
        |SELECT source, n_docs, n_dropped, n_spared,
        |CAST(CASE WHEN n_dropped + n_spared = 0 THEN 0
        |  ELSE (n_spared * 10000) // (n_dropped + n_spared) END AS BIGINT)
        |  AS spared_share_bp
        |FROM r ORDER BY source""".stripMargin

  /** q249: q240's recursive CC labels joined to sources, then q102's
    * matrix SQL over (cluster, source) counts.
    */
  private def nearDupSourcesSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |m AS (SELECT l.cluster_id, d.source
        |  FROM lab l JOIN documents d ON l.doc_id = d.doc_id),
        |ps AS (SELECT cluster_id, source, CAST(count(*) AS BIGINT) AS n
        |  FROM m GROUP BY 1, 2)
        |SELECT a.source AS source_a, b.source AS source_b,
        |CAST(count(*) AS BIGINT) AS shared_clusters
        |FROM ps a JOIN ps b ON a.cluster_id = b.cluster_id
        |WHERE a.source < b.source OR (a.source = b.source AND a.n >= 2)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q248: q211's signature + block CTEs verbatim, then one grouped
    * count per (block, value), integer pair counts and bp shares
    * (nullif-guarded total), TakeOrdered top-20.
    */
  private def ahashHotBlocksSql: String =
    """WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
      |h AS (SELECT doc_id, CAST(octet_length(b) AS BIGINT) AS n_bytes,
      |  upper(hex(b)) AS hx FROM p WHERE octet_length(b) >= 1),
      |g AS (SELECT doc_id, n_bytes, list_transform(range(0, 48), i ->
      |  ('0x' || substring(hx, CAST(2 * (1 + i * n_bytes // 48) - 1 AS INT), 2))::BIGINT) AS g
      |  FROM h),
      |s AS (SELECT *, list_reduce(g, (a, x) -> a + x) AS s FROM g),
      |sig AS (SELECT doc_id,
      |  list_reduce(list_transform(range(0, 48), i ->
      |    CASE WHEN 48 * g[CAST(i + 1 AS INT)] > s
      |    THEN (1::BIGINT << CAST(i AS INT)) ELSE 0::BIGINT END),
      |    (a, x) -> a + x) AS ahash FROM s),
      |blocks AS (SELECT doc_id, CAST(o.blk AS INT) AS blk,
      |  (ahash >> CAST(o.blk * 8 AS INT)) & 255 AS bv
      |  FROM sig, unnest(range(0, 6)) AS o(blk)),
      |posts AS (SELECT blk, bv, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM blocks GROUP BY 1, 2),
      |c AS (SELECT blk, bv, n_docs,
      |  CAST((n_docs * (n_docs - 1)) // 2 AS BIGINT) AS n_cand FROM posts),
      |t AS (SELECT CAST(sum(n_cand) AS BIGINT) AS tot FROM c)
      |SELECT blk, bv, n_docs, n_cand,
      |CAST((n_cand * 10000) // nullif(tot, 0) AS BIGINT) AS cand_share_bp
      |FROM c, t ORDER BY n_cand DESC, blk, bv LIMIT 20""".stripMargin

  /** q247: one grouped token aggregate, √n quantized to a BIGINT at
    * 10⁶ (IEEE sqrt is correctly rounded in both engines — the q86
    * argument), then pure integer arithmetic for weight / allocation /
    * epoch count.
    */
  private def dataBudgetSql: String =
    """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |b AS (SELECT source, n_docs, n_tokens,
      |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS r
      |  FROM a),
      |t AS (SELECT CAST(sum(r) AS BIGINT) AS rt,
      |  CAST(sum(n_tokens) * 2 AS BIGINT) AS bt FROM b),
      |c AS (SELECT source, n_docs, n_tokens,
      |  CAST((r * 10000) // rt AS BIGINT) AS weight_bp,
      |  CAST((bt * ((r * 10000) // rt)) // 10000 AS BIGINT) AS alloc_tokens
      |  FROM b, t)
      |SELECT source, n_docs, n_tokens, weight_bp, alloc_tokens,
      |CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) AS epochs_q4,
      |CAST((alloc_tokens * 10000) // n_tokens AS BIGINT) > 40000 AS over_epoched
      |FROM c ORDER BY source""".stripMargin

  /** q253: q247's plan CTEs verbatim, then cap → excess → one
    * pro-rata redistribution round → re-cap → spill, all BIGINT `//`
    * arithmetic (zero-denominator CASEs on the redistribution).
    */
  private def cappedBudgetSql: String =
    """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |b AS (SELECT source, n_docs, n_tokens,
      |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS r
      |  FROM a),
      |t AS (SELECT CAST(sum(r) AS BIGINT) AS rt,
      |  CAST(sum(n_tokens) * 2 AS BIGINT) AS bt FROM b),
      |c AS (SELECT source, n_tokens,
      |  CAST((r * 10000) // rt AS BIGINT) AS weight_bp,
      |  CAST((bt * ((r * 10000) // rt)) // 10000 AS BIGINT) AS alloc_tokens
      |  FROM b, t),
      |d AS (SELECT source, n_tokens, weight_bp, alloc_tokens,
      |  CAST((20000 * n_tokens) // 10000 AS BIGINT) AS cap_tokens FROM c),
      |e AS (SELECT *,
      |  CASE WHEN alloc_tokens > cap_tokens THEN cap_tokens ELSE alloc_tokens END AS alloc_capped,
      |  CASE WHEN alloc_tokens > cap_tokens THEN alloc_tokens - cap_tokens ELSE 0 END AS excess,
      |  CASE WHEN alloc_tokens > cap_tokens THEN 0 ELSE weight_bp END AS uw
      |  FROM d),
      |s AS (SELECT CAST(sum(excess) AS BIGINT) AS et,
      |  CAST(sum(uw) AS BIGINT) AS uwt FROM e),
      |f AS (SELECT e.*,
      |  CAST(CASE WHEN uw > 0 AND uwt > 0 THEN (et * uw) // uwt ELSE 0 END AS BIGINT) AS redistributed
      |  FROM e, s),
      |g AS (SELECT *,
      |  CASE WHEN alloc_capped + redistributed > cap_tokens THEN cap_tokens
      |       ELSE alloc_capped + redistributed END AS alloc_final
      |  FROM f)
      |SELECT source, n_tokens, weight_bp, alloc_tokens,
      |alloc_tokens > cap_tokens AS was_capped,
      |CAST(alloc_final AS BIGINT) AS alloc_final,
      |CAST((alloc_final * 10000) // n_tokens AS BIGINT) AS epochs_final_q4,
      |CAST(alloc_capped + redistributed - alloc_final AS BIGINT) AS spilled_tokens
      |FROM g ORDER BY source""".stripMargin

  /** q254: q253's CTEs swept over the 1–4-epoch cap grid — the caps
    * VALUES list cross-joined onto the #sources plan (constant ×
    * vocabulary), excess/uncapped-weight totals grouped PER CAP, then
    * one rollup row per cap. Same BIGINT `//` arithmetic as q253.
    */
  private def capSweepSql: String =
    """WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |b AS (SELECT source, n_docs, n_tokens,
      |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS r
      |  FROM a),
      |t AS (SELECT CAST(sum(r) AS BIGINT) AS rt,
      |  CAST(sum(n_tokens) * 2 AS BIGINT) AS bt FROM b),
      |c AS (SELECT source, n_tokens,
      |  CAST((r * 10000) // rt AS BIGINT) AS weight_bp,
      |  CAST((bt * ((r * 10000) // rt)) // 10000 AS BIGINT) AS alloc_tokens
      |  FROM b, t),
      |caps AS (SELECT CAST(capq4 AS BIGINT) AS cap_q4
      |  FROM (VALUES (10000), (20000), (30000), (40000)) v(capq4)),
      |d AS (SELECT c.*, cap_q4,
      |  CAST((cap_q4 * n_tokens) // 10000 AS BIGINT) AS cap_tokens
      |  FROM c CROSS JOIN caps),
      |e AS (SELECT *,
      |  CASE WHEN alloc_tokens > cap_tokens THEN cap_tokens ELSE alloc_tokens END AS alloc_capped,
      |  CASE WHEN alloc_tokens > cap_tokens THEN alloc_tokens - cap_tokens ELSE 0 END AS excess,
      |  CASE WHEN alloc_tokens > cap_tokens THEN 0 ELSE weight_bp END AS uw
      |  FROM d),
      |s AS (SELECT cap_q4, CAST(sum(excess) AS BIGINT) AS et,
      |  CAST(sum(uw) AS BIGINT) AS uwt FROM e GROUP BY 1),
      |f AS (SELECT e.*,
      |  CAST(CASE WHEN uw > 0 AND uwt > 0 THEN (et * uw) // uwt ELSE 0 END AS BIGINT) AS redistributed
      |  FROM e JOIN s USING (cap_q4)),
      |g AS (SELECT *,
      |  CASE WHEN alloc_capped + redistributed > cap_tokens THEN cap_tokens
      |       ELSE alloc_capped + redistributed END AS alloc_final
      |  FROM f)
      |SELECT cap_q4,
      |CAST(count(*) FILTER (WHERE alloc_tokens > cap_tokens) AS BIGINT) AS n_capped,
      |CAST(sum(alloc_capped + redistributed - alloc_final) AS BIGINT) AS spilled_tokens,
      |CAST(sum(alloc_final) AS BIGINT) AS achieved_tokens,
      |CAST(max((alloc_final * 10000) // n_tokens) AS BIGINT) AS max_epochs_q4,
      |CAST((sum(alloc_final) * 10000) // (sum(n_tokens) * 2) AS BIGINT) AS achieved_bp
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin

  /** q255: corpus × eval-panel cosine (the panel is the modulus-23
    * stand-in), per-pair q6 BIGINT quantization, argmax per corpus
    * vector (ties on eval_id), global top-50 cut (ties on vec_id) —
    * the identical `list_dot_product` chain as the ANN oracles.
    */
  private def decontamQueueSql: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
      |ev AS (SELECT vec_id AS eval_id, v AS ev FROM base WHERE vec_id % 23 = 0),
      |c AS (SELECT vec_id, label, v FROM base WHERE vec_id % 23 <> 0),
      |s AS (SELECT c.vec_id, c.label, ev.eval_id,
      |  CAST(floor(list_dot_product(c.v, ev.ev) /
      |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.ev, ev.ev)))
      |    * 1e6 + 0.5) AS BIGINT) AS c6
      |  FROM c CROSS JOIN ev),
      |p AS (SELECT vec_id, label, eval_id, c6,
      |  row_number() OVER (PARTITION BY vec_id ORDER BY c6 DESC, eval_id) AS r
      |  FROM s),
      |t AS (SELECT vec_id, label, eval_id, c6,
      |  row_number() OVER (ORDER BY c6 DESC, vec_id) AS rk
      |  FROM p WHERE r = 1)
      |SELECT CAST(rk AS INT) AS rk, vec_id, label, eval_id,
      |CAST(c6 AS DOUBLE) / 1e6 AS max_cos
      |FROM t WHERE rk <= 50 ORDER BY rk""".stripMargin

  /** q256: q250's expansion CTEs with q253's capped-allocation chain
    * substituted for the raw plan — `alloc_final` feeds the full-epoch
    * count and the fractional threshold. Same BIGINT grid, same
    * md5-u32 draw, same rollup.
    */
  private def cappedEpochsSql: String =
    """WITH a AS (SELECT doc_id, source,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u32
      |  FROM documents),
      |b AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tokens FROM a GROUP BY 1),
      |c AS (SELECT source, src_tokens,
      |  CAST(floor(sqrt(CAST(src_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS r
      |  FROM b),
      |t AS (SELECT CAST(sum(r) AS BIGINT) AS rt,
      |  CAST(sum(src_tokens) * 2 AS BIGINT) AS bt FROM c),
      |p AS (SELECT source, src_tokens,
      |  CAST((r * 10000) // rt AS BIGINT) AS weight_bp,
      |  CAST((bt * ((r * 10000) // rt)) // 10000 AS BIGINT) AS alloc_tokens
      |  FROM c, t),
      |d AS (SELECT *,
      |  CAST((20000 * src_tokens) // 10000 AS BIGINT) AS cap_tokens FROM p),
      |e0 AS (SELECT *,
      |  CASE WHEN alloc_tokens > cap_tokens THEN cap_tokens ELSE alloc_tokens END AS alloc_capped,
      |  CASE WHEN alloc_tokens > cap_tokens THEN alloc_tokens - cap_tokens ELSE 0 END AS excess,
      |  CASE WHEN alloc_tokens > cap_tokens THEN 0 ELSE weight_bp END AS uw
      |  FROM d),
      |s0 AS (SELECT CAST(sum(excess) AS BIGINT) AS et,
      |  CAST(sum(uw) AS BIGINT) AS uwt FROM e0),
      |f AS (SELECT e0.*,
      |  CAST(CASE WHEN uw > 0 AND uwt > 0 THEN (et * uw) // uwt ELSE 0 END AS BIGINT) AS redistributed
      |  FROM e0, s0),
      |g AS (SELECT source, src_tokens,
      |  CAST(CASE WHEN alloc_capped + redistributed > cap_tokens THEN cap_tokens
      |       ELSE alloc_capped + redistributed END AS BIGINT) AS alloc_fin
      |  FROM f),
      |q AS (SELECT source, src_tokens, alloc_fin,
      |  CAST(((alloc_fin * 10000) // src_tokens) // 10000 AS INT) AS eps_full
      |  FROM g),
      |j AS (SELECT a.doc_id, a.source, a.n_tok, a.u32, q.eps_full,
      |  CAST(floor(CAST(alloc_fin - eps_full * src_tokens AS DOUBLE)
      |    / CAST(src_tokens AS DOUBLE) * 4294967296.0) AS BIGINT) AS thresh
      |  FROM a JOIN q USING (source)),
      |e AS (SELECT doc_id, source, n_tok,
      |  eps_full + (CASE WHEN u32 < thresh THEN 1 ELSE 0 END) AS n_ep FROM j),
      |x AS (SELECT source, n_tok, CAST(unnest(range(1, n_ep + 1)) AS INT) AS epoch
      |  FROM e WHERE n_ep > 0)
      |SELECT source, epoch, CAST(count(*) AS BIGINT) AS n_docs,
      |CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q257: q255's pair CTEs, per-doc GROUPED max instead of the
    * argmax window, joined to documents on the doc_id ↔ vec_id
    * convention, rolled up per source — the mean is the q245
    * floor(Σ/n + ½) idiom over exact q6 BIGINTs.
    */
  private def decontamSourcesSql: String =
    """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ev AS (SELECT vec_id AS eval_id, v AS ev FROM base WHERE vec_id % 23 = 0),
      |c AS (SELECT vec_id, v FROM base WHERE vec_id % 23 <> 0),
      |s AS (SELECT c.vec_id,
      |  CAST(floor(list_dot_product(c.v, ev.ev) /
      |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.ev, ev.ev)))
      |    * 1e6 + 0.5) AS BIGINT) AS c6
      |  FROM c CROSS JOIN ev),
      |m AS (SELECT vec_id, CAST(max(c6) AS BIGINT) AS mc6 FROM s GROUP BY 1),
      |d AS (SELECT m.mc6, doc.source FROM m
      |  JOIN documents doc ON doc.doc_id = m.vec_id)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |CAST(max(mc6) AS DOUBLE) / 1e6 AS max_cos,
      |floor(CAST(sum(mc6) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_cos
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** q259: the q90 snapshot pair (old = id % 11 ≠ 3; new = id % 11 ≠ 0
    * with the % 13 ' (rev2)' revision — which ADDS a token, so the
    * text CASE must precede the split), one grouped token sum per
    * snapshot, full outer on source, shares in exact bp, signed
    * drift.
    */
  private def mixtureDriftSql: String =
    """WITH o AS (SELECT source,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS old_tokens
      |  FROM documents WHERE doc_id % 11 <> 3 GROUP BY 1),
      |n AS (SELECT source,
      |  CAST(sum(len(string_split(
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' (rev2)' ELSE text END,
      |    ' '))) AS BIGINT) AS new_tokens
      |  FROM documents WHERE doc_id % 11 <> 0 GROUP BY 1),
      |j AS (SELECT coalesce(o.source, n.source) AS source,
      |  coalesce(o.old_tokens, 0) AS old_tokens,
      |  coalesce(n.new_tokens, 0) AS new_tokens
      |  FROM o FULL OUTER JOIN n ON o.source = n.source),
      |t AS (SELECT CAST(sum(old_tokens) AS BIGINT) AS ot,
      |  CAST(sum(new_tokens) AS BIGINT) AS nt FROM j),
      |s AS (SELECT source, old_tokens, new_tokens,
      |  CAST(CASE WHEN ot > 0 THEN (old_tokens * 10000) // ot ELSE 0 END AS BIGINT) AS share_old_bp,
      |  CAST(CASE WHEN nt > 0 THEN (new_tokens * 10000) // nt ELSE 0 END AS BIGINT) AS share_new_bp
      |  FROM j, t)
      |SELECT source, old_tokens, new_tokens, share_old_bp, share_new_bp,
      |CAST(share_new_bp - share_old_bp AS BIGINT) AS drift_bp
      |FROM s ORDER BY source""".stripMargin

  /** q258: the q58 shingle chain (eval vocab = doc_id % 23) and the
    * q255 pair chain over the SAME panel, reconciled per doc — queue
    * membership via the rank cut, n-gram flag via any shared 3-gram —
    * then the 4-quadrant rollup with the exact-integer mean idioms.
    */
  private def leakTypologySql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      |       FROM toks WHERE len(tk) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |evv AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 23 = 0),
      |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 23 <> 0),
      |o AS (SELECT doc_id, count(*) AS n_overlap FROM tr
      |      WHERE shingle IN (SELECT shingle FROM evv) GROUP BY doc_id),
      |sct AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
      |ng AS (SELECT sct.doc_id,
      |  CAST((coalesce(o.n_overlap, 0) * 10000) // sct.n_shingles AS BIGINT) AS contam_bp
      |  FROM sct LEFT JOIN o ON sct.doc_id = o.doc_id),
      |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ev AS (SELECT vec_id AS eval_id, v AS evec FROM base WHERE vec_id % 23 = 0),
      |c AS (SELECT vec_id, v FROM base WHERE vec_id % 23 <> 0),
      |s AS (SELECT c.vec_id,
      |  CAST(floor(list_dot_product(c.v, ev.evec) /
      |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.evec, ev.evec)))
      |    * 1e6 + 0.5) AS BIGINT) AS c6
      |  FROM c CROSS JOIN ev),
      |m AS (SELECT vec_id, CAST(max(c6) AS BIGINT) AS mc6 FROM s GROUP BY 1),
      |qd AS (SELECT vec_id, TRUE AS in_queue FROM m
      |  ORDER BY mc6 DESC, vec_id LIMIT 50),
      |r AS (SELECT m.mc6,
      |  coalesce(qd.in_queue, FALSE) AS inq,
      |  coalesce(ng.contam_bp, 0) AS cbp
      |  FROM m LEFT JOIN qd ON m.vec_id = qd.vec_id
      |  LEFT JOIN ng ON m.vec_id = ng.doc_id),
      |lab AS (SELECT mc6, cbp,
      |  CASE WHEN inq AND cbp > 0 THEN 'verbatim'
      |       WHEN inq THEN 'paraphrase'
      |       WHEN cbp > 0 THEN 'boilerplate'
      |       ELSE 'clean' END AS quadrant
      |  FROM r)
      |SELECT quadrant, CAST(count(*) AS BIGINT) AS n_docs,
      |floor(CAST(sum(mc6) AS DOUBLE) / count(*) + 0.5) / 1e6 AS mean_cos,
      |CAST(floor(CAST(sum(cbp) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mean_contam_bp
      |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin

  /** q260: q258's CTEs with vec_id kept through the quadrant label,
    * filtered to the drop policy (verbatim always, paraphrase at the
    * default dropParaphrase = true) — boilerplate/clean never appear.
    */
  private def leakDropIdsSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      |       FROM toks WHERE len(tk) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |evv AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 23 = 0),
      |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 23 <> 0),
      |o AS (SELECT doc_id, count(*) AS n_overlap FROM tr
      |      WHERE shingle IN (SELECT shingle FROM evv) GROUP BY doc_id),
      |sct AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
      |ng AS (SELECT sct.doc_id,
      |  CAST((coalesce(o.n_overlap, 0) * 10000) // sct.n_shingles AS BIGINT) AS contam_bp
      |  FROM sct LEFT JOIN o ON sct.doc_id = o.doc_id),
      |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ev AS (SELECT vec_id AS eval_id, v AS evec FROM base WHERE vec_id % 23 = 0),
      |c AS (SELECT vec_id, v FROM base WHERE vec_id % 23 <> 0),
      |s AS (SELECT c.vec_id,
      |  CAST(floor(list_dot_product(c.v, ev.evec) /
      |    (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.evec, ev.evec)))
      |    * 1e6 + 0.5) AS BIGINT) AS c6
      |  FROM c CROSS JOIN ev),
      |m AS (SELECT vec_id, CAST(max(c6) AS BIGINT) AS mc6 FROM s GROUP BY 1),
      |qd AS (SELECT vec_id, TRUE AS in_queue FROM m
      |  ORDER BY mc6 DESC, vec_id LIMIT 50),
      |r AS (SELECT m.vec_id,
      |  coalesce(qd.in_queue, FALSE) AS inq,
      |  coalesce(ng.contam_bp, 0) AS cbp
      |  FROM m LEFT JOIN qd ON m.vec_id = qd.vec_id
      |  LEFT JOIN ng ON m.vec_id = ng.doc_id),
      |lab AS (SELECT vec_id,
      |  CASE WHEN inq AND cbp > 0 THEN 'verbatim'
      |       WHEN inq THEN 'paraphrase'
      |       WHEN cbp > 0 THEN 'boilerplate'
      |       ELSE 'clean' END AS quadrant
      |  FROM r)
      |SELECT vec_id, quadrant FROM lab
      |WHERE quadrant IN ('verbatim', 'paraphrase')
      |ORDER BY vec_id""".stripMargin

  /** q261: q68's recursive CC labels, coalesced onto every document
    * (own id when unclustered), then the q57 md5 draw keyed on the
    * CLUSTER id — near-dup members provably share a split.
    */
  private def clusterSafeSplitSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
        |  FROM reach GROUP BY a),
        |alldocs AS (SELECT d.doc_id,
        |  coalesce(lab.cluster_id, d.doc_id) AS cluster_id
        |  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id),
        |b AS (SELECT doc_id, cluster_id,
        |  CAST(CAST(concat('0x', substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS INT) AS bucket
        |  FROM alldocs)
        |SELECT doc_id, cluster_id,
        |CASE WHEN bucket < 10 THEN 'test' ELSE 'train' END AS split
        |FROM b ORDER BY doc_id""".stripMargin

  /** q263: q40's bucketed-cosine pair CTEs quantized to q6 BIGINT,
    * exploded over the τ grid — the q262 sweep shape on the embedding
    * side; survivors = vectors minus distinct higher-id losers.
    */
  private def semanticSweepSql: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
       |p AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |list_dot_product(a.v, c.v) /
       |(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
       |FROM b a JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id),
       |q AS (SELECT id_b,
       |  CAST(floor(round(cos, 6) * 1e6 + 0.5) AS BIGINT) AS c6
       |  FROM p WHERE cos >= 0.3),
       |grid AS (SELECT CAST(unnest([300000, 400000, 500000, 600000, 700000, 800000, 900000]) AS BIGINT) AS t6),
       |sw AS (SELECT t6, CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(count(DISTINCT id_b) AS BIGINT) AS n_dropped
       |  FROM q JOIN grid ON q.c6 >= grid.t6 GROUP BY t6),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM embeddings)
       |SELECT CAST(grid.t6 AS DOUBLE) / 1e6 AS threshold,
       |coalesce(sw.n_pairs, 0) AS n_pairs,
       |coalesce(sw.n_dropped, 0) AS n_dropped,
       |CAST(tot.n_vecs - coalesce(sw.n_dropped, 0) AS BIGINT) AS n_survivors
       |FROM grid LEFT JOIN sw USING (t6), tot
       |ORDER BY threshold""".stripMargin

  /** q262: the verified-pair CTEs quantized to q4 BIGINT, exploded
    * over the threshold grid; dropped = distinct higher ids (the
    * pairwise loser convention), survivors = corpus minus dropped.
    */
  private def thresholdSweepSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """p AS (SELECT id_b,
        |  CAST(floor(jaccard * 1e4 + 0.5) AS BIGINT) AS j4
        |  FROM j WHERE jaccard >= 0.2),
        |grid AS (SELECT CAST(unnest([2000, 3000, 4000, 5000, 6000, 7000, 8000, 9000]) AS BIGINT) AS t4),
        |sw AS (SELECT t4, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT id_b) AS BIGINT) AS n_dropped
        |  FROM p JOIN grid ON p.j4 >= grid.t4 GROUP BY t4),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
        |SELECT CAST(grid.t4 AS DOUBLE) / 1e4 AS threshold,
        |coalesce(sw.n_pairs, 0) AS n_pairs,
        |coalesce(sw.n_dropped, 0) AS n_dropped,
        |CAST(tot.n_docs - coalesce(sw.n_dropped, 0) AS BIGINT) AS n_survivors
        |FROM grid LEFT JOIN sw USING (t4), tot
        |ORDER BY threshold""".stripMargin

  /** q245: q240's recursive CC labels + the verified pair list,
    * rolled up per cluster — density as exact integer basis points,
    * per-edge jaccard q4-BIGINT-quantized before the mean's single
    * divide.
    */
  private def clusterCohesionSql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |e AS (SELECT l.cluster_id,
        |  CAST(floor(p.jaccard * 1e4 + 0.5) AS BIGINT) AS j4
        |  FROM pairs p JOIN lab l ON p.id_a = l.doc_id),
        |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM lab GROUP BY 1),
        |ea AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges,
        |  CAST(sum(j4) AS BIGINT) AS sum_j4,
        |  CAST(min(j4) AS BIGINT) AS min_j4 FROM e GROUP BY 1)
        |SELECT sz.cluster_id, sz.n_docs, ea.n_edges,
        |CAST((ea.n_edges * 2 * 10000) // (sz.n_docs * (sz.n_docs - 1)) AS BIGINT) AS density_bp,
        |CAST(ea.min_j4 AS DOUBLE) / 1e4 AS min_jaccard,
        |floor(CAST(ea.sum_j4 AS DOUBLE) / ea.n_edges + 0.5) / 1e4 AS mean_jaccard
        |FROM sz JOIN ea USING (cluster_id)
        |ORDER BY sz.cluster_id""".stripMargin

  /** q246: the three arm rankings (q237's BM25 + hybrid CTEs, q213's
    * tf·idf CTE) closed pairwise with q213's suffix-weight RBO text —
    * per pair, qs anchors on the pair's FIRST arm, mirroring the
    * Spark rboClose contract.
    */
  private def armAgreementSql: String = {
    val wSum = """sum(CASE m WHEN 1 THEN 1788440 WHEN 2 THEN 498200
      |    WHEN 3 THEN 175640 WHEN 4 THEN 68120 WHEN 5 THEN 27800
      |    WHEN 6 THEN 11672 WHEN 7 THEN 4952 WHEN 8 THEN 2072
      |    WHEN 9 THEN 812 ELSE 252 END)""".stripMargin
    def pairBlock(i: Int, tag: String, a: String, b: String): String =
      s"""rj$i AS (SELECT a.q_id, greatest(a.rk, b.rk) AS m
         |  FROM $a a JOIN $b b ON a.q_id = b.q_id AND a.doc_id = b.doc_id),
         |ag$i AS (SELECT q_id, count(*) AS n_overlap, $wSum AS sc
         |  FROM rj$i GROUP BY 1),
         |qs$i AS (SELECT DISTINCT q_id FROM $a),
         |r$i AS (SELECT '$tag' AS pair, qs$i.q_id,
         |  CAST(coalesce(ag$i.n_overlap, 0) AS BIGINT) AS n_overlap,
         |  floor(CAST(coalesce(ag$i.sc, 0) AS DOUBLE) / 2580480.0 * 1e6 + 0.5) / 1e6 AS rbo
         |  FROM qs$i LEFT JOIN ag$i ON qs$i.q_id = ag$i.q_id)""".stripMargin
    s"""WITH t AS (SELECT doc_id,
       |  unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
       |       FROM t GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
       |          FROM tf GROUP BY 1),
       |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 8),
       |scored AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(
       |      ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
       |        * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
       |            + 0.75 * dl.dl * n.n_docs / tot.total))), 6) AS score_r
       |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
       |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
       |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
       |armb AS (SELECT q_id, doc_id, rk FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_r DESC, doc_id) AS INT) AS rk FROM scored)
       |  WHERE rk <= 10),
       |lex AS (SELECT q_id, doc_id, rk_lex FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_r DESC, doc_id) AS INT) AS rk_lex FROM scored)
       |  WHERE rk_lex <= 20),
       |sp AS (SELECT doc_id,
       |    CAST(concat('0x', substring(md5('d:' || term), 1, 8)) AS BIGINT)
       |      % 64 AS j,
       |    CASE WHEN CAST(concat('0x', substring(md5('s:' || term), 1, 8))
       |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s FROM t),
       |sv AS (SELECT doc_id, j, CAST(sum(s) AS BIGINT) AS v
       |       FROM sp GROUP BY 1, 2 HAVING sum(s) <> 0),
       |nrm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS nrm
       |        FROM sv GROUP BY 1),
       |qv AS (SELECT doc_id AS q_id, j, v AS vq FROM sv WHERE doc_id < 8),
       |dotp AS (SELECT qv.q_id, sv.doc_id,
       |    CAST(sum(sv.v * qv.vq) AS BIGINT) AS dot
       |  FROM sv JOIN qv USING (j) WHERE sv.doc_id <> qv.q_id
       |  GROUP BY 1, 2),
       |dsc AS (SELECT dp.q_id, dp.doc_id,
       |    round(CAST(dp.dot AS DOUBLE)
       |      / sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6)
       |      AS cos_r
       |  FROM dotp dp JOIN nrm n1 ON n1.doc_id = dp.doc_id
       |  JOIN nrm n2 ON n2.doc_id = dp.q_id),
       |dense AS (SELECT q_id, doc_id, rk_dense FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_r DESC, doc_id) AS INT) AS rk_dense FROM dsc)
       |  WHERE rk_dense <= 20),
       |fused AS (SELECT coalesce(l.q_id, de.q_id) AS q_id,
       |    coalesce(l.doc_id, de.doc_id) AS doc_id,
       |    round(coalesce(CAST(1 AS DOUBLE) / (60 + l.rk_lex), 0)
       |      + coalesce(CAST(1 AS DOUBLE) / (60 + de.rk_dense), 0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN dense de
       |    ON l.q_id = de.q_id AND l.doc_id = de.doc_id),
       |armh AS (SELECT q_id, doc_id, rk FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id) AS INT) AS rk FROM fused)
       |  WHERE rk <= 10),
       |sb AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(ln(n.n_docs / d.df) * tf.tf), 6) AS score_r
       |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term) CROSS JOIN n
       |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
       |armt AS (SELECT q_id, doc_id, rk FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_r DESC, doc_id) AS INT) AS rk FROM sb)
       |  WHERE rk <= 10),
       |${pairBlock(1, "bm25~hybrid", "armb", "armh")},
       |${pairBlock(2, "bm25~tfidf", "armb", "armt")},
       |${pairBlock(3, "tfidf~hybrid", "armt", "armh")}
       |SELECT pair, q_id, n_overlap, rbo FROM (
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
       |ORDER BY pair, q_id""".stripMargin
  }

  /** q244: the q39/q74 ANN probe CTEs at depth 10 (single-probe +
    * Hamming-1 multi-probe over the deterministic sign-LSH buckets),
    * scored against the exact brute-force ranking with rank-graded
    * relevance (true top-3 → rel 2, top-10 → rel 1), closed with the
    * q237 integer-ladder metric text (BIGINT DCG, closed-form IDCG,
    * one divide per float).
    */
  private def annQualitySql: String = {
    def cumw(e: String): String =
      s"""CASE least($e, 10) WHEN 0 THEN 0
         |  WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929754
         |  WHEN 3 THEN 2130929754 WHEN 4 THEN 2561606312
         |  WHEN 5 THEN 2948459119 WHEN 6 THEN 3304666306
         |  WHEN 7 THEN 3637999639 WHEN 8 THEN 3953464516
         |  WHEN 9 THEN 4254494512 ELSE 4543559338 END""".stripMargin
    val wCase = """CASE a.rk WHEN 1 THEN 1000000000 WHEN 2 THEN 630929754
      |  WHEN 3 THEN 500000000 WHEN 4 THEN 430676558 WHEN 5 THEN 386852807
      |  WHEN 6 THEN 356207187 WHEN 7 THEN 333333333 WHEN 8 THEN 315464877
      |  WHEN 9 THEN 301029996 ELSE 289064826 END""".stripMargin
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, CAST(${bucketTerms("v")} AS INT) AS bucket_id FROM base),
       |q AS (SELECT vec_id AS q_id, v AS qv, bucket_id FROM b WHERE vec_id < 8),
       |s1 AS (SELECT q.q_id, b.vec_id,
       |list_dot_product(b.v, q.qv) /
       |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
       |FROM b JOIN q ON b.bucket_id = q.bucket_id WHERE b.vec_id <> q.q_id),
       |a1 AS (SELECT q_id, vec_id AS doc_id, rk FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS INT) AS rk FROM s1) WHERE rk <= 10),
       |probes AS (SELECT q_id, qv, bucket_id FROM q
       |UNION ALL SELECT q_id, qv, CAST(xor(bucket_id, (1 << i)) AS INT) AS bucket_id
       |FROM q, range(0, 8) t(i)),
       |s2 AS (SELECT p.q_id, b.vec_id,
       |list_dot_product(b.v, p.qv) /
       |(sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS cos
       |FROM b JOIN probes p ON b.bucket_id = p.bucket_id WHERE b.vec_id <> p.q_id),
       |a2 AS (SELECT q_id, vec_id AS doc_id, rk FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS INT) AS rk FROM s2) WHERE rk <= 10),
       |ex AS (SELECT q.q_id, ba.vec_id,
       |list_dot_product(ba.v, q.qv) /
       |(sqrt(list_dot_product(ba.v, ba.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
       |FROM base ba, q WHERE ba.vec_id <> q.q_id),
       |rel AS (SELECT q_id, vec_id AS doc_id,
       |  CASE WHEN rk <= 3 THEN 2 ELSE 1 END AS rel FROM (
       |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS rk FROM ex) WHERE rk <= 10),
       |arms AS (SELECT 'ivf' AS arm, q_id, doc_id, rk FROM a1
       |UNION ALL SELECT 'multiprobe', q_id, doc_id, rk FROM a2),
       |am AS (SELECT a.q_id, a.arm,
       |    CAST(sum((CASE r.rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)
       |      * CAST(($wCase) AS BIGINT)) AS BIGINT) AS dcg_s,
       |    min(CASE WHEN r.rel >= 1 THEN a.rk END) AS first_rel_rank
       |  FROM arms a LEFT JOIN rel r
       |    ON a.q_id = r.q_id AND a.doc_id = r.doc_id
       |  GROUP BY 1, 2),
       |ic AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel,
       |    CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
       |  FROM rel GROUP BY 1),
       |icg AS (SELECT q_id, n_rel,
       |    CAST(3 * CAST((${cumw("n2")}) AS BIGINT)
       |      + ((${cumw("n_rel")}) - (${cumw("n2")})) AS BIGINT) AS idcg_s
       |  FROM ic),
       |panel AS (SELECT vec_id AS q_id, arm FROM embeddings
       |  CROSS JOIN (SELECT 'ivf' AS arm UNION ALL SELECT 'multiprobe')
       |  WHERE vec_id < 8)
       |SELECT p.q_id, p.arm,
       |CAST(coalesce(i.n_rel, 0) AS BIGINT) AS n_rel,
       |CAST(coalesce(a.first_rel_rank, 0) AS INT) AS first_rel_rank,
       |CASE WHEN a.first_rel_rank IS NULL THEN 0.0
       |  ELSE floor(1e6 / a.first_rel_rank + 0.5) / 1e6 END AS rr,
       |CAST(coalesce(a.dcg_s, 0) AS BIGINT) AS dcg_s,
       |CASE WHEN coalesce(i.idcg_s, 0) = 0 THEN 0.0
       |  ELSE floor(CAST(coalesce(a.dcg_s, 0) AS DOUBLE) / CAST(i.idcg_s AS DOUBLE)
       |    * 1e6 + 0.5) / 1e6 END AS ndcg
       |FROM panel p LEFT JOIN am a ON p.q_id = a.q_id AND p.arm = a.arm
       |LEFT JOIN icg i ON p.q_id = i.q_id
       |ORDER BY p.q_id, p.arm""".stripMargin
  }

  /** q243: q6-quantized component sums → floored integer centroid
    * means → exact BIGINT dots/norms, one closing divide. The v[i]
    * indexing is the q87 idiom (64-dim embeddings).
    */
  private def centroidDriftSql: String =
    """WITH base AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |q AS (SELECT label, i,
      |  CAST(floor(v[i] * 1e6 + 0.5) AS BIGINT) AS qv
      |  FROM base, range(1, 65) t(i)),
      |m AS (SELECT label, i,
      |  CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS m,
      |  CAST(count(*) AS BIGINT) AS n
      |  FROM q GROUP BY label, i),
      |nn AS (SELECT label, max(n) AS n_vecs,
      |  CAST(sum(m * m) AS BIGINT) AS nrm FROM m GROUP BY label),
      |d AS (SELECT a.label AS label_a, b.label AS label_b,
      |  CAST(sum(a.m * b.m) AS BIGINT) AS dot
      |  FROM m a JOIN m b ON a.i = b.i AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT d.label_a, d.label_b, na.n_vecs AS n_a, nb.n_vecs AS n_b,
      |round(CAST(dot AS DOUBLE) /
      |nullif(sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)), 0.0), 6)
      |  AS cos_centroid
      |FROM d JOIN nn na ON na.label = d.label_a
      |JOIN nn nb ON nb.label = d.label_b
      |ORDER BY d.label_a, d.label_b""".stripMargin

  /** q242: the shared URL canonicalization CTE + q240's quantized
    * quality/gate fragments, rolled up per host.
    */
  private def hostQualitySql: String =
    s"""$urlCanonCte,
       |qs AS (SELECT doc_id,
       |  CAST(floor(round((least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) +
       |    least(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk) * 10.0, 1.0)) / 2.0,
       |    4) * 1e4 + 0.5) AS BIGINT) AS q4
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)),
       |gt AS (SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
       |  round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS mean_token_len,
       |  round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
       |  CASE WHEN len(tk) < 3 THEN 0.0 ELSE
       |  round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
       |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2), 4) END AS rep_ratio
       |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)),
       |gok AS (SELECT doc_id, 1 AS g FROM gt
       |  WHERE n_tokens >= 10 AND n_tokens <= 1000
       |  AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
       |  AND stopword_ratio >= 0.01 AND rep_ratio <= 0.5)
       |SELECT c.host, CAST(count(*) AS BIGINT) AS n_docs,
       |floor(CAST(sum(q.q4) AS DOUBLE) / count(*) + 0.5) / 1e4 AS mean_quality,
       |CAST(sum(coalesce(g.g, 0)) AS BIGINT) AS n_gated,
       |floor(CAST(sum(coalesce(g.g, 0)) AS DOUBLE) * 1e4 / count(*) + 0.5) / 1e4 AS gate_rate
       |FROM canon c JOIN qs q ON c.doc_id = q.doc_id
       |LEFT JOIN gok g ON c.doc_id = g.doc_id
       |GROUP BY c.host ORDER BY c.host""".stripMargin

  /** q241: the q117 bin grid, 2U/tie as exact BIGINTs, identical
    * closing formula text for the two float outputs.
    */
  private def mannWhitneySql: String =
    """WITH c AS (SELECT CAST(floor(value / 0.5) AS BIGINT) AS bin,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb
      |  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
      |w AS (SELECT bin, na, nb,
      |  coalesce(CAST(sum(nb) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cnb,
      |  na + nb AS t FROM c),
      |a AS (SELECT CAST(sum(na) AS BIGINT) AS n_a,
      |  CAST(sum(nb) AS BIGINT) AS n_b,
      |  CAST(count(*) AS BIGINT) AS n_bins,
      |  CAST(sum(na * (2 * cnb + nb)) AS BIGINT) AS u2_a,
      |  CAST(sum(t * t * t - t) AS BIGINT) AS tie3 FROM w)
      |SELECT n_a, n_b, n_bins, u2_a,
      |floor(CAST(u2_a AS DOUBLE) / nullif(2.0 * n_a * n_b, 0.0) * 1e6 + 0.5) / 1e6 AS p_superiority,
      |round((CAST(u2_a AS DOUBLE) / 2 - CAST(n_a AS DOUBLE) * n_b / 2) /
      |nullif(sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0 *
      |((n_a + n_b + 1) - CAST(tie3 AS DOUBLE) /
      |nullif(CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1), 0.0))), 0.0), 4) AS z
      |FROM a""".stripMargin

  /** q240: q68's recursive CC labels + q27's quality terms + q106's
    * gate predicate, rolled up per duplication band. Quality
    * quantizes to a q4 BIGINT before the band sum; the means close
    * with one divide each.
    */
  private def dupQualitySql: String =
    "WITH RECURSIVE " + shingleCascade("documents") + ",\n" + jaccardVerify + ",\n" +
      """pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.2),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM und
        |  UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |csz AS (SELECT cluster_id, count(*) AS sz FROM lab GROUP BY 1),
        |dsz AS (SELECT lab.doc_id, csz.sz FROM lab JOIN csz USING (cluster_id)),
        |qs AS (SELECT doc_id,
        |  CAST(floor(round((least(CAST(len(tk) AS DOUBLE) / 50.0, 1.0) +
        |    least(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk) * 10.0, 1.0)) / 2.0,
        |    4) * 1e4 + 0.5) AS BIGINT) AS q4 FROM toks),
        |gt AS (SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
        |  round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS mean_token_len,
        |  round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
        |  CASE WHEN len(tk) < 3 THEN 0.0 ELSE
        |  round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2), 4) END AS rep_ratio
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)),
        |gok AS (SELECT doc_id, 1 AS g FROM gt
        |  WHERE n_tokens >= 10 AND n_tokens <= 1000
        |  AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
        |  AND stopword_ratio >= 0.01 AND rep_ratio <= 0.5),
        |rows0 AS (SELECT d.doc_id,
        |  CASE WHEN s.sz IS NULL THEN 'unique'
        |    WHEN s.sz <= 4 THEN 'small' ELSE 'large' END AS band,
        |  q.q4, coalesce(g.g, 0) AS g
        |  FROM documents d LEFT JOIN dsz s ON d.doc_id = s.doc_id
        |  JOIN qs q ON d.doc_id = q.doc_id
        |  LEFT JOIN gok g ON d.doc_id = g.doc_id)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
        |floor(CAST(sum(q4) AS DOUBLE) / count(*) + 0.5) / 1e4 AS mean_quality,
        |CAST(sum(g) AS BIGINT) AS n_gated,
        |floor(CAST(sum(g) AS DOUBLE) * 1e4 / count(*) + 0.5) / 1e4 AS gate_rate
        |FROM rows0 GROUP BY band ORDER BY band""".stripMargin

  /** q239: the q36 frame arithmetic (hex-string indexing, the q210
    * idiom) + a row_number-capped posting self-join (the q139 cap
    * twin). Frame fingerprints hash the UPPERCASE hex of the frame
    * bytes on both engines.
    */
  private def videoNearDupsSql: String =
    """WITH p AS (SELECT doc_id, upper(hex(encode(text))) AS hx,
      |  octet_length(encode(text)) AS nb FROM documents),
      |f0 AS (SELECT doc_id, hx, nb,
      |  unnest(range(0, greatest(CAST(floor(nb / 32) AS INT), 1))) AS fi
      |  FROM p),
      |fr AS (SELECT doc_id,
      |  md5(substring(hx, CAST(2 * fi * 32 + 1 AS INT), 64)) AS fp
      |  FROM f0 WHERE fi % 4 = 0),
      |dd AS (SELECT DISTINCT doc_id, fp FROM fr),
      |cap AS (SELECT doc_id, fp FROM (SELECT doc_id, fp,
      |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM dd)
      |  WHERE rn <= 64)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |CAST(count(*) AS BIGINT) AS n_shared
      |FROM cap a JOIN cap b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b""".stripMargin

  /** q238: the q65 shingle CTEs transposed to the eval side; the
    * worst offender replays Spark's struct arg-max as a
    * (ratio DESC, doc_id ASC) row_number — identical ordering.
    */
  private def contamProvenanceSql: String =
    """WITH dtok AS (SELECT doc_id, string_split(text, ' ') AS tk
      |  FROM documents),
      |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
      |       FROM dtok WHERE len(tk) >= 3),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
      |ev AS (SELECT doc_id AS eval_id, shingle FROM sh WHERE doc_id % 10 = 0),
      |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 10 <> 0),
      |esz AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_shingles
      |  FROM ev GROUP BY 1),
      |po AS (SELECT ev.eval_id, tr.doc_id, count(*) AS n_shared
      |  FROM tr JOIN ev USING (shingle) GROUP BY 1, 2),
      |pr AS (SELECT po.eval_id, po.doc_id,
      |  round(CAST(po.n_shared AS DOUBLE) / esz.n_shingles, 4) AS ratio
      |  FROM po JOIN esz USING (eval_id)),
      |rk AS (SELECT eval_id, doc_id, ratio, row_number() OVER (
      |  PARTITION BY eval_id ORDER BY ratio DESC, doc_id) AS rn FROM pr),
      |agg AS (SELECT eval_id, CAST(count(*) AS BIGINT) AS n_hit_docs,
      |  CAST(sum(CASE WHEN ratio >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_compromised
      |  FROM pr GROUP BY 1)
      |SELECT e.eval_id, e.n_shingles,
      |CAST(coalesce(a.n_hit_docs, 0) AS BIGINT) AS n_hit_docs,
      |CAST(coalesce(a.n_compromised, 0) AS BIGINT) AS n_compromised,
      |CAST(coalesce(r.doc_id, -1) AS BIGINT) AS top_doc,
      |coalesce(r.ratio, 0.0) AS top_ratio
      |FROM esz e LEFT JOIN agg a USING (eval_id)
      |LEFT JOIN (SELECT eval_id, doc_id, ratio FROM rk WHERE rn = 1) r
      |  USING (eval_id)
      |ORDER BY e.eval_id""".stripMargin

  /** q237: both arms' rankings (q138's BM25 CTEs at depth 10, q152's
    * hybrid chain verbatim) scored against the shared-shingle
    * relevance band. Rank discounts are the same round(1e9/log2(i+1))
    * integer literals the Spark side carries; IDCG is closed-form on
    * (n2, n_rel) via cumulative-weight literals; MRR and nDCG are one
    * closing divide each.
    */
  private def retrievalQualitySql: String = {
    def cumw(e: String): String =
      s"""CASE least($e, 10) WHEN 0 THEN 0
         |  WHEN 1 THEN 1000000000 WHEN 2 THEN 1630929754
         |  WHEN 3 THEN 2130929754 WHEN 4 THEN 2561606312
         |  WHEN 5 THEN 2948459119 WHEN 6 THEN 3304666306
         |  WHEN 7 THEN 3637999639 WHEN 8 THEN 3953464516
         |  WHEN 9 THEN 4254494512 ELSE 4543559338 END""".stripMargin
    val wCase = """CASE a.rk WHEN 1 THEN 1000000000 WHEN 2 THEN 630929754
      |  WHEN 3 THEN 500000000 WHEN 4 THEN 430676558 WHEN 5 THEN 386852807
      |  WHEN 6 THEN 356207187 WHEN 7 THEN 333333333 WHEN 8 THEN 315464877
      |  WHEN 9 THEN 301029996 ELSE 289064826 END""".stripMargin
    s"""WITH t AS (SELECT doc_id,
       |  unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
       |       FROM t GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
       |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
       |          FROM tf GROUP BY 1),
       |q AS (SELECT doc_id AS q_id, term FROM tf WHERE doc_id < 8),
       |scored AS (SELECT q.q_id, tf.doc_id,
       |    round(sum(
       |      ln((n.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
       |        * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75
       |            + 0.75 * dl.dl * n.n_docs / tot.total))), 6) AS score_r
       |  FROM tf JOIN q USING (term) JOIN dfreq d USING (term)
       |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n CROSS JOIN tot
       |  WHERE tf.doc_id <> q.q_id GROUP BY 1, 2),
       |lexarm AS (SELECT q_id, doc_id, rk FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_r DESC, doc_id) AS INT) AS rk FROM scored)
       |  WHERE rk <= 10),
       |lex AS (SELECT q_id, doc_id, rk_lex FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_r DESC, doc_id) AS INT) AS rk_lex FROM scored)
       |  WHERE rk_lex <= 20),
       |sp AS (SELECT doc_id,
       |    CAST(concat('0x', substring(md5('d:' || term), 1, 8)) AS BIGINT)
       |      % 64 AS j,
       |    CASE WHEN CAST(concat('0x', substring(md5('s:' || term), 1, 8))
       |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s FROM t),
       |sv AS (SELECT doc_id, j, CAST(sum(s) AS BIGINT) AS v
       |       FROM sp GROUP BY 1, 2 HAVING sum(s) <> 0),
       |nrm AS (SELECT doc_id, CAST(sum(v * v) AS BIGINT) AS nrm
       |        FROM sv GROUP BY 1),
       |qv AS (SELECT doc_id AS q_id, j, v AS vq FROM sv WHERE doc_id < 8),
       |dotp AS (SELECT qv.q_id, sv.doc_id,
       |    CAST(sum(sv.v * qv.vq) AS BIGINT) AS dot
       |  FROM sv JOIN qv USING (j) WHERE sv.doc_id <> qv.q_id
       |  GROUP BY 1, 2),
       |dsc AS (SELECT dp.q_id, dp.doc_id,
       |    round(CAST(dp.dot AS DOUBLE)
       |      / sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)), 6)
       |      AS cos_r
       |  FROM dotp dp JOIN nrm n1 ON n1.doc_id = dp.doc_id
       |  JOIN nrm n2 ON n2.doc_id = dp.q_id),
       |dense AS (SELECT q_id, doc_id, rk_dense FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos_r DESC, doc_id) AS INT) AS rk_dense FROM dsc)
       |  WHERE rk_dense <= 20),
       |fused AS (SELECT coalesce(l.q_id, de.q_id) AS q_id,
       |    coalesce(l.doc_id, de.doc_id) AS doc_id,
       |    round(coalesce(CAST(1 AS DOUBLE) / (60 + l.rk_lex), 0)
       |      + coalesce(CAST(1 AS DOUBLE) / (60 + de.rk_dense), 0), 6)
       |      AS rrf
       |  FROM lex l FULL OUTER JOIN dense de
       |    ON l.q_id = de.q_id AND l.doc_id = de.doc_id),
       |hybarm AS (SELECT q_id, doc_id, rk FROM (
       |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id) AS INT) AS rk FROM fused)
       |  WHERE rk <= 10),
       |dtok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
       |       FROM dtok WHERE len(tk) >= 3),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
       |qsh AS (SELECT doc_id AS q_id, shingle FROM sh WHERE doc_id < 8),
       |rel AS (SELECT qsh.q_id, sh.doc_id,
       |    CASE WHEN count(*) >= 5 THEN 2 ELSE 1 END AS rel
       |  FROM sh JOIN qsh USING (shingle) WHERE sh.doc_id <> qsh.q_id
       |  GROUP BY 1, 2),
       |arms AS (SELECT 'bm25' AS arm, q_id, doc_id, rk FROM lexarm
       |  UNION ALL SELECT 'hybrid', q_id, doc_id, rk FROM hybarm),
       |am AS (SELECT a.q_id, a.arm,
       |    CAST(sum((CASE r.rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END)
       |      * CAST(($wCase) AS BIGINT)) AS BIGINT) AS dcg_s,
       |    min(CASE WHEN r.rel >= 1 THEN a.rk END) AS first_rel_rank
       |  FROM arms a LEFT JOIN rel r
       |    ON a.q_id = r.q_id AND a.doc_id = r.doc_id
       |  GROUP BY 1, 2),
       |ic AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel,
       |    CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
       |  FROM rel GROUP BY 1),
       |icg AS (SELECT q_id, n_rel,
       |    CAST(3 * CAST((${cumw("n2")}) AS BIGINT)
       |      + ((${cumw("n_rel")}) - (${cumw("n2")})) AS BIGINT) AS idcg_s
       |  FROM ic),
       |panel AS (SELECT doc_id AS q_id, arm FROM documents
       |  CROSS JOIN (SELECT 'bm25' AS arm UNION ALL SELECT 'hybrid')
       |  WHERE doc_id < 8)
       |SELECT p.q_id, p.arm,
       |CAST(coalesce(i.n_rel, 0) AS BIGINT) AS n_rel,
       |CAST(coalesce(a.first_rel_rank, 0) AS INT) AS first_rel_rank,
       |CASE WHEN a.first_rel_rank IS NULL THEN 0.0
       |  ELSE floor(1e6 / a.first_rel_rank + 0.5) / 1e6 END AS rr,
       |CAST(coalesce(a.dcg_s, 0) AS BIGINT) AS dcg_s,
       |CASE WHEN coalesce(i.idcg_s, 0) = 0 THEN 0.0
       |  ELSE floor(CAST(coalesce(a.dcg_s, 0) AS DOUBLE) / CAST(i.idcg_s AS DOUBLE)
       |    * 1e6 + 0.5) / 1e6 END AS ndcg
       |FROM panel p LEFT JOIN am a ON p.q_id = a.q_id AND p.arm = a.arm
       |LEFT JOIN icg i ON p.q_id = i.q_id
       |ORDER BY p.q_id, p.arm""".stripMargin
  }

  /** q236: q106's funnel CTEs verbatim, with the URL gate prepended —
    * `t` (the funnel's input) is documents restricted to URL keepers
    * (mirror min-doc_id per page, per-host rank ≤ 8 by md5 priority),
    * and the final per-source report adds the n_url column. q106's
    * `canon` CTE is renamed `canond` (the URL CTE owns the name).
    */
  private def urlFunnelSql: String =
    s"""$urlCanonCte,
       |urlpages AS (SELECT host, page_key, min(doc_id) AS doc_id
       |  FROM canon GROUP BY 1, 2),
       |urlkeep AS (SELECT doc_id FROM (SELECT doc_id,
       |  row_number() OVER (PARTITION BY host
       |    ORDER BY md5(page_key), page_key) AS rk FROM urlpages)
       |  WHERE rk <= 8),
       |t AS (SELECT d.doc_id, d.source, d.text, string_split(d.text, ' ') AS tk
       |  FROM documents d JOIN urlkeep u ON d.doc_id = u.doc_id),
       |f AS (SELECT doc_id, source, text, tk,
       |CAST(len(tk) AS INT) AS n_tokens,
       |round(CAST(length(text) AS DOUBLE) / len(tk), 4) AS mean_token_len,
       |round(CAST(len(list_filter(tk, x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / len(tk), 4) AS stopword_ratio,
       |CASE WHEN len(tk) < 3 THEN 0.0 ELSE
       |round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(tk) - 1),
       |i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS DOUBLE) / (len(tk) - 2), 4) END AS rep_ratio
       |FROM t),
       |gated AS (SELECT doc_id, source, text, tk FROM f
       |WHERE n_tokens >= 10 AND n_tokens <= 1000
       |  AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
       |  AND stopword_ratio >= 0.01 AND rep_ratio <= 0.5),
       |canond AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
       |ded AS (SELECT g.doc_id, g.tk FROM gated g JOIN canond c ON g.doc_id = c.doc_id),
       |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
       |       FROM ded WHERE len(tk) >= 3),
       |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
       |ev0 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents WHERE doc_id % 10 = 0),
       |evsh AS (SELECT DISTINCT unnest(list_transform(range(1, len(tk) - 1),
       |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS shingle
       |       FROM ev0 WHERE len(tk) >= 3),
       |o AS (SELECT doc_id, count(*) AS n_overlap FROM sh
       |      WHERE shingle IN (SELECT shingle FROM evsh) GROUP BY doc_id),
       |s AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
       |keptids AS (SELECT s.doc_id FROM s LEFT JOIN o ON s.doc_id = o.doc_id
       |WHERE round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / s.n_shingles, 4) <= 0.5)
       |SELECT d.source, count(*) AS n_input, count(u.doc_id) AS n_url,
       |count(g.doc_id) AS n_gated, count(dd.doc_id) AS n_deduped,
       |count(k.doc_id) AS n_kept
       |FROM documents d
       |LEFT JOIN urlkeep u ON d.doc_id = u.doc_id
       |LEFT JOIN gated g ON d.doc_id = g.doc_id
       |LEFT JOIN ded dd ON d.doc_id = dd.doc_id
       |LEFT JOIN keptids k ON d.doc_id = k.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** DuckDB twin of UrlCuration's synth + canonicalize pipeline (see
    * UrlCuration.scala for the per-step rationale): md5-bit variants,
    * fragment/port/www/slash/tracking-param normalization, canon_url
    * (scheme kept) and the scheme-insensitive page_key. A def, not a
    * val: it is interpolated into `base` above, which initializes
    * first.
    */
  private def urlCanonCte: String =
    """WITH synth AS (SELECT doc_id, n_chars,
      |  ('0x' || substring(md5(text), 1, 6))::BIGINT AS b, source
      |  FROM documents),
      |raw AS (SELECT doc_id, n_chars,
      |  (CASE WHEN b % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |  (CASE (b // 2) % 3 WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'WWW.' END) ||
      |  (CASE WHEN (b // 12) % 2 = 0 THEN upper(source) ELSE source END) ||
      |  '.example' ||
      |  (CASE WHEN length(source) % 2 = 0 THEN '.com' ELSE '.org' END) ||
      |  (CASE (b // 24) % 4
      |    WHEN 0 THEN (CASE WHEN b % 2 = 0 THEN ':80' ELSE ':443' END)
      |    WHEN 1 THEN ':8080' ELSE '' END) ||
      |  '/s' || CAST(doc_id // 200 AS VARCHAR) ||
      |  '//docs/' || CAST(doc_id % 40 AS VARCHAR) ||
      |  (CASE WHEN (b // 96) % 2 = 0 THEN '/' ELSE '' END) ||
      |  '?z=' || CAST((doc_id % 40) % 7 AS VARCHAR) ||
      |  '&utm_source=feed&a=' || CAST((doc_id % 40) % 3 AS VARCHAR) ||
      |  '&utm_campaign=x' ||
      |  (CASE WHEN (b // 192) % 2 = 0 THEN '#top' ELSE '' END) AS raw_url
      |  FROM synth),
      |parts AS (SELECT doc_id, n_chars, raw_url,
      |  regexp_replace(raw_url, '#.*$', '') AS nf FROM raw),
      |pieces AS (SELECT doc_id, n_chars, raw_url,
      |  lower(regexp_extract(nf, '^([A-Za-z]+)://', 1)) AS scheme,
      |  lower(regexp_extract(nf, '^[A-Za-z]+://([^/?]*)', 1)) AS auth,
      |  regexp_extract(nf, '^[A-Za-z]+://[^/?]*([^?]*)', 1) AS path,
      |  regexp_extract(nf, '\?(.*)$', 1) AS qs FROM parts),
      |cp AS (SELECT doc_id, n_chars, raw_url, scheme,
      |  regexp_replace(regexp_extract(auth, '^([^:]*)', 1), '^www\.', '') AS host,
      |  regexp_extract(auth, ':([0-9]+)$', 1) AS port,
      |  regexp_replace(regexp_replace(path, '/{2,}', '/', 'g'), '/+$', '') AS pc,
      |  coalesce(array_to_string(list_sort(list_filter(string_split(qs, '&'),
      |    x -> NOT (substr(x, 1, 4) = 'utm_' OR substr(x, 1, 7) = 'fbclid='
      |    OR substr(x, 1, 6) = 'gclid='))), '&'), '') AS cq
      |  FROM pieces),
      |canon AS (SELECT doc_id, n_chars, raw_url, host,
      |  scheme || '://' || host ||
      |  (CASE WHEN port = '' THEN ''
      |    WHEN scheme = 'http'  AND port = '80'  THEN ''
      |    WHEN scheme = 'https' AND port = '443' THEN ''
      |    ELSE ':' || port END) ||
      |  (CASE WHEN pc = '' THEN '/' ELSE pc END) ||
      |  (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canon_url,
      |  host ||
      |  (CASE WHEN port = '' THEN ''
      |    WHEN scheme = 'http'  AND port = '80'  THEN ''
      |    WHEN scheme = 'https' AND port = '443' THEN ''
      |    ELSE ':' || port END) ||
      |  (CASE WHEN pc = '' THEN '/' ELSE pc END) ||
      |  (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS page_key
      |  FROM cp)""".stripMargin
}
