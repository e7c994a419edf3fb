package graft
package queries

import graft.etl.MusicKpis
import graft.functions.Text
import graft.operators.{Dedup, GroupTop, Mixture, Similarity}
import graft.quality.Checks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry._

/** Oracle-registry fragment of [[graft.SparkEntry]] (mechanical r10 split of the
  * 13.7k-line registry into per-domain files): dedup/ANN tiers, text statistics and language-model scoring.
  * Entries are verbatim from the original map; SparkEntry folds every
  * fragment back into one registry, so names/oracles stay 1:1. */
private[graft] object OraclesDedupText {
  def m: Map[String, String] = Map(
    "minhash_lsh_pairs" -> minHashLshOracle,
    "minhash_accuracy" -> minHashAccuracyOracle,
    "simhash_pairs" -> simHashOracle,
    "lsh_topk" -> lshTopKOracle,
    "ann_recall" -> panelRecallOracle(lshTopKOracle),
    "margin_align_pairs" -> marginAlignOracle,
    "bt_event_scores" -> btScoresOracle(BtIterations),
    "approx_distinct_portable" -> approxDistinctOracle,
    "near_dup_lsh" -> nearDupLshOracle,
    "dup_graph_triangles" -> dupTrianglesOracle,
    "dup_graph_clustering_coeff" -> clusteringCoeffOracle,
    "dup_link_prediction" -> linkPredictionOracle,
    "dup_source_crosstab" -> dupSourceCrosstabOracle,
    "er_field_weights" -> erFieldWeightsOracle,
    "daily_acf" -> dailyAcfOracle,
    "value_trimmed_mean" -> valueTrimmedMeanOracle,
    "weekday_index" -> weekdayIndexOracle,
    "dup_graph_assortativity" -> assortativityOracle,
    "vocab_simpson" -> vocabSimpsonOracle,
    "parts_skyline" -> partsSkylineOracle,
    "funnel_time_to_convert" -> funnelTimeToConvertOracle,
    "events_heatmap" -> eventsHeatmapOracle,
    "null_matrix_by_type" -> nullMatrixOracle,
    "bounce_rate" -> bounceRateOracle,
    "brand_rank_kendall" -> brandKendallOracle,
    "q21_waiting_suppliers" -> q21WaitingSuppliersOracle,
    "poisson_bootstrap_ci" -> poissonBootstrapOracle,
    "jackknife_buckets" -> jackknifeBucketsOracle,

    "conformal_interval" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
        |               AS BIGINT) % 2 = 0) AS calib
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_calib,
        |              CAST(sum(cents) // count(*) AS BIGINT) AS pred_cents,
        |              least(CAST((9 * (count(*) + 1) + 9) // 10 AS BIGINT),
        |                    CAST(count(*) AS BIGINT)) AS k
        |       FROM e WHERE calib GROUP BY 1),
        |rc AS (SELECT e.event_type, st.k, abs(e.cents - st.pred_cents) AS r,
        |              count(*) AS c
        |       FROM e JOIN st USING (event_type) WHERE e.calib
        |       GROUP BY 1, 2, 3),
        |cum AS (SELECT event_type, k, r,
        |               sum(c) OVER (PARTITION BY event_type
        |                            ORDER BY r ASC) AS cum
        |        FROM rc),
        |qh AS (SELECT event_type, CAST(min(r) AS BIGINT) AS qhat_cents
        |       FROM cum WHERE cum >= k GROUP BY 1),
        |ta AS (SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_test,
        |              CAST(sum(CASE WHEN abs(e.cents - st.pred_cents)
        |                                 <= qh.qhat_cents
        |                            THEN 1 ELSE 0 END) AS BIGINT) AS n_in
        |       FROM e JOIN st USING (event_type) JOIN qh USING (event_type)
        |       WHERE NOT e.calib GROUP BY 1)
        |SELECT st.event_type, st.n_calib, ta.n_test, st.pred_cents,
        |       qh.qhat_cents,
        |       CAST(ta.n_in * 1000000 // nullif(ta.n_test, 0) AS BIGINT)
        |         AS coverage_e6
        |FROM st JOIN qh USING (event_type) JOIN ta USING (event_type)""".stripMargin,
    "permutation_test" -> permutationTestOracle,
    "ks_two_sample" -> ksTwoSampleOracle,
    "annotator_kappa" -> annotatorKappaOracle,
    "isotonic_calibration" -> isotonicCalibrationOracle,
    "brier_decomposition" -> brierDecompositionOracle,
    "term_chi2_keywords" -> termChi2KeywordsOracle,
    "mm_audio_silence" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(doc_id % 256 AS BIGINT) AS seed,
        |         CAST(n_chars % 1000 + 1 AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 2 = 0),
        |s AS (
        |  SELECT doc_id, t.i,
        |         CASE WHEN ((g.seed + t.i) % 256) BETWEEN 120 AND 136
        |              THEN 1 ELSE 0 END AS sil
        |  FROM g, UNNEST(range(0, g.len)) AS t(i)),
        |r AS (SELECT doc_id, i, sil,
        |             i - row_number() OVER (PARTITION BY doc_id, sil ORDER BY i)
        |               AS island
        |      FROM s),
        |runs AS (SELECT doc_id, count(*) AS rl
        |         FROM r WHERE sil = 1 GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, CAST(max(rl) AS BIGINT) AS longest
        |        FROM runs GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |               CAST(sum(sil) AS BIGINT) AS n_silent
        |        FROM s GROUP BY 1)
        |SELECT t.doc_id AS asset_id, t.n_samples, t.n_silent,
        |       COALESCE(a.longest, 0) AS longest_run,
        |       CAST(t.n_silent * 1000000 // nullif(t.n_samples, 0) AS BIGINT)
        |         AS silence_ratio_e6
        |FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin,
    "orders_abc_classification" -> abcClassificationOracle,
    "lorenz_curve_deciles" -> lorenzDecilesOracle,
    "supplier_hhi" -> supplierHhiOracle,
    "events_burstiness" -> eventsBurstinessOracle,
    "new_vs_returning_daily" ->
      """WITH acts AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |              FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fd AS (SELECT user_id, min(d) AS d0 FROM acts GROUP BY 1)
        |SELECT d, CAST(count(*) AS BIGINT) AS n_active,
        |       CAST(count(CASE WHEN d = d0 THEN 1 END) AS BIGINT) AS n_new,
        |       CAST(count(CASE WHEN d <> d0 THEN 1 END) AS BIGINT) AS n_returning,
        |       CAST(count(CASE WHEN d = d0 THEN 1 END) * 1000000
        |            // nullif(count(*), 0) AS BIGINT) AS new_share_e6
        |FROM acts JOIN fd USING (user_id)
        |GROUP BY 1""".stripMargin,

    "priority_mix_drift" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate)
        |                       AS BIGINT) AS mth,
        |                  o_orderpriority AS prio
        |           FROM orders),
        |cells AS (SELECT mth, prio, CAST(count(*) AS BIGINT) AS c_mp
        |          FROM m GROUP BY 1, 2),
        |bm AS (SELECT mth, CAST(sum(c_mp) AS BIGINT) AS n_m FROM cells GROUP BY 1),
        |bp AS (SELECT prio, CAST(sum(c_mp) AS BIGINT) AS c_p FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(c_mp) AS BIGINT) AS n FROM cells)
        |SELECT mth, CAST(max(n_m) AS BIGINT) AS n_orders,
        |  CAST(sum(abs(CAST(c_mp AS HUGEINT) * n - CAST(c_p AS HUGEINT) * n_m))
        |         * 1000000
        |       // nullif(CAST(max(n_m) AS HUGEINT) * max(n), 0) AS BIGINT)
        |    AS l1_drift_e6
        |FROM cells JOIN bm USING (mth) JOIN bp USING (prio), t
        |GROUP BY 1""".stripMargin,

    "session_conversion" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         lag(ts) OVER (PARTITION BY user_id
        |                       ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (
        |  SELECT user_id, event_type,
        |         sum(is_new) OVER (PARTITION BY user_id
        |                           ORDER BY ts ASC, event_id ASC
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM y),
        |sess AS (
        |  SELECT user_id, session_id,
        |         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS has_purchase
        |  FROM z GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_view_sessions,
        |  CAST(count(CASE WHEN has_purchase = 1 THEN 1 END) AS BIGINT)
        |    AS n_converted,
        |  CAST(count(CASE WHEN has_purchase = 1 THEN 1 END) * 1000000
        |       // nullif(count(*), 0) AS BIGINT) AS session_conv_e6
        |FROM sess WHERE has_view = 1""".stripMargin,

    "vocab_hapax" ->
      """WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n_i FROM tok GROUP BY 1),
        |m AS (SELECT CAST(sum(n_i) AS BIGINT) AS n_tokens,
        |             CAST(count(*) AS BIGINT) AS n_types,
        |             CAST(count(CASE WHEN n_i = 1 THEN 1 END) AS BIGINT) AS n_hapax
        |      FROM c)
        |SELECT n_tokens, n_types, n_hapax,
        |  CAST(n_hapax * 1000000 // nullif(n_types, 0) AS BIGINT)
        |    AS hapax_share_e6,
        |  CAST(n_types * 1000000 // nullif(n_tokens, 0) AS BIGINT)
        |    AS type_token_e6
        |FROM m""".stripMargin,

    "session_coverage_seconds" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS t, event_id
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |d AS (SELECT user_id, t, 1 AS dd, event_id FROM ev
        |      UNION ALL SELECT user_id, t + 1800, -1, event_id FROM ev),
        |s AS (SELECT user_id,
        |             sum(dd) OVER (PARTITION BY user_id
        |                           ORDER BY t ASC, dd DESC, event_id ASC
        |                           ROWS UNBOUNDED PRECEDING) AS cov,
        |             t,
        |             lead(t) OVER (PARTITION BY user_id
        |                           ORDER BY t ASC, dd DESC, event_id ASC) AS nxt
        |      FROM d),
        |u AS (SELECT user_id,
        |             CAST(sum(CASE WHEN cov >= 1 AND nxt IS NOT NULL
        |                           THEN nxt - t ELSE 0 END) AS BIGINT)
        |               AS engaged_s
        |      FROM s GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(engaged_s) AS BIGINT) AS total_engaged_seconds,
        |  CAST(CAST(sum(engaged_s) AS HUGEINT) * 1000000
        |       // nullif(count(*), 0) AS BIGINT) AS mean_engaged_s_e6
        |FROM u""".stripMargin,

    "dominant_suppliers" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_ps
        |            FROM lineitem GROUP BY 1, 2),
        |pp AS (SELECT l_partkey, CAST(sum(q_ps) AS BIGINT) AS q_p
        |       FROM ps GROUP BY 1),
        |dom AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_dominated_parts,
        |               CAST(sum(q_ps) AS BIGINT) AS dominated_qty
        |        FROM ps JOIN pp USING (l_partkey)
        |        WHERE q_ps * 2 > q_p
        |        GROUP BY 1)
        |SELECT s_suppkey, s_name, n_dominated_parts, dominated_qty
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,

    "term_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |g AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
        |t AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf,
        |             CAST(count(*) AS BIGINT) AS df
        |      FROM g GROUP BY 1)
        |SELECT term, cf, df,
        |       CAST(cf * 1000000 // nullif(df, 0) AS BIGINT) AS burstiness_e6
        |FROM t ORDER BY cf DESC, term LIMIT 20""".stripMargin,

    "orders_backlog_curve" ->
      """WITH done AS (SELECT l_orderkey, max(l_shipdate) AS done_ts
        |              FROM lineitem GROUP BY 1),
        |o AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |               AS pm,
        |             CAST(year(done_ts) * 12 + month(done_ts) AS BIGINT) AS cm
        |      FROM orders LEFT JOIN done ON o_orderkey = l_orderkey),
        |d AS (SELECT pm AS m, 1 AS dd FROM o
        |      UNION ALL SELECT cm, -1 FROM o WHERE cm IS NOT NULL),
        |g AS (SELECT m, CAST(sum(dd) AS BIGINT) AS delta,
        |             CAST(count(CASE WHEN dd = 1 THEN 1 END) AS BIGINT) AS n_placed,
        |             CAST(count(CASE WHEN dd = -1 THEN 1 END) AS BIGINT)
        |               AS n_completed
        |      FROM d GROUP BY 1)
        |SELECT m, n_placed, n_completed,
        |       CAST(sum(delta) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
        |            AS BIGINT) AS backlog_eom
        |FROM g""".stripMargin,

    "nation_trade_balance" ->
      """WITH ex AS (
        |  SELECT s_nationkey AS nk,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |           AS export_e4
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |im AS (
        |  SELECT c_nationkey AS nk,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |           AS import_e4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT n_name,
        |  COALESCE(export_e4, 0) AS export_e4,
        |  COALESCE(import_e4, 0) AS import_e4,
        |  COALESCE(export_e4, 0) - COALESCE(import_e4, 0) AS balance_e4
        |FROM ex FULL OUTER JOIN im USING (nk)
        |     JOIN nation ON COALESCE(nk, nk) = n_nationkey""".stripMargin,

    "daily_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM daily GROUP BY 1),
        |cu AS (SELECT c, CAST(sum(cnt) OVER (ORDER BY c) AS BIGINT) AS cum FROM g),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |med AS (SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS m1,
        |               min(CASE WHEN cum >= n // 2 + 1 THEN c END) AS m2
        |        FROM cu, tt),
        |sg AS (SELECT d.t, CASE WHEN d.c * 2 > m.m1 + m.m2 THEN 1
        |                        WHEN d.c * 2 < m.m1 + m.m2 THEN -1 END AS sgn
        |       FROM daily d, med m),
        |f AS (SELECT t, sgn, lag(sgn) OVER (ORDER BY t) AS prev
        |      FROM sg WHERE sgn IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_days_classified,
        |             CAST(count(CASE WHEN sgn = 1 THEN 1 END) AS BIGINT) AS n_plus,
        |             CAST(count(CASE WHEN sgn = -1 THEN 1 END) AS BIGINT) AS n_minus,
        |             CAST(count(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 END)
        |                  AS BIGINT) AS n_runs
        |      FROM f)
        |SELECT n_days_classified, n_plus, n_minus, n_runs,
        |  CAST(CAST(2 AS HUGEINT) * n_plus * n_minus * 1000000
        |       // nullif(n_plus + n_minus, 0) + 1000000 AS BIGINT)
        |    AS expected_runs_e6
        |FROM a""".stripMargin,

    "first_value_ltv_corr" ->
      """WITH r AS (
        |  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders),
        |pc AS (SELECT o_custkey,
        |              min(CASE WHEN rn = 1 THEN cents END) AS x,
        |              CAST(sum(cents) AS BIGINT) AS y
        |       FROM r GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |             sum(CAST(x AS HUGEINT) * x) AS sxx,
        |             sum(CAST(y AS HUGEINT) * y) AS syy,
        |             sum(CAST(x AS HUGEINT) * y) AS sxy
        |      FROM pc),
        |d AS (SELECT n_customers,
        |             n_customers * sxy - sx * sy AS num,
        |             n_customers * sxx - sx * sx AS denx,
        |             n_customers * syy - sy * sy AS deny
        |      FROM m)
        |SELECT n_customers,
        |  CASE WHEN denx <> 0 AND deny <> 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
        |      / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
        |      * CASE WHEN num < 0 THEN -1000000.0 ELSE 1000000.0 END
        |      + 0.5) AS BIGINT) END AS corr2_sign_e6,
        |  CASE WHEN denx <> 0 THEN
        |    CAST(floor(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) END AS slope_e6
        |FROM d""".stripMargin,

    "daily_theilsen_trend" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |lags AS (SELECT UNNEST(range(1, 31)) AS lag),
        |sl AS (SELECT (y2.c - y1.c) * 1000000 // lags.lag AS slope_e6
        |       FROM lags CROSS JOIN daily y1
        |            JOIN daily y2 ON y2.t = y1.t + lags.lag)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST(quantile_cont(slope_e6, 0.5) * 4 AS BIGINT)
        |         AS median_slope_e6_x4,
        |       CAST(count(CASE WHEN slope_e6 > 0 THEN 1 END) AS BIGINT) AS n_up,
        |       CAST(count(CASE WHEN slope_e6 < 0 THEN 1 END) AS BIGINT) AS n_down
        |FROM sl""".stripMargin,
    "kmv_type_jaccard" -> kmvTypeJaccardOracle,
    "event_type_pagerank" -> pageRankE6Oracle,
    "embedding_rp_audit" -> rpAuditOracle,
    "ivf_topk" -> ivfTopKOracle,
    "substring_dup_spans" -> substringSpansOracle,
    "doc_dup_stats" -> substringStatsOracle,
    "doc_cut_dup_spans" -> cutSpansOracle,
    "corpus_curate2" -> corpusCurate2Oracle,
    "embedding_quantize" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |b AS (SELECT vec_id, vv, list_min(vv) AS q_lo, list_max(vv) AS q_hi FROM v)
        |SELECT vec_id, q_lo, q_hi,
        |  CASE WHEN q_hi = q_lo
        |       THEN array_to_string(list_transform(vv, x -> 0), ',')
        |       ELSE array_to_string(list_transform(vv, x ->
        |              CAST(floor((x - q_lo) / (q_hi - q_lo) * 255.0 + 0.5) AS INTEGER)), ',')
        |  END AS qvec_csv
        |FROM b""".stripMargin,
    "doc_shuffle_index" ->
      s"""SELECT doc_id,
         | CAST(row_number() OVER (ORDER BY ${dh("CAST(doc_id AS VARCHAR)")}, doc_id) - 1
         |      AS BIGINT) AS shuffle_idx
         |FROM documents""".stripMargin,
    "pq_topk" -> pqTopKOracle,
    "ivfpq_topk" -> ivfPqTopKOracle,
    // recall harness: each index tier's full oracle nested verbatim as the
    // approximate leg, exact leg restricted to the hash-sampled panel
    "ivf_recall" -> panelRecallOracle(ivfTopKOracle),
    "pq_recall" -> panelRecallOracle(pqTopKOracle),
    "ivfpq_recall" -> panelRecallOracle(ivfPqTopKOracle),
    "sq_recall" -> panelRecallOracle(sqPanelTopKOracle),
    "binary_topk" -> binaryTopKOracle(),
    "bq_recall" -> panelRecallOracle(binaryTopKOracle()),
    "bq_rerank_recall" -> panelRecallOracle(bqRerankOracle),
    "mrl_recall" -> panelRecallOracle(mrlPanelTopKOracle),
    "retrieval_map_mrr" ->
      s"""WITH run AS (${binaryTopKOracle()}),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ls AS (SELECT label, count(*) - 1 AS r_total FROM lab GROUP BY 1),
         |f AS (SELECT r.query_id, r."rank", ql.label AS q_label,
         |        CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
         |      FROM run r JOIN lab ql ON r.query_id = ql.vec_id
         |                 JOIN lab nl ON r.neighbor_id = nl.vec_id),
         |c AS (SELECT *, sum(rel) OVER (PARTITION BY query_id ORDER BY "rank") AS relcum
         |      FROM f),
         |p AS (SELECT query_id, q_label,
         |        CAST(sum(rel) AS BIGINT) AS n_rel_topk,
         |        min(CASE WHEN rel = 1 THEN "rank" END) AS frr,
         |        sum(rel * relcum * (60 // "rank")) AS ap_num60
         |      FROM c GROUP BY 1, 2)
         |SELECT query_id, n_rel_topk,
         |  CAST(COALESCE(frr, 0) AS INTEGER) AS first_rel_rank,
         |  CAST(CASE WHEN frr IS NULL THEN 0 ELSE 1000000 // frr END AS BIGINT) AS rr_e6,
         |  CAST(ap_num60 * 1000000 // nullif(60 * least(ls.r_total, $AnnK), 0) AS BIGINT)
         |    AS ap_e6
         |FROM p JOIN ls ON p.q_label = ls.label""".stripMargin,
    // nDCG@k over the same run — frozen e6 log2 discounts (see the Spark
    // side), binary-relevance ideal = the discount prefix sum at
    // min(r_total, k); integer end to end
    "retrieval_ndcg" ->
      s"""WITH run AS (${binaryTopKOracle()}),
         |lab AS (SELECT vec_id, label FROM embeddings),
         |ls AS (SELECT label, count(*) - 1 AS r_total FROM lab GROUP BY 1),
         |f AS (SELECT r.query_id, ql.label AS q_label,
         |        CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel,
         |        CASE r."rank" WHEN 1 THEN 1000000 WHEN 2 THEN 630929
         |             WHEN 3 THEN 500000 WHEN 4 THEN 430676
         |             ELSE 386852 END AS disc
         |      FROM run r JOIN lab ql ON r.query_id = ql.vec_id
         |                 JOIN lab nl ON r.neighbor_id = nl.vec_id),
         |p AS (SELECT query_id, q_label,
         |        CAST(sum(rel) AS BIGINT) AS n_rel_topk,
         |        sum(rel * disc) AS dcg_e6
         |      FROM f GROUP BY 1, 2)
         |SELECT query_id, n_rel_topk,
         |  CAST(dcg_e6 * 1000000 // (CASE least(ls.r_total, $AnnK)
         |         WHEN 1 THEN 1000000 WHEN 2 THEN 1630929
         |         WHEN 3 THEN 2130929 WHEN 4 THEN 2561605
         |         WHEN 5 THEN 2948457 END) AS BIGINT) AS ndcg_e6
         |FROM p JOIN ls ON p.q_label = ls.label""".stripMargin,
    "vocab_growth" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
        |  FROM documents),
        |fs AS (SELECT tok, min(doc_id) AS first_doc FROM toks
        |       WHERE tok <> '' GROUP BY tok),
        |b AS (SELECT CAST(CASE WHEN first_doc = 0 THEN 0
        |                       ELSE length(bin(first_doc)) END AS INTEGER) AS idx
        |      FROM fs),
        |g AS (SELECT idx, CAST(count(*) AS BIGINT) AS n_new_tokens
        |      FROM b GROUP BY idx)
        |SELECT CAST(1::BIGINT << idx AS BIGINT) AS first_t_docs, n_new_tokens,
        |  CAST(sum(n_new_tokens) OVER (ORDER BY idx) AS BIGINT) AS vocab
        |FROM g""".stripMargin,
    "l_diversity_audit" ->
      """SELECT CAST(ts AS DATE) AS d, event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS l_distinct,
        |  CAST(CASE WHEN count(DISTINCT user_id) < 5 THEN 1 ELSE 0 END AS BIGINT)
        |    AS at_risk
        |FROM events WHERE user_id IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "semantic_dedup_pairs" -> semanticPairsOracle,
    "semantic_dedup_keepers" -> semanticKeepersOracle,
    "contrastive_triplets" -> contrastiveOracle,
    "bpe_pair_stats" ->
      s"""WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |p AS (SELECT ws[i] AS "left", ws[i+1] AS "right"
         |      FROM toks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
         |c AS (SELECT "left", "right", count(*) AS n_pairs FROM p GROUP BY 1, 2),
         |r AS (SELECT "left", "right", n_pairs,
         |        row_number() OVER (ORDER BY n_pairs DESC, "left" ASC, "right" ASC) AS "rank"
         |      FROM c)
         |SELECT "left", "right", n_pairs, CAST("rank" AS INTEGER) AS "rank"
         |FROM r WHERE "rank" <= $BpeTopK""".stripMargin,
    "doc_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |dfreq AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM grams),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |               CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams
        |        FROM dfreq GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_grams, 0) AS n_grams,
        |  COALESCE(a.novel_grams, 0) AS novel_grams,
        |  CAST(CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0
        |       ELSE floor(CAST(a.novel_grams AS DOUBLE) / a.n_grams * 1000000.0 + 0.5)
        |       END AS BIGINT) AS novelty_e6
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // Bigram-LM scoring: same hash-half reference split, same add-one
    // smoothing, per-DISTINCT-bigram e6 quantization BEFORE the doc sum so
    // the comparison never rides on float-summation order.
    "doc_lm_score" -> docLmScoreOracle,
    // DSIR: same bucket hash (portable md5 family), same smoothing, same
    // expression shape — (ct+1)/(cr+1) * (crt+B)/(ctt+B) — so the IEEE
    // operand reaching ln is bit-identical before quantization.
    "dsir_weights" -> dsirWeightsOracle,
    // NB: same hash-half split, add-one smoothing, per-term e6 quantization
    // before the per-(doc,class) integer sum; argmax tie-break = label asc.
    "nb_lang_classify" -> nbLangOracle,

    "nb_learning_curve" -> nbLearningCurveOracle,
    "nb_quality_classify" -> nbQualityOracle,
    "nb_confusion" ->
      s"""WITH nb AS (SELECT * FROM ($nbLangOracle))
         |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM nb GROUP BY 1, 2""".stripMargin,
    "nb_uncertain" -> nbUncertainOracle,
    "nb_label_noise" -> nbLabelNoiseOracle,
    "nb_calibration" -> nbCalibrationOracle,
    // entropy: tf·ln(tf) quantized per term BEFORE the doc sum; H assembled
    // from two quantized integers (no float crosses an aggregation).
    "doc_entropy" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |          CAST(sum(tf) AS BIGINT) AS n_tokens,
        |          CAST(count(*) AS BIGINT) AS n_types,
        |          CAST(sum(CAST(floor(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE))
        |                              * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
        |        FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens, n_types,
        |  CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(s AS DOUBLE) / n_tokens + 0.5) AS BIGINT) AS entropy_e6
        |FROM agg""".stripMargin,
    "doc_readability" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS n_words,
        |    CAST(length(regexp_replace(lower(text), '[aeiouy]+', 'a', 'g'))
        |       - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT) AS n_syllables,
        |    CAST(greatest(length(regexp_replace(lower(text), '[.!?]+', '.', 'g'))
        |       - length(regexp_replace(lower(text), '[.!?]+', '', 'g')), 1) AS BIGINT) AS n_sentences
        |  FROM documents)
        |SELECT doc_id, n_words, n_syllables, n_sentences,
        |  n_syllables * 1000000 // n_words AS syll_per_word_e6,
        |  206835 - (1015 * n_words // n_sentences)
        |         - (84600 * n_syllables // n_words) AS flesch_e3
        |FROM r WHERE n_words > 0""".stripMargin,
    "zipf_slope" ->
      s"""WITH ztok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
        |ztf AS (SELECT term, count(*) AS freq FROM ztok WHERE len(term) > 0 GROUP BY 1),
        |ztop AS (SELECT term, freq FROM ztf ORDER BY freq DESC, term LIMIT $ZipfTopK),
        |zrk AS (SELECT
        |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC, term) AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT) AS y
        |  FROM ztop),
        |zag AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM zrk)
        |SELECT n_terms, sx, sy,
        |  CASE WHEN n_terms * sxx - sx * sx <> 0
        |       THEN CAST(floor((n_terms * sxy - sx * sy) * 1.0 /
        |                       (n_terms * sxx - sx * sx) * 1000000.0 + 0.5) AS BIGINT)
        |  END AS slope_e6
        |FROM zag""".stripMargin,
    "doc_blocklist" -> blocklistOracle,
    "corpus_curate3" -> curate3Oracle,
    "curation_funnel" -> curationFunnelOracle,
    "doc_token_freq" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |dc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |g AS (SELECT doc_id, tf, CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS gtf FROM dc)
        |SELECT doc_id,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(min(gtf) AS BIGINT) AS min_tf,
        |  CAST(sum(tf * gtf) AS BIGINT) AS sum_tf,
        |  CAST(floor(CAST(sum(tf * gtf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE)
        |             * 1000000.0 + 0.5) AS BIGINT) AS mean_tf_e6
        |FROM g GROUP BY doc_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | round(avg(l_extendedprice), 6) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "enrich_events" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value,
        | c.c_name, c.c_mktsegment, n.n_name,
        | CAST(e.ts AS DATE) AS date,
        | CAST(EXTRACT(hour FROM e.ts) AS INTEGER) AS hour
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,

    "genre_kpis" ->
      """WITH e AS (
        |  SELECT ev.event_id, ev.event_type, CAST(ev.ts AS DATE) AS date, ev.value, c.c_mktsegment
        |  FROM events ev LEFT JOIN customer c ON ev.user_id = c.c_custkey),
        |base AS (
        |  SELECT event_type, date, count(event_id) AS listen_count,
        |         round(avg(value), 6) AS avg_value
        |  FROM e GROUP BY event_type, date),
        |m AS (
        |  SELECT event_type, date, c_mktsegment AS top_segment FROM (
        |    SELECT event_type, date, c_mktsegment,
        |           row_number() OVER (PARTITION BY event_type, date
        |                              ORDER BY count(*) DESC, c_mktsegment ASC) AS rn
        |    FROM e WHERE c_mktsegment IS NOT NULL
        |    GROUP BY event_type, date, c_mktsegment) WHERE rn = 1)
        |SELECT b.event_type, b.date, b.listen_count, b.avg_value, m.top_segment
        |FROM base b LEFT JOIN m ON b.event_type = m.event_type AND b.date = m.date""".stripMargin,

    "hourly_kpis" ->
      """WITH e AS (
        |  SELECT CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour, user_id, event_type, props
        |  FROM events),
        |c AS (SELECT hour, event_type, count(*) AS cnt FROM e
        |      WHERE event_type IS NOT NULL GROUP BY hour, event_type),
        |r AS (SELECT hour, event_type,
        |             row_number() OVER (PARTITION BY hour ORDER BY cnt DESC, event_type ASC) AS rn
        |      FROM c),
        |t AS (SELECT hour, string_agg(event_type, ',' ORDER BY rn) AS top_types
        |      FROM r WHERE rn <= 3 GROUP BY hour),
        |b AS (SELECT hour, count(DISTINCT user_id) AS unique_listeners,
        |             round(CAST(count(DISTINCT props) AS DOUBLE) / count(*), 6) AS diversity
        |      FROM e GROUP BY hour)
        |SELECT b.hour, b.unique_listeners, t.top_types, b.diversity
        |FROM b LEFT JOIN t ON b.hour = t.hour""".stripMargin,

    "null_audit" ->
      """SELECT count(*) AS n_rows,
        | count(CASE WHEN user_id IS NULL THEN 1 END) AS null_user_id,
        | count(CASE WHEN event_type IS NULL THEN 1 END) AS null_event_type,
        | count(CASE WHEN value IS NULL THEN 1 END) AS null_value
        |FROM events""".stripMargin,

    "events_pareto" ->
      """WITH u AS (SELECT event_type, user_id, count(*) AS n_events
        |           FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, n_events,
        |        CAST(row_number() OVER (PARTITION BY event_type
        |          ORDER BY n_events DESC, user_id ASC) AS INTEGER) AS user_rank,
        |        CAST(sum(n_events) OVER (PARTITION BY event_type
        |          ORDER BY n_events DESC, user_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
        |        CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |      FROM u)
        |SELECT event_type, user_id, n_events, user_rank, cum_events,
        |  CAST(cum_events * 1000000 // tot AS BIGINT) AS cum_share_e6
        |FROM r WHERE user_rank <= 20""".stripMargin,

    "orders_yoy" ->
      """WITH y AS (SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT o_orderpriority, yr, revenue_cents,
        |  CASE WHEN yr - lag(yr) OVER (PARTITION BY o_orderpriority ORDER BY yr) = 1
        |       THEN lag(revenue_cents) OVER (PARTITION BY o_orderpriority ORDER BY yr)
        |  END AS prev_cents
        |  FROM y)
        |SELECT o_orderpriority, yr, revenue_cents, prev_cents,
        |  revenue_cents - prev_cents AS delta_cents
        |FROM l""".stripMargin,

    "revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)""".stripMargin,

    "orders_topn" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "sql_lateral_topk" ->
      """SELECT n.n_name, t.c_name, t.bal_cents
        |FROM nation n,
        |LATERAL (
        |  SELECT c_name, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name ASC LIMIT 2
        |) t""".stripMargin,

    "sql_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 450000)""".stripMargin,

    "activity_full_outer" ->
      """SELECT COALESCE(e.user_id, o.o_custkey) AS party_id,
        |       e.n_events, o.n_orders
        |FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) e
        |FULL OUTER JOIN
        |     (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1) o
        |  ON e.user_id = o.o_custkey""".stripMargin,

    "events_calendar" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INTEGER) AS y, CAST(quarter(ts) AS INTEGER) AS q,
        |  CAST(month(ts) AS INTEGER) AS mo, CAST(day(ts) AS INTEGER) AS d,
        |  CAST(hour(ts) AS INTEGER) AS h, CAST(minute(ts) AS INTEGER) AS mi,
        |  CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |  CAST(dayofyear(ts) AS INTEGER) AS doy
        |FROM events""".stripMargin,

    "null_safe_join" ->
      """WITH ev AS (SELECT nullif(event_type, 'click') AS k, value FROM events),
        |t AS (SELECT k, count(*) AS n_k FROM ev GROUP BY k)
        |SELECT t.k AS kind, count(*) AS n_rows, max(t.n_k) AS n_k
        |FROM ev JOIN t ON ev.k IS NOT DISTINCT FROM t.k
        |GROUP BY t.k""".stripMargin,

    "orders_top100" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "orders_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice, 1) OVER w AS prev_price,
        |       lead(o_totalprice, 1) OVER w AS next_price,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)""".stripMargin,

    // session_window merges events strictly closer than the gap, at MICROS
    // precision (>= gap starts a new session); end = last event + gap
    "session_windows" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (
        |  SELECT user_id, ts,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM y)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
        |       CAST(max(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events
        |FROM z GROUP BY user_id, sid""".stripMargin,

    "sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM x)
        |SELECT user_id, event_id,
        |       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |FROM y""".stripMargin,

    "parts_filter" ->
      """SELECT p_partkey, p_name, p_size, p_retailprice FROM part
        |WHERE p_size >= 25 AND p_retailprice > 950.0""".stripMargin,

    "skew_agg" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",

    // DuckDB's NATIVE ASOF JOIN is the oracle — a fully independent
    // implementation of the same point-in-time semantics as AsOf.join's
    // union+window formulation
    "pit_features" ->
      """WITH f AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |         CAST(count(*) OVER wprev AS BIGINT) AS n_prior_orders,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER wprev
        |              AS BIGINT) AS prior_revenue_cents
        |  FROM orders
        |  WINDOW wprev AS (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |ev AS (SELECT user_id, ts, arg_max(value, event_id) AS value
        |       FROM events GROUP BY user_id, ts)
        |SELECT f.o_orderkey, f.n_prior_orders, f.prior_revenue_cents,
        |       ev.value AS last_event_value
        |FROM f ASOF LEFT JOIN ev
        |  ON f.o_custkey = ev.user_id AND ev.ts <= CAST(f.o_orderdate AS TIMESTAMP)""".stripMargin,

    "asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
        |         arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND r.o_orderdate <= e.ts""".stripMargin,

    "dedup_near_keepers" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |p AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT i.id_a, i.id_b,
        |           CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS j
        |    FROM inter i
        |    JOIN sizes sa ON i.id_a = sa.doc_id
        |    JOIN sizes sb ON i.id_b = sb.doc_id)
        |  WHERE round(j, 6) >= 0.2),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, r) AS (
        |  SELECT id, id FROM v
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.id),
        |losers AS (
        |  SELECT id FROM reach GROUP BY id HAVING id != min(r))
        |SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin,

    // an independent implementation of the same fixpoint: DuckDB's
    // recursive CTE reaches every vertex from every vertex, min labels
    "dedup_clusters" -> dedupClustersOracle,

    // the dedup_clusters fixpoint + the train_split bucket rule, keyed on
    // the component representative instead of the doc itself
    "split_leakage_safe" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |p AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT i.id_a, i.id_b,
        |           CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS j
        |    FROM inter i
        |    JOIN sizes sa ON i.id_a = sa.doc_id
        |    JOIN sizes sb ON i.id_b = sb.doc_id)
        |  WHERE round(j, 6) >= 0.2),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, r) AS (
        |  SELECT id, id FROM v
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.id),
        |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
        |rp AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS rep
        |       FROM documents d LEFT JOIN cl ON d.doc_id = cl.id),
        |b AS (SELECT doc_id, rep,
        |        CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 6)) AS BIGINT)
        |          % 10000 AS bucket
        |      FROM rp)
        |SELECT doc_id, rep,
        |       CASE WHEN bucket < 8000 THEN 'train'
        |            WHEN bucket < 9000 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b""".stripMargin,

    "doc_deboilerplate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |             array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk
        |      FROM t, UNNEST(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS r(i)),
        |hot AS (SELECT chunk FROM c GROUP BY chunk
        |        HAVING count(DISTINCT doc_id) > 2),
        |kept AS (SELECT * FROM c WHERE chunk NOT IN (SELECT chunk FROM hot))
        |SELECT doc_id, string_agg(chunk, ' ' ORDER BY pos) AS clean_text
        |FROM kept GROUP BY doc_id""".stripMargin,

    // simple character-class + quantifier regexes only — the subset where
    // Java (Spark) and RE2 (DuckDB) semantics coincide
    "doc_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text),
        |   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |FROM documents""".stripMargin,

    // percent_rank emitted as quantized integers; ORDER BY includes the
    // unique key so both engines rank identical total orders
    "orders_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |                ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS quartile,
        | CAST(floor(percent_rank() OVER (PARTITION BY o_orderpriority
        |                ORDER BY o_totalprice ASC, o_orderkey ASC)
        |            * 1000000.0 + 0.5) AS BIGINT) AS pct_rank_e6
        |FROM orders""".stripMargin,

    "orders_histogram" ->
      """SELECT CAST(least(19, greatest(0, floor(o_totalprice / 30000.0))) AS BIGINT) AS bin,
        | count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,

    "profile_orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS "column",
           | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           | count(DISTINCT $c) AS n_distinct,
           | CAST(min($c) AS VARCHAR) AS min_value,
           | CAST(max($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin)
      .mkString("\nUNION ALL\n"),

    // the mask-shift Morton construction replayed as sequential CTEs;
    // bucketize is pure IEEE arithmetic on identical literals → exact
    "zorder_keys" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CAST(least(1023, greatest(0,
        |      floor((o_totalprice - 0.0) / 600000.0 * 1023))) AS BIGINT) AS x,
        |    CAST(least(1023, greatest(0,
        |      floor((o_custkey - 0.0) / 20000.0 * 1023))) AS BIGINT) AS y
        |  FROM orders),
        |s1 AS (SELECT o_orderkey, (x | (x << 16)) & 281470681808895 AS x,
        |                          (y | (y << 16)) & 281470681808895 AS y FROM b),
        |s2 AS (SELECT o_orderkey, (x | (x << 8)) & 71777214294589695 AS x,
        |                          (y | (y << 8)) & 71777214294589695 AS y FROM s1),
        |s3 AS (SELECT o_orderkey, (x | (x << 4)) & 1085102592571150095 AS x,
        |                          (y | (y << 4)) & 1085102592571150095 AS y FROM s2),
        |s4 AS (SELECT o_orderkey, (x | (x << 2)) & 3689348814741910323 AS x,
        |                          (y | (y << 2)) & 3689348814741910323 AS y FROM s3),
        |s5 AS (SELECT o_orderkey, (x | (x << 1)) & 6148914691236517205 AS x,
        |                          (y | (y << 1)) & 6148914691236517205 AS y FROM s4)
        |SELECT o_orderkey, x | (y << 1) AS zkey FROM s5""".stripMargin,

    "schema_evolution_union" ->
      """SELECT event_id, user_id, event_type, NULL AS value
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id % 2 = 1""".stripMargin,

    "cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |         'cust-' || o_custkey AS c_name,
        |         o_totalprice AS c_acctbal,
        |         o_orderkey AS version,
        |         CASE WHEN o_orderstatus = 'F' THEN 'd' ELSE 'u' END AS op,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderkey DESC) AS rn
        |  FROM orders),
        |latest AS (SELECT * FROM ch WHERE rn = 1)
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM latest WHERE op = 'u'""".stripMargin,

    "scd2_history" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |         'cust-' || o_custkey AS c_name,
        |         o_totalprice AS c_acctbal,
        |         o_orderkey AS version,
        |         CASE WHEN o_orderstatus = 'F' THEN 'd' ELSE 'u' END AS op,
        |         lead(o_orderkey) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT c_custkey, c_name, c_acctbal, version AS valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM ch WHERE op = 'u'""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > DATE '1995-03-15'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        | count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "doc_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |         CASE WHEN n <= 50 THEN 1 ELSE (n - 50 + 39) // 40 + 1 END AS n_chunks
        |  FROM t),
        |e AS (
        |  SELECT t.doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |         array_to_string(t.ws[(i*40 + 1):(i*40 + 50)], ' ') AS chunk
        |  FROM t JOIN c ON t.doc_id = c.doc_id, UNNEST(range(0, c.n_chunks)) AS r(i))
        |SELECT doc_id, chunk_idx,
        |       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
        |       md5(chunk) AS chunk_md5
        |FROM e""".stripMargin,

    "type_cooccurrence" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS hour, event_type
        |  FROM events)
        |SELECT a.event_type AS type_a, b2.event_type AS type_b,
        |       CAST(count(*) AS BIGINT) AS n_baskets
        |FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.hour = b2.hour
        |                   AND a.event_type < b2.event_type
        |GROUP BY 1, 2""".stripMargin,

    "order_gaps" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate,
        |         lag(o_orderdate) OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders)
        |SELECT CAST(quantile_cont(date_diff('day', prev, o_orderdate), 0.5) * 4
        |            AS BIGINT) AS median_gap_x4,
        |       CAST(count(CASE WHEN prev IS NOT NULL THEN 1 END) AS BIGINT) AS n_gaps
        |FROM o""".stripMargin,

    "value_outliers" ->
      """WITH cents AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |  WHERE value IS NOT NULL),
        |stats AS (
        |  SELECT event_type,
        |         quantile_cont(cents, 0.25) AS q1,
        |         quantile_cont(cents, 0.75) AS q3
        |  FROM cents GROUP BY 1)
        |SELECT c.event_type,
        |       CAST(count(CASE WHEN c.cents > s.q3 + 1.5 * (s.q3 - s.q1)
        |                       THEN 1 END) AS BIGINT) AS n_high,
        |       CAST(count(CASE WHEN c.cents < s.q1 - 1.5 * (s.q3 - s.q1)
        |                       THEN 1 END) AS BIGINT) AS n_low,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM cents c JOIN stats s ON c.event_type = s.event_type
        |GROUP BY 1""".stripMargin,

    "dq_report" ->
      """WITH dr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_date
        |  FROM orders),
        |dd AS (SELECT CAST(count(*) AS BIGINT) AS dup_pk FROM (
        |         SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)),
        |dx AS (SELECT CAST(count(*) AS BIGINT) AS orphan_custkey FROM orders o
        |       WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                         WHERE c.c_custkey = o.o_custkey))
        |SELECT 'n_rows' AS "check", n_rows AS metric, n_rows > 0 AS passed FROM dr
        |UNION ALL SELECT 'null_custkey', null_custkey, null_custkey = 0 FROM dr
        |UNION ALL SELECT 'nonpos_price', nonpos_price, nonpos_price = 0 FROM dr
        |UNION ALL SELECT 'null_date', null_date, null_date = 0 FROM dr
        |UNION ALL SELECT 'dup_pk', dup_pk, dup_pk = 0 FROM dd
        |UNION ALL SELECT 'orphan_custkey', orphan_custkey, orphan_custkey = 0 FROM dx""".stripMargin,

    "benford_audit" -> {
      val cases = BenfordE6.toSeq.sortBy(_._1)
        .map { case (d, e) => s"WHEN digit = '$d' THEN $e" }.mkString(" ")
      s"""WITH bd AS (
        |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |bc AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM bd GROUP BY 1),
        |bt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM bc)
        |SELECT digit, n,
        |  CAST(floor(n * 1000000 / bt.total + 0.5) AS BIGINT) AS freq_e6,
        |  CAST(CASE $cases END AS BIGINT) AS benford_e6,
        |  CAST(abs(CAST(floor(n * 1000000 / bt.total + 0.5) AS BIGINT) -
        |           (CASE $cases END)) AS BIGINT) AS dev_e6
        |FROM bc, bt""".stripMargin
    },

    "daily_trend_ols" ->
      """WITH od AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |            FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |ox AS (SELECT event_type, y,
        |         CAST(day - min(day) OVER (PARTITION BY event_type) AS BIGINT) AS x
        |       FROM od),
        |oa AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |       FROM ox GROUP BY 1)
        |SELECT event_type, n_days, sy,
        |  CASE WHEN n_days * sxx - sx * sx <> 0
        |       THEN CAST(floor((n_days * sxy - sx * sy) * 1.0 /
        |                       (n_days * sxx - sx * sx) * 1000000.0 + 0.5)
        |                 AS BIGINT)
        |  END AS slope_cents_per_day_e6
        |FROM oa""".stripMargin,

    "value_mad_outliers" ->
      """WITH mcents AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
        |  WHERE value IS NOT NULL),
        |mmed AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
        |         FROM mcents GROUP BY 1),
        |mdev AS (SELECT c.event_type, abs(c.cents - m.med) AS absdev, m.med
        |         FROM mcents c JOIN mmed m ON c.event_type = m.event_type),
        |mmad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        |         FROM mdev GROUP BY 1)
        |SELECT d.event_type, any_value(d.med) AS med, any_value(a.mad) AS mad,
        |       CAST(count(CASE WHEN d.absdev > 3.0 * 1.4826 * a.mad THEN 1 END)
        |            AS BIGINT) AS n_outliers,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM mdev d JOIN mmad a ON d.event_type = a.event_type
        |GROUP BY 1""".stripMargin,

    "user_type_profile" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |       string_agg(event_type || ':' || n, ',' ORDER BY event_type) AS type_profile
        |FROM c GROUP BY 1""".stripMargin,

    "peak_concurrency" ->
      """WITH pts AS (
        |  SELECT ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT ts + INTERVAL 30 MINUTE AS t, -1 AS delta FROM events),
        |sweep AS (
        |  SELECT sum(delta) OVER (ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM pts)
        |SELECT CAST(max(live) AS BIGINT) AS peak_concurrent FROM sweep""".stripMargin,

    "event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "fk_orphans_report" ->
      """SELECT 'orders.custkey->customer' AS fk_edge,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(CASE WHEN c_custkey IS NULL AND o_custkey IS NOT NULL
        |                  THEN 1 END) AS BIGINT) AS n_orphans,
        |  CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) AS n_null_fk
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'lineitem.orderkey->orders',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN o_orderkey IS NULL AND l_orderkey IS NOT NULL
        |                  THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'lineitem.partkey->part',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN p_partkey IS NULL AND l_partkey IS NOT NULL
        |                  THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN l_partkey IS NULL THEN 1 END) AS BIGINT)
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |UNION ALL
        |SELECT 'customer.nationkey->nation',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(CASE WHEN n_nationkey IS NULL AND c_nationkey IS NOT NULL
        |                  THEN 1 END) AS BIGINT),
        |  CAST(count(CASE WHEN c_nationkey IS NULL THEN 1 END) AS BIGINT)
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin,

    "pk_uniqueness_audit" ->
      """WITH a AS (
        |  SELECT 'orders' AS t, o_orderkey AS k FROM orders UNION ALL
        |  SELECT 'customer', c_custkey FROM customer UNION ALL
        |  SELECT 'part', p_partkey FROM part UNION ALL
        |  SELECT 'supplier', s_suppkey FROM supplier UNION ALL
        |  SELECT 'events', event_id FROM events UNION ALL
        |  SELECT 'documents', doc_id FROM documents),
        |g AS (SELECT t, k, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1, 2)
        |SELECT t AS table_name, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS n_dup_keys,
        |  CAST(COALESCE(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
        |    AS n_rows_in_dups
        |FROM g GROUP BY 1""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
        |                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |            FROM lineitem),
        |st AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS qsum,
        |              CAST(count(*) AS BIGINT) AS qcnt
        |       FROM li GROUP BY 1)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(cents) AS BIGINT) AS small_qty_cents
        |FROM li JOIN part ON l_partkey = p_partkey
        |        JOIN st USING (l_partkey)
        |WHERE 5 * qty * qcnt < qsum
        |GROUP BY 1""".stripMargin,

    "q16_supplier_diversity" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |            WHERE l_suppkey NOT IN
        |              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 20
        |GROUP BY 1, 2""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |          CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS revenue_e4
        |FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)) AS e4,
        |         n2.n_name AS supp_nation
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       JOIN supplier ON l_suppkey = s_suppkey
        |       JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_custkey IN (SELECT c_custkey
        |                      FROM customer JOIN nation ON c_nationkey = n_nationkey
        |                           JOIN region ON n_regionkey = r_regionkey
        |                      WHERE r_name = 'ASIA'))
        |SELECT o_year,
        |  CAST(COALESCE(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 END), 0)
        |       AS BIGINT) AS nation_e4,
        |  CAST(sum(e4) AS BIGINT) AS total_e4,
        |  CAST(CAST(COALESCE(sum(CASE WHEN supp_nation = 'NATION_3' THEN e4 END), 0)
        |            AS HUGEINT) * 1000000
        |       // nullif(CAST(sum(e4) AS HUGEINT), 0) AS BIGINT) AS mkt_share_e6
        |FROM vol GROUP BY 1""".stripMargin,

    "q10_returned_items" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |           AS revenue_e4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, revenue_e4,
        |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |         JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_late_by_priority" ->
      """SELECT l_returnflag,
        | CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                 THEN 1 END) AS BIGINT) AS high_line_count,
        | CAST(count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                 THEN 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1""".stripMargin,

    "q13_custdist" ->
      """WITH oc AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM oc GROUP BY 1""".stripMargin,

    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)) AS e4,
        |         p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT
        |  CAST(COALESCE(sum(CASE WHEN p_type = 'PROMO' THEN e4 END), 0) AS BIGINT)
        |    AS promo_e4,
        |  CAST(sum(e4) AS BIGINT) AS total_e4,
        |  CAST(CAST(COALESCE(sum(CASE WHEN p_type = 'PROMO' THEN e4 END), 0)
        |            AS HUGEINT) * 1000000
        |       // nullif(CAST(sum(e4) AS HUGEINT), 0) AS BIGINT) AS promo_share_e6
        |FROM j""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |           AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)""".stripMargin,

    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |           AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS BIGINT)) > 160)
        |SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS o_date,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |       sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |         JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |     (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |   AS revenue_e4,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |        AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,

    "q22_idle_customers" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_mktsegment,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer),
        |st AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS pos_sum,
        |              CAST(count(*) AS BIGINT) AS pos_n
        |       FROM cust WHERE bal_cents > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM cust, st
        |WHERE bal_cents * pos_n > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

  )
}
