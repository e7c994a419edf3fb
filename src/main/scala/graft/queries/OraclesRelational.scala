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
  * 13.7k-line registry into per-domain files): TPC-H, relational audits, events and multimodal.
  * Entries are verbatim from the original map; SparkEntry folds every
  * fragment back into one registry, so names/oracles stay 1:1. */
private[graft] object OraclesRelational {
  def m: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      s"""WITH $partsuppCte,
        |eursup AS (
        |  SELECT s_suppkey, s_name, n_name,
        |         CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        |  FROM supplier, nation, region
        |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE'),
        |cand AS (
        |  SELECT ps_partkey AS p_partkey, p_brand, s_name, n_name,
        |         acctbal_cents, ps_supplycost_cents
        |  FROM partsupp, eursup, part
        |  WHERE ps_suppkey = s_suppkey AND ps_partkey = p_partkey
        |    AND p_size <= 5 AND p_type = 'LARGE'),
        |mc AS (SELECT p_partkey AS mc_partkey,
        |              min(ps_supplycost_cents) AS min_cost
        |       FROM cand GROUP BY 1)
        |SELECT p_partkey, p_brand, s_name, n_name, acctbal_cents,
        |       ps_supplycost_cents AS supplycost_cents
        |FROM cand JOIN mc
        |  ON p_partkey = mc_partkey AND ps_supplycost_cents = min_cost""".stripMargin,

    "q9_nation_profit" ->
      s"""WITH $partsuppCte
        |SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT)) -
        |           ps_supplycost_cents * CAST(round(l_quantity) AS BIGINT) * 100)
        |    AS BIGINT) AS profit_e4
        |FROM lineitem, part, partsupp, supplier, nation, orders
        |WHERE l_partkey = p_partkey AND p_name LIKE '%bolt%'
        |  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $partsuppCte,
        |v AS (SELECT ps_partkey,
        |             CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
        |               AS value_cents
        |      FROM partsupp, supplier, nation
        |      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |        AND n_name = 'NATION_3'
        |      GROUP BY 1),
        |t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
        |             CAST(count(*) AS BIGINT) AS n_parts FROM v)
        |SELECT ps_partkey, value_cents FROM v, t
        |WHERE value_cents > total_cents // n_parts * 2""".stripMargin,

    "q20_stocked_suppliers" ->
      s"""WITH $partsuppCte,
        |qty AS (SELECT l_partkey, l_suppkey,
        |               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |                 AS qty_sum
        |        FROM lineitem
        |        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |          AND l_shipdate < TIMESTAMP '1997-01-01'
        |        GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey
        |  AND EXISTS (
        |    SELECT 1 FROM partsupp, part, qty
        |    WHERE ps_partkey = p_partkey AND p_name LIKE 'small gi%'
        |      AND ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |      AND ps_suppkey = s_suppkey
        |      AND ps_availqty > qty_sum * 100)""".stripMargin,

    "kmeans_fit" -> kmeansOracle,
    "kmeans_k_sweep" -> kmeansSweepOracle,
    "attribution_markov" -> markovOracle,
    "target_encode_oof" ->
      s"""WITH tef AS (SELECT o_orderpriority AS cat,
        |                CAST(o_orderkey % $OofFolds AS INTEGER) AS fold,
        |                CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |             FROM orders),
        |tec AS (SELECT cat, fold, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
        |        FROM tef GROUP BY 1, 2)
        |SELECT cat, fold, n AS n_in_fold,
        |  CAST((sum(sy) OVER (PARTITION BY cat) - sy) * 1000000
        |       // nullif(sum(n) OVER (PARTITION BY cat) - n, 0) AS BIGINT) AS oof_mean_e6
        |FROM tec""".stripMargin,
    "transition_entropy" ->
      """WITH tec AS (
        |  SELECT event_type AS cur, next_type AS nxt, CAST(count(*) AS BIGINT) AS nij
        |  FROM (SELECT event_type,
        |          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |        FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL)
        |  WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tem AS (SELECT nij,
        |          CAST(sum(nij) OVER (PARTITION BY cur) AS BIGINT) AS ni,
        |          CAST(sum(nij) OVER () AS BIGINT) AS nn
        |        FROM tec)
        |SELECT CAST(max(nn) AS BIGINT) AS n_transitions,
        |  CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(floor(CAST(sum(nij * (CAST(floor(ln(CAST(ni AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |                           - CAST(floor(ln(CAST(nij AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT))) AS DOUBLE)
        |             / max(nn) + 0.5) AS BIGINT) AS h_cond_e6,
        |  CAST(floor(ln(CAST(max(nn) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    - CAST(floor(CAST(sum(nij * CAST(floor(ln(CAST(ni AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |               / max(nn) + 0.5) AS BIGINT) AS h_cur_e6
        |FROM tem""".stripMargin,
    "stratified_ate" ->
      """WITH sac AS (
        |  SELECT event_type AS stratum, CAST(user_id % 2 AS BIGINT) AS treat,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |sam AS (SELECT stratum, treat, n,
        |          CAST(CAST(sc AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_e6
        |        FROM sac),
        |sap AS (SELECT stratum,
        |          sum(CASE WHEN treat = 1 THEN n END) AS n_t,
        |          sum(CASE WHEN treat = 0 THEN n END) AS n_c,
        |          max(CASE WHEN treat = 1 THEN mean_e6 END) AS mt,
        |          max(CASE WHEN treat = 0 THEN mean_e6 END) AS mc
        |        FROM sam GROUP BY 1)
        |SELECT CAST(sum(n_t) AS BIGINT) AS n_treat, CAST(sum(n_c) AS BIGINT) AS n_ctrl,
        |  CAST(floor(CAST(sum(CAST(n_t + n_c AS HUGEINT) * (mt - mc)) AS DOUBLE)
        |             / sum(n_t + n_c) + 0.5) AS BIGINT) AS ate_cents_e6
        |FROM sap WHERE n_t IS NOT NULL AND n_c IS NOT NULL""".stripMargin,
    "bandit_ucb" ->
      """WITH bua AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |but AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM bua),
        |bum AS (SELECT arm, n, nn,
        |          CAST(CAST(pos AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_e6
        |        FROM bua CROSS JOIN but)
        |SELECT arm, n, mean_e6,
        |  mean_e6 + CAST(floor(sqrt(2.0 * ln(CAST(nn AS DOUBLE)) / CAST(n AS DOUBLE))
        |                       * 1000000.0 + 0.5) AS BIGINT) AS ucb_e6
        |FROM bum""".stripMargin,
    "dup_graph_harmonic" -> harmonicOracle,
    "logrank_churn" ->
      s"""WITH lro AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
        |lrb AS (SELECT max(d) AS maxd FROM lro),
        |lrl AS (SELECT o_custkey % 2 AS g,
        |          CAST(max(d) - min(d) AS BIGINT) AS t,
        |          CASE WHEN (SELECT maxd FROM lrb) - max(d) > $KmCensorGapDays
        |               THEN 1 ELSE 0 END AS dead
        |        FROM lro GROUP BY o_custkey),
        |lrt AS (SELECT t,
        |          CAST(sum(CASE WHEN g = 1 THEN dead ELSE 0 END) AS BIGINT) AS d1,
        |          CAST(sum(dead) AS BIGINT) AS d_all,
        |          CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |          CAST(count(*) AS BIGINT) AS m_all
        |        FROM lrl GROUP BY 1),
        |lrk AS (SELECT t, d1, d_all,
        |          CAST(sum(m1) OVER (ORDER BY t DESC) AS BIGINT) AS n1,
        |          CAST(sum(m_all) OVER (ORDER BY t DESC) AS BIGINT) AS n
        |        FROM lrt),
        |lrv AS (SELECT d1,
        |          CAST(CAST(d_all AS HUGEINT) * n1 * 1000000 // n AS BIGINT) AS e1t,
        |          CAST(CAST(d_all AS HUGEINT) * n1 * (n - n1) * (n - d_all) * 1000000
        |               // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT) AS vt
        |        FROM lrk WHERE d_all > 0 AND n > 1),
        |lra AS (SELECT CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(e1t) AS BIGINT) AS e1_e6,
        |          CAST(sum(vt) AS BIGINT) AS v_e6 FROM lrv)
        |SELECT o1, e1_e6, v_e6,
        |  CASE WHEN v_e6 > 0 THEN CAST(floor(
        |    CAST(o1 * 1000000 - e1_e6 AS DOUBLE) * CAST(o1 * 1000000 - e1_e6 AS DOUBLE)
        |    / CAST(v_e6 AS DOUBLE) + 0.5) AS BIGINT) END AS chi2_e6
        |FROM lra""".stripMargin,
    "embedding_outliers" ->
      """WITH eoflat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |         CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
        |  FROM embeddings),
        |eom AS (SELECT pos, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS sq,
        |          CAST(sum(q * q) AS BIGINT) AS sq2 FROM eoflat GROUP BY 1),
        |eov AS (SELECT pos, n, sq,
        |          CAST(n AS HUGEINT) * sq2 - CAST(sq AS HUGEINT) * sq AS v FROM eom),
        |eot AS (SELECT vec_id,
        |          CAST((CAST(q AS HUGEINT) * n - sq) * (CAST(q AS HUGEINT) * n - sq) * 1000000
        |               // nullif(v, 0) AS BIGINT) AS t
        |        FROM eoflat JOIN eov USING (pos))
        |SELECT vec_id, CAST(sum(t) AS BIGINT) AS z2_sum_e6
        |FROM eot GROUP BY 1 ORDER BY z2_sum_e6 DESC, vec_id LIMIT 20""".stripMargin,
    "ab_mde" ->
      """WITH abm AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT) *
        |                  CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc2
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(floor(2.801585 * sqrt(CAST(CAST(n AS HUGEINT) * sc2 - CAST(sc AS HUGEINT) * sc AS DOUBLE))
        |             * sqrt(2.0 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |    AS mde_cents_e6
        |FROM abm""".stripMargin,
    "neyman_allocation" ->
      s"""WITH nst AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT) *
        |                  CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc2
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1),
        |nw AS (SELECT event_type, n,
        |         sqrt(CAST(CAST(n AS HUGEINT) * sc2 - CAST(sc AS HUGEINT) * sc AS DOUBLE)) AS w
        |       FROM nst),
        |nsh AS (SELECT event_type, n, w,
        |          w * ${NeymanBudget.toDouble} / sum(w) OVER () AS exact
        |        FROM nw),
        |na AS (SELECT event_type, n, exact,
        |         CAST(floor(exact) AS BIGINT) AS a0,
        |         exact - floor(exact) AS rem
        |       FROM nsh),
        |nl AS (SELECT event_type, n, a0, rem,
        |         $NeymanBudget - CAST(sum(a0) OVER () AS BIGINT) AS leftn,
        |         row_number() OVER (ORDER BY rem DESC, event_type) AS rk
        |       FROM na)
        |SELECT event_type, n AS n_rows,
        |  CAST(a0 + CASE WHEN rk <= leftn THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM nl""".stripMargin,
    "term_pmi_pairs" ->
      s"""WITH ptok AS (SELECT string_split(text, ' ') AS ws FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |ppz AS (SELECT UNNEST(list_zip(ws[1:-2], ws[2:-1])) AS z FROM ptok),
        |ppair AS (SELECT z[1] AS l, z[2] AS r, CAST(count(*) AS BIGINT) AS c_lr
        |          FROM ppz GROUP BY 1, 2),
        |plm AS (SELECT l, CAST(sum(c_lr) AS BIGINT) AS c_l FROM ppair GROUP BY 1),
        |prm AS (SELECT r, CAST(sum(c_lr) AS BIGINT) AS c_r FROM ppair GROUP BY 1),
        |ptot AS (SELECT CAST(sum(c_lr) AS BIGINT) AS np FROM ppair)
        |SELECT l, r, c_lr,
        |  CAST(floor(ln(CAST(c_lr AS DOUBLE) * CAST(np AS DOUBLE) /
        |                (CAST(c_l AS DOUBLE) * CAST(c_r AS DOUBLE)))
        |             * 1000000.0 + 0.5) AS BIGINT) AS pmi_e6
        |FROM ppair JOIN plm USING (l) JOIN prm USING (r) CROSS JOIN ptot
        |WHERE c_lr >= $PmiMinCount
        |ORDER BY pmi_e6 DESC, l, r LIMIT $PmiTopK""".stripMargin,
    "trigram_search" ->
      s"""SELECT doc_id, lang, source FROM documents
        |WHERE instr(text, '$TrigramPattern') > 0""".stripMargin,
    "sql_recursive_bom" ->
      s"""WITH RECURSIVE bom AS (
        |  SELECT p_partkey AS root, p_partkey AS pk, 0 AS depth,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part WHERE p_partkey BETWEEN 1 AND 8
        |  UNION ALL
        |  SELECT b.root, p.p_partkey, b.depth + 1,
        |         CAST(round(p.p_retailprice * 100) AS BIGINT)
        |  FROM bom b JOIN part p ON p.p_partkey // 2 = b.pk
        |  WHERE b.depth < $BomMaxDepth)
        |SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(max(depth) AS INTEGER) AS max_depth,
        |       CAST(sum(cents) AS BIGINT) AS subtree_value_cents
        |FROM bom GROUP BY root""".stripMargin,
    "source_token_kl" ->
      """WITH kst AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS nst
        |  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents)
        |  WHERE len(term) > 0 GROUP BY 1, 2),
        |ktm AS (SELECT term, CAST(sum(nst) AS BIGINT) AS nt FROM kst GROUP BY 1),
        |ksm AS (SELECT source, CAST(sum(nst) AS BIGINT) AS ns FROM kst GROUP BY 1),
        |ktot AS (SELECT CAST(sum(ns) AS BIGINT) AS nn FROM ksm)
        |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(floor(CAST(sum(nst * CAST(floor(ln(CAST(nst AS DOUBLE) * CAST(nn AS DOUBLE) /
        |                  (CAST(ns AS DOUBLE) * CAST(nt AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |             / max(ns) + 0.5) AS BIGINT) AS kl_vs_corpus_e6
        |FROM kst JOIN ktm USING (term) JOIN ksm USING (source) CROSS JOIN ktot
        |GROUP BY source""".stripMargin,
    "value_lift_deciles" ->
      """WITH lsc AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |                    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |             FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |lg AS (SELECT cents, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS npos
        |       FROM lsc GROUP BY 1),
        |lc AS (SELECT cents, n, npos,
        |         CAST(sum(n) OVER (ORDER BY cents DESC) AS BIGINT) AS cum_incl FROM lg),
        |lt AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(npos) AS BIGINT) AS np FROM lg),
        |la AS (SELECT CAST((cum_incl - n) * 10 // nn AS INTEGER) AS decile, n, npos, nn, np
        |       FROM lc CROSS JOIN lt)
        |SELECT decile, CAST(sum(n) AS BIGINT) AS n_rows, CAST(sum(npos) AS BIGINT) AS n_pos,
        |  CAST(CAST(sum(npos) AS HUGEINT) * max(nn) * 1000000
        |       // nullif(sum(n) * max(np), 0) AS BIGINT) AS lift_e6
        |FROM la GROUP BY 1""".stripMargin,
    "spend_theil_index" ->
      """WITH ths AS (SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |       FROM orders GROUP BY 1 HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT)) > 0),
        |tht AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS xx FROM ths)
        |SELECT CAST(max(n) AS BIGINT) AS n_customers, CAST(max(xx) AS BIGINT) AS total_cents,
        |  CAST(sum(CAST(x AS HUGEINT) *
        |           CAST(floor(ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(xx AS DOUBLE))
        |                      * 1000000.0 + 0.5) AS BIGINT))
        |       // max(xx) AS BIGINT) AS theil_e6
        |FROM ths CROSS JOIN tht""".stripMargin,
    "conversion_wilson_ci" ->
      """WITH wia AS (
        |  SELECT CAST(hour(ts) AS BIGINT) AS arm, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |wic AS (SELECT arm, n, pos,
        |          CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |          1.959964 * 1.959964 AS z2, CAST(n AS DOUBLE) AS nd
        |        FROM wia),
        |wix AS (SELECT arm, n, pos,
        |          (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd) AS center,
        |          1.959964 * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
        |            / (1.0 + z2 / nd) AS hw
        |        FROM wic)
        |SELECT arm, n, pos,
        |  CAST(floor((center - hw) * 1000000.0 + 0.5) AS BIGINT) AS lo_e6,
        |  CAST(floor((center + hw) * 1000000.0 + 0.5) AS BIGINT) AS hi_e6
        |FROM wix""".stripMargin,
    "value_hill_tail" ->
      s"""WITH hlt AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |            FROM events WHERE value IS NOT NULL AND value > 0
        |            ORDER BY cents DESC LIMIT $HillK),
        |hlm AS (SELECT min(cents) AS xk FROM hlt),
        |hld AS (SELECT CAST(floor(ln(CAST(cents AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |             - CAST(floor(ln(CAST(xk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS d
        |        FROM hlt CROSS JOIN hlm)
        |SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(d) AS BIGINT) AS sum_lnratio_e6,
        |  CASE WHEN sum(d) > 0
        |       THEN CAST(count(*) * 1000000000000 // sum(d) AS BIGINT) END AS alpha_e6
        |FROM hld""".stripMargin,
    "gini_impurity_features" -> giniFeaturesOracle,
    "wasserstein_value" ->
      """WITH wev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |                    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS isv
        |             FROM events WHERE value IS NOT NULL
        |               AND event_type IN ('view', 'purchase')),
        |wg AS (SELECT cents, CAST(sum(isv) AS BIGINT) AS n1,
        |         CAST(sum(1 - isv) AS BIGINT) AS n2 FROM wev GROUP BY 1),
        |wc AS (SELECT cents,
        |         CAST(sum(n1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
        |         CAST(sum(n2) OVER (ORDER BY cents) AS BIGINT) AS cum2,
        |         lead(cents) OVER (ORDER BY cents) AS next_c
        |       FROM wg),
        |wt AS (SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2 FROM wg),
        |wx AS (SELECT abs(CAST(cum1 AS HUGEINT) * t2 - CAST(cum2 AS HUGEINT) * t1)
        |              * (next_c - cents) AS term, t1, t2
        |       FROM wc CROSS JOIN wt WHERE next_c IS NOT NULL)
        |SELECT CAST(max(t1) AS BIGINT) AS n_view, CAST(max(t2) AS BIGINT) AS n_purchase,
        |  CAST(sum(term) * 1000000
        |       // nullif(CAST(max(t1) AS HUGEINT) * max(t2), 0) AS BIGINT) AS w1_cents_e6
        |FROM wx""".stripMargin,
    "distribution_psi" ->
      """WITH pev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |                    CAST(event_id % 2 AS BIGINT) AS half
        |             FROM events WHERE value IS NOT NULL),
        |pg AS (SELECT cents, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |       FROM pev GROUP BY 1),
        |pc AS (SELECT cents, n, na, nb,
        |         CAST(sum(n) OVER (ORDER BY cents) AS BIGINT) AS cum_incl FROM pg),
        |pt AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(na) AS BIGINT) AS ta,
        |         CAST(sum(nb) AS BIGINT) AS tb FROM pg),
        |pd AS (SELECT CAST((cum_incl - n) * 10 // nn AS INTEGER) AS decile, na, nb, ta, tb
        |       FROM pc CROSS JOIN pt),
        |pb AS (SELECT decile, CAST(sum(na) AS BIGINT) AS ba, CAST(sum(nb) AS BIGINT) AS bb,
        |         CAST(max(ta) AS BIGINT) AS ta, CAST(max(tb) AS BIGINT) AS tb
        |       FROM pd GROUP BY 1),
        |px AS (SELECT ta, tb,
        |         CAST(floor(CAST(CAST(ba AS HUGEINT) * tb - CAST(bb AS HUGEINT) * ta AS DOUBLE)
        |             / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))
        |             * ln(CAST(ba AS DOUBLE) * CAST(tb AS DOUBLE)
        |                  / (CAST(bb AS DOUBLE) * CAST(ta AS DOUBLE)))
        |             * 1000000.0 + 0.5) AS BIGINT) AS term_e6
        |       FROM pb WHERE ba > 0 AND bb > 0)
        |SELECT CAST(max(ta) AS BIGINT) AS n_half_a, CAST(max(tb) AS BIGINT) AS n_half_b,
        |  CAST(count(*) AS BIGINT) AS n_bins_used, CAST(sum(term_e6) AS BIGINT) AS psi_e6
        |FROM px""".stripMargin,
    "spearman_corr" ->
      """WITH sp AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc, CAST(n.yc AS BIGINT) AS yc
        |  FROM orders o JOIN (SELECT l_orderkey, count(*) AS yc FROM lineitem GROUP BY 1) n
        |    ON o.o_orderkey = n.l_orderkey),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM sp),
        |gx AS (SELECT xc, CAST(count(*) AS BIGINT) AS c FROM sp GROUP BY 1),
        |cx AS (SELECT xc, 2 * (sum(c) OVER (ORDER BY xc) - c) + c + 1 AS rx2 FROM gx),
        |gy AS (SELECT yc, CAST(count(*) AS BIGINT) AS c FROM sp GROUP BY 1),
        |cy AS (SELECT yc, 2 * (sum(c) OVER (ORDER BY yc) - c) + c + 1 AS ry2 FROM gy),
        |dd AS (SELECT CAST(rx2 - nn - 1 AS BIGINT) AS dx, CAST(ry2 - nn - 1 AS BIGINT) AS dy
        |       FROM sp JOIN cx USING (xc) JOIN cy USING (yc) CROSS JOIN st),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         sum(dx * dy) AS sxy, sum(dx * dx) AS sxx, sum(dy * dy) AS syy FROM dd)
        |SELECT n_pairs,
        |  CASE WHEN sxx <> 0 AND syy <> 0 THEN
        |    CAST(floor(CAST(sxy AS DOUBLE) /
        |               (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |               * 1000000.0 + 0.5) AS BIGINT)
        |  END AS rho_e6
        |FROM ag""".stripMargin,
    "mutual_information" ->
      """WITH mic AS (
        |  SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS h, CAST(count(*) AS BIGINT) AS nij
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        |mtot AS (SELECT CAST(sum(nij) AS BIGINT) AS nn FROM mic),
        |mgt AS (SELECT t, CAST(sum(nij) AS BIGINT) AS ni FROM mic GROUP BY 1),
        |mgh AS (SELECT h, CAST(sum(nij) AS BIGINT) AS nj FROM mic GROUP BY 1),
        |mht AS (SELECT CAST(floor(ln(CAST(nn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |          - CAST(floor(CAST(sum(ni * CAST(floor(ln(CAST(ni AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |                       / nn + 0.5) AS BIGINT) AS h_type_e6
        |        FROM mgt CROSS JOIN mtot GROUP BY nn),
        |mhh AS (SELECT CAST(floor(ln(CAST(nn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |          - CAST(floor(CAST(sum(nj * CAST(floor(ln(CAST(nj AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |                       / nn + 0.5) AS BIGINT) AS h_hour_e6
        |        FROM mgh CROSS JOIN mtot GROUP BY nn),
        |mit AS (SELECT nij, nn,
        |          nij * CAST(floor(ln(CAST(nij AS DOUBLE) * CAST(nn AS DOUBLE) /
        |                             (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
        |                           * 1000000.0 + 0.5) AS BIGINT) AS mi_term
        |        FROM mic JOIN mgt USING (t) JOIN mgh USING (h) CROSS JOIN mtot),
        |mia AS (SELECT CAST(max(nn) AS BIGINT) AS n_events, CAST(count(*) AS BIGINT) AS n_cells,
        |          CAST(floor(CAST(sum(mi_term) AS DOUBLE) / max(nn) + 0.5) AS BIGINT) AS mi_e6
        |        FROM mit)
        |SELECT n_events, n_cells, mi_e6, h_type_e6, h_hour_e6
        |FROM mia CROSS JOIN mht CROSS JOIN mhh""".stripMargin,
    "hodges_lehmann" ->
      """WITH hld AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |        CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |      FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
        |hlp AS (SELECT a.event_type, a.y + b.y AS w2
        |        FROM hld a JOIN hld b ON a.event_type = b.event_type AND a.day <= b.day)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(round(quantile_cont(w2, 0.5) * 2) AS BIGINT) AS pseudomedian_cents_x4
        |FROM hlp GROUP BY 1""".stripMargin,
    "value_auc" ->
      """WITH sc AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
        |                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |            FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(pos) AS BIGINT) AS npos
        |      FROM sc GROUP BY 1),
        |c AS (SELECT *, sum(n) OVER (ORDER BY cents) AS cum_incl FROM g),
        |t AS (SELECT CAST(sum(npos * (2 * (cum_incl - n) + n + 1)) AS HUGEINT)
        |               AS rank_sum_x2,
        |             CAST(sum(npos) AS HUGEINT) AS p,
        |             CAST(sum(n) - sum(npos) AS HUGEINT) AS nn
        |      FROM c)
        |SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |  CAST((rank_sum_x2 - p * (p + 1)) * 1000000
        |       // nullif(2 * p * nn, 0) AS BIGINT) AS auc_e6
        |FROM t""".stripMargin,

    "stickiness_dau_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |            FROM events WHERE user_id IS NOT NULL),
        |days AS (SELECT DISTINCT d FROM ud),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |mau AS (SELECT days.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS mau
        |        FROM days JOIN ud
        |          ON ud.d BETWEEN days.d - INTERVAL 29 DAY AND days.d
        |        GROUP BY 1)
        |SELECT d, dau, mau, CAST(dau * 1000000 // mau AS BIGINT) AS stickiness_e6
        |FROM dau JOIN mau USING (d)""".stripMargin,

    "next_event_pred" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |      FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM t GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT next_type) AS BIGINT) AS v FROM t),
        |sc AS (SELECT t.event_type, t.next_type, t.n,
        |         CAST((t.n + 1) * 1000000 // (tot.tot + v.v) AS BIGINT) AS prob_e6
        |       FROM t JOIN tot ON t.event_type = tot.event_type CROSS JOIN v),
        |r AS (SELECT sc.*, row_number() OVER (PARTITION BY event_type
        |        ORDER BY prob_e6 DESC, next_type ASC) AS rnk FROM sc)
        |SELECT event_type, next_type AS pred_type, n AS n_obs, prob_e6
        |FROM r WHERE rnk = 1""".stripMargin,

    "event_paths3" ->
      """WITH p3 AS (
        |  SELECT event_type AS step1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY ts ASC, event_id ASC) AS step2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |                                   ORDER BY ts ASC, event_id ASC) AS step3
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
        |FROM p3 WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 20""".stripMargin,

    "event_funnel" ->
      """WITH f AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(count(t_view) AS BIGINT) AS step_view,
        |       CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS step_click,
        |       CAST(count(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END)
        |            AS BIGINT) AS step_buy
        |FROM f""".stripMargin,

    "attribution_last_touch" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |  FROM events)
        |SELECT last_touch, CAST(count(*) AS BIGINT) AS n_purchases
        |FROM e WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "backtest_folds" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS d FROM events),
        |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM d),
        |p AS (SELECT CAST((datediff('day', b.d0, d.d) * 5)
        |                  // (datediff('day', b.d0, b.d1) + 1) AS INTEGER) AS part
        |      FROM d, b),
        |c AS (SELECT part, CAST(count(*) AS BIGINT) AS n_test FROM p GROUP BY 1),
        |r AS (SELECT part AS fold,
        |        CAST(COALESCE(sum(n_test) OVER (ORDER BY part
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_train,
        |        n_test
        |      FROM c)
        |SELECT fold, n_train, n_test FROM r WHERE fold >= 1""".stripMargin,

    "user_retention" ->
      """WITH firstseen AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS cohort FROM events GROUP BY 1),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT f.cohort, CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM activity a JOIN firstseen f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    "props_variant" ->
      """WITH x AS (SELECT CAST(props ->> 'k' AS BIGINT) AS k FROM events)
        |SELECT k % 10 AS k_mod, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k
        |FROM x GROUP BY 1""".stripMargin,

    "events_interpolated" ->
      """WITH agg AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM agg GROUP BY 1),
        |spine AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |          FROM b),
        |j AS (SELECT s.user_id, s.hour, a.cents
        |      FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.hour = a.hour),
        |c AS (SELECT user_id, hour, cents,
        |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
        |  last_value(CASE WHEN cents IS NOT NULL THEN hour END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
        |  last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1,
        |  last_value(CASE WHEN cents IS NOT NULL THEN hour END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY hour DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1
        |FROM j)
        |SELECT user_id, hour,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |       WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN
        |         v0 + ((v1 - v0) * (epoch_us(hour) - epoch_us(t0)))
        |              // (epoch_us(t1) - epoch_us(t0))
        |       END AS BIGINT) AS cents_interp
        |FROM c""".stripMargin,

    "events_sliding" ->
      """WITH w AS (
        |  SELECT date_trunc('hour', ts) AS w_start, user_id FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, user_id FROM events)
        |SELECT w_start, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM w GROUP BY 1""".stripMargin,

    // the z-test multiplied out to integers: (n·x−Σx)² > k²·(n·Σx²−(Σx)²)
    "events_anomaly" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS x
        |           FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, d + CAST(r.i AS INTEGER) AS ad, x, x * x AS x2
        |      FROM e, UNNEST(range(1, 11)) AS r(i)),
        |b AS (SELECT event_type, ad, CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x2) AS BIGINT) AS sx2
        |      FROM c GROUP BY 1, 2)
        |SELECT e.event_type, e.d, e.x AS n_events, b.n AS n_baseline,
        |  ((b.n * e.x - b.sx) * (b.n * e.x - b.sx) >
        |     9 * (b.n * b.sx2 - b.sx * b.sx) AND b.n >= 5) AS is_anomaly
        |FROM e JOIN b ON e.event_type = b.event_type AND e.d = b.ad""".stripMargin,

    // weights are exact powers of two, sums exact integers, one IEEE
    // division at the end — no pow()/libm anywhere
    "events_ewma" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n_events
        |           FROM events GROUP BY 1, 2),
        |c AS (SELECT e.event_type, e.d + CAST(r.i AS INTEGER) AS ad,
        |             (1 << (9 - CAST(r.i AS INTEGER))) * e.n_events AS wx,
        |             (1 << (9 - CAST(r.i AS INTEGER))) AS w
        |      FROM e, UNNEST(range(0, 10)) AS r(i)),
        |a AS (SELECT event_type, ad, CAST(sum(wx) AS BIGINT) AS num,
        |             CAST(sum(w) AS BIGINT) AS den
        |      FROM c GROUP BY 1, 2)
        |SELECT e.event_type, e.d, e.n_events,
        |  CAST(floor(num * 1.0 / den * 1000000.0 + 0.5) AS BIGINT) AS ewma_e6
        |FROM e JOIN a ON e.event_type = a.event_type AND e.d = a.ad""".stripMargin,

    "events_resampled" ->
      """WITH agg AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM agg GROUP BY 1),
        |spine AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |          FROM b),
        |j AS (SELECT s.user_id, s.hour, coalesce(a.n_events, 0) AS n_events, a.cents
        |      FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.hour = a.hour)
        |SELECT user_id, hour, CAST(n_events AS BIGINT) AS n_events,
        |       CAST(last_value(cents IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS filled_cents
        |FROM j""".stripMargin,

    "orders_rolling_30d" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents,
        | CAST(count(*) OVER (
        |   PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_n
        |FROM orders""".stripMargin,

    "quota_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= CASE WHEN lang = 'en' THEN 30 ELSE 15 END""".stripMargin,

    "asof_forward" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
        |         arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, r.o_orderkey, r.o_totalprice
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND r.o_orderdate >= e.ts""".stripMargin,

    "embedding_centroids" ->
      """WITH flat AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT label, CAST(pos AS INTEGER) AS pos, round(avg(x), 6) AS mean
        |FROM flat GROUP BY label, pos""".stripMargin,

    "embedding_norms" ->
      """WITH flat AS (
        |  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT vec_id, round(sqrt(sum(x * x)), 6) AS l2
        |FROM flat GROUP BY vec_id""".stripMargin,

    // DuckDB levenshtein counts bytes, Spark counts chars — identical on
    // this ASCII corpus (asserted: octet_length(encode(text)) = length(text))
    "edit_dup_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |      FROM t, UNNEST(range(1, len(ws) - 3)) AS r(i) WHERE len(ws) >= 5),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |         FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id)
        |SELECT c.id_a, c.id_b, CAST(levenshtein(da.text, db.text) AS INTEGER) AS dist
        |FROM cand c
        |JOIN documents da ON c.id_a = da.doc_id
        |JOIN documents db ON c.id_b = db.doc_id
        |WHERE abs(length(da.text) - length(db.text)) <= 10
        |  AND levenshtein(da.text, db.text) <= 10""".stripMargin,

    // A-ES key ln(u)/w quantized per row; ranking entirely on integers,
    // zero-weight rows excluded on both sides
    "weighted_pick" ->
      """WITH h AS (SELECT doc_id, source, n_chars,
        |        greatest(CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT), 1) AS hv
        |      FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, source, n_chars,
        |        CAST(floor(ln(hv / 1152921504606846976.0) / n_chars * 1000000.0 + 0.5) AS BIGINT) AS key_e6
        |      FROM h)
        |SELECT doc_id, source, n_chars, pick_rank FROM (
        |  SELECT k.*, CAST(row_number() OVER (
        |    PARTITION BY source ORDER BY key_e6 DESC, doc_id ASC) AS INTEGER) AS pick_rank
        |  FROM k)
        |WHERE pick_rank <= 10""".stripMargin,

    // same md5 split rule as train_split; fractions quantized per
    // (split,bucket), TV contribution is an integer |difference|
    "split_drift" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 AS bucket
        |  FROM documents),
        |s AS (SELECT CASE WHEN bucket < 8000 THEN 'train'
        |                  WHEN bucket < 9000 THEN 'val'
        |                  ELSE 'test' END AS split,
        |             len(string_split(text, ' ')) // 10 AS len_bucket
        |      FROM b),
        |c AS (SELECT split, len_bucket, count(*) AS n FROM s GROUP BY split, len_bucket),
        |t AS (SELECT split, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY split),
        |f AS (SELECT c.split, c.len_bucket,
        |        CAST(floor(c.n * 1.0 / t.tot * 1000000.0 + 0.5) AS BIGINT) AS frac_e6
        |      FROM c JOIN t USING (split)),
        |g AS (SELECT len_bucket,
        |        CAST(sum(CASE WHEN split = 'train' THEN frac_e6 ELSE 0 END) AS BIGINT) AS frac_train_e6,
        |        CAST(sum(CASE WHEN split = 'val' THEN frac_e6 ELSE 0 END) AS BIGINT) AS frac_val_e6,
        |        CAST(sum(CASE WHEN split = 'test' THEN frac_e6 ELSE 0 END) AS BIGINT) AS frac_test_e6
        |      FROM f GROUP BY len_bucket)
        |SELECT len_bucket, frac_train_e6, frac_val_e6, frac_test_e6,
        |       abs(frac_train_e6 - frac_val_e6) AS tv_e6
        |FROM g""".stripMargin,

    // every cut reproduced from the same md5-derived 60-bit window hash;
    // chunk content compared as md5 fingerprints
    "content_chunks" ->
      s"""WITH $cdcChunkCtes
         |SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_toks,
         |       md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
         |FROM c GROUP BY doc_id, chunk_idx""".stripMargin,

    // chunk-level dup rate over the same CDC cut
    "doc_cdc_dup_rate" ->
      s"""WITH $cdcChunkCtes,
         |ch AS (SELECT doc_id, chunk_idx,
         |         md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
         |       FROM c GROUP BY doc_id, chunk_idx),
         |ow AS (SELECT chunk_md5, count(DISTINCT doc_id) AS owners
         |       FROM ch GROUP BY chunk_md5),
         |d AS (SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |        CAST(sum(CASE WHEN ow.owners > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
         |      FROM ch JOIN ow USING (chunk_md5) GROUP BY ch.doc_id)
         |SELECT doc_id, n_chunks, n_dup_chunks,
         |  CAST(floor(n_dup_chunks * 1.0 / n_chunks * 1000000.0 + 0.5) AS BIGINT) AS dup_frac_e6
         |FROM d""".stripMargin,

    "k_anon_risk" ->
      """SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS group_n,
        |       count(*) < 5 AS at_risk
        |FROM customer GROUP BY c_mktsegment, c_nationkey""".stripMargin,

    // the seeded Laplace draw: same md5-derived uniform, same inverse-CDF
    // expression shape; the one ln() per group is quantized to e6 so the
    // released integer is bit-identical cross-engine
    "dp_group_counts" ->
      """WITH g AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type),
        |h AS (SELECT event_type, n,
        |        greatest(CAST(('0x' || substr(md5('17:' || CAST(event_type AS VARCHAR)), 1, 15)) AS BIGINT), 1) AS h
        |      FROM g),
        |u AS (SELECT event_type, n, h / 1152921504606846976.0 - 0.5 AS u FROM h)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(n AS BIGINT) * 1000000 +
        |    CAST(floor(-1.0 * 1.0 * sign(u) * ln(1.0 - 2.0 * abs(u))
        |               * 1000000.0 + 0.5) AS BIGINT) AS noisy_n_e6
        |FROM u""".stripMargin,

    // exact integer counts + one IEEE division; top-16 vocab is fully
    // determined by (cf DESC, term ASC) so the cutoff can't drift
    "vocab_oov" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
        |v AS (SELECT term FROM (
        |        SELECT term, row_number() OVER (ORDER BY cf DESC, term ASC) AS rn FROM cf)
        |      WHERE rn <= 16),
        |d AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |        CAST(sum(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END) AS BIGINT) AS oov_tokens
        |      FROM tf LEFT JOIN v ON tf.term = v.term GROUP BY tf.doc_id)
        |SELECT doc_id, n_tokens, oov_tokens,
        |  CAST(floor(oov_tokens * 1.0 / n_tokens * 1000000.0 + 0.5) AS BIGINT) AS oov_e6
        |FROM d""".stripMargin,

    // BM25: the only ln() is quantized per DISTINCT TERM (idf_e6); the
    // per-pair contribution is pure IEEE arithmetic over exact integers
    // with the same literal/association shape as the Spark plan, floored
    // to an integer BEFORE the sum — so scores and ranks are bit-stable
    "bm25_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |                  len(string_split(text, ' ')) AS dl FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
        |       FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
        |       FROM (SELECT doc_id, any_value(dl) AS dl FROM t GROUP BY doc_id)),
        |idf AS (SELECT term, CAST(floor(ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |                               * 1000000.0 + 0.5) AS BIGINT) AS idf_e6
        |        FROM df CROSS JOIN st),
        |q AS (SELECT DISTINCT doc_id AS query_id, term FROM t WHERE doc_id % 1000 = 0),
        |c AS (SELECT q.query_id, tf.doc_id,
        |        CAST(floor(idf.idf_e6 *
        |          (tf.tf * (1.2 + 1.0) /
        |            (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl * st.n / st.sum_dl)))
        |          + 0.5) AS BIGINT) AS c_e6
        |      FROM q JOIN tf USING (term) JOIN idf USING (term) CROSS JOIN st
        |      WHERE q.query_id != tf.doc_id),
        |s AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6
        |      FROM c GROUP BY 1, 2)
        |SELECT query_id, doc_id, score_e6, rank FROM (
        |  SELECT s.*, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM s)
        |WHERE rank <= 5""".stripMargin,

    // cascade: BM25 CTEs recall 20, the proven cosine shape reranks only
    // those pairs — ranking on the round-6 sim + id tie-break
    "rerank_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |                  len(string_split(text, ' ')) AS dl FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
        |       FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
        |       FROM (SELECT doc_id, any_value(dl) AS dl FROM t GROUP BY doc_id)),
        |idf AS (SELECT term, CAST(floor(ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |                               * 1000000.0 + 0.5) AS BIGINT) AS idf_e6
        |        FROM df CROSS JOIN st),
        |q AS (SELECT DISTINCT doc_id AS query_id, term FROM t WHERE doc_id % 1000 = 0),
        |c AS (SELECT q.query_id, tf.doc_id,
        |        CAST(floor(idf.idf_e6 *
        |          (tf.tf * (1.2 + 1.0) /
        |            (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl * st.n / st.sum_dl)))
        |          + 0.5) AS BIGINT) AS c_e6
        |      FROM q JOIN tf USING (term) JOIN idf USING (term) CROSS JOIN st
        |      WHERE q.query_id != tf.doc_id),
        |sbm AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6
        |        FROM c GROUP BY 1, 2),
        |sr AS (SELECT query_id, doc_id FROM (
        |         SELECT sbm.*, row_number() OVER (
        |           PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS rnk
        |         FROM sbm)
        |       WHERE rnk <= 20),
        |flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |                CAST(UNNEST(embedding) AS DOUBLE) AS x
        |         FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
        |dots AS (SELECT s.query_id, s.doc_id, sum(fa.x * fb.x) AS dp
        |         FROM sr s JOIN flat fa ON fa.vec_id = s.query_id
        |                   JOIN flat fb ON fb.vec_id = s.doc_id AND fb.i = fa.i
        |         GROUP BY s.query_id, s.doc_id),
        |sc AS (SELECT d.query_id, d.doc_id,
        |              round(d.dp / (na.nrm * nb.nrm), 6) AS cosine_sim
        |       FROM dots d JOIN norms na ON d.query_id = na.vec_id
        |                   JOIN norms nb ON d.doc_id = nb.vec_id)
        |SELECT query_id, doc_id, cosine_sim, rank FROM (
        |  SELECT sc.*, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine_sim DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM sc)
        |WHERE rank <= 5""".stripMargin,

    // RRF fusion: both legs' oracles inlined as derived tables (BM25 CTEs
    // as in bm25_topk; dense leg = the lsh_topk candidate chain filtered
    // to the query set — mirrors the Spark side's lshTopKAgainst leg);
    // contributions are integer `1000000 // (60+rank)` so the fused
    // ranking has zero float sites
    "hybrid_rrf_topk" ->
      s"""WITH ${lshBucketCtes(LshBits, LshTables)}
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |                  len(string_split(text, ' ')) AS dl FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
        |       FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
        |       FROM (SELECT doc_id, any_value(dl) AS dl FROM t GROUP BY doc_id)),
        |idf AS (SELECT term, CAST(floor(ln(1.0 + (n - df + 0.5) / (df + 0.5))
        |                               * 1000000.0 + 0.5) AS BIGINT) AS idf_e6
        |        FROM df CROSS JOIN st),
        |q AS (SELECT DISTINCT doc_id AS query_id, term FROM t WHERE doc_id % 1000 = 0),
        |c AS (SELECT q.query_id, tf.doc_id,
        |        CAST(floor(idf.idf_e6 *
        |          (tf.tf * (1.2 + 1.0) /
        |            (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tf.dl * st.n / st.sum_dl)))
        |          + 0.5) AS BIGINT) AS c_e6
        |      FROM q JOIN tf USING (term) JOIN idf USING (term) CROSS JOIN st
        |      WHERE q.query_id != tf.doc_id),
        |sbm AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6
        |        FROM c GROUP BY 1, 2),
        |sr AS (SELECT query_id, doc_id, rnk FROM (
        |         SELECT sbm.*, row_number() OVER (
        |           PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS rnk
        |         FROM sbm)
        |       WHERE rnk <= $AnnK),
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS query_id, b2.vec_id AS neighbor_id
        |  FROM probes p JOIN buckets b2
        |    ON p.tbl = b2.tbl AND p.bucket = b2.bucket AND p.vec_id <> b2.vec_id
        |  WHERE p.vec_id % 1000 = 0),
        |${pairScoreCtes("query_id", "neighbor_id")},
        |dr AS (SELECT query_id, neighbor_id AS doc_id, rnk FROM (
        |         SELECT scored.*, row_number() OVER (
        |           PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id ASC) AS rnk
        |         FROM scored)
        |       WHERE rnk <= $AnnK),
        |u AS (SELECT query_id, doc_id, 1000000 // (60 + rnk) AS cc FROM sr
        |      UNION ALL
        |      SELECT query_id, doc_id, 1000000 // (60 + rnk) FROM dr),
        |f AS (SELECT query_id, doc_id, CAST(sum(cc) AS BIGINT) AS rrf_e6
        |      FROM u GROUP BY 1, 2)
        |SELECT query_id, doc_id, rrf_e6, rank FROM (
        |  SELECT f.*, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf_e6 DESC, doc_id ASC) AS INTEGER) AS rank
        |  FROM f)
        |WHERE rank <= 5""".stripMargin,

    // ranking happens on the QUANTIZED integer score in both engines, so
    // the top-k cutoff can't be flipped by libm ln() ulp differences
    "tfidf_top_terms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        CAST(floor(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0)
        |                   * 1000000.0 + 0.5) AS BIGINT) AS score_e6
        |      FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, score_e6 FROM (
        |  SELECT s.*, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_e6 DESC, term ASC) AS rn FROM s)
        |WHERE rn <= 5""".stripMargin,

    // exact integer counts + one IEEE division — bit-identical cross-engine
    "doc_repetition" -> docRepetitionOracle,

    "decontam_report" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |      FROM t, UNNEST(range(1, len(ws) - 3)) AS r(i) WHERE len(ws) >= 5),
        |tr AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 10 != 0),
        |be AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 10 = 0)
        |SELECT train_id, bench_id, count(*) AS shared_grams
        |FROM tr JOIN be USING (gram)
        |GROUP BY train_id, bench_id HAVING count(*) >= 3""".stripMargin,

    "decontam_clean" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS gram
        |      FROM t, UNNEST(range(1, len(ws) - 3)) AS r(i) WHERE len(ws) >= 5),
        |tr AS (SELECT doc_id AS train_id, gram FROM g WHERE doc_id % 10 != 0),
        |be AS (SELECT doc_id AS bench_id, gram FROM g WHERE doc_id % 10 = 0),
        |bad AS (SELECT DISTINCT train_id FROM (
        |  SELECT train_id, bench_id FROM tr JOIN be USING (gram)
        |  GROUP BY train_id, bench_id HAVING count(*) >= 3))
        |SELECT lang, count(*) AS n_docs
        |FROM documents
        |WHERE doc_id % 10 != 0 AND doc_id NOT IN (SELECT train_id FROM bad)
        |GROUP BY lang""".stripMargin,

    // plain inequality join is the oracle — proving the bucketed-bin
    // candidate generation loses no pairs and invents none
    "event_recon_full" ->
      """WITH v AS (SELECT user_id, event_id, ts FROM events
        |           WHERE event_type = 'view' AND user_id IS NOT NULL),
        |b AS (SELECT user_id, event_id, ts FROM events
        |      WHERE event_type = 'purchase' AND user_id IS NOT NULL),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM v JOIN b
        |      ON v.user_id = b.user_id
        |      AND abs(epoch_us(v.ts) - epoch_us(b.ts)) <= 1800000000),
        |vo AS (SELECT CAST(count(*) AS BIGINT) AS n_view_orphans FROM v
        |       WHERE NOT EXISTS (SELECT 1 FROM b
        |         WHERE b.user_id = v.user_id
        |         AND abs(epoch_us(v.ts) - epoch_us(b.ts)) <= 1800000000)),
        |bo AS (SELECT CAST(count(*) AS BIGINT) AS n_purchase_orphans FROM b
        |       WHERE NOT EXISTS (SELECT 1 FROM v
        |         WHERE v.user_id = b.user_id
        |         AND abs(epoch_us(v.ts) - epoch_us(b.ts)) <= 1800000000))
        |SELECT p.n_pairs, vo.n_view_orphans, bo.n_purchase_orphans
        |FROM p CROSS JOIN vo CROSS JOIN bo""".stripMargin,

    "event_pairs_within" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        | abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1800000000""".stripMargin,

    "pattern_matches" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         lead(event_type, 1) OVER w AS t1,
        |         lead(event_type, 2) OVER w AS t2,
        |         lead(ts, 1) OVER w AS ts1,
        |         lead(ts, 2) OVER w AS ts2,
        |         lead(event_id, 2) OVER w AS id2
        |  FROM events WHERE user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id, event_id AS start_event_id, id2 AS end_event_id
        |FROM x
        |WHERE event_type = 'view' AND t1 = 'view' AND t2 = 'purchase'
        |  AND epoch_us(ts1) - epoch_us(ts) <= 172800000000
        |  AND epoch_us(ts2) - epoch_us(ts1) <= 172800000000""".stripMargin,

    "views_unconverted" ->
      """WITH v AS (SELECT user_id, event_id, ts FROM events
        |           WHERE user_id IS NOT NULL AND event_type = 'view'),
        |b AS (SELECT user_id, ts FROM events
        |      WHERE user_id IS NOT NULL AND event_type = 'purchase')
        |SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_views,
        |       CAST(sum(CASE WHEN NOT EXISTS (
        |              SELECT 1 FROM b WHERE b.user_id = v.user_id
        |              AND abs(epoch_us(b.ts) - epoch_us(v.ts)) <= 1800000000)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_unconverted
        |FROM v GROUP BY 1""".stripMargin,

    "orders_quantiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.25), 6) AS q25,
        | round(quantile_cont(o_totalprice, 0.5), 6) AS q50,
        | round(quantile_cont(o_totalprice, 0.75), 6) AS q75,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    // whole-input form of the merged-partials sketch: fixed trunc-div
    // buckets (Spark `div` ≡ DuckDB `//`), integer rank comparison, lower
    // bucket edge — bit-identical by the merge law
    "quantile_sketch_portable" ->
      """WITH h AS (SELECT o_orderpriority,
        |             CAST(floor(o_totalprice) AS BIGINT) // 1000 AS bucket,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM orders GROUP BY 1, 2),
        |c AS (SELECT o_orderpriority, bucket, n,
        |        CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY bucket)
        |             AS BIGINT) AS cum,
        |        CAST(sum(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS total
        |      FROM h)
        |SELECT o_orderpriority,
        |  CAST(min(CASE WHEN cum * 1000000 >= total * 500000 THEN bucket END) * 1000
        |       AS BIGINT) AS p50_lo,
        |  CAST(min(CASE WHEN cum * 1000000 >= total * 900000 THEN bucket END) * 1000
        |       AS BIGINT) AS p90_lo,
        |  CAST(min(CASE WHEN cum * 1000000 >= total * 990000 THEN bucket END) * 1000
        |       AS BIGINT) AS p99_lo
        |FROM c GROUP BY o_orderpriority""".stripMargin,

    "heavy_hitters_cms" -> heavyHittersCmsOracle,
    "join_size_cms" -> joinSizeCmsOracle,
    "rolling_distinct_24h" -> rollingDistinctOracle,
    "lsh_pr_audit" -> lshPrAuditOracle,
    "tokenizer_fertility" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(floor(CAST(sum(n_chars) AS BIGINT) * 1000000
        |             / CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |             + 0.5) AS BIGINT) AS fertility_e6
        |FROM documents GROUP BY 1""".stripMargin,

    "revenue_rollup" ->
      """SELECT o_orderpriority, o_orderstatus,
        | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)""".stripMargin,

    // DuckDB GROUPING uses the same bitmask convention as Spark's
    // grouping_id (leftmost dimension = most significant bit)
    "events_cube" ->
      """SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n,
        | round(sum(value), 2) AS sum_value,
        | GROUPING(event_type, CAST(ts AS DATE)) AS gid
        |FROM events GROUP BY CUBE (event_type, CAST(ts AS DATE))""".stripMargin,

    "events_grouping_sets" ->
      """SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n,
        | GROUPING(event_type, CAST(ts AS DATE)) AS gid
        |FROM events GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)))""".stripMargin,

    // absent (date, type) combos are NULL on both sides: Spark pivot+count
    // yields NULL for empty cells, mirrored by sum(CASE ...) (not count)
    "events_pivot" ->
      """SELECT CAST(ts AS DATE) AS date,
        | CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        | CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
        | CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        | CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        |FROM events GROUP BY 1""".stripMargin,

    "props_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "mm_byte_features" ->
      """WITH p AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |         octet_length(encode(text)) AS len
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, CAST('0x' || substr(hx, CAST(2*i - 1 AS BIGINT), 2) AS INTEGER) % 16 AS bin
        |  FROM p, UNNEST(range(1, len + 1)) AS t(i)),
        |c AS (SELECT doc_id, bin, count(*) AS cnt FROM b GROUP BY doc_id, bin),
        |g AS (SELECT p.doc_id, CAST(r.bin AS INTEGER) AS bin, p.len
        |      FROM p, UNNEST(range(0, 16)) AS r(bin))
        |SELECT g.doc_id AS asset_id, g.bin,
        |       CAST(floor(CAST(COALESCE(c.cnt, 0) AS DOUBLE) / greatest(g.len, 1)
        |                  * 1000000.0 + 0.5) AS BIGINT) AS freq_e6
        |FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.bin = c.bin""".stripMargin,

    // the oracle is the PLAIN join — proving salting changes nothing
    "skew_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "events_union" ->
      """SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 1
        |UNION ALL
        |SELECT event_id, user_id, event_type FROM events WHERE event_id % 3 = 2""".stripMargin,

    "group_mode" ->
      """SELECT event_type, props AS top_prop FROM (
        |  SELECT event_type, props,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY count(*) DESC, props ASC) AS rn
        |  FROM events WHERE props IS NOT NULL
        |  GROUP BY event_type, props) WHERE rn = 1""".stripMargin,

    "group_topk" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events
        |  WHERE event_type IS NOT NULL GROUP BY user_id, event_type),
        |r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        |  FROM c)
        |SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS top_types
        |FROM r WHERE rn <= 2 GROUP BY user_id""".stripMargin,

    // the typed-Aggregator forms must agree with the window forms exactly
    "group_mode_agg" ->
      """SELECT event_type, props AS top_prop FROM (
        |  SELECT event_type, props,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY count(*) DESC, props ASC) AS rn
        |  FROM events WHERE props IS NOT NULL
        |  GROUP BY event_type, props) WHERE rn = 1""".stripMargin,

    "group_topk_agg" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt FROM events
        |  WHERE event_type IS NOT NULL GROUP BY user_id, event_type),
        |r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
        |  FROM c)
        |SELECT e.user_id, coalesce(t.top_types, '') AS top_types
        |FROM (SELECT DISTINCT user_id FROM events) e
        |LEFT JOIN (SELECT user_id, string_agg(event_type, ',' ORDER BY rn) AS top_types
        |           FROM r WHERE rn <= 2 GROUP BY user_id) t USING (user_id)""".stripMargin,

    "casts_for_load" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS orderkey,
        | CAST(l_quantity AS DOUBLE) AS quantity,
        | strftime(l_shipdate, '%Y-%m-%d') AS shipdate_str,
        | CASE WHEN l_returnflag = '' THEN NULL ELSE l_returnflag END AS returnflag_norm
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,

    "hourly_windowed" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
        | count(DISTINCT user_id) AS unique_listeners,
        | count(*) AS listen_count
        |FROM events GROUP BY 1""".stripMargin,

    "mm_payload_stats" ->
      """SELECT doc_id AS asset_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS content_key
        |FROM documents""".stripMargin,

    "mm_sample_offsets" ->
      """SELECT doc_id AS asset_id, i AS sample_idx,
        | CAST(floor(octet_length(encode(text)) * i / 4) AS BIGINT) AS byte_offset
        |FROM documents, UNNEST([0, 1, 2, 3]) AS t(i)""".stripMargin,

    // predicts what decodeWav must recover from the synthesized bytes;
    // duration uses truncating integer division on both engines
    "mm_audio_meta" ->
      """SELECT doc_id AS asset_id,
        | CAST(8000 + (doc_id % 5) * 2000 AS INTEGER) AS sample_rate,
        | CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        | CAST(8 * (1 + doc_id % 2) AS INTEGER) AS bits_per_sample,
        | CAST(n_chars % 1000 + 1 AS BIGINT) AS n_frames,
        | CAST((n_chars % 1000 + 1) * 1000 // (8000 + (doc_id % 5) * 2000) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // regenerates the ramp tone arithmetically: byte j of the PCM slice is
    // (seed + j) % 256, so the count of byte value v over len bytes is a
    // closed form; the histogram and the 8-bit clipping rate follow.
    // 16-bit samples read consecutive ramp bytes (hi = lo + 1 mod 256),
    // which can never form a ±full-scale sample → clip_rate_e6 = 0 there.
    "mm_audio_features" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 256 AS INTEGER) AS seed,
        |         CAST(8 * (1 + doc_id % 2) AS INTEGER) AS bits,
        |         (n_chars % 1000 + 1) * (1 + doc_id % 2) * (1 + doc_id % 2) AS len
        |  FROM documents),
        |vcnt AS (
        |  SELECT g.doc_id, t.v,
        |         CASE WHEN ((t.v - g.seed) % 256 + 256) % 256 < g.len
        |              THEN (g.len - 1 - ((t.v - g.seed) % 256 + 256) % 256) // 256 + 1
        |              ELSE 0 END AS cnt,
        |         g.len, g.bits
        |  FROM g, UNNEST(range(0, 256)) AS t(v)),
        |clip AS (
        |  SELECT doc_id,
        |         CASE WHEN any_value(bits) = 8 THEN
        |           CAST(floor(CAST(sum(CASE WHEN v IN (0, 255) THEN cnt ELSE 0 END) AS DOUBLE)
        |                / any_value(len) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE 0 END AS clip_rate_e6
        |  FROM vcnt GROUP BY doc_id),
        |h AS (
        |  SELECT doc_id, CAST(v % 16 AS INTEGER) AS bin,
        |         CAST(floor(CAST(sum(cnt) AS DOUBLE) / any_value(len) * 1000000.0 + 0.5) AS BIGINT) AS freq_e6
        |  FROM vcnt GROUP BY doc_id, bin)
        |SELECT h.doc_id AS asset_id, h.bin, h.freq_e6, c.clip_rate_e6
        |FROM h JOIN clip c ON h.doc_id = c.doc_id""".stripMargin,

    // the perceptual fingerprint is scale-invariant by construction, so
    // dup groups are exactly the seed groups (doc_id % 32) — any codec or
    // pooling bug splits a group and breaks the hash
    "mm_image_phash_dups" ->
      """SELECT doc_id AS asset_id,
        |       min(doc_id) OVER (PARTITION BY doc_id % 32) AS keeper_id,
        |       CAST(count(*) OVER (PARTITION BY doc_id % 32) AS BIGINT)
        |         AS n_scaled_dups
        |FROM documents""".stripMargin,

    // regenerates the PNG pixel pattern arithmetically: decoded RGB byte
    // at linear index j is (j + seed) % 256 over nb = 3·w·h bytes, so
    // (since 16 | 256) bin counts reduce to residues mod 16 — the count
    // for bin b is nb//16 plus one for the first nb%16 residues. The
    // UNION'd bin = -1 rows are the JPEG fidelity tier: the oracle
    // asserts exact 64×64×3 dims and freq_e6 = 1e6 (decode mean within
    // quantization tolerance of the closed-form pattern mean); the Spark
    // side computes that flag from the REAL decoded pixels
    "mm_image_features" ->
      """WITH g AS (SELECT doc_id AS asset_id,
        |             CAST(8 + doc_id % 8 AS BIGINT) AS w,
        |             CAST(8 + n_chars % 8 AS BIGINT) AS h,
        |             CAST(doc_id % 256 AS BIGINT) AS seed
        |           FROM documents),
        |n AS (SELECT asset_id, w, h, seed, 3 * w * h AS nb FROM g),
        |b AS (SELECT asset_id, w, h, seed, nb, CAST(r.b AS INTEGER) AS bin
        |      FROM n, UNNEST(range(0, 16)) AS r(b)),
        |c AS (SELECT asset_id, w, h, nb, bin,
        |        nb // 16 + CASE WHEN ((bin - seed) % 16 + 16) % 16 < nb % 16
        |                        THEN 1 ELSE 0 END AS cnt
        |      FROM b)
        |SELECT asset_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  CAST(3 AS INTEGER) AS channels, bin,
        |  CAST(floor(cnt * 1.0 / nb * 1000000.0 + 0.5) AS BIGINT) AS freq_e6
        |FROM c
        |UNION ALL
        |SELECT doc_id + 10000000 AS asset_id, CAST(64 AS INTEGER) AS width,
        |  CAST(64 AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels,
        |  CAST(-1 AS INTEGER) AS bin, CAST(1000000 AS BIGINT) AS freq_e6
        |FROM documents WHERE doc_id % 16 = 0""".stripMargin,

    "mm_video_meta" ->
      """SELECT doc_id AS asset_id,
        | CAST(600 * (1 + doc_id % 3) AS BIGINT) AS timescale,
        | CAST(n_chars % 5000 + 600 AS BIGINT) AS duration_ticks,
        | CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        | CAST(320 * (1 + doc_id % 4) AS INTEGER) AS width,
        | CAST(240 * (1 + doc_id % 4) AS INTEGER) AS height,
        | CAST((n_chars % 5000 + 600) * 1000 // (600 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // closed forms of the synthesized sample tables: sizes are
    // base + (i%7)·17 for i < n (sum via whole cycles of 21·17 plus a
    // triangular remainder), durations are n/2 entries at Δ + the rest
    // at 2Δ; all-integer arithmetic in both engines
    "mm_video_samples" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         n_chars % 50 + 2 AS n,
        |         doc_id % 100 + 10 AS base,
        |         100 + doc_id % 10 AS delta
        |  FROM documents)
        |SELECT doc_id AS asset_id,
        | CAST(n AS BIGINT) AS n_samples,
        | CAST(n * base + 17 * ((n // 7) * 21 + (n % 7) * ((n % 7) - 1) // 2) AS BIGINT) AS sample_bytes,
        | CAST(base + least(n - 1, 6) * 17 AS BIGINT) AS max_sample_size,
        | CAST((n // 2) * delta + (n - n // 2) * 2 * delta AS BIGINT) AS media_ticks
        |FROM g""".stripMargin,

    // closed-form mirror of the synthesized first-track sample table
    // (sizes base+(i%7)·17, stts runs delta then 2·delta) — any bug in
    // the stsz/stts materializing walk or the grid selection breaks it
    "mm_frame_sample" ->
      """WITH g AS (SELECT doc_id, n_chars % 50 + 2 AS n, doc_id % 100 + 10 AS base,
        |                  100 + doc_id % 10 AS delta,
        |                  CAST(600 * (1 + doc_id % 3) AS BIGINT) AS tsc
        |           FROM documents),
        |smp AS (SELECT doc_id, CAST(i AS INTEGER) AS sample_idx,
        |               CAST(base + (i % 7) * 17 AS BIGINT) AS sample_size,
        |               CAST(i * base + 17 * ((i // 7) * 21 + (i % 7) * ((i % 7) - 1) // 2)
        |                    AS BIGINT) AS byte_offset,
        |               CAST(CASE WHEN i < n // 2 THEN i * delta
        |                    ELSE (n // 2) * delta + (i - n // 2) * 2 * delta END
        |                    AS BIGINT) AS start_tick,
        |               CAST(CASE WHEN i < n // 2 THEN delta ELSE 2 * delta END
        |                    AS BIGINT) AS dur
        |        FROM g, UNNEST(range(0, n)) AS t(i)),
        |tot AS (SELECT doc_id, max(start_tick + dur) AS total_ticks FROM smp GROUP BY 1),
        |grid AS (SELECT g.doc_id, g.tsc, CAST(sq.s AS BIGINT) AS sec
        |         FROM g JOIN tot ON g.doc_id = tot.doc_id,
        |              UNNEST(range(0, least((tot.total_ticks - 1) // g.tsc, 31) + 1)) AS sq(s)),
        |pick AS (SELECT gr.doc_id, gr.sec, max(sm.start_tick) AS st
        |         FROM grid gr JOIN smp sm
        |           ON sm.doc_id = gr.doc_id AND sm.start_tick <= gr.sec * gr.tsc
        |         GROUP BY 1, 2)
        |SELECT p.doc_id AS asset_id, p.sec, sm.sample_idx, sm.byte_offset, sm.sample_size
        |FROM pick p JOIN smp sm ON sm.doc_id = p.doc_id AND sm.start_tick = p.st""".stripMargin,

    // total order (n_chars DESC, doc_id) has no peers, so the window's
    // default RANGE frame equals the operator's ROWS semantics
    "corpus_budget_select" ->
      """SELECT doc_id, source, n_chars, cum_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         CAST(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_chars
        |  FROM documents)
        |WHERE cum_chars <= 100000""".stripMargin,

    // same stride key, same (key, source, id) tie-break as the operator
    "corpus_mix_order" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |         1 + CAST(substr(source, 4) AS INTEGER) % 4 AS wt,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS k
        |  FROM documents)
        |SELECT doc_id, source, CAST(wt AS INTEGER) AS wt,
        | CAST(row_number() OVER (ORDER BY (2*k - 1) * (12 // wt), source, doc_id) - 1 AS BIGINT) AS mix_pos
        |FROM w""".stripMargin,

    "length_batch_assign" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars, n_chars // 100 AS bucket,
        |         row_number() OVER (PARTITION BY n_chars // 100
        |                            ORDER BY doc_id) - 1 AS k
        |  FROM documents)
        |SELECT doc_id, n_chars, CAST(bucket AS BIGINT) AS bucket,
        |       CAST(k // 32 AS BIGINT) AS batch_in_bucket,
        |       CAST(k % 32 AS INTEGER) AS pos_in_batch
        |FROM b""".stripMargin,

    "corpus_budget_per_source" ->
      """SELECT doc_id, source, n_chars, cum_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         CAST(sum(n_chars) OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_chars
        |  FROM documents)
        |WHERE cum_chars <= 5000""".stripMargin,

    "source_overlap_matrix" ->
      """WITH f AS (SELECT DISTINCT source,
        |  array_to_string(string_split(text, ' ')[1:5], ' ') AS k FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM f a JOIN f b ON a.k = b.k AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    "dedup_incremental" ->
      """SELECT d.doc_id, d.source, d.n_chars FROM documents d
        |WHERE d.doc_id % 10 < 2 AND NOT EXISTS (
        |  SELECT 1 FROM documents h
        |  WHERE h.doc_id % 10 >= 2 AND md5(h.text) = md5(d.text))""".stripMargin,

    // same quality formula as doc_quality, then exact-integer min-max
    // normalization per language; // and div both truncate, operands
    // are non-negative so floor == trunc on both engines
    "quality_norm_by_lang" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text, string_split(text, ' ') AS ws,
        |         CAST(length(text) AS DOUBLE) AS nchars
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, nchars, ws,
        |         CAST(len(ws) AS DOUBLE) AS ntok,
        |         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha
        |  FROM t),
        |q AS (
        |  SELECT doc_id, lang,
        |    CAST(CASE WHEN nchars = 0 THEN 0 ELSE floor((
        |      least(ntok / 100.0, 1.0) * 0.3
        |      + (alpha / nchars) * 0.3
        |      + (CASE WHEN (nchars - (ntok - 1)) / ntok BETWEEN 2.0 AND 12.0
        |              THEN 1.0 ELSE 0.3 END) * 0.2
        |      + (CASE WHEN len(list_intersect(ws,
        |           ['the','a','an','and','of','to','in','is','it','that'])) > 0
        |              THEN 1.0 ELSE 0.5 END)* 0.2) * 1000000.0 + 0.5) END AS BIGINT) AS quality_e6
        |  FROM s),
        |m AS (SELECT lang, min(quality_e6) AS qmin, max(quality_e6) AS qmax FROM q GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.quality_e6,
        |  CAST(CASE WHEN m.qmax = m.qmin THEN 0
        |       ELSE (q.quality_e6 - m.qmin) * 1000000 // (m.qmax - m.qmin) END AS BIGINT) AS norm_e6
        |FROM q JOIN m ON q.lang = m.lang""".stripMargin,

    "dedup_exact_groups" ->
      """SELECT md5(text) AS content_key, min(doc_id) AS keeper_id, count(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT i.id_a, i.id_b,
        |         round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
        |  FROM inter i
        |  JOIN sizes sa ON i.id_a = sa.doc_id
        |  JOIN sizes sb ON i.id_b = sb.doc_id)
        |WHERE jaccard >= 0.2""".stripMargin,
    "dup_graph_kcore" -> dupGraphKcoreOracle,

    "dup_graph_lpa" -> dupGraphLpaOracle,

    "dup_jaccard_histogram" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |j AS (SELECT round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
        |        AS jaccard
        |      FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
        |                   JOIN sizes sb ON i.id_b = sb.doc_id)
        |SELECT CAST(floor(jaccard * 10) AS INTEGER) AS bucket_x10,
        |       CAST(count(*) AS BIGINT) AS n_pairs
        |FROM j WHERE jaccard >= 0.2 GROUP BY 1""".stripMargin,
    "containment_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, containment_a, containment_b FROM (
        |  SELECT i.id_a, i.id_b,
        |         round(CAST(i.n_inter AS DOUBLE) / sa.n, 6) AS containment_a,
        |         round(CAST(i.n_inter AS DOUBLE) / sb.n, 6) AS containment_b
        |  FROM inter i
        |  JOIN sizes sa ON i.id_a = sa.doc_id
        |  JOIN sizes sb ON i.id_b = sb.doc_id)
        |WHERE containment_a >= 0.5 OR containment_b >= 0.5""".stripMargin,
    "embedding_dim_stats" ->
      """WITH flat AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT CAST(pos AS INTEGER) AS pos,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN x = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  min(x) AS min_x, max(x) AS max_x,
        |  CAST(floor(CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |             / count(*) + 0.5) AS BIGINT) AS mean_e6
        |FROM flat GROUP BY pos""".stripMargin,

    "embedding_cov" ->
      s"WITH $embeddingCovCtes SELECT i, j, cov_q FROM cov",
    "embedding_top_pc" -> embeddingTopPcOracle,
    "embedding_pc2" -> embeddingPc2Oracle,
    "embedding_pc_scores" -> embeddingPcScoresOracle,
    // final state of the incr_cov_view CDC feed, computed directly: all
    // vectors minus the %5 delete wave, plus the %10 reversed re-inserts
    "did_estimate" ->
      s"""WITH o AS (SELECT ${dh("CAST(o_custkey AS VARCHAR)")} % 2 AS treat,
        |  CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS post,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT
        |  CAST(sum(CASE WHEN treat=1 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
        |  CAST(sum(CASE WHEN treat=1 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
        |  CAST(sum(CASE WHEN treat=0 AND post=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
        |  CAST(sum(CASE WHEN treat=0 AND post=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
        |  CAST(sum(CASE WHEN treat=1 AND post=1 THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
        |  CAST(sum(CASE WHEN treat=1 AND post=0 THEN cents ELSE 0 END) AS BIGINT) AS s_t0,
        |  CAST(sum(CASE WHEN treat=0 AND post=1 THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
        |  CAST(sum(CASE WHEN treat=0 AND post=0 THEN cents ELSE 0 END) AS BIGINT) AS s_c0
        |  FROM o)
        |SELECT n_tp, n_t0, n_cp, n_c0, s_tp, s_t0, s_cp, s_c0,
        |  CAST(floor(((CAST(s_tp AS DOUBLE)/n_tp - CAST(s_t0 AS DOUBLE)/n_t0)
        |    - (CAST(s_cp AS DOUBLE)/n_cp - CAST(s_c0 AS DOUBLE)/n_c0))
        |    * 1000000.0 + 0.5) AS BIGINT) AS did_e6
        |FROM c""".stripMargin,

    "semantic_decontam" ->
      s"""WITH q3 AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1000.0 + 0.5)
        |              AS BIGINT) AS q
        |  FROM embeddings),
        |norms AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS n2
        |          FROM q3 GROUP BY 1),
        |panel AS (SELECT vec_id FROM embeddings
        |          ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
        |          LIMIT $DecontamPanel),
        |dots AS (
        |  SELECT c.vec_id AS vec_id, p.vec_id AS p_id,
        |         CAST(sum(c.q * p.q) AS BIGINT) AS dot
        |  FROM q3 c JOIN q3 p ON c.i = p.i
        |  WHERE p.vec_id IN (SELECT vec_id FROM panel)
        |    AND c.vec_id NOT IN (SELECT vec_id FROM panel)
        |  GROUP BY 1, 2)
        |SELECT d.vec_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM dots d JOIN norms na ON d.vec_id = na.vec_id
        |            JOIN norms nb ON d.p_id = nb.vec_id
        |WHERE d.dot > 0 AND 400 * d.dot * d.dot >= 49 * na.n2 * nb.n2
        |GROUP BY 1""".stripMargin,

    "export_shards" ->
      s"""WITH t AS (SELECT doc_id,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |            FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |        row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) - 1 AS rn
        |      FROM t)
        |SELECT doc_id,
        |  CAST(CASE WHEN (rn // $ShardK) % 2 = 0 THEN rn % $ShardK
        |       ELSE ${ShardK - 1} - rn % $ShardK END AS INTEGER) AS shard
        |FROM r""".stripMargin,

  )
}
