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

/** Query-registry fragment of [[graft.SparkEntry]] (mechanical r10 split of the
  * 13.7k-line registry into per-domain files): behavioral analytics: sequences, sessions, cohorts, A/B methodology,
  * forecasting and time-series similarity.
  * Entries are verbatim from the original map; SparkEntry folds every
  * fragment back into one registry, so names/oracles stay 1:1. */
private[graft] object AnalyticsQueries {
  def m: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nation_share_trend" -> ((s, dir) => {
      val byYear = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("n_name"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      byYear
        .withColumn("share_e6", expr(
          // decimal staging: cents·1e6 tops int64 around yearly revenue
          // ~9·10¹² dollars — not worth a cliff when decimal is free
          """CAST(cents AS DECIMAL(38,0)) * 1000000
             div sum(CAST(cents AS DECIMAL(38,0))) OVER (PARTITION BY yr)"""))
        .select(col("yr"), col("n_name"), col("cents"), col("share_e6"))
    }),

    // ---- repeat-purchase metrics: share of customers who come back,
    // and the median days to the second order (×4 dyadic-exact). One
    // customer shuffle; the second-order date is the 2nd smallest via
    // a bounded per-group rank ----
    "repeat_purchase" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("d").asc, col("o_orderkey").asc)
      val ranked = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          col("o_orderkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val cust = ranked.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          min(when(col("rn") === 1, col("d"))).as("d1"),
          min(when(col("rn") === 2, col("d"))).as("d2"))
      cust.agg(
        count(lit(1)).as("n_customers"),
        count(when(col("n") >= 2, 1)).as("n_repeat"),
        expr("count(CASE WHEN n >= 2 THEN 1 END) * 1000000 " +
          "div nullif(count(1), 0)").as("repeat_rate_e6"),
        (percentile(datediff(col("d2"), col("d1")), lit(0.5)) * 4)
          .cast("long").as("median_days_to_second_x4"))
    }),

    // ---- curation-filter Venn: how the three independent drop reasons
    // (low quality, repetition, exact dup) OVERLAP — the diagnostic that
    // says whether a filter is redundant (its cell counts are all shared)
    // or load-bearing (it uniquely kills documents). Identical texts have
    // identical quality/repetition flags, so the dup dimension needs no
    // per-row keeper assignment at all: ONE map-side-combinable
    // groupBy(md5, flags) collapses every duplicate family to a counted
    // row (a hot boilerplate group costs each map task one combine cell,
    // never a single-task window — the Dedup.exactGroups shape), and each
    // family then contributes 1 keeper + (n−1) dup rows to the 8-cell
    // aggregate arithmetically via a 2-element explode. Contrast
    // curation_funnel, which reports the SEQUENTIAL survivor counts ----
    "filter_overlap_venn" -> ((s, dir) => {
      val fams = Tables.documents(s, dir)
        .select(col("text"), Text.tokens(col("text")).as("__ws"))
        .select(md5(col("text")).as("k"),
          (floor(Text.qualityScoreRaw(col("text")) * 1e6 + 0.5).cast("long")
            < lit(800000L)).cast("long").as("f_lowq"),
          (floor(Text.repetitionFromTokens(col("__ws"), 3) * 1e6 + 0.5)
            .cast("long") > lit(10000L)).cast("long").as("f_rep"))
        .groupBy("k", "f_lowq", "f_rep")
        .agg(count(lit(1)).as("n"))
      fams
        .select(col("f_lowq"), col("f_rep"),
          explode(array(
            struct(lit(0L).as("f_dup"), lit(1L).as("c")),
            struct(lit(1L).as("f_dup"), (col("n") - 1).as("c")))).as("cell"))
        .select(col("f_lowq"), col("f_rep"),
          col("cell.f_dup").as("f_dup"), col("cell.c").as("c"))
        .filter(col("c") > 0)
        .groupBy("f_lowq", "f_rep", "f_dup")
        .agg(sum(col("c")).cast("long").as("n_docs"))
    }),

    // ---- order-to-ship latency quantiles per month: day-difference
    // quartiles ×4 (dyadic — interpolated quarter-points stay integral,
    // the order_gaps discipline) — the ops-latency report ----
    "ship_latency_quantiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("order_m"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .cast("long").as("lat"))
        .groupBy("order_m")
        .agg(count(lit(1)).as("n_lines"),
          (percentile(col("lat"), lit(0.25)) * 4).cast("long").as("p25_x4"),
          (percentile(col("lat"), lit(0.5)) * 4).cast("long").as("p50_x4"),
          (percentile(col("lat"), lit(0.75)) * 4).cast("long").as("p75_x4"))),

    // ---- engagement migration matrix: each user's activity quartile in
    // the first half of the window vs the second — the
    // upgrade/downgrade/churn flow report. Quartile thresholds are 1-row
    // broadcasts per half (the RFM rule: no global ntile window);
    // zero-event halves land in quartile 1 (the bottom quartile — the
    // 1 + Σ(count > threshold) formula starts at 1, and the >= 0
    // thresholds are never exceeded by a zero count) ----
    "engagement_migration" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
      val halves = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("c2"))
      val th = halves.agg(
        percentile(col("c1"), lit(0.25)).as("a1"),
        percentile(col("c1"), lit(0.5)).as("a2"),
        percentile(col("c1"), lit(0.75)).as("a3"),
        percentile(col("c2"), lit(0.25)).as("b1"),
        percentile(col("c2"), lit(0.5)).as("b2"),
        percentile(col("c2"), lit(0.75)).as("b3"))
      val gt = (v: String, q: String) => when(col(v) > col(q), 1L).otherwise(0L)
      halves.crossJoin(broadcast(th))
        .select(
          (lit(1L) + gt("c1", "a1") + gt("c1", "a2") + gt("c1", "a3"))
            .as("q_before"),
          (lit(1L) + gt("c2", "b1") + gt("c2", "b2") + gt("c2", "b3"))
            .as("q_after"))
        .groupBy("q_before", "q_after")
        .agg(count(lit(1)).as("n_users"))
    }),

    // ---- 1-NN label agreement: does the embedding space respect the
    // labels? For the hash-sampled panel, the exact nearest neighbor's
    // label vs the query's own — the classifier-free embedding-quality
    // number (a kNN probe with k=1). Reuses the linear panel×corpus
    // exact leg; the 64-row answer joins the label column twice ----
    "knn_label_accuracy" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val labels = emb.select(col("vec_id"), col("label"))
      Similarity.panelExactTopK(emb, "vec_id", "embedding", RecallPanel, k = 1)
        .select(col("query_id"), col("neighbor_id"))
        .join(labels.select(col("vec_id").as("query_id"),
          col("label").as("q_label")), Seq("query_id"))
        .join(labels.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), Seq("neighbor_id"))
        .agg(count(lit(1)).as("n_panel"),
          count(when(col("q_label") === col("n_label"), 1)).as("n_agree"))
        .withColumn("accuracy_e6",
          expr("n_agree * 1000000 div nullif(n_panel, 0)"))
    }),

    // ---- silhouette-lite cluster audit: per label, the mean of
    // (b − a)/max(a, b) with a = squared distance to the OWN-label
    // centroid and b = the nearest OTHER centroid — the separation
    // number that says whether the labels are clusters at all. The
    // |labels|·dim centroid relation broadcasts; the per-position join
    // is linear in vectors×labels with map-side partial aggregation,
    // no vector-vector pairs anywhere ----
    "cluster_silhouette" -> ((s, dir) => {
      val flat = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("x").cast("double").as("x"))
      val cent = flat.groupBy(col("label").as("c_label"), col("pos"))
        .agg(avg(col("x")).as("m"))
      val d2 = flat.join(broadcast(cent), Seq("pos"))
        .groupBy("vec_id", "label", "c_label")
        .agg(sum((col("x") - col("m")) * (col("x") - col("m"))).as("d2"))
      val ab = d2.groupBy("vec_id", "label")
        .agg(
          min(when(col("c_label") === col("label"), col("d2"))).as("a"),
          min(when(col("c_label") =!= col("label"), col("d2"))).as("b"))
      ab.withColumn("sil",
          when(greatest(col("a"), col("b")) === 0, lit(0.0))
            .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vectors"),
          round(avg(col("sil")), 4).as("mean_silhouette"))
    }),

    // ---- ANOVA effect size (η²): how much of order-value variance the
    // priority dimension explains — SS_between/SS_total as ONE exact
    // rational from per-group integer sums (cross-multiplied, no means
    // materialized): η²·e6 = (n·Σ⌊s_g²/n_g⌋ − S²)·1e6 div (n·Σx² − S²).
    // ⌊s_g²/n_g⌋ is computed by the exact decomposition
    // q·s_g + ⌊r·s_g/n_g⌋ (q, r = divmod(s_g, n_g)) so the big product
    // stays in decimal — a bare `s_g² div n_g` would squeeze ~10¹⁹
    // through the int64 IntegralDivide result and overflow silently.
    // One grouped agg + one 1-row fold ----
    "priority_effect_eta2" -> ((s, dir) => {
      val cents = Tables.orders(s, dir).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      val g = cents.groupBy("o_orderpriority")
        .agg(count(lit(1)).cast("decimal(38,0)").as("ng"),
          sum(col("c")).cast("decimal(38,0)").as("sg"),
          // cents² fits int64 per row but not summed — go decimal first
          sum((col("c") * col("c")).cast("decimal(38,0)")).as("sg2"))
      g.agg(
          sum(col("ng")).as("n"), sum(col("sg")).as("st"),
          sum(col("sg2")).as("sxx"),
          sum(expr("(sg div ng) * sg + ((sg % ng) * sg div ng)"))
            .cast("decimal(38,0)").as("ssb_raw"))
        .selectExpr("CAST(n AS BIGINT) AS n_orders",
          """CAST((n * ssb_raw - st * st) * 1000000
             div nullif(n * sxx - st * st, 0) AS BIGINT) AS eta2_e6""")
    }),

    // ---- weekday uniformity χ²: is traffic flat across the week? χ² for
    // the 7-cell uniform null collapses to (7·Σo² − T²)/T — exact
    // integers end-to-end, no expected-count divisions ----
    "weekday_chi2" -> ((s, dir) => {
      val dow = Tables.events(s, dir)
        .groupBy(dayofweek(to_date(col("ts"))).cast("long").as("dow"))
        .agg(count(lit(1)).as("o"))
      dow.agg(sum(col("o")).as("t"),
          sum((col("o") * col("o")).cast("decimal(38,0)")).as("so2"),
          count(lit(1)).as("n_cells"))
        .selectExpr("CAST(t AS BIGINT) AS n_events",
          "CAST(n_cells AS BIGINT) AS n_cells",
          """CAST((7 * so2 - CAST(t AS DECIMAL(38,0)) * t) * 1000000
             div nullif(CAST(t AS DECIMAL(38,0)), 0) AS BIGINT)
             AS chi2_e6""")
    }),

    // ---- survivorship-policy audit for exact dedup: keep-FIRST (min id,
    // the reproducibility default) vs keep-LONGEST (max n_chars — the
    // CCNet-style quality-aware policy) per duplicate-text group; how
    // often they disagree is the cost of choosing the cheap policy. One
    // grouped pass, max_by for the quality keeper ----
    "dedup_policy_diff" -> ((s, dir) => {
      val groups = Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), md5(col("text")).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("sz"),
          min(col("doc_id")).as("keep_first"),
          max_by(col("doc_id"),
            concat(lpad(col("n_chars").cast("string"), 19, "0"),
              lpad(col("doc_id").cast("string"), 19, "0"))).as("keep_longest"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        count(when(col("sz") > 1, 1)).as("n_dup_groups"),
        count(when(col("keep_first") =!= col("keep_longest"), 1))
          .as("n_disagree"))
    }),

    // ---- duplicate-cluster size histogram: the shape of the dup graph
    // (how many pairs, triples, …) — the number that decides whether
    // dedup is worth a join or a full clustering pass ----
    "dup_cluster_sizes" -> ((s, dir) =>
      dedupClustersFor(s, dir)
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))),

    // ---- seasonal-naive forecast backtest: predict each day's revenue
    // as the value 7 days earlier, score MAE in exact cents — the
    // baseline every forecasting model must beat, and the eval loop is
    // one equi-join of the (bounded) daily relation against its own
    // 7-day shift. Days with no 7-day-old observation are unscored ----
    "seasonal_forecast_mae" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
        .localCheckpoint() // both sides of the shift join
      daily.join(daily.select(date_add(col("d"), 7).as("d"),
          col("c").as("c7")), Seq("d"))
        .agg(count(lit(1)).as("n_days_scored"),
          sum(abs(col("c") - col("c7"))).as("abs_err_cents"))
        .withColumn("mae_cents",
          expr("abs_err_cents div nullif(n_days_scored, 0)"))
    }),

    // ---- CUSUM changepoint: the day where cumulative revenue deviates
    // most from the global-mean trajectory — |cum·n − idx·total| maximized
    // (cross-multiplied, so no division and the argmax is exact). All
    // windows run over the ≤|days| relation; one TakeOrdered(1) ends it ----
    "value_cusum_change" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
      val tot = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("total"))
      val wd = Window.orderBy("d")
      daily
        .withColumn("idx", row_number().over(wd).cast("long"))
        .withColumn("cum", sum(col("c")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .select(col("d").as("change_d"),
          abs(col("cum") * col("n") - col("idx") * col("total"))
            .as("dev_scaled"))
        .orderBy(col("dev_scaled").desc, col("change_d").asc)
        .limit(1)
    }),

    // ---- Poisson bootstrap (Chamandy et al. 2012): the resampling
    // scheme that works in ONE pass at any scale — per (row, resample b)
    // the multinomial count is approximated by an independent Poisson(1)
    // weight, so no global n is needed and the whole thing is a
    // generator + map-side-combinable agg: B rows per partition shuffle,
    // never the data. Determinism/portability: u = family60(md5-hash, b)
    // (one md5 per row for all 32 resamples), weight = inverse-CDF over
    // thresholds frozen at build time (the Benford discipline). Output =
    // the full bootstrap distribution of mean value per event (32 rows);
    // CI bounds are order statistics of it. Weights cap at 6 (tail
    // P ≈ 6e-5 folds into the last bucket — same rule both engines) ----
    "poisson_bootstrap_ci" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      // COLUMNAR fold: the B weights become B projected columns feeding
      // 2B global aggregates — one md5 + B multiply-shifts per row and
      // NO B-fold row blowup (the explode form pushed B·n rows through
      // the agg hash map; this is 2.7× faster at the dilated point and
      // shuffles one 64-field partial row per partition). The 32-row
      // result materializes from the single agg row via one explode.
      val weighted = ev
        .withColumn("__h", graft.functions.PortableHash.hash60(col("event_id")))
        .select(col("v") +: (0 until BootResamples).map { b =>
          poisWeight(graft.functions.PortableHash.family60(col("__h"), b))
            .cast("long").as(s"__w$b")
        }: _*)
      val aggs = (0 until BootResamples).flatMap { b =>
        Seq(sum(when(col("v").isNotNull, col(s"__w$b"))).as(s"__n$b"),
          sum(col(s"__w$b") * col("v")).as(s"__s$b"))
      }
      val rows = (0 until BootResamples).map { b =>
        struct(lit(b).as("b"), col(s"__n$b").as("n"), col(s"__s$b").as("s"))
      }
      weighted.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rows: _*)).as("r"))
        .select(col("r.b").as("resample"), col("r.n").as("n_rows"),
          col("r.s").as("sum_v"))
        .select(col("resample"), col("n_rows"), col("sum_v"),
          flooredMeanE6(col("sum_v"), col("n_rows")).as("mean_cents_e6"))
    }),

    // ---- delete-a-bucket jackknife: leave-one-out estimates over G
    // hash buckets of USERS (the unit of inference — resampling events
    // of one user independently would fake independence). Per-bucket
    // partials + one 1-row total broadcast give all G leave-one-out
    // means in a single pass; the jackknife variance is a trivial
    // client-side fold of the G rows. The standard big-data answer to
    // "error bars on a ratio metric" when users ≫ memory ----
    "jackknife_buckets" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        round(col("value") * 100).cast("long").as("v"))
      val per = ev
        .withColumn("g", pmod(
          graft.functions.PortableHash.hash60(col("user_id")), lit(JackBuckets)))
        .groupBy("g")
        .agg(count(col("v")).as("n_g"), sum(col("v")).as("s_g"))
      val tot = per.agg(sum("n_g").as("n_tot"), sum("s_g").as("s_tot"))
      per.crossJoin(broadcast(tot))
        .select(col("g").cast("int").as("bucket"), col("n_g"), col("s_g"),
          flooredMeanE6(col("s_tot") - col("s_g"), col("n_tot") - col("n_g"))
            .as("loo_mean_e6"))
    }),

    // ---- split-conformal prediction intervals (Vovk's inductive
    // conformal recipe; Lei et al., JASA '18): the calibration half
    // (portable-hash split on event_id, so the oracle reproduces it)
    // fits the per-type point prediction (truncating-div mean cents) and
    // the 90% conformal quantile qhat = the ceil(0.9·(n+1))-th smallest
    // absolute residual; the held-out half measures empirical coverage
    // of pred ± qhat — finite-sample-valid intervals with no
    // distributional assumption, the standard uncertainty wrapper for a
    // point model. The rank selection is the two-phase distinct-residual
    // prefix scan (the value_auc discipline): counts per residual VALUE
    // cumulated over the bounded distinct-cents domain — never a
    // per-type sort of all calibration rows, so the window input is
    // O(distinct residuals), not O(n), at any scale ----
    "conformal_interval" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("calib",
          pmod(graft.functions.PortableHash.hash60(col("event_id")), lit(2L)) === 0)
      val calib = ev.filter(col("calib"))
      val stats = calib.groupBy("event_type")
        .agg(count(lit(1)).as("n_calib"), sum("cents").as("s_calib"))
        .select(col("event_type"), col("n_calib"),
          expr("CAST(s_calib div n_calib AS BIGINT)").as("pred_cents"),
          expr("least(CAST((9 * (n_calib + 1) + 9) div 10 AS BIGINT), n_calib)")
            .as("k"))
      val rc = calib.join(broadcast(stats), Seq("event_type"))
        .select(col("event_type"), col("k"),
          abs(col("cents") - col("pred_cents")).as("r"))
        .groupBy("event_type", "k", "r").agg(count(lit(1)).as("c"))
      val wr = Window.partitionBy("event_type").orderBy(col("r").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qhat = rc.withColumn("cum", sum(col("c")).over(wr))
        .filter(col("cum") >= col("k"))
        .groupBy("event_type").agg(min(col("r")).as("qhat_cents"))
      val testAgg = ev.filter(!col("calib"))
        .join(broadcast(stats.select("event_type", "pred_cents")), Seq("event_type"))
        .join(broadcast(qhat), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_test"),
          sum((abs(col("cents") - col("pred_cents")) <= col("qhat_cents"))
            .cast("long")).as("n_in"))
      stats.join(qhat, Seq("event_type")).join(testAgg, Seq("event_type"))
        .select(col("event_type"), col("n_calib"), col("n_test"),
          col("pred_cents"), col("qhat_cents"),
          flooredMeanE6(col("n_in"), col("n_test")).as("coverage_e6"))
    }),

    // ---- discount elasticity: does a deeper discount move quantity?
    // Signed Pearson-r² per brand between discount (e2) and quantity,
    // closed-form from one aggregation pass of integer moment sums (the
    // CUPED/ts-similarity staging applied per group — no sqrt, decimal
    // ratios, one shuffle) ----
    "discount_elasticity" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          round(col("l_discount") * 100).cast("long").as("x"),
          round(col("l_quantity")).cast("long").as("y"))
        .groupBy("p_brand")
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
          sum(col("y") * col("y")).cast("decimal(38,0)").as("syy"),
          sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"))
        .selectExpr("p_brand", "CAST(n AS BIGINT) AS n_lines",
          """CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
             ((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000
              div nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0))
             AS BIGINT) AS corr2_e6""")),

    // ---- position-based (U-shaped) attribution: each purchase's credit
    // splits over the touches since the user's previous purchase —
    // 40/40 to first and last, 20 split over middles, all in exact e6
    // integers with the floor remainder assigned to the FIRST touch so
    // credit sums to exactly 1e6 per conversion that has at least one
    // preceding touch — a purchase with zero touches since the previous
    // purchase has no rows in its segment and receives no credit (the
    // last-touch row's running-state sibling; segments come from one
    // running purchase count, no self-joins) ----
    "attribution_position" -> ((s, dir) => {
      val wAll = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val seg = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
        .withColumn("seg", coalesce(sum(col("is_p"))
          .over(wAll.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      val wSeg = Window.partitionBy("user_id", "seg")
        .orderBy(col("ts").asc, col("event_id").asc)
      val ranked = seg.filter(col("is_p") === 0)
        .withColumn("rn", row_number().over(wSeg))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy("user_id", "seg")))
      val purchases = seg.filter(col("is_p") === 1)
        .select(col("user_id"), col("seg"))
      ranked.join(purchases, Seq("user_id", "seg"), "left_semi")
        .withColumn("credit_e6", expr(
          """CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN rn = 1 THEN 400000
                       + (200000 - (n - 2) * (200000 div (n - 2)))
                  WHEN rn = n THEN 400000
                  ELSE 200000 div (n - 2) END"""))
        .groupBy(col("event_type").as("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_e6")).as("credit_e6_sum"))
    }),

    // ---- gaps-and-islands: longest consecutive-active-day streak per
    // user (the engagement-streak metric). Island key = day − rank —
    // consecutive days share it, a gap breaks it; both windows partition
    // BY USER, so no global sort and per-group state is one row ----
    "user_streaks" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        .withColumn("island", expr("date_sub(d, row_number() OVER " +
          "(PARTITION BY user_id ORDER BY d))"))
        .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("max_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("len")).as("active_days"))
    }),

    // ---- running distinct users by day, the SCALABLE form: distinct is
    // NOT re-counted per window (that's O(days·users) state) — each user
    // contributes once at their FIRST-SEEN day, and the running total of
    // first-appearances IS the running distinct count. The only window
    // runs over the ≤|days-of-history| relation ----
    "running_distinct_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .groupBy("user_id").agg(min(col("d")).as("first_d"))
        .groupBy("first_d").agg(count(lit(1)).as("n_new"))
        .withColumn("n_cum_distinct",
          sum(col("n_new")).over(Window.orderBy("first_d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))),

    // ---- semi-structured: JSON field extraction from props ----
    "props_extract" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // ---- RAG-style overlapping chunking: 50-token windows, stride 40
    // (10-token overlap), md5 per chunk for a compact oracle surface.
    // Shuffle-free narrow plan (ChunkingSpec asserts no Exchange) ----
    "doc_chunks" -> ((s, dir) =>
      graft.operators.Chunking.tokenChunks(
          Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 50, stride = 40)
        .select(col("doc_id"), col("chunk_idx"),
          size(split(col("chunk"), " ")).cast("long").as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))),

    // ---- market-basket co-occurrence: event types seen together in the
    // same (user, hour) basket. Distinct first (baskets, not raw rows),
    // then a self equi-join on the basket key with a strict type order —
    // per-basket fan-out is bounded by |types|², output by |types|²
    // total. The basket relation shuffles once and joins to itself on
    // the same partitioning ----
    "type_cooccurrence" -> ((s, dir) => {
      val b = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .distinct()
      b.as("a").join(b.as("b2"),
          col("a.user_id") === col("b2.user_id") &&
            col("a.hour") === col("b2.hour") &&
            col("a.event_type") < col("b2.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b2.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_baskets"))
    }),

    // ---- inter-purchase gap: lag per customer, then one exact global
    // median (×4 keeps the interpolated midpoint integer — dyadic, so
    // engine-exact) ----
    "order_gaps" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .agg(
          (percentile(datediff(col("o_orderdate"), col("prev")), lit(0.5)) * 4)
            .cast("long").as("median_gap_x4"),
          count(when(col("prev").isNotNull, 1)).as("n_gaps"))
    }),

    // ---- IQR (Tukey-fence) outlier counts per group: exact per-group
    // quartiles (interpolated percentile — dyadic quarter fractions, so
    // the arithmetic is IEEE-exact and engine-identical), broadcast of
    // the |groups|-row stats relation back onto the data, strict fence
    // comparisons. The stats side is guaranteed tiny → broadcast is
    // correct at any scale ----
    "value_outliers" -> ((s, dir) => {
      val cents = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val stats = cents.groupBy("event_type").agg(
        percentile(col("cents"), lit(0.25)).as("q1"),
        percentile(col("cents"), lit(0.75)).as("q3"))
      val fence = col("q3") - col("q1")
      cents.join(broadcast(stats), Seq("event_type"))
        .groupBy("event_type")
        .agg(
          count(when(col("cents") > col("q3") + lit(1.5) * fence, 1)).as("n_high"),
          count(when(col("cents") < col("q1") - lit(1.5) * fence, 1)).as("n_low"),
          count(lit(1)).as("n"))
    }),

    // ---- data-quality report AS DATA: the expectation-suite shape —
    // row checks in ONE conditional-agg pass, plus duplicate-PK and
    // referential-orphan probes, unpivoted to (check, metric, passed)
    // rows a scheduler can alert on. 1-row aggregate legs cross-join
    // (scalar pattern), so the whole report is three passes total ----
    "dq_report" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val rowChecks = o.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1).otherwise(0)).cast("long").as("null_custkey"),
        sum(when(col("o_totalprice") <= 0, 1).otherwise(0)).cast("long").as("nonpos_price"),
        sum(when(col("o_orderdate").isNull, 1).otherwise(0)).cast("long").as("null_date"))
      val dupPk = o.groupBy("o_orderkey").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).agg(count(lit(1)).as("dup_pk"))
      val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_custkey"))
      rowChecks.crossJoin(dupPk).crossJoin(orphans)
        .selectExpr("stack(6, " +
          "'n_rows', n_rows, 'null_custkey', null_custkey, " +
          "'nonpos_price', nonpos_price, 'null_date', null_date, " +
          "'dup_pk', dup_pk, 'orphan_custkey', orphan_custkey) AS (check, metric)")
        .withColumn("passed",
          when(col("check") === "n_rows", col("metric") > 0)
            .otherwise(col("metric") === 0))
    }),

    // ---- Benford first-digit audit: the classic fabricated-numbers
    // screen for a value column — leading digit of the integer cents
    // (long→string, identical on any engine; no log10 on data) against
    // the Benford expectation log10(1+1/d), which enters BOTH sides as
    // the same precomputed e6 literals ----
    "benford_audit" -> ((s, dir) => {
      val counts = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 0)
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy()
      val expect = typedlit(BenfordE6.map { case (d, e) => (d.toString, e) })
      counts
        .withColumn("freq_e6",
          floor(col("n") * lit(1000000L) / sum(col("n")).over(w) + lit(0.5))
            .cast("long"))
        .withColumn("benford_e6", element_at(expect, col("digit")))
        .withColumn("dev_e6", abs(col("freq_e6") - col("benford_e6")))
    }),

    // ---- closed-form OLS trend per key: slope of daily revenue vs day
    // index from the normal equations — all five sufficient statistics
    // are exact integer sums (days rebased per key to keep products in
    // int64), the slope is ONE deterministic double division; the
    // regression family's map-side-combinable shape (no iterative
    // solver, no matrix) ----
    "daily_trend_ols" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val w = Window.partitionBy("event_type")
      daily
        .withColumn("x", datediff(col("day"), min(col("day")).over(w)).cast("long"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          sum(col("x")).as("__sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("__sxy"),
          sum(col("x") * col("x")).as("__sxx"))
        .withColumn("__num",
          col("n_days") * col("__sxy") - col("__sx") * col("sy"))
        .withColumn("__den",
          col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
        .withColumn("slope_cents_per_day_e6",
          when(col("__den") =!= 0,
            floor(col("__num") * lit(1.0) / col("__den") * lit(1000000.0)
              + lit(0.5)).cast("long")))
        .select("event_type", "n_days", "sy", "slope_cents_per_day_e6")
    }),

    // ---- robust (MAD) outlier fences: median absolute deviation resists
    // the contamination that shifts mean/stddev fences (50% breakdown
    // point vs 0%) — the robust-statistics twin of value_outliers' Tukey
    // form; the 1.4826 constant rescales MAD to σ under normality ----
    "value_mad_outliers" -> ((s, dir) => {
      val cents = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val med = cents.groupBy("event_type")
        .agg(percentile(col("cents"), lit(0.5)).as("med"))
      val dev = cents.join(broadcast(med), Seq("event_type"))
        .withColumn("absdev", abs(col("cents") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("absdev"), lit(0.5)).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(
          first(col("med")).as("med"),
          first(col("mad")).as("mad"),
          count(when(col("absdev") > lit(3.0) * lit(1.4826) * col("mad"), 1))
            .as("n_outliers"),
          count(lit(1)).as("n"))
    }),

    // ---- higher-order array pipeline: per-user event-type histogram as
    // ONE canonical string — collect_list of (type, n) structs,
    // array_sort (struct order = field order, so type asc), transform to
    // "type:n", array_join. The collect_list is per (user, type) AGGREGATED
    // counts (≤ |types| elements), never raw events; at 100 TB the array
    // stays bounded while the string form stays engine-portable ----
    "user_type_profile" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("event_type"), col("n")))),
            x => concat(x.getField("event_type"), lit(":"), x.getField("n"))),
          ",").as("type_profile"))),

    // ---- peak concurrency via DISTRIBUTED sweep-line: each event is a
    // 30-min activity interval; SweepLine's two-phase prefix sum keeps
    // the endpoint sort day-partitioned (parallel) with a bounded
    // per-day offset pass — the oracle's global-ORDER-BY cumsum form is
    // exactly the single-task sort this avoids at 100 TB ----
    "peak_concurrency" -> ((s, dir) =>
      graft.operators.SweepLine.peakConcurrent(
        Tables.events(s, dir),
        col("ts"), col("ts") + expr("interval 30 minutes"))),

    // ---- event transition matrix (first-order Markov counts): lead over
    // the per-user timeline, tie-broken on event_id for determinism, then
    // count (from, to) pairs. One shuffle + one per-partition sort; the
    // transition relation is |types|² rows regardless of data scale ----
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
    }),

    // ---- conditional entropy of the event bigram chain, H(next|cur) —
    // the sequence-predictability number next to mutual_information's
    // dependence screen (how many nats a bigram model leaves on the
    // table). Same bounded-cell discipline: one map-side-combinable
    // shuffle to ≤|types|² cells, marginals as windows over the cells,
    // per-cell ln floored to _e6, and the Σ_cells nij·⌊ln ni⌉ identity
    // carries the marginal entropy through the same relation. ----
    "transition_entropy" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val cells = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
        .agg(count(lit(1)).as("nij"))
      def lnE6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      cells
        .withColumn("ni", sum("nij").over(Window.partitionBy("cur")))
        .withColumn("nn", sum("nij").over(Window.partitionBy(lit(1))))
        .agg(
          max("nn").as("n_transitions"),
          count(lit(1)).as("n_cells"),
          floor(sum(col("nij") * (lnE6(col("ni")) - lnE6(col("nij"))))
            .cast("double") / max("nn") + lit(0.5)).cast("long").as("h_cond_e6"),
          (lnE6(max("nn")) - floor(sum(col("nij") * lnE6(col("ni")))
            .cast("double") / max("nn") + lit(0.5)).cast("long")).as("h_cur_e6"))
    }),

    // ---- next-event prediction table: per state, the argmax of the
    // Laplace-smoothed transition distribution — the bigram-Markov
    // baseline every sequence model must beat, in exact e6 integers
    // ((n+1)·1e6 div (total+V), V = distinct successor vocabulary as a
    // 1-row broadcast). Deterministic argmax via (prob DESC, type ASC) ----
    "next_event_pred" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy("event_type").agg(sum(col("n")).as("tot"))
      val vocab = trans.select("next_type").distinct()
        .agg(count(lit(1)).as("v"))
      trans.join(totals, Seq("event_type")).crossJoin(broadcast(vocab))
        .withColumn("prob_e6",
          expr("CAST((n + 1) * 1000000 div (tot + v) AS BIGINT)"))
        .withColumn("rnk", row_number().over(Window.partitionBy("event_type")
          .orderBy(col("prob_e6").desc, col("next_type").asc)))
        .filter(col("rnk") === 1)
        .select(col("event_type"), col("next_type").as("pred_type"),
          col("n").as("n_obs"), col("prob_e6"))
    }),

    // ---- frequent 3-step paths: the sequence-mining extension of the
    // transition bigram above — one window pass emits both lookaheads,
    // the count aggregate map-side-combines over ≤ |types|³ keys, and
    // the global top-20 is TakeOrdered (k rows to the driver, no sort
    // shuffle). Total order (n DESC, then the path) makes the cut
    // deterministic across engines ----
    "event_paths3" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("step2", lead(col("event_type"), 1).over(w))
        .withColumn("step3", lead(col("event_type"), 2).over(w))
        .filter(col("step2").isNotNull && col("step3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1").asc, col("step2").asc, col("step3").asc)
        .limit(20)
    }),

    // ---- e6-integer PageRank over the event-type transition graph:
    // link-graph importance with the repo's exact-integer portability
    // discipline (floor division at every step), so the 3-iteration
    // power method hash-matches an unrolled SQL oracle — the graph
    // family's first oracle-backed iterative row ----
    "event_type_pagerank" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val edges = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .select(col("event_type"), col("next_type"))
      graft.operators.PageRank.runExactE6(edges, "event_type", "next_type",
          iterations = 3)
        .select(col("id").as("event_type"), col("rank_e6"))
    }),

    // ---- Bradley-Terry preference scores over the transition graph:
    // "moved from A to B" read as B preferred over A; the MM fixpoint
    // runs in e6-quantized exact integers, so the DuckDB oracle unrolls
    // the identical iterations and hash-matches the fitted model ----
    "bt_event_scores" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      graft.operators.Preference.bradleyTerry(
        tr, "next_type", "event_type", weightCol = None, iterations = BtIterations)
    }),

    // ---- ordered funnel (view → click → purchase): earliest timestamp
    // per step per user in ONE conditional-min pass (no per-step joins,
    // no sequence window), then strict-order comparisons. One shuffle on
    // user_id; at 100 TB this beats the N-way self-join funnel by N
    // scans ----
    "event_funnel" -> ((s, dir) => {
      val firstTs = (t: String) =>
        min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("step_view"),
          count(when(col("t_click") > col("t_view"), 1)).as("step_click"),
          count(when(col("t_purchase") > col("t_click") &&
            col("t_click") > col("t_view"), 1)).as("step_buy"))
    }),

    // ---- engine-portable HLL distinct estimate vs the exact count: the
    // sketch family's oracle-checkable member (registers from the
    // portable hash, integer-exact register sums, one shared double
    // constant in the final division — see Sketches scaladoc). Global
    // over event_id so every SF sits in the raw-estimate regime ----
    "approx_distinct_portable" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"))
      val est = graft.operators.Sketches.portableDistinctEstimate(
        ev, Seq.empty, "event_id", p = HllP)
      val exact = ev.agg(countDistinct(col("event_id")).as("n_exact"))
      est.crossJoin(exact)
        .withColumn("err_e6",
          floor(abs(col("n_est") - col("n_exact")).cast("double") * lit(1e6)
            / col("n_exact") + lit(0.5)).cast("long"))
    }),

    // ---- Markov removal-effect attribution (Anderl et al. 2016 shape):
    // each channel's credit is how much the chain's START→CONV
    // absorption probability drops when paths may not pass through it.
    // The DISTRIBUTED work is the per-user path scan (one window pass,
    // partitioned by user) into the ≤(|types|+2)² transition-count
    // relation; that bounded matrix is collected (the IVF-codebook
    // driver-side-model design) and the absorption probabilities come
    // from MarkovIters rounds of exact e6-integer value iteration
    // p'(s) = T(s,CONV) + ⌊Σ_t T(s,t)·p(t) / 1e6⌋ per removal scenario —
    // O(iters·states²·scenarios) driver math, data-size-independent.
    // Paths truncate at the user's FIRST purchase (→ CONV); users who
    // never convert end at NULL. The oracle unrolls the identical
    // iteration CTE by CTE over the same truncating arithmetic. ----
    "attribution_markov" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val fp = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("fp"))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val wDesc = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val path = ev.join(fp, Seq("user_id"), "left")
        .filter(col("fp").isNull || struct(col("ts"), col("event_id")) <= col("fp"))
        .withColumn("state",
          when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")))
        .withColumn("prev", lag(col("state"), 1, "START").over(w))
        .withColumn("rn_desc", row_number().over(wDesc))
      val trans = path.select(col("prev").as("from"), col("state").as("to"))
        .unionByName(path.filter(col("rn_desc") === 1 && col("state") =!= "CONV")
          .select(col("state").as("from"), lit("NULL").as("to")))
        .groupBy("from", "to").agg(count(lit(1)).as("c"))
      // bounded collect: (|event_types|+1)·(|event_types|+2) rows max
      val counts = trans.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
      val fromTot = counts.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
      val tE6 = counts.map { case (f, t, c) => (f, t, c * 1000000L / fromTot(f)) }
      val states = fromTot.keys.toSeq.sorted
      def absorb(removed: String): Long = {
        val tt = tE6.filter(_._1 != removed)
        val tconv = tt.filter(_._2 == "CONV").map { case (f, _, v) => f -> v }
          .toMap.withDefaultValue(0L)
        val ttrans = tt.filter(x => x._2 != "CONV" && x._2 != "NULL")
        var p: Map[String, Long] =
          states.filter(_ != removed).map(st => st -> tconv(st)).toMap
        for (_ <- 1 to MarkovIters) {
          val old = p
          p = p.map { case (st, _) =>
            val acc = ttrans.iterator.filter(_._1 == st)
              .map { case (_, t, v) => v * old.getOrElse(t, 0L) }.sum
            st -> (tconv(st) + acc / 1000000L)
          }
        }
        p.getOrElse("START", 0L)
      }
      val base = absorb("__none")
      val rows = states.filter(_ != "START").map { ch =>
        val pc = absorb(ch)
        (ch, pc, if (base == 0) 0L else 1000000L - pc * 1000000L / base)
      }
      import s.implicits._
      rows.toDF("channel", "p_conv_start_e6", "removal_effect_e6")
    }),

    // ---- leakage-safe K-fold target encoding: the category-to-number
    // feature transform computed OUT-OF-FOLD (each fold's encoding uses
    // only the other folds' labels — the standard guard against target
    // leakage). One map-side-combinable (cat, fold) aggregation; the
    // per-category margins are windows over the |cats|·K-row cell
    // relation. Exact e6 integers end to end. ----
    "target_encode_oof" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("cat"),
          pmod(col("o_orderkey"), lit(OofFolds)).cast("int").as("fold"),
          (col("o_orderstatus") === "F").cast("long").as("y"))
      val wc = Window.partitionBy("cat")
      o.groupBy("cat", "fold").agg(count(lit(1)).as("n"), sum("y").as("sy"))
        .withColumn("n_cat", sum("n").over(wc))
        .withColumn("sy_cat", sum("sy").over(wc))
        .select(col("cat"), col("fold"), col("n").as("n_in_fold"),
          expr("CAST((sy_cat - sy) * 1000000 div nullif(n_cat - n, 0) AS BIGINT)")
            .as("oof_mean_e6"))
    }),

    // ---- last-touch attribution: for every purchase, the most recent
    // PRECEDING non-purchase event of the same user (one running-state
    // window pass — no self-join), rolled up per touch type; NULL bucket
    // = purchases with no prior touch ----
    "attribution_last_touch" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("last_touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy("last_touch")
        .agg(count(lit(1)).as("n_purchases"))
    }),

    // ---- rolling-origin backtest folds (time-series CV): the event span
    // cut into K equal day-buckets; fold k tests on bucket k and trains
    // on everything earlier (expanding origin). Bounds are a 1-row
    // broadcast; the cumulative train count windows over the K-row
    // per-fold relation, never the data ----
    "backtest_folds" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(to_date(col("ts")).as("d"))
      val bounds = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val parts = ev.crossJoin(broadcast(bounds))
        .withColumn("part", expr(
          s"CAST((datediff(d, d0) * $BacktestFolds) div (datediff(d1, d0) + 1) AS INT)"))
        .groupBy("part").agg(count(lit(1)).as("n_test"))
      val w = Window.orderBy("part")
        .rowsBetween(Window.unboundedPreceding, -1)
      parts
        .withColumn("n_train", coalesce(sum(col("n_test")).over(w), lit(0L)))
        .filter(col("part") >= 1) // fold 0 has no training history
        .select(col("part").as("fold"), col("n_train"), col("n_test"))
    }),

    // ---- cohort retention matrix: first-seen day per user (the cohort),
    // then distinct-active (user, day) pairs bucketed by day offset — the
    // standard retention triangle. Two hash shuffles (per-user min, then
    // (cohort, offset) agg); the self-derived dimension (firstseen) joins
    // on user_id so AQE broadcast-sizes it against the activity side ----
    "user_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val firstSeen = ev.groupBy("user_id").agg(min("day").as("cohort"))
      ev.distinct()
        .join(firstSeen, Seq("user_id"))
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // ---- semi-structured via VariantType (Spark 4): parse once into the
    // binary variant encoding, then typed path extraction — the
    // open-schema form that scales to ragged JSON where a fixed
    // from_json StructType can't. Aggregation proves the extracted
    // values behave as native longs downstream ----
    "props_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"))),

    // ---- multimodal: real byte-histogram features (codegen expression),
    // exploded to rows so the oracle can hash-match them ----
    "mm_byte_features" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id").as("asset_id"),
          posexplode(graft.multimodal.Multimodal.byteHistogram(
            encode(col("text"), "UTF-8"), bins = 16)))
        .select(col("asset_id"), col("pos").as("bin"),
          floor(col("col") * lit(1e6) + lit(0.5)).cast("long").as("freq_e6"))),

    // ---- corpus-level rollup over the text stack ----
    "corpus_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(length(col("text"))), 4).as("avg_chars"),
          round(avg(size(split(col("text"), " "))), 4).as("avg_tokens"))),

    // ---- sorted-neighborhood blocking (Hernández-Stolfo): candidate
    // pairs within a sliding window of the corpus sorted by a fuzzy key —
    // the linear-output ER blocking family that catches near-keys exact
    // hashing misses. Global order via GlobalIndex (range repartition,
    // never a one-task window); pairing is a rank equi-join, so
    // partition-boundary pairs survive by construction ----
    // ---- Jaro-Winkler ER scoring (Winkler '90) over sorted-neighborhood
    // candidates: the classic name comparator, as a native codegen'd
    // Expression whose e6 score is an EXACT RATIONAL (no floats) —
    // window-bounded pairs, never corpus², at any scale ----
    "jw_name_pairs" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
        .select(col("p_partkey"), lower(col("p_name")).as("nm"))
      graft.operators.SortedNeighborhood
        .candidatePairs(parts, "p_partkey", "nm", JwWindow)
        .select(col("id_a"), col("id_b"),
          graft.functions.expressions.JaroWinkler
            .jwE6(col("key_a"), col("key_b")).as("jw_e6"))
        .filter(col("jw_e6") >= JwThreshold)
    }),

    "sorted_neighborhood_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(coalesce(lower(col("text")), lit("")), 1, SnmKeyLen).as("snm_key"))
      graft.operators.SortedNeighborhood
        .candidatePairs(docs, "doc_id", "snm_key", SnmWindow)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("rank_dist"),
          (substring(col("key_a"), 1, SnmBlockLen) ===
            substring(col("key_b"), 1, SnmBlockLen)).cast("long").as("block_match"))
    }),

    // ---- market-basket recommendations: co-purchase lift per directed
    // brand pair, top-3 per brand. Baskets = distinct (order, brand) —
    // fan-out per order is bounded by the lines-per-order cap, so the
    // pair expansion is linear; lift = n_ab·N·1e6 div (n_a·n_b), staged
    // in decimal(38,0) (the N²·1e6 product would cap int64 at ~3·10⁶
    // orders; decimal ≡ the oracle's HUGEINT at any scale). One shuffle
    // builds baskets; the 25-row brand margins broadcast back ----
    // ---- frequent 3-itemsets (the Apriori level basket_lift_recs stops
    // short of): same ONE-fact-shuffle basket build, triple expansion as
    // an in-row ordered triple explode (bounded by lines-per-order³ —
    // never a self-join over the fact table), relative support ≥ 0.3% of
    // baskets tested in exact integers against the 1-row total ----
    "basket_triples" -> ((s, dir) => {
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("okey").agg(collect_set(col("p_brand")).as("bs"))
        .localCheckpoint()
      val tot = b.agg(count(lit(1)).as("n_baskets"))
      b.select(explode(col("bs")).as("b1"), col("bs"))
        .select(col("b1"), explode(col("bs")).as("b2"), col("bs"))
        .filter(col("b1") < col("b2"))
        .select(col("b1"), col("b2"), explode(col("bs")).as("b3"))
        .filter(col("b2") < col("b3"))
        .groupBy("b1", "b2", "b3").agg(count(lit(1)).as("n_orders"))
        .crossJoin(broadcast(tot))
        .filter(col("n_orders") * 1000 >= col("n_baskets") * 3)
        .select("b1", "b2", "b3", "n_orders")
    }),

    "basket_lift_recs" -> ((s, dir) => {
      // ONE fact shuffle total: baskets collapse to a per-order brand SET
      // (collect_set dedups in-agg — no separate distinct), and the pair
      // expansion is an in-row double explode bounded by lines-per-order²
      // — no self-join, so no second/third pass over the fact table. The
      // small per-order array relation is materialized once for its three
      // readers (margins, total, pairs)
      val b = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("okey").agg(collect_set(col("p_brand")).as("bs"))
        .localCheckpoint()
      val margins = b.select(explode(col("bs")).as("brand"))
        .groupBy("brand").agg(count(lit(1)).as("n_a"))
      val tot = b.agg(count(lit(1)).as("n_orders"))
      val pairs = b
        .select(explode(col("bs")).as("brand"), col("bs"))
        .select(col("brand"), explode(col("bs")).as("rec_brand"))
        .filter(col("brand") =!= col("rec_brand"))
        .groupBy("brand", "rec_brand")
        .agg(count(lit(1)).as("n_ab"))
      val scored = pairs
        .join(broadcast(margins), Seq("brand"))
        .join(broadcast(margins.select(col("brand").as("rec_brand"),
          col("n_a").as("n_b"))), Seq("rec_brand"))
        .crossJoin(broadcast(tot))
        .withColumn("lift_e6",
          expr("""CAST(n_ab AS DECIMAL(38,0)) * 1000000 * n_orders
                  div (CAST(n_a AS DECIMAL(38,0)) * n_b)"""))
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy("brand")
          .orderBy(col("lift_e6").desc, col("n_ab").desc, col("rec_brand").asc)))
        .filter(col("rnk") <= RecTopK)
        .select(col("brand"), col("rec_brand"), col("n_ab"),
          col("lift_e6"), col("rnk").cast("long").as("rnk"))
    }),

    // ---- CUPED variance reduction (Deng et al. '13): pre-period value
    // as the covariate for post-period value, θ = cov/var from one
    // closed-form pass. Per-user sums in cents, the moment products in
    // decimal(38,0) with `div` (exact integral divide — matches the
    // oracle's HUGEINT `//`; sign split keeps truncation identical for
    // a negative covariance), so the single output row is bit-exact
    // cross-engine. Shape: one user shuffle + a 1-row moment agg;
    // var_reduction_e6 = ρ²·1e6 — the fraction of outcome variance the
    // covariate removes ----
    "cuped_adjusted" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
      val mid = ev.agg(
        expr("(min(us) + max(us)) div 2").as("mid"))
      val perUser = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(
          coalesce(sum(when(col("us") < col("mid"), col("cents"))), lit(0L))
            .cast("decimal(38,0)").as("pre"),
          coalesce(sum(when(col("us") >= col("mid"), col("cents"))), lit(0L))
            .cast("decimal(38,0)").as("post"))
      perUser.agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("pre")).as("sx"), sum(col("post")).as("sy"),
          sum(col("pre") * col("pre")).as("sxx"),
          sum(col("post") * col("post")).as("syy"),
          sum(col("pre") * col("post")).as("sxy"))
        .selectExpr(
          "CAST(n AS BIGINT) AS n_users",
          """CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
             (abs(n*sxy - sx*sy) * 1000000 div nullif(n*sxx - sx*sx, 0))
             AS BIGINT) AS theta_e6""",
          """CAST((abs(n*sxy - sx*sy) * 1000 div nullif(n*sxx - sx*sx, 0)) *
             (abs(n*sxy - sx*sy) * 1000 div nullif(n*syy - sy*sy, 0)) AS BIGINT)
             AS var_reduction_e6""")
    }),

    // ---- half-life-decayed popularity: revenue decayed by 2^(−age/30d),
    // the freshness-weighted ranking signal of every trending chart. The
    // decay curve is a BOUNDED INTEGER DIMENSION (coef(d) = coef(d−1)·K
    // div 1e6 — a 4001-row driver model, the IVF-codebook discipline)
    // broadcast onto the fact scan, so no engine evaluates a
    // transcendental per row and the oracle replays the identical
    // recurrence as a recursive CTE. Age anchor = max ship date (1-row
    // broadcast). One fact scan, two broadcast joins, one agg ----
    "decayed_popularity" -> ((s, dir) => {
      import s.implicits._
      val coef = (1 to DecayMaxAge)
        .scanLeft((0, 1000000L)) { case ((_, c), d) => (d, c * DecayK30 / 1000000L) }
        .toDF("age_days", "coef_e6")
      val bounds = Tables.lineitem(s, dir)
        .agg(max(to_date(col("l_shipdate"))).as("maxd"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), to_date(col("l_shipdate")).as("d"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .crossJoin(broadcast(bounds))
        .withColumn("age_days", datediff(col("maxd"), col("d")))
        .join(broadcast(coef), Seq("age_days"), "left")
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(expr("cents * coalesce(coef_e6, 0) div 1000000"))
            .as("decayed_cents"),
          sum(col("cents")).as("raw_cents"))
    }),

    // ---- survivorship / golden-record merge: one profile row per user
    // with last-writer-wins fields resolved by `max_by` over a
    // zero-padded (ts, event_id) string key — O(1) aggregation state per
    // group (the scalable alternative to sort-per-group), with the
    // latest-NON-NULL rule expressed by nulling the ORDER key (both
    // engines skip null-ordered rows: Spark MaxBy, DuckDB arg_max) ----
    "golden_records" -> ((s, dir) => {
      val ord = concat(
        lpad(unix_micros(col("ts")).cast("string"), 19, "0"),
        lpad(col("event_id").cast("string"), 19, "0"))
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(
          min(col("ts")).as("first_seen"),
          max(col("ts")).as("last_seen"),
          count(lit(1)).as("n_events"),
          max_by(col("event_type"), ord).as("last_type"),
          max_by(round(col("value") * 100).cast("long"),
            when(col("value").isNotNull, ord)).as("last_value_cents"))
    }),

    // ---- Kaplan-Meier customer-churn survival curve: lifetime = first
    // to last order date; churned iff quiet ≥ KmCensorGapDays before the
    // observation end, else right-censored. The survival product
    // S(l) = Π (n_risk−d)/n_risk needs a sequential truncated-integer
    // recurrence, which runs on the DRIVER over the per-lifetime
    // aggregate — a relation bounded by DAYS OF HISTORY (≤ span), never
    // by data size (the decay-table/Bradley-Terry discipline: distribute
    // the heavy agg, recurse over the tiny model, gate before collect).
    // e6 truncation at every step matches the oracle's recursive CTE ----
    "km_churn_curve" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val bounds = orders.agg(max(col("d")).as("maxd"))
      val perLife = orders.groupBy("o_custkey")
        .agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
        .crossJoin(broadcast(bounds))
        .select(datediff(col("ld"), col("fd")).cast("long").as("lifetime"),
          (datediff(col("maxd"), col("ld")) > KmCensorGapDays)
            .cast("long").as("dead"))
        .groupBy("lifetime")
        .agg(sum(col("dead")).as("d"), sum(lit(1L) - col("dead")).as("c"))
        .orderBy(col("lifetime"))
        .collect()
      require(perLife.length <= KmMaxCurve,
        s"km_churn_curve: ${perLife.length} distinct lifetimes exceed the " +
          s"$KmMaxCurve driver-model gate — the curve is bounded by days of " +
          "history, so this means the time unit is wrong, not the data big")
      var surv = 1000000L
      var atRisk = perLife.iterator.map(r => r.getLong(1) + r.getLong(2)).sum
      val curve = perLife.map { r =>
        val (d, c) = (r.getLong(1), r.getLong(2))
        val nRisk = atRisk
        surv = surv * (nRisk - d) / nRisk // truncating int division = oracle `//`
        atRisk -= d + c
        (r.getLong(0), nRisk, d, surv)
      }.toSeq
      curve.toDF("lifetime_days", "n_risk", "n_deaths", "surv_e6")
    }),

    // ---- stratified ATE (the discrete-propensity IPW estimator): mean
    // treated-vs-control spend difference within each event_type
    // stratum, combined with n_s weights — adjusts for the stratum mix
    // the naive difference confounds (the did_estimate hash-half
    // treatment convention). One (stratum, arm) map-side-combinable
    // aggregation; everything after runs over ≤|types|·2 cells. Strata
    // missing an arm drop (no counterfactual) in both engines. ----
    "stratified_ate" -> ((s, dir) => {
      val cell = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull &&
          col("user_id").isNotNull)
        .select(col("event_type").as("stratum"),
          pmod(col("user_id"), lit(2)).cast("long").as("treat"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy("stratum", "treat")
        .agg(count(lit(1)).as("n"), sum("c").as("sc"))
        .withColumn("mean_e6",
          expr("CAST(CAST(sc AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
      cell.groupBy("stratum").agg(
          sum(when(col("treat") === 1, col("n"))).as("n_t"),
          sum(when(col("treat") === 0, col("n"))).as("n_c"),
          max(when(col("treat") === 1, col("mean_e6"))).as("mt"),
          max(when(col("treat") === 0, col("mean_e6"))).as("mc"))
        .filter(col("n_t").isNotNull && col("n_c").isNotNull)
        .select(col("n_t"), col("n_c"),
          ((col("n_t") + col("n_c")) * (col("mt") - col("mc")))
            .cast("decimal(38,0)").as("wd"),
          (col("n_t") + col("n_c")).as("w"))
        .agg(sum("n_t").as("n_treat"), sum("n_c").as("n_ctrl"),
          floor(sum("wd").cast("double") / sum("w") + lit(0.5))
            .cast("long").as("ate_cents_e6"))
    }),

    // ---- Theil T inequality index of per-customer spend — the
    // entropy-based member of the inequality family (Gini/Lorenz/HHI
    // cover rank- and share-based forms; Theil alone decomposes
    // between/within groups). T = Σ (x_i/X)·ln(x_i·n/X): one
    // map-combinable per-customer agg, totals broadcast as a 1-row
    // scalar, per-customer ln floored to _e6 so the weighted sum is an
    // exact integer (decimal-staged — Σ x_i·term overflows int64 at
    // warehouse scale). Zero-spend customers contribute 0 (lim x·ln x)
    // and are excluded identically in both engines. ----
    "spend_theil_index" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
        .filter(col("x") > 0)
      val tot = spend.agg(count(lit(1)).as("n"), sum("x").as("xx"))
      spend.crossJoin(broadcast(tot))
        .select(col("n"), col("xx"),
          (col("x").cast("decimal(38,0)") * floor(
            log(col("x").cast("double") * col("n").cast("double")
              / col("xx").cast("double")) * lit(1000000.0) + lit(0.5))
            .cast("long")).as("term"))
        .agg(max("n").as("n_customers"), max("xx").as("total_cents"),
          sum("term").as("__s"))
        .select(col("n_customers"), col("total_cents"),
          expr("CAST(__s div total_cents AS BIGINT)").as("theil_e6"))
    }),

    // ---- Wilson 95% score intervals for the hourly conversion rate —
    // the CI that stays inside [0,1] at small n (unlike the Wald
    // interval). z frozen as the literal 1.959964; the double
    // expression is written in the identical operation order in both
    // engines, from exact integer counts. 24 bounded arms. ----
    "conversion_wilson_ci" -> ((s, dir) => {
      val arms = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(hour(col("ts")).cast("long").as("arm"))
        .agg(count(lit(1)).as("n"),
          sum((col("event_type") === "purchase").cast("long")).as("pos"))
      val z = lit(1.959964)
      val nd = col("n").cast("double")
      val p = col("pos").cast("double") / nd
      val z2 = z * z
      val denom = lit(1.0) + z2 / nd
      val center = (p + z2 / (lit(2.0) * nd)) / denom
      val hw = z * sqrt(p * (lit(1.0) - p) / nd + z2 / (lit(4.0) * nd * nd)) / denom
      arms.select(col("arm"), col("n"), col("pos"),
        floor((center - hw) * lit(1000000.0) + lit(0.5)).cast("long").as("lo_e6"),
        floor((center + hw) * lit(1000000.0) + lit(0.5)).cast("long").as("hi_e6"))
    }),

    // ---- Hill tail-index estimator over the top-K order statistics of
    // `value` — the heavy-tail diagnostic (α ≈ how Pareto the spend
    // tail is; α ≤ 2 means infinite variance, which changes every
    // sampling/CI decision upstream). Top-K via TakeOrderedAndProject
    // (never a global sort); the mean excess log runs over the K-row
    // bounded set with per-row e6-floored ln (doc_entropy discipline).
    "value_hill_tail" -> ((s, dir) => {
      val top = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("value") > 0)
        .select(round(col("value") * 100).cast("long").as("cents"))
        .orderBy(col("cents").desc).limit(HillK)
      val mn = top.agg(min("cents").as("xk"))
      top.crossJoin(broadcast(mn))
        .select((floor(log(col("cents").cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
          - floor(log(col("xk").cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")).as("d"))
        .agg(count(lit(1)).as("k"), sum("d").as("sum_lnratio_e6"))
        .withColumn("alpha_e6", when(col("sum_lnratio_e6") > 0,
          expr("CAST(k * 1000000000000 div sum_lnratio_e6 AS BIGINT)")))
    }),

    // ---- Gini-impurity feature ranking (the decision-stump screen):
    // weighted impurity of the high-value label under each candidate
    // split feature — lower = more predictive. Invariant to group
    // relabeling, so the Spark/DuckDB dayofweek base-offset needs no
    // reconciliation. One map-combinable agg per feature over bounded
    // groups; purity (pos²+neg²)·1e6 div n is decimal-staged exact. ----
    "gini_impurity_features" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("event_type"), hour(col("ts")).cast("long").as("h"),
          dayofweek(col("ts")).cast("long").as("dw"),
          (round(col("value") * 100).cast("long") >= GiniValueCut)
            .cast("long").as("y"))
      def giniOf(feat: Column, name: String): DataFrame =
        ev.groupBy(feat.as("v"))
          .agg(count(lit(1)).as("n"), sum("y").as("pos"))
          .select(col("n"),
            expr("""CAST((CAST(pos AS DECIMAL(38,0)) * pos
                       + CAST(n - pos AS DECIMAL(38,0)) * (n - pos)) * 1000000
                    div n AS BIGINT)""").as("pur_e6"))
          .agg(sum("n").as("nn"), count(lit(1)).as("n_groups"),
            sum(col("pur_e6").cast("decimal(38,0)")).as("sp"))
          .select(lit(name).as("feature"), col("n_groups"),
            (lit(1000000L) - expr("CAST(sp div nn AS BIGINT)"))
              .as("weighted_gini_e6"))
      giniOf(col("event_type"), "event_type")
        .unionByName(giniOf(col("h"), "hour"))
        .unionByName(giniOf(col("dw"), "dow"))
    }),

    // ---- UCB1 exploration scores (Auer et al. 2002) treating
    // hour-of-day as the arm and purchase as the reward: the
    // batch-computed bandit audit of which traffic slots are
    // under-explored relative to their conversion mean. One bounded
    // 24-arm aggregate + a 1-row total broadcast; the √(2 ln N / n)
    // bonus is the only double math, from exact integer counts. ----
    "bandit_ucb" -> ((s, dir) => {
      val arms = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(hour(col("ts")).cast("long").as("arm"))
        .agg(count(lit(1)).as("n"),
          sum((col("event_type") === "purchase").cast("long")).as("pos"))
      val tot = arms.agg(sum("n").as("nn"))
      arms.crossJoin(broadcast(tot))
        .withColumn("mean_e6",
          expr("CAST(CAST(pos AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)"))
        .select(col("arm"), col("n"), col("mean_e6"),
          (col("mean_e6") + floor(sqrt(lit(2.0)
            * log(col("nn").cast("double")) / col("n").cast("double"))
            * lit(1000000.0) + lit(0.5)).cast("long")).as("ucb_e6"))
    }),

    // ---- two-cohort log-rank test (Mantel-Haenszel) over the
    // km_churn_curve lifetime definitions: does the even-custkey cohort
    // churn at a different hazard than the odd one? Per distinct
    // lifetime t: O₁ = observed group-1 deaths, E₁ₜ = dₜ·n₁ₜ/nₜ, and the
    // hypergeometric variance dₜ·n₁ₜ(nₜ−n₁ₜ)(nₜ−dₜ)/(nₜ²(nₜ−1)) — both
    // as exact decimal(38,0)-staged e6 rationals. At-risk counts are
    // suffix sums over the lifetime relation, bounded by DAYS OF
    // HISTORY (the km_churn_curve bound), so the single-task window is
    // domain-bounded. Times with nₜ ≤ 1 contribute 0 to O−E and V and
    // are excluded in both engines. χ²_e6 from the exact sums in one
    // IEEE step. ----
    "logrank_churn" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      val bounds = orders.agg(max(col("d")).as("maxd"))
      val life = orders.groupBy("o_custkey")
        .agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
        .crossJoin(broadcast(bounds))
        .select(pmod(col("o_custkey"), lit(2)).as("g"),
          datediff(col("ld"), col("fd")).cast("long").as("t"),
          (datediff(col("maxd"), col("ld")) > KmCensorGapDays)
            .cast("long").as("dead"))
      val byT = life.groupBy("t").agg(
        sum(when(col("g") === 1, col("dead")).otherwise(lit(0L))).as("d1"),
        sum(col("dead")).as("d_all"),
        sum(when(col("g") === 1, lit(1L)).otherwise(lit(0L))).as("m1"),
        count(lit(1)).as("m_all"))
      val wSuf = Window.orderBy(col("t").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      byT
        .withColumn("n1", sum("m1").over(wSuf))
        .withColumn("n", sum("m_all").over(wSuf))
        .filter(col("d_all") > 0 && col("n") > 1)
        .select(col("d1"),
          expr("CAST(CAST(d_all AS DECIMAL(38,0)) * n1 * 1000000 div n AS BIGINT)")
            .as("e1t"),
          expr("""CAST(CAST(d_all AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d_all) * 1000000
                  div (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT)""").as("vt"))
        .agg(sum("d1").as("o1"), sum("e1t").as("e1_e6"), sum("vt").as("v_e6"))
        .withColumn("__diff", (col("o1") * lit(1000000L) - col("e1_e6")).cast("double"))
        .withColumn("chi2_e6",
          when(col("v_e6") > 0,
            floor(col("__diff") * col("__diff") / col("v_e6").cast("double")
              + lit(0.5)).cast("long")))
        .select("o1", "e1_e6", "v_e6", "chi2_e6")
    }),

    // ---- A/B-test minimum detectable effect per event_type: the
    // experiment-sizing number next to ab_test_zsq's readout —
    // MDE = (z₀.₉₇₅+z₀.₈₀)·σ·√(2/n) for a 50/50 split at 80% power,
    // the z-sum frozen as the literal 2.801585 so no engine evaluates
    // an inverse normal. One moments pass per stratum; σ comes exactly
    // from n·Σc²−(Σc)² (decimal-staged), and the double expression is
    // written in the identical operation order in both engines. ----
    "ab_mde" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("sc"),
          sum(col("c") * col("c")).as("sc2"))
        .withColumn("v", col("n").cast("decimal(38,0)") * col("sc2")
          - col("sc").cast("decimal(38,0)") * col("sc"))
        .select(col("event_type"), col("n"),
          floor(lit(2.801585) * sqrt(col("v").cast("double"))
            * sqrt(lit(2.0) / col("n").cast("double"))
            / col("n").cast("double") * lit(1000000.0) + lit(0.5))
            .cast("long").as("mde_cents_e6"))
    }),

    // ---- Neyman optimal stratified allocation: sample budget per
    // stratum ∝ N_h·σ_h, with the largest-remainder method making the
    // integer allocations sum exactly to the budget. The only
    // distributed work is one map-side-combinable moments pass per
    // stratum; N_h·σ_h = √(n·Σc²−(Σc)²) exactly (the n² cancels), staged
    // in decimal(38,0) so (Σc)² cannot overflow. Floor shares, remainder
    // ranking, and the +1 top-up all run over the ≤|event_types|-row
    // strata relation (domain-bounded windows). ----
    "neyman_allocation" -> ((s, dir) => {
      val st = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("sc"),
          sum(col("c") * col("c")).as("sc2"))
        .withColumn("w", sqrt(
          (col("n").cast("decimal(38,0)") * col("sc2")
            - col("sc").cast("decimal(38,0)") * col("sc")).cast("double")))
      val wAll = Window.partitionBy(lit(1))
      val shares = st
        .withColumn("wtot", sum("w").over(wAll))
        .withColumn("exact", col("w") * lit(NeymanBudget.toDouble) / col("wtot"))
        .withColumn("a0", floor(col("exact")).cast("long"))
        .withColumn("rem", col("exact") - col("a0"))
        .withColumn("left", lit(NeymanBudget.toLong) - sum("a0").over(wAll))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("event_type").asc)).cast("long"))
      shares.select(col("event_type"), col("n").as("n_rows"),
        (col("a0") + when(col("rk") <= col("left"), 1L).otherwise(0L))
          .as("alloc"))
    }),

    // ---- RFM segmentation: recency/frequency/monetary quartile scores
    // per customer, rolled up per segment. Quartile thresholds are a
    // 1-ROW broadcast (exact interpolated percentiles — the
    // value_outliers pattern), scored by comparison: NO global ntile
    // window (a no-partition ntile is one task at any scale; threshold
    // broadcast + filter is the same quartile, embarrassingly parallel).
    // Segment code r·100+f·10+m, where 4 = best quartile on each axis ----
    "rfm_segments" -> ((s, dir) => {
      val bounds = Tables.orders(s, dir)
        .agg(max(to_date(col("o_orderdate"))).as("maxd"))
      val cust = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("monetary_cents"))
        .crossJoin(broadcast(bounds))
        .withColumn("recency_days",
          datediff(col("maxd"), col("last_order")).cast("long"))
      val th = cust.agg(
        percentile(col("recency_days"), lit(0.25)).as("r1"),
        percentile(col("recency_days"), lit(0.5)).as("r2"),
        percentile(col("recency_days"), lit(0.75)).as("r3"),
        percentile(col("frequency"), lit(0.25)).as("f1"),
        percentile(col("frequency"), lit(0.5)).as("f2"),
        percentile(col("frequency"), lit(0.75)).as("f3"),
        percentile(col("monetary_cents"), lit(0.25)).as("m1"),
        percentile(col("monetary_cents"), lit(0.5)).as("m2"),
        percentile(col("monetary_cents"), lit(0.75)).as("m3"))
      val gt = (v: String, q: String) => when(col(v) > col(q), 1L).otherwise(0L)
      cust.crossJoin(broadcast(th))
        .withColumn("r_score", // low recency = recent = best
          lit(4L) - gt("recency_days", "r1") - gt("recency_days", "r2")
            - gt("recency_days", "r3"))
        .withColumn("f_score",
          lit(1L) + gt("frequency", "f1") + gt("frequency", "f2")
            + gt("frequency", "f3"))
        .withColumn("m_score",
          lit(1L) + gt("monetary_cents", "m1") + gt("monetary_cents", "m2")
            + gt("monetary_cents", "m3"))
        .groupBy((col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("monetary_cents")).as("segment_cents"))
    }),

    // ---- personalized PageRank recommendations: random-walk-with-restart
    // relevance over the brand co-purchase graph, anchored at one seed
    // brand — the Pixie-style graph recommender on top of the same basket
    // edges basket_lift_recs scores pointwise. Exact-e6 power iteration,
    // oracle unrolls the identical 3 rounds ----
    "ppr_brand_recs" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"), col("l_partkey"))
        .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("okey").agg(collect_set(col("p_brand")).as("bs"))
        .select(explode(col("bs")).as("brand"), col("bs"))
        .select(col("brand"), explode(col("bs")).as("rec_brand"))
        .filter(col("brand") =!= col("rec_brand"))
      graft.operators.PageRank.runPersonalizedE6(
          edges, "brand", "rec_brand", Seq(PprSeed), iterations = PprIters)
        .select(col("id").as("brand"), col("rank_e6"))
    }),

    // ---- two-proportion A/B z² statistic, integer-exact: per-user
    // conversion (any purchase) with a deterministic hash-parity arm
    // split; z² closed form as one rational — (x_a·n_b − x_b·n_a)²·N·1e6
    // div (n_a·n_b·X·(N−X)) — staged in decimal(38,0) with `div`, so the
    // single output row hash-matches the oracle's HUGEINT arithmetic.
    // (Magnitude bound: the squared term caps the exact form at ~3·10⁷
    // users/arm in 38 digits; past that, divide through by N before
    // squaring at the cost of ≤1 ulp-e6.) One user shuffle, one 1-row
    // moment agg — the CUPED discipline applied to the hypothesis test ----
    "ab_test_zsq" -> ((s, dir) => {
      val arms = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("arm", pmod(col("user_id"), lit(2)))
      arms.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L))
            .cast("decimal(38,0)").as("n_a"),
          sum(when(col("arm") === 1, 1L).otherwise(0L))
            .cast("decimal(38,0)").as("n_b"),
          coalesce(sum(when(col("arm") === 0, col("converted"))), lit(0L))
            .cast("decimal(38,0)").as("x_a"),
          coalesce(sum(when(col("arm") === 1, col("converted"))), lit(0L))
            .cast("decimal(38,0)").as("x_b"))
        .selectExpr(
          "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
          "CAST(x_a AS BIGINT) AS x_a", "CAST(x_b AS BIGINT) AS x_b",
          """CAST((x_a*n_b - x_b*n_a) * (x_a*n_b - x_b*n_a) * (n_a + n_b)
             * 1000000 div nullif(n_a * n_b * (x_a + x_b)
             * (n_a + n_b - x_a - x_b), 0) AS BIGINT) AS z2_e6""")
    }),

    // ---- tokenizer-sizing coverage curve: what share of corpus tokens
    // the top-S vocabulary types cover, at a ladder of candidate sizes —
    // the curve that picks a tokenizer's vocab budget. Rank and running
    // mass both come from the two-phase PrefixSum scan (range partition
    // + per-partition pass + offset broadcast) — NEVER an unpartitioned
    // window, which would pull the whole vocabulary through one task.
    // The vocab relation is corpus-compressed (types, not tokens), so
    // both passes run over the small side of the pipeline ----
    "vocab_coverage_curve" -> ((s, dir) => {
      val tf = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .localCheckpoint() // feeds the total and both scan passes
      val tot = tf.agg(sum(col("n")).as("total_tokens"))
      val curve = graft.operators.PrefixSum.runningTotals(tf,
        Seq("cum_tokens" -> col("n"), "vocab_size" -> lit(1)),
        col("n").desc, col("tok").asc)
      curve
        .filter(col("vocab_size").isin(VocabSizes.map(_.toLong): _*))
        .crossJoin(broadcast(tot))
        .select(col("vocab_size"), col("cum_tokens"),
          expr("cum_tokens * 1000000 div total_tokens").as("coverage_e6"))
    }),

    // ---- time-constrained funnel: view → click within 1h of the FIRST
    // view → purchase within 24h of that click. Three conditional-min
    // aggregations on the same user key — consecutive stages join on the
    // partitioning the first shuffle established, so the whole cascade is
    // ONE exchange plus two co-partitioned joins (AQE reuses the hash),
    // never an N-way self-join of the raw stream ----
    "event_funnel_windowed" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us"))).as("t_view"))
      val c = ev.join(v, Seq("user_id"))
        .groupBy("user_id")
        .agg(
          first(col("t_view")).as("t_view"),
          min(when(col("event_type") === "click" &&
            col("us") > col("t_view") &&
            col("us") <= col("t_view") + lit(3600L * 1000000L),
            col("us"))).as("t_click"))
      val p = ev.join(c, Seq("user_id"))
        .groupBy("user_id")
        .agg(
          first(col("t_view")).as("t_view"),
          first(col("t_click")).as("t_click"),
          min(when(col("event_type") === "purchase" &&
            col("us") > col("t_click") &&
            col("us") <= col("t_click") + lit(24L * 3600L * 1000000L),
            col("us"))).as("t_buy"))
      p.agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("step_view"),
        count(col("t_click")).as("step_click_1h"),
        count(col("t_buy")).as("step_buy_24h"))
    }),

    // ---- SNM blocking-recall audit (the lsh_pr_audit discipline applied
    // to the sorted-neighborhood family): truth = same-key pairs counted
    // ARITHMETICALLY from group sizes (Σ g·(g−1)/2 — no pair
    // materialization, so a hot key costs one aggregate row, never g²);
    // caught = window pairs whose keys match. Tells you whether the
    // window size covers the duplicate-group sizes in the data ----
    "snm_recall_audit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          substring(coalesce(lower(col("text")), lit("")), 1, SnmKeyLen).as("snm_key"))
      val truth = docs.groupBy("snm_key").agg(count(lit(1)).as("g"))
        // decimal staging: a genuinely hot key (the case this arithmetic
        // form exists for) would overflow g·(g−1) in int64 around g≈3·10⁹
        .agg(coalesce(sum(expr("CAST(g AS DECIMAL(38,0)) * (g - 1) div 2")),
          lit(0L)).as("n_truth_pairs"))
      val pairs = graft.operators.SortedNeighborhood
        .candidatePairs(docs, "doc_id", "snm_key", SnmWindow)
        .agg(count(lit(1)).as("n_window_pairs"),
          count(when(col("key_a") === col("key_b"), 1)).as("n_caught"))
      pairs.crossJoin(broadcast(truth))
        .select(col("n_truth_pairs"), col("n_window_pairs"), col("n_caught"),
          expr("n_caught * 1000000 div nullif(n_truth_pairs, 0)")
            .as("recall_e6"))
    }),

    // ---- multi-pass SNM (the standard production form): a second
    // sliding-window pass over a REVERSED-token key, unioned with the
    // forward pass — a typo that breaks forward sort locality rarely
    // breaks the reversed ordering too. n_passes (1 or 2) is the
    // matcher-confidence prior; passes are independent linear scans ----
    "snm_multipass_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), coalesce(lower(col("text")), lit("")).as("lt"))
        .select(col("doc_id"),
          substring(col("lt"), 1, SnmKeyLen).as("k_fwd"),
          substring(concat_ws(" ", reverse(split(col("lt"), " "))),
            1, SnmKeyLen).as("k_rev"))
      graft.operators.SortedNeighborhood.candidatePairsMultiKey(
        docs, "doc_id", Seq("k_fwd", "k_rev"), SnmWindow)
    }),

    // ---- revenue concentration (exact Gini): how unequal per-part
    // revenue is — the long-tail metric behind catalog/curation calls.
    // Gini = Σ(2i−n−1)·x_(i) / (n·Σx) over ASC-sorted values needs a
    // global rank, which comes from the PrefixSum two-phase scan (range
    // partition + offsets — never a one-task window); the weighted sum
    // stages in decimal(38,0) so the single output row matches the
    // oracle's HUGEINT arithmetic at any magnitude ----
    "gini_concentration" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .localCheckpoint() // feeds the rank scan and the totals
      val tot = rev.agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"))
      graft.operators.PrefixSum.runningTotal(
          rev, "rnk", lit(1), col("cents").asc, col("l_partkey").asc)
        .crossJoin(broadcast(tot))
        .agg(
          sum((col("rnk") * 2 - col("n") - 1).cast("decimal(38,0)")
            * col("cents").cast("decimal(38,0)")).as("num"),
          first(col("n")).as("n"), first(col("sx")).as("sx"))
        .selectExpr(
          "CAST(n AS BIGINT) AS n_parts",
          "CAST(sx AS BIGINT) AS total_cents",
          """CAST(num * 1000000 div (CAST(n AS DECIMAL(38,0))
             * CAST(sx AS DECIMAL(38,0))) AS BIGINT) AS gini_e6""")
    }),

    // ---- cohort LTV curve: cumulative revenue per signup-month cohort
    // by months-since-signup — user_retention's money sibling. The data
    // work is two keyed aggs (first month per customer, then revenue per
    // (cohort, age)); the running total windows over the MONTHS² curve
    // relation, never the orders. Month index as yr·12+mo integers, so
    // the age arithmetic is engine-exact ----
    "cohort_ltv_curve" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val fc = o.groupBy("o_custkey").agg(min(col("m")).as("cohort_m"))
      val curve = o.join(fc, Seq("o_custkey"))
        .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("age_months"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev_cents"))
      curve
        .withColumn("cum_rev_cents",
          sum(col("rev_cents")).over(Window.partitionBy("cohort_m")
            .orderBy("age_months")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("cohort_m").cast("long").as("cohort_m"),
          col("age_months").cast("long").as("age_months"),
          col("n_orders"), col("rev_cents"), col("cum_rev_cents"))
    }),

    // ---- time-series similarity search (EDBT'19/REPOSE family): top-k
    // most-correlated users to a query panel, over hourly activity
    // series. Pearson correlation on the FULL slot grid computed from
    // sparse non-zero entries only — zeros contribute nothing to Σxy, so
    // num = T·Σxy − Σx·Σy needs just the co-active-hour equi-join plus
    // per-user margins; nothing ever densifies. Ranking key is the
    // sign-preserving corr² in e6 (monotone in corr — no sqrt, so the
    // score stays an exact rational in decimal(38,0) and the oracle
    // hash-matches). Panel = 8 hash-sampled users broadcast (the
    // recall-panel rule): the candidate join is panel-linear, never
    // users². Candidates = users sharing ≥1 active hour with the query —
    // a restriction the oracle applies identically, so results
    // hash-match; note it makes the top-k approximate in one regime:
    // when a panel user has fewer than k candidates with non-negative
    // correlation, an excluded never-co-active pair's signed corr² can
    // exceed an included one's (variance scaling differs per candidate)
    // and the list truncates rather than backfills ----
    "ts_similarity_topk" -> ((s, dir) => {
      val series = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), expr("unix_timestamp(ts) div 3600").as("h"))
        .groupBy("user_id", "h").agg(count(lit(1)).as("c"))
        .localCheckpoint() // read by margins, the panel slice and the join
      val bounds = series.agg((max(col("h")) - min(col("h")) + 1).as("t_slots"))
      val margins = series.groupBy("user_id")
        .agg(sum(col("c")).as("sx"), sum(col("c") * col("c")).as("sxx"))
      val panel = margins.select(col("user_id").as("qu"),
          graft.functions.PortableHash.hash60(col("user_id")).as("__ph"))
        .orderBy(col("__ph").asc, col("qu").asc).limit(TsPanel)
        .select("qu")
      val qm = margins.join(broadcast(panel),
          margins("user_id") === col("qu"))
        .select(col("qu"), col("sx").as("qsx"), col("sxx").as("qsxx"))
      val qSeries = series.join(broadcast(panel),
          series("user_id") === col("qu"))
        .select(col("qu"), col("h"), col("c").as("qc"))
      val scored = series.join(broadcast(qSeries), Seq("h"))
        .filter(col("user_id") =!= col("qu"))
        .groupBy("qu", "user_id")
        .agg(sum(col("qc") * col("c")).as("sxy"))
        .join(broadcast(qm), Seq("qu"))
        .join(margins, Seq("user_id"))
        .crossJoin(broadcast(bounds))
        .selectExpr("qu", "user_id",
          """CAST(t_slots AS DECIMAL(38,0)) * sxy
             - CAST(qsx AS DECIMAL(38,0)) * sx AS num""",
          """CAST(t_slots AS DECIMAL(38,0)) * qsxx
             - CAST(qsx AS DECIMAL(38,0)) * qsx AS vq""",
          """CAST(t_slots AS DECIMAL(38,0)) * sxx
             - CAST(sx AS DECIMAL(38,0)) * sx AS vu""")
        .selectExpr("qu", "user_id",
          """CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
             (num * num * 1000000 div nullif(vq * vu, 0)) AS BIGINT)
             AS corr2_e6""")
        .filter(col("corr2_e6").isNotNull)
      scored
        .withColumn("rnk", row_number().over(Window.partitionBy("qu")
          .orderBy(col("corr2_e6").desc, col("user_id").asc)))
        .filter(col("rnk") <= TsK)
        .select(col("qu"), col("user_id"), col("corr2_e6"),
          col("rnk").cast("long").as("rnk"))
    }),
  )
}
