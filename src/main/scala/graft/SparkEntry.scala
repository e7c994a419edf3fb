package graft

import graft.etl.MusicKpis
import graft.functions.Text
import graft.operators.{Dedup, GroupTop, Mixture, Similarity}
import graft.quality.Checks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one named query per implemented operator (SURVEY.md §2
  * plus the training-data-pipeline extensions), each with a DuckDB oracle
  * where the semantics are ANSI-SQL-expressible.
  *
  * Cross-engine determinism rules used throughout (so the driver's
  * hash-compare is stable):
  *  - every aggregate / computed column is aliased identically here and in
  *    the oracle SQL;
  *  - floating-point aggregates are rounded on BOTH sides (sum order differs
  *    across engines by ~1 ulp; rounding absorbs it);
  *  - every ranking is ordered by (rounded measure, id) — never by a raw
  *    float alone.
  */
object SparkEntry {

  // ---- ANN / probabilistic-dedup configurations ----
  // Single source of truth for BOTH the registered query and its generated
  // DuckDB oracle below — drift between the two is a silent hash-mismatch.
  private val Dim = 64          // embedding dimensionality (TESTDATA.md)
  private val PcRounds = 8      // embedding_top_pc: power-iteration rounds
  private val ShardK = 8        // export_shards: training-shard count
  private val DecontamPanel = 40 // semantic_decontam: held-out panel size
  private val AnnK = 5          // top-k for every ANN query
  private val LshBits = 10      // lsh_topk: bits per hyperplane table
  private val LshTables = 4     // lsh_topk: independent tables
  private val NdBits = 10       // near_dup_lsh: bits per table
  private val NdTables = 2      // near_dup_lsh: independent tables
  private val NdThreshold = 0.4 // near_dup_lsh: cosine threshold
  private val IvfNlist = 16     // ivf_topk: cells
  private val IvfNprobe = 4     // ivf_topk: probed cells per query
  private val MhHashes = 64     // minhash_lsh_pairs: signature length
  private val MhBands = 16      // minhash_lsh_pairs: LSH bands
  private val MhThreshold = 0.35
  private val ShMaxHamming = 7  // simhash_pairs: Hamming radius
  private val ShBlocks = 9      // simhash_pairs: block count (60-bit portable)
  private val ShBlocksPerKey = 2 // simhash_pairs: blocks per join key
  private val LpDegCap = 32     // dup_link_prediction: wedge-center degree cap
  private val LpTopK = 50       // dup_link_prediction: predicted links kept
  private val SemNlist = 16     // semantic_dedup_*: codebook cells (= IvfNlist codebook)
  private val SemThreshold = 0.4 // semantic_dedup_*: within-cell cosine threshold
  private val SubK = 6          // substring_dup_*: token-window length
  private val BpeTopK = 20      // bpe_pair_stats: merge candidates kept
  private val CtPool = 32       // contrastive_triplets: negative-pool size
  private val DsirBuckets = 256 // dsir_weights: hashed-feature buckets
  private val PqM = 8           // pq_topk: subspaces (64-dim → 8×8)
  private val PqK = 16          // pq_topk: codewords per subspace
  private val RecallPanel = 64  // *_recall: hash-sampled query-panel size
  private val BqCandK = 20      // bq_rerank: binary candidates per query
                                // before the exact-cosine rerank (4×AnnK)
  private val MaxSimGroup = 8   // maxsim_topk: vectors per multi-vector doc
  private val MaxSimPanel = 16  // maxsim_topk: hash-sampled query-doc panel
  private val KmvK = 64         // kmv_type_jaccard: k minimum values per set
  private val RpK = 16          // embedding_rp_audit: JL target dimensions
  private val PrThreshold = 0.2 // lsh_pr_audit: Jaccard cut for truth AND prediction
  /** Benford expectation floor(log10(1+1/d)·1e6+0.5) per leading digit —
    * computed ONCE here and baked as literals into both the Spark plan
    * and the DuckDB oracle, so no engine evaluates a transcendental. */
  private val BenfordE6: Map[Int, Long] = (1 to 9).map(d =>
    d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5).toLong).toMap
  /** dup_graph_kcore: peel-round budget shared by the Spark loop (cap)
    * and the generated oracle (unroll depth) — the two sides agree BY
    * CONSTRUCTION at any convergence speed: a corpus reaching the
    * fixpoint earlier makes the extra rounds no-ops on both engines, and
    * one that hasn't converged by the cap truncates identically on both.
    * Also bounds the pathological case (a long path needs O(n) rounds,
    * each paying a localCheckpoint + count). */
  private[graft] val KcoreMaxRounds = 8
  private val AlignK = 4        // margin_align_pairs: neighborhood size
  private val AlignMinMarginE6 = 1000000L // margin ≥ 1.0: above neighborhood avg
  private val BtIterations = 3  // bt_event_scores: MM fixpoint iterations
  private val BacktestFolds = 5 // backtest_folds: expanding-origin buckets
  private val HllP = 8          // approx_distinct_portable: 2^8 registers
  private val CmsDepth = 4      // heavy_hitters_cms: hash rows (δ = e^-4)
  private val CmsWidth = 256    // heavy_hitters_cms: buckets/row (ε = e/256)
  private val SnmWindow = 2     // sorted_neighborhood_pairs: slide size
  private val JwWindow = 10     // jw_name_pairs: SNM window over part names
  private val JwThreshold = 600000L // jw_name_pairs: keep pairs >= 0.6
  private val SnmKeyLen = 16    // sorted_neighborhood_pairs: blocking-key chars
  private val SnmBlockLen = 8   // sorted_neighborhood_pairs: strict-block prefix
  private val RecTopK = 3       // basket_lift_recs: recommendations per brand
  /** decayed_popularity: floor(1e6·2^(−1/HalfLife)) for HalfLife=30 days —
    * the one transcendental, frozen as a literal shared with the oracle;
    * every later coefficient comes from the integer recurrence
    * coef(d) = coef(d−1)·K div 1e6, identical in both engines. */
  private val DecayK30 = 977159L
  private val DecayMaxAge = 4000 // decayed_popularity: coef table span (days)
  private val ZipfTopK = 256    // zipf_slope: rank-frequency head size
  private val KmeansK = 8       // kmeans_fit: clusters
  private val KmeansRounds = 3  // kmeans_fit: unrolled Lloyd rounds
  private val KmeansSweepKs = Seq(2, 4, 8) // kmeans_k_sweep: elbow points
  private val MarkovIters = 12  // attribution_markov: value-iteration rounds
  private val NeymanBudget = 1000 // neyman_allocation: total sample budget
  private val HarmonicCapD = 8  // dup_graph_harmonic: expansion fan-out cap
  private val SpanMaskPct = 15  // span_corruption: per-position mask rate %
  private val HillK = 256       // value_hill_tail: tail order statistics
  private val GiniValueCut = 2000L // gini_impurity_features: label = cents >= cut
  private val OofFolds = 5      // target_encode_oof: hash folds
  private val PmiMinCount = 5   // term_pmi_pairs: collocation support floor
  private val PmiTopK = 20      // term_pmi_pairs: collocations returned
  private val TrigramPattern = "data batch" // trigram_search: query substring
  private val BomMaxDepth = 4   // sql_recursive_bom: recursion depth bound
  private val KmCensorGapDays = 90 // km_churn_curve: churned iff quiet this long
  private val KmMaxCurve = 100000  // km_churn_curve: curve-length gate (days)
  private val PprSeed = "Brand#1"  // ppr_brand_recs: walk-restart anchor
  private val PprIters = 3         // ppr_brand_recs: power iterations
  private val VocabSizes = Seq(16, 64, 256, 1024) // vocab_coverage_curve
  private val TsPanel = 8 // ts_similarity_topk: hash-sampled query users
  private val TsK = 5     // ts_similarity_topk: neighbors kept per query
  private val BootResamples = 32 // poisson_bootstrap: resample count B
  private val JackBuckets = 20   // jackknife_buckets: delete-a-bucket groups
  /** Inverse-CDF thresholds of the Poisson(1) bootstrap weight:
    * floor(P(X ≤ k)·2^60) for k = 0..5, weights capped at 6 (P ≈ 6e-5
    * tail folded into the last bucket). Computed ONCE here and baked as
    * literals into both engines — the Benford/decay discipline for the
    * one transcendental (e^−1) the scheme needs. */
  private val PoisCumE60: IndexedSeq[Long] = {
    val pmf = (0 to 5).scanLeft(math.exp(-1.0)) { case (p, k) => p / (k + 1) }
    pmf.take(6).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * math.pow(2.0, 60)).toLong).toIndexedSeq
  }
  /** Poisson(1) weight of a 60-bit uniform: the number of CDF thresholds
    * at or below `u`. */
  private def poisWeight(u: Column): Column =
    PoisCumE60.tail.zipWithIndex
      .foldLeft(when(u < lit(PoisCumE60.head), 0)) {
        case (acc, (t, i)) => acc.when(u < lit(t), i + 1)
      }.otherwise(6)
  /** DuckDB rendering of [[poisWeight]] over SQL expression `u`. */
  private def poisWeightSql(u: String): String =
    PoisCumE60.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 6 END")
  /** Exact floor(a·1e6 / b) in decimal-38 (overflow-safe at any SF).
    * Spark side is the pmod identity (true floor); the DuckDB mirror is
    * `//` (truncation toward zero) — identical ONLY because every
    * numerator fed here is non-negative (cents of a value ≥ 0 domain),
    * the repo-wide rule for hash-compared division. */
  private def flooredMeanE6(a: Column, b: Column): Column = {
    val x = a.cast("decimal(38,0)") * lit(1000000L)
    // nullif: an empty group yields NULL (matching every oracle's
    // `// nullif(n, 0)`) instead of an ANSI DIVIDE_BY_ZERO crash
    val d = nullif(b, lit(0L))
    ((x - pmod(x, d)) / d).cast("long")
  }

  /** Scratch base for the snapshot-backed queries, recursively deleted at
    * JVM exit: each invocation publishes full-table parquet versions, and
    * repeated bench/verify runs must not accumulate them in /tmp. (The
    * result DataFrame reads these files lazily, so deletion can only
    * happen at exit, not eagerly.) */
  private def tempSnapshotBase(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(dir.toFile)
    }
    dir.toString + "/snapshot"
  }
  // doc_blocklist: stand-in unsafe-term list (real deployments load 10²-10⁵
  // terms; these exist in the synthetic vocabulary so the filter bites)
  private val BlockTerms = Seq("slow", "stream", "batch")
  // corpus_curate3 thresholds, set from the sf0.001/sf0.01 score
  // distributions so EVERY stage removes documents at every SF:
  private val C3MaxHits = 4L        // blocklist cap (median n_hits = 5)
  private val C3MaxNll = 3430000L   // LM perplexity ceiling (~p70)
  private val C3MinLr = -16000L     // DSIR weight floor (~median)

  /** streams⋈songs⋈users stand-in over the testdata star schema:
    * events ⋈ customer (user_id) ⋈ nation (c_nationkey), + date/hour. */
  private def enrichedEvents(s: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.events(s, dir)
    val cust = Tables.customer(s, dir).withColumnRenamed("c_custkey", "user_id")
    val nat  = Tables.nation(s, dir).withColumnRenamed("n_nationkey", "c_nationkey")
    MusicKpis.enrich(ev, cust, "user_id", nat, "c_nationkey", "ts")
  }

  /** Flagship: the reference's genre-KPI pipeline shape on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("genre_kpis")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation core (A1a/A1b + partial agg at scale) ----
    "q1_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          count(lit(1)).as("count_order"))),

    // ---- J1+J2+P3+P4: two broadcast left joins + date/hour derivation ----
    "enrich_events" -> ((s, dir) =>
      enrichedEvents(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("c_name"), col("c_mktsegment"), col("n_name"), col("date"), col("hour"))),

    // ---- reference parity: genre KPIs (count/avg/deterministic mode) ----
    "genre_kpis" -> ((s, dir) =>
      MusicKpis.genreKpis(
          enrichedEvents(s, dir),
          genreCol = "event_type", countCol = "event_id", avgCol = "value",
          modeCol = "c_mktsegment", modeOut = "top_segment")
        .select(
          col("event_type"), col("date"), col("listen_count"),
          round(col("avg_duration"), 6).as("avg_value"), col("top_segment"))),

    // ---- reference parity: hourly KPIs (countDistinct/top-k/diversity) ----
    "hourly_kpis" -> ((s, dir) =>
      MusicKpis.hourlyKpis(enrichedEvents(s, dir),
          userCol = "user_id", artistCol = "event_type", trackCol = "props", k = 3)
        .select(
          col("hour"), col("unique_listeners"),
          concat_ws(",", col("top_artists")).as("top_types"),
          round(col("track_diversity_index"), 6).as("diversity"))),

    // ---- F-family as a query: single-pass conditional null audit ----
    "null_audit" -> ((s, dir) =>
      Checks.nullAudit(Tables.events(s, dir), Seq("user_id", "event_type", "value"))),

    // ---- joins + agg over the star schema (broadcast dims) ----
    // ---- Pareto / cumulative-share report: per event type, rank users
    // by activity and emit each user's running share of total events —
    // the "what fraction of traffic do the top-N users carry" curve.
    // Integer-exact: running sums are exact, share is integer division ----
    "events_pareto" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(col("n_events").desc, col("user_id").asc)
      perUser
        .withColumn("user_rank", row_number().over(wRank).cast("int"))
        .withColumn("cum_events", sum(col("n_events")).over(
          wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_share_e6",
          expr("CAST(cum_events * 1000000 div sum(n_events) OVER " +
            "(PARTITION BY event_type) AS BIGINT)"))
        .where(col("user_rank") <= 20)
    }),

    // ---- year-over-year growth: the lag-window reporting classic, in
    // exact cents so the deltas hash-match. The lag is gated on the
    // previous row being yr−1 exactly: with a gap year in the series the
    // ungated form would label a delta against the last PRESENT year as
    // "year over year" ----
    "orders_yoy" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("yr"))
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("revenue_cents"))
        .withColumn("prev_cents",
          when(col("yr") - lag(col("yr"), 1).over(w) === 1,
            lag(col("revenue_cents"), 1).over(w)))
        .withColumn("delta_cents", col("revenue_cents") - col("prev_cents"))
    }),

    "revenue_by_nation" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))),

    // ---- anti-join (referential-integrity shape, reference README.md:33) ----
    "customers_without_orders" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")),

    // ---- ranking window ----
    "orders_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    }),

    // ---- SQL surface parity: correlated EXISTS through spark.sql over
    // temp views — Catalyst rewrites it to the same left-semi HashJoin the
    // DataFrame API would produce ----
    // ---- SQL LATERAL correlated subquery (Spark 4 surface): top-2
    // customers per nation through a correlated ORDER BY/LIMIT — Catalyst
    // decorrelates it to a ranked join, same plan family as orders_topn,
    // so the SQL-facing form costs what the DataFrame form costs ----
    "sql_lateral_topk" -> ((s, dir) => {
      Tables.nation(s, dir).createOrReplaceTempView("graft_sql_nation")
      Tables.customer(s, dir).createOrReplaceTempView("graft_sql_customer_l")
      s.sql("""SELECT n.n_name, t.c_name, t.bal_cents
               FROM graft_sql_nation n,
               LATERAL (
                 SELECT c_name,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
                 FROM graft_sql_customer_l c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name ASC LIMIT 2
               ) t""")
    }),

    // ---- WITH RECURSIVE (Spark 4 recursive CTE): BOM-style subtree
    // rollup over the deterministic binary part hierarchy (parent(k) =
    // k div 2 — the generated-relation discipline, derivable in both
    // engines from the key alone). The recursive arm is an EQUI-join on
    // the derived child key (p_partkey div 2 = pk), never a
    // nested-loop; recursion is hard-bounded at BomMaxDepth levels so
    // the iteration count is declared, not data-dependent — each level
    // doubles the frontier but stays ≤ 8·2^depth rows. ----
    "sql_recursive_bom" -> ((s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("graft_sql_part_bom")
      s.sql(s"""WITH RECURSIVE bom AS (
        SELECT p_partkey AS root, p_partkey AS pk, 0 AS depth,
               CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        FROM graft_sql_part_bom WHERE p_partkey BETWEEN 1 AND 8
        UNION ALL
        SELECT b.root, p.p_partkey, b.depth + 1,
               CAST(round(p.p_retailprice * 100) AS BIGINT)
        FROM bom b JOIN graft_sql_part_bom p ON p.p_partkey div 2 = b.pk
        WHERE b.depth < $BomMaxDepth)
      SELECT root, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(max(depth) AS INT) AS max_depth,
             CAST(sum(cents) AS BIGINT) AS subtree_value_cents
      FROM bom GROUP BY root""")
    }),

    "sql_exists" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_sql_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_sql_orders")
      s.sql("""SELECT c_custkey, c_name FROM graft_sql_customer c
               WHERE EXISTS (SELECT 1 FROM graft_sql_orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 450000)""")
    }),

    // ---- full outer join of two aggregates with disjoint key ranges:
    // preserved rows on BOTH sides ----
    "activity_full_outer" -> ((s, dir) => {
      val ev = Tables.events(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val ord = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      ev.join(ord, ev("user_id") === ord("o_custkey"), "full_outer")
        .select(coalesce(ev("user_id"), ord("o_custkey")).as("party_id"),
          col("n_events"), col("n_orders"))
    }),

    // ---- calendar scalar suite: the date-dimension derivations of any
    // warehouse load. Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday —
    // the oracle adds 1 (semantic mirror, not a fudge) ----
    "events_calendar" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        year(col("ts")).as("y"), quarter(col("ts")).as("q"),
        month(col("ts")).as("mo"), dayofmonth(col("ts")).as("d"),
        hour(col("ts")).as("h"), minute(col("ts")).as("mi"),
        dayofweek(col("ts")).as("dow"), dayofyear(col("ts")).as("doy"))),

    // ---- null-safe equality join (<=>): NULL keys MATCH each other,
    // where an equi-join would drop them ('click' → NULL makes ~20% of
    // keys null) ----
    "null_safe_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(nullif(col("event_type"), lit("click")).as("k"), col("value"))
      val totals = ev.groupBy("k").agg(count(lit(1)).as("n_k"))
      ev.alias("e").join(totals.alias("t"), col("e.k") <=> col("t.k"))
        .groupBy(col("t.k").as("kind"))
        .agg(count(lit(1)).as("n_rows"), max("n_k").as("n_k"))
    }),

    // ---- GLOBAL top-k: orderBy+limit compiles to TakeOrderedAndProject —
    // per-partition heaps + a k-row driver merge, never a full sort ----
    "orders_top100" -> ((s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // ---- analytic window-function suite: offsets, positional, and
    // distribution functions over one (key, order) spec ----
    "orders_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").asc)
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        first("o_totalprice").over(w).as("first_price"),
        // percent_rank/cume_dist: exact integer ratios + one IEEE division
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        // default running frame in BOTH engines: rows before the 2nd see null
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
    }),

    // ---- analytic windows (lag + running sum): sessionization ----
    "sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser)))
        .withColumn("is_new", when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(byUser))
        .select("user_id", "event_id", "session_id")
    }),

    // ---- native session windows (the streaming-ready session operator,
    // exercised in batch; oracle rebuilds sessions from first principles) ----
    "session_windows" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))),

    // ---- projection + filter pushdown to the parquet scan ----
    "parts_filter" -> ((s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size") >= 25 && col("p_retailprice") > 950.0)
        .select("p_partkey", "p_name", "p_size", "p_retailprice")),

    // ---- skew-safe aggregation (salted two-level; identical semantics) ----
    "skew_agg" -> ((s, dir) =>
      graft.operators.Skew.saltedCount(
        Tables.events(s, dir), Seq("event_type"), buckets = 16, out = "n")),

    // ---- skew-safe join: salted fact×dim ≡ plain equi-join ----
    "skew_join" -> ((s, dir) => {
      val facts = Tables.events(s, dir).select("event_id", "user_id", "event_type")
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"))
      graft.operators.Skew.saltedJoin(facts, dim, "user_id", buckets = 8)
        .select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
    }),

    // ---- U1: union of shards ----
    "events_union" -> ((s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "user_id", "event_type")
      val shard = (r: Int) => e.filter(pmod(col("event_id"), lit(3)) === r)
      shard(0).unionByName(shard(1)).unionByName(shard(2))
    }),

    // ---- per-group mode / top-k kernels ----
    "group_mode" -> ((s, dir) =>
      GroupTop.mode(Tables.events(s, dir), Seq("event_type"), "props", "top_prop")),
    "group_topk" -> ((s, dir) =>
      GroupTop.topKConcat(Tables.events(s, dir), Seq("user_id"), "event_type", 2, "top_types")),

    // ---- typed Aggregator forms of the same kernels (one-pass, SURVEY §2.12) ----
    "group_mode_agg" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("event_type")
        .agg(graft.operators.Aggregates.mode_agg(col("props")).as("top_prop"))
        .filter(col("top_prop").isNotNull)),
    "group_topk_agg" -> ((s, dir) =>
      Tables.events(s, dir).groupBy("user_id")
        .agg(concat_ws(",", graft.operators.Aggregates.topk_agg(2)(col("event_type"))).as("top_types"))),

    // ---- P5/P7: nullable casts + null normalization before a sink ----
    "casts_for_load" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey").cast("long").as("orderkey"),
          col("l_quantity").cast("double").as("quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipdate_str"),
          when(col("l_returnflag") === "", lit(null).cast("string"))
            .otherwise(col("l_returnflag")).as("returnflag_norm"))
        .filter(col("l_linenumber") === 1)),

    // ---- event-time tumbling window (batch form of the streaming extension) ----
    "hourly_windowed" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          countDistinct("user_id").as("unique_listeners"),
          count(lit(1)).as("listen_count"))
        .select(col("window.start").as("hour_start"),
          col("unique_listeners"), col("listen_count"))),

    // ---- multimodal plumbing over synthetic binary payloads ----
    "mm_payload_stats" -> ((s, dir) =>
      graft.multimodal.Multimodal.payloadStats(
          Tables.documents(s, dir)
            .select(col("doc_id").as("asset_id"),
              encode(col("text"), "UTF-8").as("payload")))
        .select(col("asset_id"), col("n_bytes"), col("content_key"))),
    "mm_sample_offsets" -> ((s, dir) =>
      graft.multimodal.Multimodal.sampleOffsets(
        Tables.documents(s, dir)
          .select(col("doc_id").as("asset_id"), lit("text").as("modality"),
            encode(col("text"), "UTF-8").as("payload")), k = 4)
        .select(col("asset_id"), col("sample_idx"), col("byte_offset"))),
    // audio round-trip: deterministic WAV geometry from doc fields →
    // real bytes (encodeWav) → header parse (decodeAudioPartitions);
    // the oracle predicts the decoded metadata arithmetically, so any
    // codec bug breaks the hash
    "mm_audio_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.decodeAudioPartitions(
          graft.multimodal.Multimodal.synthesizeWavPayload(
            Tables.documents(s, dir).select(
              col("doc_id").as("asset_id"),
              (lit(8000) + (col("doc_id") % 5) * 2000).cast("int").as("sample_rate"),
              (lit(1) + col("doc_id") % 2).cast("int").as("channels"),
              (lit(8) * (lit(1) + col("doc_id") % 2)).cast("int").as("bits_per_sample"),
              (col("n_chars") % 1000 + 1).cast("int").as("n_frames")))
            .select("asset_id", "payload"))
        .select(col("asset_id"),
          col("audio.sample_rate").as("sample_rate"),
          col("audio.channels").as("channels"),
          col("audio.bits_per_sample").as("bits_per_sample"),
          col("audio.n_frames").as("n_frames"),
          col("audio.duration_ms").as("duration_ms"))),
    // audio payload decode: ramp-tone WAVs → PCM slice extraction
    // (per-partition, corrupt-never-throw) → codegen ByteHistogram
    // amplitude distribution + sample-level clipping rate; the oracle
    // regenerates the ramp arithmetically, so a codec bug anywhere in
    // the synth → container walk → slice → histogram chain breaks the hash
    "mm_audio_features" -> ((s, dir) => {
      val pcm = graft.multimodal.Multimodal.audioPcm(
        graft.multimodal.Multimodal.synthesizeWavTonePayload(
          Tables.documents(s, dir).select(
            col("doc_id").as("asset_id"),
            (lit(8000) + (col("doc_id") % 5) * 2000).cast("int").as("sample_rate"),
            (lit(1) + col("doc_id") % 2).cast("int").as("channels"),
            (lit(8) * (lit(1) + col("doc_id") % 2)).cast("int").as("bits_per_sample"),
            (col("n_chars") % 1000 + 1).cast("int").as("n_frames"),
            (col("doc_id") % 256).cast("int").as("tone_seed")))
          .select("asset_id", "payload"))
      pcm.select(col("asset_id"),
          posexplode(graft.multimodal.Multimodal.byteHistogram(col("pcm"), bins = 16)),
          floor(col("n_clipped").cast("double") / col("n_samples") * lit(1e6) + lit(0.5))
            .cast("long").as("clip_rate_e6"))
        .select(col("asset_id"), col("pos").cast("int").as("bin"),
          floor(col("col") * lit(1e6) + lit(0.5)).cast("long").as("freq_e6"),
          col("clip_rate_e6"))
    }),
    // ---- audio silence runs through the SAME WAV decode seam: per
    // 8-bit mono asset (even doc_ids), silent-sample share and the
    // longest silent run, "silent" = amplitude within ±8 of the 128
    // midpoint. The oracle does not use a closed form — it SIMULATES
    // the ramp ((seed+i) mod 256) numerically and re-derives runs with
    // the islands trick, so a bug anywhere in the WAV encode/parse/
    // data-chunk-extraction/run-scan chain breaks the hash ----
    "mm_audio_silence" -> ((s, dir) => {
      val params = Tables.documents(s, dir)
        .filter(col("doc_id") % 2 === 0) // the 8-bit mono parity class
        .select(col("doc_id").as("asset_id"),
          (lit(8000) + (col("doc_id") % 5) * 2000).cast("int").as("sample_rate"),
          lit(1).as("channels"), lit(8).as("bits_per_sample"),
          (col("n_chars") % 1000 + 1).cast("int").as("n_frames"),
          (col("doc_id") % 256).cast("int").as("tone_seed"))
      val pcm = graft.multimodal.Multimodal.audioPcm(
        graft.multimodal.Multimodal.synthesizeWavTonePayload(params)
          .select("asset_id", "payload"))
      graft.multimodal.Multimodal.silenceStats(
          pcm.select(col("asset_id"), col("pcm")))
        .select(col("asset_id"), col("n_samples"), col("n_silent"),
          col("longest_run"),
          expr("n_silent * 1000000 div nullif(n_samples, 0)")
            .as("silence_ratio_e6"))
    }),

    // image payload decode: deterministic-pattern REAL PNGs (ImageIO
    // encode, zlib) → container sniff → ImageIO pixel decode → RGB
    // flatten → byte histogram; lossless round-trip means the oracle
    // predicts the decoded byte distribution in closed form — a bug
    // anywhere in the encode/sniff/decode/flatten/histogram chain breaks
    // the hash. All three modalities now have a payload-decode oracle row
    "mm_image_features" -> ((s, dir) => {
      val dec = graft.multimodal.Multimodal.decodePartitions(
        graft.multimodal.Multimodal.synthesizePngPayload(
          Tables.documents(s, dir).select(
            col("doc_id").as("asset_id"),
            (lit(8) + col("doc_id") % 8).cast("int").as("width"),
            (lit(8) + col("n_chars") % 8).cast("int").as("height"),
            (col("doc_id") % 256).cast("int").as("pattern_seed")))
          .select("asset_id", "payload"),
        bins = 16)
      val png = dec.select(col("asset_id"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          col("decoded.channels").as("channels"),
          posexplode(col("features")))
        .select(col("asset_id"), col("width"), col("height"), col("channels"),
          col("pos").cast("int").as("bin"),
          floor(col("col") * lit(1e6) + lit(0.5)).cast("long").as("freq_e6"))
      // JPEG fidelity tier (bin = -1 sentinel rows): the block pattern as
      // a REAL lossy JPEG — 8×8 cells align with DCT blocks, so dims are
      // exact and the decoded pixel MEAN must sit within quantization
      // error (±3 luma levels; measured 0.0 across all 256 seeds) of the
      // pattern's closed-form mean. The comparison is exact-rational:
      // |64·px_sum − expCellSum·px_n| ≤ 192·px_n. A decode drift, a
      // thrown row, or a dimension bug flips freq_e6 to 0 and breaks the
      // cross-engine hash
      val jpegDec = graft.multimodal.Multimodal.decodeStatsPartitions(
        graft.multimodal.Multimodal.synthesizeBlockJpegPayload(
          Tables.documents(s, dir).filter(col("doc_id") % 16 === 0).select(
            (col("doc_id") + lit(10000000L)).as("asset_id"),
            lit(8).cast("int").as("size_mult"),
            (col("doc_id") % 256).cast("int").as("seed")))
          .select("asset_id", "seed", "payload"))
      val jpeg = jpegDec
        .withColumn("exp_cell_sum", expr(
          "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
            "acc + ((i % 8) * 7 + (i div 8) * 11 + seed * 13) % 256)"))
        .select(col("asset_id"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          col("decoded.channels").as("channels"),
          lit(-1).cast("int").as("bin"),
          when(col("px_n") > 0 &&
              abs(lit(64L) * col("px_sum") - col("exp_cell_sum") * col("px_n"))
                <= lit(192L) * col("px_n"), lit(1000000L))
            .otherwise(lit(0L)).as("freq_e6"))
      png.unionByName(jpeg)
    }),
    // perceptual-hash image dedup: the same normalized block pattern
    // rendered at 3 resolutions per seed (real PNG encode) → real decode
    // → scale-invariant 8×8 mean-pool fingerprint → dup groups. Exact
    // payload hashing CANNOT find these dups (every resolution's bytes
    // differ) — the fingerprint groups are exactly the closed-form seed
    // groups, which is what the oracle predicts
    "mm_image_phash_dups" -> ((s, dir) => {
      val assets = Tables.documents(s, dir).select(
        col("doc_id").as("asset_id"),
        (lit(1) + col("doc_id") % 3).cast("int").as("size_mult"),
        (col("doc_id") % 32).cast("int").as("seed"))
      // fp feeds both the group census and the join-back; materialize the
      // (asset_id, 64-byte thumb) relation once or the PNG encode+decode
      // chain — the expensive part — runs twice
      val fp = graft.multimodal.Multimodal.thumbprintPartitions(
        graft.multimodal.Multimodal.synthesizeBlockPngPayload(assets))
        .localCheckpoint()
      val groups = fp.groupBy("thumb").agg(
        min(col("asset_id")).as("keeper_id"),
        count(lit(1)).as("n_scaled_dups"))
      fp.select(col("asset_id"), col("thumb")).join(groups, "thumb")
        .select("asset_id", "keeper_id", "n_scaled_dups")
    }),

    // video round-trip, same shape as mm_audio_meta: deterministic MP4
    // container geometry → real ISO-BMFF bytes → box-walk parse
    "mm_video_meta" -> ((s, dir) =>
      graft.multimodal.Multimodal.decodeVideoPartitions(
          graft.multimodal.Multimodal.synthesizeMp4Payload(
            Tables.documents(s, dir).select(
              col("doc_id").as("asset_id"),
              (lit(600) * (lit(1) + col("doc_id") % 3)).cast("int").as("timescale"),
              (col("n_chars") % 5000 + 600).cast("int").as("duration_ticks"),
              (lit(1) + col("doc_id") % 2).cast("int").as("n_tracks"),
              (lit(320) * (lit(1) + col("doc_id") % 4)).cast("int").as("width"),
              (lit(240) * (lit(1) + col("doc_id") % 4)).cast("int").as("height")))
            .select("asset_id", "payload"))
        .select(col("asset_id"),
          col("video.timescale").as("timescale"),
          col("video.duration_ticks").as("duration_ticks"),
          col("video.n_tracks").as("n_tracks"),
          col("video.width").as("width"),
          col("video.height").as("height"),
          col("video.duration_ms").as("duration_ms"))),
    // video stream statistics: synthesized MP4s carry a real per-sample
    // stsz (size base + (i%7)·17) and a two-entry stts (n/2 at Δ, rest at
    // 2Δ) in track 1; the box walk must stream-aggregate them, and the
    // oracle predicts the sums in closed form
    "mm_video_samples" -> ((s, dir) =>
      graft.multimodal.Multimodal.decodeVideoPartitions(
          graft.multimodal.Multimodal.synthesizeMp4SamplesPayload(
            Tables.documents(s, dir).select(
              col("doc_id").as("asset_id"),
              (lit(600) * (lit(1) + col("doc_id") % 3)).cast("int").as("timescale"),
              (col("n_chars") % 5000 + 600).cast("int").as("duration_ticks"),
              (lit(1) + col("doc_id") % 2).cast("int").as("n_tracks"),
              (lit(320) * (lit(1) + col("doc_id") % 4)).cast("int").as("width"),
              (lit(240) * (lit(1) + col("doc_id") % 4)).cast("int").as("height"),
              (col("n_chars") % 50 + 2).cast("int").as("n_samples"),
              (col("doc_id") % 100 + 10).cast("int").as("size_base"),
              (lit(100) + col("doc_id") % 10).cast("int").as("tick_delta")))
            .select("asset_id", "payload"))
        .select(col("asset_id"),
          col("video.n_samples").as("n_samples"),
          col("video.sample_bytes").as("sample_bytes"),
          col("video.max_sample_size").as("max_sample_size"),
          col("video.media_ticks").as("media_ticks"))),

    // ---- frame sampling at a uniform time grid: the sample table comes
    // from the REAL container walk (stsz sizes + stts time runs,
    // VideoCodec.decodeMp4SampleTable), one row per sample; the grid is
    // one target per media second (capped at 32 — a hostile duration
    // must not explode the fan-out) and each target picks the last
    // sample starting at-or-before it — the keyframe-selection shape of
    // every video curation pipeline, with byte offsets ready for a
    // ranged fetch. Equi-join on the asset key with a residual time
    // predicate: per-asset fan-out is bounded by the sample-table cap,
    // so the pair count per asset is grid × samples, never corpus². ----
    "mm_frame_sample" -> ((s, dir) => {
      val samples = graft.multimodal.Multimodal.videoSampleRows(
        graft.multimodal.Multimodal.synthesizeMp4SamplesPayload(
          Tables.documents(s, dir).select(
            col("doc_id").as("asset_id"),
            (lit(600) * (lit(1) + col("doc_id") % 3)).cast("int").as("timescale"),
            (col("n_chars") % 5000 + 600).cast("int").as("duration_ticks"),
            (lit(1) + col("doc_id") % 2).cast("int").as("n_tracks"),
            (lit(320) * (lit(1) + col("doc_id") % 4)).cast("int").as("width"),
            (lit(240) * (lit(1) + col("doc_id") % 4)).cast("int").as("height"),
            (col("n_chars") % 50 + 2).cast("int").as("n_samples"),
            (col("doc_id") % 100 + 10).cast("int").as("size_base"),
            (lit(100) + col("doc_id") % 10).cast("int").as("tick_delta")))
          .select("asset_id", "payload"))
      val grid = samples.groupBy(col("asset_id").as("g_asset"), col("timescale").as("tsc"))
        .agg(max(col("start_tick") + col("dur_ticks")).as("total_ticks"))
        .select(col("g_asset"), col("tsc"),
          explode(sequence(lit(0L),
            least(expr("(total_ticks - 1) div tsc"), lit(31L)))).as("sec"))
      grid.join(samples,
          col("g_asset") === col("asset_id") &&
            col("start_tick") <= col("sec") * col("tsc"))
        .groupBy(col("g_asset"), col("sec"))
        .agg(max(struct(col("start_tick"), col("sample_idx"),
          col("byte_offset"), col("sample_size"))).as("pick"))
        .select(col("g_asset").as("asset_id"), col("sec"),
          col("pick.sample_idx").as("sample_idx"),
          col("pick.byte_offset").as("byte_offset"),
          col("pick.sample_size").as("sample_size"))
    }),

    // deterministic weighted source interleave (stride scheduling) —
    // the training-order "data mixing" step; scale-safe via GlobalIndex,
    // no per-source window
    "corpus_mix_order" -> ((s, dir) =>
      Mixture.interleave(
          Tables.documents(s, dir).select("doc_id", "source"),
          id = "doc_id", source = "source",
          weight = expr("1 + cast(substring(source, 4) as int) % 4"),
          strideLcm = 12)
        .select(col("doc_id"), col("source"), col("wt"), col("mix_pos"))),

    // budgeted corpus selection: take documents best-first (longest here)
    // until the char budget is spent — running total via PrefixSum's
    // two-phase scan, NOT a single-task global window
    "corpus_budget_select" -> ((s, dir) =>
      graft.operators.PrefixSum.runningTotal(
          Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
          "cum_chars", col("n_chars"), col("n_chars").desc, col("doc_id").asc)
        .filter(col("cum_chars") <= 100000L)
        .select(col("doc_id"), col("source"), col("n_chars"), col("cum_chars"))),

    // cross-source duplication matrix: which source pairs share document
    // openings (first-5-token shingle — exact-dup keys find nothing in a
    // deduped crawl; shared openings expose templated boilerplate) —
    // per-source distinct keys, then a self equi-join on the key (never
    // on source), so candidate volume is linear in shared keys
    "source_overlap_matrix" -> ((s, dir) => {
      val f = Tables.documents(s, dir)
        .select(col("source"),
          array_join(slice(split(col("text"), " "), 1, 5), " ").as("k"))
        .distinct()
      f.as("a").join(f.as("b"),
          col("a.k") === col("b.k") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
    }),

    // incremental-crawl dedup: keep only new-batch docs whose content key
    // is absent from the historical corpus — an anti-join on the key; at
    // deployment the historical side is the precomputed fingerprint
    // table, so the old corpus text never moves
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val hist = docs.filter(col("doc_id") % 10 >= 2)
        .select(md5(col("text")).as("k")).distinct()
      docs.filter(col("doc_id") % 10 < 2)
        .withColumn("k", md5(col("text")))
        .join(hist, Seq("k"), "left_anti")
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // per-language quality calibration: min-max normalize the quality
    // score within each language (cross-lingual thresholds are not
    // comparable raw) — a |langs|-row aggregate broadcast back, all
    // arithmetic in exact integers
    "quality_norm_by_lang" -> ((s, dir) => {
      val q = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          floor(Text.qualityScoreRaw(col("text")) * 1e6 + 0.5).cast("long")
            .as("quality_e6"))
      val stats = q.groupBy("lang")
        .agg(min("quality_e6").as("__qmin"), max("quality_e6").as("__qmax"))
      q.join(broadcast(stats), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("quality_e6"),
          when(col("__qmax") === col("__qmin"), lit(0L))
            .otherwise(expr("(quality_e6 - __qmin) * 1000000 div (__qmax - __qmin)"))
            .as("norm_e6"))
    }),

    // per-source budget spend: each source keeps its own best-first docs
    // until ITS budget is exhausted — grouped two-phase scan, never a
    // per-source window (a huge source would collapse to one task)
    "corpus_budget_per_source" -> ((s, dir) =>
      graft.operators.PrefixSum.runningTotalByGroup(
          Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
          "cum_chars", col("n_chars"), col("source"),
          col("n_chars").desc, col("doc_id").asc)
        .filter(col("cum_chars") <= 5000L)
        .select(col("doc_id"), col("source"), col("n_chars"), col("cum_chars"))),

    // padding-efficient batching: same-length-bucket docs share a batch;
    // within-bucket numbering via GlobalIndex + count prefix sum, never
    // a per-bucket window
    "length_batch_assign" -> ((s, dir) =>
      graft.operators.Batching.lengthGrouped(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", col("n_chars"), bucketWidth = 100, batchSize = 32)
        .select(col("doc_id"), col("n_chars"), col("bucket"),
          col("batch_in_bucket"), col("pos_in_batch"))),

    // ---- dedup family over documents ----
    "dedup_exact_groups" -> ((s, dir) =>
      Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")),
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")),
    "jaccard_pairs" -> ((s, dir) => jaccardPairsFor(s, dir)),
    // ---- k-core peeling over the near-dup graph (k=2, 4 rounds): each
    // round drops nodes with degree < k and the edges they carried — the
    // structure that separates incidental pair matches from dense
    // boilerplate cores. FIXED round count (not a fixpoint loop) so both
    // engines run the identical computation and the hash matches; at
    // these SFs 4 rounds reach the fixpoint, and each round is one
    // map-side-combinable degree count + two semi-joins over the
    // (banded, pair-sized) edge relation, lineage cut per round ----
    // Adaptive 2-core peel (Batagelj-Zaversnik style): each round drops
    // edges touching a degree-1 vertex; the loop stops when a round
    // removes nothing — detected by an O(metadata) count on the freshly
    // checkpointed relation (the count reads checkpoint block sizes, it
    // replays no lineage) — OR at [[KcoreMaxRounds]], the SAME constant
    // the oracle generator unrolls to, so engine and oracle agree at any
    // convergence speed (early fixpoint → extra unrolled rounds are
    // no-ops; late → both truncate at the cap) and a pathological
    // long-path graph can't buy O(n) checkpoint+count rounds. Peeling
    // shrinks the frontier geometrically in practice, so the cap binds
    // only on adversarial shapes; KcoreFixpointSpec asserts the test
    // corpora converge within it.
    "dup_graph_kcore" -> ((s, dir) => {
      var edges = jaccardPairsFor(s, dir)
        .select("id_a", "id_b").localCheckpoint()
      var n = edges.count()
      var round = 0
      var changed = n > 0
      while (changed && round < KcoreMaxRounds) {
        val keep = edges.select(col("id_a").as("id"))
          .unionByName(edges.select(col("id_b").as("id")))
          .groupBy("id").agg(count(lit(1)).as("d"))
          .filter(col("d") >= 2).select("id")
        val next = edges
          .join(keep.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
          .join(keep.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
          .localCheckpoint()
        val m = next.count()
        changed = m < n
        edges = next; n = m; round += 1
      }
      edges.select(col("id_a").as("id"))
        .unionByName(edges.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("core_degree"))
    }),

    // bounded-round synchronous min-label propagation over the SAME
    // pinned edge set: after round r each node holds the smallest doc_id
    // within r hops, so 3 rounds = radius-3 community seeds (NOT the
    // full connected-component fixpoint — dedup_clusters owns that; the
    // bounded form is the scale-safe variant whose cost is exactly 3
    // self-joins regardless of component diameter, the standard
    // LPA-on-Pregel recipe with a fixed superstep budget). Deterministic
    // by construction: min is order-independent, no tie-breaking needed.
    "dup_graph_lpa" -> ((s, dir) => {
      val e = jaccardPairsFor(s, dir).select("id_a", "id_b")
      val sym = e.unionByName(
        e.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      var lab = sym.select(col("id_a").as("id")).distinct()
        .withColumn("lbl", col("id"))
      for (_ <- 1 to 3) {
        val nbr = sym
          .join(lab.withColumnRenamed("id", "id_b"), Seq("id_b"))
          .groupBy(col("id_a").as("id")).agg(min("lbl").as("nbr_min"))
        lab = lab.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
      }
      lab.select(col("id").as("doc_id"), col("lbl").as("community"))
    }),

    // similarity-mass histogram over the pair relation: how many pairs sit
    // in each 0.1-wide Jaccard band — the diagnostic that picks a dedup
    // threshold (a cliff at 0.9 means exact-ish dups; mass at 0.3 means
    // boilerplate). Derived from the SAME banded pair subtree, one extra
    // 11-row aggregate ----
    "dup_jaccard_histogram" -> ((s, dir) =>
      jaccardPairsFor(s, dir)
        .select(floor(col("jaccard") * 10).cast("int").as("bucket_x10"))
        .groupBy("bucket_x10").agg(count(lit(1)).as("n_pairs"))),
    // asymmetric containment: catches short-doc-inside-long-doc dups that
    // Jaccard's union denominator hides (quotes, aggregators)
    "containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)),
    // temperature-flattened lang mix (share ∝ n^α — the multilingual
    // pretraining rebalance; α=0.5 halves the head/tail imbalance)
    "temperature_mix" -> ((s, dir) =>
      graft.operators.Sampling.temperatureSample(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id", alpha = 0.5, totalRows = 250L)
        .select("doc_id", "lang")),
    // per-dimension embedding health report (dead dims, range outliers)
    "embedding_dim_stats" -> ((s, dir) =>
      graft.operators.VectorAgg.dimStats(Tables.embeddings(s, dir), "embedding")),
    // ---- exact corpus covariance + dominant direction (GramPca): ONE
    // distributed pass accumulates the O(dim²) sufficient statistics via
    // a typed Aggregator (map-side combinable — the shuffle carries
    // dim(dim+3)/2+1 longs per partition, never rows); centering and the
    // fixed-round integer power iteration are bounded driver-side model
    // math, same discipline as the PageRank/NB model stages ----
    "embedding_cov" -> ((s, dir) =>
      graft.operators.GramPca.covariance(Tables.embeddings(s, dir), "embedding", Dim)),
    "embedding_top_pc" -> ((s, dir) =>
      graft.operators.GramPca.topPc(Tables.embeddings(s, dir), "embedding", Dim,
        rounds = PcRounds)),
    // second principal direction via exact-integer Hotelling deflation
    // (BigInt-centered, one truncation per entry, oracle-mirrored in
    // HUGEINT) — with embedding_top_pc this spans the top-2 subspace
    "embedding_pc2" -> ((s, dir) =>
      graft.operators.GramPca.topPc2(Tables.embeddings(s, dir), "embedding",
        Dim, rounds = PcRounds)),
    // per-vector coordinate along the dominant direction (outlier/drift
    // ranking): the model re-enters the plan as literal arrays, so the
    // scoring pass is a zero-shuffle codegen'd zip_with/aggregate scan
    "embedding_pc_scores" -> ((s, dir) =>
      graft.operators.GramPca.pcScores(Tables.embeddings(s, dir), "vec_id",
        "embedding", Dim, rounds = PcRounds)),
    // ---- INCREMENTAL covariance maintenance: a 3-batch CDC feed (insert
    // tranche, delete wave carrying old images, re-insert with reversed
    // payloads) applied to the moments by exact integer add/subtract —
    // O(delta) per batch, never a state rescan, and ONLY possible because
    // the moments are integers (a float accumulator drifts on retraction
    // and never equals a recompute). The oracle computes covariance of
    // the final state directly — incremental == recompute, bit-for-bit ----
    "incr_cov_view" -> ((s, dir) => {
      import graft.operators.GramPca
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 3)
      val ins1 = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
      val del2 = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      val ins3 = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      var m = GramPca.moments(base, "embedding", Dim)
      m = GramPca.applyDelta(m,
        GramPca.moments(ins1, "embedding", Dim), GramPca.zero(Dim), Dim)
      m = GramPca.applyDelta(m,
        GramPca.zero(Dim), GramPca.moments(del2, "embedding", Dim), Dim)
      m = GramPca.applyDelta(m,
        GramPca.moments(ins3, "embedding", Dim), GramPca.zero(Dim), Dim)
      GramPca.covarianceRows(s, m, Dim)
    }),

    // ---- difference-in-differences (Card-Krueger '94 shape): the causal
    // effect estimate an experimentation team reads when assignment isn't
    // randomized per event — treatment = deterministic hash half of
    // customers, pre/post = a date pivot, metric = order value in exact
    // cents. ONE map-side-combinable row of 2×2 cell sums; the estimate
    // is the same double expression over the same int64 sums on both
    // engines ----
    "did_estimate" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        pmod(graft.functions.PortableHash.hash60(col("o_custkey")), lit(2L))
          .as("treat"),
        when(col("o_orderdate") >= lit("1998-01-01"), 1L).otherwise(0L)
          .as("post"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      def cell(t: Int, p: Int) = (col("treat") === t && col("post") === p)
      o.agg(
        sum(when(cell(1, 1), 1L).otherwise(0L)).as("n_tp"),
        sum(when(cell(1, 0), 1L).otherwise(0L)).as("n_t0"),
        sum(when(cell(0, 1), 1L).otherwise(0L)).as("n_cp"),
        sum(when(cell(0, 0), 1L).otherwise(0L)).as("n_c0"),
        sum(when(cell(1, 1), col("cents")).otherwise(0L)).as("s_tp"),
        sum(when(cell(1, 0), col("cents")).otherwise(0L)).as("s_t0"),
        sum(when(cell(0, 1), col("cents")).otherwise(0L)).as("s_cp"),
        sum(when(cell(0, 0), col("cents")).otherwise(0L)).as("s_c0"))
        .withColumn("did_e6", expr(
          "CAST(floor(((CAST(s_tp AS DOUBLE)/n_tp - CAST(s_t0 AS DOUBLE)/n_t0)" +
            " - (CAST(s_cp AS DOUBLE)/n_cp - CAST(s_c0 AS DOUBLE)/n_c0))" +
            " * 1000000.0 + 0.5) AS BIGINT)"))
    }),

    // ---- SEMANTIC decontamination (the embedding-space sibling of the
    // n-gram `decontam_*` tier): flag corpus vectors whose cosine to ANY
    // held-out panel vector clears τ = 0.35. Entirely in exact e3-integer
    // arithmetic — the threshold test is 400·dot² ≥ 49·‖a‖²·‖b‖² with
    // dot > 0 (τ² = 49/400), every term int64-bounded (dot ≤ 64·530² ≈
    // 1.8·10⁷) — so both engines agree bit-for-bit with no float cosine
    // anywhere. Panel is the hash-ordered LIMIT (plan-lint-bounded
    // broadcast); cost is panel-linear over the corpus at any scale ----
    "semantic_decontam" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q3 = transform(col("embedding").cast("array<double>"),
        x => floor(x * lit(1000.0) + lit(0.5)).cast("long"))
      // native codegen'd long dot (LongDot) — the HOF form would interpret
      // its lambdas outside whole-stage codegen on the panel×corpus scan
      def selfDot(c: Column) = graft.functions.expressions.LongDot(c, c)
      val both = emb.select(col("vec_id"), q3.as("q"))
      val panel = both
        .withColumn("__h", graft.functions.PortableHash.hash60(col("vec_id")))
        .orderBy(col("__h").asc, col("vec_id").asc).limit(DecontamPanel)
        .select(col("vec_id").as("p_id"), col("q").as("pq"),
          selfDot(col("q")).as("nb2"))
      val corpus = both
        .join(panel.select(col("p_id").as("vec_id")), Seq("vec_id"), "left_anti")
        .withColumn("na2", selfDot(col("q")))
      corpus.crossJoin(broadcast(panel))
        .withColumn("__dot",
          graft.functions.expressions.LongDot(col("q"), col("pq")))
        .filter(col("__dot") > 0 &&
          lit(400L) * col("__dot") * col("__dot") >=
            lit(49L) * col("na2") * col("nb2"))
        .groupBy("vec_id").agg(count(lit(1)).as("n_hits"))
    }),

    // ---- snake-balanced shard export (the boustrophedon assignment a
    // training loader uses so every worker's shard carries ~equal
    // tokens): rank docs by (tokens desc, id) with the TWO-PHASE global
    // index — never a one-task window — then shard = snake(rank, K).
    // Sorted-descending snake is the classic LPT-quality heuristic ----
    "export_shards" -> ((s, dir) =>
      shardAssignFor(s, dir).select("doc_id", "shard")),
    "shard_balance" -> ((s, dir) =>
      shardAssignFor(s, dir).groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tok"))),
    // portable (md5-family) configurations so the DuckDB oracles are exact;
    // the xxhash64 default family remains the faster non-oracle path
    "minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minHashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, numHashes = MhHashes, bands = MhBands, threshold = MhThreshold,
        portable = true)),
    // ---- retrieval-quality audit for the MinHash-LSH tier: predicted
    // pairs (banded candidates whose SIGNATURE estimate clears the
    // threshold) against TRUTH (exact n-gram Jaccard ≥ the same
    // threshold) — the precision/recall pair that sets bands×rows before
    // a corpus-scale dedup run. Both legs are shared-gram equi-joins
    // (the exact leg is jaccard_pairs' own linear shape, NOT all-pairs),
    // so the audit runs corpus-wide at any scale ----
    "lsh_pr_audit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val truth = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = PrThreshold)
        .select("id_a", "id_b")
      val pred = Dedup.minHashLshPairs(docs, "doc_id", "text",
          n = 3, numHashes = MhHashes, bands = MhBands, threshold = PrThreshold,
          portable = true)
        .select("id_a", "id_b")
      val hit = truth.join(pred, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(pred.agg(count(lit(1)).as("n_pred")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true"), col("n_pred"), col("n_hit"),
          when(col("n_pred") > 0,
            floor(col("n_hit") * lit(1000000L) / col("n_pred") + lit(0.5))
              .cast("long")).as("precision_e6"),
          when(col("n_true") > 0,
            floor(col("n_hit") * lit(1000000L) / col("n_true") + lit(0.5))
              .cast("long")).as("recall_e6"))
    }),

    // ---- estimator-accuracy harness for the MinHash tier: per surviving
    // candidate pair, the signature estimate vs the EXACT n-gram Jaccard —
    // the dedup analog of ann_recall (sets numHashes/bands before a
    // corpus-scale dedup run) ----
    "minhash_accuracy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          n = 3, numHashes = MhHashes, bands = MhBands, threshold = MhThreshold,
          portable = true)
        .select(col("id_a"), col("id_b"),
          floor(col("est_jaccard") * lit(1e6) + lit(0.5)).cast("long").as("est_e6"))
      val sh = Dedup.shingles(docs, "doc_id", "text", n = 3)
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("__sz"))
      val inter = pairs.select("id_a", "id_b")
        .join(sh.select(col("doc_id").as("id_a"), col("gram")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("gram")), Seq("id_b", "gram"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__inter"))
      pairs
        .join(inter, Seq("id_a", "id_b"), "left")
        .join(sz.select(col("doc_id").as("id_a"), col("__sz").as("__sza")), Seq("id_a"))
        .join(sz.select(col("doc_id").as("id_b"), col("__sz").as("__szb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), col("est_e6"),
          floor(coalesce(col("__inter"), lit(0L)) * lit(1.0) /
            (col("__sza") + col("__szb") - coalesce(col("__inter"), lit(0L)))
            * lit(1e6) + lit(0.5)).cast("long").as("true_e6"))
        .withColumn("err_e6", abs(col("est_e6") - col("true_e6")))
    }),

    // blocks=9 × blocksPerKey=2: the scale-safe geometry (≈13-bit join keys,
    // C(9,2)=36 groups) — output identical to plain pigeonhole, see
    // Dedup.simHashCandidates. Reads the session pin (simhashPairsFor):
    // the band join runs once per session, shared with the dup-graph
    // family, instead of a second full derivation here.
    "simhash_pairs" -> ((s, dir) => simhashPairsFor(s, dir)),

    // ---- similarity search over embeddings ----
    "cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 5)
    }),
    // multi-table configuration: tables decouple recall from bucket size
    // (see Similarity.lshTopK scale notes)
    "lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = Dim, nBits = LshBits, k = AnnK, tables = LshTables)),
    // ---- ANN quality harness: recall@k of each index tier vs the exact
    // ranking of a deterministic hash-sampled QUERY PANEL — the number
    // that decides nBits/tables/nprobe before a 100 TB index build. The
    // exact leg is panel × corpus (Similarity.panelExactTopK — linear in
    // corpus, no gate), the approximate leg is the index under test run
    // corpus-wide; joining from the exact side restricts the report to
    // panel queries. ----
    "ann_recall" -> ((s, dir) =>
      recallVsPanel(s, dir,
        Similarity.lshTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          dim = Dim, nBits = LshBits, k = AnnK, tables = LshTables))),
    "ivf_recall" -> ((s, dir) =>
      recallVsPanel(s, dir,
        Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          nlist = IvfNlist, nprobe = IvfNprobe, k = AnnK))),
    "pq_recall" -> ((s, dir) =>
      recallVsPanel(s, dir,
        graft.operators.Quantize.pqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          m = PqM, codebookK = PqK, k = AnnK))),
    "ivfpq_recall" -> ((s, dir) =>
      recallVsPanel(s, dir,
        graft.operators.Quantize.ivfPqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          nlist = IvfNlist, nprobe = IvfNprobe, m = PqM, codebookK = PqK, k = AnnK))),
    // SQ tier: what ranking quality survives serving from 4×-compressed
    // int8 codes — full-precision panel query × int8-dequantized corpus
    // (the asymmetric-distance convention; Quantize.int8 scaladoc). The
    // "index" here IS the compressed representation, so the approximate
    // leg is inherently panel × corpus — linear like the exact leg.
    "sq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val deq = graft.operators.Quantize.dequantInt8(
          graft.operators.Quantize.int8(emb, "vec_id", "embedding"),
          "qvec", "q_lo", "q_hi")
        .select(col("vec_id"), col("dequant").as("embedding"))
      recallVsPanel(s, dir,
        Similarity.panelTopKAgainst(emb, deq, "vec_id", "embedding",
          panelSize = RecallPanel, k = AnnK))
    }),

    // ---- binary (sign-bit) quantization tier: 1 bit per dimension
    // packed into 32-bit words (bit 63 unused so the oracle's BIGINT
    // shift can mirror the packing), distance = Σ popcount(xor) —
    // integer-exact end to end, so the full Hamming ranking hash-matches
    // DuckDB. The cheapest serving tier: 8 bytes/64-dim vector, two
    // XOR+POPCNTs per distance; panel broadcast × corpus stream ----
    "binary_topk" -> ((s, dir) =>
      graft.operators.Quantize.binaryTopK(Tables.embeddings(s, dir),
        "vec_id", "embedding", dim = Dim, panelSize = RecallPanel, k = AnnK)),
    // recall@k of the 32×-compressed Hamming ranking vs the exact cosine
    // panel — what decides whether the binary tier can serve first-stage
    // retrieval before a float rerank
    "bq_recall" -> ((s, dir) =>
      recallVsPanel(s, dir,
        graft.operators.Quantize.binaryTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", dim = Dim, panelSize = RecallPanel, k = AnnK))),

    // ---- the PRODUCTION binary serving shape: two-stage cascade —
    // cheap Hamming recalls 4×k candidates, exact float cosine reranks
    // only those (panel × BqCandK rows, not panel × corpus), final top-k.
    // The recall row shows how much of the 1-bit tier's loss the rerank
    // claws back; cost stays candidate-bounded at any corpus size ----
    "bq_rerank_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cand = graft.operators.Quantize.binaryTopK(emb, "vec_id", "embedding",
          dim = Dim, panelSize = RecallPanel, k = BqCandK)
        .select("query_id", "neighbor_id")
      val qn = Similarity.withNorm(emb, "vec_id", "embedding")
        .select(col("vec_id").as("query_id"), col("vec").as("qvec"),
          col("norm").as("qnorm"))
      val cn = Similarity.withNorm(emb, "vec_id", "embedding")
        .select(col("vec_id").as("neighbor_id"), col("vec").as("cvec"),
          col("norm").as("cnorm"))
      val scored = cand.join(qn, Seq("query_id")).join(cn, Seq("neighbor_id"))
        .withColumn("cosine_sim",
          when(col("qnorm") * col("cnorm") =!= 0.0,
            round(graft.functions.Vectors.dot(col("qvec"), col("cvec")) /
              (col("qnorm") * col("cnorm")), 6)))
      val wr = Window.partitionBy("query_id")
        .orderBy(col("cosine_sim").desc, col("neighbor_id").asc)
      recallVsPanel(s, dir,
        scored.withColumn("rank", row_number().over(wr)).filter(col("rank") <= AnnK))
    }),

    // ---- Matryoshka-truncation tier (Kusupati '22): rank with only the
    // FIRST half of every embedding — the 2× bandwidth/compute cut MRL
    // training promises; this recall row is the check that the corpus's
    // embeddings actually carry their information head-first ----
    "mrl_recall" -> ((s, dir) => {
      val half = Tables.embeddings(s, dir)
        .select(col("vec_id"), expr(s"slice(embedding, 1, ${Dim / 2})").as("embedding"))
      recallVsPanel(s, dir,
        Similarity.panelTopKAgainst(half, half, "vec_id", "embedding",
          panelSize = RecallPanel, k = AnnK))
    }),

    // ---- retrieval-quality eval (MAP@k / MRR) of the binary tier with
    // label relevance — the IR metrics beyond recall, exact-rational:
    // reciprocal rank is 1e6 div rank; AP@k clears denominators with the
    // lcm of 1..k (60 for k=5): Σ rel·relcum·(60 div rank) · 1e6 div
    // (60·min(R_total, k)) — every intermediate an exact integer, so the
    // metric hash-matches cross-engine (the exact-rational stats
    // discipline applied to IR eval). R_total per label is a broadcast
    // 1-agg dimension; queries with no relevant corpus doc yield NULL AP ----
    "retrieval_map_mrr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val run = graft.operators.Quantize.binaryTopK(emb, "vec_id", "embedding",
        dim = Dim, panelSize = RecallPanel, k = AnnK)
      val labels = emb.select(col("vec_id"), col("label"))
      val labelSizes = labels.groupBy("label").agg(count(lit(1)).as("n_label"))
      val wq = Window.partitionBy("query_id").orderBy(col("rank").asc)
      val per = run
        .join(labels.select(col("vec_id").as("query_id"),
          col("label").as("q_label")), Seq("query_id"))
        .join(labels.select(col("vec_id").as("neighbor_id"),
          col("label").as("nb_label")), Seq("neighbor_id"))
        .withColumn("rel", (col("q_label") === col("nb_label")).cast("long"))
        .withColumn("relcum", sum(col("rel")).over(wq))
        .groupBy("query_id", "q_label")
        .agg(sum(col("rel")).as("n_rel_topk"),
          min(when(col("rel") === 1, col("rank"))).as("frr"),
          sum(col("rel") * col("relcum") * expr("60 div rank")).as("ap_num60"))
      per
        .join(broadcast(labelSizes.select(col("label").as("q_label"),
          (col("n_label") - 1).as("r_total"))), Seq("q_label"))
        .select(col("query_id"),
          col("n_rel_topk"),
          coalesce(col("frr"), lit(0)).cast("int").as("first_rel_rank"),
          expr("CAST(CASE WHEN frr IS NULL THEN 0 ELSE 1000000 div frr END AS BIGINT)")
            .as("rr_e6"),
          expr(s"CAST(ap_num60 * 1000000 div nullif(60 * least(r_total, $AnnK), 0) " +
            "AS BIGINT)").as("ap_e6"))
    }),

    // ---- late-interaction retrieval: consecutive-id vector groups act
    // as multi-vector documents; a hash-sampled query-doc panel ranks the
    // corpus by MaxSim (Σ per-query-token best cosine). Panel broadcast ×
    // corpus stream — linear, ungated; at 100 TB the panel leg swaps for
    // per-vector LSH/IVF candidates feeding the same max-then-sum layer ----
    "maxsim_topk" -> ((s, dir) =>
      Similarity.maxSimTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        groupSize = MaxSimGroup, panelSize = MaxSimPanel, k = AnnK)),

    // ---- margin-based pair mining (bitext-mining shape): halves of the
    // embedding corpus act as the two "languages". Candidate legs are the
    // LSH-bucketed directed top-k ([[Similarity.lshTopKAgainst]], the
    // lsh_topk hyperplane family) — candidate generation is a (tbl,
    // bucket) equi-join per direction, linear shuffle, the 100 TB path;
    // the gated exact tier stays available as the recall oracle via
    // cosine_topk/ann_recall ----
    "margin_align_pairs" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val a = emb.filter(col("vec_id") % 2 === 0)
      val b = emb.filter(col("vec_id") % 2 =!= 0)
      Similarity.marginAlign(
        Similarity.lshTopKAgainst(a, b, "vec_id", "embedding",
          dim = Dim, nBits = LshBits, k = AlignK, tables = LshTables),
        Similarity.lshTopKAgainst(b, a, "vec_id", "embedding",
          dim = Dim, nBits = LshBits, k = AlignK, tables = LshTables),
        minMarginE6 = AlignMinMarginE6)
    }),

    "ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nlist = IvfNlist, nprobe = IvfNprobe, k = AnnK)),
    // product-quantized ADC search: 64× compressed codes, integer
    // distance arithmetic end-to-end (see Quantize PQ scale notes)
    "pq_topk" -> ((s, dir) =>
      graft.operators.Quantize.pqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        m = PqM, codebookK = PqK, k = AnnK)),
    // IVF+PQ residual index: coarse cells prune candidates, PQ codes the
    // residuals, per-probed-cell ADC tables (the FAISS IVFx,PQy shape)
    "ivfpq_topk" -> ((s, dir) =>
      graft.operators.Quantize.ivfPqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        nlist = IvfNlist, nprobe = IvfNprobe, m = PqM, codebookK = PqK, k = AnnK)),
    "near_dup_embeddings" -> ((s, dir) =>
      Similarity.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.4)),
    "near_dup_lsh" -> ((s, dir) =>
      Similarity.lshNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = Dim, nBits = NdBits, threshold = NdThreshold, tables = NdTables)),

    // ---- duplicate-graph density: per-node triangle counts over the
    // SimHash near-dup pair graph (degree-ordered wedge counting —
    // cliques score high, borderline chains score zero: the
    // transitive-overmerge diagnostic for the CC-based keeper pass).
    // Edge set is the session pin shared with clustering-coeff /
    // link-prediction ([[dupEdgesFor]]) ----
    "dup_graph_triangles" -> ((s, dir) =>
      graft.operators.Components.triangleCounts(dupEdgesFor(s, dir), "a", "b")
        .select(col("id").as("doc_id"), col("n_triangles"))),

    // ---- bounded-radius harmonic centrality over the same pinned
    // near-dup graph: Σ 1/d(u,v) truncated at radius 3 (Boldi-Vigna's
    // centrality, radius-bounded so the cost is exactly 2 frontier
    // expansions on the pinned edge set regardless of component
    // diameter — the dup_graph_lpa superstep argument). Shells of a
    // dense dup clique are O(|clique|²) pairs, so EXPANSION walks only
    // each node's HarmonicCapD smallest-id neighbors (the
    // dup_link_prediction wedge-cap precedent; deterministic, mirrored
    // in the oracle) — |h2| ≤ |h1|·D, |h3| ≤ |h1|·D², linear in edges.
    // Measured before the cap: 254 s warm at the 10×-sf0.1 point vs
    // 0.5 s at sf0.01 — the cap is what makes the query exist at scale.
    // d1 counts stay exact (full adjacency); d2/d3 are the documented
    // capped-expansion lower bound. Frontier dedup = distinct +
    // left-anti against earlier shells, so every pair enters at its
    // earliest capped distance, identically in both engines. Exact e6
    // weights (1, 1/2, 1/3 → 333333 truncated identically). ----
    "dup_graph_harmonic" -> ((s, dir) => {
      val e = dupEdgesFor(s, dir)
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val wCap = Window.partitionBy("u").orderBy(col("v").asc)
      val adjC = adj.withColumn("__rn", row_number().over(wCap))
        .filter(col("__rn") <= HarmonicCapD)
        .select(col("u").as("__m"), col("v").as("__w"))
      val h1 = adj.distinct()
      def expand(front: DataFrame, visited: Seq[DataFrame]): DataFrame = {
        val nxt = front.join(adjC, col("v") === col("__m"))
          .select(col("u"), col("__w").as("v"))
          .filter(col("u") =!= col("v")).distinct()
        visited.foldLeft(nxt)((acc, vis) =>
          acc.join(vis, Seq("u", "v"), "left_anti"))
      }
      val h2 = expand(h1, Seq(h1))
      val h3 = expand(h2, Seq(h1, h2))
      h1.withColumn("d", lit(1))
        .unionByName(h2.withColumn("d", lit(2)))
        .unionByName(h3.withColumn("d", lit(3)))
        .groupBy(col("u").as("doc_id"))
        .agg(
          sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_d1"),
          sum(when(col("d") === 2, 1L).otherwise(0L)).as("n_d2"),
          sum(when(col("d") === 3, 1L).otherwise(0L)).as("n_d3"))
        .withColumn("harmonic_e6", col("n_d1") * lit(1000000L)
          + col("n_d2") * lit(500000L) + col("n_d3") * lit(333333L))
    }),

    // ---- local clustering coefficient over the same near-dup graph:
    // 2·T(v)·1e6 div (d·(d−1)) for every node with d ≥ 2 — the per-node
    // density score that separates clique members (boilerplate families,
    // coeff→1e6) from chain links (transitive overmerge risk, coeff→0).
    // Shares the triangle machinery (degree-ordered wedges, O(m^1.5));
    // the canonical edge set is checkpointed once and feeds both the
    // degree count and the triangle enumeration ----
    "dup_graph_clustering_coeff" -> ((s, dir) => {
      val e = dupEdgesFor(s, dir)
      val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("degree"))
      val tri = graft.operators.Components.triangleCounts(e, "a", "b")
      deg.filter(col("degree") >= 2)
        .join(tri, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("degree"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          expr("""CAST(coalesce(n_triangles, 0) AS DECIMAL(38,0)) * 2000000
                  div (CAST(degree AS DECIMAL(38,0)) * (degree - 1))""")
            .as("clustering_e6"))
    }),

    // ---- common-neighbor link prediction (Liben-Nowell & Kleinberg '03)
    // over the near-dup graph: score non-adjacent pairs at distance 2 by
    // shared-neighbor count — the cheap "these two probably duplicate
    // each other too" candidate generator that densifies a sparse pair
    // relation before clustering. Wedge enumeration is centered (every
    // common neighbor IS a wedge center, so Σd² is inherent to the
    // semantics); the degree cap on centers bounds the fan-out per task
    // (a hub's wedges are boilerplate noise, the standard LP discipline
    // of dropping promiscuous centers). Top-k with full tiebreak, so the
    // selected SET is deterministic ----
    "dup_link_prediction" -> ((s, dir) => {
      val e = dupEdgesFor(s, dir)
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val lowDeg = adj.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") <= LpDegCap).select("u")
      val nb = adj.join(lowDeg, Seq("u"), "left_semi")
      val scored = nb
        .join(nb.select(col("u").as("u2"), col("v").as("w")),
          col("u") === col("u2") && col("v") < col("w"))
        .groupBy(col("v"), col("w")).agg(count(lit(1)).as("n_common"))
      scored.join(e, scored("v") === e("a") && scored("w") === e("b"), "left_anti")
        .select(col("v").as("doc_a"), col("w").as("doc_b"), col("n_common"))
        .orderBy(col("n_common").desc, col("doc_a").asc, col("doc_b").asc)
        .limit(LpTopK)
    }),

    // ---- cross-source duplicate crosstab: near-dup pair counts per
    // canonical source pair — the "which sources copy from which"
    // contamination matrix. One bounded pair relation (banded Jaccard),
    // two dimension joins, one |sources|² max aggregate ----
    "dup_source_crosstab" -> ((s, dir) => {
      val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      jaccardPairsFor(s, dir)
        .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")),
          Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")),
          Seq("id_b"))
        .groupBy(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // ---- Fellegi-Sunter field weights (JASA '69): per matching field,
    // m = P(agree | match) from the banded-Jaccard near-dup pairs and
    // u = P(agree | non-match) from SNM candidate pairs that did NOT
    // match — the two probabilities a probabilistic record-linkage
    // scorer combines into agreement weights. Kept as exact e6 rationals
    // (plus the m/u ratio in e6) rather than log-odds, the repo's
    // cross-engine discipline. Both pair relations are bounded (banded /
    // windowed), each aggregated in ONE conditional-count pass; the
    // per-field rows come from a 1-row × 1-row stack, not re-scans ----
    "er_field_weights" -> ((s, dir) => {
      val attrs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        col("source"), expr("CAST(n_chars AS BIGINT) div 100").as("len_band"))
      val matches = jaccardPairsFor(s, dir)
        .select("id_a", "id_b") // pinned; read by u's anti-join too
      val cand = graft.operators.SortedNeighborhood.candidatePairs(
          Tables.documents(s, dir).select(col("doc_id"),
            substring(coalesce(lower(col("text")), lit("")), 1, SnmKeyLen)
              .as("snm_key")),
          "doc_id", "snm_key", SnmWindow)
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
      val nonMatches = cand.join(matches, Seq("id_a", "id_b"), "left_anti")
      def agreeAgg(pairs: DataFrame, tag: String): DataFrame =
        pairs
          .join(attrs.select(col("doc_id").as("id_a"), col("lang").as("lang_a"),
            col("source").as("src_a"), col("len_band").as("len_a")), Seq("id_a"))
          .join(attrs.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
            col("source").as("src_b"), col("len_band").as("len_b")), Seq("id_b"))
          .agg(count(lit(1)).as(s"${tag}_total"),
            count(when(col("lang_a") === col("lang_b"), 1)).as(s"${tag}_lang"),
            count(when(col("src_a") === col("src_b"), 1)).as(s"${tag}_src"),
            count(when(col("len_a") === col("len_b"), 1)).as(s"${tag}_len"))
      agreeAgg(matches, "m")
        .crossJoin(broadcast(agreeAgg(nonMatches, "u"))) // 1-row × 1-row
        .select(expr("""stack(3,
            'lang',     m_lang, m_total, u_lang, u_total,
            'source',   m_src,  m_total, u_src,  u_total,
            'len_band', m_len,  m_total, u_len,  u_total)
            AS (field, m_agree, m_total, u_agree, u_total)"""))
        .withColumn("m_e6", expr("m_agree * 1000000 div nullif(m_total, 0)"))
        .withColumn("u_e6", expr("u_agree * 1000000 div nullif(u_total, 0)"))
        .withColumn("weight_ratio_e6",
          expr("m_e6 * 1000000 div nullif(u_e6, 0)"))
    }),

    // ---- exact autocorrelation of daily revenue at lags 1..7 — the
    // seasonality detector (a weekly cycle shows as a lag-7 peak).
    // Mean-centering stays integer by scaling: y_t = n·c_t − Σc (×n of
    // the residual), so r_k = Σ y_t·y_{t+k} / Σ y² is unchanged and
    // every term is exact in decimal(38,0) — headroom to ~$1T/day of
    // revenue, far past any real corpus. The day dimension is calendar-
    // bounded, so the lag self-join is over a tiny relation; a missing
    // day simply contributes no pair at that lag (both engines agree) ----
    "daily_acf" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        .localCheckpoint() // calendar-bounded; read by stats + both legs
      val st = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s_sum"))
      val yrel = daily.crossJoin(broadcast(st)) // 1-row stats
        .select(col("t"),
          (col("c") * col("n") - col("s_sum")).cast("decimal(38,0)").as("y"))
        .localCheckpoint()
      val denom = yrel.agg(sum(col("y") * col("y")).as("d2"))
      val byLag = yrel
        .select(explode(array((1 to 7).map(lit(_)): _*)).as("lag"),
          col("t"), col("y"))
        .join(yrel.select(col("t").as("t2"), col("y").as("y2")),
          col("t2") === col("t") + col("lag"))
        .groupBy("lag").agg(sum(col("y") * col("y2")).as("num"),
          count(lit(1)).as("n_pairs"))
      byLag.crossJoin(broadcast(denom)) // 1-row denominator
        .select(col("lag").cast("long").as("lag"), col("n_pairs"),
          expr("num * 1000000 div nullif(d2, 0)").as("acf_e6"))
    }),

    // ---- TPC-H Q20 spirit on this schema (no partsupp): dominant
    // suppliers — suppliers shipping MORE THAN HALF of a part's total
    // quantity (2·q_ps > q_p, exact integers, no percent floats), the
    // single-source-risk audit. Nested aggregate: per-(part, supp)
    // quantities reduce map-side FIRST, the per-part total derives from
    // the same reduced relation (one extra small aggregate, not a
    // second fact scan), and the dominant pairs collapse per supplier ----
    "dominant_suppliers" -> ((s, dir) => {
      val ps = Tables.lineitem(s, dir)
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("q_ps"))
        .localCheckpoint() // read twice: per-part totals + the filter
      val perPart = ps.groupBy("l_partkey").agg(sum(col("q_ps")).as("q_p"))
      ps.join(perPart, Seq("l_partkey"))
        .filter(col("q_ps") * 2 > col("q_p"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_dominated_parts"),
          sum(col("q_ps")).as("dominated_qty"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("n_dominated_parts"), col("dominated_qty"))
    }),

    // ---- Church-Gale term burstiness for the corpus head: for the
    // top-20 terms by collection frequency, mean occurrences per
    // CONTAINING document (cf·1e6 div df) — bursty terms (content
    // words) score high, uniformly-sprinkled terms (function words)
    // sit near 1e6; the feature that separates topical vocabulary from
    // glue. One (doc, term) reduce feeds both counts; deterministic
    // top-20 via (cf, term) tiebreak through TakeOrderedAndProject ----
    "term_burstiness" -> ((s, dir) => {
      val dt = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      dt.groupBy("term")
        .agg(sum(col("tf")).as("cf"), count(lit(1)).as("df"))
        .withColumn("burstiness_e6", expr("cf * 1000000 div nullif(df, 0)"))
        .orderBy(col("cf").desc, col("term").asc)
        .limit(20)
    }),

    // ---- order backlog curve: end-of-month open orders from ±1 deltas
    // (+1 at the placed month, −1 at the completion month = max line
    // ship month; never-shipped orders stay open). The sweep-line
    // discipline at month granularity: deltas aggregate map-side, the
    // cumulative sum runs over the CALENDAR-bounded month dimension
    // (~tens of rows at any scale) ----
    "orders_backlog_curve" -> ((s, dir) => {
      val done = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("done_ts"))
      val o = Tables.orders(s, dir)
        .join(done, col("o_orderkey") === col("l_orderkey"), "left")
        .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("pm"),
          (year(col("done_ts")) * 12 + month(col("done_ts")))
            .cast("long").as("cm"))
      val deltas = o.select(col("pm").as("m"), lit(1L).as("dd"))
        .unionAll(o.filter(col("cm").isNotNull)
          .select(col("cm").as("m"), lit(-1L).as("dd")))
        .groupBy("m")
        .agg(sum(col("dd")).as("delta"),
          count(when(col("dd") === 1, 1)).as("n_placed"),
          count(when(col("dd") === -1, 1)).as("n_completed"))
      deltas
        .withColumn("backlog_eom", sum(col("delta")).over(Window.orderBy("m")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("m", "n_placed", "n_completed", "backlog_eom")
    }),

    // ---- nation trade balance: revenue earned by a nation's suppliers
    // (exports) vs spent by its customers (imports), net balance in e4
    // units. Two fact aggregates FULL-OUTER joined on nation — a nation
    // active on only one side still surfaces — with the 25-row nation
    // dim broadcast last ----
    "nation_trade_balance" -> ((s, dir) => {
      val e4 = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      val exp = Tables.lineitem(s, dir)
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk")).agg(sum(e4).as("export_e4"))
      val imp = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk2")).agg(sum(e4).as("import_e4"))
      exp.join(imp, col("nk") === col("nk2"), "full_outer")
        .join(broadcast(Tables.nation(s, dir)),
          coalesce(col("nk"), col("nk2")) === col("n_nationkey"))
        .select(col("n_name"),
          coalesce(col("export_e4"), lit(0L)).as("export_e4"),
          coalesce(col("import_e4"), lit(0L)).as("import_e4"),
          (coalesce(col("export_e4"), lit(0L)) -
            coalesce(col("import_e4"), lit(0L))).as("balance_e4"))
    }),

    // ---- Wald-Wolfowitz runs test on daily revenue: is above/below-
    // median daily revenue RANDOM in time, or does it streak? The exact
    // median comparison uses 2c vs (m1+m2) — pure integers even for
    // even-n averages; median-valued days are dropped (the standard
    // runs-test discipline, identical in both engines). Middles come
    // from the grouped prefix-sum scan; the run count is one lag window
    // over the CALENDAR-bounded classified-day relation (domain-bounded
    // single task, the parts_skyline precedent). Expected runs
    // 2·n₊·n₋/(n₊+n₋) + 1 is a plain rational in e6 ----
    "daily_runs_test" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        .localCheckpoint() // calendar-bounded; read by median + classify
      val cum = graft.operators.PrefixSum.runningTotal(
        daily.groupBy("c").agg(count(lit(1)).as("cnt")), "cum",
        col("cnt"), col("c"))
      val med = cum.crossJoin(broadcast(daily.agg(count(lit(1)).as("n"))))
        .agg(min(when(expr("cum >= (n + 1) div 2"), col("c"))).as("m1"),
          min(when(expr("cum >= n div 2 + 1"), col("c"))).as("m2"))
      val signed = daily.crossJoin(broadcast(med)) // 1-row middles
        .withColumn("sgn",
          when(col("c") * 2 > col("m1") + col("m2"), 1)
            .when(col("c") * 2 < col("m1") + col("m2"), -1))
        .filter(col("sgn").isNotNull)
      signed
        .withColumn("prev", lag("sgn", 1).over(Window.orderBy("t")))
        .agg(count(lit(1)).as("n_days_classified"),
          count(when(col("sgn") === 1, 1)).as("n_plus"),
          count(when(col("sgn") === -1, 1)).as("n_minus"),
          count(when(col("prev").isNull || col("sgn") =!= col("prev"), 1))
            .as("n_runs"))
        .withColumn("expected_runs_e6",
          expr("""CAST(2 AS DECIMAL(38,0)) * n_plus * n_minus * 1000000
                  div nullif(n_plus + n_minus, 0) + 1000000"""))
    }),

    // ---- first-order value vs lifetime value: does a big first basket
    // predict a big customer? Sign-preserving corr² and the OLS slope
    // (expected LTV cents per first-order cent, e6) from ONE moment
    // aggregate — moments exact in decimal(38,0); only the final
    // division runs in doubles with floor(x·1e6 + 0.5), the
    // daily_trend_ols discipline (num² would overflow any fixed
    // decimal at money scale) ----
    "first_value_ltv_corr" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val perCust = Tables.orders(s, dir)
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"),
          row_number().over(w).as("rn"))
        .groupBy("o_custkey")
        .agg(min(when(col("rn") === 1, col("cents"))).as("x"),
          sum(col("cents")).as("y"))
      perCust.agg(count(lit(1)).as("n_customers"),
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          sum(col("y").cast("decimal(38,0)")).as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
        .withColumn("num", expr("n_customers * sxy - sx * sy"))
        .withColumn("denx", expr("n_customers * sxx - sx * sx"))
        .withColumn("deny", expr("n_customers * syy - sy * sy"))
        .select(col("n_customers"),
          expr("""CASE WHEN denx <> 0 AND deny <> 0 THEN
                    CAST(floor(CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                      / (CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
                      * CASE WHEN num < 0 THEN -1000000.0 ELSE 1000000.0 END
                      + 0.5) AS BIGINT) END""").as("corr2_sign_e6"),
          expr("""CASE WHEN denx <> 0 THEN
                    CAST(floor(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) END""").as("slope_e6"))
    }),

    // ---- bounded-lag Theil-Sen trend of daily revenue: the robust
    // slope estimator (median of pairwise slopes), in its standard
    // windowed form — only day pairs within 30 days pair up, so the
    // relation is an EQUI-join on exploded lags over the calendar-
    // bounded day table (the daily_acf shape), ~|days|·30 rows, never
    // days². Slopes are staged as cents/day in e6 with one shared
    // integer definition (Δc·1e6 div lag — both engines truncate toward
    // zero); the median is ×4 dyadic-exact ----
    "daily_theilsen_trend" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("t"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        .localCheckpoint() // calendar-bounded; both join legs
      daily
        .select(explode(array((1 to 30).map(lit(_)): _*)).as("lag"),
          col("t"), col("c"))
        .join(daily.select(col("t").as("t2"), col("c").as("c2")),
          col("t2") === col("t") + col("lag"))
        .select(expr("(c2 - c) * 1000000 div lag").as("slope_e6"))
        .agg(count(lit(1)).as("n_pairs"),
          (percentile(col("slope_e6"), lit(0.5)) * 4).cast("long")
            .as("median_slope_e6_x4"),
          count(when(col("slope_e6") > 0, 1)).as("n_up"),
          count(when(col("slope_e6") < 0, 1)).as("n_down"))
    }),

    // ---- exact 5%-trimmed mean of event values — the robust center
    // that pairs with value_mad_outliers. Row ranks come from the
    // grouped (cents, cnt) relation prefix-summed under the two-phase
    // scan (never a one-task global window); the boundary value group is
    // PARTIALLY kept (min(cum, n−k) − max(cum−cnt, k), clamped), so
    // exactly k rows fall off each tail — row-exact, not value-
    // approximate. Trim bounds reported from the same pass ----
    "value_trimmed_mean" -> ((s, dir) => {
      val vals = Tables.events(s, dir).filter(col("value").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"))
      val grouped = vals.groupBy("cents").agg(count(lit(1)).as("cnt"))
      val cum = graft.operators.PrefixSum.runningTotal(
        grouped, "cum", col("cnt"), col("cents"))
      val tot = vals.agg(count(lit(1)).as("n"), sum(col("cents")).as("s_all"))
      cum.crossJoin(broadcast(tot)) // 1-row totals
        .withColumn("k", expr("n * 5 div 100"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("n") - col("k")) -
            greatest(col("cum") - col("cnt"), col("k"))))
        .agg(max(col("n")).as("n"), max(col("k")).as("k_trim"),
          min(when(col("kept") > 0, col("cents"))).as("lo_cents"),
          max(when(col("kept") > 0, col("cents"))).as("hi_cents"),
          expr("""CAST(sum(kept * cents) AS DECIMAL(38,0)) * 1000000
                  div nullif(max(n) - 2 * max(k), 0)""").as("trimmed_mean_e6"),
          expr("""CAST(max(s_all) AS DECIMAL(38,0)) * 1000000
                  div nullif(max(n), 0)""").as("mean_e6"))
    }),

    // ---- day-of-week revenue index: per weekday, revenue share
    // relative to a uniform week — avg(dow)/avg(all) as the exact cross-
    // multiplied rational (sum_dow·n_all) / (n_dow·sum_all) in e6,
    // decimal-staged. Weekday from days-since-epoch arithmetic
    // ((t+4) mod 7, 0 = Sunday — 1970-01-01 was a Thursday) so both
    // engines share one integer definition, no calendar-function drift ----
    "weekday_index" -> ((s, dir) => {
      val t = datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).cast("long")
      val byDow = Tables.orders(s, dir)
        .groupBy(((t + 4) % 7).as("dow"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val tot = byDow.agg(sum(col("n_orders")).as("n_all"),
        sum(col("cents")).as("c_all"))
      byDow.crossJoin(broadcast(tot)) // 1-row totals
        .select(col("dow"), col("n_orders"), col("cents"),
          expr("""CAST(cents AS DECIMAL(38,0)) * n_all * 1000000
                  div (CAST(n_orders AS DECIMAL(38,0)) * c_all)""")
            .as("rev_index_e6"))
    }),

    // ---- degree assortativity of the near-dup graph (Newman '02): do
    // high-degree nodes attach to high-degree nodes? Over the
    // SYMMETRIZED edge list Σx = Σy and the variances coincide, so
    // Pearson r collapses to the PLAIN rational (M·Σxy − Σx²_margin) /
    // (M·Σx² − Σx²_margin) — no sqrt, exact in e6. Positive ⇒
    // boilerplate cliques attach to each other (one dense family);
    // negative ⇒ hub-and-spoke template reuse. Same pinned edge set as
    // the triangle family; two broadcast-size degree joins ----
    "dup_graph_assortativity" -> ((s, dir) => {
      val e = dupEdgesFor(s, dir)
      val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
      val sym = e.select(col("a").as("x"), col("b").as("y"))
        .unionAll(e.select(col("b").as("x"), col("a").as("y")))
        .join(deg.select(col("id").as("x"), col("d").as("dx")), Seq("x"))
        .join(deg.select(col("id").as("y"), col("d").as("dy")), Seq("y"))
      sym.agg(count(lit(1)).as("m2"), sum(col("dx")).as("sx"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dx") * col("dy")).as("sxy"))
        .select(expr("m2 div 2").as("n_edges"),
          expr("""(CAST(m2 AS DECIMAL(38,0)) * sxy -
                   CAST(sx AS DECIMAL(38,0)) * sx) * 1000000
                  div nullif(CAST(m2 AS DECIMAL(38,0)) * sxx -
                   CAST(sx AS DECIMAL(38,0)) * sx, 0)""")
            .as("assortativity_e6"))
    }),

    // ---- per-event-type null matrix: the data-quality completeness
    // report sliced by type (a column that is never null globally can
    // still be 100% null for one type — the signal the global
    // null_audit hides). One map-side-combinable conditional-count
    // aggregate over the fact scan ----
    "null_matrix_by_type" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(coalesce(col("event_type"), lit("__null__")).as("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("user_id").isNull, 1)).as("null_user_id"),
          count(when(col("value").isNull, 1)).as("null_value"),
          count(when(col("props").isNull, 1)).as("null_props"),
          count(when(col("ts").isNull, 1)).as("null_ts"))),

    // ---- daily actives split into new vs returning: each user's first
    // active day comes from ONE map-side-combinable min aggregate; the
    // daily split is then a conditional count after an equi-join on
    // user — never a self-scan per day. The growth-accounting headline
    // (is today's traffic acquisition or retention?) ----
    "new_vs_returning_daily" -> ((s, dir) => {
      val acts = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val firstDay = acts.groupBy("user_id").agg(min(col("d")).as("d0"))
      acts.join(firstDay, Seq("user_id"))
        .groupBy("d")
        .agg(count(lit(1)).as("n_active"),
          count(when(col("d") === col("d0"), 1)).as("n_new"),
          count(when(col("d") =!= col("d0"), 1)).as("n_returning"),
          expr("""count(CASE WHEN d = d0 THEN 1 END) * 1000000
                  div nullif(count(1), 0)""").as("new_share_e6"))
    }),

    // ---- monthly order-priority mix drift: per month, the L1 distance
    // between that month's priority mix and the overall mix — the
    // time-drift monitor for a categorical column (the split_drift
    // audit's calendar sibling). Exact with cleared denominators:
    // Σ_p |cnt_mp·N − cnt_p·N_m| · 1e6 div (N_m·N); abs of integers,
    // never float shares. Cells are (month × ≤5 priorities) — bounded;
    // overall margins ride a broadcast ----
    "priority_mix_drift" -> ((s, dir) => {
      val m = Tables.orders(s, dir).select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("mth"),
        col("o_orderpriority").as("prio"))
      val cells = m.groupBy("mth", "prio").agg(count(lit(1)).as("c_mp"))
      val byMonth = cells.groupBy("mth").agg(sum(col("c_mp")).as("n_m"))
      val byPrio = cells.groupBy("prio").agg(sum(col("c_mp")).as("c_p"))
      val tot = cells.agg(sum(col("c_mp")).as("n"))
      cells.join(byMonth, Seq("mth")).join(broadcast(byPrio), Seq("prio"))
        .crossJoin(broadcast(tot)) // 1-row grand total
        .groupBy("mth")
        .agg(max(col("n_m")).as("n_orders"),
          expr("""sum(abs(CAST(c_mp AS DECIMAL(38,0)) * n -
                          CAST(c_p AS DECIMAL(38,0)) * n_m)) * 1000000
                  div nullif(CAST(max(n_m) AS DECIMAL(38,0)) * max(n), 0)""")
            .as("l1_drift_e6"))
    }),

    // ---- session conversion: among 30-minute sessions that contain a
    // view, the share that also contain a purchase — the bounce_rate
    // companion on the SAME session definition; per-session flags are
    // conditional MAXes inside the session aggregate, never a second
    // scan ----
    "session_conversion" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val sess = Tables.events(s, dir)
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser)))
        .withColumn("is_new",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(byUser))
        .groupBy("user_id", "session_id")
        .agg(max(when(col("event_type") === "view", 1).otherwise(0)).as("has_view"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("has_purchase")) // null-typed events count as neither
      sess.filter(col("has_view") === 1)
        .agg(count(lit(1)).as("n_view_sessions"),
          count(when(col("has_purchase") === 1, 1)).as("n_converted"),
          expr("""count(CASE WHEN has_purchase = 1 THEN 1 END) * 1000000
                  div nullif(count(1), 0)""").as("session_conv_e6"))
    }),

    // ---- session bounce rate: share of 30-minute-gap sessions with
    // exactly one event, plus exact mean depth — the engagement
    // headline stat on the SAME session definition as `sessionize`
    // (per-user windows: scale-safe partitions). One window pass, one
    // session aggregate, one 1-row reduce ----
    "bounce_rate" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val sess = Tables.events(s, dir)
        .withColumn("gap_s",
          unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser)))
        .withColumn("is_new",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum("is_new").over(byUser))
        .groupBy("user_id", "session_id").agg(count(lit(1)).as("depth"))
      sess.agg(count(lit(1)).as("n_sessions"),
        count(when(col("depth") === 1, 1)).as("n_bounce"),
        expr("""count(CASE WHEN depth = 1 THEN 1 END) * 1000000
                div nullif(count(1), 0)""").as("bounce_rate_e6"),
        expr("""CAST(sum(depth) AS DECIMAL(38,0)) * 1000000
                div nullif(count(1), 0)""").as("mean_depth_e6"))
    }),

    // ---- Kendall tau-a between two brand rankings (revenue vs distinct
    // orders): do the money ranking and the popularity ranking agree?
    // Concordance is judged by SIGN comparisons only (never the
    // (Δx·Δy) product — that overflows int64 at scale); the pair domain
    // is |brands|², a DOMAIN-bounded constant (25 brands at any SF).
    // The build side carries an explicit limit far above the domain
    // (1024 ≫ 25 — never truncates, purely declares the bound), so the
    // non-equi pair join is a bounded-broadcast BNLJ, the lint-audited
    // scale-safe form — never a data-sized Cartesian ----
    "brand_rank_kendall" -> ((s, dir) => {
      val byBrand = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("x"),
          countDistinct(col("l_orderkey")).as("y"))
      val pairs = byBrand
        .select(col("p_brand").as("brand_a"), col("x").as("xa"), col("y").as("ya"))
        .join(broadcast(byBrand.limit(1024)
            .select(col("p_brand").as("brand_b"), col("x").as("xb"),
              col("y").as("yb"))),
          col("brand_a") < col("brand_b"))
      val conc = (col("xa") > col("xb") && col("ya") > col("yb")) ||
        (col("xa") < col("xb") && col("ya") < col("yb"))
      val disc = (col("xa") > col("xb") && col("ya") < col("yb")) ||
        (col("xa") < col("xb") && col("ya") > col("yb"))
      pairs.agg(count(lit(1)).as("n_pairs"),
        count(when(conc, 1)).as("concordant"),
        count(when(disc, 1)).as("discordant"),
        count(when(col("xa") === col("xb") || col("ya") === col("yb"), 1))
          .as("tied"))
        .withColumn("tau_a_e6",
          expr("(concordant - discordant) * 1000000 div nullif(n_pairs, 0)"))
    }),

    // ---- Herfindahl-Hirschman concentration of supplier revenue per
    // nation: HHI = Σ shareᵢ² as the exact rational Σcentsᵢ²·1e6 div
    // (Σcents)² — squares clear the share denominators, so no float
    // shares ever exist. Two map-side-combinable aggregates (per
    // supplier, then per nation); 10000-point scale ≈ hhi_e6/100 ----
    "supplier_hhi" -> ((s, dir) => {
      val bySupp = Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      bySupp
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"), sum(col("cents")).as("nation_cents"),
          sum(col("cents").cast("decimal(38,0)") * col("cents")).as("sq"))
        .select(col("n_name"), col("n_suppliers"), col("nation_cents"),
          expr("""sq * 1000000 div nullif(
                  CAST(nation_cents AS DECIMAL(38,0)) * nation_cents, 0)""")
            .as("hhi_e6"))
    }),

    // ---- event-arrival burstiness (Fano factor of hourly counts over
    // the FULL observed hour span): F = var/mean = (n·Σc² − S²) div
    // (n·S) in e6 — zero hours inside the span shift the variance but
    // are never materialized (span count n comes from max−min+1; absent
    // hours contribute 0 to both Σc and Σc²). F ≈ 1e6 is Poisson;
    // above: bursty; below: regular. One hour aggregate + 1-row math ----
    "events_burstiness" -> ((s, dir) => {
      val hourly = Tables.events(s, dir).filter(col("ts").isNotNull)
        .groupBy(expr("CAST(ts AS LONG) div 3600").as("h"))
        .agg(count(lit(1)).as("c"))
      hourly.agg((max(col("h")) - min(col("h")) + 1).as("n_hours"),
          sum(col("c")).as("n_events"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("sq"))
        .select(col("n_hours"), col("n_events"),
          expr("""(CAST(n_hours AS DECIMAL(38,0)) * sq -
                   CAST(n_events AS DECIMAL(38,0)) * n_events) * 1000000
                  div nullif(CAST(n_hours AS DECIMAL(38,0)) * n_events, 0)""")
            .as("fano_e6"))
    }),

    // ---- TPC-H Q21 shape (adapted: late = shipped >60 days after the
    // order date): suppliers who were the SOLE late shipper on a
    // multi-supplier order. The exists/not-exists pair collapses into
    // ONE per-(order, supplier) flag aggregate + one per-order count
    // aggregate — two map-side-combinable reduces instead of four
    // correlated subquery scans; the "only this supplier was late"
    // predicate is n_late_supp = 1 ∧ this supplier late ----
    "q21_waiting_suppliers" -> ((s, dir) => {
      val perOs = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max((col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("int"))
          .as("late"))
      val perOrder = perOs.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late_supp"))
      perOs.filter(col("late") === 1)
        .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
          Seq("l_orderkey"), "left_semi")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("numwait"))
    }),

    // ---- ABC inventory classification of parts by revenue: class A =
    // parts covering the first 80% of cumulative revenue, B the next
    // 15%, C the tail — the classic Pareto partitioning, row-exact.
    // Cumulative revenue under the two-phase prefix-sum scan ordered by
    // (revenue desc, partkey) — a total order, never a one-task global
    // window; class boundaries are integer comparisons against the
    // broadcast grand total (cum·100 ≤ 80·total), no percent floats ----
    "orders_abc_classification" -> ((s, dir) => {
      val byPart = Tables.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val cum = graft.operators.PrefixSum.runningTotal(
        byPart, "cum_cents", col("cents"),
        col("cents").desc, col("l_partkey").asc)
      val tot = byPart.agg(sum(col("cents")).as("total_cents"))
      cum.crossJoin(broadcast(tot)) // 1-row grand total
        .withColumn("abc_class",
          when(col("cum_cents") * 100 <= col("total_cents") * 80, "A")
            .when(col("cum_cents") * 100 <= col("total_cents") * 95, "B")
            .otherwise(lit("C")))
        .groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("class_cents"),
          expr("""CAST(sum(cents) AS DECIMAL(38,0)) * 1000000
                  div nullif(max(total_cents), 0)""").as("rev_share_e6"))
    }),

    // ---- Lorenz curve at deciles: cumulative revenue share of
    // customers ranked poorest-first — the 10-point curve behind the
    // Gini number already reported ([[gini_concentration]]). Customer
    // decile from the two-phase prefix COUNT (rank), cumulative revenue
    // from the prefix SUM over the same total order; shares exact e6.
    // The decile of a customer is ceil(10·rank/n) staged as integer
    // arithmetic ((10·rank + n − 1) div n) ----
    "lorenz_curve_deciles" -> ((s, dir) => {
      val byCust = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val ranked = graft.operators.PrefixSum.runningTotals(byCust,
        Seq("cum_cents" -> col("cents"), "rnk" -> lit(1L)),
        col("cents").asc, col("o_custkey").asc)
      val tot = byCust.agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
      ranked.crossJoin(broadcast(tot)) // 1-row totals
        .withColumn("decile", expr("(10 * rnk + n - 1) div n"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          expr("""CAST(max(cum_cents) AS DECIMAL(38,0)) * 1000000
                  div nullif(max(total), 0)""").as("cum_share_e6"))
    }),

    // ---- 2-D skyline (Pareto frontier) over parts: the cheapest part
    // at each size that no smaller-or-equal size undercuts — the
    // classic Börzsönyi '01 skyline operator, here in its
    // bounded-domain relational form: one min-per-size aggregate (the
    // size domain is ≤50 values at ANY scale), a running min over that
    // TINY relation (single-task window is fine on ≤50 rows — the
    // domain, not the data, bounds it), and one broadcast join back.
    // dominated(i) ⇔ minp≤(sizeᵢ) < priceᵢ ∨ minp<(sizeᵢ) ≤ priceᵢ;
    // equal-(size, price) rows do not dominate each other, so ties all
    // surface. Never a pairwise dominance join ----
    "parts_skyline" -> ((s, dir) => {
      val p = Tables.part(s, dir).select(col("p_partkey"),
        col("p_size").cast("long").as("size"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
      val incl = Window.orderBy("size")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val strict = Window.orderBy("size")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = p.groupBy("size").agg(min(col("price_cents")).as("min_p"))
        .select(col("size"), min(col("min_p")).over(incl).as("minp_incl"),
          min(col("min_p")).over(strict).as("minp_strict"))
      p.join(broadcast(cum), Seq("size"))
        .filter(!(col("minp_incl") < col("price_cents") ||
          coalesce(col("minp_strict") <= col("price_cents"), lit(false))))
        .select(col("p_partkey"), col("size"), col("price_cents"))
    }),

    // ---- view→purchase conversion latency: per user, first view and
    // the first purchase at-or-after it; conversion rate in e6 and the
    // median minutes-to-convert (×4 dyadic-exact, the repeat_purchase
    // discipline). One user shuffle; the "first purchase after the
    // view" is a conditional min in the SAME aggregate, not a join ----
    "funnel_time_to_convert" -> ((s, dir) => {
      val secs = col("ts").cast("long")
      val perUser = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type").isin("view", "purchase"))
        .select(col("user_id"), col("event_type"), secs.as("sec"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("sec"))).as("v1"))
      val conv = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("event_type") === "purchase")
        .select(col("user_id"), secs.as("psec"))
        .join(perUser.filter(col("v1").isNotNull), Seq("user_id"))
        .filter(col("psec") >= col("v1"))
        .groupBy("user_id").agg(min(col("psec")).as("p1"), min(col("v1")).as("v1m"))
      perUser.filter(col("v1").isNotNull)
        .join(conv.select(col("user_id"),
          expr("(p1 - v1m) div 60").as("delta_min")),
          Seq("user_id"), "left")
        .agg(count(lit(1)).as("n_viewed"),
          count(col("delta_min")).as("n_converted"),
          expr("count(delta_min) * 1000000 div nullif(count(1), 0)")
            .as("conv_rate_e6"),
          (percentile(col("delta_min"), lit(0.5)) * 4).cast("long")
            .as("median_minutes_x4"))
    }),

    // ---- day-of-week × hour activity heatmap with exact share: the
    // dashboard matrix, on pure epoch arithmetic ((d+4) mod 7 weekday,
    // epoch-hour mod 24) so both engines share one integer definition.
    // ≤168 cells at any scale; the total is a 1-row broadcast ----
    "events_heatmap" -> ((s, dir) => {
      val byCell = Tables.events(s, dir).filter(col("ts").isNotNull)
        .groupBy(expr("((CAST(ts AS LONG) div 86400) + 4) % 7").as("dow"),
          expr("(CAST(ts AS LONG) div 3600) % 24").as("hour"))
        .agg(count(lit(1)).as("n"))
      byCell.crossJoin(broadcast(byCell.agg(sum(col("n")).as("n_all"))))
        .select(col("dow"), col("hour"), col("n"),
          expr("n * 1000000 div n_all").as("share_e6"))
    }),

    // ---- hapax legomena and type-token ratios: the lexicostatistics
    // headline (a high hapax share means productive vocabulary — or OCR
    // noise; a low one means templated text). One token aggregate, one
    // 1-row reduce, exact e6 rationals ----
    "vocab_hapax" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n_i"))
      counts.agg(sum(col("n_i")).as("n_tokens"), count(lit(1)).as("n_types"),
          count(when(col("n_i") === 1, 1)).as("n_hapax"))
        .select(col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("n_hapax * 1000000 div nullif(n_types, 0)").as("hapax_share_e6"),
          expr("n_types * 1000000 div nullif(n_tokens, 0)").as("type_token_e6"))
    }),

    // ---- exact distributed isotonic regression (PAVA by the
    // Barlow-Brunk minimax identity): the nondecreasing purchase-rate
    // calibration curve over log-scale value buckets.
    //   fitted_i = max_{j≤i} min_{k≥i} weightedMean(j..k)
    // and because floor is monotone, min/max of FLOORED e6 means equal
    // the floored e6 of the true min/max — so taking every pooled mean
    // as its exact `div`-truncated integer FIRST yields exactly
    // floor(fit·1e6), no float ever. The bucket domain is bit-length of
    // cents (≤63 values at ANY data scale — a hard bound, unlike value
    // quantiles), so the j≤k pooled-mean grid (≤B² rows) and its two
    // window passes are domain-bounded (the parts_skyline argument);
    // the pair join declares its bound with limit(1024) (the kendall
    // precedent). Sequential PAVA pooling never happens — the minimax
    // form is embarrassingly parallel ----
    "isotonic_calibration" -> ((s, dir) =>
      isotonicFitFor(s, dir)
        .selectExpr("b AS bucket", "n", "p AS n_pos",
          "CAST(p * 1000000 div n AS BIGINT) AS rate_e6", "iso_e6")),

    // ---- Murphy (1973) decomposition of the Brier score of the
    // isotonic-calibrated forecast: brier = REL − RES + UNC over the
    // same bit-length buckets. With o ∈ {0,1} and the integer e6
    // forecast f, every bucket's Σ(f − o·1e6)² collapses to
    // n·f² − 2·f·1e6·p + p·1e12 — EXACT, no division; only the ō²
    // terms carry one per-bucket `div` (deterministic in both engines),
    // so the reported components satisfy the identity to a few e-12
    // ulps (spec-asserted). Everything decimal(38,0)-staged: safe to
    // ~1e12 rows ----
    "brier_decomposition" -> ((s, dir) => {
      val per = isotonicFitFor(s, dir).selectExpr("n", "p",
        """CAST(n AS DECIMAL(38,0)) * iso_e6 * iso_e6
           - 2 * CAST(iso_e6 AS DECIMAL(38,0)) * 1000000 * p
           + CAST(p AS DECIMAL(38,0)) * 1000000000000 AS sq""",
        "CAST(p AS DECIMAL(38,0)) * p * 1000000000000 div n AS nob2")
      per.agg(sum("n").as("nn"), sum("p").as("pp"), sum("sq").as("sq"),
          sum("nob2").as("nob2"))
        .selectExpr("CAST(nn AS BIGINT) AS n_rows",
          "CAST(pp AS BIGINT) AS n_pos",
          "CAST(sq div nullif(nn, 0) AS BIGINT) AS brier_e12",
          """CAST((sq - CAST(pp AS DECIMAL(38,0)) * 1000000000000 + nob2)
             div nullif(nn, 0) AS BIGINT) AS rel_e12""",
          """CAST((nob2 - CAST(pp AS DECIMAL(38,0)) * pp * 1000000000000
                          div nullif(nn, 0))
             div nullif(nn, 0) AS BIGINT) AS res_e12""",
          """CAST(CAST(pp AS DECIMAL(38,0)) * (nn - pp) * 1000000000000
             div nullif(CAST(nn AS DECIMAL(38,0)) * nn, 0) AS BIGINT)
             AS unc_e12""")
    }),

    // ---- Cohen's kappa inter-annotator agreement: the labeling-pipeline
    // metric — how far beyond chance do two keep/drop annotators agree?
    // Annotator A = the quality heuristic at its 0.8 line (the corpus median — a balanced annotator; 0.5 passes everything), annotator B =
    // the language-ID 'en' decision (two real, independent keep policies
    // over the same corpus). One scan into a 1-row confusion aggregate;
    // kappa = (N·agree − pe·N²) / (N² − pe·N²) with pe·N² = a1·b1 +
    // (N−a1)(N−b1), every term an exact integer, decimal-staged; the
    // division TRUNCATES toward zero in both engines (kappa can be
    // negative — `div`/`//`, never a floor identity) ----
    "annotator_kappa" -> ((s, dir) => {
      val flags = Tables.documents(s, dir).select(
        (floor(Text.qualityScoreRaw(col("text")) * 1e6 + 0.5) >= 800000)
          .cast("long").as("a"),
        (Text.langId(col("text")) === "en").cast("long").as("b"))
      flags
        .agg(count(lit(1)).as("n"), sum("a").as("a1"), sum("b").as("b1"),
          sum(col("a") * col("b")).as("n11"))
        .selectExpr("n AS n_docs", "a1 AS n_quality", "b1 AS n_english",
          "n - a1 - b1 + 2 * n11 AS n_agree",
          """CAST((n - a1 - b1 + 2 * n11) * 1000000 div nullif(n, 0) AS BIGINT)
             AS po_e6""",
          """CAST((CAST(n AS DECIMAL(38,0)) * (n - a1 - b1 + 2 * n11)
                   - (CAST(a1 AS DECIMAL(38,0)) * b1
                      + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1))) * 1000000
             div nullif(CAST(n AS DECIMAL(38,0)) * n
                   - (CAST(a1 AS DECIMAL(38,0)) * b1
                      + CAST(n - a1 AS DECIMAL(38,0)) * (n - b1)), 0)
             AS BIGINT) AS kappa_e6""")
    }),

    // ---- chi-square keyword extraction: terms most distinctive of the
    // even-doc_id half of the corpus vs the odd half (the deterministic
    // split the bigram-LM/DSIR tier established), by document frequency
    // contingency: chi2 = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), staged in
    // decimal(38,0) so it is exact in both engines (the staging holds to
    // ~2.4M docs — past that, rank by the double form; here the corpus
    // head is what matters). One distinct (doc, term) projection, one
    // term agg, a 1-row total broadcast, top-20 via
    // TakeOrderedAndProject; df ≥ 5 cuts hapax noise ----
    "term_chi2_keywords" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pres = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
        .withColumn("even", (col("doc_id") % 2 === 0).cast("long"))
      val tot = docs.agg(
        sum((col("doc_id") % 2 === 0).cast("long")).as("n_even"),
        sum((col("doc_id") % 2 =!= 0).cast("long")).as("n_odd"))
      pres.groupBy("term")
        .agg(sum(col("even")).as("a"), sum(lit(1L) - col("even")).as("b"))
        .filter(col("a") + col("b") >= 5)
        .crossJoin(broadcast(tot))
        .selectExpr("term", "a", "b",
          """CAST(CAST(n_even + n_odd AS DECIMAL(38,0)) *
                  CAST(a * (n_odd - b) - b * (n_even - a) AS DECIMAL(38,0)) *
                  CAST(a * (n_odd - b) - b * (n_even - a) AS DECIMAL(38,0)) *
                  1000000
             div nullif(CAST(a + b AS DECIMAL(38,0)) *
                        (n_even + n_odd - a - b) * n_even * n_odd, 0)
             AS BIGINT) AS chi2_e6""")
        .orderBy(col("chi2_e6").desc, col("term").asc)
        .limit(20)
    }),

    // ---- engaged time as interval-union length: each event opens a
    // 30-minute activity window; overlapping windows within a user merge
    // (never double-counted), and the per-user union lengths sum to
    // total engaged user-seconds. The sweep runs entirely inside
    // per-user window partitions (scale-safe — no global order): ±1
    // deltas, running coverage, and segment lengths from lead(); a
    // segment counts while coverage ≥ 1. Tie order (+1 before −1,
    // event-id last) is total, and zero-length segments contribute 0
    // either way, so both engines agree exactly ----
    "session_coverage_seconds" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts").cast("long").as("t"), col("event_id"))
      val deltas = ev.select(col("user_id"), col("t"), lit(1L).as("dd"),
          col("event_id"))
        .unionAll(ev.select(col("user_id"), (col("t") + 1800).as("t"),
          lit(-1L).as("dd"), col("event_id")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("t").asc, col("dd").desc, col("event_id").asc)
      val seg = deltas
        .withColumn("cov", sum(col("dd")).over(w))
        .withColumn("nxt", lead(col("t"), 1).over(w))
        .withColumn("engaged",
          when(col("cov") >= 1 && col("nxt").isNotNull, col("nxt") - col("t"))
            .otherwise(lit(0L)))
      val perUser = seg.groupBy("user_id")
        .agg(sum(col("engaged")).as("engaged_s"))
      perUser.agg(count(lit(1)).as("n_users"),
        sum(col("engaged_s")).as("total_engaged_seconds"),
        expr("""CAST(sum(engaged_s) AS DECIMAL(38,0)) * 1000000
                div nullif(count(1), 0)""").as("mean_engaged_s_e6"))
    }),

    // ---- Simpson diversity of the corpus vocabulary — the log-free
    // concentration index (collision probability of two random tokens):
    // λ = Σ nᵢ(nᵢ−1) / N(N−1), plus its reciprocal "effective
    // vocabulary", both exact e6 rationals. One token aggregate, one
    // 1-row reduce; per-term products decimal-staged so a megatoken
    // head term cannot overflow ----
    "vocab_simpson" -> ((s, dir) => {
      val counts = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n_i"))
      counts.agg(sum(col("n_i")).as("n_tokens"), count(lit(1)).as("n_types"),
          sum(col("n_i").cast("decimal(38,0)") * (col("n_i") - 1)).as("coll"))
        .select(col("n_tokens"), col("n_types"),
          expr("""coll * 1000000
                  div nullif(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1), 0)""")
            .as("simpson_e6"),
          expr("""CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1) * 1000000
                  div nullif(coll, 0)""").as("eff_vocab_e6"))
    }),

    // ---- KMV set sketches: per-event-type user sets sketched to the 64
    // smallest portable hashes; pairwise Jaccard estimated from merged
    // sketches, with the exact Jaccard alongside — the deterministic
    // (hash-matchable) member of the set-similarity sketch family ----
    "kmv_type_jaccard" -> ((s, dir) => {
      val du = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), col("user_id")).distinct()
      val est = graft.operators.Sketches.kmvJaccardPairs(
        graft.operators.Sketches.kmvSketch(du, "event_type", "user_id", k = KmvK),
        "event_type", k = KmvK)
      val sizes = du.groupBy("event_type").agg(count(lit(1)).as("n"))
      val inter = du.select(col("event_type").as("set_a"), col("user_id"))
        .join(du.select(col("event_type").as("set_b"), col("user_id")), "user_id")
        .filter(col("set_a") < col("set_b"))
        .groupBy("set_a", "set_b").agg(count(lit(1)).as("n_inter"))
      est
        .join(sizes.select(col("event_type").as("set_a"), col("n").as("__na")), "set_a")
        .join(sizes.select(col("event_type").as("set_b"), col("n").as("__nb")), "set_b")
        .join(inter, Seq("set_a", "set_b"), "left")
        .withColumn("__ni", coalesce(col("n_inter"), lit(0L)))
        .withColumn("jaccard_exact_e6",
          floor(col("__ni") * lit(1000000L) /
            (col("__na") + col("__nb") - col("__ni")) + lit(0.5)).cast("long"))
        .select("set_a", "set_b", "n_sketch", "n_both",
          "jaccard_est_e6", "jaccard_exact_e6")
    }),

    // ---- embedding-modality END-TO-END dedup: LSH-bucketed cosine pairs
    // (the near_dup_lsh tier — candidate generation is a (tbl, bucket)
    // equi-join, never all-pairs) → connected components → drop every
    // non-keeper family member (mirror of dedup_near_keepers in the
    // vector modality). The exact pair tier stays available as the
    // recall oracle via near_dup_embeddings. ----
    "dedup_embed_keepers" -> ((s, dir) => {
      val pairs = Similarity.lshNearDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = Dim, nBits = NdBits, threshold = NdThreshold, tables = NdTables)
      val clusters = graft.operators.Components.connectedComponents(
        pairs.select("id_a", "id_b"), "id_a", "id_b")
      val losers = clusters.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("vec_id"))
      Tables.embeddings(s, dir).join(losers, Seq("vec_id"), "left_anti")
        .select("vec_id", "label")
    }),

    // ---- exact-substring (span-level) duplication, Lee et al. 2022 shape ----
    "substring_dup_spans" -> ((s, dir) =>
      graft.operators.SubstringDedup.dupSpans(
        Tables.documents(s, dir), "doc_id", "text", k = SubK)),
    "doc_dup_stats" -> ((s, dir) =>
      graft.operators.SubstringDedup.dupStats(
        Tables.documents(s, dir), "doc_id", "text", k = SubK)),
    "doc_cut_dup_spans" -> ((s, dir) =>
      graft.operators.SubstringDedup.cutDupSpans(
        Tables.documents(s, dir), "doc_id", "text", k = SubK)),

    // ---- E2E curation v2: substring surgery BEFORE the quality chain —
    // cut keep-one dup spans, rescore the cleaned text, exact-dedup on
    // cleaned text, deterministic 50% sample. Empty post-cut docs drop
    // before scoring (quality of "" divides by zero in both engines). ----
    "corpus_curate2" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text", "lang", "source")
      val cut = graft.operators.SubstringDedup.cutDupSpans(docs, "doc_id", "text", k = SubK)
        .withColumnRenamed("clean_text", "ctext")
      val base = docs.select(col("doc_id"), col("lang"), col("source"))
        .join(cut, Seq("doc_id"))
        .filter(length(col("ctext")) > 0)
      val scored = base
        .withColumn("__ws", Text.tokens(col("ctext")))
        .select(col("doc_id"), col("lang"), col("source"), col("ctext"), col("n_cut_tokens"),
          floor(Text.qualityScoreRaw(col("ctext")) * 1e6 + 0.5).cast("long").as("quality_e6"),
          floor(Text.repetitionFromTokens(col("__ws"), 3) * 1e6 + 0.5).cast("long").as("rep3_e6"))
        .filter(col("quality_e6") >= 800000L && col("rep3_e6") <= 10000L)
      val deduped = Dedup.exactDedup(scored, "doc_id", "ctext")
      graft.operators.Sampling.hashSample(deduped, "doc_id", fraction = 0.5)
        .select("doc_id", "lang", "source", "quality_e6", "rep3_e6", "n_cut_tokens")
    }),

    // ---- END-TO-END curation v3: the MODEL-FILTER chain — blocklist
    // screen + bigram-LM perplexity ceiling + DSIR importance floor, the
    // three model stages composed as one declarative plan (complements
    // corpus_curate's heuristic chain and corpus_curate2's span surgery) ----
    "corpus_curate3" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bl = graft.operators.TermStats.blocklistHits(docs, "doc_id", "text", BlockTerms)
      val ref = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      val lm = graft.operators.LangModel.bigramNll(ref, docs, "doc_id", "text")
      val ds = graft.operators.Importance.dsirWeights(
        docs.filter(col("lang") === "en"), docs, docs, "doc_id", "text", DsirBuckets)
      docs.select(col("doc_id"), col("lang"), col("source"))
        .join(bl.select(col("doc_id"), col("n_hits")), Seq("doc_id"))
        .join(lm.select(col("doc_id"), col("n_bigrams"), col("avg_nll_e6")), Seq("doc_id"))
        .join(ds.select(col("doc_id"), col("avg_logratio_e6")), Seq("doc_id"))
        .filter(col("n_hits") <= C3MaxHits &&
          col("n_bigrams") > 0 && col("avg_nll_e6") <= C3MaxNll &&
          col("avg_logratio_e6") >= C3MinLr)
        .select("doc_id", "lang", "source", "n_hits", "avg_nll_e6", "avg_logratio_e6")
    }),

    // ---- curation observability: survivor counts through the model
    // funnel (blocklist → LM perplexity ceiling → DSIR floor) in ONE
    // conditional-aggregation pass over the same three model joins
    // corpus_curate3 makes — the per-stage report a curation team reads
    // before trusting the thresholds; model-sized (1-row) output ----
    "curation_funnel" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bl = graft.operators.TermStats.blocklistHits(docs, "doc_id", "text", BlockTerms)
      val ref = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      val lm = graft.operators.LangModel.bigramNll(ref, docs, "doc_id", "text")
      val ds = graft.operators.Importance.dsirWeights(
        docs.filter(col("lang") === "en"), docs, docs, "doc_id", "text", DsirBuckets)
      val passBl = col("n_hits") <= C3MaxHits
      val passLm = col("n_bigrams") > 0 && col("avg_nll_e6") <= C3MaxNll
      val passDs = col("avg_logratio_e6") >= C3MinLr
      docs.select(col("doc_id"))
        .join(bl.select(col("doc_id"), col("n_hits")), Seq("doc_id"))
        .join(lm.select(col("doc_id"), col("n_bigrams"), col("avg_nll_e6")), Seq("doc_id"))
        .join(ds.select(col("doc_id"), col("avg_logratio_e6")), Seq("doc_id"))
        .agg(
          count(lit(1)).as("n_total"),
          count(when(passBl, 1)).as("n_after_blocklist"),
          count(when(passBl && passLm, 1)).as("n_after_lm"),
          count(when(passBl && passLm && passDs, 1)).as("n_after_dsir"))
    }),

    // ---- contiguous global index without a single-task window: ordering
    // by the portable hash = deterministic epoch shuffle (reproducible
    // permutation, no stored shuffle file, no global sort on one node) ----
    "doc_shuffle_index" -> ((s, dir) =>
      graft.operators.GlobalIndex.withGlobalIndex(
          Tables.documents(s, dir).select(col("doc_id"),
            graft.functions.PortableHash.hash60(col("doc_id")).as("__h")),
          "shuffle_idx", col("__h"), col("doc_id"))
        .select("doc_id", "shuffle_idx")),

    // ---- tokenizer-training statistics (BPE merge step) ----
    "bpe_pair_stats" -> ((s, dir) =>
      graft.operators.TermStats.topAdjacentPairs(
        Tables.documents(s, dir), "doc_id", "text", k = BpeTopK)),

    // ---- n-gram novelty (inverse of dup stats: grams unique corpus-wide) ----
    "doc_novelty" -> ((s, dir) =>
      graft.operators.TermStats.gramNovelty(
        Tables.documents(s, dir), "doc_id", "text", n = 3)),

    // ---- token-distribution entropy (diversity tail filter) ----
    "doc_entropy" -> ((s, dir) =>
      graft.operators.TermStats.tokenEntropy(
        Tables.documents(s, dir), "doc_id", "text")),

    // ---- blocklist screening (term-level unsafe-content filter) ----
    "doc_blocklist" -> ((s, dir) =>
      graft.operators.TermStats.blocklistHits(
        Tables.documents(s, dir), "doc_id", "text", BlockTerms)),

    // ---- unigram corpus-frequency scoring (exact-integer LM surrogate) ----
    "doc_token_freq" -> ((s, dir) =>
      graft.operators.TermStats.corpusFrequencyScores(
        Tables.documents(s, dir), "doc_id", "text")),

    // ---- PMI collocation mining over adjacent token pairs — the
    // pointwise-mutual-information ranking that separates true
    // collocations from mere co-frequency (bpe_pair_stats' count
    // ranking). Margins are computed over ALL pairs before the support
    // floor (the statistically correct denominator); the two margin
    // joins are vocab-sized equi-joins, the pair total broadcasts, and
    // the top-K rides TakeOrderedAndProject. Per-pair ln floored to _e6
    // — exact cross-engine ordering, deterministic (l, r) tiebreak. ----
    "term_pmi_pairs" -> ((s, dir) => {
      val pairs = Tables.documents(s, dir)
        .select(Text.tokens(col("text")).as("__ws"))
        .filter(size(col("__ws")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("__ws")) - 2),
          i => struct(element_at(col("__ws"), i + 1).as("l"),
            element_at(col("__ws"), i + 2).as("r")))).as("__p"))
        .select(col("__p.l").as("l"), col("__p.r").as("r"))
        .groupBy("l", "r").agg(count(lit(1)).as("c_lr"))
      val lm = pairs.groupBy("l").agg(sum("c_lr").as("c_l"))
      val rm = pairs.groupBy("r").agg(sum("c_lr").as("c_r"))
      val tot = pairs.agg(sum("c_lr").as("np"))
      pairs.filter(col("c_lr") >= PmiMinCount)
        .join(lm, Seq("l")).join(rm, Seq("r"))
        .crossJoin(broadcast(tot))
        .withColumn("pmi_e6",
          floor(log(col("c_lr").cast("double") * col("np").cast("double")
            / (col("c_l").cast("double") * col("c_r").cast("double")))
            * lit(1000000.0) + lit(0.5)).cast("long"))
        .orderBy(col("pmi_e6").desc, col("l").asc, col("r").asc)
        .limit(PmiTopK)
        .select("l", "r", "c_lr", "pmi_e6")
    }),

    // ---- trigram-index substring search: the inverted-index scale path
    // for `LIKE '%pattern%'`. Candidate docs must contain EVERY trigram
    // of the pattern (a lossless superset — the classic pg_trgm /
    // code-search design), discovered via an equi-join on trigram keys
    // against a tiny literal set instead of a full-corpus regex scan;
    // the verify step then runs `instr` on candidates only. At 100 TB
    // the candidate set is selectivity-sized while the grams relation
    // is a map-side filter (isin on ≤|pattern| literals) — no shuffle
    // carries the corpus. Oracle = the semantic spec (plain instr),
    // which the index path provably equals. ----
    "trigram_search" -> ((s, dir) => {
      val tris = TrigramPattern.sliding(3).toSeq.distinct
      val cand = Tables.documents(s, dir)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), explode(array_distinct(
          filter(transform(sequence(lit(0), length(col("text")) - 3),
            i => col("text").substr(i + lit(1), lit(3))),
            g => g.isin(tris: _*)))).as("tri"))
        .groupBy("doc_id").agg(count(lit(1)).as("ntri"))
        .filter(col("ntri") === lit(tris.size))
      Tables.documents(s, dir)
        .join(cand, Seq("doc_id"), "left_semi")
        .filter(instr(col("text"), TrigramPattern) > 0)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // ---- per-source KL divergence vs the corpus unigram distribution —
    // the distribution-shift screen for corpus mixing (which sources'
    // token statistics deviate most from the blend they feed). No
    // smoothing needed: KL(P_s‖P_corpus) only sums where n_st > 0 and
    // the corpus marginal dominates every source. Shapes: the (source,
    // term) relation is vocab·|sources|-bounded; the term marginal joins
    // back as a vocab-sized equi-join, the source marginal and grand
    // total broadcast (|sources| and 1 rows). Per-term ln floored to _e6
    // keeps the weighted sums exact integers (doc_entropy discipline).
    "source_token_kl" -> ((s, dir) => {
      val st = Tables.documents(s, dir)
        .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("source", "term").agg(count(lit(1)).as("nst"))
      val tm = st.groupBy("term").agg(sum("nst").as("nt"))
      val sm = st.groupBy("source").agg(sum("nst").as("ns"))
      val tot = sm.agg(sum("ns").as("nn"))
      st.join(tm, Seq("term"))
        .join(broadcast(sm), Seq("source"))
        .crossJoin(broadcast(tot))
        .groupBy("source")
        .agg(max("ns").as("n_tokens"), count(lit(1)).as("n_terms"),
          floor(sum(col("nst") * floor(
              log(col("nst").cast("double") * col("nn").cast("double")
                / (col("ns").cast("double") * col("nt").cast("double")))
                * lit(1000000.0) + lit(0.5)).cast("long")).cast("double")
            / max("ns") + lit(0.5)).cast("long").as("kl_vs_corpus_e6"))
    }),

    // ---- Heaps-law vocabulary growth without logs: |vocab| after the
    // first T docs for T = powers of two. Each token carries its FIRST
    // document (one map-side-combinable min agg over the vocab-sized
    // token relation), lands in doubling bucket idx = bits(first_doc)
    // (exact via length(bin(x)) — identical in both engines, no
    // floating log2), and the curve is a cumulative sum over ≤ ~32
    // bucket rows. The corpus-scaling diagnostic that decides tokenizer
    // vocab budgets ----
    "vocab_growth" -> ((s, dir) => {
      val wcum = Window.orderBy(col("idx").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("__ws"))
        .select(col("doc_id"), explode(array_distinct(col("__ws"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
        .select(expr(
          "CAST(CASE WHEN first_doc = 0 THEN 0 ELSE length(bin(first_doc)) END AS INT)")
          .as("idx"))
        .groupBy("idx").agg(count(lit(1)).as("n_new_tokens"))
        .withColumn("first_t_docs", expr("CAST(shiftleft(1L, idx) AS BIGINT)"))
        .withColumn("vocab", sum(col("n_new_tokens")).over(wcum))
        .select(col("first_t_docs"), col("n_new_tokens"),
          col("vocab").cast("long").as("vocab"))
    }),

    // ---- deterministic readability scoring (Flesch 1948 proxy):
    // syllables counted as maximal [aeiouy]+ runs (two regexp collapses,
    // no sentinel char: runs = len(collapse-to-one) − len(remove-all)),
    // sentences as [.!?]+ runs with the whole-doc-as-fragment floor of 1
    // (this corpus has no terminal punctuation, so the per-doc signal
    // lives in syllables/word — the word-complexity term). All-integer
    // Flesch·1e3 via `div`, identical in both engines. ONE map-only
    // projection over the scan: zero shuffles at any corpus size. ----
    "doc_readability" -> ((s, dir) => {
      val txt = lower(col("text"))
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(filter(Text.tokens(col("text")), t => length(t) > 0))
            .cast("long").as("n_words"),
          (length(regexp_replace(txt, "[aeiouy]+", "a"))
            - length(regexp_replace(txt, "[aeiouy]+", "")))
            .cast("long").as("n_syllables"),
          greatest(
            length(regexp_replace(txt, "[.!?]+", "."))
              - length(regexp_replace(txt, "[.!?]+", "")), lit(1))
            .cast("long").as("n_sentences"))
        .filter(col("n_words") > 0)
        .withColumn("syll_per_word_e6",
          expr("n_syllables * 1000000 div n_words"))
        .withColumn("flesch_e3",
          lit(206835L) - expr("1015 * n_words div n_sentences")
            - expr("84600 * n_syllables div n_words"))
    }),

    // ---- Zipf rank-frequency slope: OLS of ln(freq) on ln(rank) over
    // the top-K corpus terms — the standard power-law diagnostic for a
    // training corpus (natural text ≈ −1; a flatter slope flags
    // templated/synthetic data). The tf shuffle is vocab-sized and
    // map-side combinable; orderBy+limit compiles to
    // TakeOrderedAndProject (per-partition partial top-K — never a
    // global sort); the ranking window runs over the K=256-row bounded
    // head. Per-row ln floored to _e4 (IEEE-identical in both engines)
    // makes the OLS sums exact integers; |sums| < 1e15 ≪ Long.Max. ----
    "zipf_slope" -> ((s, dir) => {
      val byFreq = Window.orderBy(col("freq").desc, col("term").asc)
      val ranked = Tables.documents(s, dir)
        .select(explode(Text.tokens(col("text"))).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term").asc)
        .limit(ZipfTopK)
        .withColumn("rank", row_number().over(byFreq).cast("long"))
        .select(
          floor(log(col("rank").cast("double")) * 10000.0 + 0.5)
            .cast("long").as("x"),
          floor(log(col("freq").cast("double")) * 10000.0 + 0.5)
            .cast("long").as("y"))
      ranked
        .agg(count(lit(1)).as("n_terms"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_e6",
          when(col("n_terms") * col("sxx") - col("sx") * col("sx") =!= 0,
            floor((col("n_terms") * col("sxy") - col("sx") * col("sy"))
              * lit(1.0)
              / (col("n_terms") * col("sxx") - col("sx") * col("sx"))
              * lit(1000000.0) + lit(0.5)).cast("long")))
        .select("n_terms", "sx", "sy", "slope_e6")
    }),

    // ---- bigram-LM perplexity scoring (CCNet-style filter): model trained
    // on the deterministic hash-half reference corpus, every doc scored ----
    "doc_lm_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ref = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.LangModel.bigramNll(ref, docs, "doc_id", "text")
    }),

    // ---- DSIR importance weights: target = English docs, raw = all;
    // hashed-unigram bucket model broadcasts, corpus never key-shuffles ----
    "dsir_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Importance.dsirWeights(
        docs.filter(col("lang") === "en"), docs, docs,
        "doc_id", "text", buckets = DsirBuckets)
    }),

    // ---- Naive Bayes language classifier: closed-form training on the
    // hash-half labeled corpus, every doc classified in the same plan ----
    "nb_lang_classify" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.NaiveBayes.classify(train, docs, "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"),
          col("pred_label").as("pred_lang"), col("score_e6"),
          when(col("pred_label") === col("lang"), 1).otherwise(0)
            .cast("int").as("correct"))
    }),

    // ---- pseudo-labeled QUALITY classifier (the fastText-filter recipe:
    // heuristic score labels a train half, NB learns the label from raw
    // tokens, the model generalizes past the heuristic's feature set) ----
    "nb_quality_classify" -> ((s, dir) => {
      val labeled = Tables.documents(s, dir).select(col("doc_id"), col("text"),
        when(floor(graft.functions.Text.qualityScoreRaw(col("text")) * lit(1e6) + lit(0.5))
          .cast("long") >= 800000L, "hi").otherwise("lo").as("__qlab"))
      val train = labeled.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.NaiveBayes.classify(train, labeled, "doc_id", "text", "__qlab")
        .join(labeled.select(col("doc_id"), col("__qlab")), Seq("doc_id"))
        .select(col("doc_id"), col("__qlab").as("qlabel"),
          col("pred_label").as("pred_qlabel"), col("score_e6"),
          when(col("pred_label") === col("__qlab"), 1).otherwise(0)
            .cast("int").as("correct"))
    }),

    // ---- learning curve (the data-scaling-law measurement a curation
    // team runs before buying more labels): NB accuracy on the FIXED
    // held-out half as the training set doubles through NESTED
    // hash-residue subsets (1/8 ⊂ 2/8 ⊂ 4/8 of the corpus — nesting via
    // residues of ONE portable hash, so each point adds data to the
    // previous point rather than resampling it, the protocol that makes
    // the curve monotone-comparable). Three closed-form model builds +
    // three broadcast-scored passes over the same test half; every
    // model is a broadcast, nothing shuffles with corpus² ----
    "nb_learning_curve" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val h8 = pmod(
        graft.functions.PortableHash.hash60(col("doc_id")), lit(8L))
      val test = docs.filter(pmod(h8, lit(2L)) === 1)
      Seq((1, Seq(0L)), (2, Seq(0L, 4L)), (4, Seq(0L, 2L, 4L, 6L))).map {
        case (eighths, res) =>
          val train = docs.filter(h8.isin(res: _*))
          graft.operators.NaiveBayes
            .classify(train, test, "doc_id", "text", "lang")
            .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
            .agg(count(lit(1)).as("n_test"),
              sum(when(col("pred_label") === col("lang"), 1L).otherwise(0L))
                .as("n_correct"))
            .crossJoin(broadcast(train.agg(count(lit(1)).as("n_train"))))
            .select(lit(eighths).as("train_eighths"),
              col("n_train"), col("n_test"), col("n_correct"),
              expr("CAST(floor(n_correct * 1.0 / n_test * 1000000.0 + 0.5) AS BIGINT)")
                .as("acc_e6"))
      }.reduce(_.unionByName(_))
    }),

    // ---- classifier evaluation: full confusion matrix (the
    // train-side-signal report a curation team reads before trusting a
    // model filter) ----
    "nb_confusion" -> ((s, dir) =>
      queries("nb_lang_classify")(s, dir)
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"))),

    // ---- uncertainty sampling: the 25 docs the NB filter is least sure
    // about (smallest top-2 margin) — where a labeling budget goes ----
    "nb_uncertain" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.NaiveBayes.uncertainMargins(
        train, docs, "doc_id", "text", "lang", k = 25)
    }),

    // ---- calibration curve: accuracy per margin decile — is the NB
    // margin a trustworthy confidence signal? ----
    "nb_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.NaiveBayes.calibrationCurve(
        train, docs, "doc_id", "text", "lang", buckets = 10)
    }),

    // ---- label-noise audit: docs the NB filter CONFIDENTLY contradicts
    // (pred ≠ label, largest margins) — likely annotation errors ----
    "nb_label_noise" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val train = docs.filter(
        graft.functions.PortableHash.hash60(col("doc_id")) % 2 === 0)
      graft.operators.NaiveBayes.confidentErrors(
        train, docs, "doc_id", "text", "lang", k = 25)
    }),

    // ---- contrastive triplets: near-dup pairs (LSH scale path) as
    // positives, deterministic pool-hash negatives ----
    "contrastive_triplets" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        dim = Dim, nBits = NdBits, threshold = NdThreshold, tables = NdTables)
      graft.operators.Contrastive.triplets(pairs, emb, "vec_id", poolSize = CtPool)
    }),

    // ---- int8 scalar quantization of embeddings (ANN index compression;
    // per-element IEEE arithmetic → bit-identical codes on any engine) ----
    "embedding_quantize" -> ((s, dir) =>
      graft.operators.Quantize.int8(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("q_lo"), col("q_hi"),
          concat_ws(",", col("qvec")).as("qvec_csv"))),

    // ---- Johnson-Lindenstrauss random projection audit: exact-integer
    // ±1 projections 64→16 with the per-vector norm-distortion ratio —
    // the number that decides the target dimension before an ANN or
    // clustering pipeline switches to projected vectors ----
    "embedding_rp_audit" -> ((s, dir) =>
      graft.operators.Quantize.randomProject(Tables.embeddings(s, dir),
        "vec_id", "embedding", dim = Dim, k = RpK)),

    // ---- semantic dedup (SemDeDup): within-centroid-cell cosine pairs ----
    "semantic_dedup_pairs" -> ((s, dir) =>
      Similarity.semanticNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        nlist = SemNlist, threshold = SemThreshold)),
    "semantic_dedup_keepers" -> ((s, dir) =>
      Similarity.semanticDedupKeepers(Tables.embeddings(s, dir), "vec_id", "embedding",
          nlist = SemNlist, threshold = SemThreshold)
        .select("vec_id", "label")),

    // ---- text analysis over documents ----
    // quality emitted in integer micro-units: floor(x*1e6+0.5) is
    // bit-identical IEEE arithmetic in both engines, whereas round(x, 6)
    // differs at exact .5 boundaries (Spark BigDecimal HALF_UP vs DuckDB's
    // scaled-double path — observed on 1 of 5000 docs at sf0.1)
    // ---- END-TO-END corpus curation: quality floor + repetition cap +
    // exact-dedup keeper + deterministic 50% downsample, as ONE
    // declarative plan over one scan — the full filter chain a training
    // pipeline runs, each stage the operator registered individually ----
    "corpus_curate" -> ((s, dir) => {
      val docs = graft.operators.Partitions.widen(
        Tables.documents(s, dir).select("doc_id", "text", "lang", "source"),
        col("doc_id"))
      val scored = docs
        .withColumn("__ws", Text.tokens(col("text")))
        .select(col("doc_id"), col("lang"), col("source"), col("text"),
          floor(Text.qualityScoreRaw(col("text")) * 1e6 + 0.5).cast("long")
            .as("quality_e6"),
          floor(Text.repetitionFromTokens(col("__ws"), 3) * 1e6 + 0.5).cast("long")
            .as("rep3_e6"))
        .filter(col("quality_e6") >= 800000L && col("rep3_e6") <= 10000L)
      val deduped = Dedup.exactDedup(scored, "doc_id", "text")
      graft.operators.Sampling.hashSample(deduped, "doc_id", fraction = 0.5)
        .select("doc_id", "lang", "source", "quality_e6", "rep3_e6")
    }),

    "doc_quality" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          floor(Text.qualityScoreRaw(col("text")) * 1e6 + 0.5).cast("long")
            .as("quality_e6"))),
    "doc_lang" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))),
    // ---- T5-style span corruption plan: per document, which token
    // positions a SpanMaskPct% deterministic mask hits and how they
    // coalesce into contiguous spans — the preprocessing op behind
    // span-corruption pretraining objectives. The mask decision is the
    // oracle-exact PortableHash on (doc_id:pos), so the corruption is
    // reproducible across engines, runs, and shuffles (no stored mask
    // file at any scale); span starts come from one per-doc lag pass
    // over the masked positions. Map-only until the per-doc window;
    // nothing global anywhere. ----
    "span_corruption" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      val masked = toks.filter(
        pmod(graft.functions.PortableHash.hash60(
          concat(col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))),
          lit(100)) < SpanMaskPct)
      val w = Window.partitionBy("doc_id").orderBy(col("pos"))
      val spans = masked
        .withColumn("prev", lag(col("pos"), 1).over(w))
        .select(col("doc_id"),
          when(col("prev").isNull || col("pos") - col("prev") > 1, 1L)
            .otherwise(0L).as("isStart"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_masked"), sum("isStart").as("n_spans"))
      Tables.documents(s, dir)
        .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
        .join(spans, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"))
        .withColumn("mask_rate_e6",
          expr("CAST(n_masked * 1000000 div n_tokens AS BIGINT)"))
    }),

    // ---- langID confusion matrix: the heuristic doc_lang prediction
    // against the labeled lang column, plus micro-accuracy — the
    // eval-harness face of the langID operator. Bounded |langs|²
    // cells after one map-combinable shuffle; accuracy rides a 1-row
    // broadcast of the same cells. ----
    "doc_lang_confusion" -> ((s, dir) => {
      val cells = Tables.documents(s, dir)
        .select(col("lang"), Text.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      val tot = cells.agg(sum("n").as("nn"),
        sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(lit(0L)))
          .as("ok"))
      cells.crossJoin(broadcast(tot))
        .select(col("lang"), col("lang_pred"), col("n"),
          expr("CAST(ok * 1000000 div nn AS BIGINT)").as("accuracy_e6"))
    }),

    // ---- dedup threshold sensitivity sweep: component structure of the
    // near-dup graph at Jaccard cuts 0.25/0.5/0.75 (binary-exact
    // literals, safely above the pin's 0.2 candidate cut so the
    // comparison is the same raw IEEE double in both engines) — the
    // tuning table that says how aggressive a dedup pass gets before
    // clusters chain together. Each cut filters the PINNED pair
    // relation and runs the bounded-iteration min-label components;
    // stats per cut are O(nodes) aggregates collected as a 3-row model
    // (the km_churn driver-model discipline). ----
    "dup_threshold_sweep" -> ((s, dir) => {
      import s.implicits._
      val pairs = jaccardPairsFor(s, dir)
      val rows = Seq(0.25, 0.5, 0.75).map { t =>
        val p = pairs.filter(col("jaccard") >= t)
        val nEdges = p.count()
        if (nEdges == 0L) ((t * 1e6).toLong, 0L, 0L, 0L, 0L)
        else {
          val labels = graft.operators.Components
            .connectedComponents(p, "id_a", "id_b")
          val cs = labels.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
            .agg(sum("sz").as("n_nodes"), count(lit(1)).as("n_components"),
              max("sz").as("max_component")).collect().head
          ((t * 1e6).toLong, nEdges, cs.getLong(0), cs.getLong(1), cs.getLong(2))
        }
      }
      rows.toDF("threshold_e6", "n_edges", "n_nodes", "n_components",
        "max_component")
    }),

    "doc_tokens" -> ((s, dir) =>
      // tokenize ONCE into an attribute: inlining split() into the n-gram
      // lambda is O(tokens²) interpreted work per doc (see Dedup.shingles)
      graft.operators.Partitions.widen(
          Tables.documents(s, dir).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"), Text.tokens(col("text")).as("__ws"))
        .select(
          col("doc_id"),
          size(col("__ws")).cast("long").as("n_tokens"),
          size(Text.nGramsFromTokens(col("__ws"), 3)).cast("long").as("n_grams3"))),
    // phrase search on a POSITIONAL inverted index: postings are
    // (term, doc_id, pos); a 2-term phrase is an equi-join of the two
    // terms' postings on (doc_id, pos+1) — the classic IR phrase-query
    // plan. The term filters run BEFORE the join (each side is only one
    // term's postings, a tiny fraction of the corpus), and the join key
    // includes the position, so the shuffle is on (doc_id, pos) — no
    // doc-level hot key even when one document repeats the term heavily.
    // At 100 TB the index would be materialized once and bucketed by
    // term; the per-query plan here is the probe side of that layout ----
    "phrase_search" -> ((s, dir) => {
      val postings = Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      val first = postings.filter(col("term") === "table")
        .select(col("doc_id"), (col("pos") + 1).as("next_pos"))
      val second = postings.filter(col("term") === "scan")
        .select(col("doc_id"), col("pos").as("next_pos"))
      first.join(second, Seq("doc_id", "next_pos"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
    }),
    "doc_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))),
    "dedup_by_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(Text.fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_dups"))),
    "doc_redact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.redact(col("text")).as("clean"))),

    // ---- deterministic sampling / dataset splits ----
    "sample_docs" -> ((s, dir) =>
      graft.operators.Sampling.hashSample(
          Tables.documents(s, dir), "doc_id", fraction = 0.25)
        .select("doc_id", "lang", "source")),
    "train_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.Sampling.splitColumn(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))),

    // ---- leakage-safe split: a near-duplicate of a training doc in the
    // eval split silently inflates every benchmark number, so the split
    // decision hashes each doc's CLUSTER REPRESENTATIVE (connected
    // component of the near-dup graph; itself if unclustered) — whole
    // dup families land on one side, cross-split contamination is
    // structurally zero (spec-asserted). The per-doc split assignment
    // stays stable as the corpus grows: adding docs can merge families
    // (representatives can change) but never flips an isolated doc. ----
    "split_leakage_safe" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val clusters = dedupClustersFor(s, dir)
      docs.select(col("doc_id"))
        .join(clusters.select(col("id").as("doc_id"), col("cluster_id")),
          Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
        .select(col("doc_id"), col("rep"),
          graft.operators.Sampling.splitColumn(col("rep"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    }),

    // ---- bloom-pruned shuffle join: fact rows filtered by a dim-key
    // bloom sketch BEFORE the exchange; plain-join oracle proves exactness ----
    "bloom_prune_join" -> ((s, dir) => {
      val dim = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_orderpriority")
      val fact = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      graft.operators.BloomJoin.pruneJoin(
          fact, dim, "l_orderkey", "o_orderkey", expectedItems = 1L << 20)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_e4"))
    }),

    // ---- incremental aggregate maintenance: snapshot(old) ⊕ partials(new)
    // ≡ full recompute (the oracle aggregates everything directly) ----
    "incr_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("ts"),
          round(col("value") * 100).cast("long").as("v"))
      val cutoff = lit("2024-01-20").cast("timestamp")
      val old = graft.operators.Incremental.partials(
        ev.filter(col("ts") < cutoff), Seq("event_type"), col("v"))
      val delta = graft.operators.Incremental.partials(
        ev.filter(col("ts") >= cutoff), Seq("event_type"), col("v"))
      graft.operators.Incremental.withAvg(
        graft.operators.Incremental.merge(Seq(old, delta), Seq("event_type")))
    }),

    // ---- RETRACTABLE incremental aggregates: the same snapshot-merge
    // discipline under a changelog WITH DELETES (op ±1) — three insert
    // batches plus a retraction batch merge to exactly the aggregate of
    // the live rows (count/sum form a group, so retractions are inverse
    // elements); the oracle recomputes over the live set directly ----
    "incr_agg_retract" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      val inserts = (0L until 3L).map(b =>
        ev.filter(pmod(col("event_id"), lit(3)) === b).withColumn("op", lit(1)))
      val retractions = ev.filter(col("event_id") % 5 === 0)
        .withColumn("op", lit(-1))
      val parts = (inserts :+ retractions).map(b =>
        graft.operators.Incremental.retractPartials(
          b, Seq("event_type"), col("v"), col("op")))
      graft.operators.Incremental.retractMerge(parts, Seq("event_type"))
    }),

    // ---- incremental JOIN view maintenance: the maintained view
    // (V_old ∪ ΔV with ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB) must equal the full
    // recomputation — the oracle computes the plain join, so the hash
    // match IS the delta-join correctness proof. Deltas cut both sides:
    // late orders (time) and a customer-dimension backfill (hash). ----
    "incr_join_view" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
        .select(col("o_custkey").as("custkey"), col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      val cutoff = lit("1996-01-01").cast("date")
      val (aOld, aDelta) = (orders.filter(col("o_orderdate") < cutoff),
        orders.filter(col("o_orderdate") >= cutoff))
      val (bOld, bDelta) = (cust.filter(pmod(col("custkey"), lit(10)) =!= 0),
        cust.filter(pmod(col("custkey"), lit(10)) === 0))
      val vOld = aOld.join(bOld, Seq("custkey"))
      val maintained = vOld.unionByName(
        graft.operators.Incremental.joinDelta(aOld, bOld, aDelta, bDelta, Seq("custkey")))
      maintained.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("revenue_cents"))
    }),

    // ---- streaming snapshot maintenance, batch-replay form: drive the
    // REAL foreachBatch merge cycle (write-tmp → swap, replay-skip marker)
    // over 3 deterministic micro-batches — batch 1 delivered TWICE to
    // exercise the at-least-once redelivery skip — and return the final
    // snapshot. Oracle: a full recompute over all events, which the
    // monoid merge law guarantees is identical ----
    "incr_snapshot_replay" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir) // session pin, see its scaladoc
        .map(_.select(col("event_type"), col("event_id"), col("v_cents").as("v")))
      val snapDir = tempSnapshotBase("graft-snap")
      val tag = "replay-lineage"
      for (b <- 0L until 3L) {
        val batch = batches(b.toInt)
        graft.streaming.StreamingKpis.mergeBatchIntoSnapshot(
          batch, Seq("event_type"), "v", snapDir, tag, b)
        // foreachBatch is at-least-once: the same (tag, batchId) arriving
        // again must be skipped, not double-counted
        if (b == 1L) graft.streaming.StreamingKpis.mergeBatchIntoSnapshot(
          batch, Seq("event_type"), "v", snapDir, tag, b)
      }
      s.read.parquet(snapDir).select("event_type", "n", "sum_v", "min_v", "max_v")
    }),

    // ---- same replay cycle through the reader-atomic VERSIONED snapshot
    // (pointer-file commit instead of dir rename-swap) — proves the
    // transactional publish path end-to-end against the same full-recompute
    // oracle ----
    "incr_snapshot_versioned" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir) // session pin, see its scaladoc
        .map(_.select(col("event_type"), col("event_id"), col("v_cents").as("v")))
      val base = tempSnapshotBase("graft-vsnap")
      val tag = "versioned-lineage"
      for (b <- 0L until 3L) {
        val batch = batches(b.toInt)
        graft.streaming.VersionedSnapshot.mergeBatch(
          batch, Seq("event_type"), "v", base, tag, b)
        if (b == 1L) graft.streaming.VersionedSnapshot.mergeBatch(
          batch, Seq("event_type"), "v", base, tag, b)
      }
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("event_type", "n", "sum_v", "min_v", "max_v")
    }),

    // ---- row-level MERGE INTO against the versioned snapshot: the
    // Delta-shape upsert/delete contract (WHEN MATCHED UPDATE / DELETE,
    // WHEN NOT MATCHED INSERT) as copy-on-write pointer-committed
    // publishes; docs with doc_id%10≠0 seed the table, docs with
    // doc_id%5=0 arrive as the source batch (overlap = updates/deletes,
    // remainder = inserts) ----
    "snapshot_merge_upsert" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-merge")
      graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 10 =!= 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "seed")
      graft.streaming.VersionedSnapshot.mergeInto(
        base,
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000),
        Seq("doc_id"), graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "upsert")
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("doc_id", "n_chars", "lang")
    }),
    // ---- GDPR purge through retained history: seed → upsert, then
    // purgeKeys physically removes a deterministic subject set from BOTH
    // retained versions in place (zone/hash-pruned dir rewrites, shared
    // dirs rewritten once). Output reads v0 (time travel) AND current —
    // the purged keys must be gone from each while every other row keeps
    // its version-correct value; the oracle predicts both states from the
    // merge arithmetic minus the purge set ----
    "snapshot_purge_replay" -> ((s, dir) => {
      val VS = graft.streaming.VersionedSnapshot
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-purge")
      val v0 = VS.mergeInto(base, docs.filter(col("doc_id") % 10 =!= 0),
        Seq("doc_id"), VS.UpdateMatched, insertUnmatched = true, marker = "seed")
      VS.mergeInto(base,
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000),
        Seq("doc_id"), VS.UpdateMatched, insertUnmatched = true,
        marker = "upsert")
      // the subject list: bounded by construction (point purge contract)
      val purgeIds = docs.filter(col("doc_id") % 997 === 3)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      VS.purgeKeys(s, base, Seq("doc_id"), purgeIds.map(Seq[Any](_)))
      VS.readVersion(s, base, v0).get
        .select(lit("v0").as("at"), col("doc_id"), col("n_chars"))
        .unionByName(VS.read(s, base).get
          .select(lit("cur").as("at"), col("doc_id"), col("n_chars")))
    }),

    // ---- change-data-feed read: the row-level diff of two retained
    // versions (seed → upsert → delete window), derived from version
    // immutability by one full-outer join — insert/update rows carry new
    // values, delete rows the last values the key had; the oracle
    // predicts every op from the merge arithmetic ----
    "snapshot_changes" -> ((s, dir) => {
      val (base, v0, v2) = cdfWindowFor(s, dir) // session pin, see scaladoc
      graft.streaming.VersionedSnapshot.changes(s, base, v0, v2, Seq("doc_id")).get
        .select("op", "doc_id", "n_chars", "lang")
    }),
    // ---- PREDICATED change-data-feed read (r9): the same seed → upsert →
    // delete window, read through changes(..., ranges) — the value-column
    // zonemap prunes which files diff, then both versions are point-read
    // for the surviving candidate keys so op labels stay exact. Range
    // [250, 1250] on n_chars straddles the +1000 update shift: it admits
    // updates by EITHER side (old in range for most, new in range for
    // short docs), deletes by their old row only, inserts by their new
    // row only — every op class is filtered non-trivially. Oracle:
    // the closed-form diff with the old-or-new range filter applied ----
    "snapshot_changes_where" -> ((s, dir) => {
      val (base, v0, v2) = cdfWindowFor(s, dir) // session pin, see scaladoc
      graft.streaming.VersionedSnapshot.changes(s, base, v0, v2, Seq("doc_id"),
          Map("n_chars" -> (Some(250L), Some(1250L)))).get
        .select("op", "doc_id", "n_chars", "lang")
    }),
    // ---- value-range-pruned table read (r9): readWhere over the pinned
    // window's FINAL state — the data-skipping read itself under the
    // oracle gate (the _ZONES value stats decide which files bind; the
    // exact predicate re-applies and pushes into the surviving scans).
    // Oracle: the closed-form final state filtered to the range ----
    "snapshot_read_where" -> ((s, dir) => {
      val (base, _, _) = cdfWindowFor(s, dir) // session pin, see scaladoc
      graft.streaming.VersionedSnapshot.readWhere(s, base,
          Map("n_chars" -> (Some(250L), Some(1250L)))).get
        .select("doc_id", "n_chars", "lang")
    }),
    // ---- incremental view maintenance FROM the change feed (r9): the
    // pre/post-image CDF (changesPrePost — the Delta CDF row contract) is
    // exactly what retraction aggregation consumes, so a per-lang mart
    // maintained as mart(v0) ⊎ retractPartials(feed) must equal the
    // recompute over the final state WITHOUT ever reading v2's table —
    // O(|mart| + |delta|) maintenance. The update rows of this window
    // shift n_chars by +1000, so a post-image-only feed would corrupt
    // sum_chars by exactly 1000·|updates|; the oracle recomputes from the
    // closed-form final state, so the hash match proves the retraction
    // arithmetic, not just the plumbing ----
    "ivm_cdf_mart" -> ((s, dir) => {
      val (base, v0, v2) = cdfWindowFor(s, dir) // session pin, see scaladoc
      val mart0 = graft.operators.Incremental.partials(
          graft.streaming.VersionedSnapshot.readVersion(s, base, v0).get,
          Seq("lang"), col("n_chars"))
        .select("lang", "n", "sum_v")
      val feed = graft.streaming.VersionedSnapshot
        .changesPrePost(s, base, v0, v2, Seq("doc_id")).get
      val delta = graft.operators.Incremental.retractPartials(
        feed, Seq("lang"), col("n_chars"),
        when(col("op").isin("insert", "update_postimage"), 1).otherwise(-1))
      graft.operators.Incremental.retractMerge(Seq(mart0, delta), Seq("lang"))
        .select(col("lang"), col("n").as("n_docs"), col("sum_v").as("sum_chars"))
    }),

    // ---- MERGE with WHEN NOT MATCHED BY SOURCE … THEN DELETE (the
    // SQL:2023 / Delta full-sync clause): seed two-thirds of the corpus,
    // merge a modified id%3==0 feed (updates + inserts), and drop
    // unmatched target rows whose n_chars < 500 — "remove what the feed
    // no longer carries, if small". Closed-form oracle: id%3==0 rows
    // show the feed's +1000 chars; unmatched survivors need
    // n_chars ≥ 500. The clause is O(table) by definition (every bucket
    // rewrites once) — documented in mergeInto ----
    "snapshot_merge_full_sync" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-fullsync")
      graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 10 =!= 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "seed")
      graft.streaming.VersionedSnapshot.mergeInto(
        base,
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("n_chars", col("n_chars") + 1000),
        Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "full-sync",
        deleteUnmatchedBySource = Some(col("n_chars") < 500))
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("doc_id", "n_chars", "lang")
    }),

    // ---- MERGE with WHEN NOT MATCHED BY SOURCE … THEN UPDATE SET
    // (Delta's mark-stale shape): seed everything, merge a +2000-chars
    // id%4==0 feed, and mark unmatched sub-500-char rows' lang 'stale'
    // instead of deleting them. Every UPDATE SET right-hand side
    // evaluates against the OLD row (SQL semantics — spec-asserted with
    // a swap) ----
    "snapshot_merge_mark_stale" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-markstale")
      graft.streaming.VersionedSnapshot.mergeInto(
        base, docs, Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "seed")
      graft.streaming.VersionedSnapshot.mergeInto(
        base,
        docs.filter(col("doc_id") % 4 === 0)
          .withColumn("n_chars", col("n_chars") + 2000),
        Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "mark-stale",
        updateUnmatchedBySource =
          Some((col("n_chars") < 500, Seq("lang" -> lit("stale")))))
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("doc_id", "n_chars", "lang")
    }),

    "snapshot_merge_delete" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-merge")
      graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 10 =!= 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "seed")
      graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 5 === 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.DeleteMatched,
        insertUnmatched = false, marker = "delete")
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("doc_id", "n_chars", "lang")
    }),

    // ---- streaming CDC-upsert replay: three deterministic micro-batches
    // applied through the MERGE sink's per-batch cycle (last row per key
    // within a batch by event_id, later batches overwrite earlier ones);
    // the oracle ranks each user's events by (batch DESC, event_id DESC)
    // — any deviation in merge or replay ordering breaks the hash ----
    "cdc_merge_replay" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir) // session pin, see its scaladoc
      val base = tempSnapshotBase("graft-cdcm")
      for (b <- 0L until 3L) {
        val batch = batches(b.toInt)
        graft.streaming.VersionedSnapshot.mergeIntoBatch(
          batch, Seq("user_id"), "event_id", base, "cdc-merge", b, numBuckets = 8)
        // same-lineage replay of batch 1 must be a no-op
        if (b == 1L) graft.streaming.VersionedSnapshot.mergeIntoBatch(
          batch, Seq("user_id"), "event_id", base, "cdc-merge", b, numBuckets = 8)
      }
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("user_id", "event_type", "v_cents")
    }),

    // ---- merge-on-read replay: the SAME 3-batch CDC cycle as
    // cdc_merge_replay, but each batch lands as a blind O(|batch|)
    // overlay (stageDelta — no bucket rewrite) and the final read
    // RECONCILES base + overlays, with a mid-cycle delete overlay and an
    // end-of-cycle compact proving fold-equivalence; same closed-form
    // oracle shape — any deviation in overlay ordering, delete masking,
    // replay skip or compaction breaks the hash ----
    "mor_delta_replay" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir) // session pin, see its scaladoc
      val base = tempSnapshotBase("graft-mor")
      for (b <- 0L until 3L) {
        val batch = batches(b.toInt)
        graft.streaming.VersionedSnapshot.stageDeltaBatch(
          batch, Seq("user_id"), "event_id", base, "mor-delta", b, numBuckets = 8)
        // same-lineage replay of batch 1 must be a no-op
        if (b == 1L) graft.streaming.VersionedSnapshot.stageDeltaBatch(
          batch, Seq("user_id"), "event_id", base, "mor-delta", b, numBuckets = 8)
      }
      // delete overlay: drop every user whose id is divisible by 7
      // (union of the pinned batches IS the full ev relation)
      graft.streaming.VersionedSnapshot.stageDelta(base,
        batches.reduce(_ unionByName _)
          .filter(col("user_id") % 7 === 0).select("user_id").distinct(),
        Seq("user_id"), graft.streaming.VersionedSnapshot.DeleteMatched,
        marker = "mor-deletes", numBuckets = 8)
      // compaction must preserve the reconciled state bit-for-bit
      graft.streaming.VersionedSnapshot.compact(s, base, Seq("user_id"),
        marker = "mor-compact")
      graft.streaming.VersionedSnapshot.read(s, base).get
        .select("user_id", "event_type", "v_cents")
    }),

    // ---- streaming dedup, batch-replay form: the state-store discipline
    // of dedupStream (keep the FIRST row per key, drop every later
    // arrival) replayed over 3 deterministic micro-batches — each batch
    // dedups internally (min event_id), then anti-joins the accumulated
    // kept-set exactly as dropDuplicatesWithinWatermark's state store
    // does. Oracle: argmin over the (batch, event_id) arrival order ----
    "dedup_stream_replay" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir) // session pin, see its scaladoc
        .map(_.groupBy("user_id", "event_type")
          .agg(min("event_id").as("event_id")))
      batches.reduceLeft { (seen, batch) =>
        seen.unionByName(
          batch.join(seen.select("user_id", "event_type"),
            Seq("user_id", "event_type"), "left_anti"))
      }
    }),

    // ---- batch mirror of [[graft.streaming.RunningProfile]] (the
    // transformWithState running-profile operator) over the pinned
    // 3-batch replay split: for each batch b, every user TOUCHED in b
    // emits their profile folded over batches 0..b — exactly the
    // Update-mode emission sequence the stateful processor produces
    // (profiles are order-independent folds, so the closed form is
    // exact). 3 cumulative aggregations, all map-side combinable; the
    // per-user mode rides GroupTop's (count DESC, value ASC) tie order,
    // the same order the processor applies to its MapState scan ----
    "tws_profile_replay" -> ((s, dir) => {
      val batches = replayBatchesFor(s, dir).map(
        _.filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .withColumn("cents", coalesce(col("v_cents"), lit(0L))))
      (0 until 3).map { b =>
        val upTo = batches.take(b + 1).reduce(_.unionByName(_))
        val touched = batches(b).select("user_id").distinct()
        val agg = upTo.groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          sum("cents").as("sum_cents"),
          countDistinct("event_type").as("n_types"))
        agg
          .join(graft.operators.GroupTop.mode(
            upTo, Seq("user_id"), "event_type", "top_type"), Seq("user_id"))
          .join(touched, Seq("user_id"), "left_semi")
          .withColumn("batch_id", lit(b))
      }.reduce(_.unionByName(_))
        .select("batch_id", "user_id", "n_events", "sum_cents",
          "n_types", "top_type")
    }),

    // ---- corpus-mixture rebalancing: thin dominant groups to an equal
    // share (deterministic portable-hash acceptance). Grouped on `lang` —
    // the synthetic corpus's skewed dimension (en ≈ 2.5× the others;
    // `source` is uniform and would thin nothing) ----
    "source_mix" -> ((s, dir) =>
      graft.operators.Sampling.balancedSample(
          Tables.documents(s, dir).select("doc_id", "source", "lang"),
          "lang", "doc_id")
        .select("doc_id", "source", "lang")),

    // ---- explicit-share mixture: en capped at 20% of the corpus, rest
    // keep everything ----
    "lang_mix_weighted" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "lang", "doc_id", Map("en" -> 0.2))
        .select("doc_id", "lang")),

    // ---- set operations: INTERSECT / EXCEPT (distinct semantics) over
    // the event-user and order-customer id sets ----
    "user_set_ops" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id")).distinct()
      val o = Tables.orders(s, dir).select(col("o_custkey").as("user_id")).distinct()
      e.intersect(o).agg(count(lit(1)).as("n_intersect"))
        .crossJoin(e.except(o).agg(count(lit(1)).as("n_except")))
    }),

    // ---- power-of-two token-length bucketing: the batch-shaping
    // histogram (pad-to-bucket batching wastes ≤2× on the worst doc).
    // bucket_id = floor(log2(n))+1 computed as length(bin(n)) — exact
    // integer bit-length in BOTH engines, no float log2 boundary risk ----
    "length_buckets" -> ((s, dir) =>
      graft.operators.Partitions.widen(
          Tables.documents(s, dir).select("doc_id", "text"), col("doc_id"))
        .select(length(bin(Text.tokenCount(col("text")).cast("long")))
          .as("bucket_id"))
        .groupBy("bucket_id")
        .agg(count(lit(1)).as("n_docs"))),

    // ---- concat-and-chunk packing plan: global token offsets and the
    // fixed-length training sequences each document spans ----
    "pack_chunks" -> ((s, dir) =>
      graft.operators.Packing.chunkPlan(
        Tables.documents(s, dir).select("doc_id", "source", "text"),
        "doc_id", "source", Text.tokenCount(col("text")), seqLen = 2048L)),

    // ---- as-of (point-in-time) join: each event sees the customer's
    // latest order at event time ----
    "asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val latest = graft.operators.AsOf.latestPerKeyTs(
        Tables.orders(s, dir), "o_custkey", "o_orderdate",
        tieBreak = "o_orderkey", vals = Seq("o_orderkey", "o_totalprice"))
      graft.operators.AsOf.join(ev, latest, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"))
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    }),

    // ---- point-in-time feature assembly (the feature-store/training-set
    // shape): one row per label event (order) where every feature is
    // computed strictly from data visible AT that moment — the
    // no-future-leakage contract of training data. Two feature families
    // composed in one plan: running prior-order aggregates over a
    // 1-row-preceding frame (the label's own row can never leak into its
    // features) and an as-of join against the customer's latest event
    // value before the order date. Both stages partition by the customer
    // key; nothing scans the future. ----
    "pit_features" -> ((s, dir) => {
      val wPrev = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val labels = Tables.orders(s, dir)
        .withColumn("n_prior_orders", count(lit(1)).over(wPrev))
        .withColumn("prior_revenue_cents",
          sum(round(col("o_totalprice") * 100).cast("long")).over(wPrev))
        .select("o_orderkey", "o_custkey", "o_orderdate",
          "n_prior_orders", "prior_revenue_cents")
      val evFeat = graft.operators.AsOf.latestPerKeyTs(
        Tables.events(s, dir).select("user_id", "ts", "event_id", "value"),
        "user_id", "ts", tieBreak = "event_id", vals = Seq("value"))
      graft.operators.AsOf.join(labels, evFeat,
          "o_custkey", "user_id", "o_orderdate", "ts", Seq("value"))
        .select(col("o_orderkey"), col("n_prior_orders"),
          col("prior_revenue_cents"), col("value").as("last_event_value"))
    }),

    // ---- duplicate FAMILIES: connected components over near-dup pairs
    // (pairwise evidence A~B, B~C clustered into {A,B,C}); the clustering
    // subtree is session-pinned (dedupClustersFor) and shared with
    // dup_cluster_sizes / dedup_near_keepers ----
    "dedup_clusters" -> ((s, dir) => dedupClustersFor(s, dir)),

    // ---- near-dup dedup END-TO-END: drop every non-keeper family member
    // (keeper = min doc_id per connected component) ----
    "dedup_near_keepers" -> ((s, dir) => {
      val clusters = dedupClustersFor(s, dir)
      val losers = clusters.filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
      Tables.documents(s, dir).join(losers, Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // ---- C4-style global boilerplate removal (10-word chunks repeated
    // across >2 docs are dropped, survivors reassembled in order) ----
    "doc_deboilerplate" -> ((s, dir) =>
      Dedup.removeBoilerplate(Tables.documents(s, dir), "doc_id", "text",
        window = 10, maxDocFreq = 2)),

    // ---- text normalization: lowercase, strip non-alnum, collapse
    // whitespace — the canonical-form step before exact dedup ----
    "doc_normalize" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))),

    // ---- distribution windows: quartile bucket + percent rank ----
    "orders_ntile" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)).as("quartile"),
        floor(percent_rank().over(Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)) * 1e6 + 0.5)
          .cast("long").as("pct_rank_e6"))),

    // ---- equi-width histogram over order values ----
    "orders_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(least(lit(19L), greatest(lit(0L),
          floor(col("o_totalprice") / 30000.0))).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))),

    // ---- one-pass column profile (nulls/distinct/min/max, long format) ----
    "profile_orders" -> ((s, dir) =>
      graft.quality.Profiler.profile(Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))),

    // ---- Z-order (Morton) clustering keys via the codegen expression ----
    "zorder_keys" -> ((s, dir) =>
      Tables.orders(s, dir).select(col("o_orderkey"),
        graft.io.Layout.zorder(
          graft.io.Layout.bucketize(col("o_totalprice"), 0.0, 600000.0, bits = 10),
          graft.io.Layout.bucketize(col("o_custkey"), 0.0, 20000.0, bits = 10))
          .as("zkey"))),

    // ---- schema-evolution union: old shards lack columns newer ones
    // carry; unionByName(allowMissingColumns) null-fills — the shard-drift
    // case a positional union silently corrupts ----
    "schema_evolution_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "event_type")
        .unionByName(
          ev.filter(col("event_id") % 2 === 1)
            .select("event_id", "user_id", "event_type", "value"),
          allowMissingColumns = true)
    }),

    // ---- CDC merge: apply an orders-derived changelog to the customer
    // snapshot (latest change per key wins; final-status rows delete) ----
    "cdc_apply" -> ((s, dir) => {
      val base = Tables.customer(s, dir).select("c_custkey", "c_name", "c_acctbal")
      val changes = Tables.orders(s, dir).select(
        col("o_custkey").as("c_custkey"),
        concat(lit("cust-"), col("o_custkey")).as("c_name"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderkey").as("version"),
        when(col("o_orderstatus") === "F", lit("d")).otherwise(lit("u")).as("op"))
      graft.operators.Cdc.applyChanges(base, changes, Seq("c_custkey"), "version", "op")
    }),

    // ---- SCD2 history build from the same changelog: interval rows in
    // version order, deletes close intervals without emitting rows ----
    "scd2_history" -> ((s, dir) => {
      val changes = Tables.orders(s, dir).select(
        col("o_custkey").as("c_custkey"),
        concat(lit("cust-"), col("o_custkey")).as("c_name"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderkey").as("version"),
        when(col("o_orderstatus") === "F", lit("d")).otherwise(lit("u")).as("op"))
      graft.operators.Cdc.scd2History(changes, Seq("c_custkey"), "version", "op")
    }),

    // ---- three-table join + aggregate (TPC-H Q3 shape, adapted to the
    // generated schema): no broadcast hints — customer is NOT small at
    // real scale; AQE picks the strategy per actual sizes ----
    "q3_shipping" -> ((s, dir) => {
      val cutoff = lit("1995-03-15").cast("date")
      Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff)
        .join(Tables.orders(s, dir).filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        // price/discount are DOUBLES holding exact 2-decimal values, so
        // ep*(1-disc) is an exact 4-decimal number — which makes any
        // round(...,2) land on a half-cent tie every ~10th group (observed
        // hash-mismatch at sf0.1). Recover the integers (×100 is exact in
        // doubles at this magnitude) and sum in PURE INTEGER units of
        // 1e-4 dollars: no summation-order ulps, no tie rounding, ever.
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_e4"))
    }),

    // ---- six-table join + aggregate (TPC-H Q5 shape): the widest join
    // tree in the suite, here specifically to exercise join ORDERING. The
    // plan is declared dims-last and unhinted except for the two
    // guaranteed-tiny dims (nation/region: 25/5 rows at ANY scale —
    // broadcasting those is correct at 100 TB, not just in tests); for
    // customer/supplier AQE picks broadcast-vs-shuffle from actual
    // post-filter sizes at runtime. The c_nationkey = s_nationkey residual
    // (customer and supplier co-national) rides on the supplier join ----
    // ---- referential-integrity audit: orphan counts per FK edge of the
    // star schema in one summary relation — each edge is a broadcast
    // (dimension-side) left join + conditional count, map-side
    // combinable; the fact side streams once per edge. The check the
    // reference's validation family runs before every load ----
    "fk_orphans_report" -> ((s, dir) => {
      def edge(name: String, fact: DataFrame, fk: Column,
          dim: DataFrame, pk: Column): DataFrame =
        fact.join(broadcast(dim.select(pk.as("__pk")).distinct()),
            fk === col("__pk"), "left")
          .agg(lit(name).as("fk_edge"),
            count(lit(1)).as("n_rows"),
            count(when(col("__pk").isNull && fk.isNotNull, 1)).as("n_orphans"),
            count(when(fk.isNull, 1)).as("n_null_fk"))
      edge("orders.custkey->customer", Tables.orders(s, dir),
          col("o_custkey"), Tables.customer(s, dir), col("c_custkey"))
        .unionByName(edge("lineitem.orderkey->orders", Tables.lineitem(s, dir),
          col("l_orderkey"), Tables.orders(s, dir), col("o_orderkey")))
        .unionByName(edge("lineitem.partkey->part", Tables.lineitem(s, dir),
          col("l_partkey"), Tables.part(s, dir), col("p_partkey")))
        .unionByName(edge("customer.nationkey->nation", Tables.customer(s, dir),
          col("c_nationkey"), Tables.nation(s, dir), col("n_nationkey")))
    }),

    // ---- primary-key uniqueness audit across the dimension/fact keys:
    // one map-side-combinable groupBy per table reduced to a 1-row
    // summary (tables with dup keys and how many keys collide) ----
    "pk_uniqueness_audit" -> ((s, dir) => {
      def audit(name: String, df: DataFrame, key: Column): DataFrame =
        df.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
          .agg(lit(name).as("table_name"),
            count(lit(1)).as("n_keys"),
            count(when(col("__n") > 1, 1)).as("n_dup_keys"),
            coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
              .as("n_rows_in_dups"))
      audit("orders", Tables.orders(s, dir), col("o_orderkey"))
        .unionByName(audit("customer", Tables.customer(s, dir), col("c_custkey")))
        .unionByName(audit("part", Tables.part(s, dir), col("p_partkey")))
        .unionByName(audit("supplier", Tables.supplier(s, dir), col("s_suppkey")))
        .unionByName(audit("events", Tables.events(s, dir), col("event_id")))
        .unionByName(audit("documents", Tables.documents(s, dir), col("doc_id")))
    }),

    // ---- TPC-H Q17 shape: revenue from line items whose quantity sits
    // below 20% of their part's average — the correlated scalar subquery
    // as one map-side-combinable per-part aggregate re-joined to the
    // facts; the comparison q < avg/5 stays exact-integer as
    // 5·q·cnt < Σq (quantities are integral; no double-sum boundary) ----
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val stats = li.groupBy("l_partkey")
        .agg(sum(col("qty")).as("qsum"), count(lit(1)).as("qcnt"))
      li.join(Tables.part(s, dir).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .join(stats, Seq("l_partkey"))
        .filter(lit(5L) * col("qty") * col("qcnt") < col("qsum"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("small_qty_cents"))
    }),

    // ---- TPC-H Q16 shape on this schema: supplier diversity per part
    // attribute through the lineitem relationship, minus a NOT-IN
    // exclusion set (negative-balance suppliers standing in for the
    // complaints predicate) — distinct-pair reduce FIRST, broadcast
    // anti-join second, so the countDistinct shuffles (part, supp)
    // pairs, never raw line items ----
    "q16_supplier_diversity" -> ((s, dir) => {
      val excl = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val ps = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"), "left_anti")
      ps.join(Tables.part(s, dir).filter(col("p_size") <= 20)
            .select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    "q5_region_revenue" -> ((s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        // integer 1e-4-dollar units — same exactness rationale as q3
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("revenue_e4"),
          count(lit(1)).as("n_items"))
    }),

    // ---- TPC-H Q4 shape (adapted: no commit/receipt dates in this
    // schema, so "late" = shipped >60 days after the order date): order
    // count per priority where at least one line shipped late. The
    // EXISTS is a LEFT SEMI join — each order is counted once no matter
    // how many late lines it has, and the orders side never fans out.
    // The correlated predicate (l_shipdate vs o_orderdate+60d) rides on
    // the join condition, evaluated before the semi-match dedup ----
    "q4_order_priority" -> ((s, dir) => {
      val lo = lit("1996-07-01").cast("timestamp")
      val hi = lit("1996-10-01").cast("timestamp")
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .join(Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // ---- TPC-H Q6 shape: the pure scan-filter-aggregate — every
    // predicate (ship year, discount band, quantity cap) pushes into the
    // parquet scan, and the whole query is one map-side partial + one
    // 1-row reduce; zero wide shuffles at any scale. The discount band
    // [0.05, 0.07] is matched on the recovered integer percent, so the
    // boundary rows are classified exactly (0.07 as a double is not
    // representable; ×100-round is) ----
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 24)
        .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
          round(col("l_discount") * 100).cast("long").as("disc_pct"))
        .filter(col("disc_pct").between(5, 7))
        .agg(sum(col("cents") * col("disc_pct")).as("revenue_e4"),
          count(lit(1)).as("n_lines"))),

    // ---- TPC-H Q7 shape: bilateral shipping volume between two nations
    // by ship year. The 2-row filtered nation dims are broadcast and
    // joined FIRST on each side's path (supplier→n1, customer→n2), so
    // the expensive fact joins only carry rows from the two nations;
    // the direction filter (3→7 or 7→3) then removes the two domestic
    // combinations. No hint on orders/customer/supplier — AQE sizes
    // them post-filter ----
    "q7_volume_shipping" -> ((s, dir) => {
      val pair = Seq("NATION_3", "NATION_7")
      val n1 = broadcast(Tables.nation(s, dir)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(Tables.nation(s, dir)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      Tables.supplier(s, dir).join(n1, col("s_nationkey") === col("s_nk"))
        .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).join(n2, col("c_nationkey") === col("c_nk")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_e4"))
    }),

    // ---- TPC-H Q8 shape (national market share): NATION_3 suppliers'
    // share of all revenue sold into ASIA-region customers, per order
    // year. The market restriction is a LEFT SEMI against the
    // region-filtered customer keys (reduces the fact stream before the
    // supplier join); the share is a conditional-sum / total-sum pair in
    // ONE aggregate — never two scans — then an exact decimal-staged
    // integer division (the [[nation_share_trend]] discipline) ----
    "q8_market_share" -> ((s, dir) => {
      val custAsia = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val suppNation = broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val e4 = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(coalesce(sum(when(col("supp_nation") === "NATION_3", e4)), lit(0L))
            .as("nation_e4"),
          sum(e4).as("total_e4"))
        .withColumn("mkt_share_e6", expr(
          """CAST(nation_e4 AS DECIMAL(38,0)) * 1000000
             div nullif(CAST(total_e4 AS DECIMAL(38,0)), 0)"""))
    }),

    // ---- TPC-H Q10 shape (returned-item reporting): top 20 customers
    // by returned revenue in a quarter. Revenue is aggregated per
    // custkey BEFORE the customer/nation joins (the reduce-first rule:
    // the join input is |customers-with-returns|, not |line items|), and
    // the top-20 is orderBy+limit — Spark plans TakeOrderedAndProject
    // (per-partition heaps + driver merge of 20-row tops), never a
    // global sort. Integer revenue + custkey tiebreak make the selected
    // SET deterministic, so the oracle's LIMIT agrees ----
    "q10_returned_items" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_e4"))
      rev.join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue_e4"),
          round(col("c_acctbal") * 100).cast("long").as("acctbal_cents"),
          col("n_name"))
        .orderBy(col("revenue_e4").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- TPC-H Q12 shape (adapted: return flag stands in for ship
    // mode): per flag, how many LATE lines (>90 days after order) came
    // from high- vs low-priority orders. One fact join, one conditional
    // two-counter aggregate — the canonical "pivot by CASE" reduce ----
    "q12_late_by_priority" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(count(when(high, 1)).as("high_line_count"),
          count(when(!high, 1)).as("low_line_count"))
    }),

    // ---- TPC-H Q13 shape (customer order-count distribution): LEFT
    // OUTER join so zero-order customers survive with c_count = 0
    // (count(o_orderkey) skips the null from the unmatched side), then
    // a second, tiny aggregate over the distinct counts. The excluded
    // priority class rides the orders scan as a pushed filter ----
    "q13_custdist" -> ((s, dir) =>
      Tables.customer(s, dir).select("c_custkey")
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))),

    // ---- TPC-H Q14 shape (promo revenue share): PROMO-typed parts'
    // share of one month's revenue. Conditional + total sums in ONE
    // aggregate over the part join; exact decimal-staged share ----
    "q14_promo_share" -> ((s, dir) => {
      val e4 = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(coalesce(sum(when(col("p_type") === "PROMO", e4)), lit(0L))
            .as("promo_e4"),
          sum(e4).as("total_e4"))
        .withColumn("promo_share_e6", expr(
          """CAST(promo_e4 AS DECIMAL(38,0)) * 1000000
             div nullif(CAST(total_e4 AS DECIMAL(38,0)), 0)"""))
    }),

    // ---- TPC-H Q15 shape (top supplier by quarterly revenue): the
    // revenue view aggregates per suppkey first; the max is a 1-row
    // broadcast joined back on EQUALITY of exact-integer revenue — ties
    // all surface (the spec's "every supplier at the max"), nothing is
    // dropped by an arbitrary limit ----
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("total_revenue_e4"))
      rev.join(broadcast(rev.agg(max(col("total_revenue_e4")).as("mx"))),
          col("total_revenue_e4") === col("mx"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
    }),

    // ---- TPC-H Q18 shape (large-volume orders): the HAVING subquery is
    // a per-orderkey quantity sum filtered BEFORE any dimension join —
    // at 100 TB the join input is only the handful of jumbo orders.
    // Quantities are integral doubles; cast to long for an exact sum ----
    "q18_large_volume" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 160)
      big.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          round(col("o_totalprice") * 100).cast("long").as("totalprice_cents"),
          col("sum_qty"))
    }),

    // ---- TPC-H Q19 shape (disjunctive predicate revenue): three
    // (brand × size-band × quantity-band) alternatives OR'd together.
    // The per-table halves of the disjunction (brand∈{...}, size≤15 /
    // quantity≤30) are ALSO stated as conjunctive prefilters so each
    // side prunes at its scan; the residual OR evaluates post-join ----
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val qty = col("l_quantity").cast("long")
      val alt = (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          qty.between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          qty.between(10, 20)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          qty.between(20, 30))
      Tables.lineitem(s, dir).filter(qty.between(1, 30))
        .join(Tables.part(s, dir)
            .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#4") &&
              col("p_size").between(1, 15)),
          col("l_partkey") === col("p_partkey"))
        .filter(alt)
        .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("revenue_e4"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q22 shape (adapted: market segment stands in for the
    // phone country code): rich-but-idle customers — balance above the
    // positive-balance average, no orders at all. The average is a
    // 1-row broadcast compared as the cross-multiplied exact rational
    // (bal·n > Σbal — no division, no float), the "no orders" test a
    // LEFT ANTI against the orders keys ----
    "q22_idle_customers" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).select(col("c_custkey"),
        col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
      val stats = cust.filter(col("bal_cents") > 0)
        .agg(sum(col("bal_cents")).as("pos_sum"), count(lit(1)).as("pos_n"))
      cust.crossJoin(broadcast(stats)) // 1-row aggregate, per repo convention
        .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
        .join(Tables.orders(s, dir).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("totacctbal_cents"))
    }),

    // ---- TPC-H Q2 shape (correlated scalar subquery over a 4-way dim
    // join): for LARGE small-size parts, the EUROPE supplier(s) offering
    // the minimum supply cost. PARTSUPP is the synthetic derived relation
    // (Tables.partsupp — generated-oracle discipline, see its scaladoc).
    // Decorrelated the way Catalyst itself would: min-cost per part over
    // the region-filtered candidates (one map-side-combinable agg), then
    // an equi-join back on (part, cost). The filtered part dim broadcasts
    // (a fraction of an already-small dim at any SF); nation/region are
    // constant-size broadcasts; the only data-scale shuffle is the
    // partsupp distinct + the partkey agg ----
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eurSup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("acctbal_cents"))
      val parts = Tables.part(s, dir)
        .filter(col("p_size") <= 5 && col("p_type") === "LARGE")
        .select("p_partkey", "p_brand")
      val cand = Tables.partsupp(s, dir)
        .join(eurSup, col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
      // correlated min decorrelated to a PER-PART window aggregate: one
      // pass over the candidate relation (an agg + join-back would plan
      // the candidate subtree twice — measured, no exchange reuse), and
      // the window partition is bounded by suppliers-per-part at any SF
      val wPart = Window.partitionBy("p_partkey")
      cand
        .withColumn("min_cost_cents",
          min("ps_supplycost_cents").over(wPart))
        .filter(col("ps_supplycost_cents") === col("min_cost_cents"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
          col("acctbal_cents"), col("ps_supplycost_cents").as("supplycost_cents"))
    }),

    // ---- TPC-H Q9 shape (profit through a 6-table join): revenue minus
    // supply cost per supplier nation and order year, for parts whose
    // name mentions a component. Exact 1e-4-dollar integer units end to
    // end: extprice_cents*(100-disc_e2) and cost_cents*qty*100 live in
    // the same unit, so the difference sums exactly in both engines. The
    // name-filtered part keys broadcast; partsupp joins on its composite
    // key (the one fact-sized shuffle besides the orders join) ----
    "q9_nation_profit" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
        .filter(col("p_name").like("%bolt%")).select("p_partkey")
      Tables.lineitem(s, dir)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(Tables.partsupp(s, dir),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(sum(
            round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")) -
            col("ps_supplycost_cents") *
              round(col("l_quantity")).cast("long") * lit(100L))
          .as("profit_e4"))
    }),

    // ---- TPC-H Q11 shape (HAVING-share over a grand total): stock value
    // per part held by one nation's suppliers, keeping parts above TWICE
    // the mean per-part value. TPC-H's fixed 0.01%/SF share has to be
    // re-tuned per scale factor; the 2×-mean form is the same
    // global-share HAVING shape but scale-free, so one query bites at
    // every SF. The total and group count are ONE 1-row global aggregate
    // broadcast back over the per-part rows (the repo's scalar crossJoin
    // convention); the compare is integer-exact via truncating division
    // (both engines truncate toward zero), so no double enters the
    // predicate and nothing can overflow (mean ≈ value magnitude) ----
    "q11_important_stock" -> ((s, dir) => {
      val byPart = Tables.partsupp(s, dir)
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")).as("value_cents"))
      val total = byPart.agg(sum("value_cents").as("total_cents"),
        count(lit(1)).as("n_parts"))
      byPart.crossJoin(broadcast(total)) // 1-row aggregate, per repo convention
        .filter(col("value_cents") > expr("total_cents div n_parts") * 2)
        .select("ps_partkey", "value_cents")
    }),

    // ---- TPC-H Q20 shape (nested semi-join chain): suppliers holding
    // comfortable stock (availqty > 100x one year's shipped quantity) of
    // one part family. The correlated inner aggregate is the
    // per-(part,supplier) shipped-quantity rollup; the chain is
    // expressed as the equi-joins it decorrelates to, with the supplier
    // table reduced by a LEFT SEMI join (no row multiplication, Spark's
    // native EXISTS form). The family pattern + multiplier were tuned so
    // the existential actually bites at every SF (kept 1/10, 64/100,
    // 688/1000 suppliers — an EXISTS over a common per-pair predicate
    // saturates to all-pass, which would make the shape vacuous). Part
    // keys broadcast; quantities stay integer (l_quantity is
    // integer-valued by generator contract) ----
    "q20_stocked_suppliers" -> ((s, dir) => {
      val qty = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty_sum"))
      val famParts = Tables.part(s, dir)
        .filter(col("p_name").like("small gi%")).select("p_partkey")
      val stocked = Tables.partsupp(s, dir)
        .join(broadcast(famParts), col("ps_partkey") === col("p_partkey"))
        .join(qty, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > col("qty_sum") * 100)
      Tables.supplier(s, dir)
        .join(stocked, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    }),

    // ---- event-time RANGE frame: per-customer rolling 30-day revenue.
    // RANGE (value-based) frames are the one window-frame family nothing
    // else exercises: the frame is [ts-30d, ts], includes ALL timestamp
    // peers (deterministic under ties, unlike a ROWS frame), and Spark
    // evaluates it streaming per partition — no per-row rescan. Cents
    // units: order-independent integer sums ----
    "orders_rolling_30d" -> ((s, dir) => {
      // NTZ → timestamp (session tz is UTC, same wall-clock DuckDB's
      // epoch() assumes) → long seconds; NTZ has no direct long cast
      val secs = col("o_orderdate").cast("timestamp").cast("long")
      val w = Window.partitionBy("o_custkey")
        .orderBy(secs)                 // seconds since epoch
        .rangeBetween(-2592000L, 0L)   // 30 days, inclusive
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(w).as("roll_cents"),
        count(lit(1)).over(w).as("roll_n"))
    }),

    // ---- sliding event-time windows (2h duration, 1h slide): each event
    // lands in exactly duration/slide = 2 overlapping windows — Spark
    // expands the window assignment inline (no self-union, no second
    // scan) and aggregates once. The batch form of the streaming sliding
    // KPI; tumbling is hourly_windowed ----
    "events_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("unique_users"))
        .select(col("window.start").as("w_start"),
          col("n_events"), col("unique_users"))),

    // ---- time-grid resample + forward fill (pandas resample().ffill()
    // parity): dense per-user hourly series from sparse events — zero-fill
    // the event counter on gap hours, carry the last observed cents sum
    // forward. Spine join is one (user, hour) hash shuffle; the fill is a
    // streaming running frame on the same partitioning ----
    "events_resampled" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
      graft.operators.Resample.gapFill(
          hourly, key = "user_id", bucketCol = "hour",
          step = expr("interval 1 hour"),
          zeroFill = Map("n_events" -> lit(0L)),
          ffill = Seq("cents"))
        .select(col("user_id"), col("hour"), col("n_events"),
          col("cents").as("filled_cents"))
    }),

    // ---- rolling z-score anomaly flags: k-sigma test vs the trailing
    // 10-day baseline as a PURE-INTEGER inequality (no stddev/division/
    // floats anywhere); baseline excludes the current day ----
    "events_anomaly" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.Anomaly.rollingZScoreFlags(
        daily, keys = Seq("event_type"), dateCol = "d",
        valueCol = "n_events", window = 10, k = 3, minN = 5)
    }),

    // ---- EWMA trend smoothing (decay ½, 10-day horizon) over daily
    // per-type counts: dyadic integer weights, zero transcendentals ----
    "events_ewma" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"))
      graft.operators.Resample.ewmaHalving(
        daily, keys = Seq("event_type"), dateCol = "d",
        valueCol = "n_events", window = 10)
    }),

    // ---- linear interpolation over the resampled grid (pandas
    // interpolate(method='time') in floor-integer form): gap hours get
    // v0 + (v1-v0)*(t-t0) floor-div (t1-t0) — pure int64 end to end, so
    // the oracle is hash-exact with no IEEE caveats ----
    "events_interpolated" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      graft.operators.Resample.interpolate(
          hourly, "user_id", "hour", expr("interval 1 hour"), "cents")
        .select(col("user_id"), col("hour"), col("cents").as("cents_interp"))
    }),

    // ---- per-domain quota sampling: best-N docs per language ----
    "quota_sample" -> ((s, dir) =>
      graft.operators.Sampling.quotaSample(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        groupCol = "lang", scoreCol = "n_chars", keyCol = "doc_id",
        quotas = Map("en" -> 30), defaultQuota = 15)),

    // ---- forward as-of: each event sees the customer's NEXT order ----
    "asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val latest = graft.operators.AsOf.latestPerKeyTs(
        Tables.orders(s, dir), "o_custkey", "o_orderdate",
        tieBreak = "o_orderkey", vals = Seq("o_orderkey", "o_totalprice"))
      graft.operators.AsOf.join(ev, latest, "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("o_orderkey", "o_totalprice"), direction = "forward")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    }),

    // ---- vector corpus statistics: centroids (long form) and L2 norms ----
    "embedding_centroids" -> ((s, dir) =>
      graft.operators.VectorAgg.centroids(
        Tables.embeddings(s, dir), "label", "embedding")),
    "embedding_norms" -> ((s, dir) =>
      graft.operators.VectorAgg.norms(
        Tables.embeddings(s, dir), "vec_id", "embedding")),

    // ---- embedding anomaly detection: top-20 vectors by standardized
    // (diagonal-Mahalanobis) distance Σ_j (q_j−μ_j)²/σ_j² — the
    // embedding-health outlier screen next to VectorAgg's dim stats.
    // Per-dim moments are ONE map-side-combinable pass to a dim-sized
    // broadcast; the per-vector score is a zero-shuffle scan over the
    // flattened corpus; top-20 rides TakeOrderedAndProject. Exact:
    // (q·n−s_j)²·1e6 div (n·Σq²−s_j²), decimal(38,0)-staged. ----
    "embedding_outliers" -> ((s, dir) => {
      val flat = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"),
          floor(col("x") * lit(1000.0) + lit(0.5)).cast("long").as("q"))
      val mom = flat.groupBy("pos")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"),
          sum(col("q") * col("q")).as("sq2"))
        .withColumn("v", col("n").cast("decimal(38,0)") * col("sq2")
          - col("sq").cast("decimal(38,0)") * col("sq"))
      flat.join(broadcast(mom), Seq("pos"))
        .select(col("vec_id"),
          expr("""CAST((CAST(q AS DECIMAL(38,0)) * n - sq)
                     * (CAST(q AS DECIMAL(38,0)) * n - sq) * 1000000
                  div nullif(v, 0) AS BIGINT)""").as("t"))
        .groupBy("vec_id").agg(sum("t").as("z2_sum_e6"))
        .orderBy(col("z2_sum_e6").desc, col("vec_id").asc)
        .limit(20)
    }),

    // ---- exact distributed k-means (Lloyd), KmeansRounds unrolled
    // rounds — the bt_event_scores bounded-iteration pattern applied to
    // vector clustering. Everything integer in e3 q-units (the GramPca
    // quantization): distances are exact Σ(q−m)², centroid updates are
    // truncating integer means (sum div count — identical in both
    // engines), argmin tie-breaks on the smaller centroid id via
    // lexicographic struct-min. Seeds = the K smallest vec_ids
    // (deterministic, oracle-mirrorable). Per round: one broadcast of
    // the K·dim centroid relation and two linear map-side-combinable
    // aggregations — cost is rounds·vectors·K·dim, the canonical
    // distributed-kmeans bound; no vector-vector pair anywhere. The
    // oracle unrolls the identical three rounds CTE by CTE. ----
    "kmeans_fit" -> ((s, dir) => {
      val (fin, cent) = kmeansRun(s, dir, KmeansK)
      fin.groupBy("c")
        .agg(count(lit(1)).as("n_vecs"), sum("d2").as("inertia_q2"))
        .join(cent.groupBy("c").agg(sum(abs(col("m"))).as("cent_l1")), Seq("c"))
        .select(col("c").as("cluster_id"), col("n_vecs"),
          col("inertia_q2"), col("cent_l1"))
    }),

    // ---- k-selection elbow table: total inertia of the same Lloyd fit
    // at k = 2/4/8 — the "is 8 the right k" diagnostic beside
    // kmeans_fit. Three bounded fits over the one flattened corpus
    // (cost = Σk·rounds·vectors·dim — still the Lloyd bound); output
    // is the 3-row elbow relation. Oracle instantiates the identical
    // per-k CTE chains over one shared flat relation. ----
    "kmeans_k_sweep" -> ((s, dir) =>
      KmeansSweepKs.map { k =>
        kmeansRun(s, dir, k)._1
          .agg(countDistinct(col("c")).as("n_clusters"),
            sum("d2").as("inertia_q2"))
          .select(lit(k).cast("long").as("k"),
            col("n_clusters"), col("inertia_q2"))
      }.reduce(_ unionByName _)),

    // ---- edit-distance near-dups: shingle candidates + levenshtein refine ----
    "edit_dup_pairs" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir), "doc_id", "text",
        maxDist = 10, n = 5)),

    // ---- k-anonymity audit: quasi-identifier classes smaller than k are
    // re-identifiable; one hash aggregation, no joins ----
    "k_anon_risk" -> ((s, dir) =>
      graft.quality.Privacy.kAnonymityRisk(
        Tables.customer(s, dir), Seq("c_mktsegment", "c_nationkey"), k = 5)),

    // ---- ε-DP noisy counts (Laplace mechanism, seeded portable-hash
    // noise so the release is reproducible and oracle-checkable) ----
    "dp_group_counts" -> ((s, dir) =>
      graft.quality.Privacy.dpNoisyCounts(
        Tables.events(s, dir), Seq("event_type"), eps = 1.0, seed = 17)),

    // ---- distinct l-diversity audit (Machanavajjhala '07) — k-anonymity's
    // companion: a quasi-identifier class is re-identifiable not when it
    // is small but when its SENSITIVE attribute is uniform; report the
    // distinct-sensitive-value count per class and flag l < 5. One hash
    // aggregation (exact countDistinct shuffles (class, user) pairs),
    // no joins ----
    "l_diversity_audit" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(to_date(col("ts")).as("d"), col("event_type"), col("user_id"))
        .groupBy("d", "event_type")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("l_distinct"))
        .withColumn("at_risk", (col("l_distinct") < lit(5)).cast("long"))),

    // ---- Weighted pick (A-ES sampling without replacement): 10 docs per
    // source, probability ∝ n_chars, seeded and engine-portable ----
    "weighted_pick" -> ((s, dir) =>
      graft.operators.Sampling.weightedPick(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        groupCol = "source", keyCol = "doc_id", weightCol = "n_chars",
        k = 10, seed = 7)),

    // ---- Split-drift report: per-split normalized length histograms +
    // total-variation contribution train-vs-val (selection-bias check on
    // the hash split; split totals re-enter broadcast) ----
    "split_drift" -> ((s, dir) => {
      val tagged = Tables.documents(s, dir)
        .select(
          graft.operators.Sampling.splitColumn(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"),
          expr("CAST(size(split(text, ' ')) div 10 AS BIGINT)").as("len_bucket"))
      graft.quality.Drift.splitHistogram(
        tagged, "split", "len_bucket", Seq("train", "val", "test"))
    }),

    // ---- Content-defined chunking: rolling-hash boundaries (w=4 window,
    // 1/16 cut rate → ~16-token chunks); the dedup splitter — boundaries
    // re-synchronize across insertions, unlike fixed windows ----
    "content_chunks" -> ((s, dir) =>
      graft.operators.Chunking.contentDefinedChunks(
        Tables.documents(s, dir), "doc_id", "text", w = 4, divisor = 16)),

    // ---- CDC-chunk duplication rate: fraction of a doc's content-defined
    // chunks that also appear in ANOTHER doc — the chunk-level dup signal
    // a curation stage thresholds on (boundaries resync, so shifted
    // copies still count) ----
    "doc_cdc_dup_rate" -> ((s, dir) => {
      // CDC chunking itself is a 0-exchange plan, so WITHOUT an exchange
      // the owners aggregate and the join side would each recompute the
      // whole per-token md5 pass. One explicit repartition on chunk_md5
      // gives both consumers the SAME exchange (ReuseExchange → one CDC
      // pass) and co-partitions the owners agg AND the join for free.
      val chunks = graft.operators.Chunking.contentDefinedChunks(
          Tables.documents(s, dir), "doc_id", "text", w = 4, divisor = 16)
        .repartition(col("chunk_md5"))
      val owners = chunks.groupBy(col("chunk_md5"))
        .agg(countDistinct(col("doc_id")).as("__owners"))
      chunks.join(owners, "chunk_md5")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__owners") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .withColumn("dup_frac_e6",
          floor(col("n_dup_chunks") * lit(1.0) / col("n_chunks") * lit(1e6) + lit(0.5))
            .cast("long"))
    }),

    // ---- Vocabulary coverage: per-doc OOV rate under a top-16 corpus
    // vocab (tokenizer-design statistic; vocab re-enters broadcast) ----
    "vocab_oov" -> ((s, dir) =>
      graft.operators.TermStats.vocabCoverage(
        Tables.documents(s, dir), "doc_id", "text", v = 16)),

    // ---- BM25 retrieval: inverted-index top-k (sparse leg of hybrid RAG
    // retrieval; every 1000th doc plays the query role — the synthetic
    // corpus has NO rare terms, so each query touches ~every posting and
    // query density IS the cost knob) ----
    "bm25_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Retrieval.bm25TopK(
        docs, docs.where(col("doc_id") % 1000 === 0),
        "doc_id", "text", "doc_id", "text", k = AnnK)
    }),

    // ---- Hybrid retrieval: RRF fusion of the BM25 (sparse) and
    // LSH-bucketed cosine (dense) legs over the same query set; fused
    // score is pure integer arithmetic — no calibration, no floats. The
    // dense leg is [[Similarity.lshTopKAgainst]] (the lsh_topk hyperplane
    // family): query panel bucketed against the corpus index, a (tbl,
    // bucket) equi-join — the 100 TB serving shape; ann_recall is the
    // standing recall guardrail for this tier. ----
    "hybrid_rrf_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sparse = graft.operators.Retrieval.bm25TopK(
          docs, docs.where(col("doc_id") % 1000 === 0),
          "doc_id", "text", "doc_id", "text", k = AnnK)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, dir)
      val dense = Similarity.lshTopKAgainst(
          emb.where(col("vec_id") % 1000 === 0), emb, "vec_id", "embedding",
          dim = Dim, nBits = LshBits, k = AnnK, tables = LshTables)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(Seq(sparse, dense), k = AnnK)
    }),

    // ---- Two-stage retrieval cascade (retrieve-and-rerank): the BM25 leg
    // recalls 4·k candidates cheaply, the dense leg reranks ONLY those by
    // exact cosine — the standard RAG serving shape (cheap recall, precise
    // rerank over a bounded set; contrast hybrid_rrf_topk, which FUSES two
    // full rankings instead of cascading them) ----
    "rerank_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val recall = graft.operators.Retrieval.bm25TopK(
          docs, docs.where(col("doc_id") % 1000 === 0),
          "doc_id", "text", "doc_id", "text", k = 4 * AnnK)
        .select(col("query_id"), col("doc_id"))
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"),
          graft.functions.Vectors.l2Norm(col("embedding")).as("__nrm"))
      val scored = recall
        .join(emb.select(col("vec_id").as("query_id"), col("__v").as("__qv"),
          col("__nrm").as("__qn")), Seq("query_id"))
        .join(emb.select(col("vec_id").as("doc_id"), col("__v").as("__dv"),
          col("__nrm").as("__dn")), Seq("doc_id"))
        .select(col("query_id"), col("doc_id"),
          when(col("__qn") * col("__dn") =!= 0.0,
            round(graft.functions.Vectors.dot(col("__qv"), col("__dv")) /
              (col("__qn") * col("__dn")), 6)).as("cosine_sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine_sim").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .where(col("rank") <= AnnK)
    }),

    // ---- TF-IDF top terms per document (corpus-level term weighting) ----
    "tfidf_top_terms" -> ((s, dir) =>
      graft.operators.TermStats.topTerms(
        Tables.documents(s, dir), "doc_id", "text", k = 5)),

    // ---- Gopher-style duplicate-n-gram repetition signal ----
    "doc_repetition" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("__ws"))
        .select(col("doc_id"),
          floor(Text.repetitionFromTokens(col("__ws"), 2) * 1e6 + 0.5)
            .cast("long").as("rep2_e6"),
          floor(Text.repetitionFromTokens(col("__ws"), 3) * 1e6 + 0.5)
            .cast("long").as("rep3_e6"))),

    // ---- benchmark decontamination: flag training docs sharing long
    // shingles with a (deterministic 10%) benchmark split; bench grams
    // broadcast, train corpus never shuffles for candidate discovery ----
    "decontam_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.overlapReport(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 5, minShared = 3)
    }),
    "decontam_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Decontaminate.clean(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 5, minShared = 3)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    }),

    // ---- interval (range) join: same-user event pairs within 30 min,
    // bucketed-bin equi-join scale path, never a per-key product ----
    "event_pairs_within" -> ((s, dir) =>
      graft.operators.Interval.selfPairsWithin(
        Tables.events(s, dir).select("user_id", "event_id", "ts"),
        "user_id", "ts", "event_id", deltaMicros = 1800L * 1000000L)),

    // ---- batch CEP: strict-contiguity view→view→purchase runs per user
    // with each adjacent gap ≤ 48 h (the synthetic stream's median
    // per-user inter-event gap is ~7 h — a 30-min bound matches nothing
    // at any SF) — the batch face of
    // streaming/StreamingKpis.detectPattern (same semantics the live
    // specs pin over micro-batches, here oracle-gated). One window pass
    // per user (two leads), (ts, event_id) total tie order, scale-safe
    // per-user partitions ----
    "pattern_matches" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("t1", lead(col("event_type"), 1).over(w))
        .withColumn("t2", lead(col("event_type"), 2).over(w))
        .withColumn("ts1", lead(col("ts"), 1).over(w))
        .withColumn("ts2", lead(col("ts"), 2).over(w))
        .withColumn("id2", lead(col("event_id"), 2).over(w))
        .filter(col("event_type") === "view" && col("t1") === "view" &&
          col("t2") === "purchase" &&
          unix_micros(col("ts1")) - unix_micros(col("ts")) <= 172800L * 1000000L &&
          unix_micros(col("ts2")) - unix_micros(col("ts1")) <= 172800L * 1000000L)
        .select(col("user_id"), col("event_id").as("start_event_id"),
          col("id2").as("end_event_id"))
    }),

    // ---- ANTI interval join (absence as the signal): views with no
    // same-user purchase within ±30 min, per user — the funnel
    // non-conversion face of the range join. Matched view ids discovered
    // through the bucketed 3×-replica candidate path, removed with ONE
    // left-anti equi-join (Interval.antiWithin) — a null-padded outer
    // product never exists in the plan ----
    "views_unconverted" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("__bk"), col("ts").as("__bts"))
      val un = graft.operators.Interval.antiWithin(views, buys,
        "user_id", "__bk", "ts", "__bts", 1800L * 1000000L, "event_id")
      views.groupBy("user_id").agg(count(lit(1)).as("n_views"))
        .join(un.groupBy("user_id").agg(count(lit(1)).as("n_unconverted")),
          Seq("user_id"), "left")
        .select(col("user_id"), col("n_views"),
          coalesce(col("n_unconverted"), lit(0L)).as("n_unconverted"))
    }),

    // ---- full reconciliation of the view/purchase interval join (the
    // batch mirror of intervalJoinStreamFullOuter): matched pairs + BOTH
    // sides' orphans, each leg through the bucketed 3×-replica interval
    // machinery (joinWithin / antiWithin) — never a per-user product —
    // folded to one row by bounded 1-row-aggregate crossJoins ----
    "event_recon_full" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val delta = 1800L * 1000000L
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("__bk"), col("event_id").as("__bid"),
          col("ts").as("__bts"))
      val pairs = graft.operators.Interval.joinWithin(views, buys,
        "user_id", "__bk", "ts", "__bts", delta, Seq("__bid"))
      val vOrph = graft.operators.Interval.antiWithin(views, buys,
        "user_id", "__bk", "ts", "__bts", delta, "event_id")
      val bOrph = graft.operators.Interval.antiWithin(
        buys, views.select(col("user_id").as("__vk"), col("ts").as("__vts")),
        "__bk", "__vk", "__bts", "__vts", delta, "__bid")
      pairs.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(vOrph.agg(count(lit(1)).as("n_view_orphans"))))
        .crossJoin(broadcast(bOrph.agg(count(lit(1)).as("n_purchase_orphans"))))
    }),

    // ---- exact interpolated quantiles per group ----
    "orders_quantiles" -> ((s, dir) =>
      Tables.orders(s, dir).groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.25)"), 6).as("q25"),
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("q50"),
          round(expr("percentile(o_totalprice, 0.75)"), 6).as("q75"),
          count(lit(1)).as("n"))),

    // ---- mergeable fixed-boundary histogram quantiles: the sketch-tier
    // percentile (exact integer counts, value-error ≤ width) — computed
    // here THROUGH the merge law (partials over 3 disjoint hash-slices,
    // merged, then read), while the oracle computes from the whole input
    // in one pass: the hash can only match because merged-partials ≡
    // whole-input, proving the snapshot-rollup path cross-engine ----
    "quantile_sketch_portable" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val keys = Seq("o_orderpriority")
      val partials = (0 until 3).map(d =>
        graft.operators.Sketches.histogramPartials(
          orders.filter(pmod(col("o_orderkey"), lit(3)) === d),
          keys, "o_totalprice", width = 1000L))
      graft.operators.Sketches.quantilesFromHistogram(
        graft.operators.Sketches.mergeHistograms(partials, keys),
        keys, width = 1000L,
        Seq("p50_lo" -> 500000L, "p90_lo" -> 900000L, "p99_lo" -> 990000L))
    }),

    // ---- portable Count-Min: the frequency member of the portable
    // sketch trio (HLL distinct / histogram quantiles / CMS frequency).
    // Registers are built THROUGH the merge law — three disjoint
    // hash-slices of events, merged — while the oracle computes from the
    // whole input in one pass; estimates for the top-20 true-heaviest
    // users are compared against their exact counts (est ≥ exact always;
    // overcount shows the ε·N collision term as width shrinks vs keys).
    "heavy_hitters_cms" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val partials = (0 until 3).map(d =>
        graft.operators.Sketches.cmsPartials(
          ev.filter(pmod(col("event_id"), lit(3)) === d),
          "user_id", CmsDepth, CmsWidth))
      val regs = graft.operators.Sketches.mergeCms(partials)
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id").asc).limit(20)
      graft.operators.Sketches.cmsEstimate(regs, top, "user_id", CmsDepth, CmsWidth)
        .join(top, Seq("user_id"))
        .select(col("user_id"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
    }),

    // ---- tokenizer fertility: chars-per-token by language — the
    // number that sizes a tokenizer's vocab/budget trade per language
    // before training (high fertility = the tokenizer fragments that
    // language), computed in one aggregate pass ----
    "tokenizer_fertility" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars").cast("long").as("__nc"),
          size(split(col("text"), " ")).cast("long").as("__nt"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("__nt").as("n_tokens"),
          sum("__nc").as("n_chars"))
        .withColumn("fertility_e6",
          floor(col("n_chars") * lit(1000000L) / col("n_tokens") + lit(0.5))
            .cast("long"))),

    // ---- rolling 24h distinct users from MERGED HOURLY SKETCHES: the
    // production shape of "distinct users last day, every hour" — exact
    // countDistinct would rescan 24h of raw traffic per hour; here each
    // hour stores ≤256 integer registers and the rolling answer is a
    // RANGE-window max over registers + one estimate, cost independent
    // of traffic. The spine explodes all 256 buckets per hour so an
    // hour inherits registers from hours a bucket was last seen in.
    // (At these SFs the per-window cardinality sits below the raw-HLL
    // regime (≳2.5·m), so estimates run biased-high — the row pins the
    // MERGE+PORTABILITY contract, which is cardinality-independent;
    // accuracy in-regime is pinned by approx_distinct_portable.) ----
    "rolling_distinct_24h" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(expr("unix_timestamp(ts) div 3600").as("hour"), col("user_id"))
      val regs = graft.operators.Sketches.hllRegisters(ev, Seq("hour"), "user_id", p = 8)
      val spine = ev.select("hour").distinct()
        .withColumn("__b", explode(sequence(lit(0L), lit(255L))))
      val w = Window.partitionBy("__b").orderBy(col("hour"))
        .rangeBetween(-23, Window.currentRow)
      val rolled = spine.join(regs, Seq("hour", "__b"), "left")
        .withColumn("__mr", max(col("__m")).over(w))
        .filter(col("__mr").isNotNull)
        .select(col("hour"), col("__b"), col("__mr").as("__m"))
      graft.operators.Sketches.hllEstimate(rolled, Seq("hour"), p = 8)
        .withColumnRenamed("n_est", "distinct_users_24h_est")
    }),

    // ---- cumulative-gains (lift) deciles of `value` as a purchase
    // score — the model-evaluation gains table next to value_auc's rank
    // statistic. Rows are bucketed by score descending through the same
    // two-phase PrefixSum scan over the DISTINCT-cents relation (never a
    // one-task window); a tie group lands wholly in the decile of its
    // FIRST rank (tie-coarse, deterministic). lift = precision-in-decile
    // over base rate, staged in decimal(38,0) so n_pos·N·1e6 cannot
    // overflow int64 at any scale. ----
    "value_lift_deciles" -> ((s, dir) => {
      val sc = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"),
          (col("event_type") === "purchase").cast("long").as("pos"))
      val g = sc.groupBy("cents").agg(count(lit(1)).as("n"), sum("pos").as("npos"))
      val cum = graft.operators.PrefixSum.runningTotal(
        g, "cum_incl", col("n"), col("cents").desc)
      val tot = g.agg(sum("n").as("nn"), sum("npos").as("np"))
      cum.crossJoin(broadcast(tot))
        .withColumn("decile", expr("CAST((cum_incl - n) * 10 div nn AS INT)"))
        .groupBy("decile")
        .agg(sum("n").as("n_rows"), sum("npos").as("n_pos"),
          max("nn").as("__nn"), max("np").as("__np"))
        .select(col("decile"), col("n_rows"), col("n_pos"),
          expr("""CAST(CAST(n_pos AS DECIMAL(38,0)) * __nn * 1000000
                  div nullif(n_rows * __np, 0) AS BIGINT)""").as("lift_e6"))
    }),

    // ---- exact Spearman rank correlation between order value and order
    // width (lineitem count): average-tie ranks kept integral in rank×2
    // (tie groups preserve the rank total, so Σrank2 = n(n+1) exactly and
    // centering on n+1 zeroes the mean with no division). Both rank
    // relations run through the two-phase PrefixSum scan over the
    // DISTINCT-value relation — never a one-task window; the n+1 center
    // joins in via the 1-row broadcast scalar pattern. Sums staged in
    // decimal(38,0) (Σd² ≤ n³ overflows int64 past ~2M rows); the final
    // ratio is the only double math, from exactly-representable ints. ----
    "spearman_corr" -> ((s, dir) => {
      val nli = Tables.lineitem(s, dir)
        .groupBy("l_orderkey").agg(count(lit(1)).as("yc"))
      val sp = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("xc"))
        .join(nli, col("o_orderkey") === col("l_orderkey"))
        .select("xc", "yc")
      def rank2(valCol: String, out: String): DataFrame = {
        val g = sp.groupBy(valCol).agg(count(lit(1)).as("c"))
        graft.operators.PrefixSum.runningTotal(g, "cum", col("c"), col(valCol))
          .select(col(valCol),
            (lit(2L) * (col("cum") - col("c")) + col("c") + 1).as(out))
      }
      val tot = sp.agg(count(lit(1)).as("nn"))
      sp.join(rank2("xc", "rx2"), Seq("xc"))
        .join(rank2("yc", "ry2"), Seq("yc"))
        .crossJoin(broadcast(tot))
        .select((col("rx2") - col("nn") - 1).as("dx"),
          (col("ry2") - col("nn") - 1).as("dy"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
          sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
          sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("syy"))
        .select(col("n_pairs"),
          when(col("sxx") =!= 0 && col("syy") =!= 0,
            floor(col("sxy").cast("double")
              / (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double")))
              * lit(1000000.0) + lit(0.5)).cast("long")).as("rho_e6"))
    }),

    // ---- exact mutual information I(event_type; hour-of-day) with both
    // marginal entropies — the dependence screen for feature/label
    // leakage in a training pipeline. One map-side-combinable groupBy to
    // the |types|×24-cell contingency relation; marginals and the grand
    // total are windows/aggregates OVER THE CELLS (≤ ~200 rows by
    // construction), so nothing after the first shuffle scales with the
    // data. Per-cell ln floored to _e6 (doc_entropy discipline) keeps
    // the weighted sums exact integers in both engines. ----
    "mutual_information" -> ((s, dir) => {
      val cells = Tables.events(s, dir)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type").as("t"), hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("nij"))
      // marginals + grand total as windows over the CELLS — everything
      // after the one map-side-combinable shuffle runs over ≤ |types|·24
      // rows, including the single-task lit(1) window (domain-bounded).
      // The marginal entropies ride the same relation via the identity
      // Σ_i ni·⌊ln(ni)·1e6⌉ = Σ_cells nij·⌊ln(ni)·1e6⌉ (the floored term
      // is constant per group and Σ_j nij = ni) — one events scan total.
      val m = cells
        .withColumn("ni", sum("nij").over(Window.partitionBy("t")))
        .withColumn("nj", sum("nij").over(Window.partitionBy("h")))
        .withColumn("nn", sum("nij").over(Window.partitionBy(lit(1))))
      def lnE6(c: Column): Column =
        floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
      m.agg(
          max("nn").as("n_events"),
          count(lit(1)).as("n_cells"),
          floor(sum(col("nij") * floor(
              log(col("nij").cast("double") * col("nn").cast("double")
                / (col("ni").cast("double") * col("nj").cast("double")))
                * lit(1000000.0) + lit(0.5)).cast("long")).cast("double")
            / max("nn") + lit(0.5)).cast("long").as("mi_e6"),
          (lnE6(max("nn"))
            - floor(sum(col("nij") * lnE6(col("ni"))).cast("double")
                / max("nn") + lit(0.5)).cast("long")).as("h_type_e6"),
          (lnE6(max("nn"))
            - floor(sum(col("nij") * lnE6(col("nj"))).cast("double")
                / max("nn") + lit(0.5)).cast("long")).as("h_hour_e6"))
    }),

    // ---- Hodges-Lehmann pseudomedian of daily revenue per event type:
    // the median of all Walsh pair averages (y_j+y_k)/2, j ≤ k — the
    // location estimator dual to the Wilcoxon signed-rank test (~95%
    // Gaussian efficiency, 29% breakdown). The pair join is equi on
    // event_type over the DAY-AGGREGATED relation, so its size is
    // calendar²-bounded per type (the Kendall/Theil-Sen argument), not
    // rows². Kept integral: pairs carry y_j+y_k (2×avg); the interpolated
    // median of those ints is a multiple of 0.5, so ×2 is exact —
    // pseudomedian_cents_x4 = round(2·median(w2)). ----
    "hodges_lehmann" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val a = daily.select(col("event_type"), col("day").as("d1"), col("y").as("y1"))
      val b = daily.select(col("event_type"), col("day").as("d2"), col("y").as("y2"))
      a.join(b, Seq("event_type")).filter(col("d1") <= col("d2"))
        .select(col("event_type"), (col("y1") + col("y2")).as("w2"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          round(percentile(col("w2"), lit(0.5)) * 2).cast("long")
            .as("pseudomedian_cents_x4"))
    }),

    // ---- exact ROC-AUC (Mann-Whitney rank statistic) of `value` as a
    // purchase score: ties take average ranks, kept integral by working
    // in rank×2; AUC_e6 = (2·rankSum⁺ − 2·P(P+1)/2)·1e6 div (2·P·N) —
    // every intermediate an exact integer (decimal(38,0) staging for the
    // products). The global cumulative runs through the two-phase
    // PrefixSum scan, never a one-task window over distinct scores ----
    "value_auc" -> ((s, dir) => {
      val sc = Tables.events(s, dir)
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"),
          (col("event_type") === "purchase").cast("long").as("pos"))
      val g = sc.groupBy("cents")
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
      val cum = graft.operators.PrefixSum.runningTotal(
        g, "cum_incl", col("n"), col("cents"))
      cum
        .select(col("npos"), col("n"),
          (col("npos") * (lit(2L) * (col("cum_incl") - col("n")) + col("n") + 1))
            .cast("decimal(38,0)").as("rs2"))
        .agg(sum(col("rs2")).as("rank_sum_x2"),
          sum(col("npos")).cast("decimal(38,0)").as("p"),
          (sum(col("n")) - sum(col("npos"))).cast("decimal(38,0)").as("nneg"))
        .selectExpr(
          "CAST(p AS BIGINT) AS n_pos",
          "CAST(nneg AS BIGINT) AS n_neg",
          """CAST((rank_sum_x2 - p * (p + 1)) * 1000000
             div nullif(2 * p * nneg, 0) AS BIGINT) AS auc_e6""")
    }),

    // ---- exact two-sample Kolmogorov-Smirnov: D = max_x |F_view(x) −
    // F_purchase(x)| between the value distributions of two event types,
    // kept integral by cross-multiplying the empirical CDFs (|cum1·n2 −
    // cum2·n1| over the common n1·n2 denominator — no double anywhere).
    // Both cumulatives run over the domain-bounded distinct-cents
    // relation (the value_auc argument) in ONE two-phase multi-value
    // PrefixSum scan (runningTotals — one range exchange and one offset
    // join where chained single scans paid two of each); argmax lands on
    // the smallest cents achieving D (deterministic tiebreak) via
    // TakeOrderedAndProject ----
    "ks_two_sample" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull &&
          col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("cents"),
          (col("event_type") === "view").cast("long").as("isv"))
      val g = ev.groupBy("cents").agg(
        sum(col("isv")).as("n1"), sum(lit(1L) - col("isv")).as("n2"))
      val c2 = graft.operators.PrefixSum.runningTotals(g,
        Seq("cum1" -> col("n1"), "cum2" -> col("n2")), col("cents"))
      val tot = g.agg(sum("n1").as("t1"), sum("n2").as("t2"))
      c2.crossJoin(broadcast(tot))
        .select(col("cents"), col("t1"), col("t2"),
          abs(col("cum1").cast("decimal(38,0)") * col("t2") -
              col("cum2").cast("decimal(38,0)") * col("t1")).as("num"))
        .orderBy(col("num").desc, col("cents").asc)
        .limit(1)
        .selectExpr("t1 AS n_view", "t2 AS n_purchase",
          "cents AS d_at_cents",
          """CAST(num * 1000000 div nullif(CAST(t1 AS DECIMAL(38,0)) * t2, 0)
             AS BIGINT) AS d_e6""")
    }),

    // ---- exact 1-D Wasserstein-1 (earth mover) distance between the
    // view and purchase value distributions: W₁ = ∫|F₁−F₂|dx, computed
    // as Σ over adjacent distinct cents of |cum₁·n₂−cum₂·n₁|·gap over
    // the n₁·n₂ denominator — the integral sibling of ks_two_sample's
    // max (same ONE multi-value two-phase prefix scan over the
    // domain-bounded distinct-cents relation; the lead window for gaps
    // runs over that same bounded domain). decimal(38,0)-staged
    // cross-products; the only division is the final e6 rational. ----
    "wasserstein_value" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull &&
          col("event_type").isin("view", "purchase"))
        .select(round(col("value") * 100).cast("long").as("cents"),
          (col("event_type") === "view").cast("long").as("isv"))
      val g = ev.groupBy("cents").agg(
        sum(col("isv")).as("n1"), sum(lit(1L) - col("isv")).as("n2"))
      val c2 = graft.operators.PrefixSum.runningTotals(g,
        Seq("cum1" -> col("n1"), "cum2" -> col("n2")), col("cents"))
      val tot = g.agg(sum("n1").as("t1"), sum("n2").as("t2"))
      c2.crossJoin(broadcast(tot))
        .withColumn("next_c", lead(col("cents"), 1).over(Window.orderBy(col("cents").asc)))
        .filter(col("next_c").isNotNull)
        .select(
          (abs(col("cum1").cast("decimal(38,0)") * col("t2")
            - col("cum2").cast("decimal(38,0)") * col("t1"))
            * (col("next_c") - col("cents"))).as("term"),
          col("t1"), col("t2"))
        .agg(max("t1").as("n_view"), max("t2").as("n_purchase"),
          sum("term").as("__s"))
        .select(col("n_view"), col("n_purchase"),
          expr("""CAST(__s * 1000000
                  div nullif(CAST(n_view AS DECIMAL(38,0)) * n_purchase, 0)
                  AS BIGINT)""").as("w1_cents_e6"))
    }),

    // ---- Population Stability Index between the two event_id-parity
    // halves over pooled-value deciles — the standard model-monitoring
    // drift number. Bins come from the same tie-coarse decile scan as
    // value_lift_deciles (two-phase prefix over distinct cents); per-bin
    // (p−q)·ln(p/q) is floored to _e6 from exact integer cross-products
    // so the 10-term sum is engine-identical. Bins empty on either side
    // drop (the ε-free convention, documented). ----
    "distribution_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .select(round(col("value") * 100).cast("long").as("cents"),
          pmod(col("event_id"), lit(2)).as("half"))
      val g = ev.groupBy("cents").agg(count(lit(1)).as("n"),
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
      val cum = graft.operators.PrefixSum.runningTotal(
        g, "cum_incl", col("n"), col("cents"))
      val tot = g.agg(sum("n").as("nn"), sum("na").as("ta"), sum("nb").as("tb"))
      cum.crossJoin(broadcast(tot))
        .withColumn("decile", expr("CAST((cum_incl - n) * 10 div nn AS INT)"))
        .groupBy("decile")
        .agg(sum("na").as("ba"), sum("nb").as("bb"),
          max("ta").as("ta"), max("tb").as("tb"))
        .filter(col("ba") > 0 && col("bb") > 0)
        .select(col("ba"), col("bb"), col("ta"), col("tb"),
          floor((col("ba").cast("decimal(38,0)") * col("tb")
              - col("bb").cast("decimal(38,0)") * col("ta")).cast("double")
            / (col("ta").cast("double") * col("tb").cast("double"))
            * log(col("ba").cast("double") * col("tb").cast("double")
              / (col("bb").cast("double") * col("ta").cast("double")))
            * lit(1000000.0) + lit(0.5)).cast("long").as("term_e6"))
        .agg(max("ta").as("n_half_a"), max("tb").as("n_half_b"),
          count(lit(1)).as("n_bins_used"),
          sum("term_e6").as("psi_e6"))
    }),

    // ---- Monte-Carlo relabel test (the randomization-test form of the
    // two-sample mean comparison): is the purchase-vs-view mean value
    // gap explainable by label noise? Each of B=32 deterministic
    // resamples reassigns every row a 50/50 pseudo-label from one
    // member of the portable multiply-shift family (ONE md5 per row —
    // the poisson_bootstrap_ci machinery); the observed labeling rides
    // along as resample −1, so the p-value is a trivial client fold of
    // 33 rows. The exact permutation test fixes group sizes; the
    // relabel form is its standard one-pass large-n surrogate (sizes
    // concentrate at n/2). Every number is an exact integer in both
    // engines; diff of floored means keeps the comparison exact ----
    "permutation_test" -> ((s, dir) => {
      val half = 1L << 59 // P(label A) = 1/2 of the 60-bit range
      val ev = Tables.events(s, dir)
        .filter(col("value").isNotNull &&
          col("event_type").isin("view", "purchase"))
        .select(col("event_id"),
          round(col("value") * 100).cast("long").as("v"),
          (col("event_type") === "purchase").cast("long").as("obs"))
      val withH = ev.withColumn("__h",
        graft.functions.PortableHash.hash60(col("event_id")))
      val pairs = (0 until BootResamples).map { b =>
        struct(lit(b).as("b"),
          (graft.functions.PortableHash.family60(col("__h"), b) < lit(half))
            .cast("long").as("lab"))
      } :+ struct(lit(-1).as("b"), col("obs").as("lab"))
      withH
        .select(explode(array(pairs: _*)).as("bl"), col("v"))
        .select(col("bl.b").as("resample"), col("bl.lab").as("lab"), col("v"))
        .groupBy("resample")
        .agg(sum(col("lab")).as("n_a"),
          sum(col("lab") * col("v")).as("s_a"),
          (count(lit(1)) - sum(col("lab"))).as("n_b"),
          (sum(col("v")) - sum(col("lab") * col("v"))).as("s_b"))
        .select(col("resample"), col("n_a"), col("n_b"),
          (flooredMeanE6(col("s_a"), col("n_a")) -
            flooredMeanE6(col("s_b"), col("n_b"))).as("mean_diff_e6"))
    }),

    // ---- DAU/MAU stickiness, EXACT: the rolling-30d distinct-user count
    // without rescanning 30 days per day — each user's active-day runs
    // become ±1 coverage deltas (+1 at an active day, −1 where coverage
    // lapses: min(next active, day+30)), the day spine aggregates the
    // deltas, and MAU is one cumulative sum over the BOUNDED day
    // dimension (the vocab_growth single-window justification: |days|
    // rows, not |events|). Contrast rolling_distinct_24h, which is the
    // sketched form of the same question at unbounded spine scale ----
    "stickiness_dau_mau" -> ((s, dir) => {
      val ud = Tables.events(s, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
      val wu = Window.partitionBy("user_id").orderBy(col("d").asc)
      val deltas = ud
        .withColumn("nxt", lead(col("d"), 1).over(wu))
        .select(col("user_id"), col("d"),
          least(coalesce(col("nxt"), date_add(col("d"), 30)),
            date_add(col("d"), 30)).as("lapse"))
      val byDay = deltas.select(col("d").as("day"), lit(1L).as("delta"))
        .unionByName(deltas.select(col("lapse").as("day"), lit(-1L).as("delta")))
        .groupBy("day").agg(sum(col("delta")).as("net"))
      val wcum = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mau = byDay.withColumn("mau", sum(col("net")).over(wcum))
      dau.join(mau.select(col("day").as("d"), col("mau")), Seq("d"))
        .select(col("d"), col("dau"), col("mau").cast("long").as("mau"),
          expr("CAST(dau * 1000000 div mau AS BIGINT)").as("stickiness_e6"))
    }),

    // ---- CMS join-size estimation: the planner-side cardinality
    // primitive — |views ⋈ purchases on user| estimated from two tiny
    // frequency sketches (min over depth of register dot products,
    // overcount-only), with the exact Σ a(k)·b(k) alongside ----
    "join_size_cms" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val views = ev.filter(col("event_type") === "view")
      val buys = ev.filter(col("event_type") === "purchase")
      val est = graft.operators.Sketches.cmsInnerProduct(
        graft.operators.Sketches.cmsPartials(views, "user_id", CmsDepth, CmsWidth),
        graft.operators.Sketches.cmsPartials(buys, "user_id", CmsDepth, CmsWidth))
      val exact = views.groupBy("user_id").agg(count(lit(1)).as("__a"))
        .join(buys.groupBy("user_id").agg(count(lit(1)).as("__b")), "user_id")
        .agg(coalesce(sum(col("__a") * col("__b")), lit(0L)).as("n_exact"))
      exact.crossJoin(est)
        .select(col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
    }),

    // ---- rollup (grouping-sets family): subtotals + grand total ----
    "revenue_rollup" -> ((s, dir) =>
      Tables.orders(s, dir).rollup("o_orderpriority", "o_orderstatus")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))),

    // ---- cube + grouping sets (full grouping-id coverage) ----
    "events_cube" -> ((s, dir) =>
      Tables.events(s, dir).withColumn("date", to_date(col("ts")))
        .cube("event_type", "date")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
          grouping_id().as("gid"))),
    "events_grouping_sets" -> ((s, dir) =>
      Tables.events(s, dir).withColumn("date", to_date(col("ts")))
        .groupingSets(Seq(Seq(col("event_type")), Seq(col("date"))),
          col("event_type"), col("date"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))),

    // ---- pivot: one column per event type ----
    "events_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("date", to_date(col("ts")))
        .groupBy("date")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()),

    // ---- unpivot (pandas melt parity): the pivoted wide frame folded
    // back to (date, event_type, n) rows via `stack` — a generator, so
    // the reshape is row-local with no extra shuffle; absent combos
    // (null count cells) drop, restoring exactly the long-form counts ----
    "events_unpivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("date", to_date(col("ts")))
        .groupBy("date")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .select(col("date"), expr(
          """stack(5, 'click', click, 'error', error, 'purchase', purchase,
             'signup', signup, 'view', view) AS (event_type, n)"""))
        .filter(col("n").isNotNull)),

    // ---- nation revenue share by year: each nation's slice of yearly
    // revenue in e6 — the share-of-market trend. Shares window over the
    // bounded (year, nation) aggregate, never the fact table ----
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

  /** Shared recall@k combinator for the `*_recall` harness rows: exact
    * panel ranking (panel × corpus — linear, ungated) left-joined against
    * the approximate index's answer. Only panel queries survive the join,
    * so the report is `RecallPanel` rows regardless of corpus size.
    *
    * The approximate leg is pre-filtered to the panel's query ids as a
    * LITERAL predicate (the ids come from the same driver-side
    * hash/orderBy/limit rule as the IVF codebook — bounded by
    * construction): a literal filter on the window-partition column
    * pushes BELOW the index's ranking windows into its query-side scan,
    * so the index ranks 64 queries instead of the whole corpus. The
    * join result is identical either way (only panel pairs are looked
    * up); the oracle keeps the corpus-wide form and matches. At 100 TB
    * this is the difference between "run the index for a panel" and
    * "run the index for every vector" every time recall is measured.
    *
    * The exact leg is SHARED across the four `*_recall` rows: it depends
    * only on (session, corpus dir), not on the index under test, so it is
    * computed once per session, pinned with an eager `localCheckpoint`
    * (the Contrastive/KMeans materialization pattern), and every recall
    * row joins against the pinned 64×k result instead of re-running the
    * panel × corpus scan. The panel ids come out of the SAME pinned leg
    * (64×k local rows — a driver-side collect bounded by construction),
    * saving the separate orderBy/limit corpus pass too. In a recall-tuning
    * sweep — the real use, many index configurations against one exact
    * ranking — the exact cost is paid once regardless of how many tiers
    * are measured. */
  private val panelExactCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Seq[Long], DataFrame)]

  private val dedupClustersCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val dupEdgesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private val replayBatchesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), IndexedSeq[DataFrame]]

  private val cdfWindowCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (String, Long, Long)]

  /** Session-pinned CDF window (seed %10≠0 → upsert %5==0 with +1000 →
    * delete %7==0 over documents, 8 buckets, retain 3) — returns
    * (snapshot base dir, v0, v2). `snapshot_changes` and
    * `snapshot_changes_where` diff the SAME committed window through
    * their respective read paths (full CDF vs value-zonemap-predicated),
    * so the three merge publishes run once per (session, corpus) — the
    * replay-family amortization applied to the merge pair. The window
    * lives in a session temp dir; versions v0..v2 stay retained. */
  private def cdfWindowFor(s: SparkSession, dir: String): (String, Long, Long) =
    cdfWindowCache.getOrElseUpdate((s, dir), {
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars", "lang")
      val base = tempSnapshotBase("graft-cdfpin")
      val v0 = graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 10 =!= 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "seed", retain = 3, numBuckets = 8)
      graft.streaming.VersionedSnapshot.mergeInto(
        base,
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("n_chars", col("n_chars") + 1000),
        Seq("doc_id"), graft.streaming.VersionedSnapshot.UpdateMatched,
        insertUnmatched = true, marker = "upsert", retain = 3, numBuckets = 8)
      val v2 = graft.streaming.VersionedSnapshot.mergeInto(
        base, docs.filter(col("doc_id") % 7 === 0), Seq("doc_id"),
        graft.streaming.VersionedSnapshot.DeleteMatched,
        insertUnmatched = false, marker = "delete", retain = 3, numBuckets = 8)
      (base, v0, v2)
    })

  /** Session-pinned deterministic micro-batch split of the events CDC
    * projection (batch b = event_id % 3 == b, columns user_id /
    * event_type / event_id / v_cents) — the relation every replay-family
    * query (`incr_snapshot_replay`, `incr_snapshot_versioned`,
    * `cdc_merge_replay`, `mor_delta_replay`, `dedup_stream_replay`)
    * re-derived 3-4× each by query independence. The split is pinned
    * eagerly (localCheckpoint, |events| rows total — bounded) so the
    * events scan + projection + filter runs once per (session, corpus);
    * the merge/replay cycles stay fully per-query, because the replay
    * machinery is exactly what those queries exist to exercise. */
  /** The exact isotonic purchase-rate fit over bit-length value buckets —
    * shared by `isotonic_calibration` (which reports it) and
    * `brier_decomposition` (which scores it). Columns: b (bucket), n, p,
    * iso_e6. See the isotonic_calibration scaladoc for the minimax
    * identity and the floor-commutes argument; cheap enough (≤63-row
    * grid work over one scan) that no session pin is warranted. */
  private def isotonicFitFor(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(
        length(bin(round(col("value") * 100).cast("long"))).as("b"),
        (col("event_type") === "purchase").cast("long").as("pos"))
    val wcum = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ev.groupBy("b")
      .agg(count(lit(1)).as("n"), sum("pos").as("p"))
      .withColumn("cn", sum(col("n")).over(wcum))
      .withColumn("cp", sum(col("p")).over(wcum))
    val lo = cum.select(col("b").as("j"), (col("cn") - col("n")).as("cn0"),
      (col("cp") - col("p")).as("cp0"))
    val hi = cum.select(col("b").as("k"), col("cn").as("cnk"),
      col("cp").as("cpk"))
    val pairs = hi.join(broadcast(lo.limit(1024)), col("j") <= col("k"))
      .selectExpr("j", "k",
        "CAST((cpk - cp0) * 1000000 div (cnk - cn0) AS BIGINT) AS m_e6")
    val sufMin = Window.partitionBy("j").orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preMax = Window.partitionBy("k").orderBy(col("j").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iso = pairs
      .withColumn("minK", min(col("m_e6")).over(sufMin))
      .withColumn("iso_e6", max(col("minK")).over(preMax))
      .filter(col("j") === col("k"))
      .select(col("k").as("b"), col("iso_e6"))
    cum.join(iso, Seq("b")).select("b", "n", "p", "iso_e6")
  }

  private def replayBatchesFor(s: SparkSession, dir: String): IndexedSeq[DataFrame] =
    replayBatchesCache.getOrElseUpdate((s, dir), {
      val ev = Tables.events(s, dir).select(
        col("user_id"), col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v_cents"))
      (0L until 3L).toIndexedSeq.map(b =>
        ev.filter(pmod(col("event_id"), lit(3)) === b).localCheckpoint())
    })

  /** Session-pinned simhash near-dup pair relation (id_a < id_b by the
    * operator's join condition, deduped, hamming column carried) — the
    * `simhash_pairs` query itself and the graph subtree
    * (`dup_graph_triangles`, `dup_graph_clustering_coeff`,
    * `dup_link_prediction`, …) all consume it. Same amortization
    * rationale as [[dedupClustersFor]]: the banded simhash candidate
    * join runs once per (session, corpus); every consumer reads the
    * pinned relation (|pairs| rows of two longs + a byte — bounded by
    * the band join's output, not a leak). r9: the pin now carries the
    * full operator output so `simhash_pairs` is a projection of it
    * instead of a second band-join derivation. */
  private def simhashPairsFor(s: SparkSession, dir: String): DataFrame =
    dupEdgesCache.getOrElseUpdate((s, dir),
      Dedup.simHashPairs(Tables.documents(s, dir), "doc_id", "text",
          maxHamming = ShMaxHamming, blocks = ShBlocks, blocksPerKey = ShBlocksPerKey,
          portable = true)
        .localCheckpoint())

  /** The graph-family view of [[simhashPairsFor]]: canonical (a, b)
    * columns. The operator already emits id_a < id_b with no self-loops
    * or duplicates, so this is a pure projection of the pin. */
  private def dupEdgesFor(s: SparkSession, dir: String): DataFrame =
    simhashPairsFor(s, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))

  /** The KmeansRounds-round Lloyd fit at a given k (see `kmeans_fit`'s
    * scaladoc for the exact-integer design): returns (final assignment
    * (vec_id, c, d2), final centroids (c, pos, m)). Shared by
    * `kmeans_fit` and the `kmeans_k_sweep` elbow table. */
  private def kmeansRun(s: SparkSession, dir: String, k: Int): (DataFrame, DataFrame) = {
    val flat = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"),
        floor(col("x") * lit(1000.0) + lit(0.5)).cast("long").as("q"))
    val seeds = Tables.embeddings(s, dir)
      .select(col("vec_id")).orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("c"))
    def assign(cent: DataFrame): DataFrame =
      flat.join(broadcast(cent), Seq("pos"))
        .groupBy(col("vec_id"), col("c"))
        .agg(sum((col("q") - col("m")) * (col("q") - col("m"))).as("d2"))
        .groupBy("vec_id")
        .agg(min(struct(col("d2"), col("c"))).as("__best"))
        .select(col("vec_id"),
          col("__best").getField("c").as("c"),
          col("__best").getField("d2").as("d2"))
    var cent = flat.join(broadcast(seeds), col("vec_id") === col("c"))
      .select(col("c"), col("pos"), col("q").as("m"))
    for (_ <- 1 to KmeansRounds)
      cent = flat.join(assign(cent).select("vec_id", "c"), Seq("vec_id"))
        .groupBy("c", "pos")
        .agg(expr("CAST(sum(q) div count(1) AS BIGINT)").as("m"))
    (assign(cent), cent)
  }

  private val jaccardPairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Session-pinned banded-Jaccard pair relation (n=3, threshold 0.2,
    * columns id_a/id_b/jaccard) — the subtree `jaccard_pairs`,
    * `dup_graph_kcore`, `dup_jaccard_histogram`, `dup_source_crosstab`,
    * `er_field_weights` and the [[dedupClustersFor]] clustering all
    * consume; the shingle join runs once per (session, corpus). Pair
    * volume is bounded by the band join's output (the same bound every
    * consumer already carried). */
  private def jaccardPairsFor(s: SparkSession, dir: String): DataFrame =
    jaccardPairsCache.getOrElseUpdate((s, dir),
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, threshold = 0.2)
        .localCheckpoint())

  /** Session-cached banded-Jaccard near-dup clustering (connected
    * components over `Dedup.jaccardPairs` at n=3, threshold=0.2) — the
    * subtree `dedup_clusters`, `dup_cluster_sizes` and
    * `dedup_near_keepers` all consume. Query independence would otherwise
    * re-derive the full shingle join + CC fixpoint once per consumer;
    * like [[panelExactFor]], the assignments are pinned once per
    * (session, corpus) with an eager `localCheckpoint` (|docs| rows of
    * two longs — bounded, not a leak) and every consumer reads the pin.
    * The real-pipeline analog: a dedup pass materializes its cluster
    * table once and every downstream policy reads it. */
  private def dedupClustersFor(s: SparkSession, dir: String): DataFrame =
    dedupClustersCache.getOrElseUpdate((s, dir),
      graft.operators.Components.connectedComponents(
          jaccardPairsFor(s, dir), "id_a", "id_b")
        .localCheckpoint())

  /** Session-cached (panel ids, pinned exact top-k) for the recall rows.
    * Keyed by session INSTANCE so a restarted session never sees another
    * session's checkpointed RDDs; entries live for the session's lifetime
    * (a handful of (dir → 64×k-row) pins — bounded, not a leak). */
  private def panelExactFor(s: SparkSession, dir: String): (Seq[Long], DataFrame) =
    panelExactCache.getOrElseUpdate((s, dir), {
      val exact = Similarity.panelExactTopK(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          panelSize = RecallPanel, k = AnnK)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint()
      val panelIds: Seq[Long] = exact.select(col("query_id").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq.sorted
      (panelIds, exact)
    })

  private def recallVsPanel(s: SparkSession, dir: String, approx: DataFrame): DataFrame = {
    val (panelIds, exact) = panelExactFor(s, dir)
    exact.join(
        approx.filter(col("query_id").isin(panelIds: _*))
          .select(col("query_id").as("__qa"), col("neighbor_id").as("__na")),
        col("query_id") === col("__qa") && col("neighbor_id") === col("__na"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("__qa")).as("n_hits"))
      .withColumn("recall_e6",
        floor(col("n_hits") * lit(1.0) / col("n_exact") * lit(1e6) + lit(0.5))
          .cast("long"))
  }

  // ---- generated oracle SQL for the hash-family queries ----
  // These five oracles are BUILT programmatically from the same constants
  // (and the same Rademacher hyperplane generator) as the Spark queries, so
  // the two sides cannot drift: md5-derived 60-bit hashes are computed
  // identically in both engines (PortableHash), hyperplanes enter the
  // DuckDB plan as a literal VALUES relation.

  /** DuckDB side of [[graft.functions.PortableHash.hash60]]. */
  private def dh(e: String): String = graft.functions.PortableHash.duckdbSql(e)

  /** Estimate-vs-exact harness over the MinHash candidates: wraps the
    * generated MinHash oracle as a derived table, recomputes the exact
    * 3-gram Jaccard for each surviving pair with fresh CTE names. */
  private def minHashAccuracyOracle: String =
    s"""WITH est AS (SELECT * FROM ($minHashLshOracle)),
       |t2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g2 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
       |       FROM t2, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g2 GROUP BY doc_id),
       |it AS (SELECT e.id_a, e.id_b, CAST(count(*) AS BIGINT) AS inter
       |       FROM est e JOIN g2 ga ON ga.doc_id = e.id_a
       |                  JOIN g2 gb ON gb.doc_id = e.id_b AND gb.gram = ga.gram
       |       GROUP BY e.id_a, e.id_b),
       |o AS (SELECT e.id_a, e.id_b,
       |        CAST(floor(e.est_jaccard * 1000000.0 + 0.5) AS BIGINT) AS est_e6,
       |        CAST(floor(coalesce(it.inter, 0) * 1.0 /
       |          (sa.sz + sb.sz - coalesce(it.inter, 0)) * 1000000.0 + 0.5) AS BIGINT) AS true_e6
       |      FROM est e LEFT JOIN it ON e.id_a = it.id_a AND e.id_b = it.id_b
       |                 JOIN sz sa ON e.id_a = sa.doc_id
       |                 JOIN sz sb ON e.id_b = sb.doc_id)
       |SELECT id_a, id_b, est_e6, true_e6, abs(est_e6 - true_e6) AS err_e6 FROM o""".stripMargin

  private def minHashLshOracle: String =
    minHashLshOracleFrom("documents", MhThreshold)

  /** Mirror of the lsh_pr_audit harness: the full generated MinHash-LSH
    * pipeline as the prediction, the jaccard_pairs expression at the
    * same threshold as the truth. */
  private def lshPrAuditOracle: String = {
    s"""WITH pred AS (SELECT id_a, id_b FROM (${minHashLshOracleFrom("documents", PrThreshold)})),
       |qtoks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |qgrams AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
       |  FROM qtoks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
       |qsizes AS (SELECT doc_id, count(*) AS n FROM qgrams GROUP BY doc_id),
       |qinter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |  FROM qgrams a JOIN qgrams b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (SELECT id_a, id_b FROM (
       |    SELECT i.id_a, i.id_b,
       |           round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS j
       |    FROM qinter i JOIN qsizes sa ON i.id_a = sa.doc_id
       |                  JOIN qsizes sb ON i.id_b = sb.doc_id)
       |  WHERE j >= $PrThreshold),
       |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM truth),
       |cp AS (SELECT CAST(count(*) AS BIGINT) AS n_pred FROM pred),
       |ch AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
       |       FROM truth t WHERE EXISTS (SELECT 1 FROM pred p
       |                                  WHERE p.id_a = t.id_a AND p.id_b = t.id_b))
       |SELECT n_true, n_pred, n_hit,
       |  CASE WHEN n_pred > 0
       |       THEN CAST(floor(n_hit * 1000000 / n_pred + 0.5) AS BIGINT) END AS precision_e6,
       |  CASE WHEN n_true > 0
       |       THEN CAST(floor(n_hit * 1000000 / n_true + 0.5) AS BIGINT) END AS recall_e6
       |FROM ct, cp, ch""".stripMargin
  }

  /** [[minHashLshOracle]] parameterized over the base relation and the
    * estimate threshold, so the precision/recall audit can run the
    * identical pipeline at its own cut. */
  private def minHashLshOracleFrom(rel: String, threshold: Double): String = {
    val rows = MhHashes / MhBands
    // (member index, multiplier) literal relation — the same multiply-shift
    // family PortableHash.family60 derives from one md5 per gram
    val mults = (0 until MhHashes)
      .map(i => s"($i,${graft.functions.PortableHash.multiplier(i)})").mkString(",")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $rel),
       |grams AS (
       |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
       |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
       |gh AS (SELECT doc_id, ${dh("gram")} AS gh FROM grams),
       |mm(i, m) AS (VALUES $mults),
       |mh AS (
       |  SELECT g.doc_id, mm.i,
       |         min(${graft.functions.PortableHash.duckdbFamilySql("g.gh", "mm.m", "mm.i")}) AS h
       |  FROM gh g CROSS JOIN mm GROUP BY g.doc_id, mm.i),
       |bands AS (
       |  SELECT doc_id, i // $rows AS band,
       |         string_agg(CAST(h AS VARCHAR), ',' ORDER BY i) AS bkey
       |  FROM mh GROUP BY doc_id, i // $rows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |eq AS (
       |  SELECT c.id_a, c.id_b, sum(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) AS n_eq
       |  FROM cand c JOIN mh x ON x.doc_id = c.id_a
       |              JOIN mh y ON y.doc_id = c.id_b AND y.i = x.i
       |  GROUP BY c.id_a, c.id_b)
       |SELECT id_a, id_b, est_jaccard FROM (
       |  SELECT id_a, id_b, round(CAST(n_eq AS DOUBLE) / $MhHashes, 6) AS est_jaccard FROM eq)
       |WHERE est_jaccard >= $threshold""".stripMargin
  }

  private def simHashOracle: String = {
    val bits = graft.operators.Dedup.simHashBits(portable = true)
    val sums = (0 until bits)
      .map(i => s"sum(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n    ")
    val packed = (0 until bits)
      .map(i => s"(CASE WHEN b$i > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
       |h AS (SELECT doc_id, ${dh("w")} AS h FROM tok),
       |bits AS (SELECT doc_id,
       |    $sums
       |  FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, $packed AS simhash FROM bits)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $ShMaxHamming""".stripMargin
  }

  /** Literal (tbl, bit, i, h) hyperplane relation — same Rademacher
    * generator the Spark plan bakes in (Similarity.rademacher), 1-based
    * dim index to match generate_subscripts. */
  private def hyperplaneValues(nBits: Int, tables: Int): String =
    (for {
      t <- 0 until tables
      b <- 0 until nBits
      h = graft.operators.Similarity.rademacher(t * nBits + b, Dim)
      j <- 0 until Dim
    } yield s"($t,$b,${j + 1},${h(j).toInt})").mkString(",")

  /** Shared CTE prefix: per-(vector, table) sign-pattern buckets plus the
    * Hamming-1 multi-probe expansion. */
  private def lshBucketCtes(nBits: Int, tables: Int): String =
    s"""flat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
       |hp(tbl, bit, i, h) AS (VALUES ${hyperplaneValues(nBits, tables)}),
       |sig AS (
       |  SELECT f.vec_id, hp.tbl, hp.bit,
       |         CASE WHEN sum(f.x * hp.h) >= 0 THEN (1::BIGINT << hp.bit)
       |              ELSE 0::BIGINT END AS bitval
       |  FROM flat f JOIN hp ON f.i = hp.i GROUP BY f.vec_id, hp.tbl, hp.bit),
       |buckets AS (SELECT vec_id, tbl, CAST(sum(bitval) AS BIGINT) AS bucket
       |            FROM sig GROUP BY vec_id, tbl),
       |probes AS (
       |  SELECT vec_id, tbl, bucket FROM buckets
       |  UNION ALL
       |  SELECT vec_id, tbl, xor(bucket, (1::BIGINT << b))
       |  FROM buckets, UNNEST(range(0, $nBits)) AS t(b)),""".stripMargin

  /** Shared CTE suffix: exact cosine over the candidate pairs (same
    * dots/norms shape as the proven cosine_topk oracle). */
  private def pairScoreCtes(aCol: String, bCol: String): String =
    s"""dots AS (
       |  SELECT cd.$aCol, cd.$bCol, sum(fa.x * fb.x) AS dp
       |  FROM cand cd JOIN flat fa ON fa.vec_id = cd.$aCol
       |               JOIN flat fb ON fb.vec_id = cd.$bCol AND fb.i = fa.i
       |  GROUP BY cd.$aCol, cd.$bCol),
       |scored AS (
       |  SELECT d.$aCol, d.$bCol, round(d.dp / (na.nrm * nb.nrm), 6) AS cosine_sim
       |  FROM dots d JOIN norms na ON d.$aCol = na.vec_id
       |              JOIN norms nb ON d.$bCol = nb.vec_id)""".stripMargin

  private def lshTopKOracle: String =
    s"""WITH ${lshBucketCtes(LshBits, LshTables)}
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM probes p JOIN buckets c
       |    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id),
       |${pairScoreCtes("query_id", "neighbor_id")},
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS "rank"
       |      FROM scored)
       |SELECT query_id, neighbor_id, cosine_sim, CAST("rank" AS INTEGER) AS "rank" FROM r WHERE "rank" <= $AnnK""".stripMargin

  /** DuckDB side of the SQ serving tier ([[graft.operators.Quantize.int8]]
    * → dequant → [[Similarity.panelTopKAgainst]]): full-precision panel
    * queries ranked against the int8-dequantized corpus. Quantize and
    * dequantize use the same per-element IEEE expressions in the same
    * order as the Spark side (the `embedding_quantize` oracle's
    * arithmetic), so the reconstructed values are bit-identical. */
  private def sqPanelTopKOracle: String =
    s"""WITH sqv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
       |             FROM embeddings),
       |sqb AS (SELECT vec_id, vv, list_min(vv) AS q_lo, list_max(vv) AS q_hi FROM sqv),
       |sqdq AS (SELECT vec_id,
       |    CASE WHEN q_hi = q_lo THEN list_transform(vv, x -> q_lo)
       |         ELSE list_transform(vv, x -> q_lo +
       |           CAST(floor((x - q_lo) / (q_hi - q_lo) * 255.0 + 0.5) AS INTEGER)
       |             / 255.0 * (q_hi - q_lo))
       |    END AS dv
       |  FROM sqb),
       |sqcflat AS (SELECT vec_id, generate_subscripts(dv, 1) AS i, UNNEST(dv) AS x FROM sqdq),
       |sqcnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM sqcflat GROUP BY vec_id),
       |sqpanel AS (SELECT vec_id FROM embeddings
       |            ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
       |            LIMIT $RecallPanel),
       |sqqflat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |                   CAST(UNNEST(embedding) AS DOUBLE) AS x
       |            FROM embeddings WHERE vec_id IN (SELECT vec_id FROM sqpanel)),
       |sqqnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM sqqflat GROUP BY vec_id),
       |sqdots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x * c.x) AS dp
       |           FROM sqqflat q JOIN sqcflat c ON q.i = c.i AND q.vec_id <> c.vec_id
       |           GROUP BY q.vec_id, c.vec_id),
       |sqscored AS (SELECT query_id, neighbor_id, round(dp / (qn.nrm * cn.nrm), 6) AS cosine_sim
       |             FROM sqdots JOIN sqqnorms qn ON query_id = qn.vec_id
       |                         JOIN sqcnorms cn ON neighbor_id = cn.vec_id),
       |sqr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                  ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM sqscored)
       |SELECT query_id, neighbor_id FROM sqr WHERE rn <= $AnnK""".stripMargin

  /** Recall@k of an approximate index's answer (any derived table with
    * `query_id`/`neighbor_id` columns) against the exact ranking of the
    * hash-sampled query panel — DuckDB side of [[recallVsPanel]] /
    * [[Similarity.panelExactTopK]]. The panel is the `RecallPanel` ids
    * with the smallest portable hash (same ORDER BY/LIMIT rule as the IVF
    * pseudo-centroids); the exact leg is computed ONLY for panel queries. */
  private def panelRecallOracle(approxSql: String): String =
    s"""WITH ap AS (SELECT query_id, neighbor_id FROM ($approxSql)),
       |pflat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |pnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pflat GROUP BY vec_id),
       |panel AS (SELECT vec_id FROM embeddings
       |          ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
       |          LIMIT $RecallPanel),
       |edots AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dp
       |  FROM pflat a JOIN pflat b ON a.i = b.i AND a.vec_id <> b.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM panel)
       |  GROUP BY a.vec_id, b.vec_id),
       |escored AS (
       |  SELECT query_id, neighbor_id, round(dp / (na.nrm * nb.nrm), 6) AS cosine_sim
       |  FROM edots JOIN pnorms na ON query_id = na.vec_id
       |             JOIN pnorms nb ON neighbor_id = nb.vec_id),
       |er AS (SELECT query_id, neighbor_id FROM (
       |         SELECT escored.*, row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM escored)
       |       WHERE rn <= $AnnK)
       |SELECT er.query_id, CAST(count(*) AS BIGINT) AS n_exact,
       |  CAST(count(ap.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(floor(count(ap.neighbor_id) * 1.0 / count(*) * 1000000.0 + 0.5) AS BIGINT) AS recall_e6
       |FROM er LEFT JOIN ap ON er.query_id = ap.query_id
       |                    AND er.neighbor_id = ap.neighbor_id
       |GROUP BY er.query_id""".stripMargin

  /** DuckDB side of [[graft.operators.Quantize.binaryTopK]]: identical
    * sign rule (x > 0), identical 32-bit word packing (bit 63 unused so
    * BIGINT shifts never trap), Hamming = Σ bit_count(xor) over the word
    * join, same (hamming ASC, neighbor_id ASC) ranking. */
  private def binaryTopKOracle(k: Int = AnnK): String =
    s"""WITH pflat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id, CAST((i - 1) // 32 AS INTEGER) AS w,
       |         CAST(COALESCE(sum(CASE WHEN x > 0
       |           THEN (1::BIGINT << ((i - 1) % 32)) ELSE 0 END), 0) AS BIGINT) AS word
       |  FROM pflat GROUP BY 1, 2),
       |panel AS (SELECT vec_id FROM embeddings
       |          ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
       |          LIMIT $RecallPanel),
       |ham AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(sum(bit_count(xor(q.word, c.word))) AS BIGINT) AS hamming
       |  FROM codes q JOIN codes c ON q.w = c.w AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id IN (SELECT vec_id FROM panel)
       |  GROUP BY 1, 2),
       |r AS (SELECT ham.*, row_number() OVER (PARTITION BY query_id
       |        ORDER BY hamming ASC, neighbor_id ASC) AS rn FROM ham)
       |SELECT query_id, neighbor_id, hamming, CAST(rn AS INTEGER) AS "rank"
       |FROM r WHERE rn <= $k""".stripMargin

  /** DuckDB side of the binary→float rerank cascade: the binary tier's
    * top-`BqCandK` candidates rescored by exact cosine (same rounding
    * and tie rule as every exact leg), cut to the final top-k. */
  private def bqRerankOracle: String =
    s"""WITH cand AS (SELECT query_id, neighbor_id FROM (${binaryTopKOracle(BqCandK)})),
       |rflat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |                 CAST(UNNEST(embedding) AS DOUBLE) AS x
       |          FROM embeddings),
       |rnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM rflat GROUP BY vec_id),
       |rdots AS (SELECT c.query_id, c.neighbor_id, sum(q.x * n.x) AS dp
       |          FROM cand c JOIN rflat q ON q.vec_id = c.query_id
       |                      JOIN rflat n ON n.vec_id = c.neighbor_id AND n.i = q.i
       |          GROUP BY 1, 2),
       |rsc AS (SELECT query_id, neighbor_id, round(dp / (qn.nrm * nn.nrm), 6) AS cosine_sim
       |        FROM rdots JOIN rnorms qn ON query_id = qn.vec_id
       |                   JOIN rnorms nn ON neighbor_id = nn.vec_id),
       |rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM rsc)
       |SELECT query_id, neighbor_id FROM rr WHERE rn <= $AnnK""".stripMargin

  /** DuckDB side of the Matryoshka-truncation tier: cosine ranking with
    * BOTH sides cut to the first Dim/2 coordinates. */
  private def mrlPanelTopKOracle: String =
    s"""WITH mflat AS (SELECT vec_id, i, x FROM (
       |                 SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |                        CAST(UNNEST(embedding) AS DOUBLE) AS x
       |                 FROM embeddings) WHERE i <= ${Dim / 2}),
       |mnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM mflat GROUP BY vec_id),
       |mpanel AS (SELECT vec_id FROM embeddings
       |           ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
       |           LIMIT $RecallPanel),
       |mdots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x * c.x) AS dp
       |          FROM mflat q JOIN mflat c ON q.i = c.i AND q.vec_id <> c.vec_id
       |          WHERE q.vec_id IN (SELECT vec_id FROM mpanel)
       |          GROUP BY 1, 2),
       |msc AS (SELECT query_id, neighbor_id, round(dp / (qn.nrm * cn.nrm), 6) AS cosine_sim
       |        FROM mdots JOIN mnorms qn ON query_id = qn.vec_id
       |                   JOIN mnorms cn ON neighbor_id = cn.vec_id),
       |mr AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn FROM msc)
       |SELECT query_id, neighbor_id FROM mr WHERE rn <= $AnnK""".stripMargin

  /** DuckDB side of [[graft.operators.Sketches.cmsPartials]] /
    * [[graft.operators.Sketches.cmsEstimate]]: same seeded portable hash
    * (`"j:" || key`), same integer modulo bucket, exact register counts,
    * min over the depth rows. The oracle builds registers from the whole
    * input in one pass while the Spark side goes through the 3-slice
    * merge — the hash can only match because CMS merging is exact. */
  private def heavyHittersCmsOracle: String = {
    val regBucket = dh("CAST(cj.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")
    val candBucket = dh("CAST(cj.j AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)")
    s"""WITH cj AS (SELECT CAST(UNNEST(range(0, $CmsDepth)) AS INTEGER) AS j),
       |regs AS (SELECT cj.j AS j, $regBucket % $CmsWidth AS bucket,
       |                CAST(count(*) AS BIGINT) AS n
       |         FROM events e CROSS JOIN cj
       |         WHERE e.user_id IS NOT NULL
       |         GROUP BY 1, 2),
       |top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact FROM events
       |        WHERE user_id IS NOT NULL
       |        GROUP BY 1 ORDER BY n_exact DESC, user_id ASC LIMIT 20),
       |est AS (SELECT t.user_id, t.n_exact, min(coalesce(r.n, 0)) AS n_est
       |        FROM top t CROSS JOIN cj
       |        LEFT JOIN regs r ON r.j = cj.j AND r.bucket = $candBucket % $CmsWidth
       |        GROUP BY 1, 2)
       |SELECT user_id, n_exact, CAST(n_est AS BIGINT) AS n_est,
       |       CAST(n_est - n_exact AS BIGINT) AS overcount
       |FROM est""".stripMargin
  }

  /** Mirror of the rolling 24h sketch merge: hourly registers, a 256-way
    * bucket spine per hour, a RANGE-window register max over the trailing
    * 24 hours, and the shared-constant estimate — every step the same
    * integer arithmetic as [[graft.operators.Sketches.hllRegisters]] /
    * `hllEstimate`. */
  private def rollingDistinctOracle: String = {
    val p = 8
    val m = 1 << p
    val tailBits = 60 - p
    val c = graft.operators.Sketches.alphaConstant(m)
    val rankCase = (tailBits - 1 to 0 by -1)
      .map(k => s"WHEN r >= ${1L << k} THEN ${tailBits - k}")
      .mkString(" ")
    s"""WITH rh AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
       |                   ${dh("CAST(user_id AS VARCHAR)")} AS h
       |            FROM events WHERE user_id IS NOT NULL),
       |rb AS (SELECT hour, h // ${1L << tailBits} AS b, h % ${1L << tailBits} AS r FROM rh),
       |rrk AS (SELECT hour, b, CASE $rankCase ELSE ${tailBits + 1} END AS rank FROM rb),
       |rregs AS (SELECT hour, b, max(rank) AS mr FROM rrk GROUP BY 1, 2),
       |rspine AS (SELECT DISTINCT hour FROM rh),
       |rgrid AS (SELECT s.hour, CAST(UNNEST(range(0, $m)) AS BIGINT) AS b FROM rspine s),
       |rrolled AS (SELECT g.hour, g.b,
       |              max(r.mr) OVER (PARTITION BY g.b ORDER BY g.hour
       |                              RANGE BETWEEN 23 PRECEDING AND CURRENT ROW) AS mr
       |            FROM rgrid g LEFT JOIN rregs r ON g.hour = r.hour AND g.b = r.b),
       |rs AS (SELECT hour,
       |         CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mr AS INTEGER)) AS BIGINT) AS s_present,
       |         CAST(count(*) AS BIGINT) AS nb
       |       FROM rrolled WHERE mr IS NOT NULL GROUP BY 1)
       |SELECT hour,
       |  CAST(floor($c / (s_present + ($m - nb) * (CAST(1 AS BIGINT) << 53)) + 0.5)
       |       AS BIGINT) AS distinct_users_24h_est
       |FROM rs""".stripMargin
  }

  /** Mirror of [[graft.operators.Sketches.cmsInnerProduct]] over the
    * view/purchase frequency vectors: same seeded register hash as the
    * heavy-hitters oracle, exact integer dot products, min over depth. */
  private def joinSizeCmsOracle: String = {
    val vBucket = dh("CAST(cj.j AS VARCHAR) || ':' || CAST(e.user_id AS VARCHAR)")
    s"""WITH cj AS (SELECT CAST(UNNEST(range(0, $CmsDepth)) AS INTEGER) AS j),
       |jva AS (SELECT cj.j AS j, $vBucket % $CmsWidth AS bucket,
       |               CAST(count(*) AS BIGINT) AS n
       |        FROM events e CROSS JOIN cj
       |        WHERE e.user_id IS NOT NULL AND e.event_type = 'view'
       |        GROUP BY 1, 2),
       |jvb AS (SELECT cj.j AS j, $vBucket % $CmsWidth AS bucket,
       |               CAST(count(*) AS BIGINT) AS n
       |        FROM events e CROSS JOIN cj
       |        WHERE e.user_id IS NOT NULL AND e.event_type = 'purchase'
       |        GROUP BY 1, 2),
       |jdots AS (SELECT a.j, CAST(sum(a.n * b.n) AS BIGINT) AS dot
       |          FROM jva a JOIN jvb b ON a.j = b.j AND a.bucket = b.bucket
       |          GROUP BY 1),
       |jest AS (SELECT CAST(min(dot) AS BIGINT) AS n_est FROM jdots),
       |jex AS (SELECT COALESCE(CAST(sum(av.n * bv.n) AS BIGINT), 0) AS n_exact
       |        FROM (SELECT user_id, count(*) AS n FROM events
       |              WHERE user_id IS NOT NULL AND event_type = 'view'
       |              GROUP BY 1) av
       |        JOIN (SELECT user_id, count(*) AS n FROM events
       |              WHERE user_id IS NOT NULL AND event_type = 'purchase'
       |              GROUP BY 1) bv
       |          ON av.user_id = bv.user_id)
       |SELECT jex.n_exact, jest.n_est,
       |       jest.n_est - jex.n_exact AS overcount
       |FROM jex, jest""".stripMargin
  }

  /** Portable-HLL estimate vs exact distinct — mirror of
    * [[graft.operators.Sketches.portableDistinctEstimate]]: same bucket
    * split of the 60-bit portable hash, same threshold-cascade rank, same
    * integer shift register sum, and the SAME numeric literal
    * α_m·m²·2⁵³ in the one double division. */
  private def approxDistinctOracle: String = {
    val p = HllP
    val m = 1 << p
    val tailBits = 60 - p
    val c = graft.operators.Sketches.alphaConstant(m)
    val rankCase = (tailBits - 1 to 0 by -1)
      .map(k => s"WHEN r >= ${1L << k} THEN ${tailBits - k}")
      .mkString(" ")
    s"""WITH h AS (SELECT ${dh("CAST(event_id AS VARCHAR)")} AS h FROM events),
       |b AS (SELECT h // ${1L << tailBits} AS bucket, h % ${1L << tailBits} AS r FROM h),
       |rk AS (SELECT bucket, CASE $rankCase ELSE ${tailBits + 1} END AS rank FROM b),
       |regs AS (SELECT bucket, max(rank) AS mr FROM rk GROUP BY bucket),
       |s AS (SELECT
       |        CAST(sum(CAST(1 AS BIGINT) << CAST(53 - mr AS INTEGER)) AS BIGINT) AS s_present,
       |        CAST(count(*) AS BIGINT) AS nb
       |      FROM regs),
       |est AS (SELECT CAST(floor($c /
       |          (s_present + ($m - nb) * (CAST(1 AS BIGINT) << 53)) + 0.5) AS BIGINT) AS n_est
       |        FROM s),
       |ex AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact FROM events)
       |SELECT n_est, n_exact,
       |  CAST(floor(CAST(abs(n_est - n_exact) AS DOUBLE) * 1000000.0 / n_exact + 0.5)
       |       AS BIGINT) AS err_e6
       |FROM est, ex""".stripMargin
  }

  /** Bradley-Terry MM fixpoint unrolled as SQL CTEs — one (t, r, it)
    * block per iteration, every state e6-quantized int64 exactly as
    * [[graft.operators.Preference.bradleyTerry]] computes it (truncating
    * division both engines, ≥1 clamps in the same places), so the fitted
    * model hash-matches. */
  private def btScoresOracle(iterations: Int): String = {
    val head =
      s"""WITH tr AS (
         |  SELECT event_type,
         |         lead(event_type) OVER (PARTITION BY user_id
         |           ORDER BY ts ASC, event_id ASC) AS next_type
         |  FROM events),
         |w AS (SELECT next_type AS wi, event_type AS li, CAST(count(*) AS BIGINT) AS n
         |      FROM tr WHERE next_type IS NOT NULL AND next_type <> event_type
         |      GROUP BY 1, 2),
         |items AS (SELECT DISTINCT wi AS item FROM w
         |          UNION SELECT DISTINCT li AS item FROM w),
         |ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM items),
         |winsum AS (SELECT wi AS item, CAST(sum(n) AS BIGINT) AS wn FROM w GROUP BY 1),
         |und AS (SELECT i, j, CAST(sum(n) AS BIGINT) AS nij FROM (
         |          SELECT wi AS i, li AS j, n FROM w
         |          UNION ALL SELECT li AS i, wi AS j, n FROM w)
         |        GROUP BY i, j),
         |it0 AS (SELECT item, CAST(1000000 AS BIGINT) AS s_e6 FROM items)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s"""t$k AS (SELECT u.i AS item,
         |  CAST(sum(u.nij * 1000000000000 // greatest(si.s_e6 + sj.s_e6, 1)) AS BIGINT) AS den
         |  FROM und u JOIN it${k - 1} si ON u.i = si.item
         |             JOIN it${k - 1} sj ON u.j = sj.item
         |  GROUP BY u.i),
         |r$k AS (SELECT i.item,
         |  CASE WHEN COALESCE(t.den, 0) <= 0 THEN 0
         |       ELSE COALESCE(ws.wn, 0) * 1000000000000 // t.den END AS s_raw
         |  FROM items i LEFT JOIN t$k t ON i.item = t.item
         |               LEFT JOIN winsum ws ON i.item = ws.item),
         |it$k AS (SELECT r.item,
         |  greatest(r.s_raw * (SELECT n_items FROM ni) * 1000000
         |           // greatest((SELECT CAST(sum(s_raw) AS BIGINT) FROM r$k), 1), 1) AS s_e6
         |  FROM r$k r)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iters
       |SELECT i.item, COALESCE(ws.wn, 0) AS wins, s.s_e6 AS score_e6
       |FROM items i JOIN it$iterations s ON i.item = s.item
       |             LEFT JOIN winsum ws ON i.item = ws.item""".stripMargin
  }

  /** Mutual-best ratio-margin mining over the two corpus halves; every
    * step integer-exact after the rounded-6 cosine → e6 quantization, the
    * margin one truncating int64 division (both engines truncate toward
    * zero). Candidates per direction mirror the Spark side's
    * [[graft.operators.Similarity.lshTopKAgainst]] legs: the lsh_topk
    * hyperplane family buckets every vector, query-side rows carry the
    * Hamming-1 multi-probe expansion, and a directed candidate exists iff
    * the query's probe bucket matches the corpus vector's base bucket in
    * some table — exactly [[lshBucketCtes]], restricted by half parity. */
  private def marginAlignOracle: String =
    s"""WITH ${lshBucketCtes(LshBits, LshTables)}
       |candab AS (
       |  SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
       |  FROM probes p JOIN buckets c ON p.tbl = c.tbl AND p.bucket = c.bucket
       |  WHERE p.vec_id % 2 = 0 AND c.vec_id % 2 <> 0),
       |candba AS (
       |  SELECT DISTINCT p.vec_id AS id_b, c.vec_id AS id_a
       |  FROM probes p JOIN buckets c ON p.tbl = c.tbl AND p.bucket = c.bucket
       |  WHERE p.vec_id % 2 <> 0 AND c.vec_id % 2 = 0),
       |cand AS (SELECT id_a, id_b FROM candab UNION SELECT id_a, id_b FROM candba),
       |ad AS (
       |  SELECT cd.id_a, cd.id_b, sum(fa.x * fb.x) AS dp
       |  FROM cand cd JOIN flat fa ON fa.vec_id = cd.id_a
       |               JOIN flat fb ON fb.vec_id = cd.id_b AND fb.i = fa.i
       |  GROUP BY cd.id_a, cd.id_b),
       |sc AS (
       |  SELECT id_a, id_b,
       |         CAST(floor(round(dp / (na.nrm * nb.nrm), 6) * 1000000.0 + 0.5) AS BIGINT) AS sim_e6
       |  FROM ad JOIN norms na ON id_a = na.vec_id
       |          JOIN norms nb ON id_b = nb.vec_id
       |  WHERE na.nrm * nb.nrm <> 0),
       |abk AS (SELECT * FROM (
       |    SELECT s.id_a, s.id_b, s.sim_e6, row_number() OVER (PARTITION BY s.id_a
       |      ORDER BY s.sim_e6 DESC, s.id_b ASC) AS rn
       |    FROM sc s JOIN candab c ON s.id_a = c.id_a AND s.id_b = c.id_b) WHERE rn <= $AlignK),
       |bak AS (SELECT * FROM (
       |    SELECT s.id_a, s.id_b, s.sim_e6, row_number() OVER (PARTITION BY s.id_b
       |      ORDER BY s.sim_e6 DESC, s.id_a ASC) AS rn
       |    FROM sc s JOIN candba c ON s.id_a = c.id_a AND s.id_b = c.id_b) WHERE rn <= $AlignK),
       |ah AS (SELECT id_a, CAST(sum(sim_e6) AS BIGINT) AS sum_a_e6,
       |              CAST(count(sim_e6) AS BIGINT) AS n_a FROM abk GROUP BY 1),
       |bh AS (SELECT id_b, CAST(sum(sim_e6) AS BIGINT) AS sum_b_e6,
       |              CAST(count(sim_e6) AS BIGINT) AS n_b FROM bak GROUP BY 1),
       |best AS (
       |  SELECT ab.id_a, ab.id_b, ab.sim_e6 FROM abk ab
       |  JOIN bak ba ON ab.id_a = ba.id_a AND ab.id_b = ba.id_b
       |  WHERE ab.rn = 1 AND ba.rn = 1),
       |m AS (
       |  SELECT best.id_a, best.id_b, best.sim_e6,
       |         CAST((2 * best.sim_e6 * n_a * n_b * 1000000)
       |              // (sum_a_e6 * n_b + sum_b_e6 * n_a) AS BIGINT) AS margin_e6
       |  FROM best JOIN ah ON best.id_a = ah.id_a
       |            JOIN bh ON best.id_b = bh.id_b
       |  WHERE sum_a_e6 * n_b + sum_b_e6 * n_a > 0)
       |SELECT id_a, id_b, sim_e6, margin_e6 FROM m
       |WHERE margin_e6 >= $AlignMinMarginE6""".stripMargin

  /** 2-core peel unrolled to exactly [[KcoreMaxRounds]] rounds — the SAME
    * constant that caps the Spark loop, so the two sides agree at any
    * convergence speed (see the registered query's scaladoc). Each round
    * past the fixpoint is a no-op on both engines. */
  private def dupGraphKcoreOracle: String = {
    val head =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |e0 AS MATERIALIZED (SELECT id_a, id_b FROM (
        |         SELECT i.id_a, i.id_b,
        |           round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
        |             AS jaccard
        |         FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
        |                      JOIN sizes sb ON i.id_b = sb.doc_id)
        |       WHERE jaccard >= 0.2)""".stripMargin
    val rounds = (1 to KcoreMaxRounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT id FROM (SELECT id, count(*) AS d FROM
         |         (SELECT id_a AS id FROM e${r - 1} UNION ALL SELECT id_b FROM e${r - 1})
         |         GROUP BY 1) WHERE d >= 2),
         |e$r AS MATERIALIZED (SELECT id_a, id_b FROM e${r - 1} WHERE id_a IN (SELECT id FROM k$r)
         |                                   AND id_b IN (SELECT id FROM k$r))""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rounds
       |SELECT id, CAST(count(*) AS BIGINT) AS core_degree FROM
       |  (SELECT id_a AS id FROM e$KcoreMaxRounds UNION ALL SELECT id_b AS id FROM e$KcoreMaxRounds)
       |GROUP BY id""".stripMargin
  }

  private def nearDupLshOracle: String =
    s"""WITH ${lshBucketCtes(NdBits, NdTables)}
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
       |  FROM probes p JOIN buckets c
       |    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id < c.vec_id),
       |${pairScoreCtes("id_a", "id_b")}
       |SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= $NdThreshold""".stripMargin

  /** Shared covariance CTE chain for the [[graft.operators.GramPca]]
    * oracles: e3-quantized elements, exact integer moments, centered
    * covariance in HUGEINT with `//` (truncates toward zero — verified
    * equal to Scala `BigInt./` on negatives). MATERIALIZED because the
    * power-iteration oracle references it from every unrolled round. */
  /** Shared derivation for `export_shards` / `shard_balance`: global
    * token-count rank (two-phase [[graft.operators.GlobalIndex]] — the
    * scalable form, never a single-task window) + the snake assignment.
    * Nonnegative ranks make `div`/`%` portable verbatim. */
  private def shardAssignFor(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val ranked = graft.operators.GlobalIndex.withGlobalIndex(docs, "__rn",
      col("n_tok").desc, col("doc_id").asc)
    val pos = pmod(col("__rn"), lit(ShardK.toLong))
    val shard = when(expr(s"(__rn div $ShardK) % 2 = 0"), pos)
      .otherwise(lit(ShardK.toLong - 1) - pos)
    ranked.select(col("doc_id"), col("n_tok"), shard.cast("int").as("shard"))
  }

  private def embeddingCovCtes: String = embeddingCovCtesFrom("embeddings")

  private def embeddingCovCtesFrom(src: String): String =
    s"""q AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
      |            CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
      |     FROM $src),
      |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM $src),
      |s AS (SELECT pos, CAST(sum(q) AS HUGEINT) AS s FROM q GROUP BY 1),
      |p AS (SELECT a.pos AS i, b.pos AS j, CAST(sum(a.q * b.q) AS HUGEINT) AS p
      |      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.pos <= b.pos GROUP BY 1, 2),
      |cov AS MATERIALIZED (SELECT p.i, p.j,
      |        CAST((nn.n * p.p - sa.s * sb.s) // (nn.n * nn.n) AS BIGINT) AS cov_q
      |        FROM p CROSS JOIN nn
      |        JOIN s sa ON p.i = sa.pos JOIN s sb ON p.j = sb.pos)""".stripMargin

  /** [[embeddingCovCtes]] + the unrolled mirror of
    * [[graft.operators.GramPca.powerIterate]]: each round is one matvec
    * over the symmetric covariance + the truncating e6 renormalization,
    * bit-identical to the driver-side int64 loop. Ends at CTE
    * `v$PcRounds` (pos, v). */
  private def embeddingPcChainCtes: String = {
    val rounds = (1 to PcRounds).map { r =>
      s"""w$r AS (SELECT c.i AS pos, CAST(sum(c.cov_q * v.v) AS BIGINT) AS w
         |       FROM covf c JOIN v${r - 1} v ON c.j = v.pos GROUP BY 1),
         |m$r AS (SELECT greatest(CAST(max(abs(w)) // 1000000 AS BIGINT),
         |                        CAST(1 AS BIGINT)) AS m FROM w$r),
         |v$r AS MATERIALIZED (SELECT pos, CAST(w // m AS BIGINT) AS v
         |                     FROM w$r CROSS JOIN m$r)""".stripMargin
    }.mkString(",\n")
    s"""$embeddingCovCtes,
       |covf AS MATERIALIZED (SELECT i, j, cov_q FROM cov
       |         UNION ALL SELECT j, i, cov_q FROM cov WHERE i < j),
       |v0 AS (SELECT DISTINCT i AS pos, CAST(1000000 AS BIGINT) AS v FROM cov),
       |$rounds""".stripMargin
  }

  private def embeddingTopPcOracle: String =
    s"""WITH $embeddingPcChainCtes
       |SELECT v$PcRounds.pos AS pos, d.cov_q AS var_q, v$PcRounds.v AS pc_scaled
       |FROM v$PcRounds JOIN (SELECT i AS pos, cov_q FROM cov WHERE i = j) d
       |     ON v$PcRounds.pos = d.pos""".stripMargin

  /** Mirror of [[graft.operators.GramPca.topPc2]]: the v$PcRounds chain,
    * then Hotelling deflation with every >64-bit term in HUGEINT (vᵀCv ≈
    * 10²⁰), one `//` truncation per entry — bit-identical to the BigInt
    * driver-side math — and a second unrolled iteration over c2f. */
  private def embeddingPc2Oracle: String = {
    val rounds2 = (1 to PcRounds).map { r =>
      s"""x$r AS (SELECT c.i AS pos, CAST(sum(c.c2 * v.v) AS BIGINT) AS w
         |       FROM c2f c JOIN u${r - 1} v ON c.j = v.pos GROUP BY 1),
         |y$r AS (SELECT greatest(CAST(max(abs(w)) // 1000000 AS BIGINT),
         |                        CAST(1 AS BIGINT)) AS m FROM x$r),
         |u$r AS MATERIALIZED (SELECT pos, CAST(w // m AS BIGINT) AS v
         |                     FROM x$r CROSS JOIN y$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $embeddingPcChainCtes,
       |wv AS (SELECT c.i AS pos,
       |         CAST(sum(CAST(c.cov_q AS HUGEINT) * v.v) AS HUGEINT) AS w
       |       FROM covf c JOIN v$PcRounds v ON c.j = v.pos GROUP BY 1),
       |lam AS (SELECT CAST(sum(w.w * CAST(v.v AS HUGEINT)) AS HUGEINT) AS lam
       |        FROM wv w JOIN v$PcRounds v ON w.pos = v.pos),
       |vtv AS (SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS vtv
       |        FROM v$PcRounds),
       |c2f AS MATERIALIZED (
       |  SELECT c.i, c.j,
       |    CAST(c.cov_q - (lam.lam * va.v * vb.v) // (vtv.vtv * vtv.vtv)
       |         AS BIGINT) AS c2
       |  FROM covf c CROSS JOIN lam CROSS JOIN vtv
       |  JOIN v$PcRounds va ON c.i = va.pos
       |  JOIN v$PcRounds vb ON c.j = vb.pos),
       |u0 AS (SELECT DISTINCT i AS pos, CAST(1000000 AS BIGINT) AS v FROM cov),
       |$rounds2
       |SELECT u$PcRounds.pos AS pos, u$PcRounds.v AS pc2_scaled
       |FROM u$PcRounds""".stripMargin
  }

  /** Mirror of [[graft.operators.GramPca.pcScores]]: the same chain, then
    * the centered dot product per vector — center c = Σq // n (truncation
    * toward zero on both engines). */
  private def embeddingPcScoresOracle: String =
    s"""WITH $embeddingPcChainCtes,
       |center AS (SELECT s.pos, CAST(s.s // nn.n AS BIGINT) AS c
       |           FROM s CROSS JOIN nn)
       |SELECT f.vec_id, CAST(sum((f.q - c.c) * v.v) AS BIGINT) AS score_q
       |FROM q f JOIN center c ON f.pos = c.pos
       |         JOIN v$PcRounds v ON f.pos = v.pos
       |GROUP BY 1""".stripMargin

  /** Mirror of [[graft.operators.Quantize.randomProject]]: the ±1
    * directions enter as a literal VALUES relation generated from the
    * SAME splitmix Rademacher source, and every sum is e6-integer-exact,
    * so the JL audit hash-matches bit-for-bit. */
  private def rpAuditOracle: String = {
    val values = (0 until RpK).flatMap { i =>
      graft.operators.Similarity.rademacher(1000 + i, Dim).zipWithIndex.map {
        case (v, j) => s"($i,${j + 1},${v.toInt})"
      }
    }.mkString(",")
    s"""WITH rph(i, j, h) AS (VALUES $values),
       |rpflat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS j,
       |                  CAST(floor(CAST(UNNEST(embedding) AS DOUBLE)
       |                             * 1000000.0 + 0.5) AS BIGINT) AS xe6
       |           FROM embeddings),
       |rpn AS (SELECT vec_id, CAST(sum(xe6 * xe6) AS BIGINT) AS norm_sq_e12
       |        FROM rpflat GROUP BY 1),
       |rpp AS (SELECT f.vec_id, d.i, CAST(sum(f.xe6 * d.h) AS BIGINT) AS p
       |        FROM rpflat f JOIN rph d ON f.j = d.j
       |        GROUP BY 1, 2),
       |rpe AS (SELECT vec_id, CAST(sum(p * p) // $RpK AS BIGINT) AS est_sq_e12
       |        FROM rpp GROUP BY 1)
       |SELECT n.vec_id, n.norm_sq_e12, e.est_sq_e12,
       |  CASE WHEN n.norm_sq_e12 > 0
       |       THEN CAST(floor(e.est_sq_e12 * 1.0 / n.norm_sq_e12
       |                       * 1000000.0 + 0.5) AS BIGINT)
       |  END AS ratio_e6
       |FROM rpn n JOIN rpe e ON n.vec_id = e.vec_id""".stripMargin
  }

  /** Unrolled-iteration mirror of [[graft.operators.PageRank.runExactE6]]
    * over the event-type transition graph: every share, dangling split
    * and damped update is the same e6-integer floor division (`//` ==
    * Spark `div` on non-negatives), so three power iterations reproduce
    * bit-for-bit. */
  /** DuckDB mirror of `dup_graph_lpa`: the exact 3-gram Jaccard ≥ 0.2
    * edge set (same prefix as the other dup_graph oracles), then 3
    * unrolled synchronous min-label rounds — round r folds
    * least(own, min over neighbors of round r−1), i.e. min doc_id within
    * r hops, exactly the bounded-round plan the Spark side runs. */
  private def dupGraphLpaOracle: String = {
    def round(r: Int): String =
      s"""l$r AS MATERIALIZED (
         |  SELECT l.id, min(least(l.lbl, coalesce(x.lbl, l.lbl))) AS lbl
         |  FROM l${r - 1} l
         |  LEFT JOIN sym s ON s.id_a = l.id
         |  LEFT JOIN l${r - 1} x ON x.id = s.id_b
         |  GROUP BY l.id)""".stripMargin
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
      |  FROM toks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |e0 AS MATERIALIZED (SELECT id_a, id_b FROM (
      |         SELECT i.id_a, i.id_b,
      |           round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
      |             AS jaccard
      |         FROM inter i JOIN sizes sa ON i.id_a = sa.doc_id
      |                      JOIN sizes sb ON i.id_b = sb.doc_id)
      |       WHERE jaccard >= 0.2),
      |sym AS MATERIALIZED (
      |  SELECT id_a, id_b FROM e0
      |  UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM e0),
      |l0 AS (SELECT DISTINCT id_a AS id, id_a AS lbl FROM sym),
      |""".stripMargin +
      (1 to 3).map(round).mkString(",\n") +
      "\nSELECT id AS doc_id, lbl AS community FROM l3"
  }

  private def pageRankE6Oracle: String = {
    val damp = 850000L
    def iter(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (SELECT e.dst AS id, CAST(sum(r.r // d.od) AS BIGINT) AS m
         |        FROM pe e JOIN $prev r ON e.src = r.id
         |                  JOIN pod d ON e.src = d.src
         |        GROUP BY 1),
         |dg$i AS (SELECT COALESCE(CAST(sum(r.r) AS BIGINT), 0) AS dm
         |         FROM $prev r LEFT JOIN pod d ON r.id = d.src
         |         WHERE d.src IS NULL),
         |r$i AS (SELECT v.id,
         |          CAST((1000000 - $damp) // pn.nv +
         |               ($damp * (COALESCE(c.m, 0) + dg$i.dm // pn.nv)) // 1000000
         |               AS BIGINT) AS r
         |        FROM pv v LEFT JOIN c$i c ON v.id = c.id, pn, dg$i)"""
    }
    s"""WITH pre AS (
       |  SELECT user_id, event_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts ASC, event_id ASC) AS nt
       |  FROM events),
       |pe AS (SELECT DISTINCT event_type AS src, nt AS dst
       |       FROM pre WHERE nt IS NOT NULL),
       |pv AS (SELECT src AS id FROM pe UNION SELECT dst FROM pe),
       |pn AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM pv),
       |pod AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM pe GROUP BY 1),
       |r0 AS (SELECT id, CAST(1000000 // pn.nv AS BIGINT) AS r FROM pv, pn),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id AS event_type, r AS rank_e6 FROM r3""".stripMargin
  }

  /** Mirror of [[graft.operators.PageRank.runPersonalizedE6]] over the
    * brand co-purchase graph: the same unrolled-iteration shape as
    * [[pageRankE6Oracle]], with teleport AND dangling mass restarting at
    * the seed (nS = 1) instead of spread uniformly. */
  /** Mirror of `Text.qualityScoreRaw` — shared by `doc_quality` and the
    * `filter_overlap_venn` flag composition. */
  /** Mirror of `Text.langId` — the per-language stopword argmax with the
    * array_min tie order (und, then de < en < es < fr < zh). Shared by
    * `doc_lang` and (via composition) `annotator_kappa`. */
  private def docLangOracle: String =
    """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
      |s AS (SELECT doc_id,
      |  len(list_intersect(ws, ['the','a','and','of','to','in','is','it','that','for','with','this'])) AS s_en,
      |  len(list_intersect(ws, ['le','la','les','de','et','un','une','est','que','pour','dans','des'])) AS s_fr,
      |  len(list_intersect(ws, ['el','la','los','las','de','y','un','una','es','que','por','para'])) AS s_es,
      |  len(list_intersect(ws, ['der','die','das','und','ein','eine','ist','von','zu','mit','den','nicht'])) AS s_de,
      |  len(list_intersect(ws, ['的','了','是','我','不','在','有','他','这','人','们','中'])) AS s_zh
      |  FROM t)
      |SELECT doc_id, CASE
      |  WHEN greatest(s_en, s_fr, s_es, s_de, s_zh) = 0 THEN 'und'
      |  WHEN s_de = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'de'
      |  WHEN s_en = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'en'
      |  WHEN s_es = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'es'
      |  WHEN s_fr = greatest(s_en, s_fr, s_es, s_de, s_zh) THEN 'fr'
      |  ELSE 'zh' END AS lang_pred
      |FROM s""".stripMargin

  private def docQualityOracle: String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS ws,
      |         CAST(length(text) AS DOUBLE) AS nchars
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, nchars, ws,
      |         CAST(len(ws) AS DOUBLE) AS ntok,
      |         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha
      |  FROM t)
      |SELECT doc_id,
      |  CAST(CASE WHEN nchars = 0 THEN 0 ELSE floor((
      |    least(ntok / 100.0, 1.0) * 0.3
      |    + (alpha / nchars) * 0.3
      |    + (CASE WHEN (nchars - (ntok - 1)) / ntok BETWEEN 2.0 AND 12.0
      |            THEN 1.0 ELSE 0.3 END) * 0.2
      |    + (CASE WHEN len(list_intersect(ws,
      |         ['the','a','an','and','of','to','in','is','it','that'])) > 0
      |            THEN 1.0 ELSE 0.5 END)* 0.2) * 1000000.0 + 0.5) END AS BIGINT) AS quality_e6
      |FROM s""".stripMargin

  /** Mirror of `Text.repetitionFromTokens` (2- and 3-gram) — shared by
    * `doc_repetition` and `filter_overlap_venn`. */
  private def docRepetitionOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g2 AS (SELECT doc_id, count(DISTINCT array_to_string(ws[i:i+1], ' ')) AS d,
      |              any_value(len(ws)) - 1 AS tot
      |       FROM t, UNNEST(range(1, len(ws))) AS r(i) WHERE len(ws) >= 2
      |       GROUP BY doc_id),
      |g3 AS (SELECT doc_id, count(DISTINCT array_to_string(ws[i:i+2], ' ')) AS d,
      |              any_value(len(ws)) - 2 AS tot
      |       FROM t, UNNEST(range(1, len(ws) - 1)) AS r(i) WHERE len(ws) >= 3
      |       GROUP BY doc_id)
      |SELECT t.doc_id,
      |  CAST(floor(COALESCE((g2.tot - g2.d) * 1.0 / g2.tot, 0.0)
      |             * 1000000.0 + 0.5) AS BIGINT) AS rep2_e6,
      |  CAST(floor(COALESCE((g3.tot - g3.d) * 1.0 / g3.tot, 0.0)
      |             * 1000000.0 + 0.5) AS BIGINT) AS rep3_e6
      |FROM t LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)""".stripMargin

  /** Connected components over the 3-gram Jaccard dup graph — shared by
    * `dedup_clusters` (raw assignments) and `dup_cluster_sizes`
    * (size histogram wrapping it as a derived table). */
  private def dedupClustersOracle: String =
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
      |  SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.id)
      |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin

  private def pprBrandOracle: String = {
    val damp = 850000L
    def iter(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (SELECT e.dst AS id, CAST(sum(r.r // d.od) AS BIGINT) AS m
         |        FROM pe e JOIN $prev r ON e.src = r.id
         |                  JOIN pod d ON e.src = d.src
         |        GROUP BY 1),
         |dg$i AS (SELECT COALESCE(CAST(sum(r.r) AS BIGINT), 0) AS dm
         |         FROM $prev r LEFT JOIN pod d ON r.id = d.src
         |         WHERE d.src IS NULL),
         |r$i AS (SELECT v.id, v.s,
         |          CAST(v.s * ((1000000 - $damp) // 1) +
         |               ($damp * (COALESCE(c.m, 0) + v.s * (dg$i.dm // 1)))
         |               // 1000000 AS BIGINT) AS r
         |        FROM pvs v LEFT JOIN c$i c ON v.id = c.id, dg$i)"""
    }
    s"""WITH ob AS (
       |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
       |  FROM lineitem JOIN part ON l_partkey = p_partkey),
       |pe AS (SELECT DISTINCT x.brand AS src, y.brand AS dst
       |       FROM ob x JOIN ob y ON x.okey = y.okey AND x.brand <> y.brand),
       |pv AS (SELECT src AS id FROM pe UNION SELECT dst FROM pe
       |       UNION SELECT '$PprSeed'),
       |pvs AS (SELECT id, CASE WHEN id = '$PprSeed' THEN 1 ELSE 0 END AS s
       |        FROM pv),
       |pod AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM pe GROUP BY 1),
       |r0 AS (SELECT id, s, CAST(s * (1000000 // 1) AS BIGINT) AS r FROM pvs),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT id AS brand, r AS rank_e6 FROM r$PprIters""".stripMargin
  }

  /** Triangle counts over the simhash_pairs edge set (the generated
    * [[simHashOracle]] as a derived table, the minhash_accuracy wrapping
    * pattern); triangles enumerated canonically (a<b<c) — the triangle
    * SET is orientation-independent, so this matches the engine's
    * degree-ordered enumeration row-for-row. */
  private def dupTrianglesOracle: String =
    s"""WITH sp AS (SELECT id_a, id_b FROM ($simHashOracle)),
       |e AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |      FROM sp WHERE id_a <> id_b),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
       |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
       |tnodes AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
       |           UNION ALL SELECT z FROM tri)
       |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM tnodes GROUP BY 1""".stripMargin

  /** Canonical undirected edge set of the simhash near-dup graph — the
    * shared derived table under the triangle / clustering-coefficient /
    * link-prediction oracles. */
  private def dupEdgesCte: String =
    s"""sp AS (SELECT id_a, id_b FROM ($simHashOracle)),
       |e AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
       |      FROM sp WHERE id_a <> id_b)""".stripMargin

  /** Mirror of [[SparkEntry.queries]] `dup_graph_clustering_coeff`:
    * degree + canonical triangle counts over [[dupEdgesCte]], coefficient
    * as the exact HUGEINT-staged e6 rational. */
  private def clusteringCoeffOracle: String =
    s"""WITH $dupEdgesCte,
       |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
       |          SELECT a AS id FROM e UNION ALL SELECT b FROM e)
       |        GROUP BY 1),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
       |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
       |tcnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
       |           SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
       |           UNION ALL SELECT z FROM tri)
       |         GROUP BY 1)
       |SELECT deg.id AS doc_id, degree,
       |       CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
       |       CAST(CAST(COALESCE(n_triangles, 0) AS HUGEINT) * 2000000
       |            // (CAST(degree AS HUGEINT) * (degree - 1)) AS BIGINT)
       |         AS clustering_e6
       |FROM deg LEFT JOIN tcnt ON deg.id = tcnt.id
       |WHERE degree >= 2""".stripMargin

  /** Mirror of `dup_graph_harmonic`: radius-3 shells over [[dupEdgesCte]]
    * with the same HarmonicCapD smallest-id expansion cap and NOT-EXISTS
    * dedup so every pair lands at its earliest capped distance. */
  private def harmonicOracle: String =
    s"""WITH $dupEdgesCte,
       |hadj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |hcap AS (SELECT u, v FROM (
       |           SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rn
       |           FROM hadj) WHERE rn <= $HarmonicCapD),
       |h1 AS (SELECT DISTINCT u, v FROM hadj),
       |h2 AS (SELECT DISTINCT a.u, b.v
       |       FROM h1 a JOIN hcap b ON b.u = a.v
       |       WHERE b.v <> a.u
       |         AND NOT EXISTS (SELECT 1 FROM h1 x WHERE x.u = a.u AND x.v = b.v)),
       |h3 AS (SELECT DISTINCT a.u, b.v
       |       FROM h2 a JOIN hcap b ON b.u = a.v
       |       WHERE b.v <> a.u
       |         AND NOT EXISTS (SELECT 1 FROM h1 x WHERE x.u = a.u AND x.v = b.v)
       |         AND NOT EXISTS (SELECT 1 FROM h2 x WHERE x.u = a.u AND x.v = b.v)),
       |hd AS (SELECT u, v, 1 AS d FROM h1
       |       UNION ALL SELECT u, v, 2 FROM h2
       |       UNION ALL SELECT u, v, 3 FROM h3)
       |SELECT u AS doc_id,
       |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
       |  CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2,
       |  CAST(sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_d3,
       |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) * 1000000
       |     + sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) * 500000
       |     + sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) * 333333 AS BIGINT) AS harmonic_e6
       |FROM hd GROUP BY 1""".stripMargin

  /** Mirror of `dup_link_prediction`: capped-center wedge counting minus
    * existing edges, deterministic top-k. */
  private def linkPredictionOracle: String =
    s"""WITH $dupEdgesCte,
       |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT u, count(*) AS d FROM adj GROUP BY 1),
       |nb AS (SELECT adj.u, adj.v FROM adj JOIN deg USING (u)
       |       WHERE d <= $LpDegCap),
       |sc AS (SELECT n1.v AS v, n2.v AS w, CAST(count(*) AS BIGINT) AS n_common
       |       FROM nb n1 JOIN nb n2 ON n1.u = n2.u AND n1.v < n2.v
       |       GROUP BY 1, 2),
       |np AS (SELECT v, w, n_common FROM sc
       |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE a = sc.v AND b = sc.w))
       |SELECT v AS doc_a, w AS doc_b, n_common
       |FROM np ORDER BY n_common DESC, doc_a, doc_b LIMIT $LpTopK""".stripMargin

  /** Banded-Jaccard canonical pair set (threshold 0.2) — the shared
    * derived table under the crosstab / Fellegi-Sunter oracles; mirrors
    * the inline `jaccard_pairs` oracle. */
  private def jaccardPairsCte: String =
    """jtoks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |jgrams AS (
      |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
      |  FROM jtoks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
      |jsizes AS (SELECT doc_id, count(*) AS n FROM jgrams GROUP BY doc_id),
      |jinter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM jgrams a JOIN jgrams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id),
      |jp AS (
      |  SELECT i.id_a, i.id_b
      |  FROM jinter i JOIN jsizes sa ON i.id_a = sa.doc_id
      |                JOIN jsizes sb ON i.id_b = sb.doc_id
      |  WHERE round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6)
      |          >= 0.2)""".stripMargin

  private def dupSourceCrosstabOracle: String =
    s"""WITH $jaccardPairsCte
       |SELECT least(sa.source, sb.source) AS source_a,
       |       greatest(sa.source, sb.source) AS source_b,
       |       CAST(count(*) AS BIGINT) AS n_pairs
       |FROM jp JOIN documents sa ON jp.id_a = sa.doc_id
       |        JOIN documents sb ON jp.id_b = sb.doc_id
       |GROUP BY 1, 2""".stripMargin

  /** Mirror of `er_field_weights`: m from the Jaccard match pairs, u from
    * SNM candidates minus matches, exact e6 rationals throughout. */
  private def erFieldWeightsOracle: String =
    s"""WITH $jaccardPairsCte,
       |snmk AS (
       |  SELECT doc_id, row_number() OVER (
       |           ORDER BY substr(coalesce(lower(text), ''), 1, $SnmKeyLen),
       |                    doc_id) AS rn
       |  FROM documents),
       |cand AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
       |                greatest(a.doc_id, b.doc_id) AS id_b
       |         FROM snmk a JOIN snmk b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow),
       |u AS (SELECT id_a, id_b FROM cand
       |      WHERE NOT EXISTS (SELECT 1 FROM jp
       |                        WHERE jp.id_a = cand.id_a AND jp.id_b = cand.id_b)),
       |att AS (SELECT doc_id, lang, source,
       |               CAST(n_chars AS BIGINT) // 100 AS len_band
       |        FROM documents),
       |ma AS (SELECT CAST(count(*) AS BIGINT) AS m_total,
       |         CAST(count(CASE WHEN a.lang = b.lang THEN 1 END) AS BIGINT) AS m_lang,
       |         CAST(count(CASE WHEN a.source = b.source THEN 1 END) AS BIGINT) AS m_src,
       |         CAST(count(CASE WHEN a.len_band = b.len_band THEN 1 END) AS BIGINT) AS m_len
       |       FROM jp JOIN att a ON jp.id_a = a.doc_id
       |               JOIN att b ON jp.id_b = b.doc_id),
       |ua AS (SELECT CAST(count(*) AS BIGINT) AS u_total,
       |         CAST(count(CASE WHEN a.lang = b.lang THEN 1 END) AS BIGINT) AS u_lang,
       |         CAST(count(CASE WHEN a.source = b.source THEN 1 END) AS BIGINT) AS u_src,
       |         CAST(count(CASE WHEN a.len_band = b.len_band THEN 1 END) AS BIGINT) AS u_len
       |       FROM u JOIN att a ON u.id_a = a.doc_id
       |              JOIN att b ON u.id_b = b.doc_id),
       |rows_ AS (
       |  SELECT 'lang' AS field, m_lang AS m_agree, m_total, u_lang AS u_agree,
       |         u_total FROM ma, ua
       |  UNION ALL
       |  SELECT 'source', m_src, m_total, u_src, u_total FROM ma, ua
       |  UNION ALL
       |  SELECT 'len_band', m_len, m_total, u_len, u_total FROM ma, ua)
       |SELECT field, m_agree, m_total, u_agree, u_total,
       |  CAST(m_agree * 1000000 // nullif(m_total, 0) AS BIGINT) AS m_e6,
       |  CAST(u_agree * 1000000 // nullif(u_total, 0) AS BIGINT) AS u_e6,
       |  CAST((m_agree * 1000000 // nullif(m_total, 0)) * 1000000
       |       // nullif(u_agree * 1000000 // nullif(u_total, 0), 0) AS BIGINT)
       |    AS weight_ratio_e6
       |FROM rows_""".stripMargin

  /** Mirror of `daily_acf`: scaled-residual integer autocorrelation over
    * the calendar-bounded daily revenue series. */
  private def dailyAcfOracle: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(c) AS BIGINT) AS s_sum FROM daily),
      |y AS (SELECT t, CAST(c * n - s_sum AS HUGEINT) AS y FROM daily, st),
      |d2 AS (SELECT sum(y * y) AS d2 FROM y),
      |lags AS (SELECT UNNEST(range(1, 8)) AS lag),
      |num AS (SELECT lag, sum(y1.y * y2.y) AS num,
      |               CAST(count(*) AS BIGINT) AS n_pairs
      |        FROM lags CROSS JOIN y y1 JOIN y y2 ON y2.t = y1.t + lags.lag
      |        GROUP BY 1)
      |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
      |       CAST(num * 1000000 // nullif(d2.d2, 0) AS BIGINT) AS acf_e6
      |FROM num, d2""".stripMargin

  /** Mirror of `value_trimmed_mean`: grouped-rank partial-keep trim (the
    * oracle may use a plain cumulative window — DuckDB's single node IS
    * one task). */
  private def valueTrimmedMeanOracle: String =
    """WITH v AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
      |           FROM events WHERE value IS NOT NULL),
      |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      |c AS (SELECT *, CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) AS cum FROM g),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s_all FROM v),
      |j AS (SELECT c.*, t.n, t.s_all, t.n * 5 // 100 AS k FROM c, t),
      |kk AS (SELECT *, greatest(0, least(cum, n - k) - greatest(cum - cnt, k)) AS kept
      |       FROM j)
      |SELECT max(n) AS n, CAST(max(k) AS BIGINT) AS k_trim,
      |  min(CASE WHEN kept > 0 THEN cents END) AS lo_cents,
      |  max(CASE WHEN kept > 0 THEN cents END) AS hi_cents,
      |  CAST(CAST(sum(kept * cents) AS HUGEINT) * 1000000
      |       // nullif(max(n) - 2 * max(k), 0) AS BIGINT) AS trimmed_mean_e6,
      |  CAST(CAST(max(s_all) AS HUGEINT) * 1000000
      |       // nullif(max(n), 0) AS BIGINT) AS mean_e6
      |FROM kk""".stripMargin

  private def weekdayIndexOracle: String =
    """WITH b AS (
      |  SELECT (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) + 4) % 7
      |           AS dow,
      |         CAST(count(*) AS BIGINT) AS n_orders,
      |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_all,
      |             CAST(sum(cents) AS BIGINT) AS c_all FROM b)
      |SELECT dow, n_orders, cents,
      |  CAST(CAST(cents AS HUGEINT) * n_all * 1000000
      |       // (CAST(n_orders AS HUGEINT) * c_all) AS BIGINT) AS rev_index_e6
      |FROM b, t""".stripMargin

  /** Mirror of `dup_graph_assortativity` over [[dupEdgesCte]]. */
  private def assortativityOracle: String =
    s"""WITH $dupEdgesCte,
       |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
       |          SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
       |sym AS (SELECT ddx.d AS dx, ddy.d AS dy
       |        FROM (SELECT a AS x, b AS y FROM e
       |              UNION ALL SELECT b, a FROM e) s
       |        JOIN deg ddx ON s.x = ddx.id JOIN deg ddy ON s.y = ddy.id),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS m2, CAST(sum(dx) AS BIGINT) AS sx,
       |             CAST(sum(dx * dx) AS BIGINT) AS sxx,
       |             CAST(sum(dx * dy) AS BIGINT) AS sxy
       |      FROM sym)
       |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
       |  CAST((CAST(m2 AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sx) * 1000000
       |       // nullif(CAST(m2 AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx, 0)
       |       AS BIGINT) AS assortativity_e6
       |FROM m""".stripMargin

  private def supplierHhiOracle: String =
    """WITH bs AS (SELECT l_suppkey,
      |              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |                   AS BIGINT) AS cents
      |            FROM lineitem GROUP BY 1),
      |n AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      |             CAST(sum(cents) AS BIGINT) AS nation_cents,
      |             sum(CAST(cents AS HUGEINT) * cents) AS sq
      |      FROM bs JOIN supplier ON l_suppkey = s_suppkey
      |              JOIN nation ON s_nationkey = n_nationkey
      |      GROUP BY 1)
      |SELECT n_name, n_suppliers, nation_cents,
      |  CAST(sq * 1000000 // nullif(CAST(nation_cents AS HUGEINT) * nation_cents, 0)
      |       AS BIGINT) AS hhi_e6
      |FROM n""".stripMargin

  private def eventsBurstinessOracle: String =
    """WITH h AS (SELECT epoch_us(ts) // 1000000 // 3600 AS h,
      |                  CAST(count(*) AS BIGINT) AS c
      |           FROM events WHERE ts IS NOT NULL GROUP BY 1),
      |m AS (SELECT CAST(max(h) - min(h) + 1 AS BIGINT) AS n_hours,
      |             CAST(sum(c) AS BIGINT) AS n_events,
      |             sum(CAST(c AS HUGEINT) * c) AS sq
      |      FROM h)
      |SELECT n_hours, n_events,
      |  CAST((CAST(n_hours AS HUGEINT) * sq -
      |        CAST(n_events AS HUGEINT) * n_events) * 1000000
      |       // nullif(CAST(n_hours AS HUGEINT) * n_events, 0) AS BIGINT)
      |    AS fano_e6
      |FROM m""".stripMargin

  private def q21WaitingSuppliersOracle: String =
    """WITH pos AS (
      |  SELECT l_orderkey, l_suppkey,
      |         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |                  THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |po AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late_supp
      |       FROM pos GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM pos JOIN po USING (l_orderkey)
      |         JOIN supplier ON l_suppkey = s_suppkey
      |WHERE pos.late = 1 AND po.n_supp >= 2 AND po.n_late_supp = 1
      |GROUP BY 1, 2""".stripMargin

  private def abcClassificationOracle: String =
    """WITH bp AS (SELECT l_partkey,
      |              CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |                   AS BIGINT) AS cents
      |            FROM lineitem GROUP BY 1),
      |c AS (SELECT *, CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey)
      |                     AS BIGINT) AS cum_cents FROM bp),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM bp)
      |SELECT CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
      |            WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
      |            ELSE 'C' END AS abc_class,
      |       CAST(count(*) AS BIGINT) AS n_parts,
      |       CAST(sum(cents) AS BIGINT) AS class_cents,
      |       CAST(CAST(sum(cents) AS HUGEINT) * 1000000
      |            // nullif(max(total_cents), 0) AS BIGINT) AS rev_share_e6
      |FROM c, t GROUP BY 1""".stripMargin

  private def lorenzDecilesOracle: String =
    """WITH bc AS (SELECT o_custkey,
      |              CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |                   AS BIGINT) AS cents
      |            FROM orders GROUP BY 1),
      |r AS (SELECT *,
      |        CAST(sum(cents) OVER (ORDER BY cents ASC, o_custkey ASC)
      |             AS BIGINT) AS cum_cents,
      |        CAST(row_number() OVER (ORDER BY cents ASC, o_custkey ASC)
      |             AS BIGINT) AS rnk
      |      FROM bc),
      |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(cents) AS BIGINT) AS total FROM bc)
      |SELECT CAST((10 * rnk + n - 1) // n AS BIGINT) AS decile,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(CAST(max(cum_cents) AS HUGEINT) * 1000000
      |            // nullif(max(total), 0) AS BIGINT) AS cum_share_e6
      |FROM r, t GROUP BY 1""".stripMargin

  private def nullMatrixOracle: String =
    """SELECT coalesce(event_type, '__null__') AS event_type,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) AS null_user_id,
      |  CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT) AS null_value,
      |  CAST(count(CASE WHEN props IS NULL THEN 1 END) AS BIGINT) AS null_props,
      |  CAST(count(CASE WHEN ts IS NULL THEN 1 END) AS BIGINT) AS null_ts
      |FROM events GROUP BY 1""".stripMargin

  /** Mirror of `bounce_rate` on the shared `sessionize` definition. */
  private def bounceRateOracle: String =
    """WITH x AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id
      |                       ORDER BY ts ASC, event_id ASC) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM x),
      |z AS (
      |  SELECT user_id, event_id,
      |         sum(is_new) OVER (PARTITION BY user_id
      |                           ORDER BY ts ASC, event_id ASC
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM y),
      |sess AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS depth
      |         FROM z GROUP BY 1, 2)
      |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(count(CASE WHEN depth = 1 THEN 1 END) AS BIGINT) AS n_bounce,
      |  CAST(count(CASE WHEN depth = 1 THEN 1 END) * 1000000
      |       // nullif(count(*), 0) AS BIGINT) AS bounce_rate_e6,
      |  CAST(CAST(sum(depth) AS HUGEINT) * 1000000
      |       // nullif(count(*), 0) AS BIGINT) AS mean_depth_e6
      |FROM sess""".stripMargin

  /** DuckDB mirror of `poisson_bootstrap_ci`: the same md5-derived 60-bit
    * row hash, the same multiply-shift family member per resample (the
    * multipliers baked into a VALUES relation), the same frozen
    * inverse-CDF thresholds from [[PoisCumE60]], and floor division for
    * the e6 mean — bit-identical across engines. */
  private def poissonBootstrapOracle: String = {
    val mults = (0 until BootResamples)
      .map(b => s"($b,${graft.functions.PortableHash.multiplier(b)})").mkString(",")
    val u = graft.functions.PortableHash.duckdbFamilySql("h.h", "mm.m", "mm.b")
    s"""WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS eid,
       |                   CAST(round(value * 100) AS BIGINT) AS v FROM events),
       |h AS (SELECT ${dh("eid")} AS h, v FROM ev),
       |mm(b, m) AS (VALUES $mults),
       |u AS (SELECT mm.b AS resample, $u AS u, h.v FROM h CROSS JOIN mm),
       |w AS (SELECT resample, ${poisWeightSql("u")} AS w, v FROM u),
       |agg AS (SELECT resample,
       |               CAST(sum(CASE WHEN v IS NOT NULL THEN w END) AS BIGINT) AS n_rows,
       |               CAST(sum(CAST(w AS BIGINT) * v) AS BIGINT) AS sum_v
       |        FROM w GROUP BY 1)
       |SELECT CAST(resample AS INTEGER) AS resample, n_rows, sum_v,
       |       CAST((CAST(sum_v AS HUGEINT) * 1000000) // n_rows AS BIGINT)
       |         AS mean_cents_e6
       |FROM agg""".stripMargin
  }

  /** DuckDB mirror of `jackknife_buckets`: user buckets from the portable
    * 60-bit hash mod G, leave-one-out e6 means via the same floor
    * division both engines compute exactly. */
  private def jackknifeBucketsOracle: String =
    s"""WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS uid,
       |                   CAST(round(value * 100) AS BIGINT) AS v FROM events),
       |per AS (SELECT ${dh("uid")} % $JackBuckets AS g,
       |               CAST(count(v) AS BIGINT) AS n_g,
       |               CAST(sum(v) AS BIGINT) AS s_g
       |        FROM ev GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_tot,
       |               CAST(sum(s_g) AS BIGINT) AS s_tot FROM per)
       |SELECT CAST(g AS INTEGER) AS bucket, n_g, s_g,
       |       CAST((CAST(s_tot - s_g AS HUGEINT) * 1000000)
       |            // (n_tot - n_g) AS BIGINT) AS loo_mean_e6
       |FROM per, tot""".stripMargin

  /** DuckDB mirror of `permutation_test`: same one-md5 hash, same
    * multiply-shift relabel bits (u < 2^59 ⇒ label A), observed labels as
    * resample −1, truncating division over non-negative numerators. */
  private def permutationTestOracle: String = {
    val mults = (0 until BootResamples)
      .map(b => s"($b,${graft.functions.PortableHash.multiplier(b)})").mkString(",")
    val u = graft.functions.PortableHash.duckdbFamilySql("h.h", "mm.m", "mm.b")
    s"""WITH ev AS (SELECT CAST(event_id AS VARCHAR) AS eid,
       |                   CAST(round(value * 100) AS BIGINT) AS v,
       |                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS obs
       |            FROM events
       |            WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
       |h AS (SELECT ${dh("eid")} AS h, v, obs FROM ev),
       |mm(b, m) AS (VALUES $mults),
       |lab AS (SELECT mm.b AS resample,
       |               CASE WHEN $u < ${1L << 59} THEN 1 ELSE 0 END AS lab, h.v
       |        FROM h CROSS JOIN mm
       |        UNION ALL
       |        SELECT -1 AS resample, obs AS lab, v FROM h),
       |agg AS (SELECT resample,
       |               CAST(sum(lab) AS BIGINT) AS n_a,
       |               CAST(sum(lab * v) AS BIGINT) AS s_a,
       |               CAST(count(*) - sum(lab) AS BIGINT) AS n_b,
       |               CAST(sum(v) - sum(lab * v) AS BIGINT) AS s_b
       |        FROM lab GROUP BY 1)
       |SELECT CAST(resample AS INTEGER) AS resample, n_a, n_b,
       |       CAST((CAST(s_a AS HUGEINT) * 1000000) // nullif(n_a, 0)
       |            - (CAST(s_b AS HUGEINT) * 1000000) // nullif(n_b, 0)
       |            AS BIGINT) AS mean_diff_e6
       |FROM agg""".stripMargin
  }

  private def ksTwoSampleOracle: String =
    """WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |                   CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS isv
      |            FROM events
      |            WHERE value IS NOT NULL AND event_type IN ('view', 'purchase')),
      |g AS (SELECT cents, CAST(sum(isv) AS BIGINT) AS n1,
      |             CAST(sum(1 - isv) AS BIGINT) AS n2
      |      FROM ev GROUP BY 1),
      |c AS (SELECT cents,
      |             sum(n1) OVER (ORDER BY cents) AS cum1,
      |             sum(n2) OVER (ORDER BY cents) AS cum2 FROM g),
      |tot AS (SELECT CAST(sum(n1) AS BIGINT) AS t1,
      |               CAST(sum(n2) AS BIGINT) AS t2 FROM g),
      |d AS (SELECT cents, t1, t2,
      |             abs(CAST(cum1 AS HUGEINT) * t2 - CAST(cum2 AS HUGEINT) * t1)
      |               AS num
      |      FROM c, tot)
      |SELECT t1 AS n_view, t2 AS n_purchase, cents AS d_at_cents,
      |       CAST((num * 1000000) // nullif(CAST(t1 AS HUGEINT) * t2, 0)
      |            AS BIGINT) AS d_e6
      |FROM d ORDER BY num DESC, cents ASC LIMIT 1""".stripMargin

  /** DuckDB mirror of `annotator_kappa`, COMPOSED from the shared
    * [[docQualityOracle]] and [[docLangOracle]] CTEs (the
    * filter_overlap_venn precedent) so the quality weights and the
    * language word lists live in exactly one SQL copy each;
    * HUGEINT-staged kappa with truncating division (kappa can be
    * negative -- `//`/`div` agree on truncation toward zero). */
  private def annotatorKappaOracle: String =
    s"""WITH q AS ($docQualityOracle),
      |l AS ($docLangOracle),
      |f AS (SELECT CASE WHEN q.quality_e6 >= 800000 THEN 1 ELSE 0 END AS a,
      |             CASE WHEN l.lang_pred = 'en' THEN 1 ELSE 0 END AS b
      |      FROM q JOIN l ON q.doc_id = l.doc_id),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(a) AS BIGINT) AS a1,
      |             CAST(sum(b) AS BIGINT) AS b1,
      |             CAST(sum(a * b) AS BIGINT) AS n11
      |      FROM f)
      |SELECT n AS n_docs, a1 AS n_quality, b1 AS n_english,
      |       n - a1 - b1 + 2 * n11 AS n_agree,
      |       CAST((n - a1 - b1 + 2 * n11) * 1000000 // nullif(n, 0) AS BIGINT) AS po_e6,
      |       CAST((CAST(n AS HUGEINT) * (n - a1 - b1 + 2 * n11)
      |              - (CAST(a1 AS HUGEINT) * b1
      |                 + CAST(n - a1 AS HUGEINT) * (n - b1))) * 1000000
      |            // nullif(CAST(n AS HUGEINT) * n
      |              - (CAST(a1 AS HUGEINT) * b1
      |                 + CAST(n - a1 AS HUGEINT) * (n - b1)), 0)
      |            AS BIGINT) AS kappa_e6
      |FROM m""".stripMargin

  /** DuckDB mirror of `isotonic_calibration`: identical bit-length
    * buckets, pooled-mean grid, and minimax windows — floor commutes
    * with min/max, so truncating each pooled mean first is exact. */
  private def isotonicCalibrationOracle: String =
    """WITH ev AS (SELECT
      |  CAST(length(bin(CAST(round(value * 100) AS BIGINT))) AS INT) AS b,
      |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |cum AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(pos) AS BIGINT) AS p,
      |               CAST(sum(count(*)) OVER (ORDER BY b) AS BIGINT) AS cn,
      |               CAST(sum(sum(pos)) OVER (ORDER BY b) AS BIGINT) AS cp
      |        FROM ev GROUP BY 1),
      |pairs AS (SELECT l.b AS j, h.b AS k,
      |                 CAST((h.cp - (l.cp - l.p)) * 1000000
      |                      // (h.cn - (l.cn - l.n)) AS BIGINT) AS m_e6
      |          FROM cum l JOIN cum h ON l.b <= h.b),
      |s1 AS (SELECT j, k, min(m_e6) OVER (PARTITION BY j ORDER BY k DESC
      |              ROWS UNBOUNDED PRECEDING) AS minK FROM pairs),
      |s2 AS (SELECT j, k, max(minK) OVER (PARTITION BY k ORDER BY j ASC
      |              ROWS UNBOUNDED PRECEDING) AS iso_e6 FROM s1)
      |SELECT c.b AS bucket, c.n, c.p AS n_pos,
      |       CAST(c.p * 1000000 // c.n AS BIGINT) AS rate_e6,
      |       CAST(s.iso_e6 AS BIGINT) AS iso_e6
      |FROM cum c JOIN s2 s ON s.j = c.b AND s.k = c.b""".stripMargin

  /** DuckDB mirror of `brier_decomposition`: the isotonic fit CTEs plus
    * the Murphy terms — the Σ(f−o)² form is division-free and exact;
    * the two ō² terms truncate identically in both engines. */
  private def brierDecompositionOracle: String =
    """WITH ev AS (SELECT
      |  CAST(length(bin(CAST(round(value * 100) AS BIGINT))) AS INT) AS b,
      |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |cum AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
      |               CAST(sum(pos) AS BIGINT) AS p,
      |               CAST(sum(count(*)) OVER (ORDER BY b) AS BIGINT) AS cn,
      |               CAST(sum(sum(pos)) OVER (ORDER BY b) AS BIGINT) AS cp
      |        FROM ev GROUP BY 1),
      |pairs AS (SELECT l.b AS j, h.b AS k,
      |                 CAST((h.cp - (l.cp - l.p)) * 1000000
      |                      // (h.cn - (l.cn - l.n)) AS BIGINT) AS m_e6
      |          FROM cum l JOIN cum h ON l.b <= h.b),
      |s1 AS (SELECT j, k, min(m_e6) OVER (PARTITION BY j ORDER BY k DESC
      |              ROWS UNBOUNDED PRECEDING) AS minK FROM pairs),
      |s2 AS (SELECT j, k, max(minK) OVER (PARTITION BY k ORDER BY j ASC
      |              ROWS UNBOUNDED PRECEDING) AS iso_e6 FROM s1),
      |fit AS (SELECT c.n, c.p, CAST(s.iso_e6 AS BIGINT) AS f
      |        FROM cum c JOIN s2 s ON s.j = c.b AND s.k = c.b),
      |per AS (SELECT n, p,
      |          CAST(n AS HUGEINT) * f * f
      |            - 2 * CAST(f AS HUGEINT) * 1000000 * p
      |            + CAST(p AS HUGEINT) * 1000000000000 AS sq,
      |          (CAST(p AS HUGEINT) * p * 1000000000000) // n AS nob2
      |        FROM fit),
      |m AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |             CAST(sum(p) AS HUGEINT) AS pp,
      |             sum(sq) AS sq, sum(nob2) AS nob2 FROM per)
      |SELECT CAST(nn AS BIGINT) AS n_rows, CAST(pp AS BIGINT) AS n_pos,
      |       CAST(sq // nullif(nn, 0) AS BIGINT) AS brier_e12,
      |       CAST((sq - pp * 1000000000000 + nob2) // nullif(nn, 0)
      |            AS BIGINT) AS rel_e12,
      |       CAST((nob2 - (pp * pp * 1000000000000) // nullif(nn, 0))
      |            // nullif(nn, 0) AS BIGINT) AS res_e12,
      |       CAST((pp * (nn - pp) * 1000000000000) // nullif(nn * nn, 0)
      |            AS BIGINT) AS unc_e12
      |FROM m""".stripMargin

  private def termChi2KeywordsOracle: String =
    """WITH pres AS (
      |  SELECT DISTINCT doc_id, t.term
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)),
      |ab AS (SELECT term,
      |              CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |              CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS b
      |       FROM pres GROUP BY 1
      |       HAVING count(*) >= 5),
      |tot AS (SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
      |               CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
      |        FROM documents),
      |x AS (SELECT term, a, b,
      |             CAST((CAST(n_even + n_odd AS HUGEINT) *
      |                   CAST(a * (n_odd - b) - b * (n_even - a) AS HUGEINT) *
      |                   CAST(a * (n_odd - b) - b * (n_even - a) AS HUGEINT) *
      |                   1000000)
      |                  // nullif(CAST(a + b AS HUGEINT) *
      |                           (n_even + n_odd - a - b) * n_even * n_odd, 0)
      |                  AS BIGINT) AS chi2_e6
      |      FROM ab, tot)
      |SELECT term, a, b, chi2_e6 FROM x
      |ORDER BY chi2_e6 DESC, term ASC LIMIT 20""".stripMargin

  private def brandKendallOracle: String =
    """WITH bb AS (
      |  SELECT p_brand,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS x,
      |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
      |p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
      |      FROM bb a JOIN bb b ON a.p_brand < b.p_brand),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(CASE WHEN (xa > xb AND ya > yb) OR (xa < xb AND ya < yb)
      |                  THEN 1 END) AS BIGINT) AS concordant,
      |  CAST(count(CASE WHEN (xa > xb AND ya < yb) OR (xa < xb AND ya > yb)
      |                  THEN 1 END) AS BIGINT) AS discordant,
      |  CAST(count(CASE WHEN xa = xb OR ya = yb THEN 1 END) AS BIGINT) AS tied
      |      FROM p)
      |SELECT n_pairs, concordant, discordant, tied,
      |  CAST((concordant - discordant) * 1000000
      |       // nullif(n_pairs, 0) AS BIGINT) AS tau_a_e6
      |FROM m""".stripMargin

  /** Mirror of `parts_skyline`: same bounded-domain cummin formulation
    * (a pairwise NOT-EXISTS dominance check would be n² in the oracle
    * too — the formulations are provably equivalent for 2-D dominance). */
  private def partsSkylineOracle: String =
    """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
      |                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
      |           FROM part),
      |b AS (SELECT size, min(price_cents) AS min_p FROM p GROUP BY 1),
      |c AS (SELECT size,
      |        min(min_p) OVER (ORDER BY size
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp_incl,
      |        min(min_p) OVER (ORDER BY size
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS minp_strict
      |      FROM b)
      |SELECT p_partkey, size, price_cents
      |FROM p JOIN c USING (size)
      |WHERE NOT (minp_incl < price_cents
      |           OR COALESCE(minp_strict <= price_cents, false))""".stripMargin

  private def funnelTimeToConvertOracle: String =
    """WITH pu AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'view'
      |                  THEN epoch_us(ts) // 1000000 END) AS v1
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND event_type IN ('view', 'purchase')
      |  GROUP BY 1),
      |conv AS (
      |  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS p1, min(pu.v1) AS v1m
      |  FROM events e JOIN pu ON e.user_id = pu.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
      |    AND pu.v1 IS NOT NULL AND epoch_us(e.ts) // 1000000 >= pu.v1
      |  GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_viewed,
      |       CAST(count(d.delta_min) AS BIGINT) AS n_converted,
      |       CAST(count(d.delta_min) * 1000000
      |            // nullif(count(*), 0) AS BIGINT) AS conv_rate_e6,
      |       CAST(quantile_cont(d.delta_min, 0.5) * 4 AS BIGINT)
      |         AS median_minutes_x4
      |FROM pu LEFT JOIN (SELECT user_id, (p1 - v1m) // 60 AS delta_min
      |                   FROM conv) d
      |  ON pu.user_id = d.user_id
      |WHERE pu.v1 IS NOT NULL""".stripMargin

  private def eventsHeatmapOracle: String =
    """WITH b AS (
      |  SELECT ((epoch_us(ts) // 1000000 // 86400) + 4) % 7 AS dow,
      |         (epoch_us(ts) // 1000000 // 3600) % 24 AS hour,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM b)
      |SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n,
      |       CAST(n * 1000000 // n_all AS BIGINT) AS share_e6
      |FROM b, t""".stripMargin

  private def vocabSimpsonOracle: String =
    """WITH tok AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n_i FROM tok GROUP BY 1),
      |m AS (SELECT CAST(sum(n_i) AS BIGINT) AS n_tokens,
      |             CAST(count(*) AS BIGINT) AS n_types,
      |             sum(CAST(n_i AS HUGEINT) * (n_i - 1)) AS coll FROM c)
      |SELECT n_tokens, n_types,
      |  CAST(coll * 1000000
      |       // nullif(CAST(n_tokens AS HUGEINT) * (n_tokens - 1), 0) AS BIGINT)
      |    AS simpson_e6,
      |  CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) * 1000000
      |       // nullif(coll, 0) AS BIGINT) AS eff_vocab_e6
      |FROM m""".stripMargin

  /** Mirror of [[graft.operators.Sketches.kmvSketch]] +
    * [[graft.operators.Sketches.kmvJaccardPairs]] over per-event-type
    * user sets, with the exact Jaccard joined alongside. */
  private def kmvTypeJaccardOracle: String =
    s"""WITH kdu AS (SELECT DISTINCT event_type, user_id FROM events
       |             WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |khs AS (SELECT DISTINCT event_type,
       |               ${dh("CAST(user_id AS VARCHAR)")} AS h FROM kdu),
       |ksk AS (SELECT event_type, h FROM (
       |          SELECT event_type, h, row_number() OVER (
       |            PARTITION BY event_type ORDER BY h ASC) AS rn
       |          FROM khs) WHERE rn <= $KmvK),
       |ktypes AS (SELECT DISTINCT event_type FROM kdu),
       |kpairs AS (SELECT a.event_type AS set_a, b.event_type AS set_b
       |           FROM ktypes a JOIN ktypes b ON a.event_type < b.event_type),
       |krows AS (
       |  SELECT p.set_a, p.set_b, s.h,
       |         max(CASE WHEN s.event_type = p.set_a THEN 1 ELSE 0 END) AS ina,
       |         max(CASE WHEN s.event_type = p.set_b THEN 1 ELSE 0 END) AS inb
       |  FROM kpairs p JOIN ksk s ON s.event_type IN (p.set_a, p.set_b)
       |  GROUP BY 1, 2, 3),
       |kr AS (SELECT *, row_number() OVER (
       |         PARTITION BY set_a, set_b ORDER BY h ASC) AS rn FROM krows),
       |kest AS (SELECT set_a, set_b, CAST(count(*) AS BIGINT) AS n_sketch,
       |                CAST(sum(ina * inb) AS BIGINT) AS n_both
       |         FROM kr WHERE rn <= $KmvK GROUP BY 1, 2),
       |ksizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       |           FROM kdu GROUP BY 1),
       |kinter AS (SELECT a.event_type AS set_a, b.event_type AS set_b,
       |                  CAST(count(*) AS BIGINT) AS n_inter
       |           FROM kdu a JOIN kdu b
       |             ON a.user_id = b.user_id AND a.event_type < b.event_type
       |           GROUP BY 1, 2)
       |SELECT e.set_a, e.set_b, e.n_sketch, e.n_both,
       |  CAST(floor(e.n_both * 1000000.0 / e.n_sketch + 0.5) AS BIGINT)
       |    AS jaccard_est_e6,
       |  CAST(floor(COALESCE(ki.n_inter, 0) * 1000000.0 /
       |             (sa.n + sb.n - COALESCE(ki.n_inter, 0)) + 0.5) AS BIGINT)
       |    AS jaccard_exact_e6
       |FROM kest e JOIN ksizes sa ON e.set_a = sa.event_type
       |            JOIN ksizes sb ON e.set_b = sb.event_type
       |            LEFT JOIN kinter ki ON e.set_a = ki.set_a AND e.set_b = ki.set_b""".stripMargin

  private def ivfTopKOracle: String =
    s"""WITH flat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
       |cent AS (SELECT vec_id AS cell FROM embeddings
       |         ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC LIMIT $IvfNlist),
       |cdots AS (
       |  SELECT f.vec_id, c.cell, sum(f.x * g.x) AS dp
       |  FROM cent c JOIN flat g ON g.vec_id = c.cell JOIN flat f ON f.i = g.i
       |  GROUP BY f.vec_id, c.cell),
       |cranked AS (
       |  SELECT d.vec_id, d.cell, round(d.dp / (nv.nrm * nc.nrm), 6) AS sim
       |  FROM cdots d JOIN norms nv ON d.vec_id = nv.vec_id
       |              JOIN norms nc ON d.cell = nc.vec_id),
       |rr AS (SELECT vec_id, cell,
       |              row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
       |       FROM cranked),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id
       |  FROM (SELECT vec_id, cell FROM rr WHERE rn <= $IvfNprobe) p
       |  JOIN (SELECT vec_id, cell FROM rr WHERE rn = 1) a
       |    ON p.cell = a.cell AND p.vec_id <> a.vec_id),
       |${pairScoreCtes("query_id", "neighbor_id")},
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS "rank"
       |      FROM scored)
       |SELECT query_id, neighbor_id, cosine_sim, CAST("rank" AS INTEGER) AS "rank" FROM r WHERE "rank" <= $AnnK""".stripMargin

  /** Shared CTE chain for the substring-duplication oracles: the k-token
    * window relation, cross-document duplicate windows, and gaps-and-islands
    * span merging — parameterized by the same [[SubK]] the Spark side uses. */
  private def substringCtes: String = {
    val k = SubK
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |w AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |         md5(array_to_string(ws[i:i+${k - 1}], ' ')) AS whash
       |  FROM toks, UNNEST(range(1, len(ws) - ${k - 2})) AS t(i) WHERE len(ws) >= $k),
       |dup AS (SELECT whash FROM w GROUP BY whash HAVING count(DISTINCT doc_id) > 1),
       |dw AS (SELECT doc_id, pos FROM w WHERE whash IN (SELECT whash FROM dup)),
       |m AS (SELECT doc_id, pos,
       |        max(pos) OVER (PARTITION BY doc_id ORDER BY pos
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + ${k - 1} AS prev_end
       |      FROM dw),
       |f AS (SELECT doc_id, pos,
       |        CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS nw FROM m),
       |isl AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM f)""".stripMargin
  }

  private def substringSpansOracle: String =
    s"""WITH $substringCtes
       |SELECT doc_id, min(pos) AS span_start, max(pos) + ${SubK - 1} AS span_end,
       |       max(pos) + ${SubK - 1} - min(pos) + 1 AS span_tokens, count(*) AS n_windows
       |FROM isl GROUP BY doc_id, island""".stripMargin

  private def substringStatsOracle: String =
    s"""WITH $substringCtes,
       |spans AS (SELECT doc_id, max(pos) + ${SubK - 1} - min(pos) + 1 AS span_tokens
       |          FROM isl GROUP BY doc_id, island),
       |agg AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens
       |        FROM spans GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  COALESCE(a.dup_tokens, 0) AS dup_tokens,
       |  CAST(floor(CAST(COALESCE(a.dup_tokens, 0) AS DOUBLE)
       |             / CAST(len(string_split(d.text, ' ')) AS DOUBLE)
       |             * 1000000.0 + 0.5) AS BIGINT) AS dup_frac_e6
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Keep-one-copy substring cut: non-canonical window occurrences (every
    * occurrence of a window's content except the smallest (doc_id, pos))
    * merge into spans; the text is rebuilt from the tokens outside them.
    * The rebuild here explodes the token relation and anti-joins the cut
    * positions — plain SQL with no nested lambdas, equivalent to the Spark
    * side's index-aware array filter. */
  private def cutSpansOracle: String =
    s"""WITH $cutSpansCtes
       |SELECT doc_id, clean_text, n_cut_tokens FROM cutres""".stripMargin

  /** CTE chain ending in `cutres(doc_id, clean_text, n_cut_tokens)` —
    * shared by [[cutSpansOracle]] and the curate-v2 composition. */
  private def cutSpansCtes: String = {
    val k = SubK
    s"""toks AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |w AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |         md5(array_to_string(ws[i:i+${k - 1}], ' ')) AS whash
       |  FROM toks, UNNEST(range(1, len(ws) - ${k - 2})) AS t(i) WHERE len(ws) >= $k),
       |dw AS (SELECT doc_id, pos FROM (
       |         SELECT doc_id, pos,
       |                row_number() OVER (PARTITION BY whash ORDER BY doc_id, pos) AS rn
       |         FROM w) WHERE rn > 1),
       |m AS (SELECT doc_id, pos,
       |        max(pos) OVER (PARTITION BY doc_id ORDER BY pos
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + ${k - 1} AS prev_end
       |      FROM dw),
       |f AS (SELECT doc_id, pos,
       |        CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS nw FROM m),
       |isl AS (SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM f),
       |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + ${k - 1} AS e
       |          FROM isl GROUP BY doc_id, island),
       |sp AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_cut FROM spans GROUP BY doc_id),
       |tokrel AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS tok
       |           FROM toks, UNNEST(range(1, len(ws) + 1)) AS t(i)),
       |cut AS (SELECT DISTINCT tr.doc_id, tr.pos
       |        FROM tokrel tr JOIN spans s
       |          ON tr.doc_id = s.doc_id AND tr.pos BETWEEN s.s AND s.e),
       |kept AS (SELECT t.doc_id, t.pos, t.tok
       |         FROM tokrel t LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |         WHERE c.pos IS NULL),
       |rebuilt AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
       |            FROM kept GROUP BY doc_id),
       |cutres AS (
       |  SELECT t.doc_id,
       |    CASE WHEN sp.doc_id IS NULL THEN t.text ELSE COALESCE(r.clean_text, '') END AS clean_text,
       |    COALESCE(sp.n_cut, 0) AS n_cut_tokens
       |  FROM toks t LEFT JOIN sp USING (doc_id) LEFT JOIN rebuilt r USING (doc_id))""".stripMargin
  }

  /** Curation v2: span-level cut feeding quality/repetition rescoring on
    * the CLEANED text, exact dedup on the cleaned text, and the
    * deterministic downsample — the corpus_curate chain upgraded with
    * substring surgery. Empty post-cut docs are dropped BEFORE scoring
    * (quality on "" would divide by zero in both engines). */
  private def corpusCurate2Oracle: String =
    s"""WITH $cutSpansCtes,
       |base AS (
       |  SELECT d.doc_id, d.lang, d.source, c.clean_text AS ctext, c.n_cut_tokens
       |  FROM documents d JOIN cutres c USING (doc_id)
       |  WHERE length(c.clean_text) > 0),
       |t2 AS (SELECT doc_id, lang, source, n_cut_tokens, ctext,
       |              string_split(ctext, ' ') AS ws2,
       |              CAST(length(ctext) AS DOUBLE) AS nchars
       |       FROM base),
       |s2 AS (SELECT doc_id, lang, source, n_cut_tokens, ctext, ws2, nchars,
       |              CAST(len(ws2) AS DOUBLE) AS ntok,
       |              CAST(length(regexp_replace(ctext, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha
       |       FROM t2),
       |q2 AS (
       |  SELECT doc_id, lang, source, n_cut_tokens, ctext, ws2,
       |    CAST(floor((
       |      least(ntok / 100.0, 1.0) * 0.3
       |      + (alpha / nchars) * 0.3
       |      + (CASE WHEN (nchars - (ntok - 1)) / ntok BETWEEN 2.0 AND 12.0
       |              THEN 1.0 ELSE 0.3 END) * 0.2
       |      + (CASE WHEN len(list_intersect(ws2,
       |           ['the','a','an','and','of','to','in','is','it','that'])) > 0
       |              THEN 1.0 ELSE 0.5 END) * 0.2) * 1000000.0 + 0.5) AS BIGINT) AS quality_e6
       |  FROM s2),
       |g32 AS (SELECT doc_id, count(DISTINCT array_to_string(ws2[i:i+2], ' ')) AS d,
       |               any_value(len(ws2)) - 2 AS tot
       |        FROM t2, UNNEST(range(1, len(ws2) - 1)) AS r(i) WHERE len(ws2) >= 3
       |        GROUP BY doc_id),
       |r2 AS (SELECT q2.doc_id, q2.lang, q2.source, q2.n_cut_tokens, q2.ctext, q2.quality_e6,
       |         CAST(floor(COALESCE((g32.tot - g32.d) * 1.0 / g32.tot, 0.0)
       |                    * 1000000.0 + 0.5) AS BIGINT) AS rep3_e6
       |       FROM q2 LEFT JOIN g32 USING (doc_id)),
       |f2 AS (SELECT * FROM r2 WHERE quality_e6 >= 800000 AND rep3_e6 <= 10000),
       |k2 AS (SELECT doc_id, lang, source, quality_e6, rep3_e6, n_cut_tokens,
       |         row_number() OVER (PARTITION BY md5(ctext) ORDER BY doc_id ASC) AS rn
       |       FROM f2)
       |SELECT doc_id, lang, source, quality_e6, rep3_e6, n_cut_tokens FROM k2
       |WHERE rn = 1
       |  AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 < 5000""".stripMargin

  /** Centroid-cell assignment + within-cell candidate pairs for the
    * semantic-dedup oracles — same codebook rule (smallest portable hash of
    * the id) and the same round-6/cell-asc ranking as the Spark side. */
  private def semanticAssignCtes: String =
    s"""flat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
       |cent AS (SELECT vec_id AS cell FROM embeddings
       |         ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC LIMIT $SemNlist),
       |cdots AS (
       |  SELECT f.vec_id, c.cell, sum(f.x * g.x) AS dp
       |  FROM cent c JOIN flat g ON g.vec_id = c.cell JOIN flat f ON f.i = g.i
       |  GROUP BY f.vec_id, c.cell),
       |cranked AS (
       |  SELECT d.vec_id, d.cell, round(d.dp / (nv.nrm * nc.nrm), 6) AS sim
       |  FROM cdots d JOIN norms nv ON d.vec_id = nv.vec_id
       |              JOIN norms nc ON d.cell = nc.vec_id),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
       |  FROM cranked) WHERE rn = 1),
       |cand AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |${pairScoreCtes("id_a", "id_b")}""".stripMargin

  /** Same LSH candidate + exact-scoring CTEs as the near_dup_lsh oracle,
    * extended with the deterministic pool-hash negative selection. */
  private def contrastiveOracle: String = {
    val tripletKey = dh("CAST(anchor_id AS VARCHAR) || ':' || CAST(pos_id AS VARCHAR) || ':' || CAST(neg_id AS VARCHAR)")
    s"""WITH ${lshBucketCtes(NdBits, NdTables)}
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
       |  FROM probes p JOIN buckets c
       |    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id < c.vec_id),
       |${pairScoreCtes("id_a", "id_b")},
       |p AS (SELECT id_a, id_b FROM scored WHERE cosine_sim >= $NdThreshold),
       |anch AS (SELECT id_a AS anchor_id, id_b AS pos_id FROM p
       |         UNION ALL SELECT id_b, id_a FROM p),
       |pool AS (SELECT vec_id AS neg_id FROM embeddings
       |         ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC LIMIT $CtPool),
       |c2 AS (SELECT a.anchor_id, a.pos_id, pl.neg_id
       |       FROM anch a JOIN pool pl ON pl.neg_id <> a.anchor_id
       |       WHERE NOT EXISTS (SELECT 1 FROM anch x
       |                         WHERE x.anchor_id = a.anchor_id AND x.pos_id = pl.neg_id)),
       |r AS (SELECT anchor_id, pos_id, neg_id,
       |        row_number() OVER (PARTITION BY anchor_id, pos_id
       |                           ORDER BY $tripletKey ASC, neg_id ASC) AS rn
       |      FROM c2)
       |SELECT anchor_id, pos_id, neg_id FROM r WHERE rn = 1""".stripMargin
  }

  private def semanticPairsOracle: String =
    s"""WITH $semanticAssignCtes
       |SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= $SemThreshold""".stripMargin

  private def semanticKeepersOracle: String =
    s"""WITH RECURSIVE $semanticAssignCtes,
       |p AS (SELECT id_a, id_b FROM scored WHERE cosine_sim >= $SemThreshold),
       |e AS (SELECT id_a AS src, id_b AS dst FROM p
       |      UNION SELECT id_b, id_a FROM p),
       |v AS (SELECT DISTINCT src AS id FROM e),
       |reach(id, r) AS (
       |  SELECT id, id FROM v
       |  UNION
       |  SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.id),
       |losers AS (SELECT id FROM reach GROUP BY id HAVING id != min(r))
       |SELECT vec_id, label FROM embeddings
       |WHERE vec_id NOT IN (SELECT id FROM losers)""".stripMargin

  private def docLmScoreOracle: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tr AS (SELECT ws FROM toks WHERE ${dh("CAST(doc_id AS VARCHAR)")} % 2 = 0),
       |trb AS (SELECT ws[i] AS l, ws[i+1] AS r
       |        FROM tr, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
       |cb AS (SELECT l, r, CAST(count(*) AS BIGINT) AS cb FROM trb GROUP BY 1, 2),
       |cl AS (SELECT l, CAST(count(*) AS BIGINT) AS cl FROM trb GROUP BY 1),
       |v AS (SELECT count(DISTINCT term) AS v
       |      FROM (SELECT UNNEST(ws) AS term FROM tr)),
       |db AS (SELECT doc_id, ws[i] AS l, ws[i+1] AS r
       |       FROM toks, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
       |dbt AS (SELECT doc_id, l, r, count(*) AS tf FROM db GROUP BY 1, 2, 3),
       |sc AS (SELECT d.doc_id, d.tf,
       |         CAST(floor(-ln((COALESCE(cb.cb, 0) + 1.0) /
       |                        (COALESCE(cl.cl, 0) + v.v)) * 1000000.0 + 0.5)
       |              AS BIGINT) AS nll
       |       FROM dbt d LEFT JOIN cb ON d.l = cb.l AND d.r = cb.r
       |                  LEFT JOIN cl ON d.l = cl.l
       |                  CROSS JOIN v),
       |agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |               CAST(sum(tf * nll) AS BIGINT) AS nll_e6
       |        FROM sc GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
       |  COALESCE(a.nll_e6, 0) AS nll_e6,
       |  CAST(CASE WHEN COALESCE(a.n_bigrams, 0) = 0 THEN 0
       |       ELSE floor(CAST(a.nll_e6 AS DOUBLE) / a.n_bigrams + 0.5)
       |       END AS BIGINT) AS avg_nll_e6
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  private def dsirWeightsOracle: String =
    s"""WITH tok AS (SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS term
       |            FROM documents),
       |tb AS (SELECT doc_id, lang,
       |              CAST(${dh("term")} % $DsirBuckets AS BIGINT) AS b FROM tok),
       |spine AS (SELECT UNNEST(range(0, $DsirBuckets)) AS b),
       |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tb
       |       WHERE lang = 'en' GROUP BY b),
       |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tb GROUP BY b),
       |tots AS (SELECT CAST(sum(COALESCE(ct.ct, 0)) AS BIGINT) AS ctt,
       |                CAST(sum(COALESCE(cr.cr, 0)) AS BIGINT) AS crt
       |         FROM spine s LEFT JOIN ct ON s.b = ct.b LEFT JOIN cr ON s.b = cr.b),
       |stats AS (SELECT s.b,
       |    CAST(floor(ln(((COALESCE(ct.ct, 0) + 1.0) / (COALESCE(cr.cr, 0) + 1.0))
       |               * ((t.crt + $DsirBuckets.0) / (t.ctt + $DsirBuckets.0)))
       |         * 1000000.0 + 0.5) AS BIGINT) AS lr
       |  FROM spine s LEFT JOIN ct ON s.b = ct.b LEFT JOIN cr ON s.b = cr.b
       |       CROSS JOIN tots t),
       |db AS (SELECT doc_id, b, count(*) AS tf FROM tb GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |               CAST(sum(tf * lr) AS BIGINT) AS logratio_e6
       |        FROM db JOIN stats USING (b) GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(a.n_tokens, 0) AS n_tokens,
       |  COALESCE(a.logratio_e6, 0) AS logratio_e6,
       |  CAST(CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0
       |       ELSE floor(CAST(a.logratio_e6 AS DOUBLE) / a.n_tokens + 0.5)
       |       END AS BIGINT) AS avg_logratio_e6
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Multinomial-NB oracle over any labeled `toks` CTE chain ending in
    * `toks(doc_id, lang, ws)` — instantiated for the lang classifier and
    * the pseudo-labeled quality classifier so the model SQL cannot drift
    * between them. */
  /** Shared content-defined-chunking CTEs through the per-token chunk
    * assignment `c` (w = 4, divisor = 16 — must match the registered
    * contentDefinedChunks parameters). The boundary hash mirrors the
    * native [[graft.functions.expressions.CdcChunks]] generator: a
    * degree-(w−1) polynomial over per-token md5-derived 60-bit values
    * with the shared multiplier's powers as literal coefficients, exact
    * in HUGEINT (each product < 2^120), reduced mod 2^60 — identical to
    * the JVM's wrapping-multiply-and-mask arithmetic. */
  private val cdcChunkCtes: String = {
    // H(i) = Σ_{j=0}^{3} h60(ws[i−j]) · M^j  mod 2^60, w = 4
    val poly = (3 to 0 by -1).map { j =>
      val tok = if (j == 0) "ws[i]" else s"ws[i-$j]"
      s"CAST(${graft.functions.PortableHash.duckdbSql(tok)} AS HUGEINT) * " +
        s"${graft.functions.expressions.CdcChunks.powerMod(j)}"
    }.mkString(" + ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |p AS (SELECT doc_id, ws, CAST(r.i AS INTEGER) AS i
       |      FROM t, UNNEST(range(1, len(ws) + 1)) AS r(i)),
       |b AS (SELECT doc_id, i, ws[i] AS tok,
       |        CASE WHEN i >= 4 AND
       |          CAST(($poly) % ${1L << 60} AS BIGINT) % 16 = 0
       |          THEN 1 ELSE 0 END AS isb
       |      FROM p),
       |c AS (SELECT doc_id, i, tok,
       |        CAST(coalesce(sum(isb) OVER (PARTITION BY doc_id ORDER BY i
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER) AS chunk_idx
       |      FROM b)""".stripMargin
  }

  /** Shared NB CTE prefix through the per-(doc,class) ranking `r` —
    * consumed by the classify-style oracles (rn = 1) and the
    * uncertainty-margin oracle (rn 1 vs 2). */
  private def nbOracleCtes(toksCtes: String): String =
    s"""WITH $toksCtes,
       |tr AS (SELECT * FROM toks WHERE ${dh("CAST(doc_id AS VARCHAR)")} % 2 = 0),
       |trtok AS (SELECT doc_id, lang, UNNEST(ws) AS term FROM tr),
       |cls AS (SELECT lang AS lab, CAST(count(*) AS BIGINT) AS nd FROM tr GROUP BY 1),
       |ndt AS (SELECT CAST(count(*) AS BIGINT) AS ndt FROM tr),
       |tcc AS (SELECT term, lang AS lab, CAST(count(*) AS BIGINT) AS n
       |        FROM trtok GROUP BY 1, 2),
       |tpc AS (SELECT lang AS lab, CAST(count(*) AS BIGINT) AS nc FROM trtok GROUP BY 1),
       |v AS (SELECT count(DISTINCT term) AS v FROM trtok),
       |model AS (SELECT c.lab,
       |    CAST(floor(ln(CAST(c.nd AS DOUBLE) / d.ndt) * 1000000.0 + 0.5)
       |         AS BIGINT) AS prior_e6,
       |    t.nc, vv.v
       |  FROM cls c CROSS JOIN ndt d JOIN tpc t ON c.lab = t.lab CROSS JOIN v vv),
       |dt AS (SELECT doc_id, UNNEST(ws) AS term FROM toks),
       |dtf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
       |sc AS (SELECT g.doc_id, m.lab, m.prior_e6, g.tf,
       |         CAST(floor(ln((COALESCE(t.n, 0) + 1.0) / (m.nc + m.v))
       |              * 1000000.0 + 0.5) AS BIGINT) AS lp
       |       FROM dtf g CROSS JOIN model m
       |            LEFT JOIN tcc t ON g.term = t.term AND m.lab = t.lab),
       |tot AS (SELECT doc_id, lab,
       |          CAST(min(prior_e6) + sum(tf * lp) AS BIGINT) AS score_e6
       |        FROM sc GROUP BY 1, 2),
       |r AS (SELECT doc_id, lab, score_e6,
       |        row_number() OVER (PARTITION BY doc_id
       |                           ORDER BY score_e6 DESC, lab ASC) AS rn
       |      FROM tot)""".stripMargin

  private def nbOracleBody(toksCtes: String, actualAlias: String, predAlias: String): String =
    nbOracleCtes(toksCtes) +
    s"""
       |SELECT dl.doc_id, dl.lang AS $actualAlias, r.lab AS $predAlias, r.score_e6,
       |  CAST(CASE WHEN r.lab = dl.lang THEN 1 ELSE 0 END AS INTEGER) AS correct
       |FROM (SELECT doc_id, lang FROM toks) dl
       |JOIN r ON dl.doc_id = r.doc_id AND r.rn = 1""".stripMargin

  /** Confidently-contradicted labels (noise audit) over the NB surface. */
  private def nbLabelNoiseOracle: String =
    nbOracleCtes(
      "toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)") +
    """
      |, m AS (SELECT r1.doc_id, dl.lang, r1.lab AS pred_label,
      |          r1.score_e6 - r2.score_e6 AS margin_e6
      |        FROM r r1 JOIN r r2 ON r1.doc_id = r2.doc_id
      |                           AND r1.rn = 1 AND r2.rn = 2
      |        JOIN (SELECT doc_id, lang FROM toks) dl ON r1.doc_id = dl.doc_id
      |        WHERE r1.lab != dl.lang)
      |SELECT doc_id, lang, pred_label, margin_e6, noise_rank FROM (
      |  SELECT m.*, CAST(row_number() OVER (
      |    ORDER BY margin_e6 DESC, doc_id ASC) AS INTEGER) AS noise_rank
      |  FROM m)
      |WHERE noise_rank <= 25""".stripMargin

  /** Accuracy-per-margin-decile calibration over the NB surface; ntile
    * parity with Spark is already proven by orders_ntile. */
  private def nbCalibrationOracle: String =
    nbOracleCtes(
      "toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)") +
    """
      |, m AS (SELECT r1.doc_id, r1.score_e6 - r2.score_e6 AS margin_e6,
      |          CASE WHEN r1.lab = dl.lang THEN 1 ELSE 0 END AS correct
      |        FROM r r1 JOIN r r2 ON r1.doc_id = r2.doc_id
      |                           AND r1.rn = 1 AND r2.rn = 2
      |        JOIN (SELECT doc_id, lang FROM toks) dl ON r1.doc_id = dl.doc_id),
      |b AS (SELECT correct, CAST(ntile(10) OVER (
      |        ORDER BY margin_e6 ASC, doc_id ASC) AS INTEGER) AS cal_bucket
      |      FROM m)
      |SELECT cal_bucket, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(correct) AS BIGINT) AS n_correct,
      |       CAST(floor(sum(correct) * 1.0 / count(*) * 1000000.0 + 0.5) AS BIGINT) AS acc_e6
      |FROM b GROUP BY cal_bucket""".stripMargin

  /** Smallest-margin uncertainty oracle over the same NB surface. */
  private def nbUncertainOracle: String =
    nbOracleCtes(
      "toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)") +
    """
      |, m AS (SELECT r1.doc_id, r1.lab AS pred_label,
      |          r1.score_e6 - r2.score_e6 AS margin_e6
      |        FROM r r1 JOIN r r2 ON r1.doc_id = r2.doc_id
      |                           AND r1.rn = 1 AND r2.rn = 2)
      |SELECT doc_id, pred_label, margin_e6, unc_rank FROM (
      |  SELECT m.*, CAST(row_number() OVER (
      |    ORDER BY margin_e6 ASC, doc_id ASC) AS INTEGER) AS unc_rank
      |  FROM m)
      |WHERE unc_rank <= 25""".stripMargin

  private def nbLangOracle: String = nbOracleBody(
    "toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)",
    "lang", "pred_lang")

  /** DuckDB mirror of `nb_learning_curve`: three nested hash-residue
    * training subsets, each instantiating the SAME model/score CTE chain
    * as [[nbOracleCtes]] (expressions copied verbatim so the e6 ln
    * staging stays bit-identical), all scored on the one held-out half. */
  private def nbLearningCurveOracle: String = {
    val h8 = s"${dh("CAST(doc_id AS VARCHAR)")} % 8"
    def subset(i: Int, eighths: Int, res: Seq[Long]): String = {
      val in = res.mkString("(", ", ", ")")
      s"""tr$i AS (SELECT * FROM toks WHERE $h8 IN $in),
         |trtok$i AS (SELECT doc_id, lang, UNNEST(ws) AS term FROM tr$i),
         |cls$i AS (SELECT lang AS lab, CAST(count(*) AS BIGINT) AS nd FROM tr$i GROUP BY 1),
         |ndt$i AS (SELECT CAST(count(*) AS BIGINT) AS ndt FROM tr$i),
         |tcc$i AS (SELECT term, lang AS lab, CAST(count(*) AS BIGINT) AS n
         |          FROM trtok$i GROUP BY 1, 2),
         |tpc$i AS (SELECT lang AS lab, CAST(count(*) AS BIGINT) AS nc FROM trtok$i GROUP BY 1),
         |v$i AS (SELECT count(DISTINCT term) AS v FROM trtok$i),
         |model$i AS (SELECT c.lab,
         |    CAST(floor(ln(CAST(c.nd AS DOUBLE) / d.ndt) * 1000000.0 + 0.5)
         |         AS BIGINT) AS prior_e6,
         |    t.nc, vv.v
         |  FROM cls$i c CROSS JOIN ndt$i d JOIN tpc$i t ON c.lab = t.lab CROSS JOIN v$i vv),
         |sc$i AS (SELECT g.doc_id, m.lab, m.prior_e6, g.tf,
         |         CAST(floor(ln((COALESCE(t.n, 0) + 1.0) / (m.nc + m.v))
         |              * 1000000.0 + 0.5) AS BIGINT) AS lp
         |       FROM dtf g CROSS JOIN model$i m
         |            LEFT JOIN tcc$i t ON g.term = t.term AND m.lab = t.lab),
         |tot$i AS (SELECT doc_id, lab,
         |          CAST(min(prior_e6) + sum(tf * lp) AS BIGINT) AS score_e6
         |        FROM sc$i GROUP BY 1, 2),
         |r$i AS (SELECT doc_id, lab, score_e6,
         |        row_number() OVER (PARTITION BY doc_id
         |                           ORDER BY score_e6 DESC, lab ASC) AS rn
         |      FROM tot$i),
         |acc$i AS (SELECT CAST($eighths AS INTEGER) AS train_eighths,
         |    (SELECT CAST(count(*) AS BIGINT) FROM tr$i) AS n_train,
         |    CAST(count(*) AS BIGINT) AS n_test,
         |    CAST(sum(CASE WHEN r.lab = dl.lang THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_correct
         |  FROM dl JOIN r$i r ON dl.doc_id = r.doc_id AND r.rn = 1)""".stripMargin
    }
    val subsets = Seq((1, 1, Seq(0L)), (2, 2, Seq(0L, 4L)),
      (3, 4, Seq(0L, 2L, 4L, 6L)))
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
       |dl AS (SELECT doc_id, lang FROM toks WHERE $h8 % 2 = 1),
       |dt AS (SELECT doc_id, UNNEST(ws) AS term FROM toks
       |       WHERE $h8 % 2 = 1),
       |dtf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2),
       |""".stripMargin +
      subsets.map { case (i, e, r) => subset(i, e, r) }.mkString(",\n") +
      """
        |SELECT train_eighths, n_train, n_test, n_correct,
        |       CAST(floor(n_correct * 1.0 / n_test * 1000000.0 + 0.5) AS BIGINT)
        |         AS acc_e6
        |FROM (SELECT * FROM acc1 UNION ALL SELECT * FROM acc2
        |      UNION ALL SELECT * FROM acc3)""".stripMargin
  }

  /** Pseudo-labeled quality classifier: the label CTE chain inlines the
    * doc_quality formula (kept textually identical to that oracle), then
    * the shared NB body learns hi/lo from tokens. */
  private def nbQualityOracle: String = nbOracleBody(
    s"""qsrc AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws,
       |         CAST(length(text) AS DOUBLE) AS nchars
       |  FROM documents),
       |qs AS (
       |  SELECT doc_id, ws, nchars,
       |         CAST(len(ws) AS DOUBLE) AS ntok,
       |         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha
       |  FROM qsrc),
       |qsc AS (SELECT doc_id, ws,
       |  CAST(CASE WHEN nchars = 0 THEN 0 ELSE floor((
       |    least(ntok / 100.0, 1.0) * 0.3
       |    + (alpha / nchars) * 0.3
       |    + (CASE WHEN (nchars - (ntok - 1)) / ntok BETWEEN 2.0 AND 12.0
       |            THEN 1.0 ELSE 0.3 END) * 0.2
       |    + (CASE WHEN len(list_intersect(ws,
       |         ['the','a','an','and','of','to','in','is','it','that'])) > 0
       |            THEN 1.0 ELSE 0.5 END)* 0.2) * 1000000.0 + 0.5) END AS BIGINT) AS quality_e6
       |  FROM qs),
       |toks AS (SELECT doc_id,
       |           CASE WHEN quality_e6 >= 800000 THEN 'hi' ELSE 'lo' END AS lang, ws
       |         FROM qsc)""".stripMargin,
    "qlabel", "pred_qlabel")

  private def blocklistOracle: String =
    s"""WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |h AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_hits, min(term) AS first_hit
       |      FROM tf WHERE term IN (${BlockTerms.map(t => s"'$t'").mkString(", ")})
       |      GROUP BY 1)
       |SELECT d.doc_id,
       |  COALESCE(h.n_hits, 0) AS n_hits,
       |  h.first_hit,
       |  COALESCE(h.n_hits, 0) > 0 AS blocked
       |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin

  /** Composed model-filter curation oracle: the three stage oracles nested
    * verbatim as derived tables, so the composition cannot drift from the
    * individually-registered queries. */
  private def curate3Oracle: String =
    s"""WITH bl AS (SELECT * FROM ($blocklistOracle)),
       |lm AS (SELECT * FROM ($docLmScoreOracle)),
       |ds AS (SELECT * FROM ($dsirWeightsOracle))
       |SELECT d.doc_id, d.lang, d.source,
       |       bl.n_hits, lm.avg_nll_e6, ds.avg_logratio_e6
       |FROM documents d
       |JOIN bl USING (doc_id) JOIN lm USING (doc_id) JOIN ds USING (doc_id)
       |WHERE bl.n_hits <= $C3MaxHits
       |  AND lm.n_bigrams > 0 AND lm.avg_nll_e6 <= $C3MaxNll
       |  AND ds.avg_logratio_e6 >= $C3MinLr""".stripMargin

  /** Per-stage survivor counts through the same three composed stage
    * oracles as [[curate3Oracle]] — conditional counts over one joined
    * relation, mirroring the Spark single-pass aggregate. */
  private def curationFunnelOracle: String =
    s"""WITH bl AS (SELECT * FROM ($blocklistOracle)),
       |lm AS (SELECT * FROM ($docLmScoreOracle)),
       |ds AS (SELECT * FROM ($dsirWeightsOracle)),
       |j AS (SELECT bl.n_hits, lm.n_bigrams, lm.avg_nll_e6, ds.avg_logratio_e6
       |      FROM documents d
       |      JOIN bl USING (doc_id) JOIN lm USING (doc_id) JOIN ds USING (doc_id))
       |SELECT CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(count(CASE WHEN n_hits <= $C3MaxHits THEN 1 END) AS BIGINT)
       |    AS n_after_blocklist,
       |  CAST(count(CASE WHEN n_hits <= $C3MaxHits AND n_bigrams > 0
       |                   AND avg_nll_e6 <= $C3MaxNll THEN 1 END) AS BIGINT)
       |    AS n_after_lm,
       |  CAST(count(CASE WHEN n_hits <= $C3MaxHits AND n_bigrams > 0
       |                   AND avg_nll_e6 <= $C3MaxNll
       |                   AND avg_logratio_e6 >= $C3MinLr THEN 1 END) AS BIGINT)
       |    AS n_after_dsir
       |FROM j""".stripMargin

  /** PQ/ADC: same hash-sampled codebook rule, same subspace split
    * ((i-1)//subDim), distances e6-quantized at the lookup-table boundary
    * so codes and ADC sums are integer-exact in both engines. */
  private def pqTopKOracle: String = {
    val subDim = Dim / PqM
    s"""WITH flat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |sub AS (SELECT vec_id, CAST((i - 1) // $subDim AS INTEGER) AS s,
       |               (i - 1) % $subDim AS di, x
       |        FROM flat),
       |cbids AS (SELECT vec_id AS cb_vec, CAST(rn - 1 AS INTEGER) AS j FROM (
       |  SELECT vec_id, row_number() OVER (
       |    ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS rn
       |  FROM embeddings) WHERE rn <= $PqK),
       |cb AS (SELECT c.j, s.s, s.di, s.x
       |       FROM cbids c JOIN sub s ON s.vec_id = c.cb_vec),
       |dists AS (SELECT v.vec_id, v.s, c.j,
       |    CAST(floor(sum((v.x - c.x) * (v.x - c.x)) * 1000000.0 + 0.5)
       |         AS BIGINT) AS d
       |  FROM sub v JOIN cb c ON v.s = c.s AND v.di = c.di
       |  GROUP BY v.vec_id, v.s, c.j),
       |codes AS (SELECT vec_id, s, j FROM (
       |  SELECT vec_id, s, j, row_number() OVER (
       |    PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
       |  FROM dists) WHERE rn = 1),
       |adc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |               CAST(sum(q.d) AS BIGINT) AS dist_e6
       |        FROM codes c JOIN dists q ON q.s = c.s AND q.j = c.j
       |                                  AND q.vec_id <> c.vec_id
       |        GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, dist_e6,
       |        row_number() OVER (PARTITION BY query_id
       |                           ORDER BY dist_e6 ASC, neighbor_id ASC) AS "rank"
       |      FROM adc)
       |SELECT query_id, neighbor_id, dist_e6, CAST("rank" AS INTEGER) AS "rank"
       |FROM r WHERE "rank" <= $AnnK""".stripMargin
  }

  /** IVF+PQ: same coarse/codebook hash rules, residual arithmetic per
    * element (exact IEEE subtract), per-probed-cell ADC tables; every
    * distance e6-quantized at the table boundary → integer ADC sums. */
  private def ivfPqTopKOracle: String = {
    val subDim = Dim / PqM
    s"""WITH flat AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         CAST(UNNEST(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |centids AS (SELECT vec_id AS c_vec, CAST(rn - 1 AS INTEGER) AS cell FROM (
       |  SELECT vec_id, row_number() OVER (
       |    ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS rn
       |  FROM embeddings) WHERE rn <= $IvfNlist),
       |centflat AS (SELECT c.cell, f.i, f.x
       |             FROM centids c JOIN flat f ON f.vec_id = c.c_vec),
       |adist AS (SELECT v.vec_id, c.cell,
       |    CAST(floor(sum((v.x - c.x) * (v.x - c.x)) * 1000000.0 + 0.5)
       |         AS BIGINT) AS d
       |  FROM flat v JOIN centflat c ON v.i = c.i
       |  GROUP BY 1, 2),
       |arank AS (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
       |  FROM adist),
       |assign AS (SELECT vec_id, cell FROM arank WHERE rn = 1),
       |probe AS (SELECT vec_id, cell FROM arank WHERE rn <= $IvfNprobe),
       |rflat AS (SELECT v.vec_id, v.i, v.x - c.x AS x
       |          FROM flat v JOIN assign a ON a.vec_id = v.vec_id
       |               JOIN centflat c ON c.cell = a.cell AND c.i = v.i),
       |cbids AS (SELECT vec_id AS cb_vec, CAST(rn - 1 AS INTEGER) AS j FROM (
       |  SELECT vec_id, row_number() OVER (
       |    ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) AS rn
       |  FROM embeddings) WHERE rn <= $PqK),
       |cbsub AS (SELECT cb.j, CAST((r.i - 1) // $subDim AS INTEGER) AS s,
       |                 (r.i - 1) % $subDim AS di, r.x
       |          FROM cbids cb JOIN rflat r ON r.vec_id = cb.cb_vec),
       |rsub AS (SELECT vec_id, CAST((i - 1) // $subDim AS INTEGER) AS s,
       |                (i - 1) % $subDim AS di, x
       |         FROM rflat),
       |cdist AS (SELECT r.vec_id, r.s, c.j,
       |    CAST(floor(sum((r.x - c.x) * (r.x - c.x)) * 1000000.0 + 0.5)
       |         AS BIGINT) AS d
       |  FROM rsub r JOIN cbsub c ON r.s = c.s AND r.di = c.di
       |  GROUP BY 1, 2, 3),
       |codes AS (SELECT cd.vec_id, a.cell, cd.s, cd.j FROM (
       |    SELECT vec_id, s, j,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d ASC, j ASC) AS rn
       |    FROM cdist) cd JOIN assign a ON a.vec_id = cd.vec_id
       |  WHERE cd.rn = 1),
       |qrflat AS (SELECT v.vec_id, p.cell, v.i, v.x - c.x AS x
       |           FROM flat v JOIN probe p ON p.vec_id = v.vec_id
       |                JOIN centflat c ON c.cell = p.cell AND c.i = v.i),
       |qsub AS (SELECT vec_id, cell, CAST((i - 1) // $subDim AS INTEGER) AS s,
       |                (i - 1) % $subDim AS di, x
       |         FROM qrflat),
       |qdist AS (SELECT q.vec_id, q.cell, q.s, c.j,
       |    CAST(floor(sum((q.x - c.x) * (q.x - c.x)) * 1000000.0 + 0.5)
       |         AS BIGINT) AS d
       |  FROM qsub q JOIN cbsub c ON q.s = c.s AND q.di = c.di
       |  GROUP BY 1, 2, 3, 4),
       |adc AS (SELECT q.vec_id AS query_id, k2.vec_id AS neighbor_id,
       |               CAST(sum(q.d) AS BIGINT) AS dist_e6
       |        FROM codes k2 JOIN qdist q ON q.cell = k2.cell AND q.s = k2.s
       |                                   AND q.j = k2.j AND q.vec_id <> k2.vec_id
       |        GROUP BY 1, 2),
       |r AS (SELECT query_id, neighbor_id, dist_e6,
       |        row_number() OVER (PARTITION BY query_id
       |                           ORDER BY dist_e6 ASC, neighbor_id ASC) AS "rank"
       |      FROM adc)
       |SELECT query_id, neighbor_id, dist_e6, CAST("rank" AS INTEGER) AS "rank"
       |FROM r WHERE "rank" <= $AnnK""".stripMargin
  }

  /** DuckDB side of `gini_impurity_features`: one per-feature block over
    * the shared labeled-event CTE, unioned — identical decimal-staged
    * purity arithmetic. */
  private def giniFeaturesOracle: String = {
    val feats = Seq("event_type" -> "event_type", "hour" -> "h", "dow" -> "dw")
    val blocks = feats.map { case (name, c) =>
      s"""SELECT '$name' AS feature, CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(1000000 - (sum(CAST(pur AS HUGEINT)) // sum(n)) AS BIGINT) AS weighted_gini_e6
         |FROM (SELECT n,
         |        CAST((CAST(pos AS HUGEINT) * pos + CAST(n - pos AS HUGEINT) * (n - pos)) * 1000000
         |             // n AS BIGINT) AS pur
         |      FROM (SELECT $c AS v, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
         |            FROM gev GROUP BY 1))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH gev AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
       |               CAST(dayofweek(ts) AS BIGINT) AS dw,
       |               CASE WHEN CAST(round(value * 100) AS BIGINT) >= $GiniValueCut
       |                    THEN 1 ELSE 0 END AS y
       |             FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |               AND value IS NOT NULL)
       |$blocks""".stripMargin
  }

  /** DuckDB side of `attribution_markov`: the same transition derivation
    * in SQL, then the MarkovIters value-iteration rounds unrolled CTE by
    * CTE over the bounded scenario×state grid — identical truncating e6
    * arithmetic to the Spark driver-side model. */
  private def markovOracle: String = {
    val iters = (1 to MarkovIters).map { k =>
      s"""mp$k AS (SELECT c.scenario, c.st,
         |  CAST(c.tconv + (COALESCE(s.acc, 0) // 1000000) AS BIGINT) AS p
         |  FROM mtc c LEFT JOIN (
         |    SELECT t.scenario, t."from" AS st, CAST(sum(t.t_e6 * p.p) AS BIGINT) AS acc
         |    FROM mtx t JOIN mp${k - 1} p ON p.scenario = t.scenario AND p.st = t."to"
         |    GROUP BY 1, 2) s ON s.scenario = c.scenario AND s.st = c.st)""".stripMargin
    }.mkString(",\n")
    val K = MarkovIters
    s"""WITH mev AS (SELECT user_id, ts, event_id, event_type FROM events
       |             WHERE event_type IS NOT NULL AND ts IS NOT NULL),
       |mfp AS (SELECT user_id, ts AS fts, event_id AS fid FROM (
       |          SELECT user_id, ts, event_id,
       |                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |          FROM mev WHERE event_type = 'purchase') WHERE rn = 1),
       |mpath AS (SELECT e.user_id, e.ts, e.event_id,
       |            CASE WHEN e.event_type = 'purchase' THEN 'CONV' ELSE e.event_type END AS state
       |          FROM mev e LEFT JOIN mfp f USING (user_id)
       |          WHERE f.fts IS NULL OR e.ts < f.fts OR (e.ts = f.fts AND e.event_id <= f.fid)),
       |mstep AS (SELECT user_id, state,
       |            COALESCE(lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id), 'START') AS prev,
       |            row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_desc
       |          FROM mpath),
       |mtr AS (SELECT "from", "to", CAST(count(*) AS BIGINT) AS c FROM (
       |          SELECT prev AS "from", state AS "to" FROM mstep
       |          UNION ALL
       |          SELECT state AS "from", 'NULL' AS "to" FROM mstep WHERE rn_desc = 1 AND state <> 'CONV')
       |        GROUP BY 1, 2),
       |mtt AS (SELECT "from", CAST(sum(c) AS BIGINT) AS ctot FROM mtr GROUP BY 1),
       |mt AS (SELECT t."from", t."to", t.c * 1000000 // m.ctot AS t_e6
       |       FROM mtr t JOIN mtt m USING ("from")),
       |msc AS (SELECT DISTINCT "from" AS scenario FROM mt WHERE "from" <> 'START'
       |        UNION ALL SELECT '__none'),
       |mst AS (SELECT DISTINCT "from" AS st FROM mt),
       |mgrid AS (SELECT s.scenario, x.st FROM msc s JOIN mst x ON x.st <> s.scenario),
       |mtc AS (SELECT g.scenario, g.st, COALESCE(cv.t_e6, 0) AS tconv
       |        FROM mgrid g LEFT JOIN (SELECT "from", t_e6 FROM mt WHERE "to" = 'CONV') cv
       |          ON cv."from" = g.st),
       |mtx AS (SELECT s.scenario, t."from", t."to", t.t_e6
       |       FROM msc s JOIN mt t ON t."from" <> s.scenario
       |       WHERE t."to" NOT IN ('CONV', 'NULL')),
       |mp0 AS (SELECT scenario, st, CAST(tconv AS BIGINT) AS p FROM mtc),
       |$iters,
       |mbase AS (SELECT p FROM mp$K WHERE scenario = '__none' AND st = 'START')
       |SELECT p.scenario AS channel, CAST(p.p AS BIGINT) AS p_conv_start_e6,
       |  CAST(CASE WHEN b.p = 0 THEN 0
       |            ELSE 1000000 - p.p * 1000000 // b.p END AS BIGINT) AS removal_effect_e6
       |FROM mp$K p CROSS JOIN mbase b
       |WHERE p.st = 'START' AND p.scenario <> '__none'""".stripMargin
  }

  /** DuckDB side of `kmeans_fit`: the identical KmeansRounds Lloyd
    * rounds unrolled CTE by CTE (the bt_event_scores oracle discipline)
    * — same e3 quantization, truncating integer centroid means, and
    * (d2, c) lexicographic argmin via row_number. */
  /** The Lloyd-round CTE chain for one (k, prefix): seeds → kc0 →
    * rounds → final assignment `${p}af` (vec_id, c, d2) and final
    * centroids `${p}c$R`. Shared `kflat` is emitted by the caller. */
  private def kmeansCtes(k: Int, p: String): String = {
    val rounds = (1 to KmeansRounds).map { r =>
      s"""${p}d$r AS (SELECT f.vec_id, c.c, CAST(sum((f.q - c.m) * (f.q - c.m)) AS BIGINT) AS d2
         |        FROM kflat f JOIN ${p}c${r - 1} c ON f.pos = c.pos GROUP BY 1, 2),
         |${p}a$r AS (SELECT vec_id, c FROM (
         |          SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         |          FROM ${p}d$r) WHERE rn = 1),
         |${p}c$r AS (SELECT a.c, f.pos, CAST(sum(f.q) // count(*) AS BIGINT) AS m
         |        FROM kflat f JOIN ${p}a$r a USING (vec_id) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val R = KmeansRounds
    s"""${p}seeds AS (SELECT vec_id AS c FROM embeddings ORDER BY vec_id LIMIT $k),
       |${p}c0 AS (SELECT s.c, f.pos, f.q AS m FROM kflat f JOIN ${p}seeds s ON f.vec_id = s.c),
       |$rounds,
       |${p}df AS (SELECT f.vec_id, c.c, CAST(sum((f.q - c.m) * (f.q - c.m)) AS BIGINT) AS d2
       |        FROM kflat f JOIN ${p}c$R c ON f.pos = c.pos GROUP BY 1, 2),
       |${p}af AS (SELECT vec_id, c, d2 FROM (
       |          SELECT vec_id, c, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
       |          FROM ${p}df) WHERE rn = 1)""".stripMargin
  }

  private val kflatCte: String =
    """kflat AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |         CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS q
      |  FROM embeddings)""".stripMargin

  private def kmeansOracle: String = {
    val R = KmeansRounds
    s"""WITH $kflatCte,
       |${kmeansCtes(KmeansK, "k")},
       |ksz AS (SELECT c, CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(d2) AS BIGINT) AS inertia_q2
       |        FROM kaf GROUP BY 1),
       |kl1 AS (SELECT c, CAST(sum(abs(m)) AS BIGINT) AS cent_l1 FROM kc$R GROUP BY 1)
       |SELECT ksz.c AS cluster_id, n_vecs, inertia_q2, cent_l1
       |FROM ksz JOIN kl1 USING (c)""".stripMargin
  }

  /** DuckDB side of `kmeans_k_sweep`: the Lloyd chain instantiated per k
    * with prefixed CTE names over ONE shared kflat, elbow rows unioned. */
  private def kmeansSweepOracle: String = {
    val blocks = KmeansSweepKs.zip(Seq("ksa", "ksb", "ksc"))
    val ctes = blocks.map { case (k, p) => kmeansCtes(k, p) }.mkString(",\n")
    val selects = blocks.map { case (k, p) =>
      s"""SELECT CAST($k AS BIGINT) AS k, CAST(count(DISTINCT c) AS BIGINT) AS n_clusters,
         |  CAST(sum(d2) AS BIGINT) AS inertia_q2 FROM ${p}af""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH $kflatCte,\n$ctes\n$selects"
  }

  /** DuckDB side of [[Tables.partsupp]]: the same distinct-pairs +
    * closed-form integer-key arithmetic, so the four partsupp-family
    * oracles (Q2/Q9/Q11/Q20) rebuild the IDENTICAL relation from the same
    * parquet — the generated-oracle discipline of the hash-family
    * oracles above. */
  private val partsuppCte: String =
    """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         (l_partkey * 7 + l_suppkey * 13) % 9999 + 1 AS ps_availqty,
      |         (l_partkey * 31 + l_suppkey * 17) % 100000 + 100 AS ps_supplycost_cents
      |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))""".stripMargin

  def oracleSql: Map[String, String] = Map(
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

    "shard_balance" ->
      s"""WITH t AS (SELECT doc_id,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |            FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |        row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) - 1 AS rn
        |      FROM t),
        |a AS (SELECT n_tok,
        |  CAST(CASE WHEN (rn // $ShardK) % 2 = 0 THEN rn % $ShardK
        |       ELSE ${ShardK - 1} - rn % $ShardK END AS INTEGER) AS shard
        |  FROM r)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS sum_tok
        |FROM a GROUP BY 1""".stripMargin,

    "incr_cov_view" ->
      s"""WITH fin AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 0
        |  UNION ALL
        |  SELECT vec_id, list_reverse(embedding) AS embedding
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |${embeddingCovCtesFrom("fin")}
        |SELECT i, j, cov_q FROM cov""".stripMargin,

    "cosine_topk" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, sum(a.x * b.x) AS dp
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  GROUP BY a.vec_id, b.vec_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         round(dp / (na.nrm * nb.nrm), 6) AS cosine_sim
        |  FROM dots JOIN norms na ON query_id = na.vec_id
        |            JOIN norms nb ON neighbor_id = nb.vec_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |                                   ORDER BY cosine_sim DESC, neighbor_id ASC) AS "rank"
        |      FROM scored)
        |SELECT query_id, neighbor_id, cosine_sim, CAST("rank" AS INTEGER) AS "rank" FROM r WHERE "rank" <= 5""".stripMargin,

    "maxsim_topk" ->
      s"""WITH msflat AS (
        |  SELECT vec_id, vec_id // $MaxSimGroup AS doc_id,
        |         generate_subscripts(embedding, 1) AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |msnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM msflat GROUP BY vec_id),
        |mspanel AS (SELECT doc_id FROM (SELECT DISTINCT doc_id FROM msflat)
        |            ORDER BY ${dh("CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC
        |            LIMIT $MaxSimPanel),
        |msdots AS (
        |  SELECT a.doc_id AS query_doc, a.vec_id AS q_tok,
        |         b.doc_id AS neighbor_doc, b.vec_id AS c_tok,
        |         sum(a.x * b.x) AS dp
        |  FROM msflat a JOIN msflat b ON a.i = b.i AND a.doc_id <> b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM mspanel)
        |  GROUP BY 1, 2, 3, 4),
        |mscos AS (
        |  SELECT query_doc, q_tok, neighbor_doc,
        |         max(round(dp / (na.nrm * nb.nrm), 6)) AS m
        |  FROM msdots JOIN msnorms na ON q_tok = na.vec_id
        |              JOIN msnorms nb ON c_tok = nb.vec_id
        |  GROUP BY 1, 2, 3),
        |msscore AS (SELECT query_doc, neighbor_doc, round(sum(m), 6) AS maxsim
        |            FROM mscos GROUP BY 1, 2),
        |msr AS (SELECT *, row_number() OVER (PARTITION BY query_doc
        |          ORDER BY maxsim DESC, neighbor_doc ASC) AS "rank" FROM msscore)
        |SELECT query_doc, neighbor_doc, maxsim, CAST("rank" AS INTEGER) AS "rank"
        |FROM msr WHERE "rank" <= $AnnK""".stripMargin,

    "near_dup_embeddings" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dp
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id)
        |SELECT id_a, id_b, cosine_sim FROM (
        |  SELECT id_a, id_b, round(dp / (na.nrm * nb.nrm), 6) AS cosine_sim
        |  FROM dots JOIN norms na ON id_a = na.vec_id
        |            JOIN norms nb ON id_b = nb.vec_id)
        |WHERE cosine_sim >= 0.4""".stripMargin,

    // pair tier = the near_dup_lsh candidate chain (same NdBits/NdTables
    // hyperplanes, Hamming-1 probes, exact rescoring) feeding the same
    // recursive min-label closure — mirrors the Spark side's
    // lshNearDupPairs → connectedComponents re-pointing
    "dedup_embed_keepers" ->
      s"""WITH RECURSIVE ${lshBucketCtes(NdBits, NdTables)}
        |cand AS (
        |  SELECT DISTINCT p.vec_id AS id_a, c.vec_id AS id_b
        |  FROM probes p JOIN buckets c
        |    ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id < c.vec_id),
        |${pairScoreCtes("id_a", "id_b")},
        |p AS (SELECT id_a, id_b FROM scored WHERE cosine_sim >= $NdThreshold),
        |e AS (SELECT id_a AS src, id_b AS dst FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |v AS (SELECT DISTINCT src AS id FROM e),
        |reach(id, r) AS (
        |  SELECT id, id FROM v
        |  UNION
        |  SELECT e.dst, reach.r FROM e JOIN reach ON e.src = reach.id),
        |losers AS (SELECT id FROM reach GROUP BY id HAVING id != min(r))
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers)""".stripMargin,

    "corpus_curate" ->
      """WITH t AS (
        |  SELECT doc_id, text, lang, source, string_split(text, ' ') AS ws,
        |         CAST(length(text) AS DOUBLE) AS nchars
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, lang, source, ws, nchars,
        |         CAST(len(ws) AS DOUBLE) AS ntok,
        |         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha
        |  FROM t),
        |q AS (
        |  SELECT doc_id, text, lang, source, ws,
        |    CAST(CASE WHEN nchars = 0 THEN 0 ELSE floor((
        |      least(ntok / 100.0, 1.0) * 0.3
        |      + (alpha / nchars) * 0.3
        |      + (CASE WHEN (nchars - (ntok - 1)) / ntok BETWEEN 2.0 AND 12.0
        |              THEN 1.0 ELSE 0.3 END) * 0.2
        |      + (CASE WHEN len(list_intersect(ws,
        |           ['the','a','an','and','of','to','in','is','it','that'])) > 0
        |              THEN 1.0 ELSE 0.5 END) * 0.2) * 1000000.0 + 0.5) END AS BIGINT) AS quality_e6
        |  FROM s),
        |g3 AS (SELECT doc_id, count(DISTINCT array_to_string(ws[i:i+2], ' ')) AS d,
        |              any_value(len(ws)) - 2 AS tot
        |       FROM t, UNNEST(range(1, len(ws) - 1)) AS r(i) WHERE len(ws) >= 3
        |       GROUP BY doc_id),
        |r AS (SELECT q.doc_id, q.text, q.lang, q.source, q.quality_e6,
        |        CAST(floor(COALESCE((g3.tot - g3.d) * 1.0 / g3.tot, 0.0)
        |                   * 1000000.0 + 0.5) AS BIGINT) AS rep3_e6
        |      FROM q LEFT JOIN g3 USING (doc_id)),
        |f AS (SELECT * FROM r WHERE quality_e6 >= 800000 AND rep3_e6 <= 10000),
        |k AS (SELECT doc_id, lang, source, quality_e6, rep3_e6, text,
        |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |      FROM f)
        |SELECT doc_id, lang, source, quality_e6, rep3_e6 FROM k
        |WHERE rn = 1
        |  AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 < 5000""".stripMargin,

    "doc_quality" -> docQualityOracle,

    "doc_lang" -> docLangOracle,
    "span_corruption" ->
      s"""WITH sct AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |scp AS (SELECT doc_id, UNNEST(range(0, len(ws))) AS pos FROM sct),
        |scm AS (SELECT doc_id, pos FROM scp
        |        WHERE ${dh("CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")}
        |              % 100 < $SpanMaskPct),
        |scs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked,
        |          CAST(sum(CASE WHEN prev IS NULL OR pos - prev > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
        |        FROM (SELECT doc_id, pos,
        |                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM scm)
        |        GROUP BY 1),
        |scn AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents)
        |SELECT n.doc_id, n.n_tokens,
        |  COALESCE(s.n_masked, 0) AS n_masked, COALESCE(s.n_spans, 0) AS n_spans,
        |  COALESCE(s.n_masked, 0) * 1000000 // n.n_tokens AS mask_rate_e6
        |FROM scn n LEFT JOIN scs s USING (doc_id)""".stripMargin,
    "doc_lang_confusion" ->
      s"""WITH lcp AS (SELECT d.lang, p.lang_pred
        |            FROM documents d JOIN ($docLangOracle) p USING (doc_id)),
        |lcc AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        |        FROM lcp GROUP BY 1, 2),
        |lct AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |          CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS BIGINT) AS ok
        |        FROM lcc)
        |SELECT lang, lang_pred, n, CAST(ok * 1000000 // nn AS BIGINT) AS accuracy_e6
        |FROM lcc CROSS JOIN lct""".stripMargin,
    "dup_threshold_sweep" ->
      """WITH RECURSIVE tstoks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |tsgrams AS (
        |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS gram
        |  FROM tstoks, UNNEST(range(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 3),
        |tssizes AS (SELECT doc_id, count(*) AS n FROM tsgrams GROUP BY doc_id),
        |tsinter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM tsgrams a JOIN tsgrams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |tspj AS (SELECT i.id_a, i.id_b,
        |           CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS j
        |         FROM tsinter i JOIN tssizes sa ON i.id_a = sa.doc_id
        |                        JOIN tssizes sb ON i.id_b = sb.doc_id),
        |tsth(t_e6) AS (VALUES (250000), (500000), (750000)),
        |tsp3 AS (SELECT t_e6, id_a, id_b FROM tspj JOIN tsth
        |           ON tspj.j >= t_e6 / 1000000.0),
        |tse3 AS (SELECT t_e6, id_a AS src, id_b AS dst FROM tsp3
        |         UNION SELECT t_e6, id_b, id_a FROM tsp3),
        |tsv3 AS (SELECT DISTINCT t_e6, src AS id FROM tse3),
        |tsreach(t_e6, id, r) AS (
        |  SELECT t_e6, id, id FROM tsv3
        |  UNION
        |  SELECT e.t_e6, e.dst, tsreach.r FROM tse3 e
        |  JOIN tsreach ON e.src = tsreach.id AND e.t_e6 = tsreach.t_e6),
        |tslab AS (SELECT t_e6, id, min(r) AS cluster_id FROM tsreach GROUP BY 1, 2),
        |tscs AS (SELECT t_e6, cluster_id, CAST(count(*) AS BIGINT) AS sz
        |         FROM tslab GROUP BY 1, 2),
        |tses AS (SELECT t_e6, CAST(count(*) AS BIGINT) AS n_edges FROM tsp3 GROUP BY 1),
        |tsx AS (SELECT t_e6, CAST(sum(sz) AS BIGINT) AS n_nodes,
        |          CAST(count(*) AS BIGINT) AS n_components,
        |          CAST(max(sz) AS BIGINT) AS max_component
        |        FROM tscs GROUP BY 1)
        |SELECT CAST(tsth.t_e6 AS BIGINT) AS threshold_e6,
        |  COALESCE(tses.n_edges, 0) AS n_edges,
        |  COALESCE(tsx.n_nodes, 0) AS n_nodes,
        |  COALESCE(tsx.n_components, 0) AS n_components,
        |  COALESCE(tsx.max_component, 0) AS max_component
        |FROM tsth LEFT JOIN tses ON tses.t_e6 = tsth.t_e6
        |          LEFT JOIN tsx ON tsx.t_e6 = tsth.t_e6""".stripMargin,

    "doc_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(CASE WHEN len(string_split(text, ' ')) >= 3
        |      THEN len(list_distinct([array_to_string(string_split(text, ' ')[i:i+2], ' ')
        |           for i in range(1, len(string_split(text, ' ')) - 1)]))
        |      ELSE 0 END AS BIGINT) AS n_grams3
        |FROM documents""".stripMargin,

    "phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM t, UNNEST(range(1, len(ws))) AS u(i)
        |WHERE ws[i] = 'table' AND ws[i + 1] = 'scan'
        |GROUP BY doc_id""".stripMargin,

    "doc_redact" ->
      """SELECT doc_id,
        | regexp_replace(
        |   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS clean
        |FROM documents""".stripMargin,

    "sample_docs" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 < 2500""".stripMargin,

    "train_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 10000 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 8000 THEN 'train'
        |            WHEN bucket < 9000 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs
        |FROM b GROUP BY 1""".stripMargin,

    "bloom_prune_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |GROUP BY 1""".stripMargin,

    "incr_agg" ->
      """WITH q AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        |       min(v) AS min_v, max(v) AS max_v,
        |       CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_v
        |FROM q GROUP BY 1""".stripMargin,

    // every op predicted from the merge arithmetic: seed = %10≠0;
    // upsert(%5==0, +1000); delete(%7==0, matched-only). insert = joined
    // the table after v0 and survived the delete; delete = in v0, gone by
    // v2 (values as of v0); update = in both with the upserted value. A
    // row inserted then deleted inside the window is NOT a change
    "snapshot_changes" ->
      """SELECT CASE
        |         WHEN doc_id % 10 = 0 AND doc_id % 7 <> 0 THEN 'insert'
        |         WHEN doc_id % 10 <> 0 AND doc_id % 7 = 0 THEN 'delete'
        |         WHEN doc_id % 10 <> 0 AND doc_id % 5 = 0 THEN 'update'
        |       END AS op,
        |       doc_id,
        |       CASE WHEN doc_id % 10 <> 0 AND doc_id % 7 = 0 THEN n_chars
        |            ELSE n_chars + 1000 END AS n_chars,
        |       lang
        |FROM documents
        |WHERE (doc_id % 10 = 0 AND doc_id % 7 <> 0)
        |   OR (doc_id % 10 <> 0 AND doc_id % 7 = 0)
        |   OR (doc_id % 10 <> 0 AND doc_id % 5 = 0 AND doc_id % 7 <> 0)""".stripMargin,

    "snapshot_changes_where" ->
      """SELECT op, doc_id, n_chars, lang FROM (
        |  SELECT CASE
        |           WHEN doc_id % 10 = 0 AND doc_id % 7 <> 0 THEN 'insert'
        |           WHEN doc_id % 10 <> 0 AND doc_id % 7 = 0 THEN 'delete'
        |           WHEN doc_id % 10 <> 0 AND doc_id % 5 = 0 THEN 'update'
        |         END AS op,
        |         doc_id,
        |         CASE WHEN doc_id % 10 <> 0 AND doc_id % 7 = 0 THEN n_chars
        |              ELSE n_chars + 1000 END AS n_chars,
        |         lang,
        |         CASE WHEN doc_id % 10 <> 0 THEN n_chars END AS old_chars,
        |         CASE WHEN doc_id % 7 <> 0 THEN n_chars + 1000 END AS new_chars
        |  FROM documents
        |  WHERE (doc_id % 10 = 0 AND doc_id % 7 <> 0)
        |     OR (doc_id % 10 <> 0 AND doc_id % 7 = 0)
        |     OR (doc_id % 10 <> 0 AND doc_id % 5 = 0 AND doc_id % 7 <> 0))
        |WHERE (old_chars BETWEEN 250 AND 1250)
        |   OR (new_chars BETWEEN 250 AND 1250)""".stripMargin,

    "snapshot_read_where" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars,
        |       lang
        |FROM documents
        |WHERE (doc_id % 10 <> 0 OR doc_id % 5 = 0)
        |  AND doc_id % 7 <> 0
        |  AND (CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
        |            ELSE n_chars END) BETWEEN 250 AND 1250""".stripMargin,

    // the oracle recomputes the mart from the closed-form FINAL state of
    // the pinned CDF window (live rows: seed %10≠0 plus upserted %5==0,
    // minus deleted %7==0; upserted rows carry n_chars+1000) — hash
    // equality proves the retraction-maintained mart identical to the
    // recompute it never performed
    "ivm_cdf_mart" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
        |                     ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE (doc_id % 10 <> 0 OR doc_id % 5 = 0) AND doc_id % 7 <> 0
        |GROUP BY 1""".stripMargin,

    // full recompute over the LIVE rows (inserts minus retracted ids) —
    // hash equality proves the changelog-merged snapshot identical
    "incr_agg_retract" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_v
        |FROM events WHERE event_id % 5 <> 0 GROUP BY 1""".stripMargin,

    // the oracle is the FULL recomputation — hash equality proves the
    // maintained delta-join view identical to rejoining from scratch
    "incr_join_view" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,

    "dedup_stream_replay" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY event_id % 3, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,

    // closed form of the transformWithState running profile's Update-mode
    // emissions: per batch b, users touched in b emit their fold over
    // batches 0..b; mode ties resolve (count DESC, type ASC)
    "tws_profile_replay" ->
      """WITH e AS (
        |  SELECT event_id % 3 AS b, user_id, event_type,
        |         coalesce(CAST(round(value * 100) AS BIGINT), 0) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |bs AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(batch_id)),
        |cum AS (SELECT bs.batch_id, e.user_id, e.event_type, e.cents
        |        FROM bs JOIN e ON e.b <= bs.batch_id),
        |agg AS (SELECT batch_id, user_id,
        |               CAST(count(*) AS BIGINT) AS n_events,
        |               CAST(sum(cents) AS BIGINT) AS sum_cents,
        |               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |        FROM cum GROUP BY 1, 2),
        |tc AS (SELECT batch_id, user_id, event_type, count(*) AS c
        |       FROM cum GROUP BY 1, 2, 3),
        |top AS (SELECT batch_id, user_id, event_type AS top_type FROM (
        |          SELECT batch_id, user_id, event_type,
        |                 row_number() OVER (PARTITION BY batch_id, user_id
        |                                    ORDER BY c DESC, event_type ASC) AS rn
        |          FROM tc) WHERE rn = 1),
        |touched AS (SELECT DISTINCT b AS batch_id, user_id FROM e)
        |SELECT a.batch_id, a.user_id, a.n_events, a.sum_cents, a.n_types,
        |       t.top_type
        |FROM agg a
        |JOIN top t ON a.batch_id = t.batch_id AND a.user_id = t.user_id
        |JOIN touched u ON a.batch_id = u.batch_id AND a.user_id = u.user_id""".stripMargin,

    "incr_snapshot_versioned" ->
      """WITH q AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        |       min(v) AS min_v, max(v) AS max_v
        |FROM q GROUP BY 1""".stripMargin,

    // MERGE semantics in closed form: the upsert keeps non-overlapping
    // target rows and takes every source row (updated n_chars); the
    // delete keeps exactly the target rows no source row matches
    "snapshot_merge_upsert" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |WHERE doc_id % 10 <> 0 AND doc_id % 5 <> 0
        |UNION ALL
        |SELECT doc_id, n_chars + 1000 AS n_chars, lang FROM documents
        |WHERE doc_id % 5 = 0""".stripMargin,

    "snapshot_merge_delete" ->
      """SELECT doc_id, n_chars, lang FROM documents
        |WHERE doc_id % 10 <> 0 AND doc_id % 5 <> 0""".stripMargin,

    "snapshot_purge_replay" ->
      """SELECT 'v0' AS at, doc_id, n_chars FROM documents
        |WHERE doc_id % 10 <> 0 AND doc_id % 997 <> 3
        |UNION ALL
        |SELECT 'cur' AS at, doc_id,
        |       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE (doc_id % 10 <> 0 OR doc_id % 5 = 0) AND doc_id % 997 <> 3""".stripMargin,

    "snapshot_merge_mark_stale" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 4 = 0 THEN n_chars + 2000
        |            ELSE n_chars END AS n_chars,
        |       CASE WHEN doc_id % 4 <> 0 AND n_chars < 500 THEN 'stale'
        |            ELSE lang END AS lang
        |FROM documents""".stripMargin,

    "snapshot_merge_full_sync" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN n_chars + 1000
        |            ELSE n_chars END AS n_chars,
        |       lang
        |FROM documents
        |WHERE doc_id % 3 = 0
        |   OR (doc_id % 10 <> 0 AND NOT (n_chars < 500))""".stripMargin,

    // upsert replay in closed form: the surviving row per user comes from
    // the highest batch (event_id % 3) the user appears in, and within
    // that batch the highest event_id (the sink's orderCol)
    "cdc_merge_replay" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS v_cents,
        |         event_id % 3 AS b
        |  FROM events),
        |r AS (SELECT user_id, event_type, v_cents,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY b DESC, event_id DESC) AS rn
        |      FROM e)
        |SELECT user_id, event_type, v_cents FROM r WHERE rn = 1""".stripMargin,

    "mor_delta_replay" ->
      """WITH me AS (
        |  SELECT user_id, event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS v_cents,
        |         event_id % 3 AS b
        |  FROM events),
        |mr AS (SELECT user_id, event_type, v_cents,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY b DESC, event_id DESC) AS rn
        |       FROM me)
        |SELECT user_id, event_type, v_cents FROM mr
        |WHERE rn = 1 AND user_id % 7 <> 0""".stripMargin,

    "incr_snapshot_replay" ->
      """WITH q AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS sum_v,
        |       min(v) AS min_v, max(v) AS max_v
        |FROM q GROUP BY 1""".stripMargin,

    "source_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT lang, n,
        |        least(n, CAST(sum(n) OVER () AS BIGINT) // CAST(count(*) OVER () AS BIGINT)) AS tgt
        |      FROM c)
        |SELECT d.doc_id, d.source, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % t.n < t.tgt""".stripMargin,

    "lang_mix_weighted" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT lang, n,
        |        least(n, CAST(floor(CAST(sum(n) OVER () AS DOUBLE) *
        |          CASE WHEN lang = 'en' THEN 0.2 ELSE 1.0 END) AS BIGINT)) AS tgt
        |      FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN t USING (lang)
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % t.n < t.tgt""".stripMargin,

    "temperature_mix" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |p AS (SELECT lang, n,
         |        CAST(floor(pow(CAST(n AS DOUBLE), 0.5) * 1000000.0 + 0.5) AS BIGINT) AS p
         |      FROM c),
         |t AS (SELECT lang, n,
         |        least(n, CAST(floor(250.0 *
         |          (CAST(p AS DOUBLE) / CAST(sum(p) OVER () AS DOUBLE))) AS BIGINT)) AS tgt
         |      FROM p)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN t USING (lang)
         |WHERE ${dh("CAST(d.doc_id AS VARCHAR)")} % t.n < t.tgt""".stripMargin,

    "user_set_ops" ->
      """SELECT
        |  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events
        |                         INTERSECT
        |                         SELECT DISTINCT o_custkey FROM orders)) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events
        |                         EXCEPT
        |                         SELECT DISTINCT o_custkey FROM orders)) AS n_except""".stripMargin,

    "length_buckets" ->
      """SELECT CAST(length(bin(CAST(len(string_split(text, ' ')) AS BIGINT))) AS INT) AS bucket_id,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,

    "pack_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source, n_tokens, n_tokens + 1 AS len,
        |         CAST(sum(n_tokens + 1) OVER (PARTITION BY source ORDER BY doc_id
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) - (n_tokens + 1) AS in_off
        |  FROM t),
        |b AS (SELECT source, sum(n_tokens + 1) AS tot FROM t GROUP BY source),
        |o AS (SELECT source, CAST(COALESCE(sum(tot) OVER (ORDER BY source
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
        |      FROM b)
        |SELECT g.doc_id, g.source, g.n_tokens,
        |       o.base + g.in_off AS start_off,
        |       (o.base + g.in_off) // 2048 AS first_seq,
        |       ((o.base + g.in_off + g.len - 1) // 2048) - ((o.base + g.in_off) // 2048) + 1 AS n_seqs
        |FROM g JOIN o USING (source)""".stripMargin,

    "corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        | round(avg(length(text)), 4) AS avg_chars,
        | round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
        |FROM documents GROUP BY lang, source""".stripMargin,

    "dedup_by_fingerprint" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |               THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp
        |  FROM (
        |    SELECT doc_id,
        |           list_reduce(
        |             list_prepend(0::HUGEINT,
        |               [ord(c)::HUGEINT for c in regexp_extract_all(text, '.')]),
        |             (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS h
        |    FROM documents))
        |SELECT fp, min(doc_id) AS keeper_id, count(*) AS n_dups FROM f GROUP BY fp""".stripMargin,

    "doc_fingerprint" ->
      """SELECT doc_id,
        | CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |       THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp
        |FROM (
        |  SELECT doc_id,
        |         list_reduce(
        |           list_prepend(0::HUGEINT,
        |             [ord(c)::HUGEINT for c in regexp_extract_all(text, '.')]),
        |           (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS h
        |  FROM documents)""".stripMargin,

    // jw_e6 parity: the Spark side is the exact rational; DuckDB's builtin
    // computes doubles — verified equal on every candidate pair at all
    // three SFs (221k pairs, 0 disagreements) after pinning boost-at->=0.7
    "jw_name_pairs" ->
      s"""WITH k AS (
        |  SELECT p_partkey, lower(p_name) AS nm,
        |         row_number() OVER (ORDER BY lower(p_name), p_partkey) AS rn
        |  FROM part)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |       CAST(floor(jaro_winkler_similarity(a.nm, b.nm) * 1000000.0
        |                  + 0.5) AS BIGINT) AS jw_e6
        |FROM k a JOIN k b ON b.rn - a.rn BETWEEN 1 AND $JwWindow
        |WHERE CAST(floor(jaro_winkler_similarity(a.nm, b.nm) * 1000000.0
        |                 + 0.5) AS BIGINT) >= $JwThreshold""".stripMargin,

    "sorted_neighborhood_pairs" ->
      s"""WITH k AS (
        |  SELECT doc_id, substr(coalesce(lower(text), ''), 1, $SnmKeyLen) AS snm_key,
        |         row_number() OVER (ORDER BY substr(coalesce(lower(text), ''), 1, $SnmKeyLen),
        |                            doc_id) AS rn
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(b.rn - a.rn AS BIGINT) AS rank_dist,
        |       CAST(CASE WHEN substr(a.snm_key, 1, $SnmBlockLen) =
        |                      substr(b.snm_key, 1, $SnmBlockLen)
        |                 THEN 1 ELSE 0 END AS BIGINT) AS block_match
        |FROM k a JOIN k b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow""".stripMargin,

    "basket_triples" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_baskets FROM b)
        |SELECT x.brand AS b1, y.brand AS b2, z.brand AS b3,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM b x JOIN b y ON x.okey = y.okey AND x.brand < y.brand
        |         JOIN b z ON y.okey = z.okey AND y.brand < z.brand
        |CROSS JOIN tot
        |GROUP BY 1, 2, 3, tot.n_baskets
        |HAVING CAST(count(*) AS BIGINT) * 1000 >= tot.n_baskets * 3""".stripMargin,

    "basket_lift_recs" ->
      s"""WITH b AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_a FROM b GROUP BY 1),
        |t AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM b),
        |p AS (
        |  SELECT x.brand AS brand, y.brand AS rec_brand,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |  FROM b x JOIN b y ON x.okey = y.okey AND x.brand <> y.brand
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT p.brand, p.rec_brand, p.n_ab,
        |         CAST(CAST(p.n_ab AS HUGEINT) * 1000000 * t.n_orders
        |              // (CAST(ma.n_a AS HUGEINT) * mb.n_a) AS BIGINT) AS lift_e6
        |  FROM p JOIN m ma ON p.brand = ma.brand
        |         JOIN m mb ON p.rec_brand = mb.brand, t)
        |SELECT brand, rec_brand, n_ab, lift_e6, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY brand
        |    ORDER BY lift_e6 DESC, n_ab DESC, rec_brand) AS BIGINT) AS rnk
        |  FROM sc) WHERE rnk <= $RecTopK""".stripMargin,

    "cuped_adjusted" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |bd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |pu AS (
        |  SELECT user_id,
        |    CAST(coalesce(sum(CASE WHEN us < (SELECT mid FROM bd) THEN cents END),
        |         0) AS HUGEINT) AS pre,
        |    CAST(coalesce(sum(CASE WHEN us >= (SELECT mid FROM bd) THEN cents END),
        |         0) AS HUGEINT) AS post
        |  FROM ev GROUP BY 1),
        |st AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(pre) AS sx, sum(post) AS sy,
        |         sum(pre*pre) AS sxx, sum(post*post) AS syy, sum(pre*post) AS sxy
        |  FROM pu)
        |SELECT CAST(n AS BIGINT) AS n_users,
        |  CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
        |       (abs(n*sxy - sx*sy) * 1000000 // nullif(n*sxx - sx*sx, 0))
        |    AS BIGINT) AS theta_e6,
        |  CAST((abs(n*sxy - sx*sy) * 1000 // nullif(n*sxx - sx*sx, 0)) *
        |       (abs(n*sxy - sx*sy) * 1000 // nullif(n*syy - sy*sy, 0)) AS BIGINT)
        |    AS var_reduction_e6
        |FROM st""".stripMargin,

    "decayed_popularity" ->
      s"""WITH RECURSIVE coef(age_days, coef_e6) AS (
        |  SELECT 0, CAST(1000000 AS BIGINT)
        |  UNION ALL
        |  SELECT age_days + 1, coef_e6 * $DecayK30 // 1000000
        |  FROM coef WHERE age_days < $DecayMaxAge),
        |bd AS (SELECT max(CAST(l_shipdate AS DATE)) AS maxd FROM lineitem),
        |li AS (
        |  SELECT l_partkey,
        |         date_diff('day', CAST(l_shipdate AS DATE),
        |                   (SELECT maxd FROM bd)) AS age_days,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(cents * coalesce(coef_e6, 0) // 1000000) AS BIGINT)
        |         AS decayed_cents,
        |       CAST(sum(cents) AS BIGINT) AS raw_cents
        |FROM li LEFT JOIN coef USING (age_days)
        |     JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,

    "golden_records" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         lpad(CAST(epoch_us(ts) AS VARCHAR), 19, '0') ||
        |         lpad(CAST(event_id AS VARCHAR), 19, '0') AS ord
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, min(ts) AS first_seen, max(ts) AS last_seen,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       arg_max(event_type, ord) AS last_type,
        |       arg_max(CAST(round(value * 100) AS BIGINT),
        |               CASE WHEN value IS NOT NULL THEN ord END)
        |         AS last_value_cents
        |FROM ev GROUP BY 1""".stripMargin,

    "km_churn_curve" ->
      s"""WITH RECURSIVE bd AS (
        |  SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
        |pu AS (
        |  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS fd,
        |         max(CAST(o_orderdate AS DATE)) AS ld
        |  FROM orders GROUP BY 1),
        |lt AS (
        |  SELECT CAST(date_diff('day', fd, ld) AS BIGINT) AS lifetime,
        |         CASE WHEN date_diff('day', ld, (SELECT maxd FROM bd))
        |                   > $KmCensorGapDays THEN 1 ELSE 0 END AS dead
        |  FROM pu),
        |pl AS (
        |  SELECT lifetime, CAST(sum(dead) AS BIGINT) AS d,
        |         CAST(sum(1 - dead) AS BIGINT) AS c
        |  FROM lt GROUP BY 1),
        |o AS (
        |  SELECT lifetime, d,
        |         CAST(sum(d + c) OVER (ORDER BY lifetime DESC
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
        |         CAST(row_number() OVER (ORDER BY lifetime) AS BIGINT) AS rn
        |  FROM pl),
        |km AS (
        |  SELECT rn, lifetime, n_risk, d,
        |         1000000 * (n_risk - d) // n_risk AS surv
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.lifetime, o.n_risk, o.d,
        |         km.surv * (o.n_risk - o.d) // o.n_risk
        |  FROM km JOIN o ON o.rn = km.rn + 1)
        |SELECT lifetime AS lifetime_days, n_risk, d AS n_deaths,
        |       CAST(surv AS BIGINT) AS surv_e6
        |FROM km""".stripMargin,

    "rfm_segments" ->
      """WITH bd AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
        |cu AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |              (SELECT maxd FROM bd)) AS BIGINT) AS recency_days,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS monetary_cents
        |  FROM orders GROUP BY 1),
        |th AS (
        |  SELECT quantile_cont(recency_days, 0.25) AS r1,
        |         quantile_cont(recency_days, 0.5) AS r2,
        |         quantile_cont(recency_days, 0.75) AS r3,
        |         quantile_cont(frequency, 0.25) AS f1,
        |         quantile_cont(frequency, 0.5) AS f2,
        |         quantile_cont(frequency, 0.75) AS f3,
        |         quantile_cont(monetary_cents, 0.25) AS m1,
        |         quantile_cont(monetary_cents, 0.5) AS m2,
        |         quantile_cont(monetary_cents, 0.75) AS m3
        |  FROM cu),
        |sc AS (
        |  SELECT monetary_cents,
        |    4 - (CASE WHEN recency_days > r1 THEN 1 ELSE 0 END)
        |      - (CASE WHEN recency_days > r2 THEN 1 ELSE 0 END)
        |      - (CASE WHEN recency_days > r3 THEN 1 ELSE 0 END) AS r_score,
        |    1 + (CASE WHEN frequency > f1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency > f2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN frequency > f3 THEN 1 ELSE 0 END) AS f_score,
        |    1 + (CASE WHEN monetary_cents > m1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary_cents > m2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN monetary_cents > m3 THEN 1 ELSE 0 END) AS m_score
        |  FROM cu, th)
        |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS segment,
        |       CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
        |FROM sc GROUP BY 1""".stripMargin,

    "ppr_brand_recs" -> pprBrandOracle,

    "ab_test_zsq" ->
      """WITH arms AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS converted
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |st AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n_b,
        |    CAST(coalesce(sum(CASE WHEN arm = 0 THEN converted END), 0)
        |         AS HUGEINT) AS x_a,
        |    CAST(coalesce(sum(CASE WHEN arm = 1 THEN converted END), 0)
        |         AS HUGEINT) AS x_b
        |  FROM arms)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST(x_a AS BIGINT) AS x_a, CAST(x_b AS BIGINT) AS x_b,
        |       CAST((x_a*n_b - x_b*n_a) * (x_a*n_b - x_b*n_a) * (n_a + n_b)
        |            * 1000000 // nullif(n_a * n_b * (x_a + x_b)
        |            * (n_a + n_b - x_a - x_b), 0) AS BIGINT) AS z2_e6
        |FROM st""".stripMargin,

    "vocab_coverage_curve" ->
      s"""WITH tk AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
        |       FROM tk WHERE tok <> '' GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tf),
        |r AS (
        |  SELECT CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
        |           AS vocab_size,
        |         CAST(sum(n) OVER (ORDER BY n DESC, tok
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM tf)
        |SELECT vocab_size, cum_tokens,
        |       CAST(cum_tokens * 1000000 // (SELECT total FROM tot) AS BIGINT)
        |         AS coverage_e6
        |FROM r WHERE vocab_size IN (${VocabSizes.mkString(", ")})""".stripMargin,

    "event_funnel_windowed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL),
        |v AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN us END) AS t_view
        |  FROM ev GROUP BY 1),
        |c AS (
        |  SELECT ev.user_id, any_value(v.t_view) AS t_view,
        |         min(CASE WHEN ev.event_type = 'click'
        |                   AND ev.us > v.t_view
        |                   AND ev.us <= v.t_view + 3600000000
        |                  THEN ev.us END) AS t_click
        |  FROM ev JOIN v USING (user_id) GROUP BY 1),
        |p AS (
        |  SELECT ev.user_id, any_value(c.t_view) AS t_view,
        |         any_value(c.t_click) AS t_click,
        |         min(CASE WHEN ev.event_type = 'purchase'
        |                   AND ev.us > c.t_click
        |                   AND ev.us <= c.t_click + 86400000000
        |                  THEN ev.us END) AS t_buy
        |  FROM ev JOIN c USING (user_id) GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(count(t_view) AS BIGINT) AS step_view,
        |       CAST(count(t_click) AS BIGINT) AS step_click_1h,
        |       CAST(count(t_buy) AS BIGINT) AS step_buy_24h
        |FROM p""".stripMargin,

    "snm_recall_audit" ->
      s"""WITH k AS (
        |  SELECT doc_id, substr(coalesce(lower(text), ''), 1, $SnmKeyLen) AS snm_key,
        |         row_number() OVER (ORDER BY substr(coalesce(lower(text), ''), 1, $SnmKeyLen),
        |                            doc_id) AS rn
        |  FROM documents),
        |t AS (
        |  SELECT CAST(coalesce(sum(CAST(g AS HUGEINT) * (g - 1) // 2), 0)
        |              AS BIGINT) AS n_truth_pairs
        |  FROM (SELECT count(*) AS g FROM k GROUP BY snm_key)),
        |w AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_window_pairs,
        |         CAST(count(CASE WHEN a.snm_key = b.snm_key THEN 1 END)
        |              AS BIGINT) AS n_caught
        |  FROM k a JOIN k b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow)
        |SELECT t.n_truth_pairs, w.n_window_pairs, w.n_caught,
        |       CAST(w.n_caught * 1000000 // nullif(t.n_truth_pairs, 0)
        |            AS BIGINT) AS recall_e6
        |FROM w, t""".stripMargin,

    "snm_multipass_pairs" ->
      s"""WITH d AS (
        |  SELECT doc_id, coalesce(lower(text), '') AS lt FROM documents),
        |k1 AS (
        |  SELECT doc_id, substr(lt, 1, $SnmKeyLen) AS key,
        |         row_number() OVER (ORDER BY substr(lt, 1, $SnmKeyLen),
        |                            doc_id) AS rn
        |  FROM d),
        |k2 AS (
        |  SELECT doc_id,
        |         substr(array_to_string(list_reverse(string_split(lt, ' ')),
        |                ' '), 1, $SnmKeyLen) AS key,
        |         row_number() OVER (ORDER BY
        |           substr(array_to_string(list_reverse(string_split(lt, ' ')),
        |                  ' '), 1, $SnmKeyLen), doc_id) AS rn
        |  FROM d),
        |u AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |         greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM k1 a JOIN k1 b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow
        |  UNION ALL
        |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id)
        |  FROM k2 a JOIN k2 b ON b.rn - a.rn BETWEEN 1 AND $SnmWindow)
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_passes
        |FROM u GROUP BY 1, 2""".stripMargin,

    "events_unpivot" ->
      """SELECT CAST(ts AS DATE) AS date, event_type,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "nation_share_trend" ->
      """WITH b AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT yr, n_name, cents,
        |       CAST(CAST(cents AS HUGEINT) * 1000000
        |            // sum(CAST(cents AS HUGEINT)) OVER (PARTITION BY yr)
        |            AS BIGINT) AS share_e6
        |FROM b""".stripMargin,

    "repeat_purchase" ->
      """WITH r AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders),
        |cu AS (
        |  SELECT o_custkey, count(*) AS n,
        |         min(CASE WHEN rn = 1 THEN d END) AS d1,
        |         min(CASE WHEN rn = 2 THEN d END) AS d2
        |  FROM r WHERE rn <= 2 GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(count(CASE WHEN n >= 2 THEN 1 END) AS BIGINT) AS n_repeat,
        |       CAST(count(CASE WHEN n >= 2 THEN 1 END) * 1000000
        |            // nullif(count(*), 0) AS BIGINT) AS repeat_rate_e6,
        |       CAST(quantile_cont(date_diff('day', d1, d2), 0.5) * 4 AS BIGINT)
        |         AS median_days_to_second_x4
        |FROM cu""".stripMargin,

    "filter_overlap_venn" ->
      s"""WITH q AS ($docQualityOracle),
        |r AS ($docRepetitionOracle),
        |dd AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
        |              THEN 1 ELSE 0 END AS f_dup
        |  FROM documents)
        |SELECT CAST(CASE WHEN q.quality_e6 < 800000 THEN 1 ELSE 0 END
        |            AS BIGINT) AS f_lowq,
        |       CAST(CASE WHEN r.rep3_e6 > 10000 THEN 1 ELSE 0 END AS BIGINT)
        |         AS f_rep,
        |       CAST(dd.f_dup AS BIGINT) AS f_dup,
        |       CAST(count(*) AS BIGINT) AS n_docs
        |FROM q JOIN r USING (doc_id) JOIN dd USING (doc_id)
        |GROUP BY 1, 2, 3""".stripMargin,

    "ship_latency_quantiles" ->
      """WITH l AS (
        |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |           AS order_m,
        |         CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |              CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT order_m, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(quantile_cont(lat, 0.25) * 4 AS BIGINT) AS p25_x4,
        |       CAST(quantile_cont(lat, 0.5) * 4 AS BIGINT) AS p50_x4,
        |       CAST(quantile_cont(lat, 0.75) * 4 AS BIGINT) AS p75_x4
        |FROM l GROUP BY 1""".stripMargin,

    "engagement_migration" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL),
        |bd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
        |h AS (
        |  SELECT user_id,
        |         sum(CASE WHEN us < (SELECT mid FROM bd) THEN 1 ELSE 0 END)
        |           AS c1,
        |         sum(CASE WHEN us >= (SELECT mid FROM bd) THEN 1 ELSE 0 END)
        |           AS c2
        |  FROM ev GROUP BY 1),
        |t AS (
        |  SELECT quantile_cont(c1, 0.25) AS a1, quantile_cont(c1, 0.5) AS a2,
        |         quantile_cont(c1, 0.75) AS a3,
        |         quantile_cont(c2, 0.25) AS b1, quantile_cont(c2, 0.5) AS b2,
        |         quantile_cont(c2, 0.75) AS b3
        |  FROM h)
        |SELECT CAST(1 + (CASE WHEN c1 > a1 THEN 1 ELSE 0 END)
        |              + (CASE WHEN c1 > a2 THEN 1 ELSE 0 END)
        |              + (CASE WHEN c1 > a3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS q_before,
        |       CAST(1 + (CASE WHEN c2 > b1 THEN 1 ELSE 0 END)
        |              + (CASE WHEN c2 > b2 THEN 1 ELSE 0 END)
        |              + (CASE WHEN c2 > b3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS q_after,
        |       CAST(count(*) AS BIGINT) AS n_users
        |FROM h, t GROUP BY 1, 2""".stripMargin,

    "knn_label_accuracy" ->
      s"""WITH pflat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |pnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
        |           FROM pflat GROUP BY vec_id),
        |panel AS (SELECT vec_id FROM embeddings
        |          ORDER BY ${dh("CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC
        |          LIMIT $RecallPanel),
        |edots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         sum(a.x * b.x) AS dp
        |  FROM pflat a JOIN pflat b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id IN (SELECT vec_id FROM panel)
        |  GROUP BY a.vec_id, b.vec_id),
        |escored AS (
        |  SELECT query_id, neighbor_id,
        |         round(dp / (na.nrm * nb.nrm), 6) AS cosine_sim
        |  FROM edots JOIN pnorms na ON query_id = na.vec_id
        |             JOIN pnorms nb ON neighbor_id = nb.vec_id),
        |er AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |              ORDER BY cosine_sim DESC, neighbor_id ASC) AS rn
        |       FROM escored),
        |nn AS (SELECT query_id, neighbor_id FROM er WHERE rn = 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_panel,
        |       CAST(count(CASE WHEN ql.label = nl.label THEN 1 END) AS BIGINT)
        |         AS n_agree,
        |       CAST(count(CASE WHEN ql.label = nl.label THEN 1 END) * 1000000
        |            // nullif(count(*), 0) AS BIGINT) AS accuracy_e6
        |FROM nn JOIN embeddings ql ON nn.query_id = ql.vec_id
        |        JOIN embeddings nl ON nn.neighbor_id = nl.vec_id""".stripMargin,

    "cluster_silhouette" ->
      """WITH flat AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(UNNEST(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |cent AS (
        |  SELECT label AS c_label, pos, avg(x) AS m
        |  FROM flat GROUP BY 1, 2),
        |d2 AS (
        |  SELECT f.vec_id, f.label, c.c_label,
        |         sum((f.x - c.m) * (f.x - c.m)) AS d2
        |  FROM flat f JOIN cent c USING (pos)
        |  GROUP BY 1, 2, 3),
        |ab AS (
        |  SELECT vec_id, label,
        |         min(CASE WHEN c_label = label THEN d2 END) AS a,
        |         min(CASE WHEN c_label <> label THEN d2 END) AS b
        |  FROM d2 GROUP BY 1, 2),
        |sil AS (
        |  SELECT label,
        |         CASE WHEN greatest(a, b) = 0 THEN 0
        |              ELSE (b - a) / greatest(a, b) END AS sil
        |  FROM ab)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |       round(avg(sil), 4) AS mean_silhouette
        |FROM sil GROUP BY 1""".stripMargin,

    "priority_effect_eta2" ->
      """WITH c AS (
        |  SELECT o_orderpriority,
        |         CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
        |           AS c
        |  FROM orders),
        |g AS (SELECT o_orderpriority, CAST(count(*) AS HUGEINT) AS ng,
        |             sum(c) AS sg, sum(c * c) AS sg2
        |      FROM c GROUP BY 1),
        |f AS (SELECT sum(ng) AS n, sum(sg) AS st, sum(sg2) AS sxx,
        |             sum(sg * sg // ng) AS ssb
        |      FROM g)
        |SELECT CAST(n AS BIGINT) AS n_orders,
        |       CAST((n * ssb - st * st) * 1000000
        |            // nullif(n * sxx - st * st, 0) AS BIGINT) AS eta2_e6
        |FROM f""".stripMargin,

    "weekday_chi2" ->
      """WITH dow AS (
        |  SELECT dayofweek(CAST(ts AS DATE)) AS dow,
        |         CAST(count(*) AS HUGEINT) AS o
        |  FROM events GROUP BY 1)
        |SELECT CAST(sum(o) AS BIGINT) AS n_events,
        |       CAST(count(*) AS BIGINT) AS n_cells,
        |       CAST((7 * sum(o * o) - sum(o) * sum(o)) * 1000000
        |            // nullif(sum(o), 0) AS BIGINT) AS chi2_e6
        |FROM dow""".stripMargin,

    "dedup_policy_diff" ->
      """WITH g AS (
        |  SELECT md5(text) AS k, CAST(count(*) AS BIGINT) AS sz,
        |         min(doc_id) AS keep_first,
        |         arg_max(doc_id,
        |                 lpad(CAST(n_chars AS VARCHAR), 19, '0') ||
        |                 lpad(CAST(doc_id AS VARCHAR), 19, '0'))
        |           AS keep_longest
        |  FROM documents GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(count(CASE WHEN sz > 1 THEN 1 END) AS BIGINT)
        |         AS n_dup_groups,
        |       CAST(count(CASE WHEN keep_first <> keep_longest THEN 1 END)
        |            AS BIGINT) AS n_disagree
        |FROM g""".stripMargin,

    "dup_cluster_sizes" -> s"""WITH cl AS ($dedupClustersOracle),
      |cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
      |       FROM cl GROUP BY 1)
      |SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters
      |FROM cs GROUP BY 1""".stripMargin,

    "seasonal_forecast_mae" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
        |       CAST(sum(abs(a.c - b.c)) AS BIGINT) AS abs_err_cents,
        |       CAST(sum(abs(a.c - b.c)) // nullif(count(*), 0) AS BIGINT)
        |         AS mae_cents
        |FROM daily a JOIN daily b ON a.d = b.d + 7""".stripMargin,

    "value_cusum_change" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(sum(c) AS BIGINT) AS total FROM daily),
        |r AS (
        |  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS idx,
        |         CAST(sum(c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS cum
        |  FROM daily)
        |SELECT d AS change_d,
        |       CAST(abs(cum * t.n - idx * t.total) AS BIGINT) AS dev_scaled
        |FROM r, t
        |ORDER BY dev_scaled DESC, change_d LIMIT 1""".stripMargin,

    "discount_elasticity" ->
      """WITH li AS (
        |  SELECT p_brand,
        |         CAST(CAST(round(l_discount * 100) AS BIGINT) AS HUGEINT) AS x,
        |         CAST(CAST(round(l_quantity) AS BIGINT) AS HUGEINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |st AS (
        |  SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
        |         sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM li GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
        |       CAST((CASE WHEN n*sxy - sx*sy < 0 THEN -1 ELSE 1 END) *
        |            ((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000
        |             // nullif((n*sxx - sx*sx) * (n*syy - sy*sy), 0))
        |            AS BIGINT) AS corr2_e6
        |FROM st""".stripMargin,

    "attribution_position" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        |  FROM events WHERE user_id IS NOT NULL),
        |sg AS (
        |  SELECT *, coalesce(sum(is_p) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
        |  FROM ev),
        |tch AS (
        |  SELECT user_id, event_type, seg,
        |         row_number() OVER (PARTITION BY user_id, seg
        |                            ORDER BY ts, event_id) AS rn,
        |         count(*) OVER (PARTITION BY user_id, seg) AS n
        |  FROM sg WHERE is_p = 0),
        |pur AS (SELECT DISTINCT user_id, seg FROM sg WHERE is_p = 1)
        |SELECT t.event_type AS touch_type,
        |       CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(CASE WHEN n = 1 THEN 1000000
        |                     WHEN n = 2 THEN 500000
        |                     WHEN rn = 1 THEN 400000
        |                          + (200000 - (n - 2) * (200000 // (n - 2)))
        |                     WHEN rn = n THEN 400000
        |                     ELSE 200000 // (n - 2) END) AS BIGINT)
        |         AS credit_e6_sum
        |FROM tch t JOIN pur USING (user_id, seg)
        |GROUP BY 1""".stripMargin,

    "user_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        |  FROM events WHERE user_id IS NOT NULL),
        |isl AS (
        |  SELECT user_id,
        |         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |                  AS INTEGER) AS island
        |  FROM days),
        |st AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        |       FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
        |       CAST(count(*) AS BIGINT) AS n_streaks,
        |       CAST(sum(len) AS BIGINT) AS active_days
        |FROM st GROUP BY 1""".stripMargin,

    "running_distinct_users" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |n AS (SELECT first_d, CAST(count(*) AS BIGINT) AS n_new
        |      FROM f GROUP BY 1)
        |SELECT first_d, n_new,
        |       CAST(sum(n_new) OVER (ORDER BY first_d
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum_distinct
        |FROM n""".stripMargin,

    "gini_concentration" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |         CAST(row_number() OVER (ORDER BY cents, l_partkey) AS BIGINT)
        |           AS rnk
        |  FROM rev),
        |t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |             CAST(sum(cents) AS HUGEINT) AS sx FROM rev)
        |SELECT CAST(t.n AS BIGINT) AS n_parts,
        |       CAST(t.sx AS BIGINT) AS total_cents,
        |       CAST(sum((CAST(r.rnk AS HUGEINT) * 2 - t.n - 1)
        |            * CAST(r.cents AS HUGEINT)) * 1000000 // (t.n * t.sx)
        |            AS BIGINT) AS gini_e6
        |FROM r, t GROUP BY t.n, t.sx""".stripMargin,

    "cohort_ltv_curve" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         year(o_orderdate) * 12 + month(o_orderdate) AS m,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |fc AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1),
        |curve AS (
        |  SELECT fc.cohort_m, o.m - fc.cohort_m AS age_months,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(o.cents) AS BIGINT) AS rev_cents
        |  FROM o JOIN fc USING (o_custkey)
        |  GROUP BY 1, 2)
        |SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
        |       CAST(age_months AS BIGINT) AS age_months,
        |       n_orders, rev_cents,
        |       CAST(sum(rev_cents) OVER (PARTITION BY cohort_m
        |            ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |         AS cum_rev_cents
        |FROM curve""".stripMargin,

    "ts_similarity_topk" ->
      s"""WITH series AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |bd AS (SELECT CAST(max(h) - min(h) + 1 AS HUGEINT) AS t_slots
        |       FROM series),
        |m AS (SELECT user_id, CAST(sum(c) AS HUGEINT) AS sx,
        |             CAST(sum(c * c) AS HUGEINT) AS sxx
        |      FROM series GROUP BY 1),
        |panel AS (
        |  SELECT user_id AS qu FROM m
        |  ORDER BY ${dh("CAST(user_id AS VARCHAR)")}, user_id LIMIT $TsPanel),
        |qs AS (SELECT p.qu, s.h, s.c AS qc
        |       FROM series s JOIN panel p ON s.user_id = p.qu),
        |pairs AS (
        |  SELECT q.qu, s.user_id, CAST(sum(q.qc * s.c) AS HUGEINT) AS sxy
        |  FROM series s JOIN qs q ON s.h = q.h AND s.user_id <> q.qu
        |  GROUP BY 1, 2),
        |sc AS (
        |  SELECT p.qu, p.user_id,
        |         (SELECT t_slots FROM bd) * p.sxy - qm.sx * um.sx AS num,
        |         (SELECT t_slots FROM bd) * qm.sxx - qm.sx * qm.sx AS vq,
        |         (SELECT t_slots FROM bd) * um.sxx - um.sx * um.sx AS vu
        |  FROM pairs p JOIN m qm ON p.qu = qm.user_id
        |               JOIN m um ON p.user_id = um.user_id),
        |scored AS (
        |  SELECT qu, user_id,
        |         CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |              (num * num * 1000000 // nullif(vq * vu, 0)) AS BIGINT)
        |           AS corr2_e6
        |  FROM sc)
        |SELECT qu, user_id, corr2_e6, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY qu
        |    ORDER BY corr2_e6 DESC, user_id) AS BIGINT) AS rnk
        |  FROM scored WHERE corr2_e6 IS NOT NULL)
        |WHERE rnk <= $TsK""".stripMargin,
  )
}
