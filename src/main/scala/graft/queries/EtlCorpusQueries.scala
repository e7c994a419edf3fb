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
  * 13.7k-line registry into per-domain files): ETL core, windows, streaming parity, multimodal, packing/batching,
  * embedding statistics, and the MinHash/SimHash dedup tiers.
  * Entries are verbatim from the original map; SparkEntry folds every
  * fragment back into one registry, so names/oracles stay 1:1. */
private[graft] object EtlCorpusQueries {
  def m: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // both pair sets feed TWO consumers each (the hit semi-join and
      // their own count) — pin them once (eager localCheckpoint, the
      // shared-leg pattern) or the full shingle-join subtree executes
      // twice per side (r16: 2.6 s → ~1.5 s in-sweep)
      val truth = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = PrThreshold)
        .select("id_a", "id_b").localCheckpoint()
      val pred = Dedup.minHashLshPairs(docs, "doc_id", "text",
          n = 3, numHashes = MhHashes, bands = MhBands, threshold = PrThreshold,
          portable = true)
        .select("id_a", "id_b").localCheckpoint()
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
      // pairs feeds the intersection derivation AND the final projection,
      // shingles feed both sides of the intersection join and the size
      // aggregate — pin each once (eager localCheckpoint) instead of
      // re-running the signature/shingle subtrees per reference
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
          n = 3, numHashes = MhHashes, bands = MhBands, threshold = MhThreshold,
          portable = true)
        .select(col("id_a"), col("id_b"),
          floor(col("est_jaccard") * lit(1e6) + lit(0.5)).cast("long").as("est_e6"))
        .localCheckpoint()
      val sh = Dedup.shingles(docs, "doc_id", "text", n = 3).localCheckpoint()
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
  )
}
