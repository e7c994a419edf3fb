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
  * 13.7k-line registry into per-domain files): TPC-H suite, relational quality audits, sampling/splits, and the
  * classical statistics tests.
  * Entries are verbatim from the original map; SparkEntry folds every
  * fragment back into one registry, so names/oracles stay 1:1. */
private[graft] object RelationalQueries {
  def m: Map[String, (SparkSession, String) => DataFrame] = Map(
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
  )
}
