package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — link-graph importance for corpus curation
  * (rank web documents by their link neighborhood before quality
  * filtering, as in Common-Crawl-derived training sets).
  *
  * Same DataFrame-iteration discipline as [[Components]]: each round is
  * one equi-join (ranks → out-edges) + one key-partitioned aggregation of
  * contributions, `localCheckpoint` truncates lineage, the driver never
  * sees row data. Dangling mass (vertices with no out-edges) is
  * redistributed uniformly each round — computed as a one-row aggregate —
  * so ranks keep summing to 1 and results match the standard power-method
  * formulation (Page et al. 1999; damping d=0.85).
  *
  * Runs a FIXED iteration count rather than a convergence test: at 100 TB
  * a per-round global delta is an extra aggregation over all vertices,
  * and the power method's geometric convergence (d^k) makes k=10..20 the
  * standard stopping rule. No DuckDB oracle is registered: ranks are
  * iterated double sums whose value depends on summation order — correct
  * results are spec'd against closed-form graphs (ring = uniform,
  * star = hub dominance) instead of hash-compared.
  */
object PageRank {

  /** (src, dst) edges → (id, rank); ranks sum to 1 (±1e-9, spec'd). */
  def run(edges: DataFrame, src: String, dst: String,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .distinct().localCheckpoint()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val nV = vertices.count()
    require(nV > 0, "empty graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    var ranks = vertices.withColumn("rank", lit(1.0 / nV))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      // mass of dangling vertices, redistributed uniformly. Kept INSIDE the
      // plan as a one-row aggregate broadcast-joined into the update — a
      // driver-side head() here would launch a second job per iteration
      // (the eager localCheckpoint below is already one); folding it in
      // halves the job count and the driver still never sees row data.
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dangling_mass"))
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .select(col("id"), (col("rank") / col("out_deg")).as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("vid"))
        .agg(sum("share").as("in_mass"))
      ranks = vertices
        .join(contribs, vertices("id") === col("vid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / nV) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) +
              col("__dangling_mass") / nV)).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** Exact-integer PageRank — [[run]]'s power iteration carried out
    * entirely in e6-scaled int64 with floor division at every step, the
    * repo's portability discipline applied to graph iteration: integer
    * addition is order-independent, so unlike the double form the result
    * is bit-identical across partitionings, re-runs and ENGINES, and a
    * SQL oracle can reproduce it by unrolling the iterations. The cost of
    * exactness is floor-truncation drift (ranks no longer sum to exactly
    * 10^6 — each division drops < 1 unit per vertex per round), which is
    * measurement noise at e6 scale and never accumulates past
    * iterations·(out_deg+2) units; relative ORDER of ranks — what link
    * importance is used for — is unaffected on any graph whose rank gaps
    * exceed that. Plan shape identical to [[run]].
    *
    * Output: (id, rank_e6 long). */
  def runExactE6(edges: DataFrame, src: String, dst: String,
      iterations: Int = 3, dampingE6: Long = 850000L): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    require(dampingE6 >= 0 && dampingE6 <= 1000000L, "dampingE6 out of [0, 1e6]")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .distinct().localCheckpoint()
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val nV = vertices.count()
    require(nV > 0, "empty graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val teleport = (1000000L - dampingE6) / nV
    var ranks = vertices.withColumn("rank_e6", lit(1000000L / nV))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum("rank_e6"), lit(0L)).as("__dm"))
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .select(col("id"), expr("rank_e6 div out_deg").as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("vid"))
        .agg(sum("share").as("in_mass"))
      ranks = vertices
        .join(contribs, vertices("id") === col("vid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampingE6 * (coalesce(in_mass, CAST(0 AS BIGINT)) + " +
              s"__dm div $nV)) div 1000000")).as("rank_e6"))
        .localCheckpoint()
    }
    ranks
  }

  /** Personalized PageRank, exact-e6: [[runExactE6]] with the teleport
    * vector concentrated on a SEED set instead of uniform — the
    * random-walk-with-restart relevance score that turns link importance
    * into "importance RELATIVE TO these items" (Haveliwala '02;
    * Pixie-style co-occurrence recommenders). Teleport mass AND dangling
    * mass both restart at the seeds (the standard PPR convention), so
    * non-seed rank is purely inherited through in-links from the seed
    * neighborhood.
    *
    * Seeds are a bounded literal (the query's anchor items — a handful by
    * construction); everything data-sized stays in the joins, identical
    * plan shape to [[runExactE6]]. Same floor-truncation contract: every
    * div is staged so a SQL oracle unrolling the iterations hash-matches.
    *
    * Output: (id, rank_e6 long) — seeds absent from the graph still get
    * their teleport share (they are walk restart points by definition). */
  def runPersonalizedE6(edges: DataFrame, src: String, dst: String,
      seeds: Seq[String], iterations: Int = 3,
      dampingE6: Long = 850000L): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    require(dampingE6 >= 0 && dampingE6 <= 1000000L, "dampingE6 out of [0, 1e6]")
    require(seeds.nonEmpty && seeds.size <= 1024,
      "seeds must be a bounded non-empty anchor set")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .distinct().localCheckpoint()
    val seedDf = seeds.distinct.toDF("id").withColumn("is_seed", lit(1L))
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).union(seedDf.select("id"))
      .distinct()
      .join(broadcast(seedDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    val nS = seeds.distinct.size.toLong
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    var ranks = vertices.withColumn("rank_e6",
      expr(s"is_seed * (1000000 div $nS)"))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(outDeg, ranks("id") === outDeg("src"), "left")
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum("rank_e6"), lit(0L)).as("__dm"))
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .select(col("id"), expr("rank_e6 div out_deg").as("share"))
        .join(e, col("id") === e("src"))
        .groupBy(col("dst").as("vid"))
        .agg(sum("share").as("in_mass"))
      ranks = vertices
        .join(contribs, vertices("id") === col("vid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("is_seed"),
          expr(s"is_seed * ((1000000 - $dampingE6) div $nS) + " +
            s"($dampingE6 * (coalesce(in_mass, CAST(0 AS BIGINT)) + " +
            s"is_seed * (__dm div $nS))) div 1000000").as("rank_e6"))
        .localCheckpoint()
    }
    ranks.select("id", "rank_e6")
  }
}
