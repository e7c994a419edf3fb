package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Pairwise-preference aggregation: Bradley-Terry strength scores from a
  * relation of (winner, loser[, weight]) comparisons — the
  * preference-data-curation primitive (rank items, grade annotator pairs,
  * filter inconsistent preference sets) behind RLHF/DPO data pipelines.
  *
  * Model: P(i beats j) = s_i / (s_i + s_j); scores fitted with the MM
  * update of Hunter, "MM algorithms for generalized Bradley-Terry
  * models", Annals of Statistics 2004:
  *
  *     s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j)
  *
  * (W_i = total wins of i, n_ij = comparisons between i and j), followed
  * by a sum normalization. Every iteration state here is e6-QUANTIZED and
  * every update is exact int64 arithmetic (truncating division), so the
  * fitted scores are bit-identical on any engine — the DuckDB oracle
  * unrolls the same iterations as SQL CTEs and hash-matches.
  *
  * Scale split (same contract as [[Bpe]] / the IVF codebook): the
  * comparison log is aggregated DISTRIBUTED (one map-side-combined
  * groupBy — the only pass over the data); the iteration loop runs on the
  * driver over the aggregated item×item matrix, which is model-sized
  * (`maxItems` gate, default 10k items ⇒ at most 10⁸ pair cells, in
  * practice sparse). Output is one row per item — model-sized.
  */
object Preference {

  private val E6 = 1000000L
  private val E12 = 1000000000000L

  /** (item, wins, score_e6) for every item appearing in `wins`; scores
    * normalized to mean 1.0 (sum = |items|·1e6). `weightCol = None`
    * counts each row as one comparison. */
  def bradleyTerry(wins: DataFrame, winnerCol: String, loserCol: String,
      weightCol: Option[String] = None, iterations: Int = 3,
      maxItems: Int = 10000): DataFrame = {
    require(iterations >= 1, "need at least one MM iteration")
    val spark = wins.sparkSession
    val wcol = weightCol.map(col).getOrElse(lit(1L)).cast("long")
    // the ONLY distributed passes: pair counts, map-side combined.
    // Self-comparisons and null items carry no preference information and
    // would inflate W_i without a balancing pair term — dropped up front.
    val cleaned = wins
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
    // gate the DOMAIN before any collect: a mistakenly unbounded item set
    // (user ids instead of candidate labels) must fail with this message,
    // not an OOM from hauling |items|² pair rows to the driver
    val nItems = cleaned
      .select(col(winnerCol).cast("string").as("i"))
      .union(cleaned.select(col(loserCol).cast("string").as("i")))
      .agg(countDistinct(col("i"))).head().getLong(0)
    require(nItems <= maxItems,
      s"bradleyTerry item set $nItems exceeds $maxItems — scores are " +
        "driver-side model state; raise maxItems only for genuinely bounded domains")
    val directed = cleaned
      .groupBy(col(winnerCol).cast("string").as("w"), col(loserCol).cast("string").as("l"))
      .agg(sum(wcol).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(directed.forall(_._3 >= 0),
      "bradleyTerry weights must be non-negative — a negative comparison count has no model meaning")
    val items = directed.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val totalWins = directed.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    // undirected comparison counts n_ij + n_ji
    val und = directed.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    def nij(i: String, j: String): Long =
      und.getOrElse((i, j), 0L) + und.getOrElse((j, i), 0L)
    // adjacency from the pair list itself — O(pairs), not O(items²), so
    // raising maxItems costs what the data costs, not its square; sorted
    // per item to keep the fixpoint's summation order deterministic
    val neighbors: Map[String, Seq[String]] = {
      val adj = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
      directed.iterator.filter(t => t._3 > 0 && t._1 != t._2).foreach { t =>
        adj.getOrElseUpdate(t._1, scala.collection.mutable.Set.empty) += t._2
        adj.getOrElseUpdate(t._2, scala.collection.mutable.Set.empty) += t._1
      }
      items.map(i => i -> adj.get(i).map(_.toSeq.sorted).getOrElse(Seq.empty)).toMap
    }

    var s: Map[String, Long] = items.map(_ -> E6).toMap
    for (_ <- 1 to iterations) {
      // MM step in exact integers: each pair term and the per-item
      // denominator are e6-scaled values with floor at every division —
      // DuckDB's `//` and Spark's `div` truncate identically. The driver
      // loop runs the products in BigInt: for every non-overflowing
      // domain (including every oracle-checked one) the results are
      // bit-identical to int64, and for a pathological skewed domain the
      // scores stay CORRECT here instead of silently wrapping — the
      // overflow-safety discipline of Anomaly's guard, applied to model
      // state the cluster never touches (≤ maxItems values).
      val raw = items.map { i =>
        val den = neighbors(i).map { j =>
          BigInt(nij(i, j)) * E12 / BigInt(math.max(s(i) + s(j), 1L))
        }.sum
        i -> (if (den <= 0) BigInt(0) else BigInt(totalWins.getOrElse(i, 0L)) * E12 / den)
      }.toMap
      val total = raw.values.sum.max(BigInt(1))
      s = items.map { i =>
        // normalize to sum = |items|·1e6, then clamp to ≥1 so a zero-win
        // item can never zero a later pair denominator; the normalized
        // value is ≤ |items|·1e6 ≤ 1e10, comfortably int64
        i -> (raw(i) * items.length * E6 / total).toLong.max(1L)
      }.toMap
    }
    val rows = items.map(i => Row(i, totalWins.getOrElse(i, 0L), s(i)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava,
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("wins", LongType, nullable = false),
        StructField("score_e6", LongType, nullable = false))))
  }
}
