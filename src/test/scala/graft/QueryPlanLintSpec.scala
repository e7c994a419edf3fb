package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan lint over EVERY registered query: freezes the audited plan shapes
  * against regression.
  *
  *  1. No `CartesianProductExec` / `BroadcastNestedLoopJoinExec` anywhere
  *     except the explicitly-gated exact-ANN tier ([[exactAnnAllowlist]]),
  *     whose all-pairs form is the documented oracle baseline behind the
  *     `gateExact` row-count clamp (Similarity.scala).
  *  2. Per-query (shuffle, broadcast) Exchange counts must match the
  *     committed golden file — a plan change that adds or removes an
  *     exchange is a deliberate act: regenerate with
  *     `GRAFT_REGEN_PLAN_GOLDEN=1 sbt "Test/testOnly graft.QueryPlanLintSpec"`
  *     and review the diff like any other code change.
  *
  * Counts come from the INITIAL physical plan (pre-AQE, no execution), so
  * the lint is deterministic and costs planning time only — except the few
  * operators that legitimately run a driver-side job while BUILDING the
  * plan (the IVF codebook), which is their documented design.
  */
class QueryPlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val goldenPath = java.nio.file.Paths.get("src/test/resources/plan-golden.txt")

  /** Queries whose plan intentionally contains an UNBOUNDED all-pairs
    * join: the exact-ANN oracle tier, clamped by `gateExact`
    * (Similarity.scala) so the all-pairs form can never run on an
    * oversized corpus. Everything else must stay equi-join only — except
    * BNLJs whose broadcast side is provably bounded (see
    * [[boundedBroadcastSide]]), which are fine at any scale. */
  private val exactAnnAllowlist: Set[String] = Set(
    "cosine_topk",          // brute-force oracle tier: gated all-pairs
    "near_dup_embeddings")  // exact cosine pairs: gated all-pairs
  // NOTE r6: ann_recall left this list — its exact leg is now the
  // panel × corpus form (Similarity.panelExactTopK), whose BNLJ broadcast
  // side is a provably-bounded global limit (see boundedBroadcastSide).
  // NOTE r10: dedup_embed_keepers, margin_align_pairs, and
  // hybrid_rrf_topk's dense leg left this list — their candidate tiers
  // re-pointed at the LSH-bucketed equi-joins (lshNearDupPairs /
  // lshTopKAgainst), so they now plan equi-join-only like every other
  // scale-path query; the two remaining rows are the documented gated
  // exact oracle tier.

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  /** A nested-loop join is scale-safe iff its broadcast input cannot grow
    * with the data: either a global (no-grouping) aggregate — exactly one
    * row by definition (the scalar-denominator crossJoin pattern used by
    * TF-IDF, funnels, PageRank's dangling mass) — or a literal local
    * relation of bounded size (the collected IVF codebook re-entering the
    * plan). Anything else broadcast into a BNLJ scales with the data and
    * is a lint failure. */
  private def boundedBroadcastSide(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
    }
    flatten(build).exists {
      case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        agg.groupingExpressions.isEmpty
      case loc: org.apache.spark.sql.execution.LocalTableScanExec =>
        loc.rows.lengthCompare(1024) <= 0
      // a global limit caps the broadcast side regardless of input size —
      // the hash-sampled query panel of the recall harness
      // (Similarity.panelExactTopK: orderBy(hash).limit(panel))
      case top: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
        top.limit <= 1024
      case gl: org.apache.spark.sql.execution.GlobalLimitExec =>
        gl.limit <= 1024
      case _ => false
    }
  }

  test("no query plans a cartesian/BNLJ outside the gated exact-ANN tier; exchange counts match golden") {
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val nodes = flatten(fn(spark, dir).queryExecution.executedPlan)
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
      val cartesian = nodes.exists(_.isInstanceOf[CartesianProductExec])
      val unboundedBnlj = nodes.exists {
        case j: BroadcastNestedLoopJoinExec => !boundedBroadcastSide(j)
        case _ => false
      }
      if (!exactAnnAllowlist.contains(name)) {
        assert(!cartesian, s"$name plans a CartesianProduct")
        assert(!unboundedBnlj,
          s"$name plans a BroadcastNestedLoopJoin whose broadcast side scales with the data")
      }
      f"$name $shuffles $broadcasts"
    }
    val actual = rows.mkString("", "\n", "\n")
    if (sys.env.contains("GRAFT_REGEN_PLAN_GOLDEN")) {
      java.nio.file.Files.createDirectories(goldenPath.getParent)
      java.nio.file.Files.write(goldenPath, actual.getBytes("UTF-8"))
      info(s"regenerated $goldenPath")
    } else {
      assert(java.nio.file.Files.exists(goldenPath),
        s"golden file missing — regenerate with GRAFT_REGEN_PLAN_GOLDEN=1")
      val expected = new String(java.nio.file.Files.readAllBytes(goldenPath), "UTF-8")
      val diff = expected.linesIterator.toSeq.zipAll(actual.linesIterator.toSeq, "<missing>", "<missing>")
        .filter { case (e, a) => e != a }
        .map { case (e, a) => s"golden: $e  actual: $a" }
      assert(diff.isEmpty,
        "exchange counts drifted from plan-golden.txt (review, then regenerate " +
          "with GRAFT_REGEN_PLAN_GOLDEN=1):\n" + diff.mkString("\n"))
    }
  }
}
