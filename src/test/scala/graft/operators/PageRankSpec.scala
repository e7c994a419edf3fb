package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 20): Map[Long, Double] =
    PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("ring graph converges to uniform ranks that sum to 1") {
    val n = 6
    val ring = (0L until n).map(i => (i, (i + 1) % n))
    val r = ranksOf(ring)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-6))
  }

  test("star graph ranks the hub highest; dangling hub mass is redistributed") {
    // 1..5 all link to 0; 0 links nowhere (dangling)
    val star = (1L to 5L).map(i => (i, 0L))
    val r = ranksOf(star)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(0L) > 0.5, s"hub rank ${r(0L)}")
    (1L to 5L).foreach(i => assert(r(i) < r(0L)))
    // spokes are symmetric → equal ranks
    assert((1L to 5L).map(r).distinct.size == 1)
  }

  test("rank order matches link structure on an asymmetric graph") {
    // 2 cites 1 fully, 3 splits between 1 and 2, nobody cites 3:
    // in-mass strictly orders 1 > 2 > 3
    val g = Seq((2L, 1L), (3L, 1L), (3L, 2L))
    val r = ranksOf(g)
    assert(r(1L) > r(2L) && r(2L) > r(3L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  private def e6RanksOf(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] =
    PageRank.runExactE6(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("runExactE6 tracks the double form within truncation drift, same order") {
    val g = Seq((2L, 1L), (3L, 1L), (3L, 2L))
    val exact = e6RanksOf(g, iters = 3)
    val dbl = PageRank.run(g.toDF("s", "d"), "s", "d", iterations = 3)
      .as[(Long, Double)].collect().toMap
    exact.foreach { case (id, rE6) =>
      assert(math.abs(rE6 - dbl(id) * 1e6) < 20,
        s"node $id: $rE6 vs ${dbl(id) * 1e6}")
    }
    assert(exact(1L) > exact(2L) && exact(2L) > exact(3L))
  }

  test("runExactE6 is invariant under partitioning and edge order") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (4L, 1L))
    val a = PageRank.runExactE6(g.toDF("s", "d"), "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.runExactE6(
        g.reverse.toDF("s", "d").repartition(7), "s", "d", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "integer ranks must be bit-identical across layouts")
  }

  test("runPersonalizedE6 matches the hand-iterated 2-cycle exactly") {
    // A↔B, seed A, d=0.85e6: r1=(150000, 850000), r2=(872500, 127500),
    // r3=(258375, 741625) — every floor staged as in the implementation
    val g = Seq(("A", "B"), ("B", "A")).toDF("s", "d")
    val r = PageRank.runPersonalizedE6(g, "s", "d", Seq("A"), iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(r === Map("A" -> 258375L, "B" -> 741625L))
  }

  test("runPersonalizedE6: unreachable nodes get zero; dangling seed keeps all mass") {
    val g = Seq(("A", "B")).toDF("s", "d")
    val r = PageRank.runPersonalizedE6(g, "s", "d", Seq("C"), iterations = 3)
      .as[(String, Long)].collect().toMap
    // C has no out-edges: its mass is dangling and restarts at C itself
    assert(r("C") === 1000000L)
    assert(r("A") === 0L && r("B") === 0L)
  }
}
