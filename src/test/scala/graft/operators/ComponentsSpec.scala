package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chained pairs collapse into one family labeled by the minimum id") {
    // {1-2, 2-3, 3-4} one chain; {10-11} a pair; 20 isolated-by-pairing 21
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val out = Components.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L))
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(out(20L) == 20L && out(21L) == 20L)
  }

  test("a long chain converges (diameter-bound iteration)") {
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    val out = Components.connectedComponents(chain, "id_a", "id_b", maxIter = 40)
      .as[(Long, Long)].collect()
    assert(out.length == 30)
    assert(out.forall(_._2 == 0L))
  }

  test("labels are invariant under pair order and repartitioning") {
    val pairs = Seq((5L, 9L), (9L, 7L), (1L, 2L)).toDF("id_a", "id_b")
    val a = Components.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val b = Components.connectedComponents(
        pairs.orderBy($"id_b").repartition(5), "id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a == Set((5L, 5L), (9L, 5L), (7L, 5L), (1L, 1L), (2L, 1L)))
  }

  test("triangleCounts: clique counts C(n-1,2) per node, chains and stars count zero") {
    // K4 on {0..3} (each node in C(3,2)=3 triangles) + chain 10-11-12 +
    // star 20-{21,22,23} — neither chain nor star closes a triangle
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val edges = (k4 ++ Seq((10L, 11L), (11L, 12L), (20L, 21L), (20L, 22L), (20L, 23L)))
      .toDF("id_a", "id_b")
    val out = Components.triangleCounts(edges, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangleCounts is invariant under edge direction, duplication and order") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L))
    val messy = (base ++ base.map(_.swap) ++ base).reverse.toDF("id_a", "id_b")
      .repartition(5)
    val out = Components.triangleCounts(messy, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    // triangles: (1,2,3) and (1,3,4); node 1 and 3 in both
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}
