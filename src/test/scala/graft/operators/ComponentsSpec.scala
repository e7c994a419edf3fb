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
}
