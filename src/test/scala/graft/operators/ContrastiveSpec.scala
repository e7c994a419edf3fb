package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 20L).map(i => (i, Seq(i.toFloat, 1.0f)))
    .toDF("vec_id", "embedding")
  private def pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")

  test("one triplet per directed pair; negative is neither anchor nor a partner") {
    val out = Contrastive.triplets(pairs, corpus, "vec_id", poolSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSet ==
      Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
    out.foreach { case (a, p, n) =>
      assert(n != a && n != p, s"negative $n collides with anchor/positive ($a, $p)")
    }
  }

  test("negatives are deterministic across runs and input layouts") {
    def run(parts: Int) =
      Contrastive.triplets(pairs.repartition(parts), corpus.repartition(parts),
        "vec_id", poolSize = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(2) == run(5))
  }

  test("every positive partner of the anchor is excluded, not just the paired one") {
    // anchor 1 has TWO partners (2 and 5): neither may be its negative
    val multi = Seq((1L, 2L), (1L, 5L)).toDF("id_a", "id_b")
    val out = Contrastive.triplets(multi, corpus, "vec_id", poolSize = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    out.filter(_._1 == 1L).foreach { case (_, n) =>
      assert(n != 2L && n != 5L && n != 1L)
    }
  }

  test("triplet keys give different pairs different negatives eventually") {
    // with a 20-member pool over 2 base pairs, at least two distinct
    // negatives should appear (the hash key varies per (anchor, pos))
    val out = Contrastive.triplets(pairs, corpus, "vec_id", poolSize = 20)
      .select("neg_id").as[Long].collect().toSet
    assert(out.size >= 2)
  }

  test("string ids survive the pool intact (no silent numeric cast)") {
    val sCorpus = (1 to 20).map(i => (s"doc-$i", Seq(i.toFloat, 1.0f)))
      .toDF("doc_id", "embedding")
    val sPairs = Seq(("doc-1", "doc-2"), ("doc-3", "doc-4")).toDF("id_a", "id_b")
    val out = Contrastive.triplets(sPairs, sCorpus, "doc_id", poolSize = 5)
      .as[(String, String, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (a, p, n) =>
      n != null && n.startsWith("doc-") && n != a && n != p })
  }
}
