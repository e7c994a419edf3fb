package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Lloyd's is init-sensitive, so the fixture is built AROUND the
  // deterministic initializer: find the two smallest-hash ids (exactly how
  // train() seeds), put one in each cluster — convergence to the true
  // means is then guaranteed. All coordinates are small integers, so the
  // per-dimension double sums are exact and order-independent (no
  // last-ulp flakiness across shuffle orders).
  private def hashRankedIds(n: Int): Seq[Long] =
    (1L to n.toLong).toDF("id")
      .withColumn("h", graft.functions.PortableHash.hash60(col("id")))
      .orderBy("h").select("id").as[Long].collect().toSeq

  private val offsets = Seq((0f, 0f), (0f, 2f), (2f, 0f), (2f, 2f))

  private def clusterIds = {
    val ranked = hashRankedIds(8)
    val aIds = ranked(0) +: ranked.drop(2).take(3)
    val bIds = ranked(1) +: ranked.drop(5)
    (aIds, bIds)
  }

  private def twoClusters = {
    val (aIds, bIds) = clusterIds
    val rows =
      aIds.zip(offsets).map { case (id, (x, y)) => (id, Seq(x, y)) } ++
      bIds.zip(offsets).map { case (id, (x, y)) => (id, Seq(100f + x, 100f + y)) }
    rows.toDF("vec_id", "embedding")
  }

  test("k=1 converges to the exact global mean") {
    val vecs = (1L to 4L).zip(offsets).map { case (id, (x, y)) => (id, Seq(x, y)) }
      .toDF("vec_id", "embedding")
    val out = KMeans.train(vecs, "vec_id", "embedding", k = 1, iters = 2).collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Double](1) == Seq(1.0, 1.0))
    assert(out.head.getLong(2) == 4L)
  }

  test("two separated clusters recover their exact means") {
    val out = KMeans.train(twoClusters, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getSeq[Double](1) -> r.getLong(2))
    assert(out.map(_._2).sum == 8L)
    val cents = out.map(_._1).toSet
    assert(cents == Set(Seq(1.0, 1.0), Seq(101.0, 101.0)))
  }

  test("training is deterministic across runs and input layouts") {
    def run(parts: Int) =
      KMeans.train(twoClusters.repartition(parts), "vec_id", "embedding", k = 2, iters = 3)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    assert(run(2) == run(7))
  }

  test("trained codebook drives semantic dedup end-to-end") {
    // DIRECTION-separated clusters (cosine cells assign by direction, so a
    // magnitude-only split would collapse into one cell): A along e0,
    // B along e1, offsets exactly representable so means are exact.
    val (aIds, bIds) = clusterIds
    val dirOffsets = Seq(0.0f, 0.25f, 0.5f, 0.75f)
    val dirClusters = (
      aIds.zip(dirOffsets).map { case (id, o) => (id, Seq(8.0f, o)) } ++
      bIds.zip(dirOffsets).map { case (id, o) => (id, Seq(o, 8.0f)) }
    ).toDF("vec_id", "embedding")
    val trained = KMeans.train(dirClusters, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val sem = Similarity.semanticNearDupPairsWith(
        dirClusters, "vec_id", "embedding", trained, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.embeddingNearDupPairs(dirClusters, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.nonEmpty && sem.subsetOf(exact))
    // pairs stay within a direction cluster — the SemDeDup locality behavior
    assert(sem.forall { case (x, y) =>
      (aIds.contains(x) && aIds.contains(y)) || (bIds.contains(x) && bIds.contains(y))
    })
  }

  test("trained centroids slot into the IVF codebook contract") {
    val trained = KMeans.train(twoClusters, "vec_id", "embedding", k = 2, iters = 3)
    // dense 0-based cells, array<double> centroid, positive member counts —
    // the shape semanticNearDupPairs/ivfTopK expect from a codebook
    val cells = trained.select("cell").as[Long].collect().sorted
    assert(cells.toSeq == Seq(0L, 1L))
    assert(trained.schema("centroid").dataType.simpleString == "array<double>")
    assert(trained.select(min("n_members")).as[Long].head() > 0L)
  }
}
