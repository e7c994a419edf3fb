package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4 unit-ish vectors in 4-d: v1≈v2, v3 orthogonal-ish, v4 opposite v1.
  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks nearest first with deterministic ties") {
    val out = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(out((1L, 1)) == 2L) // v2 closest to v1
    assert(out((2L, 1)) == 1L)
    assert(out((4L, 2)) != 1L || out((4L, 1)) != 1L) // v1 is v4's worst match
  }

  test("bruteForceTopK cosine values match hand computation") {
    val out = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected12 = 0.9 / math.sqrt(0.81 + 0.01)
    assert(math.abs(out((1L, 2L)) - expected12) < 1e-5)
    assert(out((1L, 3L)) == 0.0)
    assert(out((1L, 4L)) == -1.0)
  }

  test("lshTopK achieves high recall vs brute force on clustered data") {
    // 40 vectors in 8-d: 4 clusters of 10 near-identical vectors.
    val data = (0 until 40).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 1.0f
      base((c * 2 + 1) % 8) = 0.3f + (i / 4) * 0.01f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(data, data, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(data, "vec_id", "embedding", dim = 8, nBits = 6, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall was $recall")
  }

  test("multi-table LSH decouples recall from bucket size at high nBits") {
    // same clustered corpus as the recall test, but nBits=16 — far too many
    // buckets for one table to keep recall; 4 independent tables restore it
    val data = (0 until 40).map { i =>
      val c = i % 4
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 1.0f
      base((c * 2 + 1) % 8) = 0.3f + (i / 4) * 0.01f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(data, data, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(tables: Int): Double = {
      val approx = Similarity.lshTopK(data, "vec_id", "embedding",
        dim = 8, nBits = 16, k = 3, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val multi = recall(4)
    assert(multi >= 0.95, s"multi-table recall was $multi")
    // table 0 of the multi-table run is exactly the single-table bucket set,
    // so the candidate set is a superset and recall is monotone in tables
    assert(multi >= recall(1))
  }

  test("ivfTopK finds within-cluster neighbors") {
    val data = (0 until 24).map { i =>
      val c = i % 3
      val base = Array.fill(6)(0.0f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.2f + (i / 3) * 0.01f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(data, "vec_id", "embedding", nlist = 6, nprobe = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every reported neighbor pair shares the same cluster (i % 3)
    assert(out.nonEmpty)
    assert(out.forall { case (q, n) => q % 3 == n % 3 })
  }

  test("lshNearDupPairs recovers the exact near-dup pairs on clustered data") {
    val data = (0 until 30).map { i =>
      val c = i % 3
      val base = Array.fill(6)(0.0f)
      base(c * 2) = 1.0f
      base(c * 2 + 1) = 0.1f + (i / 3) * 0.005f
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Similarity.embeddingNearDupPairs(data, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshNearDupPairs(data, "vec_id", "embedding",
      dim = 6, nBits = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall was $recall")
    assert((approx diff exact).isEmpty) // scoring is exact → no false positives
  }

  test("embeddingNearDupPairs returns only pairs above threshold, id_a < id_b") {
    val out = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L)))
  }

  test("exact all-pairs operators refuse oversized corpora unless overridden") {
    spark.conf.set("graft.similarity.maxExactRows", "3")
    try {
      val e = intercept[IllegalArgumentException](
        Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 1).collect())
      assert(e.getMessage.contains("lshTopK"))
      intercept[IllegalArgumentException](
        Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.5).collect())
      spark.conf.set("graft.similarity.maxExactRows", "100")
      assert(Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 1).count() > 0)
    } finally spark.conf.unset("graft.similarity.maxExactRows")
  }

  test("panelExactTopK matches bruteForceTopK on panel queries and needs no gate") {
    // the panel leg is linear in the corpus, so it must run even when the
    // all-pairs gate would refuse this corpus size
    spark.conf.set("graft.similarity.maxExactRows", "3")
    try {
      val panel = Similarity.panelExactTopK(vecs, "vec_id", "embedding",
        panelSize = 2, k = 3).collect()
      val panelIds = panel.map(_.getLong(0)).toSet
      assert(panelIds.size == 2) // exactly panelSize distinct queries
      // deterministic: same panel on a second run
      val again = Similarity.panelExactTopK(vecs, "vec_id", "embedding",
        panelSize = 2, k = 3).collect().map(_.getLong(0)).toSet
      assert(again == panelIds)
      // and per-query results agree exactly with the brute-force ranking
      spark.conf.set("graft.similarity.maxExactRows", "100")
      val brute = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 3)
        .collect().filter(r => panelIds.contains(r.getLong(0)))
        .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      val got = panel.map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
      assert(got == brute)
    } finally spark.conf.unset("graft.similarity.maxExactRows")
  }

  test("Partitions.widen fans out narrow inputs and leaves wide ones alone") {
    import org.apache.spark.sql.functions.col
    val narrow = vecs.coalesce(1)
    val widened = Partitions.widen(narrow, col("vec_id"))
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    val alreadyWide = vecs.repartition(spark.sparkContext.defaultParallelism)
    val untouched = Partitions.widen(alreadyWide, col("vec_id"))
    assert(untouched.rdd.getNumPartitions == alreadyWide.rdd.getNumPartitions)
  }

  test("rademacher hyperplanes are deterministic and balanced-ish") {
    val h1 = Similarity.rademacher(3, 64)
    val h2 = Similarity.rademacher(3, 64)
    assert(h1 == h2)
    val pos = h1.count(_ > 0)
    assert(pos > 16 && pos < 48) // not degenerate
  }

  // 3 tight semantic clusters of 3 + one singleton, 8-d
  private def clustered = (0 until 10).map { i =>
    val c = i % 3
    val base = Array.fill(8)(0.0f)
    if (i == 9) { base(7) = 1.0f }
    else { base(c * 2) = 1.0f; base(c * 2 + 1) = 0.05f * (i / 3) }
    (i.toLong, base.toSeq)
  }.toDF("vec_id", "embedding")

  test("semanticNearDupPairs finds within-cluster pairs and is a subset of exact pairs") {
    val sem = Similarity.semanticNearDupPairs(clustered, "vec_id", "embedding",
      nlist = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.embeddingNearDupPairs(clustered, "vec_id", "embedding",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(exact)) // cell partitioning can only DROP pairs
    assert(sem.nonEmpty)
    // members of the same tight cluster score ≥ .9 and share a centroid
    assert(sem.exists { case (a, b) => a % 3 == b % 3 })
    assert(!sem.exists { case (a, b) => a == 9L || b == 9L }) // singleton clean
  }

  test("marginAlign mines the mutual best pair and discounts hubs") {
    val a = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val b = Seq(
      (11L, Seq(1.0f, 0.01f)), (12L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val mined = Similarity.marginAlign(
      Similarity.bruteForceTopK(a, b, "vec_id", "embedding", k = 2),
      Similarity.bruteForceTopK(b, a, "vec_id", "embedding", k = 2),
      minMarginE6 = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // a1↔b1 is the only MUTUAL best (a2's best is also b1, but b1's best
    // is a1), and its margin clears 1.0 because each side's neighborhood
    // average is dragged down by the orthogonal-ish second vector
    assert(mined.map(t => (t._1, t._2)).toSeq == Seq((1L, 11L)))
    assert(mined.head._3 > 1000000L)
    // raising the bar above the pair's margin empties the result
    val strict = Similarity.marginAlign(
      Similarity.bruteForceTopK(a, b, "vec_id", "embedding", k = 2),
      Similarity.bruteForceTopK(b, a, "vec_id", "embedding", k = 2),
      minMarginE6 = 10000000L)
    assert(strict.count() == 0)
  }

  test("zero-norm vectors match nothing instead of failing the job") {
    import org.apache.spark.sql.functions.col
    val withZero = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.01f)), (3L, Seq(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(withZero, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // the zero vector pairs with nothing
    val topk = Similarity.bruteForceTopK(withZero, withZero, "vec_id", "embedding", k = 2)
    assert(topk.filter(col("query_id") === 3L)
      .select("cosine_sim").collect().forall(_.isNullAt(0)))
  }

  test("semanticDedupKeepers keeps the min id per semantic family") {
    val kept = Similarity.semanticDedupKeepers(clustered, "vec_id", "embedding",
        nlist = 4, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    // every family keeper is its minimum member; singleton survives
    assert(kept.contains(9L))
    val sem = Similarity.semanticNearDupPairs(clustered, "vec_id", "embedding",
      nlist = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    import org.apache.spark.sql.functions.col
    val losers = Components.connectedComponents(
        sem.toSeq.toDF("id_a", "id_b"), "id_a", "id_b")
      .filter(col("id") =!= col("cluster_id")).select("id").as[Long].collect().toSet
    assert(kept == (0L to 9L).toSet -- losers)
  }

  test("maxSimTopK scores by sum of per-query-token best cosines") {
    // 2 docs of 2 vectors (groupSize=2): doc0 = {e1, e2}, doc1 = {e1-ish, e2},
    // doc2 = {orthogonal, opposite}. MaxSim(doc0, doc1) ≈ cos(e1,e1') + 1.0;
    // doc2 matches doc0 far worse on both tokens.
    val mv = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.maxSimTopK(mv, "vec_id", "embedding",
        groupSize = 2, panelSize = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3))).toMap
    // every doc is a panel query (panelSize covers all 3 docs)
    assert(out.keySet.map(_._1) == Set(0L, 1L, 2L))
    val cos12 = 0.9 / math.sqrt(0.81 + 0.01)
    assert(math.abs(out((0L, 1L))._1 - (cos12 + 1.0)) < 1e-5)
    assert(out((0L, 1L))._2 == 1) // doc1 outranks doc2 for doc0
    assert(out((0L, 2L))._2 == 2)
    // doc0↔doc1 symmetric here: same best-match structure both ways
    assert(math.abs(out((1L, 0L))._1 - (cos12 + 1.0)) < 1e-5)
  }

  test("maxSimTopK rank is dense 1..k per query doc with deterministic ties") {
    val mv = (0L until 16L).map(i =>
      (i, Seq.tabulate(4)(d => if (d == (i % 4).toInt) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.maxSimTopK(mv, "vec_id", "embedding",
      groupSize = 4, panelSize = 4, k = 3).collect()
    val byQ = rows.groupBy(_.getLong(0))
    // 4 docs, each with identical token structure → all ties; ranking
    // must still be dense and by neighbor id ascending
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
      val ordered = rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      assert(ordered == ordered.sorted)
    }
  }
}
