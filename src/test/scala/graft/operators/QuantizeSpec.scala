package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(0.0f, 1.0f, 0.5f, 0.25f)),
    (2L, Seq(-2.0f, 2.0f, 0.0f, 1.0f)),
    (3L, Seq(3.0f, 3.0f, 3.0f, 3.0f))   // constant vector
  ).toDF("vec_id", "embedding")

  test("int8 codes span 0..255 with exact endpoints") {
    val out = Quantize.int8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getSeq[Int](3)))).toMap
    assert(out(1L) == ((0.0, 1.0, Seq(0, 255, 128, 64))))
    assert(out(2L)._3.head == 0 && out(2L)._3(1) == 255)
    assert(out(3L) == ((3.0, 3.0, Seq(0, 0, 0, 0))))
  }

  test("dequantization error is within half a quantization step") {
    val q = Quantize.int8(vecs, "vec_id", "embedding")
    val back = Quantize.dequantInt8(q, "qvec", "q_lo", "q_hi")
      .select(col("vec_id"), col("dequant"))
    val orig = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("o"))
    val joined = back.join(orig, "vec_id").collect()
    joined.foreach { r =>
      val d = r.getSeq[Double](1); val o = r.getSeq[Double](2)
      val step = (o.max - o.min) / 255.0
      d.zip(o).foreach { case (a, b) =>
        assert(math.abs(a - b) <= step / 2 + 1e-12, s"err ${math.abs(a - b)} > ${step / 2}")
      }
    }
  }

  // ---- product quantization ----

  private def realEmb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqCodes: m rows per vector, codes in [0, k); anchored vectors pick their codeword") {
    // 4-dim, m=2 (subDim 2): codebook from ids 1,2 (whichever hashes lower
    // is codeword 0). Vectors AT a codeword position must encode to it.
    val data = Seq(
      (1L, Seq(0.0f, 0.0f, 5.0f, 5.0f)),
      (2L, Seq(9.0f, 9.0f, -5.0f, -5.0f)),
      (3L, Seq(0.1f, -0.1f, -4.9f, -5.2f))  // near 1's first half, 2's second half
    ).toDF("vec_id", "embedding")
    val cb = Quantize.pqCodebook(data, "vec_id", "embedding", m = 2, k = 2)
    assert(cb.size == 4)
    val codes = Quantize.pqCodes(data, "vec_id", "embedding", cb)
      .as[(Long, Int, Int)].collect()
    assert(codes.length == 6)
    assert(codes.forall(c => c._3 >= 0 && c._3 < 2))
    val byVec = codes.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    // whichever j holds vector 1's subvecs, vector 3 must follow its halves:
    val j1 = byVec(1L); val j2 = byVec(2L)
    assert(byVec(3L).toSeq == Seq(j1(0), j2(1)))
  }

  test("pqTopK: per-query ranks are 1..k, self excluded, ADC dist is the code-table sum") {
    val out = Quantize.pqTopK(realEmb, "vec_id", "embedding", m = 8, codebookK = 16, k = 5)
    val rows = out.as[(Long, Long, Long, Int)].collect()
    assert(rows.forall(r => r._1 != r._2))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 500)
    byQ.values.foreach { rs => assert(rs.map(_._4).sorted.toSeq == (1 to 5)) }
  }

  test("pq recall on random vectors beats chance by an order of magnitude") {
    // random embeddings are PQ's worst case and this codebook is untrained —
    // measured recall@5 ≈ 0.13 vs 0.01 chance; the bound is the floor that
    // catches a broken ADC join, not a quality target.
    val emb = realEmb
    val pq = Quantize.pqTopK(emb, "vec_id", "embedding", m = 8, codebookK = 16, k = 5)
    val b = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ex = b.select(col("vec_id").as("q"), col("v").as("qv"))
      .join(broadcast(b.select(col("vec_id").as("n"), col("v").as("nv"))), col("q") =!= col("n"))
      .withColumn("d", graft.functions.Vectors.l2Squared(col("qv"), col("nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy(col("d").asc, col("n").asc)
    val exact = ex.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select(col("q"), col("n"))
    val hits = pq.select(col("query_id").as("q"), col("neighbor_id").as("n"))
      .join(exact, Seq("q", "n")).count()
    val recall = hits / (500.0 * 5)
    assert(recall > 0.05, s"recall@5 $recall")
  }

  test("ivfPqTopK: ranks well-formed; candidates only from probed cells") {
    val emb = realEmb
    val out = Quantize.ivfPqTopK(emb, "vec_id", "embedding",
      nlist = 16, nprobe = 4, m = 8, codebookK = 16, k = 5)
    val rows = out.as[(Long, Long, Long, Int)].collect()
    assert(rows.forall(r => r._1 != r._2))
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 5)
    }
    // IVF pruning invariant: each neighbor's assigned cell ∈ query's probes
    val coarse = Quantize.coarseCodebook(emb, "vec_id", "embedding", 16)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2e6(a: Seq[Double], b: Seq[Double]): Long = {
      var s = 0.0; var i = 0
      while (i < a.size) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.floor(s * 1e6 + 0.5).toLong
    }
    def cellRank(v: Seq[Double]): Seq[Int] =
      coarse.map { case (c, cv) => (d2e6(v, cv), c) }.sorted.map(_._2)
    rows.foreach { case (q, n, _, _) =>
      val probed = cellRank(vecs(q)).take(4).toSet
      assert(probed.contains(cellRank(vecs(n)).head), s"($q,$n) outside probed cells")
    }
    // on structureless random vectors recall ≈ pq-recall × nprobe/nlist —
    // measured 0.035 vs 0.01 chance; the clustered test below is the
    // design point. This bound only catches a broken ADC/cell join.
  }

  test("ivfPqTopK recovers cluster neighbors on clustered data") {
    // 4 tight clusters of 25 vectors in 8-dim: IVF's design point. With
    // nlist=4/nprobe=2 the true nearest neighbors share the query's cell.
    val rnd = new scala.util.Random(7)
    val data = (0 until 100).map { i =>
      val c = i % 4
      val center = Seq.tabulate(8)(d => if (d % 4 == c) 10.0f else 0.0f)
      (i.toLong, center.map(x => x + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val out = Quantize.ivfPqTopK(data, "vec_id", "embedding",
      nlist = 4, nprobe = 2, m = 4, codebookK = 8, k = 3)
      .as[(Long, Long, Long, Int)].collect()
    // every returned neighbor is from the query's own cluster
    val sameCluster = out.count { case (q, n, _, _) => q % 4 == n % 4 }
    assert(sameCluster.toDouble / out.length > 0.95,
      s"only $sameCluster/${out.length} neighbors in-cluster")
  }

  test("k-means-trained codebook cuts reconstruction error vs hash-sampled") {
    val emb = realEmb
    def reconErr(cb: Seq[(Int, Int, Seq[Double])]): Double = {
      val codes = Quantize.pqCodes(emb, "vec_id", "embedding", cb)
        .withColumnRenamed("code", "j")
      val qd = Quantize.pqQueryDistances(emb, "vec_id", "embedding", cb)
      codes.join(qd, Seq("vec_id", "s", "j")).agg(avg("d_e6")).as[Double].head()
    }
    val sampled = reconErr(Quantize.pqCodebook(emb, "vec_id", "embedding", 8, 16))
    val trained = reconErr(Quantize.pqCodebookTrained(emb, "vec_id", "embedding", 8, 16, iters = 5))
    // measured: sampled ≈ 95542, trained ≈ 68802 (28% down)
    assert(trained < sampled, s"trained $trained !< sampled $sampled")
  }

  test("randomProject: JL norm estimate is unbiased-ish and exactly reproducible") {
    import spark.implicits._
    val vecs = (0L until 64L).map { i =>
      (i, Seq.tabulate(32)(j => (((i * 31 + j * 17) % 13).toFloat - 6f) / 6f))
    }.toDF("vec_id", "embedding")
    val out = Quantize.randomProject(vecs, "vec_id", "embedding", dim = 32, k = 8)
    val ratios = out.select("ratio_e6").as[Long].collect()
    // distortion concentrates near 1e6 (k=8 is loose — allow wide band)
    val mean = ratios.sum.toDouble / ratios.length
    assert(math.abs(mean - 1e6) < 3e5, s"mean ratio $mean far from 1e6")
    // bit-identical across partitionings (exact-integer contract)
    val again = Quantize.randomProject(vecs.repartition(7), "vec_id", "embedding",
        dim = 32, k = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again == out.as[(Long, Long, Long, Long)].collect().toSet)
    // zero vector: norm 0 → null ratio, never a divide error
    val z = Quantize.randomProject(
      Seq((0L, Seq.fill(32)(0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 32, k = 8)
    assert(z.select("ratio_e6").collect().head.isNullAt(0))
  }
}
