package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized cross-check of the BM25 operator against an INDEPENDENT
  * plain-Scala reference implementation — the distributed plan (inverted
  * index, broadcast constants, quantized idf) must agree with the obvious
  * sequential computation on every randomized corpus, not just the
  * registered oracle's synthetic table. */
class RetrievalPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val K1 = 1.2
  private val B = 0.75

  private def corpus(seed: Int, nDocs: Int): Vector[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    Vector.tabulate(nDocs) { i =>
      (i.toLong, Vector.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  /** Sequential BM25 with the operator's exact quantization contract. */
  private def referenceTopK(docs: Vector[(Long, String)], queryIds: Set[Long],
      k: Int): Set[(Long, Long, Long, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }.toMap
    val n = docs.size.toLong
    val sumDl = toks.values.map(_.size.toLong).sum
    val df = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val idfE6 = df.map { case (t, d) =>
      t -> math.floor(math.log(1.0 + (n - d + 0.5) / (d + 0.5)) * 1e6 + 0.5).toLong
    }
    (for {
      q <- queryIds.toVector
      qTerms = toks(q).distinct
      scored = docs.collect { case (d, _) if d != q =>
        val dl = toks(d).size.toLong
        val tfs = toks(d).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        val s = qTerms.collect { case t if tfs.contains(t) =>
          val tf = tfs(t)
          val tfn = tf * (K1 + 1.0) / (tf + K1 * ((1.0 - B) + B * dl * n / sumDl))
          math.floor(idfE6(t) * tfn + 0.5).toLong
        }.sum
        (d, s)
      }.filter(_._2 > 0L)
      ranked = scored.sortBy { case (d, s) => (-s, d) }.take(k)
      ((d, s), r) <- ranked.zipWithIndex
    } yield (q, d, s, r + 1)).toSet
  }

  test("bm25TopK matches the sequential reference on randomized corpora") {
    for (seed <- Seq(1, 7, 23)) {
      val docs = corpus(seed, 30)
      val qids = Set(0L, 7L, 19L)
      val df = docs.toDF("doc_id", "text")
      val got = Retrieval.bm25TopK(df, df.where(col("doc_id").isin(qids.toSeq: _*)),
          "doc_id", "text", "doc_id", "text", k = 4)
        .as[(Long, Long, Long, Int)].collect().toSet
      val want = referenceTopK(docs, qids, k = 4)
      assert(got == want, s"seed $seed: ${got.diff(want)} vs ${want.diff(got)}")
    }
  }

  test("rrfFuse of a ranking with itself preserves its order at doubled score") {
    val docs = corpus(5, 25)
    val df = docs.toDF("doc_id", "text")
    val leg = Retrieval.bm25TopK(df, df.where(col("doc_id") === 0),
        "doc_id", "text", "doc_id", "text", k = 5)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val fused = Retrieval.rrfFuse(Seq(leg, leg), k = 5)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    val orig = leg.as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(fused.map(_._2).toSeq == orig.map(_._2).toSeq)   // order preserved
    fused.foreach(r => assert(r._3 == 2L * (1000000L / (60 + r._4))))
  }
}
