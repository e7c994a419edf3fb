package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MixtureSpec extends SparkSpec {

  private def docs(sizes: Map[String, Int]) = {
    val rows = for {
      (src, n) <- sizes.toSeq.sortBy(_._1)
      i <- 0 until n
    } yield Row(src.hashCode.toLong * 1000 + i, src)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 5),
      StructType(Seq(StructField("doc_id", LongType), StructField("source", StringType))))
  }

  private val weights = Map("a" -> 4, "b" -> 2, "c" -> 1)
  private val wCol = when(col("source") === "a", 4)
    .when(col("source") === "b", 2).otherwise(1)

  /** Brute-force stride schedule on the driver: same key, same ties. */
  private def reference(sizes: Map[String, Int]): Seq[(Long, String)] = {
    val rows = for {
      (src, n) <- sizes.toSeq
      i <- 0 until n
      id = src.hashCode.toLong * 1000 + i
      k = i + 1
    } yield (id, src, (2L * k - 1) * (12 / weights(src)))
    rows.sortBy { case (id, src, key) => (key, src, id) }.map(t => (t._1, t._2))
  }

  test("interleave matches the brute-force stride schedule exactly") {
    val sizes = Map("a" -> 40, "b" -> 25, "c" -> 7)
    val out = Mixture.interleave(docs(sizes), "doc_id", "source", wCol, strideLcm = 12)
      .orderBy("mix_pos").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == reference(sizes))
  }

  test("weighted sources dominate every prefix proportionally") {
    val sizes = Map("a" -> 60, "b" -> 60, "c" -> 60)
    val seq = Mixture.interleave(docs(sizes), "doc_id", "source", wCol, strideLcm = 12)
      .orderBy("mix_pos").select("source").collect().map(_.getString(0))
    // stride scheduling bound: source s has emitted within ±1 of its
    // fair share w_s/W of any prefix that no source has yet exhausted
    val total = weights.values.sum.toDouble
    for (m <- 7 to 7 * 9 by 7) {
      val prefix = seq.take(m)
      for ((s, w) <- weights) {
        val fair = m * w / total
        val got = prefix.count(_ == s)
        assert(math.abs(got - fair) <= 1.0, s"prefix $m source $s: $got vs fair $fair")
      }
    }
  }

  test("order is deterministic under input repartitioning") {
    val sizes = Map("a" -> 30, "b" -> 11, "c" -> 5)
    def run(parts: Int) =
      Mixture.interleave(docs(sizes).repartition(parts), "doc_id", "source", wCol, 12)
        .select("doc_id", "mix_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(2) == run(13))
  }

  test("a weight that does not divide the stride LCM fails loudly") {
    val bad = when(col("source") === "a", 5).otherwise(1)
    val ex = intercept[Exception] {
      Mixture.interleave(docs(Map("a" -> 3, "b" -> 3)), "doc_id", "source", bad, 12).collect()
    }
    assert(ex.getMessage.contains("divisor") || ex.getCause != null)
  }
}
