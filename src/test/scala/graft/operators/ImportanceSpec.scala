package graft.operators

import graft.SparkSpec
import graft.functions.PortableHash
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  private def target = Seq(
    (1L, "alpha beta alpha"),
    (2L, "alpha gamma")
  ).toDF("doc_id", "text")

  private def raw = Seq(
    (1L, "alpha beta alpha"),
    (2L, "alpha gamma"),
    (3L, "noise noise noise junk")
  ).toDF("doc_id", "text")

  private def bucket(term: String): Int = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(md5.take(15), 16) % B).toInt
  }

  private def lrE6(ct: Long, cr: Long, ctt: Long, crt: Long): Long =
    math.floor(math.log(((ct + 1.0) / (cr + 1.0)) * ((crt + B.toDouble) / (ctt + B.toDouble)))
      * 1e6 + 0.5).toLong

  test("bucketLogRatios matches hand computation on every touched bucket") {
    val stats = Importance.bucketLogRatios(target, raw, "doc_id", "text", B)
      .as[(Long, Long)].collect().toMap
    assert(stats.size == B)
    // totals: target = 5 tokens, raw = 9 tokens
    val perBucketCt = Seq("alpha", "beta", "alpha", "alpha", "gamma")
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val perBucketCr = (Seq("alpha", "beta", "alpha", "alpha", "gamma") ++
      Seq("noise", "noise", "noise", "junk"))
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    (0 until B).foreach { b =>
      val exp = lrE6(perBucketCt.getOrElse(b, 0L), perBucketCr.getOrElse(b, 0L), 5L, 9L)
      assert(stats(b.toLong) == exp, s"bucket $b")
    }
  }

  test("target-like docs weigh above off-target docs; weights are tf-weighted sums") {
    val out = Importance.dsirWeights(target, raw, raw, "doc_id", "text", B)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3L)
    assert(out(3L)._2 == 4L)
    // doc1 is pure target vocabulary, doc3 pure off-target
    assert(out(1L)._3 > out(3L)._3)
    assert(out(3L)._3 < 0L)
    // avg is the rounded mean of the sum
    val d1 = out(1L)
    assert(d1._4 == math.floor(d1._3.toDouble / d1._2 + 0.5).toLong)
  }

  test("every scored doc appears; zero-token impossible (empty text is one token)") {
    val out = Importance.dsirWeights(target, raw, raw, "doc_id", "text", B)
    assert(out.count() == 3L)
    assert(out.filter(col("n_tokens") === 0).count() == 0L)
  }

  test("bucket hash agrees with PortableHash.hash60 % buckets") {
    val spark2 = spark
    import spark2.implicits._
    val terms = Seq("alpha", "noise", "junk", "gamma").toDF("t")
    val got = terms.select((PortableHash.hash60(col("t")) % B).cast("int").as("b"))
      .as[Int].collect()
    assert(got.toSeq == Seq("alpha", "noise", "junk", "gamma").map(bucket))
  }
}
