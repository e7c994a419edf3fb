package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 1000L).map(i => (i, if (i % 4 == 0) "en" else "fr")).toDF("id", "lang")

  test("hashSample is deterministic and near the requested fraction") {
    val a = Sampling.hashSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 230 && a.size < 370) // ~300 ± sampling noise
  }

  test("hashSample is append-stable: a kept row stays kept in a superset") {
    val small = Sampling.hashSample(docs.filter($"id" <= 500), "id", 0.3)
      .select("id").as[Long].collect().toSet
    val full = Sampling.hashSample(docs, "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(full))
  }

  test("splitColumn covers every row exactly once with stable assignment") {
    val out = docs.select($"id", Sampling.splitColumn($"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts.keySet == Set("train", "val", "test"))
    // re-evaluation gives identical assignment
    val again = docs.select($"id", Sampling.splitColumn($"id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("splitColumn rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("id"), Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("stratifiedSample applies per-class fractions") {
    val out = Sampling.stratifiedSample(docs, "id", "lang",
      Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    assert(out.count() == 250) // every en row kept, nothing else
  }

  test("quotaSample caps each group at its quota, best-score-first, deterministic ties") {
    val df = (1 to 10).map(i => (i.toLong, "a", i * 10)) ++
      Seq((11L, "a", 100), (20L, "b", 5), (21L, "b", 5)) // 11 ties id 10's score
    val out = Sampling.quotaSample(df.toDF("id", "grp", "score"),
      "grp", "score", "id", quotas = Map("a" -> 3), defaultQuota = 1)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"))).toSet
    // group a: top-3 by score desc = score 100 twice (ids 10, 11 — id asc
    // keeps both via ranks 1,2) then score 90 (id 9)
    assert(out == Set(("a", 10L), ("a", 11L), ("a", 9L), ("b", 20L)))
  }

  test("balancedSample thins dominant groups to an equal share, deterministically") {
    // 250 en / 750 fr, k=2 → target 500: en survives whole, fr is thinned
    val out = Sampling.balancedSample(docs, "lang", "id")
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 250)
    assert(counts("fr") > 400 && counts("fr") < 600) // ~500 ± hash noise
    val kept = out.select("id").as[Long].collect().toSet
    val again = Sampling.balancedSample(docs.repartition(13), "lang", "id")
      .select("id").as[Long].collect().toSet
    assert(again == kept) // layout-independent acceptance
  }

  test("weightedSample caps listed groups at their share, keeps the rest whole") {
    // fr capped at 20% of 1000 = 200 expected; en (unlisted) survives whole
    val out = Sampling.weightedSample(docs, "lang", "id", Map("fr" -> 0.2))
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 250)
    assert(counts("fr") > 140 && counts("fr") < 260) // ~200 ± hash noise
    val again = Sampling.weightedSample(docs.repartition(7), "lang", "id", Map("fr" -> 0.2))
    assert(again.select("id").as[Long].collect().toSet ==
      out.select("id").as[Long].collect().toSet)
  }

  test("temperatureSample flattens head/tail shares toward n^alpha targets") {
    // groups: a=400, b=100, c=25 rows. α=0.5 → p ∝ 20/10/5 → with T=200:
    // targets 114/57/28→capped 25. Exact: p_e6 = floor(sqrt(n)*1e6+0.5)
    val df = (
      (1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 500).map(i => (i.toLong, "b")) ++
      (501 to 525).map(i => (i.toLong, "c"))
    ).toDF("id", "grp")
    val out = Sampling.temperatureSample(df, "grp", "id", alpha = 0.5, totalRows = 200L)
    val got = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    def pe6(n: Long): Long = math.floor(math.pow(n, 0.5) * 1e6 + 0.5).toLong
    val s = pe6(400) + pe6(100) + pe6(25)
    def tgt(n: Long): Long = math.min(n, math.floor(200.0 * (pe6(n).toDouble / s)).toLong)
    // acceptance keeps ~tgt of each group (hash-uniform, not exact counts);
    // the flattening property is what matters: raw 16:1 head/tail becomes ≤ 5:1
    assert(got("c").toDouble >= tgt(25) * 0.5)
    assert(got("a").toDouble / got("c") < 5.0,
      s"head/tail ${got("a")}/${got("c")} not flattened")
    // determinism
    val again = Sampling.temperatureSample(df, "grp", "id", 0.5, 200L)
    assert(again.select("id").as[Long].collect().toSet ==
      out.select("id").as[Long].collect().toSet)
  }

  test("redact scrubs emails and phone runs") {
    import graft.functions.Text
    val df = Seq(
      (1, "contact john.doe+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2, "no pii here")).toDF("id", "text")
    val out = df.select($"id", Text.redact($"text").as("c"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) == "contact <EMAIL> or call <PHONE> now")
    assert(out(2) == "no pii here")
  }

  test("weightedPick: k per group, no replacement, zero weights excluded") {
    val df = (1L to 30L).map(i => (s"g${i % 2}", i, if (i <= 2) 0L else i))
      .toDF("g", "id", "w")
    val out = Sampling.weightedPick(df, "g", "id", "w", k = 5, seed = 3)
      .select($"g", $"id", $"pick_rank").as[(String, Long, Int)].collect()
    val byG = out.groupBy(_._1)
    assert(byG("g0").length == 5 && byG("g1").length == 5)
    assert(out.map(_._2).distinct.length == out.length)      // no repeats
    assert(!out.exists(r => r._2 <= 2L))                     // w = 0 rows never picked
    byG.values.foreach(g => assert(g.map(_._3).sorted.toSeq == (1 to 5)))
    // short group: all positive-weight members picked, rank dense
    val tiny = Seq(("a", 1L, 5L), ("a", 2L, 1L)).toDF("g", "id", "w")
    assert(Sampling.weightedPick(tiny, "g", "id", "w", k = 5, seed = 3).count() == 2)
  }

  test("cluster-keyed split assignment never separates linked pairs (and the naive split would)") {
    import org.apache.spark.sql.functions._
    // 300 docs; (3i, 3i+1) are near-dup pairs, every third doc isolated
    val pairs = (0L until 100L).map(i => (3 * i, 3 * i + 1)).toDF("id_a", "id_b")
    val docs = (0L until 300L).toDF("doc_id")
    val clusters = Components.connectedComponents(pairs, "id_a", "id_b")
    def assign(keyCol: org.apache.spark.sql.Column) = docs
      .join(clusters.select(col("id").as("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"),
        Sampling.splitColumn(keyCol, Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .as("split"))
    def leaks(assigned: org.apache.spark.sql.DataFrame): Long = pairs
      .join(assigned.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(assigned.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(leaks(assign(col("rep"))) == 0,
      "cluster-keyed split must keep every near-dup family on one side")
    // power check: the same data split per-doc DOES straddle pairs
    assert(leaks(assign(col("doc_id"))) > 0,
      "test has no power — naive split never separated any pair")
  }

  test("weightedPick favors heavy weights across independent trials") {
    // 200 one-pick trials, weights 9:1 → heavy side should win ~90%
    val df = (1L to 200L).flatMap(t =>
      Seq((s"t$t", t * 2, 9L), (s"t$t", t * 2 + 1, 1L))).toDF("g", "id", "w")
    val picked = Sampling.weightedPick(df, "g", "id", "w", k = 1, seed = 11)
      .select($"id").as[Long].collect()
    val heavyWins = picked.count(_ % 2 == 0)
    assert(heavyWins > 150 && heavyWins <= 200, s"heavy wins: $heavyWins/200")
    // and the draw is seed-stable / seed-sensitive
    val again = Sampling.weightedPick(df, "g", "id", "w", k = 1, seed = 11)
      .select($"id").as[Long].collect()
    assert(again.toSeq == picked.toSeq)
    val other = Sampling.weightedPick(df, "g", "id", "w", k = 1, seed = 12)
      .select($"id").as[Long].collect()
    assert(other.toSeq != picked.toSeq)
  }
}
