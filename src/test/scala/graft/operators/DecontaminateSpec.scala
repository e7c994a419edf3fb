package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 100 is verbatim-contained in train doc 1; train doc 2 shares
  // only a short (<minShared distinct 3-grams) overlap; train doc 3 is clean
  private def train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every single day"),
    (2L, "the quick brown cat sleeps in warm sunny places all afternoon"),
    (3L, "completely unrelated text about spark catalyst optimizer rules")
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "quick brown fox jumps over the lazy dog"),
    (101L, "benchmark question with no training overlap at all")
  ).toDF("doc_id", "text")

  test("overlapReport flags verbatim containment and scores distinct shared grams") {
    val rep = Decontaminate.overlapReport(train, bench, "doc_id", "text",
        n = 3, minShared = 3)
      .as[(Long, Long, Long)].collect().toSet
    // doc 100 (8 tokens) has 6 distinct 3-grams, all present in doc 1
    assert(rep.contains((1L, 100L, 6L)))
    // doc 2 shares only "the quick brown" → below minShared
    assert(!rep.exists(_._1 == 2L))
    assert(!rep.exists(_._1 == 3L))
    assert(!rep.exists(_._2 == 101L))
  }

  test("clean drops exactly the flagged train docs, keeping all columns") {
    val out = Decontaminate.clean(train, bench, "doc_id", "text",
      n = 3, minShared = 3)
    assert(out.columns.toSeq == train.columns.toSeq)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("broadcast and shuffle paths agree") {
    val a = Decontaminate.overlapReport(train, bench, "doc_id", "text",
      n = 3, minShared = 1, broadcastBench = true).collect().map(_.toString).sorted.toSeq
    val b = Decontaminate.overlapReport(train, bench, "doc_id", "text",
      n = 3, minShared = 1, broadcastBench = false).collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("bench side participates broadcast in the executed plan") {
    val rep = Decontaminate.overlapReport(train, bench, "doc_id", "text",
      n = 3, minShared = 1, broadcastBench = true)
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
