package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, group, tokens) — includes a boundary-straddler (3), a multi-chunk
  // doc (5) and an empty doc (6, still contributes its separator)
  private def docs = Seq(
    (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 2047L),
    (4L, "b", 1L), (5L, "b", 4000L), (6L, "c", 0L)
  ).toDF("id", "grp", "toks")

  test("chunkPlan lays out a gapless stream in (group, id) order") {
    val out = Packing.chunkPlan(docs, "id", "grp", col("toks"), 2048L)
      .orderBy("grp", "id").collect()
    var off = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("start_off") == off, s"doc ${r.getAs[Long]("id")}")
      off += r.getAs[Long]("n_tokens") + 1
    }
    assert(off == docs.agg(sum($"toks" + 1)).as[Long].head())
  }

  test("first_seq/n_seqs match the sequences each doc's span intersects") {
    val out = Packing.chunkPlan(docs, "id", "grp", col("toks"), 2048L).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val start = r.getAs[Long]("start_off")
      val len = r.getAs[Long]("n_tokens") + 1
      assert(r.getAs[Long]("first_seq") == start / 2048)
      assert(r.getAs[Long]("n_seqs") == (start + len - 1) / 2048 - start / 2048 + 1)
      assert(r.getAs[Long]("n_seqs") >= 1)
    }
  }

  test("plan is independent of input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.chunkPlan(df, "id", "grp", col("toks"), 2048L)
        .collect().map(_.toSeq).toSet
    assert(run(docs) == run(docs.repartition(7)))
  }
}
