package graft.quality

import graft.SparkSpec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some("a"), 5),
    (2, None, 30),
    (3, Some("c"), 10)
  ).toDF("id", "name", "hour")

  test("NotEmpty passes on non-empty, fails on empty") {
    assert(Checks.run(df, Seq(NotEmpty)).passed)
    assert(!Checks.run(df.filter($"id" > 99), Seq(NotEmpty)).passed)
  }

  test("NoNulls counts violations per column set") {
    val r = Checks.run(df, Seq(NoNulls(Seq("id", "name"))))
    assert(!r.passed)
    assert(r.results.head.violations == 1)
    assert(Checks.run(df, Seq(NoNulls(Seq("id", "hour")))).passed)
  }

  test("InRange flags out-of-range non-null values only") {
    val r = Checks.run(df, Seq(InRange("hour", 0, 23)))
    assert(r.results.head.violations == 1)
    assert(Checks.run(df, Seq(InRange("hour", 0, 30))).passed)
  }

  test("Unique detects duplicate keys") {
    val dup = df.union(df.filter($"id" === 1))
    assert(!Checks.run(dup, Seq(Unique(Seq("id")))).passed)
    assert(Checks.run(df, Seq(Unique(Seq("id")))).passed)
  }

  test("observed() rides the pipeline's own action — same report, zero extra scans") {
    val checks = Seq(NotEmpty, NoNulls(Seq("name")), InRange("hour", 0, 23))
    val (instrumented, obs) = Checks.observed(df, checks)
    // the pipeline's OWN action (here a write) drives the counters
    instrumented.write.format("noop").mode("overwrite").save()
    val viaObserve = Checks.reportFrom(obs, checks)
    val viaRun = Checks.run(df, checks)
    assert(viaObserve.results == viaRun.results)
    assert(!viaObserve.passed) // the null name + hour 30 violations
    // Unique is rejected (needs a group-by, can't ride an observe)
    intercept[IllegalArgumentException] {
      Checks.observed(df, Seq(Unique(Seq("id"))) ++ checks)
    }
  }

  test("observedStream surfaces per-micro-batch quality metrics in streaming progress") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Int, Option[String], Int)]
    val checks = Seq(NotEmpty, NoNulls(Seq("name")), InRange("hour", 0, 23))
    val stream = Checks.observedStream(input.toDF.toDF("id", "name", "hour"), checks)
    val q = stream.writeStream.format("noop").start()
    try {
      input.addData((1, Some("a"), 5), (2, None, 30))
      q.processAllAvailable()
      val report = q.recentProgress.toSeq
        .flatMap(p => Checks.reportFromProgress(p, checks)).lastOption
      assert(report.isDefined, "no observed metrics in any progress event")
      // one null name + one out-of-range hour in the batch
      assert(report.get.results.map(_.violations) == Seq(0L, 1L, 1L))
      assert(!report.get.passed)
    } finally q.stop()
  }

  test("all scalar checks evaluate in one pass and report together") {
    val r = Checks.run(df, Seq(NotEmpty, NoNulls(Seq("name")), InRange("hour", 0, 23)))
    assert(r.results.size == 3)
    assert(r.results.count(!_.passed) == 2)
  }

  test("enforce throws with every failing check named") {
    val r = Checks.run(df, Seq(NoNulls(Seq("name")), InRange("hour", 0, 23)))
    val e = intercept[IllegalStateException](r.enforce())
    assert(e.getMessage.contains("no_nulls"))
    assert(e.getMessage.contains("in_range"))
  }

  test("referentialIntegrity counts orphans, ignores null FKs") {
    val fact = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    val r = Checks.referentialIntegrity(fact, "fk", dim, "pk")
    assert(r.violations == 1 && !r.passed)
  }

  test("nullAudit returns one row of per-column null counts") {
    val row = Checks.nullAudit(df, Seq("id", "name")).collect().head
    assert(row.getLong(0) == 3)      // n_rows
    assert(row.getLong(1) == 0)      // null_id
    assert(row.getLong(2) == 1)      // null_name
  }
}
