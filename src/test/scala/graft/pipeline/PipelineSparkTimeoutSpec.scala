package graft.pipeline

import graft.SparkSpec

/** The execution-timeout contract against a LIVE Spark job: the stage's
  * attempt is tagged with a per-attempt job group (interruptOnCancel), and
  * on expiry [[Pipeline]] cancels exactly that group — a runaway job that
  * would run for hours aborts within the timeout + cancel-grace window,
  * and the session stays fully usable for the retry and for later stages
  * (the surgical-cancel property: nothing session-wide is torn down). */
class PipelineSparkTimeoutSpec extends SparkSpec {

  test("a runaway Spark job is cancelled by the stage timeout and the session survives") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val started = System.nanoTime()
    // ~9e18 rows of summing: would run for hours if not cancelled
    val runaway = () => {
      if (calls.incrementAndGet() == 1) {
        spark.range(Long.MaxValue).selectExpr("sum(id)").collect()
        ()
      }
    }
    Pipeline.run(Seq(Stage("runaway-job", runaway, timeoutMs = 2000)),
      retries = 1, backoffMs = 1)
    val elapsedMs = (System.nanoTime() - started) / 1000000L
    assert(calls.get() == 2, "first attempt should time out, second should succeed")
    // timeout (2s) + cancel grace (5s) + scheduling slack; far below the
    // uncancelled job's runtime
    assert(elapsedMs < 60000, s"cancel did not bound the attempt: ${elapsedMs}ms")
    // the surgical cancel leaves the session healthy
    assert(spark.range(10).count() == 10)
  }
}
