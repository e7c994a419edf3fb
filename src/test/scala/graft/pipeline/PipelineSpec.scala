package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  test("stages run in order") {
    val log = collection.mutable.Buffer[String]()
    Pipeline.run(Seq(
      Stage("a", () => log += "a"),
      Stage("b", () => log += "b")), retries = 0, backoffMs = 1)
    assert(log.toSeq == Seq("a", "b"))
  }

  test("transient failure is retried up to the limit then succeeds") {
    var calls = 0
    Pipeline.run(Seq(Stage("flaky", () => {
      calls += 1
      if (calls < 3) sys.error("transient")
    })), retries = 3, backoffMs = 1)
    assert(calls == 3)
  }

  test("persistent failure surfaces stage name and attempt count") {
    var calls = 0
    val e = intercept[PipelineFailure] {
      Pipeline.run(Seq(Stage("doomed", () => { calls += 1; sys.error("nope") })),
        retries = 2, backoffMs = 1)
    }
    assert(e.stage == "doomed")
    assert(e.attempts == 3) // 1 + 2 retries (Airflow retries=3 semantics)
    assert(calls == 3)
  }

  test("later stages do not run after a failure") {
    var ran = false
    intercept[PipelineFailure] {
      Pipeline.run(Seq(
        Stage("fail", () => sys.error("x")),
        Stage("next", () => ran = true)), retries = 0, backoffMs = 1)
    }
    assert(!ran)
  }

  test("a hung attempt times out and the stage retries to success") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    Pipeline.run(Seq(Stage("hangs-once", () => {
      if (calls.incrementAndGet() == 1) Thread.sleep(60000) // hung first attempt
    }, timeoutMs = 250)), retries = 1, backoffMs = 1)
    assert(calls.get() == 2) // attempt 1 timed out, attempt 2 succeeded
  }

  test("a persistently hung stage fails with StageTimeout as the cause") {
    val e = intercept[PipelineFailure] {
      Pipeline.run(Seq(Stage("wedged", () => Thread.sleep(60000), timeoutMs = 200)),
        retries = 1, backoffMs = 1)
    }
    assert(e.stage == "wedged")
    assert(e.attempts == 2)
    assert(e.getCause.isInstanceOf[StageTimeout])
    assert(e.getCause.getMessage.contains("200ms"))
  }

  test("timeoutMs = 0 (the default) imposes no bound and runs inline") {
    val thread = Thread.currentThread()
    var sameThread = false
    Pipeline.run(Seq(Stage("inline", () => sameThread = Thread.currentThread() eq thread)),
      retries = 0, backoffMs = 1)
    assert(sameThread)
  }

  test("a timed-out attempt's failure does not mask a later attempt's error") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[PipelineFailure] {
      Pipeline.run(Seq(Stage("hang-then-raise", () => {
        if (calls.incrementAndGet() == 1) Thread.sleep(60000)
        else sys.error("real failure")
      }, timeoutMs = 200)), retries = 1, backoffMs = 1)
    }
    assert(e.attempts == 2)
    assert(e.getCause.getMessage == "real failure")
  }
}
