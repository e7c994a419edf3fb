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
}
