package graft.pipeline


import scala.util.control.NonFatal

/** Driver-side stage sequencing with retries — the engine-level analog of
  * the reference's Airflow DAG (`/root/reference/dags/
  * music_streaming_etl_dags.py:339-343` retries=3, `:430-440` chain).
  *
  * Spark already retries tasks/stages internally; this wrapper covers the
  * reference's *pipeline-stage* retry semantics (a validation raise → rerun
  * the stage). Stages are named thunks so failures report which stage died
  * and after how many attempts.
  */
final case class Stage(name: String, run: () => Unit)

final class PipelineFailure(val stage: String, val attempts: Int, cause: Throwable)
  extends RuntimeException(s"stage '$stage' failed after $attempts attempts", cause)

object Pipeline {

  /** Run stages in order; each stage gets `retries` extra attempts with
    * `backoffMs` sleep between them (Airflow: retries=3,
    * retry_delay=1min — we default the same count, short backoff). */
  def run(stages: Seq[Stage], retries: Int = 3, backoffMs: Long = 1000): Unit =
    stages.foreach(s => runStage(s, retries, backoffMs))

  private def runStage(stage: Stage, retries: Int, backoffMs: Long): Unit = {
    var attempt = 1
    var done = false
    while (!done) {
      try { stage.run(); done = true }
      catch {
        case NonFatal(e) if attempt < retries + 1 =>
          System.err.println(s"[pipeline] stage '${stage.name}' attempt $attempt failed: ${e.getMessage}; retrying")
          Thread.sleep(backoffMs)
          attempt += 1
        case NonFatal(e) => throw new PipelineFailure(stage.name, attempt, e)
      }
    }
  }
}
