package graft

import scala.util.control.NonFatal

/** Orchestration-level step retry/alerting — the engine twin of the
  * reference DAG's `DEFAULT_ARGS` (`cloud_composer/datapipeline_gcp.py:38-44`:
  * `retries: 1, retry_delay: timedelta(minutes=1)`, with
  * `email_on_failure`/`email_on_retry` hooks declared but off).
  *
  * Spark already retries TASKS (`spark.task.maxAttempts`) and, on a real
  * cluster, whole STAGES on fetch failure; what it does not provide is the
  * Airflow-level retry of a whole pipeline STEP — a driver-side action
  * chain like "load raw layer" — against faults outside Spark's model
  * (a flaky object store listing, a warehouse load-job quota, a transient
  * JDBC drop). [[Steps.step]] is that layer.
  *
  * Retry grain and idempotency: a step must be safe to re-run from the
  * top. Parquet/cloud-warehouse appends are — Spark's commit protocol
  * publishes files only on job success, so a failed append leaves nothing
  * committed and the retry starts clean; the archival move is — renames of
  * already-moved files simply no longer match the glob (the reference's
  * own at-least-once contract, `datapipeline_gcp.py:258-269`). Steps are
  * therefore cut at those grains in [[Pipeline]], never grouping a
  * completed append with a failed follow-on in one retry unit.
  */
object Steps {

  /** Alert callbacks stand in for the reference's `email_on_retry` /
    * `email_on_failure` hooks: deployments plug their pager in;
    * defaults are no-ops, matching the reference's `False`. */
  final case class Policy(
      retries: Int = 1,
      retryDelayMs: Long = 60000L,
      onRetry: (String, Int, Throwable) => Unit = (_, _, _) => (),
      onFailure: (String, Throwable) => Unit = (_, _) => ())

  final case class StepFailed(step: String, attempts: Int, cause: Throwable)
      extends RuntimeException(
        s"pipeline step '$step' failed after $attempts attempt(s): " +
          s"${cause.getMessage}", cause)

  /** Run `body` under `policy`: up to `retries` re-attempts with
    * `retryDelayMs` between them, `onRetry` before each re-attempt,
    * `onFailure` then [[StepFailed]] on exhaustion. Fatal JVM errors
    * (OOM, …) are never retried — retrying a sick JVM converts a crash
    * into a hang. */
  def step[T](name: String, policy: Policy = Policy())(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case NonFatal(e) if attempt <= policy.retries =>
          policy.onRetry(name, attempt, e)
          if (policy.retryDelayMs > 0) Thread.sleep(policy.retryDelayMs)
          attempt += 1
        case NonFatal(e) =>
          policy.onFailure(name, e)
          throw StepFailed(name, attempt, e)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
