package graft

import org.scalatest.funsuite.AnyFunSuite

/** Orchestration-level retry/alerting (reference DEFAULT_ARGS,
  * `datapipeline_gcp.py:38-44`): retried-then-green steps succeed with
  * the retry hook fired; exhausted steps alert and raise StepFailed. */
class StepsSpec extends AnyFunSuite {

  private def policy(retries: Int,
                     retried: scala.collection.mutable.Buffer[(String, Int)],
                     failed: scala.collection.mutable.Buffer[String]) =
    Steps.Policy(
      retries = retries, retryDelayMs = 0,
      onRetry = (n, a, _) => retried += ((n, a)),
      onFailure = (n, _) => failed += n)

  test("a step that fails once then succeeds is retried to success") {
    val retried = scala.collection.mutable.Buffer.empty[(String, Int)]
    val failed = scala.collection.mutable.Buffer.empty[String]
    var calls = 0
    val out = Steps.step("flaky", policy(1, retried, failed)) {
      calls += 1
      if (calls == 1) sys.error("transient store listing failure")
      42
    }
    assert(out == 42 && calls == 2)
    assert(retried.toList == List(("flaky", 1)) && failed.isEmpty)
  }

  test("exhausted retries alert onFailure and raise StepFailed with cause") {
    val retried = scala.collection.mutable.Buffer.empty[(String, Int)]
    val failed = scala.collection.mutable.Buffer.empty[String]
    var calls = 0
    val e = intercept[Steps.StepFailed] {
      Steps.step("down", policy(2, retried, failed)) {
        calls += 1; sys.error(s"hard failure $calls")
      }
    }
    assert(calls == 3) // 1 attempt + 2 retries, the reference's retries+1
    assert(e.step == "down" && e.attempts == 3)
    assert(e.getCause.getMessage == "hard failure 3")
    assert(retried.toList == List(("down", 1), ("down", 2)))
    assert(failed.toList == List("down"))
  }

  test("zero-retry policy fails on the first error, no retry hook") {
    val retried = scala.collection.mutable.Buffer.empty[(String, Int)]
    val failed = scala.collection.mutable.Buffer.empty[String]
    intercept[Steps.StepFailed] {
      Steps.step("once", policy(0, retried, failed))(sys.error("boom"))
    }
    assert(retried.isEmpty && failed.toList == List("once"))
  }

  test("fatal JVM errors pass through unretried and unwrapped") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Steps.step("fatal", Steps.Policy(retries = 3, retryDelayMs = 0)) {
        calls += 1; throw new OutOfMemoryError("sick JVM")
      }
    }
    assert(calls == 1)
  }

  test("retry delay is honored between attempts") {
    var calls = 0
    val t0 = System.nanoTime()
    Steps.step("slow", Steps.Policy(retries = 1, retryDelayMs = 50)) {
      calls += 1; if (calls == 1) sys.error("once")
    }
    assert((System.nanoTime() - t0) / 1e6 >= 50.0)
  }
}
