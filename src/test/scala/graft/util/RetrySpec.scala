package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Bounded-backoff retry semantics (no Spark needed). */
class RetrySpec extends AnyFunSuite {

  private class Flaky(failures: Int) {
    var calls = 0
    def apply(): String = {
      calls += 1
      if (calls <= failures) throw new RuntimeException(s"flaky #$calls")
      "ok"
    }
  }

  test("transient failures are retried with exponential backoff, then succeed") {
    val f = new Flaky(2)
    var sleeps = List.empty[Long]
    val out = Retry.withBackoff(maxRetries = 3, baseBackoffMs = 100L,
      sleep = ms => sleeps ::= ms)(f())
    assert(out == "ok")
    assert(f.calls == 3)                      // 2 failures + 1 success
    assert(sleeps.reverse == List(100L, 200L)) // 2^n backoff
  }

  test("the last failure is rethrown once retries are exhausted") {
    val f = new Flaky(100)
    val e = intercept[RuntimeException] {
      Retry.withBackoff(maxRetries = 2, baseBackoffMs = 1L, sleep = _ => ())(f())
    }
    assert(e.getMessage == "flaky #3") // 1 initial try + 2 retries
    assert(f.calls == 3)
  }

  test("a first-try success never sleeps") {
    var slept = false
    val out = Retry.withBackoff(sleep = _ => slept = true)(42)
    assert(out == 42 && !slept)
  }
}
