package graft.util

import java.io.IOException

import org.scalatest.funsuite.AnyFunSuite

/** Bounded-backoff retry semantics (no Spark needed). */
class RetrySpec extends AnyFunSuite {

  private class Flaky(failures: Int, mk: String => Exception = new IOException(_)) {
    var calls = 0
    def apply(): String = {
      calls += 1
      if (calls <= failures) throw mk(s"flaky #$calls")
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
    val e = intercept[IOException] {
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

  test("deterministic failures are NOT retried by default (no wasted backoff)") {
    val f = new Flaky(100, msg => new IllegalArgumentException(msg))
    var slept = false
    val e = intercept[IllegalArgumentException] {
      Retry.withBackoff(maxRetries = 3, sleep = _ => slept = true)(f())
    }
    assert(e.getMessage == "flaky #1" && f.calls == 1 && !slept)
  }

  test("an IOException buried in the cause chain still counts as transient") {
    val f = new Flaky(1,
      msg => new RuntimeException("wrapper", new IOException(msg)))
    val out = Retry.withBackoff(maxRetries = 2, sleep = _ => ())(f())
    assert(out == "ok" && f.calls == 2)
  }

  test("retryable = always retries any exception (the sink-writer mode)") {
    val f = new Flaky(2, msg => new RuntimeException(msg))
    val out = Retry.withBackoff(maxRetries = 3, sleep = _ => (),
      retryable = Retry.always)(f())
    assert(out == "ok" && f.calls == 3)
  }
}
