package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 kernel units: the read-side paced-retry helper that honors
  * server-directed throttle pacing around list/get wire calls. */
class Round12KernelSpec extends AnyFunSuite {

  test("pacedRetry: sleeps the pace and returns the value when the window ends") {
    var calls = 0
    val t0 = System.nanoTime()
    val v = HttpWire.pacedRetry("probe") {
      calls += 1
      if (calls <= 2) throw new RetryPacedException("throttled", 150L)
      42
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(v == 42 && calls == 3)
    assert(ms >= 280, s"must sleep ~2x150ms, took ${ms}ms")
  }

  test("pacedRetry: Retry-After 0 floors at 100ms accounting and sleep") {
    var calls = 0
    val t0 = System.nanoTime()
    HttpWire.pacedRetry("probe") {
      calls += 1
      if (calls == 1) throw new RetryPacedException("throttled", 0L)
      ()
    }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms >= 90, s"zero pace must still floor the sleep, took ${ms}ms")
  }

  test("pacedRetry: a permanently throttling store fails loudly at the budget") {
    var calls = 0
    val e = intercept[java.io.IOException] {
      HttpWire.pacedRetry("probe", maxPacedWaitMs = 250L) {
        calls += 1
        throw new RetryPacedException("still throttled", 100L)
      }
    }
    assert(e.getMessage.contains("gave up"))
    assert(calls == 3, s"100+100 within budget, 3rd exceeds: got $calls calls")
    // the non-paced transient contract is untouched: a plain IOException
    // from the op propagates immediately, no pacing loop
    var once = 0
    intercept[java.io.IOException] {
      HttpWire.pacedRetry("probe") { once += 1; throw new java.io.IOException("boom") }
    }
    assert(once == 1)
  }
}
