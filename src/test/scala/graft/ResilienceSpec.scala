package graft

import graft.sources.Resilience._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-clock coverage of the serving-tier guards: the
  * breaker's full state machine, token-bucket refill arithmetic,
  * retry budgets, and the assembled Guarded path.
  */
class ResilienceSpec extends AnyFunSuite {

  private class FakeClock(var nowNs: Long = 0L) {
    def advanceMs(ms: Long): Unit = nowNs += ms * 1000000L
    val read: () => Long = () => nowNs
  }

  test("breaker trips at the failure-rate threshold only past minimum volume") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("svc",
      CircuitBreakerConfig(minimumRequests = 10, sleepWindowMs = 1000), clock.read)
    // 9 failures: under minimum volume, still closed
    (1 to 9).foreach { _ => assert(cb.allowRequest()); cb.recordFailure() }
    assert(cb.getState == Closed)
    // 10th failure reaches volume at 100% failure rate -> open
    assert(cb.allowRequest()); cb.recordFailure()
    assert(cb.getState == Open)
    assert(!cb.allowRequest())
    assert(cb.getStats.rejected == 1)
  }

  test("breaker below the failure-rate threshold stays closed") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("svc",
      CircuitBreakerConfig(minimumRequests = 10), clock.read)
    (1 to 6).foreach { _ => cb.allowRequest(); cb.recordSuccess() }
    (1 to 5).foreach { _ => cb.allowRequest(); cb.recordFailure() }
    assert(cb.getState == Closed, "45% failures < 50% threshold")
  }

  test("stale failures expire with the request-volume window") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("svc", CircuitBreakerConfig(
      minimumRequests = 20, requestVolumePeriodMs = 60000), clock.read)
    // a blip: 10 failures, under minimum volume
    (1 to 10).foreach { _ => cb.allowRequest(); cb.recordFailure() }
    assert(cb.getState == Closed)
    // hours later, mostly-healthy traffic: the stale blip must NOT
    // combine with it to reach 20 requests at >=50% failures
    clock.advanceMs(3600000)
    (1 to 18).foreach { _ => cb.allowRequest(); cb.recordSuccess() }
    cb.allowRequest(); cb.recordFailure()
    cb.allowRequest(); cb.recordFailure()
    assert(cb.getState == Closed,
      "2/20 failures in the current window is far under the 50% threshold")
  }

  test("open breaker half-opens after the sleep window and closes on probe successes") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("svc", CircuitBreakerConfig(
      minimumRequests = 2, sleepWindowMs = 1000, halfOpenMaxRequests = 3), clock.read)
    cb.allowRequest(); cb.recordFailure()
    cb.allowRequest(); cb.recordFailure()
    assert(cb.getState == Open)
    clock.advanceMs(999)
    assert(!cb.allowRequest(), "sleep window not elapsed")
    clock.advanceMs(1)
    assert(cb.allowRequest(), "first half-open probe admitted")
    assert(cb.getState == HalfOpen)
    assert(cb.allowRequest() && cb.allowRequest(), "probe budget is 3")
    assert(!cb.allowRequest(), "4th probe exceeds the half-open budget")
    cb.recordSuccess(); cb.recordSuccess()
    assert(cb.getState == HalfOpen, "needs halfOpenMaxRequests successes")
    cb.recordSuccess()
    assert(cb.getState == Closed)
  }

  test("a failed half-open probe reopens immediately") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("svc", CircuitBreakerConfig(
      minimumRequests = 2, sleepWindowMs = 1000), clock.read)
    cb.allowRequest(); cb.recordFailure()
    cb.allowRequest(); cb.recordFailure()
    clock.advanceMs(1000)
    assert(cb.allowRequest())
    cb.recordFailure()
    assert(cb.getState == Open)
    assert(!cb.allowRequest(), "back to rejecting without a fresh sleep window")
  }

  test("token bucket spends capacity and refills with time") {
    val clock = new FakeClock
    val rl = new TokenBucketRateLimiter(
      RateLimiterConfig(requestsPerSecond = 10.0, bucketCapacity = 5), clock.read)
    assert((1 to 5).forall(_ => rl.tryAcquire()))
    assert(!rl.tryAcquire(), "bucket empty")
    clock.advanceMs(100) // 10 req/s * 0.1 s = 1 token
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire())
    clock.advanceMs(10000)
    assert(rl.availableTokens == 5.0, "refill caps at bucket capacity")
  }

  test("retry executor honors budget, backoff schedule and retryability") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val ex = new RetryExecutor(maxAttempts = 3,
      strategy = ExponentialBackoff(initialMs = 100, maxMs = 30000, multiplier = 2.0),
      sleep = delays.append(_))
    val out = ex.execute {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient") else 42
    }
    assert(out == 42 && calls == 3)
    assert(delays.toSeq == Seq(100L, 200L), "exponential schedule")

    // budget exhausted -> final error propagates
    var calls2 = 0
    val boom = intercept[RuntimeException] {
      ex.execute { calls2 += 1; throw new RuntimeException("always") }
    }
    assert(boom.getMessage == "always" && calls2 == 3)

    // non-retryable -> immediate propagation, no sleep
    val delays3 = scala.collection.mutable.ArrayBuffer[Long]()
    var calls3 = 0
    val picky = new RetryExecutor(maxAttempts = 3, strategy = FixedDelay(50),
      retryable = _.getMessage == "transient", sleep = delays3.append(_))
    intercept[RuntimeException] {
      picky.execute { calls3 += 1; throw new RuntimeException("fatal") }
    }
    assert(calls3 == 1 && delays3.isEmpty)

    assert(LinearBackoff(100, 50).delayMs(2) == 200L)
    assert(ExponentialBackoff(100, 300, 2.0).delayMs(5) == 300L, "capped at maxMs")

    // an interrupt (e.g. a TimeoutWrapper cancellation) is never
    // retried even under the retry-everything default
    var calls4 = 0
    intercept[InterruptedException] {
      ex.execute { calls4 += 1; throw new InterruptedException("cancelled") }
    }
    assert(calls4 == 1)
  }

  test("timeout wrapper returns control past the deadline; results and errors pass through") {
    val tw = new TimeoutWrapper(defaultTimeoutMs = 10000)
    assert(tw.execute(21 * 2) == 42)
    val boom = intercept[IllegalStateException](tw.execute(throw new IllegalStateException("inner")))
    assert(boom.getMessage == "inner", "original exception type/message, not ExecutionException")
    val t0 = System.nanoTime()
    intercept[OperationTimeoutException] {
      tw.executeWithTimeout(100)(Thread.sleep(60000))
    }
    assert((System.nanoTime() - t0) / 1e6 < 30000, "gave up well before the sleep finished")
  }

  test("resource pool leases block-free capacity and never leaks on caller failure") {
    val pool = new ResourcePool[String]("servers", maxSize = 2)
    assert(pool.add("a") && pool.add("b"))
    assert(!pool.add("c"), "capacity bound enforced")
    assert(pool.stats == PoolStats(2, 2))
    val seen = pool.lease()(identity)
    assert(Seq("a", "b").contains(seen))
    // a throwing caller returns its handle
    intercept[RuntimeException](pool.lease()(_ => throw new RuntimeException("use failed")))
    assert(pool.stats.available == 2)
    // the bound covers leased handles too: add() during a lease must
    // not over-fill the queue (a later return put() would block forever)
    pool.lease(100) { _ =>
      assert(!pool.add("d"), "total handles, not idle slots, are bounded")
    }
    assert(pool.stats.available == 2)
    // both handles leased concurrently -> third lease times out
    val l1 = pool.lease(100) { _ =>
      pool.lease(100) { _ =>
        intercept[PoolExhaustedException](pool.lease(50)(identity))
        "nested"
      }
    }
    assert(l1 == "nested")
    assert(pool.stats.available == 2)
  }

  test("guarded call: retries transients, records into the breaker, short-circuits when open") {
    val clock = new FakeClock
    val cb = new CircuitBreaker("serve", CircuitBreakerConfig(
      minimumRequests = 4, sleepWindowMs = 1000), clock.read)
    val rl = new TokenBucketRateLimiter(
      RateLimiterConfig(requestsPerSecond = 1000.0, bucketCapacity = 100), clock.read)
    val g = new Guarded(cb, rl, new RetryExecutor(maxAttempts = 2,
      strategy = FixedDelay(1), sleep = _ => ()))
    // transient failure then success: result returned, both attempts recorded
    var n = 0
    assert(g.call { n += 1; if (n == 1) throw new RuntimeException("t"); "ok" } == "ok")
    assert(cb.getStats.failures == 1 && cb.getStats.successes == 1)
    // two fully-failing calls push the rate to 5/6 >= 50% past volume 4 -> open
    (1 to 2).foreach { _ =>
      intercept[RuntimeException](g.call(throw new RuntimeException("down")))
    }
    assert(cb.getState == Open)
    // open circuit: op NOT invoked, CircuitOpenException not retried
    var invoked = 0
    intercept[CircuitOpenException](g.call { invoked += 1; "x" })
    assert(invoked == 0)
    // a drained bucket rejects before the breaker is even consulted
    val tiny = new TokenBucketRateLimiter(
      RateLimiterConfig(requestsPerSecond = 0.0001, bucketCapacity = 1), clock.read)
    val g2 = new Guarded(cb, tiny)
    assert(tiny.tryAcquire())
    intercept[RateLimitedException](g2.call("y"))
  }
}
