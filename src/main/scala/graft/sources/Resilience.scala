package graft.sources

/** Resilience guards for the in-JVM serving tier (reference
  * src/resilience.rs). The batch tier needs none of this — Spark task
  * retry, stage re-attempts and speculative execution are the
  * cluster-native forms — but [[PointServe]] answers point queries
  * WITHOUT a Spark job, so it re-acquires the reference's single-node
  * failure modes and takes the same three guards:
  *
  *  - [[CircuitBreaker]] (resilience.rs:81): failure-rate trip over a
  *    request-volume window, Open → sleep window → HalfOpen probe
  *    budget → Closed on enough successes, straight back to Open on a
  *    probe failure.
  *  - [[TokenBucketRateLimiter]] (resilience.rs:276): continuous
  *    refill at `requestsPerSecond` up to `bucketCapacity`.
  *  - [[RetryExecutor]] (resilience.rs:403): bounded attempts with
  *    fixed / linear / exponential backoff and a retryability
  *    predicate standing in for the reference's retryable-error list.
  *
  * Every component takes an injectable nano clock (and the executor an
  * injectable sleeper) so specs drive the time arithmetic
  * deterministically; production uses the defaults. State is
  * coarse-grained `synchronized` — point-serve QPS is bounded by the
  * rate limiter itself, so lock contention is not a concern.
  */
object Resilience {

  sealed trait CircuitState
  case object Closed extends CircuitState
  case object Open extends CircuitState
  case object HalfOpen extends CircuitState

  /** resilience.rs:55 CircuitBreakerConfig (same defaults). */
  final case class CircuitBreakerConfig(
      failureThresholdPct: Double = 50.0,
      minimumRequests: Int = 20,
      requestVolumePeriodMs: Long = 60000L,
      sleepWindowMs: Long = 30000L,
      halfOpenMaxRequests: Int = 5)

  final case class CircuitBreakerStats(
      state: CircuitState, failures: Long, successes: Long, rejected: Long)

  final class CircuitOpenException(name: String)
    extends RuntimeException(s"circuit breaker '$name' is open")

  final class CircuitBreaker(val name: String,
                             config: CircuitBreakerConfig = CircuitBreakerConfig(),
                             clock: () => Long = () => System.nanoTime()) {
    private var state: CircuitState = Closed
    private var failures = 0L
    private var successes = 0L
    private var rejected = 0L
    private var halfOpenProbes = 0
    private var lastFailureAtNs = Long.MinValue
    private var windowStartNs = Long.MinValue

    private def ms(n: Long): Long = n * 1000000L

    // The failure-rate sample covers one request-volume window: when a
    // request arrives past the window's end, the stale counters are
    // dropped BEFORE it is recorded, so a blip from hours ago can
    // never combine with fresh traffic to trip the breaker. (Keyed to
    // the window START — the reference keys expiry to the LAST request
    // time, which a steady request stream keeps perpetually fresh, so
    // its sample never actually expires under load.)
    private def rollWindowIfExpired(now: Long): Unit =
      if (state == Closed) {
        if (windowStartNs == Long.MinValue) windowStartNs = now
        else if (now - windowStartNs >= ms(config.requestVolumePeriodMs)) {
          failures = 0; successes = 0; windowStartNs = now
        }
      }

    /** resilience.rs:108 allow_request. */
    def allowRequest(): Boolean = synchronized {
      val now = clock()
      rollWindowIfExpired(now)
      val allowed = state match {
        case Closed => true
        case Open =>
          if (now - lastFailureAtNs >= ms(config.sleepWindowMs)) {
            state = HalfOpen; halfOpenProbes = 0; successes = 0; failures = 0
            true
          } else false
        case HalfOpen => halfOpenProbes < config.halfOpenMaxRequests
      }
      if (allowed) {
        if (state == HalfOpen) halfOpenProbes += 1
      } else rejected += 1
      allowed
    }

    /** resilience.rs:135 record_success. */
    def recordSuccess(): Unit = synchronized {
      rollWindowIfExpired(clock())
      successes += 1
      state match {
        case HalfOpen =>
          if (successes >= config.halfOpenMaxRequests) {
            state = Closed; failures = 0; successes = 0; halfOpenProbes = 0
            windowStartNs = Long.MinValue
          }
        case _ => ()
      }
    }

    /** resilience.rs:155 record_failure. */
    def recordFailure(): Unit = synchronized {
      val now = clock()
      rollWindowIfExpired(now)
      failures += 1
      lastFailureAtNs = now
      state match {
        case HalfOpen => state = Open
        case Closed =>
          val total = failures + successes
          if (total >= config.minimumRequests &&
              failures * 100.0 / total >= config.failureThresholdPct)
            state = Open
        case Open => ()
      }
    }

    def getState: CircuitState = synchronized(state)
    def getStats: CircuitBreakerStats =
      synchronized(CircuitBreakerStats(state, failures, successes, rejected))
  }

  /** resilience.rs:256 RateLimiterConfig (same defaults). */
  final case class RateLimiterConfig(
      requestsPerSecond: Double = 1000.0,
      bucketCapacity: Int = 1000)

  final class RateLimitedException(limit: Double)
    extends RuntimeException(s"rate limit exceeded ($limit req/s)")

  /** resilience.rs:276 TokenBucketRateLimiter with continuous refill
    * (the reference batches refills per 100 ms as a lock optimization;
    * arithmetic is identical).
    */
  final class TokenBucketRateLimiter(val config: RateLimiterConfig = RateLimiterConfig(),
                                     clock: () => Long = () => System.nanoTime()) {
    private var tokens: Double = config.bucketCapacity.toDouble
    private var lastRefillNs: Long = clock()

    private def refill(): Unit = {
      val now = clock()
      val elapsedS = (now - lastRefillNs) / 1e9
      if (elapsedS > 0) {
        tokens = math.min(config.bucketCapacity.toDouble,
          tokens + elapsedS * config.requestsPerSecond)
        lastRefillNs = now
      }
    }

    /** resilience.rs:293 try_acquire. */
    def tryAcquire(n: Int = 1): Boolean = synchronized {
      refill()
      if (tokens >= n) { tokens -= n; true } else false
    }

    /** resilience.rs:343 get_available_tokens. */
    def availableTokens: Double = synchronized { refill(); tokens }
  }

  /** resilience.rs:351 RetryStrategy. */
  sealed trait RetryStrategy { def delayMs(attempt: Int): Long }
  final case class FixedDelay(delayMsValue: Long) extends RetryStrategy {
    def delayMs(attempt: Int): Long = delayMsValue
  }
  final case class LinearBackoff(initialMs: Long, incrementMs: Long) extends RetryStrategy {
    def delayMs(attempt: Int): Long = initialMs + incrementMs * attempt
  }
  final case class ExponentialBackoff(initialMs: Long = 100L, maxMs: Long = 30000L,
                                      multiplier: Double = 2.0) extends RetryStrategy {
    def delayMs(attempt: Int): Long =
      math.min(maxMs.toDouble, initialMs * math.pow(multiplier, attempt.toDouble)).toLong
  }

  /** resilience.rs:403 RetryExecutor: `attempt` runs up to
    * `maxAttempts` times; only throwables passing `retryable` are
    * retried (the reference matches error strings against a
    * retryable-error list — a predicate is the typed form), the rest
    * propagate immediately; the final failure propagates after the
    * budget is spent.
    */
  final class RetryExecutor(maxAttempts: Int = 3,
                            strategy: RetryStrategy = ExponentialBackoff(),
                            retryable: Throwable => Boolean = _ => true,
                            sleep: Long => Unit = Thread.sleep) {
    def execute[T](op: => T): T = {
      var attempt = 0
      while (true) {
        // NonFatal only: OOM/StackOverflow/InterruptedException must
        // propagate immediately — retrying an interrupted call would
        // swallow a TimeoutWrapper cancellation and re-run work whose
        // caller already gave up.
        try return op
        catch {
          case scala.util.control.NonFatal(e) =>
            if (!retryable(e) || attempt >= maxAttempts - 1) throw e
            sleep(strategy.delayMs(attempt))
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** The assembled guard for a serving call (resilience.rs:619
    * ResilienceManager.execute_with_resilience): rate-limit gate →
    * circuit gate → retried invocation, success/failure recorded into
    * the breaker per attempt so a flapping backend trips it even when
    * retries eventually succeed.
    */
  final class OperationTimeoutException(ms: Long)
    extends RuntimeException(s"operation timed out after $ms ms")

  /** resilience.rs:476 TimeoutWrapper: run a serving call on a daemon
    * pool thread and give up (cancelling with interrupt) past the
    * deadline — a stuck rescore or a bad shard read must return
    * control to the caller, not hang the serving thread. One shared
    * cached pool; threads die idle, so an unused wrapper costs
    * nothing.
    */
  final class TimeoutWrapper(defaultTimeoutMs: Long = 5000L) {
    import java.util.concurrent._
    private val pool = Executors.newCachedThreadPool(new ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-timeout-wrapper"); t.setDaemon(true); t
      }
    })
    def execute[T](op: => T): T = executeWithTimeout(defaultTimeoutMs)(op)
    def executeWithTimeout[T](timeoutMs: Long)(op: => T): T = {
      val fut = pool.submit(new Callable[T] { def call(): T = op })
      try fut.get(timeoutMs, TimeUnit.MILLISECONDS)
      catch {
        case _: TimeoutException =>
          fut.cancel(true)
          throw new OperationTimeoutException(timeoutMs)
        case e: ExecutionException => throw e.getCause
      }
    }
  }

  final case class PoolStats(available: Int, maxSize: Int)

  final class PoolExhaustedException(name: String)
    extends RuntimeException(s"resource pool '$name' exhausted")

  /** resilience.rs:514 ResourcePool as a loan pattern: a bounded set
    * of serving handles (point servers hold vectors/codes in RAM — an
    * unbounded handle count is an OOM); `lease` blocks up to
    * `timeoutMs` for a free handle, runs `f`, and ALWAYS returns the
    * handle, so a throwing caller cannot leak capacity.
    */
  final class ResourcePool[T](val name: String, val maxSize: Int) {
    private val q = new java.util.concurrent.LinkedBlockingQueue[T](maxSize)
    // bounds TOTAL handles (idle + leased), not idle slots: otherwise
    // add() during a lease over-fills the queue and the lease's
    // return put() blocks forever on a full queue
    private val registered = new java.util.concurrent.atomic.AtomicInteger(0)
    def add(resource: T): Boolean = {
      if (registered.incrementAndGet() > maxSize) {
        registered.decrementAndGet(); false
      } else { q.put(resource); true }
    }
    def lease[R](timeoutMs: Long = 5000L)(f: T => R): R = {
      val r = q.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (r == null) throw new PoolExhaustedException(name)
      try f(r) finally q.put(r)
    }
    def stats: PoolStats = PoolStats(q.size, maxSize)
  }

  /** Default-config guard bundle for a named serving endpoint:
    * `val g = Resilience.default("lsh"); g.call(server.query(qv, k))`.
    */
  def default(name: String): Guarded =
    new Guarded(new CircuitBreaker(name), new TokenBucketRateLimiter())

  final class Guarded(val breaker: CircuitBreaker,
                      val limiter: TokenBucketRateLimiter,
                      // an open circuit is not a transient fault: spinning
                      // retries against it would defeat the sleep window
                      retry: RetryExecutor = new RetryExecutor(
                        retryable = !_.isInstanceOf[CircuitOpenException])) {
    def call[T](op: => T): T = {
      if (!limiter.tryAcquire())
        throw new RateLimitedException(limiter.config.requestsPerSecond)
      retry.execute {
        if (!breaker.allowRequest()) throw new CircuitOpenException(breaker.name)
        try { val r = op; breaker.recordSuccess(); r }
        catch { case e: Throwable => breaker.recordFailure(); throw e }
      }
    }
  }
}
