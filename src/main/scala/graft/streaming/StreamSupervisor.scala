package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Crash/staleness supervisor for a streaming query — the engine-native
  * form of the reference's Airflow restart loop
  * (`dags/absa_streaming_lifecycle_dag.py:37-50`: retries with a fixed
  * delay; observed attempt={1..9} logs), driven by the same liveness
  * signal [[QueryMonitor]] exposes (the reference polls checkpoint
  * mtimes, `absa_streaming_lifecycle_full.py:28-35`).
  *
  * `startQuery` must build the query on the SAME checkpoint location each
  * time so a restart resumes from committed offsets (S9/S30 semantics:
  * at-least-once across crashes).
  *
  * Restart policy: every abnormal end (query exception, a failure to
  * start/stop, or no progress event for `stalenessLimitMs`) consumes
  * one attempt; after `maxRestarts` restarts the supervisor gives up
  * and surfaces the last failure instead of crash-looping forever.
  * Backoff between restarts is `backoffMs · multiplier^attempt`.
  *
  * Monitor scoping: the [[QueryMonitor]] listener is session-global —
  * progress from ANY query on the session refreshes it. Supervise ONE
  * query per monitor (attach a dedicated monitor for this query's
  * session, or rely on query exceptions alone by leaving
  * `stalenessLimitMs` at its no-op default). The supervisor touches the
  * monitor at each (re)start so every attempt gets a full staleness
  * grace period. Note also that stopping a genuinely wedged batch
  * thread honors `spark.sql.streaming.stopTimeout` — configure it
  * non-zero so `stop()` raises (and consumes an attempt) instead of
  * joining forever.
  */
final class StreamSupervisor(
    startQuery: () => StreamingQuery,
    maxRestarts: Int = 9,
    backoffMs: Long = 1000L,
    backoffMultiplier: Double = 1.0,
    stalenessLimitMs: Long = Long.MaxValue,
    monitor: Option[QueryMonitor] = None,
    pollMs: Long = 100L) {

  final class StalenessException(ms: Long)
      extends RuntimeException(
        s"no streaming progress for ${ms}ms (limit $stalenessLimitMs)")

  @volatile private var restartCount = 0

  /** Restarts performed so far (= attempts beyond the first start). */
  def restarts: Int = restartCount

  /** Drive the query until it stops cleanly (Right(restarts)) or
    * exhausts the restart budget (Left(lastFailure)). Blocking.
    */
  def run(): Either[Throwable, Int] = {
    var attempt = 0
    var delay = backoffMs
    var result: Either[Throwable, Int] = null
    while (result == null) {
      var failure: Throwable = null
      // every failure mode must consume an attempt, not escape run():
      // startQuery() itself (checkpoint FS hiccup), awaitTermination
      // (StreamingQueryException), and stop() (TimeoutException under a
      // configured stopTimeout) are all part of the supervised attempt
      try {
        val q = startQuery()
        monitor.foreach(_.touch()) // fresh staleness grace per attempt
        var done = false
        while (!done && failure == null) {
          done = q.awaitTermination(pollMs)
          if (!done) monitor.foreach { m =>
            val stale = m.stalenessMs
            if (stale > stalenessLimitMs) {
              failure = new StalenessException(stale)
              q.stop()
            }
          }
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (failure == null) failure = e
      }
      if (failure == null) result = Right(attempt)
      else if (attempt >= maxRestarts) result = Left(failure)
      else {
        attempt += 1
        restartCount = attempt
        Thread.sleep(delay)
        delay = math.max(1L, (delay * backoffMultiplier).toLong)
      }
    }
    result
  }
}

/** The retrain → eval-gate → promote → hot-reload loop, collapsed from
  * the reference's hourly DAG (`absa_streaming_lifecycle_full.py:38-73`
  * calls `train_retrain.py:26-54` then promotes iff the candidate beats
  * the incumbent). `trainer` is injected (the reference's own trainer is
  * a mock producing (acc, f1) — `train_retrain.py:34-36`); promotion
  * writes the eval artifact via [[ModelRegistry]] and touches the model
  * artifact so every [[ScorerProvider]] hot-swaps on its next batch.
  */
object RetrainLoop {

  final case class Outcome(promoted: Boolean, bestAcc: Double,
      newModelAcc: Double)

  /** One cycle. The artifact mtime is stamped strictly later than the
    * previous artifact's (≥ +1 s) on promotion, so the provider's
    * second-granularity version string is guaranteed to change — without
    * this, a sub-second train→promote turnaround would produce an
    * identical version and the hot reload would be invisible.
    */
  def cycle(trainer: () => (Double, Double),
      evalPath: java.nio.file.Path,
      artifactPath: java.nio.file.Path,
      now: () => Long = () => System.currentTimeMillis()): Outcome = {
    import java.nio.file.Files
    val incumbent =
      if (Files.exists(evalPath)) ModelRegistry.read(evalPath).bestModelAcc
      else 0.0
    val (acc, f1) = trainer()
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(now()))
    val eval = ModelRegistry.EvalResult(ts, acc, f1, incumbent)
    val (promoted, best) = ModelRegistry.promote(eval)
    ModelRegistry.write(evalPath, eval.copy(bestModelAcc = best))
    if (promoted) {
      val prevMtime =
        if (Files.exists(artifactPath))
          Files.getLastModifiedTime(artifactPath).toMillis
        else -1L
      Files.createDirectories(artifactPath.getParent)
      Files.writeString(artifactPath, s"promoted acc=$acc f1=$f1")
      Files.setLastModifiedTime(artifactPath,
        java.nio.file.attribute.FileTime
          .fromMillis(math.max(now(), prevMtime + 1000L)))
    }
    Outcome(promoted, best, acc)
  }
}
