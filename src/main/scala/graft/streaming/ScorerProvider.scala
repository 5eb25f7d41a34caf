package graft.streaming

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicReference

/** Model-artifact lifecycle (S24 + the retrain loop):
  *
  *   - [[ScorerProvider]] mirrors the reference's hot-reload operator
  *     (`spark_kafka_consumer_dag.py:111-124`): poll the artifact's mtime
  *     each micro-batch, atomically swap the active version, stamp
  *     `model_version` into every output row.
  *   - [[ModelRegistry]] mirrors the eval-gate promotion
  *     (`dags/absa_streaming_lifecycle_full.py:38-63`,
  *     `train_retrain.py:43-48`): a candidate is promoted iff its accuracy
  *     beats the incumbent's.
  *
  * The provider is deliberately driver-side state consulted inside
  * `foreachBatch` (once per micro-batch, never per row); the version
  * reaches executors as a plain literal column, so hot reload costs one
  * `stat` per batch regardless of data volume.
  */
final class ScorerProvider(artifactPath: Path) {

  private final case class Loaded(mtimeMillis: Long, version: String)

  private val current = new AtomicReference[Loaded](Loaded(-1L, "unloaded"))

  private def versionOf(mtimeMillis: Long): String = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd-HHmmss").withZone(java.time.ZoneOffset.UTC)
    fmt.format(java.time.Instant.ofEpochMilli(mtimeMillis))
  }

  /** Check mtime; swap if the artifact changed. Returns the active
    * version string (reference format `20251018-103512`, FIXTURES §3).
    */
  def reloadIfUpdated(): String = {
    val mtime =
      if (Files.exists(artifactPath))
        Files.getLastModifiedTime(artifactPath).toMillis
      else -1L
    val cur = current.get()
    if (mtime > cur.mtimeMillis) {
      val next = Loaded(mtime, versionOf(mtime))
      current.compareAndSet(cur, next)
    }
    current.get().version
  }

  def activeVersion: String = current.get().version
}

object ModelRegistry {

  /** Eval record (`train_retrain.py:43-48`). */
  final case class EvalResult(timestamp: String, newModelAcc: Double,
      newModelF1: Double, bestModelAcc: Double)

  /** Promote iff strictly better (`absa_streaming_lifecycle_full.py:56-63`).
    * Returns the new best accuracy.
    */
  def promote(eval: EvalResult): (Boolean, Double) =
    if (eval.newModelAcc > eval.bestModelAcc) (true, eval.newModelAcc)
    else (false, eval.bestModelAcc)

  /** Persist/read the eval gate state as the reference's JSON shape. */
  def write(path: Path, e: EvalResult): Unit = {
    val json =
      s"""{"timestamp": "${e.timestamp}", "new_model_acc": ${e.newModelAcc}, "new_model_f1": ${e.newModelF1}, "best_model_acc": ${e.bestModelAcc}}"""
    Files.createDirectories(path.getParent)
    Files.writeString(path, json)
  }

  private val numRe = """"(\w+)":\s*([0-9.]+)""".r
  private val tsRe = """"timestamp":\s*"([^"]*)"""".r

  def read(path: Path): EvalResult = {
    val s = Files.readString(path)
    val nums = numRe.findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap
    val ts = tsRe.findFirstMatchIn(s).map(_.group(1)).getOrElse("")
    EvalResult(ts, nums.getOrElse("new_model_acc", 0d),
      nums.getOrElse("new_model_f1", 0d), nums.getOrElse("best_model_acc", 0d))
  }
}
