package graft

import org.apache.spark.sql.DataFrame

/** Lineage-truncating eager materialization used by the iterative and
  * reused-frame operators (MinHash dedup, incremental index, CC
  * fixpoint).
  *
  * Default is `localCheckpoint`: blocks live on executors — fast (no
  * filesystem round-trip), but unrecoverable on executor loss and unsafe
  * under dynamic allocation. A long-lived cluster deployment opts into
  * reliable `checkpoint()` with pure configuration: set
  * [[ReliableKey]]=true and a `sparkContext.setCheckpointDir` — identical
  * lineage truncation, durable storage, no operator code changes
  * (CheckpointsSpec pins both paths).
  */
object Checkpoints {

  /** Session conf flag: when "true", eager materialization uses reliable
    * `checkpoint()` (requires a checkpoint dir) instead of
    * `localCheckpoint()`.
    */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  def eager(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true needs sparkContext.setCheckpointDir(...)")
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** Postfix form: `df.eagerCheckpoint()`. */
  implicit class EagerCheckpoint(private val df: DataFrame) extends AnyVal {
    def eagerCheckpoint(): DataFrame = Checkpoints.eager(df)
  }
}
