package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-stratum DETERMINISTIC reservoir sampling (X69): keep a
  * bounded k-sample per stratum (domain/source/language) over an
  * unbounded stream — the op a crawl pipeline needs to hold a fixed
  * per-domain audit sample without unbounded state.
  *
  * A classic reservoir is RNG- and arrival-order-dependent, which is
  * unverifiable and non-replayable. This is the BOTTOM-K-BY-HASH
  * reservoir instead: keep the k docs with the smallest LCG hash of
  * their id (q30's recipe). Bottom-k is a mergeable sketch — the union
  * of two bottom-k sets bottom-k's to the same result — so the sample
  * is independent of batch boundaries, arrival order, AND of whether
  * it was computed streaming or batch: the batch mirror is a plain
  * `row_number() OVER (PARTITION BY stratum ORDER BY hash, id) ≤ k`,
  * which is exactly what StreamingSampleSpec replays against.
  *
  * Scale shape: state per stratum is k (id, hash) pairs — bounded and
  * tiny; each micro-batch shuffles only its own rows by stratum. At
  * 100 TB the sample state for a million strata × k=64 is a few GB
  * across the cluster, and a restart rebuilds nothing (checkpointed
  * state IS the sample).
  */
object StreamingSample {

  final case class DocArrival(stratum: String, doc_id: Long)
  final case class Reservoir(stratum: String, ids: Seq[Long])

  /** The shared hash: q30's LCG, over the 61-bit-safe id range. */
  def sampleHash(id: Long): Long = (id * 1103515245L + 12345L) % 2147483647L

  def sampleHashCol(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(id * 1103515245L + 12345L, lit(2147483647L))

  /** Streaming form: per-stratum bottom-k state, emitted on update. */
  def bottomKStream(arrivals: Dataset[DocArrival], k: Int)
      : Dataset[Reservoir] = {
    import arrivals.sparkSession.implicits._
    arrivals
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (stratum: String, rows: Iterator[DocArrival],
            state: GroupState[Reservoir]) => {
          val prev = state.getOption.map(_.ids).getOrElse(Seq.empty)
          // merge = union then re-bottom-k: the mergeability that makes
          // the result batch-boundary-independent
          val next = (prev ++ rows.map(_.doc_id).toSeq).distinct
            .sortBy(id => (sampleHash(id), id)).take(k)
          val out = Reservoir(stratum, next)
          state.update(out)
          Iterator.single(out)
        })
  }

  /** Batch mirror (the oracle the stream must agree with): bottom-k by
    * (hash, id) per stratum via one window — also the form a backfill
    * job would run over historical parquet.
    */
  def bottomKBatch(docs: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    // window over the ALIASED frame — the caller's column names are
    // gone after the normalizing select
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"))
      .orderBy(sampleHashCol(col("doc_id")), col("doc_id"))
    docs.select(col(stratumCol).as("stratum"), col(idCol).as("doc_id"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("stratum"), col("doc_id"), col("rk"))
      .orderBy(col("stratum"), col("rk"))
  }
}
