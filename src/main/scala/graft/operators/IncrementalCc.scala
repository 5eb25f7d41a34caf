package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X107 — incremental connected-components maintenance: dedup-cluster
  * state kept as a STAR-FOREST connectivity certificate on disk and
  * updated per pair batch — the transitive-closure side of the
  * incremental-dedup story (X46 maintains the candidate INDEX across
  * batches; this maintains the CLUSTERS, so "which canonical doc does
  * this near-dup collapse into" never requires re-closing the full
  * pair history).
  *
  * The state is the min-label star forest of everything absorbed:
  * one (root, member) edge per non-root member — ≤ |nodes|−1 rows, a
  * connectivity CERTIFICATE (same components, minimal edges). The
  * merge algebra is the classic mergeable-summaries one for
  * connectivity (spanning forests compose): combine = X24's
  * [[ConnectedComponents.labels]] over certificate ∪ certificate (or
  * ∪ delta pairs), re-starred. Associative and commutative, so it
  * rides X98's swap/marker/recovery via
  * [[MaterializedAgg.mergeOnceAs]].
  *
  * Scale shape: each merge closes |state stars| + |delta pairs| edges
  * — NEVER the accumulated pair history, which for near-dup mining is
  * quadratic in cluster size (a k-clique mines k(k−1)/2 pairs over
  * time; the certificate keeps k−1). Iteration count inside a merge is
  * the MERGED graph's diameter, and star forests have diameter 2, so
  * merges converge in 2-3 label rounds no matter how the batches
  * sliced the original graph.
  *
  * Deliberately NOT under [[GraphScale]] (r17, VERDICT r16 item 7):
  * no corpus-scale edge frame ever materializes in one shot — each
  * batch's pair mining is index-probed and the merge frame is
  * certificate-bounded (≤ batch pair count), so per-batch shuffle
  * volume is delta-sized by construction and the rule's full-edge-
  * frame premise does not apply.
  */
object IncrementalCc {

  /** Star-forest certificate of a labeled frame: (doc_a = root,
    * doc_b = member) for every non-root member.
    */
  private def stars(labels: DataFrame): DataFrame =
    labels.filter(col("id") =!= col("comp"))
      .select(col("comp").as("doc_a"), col("id").as("doc_b"))

  /** Per-batch partials: the delta pairs closed and starred. */
  def partials(delta: DataFrame): DataFrame =
    stars(ConnectedComponents.labels(delta))

  /** Combine two certificates (or a certificate and a delta): close
    * the union, re-star.
    */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    stars(ConnectedComponents.labels(a.unionByName(b)))

  /** Merge one pair batch into the cluster state — exactly-once by
    * batch id (the X98 contract).
    *
    * r19 optimization (guide §1.2): the previous form ran TWO closures
    * per merge — `partials(delta)` closed the delta alone, then
    * `combine` closed state ∪ starred-delta. One closure over
    * state ∪ raw delta reaches the same connectivity (closing, then
    * re-closing a union, is idempotent in the connectivity algebra),
    * and `labels` is min-label over components, so the committed
    * certificate is BIT-IDENTICAL at every batch boundary — only the
    * work halves. The per-merge edge bound is unchanged:
    * |state stars| + |delta pairs|, never the accumulated pair
    * history. `partials`/`combine` remain the mergeable-summaries
    * algebra for callers that combine two certificates directly.
    */
  def mergeOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.foldOnceAs(delta, path, batchId, {
      case (None, d) => partials(d)
      case (Some(state), d) =>
        stars(ConnectedComponents.labels(
          state.unionByName(d.select(col("doc_a"), col("doc_b")))))
    })

  /** Wire a pair stream (doc_a, doc_b columns) into the cluster-state
    * maintenance loop — the deployment shape: the same foreachBatch +
    * mergeOnce discipline as [[MaterializedAgg.stream]], so a kill
    * between the state swap and the checkpoint commit replays the
    * batch id on restart and the merge is a no-op (proven with a REAL
    * kill over the X71 source in IncrementalCcSpec).
    */
  def stream(input: DataFrame, path: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeOnce(batch.select(col("doc_a"), col("doc_b")), path, batchId)
      }
      .start()

  /** Read the state back to (id, comp) labels — root rows included. */
  def readLabels(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    val st = spark.read.parquet(path)
    st.select(col("doc_b").as("id"), col("doc_a").as("comp"))
      .unionByName(st.select(col("doc_a").as("id"),
        col("doc_a").as("comp")))
      .distinct()
  }

  /** q154 — the maintenance loop END TO END: q68's exact pair set
    * sliced into 4 arrival batches (doc_a % 4), merged incrementally,
    * and the read-back clusters must reproduce q68's one-shot
    * transitive closure exactly (same recursive-CTE oracle).
    */
  val q154 = GraftQuery(
    "q154_incremental_components", {
      (s, d) => {
        import graft.Checkpoints.EagerCheckpoint
        // materialize the mined pairs ONCE: each of the four merges
        // reads its slice from the checkpoint instead of re-running
        // the Σdf² pair join per batch (in production the batches
        // arrive as data; re-mining per merge is a harness artifact)
        val pairs = DedupQueries.jaccardPairs(s, d)
          .select(col("doc_a"), col("doc_b"))
          .eagerCheckpoint()
        val path = Scratch.fresh("q154-state") + "/state"
        (0 to 3).foreach(b =>
          mergeOnce(pairs.filter(pmod(col("doc_a"), lit(4)) === b),
            path, b.toLong))
        val comp = readLabels(s, path)
        val sizes = comp.groupBy(col("comp"))
          .agg(count(lit(1)).as("cluster_size"))
        comp.join(sizes, "comp")
          .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
            col("cluster_size"),
            (col("id") === col("comp")).as("is_canonical"))
          .orderBy(col("doc_id"))
      }
    },
    Some(s"""
      WITH RECURSIVE ${DedupQueries.jaccardPairsSql},
      nodes AS (
        SELECT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs),
      reach(id, r) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, reach.r FROM edges e JOIN reach ON reach.id = e.src),
      comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY 1),
      sized AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
      SELECT c.id AS doc_id, c.cluster_id, s.cluster_size,
             c.id = c.cluster_id AS is_canonical
      FROM comp c JOIN sized s USING (cluster_id)
      ORDER BY doc_id
    """))

  val all: Seq[GraftQuery] = Seq(q154)
}
