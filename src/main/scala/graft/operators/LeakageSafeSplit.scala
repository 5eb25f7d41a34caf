package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting (X66): the split unit is the
  * NEAR-DUP CLUSTER, not the document. Hashing doc_ids independently
  * lets a near-duplicate pair straddle train and test — the classic
  * evaluation-leakage bug (the reason decontamination pipelines split
  * by URL/domain/cluster); assigning every member of a connected
  * near-dup component the hash of its canonical id makes straddling
  * impossible BY CONSTRUCTION, not by post-hoc filtering.
  *
  * Scale shape: the pair list and closure move only (id, id) longs
  * ([[ConnectedComponents]] — the q68 machinery); the assignment is one
  * left join of the corpus against the clustered minority plus a
  * map-side LCG hash. Nothing new shuffles at 100 TB beyond what the
  * dedup pass already paid; the split fractions are exact 97ths so the
  * same arithmetic replays in any engine (q30's LCG recipe).
  */
object LeakageSafeSplit {

  /** (doc_id, group_key, split) with split ∈ train/val/test at
    * ~80/10/10 (78/10/9 in 97ths): group_key is the cluster canonical
    * (minimum) id for clustered docs, the doc's own id otherwise.
    * `pairs` is any symmetric near-dup pair frame (doc_a, doc_b).
    */
  def assign(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comp = ConnectedComponents.labels(pairs, "doc_a", "doc_b")
      .select(col("id").as("doc_id"), col("comp"))
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("comp"), col("doc_id")))
      .withColumn("__h",
        pmod(col("group_key") * 1103515245L + 12345L, lit(97L)))
      .withColumn("split",
        when(col("__h") < 78, "train")
          .when(col("__h") < 88, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("group_key"), col("split"))
  }
}
