package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Chao1Richness, MaterializedAgg}

/** X224 — streaming maintenance of the X220 vocabulary-richness
  * audit: Chao1 + Good–Turing coverage kept current per ingest batch,
  * so the "is more crawling of this source worth it" dashboard never
  * re-scans the corpus. The state is the (source, token, count) frame
  * — the SAME frame q253's first groupBy produces, and the minimal
  * sufficient statistic for a singleton/doubleton census (f₁/f₂ need
  * per-type counts; no fixed-size sketch can answer "how many types
  * were seen exactly once" exactly). Counts COMMUTE AND ASSOCIATE, so
  * the merge rides [[MaterializedAgg.mergeOnceAs]] with the STRONG
  * contract: ARBITRARY document slicing — any order, any split —
  * reproduces batch q253 bit-for-bit (a document is atomic within a
  * batch by construction; no cross-batch constraint at all).
  *
  * State size is vocabulary-bounded — sub-linear in the corpus (the
  * q157 postings-state economics, stated): at 100 TB the state is the
  * per-source vocabulary, not the token stream, and the read
  * recomputes the census on the |sources × vocab| frame only.
  */
object RichnessStream {

  /** Delta batch of (source, text) documents → mergeable counts. */
  def toPartials(delta: DataFrame): DataFrame =
    Chao1Richness.tokenCounts(delta)

  /** Commutative, associative merge of two count frames. */
  def combine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("source"), col("w"))
      .agg(sum(col("c")).as("c"))

  /** One exactly-once maintained apply of a delta batch. */
  def applyOnce(delta: DataFrame, path: String, batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(delta, path, batchId, toPartials,
      combine)

  /** q253 from the maintained counts — the same census tree. */
  def read(spark: SparkSession, path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    Chao1Richness.census(spark.read.parquet(path))
  }
}
