package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X142 — schema evolution across parquet batches (mergeSchema): a
  * long-lived ingest directory accumulates batches written under
  * DIFFERENT schema versions (v1 lacks a column v2 added — the normal
  * life of any landed feed), and the reader must union them with the
  * missing column as NULL, not crash or silently drop it. Spark's
  * `mergeSchema` read is that contract; this operator proves it
  * end-to-end: two batch directories written with different column
  * sets, one merged read, and an aggregate whose null-accounting the
  * oracle reproduces from the ORIGINAL table — wrong merge semantics
  * (dropped column, misaligned nulls, type drift) break the hash.
  *
  * Shape: the merged read is still one parquet scan (footer merge is
  * planning-time); downstream is a map-side-combined groupBy. At
  * 100 TB schema evolution is table-format metadata (the X110
  * versioned table carries the same idea with explicit versions);
  * the per-batch directory layout here is the raw-parquet form.
  */
object SchemaEvolution {

  /** q182 — v1/v2 batch write → mergeSchema read → null-aware rollup. */
  val q182 = GraftQuery(
    "q182_schema_evolution", {
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = Scratch.fresh("q182-evo") + "/docs_feed"
        // v1 batch (even ids): no `source` column yet
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$dir/batch=1")
        // v2 batch (odd ids): schema grew the `source` column
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            col("source"))
          .write.mode("overwrite").parquet(s"$dir/batch=2")
        // n_pre_evolution counts the DISCOVERED batch=1 partition (the
        // actual evolution event), not `source IS NULL` — null-ness is
        // only equivalent while the generator never emits null sources
        // on odd ids, an assumption the hash shouldn't ride on
        // (ADVICE r15)
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("batch") === 1, 1L).otherwise(0L))
              .as("n_pre_evolution"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy(col("lang"))
      }
    },
    Some("""
      SELECT lang, COUNT(*) AS n,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pre_evolution,
             CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END)
               AS BIGINT) AS n_sources,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang
    """))

  val all: Seq[GraftQuery] = Seq(q182)
}
