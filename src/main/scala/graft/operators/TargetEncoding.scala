package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Q._

/** X129 — smoothed target encoding (Micci-Barreca SIGKDD Explorations
  * 2001): a high-cardinality categorical re-expressed as its
  * smoothed outcome rate, the workhorse categorical feature of every
  * tabular model and the "domain prior" column of a curation mix
  * (source → historical keep-rate). Additive (m-estimate) smoothing
  * pulls sparse categories toward the global prior so a 3-row
  * category can't claim rate 1.0; the leave-one-out columns expose
  * the encoding a TRAINING row is allowed to see (its own label
  * removed — using the plain encoding in-fold is the classic target
  * leak, and since y is binary the LOO encoding takes exactly two
  * values per category, so the whole audit stays on the category
  * frame with NO row explosion).
  *
  * Shape: one map-side-combined groupBy to the |categories| frame; the
  * 1-row global prior is a broadcast cross join. At 100 TB this is a
  * scan plus a dimension-sized frame — the encodings are then a
  * broadcast-join lookup for the training pass.
  *
  * Determinism: counts exact longs; every rate is one shared double
  * tree (prior division first, then one fused (pos + m·prior)/(n + m)
  * tree — IEEE ops correctly rounded ⇒ identical bits both engines).
  */
object TargetEncoding {

  /** m-estimate smoothing weight. */
  val M = 20

  private def enc(pos: Column, n: Column, prior: Column): Column =
    (pos.cast("double") + lit(M.toDouble) * prior) /
      (n.cast("double") + lit(M.toDouble))

  /** The encoding kernel: rows carrying the key columns plus a 0/1
    * label `y` → one row per category with the smoothed encoding and
    * both leave-one-out variants. Split out from q171 so planted
    * category frames (singletons, all-positive / all-negative
    * categories) can pin the LOO identities directly.
    */
  def encode(rows: org.apache.spark.sql.DataFrame, keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val kc = keys.map(col)
    val cats = rows.groupBy(kc: _*)
      .agg(count(lit(1)).as("n_c"), sum(col("y")).as("pos_c"))
    val gl = cats.agg(sum(col("n_c")).as("n_g"),
      sum(col("pos_c")).as("pos_g"))
    val prior = col("pos_g").cast("double") / col("n_g").cast("double")
    cats.join(broadcast(gl))
      .select(kc ++ Seq(col("n_c"), col("pos_c"),
        (col("pos_c").cast("double") / col("n_c").cast("double"))
          .as("raw_rate"),
        prior.as("prior"),
        enc(col("pos_c"), col("n_c"), prior).as("enc"),
        // LOO columns only exist for rows that exist: a category
        // with no positive row has no training row that would ever
        // read enc_loo_pos (and its (0−1+m·prior) numerator can go
        // negative) — null it out; symmetrically for enc_loo_neg
        // when every row is positive.
        when(col("pos_c") > 0,
          enc(col("pos_c") - 1, col("n_c") - 1, prior))
          .as("enc_loo_pos"),
        when(col("pos_c") < col("n_c"),
          enc(col("pos_c"), col("n_c") - 1, prior))
          .as("enc_loo_neg")): _*)
  }

  /** q171 — encode (segment, priority) by finished-order rate. */
  val q171 = GraftQuery(
    "q171_target_encoding", {
      (s, d) => {
        val rows = t(s, d, "orders")
          .join(t(s, d, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"),
            col("o_orderpriority").as("priority"),
            when(col("o_orderstatus") === "F", lit(1L))
              .otherwise(lit(0L)).as("y"))
        encode(rows, Seq("segment", "priority"))
          .orderBy(col("segment"), col("priority"))
      }
    },
    Some(s"""
      WITH rows_ AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders JOIN customer ON o_custkey = c_custkey),
      cats AS (
        SELECT segment, priority, COUNT(*) AS n_c,
               CAST(SUM(y) AS BIGINT) AS pos_c
        FROM rows_ GROUP BY 1, 2),
      gl AS (
        SELECT CAST(SUM(n_c) AS BIGINT) AS n_g,
               CAST(SUM(pos_c) AS BIGINT) AS pos_g
        FROM cats)
      SELECT segment, priority, n_c, pos_c,
             CAST(pos_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS raw_rate,
             CAST(pos_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS prior,
             (CAST(pos_c AS DOUBLE) + $M.0 *
                (CAST(pos_g AS DOUBLE) / CAST(n_g AS DOUBLE)))
               / (CAST(n_c AS DOUBLE) + $M.0) AS enc,
             CASE WHEN pos_c > 0 THEN
               (CAST(pos_c - 1 AS DOUBLE) + $M.0 *
                  (CAST(pos_g AS DOUBLE) / CAST(n_g AS DOUBLE)))
                 / (CAST(n_c - 1 AS DOUBLE) + $M.0) END AS enc_loo_pos,
             CASE WHEN pos_c < n_c THEN
               (CAST(pos_c AS DOUBLE) + $M.0 *
                  (CAST(pos_g AS DOUBLE) / CAST(n_g AS DOUBLE)))
                 / (CAST(n_c - 1 AS DOUBLE) + $M.0) END AS enc_loo_neg
      FROM cats CROSS JOIN gl
      ORDER BY segment, priority
    """))

  val all: Seq[GraftQuery] = Seq(q171)
}
