package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X102 — pairwise Pearson correlation/covariance matrix over numeric
  * columns, from ONE pass of second-moment sums — the feature-audit
  * primitive a training pipeline runs before whitening/decorrelating
  * features or pruning redundant ones (|ρ| ≈ 1 columns carry no new
  * signal), and the warehouse-native form of `ANALYZE ... CORR`.
  *
  * Determinism: the sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
  * are EXACT DECIMAL sums — the inputs carry ≤2 decimals, so products
  * carry ≤4 and decimal addition is associative across any partition
  * order; ρ is then one shared double expression tree over the exact
  * values (a built-in corr() would stream Welford updates in
  * partition order — not reproducible cross-engine).
  *
  * Scale shape: one map-side-combined aggregation producing a single
  * row of 6·|pairs| decimals; nothing shuffles but the partial-agg
  * rows. The sums are associative+commutative, so the STREAMING form
  * rides X98's [[MaterializedAgg.mergeOnceAs]] machinery — per batch a
  * sketch-sized merge of the moment row, exactly-once by batch id,
  * with ρ derived at read time ([[streamMoments]]/[[readCorr]]).
  */
object CorrelationMatrix {

  private val D = "decimal(28,4)"

  /** Mergeable second-moment partials for the column pairs: ONE wide
    * agg (sums only — no countDistinct, so no EXPAND; all map-side
    * combinable in a single corpus scan) exploded into per-pair rows.
    * Per-pair aggs would re-scan the table |pairs| times.
    */
  def momentPartials(batch: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    val cols = pairs.flatMap { case (x, y) => Seq(x, y) }.distinct
    // listwise deletion: a null in ANY participating column would make
    // n (count of all rows) inconsistent with the null-skipping sums
    // and silently skew cov/ρ — the operator is exposed to arbitrary
    // streams via streamMoments, not just the non-null TPC-H columns
    // (ADVICE r12)
    val clean = batch.na.drop("any", cols)
    val aggs =
      cols.map(c => sum(col(c).cast(D)).as(s"s_$c")) ++
        cols.map(c => sum(col(c).cast(D) * col(c).cast(D)).as(s"q_$c")) ++
        pairs.map { case (x, y) =>
          sum(col(x).cast(D) * col(y).cast(D)).as(s"p_${x}_$y")
        }
    val one = clean.agg(count(lit(1)).as("n"), aggs: _*)
    one.select(explode(array(pairs.map { case (x, y) =>
      struct(lit(s"$x~$y").as("pair"), col("n"),
        col(s"s_$x").as("sx"), col(s"s_$y").as("sy"),
        col(s"p_${x}_$y").as("sxy"),
        col(s"q_$x").as("sxx"), col(s"q_$y").as("syy"))
    }: _*)).as("r")).select(col("r.*"))
  }

  /** Combine two moment frames — all components additive. */
  def momentCombine(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("pair"))
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"),
        sum(col("sxx")).as("sxx"), sum(col("syy")).as("syy"))

  /** ρ and covariance from a moment frame — the one shared expression
    * tree both engines evaluate on exact decimal inputs.
    */
  def corrFrom(moments: DataFrame): DataFrame =
    moments
      .withColumn("nn", col("n").cast("double"))
      // each EXACT decimal casts to double once (correctly rounded,
      // same value both engines); the combination then runs in double
      // — a decimal n·Σxy at these magnitudes would overflow 38 digits
      // and the two engines truncate differently
      .withColumn("cov_num", col("nn") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("vx", col("nn") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("vy", col("nn") * col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double"))
      .select(col("pair"), col("n"),
        round(col("cov_num") / (col("nn") * (col("nn") - 1d)), 6)
          .as("cov_r"),
        round(col("cov_num") / (sqrt(col("vx")) * sqrt(col("vy"))), 6)
          .as("corr_r"))
      .orderBy(col("pair"))

  /** Merge one batch of the stream into the moment state. */
  def mergeMomentsOnce(batch: DataFrame, pairs: Seq[(String, String)],
      path: String, batchId: Long): Unit =
    MaterializedAgg.mergeOnceAs(batch, path, batchId,
      momentPartials(_, pairs), momentCombine)

  /** Read the correlation matrix off the streaming state. */
  def readCorr(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    MaterializedAgg.recover(spark, path)
    corrFrom(spark.read.parquet(path))
  }

  /** Wire a stream into the moment-maintenance loop. */
  def streamMoments(input: DataFrame, pairs: Seq[(String, String)],
      path: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    input.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeMomentsOnce(batch, pairs, path, batchId)
      }
      .start()

  /** q150 — correlation matrix of the lineitem numeric columns. */
  val q150 = GraftQuery(
    "q150_correlation_matrix", {
      (s, d) => {
        val li = t(s, d, "lineitem")
        corrFrom(momentPartials(li, Seq(
          ("l_quantity", "l_extendedprice"),
          ("l_quantity", "l_discount"),
          ("l_extendedprice", "l_discount"))))
      }
    },
    Some("""
      WITH m AS (
        SELECT 'l_quantity~l_extendedprice' AS pair, count(*) AS n,
               sum(CAST(l_quantity AS DECIMAL(28,4))) AS sx,
               sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS sy,
               sum(CAST(l_quantity AS DECIMAL(28,4)) *
                   CAST(l_extendedprice AS DECIMAL(28,4))) AS sxy,
               sum(CAST(l_quantity AS DECIMAL(28,4)) *
                   CAST(l_quantity AS DECIMAL(28,4))) AS sxx,
               sum(CAST(l_extendedprice AS DECIMAL(28,4)) *
                   CAST(l_extendedprice AS DECIMAL(28,4))) AS syy
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity~l_discount', count(*),
               sum(CAST(l_quantity AS DECIMAL(28,4))),
               sum(CAST(l_discount AS DECIMAL(28,4))),
               sum(CAST(l_quantity AS DECIMAL(28,4)) *
                   CAST(l_discount AS DECIMAL(28,4))),
               sum(CAST(l_quantity AS DECIMAL(28,4)) *
                   CAST(l_quantity AS DECIMAL(28,4))),
               sum(CAST(l_discount AS DECIMAL(28,4)) *
                   CAST(l_discount AS DECIMAL(28,4)))
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice~l_discount', count(*),
               sum(CAST(l_extendedprice AS DECIMAL(28,4))),
               sum(CAST(l_discount AS DECIMAL(28,4))),
               sum(CAST(l_extendedprice AS DECIMAL(28,4)) *
                   CAST(l_discount AS DECIMAL(28,4))),
               sum(CAST(l_extendedprice AS DECIMAL(28,4)) *
                   CAST(l_extendedprice AS DECIMAL(28,4))),
               sum(CAST(l_discount AS DECIMAL(28,4)) *
                   CAST(l_discount AS DECIMAL(28,4)))
        FROM lineitem)
      SELECT pair, n,
             round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
               AS cov_r,
             round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                     CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
               AS corr_r
      FROM m
      ORDER BY pair
    """))

  val all: Seq[GraftQuery] = Seq(q150)
}
