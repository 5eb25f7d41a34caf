package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase salted group-by.
  *
  * A hot key (one camera producing most frames, one user most events)
  * funnels its entire row set through a single reducer in a plain
  * groupBy. Salting appends a uniform shard id to the key for the first
  * (partial) aggregation — the hot key fans out over `salts` reducers —
  * then a second, tiny aggregation over (key) merges the shards.
  *
  * AQE's skew handling only splits JOIN partitions; skewed aggregation
  * keys still need this pattern. Correct for any commutative+associative
  * aggregate; exposed here for sum/count.
  */
object SaltedAgg {

  /** `saltCols`: extra row-distinguishing columns mixed into the salt
    * hash (ideally a stable row id from the source — event id, file path
    * + offset). Without them the salt is `hash(key, value)`, which
    * collapses to FEW distinct salts when a hot key's values have low
    * cardinality (e.g. a constant value — a classic skew shape),
    * re-concentrating exactly the skew this operator exists to break.
    * Skew mitigation degrades toward a plain groupBy in that case;
    * callers with low-cardinality values should always pass a row id.
    */
  def sumByKey(df: DataFrame, key: Column, value: Column,
      salts: Int = 16, saltCols: Seq[Column] = Nil): DataFrame = {
    // Salt must be DETERMINISTIC per row: nondeterministic salts
    // (spark_partition_id / monotonically_increasing_id / rand) break
    // under fetch-failure retries — a recomputed map task re-salts rows
    // while reducers keep already-fetched output, double-counting or
    // dropping partial sums. Hashing row content is stable across
    // recomputation.
    val partial = df
      .groupBy(key.as("k"),
        pmod(xxhash64(Seq(key, value) ++ saltCols: _*), lit(salts.toLong))
          .as("salt"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"),
        sum(col("partial_n")).as("n"))
  }
}
