package graft.operators

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** `observe()` — funnel metrics collected in the SAME pass as the
  * query. A prep job wants rows-in / rows-after-each-gate counts; a
  * second aggregation pass over 100 TB to get them would double the
  * scan, and accumulator hand-rolling is retry-unsafe. Observation
  * metrics ride the existing action (exactly-once per observed row,
  * task retries excluded by the engine).
  */
class ObservationSpec extends SparkSpec {

  test("prep funnel counts ride the main action, no second scan") {
    val obs = Observation("prep_funnel")
    val docs = Tables(spark, sf0001, "documents")
    val scored = docs
      .withColumn("n_words",
        size(split(graft.functions.MockScorers.normalize(col("text")), " ")))
      .withColumn("keep", col("n_words") >= 10)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("rows_kept"))
    val kept = scored.filter(col("keep")).count()
    val rowsIn = obs.get("rows_in").asInstanceOf[Long]
    val rowsKept = obs.get("rows_kept").asInstanceOf[Long]
    assert(rowsIn === docs.count())
    assert(rowsKept === kept,
      s"observed funnel must match the actual gate: $rowsKept vs $kept")
  }
}
