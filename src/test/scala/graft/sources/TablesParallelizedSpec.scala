package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Tables.parallelized]] — the parallelism-starved-scan guard (r19):
  * fires exactly when the file cannot supply the session's parallelism
  * by splits, is the identity otherwise, and never changes rows.
  */
class TablesParallelizedSpec extends AnyFunSuite with SparkSpec {

  private def hasRepartition(
      df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionByExpression => r
    }.nonEmpty

  test("starved scan (tiny single-row-group file) gets the pinned " +
      "repartition; rows unchanged") {
    val df = Tables.parallelized(spark, sf0001, "documents", "doc_id")
    assert(hasRepartition(df),
      "a KB-scale file cannot supply 32-way split parallelism")
    val plain = Tables(spark, sf0001, "documents")
    assert(df.count() === plain.count())
    assert(df.select(sum(col("doc_id"))).head.getLong(0) ===
      plain.select(sum(col("doc_id"))).head.getLong(0))
  }

  test("identity once splits can supply the parallelism (production " +
      "regime, emulated by shrinking maxPartitionBytes)") {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key, "128m")
    try {
      // documents at sf0.001 is ~100 KB; 1-byte advisory splits make
      // bytes >= maxSplit * cores hold, i.e. the scan is split-rich
      spark.conf.set(key, "1b")
      val df = Tables.parallelized(spark, sf0001, "documents", "doc_id")
      assert(!hasRepartition(df),
        "a split-rich scan must pass through untouched")
    } finally spark.conf.set(key, old)
  }
}
