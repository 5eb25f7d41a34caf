package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q86 — BPE pair counting. Hand-counted planted vocab plus a plan
  * assert that the global top-k compiles to TakeOrderedAndProject.
  */
class BpePairSpec extends SparkSpec {
  import spark.implicits._

  test("pair counts are word-frequency weighted hand counts") {
    // vocab: "abab"×2, "ba"×3, "c" (dropped: single char)
    val docs = Seq((1L, "abab ba c"), (2L, "abab ba"), (3L, "ba"))
      .toDF("doc_id", "text")
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val pairs = vocab
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substr(w, i, 2)").as("pair"), col("wc"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abab"(wc 2): ab, ba, ab → ab+4, ba+2; "ba"(wc 3): ba+3
    assert(pairs == Map("ab" -> 4L, "ba" -> 5L))
  }

  test("q86 plan: vocab-sized top-k is TakeOrderedAndProject") {
    val df = TextQueries.q86.build(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 must compile to per-partition heaps, plan:\n$plan")
    val rows = df.collect()
    assert(rows.length == 50)
    // descending by count with pair tiebreak — a total, stable order
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
