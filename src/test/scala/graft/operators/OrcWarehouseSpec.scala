package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[OrcWarehouse]] (X136) oracles: the ORC round-trip is lossless
  * (row count + exact content equality against the parquet source),
  * and the executed read plan proves the pushdown story — partition
  * filters prune the returnflag directories, predicate pushdown
  * reaches the ORC stripe reader.
  */
class OrcWarehouseSpec extends AnyFunSuite with SparkSpec {

  private lazy val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))

  private lazy val orcDir = {
    val dir = tmpDir("orc-spec") + "/lineitem_orc"
    OrcWarehouse.writeOrc(src, dir)
    dir
  }

  test("round-trip is lossless: same rows, exact content") {
    val back = spark.read.orc(orcDir)
    assert(back.count() === src.count())
    val key = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount")
    val a = src.select(key.map(col): _*).collect()
      .map(_.toSeq.toList).sortBy(_.toString)
    val b = back.select(key.map(col): _*).collect()
      .map(_.toSeq.toList).sortBy(_.toString)
    assert(a === b)
  }

  test("executed plan: partition directories pruned, predicate pushed " +
      "into the ORC reader") {
    val df = spark.read.orc(orcDir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .groupBy(col("l_linestatus")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Format: ORC") || plan.contains("orc"),
      s"expected an ORC scan:\n$plan")
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)].*", "$1")
        .contains("l_returnflag"),
      s"partition filter on l_returnflag must prune directories:\n$plan")
    assert(plan.contains("PushedFilters: [") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)].*", "$1")
        .contains("l_quantity"),
      s"quantity predicate must reach the ORC reader:\n$plan")
  }

  test("q177 over ORC == the same aggregate over the parquet source") {
    val viaOrc = OrcWarehouse.q177.build(spark, sf0001).collect()
    val direct = src
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 10)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.discSum(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy(col("l_linestatus")).collect()
    assert(viaOrc.map(_.toSeq.toList).toList ===
      direct.map(_.toSeq.toList).toList)
  }
}
