package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TableProfile]] (X87) semantic oracles: the profile matches a
  * driver recomputation on the corpus (nulls, distincts, min/max
  * renders), and a planted null flood + cardinality collapse is
  * exactly measured — the drift signals the operator exists for.
  */
class TableProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("corpus profile matches a driver replay for l_returnflag and " +
      "l_orderkey") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val got = TableProfile.q138.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("l_orderkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate"))
    val n = li.count()
    val flags = li.select("l_returnflag").as[String].collect()
    val rf = got("l_returnflag")
    assert(rf.getAs[Long]("n_rows") === n)
    assert(rf.getAs[Long]("n_nulls") === 0L)
    assert(rf.getAs[Long]("n_distinct") === flags.distinct.length)
    assert(rf.getAs[String]("min_repr") === flags.min)
    assert(rf.getAs[String]("max_repr") === flags.max)
    val keys = li.select("l_orderkey").as[Long].collect()
    val ok = got("l_orderkey")
    assert(ok.getAs[Long]("n_distinct") === keys.distinct.length)
    assert(ok.getAs[String]("min_repr") === keys.min.toString)
    assert(ok.getAs[String]("max_repr") === keys.max.toString)
  }

  test("planted null flood and cardinality collapse are measured " +
      "exactly") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val d = tmpDir("profile-drift")
    // every other l_quantity nulled; l_returnflag collapsed to one value
    li.withColumn("l_quantity",
        when(col("l_orderkey") % 2 === 0, col("l_quantity")))
      .withColumn("l_returnflag", lit("N"))
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = TableProfile.q138.build(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val qn = got("l_quantity")
    val expectNulls = li.filter(col("l_orderkey") % 2 =!= 0).count()
    assert(qn.getAs[Long]("n_nulls") === expectNulls)
    assert(math.abs(qn.getAs[Double]("null_ratio_r") -
      expectNulls.toDouble / li.count()) < 1e-3)
    assert(got("l_returnflag").getAs[Long]("n_distinct") === 1L)
  }
}
