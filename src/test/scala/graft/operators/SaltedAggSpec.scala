package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedAggSpec extends SparkSpec {

  test("salted two-phase sum equals direct groupBy on a skewed key") {
    // 95% of rows under one hot key
    val df = spark.range(200000)
      .select(
        when(col("id") % 20 =!= 0, lit("HOT")).otherwise(
          concat(lit("k"), col("id") % 7)).as("key"),
        (col("id") % 100).as("v"))
    val direct = df.groupBy(col("key"))
      .agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SaltedAgg.sumByKey(df, col("key"), col("v"), salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }
}
