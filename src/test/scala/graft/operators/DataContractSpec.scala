package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DataContract]] (X139) oracles: a deliberately broken planted
  * warehouse fires exactly the right contracts with exact violation
  * counts (orphan FK, duplicate PK double-count, null key, range
  * breaches), and the real sf0.001 warehouse passes its referential
  * contracts (the generator builds consistent FKs).
  */
class DataContractSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("broken planted warehouse: each contract fires with exact counts") {
    val dir = tmpDir("contract")
    // orders: duplicate key 10 (x2), one null custkey, one orphan cust 99
    Seq((10L, Option(1L)), (10L, Option(1L)), (11L, None),
      (12L, Option(99L)), (13L, Option(2L)))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // lineitem: one orphan order 999; one discount and one quantity breach
    Seq((10L, 0.05, 10.0), (999L, 0.02, 5.0), (11L, 0.5, 3.0),
      (12L, 0.0, 99.0))
      .toDF("l_orderkey", "l_discount", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val out = DataContract.q180.build(spark, dir).collect()
      .map(r => r.getAs[String]("contract") ->
        (r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations"),
          r.getAs[Boolean]("pass"))).toMap
    assert(out("fk_lineitem_orders")._2 === 1L)   // order 999 missing
    assert(!out("fk_lineitem_orders")._3)
    // duplicate o_orderkey=10 joins lineitem row twice? No — FK check
    // counts lineitem rows whose key is ABSENT; 10 exists (twice), so
    // only 999 violates. n_checked inflates by the dup join fanout:
    assert(out("fk_lineitem_orders")._1 === 5L,
      "left join against a dup PK fans out — visible in n_checked")
    // orders→customer: null custkey AND orphan 99 both violate
    assert(out("fk_orders_customer")._2 === 2L)
    assert(out("pk_orders_unique")._2 === 2L,
      "both rows of the duplicated key count as violations")
    assert(out("not_null_o_custkey")._2 === 1L)
    assert(out("range_l_discount_0_0.1")._2 === 1L)
    assert(out("range_l_quantity_1_50")._2 === 1L)
    assert(out.values.forall(v => !v._3 || v._2 == 0L))
  }

  test("sf0.001 warehouse: referential + range contracts all pass") {
    val out = DataContract.q180.build(spark, sf0001).collect()
    assert(out.length === 6)
    out.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"${r.getAs[String]("contract")} violated on clean data: " +
          s"${r.getAs[Long]("n_violations")}")
      assert(r.getAs[Long]("n_checked") > 0L)
    }
  }
}
