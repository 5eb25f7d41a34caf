package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sharding]] — deterministic shard assignment and the partitioned
  * write path.
  */
class ShardingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("every doc lands in exactly one shard; ids cover [0, n)") {
    val stats = Sharding.shardStats(docs, nShards = 8).collect()
    assert(stats.map(_.getLong(0)).toSet == (0L until 8L).toSet)
    assert(stats.map(_.getLong(1)).sum == docs.count())
  }

  test("assignment is deterministic and decorrelated from id order") {
    val a = Sharding.shardStats(docs, nShards = 8).collect().toSeq
    val b = Sharding.shardStats(docs, nShards = 8).collect().toSeq
    assert(a == b, "two runs must produce identical shard plans")
    // decorrelation: consecutive doc_ids must not share a shard en masse
    val assigned = docs.select(col("doc_id"),
        Sharding.shardCol(col("doc_id"), 8).as("shard"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val sameAsNext = assigned.sliding(2).count(w => w(0) == w(1))
    assert(sameAsNext < assigned.length / 4,
      s"adjacent ids collide in shard too often: $sameAsNext/${assigned.length}")
  }

  test("writeShards produces prunable shard directories matching the plan") {
    val out = Files.createTempDirectory("shards").toString
    Sharding.writeShards(docs, out, nShards = 4)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == (0 until 4).map(i => s"shard=$i").toSet)

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // each directory holds exactly the docs the pure function assigns
    val mismatch = back
      .withColumn("expected", Sharding.shardCol(col("doc_id"), 4))
      .filter(col("shard") =!= col("expected"))
    assert(mismatch.isEmpty)
    // a shard=k filter prunes to one partition directory
    val plan = back.filter(col("shard") === 2).queryExecution
      .executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"shard filter must be a partition filter, plan:\n$plan")
  }
}
