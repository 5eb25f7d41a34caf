package graft

import org.apache.spark.sql.functions._

import graft.Checkpoints.EagerCheckpoint

/** [[Checkpoints.eager]] — the config seam that makes every eager
  * operator (MinHash dedup, incremental index, CC fixpoint) safe on a
  * cluster with executor loss / dynamic allocation: flipping
  * [[Checkpoints.ReliableKey]] swaps executor-local checkpoint blocks
  * for reliable ones under the configured checkpoint dir, with no
  * operator changes.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[T](enabled: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(Checkpoints.ReliableKey)
    if (enabled) spark.conf.set(Checkpoints.ReliableKey, "true")
    else spark.conf.unset(Checkpoints.ReliableKey)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Checkpoints.ReliableKey, v)
      case None => spark.conf.unset(Checkpoints.ReliableKey)
    }
  }

  test("default path stays executor-local (no checkpoint dir needed)") {
    withReliable(enabled = false) {
      val out = spark.range(50).toDF("id").eagerCheckpoint()
      assert(out.count() === 50)
    }
  }

  test("reliable=true without a checkpoint dir fails loudly") {
    // guard order matters: getCheckpointDir must be probed BEFORE
    // df.checkpoint() so the operator fails with OUR message, and only
    // when the flag is on (this test must run before any suite sets a
    // dir on the shared context — hence the conf-scoped flag design)
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      withReliable(enabled = true) {
        val e = intercept[IllegalArgumentException] {
          spark.range(5).toDF("id").eagerCheckpoint()
        }
        assert(e.getMessage.contains("setCheckpointDir"))
      }
    }
  }

  test("reliable=true + dir: checkpoint files land on the filesystem " +
      "and nearDuplicates still mines the same pairs") {
    val dir = tmpDir("reliable-ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about streaming state stores"))
      .toDF("doc_id", "text")
    val expected = operators.MinHashDedup.nearDuplicates(docs, 0.8)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val got = withReliable(enabled = true) {
      operators.MinHashDedup.nearDuplicates(docs, 0.8)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    }
    assert(got === expected)
    assert(got.contains((1L, 2L)))
    // reliable checkpoints are real files under the configured dir
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"no reliable checkpoint data written under $dir")
  }
}
