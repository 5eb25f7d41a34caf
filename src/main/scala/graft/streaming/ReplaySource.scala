package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-limited corpus replay source (S3): the reference's producers
  * replay a CSV corpus into Kafka at a fixed rate (1 msg/s,
  * `producer.py:19,48-53`; 5 fps/cam `vehicle_producer.py:21`). The
  * Spark-native equivalent needs no external broker: the built-in `rate`
  * source drives a broadcast join against the indexed corpus, emitting
  * `rowsPerSecond` corpus rows per second (cycling when exhausted).
  *
  * At scale the corpus side stays a broadcast only while small (like the
  * reference's 2340-row corpus); a large corpus would instead be a
  * `rate-micro-batch`-keyed shuffle join — same plan shape.
  */
object ReplaySource {

  /** Streaming DataFrame replaying `corpus` rows (with monotonically
    * increasing replay ids) at the given rate. The corpus gets a dense
    * 0-based `corpus_idx` via `rdd.zipWithIndex` over the key-sorted
    * frame: the sort is a distributed range-partitioned sort and the
    * index assignment is per-partition (one small count-per-partition
    * job) — no single-partition global Window, so a large corpus never
    * funnels through one task.
    */
  def fromRate(spark: SparkSession, corpus: DataFrame, keyCol: String,
      rowsPerSecond: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val n = corpus.count()
    val sorted = corpus.orderBy(col(keyCol))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) },
      sorted.schema.add("corpus_idx", LongType, nullable = false))
    val rate = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load() // columns: timestamp, value
    // size-gate the broadcast hint on estimated BYTES, not rows: corpus
    // rows carry arbitrary payloads (document text), so a row-count gate
    // alone still allows a multi-GB forced broadcast. Width is estimated
    // from a small sample; an explicit hint is honored regardless of
    // size, so past the gate we fall back to a stream-static shuffle
    // join and let Catalyst/AQE decide.
    val sampleRows = corpus.limit(64).collect()
    val avgRowBytes =
      if (sampleRows.isEmpty) 64L
      else sampleRows.map { r =>
        r.toSeq.map {
          case s: String => s.length.toLong + 8L
          case b: Array[Byte] => b.length.toLong + 8L
          case seq: scala.collection.Seq[_] => seq.length.toLong * 8L + 8L
          case _ => 16L
        }.sum
      }.sum / sampleRows.length
    val corpusSide =
      if (n <= graft.Limits.BroadcastRows &&
        n * avgRowBytes <= graft.Limits.BroadcastBytes) broadcast(indexed)
      else indexed
    rate
      .withColumn("corpus_idx", pmod(col("value"), lit(n)))
      .join(corpusSide, "corpus_idx")
      .withColumn("replay_id", col("value"))
      .drop("corpus_idx", "value")
  }
}
