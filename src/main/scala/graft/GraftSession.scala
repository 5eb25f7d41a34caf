package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the test harness (local[32], 128 GiB host) but
  * every setting is the one we'd ship on a real cluster too: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partitions sized to the parallelism at hand rather than the 200 default,
  * UTC session time zone so results are reproducible against the DuckDB
  * oracle.
  */
object GraftSession {
  def builder(cpus: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata timestamps are parquet TIMESTAMP(MICROS, isAdjustedToUTC
      // =false); read them as session-tz TIMESTAMP (UTC above) rather than
      // TIMESTAMP_NTZ so epoch arithmetic (cast to double, unix_timestamp)
      // works and matches DuckDB's naive read of the same file. Older
      // generations used TIMESTAMP(NANOS); keep nanosAsLong so those scans
      // arrive as long nanos (converted to micros in Tables) too.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int = 32): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
