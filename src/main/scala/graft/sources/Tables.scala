package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided TPC-H-ish star schema + stream tables
  * (TESTDATA.md). One parquet file per table under the scale-factor dir.
  *
  * All reads go through `spark.read.parquet` so Catalyst predicate pushdown
  * and column pruning reach the scan (`PushedFilters`/`ReadSchema` in
  * `.explain`); callers select/filter lazily and never materialize here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Current testdata timestamps are TIMESTAMP(MICROS); sessions set
    // inferTimestampNTZ=false so they scan directly as session-tz (UTC)
    // TIMESTAMP — no conversion, filters still push down. Older testdata
    // generations carried events.ts as TIMESTAMP(NANOS), which Spark
    // refuses natively; sessions set spark.sql.legacy.parquet.nanosAsLong
    // so those arrive as LongType nanos. Truncate to micros with exact
    // integer division (`div` — a double division would lose precision
    // above 2^53) to match DuckDB's us-precision read of the same file.
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Parallelism-starved-scan guard (r19, guide §2.5 "one huge
    * unsplittable file ... repartition immediately after the read"):
    * the test generator writes each table as ONE parquet row group, so
    * at bench scale every scan is one task regardless of
    * `spark.sql.files.maxPartitionBytes` — and any CPU-heavy per-row
    * pipeline above it (normalize/shingle/regex/fingerprint) runs on
    * one core. When — and only when — the file cannot supply the
    * session's parallelism by splits (bytes < maxPartitionBytes ×
    * defaultParallelism), hash-repartition on `key` right after the
    * read (deterministic, retry-stable; REPARTITION_BY_NUM so AQE's
    * byte-based coalescing cannot fold the tiny-but-hot exchange back
    * to one partition). At production sizes the condition is false and
    * this is the identity: no payload ever shuffles that didn't need
    * to. Callers opt in per pipeline — only where per-row CPU, not
    * bytes, is the cost (a blanket exchange would tax every cheap
    * scan in the suite).
    */
  def parallelized(s: SparkSession, dir: String, name: String,
      key: String): DataFrame = {
    val df = apply(s, dir, name)
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
        p.getFileSystem(s.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Throwable => Long.MaxValue }
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(s.conf.get(
        "spark.sql.files.maxPartitionBytes", "128m"))
    val cores = s.sparkContext.defaultParallelism
    if (bytes >= maxSplit * cores) df
    else df.repartition(cores, org.apache.spark.sql.functions.col(key))
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
