package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X89 — streaming embedding-drift monitor: per event-time window,
  * the cosine between the window's embedding CENTROID and a frozen
  * reference centroid, with a drift flag once it falls below a
  * threshold. This is the semantic-pipeline observability face the
  * relational tier's X87 profile gives tabular data: a crawl source
  * changing character (new language mix, spam flood, encoder version
  * skew) moves the centroid long before any per-document gate fires,
  * and the standard production response is to HOLD ingestion before a
  * bad distribution poisons training shards (the embedding-space
  * sibling of data-validation monitors like TFX's skew detection).
  *
  * Spark-first shape: watermarked tumbling windows; the centroid is a
  * per-dimension mean computed by posexploding the vector into
  * (window, pos, x) rows — map-side combine collapses each partition
  * to ≤ |windows|·dim partial sums, so the shuffle carries
  * windows×64 longs regardless of batch size; the per-window
  * re-assembly sorts by pos into an array (deterministic order) and
  * the cosine against the broadcast-literal reference is one fused
  * fold. Cosine of the SUM equals cosine of the mean (scale
  * invariance), so no count division ever enters the float path.
  *
  * State: exactly the windowed-agg state the RocksDB story already
  * covers (RocksDbStateSpec) — watermark-bounded, evicted when
  * windows close. Output mode append emits each window once, closed.
  */
object DriftMonitor {

  /** Drift alarm threshold on centroid cosine. */
  val Threshold = 0.90

  private def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorFunctions.dot(a, b)

  /** Wire the monitor over a stream of (ts, vec_id, embedding):
    * emits (window_start, window_end, n_vecs, centroid_cos_r,
    * drifted) per closed window.
    */
  def monitor(stream: DataFrame, reference: Array[Double],
      window: String = "1 minute", watermark: String = "2 minutes",
      threshold: Double = Threshold): DataFrame = {
    val dim = reference.length
    val refArr = array(reference.map(lit): _*)
    val refNorm = math.sqrt(reference.map(x => x * x).sum)
    val comps = stream
      .withWatermark("ts", watermark)
      .select(col("ts"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("nx"))
    comps
      .groupBy(col("window"))
      .agg(
        // n_vecs: each vector contributes one row per dimension
        (sum(col("nx")) / dim).cast("long").as("n_vecs"),
        // deterministic re-assembly: sort (pos, sx) pairs by pos
        transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
          s => s.getField("sx")).as("cent"))
      .withColumn("cos", dot(col("cent"), refArr) /
        (sqrt(graft.functions.expressions.VectorFunctions
          .sqNorm(col("cent"))) * lit(refNorm)))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_vecs"),
        round(col("cos"), 6).as("centroid_cos_r"),
        (col("cos") < threshold).as("drifted"))
  }
}
