package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness — session-aging investigation. */
object ProfileAging {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (i <- 1 to 3) {
      time(s"round $i: trivial count")(docs.groupBy(col("lang")).count().count())
      time(s"round $i: q43 nearDuplicates")(
        graft.operators.MinHashDedup.nearDuplicates(docs, 0.5).count())
      time(s"round $i: q52 AnnLsh")(
        graft.operators.AnnLsh.topK(emb, (0L until 10L).toSeq, 5).count())
      val rt = Runtime.getRuntime
      println(s"[prof]   heap used = ${(rt.totalMemory - rt.freeMemory) / (1 << 20)} MB")
    }
    spark.stop()
  }
}
