package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashDedup

/** Throwaway profiling harness for q43 — not part of the library. */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = time("shingles count") {
      val s = MinHashDedup.shingles(docs).cache()
      val n = s.count(); println(s"[prof]   shingle rows = $n"); s
    }
    val sigs = time("signatures") {
      val g = MinHashDedup.signatures(sh).cache()
      val n = g.count(); println(s"[prof]   sig rows = $n"); g
    }
    val nCand = time("bandPairs raw count") {
      MinHashDedup.candidatePairsRawCount(sigs)
    }
    println(s"[prof]   raw band pairs = $nCand")
    val result = time("full nearDuplicates") {
      MinHashDedup.nearDuplicates(docs, 0.5).count()
    }
    println(s"[prof]   result pairs = $result")
    spark.stop()
  }
}
