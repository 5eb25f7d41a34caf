package graft

import org.apache.spark.sql.functions._

/** Stage-level cost breakdown for q168 (X126) — where do the seconds
  * go at sf0.1, and which face dominates. Not part of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileTriangle"
  */
object ProfileTriangle {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val baskets = graft.sources.Tables(spark, src, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    println(s"[tri] baskets = ${baskets.count()}")

    val o = timed("orientedEdges build + localCheckpoint") {
      Checkpoints.eager(graft.operators.TriangleCount.orientedEdges(baskets))
    }
    println(s"[tri] edges = ${o.count()}")

    val tri = timed("triangles (adjacency intersect)") {
      graft.operators.TriangleCount.triangles(o).count()
    }
    println(s"[tri] triangles = $tri")

    timed("full q168") {
      graft.operators.TriangleCount.q168.build(spark, src)
        .groupBy().count().collect()
    }
    spark.stop()
  }
}
