package graft

import org.apache.spark.sql.SparkSession
import graft.operators.ConnectedComponents

/** Deep-chain ConnectedComponents measurement (r6 verdict item 7):
  * does `pointerJump` (label(label(id)) shortcut, O(log d) rounds) beat
  * plain propagation (O(d) rounds) once the component diameter is far
  * past anything sf0.1's near-clique dup clusters produce? Plants
  * `chains` disjoint paths of `depth` nodes (diameter = depth-1) plus a
  * near-clique control (triangles, the q68 shape), times min-of-3 each
  * way, prints a summary for SCALE.md. Not part of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileCcChain [depth [chains]]"
  */
object ProfileCcChain {
  def main(args: Array[String]): Unit = {
    val depth = args.headOption.map(_.toInt).getOrElse(64)
    val chains = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark: SparkSession = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // `chains` disjoint paths: node ids c*depth+i, edges along each path
    val chainEdges = (for {
      c <- 0 until chains
      i <- 0 until depth - 1
    } yield ((c.toLong * depth + i), (c.toLong * depth + i + 1)))
      .toDF("doc_a", "doc_b")
    // control: the near-clique shape q68 actually sees (triangles)
    val base = chains.toLong * depth + 1000
    val cliqueEdges = (for {
      t <- 0 until 2000
      (a, b) <- Seq((0, 1), (1, 2), (0, 2))
    } yield ((base + t * 3 + a), (base + t * 3 + b)))
      .toDF("doc_a", "doc_b")

    def minOf3(label: String)(f: => Unit): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label: min-of-3 ${times.min}%.2f s (all ${times.map(t => f"$t%.2f").mkString(", ")})")
      times.min
    }

    println(s"[prof] chains=$chains depth=$depth (diameter ${depth - 1}) + 2000 triangles control")
    // correctness cross-check once per shape, all three modes
    val plainLabels = ConnectedComponents
      .labels(chainEdges, maxIter = depth + 2, jumpAfter = Int.MaxValue)
      .as[(Long, Long)].collect().toMap
    val jumpLabels = ConnectedComponents
      .labels(chainEdges, maxIter = depth + 2, pointerJump = true)
      .as[(Long, Long)].collect().toMap
    val adaptiveLabels = ConnectedComponents
      .labels(chainEdges, maxIter = depth + 2)
      .as[(Long, Long)].collect().toMap
    require(plainLabels == jumpLabels, "plain and jumped labels diverge")
    require(plainLabels == adaptiveLabels, "plain and adaptive labels diverge")
    require(plainLabels.values.toSet.size == chains, "wrong component count")

    val chainPlain = minOf3(s"chain depth=$depth plain") {
      ConnectedComponents.labels(chainEdges, maxIter = depth + 2,
        jumpAfter = Int.MaxValue).count()
    }
    val chainJump = minOf3(s"chain depth=$depth pointerJump") {
      ConnectedComponents.labels(chainEdges, maxIter = depth + 2,
        pointerJump = true).count()
    }
    val chainAdaptive = minOf3(s"chain depth=$depth adaptive(default)") {
      ConnectedComponents.labels(chainEdges, maxIter = depth + 2).count()
    }
    val cliquePlain = minOf3("triangles plain") {
      ConnectedComponents.labels(cliqueEdges, jumpAfter = Int.MaxValue).count()
    }
    val cliqueJump = minOf3("triangles pointerJump") {
      ConnectedComponents.labels(cliqueEdges, pointerJump = true).count()
    }
    val cliqueAdaptive = minOf3("triangles adaptive(default)") {
      ConnectedComponents.labels(cliqueEdges).count()
    }
    println(f"[prof] SUMMARY depth=$depth: chain plain $chainPlain%.2f s vs jumped $chainJump%.2f s vs adaptive $chainAdaptive%.2f s; " +
      f"triangles plain $cliquePlain%.2f s vs jumped $cliqueJump%.2f s vs adaptive $cliqueAdaptive%.2f s")
    spark.stop()
  }
}
