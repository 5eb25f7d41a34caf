package graft

/** One-off adjudicator for q171's sf1→sf10 decade step: prints the
  * executed join strategy at both scales — the hypothesis is a
  * broadcast→SMJ transition when the customer dimension crosses the
  * adaptive broadcast threshold, i.e. a one-time plan step, not a
  * super-linear face. Not part of the library.
  */
object ProfileQ171Plan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Seq("sf1" -> s"${sys.props("java.io.tmpdir")}/graft-sfx1-rel",
      "sf10" -> s"${sys.props("java.io.tmpdir")}/graft-sfx10-rel")
      .foreach { case (label, dir) =>
        val df = graft.operators.TargetEncoding.q171.build(spark, dir)
        df.groupBy().count().collect()
        val plan = df.queryExecution.executedPlan.toString
        val joins = plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .map(_.trim.take(100)).mkString("\n  ")
        println(s"[q171plan] $label:\n  $joins")
      }
    spark.stop()
  }
}
