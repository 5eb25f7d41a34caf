package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** One-off r19 probe: how much of the q270–q281 exchange census is
  * ReusedExchange (planner-deduped) vs genuinely re-executed subtrees.
  * Not part of the library.
  */
object ProfileReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def deepAll(p: org.apache.spark.sql.execution.SparkPlan,
        stopAtReuse: Boolean)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      p +: (p match {
        case a: AdaptiveSparkPlanExec => deepAll(a.executedPlan, stopAtReuse)
        case q: QueryStageExec => deepAll(q.plan, stopAtReuse)
        case r: ReusedExchangeExec =>
          if (stopAtReuse) Nil else deepAll(r.child, stopAtReuse)
        case other => other.children.flatMap(deepAll(_, stopAtReuse))
      })
    }
    val qs = Seq(graft.operators.Levene.q270,
      graft.operators.MoodMedian.q271,
      graft.operators.DunnPosthoc.q272,
      graft.operators.LogRank.q273,
      graft.operators.Kpss.q274,
      graft.operators.DunningKeyness.q277,
      graft.operators.AndersonDarling.q278)
    for (q <- qs) {
      val df = q.build(spark, d)
      df.collect()
      val plan = df.asInstanceOf[ClassicDataset[_]]
        .queryExecution.executedPlan
      val withReuse = deepAll(plan, stopAtReuse = false)
        .map(_.getClass.getSimpleName)
      val noReuse = deepAll(plan, stopAtReuse = true)
        .map(_.getClass.getSimpleName)
      def c(ns: Seq[String], s: String) = ns.count(_.contains(s))
      println(s"[reuse] ${q.name}: executedShuffles=" +
        s"${c(noReuse, "ShuffleExchange")} " +
        s"countedWithReuse=${c(withReuse, "ShuffleExchange")} " +
        s"reusedNodes=${c(withReuse, "ReusedExchange")} " +
        s"scans=${c(noReuse, "FileSourceScan") + c(noReuse, "BatchScan")}")
    }
    spark.stop()
  }
}
