package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** r17 throwaway-style probe (committed like its Profile siblings):
  * exchange / codegen census of the r17 queries at sf0.001, used to
  * pin the PlanSpec shape assertions to MEASURED counts. Not part of
  * the library.
  */
object ProfileR17Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def deep(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      p +: (p match {
        case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
        case q: QueryStageExec => deep(q.plan)
        case r: ReusedExchangeExec => deep(r.child)
        case other => other.children.flatMap(deep)
      })
    }
    val qs = Seq(graft.operators.LjungBox.q233,
      graft.operators.HaarEnergy.q234,
      graft.operators.PhoneticBlocking.q235,
      graft.operators.HazardTable.q236,
      graft.operators.MannKendall.q237,
      graft.operators.DowAnova.q238,
      graft.operators.TokenBurstiness.q239,
      graft.operators.AspectComention.q240,
      graft.operators.TrimmedMean.q241,
      graft.operators.MarketBasket.q242,
      graft.operators.MarkovBacktest.q243)
    for (q <- qs) {
      val df = q.build(spark, d)
      df.collect()
      val nodes = deep(df.asInstanceOf[ClassicDataset[_]]
        .queryExecution.executedPlan)
      val names = nodes.map(_.getClass.getSimpleName)
      val shuffles = names.count(_.contains("ShuffleExchange"))
      val bcasts = names.count(_.contains("BroadcastExchange"))
      val wsc = names.count(_.contains("WholeStageCodegen"))
      val udfs = names.count(_.toLowerCase.contains("python"))
      println(s"[plan] ${q.name}: shuffle=$shuffles broadcast=$bcasts " +
        s"wholeStageCodegen=$wsc python=$udfs")
    }
    spark.stop()
  }
}
