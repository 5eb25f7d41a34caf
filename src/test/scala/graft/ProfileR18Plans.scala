package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** r18 probe (the ProfileR17Plans pattern): exchange / codegen census
  * of the r18 queries at sf0.001, used to pin the PlanSpec shape
  * assertions to MEASURED counts. Not part of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileR18Plans"
  */
object ProfileR18Plans {
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
    val qs = Seq(graft.operators.KendallTau.q246,
      graft.operators.KruskalWallis.q247,
      graft.operators.RunsTest.q248,
      graft.operators.McNemar.q249,
      graft.operators.CliffsDelta.q250,
      graft.operators.JsDivergence.q251,
      graft.operators.CramersV.q252,
      graft.operators.Chao1Richness.q253,
      graft.operators.DiversityIndex.q254,
      graft.operators.TheilsU.q255,
      graft.operators.TopkTurnover.q256)
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
