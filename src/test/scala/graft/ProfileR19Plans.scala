package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** r18 probe (the ProfileR17Plans pattern): exchange / codegen census
  * of the r18 queries at sf0.001, used to pin the PlanSpec shape
  * assertions to MEASURED counts. Not part of the library.
  *
  * Run: sbt "Test/runMain graft.ProfileR19Plans"
  */
object ProfileR19Plans {
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
    val qs = Seq(graft.operators.CochranQ.q258,
      graft.operators.FleissKappa.q259,
      graft.operators.CochranArmitage.q260,
      graft.operators.MantelHaenszel.q261,
      graft.operators.HellingerDrift.q262,
      graft.operators.CaptureRecapture.q263,
      graft.operators.SeasonalIndex.q264,
      graft.operators.FriedmanTest.q265,
      graft.operators.PageTrend.q266,
      graft.operators.KendallW.q267,
      graft.operators.JonckheereTerpstra.q268,
      graft.operators.CramerVonMises.q269,
      graft.operators.Levene.q270,
      graft.operators.MoodMedian.q271,
      graft.operators.DunnPosthoc.q272,
      graft.operators.LogRank.q273,
      graft.operators.Kpss.q274,
      graft.operators.HurstExponent.q275,
      graft.operators.DurbinWatson.q276,
      graft.operators.DunningKeyness.q277,
      graft.operators.AndersonDarling.q278,
      graft.operators.CronbachAlpha.q279,
      graft.operators.BowkerSymmetry.q280,
      graft.operators.WilsonInterval.q281,
      graft.operators.JarqueBera.q282,
      graft.operators.Bartlett.q283,
      graft.operators.BreslowDay.q284,
      graft.operators.TukeyHsd.q285,
      graft.operators.AnsariBradley.q286,
      graft.operators.KaplanMeier.q287,
      graft.operators.MarkovEntropy.q288,
      graft.operators.KuiperTest.q289,
      graft.operators.BrunnerMunzel.q290,
      graft.operators.WelchAnova.q291)
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
