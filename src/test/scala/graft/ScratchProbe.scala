package graft

import scala.collection.mutable.ArrayBuffer

/** Throwaway probe (not committed): execute one query under a stage
  * listener and print, per stage: task count, summed task runtime,
  * max single task runtime, and wall hints — the "is this face
  * serialized onto one task" detector.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    case class St(id: Int, n: Int, sumMs: Long, maxMs: Long, nm: String)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = e.stageInfo
          val sum = si.taskMetrics.executorRunTime
          stages.synchronized {
            stages += St(si.stageId, si.numTasks, sum, -1,
              si.name.take(60))
          }
        }
      })
    for (name <- args(0).split(",")) {
      val fn = SparkEntry.queries.find(_._1 == name).get._2
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      // warm once, then measure
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      stages.synchronized(stages.clear())
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[probe] $name warm noop secs: $wall%.3f")
      stages.synchronized {
        stages.sortBy(-_.sumMs).take(8).foreach { s =>
          println(f"[stage] id=${s.id}%4d tasks=${s.n}%3d " +
            f"sumTaskMs=${s.sumMs}%7d")
        }
      }
    }
    spark.stop()
  }
}
