package graft

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** r19 optimization-round census: for EVERY registered query, execute
  * once at a small SF and report the executed plan's operator census —
  * genuinely re-executed shuffles vs planner-reused ones, file scans,
  * single-partition windows/sorts, and wall seconds — so optimization
  * targets are ranked by measurement, not guesswork. Not part of the
  * library.
  *
  * Run: sbt "Test/runMain graft.ProfileR19Opt [sfDir] [q1,q2,...]"
  * (default sf0.001, all queries). One TSV line per query on stdout:
  * name, secs, executed shuffles, shuffles-with-reuse, reused nodes,
  * executed scans, broadcast exchanges, single-partition windows,
  * global sorts, rows.
  */
object ProfileR19Opt {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
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
    println("query\tsecs\texec_shuf\tshuf_incl_reuse\treused\tscans" +
      "\tbcast\tglobal_win\tglobal_sort\trows")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        try {
          val t0 = System.nanoTime()
          val df = fn(spark, d)
          val agg = df.groupBy().count()
          val rows = agg.collect()(0).getLong(0)
          val secs = (System.nanoTime() - t0) / 1e9
          val plan = agg.asInstanceOf[ClassicDataset[_]]
            .queryExecution.executedPlan
          val all = deepAll(plan, stopAtReuse = false)
          val noReuse = deepAll(plan, stopAtReuse = true)
          def c(ps: Seq[org.apache.spark.sql.execution.SparkPlan],
              s: String) = ps.count(_.getClass.getSimpleName.contains(s))
          // single-partition (unpartitioned) windows and global sorts:
          // the textbook 100 TB scale-killers (guide §2) — detected from
          // the node STRING (SinglePartition distribution prints in the
          // window/sort's required ordering only via partition spec), so
          // approximate via Window/Sort whose string lacks
          // "hashpartitioning"/"rangepartitioning" in its own Exchange
          // child; simpler robust proxy: count Window nodes with empty
          // partitionSpec and Sort nodes with global=true.
          val globalWin = noReuse.count {
            case w: org.apache.spark.sql.execution.window.WindowExec =>
              w.partitionSpec.isEmpty
            case _ => false
          }
          val globalSort = noReuse.count {
            case s: org.apache.spark.sql.execution.SortExec => s.global
            case _ => false
          }
          println(f"$name\t$secs%.3f\t${c(noReuse, "ShuffleExchange")}" +
            f"\t${c(all, "ShuffleExchange")}\t${c(all, "ReusedExchange")}" +
            f"\t${c(noReuse, "FileSourceScan") + c(noReuse, "BatchScan")}" +
            f"\t${c(noReuse, "BroadcastExchange")}\t$globalWin" +
            f"\t$globalSort\t$rows")
        } catch { case e: Throwable =>
          println(s"$name\tFAILED\t${e.getMessage}")
        }
      }
    spark.stop()
  }
}
