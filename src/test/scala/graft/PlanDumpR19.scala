package graft

/** r19 optimization-round plan dumper: writes `.explain("formatted")`
  * output for a set of queries to plans/r19/<query>_<tag>.txt — the
  * before/after evidence files the optimization deliverable requires.
  * Not part of the library.
  *
  * Run: sbt "Test/runMain graft.PlanDumpR19 <tag> [q1,q2,...]"
  *   tag     suffix for the files (before | after)
  *   queries comma-separated SparkEntry names (default: all)
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_PLANS_OUT (default <repo>/plans/r19)
  */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "plans/r19"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        try {
          val df = fn(spark, sfDir)
          val txt = df
            .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            outDir.resolve(s"${name}_$tag.txt"), txt)
          System.err.println(s"[plandump] $name -> ${name}_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
