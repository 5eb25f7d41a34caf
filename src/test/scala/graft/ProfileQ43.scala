package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashDedup

/** Throwaway profiling harness for q43 — not part of the library. */
object ProfileQ43 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time("warmup: docs.count")(docs.count())
    println(s"[prof] docs partitions = ${docs.rdd.getNumPartitions}")
    time("a: normalize+split only") {
      docs.select(col("doc_id"),
        split(graft.functions.MockScorers.normalize(col("text")), " ")
          .as("words")).filter(size(col("words")) >= 3)
        .agg(sum(size(col("words")))).collect()
    }
    time("b: + explode transform (no distinct)") {
      docs.select(col("doc_id"),
        split(graft.functions.MockScorers.normalize(col("text")), " ")
          .as("words")).filter(size(col("words")) >= 3)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(words) - 2), " +
            "i -> concat_ws(' ', words[i-1], words[i], words[i+1]))"))
          .as("shingle")).count()
    }
    time("c: + distinct") {
      MinHashDedup.shingles(docs).count()
    }

    // mirror nearDuplicates stages with eager materialization at each step
    val threshold = 0.5
    val sh = time("1 shingles localCheckpoint") {
      MinHashDedup.shingles(docs).localCheckpoint()
    }
    val sigTable = time("2 signatures localCheckpoint") {
      MinHashDedup.signatures(sh).localCheckpoint()
    }
    val sizesBySig = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val sigs = sigTable
      .withColumn("sig",
        array((0 until MinHashDedup.NumHashes)
          .map(i => col(s"sig_$i").cast("int")): _*))
      .select(col("doc_id"), col("sig"))
      .join(sizesBySig, "doc_id")
    val cand = time("3 candidates (band join + prefilter + distinct)") {
      val c = MinHashDedup.candidateStage(sigTable, sigs, threshold)
        .localCheckpoint()
      println(s"[prof]   cand pairs = ${c.count()}")
      c
    }
    val sets = time("4 shingle sets collect_set") {
      val s = sh.groupBy(col("doc_id"))
        .agg(collect_set(col("shingle")).as("shset")).localCheckpoint()
      s
    }
    time("5 verify join + jaccard") {
      val v = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a")),
          "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b")),
          "doc_b")
        .withColumn("n_inter",
          size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard",
          round(col("n_inter").cast("double") /
            (size(col("set_a")) + size(col("set_b")) - col("n_inter")), 4))
        .filter(col("jaccard") >= threshold)
        .count()
      println(s"[prof]   verified pairs = $v")
    }
    time("full nearDuplicates (should now be warm-ish)") {
      MinHashDedup.nearDuplicates(docs, threshold).count()
    }
    spark.stop()
  }
}
