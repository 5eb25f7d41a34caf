package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import Q._

/** X156 — shard-rebalance audit: rendezvous (HRW) hashing vs modulo
  * (Thaler & Ravishankar, "Using name-based mappings to increase hit
  * rates", IEEE/ACM ToN 6(1) 1998 — the argmax form of consistent
  * hashing, Karger et al. STOC'97): when a sharded 100 TB corpus grows
  * from N to N+1 shards, how many rows MOVE under each placement
  * policy — the capacity-planning number for any resharding rewrite
  * (mod-hash moves ≈ N/(N+1) of the corpus — a full rewrite; HRW moves
  * only the keys whose argmax IS the new shard, ≈ 1/(N+1) — and the
  * audit also reports the new layout's load spread, the reason mod
  * survives at all: its balance is perfect by construction, HRW's is
  * only hash-uniform).
  *
  * Shape: NOTHING shuffles for the assignment — the per-shard scores
  * h(key‖s) and their argmax unroll to a FIXED CASE/greatest
  * expression tree over N+1 md5 calls (shard counts are config, not
  * data), evaluated inside whole-stage codegen on the scan; the audit
  * is then two map-side-combined aggregates to one row each plus a
  * |shards|-row load frame. Determinism: scores are the h60 60-bit
  * integers (the X75 idiom), argmax ties break to the LOWEST shard by
  * CASE order — identical in both engines.
  */
object ShardRebalance {

  /** Shard count before / after the grow. */
  val OldShards = 8
  val NewShards = 9

  /** 60-bit HRW score of key column `k` on shard `s`. */
  private def score(k: Column, s: Int): Column =
    expr(s"cast(conv(substring(md5(concat(cast(${k.toString()} as string), " +
      s"':', '$s')), 1, 15), 16, 10) as bigint)")

  private def scoreSql(k: String, s: Int): String =
    s"CAST('0x' || substr(md5(concat(CAST($k AS VARCHAR), ':', '$s')), " +
      "1, 15) AS BIGINT)"

  /** Unrolled HRW argmax over shards 0..n-1 (ties → lowest shard). */
  private def hrw(n: Int): Column = {
    val scores = (0 until n).map(s => col(s"h$s"))
    (0 until n).foldRight(lit(-1): Column) { (s, els) =>
      val isMax = (0 until n).filter(_ != s)
        .map(o => scores(s) >= scores(o))
        .foldLeft(lit(true): Column)(_ && _)
      when(isMax, lit(s)).otherwise(els)
    }
  }

  private def hrwSql(n: Int): String =
    (0 until n).map { s =>
      val cond = (0 until n).filter(_ != s)
        .map(o => s"h$s >= h$o").mkString(" AND ")
      s"WHEN $cond THEN $s"
    }.mkString("CASE ", " ", " ELSE -1 END")

  /** q197 — rows moved and load spread when 8 shards grow to 9,
    * rendezvous vs modulo placement.
    */
  val q197 = GraftQuery(
    "q197_shard_rebalance", {
      (s, d) => {
        val keys = t(s, d, "documents").select(col("doc_id"))
        val scored = (0 until NewShards).foldLeft(keys) { (df, sh) =>
          df.withColumn(s"h$sh", score(col("doc_id"), sh))
        }
        val assigned = scored
          .withColumn("hrw_old", hrw(OldShards))
          .withColumn("hrw_new", hrw(NewShards))
          .withColumn("mod_old", pmod(col("h0"), lit(OldShards.toLong)))
          .withColumn("mod_new", pmod(col("h0"), lit(NewShards.toLong)))
        def audit(oldC: String, newC: String, name: String) = {
          val loads = assigned.groupBy(col(newC).as("shard"))
            .agg(count(lit(1)).as("load"))
            .agg(max(col("load")).as("new_max_load"),
              min(col("load")).as("new_min_load"))
          assigned.agg(count(lit(1)).as("n_keys"),
            sum(when(col(oldC) =!= col(newC), 1L).otherwise(0L))
              .as("moved"))
            .withColumn("strategy", lit(name))
            .join(broadcast(loads))
        }
        audit("hrw_old", "hrw_new", "hrw")
          .unionByName(audit("mod_old", "mod_new", "mod"))
          .withColumn("move_micro", expr("moved * 1000000 div n_keys"))
          .select(col("strategy"), col("n_keys"), col("moved"),
            col("move_micro"), col("new_max_load"), col("new_min_load"))
          .orderBy(col("strategy"))
      }
    },
    Some {
      val scores = (0 until NewShards)
        .map(s => s"${scoreSql("doc_id", s)} AS h$s").mkString(", ")
      s"""
      WITH scored AS (
        SELECT doc_id, $scores FROM documents),
      assigned AS (
        SELECT doc_id,
               ${hrwSql(OldShards)} AS hrw_old,
               ${hrwSql(NewShards)} AS hrw_new,
               h0 % $OldShards AS mod_old,
               h0 % $NewShards AS mod_new
        FROM scored),
      hrw_loads AS (
        SELECT MAX(load) AS new_max_load, MIN(load) AS new_min_load
        FROM (SELECT hrw_new, COUNT(*) AS load FROM assigned
              GROUP BY 1) t),
      mod_loads AS (
        SELECT MAX(load) AS new_max_load, MIN(load) AS new_min_load
        FROM (SELECT mod_new, COUNT(*) AS load FROM assigned
              GROUP BY 1) t),
      audits AS (
        SELECT 'hrw' AS strategy, COUNT(*) AS n_keys,
               CAST(SUM(CASE WHEN hrw_old <> hrw_new THEN 1 ELSE 0 END)
                 AS BIGINT) AS moved,
               (SELECT new_max_load FROM hrw_loads) AS new_max_load,
               (SELECT new_min_load FROM hrw_loads) AS new_min_load
        FROM assigned
        UNION ALL
        SELECT 'mod', COUNT(*),
               CAST(SUM(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
                 AS BIGINT),
               (SELECT new_max_load FROM mod_loads),
               (SELECT new_min_load FROM mod_loads)
        FROM assigned)
      SELECT strategy, n_keys, moved,
             moved * 1000000 // n_keys AS move_micro,
             new_max_load, new_min_load
      FROM audits
      ORDER BY strategy
    """
    })

  val all: Seq[GraftQuery] = Seq(q197)
}
