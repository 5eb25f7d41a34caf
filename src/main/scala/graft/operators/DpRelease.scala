package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X147 — differentially-private histogram release with discrete
  * Laplace noise (Dwork, McSherry, Nissim & Smith, TCC 2006; the
  * two-sided-geometric mechanism of Ghosh, Roughgarden & Sundararajan,
  * STOC 2009 — the UTILITY-OPTIMAL integer mechanism for counts): the
  * publishable form of a per-category count table — each count gets
  * integer noise ~ discrete Laplace(ε), so the release is ε-DP per
  * count and the true table never leaves the engine. The privacy leg
  * of the governance tier next to k-anonymity (X117), l-diversity
  * (X148) and GDPR erasure (X141).
  *
  * Determinism (the cross-engine contract, NOT the production seed):
  * noise is drawn by inverse-CDF lookup of a uniform u against 2B
  * integer thresholds PRECOMPUTED once on the driver and embedded as
  * literals in BOTH engines' expressions — the engines never evaluate
  * exp/pow themselves, so no transcendental drift can split the hash.
  * Here u is the repo's LCG seeded from the count (a deterministic
  * stand-in so the oracle can replay it); a real release draws u from
  * a secret RNG — the mechanism, thresholds, and lookup are identical.
  *
  * Scale shape: one map-side-combined groupBy to the |categories|
  * frame; the noise lookup is a literal-array filter per output row.
  */
object DpRelease {

  /** Privacy budget per released count. */
  val Eps = 0.5

  /** Noise truncation bound (±B; tail mass folded into the ends). */
  val B = 20

  /** Inverse-CDF thresholds of the truncated two-sided geometric with
    * α = e^{−ε}: entry k (k = −B+1 … B) is round(10^6 · CDF(k−1));
    * noise(u) = −B + |{k : u ≥ t_k}| for u uniform on [0, 10^6).
    */
  lazy val Thresholds: Seq[Long] = {
    val a = math.exp(-Eps)
    val ps = (-B to B).map(k => math.pow(a, math.abs(k)))
    val tot = ps.sum
    val cdf = ps.scanLeft(0.0)(_ + _).tail.map(_ / tot)
    cdf.init.map(c => math.round(c * 1000000L))
  }

  /** q188 — ε-DP per-type event-count release. */
  val q188 = GraftQuery(
    "q188_dp_release", {
      (s, d) => {
        val tArr = array(Thresholds.map(lit(_)): _*)
        t(s, d, "events")
          .groupBy(col("event_type").as("g"))
          .agg(count(lit(1)).as("n"))
          .withColumn("u",
            (col("n") % lit(1000003L) * lit(8121L) + lit(28411L))
              % lit(1000000L))
          .withColumn("noise",
            lit(-B) + size(filter(tArr, th => col("u") >= th)))
          .select(col("g"),
            (col("n") + col("noise")).as("noisy_count"),
            lit(Eps).as("epsilon"))
          .orderBy(col("g"))
      }
    },
    Some(s"""
      WITH counts AS (
        SELECT event_type AS g, COUNT(*) AS n
        FROM events GROUP BY 1),
      seeded AS (
        SELECT g, n,
               ((n % 1000003) * 8121 + 28411) % 1000000 AS u
        FROM counts),
      noised AS (
        SELECT g, n,
               -$B + len(list_filter([${Thresholds.mkString(", ")}],
                 th -> u >= th)) AS noise
        FROM seeded)
      SELECT g, CAST(n + noise AS BIGINT) AS noisy_count,
             CAST($Eps AS DOUBLE) AS epsilon
      FROM noised ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q188)
}
