package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Checkpoints.EagerCheckpoint

/** Connected components over a pair list — the step a production dedup
  * pipeline needs AFTER near-dup pair mining (q42/q43/q44/q54): pairs
  * are not a dedup decision until transitively closed (A~B, B~C must
  * collapse to ONE kept doc even when A~C was never emitted as a pair).
  *
  * Algorithm: min-label propagation to a fixpoint. Each iteration is
  * one shuffle of (id, comp) longs joined to the (symmetrized) edge
  * list — never document payloads — so per-iteration cost at 100 TB is
  * ∝ |edges|, and the iteration count is the cluster diameter, which
  * for near-dup text clusters is small (dups of a doc are dups of each
  * other, so components are near-cliques; diameters in the low single
  * digits). `localCheckpoint` truncates lineage each round, keeping the
  * plan O(1) instead of O(iterations). For graphs with genuinely long
  * chains, pointer jumping (label(label(id)), the shortcut behind the
  * two-phase variants of Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) converges in O(log d) rounds at one
  * extra (id, comp)-longs shuffle per round. Measured on this box
  * (ProfileCcChain, local[32], min-of-3): diameter 255 → 33.3 s plain
  * vs 3.5 s jumped (9.4×), diameter 63 → 5.6×, diameter 15 → 1.4×;
  * near-clique triangles → jumped is 1.2-1.7× SLOWER. Hence the
  * ADAPTIVE default: plain rounds first (cliques converge in 2-3 and
  * never pay the extra join), and jumping switches on automatically at
  * `jumpAfter` unconverged rounds, capping any adversarial chain at
  * O(jumpAfter + log d) rounds instead of O(d).
  *
  * No reference counterpart (the reference has no dedup at all —
  * SURVEY §2.8 X15 extension).
  */
object ConnectedComponents {

  /** Label every node reachable from `pairs` (columns `a`, `b`) with
    * the minimum node id of its component. Returns (id, comp).
    *
    * @param maxIter hard cap; a `require` fires if the fixpoint is not
    *                reached, rather than returning wrong labels.
    * @param pointerJump force the label(label(id)) shortcut join from
    *                round 0 — O(log d) rounds instead of O(d) at one
    *                extra (id, comp)-longs shuffle per round. Only
    *                worth forcing when the graph is KNOWN long-chained;
    *                otherwise leave the adaptive default.
    * @param jumpAfter enable pointer jumping automatically once this
    *                many rounds have run without converging. Near-dup
    *                clusters are near-cliques (diameter ~2-3) and
    *                converge before the threshold, paying nothing; the
    *                measured chain crossover is diameter ~15 (see
    *                scaladoc above), so 8 plain rounds bound the
    *                wasted-work region while deep chains still finish
    *                in O(log d). `Int.MaxValue` disables.
    */
  def labels(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b",
      maxIter: Int = 20, pointerJump: Boolean = false,
      jumpAfter: Int = 8): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .union(pairs.select(col(b).as("src"), col(a).as("dst")))
      .eagerCheckpoint()
    var comp = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .eagerCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate labels: own label ∪ every neighbor's label, keep min.
      // The previous label rides along through the aggregation (each id
      // contributes exactly one non-null prev), so convergence is read
      // off the SAME materialized result — one shuffle job per iteration
      // plus a block-local count, instead of a separate join+isEmpty job.
      val propagated = edges.join(comp, edges("src") === comp("id"))
        .select(col("dst").as("id"), col("comp").as("cand"),
          lit(null).cast("long").as("prev"))
        .union(comp.select(col("id"), col("comp").as("cand"),
          col("comp").as("prev")))
        .groupBy(col("id"))
        .agg(min(col("cand")).as("comp"), max(col("prev")).as("prev"))
      val jumpNow = pointerJump || iter >= jumpAfter
      val next = (if (!jumpNow) propagated
      else {
        // label(id) := label(label(id)): comp values are node ids, and
        // every node has a row, so the self-join is total; jumping
        // halves the remaining distance to the component minimum
        val mapping = propagated
          .select(col("id").as("comp"), col("comp").as("jumped"))
        propagated.join(mapping, "comp")
          .select(col("id"), col("jumped").as("comp"), col("prev"))
      }).eagerCheckpoint()
      converged = next.filter(col("comp") =!= col("prev")).isEmpty
      comp = next.select(col("id"), col("comp"))
      iter += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter iterations")
    comp
  }
}
