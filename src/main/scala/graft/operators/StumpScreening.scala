package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X177 — decision-stump feature screening with exact-count Gini
  * (Breiman et al., CART 1984; the one-level special case): for each
  * candidate numeric feature and each of [[Bins]] − 1 equi-width cut
  * points, the exact left/right class counts and the weighted child
  * Gini impurity — "can any single threshold on any column separate
  * this label at all?", the feature-screening pass a training
  * pipeline runs before paying for a full tree/GBM fit, and the
  * supervised companion to X34's unsupervised column profile.
  *
  * The binned-prefix trick makes ALL cuts one aggregation: rows map
  * to bin = ⌊(v − min)·B/(max − min)⌋ (capped at B−1), the
  * (feature, bin, label) census is map-side-combined to ≤ |features|
  * ·B·2 cells, and every cut's (n_l, pos_l) is a prefix sum over
  * bins of that DIMENSION frame — the fact table is scanned once,
  * never once per cut. Counts are exact longs; the impurity is ONE
  * fixed double tree per row (squares fit longs; IEEE ×,÷ correctly
  * rounded ⇒ identical bits across engines — the X126 discipline);
  * ranking is the total (gini asc, bin) order per feature.
  *
  * Scale shape: one min/max agg (1-row broadcast) + one scan into a
  * map-side census + windows on the ≤ 64-row dimension frame.
  * Degenerate cuts (an empty side) are excluded — stated, since an
  * empty side's impurity term is 0/0.
  */
object StumpScreening {

  /** Equi-width bins per feature (B − 1 interior cuts). */
  val Bins = 16

  /** Candidate features over lineitem, and the binary label. */
  val Features = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")
  val LabelCol = "l_returnflag"
  val LabelPos = "R"

  private def dd(c: Column): Column = c.cast("double")

  /** The screening frame over a lineitem-shaped input. */
  def screen(li: DataFrame): DataFrame = {
        val stats = li.agg(
          Features.flatMap(f => Seq(min(col(f)).as(s"min_$f"),
            max(col(f)).as(s"max_$f"))).head,
          Features.flatMap(f => Seq(min(col(f)).as(s"min_$f"),
            max(col(f)).as(s"max_$f"))).tail: _*)
        val binned = li.select(
          ((col(LabelCol) === LabelPos).as("pos") +:
            Features.map(f => col(f))): _*)
          .crossJoin(broadcast(stats))
        val perFeature = Features.map { f =>
          binned.select(lit(f).as("feature"),
            // constant feature (max == min): every row to bin 0, which
            // the all-left-cut filter then excludes — no valid cut
            when(col(s"max_$f") > col(s"min_$f"),
              least(lit((Bins - 1).toLong),
                floor((col(f) - col(s"min_$f")) * lit(Bins) /
                  (col(s"max_$f") - col(s"min_$f"))).cast("long")))
              .otherwise(lit(0L))
              .as("bin"),
            col("pos"),
            col(s"min_$f").as("fmin"), col(s"max_$f").as("fmax"))
        }.reduce(_ unionByName _)
        val census = perFeature
          .groupBy(col("feature"), col("bin"), col("fmin"), col("fmax"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("p"))
        val wPre = Window.partitionBy(col("feature")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("feature"))
        val cuts = census
          .withColumn("n_left", sum(col("n")).over(wPre))
          .withColumn("pos_left", sum(col("p")).over(wPre))
          .withColumn("n_all", sum(col("n")).over(wAll))
          .withColumn("pos_all", sum(col("p")).over(wAll))
          .withColumn("n_right", col("n_all") - col("n_left"))
          .withColumn("pos_right", col("pos_all") - col("pos_left"))
          .filter(col("n_left") > 0 && col("n_right") > 0)
        val negL = col("n_left") - col("pos_left")
        val negR = col("n_right") - col("pos_right")
        val gini =
          ((dd(col("n_left")) -
            dd(col("pos_left") * col("pos_left") + negL * negL) /
              dd(col("n_left"))) +
            (dd(col("n_right")) -
              dd(col("pos_right") * col("pos_right") + negR * negR) /
                dd(col("n_right")))) / dd(col("n_all"))
        cuts
          .withColumn("cut_value",
            dd(col("fmin")) + dd(col("bin") + 1) *
              (dd(col("fmax")) - dd(col("fmin"))) / lit(Bins.toDouble))
          .withColumn("gini_children", gini)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("feature"))
              .orderBy(col("gini_children"), col("bin"))))
          .select(col("feature"), col("bin"), col("cut_value"),
            col("n_left"), col("pos_left"), col("n_right"),
            col("pos_right"), col("gini_children"), col("rk"))
          .orderBy(col("feature"), col("bin"))
  }

  /** q215 — per (feature, cut): exact split counts + child Gini. */
  val q215 = GraftQuery(
    "q215_stump_screening",
    (s, d) => screen(t(s, d, "lineitem")),
    Some {
      val featArms = Features.map { f =>
        s"""
        SELECT '$f' AS feature,
               CASE WHEN max_$f > min_$f THEN LEAST(${Bins - 1},
                 CAST(FLOOR(($f - min_$f) * $Bins / (max_$f - min_$f))
                   AS BIGINT)) ELSE 0 END AS bin,
               ($LabelCol = '$LabelPos') AS pos,
               min_$f AS fmin, max_$f AS fmax
        FROM lineitem, stats"""
      }.mkString(" UNION ALL ")
      s"""
      WITH stats AS (
        SELECT ${Features.map(f =>
          s"MIN($f) AS min_$f, MAX($f) AS max_$f").mkString(", ")}
        FROM lineitem),
      binned AS ($featArms),
      census AS (
        SELECT feature, bin, fmin, fmax, COUNT(*) AS n,
               CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM binned GROUP BY feature, bin, fmin, fmax),
      cuts AS (
        SELECT feature, bin, fmin, fmax,
               CAST(SUM(n) OVER (PARTITION BY feature ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_left,
               CAST(SUM(p) OVER (PARTITION BY feature ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS pos_left,
               CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT)
                 AS n_all,
               CAST(SUM(p) OVER (PARTITION BY feature) AS BIGINT)
                 AS pos_all
        FROM census),
      scored AS (
        SELECT feature, bin, fmin, fmax, n_left, pos_left,
               n_all - n_left AS n_right,
               pos_all - pos_left AS pos_right, n_all,
               ((CAST(n_left AS DOUBLE) -
                 CAST(pos_left * pos_left +
                   (n_left - pos_left) * (n_left - pos_left) AS DOUBLE)
                   / CAST(n_left AS DOUBLE)) +
                (CAST(n_all - n_left AS DOUBLE) -
                 CAST((pos_all - pos_left) * (pos_all - pos_left) +
                   ((n_all - n_left) - (pos_all - pos_left)) *
                   ((n_all - n_left) - (pos_all - pos_left)) AS DOUBLE)
                   / CAST(n_all - n_left AS DOUBLE)))
                 / CAST(n_all AS DOUBLE) AS gini_children
        FROM cuts
        WHERE n_left > 0 AND n_all - n_left > 0)
      SELECT feature, bin,
             CAST(fmin AS DOUBLE) + CAST(bin + 1 AS DOUBLE) *
               (CAST(fmax AS DOUBLE) - CAST(fmin AS DOUBLE)) /
               CAST($Bins AS DOUBLE) AS cut_value,
             n_left, pos_left, n_right, pos_right, gini_children,
             CAST(ROW_NUMBER() OVER (PARTITION BY feature
               ORDER BY gini_children, bin) AS INTEGER) AS rk
      FROM scored
      ORDER BY feature, bin
    """
    })

  val all: Seq[GraftQuery] = Seq(q215)
}
