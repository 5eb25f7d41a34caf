package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SeasonalNaive]] (X164) oracles: a perfectly daily-periodic
  * planted series (seasonal MAE exactly 0, ratio 0) vs an alternating
  * one where the season is a LIE (ratio ≥ 1 — seasonal lag 24 = lag
  * even steps back, same error as naive), a short-series NULL
  * contract, and sf0.001 ≡ a literal driver replay of the exact sums.
  */
class SeasonalNaiveSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(series: Map[String, Seq[Int]])
      : Map[String, (Long, Long, Long, Option[Long], Option[Long],
        Option[Double])] = {
    val rows = series.toSeq.flatMap { case (g, counts) =>
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map { i =>
          (math.abs(g.hashCode).toLong * 1000000 + h * 1000 + i,
            Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d " +
              f"${h % 24}%02d:00:01"), g)
        }
      }
    }
    val dir = tmpDir("seasonal")
    rows.toDF("event_id", "ts", "event_type")
      .selectExpr("event_id", "ts", "event_id as user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SeasonalNaive.q204.build(spark, dir).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("n1"), r.getAs[Long]("ns"),
        Option(r.getAs[Any]("sae1")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("saes")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("mase_ratio")).map(_.asInstanceOf[Double])))
    }.toMap
  }

  test("perfect daily cycle: seasonal error exactly 0, ratio 0; " +
      "drifting series: the season is a LIE (ratio exactly 24); " +
      "short series: no seasonal pairs, NULL ratio") {
    val cycle = Seq(1, 5, 2, 9, 3, 7) ++ Seq.fill(18)(4)
    val out = run(Map(
      "daily" -> (cycle ++ cycle ++ cycle),
      // x_t = t: naive MAE 1, seasonal MAE 24 — yesterday-same-hour is
      // the WORST predictor of a pure drift
      "drift" -> (1 to 48),
      "short" -> Seq(3, 4, 5)))
    val (nhD, n1D, nsD, sae1D, saesD, ratioD) = out("daily")
    assert(nhD === 72L && n1D === 71L && nsD === 48L)
    assert(saesD === Some(0L) && ratioD === Some(0.0))
    assert(sae1D.get > 0L)
    val (_, n1R, nsR, sae1R, saesR, ratioR) = out("drift")
    assert(n1R === 47L && sae1R === Some(47L))
    assert(nsR === 24L && saesR === Some(24L * 24))
    assert(ratioR === Some(24.0))
    val (nhS, n1S, nsS, sae1S, saesS, ratioS) = out("short")
    assert(nhS === 3L && nsS === 0L)
    assert(saesS === None && ratioS === None)
    assert(sae1S === Some(2L) && n1S === 2L)
  }

  test("q204 at sf0.001 == literal driver replay of the exact sums") {
    val hourly = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "date_trunc('hour', ts) as h").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, h), x) => (g, h, x) }
    val expected = hourly.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.sortBy(_._2.getTime).map(_._3)
      val n = xs.length.toLong
      def sae(lagN: Int): (Long, Option[Long]) =
        if (xs.length <= lagN) (0L, None)
        else {
          val pairs = xs.drop(lagN).zip(xs.dropRight(lagN))
          (pairs.length.toLong,
            Some(pairs.map { case (a, b) => math.abs(a - b) }.sum))
        }
      val (n1, sae1) = sae(1)
      val (ns, saes) = sae(SeasonalNaive.Season)
      val ratio = (sae1, saes) match {
        case (Some(s1), Some(ss)) if ns > 0 && s1 > 0 =>
          Some((ss.toDouble / ns.toDouble) / (s1.toDouble / n1.toDouble))
        case _ => None
      }
      g -> ((n, n1, ns, sae1, saes, ratio))
    }
    val got = SeasonalNaive.q204.build(spark, sf0001).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("n1"), r.getAs[Long]("ns"),
        Option(r.getAs[Any]("sae1")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("saes")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("mase_ratio")).map(_.asInstanceOf[Double])))
    }.toMap
    assert(got === expected.toMap)
  }
}
