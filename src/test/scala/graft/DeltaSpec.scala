package graft

import java.sql.Date
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential test for the price-delta scan-back: the reference's
  * while-loop (ProdMetricsV6.scala:75-110) executed verbatim on crafted
  * and randomized per-key histories vs graft's change-flag-window
  * implementation (Analytics.priceDeltas). */
class DeltaSpec extends SparkSpec {

  /** The reference loop, verbatim semantics. Returns
    * (delta, relativeChange, lastChange, lastChangeDte, prvPrice). */
  private def refScanBack(hist: Seq[(Date, Long, Double)]): (Double, Double, Double, Date, Double) = {
    val sorted = hist.sortBy { case (d, k, _) => (d.getTime, k) }.reverse
    val currentPrice = sorted.head._3
    if (sorted.length == 1) (0.0, 0.0, 0.0, sorted.head._1, 0.0)
    else {
      val previousPrice = sorted(1)._3
      var lChangeDte = sorted.head._1
      var prevPrices = sorted.tail
      while (currentPrice == prevPrices.head._3 && prevPrices.tail.nonEmpty) {
        lChangeDte = prevPrices.head._1
        prevPrices = prevPrices.tail
      }
      val prvPrice = prevPrices.head._3
      val rawLast = (currentPrice - prvPrice) / prvPrice
      val lastChange = if (rawLast.isNaN || rawLast.isInfinity) 0.0 else rawLast * 100
      val delta = currentPrice - previousPrice
      val rawRel = delta / previousPrice
      val relativeChange = if (rawRel.isNaN || rawRel.isInfinity) 0.0 else rawRel * 100
      (delta, relativeChange, lastChange, lChangeDte, prvPrice)
    }
  }

  test("priceDeltas scan-back ≡ reference loop (ProdMetricsV6.scala:75-110)") {
    import spark.implicits._
    val rnd = new Random(11)
    val d = (i: Int) => Date.valueOf(f"2024-01-${i + 1}%02d")
    // crafted: single row, two equal, two different, equal-run-then-
    // change, all-equal, zero previous price
    val crafted: Seq[(Long, Date, Long, Double)] = Seq(
      (1L, d(0), 10L, 5.0),
      (2L, d(0), 20L, 7.0), (2L, d(1), 21L, 7.0),
      (3L, d(0), 30L, 7.0), (3L, d(1), 31L, 9.0),
      (4L, d(0), 40L, 3.0), (4L, d(1), 41L, 8.0), (4L, d(2), 42L, 8.0), (4L, d(3), 43L, 8.0),
      (5L, d(0), 50L, 6.0), (5L, d(1), 51L, 6.0), (5L, d(2), 52L, 6.0), (5L, d(3), 53L, 6.0),
      (6L, d(0), 60L, 0.0), (6L, d(1), 61L, 4.0))
    // randomized: small price alphabet forces equal runs
    val randomized = (10L until 40L).flatMap { cust =>
      (0 until (1 + rnd.nextInt(6))).map { i =>
        (cust, d(i), cust * 100 + i, Seq(2.0, 2.0, 5.0, 9.0)(rnd.nextInt(4)))
      }
    }
    val rows = crafted ++ randomized
    val dir = java.nio.file.Files.createTempDirectory("graft_deltas").toString
    rows.toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = graft.operators.Analytics.priceDeltas(spark, dir)
      .collect().map(r => r.getAs[Long]("o_custkey") -> r).toMap
    rows.groupBy(_._1).foreach { case (cust, hist) =>
      val (refDelta, refRel, refLast, refDte, refPrv) =
        refScanBack(hist.map { case (_, dt, k, p) => (dt, k, p) })
      val g = got(cust)
      assert(g.getAs[Double]("delta") == refDelta, s"cust=$cust delta")
      assert(math.abs(g.getAs[Double]("relative_change") - refRel) < 1e-6, s"cust=$cust rel")
      assert(math.abs(g.getAs[Double]("last_change_pct") - refLast) < 1e-6, s"cust=$cust lastChange")
      assert(g.getAs[Date]("last_change_date") == refDte, s"cust=$cust lastChangeDte")
      assert(g.getAs[Double]("prv_price") == refPrv, s"cust=$cust prvPrice")
    }
  }
}
