package graft

import graft.functions.HeavyHitters.heavyHitters
import org.apache.spark.sql.functions._

/** SpaceSaving heavy-hitters: exact when capacity ≥ cardinality, and
  * the classic overestimate guarantees when capacity is exceeded
  * (est ≥ true ≥ est − err). */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def run(data: Seq[String], capacity: Int, k: Int) =
    data.toDF("x")
      .repartition(4) // force partial buffers + merge
      .agg(heavyHitters(col("x"), capacity, k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select("h.item", "h.cnt", "h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("exact counts when capacity covers all items") {
    val data = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c")
    val got = run(data, capacity = 8, k = 3).toSeq
    assert(got == Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 7L, 0L)))
  }

  test("overestimate bounds hold when capacity is exceeded") {
    val trueCounts = (0 until 40).map(i => s"item$i" -> (i + 1).toLong).toMap
    val data = trueCounts.toSeq.flatMap { case (s, n) => Seq.fill(n.toInt)(s) }
    val shuffled = new scala.util.Random(7).shuffle(data)
    val got = run(shuffled, capacity = 10, k = 10)
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { case (item, cnt, err) =>
      val truth = trueCounts(item)
      assert(cnt >= truth, s"$item est $cnt < true $truth")
      assert(cnt - err <= truth, s"$item lower bound ${cnt - err} > true $truth")
    }
  }
}
