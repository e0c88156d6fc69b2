package graft

import graft.functions.PriceCandidates.priceCandidates
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The custom extraction expression against hand-computed reference
  * behavior (um/re/utils/PriceParcer.scala findFast). */
class ExtractionSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): Seq[Row] =
    Seq(html).toDF("html")
      .select(explode(priceCandidates(col("html"))).as("c"))
      .select("c.candidate", "c.text_before", "c.text_after", "c.location")
      .collect().toSeq

  test("single price with snippet and location") {
    val got = extract("price: $12.34 now")
    assert(got.map(r => (r.getString(0), r.getInt(3))) == Seq(("12.34", 8)))
    assert(got(0).getString(1) == "price: $")
    // text_after starts with the consumed trailing char
    assert(got(0).getString(2) == " now")
  }

  test("number at end of input is not a candidate (reference quirk)") {
    assert(extract("price 12.34").isEmpty)
  }

  test("multiple candidates, non-overlapping, locations 0-based") {
    val got = extract("a 1,2 b 3.4 c")
    assert(got.map(r => (r.getString(0), r.getInt(3))) ==
      Seq(("1,2", 2), ("3.4", 8)))
  }

  test("snippets truncate at bounds") {
    val got = extract("9.9 x")
    assert(got.map(_.getString(1)) == Seq(""))
  }

  test("comparison with regex oracle on template pages") {
    val q = SparkEntry.queries("q_price_candidates_filtered")(spark, sf)
    val rows = q.limit(50).collect()
    assert(rows.nonEmpty)
    // every surviving candidate has the currency/price evidence nearby
    assert(rows.forall { r =>
      val snip = r.getAs[String]("text_before") + r.getAs[String]("candidate") +
        r.getAs[String]("text_after")
      snip.contains("$") || snip.toLowerCase.contains("price")
    })
  }
}
