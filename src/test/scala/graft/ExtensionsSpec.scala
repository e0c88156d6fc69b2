package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-facing registration of graft's custom Catalyst functions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4, "graft-ext-spec")

  test("price_candidates is callable from SQL via GraftExtensions") {
    import spark.implicits._
    Seq((1L, "only $12.34 today")).toDF("id", "html")
      .createOrReplaceTempView("pages")
    val rows = spark.sql(
      """SELECT id, c.candidate, c.location
        |FROM pages LATERAL VIEW explode(price_candidates(html)) t AS c""".stripMargin)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "12.34", 6)))
  }
}
