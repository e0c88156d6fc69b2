package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-feed XML ingestion (SURVEY §2 row 21) — the reference's
  * Google-feed parser (emr/ParseGglXML.scala) re-expressed with
  * Spark 4's NATIVE XML support: `from_xml` parses each feed item
  * inside whole-stage codegen, no driver-side scala.xml walk.
  *
  * Semantics mirrored from the reference: keep only items carrying a
  * `gtin`; clean commas out of category/title (replaceAll(",", "."));
  * truncate the tracking link at "?source="; price = `sale_price`
  * when present else `price`, parsed from the "<amount> EUR" text.
  *
  * Scale: the feed rides a normal file scan (one XML string per item
  * row); parse + cleanup are pure column expressions, so the operator
  * is map-only and fuses into the scan stage.
  */
object XmlFeed {

  private val itemSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("product_type", StringType),
    StructField("title", StringType),
    StructField("gtin", StringType),
    StructField("link", StringType),
    StructField("price", StringType),
    StructField("sale_price", StringType)))

  /** Synthetic feed: one `<item>` per order — regular price always,
    * a 10%-off `sale_price` on every third item, `gtin` missing on
    * every fourth (those must be dropped, as the reference does). */
  private def feed(spark: SparkSession, dir: String): DataFrame = {
    val cents = (floor(col("o_totalprice") * 100 + 0.5).cast("long") + 1000000L).as("cents")
    def money(c: org.apache.spark.sql.Column) =
      concat((c / 100).cast("long").cast("string"), lit("."),
        lpad((c % 100).cast("string"), 2, "0"), lit(" EUR"))
    // widen the one-task sandbox scan: from_xml parsing downstream is
    // the query's whole cost (no-op on an already-wide production scan)
    Tables.widened(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderkey").cast("string").as("ks"), cents))
      .withColumn("sale_cents", expr("cents - cents div 10"))
      .withColumn("xml", concat(
        lit("<item><id>p"), col("ks"), lit("</id><product_type>cat,"),
        (col("o_orderkey") % 5).cast("string"), lit("</product_type><title>Item "),
        col("ks"), lit(", deluxe</title>"),
        when(col("o_orderkey") % 4 =!= 1,
          concat(lit("<gtin>0"), col("ks"), lit("</gtin>"))).otherwise(lit("")),
        lit("<link>http://shop.example.com/p/"), col("ks"), lit("?source=ggl</link>"),
        lit("<price>"), money(col("cents")), lit("</price>"),
        when(col("o_orderkey") % 3 === 0,
          concat(lit("<sale_price>"), money(col("sale_cents")), lit("</sale_price>")))
          .otherwise(lit("")),
        lit("</item>")))
  }

  /** q_parse_xml_feed: native-XML parse → gtin filter → cleanup. */
  def parseXmlFeed(spark: SparkSession, dir: String): DataFrame = {
    val chosen = coalesce(col("it.sale_price"), col("it.price"))
    feed(spark, dir)
      .select(col("o_orderkey"), from_xml(col("xml"), itemSchema).as("it"))
      .filter(col("it.gtin").isNotNull)
      .select(
        col("o_orderkey"),
        col("it.id").as("id"),
        regexp_replace(col("it.product_type"), ",", ".").as("category"),
        regexp_replace(col("it.title"), ",", ".").as("title"),
        col("it.gtin").as("gtin"),
        expr("substring(it.link, 1, instr(it.link, '?source=') - 1)").as("link"),
        expr("cast(substring(" +
          "coalesce(it.sale_price, it.price), 1, " +
          "instr(coalesce(it.sale_price, it.price), ' EUR') - 1) as double)").as("price"),
        (col("it.sale_price").isNotNull).as("on_sale"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parse_xml_feed" -> (parseXmlFeed(_, _)))

  /** Oracle: rebuilds the expected parse output analytically from
    * `orders` (DuckDB has no XML functions — the arithmetic below is
    * exactly what the XML round-trip must produce). */
  val oracleSql: Map[String, String] = Map(
    "q_parse_xml_feed" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS ks,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1000000 AS cents
        |  FROM orders),
        |f AS (SELECT *, cents - cents // 10 AS sale_cents FROM b)
        |SELECT o_orderkey,
        |  concat('p', ks) AS id,
        |  concat('cat.', CAST(o_orderkey % 5 AS VARCHAR)) AS category,
        |  concat('Item ', ks, '. deluxe') AS title,
        |  concat('0', ks) AS gtin,
        |  concat('http://shop.example.com/p/', ks) AS link,
        |  CASE WHEN o_orderkey % 3 = 0 THEN
        |    CAST(concat(CAST(sale_cents // 100 AS VARCHAR), '.',
        |      lpad(CAST(sale_cents % 100 AS VARCHAR), 2, '0')) AS DOUBLE)
        |  ELSE
        |    CAST(concat(CAST(cents // 100 AS VARCHAR), '.',
        |      lpad(CAST(cents % 100 AS VARCHAR), 2, '0')) AS DOUBLE)
        |  END AS price,
        |  o_orderkey % 3 = 0 AS on_sale
        |FROM f
        |WHERE o_orderkey % 4 <> 1
        |ORDER BY o_orderkey""".stripMargin)
}
