package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whois-record JSON ingestion (SURVEY §2 row 25) — the reference's
  * WhoIsExtractor (emr/WhoIsExtractor.scala:42-60) walks a whois API's
  * JSON response with play-json on the driver, one domain at a time,
  * extracting the registrant / administrative / technical contacts
  * with "N/A" defaults for absent fields. Re-expressed Spark-first:
  * the responses are a DataFrame column, `from_json` parses them
  * inside whole-stage codegen, and the contact extraction is a pure
  * nested-struct projection — map-only at any corpus size, no
  * driver-side loop or HTTP.
  *
  * The synthetic responses (the sandbox has no network; a real
  * deployment feeds the stored API payloads) vary their shape the way
  * real whois data does: every 5th record has no administrative
  * contact at all, every 3rd omits the technical contact's email —
  * both must surface as "N/A", the reference's `asOpt ... getOrElse`
  * path.
  */
object WhoisJson {

  private val contact = StructType(Seq(
    StructField("full_name", StringType),
    StructField("company_name", StringType),
    StructField("email_address", StringType),
    StructField("country_name", StringType)))

  private val whoisSchema = StructType(Seq(
    StructField("whois_record", StructType(Seq(
      StructField("registrant_contact", contact),
      StructField("administrative_contact", contact),
      StructField("technical_contact", contact))))))

  /** One synthetic whois API response per customer domain. */
  private def responses(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val domain = concat(lit("shop"), (k % 37).cast("string"), lit(".example.com"))
    def contactJson(prefix: String, withEmail: org.apache.spark.sql.Column) = concat(
      lit(s"""{"full_name": """"), lit(prefix), lit(" "), col("c_name"), lit("\""),
      lit(s""", "company_name": "Shop """), (k % 37).cast("string"), lit("\""),
      when(withEmail,
        concat(lit(s""", "email_address": "$prefix@"""), domain, lit("\"")))
        .otherwise(lit("")),
      lit(s""", "country_name": "C"""), col("c_nationkey").cast("string"), lit("\"}"))
    Tables.customer(spark, dir)
      .select(k.as("c_custkey"), domain.as("domain"),
        concat(
          lit("""{"whois_record": {"registrant_contact": """),
          contactJson("reg", lit(true)),
          when(k % 5 =!= 0,
            concat(lit(""", "administrative_contact": """), contactJson("adm", lit(true))))
            .otherwise(lit("")),
          lit(""", "technical_contact": """),
          contactJson("tech", k % 3 =!= 0),
          lit("}}")).as("json"))
  }

  /** q_parse_whois_json: native-JSON parse → three-contact extraction
    * with N/A defaults. */
  def parseWhoisJson(spark: SparkSession, dir: String): DataFrame = {
    def na(c: org.apache.spark.sql.Column) = coalesce(c, lit("N/A"))
    responses(spark, dir)
      .select(col("c_custkey"), col("domain"),
        from_json(col("json"), whoisSchema).as("w"))
      .select(
        col("c_custkey"), col("domain"),
        na(col("w.whois_record.registrant_contact.full_name")).as("reg_name"),
        na(col("w.whois_record.registrant_contact.email_address")).as("reg_email"),
        na(col("w.whois_record.administrative_contact.full_name")).as("adm_name"),
        na(col("w.whois_record.administrative_contact.email_address")).as("adm_email"),
        na(col("w.whois_record.technical_contact.full_name")).as("tech_name"),
        na(col("w.whois_record.technical_contact.email_address")).as("tech_email"),
        na(col("w.whois_record.technical_contact.country_name")).as("tech_country"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parse_whois_json" -> (parseWhoisJson(_, _)))

  /** Oracle: builds the SAME JSON strings and parses them with DuckDB's
    * json_extract_string — a genuine two-engine JSON round-trip. */
  val oracleSql: Map[String, String] = Map(
    "q_parse_whois_json" ->
      """WITH r AS (
        |  SELECT c_custkey,
        |    'shop' || CAST(c_custkey % 37 AS VARCHAR) || '.example.com' AS domain,
        |    c_name, c_nationkey
        |  FROM customer),
        |j AS (
        |  SELECT c_custkey, domain,
        |    '{"whois_record": {"registrant_contact": '
        |    || '{"full_name": "reg ' || c_name || '", "company_name": "Shop '
        |    || CAST(c_custkey % 37 AS VARCHAR) || '", "email_address": "reg@' || domain
        |    || '", "country_name": "C' || CAST(c_nationkey AS VARCHAR) || '"}'
        |    || CASE WHEN c_custkey % 5 <> 0 THEN
        |         ', "administrative_contact": {"full_name": "adm ' || c_name
        |         || '", "company_name": "Shop ' || CAST(c_custkey % 37 AS VARCHAR)
        |         || '", "email_address": "adm@' || domain
        |         || '", "country_name": "C' || CAST(c_nationkey AS VARCHAR) || '"}'
        |       ELSE '' END
        |    || ', "technical_contact": {"full_name": "tech ' || c_name
        |    || '", "company_name": "Shop ' || CAST(c_custkey % 37 AS VARCHAR) || '"'
        |    || CASE WHEN c_custkey % 3 <> 0 THEN ', "email_address": "tech@' || domain || '"'
        |       ELSE '' END
        |    || ', "country_name": "C' || CAST(c_nationkey AS VARCHAR) || '"}}}' AS json
        |  FROM r)
        |SELECT c_custkey, domain,
        |  COALESCE(json_extract_string(json, '$.whois_record.registrant_contact.full_name'), 'N/A') AS reg_name,
        |  COALESCE(json_extract_string(json, '$.whois_record.registrant_contact.email_address'), 'N/A') AS reg_email,
        |  COALESCE(json_extract_string(json, '$.whois_record.administrative_contact.full_name'), 'N/A') AS adm_name,
        |  COALESCE(json_extract_string(json, '$.whois_record.administrative_contact.email_address'), 'N/A') AS adm_email,
        |  COALESCE(json_extract_string(json, '$.whois_record.technical_contact.full_name'), 'N/A') AS tech_name,
        |  COALESCE(json_extract_string(json, '$.whois_record.technical_contact.email_address'), 'N/A') AS tech_email,
        |  COALESCE(json_extract_string(json, '$.whois_record.technical_contact.country_name'), 'N/A') AS tech_country
        |FROM j
        |ORDER BY c_custkey""".stripMargin)
}
