package graft.operators

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query wrappers for the reference's text utilities (SURVEY §2 rows
  * 3-8) — each applies a `functions.Text` column function to
  * deterministic inputs built from the testdata tables, so the DuckDB
  * oracle can recompute the exact expected output.
  *
  * Every operator here is a pure map (no shuffle before the
  * presentation sort): at 100 TB these fuse into the scan's
  * whole-stage-codegen stage. Reference: um/re/utils/Utils.scala.
  */
object TextQueries {

  /** q_text_only_tokens: textOnly + Java-split tokenization over a
    * letters+digits input. Reference: Utils.scala:57-74. */
  def textOnlyTokens(spark: SparkSession, dir: String): DataFrame = {
    val inp = concat(col("lang"), lit(" "), col("text"), lit(" doc"), col("doc_id"))
    val toks = Text.tokenize(inp)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        Text.textOnly(inp).as("clean"),
        size(toks).cast("long").as("n_tokens"),
        element_at(toks, 1).as("first_token"),
        element_at(toks, size(toks)).as("last_token"))
      .orderBy("doc_id")
  }

  /** q_shrink_string: blank-collapse + thousands-comma + control-char
    * normalization chain. Reference: Utils.scala:208-210. */
  def shrinkString(spark: SparkSession, dir: String): DataFrame = {
    val d = (floor(col("o_totalprice")).cast("long") + 10000L)
    val amt = concat((d / 1000).cast("long").cast("string"), lit(","),
      lpad((d % 1000).cast("string"), 3, "0"))
    val inp = concat(lit("total   "), amt, lit(",\tnote ,x  ,, end"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), Text.shrinkString(inp).as("shrunk"))
      .orderBy("o_orderkey")
  }

  /** q_char_grams: exploded char 3-grams with the reference's quirky
    * bounds — first char never starts a gram, last gram stops one short
    * (gram count = len-n-1). Reference: Utils.scala:40-52. */
  def charGrams(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= n + 2)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(2), length(col("text")) - n),
          i => struct(i.cast("long").as("pos"), col("text").substr(i, lit(n)).as("gram")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gram").as("gram"))
      .orderBy("doc_id", "pos")

  /** q_get_domain: URL → domain over four URL shapes (scheme'd, bare,
    * www-bare, broken single-slash scheme) + min-support frequency list
    * + stable domain ids and mod-grouping (the reference's domain→id
    * map / domNameGrp: zipWithIndex then id % (n/minGrpNum)).
    * The id window ranks the ~|domains| aggregated rows, not raw data.
    * Reference: Utils.scala:359-375 (getDomain), 344-357 (domainsList),
    * emr/GenDMap.scala. */
  /** The synthetic URL corpus over `customer` (four URL shapes). */
  private def customerUrl: org.apache.spark.sql.Column = {
    val base = concat(lit("shop"), (col("c_custkey") % 37).cast("string"), lit(".example.com"))
    when(col("c_custkey") % 4 === 0,
        concat(lit("http://www."), base, lit("/p/"), col("c_custkey").cast("string")))
      .when(col("c_custkey") % 4 === 1, concat(lit("www."), base, lit("/q")))
      .when(col("c_custkey") % 4 === 2,
        concat(base, lit("/item/"), col("c_custkey").cast("string")))
      .otherwise(concat(lit("http:/"), base, lit("/y")))
  }

  def getDomain(spark: SparkSession, dir: String, minSupport: Int = 3,
      minGrpNum: Int = 10): DataFrame = {
    val url = customerUrl
    // Scale-safe id assignment: dom_id is a content hash (md5 prefix →
    // bigint), not a zipWithIndex-style dense rank — no global-window
    // single-partition sort over the domain list. n_dom rides along as a
    // broadcast one-row aggregate over the (persisted, tiny) frequency
    // table rather than a `count().over()` empty-key window.
    val freq = Tables.customer(spark, dir)
      .select(Text.getDomain(url).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minSupport)
      .persist()
    val nDf = freq.groupBy().agg(count(lit(1)).as("n_dom"))
    freq
      .crossJoin(broadcast(nDf))
      .withColumn("dom_id",
        expr("cast(conv(substr(md5(domain), 1, 15), 16, 10) as bigint)"))
      .withColumn("grp", col("dom_id") % greatest(floor(col("n_dom") / minGrpNum), lit(1L)))
      .drop("n_dom")
      .orderBy("domain")
  }

  /** q_parse_price_locale: en_US leading-number parse over five input
    * shapes (n/a, currency-prefixed, suffixed, negative, bare decimal).
    * Reference: Utils.scala:123-129. */
  def parsePriceLocale(spark: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long") + 1000000L
    val d = (cents / 100).cast("long")
    val cc = cents % 100
    val astr = concat((d / 1000).cast("long").cast("string"), lit(","),
      lpad((d % 1000).cast("string"), 3, "0"), lit("."),
      lpad(cc.cast("string"), 2, "0"))
    val s = when(col("o_orderkey") % 5 === 0, lit("N/A"))
      .when(col("o_orderkey") % 5 === 1, concat(lit("$"), astr))
      .when(col("o_orderkey") % 5 === 2, concat(astr, lit(" USD")))
      .when(col("o_orderkey") % 5 === 3, concat(lit("-"), astr))
      .otherwise(concat(lit("."), lpad(cc.cast("string"), 2, "0")))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), s.as("price_str"),
        Text.parsePriceLocale(s).as("parsed"))
      .orderBy("o_orderkey")
  }

  /** q_price_decision: the streaming price-decision status machine over
    * all seven statuses. Reference: Utils.scala:408-432. */
  def priceDecision(spark: SparkSession, dir: String): DataFrame = {
    val statuses = Seq("modeledPatternEquals", "minorModelPatternConflict",
      "majorModelPatternConflict", "patternFailed", "missingModel",
      "allFalseCandids", "bothFailed")
    val status = statuses.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (name, i)) => when(col("o_orderkey") % 7 === i, lit(name)).otherwise(acc)
    }
    val model = floor(col("o_totalprice") * 1.1 * 100 + 0.5) / 100
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), status.as("status"),
        col("o_totalprice").as("updated_price"),
        model.as("model_price"),
        Text.decidePrice(status, col("o_totalprice"), model).as("decided"))
      .orderBy("o_orderkey")
  }

  /** q_heavy_hitters: approximate top-k frequent domains via the
    * SpaceSaving TypedImperativeAggregate (functions/TopK.scala) — the
    * bounded-memory form of the domain frequency list. capacity=64
    * exceeds the true cardinality here, so counts are exact (err=0)
    * and the DuckDB oracle can value-check the sketch end-to-end. */
  def heavyHitters(spark: SparkSession, dir: String,
      capacity: Int = 64, k: Int = 10): DataFrame =
    Tables.customer(spark, dir)
      .select(Text.getDomain(customerUrl).as("domain"))
      .agg(graft.functions.HeavyHitters.heavyHitters(col("domain"), capacity, k).as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "h")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("h.item").as("domain"), col("h.cnt").as("cnt"), col("h.err").as("err"))
      .orderBy("rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_heavy_hitters" -> (heavyHitters(_, _)),
    "q_text_only_tokens" -> (textOnlyTokens(_, _)),
    "q_shrink_string" -> (shrinkString(_, _)),
    "q_char_grams" -> (charGrams(_, _)),
    "q_get_domain" -> (getDomain(_, _)),
    "q_parse_price_locale" -> (parsePriceLocale(_, _)),
    "q_price_decision" -> (priceDecision(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH freq AS (
        |  SELECT concat('shop', CAST(c_custkey % 37 AS VARCHAR), '.example.com') AS domain,
        |    COUNT(*) AS cnt
        |  FROM customer GROUP BY 1),
        |ranked AS (
        |  SELECT domain, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, domain ASC) AS rank
        |  FROM freq)
        |SELECT CAST(rank AS BIGINT) AS rank, domain, cnt, CAST(0 AS BIGINT) AS err
        |FROM ranked WHERE rank <= 10
        |ORDER BY rank""".stripMargin,
    "q_text_only_tokens" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_replace(concat(lang, ' ', text, ' doc', CAST(doc_id AS VARCHAR)),
        |      '[^A-Za-z]+', ' ', 'g') AS clean
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, clean, string_split(clean, ' ') AS toks,
        |    CASE WHEN clean LIKE '% ' THEN len(string_split(clean, ' ')) - 1
        |         ELSE len(string_split(clean, ' ')) END AS n
        |  FROM t)
        |SELECT doc_id, clean, CAST(n AS BIGINT) AS n_tokens,
        |  toks[1] AS first_token, toks[n] AS last_token
        |FROM tk
        |ORDER BY doc_id""".stripMargin,
    "q_shrink_string" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    concat('total   ',
        |      CAST((CAST(floor(o_totalprice) AS BIGINT) + 10000) // 1000 AS VARCHAR), ',',
        |      lpad(CAST((CAST(floor(o_totalprice) AS BIGINT) + 10000) % 1000 AS VARCHAR), 3, '0'),
        |      ',', chr(9), 'note ,x  ,, end') AS inp
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(inp, '[ \t]{3,}', ' ', 'g'),
        |      '([0-9]),([0-9])', '\1\2', 'g'),
        |    '[\t\n\r,]', '', 'g') AS shrunk
        |FROM t
        |ORDER BY o_orderkey""".stripMargin,
    "q_char_grams" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS pos, substr(text, CAST(i AS INT), 3) AS gram
        |FROM documents, UNNEST(range(2, len(text) - 2)) AS t(i)
        |WHERE len(text) >= 5
        |ORDER BY doc_id, pos""".stripMargin,
    "q_get_domain" ->
      """WITH freq AS (
        |  SELECT concat('shop', CAST(c_custkey % 37 AS VARCHAR), '.example.com') AS domain,
        |    COUNT(*) AS freq
        |  FROM customer
        |  GROUP BY 1 HAVING COUNT(*) >= 3),
        |n AS (SELECT COUNT(*) AS n_dom FROM freq)
        |SELECT domain, freq,
        |  CAST(concat('0x', substr(md5(domain), 1, 15)) AS BIGINT) AS dom_id,
        |  CAST(concat('0x', substr(md5(domain), 1, 15)) AS BIGINT)
        |    % greatest(n_dom // 10, 1) AS grp
        |FROM freq, n
        |ORDER BY domain""".stripMargin,
    "q_parse_price_locale" ->
      """WITH b AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 1000000 AS cents
        |  FROM orders),
        |a AS (
        |  SELECT o_orderkey,
        |    concat(CAST(cents // 100 // 1000 AS VARCHAR), ',',
        |      lpad(CAST(cents // 100 % 1000 AS VARCHAR), 3, '0'), '.',
        |      lpad(CAST(cents % 100 AS VARCHAR), 2, '0')) AS astr,
        |    lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS ccs
        |  FROM b),
        |s AS (
        |  SELECT o_orderkey,
        |    CASE CAST(o_orderkey % 5 AS INT)
        |      WHEN 0 THEN 'N/A'
        |      WHEN 1 THEN concat('$', astr)
        |      WHEN 2 THEN concat(astr, ' USD')
        |      WHEN 3 THEN concat('-', astr)
        |      ELSE concat('.', ccs) END AS price_str
        |  FROM a),
        |m AS (
        |  SELECT o_orderkey, price_str,
        |    regexp_extract(price_str,
        |      '^-?[0-9][0-9,]*(\.[0-9]+)?|^-?\.[0-9]+', 0) AS lead
        |  FROM s)
        |SELECT o_orderkey, price_str,
        |  CASE WHEN lead = '' THEN NULL
        |       ELSE CAST(replace(lead, ',', '') AS DOUBLE) END AS parsed
        |FROM m
        |ORDER BY o_orderkey""".stripMargin,
    "q_price_decision" ->
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CASE CAST(o_orderkey % 7 AS INT)
        |      WHEN 0 THEN 'modeledPatternEquals'
        |      WHEN 1 THEN 'minorModelPatternConflict'
        |      WHEN 2 THEN 'majorModelPatternConflict'
        |      WHEN 3 THEN 'patternFailed'
        |      WHEN 4 THEN 'missingModel'
        |      WHEN 5 THEN 'allFalseCandids'
        |      ELSE 'bothFailed' END AS status,
        |    o_totalprice AS updated_price,
        |    floor(o_totalprice * 1.1 * 100 + 0.5) / 100 AS model_price
        |  FROM orders)
        |SELECT o_orderkey, status, updated_price, model_price,
        |  CASE
        |    WHEN status IN ('modeledPatternEquals', 'minorModelPatternConflict', 'patternFailed')
        |      THEN model_price
        |    WHEN status IN ('majorModelPatternConflict', 'missingModel', 'allFalseCandids')
        |      THEN updated_price
        |    WHEN status = 'bothFailed' THEN 0.0
        |    ELSE NULL END AS decided
        |FROM t
        |ORDER BY o_orderkey""".stripMargin)
}
