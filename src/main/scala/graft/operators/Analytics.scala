package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch analytics re-expressing the reference's ProdMetrics / DomAnalysis /
  * model-evaluation jobs (reference: um/re/analytics/ProdMetricsV6.scala,
  * um/re/analysis/DomAnalysisFull.scala, um/re/transform/Transformer.scala)
  * as declarative DataFrame plans.
  *
  * Scale notes (100 TB):
  *  - Monetary aggregates go through DecimalType — associative-safe, so
  *    map-side partial aggregation is both enabled and deterministic.
  *  - All windows partition by a high-cardinality key (order/customer/
  *    product) — no global sorts anywhere.
  *  - Dimension joins (part/supplier/nation) are explicitly broadcast.
  */
object Analytics {
  private val M = DecimalType(18, 2) // money/quantity exact-sum type

  /** Pricing summary: groupBy + algebraic aggregates only → full map-side
    * partial aggregation; one shuffle at the agg keys. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(M)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(M)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(M)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Revenue per brand: fact⋈dim with the dim side broadcast — no shuffle
    * of the 100 TB fact table for the join, only for the final agg. */
  def joinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(M)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Per-key price-history stats (StatCounter analog: min/max/mean/stdev).
    * Reference: um/re/analytics/UrlPositionAndVar.scala + ProdMetricsV6's
    * StatCounter usage. stdev computed from exact decimal sums so the
    * result is independent of partitioning / aggregation order. */
  def priceStats(spark: SparkSession, dir: String): DataFrame = {
    val sq = DecimalType(38, 6)
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        sum(col("value").cast(M)).cast("double").as("sum_value"),
        (sum(col("value").cast(M)).cast("double") / count(lit(1))).as("avg_value"),
        round(
          sqrt(
            (sum((col("value") * col("value")).cast(sq)).cast("double")
              - sum(col("value").cast(M)).cast("double") * sum(col("value").cast(M)).cast("double") / count(lit(1)))
              / (count(lit(1)) - 1)),
          6).as("stdev_value"))
      .orderBy("event_type")
  }

  /** Per-URL argmax-confidence candidate selection: the reference sorts
    * each URL group by confidence and keeps the head
    * (Transformer.scala:322-337, evaluateModelByURL). Here: pick the
    * highest-value lineitem per order via a rank window — one shuffle on
    * the partition key, no per-group driver logic. */
  def topCandidate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy("l_orderkey")
  }

  /** Latest vs previous price per key: delta + relative change %.
    * Reference: ProdMetricsV6.scala:75-110 (groupByKey + sorted-list scan
    * → re-expressed as lag/row_number windows; the scan-back "last change
    * date" becomes a max-over-filtered-window). */
  def priceDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price", lead("o_totalprice", 1).over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_custkey"),
        col("o_totalprice").as("last_price"),
        col("prev_price"),
        when(col("prev_price").isNull, lit(0.0))
          .otherwise(col("o_totalprice") - col("prev_price")).as("delta"),
        when(col("prev_price").isNull || col("prev_price") === 0.0, lit(0.0))
          .otherwise(round((col("o_totalprice") - col("prev_price")) / col("prev_price") * 100.0, 6))
          .as("relative_change"))
      .orderBy("o_custkey")
  }

  /** Per-product max increase / max decrease across stores.
    * Reference: ProdMetricsV6.scala:112-160 (sortedByRelativeChange head/
    * last per product → argmax/argmin windows). Key mapping: product =
    * customer, store = order priority bucket. */
  def hotspots(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("o_custkey", "o_orderpriority")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = Tables.orders(spark, dir)
      .select("o_custkey", "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
      .withColumn("prev", lag("o_totalprice", 1).over(byKey))
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .withColumn("rel_change", round((col("o_totalprice") - col("prev")) / col("prev") * 100.0, 6))
    val maxW = Window.partitionBy("o_custkey")
      .orderBy(col("rel_change").desc, col("o_orderkey").asc)
    val minW = Window.partitionBy("o_custkey")
      .orderBy(col("rel_change").asc, col("o_orderkey").asc)
    changes
      .withColumn("rn_max", row_number().over(maxW))
      .withColumn("rn_min", row_number().over(minW))
      .filter(col("rn_max") === 1 || col("rn_min") === 1)
      .groupBy("o_custkey")
      .agg(
        max(when(col("rn_max") === 1, col("rel_change"))).as("max_increase"),
        max(when(col("rn_max") === 1, col("o_orderkey"))).as("max_increase_order"),
        min(when(col("rn_min") === 1, col("rel_change"))).as("max_decrease"),
        max(when(col("rn_min") === 1, col("o_orderkey"))).as("max_decrease_order"))
      .orderBy("o_custkey")
  }

  /** Domain-analysis chain: parts sold by ≥ minDomains distinct suppliers,
    * then suppliers carrying ≥ minProds such parts.
    * Reference: analysis/DomAnalysisFull.scala:18-25 (domain=supplier,
    * product=part). Semi-join keeps the fact scan single-pass; the two
    * "hot lists" are tiny and broadcast. */
  def domAnalysis(spark: SparkSession, dir: String, minDomains: Int = 4, minProds: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val domProd = li.distinct()
    val hotParts = domProd.groupBy("l_partkey")
      .agg(countDistinct("l_suppkey").as("n_domains"))
      .filter(col("n_domains") >= minDomains)
    val hotPairs = domProd.join(broadcast(hotParts), Seq("l_partkey"))
    val hotSupps = hotPairs.groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("n_hot_parts"))
      .filter(col("n_hot_parts") >= minProds)
    hotPairs.join(broadcast(hotSupps.select("l_suppkey")), Seq("l_suppkey"))
      .select("l_suppkey", "l_partkey", "n_domains")
      .orderBy("l_suppkey", "l_partkey")
  }

  /** Confusion matrix + sensitivity/specificity/precision per group over a
    * deterministic synthetic label/prediction pair.
    * Reference: Transformer.scala:306-320 (evaluateModel) — the RDD
    * filter+count-per-metric (4 jobs) becomes one single-pass aggregate. */
  def evalMetrics(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("label", (col("l_quantity") > 25.0).cast("int"))
      .withColumn("pred", (col("l_discount") > 0.05).cast("int"))
    li.groupBy("l_returnflag")
      .agg(
        sum(when(col("label") === 1 && col("pred") === 1, 1).otherwise(0)).as("tp"),
        sum(when(col("label") === 0 && col("pred") === 0, 1).otherwise(0)).as("tn"),
        sum(when(col("label") === 0 && col("pred") === 1, 1).otherwise(0)).as("fp"),
        sum(when(col("label") === 1 && col("pred") === 0, 1).otherwise(0)).as("fn"))
      .select(
        col("l_returnflag"), col("tp"), col("tn"), col("fp"), col("fn"),
        round(col("tp") / (col("tp") + col("fn")), 6).as("sensitivity"),
        round(col("tn") / (col("fp") + col("tn")), 6).as("specificity"),
        round(col("tp") / (col("tp") + col("fp")), 6).as("precision_"))
      .orderBy("l_returnflag")
  }

  /** Seed frequency fill: emit each product with its order frequency,
    * keeping products above a minimum support — the reference pushes the
    * most-frequent product URLs to the scraper seed topic.
    * Reference: streaming/FillSeedsByProdFreq.scala,
    * emr/SeedsDistinctS3ToKafka.scala (distinct + frequency). */
  def seedFreq(spark: SparkSession, dir: String, minFreq: Int = 20): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("freq"), countDistinct("l_orderkey").as("n_orders"))
      .filter(col("freq") >= minFreq)
      .orderBy(col("freq").desc, col("l_partkey").asc)
}
