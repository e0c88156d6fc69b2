package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator is registered twice: a DataFrame builder in
  * `queries` and (where SQL-expressible) a DuckDB-equivalent oracle in
  * `oracleSql`. Column aliases match exactly between both sides — the
  * driver sorts columns by name before hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-brand over a broadcast dim join (SURVEY §7 "enriched
    * price summary"). */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.joinEnrich(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Analytics.queries ++
      operators.TextQueries.queries ++
      operators.Extraction.queries ++
      operators.Dedup.queries ++
      operators.Graph.queries ++
      operators.Skew.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Curation.queries ++
      operators.Multimodal.queries ++
      sources.XmlFeed.queries ++
      sources.WhoisJson.queries ++
      sources.JsonlLogs.queries ++
      ml.MLQueries.queries ++
      streaming.StreamingQueries.queries

  /** DuckDB-runnable oracle SQL per query key (same column aliases).
    * Keys absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Analytics.oracleSql ++
      operators.TextQueries.oracleSql ++
      operators.Extraction.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Graph.oracleSql ++
      operators.Skew.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Curation.oracleSql ++
      operators.Multimodal.oracleSql ++
      sources.XmlFeed.oracleSql ++
      sources.WhoisJson.oracleSql ++
      sources.JsonlLogs.oracleSql ++
      streaming.StreamingQueries.oracleSql ++
      ml.MLQueries.oracleSql
}
