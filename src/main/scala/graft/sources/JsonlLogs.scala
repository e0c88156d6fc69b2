package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines log ingestion with corrupt-record QUARANTINE (SURVEY §2
  * row 177) — the ingest contract the reference's streaming jobs rely
  * on Kafka+manual parsing for (e.g. um/re/emr/Kafka2Cassandra.scala's
  * line-splitting consumers): production logs always contain a
  * malformed tail (truncated writes, mid-line rotations), and a
  * pipeline that throws on them loses the batch while one that drops
  * them silently lies about volume. The contract: parse what parses,
  * ROUTE the rest to a quarantine bucket that is counted and sized in
  * the same report as the clean buckets, so loss is visible.
  *
  * Spark-first: the line is parsed by `from_json` in PERMISSIVE mode
  * inside whole-stage codegen — a malformed line yields a null struct
  * (never an exception, never a dropped row) and is detected by the
  * always-present event_id being null. Every 13th event's line is
  * deterministically truncated by one char (an unclosed object — the
  * classic torn tail-write), so BOTH engines' JSON validators must
  * agree on exactly which lines quarantine: the oracle re-serializes
  * the same lines and routes with DuckDB's `json_valid`, a genuine
  * two-parser agreement check.
  *
  * Scale shape: map-only serialize + parse + bucket fused into one
  * scan, then ONE two-phase agg on the bounded bucket alphabet
  * (event types + the quarantine bucket). Money stays integer: cents
  * convert BEFORE serialization, so the JSON itself carries integers
  * and no float ever round-trips through text. */
object JsonlLogs {

  private[graft] val QuarantineBucket = "_CORRUPT_"

  private val lineSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType)))

  /** The serialized log lines, with every 13th event's line torn: one
    * column of raw JSONL exactly as a log shipper would deliver it. */
  private[graft] def lines(spark: SparkSession, dir: String): DataFrame =
    linesFrom(Tables.events(spark, dir))

  /** The serializer over ANY events frame (batch table or stream) —
    * shared with the at-ingest twin q_stream_jsonl. */
  private[graft] def linesFrom(events: DataFrame): DataFrame =
    events
      .select(col("event_id"),
        concat(
          lit("""{"event_id": """), col("event_id"),
          lit(""", "user_id": """), col("user_id"),
          lit(""", "event_type": """"), col("event_type"),
          lit("""", "value_cents": """),
          floor(col("value") * 100 + 0.5).cast("long"),
          lit("}")).as("line0"))
      .select(
        when(col("event_id") % 13 === 0,
          expr("substring(line0, 1, length(line0) - 1)"))
          .otherwise(col("line0")).as("line"))

  /** The parse-and-route census over a lines frame — SHARED by batch
    * and stream so the two reports cannot disagree and the stream
    * reuses the batch oracle verbatim. */
  private[graft] def bucketCensus(lines: DataFrame): DataFrame =
    lines
      .select(col("line"),
        from_json(col("line"), lineSchema,
          Map("mode" -> "PERMISSIVE")).as("j"))
      .withColumn("bucket",
        when(col("j.event_id").isNull, lit(QuarantineBucket))
          .otherwise(col("j.event_type")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("line"))).cast("long").as("n_chars"),
        sum(coalesce(col("j.value_cents"), lit(0L))).as("value_cents"))

  /** q_parse_jsonl: permissive parse → per-bucket ingest report with
    * the quarantine row first-class. */
  def parseJsonl(spark: SparkSession, dir: String): DataFrame =
    bucketCensus(lines(spark, dir)).orderBy("bucket")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_parse_jsonl" -> (parseJsonl(_, _)))

  /** Oracle: the SAME serialized lines, routed by DuckDB's own
    * json_valid + json_extract — two independent JSON parsers must
    * agree line-for-line on what quarantines. */
  val oracleSql: Map[String, String] = Map(
    "q_parse_jsonl" ->
      """WITH src AS (
        |  SELECT event_id,
        |    '{"event_id": ' || event_id ||
        |    ', "user_id": ' || user_id ||
        |    ', "event_type": "' || event_type ||
        |    '", "value_cents": ' || CAST(floor(value * 100 + 0.5) AS BIGINT)
        |    || '}' AS line0
        |  FROM events),
        |l AS (
        |  SELECT CASE WHEN event_id % 13 = 0
        |    THEN substring(line0, 1, len(line0) - 1) ELSE line0 END AS line
        |  FROM src),
        |p AS (
        |  SELECT line,
        |    CASE WHEN json_valid(line)
        |      THEN json_extract_string(line, '$.event_type')
        |      ELSE '_CORRUPT_' END AS bucket,
        |    CASE WHEN json_valid(line)
        |      THEN CAST(json_extract(line, '$.value_cents') AS BIGINT)
        |      ELSE 0 END AS vc
        |  FROM l)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(len(line)) AS BIGINT) AS n_chars,
        |  CAST(SUM(vc) AS BIGINT) AS value_cents
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin)
}
