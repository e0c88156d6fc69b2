package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink support beyond the parquet testdata: the
  * same DataFrame plans read from / write to ORC, CSV and JSON lines
  * (the reference moves data between ES, S3 text and Kafka — here the
  * equivalent file-format surface).
  *
  * Scale notes: ORC/parquet keep columnar pruning + predicate pushdown;
  * CSV/JSON are schema'd explicitly (never inferSchema on a 100 TB
  * directory — schema inference is a full extra scan) and should only
  * appear at ingest edges. Timestamps are written as ISO-8601 UTC.
  */
object Formats {

  def write(df: DataFrame, fmt: String, path: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    fmt match {
      case "parquet" => w.parquet(path)
      case "orc" => w.orc(path)
      case "csv" => w.option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").csv(path)
      case "json" => w
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
  }

  /** Schema'd read — schema is REQUIRED for the text formats so reads
    * never pay an inference scan. */
  def read(spark: SparkSession, fmt: String, path: String, schema: StructType): DataFrame =
    fmt match {
      case "parquet" => spark.read.schema(schema).parquet(path)
      case "orc" => spark.read.schema(schema).orc(path)
      case "csv" => spark.read.schema(schema).option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").csv(path)
      case "json" => spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").json(path)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
}
