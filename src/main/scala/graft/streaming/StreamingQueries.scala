package graft.streaming
import org.apache.spark.sql.{DataFrame, SparkSession}
object StreamingQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
}
