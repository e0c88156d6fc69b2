package graft.ml
import org.apache.spark.sql.{DataFrame, SparkSession}
object MLQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
