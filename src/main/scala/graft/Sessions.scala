package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession builder (SURVEY §3): shuffle partitions sized
  * to the core count (not the 200 default), AQE on so the same plans
  * re-size partitions / handle skew on a real cluster, UTC for oracle
  * parity, and graft's SQL extensions registered. */
object Sessions {
  def local(cores: Int, appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
