package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual queries (repeat a name to measure
  * warm vs cold): `sbt "runMain graft.TimeOne <sfDir> <query> ..."` */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(0)).count()
      println(f"TIMING $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
