package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is recorded with err:1 and
  * excluded from the timing total so a broken query can't masquerade as a
  * fast one. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (parquet footers, codegen compiler, shuffle
    // machinery) so the first timed query doesn't absorb JVM init
    try {
      Seq("lineitem", "orders", "part", "customer", "events", "documents", "embeddings")
        .foreach(t => try sources.Tables.table(spark, sfDir, t).limit(1).count()
          catch { case _: Throwable => () })
      SparkEntry.entry(spark).limit(1).count()
    } catch { case _: Throwable => () }
    val only = args.toSet // optional query-name filter for local profiling
    require((only -- SparkEntry.queries.keySet).isEmpty,
      s"unknown query name(s): ${(only -- SparkEntry.queries.keySet).mkString(", ")}")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // queries stay name->seconds (the driver's shape); failures are listed
    // separately in "err" and excluded from the total.
    val qs = results.collect { case (k, v, true) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","err":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
