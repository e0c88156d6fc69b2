package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables
import graft.operators.Similarity

/** Dev probe: per-round timing of the componentLabels CC loop over the
  * forest-fed mutual graph. The loop body below is an instrumented COPY
  * of Dedup.componentLabels (keep the two in sync when the real loop
  * changes). Data dir comes from arg 0 / SPARK_GRAFT_SF_DIR like the
  * other probe mains. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32, "probe")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.embeddings(spark, dir).limit(1).count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val edges0 = time("edges") {
      val e = Similarity.knnGraphApprox(spark, dir).select("id_a", "id_b").localCheckpoint()
      println("PROBE edge rows=" + e.count()); e
    }
    for (rep <- 1 to 2) {
      // instrumented componentLabels copy
      val pairs = edges0
      val edges = pairs
        .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        .toDF("src", "dst").persist()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint()
      var prevSum = BigDecimal(-1)
      var converged = false
      var i = 0
      while (!converged && i < 30) {
        time(s"cc$rep-round$i") {
          val nbrMin = edges
            .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(min("nl").as("nmin"))
          val stepped = labels
            .join(nbrMin, Seq("id"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
          labels = stepped.as("s")
            .join(stepped.select(col("id").as("label"), col("label").as("ll")).as("p"),
              Seq("label"), "left")
            .select(col("id"),
              least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
            .localCheckpoint(false)
          val curSum = BigDecimal(
            labels.agg(coalesce(sum(col("label").cast(DecimalType(38, 0))),
              lit(0).cast(DecimalType(38, 0)))).head().getDecimal(0))
          converged = curSum == prevSum
          prevSum = curSum
          i += 1
        }
      }
      edges.unpersist()
      prevSum = BigDecimal(-1); converged = false; i = 0
    }
    spark.stop()
  }
}
