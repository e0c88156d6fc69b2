package graft
import org.apache.spark.sql.functions._
import graft.sources.Tables

object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Sessions.local(32, "probe")
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, dir).limit(1).count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val WinnowK=16; val WinnowW=8; val WinnowPosMod=1L<<20
    for (rep <- 1 to 2) {
      // census: per-doc gram hash array + window minima + distinct
      val census = time(s"census$rep") {
        val c = Tables.documents(spark, dir)
          .filter(length(col("text")) >= WinnowK + WinnowW - 1)
          .select(col("doc_id"), expr(
            s"transform(sequence(1, length(text) - ${WinnowK - 1}), i -> cast(conv(substr(md5(substring(text, i, $WinnowK)), 1, 10), 16, 10) as bigint) * $WinnowPosMod + ($WinnowPosMod - i))").as("arr"))
          .select(col("doc_id"), explode(expr(
            s"array_distinct(transform(sequence(1, size(arr) - ${WinnowW - 1}), j -> array_min(slice(arr, j, $WinnowW)) div $WinnowPosMod))")).as("fp"))
          .distinct()
          .localCheckpoint()
        c.count(); c
      }
      // gram-hash only (no window mins): isolates md5 cost
      time(s"md5only$rep") {
        Tables.documents(spark, dir)
          .filter(length(col("text")) >= WinnowK + WinnowW - 1)
          .select(col("doc_id"), expr(
            s"aggregate(transform(sequence(1, length(text) - ${WinnowK - 1}), i -> cast(conv(substr(md5(substring(text, i, $WinnowK)), 1, 10), 16, 10) as bigint) * $WinnowPosMod + ($WinnowPosMod - i)), cast(0 as bigint), (a, x) -> a ^ x)").as("s"))
          .agg(count(col("s"))).head()
      }
      // widened variant
      time(s"md5widened$rep") {
        Tables.widened(Tables.documents(spark, dir))
          .filter(length(col("text")) >= WinnowK + WinnowW - 1)
          .select(col("doc_id"), expr(
            s"aggregate(transform(sequence(1, length(text) - ${WinnowK - 1}), i -> cast(conv(substr(md5(substring(text, i, $WinnowK)), 1, 10), 16, 10) as bigint) * $WinnowPosMod + ($WinnowPosMod - i)), cast(0 as bigint), (a, x) -> a ^ x)").as("s"))
          .agg(count(col("s"))).head()
      }
      val counts = census.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = time(s"pairs$rep") {
        val p = census.groupBy("fp")
          .agg(graft.functions.CappedSortedIds.cappedSortedIds(col("doc_id"), 32).as("ids"))
          .filter(size(col("ids")) > 1)
          .select(explode(flatten(transform(col("ids"), (x, i) =>
            transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
              y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
          .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 4)
        p.count(); p
      }
      time(s"tail$rep") {
        pairs.join(counts.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
          .join(counts.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
          .count()
      }
    }
    spark.stop()
  }
}
