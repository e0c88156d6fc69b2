package graft

import graft.streaming.{PriceState, UserUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** MemoryStream specs for the streaming pipelines (SURVEY §2 rows
  * 33-35) — drive each pattern with an in-memory source and assert on
  * the sink, as the reference's streaming tests do against DStreams. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runStream(df: org.apache.spark.sql.DataFrame, mode: OutputMode,
      name: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("extraction pipe over a memory stream of pages") {
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "buy at $12.34 now!"), (2L, "no numbers here"),
      (3L, "price 1,299.99 today"))
    val out = in.toDF().toDF("id", "html")
      .select(col("id"), explode(graft.functions.PriceCandidates
        .priceCandidates(col("html"))).as("c"))
      .select(col("id"), col("c.candidate").as("candidate"))
    val got = runStream(out, OutputMode.Append(), "spec_pipe")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "12.34"), (3L, "1,299.99")))
  }

  test("windowed aggregation with watermark over a memory stream") {
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    in.addData(
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "view", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:02:00"), "view", 2.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:07:00"), "click", 5.0))
    val agg = in.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
    val got = runStream(agg, OutputMode.Complete(), "spec_window")
      .select("event_type", "n", "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("view", 2L, 3.0), ("click", 1L, 5.0)))
  }

  test("stateful last-price tracking via flatMapGroupsWithState") {
    val in = MemoryStream[(Long, Long, Double)] // user, event, value
    in.addData((7L, 1L, 10.0), (7L, 2L, 12.0), (7L, 3L, 12.0), (9L, 1L, 5.0))
    val updates = in.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[PriceState]) => {
          val sorted = rows.toSeq.sortBy(_._2)
          var st = state.getOption.getOrElse(PriceState(Double.NaN, 0L))
          var n = 0L
          sorted.foreach { case (_, _, v) =>
            st = if (!st.last.isNaN && v != st.last) PriceState(v, st.changes + 1)
                 else PriceState(v, st.changes)
            n += 1
          }
          state.update(st)
          Iterator.single(UserUpdate(user, st.last, n, st.changes))
        })
    val got = runStream(updates.toDF(), OutputMode.Append(), "spec_state")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(3))).toSet
    assert(got == Set((7L, 12.0, 1L), (9L, 5.0, 0L)))
  }
}
