package graft

import graft.sources.{Formats, Tables}
import org.apache.spark.sql.functions._

/** Round-trip every supported format and confirm value equality with
  * the parquet source of truth. */
class FormatsSpec extends SparkSpec {

  test("orc/csv/json round-trip lineitem sample with value equality") {
    val src = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 37 === 0) // small deterministic sample
    val schema = src.schema
    val expected = src.orderBy(src.columns.map(col).toIndexedSeq: _*)
      .collect().map(_.toString).toSeq
    Seq("orc", "csv", "json").foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_fmt_$fmt").toString
      Formats.write(src, fmt, s"$dir/t")
      val back = Formats.read(spark, fmt, s"$dir/t", schema)
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        schema.map(f => (f.name, f.dataType)), s"$fmt schema drift")
      val got = back.orderBy(back.columns.map(col).toIndexedSeq: _*)
        .collect().map(_.toString).toSeq
      assert(got == expected, s"$fmt round-trip mismatch")
    }
  }

  test("jsonl quarantine routes exactly the torn lines, losing nothing") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as long)").as("vc")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = SparkEntry.queries("q_parse_jsonl")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    // the quarantine bucket holds exactly the torn (id % 13 = 0) lines
    // with zero parsed value; every other line lands in its type bucket
    // with the exact cent total — no row is dropped anywhere
    val want = ev.groupBy { case (id, t, _) =>
      if (id % 13 == 0) graft.sources.JsonlLogs.QuarantineBucket else t
    }.map { case (b, rows) =>
      b -> ((rows.size.toLong,
        if (b == graft.sources.JsonlLogs.QuarantineBucket) 0L
        else rows.map(_._3).sum))
    }
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == want)
    assert(got.values.map(_._1).sum == ev.length.toLong)
  }
}
