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
}
