package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.HeaderParser

/** Byte-level specs for the real container-header decode (SURVEY §2
  * row 40): sniffing and dimension parsing against hand-built headers,
  * malformed-payload robustness, and the end-to-end round-trip — the
  * dimensions the scan stage encodes into PNG/JPEG/WAV header bytes
  * must come back out of the decoder, which never sees the declared
  * metadata. */
class MultimodalSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array(0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff,
      8, 6, 0, 0, 0, 0, 0, 0, 0)
    (sig ++ ihdr).map(_.toByte)
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val app0 = Array(0xff, 0xe0, 0, 16, 'J'.toInt, 'F'.toInt, 'I'.toInt, 'F'.toInt,
      0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array(0xff, 0xc0, 0, 17, 8, h >>> 8, h & 0xff, w >>> 8, w & 0xff,
      3, 1, 17, 0, 2, 17, 1, 3, 17, 1)
    (Array(0xff, 0xd8) ++ app0 ++ sof0).map(_.toByte)
  }

  test("header sniff + dims parse PNG / JPEG / WAV correctly") {
    val png = pngBytes(639, 311)
    assert(HeaderParser.sniff(png) == "png")
    assert(HeaderParser.dims("png", png) == ((639, 311)))

    val jpg = jpegBytes(512, 479)
    assert(HeaderParser.sniff(jpg) == "jpeg")
    assert(HeaderParser.dims("jpeg", jpg) == ((512, 479)))

    // a JPEG whose SOF hides behind an extra COM segment still parses
    // (the scan walks segment lengths, it doesn't assume fixed offsets)
    val com = Array(0xff, 0xfe, 0, 5, 'h'.toInt, 'i'.toInt, '!'.toInt).map(_.toByte)
    val jpg2 = (jpegBytes(33, 44).take(2) ++ com ++ jpegBytes(33, 44).drop(2))
    assert(HeaderParser.dims("jpeg", jpg2) == ((33, 44)))

    val wav = ("RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0)
      ++ "WAVEfmt ".getBytes("US-ASCII")
      ++ Array(16, 0, 0, 0, 1, 0, /*ch*/ 7, 0, /*rate LE*/ 0x22, 0x56, 0, 0).map(_.toByte))
    assert(HeaderParser.sniff(wav) == "wav")
    assert(HeaderParser.dims("wav", wav) == ((0x5622, 7)))
  }

  test("malformed payloads sniff unknown / parse to (0,0), never throw") {
    val junk = Array[Byte](1, 2, 3)
    assert(HeaderParser.sniff(junk) == "unknown")
    assert(HeaderParser.dims("png", junk) == ((0, 0)))
    assert(HeaderParser.dims("jpeg", Array[Byte](0xff.toByte, 0xd8.toByte)) == ((0, 0)))
    assert(HeaderParser.dims("wav", junk) == ((0, 0)))
    assert(HeaderParser.dims("unknown", junk) == ((0, 0)))
  }

  test("end-to-end: decoded dims equal the declared metadata they encode") {
    import org.apache.spark.sql.functions._
    val got = Multimodal.decodedFeatures(spark, sf)
      .select("doc_id", "format", "width", "height").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val expFmt = Seq("png", "jpeg", "wav")((id % 3).toInt)
      assert(r.getString(1) == expFmt, s"doc $id format")
      assert(r.getInt(3) == ((id * 7) % 480).toInt, s"doc $id height")
    }
    // width = n_chars % 640 — cross-check against the source table
    val nchars = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getInt(2) == (nchars(r.getLong(0)) % 640).toInt,
      s"doc ${r.getLong(0)} width"))
  }
}
