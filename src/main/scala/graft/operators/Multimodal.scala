package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 row 40): treat media as an
  * opaque `binary` payload plus a typed metadata struct, and run the
  * decode / feature-extract stage as a typed per-partition batch over
  * the binary column — the exact shape a real image/audio pipeline
  * uses.
  *
  * The payload carries a REAL container header (PNG signature + IHDR,
  * JPEG SOI/APP0/SOF0 marker stream, WAV RIFF/fmt chunks) ahead of the
  * body bytes, and the decode stage does genuine byte-level parsing:
  * magic-byte sniffing picks the codec, then PNG IHDR / JPEG SOF
  * marker-scan / WAV fmt parsing recover width & height (for audio:
  * sample_rate & channels in the width/height slots) from the header
  * bytes alone — the declared metadata never reaches the decoder. Only
  * the body decode (pixels/samples) stays faked: no media libs exist
  * in this environment, so body features are a deterministic byte
  * checksum (see [[FakeDecoder.decode]]).
  *
  * Scale notes: payloads ride the scan as binary (no base64 blowup);
  * the decode stage is `mapPartitions` over a repartition-by-format so
  * one partition holds one codec's work (decoder init amortized per
  * partition, the real-world reason for partition-level decode); output
  * is a flat struct+array schema that writes back to parquet.
  */
object Multimodal {

  /** One decoded media row — the typed boundary of the decode stage. */
  case class MediaFeature(
      doc_id: Long, format: String, width: Int, height: Int,
      resized_w: Int, resized_h: Int, frame_offsets: Array[Int],
      byte_len: Int, checksum: Long, features: Array[Float])

  // ---------------------------------------------------------------------------
  // Header synthesis (column expressions): the testdata corpus has no
  // media bytes, so the scan stage manufactures a payload whose header
  // is REAL — the same bytes a file on disk would start with — encoding
  // the document's declared dimensions. Everything downstream treats
  // the payload as opaque bytes, exactly as it would S3-fetched media.
  // ---------------------------------------------------------------------------

  private def byteHex(c: Column): Column =
    lpad(hex(c.bitwiseAND(lit(255L))), 2, "0")
  private def beHex(c: Column, n: Int): Column =
    concat((n - 1 to 0 by -1).map(i => byteHex(shiftright(c, 8 * i))): _*)
  private def leHex(c: Column, n: Int): Column =
    concat((0 until n).map(i => byteHex(shiftright(c, 8 * i))): _*)

  /** PNG: 8-byte signature, IHDR length+type, width/height big-endian,
    * bit depth 8 / color type 6 (RGBA) / deflate / none / no interlace,
    * zeroed CRC (the parser reads IHDR, it doesn't validate CRCs).
    * 33 bytes. */
  private def pngHeaderHex(w: Column, h: Column): Column = concat(
    lit("89504E470D0A1A0A0000000D49484452"),
    beHex(w, 4), beHex(h, 4), lit("080600000000000000"))

  /** JPEG: SOI, a JFIF APP0, then SOF0 with height/width big-endian
    * and three 4:2:0 components — the minimal marker stream a real
    * dimension sniffer walks. 39 bytes. */
  private def jpegHeaderHex(w: Column, h: Column): Column = concat(
    lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
    beHex(h, 2), beHex(w, 2), lit("03011100021101031101"))

  /** WAV: canonical 44-byte RIFF/fmt/data header, little-endian PCM —
    * channels carries the `height` slot, sample rate the `width` slot
    * (the audio analog of image dimensions). */
  private def wavHeaderHex(w: Column, h: Column, dataLen: Column): Column = concat(
    lit("52494646"), leHex(dataLen + 36, 4), lit("57415645666D7420100000000100"),
    leHex(h, 2), leHex(w, 4), leHex(w * 2, 4), leHex(h * 2, 2),
    lit("1000"), lit("64617461"), leHex(dataLen, 4))

  // ---------------------------------------------------------------------------
  // Header parsing (executor-side Scala): genuine byte-level decode of
  // the container headers above — the part of a media decoder that
  // needs no codec library.
  // ---------------------------------------------------------------------------

  private[graft] object HeaderParser {
    private def be(b: Array[Byte], off: Int, n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      v
    }
    private def le(b: Array[Byte], off: Int, n: Int): Int = {
      var v = 0; var i = n - 1
      while (i >= 0) { v = (v << 8) | (b(off + i) & 0xff); i -= 1 }
      v
    }

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Magic-byte format sniff: PNG signature / JPEG SOI / RIFF+WAVE. */
    def sniff(b: Array[Byte]): String =
      if (b.length >= 8 && b.take(8).sameElements(PngSig)) "png"
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if (b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF"
        && new String(b, 8, 4, "US-ASCII") == "WAVE") "wav"
      else "unknown"

    /** (width, height) parsed from the header bytes; (0, 0) when the
      * payload is malformed — a decoder must not throw on bad media. */
    def dims(format: String, b: Array[Byte]): (Int, Int) = format match {
      case "png" =>
        // IHDR must be the first chunk: length at 8, type at 12
        if (b.length >= 24 && new String(b, 12, 4, "US-ASCII") == "IHDR")
          (be(b, 16, 4), be(b, 20, 4))
        else (0, 0)
      case "jpeg" =>
        // marker scan: FF D8, then segments (FF xx, 2-byte length) until
        // a baseline/progressive SOF (C0-C3); dims sit after precision
        var i = 2
        while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
          val marker = b(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xc3) {
            return if (i + 9 <= b.length) (be(b, i + 7, 2), be(b, i + 5, 2)) else (0, 0)
          }
          i += 2 + be(b, i + 2, 2)
        }
        (0, 0)
      case "wav" =>
        // RIFF → WAVE → "fmt " chunk at 12: channels at 22, rate at 24
        if (b.length >= 28 && new String(b, 12, 4, "US-ASCII") == "fmt ")
          (le(b, 24, 4), le(b, 22, 2))
        else (0, 0)
      case _ => (0, 0)
    }
  }

  /** Body decode stand-in: real pixel/sample decode needs a codec lib
    * this environment lacks, so features derive from a deterministic
    * byte checksum. Header parsing above is real; only this is faked. */
  object FakeDecoder {
    /** Aspect-preserving fit into a 224×224 box (the resize stage a
      * real image pipeline runs before feature extraction). */
    def resize(w: Int, h: Int, box: Int = 224): (Int, Int) =
      if (w <= 0 || h <= 0) (box, box)
      else if (w >= h) (box, math.max(1, math.round(box.toFloat * h / w)))
      else (math.max(1, math.round(box.toFloat * w / h)), box)

    /** Uniform k-sample of "frame" byte offsets (the frame-sample stage
      * of a video pipeline; here frames are byte positions). */
    def sampleFrames(len: Int, k: Int = 4): Array[Int] =
      if (len <= 0) Array.empty
      else Array.tabulate(math.min(k, len))(j => (j.toLong * len / math.min(k, len)).toInt)

    def decode(docId: Long, payload: Array[Byte]): MediaFeature = {
      val format = HeaderParser.sniff(payload)
      val (width, height) = HeaderParser.dims(format, payload)
      var sum = 0L
      var i = 0
      val n = math.min(payload.length, 64)
      // modular poly-31 over the first 64 bytes: stays < 2^35 at every
      // step, so the DuckDB oracle can rebuild it without int64 overflow
      while (i < n) { sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
      val f = new Array[Float](4)
      var j = 0
      while (j < 4) {
        f(j) = ((sum >>> (j * 16)) & 0xffff).toFloat / 65535.0f
        j += 1
      }
      val (rw, rh) = resize(width, height)
      MediaFeature(docId, format, width, height, rw, rh,
        sampleFrames(payload.length), payload.length, sum, f)
    }
  }

  /** Library API: the full decoded feature rows, arrays included. */
  def decodedFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = (col("n_chars") % 640).cast("bigint")
    val h = ((col("doc_id") * 7) % 480).cast("bigint")
    val fmt = element_at(array(lit("png"), lit("jpeg"), lit("wav")),
      (col("doc_id") % 3 + 1).cast("int"))
    val hdrHex = when(fmt === "png", pngHeaderHex(w, h))
      .when(fmt === "jpeg", jpegHeaderHex(w, h))
      .otherwise(wavHeaderHex(w, h, octet_length(col("text")).cast("bigint")))
    val media = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        // payload: real container header + the doc text as body bytes
        concat(unhex(hdrHex), encode(col("text"), "UTF-8")).as("payload"),
        // typed metadata struct: the catalog's DECLARED view of the
        // media; the decoder ignores it and trusts only payload bytes
        struct(fmt.as("format"), w.cast("int").as("width"),
          h.cast("int").as("height")).as("meta"))
    val decoded = media
      .repartition(col("meta.format")) // codec-local partitions
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here in a real pipeline
        it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
      }
    decoded.toDF()
  }

  /** q_multimodal_meta: the registered query projects the array columns
    * of [[decodedFeatures]] down to sortable scalars (count / sum /
    * scaled L2) — the driver's pandas-based compare cannot sort raw
    * array cells. The arrays stay available via the library API above.
    * Fully hash-oracled: the body is ASCII and the header bytes are a
    * pure function of (format, width, height, body length), so DuckDB
    * rebuilds the byte-level decode — header bytes included — value
    * for value. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodedFeatures(spark, dir)
      .select(
        col("doc_id"), col("format"), col("width"), col("height"),
        col("resized_w"), col("resized_h"),
        size(col("frame_offsets")).as("n_frames"),
        aggregate(col("frame_offsets"), lit(0L), (a, x) => a + x).as("frame_sum"),
        col("byte_len"), col("checksum"),
        floor(aggregate(col("features"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")) * 1e6 + 0.5)
          .cast("long").as("feature_l2sq_e6"))
      .orderBy("doc_id")

  /** q_media_dedup: exact BINARY-asset dedup over the multimodal
    * catalog — the asset-store dedup a crawl pipeline runs before
    * fetching/decoding anything twice: identical payload bytes collapse
    * to one stored asset however many documents reference them.
    *
    * The catalog is multi-reference: every document carries its own
    * inline asset (the [[decodedFeatures]] payload shape, dims keyed
    * off n_chars so identity is content-derived) plus its source's
    * shared logo asset (a 64×64 PNG whose body is the source tag) —
    * the repeated-site-chrome pattern that makes media dedup worth
    * running at all. Identity is md5 over the canonical hex rendering
    * of the payload (hex is injective on bytes; DuckDB's BLOB→VARCHAR
    * coercion escapes bytes, so hashing raw blobs cross-engine would
    * compare different strings).
    *
    * Scale shape: one documents scan; the per-doc asset fan-out is a
    * bounded explode (2 rows/doc); hashing is map-side; the only
    * shuffle is the two-phase groupBy on the 128-bit content hash —
    * exactly q_dedup_exact's shape with binary payloads. At 100 TB the
    * payload column never moves: only (hash, format, byte_len, doc_id)
    * rides the shuffle. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val inlineFmt = element_at(array(lit("png"), lit("jpeg"), lit("wav")),
      (col("n_chars") % 3 + 1).cast("int"))
    val w = (col("n_chars") % 640).cast("bigint")
    val h = ((col("n_chars") * 3) % 480).cast("bigint")
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array(
        struct(inlineFmt.as("format"), w.as("w"), h.as("h"),
          encode(col("text"), "UTF-8").as("body")),
        struct(lit("png").as("format"), lit(64L).as("w"), lit(64L).as("h"),
          encode(concat(lit("logo:"), col("source")), "UTF-8").as("body"))))
        .as("a"))
      .select(col("doc_id"), col("a.format").as("format"),
        col("a.w").as("w"), col("a.h").as("h"), col("a.body").as("body"))
    val hdrHex = when(col("format") === "png", pngHeaderHex(col("w"), col("h")))
      .when(col("format") === "jpeg", jpegHeaderHex(col("w"), col("h")))
      .otherwise(wavHeaderHex(col("w"), col("h"),
        octet_length(col("body")).cast("bigint")))
    assets
      .withColumn("payload", concat(unhex(hdrHex), col("body")))
      .select(col("doc_id"), col("format"),
        md5(upper(hex(col("payload")))).as("payload_md5"),
        octet_length(col("payload")).cast("long").as("byte_len"))
      .groupBy("payload_md5")
      .agg(
        min("format").as("format"),
        count(lit(1)).as("n_copies"),
        min("doc_id").as("keeper_doc_id"),
        min("byte_len").as("byte_len"),
        (count(lit(1)) * min("byte_len") - min("byte_len")).as("bytes_saved"))
      .orderBy("payload_md5")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_dedup" -> (mediaDedup(_, _)),
    "q_multimodal_meta" -> (multimodalMeta(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      s"""WITH b AS (
        |  SELECT doc_id, text, len(text) AS blen,
        |    CAST(n_chars % 640 AS BIGINT) AS w,
        |    CAST((doc_id * 7) % 480 AS BIGINT) AS h,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format
        |  FROM documents),
        |-- the same real container headers the engine synthesizes, as
        |-- byte-value lists (w < 65536 and h < 65536 by construction, so
        |-- the two high big-endian bytes are literal zeros)
        |hdr AS (
        |  SELECT doc_id,
        |    CASE format
        |      WHEN 'png' THEN
        |        [137,80,78,71,13,10,26,10, 0,0,0,13, 73,72,68,82,
        |         0,0, w//256, w%256, 0,0, h//256, h%256,
        |         8,6,0,0,0, 0,0,0,0]
        |      WHEN 'jpeg' THEN
        |        [255,216, 255,224, 0,16, 74,70,73,70,0, 1,1, 0,
        |         0,1, 0,1, 0,0,
        |         255,192, 0,17, 8, h//256, h%256, w//256, w%256,
        |         3, 1,17,0, 2,17,1, 3,17,1]
        |      ELSE
        |        [82,73,70,70,
        |         (blen+36)%256, (blen+36)//256%256, (blen+36)//65536%256,
        |           (blen+36)//16777216%256,
        |         87,65,86,69, 102,109,116,32, 16,0,0,0, 1,0,
        |         h%256, h//256,
        |         w%256, w//256%256, w//65536%256, w//16777216%256,
        |         (w*2)%256, (w*2)//256%256, (w*2)//65536%256, (w*2)//16777216%256,
        |         (h*2)%256, (h*2)//256%256,
        |         16,0, 100,97,116,97,
        |         blen%256, blen//256%256, blen//65536%256, blen//16777216%256]
        |    END AS hdr
        |  FROM b),
        |p AS (
        |  SELECT b.doc_id, format, w, h, blen,
        |    len(hdr) + blen AS plen,
        |    list_slice(list_concat(hdr,
        |      [CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT)
        |       for i in range(1, least(blen, 64) + 1)]), 1, 64) AS head64
        |  FROM b JOIN hdr USING (doc_id)),
        |ck AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(head64, x -> CAST(x AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS checksum
        |  FROM p),
        |rz AS (
        |  SELECT doc_id,
        |    CASE WHEN w <= 0 OR h <= 0 THEN 224
        |         WHEN w >= h THEN 224
        |         ELSE greatest(1, CAST(floor(CAST(224 AS REAL) * CAST(w AS REAL)
        |           / CAST(h AS REAL) + CAST(0.5 AS REAL)) AS INT)) END AS resized_w,
        |    CASE WHEN w <= 0 OR h <= 0 THEN 224
        |         WHEN w >= h THEN greatest(1, CAST(floor(CAST(224 AS REAL)
        |           * CAST(h AS REAL) / CAST(w AS REAL) + CAST(0.5 AS REAL)) AS INT))
        |         ELSE 224 END AS resized_h
        |  FROM b),
        |fr AS (
        |  -- k = min(4, plen) frames with divisor k, exactly like
        |  -- FakeDecoder.sampleFrames (plen ≥ 33 always, so k = 4)
        |  SELECT doc_id,
        |    CAST(least(plen, 4) AS INT) AS n_frames,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, least(plen, 4)),
        |        j -> (CAST(j AS BIGINT) * plen) // least(plen, 4))),
        |      (a, b) -> a + b) AS BIGINT) AS frame_sum
        |  FROM p),
        |ft AS (
        |  SELECT doc_id,
        |    CAST(CAST(checksum % 65536 AS REAL) / CAST(65535 AS REAL) AS DOUBLE) AS x0,
        |    CAST(CAST((checksum // 65536) % 65536 AS REAL) / CAST(65535 AS REAL) AS DOUBLE) AS x1
        |  FROM ck)
        |SELECT p.doc_id, p.format,
        |  CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
        |  rz.resized_w, rz.resized_h,
        |  fr.n_frames, fr.frame_sum, CAST(p.plen AS INT) AS byte_len, ck.checksum,
        |  CAST(floor((x0 * x0 + x1 * x1) * 1e6 + 0.5) AS BIGINT) AS feature_l2sq_e6
        |FROM p
        |JOIN ck USING (doc_id) JOIN rz USING (doc_id)
        |JOIN fr USING (doc_id) JOIN ft USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,
    // Same two-asset catalog (inline + per-source logo), the same real
    // container headers as hex, md5 over the canonical hex rendering.
    "q_media_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS blen,
        |    CAST(n_chars % 640 AS BIGINT) AS w,
        |    CAST((n_chars * 3) % 480 AS BIGINT) AS h,
        |    CASE CAST(n_chars % 3 AS INT)
        |      WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, concat('logo:', source) AS text,
        |    octet_length(encode(concat('logo:', source))) AS blen,
        |    CAST(64 AS BIGINT) AS w, CAST(64 AS BIGINT) AS h, 'png' AS format
        |  FROM documents),
        |hx AS (
        |  SELECT doc_id, format, blen, text,
        |    CASE format
        |      WHEN 'png' THEN concat('89504E470D0A1A0A0000000D49484452',
        |        lpad(to_hex(w), 8, '0'), lpad(to_hex(h), 8, '0'), '080600000000000000')
        |      WHEN 'jpeg' THEN concat('FFD8FFE000104A46494600010100000100010000FFC0001108',
        |        lpad(to_hex(h), 4, '0'), lpad(to_hex(w), 4, '0'), '03011100021101031101')
        |      ELSE concat('52494646',
        |        lpad(to_hex((blen + 36) % 256), 2, '0'), lpad(to_hex((blen + 36) // 256 % 256), 2, '0'),
        |        lpad(to_hex((blen + 36) // 65536 % 256), 2, '0'), lpad(to_hex((blen + 36) // 16777216 % 256), 2, '0'),
        |        '57415645666D7420100000000100',
        |        lpad(to_hex(h % 256), 2, '0'), lpad(to_hex(h // 256), 2, '0'),
        |        lpad(to_hex(w % 256), 2, '0'), lpad(to_hex(w // 256 % 256), 2, '0'),
        |        lpad(to_hex(w // 65536 % 256), 2, '0'), lpad(to_hex(w // 16777216 % 256), 2, '0'),
        |        lpad(to_hex((w * 2) % 256), 2, '0'), lpad(to_hex((w * 2) // 256 % 256), 2, '0'),
        |        lpad(to_hex((w * 2) // 65536 % 256), 2, '0'), lpad(to_hex((w * 2) // 16777216 % 256), 2, '0'),
        |        lpad(to_hex((h * 2) % 256), 2, '0'), lpad(to_hex((h * 2) // 256 % 256), 2, '0'),
        |        '1000', '64617461',
        |        lpad(to_hex(blen % 256), 2, '0'), lpad(to_hex(blen // 256 % 256), 2, '0'),
        |        lpad(to_hex(blen // 65536 % 256), 2, '0'), lpad(to_hex(blen // 16777216 % 256), 2, '0'))
        |    END AS hdr_hex
        |  FROM b),
        |pay AS (
        |  SELECT doc_id, format,
        |    md5(upper(concat(hdr_hex, hex(encode(text))))) AS payload_md5,
        |    len(hdr_hex) // 2 + blen AS byte_len
        |  FROM hx)
        |SELECT payload_md5, MIN(format) AS format,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
        |  CAST(MIN(byte_len) AS BIGINT) AS byte_len,
        |  CAST(COUNT(*) * MIN(byte_len) - MIN(byte_len) AS BIGINT) AS bytes_saved
        |FROM pay GROUP BY payload_md5 ORDER BY payload_md5""".stripMargin)
}
