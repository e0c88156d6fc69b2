package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2 row 32): treat media as an
  * opaque `binary` payload plus a typed metadata struct, and run the
  * decode / feature-extract stage as a typed per-partition batch over
  * the binary column — the exact shape a real image/audio pipeline
  * uses, with the decoder STUBBED to a deterministic byte-level fake
  * (no media libs in this environment; see `FakeDecoder`).
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

  /** Deterministic stand-in for an image/audio decoder: real decode
    * would parse `payload` with a codec; the stub derives a checksum
    * and a 4-dim "embedding" from raw bytes so the pipeline stays
    * testable end-to-end. */
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

    def decode(docId: Long, format: String, width: Int, height: Int,
        payload: Array[Byte]): MediaFeature = {
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
    val media = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        // payload: the doc text as utf-8 bytes stands in for media bytes
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          element_at(array(lit("png"), lit("jpeg"), lit("wav")),
            (col("doc_id") % 3 + 1).cast("int")).as("format"),
          (col("n_chars") % 640).cast("int").as("width"),
          ((col("doc_id") * 7) % 480).cast("int").as("height")).as("meta"))
    val decoded = media
      .repartition(col("meta.format")) // codec-local partitions
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("payload"))
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init happens here in a real pipeline
        it.map { case (id, fmt, w, h, bytes) =>
          FakeDecoder.decode(id, fmt, w, h, bytes)
        }
      }
    decoded.toDF()
  }

  /** q_multimodal_meta: the registered query projects the array columns
    * of [[decodedFeatures]] down to sortable scalars (count / sum /
    * scaled L2) — the driver's pandas-based compare cannot sort raw
    * array cells. The arrays stay available via the library API above.
    * Fully hash-oracled: the corpus is ASCII, so DuckDB rebuilds the
    * byte-level decode (modular checksum, float32 resize/feature math)
    * value-for-value. */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, text, len(text) AS blen,
        |    CAST(n_chars % 640 AS INT) AS width,
        |    CAST((doc_id * 7) % 480 AS INT) AS height,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format
        |  FROM documents),
        |ck AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, least(blen, 64) + 1),
        |        i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS checksum
        |  FROM b),
        |rz AS (
        |  SELECT doc_id,
        |    CASE WHEN width <= 0 OR height <= 0 THEN 224
        |         WHEN width >= height THEN 224
        |         ELSE greatest(1, CAST(floor(CAST(224 AS REAL) * CAST(width AS REAL)
        |           / CAST(height AS REAL) + CAST(0.5 AS REAL)) AS INT)) END AS resized_w,
        |    CASE WHEN width <= 0 OR height <= 0 THEN 224
        |         WHEN width >= height THEN greatest(1, CAST(floor(CAST(224 AS REAL)
        |           * CAST(height AS REAL) / CAST(width AS REAL) + CAST(0.5 AS REAL)) AS INT))
        |         ELSE 224 END AS resized_h
        |  FROM b),
        |fr AS (
        |  -- k = min(4, blen) frames with divisor k, exactly like
        |  -- FakeDecoder.sampleFrames — NOT a hardcoded 4, which would
        |  -- diverge on docs shorter than 4 bytes
        |  SELECT doc_id,
        |    CAST(least(blen, 4) AS INT) AS n_frames,
        |    CAST(CASE WHEN blen <= 0 THEN 0 ELSE
        |      list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(0, least(blen, 4)),
        |          j -> (CAST(j AS BIGINT) * blen) // least(blen, 4))),
        |        (a, b) -> a + b) END AS BIGINT) AS frame_sum
        |  FROM b),
        |ft AS (
        |  SELECT doc_id,
        |    CAST(CAST(checksum % 65536 AS REAL) / CAST(65535 AS REAL) AS DOUBLE) AS x0,
        |    CAST(CAST((checksum // 65536) % 65536 AS REAL) / CAST(65535 AS REAL) AS DOUBLE) AS x1
        |  FROM ck)
        |SELECT b.doc_id, b.format, b.width, b.height, rz.resized_w, rz.resized_h,
        |  fr.n_frames, fr.frame_sum, CAST(b.blen AS INT) AS byte_len, ck.checksum,
        |  CAST(floor((x0 * x0 + x1 * x1) * 1e6 + 0.5) AS BIGINT) AS feature_l2sq_e6
        |FROM b
        |JOIN ck USING (doc_id) JOIN rz USING (doc_id)
        |JOIN fr USING (doc_id) JOIN ft USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin)
}
