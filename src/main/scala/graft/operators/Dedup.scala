package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (SURVEY §2 rows 22-25):
  * exact content-hash, MinHash-LSH near-dup candidates, SimHash hamming
  * buckets, and bucket-local n-gram Jaccard.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-partitioned groupBy with map-side partial
  *    aggregation — shuffle volume is one (hash, id) pair per row.
  *  - MinHash signatures are computed map-side (pure per-row expressions,
  *    no UDF), then the ONLY shuffle is on (band, signature) — candidate
  *    generation is a bucket-local equi-join, never an O(n²) cross join.
  *  - SimHash pairs likewise join on a hamming-prefix bucket key.
  *  - Jaccard verification runs only inside small buckets; the gram sets
  *    travel with the rows so verification needs no second scan.
  *
  * Hashing is md5-hex (string ordering) so every step is reproducible in
  * DuckDB for the oracle compare; the SimHash variant uses xxhash64 for
  * realistic 64-bit mixing and is covered by the rows-only check.
  */
object Dedup {

  /** q_dedup_exact: canonical doc per exact content hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("keep_id")

  /** Word k-shingles (k=3) of `text`, with duplicates — the codegen'd
    * native expression (functions/Shingles.scala), not an interpreted
    * transform/element_at chain. */
  private def shinglesRaw(text: Column): Column =
    graft.functions.WordShingles.wordShingles(text, 3)

  /** Word k-shingles (k=3) of `text`, distinct — needed for Jaccard;
    * the MinHash path uses [[shinglesRaw]] because minima are invariant
    * under duplicates and array_distinct is O(n²) per row. */
  private def shingles(text: Column): Column = array_distinct(shinglesRaw(text))

  private val NumHashes = 16
  private val BandRows = 2 // r=2: P(band match) = J², kills the
  // quadratic bucket blowup that r=1 suffers on high-overlap corpora
  private val P = 2147483647L // 2^31-1; (a·h+b) stays < 2^37, no overflow
  private def permA(i: Int): Long = 2L * i + 1
  private def permB(i: Int): Long = 7919L * (i + 1)

  /** q_dedup_minhash: near-dup candidate pairs via MinHash-LSH banding
    * (b=8 bands of r=2 rows → P(candidate) = 1-(1-J²)^8, steep around
    * J≈0.35).
    *
    * Scale shape: each shingle is md5'd ONCE (hex prefix → bigint), the
    * 16 permutations are cheap modular arithmetic ((a·h+b) mod 2³¹-1),
    * and the per-doc minima aggregate with map-side partial min inside
    * whole-stage codegen — no higher-order functions in the heavy pass
    * and no double evaluation (a naive self-join recomputes the full
    * signature per side). Pairs are generated bucket-locally from
    * collected id lists; a bucket is a near-dup cluster, so lists stay
    * small by construction (an identical-content flood at 100 TB would
    * be capped by slicing the hottest buckets before pairing). */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shinglesRaw(col("text"))).as("sh"))
      .withColumn("hm",
        expr(s"cast(conv(substr(md5(sh), 1, 15), 16, 10) as bigint) % $P"))
    val minCols = (0 until NumHashes).map { i =>
      min((col("hm") * permA(i) + permB(i)) % P).as(s"mh$i")
    }
    val minh = g.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandSig = array((0 until NumHashes / BandRows).map { b =>
      struct(
        lit(b).as("band"),
        concat_ws("|", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*).as("sig"))
    }: _*)
    val sig = minh
      .select(col("doc_id"), explode(bandSig).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("mh"))
    val buckets = sig.groupBy("band", "mh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("id_a", "id_b")
  }

  /** q_dedup_simhash: 64-bit SimHash per doc (xxhash64 token hashes,
    * per-bit majority vote), bucketed by the top hamming-prefix nibble;
    * per-doc count of in-bucket mates within hamming ≤ 16.
    * Rows-only oracle (xxhash64 is Spark-specific). */
  def dedupSimhash(spark: SparkSession, dir: String, prefixBits: Int = 4, maxHamming: Int = 16): DataFrame = {
    // distributed per-bit majority vote: explode distinct tokens, hash
    // once, then 64 partial-aggregable sums — one shuffle on doc_id
    val tokRows = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val voteCols = (0 until 64).map { j =>
      sum((shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).cast("int")).as(s"v$j")
    }
    val votes = tokRows.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    // simhash long: bit j set iff votes[j] > 0 (bit 63 may set the sign)
    val sim = (0 until 64).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    // persist the per-doc aggregate: tiny (3 columns × one row per doc)
    // but referenced by three plan branches (both self-join sides + the
    // final left join) — without it the expensive explode + 64-vote
    // aggregation would run three times
    val docs = votes
      .select(col("doc_id"), sim.as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 64 - prefixBits).bitwiseAND(lit((1L << prefixBits) - 1)))
      .persist()
    val a = docs.as("a")
    val b = docs.as("b")
    val mates = a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.doc_id") =!= col("b.doc_id") &&
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= maxHamming)
      .groupBy(col("a.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_near"))
    docs.join(mates, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"), col("bucket"),
        coalesce(col("n_near"), lit(0L)).as("n_near"))
      .orderBy("doc_id")
  }

  /** q_ngram_jaccard: exact Jaccard over distinct word-3-gram sets for
    * bucket-local candidate pairs (bucket = (lang, len(text)/100)) — the
    * verification stage that follows LSH candidate generation. The join
    * is bucket-keyed: shuffle ∝ docs, compare work ∝ Σ bucket². */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        floor(length(col("text")) / 100).as("szb"),
        shingles(col("text")).as("grams"))
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.szb") === col("b.szb") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(col("a.grams")).cast("long").as("n_a"),
        size(col("b.grams")).cast("long").as("n_b"),
        size(array_intersect(col("a.grams"), col("b.grams"))).cast("long").as("n_inter"))
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 6))
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (dedupExact(_, _)),
    "q_dedup_minhash" -> (dedupMinhash(_, _)),
    "q_dedup_simhash" -> (dedupSimhash(_, _)),
    "q_ngram_jaccard" -> (ngramJaccard(_, _)))

  private val shingleSql: String =
    """SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 3
      |    THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] for i in range(1, len(toks) - 1)]
      |    ELSE [text] END) AS grams
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY keep_id""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH sh AS ($shingleSql),
         |g AS (
         |  SELECT doc_id,
         |    CAST(concat('0x', substr(md5(t.sh), 1, 15)) AS BIGINT) % ${P} AS hm
         |  FROM sh, UNNEST(grams) AS t(sh)),
         |minh AS (
         |  SELECT doc_id,
         |    ${(0 until NumHashes).map(i => s"MIN((hm * ${permA(i)} + ${permB(i)}) % ${P}) AS mh$i").mkString(",\n         |    ")}
         |  FROM g GROUP BY doc_id),
         |sig AS (
         |  ${(0 until NumHashes / BandRows).map { b =>
              val cols = (0 until BandRows).map(r => s"mh${b * BandRows + r}").mkString(", '|', ")
              s"SELECT doc_id, $b AS band, concat($cols) AS mh FROM minh"
            }.mkString("\n         |  UNION ALL ")})
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
         |FROM sig a JOIN sig b
         |  ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY id_a, id_b""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH sh AS ($shingleSql),
         |docs AS (
         |  SELECT d.doc_id, d.lang, CAST(floor(len(d.text) / 100) AS BIGINT) AS szb, sh.grams
         |  FROM documents d JOIN sh USING (doc_id))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(a.grams) AS BIGINT) AS n_a,
         |  CAST(len(b.grams) AS BIGINT) AS n_b,
         |  CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT) AS n_inter,
         |  ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
         |    / (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6) AS jaccard
         |FROM docs a JOIN docs b
         |  ON a.lang = b.lang AND a.szb = b.szb AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin)
}
