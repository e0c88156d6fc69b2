package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and packing: benchmark decontamination and
  * target-mixture sampling (SURVEY §2, LLM-pipeline rows). Both are
  * pure batch column pipelines with the small side broadcast — the
  * shapes that survive a 100 TB corpus.
  */
object Curation {

  /** Shingle order for decontamination overlap. 8-token shingles are
    * the published decontamination convention (GPT-3 appendix C uses
    * 8-13-gram collision; Dolma uses paragraph+13-gram) — long enough
    * that natural re-use is rare, short enough to catch paraphrase-free
    * leakage. Docs shorter than k tokens hash as one whole-text
    * shingle ([[graft.functions.WordShingles]] fallback). */
  private[graft] val DecontamK = 8

  /** Eval-set membership: docs with id ≡ EvalRem (mod EvalMod) stand
    * in for the held-out benchmark suite — a deterministic slice (like
    * the other registered queries' pinned id-derived subsets) chosen so
    * the corpus's planted near-duplicates actually straddle the
    * train/eval boundary at every sf (real leakage to catch, not a
    * vacuously-empty join). Shared with the streaming variant
    * (StreamingQueries.streamDecontam) so batch and stream can never
    * disagree on the split. */
  private[graft] val EvalMod = 10
  private[graft] val EvalRem = 7
  private[graft] def isEval(id: org.apache.spark.sql.Column) =
    id % EvalMod === EvalRem

  /** q_decontaminate: flag training documents that share a word
    * [[DecontamK]]-gram with any eval document — the
    * train/test-contamination sweep every serious LLM corpus runs
    * before training.
    *
    * Scale shape: in production the eval side is the benchmark suite —
    * megabytes even when the corpus is 100 TB — so its (shingle,
    * eval_doc) pairs are BROADCAST and the corpus side never shuffles:
    * one scan, a broadcast left join on the shingle, one two-phase
    * aggregate on doc_id. (The TESTDATA eval rule is an id slice of
    * the corpus itself — a stand-in with no separate benchmark table;
    * if the eval side were ever genuinely corpus-sized, drop the
    * `broadcast` hint and this becomes the plain shingle equi-join.)
    * Every training doc is reported (hit or not); the contaminated
    * flag is what a filter stage would consume. */
  def decontaminate(spark: SparkSession, dir: String, k: Int = DecontamK): DataFrame = {
    val shingled = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.WordShingles.wordShingles(col("text"), k))).as("sh"))
    val evalPairs = shingled.filter(isEval(col("doc_id")))
      .select(col("sh"), col("doc_id").as("eval_doc_id"))
    shingled.filter(!isEval(col("doc_id")))
      .join(broadcast(evalPairs), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(
        count_distinct(when(col("eval_doc_id").isNotNull, col("sh")))
          .as("n_shared_shingles"),
        count_distinct(col("eval_doc_id")).as("n_eval_docs"))
      .withColumn("contaminated", col("n_shared_shingles") > 0)
      .orderBy("doc_id")
  }

  /** q_mixture_sample: deterministic target-mixture sampling — compute
    * per-language keep rates that move the corpus toward a UNIFORM
    * language mix (target share 1/|langs|), then sample docs by md5
    * threshold. The mixture-rebalancing step (cf. the data-mixing
    * stage of any multilingual/multi-source training corpus), reduced
    * to its deterministic core so it is fully SQL-oracled.
    *
    * The keep test is pure integer arithmetic — `u·L·n_l < N·10⁶` with
    * u a 6-digit md5 draw — so Spark and DuckDB agree bit-for-bit (no
    * double rounding at the decision boundary). Scale shape: per-lang
    * counts are a tiny two-phase agg broadcast back onto the corpus;
    * the decision is map-side; one final two-phase agg per lang.
    * (Magnitudes: u < 10⁶, so the product stays under 2⁶³ up to
    * N·L ≈ 9·10¹² docs — beyond any single corpus; past that, scale u
    * down.) */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
          .cast("long").as("n_tok"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val totals = counts.agg(sum("n_lang").as("n_total"), count(lit(1)).as("n_langs"))
    val u = expr(
      "cast(conv(substr(md5(concat('mix', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 1000000")
    docs.join(broadcast(counts), Seq("lang"))
      .crossJoin(broadcast(totals))
      .withColumn("keep", u * col("n_lang") * col("n_langs") < col("n_total") * lit(1000000L))
      // integer div on both sides (Spark `div`, DuckDB `//`) — `/`
      // would be double division and could round differently
      .withColumn("rate_e6", least(lit(1000000L),
        expr("(n_total * 1000000) div (n_langs * n_lang)")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("tok_kept"),
        max(col("rate_e6")).as("rate_e6"))
      .orderBy("lang")
  }

  /** q_lm_quality: statistical language-model quality score — the
    * CCNet-style filter (Wenzek et al., "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data", LREC'20 §4.3
    * scores documents by LM perplexity and keeps the low-perplexity
    * head). Reduced to its deterministic, external-model-free core: a
    * unigram LM estimated from the corpus itself (add-one smoothing),
    * and each document scored by mean token information content
    * -log₂ p(token) in bits — common filler scores low, rare-token
    * line noise scores high.
    *
    * Scale shape: the vocabulary is a two-phase token groupBy; scoring
    * is the classic token-postings equi-join (shuffle ∝ corpus tokens,
    * never all-pairs) + one per-doc aggregate. Each token's bits value
    * is floor-scaled to an e6 INTEGER before the per-doc sum — a
    * cross-row double sum would be partition-order-dependent; integer
    * sums are exact and order-free, so the result is stable across
    * runs and partitionings. (Residual cross-engine risk: log2 is not
    * a correctly-rounded operation, so Spark and DuckDB could disagree
    * by 1 ulp exactly on a .5-of-1e-6 rounding boundary; bits depends
    * only on a token's COUNT, so the exposure is ~#distinct counts ×
    * ~1e-8 — negligible, and confined to ±1 in one tok_bits_e6.) */
  def lmQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totals = vocab.agg(sum("cnt").as("n_total"), count(lit(1)).as("v_size"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(totals))
      .withColumn("tok_bits_e6", floor(
        -log2((col("cnt") + lit(1.0)) / (col("n_total") + col("v_size")))
          * 1e6 + 0.5).cast("long"))
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_tok"),
        expr("sum(tok_bits_e6) div count(1)").as("bits_e6"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> (decontaminate(_, _)),
    "q_mixture_sample" -> (mixtureSample(_, _)),
    "q_lm_quality" -> (lmQuality(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
         |sh AS (
         |  SELECT DISTINCT doc_id, sh FROM (
         |    SELECT doc_id, unnest(CASE WHEN len(ts) >= $DecontamK
         |      THEN [array_to_string(ts[i:i+${DecontamK - 1}], ' ')
         |            for i in range(1, len(ts) - ${DecontamK - 2})]
         |      ELSE [text] END) AS sh
         |    FROM d)),
         |ev AS (SELECT sh, doc_id AS eval_doc_id FROM sh WHERE doc_id % $EvalMod = $EvalRem),
         |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % $EvalMod <> $EvalRem)
         |SELECT tr.doc_id,
         |  CAST(COUNT(DISTINCT CASE WHEN eval_doc_id IS NOT NULL THEN tr.sh END)
         |    AS BIGINT) AS n_shared_shingles,
         |  CAST(COUNT(DISTINCT eval_doc_id) AS BIGINT) AS n_eval_docs,
         |  COUNT(DISTINCT eval_doc_id) > 0 AS contaminated
         |FROM tr LEFT JOIN ev USING (sh)
         |GROUP BY tr.doc_id
         |ORDER BY tr.doc_id""".stripMargin,
    "q_mixture_sample" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tok,
        |    CAST(concat('0x', substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % 1000000 AS u
        |  FROM documents),
        |c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM d GROUP BY lang),
        |t AS (SELECT CAST(SUM(n_lang) AS BIGINT) AS n_total,
        |        CAST(COUNT(*) AS BIGINT) AS n_langs FROM c)
        |SELECT d.lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN u * n_lang * n_langs < n_total * 1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN u * n_lang * n_langs < n_total * 1000000 THEN n_tok ELSE 0 END)
        |    AS BIGINT) AS tok_kept,
        |  CAST(least(1000000, (n_total * 1000000) // (n_langs * n_lang)) AS BIGINT) AS rate_e6
        |FROM d JOIN c USING (lang) CROSS JOIN t
        |GROUP BY d.lang, n_lang, n_total, n_langs
        |ORDER BY d.lang""".stripMargin,
    "q_lm_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
        |        CAST(COUNT(*) AS BIGINT) AS v_size FROM vocab),
        |scored AS (
        |  SELECT doc_id, lang,
        |    CAST(floor(-log2((cnt + 1.0) / (n_total + v_size)) * 1e6 + 0.5)
        |      AS BIGINT) AS tok_bits_e6
        |  FROM toks JOIN vocab USING (tok) CROSS JOIN t)
        |SELECT doc_id, lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_tok,
        |  CAST(SUM(tok_bits_e6) // COUNT(*) AS BIGINT) AS bits_e6
        |FROM scored
        |GROUP BY doc_id, lang
        |ORDER BY doc_id""".stripMargin)
}
