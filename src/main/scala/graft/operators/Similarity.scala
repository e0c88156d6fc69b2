package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2 rows 26-27).
  *
  * q_ann_cosine is the exact baseline: broadcast the (small) query set
  * against the corpus scan and rank by cosine — corpus is never
  * shuffled for the join, only the scored (query × corpus) rows move,
  * and at scale that product is exactly what makes brute force
  * infeasible. q_ann_lsh_cosine is the scale path: sign-random-
  * projection LSH (Charikar, STOC'02) buckets both sides, so the join
  * is bucket-local and the scored row count drops from |Q|·|C| to
  * Σ_bucket |Q_b|·|C_b|.
  *
  * Determinism: dot products fold left-to-right over index order with
  * every element cast to double first, so Spark and DuckDB produce
  * bit-identical IEEE sums for the oracle compare.
  */
object Similarity {

  private val K = 5
  /** Query subset: every 50th vector. */
  private def isQuery(id: Column): Column = id % 50 === 0

  /** Left-fold dot product of two double arrays (order-pinned). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** q_ann_cosine: exact top-k cosine neighbors for the query subset.
    * The query side (with pre-computed norms) is broadcast; the rank
    * window partitions on query_id (cardinality = |Q|). */
  def annCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = emb.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos_raw"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  private val Planes = 8

  /** Deterministic Rademacher (±1) hyperplane p over dims 0..63, derived
    * from xxhash64 — reproducible across runs and executors. */
  private def planeSign(p: Int, i: Column): Column =
    (xxhash64(concat(lit(s"plane$p/"), i.cast("string")))
      .bitwiseAND(lit(1L)) * 2 - 1).cast("double")

  /** Sign-projection bucket id: bit p = [v · r_p > 0]. */
  private def lshBucket(v: Column): Column =
    (0 until Planes).map { p =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(63)), (x, i) => x * planeSign(p, i)),
        lit(0.0), _ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** q_ann_lsh_cosine: bucketed approximate top-k — queries only score
    * candidates in their own sign-projection bucket, so the join is a
    * bucket-keyed equi-join (shuffle ∝ corpus, scoring ∝ bucket sizes).
    * Recall < 1 by design; rows-only oracle. */
  def annLshCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("bucket", lshBucket(col("v")))
    val q = emb.filter(isQuery(col("vec_id")))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val scored = emb.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("cos_raw"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cosine"), col("rank"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_cosine" -> (annCosine(_, _)),
    "q_ann_lsh_cosine" -> (annLshCosine(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q_ann_cosine" ->
      s"""WITH emb AS (
         |  SELECT vec_id,
         |    [CAST(x AS DOUBLE) for x in embedding] AS v
         |  FROM embeddings),
         |nrm AS (
         |  SELECT vec_id, v,
         |    sqrt(list_reduce([v[i] * v[i] for i in range(1, len(v) + 1)], (a, b) -> a + b)) AS nrm
         |  FROM emb),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    list_reduce([q.v[i] * c.v[i] for i in range(1, len(q.v) + 1)], (a, b) -> a + b)
         |      / (q.nrm * c.nrm) AS cos_raw
         |  FROM nrm q JOIN nrm c ON q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos_raw,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
         |FROM ranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin)
}
