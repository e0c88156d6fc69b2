package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the co-order product graph (parts
  * that appear in the same order are linked — the co-purchase graph
  * every recommender bootstrap builds from order lines).
  *
  * Companion to Dedup's connected-components (pointer-jumping): this
  * family holds the FIXED-ITERATION message-passing algorithms, whose
  * Spark-first shape is k rounds of (join ranks to edges) → two-phase
  * aggregate by destination — shuffle ∝ edges per round, never
  * node-pair-quadratic, the standard Pregel-on-DataFrames reduction.
  */
object Graph {

  /** PageRank iterations / damping (e3 integer: 0.85 ≡ 850/1000). */
  private val PrIters = 3
  private val PrDampE3 = 850L

  /** q_pagerank: PageRank over the co-order part graph, ALL-INTEGER
    * arithmetic so the result is bit-exact across engines: ranks live
    * at e6 scale, each round sends contrib = r div deg along every
    * edge and re-ranks as (1−d)·10⁶ + (d·Σcontrib) div 1 — i.e.
    * 150000 + (850·Σ) div 1000. Integer truncation loses a bounded
    * sub-ppm of mass per round (the price of determinism; float
    * PageRank would be shuffle-order-dependent and unoracle-able).
    *
    * Scale shape: edges = per-order self-join of DISTINCT (order,
    * part) — fan-out bounded by lines-per-order², a constant (≤ ~7 in
    * TPC-H-shaped data); degrees and each round's re-rank are
    * two-phase aggs; each of the [[PrIters]] rounds is one join on the
    * edge src key + one shuffle by dst. The edge set is cached across
    * rounds (rebuilt 3× otherwise). The oracle unrolls the same three
    * rounds as nested CTEs — recursion-free, so it runs on any engine
    * that bans aggregates in recursive terms. */
  /** Directed co-order edge set (both directions) — shared by
    * [[pagerank]] and [[degreeDist]]. */
  private def coOrderEdges(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    pairs.as("a")
      .join(pairs.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
  }

  /** q_degree_dist: the log₂-binned degree distribution of the
    * co-order graph — the first diagnostic read before ANY iterative
    * graph job (a heavy-tailed histogram says "salt the hubs before
    * PageRank/CC", a flat one says the plain shuffles below are
    * safe). Binning is EXACT-integer: bin = ⌊log₂ deg⌋ via the binary
    * string length, never float log at power-of-two boundaries.
    *
    * Scale shape: degree is one two-phase agg over the edge set; the
    * histogram is a second agg over the node-sized degree table —
    * nothing beyond the edge build touches corpus scale. */
  def degreeDist(spark: SparkSession, dir: String): DataFrame =
    coOrderEdges(spark, dir)
      .groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumn("bin", (length(bin(col("deg"))) - 1).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_nodes"),
        min("deg").as("min_deg"), max("deg").as("max_deg"))
      .orderBy("bin")

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val edges = coOrderEdges(spark, dir)
    // degrees + edge set materialize ONCE via localCheckpoint (re-joined
    // every round otherwise) and auto-release on GC — cache() would pin
    // both in the CacheManager for the session lifetime
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val ed = edges.join(deg, "src").localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
    (1 to PrIters).foreach { _ =>
      // localCheckpoint truncates the growing rank lineage (the
      // dedup_clusters pattern): each round's plan reads the
      // materialized edge set + last round's MATERIALIZED ranks
      // (∝ nodes, tiny) — never re-deriving the source scans round
      // after round.
      ranks = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr(s"($PrDampE3 * s) div 1000")).as("r"))
        .localCheckpoint()
    }
    ranks
      .join(deg.select(col("src").as("node"), col("deg")), "node")
      .select(col("node"), col("deg"), col("r").as("pr_e6"))
      .orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (pagerank(_, _)),
    "q_degree_dist" -> (degreeDist(_, _)))

  /** The same three rounds, unrolled as nested CTEs. */
  private val pagerankOracle: String = {
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    CAST(150000 + ($PrDampE3 * SUM(p.r // d.deg)) // 1000 AS BIGINT) AS r
         |  FROM r${i - 1} p
         |  JOIN edges e ON e.src = p.node
         |  JOIN deg d ON d.src = p.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM pairs a JOIN pairs b USING (l_orderkey)
       |  WHERE a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
       |$rounds
       |SELECT r$PrIters.node, deg.deg, r$PrIters.r AS pr_e6
       |FROM r$PrIters JOIN deg ON deg.src = r$PrIters.node
       |ORDER BY node""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q_pagerank" -> pagerankOracle,
    // same edges/deg CTEs; bin via binary-string length (exact integer)
    "q_degree_dist" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM pairs a JOIN pairs b USING (l_orderkey)
        |  WHERE a.l_partkey <> b.l_partkey),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)
        |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(MIN(deg) AS BIGINT) AS min_deg,
        |  CAST(MAX(deg) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1 ORDER BY bin""".stripMargin)
}
