package graft

import org.apache.spark.sql.DataFrame

/** Recall of the approximate ANN paths against the exact brute-force
  * top-k on the same embeddings — the quality analog of the reference's
  * model-validation sweep (um/re/emr/ValidateModels.scala:1-40 measures
  * model quality before a map is promoted). Pinned floors make a future
  * bucketing/quantizer change that silently trades recall for speed a
  * test failure instead of a quiet degradation. Runs at sf0.01: a
  * larger corpus than the default spec sf, so buckets have meaningful
  * occupancy and recall is not trivially 1.0.
  */
class AnnRecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Mean over queries of |approx ∩ exact| / |exact| (recall@K, K=5 —
    * Similarity.K). A query the approximate path returns nothing for
    * counts as zero recall, not a skip. */
  private def recall(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty[Long]).intersect(ex).size.toDouble / ex.size
    }
    per.sum / per.size
  }

  test("LSH and IVF ANN meet their recall@5 floors vs exact top-k") {
    val exact = topSets(graft.operators.Similarity.annCosine(spark, dir))
    assert(exact.nonEmpty, "exact baseline returned no queries")
    val lsh = recall(topSets(graft.operators.Similarity.annLshCosine(spark, dir)), exact)
    val ivf = recall(topSets(graft.operators.Similarity.annIvfCosine(spark, dir)), exact)
    info(f"recall@5: lsh=$lsh%.4f ivf=$ivf%.4f over ${exact.size} queries")
    // measured r10 on this corpus: lsh = 0.58 (8-table OR-amplified
    // forest, radius-1 multiprobe per table; the r9 single-table
    // multiprobe measured 0.10, single-bucket 0.04), ivf = 0.54
    // (nprobe 4 of 16 cells; 0.36 at nprobe 2). The synthetic
    // embeddings are only weakly clustered, so absolute recall is
    // bounded by the probed corpus fraction — the floors pin the
    // measured level with margin, which is what a silent
    // recall-for-speed regression would break.
    assert(lsh >= 0.45, f"LSH recall@5 $lsh%.4f below floor 0.45")
    assert(ivf >= 0.45, f"IVF recall@5 $ivf%.4f below floor 0.45")
  }

  test("forest sweep is monotone in tables/radius and lands on the search config") {
    val rows = graft.operators.Similarity.forestSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // prefix-nested configs: candidates and recall never shrink as L
    // grows, and radius-1 dominates radius-0 at every L
    val ls = rows.keys.map(_._1).toSeq.distinct.sorted
    for (r <- Seq(0L, 1L); (a, b) <- ls.zip(ls.tail)) {
      assert(rows((a, r))._1 <= rows((b, r))._1, s"n_cand L$a>$b r$r")
      assert(rows((a, r))._4 <= rows((b, r))._4, s"recall L$a>$b r$r")
    }
    ls.foreach { l =>
      assert(rows((l, 0L))._1 <= rows((l, 1L))._1, s"n_cand radius L$l")
      assert(rows((l, 0L))._4 <= rows((l, 1L))._4, s"recall radius L$l")
    }
    // the (max tables, radius 1) cell IS q_ann_lsh_cosine's candidate
    // set, and candidate recall equals result recall at this K (an
    // exact top-K candidate is only outranked by better exact
    // neighbors) — so the sweep's corner must equal the search path's
    // measured hits exactly
    val (_, hits, nExact, _) = rows((ls.max, 1L))
    val exact = topSets(graft.operators.Similarity.annCosine(spark, dir))
    val lsh = topSets(graft.operators.Similarity.annLshCosine(spark, dir))
    val lshHits = exact.map { case (q, ex) =>
      lsh.getOrElse(q, Set.empty[Long]).intersect(ex).size
    }.sum
    assert(nExact == exact.valuesIterator.map(_.size).sum)
    assert(hits == lshHits, s"sweep corner $hits vs search path $lshHits")
  }

  test("forest-fed kNN graph recovers the exact mutual-edge set") {
    // the 10^9-vector path: the same mutual top-K tail over forest
    // candidates instead of all pairs — edge recall vs the exact graph
    // is the quality dial (a candidate set that misses a true top-K
    // neighbor can drop a mutual edge)
    def edges(df: DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = edges(graft.operators.Similarity.knnGraph(spark, dir))
    val approx = edges(graft.operators.Similarity.knnGraphApprox(spark, dir))
    assert(exact.nonEmpty, "exact graph has no mutual edges; test is vacuous")
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // spurious edges: a pair mutual within the candidate-restricted
    // rankings but not in the exact graph — report alongside recall
    val precision =
      if (approx.isEmpty) 1.0
      else approx.intersect(exact).size.toDouble / approx.size
    info(f"edge recall=$recall%.4f precision=$precision%.4f " +
      f"(exact ${exact.size} edges, approx ${approx.size})")
    assert(recall >= 0.45, f"edge recall $recall%.4f below floor 0.45")
  }
}
