package graft

/** Row-identity of the forest's two scoring plans (r13 ADVICE item):
  * the sliced/canonical large-corpus path (canonical-orientation dedup
  * + adaptive id_a-hash slice scoring + 24-byte mirror) is claimed
  * bit-identical to the direct small-corpus join, but the 8M-pair gate
  * never trips at sandbox scale, so without this spec the equivalence
  * was verified only implicitly by one-off sf3 runs. Here the
  * injectable threshold forces the large path at sf0.001 and the FULL
  * registered results must match the direct plan's — for both scored
  * shapes: the IEEE-commutative cosine substrate (q_knn_graph_approx
  * via forestScored) and the orientation-sensitive squared-distance
  * variant (q_intrinsic_dim_approx, which mirrors 16-byte id pairs and
  * scores DIRECTED). */
class ForestSlicePathSpec extends SparkSpec {

  private def rows(q: String): Seq[Seq[Any]] =
    SparkEntry.queries(q)(spark, sf).collect().map(_.toSeq).toIndexedSeq

  test("forced slice path is row-identical to the direct plan") {
    val sim = graft.operators.Similarity
    val qs = Seq("q_knn_graph_approx", "q_intrinsic_dim_approx")
    val direct = qs.map(q => q -> rows(q)).toMap
    val saved = sim.ForestSliceThreshold
    try {
      sim.ForestSliceThreshold = 0.0 // every corpus takes the sliced plan
      qs.foreach { q =>
        val sliced = rows(q)
        assert(sliced.nonEmpty, s"$q returned no rows under the forced slice path")
        assert(sliced == direct(q), s"$q: sliced path diverges from direct plan")
      }
    } finally sim.ForestSliceThreshold = saved
  }
}
