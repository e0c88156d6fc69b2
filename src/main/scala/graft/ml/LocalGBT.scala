package graft.ml

import org.apache.spark.ml.linalg.Vector

/** One hashed-feature candidate row routed to the in-task trainer. */
case class TfRow(o_orderkey: Long, domain: String, tf: Vector,
    location_norm: Double, label: Double)

/** One domain's train+eval summary (q_gbt_train_eval output row,
  * pre-accuracy). */
case class GbtDomainRow(domain: String, n_train: Long, n_test: Long,
    tp: Long, tn: Long, fp: Long, fn: Long,
    n_urls: Long, top_label_hits: Long, n_features: Long)

/** A fitted in-task boosted ensemble: margin = f0 + Σ stepSize·treeₘ(x)
  * — the same boosting-margin confidence the distributed path reads off
  * `rawPrediction` (reference Transformer.confidenceGBT). */
final class LocalGBTModel(val f0: Double, val stepSize: Double,
    val trees: Array[LocalGBT.Tree]) extends Serializable {
  def margin(x: Array[Double]): Double = {
    var s = f0
    var i = 0
    while (i < trees.length) { s += stepSize * trees(i).predict(x); i += 1 }
    s
  }
}

/** Executor-local gradient-boosted trees — the in-task trainer behind
  * q_gbt_train_eval's small-domain path.
  *
  * The reference trains one GBT per web domain in a driver loop
  * (GBTDomainSuperParSelectCandid.scala:31-35 `list.par`); at thousands
  * of domains that serializes ~N/pool distributed fits with per-fit
  * scheduling overhead — the r6-flagged scale-killer. Here domains whose
  * capped sample fits one task are instead trained INSIDE a single
  * distributed job (`groupByKey(domain).flatMapGroups`), so the cluster
  * runs min(#domains, #cores) independent fits concurrently with zero
  * per-fit job scheduling; only oversized domains fall back to
  * distributed Spark ML fits.
  *
  * Standard gradient boosting with logistic loss on y∈{-1,+1}
  * (L = log(1+e^(-2yF)), the loss family Spark ML's GBTClassifier
  * uses): depth-limited regression trees fit to pseudo-residuals
  * 2y/(1+e^(2yF)) on equi-depth binned features, leaf value = mean
  * residual, shrinkage 0.1. Deterministic by construction: callers
  * pre-sort rows (accumulation order), bin thresholds come from exact
  * sorted-sample quantile positions, and split ties break on the lowest
  * (feature, bin). */
object LocalGBT {

  /** Flattened binary tree: node i has feature/threshold or a leaf
    * value; children at left(i)/right(i). Predicts on RAW feature
    * values (thresholds are bin upper edges), so test rows need no
    * binning. */
  final class Tree(val feature: Array[Int], val threshold: Array[Double],
      val left: Array[Int], val right: Array[Int],
      val value: Array[Double]) extends Serializable {
    def predict(x: Array[Double]): Double = {
      var i = 0
      while (feature(i) >= 0)
        i = if (x(feature(i)) <= threshold(i)) left(i) else right(i)
      value(i)
    }
  }

  private val MaxBins = 32
  private val MinGain = 1e-12

  def fit(xs: Array[Array[Double]], labels01: Array[Double],
      maxIter: Int, maxDepth: Int, stepSize: Double = 0.1): LocalGBTModel = {
    val n = xs.length
    val d = if (n == 0) 0 else xs(0).length
    val y = labels01.map(v => if (v > 0.5) 1.0 else -1.0)
    val yBar = math.max(-1 + 1e-6, math.min(1 - 1e-6, y.sum / math.max(n, 1)))
    val f0 = 0.5 * math.log((1 + yBar) / (1 - yBar))
    if (n == 0) return new LocalGBTModel(f0, stepSize, Array.empty)

    // equi-depth bin thresholds per feature from the sorted training
    // values (deterministic quantile positions); bin = #thresholds ≤ x
    val thresholds: Array[Array[Double]] = Array.tabulate(d) { j =>
      val sorted = Array.tabulate(n)(i => xs(i)(j)).sorted
      val cuts = (1 until MaxBins)
        .map(b => sorted((b.toLong * n / MaxBins).toInt.min(n - 1)))
        .distinct.toArray
      // drop the max value as a cut: "≤ max" sends everything left
      if (cuts.nonEmpty && cuts.last == sorted(n - 1)) cuts.init else cuts
    }
    // bin index = #cuts strictly below x, so "bin ≤ b" ⟺ "x ≤ cut(b)"
    // — the exact raw-value comparison Tree.predict replays on test rows
    val bins: Array[Array[Int]] = Array.tabulate(n) { i =>
      Array.tabulate(d) { j =>
        val t = thresholds(j)
        val x = xs(i)(j)
        var lo = 0; var hi = t.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (t(mid) < x) lo = mid + 1 else hi = mid
        }
        lo
      }
    }

    val f = Array.fill(n)(f0)
    val trees = (0 until maxIter).map { _ =>
      val r = Array.tabulate(n)(i => 2 * y(i) / (1 + math.exp(2 * y(i) * f(i))))
      val tree = fitTree(xs, bins, thresholds, r, maxDepth)
      var i = 0
      while (i < n) { f(i) += stepSize * tree.predict(xs(i)); i += 1 }
      tree
    }.toArray
    new LocalGBTModel(f0, stepSize, trees)
  }

  /** One variance-gain regression tree on the pseudo-residuals, grown
    * depth-first to `maxDepth` over the precomputed bins. */
  private def fitTree(xs: Array[Array[Double]], bins: Array[Array[Int]],
      thresholds: Array[Array[Double]], r: Array[Double], maxDepth: Int): Tree = {
    val d = thresholds.length
    val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    val thr = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    val value = scala.collection.mutable.ArrayBuffer.empty[Double]

    def newNode(): Int = {
      feature += -1; thr += 0.0; left += -1; right += -1; value += 0.0
      feature.length - 1
    }

    def grow(node: Int, rows: Array[Int], depth: Int): Unit = {
      var sumT = 0.0
      var den = 0.0
      rows.foreach { i =>
        sumT += r(i)
        den += math.abs(r(i)) * (2 - math.abs(r(i)))
      }
      // Friedman's TreeBoost leaf for logistic loss: the single Newton
      // step Σr / Σ|r|(2−|r|), not the mean residual — a mean-residual
      // leaf under-steps badly on imbalanced classes (margins never
      // cross zero within few iterations)
      value(node) = sumT / math.max(den, 1e-10)
      if (depth >= maxDepth || rows.length < 2) return
      // per-(feature, bin) histograms in one pass over the node's rows
      var bestGain = MinGain
      var bestF = -1; var bestB = -1
      val base = sumT * sumT / rows.length
      var j = 0
      while (j < d) {
        val nb = thresholds(j).length + 1
        if (nb > 1) {
          val cnt = new Array[Int](nb)
          val sum = new Array[Double](nb)
          rows.foreach { i => val b = bins(i)(j); cnt(b) += 1; sum(b) += r(i) }
          var cl = 0; var sl = 0.0
          var b = 0
          while (b < nb - 1) { // split: bin ≤ b goes left
            cl += cnt(b); sl += sum(b)
            if (cl > 0 && cl < rows.length) {
              val sr = sumT - sl
              val gain = sl * sl / cl + sr * sr / (rows.length - cl) - base
              if (gain > bestGain) { bestGain = gain; bestF = j; bestB = b }
            }
            b += 1
          }
        }
        j += 1
      }
      if (bestF < 0) return
      val (l, rr) = rows.partition(i => bins(i)(bestF) <= bestB)
      feature(node) = bestF
      thr(node) = thresholds(bestF)(bestB)
      val ln = newNode(); val rn = newNode()
      left(node) = ln; right(node) = rn
      grow(ln, l, depth + 1)
      grow(rn, rr, depth + 1)
    }

    val root = newNode()
    grow(root, Array.range(0, r.length), 0)
    new Tree(feature.toArray, thr.toArray, left.toArray, right.toArray, value.toArray)
  }

  /** Full in-task pipeline for one domain: URL-grouped 70/30 split,
    * featurizer fit mirroring [[TopKByAvgTFIDF.fit]] bucket-for-bucket
    * (df = numNonZeros, mean TF-IDF = idf·mean(tf), top-k with ties),
    * boosted fit, and the reference eval (confusion counts + per-URL
    * argmax-confidence selection). Rows are sorted first so every
    * accumulation is order-independent. */
  def trainEvalDomain(dom: String, rowsIn: Array[TfRow],
      maxIter: Int, maxDepth: Int, numFeatures: Int = 1000,
      minDocFreq: Int = 5, topK: Int = 100): GbtDomainRow = {
    val rows = rowsIn.sortBy(r => (r.o_orderkey, r.location_norm))
    val (train, test) = rows.partition(_.o_orderkey % 10 < 7)
    val m = train.length
    if (m == 0)
      return GbtDomainRow(dom, 0L, test.length.toLong,
        0L, test.count(_.label == 0.0).toLong, 0L, test.count(_.label == 1.0).toLong,
        test.map(_.o_orderkey).distinct.length.toLong, 0L, 1L)

    // featurizer fit (TopKByAvgTFIDF.fit, executed locally)
    val meanTf = new Array[Double](numFeatures)
    val docFreq = new Array[Double](numFeatures)
    train.foreach { r =>
      r.tf.foreachActive { (j, v) =>
        if (v != 0.0) { meanTf(j) += v; docFreq(j) += 1 }
      }
    }
    val idf = Array.tabulate(numFeatures) { j =>
      if (docFreq(j) >= minDocFreq) math.log((m + 1.0) / (docFreq(j) + 1.0)) else 0.0
    }
    val meanTfidf = Array.tabulate(numFeatures)(j => meanTf(j) / m * idf(j))
    val indices = TopKByAvgTFIDF.selectIndices(meanTfidf, topK)
    def feat(r: TfRow): Array[Double] = {
      val out = new Array[Double](indices.length + 1)
      var i = 0
      while (i < indices.length) { out(i) = r.tf(indices(i)) * idf(indices(i)); i += 1 }
      out(indices.length) = r.location_norm
      out
    }

    val model = fit(train.map(feat), train.map(_.label), maxIter, maxDepth)
    val scored = test.map(r => (r.o_orderkey, r.label, model.margin(feat(r))))
    var tp = 0L; var tn = 0L; var fp = 0L; var fn = 0L
    scored.foreach { case (_, label, mg) =>
      val pred = if (mg > 0) 1.0 else 0.0
      if (label == 1.0 && pred == 1.0) tp += 1
      else if (label == 0.0 && pred == 0.0) tn += 1
      else if (label == 0.0 && pred == 1.0) fp += 1
      else fn += 1
    }
    // per-URL argmax-confidence candidate (Transformer.scala:322-337),
    // ties broken like the distributed path's (confidence desc, label
    // desc) window
    val byUrl = scored.groupBy(_._1)
    val hits = byUrl.valuesIterator
      .map(_.maxBy { case (_, label, mg) => (mg, label) })
      .count(_._2 == 1.0)
    GbtDomainRow(dom, m.toLong, test.length.toLong, tp, tn, fp, fn,
      byUrl.size.toLong, hits.toLong, indices.length + 1L)
  }
}
