package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Specs for the corpus-curation operators (decontamination +
  * mixture sampling). */
class CurationSpec extends SparkSpec {

  test("decontaminate flags planted train/eval 8-gram leakage") {
    val rows = Curation.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    // eval docs (id % 10 == 7) are never in the output — they are the
    // benchmark, not the training corpus
    assert(rows.forall(_.getLong(0) % 10 != 7))
    val hits = rows.filter(_.getAs[Boolean]("contaminated"))
    assert(hits.nonEmpty, "corpus's planted near-dups must straddle the split")
    hits.foreach { r =>
      assert(r.getAs[Long]("n_shared_shingles") > 0)
      assert(r.getAs[Long]("n_eval_docs") > 0)
    }
    // clean docs have zero shared shingles AND zero eval partners
    rows.filterNot(_.getAs[Boolean]("contaminated")).foreach { r =>
      assert(r.getAs[Long]("n_shared_shingles") == 0)
      assert(r.getAs[Long]("n_eval_docs") == 0)
    }
  }

  test("kl_sources matches a local smoothed-divergence recompute") {
    val buckets = 8192L
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val toks = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (r.getString(0), bucket(t))))
    val census = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mix = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val perSrc = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val na = toks.length.toLong
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val want = perSrc.keys.toSeq.sorted.map { s =>
      val ns = perSrc(s)
      var (kl9, hs9, hc9) = (0L, 0L, 0L)
      for (b <- 0L until buckets) {
        val pd = (census.getOrElse((s, b), 0L) + 1).toDouble / (ns + buckets)
        val qd = (mix.getOrElse(b, 0L) + 1).toDouble / (na + buckets)
        kl9 += math.floor(1e9 * (pd * log2(pd / qd)) + 0.5).toLong
        hs9 += math.floor(1e9 * (-pd * log2(pd)) + 0.5).toLong
        hc9 += math.floor(1e9 * (-pd * log2(qd)) + 0.5).toLong
      }
      (s, ns, kl9 / 1000, hs9 / 1000, hc9 / 1000)
    }
    val got = Curation.klSources(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) == want.map(t => (t._1, t._2)))
    // JVM log vs the engine's log2 differ below the e9 floor on a few
    // of the 8192 buckets — allow that slack, never more
    got.zip(want).foreach { case (g, w) =>
      assert((g._3 - w._3).abs <= 20L, s"${g._1} kl")
      assert((g._4 - w._4).abs <= 20L, s"${g._1} h_self")
      assert((g._5 - w._5).abs <= 20L, s"${g._1} h_cross")
    }
    // information identity: KL(p||q) = H(p,q) - H(p), up to quantization
    got.foreach { g =>
      assert((g._3 - (g._5 - g._4)).abs <= 20L, s"${g._1} identity")
      assert(g._3 >= 0L, s"${g._1} negative KL")
    }
  }

  test("gopher_rules matches a plain-Scala rule recompute and splits the corpus") {
    val got = Curation.gopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._1).toSet, "one row per document")
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val n = ws.length.toLong
      val wlen = BigInt(text.replace(" ", "").length) * 100 / n
      val sym = (BigInt(text.count(_ == '#')) +
        BigInt((text.length - text.replace("...", "").length) / 3)) * 1000000 / n
      val alpha = BigInt(ws.count(_.exists(_.isLetter))) * 1000000 / n
      val stops = ws.count(w => Curation.GopherStops.contains(w.toLowerCase)).toLong
      val keep = (n >= 50 && n <= 100000) &&
        (wlen >= 300 && wlen <= 1000) && sym <= 100000 &&
        alpha >= 800000 && stops >= 2
      assert(got(id) == ((n, wlen.toLong, sym.toLong, alpha.toLong, stops, keep)),
        s"doc $id")
    }
    // the gate must discriminate on this corpus, not rubber-stamp
    assert(got.values.exists(_._6) && got.values.exists(!_._6),
      "gopher rules pass/fail split is vacuous")
  }

  test("decontaminate is consistent with a direct shingle intersection") {
    // recompute one contaminated doc's overlap with plain Scala
    val hit = Curation.decontaminate(spark, sf)
      .filter(col("contaminated")).orderBy("doc_id").head()
    val docId = hit.getLong(0)
    def shingles(id: Long): Set[String] = {
      val text = graft.sources.Tables.documents(spark, sf)
        .filter(col("doc_id") === id).select("text").head().getString(0)
      val ts = text.split(" ", -1)
      if (ts.length < 8) Set(text)
      else ts.sliding(8).map(_.mkString(" ")).toSet
    }
    val evalIds = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 7).select("doc_id")
      .collect().map(_.getLong(0))
    val mine = shingles(docId)
    val perEval = evalIds.map(e => e -> mine.intersect(shingles(e)))
    // distinct shared shingles = intersection with the eval UNION (two
    // eval docs sharing the same shingle must not double-count)
    val sharedUnion = perEval.map(_._2).foldLeft(Set.empty[String])(_ ++ _)
    assert(sharedUnion.size == hit.getAs[Long]("n_shared_shingles"),
      s"doc $docId shared-shingle count")
    assert(perEval.count(_._2.nonEmpty) == hit.getAs[Long]("n_eval_docs"))
  }

  test("lm quality matches a hand-computed unigram model on a tiny corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // "a a a b" + "c d": vocab {a:3, b:1, c:1, d:1}, total 6, V 4
    Seq((0L, "a a a b", "en", "s", 7L), (1L, "c d", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.lmQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tok"), r.getAs[Long]("bits_e6"))).toMap
    def tokBits(cnt: Long): Long =
      math.floor(-(math.log((cnt + 1.0) / 10.0) / math.log(2.0)) * 1e6 + 0.5).toLong
    val doc0 = (3 * tokBits(3) + tokBits(1)) / 4
    val doc1 = (2 * tokBits(1)) / 2
    assert(got(0L) == ((4L, doc0)))
    assert(got(1L) == ((2L, doc1)))
    // the common-token doc carries less information per token
    assert(doc0 < doc1)
  }

  test("streaming decontamination emits exactly the batch pair list") {
    val pairs = graft.streaming.StreamingQueries.streamDecontam(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.distinct.length == pairs.length, "state-store dedup failed")
    // the stream's contaminated doc set must equal the batch operator's
    val batch = Curation.decontaminate(spark, sf)
      .filter(col("contaminated")).collect()
    assert(pairs.map(_._1).toSet == batch.map(_.getLong(0)).toSet)
    // and per-doc partner counts must agree with n_eval_docs
    val perDoc = pairs.groupBy(_._1).view.mapValues(_.length).toMap
    batch.foreach { r =>
      assert(perDoc(r.getLong(0)) == r.getAs[Long]("n_eval_docs"), s"doc ${r.getLong(0)}")
    }
    pairs.foreach { case (train, eval) =>
      assert(train % 10 != 7 && eval % 10 == 7, "side leakage across the split")
    }
  }

  test("mixture sampling downsamples overrepresented languages toward uniform") {
    val rows = Curation.mixtureSample(spark, sf).collect()
    assert(rows.length >= 2)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val target = total.toDouble / rows.length
    rows.foreach { r =>
      val (n, kept, rate) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("rate_e6"))
      assert(kept <= n)
      if (n <= target) {
        // under-represented languages are never downsampled
        assert(rate == 1000000L, s"${r.getString(0)} rate")
        assert(kept == n, s"${r.getString(0)} kept")
      } else {
        assert(rate < 1000000L, s"${r.getString(0)} rate")
        // the md5 draw tracks the rate closely on hundreds of docs
        val expected = n * rate / 1000000.0
        assert(math.abs(kept - expected) <= math.max(10.0, 0.3 * expected),
          s"${r.getString(0)}: kept $kept vs expected ~$expected")
      }
    }
  }

  test("export shards partition the corpus completely, balanced, with live fingerprints") {
    val rows = SparkEntry.queries("q_export_shards")(spark, sf).collect()
    assert(rows.length == graft.operators.Curation.NShards)
    assert(rows.map(_.getAs[Long]("shard")).sorted.toList ==
      (0L until graft.operators.Curation.NShards).toList)
    // complete partition: shard doc counts sum to the corpus
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // hash balance: no shard more than 2x another (md5 uniformity at
    // hundreds of docs per shard)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= 2 * counts.min,
      s"shard imbalance: ${counts.mkString(",")}")
    // fingerprints are live (xor of many 60-bit hashes collapsing to 0
    // or duplicating across shards would mean a degenerate hash column)
    val fps = rows.map(_.getAs[Long]("content_fp"))
    assert(fps.distinct.length == fps.length && fps.forall(_ != 0L))
    // manifest arithmetic: a shard's token count can't exceed its chars
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Long]("min_doc_id") <= r.getAs[Long]("max_doc_id"))
    }
  }

  test("dataset card shares are a complete partition of the corpus") {
    val rows = SparkEntry.queries("q_dataset_card")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // truncated e6 shares: each ≤ its exact value, sum within one
    // truncation-unit per row of 10⁶, never over
    val docShare = rows.map(_.getAs[Long]("doc_share_e6")).sum
    assert(docShare <= 1000000L && docShare > 1000000L - rows.length,
      s"doc shares sum to $docShare over ${rows.length} cells")
    val tokShare = rows.map(_.getAs[Long]("tok_share_e6")).sum
    assert(tokShare <= 1000000L && tokShare > 1000000L - rows.length)
    rows.foreach { r =>
      // integer mean is exactly (tokens*100) div docs
      assert(r.getAs[Long]("mean_tok_e2") ==
        r.getAs[Long]("n_tokens") * 100 / r.getAs[Long]("n_docs"))
    }
  }

  test("stratified sample draws exactly ceil(n/5) per stratum with dense ranks") {
    import org.apache.spark.sql.functions._
    val picks = SparkEntry.queries("q_stratified_sample")(spark, sf).collect()
    assert(picks.nonEmpty)
    val strata = graft.sources.Tables.documents(spark, sf)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bySt = picks.groupBy(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    // every stratum of the corpus is represented — the quota floor is 1
    assert(bySt.keySet == strata.keySet)
    bySt.foreach { case (k, rows) =>
      val n = strata(k)
      val budget = (n + 4) / 5
      assert(rows.length == budget, s"stratum $k: ${rows.length} picks, want $budget")
      assert(rows.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to budget),
        s"stratum $k ranks not dense")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_stratum") == n && r.getAs[Long]("budget") == budget)
      }
    }
  }

  test("gini_tokens equals a local brute-force Gini over exact token counts") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_gini_tokens")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tok_total"), r.getAs[Long]("gini_e6"))).toMap
    val counts = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit(graft.operators.TextAnalysis.TokenRe), lit(0))).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    counts.groupBy(_._1).foreach { case (src, rows) =>
      val xs = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      val ix = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val gini = ((2 * ix - BigInt(n + 1) * tot) * 1000000) / (BigInt(n) * tot)
      val (gn, gt, gg) = got(src)
      assert(gn == n && gt == tot && gg == gini.toLong,
        s"$src: got ($gn,$gt,$gg) want ($n,$tot,$gini)")
      assert(gg >= 0 && gg < 1000000L)
    }
  }

  test("ccnet buckets tertile each language in score order with balanced sizes") {
    val rows = SparkEntry.queries("q_ccnet_buckets")(spark, sf).collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    val docTotals = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bucket"))
      assert(sorted.map(_.getAs[Long]("bucket")).sameElements(1L to sorted.length),
        s"$lang buckets not dense")
      assert(sorted.length <= 3)
      assert(sorted.map(_.getAs[String]("band")).toSeq ==
        Seq("head", "middle", "tail").take(sorted.length))
      // NTILE balance: sizes descend by at most one from first to last
      val sizes = sorted.map(_.getAs[Long]("n_docs"))
      assert(sizes.sum == docTotals(lang))
      assert(sizes.max - sizes.min <= 1, s"$lang sizes ${sizes.mkString(",")}")
      // score bands are ordered: a later bucket never holds a cheaper doc
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("bits_max") <= b.getAs[Long]("bits_min"),
            s"$lang bucket overlap")
        case _ =>
      }
    }
  }

  test("js divergence matches a plain-Scala recompute and stays in [0, ln2]") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val census = docs
      .flatMap { case (s, t) => t.split(" ", -1).map(tok => (s, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = census.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val ln2 = graft.operators.Curation.Ln2E6
    def e6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val srcs = totals.keys.toSeq.sorted
    val want = (for {
      (a, ia) <- srcs.zipWithIndex; b <- srcs.drop(ia + 1)
    } yield {
      val (na, nb) = (totals(a), totals(b))
      val shared = census.keys.collect { case (`a`, t) if census.contains((b, t)) => t }.toSeq
      val sa = shared.map { t =>
        val (ya, yb) = (census((a, t)), census((b, t)))
        BigInt(ya) * e6(math.log((2.0 * ya * nb) / (ya.toDouble * nb + yb.toDouble * na)))
      }.sum
      val sb = shared.map { t =>
        val (ya, yb) = (census((a, t)), census((b, t)))
        BigInt(yb) * e6(math.log((2.0 * yb * na) / (ya.toDouble * nb + yb.toDouble * na)))
      }.sum
      val yaSum = shared.map(t => census((a, t))).sum
      val ybSum = shared.map(t => census((b, t))).sum
      val kla = (sa + BigInt(na - yaSum) * ln2) / na
      val klb = (sb + BigInt(nb - ybSum) * ln2) / nb
      val jsd = ((kla + klb) / 2).toLong
      (a, b) -> ((shared.size.toLong, jsd, jsd * 1000000L / ln2))
    }).toMap
    val got = SparkEntry.queries("q_js_divergence")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty)
    assert(got == want)
    got.values.foreach { case (_, jsd, norm) =>
      assert(jsd >= 0 && jsd <= ln2, s"JS out of [0, ln2]: $jsd")
      assert(norm >= 0 && norm <= 1000000L)
    }
  }

  test("logodds terms match a plain-Scala Monroe recompute cell for cell") {
    val got = Curation.logoddsTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs
      .flatMap { case (s, t) => t.split(" ", -1).map(tok => (s, tok)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val yAll = bySrc.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val nSrc = bySrc.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    val nAll = yAll.values.sum
    val v = yAll.size.toLong
    def lnE6(num: Double, den: Double): Long =
      math.floor(math.log(num / den) * 1e6 + 0.5).toLong
    val expected = bySrc.toSeq
      .collect { case ((s, tok), y) if y >= Curation.LogoddsMinCount =>
        val yr = yAll(tok) - y
        val delta = lnE6(y + 1.0, nSrc(s) + v - y - 1.0) -
          lnE6(yr + 1.0, nAll - nSrc(s) + v - yr - 1.0)
        val z = math.floor(delta.toDouble / 1e6 /
          math.sqrt(1.0 / (y + 1) + 1.0 / (yr + 1)) * 1e3 + 0.5).toLong
        (s, tok, y, yr, delta, z)
      }
      .groupBy(_._1).toSeq
      .flatMap { case (_, ts) =>
        ts.sortBy(t => (-t._6, t._2)).take(Curation.LogoddsTopK).zipWithIndex
          .map { case ((s, tok, y, yr, d, z), i) =>
            (s, tok) -> ((y, yr, d, z, i + 1L))
          }
      }.toMap
    assert(got.nonEmpty)
    assert(got == expected)
    // the board genuinely discriminates: at least one source's top term
    // differs from another's (shared filler can't top every board)
    val tops = got.collect { case ((s, tok), (_, _, _, _, 1L)) => (s, tok) }
    assert(tops.map(_._2).toSet.size > 1, "all sources share one top term")
  }
}
