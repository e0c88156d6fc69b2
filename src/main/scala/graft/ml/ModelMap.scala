package graft.ml

import graft.functions.{CharGrams, PriceCandidates, Text}
import graft.sources.Tables
import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One domain's trained scorer: the text featurizer fitted on that
  * domain's training split plus its GBT — the per-domain tuple the
  * reference ships to storage and broadcasts into the streaming pipe
  * (um/re/streaming/Htmls2PredsPipe.scala:89-112 loads
  * `HashMap[domain → (GBTModel, idf, selectedIndices)]`;
  * um/re/emr/BuildAndSaveModels.scala:36-44 builds and saves it).
  * Both members are Serializable, so the whole map broadcasts. */
case class DomainModel(featurizer: TopKByAvgTFIDFModel, gbt: GBTClassificationModel)

/** The persisted per-domain model map and its lifecycle: train → save →
  * (merge) → load → broadcast → per-record scoring.
  *
  * Storage layout under a map root `path`:
  * {{{
  *   $path/meta                    one parquet row per domain:
  *                                 (domain, run_id, version)
  *   $path/domains/<dom>/featurizer  TopKByAvgTFIDFModel (ML write)
  *   $path/domains/<dom>/gbt         GBTClassificationModel (native ML write)
  * }}}
  *
  * `merge` implements the reference's model-map refresh
  * (um/re/emr/MergedMapModels.scala): a new training run's per-domain
  * models are merged into the live map, newest `run_id` winning per
  * domain — so a nightly retrain of a subset of domains updates just
  * those entries.
  */
object ModelMap {

  /** Bump when the on-disk layout or the page/feature construction
    * changes — a version-mismatched map is retrained, never reused. */
  private val FormatVersion = 2

  /** Event domains with trained models. `signup` deliberately has none
    * (exercises the missingModel path) and `error` pages carry no
    * price-shaped candidates (exercises bothFailed). */
  val TrainedDomains: Seq[String] =
    Seq("view", "click", "purchase").map(_ + ".example.com")

  /** File-metadata fingerprint of the training corpus: MD5 over the
    * sorted (name, size, mtime) of the events parquet files, read from
    * the FileSystem listing — O(#files), no data scan. Folded into
    * [[defaultPath]] so a regenerated dataset at the same dir path
    * invalidates the persisted map — without it, a stale trained map
    * under /tmp would be silently reused and surface as a confusing
    * oracle mismatch instead of a retrain. At 100 TB the row-content
    * alternative (count + summed crc32) would full-scan the table just
    * to name a cache path (and a Long crc32 sum overflows under ANSI
    * past ~2^31 rows); a rewritten corpus always changes file
    * names/sizes/mtimes, so metadata gives the same invalidation
    * guarantee. Cached per dir: the corpus is immutable within a run. */
  private val fpCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def corpusFingerprint(spark: SparkSession, dir: String): String =
    fpCache.getOrElseUpdate(dir, {
      val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootUri = fs.makeQualified(root).toUri.getPath
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(root, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        // fingerprint the path RELATIVE to the table root, not the
        // basename: in a partitioned layout, moving a part-file between
        // partition dirs preserves (name, len, mtime) but changes data
        val rel = st.getPath.toUri.getPath.stripPrefix(rootUri)
        if (!name.startsWith("_") && !name.startsWith("."))
          entries += s"$rel:${st.getLen}:${st.getModificationTime}"
      }
      java.security.MessageDigest.getInstance("MD5")
        .digest(entries.sorted.mkString("\n").getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString
    })

  /** Collision-proof tag for the corpus dir (md5 prefix, not
    * String.hashCode — [[pruneStaleSiblings]] deletes by this tag, and
    * a hashCode collision between two live corpus dirs would make them
    * delete each other's maps on every retrain). */
  private def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  def defaultPath(spark: SparkSession, dir: String): String =
    s"/tmp/graft_model_map_v${FormatVersion}_${dirTag(dir)}" +
      s"_${corpusFingerprint(spark, dir)}"

  /** Delete older persisted maps for the same corpus dir (any version,
    * any fingerprint except `keep`) — a regenerated corpus mints a new
    * fingerprinted path, and without pruning the stale siblings
    * accumulate under /tmp forever. */
  private def pruneStaleSiblings(spark: SparkSession, dir: String, keep: String): Unit = {
    val glob = new org.apache.hadoop.fs.Path(
      s"/tmp/graft_model_map_v*_${dirTag(dir)}_*")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = try fs.globStatus(glob) catch { case _: Exception => null }
    if (stale != null)
      stale.foreach { st =>
        if (st.getPath.toUri.getPath != keep)
          try fs.delete(st.getPath, true) catch { case _: Exception => () }
      }
  }

  // ---------------------------------------------------------------------------
  // Synthetic page construction (shared verbatim by the batch training
  // job and the streaming scorer — pure column expressions, so the same
  // code runs on a batch DataFrame and a streaming one).
  // ---------------------------------------------------------------------------

  /** ≥50 chars of neutral filler between a decoy mention and the true
    * price span: the candidate scanner's ±50-char snippets must not let
    * one candidate's window reach the other's discriminative anchor
    * words ("price" vs "was"/"plus…shipping"). */
  private val Fill = "x" * 56

  private def fmt2(c: Column): Column = format_number(c, 2)

  /** The three marked prices of a page: the true price and the two
    * decoy magnitudes (floor-scaled to exact cents so both engines
    * format identically). */
  private def trueRaw(value: Column): Column = value + 100.0
  private def minorRaw(value: Column): Column =
    floor((value + 100.0) * 1.05 * 100 + 0.5) / 100
  private def majorRaw(value: Column): Column =
    floor((value + 100.0) * 2.07 * 100 + 0.5) / 100

  /** events (batch or stream) → + domain, html, a_val (the parsed true
    * price). Five page shapes keyed by event_type:
    *   view     true price first, "shipping" decoy after     → modeledPatternEquals
    *   click    +5% "was" decoy first, true price after      → minorModelPatternConflict
    *   purchase +107% "was" decoy first, true price after    → majorModelPatternConflict
    *   signup   like view, but the domain has no model       → missingModel
    *   error    no price-shaped candidate at all             → bothFailed
    * The naive positional pattern (first candidate) grabs the decoy on
    * click/purchase pages; the model learns the "price"-anchored true
    * candidate — exactly the conflict the reference's status machine
    * adjudicates (Htmls2Cassandra.scala:183-227). */
  def syntheticPages(events: DataFrame): DataFrame = {
    val truePage = concat(
      lit("<div class=\"item\"><span class=\"price\">$"), fmt2(trueRaw(col("value"))),
      lit("</span><i>" + Fill + "</i><b>plus $9.99 shipping</b></div>"))
    def decoyPage(decoy: Column): Column = concat(
      lit("<div class=\"item\"><span class=\"was\">was $"), fmt2(decoy),
      lit("</span><u>" + Fill + "</u><span class=\"price\">$"), fmt2(trueRaw(col("value"))),
      lit("</span></div>"))
    events
      .withColumn("domain", concat(col("event_type"), lit(".example.com")))
      .withColumn("html",
        when(col("event_type") === "click", decoyPage(minorRaw(col("value"))))
          .when(col("event_type") === "purchase", decoyPage(majorRaw(col("value"))))
          .when(col("event_type") === "error",
            lit("<div class=\"item\">Error 500 page not found</div>"))
          .otherwise(truePage))
      .withColumn("a_val", Text.parsePriceLocale(fmt2(trueRaw(col("value")))))
  }

  /** Page → labeled per-candidate feature rows, the gramsTFIDFParser
    * shape (Transformer.scala:74-87): terms = char 3-grams ++ 4-grams ++
    * tokens of text_before+text_after+domain; location normalized by
    * page length; label = candidate parses to the page's true price. */
  private def labeledCandidates(pages: DataFrame): DataFrame = {
    val data = concat(col("c.text_before"), col("c.text_after"), col("domain"))
    pages
      .select(col("event_id"), col("domain"), col("a_val"),
        length(col("html")).as("page_len"),
        explode(PriceCandidates.priceCandidates(col("html"))).as("c"))
      .filter(col("c.candidate").contains(".") || col("c.candidate").contains(","))
      .withColumn("parsed", Text.parsePriceLocale(col("c.candidate")))
      .filter(col("parsed").isNotNull)
      .select(col("event_id"), col("domain"),
        concat(CharGrams.charGrams(data, 3), CharGrams.charGrams(data, 4),
          Text.tokenize(data)).as("terms"),
        (col("c.location").cast("double") / col("page_len")).as("location_norm"),
        (col("parsed") === col("a_val")).cast("double").as("label"))
  }

  // ---------------------------------------------------------------------------
  // Train / save / load / merge
  // ---------------------------------------------------------------------------

  /** Train the per-domain scorers on the event pages' training split
    * (event_id-keyed 70%, whole pages together) and persist the map.
    * The domain list here is the bounded event alphabet, so a short
    * driver loop (concurrent fits, as the reference's `list.par`) is the
    * right shape — the unbounded-domain training path is
    * [[MLQueries.gbtTrainEval]]'s grouped executor-local trainer. */
  def trainAndSave(spark: SparkSession, dir: String, path: String, runId: Long): Unit = {
    val data = labeledCandidates(syntheticPages(Tables.events(spark, dir)))
      .filter(col("event_id") % 10 < 7)
      .cache()
    try {
      data.count() // materialize the shared cache before the racing fits
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(TrainedDomains.length)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      val fits = TrainedDomains.map { dom =>
        Future {
          val d = data.filter(col("domain") === dom)
          val fpm = new TopKByAvgTFIDF().fit(d)
          val gbt = new GBTClassifier()
            .setMaxIter(5).setMaxDepth(3).setSeed(42L)
            .setLabelCol("label").setFeaturesCol("features")
            .fit(fpm.transform(d))
          dom -> DomainModel(fpm, gbt)
        }
      }
      val models =
        try fits.map(Await.result(_, Duration.Inf)).toMap
        finally pool.shutdown()
      save(spark, path, runId, models)
    } finally data.unpersist()
  }

  def save(spark: SparkSession, path: String, runId: Long,
      models: Map[String, DomainModel]): Unit = {
    import spark.implicits._
    models.foreach { case (dom, dm) =>
      dm.featurizer.write.overwrite().save(s"$path/domains/$dom/featurizer")
      dm.gbt.write.overwrite().save(s"$path/domains/$dom/gbt")
    }
    models.keys.toSeq.sorted.map(d => (d, runId, FormatVersion))
      .toDF("domain", "run_id", "version")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load the map; throws if absent or written by an older format. */
  def load(spark: SparkSession, path: String): Map[String, DomainModel] = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    val vs = meta.map(_.getAs[Int]("version")).distinct
    require(vs.sameElements(Array(FormatVersion)),
      s"model map at $path has version ${vs.mkString(",")}, expected $FormatVersion")
    meta.map { r =>
      val dom = r.getAs[String]("domain")
      dom -> DomainModel(
        TopKByAvgTFIDFModel.load(s"$path/domains/$dom/featurizer"),
        GBTClassificationModel.load(s"$path/domains/$dom/gbt"))
    }.toMap
  }

  /** Per-domain run ids of a saved map (merge bookkeeping). */
  def runIds(spark: SparkSession, path: String): Map[String, Long] =
    spark.read.parquet(s"$path/meta").collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("run_id")).toMap

  /** Merge a new training run into a base map, newest run_id winning
    * per domain (ties go to the new run) — MergedMapModels.scala's
    * refresh. Models are re-saved through their ML writers, so the
    * merged map is self-contained wherever `out` points. */
  def merge(spark: SparkSession, basePath: String, newPath: String, out: String): Unit = {
    val base = runIds(spark, basePath)
    val fresh = runIds(spark, newPath)
    val winners: Map[String, (String, Long)] =
      (base.keySet ++ fresh.keySet).map { dom =>
        (base.get(dom), fresh.get(dom)) match {
          case (Some(b), Some(n)) =>
            dom -> (if (n >= b) (newPath, n) else (basePath, b))
          case (Some(b), None) => dom -> (basePath, b)
          case (None, Some(n)) => dom -> (newPath, n)
          case (None, None) => sys.error(s"unreachable: $dom in neither map")
        }
      }.toMap
    import spark.implicits._
    winners.foreach { case (dom, (src, _)) =>
      TopKByAvgTFIDFModel.load(s"$src/domains/$dom/featurizer")
        .write.overwrite().save(s"$out/domains/$dom/featurizer")
      GBTClassificationModel.load(s"$src/domains/$dom/gbt")
        .write.overwrite().save(s"$out/domains/$dom/gbt")
    }
    winners.toSeq.sortBy(_._1).map { case (dom, (_, rid)) => (dom, rid, FormatVersion) }
      .toDF("domain", "run_id", "version")
      .write.mode("overwrite").parquet(s"$out/meta")
  }

  // ---------------------------------------------------------------------------
  // Ensure + in-process cache (bench runs the pipe repeatedly; the map
  // is trained once and loaded models are reused within the JVM).
  // ---------------------------------------------------------------------------

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Map[String, DomainModel]]

  /** Return the trained map for `dir`, training+saving it on first use
    * (the one-time BuildAndSaveModels step a real deployment runs ahead
    * of the streaming scorer). */
  def ensure(spark: SparkSession, dir: String): Map[String, DomainModel] = {
    val path = defaultPath(spark, dir)
    cache.getOrElseUpdate(path, this.synchronized {
      val exists =
        try {
          spark.read.parquet(s"$path/meta").head()
            .getAs[Int]("version") == FormatVersion
        } catch { case _: Exception => false }
      if (!exists) {
        trainAndSave(spark, dir, path, runId = 1L)
        pruneStaleSiblings(spark, dir, keep = path)
      }
      load(spark, path)
    })
  }

  /** Invalidate the in-process caches (specs re-train small corpora,
    * possibly after rewriting the corpus at the same dir). */
  def clearCache(): Unit = { cache.clear(); fpCache.clear() }

  /** GBT boosting margin Σᵢ treeWeightᵢ·treePredᵢ — the reference's
    * confidenceGBT (Transformer.scala), computed locally per candidate
    * from the broadcast model. Class-1 iff positive. */
  def confidence(gbt: GBTClassificationModel, features: Vector): Double = {
    val trees = gbt.trees
    val weights = gbt.treeWeights
    var s = 0.0
    var i = 0
    while (i < trees.length) {
      s += weights(i) * trees(i).predict(features)
      i += 1
    }
    s
  }
}
