package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, VectorAssembler, VectorSlicer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, Params}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Shared params for [[TopKByAvgTFIDF]] / [[TopKByAvgTFIDFModel]]. */
trait TopKTFIDFParams extends Params {
  final val termsCol = new Param[String](this, "termsCol", "input terms array column")
  final val locationCol = new Param[String](this, "locationCol", "normalized location feature column")
  final val outputCol = new Param[String](this, "outputCol", "assembled feature vector column")
  final val numFeatures = new IntParam(this, "numFeatures", "HashingTF bucket count")
  final val minDocFreq = new IntParam(this, "minDocFreq", "IDF minimum document frequency")
  final val topK = new IntParam(this, "topK", "buckets kept by mean-TFIDF rank")
  setDefault(termsCol -> "terms", locationCol -> "location_norm",
    outputCol -> "features", numFeatures -> 1000, minDocFreq -> 5, topK -> 100)
}

/** Text featurization estimator mirroring the reference's candidate
  * pipeline (Transformer.scala:29-43 getTopTFIDFIndices /
  * findTopKThreshold / getGreaterIndices / projectByIndices, wired in
  * GBTDomainSuperParSelectCandid.scala:50-57):
  * HashingTF(numFeatures) → IDF(minDocFreq) fit on the training split →
  * per-bucket mean TF-IDF → keep the top-k buckets (threshold = k'-th
  * largest where k' = min(k, #non-zero); ties keep every bucket at the
  * threshold, as the reference does) → projected tf·idf values with the
  * normalized candidate location appended as the final feature.
  *
  * The selection statistics are a single distributed `Summarizer.mean`
  * pass; only the numFeatures-length mean vector ever reaches the
  * driver, so the fit is one job regardless of corpus size. The model's
  * transform is pure column work (HashingTF → IDFModel → VectorSlicer →
  * VectorAssembler), no driver loop.
  */
class TopKByAvgTFIDF(override val uid: String)
    extends Estimator[TopKByAvgTFIDFModel] with TopKTFIDFParams {
  def this() = this(Identifiable.randomUID("topKByAvgTFIDF"))

  def setTermsCol(v: String): this.type = set(termsCol, v)
  def setLocationCol(v: String): this.type = set(locationCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setNumFeatures(v: Int): this.type = set(numFeatures, v)
  def setMinDocFreq(v: Int): this.type = set(minDocFreq, v)
  def setTopK(v: Int): this.type = set(topK, v)

  override def fit(ds: Dataset[_]): TopKByAvgTFIDFModel = {
    val tf = new HashingTF()
      .setInputCol($(termsCol)).setOutputCol("graft_tf")
      .setNumFeatures($(numFeatures))
    // the tf vectors feed two aggregation passes (IDF document
    // frequencies, then the mean-TFIDF stats) — cache them so the
    // term-explosion + hashing runs once, not twice; the fitted
    // IDFModel keeps its weights driver-side, so the cache can be
    // dropped right after the stats pass
    val tfDf = tf.transform(ds).select(col("graft_tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (idfModel, mean) = try {
      val m = new IDF()
        .setInputCol("graft_tf").setOutputCol("graft_tfidf")
        .setMinDocFreq($(minDocFreq))
        .fit(tfDf)
      val mn = m.transform(tfDf)
        .select(Summarizer.mean(col("graft_tfidf")).as("m"))
        .head().getAs[Vector](0).toArray
      (m, mn)
    } finally tfDf.unpersist()
    val indices = TopKByAvgTFIDF.selectIndices(mean, $(topK))
    copyValues(new TopKByAvgTFIDFModel(uid, idfModel, indices).setParent(this))
  }

  override def copy(extra: ParamMap): TopKByAvgTFIDF = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType = schema
}

object TopKByAvgTFIDF {
  /** The reference's selection rule (Transformer.scala:29-43):
    * findTopKThreshold takes k' = min(k, #non-zero values), threshold =
    * k'-th largest value; getGreaterIndices keeps every index >=
    * threshold (ties keep extras). Guarded at k' >= 1 for the all-zero
    * corpus edge the reference would crash on. */
  def selectIndices(mean: Array[Double], k: Int): Array[Int] = {
    val kEff = math.max(1, math.min(k, mean.count(_ != 0.0)))
    val threshold = mean.sorted.takeRight(kEff)(0)
    mean.indices.filter(i => mean(i) >= threshold).toArray
  }
}

/** Fitted [[TopKByAvgTFIDF]]: IDF weights + selected bucket indices.
  * `transform` appends `outputCol` = tf·idf over the selected buckets
  * with the normalized location as the final component — feature
  * dimensionality is `selectedIndices.length + 1`. */
class TopKByAvgTFIDFModel(
    override val uid: String,
    val idfModel: IDFModel,
    val selectedIndices: Array[Int])
    extends Model[TopKByAvgTFIDFModel] with TopKTFIDFParams with MLWritable {

  override def transform(ds: Dataset[_]): DataFrame = {
    val tf = new HashingTF()
      .setInputCol($(termsCol)).setOutputCol("graft_tf")
      .setNumFeatures($(numFeatures))
    val slicer = new VectorSlicer()
      .setInputCol("graft_tfidf").setOutputCol("graft_sel")
      .setIndices(selectedIndices)
    val asm = new VectorAssembler()
      .setInputCols(Array("graft_sel", $(locationCol)))
      .setOutputCol($(outputCol))
    val tfidf = idfModel
      .setInputCol("graft_tf").setOutputCol("graft_tfidf")
      .transform(tf.transform(ds))
    asm.transform(slicer.transform(tfidf))
      .drop("graft_tf", "graft_tfidf", "graft_sel")
  }

  override def copy(extra: ParamMap): TopKByAvgTFIDFModel =
    copyValues(new TopKByAvgTFIDFModel(uid, idfModel, selectedIndices).setParent(parent))
  override def transformSchema(schema: StructType): StructType = schema

  override def write: MLWriter = new TopKByAvgTFIDFModel.Writer(this)
}

/** Persistence (the reference ships models to storage for the
  * streaming scorer to load — emr/BuildAndSaveModels.scala,
  * emr/Models2Object.scala): the inner IDFModel saves through its own
  * Spark ML writer; the selected indices and params ride a one-row
  * parquet alongside it. */
object TopKByAvgTFIDFModel extends MLReadable[TopKByAvgTFIDFModel] {

  private[ml] class Writer(instance: TopKByAvgTFIDFModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      instance.idfModel.write.overwrite().save(s"$path/idf")
      val spark = sparkSession
      import spark.implicits._
      Seq((
        instance.uid, instance.selectedIndices.toSeq,
        instance.getOrDefault(instance.termsCol),
        instance.getOrDefault(instance.locationCol),
        instance.getOrDefault(instance.outputCol),
        instance.getOrDefault(instance.numFeatures),
        instance.getOrDefault(instance.minDocFreq),
        instance.getOrDefault(instance.topK)))
        .toDF("uid", "indices", "termsCol", "locationCol", "outputCol",
          "numFeatures", "minDocFreq", "topK")
        .write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  override def read: MLReader[TopKByAvgTFIDFModel] = new MLReader[TopKByAvgTFIDFModel] {
    override def load(path: String): TopKByAvgTFIDFModel = {
      val idf = IDFModel.load(s"$path/idf")
      val row = sparkSession.read.parquet(s"$path/meta").head()
      val m = new TopKByAvgTFIDFModel(
        row.getAs[String]("uid"), idf,
        row.getAs[Seq[Int]]("indices").toArray)
      m.set(m.termsCol, row.getAs[String]("termsCol"))
        .set(m.locationCol, row.getAs[String]("locationCol"))
        .set(m.outputCol, row.getAs[String]("outputCol"))
        .set(m.numFeatures, row.getAs[Int]("numFeatures"))
        .set(m.minDocFreq, row.getAs[Int]("minDocFreq"))
        .set(m.topK, row.getAs[Int]("topK"))
    }
  }
}
