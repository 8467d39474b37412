package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps
import graft.schema.NslKdd
import graft.sources.NslKddSource

/** The reference notebook's core flow (`README.md:114-1783`) as one callable:
  * load → labels (train-fitted indexers) → su_attempted cleanup → flat OHE
  * (train vocabulary) → Attribute-Ratio selection → z-score standardization
  * (train stats) → assemble/index/slice → seeded train/CV split →
  * cluster-then-classify (KMeans or PCA→GaussianMixture) → distributed
  * metrics at a prediction threshold — optionally scored on a held-out test
  * file through the SAME train-fitted stages (the reference's
  * train→KDDTest+ transfer setting).
  *
  * Defaults reproduce the reference's main configuration (k=8, 500×20 RFs,
  * AR ≥ 0.05, threshold 0.5); tests run a small configuration of the same
  * flow.
  */
object NslKddFlow {

  final case class Config(
      arThreshold: Double = 0.05,
      k: Int = 8,
      numTrees: Int = 500,
      maxDepth: Int = 20,
      clusterMode: String = "kmeans",
      predictionThreshold: Double = 0.5,
      trainFraction: Double = 0.8,
      seed: Long = 4667979835606274383L,
      kmeansInitSteps: Int = 25)

  final case class Result(
      model: ClusteredClassifierModel,
      selectedFeatures: Seq[String],
      cvMetrics: Metrics.BinaryMetrics,
      testMetrics: Option[Metrics.BinaryMetrics])

  def run(spark: SparkSession, trainPath: String,
          testPath: Option[String] = None,
          cfg: Config = Config()): Result = {
    val raw = NslKddSource.load(spark, trainPath)
    val labelsModel = FeaturePrep.labelsPipeline().fit(raw)
    def label(df: DataFrame): DataFrame =
      NslKddSource.withSequentialId(labelsModel.transform(df))
        .na.replace("su_attempted", Map(2.0 -> 0.0))
    val train = label(raw).cache()

    val (oheApply, oheCols) = FeaturePrep.oheFlat(train, NslKdd.nominalCols)
    val numericCols = NslKdd.numericCols.filterNot(_ == "num_outbound_cmds")
    val ratios = AttributeRatio.attributeRatios(
      oheApply(train), "labels5", numericCols, NslKdd.binaryCols ++ oheCols)
    val selected = AttributeRatio.selectFeaturesByAR(ratios, cfg.arThreshold)

    val standardize = FeaturePrep.standardize(oheApply(train), numericCols)
    val prepModel = FeaturePrep
      .prepPipeline(numericCols ++ NslKdd.binaryCols ++ oheCols)
      .fit(standardize(oheApply(train)))
    def prepare(df: DataFrame): DataFrame =
      FeaturePrep.slicer(selected)
        .transform(prepModel.transform(standardize(oheApply(df))))
        .select("id", "labels2", "labels2_index", "labels5", "features")

    val (tr, cv) = Stats.trainCvSplit(prepare(train), cfg.trainFraction, cfg.seed)
    val cc = new ClusteredClassifier(cfg.k, "features", "labels2", 25L,
      cfg.numTrees, cfg.maxDepth, cfg.seed, cfg.clusterMode,
      pcaK = 2, kmeansInitSteps = cfg.kmeansInitSteps)
    val model = cc.fit(tr.cache())

    def metricsOf(df: DataFrame): Metrics.BinaryMetrics = {
      val scored = model.transform(df)
      val m = Metrics.binaryMetrics(
        scored.withColumn("pred",
          RelationalOps.threshold(col("prob"), cfg.predictionThreshold)),
        "labels2_index", "pred")
      model.clearScoringCache()
      m
    }
    val cvMetrics = metricsOf(cv)
    val testMetrics = testPath.map(p => metricsOf(prepare(label(NslKddSource.load(spark, p)))))
    train.unpersist()
    Result(model, selected, cvMetrics, testMetrics)
  }
}
