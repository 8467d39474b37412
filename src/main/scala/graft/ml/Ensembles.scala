package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.feature.{VectorAssembler, VectorIndexer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Ensemble/stacking operators (reference `README.md:3113-3686`):
  * probability extraction, threshold predictions, linear/OR voting,
  * weighted LR over model probabilities, RF over predictions, stack-RF.
  * All combination logic is native Column arithmetic (F3/F5/U3).
  */
object Ensembles {

  /** P(positive) from a model's probability vector — replaces the
    * reference's `.rdd.map(row → prob[1])` round trips (R1, 8 sites).
    */
  def probOf(probabilityCol: Column, positiveIdx: Int = 1): Column =
    vector_to_array(probabilityCol)(positiveIdx)

  /** Threshold prediction at e (reference `getPrediction`, U3). */
  def predAt(probCol: Column, e: Double): Column = RelationalOps.threshold(probCol, e)

  /** Mean-of-probabilities combo (reference `README.md:3113-3114`). */
  def meanCombo(cols: Seq[Column]): Column =
    cols.reduce(_ + _) / lit(cols.size.toDouble)

  /** Weighted linear vote, e.g. (3·km + gm + dos + probe + r2l)/7
    * (reference `README.md:3266-3270`).
    */
  def weightedVote(weighted: Seq[(Column, Double)]): Column =
    RelationalOps.linearCombo(weighted)

  /** OR-vote of 0/1 predictions (reference `README.md:3141-3144`). */
  def orVote(preds: Seq[Column]): Column = RelationalOps.bitwiseVote(preds)

  /** Weighted LogisticRegression over stacked probability columns
    * (reference `README.md:3374-3386`): standardization off, class weights
    * from a label→weight map applied as a native expression.
    */
  def weightedLrPipeline(probCols: Seq[String], labelIdxCol: String,
                         maxIter: Int = 100): Pipeline =
    new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(probCols.toArray).setOutputCol("ens_features"),
      new LogisticRegression().setMaxIter(maxIter).setStandardization(false)
        .setWeightCol("weights").setLabelCol(labelIdxCol)
        .setFeaturesCol("ens_features")))

  /** RF over prediction columns (reference `README.md:3432-3446`):
    * assembler + VectorIndexer(maxCategories=2) + RF(250 trees, depth 5).
    */
  def rfEnsemblePipeline(predCols: Seq[String], labelIdxCol: String,
                         numTrees: Int = 250, maxDepth: Int = 5,
                         seed: Long = 4667979835606274383L): Pipeline =
    new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(predCols.toArray).setOutputCol("ens_raw"),
      new VectorIndexer().setInputCol("ens_raw").setOutputCol("ens_features")
        .setMaxCategories(2),
      new RandomForestClassifier().setLabelCol(labelIdxCol)
        .setFeaturesCol("ens_features").setNumTrees(numTrees)
        .setMaxDepth(maxDepth).setFeatureSubsetStrategy("auto").setSeed(seed)))

  /** Stacking feature join (reference `README.md:3568-3580`): base features
    * ⋈ per-model prediction columns on id.
    */
  def stackFeatures(base: DataFrame, preds: DataFrame, idCol: String = "id"): DataFrame =
    RelationalOps.scoreJoin(base, preds, idCol)

  /** The FULL stack-RF (reference `README.md:3597-3620`): the stacked
    * feature vector is the per-model prediction columns PLUS the AR≥1.5
    * slice of the base feature vector — slicer → assembler(preds +
    * `rf_features`) → VectorIndexer(maxCategories=2) → RF(500×20, "auto").
    * Train on CV predictions, score the test predictions, like the
    * reference's `stack_rf` pipeline.
    */
  def stackRfPipeline(predCols: Seq[String], slicedFeatureNames: Seq[String],
                      labelIdxCol: String,
                      featuresInputCol: String = "indexed_features",
                      numTrees: Int = 500, maxDepth: Int = 20,
                      seed: Long = 4667979835606274383L): Pipeline =
    new Pipeline().setStages(Array(
      FeaturePrep.slicer(slicedFeatureNames, featuresInputCol, "rf_features"),
      new VectorAssembler().setInputCols((predCols :+ "rf_features").toArray)
        .setOutputCol("pred_raw"),
      new VectorIndexer().setInputCol("pred_raw").setOutputCol("pred_features")
        .setMaxCategories(2),
      new RandomForestClassifier().setLabelCol(labelIdxCol)
        .setFeaturesCol("pred_features").setNumTrees(numTrees)
        .setMaxDepth(maxDepth).setFeatureSubsetStrategy("auto").setSeed(seed)))

  /** Per-category training subset: the category's rows vs normal (reference
    * `README.md:2039,2402,2765` — `labels5 == 'DoS' OR labels5 == 'normal'`;
    * R2L and U2R are trained together, hence a category *set*).
    */
  def categoryTrainingSet(df: DataFrame, categories: Seq[String],
                          labelCol: String = "labels5"): DataFrame =
    df.filter(col(labelCol).isin((categories :+ "normal"): _*))

  /** Per-category one-vs-normal RF (reference `README.md:2221-2249` etc.):
    * binary label = "is this category (vs normal)", RF(numTrees×maxDepth,
    * sqrt features) on the prepared feature vector. Scored probabilities
    * come out via [[probOf]] — index 1 because the training set is
    * majority-normal under frequencyDesc indexing for DoS/Probe; callers
    * with differently-balanced subsets should check the indexer's labels
    * (same hazard as SURVEY §7.4-2).
    */
  def perCategoryRfPipeline(labelIdxCol: String = "cat_label_idx",
                            featuresCol: String = "features",
                            numTrees: Int = 500, maxDepth: Int = 20,
                            seed: Long = 4667979835606274383L): Pipeline =
    new Pipeline().setStages(Array(
      new RandomForestClassifier().setLabelCol(labelIdxCol)
        .setFeaturesCol(featuresCol).setNumTrees(numTrees).setMaxDepth(maxDepth)
        .setFeatureSubsetStrategy("sqrt").setSeed(seed)))

  /** Binary 0/1 label for the one-vs-normal task — a native expression
    * (reference uses labels2_index on the filtered frame).
    */
  def categoryLabel(labelCol: Column): Column =
    when(labelCol === "normal", 0.0).otherwise(1.0)
}
