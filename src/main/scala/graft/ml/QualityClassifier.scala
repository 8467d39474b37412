package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** fastText-style LEARNED quality classifier — the model-based tier above
  * the heuristic battery (`TextOps.gopherRules`, `charEntropyReport`,
  * `compressionRatio`): hashed bag-of-character-trigrams → logistic
  * regression, the architecture CCNet/fastText-style corpus filters use
  * (linear over hashed n-gram features; no embedding lookup, no external
  * vocabulary — everything derives from the training frame itself).
  *
  * The feature map is deterministic: character trigrams via a pure SQL
  * array expression, hashed by `HashingTF` (murmur3, fixed seed) into
  * `nFeatures` buckets. Training is standard spark.ml L-BFGS logistic
  * regression — deterministic given the same data (no sampling), with the
  * usual caveat that float aggregation order can wiggle low bits, which is
  * why the specs assert separation margins rather than golden weights
  * (SURVEY §5.2's range-assertion convention for the ML tier).
  *
  * Scale shape: featurization is map-only (one array expression + one
  * hashing pass per row); L-BFGS aggregates one dense gradient of
  * `nFeatures` doubles per iteration (tree-aggregated); scoring is a
  * broadcast of the coefficient vector — the corpus never shuffles.
  */
object QualityClassifier {

  /** Character trigrams of the lowercased text as an array column — the
    * fastText character-n-gram feature family (subword robustness: typos
    * and inflections share most of their trigrams). Pure SQL expression:
    * a transform over a sliding index sequence, no UDF.
    */
  def charTrigrams(df: DataFrame, textCol: String = "text",
                   outCol: String = "grams"): DataFrame = {
    val t = lower(col(textCol))
    val n = length(t)
    df.withColumn(outCol,
      when(n >= 3, transform(sequence(lit(1), n - 2), i => t.substr(i, lit(3))))
        .otherwise(array(t)))
  }

  /** Hashed trigram counts as an ML vector (murmur3 — deterministic across
    * runs, executors and clusters; no fitted vocabulary to ship).
    */
  def featurize(df: DataFrame, nFeatures: Int = 1 << 12,
                textCol: String = "text"): DataFrame = {
    val grams = charTrigrams(df, textCol)
    new HashingTF().setInputCol("grams").setOutputCol("features")
      .setNumFeatures(nFeatures).setBinary(false)
      .transform(grams).drop("grams")
  }

  /** Train on labeled frames: `pos` rows are quality (label 1), `neg` rows
    * junk (label 0). Both only need `textCol`.
    */
  def train(pos: DataFrame, neg: DataFrame, nFeatures: Int = 1 << 12,
            regParam: Double = 1e-3, maxIter: Int = 50,
            textCol: String = "text"): LogisticRegressionModel = {
    val labeled = pos.select(col(textCol), lit(1.0).as("label"))
      .unionByName(neg.select(col(textCol), lit(0.0).as("label")))
    val feats = featurize(labeled, nFeatures, textCol)
    new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(true).fit(feats)
  }

  /** Score a corpus: adds `quality_prob` = P(quality | text) ∈ [0,1]. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            nFeatures: Int = 1 << 12,
            textCol: String = "text"): DataFrame = {
    val p1 = udf((v: Vector) => v(1))
    model.transform(featurize(docs, nFeatures, textCol))
      .withColumn("quality_prob", p1(col("probability")))
      .drop("features", "rawPrediction", "probability", "prediction")
  }

  /** Deterministic JUNK GENERATOR for self-supervised training when no
    * labeled negatives exist (the practical bootstrap: real corpus docs as
    * positives, synthesized degenerate text as negatives). Three corruption
    * modes cycled by id — token stutter (one token repeated to the original
    * length), character shuffle-free keyboard mash (the doc's first token
    * repeated character-wise), and separator spam — all pure column
    * expressions, replayable from ids alone.
    */
  def syntheticNegatives(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val toks = graft.ops.TextOps.tokens(col(textCol))
    val first = element_at(toks, 1)
    val nTok = size(toks)
    val mode = pmod(col(idCol).cast("long"), lit(3L))
    docs.select(col(idCol),
      when(mode === 0L, array_join(array_repeat(first, nTok), " "))
        .when(mode === 1L,
          concat_ws("", array_repeat(substring(first, 1, 2), 80)))
        .otherwise(concat_ws(" | ", array_repeat(lit("-"), 60)))
        .as(textCol))
  }
}
