package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame

/** Statistical operators from the reference's EDA tier:
  * correlation matrix (M19, `README.md:1007-1014` —
  * `Statistics.corr(rdd, 'pearson'/'spearman')` in the notebook), train/CV
  * splitting (M17, `README.md:1398-1404`) and stratified sampling (M18,
  * `README.md:2064`), the latter two as thin documented entry points over
  * the built-ins so the semantics live in one place.
  */
object Stats {

  /** Pearson/Spearman correlation matrix over `cols` — distributed
    * computation via `ml.stat.Correlation` on an assembled vector; only the
    * d×d matrix comes to the driver.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String],
                        method: String = "pearson"): Matrix = {
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("__corr_features")
      .transform(df.select(cols.map(df.col): _*))
    Correlation.corr(assembled, "__corr_features", method)
      .head().getAs[Matrix](0)
  }

  /** Seeded train/CV split (reference `randomSplit([0.8, 0.2], seed)`,
    * `README.md:1398-1404`). Split sizes are seed-stable for a fixed
    * partitioning but NOT portable across Spark versions/partitionings
    * (SURVEY §7.4-3) — callers assert ratios, not exact golden counts.
    */
  def trainCvSplit(df: DataFrame, trainFraction: Double = 0.8,
                   seed: Long = 4667979835606274383L): (DataFrame, DataFrame) = {
    val Array(tr, cv) = df.randomSplit(Array(trainFraction, 1.0 - trainFraction), seed)
    (tr, cv)
  }

  /** Stratified undersampling by label (reference `sampleBy('labels5',
    * fractions, seed)`, `README.md:2064`).
    */
  def stratifiedSample(df: DataFrame, labelCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(labelCol, fractions, seed)
}
