package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed evaluation metrics (reference `printCM`/`printReport`,
  * `README.md:1435-1475`, which collect every (pred, label) pair to the
  * driver for sklearn).
  *
  * Spark-native: the confusion matrix is a 4-row `groupBy(label, pred)
  * .count()` — ONE aggregation job over any data size; every metric is then
  * driver-side arithmetic on 4 longs. Nothing row-level ever reaches the
  * driver, so this works unchanged at 100 TB.
  *
  * Formula parity with the reference (binary, attack=positive):
  *   FAR = FP/(FP+TN) (`README.md:1469`), DR = recall = TP/(TP+FN)
  *   (`README.md:1470`), F1 on the positive class, AUC computed on
  *   binarized predictions (step ROC) = (DR + (1−FAR))/2 — matching
  *   sklearn's roc_auc_score on 0/1 predictions as the notebook calls it.
  */
object Metrics {

  final case class BinaryMetrics(tp: Long, fp: Long, tn: Long, fn: Long) {
    def total: Long = tp + fp + tn + fn
    def accuracy: Double = (tp + tn).toDouble / total
    def far: Double = if (fp + tn == 0) 0.0 else fp.toDouble / (fp + tn)
    def detectionRate: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = detectionRate
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
    def aucBinarized: Double = (detectionRate + (1.0 - far)) / 2.0
    def confusionMatrix: Seq[(Double, Double, Long)] =
      Seq((0.0, 0.0, tn), (0.0, 1.0, fp), (1.0, 0.0, fn), (1.0, 1.0, tp))
  }

  /** Confusion-matrix counts for 0/1 double label/prediction columns.
    * Positive class = 1.0 (attack, with the reference's frequencyDesc
    * indexing where normal=0).
    */
  def binaryMetrics(df: DataFrame, labelCol: String, predCol: String): BinaryMetrics = {
    val counts = df.groupBy(col(labelCol).as("l"), col(predCol).as("p")).count()
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    BinaryMetrics(
      tp = counts((1.0, 1.0)), fp = counts((0.0, 1.0)),
      tn = counts((0.0, 0.0)), fn = counts((1.0, 0.0)))
  }

  /** Multi-class confusion matrix as a DataFrame (label, pred, n) — stays
    * distributed; callers pivot/collect as needed.
    */
  def confusionMatrixDF(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol), col(predCol)).agg(count(lit(1)).as("n"))
      .orderBy(col(labelCol), col(predCol))

  /** Threshold-tuning sweep (reference M16: reports at e = 0.5/0.05/0.01/
    * 0.005 to trade FAR vs DR, `README.md:1767-1783`): ONE distributed
    * aggregation computes the confusion counts for every threshold — per
    * row, each threshold contributes conditional sums — then the metric
    * arithmetic runs on the driver over |thresholds| tiny tuples.
    */
  def thresholdSweep(df: DataFrame, labelCol: String, probCol: String,
                     thresholds: Seq[Double] = Seq(0.5, 0.05, 0.01, 0.005)): Seq[(Double, BinaryMetrics)] = {
    val aggs = thresholds.zipWithIndex.flatMap { case (e, i) =>
      val pred = when(col(probCol) >= e, 1.0).otherwise(0.0)
      val l = col(labelCol)
      Seq(
        sum(when(l === 1.0 && pred === 1.0, 1L).otherwise(0L)).as(s"tp$i"),
        sum(when(l === 0.0 && pred === 1.0, 1L).otherwise(0L)).as(s"fp$i"),
        sum(when(l === 0.0 && pred === 0.0, 1L).otherwise(0L)).as(s"tn$i"),
        sum(when(l === 1.0 && pred === 0.0, 1L).otherwise(0L)).as(s"fn$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    thresholds.zipWithIndex.map { case (e, i) =>
      e -> BinaryMetrics(
        tp = row.getAs[Long](s"tp$i"), fp = row.getAs[Long](s"fp$i"),
        tn = row.getAs[Long](s"tn$i"), fn = row.getAs[Long](s"fn$i"))
    }
  }

  /** Report string in the spirit of the reference's printReport. */
  def report(m: BinaryMetrics): String =
    f"""confusion matrix (tn=${m.tn} fp=${m.fp} / fn=${m.fn} tp=${m.tp})
       |accuracy: ${m.accuracy}%.5f
       |AUC: ${m.aucBinarized}%.5f
       |false alarm rate: ${m.far}%.5f
       |detection rate: ${m.detectionRate}%.5f
       |precision: ${m.precision}%.5f
       |F1 score: ${m.f1}%.5f""".stripMargin
}
