package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Attribute Ratio feature selection (reference `README.md:1143-1172`,
  * after Chae & Choi's AR papers linked at `README.md:1135`).
  *
  * Semantics replicated exactly, including fill order (SURVEY §7.4-5):
  *   - numeric feature c: AR(c) = max over label classes of
  *     avg_class(c) / avg_global(c); nulls in the final max row → 0.0;
  *   - binary feature c: per class freq(1)/freq(0) = sum/(count−sum),
  *     null (division by zero) → 1000.0 sentinel BEFORE the max.
  *
  * Execution shape: two grouped aggregations + one global aggregation —
  * three jobs total regardless of feature count (all features aggregate in
  * one pass), partial aggregation map-side. The result is a driver-side
  * ranking dict (a few hundred entries), like the reference's OrderedDict.
  */
object AttributeRatio {

  /** AR scores for all features, sorted descending (reference's
    * `getAttributeRatio`).
    */
  def attributeRatios(df: DataFrame, labelCol: String,
                      numericCols: Seq[String], binaryCols: Seq[String]): ListMap[String, Double] = {
    var ratios = Map.empty[String, Double]

    if (numericCols.nonEmpty) {
      val globalRow = df.agg(
        avg(col(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => avg(col(c)).as(c)): _*).first()
      val globalAvg = numericCols.map(c => c -> globalRow.getAs[Double](c)).toMap
      val grouped = df.groupBy(col(labelCol)).agg(
        avg(col(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => avg(col(c)).as(c)): _*)
      // max over classes of class-avg / global-avg, then fillna(0.0).
      // A zero global average (constant-zero feature) maps to null up front:
      // the reference relies on non-ANSI null division, Spark 4 ANSI raises.
      def ratio(c: String) =
        if (globalAvg(c) == 0.0) lit(null).cast("double")
        else col(c) / lit(globalAvg(c))
      val maxRow = grouped.agg(
        max(ratio(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => max(ratio(c)).as(c)): _*)
        .na.fill(0.0)
        .first()
      ratios ++= numericCols.map(c => c -> maxRow.getAs[Double](c))
    }

    if (binaryCols.nonEmpty) {
      // freq(1)/freq(0) with an explicit zero-denominator guard (ANSI-safe);
      // null (guarded) → 1000.0 sentinel BEFORE max (reference README.md:1164)
      def ratio(c: String) = {
        val s = sum(col(c)); val n = count(col(c))
        when(n - s === 0, lit(null).cast("double")).otherwise(s / (n - s)).as(c)
      }
      val grouped = df.groupBy(col(labelCol))
        .agg(ratio(binaryCols.head), binaryCols.tail.map(ratio): _*)
        .na.fill(1000.0)
      val maxRow = grouped.agg(
        max(col(binaryCols.head)).as(binaryCols.head),
        binaryCols.tail.map(c => max(col(c)).as(c)): _*).first()
      ratios ++= binaryCols.map(c => c -> maxRow.getAs[Double](c))
    }

    ListMap(ratios.toSeq.sortBy { case (k, v) => (-v, k) }: _*)
  }

  /** Features with AR ≥ minAr (reference `selectFeaturesByAR`,
    * `README.md:1171-1172`).
    */
  def selectFeaturesByAR(ratios: ListMap[String, Double], minAr: Double): Seq[String] =
    ratios.collect { case (k, v) if v >= minAr => k }.toSeq
}
