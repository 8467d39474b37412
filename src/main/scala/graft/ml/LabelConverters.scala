package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.schema.NslKdd

/** Binary / 5-class label derivation (reference `README.md:220-238`).
  *
  * The reference uses a Python regex UDF (`regexp_replace(labels,
  * '^(?!normal).*$', 'attack')`, `README.md:229`) and a dict-lookup UDF over
  * the 40-entry attack taxonomy (`README.md:220`). Both are pure row-local
  * string maps, so here they are native Catalyst expressions — `when` and
  * `element_at(typedlit(map))` — which stay inside whole-stage codegen with
  * zero serialization boundaries.
  */
object LabelConverters {

  /** labels → {normal, attack}. Equivalent to the reference's negative
    * lookahead regex but cheaper: one string equality per row.
    */
  def labels2(labels: Column): Column =
    when(labels === "normal", lit("normal")).otherwise(lit("attack"))

  /** labels → {normal, DoS, Probe, R2L, U2R} via the public NSL-KDD taxonomy.
    * The reference's UDF raises KeyError on an unseen attack name; this yields
    * null instead (both datasets are total over the map, so behavior matches
    * on all provided data).
    */
  def labels5(labels: Column): Column =
    element_at(typedlit(NslKdd.attackDict), labels)

  /** Append both derived label columns (reference pipeline stage 1-2). */
  def addLabels(df: DataFrame, labelCol: String = "labels"): DataFrame =
    df.withColumn("labels2", labels2(col(labelCol)))
      .withColumn("labels5", labels5(col(labelCol)))
}
