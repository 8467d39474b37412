package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.schema.NslKdd

/** Loader for NSL-KDD raw files (reference `load_dataset`, `README.md:114-160`).
  *
  * Spark-native rework: a single schema-on-read CSV scan (whole-stage codegen,
  * zero driver/worker round trips) instead of the reference's
  * `sc.textFile(...).map(split(','))` + 42-way cast-select. The 43rd
  * "difficulty" field is declared in the schema and dropped — same projection
  * semantics as the reference's rename-then-select (`SURVEY.md` §1.2).
  */
object NslKddSource {

  /** Read raw NSL-KDD CSV, drop difficulty. No id column. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(NslKdd.readSchema)
      .option("header", "false")
      .csv(path)
      .drop("difficulty")

  /** Add labels2/labels5 + a deterministic sequential id.
    *
    * The reference keys every score-join on `monotonically_increasing_id()`
    * pinned by `.cache()`+`count()` (`README.md:260-263`) — correct only while
    * the cache lives. We instead assign ids via `zipWithIndex` (deterministic
    * given the scan's stable partition order), so ids are reproducible across
    * actions and runs. See `SURVEY.md` §7.4(1).
    */
  def loadLabeled(spark: SparkSession, path: String): DataFrame = {
    val df = graft.ml.LabelConverters.addLabels(load(spark, path))
    withSequentialId(df)
  }

  /** Stable 0-based row id appended as `id` (LongType). Narrow (no shuffle):
    * zipWithIndex runs one lightweight count-per-partition job then tags rows
    * in place, preserving partitioning — safe at 100 TB, unlike a global
    * `row_number()` window which would funnel all rows through one partition.
    */
  def withSequentialId(df: DataFrame, idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema)
  }
}
