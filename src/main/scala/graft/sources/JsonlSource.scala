package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines source/sink — the interchange format raw LLM corpora actually
  * arrive in (one JSON object per line, usually gzip'd shards). The scale
  * rules this encodes:
  *
  *   - ALWAYS an explicit schema. Spark's JSON schema inference runs a
  *     full extra pass over the input before the real read — at 100 TB
  *     that is a second 100 TB scan, and a heterogeneous crawl makes the
  *     inferred schema unstable across shards anyway.
  *   - PERMISSIVE mode with the corrupt record retained in a named column:
  *     crawls contain malformed lines; a pipeline must COUNT and quarantine
  *     them, never die mid-scan (FAILFAST) or silently drop them
  *     (DROPMALFORMED).
  *   - Compression is handled by the codec infrastructure (`.gz`/`.zst`
  *     shards read transparently); note gzip is NOT splittable — one shard
  *     = one task, so shard size, not `maxPartitionBytes`, sets read
  *     parallelism. Keep shards ~100-500 MB.
  */
object JsonlSource {

  val corruptCol = "_corrupt"

  /** The `documents` table contract (same columns as the parquet testdata),
    * plus the corrupt-record column.
    */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField(corruptCol, StringType)))

  /** Read JSONL with an EXPLICIT schema; malformed lines land in
    * [[corruptCol]] with every data column null.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(if (schema.fieldNames.contains(corruptCol)) schema
        else schema.add(StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Documents-shaped JSONL: (good rows without the corrupt column,
    * corrupt raw lines) — the quarantine split a real ingest does first.
    * The parsed frame is cached through `scope` (Spark requires the
    * corrupt-record column to be referenced from a cached frame — a filter
    * on it alone would be pushed into the parser and change which rows
    * exist); release the scope when both sides are consumed, or a per-shard
    * ingest loop leaks one pinned scan per call.
    */
  def readDocuments(spark: SparkSession, path: String,
                    scope: graft.ops.CacheScope = graft.ops.CacheScope.default
                   ): (DataFrame, DataFrame) = {
    val raw = scope.register(read(spark, path, documentSchema))
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val bad = raw.filter(col(corruptCol).isNotNull).select(col(corruptCol))
    (good, bad)
  }

  /** Write a frame as JSONL (optionally compressed: "gzip", "none", ...).
    * One file per partition — repartition upstream to set the shard count.
    */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(path)
}
