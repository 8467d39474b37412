package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table; Spark's vectorized parquet reader + Catalyst
  * column pruning / filter pushdown apply automatically, so every query
  * should show `PushedFilters` / pruned `ReadSchema` in `.explain`.
  *
  * `events.ts` normalization: the generator has shipped the column as
  * parquet TIMESTAMP(NANOS) (which Spark only reads as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`) and, since round 8, as
  * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
  * TIMESTAMP_NTZ). [[apply]] handles every encoding by inspecting the
  * read schema and normalizes to a session-TZ `timestamp` — all entry
  * points (Verify/Bench/ScaleProbe/tests) pin the session to UTC, so the
  * NTZ→timestamp cast is the identity on the stored micros value.
  *
  * Session precondition for the legacy nanos encoding: the conf must be on
  * BEFORE the read or Spark rejects the file. Our entry points set it at
  * session build; [[apply]] sets it for caller-provided sessions that
  * haven't enabled it. Note this overrides even an explicit caller
  * `false`: the nanos-typed events table cannot be read at all without
  * the conf, so "false" and "unset" both mean the read would throw —
  * callers wanting strict rejection of nanos timestamps should read the
  * parquet directly. (The conf is registered with default "false", so an
  * unset value is indistinguishable from an explicit one through the
  * public conf API.)
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  private val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      if (!spark.conf.getOption(nanosKey).contains("true")) {
        // visible trace that a caller's (explicit or default) "false" was
        // overridden — see the scaladoc for why the flip is unconditional
        log.warn(s"Tables: setting $nanosKey=true on the session " +
          "(required to read the nanos-typed events table)")
        spark.conf.set(nanosKey, "true")
      }
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        // legacy nanos encoding: raw long nanos; truncate to microseconds
        // (integer division — same semantics as a ns→µs timestamp cast)
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        // round-8+ encoding: TIMESTAMP(MICROS) isAdjustedToUTC=false reads
        // as TIMESTAMP_NTZ; cast re-types the same wall clock under the
        // (UTC-pinned) session zone so downstream ts semantics are stable
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts")
              .cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
