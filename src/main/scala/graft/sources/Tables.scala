package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * One parquet file per table; Spark's vectorized parquet reader + Catalyst
  * column pruning / filter pushdown apply automatically, so every query
  * should show `PushedFilters` / pruned `ReadSchema` in `.explain`.
  *
  * Session precondition: `events.ts` is parquet TIMESTAMP(NANOS), which
  * Spark's reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true`
  * is set. Our entry points (Verify/Bench/tests) set it at session build;
  * [[apply]] sets it for caller-provided sessions that haven't enabled it.
  * Note this overrides even an explicit caller `false`: the nanos-typed
  * events table cannot be read at all without the conf, so "false" and
  * "unset" both mean the read would throw — callers wanting strict
  * rejection of nanos timestamps should read the parquet directly. (The
  * conf is registered with default "false", so an unset value is
  * indistinguishable from an explicit one through the public conf API.)
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
      // ts arrives as raw long nanos; truncate to microseconds (integer
      // division — same semantics as a ns→µs timestamp cast).
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
