package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located-join strategy for keys that are
  * joined repeatedly at scale (SURVEY §7 / the 100 TB design notes).
  *
  * Writing both fact tables bucketed (and sorted) by the join key lets
  * every subsequent equi-join on that key run WITHOUT a shuffle on either
  * side — the exchange that dominates big joins disappears from the plan
  * (asserted in BucketingSpec). The bucket count is a layout-time choice:
  * pick it so a bucket of the larger table fits an executor's memory at
  * the target scale; both sides must use the same count for exchange-free
  * joins.
  */
object Bucketing {

  /** Make `table` writable in THIS session regardless of what previous
    * sessions left behind: drop the catalog entry (which removes the data of
    * a managed table this session knows about), delete the table's
    * REGISTERED location if files survived the drop (an external / custom-
    * LOCATION table keeps its data through DROP), and delete the default
    * warehouse location if a directory is still there. The last part is
    * the session-idempotence fix: `mode("overwrite")` only overwrites
    * tables the *current* catalog knows, so a fresh session over a
    * warehouse with leftover directories (a prior JVM wrote the index)
    * fails `LOCATION_ALREADY_EXISTS` without it. The registered location
    * is resolved BEFORE the drop — afterwards the catalog no longer knows
    * it, and clearing only the default path would both leak the real data
    * and delete an unrelated directory.
    *
    * DESTRUCTIVE-FIRST by design: rebuilds clear the old index before the
    * replacement write, so a failed rebuild leaves no index rather than the
    * old one (write-to-temp-then-rename is not available here — bucketed
    * saveAsTable binds layout metadata to the catalog entry, which a
    * directory rename would orphan). Callers that need the old index to
    * survive a failed rebuild should build under a fresh prefix and switch
    * names afterwards.
    */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.graft.bridge
    val registered = bridge.tableLocation(spark, table)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val hconf = spark.sparkContext.hadoopConfiguration
    (registered.toSeq :+ bridge.defaultTablePath(spark, table))
      .map(new org.apache.hadoop.fs.Path(_)).distinct
      .foreach { loc =>
        val fs = loc.getFileSystem(hconf)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
  }

  /** Session-idempotent `saveAsTable` for small unbucketed companion tables
    * (index metadata, centroids): drop-and-recreate so a rebuild works in a
    * NEW session over an existing warehouse.
    */
  def saveTable(df: DataFrame, table: String): Unit = {
    dropTableAndLocation(df.sparkSession, table)
    df.write.mode("overwrite").saveAsTable(table)
    // a cloned session (foreachBatch runs micro-batches in one) can hold
    // the PRE-replace file listing in its relation cache — a later read
    // through it dies with FAILED_READ_FILE on the deleted part files.
    // Refresh through the writing session so every cache drops the stale
    // listing (observed live under streaming retraction, hive catalog)
    df.sparkSession.catalog.refreshTable(table)
  }

  /** Write `df` as a managed parquet table bucketed and sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-key form: bucketed and sorted by `keys` (a join must include ALL
    * bucket columns among its keys to use the layout exchange-free).
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    dropTableAndLocation(df.sparkSession, table)
    df.write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
    // drop any stale pre-replace file listing (see saveTable)
    df.sparkSession.catalog.refreshTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readTable(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Read a MUTABLE store table (tombstones, meta pointers, appended
    * corpus tables) with the reader session's relation cache dropped
    * first. Spark caches a resolved table's FILE LISTING per session; a
    * replace (drop + recreate) or append performed by ANOTHER session —
    * a streaming foreachBatch clone, a second pipeline — leaves this
    * session's cached listing pointing at deleted files (FAILED_READ_FILE
    * crash, observed live) or missing the appended ones (silent stale
    * read). Writer-side refreshes cannot fix readers: the cache is
    * per-SessionCatalog. Immutable tables (versioned snapshots — a new
    * name per version) don't need this.
    */
  def freshTable(spark: org.apache.spark.sql.SparkSession,
                 table: String): DataFrame = {
    refresh(spark, table)
    spark.table(table)
  }

  /** Perform the actual catalog refresh, counting it for the plan specs.
    * Only the table-not-found class is swallowed (the read below throws
    * the same, more specific error); any OTHER refresh failure propagates
    * — silently falling back to the stale cached listing would be the
    * exact stale-read class this helper exists to prevent.
    */
  private def refresh(spark: SparkSession, table: String): Unit = {
    try {
      spark.catalog.refreshTable(table)
      refreshCounts.merge(table.toLowerCase, 1L, (a, b) => a + b)
    } catch {
      case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException =>
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "TABLE_OR_VIEW_NOT_FOUND" =>
    }
  }

  /** Test-visible count of ACTUAL catalog refreshes (file re-listings)
    * per table name — the observable the version-gating specs assert on.
    */
  private[graft] val refreshCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private[graft] def refreshCount(table: String): Long =
    refreshCounts.getOrDefault(table.toLowerCase, 0L)

  // last refresh token per (session, table): freshTableGated re-lists only
  // when the caller-supplied token moved
  private val refreshTokens =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** VERSION-GATED [[freshTable]] for corpus-sized mutable-store tables:
    * refresh (re-list part-files) only when `token` differs from the last
    * token THIS session refreshed `table` at. The caller derives the token
    * from the store's 1-row meta head (version | epoch | tag — every
    * committed mutation moves it), which it reads through the always-fresh
    * [[freshTable]]; gating the big tables on it keeps X220 cross-session
    * correctness (a foreign commit bumps the meta version, the next read
    * observes it and re-lists) while a REPEATED serve against an unchanged
    * store re-lists nothing — at 100 TB an ungated refresh re-listed
    * millions of `_vecs`/`_bands` part-files per probe.
    */
  def freshTableGated(spark: org.apache.spark.sql.SparkSession,
                      table: String, token: String): DataFrame = {
    val key = s"${System.identityHashCode(spark)}|${table.toLowerCase}"
    if (refreshTokens.get(key) != token) {
      refresh(spark, table)
      refreshTokens.put(key, token)
    }
    spark.table(table)
  }

  /** Write `df` hive-style partitioned by `partitionCols` — the layout that
    * turns partition-key predicates into directory pruning: a reader's
    * filter on the partition column eliminates whole directories at
    * planning time (`PartitionFilters` in the scan, zero data files read
    * for pruned values). The scale contract for time/tenant-keyed corpora:
    * scans touch only the partitions the query names. Keep partition
    * cardinality bounded (directories are metadata, ~10^3-10^5 is healthy);
    * high-cardinality keys belong in buckets, not partitions.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write
      .format("parquet")
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .save(path)
}
