package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for the engine's native
  * expressions. Lives under `org.apache.spark.sql` because the classic
  * converters are `private[sql]` — the standard pattern for libraries that
  * ship custom Catalyst expressions without forcing every caller through
  * the SQL function registry.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The location the catalog WOULD assign a managed table with this name —
    * where `saveAsTable` puts its data. Needed to make table writes
    * session-idempotent: a fresh session's catalog has no entry for the
    * table, but the warehouse directory from a previous session is still on
    * disk and `saveAsTable` refuses it (`LOCATION_ALREADY_EXISTS`), so the
    * writer must delete the orphaned location explicitly.
    */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession,
                       table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))

  /** Leaf input files of a frame's ANALYZED plan. `Dataset.inputFiles`
    * walks the OPTIMIZED plan, which the cache manager rewrites to an
    * `InMemoryRelation` once an equivalent plan is cached — from then on
    * it returns EMPTY and any file-metadata fingerprint built on it
    * silently degrades to "no identity". The analyzed plan keeps the
    * file relations regardless of caching.
    */
  def analyzedInputFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case f: org.apache.spark.sql.execution.FileRelation =>
            f.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
      case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        r.tableMeta.storage.locationUri.map(_.toString).toSeq
    }.flatten

  /** The ACTUAL location of an existing catalog table, or None when the
    * catalog has no entry. A table created with a custom LOCATION does not
    * live at [[defaultTablePath]] — a rebuild that only cleared the default
    * path would delete an unrelated directory and leave the real data
    * behind, so destructive rewrites must resolve the registered location
    * first.
    */
  def tableLocation(spark: org.apache.spark.sql.SparkSession,
                    table: String): Option[java.net.URI] = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (ss.sessionState.catalog.tableExists(ident))
      Some(ss.sessionState.catalog.getTableMetadata(ident).location)
    else None
  }
}
