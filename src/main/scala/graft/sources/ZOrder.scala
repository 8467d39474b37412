package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: the multi-dimensional data-skipping
  * layout. Sorting a table by ONE column makes that column's parquet
  * row-group min/max tight and every other column's useless; sorting by the
  * INTERLEAVED bits of two columns keeps both dimensions' ranges compact in
  * every file, so predicates on either column (or both) skip most files.
  *
  * The curve VALUE is a pure per-row bit expression (codegen'd, no UDF, no
  * shuffle beyond the final range partition) and fully deterministic — the
  * SQL oracle recomputes cell ids bit-for-bit. The file LAYOUT is
  * deterministic only up to `repartitionByRange`'s sampled boundaries
  * (which depend on input partitioning): every layout satisfies the same
  * tight-span property, but file contents are not bit-identical across
  * cluster shapes — don't build content-addressed contracts on them.
  *
  * Scale contract: `writeZOrdered` is one `repartitionByRange` (sampled
  * range boundaries — no global sort) + an in-partition sort. At 100 TB the
  * same call with nFiles sized to ~1 GB outputs is the standard OPTIMIZE
  * ZORDER layout pass; readers then prune on both dimensions' min/max.
  */
object ZOrder {

  /** Clamp a non-negative long column into [0, 2^bits). */
  private def clamp(c: Column, bits: Int): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))

  /** Morton Z-value: interleave the low `bits` bits of `a` (even positions)
    * and `b` (odd positions) into a 2·bits-bit long. Inputs clamp into
    * [0, 2^bits) first — callers bucket raw values to that domain.
    */
  def zValue(a: Column, b: Column, bits: Int = 10): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val aa = clamp(a, bits)
    val bb = clamp(b, bits)
    (0 until bits).map { i =>
      shiftright(aa, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(bb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB SQL fragment computing the identical Z-value (same clamping,
    * same bit placement) — lets the correctness oracle reproduce curve
    * cells exactly.
    */
  def sqlZValue(a: String, b: String, bits: Int = 10): String = {
    val hi = (1L << bits) - 1
    def cl(e: String) = s"least(greatest(CAST($e AS BIGINT), 0), $hi)"
    (0 until bits).map { i =>
      s"(((${cl(a)} >> $i) & 1) << ${2 * i}) + (((${cl(b)} >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` clustered along the Z-curve of (aCol, bCol): range-partition
    * on the curve value (sampled boundaries, no global sort), sort within
    * partitions, drop the helper column. Each output file then covers a
    * compact curve range — a 2-D tile — so BOTH columns' file-level min/max
    * stay tight and either dimension's predicates skip files.
    */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, path: String,
                    nFiles: Int = 8, bits: Int = 10): Unit =
    df.withColumn("__z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
