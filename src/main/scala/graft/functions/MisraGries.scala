package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed, MERGEABLE `Aggregator` —
  * the engine's UDAF surface (SURVEY §2.8): registered through
  * `functions.udaf(...)` it plans as a regular aggregate with map-side
  * partial aggregation, so the sketch shrinks data before the shuffle the
  * same way built-in sketches (HLL++, GK) do.
  *
  * Semantics (capacity `m`): at most m counters survive; inserting a new
  * key into a full sketch decrements every counter by 1 (dropping zeros).
  * Merging sums counts, then subtracts the (m+1)-th largest count from all
  * and drops non-positives — the mergeable-summaries form (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), which preserves the deterministic
  * guarantee REGARDLESS of partitioning or merge order:
  *
  *   - every key with true frequency  > n/(m+1) is present in the result;
  *   - each surviving estimate is a lower bound, off by at most n/(m+1).
  *
  * The exact membership/estimates of sub-threshold keys DO depend on merge
  * order, so queries must key their output on the guarantee (containment of
  * true heavy hitters), never on raw sketch internals — same contract style
  * as the HLL (q33) and GK-quantile (q39) queries.
  */
class MisraGriesAgg(m: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m > 0, "capacity must be positive")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1L)
      case None if b.size < m => b.updated(key, 1L)
      // full + miss: the textbook decrement-all step (the new key arrives
      // and immediately cancels against one count of every survivor)
      case None => b.flatMap { case (k, c) =>
        if (c > 1L) Some(k -> (c - 1L)) else None
      }
    }

  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = b2.foldLeft(b1) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count, keep strictly-positive rest —
      // at most m survive and each lost count is bounded by the subtrahend
      val counts = sum.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(sum.size - m - 1)
      sum.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object MisraGries {
  /** The sketch as an untyped aggregate function column, usable in
    * `df.agg(...)` / `groupBy(...).agg(...)`.
    */
  def mgSketch(m: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(m), Encoders.STRING)
}
