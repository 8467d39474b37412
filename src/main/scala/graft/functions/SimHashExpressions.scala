package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 60-bit SimHash of a shingle-hash SET (`array<long>`): bit i is the
  * majority vote of the i-th permutation parity
  * `((a_i·(h % P) + b_i) % P) & 1` over the array's elements — EXACTLY the
  * value [[graft.ops.DedupOps.simHash60]] computes via explode + 60
  * conditional-sum aggregates, but as ONE tight loop per document inside
  * whole-stage codegen: no row explosion, no 60 aggregation buffers, and
  * the aggregation that feeds it shrinks to a single `collect_set`.
  *
  * The (a_i, b_i) constants are [[graft.ops.DetHash.simHashPerms]] — public
  * md5-seeded literals, so the SQL oracle reproduces identical fingerprints
  * (the q23/q30 oracles are unchanged by the native form). Arithmetic
  * mirrors the composed expression exactly: signed `%` (inputs are
  * non-negative 60-bit hashes, so the sign never differs), products bounded
  * by P² < 2^62 — no overflow in either engine.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash60.fingerprint($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

object SimHash60 {
  import graft.ops.DetHash

  private val P = DetHash.P
  private val as: Array[Long] = DetHash.simHashPerms.map(_._1).toArray
  private val bs: Array[Long] = DetHash.simHashPerms.map(_._2).toArray

  /** The 60-bit fingerprint of a shingle-hash array (callers pass the
    * DISTINCT set — duplicates would double-vote, as they would in the
    * aggregate form fed with non-distinct rows).
    */
  def fingerprint(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](60)
    var j = 0
    while (j < n) {
      val hm = arr.getLong(j) % P
      var i = 0
      while (i < 60) {
        if ((((as(i) * hm + bs(i)) % P) & 1L) == 1L) cnt(i) += 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 60) {
      if (2L * cnt(i) > n) fp |= 1L << i
      i += 1
    }
    fp
  }
}
