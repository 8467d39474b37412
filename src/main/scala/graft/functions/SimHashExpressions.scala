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

/** Native MinHash LSH band signatures of a shingle-hash SET: one codegen'd
  * loop computes all k permutation minima
  * (`min_i = min over h of (a_i·(h % P) + b_i) % P`) and packs them into
  * `bands` band keys (r = k/bands ≤ 2; r=2 packs `min_{2b}·P + min_{2b+1}`,
  * overflow-free below 2^62) — EXACTLY the values
  * [[graft.ops.DedupOps.minHashSigs]] + banding compute via k min-aggregates,
  * but as a map-only projection over the already-aggregated set table: the
  * separate signature shuffle disappears entirely. Constants are
  * [[graft.ops.DetHash.minHashPerms]] (public, md5-seeded) — band collisions
  * are bit-reproducible across engines and cluster sizes.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(bands >= 1 && k >= bands && k % bands == 0 && k / bands <= 2,
    s"need 1 <= bands <= k, bands | k, and r = k/bands <= 2 (got k=$k, bands=$bands)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // an EMPTY set has no signature: the result is NULL (never a garbage
  // Long.MaxValue packing) — reachable via the public SQL surface, where
  // callers may band tables that include shingle-less documents
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<bigint>, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else MinHashBands.bandSigs(arr, k, bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashBands.bandSigs($c, $k, $bands);
         |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinHashBands {
  import graft.ops.DetHash
  private val P = DetHash.P
  // perm constants per k, cached (tiny, deterministic function of k)
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.computeIfAbsent(k, kk => {
      val ps = DetHash.minHashPerms(kk)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    })

  /** Band signature array for one NON-EMPTY shingle-hash set (the
    * expression maps empty arrays to NULL before reaching here).
    */
  def bandSigs(arr: ArrayData, k: Int, bands: Int): ArrayData = {
    val (as, bs) = perms(k)
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val hm = arr.getLong(j) % P
      var i = 0
      while (i < k) {
        val v = (as(i) * hm + bs(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      out(b) = if (r == 1) mins(b) else mins(2 * b) * P + mins(2 * b + 1)
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
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
