package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics expressions for the per-document quality tier.
  *
  * These exist for the same reason as [[Md5Hash60]]: the declarative
  * higher-order-function formulations are correct but run INTERPRETED
  * (HOFs don't participate in whole-stage codegen, and their lambdas don't
  * CSE), which made the per-char entropy pass the slowest query in the
  * fleet (measured 10 s at sf0.1 vs ~1 s fleet norm). One native call per
  * row does the whole loop in a few microseconds and stays inside codegen.
  */
object TextExpressions

/** Character-distribution statistics of a string in ONE native pass:
  * struct(dc INT, ecb BIGINT) where `dc` is the number of distinct
  * characters (code points) and `ecb` = floor(100 · H) with H the Shannon
  * entropy of the character distribution in bits.
  *
  * Semantics mirror [[graft.ops.TextOps.charEntropyReport]]'s SQL oracle
  * exactly: characters are code points (what `substr`/`length` count in
  * both engines), the c·log2 c terms accumulate in ascending code-point
  * order (the sorted-run order of the declarative form), and the centibit
  * floor is the cross-engine float contract that absorbs last-ULP
  * differences between this accumulation and the oracle's groupBy sum.
  * Empty input returns (0, 0).
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dc", IntegerType, nullable = false),
    StructField("ecb", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats expects string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharEntropyStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStats =
    copy(child = newChild)

  override def prettyName: String = "char_entropy_stats"
}

object CharEntropyStats {
  private val LN2 = StrictMath.log(2.0)

  /** (distinct code points, entropy centibits) of `s` — see class doc. */
  def compute(s: UTF8String): InternalRow = {
    val cps = s.toString.codePoints().toArray
    java.util.Arrays.sort(cps)
    val n = cps.length
    if (n == 0) return new GenericInternalRow(Array[Any](0, 0L))
    var sum = 0.0
    var dc = 0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val c = (j - i).toDouble
      sum += c * (StrictMath.log(c) / LN2)
      dc += 1
      i = j
    }
    val h = StrictMath.log(n.toDouble) / LN2 - sum / n
    new GenericInternalRow(Array[Any](dc, math.floor(100.0 * h).toLong))
  }
}

/** DISTINCT character q-gram hashes of a string as one native call:
  * array<bigint> of 64-bit FNV-1a-with-fmix hashes over every window of
  * `q` consecutive code points, first-occurrence order, duplicates
  * dropped. Strings shorter than `q` return an empty array.
  *
  * This feeds [[graft.ops.DedupOps.editDistancePairs]]' candidate
  * generation. Unlike the dedup tier's [[Md5Hash60]]-derived signatures,
  * these hashes are deliberately NOT part of the cross-engine md5
  * determinism layer: the edit-distance oracle is a brute-force
  * levenshtein join that never recomputes gram hashes, so the hash only
  * has to be deterministic within the engine — and a register-only mix is
  * ~20x cheaper than a MessageDigest per window. Hash collisions merge
  * candidate buckets (more verify work), never lose a pair.
  */
case class CharGramHashes(child: Expression, q: Int) extends UnaryExpression {
  require(q >= 2, "char q-grams need q >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharGramHashes.compute(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGramHashes.compute($c, $q);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)

  override def prettyName: String = "char_gram_hashes"
}

object CharGramHashes {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Distinct q-gram hashes of `s`, first-occurrence order — class doc. */
  def compute(s: UTF8String, q: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < q) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](n - q + 1)
    var k = 0
    var i = 0
    while (i + q <= n) {
      var h = FnvOffset
      var j = 0
      while (j < q) { h = (h ^ cps(i + j)) * FnvPrime; j += 1 }
      h = fmix(h)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}
