package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram / shingle expressions for the text tier.
  *
  * The declarative chain `tokens → transform(sequence(...)) →
  * array_join(slice(...))` is the measured dominant map cost of the BM25,
  * PMI, HLL-vocab and KMV queries: the higher-order `transform` runs its
  * lambda INTERPRETED per element, every `slice` allocates an array copy,
  * and a second consumer of the token array re-inlines the whole split per
  * consumer (HOF lambdas don't CSE). Each expression here does the full
  * tokenize → window → join(→ hash) pipeline in ONE codegen'd call per row.
  *
  * Tokenization contract (bit-identical to [[graft.ops.TextOps.tokens]] =
  * `split(trim(text), "\\s+")`): trim strips ASCII spaces only (Spark's
  * `StringTrim`), then Java regex `\s+` splits with limit -1 — Spark's own
  * `StringSplit` routes through the same `java.util.regex` engine on the
  * same `toString` round trip, so token boundaries and bytes are identical
  * by construction. NULL input returns NULL (call sites that need the
  * declarative form's empty-array-on-null wrap in `coalesce`).
  */
object NgramExpressions {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** `split(trim(s), "\\s+")` exactly as Spark computes it. */
  def tokenize(s: UTF8String): Array[String] =
    WS.split(s.trim().toString, -1)
}

/** Underscore-joined word n-grams of a string as ONE native call:
  * array<string> mirroring [[graft.ops.TextOps.ngramTerms]] for n ≥ 2 —
  * token windows of length `n` joined with `_`, empty array when the
  * document has fewer than `n` tokens.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "word n-grams need n >= 2 (n = 1 is the plain split)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = NgramExpressions.tokenize(s)
    val m = toks.length - n + 1
    if (m <= 0) return EMPTY
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append('_').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Adjacent word pairs of a string as ONE native call:
  * array<struct<w1:string, w2:string>> mirroring the PMI bigram transform
  * (`struct(element_at(toks, i), element_at(toks, i + 1))` over the window
  * sequence) — empty array when the document has fewer than 2 tokens.
  */
case class WordBigramPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_bigram_pairs expects string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordBigramPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordBigramPairs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordBigramPairs =
    copy(child = newChild)

  override def prettyName: String = "word_bigram_pairs"
}

object WordBigramPairs {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String): ArrayData = {
    val toks = NgramExpressions.tokenize(s)
    val m = toks.length - 1
    if (m <= 0) return EMPTY
    // one UTF8String per distinct token position; w2(i) aliases w1(i+1)
    val us = new Array[UTF8String](toks.length)
    var t = 0
    while (t < toks.length) { us(t) = UTF8String.fromString(toks(t)); t += 1 }
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = new GenericInternalRow(Array[Any](us(i), us(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 60-bit md5 hashes of space-joined word k-shingles as ONE native call:
  * array<bigint> mirroring the KMV chain
  * `md5Hash60(array_join(slice(tokens(text), i, k), " "))` over every
  * window position — empty array when the document has fewer than `k`
  * tokens. The hash is [[Md5Hash60]] over the joined string's UTF-8 bytes,
  * so values stay bit-identical to the composed form and to the SQL
  * oracle's md5 replay.
  */
case class ShingleMd5Hashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingles need k >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_md5_hashes expects string, got ${t.sql}")
  }

  protected override def nullSafeEval(input: Any): Any =
    ShingleMd5Hashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleMd5Hashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5Hashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_md5_hashes"
}

object ShingleMd5Hashes {
  private val EMPTY = new GenericArrayData(Array.empty[Long])

  def compute(s: UTF8String, k: Int): ArrayData = {
    val toks = NgramExpressions.tokenize(s)
    val m = toks.length - k + 1
    if (m <= 0) return EMPTY
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = Md5Hash60.hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    new GenericArrayData(out)
  }
}
