package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProduct, Md5Hash60, MinHashBands, SimHash60}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions. Enable with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`), then
  * `SELECT dot_f(a.embedding, b.embedding) ...` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_f",
        "dot_f(a, b) - dot product of two array<float> columns, " +
          "double accumulation left-to-right"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_f takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "md5_hash60",
        "md5_hash60(x) - first 60 bits of md5(x) as a long " +
          "(= ('0x'||substring(md5(x),1,15))::BIGINT)"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "md5_hash60 takes exactly 1 argument")
        Md5Hash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60",
        "simhash60(hs) - 60-bit SimHash of an array<bigint> shingle-hash " +
          "set (majority parity vote per md5-seeded permutation)"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "simhash60 takes exactly 1 argument")
        SimHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands",
        "minhash_bands(hs, k, bands) - LSH band signatures (array<bigint>) " +
          "of an array<bigint> shingle-hash set; k and bands must be " +
          "integer literals"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        require(children.length == 3, "minhash_bands takes exactly 3 arguments")
        (children(1), children(2)) match {
          case (Literal(k: Int, IntegerType), Literal(b: Int, IntegerType)) =>
            MinHashBands(children.head, k, b)
          case _ => throw new IllegalArgumentException(
            "minhash_bands: k and bands must be integer literals")
        }
      }))
  }
}
