package graft

import org.apache.spark.sql.functions._

/** The data fingerprint is the identity that makes persisted-store tags
  * and the codebook memo safe against regenerated datasets — it must
  * never silently degrade to "no identity".
  */
class FingerprintSpec extends SparkTestBase {

  test("dataFingerprint survives caching and plan derivation; tracks file changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fp").toString
    spark.range(100).toDF("id").withColumn("v", col("id") * 2)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    def read() = spark.read.parquet(s"$dir/t.parquet")
    val fp0 = graft.ops.SimilarityOps.dataFingerprint(read())
    assert(fp0.nonEmpty, "file-backed frame must fingerprint")
    // derived plan: same leaves, same fingerprint
    val derived = read().select(col("id"), (col("v") * 3).as("w"))
    assert(graft.ops.SimilarityOps.dataFingerprint(derived) === fp0)
    // THE regression: Dataset.inputFiles reads the OPTIMIZED plan, which
    // the cache manager rewrites to InMemoryRelation once an equivalent
    // plan is cached — inputFiles goes empty and a fingerprint built on
    // it silently loses the data identity. The analyzed-plan walk must
    // keep fingerprinting through registration AND materialization.
    val scope = new graft.ops.CacheScope
    try {
      val reg = scope.register(read().select(col("id"),
        transform(array(col("v")), x => x + 1).as("qv")))
      val fpReg = graft.ops.SimilarityOps.dataFingerprint(reg)
      assert(fpReg.nonEmpty, "cached frame must keep its fingerprint")
      reg.count()
      assert(graft.ops.SimilarityOps.dataFingerprint(reg) === fpReg,
        "materializing the cache must not change the fingerprint")
    } finally scope.release()
    // regenerated data at the same path: fingerprint moves
    spark.range(100).toDF("id").withColumn("v", col("id") * 7)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(graft.ops.SimilarityOps.dataFingerprint(read()) !== fp0,
      "a rewrite at the same path must change the fingerprint")
    // non-file sources contribute nothing (identity lives in the plan)
    import spark.implicits._
    assert(graft.ops.SimilarityOps.dataFingerprint(
      Seq((1L, 2L)).toDF("a", "b")) === "")
  }
}
