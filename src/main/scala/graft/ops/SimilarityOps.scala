package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the correctness baseline, and sign-random-projection LSH
  * bucketing as the scale path (candidates from bucket equality, exact
  * rerank inside buckets).
  *
  * All vector math is Catalyst `zip_with`/`aggregate` expressions in double
  * precision — sequential folds, so results are deterministic and
  * reproducible across partitionings. No UDFs.
  */
object SimilarityOps {

  /** Dot product of two array<float|double> columns (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: score every (query, corpus) pair, rank per
    * query. The query side is broadcast (queries ≪ corpus), so the corpus
    * scan stays a single narrow pass — at 100 TB this is the exact-rerank
    * baseline you run on a candidate subset, not the full corpus.
    * Deterministic tiebreak on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    RelationalOps.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn").as("rank"))
  }

  /** All near-duplicate pairs with cosine ≥ `minCos` by brute force —
    * correctness oracle for the LSH variant; quadratic, keep for tests/small
    * candidate sets.
    */
  def cosinePairsExact(df: DataFrame, minCos: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val l = df.select(col(idCol).as("a"), col(vecCol).as("av"))
    val r = df.select(col(idCol).as("b"), col(vecCol).as("bv"))
    l.join(r, col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("av"), col("bv")).as("cos"))
      .filter(col("cos") >= lit(minCos))
  }

  /** Deterministic pseudo-random hyperplane component for (plane i, dim j):
    * xxhash64 mapped to [-1, 1). No RNG state — reproducible across runs
    * and executors by construction.
    */
  private def planeComponent(i: Int, j: Column): Column =
    (xxhash64(lit(i), j).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-random-projection LSH bucket id: `nPlanes` hyperplane sign bits
    * packed into a long. Cosine-similar vectors collide with probability
    * (1 - θ/π)^nPlanes. Pure expression, no shuffle.
    */
  def srpBucket(vec: Column, nPlanes: Int = 16): Column =
    (0 until nPlanes).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(i, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed ANN: bucket by SRP signature with `nTables` independent
    * sign-projection tables, exact-rerank within buckets, keep top-k per
    * query. The shuffle key is (table, bucket) — never all pairs. Recall
    * grows with nTables; precision is exact (rerank is true cosine).
    */
  def lshTopK(df: DataFrame, k: Int, nPlanes: Int = 12, nTables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val tables = (0 until nTables).map { t =>
      // per-table plane family: offset the plane index so tables are independent
      val bucketed = df.select(col(idCol), col(vecCol),
        srpBucketTable(col(vecCol), nPlanes, t).as("bucket"))
      val l = bucketed.select(lit(t).as("tbl"), col("bucket"),
        col(idCol).as("query_id"), col(vecCol).as("qv"))
      val r = bucketed.select(lit(t).as("tbl"), col("bucket"),
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      l.join(r, Seq("tbl", "bucket")).filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
    }
    val candidates = tables.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("qv")).as("qv"), first(col("cv")).as("cv"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    RelationalOps.topKPerGroup(candidates, Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn").as("rank"))
  }

  private def srpBucketTable(vec: Column, nPlanes: Int, table: Int): Column =
    (0 until nPlanes).map { i =>
      val planeIdx = table * nPlanes + i
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(planeIdx, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
