package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for training-data pipelines — currently
  * connected components, the step that turns a near-duplicate PAIR list into
  * duplicate CLUSTERS (so dedup can keep exactly one representative per
  * group even when A~B and B~C but A!~C).
  */
object GraphOps {

  /** Connected components over an undirected edge list: (id, comp) for every
    * vertex, where comp = the minimum vertex id in its component (singletons
    * map to themselves).
    *
    * Algorithm: iterative min-label propagation with pointer jumping — each
    * round every vertex takes the min label over itself + its neighbors
    * (one edge join + one min aggregate, both shuffling on vertex id), then
    * relabels through its representative's own label (`comp(x) :=
    * comp(comp(x))`, one self-join). Propagation alone needs O(diameter)
    * rounds; the jumping step doubles how far labels reach per round, giving
    * O(log n) rounds even on path graphs (the hash-to-min regime of Rastogi
    * et al., "Finding Connected Components in Map-Reduce in Logarithmic
    * Rounds"). Near-dup clusters have tiny diameters, so 2-3 rounds is
    * typical.
    *
    * Scale contract: per round the work is two shuffles of (id, label) longs
    * + one of the edge list — no collect, no per-component state. The label
    * frame is `localCheckpoint`ed each round to truncate lineage (iterative
    * plans otherwise grow by one join-tree per round and overwhelm the
    * optimizer); on a real cluster prefer `checkpoint` with a reliable dir
    * if executor loss matters mid-computation. The edge list is checkpointed
    * once up front — it is consumed every round and may itself be an
    * expensive subtree (e.g. a MinHash pipeline). Convergence is detected
    * via the fixpoint of sum(comp) (labels are monotone non-increasing, so
    * an unchanged sum means no label moved): one scalar action per round.
    *
    * Every edge endpoint must appear in `vertices` (the label table seeds
    * from `vertices` alone).
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
                          idCol: String = "id",
                          aCol: String = "a", bCol: String = "b",
                          maxIter: Int = 25): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    // localCheckpoint persists an RDD invisible to the SQL CacheManager (so
    // CacheScope can't free it); track each round's newly-persisted RDD ids
    // and unpersist a round's blocks as soon as the next round supersedes
    // them. Best-effort by id-set diff — a concurrent persist from another
    // thread would at worst be left to the ContextCleaner, never freed early
    // (we only free ids this loop itself created).
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val e = edges.select(col(aCol).cast("long").as("nb"), col(bCol).cast("long").as("x"))
    val (sym, symIds) = checkpointTracked(
      e.select(col("x"), col("nb"))
        .union(e.select(col("nb").as("x"), col("x").as("nb"))))
    var (labels, labelIds) = checkpointTracked(
      vertices.select(col(idCol).cast("long").as("x"), col(idCol).cast("long").as("comp")))
    var prevSum: java.math.BigDecimal = null
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val fromNbrs = sym
        .join(labels.select(col("x").as("nb"), col("comp")), Seq("nb"))
        .select(col("x"), col("comp"))
      val merged = labels.union(fromNbrs)
        .groupBy(col("x")).agg(min(col("comp")).as("comp"))
      // pointer jumping: every label is itself a vertex id, so its current
      // label exists in `merged` — the inner join is total, coalesce guards
      // the (impossible by contract) missing-vertex case
      val jumped = merged
        .join(merged.select(col("x").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("x"), coalesce(col("comp2"), col("comp")).as("comp"))
      val (next, nextIds) = checkpointTracked(jumped)
      // decimal accumulation: sum of n ids can overflow a long at scale
      val row = next.agg(sum(col("comp").cast("decimal(38,0)"))).head()
      val s = if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
      done = prevSum != null && s.compareTo(prevSum) == 0
      prevSum = s
      free(labelIds) // superseded round (next is already materialized)
      labels = next
      labelIds = nextIds
      it += 1
    }
    // the final round's checkpoint backs the returned frame and is freed by
    // the ContextCleaner when the caller drops it; the edge list is done now
    free(symIds)
    labels.select(col("x").as(idCol), col("comp"))
  }

  /** PageRank in FIXED-POINT integer arithmetic — bit-deterministic across
    * engines, runs, and partitionings, which floating-point PageRank is NOT
    * (parallel double summation has no defined order). All mass lives in
    * integer `scale`-units: init `scale div n` per vertex; per round each
    * vertex sends `(85 · (rank div out_deg)) div 100` to every out-neighbor
    * and every vertex restarts from `(15 · (scale div n)) div 100`. Long
    * sums of non-negative contributions are order-free, so the DuckDB
    * oracle reproduces ranks EXACTLY with the same unrolled iterations.
    * The `div`-truncation dust (< 1 unit per edge per round) is the price
    * of determinism; with scale = 10^12 it is ~1e-12 of the mass.
    *
    * Scale shape per round: one (src-keyed) edge⋈rank join + one dst-keyed
    * sum — the same two shuffles any distributed PageRank pays. A FIXED
    * iteration count (no convergence action) keeps the plan a pure unrolled
    * dataflow; lineage is truncated per round like [[connectedComponents]].
    * Dangling mass is dropped (standard simplification), deterministically.
    *
    * Edges are directed (src, dst); pass both directions for an undirected
    * graph. Every endpoint must appear in `vertices`.
    */
  def pageRankInt(edges: DataFrame, vertices: DataFrame,
                  idCol: String = "id", srcCol: String = "src",
                  dstCol: String = "dst", iterations: Int = 3,
                  scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50, "iterations in [1, 50]")
    val sc = edges.sparkSession.sparkContext
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint()
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    // vertices AND edges may be expensive subtrees (joins/distincts) that
    // would otherwise re-execute once per round — materialize both up front
    val (v, vIds) = checkpointTracked(
      vertices.select(col(idCol).cast("long").as("x")))
    val (e, eIds) = checkpointTracked(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")))
    val (deg, degIds) = checkpointTracked(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    val n = v.count()
    val init = scale / math.max(n, 1L)
    val base = 15L * init / 100L
    var (ranks, rankIds) = checkpointTracked(
      v.select(col("x"), lit(init).as("rank")))
    (0 until iterations).foreach { _ =>
      val contribs = e
        .join(ranks.select(col("x").as("src"), col("rank")), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("x"),
          expr("(85 * (rank div deg)) div 100").as("c"))
        .groupBy(col("x")).agg(sum(col("c")).as("inflow"))
      // localCheckpoint() is EAGER by default — next is fully materialized
      // when checkpointTracked returns, so the superseded round frees safely
      val (next, nextIds) = checkpointTracked(
        v.join(contribs, Seq("x"), "left")
          .select(col("x"),
            (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank")))
      free(rankIds)
      ranks = next
      rankIds = nextIds
    }
    free(degIds)
    free(eIds)
    free(vIds)
    // like connectedComponents: the FINAL round's checkpoint backs the
    // returned frame and is freed by the ContextCleaner once the caller
    // drops the frame — it cannot be freed here without invalidating the
    // result (localCheckpoint truncates lineage, so there is no recompute)
    ranks.select(col("x").as(idCol), col("rank"))
  }
}
