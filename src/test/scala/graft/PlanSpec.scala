package graft

import org.apache.spark.sql.DataFrame

/** Plan audits: lock in the physical-plan properties that make the query set
  * scale — predicate pushdown into the parquet scan, column pruning,
  * broadcast joins for small dimensions, partitioned (never global) window
  * sorts, and the absence of cartesian/nested-loop pair enumeration in the
  * dedup tier. A regression here won't change small-SF results but would
  * change the 100-TB cost class, which is why it's asserted, not just
  * eyeballed.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkTestBase.sf001)
      .queryExecution.executedPlan.toString

  private def optimized(name: String): String =
    SparkEntry.queries(name)(spark, SparkTestBase.sf001)
      .queryExecution.optimizedPlan.toString

  test("q01 pricing summary: date filter reaches the parquet scan, schema pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "shipdate predicate must be pushed to the scan")
    // only the 6 referenced columns are read, not all 16 lineitem columns
    val scan = SparkEntry.queries("q01_pricing_summary")(spark, SparkTestBase.sf001)
      .queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    assert(scan.requiredSchema.fieldNames.toSet === Set(
      "l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"),
      s"scan must prune to the 6 referenced columns, got ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("q08 isin nation: small dimension side is broadcast, filter pushed") {
    val p = plan("q08_isin_nation")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "nation side must broadcast — a shuffle join of a 25-row dim is wrong at any scale")
    assert(p.contains("PushedFilters: [In(n_name") || p.contains("In(n_name,"),
      "isin filter must be pushed to the nation scan")
  }

  test("q16 top-k per segment: window is hash-partitioned, no global sort of the data") {
    val p = plan("q16_topk_per_segment")
    assert(p.contains("WindowGroupLimit"),
      "rank-limit pushdown (WindowGroupLimit) keeps per-partition state at k rows")
    val windowSort = p.linesIterator.filter(_.contains("Sort ")).toSeq
    assert(windowSort.exists(_.contains("false, 0")),
      "the window's sort must be partition-local (global=false)")
  }

  test("q27 tumbling windows: one hash aggregation with map-side partials") {
    val p = plan("q27_events_tumbling")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "windowed agg must be partial+final hash aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup tier never enumerates all pairs: no cartesian/nested-loop joins") {
    Seq("q21_jaccard_pairs", "q22_minhash_neardup", "q30_simhash_neardup",
        "q36_jaccard_prefix").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
    }
  }

  test("CDC tier: chunking is map-only; blob pairs stay an inverted equi-join") {
    // q169: one scan, the gear walk fused into it — no join, no shuffle
    // before the presentation sort
    val p169 = plan("q169_cdc_chunks")
    assert(!p169.contains("Join"), "chunking must not join")
    // q171: candidate pairs come from the chunk-hash-keyed self-join; the
    // only broadcast allowed is the tiny hot-hash exclusion set
    val p171 = plan("q171_blob_neardup")
    assert(!p171.contains("CartesianProduct") &&
      !p171.contains("BroadcastNestedLoopJoin"),
      "blob near-dup must never enumerate all pairs")
  }

  test("q178 triangle census: degree-ordered wedge joins, never a cartesian") {
    // the O(m^1.5) guarantee rests on every join in the wedge enumeration
    // being equi-keyed (src / (v,w)); a cartesian or nested-loop here would
    // mean the orientation was lost and the plan degraded to all-pairs
    val p = plan("q178_neardup_triangles")
    assert(!p.contains("CartesianProduct"), "triangle census plans a cartesian")
    // the only nested-loop joins allowed are the two one-row stat-frame
    // combines at the very top (vertex/wedge x edge x triangle counts);
    // each is a Cross over single-row aggregates — a BNLJ in the wedge
    // enumeration itself would be Inner and corpus-scale
    val bnlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size === 2 && bnlj.forall(_.contains("Cross")),
      s"unexpected nested-loop shape:\n${bnlj.mkString("\n")}")
  }

  test("q181/q183/q185: cohort, transitions and canonical dedup plan no cartesian, windows stay keyed") {
    Seq("q181_cohort_retention", "q183_event_transitions",
        "q185_canonical_dedup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
      // every window in these plans is user-keyed; an unpartitioned
      // window would funnel the corpus through one task
      assert(!p.contains("Window [") || !p.contains("No Partition"),
        s"$q has an unpartitioned window")
    }
    // q183's lead window is per-user: the Window node must carry a
    // partition spec
    val p183 = plan("q183_event_transitions")
    val winLines = p183.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(_.contains("user_id")),
      s"q183 window must partition by user_id:\n${winLines.mkString("\n")}")
  }

  test("q30 plans zero joins; q21 plans exactly one shuffled self-join") {
    // round-4 shapes: q30's grouped-bucket pair expansion removed the
    // banded self-join entirely (the fingerprint subtree has ONE consumer);
    // q21's only join is the inverted-index tok self-join — reintroducing
    // pair-keyed joins after the aggregation would show up here
    val p30 = plan("q30_simhash_neardup")
    assert(!p30.contains("Join"), "q30 must emit in-bucket pairs without a join")
    val p21 = plan("q21_jaccard_pairs")
    val joinLines = p21.linesIterator.filter(_.contains("Join")).toSeq
    val inner = joinLines.count(_.contains(" Inner"))
    assert(inner === 1, s"q21 must have exactly the tok self-join, got:\n${joinLines.mkString("\n")}")
    // every other join is the maxDf left-anti guard (it appears once per
    // self-join side); pair-keyed post-aggregation joins would be Inner
    assert(joinLines.filterNot(_.contains(" Inner")).forall(_.contains("LeftAnti")),
      s"unexpected join shape:\n${joinLines.mkString("\n")}")
  }

  test("q26 LSH ANN: SRP plane weights are plan literals (no runtime hashing)") {
    val p = optimized("q26_lsh_ann_topk")
    assert(!p.contains("md5"), "plane components must be pre-computed literals")
    assert(!p.contains("CartesianProduct"))
  }

  test("describe/zscore/AR: single-row stats broadcast back, no window-over-everything") {
    Seq("q06_describe", "q13_zscore_customers", "q14_ar_numeric").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window ["), s"$q must not use an unpartitioned window")
    }
    assert(plan("q13_zscore_customers").contains("BroadcastExchange"),
      "zscore joins the 1-row stats via broadcast")
  }

  test("q25/q35: building the plan runs no Spark job (nothing driver-collected)") {
    // the round-3 q25 collected the corpus to the driver while BUILDING the
    // DataFrame; the blocked/bucketed plans must be fully lazy
    // each spark.read.parquet runs one footer-reading job ("parquet at
    // Tables.scala") — that's the source layer, not the query. Anything
    // else (a collect/count in an operator) fails the assert.
    val offending = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var sawMarker = false
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val stages = j.stageInfos.map(_.name).mkString(";")
        if (stages.contains("count at PlanSpec")) sawMarker = true
        else if (!stages.contains("parquet at Tables.scala")) offending.add(stages)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Seq("q25_neardup_cosine", "q35_srp_neardup").foreach { q =>
        SparkEntry.queries(q)(spark, SparkTestBase.sf001)
          .queryExecution.executedPlan
      }
      // the listener bus is FIFO: run a marker job and wait for ITS event,
      // which guarantees any earlier (offending) event was also delivered —
      // a fixed sleep would race a slow bus
      spark.sparkContext.range(0, 1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sawMarker && System.nanoTime() < deadline) Thread.sleep(20)
      assert(sawMarker, "listener bus never delivered the marker job event")
      assert(offending.isEmpty,
        s"plan construction ran jobs — a driver collect is hiding in the query path: $offending")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q70 pivot / q72 grouping sets: ONE scan feeding one aggregation") {
    // pivot must not scan once per pinned value; grouping sets must expand
    // rows in-plan (Expand), not union per-set scans
    Seq("q70_pivot_totals" -> false, "q72_grouping_sets" -> true).foreach {
      case (q, wantsExpand) =>
        val p = plan(q)
        val scans = p.linesIterator.count(_.contains("Scan parquet"))
        assert(scans === 1, s"$q must scan its table once, got $scans")
        if (wantsExpand) assert(p.contains("Expand"),
          s"$q should plan GROUPING SETS via a single Expand")
    }
  }

  test("chunkDocs operator is map-only: tokenize/explode/slice without any exchange") {
    val df = graft.ops.TextOps.chunkDocs(
      graft.sources.Tables(spark, SparkTestBase.sf001, "documents"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n${p.take(600)}")
    assert(p.contains("Generate explode"), "chunk starts explode in-plan")
  }

  test("q76 bloom join: 2KB filter broadcasts, fact rows filtered before the exact join") {
    val p = plan("q76_bloom_join")
    // the 1-row bloom rides a broadcast nested-loop join (the probe), the
    // exact join is a hash join — and the probe filter sits on the fact
    // side BELOW the exact join in the plan tree
    assert(p.contains("BroadcastNestedLoopJoin"), "bloom row must broadcast to the probe")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "exact join must be a hash-family join")
    val lines = p.linesIterator.toSeq
    val exactJoin = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin"))
    // the probe condition (shiftleft bit test) fuses INTO the
    // nested-loop join node, which must sit below the exact join
    val probe = lines.indexWhere(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("shiftleft"))
    assert(exactJoin >= 0 && probe > exactJoin,
      s"bloom probe must run below the exact join (join@$exactJoin, probe@$probe)")
    assert(!p.contains("CartesianProduct"))
  }

  test("q35 SRP near-dup: plane literals, no cartesian, no nested-loop pair scan") {
    val p = optimized("q35_srp_neardup")
    assert(!p.contains("md5"), "plane components must be pre-computed literals")
    val phys = plan("q35_srp_neardup")
    assert(!phys.contains("CartesianProduct"))
    assert(!phys.contains("BroadcastNestedLoopJoin"))
  }

  test("q39 approx quantiles: sketch + rank check plan global-sorts nothing") {
    // the whole point of the mergeable-sketch quantile is that NO stage
    // sorts the data: percentile_approx aggregates partial sketches and the
    // rank check is count-filters — a Sort (or exact `percentile`, which
    // buffers per group) would put the query in a different cost class
    val p = plan("q39_approx_quantiles")
    assert(!p.contains("Sort "), "no sort of the value column at any scale")
    assert(p.contains("approx_percentile") || p.contains("percentile_approx"),
      "quantiles must come from the mergeable sketch aggregate")
    assert(p.contains("BroadcastExchange"),
      "the 1-row sketch result must broadcast back over the rank check")
  }

  test("q40 top terms: per-doc window rank-limited, no cartesian, 1-row n broadcast") {
    val p = plan("q40_top_terms")
    assert(p.contains("WindowGroupLimit"),
      "per-document top-k must push the rank limit into the window")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the 1-row document count must broadcast, never shuffle the term table against it")
  }

  test("q41 contamination: benchmark side joins as LEFT SEMI on the hash key") {
    val p = plan("q41_contamination")
    assert(p.contains("LeftSemi"),
      "membership check must be a semi join — an inner join would duplicate rows per match")
    assert(!p.contains("CartesianProduct"))
  }

  test("q47 as-of join: union+scan shape — no join operator at all") {
    // the whole point of the union-then-window design is that an as-of
    // match costs one user_id shuffle, not an inequality join; any Join
    // node here means the O(left × right) expansion crept back in
    val p = plan("q47_asof_join")
    assert(!p.contains("Join"), "as-of must not plan a join")
    assert(!p.contains("CartesianProduct"))
    val windows = SparkEntry.queries("q47_asof_join")(spark, SparkTestBase.sf001)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the as-of window must be partitioned by user, never global")
  }

  test("q46 packing: only the chunk-totals table crosses an unpartitioned window") {
    // the full-table cumsum must run partitioned by chunk; the single
    // unpartitioned window may only see the aggregated chunk totals
    // (corpus/chunkSize rows). An unpartitioned window directly over the
    // documents scan would be the single-partition scan killer.
    val df = SparkEntry.queries("q46_pack_sequences")(spark, SparkTestBase.sf001)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(partitioned.nonEmpty, "per-chunk cumsum must be a partitioned window")
    assert(global.forall(w => w.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty), "the unpartitioned cumsum may only run over aggregated chunk totals")
    // and the pair stays a broadcast join back to the full table
    assert(plan("q46_pack_sequences").contains("BroadcastHashJoin"),
      "chunk bases must broadcast-join back (they are corpus/chunkSize rows)")
  }

  test("q45/q48: repetition and stratified sample keep map-only/pushed shapes") {
    // repetition stats fold over the sorted token array — map-only: the
    // only exchange allowed is the final output-ordering rangepartitioning
    val p45 = plan("q45_repetition")
    assert(!p45.contains("Join") && !p45.contains("Window "),
      "top-token must come from the array fold, not a count shuffle + rank")
    val exchanges45 = p45.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges45.forall(_.contains("rangepartitioning")),
      s"saw non-output exchange: ${exchanges45.mkString("; ")}")
    // stratified sampling is a pure per-row filter fused into the scan side
    val p48 = plan("q48_stratified_sample")
    assert(!p48.contains("Join"), "hash sampling must not join anything")
  }

  test("q50/q51: masking is map-only; bigram top-k avoids a global sort") {
    // regex masking must stay a pure projection — the only exchange allowed
    // is the final output-ordering rangepartitioning the oracle compare
    // requires; a hashpartitioning would mean the op stopped being map-only
    val exchanges50 = plan("q50_mask_pii").linesIterator
      .filter(_.contains("Exchange")).toSeq
    assert(exchanges50.forall(_.contains("rangepartitioning")),
      s"masking is per-row; saw non-output exchange: ${exchanges50.mkString("; ")}")
    val p51 = plan("q51_bigrams")
    assert(p51.contains("TakeOrderedAndProject"),
      "top-k bigrams must use TakeOrderedAndProject, not a global sort")
    assert(p51.contains("partial_count") || p51.contains("HashAggregate"),
      "bigram counting must partial-aggregate map-side")
  }

  test("q52/q55: gap and quality-filter windows are hash-partitioned, never global") {
    Seq("q52_event_gaps" -> "user_id", "q55_quality_filter" -> "lang")
      .foreach { case (q, key) =>
        val p = plan(q)
        // the window's own sort is partition-local; only the final
        // output-ordering sort (above the rangepartitioning) is global
        val windowSorts = p.linesIterator.filter(_.contains("Sort "))
          .filter(_.contains("false, 0")).toSeq
        assert(windowSorts.nonEmpty,
          s"$q must sort within hash partitions for its window")
        assert(p.contains(s"hashpartitioning($key"),
          s"$q must partition its window by $key")
      }
  }

  test("q56 SQL front-end: dimension joins broadcast, region filter pushed to scan") {
    val p = plan("q56_sql_q5")
    assert(p.contains("BroadcastHashJoin"),
      "region/nation/supplier sides must broadcast")
    assert(p.contains("EqualTo(r_name,ASIA)") || p.contains("PushedFilters: [IsNotNull(r_name)"),
      "r_name = 'ASIA' must reach the region scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q61 interval join: equi hash/merge join on user with range as residual, no BNLJ") {
    val p = plan("q61_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the time-range condition must ride an equi-join on user_id, not a pair scan")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("q59/q60: novelty joins on the bigram key; anomaly window partitioned by type") {
    val p59 = plan("q59_novelty")
    assert(!p59.contains("CartesianProduct") && !p59.contains("BroadcastNestedLoopJoin"),
      "hapax scoring must join on the bigram key, never enumerate pairs")
    val p60 = plan("q60_anomaly")
    assert(p60.contains("hashpartitioning(event_type"),
      "the anomaly window must partition by event_type")
    assert(p60.contains("partial_count") || p60.contains("HashAggregate"),
      "hourly rollup must partial-aggregate before the window")
  }

  test("q94 shuffle: ranks run bucket-partitioned, offsets broadcast — data never single-partitions") {
    val p = plan("q94_deterministic_shuffle")
    // the per-row rank window must partition by the hash bucket; a global
    // row_number over the corpus would be the exact single-partition sort
    // this operator exists to avoid
    assert(p.contains("hashpartitioning(__b"),
      s"rank window must partition by bucket:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bucket offsets must join back as a broadcast")
  }

  test("q110 drift: one (source,bucket) corpus aggregation, grid joins broadcast") {
    val p = plan("q110_source_drift")
    // the only corpus-scale exchange is the (source, bucket) count; the
    // zero-filled grid, per-bucket totals and corpus totals all ride
    // broadcasts back onto the tiny aggregate
    assert(p.contains("hashpartitioning(source"),
      s"count shuffle must key on (source, bucket):\n${p.take(1200)}")
    assert(p.contains("BroadcastExchange"),
      "grid/totals joins must broadcast")
    // tiny cross joins (1-row totals, ≤64-row bucket frame) ride broadcast
    // nested loops BY DESIGN — only a non-broadcast cartesian is forbidden
    assert(!p.contains("CartesianProduct"))
  }

  test("q114/q115/q117 sampling tier: running sums bucket-partitioned, offsets broadcast") {
    // the q94 lemma applied to the token cumsums: every rank/cumsum window
    // partitions by the hash bucket (with source for the per-source draw) —
    // a single-partition window over the corpus is the failure mode
    for ((q, key) <- Seq("q114_mixture_draw" -> "hashpartitioning(source",
      "q115_shard_plan" -> "hashpartitioning(__b",
      "q117_training_shards" -> "hashpartitioning(__b")) {
      val p = plan(q)
      assert(p.contains(key), s"$q cumsum window must partition by bucket ($key):\n${p.take(1200)}")
      assert(p.contains("BroadcastExchange"), s"$q offsets must broadcast")
    }
  }

  test("q91 ngram spans: hash-keyed semi join, per-doc islands window, no global sort of matches") {
    val p = plan("q91_ngram_spans")
    assert(p.contains("LeftSemi"), "train-gram match must be a LEFT SEMI join")
    // the islands window runs hash-partitioned by doc id — a global
    // (empty-partition) window over match rows would serialize the merge
    assert(p.contains("hashpartitioning(id"),
      s"span-merge window must partition by doc id:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q92 repeated spans: only ints cross the span exchanges, tokens never ship as rows") {
    // the removed-position frame aggregates to ONE int array per doc before
    // anything re-joins the documents; a per-token (id, tpos, tok) shuffle
    // would inflate the exchange payload ~3-4x vs shipping the documents
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      graft.ops.TextOps.removeRepeatedSpans(
          graft.sources.Tables(spark, SparkTestBase.sf001, "documents"), n = 3)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(exchanges.nonEmpty, "span window needs a doc-keyed exchange")
    exchanges.foreach { e =>
      val scalarStrings = e.output.filter(
        _.dataType == org.apache.spark.sql.types.StringType)
      assert(scalarStrings.isEmpty,
        s"no scalar string column may shuffle in the span pipeline, got " +
          scalarStrings.map(_.name).mkString(","))
    }
  }

  test("q98 substring dedup: ONE gram-hash exchange, unordered keeper window (no sort), int-only shuffles") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = graft.ops.TextOps.exactSubstringDedup(
          graft.sources.Tables(spark, SparkTestBase.sf001, "documents"), n = 5)
        .queryExecution
      val exchanges = qe.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // gram stream shuffles once by hash; removed positions once by doc;
      // token STRINGS never ship as rows (same contract as q92)
      exchanges.foreach { e =>
        assert(e.output.forall(
          _.dataType != org.apache.spark.sql.types.StringType),
          s"string column in span-pipeline exchange: ${e.output.mkString(",")}")
      }
      // the keeper min(struct) runs over the UNORDERED whole-partition
      // frame: no SortExec may feed the window
      val winSorted = qe.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.child.isInstanceOf[org.apache.spark.sql.execution.SortExec]
      }
      assert(winSorted.nonEmpty && winSorted.forall(_ == false),
        "keeper window must not sort its partition")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("q99 DSIR: scoring stage is map-only — bucket model embedded as a literal, no join") {
    // after the two bounded bucket-count aggregations collect as model
    // params, the per-doc scoring must be a pure projection over the scan:
    // no join operator and no exchange anywhere in the scoring plan
    val docs = graft.sources.Tables(spark, SparkTestBase.sf001, "documents")
    val qe = graft.ops.TextOps.dsirWeights(docs,
        docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
        buckets = 64)
      .queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("Join"), s"scoring plan must not join:\n${p.take(800)}")
    assert(qe.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "scoring plan must not shuffle")
  }

  test("q100 LM score: every model/scoring exchange carries int keys only, no string shuffles") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges = try {
      graft.ops.TextOps.bigramLmScore(
          graft.sources.Tables(spark, SparkTestBase.sf001, "documents"))
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(e.output.forall(
        _.dataType != org.apache.spark.sql.types.StringType),
        s"token strings must hash before the exchange: ${e.output.mkString(",")}")
    }
  }

  test("q89/q90 persisted-index queries AS SHIPPED: corpus side bucketed, never re-shuffled") {
    // the lifecycle queries' scale contract, asserted on the exact plans the
    // driver runs: the index tables are scanned through their bucketed
    // layout and no exchange re-partitions index data before its join —
    // only the (small) probe side shuffles
    try {
      assertCorpusExchangeFree(
        SparkEntry.queries("q89_persisted_index_dedup")(spark, SparkTestBase.sf001),
        "graft_q89_corpus")
      assertCorpusExchangeFree(
        SparkEntry.queries("q90_persisted_ivf_topk")(spark, SparkTestBase.sf001),
        "graft_q90_ivf")
    } finally {
      graft.ops.DedupOps.bandedIndexTables.foreach(s =>
        graft.sources.Bucketing.dropTableAndLocation(spark, s"graft_q89_corpus_$s"))
      Seq("cells", "centroids", "meta").foreach(s =>
        graft.sources.Bucketing.dropTableAndLocation(spark, s"graft_q90_ivf_$s"))
    }
  }

  test("q120 KMV overlap: no corpus-wide window, pair stage broadcast") {
    val p = plan("q120_kmv_overlap")
    val sorts = p.linesIterator.filter(_.contains("Sort ")).toSeq
    // the bottom-k windows sort within (source[, bucket]) partitions; the
    // single global sort is the <= nSources^2-row output ordering
    assert(sorts.count(_.contains("true, 0")) <= 1,
      "only the final matrix ordering may sort globally")
    assert(p.contains("BroadcastExchange"),
      "the sketch-merge joins must broadcast the pair frame")
  }

  test("q122 vocab coverage: bounded top-V ranking, vocab joins broadcast") {
    val p = plan("q122_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "global ranking must be per-partition heaps, never a full term sort")
    assert(p.contains("BroadcastHashJoin"),
      "the <= max(V)-row vocabulary must broadcast onto the per-source counts")
  }

  test("q127 semdedup: cell-blocked pairing, no cartesian anywhere") {
    val p = plan("q127_semdedup")
    assert(!p.contains("CartesianProduct"),
      "pairing must go through the cell equi-join, never all-pairs")
  }

  test("q121 script mix: entirely map-only — no exchange anywhere in the plan") {
    val p = plan("q121_script_mix")
    assert(!p.contains("Exchange"),
      "per-doc script audit must never shuffle")
    assert(p.contains("*(1)"),
      "regex counts + integer arithmetic should stay inside one codegen stage")
  }

  test("q136 edit-distance: banded equi-join candidates, native gram codegen, no cartesian") {
    val p = plan("q136_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must go through the (gram, band) equi-join, never all-pairs")
    assert(p.contains("char_gram_hashes"),
      "gram extraction must be the native codegen expression, not an interpreted HOF")
    assert(p.contains("WindowGroupLimit"),
      "the rarest-prefix rank filter must push down to per-partition heaps")
  }

  test("scale-gate tier (q165-q167): the full-corpus operators keep their banded plans under the sample filter") {
    // q165/q166 run the FULL operator and filter the report — the sample
    // predicate must not degrade the candidate joins into pair enumeration
    Seq("q165_edit_distance_sampled", "q166_containment_sampled",
        "q167_edit_dedup_sampled").foreach { q =>
      assert(!plan(q).contains("CartesianProduct") &&
          !plan(q).contains("BroadcastNestedLoop"),
        s"$q must keep the banded equi-join candidate shape")
    }
  }

  test("q137 char entropy: map-only native expression — the only exchange is the output sort") {
    val p = plan("q137_char_entropy")
    assert(p.contains("char_entropy_stats"),
      "entropy must be the native codegen expression")
    // exactly one exchange: the rangepartitioning for the deterministic ORDER BY
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"per-doc stats must not shuffle (got $exchanges exchanges)")
  }

  test("q139 MAD outliers: histogram medians, median frames broadcast back") {
    val p = plan("q139_mad_outliers")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"),
      "the <= nSources median frames must broadcast onto the scored corpus")
    // windows are source-partitioned (value histograms), never corpus-global;
    // the single global sort allowed is the deterministic output ORDER BY
    val globalSorts = p.linesIterator
      .filter(l => l.contains("Sort ") && l.contains("true, 0")).toSeq
    assert(globalSorts.size <= 1,
      s"only the output ORDER BY may sort globally, got: $globalSorts")
  }

  test("q142 weighted sample: per-partition k-heaps, no shuffle, no global sort") {
    val p = plan("q142_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "smallest-k must resolve as TakeOrderedAndProject (k-heap per partition)")
    assert(!p.contains("Exchange"),
      s"the race key is map-only and the heap needs no shuffle:\n${p.take(600)}")
  }

  test("q143 FIM transform: map-only; only the output ORDER BY exchanges") {
    val p = plan("q143_fim_transform")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"per-row hash splits must not shuffle (got $exchanges exchanges)")
  }

  test("q144 vocab growth: chunk offsets broadcast, one token-keyed aggregation") {
    val p = plan("q144_vocab_growth")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "chunk base offsets and the totals row must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate"), "per-type first positions must hash-aggregate")
  }

  test("q145 span corruption: map-only fold; only the output ORDER BY exchanges") {
    val p = plan("q145_span_corrupt")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"the corruption fold must not shuffle (got $exchanges exchanges)")
  }

  test("q140 snapshot diff: digest-only full-outer join, texts never shuffle") {
    val p = plan("q140_snapshot_diff")
    assert(p.contains("FullOuter"), "diff must be one full-outer join on id")
    // the digests compute BELOW the exchange (map-side md5 in the scan's
    // project), so only (id, digest) rows shuffle — asserted by the md5
    // projection sitting under a hashpartitioning exchange
    assert(p.contains("md5"), "digests must be computed map-side")
    assert(p.linesIterator.exists(_.contains("Exchange hashpartitioning")),
      "the diff join shuffles on id")
  }

  test("driver contract: every query has an oracle and vice versa") {
    // a key typo would silently downgrade a query to the driver's weaker
    // rows-only check — the whole point of the oracle map is that it never
    // happens
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
    assert(SparkEntry.queries.nonEmpty)
  }

  test("flagship entry smoke: returns rows on sf0.001") {
    val df: DataFrame = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("candidate-fed ANN tier (q155-q157): no cartesian; nested loops only for one-row broadcasts") {
    Seq("q155_knn_density_lsh", "q156_ivf_delete_probe",
        "q157_hard_negatives_lsh").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
    // every join in the probe/rerank chains is key-equi — a nested loop
    // would mean some candidate or tombstone join degenerated
    Seq("q156_ivf_delete_probe", "q157_hard_negatives_lsh").foreach { q =>
      assert(!plan(q).contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join")
    }
    // q155's only nested loops are the two one-row broadcasts the density
    // threshold needs (total count + histogram cut) — never a pair join
    val p155 = plan("q155_knn_density_lsh")
    assert(p155.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 2,
      "q155 must not add nested-loop joins beyond the one-row broadcasts")
    // q162 (purity from LSH candidates) is all keyed joins end to end:
    // collision band join, rerank id-lookups, label joins, LEFT coverage
    // join — no quadratic stage anywhere (the point of replacing q160's
    // brute pass at corpus scale)
    val p162 = plan("q162_label_purity_lsh")
    assert(!p162.contains("CartesianProduct") &&
        !p162.contains("BroadcastNestedLoopJoin"),
      "q162 must stay fully equi-joined (no brute pass)")
  }

  test("audit/card tier (q158-q161): brute passes bounded to the deliberate broadcast, everything else equi-joined") {
    Seq("q158_lsh_recall", "q159_corpus_card",
        "q160_label_purity", "q161_line_dedup").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
    // q159 (one doc pass + windows) and q161 (three keyed shuffles) have
    // no pair-enumeration stage at all — a nested loop anywhere means a
    // join key was lost
    Seq("q159_corpus_card", "q161_line_dedup").foreach { q =>
      assert(!plan(q).contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join")
    }
    // q160 is the DELIBERATE brute audit — since r15 the pass is the
    // broadcast-queries mapPartitions kernel (one compiled loop +
    // k-bounded partial heaps), so the plan must carry the kernel's
    // MapPartitions node and ZERO nested-loop joins: a BNLJ appearing
    // means the |q|·|c| expression cross crept back in
    val p160 = plan("q160_label_purity")
    assert(p160.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 0,
      "q160 must score through the mapPartitions kernel, not a nested loop")
    assert(p160.contains("MapPartitions"),
      "q160's brute pass must be the compiled mapPartitions kernel")
    // q158's truth side is brute over the fixed query SAMPLE — the one
    // bounded broadcast pass; the recall join itself is id-equi
    assert(plan("q158_lsh_recall").linesIterator
        .count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      "q158 must not nested-loop outside the sampled truth pass")
    // the per-query windows in both audits must stay partition-local: the
    // only global sort allowed is the single presentation orderBy at the top
    Seq("q158_lsh_recall", "q160_label_purity").foreach { q =>
      val globalSorts = plan(q).linesIterator
        .count(l => l.contains("Sort ") && l.contains("true, 0"))
      assert(globalSorts <= 1,
        s"$q has a global sort inside the audit chain (got $globalSorts)")
    }
  }

  test("cross-query SRP pass sharing: sibling consumers at one operating point serve from ONE registered pass") {
    // the graph tier's bench economics assume every consumer of the same
    // (corpus, floor, operating point) rides ONE banding + cosine-verify
    // pass via CacheScope registration — the sharing silently dropped once
    // in round 12 when a consumer re-pointed its pairs plan, re-paying N
    // full SRP passes. Lock it structurally: after sibling 1 registers
    // and materializes the pass, sibling 2's physical plan must read the
    // SAME cache entry (identical CachedRDDBuilder), not re-derive it.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val emb = graft.sources.Tables(spark, SparkTestBase.sf001, "embeddings")
    val scope = new graft.ops.CacheScope
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // sibling 1 (the q192/q196 shape): register the verified pairs and
      // materialize them
      val pairs = scope.register(
        graft.ops.SimilarityOps.srpNearDupPairsAuto(emb, 0.2))
      pairs.count()
      val firstBuilders = pairs.queryExecution.executedPlan.collect {
        case s: InMemoryTableScanExec => s.relation.cacheBuilder
      }
      assert(firstBuilders.nonEmpty, "registered pass must be cached")
      // sibling 2 (the q189/q200 shape): the bounded kNN graph over the
      // same corpus, floor, and auto operating point
      val g = graft.ops.SimilarityOps.knnGraphAuto(emb, 0.2, kTop = 3,
        scope = scope)
      val secondBuilders = g.queryExecution.executedPlan.collect {
        case s: InMemoryTableScanExec => s.relation.cacheBuilder
      }
      assert(secondBuilders.nonEmpty,
        "second consumer's SRP/verify stage must be served from the " +
          "registered frame (no InMemoryTableScan in its plan = it " +
          "re-pays the full banding + verify pass)")
      assert(secondBuilders.exists(b => firstBuilders.exists(_ eq b)),
        "second consumer must read the SAME cache entry as the first " +
          "(equivalent-plan registration broke — plans diverged)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", old)
      scope.release()
    }
  }

  test("knnIndexEdges serve plan: tombstone filters broadcast, mutual join equi-keyed, no cartesian") {
    // the serve path runs per read — its cost class must stay: two
    // churn-sized BROADCAST anti-joins for the tombstones (a shuffled
    // anti-join would re-partition the n·k kept table per read) and the
    // (a,b)-keyed mutual self-join; nothing corpus-cartesian
    import graft.ops.SimilarityOps
    val emb = graft.sources.Tables(spark, SparkTestBase.sf001, "embeddings")
    val pfx = "plan_knn_serve"
    try {
      SimilarityOps.ensureKnnIndex(emb, pfx, corpusTag = "p#1",
        minCos = 0.2, kTop = 4)
      val p = SimilarityOps.knnIndexEdges(spark, pfx)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), "serve plans a cartesian")
      val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
      assert(anti.size >= 2, s"both endpoint tombstone filters expected:\n${anti.mkString("\n")}")
      assert(anti.forall(_.contains("Broadcast")),
        s"tombstone anti-joins must broadcast, never shuffle the kept table:\n${anti.mkString("\n")}")
    } finally spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(pfx)).foreach(t =>
        graft.sources.Bucketing.dropTableAndLocation(spark, t))
  }

  test("kNN graph tier: rank window keyed + WindowGroupLimit, mutual join equi-keyed, no cartesian") {
    // q189/q197's scale claim rests on three plan facts: the per-vertex
    // rank never global-sorts (partitioned by v, rank<=k pushes into
    // per-partition WindowGroupLimit heaps), the mutuality check is an
    // (a,b)-keyed equi-join, and nothing in the SRP candidate chain is a
    // cartesian — a regression in any of these changes the 100 TB cost
    // class even though small-SF results stay identical
    val df = graft.ops.SimilarityOps.knnGraph(
      graft.sources.Tables(spark, SparkTestBase.sf001, "embeddings"),
      0.2, kTop = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "kNN graph plans a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "kNN graph plans a nested loop")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must push into WindowGroupLimit per-partition heaps")
    // the registered pairs keep full lineage visible (no checkpoint
    // truncation), so the banding tier's hot-bucket-cap count windows
    // (partitioned by tbl/bucket) appear too — the claim is about the
    // RANK windows: every row_number ranks within one vertex's partition
    val winLines = p.linesIterator
      .filter(l => l.contains("Window [") && l.contains("row_number()"))
      .toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("v#")),
      s"rank window must partition by v:\n${winLines.mkString("\n")}")
    // threshold sweep: the grid joins as a broadcast (tiny) side and the
    // degree/rollup chain is pure hash aggregation
    val sw = SparkEntry.queries("q190_threshold_sweep")(
      spark, SparkTestBase.sf001).queryExecution.executedPlan.toString
    assert(!sw.contains("CartesianProduct"), "sweep plans a cartesian")
    assert(sw.contains("BroadcastExchange"),
      "the O(10)-row grid must broadcast, never shuffle the candidates")
  }
}
