package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a named operator from SURVEY.md §2 (or the
  * LLM-data-pipeline extension tier) expressed over the driver's testdata
  * tables; [[oracleSql]] carries the equivalent DuckDB SQL. Determinism
  * contract for the oracle compare: fixed-point sums go through exact
  * decimal arithmetic (RelationalOps.decSum), every other expression is a
  * per-row IEEE-double computation written identically on both sides, and
  * every result has a total ORDER BY.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Persisted-store corpus tag: dataset dir + DATA fingerprint, so a
    * dataset regenerated at the same path (or a stale warehouse from a
    * prior session) misses the tag and rebuilds instead of serving
    * outdated index state. Bench's index prebuilds derive the SAME tag so
    * the queries' ensure step stays a no-op during timing.
    */
  private[graft] def corpusTagOf(df: DataFrame, d: String): String =
    d + "#" + SimilarityOps.dataFingerprint(df)

  /** Catalog-safe table-name fragment derived from the dataset dir, so
    * same-session runs against DIFFERENT sf dirs keep disjoint persisted
    * state tables (a fixed global prefix would let two interleaved runs
    * ensure/maintain each other's snapshots).
    */
  private def dirTag(d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]+", "_")
      .replaceAll("^_+", "").replaceAll("_+$", "")
    if (tag.isEmpty) "root" else tag
  }

  /** The SERVED bounded near-dup graph at the (0.2 floor, kTop 4) point
    * every full-corpus graph consumer shares (q184/q189/q197): mutual
    * edges from ONE per-corpus persisted kNN index (X214 lifecycle,
    * split-hardened at the default skew line) instead of each query
    * re-paying the banding + verify + rank passes — the X84 economics:
    * a real pipeline maintains this index across ingests, so the
    * steady-state cost of a graph read IS the serve, not a rebuild. The
    * first caller per (session, corpus) pays the ensure; Bench prebuilds
    * it so bench rows price probes. Equality with the in-session
    * `knnGraphAuto` composition is the q200-family oracle claim (the
    * frozen layout here freezes on the SAME corpus it serves).
    */
  private[graft] def servedKnnEdges(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val prefix = s"graft_knn02_${dirTag(d)}"
    SimilarityOps.ensureKnnIndex(emb, prefix,
      corpusTag = corpusTagOf(emb, d), minCos = 0.2, kTop = 4)
    SimilarityOps.knnIndexEdges(s, prefix)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.pricingSummary(
      t(spark, "/root/testdata/sf0.001", "lineitem"), "1998-09-02")

  // exact decimal-sum SQL fragments (must mirror RelationalOps.decSum/decAvg/decStddev)
  private def sqlDecSum(c: String, scale: Int = 2): String =
    s"CAST(sum(CAST($c AS DECIMAL(27,$scale))) AS DOUBLE)"
  private def sqlDecAvg(c: String): String =
    s"${sqlDecSum(c)} / count($c)"
  // mirrors RelationalOps.decStddev: exact integer-cents arithmetic up to a
  // single divide + sqrt + rescale, so the double result is bit-identical
  // across engines (the double-identity form differed in the last ulp once
  // sums passed ~1e10)
  private def sqlDecStd(c: String): String = {
    val k = s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS DECIMAL(9,0))"
    val s1 = s"CAST(sum($k) AS DECIMAL(19,0))"
    val s2 = s"CAST(sum(CAST($k * $k AS DECIMAL(18,0))) AS DECIMAL(28,0))"
    val n = s"CAST(count($c) AS DECIMAL(10,0))"
    val num = s"CAST($n * $s2 - $s1 * $s1 AS DOUBLE)"
    val den = s"CAST(count($c) * (count($c) - 1) AS DOUBLE)"
    s"sqrt($num / $den) / 100.0"
  }

  private val stopSql = TextOps.enStopwords.map(w => s"'$w'").mkString("(", ",", ")")
  private val toksSql = raw"regexp_split_to_array(trim(text), '\s+')"

  /** Shared BM25 pipeline CTEs for q172/q173 — the EXACT association-order
    * twin of [[TextOps.bm25ContribMicro]] (ratio idf, k1 = 1.2, b = 0.75,
    * per-term contributions floored to micro BEFORE the order-free integer
    * sum), over BIGRAM terms (ngram = 2 — the synthetic corpus's unigram
    * vocabulary is ~31 words, nearly all stopword-band; bigrams give the
    * informative df spectrum, see [[TextOps.ngramTerms]]). Ends with
    * `sc(query_id, id, score_micro, n_terms_hit)` over the parity split
    * (corpus = doc_id % 29 <> 0, queries = the rest).
    */
  private lazy val bm25Ctes: String =
    s"""corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 29 <> 0),
       |qrs AS (SELECT doc_id, text FROM documents WHERE doc_id % 29 = 0),
       |ctok AS (SELECT doc_id, $toksSql AS tk FROM corpus),
       |post AS (SELECT doc_id AS id, tk[t.i] || '_' || tk[t.i + 1] AS term,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM ctok, UNNEST(range(1, len(tk))) AS t(i) GROUP BY 1, 2),
       |pl AS (SELECT id, term, tf,
       |    CAST(sum(tf) OVER (PARTITION BY id) AS BIGINT) AS dl FROM post),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN len(tk) >= 2 THEN len(tk) - 1 ELSE 0 END)
       |      AS BIGINT) AS total_len FROM ctok),
       |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
       |dfp AS (SELECT term, df FROM dfc, st
       |  WHERE 1000000 * df <= 500000 * st.n_docs),
       |contrib AS (SELECT qt.query_id, pl.id,
       |    CAST(floor((((CAST(st.n_docs AS DOUBLE) - CAST(dfp.df AS DOUBLE) + 0.5)
       |        / (CAST(dfp.df AS DOUBLE) + 0.5))
       |      * ((CAST(pl.tf AS DOUBLE) * 2.2)
       |        / (CAST(pl.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
       |          * (CAST(pl.dl AS DOUBLE)
       |            / (CAST(st.total_len AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))))
       |      * 1000000.0 + 0.5) AS BIGINT) AS c
       |  FROM (SELECT DISTINCT qtok.doc_id AS query_id,
       |        tk[t.i] || '_' || tk[t.i + 1] AS term
       |      FROM (SELECT doc_id, $toksSql AS tk FROM qrs) qtok,
       |        UNNEST(range(1, len(tk))) AS t(i)) qt
       |    JOIN dfp USING (term) JOIN pl USING (term), st),
       |sc AS (SELECT query_id, id, CAST(sum(c) AS BIGINT) AS score_micro,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit FROM contrib GROUP BY 1, 2)""".stripMargin

  /** Recursive-CTE replay of [[MultimodalOps.cdcChunks]]'s gear walk over
    * the documents' (ASCII ⇒ char = byte) text, same knobs as the q169
    * queries (minLen 32, maskBits 6, maxLen 256), the gear table embedded
    * as 256 literals. One state row per (doc, position); `cut` rows carry
    * the emitted chunk's (off, len); the final state emits the tail chunk.
    * Ends with `chunks(doc_id, chunk_idx, chunk_off, chunk_len)`.
    */
  private lazy val cdcWalkCtes: String = {
    val minLen = 32
    val mask = (1L << 6) - 1
    val maxLen = 256
    val m40 = MultimodalOps.GearStateMask
    s"""gear(b, g) AS (VALUES ${MultimodalOps.gearSqlValues}),
       |d AS (SELECT doc_id, text, length(text) AS n FROM documents
       |  WHERE length(text) > 0),
       |walk(doc_id, pos, h, cstart, cidx, cut, co, cl) AS (
       |  SELECT doc_id, 0, CAST(0 AS BIGINT), 0, 0, FALSE,
       |    CAST(NULL AS INT), CAST(NULL AS INT) FROM d
       |  UNION ALL
       |  SELECT doc_id, pos, CASE WHEN cut2 THEN CAST(0 AS BIGINT) ELSE h2 END,
       |    CASE WHEN cut2 THEN pos ELSE cstart END,
       |    CASE WHEN cut2 THEN cidx + 1 ELSE cidx END, cut2,
       |    CASE WHEN cut2 THEN cstart ELSE NULL END,
       |    CASE WHEN cut2 THEN pos - cstart ELSE NULL END
       |  FROM (
       |    SELECT doc_id, pos, h2, cstart, cidx,
       |      ((pos - cstart >= $minLen AND (h2 & $mask) = 0)
       |        OR pos - cstart = $maxLen) AS cut2
       |    FROM (
       |      SELECT w.doc_id, w.pos + 1 AS pos,
       |        ((w.h * 2 + g.g) & $m40) AS h2, w.cstart, w.cidx
       |      FROM walk w JOIN d ON d.doc_id = w.doc_id AND w.pos < d.n
       |      JOIN gear g ON g.b = ord(substr(d.text, w.pos + 1, 1))
       |    )
       |  )
       |),
       |chunks AS (
       |  SELECT doc_id, cidx - 1 AS chunk_idx, co AS chunk_off, cl AS chunk_len
       |  FROM walk WHERE cut
       |  UNION ALL
       |  SELECT w.doc_id, w.cidx, w.cstart, CAST(d.n - w.cstart AS INT)
       |  FROM walk w JOIN d USING (doc_id) WHERE w.pos = d.n AND w.cstart < d.n)""".stripMargin
  }

  // ---- dedup/similarity oracle fragments (mirror graft.ops.DetHash) ----

  /** CTE producing (id, sz, hs): distinct shingle-hash sets per doc —
    * mirrors DedupOps.shingleHashes bit-for-bit: each token md5-hashed once
    * (DetHash.md5Hash60 mod P), 3-shingle identity via the same Horner
    * combination in integer space.
    */
  private def hashedShinglesCteFrom(table: String) = {
    val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
    s"""toks AS (
       |  SELECT doc_id AS id,
       |    list_distinct(${ops.DetHash.sqlShingleHashes("th", 3)}) AS hs
       |  FROM (SELECT doc_id, list_transform($toksSql, t -> $tokHash) AS th FROM $table)),
       |sized AS (SELECT id, len(hs) AS sz, hs FROM toks WHERE len(hs) > 0)""".stripMargin
  }

  private val hashedShinglesCte = hashedShinglesCteFrom("documents")

  /** CTE `fp AS (id, simhash)` — mirrors DedupOps.simHash60: bit i counts
    * parities of the i-th SimHash permutation over the shingle-hash set,
    * majority sets the bit.
    */
  private val simHashCte = {
    val cnts = ops.DetHash.simHashPerms.zipWithIndex
      .map { case ((a, b), i) =>
        s"len(list_filter(hs, h -> ((${ops.DetHash.sqlPerm("h", a, b)}) & 1) = 1)) AS c$i"
      }
      .mkString(",\n    ")
    val fpBits = (0 until 60)
      .map(i => s"CASE WHEN 2 * c$i > n THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""$hashedShinglesCte,
       |bits AS (SELECT id, sz AS n,
       |    $cnts
       |  FROM sized),
       |fp AS (SELECT id, CAST($fpBits AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  /** DSIR score CTE chain ending in `dsel (doc_id, n_grams, score_micro)` —
    * shared by q99 (scores) and q102 (resampling): hashed unigram+bigram
    * buckets, add-1 smoothing against the lang='en' target, per-bucket ln
    * quantized to micro-nats BEFORE the per-doc integer sum (mirrors
    * TextOps.dsirWeights bit-for-bit).
    */
  /** The PQ lifecycle replayed as CTEs — shared by q103 (top-k) and q107
    * (recall audit): shared int8 grid, md5-ordered seeding, two unrolled
    * integer-lattice Lloyd rounds (strict-< argmin, floor(sum/n + 0.5)
    * centroids, empty cells frozen), encode, per-query LUTs, ADC rank —
    * all arithmetic exact integers. Ends with `pqtk` = the ranked ADC
    * result (query_id, vec_id, adc_dist, rank).
    */
  /** Per-subspace exact-integer distance of `q`-aliased rows (a 64-int
    * `qv` list) to a codebook row `cbAlias` (m, cell, c: 16-int list).
    */
  private def pqSubDistSql(cbAlias: String) =
    s"list_sum(list_transform(range(1, 17), d -> " +
      s"(q.qv[$cbAlias.m*16 + d] - $cbAlias.c[d]) * (q.qv[$cbAlias.m*16 + d] - $cbAlias.c[d])))"

  /** One unrolled integer-lattice Lloyd round over the (vec_id, qv) CTE
    * `src`: strict-< argmin (lowest cell wins ties), floor(sum/n + 0.5)
    * centroid update, empty cells frozen. Produces `${p}cb$i` from
    * `${p}cb${i-1}`.
    */
  private def pqLloydRoundSql(i: Int, src: String, p: String) = {
    val prev = s"${p}cb${i - 1}"
    s"""${p}a$i AS (SELECT q.vec_id, c.m, c.cell, ${pqSubDistSql("c")} AS dist
       |  FROM $src q CROSS JOIN $prev c),
       |${p}asg$i AS (SELECT vec_id, m, cell FROM (
       |    SELECT vec_id, m, cell, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY dist, cell) AS rn FROM ${p}a$i)
       |  WHERE rn = 1),
       |${p}upd$i AS (SELECT m, cell, d,
       |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*) + 0.5) AS INTEGER) AS cd
       |  FROM (SELECT a.m, a.cell, CAST(t.d AS INTEGER) AS d,
       |      q.qv[a.m*16 + t.d] AS x
       |    FROM ${p}asg$i a JOIN $src q USING (vec_id), UNNEST(range(1, 17)) t(d))
       |  GROUP BY 1, 2, 3),
       |${p}cb$i AS (SELECT c.m, c.cell, COALESCE(u.nc, c.c) AS c
       |  FROM $prev c LEFT JOIN (SELECT m, cell, list(cd ORDER BY d) AS nc
       |    FROM ${p}upd$i GROUP BY 1, 2) u ON u.m = c.m AND u.cell = c.cell)""".stripMargin
  }

  /** Base CTEs of every PQ oracle: corpus-wide int8 grid (mxq/scl/qv) and
    * the md5-ordered 8 seed rows (vec_id kept — the residual oracle joins
    * seeds back to the residual frame).
    */
  private val pqBaseCtes: String = {
    val h = ops.DetHash.sqlMd5Hash60("'pq|' || CAST(vec_id AS VARCHAR)")
    s"""mxq AS (SELECT max(list_max(list_transform(embedding,
       |    x -> abs(CAST(x AS DOUBLE))))) AS mx FROM embeddings),
       |scl AS (SELECT CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale FROM mxq),
       |qv AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS INTEGER)) AS qv
       |  FROM embeddings, scl),
       |seeds AS (SELECT vec_id, qv, row_number() OVER (ORDER BY h, vec_id) AS rk
       |  FROM (SELECT vec_id, qv, $h AS h FROM qv)
       |  ORDER BY h, vec_id LIMIT 8)""".stripMargin
  }

  private def pqOracleCtes(
      sampleSql: String = "q.vec_id % 100 = 7"): String = {
    s"""$pqBaseCtes,
       |cb0 AS (SELECT t.m, CAST(rk - 1 AS INTEGER) AS cell,
       |    qv[t.m*16 + 1 : t.m*16 + 16] AS c
       |  FROM seeds, UNNEST(range(0, 4)) t(m)),
       |${pqLloydRoundSql(1, "qv", "")},
       |${pqLloydRoundSql(2, "qv", "")},
       |enc AS (SELECT vec_id, m, cell FROM (
       |    SELECT q.vec_id, c.m, c.cell, row_number() OVER (
       |      PARTITION BY q.vec_id, c.m ORDER BY ${pqSubDistSql("c")}, c.cell) AS rn
       |    FROM qv q CROSS JOIN cb2 c) WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, c.m, c.cell,
       |    CAST(${pqSubDistSql("c")} AS BIGINT) AS ld
       |  FROM qv q CROSS JOIN cb2 c WHERE $sampleSql),
       |adc AS (SELECT l.query_id, e.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc_dist
       |  FROM enc e JOIN lut l ON l.m = e.m AND l.cell = e.cell
       |  GROUP BY 1, 2),
       |pqtk AS (SELECT query_id, vec_id, adc_dist, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
       |  FROM adc)""".stripMargin
  }

  /** Lattice COARSE quantizer chain shared by the q109/q111 oracles:
    * training (2 Lloyd rounds over the full 64-int vector, same md5 seed
    * order), corpus assignment `cassign`, and each query's 2-of-8 probe
    * selection `cprobe` — all exact integers.
    */
  private def coarseOracleCtes(
      sampleSql: String = "q.vec_id % 100 = 7"): String = {
    def cdist(cbAlias: String) =
      s"list_sum(list_transform(range(1, 65), d -> " +
        s"(q.qv[d] - $cbAlias.c[d]) * (q.qv[d] - $cbAlias.c[d])))"
    def clloyd(i: Int) = {
      val prev = s"ccb${i - 1}"
      s"""ca$i AS (SELECT q.vec_id, c.cell, ${cdist("c")} AS dist
         |  FROM qv q CROSS JOIN $prev c),
         |casg$i AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM ca$i)
         |  WHERE rn = 1),
         |cupd$i AS (SELECT cell, d,
         |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*) + 0.5) AS INTEGER) AS cd
         |  FROM (SELECT a.cell, CAST(t.d AS INTEGER) AS d, q.qv[t.d] AS x
         |    FROM casg$i a JOIN qv q USING (vec_id), UNNEST(range(1, 65)) t(d))
         |  GROUP BY 1, 2),
         |ccb$i AS (SELECT c.cell, COALESCE(u.nc, c.c) AS c
         |  FROM $prev c LEFT JOIN (SELECT cell, list(cd ORDER BY d) AS nc
         |    FROM cupd$i GROUP BY 1) u ON u.cell = c.cell)""".stripMargin
    }
    s"""ccb0 AS (SELECT CAST(rk - 1 AS INTEGER) AS cell, qv AS c FROM seeds),
       |${clloyd(1)},
       |${clloyd(2)},
       |cassign AS (SELECT vec_id, cell FROM (
       |    SELECT q.vec_id, c.cell, row_number() OVER (
       |      PARTITION BY q.vec_id ORDER BY ${cdist("c")}, c.cell) AS rn
       |    FROM qv q CROSS JOIN ccb2 c) WHERE rn = 1),
       |cprobe AS (SELECT vec_id AS query_id, cell FROM (
       |    SELECT q.vec_id, c.cell, row_number() OVER (
       |      PARTITION BY q.vec_id ORDER BY ${cdist("c")}, c.cell) AS rn
       |    FROM qv q CROSS JOIN ccb2 c WHERE $sampleSql)
       |  WHERE rn <= 2)""".stripMargin
  }

  private val dsirSqlCtes: String = {
    val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
    val bi = ops.DetHash.sqlShingleHashes("th", 2)
    s"""dtok AS (SELECT doc_id, lang,
       |    list_transform($toksSql, t -> $tokHash) AS th FROM documents),
       |gb AS (SELECT doc_id, lang, list_concat(
       |    list_transform(th, h -> CAST(h % 1024 AS INTEGER)),
       |    list_transform($bi, h -> CAST(h % 1024 AS INTEGER))) AS gs
       |  FROM dtok),
       |rcnt AS (SELECT g AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM gb, UNNEST(gs) AS t(g) GROUP BY 1),
       |tcnt AS (SELECT g AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM gb, UNNEST(gs) AS t(g) WHERE lang = 'en' GROUP BY 1),
       |dtot AS (SELECT
       |    (SELECT COALESCE(sum(c), 0) FROM rcnt) AS rtot,
       |    (SELECT COALESCE(sum(c), 0) FROM tcnt) AS ttot),
       |lr AS (SELECT CAST(sp.b AS INTEGER) AS b,
       |    CAST(floor(ln(
       |      (CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE) * CAST(rtot + 1024 AS DOUBLE))
       |      / (CAST(COALESCE(rc.c, 0) + 1 AS DOUBLE) * CAST(ttot + 1024 AS DOUBLE))
       |    ) * 1000000 + 0.5) AS BIGINT) AS lr
       |  FROM range(0, 1024) sp(b)
       |  LEFT JOIN rcnt rc ON rc.b = sp.b
       |  LEFT JOIN tcnt tc ON tc.b = sp.b, dtot),
       |dsc AS (SELECT doc_id, CAST(sum(lr.lr) AS BIGINT) AS s
       |  FROM gb, UNNEST(gs) AS t(g), lr WHERE lr.b = g GROUP BY doc_id),
       |dsel AS (SELECT gb.doc_id, CAST(len(gs) AS INTEGER) AS n_grams,
       |    CAST(COALESCE(dsc.s, 0) AS BIGINT) AS score_micro
       |  FROM gb LEFT JOIN dsc ON dsc.doc_id = gb.doc_id)""".stripMargin
  }

  /** Exact-cosine SQL over two embedding aliases (same expression pattern as
    * the Spark side's unrolled left-to-right double accumulation).
    */
  /** Shared unigram-LM training replay (q163/q164): substring-seed counts,
    * then `rounds` hard-EM rounds. The E-step is replayed by ENUMERATING
    * every segmentation of every distinct word over the SEED pieces (a
    * recursive CTE — bounded because both engines exclude words longer
    * than 16 chars from training) and taking the engine's exact argmax
    * (score desc, fewer pieces, lexicographically smallest piece list);
    * later rounds' shrunken vocabularies fall out of the inner model join
    * + HAVING (a segmentation touching a pruned piece loses rows and is
    * discarded). Quantization is the q100 convention — each count's ln
    * quantized once to micro-nats, every score a plain integer sum.
    * Emits CTEs `words`..`m$rounds`; the final model is `m$rounds`
    * (piece, cnt, llq). Callers must open with WITH RECURSIVE.
    */
  private def unigramLmCtes(seedSize: Int, maxPieceLen: Int, rounds: Int,
                            wordFilter: String = "TRUE"): String = {
    val roundCtes = (1 to rounds).map { k =>
      s"""sc$k AS (SELECT px.w, px.pieces, px.nseg, sum(m.llq) AS score
         |  FROM px JOIN m${k - 1} m ON m.piece = px.piece
         |  GROUP BY px.w, px.pieces, px.nseg HAVING count(*) = px.nseg),
         |b$k AS (SELECT w, pieces FROM (SELECT w, pieces, row_number() OVER (
         |    PARTITION BY w ORDER BY score DESC, nseg ASC, pieces ASC) AS rn
         |  FROM sc$k) WHERE rn = 1),
         |c$k AS (SELECT t.piece, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM b$k JOIN words USING (w), UNNEST(b$k.pieces) AS t(piece)
         |  GROUP BY 1),
         |m$k AS (SELECT piece, cnt, CAST(floor(ln(CAST(cnt AS DOUBLE)
         |    / (SELECT CAST(sum(cnt) AS DOUBLE) FROM c$k)) * 1000000 + 0.5)
         |    AS BIGINT) AS llq FROM c$k)""".stripMargin
    }.mkString(",\n")
    s"""words0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE len(w) > 0 AND len(w) <= 16 GROUP BY w),
       |words AS MATERIALIZED (SELECT w, freq FROM words0 WHERE $wordFilter),
       |sub AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq, substr(w, CAST(i.i AS INTEGER), CAST(l.l AS INTEGER)) AS piece
       |    FROM words,
       |      UNNEST(range(1, len(w) + 1)) AS i(i),
       |      UNNEST(range(1, least($maxPieceLen, len(w) - i.i + 1) + 1)) AS l(l)
       |  ) GROUP BY 1),
       |seed AS (
       |  SELECT piece, cnt FROM sub WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM sub
       |    WHERE len(piece) >= 2 ORDER BY cnt DESC, piece ASC LIMIT $seedSize)),
       |m0 AS (SELECT piece, cnt, CAST(floor(ln(CAST(cnt AS DOUBLE)
       |    / (SELECT CAST(sum(cnt) AS DOUBLE) FROM seed)) * 1000000 + 0.5)
       |    AS BIGINT) AS llq FROM seed),
       |r(w, pos, pieces) AS (
       |  SELECT w, CAST(0 AS BIGINT), CAST([] AS VARCHAR[]) FROM words
       |  UNION ALL
       |  SELECT r.w, r.pos + len(s.piece), list_append(r.pieces, s.piece)
       |  FROM r JOIN seed s ON s.piece = substr(r.w,
       |    CAST(r.pos + 1 AS INTEGER), CAST(len(s.piece) AS INTEGER))),
       |paths AS (SELECT w, pieces, CAST(len(pieces) AS BIGINT) AS nseg
       |  FROM r WHERE pos = len(w)),
       |px AS (SELECT w, pieces, nseg, t.piece
       |  FROM paths, UNNEST(pieces) AS t(piece)),
       |$roundCtes""".stripMargin
  }

  private def sqlCos(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a.embedding, $b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |    * sqrt(list_sum(list_transform($b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** Multimodal FIXTURES (hex) — hand-built UNCOMPRESSED payloads whose
    * every byte is structurally addressable, so the SQL oracle parses
    * pixels/samples straight out of the hex string while the engine
    * decodes the same bytes through the real JDK readers. BMP: 24-bit,
    * bottom-up, BGR, pixel array at offset 54, 4-byte row stride; WAV:
    * canonical 44-byte header, PCM16LE. Dimensions/stride are fixture
    * facts the oracles embed as literals.
    */
  private[graft] val bmpFixtures: Seq[(Long, String, Int, Int, Int)] = Seq(
    // (img_id, hex, width, height, rowStride)
    (1L, "424d860000000000000036000000280000000600000004000000010018000000000050000000130b0000130b00000000000000000000099f156aaa3dcbb5652cc08d8dcbb5eed6dd0000066a0e677536c8805e298b868a96aeeba1d6000003350764402fc54b5726567f8761a7e86ccf0000000000610b28c21650232178842ca0e537c80000", 6, 4, 20),
    (2L, "424d660000000000000036000000280000000500000003000000010018000000000030000000130b0000130b000000000000000000000626920b739f10c0ac150db91a5ac6008313c98860d68dade392faf09747fd00000000054d0d0a9a1a0fe72714343400", 5, 3, 16))

  /** RIFF/AVI container hex around BMP frame payloads — built
    * programmatically so the layout is honest RIFF grammar (fourcc +
    * u32-LE size + even-padded data; LIST carries a list type), while the
    * ORACLE never sees these offsets: it re-derives every chunk boundary
    * with its own recursive walk over the hex (q203).
    */
  private def aviHex(framesHex: Seq[String], microsPerFrame: Long,
                     declaredFrames: Long): String = {
    def u32(v: Long): String =
      f"${v & 0xff}%02x${(v >> 8) & 0xff}%02x" +
        f"${(v >> 16) & 0xff}%02x${(v >> 24) & 0xff}%02x"
    def fcc(s: String): String =
      s.getBytes("US-ASCII").map("%02x".format(_)).mkString
    // 56-byte avih: µs-per-frame at +0, total frames at +16 (the two the
    // walker reads), zeros elsewhere
    val avihPayload = u32(microsPerFrame) + u32(0) * 3 +
      u32(declaredFrames) + u32(0) * 9
    val avih = fcc("avih") + u32(avihPayload.length / 2) + avihPayload
    val hdrlBody = fcc("hdrl") + avih
    val hdrl = fcc("LIST") + u32(hdrlBody.length / 2) + hdrlBody
    val frameChunks = framesHex.map { f =>
      val sz = f.length / 2
      fcc("00db") + u32(sz) + f + (if (sz % 2 == 1) "00" else "")
    }.mkString
    val moviBody = fcc("movi") + frameChunks
    val movi = fcc("LIST") + u32(moviBody.length / 2) + moviBody
    val riffBody = fcc("AVI ") + hdrl + movi
    fcc("RIFF") + u32(riffBody.length / 2) + riffBody
  }

  /** (vid_id, hex): vid 1 = both BMP fixtures as frames; vid 2 = one
    * frame but avih DECLARES 5 — the truncation fact (n_frames <
    * declared_frames) under the gate.
    */
  private[graft] val aviFixtures: Seq[(Long, String)] = Seq(
    (1L, aviHex(bmpFixtures.map(_._2), microsPerFrame = 40000L,
      declaredFrames = 2L)),
    (2L, aviHex(Seq(bmpFixtures(1)._2), microsPerFrame = 33367L,
      declaredFrames = 5L)))

  /** Baseline JPEG fixtures — `javax.imageio` encoder output over
    * deterministic pixel ramps, embedded as hex: (width, height, hex).
    * The ORACLE never reads these width/height fields: it parses each
    * frame's dimensions from the JPEG's OWN SOF marker segment (the
    * q194 hex-replay convention).
    */
  private[graft] val jpegFixtures: Seq[(Int, Int, String)] = Seq(
    (8, 6, "ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080006000803012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00aba758e936ba3cadfd8713623db81744641e3fe79ffb5fa514515a623135b0b392a326b57e7b5adbdce2cc30f097b28bbd9457da7d5bf3f23fffd9"),
    (5, 7, "ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080007000503012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f009b44f0dd9c76237787a3238518bb1dbaff0007bd14515e062b3dc4d1aae104ada77eaafdce9c14ef8783f2ef2ff33fffd9"),
    (6, 4, "ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080004000603012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00dfd03c11a10b2f96d4ae028c838ed9a28a2be4b35c5e22388b466d69dd979657abf5587bcfef67ffd9"))

  /** MJPEG-in-AVI fixtures (vid_id, hex): vid 3 = two JPEG frames of
    * different dimensions; vid 4 = one JPEG frame with avih DECLARING 3
    * (the truncation fact under the gate); vid 5 = a MIXED-codec movi
    * (JPEG, BMP, JPEG) — frame ordering and per-frame dimensions must
    * hold across codecs in one stream.
    */
  private[graft] val mjpegAviFixtures: Seq[(Long, String)] = Seq(
    (3L, aviHex(Seq(jpegFixtures(0)._3, jpegFixtures(1)._3),
      microsPerFrame = 40000L, declaredFrames = 2L)),
    (4L, aviHex(Seq(jpegFixtures(2)._3), microsPerFrame = 33367L,
      declaredFrames = 3L)),
    (5L, aviHex(Seq(jpegFixtures(1)._3, bmpFixtures(0)._2,
      jpegFixtures(2)._3), microsPerFrame = 20000L, declaredFrames = 3L)))

  private[graft] val wavFixtures: Seq[(Long, String, Int, Int, Int)] = Seq(
    // (clip_id, hex, sampleRateHz, channels, nFrames)
    (1L, "52494646a400000057415645666d74201000000001000100401f0000803e0000020010006461746180000000d08a2cb688e1e40c40389c6398a4f4cf50fbac260852049360bebce918157440d06bccac28d88403e02e3c5a389b94c6f0f14c1da848047400b55ce0b80b143770626ca3c8ce24fa8025dc50d89134bd90e8ec13483fa46aa0abfcd65802b42d10590c9a68c5c4f0201c7c47d872d4b330df8c0ae835446140a29ccdf8f85424", 8000, 1, 64),
    (2L, "52494646e400000057415645666d74201000000001000200803e000000fa00000400100064617461c00000001ca800b5dedb50e2a00fa00f6243f03c62c6b0d224fa0000e62d502de6b010c3a8e460f06a18b01d2c4c004b2ccfc0e0ee02100eb036603bb0b920d172ed70fe3421c02bf65480c1f6d7d0eeb80b201c7a3f70497ac230df3cf6800cfe29d039feac90cfc0e0e0fc8214302a4448f0bf44cb40ed06ff901ac832e047c8b5a0dd8ae9f00a4c1d40380e5100ce0ed450fbd007a028923b60be92beb0eb54f200191626504616a910dcd8dc60099a10b0365c4470cc5cc7c0f91efb1027e02ed0bc", 16000, 2, 48))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.1-2.7) ----
    "q01_pricing_summary" -> ((s, d) =>
      RelationalOps.pricingSummary(t(s, d, "lineitem"), "1998-09-02")),

    "q02_join_revenue_by_priority" -> { (s, d) =>
      val li = t(s, d, "lineitem").select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val o = t(s, d, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"))
      RelationalOps.scoreJoin(o, li, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(RelationalOps.decSum(col("rev"), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },

    "q03_top_orders" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q04_distinct_counts" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        countDistinct(col("l_returnflag")).as("n_returnflag"),
        countDistinct(col("l_linestatus")).as("n_linestatus"),
        countDistinct(col("l_partkey")).as("n_partkey"),
        countDistinct(col("l_suppkey")).as("n_suppkey"))),

    "q05_crosstab" -> ((s, d) =>
      RelationalOps.crosstab(t(s, d, "lineitem"), "l_returnflag", "l_linestatus",
        Seq("F", "O"))),

    "q06_describe" -> ((s, d) =>
      RelationalOps.describeAggs(t(s, d, "lineitem"),
        Seq("l_discount", "l_extendedprice", "l_quantity"))),

    // ingest-time data-quality profile: row/null/distinct counts + min/max
    // per column, mixed types unpivoted into one long frame
    "q66_profile" -> ((s, d) =>
      RelationalOps.profile(t(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_linestatus"))),

    "q07_replace_priority" -> ((s, d) =>
      RelationalOps.naReplace(t(s, d, "orders"), "o_orderpriority",
          Map("1-URGENT" -> "URGENT", "2-HIGH" -> "HIGH"))
        .groupBy(col("o_orderpriority")).count()
        .orderBy(col("o_orderpriority"))),

    "q08_isin_nation" -> { (s, d) =>
      val nk = t(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_7", "NATION_23"))
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      t(s, d, "customer").join(broadcast(nk), Seq("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          RelationalOps.decAvg(col("c_acctbal")).as("avg_acctbal"))
        .orderBy(col("n_name"))
    },

    "q09_threshold_events" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("pred", RelationalOps.threshold(col("value"), 100.0))
        .groupBy(col("event_type"), col("pred")).count()
        .orderBy(col("event_type"), col("pred"))),

    "q10_bitwise_vote" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("vote", RelationalOps.bitwiseVote(Seq(
          col("value") > 100.0,
          col("event_type") === "error",
          col("user_id") % 2 === 0)))
        .groupBy(col("vote")).count()
        .orderBy(col("vote"))),

    "q11_charge_per_row" -> ((s, d) =>
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("charge"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q12_union_branches" -> { (s, d) =>
      val o = t(s, d, "orders")
      val branches = Seq("F", "O", "P").map { st =>
        o.filter(col("o_orderstatus") === st)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            RelationalOps.decSum(col("o_totalprice")).as("total"))
      }
      RelationalOps.unionAccumulate(branches).orderBy(col("o_orderstatus"))
    },

    "q13_zscore_customers" -> ((s, d) =>
      RelationalOps.zscore(
          t(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
          Seq("c_acctbal"))
        .select(col("c_custkey"), col("c_acctbal"), col("c_acctbal_z"))
        .orderBy(col("c_custkey"))),

    "q14_ar_numeric" -> ((s, d) =>
      RelationalOps.attributeRatioNumeric(t(s, d, "lineitem"), "l_returnflag",
        Seq("l_quantity", "l_extendedprice"))),

    "q15_ar_binary" -> { (s, d) =>
      val withBin = t(s, d, "lineitem").select(col("l_returnflag"),
        when(col("l_discount") > 0.05, 1.0).otherwise(0.0).as("high_discount"),
        when(col("l_quantity") >= 25, 1.0).otherwise(0.0).as("bulk"))
      RelationalOps.attributeRatioBinary(withBin, "l_returnflag",
        Seq("high_discount", "bulk"))
    },

    "q16_topk_per_segment" -> { (s, d) =>
      val oc = t(s, d, "orders").join(
        t(s, d, "customer").select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        Seq("o_custkey"))
      RelationalOps.topKPerGroup(
          oc.select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice")),
          Seq("c_mktsegment"), Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy(col("c_mktsegment"), col("rn"))
    },

    // ---- LLM-data-pipeline tier: text ----
    "q17_text_stats" -> ((s, d) =>
      TextOps.textStats(t(s, d, "documents")).orderBy(col("doc_id"))),

    "q18_dedup_exact" -> ((s, d) =>
      DedupOps.exactDedupSummary(t(s, d, "documents")).orderBy(col("keep_id"))),

    "q19_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "q20_quality_score" -> ((s, d) =>
      TextOps.withQualityScore(t(s, d, "documents"))
        .select(col("doc_id"), col("quality"))
        .orderBy(col("doc_id"))),

    "q32_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
          size(TextOps.tokens(col("text"))).as("n_ws_tokens"),
          TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),

    "q21_jaccard_pairs" -> ((s, d) =>
      DedupOps.jaccardPairs(t(s, d, "documents"), minJaccard = 0.02)
        .orderBy(col("a"), col("b"))),

    "q22_minhash_neardup" -> ((s, d) =>
      // inter widened to match the oracle's BIGINT physical type exactly
      // (int32 vs int64 parquet happens to survive the driver's compare,
      // but type-identical is the contract check_oracle.py now enforces)
      DedupOps.minHashVerifiedPairs(t(s, d, "documents"), minJaccard = 0.8)
        .withColumn("inter", col("inter").cast("long"))
        .orderBy(col("a"), col("b"))),

    // prefix-filtered exact Jaccard — same exact pair set as q22 (the
    // prefix lemma guarantees recall), reached without MinHash banding
    "q36_jaccard_prefix" -> ((s, d) =>
      DedupOps.jaccardPairsPrefix(t(s, d, "documents"), minJaccard = 0.8)
        .orderBy(col("a"), col("b"))),

    // HOT-BUCKET split for the MinHash banded tier (the q202 remediation
    // applied to the (band_idx, band_sig) key space): over-occupied band
    // buckets re-key by a PER-BAND extension minhash (permutation
    // k + band_idx of the same sequential md5-seeded family), identical
    // docs unsplittable by construction, post-split maxBucket rescue.
    // splitOccupancy = 2 so verify-scale duplicate clusters genuinely
    // split. The oracle replays the banding itself (not the brute-force
    // q22 set — the split deliberately changes recall, so the exact
    // surviving pair set IS the claim)
    "q207_minhash_split_pairs" -> ((s, d) =>
      DedupOps.minHashVerifiedPairsSplit(t(s, d, "documents"),
          minJaccard = 0.8, splitOccupancy = 2)
        .orderBy(col("a"), col("b"))),

    "q23_simhash" -> ((s, d) =>
      DedupOps.simHash60(DedupOps.shingleHashRows(t(s, d, "documents")))
        .select(col("id").as("doc_id"), col("simhash"))
        .orderBy(col("doc_id"))),

    // near-dup pairs → transitive clusters (connected components): the step
    // that makes dedup keep ONE doc per group even across A~B~C chains
    "q37_neardup_clusters" -> ((s, d) =>
      DedupOps.nearDupClusters(t(s, d, "documents"), minJaccard = 0.8)
        .orderBy(col("doc_id"))),

    // the retention report: representative (min id) + member count per cluster
    "q38_neardedup_summary" -> ((s, d) =>
      DedupOps.nearDedupSummary(t(s, d, "documents"), minJaccard = 0.8)
        .orderBy(col("keep_id"))),

    // quality-aware retention: each near-dup cluster keeps its CLEANEST
    // member (highest quality score, id tiebreak), not its min id
    "q93_keep_best_dedup" -> ((s, d) =>
      DedupOps.keepBestDedupSummary(t(s, d, "documents"), minJaccard = 0.8)
        .orderBy(col("keep_id"))),

    // ---- LLM-data-pipeline tier: embeddings ----
    "q24_ann_cosine_topk" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
        .orderBy(col("query_id"), col("rank"))
    },

    // full-table exact pairs go through the distributed block-nested-loop
    // (no driver collect); cosinePairsExact stays the in-bucket verifier
    "q25_neardup_cosine" -> ((s, d) =>
      SimilarityOps.cosinePairsBlocked(t(s, d, "embeddings"), 0.4)
        .orderBy(col("a"), col("b"))),

    "q26_lsh_ann_topk" -> ((s, d) =>
      SimilarityOps.lshTopK(t(s, d, "embeddings"), k = 5)
        .orderBy(col("query_id"), col("rank"))),

    // the bucketed near-dup scale path: SRP candidates + exact in-bucket
    // verify (precision exact, recall = the SRP collision curve — both
    // sides of the oracle compute identical md5-derived buckets)
    "q35_srp_neardup" -> ((s, d) =>
      SimilarityOps.srpNearDupPairs(t(s, d, "embeddings"), 0.45)
        .orderBy(col("a"), col("b"))),

    // SEMANTIC dedup (SemDeDup-style): near-dup edges over embeddings →
    // transitive clusters → retention summary — the embedding-space analog
    // of q37/q38 (keep one representative per meaning, not per surface
    // form). Re-pointed at the SCALE-SAFE graph tier: candidates at the
    // corpus-sized SRP operating point (occupancy ~flat at any n), edges
    // bounded by mutual-kNN selection (degree ≤ 4 by construction), so the
    // closure this dedup takes cannot fuse into one giant component as the
    // corpus grows — the measured fixed-ε/fixed-plane failure mode
    "q64_semantic_dedup" -> ((s, d) =>
      SimilarityOps.semanticDedupSummaryBounded(t(s, d, "embeddings"), 0.4)
        .orderBy(col("keep_id"))),

    "q30_simhash_neardup" -> ((s, d) =>
      DedupOps.simHashNearDupPairs(
          DedupOps.simHash60(DedupOps.shingleHashRows(t(s, d, "documents"))))
        .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
        .orderBy(col("a"), col("b"))),

    "q31_multimodal_meta" -> { (s, d) =>
      val payload = MultimodalOps.demoPayload(col("doc_id"), col("text"))
      MultimodalOps.payloadMeta(
          t(s, d, "documents").select(col("doc_id"), payload.as("payload")),
          "payload")
        .select(col("doc_id"), col("n_bytes"), col("format"), col("n_chunks"))
        .orderBy(col("doc_id"))
    },

    "q33_approx_distinct" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val exactP = countDistinct(col("l_partkey"))
      val exactS = countDistinct(col("l_suppkey"))
      li.agg(
        exactP.as("exact_partkey"),
        exactS.as("exact_suppkey"),
        when(abs(approx_count_distinct(col("l_partkey"), 0.05) - exactP)
          <= exactP * lit(0.05), lit("ok")).otherwise(lit("off")).as("partkey_hll_within_5pct"),
        when(abs(approx_count_distinct(col("l_suppkey"), 0.05) - exactS)
          <= exactS * lit(0.05), lit("ok")).otherwise(lit("off")).as("suppkey_hll_within_5pct"))
    },

    // tf-idf-style salient terms (ratio idf — IEEE-exact, see TextOps doc)
    "q40_top_terms" -> ((s, d) =>
      TextOps.topTerms(t(s, d, "documents"), k = 5)
        .orderBy(col("doc_id"), col("rank"))),

    // benchmark decontamination: even-id docs as the training corpus,
    // odd-id docs standing in for the eval set
    "q41_contamination" -> { (s, d) =>
      val docs = t(s, d, "documents")
      DedupOps.contaminationReport(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1))
        .orderBy(col("doc_id"))
    },

    // incremental ingestion dedup: every 5th doc plays the NEW BATCH, the
    // rest the existing corpus — batch bands join CORPUS bands (never
    // corpus×corpus); novel batch docs are the ones safe to ingest
    "q65_incremental_dedup" -> { (s, d) =>
      val docs = t(s, d, "documents")
      DedupOps.incrementalDedupReport(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0))
        .orderBy(col("doc_id"))
    },

    // the PERSISTED-index face of q65: the corpus's band signatures and
    // shingle sets are written ONCE as bucketed tables (index-once /
    // probe-many), then the batch probes them with zero corpus-side
    // exchange — same report, same oracle semantics as q65. The build is
    // ensure-style (tagged with the source dir): reruns in the same
    // warehouse measure the probe, a different corpus forces a rebuild
    "q89_persisted_index_dedup" -> { (s, d) =>
      val docs = t(s, d, "documents")
      DedupOps.ensureBandedIndex(docs.filter(col("doc_id") % 5 =!= 0),
        "graft_q89_corpus", corpusTag = corpusTagOf(docs, d))
      DedupOps.probeBandedIndex(docs.filter(col("doc_id") % 5 === 0),
          "graft_q89_corpus")
        .orderBy(col("doc_id"))
    },

    // the SPLIT-LAYOUT persisted banded index (q89 with the q207
    // hot-bucket remediation FROZEN into the store, format v4): the build
    // freezes the over-occupied band cells in a `_split` table and writes
    // `_bands` with the per-band extension-minhash sub key; the probe
    // re-keys the batch at the SAME frozen cells and joins on all three
    // keys, corpus side exchange-free on its bucketing. splitOccupancy 2
    // so verify-scale duplicate clusters genuinely split. The oracle
    // replays the whole layout (frozen cells from the BASE corpus's
    // counts, batch re-keyed by them) — the split changes recall by
    // design, so the exact surviving match counts are the claim
    "q208_persisted_split_probe" -> { (s, d) =>
      val docs = t(s, d, "documents")
      DedupOps.ensureBandedIndexSplit(docs.filter(col("doc_id") % 5 =!= 0),
        "graft_q208_split", corpusTag = corpusTagOf(docs, d),
        splitOccupancy = 2)
      DedupOps.probeBandedIndexSplit(docs.filter(col("doc_id") % 5 === 0),
          "graft_q208_split")
        .orderBy(col("doc_id"))
    },

    // LAYOUT-DRIFT audit of the split banded index (the frozen-layout
    // price made observable): ensure freezes the layout on the BASE
    // corpus, the batch then appends AT that frozen layout, and the audit
    // reports — per band — the cells the appends pushed over
    // splitOccupancy that the frozen layout does not split (outgrown),
    // plus the frozen sub-cells no extension minhash can subdivide
    // (saturated = identical-doc clusters). The oracle replays the whole
    // lifecycle: base banding, frozen cells, append at those cells with
    // the per-sub-cell write cap, then the same per-band rollup. The
    // meta-tag guard makes the query a pure read on replay (Bench
    // prebuilds the appended state; a fresh session rebuilds base →
    // append deterministically)
    "q209_split_layout_drift" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val fullTag = corpusTagOf(docs, d) + "#q209appended"
      val appended = try {
        val m = graft.sources.Bucketing
          .freshTable(s, "graft_q209_drift_meta").head()
        m.getAs[Int]("fmt") == DedupOps.bandedSplitIndexFormatVersion &&
          m.getAs[String]("corpus_tag") == fullTag
      } catch { case _: Exception => false }
      if (!appended) {
        DedupOps.ensureBandedIndexSplit(docs.filter(col("doc_id") % 5 =!= 0),
          "graft_q209_drift", corpusTag = corpusTagOf(docs, d),
          splitOccupancy = 2)
        DedupOps.appendToBandedIndexSplit(docs.filter(col("doc_id") % 5 === 0),
          "graft_q209_drift", newCorpusTag = fullTag)
      }
      DedupOps.bandedSplitLayoutDrift(s, "graft_q209_drift")
        .orderBy(col("band_idx"))
    },

    // INCREMENTAL RE-FREEZE of the split banded index (the q209 drift's
    // remedy as an operator): ensure freezes the layout on the BASE
    // corpus, the batch appends AT that frozen layout (pushing cells
    // over splitOccupancy — the q209 drift), and refreeze then splits
    // EXACTLY the flagged cells in place — their members re-key by the
    // per-band extension minhash as NEW rows while the stale sub = 0
    // rows hide under the layout-version rule; cold cells' part-files
    // are never touched (BucketingSpec asserts it). The audit after the
    // refreeze must report sum(n_outgrown) = 0 WITHOUT a corpus-sized
    // rebuild; the oracle replays the whole lifecycle — base banding,
    // frozen cells, capped append, outgrown detection, the re-key, and
    // the final per-band rollup — from the raw text
    "q210_split_refreeze" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val fullTag = corpusTagOf(docs, d) + "#q210refrozen"
      // the append restamps the tag BEFORE the refreeze runs, so the tag
      // alone can't witness the refreeze: a crash between the two would
      // replay as done. The drift audit is the refreeze's own postcondition
      // — zero outgrown — so the guard checks it directly (audit-sized)
      val done = try {
        val m = graft.sources.Bucketing
          .freshTable(s, "graft_q210_refreeze_meta").head()
        m.getAs[Int]("fmt") == DedupOps.bandedSplitIndexFormatVersion &&
          m.getAs[String]("corpus_tag") == fullTag &&
          DedupOps.bandedSplitLayoutDrift(s, "graft_q210_refreeze")
            .agg(sum(col("n_outgrown"))).head().getLong(0) == 0L
      } catch { case _: Exception => false }
      if (!done) {
        DedupOps.ensureBandedIndexSplit(docs.filter(col("doc_id") % 5 =!= 0),
          "graft_q210_refreeze", corpusTag = corpusTagOf(docs, d),
          splitOccupancy = 2)
        DedupOps.appendToBandedIndexSplit(docs.filter(col("doc_id") % 5 === 0),
          "graft_q210_refreeze", newCorpusTag = fullTag)
        DedupOps.refreezeBandedIndexSplit(s, "graft_q210_refreeze")
      }
      DedupOps.bandedSplitLayoutDrift(s, "graft_q210_refreeze")
        .orderBy(col("band_idx"))
    },

    // the PERSISTED-index face of q24: queries probe the IVF cells table
    // with zero corpus-side exchange. Probing ALL cells (nProbe = nCells)
    // makes the output the EXACT top-k regardless of what partition the
    // quantizer learned — which is what lets a SQL oracle verify an
    // ANN index end-to-end (partial-probe recall is covered in ScalaTest,
    // where both sides run the same quantizer)
    "q90_persisted_ivf_topk" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfIndex(emb, "graft_q90_ivf",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8)
      SimilarityOps.ivfTopKPersisted(emb.filter(col("vec_id") < 5),
          "graft_q90_ivf", k = 10, nProbe = 8)
        .orderBy(col("query_id"), col("rank"))
    },

    // WHERE does the eval set leak: merged token spans of exact 8-gram
    // collisions against the training half — the surgical complement of
    // q41's how-much fraction (even ids train, odd ids eval, as in q41)
    "q91_ngram_spans" -> { (s, d) =>
      val docs = t(s, d, "documents")
      DedupOps.ngramSpanContamination(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 === 1), n = 8)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // intra-doc self-repetition cleanup: repeated trigram occurrences lose
    // their token spans (first occurrence survives), text rebuilt from the
    // kept tokens — the oracle verifies the full reconstructed string
    "q92_remove_repeats" -> ((s, d) =>
      TextOps.removeRepeatedSpans(t(s, d, "documents"), n = 3)
        .orderBy(col("doc_id"))),

    // the full eval-holdout WORKFLOW in one query: the engine's own
    // deterministic 80/20 split, then exact 8-gram span decontamination of
    // the eval half against the train half — the composition a real
    // pipeline runs before training (q42's split × q91's spans)
    "q96_split_decontamination" -> { (s, d) =>
      val split = RelationalOps.hashSplit(t(s, d, "documents"), "doc_id",
        Seq(0.8, 0.2))
      DedupOps.ngramSpanContamination(
          split.filter(col("split") === 0),
          split.filter(col("split") === 1), n = 8)
        .orderBy(col("doc_id"), col("span_start"))
    },

    // BPE merge-table TRAINING: 6 rounds of distributed pair counting over
    // the word-frequency table with a total deterministic tiebreak (count
    // desc, lhs asc, rhs asc); the oracle replays every round verbatim via
    // the same guarded-delimiter literal replace
    "q97_bpe_train" -> ((s, d) =>
      TextOps.trainBpe(t(s, d, "documents"), numMerges = 6)
        .orderBy(col("merge_rank"))),

    // corpus-wide EXACT SUBSTRING dedup (Lee et al. 2022): every 5-gram
    // span that occurs more than once in the corpus survives only at its
    // global-first (doc_id, pos) occurrence; the oracle verifies the full
    // rebuilt text of every document (n=5: on this small-vocab synthetic
    // corpus 5-grams behave like the paper's 50-token spans)
    "q98_substring_dedup" -> ((s, d) =>
      TextOps.exactSubstringDedup(t(s, d, "documents"), n = 5)
        .orderBy(col("doc_id"))),

    // DSIR importance scores toward the lang='en' slice: hashed
    // unigram+bigram buckets, add-1 smoothing, per-doc integer sum of
    // micro-nat-quantized log probability ratios (order-free by design)
    "q99_dsir_weights" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.dsirWeights(docs, docs.filter(col("lang") === "en"),
          buckets = 1024)
        .orderBy(col("doc_id"))
    },

    // CCNet-style quality signal: add-1 bigram LM trained on the corpus,
    // every doc scored by its total bigram log-prob in micro-nats (each
    // distinct bigram's ln quantized once → per-doc integer sums)
    "q100_lm_score" -> ((s, d) =>
      TextOps.bigramLmScore(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // q97 × q44's apply: train the merge table, segment every distinct
    // (source, word), report tokens-per-word fertility per source — the
    // oracle replays all 6 training rounds AND the segmentation verbatim
    "q101_bpe_fertility" -> ((s, d) =>
      TextOps.bpeFertility(t(s, d, "documents"), numMerges = 6)
        .orderBy(col("source"))),

    // the full DSIR pipeline: q99's scores → seeded Gumbel-top-k selection
    // (sampling ∝ exp(score), without replacement, md5-derived randomness —
    // the oracle redraws the identical sample)
    "q102_importance_resample" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.importanceResample(
        TextOps.dsirWeights(docs, docs.filter(col("lang") === "en"),
          buckets = 1024), k = 50)
    },

    // PQ-compressed ANN (FAISS ADC): integer-lattice Lloyd codebook (2
    // rounds, md5 seeding), 4×1-byte codes per 64-dim vector, per-query
    // LUT scoring — training, encoding AND search replayed exactly by the
    // oracle (every distance an exact integer)
    "q103_pq_topk" -> ((s, d) =>
      SimilarityOps.pqSearch(t(s, d, "embeddings"),
          col("vec_id") % 100 === 7, k = 10)
        .orderBy(col("query_id"), col("rank"))),

    // contrastive hard-negative mining: per query, the 10 nearest vectors
    // with a DIFFERENT label — q24's exact-cosine kernel, label-filtered
    // before ranking
    "q104_hard_negatives" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.hardNegatives(emb, emb.filter(col("vec_id") < 5), 10)
        .orderBy(col("query_id"), col("rank"))
    },

    // Zipf rank-frequency audit at decade ranks: quantized log-frequency
    // and per-decade drop (≈ slope · ln 10) — integer output end to end
    "q105_zipf_decades" -> ((s, d) =>
      TextOps.zipfDecades(t(s, d, "documents"), maxRank = 1000)
        .orderBy(col("rank"))),

    // LSH tuning datasheet: measured banding recall vs the exact near-dup
    // pair set per (k, bands) config, alongside the theoretical collision
    // curve — the how-many-bands-does-this-corpus-need audit (the oracle
    // replays every config's MinHash banding permutation-for-permutation)
    "q106_lsh_tuning" -> ((s, d) =>
      DedupOps.lshTuningSweep(t(s, d, "documents")).orderBy(col("bands"))),

    // PQ recall@k audit: per query, how many of the exact integer-L2 top-10
    // the ADC search recovers — the compression-quality sibling of q106
    // (both rankings are total orders over exact integers, so even the
    // recall number is bit-deterministic and oracle-replayed)
    "q107_pq_recall" -> ((s, d) =>
      SimilarityOps.pqRecallAudit(t(s, d, "embeddings"),
          col("vec_id") % 100 === 7, k = 10)
        .orderBy(col("query_id"))),

    // the PERSISTED IVF-PQ index (FAISS IVFPQ): coarse cells route, PQ
    // codes score — probed exhaustively (nProbe = nCells) the ranking is
    // coarse-quantizer-independent and equals q103's replayed-training
    // oracle bit-for-bit, verifying the whole persisted lifecycle
    "q108_ivfpq_topk" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfPqIndex(emb, "graft_q108_ivfpq",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8)
      SimilarityOps.ivfPqTopKPersisted(emb.filter(col("vec_id") % 100 === 7),
          "graft_q108_ivfpq", k = 10, nProbe = 8)
        .orderBy(col("query_id"), col("rank"))
    },

    // IVF-PQ with the integer-LATTICE coarse quantizer at a genuinely
    // PARTIAL probe (2 of 8 cells): cell training, routing, probe
    // selection and ADC are all exact integers, so the oracle replays the
    // ENTIRE partial-probe search — the statement float-KMeans routing
    // can never make
    "q109_det_ivfpq_partial" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfPqIndex(emb, "graft_q109_divfpq",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8, coarse = "lattice")
      SimilarityOps.ivfPqTopKPersisted(emb.filter(col("vec_id") % 100 === 7),
          "graft_q109_divfpq", k = 10, nProbe = 2)
        .orderBy(col("query_id"), col("rank"))
    },

    // residual IVFADC (FAISS's IVFADC proper): PQ codes compress the
    // RESIDUAL against the assigned lattice cell's integer centroid, and
    // each probe scores against a per-(query, cell) residual LUT —
    // training, routing, residuals and ADC all exact integers, so even
    // this 2-of-8 partial probe is oracle-replayed end to end
    "q111_ivfadc_residual" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfPqIndex(emb, "graft_q111_ivfadc",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8, coarse = "lattice", encode = "residual")
      SimilarityOps.ivfPqTopKPersisted(emb.filter(col("vec_id") % 100 === 7),
          "graft_q111_ivfadc", k = 10, nProbe = 2)
        .orderBy(col("query_id"), col("rank"))
    },

    // PII scrubbing (the C4/RefinedWeb stage): emails / IPv4s / phone
    // numbers counted on the original text, then redacted to sentinels in
    // a fixed three-step order — the gate compares the redacted TEXT
    // itself, so the regex semantics must agree cross-engine exactly
    "q112_pii_redact" -> ((s, d) =>
      TextOps.piiRedact(t(s, d, "documents")).orderBy(col("doc_id"))),

    // temperature-sampled source mixture (α = 0.5): √n weights quantized
    // to micro BEFORE the integer denominator sum; targets/epochs are
    // one-product-one-quotient double shapes floored to integers
    "q113_temperature_mix" -> ((s, d) =>
      TextOps.temperatureMixture(t(s, d, "documents"),
        budgetTokens = 1000000L)),

    // the mixture MATERIALIZED: per document, how many complete epochs its
    // source contributes plus membership in the hash-ordered partial
    // prefix — the bucketed per-source running token sum never runs as a
    // global window (q94's lemma), but the oracle replays it as one
    "q114_mixture_draw" -> ((s, d) =>
      TextOps.temperatureAssignments(t(s, d, "documents"),
        budgetTokens = 1000000L)),

    // PQ DISTORTION audit: per-subspace exact mean integer-L2 quantization
    // error — the MSE half of the compression pair (q107 = ranking half);
    // the assignment minimum IS the distortion
    "q119_pq_distortion" -> ((s, d) =>
      SimilarityOps.pqDistortionAudit(t(s, d, "embeddings"))),

    // cross-source duplicate LEAKAGE matrix: the verified near-dup pair
    // set rolled up by unordered source pair (diagonal = within-source
    // duplication) — the is-X-scraping-Y curation datasheet
    "q118_dup_leakage" -> ((s, d) =>
      DedupOps.dupLeakageMatrix(t(s, d, "documents"))),

    // dedup YIELD waterfall: docs/tokens surviving raw → exact → near-dup
    // keep-best, one row per stage — the cleaning-cost headline the
    // mixture planner consumes instead of raw counts
    "q128_dedup_yield" -> ((s, d) =>
      DedupOps.dedupYieldWaterfall(t(s, d, "documents"))),

    // the GOPHER rule battery (Rae 2021 App. A): each published filter
    // rule as its own 0/1 flag plus the conjunction — which rule a slice
    // fails, not just that it fails; entirely map-only
    "q129_gopher_rules" -> ((s, d) =>
      TextOps.gopherRules(t(s, d, "documents"))),

    // COUNT-MIN sketch audit: the d×w grid over token occurrences, exact
    // top-k counts beside their one-sided CMS estimates — the is-the-
    // sketch-wide-enough sizing signal, grid size a parameter not a
    // function of the corpus
    "q135_cms_audit" -> ((s, d) =>
      TextOps.cmsHeavyHitterAudit(t(s, d, "documents"),
        d = 4, w = 256, topK = 20)),

    // char-ENTROPY quality signal: compressibility proxy for boilerplate /
    // degenerate docs — sorted-char run lengths via map-only HOFs, Shannon
    // entropy in centibits (the cross-engine float contract), no shuffle
    "q137_char_entropy" -> ((s, d) =>
      TextOps.charEntropyReport(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // EDIT-DISTANCE near-dups (Ed-Join prefix lemma): character-level
    // typo-duplicates shingle Jaccard misses — q-gram rarest-prefix
    // candidates + banded-DP thresholded levenshtein verify, exact recall
    "q136_edit_distance" -> ((s, d) =>
      DedupOps.editDistancePairs(t(s, d, "documents"), maxDist = 5)
        .orderBy(col("a"), col("b"))),

    // corpus SNAPSHOT DIFF (incremental-crawl bookkeeping): two snapshots
    // derived deterministically from documents (one md5 bucket dropped
    // per side, one bucket's text revised), per-doc added/removed/
    // changed/unchanged over a digest-only full-outer join
    "q140_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val b = pmod(DetHash.md5Hash60(
        concat(lit("snap|"), col("doc_id").cast("string"))), lit(10L))
      val old = docs.withColumn("b", b).filter(col("b") =!= 0).drop("b")
      val nw = docs.withColumn("b", b).filter(col("b") =!= 1)
        .withColumn("text", when(col("b") === 2,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        .drop("b")
      RelationalOps.snapshotDiff(old, nw).orderBy(col("doc_id"))
    }),

    // robust per-source quality OUTLIERS (median/MAD, not mean/stddev —
    // resistant to the very outliers it hunts): micro-quantize once,
    // exact histogram medians, flag dev > k·MAD
    "q139_mad_outliers" -> ((s, d) =>
      TextOps.madQualityOutliers(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // the retention face of q136: edit-link chains close transitively
    // (version chains dedup to ONE representative), min-id keeper +
    // member count per component — q38's convention on the char family
    "q138_edit_dedup_summary" -> ((s, d) =>
      DedupOps.editDedupSummary(t(s, d, "documents"), maxDist = 5)
        .orderBy(col("keep_id"))),

    // sliding-window CHUNKING (the other half of training-data layout vs
    // q141's concat-and-pack sibling packSequences): overlap-strided
    // windows per doc, map-only, the shape that streams at scan speed
    "q141_chunk_docs" -> ((s, d) =>
      TextOps.chunkDocs(t(s, d, "documents"), chunkTokens = 12, overlap = 3)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // WEIGHTED sampling without replacement (Efraimidis–Spirakis):
    // exponential race keys from seeded hashes, k smallest win — P(select)
    // ∝ n_chars, derandomized so the sample is a replayable fact
    "q142_weighted_sample" -> ((s, d) =>
      RelationalOps.weightedSample(t(s, d, "documents"),
        col("n_chars"), k = 100)),

    // FILL-IN-THE-MIDDLE transform (Bavarian 2022): deterministic 50% of
    // docs rewritten to <PRE> p <SUF> s <MID> m token order — hash-derived
    // split points make the augmentation a pure per-row function
    "q143_fim_transform" -> ((s, d) =>
      TextOps.fimTransform(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // BEHAVIORAL sequences: each (user, session) as its ordered action
    // string — the event log becomes a token-sequence corpus the text
    // tier consumes unchanged; one window pass + one session-keyed agg
    "q154_session_sequences" -> ((s, d) =>
      EventOps.sessionSequences(t(s, d, "events"))
        .orderBy(col("user_id"), col("session_idx"))),

    // CONTAINMENT pairs: the asymmetric similarity banding can't see —
    // small-doc-inside-big-doc (quotes, snippets, chrome wrappers) at
    // tiny symmetric Jaccard; same inverted-index shape as q21
    "q153_containment" -> ((s, d) =>
      DedupOps.containmentPairs(t(s, d, "documents"), minContain = 0.5)
        .orderBy(col("a"), col("b"))),

    // the SF-SCALED exactness gate for the Ed-Join tier (q136's operator):
    // the ENGINE runs the full-corpus pruned candidate pipeline — the
    // q-gram rarest-prefix lemma exercised at true scale — and only the
    // REPORT is restricted to pairs with both endpoints in a
    // deterministic md5 doc sample sized ~1000 docs at every sf, so the
    // brute oracle pays a constant |sample|-squared levenshtein cost and
    // the 10x replay can gate the pruning lemmas instead of skipping them
    // (pair membership is pairwise — the restriction commutes with the
    // operator, so filtered-full-run == full-run-on-sample)
    "q165_edit_distance_sampled" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val k = math.max(1L, docs.count() / 1000L)
      def in(c: org.apache.spark.sql.Column) = pmod(DetHash.md5Hash60(
        concat(lit("edsub|"), c.cast("string"))), lit(k)) === 0
      DedupOps.editDistancePairs(docs, maxDist = 5)
        .filter(in(col("a")) && in(col("b")))
        .orderBy(col("a"), col("b"))
    },

    // q153's containment operator under the q165 scale-gate rule:
    // full-corpus inverted-index run, report restricted to sampled-pair
    // endpoints (containment is pairwise — the restriction commutes)
    "q166_containment_sampled" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val k = math.max(1L, docs.count() / 1000L)
      def in(c: org.apache.spark.sql.Column) = pmod(DetHash.md5Hash60(
        concat(lit("edsub|"), c.cast("string"))), lit(k)) === 0
      DedupOps.containmentPairs(docs, minContain = 0.5)
        .filter(in(col("a")) && in(col("b")))
        .orderBy(col("a"), col("b"))
    },

    // q138's edit-link clustering on the sampled SUBSET (components reach
    // through unsampled docs, so a report filter cannot commute here —
    // engine and oracle both run on the sample; the pair-generation
    // pruning scales under q165, component closure under the q64/q37 sf1
    // gates, and this row pins their composition's exactness)
    "q167_edit_dedup_sampled" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val k = math.max(1L, docs.count() / 1000L)
      DedupOps.editDedupSummary(docs.filter(pmod(DetHash.md5Hash60(
          concat(lit("edsub|"), col("doc_id").cast("string"))), lit(k)) === 0),
          maxDist = 5)
        .orderBy(col("keep_id"))
    },

    // MULTI-QUERY BM25 retrieval through a posting-list plan: postings
    // pruned to query terms before any aggregation, per-(query,doc)
    // contributions folded in sorted term order (bit-stable doubles)
    "q152_bm25_retrieve" -> { (s, d) =>
      import s.implicits._
      val queries = Seq(
        (0L, "spark join fast"), (1L, "table scan slow row"),
        (2L, "hash merge batch window")).toDF("query_id", "query_text")
      TextOps.bm25Retrieve(t(s, d, "documents"), queries, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },

    // MULTI-PROBE LSH (Lv'07): each query also probes every Hamming-1
    // perturbation of its SRP bucket — recall without extra tables; the
    // corpus is bucketed once, only the probe side fans out
    "q151_multiprobe_lsh" -> ((s, d) =>
      SimilarityOps.lshTopKMultiProbe(t(s, d, "embeddings"), k = 5,
          nPlanes = 12, nTables = 2)
        .orderBy(col("query_id"), col("rank"))),

    // per-doc DUPLICATED-n-GRAM fraction vs the corpus: how much of each
    // doc exists elsewhere — the boilerplate/syndication signal pairwise
    // dedup misses; df-join shapes, no pairs anywhere
    "q150_dup_fraction" -> ((s, d) =>
      DedupOps.dupGramFraction(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // quality-signal CORRELATION matrix: pairwise Pearson across the
    // heuristic battery — which signals are redundant; one aggregation
    // pass (exact integer sums), matrix built from a single row
    "q149_signal_corr" -> ((s, d) =>
      TextOps.signalCorrelationMatrix(t(s, d, "documents"))),

    // STRATIFIED weighted sampling: q142's exponential race per source —
    // per-stratum quotas, weight-proportional within; rank window with
    // WindowGroupLimit heaps, no global sort
    "q148_stratified_sample" -> ((s, d) =>
      RelationalOps.stratifiedWeightedSample(t(s, d, "documents"),
          "source", col("n_chars"), k = 25)
        .orderBy(col("source").asc_nulls_last, col("rank"))),

    // PMI COLLOCATIONS: adjacent pairs co-occurring beyond chance — lift
    // as floor((1e6·c12·N) / (c1·c2)) in DOUBLES (one product chain, one
    // quotient, floor last: the all-integer form overflows 2^63 at 100 TB
    // corpus counts; IEEE ops are exactly rounded, so the oracle's
    // identical expression shape reproduces the bits); map-only bigram
    // transform, two vocab-sized unigram joins
    "q147_pmi_collocations" -> ((s, d) =>
      TextOps.pmiCollocations(t(s, d, "documents"))),

    // kNN-DENSITY outliers: cosine to the 5th nearest neighbor as a local
    // density score, bottom-5%-by-value flagged via an exact micro-value
    // histogram — isolated/off-distribution vectors, engine-replayable
    "q146_knn_density" -> ((s, d) =>
      SimilarityOps.knnDensityOutliers(t(s, d, "embeddings"))
        .orderBy(col("vec_id"))),

    // the CORPUS-SCALE density audit: same kth-NN-by-value report as q146
    // but fed by LSH ANN candidates instead of the all-pairs cross — the
    // exact rerank touches only bucket-collision pairs, and vectors whose
    // candidate list never reaches rank k surface as NULL rows (ANN recall
    // shortfall made visible, not silently dropped)
    "q155_knn_density_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      // 6 planes/table: 64 buckets per table keeps real collision mass at
      // this corpus size, so most vectors reach rank k and the NULL tail
      // stays what it should be — the genuinely isolated vectors. RAW
      // collision pairs, no interposed top-k: the audit kernel applies
      // its own exact rerank + k, so no truncation knob can silently
      // drop candidates at a larger corpus
      val cand = SimilarityOps.lshCandidatePairs(emb, nPlanes = 6)
      SimilarityOps.knnDensityOutliersFromCandidates(emb, cand, k = 5)
        .orderBy(col("vec_id"))
    }),

    // the MISLABEL audit over embeddings: per vector, how many of its 5
    // exact-cosine nearest neighbors share its label; zero matches flags
    // the classic nearest-neighbor mislabel suspect
    "q160_label_purity" -> ((s, d) =>
      SimilarityOps.labelNeighborhoodPurity(t(s, d, "embeddings"))
        .orderBy(col("vec_id"))),

    // the CORPUS-SCALE mislabel audit — q160's purity report fed by raw
    // LSH collision candidates instead of the all-pairs cross (the q155
    // pattern applied to label purity): exact rerank touches only
    // bucket-collision pairs; vectors with fewer than 5 candidates keep
    // partial n_match counts (purity reads as a lower bound under recall
    // shortfall), isolated vectors surface as suspect, never drop
    "q162_label_purity_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cand = SimilarityOps.lshCandidatePairs(emb, nPlanes = 6)
      SimilarityOps.labelPurityFromCandidates(emb, cand, k = 5)
        .orderBy(col("vec_id"))
    }),

    // UNIGRAM-LM tokenizer TRAINING (Kudo 2018 — the SentencePiece model
    // family, the other mainstream subword trainer beside q97's BPE):
    // substring seed (all singles + top-24 longer pieces), two hard-EM
    // rounds of Viterbi-segment-and-recount in exact micro-nat integer
    // scores; the oracle enumerates every segmentation of every distinct
    // word (recursive CTE) and replays the argmax under the identical
    // total order (score desc, fewer pieces, lexicographic)
    "q163_unigram_lm" -> ((s, d) =>
      TextOps.trainUnigramLm(t(s, d, "documents"), seedSize = 24,
          numRounds = 2)
        .orderBy(col("piece"))),

    // tokenizer BAKE-OFF: per-source tokens-per-word fertility for q97's
    // BPE, q163's unigram LM and q168's WordPiece over the identical
    // whitespace words, stacked with a tokenizer tag — the side-by-side
    // number that picks a trainer for a corpus slice; the oracle replays
    // ALL THREE trainings and segmentations verbatim
    "q164_tokenizer_bakeoff" -> ((s, d) =>
      TextOps.tokenizerFertilityComparison(t(s, d, "documents"),
          numMerges = 6, seedSize = 24, numRounds = 2)
        .orderBy(col("tokenizer"), col("source"))),

    // WORDPIECE training (Schuster & Nakajima 2012 — the BERT trainer,
    // completing the third mainstream subword family beside q97's BPE and
    // q163's unigram LM): BPE's loop with the merge rule swapped for the
    // likelihood-gain score pair/(lhs·rhs) over the CURRENT symbol counts,
    // computed as the exact scaled-integer floor quotient
    // (pair·10^12 div lhs·rhs) so the argmax replays across engines; the
    // oracle unrolls a symbol-count AND a pair-count table per round
    "q168_wordpiece_train" -> ((s, d) =>
      TextOps.trainWordPiece(t(s, d, "documents"), numMerges = 6)
        .orderBy(col("merge_rank"))),

    // the PERSISTED face of q192 (the banded-index lifecycle convention
    // applied to cluster state): the corpus labeling is built ONCE into a
    // comp-bucketed versioned assignment snapshot, the batch folds in
    // through the quotient step + versioned write + meta-append commit,
    // and the read-back must equal the global recompute — same oracle as
    // q192, now through the ensure/maintain/read lifecycle a production
    // ingest actually runs. Candidates ride the CORPUS-SIZED SRP operating
    // point (the fixed 8-plane form's candidate join spilled 77 GB of
    // local disk at 200k vectors — auto planes hold candidate volume
    // ~linear in n); maintain re-runs are idempotent (replayed edges
    // contract to self-loops)
    "q196_persisted_cluster_maintain" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val pairs = ops.CacheScope.default.register(
        SimilarityOps.srpNearDupPairsAuto(emb, 0.4))
        .select(col("a"), col("b"))
      val isOld = (c: org.apache.spark.sql.Column) => c % 5 =!= 0
      val prefix = s"graft_q196_${dirTag(d)}_cc"
      // tag = path + DATA fingerprint: a regenerated dataset at the same
      // path (or a stale warehouse from a prior session) misses and
      // rebuilds instead of serving outdated assignments
      val fp = SimilarityOps.dataFingerprint(emb)
      GraphOps.ensureClusterAssignments(
        pairs.filter(isOld(col("a")) && isOld(col("b"))),
        emb.filter(isOld(col("vec_id"))).select(col("vec_id")),
        prefix, corpusTag = d + "#base#" + fp, idCol = "vec_id")
      GraphOps.maintainClusterAssignments(
        pairs.filter(!isOld(col("a")) || !isOld(col("b"))),
        emb.filter(!isOld(col("vec_id"))).select(col("vec_id")),
        prefix, newCorpusTag = d + "#full#" + fp, idCol = "vec_id")
      GraphOps.clusterAssignments(s, prefix)
        .select(col("id").as("vec_id"), col("comp"))
        .orderBy(col("vec_id"))
    },

    // the IMAGE tier's first HARD-gated row (decode + resize math under
    // the hash gate, not just OpsSpec): real JDK BMP decode → Rec.601
    // integer luma → the integer box-filter grid, on the hex fixtures the
    // oracle parses byte-by-byte from the same literals. The DCT tail
    // stays spec-gated (math.cos has no cross-engine bit contract); this
    // row pins everything UP TO the transform
    "q194_image_fixture" -> { (s, d) =>
      import s.implicits._
      val fx = bmpFixtures.map(f => (f._1, f._2)).toDF("img_id", "hex")
        .select(col("img_id"), unhex(col("hex")).as("payload"))
      MultimodalOps.lumaGrid(fx, "img_id", "payload", gridN = 2)
        .orderBy(col("img_id"), col("idx"))
    },

    // the image EMBEDDING tail under the hash gate (q194 pinned decode →
    // luma → grid; this pins grid → DCT → pHash): the DCT runs in FIXED-
    // POINT integer arithmetic over a driver-computed coefficient table
    // embedded as the same literals in the Spark closure AND the oracle
    // SQL (the lattice-quantizer trick applied to the transform), so the
    // full perceptual-hash construction — coefficients, AC median, bits —
    // is exact integer math DuckDB replays byte-for-byte from the hex
    // fixtures. Nothing in the multimodal embedding path remains outside
    // the gate
    "q199_image_phash" -> { (s, d) =>
      import s.implicits._
      val fx = bmpFixtures.map(f => (f._1, f._2)).toDF("img_id", "hex")
        .select(col("img_id"), unhex(col("hex")).as("payload"))
      MultimodalOps.phashBits(fx, "img_id", "payload", gridN = 4)
        .orderBy(col("img_id"))
    },

    // the AUDIO tier's hard-gated row: real JDK WAV decode (mono + stereo
    // PCM16LE fixtures) → the INTEGER container/signal facts — frames,
    // duration, channel-0 zero crossings (sign transitions, zeros
    // ignored) — replayed by the oracle from the same hex (rms/peak stay
    // spec-gated: double accumulation order has no cross-engine contract)
    "q195_audio_fixture" -> { (s, d) =>
      import s.implicits._
      val fx = wavFixtures.map(f => (f._1, f._2)).toDF("clip_id", "hex")
        .select(col("clip_id"), unhex(col("hex")).as("payload"))
      MultimodalOps.decodeAudio(fx, "clip_id", "payload")
        .select(col("id").as("clip_id"),
          col("channels").cast("long").as("channels"),
          col("sampleRateHz").cast("long").as("sample_rate"),
          col("bitsPerSample").cast("long").as("bits"),
          col("nFrames").as("n_frames"),
          col("durationMs").as("duration_ms"),
          col("zeroCrossings").as("zero_crossings"))
        .orderBy(col("clip_id"))
    },

    // the TOKENIZER tier's sf-scaled exactness gate (the q188/q191 rule on
    // the WORD axis): the full q164 bake-off — three trainings + fertility
    // — on an md5 word sample auto-sized to ~8 words, so the oracle's
    // unigram segmentation enumeration (its cost grows with distinct
    // words; ~50 min at sf1 for the full table) shrinks by the sample
    // factor at any sf. Unlike q188 the sample is ACTIVE at sf0.01 too
    // (31 words → k=3), so the gate exercises the sampling machinery at
    // every tested scale; q163/q164/q168 keep their full forms at
    // sf0.01/sf0.1 and sf1+ exactness rides this query
    "q193_tokenizer_sampled" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.tokenizerFertilityComparison(docs, numMerges = 6,
          seedSize = 24, numRounds = 2,
          wordSampleK = TextOps.wordSampleMod(docs, target = 8))
        .orderBy(col("tokenizer"), col("source"))
    },

    // CONTENT-DEFINED CHUNKING (gear hash, the FastCDC/ddelta family) over
    // byte payloads — the BINARY mirror of shingle dedup, for the
    // multimodal tier's blobs: boundaries fall where a rolling fingerprint
    // hits maskBits low zeros, so edits shift one chunk and boundaries
    // resynchronize. Driven here over the documents' bytes (the corpus's
    // only at-scale payload column; ASCII, so the oracle's char walk IS
    // the byte walk); the oracle replays the exact gear recursion as a
    // recursive CTE over the same embedded 256-literal gear table
    "q169_cdc_chunks" -> ((s, d) =>
      MultimodalOps.cdcChunks(t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // the corpus-level CDC dedup datasheet: how many bytes remain once
    // shared chunks count once — the storage/transfer planning number
    "q170_cdc_dedup_stats" -> ((s, d) =>
      MultimodalOps.cdcDedupStats(
        MultimodalOps.cdcChunks(t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))))),

    // blob near-dup pairs by shared-chunk Jaccard (the jaccardPairs kernel
    // on CDC chunk hashes): re-encoded/appended copies whose whole-blob
    // hashes differ but whose chunk sets mostly agree
    "q171_blob_neardup" -> ((s, d) =>
      MultimodalOps.blobPairsByChunks(
        MultimodalOps.cdcChunks(t(s, d, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))))
        .orderBy(col("a"), col("b"))),

    // BM25 lexical retrieval (Okapi k1=1.2 b=0.75, RATIO idf — the
    // no-libm contract of q51's topTerms), BIGRAM terms (the synthetic
    // unigram vocab is ~31 words, all stopword-band): every 29th document
    // queries the rest of the corpus, top-5 by summed per-term
    // micro-quantized contributions (integer sum — order-free). The
    // LEXICAL twin of the ANN top-k tier; candidate volume is
    // query-proportional because the stopword band (df > half the corpus)
    // is pruned from postings
    "q172_bm25_topk" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.bm25TopK(docs.filter(col("doc_id") % 29 =!= 0),
          docs.filter(col("doc_id") % 29 === 0), k = 5, ngram = 2)
        .orderBy(col("query_id"), col("rank"))
    },

    // lexical DECONTAMINATION off the PERSISTED bucketed inverted index
    // (the index-once / probe-many production shape): benchmark = every
    // 29th doc, corpus = the rest; per benchmark doc its best BM25 match
    // and a flag at 200.0 (2e8 micro) — zero-candidate queries surface as
    // NULL rows, never silent drops
    "q173_bm25_decontam" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.ensureLexicalIndex(docs.filter(col("doc_id") % 29 =!= 0),
        "graft_q173_lex", corpusTag = corpusTagOf(t(s, d, "documents"), d),
        ngram = 2)
      TextOps.lexicalContaminationReport(
          docs.filter(col("doc_id") % 29 === 0), "graft_q173_lex",
          thresholdMicro = 200000000L)
        .orderBy(col("query_id"))
    },

    // HYPERLOGLOG cardinality sketch — the MERGEABLE distinct-count state
    // (per-source vocab sizes here, trigram keys): 2^8 max-rank registers
    // per source, the __ALL__ row built by per-register MAX over the
    // per-source sketches (never a rescan — the union-of-sets lemma),
    // estimates audited against exact distinct counts in ppm
    "q174_hll_cardinality" -> { (s, d) =>
      val keys = t(s, d, "documents").select(col("source"),
        explode(TextOps.ngramTerms(col("text"), 3)).as("key"))
      RelationalOps.hllCardinalityAudit(keys, col("key"), col("source"))
        .orderBy(col("grp").asc_nulls_last)
    },

    // the (source × lang) MIXTURE CUBE: detail cells, both rollups and the
    // grand total from ONE native CUBE aggregation, grouping_id
    // disambiguating rolled-up NULLs from genuine ones — the datasheet a
    // mixture planner slices without rescanning the corpus per level
    "q175_mixture_cube" -> ((s, d) =>
      TextOps.mixtureCube(t(s, d, "documents"))
        .orderBy(col("grouping_lvl"), col("source").asc_nulls_last,
          col("lang").asc_nulls_last)),

    // TRIANGLE census of the embedding near-dup graph — the
    // cluster-topology audit behind transitive-closure dedup: transitivity
    // ~ 1 means the components are clique-like (keep-one-per-cluster is
    // safe), low transitivity at high degree means CHAINS, where the
    // transitive hull merges docs never pairwise similar. Runs at cos ≥
    // 0.2 — a denser operating point than q64's dedup graph, so the
    // census actually has wedges and triangles to count at small SF.
    // Degree-ordered orientation keeps enumeration O(m^1.5).
    //
    // THE q178–q182 TIER IS THE FIXED-ε AUDIT BY DESIGN: these five
    // queries diagnose what a fixed threshold graph does as the corpus
    // grows (the measured 10× corpus → ~113× edges densification), so
    // they deliberately keep the historical fixed-8-plane / fixed-ε
    // operating point — they are the "before" whose pathology q189/q197
    // (bounded mutual-kNN) and q190/q198 (operating-point recommender)
    // exist to fix, and q188 is their sample-sized face at large sf.
    // Every production consumer (q64/q88/q184/q189–q198) rides the
    // auto-sized/bounded tier.
    // the four fixed-ε consumers (q178/q179/q180/q182) all read the SAME
    // (corpus, 0.2, 8-plane) verified pair list — register it so one
    // banding + cosine-verify pass serves the whole block (the
    // q190/q192/q196 convention; registration keys on the canonicalized
    // plan, so the four call sites share one cache entry)
    "q178_neardup_triangles" -> ((s, d) =>
      GraphOps.triangleStats(
        ops.CacheScope.default.register(
            SimilarityOps.srpNearDupPairs(t(s, d, "embeddings"), 0.2))
          .select(col("a"), col("b")))),

    // Per-CLUSTER census of the same graph — the audit table read BEFORE
    // collapsing near-dup components: per component its size, edge count,
    // triangles, density and transitivity. density ~ transitivity ~ 1 =
    // clique (keep-one is safe); a big sparse component = a chain the
    // closure glued — split it, don't collapse it
    "q179_cluster_census" -> ((s, d) =>
      GraphOps.clusterCensus(
        ops.CacheScope.default.register(
            SimilarityOps.srpNearDupPairs(t(s, d, "embeddings"), 0.2))
          .select(col("a"), col("b")))
        .orderBy(col("n_vertices").desc, col("comp"))),

    // the per-cluster census RE-POINTED at the bounded mutual-kNN graph
    // (q189's edge set): the same collapse-safety dashboard, now over the
    // graph whose degree cannot densify as the corpus grows
    "q197_knn_cluster_census" -> ((s, d) =>
      GraphOps.clusterCensus(
        servedKnnEdges(s, d).select(col("a"), col("b")))
        .orderBy(col("n_vertices").desc, col("comp"))),

    // 3-TRUSS of the same graph — the EDGE-grain repair the census
    // motivates: iterated support peeling drops every edge sharing no
    // common neighbor (the bridge a single borderline pair contributes),
    // so closure over what survives can't chain unrelated groups. Exactly
    // 4 peel rounds, then a fixpoint assert (throws rather than returning
    // a non-truss — the CC maxIter contract)
    "q180_ktruss_edges" -> ((s, d) =>
      GraphOps.trussEdges(
        ops.CacheScope.default.register(
            SimilarityOps.srpNearDupPairs(t(s, d, "embeddings"), 0.2))
          .select(col("a"), col("b")), k = 3, rounds = 4)
        .orderBy(col("a"), col("b"))),

    // COHORT-RETENTION matrix: users cohorted by first-event week (fixed
    // epoch-week grid — no calendar arithmetic), each (cohort, offset)
    // cell = distinct cohort members active that week, micro fraction of
    // the cohort. Offset 0 reads exactly 1.0 by definition
    "q181_cohort_retention" -> ((s, d) =>
      EventOps.cohortRetention(t(s, d, "events"))
        .orderBy(col("cohort_week"), col("week_offset"))),

    // the dedup-effect DELTA the truss buys: keep-one-per-cluster strikes
    // under plain closure vs closure-over-the-3-truss, one row each. The
    // difference in docs_struck = deletions that rested on one
    // uncorroborated bridge pair
    "q182_truss_dedup_effect" -> ((s, d) =>
      GraphOps.trussDedupEffect(
        ops.CacheScope.default.register(
            SimilarityOps.srpNearDupPairs(t(s, d, "embeddings"), 0.2))
          .select(col("a"), col("b")), k = 3, rounds = 4)
        .orderBy(col("scheme"))),

    // first-order MARKOV transitions over per-user event sequences under
    // the (ts, id) total order: counts + row-normalized micro
    // probabilities — the next-event-baseline / behavior-shift primitive
    "q183_event_transitions" -> ((s, d) =>
      EventOps.transitionMatrix(t(s, d, "events"))
        .orderBy(col("from_type"), col("to_type"))),

    // CLUSTER-SAFE splits: the 80/10/10 hash split computed on the
    // near-dup COMPONENT id, so leakage is impossible by construction
    // (q134 audits it after the fact; this prevents it). Per split:
    // volume, cluster count, largest cluster, and the cross-split pair
    // count — provably 0, made visible so the oracle checks the invariant.
    // The component graph is the BOUNDED tier (auto-sized candidates,
    // mutual-kNN edges): at a fixed ε the split's largest cluster fuses
    // toward the whole corpus as it grows (forcing ~everything into one
    // split); bounded edges keep components split-assignable at any n
    "q184_cluster_safe_split" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val pairs = servedKnnEdges(s, d)
        .select(col("a"), col("b")).localCheckpoint()
      val asg = RelationalOps.clusterSafeSplit(
        emb.select(col("vec_id")), pairs, Seq(0.8, 0.1, 0.1), idCol = "vec_id")
      val byId = asg.select(col("vec_id"), col("split"))
      val leaks = pairs
        .join(byId.select(col("vec_id").as("a"), col("split").as("sa")), Seq("a"))
        .join(byId.select(col("vec_id").as("b"), col("split").as("sb")), Seq("b"))
        .filter(col("sa") =!= col("sb"))
        .groupBy(col("sa").as("split")).agg(count(lit(1)).as("n_leak_pairs"))
      asg.groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("comp")).as("n_clusters"),
          max(col("comp")).as("max_comp"))
        .join(leaks, Seq("split"), "left")
        .select(col("split"), col("n_docs"), col("n_clusters"),
          col("max_comp"),
          coalesce(col("n_leak_pairs"), lit(0L)).as("n_leak_pairs"))
        .orderBy(col("split"))
    },

    // the GRAPH tier's sf-scaled exactness gate (the q165/q167 rule): the
    // full-graph census/truss forms are oracle-gated at sf0.01/sf0.1, but
    // at sf1 the 0.2 graph has 925k edges / 91M wedges and the DuckDB
    // replay of five unrolled wedge rounds + a recursive closure is
    // intractable — so this runs the SAME composition on the INDUCED
    // subgraph of an md5 vertex sample auto-sized to ~500 vertices
    // (sampling an induced subgraph commutes with every graph operator by
    // definition), keeping the oracle ~constant-cost at every sf. At
    // sf0.01 the sample is the whole corpus — identical to q182
    "q188_graph_tier_sampled" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val k = math.max(1L, emb.count() / 500L)
      def in(c: org.apache.spark.sql.Column) = pmod(DetHash.md5Hash60(
        concat(lit("gts|"), c.cast("string"))), lit(k)) === 0
      // banding the SAMPLE equals banding the corpus then filtering pairs
      // (bucket assignment is per-vector deterministic; a pair survives
      // iff both endpoints are sampled) — and costs the sample's share of
      // the candidate join instead of the corpus's. The oracle keeps the
      // filter-after form; the hot-bucket cap never binds at tested SFs
      // (max occupancy ~780 at sf10 vs the 10000 cap), so the two forms
      // are value-identical
      GraphOps.trussDedupEffect(
        SimilarityOps.srpNearDupPairs(emb.filter(in(col("vec_id"))), 0.2)
          .select(col("a"), col("b")), k = 3, rounds = 4)
        .orderBy(col("scheme"))
    },

    // the DEGREE-BOUNDED replacement for the fixed-ε graph the whole
    // q178-q184 tier consumes: mutual-kNN edge selection (per-vertex top-4
    // by exact cosine over the SRP candidates, kept only when mutual)
    // bounds edges to n·k/2 BY CONSTRUCTION — the answer to the measured
    // 10×-corpus → ~180×-edges densification of cos ≥ 0.2 — then the same
    // closure-vs-truss dedup-effect audit runs on the bounded graph
    "q189_knn_graph_effect" -> ((s, d) =>
      GraphOps.trussDedupEffect(
        servedKnnEdges(s, d).select(col("a"), col("b")), k = 3, rounds = 4)
        .orderBy(col("scheme"))),

    // the census → OPERATING-POINT recommender: one SRP candidate pass at
    // the 0.2 floor, then every threshold in the grid evaluated from the
    // same pair list (edges, endpoints, max/mean degree) and the smallest
    // threshold keeping mean degree ≤ 4.0 flagged — the operator form of
    // the manual "the census says re-tune ε" rule
    "q190_threshold_sweep" -> ((s, d) =>
      GraphOps.recommendThreshold(
        ops.CacheScope.default.register(
          SimilarityOps.srpNearDupPairsAuto(t(s, d, "embeddings"), 0.2)),
        gridMicro = Seq(200000L, 250000L, 300000L, 350000L, 400000L,
          450000L, 500000L),
        targetMeanDegreeMicro = 4000000L)
        .orderBy(col("thr_micro"))),

    // the sweep's own SCALE PATH (the verdict-7 form: estimate the
    // operating point on a SAMPLED subgraph): the md5 vertex sample
    // auto-sized to ~500 vertices, swept at the same grid with the target
    // scaled by the sample rate — an induced p-sample scales every
    // vertex's expected degree by p uniformly, so "sampled mean degree ≤
    // p·target" estimates the full-corpus rule; at 100× the full-floor
    // sweep's candidate join spills local disk, this stays sample-sized
    // on BOTH engine and oracle
    "q198_threshold_sweep_sampled" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val k = math.max(1L, emb.count() / 500L)
      def in(c: org.apache.spark.sql.Column) = pmod(DetHash.md5Hash60(
        concat(lit("tss|"), c.cast("string"))), lit(k)) === 0
      GraphOps.recommendThreshold(
        SimilarityOps.srpNearDupPairsAuto(emb.filter(in(col("vec_id"))), 0.2),
        gridMicro = Seq(200000L, 250000L, 300000L, 350000L, 400000L,
          450000L, 500000L),
        targetMeanDegreeMicro = 4000000L / k)
        .orderBy(col("thr_micro"))
    },

    // q189's sf-scaled exactness gate (the q188 rule): the same mutual-kNN
    // + dedup-effect composition on the induced md5 vertex sample
    // auto-sized to ~500 vertices. Unlike the ε-graph, kNN selection does
    // NOT commute with sampling (top-k within the sample ≠ top-k of the
    // corpus restricted) — and doesn't need to: the gate's contract is
    // engine == oracle on the SAME sampled computation, and both rank over
    // the sample's candidate set. Banding the sample vs filtering the
    // corpus's bands is value-identical (per-vector buckets; hot-bucket
    // cap never binds at tested SFs — the q188 caveat)
    "q191_knn_graph_sampled" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val k = math.max(1L, emb.count() / 500L)
      def in(c: org.apache.spark.sql.Column) = pmod(DetHash.md5Hash60(
        concat(lit("kgs|"), c.cast("string"))), lit(k)) === 0
      GraphOps.trussDedupEffect(
        SimilarityOps.knnGraphAuto(emb.filter(in(col("vec_id"))), 0.2,
            kTop = 4)
          .select(col("a"), col("b")), k = 3, rounds = 4)
        .orderBy(col("scheme"))
    },

    // INCREMENTAL component maintenance, oracle-proved equal to the global
    // recompute: the corpus (vec_id % 5 ≠ 0) labeling is PERSISTED state
    // (ensure builds it once per corpus tag — production amortizes it
    // across every ingest), then the batch's edges fold in through the
    // label-contracted QUOTIENT graph — CC re-runs only on touched
    // components + the batch, never the corpus, and the measured cost of
    // a warm run is the fold, not the setup. Candidates at the
    // corpus-sized SRP operating point (the q196 note). The oracle is the
    // GLOBAL closure over all pairs at 0.4: equality IS the correctness
    // claim
    "q192_incremental_cc" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val pairs = ops.CacheScope.default.register(
        SimilarityOps.srpNearDupPairsAuto(emb, 0.4))
        .select(col("a"), col("b"))
      val isOld = (c: org.apache.spark.sql.Column) => c % 5 =!= 0
      val prefix = s"graft_q192_${dirTag(d)}_cc"
      GraphOps.ensureClusterAssignments(
        pairs.filter(isOld(col("a")) && isOld(col("b"))),
        emb.filter(isOld(col("vec_id"))).select(col("vec_id")),
        prefix, idCol = "vec_id",
        // the q196 tag convention: path + data fingerprint
        corpusTag = d + "#base#" + SimilarityOps.dataFingerprint(emb))
      GraphOps.incrementalComponents(
          GraphOps.clusterAssignments(s, prefix)
            .select(col("id").as("vec_id"), col("comp")),
          pairs.filter(!isOld(col("a")) || !isOld(col("b"))),
          emb.filter(!isOld(col("vec_id"))).select(col("vec_id")), "vec_id")
        .orderBy(col("vec_id"))
    },

    // the PERSISTED mutual-kNN graph lifecycle (the bounded-graph tier's
    // q196): ensure freezes the SRP operating point on the base corpus
    // (vec_id % 5 ≠ 0) — plane count AND the hot-cell split layout
    // (splitOccupancy = 8 so verify-scale genuinely exercises split
    // cells, the q202 convention) — and builds the per-vertex kept
    // lists; maintain folds the remaining vectors in with BATCH-SIZED
    // compute (band the batch at the frozen layout, probe the stored
    // bands on (tbl, bucket, sub), re-rank only touched vertices, append
    // only the touched kept delta); the served mutual edges must equal
    // the batch knnGraph over the FULL corpus at that frozen layout —
    // the top-k merge property, and equality IS the oracle claim
    "q200_knn_index_maintain" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val isOld = (c: org.apache.spark.sql.Column) => c % 5 =!= 0
      val prefix = s"graft_q200_${dirTag(d)}_knn"
      SimilarityOps.ensureKnnIndex(emb.filter(isOld(col("vec_id"))), prefix,
        // the q196 tag convention: path + data fingerprint
        corpusTag = d + "#base#" + SimilarityOps.dataFingerprint(emb),
        minCos = 0.2, kTop = 4, splitOccupancy = 8)
      SimilarityOps.maintainKnnIndex(emb.filter(!isOld(col("vec_id"))),
        prefix)
      SimilarityOps.knnIndexEdges(s, prefix).orderBy(col("a"), col("b"))
    },

    // DELETE on the persisted kNN graph (the lifecycle's missing verb,
    // and the one place delete must REPAIR state, not just filter: a
    // dead neighbor occupied top-k slots, so touched vertices re-rank
    // against the live store on the frozen (tbl, bucket, sub) layout).
    // The oracle is the batch mutual-kNN over the LIVE corpus at the
    // layout frozen on the FULL ensure corpus — plane count and split
    // cells — equality IS the claim, crowded-out edges restored included
    "q204_knn_index_delete" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val prefix = s"graft_q204_${dirTag(d)}_knn"
      SimilarityOps.ensureKnnIndex(emb, prefix,
        corpusTag = d + "#full#" + SimilarityOps.dataFingerprint(emb),
        minCos = 0.2, kTop = 4, splitOccupancy = 8)
      SimilarityOps.deleteFromKnnIndex(
        emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")), prefix)
      SimilarityOps.knnIndexEdges(s, prefix).orderBy(col("a"), col("b"))
    },

    // the OPERATING-POINT health audit: occupancy distribution + the
    // exact banded-join candidate volume Σ c·(c−1)/2 at this corpus's
    // auto point, and the skew flag (uniform-occupancy sizing vs the
    // measured concentration of correlated embeddings) — the number to
    // read BEFORE a corpus commits to a banding run
    "q201_srp_occupancy_audit" -> ((s, d) =>
      SimilarityOps.srpOccupancyAudit(t(s, d, "embeddings"))),

    // HOT-DIRECTION remediation under the oracle gate: near-dup pairs at
    // the auto point with over-occupied cells SPLIT by secondary strided
    // planes (per-bucket integer-shift rule — the oracle derives the same
    // split depth from the same counts and the same extension planes).
    // splitOccupancy = 8 (the target itself) so the verify-scale corpus
    // genuinely exercises multi-level splits, not just the skew tail
    "q202_srp_split_pairs" -> ((s, d) =>
      SimilarityOps.srpNearDupPairsSplitAuto(t(s, d, "embeddings"), 0.2,
          splitOccupancy = 8)
        .orderBy(col("a"), col("b"))),

    // COMPOSITION PAST THE PLANE CEILING under the oracle gate: the
    // corpus sharded into equal-width id ranges (integer rule — the
    // oracle re-derives membership from the same min/max), each shard
    // banded at its OWN auto operating point, per-shard verified pairs
    // unioned. Recall is within-shard by design (the documented
    // boundary trade); 4 shards so every shard sizes a genuinely
    // smaller point than the global corpus would
    "q205_srp_sharded_pairs" -> ((s, d) =>
      SimilarityOps.srpNearDupPairsSharded(t(s, d, "embeddings"), 0.2,
          nShards = 4)
        .orderBy(col("a"), col("b"))),

    // the VIDEO tier under the hash gate (closing the q194→q199 chain's
    // last spec-only stage): RIFF/AVI container walk → per-frame BMP
    // payloads → the q199 integer-DCT pHash per frame, with container
    // facts (frame counts incl. the declared-vs-survived truncation
    // signal, µs-per-frame) on every row. The oracle re-derives every
    // chunk boundary with its OWN recursive walk over the hex and parses
    // each frame's dimensions from the frame's BMP header — nothing about
    // the layout is fed to it
    "q203_video_fixture" -> { (s, d) =>
      import s.implicits._
      val fx = aviFixtures.toDF("vid_id", "hex")
        .select(col("vid_id"), unhex(col("hex")).as("payload"))
      val frames = MultimodalOps.videoFrames(fx, "vid_id", "payload")
        .withColumn("fid", col("vid_id") * 100 + col("frame_idx"))
      val ph = MultimodalOps.phashBits(
        frames.select(col("fid"), col("frame")), "fid", "frame", gridN = 4)
      frames.join(ph, frames("fid") === ph("fid"))
        .select(col("vid_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames"), col("declared_frames"), col("micros_per_frame"),
          col("dc"), col("median_ac"), col("phash"))
        .orderBy(col("vid_id"), col("frame_idx"))
    },

    // MJPEG frames under the gate (the q203 fixture's frames are BMP;
    // this one's are real baseline JPEGs, plus one mixed JPEG/BMP
    // stream): the engine DECODES each frame (`javax.imageio`) and
    // reports the decoded dimensions, while the oracle walks the RIFF
    // grammar itself and parses each JPEG frame's dimensions from its
    // OWN SOF marker segment (BMP frames from their BMP header) — no
    // offset, size, or dimension is fed to either side
    "q206_mjpeg_fixture" -> { (s, d) =>
      import s.implicits._
      val fx = mjpegAviFixtures.toDF("vid_id", "hex")
        .select(col("vid_id"), unhex(col("hex")).as("payload"))
      MultimodalOps.decodeVideoFrames(fx, "vid_id", "payload")
        .select(col("vid_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames"), col("declared_frames"), col("micros_per_frame"),
          col("duration_ms"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy(col("vid_id"), col("frame_idx"))
    },

    // SORTED-NEIGHBORHOOD near-dup pairs (Hernández-Stolfo SNM): the
    // third candidate-generation family beside hash banding and embedding
    // buckets — corpus ordered by the canonical-prefix key, every pair
    // within w=10 positions verified by exact shingle Jaccard. Global
    // positions via the two-level bucket construction, never a global
    // window
    "q187_snm_pairs" -> ((s, d) =>
      DedupOps.sortedNeighborhoodPairs(t(s, d, "documents"),
          w = 10, minJaccard = 0.1)
        .orderBy(col("a"), col("b"))),

    // the FIXED-QUERY-BUDGET partial-probe ANN serving shape — what the
    // 100x probe showed the corpus-proportional audits (q108/q109) are
    // not: queries = a ~50-doc md5 sample auto-sized at every SF (the
    // q165 rule), probes 2 of 8 lattice cells from the persisted index,
    // so cost stays ~|queries| x occupancy x nProbe/nCells — linear in
    // the corpus, flat in the query set — and the lattice quantizer keeps
    // even the partial probe oracle-replayable
    "q186_ivfpq_probe_scaled" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfPqIndex(emb, "graft_q186_ivfpq",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8, coarse = "lattice")
      val k = math.max(1L, emb.count() / 50L)
      val queries = emb.filter(pmod(DetHash.md5Hash60(
        concat(lit("annq|"), col("vec_id").cast("string"))), lit(k)) === 0)
      SimilarityOps.ivfPqTopKPersisted(queries, "graft_q186_ivfpq",
          k = 10, nProbe = 2)
        .orderBy(col("query_id"), col("rank"))
    },

    // CANONICAL near-exact dedup: ASCII casefold + punctuation-to-space +
    // whitespace collapse, then the q18 digest kernel. The corpus has no
    // case/punct variants, so the fixture INSTRUMENTS it: every doc gains
    // a perturbed twin (recased or double-spaced+punctuated, id + 1e12 —
    // far above any ScaleUp replica id, which reaches factor·1e8, so twin
    // ids never collide with genuine replica ids at any tested factor)
    // that raw exact dedup cannot merge and canonical dedup must
    "q185_canonical_dedup" -> { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val pert = docs.select(
        (col("doc_id") + lit(1000000000000L)).as("doc_id"),
        when(col("doc_id") % 2 === 0, upper(col("text")))
          .otherwise(concat(regexp_replace(col("text"), " ", "  "),
            lit(" !!"))).as("text"))
      DedupOps.canonicalDedupSummary(docs.unionByName(pert))
        .filter(col("copies") > 1)
        .orderBy(col("keep_id"))
    },

    // SCD2 dimension history from the event change stream: per user the
    // event_type state's validity intervals — versions in (ts, id) order,
    // consecutive no-op changes suppressed, half-open [from, to),
    // NULL to = current. The history half of the CDC family (upsert keeps
    // latest; this keeps every interval)
    "q176_scd2_history" -> ((s, d) =>
      EventOps.scd2FromChanges(t(s, d, "events"))
        .orderBy(col("user_id"), col("version"))),

    // AS-OF facts against that history: every 'view' event joined to the
    // non-view state valid AT ITS OWN TIMESTAMP (union-then-scan, never a
    // range join), rolled up per state; views before any state surface in
    // the NULL row — the coverage contract
    "q177_scd2_asof" -> { (s, d) =>
      val ev = t(s, d, "events")
      val dim = EventOps.scd2FromChanges(ev.filter(col("event_type") =!= "view"))
      EventOps.scd2AsofJoin(ev.filter(col("event_type") === "view"), dim)
        .groupBy(col("attr"))
        .agg(count(lit(1)).as("n_views"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("attr").asc_nulls_last)
    },

    // corpus-wide LINE dedup (the C4/RefinedWeb rule: a line occurring ≥ 2
    // times anywhere in the corpus is boilerplate and is struck from EVERY
    // document, first occurrence included). The synthetic corpus has no
    // newlines, so line structure is derived deterministically first:
    // tokens grouped 8 per line, joined by \n — the oracle replays the
    // same derivation
    "q161_line_dedup" -> { (s, d) =>
      val tk = TextOps.tokens(col("text"))
      val lineified = t(s, d, "documents").select(col("doc_id"),
        array_join(transform(
          sequence(lit(0), ((size(tk) + lit(7)) / lit(8)).cast("int") - 1),
          i => array_join(slice(tk, i * lit(8) + 1, lit(8)), " ")),
          "\n").as("text"))
      DedupOps.dedupLines(lineified, minDf = 2).orderBy(col("doc_id"))
    },

    // the per-source DATA CARD a mixture planner reads: volume, length,
    // quality, vocabulary, exact-dup load — one row per source, all exact
    // arithmetic the per-doc tiers already verify
    "q159_corpus_card" -> ((s, d) =>
      TextOps.corpusCard(t(s, d, "documents"))
        .orderBy(col("source").asc_nulls_last)),

    // the ANN TUNING measurement: per sampled query, how many of the true
    // cosine top-10 the LSH index actually surfaced — the number that
    // decides whether nPlanes/nTables are enough BEFORE committing a
    // corpus to an approximate index
    "q158_lsh_recall" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 20)
      // query-subset form: only the 20 sampled queries pay the rerank and
      // per-query window — corpus-proportional work would be ~1000x the
      // audit's need at sf1 (row-identical output for the sampled ids)
      val ann = SimilarityOps.lshTopKForQueries(emb, queries, k = 10,
        nPlanes = 6)
      SimilarityOps.annRecallAudit(emb, queries, ann, k = 10)
        .orderBy(col("query_id"))
    },

    // the DELETE lifecycle in the oracle-checked tier: build the persisted
    // IVF index, tombstone a slice, probe EXHAUSTIVELY (nProbe = nCells, so
    // answers are centroid-independent and the oracle replays them as
    // brute-force cosine over the survivors) — deleted vectors stop
    // matching but remain usable as external queries
    "q156_ivf_delete_probe" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      SimilarityOps.ensureIvfIndex(emb, "graft_q156_ivf",
        corpusTag = corpusTagOf(emb, d),
        nCells = 8)
      SimilarityOps.deleteFromIvfIndex(
        emb.filter(col("vec_id") % 7 === 1).select(col("vec_id")),
        "graft_q156_ivf")
      SimilarityOps.ivfTopKPersisted(emb.filter(col("vec_id") < 5),
          "graft_q156_ivf", k = 10, nProbe = 8)
        .orderBy(col("query_id"), col("rank"))
    },

    // ANN-candidate-fed hard-negative mining, oracle-checked end to end:
    // the RAW LSH bucket-collision frame feeds the kernel directly (the
    // oracle ranks the same raw collision set) — no interposed top-k cap
    // whose adequacy would silently depend on corpus scale
    "q157_hard_negatives_lsh" -> { (s, d) =>
      val emb = t(s, d, "embeddings")
      val cand = SimilarityOps.lshCandidatePairs(emb, nPlanes = 6)
      SimilarityOps.hardNegativesFromCandidates(
          emb, emb.filter(col("vec_id") < 5), cand, k = 10)
        .orderBy(col("query_id"), col("rank"))
    },

    // HEAPS'-LAW vocab growth: distinct token types seen by each tenth of
    // the id-ordered token stream — does-vocabulary-saturate, via per-type
    // first-occurrence positions (two-level prefix sum, one token agg)
    "q144_vocab_growth" -> ((s, d) =>
      TextOps.vocabGrowth(t(s, d, "documents"))),

    // T5 SPAN CORRUPTION (Raffel 2020): hash-chosen spans masked, runs
    // collapse to numbered <Xk> sentinels, input/target built in ONE
    // map-side fold — the denoising objective as a pure per-row function
    "q145_span_corrupt" -> ((s, d) =>
      TextOps.spanCorrupt(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // SPLIT-LEAKAGE audit: near-dup pairs rolled up by unordered
    // train/val/test split pair — off-diagonal cells are eval leakage
    // (hash splitting can't stop near-dups landing on both sides)
    "q134_split_leakage" -> ((s, d) =>
      // split ids widened to the oracle's BIGINT (see q22's note)
      DedupOps.splitLeakageAudit(t(s, d, "documents"))
        .withColumn("split_x", col("split_x").cast("long"))
        .withColumn("split_y", col("split_y").cast("long"))),

    // source CENTROID matrix: pairwise L2 between per-source mean
    // embeddings on the shared lattice — mirror/scrape detection at
    // embedding level, everything pairwise on a model-sized frame
    "q133_source_centroids" -> ((s, d) =>
      SimilarityOps.sourceCentroidMatrix(t(s, d, "embeddings"),
        t(s, d, "documents"))),

    // CLUSTER-BALANCED budget sampling (DataComp-style): equal per-cell
    // quotas over the lattice-KMeans partition, quality-ranked within
    // each cell — topical coverage a quality-only top-k would collapse
    "q132_cluster_sample" -> ((s, d) =>
      SimilarityOps.clusterBalancedSample(t(s, d, "embeddings"),
        t(s, d, "documents"), budget = 200L, nCells = 8)),

    // CCNet perplexity TERCILES (Wenzek 2020): per source, head/middle/
    // tail thirds by bigram-LM average log-prob — cuts from a centi-nat
    // VALUE histogram (score-range-bounded window, never a per-source
    // sort of all docs)
    "q131_perplexity_buckets" -> ((s, d) =>
      TextOps.perplexityBuckets(t(s, d, "documents"))),

    // per-SOURCE embedding DIVERSITY: exact mean pairwise dot per source
    // via the sum identity ||Σv||² − Σ||v||² on the shared int8 lattice —
    // semantic-collapse detection with NO pair enumeration, one (source)
    // aggregation over the whole store
    "q130_source_diversity" -> ((s, d) =>
      SimilarityOps.sourceDiversity(t(s, d, "embeddings"),
        t(s, d, "documents"))),

    // SemDeDup (Abbas 2023): cluster-blocked semantic dedup — lattice-
    // KMeans cells route, within-cell exact cosine + keep-farthest-from-
    // centroid (integer L2 key) decide; the survivor set is a total-order
    // fact the oracle replays end to end
    "q127_semdedup" -> ((s, d) =>
      SimilarityOps.semDedup(t(s, d, "embeddings"), nCells = 8,
        minCos = 0.4)),

    // EXACT per-source token-length deciles from a (source, length) value
    // histogram — order statistics without a global sort; truncation
    // cliffs and padding spikes survive where a sketch smears them
    "q126_length_deciles" -> ((s, d) =>
      TextOps.lengthDeciles(t(s, d, "documents"))),

    // WINNOWING fingerprints (Schleimer 2003 / MOSS): per-window rightmost
    // minimum gram hash, the 2/(w+1)-density local sample with the shared-
    // run guarantee — corpus fingerprinting at a fraction of shingle cost
    "q124_winnow" -> ((s, d) =>
      DedupOps.winnowFingerprints(t(s, d, "documents"),
        shingleK = 3, window = 4)),

    // MOSS matching: doc pairs sharing >= 2 winnowing fingerprints after
    // the hot-hash df cap — the plagiarism/mirror detector at
    // fingerprint cost
    "q125_winnow_pairs" -> ((s, d) =>
      DedupOps.winnowOverlapPairs(t(s, d, "documents"),
        shingleK = 3, window = 4, minShared = 2L)),

    // BOILERPLATE-PREFIX audit: per source the top-3 most frequent 8-token
    // document prefixes with doc share — the template-spam detector
    "q123_boilerplate" -> ((s, d) =>
      TextOps.boilerplatePrefixes(t(s, d, "documents"),
        prefixK = 8, topM = 3)),

    // tokenizer VOCAB-COVERAGE curve: per (source, candidate vocab size V)
    // the fraction of token occurrences the global top-V vocabulary
    // covers — the closed-vocab sizing audit and per-source OOV predictor
    "q122_vocab_coverage" -> ((s, d) =>
      TextOps.vocabCoverage(t(s, d, "documents"),
        vocabSizes = Seq(16, 64, 256))),

    // Unicode SCRIPT-MIX audit: per-doc major-script character counts,
    // alphabetical-first majority, 10%-minority mixed flag — the
    // homoglyph/keyword-stuffing spam signal, entirely map-only
    "q121_script_mix" -> ((s, d) =>
      TextOps.scriptMix(t(s, d, "documents"))),

    // KMV sketch overlap: bottom-k distinct-shingle sketches per source →
    // estimated distinct / union / intersection / Jaccard for every
    // unordered source pair at sketch cost — whole-corpus containment
    // WITHOUT joining the corpora (q118 finds the pairs; this sizes the
    // overlap from nSources·k retained hashes)
    "q120_kmv_overlap" -> ((s, d) =>
      DedupOps.kmvOverlapMatrix(t(s, d, "documents"), k = 64)),

    // the TRAINING-RUN manifest: mixture draw × epoch expansion × global
    // interleave × greedy shards — the whole sampling tier round-tripped
    // in one composed, fully replayed operator
    "q117_training_shards" -> ((s, d) =>
      TextOps.trainingShards(t(s, d, "documents"),
        budgetTokens = 200000L, tokensPerShard = 20000L)),

    // MATRYOSHKA truncation audit: recall@10 of first-16/32-dim cosine
    // rankings vs the full 64-dim ranking — the dimension-axis sibling of
    // q107's PQ recall, exact total orders end to end
    "q116_matryoshka" -> ((s, d) =>
      SimilarityOps.matryoshkaAudit(t(s, d, "embeddings"),
        col("vec_id") % 100 === 7, dims = Seq(16, 32), k = 10)),

    // the SHARD manifest: global deterministic order + two-level running
    // token sum → greedy shard intervals (a boundary doc belongs to the
    // shard it starts in); the oracle pays a literal global window
    "q115_shard_plan" -> ((s, d) =>
      TextOps.shardPlan(t(s, d, "documents"), tokensPerShard = 2000L)),

    // per-SOURCE token-distribution drift: chi-square of each source's
    // hashed-bucket token histogram against the corpus mix, micro-quantized
    // per bucket BEFORE the per-source integer sum — the data-side sibling
    // of the IVF drift report, and the retrain/resample trigger for
    // source-conditioned pipelines
    "q110_source_drift" -> ((s, d) =>
      TextOps.sourceTokenDrift(t(s, d, "documents"), nBuckets = 64)),

    // the corpus DATASHEET: doc/dedup/token tallies at every (source, lang)
    // granularity in ONE cube pass — '<all>' rows via grouping() flags, so
    // real nulls could never be confused with the rollup totals
    "q95_corpus_datasheet" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val base = docs.select(col("source"), col("lang"),
        md5(col("text")).as("digest"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_toks"),
        col("n_chars"))
      base.cube(col("source"), col("lang"))
        .agg(grouping(col("source")).as("gs"), grouping(col("lang")).as("gl"),
          count(lit(1)).as("n_docs"),
          countDistinct(col("digest")).as("n_unique"),
          sum(col("n_toks")).as("n_tokens"),
          (sum(col("n_toks")).cast("double") / count(lit(1))).as("avg_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        .select(
          when(col("gs") === 1, lit("<all>")).otherwise(col("source")).as("source"),
          when(col("gl") === 1, lit("<all>")).otherwise(col("lang")).as("lang"),
          col("n_docs"), col("n_unique"), col("n_tokens"),
          col("avg_tokens"), col("sum_chars"))
        // explicit null placement on BOTH sides (Spark defaults nulls
        // first, DuckDB nulls last): a corpus with real NULL source/lang
        // would otherwise reorder rows and break the hash compare even
        // though the grouping()-flagged values agree
        .orderBy(col("source").asc_nulls_last, col("lang").asc_nulls_last)
    },

    // seeded corpus shuffle: every doc's global position in the
    // (md5(salt|id), id) total order — computed bucket-parallel, verified
    // against the oracle's literal global row_number
    "q94_deterministic_shuffle" -> ((s, d) =>
      RelationalOps.deterministicShuffle(t(s, d, "documents"), "doc_id")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy(col("shuffle_pos"))),

    // deterministic 80/10/10 hash split: per-split counts + id checksum so
    // the oracle verifies the ASSIGNMENT, not just the sizes
    "q42_hash_split" -> ((s, d) =>
      RelationalOps.hashSplit(t(s, d, "documents"), "doc_id", Seq(0.8, 0.1, 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("split"))),

    // tokenizer-style vocabulary: top-200 terms by corpus frequency with
    // dense reproducible ids (freq desc, term asc tiebreak)
    "q43_vocab" -> ((s, d) =>
      TextOps.buildVocab(t(s, d, "documents"), size = 200)
        .orderBy(col("term_id"))),

    // heavy hitters via the Misra-Gries UDAF: output = EXACT tokens above
    // support n/64, each flagged 'ok' iff present in the m=255 sketch — the
    // MG containment theorem (error ≤ n/256 < support) makes the flags
    // deterministic even though sketch internals vary with merge order
    // corpus length-distribution audit: the histogram behind min/max-length
    // filter decisions (what would a 50-token floor drop, and how much)
    "q68_length_histogram" -> ((s, d) =>
      TextOps.lengthHistogram(t(s, d, "documents"), bucketWidth = 10)),

    // exact grouped median WITHOUT global sort: value-histogram + cumulative
    // counts (the exact counterpart of the q39/q62 GK sketches)
    "q69_exact_median" -> ((s, d) =>
      RelationalOps.exactMedianByGroup(t(s, d, "lineitem"),
          "l_returnflag", "l_quantity")
        .orderBy(col("l_returnflag"))),

    "q67_heavy_hitters" -> { (s, d) =>
      val toks = t(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
      val sketch = toks.agg(
        graft.functions.MisraGries.mgSketch(255)(col("tok")).as("sk"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val total = exact.agg(sum(col("freq")).as("n_toks"))
      exact.join(broadcast(total)).filter(col("freq") * 64 > col("n_toks"))
        .join(broadcast(sketch))
        .select(col("tok"), col("freq"),
          when(map_contains_key(col("sk"), col("tok")), lit("ok"))
            .otherwise(lit("miss")).as("mg_contains"))
        .orderBy(col("freq").desc, col("tok"))
    },

    // corpus encoding against that vocabulary: (doc, pos, term, id), OOV=-1
    "q44_encode_tokens" -> { (s, d) =>
      val docs = t(s, d, "documents")
      TextOps.encodeTokens(docs, TextOps.buildVocab(docs, size = 200))
        .orderBy(col("doc_id"), col("pos"))
    },

    // Gopher-style repetition filters: top-token share + duplicate-bigram
    // fraction per document (boilerplate detectors)
    "q45_repetition" -> ((s, d) =>
      TextOps.repetitionStats(t(s, d, "documents")).orderBy(col("doc_id"))),

    // concat-and-chunk sequence packing into 512-token blocks; per-block
    // doc span + token count (= 512 everywhere but the tail)
    "q46_pack_sequences" -> ((s, d) =>
      TextOps.packSequences(t(s, d, "documents"), capacity = 512)
        .orderBy(col("block"))),

    // deterministic per-language sampling rates (the data-mixing op):
    // en 50%, zh 25%, de 10%, everything else 5% — same md5-bucket
    // contract as q42, so the sampled SET is oracle-checkable
    "q48_stratified_sample" -> ((s, d) =>
      RelationalOps.hashStratifiedSample(t(s, d, "documents"), "doc_id", "lang",
          Map("en" -> 5000, "zh" -> 2500, "de" -> 1000), defaultBp = 500)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))),

    // mergeable-sketch quantiles with a DISTRIBUTED rank-error check: the
    // sketch (GK, accuracy 10000 → rank error <= 1e-4) returns one value per
    // percentile; its TRUE rank is then recomputed with plain count-filters
    // and compared to the target — the checkable contract, like q33's HLL
    // error bound. No global sort anywhere.
    "q39_approx_quantiles" -> { (s, d) =>
      val v = t(s, d, "lineitem").select(col("l_extendedprice").as("v"))
      val ps = Seq(0.5, 0.9, 0.99)
      val sk = v.agg(
        percentile_approx(col("v"), typedlit(ps), lit(10000)).as("q"),
        count(lit(1)).as("n"))
      val rankAggs = ps.indices.map(i =>
        sum(when(col("v") <= element_at(col("q"), i + 1), 1L).otherwise(0L))
          .as(s"r$i"))
      val ranks = v.crossJoin(broadcast(sk))
        .groupBy(col("n"), col("q"))
        .agg(rankAggs.head, rankAggs.tail: _*)
      ranks.select(col("n") +: ps.zipWithIndex.map { case (p, i) =>
        // 0.01 slack over the 1e-4 sketch bound absorbs tie mass at the
        // returned value (rank jumps by the duplicate count)
        when(abs(col(s"r$i").cast("double") / col("n") - p) <= 0.01, lit("ok"))
          .otherwise(lit("off")).as(s"p${(p * 100).toInt}_rank_ok")
      }: _*)
    },

    // ---- LLM-data-pipeline tier: events ----
    "q27_events_tumbling" -> ((s, d) =>
      EventOps.tumbling(t(s, d, "events"))
        .orderBy(col("window_start"), col("event_type"))),

    "q28_events_sliding" -> ((s, d) =>
      EventOps.sliding(t(s, d, "events"))
        .orderBy(col("window_start"), col("event_type"))),

    "q29_sessionization" -> ((s, d) =>
      EventOps.sessionSummary(t(s, d, "events")).orderBy(col("user_id"))),

    // as-of join: every error matched to the user's most recent prior click
    // via union + per-user ordered scan (no range-join expansion); ts
    // surfaced as unix micros so the compare is integer-exact
    "q47_asof_join" -> ((s, d) =>
      EventOps.asofJoin(t(s, d, "events"), "error", "click")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("prior_id"), col("gap_us"))
        .orderBy(col("event_id"))),

    // rollup (grouping sets): per (event_type, hour) + per event_type +
    // grand total in one pass, disambiguated by grouping_id
    "q49_rollup_events" -> { (s, d) =>
      val e = t(s, d, "events").select(col("event_type"),
        date_trunc("hour", col("ts")).as("h"), col("value"))
      e.rollup(col("event_type"), col("h"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          RelationalOps.decSum(col("value")).as("sum_value"))
        .select(coalesce(col("event_type"), lit("__all__")).as("event_type"),
          coalesce(col("h"), lit("1970-01-01 00:00:00").cast("timestamp")).as("h"),
          col("gid"), col("n"), col("sum_value"))
        .orderBy(col("gid").desc, col("event_type"), col("h"))
    },

    // semi-structured: JSON payload column → typed field → aggregation
    "q34_props_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          countDistinct(col("k")).as("n_distinct_k"))
        .orderBy(col("event_type"))),

    // ---- round-5 additions ----

    // PII redaction / term masking: regex scrub + match count, map-only
    // (the two vocabulary words make the effect visible on synthetic text;
    // the email/IPv4/card patterns are the real PII shapes)
    "q50_mask_pii" -> ((s, d) =>
      TextOps.maskText(t(s, d, "documents"), TextOps.defaultMaskPatterns)
        .orderBy(col("doc_id"))),

    // n-gram LM first step: top-25 corpus bigrams (count desc, bigram asc)
    "q51_bigrams" -> ((s, d) =>
      TextOps.bigramCounts(t(s, d, "documents"), k = 25)),

    // inter-event gaps via lag over a per-user window
    "q52_event_gaps" -> ((s, d) =>
      EventOps.gapSummary(t(s, d, "events")).orderBy(col("user_id"))),

    // cube (all grouping sets over 2 dims) + grouping flags
    "q53_cube_events" -> { (s, d) =>
      val e = t(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
      e.cube(col("event_type"), col("day"))
        .agg(grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("day")).cast("int").as("g_day"),
          count(lit(1)).as("n"), RelationalOps.decSum(col("value")).as("sum_value"))
        .select(coalesce(col("event_type"), lit("__all__")).as("event_type"),
          coalesce(col("day"), lit("1970-01-01").cast("date")).as("day"),
          col("g_type"), col("g_day"), col("n"), col("sum_value"))
        .orderBy(col("g_type"), col("g_day"), col("event_type"), col("day"))
    },

    // set operations: EXCEPT / INTERSECT over per-language vocabularies
    "q54_token_setops" -> { (s, d) =>
      val docs = t(s, d, "documents")
      def vocabOf(lang: String) = docs.filter(col("lang") === lang)
        .select(explode(TextOps.tokens(col("text"))).as("token")).distinct()
      vocabOf("en").except(vocabOf("de")).withColumn("op", lit("en_minus_de"))
        .unionByName(
          vocabOf("en").intersect(vocabOf("zh")).withColumn("op", lit("en_and_zh")))
        .orderBy(col("op"), col("token"))
    },

    // quantile quality filter: keep each language's top half by quality
    // score (percent_rank within the lang partition, deterministic ties)
    "q55_quality_filter" -> ((s, d) =>
      TextOps.qualityFilter(t(s, d, "documents"), keepFrac = 0.5)
        .orderBy(col("doc_id"))),

    // SQL front-end surface: the SAME SQL text runs through spark.sql on
    // registered views and through DuckDB as the oracle (TPC-H Q5 shape —
    // 6-table join, selective date/region filters, Catalyst picks
    // broadcasts + join order)
    "q56_sql_q5" -> { (s, d) =>
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(tpchQ5Sql)
    },

    // LEFT OUTER join: per-customer order count INCLUDING the zero-order
    // customers the reference's inner-join-only surface would drop
    "q57_left_join_counts" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"))
        .join(t(s, d, "orders").select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))),

    // ANTI join: the customers with no orders at all (count + id checksum
    // so the oracle verifies the SET, not just its size)
    "q58_never_ordered" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"))
        .join(t(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers"), sum(col("c_custkey")).as("sum_ids"))),

    // n-gram LM novelty proxy: fraction of each doc's bigrams that are
    // corpus hapax legomena (integer-exact — no log-prob ulp hazards)
    "q59_novelty" -> ((s, d) =>
      TextOps.hapaxFraction(t(s, d, "documents")).orderBy(col("doc_id"))),

    // rolling anomaly detection: hourly counts vs the trailing 24h mean,
    // integer cross-multiplied spike test
    "q60_anomaly" -> ((s, d) =>
      EventOps.hourlyAnomalies(t(s, d, "events"))
        .orderBy(col("event_type"), col("h"))),

    // interval join (equi on user + time-range condition): per error, how
    // many of the SAME user's clicks landed in the preceding 30 minutes —
    // the batch face of StreamingEvents.intervalJoined (same expressions)
    "q61_interval_join" -> { (s, d) =>
      val ev = t(s, d, "events")
      graft.streaming.StreamingEvents.intervalJoined(
          ev.filter(col("event_type") === "error"),
          ev.filter(col("event_type") === "click"), lookbackMinutes = 30)
        .groupBy(col("l_id"))
        .agg(count(lit(1)).as("n_clicks"))
        .select(col("l_id").as("event_id"), col("n_clicks"))
        .orderBy(col("event_id"))
    },

    // grouped sketch quantiles with the q39 rank-error contract, one sketch
    // per event_type (mergeable map-side; the ok/off flags are the
    // oracle-checkable fact, insulating the compare from sketch internals)
    "q62_grouped_quantiles" -> { (s, d) =>
      val v = t(s, d, "events").select(col("event_type"), col("value").as("v"))
      val ps = Seq(0.5, 0.9)
      val sk = v.groupBy(col("event_type")).agg(
        percentile_approx(col("v"), typedlit(ps), lit(10000)).as("q"),
        count(lit(1)).as("n"))
      val rankAggs = ps.indices.map(i =>
        sum(when(col("v") <= element_at(col("q"), i + 1), 1L).otherwise(0L))
          .as(s"r$i"))
      v.join(broadcast(sk), Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("q"))
        .agg(rankAggs.head, rankAggs.tail: _*)
        .select(col("event_type") +: col("n") +: ps.zipWithIndex.map { case (p, i) =>
          when(abs(col(s"r$i").cast("double") / col("n") - p) <= 0.01, lit("ok"))
            .otherwise(lit("off")).as(s"p${(p * 100).toInt}_rank_ok")
        }: _*)
        .orderBy(col("event_type"))
    },

    // sessionized funnel: per user, sessions where a click precedes a
    // purchase (conversion) — sessionization + conditional aggs, no joins
    "q63_funnel" -> ((s, d) =>
      EventOps.funnelSummary(t(s, d, "events")).orderBy(col("user_id"))),

    // ---- round-6 additions ----

    // dynamic PIVOT with a SUM measure (q05's crosstab pivots counts):
    // order totals per status × priority; pinned value list → stable
    // schema, one hash aggregation (no per-value scans)
    "q70_pivot_totals" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderstatus"),
          concat(lit("p"), substring(col("o_orderpriority"), 1, 1)).as("prio"),
          col("o_totalprice"))
        .groupBy(col("o_orderstatus"))
        .pivot("prio", Seq("p1", "p2", "p3", "p4", "p5"))
        .agg(RelationalOps.decSum(col("o_totalprice")))
        .orderBy(col("o_orderstatus"))),

    // UNPIVOT (melt): three measure columns to (measure, val) rows, then
    // per-measure stats — wide-to-long is a projection+explode, no shuffle
    // until the aggregation
    "q71_unpivot_measures" -> ((s, d) =>
      t(s, d, "lineitem")
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), RelationalOps.decSum(col("val")).as("sum_val"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .orderBy(col("measure"))),

    // explicit GROUPING SETS (rollup q49 / cube q53 complete the family):
    // the SAME SQL text runs through spark.sql and the DuckDB oracle
    "q72_grouping_sets" -> { (s, d) =>
      t(s, d, "events").createOrReplaceTempView("events")
      s.sql(groupingSetsSql)
    },

    // sliding-window document chunking (the other half of q46's packing):
    // 64-token chunks overlapping by 8, map-only explode+slice
    "q73_chunk_docs" -> ((s, d) =>
      TextOps.chunkDocs(t(s, d, "documents"), chunkTokens = 64, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // mixture sampling to exact per-language TARGET COUNTS (q48 samples by
    // rate): md5-rank per stratum, keep the first N — counts + id checksum
    // verify the selected SET
    "q74_mixture_sample" -> ((s, d) =>
      RelationalOps.hashRankSample(t(s, d, "documents"), "doc_id", "lang",
          Map("en" -> 120L, "de" -> 40L, "zh" -> 15L))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))),

    // Z-order (Morton) curve cells over (user, value-bucket): the 2-D
    // data-skipping layout's curve arithmetic, verified bit-for-bit —
    // each cell's tight min/max span on BOTH dimensions is what makes
    // file-level pruning work on either predicate (see ZOrderSpec for the
    // file-layout assertion)
    "q75_zorder_cells" -> { (s, d) =>
      val e = t(s, d, "events").select(
        pmod(col("user_id"), lit(1024L)).as("u"),
        floor(col("value")).cast("long").as("vb"))
      e.select(col("u"), col("vb"),
          graft.sources.ZOrder.zValue(col("u"), col("vb"), 10).as("z"))
        .groupBy(shiftright(col("z"), 12).as("cell"))
        .agg(count(lit(1)).as("n"),
          min(col("u")).as("min_u"), max(col("u")).as("max_u"),
          min(col("vb")).as("min_vb"), max(col("vb")).as("max_vb"))
        .orderBy(col("cell"))
    },

    // Bloom-pruned join (the runtime-filter pattern, built explicitly):
    // fact rows miss-test against a broadcast 2KB bloom of the filtered
    // dim's keys BEFORE the join shuffle; false positives die in the exact
    // join, so the result is identical to the plain join the oracle runs
    "q76_bloom_join" -> { (s, d) =>
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val fact = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"))
      RelationalOps.bloomPrunedJoin(fact, dim, "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          RelationalOps.decSum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },

    // BM25 retrieval scoring against a fixed query (ratio idf — see
    // TextOps.bm25 doc for the cross-engine bit-stability reasoning)
    "q77_bm25" -> ((s, d) =>
      TextOps.bm25(t(s, d, "documents"), Seq("spark", "join", "fast"))
        .orderBy(col("doc_id"))),

    // SCD Type-2 merge (the MERGE INTO pattern): one batch of segment
    // changes against a versioned customer dimension — changed keys close
    // their open row and append a new version, same-value updates no-op
    "q78_scd2_merge" -> { (s, d) =>
      val cust = t(s, d, "customer")
      val current = cust.select(col("c_custkey"), col("c_mktsegment"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val changed = cust.filter(col("c_custkey") % 10 === 3)
        .select(col("c_custkey"),
          concat(lit("MOVED_"), col("c_mktsegment")).as("c_mktsegment"),
          lit(100L).as("ts"))
      val noop = cust.filter(col("c_custkey") % 10 === 7)
        .select(col("c_custkey"), col("c_mktsegment"), lit(100L).as("ts"))
      MergeOps.scd2Merge(current, changed.unionByName(noop),
          "c_custkey", Seq("c_mktsegment"))
        .orderBy(col("c_custkey"), col("valid_from"))
    },

    // fixed-point integer PageRank (bit-deterministic — float PageRank has
    // no defined summation order) over the customer↔supplier trade graph:
    // top-20 suppliers by centrality after 3 unrolled rounds, reproduced
    // EXACTLY by the oracle's unrolled SQL iterations
    "q79_pagerank" -> { (s, d) =>
      val off = 1000000000L
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      // the trade-pair build (join + distinct) feeds BOTH the edge list and
      // the vertex list — register it so the two unions read one
      // materialization instead of re-running lineitem⋈orders twice
      val cs = ops.CacheScope.default.register(
        li.join(o, Seq("l_orderkey"))
          .select(col("o_custkey").as("c"), (col("l_suppkey") + off).as("sv"))
          .distinct())
      val edges = cs.select(col("c").as("src"), col("sv").as("dst"))
        .unionByName(cs.select(col("sv").as("src"), col("c").as("dst")))
      val verts = cs.select(col("c").as("id"))
        .unionByName(cs.select(col("sv").as("id"))).distinct()
      GraphOps.pageRankInt(edges, verts, iterations = 3)
        .filter(col("id") > off)
        .orderBy(col("rank").desc, col("id").asc).limit(20)
        .select((col("id") - off).as("s_suppkey"), col("rank"))
    },

    // per-language top-10 terms (the per-group vocabulary shape; q43 is the
    // global one) — rank window partitioned by lang, never a global sort
    "q80_lang_top_terms" -> { (s, d) =>
      val toks = t(s, d, "documents").select(col("lang"),
        explode(TextOps.tokens(col("text"))).as("term"))
      val counts = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      RelationalOps.topKPerGroup(counts, Seq("lang"),
          Seq(col("cnt").desc, col("term").asc), 10)
        .select(col("lang"), col("term"), col("cnt"), col("rn").as("rank"))
        .orderBy(col("lang"), col("rank"))
    },

    // the FLAGSHIP COMPOSITION: the full corpus-preparation pipeline —
    // per-language quality filter (keep top half) → exact dedup (min-id
    // winner per content digest) → transitive near-dup dedup (MinHash
    // verified pairs at J≥0.8 → clusters → keep representatives) → chunk
    // the survivors into 64-token training windows. One row of per-stage
    // retention counts; every stage is the already-verified operator
    "q81_corpus_prep" -> { (s, d) =>
      val docs = t(s, d, "documents")
      // each stage feeds the next AND its own count — register the shared
      // frames so the five stage-counts read caches instead of re-running
      // the stage pyramid (kept alone is consumed 4x downstream)
      val reg = (df: DataFrame) => ops.CacheScope.default.register(df)
      val kept = reg(docs.join(
        TextOps.qualityFilter(docs, keepFrac = 0.5).select(col("doc_id")),
        Seq("doc_id")))
      val exact = reg(DedupOps.exactDedup(kept))
      val clusters = DedupOps.nearDupClusters(exact)
      val near = reg(exact.join(
        clusters.filter(col("comp") === col("doc_id")).select(col("doc_id")),
        Seq("doc_id")))
      val chunks = TextOps.chunkDocs(near)
      // ONE aggregation job for all five stage counts: tag each stage's
      // rows with its name, union, conditional-count — the cached frames
      // are each scanned once and the five crossJoined 1-row aggs collapse
      // into a single action
      val stages = Seq("n_raw" -> docs, "n_quality" -> kept,
        "n_exact" -> exact, "n_neardup" -> near, "n_chunks" -> chunks)
      val tagged = stages.map { case (nm, df) => df.select(lit(nm).as("st")) }
        .reduce(_ unionByName _)
      val aggs = stages.map { case (nm, _) =>
        count(when(col("st") === nm, 1)).as(nm) }
      tagged.agg(aggs.head, aggs.tail: _*)
    },

    // cross-doc boilerplate: fraction of each doc's distinct shingles that
    // appear in another document (crawl chrome/license detection) — two
    // integer-keyed aggregations, no pair joins, linear under duplication
    "q82_boilerplate" -> ((s, d) =>
      DedupOps.boilerplateReport(t(s, d, "documents"))
        .orderBy(col("doc_id"))),

    // LEFT SEMI join (existence, no multiplicity): customers holding at
    // least one urgent order — completes the join family with q57/q58
    "q83_semi_join" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"), col("c_mktsegment"))
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), sum(col("c_custkey")).as("sum_ids"))
        .orderBy(col("c_mktsegment"))),

    // int8 embedding quantization (floor semantics — oracle-exact): the
    // 4x compression step before ANN indexing, audited per vector
    "q84_quantize_int8" -> ((s, d) =>
      SimilarityOps.quantizeInt8(t(s, d, "embeddings"))
        .orderBy(col("vec_id"))),

    // time-series resampling: the complete hourly grid per event type,
    // gaps zero-filled — missing hours are zero observations, not absent
    // rows (what every trailing-window computation needs downstream)
    "q86_gap_fill" -> ((s, d) =>
      EventOps.hourlyGapFill(t(s, d, "events"))
        .orderBy(col("h"), col("event_type"))),

    // join-key skew profile (rows-per-user distribution): the exact facts
    // behind a salt/AQE-skew decision, computed over the count HISTOGRAM
    "q87_skew_profile" -> ((s, d) =>
      RelationalOps.skewProfile(t(s, d, "events"), "user_id")),

    // semantic-cluster topic labels: clusters come from the EMBEDDING tier
    // (q64's bounded mutual-kNN components — the re-pointed scale-safe
    // graph), labels from the TEXT tier (top-3 terms by count inside each
    // non-singleton cluster) — the cross-tier composition that names what
    // semantic dedup is about to collapse
    "q88_cluster_topics" -> { (s, d) =>
      val clusters = SimilarityOps
        .semanticDupClustersBounded(t(s, d, "embeddings"), 0.4)
        .select(col("vec_id").as("doc_id"), col("comp"))
      val sizes = clusters.groupBy(col("comp")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
      val toks = t(s, d, "documents")
        .join(clusters, Seq("doc_id"))
        .join(broadcast(sizes), Seq("comp"))
        .select(col("comp"), col("n_docs"),
          explode(TextOps.tokens(col("text"))).as("term"))
      val counts = toks.groupBy(col("comp"), col("n_docs"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      RelationalOps.topKPerGroup(counts, Seq("comp"),
          Seq(col("cnt").desc, col("term").asc), 3)
        .select(col("comp").as("cluster_id"), col("n_docs"), col("term"),
          col("cnt"), col("rn").as("rank"))
        .orderBy(col("cluster_id"), col("rank"))
    },

    // FULL OUTER join (completes the join family with q57/q58/q83):
    // reconcile per-day click vs purchase volumes — days with only one
    // side survive with the other side null-coalesced to zero
    "q85_full_outer" -> { (s, d) =>
      val ev = t(s, d, "events")
      def daily(tpe: String, n: String) = ev.filter(col("event_type") === tpe)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as(n))
      daily("click", "n_clicks")
        .join(daily("purchase", "n_purchases"), Seq("day"), "full_outer")
        .na.fill(0L, Seq("n_clicks", "n_purchases"))
        .orderBy(col("day"))
    })

  /** TPC-H Q5 shape in the ANSI subset both Spark SQL and DuckDB parse
    * identically (shared verbatim by q56's query and oracle). Revenue uses
    * the decimal-exact sum convention so the double compare is bit-stable.
    */
  private val tpchQ5Sql: String =
    s"""SELECT n_name,
       |  ${sqlDecSum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  count(*) AS n_items
       |FROM customer
       |  JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Explicit GROUPING SETS in the ANSI subset both engines parse
    * identically (shared verbatim by q72's query and oracle): per-type,
    * per-user-mod, and per-(type, user-mod) aggregates in ONE pass over
    * events — Spark expands the sets with a single Expand node feeding one
    * hash aggregation, not three scans.
    */
  private val groupingSetsSql: String =
    s"""WITH e AS (SELECT event_type, user_id % 7 AS user_mod, value FROM events)
       |SELECT coalesce(event_type, '__all__') AS event_type,
       |  coalesce(user_mod, CAST(-1 AS BIGINT)) AS user_mod,
       |  CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       |  CAST(GROUPING(user_mod) AS INTEGER) AS g_mod,
       |  count(*) AS n, ${sqlDecSum("value")} AS sum_value
       |FROM e
       |GROUP BY GROUPING SETS ((event_type), (user_mod), (event_type, user_mod))
       |ORDER BY g_type, g_mod, event_type, user_mod""".stripMargin

  /** CTE chain ending in `pr2(a, b)`: SRP-bucketed candidate collisions
    * over embeddings (6 tables × 8 planes, md5-derived planes) verified by
    * exact cosine at `minCos` — mirrors `SimilarityOps.srpNearDupPairs`.
    * The threshold is a parameter so consumers at different operating
    * points (q64/q88 dedup at 0.4, q178's denser census graph at 0.2)
    * share one definition.
    */
  private def srpPairsCte(minCos: Double,
                          vertexFilter: String = "TRUE"): String =
    s"""planes AS (${ops.DetHash.sqlPlanesCte(48, 64)}),
       |e AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE $vertexFilter),
       |proj AS (SELECT p.p // 8 AS tbl, p.p % 8 AS i, e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
       |  FROM e CROSS JOIN planes p),
       |b AS (SELECT tbl, vec_id,
       |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY tbl, vec_id),
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
       |    AND l.vec_id < r.vec_id),
       |pr2 AS (SELECT a, b, cos FROM (
       |    SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
       |    FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
       |  WHERE cos >= $minCos)""".stripMargin

  /** [[srpPairsCte]] at the CORPUS-SIZED operating point (mirrors
    * `SimilarityOps.srpNearDupPairsAuto`): the plane count np is derived
    * from the (filtered) corpus count by the same integer-shift rule the
    * engine's `autoPlanes` applies — smallest p in [minP, maxP] with
    * (n >> p) <= targetOcc — and the STRIDED plane table is masked to
    * `p % stride < np`, so both engines band with byte-identical planes
    * at any corpus size. `MATERIALIZED` on e/np: the plane mask and the
    * count subquery are consumed by every downstream CTE, and DuckDB
    * re-inlining the count per reference re-scans the corpus.
    */
  /** The AUTO-sized STRIDED banding prefix shared by every auto-point
    * oracle: `e` (the filtered corpus), `np` (the plane count by the same
    * integer-shift rule the engine's `autoPlanes` applies), and `b`
    * (tbl, vec_id, bucket). [[srpPairsAutoCte]] appends the candidate +
    * verify tail; q201 rolls occupancy straight off `b`.
    */
  private def srpBandsAutoCte(vertexFilter: String = "TRUE",
                              planeCountSql: Option[String] = None): String = {
    val stride = SimilarityOps.srpPlaneStride
    // the count that SIZES the plane point — by default the banded corpus
    // itself; the persisted-lifecycle oracles pass the count of the BASE
    // corpus the engine froze its operating point on (q200)
    val cnt = planeCountSql.getOrElse("SELECT count(*) FROM e")
    s"""planes AS (${ops.DetHash.sqlPlanesStridedCte(6, 24, stride, 64)}),
       |e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |  WHERE $vertexFilter),
       |np AS MATERIALIZED (SELECT least(24, coalesce(
       |    (SELECT min(p) FROM range(4, 25) t(p)
       |     WHERE (($cnt) >> p) <= 8), 24)) AS np),
       |proj AS (SELECT p.p // $stride AS tbl, p.p % $stride AS i, e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
       |  FROM e CROSS JOIN planes p CROSS JOIN np
       |  WHERE p.p % $stride < np.np),
       |b AS (SELECT tbl, vec_id,
       |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY tbl, vec_id)""".stripMargin
  }

  private def srpPairsAutoCte(minCos: Double,
                              vertexFilter: String = "TRUE",
                              planeCountSql: Option[String] = None): String =
    s"""${srpBandsAutoCte(vertexFilter, planeCountSql)},
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
       |    AND l.vec_id < r.vec_id),
       |pr2 AS (SELECT a, b, cos FROM (
       |    SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
       |    FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
       |  WHERE cos >= $minCos)""".stripMargin

  /** [[srpPairsAutoCte]] with the HOT-BUCKET SPLIT (mirrors
    * `SimilarityOps.srpNearDupPairsSplitAuto`): per (tbl, bucket) cell
    * with occupancy bn > splitOcc, δ = the smallest d ≤ stride − np with
    * `(bn >> d) <= splitOcc` (the per-bucket integer-shift rule — same
    * family as np itself), and the cell's members re-key by the δ
    * extension-plane sign bits (strided plane ids np..np+δ−1). The plane
    * table here spans the FULL stride so every possible extension plane
    * exists; `proj` therefore projects all stride planes per table —
    * oracle-scale cost, the engine computes extensions only for hot
    * members. The `maxBucket` pathology cap is mirrored at the engine's
    * POST-split semantics: cold cells drop past it, split cells drop per
    * over-cap SUB-cell (a cell the cap would have dropped un-split is
    * deliberately rescued when its sub-cells land under it).
    */
  private def srpPairsSplitAutoCte(minCos: Double, splitOcc: Long,
                                   vertexFilter: String = "TRUE",
                                   maxBucket: Long = 10000L): String = {
    val stride = SimilarityOps.srpPlaneStride
    s"""planes AS (${ops.DetHash.sqlPlanesStridedCte(6, stride, stride, 64)}),
       |e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |  WHERE $vertexFilter),
       |np AS MATERIALIZED (SELECT least(24, coalesce(
       |    (SELECT min(p) FROM range(4, 25) t(p)
       |     WHERE ((SELECT count(*) FROM e) >> p) <= 8), 24)) AS np),
       |proj AS MATERIALIZED (SELECT p.p // $stride AS tbl, p.p % $stride AS i, e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
       |  FROM e CROSS JOIN planes p),
       |b AS MATERIALIZED (SELECT tbl, vec_id,
       |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
       |  FROM proj CROSS JOIN np WHERE i < np.np GROUP BY tbl, vec_id),
       |bc AS MATERIALIZED (SELECT tbl, bucket, CAST(count(*) AS BIGINT) AS bn
       |  FROM b GROUP BY 1, 2),
       |bd AS MATERIALIZED (SELECT bc.tbl, bc.bucket, bc.bn,
       |    CASE WHEN bc.bn <= $splitOcc THEN 0
       |      ELSE coalesce((SELECT min(d) FROM range(0, ${stride + 1}) t(d)
       |        WHERE d <= $stride - np.np AND (bc.bn >> d) <= $splitOcc),
       |        $stride - np.np) END AS delta
       |  FROM bc CROSS JOIN np),
       |hotm AS MATERIALIZED (SELECT b.tbl, b.bucket, b.vec_id, bd.delta
       |  FROM b JOIN bd ON bd.tbl = b.tbl AND bd.bucket = b.bucket
       |  WHERE bd.bn > $splitOcc),
       |ext AS MATERIALIZED (SELECT h.tbl, h.bucket, h.vec_id,
       |    sum(CASE WHEN p2.pr >= 0 AND p2.i < np.np + h.delta
       |      THEN (CAST(1 AS BIGINT) << (p2.i - np.np)) ELSE 0 END) AS sub
       |  FROM hotm h JOIN proj p2 ON p2.vec_id = h.vec_id AND p2.tbl = h.tbl
       |  CROSS JOIN np WHERE p2.i >= np.np
       |  GROUP BY h.tbl, h.bucket, h.vec_id),
       |extc AS MATERIALIZED (SELECT tbl, bucket, sub,
       |    CAST(count(*) AS BIGINT) AS bn2
       |  FROM ext GROUP BY 1, 2, 3),
       |b2 AS MATERIALIZED (
       |  SELECT b.tbl, b.bucket, CAST(0 AS BIGINT) AS sub, b.vec_id
       |  FROM b JOIN bd ON bd.tbl = b.tbl AND bd.bucket = b.bucket
       |  WHERE bd.bn <= $splitOcc AND bd.bn <= $maxBucket
       |  UNION ALL
       |  SELECT x.tbl, x.bucket, x.sub, x.vec_id FROM ext x
       |  JOIN extc c ON c.tbl = x.tbl AND c.bucket = x.bucket
       |    AND c.sub = x.sub
       |  WHERE c.bn2 <= $maxBucket),
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM b2 l JOIN b2 r ON l.tbl = r.tbl AND l.bucket = r.bucket
       |    AND l.sub = r.sub AND l.vec_id < r.vec_id),
       |pr2 AS (SELECT a, b, cos FROM (
       |    SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
       |    FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
       |  WHERE cos >= $minCos)""".stripMargin
  }

  /** The SHARD-AND-UNION composition CTE (mirrors
    * `SimilarityOps.srpNearDupPairsSharded`): equal-width id-range shards
    * by the same integer rule ((id − min) · k div span), each shard's
    * plane count derived from ITS row count by the autoPlanes
    * integer-shift rule, buckets masked per shard off the shared strided
    * plane family, candidates keyed by (shard, tbl, bucket) — so a pair
    * collides only within its shard, exactly the engine's recall
    * statement — then the shared exact-cosine verify tail into
    * `pr2(a, b, cos)`.
    */
  private def srpPairsShardedCte(minCos: Double, k: Int,
                                 maxBucket: Long = 10000L): String = {
    val stride = SimilarityOps.srpPlaneStride
    s"""planes AS (${ops.DetHash.sqlPlanesStridedCte(6, 24, stride, 64)}),
       |e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |bounds AS MATERIALIZED (SELECT min(vec_id) AS mn,
       |    max(vec_id) - min(vec_id) + 1 AS span FROM e),
       |sh AS MATERIALIZED (SELECT e.vec_id, e.embedding,
       |    CASE WHEN bo.span <= ${Long.MaxValue} // $k
       |      THEN ((e.vec_id - bo.mn) * $k) // bo.span
       |      ELSE (e.vec_id - bo.mn) // (bo.span // $k +
       |        CASE WHEN bo.span % $k = 0 THEN 0 ELSE 1 END)
       |    END AS shard
       |  FROM e CROSS JOIN bounds bo),
       |np AS MATERIALIZED (SELECT shard, least(24, coalesce(
       |    (SELECT min(p) FROM range(4, 25) t(p) WHERE (n >> p) <= 8),
       |    24)) AS np
       |  FROM (SELECT shard, count(*) AS n FROM sh GROUP BY 1) sc),
       |proj AS (SELECT p.p // $stride AS tbl, p.p % $stride AS i,
       |    s.vec_id, s.shard,
       |    list_sum(list_transform(list_zip(s.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
       |  FROM sh s CROSS JOIN planes p JOIN np ON np.shard = s.shard
       |  WHERE p.p % $stride < np.np),
       |b AS (SELECT shard, tbl, vec_id,
       |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
       |  FROM proj GROUP BY 1, 2, 3),
       |bn AS (SELECT shard, tbl, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM b GROUP BY 1, 2, 3),
       |bk AS (SELECT b.shard, b.tbl, b.bucket, b.vec_id
       |  FROM b JOIN bn ON bn.shard = b.shard AND bn.tbl = b.tbl
       |    AND bn.bucket = b.bucket
       |  WHERE bn.c <= $maxBucket),
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM bk l JOIN bk r ON l.shard = r.shard AND l.tbl = r.tbl
       |    AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |pr2 AS (SELECT a, b, cos FROM (
       |    SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
       |    FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
       |  WHERE cos >= $minCos)""".stripMargin
  }

  /** The FROZEN-LAYOUT split pair CTE — mirrors the persisted kNN
    * lifecycle's banding ([[graft.ops.SimilarityOps.knnGraphFrozen]]):
    * plane count from `planeCountSql` (the ensure corpus's count), split
    * cells (per-bucket δ by the identical integer-shift rule) frozen on
    * the `freezeFilter` subset's occupancy, and EVERY `memberFilter` row
    * — including vectors folded in epochs later or surviving a delete —
    * re-keyed by that frozen layout before the shared candidate + verify
    * tail. No occupancy drop cap: the lifecycle applies none
    * (batch-recompute equality across epochs forbids dropping cells).
    */
  private def srpPairsSplitFrozenCte(minCos: Double, splitOcc: Long,
                                     memberFilter: String = "TRUE",
                                     freezeFilter: String = "TRUE",
                                     planeCountSql: Option[String] = None)
      : String = {
    val stride = SimilarityOps.srpPlaneStride
    val cnt = planeCountSql.getOrElse("SELECT count(*) FROM ef")
    s"""planes AS (${ops.DetHash.sqlPlanesStridedCte(6, stride, stride, 64)}),
       |e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |  WHERE $memberFilter),
       |ef AS MATERIALIZED (SELECT vec_id FROM embeddings
       |  WHERE $freezeFilter),
       |np AS MATERIALIZED (SELECT least(24, coalesce(
       |    (SELECT min(p) FROM range(4, 25) t(p)
       |     WHERE (($cnt) >> p) <= 8), 24)) AS np),
       |proj AS MATERIALIZED (SELECT p.p // $stride AS tbl, p.p % $stride AS i, a.vec_id,
       |    list_sum(list_transform(list_zip(a.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
       |  FROM embeddings a CROSS JOIN planes p),
       |b AS MATERIALIZED (SELECT tbl, vec_id,
       |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
       |  FROM proj CROSS JOIN np WHERE i < np.np GROUP BY tbl, vec_id),
       |bc AS MATERIALIZED (SELECT b.tbl, b.bucket,
       |    CAST(count(*) AS BIGINT) AS bn
       |  FROM b JOIN ef ON ef.vec_id = b.vec_id GROUP BY 1, 2),
       |bd AS MATERIALIZED (SELECT bc.tbl, bc.bucket,
       |    coalesce((SELECT min(d) FROM range(0, ${stride + 1}) t(d)
       |      WHERE d <= $stride - np.np AND (bc.bn >> d) <= $splitOcc),
       |      $stride - np.np) AS delta
       |  FROM bc CROSS JOIN np WHERE bc.bn > $splitOcc),
       |bm AS MATERIALIZED (SELECT b.tbl, b.bucket, b.vec_id
       |  FROM b JOIN e ON e.vec_id = b.vec_id),
       |hotm AS MATERIALIZED (SELECT bm.tbl, bm.bucket, bm.vec_id, bd.delta
       |  FROM bm JOIN bd ON bd.tbl = bm.tbl AND bd.bucket = bm.bucket),
       |ext AS MATERIALIZED (SELECT h.tbl, h.bucket, h.vec_id,
       |    sum(CASE WHEN p2.pr >= 0 AND p2.i < np.np + h.delta
       |      THEN (CAST(1 AS BIGINT) << (p2.i - np.np)) ELSE 0 END) AS sub
       |  FROM hotm h JOIN proj p2 ON p2.vec_id = h.vec_id AND p2.tbl = h.tbl
       |  CROSS JOIN np WHERE p2.i >= np.np
       |  GROUP BY h.tbl, h.bucket, h.vec_id),
       |b2 AS MATERIALIZED (
       |  SELECT bm.tbl, bm.bucket, CAST(0 AS BIGINT) AS sub, bm.vec_id
       |  FROM bm LEFT JOIN bd ON bd.tbl = bm.tbl AND bd.bucket = bm.bucket
       |  WHERE bd.tbl IS NULL
       |  UNION ALL
       |  SELECT tbl, bucket, sub, vec_id FROM ext),
       |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
       |  FROM b2 l JOIN b2 r ON l.tbl = r.tbl AND l.bucket = r.bucket
       |    AND l.sub = r.sub AND l.vec_id < r.vec_id),
       |pr2 AS (SELECT a, b, cos FROM (
       |    SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
       |    FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
       |  WHERE cos >= $minCos)""".stripMargin
  }

  /** An edge CTE `src(a, b)` closed transitively into `cc(x, comp)` by a
    * recursive CTE (comp = component-minimum vec_id, every embedding
    * seeded so singletons appear) — appended after the edge CTEs; callers
    * prepend `WITH RECURSIVE`.
    */
  private def ccTailCteOver(src: String): String =
    s"""ed AS (SELECT a AS x, b AS y FROM $src UNION ALL SELECT b, a FROM $src),
       |reach AS (
       |  SELECT vec_id AS x, vec_id AS comp FROM embeddings
       |  UNION
       |  SELECT ed.x, r.comp FROM ed JOIN reach r ON r.x = ed.y),
       |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x)""".stripMargin

  private val ccTailCte: String = ccTailCteOver("pr2")

  /** One truss-peel round as CTEs: per-edge triangle support of `e\$i`
    * (degree orientation — the q178 shape — then each triangle credits its
    * three edges) and `e\${i+1}` = the edges keeping ≥ `kSup` support
    * (inner join: a no-triangle edge has no support row and drops). With
    * `withNext = false` emits only `sup\$i` — the final recount the
    * output reads.
    */
  private def trussRoundCte(i: Int, kSup: Int, withNext: Boolean): String = {
    val base =
      s"""dg$i AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
         |    (SELECT a AS v FROM e$i UNION ALL SELECT b FROM e$i)
         |  GROUP BY 1),
         |o$i AS MATERIALIZED (SELECT
         |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
         |      THEN u.a ELSE u.b END AS src,
         |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
         |      THEN u.b ELSE u.a END AS dst
         |  FROM e$i u JOIN dg$i da ON da.v = u.a JOIN dg$i db ON db.v = u.b),
         |o2$i AS MATERIALIZED (SELECT o$i.src, o$i.dst, dg$i.dg AS dd FROM o$i
         |  JOIN dg$i ON dg$i.v = o$i.dst),
         |tc$i AS MATERIALIZED (SELECT x.src AS s, x.dst AS v, y.dst AS w FROM o2$i x
         |  JOIN o2$i y ON y.src = x.src
         |    AND ((x.dd < y.dd) OR (x.dd = y.dd AND x.dst < y.dst))
         |  JOIN o$i z ON z.src = x.dst AND z.dst = y.dst),
         |sup$i AS MATERIALIZED (SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM
         |    (SELECT least(s, v) AS a, greatest(s, v) AS b FROM tc$i
         |     UNION ALL SELECT least(s, w), greatest(s, w) FROM tc$i
         |     UNION ALL SELECT least(v, w), greatest(v, w) FROM tc$i)
         |  GROUP BY 1, 2)""".stripMargin
    if (!withNext) base
    else base +
      s""",
         |e${i + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$i e
         |  JOIN sup$i s ON s.a = e.a AND s.b = e.b
         |  WHERE s.support >= $kSup)""".stripMargin
  }

  /** The dedup-effect TAIL shared by q182/q188/q189/q191: consumes an
    * `e0(a, b)` edge CTE, unrolls 4 truss peel rounds to `e4`
    * ([[trussRoundCte]]), closes BOTH edge sets recursively and emits the
    * one-row-per-scheme keep-one summary (mirrors
    * `GraphOps.trussDedupEffect`). Callers prepend `WITH RECURSIVE` and
    * their own `e0` definition.
    */
  private val trussEffectTailCte: String =
    s"""${(0 until 4).map(i => trussRoundCte(i, 1, withNext = true))
        .mkString(",\n")},
       |edc AS (SELECT a AS x, b AS y FROM e0 UNION ALL SELECT b, a FROM e0),
       |vc AS (SELECT DISTINCT x FROM edc),
       |reachc AS (SELECT x, x AS comp FROM vc
       |  UNION SELECT edc.x, r.comp FROM edc JOIN reachc r ON r.x = edc.y),
       |ccc AS (SELECT x, min(comp) AS comp FROM reachc GROUP BY x),
       |szc AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
       |  FROM ccc GROUP BY 1),
       |edt AS (SELECT a AS x, b AS y FROM e4 UNION ALL SELECT b, a FROM e4),
       |vt AS (SELECT DISTINCT x FROM edt),
       |reacht AS (SELECT x, x AS comp FROM vt
       |  UNION SELECT edt.x, r.comp FROM edt JOIN reacht r ON r.x = edt.y),
       |cct AS (SELECT x, min(comp) AS comp FROM reacht GROUP BY x),
       |szt AS (SELECT comp, CAST(count(*) AS BIGINT) AS sz
       |  FROM cct GROUP BY 1),
       |sc AS (SELECT 'closure' AS scheme,
       |    CAST((SELECT count(*) FROM e0) AS BIGINT) AS n_edges,
       |    CAST(count(*) AS BIGINT) AS n_clusters,
       |    CAST(COALESCE(sum(sz), 0) AS BIGINT) AS n_members,
       |    CAST(COALESCE(max(sz), 0) AS BIGINT) AS largest_cluster,
       |    CAST(COALESCE(sum(sz), 0) - count(*) AS BIGINT) AS docs_struck
       |  FROM szc),
       |st AS (SELECT 'truss3' AS scheme,
       |    CAST((SELECT count(*) FROM e4) AS BIGINT) AS n_edges,
       |    CAST(count(*) AS BIGINT) AS n_clusters,
       |    CAST(COALESCE(sum(sz), 0) AS BIGINT) AS n_members,
       |    CAST(COALESCE(max(sz), 0) AS BIGINT) AS largest_cluster,
       |    CAST(COALESCE(sum(sz), 0) - count(*) AS BIGINT) AS docs_struck
       |  FROM szt)
       |SELECT * FROM sc UNION ALL SELECT * FROM st ORDER BY scheme""".stripMargin

  /** Mutual-kNN edge-selection CTEs ending in `e0(a, b)` — mirrors
    * `SimilarityOps.knnGraph` over `pr2(a, b, cos)`: symmetrize, rank per
    * vertex by (cos desc, neighbor id), keep top `kTop`, keep only mutual
    * edges. `extraFilter` optionally restricts the candidate pairs first
    * (the sampled-gate form).
    */
  private def knnEdgesCte(kTop: Int, extraFilter: Option[String] = None): String = {
    val src = extraFilter
      .map(f => s"SELECT a, b, cos FROM pr2 WHERE $f")
      .getOrElse("SELECT a, b, cos FROM pr2")
    s"""prs AS ($src),
       |dirs AS (SELECT a AS v, b AS nb, cos FROM prs
       |  UNION ALL SELECT b, a, cos FROM prs),
       |rkd AS (SELECT v, nb, cos, row_number() OVER (PARTITION BY v
       |    ORDER BY cos DESC, nb) AS rk FROM dirs),
       |kept AS (SELECT v, nb, cos FROM rkd WHERE rk <= $kTop),
       |e0 AS MATERIALIZED (SELECT f.v AS a, f.nb AS b, f.cos AS cos
       |  FROM kept f
       |  JOIN kept g ON g.v = f.nb AND g.nb = f.v
       |  WHERE f.v < f.nb)""".stripMargin
  }

  /** [[srpPairsAutoCte]] at 0.4 + [[ccTailCte]] — mirrors the global
    * closure over `SimilarityOps.srpNearDupPairsAuto(…, 0.4)` edges.
    * Shared by the q192 and q196 oracles; callers prepend
    * `WITH RECURSIVE`.
    */
  private val semanticCcAutoCte: String =
    s"""${srpPairsAutoCte(0.4)},
       |$ccTailCte""".stripMargin

  /** The BOUNDED semantic-cluster closure — [[srpPairsAutoCte]] at 0.4,
    * mutual-kNN edge selection ([[knnEdgesCte]]), then the closure over
    * the bounded edges: mirrors
    * `SimilarityOps.semanticDupClustersBounded(…, 0.4, kTop = 4)`. Shared
    * by the q64 and q88 oracles; callers prepend `WITH RECURSIVE`.
    */
  private val semanticCcBoundedCte: String =
    s"""${srpPairsAutoCte(0.4)},
       |${knnEdgesCte(4)},
       |${ccTailCteOver("e0")}""".stripMargin

  /** SQL for byte `offExpr` (0-based) of a lowercase hex-string column —
    * two nibble lookups via strpos; the fixture oracles' byte accessor.
    */
  /** Little-endian u32 read at byte offset `off` of a hex-string column —
    * the RIFF/BMP size-field reader of the q203 oracle's container walk.
    */
  private def u32leSql(hexCol: String, off: String): String =
    s"(${hexByteSql(hexCol, s"($off)")}" +
      s" + 256 * ${hexByteSql(hexCol, s"($off)+1")}" +
      s" + 65536 * ${hexByteSql(hexCol, s"($off)+2")}" +
      s" + 16777216 * ${hexByteSql(hexCol, s"($off)+3")})"

  private def hexByteSql(hexCol: String, offExpr: String): String =
    s"((strpos('0123456789abcdef', substring($hexCol, 2*($offExpr)+1, 1))-1)*16" +
      s" + strpos('0123456789abcdef', substring($hexCol, 2*($offExpr)+2, 1))-1)"

  /** q164's full bake-off replay (three trainings + fertility tails),
    * parameterized by the SQL predicate applied to the shared `words`
    * CTE (over `words0`, the unfiltered population) — "TRUE" is the
    * full-table q164 form, q193 passes the md5 word-sample.
    */
  private def tokenizerBakeoffSql(wordFilter: String): String = {
      val E = "chr(30)"
      val SS = s"$E||$E"
      val bpeRounds = (1 to 6).map { k =>
        val prev = s"s${k - 1}"
        s"""p$k AS (
           |  SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(syms)),
           |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr
           |    FROM (SELECT freq, string_split(trim(seg, $E), $SS) AS syms FROM $prev)
           |  ) GROUP BY 1, 2),
           |mm$k AS (SELECT lhs, rhs FROM p$k
           |  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
           |s$k AS (SELECT w, freq, replace(seg, $E||m.lhs||$SS||m.rhs||$E,
           |    $E||m.lhs||m.rhs||$E) AS seg FROM $prev CROSS JOIN mm$k m)""".stripMargin
      }.mkString(",\n")
      val wpRounds = (1 to 6).map { k =>
        val prev = if (k == 1) "s0" else s"ws${k - 1}"
        s"""wu$k AS (
           |  SELECT sym, CAST(sum(freq) AS HUGEINT) AS cnt FROM (
           |    SELECT freq, unnest(string_split(trim(seg, $E), $SS)) AS sym FROM $prev)
           |  GROUP BY 1),
           |wp$k AS (
           |  SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(syms)),
           |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr
           |    FROM (SELECT freq, string_split(trim(seg, $E), $SS) AS syms FROM $prev)
           |  ) GROUP BY 1, 2),
           |wm$k AS (SELECT p.lhs, p.rhs,
           |    CAST((CAST(p.pair_count AS HUGEINT) * 1000000000000)
           |      // (ul.cnt * ur.cnt) AS BIGINT) AS score
           |  FROM wp$k p JOIN wu$k ul ON ul.sym = p.lhs JOIN wu$k ur ON ur.sym = p.rhs
           |  ORDER BY score DESC, p.pair_count DESC, p.lhs ASC, p.rhs ASC LIMIT 1),
           |ws$k AS (SELECT w, freq, replace(seg, $E||m.lhs||$SS||m.rhs||$E,
           |    $E||m.lhs||m.rhs||$E) AS seg FROM $prev CROSS JOIN wm$k m)""".stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |${unigramLmCtes(seedSize = 24, maxPieceLen = 4, rounds = 2, wordFilter)},
         |s0 AS (SELECT w, freq,
         |  $SS||array_to_string(list_transform(range(1, len(w)+1), i -> w[i]), $SS)||$SS AS seg
         |  FROM (SELECT w, freq FROM words WHERE w NOT LIKE '%'||$E||'%')),
         |$bpeRounds,
         |$wpRounds,
         |wsrc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT source, unnest($toksSql) AS w FROM documents)
         |  WHERE len(w) > 0 GROUP BY 1, 2),
         |bsyms AS (SELECT w,
         |  CAST(len(string_split(trim(seg, $E), $SS)) AS BIGINT) AS ns FROM s6),
         |wpsyms AS (SELECT w,
         |  CAST(len(string_split(trim(seg, $E), $SS)) AS BIGINT) AS ns FROM ws6),
         |scf AS (SELECT px.w, px.pieces, px.nseg, sum(m.llq) AS score
         |  FROM px JOIN m2 m ON m.piece = px.piece
         |  GROUP BY px.w, px.pieces, px.nseg HAVING count(*) = px.nseg),
         |usyms AS (SELECT w, nseg AS ns FROM (SELECT w, nseg,
         |    row_number() OVER (PARTITION BY w
         |      ORDER BY score DESC, nseg ASC, pieces ASC) AS rn
         |  FROM scf) WHERE rn = 1)
         |SELECT source, n_words, n_symbols, fertility, tokenizer FROM (
         |  SELECT 'bpe' AS tokenizer, source,
         |    CAST(sum(n) AS BIGINT) AS n_words,
         |    CAST(sum(n * ns) AS BIGINT) AS n_symbols,
         |    CAST(sum(n * ns) AS DOUBLE) / sum(n) AS fertility
         |  FROM wsrc JOIN bsyms USING (w) GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'unigram' AS tokenizer, source,
         |    CAST(sum(n) AS BIGINT) AS n_words,
         |    CAST(sum(n * ns) AS BIGINT) AS n_symbols,
         |    CAST(sum(n * ns) AS DOUBLE) / sum(n) AS fertility
         |  FROM wsrc JOIN usyms USING (w) GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'wordpiece' AS tokenizer, source,
         |    CAST(sum(n) AS BIGINT) AS n_words,
         |    CAST(sum(n * ns) AS BIGINT) AS n_symbols,
         |    CAST(sum(n * ns) AS DOUBLE) / sum(n) AS fertility
         |  FROM wsrc JOIN wpsyms USING (w) GROUP BY 1, 2)
         |ORDER BY tokenizer, source""".stripMargin
  }

  /** Per-cluster census tail over an edge CTE `edges(a, b)`: recursive
    * closure (singletons seeded from embeddings), degree/orientation/
    * triangle-corner CTEs, per-component rollup — mirrors
    * `GraphOps.clusterCensus`. Shared by q179 (edges = pr2, the fixed-e
    * graph) and q197 (edges = e0, the mutual-kNN graph); callers prepend
    * `WITH RECURSIVE` and the edge definition.
    */
  private def censusTailCte(edges: String): String =
    s"""ced AS (SELECT a AS x, b AS y FROM $edges
       |  UNION ALL SELECT b, a FROM $edges),
       |reach AS (
       |  SELECT vec_id AS x, vec_id AS comp FROM embeddings
       |  UNION
       |  SELECT ced.x, r.comp FROM ced JOIN reach r ON r.x = ced.y),
       |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x),
       |und AS (SELECT a, b FROM $edges),
       |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
       |    (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY 1),
       |o AS (SELECT
       |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
       |      THEN u.a ELSE u.b END AS src,
       |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
       |      THEN u.b ELSE u.a END AS dst
       |  FROM und u JOIN dg da ON da.v = u.a JOIN dg db ON db.v = u.b),
       |o2 AS (SELECT o.src, o.dst, dg.dg AS dd FROM o
       |  JOIN dg ON dg.v = o.dst),
       |tcorn AS (SELECT x.src AS c1, x.dst AS c2, y.dst AS c3 FROM o2 x
       |  JOIN o2 y ON y.src = x.src
       |    AND ((x.dd < y.dd) OR (x.dd = y.dd AND x.dst < y.dst))
       |  JOIN o z ON z.src = x.dst AND z.dst = y.dst),
       |pt AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM
       |    (SELECT c1 AS v FROM tcorn UNION ALL SELECT c2 FROM tcorn
       |     UNION ALL SELECT c3 FROM tcorn)
       |  GROUP BY 1),
       |perv AS (SELECT dg.v, dg.dg, COALESCE(pt.n_tri, 0) AS n_tri, cc.comp
       |  FROM dg JOIN cc ON cc.x = dg.v LEFT JOIN pt ON pt.v = dg.v),
       |vagg AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_vertices,
       |    CAST(COALESCE(sum(dg * (dg - 1) // 2), 0) AS BIGINT) AS n_wedges,
       |    CAST(sum(n_tri) // 3 AS BIGINT) AS n_triangles
       |  FROM perv GROUP BY comp),
       |eagg AS (SELECT cc.comp, CAST(count(*) AS BIGINT) AS n_edges
       |  FROM und JOIN cc ON cc.x = und.a GROUP BY 1)
       |SELECT v.comp, v.n_vertices, e.n_edges, v.n_triangles,
       |  CAST((1000000 * 2 * e.n_edges) //
       |    (v.n_vertices * (v.n_vertices - 1)) AS BIGINT) AS density_micro,
       |  CAST(CASE WHEN v.n_wedges > 0
       |    THEN (3000000 * v.n_triangles) // v.n_wedges
       |    ELSE 0 END AS BIGINT) AS transitivity_micro
       |FROM vagg v JOIN eagg e ON e.comp = v.comp
       |ORDER BY v.n_vertices DESC, v.comp""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Every query has an oracle — the hash-based ones
    * (q22/q23/q26/q30) derive all randomness from md5 (see
    * [[graft.ops.DetHash]]), so the oracle recomputes identical signatures,
    * buckets and fingerprints in SQL.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${sqlDecSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDecSum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${sqlDecSum("l_quantity")} / count(*) AS avg_qty,
         |  ${sqlDecAvg("l_extendedprice")} AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_join_revenue_by_priority" ->
      s"""SELECT o_orderpriority,
         |  ${sqlDecSum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
         |  count(*) AS n_items
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_distinct_counts" ->
      """SELECT count(DISTINCT l_returnflag) AS n_returnflag,
        |  count(DISTINCT l_linestatus) AS n_linestatus,
        |  count(DISTINCT l_partkey) AS n_partkey,
        |  count(DISTINCT l_suppkey) AS n_suppkey
        |FROM lineitem""".stripMargin,

    "q05_crosstab" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q06_describe" -> {
      def block(c: String) =
        s"""SELECT '$c' AS "column", count($c) AS "count",
           |  ${sqlDecAvg(c)} AS mean, ${sqlDecStd(c)} AS stddev,
           |  min($c) AS "min", max($c) AS "max" FROM lineitem""".stripMargin
      s"""SELECT * FROM (${block("l_discount")} UNION ALL ${block("l_extendedprice")}
         |UNION ALL ${block("l_quantity")}) ORDER BY "column"""".stripMargin
    },

    // min/max render as strings on both sides; all profiled values format
    // identically (whole-number doubles "1.0"/"50.0", ints, strings)
    "q66_profile" -> {
      def block(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_linestatus")
        .map(block).mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
    },

    "q07_replace_priority" ->
      """SELECT CASE o_orderpriority WHEN '1-URGENT' THEN 'URGENT'
        |  WHEN '2-HIGH' THEN 'HIGH' ELSE o_orderpriority END AS o_orderpriority,
        |  count(*) AS "count"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q08_isin_nation" ->
      s"""SELECT n_name, count(*) AS n_customers,
         |  ${sqlDecAvg("c_acctbal")} AS avg_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_1','NATION_7','NATION_23')
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q09_threshold_events" ->
      """SELECT event_type,
        |  CAST(CASE WHEN value >= 100.0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS pred,
        |  count(*) AS "count"
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q10_bitwise_vote" ->
      """SELECT (CASE WHEN value > 100.0 THEN 1 ELSE 0 END
        |  | CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
        |  | CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS vote,
        |  count(*) AS "count"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q11_charge_per_row" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q12_union_branches" -> {
      def branch(st: String) =
        s"""SELECT o_orderstatus, count(*) AS n,
           |  ${sqlDecSum("o_totalprice")} AS total
           |FROM orders WHERE o_orderstatus = '$st' GROUP BY o_orderstatus""".stripMargin
      s"""SELECT * FROM (${branch("F")} UNION ALL ${branch("O")} UNION ALL ${branch("P")})
         |ORDER BY o_orderstatus""".stripMargin
    },

    "q13_zscore_customers" ->
      s"""SELECT c_custkey, c_acctbal,
         |  (c_acctbal - m) / sd AS c_acctbal_z
         |FROM customer CROSS JOIN
         |  (SELECT ${sqlDecAvg("c_acctbal")} AS m, ${sqlDecStd("c_acctbal")} AS sd
         |   FROM customer)
         |ORDER BY c_custkey""".stripMargin,

    "q14_ar_numeric" ->
      s"""WITH g AS (
         |  SELECT l_returnflag, ${sqlDecAvg("l_quantity")} AS q,
         |    ${sqlDecAvg("l_extendedprice")} AS p
         |  FROM lineitem GROUP BY l_returnflag),
         |gall AS (
         |  SELECT ${sqlDecAvg("l_quantity")} AS gq,
         |    ${sqlDecAvg("l_extendedprice")} AS gp
         |  FROM lineitem)
         |SELECT max(g.q / gall.gq) AS l_quantity,
         |  max(g.p / gall.gp) AS l_extendedprice
         |FROM g, gall""".stripMargin,

    "q15_ar_binary" ->
      """WITH b AS (SELECT l_returnflag,
        |  CAST(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS hd,
        |  CAST(CASE WHEN l_quantity >= 25 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS bk
        |  FROM lineitem),
        |g AS (SELECT l_returnflag,
        |  CASE WHEN count(hd) - sum(hd) = 0 THEN 1000.0
        |    ELSE sum(hd) / (count(hd) - sum(hd)) END AS high_discount,
        |  CASE WHEN count(bk) - sum(bk) = 0 THEN 1000.0
        |    ELSE sum(bk) / (count(bk) - sum(bk)) END AS bulk
        |  FROM b GROUP BY l_returnflag)
        |SELECT max(high_discount) AS high_discount, max(bulk) AS bulk FROM g""".stripMargin,

    "q16_topk_per_segment" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "q17_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS INTEGER) AS n_chars_calc,
         |  CAST(len($toksSql) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct($toksSql)) AS INTEGER) AS n_distinct_tokens,
         |  CAST(len(list_filter($toksSql, t -> t IN $stopSql)) AS DOUBLE)
         |    / len($toksSql) AS stopword_ratio,
         |  CAST(list_sum(list_transform($toksSql, t -> length(t))) AS DOUBLE)
         |    / len($toksSql) AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q18_dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
        |  count(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "q19_lang_id" -> {
      val scores = TextOps.langVocab.map { case (lang, vocab) =>
        val vs = vocab.map(w => s"'$w'").mkString("(", ",", ")")
        s"CAST(len(list_filter($toksSql, t -> t IN $vs)) AS INTEGER) AS s_$lang"
      }.mkString(",\n  ")
      val langs = TextOps.langVocab.map(_._1)
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs.map(l => s"WHEN s_$l = $best AND s_$l > 0 THEN '$l'")
        .mkString("\n  ")
      s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
         |FROM (SELECT doc_id, $scores FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q20_quality_score" ->
      s"""SELECT doc_id, $qualitySqlExpr AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_token_count" -> {
      val bpeSqlPattern = TextOps.bpeTokenPattern.replace("'", "''")
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS INTEGER) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '$bpeSqlPattern', 0)) AS INTEGER) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q21_jaccard_pairs" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |dfc AS (SELECT tok, count(*) AS tok_df FROM inv GROUP BY tok),
         |capped AS (SELECT inv.id, inv.sz, inv.tok FROM inv
         |  JOIN dfc USING (tok) WHERE tok_df <= 100000)
         |SELECT l.id AS a, r.id AS b, count(*) AS inter,
         |  CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) AS jaccard
         |FROM capped l JOIN capped r ON l.tok = r.tok AND l.id < r.id
         |GROUP BY l.id, r.id, l.sz, r.sz
         |HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.02
         |ORDER BY a, b""".stripMargin,

    // Exact brute-force pair set at the same threshold — the LSH pipeline's
    // banding miss probability at J >= 0.8 is ~1e-7, so the verified-pair
    // output must equal the exact set.
    "q22_minhash_neardup" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized)
         |SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS inter,
         |  CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) AS jaccard
         |FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |GROUP BY l.id, r.id, l.sz, r.sz
         |HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8
         |ORDER BY a, b""".stripMargin,

    // the banded-tier split replay: the oracle computes all 48 minhash
    // minima per doc (the same sequential perm family, constants inlined),
    // packs the 16 band signatures, counts buckets, re-keys hot-bucket
    // members by their own band's extension minimum (perm 32 + band_idx),
    // applies the post-split cap, and verifies candidates by exact
    // Jaccard — the exact surviving pair set is the claim
    "q207_minhash_split_pairs" -> {
      val perms = ops.DetHash.minHashPerms(48)
      val permVals = perms.zipWithIndex
        .map { case ((a, b), p) => s"($p, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val P = ops.DetHash.P
      val (so, mb) = (2L, 1000L)
      s"""WITH $hashedShinglesCte,
         |perms AS (SELECT * FROM (VALUES $permVals) t(p, pa, pb)),
         |inv AS (SELECT id, unnest(hs) AS tok FROM sized),
         |mins AS (SELECT i.id, pr.p,
         |    min((pr.pa * (i.tok % $P) + pr.pb) % $P) AS mn
         |  FROM inv i CROSS JOIN perms pr GROUP BY 1, 2),
         |bsig AS (SELECT e.id, e.p // 2 AS band_idx,
         |    e.mn * $P + o.mn AS band_sig
         |  FROM mins e JOIN mins o ON o.id = e.id AND o.p = e.p + 1
         |  WHERE e.p % 2 = 0 AND e.p < 32),
         |ext AS (SELECT id, p - 32 AS band_idx, mn AS sub FROM mins
         |  WHERE p >= 32),
         |bc AS (SELECT band_idx, band_sig, CAST(count(*) AS BIGINT) AS bn
         |  FROM bsig GROUP BY 1, 2),
         |hot AS (SELECT s.id, s.band_idx, s.band_sig, x.sub
         |  FROM bsig s JOIN bc ON bc.band_idx = s.band_idx
         |    AND bc.band_sig = s.band_sig
         |  JOIN ext x ON x.id = s.id AND x.band_idx = s.band_idx
         |  WHERE bc.bn > $so),
         |hc AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS bn2
         |  FROM hot GROUP BY 1, 2, 3),
         |b2 AS (
         |  SELECT s.band_idx, s.band_sig, CAST(0 AS BIGINT) AS sub, s.id
         |  FROM bsig s JOIN bc ON bc.band_idx = s.band_idx
         |    AND bc.band_sig = s.band_sig
         |  WHERE bc.bn <= $so AND bc.bn <= $mb
         |  UNION ALL
         |  SELECT h.band_idx, h.band_sig, h.sub, h.id FROM hot h
         |  JOIN hc ON hc.band_idx = h.band_idx AND hc.band_sig = h.band_sig
         |    AND hc.sub = h.sub
         |  WHERE hc.bn2 <= $mb),
         |cand AS (SELECT DISTINCT l.id AS a, r.id AS b
         |  FROM b2 l JOIN b2 r ON l.band_idx = r.band_idx
         |    AND l.band_sig = r.band_sig AND l.sub = r.sub AND l.id < r.id)
         |SELECT c.a, c.b,
         |  CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT) AS inter,
         |  CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |    / (sa.sz + sb.sz - len(list_intersect(sa.hs, sb.hs))) AS jaccard
         |FROM cand c JOIN sized sa ON sa.id = c.a JOIN sized sb ON sb.id = c.b
         |WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |    / (sa.sz + sb.sz - len(list_intersect(sa.hs, sb.hs))) >= 0.8
         |ORDER BY a, b""".stripMargin
    },

    // identical brute-force oracle as q22: the prefix-filtered plan must
    // reproduce the exact J >= 0.8 pair set
    "q36_jaccard_prefix" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized)
         |SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS inter,
         |  CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) AS jaccard
         |FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |GROUP BY l.id, r.id, l.sz, r.sz
         |HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8
         |ORDER BY a, b""".stripMargin,

    "q23_simhash" ->
      s"""WITH $simHashCte
         |SELECT id AS doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,

    // exact pair set (same brute force as q22) → symmetric edges → transitive
    // closure by a recursive CTE: reach holds (vertex, label-candidate) pairs
    // within a component, min = the component representative. The Spark side
    // reaches the same fixpoint via the hybrid CC (bounded min-label
    // propagation, star rounds on the contracted quotient if needed).
    "q37_neardup_clusters" ->
      s"""WITH RECURSIVE $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y)
         |SELECT x AS doc_id, min(comp) AS comp FROM reach
         |GROUP BY x ORDER BY doc_id""".stripMargin,

    "q38_neardedup_summary" ->
      s"""WITH RECURSIVE $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x)
         |SELECT comp AS keep_id, count(*) AS n_docs FROM cc
         |GROUP BY comp ORDER BY keep_id""".stripMargin,

    // q38's recursive closure + the shared quality expression; argmax and
    // member count over the same comp partition
    "q93_keep_best_dedup" ->
      s"""WITH RECURSIVE $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x),
         |q AS (SELECT doc_id, $qualitySqlExpr AS quality FROM documents),
         |j AS (SELECT cc.x AS doc_id, cc.comp, q.quality
         |  FROM cc JOIN q ON q.doc_id = cc.x),
         |r AS (SELECT doc_id, comp, quality,
         |    row_number() OVER (PARTITION BY comp
         |      ORDER BY quality DESC, doc_id ASC) AS rn,
         |    count(*) OVER (PARTITION BY comp) AS n_docs FROM j)
         |SELECT doc_id AS keep_id, CAST(n_docs AS BIGINT) AS n_docs, quality
         |FROM r WHERE rn = 1 ORDER BY keep_id""".stripMargin,

    "q30_simhash_neardup" ->
      s"""WITH $simHashCte
         |SELECT l.id AS a, r.id AS b,
         |  CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
         |FROM fp l JOIN fp r ON l.id < r.id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 5
         |ORDER BY a, b""".stripMargin,

    "q31_multimodal_meta" ->
      s"""WITH p AS (SELECT doc_id,
         |  CASE WHEN doc_id % 4 = 0 THEN from_hex('89504E47') || encode(text)
         |       WHEN doc_id % 4 = 1 THEN from_hex('FFD8FFE0') || encode(text)
         |       WHEN doc_id % 4 = 2 THEN from_hex('47494638') || encode(text)
         |       ELSE encode(text) END AS payload
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(octet_length(payload) AS INTEGER) AS n_bytes,
         |  CASE WHEN starts_with(substring(upper(hex(payload)),1,8), '89504E47') THEN 'png'
         |       WHEN starts_with(substring(upper(hex(payload)),1,8), 'FFD8FF') THEN 'jpeg'
         |       WHEN starts_with(substring(upper(hex(payload)),1,8), '47494638') THEN 'gif'
         |       WHEN starts_with(substring(upper(hex(payload)),1,8), '52494646') THEN 'riff'
         |       WHEN starts_with(substring(upper(hex(payload)),1,8), '25504446') THEN 'pdf'
         |       ELSE 'bin' END AS format,
         |  CAST(ceil(octet_length(payload) / 256.0) AS INTEGER) AS n_chunks
         |FROM p ORDER BY doc_id""".stripMargin,

    "q26_lsh_ann_topk" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(48, 64)}),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |proj AS (SELECT p.p // 12 AS tbl, p.p % 12 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id <> r.vec_id),
         |scored AS (SELECT c.query_id, c.neighbor_id, ${sqlCos("qe", "ne")} AS cos
         |  FROM cand c JOIN e qe ON qe.vec_id = c.query_id
         |    JOIN e ne ON ne.vec_id = c.neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q35_srp_neardup" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(48, 64)}),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |proj AS (SELECT p.p // 8 AS tbl, p.p % 8 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id < r.vec_id)
         |SELECT a, b, cos FROM (
         |  SELECT c.a, c.b, ${sqlCos("ae", "be")} AS cos
         |  FROM cand c JOIN e ae ON ae.vec_id = c.a JOIN e be ON be.vec_id = c.b)
         |WHERE cos >= 0.45 ORDER BY a, b""".stripMargin,

    // the AUTO-sized SRP pair derivation at 0.4 (np from the corpus count),
    // mutual-kNN edge selection, then the same recursive closure +
    // retention shape as q38 over the BOUNDED edges — vertices are ALL
    // vec_ids, so singletons appear as 1-member clusters
    "q64_semantic_dedup" ->
      s"""WITH RECURSIVE $semanticCcBoundedCte
         |SELECT comp AS keep_id, count(*) AS n_vecs FROM cc
         |GROUP BY comp ORDER BY keep_id""".stripMargin,

    // clusters from EMBEDDINGS, labels from TEXT: the cross-tier
    // composition — same bounded cc CTE as q64, joined to documents
    "q88_cluster_topics" ->
      s"""WITH RECURSIVE $semanticCcBoundedCte,
         |sizes AS (SELECT comp, count(*) AS n_docs FROM cc
         |  GROUP BY comp HAVING count(*) >= 2),
         |toks AS (SELECT cc.comp, s.n_docs, unnest($toksSql) AS term
         |  FROM documents d JOIN cc ON cc.x = d.doc_id
         |  JOIN sizes s ON s.comp = cc.comp),
         |cnts AS (SELECT comp, n_docs, term, count(*) AS cnt
         |  FROM toks GROUP BY 1, 2, 3),
         |rk AS (SELECT comp, n_docs, term, cnt,
         |    CAST(row_number() OVER (PARTITION BY comp
         |      ORDER BY cnt DESC, term ASC) AS INTEGER) AS rank
         |  FROM cnts)
         |SELECT comp AS cluster_id, n_docs, term, cnt, rank
         |FROM rk WHERE rank <= 3 ORDER BY cluster_id, rank""".stripMargin,

    "q24_ann_cosine_topk" ->
      """WITH dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, dp / (na * nb) AS cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY dp / (na * nb) DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q25_neardup_cosine" ->
      s"""SELECT * FROM (
         |  SELECT a.vec_id AS a, b.vec_id AS b, ${sqlCos("a", "b")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.4 ORDER BY a, b""".stripMargin,

    // The HLL sketch itself is engine-specific; the CONTRACT (relative error
    // within the requested 5% rsd) is the checkable fact — Spark's HLL++ is
    // deterministic for fixed data, so the flag is stable.
    "q33_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_partkey,
        |  count(DISTINCT l_suppkey) AS exact_suppkey,
        |  'ok' AS partkey_hll_within_5pct,
        |  'ok' AS suppkey_hll_within_5pct
        |FROM lineitem""".stripMargin,

    "q40_top_terms" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
         |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |nn AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT doc_id, term, tf, df,
         |    CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
         |  FROM tf JOIN dfc USING (term) CROSS JOIN nn),
         |ranked AS (SELECT doc_id, term, tf, df, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT doc_id, term, tf, df, score, rank FROM ranked
         |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "q41_contamination" ->
      s"""WITH $hashedShinglesCte,
         |corp AS (SELECT id, sz, hs FROM sized WHERE id % 2 = 0),
         |bench AS (SELECT DISTINCT unnest(hs) AS h FROM sized WHERE id % 2 = 1),
         |rws AS (SELECT id, unnest(hs) AS h FROM corp),
         |seen AS (SELECT id, count(*) AS n_seen FROM rws
         |  WHERE h IN (SELECT h FROM bench) GROUP BY id)
         |SELECT c.id AS doc_id, c.sz AS n_shingles,
         |  COALESCE(s.n_seen, 0) AS n_seen,
         |  CAST(COALESCE(s.n_seen, 0) AS DOUBLE) / c.sz AS contamination
         |FROM corp c LEFT JOIN seen s ON c.id = s.id ORDER BY doc_id""".stripMargin,

    // brute-force cross-side near-dup (batch = id%5==0 vs corpus = rest);
    // batch docs with no k-shingle never enter `inv` but still report novel
    "q65_incremental_dedup" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok
         |    AND l.id % 5 = 0 AND r.id % 5 <> 0
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |m AS (SELECT a, count(*) AS n_matches FROM pr GROUP BY a)
         |SELECT d.doc_id, COALESCE(m.n_matches, 0) AS n_matches,
         |  COALESCE(m.n_matches, 0) = 0 AS novel
         |FROM documents d LEFT JOIN m ON m.a = d.doc_id
         |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin,

    // the split-layout probe replay: frozen split cells derived from the
    // BASE corpus's band-bucket counts (doc_id % 5 <> 0 — the corpus the
    // ENGINE froze its layout on), base AND batch members re-keyed by
    // their own band's extension minimum inside those cells, post-split
    // cap on the corpus side only (the write-time drop), candidates on
    // (band_idx, band_sig, sub), exact-Jaccard verify, novelty counts
    "q208_persisted_split_probe" -> {
      val perms = ops.DetHash.minHashPerms(48)
      val permVals = perms.zipWithIndex
        .map { case ((a, b), p) => s"($p, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val P = ops.DetHash.P
      val (so, mb) = (2L, 10000L)
      s"""WITH $hashedShinglesCte,
         |perms AS (SELECT * FROM (VALUES $permVals) t(p, pa, pb)),
         |inv AS (SELECT id, unnest(hs) AS tok FROM sized),
         |mins AS (SELECT i.id, pr.p,
         |    min((pr.pa * (i.tok % $P) + pr.pb) % $P) AS mn
         |  FROM inv i CROSS JOIN perms pr GROUP BY 1, 2),
         |bsig AS (SELECT e.id, e.p // 2 AS band_idx,
         |    e.mn * $P + o.mn AS band_sig
         |  FROM mins e JOIN mins o ON o.id = e.id AND o.p = e.p + 1
         |  WHERE e.p % 2 = 0 AND e.p < 32),
         |ext AS (SELECT id, p - 32 AS band_idx, mn AS sub FROM mins
         |  WHERE p >= 32),
         |sc AS (SELECT band_idx, band_sig FROM (
         |    SELECT band_idx, band_sig, count(*) AS bn FROM bsig
         |    WHERE id % 5 <> 0 GROUP BY 1, 2) c WHERE c.bn > $so),
         |keyed AS (
         |  SELECT s.id, s.band_idx, s.band_sig, CAST(0 AS BIGINT) AS sub
         |  FROM bsig s LEFT JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  WHERE sc.band_idx IS NULL
         |  UNION ALL
         |  SELECT s.id, s.band_idx, s.band_sig, x.sub
         |  FROM bsig s JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  JOIN ext x ON x.id = s.id AND x.band_idx = s.band_idx),
         |bc AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS bn2
         |  FROM keyed WHERE id % 5 <> 0 GROUP BY 1, 2, 3),
         |base AS (SELECT y.* FROM keyed y JOIN bc
         |    ON bc.band_idx = y.band_idx AND bc.band_sig = y.band_sig
         |    AND bc.sub = y.sub
         |  WHERE y.id % 5 <> 0 AND bc.bn2 <= $mb),
         |bt AS (SELECT * FROM keyed WHERE id % 5 = 0),
         |cand AS (SELECT DISTINCT bt.id AS a, base.id AS b
         |  FROM bt JOIN base ON base.band_idx = bt.band_idx
         |    AND base.band_sig = bt.band_sig AND base.sub = bt.sub),
         |pr AS (SELECT c.a, c.b
         |  FROM cand c JOIN sized sa ON sa.id = c.a
         |    JOIN sized sb ON sb.id = c.b
         |  WHERE CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
         |    / (sa.sz + sb.sz - len(list_intersect(sa.hs, sb.hs))) >= 0.8),
         |m AS (SELECT a, count(*) AS n_matches FROM pr GROUP BY a)
         |SELECT d.doc_id, CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
         |  COALESCE(m.n_matches, 0) = 0 AS novel
         |FROM documents d LEFT JOIN m ON m.a = d.doc_id
         |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin
    },

    // the layout-drift audit replay: base banding derives the frozen
    // cells (the ENGINE's ensure corpus, doc_id % 5 <> 0), batch rows
    // append AT those cells with the per-sub-cell write cap and dropped
    // closures, and the same per-band rollup runs over the union — every
    // outgrown/saturated count re-derived from the raw text
    "q209_split_layout_drift" -> {
      val perms = ops.DetHash.minHashPerms(48)
      val permVals = perms.zipWithIndex
        .map { case ((a, b), p) => s"($p, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val P = ops.DetHash.P
      val (so, mb) = (2L, 10000L)
      s"""WITH $hashedShinglesCte,
         |perms AS (SELECT * FROM (VALUES $permVals) t(p, pa, pb)),
         |inv AS (SELECT id, unnest(hs) AS tok FROM sized),
         |mins AS (SELECT i.id, pr.p,
         |    min((pr.pa * (i.tok % $P) + pr.pb) % $P) AS mn
         |  FROM inv i CROSS JOIN perms pr GROUP BY 1, 2),
         |bsig AS (SELECT e.id, e.p // 2 AS band_idx,
         |    e.mn * $P + o.mn AS band_sig
         |  FROM mins e JOIN mins o ON o.id = e.id AND o.p = e.p + 1
         |  WHERE e.p % 2 = 0 AND e.p < 32),
         |ext AS (SELECT id, p - 32 AS band_idx, mn AS sub FROM mins
         |  WHERE p >= 32),
         |sc AS (SELECT band_idx, band_sig FROM (
         |    SELECT band_idx, band_sig, count(*) AS bn FROM bsig
         |    WHERE id % 5 <> 0 GROUP BY 1, 2) c WHERE c.bn > $so),
         |keyed AS (
         |  SELECT s.id, s.band_idx, s.band_sig, CAST(0 AS BIGINT) AS sub
         |  FROM bsig s LEFT JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  WHERE sc.band_idx IS NULL
         |  UNION ALL
         |  SELECT s.id, s.band_idx, s.band_sig, x.sub
         |  FROM bsig s JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  JOIN ext x ON x.id = s.id AND x.band_idx = s.band_idx),
         |bc AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS bn2
         |  FROM keyed WHERE id % 5 <> 0 GROUP BY 1, 2, 3),
         |base AS (SELECT y.* FROM keyed y JOIN bc
         |    ON bc.band_idx = y.band_idx AND bc.band_sig = y.band_sig
         |    AND bc.sub = y.sub
         |  WHERE y.id % 5 <> 0 AND bc.bn2 <= $mb),
         |drp AS (SELECT band_idx, band_sig, sub FROM bc WHERE bn2 > $mb),
         |bt AS (SELECT y.* FROM keyed y LEFT JOIN drp
         |    ON drp.band_idx = y.band_idx AND drp.band_sig = y.band_sig
         |    AND drp.sub = y.sub
         |  WHERE y.id % 5 = 0 AND drp.band_idx IS NULL),
         |btr AS (SELECT bt.*, row_number() OVER (
         |    PARTITION BY band_idx, band_sig, sub ORDER BY id) AS rn
         |  FROM bt),
         |bn0 AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS n0 FROM base GROUP BY 1, 2, 3),
         |app AS (SELECT b.id, b.band_idx, b.band_sig, b.sub
         |  FROM btr b LEFT JOIN bn0 ON bn0.band_idx = b.band_idx
         |    AND bn0.band_sig = b.band_sig AND bn0.sub = b.sub
         |  WHERE b.rn + COALESCE(bn0.n0, 0) <= $mb),
         |allrows AS (SELECT id, band_idx, band_sig, sub FROM base
         |  UNION ALL SELECT id, band_idx, band_sig, sub FROM app),
         |occ AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS occ FROM allrows GROUP BY 1, 2, 3),
         |og AS (SELECT c.band_idx, CAST(count(*) AS BIGINT) AS n_outgrown,
         |    CAST(max(c.cocc) AS BIGINT) AS max_outgrown
         |  FROM (SELECT o.band_idx, o.band_sig, sum(o.occ) AS cocc
         |      FROM occ o LEFT JOIN sc ON sc.band_idx = o.band_idx
         |        AND sc.band_sig = o.band_sig
         |      WHERE sc.band_idx IS NULL GROUP BY 1, 2) c
         |  WHERE c.cocc > $so GROUP BY 1),
         |pb AS (SELECT o.band_idx, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(o.occ) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN sc.band_idx IS NOT NULL AND o.occ > $so
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated
         |  FROM occ o LEFT JOIN sc ON sc.band_idx = o.band_idx
         |    AND sc.band_sig = o.band_sig
         |  GROUP BY 1),
         |fr AS (SELECT band_idx, CAST(count(*) AS BIGINT) AS n_frozen
         |  FROM sc GROUP BY 1)
         |SELECT CAST(p.band_idx AS INTEGER) AS band_idx, p.n_cells,
         |  p.n_rows, CAST(COALESCE(f.n_frozen, 0) AS BIGINT) AS n_frozen,
         |  CAST(COALESCE(g.n_outgrown, 0) AS BIGINT) AS n_outgrown,
         |  CAST(COALESCE(g.max_outgrown, 0) AS BIGINT) AS max_outgrown,
         |  p.n_saturated
         |FROM pb p LEFT JOIN fr f ON f.band_idx = p.band_idx
         |  LEFT JOIN og g ON g.band_idx = p.band_idx
         |ORDER BY band_idx""".stripMargin
    },

    // the refreeze replay: the q209 lifecycle (base banding -> frozen
    // cells -> capped append at the frozen layout) extended with the
    // refreeze itself — outgrown cells (un-frozen, over splitOccupancy
    // after the append) re-derived from the union view, their members
    // re-keyed by the same per-band extension minhash, the final live
    // view = everything else + the re-keyed rows — then the identical
    // per-band rollup, where n_outgrown is now 0 BY DERIVATION (every
    // over-threshold un-frozen cell just froze), not by fiat
    "q210_split_refreeze" -> {
      val perms = ops.DetHash.minHashPerms(48)
      val permVals = perms.zipWithIndex
        .map { case ((a, b), p) => s"($p, CAST($a AS BIGINT), CAST($b AS BIGINT))" }
        .mkString(", ")
      val P = ops.DetHash.P
      val (so, mb) = (2L, 10000L)
      s"""WITH $hashedShinglesCte,
         |perms AS (SELECT * FROM (VALUES $permVals) t(p, pa, pb)),
         |inv AS (SELECT id, unnest(hs) AS tok FROM sized),
         |mins AS (SELECT i.id, pr.p,
         |    min((pr.pa * (i.tok % $P) + pr.pb) % $P) AS mn
         |  FROM inv i CROSS JOIN perms pr GROUP BY 1, 2),
         |bsig AS (SELECT e.id, e.p // 2 AS band_idx,
         |    e.mn * $P + o.mn AS band_sig
         |  FROM mins e JOIN mins o ON o.id = e.id AND o.p = e.p + 1
         |  WHERE e.p % 2 = 0 AND e.p < 32),
         |ext AS (SELECT id, p - 32 AS band_idx, mn AS sub FROM mins
         |  WHERE p >= 32),
         |sc AS (SELECT band_idx, band_sig FROM (
         |    SELECT band_idx, band_sig, count(*) AS bn FROM bsig
         |    WHERE id % 5 <> 0 GROUP BY 1, 2) c WHERE c.bn > $so),
         |keyed AS (
         |  SELECT s.id, s.band_idx, s.band_sig, CAST(0 AS BIGINT) AS sub
         |  FROM bsig s LEFT JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  WHERE sc.band_idx IS NULL
         |  UNION ALL
         |  SELECT s.id, s.band_idx, s.band_sig, x.sub
         |  FROM bsig s JOIN sc ON sc.band_idx = s.band_idx
         |    AND sc.band_sig = s.band_sig
         |  JOIN ext x ON x.id = s.id AND x.band_idx = s.band_idx),
         |bc AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS bn2
         |  FROM keyed WHERE id % 5 <> 0 GROUP BY 1, 2, 3),
         |base AS (SELECT y.* FROM keyed y JOIN bc
         |    ON bc.band_idx = y.band_idx AND bc.band_sig = y.band_sig
         |    AND bc.sub = y.sub
         |  WHERE y.id % 5 <> 0 AND bc.bn2 <= $mb),
         |drp AS (SELECT band_idx, band_sig, sub FROM bc WHERE bn2 > $mb),
         |bt AS (SELECT y.* FROM keyed y LEFT JOIN drp
         |    ON drp.band_idx = y.band_idx AND drp.band_sig = y.band_sig
         |    AND drp.sub = y.sub
         |  WHERE y.id % 5 = 0 AND drp.band_idx IS NULL),
         |btr AS (SELECT bt.*, row_number() OVER (
         |    PARTITION BY band_idx, band_sig, sub ORDER BY id) AS rn
         |  FROM bt),
         |bn0 AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS n0 FROM base GROUP BY 1, 2, 3),
         |app AS (SELECT b.id, b.band_idx, b.band_sig, b.sub
         |  FROM btr b LEFT JOIN bn0 ON bn0.band_idx = b.band_idx
         |    AND bn0.band_sig = b.band_sig AND bn0.sub = b.sub
         |  WHERE b.rn + COALESCE(bn0.n0, 0) <= $mb),
         |allrows AS (SELECT id, band_idx, band_sig, sub FROM base
         |  UNION ALL SELECT id, band_idx, band_sig, sub FROM app),
         |ogc AS MATERIALIZED (SELECT o.band_idx, o.band_sig
         |  FROM (SELECT a.band_idx, a.band_sig, count(*) AS cocc
         |      FROM allrows a LEFT JOIN sc ON sc.band_idx = a.band_idx
         |        AND sc.band_sig = a.band_sig
         |      WHERE sc.band_idx IS NULL GROUP BY 1, 2) o
         |  WHERE o.cocc > $so),
         |rk AS (SELECT a.id, a.band_idx, a.band_sig, x.sub
         |  FROM allrows a JOIN ogc ON ogc.band_idx = a.band_idx
         |    AND ogc.band_sig = a.band_sig
         |  JOIN ext x ON x.id = a.id AND x.band_idx = a.band_idx),
         |rkc AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS bn3 FROM rk GROUP BY 1, 2, 3),
         |live2 AS (
         |  SELECT a.id, a.band_idx, a.band_sig, a.sub FROM allrows a
         |  LEFT JOIN ogc ON ogc.band_idx = a.band_idx
         |    AND ogc.band_sig = a.band_sig
         |  WHERE ogc.band_idx IS NULL
         |  UNION ALL
         |  SELECT r.id, r.band_idx, r.band_sig, r.sub FROM rk r
         |  JOIN rkc ON rkc.band_idx = r.band_idx
         |    AND rkc.band_sig = r.band_sig AND rkc.sub = r.sub
         |  WHERE rkc.bn3 <= $mb),
         |sc2 AS (SELECT band_idx, band_sig FROM sc
         |  UNION ALL SELECT band_idx, band_sig FROM ogc),
         |occ AS (SELECT band_idx, band_sig, sub,
         |    CAST(count(*) AS BIGINT) AS occ FROM live2 GROUP BY 1, 2, 3),
         |og AS (SELECT c.band_idx, CAST(count(*) AS BIGINT) AS n_outgrown,
         |    CAST(max(c.cocc) AS BIGINT) AS max_outgrown
         |  FROM (SELECT o.band_idx, o.band_sig, sum(o.occ) AS cocc
         |      FROM occ o LEFT JOIN sc2 ON sc2.band_idx = o.band_idx
         |        AND sc2.band_sig = o.band_sig
         |      WHERE sc2.band_idx IS NULL GROUP BY 1, 2) c
         |  WHERE c.cocc > $so GROUP BY 1),
         |pb AS (SELECT o.band_idx, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(o.occ) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN sc2.band_idx IS NOT NULL AND o.occ > $so
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated
         |  FROM occ o LEFT JOIN sc2 ON sc2.band_idx = o.band_idx
         |    AND sc2.band_sig = o.band_sig
         |  GROUP BY 1),
         |fr AS (SELECT band_idx, CAST(count(*) AS BIGINT) AS n_frozen
         |  FROM sc2 GROUP BY 1)
         |SELECT CAST(p.band_idx AS INTEGER) AS band_idx, p.n_cells,
         |  p.n_rows, CAST(COALESCE(f.n_frozen, 0) AS BIGINT) AS n_frozen,
         |  CAST(COALESCE(g.n_outgrown, 0) AS BIGINT) AS n_outgrown,
         |  CAST(COALESCE(g.max_outgrown, 0) AS BIGINT) AS max_outgrown,
         |  p.n_saturated
         |FROM pb p LEFT JOIN fr f ON f.band_idx = p.band_idx
         |  LEFT JOIN og g ON g.band_idx = p.band_idx
         |ORDER BY band_idx""".stripMargin
    },

    // identical brute-force oracle as q65: the persisted-index probe must
    // report exactly what the recompute-from-text path reports
    "q89_persisted_index_dedup" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok
         |    AND l.id % 5 = 0 AND r.id % 5 <> 0
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |m AS (SELECT a, count(*) AS n_matches FROM pr GROUP BY a)
         |SELECT d.doc_id, COALESCE(m.n_matches, 0) AS n_matches,
         |  COALESCE(m.n_matches, 0) = 0 AS novel
         |FROM documents d LEFT JOIN m ON m.a = d.doc_id
         |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin,

    // identical brute-force oracle as q24: with nProbe = nCells the IVF
    // probe is exhaustive, so the persisted-index path must return the
    // exact cosine top-k whatever partition KMeans learned
    "q90_persisted_ivf_topk" ->
      """WITH dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, dp / (na * nb) AS cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY dp / (na * nb) DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // same md5+Horner 8-gram hashes (positions = the shingle-list index),
    // IN-set match against the train half, gaps-and-islands span merge
    "q91_ngram_spans" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      val grams8 = ops.DetHash.sqlShingleHashes("th", 8)
      s"""WITH tok AS (SELECT doc_id, list_transform($toksSql, t -> $tokHash) AS th
         |  FROM documents),
         |tg AS (SELECT DISTINCT unnest($grams8) AS h FROM tok WHERE doc_id % 2 = 0),
         |eg AS (SELECT doc_id AS id, $grams8 AS gl FROM tok WHERE doc_id % 2 = 1),
         |ep AS (SELECT id, CAST(t.i AS INTEGER) AS pos, gl[t.i] AS h
         |  FROM eg, UNNEST(range(1, len(gl) + 1)) AS t(i)),
         |m AS (SELECT id, pos FROM ep WHERE h IN (SELECT h FROM tg)),
         |isl AS (SELECT id, pos,
         |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
         |      THEN 1 ELSE 0 END AS ni
         |  FROM m WINDOW w AS (PARTITION BY id ORDER BY pos)),
         |grp AS (SELECT id, pos,
         |    sum(ni) OVER (PARTITION BY id ORDER BY pos) AS island FROM isl)
         |SELECT id AS doc_id, min(pos) AS span_start,
         |  CAST(max(pos) + 7 AS INTEGER) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM grp GROUP BY id, island ORDER BY doc_id, span_start""".stripMargin
    },

    // same positioned trigram hashes; repeats = row_number > 1 per
    // (doc, hash); token ranges of repeats removed, text string_agg'd back
    "q92_remove_repeats" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      val grams3 = ops.DetHash.sqlShingleHashes("th", 3)
      s"""WITH tok AS (SELECT doc_id, $toksSql AS tk,
         |    list_transform($toksSql, t -> $tokHash) AS th FROM documents),
         |g AS (SELECT doc_id, $grams3 AS gl FROM tok),
         |gp AS (SELECT doc_id, CAST(t.i AS INTEGER) AS pos, gl[t.i] AS h
         |  FROM g, UNNEST(range(1, len(gl) + 1)) AS t(i)),
         |rep AS (SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, row_number() OVER (PARTITION BY doc_id, h
         |      ORDER BY pos) AS rn FROM gp) WHERE rn > 1),
         |rem AS (SELECT DISTINCT doc_id, CAST(t.j AS INTEGER) AS tpos
         |  FROM rep, UNNEST(range(pos, pos + 3)) AS t(j)),
         |tp AS (SELECT doc_id, CAST(t.i AS INTEGER) AS tpos, tk[t.i] AS tok
         |  FROM tok, UNNEST(range(1, len(tk) + 1)) AS t(i)),
         |kept AS (SELECT tp.doc_id, tp.tpos, tp.tok FROM tp
         |  ANTI JOIN rem ON tp.doc_id = rem.doc_id AND tp.tpos = rem.tpos),
         |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         |    count(*) AS n_kept FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_toks FROM tp GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
         |  CAST(COALESCE(tot.n_toks, 0) - COALESCE(reb.n_kept, 0) AS BIGINT)
         |    AS n_removed
         |FROM documents d
         |LEFT JOIN tot ON tot.doc_id = d.doc_id
         |LEFT JOIN reb ON reb.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // q42's md5 split bucket decides the sides; q91's span machinery does
    // the decontamination — one composed oracle
    "q96_split_decontamination" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      val grams8 = ops.DetHash.sqlShingleHashes("th", 8)
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'split|' || CAST(doc_id AS VARCHAR)")} % 10000"
      s"""WITH tok AS (SELECT doc_id, ($bucket) < 8000 AS is_train,
         |    list_transform($toksSql, t -> $tokHash) AS th FROM documents),
         |tg AS (SELECT DISTINCT unnest($grams8) AS h FROM tok WHERE is_train),
         |eg AS (SELECT doc_id AS id, $grams8 AS gl FROM tok WHERE NOT is_train),
         |ep AS (SELECT id, CAST(t.i AS INTEGER) AS pos, gl[t.i] AS h
         |  FROM eg, UNNEST(range(1, len(gl) + 1)) AS t(i)),
         |m AS (SELECT id, pos FROM ep WHERE h IN (SELECT h FROM tg)),
         |isl AS (SELECT id, pos,
         |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 8
         |      THEN 1 ELSE 0 END AS ni
         |  FROM m WINDOW w AS (PARTITION BY id ORDER BY pos)),
         |grp AS (SELECT id, pos,
         |    sum(ni) OVER (PARTITION BY id ORDER BY pos) AS island FROM isl)
         |SELECT id AS doc_id, min(pos) AS span_start,
         |  CAST(max(pos) + 7 AS INTEGER) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_grams
         |FROM grp GROUP BY id, island ORDER BY doc_id, span_start""".stripMargin
    },

    // each round k: pair-count CTE pK, deterministic-argmax mK, and the
    // guarded-delimiter literal replace sK — the identical fold the engine
    // runs (see TextOps.initialSeg for why plain replace IS the BPE merge)
    "q97_bpe_train" -> {
      val E = "chr(30)"
      val SS = s"$E||$E"
      val rounds = (1 to 6).map { k =>
        val prev = s"s${k - 1}"
        s"""p$k AS (
           |  SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(syms)),
           |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr
           |    FROM (SELECT freq, string_split(trim(seg, $E), $SS) AS syms FROM $prev)
           |  ) GROUP BY 1, 2),
           |m$k AS (SELECT lhs, rhs, pair_count FROM p$k
           |  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
           |s$k AS (SELECT freq, replace(seg, $E||m.lhs||$SS||m.rhs||$E,
           |    $E||m.lhs||m.rhs||$E) AS seg FROM $prev CROSS JOIN m$k m)""".stripMargin
      }.mkString(",\n")
      val out = (1 to 6).map(k =>
        s"SELECT $k AS merge_rank, lhs, rhs, lhs||rhs AS merged, pair_count FROM m$k")
        .mkString("\nUNION ALL\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS freq FROM (SELECT unnest($toksSql) AS w FROM documents)
         |  WHERE len(w) > 0 AND w NOT LIKE '%'||$E||'%' GROUP BY w),
         |s0 AS (SELECT freq,
         |  $SS||array_to_string(list_transform(range(1, len(w)+1), i -> w[i]), $SS)||$SS AS seg
         |  FROM words),
         |$rounds
         |$out
         |ORDER BY merge_rank""".stripMargin
    },

    // q92's rebuild machinery with the keeper rule changed from
    // first-in-doc to first-in-CORPUS: row_number per HASH over the global
    // (doc_id, pos) order, everything past rank 1 loses its token range
    "q98_substring_dedup" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      val grams5 = ops.DetHash.sqlShingleHashes("th", 5)
      s"""WITH tok AS (SELECT doc_id, $toksSql AS tk,
         |    list_transform($toksSql, t -> $tokHash) AS th FROM documents),
         |g AS (SELECT doc_id, $grams5 AS gl FROM tok),
         |gp AS (SELECT doc_id, CAST(t.i AS INTEGER) AS pos, gl[t.i] AS h
         |  FROM g, UNNEST(range(1, len(gl) + 1)) AS t(i)),
         |rep AS (SELECT doc_id, pos FROM (
         |    SELECT doc_id, pos, row_number() OVER (PARTITION BY h
         |      ORDER BY doc_id, pos) AS rn FROM gp) WHERE rn > 1),
         |rem AS (SELECT DISTINCT doc_id, CAST(t.j AS INTEGER) AS tpos
         |  FROM rep, UNNEST(range(pos, pos + 5)) AS t(j)),
         |tp AS (SELECT doc_id, CAST(t.i AS INTEGER) AS tpos, tk[t.i] AS tok
         |  FROM tok, UNNEST(range(1, len(tk) + 1)) AS t(i)),
         |kept AS (SELECT tp.doc_id, tp.tpos, tp.tok FROM tp
         |  ANTI JOIN rem ON tp.doc_id = rem.doc_id AND tp.tpos = rem.tpos),
         |reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         |    count(*) AS n_kept FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_toks FROM tp GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(reb.clean_text, '') AS clean_text,
         |  CAST(COALESCE(tot.n_toks, 0) - COALESCE(reb.n_kept, 0) AS BIGINT)
         |    AS n_removed
         |FROM documents d
         |LEFT JOIN tot ON tot.doc_id = d.doc_id
         |LEFT JOIN reb ON reb.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // same hashed unigram+bigram buckets, add-1 smoothing with the SAME
    // double-expression shape as the Scala side (integer operands cast to
    // double, two products, one quotient — identical IEEE results), ln
    // quantized to micro-nats BEFORE the per-doc sum so both engines sum
    // integers
    "q99_dsir_weights" ->
      s"""WITH $dsirSqlCtes
         |SELECT doc_id, n_grams, score_micro FROM dsel
         |ORDER BY doc_id""".stripMargin,

    // q24's exact-cosine oracle with the label-inequality predicate and the
    // negative's label carried through
    "q104_hard_negatives" ->
      """WITH dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    b.label AS neg_label,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id < 5 AND b.label <> a.label),
        |ranked AS (SELECT query_id, neighbor_id, neg_label, dp / (na * nb) AS cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY dp / (na * nb) DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, neg_label, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q105_zipf_decades" ->
      s"""WITH counts AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS freq
         |  FROM (SELECT unnest($toksSql) AS t FROM documents) GROUP BY 1),
         |top AS (SELECT term, freq FROM counts ORDER BY freq DESC, term ASC LIMIT 1000),
         |ranked AS (SELECT term, freq, CAST(row_number() OVER (
         |    ORDER BY freq DESC, term ASC) AS BIGINT) AS rank FROM top),
         |dec AS (SELECT rank, term, freq,
         |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lnf_micro
         |  FROM ranked WHERE rank IN (1, 10, 100, 1000))
         |SELECT rank, term, freq, lnf_micro,
         |  lag(lnf_micro) OVER (ORDER BY rank) - lnf_micro AS drop_micro
         |FROM dec ORDER BY rank""".stripMargin,

    // same regexes (portable Java/RE2 subset), same fixed replace order;
    // DuckDB needs the explicit 'g' flag to match Spark's replace-all
    "q112_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '${ops.TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '${ops.TextOps.EmailRe}', '<EMAIL>', 'g'),
         |    '${ops.TextOps.Ipv4Re}', '<IP>', 'g'),
         |    '${ops.TextOps.PhoneRe}', '<PHONE>', 'g') AS text
         |FROM documents ORDER BY doc_id""".stripMargin,

    // √n exactly rounded then micro-quantized BEFORE the integer denom
    // sum; ratios are the same one-product-one-quotient double shapes
    "q113_temperature_mix" ->
      s"""WITH ps AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |q AS (SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS sqrt_micro
         |  FROM ps),
         |d AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS denom FROM q),
         |t AS (SELECT source, n_tokens, sqrt_micro,
         |    CAST(floor((1e6 * CAST(sqrt_micro AS DOUBLE))
         |      / CAST(denom AS DOUBLE)) AS BIGINT) AS weight_micro,
         |    CAST(floor((1000000.0 * CAST(sqrt_micro AS DOUBLE))
         |      / CAST(denom AS DOUBLE)) AS BIGINT) AS target_tokens
         |  FROM q CROSS JOIN d)
         |SELECT source, n_tokens, sqrt_micro, weight_micro, target_tokens,
         |  CAST(floor((1e6 * CAST(target_tokens AS DOUBLE))
         |    / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS epochs_micro
         |FROM t ORDER BY source NULLS LAST""".stripMargin,

    // q113's mixture CTEs feed a plain per-source cumulative window (the
    // oracle NEEDS no bucketing — ordering by (md5, id) is the same total
    // order the engine's bucketed prefix-sum realizes); null-safe source
    // match throughout
    "q114_mixture_draw" -> {
      val h = ops.DetHash.sqlMd5Hash60("'mix|' || CAST(doc_id AS VARCHAR)")
      s"""WITH ps AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |q AS (SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS sqrt_micro
         |  FROM ps),
         |d AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS denom FROM q),
         |t AS (SELECT source, n_tokens,
         |    CAST(floor((1000000.0 * CAST(sqrt_micro AS DOUBLE))
         |      / CAST(denom AS DOUBLE)) AS BIGINT) AS target_tokens
         |  FROM q CROSS JOIN d),
         |dt AS (SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_doc_tokens, $h AS h
         |  FROM documents),
         |cum AS (SELECT doc_id, source, n_doc_tokens,
         |    COALESCE(sum(n_doc_tokens) OVER (PARTITION BY source
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM dt)
         |SELECT c.source, c.doc_id, c.n_doc_tokens,
         |  t.target_tokens // t.n_tokens AS full_epochs,
         |  CASE WHEN c.pre < t.target_tokens % t.n_tokens
         |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS in_partial
         |FROM cum c JOIN t ON t.source IS NOT DISTINCT FROM c.source
         |ORDER BY c.source NULLS LAST, c.doc_id""".stripMargin
    },

    // the shared PQ lifecycle CTEs; distortion = the assignment minimum
    // against the trained cb2, summed per subspace in exact integers
    "q119_pq_distortion" ->
      s"""WITH ${pqOracleCtes()},
         |dst AS (SELECT q.vec_id, CAST(c.m AS INTEGER) AS m,
         |    min(${"list_sum(list_transform(range(1, 17), d -> " +
          "(q.qv[c.m*16 + d] - c.c[d]) * (q.qv[c.m*16 + d] - c.c[d])))"}) AS d
         |  FROM qv q CROSS JOIN cb2 c GROUP BY 1, 2),
         |agg AS (SELECT m, CAST(count(*) AS BIGINT) AS n_vectors,
         |    CAST(sum(d) AS BIGINT) AS sum_dist FROM dst GROUP BY 1)
         |SELECT m, n_vectors, sum_dist,
         |  CAST(floor((1e6 * CAST(sum_dist AS DOUBLE))
         |    / CAST(n_vectors AS DOUBLE)) AS BIGINT) AS mean_dist_micro
         |FROM agg ORDER BY m""".stripMargin,

    // exact tier as a digest rank window, then q93's whole recursive-CC +
    // quality machinery replayed OVER THE SURVIVORS, one aggregate row
    // per stage
    // the same md5 row hashes, the same d×w grid, the same min-over-rows
    // estimate — every counter and every estimate an integer fact
    "q135_cms_audit" -> {
      val cell = (r: String) => ops.DetHash.sqlMd5Hash60(
        s"'cms' || CAST($r AS VARCHAR) || '|' || term") + " % 256"
      s"""WITH tok AS (SELECT unnest($toksSql) AS term FROM documents),
         |grid AS (SELECT t.r, ${cell("t.r")} AS c,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM tok, range(0, 4) t(r) GROUP BY 1, 2),
         |c AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
         |  FROM tok GROUP BY 1),
         |cand AS (SELECT term, freq FROM c ORDER BY freq DESC, term LIMIT 20),
         |cc AS (SELECT v.term, v.freq, t.r, ${cell("t.r")} AS c
         |  FROM cand v, range(0, 4) t(r)),
         |est AS (SELECT cc.term, max(cc.freq) AS exact_count,
         |    CAST(min(g.n) AS BIGINT) AS cms_estimate
         |  FROM cc JOIN grid g ON g.r = cc.r AND g.c = cc.c
         |  GROUP BY cc.term)
         |SELECT term, exact_count, cms_estimate,
         |  cms_estimate - exact_count AS overcount
         |FROM est ORDER BY exact_count DESC, term""".stripMargin
    },

    // per-char group counts replayed relationally (unnest positions →
    // substr → groupBy), same Σ c·log2 c identity, centibit floor as the
    // float contract
    "q137_char_entropy" ->
      s"""WITH ch AS (
         |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
         |  FROM (SELECT doc_id, text,
         |          unnest(range(1, length(text) + 1)) AS i FROM documents)),
         |rc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2),
         |e AS (SELECT doc_id, CAST(count(*) AS INT) AS distinct_chars,
         |    CAST(floor(100.0 * (log2(sum(cnt))
         |      - sum(cnt * log2(cnt)) / sum(cnt))) AS BIGINT) AS ecb
         |  FROM rc GROUP BY doc_id)
         |SELECT d.doc_id, CAST(length(d.text) AS INT) AS n_chars,
         |  COALESCE(e.distinct_chars, 0) AS distinct_chars,
         |  COALESCE(e.ecb, 0) AS entropy_centibits,
         |  COALESCE(e.ecb, 0) < 300 AS low_entropy
         |FROM documents d LEFT JOIN e USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // brute-force levenshtein join under the length filter — the Ed-Join
    // prefix-filtered plan must reproduce the exact d <= 5 pair set
    "q136_edit_distance" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |    levenshtein(a.text, b.text) AS dist
         |  FROM d a JOIN d b
         |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5)
         |SELECT a, b, CAST(dist AS INT) AS dist FROM p
         |WHERE dist <= 5 ORDER BY a, b""".stripMargin,

    // same md5 bucket, same per-side filters and revision, digest compare
    // through DuckDB's own md5
    "q140_snapshot_diff" -> {
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'snap|' || CAST(doc_id AS VARCHAR)")} % 10"
      s"""WITH b AS (SELECT doc_id, text, $bucket AS b FROM documents),
         |o AS (SELECT doc_id, md5(text) AS digest_old FROM b WHERE b <> 0),
         |n AS (SELECT doc_id,
         |    md5(CASE WHEN b = 2 THEN text || ' [rev2]' ELSE text END)
         |      AS digest_new
         |  FROM b WHERE b <> 1)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.digest_old = n.digest_new THEN 'unchanged'
         |       ELSE 'changed' END AS status,
         |  o.digest_old, n.digest_new
         |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin
    },

    // the shared quality expression micro-floored once, then DuckDB's
    // median (avg-of-two-middles, same as the histogram median) replays
    // med/dev/MAD — every step exact IEEE, no second quantize
    "q139_mad_outliers" ->
      s"""WITH q AS (SELECT doc_id, source, $qualitySqlExpr AS quality
         |  FROM documents),
         |s AS (SELECT doc_id, source,
         |    CAST(floor(1e6 * quality) AS BIGINT) AS q_micro FROM q),
         |m AS (SELECT source, CAST(median(q_micro) AS DOUBLE) AS med_micro
         |  FROM s GROUP BY source),
         |d AS (SELECT s.doc_id, s.source, s.q_micro, m.med_micro,
         |    abs(s.q_micro - m.med_micro) AS dev_micro
         |  FROM s JOIN m ON s.source IS NOT DISTINCT FROM m.source),
         |md AS (SELECT source, CAST(median(dev_micro) AS DOUBLE) AS mad_micro
         |  FROM d GROUP BY source)
         |SELECT d.doc_id, d.source, d.q_micro, d.med_micro, md.mad_micro,
         |  d.dev_micro, d.dev_micro > 3 * md.mad_micro AS outlier
         |FROM d JOIN md ON d.source IS NOT DISTINCT FROM md.source
         |ORDER BY d.doc_id""".stripMargin,

    // q136's brute-force pair set closed transitively by the q38
    // recursive-CTE shape, min-id representative per component
    "q138_edit_dedup_summary" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents),
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM d a JOIN d b
         |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5
         |  WHERE levenshtein(a.text, b.text) <= 5),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM documents
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x)
         |SELECT comp AS keep_id, count(*) AS n_docs FROM cc
         |GROUP BY comp ORDER BY keep_id""".stripMargin,

    // overlap-strided windows replayed with range/list-slice; the trailing
    // start suppression (start = 0 OR start < n - overlap) matches verbatim
    "q141_chunk_docs" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |st AS (SELECT doc_id, toks, len(toks) AS n,
         |    unnest(range(0, len(toks), 9)) AS start FROM tk)
         |SELECT doc_id, CAST(start // 9 AS INT) AS chunk_idx, start,
         |  least(12, n - start) AS n_tokens,
         |  array_to_string(
         |    toks[CAST(start + 1 AS INT):CAST(least(start + 12, n) AS INT)],
         |    ' ') AS chunk_text
         |FROM st WHERE start = 0 OR start < n - 3
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    // the exponential race key -ln(u)/w from the same seeded hash stream,
    // nano-floored before the compare; k smallest with id tiebreak
    "q142_weighted_sample" -> {
      val hm =
        s"${ops.DetHash.sqlMd5Hash60("'wsamp|' || CAST(doc_id AS VARCHAR)")} % 2147483647"
      s"""WITH h AS (SELECT doc_id, n_chars, $hm AS hm
         |  FROM documents WHERE n_chars > 0)
         |SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         |  CAST(floor(-ln((hm + 1) / 2147483648.0)
         |    / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
         |FROM h ORDER BY key_nano, doc_id LIMIT 100""".stripMargin
    },

    // hash-derived rate draw and split points, PSM reassembly via list
    // slices — the transform is a pure per-row function both engines share
    "q143_fim_transform" -> {
      def hq(tag: String) =
        ops.DetHash.sqlMd5Hash60(s"'fim$tag|' || CAST(doc_id AS VARCHAR)")
      // COALESCE around each slice join: DuckDB's array_to_string([]) is
      // NULL where Spark's array_join([]) is '' — empty prefix/middle/
      // suffix segments are legitimate (p=0, m=0, or p+m=n draws)
      s"""WITH tk AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sp AS (SELECT doc_id, text, toks, len(toks) AS n,
         |    ${hq("0")} % 100 < 50 AS fim_applied,
         |    ${hq("1")} % (len(toks) + 1) AS p_len
         |  FROM tk),
         |sp2 AS (SELECT *, ${hq("2")} % (n - p_len + 1) AS m_len FROM sp)
         |SELECT doc_id, n AS n_tokens, fim_applied, p_len, m_len,
         |  CASE WHEN fim_applied THEN
         |    '<PRE> ' || COALESCE(
         |      array_to_string(toks[1:CAST(p_len AS INT)], ' '), '')
         |    || ' <SUF> ' || COALESCE(array_to_string(
         |      toks[CAST(p_len + m_len + 1 AS INT):CAST(n AS INT)], ' '), '')
         |    || ' <MID> ' || COALESCE(array_to_string(
         |      toks[CAST(p_len + 1 AS INT):CAST(p_len + m_len AS INT)], ' '), '')
         |  ELSE text END AS fim_text
         |FROM sp2 ORDER BY doc_id""".stripMargin
    },

    // q29's session construction + an ordered string_agg per session;
    // integer epoch duration
    "q154_session_sequences" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) > 600000000
        |  THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, ts, event_id, event_type,
        |  sum(is_new) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
        |    AS duration_s,
        |  string_agg(event_type, '>' ORDER BY ts, event_id) AS action_seq
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // brute-force set intersection over the shared shingle CTE, both
    // containment directions, greatest() filter
    "q153_containment" ->
      s"""WITH $hashedShinglesCte,
         |p AS (SELECT l.id AS a, r.id AS b, l.sz AS sza, r.sz AS szb,
         |    CAST(len(list_intersect(l.hs, r.hs)) AS BIGINT) AS inter
         |  FROM sized l JOIN sized r ON l.id < r.id)
         |SELECT a, b, inter,
         |  CAST(inter AS DOUBLE) / sza AS contain_a,
         |  CAST(inter AS DOUBLE) / szb AS contain_b
         |FROM p
         |WHERE greatest(CAST(inter AS DOUBLE) / sza,
         |  CAST(inter AS DOUBLE) / szb) >= 0.5
         |ORDER BY a, b""".stripMargin,

    // q136's brute CTEs over the md5 doc sample only — constant oracle
    // cost at every sf while the engine side ran the full corpus
    "q165_edit_distance_sampled" -> {
      val samp = s"${ops.DetHash.sqlMd5Hash60("'edsub|' || CAST(doc_id AS VARCHAR)")} % (SELECT greatest(1, count(*) // 1000) FROM documents) = 0"
      s"""WITH d AS (SELECT doc_id, text, length(text) AS len
         |  FROM documents WHERE $samp),
         |p AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |    levenshtein(a.text, b.text) AS dist
         |  FROM d a JOIN d b
         |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5)
         |SELECT a, b, CAST(dist AS INT) AS dist FROM p
         |WHERE dist <= 5 ORDER BY a, b""".stripMargin
    },

    // q153's brute CTEs over the md5 doc sample
    "q166_containment_sampled" -> {
      val samp = s"${ops.DetHash.sqlMd5Hash60("'edsub|' || CAST(doc_id AS VARCHAR)")} % (SELECT greatest(1, count(*) // 1000) FROM documents) = 0"
      s"""WITH ${hashedShinglesCteFrom(s"(SELECT * FROM documents WHERE $samp) dsub")},
         |p AS (SELECT l.id AS a, r.id AS b, l.sz AS sza, r.sz AS szb,
         |    CAST(len(list_intersect(l.hs, r.hs)) AS BIGINT) AS inter
         |  FROM sized l JOIN sized r ON l.id < r.id)
         |SELECT a, b, inter,
         |  CAST(inter AS DOUBLE) / sza AS contain_a,
         |  CAST(inter AS DOUBLE) / szb AS contain_b
         |FROM p
         |WHERE greatest(CAST(inter AS DOUBLE) / sza,
         |  CAST(inter AS DOUBLE) / szb) >= 0.5
         |ORDER BY a, b""".stripMargin
    },

    // q138's brute-pairs + recursive-closure CTEs, both sides the sample
    "q167_edit_dedup_sampled" -> {
      val samp = s"${ops.DetHash.sqlMd5Hash60("'edsub|' || CAST(doc_id AS VARCHAR)")} % (SELECT greatest(1, count(*) // 1000) FROM documents) = 0"
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, text, length(text) AS len FROM documents
         |  WHERE $samp),
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM d a JOIN d b
         |    ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5
         |  WHERE levenshtein(a.text, b.text) <= 5),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM d
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x)
         |SELECT comp AS keep_id, count(*) AS n_docs FROM cc
         |GROUP BY comp ORDER BY keep_id""".stripMargin
    },

    // same pruned postings, ratio idf, and a list_reduce left fold seeded
    // with 0.0 in term order — the exact double fold the Spark side runs
    "q152_bm25_retrieve" ->
      s"""WITH q(query_id, query_text) AS (VALUES
         |    (CAST(0 AS BIGINT), 'spark join fast'),
         |    (CAST(1 AS BIGINT), 'table scan slow row'),
         |    (CAST(2 AS BIGINT), 'hash merge batch window')),
         |tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS total_toks FROM tk),
         |qt AS (SELECT query_id, unnest(list_distinct(
         |    regexp_split_to_array(trim(query_text), '\\s+'))) AS term FROM q),
         |po AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf FROM
         |    (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
         |       unnest(toks) AS term FROM tk)
         |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2, 3),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM po GROUP BY 1),
         |sc AS (SELECT qt.query_id, po.doc_id, po.term,
         |    ((CAST(st.n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
         |    * (CAST(tf AS DOUBLE) * 2.2)
         |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
         |        * CAST(dl AS DOUBLE)
         |        / (CAST(st.total_toks AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))
         |      AS contrib
         |  FROM qt JOIN po USING (term) JOIN d USING (term), st),
         |ag AS (SELECT query_id, doc_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(contrib ORDER BY term)), (a, x) -> a + x) AS bm25,
         |    CAST(count(*) AS BIGINT) AS n_terms_hit
         |  FROM sc GROUP BY 1, 2),
         |r AS (SELECT query_id, doc_id, n_terms_hit, bm25,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank FROM ag)
         |SELECT query_id, doc_id, n_terms_hit, bm25, rank FROM r
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // q26's bucket replay + a probe expansion CTE (exact bucket ∪ one-bit
    // xor perturbations), identical rerank and ranking
    "q151_multiprobe_lsh" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(24, 64)}),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |proj AS (SELECT p.p // 12 AS tbl, p.p % 12 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |pb AS (SELECT tbl, vec_id,
         |    CASE WHEN t.j = -1 THEN bucket
         |      ELSE xor(bucket, CAST(1 AS BIGINT) << CAST(t.j AS INT)) END AS bucket
         |  FROM b, unnest(range(-1, 12)) AS t(j)),
         |cand AS (SELECT DISTINCT p.vec_id AS query_id, r.vec_id AS neighbor_id
         |  FROM pb p JOIN b r ON p.tbl = r.tbl AND p.bucket = r.bucket
         |    AND p.vec_id <> r.vec_id),
         |scored AS (SELECT c.query_id, c.neighbor_id, ${sqlCos("qe", "ne")} AS cos
         |  FROM cand c JOIN e qe ON qe.vec_id = c.query_id
         |    JOIN e ne ON ne.vec_id = c.neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, cos, rank FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // same positioned-gram hashes, document frequency via count(DISTINCT
    // id), identical floored integer micro fraction
    "q150_dup_fraction" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      val grams8 = ops.DetHash.sqlShingleHashes("th", 8)
      s"""WITH tok AS (SELECT doc_id, list_transform($toksSql, t -> $tokHash) AS th
         |  FROM documents),
         |eg AS (SELECT doc_id AS id, $grams8 AS gl FROM tok),
         |ep AS (SELECT id, gl[t.i] AS h
         |  FROM eg, UNNEST(range(1, len(gl) + 1)) AS t(i)),
         |d AS (SELECT h, count(DISTINCT id) AS df FROM ep GROUP BY h),
         |p AS (SELECT ep.id, count(*) AS n_grams,
         |    sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS n_dup
         |  FROM ep JOIN d USING (h) GROUP BY ep.id)
         |SELECT doc_id, CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup,
         |  CAST(CASE WHEN COALESCE(n_grams, 0) > 0
         |    THEN (1000000 * n_dup) // n_grams ELSE 0 END AS BIGINT)
         |    AS dup_frac_micro
         |FROM documents LEFT JOIN p ON p.id = documents.doc_id
         |ORDER BY doc_id""".stripMargin
    },

    // the identical integer sums and the identical double Pearson shape,
    // UNION ALL rows generated from the same (name, expr) list the Spark
    // side iterates — the two can never drift apart
    "q149_signal_corr" -> {
      val sigExprs = Seq(
        "n_chars" -> "CAST(length(text) AS BIGINT)",
        "n_distinct" -> s"CAST(len(list_distinct($toksSql)) AS BIGINT)",
        "n_tokens" -> s"CAST(len($toksSql) AS BIGINT)",
        "quality_micro" -> s"CAST(floor(1e6 * ($qualitySqlExpr)) AS BIGINT)",
        "stop_hits" ->
          s"CAST(len(list_filter($toksSql, t -> t IN $stopSql)) AS BIGINT)")
      val sel = sigExprs.map { case (n, e) => s"$e AS $n" }.mkString(", ")
      val sums = (sigExprs.map { case (n, _) => s"sum($n) AS sx_$n" } ++
        sigExprs.map { case (n, _) => s"sum($n * $n) AS sq_$n" } ++
        (for {
          (a, i) <- sigExprs.zipWithIndex; (b, j) <- sigExprs.zipWithIndex
          if i < j
        } yield s"sum(${a._1} * ${b._1}) AS sp_${a._1}__${b._1}"))
        .mkString(", ")
      def dd(c: String) = s"CAST($c AS DOUBLE)"
      val rows = (for {
        (a, i) <- sigExprs.zipWithIndex; (b, j) <- sigExprs.zipWithIndex
        if i < j
      } yield {
        val (an, bn) = (a._1, b._1)
        val va = s"(${dd("n")} * ${dd(s"sq_$an")} - ${dd(s"sx_$an")} * ${dd(s"sx_$an")})"
        val vb = s"(${dd("n")} * ${dd(s"sq_$bn")} - ${dd(s"sx_$bn")} * ${dd(s"sx_$bn")})"
        s"""SELECT '$an' AS sig_a, '$bn' AS sig_b, n,
           |  CASE WHEN $va > 0 AND $vb > 0 THEN
           |    (${dd("n")} * ${dd(s"sp_${an}__$bn")}
           |      - ${dd(s"sx_$an")} * ${dd(s"sx_$bn")})
           |    / (sqrt($va) * sqrt($vb))
           |  ELSE NULL END AS pearson_r
           |FROM a""".stripMargin
      }).mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT $sel FROM documents),
         |a AS (SELECT count(*) AS n, $sums FROM s)
         |$rows
         |ORDER BY sig_a, sig_b""".stripMargin
    },

    // the same race keys, ranked per source with DuckDB's row_number
    "q148_stratified_sample" -> {
      val hm =
        s"${ops.DetHash.sqlMd5Hash60("'wsamp|' || CAST(doc_id AS VARCHAR)")} % 2147483647"
      s"""WITH h AS (SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
         |    CAST(floor(-ln(($hm + 1) / 2147483648.0)
         |      / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_nano
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY key_nano, doc_id) AS INT) AS rank FROM h)
         |SELECT source, doc_id, weight, key_nano, rank FROM r
         |WHERE rank <= 25 ORDER BY source NULLS LAST, rank""".stripMargin
    },

    // bigram/unigram counts and the identical double-shape lift (one
    // product chain, one quotient, floor — overflow-safe at 100 TB token
    // counts where the BIGINT product form would exceed 2^63); IEEE ops
    // are exactly rounded so both engines produce the same bits
    "q147_pmi_collocations" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bg AS (SELECT toks[CAST(i AS INT)] AS w1,
         |    toks[CAST(i + 1 AS INT)] AS w2
         |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM tk)),
         |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         |uni AS (SELECT w, count(*) AS c FROM
         |  (SELECT unnest(toks) AS w FROM tk) GROUP BY 1),
         |tot AS (SELECT sum(c12) AS n_bigrams FROM big)
         |SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
         |  CAST(t.n_bigrams AS BIGINT) AS n_bigrams,
         |  CAST(floor((1000000.0 * CAST(b.c12 AS DOUBLE)
         |      * CAST(t.n_bigrams AS DOUBLE))
         |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))) AS BIGINT)
         |    AS lift_micro
         |FROM big b
         |  JOIN uni u1 ON u1.w = b.w1
         |  JOIN uni u2 ON u2.w = b.w2, tot t
         |WHERE b.c12 >= 5
         |ORDER BY b.w1, b.w2""".stripMargin,

    // brute-force kth-NN per vector (the exact shared cosine kernel), then
    // the identical micro value-histogram threshold and value-based flag
    "q146_knn_density" ->
      s"""WITH p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    ${sqlCos("a", "b")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |r AS (SELECT qid, cos, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p),
         |kn AS (SELECT qid AS vec_id, cos AS knn_cos,
         |    CAST(floor(cos * 1e6) AS BIGINT) AS knn_micro
         |  FROM r WHERE rn = 5),
         |t AS (SELECT count(*) AS n FROM kn),
         |h AS (SELECT knn_micro, count(*) AS c FROM kn GROUP BY 1),
         |cm AS (SELECT knn_micro, sum(c) OVER (ORDER BY knn_micro
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         |thr AS (SELECT min(knn_micro) AS thr FROM cm, t
         |  WHERE cum * 100 >= n * 5)
         |SELECT k.vec_id, k.knn_cos, k.knn_micro,
         |  k.knn_micro <= thr.thr AS low_density
         |FROM kn k, thr ORDER BY k.vec_id""".stripMargin,

    // q146's brute kth-NN CTEs with a label-match count instead of the
    // density tail; LEFT JOIN keeps every vector in the report
    "q160_label_purity" ->
      s"""WITH p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
         |    ${sqlCos("a", "b")} AS cos
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
         |r AS (SELECT qid, nid, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM p),
         |m AS (SELECT r.qid,
         |    sum(CASE WHEN qa.label = na.label THEN 1 ELSE 0 END) AS n_match
         |  FROM r JOIN embeddings qa ON qa.vec_id = r.qid
         |    JOIN embeddings na ON na.vec_id = r.nid
         |  WHERE rn <= 5 GROUP BY 1)
         |SELECT e.vec_id, e.label,
         |  CAST(COALESCE(m.n_match, 0) AS BIGINT) AS n_match,
         |  CAST((1000000 * COALESCE(m.n_match, 0)) // 5 AS BIGINT)
         |    AS purity_micro,
         |  COALESCE(m.n_match, 0) = 0 AS suspect
         |FROM embeddings e LEFT JOIN m ON m.qid = e.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // the same 8-token lineification as the Spark side (q98's tp explode +
    // integer-div grouping), then the C4 rule: 60-bit md5 line-hash counts,
    // df >= 2 lines struck everywhere, text rebuilt ordered; n_removed and
    // the string_agg NULL-skip mirror the engine's when()/collect_list
    "q161_line_dedup" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tp AS (SELECT doc_id, CAST(t.i AS INTEGER) AS i, tk[t.i] AS tok
         |  FROM tok, UNNEST(range(1, len(tk) + 1)) AS t(i)),
         |ln AS (SELECT doc_id, (i - 1) // 8 AS line_no,
         |    string_agg(tok, ' ' ORDER BY i) AS line
         |  FROM tp GROUP BY 1, 2),
         |lh AS (SELECT doc_id, line_no, line,
         |    ${ops.DetHash.sqlMd5Hash60("line")} AS h FROM ln),
         |cnt AS (SELECT h, count(*) AS df FROM lh GROUP BY h)
         |SELECT lh.doc_id,
         |  COALESCE(string_agg(CASE WHEN cnt.df < 2 THEN lh.line END,
         |    chr(10) ORDER BY lh.line_no), '') AS clean_text,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN cnt.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed
         |FROM lh JOIN cnt ON cnt.h = lh.h
         |GROUP BY lh.doc_id ORDER BY lh.doc_id""".stripMargin,

    // the same digest/quality/token primitives as q18/q20/q43, rolled to
    // one row per source; mean doc tokens mirrors the engine's double
    // shape, the other ratios are bounded integers
    "q159_corpus_card" ->
      s"""WITH pd AS (SELECT source, len($toksSql) AS nt,
         |    CAST(floor(1e6 * ($qualitySqlExpr)) AS BIGINT) AS q_micro,
         |    md5(text) AS digest FROM documents),
         |wd AS (SELECT source, nt, q_micro,
         |    count(*) OVER (PARTITION BY source, digest) AS grp FROM pd),
         |b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(nt) AS BIGINT) AS total_tokens,
         |    CAST(floor((1000000.0 * CAST(sum(nt) AS DOUBLE))
         |      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_doc_tokens_micro,
         |    CAST(sum(q_micro) // count(*) AS BIGINT) AS mean_quality_micro,
         |    CAST(sum(CASE WHEN grp >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS dup_docs
         |  FROM wd GROUP BY 1),
         |v AS (SELECT source, CAST(count(DISTINCT w) AS BIGINT)
         |      AS n_token_types
         |  FROM (SELECT source, unnest($toksSql) AS w FROM documents)
         |  GROUP BY 1)
         |SELECT b.source, n_docs, total_tokens, mean_doc_tokens_micro,
         |  mean_quality_micro,
         |  CAST(COALESCE(v.n_token_types, 0) AS BIGINT) AS n_token_types,
         |  dup_docs,
         |  CAST((1000000 * dup_docs) // n_docs AS BIGINT) AS dup_frac_micro
         |FROM b LEFT JOIN v ON v.source IS NOT DISTINCT FROM b.source
         |ORDER BY b.source NULLS LAST""".stripMargin,

    // both rankings replayed under the one total order: the q155 bucket
    // CTE gives the LSH top-10, a brute CTE gives the true top-10, hits
    // are plain id matches, zero-hit queries kept by the LEFT join
    "q158_lsh_recall" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(24, 64)}),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |proj AS (SELECT p.p // 6 AS tbl, p.p % 6 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS qid, r.vec_id AS nid
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id <> r.vec_id),
         |ls AS (SELECT qid, nid FROM (SELECT qid, nid,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY ${sqlCos("qe", "ne")} DESC, nid) AS rn
         |  FROM cand c JOIN e qe ON qe.vec_id = c.qid
         |    JOIN e ne ON ne.vec_id = c.nid WHERE c.qid < 20)
         |  WHERE rn <= 10),
         |tr AS (SELECT qid, nid FROM (SELECT a.vec_id AS qid,
         |    b.vec_id AS nid,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${sqlCos("a", "b")} DESC, b.vec_id) AS rn
         |  FROM e a JOIN e b ON b.vec_id <> a.vec_id WHERE a.vec_id < 20)
         |  WHERE rn <= 10),
         |h AS (SELECT t.qid, count(*) AS n FROM tr t
         |  JOIN ls l ON l.qid = t.qid AND l.nid = t.nid GROUP BY 1)
         |SELECT q.vec_id AS query_id,
         |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
         |  CAST((1000000 * COALESCE(h.n, 0)) // 10 AS BIGINT) AS recall_micro
         |FROM (SELECT vec_id FROM e WHERE vec_id < 20) q
         |  LEFT JOIN h ON h.qid = q.vec_id
         |ORDER BY query_id""".stripMargin,

    // exhaustive probe over the tombstone-filtered index == brute-force
    // cosine top-10 over the survivor set (q90's lemma + the delete filter)
    "q156_ivf_delete_probe" ->
      """WITH live AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id % 7 <> 1),
        |dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp,
        |    sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
        |  FROM embeddings a, live b
        |  WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, dp / (na * nb) AS cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY dp / (na * nb) DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM dots)
        |SELECT query_id, neighbor_id, cos, rank FROM ranked
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the q155 bucket replay with the label-inequality filter and q104's
    // ranked-negative tail — the raw collision set IS the candidate frame
    // on both sides (the engine feeds lshCandidatePairs, uncapped)
    "q157_hard_negatives_lsh" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(24, 64)}),
         |e AS (SELECT vec_id, embedding, label FROM embeddings),
         |proj AS (SELECT p.p // 6 AS tbl, p.p % 6 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS qid, r.vec_id AS nid
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id <> r.vec_id),
         |scored AS (SELECT c.qid, c.nid, ne.label AS neg_label,
         |    ${sqlCos("qe", "ne")} AS cos
         |  FROM cand c JOIN e qe ON qe.vec_id = c.qid
         |    JOIN e ne ON ne.vec_id = c.nid
         |  WHERE c.qid < 5 AND ne.label <> qe.label),
         |ranked AS (SELECT qid, nid, neg_label, cos,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, nid) AS INTEGER) AS rank FROM scored)
         |SELECT qid AS query_id, nid AS neighbor_id, neg_label, cos, rank
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q26's SRP bucket replay feeds the q160 purity tail: rank over ALL
    // LSH collision candidates (exactly the engine's raw candidate
    // frame), keep rank <= 5, count same-label neighbors; the LEFT JOIN
    // keeps candidate-less vectors in the report as suspects
    "q162_label_purity_lsh" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(24, 64)}),
         |e AS (SELECT vec_id, embedding, label FROM embeddings),
         |proj AS (SELECT p.p // 6 AS tbl, p.p % 6 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS qid, r.vec_id AS nid
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id <> r.vec_id),
         |r AS (SELECT qid, nid, row_number() OVER (
         |    PARTITION BY qid ORDER BY ${sqlCos("qe", "ne")} DESC, nid) AS rn
         |  FROM cand c JOIN e qe ON qe.vec_id = c.qid
         |    JOIN e ne ON ne.vec_id = c.nid),
         |m AS (SELECT r.qid,
         |    sum(CASE WHEN qa.label = na.label THEN 1 ELSE 0 END) AS n_match
         |  FROM r JOIN e qa ON qa.vec_id = r.qid
         |    JOIN e na ON na.vec_id = r.nid
         |  WHERE rn <= 5 GROUP BY 1)
         |SELECT e.vec_id, e.label,
         |  CAST(COALESCE(m.n_match, 0) AS BIGINT) AS n_match,
         |  CAST((1000000 * COALESCE(m.n_match, 0)) // 5 AS BIGINT)
         |    AS purity_micro,
         |  COALESCE(m.n_match, 0) = 0 AS suspect
         |FROM e LEFT JOIN m ON m.qid = e.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // the unigram training replay: seed + 2 unrolled hard-EM rounds, each
    // E-step an exhaustive segmentation enumeration + argmax under the
    // engine's total order; output = the final model table
    "q163_unigram_lm" ->
      s"""WITH RECURSIVE
         |${unigramLmCtes(seedSize = 24, maxPieceLen = 4, rounds = 2)}
         |SELECT piece, cnt, llq AS llq_micro FROM m2 ORDER BY piece""".stripMargin,

    // q101's six BPE rounds (verbatim) UNION the q163 unigram replay UNION
    // q168's six WordPiece rounds, all rolled up per (source, word)
    // through the identical fertility tail
    "q164_tokenizer_bakeoff" -> tokenizerBakeoffSql("TRUE"),

    "q194_image_fixture" -> {
      // the BMP fixtures parsed byte-by-byte from the same hex literals:
      // pixel offset 54 + (h-1-y)*stride + 3x (bottom-up BGR), the Rec.601
      // integer luma, the identical box-filter cell bounds and
      // (sum + n/2) div n rounding
      val vals = bmpFixtures.map { case (id, hex, w, h, st) =>
        s"($id, '$hex', $w, $h, $st)"
      }.mkString(", ")
      s"""WITH fx AS (SELECT * FROM (VALUES $vals) t(img_id, hex, w, h, stride)),
         |pix AS (SELECT img_id, hex, w, h, x.x AS x, y.y AS y,
         |    54 + (h - 1 - y.y) * stride + x.x * 3 AS o
         |  FROM fx, UNNEST(range(0, w)) x(x), UNNEST(range(0, h)) y(y)),
         |lum AS (SELECT img_id, x, y,
         |    (299 * ${hexByteSql("hex", "o+2")}
         |     + 587 * ${hexByteSql("hex", "o+1")}
         |     + 114 * ${hexByteSql("hex", "o")}) // 1000 AS luma
         |  FROM pix),
         |cells AS (SELECT f.img_id, gy.gy AS gy, gx.gx AS gx,
         |    gx.gx * f.w // 2 AS x0,
         |    greatest(gx.gx * f.w // 2 + 1, (gx.gx + 1) * f.w // 2) AS x1,
         |    gy.gy * f.h // 2 AS y0,
         |    greatest(gy.gy * f.h // 2 + 1, (gy.gy + 1) * f.h // 2) AS y1
         |  FROM fx f, UNNEST(range(0, 2)) gy(gy), UNNEST(range(0, 2)) gx(gx))
         |SELECT CAST(c.img_id AS BIGINT) AS img_id,
         |  CAST(c.gy * 2 + c.gx AS BIGINT) AS idx,
         |  CAST((sum(l.luma) + count(*) // 2) // count(*) AS BIGINT) AS luma
         |FROM cells c JOIN lum l ON l.img_id = c.img_id
         |  AND l.x >= c.x0 AND l.x < c.x1 AND l.y >= c.y0 AND l.y < c.y1
         |GROUP BY 1, 2 ORDER BY img_id, idx""".stripMargin
    },

    "q199_image_phash" -> {
      // the q194 byte walk generalized to the 4×4 grid, then the fixed-
      // point DCT replayed from the SAME integer coefficient literals the
      // engine's closure embeds (driver-generated, so equality is by
      // construction, not by libm agreement): rows pass, cols pass, lower
      // median of the 15 ACs by order statistic (rn = (15-1)/2 + 1 = 8;
      // ties don't matter — the median is a VALUE), bit i-1 set iff AC i
      // exceeds it
      val vals = bmpFixtures.map { case (id, hex, w, h, st) =>
        s"($id, '$hex', $w, $h, $st)"
      }.mkString(", ")
      val ct = MultimodalOps.dctCoeffTable(4)
      val ctVals = (for { k <- 0 until 4; x <- 0 until 4 }
        yield s"($k, $x, CAST(${ct(k)(x)} AS BIGINT))").mkString(", ")
      s"""WITH fx AS (SELECT * FROM (VALUES $vals) t(img_id, hex, w, h, stride)),
         |pix AS (SELECT img_id, hex, w, h, x.x AS x, y.y AS y,
         |    54 + (h - 1 - y.y) * stride + x.x * 3 AS o
         |  FROM fx, UNNEST(range(0, w)) x(x), UNNEST(range(0, h)) y(y)),
         |lum AS (SELECT img_id, x, y,
         |    (299 * ${hexByteSql("hex", "o+2")}
         |     + 587 * ${hexByteSql("hex", "o+1")}
         |     + 114 * ${hexByteSql("hex", "o")}) // 1000 AS luma
         |  FROM pix),
         |cells AS (SELECT f.img_id, gy.gy AS gy, gx.gx AS gx,
         |    gx.gx * f.w // 4 AS x0,
         |    greatest(gx.gx * f.w // 4 + 1, (gx.gx + 1) * f.w // 4) AS x1,
         |    gy.gy * f.h // 4 AS y0,
         |    greatest(gy.gy * f.h // 4 + 1, (gy.gy + 1) * f.h // 4) AS y1
         |  FROM fx f, UNNEST(range(0, 4)) gy(gy), UNNEST(range(0, 4)) gx(gx)),
         |grid AS (SELECT c.img_id, c.gy, c.gx,
         |    CAST((sum(l.luma) + count(*) // 2) // count(*) AS BIGINT) AS g
         |  FROM cells c JOIN lum l ON l.img_id = c.img_id
         |    AND l.x >= c.x0 AND l.x < c.x1 AND l.y >= c.y0 AND l.y < c.y1
         |  GROUP BY 1, 2, 3),
         |ct AS (SELECT * FROM (VALUES $ctVals) t(k, x, c)),
         |tmp AS (SELECT g.img_id, g.gy AS y, ct.k AS u,
         |    CAST(sum(g.g * ct.c) AS BIGINT) AS v
         |  FROM grid g JOIN ct ON ct.x = g.gx GROUP BY 1, 2, 3),
         |fc AS (SELECT t.img_id, CAST(ct.k * 4 + t.u AS BIGINT) AS idx,
         |    CAST(sum(t.v * ct.c) AS BIGINT) AS coef
         |  FROM tmp t JOIN ct ON ct.x = t.y GROUP BY 1, 2),
         |med AS (SELECT img_id, coef AS median_ac FROM (
         |    SELECT img_id, coef, row_number() OVER (PARTITION BY img_id
         |      ORDER BY coef, idx) AS rn
         |    FROM fc WHERE idx > 0) WHERE rn = 8),
         |dcv AS (SELECT img_id, coef AS dc FROM fc WHERE idx = 0),
         |bits AS (SELECT fc.img_id, CAST(sum(CASE WHEN fc.coef > m.median_ac
         |      THEN (CAST(1 AS BIGINT) << CAST(fc.idx - 1 AS INTEGER))
         |      ELSE 0 END) AS BIGINT) AS phash
         |  FROM fc JOIN med m USING (img_id) WHERE fc.idx > 0 GROUP BY 1)
         |SELECT CAST(d.img_id AS BIGINT) AS img_id, d.dc, m.median_ac, b.phash
         |FROM dcv d JOIN med m USING (img_id) JOIN bits b USING (img_id)
         |ORDER BY img_id""".stripMargin
    },

    "q195_audio_fixture" -> {
      // the WAV fixtures parsed from hex: PCM16LE channel-0 samples at
      // 44 + i*ch*2, sign-extended; zero crossings = sign transitions over
      // the nonzero-sign subsequence (the engine's zeros-ignored rule)
      val vals = wavFixtures.map { case (id, hex, rate, ch, n) =>
        s"($id, '$hex', $rate, $ch, $n)"
      }.mkString(", ")
      s"""WITH fx AS (SELECT * FROM (VALUES $vals) t(clip_id, hex, rate, ch, n)),
         |samp AS (SELECT clip_id, i.i AS i,
         |    ${hexByteSql("hex", "44 + i.i*ch*2 + 1")} * 256
         |      + ${hexByteSql("hex", "44 + i.i*ch*2")} AS raw
         |  FROM fx, UNNEST(range(0, n)) i(i)),
         |vs AS (SELECT clip_id, i,
         |    CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
         |  FROM samp),
         |sg AS (SELECT clip_id, i,
         |    CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END AS s
         |  FROM vs),
         |nz AS (SELECT clip_id, s, lag(s) OVER (
         |    PARTITION BY clip_id ORDER BY i) AS p FROM sg WHERE s <> 0),
         |z AS (SELECT clip_id, CAST(count(*) AS BIGINT) AS zc FROM nz
         |  WHERE p IS NOT NULL AND s <> p GROUP BY 1)
         |SELECT CAST(f.clip_id AS BIGINT) AS clip_id,
         |  CAST(f.ch AS BIGINT) AS channels,
         |  CAST(f.rate AS BIGINT) AS sample_rate,
         |  CAST(16 AS BIGINT) AS bits,
         |  CAST(f.n AS BIGINT) AS n_frames,
         |  CAST(f.n * 1000 // f.rate AS BIGINT) AS duration_ms,
         |  CAST(COALESCE(z.zc, 0) AS BIGINT) AS zero_crossings
         |FROM fx f LEFT JOIN z ON z.clip_id = f.clip_id
         |ORDER BY clip_id""".stripMargin
    },

    "q193_tokenizer_sampled" ->
      // the q164 replay verbatim with the md5 WORD sample applied to the
      // shared `words` CTE (the q165/q188 rule on the word axis): all
      // three trainings AND the fertility rollups restrict to the same
      // ~8-word sample — the engine's wordSampleK and the scalar
      // subquery greatest(1, count(*) // 8) agree by construction; at
      // sf1 the unigram leg's per-word segmentation enumeration (the
      // 50-minute oracle) shrinks by the sample factor
      tokenizerBakeoffSql(
        s"${ops.DetHash.sqlMd5Hash60("'toksub|' || w")}" +
          " % (SELECT greatest(1, count(*) // 8) FROM words0) = 0"),


    // the WordPiece replay: q97's unrolled rounds plus, per round, the
    // CURRENT symbol unigram counts; the argmax ranks by the identical
    // exact scaled-integer floor quotient (HUGEINT `//` = decimal div)
    "q168_wordpiece_train" -> {
      val E = "chr(30)"
      val SS = s"$E||$E"
      val rounds = (1 to 6).map { k =>
        val prev = s"s${k - 1}"
        s"""u$k AS (
           |  SELECT sym, CAST(sum(freq) AS HUGEINT) AS cnt FROM (
           |    SELECT freq, unnest(string_split(trim(seg, $E), $SS)) AS sym FROM $prev)
           |  GROUP BY 1),
           |p$k AS (
           |  SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(syms)),
           |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr
           |    FROM (SELECT freq, string_split(trim(seg, $E), $SS) AS syms FROM $prev)
           |  ) GROUP BY 1, 2),
           |m$k AS (SELECT p.lhs, p.rhs, p.pair_count,
           |    CAST((CAST(p.pair_count AS HUGEINT) * 1000000000000)
           |      // (ul.cnt * ur.cnt) AS BIGINT) AS score
           |  FROM p$k p JOIN u$k ul ON ul.sym = p.lhs JOIN u$k ur ON ur.sym = p.rhs
           |  ORDER BY score DESC, p.pair_count DESC, p.lhs ASC, p.rhs ASC LIMIT 1),
           |s$k AS (SELECT freq, replace(seg, $E||m.lhs||$SS||m.rhs||$E,
           |    $E||m.lhs||m.rhs||$E) AS seg FROM $prev CROSS JOIN m$k m)""".stripMargin
      }.mkString(",\n")
      val out = (1 to 6).map(k =>
        s"SELECT $k AS merge_rank, lhs, rhs, lhs||rhs AS merged, pair_count, score FROM m$k")
        .mkString("\nUNION ALL\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS freq FROM (SELECT unnest($toksSql) AS w FROM documents)
         |  WHERE len(w) > 0 AND w NOT LIKE '%'||$E||'%' GROUP BY w),
         |s0 AS (SELECT freq,
         |  $SS||array_to_string(list_transform(range(1, len(w)+1), i -> w[i]), $SS)||$SS AS seg
         |  FROM words),
         |$rounds
         |$out
         |ORDER BY merge_rank""".stripMargin
    },

    // the CDC gear walk replayed as a recursive CTE: one state row per
    // (doc, byte position) carrying (rolling hash, chunk start, chunk
    // index); cut rows emit chunks, the final state emits the tail chunk
    "q169_cdc_chunks" ->
      s"""WITH RECURSIVE $cdcWalkCtes
         |SELECT c.doc_id, c.chunk_idx, c.chunk_off, c.chunk_len,
         |  md5(substr(d2.text, c.chunk_off + 1, c.chunk_len)) AS chunk_hash
         |FROM chunks c JOIN documents d2 USING (doc_id)
         |ORDER BY c.doc_id, c.chunk_idx""".stripMargin,

    // same walk, rolled up to the one-row dedup datasheet; the ratio is
    // the identical HUGEINT floor division
    "q170_cdc_dedup_stats" ->
      s"""WITH RECURSIVE $cdcWalkCtes,
         |ch AS (SELECT c.doc_id, c.chunk_len,
         |    md5(substr(d2.text, c.chunk_off + 1, c.chunk_len)) AS chunk_hash
         |  FROM chunks c JOIN documents d2 USING (doc_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_chunks,
         |  CAST(sum(chunk_len) AS BIGINT) AS total_bytes FROM ch),
         |dst AS (SELECT CAST(count(*) AS BIGINT) AS distinct_chunks,
         |  CAST(sum(l) AS BIGINT) AS unique_bytes FROM (
         |    SELECT chunk_hash, min(chunk_len) AS l FROM ch GROUP BY 1))
         |SELECT total_chunks, distinct_chunks, total_bytes, unique_bytes,
         |  CAST((CAST(1000000 AS HUGEINT) * unique_bytes) // total_bytes AS BIGINT)
         |    AS dedup_ratio_micro
         |FROM tot, dst""".stripMargin,

    // same walk, distinct chunk-hash sets per doc, inverted pair join —
    // the jaccardPairs oracle shape on CDC chunks
    "q171_blob_neardup" ->
      s"""WITH RECURSIVE $cdcWalkCtes,
         |ch AS (SELECT c.doc_id, c.chunk_len,
         |    md5(substr(d2.text, c.chunk_off + 1, c.chunk_len)) AS chunk_hash
         |  FROM chunks c JOIN documents d2 USING (doc_id)),
         |sets AS (SELECT DISTINCT doc_id AS id, chunk_hash FROM ch),
         |szs AS (SELECT id, count(*) AS sz FROM sets GROUP BY 1),
         |pr AS (SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS inter
         |  FROM sets l JOIN sets r USING (chunk_hash)
         |  WHERE l.id < r.id GROUP BY 1, 2)
         |SELECT a, b, inter,
         |  CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
         |FROM pr JOIN szs sa ON sa.id = pr.a JOIN szs sb ON sb.id = pr.b
         |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
         |ORDER BY a, b""".stripMargin,

    // the shared BM25 CTEs + the per-query top-5 heap under the one total
    // (score desc, doc asc) order
    "q172_bm25_topk" ->
      s"""WITH $bm25Ctes,
         |rk AS (SELECT query_id, id AS doc_id, score_micro, n_terms_hit,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_micro DESC, id) AS INTEGER) AS rank FROM sc)
         |SELECT query_id, doc_id, score_micro, n_terms_hit, rank
         |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // same pipeline, top-1 + threshold flag; the LEFT JOIN realizes the
    // NULL-row coverage contract for zero-candidate queries
    "q173_bm25_decontam" ->
      s"""WITH $bm25Ctes,
         |top1 AS (SELECT query_id, id AS best_doc, score_micro AS best_score_micro,
         |    n_terms_hit FROM (SELECT query_id, id, score_micro, n_terms_hit,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_micro DESC, id) AS rn FROM sc)
         |  WHERE rn = 1)
         |SELECT q.doc_id AS query_id, t.best_doc, t.best_score_micro,
         |  CAST(COALESCE(t.n_terms_hit, 0) AS BIGINT) AS n_terms_hit,
         |  COALESCE(t.best_score_micro >= 200000000, FALSE) AS contaminated
         |FROM qrs q LEFT JOIN top1 t ON t.query_id = q.doc_id
         |ORDER BY query_id""".stripMargin,

    // the register derivation replayed bit-for-bit (md5 top-p/remainder
    // split, bin()-length rho — identical semantics both engines), the
    // merged row by per-register max, the one estimate expression in the
    // shared double shape
    "q174_hll_cardinality" ->
      s"""WITH tok AS (SELECT source, $toksSql AS tk FROM documents),
         |k AS (SELECT CAST(source AS VARCHAR) AS grp,
         |    tk[t.i] || '_' || tk[t.i + 1] || '_' || tk[t.i + 2] AS key
         |  FROM tok, UNNEST(range(1, len(tk) - 1)) AS t(i)),
         |hh AS (SELECT grp, ${ops.DetHash.sqlMd5Hash60("'hll|' || key")} AS h
         |  FROM k),
         |rr AS (SELECT grp, h // 4503599627370496 AS reg,
         |    h % 4503599627370496 AS rem FROM hh),
         |rg AS (SELECT grp, reg, max(CASE WHEN rem = 0 THEN 53
         |    ELSE 53 - length(bin(rem)) END) AS r FROM rr GROUP BY 1, 2),
         |al AS (SELECT '__ALL__' AS grp, reg, max(r) AS r FROM rg GROUP BY 2),
         |u AS (SELECT * FROM rg UNION ALL SELECT * FROM al),
         |gest AS (SELECT grp, CAST(count(*) AS BIGINT) AS occupied,
         |    CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT)
         |      + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS denom_scaled
         |  FROM u GROUP BY 1),
         |est AS (SELECT grp, occupied, denom_scaled,
         |    CAST(floor((((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
         |          + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE)))
         |        * ((CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE))
         |          * CAST(9007199254740992.0 AS DOUBLE)))
         |      / CAST(denom_scaled AS DOUBLE)) * CAST(1000000.0 AS DOUBLE)
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |      AS est_micro FROM gest),
         |ex AS (SELECT grp, CAST(count(DISTINCT key) AS BIGINT)
         |      AS exact_distinct FROM k GROUP BY 1
         |  UNION ALL SELECT '__ALL__', CAST(count(DISTINCT key) AS BIGINT)
         |    FROM k)
         |SELECT e.grp, x.exact_distinct, e.occupied, e.denom_scaled,
         |  e.est_micro,
         |  CAST(abs(e.est_micro - 1000000 * x.exact_distinct)
         |    // x.exact_distinct AS BIGINT) AS err_abs_ppm
         |FROM est e JOIN ex x ON x.grp IS NOT DISTINCT FROM e.grp
         |ORDER BY e.grp NULLS LAST""".stripMargin,

    // the shared SRP pair CTEs (pr2 = verified pairs, a < b distinct) at
    // the census threshold + the same degree-ordered triangle join
    "q178_neardup_triangles" ->
      s"""WITH ${srpPairsCte(0.2)},
         |und AS (SELECT a, b FROM pr2),
         |dg AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM
         |    (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY 1),
         |o AS (SELECT
         |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
         |      THEN u.a ELSE u.b END AS src,
         |    CASE WHEN (da.dg < db.dg) OR (da.dg = db.dg AND u.a < u.b)
         |      THEN u.b ELSE u.a END AS dst
         |  FROM und u JOIN dg da ON da.v = u.a JOIN dg db ON db.v = u.b),
         |o2 AS (SELECT o.src, o.dst, dg.dg AS dd FROM o
         |  JOIN dg ON dg.v = o.dst),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS t FROM o2 x
         |  JOIN o2 y ON y.src = x.src
         |    AND ((x.dd < y.dd) OR (x.dd = y.dd AND x.dst < y.dst))
         |  JOIN o z ON z.src = x.dst AND z.dst = y.dst),
         |w AS (SELECT CAST(COALESCE(sum(dg * (dg - 1) // 2), 0) AS BIGINT)
         |    AS w FROM dg)
         |SELECT CAST((SELECT count(*) FROM dg) AS BIGINT) AS n_vertices,
         |  CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
         |  w.w AS n_wedges,
         |  tr.t AS n_triangles,
         |  CAST(CASE WHEN w.w > 0 THEN (3000000 * tr.t) // w.w
         |    ELSE 0 END AS BIGINT) AS global_cc_micro
         |FROM tr, w""".stripMargin,

    // the shared SRP pair CTEs at 0.2 + the recursive closure + the q178
    // triangle CTEs, rolled up per component; LEFT JOIN keeps 0-triangle
    // vertices in the per-vertex frame
    "q179_cluster_census" ->
      s"""WITH RECURSIVE ${srpPairsCte(0.2)},
         |${censusTailCte("pr2")}""".stripMargin,

    // the census re-pointed at the BOUNDED graph: mutual-kNN edge
    // selection first, then the identical per-component rollup — the
    // dashboard a dedup owner reads once the operating point is
    // degree-capped rather than threshold-tuned. Served from the shared
    // persisted index, so the candidate stage replays the FROZEN split
    // layout (freeze corpus == the corpus itself, skew line 64)
    "q197_knn_cluster_census" ->
      s"""WITH RECURSIVE ${srpPairsSplitFrozenCte(0.2, 64)},
         |${knnEdgesCte(4)},
         |${censusTailCte("e0")}""".stripMargin,

    // the SRP pair CTEs at 0.2, then the engine's 4 peel rounds unrolled
    // (e0 → e4, one support+filter block each — the q97/q168 unrolled-round
    // pattern) and a final support recount over e4 for the output columns
    "q180_ktruss_edges" ->
      s"""WITH ${srpPairsCte(0.2)},
         |e0 AS MATERIALIZED (SELECT a, b FROM pr2),
         |${(0 until 4).map(i => trussRoundCte(i, 1, withNext = true))
           .mkString(",\n")},
         |${trussRoundCte(4, 1, withNext = false)}
         |SELECT e.a, e.b, COALESCE(s.support, 0) AS support
         |FROM e4 e LEFT JOIN sup4 s ON s.a = e.a AND s.b = e.b
         |ORDER BY e.a, e.b""".stripMargin,

    // the same fixed epoch-week grid (epoch_us floor-div), distinct
    // (user, week) activity, min-week cohorts, integer micro ratio
    "q181_cohort_retention" ->
      """WITH active AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |cohort AS (SELECT u, min(week) AS cohort_week FROM active GROUP BY u),
        |sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
        |  FROM cohort GROUP BY 1),
        |cells AS (SELECT c.cohort_week,
        |    a.week - c.cohort_week AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM active a JOIN cohort c ON c.u = a.u GROUP BY 1, 2)
        |SELECT l.cohort_week, l.week_offset, l.n_active, s.n_cohort,
        |  CAST((1000000 * l.n_active) // s.n_cohort AS BIGINT)
        |    AS retention_micro
        |FROM cells l JOIN sizes s ON s.cohort_week = l.cohort_week
        |ORDER BY l.cohort_week, l.week_offset""".stripMargin,

    // the q180 truss unroll + TWO recursive closures (raw e0, truss e4)
    // rolled up to the one-row keep-one summary each
    "q182_truss_dedup_effect" ->
      s"""WITH RECURSIVE ${srpPairsCte(0.2)},
         |e0 AS MATERIALIZED (SELECT a, b FROM pr2),
         |$trussEffectTailCte""".stripMargin,

    // the q182 oracle with the md5 vertex sample applied to pr2 before
    // everything graph-shaped — constant oracle cost at any sf
    "q188_graph_tier_sampled" -> {
      val samp = (side: String) =>
        s"${ops.DetHash.sqlMd5Hash60(s"'gts|' || CAST($side AS VARCHAR)")}" +
          " % (SELECT greatest(1, count(*) // 500) FROM embeddings) = 0"
      // the sample pushed into the VECTOR scan (value-identical to
      // filtering pairs afterward — buckets are per-vector and a pair
      // needs both endpoints sampled — but the oracle's banding scan and
      // candidate join become sample-sized: at sf10 the pair-level form
      // spilled DuckDB past the disk, this form replays in seconds)
      s"""WITH RECURSIVE ${srpPairsCte(0.2, samp("vec_id"))},
         |e0 AS MATERIALIZED (SELECT a, b FROM pr2),
         |$trussEffectTailCte""".stripMargin
    },

    // the FROZEN-layout SRP pair CTEs at 0.2 (np + split cells derived
    // from the corpus's counts — the persisted index's banding), the
    // mutual-kNN edge selection replayed rank-for-rank (cosines ride the
    // shared exact double shape, ties break on neighbor id), then the
    // q182 tail
    "q189_knn_graph_effect" ->
      s"""WITH RECURSIVE ${srpPairsSplitFrozenCte(0.2, 64)},
         |${knnEdgesCte(4)},
         |$trussEffectTailCte""".stripMargin,

    // one AUTO-sized candidate pass at the 0.2 floor, the grid swept from
    // the same pair list, smallest threshold with mean degree <= target
    // flagged
    "q190_threshold_sweep" ->
      s"""WITH ${srpPairsAutoCte(0.2)},
         |grid AS (SELECT CAST(unnest([200000, 250000, 300000, 350000,
         |    400000, 450000, 500000]) AS BIGINT) AS thr_micro),
         |eg AS (SELECT g.thr_micro, p.a, p.b FROM pr2 p JOIN grid g
         |  ON p.cos >= CAST(g.thr_micro AS DOUBLE) / 1000000.0),
         |deg AS (SELECT thr_micro, v, CAST(count(*) AS BIGINT) AS dg FROM
         |    (SELECT thr_micro, a AS v FROM eg
         |     UNION ALL SELECT thr_micro, b FROM eg)
         |  GROUP BY 1, 2),
         |st AS (SELECT thr_micro, CAST(count(*) AS BIGINT) AS n_vertices,
         |    CAST(sum(dg) // 2 AS BIGINT) AS n_edges,
         |    CAST(max(dg) AS BIGINT) AS max_degree,
         |    CAST((1000000 * sum(dg)) // count(*) AS BIGINT)
         |      AS mean_degree_micro
         |  FROM deg GROUP BY 1),
         |fullsw AS (SELECT g.thr_micro,
         |    CAST(COALESCE(st.n_vertices, 0) AS BIGINT) AS n_vertices,
         |    CAST(COALESCE(st.n_edges, 0) AS BIGINT) AS n_edges,
         |    CAST(COALESCE(st.max_degree, 0) AS BIGINT) AS max_degree,
         |    CAST(COALESCE(st.mean_degree_micro, 0) AS BIGINT)
         |      AS mean_degree_micro
         |  FROM grid g LEFT JOIN st ON st.thr_micro = g.thr_micro),
         |best AS (SELECT min(thr_micro) AS bt FROM fullsw
         |  WHERE mean_degree_micro <= 4000000)
         |SELECT f.thr_micro, f.n_vertices, f.n_edges, f.max_degree,
         |  f.mean_degree_micro,
         |  f.thr_micro IS NOT DISTINCT FROM b.bt AS recommended
         |FROM fullsw f, best b ORDER BY f.thr_micro""".stripMargin,

    // the q190 tail with the vertex sample pushed into the vector scan
    // and the target divided by the sample modulus (integer, the engine's
    // driver-side k == the scalar subquery by construction)
    "q198_threshold_sweep_sampled" -> {
      val samp =
        s"${ops.DetHash.sqlMd5Hash60("'tss|' || CAST(vec_id AS VARCHAR)")}" +
          " % (SELECT greatest(1, count(*) // 500) FROM embeddings) = 0"
      s"""WITH ${srpPairsAutoCte(0.2, samp)},
         |grid AS (SELECT CAST(unnest([200000, 250000, 300000, 350000,
         |    400000, 450000, 500000]) AS BIGINT) AS thr_micro),
         |eg AS (SELECT g.thr_micro, p.a, p.b FROM pr2 p JOIN grid g
         |  ON p.cos >= CAST(g.thr_micro AS DOUBLE) / 1000000.0),
         |deg AS (SELECT thr_micro, v, CAST(count(*) AS BIGINT) AS dg FROM
         |    (SELECT thr_micro, a AS v FROM eg
         |     UNION ALL SELECT thr_micro, b FROM eg)
         |  GROUP BY 1, 2),
         |st AS (SELECT thr_micro, CAST(count(*) AS BIGINT) AS n_vertices,
         |    CAST(sum(dg) // 2 AS BIGINT) AS n_edges,
         |    CAST(max(dg) AS BIGINT) AS max_degree,
         |    CAST((1000000 * sum(dg)) // count(*) AS BIGINT)
         |      AS mean_degree_micro
         |  FROM deg GROUP BY 1),
         |fullsw AS (SELECT g.thr_micro,
         |    CAST(COALESCE(st.n_vertices, 0) AS BIGINT) AS n_vertices,
         |    CAST(COALESCE(st.n_edges, 0) AS BIGINT) AS n_edges,
         |    CAST(COALESCE(st.max_degree, 0) AS BIGINT) AS max_degree,
         |    CAST(COALESCE(st.mean_degree_micro, 0) AS BIGINT)
         |      AS mean_degree_micro
         |  FROM grid g LEFT JOIN st ON st.thr_micro = g.thr_micro),
         |best AS (SELECT min(thr_micro) AS bt FROM fullsw
         |  WHERE mean_degree_micro <= 4000000
         |    // (SELECT greatest(1, count(*) // 500) FROM embeddings))
         |SELECT f.thr_micro, f.n_vertices, f.n_edges, f.max_degree,
         |  f.mean_degree_micro,
         |  f.thr_micro IS NOT DISTINCT FROM b.bt AS recommended
         |FROM fullsw f, best b ORDER BY f.thr_micro""".stripMargin
    },

    // the q189 oracle with the md5 vertex sample applied to the candidate
    // pairs BEFORE ranking (the sample's own kNN graph — both engines rank
    // over the same restricted candidate set)
    "q191_knn_graph_sampled" -> {
      val samp = (side: String) =>
        s"${ops.DetHash.sqlMd5Hash60(s"'kgs|' || CAST($side AS VARCHAR)")}" +
          " % (SELECT greatest(1, count(*) // 500) FROM embeddings) = 0"
      // sample pushed into the vector scan (the q188 note) — pr2 is
      // already the sample's candidate set, so ranking needs no filter;
      // np sizes to the SAMPLE's count, exactly as the engine's
      // knnGraphAuto counts its (filtered) input
      s"""WITH RECURSIVE ${srpPairsAutoCte(0.2, samp("vec_id"))},
         |${knnEdgesCte(4)},
         |$trussEffectTailCte""".stripMargin
    },

    // the GLOBAL recursive closure over ALL pairs at 0.4 (auto-sized
    // planes, singletons seeded) — the incremental engine path must
    // reproduce it exactly; equality of the full labelings IS the
    // correctness claim
    "q192_incremental_cc" ->
      s"""WITH RECURSIVE $semanticCcAutoCte
         |SELECT x AS vec_id, comp FROM cc ORDER BY vec_id""".stripMargin,

    // identical global-closure oracle as q192: the persisted lifecycle
    // must serve exactly what the in-session incremental path computes
    "q196_persisted_cluster_maintain" ->
      s"""WITH RECURSIVE $semanticCcAutoCte
         |SELECT x AS vec_id, comp FROM cc ORDER BY vec_id""".stripMargin,

    // the batch kNN graph over the FULL corpus at the layout the engine
    // FROZE on the base (vec_id % 5 ≠ 0): plane count AND hot-cell split
    // depths both re-derived from the base subset's counts by the same
    // integer rules, every later-epoch vector re-keyed by them — the
    // incremental ensure + maintain path must serve exactly this edge
    // set, cosines included (the shared exact-double shape)
    "q200_knn_index_maintain" ->
      s"""WITH ${srpPairsSplitFrozenCte(0.2, 8,
             freezeFilter = "vec_id % 5 <> 0")},
         |${knnEdgesCte(4)}
         |SELECT a, b, cos FROM e0 ORDER BY a, b""".stripMargin,

    // delete replay: the live corpus re-keyed at the layout the FULL
    // ensure corpus froze (planes + split cells), then the identical
    // mutual-top-k tail — the engine's tombstone + touched-vertex
    // re-rank must land exactly here
    "q204_knn_index_delete" ->
      s"""WITH ${srpPairsSplitFrozenCte(0.2, 8,
             memberFilter = "vec_id % 7 <> 3")},
         |${knnEdgesCte(4)}
         |SELECT a, b, cos FROM e0 ORDER BY a, b""".stripMargin,

    // occupancy rolled straight off the shared banding CTE: every output
    // is integer (counts, // division, the even-product halving) so the
    // skew flag itself replays
    "q201_srp_occupancy_audit" ->
      s"""WITH ${srpBandsAutoCte()},
         |occ AS (SELECT tbl, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1, 2)
         |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_vecs,
         |  CAST((SELECT np FROM np) AS BIGINT) AS planes,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(max(c) AS BIGINT) AS max_occupancy,
         |  CAST((1000000 * (SELECT count(*) FROM e) * 6) // count(*)
         |    AS BIGINT) AS mean_occ_micro,
         |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs_bound,
         |  max(c) > 64 AS skewed
         |FROM occ""".stripMargin,

    // the split-rule replay: same plane family, bucket counts → per-cell
    // δ by the identical integer-shift rule, extension-bit re-keying,
    // then the shared candidate + exact-cosine verify tail
    "q202_srp_split_pairs" ->
      s"""WITH ${srpPairsSplitAutoCte(0.2, 8)}
         |SELECT a, b, cos FROM pr2 ORDER BY a, b""".stripMargin,

    // the shard-and-union replay: same id-range rule, same per-shard
    // integer-shift plane sizing, candidates confined to (shard, tbl,
    // bucket) — within-shard recall IS the semantics, so the oracle and
    // the engine must agree on exactly which cross-shard pairs vanish
    "q205_srp_sharded_pairs" ->
      s"""WITH ${srpPairsShardedCte(0.2, 4)}
         |SELECT a, b, cos FROM pr2 ORDER BY a, b""".stripMargin,

    // the VIDEO replay: the oracle walks the RIFF chunk grammar itself
    // (recursive CTE — fourcc + u32-LE size + even pad, descending into
    // LIST bodies), finds avih/movi structurally, takes '00db'/'00dc'
    // chunks whose payload magic is BMP/JPEG as frames, reads each
    // frame's OWN BMP header for dimensions, and runs the q199 luma →
    // grid → fixed-point-DCT → median → bits tail per frame. No offset,
    // size, or dimension is fed to it
    "q203_video_fixture" -> {
      val vals = aviFixtures.map { case (id, hex) => s"($id, '$hex')" }
        .mkString(", ")
      val ct = MultimodalOps.dctCoeffTable(4)
      val ctVals = (for { k <- 0 until 4; x <- 0 until 4 }
        yield s"($k, $x, CAST(${ct(k)(x)} AS BIGINT))").mkString(", ")
      def sz(o: String) = u32leSql("f.hex", o)
      s"""WITH RECURSIVE
         |fx AS (SELECT * FROM (VALUES $vals) t(vid_id, hex)),
         |walk AS (
         |  SELECT vid_id, 12 AS o FROM fx
         |  UNION ALL
         |  SELECT w.vid_id,
         |    CASE WHEN substring(f.hex, w.o * 2 + 1, 8) = '4c495354'
         |      THEN w.o + 12
         |      ELSE w.o + 8 + ${sz("w.o+4")} + (${sz("w.o+4")} % 2) END
         |  FROM walk w JOIN fx f ON f.vid_id = w.vid_id
         |  WHERE w.o + 8 <= length(f.hex) // 2),
         |ch AS (SELECT w.vid_id, w.o,
         |    substring(f.hex, w.o * 2 + 1, 8) AS fcc, ${sz("w.o+4")} AS sz,
         |    substring(f.hex, (w.o + 8) * 2 + 1, 8) AS ltype
         |  FROM walk w JOIN fx f ON f.vid_id = w.vid_id
         |  WHERE w.o + 8 <= length(f.hex) // 2),
         |avih AS (SELECT c.vid_id, ${u32leSql("f.hex", "c.o+8")} AS mpf,
         |    ${u32leSql("f.hex", "c.o+24")} AS declared
         |  FROM ch c JOIN fx f ON f.vid_id = c.vid_id
         |  WHERE c.fcc = '61766968'),
         |mv AS (SELECT vid_id, o + 12 AS mstart, o + 8 + sz AS mend
         |  FROM ch WHERE fcc = '4c495354' AND ltype = '6d6f7669'),
         |fr AS (SELECT c.vid_id, c.o + 8 AS base, c.sz,
         |    row_number() OVER (PARTITION BY c.vid_id ORDER BY c.o) - 1
         |      AS frame_idx
         |  FROM ch c JOIN mv ON mv.vid_id = c.vid_id
         |    AND c.o >= mv.mstart AND c.o < mv.mend
         |  JOIN fx f ON f.vid_id = c.vid_id
         |  WHERE substring(c.fcc, 1, 2) BETWEEN '30' AND '39'
         |    AND substring(c.fcc, 3, 2) BETWEEN '30' AND '39'
         |    AND substring(c.fcc, 5, 4) IN ('6462', '6463')
         |    AND c.sz >= 2
         |    AND substring(f.hex, (c.o + 8) * 2 + 1, 4) IN ('424d', 'ffd8')),
         |nf AS (SELECT vid_id, CAST(count(*) AS BIGINT) AS n_frames
         |  FROM fr GROUP BY 1),
         |fw AS (SELECT r.vid_id, r.frame_idx, r.base,
         |    ${u32leSql("f.hex", "r.base+18")} AS w,
         |    ${u32leSql("f.hex", "r.base+22")} AS h,
         |    ((${u32leSql("f.hex", "r.base+18")} * 3 + 3) // 4) * 4 AS stride
         |  FROM fr r JOIN fx f ON f.vid_id = r.vid_id),
         |pix AS (SELECT d.vid_id, d.frame_idx, d.w, d.h, x.x AS x, y.y AS y,
         |    d.base + 54 + (d.h - 1 - y.y) * d.stride + x.x * 3 AS o
         |  FROM fw d, UNNEST(range(0, d.w)) x(x), UNNEST(range(0, d.h)) y(y)),
         |lum AS (SELECT p.vid_id, p.frame_idx, p.x, p.y,
         |    (299 * ${hexByteSql("f.hex", "p.o+2")}
         |     + 587 * ${hexByteSql("f.hex", "p.o+1")}
         |     + 114 * ${hexByteSql("f.hex", "p.o")}) // 1000 AS luma
         |  FROM pix p JOIN fx f ON f.vid_id = p.vid_id),
         |cells AS (SELECT d.vid_id, d.frame_idx, gy.gy AS gy, gx.gx AS gx,
         |    gx.gx * d.w // 4 AS x0,
         |    greatest(gx.gx * d.w // 4 + 1, (gx.gx + 1) * d.w // 4) AS x1,
         |    gy.gy * d.h // 4 AS y0,
         |    greatest(gy.gy * d.h // 4 + 1, (gy.gy + 1) * d.h // 4) AS y1
         |  FROM fw d, UNNEST(range(0, 4)) gy(gy), UNNEST(range(0, 4)) gx(gx)),
         |grid AS (SELECT c.vid_id, c.frame_idx, c.gy, c.gx,
         |    CAST((sum(l.luma) + count(*) // 2) // count(*) AS BIGINT) AS g
         |  FROM cells c JOIN lum l ON l.vid_id = c.vid_id
         |    AND l.frame_idx = c.frame_idx
         |    AND l.x >= c.x0 AND l.x < c.x1 AND l.y >= c.y0 AND l.y < c.y1
         |  GROUP BY 1, 2, 3, 4),
         |ct AS (SELECT * FROM (VALUES $ctVals) t(k, x, c)),
         |tmp AS (SELECT g.vid_id, g.frame_idx, g.gy AS y, ct.k AS u,
         |    CAST(sum(g.g * ct.c) AS BIGINT) AS v
         |  FROM grid g JOIN ct ON ct.x = g.gx GROUP BY 1, 2, 3, 4),
         |fc AS (SELECT t.vid_id, t.frame_idx,
         |    CAST(ct.k * 4 + t.u AS BIGINT) AS idx,
         |    CAST(sum(t.v * ct.c) AS BIGINT) AS coef
         |  FROM tmp t JOIN ct ON ct.x = t.y GROUP BY 1, 2, 3),
         |med AS (SELECT vid_id, frame_idx, coef AS median_ac FROM (
         |    SELECT vid_id, frame_idx, coef, row_number() OVER (
         |      PARTITION BY vid_id, frame_idx ORDER BY coef, idx) AS rn
         |    FROM fc WHERE idx > 0) WHERE rn = 8),
         |dcv AS (SELECT vid_id, frame_idx, coef AS dc FROM fc WHERE idx = 0),
         |bits AS (SELECT fc.vid_id, fc.frame_idx,
         |    CAST(sum(CASE WHEN fc.coef > m.median_ac
         |      THEN (CAST(1 AS BIGINT) << CAST(fc.idx - 1 AS INTEGER))
         |      ELSE 0 END) AS BIGINT) AS phash
         |  FROM fc JOIN med m ON m.vid_id = fc.vid_id
         |    AND m.frame_idx = fc.frame_idx
         |  WHERE fc.idx > 0 GROUP BY 1, 2)
         |SELECT CAST(r.vid_id AS BIGINT) AS vid_id,
         |  CAST(r.frame_idx AS BIGINT) AS frame_idx, nf.n_frames,
         |  CAST(a.declared AS BIGINT) AS declared_frames,
         |  CAST(a.mpf AS BIGINT) AS micros_per_frame,
         |  d.dc, m.median_ac, b.phash
         |FROM fr r
         |  JOIN nf ON nf.vid_id = r.vid_id
         |  JOIN avih a ON a.vid_id = r.vid_id
         |  JOIN dcv d ON d.vid_id = r.vid_id AND d.frame_idx = r.frame_idx
         |  JOIN med m ON m.vid_id = r.vid_id AND m.frame_idx = r.frame_idx
         |  JOIN bits b ON b.vid_id = r.vid_id AND b.frame_idx = r.frame_idx
         |ORDER BY vid_id, frame_idx""".stripMargin
    },

    // the MJPEG replay: the same self-derived RIFF walk, then for each
    // JPEG frame a SEGMENT walk over the frame's own marker stream
    // (FF xx + u16-BE length) until an SOF marker, whose height/width
    // fields at +5/+7 are the dimensions — the engine reports what
    // ImageIO DECODED, the oracle what the container DECLARES, and the
    // gate is that they agree byte-for-byte (BMP frames in the mixed
    // stream read their BMP header instead)
    "q206_mjpeg_fixture" -> {
      val vals = mjpegAviFixtures.map { case (id, hex) => s"($id, '$hex')" }
        .mkString(", ")
      def sz(o: String) = u32leSql("f.hex", o)
      def jb(o: String) = hexByteSql("f.hex", o)
      // every SOF marker code: C0-C3, C5-C7, C9-CB, CD-CF (C4/C8/CC are
      // DHT/JPG/DAC); the baseline encoder emits C0
      val sofSet = "(192,193,194,195,197,198,199,201,202,203,205,206,207)"
      s"""WITH RECURSIVE
         |fx AS (SELECT * FROM (VALUES $vals) t(vid_id, hex)),
         |walk AS (
         |  SELECT vid_id, 12 AS o FROM fx
         |  UNION ALL
         |  SELECT w.vid_id,
         |    CASE WHEN substring(f.hex, w.o * 2 + 1, 8) = '4c495354'
         |      THEN w.o + 12
         |      ELSE w.o + 8 + ${sz("w.o+4")} + (${sz("w.o+4")} % 2) END
         |  FROM walk w JOIN fx f ON f.vid_id = w.vid_id
         |  WHERE w.o + 8 <= length(f.hex) // 2),
         |ch AS (SELECT w.vid_id, w.o,
         |    substring(f.hex, w.o * 2 + 1, 8) AS fcc, ${sz("w.o+4")} AS sz,
         |    substring(f.hex, (w.o + 8) * 2 + 1, 8) AS ltype
         |  FROM walk w JOIN fx f ON f.vid_id = w.vid_id
         |  WHERE w.o + 8 <= length(f.hex) // 2),
         |avih AS (SELECT c.vid_id, ${u32leSql("f.hex", "c.o+8")} AS mpf,
         |    ${u32leSql("f.hex", "c.o+24")} AS declared
         |  FROM ch c JOIN fx f ON f.vid_id = c.vid_id
         |  WHERE c.fcc = '61766968'),
         |mv AS (SELECT vid_id, o + 12 AS mstart, o + 8 + sz AS mend
         |  FROM ch WHERE fcc = '4c495354' AND ltype = '6d6f7669'),
         |fr AS (SELECT c.vid_id, c.o + 8 AS base, c.sz,
         |    substring(f.hex, (c.o + 8) * 2 + 1, 4) AS magic,
         |    row_number() OVER (PARTITION BY c.vid_id ORDER BY c.o) - 1
         |      AS frame_idx
         |  FROM ch c JOIN mv ON mv.vid_id = c.vid_id
         |    AND c.o >= mv.mstart AND c.o < mv.mend
         |  JOIN fx f ON f.vid_id = c.vid_id
         |  WHERE substring(c.fcc, 1, 2) BETWEEN '30' AND '39'
         |    AND substring(c.fcc, 3, 2) BETWEEN '30' AND '39'
         |    AND substring(c.fcc, 5, 4) IN ('6462', '6463')
         |    AND c.sz >= 2
         |    AND substring(f.hex, (c.o + 8) * 2 + 1, 4) IN ('424d', 'ffd8')),
         |nf AS (SELECT vid_id, CAST(count(*) AS BIGINT) AS n_frames
         |  FROM fr GROUP BY 1),
         |jw AS (
         |  SELECT vid_id, frame_idx, base, base + 2 AS o
         |  FROM fr WHERE magic = 'ffd8'
         |  UNION ALL
         |  SELECT j.vid_id, j.frame_idx, j.base,
         |    j.o + 2 + 256 * ${jb("j.o+2")} + ${jb("j.o+3")}
         |  FROM jw j JOIN fx f ON f.vid_id = j.vid_id
         |  WHERE ${jb("j.o+1")} NOT IN $sofSet
         |    AND j.o + 9 <= length(f.hex) // 2),
         |sof AS (SELECT j.vid_id, j.frame_idx,
         |    256 * ${jb("j.o+7")} + ${jb("j.o+8")} AS w,
         |    256 * ${jb("j.o+5")} + ${jb("j.o+6")} AS h
         |  FROM jw j JOIN fx f ON f.vid_id = j.vid_id
         |  WHERE ${jb("j.o+1")} IN $sofSet),
         |dims AS (
         |  SELECT vid_id, frame_idx, w, h FROM sof
         |  UNION ALL
         |  SELECT r.vid_id, r.frame_idx,
         |    ${u32leSql("f.hex", "r.base+18")} AS w,
         |    ${u32leSql("f.hex", "r.base+22")} AS h
         |  FROM fr r JOIN fx f ON f.vid_id = r.vid_id
         |  WHERE r.magic = '424d')
         |SELECT CAST(r.vid_id AS BIGINT) AS vid_id,
         |  CAST(r.frame_idx AS BIGINT) AS frame_idx, nf.n_frames,
         |  CAST(a.declared AS BIGINT) AS declared_frames,
         |  CAST(a.mpf AS BIGINT) AS micros_per_frame,
         |  CAST((a.mpf * nf.n_frames) // 1000 AS BIGINT) AS duration_ms,
         |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height
         |FROM fr r
         |  JOIN nf ON nf.vid_id = r.vid_id
         |  JOIN avih a ON a.vid_id = r.vid_id
         |  JOIN dims d ON d.vid_id = r.vid_id AND d.frame_idx = r.frame_idx
         |ORDER BY vid_id, frame_idx""".stripMargin
    },

    // the canonical-prefix 6-bit key, ONE global row_number (fine in the
    // oracle — the engine's two-level construction is the scale shape),
    // the w-band position join, the q21 shingle-set verify
    "q187_snm_pairs" -> {
      val keySql = (0 until 8).map { i =>
        s"""CAST(CASE WHEN ascii(substring(canon, ${i + 1}, 1)) BETWEEN 48 AND 57
           |  THEN ascii(substring(canon, ${i + 1}, 1)) - 47
           |  WHEN ascii(substring(canon, ${i + 1}, 1)) BETWEEN 97 AND 122
           |  THEN ascii(substring(canon, ${i + 1}, 1)) - 86
           |  ELSE 0 END AS BIGINT) * ${1L << (6 * (7 - i))}""".stripMargin
      }.mkString(" + ")
      s"""WITH $hashedShinglesCte,
         |cn AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
         |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS canon
         |  FROM documents),
         |kx AS (SELECT doc_id, $keySql AS key FROM cn),
         |p AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY key, doc_id) - 1 AS pos FROM kx),
         |cand AS (SELECT a.doc_id AS a, b.doc_id AS b FROM p a JOIN p b
         |  ON b.pos > a.pos AND b.pos <= a.pos + 10),
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized)
         |SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS inter,
         |  CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) AS jaccard
         |FROM cand c JOIN inv l ON l.id = c.a
         |  JOIN inv r ON r.id = c.b AND r.tok = l.tok
         |GROUP BY c.a, c.b, l.sz, r.sz
         |HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.1
         |ORDER BY c.a, c.b""".stripMargin
    },

    // q109's padc replay with the md5 auto-sized sample substituted into
    // both the LUT and probe-selection CTEs — constant |queries| at any sf
    "q186_ivfpq_probe_scaled" -> {
      val samp = s"${ops.DetHash.sqlMd5Hash60("'annq|' || CAST(q.vec_id AS VARCHAR)")}" +
        " % (SELECT greatest(1, count(*) // 50) FROM embeddings) = 0"
      s"""WITH ${pqOracleCtes(samp)},
         |${coarseOracleCtes(samp)},
         |padc AS (SELECT l.query_id, e.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc_dist
         |  FROM enc e
         |  JOIN cassign ca ON ca.vec_id = e.vec_id
         |  JOIN cprobe p ON p.cell = ca.cell
         |  JOIN lut l ON l.m = e.m AND l.cell = e.cell AND l.query_id = p.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, adc_dist, rank FROM (
         |  SELECT query_id, vec_id, adc_dist, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
         |  FROM padc)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // the same instrumented twins, the same canonicalization chain (with
    // DuckDB's explicit 'g' flags), md5 hex digests compared directly
    "q185_canonical_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |pert AS (SELECT doc_id + 1000000000000 AS doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN upper(text)
        |      ELSE regexp_replace(text, ' ', '  ', 'g') || ' !!' END AS text
        |  FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        |c AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS canon_md5
        |  FROM u)
        |SELECT canon_md5, CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  count(*) AS copies
        |FROM c GROUP BY 1 HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,

    // the recursive closure (singletons seeded), the q42 bucket rule on
    // comp instead of doc_id, the same leak self-join (provably empty)
    "q184_cluster_safe_split" -> {
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'split|' || CAST(comp AS VARCHAR)")} % 10000"
      s"""WITH RECURSIVE ${srpPairsSplitFrozenCte(0.2, 64)},
         |${knnEdgesCte(4)},
         |${ccTailCteOver("e0")},
         |asg AS (SELECT x AS vec_id, comp,
         |    CASE WHEN $bucket < 8000 THEN 0
         |      WHEN $bucket < 9000 THEN 1 ELSE 2 END AS split
         |  FROM cc),
         |leaks AS (SELECT sa.split, CAST(count(*) AS BIGINT) AS n_leak_pairs
         |  FROM e0 p JOIN asg sa ON sa.vec_id = p.a
         |    JOIN asg sb ON sb.vec_id = p.b
         |  WHERE sa.split <> sb.split GROUP BY 1)
         |SELECT g.split, g.n_docs, g.n_clusters, g.max_comp,
         |  COALESCE(l.n_leak_pairs, 0) AS n_leak_pairs
         |FROM (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT comp) AS BIGINT) AS n_clusters,
         |    CAST(max(comp) AS BIGINT) AS max_comp
         |  FROM asg GROUP BY 1) g
         |LEFT JOIN leaks l ON l.split = g.split
         |ORDER BY g.split""".stripMargin
    },

    // the same per-user lead window and row normalization
    "q183_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM cnt GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.n_from,
        |  CAST((1000000 * c.n) // t.n_from AS BIGINT) AS p_micro
        |FROM cnt c JOIN tot t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // the same lag-suppress + version/lead windows under the (ts, id)
    // total order
    "q176_scd2_history" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev FROM events),
        |s AS (SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id,
        |    CAST(row_number() OVER w AS INTEGER) AS version,
        |    event_type AS attr,
        |    epoch_us(ts) AS effective_from_us,
        |    lead(epoch_us(ts)) OVER w AS effective_to_us
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, version, attr, effective_from_us, effective_to_us,
        |  effective_to_us IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // the oracle replays the as-of as an interval join (correct, quadratic
    // — oracle-only); half-open [from, to) makes the empty interval of an
    // equal-timestamp version pair drop out exactly as the engine's
    // version-ordered window tie does
    "q177_scd2_asof" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type <> 'view'),
        |s AS (SELECT user_id, ts, event_id, event_type FROM c
        |  WHERE prev IS NULL OR event_type <> prev),
        |v AS (SELECT user_id, event_type AS attr,
        |    epoch_us(ts) AS effective_from_us,
        |    lead(epoch_us(ts)) OVER w AS effective_to_us
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
        |  WHERE event_type = 'view'),
        |j AS (SELECT f.event_id, f.user_id, v.attr
        |  FROM f LEFT JOIN v ON v.user_id = f.user_id
        |    AND v.effective_from_us <= f.t
        |    AND (v.effective_to_us IS NULL OR f.t < v.effective_to_us))
        |SELECT attr, CAST(count(*) AS BIGINT) AS n_views,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY attr ORDER BY attr NULLS LAST""".stripMargin,

    // GROUP BY CUBE with the same GROUPING bitmask convention (first dim =
    // most significant bit in both engines); q159's mean double shape
    "q175_mixture_cube" ->
      s"""WITH pd AS (SELECT CAST(source AS VARCHAR) AS source,
         |    CAST(lang AS VARCHAR) AS lang,
         |    CAST(len($toksSql) AS BIGINT) AS nt FROM documents)
         |SELECT CAST(GROUPING(source, lang) AS INTEGER) AS grouping_lvl,
         |  source, lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS total_tokens,
         |  CAST(floor((1000000.0 * CAST(sum(nt) AS DOUBLE))
         |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mean_doc_tokens_micro
         |FROM pd GROUP BY CUBE (source, lang)
         |ORDER BY grouping_lvl, source NULLS LAST, lang NULLS LAST""".stripMargin,

    // q26's SRP bucket replay feeds the q146 density tail: rank over ALL
    // LSH candidates and keep rank 5 — exactly the raw collision frame
    // the engine now feeds the kernel (no interposed top-k).
    // The LEFT JOIN realizes the NULL-row coverage contract.
    "q155_knn_density_lsh" ->
      s"""WITH planes AS (${ops.DetHash.sqlPlanesCte(24, 64)}),
         |e AS (SELECT vec_id, embedding FROM embeddings),
         |proj AS (SELECT p.p // 6 AS tbl, p.p % 6 AS i, e.vec_id,
         |    list_sum(list_transform(list_zip(e.embedding, p.cs), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS pr
         |  FROM e CROSS JOIN planes p),
         |b AS (SELECT tbl, vec_id,
         |    sum(CASE WHEN pr >= 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS bucket
         |  FROM proj GROUP BY tbl, vec_id),
         |cand AS (SELECT DISTINCT l.vec_id AS qid, r.vec_id AS nid
         |  FROM b l JOIN b r ON l.tbl = r.tbl AND l.bucket = r.bucket
         |    AND l.vec_id <> r.vec_id),
         |scored AS (SELECT c.qid, c.nid, ${sqlCos("qe", "ne")} AS cos
         |  FROM cand c JOIN e qe ON qe.vec_id = c.qid
         |    JOIN e ne ON ne.vec_id = c.nid),
         |r AS (SELECT qid, cos, row_number() OVER (
         |    PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM scored),
         |kn AS (SELECT qid AS vec_id, cos AS knn_cos,
         |    CAST(floor(cos * 1e6) AS BIGINT) AS knn_micro
         |  FROM r WHERE rn = 5),
         |t AS (SELECT count(*) AS n FROM kn),
         |h AS (SELECT knn_micro, count(*) AS c FROM kn GROUP BY 1),
         |cm AS (SELECT knn_micro, sum(c) OVER (ORDER BY knn_micro
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM h),
         |thr AS (SELECT min(knn_micro) AS thr FROM cm, t
         |  WHERE cum * 100 >= n * 5)
         |SELECT e.vec_id, k.knn_cos, k.knn_micro,
         |  k.knn_micro <= thr.thr AS low_density
         |FROM e LEFT JOIN kn k USING (vec_id), thr
         |ORDER BY e.vec_id""".stripMargin,

    // global positions via a literal window cumsum over doc order, per-type
    // min position, the same ceil checkpoint integer, grid left join
    "q144_vocab_growth" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |nt AS (SELECT doc_id, toks, len(toks) AS nt FROM tk),
         |off AS (SELECT doc_id, toks, nt, COALESCE(sum(nt) OVER (
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND 1 PRECEDING), 0) AS off FROM nt),
         |pos AS (SELECT off, toks, unnest(range(1, nt + 1)) AS i FROM off),
         |fp AS (SELECT toks[CAST(i AS INT)] AS tok,
         |    min(off + i - 1) AS first_pos FROM pos GROUP BY 1),
         |tot AS (SELECT sum(nt) AS total_tokens FROM nt),
         |nv AS (SELECT CAST((10 * (first_pos + 1) + total_tokens - 1)
         |      // total_tokens AS INT) AS checkpoint,
         |    count(*) AS new_types
         |  FROM fp, tot GROUP BY 1),
         |grid AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS checkpoint,
         |    total_tokens FROM tot)
         |SELECT g.checkpoint,
         |  CAST((g.total_tokens * g.checkpoint) // 10 AS BIGINT)
         |    AS cutoff_tokens,
         |  CAST(COALESCE(nv.new_types, 0) AS BIGINT) AS new_types,
         |  CAST(sum(COALESCE(nv.new_types, 0)) OVER (ORDER BY g.checkpoint
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
         |FROM grid g LEFT JOIN nv USING (checkpoint)
         |ORDER BY g.checkpoint""".stripMargin,

    // per-span mask draw, run starts via lag, sentinel numbers via a
    // cumulative run count, strings via ordered string_agg of pieces
    "q145_span_corrupt" -> {
      val hq = ops.DetHash.sqlMd5Hash60(
        "'t5|' || CAST(doc_id AS VARCHAR) || '|' || CAST((i - 1) // 3 AS VARCHAR)")
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |pos AS (SELECT doc_id, toks, len(toks) AS n,
         |    unnest(range(1, len(toks) + 1)) AS i FROM tk),
         |tok AS (SELECT doc_id, n, i, toks[CAST(i AS INT)] AS tok,
         |    $hq % 100 < 15 AS m FROM pos),
         |r AS (SELECT *, m AND NOT COALESCE(lag(m) OVER (
         |    PARTITION BY doc_id ORDER BY i), false) AS run_start FROM tok),
         |k AS (SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END) OVER (
         |    PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) - 1
         |      AS kidx FROM r)
         |SELECT doc_id, max(n) AS n_tokens,
         |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_spans,
         |  COALESCE(string_agg(CASE WHEN NOT m THEN tok
         |      WHEN run_start THEN '<X' || kidx || '>' END,
         |    ' ' ORDER BY i), '') AS input_text,
         |  COALESCE(string_agg(CASE WHEN m THEN
         |      CASE WHEN run_start THEN '<X' || kidx || '> ' || tok
         |        ELSE tok END END, ' ' ORDER BY i), '') AS target_text
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // q22's brute-force pair set + q42's split CASE per side + the
    // least/greatest unordered rollup — every cell an integer fact
    "q134_split_leakage" -> {
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'split|' || CAST(doc_id AS VARCHAR)")} % 10000"
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |spl AS (SELECT doc_id, CASE WHEN $bucket < 8000 THEN 0
         |    WHEN $bucket < 9000 THEN 1 ELSE 2 END AS split FROM documents),
         |px AS (SELECT least(x.split, y.split) AS split_x,
         |    greatest(x.split, y.split) AS split_y
         |  FROM pr JOIN spl x ON x.doc_id = pr.a JOIN spl y ON y.doc_id = pr.b)
         |SELECT split_x, split_y, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CASE WHEN split_x <> split_y THEN CAST(1 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS crossing
         |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // per-dim BIGINT sums → micro-quantized means → exact integer squared
    // distance + one sqrt; the same NULL-first pair convention as q118
    "q133_source_centroids" ->
      s"""WITH mxq AS (SELECT max(list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE))))) AS mx FROM embeddings),
         |scl AS (SELECT CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale
         |  FROM mxq),
         |qv AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS qv
         |  FROM embeddings, scl),
         |j AS (SELECT d.source, q.qv
         |  FROM qv q LEFT JOIN documents d ON d.doc_id = q.vec_id),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n
         |  FROM j GROUP BY 1),
         |ds AS (SELECT source, t.d AS d, CAST(sum(qv[t.d]) AS BIGINT) AS s
         |  FROM j, UNNEST(range(1, 65)) t(d) GROUP BY 1, 2),
         |m AS (SELECT ds.source, ds.d, p.n,
         |    CAST(floor(1e6 * CAST(ds.s AS DOUBLE) / CAST(p.n AS DOUBLE))
         |      AS BIGINT) AS mv
         |  FROM ds JOIN per p ON p.source IS NOT DISTINCT FROM ds.source),
         |pairs AS (SELECT x.source AS source_x, y.source AS source_y,
         |    max(x.n) AS n_x, max(y.n) AS n_y,
         |    CAST(sum((x.mv - y.mv) * (x.mv - y.mv)) AS BIGINT) AS l2_micro2
         |  FROM m x JOIN m y ON x.d = y.d
         |    AND ((x.source IS NULL AND y.source IS NOT NULL)
         |      OR x.source < y.source)
         |  GROUP BY 1, 2)
         |SELECT source_x, source_y, n_x, n_y, l2_micro2,
         |  CAST(floor(sqrt(CAST(l2_micro2 AS DOUBLE))) AS BIGINT) AS dist_micro
         |FROM pairs ORDER BY source_x NULLS FIRST, source_y""".stripMargin,

    // the shared lattice coarse chain (seeding, 2 Lloyd rounds,
    // assignment) + the quality expression + the per-cell rank window —
    // every kept row is a total-order fact both engines derive
    "q132_cluster_sample" ->
      s"""WITH $pqBaseCtes,
         |${coarseOracleCtes()},
         |q AS (SELECT doc_id, $qualitySqlExpr AS quality FROM documents),
         |r AS (SELECT a.vec_id AS doc_id, a.cell, q.quality,
         |    row_number() OVER (PARTITION BY a.cell
         |      ORDER BY q.quality DESC, a.vec_id) AS rank
         |  FROM cassign a JOIN q ON q.doc_id = a.vec_id)
         |SELECT doc_id, CAST(cell AS BIGINT) AS cell, quality,
         |  CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 25 ORDER BY cell, rank""".stripMargin,

    // q100's LM CTEs + the same centi-nat quantization, the same value-
    // histogram cumulative window, the same ceil targets and value-
    // threshold bucketing — the whole tercile assignment is an integer
    // fact both engines replay
    "q131_perplexity_buckets" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      s"""WITH tok AS (SELECT doc_id,
         |    list_transform($toksSql, t -> $tokHash) AS hs FROM documents),
         |bg AS (SELECT doc_id, hs[t.i] AS h1,
         |    (hs[t.i] * ${ops.DetHash.A} + hs[t.i + 1]) % ${ops.DetHash.P} AS hb
         |  FROM tok, UNNEST(range(1, len(hs))) AS t(i)),
         |uni AS (SELECT h AS h1, CAST(count(*) AS BIGINT) AS uc
         |  FROM (SELECT unnest(hs) AS h FROM tok) GROUP BY 1),
         |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
         |bc AS (SELECT h1, hb, CAST(count(*) AS BIGINT) AS bc
         |  FROM bg GROUP BY 1, 2),
         |model AS (SELECT bc.h1, bc.hb,
         |    CAST(floor(ln(CAST(bc.bc + 1 AS DOUBLE)
         |      / CAST(uni.uc + vv.v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lp
         |  FROM bc JOIN uni ON uni.h1 = bc.h1, vv),
         |dbc AS (SELECT doc_id, h1, hb, CAST(count(*) AS BIGINT) AS n
         |  FROM bg GROUP BY 1, 2, 3),
         |sc AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nb,
         |    CAST(sum(n * lp) AS BIGINT) AS s
         |  FROM dbc JOIN model USING (h1, hb) GROUP BY 1),
         |base AS (SELECT d.doc_id, d.source, sc.nb AS n_bigrams,
         |    CAST(floor(CAST(sc.s AS DOUBLE)
         |      / (CAST(sc.nb AS DOUBLE) * 10000.0)) AS BIGINT) AS score_centi
         |  FROM documents d JOIN sc ON sc.doc_id = d.doc_id WHERE sc.nb > 0),
         |h AS (SELECT source, score_centi, CAST(count(*) AS BIGINT) AS c
         |  FROM base GROUP BY 1, 2),
         |cm AS (SELECT source, score_centi, c,
         |    sum(c) OVER (PARTITION BY source ORDER BY score_centi
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs
         |  FROM h GROUP BY 1),
         |ct AS (SELECT cm.source, t.tercile,
         |    min(CASE WHEN cm.cum >= (t.tercile * tt.n_docs + 2) // 3
         |      THEN cm.score_centi END) AS cut
         |  FROM cm JOIN tt ON tt.source IS NOT DISTINCT FROM cm.source
         |  CROSS JOIN (SELECT unnest([1, 2]) AS tercile) t
         |  GROUP BY 1, 2),
         |cw AS (SELECT source,
         |    max(CASE WHEN tercile = 1 THEN cut END) AS cut1,
         |    max(CASE WHEN tercile = 2 THEN cut END) AS cut2
         |  FROM ct GROUP BY 1)
         |SELECT b.doc_id, b.source, b.n_bigrams, b.score_centi,
         |  CASE WHEN b.score_centi <= cw.cut1 THEN 'tail'
         |    WHEN b.score_centi <= cw.cut2 THEN 'middle'
         |    ELSE 'head' END AS bucket,
         |  cw.cut1 AS cut1_centi, cw.cut2 AS cut2_centi
         |FROM base b JOIN cw ON cw.source IS NOT DISTINCT FROM b.source
         |ORDER BY b.doc_id""".stripMargin
    },

    // the sum identity replayed on the shared int8 grid: per-dim BIGINT
    // sums, squared in ascending-dim order as doubles (each square an
    // exact integer), the same one-quotient micro shapes; single-vector
    // sources yield NULL pair/diversity on both engines
    "q130_source_diversity" ->
      s"""WITH mxq AS (SELECT max(list_max(list_transform(embedding,
         |    x -> abs(CAST(x AS DOUBLE))))) AS mx FROM embeddings),
         |scl AS (SELECT CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale
         |  FROM mxq),
         |qv AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT)) AS qv
         |  FROM embeddings, scl),
         |j AS (SELECT d.source, q.qv,
         |    list_sum(list_transform(q.qv, x -> x * x)) AS sd
         |  FROM qv q LEFT JOIN documents d ON d.doc_id = q.vec_id),
         |ds AS (SELECT source, t.d AS d, CAST(sum(qv[t.d]) AS BIGINT) AS s
         |  FROM j, UNNEST(range(1, 65)) t(d) GROUP BY 1, 2),
         |s2 AS (SELECT source, list_sum(list_transform(
         |    list(CAST(s AS DOUBLE) ORDER BY d), x -> x * x)) AS s2
         |  FROM ds GROUP BY 1),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(sd) AS BIGINT) AS sum_self_dot FROM j GROUP BY 1),
         |fin AS (SELECT per.source, per.n_vecs, per.sum_self_dot,
         |    CASE WHEN per.n_vecs > 1 THEN CAST(floor(1e6
         |      * (s2.s2 - CAST(per.sum_self_dot AS DOUBLE))
         |      / CAST(per.n_vecs * (per.n_vecs - 1) AS DOUBLE)) AS BIGINT)
         |    END AS mean_pair_dot_micro,
         |    CAST(floor(1e6 * CAST(per.sum_self_dot AS DOUBLE)
         |      / CAST(per.n_vecs AS DOUBLE)) AS BIGINT) AS mean_self_dot_micro
         |  FROM per JOIN s2 ON s2.source IS NOT DISTINCT FROM per.source)
         |SELECT source, n_vecs, sum_self_dot, mean_pair_dot_micro,
         |  mean_self_dot_micro,
         |  mean_self_dot_micro - mean_pair_dot_micro AS diversity_micro
         |FROM fin ORDER BY source NULLS LAST""".stripMargin,

    // every Gopher rule replayed: the same micro-quantized ratios
    // (quantize-before-compare), the same RE2-subset regexes, the same
    // distinct-stopword count — flags are integer facts on both engines
    "q129_gopher_rules" ->
      raw"""WITH b AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\s+') AS tk FROM documents),
         |s AS (SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_words,
         |    CAST(floor(1e6 * CAST(list_sum(list_transform(tk, t -> len(t)))
         |      AS DOUBLE) / CAST(len(tk) AS DOUBLE)) AS BIGINT) AS mean_len_micro,
         |    CAST(floor(1e6 * CAST(len(list_filter(tk,
         |      t -> regexp_matches(t, '#|\.\.\.'))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE)) AS BIGINT) AS symbol_ratio_micro,
         |    CAST(floor(1e6 * CAST(len(list_filter(tk,
         |      t -> regexp_matches(t, '\p{L}'))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE)) AS BIGINT) AS alpha_frac_micro,
         |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
         |      w -> list_contains(tk, w))) AS BIGINT) AS n_stop_hits
         |  FROM b),
         |f AS (SELECT *,
         |    CASE WHEN n_words >= 30 AND n_words <= 100000
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r_wordcount,
         |    CASE WHEN mean_len_micro >= 3000000 AND mean_len_micro <= 10000000
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r_meanlen,
         |    CASE WHEN symbol_ratio_micro <= 100000
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r_symbol,
         |    CASE WHEN alpha_frac_micro >= 800000
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r_alpha,
         |    CASE WHEN n_stop_hits >= 1
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r_stop
         |  FROM s)
         |SELECT doc_id, n_words, mean_len_micro, symbol_ratio_micro,
         |  alpha_frac_micro, n_stop_hits, r_wordcount, r_meanlen, r_symbol,
         |  r_alpha, r_stop,
         |  r_wordcount * r_meanlen * r_symbol * r_alpha * r_stop AS pass
         |FROM f ORDER BY doc_id""".stripMargin,

    "q128_dedup_yield" -> {
      s"""WITH RECURSIVE b AS (SELECT doc_id, text,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
         |  FROM documents),
         |ex AS (SELECT doc_id, text, n FROM (
         |    SELECT doc_id, text, n, row_number() OVER (
         |      PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM b)
         |  WHERE rn = 1),
         |${hashedShinglesCteFrom("ex")},
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM ex
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x),
         |q AS (SELECT doc_id, $qualitySqlExpr AS quality FROM ex),
         |j AS (SELECT cc.x AS doc_id, cc.comp, q.quality
         |  FROM cc JOIN q ON q.doc_id = cc.x),
         |r AS (SELECT doc_id, comp,
         |    row_number() OVER (PARTITION BY comp
         |      ORDER BY quality DESC, doc_id ASC) AS rn FROM j),
         |kt AS (SELECT ex.doc_id, ex.n FROM ex
         |  JOIN (SELECT doc_id FROM r WHERE rn = 1) k ON k.doc_id = ex.doc_id)
         |SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS label,
         |    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
         |  FROM b
         |UNION ALL SELECT CAST(1 AS BIGINT), 'exact',
         |    CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT) FROM ex
         |UNION ALL SELECT CAST(2 AS BIGINT), 'neardup_keepbest',
         |    CAST(count(*) AS BIGINT), CAST(sum(n) AS BIGINT) FROM kt
         |ORDER BY stage""".stripMargin
    },

    // the ENTIRE SemDeDup lifecycle replayed: the shared lattice coarse
    // chain (seeding, 2 Lloyd rounds, assignment), per-vector integer L2
    // to the own centroid, the q25 cosine shape for within-cell edges,
    // the farthest-from-centroid keeper rule as an EXISTS
    "q127_semdedup" -> {
      val l2own = "CAST(list_sum(list_transform(range(1, 65), d -> " +
        "(q.qv[d] - c.c[d]) * (q.qv[d] - c.c[d]))) AS BIGINT)"
      s"""WITH $pqBaseCtes,
         |${coarseOracleCtes()},
         |l2c AS (SELECT a.vec_id, a.cell, $l2own AS l2_centroid
         |  FROM cassign a JOIN qv q ON q.vec_id = a.vec_id
         |  JOIN ccb2 c ON c.cell = a.cell),
         |vict AS (SELECT x.vec_id AS a
         |  FROM l2c x JOIN l2c y ON x.cell = y.cell AND x.vec_id <> y.vec_id
         |  JOIN embeddings ea ON ea.vec_id = x.vec_id
         |  JOIN embeddings eb ON eb.vec_id = y.vec_id
         |  WHERE ${sqlCos("ea", "eb")} >= 0.4
         |    AND (y.l2_centroid > x.l2_centroid
         |      OR (y.l2_centroid = x.l2_centroid AND y.vec_id < x.vec_id))
         |  GROUP BY 1)
         |SELECT l.vec_id, CAST(l.cell AS BIGINT) AS cell, l.l2_centroid,
         |  CASE WHEN v.a IS NULL THEN CAST(1 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS kept
         |FROM l2c l LEFT JOIN vict v ON v.a = l.vec_id""".stripMargin
    },

    // the value-histogram cumulative window + the identical integer
    // ceiling; percentile_disc semantics spelled out so the engines can't
    // diverge on interpolation
    "q126_length_deciles" ->
      raw"""WITH h AS (SELECT source,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM documents GROUP BY 1, 2),
         |cm AS (SELECT source, n, c,
         |    sum(c) OVER (PARTITION BY source ORDER BY n
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs
         |  FROM h GROUP BY 1),
         |ex AS (SELECT cm.source, cm.n, cm.cum, tt.n_docs,
         |    CAST(d.decile AS BIGINT) AS decile
         |  FROM cm JOIN tt ON tt.source IS NOT DISTINCT FROM cm.source
         |  CROSS JOIN (SELECT unnest(range(1, 10)) AS decile) d)
         |SELECT source, decile, max(n_docs) AS n_docs,
         |  min(CASE WHEN cum >= (decile * n_docs + 9) // 10 THEN n END)
         |    AS decile_value
         |FROM ex GROUP BY 1, 2
         |ORDER BY source NULLS LAST, decile""".stripMargin,

    // the packed-key winnowing selection replayed with the same integer
    // pack (h·2^20 + (2^20−1−pos)) and the same CURRENT ROW .. w-1
    // FOLLOWING frame; short docs keep their global minimum
    "q124_winnow" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      s"""WITH g AS (SELECT doc_id AS id, ${ops.DetHash.sqlShingleHashes("th", 3)} AS gh
         |  FROM (SELECT doc_id, list_transform($toksSql, t -> $tokHash) AS th
         |        FROM documents)),
         |gr AS (SELECT id, CAST(i - 1 AS BIGINT) AS pos, gh[i] AS h
         |  FROM g, UNNEST(range(1, len(gh) + 1)) t(i)),
         |ky AS (SELECT id, pos, h * 1048576 + (1048575 - pos) AS key FROM gr),
         |wn AS (SELECT id, pos,
         |    min(key) OVER (PARTITION BY id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk,
         |    count(*) OVER (PARTITION BY id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt,
         |    count(*) OVER (PARTITION BY id) AS ng
         |  FROM ky)
         |SELECT DISTINCT id AS doc_id, wk // 1048576 AS h,
         |  1048575 - (wk % 1048576) AS pos
         |FROM wn WHERE cnt = 4 OR (pos = 0 AND ng < 4)""".stripMargin
    },

    // q124's selection CTEs + the df cap + the (a < b) fingerprint join
    "q125_winnow_pairs" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      s"""WITH g AS (SELECT doc_id AS id, ${ops.DetHash.sqlShingleHashes("th", 3)} AS gh
         |  FROM (SELECT doc_id, list_transform($toksSql, t -> $tokHash) AS th
         |        FROM documents)),
         |gr AS (SELECT id, CAST(i - 1 AS BIGINT) AS pos, gh[i] AS h
         |  FROM g, UNNEST(range(1, len(gh) + 1)) t(i)),
         |ky AS (SELECT id, pos, h * 1048576 + (1048575 - pos) AS key FROM gr),
         |wn AS (SELECT id, pos,
         |    min(key) OVER (PARTITION BY id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk,
         |    count(*) OVER (PARTITION BY id ORDER BY pos
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt,
         |    count(*) OVER (PARTITION BY id) AS ng
         |  FROM ky),
         |sel AS (SELECT DISTINCT id, wk // 1048576 AS h
         |  FROM wn WHERE cnt = 4 OR (pos = 0 AND ng < 4)),
         |cap AS (SELECT id, h FROM (SELECT id, h,
         |    count(*) OVER (PARTITION BY h) AS dfc FROM sel) WHERE dfc <= 1000)
         |SELECT l.id AS a, r.id AS b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM cap l JOIN cap r ON l.h = r.h AND l.id < r.id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
    },

    // the (count desc, prefix asc) rank window replayed literally; the
    // 8-token prefix via the same slice/join convention
    "q123_boilerplate" ->
      raw"""WITH b AS (SELECT source,
         |    array_to_string(regexp_split_to_array(trim(text), '\s+')[1:8], ' ')
         |      AS prefix
         |  FROM documents),
         |cnt AS (SELECT source, prefix, CAST(count(*) AS BIGINT) AS n_docs_prefix
         |  FROM b GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs_source
         |  FROM b GROUP BY 1),
         |rk AS (SELECT source, prefix, n_docs_prefix,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_docs_prefix DESC, prefix ASC) AS rank
         |  FROM cnt)
         |SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.prefix,
         |  r.n_docs_prefix, t.n_docs_source,
         |  CAST(floor((1e6 * CAST(r.n_docs_prefix AS DOUBLE))
         |    / CAST(t.n_docs_source AS DOUBLE)) AS BIGINT) AS share_micro,
         |  CASE WHEN CAST(floor((1e6 * CAST(r.n_docs_prefix AS DOUBLE))
         |      / CAST(t.n_docs_source AS DOUBLE)) AS BIGINT) >= 300000
         |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS flagged
         |FROM rk r JOIN tot t ON t.source IS NOT DISTINCT FROM r.source
         |WHERE r.rank <= 3
         |ORDER BY r.source NULLS LAST, r.rank""".stripMargin,

    // global (freq desc, term asc) ranking replayed via a literal window
    // (the engine's TakeOrderedAndProject realizes the same bounded top-V),
    // per-source conditional sums, the identical ratio shape
    "q122_vocab_coverage" -> {
      val sizes = Seq(16, 64, 256)
      val branches = sizes.map(v =>
        s"""SELECT source, CAST($v AS BIGINT) AS vocab_size,
           |    cov_$v AS covered_tokens, total_tokens FROM ps""".stripMargin)
        .mkString("\n  UNION ALL ")
      val covAggs = sizes.map(v =>
        s"CAST(sum(CASE WHEN term_id < $v THEN n ELSE 0 END) AS BIGINT) AS cov_$v")
        .mkString(",\n    ")
      s"""WITH tok AS (SELECT source,
         |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |cnt AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
         |  FROM tok GROUP BY 1, 2),
         |gf AS (SELECT term, count(*) AS freq FROM tok GROUP BY 1),
         |vc AS (SELECT term, rn - 1 AS term_id FROM (
         |    SELECT term, row_number() OVER (ORDER BY freq DESC, term ASC) AS rn
         |    FROM gf) WHERE rn <= ${sizes.max}),
         |j AS (SELECT c.source, c.n, v.term_id
         |  FROM cnt c LEFT JOIN vc v USING (term)),
         |ps AS (SELECT source, CAST(sum(n) AS BIGINT) AS total_tokens,
         |    $covAggs
         |  FROM j GROUP BY 1),
         |u AS ($branches)
         |SELECT source, vocab_size, covered_tokens, total_tokens,
         |  CAST(floor((1e6 * CAST(covered_tokens AS DOUBLE))
         |    / CAST(total_tokens AS DOUBLE)) AS BIGINT) AS coverage_micro,
         |  1000000 - CAST(floor((1e6 * CAST(covered_tokens AS DOUBLE))
         |    / CAST(total_tokens AS DOUBLE)) AS BIGINT) AS oov_micro
         |FROM u ORDER BY source NULLS LAST, vocab_size""".stripMargin
    },

    // same Unicode script property, RE2 spelling; identical greatest/CASE
    // shapes (alphabetical-first tie, integer mixed-flag arithmetic)
    "q121_script_mix" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\p{Arabic}')) AS BIGINT) AS n_arabic,
        |  CAST(len(regexp_extract_all(text, '\p{Cyrillic}')) AS BIGINT) AS n_cyrillic,
        |  CAST(len(regexp_extract_all(text, '\p{Greek}')) AS BIGINT) AS n_greek,
        |  CAST(len(regexp_extract_all(text, '\p{Han}')) AS BIGINT) AS n_han,
        |  CAST(len(regexp_extract_all(text, '\p{Latin}')) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
        |  FROM documents),
        |s AS (SELECT *,
        |    n_arabic + n_cyrillic + n_greek + n_han + n_latin AS n_script,
        |    greatest(n_arabic, n_cyrillic, n_greek, n_han, n_latin) AS mx
        |  FROM c)
        |SELECT doc_id, n_arabic, n_cyrillic, n_greek, n_han, n_latin,
        |  n_digit, n_script,
        |  CASE WHEN n_script = 0 THEN NULL
        |    WHEN n_arabic = mx THEN 'arabic'
        |    WHEN n_cyrillic = mx THEN 'cyrillic'
        |    WHEN n_greek = mx THEN 'greek'
        |    WHEN n_han = mx THEN 'han'
        |    ELSE 'latin' END AS majority_script,
        |  CASE WHEN n_script > 0 AND 10 * (n_script - mx) >= n_script
        |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS mixed_script
        |FROM s""".stripMargin,

    // the whole KMV matrix replayed: 60-bit 3-gram hashes, per-source
    // bottom-k via a literal window (the engine's two-level prune realizes
    // the same total order), the (k-1)·2^60/h_(k) estimator with the SAME
    // exact double numerator literal, union re-rank, inclusion-exclusion
    "q120_kmv_overlap" -> {
      val kmvK = 64
      val numer = (kmvK - 1).toDouble * 1152921504606846976.0
      val h3 = ops.DetHash.sqlMd5Hash60("array_to_string(ts[i:i+2], ' ')")
      s"""WITH tok AS (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS ts
         |  FROM documents),
         |sh AS (SELECT source, $h3 AS h
         |  FROM tok, UNNEST(range(1, len(ts) - 1)) t(i)),
         |d AS (SELECT DISTINCT source, h FROM sh),
         |rk AS (SELECT source, h,
         |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM d),
         |sk AS (SELECT source, h FROM rk WHERE rn <= $kmvK),
         |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sk, max(h) AS kth
         |  FROM sk GROUP BY 1),
         |es AS (SELECT source, CASE WHEN n_sk < $kmvK THEN n_sk
         |    ELSE CAST(floor($numer / CAST(kth AS DOUBLE)) AS BIGINT) END AS est
         |  FROM st),
         |pr AS (SELECT a.source AS sx, a.est AS est_x, b.source AS sy, b.est AS est_y
         |  FROM es a JOIN es b ON (a.source IS NULL AND b.source IS NOT NULL)
         |    OR (a.source IS NOT NULL AND b.source IS NOT NULL AND a.source < b.source)),
         |mg AS (SELECT p.sx, p.sy, s.h FROM pr p
         |    JOIN sk s ON s.source IS NOT DISTINCT FROM p.sx
         |  UNION
         |  SELECT p.sx, p.sy, s.h FROM pr p
         |    JOIN sk s ON s.source IS NOT DISTINCT FROM p.sy),
         |ur AS (SELECT sx, sy, h,
         |    row_number() OVER (PARTITION BY sx, sy ORDER BY h) AS rn FROM mg),
         |us AS (SELECT sx, sy, CAST(count(*) AS BIGINT) AS n_u, max(h) AS kth
         |  FROM ur WHERE rn <= $kmvK GROUP BY 1, 2),
         |ue AS (SELECT sx, sy, CASE WHEN n_u < $kmvK THEN n_u
         |    ELSE CAST(floor($numer / CAST(kth AS DOUBLE)) AS BIGINT) END AS est_union
         |  FROM us),
         |fin AS (SELECT p.sx, p.sy, p.est_x, p.est_y, u.est_union,
         |    GREATEST(CAST(0 AS BIGINT),
         |      p.est_x + p.est_y - u.est_union) AS est_inter
         |  FROM pr p JOIN ue u ON u.sx IS NOT DISTINCT FROM p.sx
         |    AND u.sy IS NOT DISTINCT FROM p.sy)
         |SELECT sx AS source_x, sy AS source_y, est_x, est_y, est_union, est_inter,
         |  CAST(floor((1e6 * CAST(est_inter AS DOUBLE))
         |    / CAST(est_union AS DOUBLE)) AS BIGINT) AS jaccard_micro
         |FROM fin
         |ORDER BY source_x NULLS FIRST, source_y NULLS FIRST""".stripMargin
    },

    // q22's brute-force pair set + two source joins + the identical CASE
    // normalization (NULL-first unordered pair)
    "q118_dup_leakage" ->
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |ws AS (SELECT da.source AS sa, db.source AS sb FROM pr
         |  JOIN documents da ON da.doc_id = pr.a
         |  JOIN documents db ON db.doc_id = pr.b),
         |nx AS (SELECT
         |    CASE WHEN sa IS NOT DISTINCT FROM sb THEN sa
         |      WHEN sa IS NULL THEN NULL WHEN sb IS NULL THEN NULL
         |      WHEN sa < sb THEN sa ELSE sb END AS source_x,
         |    CASE WHEN sa IS NOT DISTINCT FROM sb THEN sb
         |      WHEN sa IS NULL THEN sb WHEN sb IS NULL THEN sa
         |      WHEN sa < sb THEN sb ELSE sa END AS source_y
         |  FROM ws)
         |SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM nx GROUP BY 1, 2
         |ORDER BY source_x NULLS FIRST, source_y NULLS FIRST""".stripMargin,

    // q114's mixture/draw CTEs (salt 'train-mix'), the epoch expansion as
    // a range() lateral, the interleave hash over (epoch, doc), one
    // literal global window — the engine's bucketed sums realize the
    // identical order
    "q117_training_shards" -> {
      val hMix = ops.DetHash.sqlMd5Hash60(
        "'train-mix|' || CAST(doc_id AS VARCHAR)")
      val hTrain = ops.DetHash.sqlMd5Hash60(
        "'train|' || CAST(epoch AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR)")
      s"""WITH ps AS (SELECT source, CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |q AS (SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS sqrt_micro
         |  FROM ps),
         |d AS (SELECT CAST(sum(sqrt_micro) AS BIGINT) AS denom FROM q),
         |t AS (SELECT source, n_tokens,
         |    CAST(floor((200000.0 * CAST(sqrt_micro AS DOUBLE))
         |      / CAST(denom AS DOUBLE)) AS BIGINT) AS target_tokens
         |  FROM q CROSS JOIN d),
         |dt AS (SELECT doc_id, source,
         |    CAST(len($toksSql) AS BIGINT) AS n_doc_tokens, $hMix AS h
         |  FROM documents),
         |cum AS (SELECT doc_id, source, n_doc_tokens,
         |    COALESCE(sum(n_doc_tokens) OVER (PARTITION BY source
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM dt),
         |drawn AS (SELECT c.doc_id, c.n_doc_tokens,
         |    t.target_tokens // t.n_tokens
         |      + CASE WHEN c.pre < t.target_tokens % t.n_tokens
         |        THEN 1 ELSE 0 END AS nc
         |  FROM cum c JOIN t ON t.source IS NOT DISTINCT FROM c.source),
         |copies AS (SELECT doc_id, n_doc_tokens, CAST(e.epoch AS BIGINT) AS epoch
         |  FROM drawn, UNNEST(range(0, nc)) e(epoch)),
         |ch AS (SELECT doc_id, n_doc_tokens, epoch, $hTrain AS h FROM copies),
         |ccum AS (SELECT n_doc_tokens,
         |    COALESCE(sum(n_doc_tokens) OVER (ORDER BY h, doc_id, epoch
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM ch)
         |SELECT CAST(pre // 20000 AS BIGINT) AS shard_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_doc_tokens) AS BIGINT) AS n_tokens,
         |  CAST(min(pre) AS BIGINT) AS start_tok,
         |  CAST(max(pre + n_doc_tokens) AS BIGINT) AS end_tok
         |FROM ccum GROUP BY 1 ORDER BY shard_id""".stripMargin
    },

    // per width: q104's cosine SQL over list SLICES, both rankings total
    // orders, hits counted by joining the truncated top-10 to the full one
    "q116_matryoshka" -> {
      def cosCtes(name: String, sl: String => String) =
        s"""d$name AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           |    list_sum(list_transform(list_zip(${sl("a.embedding")}, ${sl("b.embedding")}),
           |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) AS dp,
           |    sqrt(list_sum(list_transform(${sl("a.embedding")},
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
           |    sqrt(list_sum(list_transform(${sl("b.embedding")},
           |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
           |  FROM qset a JOIN embeddings b ON b.vec_id <> a.vec_id),
           |t$name AS (SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY dp / (na * nb) DESC, neighbor_id) AS rn
           |    FROM d$name) WHERE rn <= 10)""".stripMargin
      val dims = Seq(16, 32)
      val dimCtes = dims.map(d =>
        cosCtes(s"$d", e => s"$e[1:$d]") + s""",
           |h$d AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
           |  FROM t$d s JOIN tfull f USING (query_id, neighbor_id))""".stripMargin)
        .mkString(",\n")
      val rows = dims.map(d =>
        s"""SELECT CAST($d AS INTEGER) AS dim, n_hits,
           |  (1000000 * n_hits) // (10 * n_q) AS recall_micro FROM h$d, nq"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH qset AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 7),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM qset),
         |${cosCtes("full", identity)},
         |$dimCtes
         |SELECT * FROM ($rows) ORDER BY dim""".stripMargin
    },

    // same salted hash, plain global cumulative window (the engine's
    // bucketed two-level sum realizes the identical total order)
    "q115_shard_plan" -> {
      val h = ops.DetHash.sqlMd5Hash60("'shard|' || CAST(doc_id AS VARCHAR)")
      s"""WITH dt AS (SELECT doc_id,
         |    CAST(len($toksSql) AS BIGINT) AS n_doc_tokens, $h AS h
         |  FROM documents),
         |cum AS (SELECT doc_id, n_doc_tokens,
         |    COALESCE(sum(n_doc_tokens) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
         |  FROM dt)
         |SELECT CAST(pre // 2000 AS BIGINT) AS shard_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_doc_tokens) AS BIGINT) AS n_tokens,
         |  CAST(min(pre) AS BIGINT) AS start_tok,
         |  CAST(max(pre + n_doc_tokens) AS BIGINT) AS end_tok
         |FROM cum GROUP BY 1 ORDER BY shard_id""".stripMargin
    },

    // the same hashed-bucket binning (md5Hash60 mod 64), the same ONE
    // double expression per chi-square term quantized to micro before the
    // per-source integer sum; zero-filled grid over the corpus-live buckets
    "q110_source_drift" -> {
      val h = ops.DetHash.sqlMd5Hash60("term")
      s"""WITH tok AS (SELECT source, unnest($toksSql) AS term FROM documents),
         |cnt AS (SELECT source, ($h) % 64 AS bucket,
         |    CAST(count(*) AS BIGINT) AS o FROM tok GROUP BY 1, 2),
         |src AS (SELECT source, CAST(sum(o) AS BIGINT) AS n_src FROM cnt GROUP BY 1),
         |bkt AS (SELECT bucket, CAST(sum(o) AS BIGINT) AS c_b FROM cnt GROUP BY 1),
         |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n_total,
         |    CAST(count(DISTINCT bucket) AS BIGINT) AS n_live FROM cnt),
         |grid AS (SELECT s.source, s.n_src, b.bucket, b.c_b,
         |    COALESCE(c.o, CAST(0 AS BIGINT)) AS o
         |  FROM src s CROSS JOIN bkt b
         |  LEFT JOIN cnt c ON c.source IS NOT DISTINCT FROM s.source
         |    AND c.bucket = b.bucket),
         |terms AS (SELECT source, n_src,
         |    CAST(floor(((CAST(o AS DOUBLE)
         |        - (CAST(c_b AS DOUBLE) * CAST(n_src AS DOUBLE)) / CAST(t.n_total AS DOUBLE))
         |      * (CAST(o AS DOUBLE)
         |        - (CAST(c_b AS DOUBLE) * CAST(n_src AS DOUBLE)) / CAST(t.n_total AS DOUBLE))
         |      / ((CAST(c_b AS DOUBLE) * CAST(n_src AS DOUBLE)) / CAST(t.n_total AS DOUBLE)))
         |      * 1e6 + 0.5) AS BIGINT) AS term_micro,
         |    t.n_live
         |  FROM grid CROSS JOIN tot t),
         |agg AS (SELECT source, max(n_src) AS n_tokens,
         |    max(n_live) - 1 AS dof, CAST(sum(term_micro) AS BIGINT) AS chi2_micro
         |  FROM terms GROUP BY source)
         |SELECT source, n_tokens, dof, chi2_micro,
         |  chi2_micro // dof AS ratio_micro,
         |  CASE WHEN chi2_micro // dof > 2000000 THEN CAST(1 AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS drifted
         |FROM agg ORDER BY source NULLS LAST""".stripMargin
    },

    // every config's banding replayed permutation-for-permutation: per-doc
    // minima of (a_i·tok + b_i) mod P, r=2 band packing, the bucket cap,
    // then exact-Jaccard verification against the brute-force pair set;
    // the theoretical column is the SAME driver-computed literal the Spark
    // plan embeds (transcendentals never recomputed cross-engine)
    "q106_lsh_tuning" -> {
      val configs = Seq((2, 1), (4, 2), (8, 4), (16, 8), (32, 16))
      val cfgCtes = configs.map { case (k, bands) =>
        val minCols = ops.DetHash.minHashPerms(k).zipWithIndex.map {
          case ((a, b), i) => s"min(${ops.DetHash.sqlPerm("tok", a, b)}) AS s$i"
        }.mkString(", ")
        val sigCase = (0 until bands).map(bi =>
          s"WHEN $bi THEN s${2 * bi} * ${ops.DetHash.P} + s${2 * bi + 1}")
          .mkString(" ")
        s"""sg$k AS (SELECT id, $minCols FROM inv GROUP BY id),
           |bd$k AS (SELECT id, band_idx, CASE band_idx $sigCase END AS band_sig
           |  FROM sg$k CROSS JOIN range($bands) t(band_idx)),
           |bk$k AS (SELECT band_idx, band_sig FROM bd$k GROUP BY 1, 2
           |  HAVING count(*) BETWEEN 2 AND 1000),
           |cd$k AS (SELECT DISTINCT l.id AS a, r.id AS b
           |  FROM bd$k l
           |  JOIN bk$k u ON u.band_idx = l.band_idx AND u.band_sig = l.band_sig
           |  JOIN bd$k r ON l.band_idx = r.band_idx
           |    AND l.band_sig = r.band_sig AND l.id < r.id),
           |f$k AS (SELECT count(*) AS n_found FROM cd$k c
           |  JOIN pairj p ON p.a = c.a AND p.b = c.b)""".stripMargin
      }.mkString(",\n")
      val rows = configs.map { case (k, bands) =>
        val theo = DedupOps.theoRecallMicro(0.8, k / bands, bands)
        s"""SELECT $k AS k, $bands AS bands, n_exact, n_found,
           |  n_exact - n_found AS n_missed,
           |  CASE WHEN n_exact = 0 THEN NULL
           |    ELSE (1000000 * n_found) // n_exact END AS recall_micro,
           |  CAST($theo AS BIGINT) AS theo_recall_micro FROM ex, f$k"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $hashedShinglesCte,
         |inv AS (SELECT id, unnest(hs) AS tok FROM sized),
         |pairj AS (SELECT l.id AS a, r.id AS b
         |  FROM (SELECT id, sz, unnest(hs) AS tok FROM sized) l
         |  JOIN (SELECT id, sz, unnest(hs) AS tok FROM sized) r
         |    ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM pairj),
         |$cfgCtes
         |SELECT * FROM ($rows) ORDER BY bands""".stripMargin
    },

    // the whole PQ lifecycle replayed: shared int8 grid, md5-ordered
    // seeding, two unrolled integer-lattice Lloyd rounds (strict-< argmin,
    // floor(sum/n + 0.5) centroids, empty cells frozen), encode, per-query
    // LUTs, ADC rank — all arithmetic exact integers
    "q103_pq_topk" ->
      s"""WITH ${pqOracleCtes()}
         |SELECT query_id, vec_id, adc_dist, rank FROM pqtk
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // exhaustive probe of the persisted IVF-PQ index: the coarse quantizer
    // only routes, ADC depends on the PQ model alone — so the persisted
    // lifecycle must reproduce q103's independently replayed ranking
    "q108_ivfpq_topk" ->
      s"""WITH ${pqOracleCtes()}
         |SELECT query_id, vec_id, adc_dist, rank FROM pqtk
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the PARTIAL-probe IVF-PQ replay: the lattice coarse quantizer's
    // training (2 Lloyd rounds over the FULL 64-dim quantized vector —
    // same 'pq|' md5 seed order as the PQ codebook, so the `seeds` CTE is
    // shared), the corpus cell assignment, each query's 2-of-8 probe
    // selection, and the ADC ranking restricted to probed cells — every
    // step exact integers
    "q109_det_ivfpq_partial" -> {
      s"""WITH ${pqOracleCtes()},
         |${coarseOracleCtes()},
         |padc AS (SELECT l.query_id, e.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc_dist
         |  FROM enc e
         |  JOIN cassign ca ON ca.vec_id = e.vec_id
         |  JOIN cprobe p ON p.cell = ca.cell
         |  JOIN lut l ON l.m = e.m AND l.cell = e.cell AND l.query_id = p.query_id
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, adc_dist, rank FROM (
         |  SELECT query_id, vec_id, adc_dist, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
         |  FROM padc)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // residual IVFADC replayed end to end: the lattice coarse chain
    // (training, assignment, 2-of-8 probe selection) feeds a RESIDUAL
    // frame (qv − assigned cell's integer centroid), the PQ codebook
    // trains on those residuals (same md5 seed ids), and ADC scores each
    // member against the query's PER-PROBED-CELL residual LUT — every
    // intermediate an exact integer, nothing in the answer unverified
    "q111_ivfadc_residual" -> {
      s"""WITH $pqBaseCtes,
         |${coarseOracleCtes()},
         |rv AS (SELECT q.vec_id, list_transform(range(1, 65),
         |      d -> q.qv[d] - c.c[d]) AS qv
         |  FROM qv q JOIN cassign a USING (vec_id)
         |  JOIN ccb2 c ON c.cell = a.cell),
         |rcb0 AS (SELECT t.m, CAST(s.rk - 1 AS INTEGER) AS cell,
         |    r.qv[t.m*16 + 1 : t.m*16 + 16] AS c
         |  FROM seeds s JOIN rv r ON r.vec_id = s.vec_id,
         |    UNNEST(range(0, 4)) t(m)),
         |${pqLloydRoundSql(1, "rv", "r")},
         |${pqLloydRoundSql(2, "rv", "r")},
         |renc AS (SELECT vec_id, m, cell FROM (
         |    SELECT q.vec_id, c.m, c.cell, row_number() OVER (
         |      PARTITION BY q.vec_id, c.m ORDER BY ${pqSubDistSql("c")}, c.cell) AS rn
         |    FROM rv q CROSS JOIN rcb2 c) WHERE rn = 1),
         |qres AS (SELECT p.query_id, p.cell AS pcell,
         |    list_transform(range(1, 65), d -> q.qv[d] - c.c[d]) AS qv
         |  FROM cprobe p JOIN qv q ON q.vec_id = p.query_id
         |  JOIN ccb2 c ON c.cell = p.cell),
         |rlut AS (SELECT q.query_id, q.pcell, c.m, c.cell,
         |    CAST(${pqSubDistSql("c")} AS BIGINT) AS ld
         |  FROM qres q CROSS JOIN rcb2 c),
         |radc AS (SELECT l.query_id, e.vec_id, CAST(sum(l.ld) AS BIGINT) AS adc_dist
         |  FROM renc e
         |  JOIN cassign ca ON ca.vec_id = e.vec_id
         |  JOIN rlut l ON l.pcell = ca.cell AND l.m = e.m AND l.cell = e.cell
         |  GROUP BY 1, 2)
         |SELECT query_id, vec_id, adc_dist, rank FROM (
         |  SELECT query_id, vec_id, adc_dist, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist, vec_id) AS INTEGER) AS rank
         |  FROM radc)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // the q103 lifecycle CTEs + an exact integer-L2 top-10 per query over
    // the SAME quantized lattice; recall = the exact integer quotient of
    // the per-query intersection count
    "q107_pq_recall" ->
      s"""WITH ${pqOracleCtes()},
         |exd AS (SELECT e.query_id, q.vec_id,
         |    list_sum(list_transform(range(1, 65), d ->
         |      CAST(q.qv[d] - e.qq[d] AS BIGINT) * (q.qv[d] - e.qq[d]))) AS l2
         |  FROM qv q CROSS JOIN
         |    (SELECT vec_id AS query_id, qv AS qq FROM qv WHERE vec_id % 100 = 7) e),
         |extk AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY l2, vec_id) AS rn FROM exd)
         |  WHERE rn <= 10),
         |hits AS (SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM pqtk p JOIN extk e ON e.query_id = p.query_id AND e.vec_id = p.vec_id
         |  WHERE p.rank <= 10 GROUP BY 1)
         |SELECT q.vec_id AS query_id,
         |  COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
         |  (1000000 * COALESCE(h.n_hits, CAST(0 AS BIGINT))) // 10 AS recall_micro
         |FROM qv q LEFT JOIN hits h ON h.query_id = q.vec_id
         |WHERE q.vec_id % 100 = 7 ORDER BY query_id""".stripMargin,

    // q99's score CTEs + the seeded Gumbel key: md5-uniform → −ln(−ln u),
    // both terms micro-nat-quantized before the integer key sum — the
    // oracle draws the IDENTICAL without-replacement sample
    "q102_importance_resample" -> {
      val h = ops.DetHash.sqlMd5Hash60("'resample|' || CAST(doc_id AS VARCHAR)")
      s"""WITH $dsirSqlCtes
         |SELECT doc_id, n_grams, score_micro,
         |  CAST(floor(CAST(score_micro AS DOUBLE) / 1.0 + 0.5) AS BIGINT)
         |  + CAST(floor(-ln(-ln(CAST(h + 1 AS DOUBLE)
         |      / CAST(1152921504606846977 AS DOUBLE))) * 1000000 + 0.5) AS BIGINT)
         |    AS key_micro
         |FROM (SELECT dsel.*, $h AS h FROM dsel)
         |ORDER BY key_micro DESC, doc_id LIMIT 50""".stripMargin
    },

    // q97's round chain with the word identity threaded through every
    // round's segmentation CTE: s6's segs are exactly what applyBpeMerges
    // computes, then per-(source, word) counts weight the symbol tallies
    "q101_bpe_fertility" -> {
      val E = "chr(30)"
      val SS = s"$E||$E"
      val rounds = (1 to 6).map { k =>
        val prev = s"s${k - 1}"
        s"""p$k AS (
           |  SELECT pr.l AS lhs, pr.r AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count FROM (
           |    SELECT freq, unnest(list_transform(range(1, len(syms)),
           |        i -> struct_pack(l := syms[i], r := syms[i+1]))) AS pr
           |    FROM (SELECT freq, string_split(trim(seg, $E), $SS) AS syms FROM $prev)
           |  ) GROUP BY 1, 2),
           |m$k AS (SELECT lhs, rhs, pair_count FROM p$k
           |  ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1),
           |s$k AS (SELECT w, freq, replace(seg, $E||m.lhs||$SS||m.rhs||$E,
           |    $E||m.lhs||m.rhs||$E) AS seg FROM $prev CROSS JOIN m$k m)""".stripMargin
      }.mkString(",\n")
      s"""WITH words AS (
         |  SELECT w, count(*) AS freq FROM (SELECT unnest($toksSql) AS w FROM documents)
         |  WHERE len(w) > 0 AND w NOT LIKE '%'||$E||'%' GROUP BY w),
         |s0 AS (SELECT w, freq,
         |  $SS||array_to_string(list_transform(range(1, len(w)+1), i -> w[i]), $SS)||$SS AS seg
         |  FROM words),
         |$rounds,
         |wsrc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT source, unnest($toksSql) AS w FROM documents)
         |  WHERE len(w) > 0 AND w NOT LIKE '%'||$E||'%' GROUP BY 1, 2),
         |syms AS (SELECT w,
         |  CAST(len(string_split(trim(seg, $E), $SS)) AS BIGINT) AS ns FROM s6)
         |SELECT source, CAST(sum(n) AS BIGINT) AS n_words,
         |  CAST(sum(n * ns) AS BIGINT) AS n_symbols,
         |  CAST(sum(n * ns) AS DOUBLE) / sum(n) AS fertility
         |FROM wsrc JOIN syms USING (w)
         |GROUP BY source ORDER BY source""".stripMargin
    },

    // identical md5+Horner bigram identity, identical double-expression
    // shape inside ln, quantization before every sum — integer totals on
    // both engines
    "q100_lm_score" -> {
      val tokHash = s"${ops.DetHash.sqlMd5Hash60("t")} % ${ops.DetHash.P}"
      s"""WITH tok AS (SELECT doc_id,
         |    list_transform($toksSql, t -> $tokHash) AS hs FROM documents),
         |bg AS (SELECT doc_id, hs[t.i] AS h1,
         |    (hs[t.i] * ${ops.DetHash.A} + hs[t.i + 1]) % ${ops.DetHash.P} AS hb
         |  FROM tok, UNNEST(range(1, len(hs))) AS t(i)),
         |uni AS (SELECT h AS h1, CAST(count(*) AS BIGINT) AS uc
         |  FROM (SELECT unnest(hs) AS h FROM tok) GROUP BY 1),
         |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
         |bc AS (SELECT h1, hb, CAST(count(*) AS BIGINT) AS bc
         |  FROM bg GROUP BY 1, 2),
         |model AS (SELECT bc.h1, bc.hb,
         |    CAST(floor(ln(CAST(bc.bc + 1 AS DOUBLE)
         |      / CAST(uni.uc + vv.v AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS lp
         |  FROM bc JOIN uni ON uni.h1 = bc.h1, vv),
         |dbc AS (SELECT doc_id, h1, hb, CAST(count(*) AS BIGINT) AS n
         |  FROM bg GROUP BY 1, 2, 3),
         |sc AS (SELECT doc_id, sum(n) AS nb, sum(n * lp) AS s
         |  FROM dbc JOIN model USING (h1, hb) GROUP BY 1)
         |SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(COALESCE(sc.s, 0) AS BIGINT) AS lp_micro
         |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "q95_corpus_datasheet" ->
      s"""SELECT
         |  CASE WHEN GROUPING(source) = 1 THEN '<all>' ELSE source END AS source,
         |  CASE WHEN GROUPING(lang) = 1 THEN '<all>' ELSE lang END AS lang,
         |  count(*) AS n_docs,
         |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens,
         |  CAST(sum(len($toksSql)) AS DOUBLE) / count(*) AS avg_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY CUBE(source, lang)
         |ORDER BY source NULLS LAST, lang NULLS LAST""".stripMargin,

    // the oracle pays the global sort the operator avoids — same order,
    // same positions
    "q94_deterministic_shuffle" -> {
      val h = ops.DetHash.sqlMd5Hash60("'shuffle|' || CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
         |    AS shuffle_pos
         |FROM (SELECT doc_id, $h AS h FROM documents)
         |ORDER BY shuffle_pos""".stripMargin
    },

    "q42_hash_split" -> {
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'split|' || CAST(doc_id AS VARCHAR)")} % 10000"
      s"""SELECT CASE WHEN $bucket < 8000 THEN 0
         |  WHEN $bucket < 9000 THEN 1 ELSE 2 END AS split,
         |  count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents GROUP BY 1 ORDER BY split""".stripMargin
    },

    "q43_vocab" ->
      s"""WITH c AS (SELECT term, count(*) AS freq
         |  FROM (SELECT unnest($toksSql) AS term FROM documents) GROUP BY term)
         |SELECT term, freq,
         |  CAST(row_number() OVER (ORDER BY freq DESC, term) - 1 AS INTEGER) AS term_id
         |FROM c ORDER BY term_id LIMIT 200""".stripMargin,

    // the MG sketch itself is engine-specific; the CONTRACT (every token
    // above support n/64 is contained — error bound n/256) is the checkable
    // fact, so the oracle emits 'ok' literals exactly like q33's HLL check
    "q68_length_histogram" ->
      s"""WITH t AS (SELECT len($toksSql) AS n FROM documents)
         |SELECT CAST(n // 10 * 10 AS INTEGER) AS bucket_lo,
         |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens
         |FROM t GROUP BY 1 ORDER BY bucket_lo""".stripMargin,

    "q69_exact_median" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  median(l_quantity) AS median
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q67_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
         |ex AS (SELECT tok, count(*) AS freq FROM tk GROUP BY tok),
         |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n_toks FROM ex)
         |SELECT tok, freq, 'ok' AS mg_contains FROM ex, tot
         |WHERE freq * 64 > n_toks ORDER BY freq DESC, tok""".stripMargin,

    "q44_encode_tokens" ->
      s"""WITH c AS (SELECT term, count(*) AS freq
         |  FROM (SELECT unnest($toksSql) AS term FROM documents) GROUP BY term),
         |v AS (SELECT term,
         |    CAST(row_number() OVER (ORDER BY freq DESC, term) - 1 AS INTEGER) AS term_id
         |  FROM c ORDER BY term_id LIMIT 200),
         |tk AS (SELECT doc_id, z[1] AS term, CAST(z[2] - 1 AS INTEGER) AS pos
         |  FROM (SELECT doc_id,
         |      unnest(list_zip(toks, generate_series(1, len(toks)))) AS z
         |    FROM (SELECT doc_id, $toksSql AS toks FROM documents)))
         |SELECT tk.doc_id, tk.pos, tk.term, COALESCE(v.term_id, -1) AS term_id
         |FROM tk LEFT JOIN v USING (term)
         |ORDER BY doc_id, pos""".stripMargin,

    "q45_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |arr AS (SELECT doc_id, len(toks) AS n_tokens,
         |  list_transform(generate_series(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i + 1]) AS bg FROM t),
         |a2 AS (SELECT doc_id, n_tokens, len(bg) AS n_bigrams,
         |  len(list_distinct(bg)) AS n_distinct FROM arr),
         |tk AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |tc AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
         |top AS (SELECT doc_id, tok AS top_tok, c AS top_tok_n FROM
         |  (SELECT *, row_number() OVER (PARTITION BY doc_id
         |     ORDER BY c DESC, tok) AS rn FROM tc) WHERE rn = 1)
         |SELECT a2.doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  top_tok, top_tok_n,
         |  CAST(top_tok_n AS DOUBLE) / n_tokens AS top_tok_frac,
         |  CASE WHEN n_bigrams = 0 THEN 0.0
         |    ELSE 1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams END AS dup_bigram_frac
         |FROM a2 JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q46_pack_sequences" ->
      s"""WITH n AS (SELECT doc_id, len($toksSql) AS nt FROM documents),
         |o AS (SELECT doc_id, nt,
         |  CAST(sum(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - nt
         |    AS BIGINT) AS off FROM n),
         |x AS (SELECT doc_id, nt, off,
         |  unnest(generate_series(off // 512, (off + nt - 1) // 512)) AS blk
         |  FROM o WHERE nt > 0)
         |SELECT blk AS block, count(*) AS n_docs,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  CAST(sum(least(off + nt, (blk + 1) * 512)
         |    - greatest(off, blk * 512)) AS BIGINT) AS n_tokens
         |FROM x GROUP BY blk ORDER BY block""".stripMargin,

    "q48_stratified_sample" -> {
      val bucket =
        s"${ops.DetHash.sqlMd5Hash60("'sample|' || CAST(doc_id AS VARCHAR)")} % 10000"
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents
         |WHERE $bucket < CASE lang WHEN 'en' THEN 5000 WHEN 'zh' THEN 2500
         |  WHEN 'de' THEN 1000 ELSE 500 END
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q47_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
        |    CASE WHEN event_type = 'click' THEN event_id END AS r_id,
        |    CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END AS r_ts,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS m
        |  FROM events WHERE event_type IN ('click', 'error')),
        |w AS (SELECT *,
        |    last_value(r_id IGNORE NULLS) OVER win AS prior_id_raw,
        |    last_value(r_ts IGNORE NULLS) OVER win AS prior_ts_raw
        |  FROM u WINDOW win AS (PARTITION BY user_id ORDER BY ts, m, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COALESCE(prior_id_raw, -1) AS prior_id,
        |  COALESCE(epoch_us(ts) - epoch_us(prior_ts_raw), -1) AS gap_us
        |FROM w WHERE event_type = 'error' ORDER BY event_id""".stripMargin,

    "q49_rollup_events" ->
      s"""SELECT coalesce(event_type, '__all__') AS event_type,
         |  coalesce(date_trunc('hour', CAST(ts AS TIMESTAMP)),
         |    TIMESTAMP '1970-01-01') AS h,
         |  CAST(GROUPING(event_type) * 2
         |    + GROUPING(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS gid,
         |  count(*) AS n, ${sqlDecSum("value")} AS sum_value
         |FROM events
         |GROUP BY ROLLUP(event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)))
         |ORDER BY gid DESC, event_type, h""".stripMargin,

    // like q33: the sketch values are engine-specific; the rank-error
    // CONTRACT is the checkable fact (deterministic for fixed data)
    "q39_approx_quantiles" ->
      """SELECT count(*) AS n, 'ok' AS p50_rank_ok, 'ok' AS p90_rank_ok,
        |  'ok' AS p99_rank_ok FROM lineitem""".stripMargin,

    "q27_events_tumbling" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         |  event_type, count(*) AS n, ${sqlDecSum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q28_events_sliding" ->
      s"""SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
         |    - o * INTERVAL '30 minutes' AS window_start,
         |  event_type, count(*) AS n, ${sqlDecSum("value")} AS sum_value
         |FROM events, unnest([0, 1]) AS t(o)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q34_props_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q29_sessionization" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, ts, event_id,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) > 600000000
        |  THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, sum(is_new) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
        |g AS (SELECT user_id, session_idx, count(*) AS n_events FROM s GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- round-5 additions ----

    "q50_mask_pii" ->
      s"""SELECT doc_id,
         |  regexp_replace(text, '$maskPatSql', '[MASK]', 'g') AS masked,
         |  CAST(len(regexp_extract_all(text, '$maskPatSql', 0)) AS INTEGER) AS n_masked
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q51_bigrams" ->
      s"""WITH toks AS (SELECT $toksSql AS l FROM documents),
         |bi AS (SELECT unnest(list_transform(range(1, len(l)),
         |    i -> l[i] || ' ' || l[i+1])) AS bigram FROM toks)
         |SELECT bigram, count(*) AS cnt FROM bi GROUP BY bigram
         |ORDER BY cnt DESC, bigram LIMIT 25""".stripMargin,

    "q52_event_gaps" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events)
        |SELECT user_id, count(gap_us) AS n_gaps,
        |  CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
        |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
        |  CAST(sum(gap_us) AS DOUBLE) / count(gap_us) AS avg_gap_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q53_cube_events" ->
      s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
         |SELECT coalesce(event_type, '__all__') AS event_type,
         |  coalesce(day, DATE '1970-01-01') AS day,
         |  CAST(GROUPING(event_type) AS INTEGER) AS g_type,
         |  CAST(GROUPING(day) AS INTEGER) AS g_day,
         |  count(*) AS n, ${sqlDecSum("value")} AS sum_value
         |FROM e GROUP BY CUBE(event_type, day)
         |ORDER BY g_type, g_day, event_type, day""".stripMargin,

    "q54_token_setops" ->
      s"""WITH en AS (SELECT DISTINCT unnest($toksSql) AS token FROM documents WHERE lang = 'en'),
         |de AS (SELECT DISTINCT unnest($toksSql) AS token FROM documents WHERE lang = 'de'),
         |zh AS (SELECT DISTINCT unnest($toksSql) AS token FROM documents WHERE lang = 'zh')
         |SELECT token, 'en_minus_de' AS op
         |  FROM (SELECT token FROM en EXCEPT SELECT token FROM de)
         |UNION ALL
         |SELECT token, 'en_and_zh' AS op
         |  FROM (SELECT token FROM en INTERSECT SELECT token FROM zh)
         |ORDER BY op, token""".stripMargin,

    "q55_quality_filter" ->
      s"""WITH q AS (SELECT doc_id, lang, $qualitySqlExpr AS quality FROM documents),
         |r AS (SELECT doc_id, lang, quality, percent_rank()
         |    OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ASC) AS pr FROM q)
         |SELECT doc_id, lang, quality FROM r WHERE pr <= 0.5
         |ORDER BY doc_id""".stripMargin,

    "q56_sql_q5" -> tpchQ5Sql,

    "q57_left_join_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    // NOT EXISTS, not NOT IN: NOT IN returns zero rows if the subquery ever
    // contains a NULL, silently diverging from Spark's left_anti; the sum
    // cast keeps the repo-wide BIGINT-checksum convention (DuckDB sums to
    // HUGEINT otherwise)
    "q58_never_ordered" ->
      """SELECT count(*) AS n_customers, CAST(sum(c_custkey) AS BIGINT) AS sum_ids
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q59_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS l FROM documents),
         |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
         |    i -> l[i] || ' ' || l[i+1])) AS bigram FROM t),
         |freq AS (SELECT bigram, count(*) AS freq FROM bi GROUP BY bigram)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(CASE WHEN freq <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(sum(CASE WHEN freq <= 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
         |FROM bi JOIN freq USING (bigram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q60_anomaly" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |win AS (SELECT event_type, h, n,
        |  count(n) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS n_prev,
        |  coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS sum_prev
        |FROM hourly)
        |SELECT event_type, h, n, n_prev, CAST(sum_prev AS BIGINT) AS sum_prev,
        |  CAST(CASE WHEN n_prev > 0 AND n * n_prev > 2 * sum_prev
        |    THEN 1 ELSE 0 END AS INTEGER) AS spike
        |FROM win ORDER BY event_type, h""".stripMargin,

    "q61_interval_join" ->
      """SELECT e.event_id, count(*) AS n_clicks
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id AND c.event_type = 'click'
        |  AND c.ts >= e.ts - INTERVAL 30 MINUTES AND c.ts <= e.ts
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,

    // like q39: the flags are the contract — the Spark side recomputes each
    // sketch value's true rank distributedly and must land within 1%
    "q62_grouped_quantiles" ->
      """SELECT event_type, count(*) AS n, 'ok' AS p50_rank_ok, 'ok' AS p90_rank_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q63_funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, event_id, event_type, ts,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) > 600000000
        |  THEN 1 ELSE 0 END AS is_new FROM e),
        |s AS (SELECT user_id, event_type, ts, sum(is_new) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
        |g AS (SELECT user_id, session_idx,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_from,
        |    max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_to
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(sum(CASE WHEN first_from IS NOT NULL AND last_to IS NOT NULL
        |    AND first_from <= last_to THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    // ---- round-6 additions ----

    "q70_pivot_totals" -> {
      def cell(i: Int) =
        s"""CAST(sum(CAST(o_totalprice AS DECIMAL(27,2)))
           |    FILTER (WHERE o_orderpriority LIKE '$i-%') AS DOUBLE) AS p$i""".stripMargin
      s"""SELECT o_orderstatus, ${(1 to 5).map(cell).mkString(",\n  ")}
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "q71_unpivot_measures" -> {
      def leg(c: String) =
        s"SELECT '$c' AS measure, $c AS val FROM lineitem"
      s"""WITH u AS (${leg("l_quantity")} UNION ALL ${leg("l_discount")}
         |  UNION ALL ${leg("l_tax")})
         |SELECT measure, count(*) AS n, ${sqlDecSum("val")} AS sum_val,
         |  min(val) AS min_val, max(val) AS max_val
         |FROM u GROUP BY measure ORDER BY measure""".stripMargin
    },

    "q72_grouping_sets" -> groupingSetsSql,

    "q73_chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |c AS (SELECT doc_id, toks, n,
         |  unnest(list_filter(range(0, n, 56), x -> x = 0 OR x < n - 8)) AS start FROM s)
         |SELECT doc_id, CAST(start // 56 AS INTEGER) AS chunk_idx, start,
         |  least(64, n - start) AS n_tokens,
         |  array_to_string(toks[CAST(start + 1 AS INTEGER):CAST(start + 64 AS INTEGER)], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q74_mixture_sample" -> {
      val h = ops.DetHash.sqlMd5Hash60("'mix|'||CAST(doc_id AS VARCHAR)")
      s"""WITH r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY $h, doc_id) AS rk FROM documents)
         |SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM r
         |WHERE (lang = 'de' AND rk <= 40) OR (lang = 'en' AND rk <= 120)
         |  OR (lang = 'zh' AND rk <= 15)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q75_zorder_cells" ->
      s"""WITH e AS (SELECT CAST(user_id % 1024 AS BIGINT) AS u,
         |    CAST(floor(value) AS BIGINT) AS vb FROM events),
         |z AS (SELECT u, vb, ${sources.ZOrder.sqlZValue("u", "vb", 10)} AS z FROM e)
         |SELECT z >> 12 AS cell, count(*) AS n,
         |  min(u) AS min_u, max(u) AS max_u,
         |  min(vb) AS min_vb, max(vb) AS max_vb
         |FROM z GROUP BY 1 ORDER BY cell""".stripMargin,

    // the bloom prunes; the exact join decides — so the oracle is the
    // plain join (any bloom false positive surviving to the output would
    // be a correctness failure here)
    "q76_bloom_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  ${sqlDecSum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q77_bm25" -> {
      val (k1, b) = (1.2, 0.75)
      val avgdl = "(CAST(total_toks AS DOUBLE) / n_docs)"
      def term(word: String, i: Int) = {
        val tf = s"CAST(len(list_filter(toks, x -> x = '$word')) AS DOUBLE)"
        s"""((CAST(n_docs AS DOUBLE) - df$i + 0.5) / (df$i + 0.5))
           |    * ($tf * ${k1 + 1}) / ($tf + $k1 * (${1 - b}
           |      + $b * CAST(len(toks) AS DOUBLE) / $avgdl))""".stripMargin
      }
      val terms = Seq("spark", "join", "fast")
      val dfCols = terms.zipWithIndex.map { case (w, i) =>
        s"CAST(sum(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
      }.mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(toks)) AS BIGINT) AS total_toks FROM t),
         |dfs AS (SELECT
         |    $dfCols
         |  FROM t)
         |SELECT doc_id, CAST(len(toks) AS INTEGER) AS dl,
         |  ${terms.zipWithIndex.map { case (w, i) => term(w, i) }.mkString("\n  + ")}
         |  AS bm25
         |FROM t, st, dfs ORDER BY doc_id""".stripMargin
    },

    "q78_scd2_merge" ->
      """WITH cur AS (SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS valid_from,
        |    CAST(NULL AS BIGINT) AS valid_to FROM customer),
        |upd AS (
        |  SELECT c_custkey, 'MOVED_' || c_mktsegment AS c_mktsegment,
        |    CAST(100 AS BIGINT) AS ts
        |  FROM customer WHERE c_custkey % 10 = 3
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, CAST(100 AS BIGINT) AS ts
        |  FROM customer WHERE c_custkey % 10 = 7)
        |SELECT cur.c_custkey, cur.c_mktsegment, cur.valid_from,
        |  CASE WHEN upd.c_custkey IS NOT NULL AND upd.c_mktsegment <> cur.c_mktsegment
        |    THEN upd.ts END AS valid_to
        |FROM cur LEFT JOIN upd ON cur.c_custkey = upd.c_custkey
        |UNION ALL
        |SELECT upd.c_custkey, upd.c_mktsegment, upd.ts AS valid_from,
        |  CAST(NULL AS BIGINT) AS valid_to
        |FROM upd LEFT JOIN cur ON cur.c_custkey = upd.c_custkey
        |WHERE cur.c_custkey IS NULL OR upd.c_mktsegment <> cur.c_mktsegment
        |ORDER BY c_custkey, valid_from""".stripMargin,

    "q79_pagerank" -> {
      // mirrors GraphOps.pageRankInt exactly: integer floor division (`//`
      // here, `div` in Spark — identical on non-negative operands), each
      // round CAST back to BIGINT (DuckDB sums to HUGEINT)
      val iters = (1 to 3).map { k =>
        s"""r$k AS (SELECT v.x, CAST(b.base + coalesce(i.inflow, 0) AS BIGINT) AS rank
           |  FROM v CROSS JOIN basep b LEFT JOIN (
           |    SELECT e.dst AS x, sum((85 * (r.rank // d.deg)) // 100) AS inflow
           |    FROM e JOIN r${k - 1} r ON e.src = r.x JOIN deg d ON e.src = d.src
           |    GROUP BY e.dst) i ON i.x = v.x)""".stripMargin
      }.mkString(",\n")
      s"""WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000000 AS sv
         |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e AS (SELECT c AS src, sv AS dst FROM cs UNION ALL SELECT sv, c FROM cs),
         |v AS (SELECT DISTINCT src AS x FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |params AS (SELECT count(*) AS n FROM v),
         |basep AS (SELECT (15 * (1000000000000 // n)) // 100 AS base FROM params),
         |r0 AS (SELECT x, 1000000000000 // (SELECT n FROM params) AS rank FROM v),
         |$iters
         |SELECT x - 1000000000 AS s_suppkey, rank FROM r3 WHERE x > 1000000000
         |ORDER BY rank DESC, s_suppkey LIMIT 20""".stripMargin
    },

    "q80_lang_top_terms" ->
      s"""WITH toks AS (SELECT lang, unnest($toksSql) AS term FROM documents),
         |c AS (SELECT lang, term, count(*) AS cnt FROM toks GROUP BY lang, term),
         |r AS (SELECT lang, term, cnt, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, term ASC) AS INTEGER) AS rank FROM c)
         |SELECT lang, term, cnt, rank FROM r WHERE rank <= 10
         |ORDER BY lang, rank""".stripMargin,

    // the same pipeline as chained CTEs over the shared fragments: quality
    // percent_rank (q55), md5 exact dedup (q18), brute-force J>=0.8 pairs +
    // recursive-CTE components over the SURVIVOR set (q37), chunk-start
    // counting (q73)
    "q81_corpus_prep" ->
      s"""WITH RECURSIVE qs AS (SELECT doc_id, lang, $qualitySqlExpr AS quality FROM documents),
         |qr AS (SELECT doc_id, percent_rank() OVER (PARTITION BY lang
         |    ORDER BY quality DESC, doc_id ASC) AS pr FROM qs),
         |kept AS (SELECT d.* FROM documents d JOIN qr USING (doc_id) WHERE qr.pr <= 0.5),
         |exw AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
         |exd AS (SELECT k.* FROM kept k JOIN exw USING (doc_id)),
         |${hashedShinglesCteFrom("exd")},
         |inv AS (SELECT id, sz, unnest(hs) AS tok FROM sized),
         |pr AS (SELECT l.id AS a, r.id AS b
         |  FROM inv l JOIN inv r ON l.tok = r.tok AND l.id < r.id
         |  GROUP BY l.id, r.id, l.sz, r.sz
         |  HAVING CAST(count(*) AS DOUBLE) / (l.sz + r.sz - count(*)) >= 0.8),
         |e AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b, a FROM pr),
         |reach AS (
         |  SELECT doc_id AS x, doc_id AS comp FROM exd
         |  UNION
         |  SELECT e.x, r.comp FROM e JOIN reach r ON r.x = e.y),
         |cc AS (SELECT x, min(comp) AS comp FROM reach GROUP BY x),
         |near AS (SELECT exd.* FROM exd JOIN cc ON cc.x = exd.doc_id AND cc.comp = exd.doc_id),
         |ch AS (SELECT doc_id, len(list_filter(range(0, len($toksSql), 56),
         |    x -> x = 0 OR x < len($toksSql) - 8)) AS n_chunks FROM near)
         |SELECT (SELECT count(*) FROM documents) AS n_raw,
         |  (SELECT count(*) FROM kept) AS n_quality,
         |  (SELECT count(*) FROM exd) AS n_exact,
         |  (SELECT count(*) FROM near) AS n_neardup,
         |  (SELECT CAST(sum(n_chunks) AS BIGINT) FROM ch) AS n_chunks""".stripMargin,

    // sized(id, sz, hs) holds each doc's DISTINCT shingle set, so the
    // unnested rows are already (id, h)-distinct
    "q82_boilerplate" ->
      s"""WITH $hashedShinglesCte,
         |rows_ AS (SELECT id, unnest(hs) AS h FROM sized),
         |df_ AS (SELECT h, count(*) AS n_docs FROM rows_ GROUP BY h)
         |SELECT id AS doc_id, count(*) AS n_windows,
         |  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS shared_frac
         |FROM rows_ JOIN df_ USING (h)
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    "q83_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_ids
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q84_quantize_int8" ->
      """WITH a AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |b AS (SELECT vec_id, mx, list_transform(v, x -> CAST(floor(x *
        |    (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END)) AS INTEGER)) AS q
        |  FROM a)
        |SELECT vec_id, mx, coalesce(CAST(list_sum(q) AS BIGINT), 0) AS q_sum,
        |  coalesce(CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT), 0) AS q_l1
        |FROM b ORDER BY vec_id""".stripMargin,

    "q87_skew_profile" ->
      """WITH counts AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |hist AS (SELECT c, count(*) AS k FROM counts GROUP BY c),
        |cum AS (SELECT c, sum(k) OVER (ORDER BY c) AS cum FROM hist),
        |tot AS (SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |  max(c) AS max_c FROM counts)
        |SELECT n_keys, n_rows, max_c,
        |  (SELECT min(c) FROM cum WHERE cum * 100 >= (SELECT n_keys FROM tot) * 50) AS p50_c,
        |  (SELECT min(c) FROM cum WHERE cum * 100 >= (SELECT n_keys FROM tot) * 90) AS p90_c,
        |  (SELECT min(c) FROM cum WHERE cum * 100 >= (SELECT n_keys FROM tot) * 99) AS p99_c,
        |  CAST((max_c * 10000) // n_rows AS BIGINT) AS top1_share_bp
        |FROM tot""".stripMargin,

    "q86_gap_fill" ->
      s"""WITH hourly AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         |    event_type, count(*) AS n, ${sqlDecSum("value")} AS sum_value
         |  FROM events GROUP BY 1, 2),
         |b AS (SELECT min(h) AS mn, max(h) AS mx FROM hourly),
         |spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b),
         |t AS (SELECT DISTINCT event_type FROM events)
         |SELECT spine.h, t.event_type, coalesce(n, 0) AS n,
         |  coalesce(sum_value, 0.0) AS sum_value
         |FROM spine CROSS JOIN t LEFT JOIN hourly USING (h, event_type)
         |ORDER BY h, event_type""".stripMargin,

    "q85_full_outer" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.day, p.day) AS day,
        |  coalesce(n_clicks, 0) AS n_clicks,
        |  coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.day = p.day
        |ORDER BY day""".stripMargin)

  /** Combined masking pattern, shared verbatim by q50's Spark side and SQL
    * oracle (Java-regex ∩ RE2 — the single source is
    * TextOps.defaultMaskPatterns, joined exactly as maskText joins it).
    */
  private val maskPatSql: String =
    TextOps.defaultMaskPatterns.mkString("(?:", "|", ")")

  /** THE quality-score expression — interpolated into both the q20 and q55
    * oracles, so the two can never drift apart.
    */
  private val qualitySqlExpr: String =
    s"""CAST(len(list_distinct($toksSql)) AS DOUBLE) / len($toksSql) * 0.4
       |  + least(CAST(len(list_filter($toksSql, t -> t IN $stopSql)) AS DOUBLE)
       |      / len($toksSql) * 5.0, 1.0) * 0.3
       |  + least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.3""".stripMargin
}
