package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives.
  *
  * Everything in the dedup / similarity tier that needs randomness derives it
  * from MD5 — the one hash both Spark and ANSI-ish SQL engines (DuckDB for
  * the correctness oracle) compute identically. That makes every
  * MinHash/SimHash/SRP-LSH query *bit-reproducible* across engines, runs,
  * partitionings and cluster sizes: the correctness gate can recompute the
  * exact same signatures in SQL, and a 1000-executor run produces the same
  * buckets as local[32].
  *
  * Base hash: `md5Hash60(x)` = first 15 hex chars of md5(x) as a 60-bit
  * non-negative long. 60 bits (not 64) so the value always fits a signed
  * BIGINT without overflow in either engine.
  *
  * MinHash permutations are universal-hash maps `h -> (a*h + b) mod P` over
  * the Mersenne prime P = 2^31 - 1, with (a, b) fixed public constants drawn
  * from a seeded PRNG at class-load. Operands stay below 2^62, so the
  * arithmetic never overflows signed 64-bit — required because SQL engines
  * (unlike Java) raise on BIGINT overflow.
  */
object DetHash {

  /** Mersenne prime 2^31 - 1: modulus of the MinHash permutation family. */
  val P: Long = 2147483647L

  private val hexLen = 15 // 60 bits

  /** Spark: 60-bit deterministic content hash (see object doc) — the native
    * [[graft.functions.Md5Hash60]] expression (digest bytes → long, no hex
    * round trip; bit-identical to the composed conv/substring/md5 form).
    */
  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.functions.Md5Hash60(bridge.expression(c)))
  }

  /** DuckDB SQL fragment computing the identical 60-bit hash of `expr`. */
  def sqlMd5Hash60(expr: String): String =
    s"CAST(('0x'||substring(md5($expr),1,$hexLen)) AS BIGINT)"

  /** Fixed public (a, b) pairs for k MinHash permutations, a in [1, P),
    * b in [0, P). Seeded PRNG → stable across builds; embedded as literals
    * in both the Spark plan and the oracle SQL.
    */
  def minHashPerms(k: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(0x6e736c6b6464L) // "nslkdd"
    IndexedSeq.fill(k) {
      val a = 1L + math.floorMod(rnd.nextLong(), P - 1)
      val b = math.floorMod(rnd.nextLong(), P)
      (a, b)
    }
  }

  /** Fixed public (a, b) pairs for the 60 SimHash bit-hash functions —
    * independent family from [[minHashPerms]] (different seed). Bit i of a
    * shingle's influence is the parity of `(a_i·h + b_i) mod P`.
    */
  val simHashPerms: IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(0x73696d68617368L) // "simhash"
    IndexedSeq.fill(60) {
      val a = 1L + math.floorMod(rnd.nextLong(), P - 1)
      val b = math.floorMod(rnd.nextLong(), P)
      (a, b)
    }
  }

  /** Spark: one MinHash permutation applied to a base-hash column. */
  def perm(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % lit(P)) + lit(b)) % lit(P)

  /** SQL: the identical permutation applied to a base-hash expression. */
  def sqlPerm(h: String, a: Long, b: Long): String =
    s"($a * (($h) % $P) + $b) % $P"

  /** Multiplier for the rolling (Horner) shingle-hash combination. */
  val A: Long = 1103515245L

  /** SQL: the Horner k-shingle chain over a token-hash list expression
    * (mirrors DedupOps.shingleHashRows)
    * (1-based indexing; `i` ranges over 1..len-k+1).
    */
  def sqlShingleHashes(th: String, k: Int): String = {
    val horner = (1 until k).foldLeft(s"$th[i]") { (acc, j) =>
      s"(($acc) * $A + $th[i + $j]) % $P"
    }
    s"CASE WHEN len($th) < $k THEN [] ELSE list_transform(range(1, len($th) - ${k - 2}), i -> $horner) END"
  }

  /** Driver-side twin of [[md5Hash60]]/[[sqlMd5Hash60]]: the same 60-bit
    * hash computed on the JVM, for test replays and driver-side constants.
    */
  def jvmMd5Hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, hexLen), 16)

  /** Driver-side md5 of a string (same bytes as Spark/DuckDB `md5`). */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private val twoPow59 = 576460752303423488L // 2^59

  /** Deterministic SRP hyperplane component for (plane p, dimension j) in
    * [-1, 1): md5("p_j") → 60-bit int → affine map. The Spark plan embeds
    * the resulting doubles as literals (pure codegen, no runtime hashing);
    * the oracle recomputes them in SQL from the same md5 — identical IEEE
    * doubles by construction.
    */
  def planeComponent(p: Int, j: Int): Double = {
    val h = java.lang.Long.parseLong(md5Hex(s"${p}_$j").substring(0, hexLen), 16)
    h.toDouble / twoPow59.toDouble - 1.0
  }

  /** SQL CTE body producing (p, cs) = plane index → ordered component list
    * for planes [0, nPlanes) over dimensions [0, dim). Mirrors
    * [[planeComponent]] exactly.
    */
  def sqlPlanesCte(nPlanes: Int, dim: Int): String =
    s"""SELECT p, list(CAST(('0x'||substring(md5(CAST(p AS VARCHAR)||'_'||CAST(j AS VARCHAR)),1,$hexLen)) AS BIGINT)
       |    / ${twoPow59}.0 - 1.0 ORDER BY j) AS cs
       |  FROM (SELECT CAST(p AS INTEGER) p, CAST(j AS INTEGER) j
       |        FROM range($nPlanes) t(p) CROSS JOIN range($dim) u(j))
       |  GROUP BY p""".stripMargin

  /** [[sqlPlanesCte]] under the STRIDED plane layout of the auto-sized SRP
    * family (`SimilarityOps.srpPlaneStride`): plane ids p = t·stride + i
    * for t ∈ [0, nTables), i ∈ [0, maxPlanes) — consumers mask `p % stride`
    * to the plane count they derive at query time.
    */
  def sqlPlanesStridedCte(nTables: Int, maxPlanes: Int, stride: Int,
                          dim: Int): String =
    s"""SELECT p, list(CAST(('0x'||substring(md5(CAST(p AS VARCHAR)||'_'||CAST(j AS VARCHAR)),1,$hexLen)) AS BIGINT)
       |    / ${twoPow59}.0 - 1.0 ORDER BY j) AS cs
       |  FROM (SELECT CAST(t * $stride + i AS INTEGER) p, CAST(j AS INTEGER) j
       |        FROM range($nTables) tt(t) CROSS JOIN range($maxPlanes) ii(i)
       |        CROSS JOIN range($dim) u(j))
       |  GROUP BY p""".stripMargin
}
