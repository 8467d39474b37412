package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash groupBy),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard — each designed so the
  * only shuffle is on a compact key (digest / band signature / token), never
  * an all-pairs comparison.
  *
  * Scale contract: at 100 TB, exact dedup is one shuffle of a 16-byte digest;
  * MinHash banding shuffles `bands` small (band, sig) keys per document and
  * compares only within-bucket candidates (the standard
  * shingle→minhash→band→bucket-join pipeline); inverted-index Jaccard
  * shuffles (token, doc) pairs with a document-frequency cap on hot tokens
  * to bound skew.
  */
object DedupOps {

  /** Exact dedup summary: one row per distinct content digest with the
    * representative (minimum) id and the duplicate count.
    */
  def exactDedupSummary(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Exact dedup: keep one row per distinct content (the min-id winner).
    * groupBy on the digest shuffles 16 bytes/row regardless of document
    * size — cheaper than dropDuplicates(text), which shuffles whole
    * documents.
    */
  def exactDedup(df: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val winners = exactDedupSummary(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(winners, Seq(idCol), "inner")
  }

  /** k independent MinHash values over word `shingleK`-shingles. Hash family:
    * xxhash64 seeded by the permutation index, the standard "one hash
    * function + k seeds" construction. Returns an array<long> signature —
    * pure map, no shuffle. Empty shingle sets get null signatures (callers
    * filter).
    */
  def minHashSignature(text: Column, k: Int = 32, shingleK: Int = 3): Column = {
    val sh = TextOps.shingles(TextOps.tokens(text), shingleK)
    when(size(sh) > 0,
      transform(sequence(lit(0), lit(k - 1)),
        i => array_min(transform(sh, s => xxhash64(i, s)))))
  }

  /** Per-document band signatures: the k-wide signature is split into
    * `bands` contiguous slices and each slice is hashed. Output one row per
    * (id, band_idx, band_sig) — produced by a pure array expression + one
    * posexplode, no shuffle.
    */
  def minHashBands(df: DataFrame, idCol: String, sigCol: String,
                   bands: Int): DataFrame = {
    val rowsPerBand = size(col(sigCol)) / lit(bands)
    val bandSigs = transform(sequence(lit(0), lit(bands - 1)),
      b => hash(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand), b))
    df.select(col(idCol), posexplode(bandSigs).as(Seq("band_idx", "band_sig")))
  }

  /** Candidate near-dup pairs via MinHash LSH. ONE shuffle total: group by
    * (band_idx, band_sig), emit pairs from each bucket with an array
    * expression (buckets capped at `maxBucket` ids to bound pathological
    * collisions), then distinct. Collision probability follows the standard
    * 1-(1-s^r)^b curve.
    */
  def minHashCandidates(df: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", k: Int = 32, bands: Int = 8,
                        shingleK: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = df
      .select(col(idCol), minHashSignature(col(textCol), k, shingleK).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = minHashBands(sigs, idCol, "sig", bands)
    val buckets = banded
      .groupBy(col("band_idx"), col("band_sig"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pairs (a < b) from each bucket without a self-join
    val pairs = buckets.select(explode(flatten(
      transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
    pairs.select(col("p.a").as("a"), col("p.b").as("b")).distinct()
  }

  /** 64-bit SimHash over word shingles: per-bit ±1 vote of each shingle's
    * xxhash64, sign of the vote → bit. Near-dups have small Hamming distance.
    * Pure array-expression fold (bits unrolled at plan build time) — no
    * shuffle, no UDF.
    */
  def simHash(text: Column, shingleK: Int = 3): Column = {
    val sh = TextOps.shingles(TextOps.tokens(text), shingleK)
    val votes = aggregate(
      sh,
      array_repeat(lit(0), 64),
      (acc, s) => {
        val h = xxhash64(s)
        val bits = array((0 until 64).map { i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1)).otherwise(lit(-1))
        }: _*)
        zip_with(acc, bits, (a, b) => a + b)
      })
    (0 until 64)
      .map(i => when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact n-gram (shingle) Jaccard similarity pairs above `minJaccard`, via
    * a shingle inverted index (explode distinct shingles → self-join on
    * shingle → count intersections). Shuffle key = shingle; shingles are
    * near-unique so buckets stay tiny, and `maxDf` drops any shingle hotter
    * than the cap before the join (the standard skew guard — a shingle in N
    * docs would otherwise emit N² join rows).
    */
  def jaccardPairs(df: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   minJaccard: Double = 0.5, shingleK: Int = 3,
                   maxDf: Long = 100000L): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), shingleK)).as("toks"))
      .withColumn("sz", size(col("toks")))
      .filter(col("sz") > 0)
    val inv = toks.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val dfCounts = inv.groupBy(col("tok")).agg(count(lit(1)).as("tok_df"))
    val capped = inv
      .join(broadcast(dfCounts.filter(col("tok_df") > maxDf)), Seq("tok"), "left_anti")
    val l = capped.select(col("tok"), col("id").as("a"), col("sz").as("sza"))
    val r = capped.select(col("tok"), col("id").as("b"), col("sz").as("szb"))
    l.join(r, Seq("tok"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= lit(minJaccard))
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
  }
}
