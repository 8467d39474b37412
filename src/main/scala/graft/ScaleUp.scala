package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes a `factor`×-replicated copy of an sf directory with shifted keys —
  * a TPC-H-style scale-up for measuring per-query scaling exponents
  * (SCALE_NOTES.md) with the SAME Bench harness at two real data sizes.
  *
  * Integrity rules:
  *   - dims (region, nation) are NOT replicated; nationkeys are never
  *     shifted, so every replicated customer/supplier still joins them;
  *   - fact keys shift by `replica * 100_000_000` consistently on both
  *     sides of every FK (orders.o_orderkey == lineitem.l_orderkey, etc.);
  *   - timestamps are unchanged: a bigger corpus over the same wall-clock
  *     window (event density grows, the realistic shape);
  *   - document text is passed through a per-replica vowel `translate`, and
  *     embeddings get a small per-replica deterministic perturbation, so
  *     replicas are NOT near-duplicates of each other. The engine's scaling
  *     is what's measured; the duplicate-explosion worst case is probed
  *     separately by [[ScaleProbe]], which replicates verbatim on purpose.
  *
  * Usage:
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 /root/repo/tmp/sf1 10"
  */
object ScaleUp {
  private val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    val (inDir, outDir, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // replicate with per-replica transform; replica 0 is the verbatim input
    def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionByName _)

    def shift(c: String, i: Int) = col(c) + lit(i * Offset)

    // refuse to re-scale an already-scaled directory: input ids >= Offset
    // mean a prior ScaleUp shifted them, and shifting again makes replica
    // ids COLLIDE (base + r1*Offset + r2*Offset double-counts every sum),
    // which silently corrupts id-keyed joins downstream (measured: a
    // 200k-vector corpus with 38k distinct ids turned an ANN probe
    // quadratic). Always scale from the ORIGINAL sf directory.
    Seq("orders" -> "o_orderkey", "documents" -> "doc_id",
        "embeddings" -> "vec_id", "events" -> "event_id").foreach {
      case (t, c) =>
        // max() over an empty table is NULL — getLong would NPE with an
        // opaque error; an empty table trivially passes the guard
        val row = read(t).agg(max(col(c))).head()
        if (!row.isNullAt(0)) {
          val mx = row.getLong(0)
          require(mx < Offset,
            s"$inDir/$t.parquet has $c up to $mx >= $Offset — already " +
              "ScaleUp output; re-scaling would collide replica ids. " +
              "Scale from the original sf directory with a larger factor.")
        }
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(rep(read("customer")) { (d, i) => d.withColumn("c_custkey", shift("c_custkey", i)) }, "customer")
    write(rep(read("supplier")) { (d, i) => d.withColumn("s_suppkey", shift("s_suppkey", i)) }, "supplier")
    write(rep(read("part")) { (d, i) => d.withColumn("p_partkey", shift("p_partkey", i)) }, "part")
    write(rep(read("orders")) { (d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))
    }, "orders")
    write(rep(read("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", i))
        .withColumn("l_partkey", shift("l_partkey", i))
        .withColumn("l_suppkey", shift("l_suppkey", i))
    }, "lineitem")
    write(rep(read("events")) { (d, i) =>
      d.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
    }, "events")
    // rotate vowels per replica: deterministic, codegen'd, and replicas
    // stop being near-duplicates (they share only vowel-free tokens)
    val vowels = "aeiou"
    write(rep(read("documents")) { (d, i) =>
      val rot = (vowels + vowels).substring(i % 5, i % 5 + 5)
      d.withColumn("doc_id", shift("doc_id", i))
        .withColumn("text", if (i == 0) col("text") else translate(col("text"), vowels, rot))
    }, "documents")
    write(rep(read("embeddings")) { (d, i) =>
      d.withColumn("vec_id", shift("vec_id", i))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"),
            (x, j) => x + ((pmod(lit(i) * 31 + j, lit(7)) - lit(3)).cast("float") * lit(0.01f))))
    }, "embeddings")

    println(s"""{"scaled": "$outDir", "factor": $factor}""")
    spark.stop()
  }
}
