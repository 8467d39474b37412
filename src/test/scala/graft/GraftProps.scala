package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, DetHash, RelationalOps}

/** ScalaCheck properties (SURVEY §5.2-3): randomized invariants over the
  * numeric and dedup kernels. Spark-backed properties keep the case count
  * small — each check is a real job on the shared local session.
  */
object GraftProps extends Properties("graft") {

  private lazy val spark = SparkTestBase.session
  import spark.implicits._

  // 2-decimal "money" doubles, the testdata's fixed-point domain
  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(40, Gen.chooseNum(-99999L, 99999L).map(_ / 100.0))
      .suchThat(_.nonEmpty)

  property("decSum is exact and partitioning-independent") =
    forAll(moneyGen, Gen.chooseNum(1, 7)) { (xs, parts) =>
      val expected = xs.map(BigDecimal(_)).sum.toDouble
      val got = xs.toDF("x").repartition(parts)
        .agg(RelationalOps.decSum(col("x")).as("s")).head().getDouble(0)
      got == expected
    }

  property("threshold is monotone in e and in the score") =
    forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) {
      (p1, p2, e) =>
        val r = Seq((p1, p2)).toDF("a", "b").select(
          RelationalOps.threshold(col("a"), e).as("ta"),
          RelationalOps.threshold(col("b"), e).as("tb")).head()
        val (ta, tb) = (r.getDouble(0), r.getDouble(1))
        // 0/1 outputs, and ordering of scores never inverts the predictions
        val domainOk = Set(0.0, 1.0).contains(ta) && Set(0.0, 1.0).contains(tb)
        val monotone = !(p1 < p2) || ta <= tb
        Prop(domainOk && monotone) :| s"ta=$ta tb=$tb"
    }

  private val permGen: Gen[(Long, Long, Long)] = for {
    a <- Gen.chooseNum(1L, DetHash.P - 1)
    b <- Gen.chooseNum(0L, DetHash.P - 1)
    h <- Gen.chooseNum(0L, (1L << 60) - 1)
  } yield (a, b, h)

  property("minhash permutation stays in [0, P) and never overflows") =
    forAll(permGen) { case (a, b, h) =>
      val v = Seq(h).toDF("h").select(DetHash.perm(col("h"), a, b).as("p"))
        .head().getLong(0)
      v >= 0L && v < DetHash.P
    }

  private val docGen: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    Gen.listOfN(6, Gen.listOfN(8, word).map(_.mkString(" ")))
  }

  property("banded simhash retrieval == brute force at maxDist (pigeonhole)") =
    Prop.forAllNoShrink(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val fps = DedupOps.simHash60(DedupOps.shingleHashRows(df)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val banded = DedupOps.simHashNearDupPairs(
          DedupOps.simHash60(DedupOps.shingleHashRows(df)), maxDist = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (a, fa) <- fps; (b, fb) <- fps
        if a < b && java.lang.Long.bitCount(fa ^ fb) <= 5
      } yield (a, b)).toSet
      banded == brute
    }

  property("exact dedup partitions rows: winners + dropped = total") =
    Prop.forAllNoShrink(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = DedupOps.exactDedup(df).count()
      val groups = DedupOps.exactDedupSummary(df).count()
      kept == groups && kept <= texts.length
    }

  property("chunkDocs covers the stream: stitching non-overlap suffixes rebuilds every doc") =
    Prop.forAllNoShrink(docGen, Gen.chooseNum(2, 12), Gen.chooseNum(0, 1)) {
      (texts, chunk, ov) =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val chunks = graft.ops.TextOps.chunkDocs(df, chunk, ov)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
          .groupBy(_._1)
        texts.zipWithIndex.forall { case (t, i) =>
          val parts = chunks(i.toLong).sortBy(_._2).map(_._3.split(" ").toSeq)
          val stitched = parts.head ++ parts.tail.flatMap(_.drop(ov))
          stitched == t.split("\\s+").toSeq
        }
    }

  property("hashRankSample: exact capped counts and determinism under repartition") =
    Prop.forAllNoShrink(Gen.chooseNum(1L, 20L), Gen.chooseNum(1, 5)) { (target, parts) =>
      val df = (0L until 30L).map(i => (i, if (i % 3 == 0) "a" else "b"))
        .toDF("doc_id", "lang")
      val take = RelationalOps.hashRankSample(df, "doc_id", "lang", Map("a" -> target))
      val ids = take.select("doc_id").collect().map(_.getLong(0)).toSet
      val again = RelationalOps.hashRankSample(df.repartition(parts), "doc_id", "lang",
        Map("a" -> target)).select("doc_id").collect().map(_.getLong(0)).toSet
      ids.size == math.min(target, 10L) && ids == again &&
        ids.forall(_ % 3 == 0)
    }

  property("deterministicShuffle: permutation of 0..n-1, stable under repartition, any id sign") =
    Prop.forAllNoShrink(
      Gen.listOfN(25, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)).map(_.distinct),
      Gen.chooseNum(1, 7)) { (ids, parts) =>
      val df = ids.toDF("doc_id")
      val pos = RelationalOps.deterministicShuffle(df, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val again = RelationalOps.deterministicShuffle(df.repartition(parts), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      pos.values.toSeq.sorted == (0L until ids.size.toLong) && pos == again
    }

  property("ngramSpanContamination: spans ordered, disjoint, inside the doc, each ≥ n tokens") =
    Prop.forAllNoShrink(Gen.chooseNum(2, 4), Gen.chooseNum(5, 30)) { (n, len) =>
      // train = a rotating slice of the eval doc, so overlap exists often
      val evalToks = (0 until len).map(i => s"w${i % 7}")
      val doc = evalToks.mkString(" ")
      val train = Seq((0L, evalToks.drop(len / 3).mkString(" "))).toDF("doc_id", "text")
      val eval = Seq((1L, doc)).toDF("doc_id", "text")
      val spans = DedupOps.ngramSpanContamination(train, eval, n)
        .orderBy("span_start").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getLong(3)))
      spans.forall { case (s, e, g) =>
        s >= 1 && e <= len && e - s + 1 >= n && g >= 1
      } && spans.sliding(2).forall {
        case Array((_, e1, _), (s2, _, _)) => s2 > e1 + 1 // disjoint, non-adjacent
        case _ => true
      }
    }

  // keep Spark-backed properties cheap
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)
}
