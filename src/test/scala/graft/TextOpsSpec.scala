package graft

import graft.analysis.TextHash
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup/quality pipeline behavior on the corpus' PLANTED
  * near-duplicates (docs containing the rare `dup` marker are
  * ε-perturbed copies; e.g. docs 8↔245 share ~99% of 5-gram shingles
  * at sf0.01). The sketches (minhash, simhash) must surface those pairs
  * and agree with the exact similarity oracles.
  */
class TextOpsSpec extends AnyFunSuite {
  private val dir = TestSpark.Sf0001

  test("jaccard pairs find the planted near-duplicates and nothing wild") {
    val spark = TestSpark.spark
    val pairs = TextOps.jaccardPairs(spark, dir, tau = 0.5).cache()
    assert(pairs.count() > 0, "planted dups must surface")
    // every surfaced pair involves a dup-marked copy (the original of a
    // planted pair does not carry the marker; organic pairs sit ≪ 0.5)
    val dupDocs = graft.corpus.Corpus.documents(spark, dir)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val badPairs = pairs.collect().filter(r =>
      !dupDocs.contains(r.getLong(0)) && !dupDocs.contains(r.getLong(1)))
    assert(badPairs.isEmpty, s"pairs without any dup-marked member: ${badPairs.mkString(",")}")
  }

  test("minhash LSH output ≡ exact jaccard pairs (sketch recall on this corpus)") {
    val spark = TestSpark.spark
    val exact = TextOps.jaccardPairs(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = TextOps.minhashLsh(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(lsh == exact)
  }

  test("simhash surfaces the near-dup pairs found by jaccard") {
    val spark = TestSpark.spark
    // measured signature spread on this fixture: J≥0.8 pairs reach
    // hamming 11 (md5-derived bits); 16 gives margin and still prunes
    val sim = TextOps.simhashPairs(spark, dir, maxHamming = 16).cache()
    val jacc = TextOps.jaccardPairs(spark, dir, tau = 0.8)
      .select("a", "b")
    assert(jacc.except(sim.select("a", "b")).count() == 0,
      "every ≥0.8-jaccard pair is within simhash hamming 16")
    // hamming is symmetric-free (a<b) and within bound
    assert(sim.filter(col("a") >= col("b")).count() == 0)
    assert(sim.filter(col("hamming") > 16).count() == 0)
    // bit distances are consistent with hamming: rt = 2h/(64+h), rr ∈ [0,1]
    val bad = sim.filter(
      abs(col("rt_bits") - lit(2.0) * col("hamming") /
        (lit(64) + col("hamming"))) > 1e-4).count()
    assert(bad == 0, "rt_bits must equal 2h/(64+h)")
    assert(sim.filter(col("rr_bits") < 0.0 || col("rr_bits") > 1.0).count() == 0)
  }

  test("simhash hash kernels are deterministic and spread") {
    assert(TextHash.fnv1a64("spark") == TextHash.fnv1a64("spark"))
    assert(TextHash.fnv1a64("spark") != TextHash.fnv1a64("sparl"))
    val sig1 = TextHash.minhashSignature(Seq("a b c", "b c d"), 16).toSeq
    val sig2 = TextHash.minhashSignature(Seq("b c d", "a b c"), 16).toSeq
    assert(sig1 == sig2, "minhash is set-order independent")
    assert(TextHash.simhash64(Seq("x" -> 3L, "y" -> 1L)) ==
      TextHash.simhash64(Seq("y" -> 1L, "x" -> 3L)))
    assert(TextHash.rollingHash(Seq("a", "b")) != TextHash.rollingHash(Seq("b", "a")),
      "rolling fingerprint is order sensitive")
  }

  test("exact dedup: canonical ids are minimal and idempotent") {
    val spark = TestSpark.spark
    val dd = TextOps.dedupExact(spark, dir).cache()
    assert(dd.filter(col("canonical_id") > col("doc_id")).count() == 0)
    // canonical of canonical is itself
    val canon = dd.select(col("canonical_id").as("doc_id")).distinct()
    val self = dd.join(canon, "doc_id").filter(col("doc_id") =!= col("canonical_id"))
    assert(self.count() == 0)
  }

  test("langid predicts a label from the training label set, deterministic") {
    val spark = TestSpark.spark
    val li = TextOps.langId(spark, dir).cache()
    assert(li.count() == 500)
    val langs = graft.corpus.Corpus.documents(spark, dir)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(li.select("pred_lang").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(langs))
    val again = TextOps.langId(spark, dir)
    assert(li.except(again).count() == 0 && again.except(li).count() == 0)
  }

  /** Min-label propagation must close chains transitively (diameter >
    * 1 forces a second iteration), leave isolated docs as singleton
    * clusters, and be insensitive to pair orientation.
    */
  test("dup clusters: transitive chain, singleton, orientation-blind") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (1L to 7L).toDF("doc_id")
    // chain 5-3, 3-1 (min label 1 must travel 2 hops to 5); pair 6-2
    // given in descending orientation; 4 and 7 isolated
    val pairs = Seq((5L, 3L), (1L, 3L), (6L, 2L)).toDF("a", "b")
    val got = TextOps.dupClustersFrom(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((1L, 1L), (3L, 1L), (5L, 1L), (2L, 2L), (6L, 2L),
      (4L, 4L), (7L, 7L))
    assert(got == want, s"got $got")
  }
}
