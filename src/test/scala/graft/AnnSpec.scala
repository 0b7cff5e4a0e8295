package graft

import graft.operators.{AnnOps, VectorOps}
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-index quality gate — the reference's CI pattern
  * (/root/reference/test/testsearchgraph.jl:63-68): build the exact
  * gold with the exhaustive scorer, then require macrorecall ≥ 0.8
  * from the approximate path. Self-hit (rank 1 = the query itself)
  * must always be found by construction.
  */
class AnnSpec extends AnyFunSuite {
  private val dir = TestSpark.Sf0001
  private val k = 5

  private lazy val gold = VectorOps.allKnn(TestSpark.spark, dir, k).cache()

  test("LSH ANN: macrorecall vs exhaustive gold ≥ 0.8; self always found") {
    val spark = TestSpark.spark
    val lsh = AnnOps.annLsh(spark, dir, k).cache()
    val r = AnnOps.macrorecall(gold, lsh, k)
    info(f"lsh macrorecall = $r%.4f")
    assert(r >= 0.8, f"LSH recall $r%.4f below the reference gate")
    import org.apache.spark.sql.functions._
    assert(lsh.filter(col("rnk") === 1)
      .filter(col("vec_id") =!= col("nbr_id")).count() == 0)
  }

  test("IVF ANN: macrorecall vs exhaustive gold ≥ 0.8; self always found") {
    val spark = TestSpark.spark
    val ivf = AnnOps.annIvf(spark, dir, k).cache()
    val r = AnnOps.macrorecall(gold, ivf, k)
    info(f"ivf macrorecall = $r%.4f")
    assert(r >= 0.8, f"IVF recall $r%.4f below the reference gate")
  }

  test("IVF sampled center training: full-sample ≡ distributed fft; genuinely sampled recall ≥ 0.8 at nlist ≥ 64") {
    val spark = TestSpark.spark
    import graft.operators.CentersOps
    // sample covering the whole corpus → selection IDENTICAL to the
    // oracled k-job fft (same seed, rounded distance, tie rule)
    val viaFft = CentersOps.fft(spark, dir, 8)
      .select("center_id").collect().map(_.getLong(0)).toSeq
    val viaSampled = CentersOps.fftSampled(spark, dir, 8, sampleFactor = 1000).toSeq
    assert(viaSampled == viaFft, s"full-sample fftSampled $viaSampled != fft $viaFft")
    // factor 2 at nlist=64 over n=500 → stride > 1: training genuinely
    // runs on a strict subset, the 100×-scale path — recall gate holds
    val ivf = AnnOps.annIvf(spark, dir, k, nlist = 64, sampleFactor = 2).cache()
    val r = AnnOps.macrorecall(gold, ivf, k)
    info(f"ivf sampled-training macrorecall = $r%.4f")
    assert(r >= 0.8, f"sampled-training IVF recall $r%.4f below the reference gate")
  }

  test("fftSampled: sparse/offset vec_id space still yields a real training sample") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.CentersOps
    // all-odd ids offset by 10^9: an id-stride filter (vec_id % stride)
    // matches ZERO rows here for any even stride — the hash-stride
    // sample must keep training id-layout-blind
    val sparse = java.nio.file.Files.createTempDirectory("graft-ann-sparse-").toString
    try {
      val ids = (0 until 600).map(i => 1000000000L + 2L * i + 1L)
      // UNIT vectors (the corpus invariant jvmDist's 1−dot relies on),
      // directions spread by id so farthest-first has real geometry
      ids.map { id =>
        val a = (id % 97).toDouble / 97.0 * math.Pi
        (id, Array(math.cos(a).toFloat, math.sin(a).toFloat, 0f, 0f))
      }.toDF("vec_id", "embedding")
        .write.parquet(s"$sparse/embeddings.parquet")
      val centers = CentersOps.fftSampled(spark, sparse, 8, sampleFactor = 2)
      assert(centers.length == 8, s"expected 8 centers, got ${centers.length}")
      assert(centers.forall(ids.contains), "centers must come from the corpus ids")
      assert(centers.distinct.length == 8, "centers must be distinct")
    } finally graft.operators.StreamingOps.deleteRec(sparse)
  }

  test("fused cell assignment ≡ crossJoin+topKByDist (the form it replaced)") {
    // IVF assignment runs through VectorOps.fusedExhaustiveKnn with the
    // center table as the broadcast db; this pins row-identity against
    // the declarative crossJoin→bounded-heap form at np > 1, so the
    // kernel swap can never silently shift cell assignments
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val cents = graft.operators.CentersOps.fftSampled(spark, dir, 16)
    val cembs = graft.corpus.Corpus.embeddings(spark, dir)
      .filter(col("vec_id").isin(cents.toIndexedSeq: _*))
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("cemb"))
    val emb = graft.corpus.Corpus.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val fused = VectorOps.fusedExhaustiveKnn(emb, cembs, 8, "vec_id", "cell")
    val pairs = emb.crossJoin(broadcast(cembs))
      .select(col("vec_id"), col("cell"),
        VectorOps.distCol(col("emb"), col("cemb")).as("dist"))
    val decl = VectorOps.topKByDist(pairs, 8, "vec_id", "cell")
    val f = fused.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val d = decl.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(f == d, "fused assignment diverged from the declarative form")
  }

  test("LSH ANN: empty embeddings table → empty result, not an exception") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = java.nio.file.Files.createTempDirectory("graft-ann-empty-").toString
    try {
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
        .write.parquet(s"$empty/embeddings.parquet")
      assert(AnnOps.annLsh(spark, empty, k).count() == 0)
    } finally graft.operators.StreamingOps.deleteRec(empty)
  }

  test("recall metric: rerank-vs-gold macrorecall in (0, 1]") {
    val spark = TestSpark.spark
    val r = AnnOps.recallReport(spark, dir, k).head().getDouble(0)
    assert(r > 0.0 && r <= 1.0)
  }

  test("optimize_index! transfer: tuner reaches the MinRecall(0.9) goal with minimal nprobe") {
    val spark = TestSpark.spark
    val (nprobe, r, _) = AnnOps.tunedIvf(spark, dir, k, nlist = 16, target = 0.9)
    info(f"tuned nprobe=$nprobe recall=$r%.4f")
    assert(r >= 0.9)
    assert(nprobe <= 16)
    if (nprobe > 1) {
      // the next-cheaper configuration must fail the goal (minimality)
      val cheaper = AnnOps.annIvf(spark, dir, k, 16, nprobe / 2)
      assert(AnnOps.macrorecall(gold, cheaper, k) < 0.9)
    }
  }

  test("optimize_index! goal family: Pareto/radius goals pick frontier configs") {
    val spark = TestSpark.spark
    val ladder = AnnOps.evalIvfLadder(spark, dir, k, nlist = 16)
    assert(ladder.nonEmpty && ladder.last.nprobe == 16)
    // recall is non-decreasing in nprobe (more cells probed ⇒ superset candidates)
    assert(ladder.map(_.recall).sliding(2).forall(p => p.head <= p.last + 1e-12))

    // one measured ladder answers all goals (chooseConfig is pure, so
    // the domination checks below see the exact same floats it saw)
    val pr = AnnOps.chooseConfig(ladder, AnnOps.ParetoRecallGoal)
    // argmin of cost²+(1−recall)² is Pareto-optimal: nothing may dominate it
    assert(!ladder.exists(c => c.cost <= pr.cost && c.recall >= pr.recall &&
      (c.cost < pr.cost || c.recall > pr.recall)), s"dominated ParetoRecall pick $pr")

    val prad = AnnOps.chooseConfig(ladder, AnnOps.ParetoRadiusGoal)
    assert(!ladder.exists(c => c.cost <= prad.cost && c.radiusMean <= prad.radiusMean &&
      (c.cost < prad.cost || c.radiusMean < prad.radiusMean)),
      s"dominated ParetoRadius pick $prad")

    // MinRecall via the generalized loss agrees with the early-exit tuner
    val mr = AnnOps.chooseConfig(ladder, AnnOps.MinRecallGoal(0.9))
    val (np, r, _) = AnnOps.tunedIvf(spark, dir, k, nlist = 16, target = 0.9)
    assert(mr.nprobe == np && mr.recall >= 0.9 && r >= 0.9)

    // OptRadius: within the chosen radius bucket, nothing is cheaper
    val or = AnnOps.chooseConfig(ladder, AnnOps.OptRadiusGoal(0.1))
    val maxRad = ladder.map(_.radiusMean).max
    def bucket(c: AnnOps.IvfConfig) = math.round(c.radiusMean / maxRad / 0.1)
    assert(!ladder.exists(c => bucket(c) == bucket(or) && c.cost < or.cost))
  }

  test("closestPairLsh: finds the TRUE closest pair on the fixture; no cartesian in the plan") {
    val spark = TestSpark.spark
    val gold = VectorOps.closestPair(spark, dir).collect().head
    val lsh = AnnOps.closestPairLsh(spark, dir)
    // scale claim first: the pair space must be bucket-bounded — the
    // O(n²) node the gold path uses may not appear anywhere
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "closestPairLsh plan contains a cartesian product")
    val got = lsh.collect().head
    // the true pair collides in ≥1 of 16 tables on the fixture, so the
    // bucketed path must return the exact gold row (dist is the shared
    // rounded distCol, hence bit-comparable)
    assert(got.getLong(0) == gold.getLong(0) && got.getLong(1) == gold.getLong(1)
      && got.getDouble(2) == gold.getDouble(2),
      s"closestPairLsh $got != exact gold $gold")
  }

  test("nearDupLsh: q06 invariants hold; misses only ever move the cover LATER") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val eps = 0.65
    val lsh = AnnOps.nearDupLsh(spark, dir, eps).cache()
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "nearDupLsh plan contains a cartesian product")
    val n = VectorOps.embCount(spark, dir)
    // total coverage: every vector reports exactly one cover (self is
    // always a candidate, so cap truncation cannot lose a row)
    assert(lsh.count() == n)
    assert(lsh.filter(col("dist") > eps).count() == 0)
    assert(lsh.filter(col("nn") > col("vec_id")).count() == 0)
    // vs the exact q06 semantics: agreement is LSH-recall-bounded, and
    // a miss must degrade toward a LATER (still within-ε) cover — never
    // an earlier id the exact form rejected, never a wrong distance
    val exact = VectorOps.nearDup(spark, dir, eps)
      .select(col("vec_id"), col("nn").as("exact_nn"))
    val joined = lsh.join(exact, "vec_id").cache()
    val agree = joined.filter(col("nn") === col("exact_nn")).count()
    info(s"nearDupLsh agreement with exact: $agree/$n")
    assert(agree >= (n * 0.9).toLong, s"agreement $agree/$n below 0.9")
    assert(joined.filter(col("nn") < col("exact_nn")).count() == 0,
      "LSH near-dup reported an EARLIER cover than the exact form")
  }

  test("exact closestPair/nearDup gold paths refuse above the guard cap") {
    val spark = TestSpark.spark
    spark.conf.set("graft.exact.maxN", "10")
    try {
      val e1 = intercept[IllegalArgumentException](VectorOps.closestPair(spark, dir))
      val e2 = intercept[IllegalArgumentException](VectorOps.nearDup(spark, dir))
      assert(e1.getMessage.contains("graft.exact.maxN"))
      assert(e2.getMessage.contains("graft.exact.maxN"))
    } finally spark.conf.unset("graft.exact.maxN")
  }
}
