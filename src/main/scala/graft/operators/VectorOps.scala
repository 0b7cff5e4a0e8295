package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's vector k-NN operator family transferred literally —
  * these run on the `embeddings` table (vec_id, embedding float[64],
  * label) under `NormCosine` distance `1 − a·b` over unit vectors
  * (/root/reference/src/dist/cos.jl:16-111), with the pinned tie rule
  * (dist ASC, id ASC) and round(·,4) at the output boundary.
  *
  * Float discipline: both engines cast the float vectors to double and
  * accumulate the dot left-to-right in double (Spark `aggregate` over
  * `zip_with`; DuckDB `list_dot_product` over `DOUBLE[]`), so the sums
  * agree to ≪ the rounding grid.
  *
  * Scale notes: the exact all-pairs forms below are O(n²·d) — the
  * ground-truth path, exactly like the reference's `ExhaustiveSearch`
  * gold (/root/reference/test/testsearchgraph.jl:24). The sub-quadratic
  * scale path is the LSH-bucketed ANN in [[AnnOps]]; at 10^12 docs you
  * run THAT, and validate it against THIS on samples.
  */
object VectorOps {

  /** dot(a,b) accumulated in double, left-to-right — the codegen'd
    * [[graft.functions.DotF64]] (bit-identical to the
    * `aggregate(zip_with(...))` form it replaced, without the per-pair
    * intermediate arrays).
    */
  def dotCol(a: Column, b: Column): Column = graft.functions.DotF64.dot(a, b)

  /** NormCosine distance, rounded at the output grid.
    *
    * `+ 0.0` normalizes IEEE negative zero: for self/duplicate pairs the
    * double dot of unit vectors can exceed 1.0 by ~1e-8, so the rounded
    * distance is −0.0 in engines that round in binary (DuckDB) but +0.0
    * in engines that round through decimal strings (Spark's BigDecimal).
    * −0.0 + 0.0 = +0.0 in IEEE 754, so BOTH engines emit the same bit
    * pattern and the driver's hash-identity gate holds (round-1 failure
    * on q04/q06/q10/q25/q29; every oracle SQL mirrors the `+ 0.0`).
    */
  def distCol(a: Column, b: Column): Column =
    round(lit(1.0) - dotCol(a, b), 4) + lit(0.0)

  /** Gold-path guard: the exact all-pairs family below is O(n²·d) BY
    * DESIGN — it is the ground truth the sub-quadratic paths are
    * recall-gated against, exactly the reference's `ExhaustiveSearch`.
    * Pointing it at a production-size corpus is a cluster-killer, so it
    * refuses above a configurable row cap instead of silently running
    * for a week. Raise `graft.exact.maxN` (session conf) to override,
    * or use the ANN/LSH scale path ([[AnnOps]]).
    */
  private[graft] def guardExact(spark: SparkSession, n: Long): Unit = {
    val cap = spark.conf.getOption("graft.exact.maxN").map(_.toLong).getOrElse(1000000L)
    require(n <= cap,
      s"exact O(n^2) gold path invoked on n=$n > cap=$cap rows; " +
        "use the ANN/LSH scale path (AnnOps) or raise graft.exact.maxN")
  }

  /** Row counts for the guard, memoized per (table, sfDir): fixture
    * tables are immutable per directory, and the guard used to cost one
    * count() JOB per invocation (rerank alone triggered it 4×) — pure
    * driver-side latency noise on the query paths. A caller that
    * REWRITES a corpus directory in-process must call
    * [[invalidateCounts]] or the guard checks the stale count (same
    * staleness contract as [[graft.index.Wand.invalidate]]).
    */
  private val countMemo = scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  private[graft] def invalidateCounts(sfDir: String): Unit =
    countMemo.keys.filter(_._2 == sfDir).foreach(countMemo.remove)

  private[graft] def embCount(spark: SparkSession, sfDir: String): Long =
    countMemo.getOrElseUpdate(("embeddings", sfDir), Corpus.embeddings(spark, sfDir).count())

  private[operators] def docCount(spark: SparkSession, sfDir: String): Long =
    countMemo.getOrElseUpdate(("documents", sfDir), Corpus.documents(spark, sfDir).count())

  private def emb(spark: SparkSession, sfDir: String, alias: String): DataFrame = {
    guardExact(spark, embCount(spark, sfDir))
    Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as(s"${alias}_id"), col("embedding").as(s"${alias}_emb"))
  }

  /** Bounded top-k per group over (group, id, dist) rows through the
    * shared [[TopK]] aggregator under the `NegativeDistanceHack` bridge
    * (/root/reference/src/dist/hacks.jl:13-17, score = −dist): partial
    * heaps combine MAP-SIDE, so only ~k rows per (partition, group)
    * shuffle — the window form sorts the entire pair space per group,
    * which at n² pairs is the dominant cost. Order and tie rule are the
    * pinned (dist ASC, id ASC); −0.0 == 0.0 in the comparator and the
    * final negation restores +0.0, so oracle hash-identity is
    * preserved.
    */
  /** The canonical EMPTY kNN result — one definition of the
    * (vec_id, rnk, nbr_id, dist) shape for every operator's empty path
    * (empty corpus, empty batch), so the empty-path schema can never
    * drift from the populated one this file's top-k kernels produce.
    */
  private[graft] def emptyKnnFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, Long, Double)].toDF("vec_id", "rnk", "nbr_id", "dist")
  }

  private[graft] def topKByDist(pairs: DataFrame, k: Int,
      groupCol: String, idCol: String): DataFrame = {
    import pairs.sparkSession.implicits._
    val typed = pairs
      .select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col("dist").cast("double"))
      .as[(Long, Long, Double)]
    val agg = new BoundedTopKAggregator(k)
    typed.groupByKey(_._1)
      .mapValues(t => graft.core.Types.ScoredDoc(t._2, -t._3))
      .agg(agg.toColumn.name("hits"))
      .toDF(groupCol, "hits")
      .select(col(groupCol), posexplode(col("hits")))
      .select(col(groupCol).cast("long"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.doc_id").cast("long").as(idCol),
        (-col("col.score")).cast("double").as("dist"))
  }

  /** JVM twin of [[distCol]], bit-identical by construction: same
    * sequential dot order as the DotF64 codegen, and the same rounding
    * Catalyst's `Round` performs on doubles (BigDecimal.valueOf —
    * i.e. Double.toString — then HALF_UP at scale 4), then the same
    * `+ 0.0` negative-zero normalization.
    */
  @inline private[graft] def jvmDist(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); i += 1 }
    java.math.BigDecimal.valueOf(1.0 - dot)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
  }

  /** The reference's `ParallelExhaustiveSearch` transferred at the
    * EXECUTION level too (/root/reference/src/parallel-exhaustive.jl:44-62):
    * the database is broadcast (its shared-memory assumption — valid
    * under [[guardExact]], which caps this gold path), each partition
    * scans its query slice against the whole DB with a bounded local
    * [[TopK]] heap, and every query's top-k completes inside its own
    * partition — ZERO rows shuffle. The declarative
    * crossJoin→[[topKByDist]] form (kept for the bucketed/candidate
    * call sites) materializes n·m pair rows through hash aggregation
    * and still exchanges ~k rows per group; for the full-cross gold
    * queries the fused scan is the same answer at a fraction of the
    * cost. Identical output by construction: [[jvmDist]] ≡ distCol
    * bit-for-bit and the heap is the same pinned-tie-rule kernel.
    *
    * Driver sizing: the collect+broadcast holds the whole DB on the
    * driver — ~0.5 GB at the default 1M-row cap with 64-dim doubles —
    * so a driver below ~2 GB should lower `graft.exact.maxN` to match.
    * The broadcast is reclaimed by Spark's ContextCleaner once the
    * returned plan is unreferenced.
    */
  private[graft] def fusedExhaustiveKnn(queries: DataFrame, db: DataFrame,
      k: Int, outGroup: String, outId: String): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val dbRows = db.as[(Long, Array[Double])].collect().sortBy(_._1)
    val ids = dbRows.map(_._1)
    val vecs = dbRows.map(_._2)
    val bc = spark.sparkContext.broadcast((ids, vecs))
    queries.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (nids, nvecs) = bc.value
        it.flatMap { case (qid, q) =>
          val heap = TopK.empty(k)
          var j = 0
          while (j < nids.length) {
            var dot = 0.0
            var i = 0
            while (i < q.length) { dot += q(i) * nvecs(j)(i); i += 1 }
            val ud = 1.0 - dot
            // rounding displaces a value by at most 0.5e-4, so an
            // unrounded dist more than 1e-4 above the current worst
            // KEPT dist rounds to something still strictly worse —
            // skip the BigDecimal round for the ~100% of pairs that
            // can't enter the heap (TopK.threshold is −worstDist
            // under the negation bridge; −∞ until full ⇒ never skips).
            // Non-finite dist (NaN/Inf embedding input) is skipped
            // outright: it can never out-rank a finite pair, and
            // BigDecimal.valueOf would throw on it
            if (java.lang.Double.isFinite(ud) &&
                !(ud - 1e-4 > -TopK.threshold(heap)))
              TopK.insert(heap, nids(j),
                -(java.math.BigDecimal.valueOf(ud)
                  .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0))
            j += 1
          }
          TopK.result(heap).iterator.zipWithIndex.map { case (h, i) =>
            (qid, i + 1, h.doc_id, -h.score)
          }
        }
      }
      .toDF(outGroup, "rnk", outId, "dist")
      .select(col(outGroup).cast("long"), col("rnk").cast("int"),
        col(outId).cast("long"), col("dist").cast("double"))
  }

  /** Q8 `allknn` (/root/reference/src/allknn.jl:27-68): k-NN of every
    * indexed element; self-reference preserved (v0.9 reference
    * behavior, /root/reference/README.md:100) — rank 1 is the vector
    * itself at dist 0. Runs through [[fusedExhaustiveKnn]] — the
    * parallel-exhaustive scan with per-partition bounded heaps.
    */
  def allKnn(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    guardExact(spark, embCount(spark, sfDir))
    val e = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    fusedExhaustiveKnn(e, e, k, "vec_id", "nbr_id").orderBy("vec_id", "rnk")
  }

  def allKnnOracleSql(k: Int = 5): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS dist
       |  FROM embeddings a, embeddings b
       |), r AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC) AS INTEGER) AS rnk,
       |         CAST(nbr_id AS BIGINT) AS nbr_id, CAST(dist AS DOUBLE) AS dist
       |  FROM p
       |)
       |SELECT vec_id, rnk, nbr_id, dist FROM r WHERE rnk <= $k
       |ORDER BY vec_id, rnk""".stripMargin

  /** Q3 `searchbatch` with an EXTERNAL query set — the reference's
    * flagship call shape (`searchbatch(index, ctx, Q, k)`,
    * /root/reference/src/SimilaritySearch.jl:144-190; its tests drive
    * m query vectors DISTINCT from the database,
    * /root/reference/test/testsearchgraph.jl:10-42). Callers hand in
    * (q_id, vector) pairs; the corpus is the database; the kernel is
    * the same fused parallel-exhaustive scan as [[allKnn]] — which is
    * exactly this call with the corpus as the query set.
    */
  def searchBatch(spark: SparkSession, sfDir: String,
      queries: Seq[(Long, Array[Double])], k: Int = 5): DataFrame = {
    import spark.implicits._
    guardExact(spark, embCount(spark, sfDir))
    if (queries.isEmpty) return emptyKnnFrame(spark)
    val q = queries.toDF("vec_id", "emb")
    val db = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    fusedExhaustiveKnn(q, db, k, "vec_id", "nbr_id").orderBy("vec_id", "rnk")
  }

  /** Registry form (q46): the external-query surface driven with
    * pinned corpus vectors — collected FIRST, then passed as explicit
    * (id, vector) literals, so the query plan takes the same id-free
    * path a user's own vectors would. Equals the exhaustive kNN of
    * those rows, hence the filtered allknn oracle.
    */
  def searchBatchOnCorpus(spark: SparkSession, sfDir: String, k: Int = 5,
      ids: Seq[Long] = Seq(3L, 17L, 101L)): DataFrame = {
    import spark.implicits._
    val qs = Corpus.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
    searchBatch(spark, sfDir, qs, k)
  }

  def searchBatchOracleSql(ids: Seq[Long] = Seq(3L, 17L, 101L), k: Int = 5): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS dist
       |  FROM embeddings a, embeddings b
       |  WHERE a.vec_id IN (${ids.mkString(", ")})
       |), r AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC) AS INTEGER) AS rnk,
       |         CAST(nbr_id AS BIGINT) AS nbr_id, CAST(dist AS DOUBLE) AS dist
       |  FROM p
       |)
       |SELECT vec_id, rnk, nbr_id, dist FROM r WHERE rnk <= $k
       |ORDER BY vec_id, rnk""".stripMargin

  /** Q9 `closestpair` (/root/reference/src/closestpair.jl:17-78): the
    * globally closest distinct pair; partial minima per partition +
    * final reduce ≡ the reference's per-thread best + reduction.
    * O(n²) gold path ([[guardExact]]-capped); the bucketed scale
    * variant is [[AnnOps.closestPairLsh]] — gate it against this one
    * on samples.
    */
  def closestPair(spark: SparkSession, sfDir: String): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id").cast("long").as("i"), col("b_id").cast("long").as("j"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
      .orderBy(col("dist").asc, col("i").asc, col("j").asc)
      .limit(1)
  }

  val closestPairOracleSql: String =
    """SELECT CAST(a.vec_id AS BIGINT) AS i, CAST(b.vec_id AS BIGINT) AS j,
      |       CAST(round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
      |                                         CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS DOUBLE) AS dist
      |FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
      |ORDER BY dist ASC, i ASC, j ASC LIMIT 1""".stripMargin

  /** Q10 `neardup`-family TRANSITIVE-CHAIN variant: every vector is
    * covered by the EARLIEST (smallest id) vector within ε among all
    * ids ≤ its own. This is deliberately NOT the reference's sequential
    * acceptance (/root/reference/src/neardup.jl:40-118), which only
    * lets previously-ACCEPTED centers cover later elements — in a chain
    * d(0,1)≤ε, d(1,2)≤ε, d(0,2)>ε the reference makes 2 a new center
    * while this maps 2→1. The reference-faithful form is
    * [[NearDupSeq.nearDupSeq]] (q11); this order-free variant exists
    * because it is one shuffle-free relational plan (and hence
    * DuckDB-oracled), at the cost of the reference's
    * sort(map)==sort(unique(nn)) invariant, which holds only for the
    * sequential form. Guaranteed here: all dist ≤ ε; nn ≤ vec_id;
    * nn(nn) may itself be covered (chains are not collapsed).
    * O(n²) gold path ([[guardExact]]-capped); the bucketed scale
    * variant is [[AnnOps.nearDupLsh]].
    */
  def nearDup(spark: SparkSession, sfDir: String, eps: Double = 0.65): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    val within = a.crossJoin(b)
      .select(col("a_id").as("vec_id"), col("b_id").as("cand"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
      .filter(col("dist") <= eps && col("cand") <= col("vec_id"))
    // earliest cover per vector via min_by (partial-aggregating — no
    // per-group sort of the pair space like the window-rank-1 form);
    // cand is unique within a group, so the pick is deterministic
    within.groupBy(col("vec_id"))
      .agg(min_by(struct(col("cand"), col("dist")), col("cand")).as("m"))
      .select(col("vec_id").cast("long"), col("m.cand").cast("long").as("nn"),
        col("m.dist").cast("double").as("dist"))
      .orderBy("vec_id")
  }

  def nearDupOracleSql(eps: Double = 0.65): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS cand,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS dist
       |  FROM embeddings a, embeddings b
       |  WHERE b.vec_id <= a.vec_id
       |), f AS (
       |  SELECT vec_id, cand, dist,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cand ASC) AS rn
       |  FROM p WHERE dist <= $eps
       |)
       |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cand AS BIGINT) AS nn,
       |       CAST(dist AS DOUBLE) AS dist
       |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Q14 `distsample` (/root/reference/src/distsample.jl:17-58):
    * quantiles of the pairwise distance distribution over a
    * DETERMINISTIC pair sample ((i·31+j) mod 97 == 0, i<j — both
    * engines enumerate the identical pairs; the reference samples
    * randomly, we pin the sample for cross-engine identity).
    */
  def distSample(spark: SparkSession, sfDir: String): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    val sample = a.crossJoin(b)
      .filter(col("a_id") < col("b_id") &&
        pmod(col("a_id") * 31 + col("b_id"), lit(97)) === 0)
      .select(distCol(col("a_emb"), col("b_emb")).as("dist"))
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    sample.agg(percentile(col("dist"), lit(qs.toArray)).as("q"))
      .select(posexplode(col("q")))
      .select(col("pos").cast("int").as("quantile_idx"),
        (round(col("col"), 4) + lit(0.0)).cast("double").as("dist"))
      .orderBy("quantile_idx")
  }

  val distSampleOracleSql: String =
    """WITH s AS (
      |  SELECT round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
      |                                      CAST(b.embedding AS DOUBLE[])), 4) + 0.0 AS dist
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < b.vec_id AND (a.vec_id * 31 + b.vec_id) % 97 = 0
      |), q AS (
      |  SELECT CAST(quantile_cont(dist, [0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE[]) AS qs FROM s
      |)
      |SELECT CAST(i - 1 AS INTEGER) AS quantile_idx,
      |       CAST(round(qs[i], 4) + 0.0 AS DOUBLE) AS dist
      |FROM q, range(1, 6) r(i) ORDER BY quantile_idx""".stripMargin

  /** Projected-space dimensionality of the rerank first pass. */
  val ProjDim = 16
  /** Embedding dimensionality of the `embeddings` fixture. */
  val EmbDim = 64

  /** Squared L2 between two equal-length double arrays, accumulated
    * left-to-right (matches DuckDB `list_sum` over a comprehension).
    */
  private def sqL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Q13 `rerank!` (/root/reference/src/rerank.jl:5-36): two-phase
    * retrieval — the cheap first pass is a TRUE Gaussian random
    * projection ([[graft.functions.RandomProj]], the reference's
    * /root/reference/src/special/proj.jl:13-70) to [[ProjDim]] dims,
    * applied MAP-SIDE before the pair join (n·p·d work, never n²·d);
    * pairs rank by squared L2 in projected space keeping `k1`, exact
    * NormCosine rescores and keeps `k`. First-pass ties broken by id;
    * the final ordering is by the EXACT metric.
    */
  def rerank(spark: SparkSession, sfDir: String, k1: Int = 20, k: Int = 5): DataFrame = {
    val a = emb(spark, sfDir, "a")
      .withColumn("a_p", graft.functions.RandomProj.projCol(col("a_emb"), ProjDim, EmbDim))
    val b = emb(spark, sfDir, "b")
      .withColumn("b_p", graft.functions.RandomProj.projCol(col("b_emb"), ProjDim, EmbDim))
    // the cheap pair space carries ONLY the 16-dim projections; the
    // 64-dim embeddings rejoin on the surviving n·k1 candidate rows
    val cheapPairs = a.select(col("a_id"), col("a_p"))
      .crossJoin(b.select(col("b_id"), col("b_p")))
      .select(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
        round(sqL2(col("a_p"), col("b_p")), 4).as("dist"))
    val cands = topKByDist(cheapPairs, k1, "vec_id", "nbr_id")
      .select("vec_id", "nbr_id")
    val exact = cands
      .join(emb(spark, sfDir, "a").select(col("a_id").as("vec_id"), col("a_emb")), "vec_id")
      .join(emb(spark, sfDir, "b").select(col("b_id").as("nbr_id"), col("b_emb")), "nbr_id")
      .select(col("vec_id"), col("nbr_id"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
    topKByDist(exact, k, "vec_id", "nbr_id").orderBy("vec_id", "rnk")
  }

  /** DuckDB CTE prefix shared by the rerank-shaped oracles: per-vector
    * projection (same literal matrix as the Spark plan) + all pair
    * distances in cheap (projected sq-L2) and exact (NormCosine) space.
    */
  private[operators] def rerankPairsCteSql: String = {
    val proj = graft.functions.RandomProj.duckProjSql("emb", ProjDim, EmbDim)
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), pr AS (
       |  SELECT vec_id, emb, $proj AS p FROM e
       |), cheap AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(list_sum([(a.p[k] - b.p[k]) * (a.p[k] - b.p[k])
       |                         FOR k IN range(1, ${ProjDim + 1})]), 4) AS cheap_dist,
       |         round(1.0 - list_dot_product(a.emb, b.emb), 4) + 0.0 AS dist
       |  FROM pr a, pr b
       |)""".stripMargin
  }

  def rerankOracleSql(k1: Int = 20, k: Int = 5): String =
    s"""WITH $rerankPairsCteSql, c1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cheap_dist ASC, nbr_id ASC) AS rn
       |  FROM cheap
       |), c2 AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC) AS INTEGER) AS rnk,
       |         CAST(nbr_id AS BIGINT) AS nbr_id, CAST(dist AS DOUBLE) AS dist
       |  FROM c1 WHERE rn <= $k1
       |)
       |SELECT vec_id, rnk, nbr_id, dist FROM c2 WHERE rnk <= $k
       |ORDER BY vec_id, rnk""".stripMargin

  /** The projection itself as a registry query (one row per (vector,
    * output dim)) — pins the Gaussian matrix + dot accumulation against
    * the DuckDB oracle, so rerank's first pass is oracle-checked in
    * isolation too.
    */
  def randomProj(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(graft.functions.RandomProj.projCol(col("embedding"), ProjDim, EmbDim)))
      .select(col("vec_id").cast("long"), col("pos").cast("int").as("dim"),
        (round(col("col"), 4) + lit(0.0)).cast("double").as("val"))
      .orderBy("vec_id", "dim")

  def randomProjOracleSql: String =
    projOracleSql(graft.functions.RandomProj.duckProjSql("emb", ProjDim, EmbDim))

  /** QR-orthonormal projection variant (reference `qr` constructor,
    * /root/reference/src/special/proj.jl:23-32) — same registry shape
    * as [[randomProj]], matrix from deterministic MGS.
    */
  def randomProjQR(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(graft.functions.RandomProj.projQRCol(col("embedding"), ProjDim, EmbDim)))
      .select(col("vec_id").cast("long"), col("pos").cast("int").as("dim"),
        (round(col("col"), 4) + lit(0.0)).cast("double").as("val"))
      .orderBy("vec_id", "dim")

  def randomProjQROracleSql: String =
    projOracleSql(graft.functions.RandomProj.duckProjQRSql("emb", ProjDim, EmbDim))

  private def projOracleSql(proj: String): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), pr AS (
       |  SELECT vec_id, $proj AS p FROM e
       |)
       |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(k - 1 AS INTEGER) AS dim,
       |       CAST(round(p[k], 4) + 0.0 AS DOUBLE) AS val
       |FROM pr, range(1, ${ProjDim + 1}) r(k) ORDER BY vec_id, dim""".stripMargin
}
