package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** NormCosine distance, rounded at the output grid. */
  def distCol(a: Column, b: Column): Column =
    round(lit(1.0) - dotCol(a, b), 4)

  private def emb(spark: SparkSession, sfDir: String, alias: String): DataFrame =
    Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as(s"${alias}_id"), col("embedding").as(s"${alias}_emb"))

  /** Q8 `allknn` (/root/reference/src/allknn.jl:27-68): k-NN of every
    * indexed element; self-reference preserved (v0.9 reference
    * behavior, /root/reference/README.md:100) — rank 1 is the vector
    * itself at dist 0.
    */
  def allKnn(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    val pairs = a.crossJoin(b)
      .select(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("nbr_id").asc)
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id").cast("long"), col("rnk").cast("int"),
        col("nbr_id").cast("long"), col("dist").cast("double"))
      .orderBy("vec_id", "rnk")
  }

  def allKnnOracleSql(k: Int = 5): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) AS dist
       |  FROM embeddings a, embeddings b
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
      |                                         CAST(b.embedding AS DOUBLE[])), 4) AS DOUBLE) AS dist
      |FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
      |ORDER BY dist ASC, i ASC, j ASC LIMIT 1""".stripMargin

  /** Q10 `neardup` (/root/reference/src/neardup.jl:40-118) in its
    * order-free formulation: every vector is covered by the EARLIEST
    * (smallest id) vector within ε — the fixed point of the
    * reference's block-sequential acceptance when blocks are singleton
    * and scanned in id order. Invariants preserved verbatim from
    * /root/reference/test/testneardup.jl:14-16: all dist ≤ ε;
    * sort(map) == sort(unique(nn)).
    */
  def nearDup(spark: SparkSession, sfDir: String, eps: Double = 0.65): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    val within = a.crossJoin(b)
      .select(col("a_id").as("vec_id"), col("b_id").as("cand"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
      .filter(col("dist") <= eps && col("cand") <= col("vec_id"))
    val w = Window.partitionBy("vec_id").orderBy(col("cand").asc)
    within.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id").cast("long"), col("cand").cast("long").as("nn"),
        col("dist").cast("double"))
      .orderBy("vec_id")
  }

  def nearDupOracleSql(eps: Double = 0.65): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS cand,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) AS dist
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
        round(col("col"), 4).cast("double").as("dist"))
      .orderBy("quantile_idx")
  }

  val distSampleOracleSql: String =
    """WITH s AS (
      |  SELECT round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
      |                                      CAST(b.embedding AS DOUBLE[])), 4) AS dist
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < b.vec_id AND (a.vec_id * 31 + b.vec_id) % 97 = 0
      |), q AS (
      |  SELECT CAST(quantile_cont(dist, [0.1, 0.25, 0.5, 0.75, 0.9]) AS DOUBLE[]) AS qs FROM s
      |)
      |SELECT CAST(i - 1 AS INTEGER) AS quantile_idx,
      |       CAST(round(qs[i], 4) AS DOUBLE) AS dist
      |FROM q, range(1, 6) r(i) ORDER BY quantile_idx""".stripMargin

  /** Q13 `rerank!` (/root/reference/src/rerank.jl:5-36): two-phase
    * retrieval — cheap first pass (dot over the first 16 dims, a
    * projection proxy) keeps `k1` candidates, exact NormCosine rescores
    * and keeps `k`. First-pass ties broken by id; the final ordering is
    * by the EXACT metric.
    */
  def rerank(spark: SparkSession, sfDir: String, k1: Int = 20, k: Int = 5): DataFrame = {
    val a = emb(spark, sfDir, "a")
    val b = emb(spark, sfDir, "b")
    val cheap = a.crossJoin(b)
      .select(col("a_id").as("vec_id"), col("b_id").as("nbr_id"),
        col("a_emb"), col("b_emb"),
        round(lit(1.0) - dotCol(slice(col("a_emb"), 1, 16), slice(col("b_emb"), 1, 16)), 4)
          .as("cheap_dist"))
    val w1 = Window.partitionBy("vec_id").orderBy(col("cheap_dist").asc, col("nbr_id").asc)
    val cands = cheap.withColumn("rn", row_number().over(w1)).filter(col("rn") <= k1)
    val w2 = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("nbr_id").asc)
    cands
      .select(col("vec_id"), col("nbr_id"),
        distCol(col("a_emb"), col("b_emb")).as("dist"))
      .withColumn("rnk", row_number().over(w2))
      .filter(col("rnk") <= k)
      .select(col("vec_id").cast("long"), col("rnk").cast("int"),
        col("nbr_id").cast("long"), col("dist").cast("double"))
      .orderBy("vec_id", "rnk")
  }

  def rerankOracleSql(k1: Int = 20, k: Int = 5): String =
    s"""WITH cheap AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(1.0 - list_dot_product(CAST(a.embedding[1:16] AS DOUBLE[]),
       |                                      CAST(b.embedding[1:16] AS DOUBLE[])), 4) AS cheap_dist,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) AS dist
       |  FROM embeddings a, embeddings b
       |), c1 AS (
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
}
