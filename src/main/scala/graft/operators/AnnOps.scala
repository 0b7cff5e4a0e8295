package graft.operators

import graft.analysis.TextHash
import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbor — the scale path that replaces the
  * O(n²) exact forms at 10^12 rows, playing the reference's
  * `SearchGraph` role (approximate index vs `ExhaustiveSearch` gold,
  * /root/reference/test/testsearchgraph.jl:44-71) with the same
  * quality gate: macrorecall vs the exact scorer ≥ 0.8
  * (/root/reference/test/testsearchgraph.jl:68).
  *
  * Two buckets-then-verify schemes:
  *  - [[annLsh]]: random-hyperplane signs (deterministic planes from
  *    splitmix64 — no RNG state), multi-probe on Hamming-1 codes;
  *  - [[annIvf]]: IVF over farthest-first centers ([[CentersOps.fft]]),
  *    nprobe nearest cells per query.
  * Candidates get EXACT NormCosine rescoring; only the candidate set is
  * approximate. Both are bucket equi-joins — the pair space never
  * materializes.
  */
object AnnOps {

  /** Deterministic hyperplane component in [-1, 1) for (table, bit). */
  private def plane(table: Int, j: Int, i: Int): Double = {
    val h = TextHash.splitmix64(table.toLong * 1073741824L + j.toLong * 1048576L + i)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def embDs(spark: SparkSession, sfDir: String) =
    Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Sign-LSH bucket of a vector in one table (table id folded in). */
  private[operators] def lshCode(emb: Seq[Double], table: Int, nbits: Int): Long = {
    var code = 0L
    var j = 0
    while (j < nbits) {
      var dot = 0.0
      var i = 0
      while (i < emb.length) { dot += emb(i) * plane(table, j, i); i += 1 }
      if (dot > 0) code |= (1L << j)
      j += 1
    }
    (table.toLong << 32) | code
  }

  /** Multi-table sign LSH: L independent tables of nbits hyperplanes;
    * candidates = bucket collisions in ANY table (union), exact
    * rescoring after. Weak-neighbor corpora (like this fixture's
    * near-orthogonal clusters) need many shallow tables — the same
    * recall/cost dial the reference tunes via `optimize_index!`
    * (/root/reference/src/opt.jl:139-235; see [[tunedIvf]]).
    */
  def annLsh(spark: SparkSession, sfDir: String, k: Int = 5, nbits: Int = 4,
      tables: Int = 16): DataFrame = {
    import spark.implicits._
    val coded = embDs(spark, sfDir).as[(Long, Seq[Double])]
      .flatMap { case (id, e) =>
        (0 until tables).map(t => (id, lshCode(e, t, nbits), e))
      }.toDF("vec_id", "bucket", "emb")
    val probes = coded.select(col("vec_id").as("q_id"), col("bucket"),
      col("emb").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("nbr_id").asc)
    probes.join(coded.select(col("vec_id").as("nbr_id"), col("bucket"), col("emb")), "bucket")
      .select(col("q_id"), col("nbr_id"),
        VectorOps.distCol(col("q_emb"), col("emb")).as("dist"))
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id").cast("long").as("vec_id"), col("rnk").cast("int"),
        col("nbr_id").cast("long"), col("dist").cast("double"))
      .orderBy("vec_id", "rnk")
  }

  def annIvf(spark: SparkSession, sfDir: String, k: Int = 5, nlist: Int = 16,
      nprobe: Int = 8): DataFrame = {
    val cents = CentersOps.fft(spark, sfDir, nlist)
      .select("center_id").collect().map(_.getLong(0))
    val cembs = Corpus.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(cents: _*))
      .select(col("vec_id").as("cell"), col("embedding").cast("array<double>").as("cemb"))
    val emb = embDs(spark, sfDir)
    // assignment: nearest center per vector
    val wc = Window.partitionBy("vec_id").orderBy(col("cdist").asc, col("cell").asc)
    val assigned = emb.crossJoin(broadcast(cembs))
      .select(col("vec_id"), col("emb"), col("cell"),
        VectorOps.distCol(col("emb"), col("cemb")).as("cdist"))
      .withColumn("rn", row_number().over(wc))
    val data = assigned.filter(col("rn") === 1).select("vec_id", "emb", "cell")
    val queries = assigned.filter(col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("nbr_id").asc)
    queries.join(data.select(col("vec_id").as("nbr_id"), col("emb"), col("cell")), "cell")
      .select(col("q_id"), col("nbr_id"),
        VectorOps.distCol(col("q_emb"), col("emb")).as("dist"))
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id").cast("long").as("vec_id"), col("rnk").cast("int"),
        col("nbr_id").cast("long"), col("dist").cast("double"))
      .orderBy("vec_id", "rnk")
  }

  /** Q17 `optimize_index!` (/root/reference/src/opt.jl:139-235) with a
    * `MinRecall` goal (/root/reference/src/opt.jl:9-11): probe the
    * hyperparameter ladder (nprobe doubling) against the exhaustive
    * gold until macrorecall ≥ target, then answer with the cheapest
    * passing configuration. Returns (nprobe, recall, result rows).
    */
  def tunedIvf(spark: SparkSession, sfDir: String, k: Int = 5, nlist: Int = 16,
      target: Double = 0.9): (Int, Double, DataFrame) = {
    val gold = VectorOps.allKnn(spark, sfDir, k)
    var nprobe = 1
    while (nprobe < nlist) {
      val got = annIvf(spark, sfDir, k, nlist, nprobe)
      val r = macrorecall(gold, got, k)
      if (r >= target) return (nprobe, r, got)
      nprobe *= 2
    }
    val got = annIvf(spark, sfDir, k, nlist, nlist)
    (nlist, macrorecall(gold, got, k), got)
  }

  /** Q18 `macrorecall` (/root/reference/src/perf.jl:26-34): mean over
    * queries of |gold ∩ result| / k between two (vec_id, nbr_id)
    * result sets.
    */
  def macrorecall(gold: DataFrame, got: DataFrame, k: Int): Double = {
    val inter = gold.select("vec_id", "nbr_id")
      .intersect(got.select("vec_id", "nbr_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("hits"))
    val perQuery = gold.select("vec_id").distinct()
      .join(inter, Seq("vec_id"), "left")
      .select(coalesce(col("hits"), lit(0L)).as("hits"))
    perQuery.agg(avg(col("hits") / k.toDouble)).head().getDouble(0)
  }

  /** Registry form: recall of rerank (two-phase) vs exact allknn gold —
    * fully SQL-expressible on both sides, so it carries a DuckDB
    * oracle; the ANN specs reuse [[macrorecall]] against the same gold.
    */
  def recallReport(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val gold = VectorOps.allKnn(spark, sfDir, k)
    val rr = VectorOps.rerank(spark, sfDir, k1 = 20, k = k)
    val inter = gold.select("vec_id", "nbr_id")
      .intersect(rr.select("vec_id", "nbr_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("hits"))
    gold.select("vec_id").distinct()
      .join(inter, Seq("vec_id"), "left")
      .agg(round(avg(coalesce(col("hits"), lit(0L)) / k.toDouble), 4).as("macrorecall"))
      .select(col("macrorecall").cast("double"))
  }

  def recallReportOracleSql(k: Int = 5): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
       |         round(1.0 - list_dot_product(CAST(a.embedding AS DOUBLE[]),
       |                                      CAST(b.embedding AS DOUBLE[])), 4) AS dist,
       |         round(1.0 - list_dot_product(CAST(a.embedding[1:16] AS DOUBLE[]),
       |                                      CAST(b.embedding[1:16] AS DOUBLE[])), 4) AS cheap_dist
       |  FROM embeddings a, embeddings b
       |), gold AS (
       |  SELECT vec_id, nbr_id FROM (
       |    SELECT vec_id, nbr_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC) AS rnk
       |    FROM p) WHERE rnk <= $k
       |), c1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cheap_dist ASC, nbr_id ASC) AS rn
       |  FROM p
       |), rr AS (
       |  SELECT vec_id, nbr_id FROM (
       |    SELECT vec_id, nbr_id,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, nbr_id ASC) AS rnk
       |    FROM c1 WHERE rn <= 20) WHERE rnk <= $k
       |), hits AS (
       |  SELECT g.vec_id, count(*) AS h
       |  FROM gold g JOIN rr ON g.vec_id = rr.vec_id AND g.nbr_id = rr.nbr_id
       |  GROUP BY g.vec_id
       |)
       |SELECT CAST(round(avg(COALESCE(h.h, 0) / ${k.toDouble}), 4) AS DOUBLE) AS macrorecall
       |FROM (SELECT DISTINCT vec_id FROM gold) q LEFT JOIN hits h USING (vec_id)""".stripMargin
}
