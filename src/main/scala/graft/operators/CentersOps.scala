package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-by-nature reference operators: farthest-first traversal
  * and half-space proximal filtering. Neither is one SQL query (both
  * are data-dependent loops), so they ship with ScalaTest invariant
  * suites instead of DuckDB oracles — mirroring how the reference
  * itself tests them by property (/root/reference/test/testfft.jl:5-13,
  * /root/reference/test/testhsp.jl:5-14).
  */
object CentersOps {

  /** Q11 `fft` (/root/reference/src/fft.jl:21-64): k-center selection —
    * start from vec_id 0, repeatedly add the point farthest from its
    * nearest chosen center (ties → smallest id). k driver-coordinated
    * Spark jobs over a cached Dataset; per-iteration state is one
    * 64-float center vector broadcast in the literal plan.
    *
    * Output: (rnk, center_id, sel_dist) where sel_dist is the distance
    * that made the point the farthest (0 for the seed), rounded.
    */
  def fft(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val embA = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .cache()
    var centers = List((1, 0L, 0.0)) // (rank, id, dist-at-selection)
    // nn(vec_id, nn_dist): running distance to nearest chosen center
    var nn = embA.select(col("vec_id"),
      VectorOps.distCol(col("emb"),
        centerVec(embA, 0L)).as("nn_dist"))
    var i = 2
    while (i <= k) {
      val far = nn.orderBy(col("nn_dist").desc, col("vec_id").asc).head()
      val cid = far.getLong(0)
      val cdist = far.getDouble(1)
      centers ::= ((i, cid, cdist))
      val cvec = centerVec(embA, cid)
      nn = nn.join(embA, "vec_id")
        .select(col("vec_id"),
          least(col("nn_dist"), VectorOps.distCol(col("emb"), cvec)).as("nn_dist"))
        .localCheckpoint() // truncate the iterative lineage
      i += 1
    }
    embA.unpersist()
    centers.reverse.toDF("rnk", "center_id", "sel_dist")
      .select(col("rnk").cast("int"), col("center_id").cast("long"),
        round(col("sel_dist"), 4).cast("double").as("sel_dist"))
      .orderBy("rnk")
  }

  /** Final center assignment after [[fft]]: every point's nearest
    * center (nn) and distance — the reference's `(centers, nn, dists,
    * dmax)` return shape.
    */
  def fftAssign(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    val cents = fft(spark, sfDir, k)
      .select(col("center_id")).collect().map(_.getLong(0))
    val embA = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cembs = Corpus.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(cents: _*))
      .select(col("vec_id").as("center_id"), col("embedding").cast("array<double>").as("cemb"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("center_id").asc)
    embA.crossJoin(broadcast(cembs))
      .select(col("vec_id"), col("center_id"),
        VectorOps.distCol(col("emb"), col("cemb")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id").cast("long"), col("center_id").cast("long").as("nn"),
        col("dist").cast("double"))
      .orderBy("vec_id")
  }

  private def centerVec(emb: DataFrame, id: Long): org.apache.spark.sql.Column = {
    val v = emb.filter(col("vec_id") === id).head().getSeq[Double](1)
    array(v.map(lit): _*)
  }

  /** Q12 `hsp_queries` proximal filter
    * (/root/reference/src/hsp.jl:42-81): for each center, scan its k1
    * nearest candidates in distance order and keep candidate c only if
    * no already-kept s satisfies d(c,s) < d(c,center) — the half-space
    * test (/root/reference/src/hsp.jl:9-34). Sequential over ≤k1 items
    * per row → mapGroups, never a shuffle per step (SURVEY.md Q12:
    * "tiny k ⇒ driver/UDF, not a shuffle").
    */
  def hsp(spark: SparkSession, sfDir: String, k1: Int = 20): DataFrame = {
    import spark.implicits._
    val a = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("a_id"), col("embedding").cast("array<double>").as("a_emb"))
    val b = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("b_id"), col("embedding").cast("array<double>").as("b_emb"))
    val w = Window.partitionBy("a_id").orderBy(col("dist").asc, col("b_id").asc)
    val cands = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("b_emb"),
        VectorOps.distCol(col("a_emb"), col("b_emb")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k1)
      .select(col("a_id"), col("b_id"), col("b_emb"), col("dist"), col("rn"))
      .as[(Long, Long, Seq[Double], Double, Int)]
    cands.groupByKey(_._1).flatMapGroups { (center, it) =>
      val sorted = it.toSeq.sortBy(c => (c._4, c._2)) // (dist, id) order
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)]
      sorted.foreach { case (_, cid, cemb, cdist, _) =>
        val ce = cemb.toArray
        val dominated = kept.exists { case (_, semb, _) =>
          var dot = 0.0
          var i = 0
          while (i < ce.length) { dot += ce(i) * semb(i); i += 1 }
          val dCS = graft.functions.BM25.roundScore(1.0 - dot)
          dCS < cdist
        }
        if (!dominated) kept += ((cid, ce, cdist))
      }
      kept.zipWithIndex.map { case ((cid, _, d), i) => (center, i + 1, cid, d) }.iterator
    }.toDF("vec_id", "rnk", "nbr_id", "dist")
      .select(col("vec_id").cast("long"), col("rnk").cast("int"),
        col("nbr_id").cast("long"), col("dist").cast("double"))
      .orderBy("vec_id", "rnk")
  }
}
