package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequential-by-nature reference operators: farthest-first traversal
  * and half-space proximal filtering. Both are data-dependent loops,
  * but both are BOUNDED (k center picks; ≤ k1 candidates per center),
  * so each also carries a DuckDB oracle — fft as a k-step unrolled CTE
  * chain, hsp as a recursive CTE over a precomputed domination list —
  * on top of the reference-style property suites
  * (/root/reference/test/testfft.jl:5-13,
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

  /** Scale-path center training for [[AnnOps.annIvf]]: [[fft]] is
    * inherently k sequential driver-coordinated Spark jobs (the
    * reference's loop, /root/reference/src/fft.jl:21-64), so at derived
    * nlist=4096 full-corpus training is the dominant ANN build cost —
    * up to 4096 sequential jobs over 10^9 rows. Here the SAME
    * farthest-first selection runs as ONE Spark job (collect a
    * deterministic bounded sample — vec_id stride, no RNG state) plus a
    * driver-local O(k·|sample|·d) loop with a running nearest-center
    * array: zero per-center jobs. The reference itself trains/tunes on
    * bounded samples (64 probe queries, /root/reference/src/opt.jl:148).
    * Cell ASSIGNMENT stays distributed (broadcast join in annIvf) —
    * only training is sampled, so candidate work per query is unchanged.
    *
    * When the sample covers the whole corpus (n ≤ sampleFactor·k) the
    * selection is IDENTICAL to [[fft]] by construction: same seed
    * (smallest id — vec_id 0 on the fixtures), the same rounded
    * distance ([[VectorOps.jvmDist]] ≡ distCol bit-for-bit), and the
    * same farthest/ties-to-smallest-id rule.
    */
  def fftSampled(spark: SparkSession, sfDir: String, k: Int,
      sampleFactor: Int = 16): Array[Long] = {
    import spark.implicits._
    val emb = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val n = VectorOps.embCount(spark, sfDir)
    val target = math.max(64L, sampleFactor.toLong * k)
    val stride = math.max(1L, n / target)
    // hash-stride, not id-stride: `vec_id % stride` assumes dense
    // contiguous ids — an all-odd or range-offset id space would yield
    // a skewed (or EMPTY) sample. Hashing first makes the ~n/stride
    // pick deterministic and id-layout-blind.
    val sample = emb.filter(pmod(xxhash64(col("vec_id")), lit(stride)) === 0)
      .as[(Long, Seq[Double])].collect()
      .map { case (id, e) => (id, e.toArray) }
      .sortBy(_._1)
    // short-draw edge (an unlucky hash draw on a corpus barely above
    // target): a nonempty sample SMALLER than k would silently train
    // fewer than k centers while the caller's metadata still records k
    // (nlist) — fall back to the deterministic id-ordered prefix
    // whenever the draw cannot seat k centers, not only when empty
    val pts = if (sample.nonEmpty && sample.length >= math.min(k.toLong, n)) sample
      else emb.orderBy("vec_id").limit(target.toInt)
        .as[(Long, Seq[Double])].collect()
        .map { case (id, e) => (id, e.toArray) }
    fftLocal(pts, k)
  }

  /** Driver-local farthest-first over a materialized sample — the exact
    * [[fft]] recurrence (seed = first point, then repeatedly the point
    * farthest from its nearest chosen center, ties → smallest id) with
    * a running nearest-distance array, O(k·n·d) total.
    */
  private[operators] def fftLocal(pts: Array[(Long, Array[Double])], k: Int): Array[Long] = {
    require(pts.nonEmpty, "fftLocal: empty training sample")
    val n = pts.length
    val kk = math.min(k, n)
    val centers = new Array[Long](kk)
    centers(0) = pts(0)._1
    val nn = Array.fill(n)(Double.PositiveInfinity)
    var cvec = pts(0)._2
    var ci = 1
    while (ci < kk) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        val d = VectorOps.jvmDist(pts(i)._2, cvec)
        if (d < nn(i)) nn(i) = d
        // strict > + ascending-id scan ⇒ ties keep the smallest id,
        // the same rule as fft's (nn_dist DESC, vec_id ASC) head()
        if (nn(i) > bestD) { bestD = nn(i); best = i }
        i += 1
      }
      centers(ci) = pts(best)._1
      cvec = pts(best)._2
      ci += 1
    }
    centers
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
      .filter(col("vec_id").isin(cents.toIndexedSeq: _*))
      .select(col("vec_id").as("center_id"), col("embedding").cast("array<double>").as("cemb"))
    // nearest-center argmin via min_by on (dist, center_id) — partial
    // aggregation instead of a per-vector sort over all k centers
    embA.crossJoin(broadcast(cembs))
      .select(col("vec_id"), col("center_id"),
        VectorOps.distCol(col("emb"), col("cemb")).as("dist"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("center_id"), col("dist")),
        struct(col("dist"), col("center_id"))).as("m"))
      .select(col("vec_id").cast("long"), col("m.center_id").cast("long").as("nn"),
        col("m.dist").cast("double").as("dist"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[fft]]: the k−1 selection steps unrolled as a
    * CTE chain — d_i carries every point's distance to its nearest
    * center among the first i picks, c_{i+1} is the argmax (ties →
    * smallest id), exactly the driver loop's jobs.
    */
  def fftOracleSql(k: Int = 8): String = {
    val sb = new StringBuilder
    sb.append("WITH ").append(fftChainCte(k))
    sb.append("\nSELECT CAST(1 AS INTEGER) AS rnk, CAST(0 AS BIGINT) AS center_id, CAST(0.0 AS DOUBLE) AS sel_dist")
    for (i <- 2 to k)
      sb.append(s"\nUNION ALL SELECT CAST($i AS INTEGER), CAST(vec_id AS BIGINT), CAST(nd AS DOUBLE) FROM c$i")
    sb.append("\nORDER BY rnk")
    sb.toString
  }

  /** The farthest-first selection as a k-step unrolled CTE chain —
    * shared by [[fftOracleSql]] (q07) and the IVF pipeline oracle
    * ([[AnnOps.ivfOracleSql]], q22). Defines `e(vec_id, emb)`,
    * `d1..d(k-1)` (running nearest-center distance) and `c2..ck` (the
    * i-th selected center); center 1 is vec_id 0 (the smallest fixture
    * id — fftSampled's sorted-sample seed ≡ fft's pinned 0L). Rounded
    * distances + the (nd DESC, vec_id ASC) pick replay the driver
    * loop's rule exactly.
    */
  private[operators] def fftChainCte(k: Int): String = {
    // every chain CTE MATERIALIZED: c_i is referenced by d_i AND the
    // final consumer, d_i by c_(i+1) AND d_(i+1) — inlined, each
    // reference re-evaluates the whole prefix, i.e. 2^k evaluations of
    // d1 (measured: k=8 tolerable, k=16 = minutes + fd exhaustion from
    // re-opened parquet scans; materialized, k=16 runs in ~1 s)
    val sb = new StringBuilder
    sb.append(
      """e AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |), d1 AS MATERIALIZED (
        |  SELECT e.vec_id, round(1.0 - list_dot_product(e.emb, c.emb), 4) + 0.0 AS nd
        |  FROM e, (SELECT emb FROM e WHERE vec_id = 0) c
        |)""".stripMargin)
    for (i <- 2 to k) {
      sb.append(s""", c$i AS MATERIALIZED (
        |  SELECT vec_id, nd FROM d${i - 1} ORDER BY nd DESC, vec_id ASC LIMIT 1
        |)""".stripMargin)
      if (i < k) sb.append(s""", d$i AS MATERIALIZED (
        |  SELECT d.vec_id,
        |         least(d.nd, round(1.0 - list_dot_product(e.emb, c.emb), 4) + 0.0) AS nd
        |  FROM d${i - 1} d JOIN e USING (vec_id),
        |       (SELECT e.emb FROM e JOIN c$i ON e.vec_id = c$i.vec_id) c
        |)""".stripMargin)
    }
    sb.toString
  }

  /** DuckDB oracle for [[hsp]]: per center, candidates in (dist, id)
    * order; `dom(ci)` = the candidate set that would exclude ci if
    * already kept (d(ci, cj) < d(center, ci), strict — the half-space
    * test); the recursive CTE then replays the sequential scan carrying
    * the kept list.
    */
  def hspOracleSql(k1: Int = 20): String = hspOracleSqlImpl(k1, distal = false)

  /** [[hspOracleSql]] with the distal scan order: candidates are still
    * the k1 NEAREST, but the sequential replay walks them farthest-first
    * ((dist DESC, id DESC) — the reference's reverse loop).
    */
  def hspDistalOracleSql(k1: Int = 20): String = hspOracleSqlImpl(k1, distal = true)

  private def hspOracleSqlImpl(k1: Int, distal: Boolean): String = {
    val dir = if (distal) "DESC" else "ASC"
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |), nearest AS (
       |  SELECT * FROM (
       |    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |           round(1.0 - list_dot_product(a.emb, b.emb), 4) + 0.0 AS dist,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY round(1.0 - list_dot_product(a.emb, b.emb), 4) + 0.0 ASC,
       |                      b.vec_id ASC) AS rn
       |    FROM e a JOIN e b ON a.vec_id <> b.vec_id
       |  ) WHERE rn <= $k1
       |), cand AS (
       |  SELECT a_id, b_id, dist,
       |         row_number() OVER (PARTITION BY a_id
       |           ORDER BY dist $dir, b_id $dir) AS rn
       |  FROM nearest
       |), cd AS (
       |  SELECT x.a_id, x.b_id AS ci, y.b_id AS cj,
       |         round(1.0 - list_dot_product(ex.emb, ey.emb), 4) + 0.0 AS dxy
       |  FROM cand x JOIN cand y ON x.a_id = y.a_id AND x.b_id <> y.b_id
       |  JOIN e ex ON ex.vec_id = x.b_id JOIN e ey ON ey.vec_id = y.b_id
       |), dom AS (
       |  SELECT c.a_id, c.b_id AS ci, list(cd.cj) AS doms
       |  FROM cand c JOIN cd ON cd.a_id = c.a_id AND cd.ci = c.b_id
       |  WHERE cd.dxy < c.dist
       |  GROUP BY c.a_id, c.b_id
       |), step AS (
       |  SELECT a_id, 0 AS rn, CAST([] AS BIGINT[]) AS kept
       |  FROM (SELECT DISTINCT a_id FROM cand)
       |  UNION ALL
       |  SELECT s.a_id, s.rn + 1,
       |         CASE WHEN list_has_any(s.kept, COALESCE(d.doms, CAST([] AS BIGINT[])))
       |              THEN s.kept ELSE list_append(s.kept, c.b_id) END
       |  FROM step s
       |  JOIN cand c ON c.a_id = s.a_id AND c.rn = s.rn + 1
       |  LEFT JOIN dom d ON d.a_id = s.a_id AND d.ci = c.b_id
       |), fin AS (
       |  SELECT a_id, kept FROM step s
       |  WHERE rn = (SELECT max(rn) FROM step s2 WHERE s2.a_id = s.a_id)
       |), outp AS (
       |  SELECT a_id, CAST(generate_subscripts(kept, 1) AS INTEGER) AS rnk,
       |         unnest(kept) AS nbr_id
       |  FROM fin
       |)
       |SELECT CAST(o.a_id AS BIGINT) AS vec_id, o.rnk,
       |       CAST(o.nbr_id AS BIGINT) AS nbr_id, CAST(c.dist AS DOUBLE) AS dist
       |FROM outp o JOIN cand c ON c.a_id = o.a_id AND c.b_id = o.nbr_id
       |ORDER BY vec_id, rnk""".stripMargin
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
  def hsp(spark: SparkSession, sfDir: String, k1: Int = 20): DataFrame =
    hspImpl(spark, sfDir, k1, distal = false)

  /** Q12 distal variant (`hsp_distal_neighborhood_filter!`,
    * /root/reference/src/hsp.jl:83-95): identical half-space test, but
    * the candidate scan starts from the FARTHEST candidate and walks
    * inward (`for i in length(neighborhood)-1:-1:1` after seeding with
    * `last(neighborhood)`) — i.e. (dist DESC, id DESC) order; the seed
    * is the unconditional first push, exactly like the proximal form's
    * nearest-first seed.
    */
  def hspDistal(spark: SparkSession, sfDir: String, k1: Int = 20): DataFrame =
    hspImpl(spark, sfDir, k1, distal = true)

  private def hspImpl(spark: SparkSession, sfDir: String, k1: Int,
      distal: Boolean): DataFrame = {
    import spark.implicits._
    VectorOps.guardExact(spark, VectorOps.embCount(spark, sfDir))
    val a = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("a_id"), col("embedding").cast("array<double>").as("a_emb"))
    val b = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("b_id"), col("embedding").cast("array<double>").as("b_emb"))
    // top-k1 ids via the heap aggregator (no array payload in the pair
    // space), then rejoin the candidate embeddings on n·k1 rows
    val pairs = a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorOps.distCol(col("a_emb"), col("b_emb")).as("dist"))
    val cands = VectorOps.topKByDist(pairs, k1, "a_id", "b_id")
      .join(b.select(col("b_id"), col("b_emb")), "b_id")
      .select(col("a_id"), col("b_id"), col("b_emb"), col("dist"), col("rnk"))
      .as[(Long, Long, Seq[Double], Double, Int)]
    cands.groupByKey(_._1).flatMapGroups { (center, it) =>
      // proximal: (dist ASC, id ASC); distal: (dist DESC, id DESC)
      val asc = it.toSeq.sortBy(c => (c._4, c._2))
      val sorted = if (distal) asc.reverse else asc
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
