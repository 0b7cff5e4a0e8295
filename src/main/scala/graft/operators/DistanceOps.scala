package graft.operators

import graft.analysis.Tokenizer
import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's scalar distance library (SURVEY.md §2.4,
  * /root/reference/src/dist/) as Spark column expressions, exercised
  * over a deterministic pair sample so every metric is oracle-checked:
  *  - Minkowski family L1/L2/L∞/L3 (/root/reference/src/dist/vecs.jl)
  *  - cosine/normcosine (/root/reference/src/dist/cos.jl)
  *  - set family Jaccard/Dice/intersection over token sets
  *    (/root/reference/src/dist/sets.jl:66-100)
  *  - string family Hamming-prefix + Levenshtein
  *    (/root/reference/src/dist/seqs.jl:44-119)
  * All built-ins / higher-order functions — no UDFs; the hot-path dot
  * is the codegen'd [[graft.functions.DotF64]] elsewhere.
  */
object DistanceOps {

  private def diffs(a: Column, b: Column): Column =
    zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => abs(x - y))

  def l1(a: Column, b: Column): Column =
    aggregate(diffs(a, b), lit(0.0), (acc, v) => acc + v)

  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v))

  def linf(a: Column, b: Column): Column =
    array_max(diffs(a, b))

  /** Generic Minkowski Lp (/root/reference/src/dist/vecs.jl:156-177). */
  def lp(a: Column, b: Column, p: Double): Column =
    pow(aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => pow(abs(x - y), p)), lit(0.0), (acc, v) => acc + v), 1.0 / p)

  def l3(a: Column, b: Column): Column = lp(a, b, 3.0)

  /** Angle distance = acos(cos) with the reference's domain clamp
    * (`fastacos`, /root/reference/src/dist/cos.jl:56-67); over unit
    * vectors Angle ≡ NormAngle.
    */
  def angle(a: Column, b: Column): Column =
    acos(greatest(lit(-1.0), least(lit(1.0), VectorOps.dotCol(a, b))))

  /** All metrics over the deterministic pair sample (i·31+j ≡ 0 mod 97,
    * i<j — the same sample rule as distsample).
    */
  def vectorDistances(spark: SparkSession, sfDir: String): DataFrame = {
    VectorOps.guardExact(spark, VectorOps.embCount(spark, sfDir))
    val a = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("i"), col("embedding").as("ea"))
    val b = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id").as("j"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("i") < col("j") && pmod(col("i") * 31 + col("j"), lit(97)) === 0)
      .select(col("i").cast("long"), col("j").cast("long"),
        round(l1(col("ea"), col("eb")), 4).cast("double").as("l1"),
        round(l2(col("ea"), col("eb")), 4).cast("double").as("l2"),
        round(linf(col("ea"), col("eb")), 4).cast("double").as("linf"),
        round(l3(col("ea"), col("eb")), 4).cast("double").as("l3"),
        round(lp(col("ea"), col("eb"), 4.0), 4).cast("double").as("l4"),
        (round(lit(1.0) - VectorOps.dotCol(col("ea"), col("eb")), 4) + lit(0.0))
          .cast("double").as("normcosine"),
        round(angle(col("ea"), col("eb")), 4).cast("double").as("angle"),
        // SimilarityFromDistance 1/(1+d) (/root/reference/src/dist/hacks.jl:27-31)
        round(lit(1.0) / (lit(1.0) + l2(col("ea"), col("eb"))), 4)
          .cast("double").as("sim_from_l2"))
      .orderBy("i", "j")
  }

  val vectorDistancesOracleSql: String =
    """WITH p AS (
      |  SELECT a.vec_id AS i, b.vec_id AS j,
      |         CAST(a.embedding AS DOUBLE[]) AS ea, CAST(b.embedding AS DOUBLE[]) AS eb
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < b.vec_id AND (a.vec_id * 31 + b.vec_id) % 97 = 0
      |)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |  CAST(round(list_sum([abs(ea[k] - eb[k]) FOR k IN range(1, len(ea) + 1)]), 4) AS DOUBLE) AS l1,
      |  CAST(round(sqrt(list_sum([(ea[k] - eb[k]) * (ea[k] - eb[k]) FOR k IN range(1, len(ea) + 1)])), 4) AS DOUBLE) AS l2,
      |  CAST(round(list_max([abs(ea[k] - eb[k]) FOR k IN range(1, len(ea) + 1)]), 4) AS DOUBLE) AS linf,
      |  CAST(round(pow(list_sum([pow(abs(ea[k] - eb[k]), 3.0) FOR k IN range(1, len(ea) + 1)]), 1.0/3.0), 4) AS DOUBLE) AS l3,
      |  CAST(round(pow(list_sum([pow(abs(ea[k] - eb[k]), 4.0) FOR k IN range(1, len(ea) + 1)]), 1.0/4.0), 4) AS DOUBLE) AS l4,
      |  CAST(round(1.0 - list_dot_product(ea, eb), 4) + 0.0 AS DOUBLE) AS normcosine,
      |  CAST(round(acos(greatest(-1.0, least(1.0, list_dot_product(ea, eb)))), 4) AS DOUBLE) AS angle,
      |  CAST(round(1.0 / (1.0 + sqrt(list_sum([(ea[k] - eb[k]) * (ea[k] - eb[k]) FOR k IN range(1, len(ea) + 1)]))), 4) AS DOUBLE) AS sim_from_l2
      |FROM p ORDER BY i, j""".stripMargin

  /** Set + string distances over a deterministic documents pair sample:
    * token-set Jaccard/Dice/intersection, Rogers–Tanimoto and CosineSet
    * (/root/reference/src/dist/sets.jl:102-168), Levenshtein, positional
    * Hamming and CommonPrefix (/root/reference/src/dist/seqs.jl:10-35)
    * over the first 24 chars.
    *
    * Hamming/CommonPrefix convention: positions beyond the SHORTER
    * prefix are ignored in BOTH engines (`least(len(pa), len(pb))`);
    * Spark's zip_with null-padding drops them, the oracle's range is
    * pinned to the common length — symmetric and engine-identical for
    * any text length.
    */
  /** Universe size σ of the set Rogers–Tanimoto: the reference takes it
    * as a constructor parameter (RogersTanimoto(σ),
    * /root/reference/src/dist/sets.jl:102); we pin a corpus-safe
    * constant ≥ any pair's union so ff = σ − |a∪b| stays non-negative.
    */
  val RtSigma = 4096

  def textDistances(spark: SparkSession, sfDir: String): DataFrame = {
    VectorOps.guardExact(spark, VectorOps.docCount(spark, sfDir))
    val t = Corpus.documents(spark, sfDir)
      .select(col("doc_id"), Tokenizer.tokensCol(col("text")).as("toks"),
        substring(col("text"), 1, 24).as("prefix"))
    val a = t.select(col("doc_id").as("i"), col("toks").as("ta"), col("prefix").as("pa"))
    val b = t.select(col("doc_id").as("j"), col("toks").as("tb"), col("prefix").as("pb"))
    val inter = size(array_intersect(array_distinct(col("ta")), array_distinct(col("tb"))))
    val na = size(array_distinct(col("ta")))
    val nb = size(array_distinct(col("tb")))
    // Rogers–Tanimoto over sets: tt=|∩|, tf+ft=|aΔb|, ff=σ−|a∪b|
    //   → 1 − (σ − na − nb + 2i) / (σ + na + nb − 2i)
    // the pinned universe must hold: |a∪b| > σ would make ff negative
    // and rt leave [0,1] IDENTICALLY in both engines (the oracle gate
    // would pass on invalid distances) — so violation fails loudly here
    val unionSize = na + nb - inter
    val rt0 = lit(1.0) - (lit(RtSigma) - na - nb + lit(2) * inter) /
      (lit(RtSigma) + na + nb - lit(2) * inter).cast("double")
    // NULL union (NULL text → NULL token array) is not a violation: it
    // must stay NULL like every other distance column, matching the
    // oracle's NULL arithmetic — only a GENUINE |a∪b| > σ fails loudly
    val rt = when(unionSize.isNull || unionSize <= lit(RtSigma), rt0)
      .otherwise(raise_error(concat(
        lit("RogersTanimoto universe violated: |a union b| = "),
        unionSize.cast("string"), lit(s" > sigma = $RtSigma"))))
    // CommonPrefix (/root/reference/src/dist/seqs.jl:10-35): matching
    // j-prefixes form exactly 1..cp, so counting them IS the prefix len
    val cp = expr("size(filter(sequence(1, least(length(pa), length(pb))), " +
      "j -> substring(pa, 1, j) = substring(pb, 1, j)))")
    a.crossJoin(b)
      .filter(col("i") < col("j") && pmod(col("i") * 17 + col("j"), lit(131)) === 0)
      .select(col("i").cast("long"), col("j").cast("long"),
        inter.cast("long").as("inter_size"),
        round(lit(1.0) - inter / (na + nb - inter), 4).cast("double").as("jaccard_dist"),
        round(lit(1.0) - lit(2.0) * inter / (na + nb), 4).cast("double").as("dice_dist"),
        round(lit(1.0) - inter / greatest(na, nb).cast("double"), 4)
          .cast("double").as("intersection_dist"),
        round(rt, 4).cast("double").as("rt_dist"),
        round(lit(1.0) - inter / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))), 4)
          .cast("double").as("cosineset_dist"),
        levenshtein(col("pa"), col("pb")).cast("long").as("lev_prefix"),
        size(filter(zip_with(split(col("pa"), ""), split(col("pb"), ""),
          (x, y) => x =!= y), v => v)).cast("long").as("hamming_prefix"),
        cp.cast("long").as("common_prefix"),
        round(lit(1.0) - cp / least(length(col("pa")), length(col("pb"))).cast("double"), 4)
          .cast("double").as("cp_dist"))
      .orderBy("i", "j")
  }

  val textDistancesOracleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |         list_distinct(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS toks,
      |         substr(text, 1, 24) AS prefix
      |  FROM documents
      |), p AS (
      |  SELECT a.doc_id AS i, b.doc_id AS j, a.toks AS ta, b.toks AS tb,
      |         a.prefix AS pa, b.prefix AS pb
      |  FROM t a, t b
      |  WHERE a.doc_id < b.doc_id AND (a.doc_id * 17 + b.doc_id) % 131 = 0
      |), m AS (
      |  SELECT i, j, len(list_intersect(ta, tb)) AS i2,
      |         len(ta) AS na, len(tb) AS nb, pa, pb,
      |         len([k FOR k IN range(1, least(len(pa), len(pb)) + 1)
      |              IF substr(pa, 1, k) = substr(pb, 1, k)]) AS cp
      |  FROM p
      |)
      |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |  CAST(i2 AS BIGINT) AS inter_size,
      |  CAST(round(1.0 - i2 / (na + nb - i2), 4) AS DOUBLE) AS jaccard_dist,
      |  CAST(round(1.0 - 2.0 * i2 / (na + nb), 4) AS DOUBLE) AS dice_dist,
      |  CAST(round(1.0 - i2 / CAST(greatest(na, nb) AS DOUBLE), 4) AS DOUBLE) AS intersection_dist,
      |  CAST(round(1.0 - ($RtSigma - na - nb + 2 * i2) /
      |       CAST($RtSigma + na + nb - 2 * i2 AS DOUBLE), 4) AS DOUBLE) AS rt_dist,
      |  CAST(round(1.0 - i2 / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 4) AS DOUBLE) AS cosineset_dist,
      |  CAST(levenshtein(pa, pb) AS BIGINT) AS lev_prefix,
      |  CAST(len([k FOR k IN range(1, least(len(pa), len(pb)) + 1) IF pa[k] <> pb[k]]) AS BIGINT) AS hamming_prefix,
      |  CAST(cp AS BIGINT) AS common_prefix,
      |  CAST(round(1.0 - cp / CAST(least(len(pa), len(pb)) AS DOUBLE), 4) AS DOUBLE) AS cp_dist
      |FROM m ORDER BY i, j""".stripMargin

  /** Point-cloud distances (/root/reference/src/dist/cloud.jl):
    * Hausdorff = max(max_u nnd(u,V), max_v nnd(v,U)), Chamfer =
    * Σ_u nnd(u,V)/|U| + Σ_v nnd(v,U)/|V|, nnd = nearest-neighbor L2.
    * Clouds = the embeddings grouped by label (bounded per label), so
    * the pair space is label², not vector². Cross-engine float
    * discipline: each cloud is materialized in vec_id order (Chamfer
    * sums doubles, and collect_list order is otherwise
    * nondeterministic); min/max are order-free; one round at the end.
    */
  /** All nearest-neighbor distances from each point of u into v —
    * plain JVM loops: the nested higher-order-function form
    * (transform ∘ transform ∘ aggregate) does not whole-stage-codegen
    * and interprets per element (measured 73 s for 45 cloud pairs of
    * ~200×64 vectors; this kernel does the same work in < 1 s). Float
    * order matches the oracle exactly: per-pair L2 sums left-to-right
    * over dims, min over v order-free.
    */
  private def nndArr(u: Array[Array[Double]], v: Array[Array[Double]]): Array[Double] =
    u.map { x =>
      var best = Double.MaxValue
      var j = 0
      while (j < v.length) {
        val y = v(j)
        var s = 0.0
        var k = 0
        while (k < x.length) { val d = x(k) - y(k); s += d * d; k += 1 }
        val dist = math.sqrt(s)
        if (dist < best) best = dist
        j += 1
      }
      best
    }

  /** Bit-identical twin of Spark SQL `round(x, 4) + 0.0` (Round goes
    * through BigDecimal.valueOf → HALF_UP → toDouble).
    */
  private def roundSql4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  def cloudDistances(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val clouds = Corpus.embeddings(spark, sfDir)
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("vec_id"),
        col("embedding").cast("array<double>").as("emb")))).as("pts"))
      .select(col("label").cast("long").as("label"),
        transform(col("pts"), p => p.getField("emb")).as("cloud"))
    val a = clouds.select(col("label").as("la"), col("cloud").as("ca"))
    val b = clouds.select(col("label").as("lb"), col("cloud").as("cb"))
    a.crossJoin(b).filter(col("la") < col("lb"))
      .as[(Long, Seq[Seq[Double]], Long, Seq[Seq[Double]])]
      .map { case (la, ca, lb, cb) =>
        val u = ca.iterator.map(_.toArray).toArray
        val v = cb.iterator.map(_.toArray).toArray
        val nda = nndArr(u, v)
        val ndb = nndArr(v, u)
        // sums left-to-right in vec_id order (sorted clouds) — the
        // exact accumulation the oracle's list_sum performs
        (la, lb,
          roundSql4(math.max(nda.max, ndb.max)),
          roundSql4(nda.sum / u.length + ndb.sum / v.length))
      }
      .toDF("la", "lb", "hausdorff", "chamfer")
      .select(col("la"), col("lb"), col("hausdorff").cast("double"),
        col("chamfer").cast("double"))
      .orderBy("la", "lb")
  }

  val cloudDistancesOracleSql: String =
    """WITH e AS (
      |  SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), c AS (
      |  SELECT label, list(emb ORDER BY vec_id) AS cloud, count(*) AS n
      |  FROM e GROUP BY label
      |), p AS (
      |  SELECT a.label AS la, b.label AS lb, a.cloud AS ca, b.cloud AS cb,
      |         a.n AS na, b.n AS nb
      |  FROM c a, c b WHERE a.label < b.label
      |), d AS (
      |  SELECT la, lb, na, nb,
      |    [list_min([sqrt(list_sum([(x[k] - y[k]) * (x[k] - y[k])
      |                              FOR k IN range(1, len(x) + 1)])) FOR y IN cb]) FOR x IN ca] AS nda,
      |    [list_min([sqrt(list_sum([(x[k] - y[k]) * (x[k] - y[k])
      |                              FOR k IN range(1, len(x) + 1)])) FOR y IN ca]) FOR x IN cb] AS ndb
      |  FROM p
      |)
      |SELECT CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
      |  CAST(round(greatest(list_max(nda), list_max(ndb)), 4) + 0.0 AS DOUBLE) AS hausdorff,
      |  CAST(round(list_sum(nda) / na + list_sum(ndb) / nb, 4) + 0.0 AS DOUBLE) AS chamfer
      |FROM d ORDER BY la, lb""".stripMargin

  /** EMD as the reference's GREEDY perfect matching
    * (/root/reference/src/dist/cloud.jl:88-120) — transferred exactly,
    * including its accumulation of EVERY strictly-improving running
    * minimum during each row's scan (cloud.jl:105-110: `s += d` sits
    * inside the `d < min_` branch), not just the final match cost, and
    * the swap-list consumption of |U| columns of V. Inner metric L2,
    * exponent p as in the reference. Sequential data-dependent matching
    * has no SQL form → JVM kernel, golden-gated in DistSpec.
    */
  def emdGreedy(u: Array[Array[Double]], v: Array[Array[Double]], p: Double = 1.0): Double = {
    val n = u.length
    require(v.length >= n, "EMD consumes |U| columns of V (reference indexes V[1..n])")
    val c = Array.tabulate(n)(identity)
    var s = 0.0
    var i = 0
    while (i < n) {
      val ui = u(i)
      var min = Double.MaxValue
      var argmin = -1
      var j = i
      while (j < n) {
        val vj = v(c(j))
        var acc = 0.0
        var k = 0
        while (k < ui.length) { val d = ui(k) - vj(k); acc += d * d; k += 1 }
        val d = math.pow(math.sqrt(acc), p)
        if (d < min) { s += d; min = d; argmin = j }
        j += 1
      }
      val t = c(argmin); c(argmin) = c(i); c(i) = t
      i += 1
    }
    math.pow(s, 1.0 / p)
  }

  /** Q23 scalar quantization (/root/reference/src/sq/u8.jl:5-65,
    * /root/reference/src/sq/u4.jl:68, /root/reference/src/sq/u2.jl:74,
    * global variant /root/reference/src/sq/gu8.jl:13-41): affine codes
    * under GLOBAL (min, c) with `levels` quantization steps —
    * `code = round((x - min) / c)` ∈ [0, levels], dequant
    * `x' = min + code·c` — then k-NN over DEQUANTIZED vectors (the
    * `SQu8NormCosine` path). Quantization error makes this an
    * approximation of exact kNN; the ranking itself is exact over the
    * codes, so the DuckDB oracle reproduces it bit-for-bit. The u8/u4/u2
    * family only varies `levels` (255/15/3) — the bits-per-code storage
    * dial for impact-quantized postings; [[SqPack]] covers the
    * bit-packed storage round-trip.
    */
  def sqKnn(spark: SparkSession, sfDir: String, levels: Int, k: Int = 5): DataFrame = {
    VectorOps.guardExact(spark, VectorOps.embCount(spark, sfDir))
    val emb = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val mm = emb.select(
        min(array_min(col("e"))).as("lo"), max(array_max(col("e"))).as("hi"))
    val q = emb.crossJoin(broadcast(mm))
      .select(col("vec_id"),
        transform(col("e"), x =>
          round((x - col("lo")) / ((col("hi") - col("lo")) / levels.toDouble), 0)).as("codes"),
        col("lo"), ((col("hi") - col("lo")) / levels.toDouble).as("c"))
    val deq = q.select(col("vec_id"),
      transform(col("codes"), v => col("lo") + v * col("c")).as("dq"))
    // full-cross exhaustive scan over the dequantized vectors — same
    // fused broadcast-DB kernel as allknn (bit-identical NormCosine)
    VectorOps.fusedExhaustiveKnn(deq, deq, k, "vec_id", "nbr_id")
      .orderBy("vec_id", "rnk")
  }

  def sqU8Knn(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    sqKnn(spark, sfDir, levels = 255, k = k)
  def sqU4Knn(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    sqKnn(spark, sfDir, levels = 15, k = k)
  def sqU2Knn(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame =
    sqKnn(spark, sfDir, levels = 3, k = k)

  def sqKnnOracleSql(levels: Int, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), mm AS (
       |  SELECT min(lo) AS lo, (max(hi) - min(lo)) / $levels.0 AS c
       |  FROM (SELECT list_min(e) AS lo, list_max(e) AS hi FROM e)
       |), dq AS (
       |  SELECT vec_id,
       |         [mm.lo + round((x - mm.lo) / mm.c, 0) * mm.c FOR x IN e] AS d
       |  FROM e CROSS JOIN mm
       |), p AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j,
       |         round(1.0 - list_dot_product(a.d, b.d), 4) + 0.0 AS dist
       |  FROM dq a, dq b
       |), r AS (
       |  SELECT CAST(i AS BIGINT) AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY i ORDER BY dist ASC, j ASC) AS INTEGER) AS rnk,
       |         CAST(j AS BIGINT) AS nbr_id, CAST(dist AS DOUBLE) AS dist
       |  FROM p
       |)
       |SELECT vec_id, rnk, nbr_id, dist FROM r WHERE rnk <= $k
       |ORDER BY vec_id, rnk""".stripMargin

  def sqU8KnnOracleSql(k: Int = 5): String = sqKnnOracleSql(255, k)

  /** Per-vector SQ (`SQMinC`, /root/reference/src/sq/sq.jl:10-13,
    * applied per column at /root/reference/src/sq/u8.jl:43-65): each
    * vector carries its OWN (min, c) affine params — the reference's
    * default for heterogeneous-range vectors, vs the global variant
    * above (gu8, /root/reference/src/sq/gu8.jl:13-41). Codes
    * `round((x − min_v)/c_v)` with `c_v = (max_v − min_v)/levels`;
    * k-NN over the dequantized vectors, same pinned tie rule.
    */
  def sqMinCKnn(spark: SparkSession, sfDir: String, levels: Int = 255,
      k: Int = 5): DataFrame = {
    VectorOps.guardExact(spark, VectorOps.embCount(spark, sfDir))
    val emb = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val (lo, c) = sqMinCParams(col("e"), levels)
    val deq = emb
      .select(col("vec_id"), col("e"), lo.as("lo"), c.as("c"))
      .select(col("vec_id"),
        sqMinCDeq(col("e"), col("lo"), col("c")).as("dq"))
    VectorOps.fusedExhaustiveKnn(deq, deq, k, "vec_id", "nbr_id")
      .orderBy("vec_id", "rnk")
  }

  /** The SQMinC per-vector affine params as Catalyst expressions:
    * lo = min component, c = (max − min)/levels — THE definition of
    * the quantization grid, shared by the inline operator and every
    * build/search site of the quantized persisted index so no copy
    * can drift onto a different grid.
    */
  private[graft] def sqMinCParams(e: Column, levels: Int): (Column, Column) =
    (array_min(e), (array_max(e) - array_min(e)) / levels.toDouble)

  /** SQMinC quantize-then-dequantize as ONE Catalyst expression —
    * `lo + round((x − lo)/c)·c` per component. c = 0 (constant vector)
    * quantizes exactly to lo; without the branch, (x−lo)/c = 0/0 = NaN
    * poisons every distance. Shared by [[sqMinCKnn]] and the quantized
    * persisted index ([[graft.index.AnnIndex]]) so the stored-code
    * decode and the inline dequantization can never drift.
    */
  private[graft] def sqMinCDeq(e: Column, lo: Column, c: Column): Column =
    transform(e, x =>
      when(c === 0d, lo).otherwise(lo + round((x - lo) / c, 0) * c))

  /** The integer code half of [[sqMinCDeq]]: `round((x − lo)/c)` ∈
    * [0, levels] as doubles (exact integers — decode multiplies them
    * back by the SAME IEEE ops, so stored-code dequantization is
    * bit-identical to the one-expression form above).
    */
  private[graft] def sqMinCCodes(e: Column, lo: Column, c: Column): Column =
    transform(e, x =>
      when(c === 0d, lit(0d)).otherwise(round((x - lo) / c, 0)))

  /** JVM twin of [[sqMinCDeq]] for driver-side query vectors (external
    * batches against a quantized index), bit-identical by construction:
    * plain double min/max/divide in the same order, and the same
    * `BigDecimal.valueOf` HALF_UP rounding Catalyst's `round` codegen
    * performs on doubles — the [[VectorOps.jvmDist]] precedent. The
    * quantized-batch parity specs pin jvm ≡ Catalyst on real data.
    */
  private[graft] def jvmSqMinCDeq(e: Array[Double], levels: Int): Array[Double] = {
    var lo = e(0); var hi = e(0)
    var i = 1
    while (i < e.length) {
      if (e(i) < lo) lo = e(i)
      if (e(i) > hi) hi = e(i)
      i += 1
    }
    val c = (hi - lo) / levels.toDouble
    if (c == 0.0) Array.fill(e.length)(lo)
    else e.map { x =>
      lo + java.math.BigDecimal.valueOf((x - lo) / c)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() * c
    }
  }

  def sqMinCKnnOracleSql(levels: Int = 255, k: Int = 5): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), dq AS (
       |  SELECT vec_id,
       |         [CASE WHEN list_max(e) = list_min(e) THEN list_min(e)
       |               ELSE list_min(e) + round((x - list_min(e)) /
       |            ((list_max(e) - list_min(e)) / $levels.0), 0) *
       |            ((list_max(e) - list_min(e)) / $levels.0) END FOR x IN e] AS d
       |  FROM e
       |), p AS (
       |  SELECT a.vec_id AS i, b.vec_id AS j,
       |         round(1.0 - list_dot_product(a.d, b.d), 4) + 0.0 AS dist
       |  FROM dq a, dq b
       |), r AS (
       |  SELECT CAST(i AS BIGINT) AS vec_id,
       |         CAST(row_number() OVER (PARTITION BY i ORDER BY dist ASC, j ASC) AS INTEGER) AS rnk,
       |         CAST(j AS BIGINT) AS nbr_id, CAST(dist AS DOUBLE) AS dist
       |  FROM p
       |)
       |SELECT vec_id, rnk, nbr_id, dist FROM r WHERE rnk <= $k
       |ORDER BY vec_id, rnk""".stripMargin

  /** Bit-packed code storage for the u4/u2 variants (the reference
    * packs 2 codes/byte at u4, 4 codes/byte at u2 —
    * /root/reference/src/sq/u4.jl:68, /root/reference/src/sq/u2.jl:74).
    * Pure code-array ↔ byte-array transcoding; the kNN semantics above
    * are over the dequantized values, packing only changes storage.
    */
  object SqPack {
    def pack(codes: Array[Int], bits: Int): Array[Byte] = {
      require(bits == 2 || bits == 4 || bits == 8)
      val per = 8 / bits
      val out = new Array[Byte]((codes.length + per - 1) / per)
      var i = 0
      while (i < codes.length) {
        out(i / per) = (out(i / per) | ((codes(i) & ((1 << bits) - 1)) << ((i % per) * bits))).toByte
        i += 1
      }
      out
    }
    def unpack(packed: Array[Byte], n: Int, bits: Int): Array[Int] = {
      require(bits == 2 || bits == 4 || bits == 8)
      val per = 8 / bits
      Array.tabulate(n)(i => (((packed(i / per) & 0xff) >>> ((i % per) * bits)) & ((1 << bits) - 1)))
    }
  }
}
