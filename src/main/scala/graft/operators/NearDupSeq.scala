package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-faithful sequential `neardup`
  * (/root/reference/src/neardup.jl:40-118): process id-ordered blocks;
  * each block is queried against the accepted ("center") set so far —
  * items whose nearest accepted element is within ε are assigned to it,
  * the rest pass an intra-block filter (an item is also covered by an
  * earlier accepted item of ITS OWN block, `neardup_block!`
  * /root/reference/src/neardup.jl:136-192) and survivors are accepted.
  *
  * Acceptance is inherently order-sequential across blocks (the
  * reference has the same block-order sensitivity — SURVEY.md §7.3), so
  * this runs as a driver-coordinated loop of Spark jobs: one join per
  * block against the accumulated accepted set (broadcast while small,
  * partitioned cartesian past [[NearDupSeq.BroadcastCapRows]]); only
  * the ≤ blockSize uncovered candidates of the current block are
  * collected for the sequential intra-block pass. The accepted set is
  * driver-resident by the operator's nature (acceptance decisions are
  * sequential), which bounds this operator at driver memory — the
  * documented scale path for near-dup at 10^12 docs is LSH (q14).
  *
  * Invariants (reference /root/reference/test/testneardup.jl:14-16,
  * verbatim): all dist ≤ ε; sort(map) == sort(unique(nn)); accepted
  * elements cover themselves at dist 0.
  */
object NearDupSeq {

  /** Accepted-set size beyond which the per-block coverage join stops
    * broadcasting and lets the cartesian join partition instead.
    */
  val BroadcastCapRows = 100000

  /** @param filterBlocks the reference's `filterblocks` keyword
    *   (/root/reference/src/neardup.jl:40, configs exercised at
    *   /root/reference/test/testneardup.jl:5-56): when false, the
    *   intra-block coverage pass is skipped — every candidate a prior
    *   ACCEPTED center does not cover becomes a center itself, even if
    *   an earlier element of its own block is within ε.
    */
  def nearDupSeq(spark: SparkSession, sfDir: String, eps: Double = 0.65,
      blockSize: Int = 128, filterBlocks: Boolean = true): DataFrame = {
    import spark.implicits._
    val emb = Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .cache()
    // id RANGES from a 1-row agg — never the O(n) id list on the driver;
    // blocks are id-range windows (≡ positional blocks on dense ids)
    val mm = emb.agg(min("vec_id"), max("vec_id")).head()
    val (minId, maxId) = (mm.getLong(0), mm.getLong(1))
    // accepted centers live in a DRIVER buffer (they pass through the
    // driver at acceptance time anyway — the intra-block pass collects
    // its candidates); each block materializes a FRESH 1-deep local
    // relation from it instead of the former per-block union+cache
    // chain, whose lineage depth and leaked cached Datasets grew with
    // the block count. Past [[BroadcastCapRows]] the per-block join
    // drops the broadcast hint (a re-broadcast of a multi-GB accepted
    // set per block is the wrong plan; the cartesian join partitions).
    val accCenters = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]

    (minId to maxId by blockSize).foreach { blockLo =>
      val blockDf = emb.filter(col("vec_id") >= blockLo &&
        col("vec_id") < blockLo + blockSize)
      // covered by a previously accepted center? nearest wins, ties → smallest id
      val (coveredIds, coveredRows) = if (accCenters.isEmpty) (Set.empty[Long], Nil) else {
        val accDf = accCenters.toSeq.toDF("nn", "nn_emb")
        val accJoin = if (accCenters.size <= BroadcastCapRows) broadcast(accDf) else accDf
        val rows = blockDf.crossJoin(accJoin)
          .select(col("vec_id"), col("nn"),
            VectorOps.distCol(col("emb"), col("nn_emb")).as("dist"))
          .filter(col("dist") <= eps)
          .groupBy(col("vec_id"))
          .agg(min_by(struct(col("nn"), col("dist")),
            struct(col("dist"), col("nn"))).as("m"))
          .select(col("vec_id"), col("m.nn"), col("m.dist"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        (rows.map(_._1).toSet, rows.toList)
      }
      out ++= coveredRows
      // sequential intra-block pass over the uncovered candidates
      val cands = blockDf.filter(!col("vec_id").isin(coveredIds.toSeq: _*))
        .orderBy("vec_id")
        .as[(Long, Seq[Double])].collect()
      val blockAccepted = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
      cands.foreach { case (id, embSeq) =>
        val e = embSeq.toArray
        var bestId = -1L
        var bestDist = Double.MaxValue
        if (filterBlocks) blockAccepted.foreach { case (aid, aemb) =>
          var dot = 0.0
          var i = 0
          while (i < e.length) { dot += e(i) * aemb(i); i += 1 }
          // non-finite raw distance (NaN/Inf embedding component) must
          // fail the <= eps acceptance exactly like the Catalyst
          // distCol path does — roundScore would throw on it
          val raw = 1.0 - dot
          if (java.lang.Double.isFinite(raw)) {
            val d = graft.functions.BM25.roundScore(raw)
            if (d <= eps && (d < bestDist || (d == bestDist && aid < bestId))) {
              bestId = aid; bestDist = d
            }
          }
        }
        if (bestId >= 0) out += ((id, bestId, bestDist))
        else { blockAccepted += ((id, e)); out += ((id, id, 0.0)) }
      }
      accCenters ++= blockAccepted.map { case (i, e) => (i, e.toSeq) }
    }
    emb.unpersist()
    out.toSeq.toDF("vec_id", "nn", "dist")
      .select(col("vec_id").cast("long"), col("nn").cast("long"),
        round(col("dist"), 4).cast("double").as("dist"))
      .orderBy("vec_id")
  }

  /** DuckDB oracle for [[nearDupSeq]]: the order-sequential acceptance
    * loop as a RECURSIVE CTE stepping one id per iteration. The state
    * row carries the accepted centers as two LIST columns — `prior`
    * (centers from earlier blocks) and `blk` (centers accepted earlier
    * in the current block) — and each iteration emits its acceptance
    * decision as scalar columns, so the final result is the union of
    * all iterations (no O(n) result list copied through the state).
    * Block boundaries fold `blk` into `prior` every `blockSize` ids,
    * reproducing the two-tier coverage rule (prior-block centers win
    * over intra-block centers regardless of distance); nearest-center
    * ties break on (dist, id) via `list_sort` over (d, id) structs,
    * the same lexicographic rule as the Spark `min_by` struct and the
    * intra-block scan. Distance is the shared rounding-grid cosine
    * (`round(1 - dot, 4) + 0.0`, q06's proven idiom). Recursion depth
    * is maxId − minId + 1 — bounded by the fixture id range, which is
    * exactly why the driver gates at sf0.01 while the 10^12-doc scale
    * path remains LSH (q14).
    *
    * `filterBlocks=false` (the reference's `filterblocks` keyword,
    * exercised at /root/reference/test/testneardup.jl:5-56) skips the
    * intra-block coverage check — here, `bcov` becomes a statically
    * empty list so every prior-uncovered candidate is accepted.
    */
  def nearDupSeqOracleSql(eps: Double = 0.65, blockSize: Int = 128,
      filterBlocks: Boolean = true): String = {
    val bcov =
      if (filterBlocks)
        s"""list_sort(list_filter(list_transform(eff.eff_blk,
           |        c -> {'d': round(1.0 - list_dot_product(cur.emb, c.emb), 4) + 0.0, 'id': c.id}),
           |        x -> x.d <= $eps))""".stripMargin
      else "CAST([] AS STRUCT(d DOUBLE, id BIGINT)[])"
    s"""WITH RECURSIVE
       |e AS (
       |  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings
       |),
       |b AS (SELECT min(vec_id) AS min_id, max(vec_id) AS max_id FROM e),
       |st AS (
       |  SELECT (SELECT min_id FROM b) AS pos,
       |         CAST([] AS STRUCT(id BIGINT, emb DOUBLE[])[]) AS prior,
       |         CAST([] AS STRUCT(id BIGINT, emb DOUBLE[])[]) AS blk,
       |         CAST(NULL AS BIGINT) AS r_vec_id,
       |         CAST(NULL AS BIGINT) AS r_nn,
       |         CAST(NULL AS DOUBLE) AS r_dist
       |  UNION ALL
       |  SELECT s.pos + 1,
       |    eff.eff_prior AS prior,
       |    CASE WHEN cur.vec_id IS NOT NULL AND len(cov.pcov) = 0 AND len(cov.bcov) = 0
       |         THEN list_append(eff.eff_blk, {'id': cur.vec_id, 'emb': cur.emb})
       |         ELSE eff.eff_blk END AS blk,
       |    cur.vec_id AS r_vec_id,
       |    CASE WHEN cur.vec_id IS NULL THEN NULL
       |         WHEN len(cov.pcov) > 0 THEN cov.pcov[1].id
       |         WHEN len(cov.bcov) > 0 THEN cov.bcov[1].id
       |         ELSE cur.vec_id END AS r_nn,
       |    CASE WHEN cur.vec_id IS NULL THEN NULL
       |         WHEN len(cov.pcov) > 0 THEN cov.pcov[1].d
       |         WHEN len(cov.bcov) > 0 THEN cov.bcov[1].d
       |         ELSE 0.0 END AS r_dist
       |  FROM st s
       |  LEFT JOIN e cur ON cur.vec_id = s.pos,
       |  LATERAL (SELECT
       |      CASE WHEN (s.pos - (SELECT min_id FROM b)) % $blockSize = 0
       |           THEN list_concat(s.prior, s.blk) ELSE s.prior END AS eff_prior,
       |      CASE WHEN (s.pos - (SELECT min_id FROM b)) % $blockSize = 0
       |           THEN CAST([] AS STRUCT(id BIGINT, emb DOUBLE[])[]) ELSE s.blk END AS eff_blk
       |  ) eff,
       |  LATERAL (SELECT
       |      list_sort(list_filter(list_transform(eff.eff_prior,
       |        c -> {'d': round(1.0 - list_dot_product(cur.emb, c.emb), 4) + 0.0, 'id': c.id}),
       |        x -> x.d <= $eps)) AS pcov,
       |      $bcov AS bcov
       |  ) cov
       |  WHERE s.pos <= (SELECT max_id FROM b)
       |)
       |SELECT CAST(r_vec_id AS BIGINT) AS vec_id, CAST(r_nn AS BIGINT) AS nn,
       |       CAST(round(r_dist, 4) AS DOUBLE) AS dist
       |FROM st WHERE r_vec_id IS NOT NULL
       |ORDER BY vec_id""".stripMargin
  }
}
