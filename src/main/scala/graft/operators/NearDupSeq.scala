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
          val d = graft.functions.BM25.roundScore(1.0 - dot)
          if (d <= eps && (d < bestDist || (d == bestDist && aid < bestId))) {
            bestId = aid; bestDist = d
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
}
