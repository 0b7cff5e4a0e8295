package graft.index

import graft.core.Types._
import graft.functions.BM25
import graft.operators.TopK
import graft.queries.QuerySet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Block-Max WAND top-k over sealed segments — the fast query path, the
  * analogue of the reference's pruned beam traversal
  * (`beamsearch_inner_beam`, /root/reference/src/searchgraph/beamsearch.jl:30-60):
  * θ-pruning ≡ the radius bound `d ≤ Δ·maximum(res)` with
  * θ = `covradius` (k-th best, ∞/−∞ until full,
  * /root/reference/src/pqueue/pqueue.jl:35), block skipping ≡ the
  * visited-set + budget machinery. Unlike the reference's approximate
  * graph search, Block-Max WAND with exact per-block maxima is
  * RANK-EXACT (SURVEY.md §7.3) — required, since our gate is
  * rank-identity with the exhaustive scorer.
  *
  * Distribution model (the reference's `ParallelExhaustiveSearch`
  * partial/merge, /root/reference/src/parallel-exhaustive.jl:44-62):
  * segments are sharded by doc range; every shard evaluates WAND for
  * all queries over its local postings (queries + idf map broadcast),
  * emits its local top-k, and a final tiny groupBy(query) merge of
  * bounded heaps produces the global top-k. Scales horizontally in
  * docs (shards) with no per-query shuffle of scored rows at all —
  * only k rows per (shard, query) cross the wire.
  *
  * Rounding discipline: heap order and final ranking use ROUNDED
  * scores ((round(s,4) DESC, doc_id ASC) — identical to the exact path
  * and the DuckDB oracle), while pruning bounds are unrounded uppers
  * with a conservative margin [[RoundEps]]: a doc is skipped only if
  * its upper bound < θ − eps, which guarantees its rounded score could
  * not beat nor tie θ.
  */
object Wand {

  val RoundEps: Double = math.pow(10.0, -BM25.SCALE)

  /** Per-query evaluation cost counters — the reference's
    * `costdist`/`costblk` (/root/reference/src/pqueue/knnsorted.jl:10-13,
    * incremented at /root/reference/src/sequential-exhaustive.jl:67 and
    * /root/reference/src/searchgraph/beamsearch.jl:92-93): how many docs
    * got a full BM25 evaluation, how many blocks were decoded, and how
    * many blocks the θ-bound let the cursors jump over WITHOUT decoding
    * — the direct observable of Block-Max WAND pruning effectiveness.
    */
  final class Costs {
    var docsScored = 0L
    var blocksDecoded = 0L
    var blocksSkipped = 0L
  }

  /** One shard-local hit before the final per-query merge. */
  final case class PartialHit(query_id: Int, doc_id: Long, score: Double)

  /** Posting-list cursor with block-skip seek.
    *
    * `boundScale` keeps the Block-Max bounds SOUND for multi-snapshot
    * queries: `block_max_tfn` is sealed under the segment's OWN avgdl,
    * but scoring runs under the avgdl merged across all queried
    * snapshots, and tfn is increasing in avgdl — a merged avgdl above
    * the seal-time one makes true contributions exceed the sealed
    * maxima. The supremum of tfn(tf,dl,avgdl_m)/tfn(tf,dl,avgdl_s)
    * over all (tf, dl) is exactly avgdl_m/avgdl_s (cross-multiplying
    * (tf+c+s·dl)/(tf+c+m·dl) ≤ s/m with s = k1·b/avgdl_s reduces to
    * m ≤ s), so scaling the sealed bounds by
    * max(1, avgdl_m/avgdl_s) restores a certified upper bound; for the
    * single-snapshot case the scale is 1 and the bounds stay tight.
    */
  final class Cursor(val pl: PostingList, val idf: Double, cost: Costs,
      boundScale: Double = 1.0) {
    private var block = -1
    private var idx = 0
    private var docs: Array[Long] = _
    private var tfs: Array[Long] = _
    var curDoc: Long = 0L
    var exhausted = false
    val maxContrib: Double = idf * pl.block_max_tfn.max * boundScale

    private def loadBlock(b: Int): Unit = {
      if (b > block + 1) cost.blocksSkipped += b - block - 1
      cost.blocksDecoded += 1
      block = b
      val dt = IndexFormat.decodeBlock(pl, b)
      docs = dt._1; tfs = dt._2; idx = 0; curDoc = docs(0)
    }
    loadBlock(0)

    def blockMaxContrib: Double = idf * pl.block_max_tfn(block) * boundScale
    def blockLast: Long = pl.block_last_doc(block)
    def tf: Long = tfs(idx)

    def next(): Unit = {
      if (idx + 1 < docs.length) { idx += 1; curDoc = docs(idx) }
      else if (block + 1 < IndexFormat.numBlocks(pl)) loadBlock(block + 1)
      else exhausted = true
    }

    /** Advance to the first doc >= target (block-granular skip via
      * binary search over the strictly-increasing `block_last_doc`
      * array, then in-block scan — a block is ≤ 128 entries). A long
      * skip over a 10^5-block head-term list is O(log blocks), not a
      * linear boundary walk; `blocksSkipped` counts identically to the
      * former scan (blocks jumped over without decoding).
      */
    def seek(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      if (blockLast < target) {
        val lasts = pl.block_last_doc
        val nb = lasts.length
        // first b in (block, nb) with lasts(b) >= target; lasts is
        // strictly increasing (doc ids are), so binarySearch is exact
        val p = java.util.Arrays.binarySearch(lasts, block + 1, nb, target)
        val b = if (p >= 0) p else -(p + 1)
        if (b >= nb) { cost.blocksSkipped += nb - block - 1; exhausted = true; return }
        loadBlock(b)
      }
      while (docs(idx) < target) idx += 1
      curDoc = docs(idx)
    }
  }

  /** One query's WAND over one shard's cursors; fills `heap`. `dlAt`
    * resolves a doc's length from the norms sidecar.
    */
  /** @param theta0 a PROVEN lower bound on the k-th best ROUNDED score
    *   (from the hints sidecar), or −∞. Sound because the k witness
    *   docs behind it are ordinary corpus docs: their upper bounds are
    *   ≥ their scores ≥ θ0 − eps, so the floor can never prune them —
    *   it only lets pruning fire before the heap has filled.
    */
  private[index] def wandQuery(cursors0: Array[Cursor], heap: TopK.State,
      dlAt: Long => Long, avgdl: Double, cost: Costs,
      theta0: Double = Double.NegativeInfinity): Unit = {
    var cursors = cursors0.filter(!_.exhausted)
    val ord = Ordering.by((c: Cursor) => c.curDoc)
    while (cursors.nonEmpty) {
      java.util.Arrays.sort(cursors, ord)
      val thetaP = math.max(TopK.threshold(heap), theta0) - RoundEps
      var acc = 0.0
      var pivot = -1
      var i = 0
      while (i < cursors.length && pivot == -1) {
        acc += cursors(i).maxContrib
        if (acc > thetaP) pivot = i
        i += 1
      }
      if (pivot == -1) return // not even Σ max-contributions can matter
      val pivotDoc = cursors(pivot).curDoc
      if (cursors(0).curDoc == pivotDoc) {
        // candidate set = ALL cursors at pivotDoc, not just 0..pivot:
        // cursors past the pivot may also sit on this doc and their
        // contributions belong in its upper bound (missing them loses
        // true top-k docs — caught by the multi-block WandSpec test)
        var p2 = pivot
        while (p2 + 1 < cursors.length && cursors(p2 + 1).curDoc == pivotDoc) p2 += 1
        // block-max refinement: bound using CURRENT blocks of 0..p2
        var bacc = 0.0
        var j = 0
        while (j <= p2) { bacc += cursors(j).blockMaxContrib; j += 1 }
        if (bacc > thetaP) {
          val dl = dlAt(pivotDoc)
          var s = 0.0
          var j2 = 0
          while (j2 < cursors.length && !cursors(j2).exhausted &&
              cursors(j2).curDoc == pivotDoc) {
            val c = cursors(j2)
            s += c.idf * BM25.tfNorm(c.tf, dl, avgdl)
            c.next()
            j2 += 1
          }
          cost.docsScored += 1
          TopK.insert(heap, pivotDoc, BM25.roundScore(s))
        } else {
          // skip to the nearest block boundary; docs in [pivotDoc, target)
          // are bounded by bacc ≤ θ' (cursors beyond p2 sit ≥ target)
          var minLast = Long.MaxValue
          var j3 = 0
          while (j3 <= p2) { minLast = math.min(minLast, cursors(j3).blockLast); j3 += 1 }
          var target = minLast + 1
          if (p2 + 1 < cursors.length) target = math.min(target, cursors(p2 + 1).curDoc)
          if (target <= pivotDoc) target = pivotDoc + 1
          var j4 = 0
          while (j4 <= p2) { cursors(j4).seek(target); j4 += 1 }
        }
      } else {
        // docs below pivotDoc are bounded by Σ_{i<pivot} max ≤ θ': skip them
        var j5 = 0
        while (j5 < pivot) {
          if (cursors(j5).curDoc < pivotDoc) cursors(j5).seek(pivotDoc)
          j5 += 1
        }
      }
      if (cursors.exists(_.exhausted)) cursors = cursors.filter(!_.exhausted)
    }
  }

  /** All queries over one shard: local top-k hits per query. The
    * pruning counters are reported through `onCost` (once per query
    * that had any cursor in this shard) — in production that is a Spark
    * accumulator add, so hits and metrics come out of ONE shard-eval
    * pass instead of the former lazy-two-views/two-passes shape.
    */
  /** @param snapScale per-snapshot Block-Max bound scale
    *   (max(1, merged avgdl / snapshot avgdl) — see [[Cursor]]); keyed
    *   by the snapshot id each posting segment was loaded from.
    */
  private[index] def evalShard(postings: Iterator[(Long, PostingList)],
      norms: Iterator[DocNorms],
      queries: Seq[TermQuery], idfMap: Map[String, Double],
      avgdl: Double, theta0: Map[Int, Double] = Map.empty,
      onCost: (Int, Costs) => Unit = (_, _) => (),
      snapScale: Map[Long, Double] = Map.empty): Iterator[PartialHit] = {
    val byTerm = scala.collection.mutable.HashMap.empty[String, ArrayBuffer[(Long, PostingList)]]
    postings.foreach(sp => byTerm.getOrElseUpdate(sp._2.term, new ArrayBuffer) += sp)
    if (byTerm.isEmpty) return Iterator.empty
    // merged sorted norms arrays: FULL sort by doc id — unmerged
    // snapshots' doc ranges may interleave arbitrarily within a shard
    // (mergeSnapshots contract), so head-sorted concatenation is not
    // enough for the binary search below
    val segs = norms.map(IndexFormat.decodeNorms).toArray
    val pairs = segs.iterator.flatMap { case (ids, dls) =>
      ids.indices.iterator.map(i => (ids(i), dls(i)))
    }.toArray.sortBy(_._1)
    val nids = pairs.map(_._1)
    val ndls = pairs.map(_._2)
    val dlAt: Long => Long = { doc =>
      val p = java.util.Arrays.binarySearch(nids, doc)
      require(p >= 0, s"doc $doc missing from norms sidecar")
      ndls(p)
    }
    queries.iterator.flatMap { q =>
      val cost = new Costs
      val cursors = q.terms.distinct.flatMap(t =>
        byTerm.getOrElse(t, ArrayBuffer.empty).map { case (snap, pl) =>
          new Cursor(pl, idfMap(t), cost, snapScale.getOrElse(snap, 1.0))
        }).toArray
      if (cursors.isEmpty) Iterator.empty
      else {
        val heap = TopK.empty(q.k)
        wandQuery(cursors, heap, dlAt, avgdl, cost,
          theta0.getOrElse(q.query_id, Double.NegativeInfinity))
        onCost(q.query_id, cost)
        TopK.result(heap).iterator.map(h =>
          PartialHit(q.query_id, h.doc_id, h.score))
      }
    }
  }

  /** Batch top-k over a built index (possibly several unmerged
    * snapshots — cursors per segment, doc ranges disjoint per term).
    * Lazy, hits only — no cost machinery in the plan at all.
    */
  def topK(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      queries: Seq[TermQuery] = QuerySet.queries): DataFrame =
    hitsPlan(spark, indexDir, snaps, queries, useHints = true, costAcc = None)

  /** θ warm-start from the hints sidecar (the reference's hints role,
    * /root/reference/src/searchgraph/hints.jl:42-264): sum each hint
    * doc's contributions over the query's terms (tfn under the merged
    * avgdl), round onto the score grid, and take the k-th largest —
    * a certified lower bound on the k-th best final score, since every
    * true score only ADDS non-negative contributions to the partial.
    * O(H·|terms|) driver work per query; empty map for pre-hints
    * indexes (backward compatible).
    */
  /** Per-(index, snapshot set, term) hint-row memo: hints are immutable
    * per snapshot, so each term's rows are fetched from parquet AT MOST
    * once per JVM — repeated single-query calls (the p50/p99 path) pay
    * ZERO extra jobs after their terms are warm. Terms with no hints
    * memoize an empty array so absent terms don't re-trigger reads.
    * Memory is bounded by (distinct queried terms) × H, not vocabulary.
    */
  private val hintsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Array[(Long, Long, Long)]]
  /** (indexDir, snaps) whose hints sidecar is absent (pre-hints index). */
  private val noHints = scala.collection.concurrent.TrieMap.empty[(String, String), Unit]

  /** Snapshot stats and per-term global df, memoized with the same
    * immutable-per-snapshot argument as the hints: a sealed snapshot's
    * stats/termstats never change, so the repeated-single-query path
    * (latency p50/p99) runs ZERO driver-side parquet jobs once its
    * terms are warm — only the shard-eval cogroup itself.
    */
  private val statsMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[IndexBuilder.SnapStats]]
  private val dfMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Option[Long]]

  /** Drop every memo entry for `indexDir`. The memos assume a sealed
    * snapshot never changes at its path; [[IndexBuilder.build]] /
    * [[IndexBuilder.mergeSnapshots]] CAN overwrite one in place
    * (SaveMode.Overwrite, resume, re-merge), so they call this at
    * commit time — otherwise a same-JVM rebuild would silently serve
    * stale avgdl/idf/hints and score wrong with no error.
    */
  def invalidate(indexDir: String): Unit = {
    hintsMemo.keys.filter(_._1 == indexDir).foreach(hintsMemo.remove)
    noHints.keys.filter(_._1 == indexDir).foreach(noHints.remove)
    statsMemo.keys.filter(_._1 == indexDir).foreach(statsMemo.remove)
    dfMemo.keys.filter(_._1 == indexDir).foreach(dfMemo.remove)
  }

  private def cachedStats(spark: SparkSession, indexDir: String,
      snaps: Seq[Long]): Seq[IndexBuilder.SnapStats] = {
    val sk = snaps.sorted.mkString(",")
    statsMemo.getOrElseUpdate((indexDir, sk),
      IndexBuilder.loadStats(spark, indexDir, snaps))
  }

  /** Global df for the given terms (summed across snapshots); None =
    * the term occurs nowhere (kept out of the idf map, as before).
    */
  private def cachedDf(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      terms: Seq[String]): Map[String, Long] = {
    val sk = snaps.sorted.mkString(",")
    val missing = terms.filter(t => !dfMemo.contains((indexDir, sk, t)))
    if (missing.nonEmpty) {
      val found = snaps
        .map(s => spark.read.parquet(IndexBuilder.IndexPaths(indexDir).termstats(s)))
        .reduce(_ union _)
        .filter(col("term").isin(missing: _*))
        .groupBy("term").agg(sum("df").as("df"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      missing.foreach(t => dfMemo.put((indexDir, sk, t), found.get(t)))
    }
    terms.flatMap(t => dfMemo.get((indexDir, sk, t)).flatten.map(t -> _)).toMap
  }

  private def hintRows(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      terms: Seq[String]): Map[String, Array[(Long, Long, Long)]] = {
    val sk = snaps.sorted.mkString(",")
    if (noHints.contains((indexDir, sk))) return Map.empty
    val missing = terms.filter(t => !hintsMemo.contains((indexDir, sk, t)))
    if (missing.nonEmpty) {
      try {
        val fetched = snaps.map(s =>
            spark.read.parquet(IndexBuilder.IndexPaths(indexDir).hints(s)))
          .reduce(_ union _)
          .filter(col("term").isin(missing: _*))
          .select("term", "doc_id", "tf", "dl").distinct()
          .collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
          .groupBy(_._1)
        missing.foreach { t =>
          hintsMemo.put((indexDir, sk, t), fetched.getOrElse(t, Array.empty).map(_._2))
        }
      } catch {
        // ONLY the expected missing-sidecar case (pre-hints index) may
        // latch noHints; any OTHER analysis failure — schema drift, a
        // corrupt footer — must propagate, not silently disable the θ
        // warm-start for the rest of the JVM (same narrowing as
        // IndexBuilder.rawManifest)
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
              c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
          System.err.println(s"[graft] no hints sidecar for $indexDir " +
            s"snaps=$sk (${e.getCondition}) — θ warm-start disabled")
          noHints.put((indexDir, sk), ()); return Map.empty
        case e: java.io.FileNotFoundException =>
          System.err.println(s"[graft] no hints sidecar for $indexDir " +
            s"snaps=$sk (FileNotFoundException) — θ warm-start disabled")
          noHints.put((indexDir, sk), ()); return Map.empty
      }
    }
    terms.flatMap(t => hintsMemo.get((indexDir, sk, t)).map(t -> _)).toMap
  }

  private def hintThetas(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      queries: Seq[TermQuery], idfMap: Map[String, Double],
      avgdl: Double): Map[Int, Double] = {
    val qTerms = queries.flatMap(_.terms).distinct
    val byTerm = hintRows(spark, indexDir, snaps, qTerms)
    if (byTerm.isEmpty) return Map.empty
    queries.map { q =>
      val perDoc = scala.collection.mutable.HashMap.empty[Long, Double]
      q.terms.distinct.foreach { t =>
        (idfMap.get(t), byTerm.get(t)) match {
          case (Some(idf), Some(hs)) => hs.foreach { case (doc, tf, dl) =>
            perDoc(doc) = perDoc.getOrElse(doc, 0.0) + idf * BM25.tfNorm(tf, dl, avgdl)
          }
          case _ =>
        }
      }
      val lower = perDoc.values.map(BM25.roundScore).toArray.sorted(Ordering[Double].reverse)
      val t0 = if (lower.length >= q.k) lower(q.k - 1) else Double.NegativeInfinity
      q.query_id -> t0
    }.toMap
  }

  /** [[topK]] plus the per-query cost metrics
    * `(query_id, docs_scored, blocks_decoded, blocks_skipped)` summed
    * over shards — the production observable for WAND pruning (the
    * reference's `costdist`/`costblk`). Counters flow through a
    * CollectionAccumulator filled by the SAME shard-eval tasks that
    * produce the hits, so ONE action drives both: the hits are
    * collected eagerly here (they are ≤ queries×k rows by construction)
    * and both returned frames are small local DataFrames. Accumulator
    * caveat: a retried shard task could double-add its counter row —
    * acceptable for an observability channel (the hits stay exactly
    * correct), and impossible to observe under local[n].
    */
  def topKWithMetrics(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      queries: Seq[TermQuery] = QuerySet.queries,
      useHints: Boolean = true): (DataFrame, DataFrame) = {
    import spark.implicits._
    val acc = spark.sparkContext
      .collectionAccumulator[(Int, Long, Long, Long)]("graft.wand.cost")
    val hits = hitsPlan(spark, indexDir, snaps, queries, useHints, Some(acc))
    val hitRows = hits.collect() // the ONE action — fills acc as it runs
    val hitsDf = spark.createDataFrame(
      java.util.Arrays.asList(hitRows: _*), hits.schema)
    import scala.jdk.CollectionConverters._
    val metricsDf = acc.value.asScala.toSeq
      .groupBy(_._1).toSeq
      .map { case (q, rs) =>
        (q, rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum)
      }
      .sortBy(_._1)
      .toDF("query_id", "docs_scored", "blocks_decoded", "blocks_skipped")
    (hitsDf, metricsDf)
  }

  private def hitsPlan(spark: SparkSession, indexDir: String, snaps: Seq[Long],
      queries: Seq[TermQuery], useHints: Boolean,
      costAcc: Option[org.apache.spark.util.CollectionAccumulator[(Int, Long, Long, Long)]])
      : DataFrame = {
    import spark.implicits._
    val stats = cachedStats(spark, indexDir, snaps)
    val nDocs = stats.map(_.n_docs).sum
    val avgdl = stats.map(_.sum_dl).sum.toDouble / nDocs
    val qTerms = queries.flatMap(_.terms).distinct
    // global idf for the query terms only: tiny agg + driver map +
    // broadcast, memoized per (index, snaps, term)
    val idfMap: Map[String, Double] =
      cachedDf(spark, indexDir, snaps, qTerms)
        .map { case (t, df) => t -> BM25.idf(nDocs, df) }
    val theta0 =
      if (useHints) hintThetas(spark, indexDir, snaps, queries, idfMap, avgdl)
      else Map.empty[Int, Double]
    // per-snapshot Block-Max bound scale (see Cursor): sealed maxima
    // are tight under their own avgdl; a merged avgdl above it needs
    // the avgdl-ratio correction to stay an upper bound
    val snapScale: Map[Long, Double] = stats
      .map(s => s.snapshot_id -> math.max(1.0, avgdl / s.avgdl)).toMap
    val bc = spark.sparkContext.broadcast((queries, idfMap, avgdl, theta0, snapScale))

    // postings tagged with their source snapshot (per-snapshot read so
    // the term filter still pushes down to parquet row groups)
    val posts = snaps.map { s =>
      spark.read.parquet(IndexBuilder.IndexPaths(indexDir).postings(s))
        .withColumn("shard", col("shard").cast("int"))
        .filter(col("term").isin(qTerms: _*)) // pushed to parquet row groups
        .as[PostingList]
        .map(pl => (s, pl))
    }.reduce(_ union _)
    val norms = IndexBuilder.loadNorms(spark, indexDir, snaps)

    val partial = posts.groupByKey(_._2.shard)
      .cogroup(norms.groupByKey(_.shard)) { (_, pIt, nIt) =>
        val (qs, idf, ad, t0, sc) = bc.value
        evalShard(pIt, nIt, qs, idf, ad, t0,
          (qid, c) => costAcc.foreach(
            _.add((qid, c.docsScored, c.blocksDecoded, c.blocksSkipped))),
          sc)
      }
    val merged = partial
      .groupByKey(_.query_id).flatMapGroups { (qid, hits) =>
        val k = bc.value._1.find(_.query_id == qid).map(_.k).getOrElse(QuerySet.K)
        val heap = hits.foldLeft(TopK.empty(k)) { (h, r) => TopK.insert(h, r.doc_id, r.score) }
        TopK.result(heap).zipWithIndex.map { case (h, i) => QueryHit(qid, i + 1, h.doc_id, h.score) }
      }
    merged.toDF()
      .select(col("query_id").cast("int"), col("rnk").cast("int"),
        col("doc_id").cast("long"), col("score").cast("double"))
      .orderBy("query_id", "rnk")
  }

  /** Temp-index scope for the registry entries: `f` must end in
    * [[localizedResult]] (which owns success-path cleanup); this wrapper
    * covers the FAILURE path — a build that throws before
    * localizedResult is reached must not strand a partially written
    * index in /tmp (a bench loop retrying the op would fill the disk).
    */
  private def withTempIndex(prefix: String)(f: String => DataFrame): DataFrame = {
    val idx = java.nio.file.Files.createTempDirectory(prefix).toString
    try f(idx)
    catch { case t: Throwable =>
      graft.operators.StreamingOps.deleteRec(idx)
      invalidate(idx)
      throw t
    }
  }

  /** Registry entry: build a fresh index for the sfDir corpus in a temp
    * dir, then run the fixed query set through WAND. Content is a pure
    * function of the corpus — the temp location does not matter.
    */
  def topKOnCorpus(spark: SparkSession, sfDir: String, numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-") { idx =>
      IndexBuilder.build(spark, sfDir, idx, numShards)
      localizedResult(topK(spark, idx, Seq(1L)), idx)
    }

  /** Pin a small result locally, then delete the temp index dirs backing
    * it — the registry index queries build a throwaway index per call
    * and used to leave it in /tmp forever (same cleanup contract as the
    * streaming registry queries).
    */
  private def localizedResult(df: DataFrame, dirs: String*): DataFrame =
    try graft.operators.StreamingOps.localized(df)
    finally {
      graft.operators.StreamingOps.deleteRec(dirs: _*)
      dirs.foreach(invalidate)
    }

  /** Registry entry for the NORTH-RULE INGEST SHAPE: the corpus arrives
    * as the web-page table `(url, warc_ts, html BINARY, text, lang)`
    * (derived deterministically from the fixture — BASELINE.json
    * `input_hint`), text is EXTRACTED FROM THE HTML BYTES inside the
    * build plan ([[graft.corpus.Extractor.extractTextCol]] — codegen'd
    * regexp, no UDF), and extraction → tokenize → seal runs as one
    * Catalyst plan with no materialized intermediate corpus. The oracle
    * is the unchanged exhaustive BM25 SQL over `documents`: the whole
    * url→html→extract→index→WAND pipeline is correct iff it answers
    * exactly like an index over the carried text column — the
    * "byte-identical extracted text per url" invariant, enforced at
    * the ranking level by the driver's hash gate.
    */
  def topKOnPagesCorpus(spark: SparkSession, sfDir: String, numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-pages-") { idx =>
      import org.apache.spark.sql.functions.{col, regexp_extract}
      val docsFromPages = graft.corpus.Corpus.pages(spark, sfDir)
        .select(
          regexp_extract(col("url"), "/p(\\d+)$", 1).cast("long").as("doc_id"),
          graft.corpus.Extractor.extractTextCol(col("html")).as("text"))
      IndexBuilder.build(spark, sfDir, idx, numShards,
        docsOverride = Some(docsFromPages))
      localizedResult(topK(spark, idx, Seq(1L)), idx)
    }

  /** Registry entry for the LOG-STRUCTURED MERGE (the reference's
    * `rebuild` compaction, /root/reference/src/searchgraph/rebuild.jl:17-53):
    * build TWO snapshots over the doc-id halves of the corpus, compact
    * them with [[IndexBuilder.mergeSnapshots]], and run the fixed query
    * set through WAND over the MERGED snapshot only. The oracle is the
    * unchanged exhaustive BM25 SQL over the full corpus — a merged
    * index is correct iff it answers exactly like a direct full build.
    */
  def topKOnMergedCorpus(spark: SparkSession, sfDir: String, numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-merge-") { idx =>
      import org.apache.spark.sql.functions.max
      val maxDoc = graft.corpus.Corpus.documents(spark, sfDir)
        .agg(max("doc_id")).head().getLong(0)
      val mid = (maxDoc + 1) / 2
      IndexBuilder.build(spark, sfDir, idx, numShards, snapshotId = 1L,
        docIdRange = Some((0L, mid)))
      IndexBuilder.build(spark, sfDir, idx, numShards, snapshotId = 2L,
        parentSnapshot = 1L, docIdRange = Some((mid, maxDoc + 1)))
      IndexBuilder.mergeSnapshots(spark, idx, Seq(1L, 2L), outSnap = 3L, numShards)
      localizedResult(topK(spark, idx, Seq(3L)), idx)
    }

  /** Registry entry for the [[IndexBuilder.EpsilonNetHints]] strategy
    * (the reference's `EpsilonHints` callback, hints.jl:181-220): the
    * SAME build and query with ε-net witness selection. Hints are a θ
    * warm-start only — any strategy's sidecar must leave results
    * bit-identical — so the oracle is the unchanged exhaustive BM25
    * SQL, putting the strategy itself under the DuckDB gate.
    */
  def topKOnCorpusEpsHints(spark: SparkSession, sfDir: String,
      numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-eps-") { idx =>
      IndexBuilder.build(spark, sfDir, idx, numShards,
        hintStrategy = IndexBuilder.EpsilonNetHints())
      localizedResult(topK(spark, idx, Seq(1L)), idx)
    }

  /** Registry entry for the log-growth callbacks scheduler
    * ([[IndexBuilder.maybeCompact]], the reference's
    * `execute_callbacks!` at callbacks.jl:8-13): an ingest loop of four
    * doc-range batches where the SCHEDULER decides after each append
    * whether to compact the live snapshot set (starting=100 so the
    * fixture sizes cross real log1.5 boundaries — several do at every
    * SF). Whatever mix of merged and unmerged snapshots the scheduler
    * leaves live must answer exactly like one full build — the same
    * exhaustive-BM25 oracle as q03/q37.
    */
  /** Registry entry for manifest time travel
    * ([[IndexBuilder.snapshotsAsOf]] — the north rule's Iceberg-style
    * snapshot lineage made queryable): ingest two half-corpus
    * snapshots (commits 1 and 2 of the append-only manifest), then
    * answer the query batch AS OF commit 1 — the snapshot set is
    * resolved from the lineage, not hard-coded, and the result must
    * equal BM25 over exactly the first half of the corpus (the oracle
    * filters `documents` with the same midpoint split). The
    * stats/idf/avgdl side is per queried-snapshot-set, so the as-of
    * query scores under the as-of corpus statistics, not today's.
    */
  def topKAsOfCommit(spark: SparkSession, sfDir: String,
      numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-asof-") { idx =>
      import org.apache.spark.sql.functions.max
      val maxDoc = graft.corpus.Corpus.documents(spark, sfDir)
        .agg(max("doc_id")).head().getLong(0)
      val mid = (maxDoc + 1) / 2
      IndexBuilder.build(spark, sfDir, idx, numShards, snapshotId = 1L,
        docIdRange = Some((0L, mid)))
      IndexBuilder.build(spark, sfDir, idx, numShards, snapshotId = 2L,
        parentSnapshot = 1L, docIdRange = Some((mid, maxDoc + 1)))
      val snaps = IndexBuilder.snapshotsAsOf(spark, idx, commitSeq = 1L)
      require(snaps == Seq(1L), s"as-of commit 1 must see snapshot 1 only: $snaps")
      localizedResult(topK(spark, idx, snaps), idx)
    }

  def topKOnScheduledIngest(spark: SparkSession, sfDir: String,
      numShards: Int = 4): DataFrame =
    withTempIndex("graft-index-sched-") { idx =>
      import org.apache.spark.sql.functions.max
      val maxDoc = graft.corpus.Corpus.documents(spark, sfDir)
        .agg(max("doc_id")).head().getLong(0)
      val cuts = Seq(0.0, 0.3, 0.55, 0.8, 1.0)
        .map(f => math.round(f * (maxDoc + 1)).toLong)
      var live = Seq.empty[Long]
      var out = 10L
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        val snap = (i + 1).toLong
        IndexBuilder.build(spark, sfDir, idx, numShards, snapshotId = snap,
          docIdRange = Some((lo, hi)))
        if (IndexBuilder.maybeCompact(spark, idx, live, snap, out, numShards,
            starting = 100)) {
          live = Seq(out); out += 1
        } else live = live :+ snap
      }
      localizedResult(topK(spark, idx, live), idx)
    }
}
