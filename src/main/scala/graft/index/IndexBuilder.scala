package graft.index

import graft.analysis.Tokenizer
import graft.core.Types._
import graft.corpus.Corpus
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Inverted-index build — the engine's `index!` (reference build driver
  * /root/reference/src/searchgraph/insertions.jl:19-59), re-expressed
  * as ONE wide sort-based shuffle per artifact instead of the
  * reference's lock-guarded thread blocks: the two-step reverse-link
  * pass it needs for race freedom
  * (/root/reference/src/searchgraph/neighborhood.jl:66-82) is exactly
  * what a shuffle gives for free (SURVEY.md §2.3).
  *
  * Pipeline (SURVEY.md §3.2):
  *   documents scan (doc_id, text → column pruning)
  *   → tokenize + explode, dl attached
  *   → map-side combined tf agg                 [shuffle 1]
  *   → shard = doc_id range bucket; repartition(shard)
  *     + sortWithinPartitions(shard, term, doc_id)   [shuffle 2, sort-based]
  *   → streaming per-(shard,term) run seal (delta-gap+VByte blocks,
  *     block-max metadata) — spill-safe: one posting list in memory
  *     at a time, never a whole shard
  *   → parquet partitioned by shard (dynamic partition overwrite →
  *     idempotent per-shard re-runs = resumability)
  *   → manifest rows (lineage: segment id, doc range, counts, bytes)
  *     written LAST — the Iceberg-style commit point.
  *
  * Skew: sharding postings by DOC RANGE is the salting — a head term's
  * postings split across all shards, so no reducer ever materializes a
  * full head-term posting list (SURVEY.md §7.3 "head-term skew").
  *
  * Scale: every stage is a Catalyst plan over typed Datasets (no RDDs);
  * shard count scales with corpus (docs/`docsPerShard`), each sealed
  * shard is bounded, AQE coalesces small outputs.
  */
object IndexBuilder {

  /** One tokenized posting occurrence after tf aggregation. */
  final case class TermPosting(shard: Int, term: String, doc_id: Long, tf: Long, dl: Long)
  final case class DocLen(shard: Int, doc_id: Long, dl: Long)

  final case class SnapStats(
      snapshot_id: Long, n_docs: Long, sum_dl: Long, avgdl: Double,
      num_shards: Int, max_doc: Long)

  final case class IndexPaths(root: String) {
    def postings(snap: Long) = s"$root/postings/snap=$snap"
    def norms(snap: Long) = s"$root/norms/snap=$snap"
    def termstats(snap: Long) = s"$root/termstats/snap=$snap"
    def stats(snap: Long) = s"$root/stats/snap=$snap"
    def hints(snap: Long) = s"$root/hints/snap=$snap"
    def manifest = s"$root/manifest"
    def metrics = s"$root/metrics"
  }

  /** Hint fan-in per term (see the hints write in [[build]]). */
  val HintsPerTerm = 8

  /** Phase timer for fixed-cost profiling (`-Dgraft.profile.build`):
    * the build's scaling efficiency at small corpora is bounded by
    * per-phase driver choreography, so each phase is measurable. */
  @inline private def phase[A](name: String)(f: => A): A = {
    if (!sys.props.contains("graft.profile.build")) f
    else {
      val t0 = System.nanoTime(); val a = f
      println(f"[build-phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
  }

  /** Hint-selection strategy family — the reference ships several hint
    * callbacks (Random/Disjoint/KDisjoint/Epsilon/KCenters,
    * /root/reference/src/searchgraph/hints.jl:42-264); the engine's
    * sidecar schema is strategy-agnostic (any H REAL (doc_id, tf, dl)
    * witnesses keep the θ warm-start sound), so strategies differ only
    * in WHICH witnesses they keep.
    */
  sealed trait HintStrategy extends Serializable

  /** Default: the H strongest witnesses per term (largest tfn). */
  case object TopHHints extends HintStrategy

  /** The reference's `EpsilonHints` (hints.jl:181-220: "hints are a
    * small set of objects having a minimal distance between them")
    * transferred to the term-witness space: keep up to H witnesses
    * whose tf-normalizations are pairwise ≥ `eps` apart — an ε-net
    * over the tfn axis — chosen greedily in (tfn DESC, doc_id ASC)
    * order from an order-free top-`pool` candidate state (so the net
    * is deterministic and still map-side combined). Near-duplicate
    * witness profiles (the same (tf, dl) shape repeated) collapse to
    * one representative, freeing slots for DIVERSE profiles — the
    * reference's neardup-over-a-sample intent. tfn is bounded by
    * k1+1 = 2.2, so eps is an absolute gap on that scale (the
    * reference's `quantile=0` absolute-ε mode).
    */
  final case class EpsilonNetHints(eps: Double = 0.02, pool: Int = 4 * HintsPerTerm)
      extends HintStrategy

  /** The reference's `RandomHints` (hints.jl:42-75: "hints are a
    * random sample of the dataset") on the term-witness space: rank
    * witnesses by `xxhash64(doc_id, seed)` instead of tfn, so the kept
    * top-H-by-hash set is a seeded uniform sample WITHOUT replacement
    * of the term's full posting set — still bounded map-side by the
    * same aggregator (≤H rows per (partition, term) shuffle, any df).
    * Soundness is free (any real witnesses certify a θ0 lower bound);
    * selectivity is whatever the sample gives — the reference's own
    * baseline arm, kept as the control in `tools.HintsAB strategies`.
    * The remaining reference callbacks don't transfer: Disjoint/
    * KDisjoint (hints.jl:100-175) select by graph-adjacency
    * disjointness, a resource an inverted index doesn't have, and
    * KCenters diversity (hints.jl:221-264) is subsumed by the ε-net
    * over the 1-D tfn space (fft centers on a line ARE an ε-net).
    */
  final case class RandomWitnessHints(seed: Long = 0x9E3779B97F4A7C15L)
      extends HintStrategy

  final case class HintRow(doc_id: Long, tf: Long, dl: Long)

  /** Greedy ε-net over candidates already sorted (tfn DESC, doc_id ASC)
    * — keep a candidate iff its tfn is ≥ eps from every kept tfn; stop
    * at `h` kept — then PAD back to `h` with the strongest unkept
    * candidates in order. The pad is a deliberate divergence from the
    * reference's pure net (hints.jl:181-220): graph entry points WANT
    * duplicates collapsed, but our hints feed `Wand.hintThetas`, which
    * needs ≥ k witnesses before it can emit a θ0 at all — on a corpus
    * with uniform witness profiles (every (tf, dl) shape identical, the
    * selective needle workload) an unpadded net collapses each term to
    * ONE witness and the warm-start silently turns off (measured: the
    * selective query scored 34,068 docs unpadded vs 100 with top-H).
    * The strongest witness is always kept (first in order), so a
    * single-term θ0 never regresses below the top-1 bound.
    */
  private[graft] def epsilonNet(hs: Seq[HintRow], avgdl: Double, eps: Double,
      h: Int): Seq[HintRow] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(HintRow, Double)]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[HintRow]
    val it = hs.iterator
    while (it.hasNext && kept.size < h) {
      val r = it.next()
      val tfn = graft.functions.BM25.tfNorm(r.tf, r.dl, avgdl)
      if (kept.forall { case (_, t) => math.abs(t - tfn) >= eps })
        kept += ((r, tfn))
      else skipped += r
    }
    (kept.map(_._1) ++ skipped.take(h - kept.size)).toSeq
  }

  /** Bounded aggregation state for [[HintsTopH]]: the ≤H best
    * (tfn DESC, doc_id ASC) candidates seen so far, plain arrays so the
    * product encoder applies (same shape as [[graft.operators.TopK.State]]).
    */
  final case class HintState(h: Int, doc_ids: Array[Long], tfs: Array[Long],
      dls: Array[Long], tfns: Array[Double], var size: Int)

  /** Partial+final top-H-per-term aggregator for the hints sidecar.
    * The former `row_number() over (partition by term)` routed a head
    * term's ENTIRE posting set through one reducer task — the exact
    * single-reducer skew shape the q13 rewrite eliminated, reappearing
    * on the build side at web scale. As a typed Aggregator the top-H is
    * combined map-side: only ≤H rows per (partition, term) ever
    * shuffle, so a stopword's hint cost is O(partitions·H), independent
    * of its df.
    */
  final class HintsTopH(h: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (String, Long, Long, Long, Double), HintState, Seq[HintRow]] {
    // the engine's one pinned (value DESC, id ASC) total order —
    // defined once in TopK so the rank-identity tie rule cannot drift
    private def better(tfn1: Double, id1: Long, tfn2: Double, id2: Long): Boolean =
      graft.operators.TopK.better(id1, tfn1, id2, tfn2)
    private def insert(b: HintState, id: Long, tf: Long, dl: Long, tfn: Double): HintState = {
      if (b.size < b.h) {
        b.doc_ids(b.size) = id; b.tfs(b.size) = tf; b.dls(b.size) = dl
        b.tfns(b.size) = tfn; b.size += 1
      } else {
        // find the worst kept candidate (H is tiny — linear scan)
        var w = 0; var i = 1
        while (i < b.size) {
          if (better(b.tfns(w), b.doc_ids(w), b.tfns(i), b.doc_ids(i))) w = i
          i += 1
        }
        if (better(tfn, id, b.tfns(w), b.doc_ids(w))) {
          b.doc_ids(w) = id; b.tfs(w) = tf; b.dls(w) = dl; b.tfns(w) = tfn
        }
      }
      b
    }
    override def zero: HintState =
      HintState(h, new Array[Long](h), new Array[Long](h), new Array[Long](h),
        new Array[Double](h), 0)
    override def reduce(b: HintState, a: (String, Long, Long, Long, Double)): HintState =
      insert(b, a._2, a._3, a._4, a._5)
    override def merge(b1: HintState, b2: HintState): HintState = {
      var i = 0
      while (i < b2.size) {
        insert(b1, b2.doc_ids(i), b2.tfs(i), b2.dls(i), b2.tfns(i)); i += 1
      }
      b1
    }
    override def finish(b: HintState): Seq[HintRow] =
      (0 until b.size).map(i => (b.doc_ids(i), b.tfs(i), b.dls(i), b.tfns(i)))
        .sortWith((x, y) => better(x._4, x._1, y._4, y._1))
        .map(t => HintRow(t._1, t._2, t._3))
    override def bufferEncoder: org.apache.spark.sql.Encoder[HintState] =
      org.apache.spark.sql.Encoders.product[HintState]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[HintRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HintRow]]()
  }

  /** (term, doc_id, tf, dl) → ≤H hint rows per term under `avgdl`,
    * selected by `strategy`, via [[HintsTopH]] (map-side-combined —
    * head-term safe). The ε-net strategy widens the bounded candidate
    * state to `pool` and applies the net at finish — still ≤pool rows
    * per (partition, term) shuffle, df-independent.
    */
  private def topHintsPerTerm(df: org.apache.spark.sql.DataFrame,
      avgdl: Double, strategy: HintStrategy = TopHHints): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val poolSize = strategy match {
      case TopHHints => HintsPerTerm
      case EpsilonNetHints(_, pool) => pool
      case RandomWitnessHints(_) => HintsPerTerm
    }
    // the aggregator's rank column: tfn ("strongest first") except for
    // the random strategy, where a doc_id hash makes top-H ≡ a seeded
    // uniform sample of the term's posting set
    val rankCol = strategy match {
      case RandomWitnessHints(seed) =>
        xxhash64(col("doc_id"), lit(seed)).cast("double")
      case _ => graft.functions.BM25.tfNormCol(col("tf"), col("dl"), lit(avgdl))
    }
    df.select(col("term"), col("doc_id").cast("long"), col("tf").cast("long"),
        col("dl").cast("long"), rankCol.as("tfn"))
      .as[(String, Long, Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new HintsTopH(poolSize).toColumn.name("hs"))
      .flatMap { case (term, hs) =>
        val kept = strategy match {
          case TopHHints => hs
          case EpsilonNetHints(eps, _) => epsilonNet(hs, avgdl, eps, HintsPerTerm)
          case RandomWitnessHints(_) => hs
        }
        kept.map(r => (term, r.doc_id, r.tf, r.dl))
      }
      .toDF("term", "doc_id", "tf", "dl")
  }

  /** Build snapshot `snapshotId` over (optionally a doc_id subset of)
    * the corpus. `onlyShards` limits sealing to the given shards
    * (resume path); global artifacts (termstats/stats) are written only
    * when sealing the full shard set.
    *
    * `pruneTfnFloor` is the STATIC INDEX PRUNING dial — the inverted-
    * index analog of the reference's build-side neighborhood filters
    * (`SatNeighborhood`/`DistalSatNeighborhood`/`KCentersNeighborhood`,
    * /root/reference/src/searchgraph/neighborhood.jl:89-137), which
    * trade index size for recall by dropping low-impact edges at build
    * time. Here: drop postings whose idf-independent BM25 contribution
    * `tfn(tf, dl, avgdl)` falls below the floor — i.e. single
    * occurrences of a term inside long documents, the postings least
    * able to lift a document into any top-k. The filter is PER-ROW
    * (no join, no extra shuffle, no skew surface), so the dial is free
    * at any scale; df/idf and the hints sidecar are derived from the
    * PRUNED posting set, keeping the sealed index self-consistent.
    * `None` (default) = exact index; recall vs the exact index under
    * various floors is pinned in WandSpec.
    */
  /** `docsOverride`: an alternative (doc_id, text) source plan — the
    * north-rule ingest path feeds the html EXTRACTION projection here
    * directly (see [[Wand.topKOnPagesCorpus]]), so extraction →
    * tokenize → seal is ONE Catalyst plan with no materialized
    * intermediate corpus.
    */
  def build(spark: SparkSession, sfDir: String, indexDir: String,
      numShards: Int = 8, snapshotId: Long = 1L, parentSnapshot: Long = 0L,
      onlyShards: Option[Set[Int]] = None,
      docIdRange: Option[(Long, Long)] = None,
      writeGlobals: Option[Boolean] = None,
      pruneTfnFloor: Option[Double] = None,
      docsOverride: Option[org.apache.spark.sql.DataFrame] = None,
      hintStrategy: HintStrategy = TopHHints): Unit = {
    import spark.implicits._
    // overwrite semantics per write, not per session: a FULL build must
    // STATIC-overwrite its snapshot's partitioned dirs (an in-place
    // rebuild with a different shard count would otherwise leave STALE
    // shard partitions behind — dynamic overwrite only replaces the
    // partitions present in the new data — and stale doc-range shards
    // double-count their docs at query time, and commitManifest, which
    // derives lineage from the WRITTEN postings, would commit them);
    // only the RESUME path (onlyShards) wants dynamic overwrite, to
    // re-seal just the missing shards without touching committed ones.
    val overwriteMode = if (onlyShards.isEmpty) "static" else "dynamic"
    val paths = IndexPaths(indexDir)

    val docsAll = docsOverride.getOrElse(Corpus.documents(spark, sfDir))
      .select(col("doc_id"), col("text"))
    val docs = docIdRange match {
      case Some((lo, hi)) => docsAll.filter(col("doc_id") >= lo && col("doc_id") < hi)
      case None => docsAll
    }

    // ---- pass 0: corpus stats (tiny driver fetch; partial+final agg,
    // no shuffle). The (doc_id, dl) frame is persisted — 16 bytes/row —
    // because BOTH the stats action here and the norms seal below read
    // it, and recomputing it is a full tokenize of the corpus (the
    // build's most expensive linear stage, and the tf path already pays
    // one tokenize of its own).
    val dl = docs.select(col("doc_id"),
      size(Tokenizer.tokensCol(col("text"))).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = phase("stats_action") { dl.agg(
      count(lit(1)).as("n"), sum("dl").as("sum_dl"), max("doc_id").as("maxd")).head() }
    val nDocs = statsRow.getLong(0)
    val sumDl = statsRow.getLong(1)
    val maxDoc = statsRow.getLong(2)
    val avgdl = sumDl.toDouble / nDocs
    // range sharding over the GLOBAL id space so snapshots over
    // different doc batches share shard boundaries and merge shard-locally
    // (when building the whole corpus, maxDoc IS the global max — skip
    // the extra job)
    val globalMax = if (docIdRange.isEmpty) maxDoc
      else docsAll.agg(max("doc_id")).head().getLong(0)
    val shardSize = math.max(1L, (globalMax + numShards) / numShards)
    // the seal/decode paths index a shard's docs with Int arrays
    // (IndexFormat.decodeNorms et al.); refuse a shard count that
    // would silently wrap those counts past 2^31 instead of failing
    // deep inside an executor task — raise numShards with the corpus
    require(shardSize <= Int.MaxValue.toLong,
      s"shard size $shardSize (globalMax=$globalMax / numShards=$numShards) " +
        s"exceeds Int range — raise numShards so each shard holds < 2^31 docs")
    val shardCol = (col("doc_id") / shardSize).cast("int")

    // ---- term frequencies: ONE aggregation for tf and dl, cached —
    // both the seal pass and the hints pass read it, and recomputing
    // means a second full tokenize of the corpus (the most expensive
    // linear stage). MEMORY_AND_DISK: spills, never OOMs.
    val tfUnpruned = Tokenizer.termFrequencies(docs)
      .select(shardCol.as("shard"), col("term"), col("doc_id"),
        col("tf").cast("long"), col("dl").cast("long"))
    val tf = pruneTfnFloor.fold(tfUnpruned)(floor =>
        tfUnpruned.filter(graft.functions.BM25.tfNormCol(
          col("tf"), col("dl"), lit(avgdl)) >= floor))
      .as[TermPosting]
    val tfScoped = (onlyShards match {
      case Some(ss) => tf.filter(p => ss.contains(p.shard))
      case None => tf
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- seal postings: sort-based, streaming per-run
    val sealedPostings = tfScoped
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "term", "doc_id")
      .mapPartitions(it => sealRuns(it, avgdl))
    // postings ∥ norms: independent artifacts (postings reads tfScoped,
    // norms reads the dl cache the stats action already materialized),
    // so the small norms job rides in the wide postings shuffle's slot
    // slack — on a cluster this keeps executor slots full while the
    // shuffle tail drains; at small corpora it removes one serialized
    // job round-trip of pure fixed cost.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // every overlapped write is TRACKED: if any step throws, the catch
    // below drains the outstanding futures before rethrowing — a build
    // must never return (or fail out to a caller's retry) while a
    // zombie writer job still holds one of this snapshot's directories,
    // or the retry's Overwrite races it on the same path
    val pending = scala.collection.mutable.ArrayBuffer.empty[Future[Unit]]
    def track(f: Future[Unit]): Future[Unit] = { pending += f; f }
    try {
    val postingsF = track(Future(phase("postings_seal_write") {
      sealedPostings.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", overwriteMode)
        .partitionBy("shard").parquet(paths.postings(snapshotId))
    }))

    // ---- seal norms sidecar
    val dlShard = dl.select(shardCol.as("shard"), col("doc_id"), col("dl").cast("long"))
      .as[DocLen]
    val dlScoped = onlyShards match {
      case Some(ss) => dlShard.filter(d => ss.contains(d.shard))
      case None => dlShard
    }
    val sealedNorms = dlScoped
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .mapPartitions(sealNormRuns)
    val normsF = track(Future(phase("norms_seal_write") {
      sealedNorms.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", overwriteMode)
        .partitionBy("shard").parquet(paths.norms(snapshotId))
    }))
    // termstats + hints read artifacts the postings job produces (the
    // sealed segments / the tfScoped cache it fills) — wait for it
    Await.result(postingsF, Duration.Inf)

    if (writeGlobals.getOrElse(onlyShards.isEmpty)) {
      // ---- global term stats from the SEALED postings (df_local/cf_local
      // are already per-(shard,term) aggregates — summing the tiny sealed
      // rows avoids a second full tokenize+shuffle pass over the corpus)
      val termstats = loadPostings(spark, indexDir, Seq(snapshotId))
        .groupBy("term")
        .agg(sum("df_local").as("df"), sum("cf_local").as("cf"))
        .select(col("term"), col("df"), col("cf"),
          graft.functions.BM25.idfCol(lit(nDocs), col("df")).as("idf"))
        .as[TermStats]
      val termstatsF = track(Future(phase("termstats_write") {
        termstats.write.mode(SaveMode.Overwrite).parquet(paths.termstats(snapshotId)) }))

      val statsF = track(Future(phase("stats_write") {
        Seq(SnapStats(snapshotId, nDocs, sumDl, avgdl, numShards, maxDoc)).toDS()
          .write.mode(SaveMode.Overwrite).parquet(paths.stats(snapshotId)) }))

      // ---- per-term hints sidecar: the reference's search-start hints
      // (/root/reference/src/searchgraph/hints.jl:42-264) transferred to
      // WAND as a θ warm-start — for each term, the H docs with the
      // largest tf-normalization. At query time their partial scores
      // lower-bound the k-th best BEFORE any posting decodes (Wand
      // derives θ0 from them), so pruning fires from the first block.
      // Raw (tf, dl) is stored, not tfn: a multi-snapshot query recomputes
      // tfn under the MERGED avgdl, keeping the bound sound. Output is
      // H rows/term — tiny vs the postings; one extra agg pass over tf.
      // full-corpus source: the persisted tfScoped when it IS the full
      // corpus; on a resume (onlyShards) fall back to the unscoped plan
      // so the overwritten sidecar still covers every term
      val hintSrc = if (onlyShards.isEmpty) tfScoped.toDF() else tf.toDF()
      // hints reads the tfScoped cache (filled by the postings job) —
      // independent of termstats/stats, so all three run concurrently
      phase("hints_write") {
        topHintsPerTerm(hintSrc, avgdl, hintStrategy)
          .write.mode(SaveMode.Overwrite).parquet(paths.hints(snapshotId)) }
      Await.result(termstatsF, Duration.Inf)
      Await.result(statsF, Duration.Inf)
    }
    Await.result(normsF, Duration.Inf)
    } catch {
      case e: Throwable =>
        // drain, don't cancel: Spark jobs aren't interruptible mid-write;
        // waiting out the survivors (their own errors are secondary to
        // the one in flight) guarantees no writer outlives this call
        pending.foreach(f =>
          try Await.result(f, Duration.Inf) catch { case _: Throwable => () })
        throw e
    } finally {
      tfScoped.unpersist(blocking = false)
      dl.unpersist(blocking = false)
    }

    // ---- lineage + metrics from the WRITTEN artifacts, then commit
    phase("commit_manifest") {
      commitManifest(spark, paths, snapshotId, parentSnapshot, onlyShards) }
    // a rebuild at the same path invalidates Wand's driver memos
    Wand.invalidate(indexDir)
  }

  /** Manifest + metrics for the shards just sealed; manifest row
    * presence IS the commit marker for a (snapshot, shard) segment.
    */
  private def commitManifest(spark: SparkSession, paths: IndexPaths,
      snapshotId: Long, parentSnapshot: Long, onlyShards: Option[Set[Int]]): Unit = {
    import spark.implicits._
    val written = loadPostings(spark, paths.root, Seq(snapshotId))
    val normsW = loadNorms(spark, paths.root, Seq(snapshotId))
    val scoped = onlyShards match {
      case Some(ss) => written.filter(p => ss.contains(p.shard))
      case None => written
    }
    val normsScoped = onlyShards match {
      case Some(ss) => normsW.filter(n => ss.contains(n.shard))
      case None => normsW
    }
    val docRange = normsScoped.map { n =>
      val (ids, _) = IndexFormat.decodeNorms(n)
      (n.shard, ids.head, ids.last, n.n_docs)
    }.toDF("shard", "min_doc", "max_doc", "doc_count")
    val postAgg = scoped.map(p =>
        (p.shard, 1L, p.docs_enc.length.toLong + p.tfs_enc.length.toLong))
      .toDF("shard", "lists", "bytes")
      .groupBy("shard")
      .agg(sum("lists").as("term_count"), sum("bytes").as("postings_bytes"))
    // APPEND-ONLY commit (crash-safe + concurrent-safe: Spark's parquet
    // Append never deletes earlier commit markers — the former
    // collect + whole-dir Overwrite could destroy EVERY snapshot's
    // lineage if the process died between the delete and the write,
    // and two builds into the same index dir raced read-modify-write).
    // Staleness is resolved at READ time instead ([[readManifest]]):
    // this commit gets commit_seq = 1 + the highest committed so far
    // (one tiny read of an already-tiny table), and full_commit marks
    // whether it covers the snapshot's entire shard set. Two CONCURRENT
    // commits can draw the same seq, but only commits to the SAME
    // snapshot contend on it — and concurrent same-snapshot builds are
    // already undefined at the segment layer (both Overwrite the same
    // parquet partitions).
    val seq = 1L + rawManifest(spark, paths).map(_.commit_seq).foldLeft(0L)(math.max)
    // one job computes the (numShards-row) lineage: collect it, then
    // write manifest AND metrics from the driver-local rows — deriving
    // metrics from the manifest DATASET re-ran its whole plan (a second
    // scan of the sealed postings + norms per commit, pure fixed cost)
    // LEFT join from the norms side: a shard whose documents all
    // tokenize to zero terms has norms but no posting lists — an inner
    // join would drop its manifest row, readManifest would report it
    // missing forever, and resume() would loop re-sealing it without
    // ever converging. Such a shard commits with zeroed posting stats.
    val manifestRows = docRange.join(postAgg, Seq("shard"), "left")
      .select(lit(snapshotId).as("snapshot_id"),
        concat(lit(s"snap-$snapshotId-shard-"), col("shard")).as("segment_id"),
        col("shard").cast("int"), col("min_doc"), col("max_doc"),
        col("doc_count"),
        coalesce(col("term_count"), lit(0L)).as("term_count"),
        coalesce(col("postings_bytes"), lit(0L)).as("postings_bytes"),
        lit(parentSnapshot).as("parent_snapshot"),
        lit(seq).as("commit_seq"),
        lit(onlyShards.isEmpty).as("full_commit"))
      .as[ManifestRow]
      .collect().toSeq
    // metrics are observability, not commit markers — their Append can
    // ride alongside the manifest's (different paths, no ordering need)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val metricsF = Future {
      manifestRows.flatMap(m => Seq(
          StageMetric(m.snapshot_id, "seal_postings", m.shard, m.doc_count, m.term_count, m.postings_bytes),
          StageMetric(m.snapshot_id, "seal_norms", m.shard, m.doc_count, m.doc_count, 0L)))
        .toDS().coalesce(1).write.mode(SaveMode.Append).parquet(paths.metrics)
    }
    try manifestRows.toDS().coalesce(1).write.mode(SaveMode.Append).parquet(paths.manifest)
    catch {
      // drain the metrics append before failing out — a caller's retry
      // must never race a zombie writer on the shared metrics path
      case e: Throwable =>
        try Await.result(metricsF, Duration.Inf) catch { case _: Throwable => () }
        throw e
    }
    Await.result(metricsF, Duration.Inf)
  }

  /** Every manifest row as appended, duplicates included. Existence is
    * probed through the Hadoop FileSystem of the path itself (NOT
    * java.nio — on hdfs:// or s3a:// a local-FS check is always false),
    * with a NARROW catch as the "no manifest yet" fallback where the
    * probe can race a writer: only path-missing / empty-dir analysis
    * errors mean "nothing committed". Any OTHER AnalysisException — a
    * manifest whose schema doesn't decode to [[ManifestRow]], a
    * corrupted footer — must PROPAGATE: mapping it to "no manifest"
    * would make resume() silently full-rebuild a committed index and
    * let the next commit append mixed-schema rows beside the
    * undecodable ones.
    */
  private def rawManifest(spark: SparkSession, paths: IndexPaths): Seq[ManifestRow] = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(paths.manifest)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else try {
      // manifests persisted before the append-only commit protocol lack
      // commit_seq/full_commit; under the old Overwrite protocol the
      // manifest WAS the current view, so uniform (seq 0, full commit)
      // reproduces it exactly under readManifest's supersede rules (and
      // the next commit correctly draws seq 1). After that next commit
      // the dir holds MIXED schemas and the legacy files read as NULL
      // in these two columns — coalesce covers both shapes. Any OTHER
      // schema mismatch still propagates as corruption below.
      // mergeSchema: on a mixed dir the default single-footer schema
      // pick could LOSE the new columns (zeroing a real commit_seq);
      // the manifest is numShards-rows tiny, the merge costs nothing.
      val raw0 = spark.read.option("mergeSchema", "true").parquet(paths.manifest)
      val raw = Seq("commit_seq" -> lit(0L), "full_commit" -> lit(true))
        .foldLeft(raw0) { case (df, (c, d)) =>
          if (df.columns.contains(c)) df.withColumn(c, coalesce(col(c), d))
          else df.withColumn(c, d)
        }
      raw.as[ManifestRow].collect().toSeq
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
            c.startsWith("PATH_NOT_FOUND") || c.startsWith("UNABLE_TO_INFER_SCHEMA")) =>
        Seq.empty
      case _: java.io.FileNotFoundException => Seq.empty
    }
  }

  /** The manifest's CURRENT lineage view — append-only rows with
    * staleness resolved here: (1) a snapshot's rows older than its
    * latest full commit are superseded (an in-place full rebuild, or a
    * rebuild with a different shard count, hides every earlier row);
    * (2) per (snapshot, shard) the highest commit_seq wins (a resume
    * re-seal of one shard supersedes only that shard's row).
    */
  def readManifest(spark: SparkSession, indexDir: String): Seq[ManifestRow] =
    currentView(rawManifest(spark, IndexPaths(indexDir)))

  /** The supersede rules over a row set (see [[readManifest]]). Shared
    * by the current view and the time-travel view — the as-of view is
    * by definition these same rules applied to the as-of PREFIX of the
    * append-only log.
    */
  private def currentView(raw: Seq[ManifestRow]): Seq[ManifestRow] =
    raw.groupBy(_.snapshot_id).values.flatMap { rows =>
      val fullSeq = rows.filter(_.full_commit).map(_.commit_seq).foldLeft(0L)(math.max)
      rows.filter(_.commit_seq >= fullSeq)
        .groupBy(_.shard).values.map(_.maxBy(_.commit_seq))
    }.toSeq.sortBy(r => (r.snapshot_id, r.shard))

  /** Iceberg-style time travel over the lineage: the manifest view AS
    * OF `commitSeq` — the supersede rules applied to the prefix of the
    * append-only log with commit_seq ≤ `commitSeq`. Because commits
    * only APPEND rows, this is exactly what [[readManifest]] returned
    * the moment commit `commitSeq` landed. Valid for time-travel
    * QUERIES whenever later commits only added snapshots (the ingest
    * pattern): the earlier snapshots' sealed segments are immutable on
    * disk. A later in-place rebuild of the SAME (snapshot, shard)
    * overwrites the data files (the manifest is lineage, not an
    * Iceberg data-file catalog), so the lineage view stays correct but
    * the as-of DATA is gone — same contract as an expired Iceberg
    * snapshot.
    */
  def manifestAsOf(spark: SparkSession, indexDir: String,
      commitSeq: Long): Seq[ManifestRow] =
    currentView(rawManifest(spark, IndexPaths(indexDir))
      .filter(_.commit_seq <= commitSeq))

  /** The snapshot ids live in the as-of view — the set to hand
    * [[Wand.topK]] for a time-travel query.
    */
  def snapshotsAsOf(spark: SparkSession, indexDir: String,
      commitSeq: Long): Seq[Long] =
    manifestAsOf(spark, indexDir, commitSeq).map(_.snapshot_id).distinct.sorted

  /** Resume an interrupted build: diff the manifest against the shard
    * set the corpus implies, re-seal only the missing shards (the
    * north rule's checkpoint-resume; idempotent because partition
    * overwrite is dynamic).
    *
    * The caller MUST pass the same build dials (`pruneTfnFloor`,
    * `hintStrategy`, `docsOverride`) as the original build — the
    * manifest records lineage, not configuration, so a resume with
    * different dials would silently seal the missing shards under a
    * different pruning/text source than the committed ones and the
    * re-derived global idf would disagree with the sealed postings.
    */
  def resume(spark: SparkSession, sfDir: String, indexDir: String,
      numShards: Int, snapshotId: Long,
      docIdRange: Option[(Long, Long)] = None,
      pruneTfnFloor: Option[Double] = None,
      hintStrategy: HintStrategy = TopHHints,
      docsOverride: Option[org.apache.spark.sql.DataFrame] = None): Set[Int] = {
    import spark.implicits._
    val paths = IndexPaths(indexDir)
    val docsAll = docsOverride.getOrElse(Corpus.documents(spark, sfDir))
      .select(col("doc_id"))
    val globalMax = docsAll.agg(max("doc_id")).head().getLong(0)
    val shardSize = math.max(1L, (globalMax + numShards) / numShards)
    val docs = docIdRange match {
      case Some((lo, hi)) => docsAll.filter(col("doc_id") >= lo && col("doc_id") < hi)
      case None => docsAll
    }
    val expected = docs.select((col("doc_id") / shardSize).cast("int").as("shard"))
      .distinct().as[Int].collect().toSet
    // the DEDUPED lineage view: stale shard rows from a superseded full
    // build (e.g. a rebuild with a different shard count) must not
    // count as "done"
    val done: Set[Int] = readManifest(spark, indexDir)
      .filter(_.snapshot_id == snapshotId).map(_.shard).toSet
    val missing = expected -- done
    if (missing.nonEmpty)
      build(spark, sfDir, indexDir, numShards, snapshotId,
        onlyShards = Some(missing), docIdRange = docIdRange,
        writeGlobals = Some(true), // a crash may have preceded the global artifacts
        pruneTfnFloor = pruneTfnFloor, hintStrategy = hintStrategy,
        docsOverride = docsOverride)
    missing
  }

  /** Streaming run-grouper: consecutive (shard, term) rows → sealed
    * posting list. Input iterator must be sorted by (shard, term,
    * doc_id); holds ONE list in memory, never a whole shard.
    */
  private[index] def sealRuns(it: Iterator[TermPosting], avgdl: Double): Iterator[PostingList] = {
    val bit = it.buffered
    new Iterator[PostingList] {
      override def hasNext: Boolean = bit.hasNext
      override def next(): PostingList = {
        val shard = bit.head.shard
        val term = bit.head.term
        val ds = new ArrayBuffer[Long]; val ts = new ArrayBuffer[Long]; val ls = new ArrayBuffer[Long]
        while (bit.hasNext && bit.head.shard == shard && bit.head.term == term) {
          val r = bit.next()
          ds += r.doc_id; ts += r.tf; ls += r.dl
        }
        IndexFormat.seal(shard, term, ds.toArray, ts.toArray, ls.toArray, avgdl)
      }
    }
  }

  private[index] def sealNormRuns(it: Iterator[DocLen]): Iterator[DocNorms] = {
    val bit = it.buffered
    new Iterator[DocNorms] {
      override def hasNext: Boolean = bit.hasNext
      override def next(): DocNorms = {
        val shard = bit.head.shard
        val ds = new ArrayBuffer[Long]; val ls = new ArrayBuffer[Long]
        while (bit.hasNext && bit.head.shard == shard) {
          val r = bit.next()
          ds += r.doc_id; ls += r.dl
        }
        IndexFormat.sealNorms(shard, ds.toArray, ls.toArray)
      }
    }
  }

  // ---------- loaders ----------

  def loadPostings(spark: SparkSession, indexDir: String, snaps: Seq[Long]): Dataset[PostingList] = {
    import spark.implicits._
    snaps.map(s => spark.read.parquet(IndexPaths(indexDir).postings(s))
        .withColumn("shard", col("shard").cast("int")).as[PostingList])
      .reduce(_ union _)
  }

  def loadNorms(spark: SparkSession, indexDir: String, snaps: Seq[Long]): Dataset[DocNorms] = {
    import spark.implicits._
    snaps.map(s => spark.read.parquet(IndexPaths(indexDir).norms(s))
        .withColumn("shard", col("shard").cast("int")).as[DocNorms])
      .reduce(_ union _)
  }

  def loadStats(spark: SparkSession, indexDir: String, snaps: Seq[Long]): Seq[SnapStats] = {
    import spark.implicits._
    snaps.flatMap(s =>
      spark.read.parquet(IndexPaths(indexDir).stats(s)).as[SnapStats].collect())
  }

  /** The reference's log-growth callbacks scheduler transferred
    * (`execute_callbacks!`, /root/reference/src/searchgraph/callbacks.jl:8-13,
    * defaults /root/reference/src/searchgraph/context.jl:55-75): fire
    * maintenance iff the index grew across a `ceil(log_b ·)` boundary —
    * for a batch append [sp, ep] the reference tests
    * `sp ≥ starting && ceil(log_b sp) != ceil(log_b ep)`
    * (insertions.jl:96). `docsBefore`/`docsAfter` are the index's doc
    * counts around the append; sp = docsBefore + 1 reproduces the
    * reference's batch form exactly.
    */
  def crossesGrowthBoundary(docsBefore: Long, docsAfter: Long,
      logbase: Double = 1.5, starting: Long = 256): Boolean = {
    val sp = docsBefore + 1
    def ceilLog(x: Long): Long = math.ceil(math.log(x.toDouble) / math.log(logbase)).toLong
    sp >= starting && ceilLog(sp) != ceilLog(docsAfter)
  }

  /** Growth-triggered compaction — the scheduler's two callbacks
    * (hints recompute + stats/hyperparameter refresh, the reference's
    * `hints_callback`/`hyperparameters_callback`) both happen EXACTLY
    * at merge in this engine ([[mergeSnapshots]] recomputes stats,
    * termstats/idf, and the hints sidecar from the merged postings), so
    * "fire callbacks" = "compact the live snapshots". Call after
    * appending `newSnap`; merges `liveSnaps :+ newSnap → outSnap` iff
    * the append crossed a log-growth boundary. Returns whether it
    * fired. Snapshot-count growth stays logarithmic in corpus size —
    * the LSM discipline that keeps multi-snapshot query fan-in bounded.
    */
  def maybeCompact(spark: SparkSession, indexDir: String,
      liveSnaps: Seq[Long], newSnap: Long, outSnap: Long, numShards: Int,
      logbase: Double = 1.5, starting: Long = 256,
      hintStrategy: HintStrategy = TopHHints): Boolean = {
    val before = if (liveSnaps.isEmpty) 0L
      else loadStats(spark, indexDir, liveSnaps).map(_.n_docs).sum
    val after = before + loadStats(spark, indexDir, Seq(newSnap)).map(_.n_docs).sum
    val fire = crossesGrowthBoundary(before, after, logbase, starting)
    if (fire && liveSnaps.nonEmpty)
      mergeSnapshots(spark, indexDir, liveSnaps :+ newSnap, outSnap, numShards, hintStrategy)
    fire && liveSnaps.nonEmpty
  }

  /** Log-structured multi-way segment merge (the reference's `rebuild`
    * compaction, /root/reference/src/searchgraph/rebuild.jl:17-53, and
    * `StaticAdjList` freeze): co-partition the COMPRESSED segments of
    * all input snapshots by shard, decode, k-way merge per (shard,
    * term), re-seal under the merged corpus' avgdl. Only compressed
    * rows cross the wire; doc ranges of input snapshots may interleave
    * arbitrarily. Deterministic: merged output ≡ a direct full build
    * (MergeSpec pins this, incl. idempotence + associativity).
    */
  def mergeSnapshots(spark: SparkSession, indexDir: String,
      inSnaps: Seq[Long], outSnap: Long, numShards: Int,
      hintStrategy: HintStrategy = TopHHints): Unit = {
    import spark.implicits._
    val paths = IndexPaths(indexDir)
    val statsIn = loadStats(spark, indexDir, inSnaps)
    val nDocs = statsIn.map(_.n_docs).sum
    val sumDl = statsIn.map(_.sum_dl).sum
    val avgdl = sumDl.toDouble / nDocs
    val maxDoc = statsIn.map(_.max_doc).max

    val posts = loadPostings(spark, indexDir, inSnaps)
    val norms = loadNorms(spark, indexDir, inSnaps)

    // decode → dl lookup per shard via SORTED cogroup: Spark sorts each
    // shard's segments by term inside the shuffle (sort-based, spills),
    // so the merge streams ONE term's segments at a time — the same
    // one-run-at-a-time discipline as sealRuns; never a whole shard in
    // memory. (The dl sidecar map IS per-shard, but docs-per-shard is a
    // build-time constant by the sharding policy — it does not grow
    // with corpus size, unlike the postings set this used to hold.)
    val mergedPostings = posts.groupByKey(_.shard)
      .cogroupSorted(norms.groupByKey(_.shard))(col("term"))() { (shard, pIt, nIt) =>
        // boxed value type so a missing key surfaces as null instead of
        // silently unboxing to 0L (= maximal tfn at seal time)
        val dlMap = new java.util.HashMap[Long, java.lang.Long]()
        nIt.foreach { nm =>
          val (ids, dls) = IndexFormat.decodeNorms(nm)
          var i = 0
          while (i < ids.length) { dlMap.put(ids(i), dls(i)); i += 1 }
        }
        val bit = pIt.buffered
        new Iterator[PostingList] {
          override def hasNext: Boolean = bit.hasNext
          override def next(): PostingList = {
            val term = bit.head.term
            val segs = new ArrayBuffer[(Array[Long], Array[Long])]
            while (bit.hasNext && bit.head.term == term)
              segs += IndexFormat.decodeAll(bit.next())
            // k-way merge of THIS term's segments (doc ranges of input
            // snapshots may interleave arbitrarily → full sort by doc)
            val all = segs.flatMap { case (ds, ts) => ds.zip(ts) }.sortBy(_._1)
            val docIds = all.map(_._1).toArray
            val tfs = all.map(_._2).toArray
            val dls = docIds.map { d =>
              val dl = dlMap.get(d)
              require(dl != null, s"doc $d in postings but missing from norms (shard $shard)")
              dl.longValue()
            }
            IndexFormat.seal(shard, term, docIds, tfs, dls, avgdl)
          }
        }
      }
    // STATIC overwrite: a merge always writes outSnap's FULL shard set,
    // and a re-merge into the same outSnap with a different shard count
    // must not leave stale shard partitions (same hazard as build's
    // in-place rebuild — stale doc-range shards double-count)
    mergedPostings.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(paths.postings(outSnap))

    val mergedNorms = norms.groupByKey(_.shard).mapGroups { (shard, nIt) =>
      val all = nIt.flatMap { nm =>
        val (ids, dls) = IndexFormat.decodeNorms(nm)
        ids.zip(dls)
      }.toArray.sortBy(_._1)
      IndexFormat.sealNorms(shard, all.map(_._1), all.map(_._2))
    }
    mergedNorms.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(paths.norms(outSnap))

    // merged term stats: df/cf add exactly; idf from merged n
    val ts = inSnaps.map(s => spark.read.parquet(paths.termstats(s)))
      .reduce(_ union _)
      .groupBy("term").agg(sum("df").as("df"), sum("cf").as("cf"))
      .select(col("term"), col("df"), col("cf"),
        graft.functions.BM25.idfCol(lit(nDocs), col("df")).as("idf"))
      .as[TermStats]
    ts.write.mode(SaveMode.Overwrite).parquet(paths.termstats(outSnap))

    Seq(SnapStats(outSnap, nDocs, sumDl, avgdl, numShards, maxDoc)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(paths.stats(outSnap))

    // merged hints: union the inputs' H-per-term rows, re-top under the
    // merged avgdl (any subset of docs is a sound θ0 witness set — the
    // union just keeps the strongest H). Pre-hints input snapshots have
    // no sidecar (the query path treats that as "no warm start"); merge
    // whatever subset exists rather than failing after the postings
    // were already written.
    val hintInputs = inSnaps.flatMap { s =>
      // only "no sidecar" means pre-hints; a corrupt/mis-schemaed
      // sidecar must fail the merge, not be misread as absent
      try Some(spark.read.parquet(paths.hints(s)))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.startsWith("PATH_NOT_FOUND") ||
              c.startsWith("UNABLE_TO_INFER_SCHEMA")) => None
      }
    }
    if (hintInputs.nonEmpty)
      topHintsPerTerm(hintInputs.reduce(_ union _), avgdl, hintStrategy)
        .write.mode(SaveMode.Overwrite).parquet(paths.hints(outSnap))
    else {
      // no input has a sidecar: DELETE any stale sidecar a prior merge
      // left at this outSnap path — hintThetas over witness docs absent
      // from the new index could exceed the true k-th best score and
      // unsoundly prune true hits; absent sidecar = "no warm start"
      val hp = new org.apache.hadoop.fs.Path(paths.hints(outSnap))
      val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(hp)) fs.delete(hp, true)
    }

    commitManifest(spark, paths, outSnap, inSnaps.max, None)
    Wand.invalidate(indexDir)
  }
}
