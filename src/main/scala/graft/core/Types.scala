package graft.core

/** Core data model of the engine.
  *
  * The reference's universal (id, score) pair is `IdDist{id::UInt32,
  * dist::Float32}` (/root/reference/src/iddist.jl:14-17); we carry the
  * max-score dual (BM25 ≡ k-NN under `NegativeDistanceHack`,
  * /root/reference/src/dist/hacks.jl:13-17) as [[ScoredDoc]], and batch
  * results — the reference's (k, m) IdDist matrix
  * (/root/reference/src/SimilaritySearch.jl:144-147) — as exploded
  * [[QueryHit]] rows `(query_id, rnk, doc_id, score)`.
  */
object Types {

  /** One web page, the north-rule input shape
    * (url, warc_ts, html, text, lang). `text` must be byte-identical to
    * the reference extractor's output for the same `url` on every run.
    */
  final case class Page(
      url: String,
      warc_ts: java.sql.Timestamp,
      html: Array[Byte],
      text: String,
      lang: String)

  /** A document after docId assignment (reference ids are positional
    * UInt32, /root/reference/src/iddist.jl:15; ours are the stable
    * `doc_id` of the corpus table).
    */
  final case class Doc(doc_id: Long, text: String, lang: String)

  /** A term query: the analogue of one query object in `searchbatch`
    * (/root/reference/src/SimilaritySearch.jl:163-190).
    */
  final case class TermQuery(query_id: Int, terms: Seq[String], k: Int)

  /** (id, score) pair — the `IdDist` dual. Scores are Doubles
    * end-to-end; they are rounded once, at the output boundary, to make
    * rank + hash comparison stable across engines (see
    * [[graft.functions.BM25.roundScore]]).
    */
  final case class ScoredDoc(doc_id: Long, score: Double)

  /** One output row of a top-k result, rank 1..k ordered by
    * (score DESC, doc_id ASC) — the pinned tie rule of SURVEY.md §2.2
    * (reference: `lt(DistOrder,a,b) = a.dist < b.dist`,
    * /root/reference/src/iddist.jl:41, with insertion order = ascending
    * id breaking ties).
    */
  final case class QueryHit(query_id: Int, rnk: Int, doc_id: Long, score: Double)

  /** A sealed posting list for one term within one doc-range shard —
    * the analogue of the reference's frozen CSR adjacency
    * `StaticAdjList{offset, end_point}`
    * (/root/reference/src/adj/adjstatic.jl:5-8), compressed:
    * doc ids are delta-gapped + VByte ([[graft.functions.VByte]]),
    * term frequencies VByte'd, and per-block metadata carries
    * `(last_doc, max_tfn)` where `max_tfn` is the idf-independent part
    * of the BM25 contribution — multiply by idf(term) at query time to
    * get the Block-Max WAND bound.
    *
    * Sharding: postings are partitioned by doc-id range (`shard`), so a
    * 10^12-doc corpus spreads each term's postings over many shards and
    * query evaluation parallelises over shards (partial top-k per shard
    * merged exactly — the reference's `ParallelExhaustiveSearch`
    * partial/merge pattern, /root/reference/src/parallel-exhaustive.jl:44-62).
    */
  final case class PostingList(
      shard: Int,
      term: String,
      df_local: Long,
      cf_local: Long,
      docs_enc: Array[Byte],
      tfs_enc: Array[Byte],
      block_last_doc: Array[Long],
      block_max_tfn: Array[Double],
      block_doc_off: Array[Int],
      block_tf_off: Array[Int])

  /** Per-shard document-length sidecar (the Lucene "norms" analogue):
    * sorted doc ids + their token counts, both VByte'd. WAND recomputes
    * the exact BM25 tf-normalization from (tf, dl, avgdl), so scores
    * are bit-equal to the exhaustive path.
    */
  final case class DocNorms(
      shard: Int,
      n_docs: Long,
      docs_enc: Array[Byte],
      dls_enc: Array[Byte])

  /** Global per-term statistics (df over the whole corpus → idf). */
  final case class TermStats(term: String, df: Long, cf: Long, idf: Double)

  /** Global corpus statistics. */
  final case class CorpusStats(n_docs: Long, avgdl: Double)

  /** Lineage row of the snapshot manifest — the Iceberg-style commit
    * record required by the north rule: (segment id, source partition
    * range, doc count, bytes). A build is resumable by diffing the
    * manifest against the shard list and re-running only missing shards.
    */
  /** `commit_seq` is a per-index monotonic commit counter and
    * `full_commit` marks commits covering a snapshot's FULL shard set:
    * together they let the manifest be APPEND-ONLY (crash-safe — a
    * commit never deletes earlier commit markers) while read-time
    * dedup ([[graft.index.IndexBuilder.readManifest]]) supersedes
    * stale rows: a full commit hides all earlier rows of its snapshot,
    * and per (snapshot, shard) the highest commit_seq wins.
    */
  final case class ManifestRow(
      snapshot_id: Long,
      segment_id: String,
      shard: Int,
      min_doc: Long,
      max_doc: Long,
      doc_count: Long,
      term_count: Long,
      postings_bytes: Long,
      parent_snapshot: Long,
      commit_seq: Long,
      full_commit: Boolean)

  /** Per-stage build metrics (north rule: "metrics emitted per stage");
    * the analogue of the reference's cost counters `costdist`/`costblk`
    * (/root/reference/src/pqueue/knnsorted.jl:10-13).
    */
  final case class StageMetric(
      snapshot_id: Long,
      stage: String,
      shard: Int,
      rows_in: Long,
      rows_out: Long,
      bytes_out: Long)
}
