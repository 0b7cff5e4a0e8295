package graft.index

import graft.core.Types.{DocNorms, PostingList}
import graft.functions.{BM25, VByte}
import scala.collection.mutable.ArrayBuffer

/** Physical segment format + seal/decode kernels.
  *
  * A sealed posting list (one term within one doc-range shard) is the
  * analogue of the reference's frozen CSR adjacency
  * (`StaticAdjList(adj)`, /root/reference/src/adj/adjstatic.jl:25-46):
  * doc ids sorted, delta-gap + VByte compressed in independent blocks
  * of [[BlockSize]] entries (each block restarts the delta chain with
  * an absolute first id, so a block is decodable without touching its
  * predecessors — that is what makes Block-Max WAND's block skipping
  * possible). Per block we keep `(last_doc, max_tfn, byte offsets)`
  * where `max_tfn` is the idf-independent BM25 part ([[BM25.tfNorm]]);
  * idf(term) × max_tfn is the block's score upper bound — the
  * `covradius`-pruning dual
  * (/root/reference/src/searchgraph/beamsearch.jl:52).
  */
object IndexFormat {

  val BlockSize = 128

  /** Seal one term's postings within one shard. `docIds` MUST be
    * strictly ascending (guaranteed by the build's sort-within-
    * partitions; enforced here like `encodeSorted`).
    */
  def seal(shard: Int, term: String, docIds: Array[Long], tfs: Array[Long],
      dls: Array[Long], avgdl: Double): PostingList = {
    val n = docIds.length
    require(n > 0, s"empty postings for term=$term")
    val nBlocks = (n + BlockSize - 1) / BlockSize
    val docBytes = new ArrayBuffer[Byte](n * 2)
    val tfBytes = new ArrayBuffer[Byte](n)
    val blockLast = new Array[Long](nBlocks)
    val blockMax = new Array[Double](nBlocks)
    val blockDocOff = new Array[Int](nBlocks)
    val blockTfOff = new Array[Int](nBlocks)
    var cf = 0L
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, n)
      blockDocOff(b) = docBytes.length
      blockTfOff(b) = tfBytes.length
      var maxTfn = 0.0
      var prev = 0L
      var i = start
      while (i < end) {
        val d = docIds(i)
        if (i == start) VByte.writeVarLong(docBytes, d)
        else {
          require(d > prev, s"postings not strictly sorted: $prev then $d (term=$term)")
          VByte.writeVarLong(docBytes, d - prev)
        }
        prev = d
        VByte.writeVarLong(tfBytes, tfs(i))
        cf += tfs(i)
        val tfn = BM25.tfNorm(tfs(i), dls(i), avgdl)
        if (tfn > maxTfn) maxTfn = tfn
        i += 1
      }
      blockLast(b) = docIds(end - 1)
      blockMax(b) = maxTfn
      b += 1
    }
    PostingList(shard, term, n.toLong, cf, docBytes.toArray, tfBytes.toArray,
      blockLast, blockMax, blockDocOff, blockTfOff)
  }

  def numBlocks(pl: PostingList): Int = pl.block_last_doc.length

  def blockLen(pl: PostingList, block: Int): Int = {
    val n = pl.df_local.toInt
    if (block < numBlocks(pl) - 1) BlockSize else n - block * BlockSize
  }

  /** Decode one block → (docIds, tfs). Independent of other blocks. */
  def decodeBlock(pl: PostingList, block: Int): (Array[Long], Array[Long]) = {
    val len = blockLen(pl, block)
    val docs = new Array[Long](len)
    val tfs = new Array[Long](len)
    var pos = pl.block_doc_off(block)
    var prev = 0L
    var i = 0
    while (i < len) {
      val (v, p) = VByte.readVarLong(pl.docs_enc, pos)
      pos = p
      prev = if (i == 0) v else prev + v
      docs(i) = prev
      i += 1
    }
    var tpos = pl.block_tf_off(block)
    i = 0
    while (i < len) {
      val (v, p) = VByte.readVarLong(pl.tfs_enc, tpos)
      tpos = p
      tfs(i) = v
      i += 1
    }
    (docs, tfs)
  }

  /** Full decode (tests + merge): (docIds, tfs). */
  def decodeAll(pl: PostingList): (Array[Long], Array[Long]) = {
    val n = pl.df_local.toInt
    val docs = new Array[Long](n)
    val tfs = new Array[Long](n)
    var b = 0
    var o = 0
    while (b < numBlocks(pl)) {
      val (d, t) = decodeBlock(pl, b)
      System.arraycopy(d, 0, docs, o, d.length)
      System.arraycopy(t, 0, tfs, o, t.length)
      o += d.length
      b += 1
    }
    (docs, tfs)
  }

  /** Seal a shard's doc-length sidecar; doc ids strictly ascending. */
  def sealNorms(shard: Int, docIds: Array[Long], dls: Array[Long]): DocNorms =
    DocNorms(shard, docIds.length.toLong,
      VByte.encodeSorted(docIds), VByte.encodePlain(dls))

  /** Decode a norms sidecar → (docIds sorted, dls). */
  def decodeNorms(n: DocNorms): (Array[Long], Array[Long]) =
    (VByte.decodeSorted(n.docs_enc, n.n_docs.toInt),
      VByte.decodePlain(n.dls_enc, n.n_docs.toInt))
}
