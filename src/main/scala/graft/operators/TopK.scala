package graft.operators

import graft.core.Types.ScoredDoc
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator — the engine's single shared kernel, the
  * dual of the reference's capacity-k queues `KnnHeap`
  * (/root/reference/src/pqueue/knnheap.jl:48-71) and `KnnSorted`
  * (/root/reference/src/pqueue/knnsorted.jl:91-118) under the
  * max-score ≡ min-distance bridge (`NegativeDistanceHack`,
  * /root/reference/src/dist/hacks.jl:13-17).
  *
  * Semantics (SURVEY.md §2.2, rank-identity-critical):
  *  - capacity k; heap root is the WORST kept item;
  *  - an incoming item replaces the root iff it is STRICTLY better —
  *    the mirror of the reference's
  *    `item.dist >= maximum(res) && return false`
  *    (/root/reference/src/pqueue/knnheap.jl:63);
  *  - "better" is the pinned total order (score DESC, doc_id ASC): the
  *    reference breaks score ties by arrival order, which in its
  *    deterministic ascending-id scan equals ascending doc_id
  *    (/root/reference/src/sequential-exhaustive.jl:61-64); making the
  *    id part of the comparator gives the same outcome independent of
  *    Spark's nondeterministic arrival order;
  *  - `covradius` (∞ until full, then k-th distance,
  *    /root/reference/src/pqueue/pqueue.jl:35) ≡ [[TopK.threshold]]:
  *    -∞ until full, then the k-th best score — the WAND θ.
  *
  * The buffer is a plain-arrays heap usable both imperatively (inside
  * the WAND traversal) and as a Spark [[Aggregator]] with
  * partial+final merge — the reference's `ParallelExhaustiveSearch`
  * per-thread-queue + lock-merge pattern
  * (/root/reference/src/parallel-exhaustive.jl:44-62), minus the lock
  * (Spark's partial aggregation replaces it).
  */
object TopK {

  /** The pinned total order: is (id1,s1) a strictly better hit? */
  @inline def better(id1: Long, s1: Double, id2: Long, s2: Double): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  /** Aggregation buffer; `k` travels with the state so `zero` needs no
    * closure capture on the executor side.
    */
  final case class State(k: Int, ids: Array[Long], scores: Array[Double], var size: Int)

  def empty(k: Int): State = {
    // k = 0 would make threshold/insert read scores(0) deep inside an
    // executor task — reject the capacity at construction instead
    require(k > 0, s"top-k capacity must be positive, got $k")
    State(k, new Array[Long](k), new Array[Double](k), 0)
  }

  /** WAND θ: -∞ until the buffer is full, then the k-th best score. */
  @inline def threshold(st: State): Double =
    if (st.size < st.k) Double.NegativeInfinity else st.scores(0)

  @inline private def isBetter(st: State, a: Int, b: Int): Boolean =
    better(st.ids(a), st.scores(a), st.ids(b), st.scores(b))

  @inline private def swap(st: State, a: Int, b: Int): Unit = {
    val ti = st.ids(a); st.ids(a) = st.ids(b); st.ids(b) = ti
    val ts = st.scores(a); st.scores(a) = st.scores(b); st.scores(b) = ts
  }

  private def siftUp(st: State, start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (isBetter(st, p, i)) { swap(st, p, i); i = p } else return
    }
  }

  private def siftDown(st: State, start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      if (l >= st.size) return
      val r = l + 1
      // child that must sit higher = the WORSE one
      val w = if (r < st.size && isBetter(st, l, r)) r else l
      if (isBetter(st, i, w)) { swap(st, i, w); i = w } else return
    }
  }

  /** Offer one item; returns the (possibly updated) state. */
  def insert(st: State, id: Long, score: Double): State = {
    if (st.size < st.k) {
      st.ids(st.size) = id
      st.scores(st.size) = score
      st.size += 1
      siftUp(st, st.size - 1)
    } else if (better(id, score, st.ids(0), st.scores(0))) {
      st.ids(0) = id
      st.scores(0) = score
      siftDown(st, 0)
    }
    st
  }

  /** Merge b into a (partial → final aggregation). */
  def merge(a: State, b: State): State = {
    var i = 0
    while (i < b.size) { insert(a, b.ids(i), b.scores(i)); i += 1 }
    a
  }

  /** Final ordering: (score DESC, doc_id ASC) — the reference's
    * `sortitems!` (/root/reference/src/pqueue/knnheap.jl:37-41) under
    * the negated-distance bridge.
    */
  def result(st: State): Seq[ScoredDoc] = {
    val out = new Array[ScoredDoc](st.size)
    var i = 0
    while (i < st.size) { out(i) = ScoredDoc(st.ids(i), st.scores(i)); i += 1 }
    out.sortWith((a, b) => better(a.doc_id, a.score, b.doc_id, b.score)).toSeq
  }
}

/** Typed partial/final top-k aggregator over pre-scored rows. */
final class BoundedTopKAggregator(k: Int)
    extends Aggregator[ScoredDoc, TopK.State, Seq[ScoredDoc]] {
  override def zero: TopK.State = TopK.empty(k)
  override def reduce(b: TopK.State, a: ScoredDoc): TopK.State =
    TopK.insert(b, a.doc_id, a.score)
  override def merge(b1: TopK.State, b2: TopK.State): TopK.State = TopK.merge(b1, b2)
  override def finish(r: TopK.State): Seq[ScoredDoc] = TopK.result(r)
  override def bufferEncoder: Encoder[TopK.State] = Encoders.product[TopK.State]
  override def outputEncoder: Encoder[Seq[ScoredDoc]] = ExpressionEncoder[Seq[ScoredDoc]]()
}
