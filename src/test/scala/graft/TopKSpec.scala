package graft

import graft.operators.TopK
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Golden-model property tests for the bounded top-k buffer — the
  * transfer of the reference's container suite
  * (/root/reference/test/testresults.jl:20-121): streams of random
  * pushes for several k, compared element-by-element against a
  * sorted-list model, with forced score collisions exercising the tie
  * rule, plus merge associativity (the partial/final contract).
  */
class TopKSpec extends AnyFunSuite {

  /** The model: keep everything, sort by (score DESC, id ASC), take k. */
  private def model(items: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    items.distinct.sortBy { case (id, s) => (-s, id) }.take(k)

  private def run(items: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] = {
    val st = items.foldLeft(TopK.empty(k)) { case (s, (id, sc)) => TopK.insert(s, id, sc) }
    TopK.result(st).map(h => (h.doc_id, h.score))
  }

  private val ks = Seq(1, 7, 8, 12, 15, 67)

  test("matches sorted-list model on random streams (reference testresults.jl pattern)") {
    val rnd = new Random(42)
    for (k <- ks; trial <- 1 to 5) {
      val n = 1000
      val ids = rnd.shuffle((0L until n.toLong).toList)
      val items = ids.map(id => (id, rnd.nextDouble()))
      assert(run(items, k) == model(items, k), s"k=$k trial=$trial")
    }
  }

  test("tie rule: equal scores resolved by ascending doc_id, arrival-order independent") {
    val rnd = new Random(7)
    for (k <- ks) {
      // scores drawn from a tiny grid → massive collisions
      val items = (0L until 500L).map(id => (id, (rnd.nextInt(5) + 1) / 10.0))
      val shuffled = rnd.shuffle(items.toList)
      assert(run(items, k) == model(items, k), s"k=$k in-order")
      assert(run(shuffled, k) == model(items, k), s"k=$k shuffled arrival")
    }
  }

  test("frontier rejection is strict: an equal-worst item with larger id does not enter") {
    val st = TopK.empty(2)
    TopK.insert(st, 5L, 1.0)
    TopK.insert(st, 3L, 0.5)
    TopK.insert(st, 9L, 0.5) // equal score, larger id than worst(3) → reject
    assert(TopK.result(st).map(_.doc_id) == Seq(5L, 3L))
    TopK.insert(st, 1L, 0.5) // equal score, smaller id → replaces 3
    assert(TopK.result(st).map(_.doc_id) == Seq(5L, 1L))
  }

  test("threshold = -inf until full, then k-th best (covradius dual)") {
    val st = TopK.empty(3)
    assert(TopK.threshold(st).isNegInfinity)
    TopK.insert(st, 1L, 5.0); TopK.insert(st, 2L, 3.0)
    assert(TopK.threshold(st).isNegInfinity)
    TopK.insert(st, 3L, 4.0)
    assert(TopK.threshold(st) == 3.0)
    TopK.insert(st, 4L, 6.0)
    assert(TopK.threshold(st) == 4.0)
  }

  test("merge of arbitrary splits equals single-stream result (partial/final contract)") {
    val rnd = new Random(13)
    for (k <- Seq(1, 8, 67); trial <- 1 to 3) {
      val items = (0L until 800L).map(id => (id, rnd.nextInt(50) / 10.0))
      val whole = run(items, k)
      val parts = rnd.shuffle(items.toList).grouped(97).toList
      val states = parts.map(p =>
        p.foldLeft(TopK.empty(k)) { case (s, (id, sc)) => TopK.insert(s, id, sc) })
      val merged = states.reduce(TopK.merge)
      assert(TopK.result(merged).map(h => (h.doc_id, h.score)) == whole, s"k=$k trial=$trial")
    }
  }

  test("fewer than k items → all returned, sorted") {
    val st = TopK.empty(10)
    TopK.insert(st, 2L, 1.0); TopK.insert(st, 1L, 2.0)
    assert(TopK.result(st).map(_.doc_id) == Seq(1L, 2L))
  }
}
