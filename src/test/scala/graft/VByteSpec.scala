package graft

import graft.functions.VByte
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Codec round-trip — the `StaticAdjList` freeze/thaw analog
  * (/root/reference/test/testadj.jl:7-46): encode∘decode = id on random
  * sorted arrays plus the adversarial shapes from FIXTURES.md §4
  * (empty, singleton, max-gap, dense runs).
  */
class VByteSpec extends AnyFunSuite {

  private def rt(xs: Array[Long]): Unit =
    assert(VByte.decodeSorted(VByte.encodeSorted(xs), xs.length).toSeq == xs.toSeq)

  test("round-trip: empty, singleton, dense run, max-gap") {
    rt(Array.empty[Long])
    rt(Array(0L))
    rt(Array(Long.MaxValue))
    rt((0L until 1000L).toArray)
    rt(Array(0L, Long.MaxValue))
    rt(Array(5L, 6L, 7L, 1L << 40, (1L << 40) + 1))
  }

  test("round-trip: random sorted sets across densities") {
    val rnd = new Random(42)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(2000)
      val span = 1L + rnd.nextInt(1 << 20)
      val xs = Iterator.continually(math.abs(rnd.nextLong()) % (span * n))
        .take(n * 2).toSeq.distinct.sorted.take(n).toArray
      rt(xs)
    }
  }

  test("plain (non-delta) round-trip for term frequencies") {
    val rnd = new Random(7)
    val xs = Array.fill(500)(rnd.nextInt(1000).toLong)
    assert(VByte.decodePlain(VByte.encodePlain(xs), xs.length).toSeq == xs.toSeq)
  }

  test("gap coding is compact: dense ids cost ~1 byte each") {
    val xs = (1000000L until 1002000L).toArray
    val enc = VByte.encodeSorted(xs)
    assert(enc.length <= xs.length + 4)
  }

  test("encodeSorted rejects unsorted and negative input") {
    intercept[IllegalArgumentException](VByte.encodeSorted(Array(3L, 2L)))
    intercept[IllegalArgumentException](VByte.encodeSorted(Array(2L, 2L)))
    intercept[IllegalArgumentException](VByte.encodeSorted(Array(-1L)))
  }
}
