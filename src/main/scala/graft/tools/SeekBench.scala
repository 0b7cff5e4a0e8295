package graft.tools

import graft.core.Types.PostingList
import graft.index.{IndexFormat, Wand}

/** Micro-bench for [[Wand.Cursor.seek]]'s block-boundary location on a
  * long posting list: `runMain graft.tools.SeekBench [blocks]`.
  *
  * Round-3 verdict item 5: the former linear walk over
  * `block_last_doc` is O(skipped blocks) per seek — hygiene at fixture
  * scale, real on a 10^5-block head-term list (10^12-doc corpora).
  * This tool isolates exactly the changed operation — locating the
  * first block whose last doc >= target — and times the linear walk
  * against `Arrays.binarySearch` at several skip strides, then runs
  * the REAL sealed-list `Cursor.seek` end-to-end (decode included) to
  * show the full-path effect. No Spark session: the cursor kernel is
  * executor-local JVM code, which is what makes it cheap to pin here.
  */
object SeekBench {

  private def sealLong(blocks: Int): PostingList = {
    val n = blocks * IndexFormat.BlockSize
    val docIds = Array.tabulate[Long](n)(i => i.toLong * 7L)
    val tfs = Array.fill[Long](n)(3L)
    val dls = Array.fill[Long](n)(40L)
    IndexFormat.seal(0, "head", docIds, tfs, dls, avgdl = 40.0)
  }

  private def minOf(reps: Int)(f: => Double): Double =
    (1 to reps).map(_ => f).min

  def main(args: Array[String]): Unit = {
    val blocks = if (args.length > 0) args(0).toInt else 100000
    val pl = sealLong(blocks)
    val lasts = pl.block_last_doc
    val nb = lasts.length
    println(s"[seekbench] list: $nb blocks, ${pl.df_local} postings")

    // the isolated boundary-location kernels (the only code the round-4
    // change touched): first b in (from, nb) with lasts(b) >= target
    def linLocate(from: Int, target: Long): Int = {
      var b = from + 1
      while (b < nb && lasts(b) < target) b += 1
      b
    }
    def binLocate(from: Int, target: Long): Int = {
      val p = java.util.Arrays.binarySearch(lasts, from + 1, nb, target)
      if (p >= 0) p else -(p + 1)
    }

    Seq(8, 128, 4096).foreach { stride =>
      val seeks = nb / stride - 1
      def pass(locate: (Int, Long) => Int): Double = {
        val t0 = System.nanoTime()
        var b = 0
        var acc = 0L
        while (b + stride < nb) {
          val nxt = locate(b, lasts(b + stride - 1) + 1)
          acc += nxt
          b = nxt
        }
        require(acc != 0)
        (System.nanoTime() - t0).toDouble / seeks
      }
      // warmup + min-of-5 per kernel (JIT, branch predictor)
      (1 to 2).foreach { _ => pass(linLocate); pass(binLocate) }
      val lin = minOf(5)(pass(linLocate))
      val bin = minOf(5)(pass(binLocate))
      println(f"[seekbench] stride=$stride%5d blocks: linear $lin%9.1f ns/seek, " +
        f"binary $bin%6.1f ns/seek (${lin / bin}%7.1fx)")
    }

    // end-to-end: the real Cursor.seek (binary location + block decode)
    // at a long stride — decode of the landing block dominates, which
    // is the honest framing of how much the location change buys
    val stride = 4096
    def cursorPass(): Double = {
      val cost = new Wand.Costs
      val cur = new Wand.Cursor(pl, idf = 1.0, cost)
      val t0 = System.nanoTime()
      var b = 0
      var n = 0
      while (b + stride < nb && !cur.exhausted) {
        cur.seek(lasts(b + stride - 1) + 1)
        n += 1
        b += stride
      }
      (System.nanoTime() - t0).toDouble / n
    }
    (1 to 2).foreach(_ => cursorPass())
    val full = minOf(5)(cursorPass())
    println(f"[seekbench] real Cursor.seek (locate+decode), stride=$stride: $full%.1f ns/seek")
  }
}
