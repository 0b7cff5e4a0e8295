package graft.analysis

/** Sequence distances with no SQL-expressible form (DP over positions)
  * — JVM kernels, property-gated in DistSpec rather than DuckDB-oracled
  * (DuckDB has levenshtein but no LCS).
  */
object SeqDist {

  /** LCS distance (/root/reference/src/dist/seqs.jl:127-132):
    * |a| + |b| − 2·LCS(a, b). Rolling-row DP, O(|a|·|b|) time,
    * O(min) space.
    */
  def lcsDistance(a: String, b: String): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = new Array[Int](s.length + 1)
    var cur = new Array[Int](s.length + 1)
    var j = 1
    while (j <= t.length) {
      var i = 1
      while (i <= s.length) {
        cur(i) =
          if (s.charAt(i - 1) == t.charAt(j - 1)) prev(i - 1) + 1
          else math.max(prev(i), cur(i - 1))
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    a.length + b.length - 2 * prev(s.length)
  }

  /** Common prefix length (/root/reference/src/dist/seqs.jl:10-27). */
  def commonPrefix(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }
}
