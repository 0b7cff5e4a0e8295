package graft.functions

import graft.analysis.TextHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gaussian random projection (the reference's `RandomProjection` /
  * `GaussianRandomProjection`, /root/reference/src/special/proj.jl:13-70)
  * with a DETERMINISTIC matrix: entry (j, i) is Box–Muller over two
  * splitmix64 draws keyed by (j, i) — no RNG state, so every executor,
  * every run, and the DuckDB oracle see the exact same doubles.
  *
  * The matrix is generated once on the driver and embedded as LITERALS
  * in both engines' plans (16×64 doubles ≈ 1k literals — trivially
  * broadcast inside the serialized plan). Projection of one vector is
  * `outDim` codegen'd [[DotF64]] dots scaled by 1/√outDim, i.e. O(n·p·d)
  * work applied BEFORE any pair join — at 10^12 rows the projection is
  * a map-only column, never part of the shuffle.
  */
object RandomProj {

  /** Uniform in (0, 1) from a 64-bit hash (53-bit mantissa path). */
  private def toUnit(h: Long): Double =
    ((h >>> 11).toDouble + 0.5) / (1L << 53).toDouble

  /** Deterministic N(0,1) entry for (row j, col i). */
  def gaussian(j: Int, i: Int): Double = {
    val k = (j.toLong << 20) | i.toLong
    val u1 = toUnit(TextHash.splitmix64(2L * k))
    val u2 = toUnit(TextHash.splitmix64(2L * k + 1L))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** outDim × inDim projection matrix, rows scaled by 1/√outDim. */
  def matrix(outDim: Int, inDim: Int): Array[Array[Double]] = {
    val s = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, inDim)((j, i) => gaussian(j, i) * s)
  }

  /** Spark column: project `emb` (array<double>, length inDim) to an
    * array<double> of length outDim. One codegen'd dot per output dim.
    */
  def projCol(emb: Column, outDim: Int, inDim: Int): Column = {
    val m = matrix(outDim, inDim)
    array(m.toIndexedSeq.map(row => DotF64.dot(emb, lit(row))): _*)
  }

  /** DuckDB fragment: the same projection of `embExpr` (a DOUBLE[]
    * expression) as a list of list_dot_products against the identical
    * literal rows. Double.toString round-trips exactly, so both engines
    * multiply the same binary doubles.
    */
  def duckProjSql(embExpr: String, outDim: Int, inDim: Int): String =
    duckSql(matrix(outDim, inDim), embExpr)

  /** QR-orthonormalized variant (the reference's `qr` constructor,
    * /root/reference/src/special/proj.jl:23-32: QR of a uniform random
    * square matrix, Q truncated to the first outDim directions).
    * Expressed as modified Gram–Schmidt over deterministic splitmix64
    * uniforms — only the first outDim directions are ever needed, and
    * MGS of those columns spans the same subspace Julia's
    * `qr(...).Q[:, 1:outdim]` does. Orthonormal rows ⇒ the projection
    * is an isometry on the spanned subspace (unlike the Gaussian map,
    * which only preserves norms in expectation) — the property the
    * reference buys with the QR path.
    */
  def matrixQR(outDim: Int, inDim: Int): Array[Array[Double]] = {
    require(outDim <= inDim, s"qr projection needs outDim <= inDim ($outDim > $inDim)")
    val m = Array.tabulate(outDim, inDim)((j, i) =>
      toUnit(TextHash.splitmix64((j.toLong << 20) | i.toLong | (1L << 62))))
    var j = 0
    while (j < outDim) {
      var p = 0
      while (p < j) {
        var d = 0.0
        var i = 0
        while (i < inDim) { d += m(j)(i) * m(p)(i); i += 1 }
        i = 0
        while (i < inDim) { m(j)(i) -= d * m(p)(i); i += 1 }
        p += 1
      }
      var nrm = 0.0
      var i = 0
      while (i < inDim) { nrm += m(j)(i) * m(j)(i); i += 1 }
      nrm = math.sqrt(nrm)
      i = 0
      while (i < inDim) { m(j)(i) /= nrm; i += 1 }
      j += 1
    }
    m
  }

  /** Spark column for the QR variant — same literal-embedding shape as
    * [[projCol]].
    */
  def projQRCol(emb: Column, outDim: Int, inDim: Int): Column = {
    val m = matrixQR(outDim, inDim)
    array(m.toIndexedSeq.map(row => DotF64.dot(emb, lit(row))): _*)
  }

  def duckProjQRSql(embExpr: String, outDim: Int, inDim: Int): String =
    duckSql(matrixQR(outDim, inDim), embExpr)

  private def duckSql(m: Array[Array[Double]], embExpr: String): String =
    m.map(row => s"list_dot_product($embExpr, [${row.mkString(", ")}])")
      .mkString("[", ",\n        ", "]")
}
