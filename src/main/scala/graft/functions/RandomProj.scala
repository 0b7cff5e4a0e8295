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
    array(m.map(row => DotF64.dot(emb, lit(row))): _*)
  }

  /** DuckDB fragment: the same projection of `embExpr` (a DOUBLE[]
    * expression) as a list of list_dot_products against the identical
    * literal rows. Double.toString round-trips exactly, so both engines
    * multiply the same binary doubles.
    */
  def duckProjSql(embExpr: String, outDim: Int, inDim: Int): String = {
    val m = matrix(outDim, inDim)
    m.map(row => s"list_dot_product($embExpr, [${row.mkString(", ")}])")
      .mkString("[", ",\n        ", "]")
  }
}
