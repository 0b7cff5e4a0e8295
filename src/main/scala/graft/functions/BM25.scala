package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 scoring, shared by every path (exact SQL plan, aggregator path,
  * Block-Max WAND traversal) and mirrored verbatim in the DuckDB oracle
  * SQL — all three must agree rank-identically, the analogue of the
  * reference's exhaustive-search ground truth
  * (/root/reference/test/testsearchgraph.jl:24).
  *
  * Formula (Lucene/Robertson variant, non-negative idf):
  *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfn(t,d)   = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  *   score(q,d) = Σ_{t ∈ q} idf(t) * tfn(t,d)
  *
  * Floating point discipline (SURVEY.md §7.3): all math in Double, the
  * final per-(query,doc) sum rounded once to [[SCALE]] decimals at the
  * output boundary. Per-term contributions carry ~1e-16 relative error
  * (including cross-engine libm ln differences of ≤1 ulp); the 1e-4
  * rounding grid is ~12 orders of magnitude coarser, so Spark, the WAND
  * path, and DuckDB land on the same rounded value, and ranking by
  * (rounded score DESC, doc_id ASC) is engine-independent — the pinned
  * tie rule of SURVEY.md §2.2.
  */
object BM25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Decimal places of the output rounding grid. */
  val SCALE: Int = 4

  /** Scala-side idf, used when sealing/querying segments. */
  @inline def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  /** Scala-side idf-independent term contribution (the part whose
    * per-block max is stored in segment metadata).
    */
  @inline def tfNorm(tf: Long, dl: Long, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  @inline def contribution(tf: Long, dl: Long, avgdl: Double, idfVal: Double): Double =
    idfVal * tfNorm(tf, dl, avgdl)

  @inline def roundScore(s: Double): Double =
    // decimal HALF_UP on the double's shortest representation — the
    // SAME rule as Catalyst round() and the DuckDB oracle. The former
    // binary form (math.round(s * 1e4) / 1e4) disagrees with it on
    // values whose decimal form ends at the 5th place in 5 but whose
    // binary product lands just under the .5 grid point, which would
    // break JVM-path ≡ Catalyst-path rank identity on exactly those
    // boundary scores (same discipline as VectorOps.jvmDist).
    java.math.BigDecimal.valueOf(s)
      .setScale(SCALE, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** Column form of idf (inputs as columns; Doubles throughout). */
  def idfCol(nDocs: Column, df: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))

  /** Column form of the idf-independent tf normalization. */
  def tfNormCol(tf: Column, dl: Column, avgdl: Column): Column =
    (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))

  /** Column form of the full per-(term,doc) contribution. */
  def contributionCol(tf: Column, dl: Column, avgdl: Column, idfVal: Column): Column =
    idfVal * tfNormCol(tf, dl, avgdl)

  /** Round at the output boundary; matches DuckDB `round(x, 4)`. */
  def roundScoreCol(s: Column): Column = round(s, SCALE)

  /** The same formula as a DuckDB SQL fragment (for oracle generation);
    * placeholders are column references valid in the generated query.
    */
  def duckdbContributionSql(tf: String, dl: String, avgdl: String, n: String, df: String): String =
    s"ln(1.0 + ($n - $df + 0.5) / ($df + 0.5)) * " +
      s"($tf * ${K1 + 1.0}) / ($tf + $K1 * (${1.0 - B} + $B * $dl / $avgdl))"
}
