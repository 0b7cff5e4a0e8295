package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of driver-visible queries and their DuckDB oracles.
  * One entry per implemented operator from SURVEY.md §2; the driver
  * compares each against its oracle SQL at sf0.01 (CORRECTNESS gate).
  */
object Registry {

  type Q = (SparkSession, String) => DataFrame

  /** name → (spark, sfDir) => result. Names sort in execution order. */
  def queries: Map[String, Q] = Map(
    "q01_bm25_exact" -> ((s, dir) => graft.operators.ExactSearch.topK(s, dir)),
    "q02_bm25_topk_agg" -> ((s, dir) => graft.operators.TopKSearch.topK(s, dir)),
    "q03_bm25_wand" -> ((s, dir) => graft.index.Wand.topKOnCorpus(s, dir))
  )

  /** name → DuckDB SQL over the same sfDir parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "q01_bm25_exact" -> graft.operators.ExactSearch.oracleSql(),
    "q02_bm25_topk_agg" -> graft.operators.ExactSearch.oracleSql(),
    "q03_bm25_wand" -> graft.operators.ExactSearch.oracleSql()
  )
}
