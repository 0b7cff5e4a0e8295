package graft.operators

import graft.core.Types.ScoredDoc
import graft.queries.QuerySet
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 top-k via the partial/final [[BoundedTopKAggregator]] — the
  * reference's `ParallelExhaustiveSearch` semantics (Q2/Q3 in SURVEY.md
  * §2.1): per-partition bounded heaps merged exactly. Unlike the window
  * form (ExactSearch.topK) this never sorts more than k rows per
  * query-partition — at 10^12 docs the window's per-query sort of every
  * scored row is the bottleneck; the heap keeps O(k) state per
  * (partition, query).
  */
object TopKSearch {

  def topK(spark: SparkSession, sfDir: String, k: Int = QuerySet.K,
      queryTerms: DataFrame = null): DataFrame = {
    import spark.implicits._
    val qt = Option(queryTerms).getOrElse(ExactSearch.defaultQueryTerms(spark))
    val scored = ExactSearch.scoreAll(spark, sfDir, qt)
      .select(col("query_id").cast("int"), col("doc_id").cast("long"),
        col("score").cast("double"))
      .as[(Int, Long, Double)]
    val agg = new BoundedTopKAggregator(k)
    val hits = scored
      .groupByKey(_._1)
      .mapValues(t => ScoredDoc(t._2, t._3))
      .agg(agg.toColumn.name("hits"))
      .toDF("query_id", "hits")
    hits
      .select(col("query_id"), posexplode(col("hits")))
      .select(
        col("query_id").cast("int"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.doc_id").cast("long").as("doc_id"),
        col("col.score").cast("double").as("score"))
      .orderBy("query_id", "rnk")
  }
}
