package graft

import graft.operators.{ExactSearch, TopKSearch}
import org.scalatest.funsuite.AnyFunSuite

/** Rank-identity between the window-based exact top-k (the ground
  * truth, reference `ExhaustiveSearch`) and the aggregator path
  * (reference `ParallelExhaustiveSearch`) — the `macrorecall`-vs-gold
  * pattern (/root/reference/test/testsearchgraph.jl:63) tightened to
  * full equality per SURVEY.md §5.
  */
class SearchParitySpec extends AnyFunSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int, Long, Double)] =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("aggregator top-k ≡ window top-k on sf0.001, all queries") {
    val spark = TestSpark.spark
    val exact = rows(ExactSearch.topK(spark, TestSpark.Sf0001))
    val agg = rows(TopKSearch.topK(spark, TestSpark.Sf0001))
    assert(exact.nonEmpty)
    assert(agg == exact)
  }

  test("driver contract: entry() returns rows on sf0.001; registry names align with oracles") {
    val spark = TestSpark.spark
    assert(graft.SparkEntry.entry(spark).count() > 0)
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
  }

  test("absent-term query returns zero rows (fewer-than-k semantics)") {
    val spark = TestSpark.spark
    val exact = rows(ExactSearch.topK(spark, TestSpark.Sf0001))
    assert(!exact.exists(_._1 == 8), "query 8 (nosuchterm) must be empty")
    // and every present query returns exactly k or fewer, ranks 1..n
    exact.groupBy(_._1).foreach { case (_, hits) =>
      assert(hits.map(_._2).sorted == (1 to hits.length))
      assert(hits.length <= graft.queries.QuerySet.K)
    }
  }
}
