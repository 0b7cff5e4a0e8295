package graft.queries

import graft.core.Types.TermQuery

/** The fixed reference query set — the analogue of the reference's
  * deterministic test queries (`queries = rand(db, 100)` with a seeded
  * generator, /root/reference/test/testseq.jl:26). Terms are drawn from
  * the corpus's closed vocabulary: a mix of head terms (exercises
  * block-max pruning where it pays — SURVEY.md §7.3 "head terms are
  * exactly where block-max pruning pays"), the rare `dup` marker, and
  * one absent term (empty-result behavior: we emit fewer rows, the
  * reference pads with zero ids, /root/reference/src/SimilaritySearch.jl:142).
  *
  * Declared once here and rendered into BOTH the Spark plan and the
  * DuckDB oracle SQL (as a VALUES list), so the two engines see
  * literally the same queries.
  */
object QuerySet {
  val K: Int = 10

  val queries: Seq[TermQuery] = Seq(
    TermQuery(0, Seq("spark"), K),
    TermQuery(1, Seq("dup"), K),
    TermQuery(2, Seq("spark", "join"), K),
    TermQuery(3, Seq("hash", "join", "merge"), K),
    TermQuery(4, Seq("the", "fast", "query"), K),
    TermQuery(5, Seq("window", "order", "sort", "scan"), K),
    TermQuery(6, Seq("customer", "order", "line", "part", "value"), K),
    TermQuery(7, Seq("dup", "spark"), K),
    TermQuery(8, Seq("nosuchterm"), K),
    TermQuery(9, Seq("big", "data", "table"), K),
    TermQuery(10, Seq("stream", "batch"), K),
    TermQuery(11, Seq("vector", "column", "row"), K),
    TermQuery(12, Seq("a", "the"), K),
    TermQuery(13, Seq("slow", "query", "filter"), K),
    TermQuery(14, Seq("group", "agg", "key"), K),
    TermQuery(15, Seq("small", "big", "fast", "slow"), K),
    TermQuery(16, Seq("merge", "sort", "scan", "hash", "join"), K),
    TermQuery(17, Seq("dup", "window"), K),
    TermQuery(18, Seq("table", "scan", "filter", "column", "value"), K),
    TermQuery(19, Seq("key", "value", "stream"), K)
  )

  /** Flat (query_id, term) pairs. Terms within a query are distinct. */
  def flatTerms: Seq[(Int, String)] =
    queries.flatMap(q => q.terms.map(t => (q.query_id, t)))

  /** DuckDB VALUES list: `(query_id, term)` rows, aliased `q`. */
  def duckdbValuesSql: String = {
    val rows = flatTerms
      .map { case (id, t) => s"($id, '$t')" }
      .mkString(", ")
    s"(VALUES $rows) AS q(query_id, term)"
  }
}
