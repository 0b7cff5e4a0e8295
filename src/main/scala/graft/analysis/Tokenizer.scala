package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic tokenization — the per-row invariant of the north rule
  * ("tokenization determinism"): same input bytes → identical term
  * sequence on every run, partitioning, and engine.
  *
  * The rule is intentionally minimal and frozen: lowercase, split on
  * runs of ASCII space, drop empty tokens. It is expressed with Spark
  * built-ins only (codegen'd, no UDF) and mirrored exactly by the
  * DuckDB oracle fragment [[duckdbTokensSql]]. The reference has no
  * tokenizer (objects are vectors); this is the analogue of its fixed
  * `eltype` contract (/root/reference/src/db/db.jl:26) — the "schema"
  * of a document is its token sequence.
  */
object Tokenizer {

  /** Token array column from a text column. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= lit(""))

  /** Explode docs into (doc_id, dl, term) with doc length attached —
    * dl is computed from the array, NOT via a second shuffle
    * (SURVEY.md §7: tf and dl come out of ONE aggregation).
    */
  def explodeTerms(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      tokensCol(col("text")).as("toks"))
    toks
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
  }

  /** (doc_id, dl, term, tf) — one shuffle: groupBy(doc_id, dl, term);
    * dl is functionally dependent on doc_id so the extra key is free.
    */
  def termFrequencies(docs: DataFrame): DataFrame =
    explodeTerms(docs)
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** DuckDB fragment producing (doc_id, term) rows from `documents`. */
  val duckdbTokensSql: String =
    "SELECT doc_id, t.term FROM documents, " +
      "unnest(string_split(lower(text), ' ')) AS t(term) WHERE t.term <> ''"
}
