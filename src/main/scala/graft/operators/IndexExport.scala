package graft.operators

import graft.index.{IndexBuilder, IndexFormat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Q20 `sparse(adj)` export (/root/reference/src/adj/Adj.jl:108-157):
  * the sealed index flattened back to its relational dual — per-term
  * global stats derived by DECODING the segments (so the export also
  * round-trip-checks the codec against the tokenizer-side oracle).
  */
object IndexExport {

  def postingsExport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-export-").toString
    IndexBuilder.build(spark, sfDir, dir, numShards = 4)
    val out = IndexBuilder.loadPostings(spark, dir, Seq(1L))
      .flatMap { pl =>
        val (ds, ts) = IndexFormat.decodeAll(pl)
        Iterator.single((pl.term, pl.df_local, ts.sum, ds.head, ds.last))
      }
      .toDF("term", "df", "cf", "min_doc", "max_doc")
      .groupBy("term")
      .agg(sum("df").cast("long").as("df"), sum("cf").cast("long").as("cf"),
        min("min_doc").cast("long").as("min_doc"), max("max_doc").cast("long").as("max_doc"))
      .orderBy("term")
    // throwaway index per call: pin the (tiny) export, drop the dir
    try StreamingOps.localized(out) finally StreamingOps.deleteRec(dir)
  }

  val postingsExportOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id, t.term
      |  FROM documents, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t(term)
      |)
      |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
      |       CAST(count(*) AS BIGINT) AS cf,
      |       CAST(min(doc_id) AS BIGINT) AS min_doc,
      |       CAST(max(doc_id) AS BIGINT) AS max_doc
      |FROM tok GROUP BY term ORDER BY term""".stripMargin

  /** The snapshot manifest itself, oracle-checked: every lineage field
    * except the physical byte count is derivable from the corpus (doc
    * ranges per shard, doc counts, posting-list counts), so the commit
    * record the north rule requires is itself under the DuckDB gate.
    */
  def manifestExport(spark: SparkSession, sfDir: String, numShards: Int = 4): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-").toString
    IndexBuilder.build(spark, sfDir, dir, numShards = numShards)
    // the DEDUPED lineage view (append-only manifest; readManifest
    // supersedes stale rows) — the oracle checks the CURRENT lineage
    val out = IndexBuilder.readManifest(spark, dir).toDS()
      .select(col("shard").cast("int"), col("min_doc").cast("long"),
        col("max_doc").cast("long"), col("doc_count").cast("long"),
        col("term_count").cast("long"))
      .orderBy("shard")
    try StreamingOps.localized(out) finally StreamingOps.deleteRec(dir)
  }

  /** Doc stats come from `documents` DIRECTLY (not the tokenized rows):
    * the builder's manifest counts every doc via the norms sidecar,
    * including dl=0 docs whose text tokenizes to empty — deriving the
    * range from tok would silently drop those.
    */
  def manifestExportOracleSql(numShards: Int = 4): String =
    s"""WITH ss AS (
       |  SELECT CAST((max(doc_id) + $numShards) // $numShards AS BIGINT) AS shard_size
       |  FROM documents
       |), ds AS (
       |  SELECT CAST(doc_id // ss.shard_size AS INTEGER) AS shard,
       |         CAST(min(doc_id) AS BIGINT) AS min_doc,
       |         CAST(max(doc_id) AS BIGINT) AS max_doc,
       |         CAST(count(*) AS BIGINT) AS doc_count
       |  FROM documents CROSS JOIN ss GROUP BY 1
       |), tok AS (
       |  SELECT doc_id, t.term
       |  FROM documents, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t(term)
       |), tc AS (
       |  SELECT CAST(doc_id // ss.shard_size AS INTEGER) AS shard,
       |         CAST(count(DISTINCT term) AS BIGINT) AS term_count
       |  FROM tok CROSS JOIN ss GROUP BY 1
       |)
       |SELECT ds.shard, ds.min_doc, ds.max_doc, ds.doc_count,
       |       CAST(COALESCE(tc.term_count, 0) AS BIGINT) AS term_count
       |FROM ds LEFT JOIN tc USING (shard) ORDER BY shard""".stripMargin

  /** Q19 `PermutedSearchIndex` (/root/reference/src/permindex.jl:10-32):
    * run the search in a permuted id layout (here p(i) = maxId − i, a
    * locality-reorder stand-in), then map ids back. The output must be
    * IDENTICAL to searching the original layout — the oracle is the
    * direct computation.
    */
  def permutedAllKnn(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    VectorOps.guardExact(spark, VectorOps.embCount(spark, sfDir))
    val emb = graft.corpus.Corpus.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val maxId = emb.agg(max("vec_id")).head().getLong(0)
    val permuted = emb.select((lit(maxId) - col("vec_id")).as("vec_id"), col("embedding"))
    val a = permuted.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = permuted.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.crossJoin(b)
      .select(col("a_id"), col("b_id"),
        VectorOps.distCol(col("a_emb"), col("b_emb")).as("dist"))
      // map BACK to original ids before ranking — the permutation must
      // be transparent, including tie-breaks on the ORIGINAL ids
      .select((lit(maxId) - col("a_id")).as("vec_id"),
        (lit(maxId) - col("b_id")).as("nbr_id"), col("dist"))
    VectorOps.topKByDist(pairs, k, "vec_id", "nbr_id").orderBy("vec_id", "rnk")
  }
}
