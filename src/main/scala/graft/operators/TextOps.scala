package graft.operators

import graft.analysis.{TextHash, Tokenizer}
import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline text operators over `documents` — the
  * web-scale complement of the reference's dedup/quality machinery
  * (`neardup`, /root/reference/src/neardup.jl; set distances,
  * /root/reference/src/dist/sets.jl): exact dedup, shingle-Jaccard
  * near-dup, MinHash-LSH and SimHash sketches, language id, quality
  * scoring, token accounting, fingerprinting.
  *
  * Scale shapes: everything is explode → hash-agg → (broadcast/equi)
  * join; pair generation only ever happens through an inverted
  * (shingle → docs) join or an LSH bucket join — never a cross join.
  */
object TextOps {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private val toks: Column = Tokenizer.tokensCol(col("text"))

  // ---------------------------------------------------------------- exact dedup

  /** Exact dedup by content hash: each doc mapped to the canonical
    * (smallest doc_id) holder of its md5(text) — hash-groupBy, the
    * degenerate ε=0 neardup.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id"), md5(col("text")).as("h"))
    val canon = d.groupBy("h").agg(min("doc_id").as("canonical_id"))
    d.join(canon, "h")
      .select(col("doc_id").cast("long"), col("canonical_id").cast("long"))
      .orderBy("doc_id")
  }

  val dedupExactOracleSql: String =
    """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
      |c AS (SELECT h, min(doc_id) AS canonical_id FROM d GROUP BY h)
      |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
      |       CAST(c.canonical_id AS BIGINT) AS canonical_id
      |FROM d JOIN c USING (h) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- shingles

  /** Distinct 3-token shingles per doc. Tokenize ONCE into a column,
    * then index it — inlining the tokenizer into the transform lambda
    * re-splits the full text 3× per shingle position (measured ~5× on
    * the whole operator at sf0.1).
    */
  def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), array_distinct(
        when(size(col("t")) >= 3,
          expr("transform(sequence(1, size(t) - 2), " +
            "i -> concat(t[i-1], ' ', t[i], ' ', t[i+1]))"))
          .otherwise(array().cast("array<string>"))).as("shingles"))

  /** DuckDB fragment: (doc_id, shingles LIST) with 1-based subscripts. */
  private val duckShinglesSql: String =
    """SELECT doc_id,
      |  list_distinct(CASE WHEN len(t) >= 3
      |    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
      |    ELSE [] END) AS shingles
      |FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      |      FROM documents)""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs (J ≥ tau, a < b) through the
    * inverted shingle join — the two-pointer `intersectionsize` kernel
    * (/root/reference/src/dist/sets.jl:11-29) as a relational plan.
    */
  def jaccardPairs(spark: SparkSession, sfDir: String, tau: Double = 0.5): DataFrame = {
    val sh = docShingles(spark, sfDir)
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val pairs = inv.as("x").join(inv.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("a").cast("long"), col("b").cast("long"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4)
          .cast("double").as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("a", "b")
  }

  def jaccardPairsOracleSql(tau: Double = 0.5): String =
    s"""WITH sh AS ($duckShinglesSql),
       |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
       |  FROM inv x JOIN inv y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |  GROUP BY x.doc_id, y.doc_id
       |)
       |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       |       CAST(round(inter / (sa.n + sb.n - inter), 4) AS DOUBLE) AS jaccard
       |FROM pairs JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
       |WHERE round(inter / (sa.n + sb.n - inter), 4) >= $tau
       |ORDER BY a, b""".stripMargin

  // ---------------------------------------------------------------- minhash LSH

  val MinhashHashes = 128
  val MinhashBands = 32 // 32 bands × 4 rows: P(miss | J=0.8) ≈ 5e-8

  /** MinHash + LSH banding near-dup: signature → band buckets → bucket
    * join → exact-Jaccard verification ≥ tau. The sketch only
    * GENERATES candidates; the emitted pairs are exact-verified, so at
    * high tau the output coincides with [[jaccardPairs]] (the DuckDB
    * oracle) with failure probability ≪ 1e-8 on this corpus.
    */
  def minhashLsh(spark: SparkSession, sfDir: String, tau: Double = 0.5): DataFrame = {
    import spark.implicits._
    val nh = MinhashHashes
    val bands = MinhashBands
    val rowsPerBand = nh / bands
    val sh = docShingles(spark, sfDir).as[(Long, Seq[String])]
    val buckets = sh.flatMap { case (id, shingles) =>
      if (shingles.isEmpty) Iterator.empty
      else {
        val sig = TextHash.minhashSignature(shingles, nh)
        (0 until bands).iterator.map { b =>
          var h = b.toLong
          var r = 0
          while (r < rowsPerBand) {
            h = h * 0x100000001b3L + sig(b * rowsPerBand + r)
            r += 1
          }
          (h, id)
        }
      }
    }.toDF("bucket", "doc_id")
    val cands = buckets.as("x").join(buckets.as("y"), Seq("bucket"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // exact verification on the candidate pairs only
    val shDf = docShingles(spark, sfDir)
    val verified = cands
      .join(shDf.select(col("doc_id").as("a"), col("shingles").as("sa")), "a")
      .join(shDf.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a").cast("long"), col("b").cast("long"),
        round(size(array_intersect(col("sa"), col("sb"))) /
          (size(col("sa")) + size(col("sb")) -
            size(array_intersect(col("sa"), col("sb")))), 4)
          .cast("double").as("jaccard"))
      .filter(col("jaccard") >= tau)
    verified.orderBy("a", "b")
  }

  // ---------------------------------------------------------------- simhash

  /** SimHash near-dup: 64-bit tf-weighted signature, candidates via
    * chunk banding with `maxHamming + 1` chunks (pigeonhole: ≤ h bit
    * flips leave at least one of h+1 chunks intact — EXACT recall),
    * exact hamming filter — the reference's bit-distance family
    * (/root/reference/src/dist/bits.jl:18-29) as a sketch join.
    */
  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming < 64)
    val sigs = docs(spark, sfDir)
      .select(col("doc_id"), toks.as("t"))
      .as[(Long, Seq[String])]
      .map { case (id, ts) =>
        val tf = ts.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
        (id, TextHash.simhash64(tf))
      }.toDF("doc_id", "sig")
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until nChunks).map { c =>
        val lo = bounds(c)
        val width = bounds(c + 1) - lo
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), lo).bitwiseAND(mask).as("v"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk"), col("ck.v"))
    val cands = chunks.as("x").join(chunks.as("y"), Seq("chunk", "v"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.sig").as("siga"),
        col("y.doc_id").as("b"), col("y.sig").as("sigb"))
      .distinct()
    cands
      .select(col("a").cast("long"), col("b").cast("long"),
        bit_count(col("siga").bitwiseXOR(col("sigb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  // ---------------------------------------------------------------- language id

  /** N-gram-heuristic language ID: token-unigram naive Bayes with
    * add-1 smoothing, profiles LEARNED from the corpus' own labels,
    * prediction = argmax of the rounded log-score (ties → lang asc).
    * Train + predict is a pure relational plan in both engines.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Corpus.documents(spark, sfDir).select(col("doc_id"), col("text"), col("lang"))
    val tokens = d.select(col("doc_id"), col("lang"), explode(toks).as("term"))
    val vocabSize = tokens.select("term").distinct().count()
    val langTotals = tokens.groupBy("lang").agg(count(lit(1)).as("lang_tokens"))
    val langDocs = d.groupBy("lang").agg(count(lit(1)).as("lang_docs"))
    val nDocs = d.count()
    val termCounts = tokens.groupBy("lang", "term").agg(count(lit(1)).as("c"))
    val tf = d.select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // score(doc, lang) = ln(langDocs/N) + Σ_t tf · ln((c+1)/(langTokens+V))
    val probs = termCounts
      .join(langTotals, "lang")
      .select(col("lang"), col("term"),
        log((col("c") + 1.0) / (col("lang_tokens") + vocabSize.toDouble)).as("lp"))
    val missing = langTotals
      .select(col("lang"),
        log(lit(1.0) / (col("lang_tokens") + vocabSize.toDouble)).as("lp_missing"))
    val scored = tf
      .crossJoin(broadcast(langTotals.select("lang")))
      .join(probs, Seq("lang", "term"), "left")
      .join(broadcast(missing), "lang")
      .groupBy("doc_id", "lang")
      .agg(sum(col("tf") * coalesce(col("lp"), col("lp_missing"))).as("ll"))
      .join(broadcast(langDocs), "lang")
      .select(col("doc_id"), col("lang"),
        round(col("ll") + log(col("lang_docs") / nDocs.toDouble), 4).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id").cast("long"), col("lang").as("pred_lang"),
        col("score").cast("double"))
      .orderBy("doc_id")
  }

  val langIdOracleSql: String =
    """WITH tok AS (
      |  SELECT d.doc_id, d.lang, t.term
      |  FROM documents d, unnest(list_filter(string_split(lower(d.text), ' '), x -> x <> '')) AS t(term)
      |), v AS (SELECT CAST(count(DISTINCT term) AS DOUBLE) AS vocab FROM tok),
      |lt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS lang_tokens FROM tok GROUP BY lang),
      |ld AS (SELECT lang, CAST(count(*) AS DOUBLE) AS lang_docs FROM documents GROUP BY lang),
      |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |tc AS (SELECT lang, term, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY lang, term),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY doc_id, term),
      |scored AS (
      |  SELECT tf.doc_id, l.lang,
      |    round(sum(tf.tf * ln((COALESCE(tc.c, 0) + 1.0) / (l.lang_tokens + v.vocab)))
      |          + ln(min(ld.lang_docs) / min(nd.n)), 4) AS score
      |  FROM tf CROSS JOIN lt l CROSS JOIN v CROSS JOIN nd
      |  JOIN ld ON ld.lang = l.lang
      |  LEFT JOIN tc ON tc.lang = l.lang AND tc.term = tf.term
      |  GROUP BY tf.doc_id, l.lang
      |), r AS (
      |  SELECT doc_id, lang, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
      |  FROM scored
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang AS pred_lang, CAST(score AS DOUBLE) AS score
      |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- quality + counts

  /** Heuristic quality scoring: type-token ratio, stopword ratio,
    * length saturation — each a Spark built-in expression.
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("t"))
      .select(
        col("doc_id").cast("long"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"),
        (size(array_distinct(col("t"))) / size(col("t")).cast("double")).as("ttr_raw"),
        (size(filter(col("t"), x => x === "the" || x === "a")) /
          size(col("t")).cast("double")).as("stop_raw"))
      // composite from UNROUNDED ratios: summing pre-rounded 4-dec terms
      // lands exactly on .00005 boundaries where Spark (decimal-string
      // HALF_UP) and DuckDB (binary round) disagree; raw ratios only
      // produce dyadic boundary values, on which both engines agree
      .withColumn("quality",
        round(lit(0.4) * col("ttr_raw") + lit(0.3) * (lit(1.0) - col("stop_raw")) +
          lit(0.3) * least(lit(1.0), col("n_tokens") / 100.0), 4))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("ttr_raw"), 4).as("ttr"), round(col("stop_raw"), 4).as("stop_ratio"),
        col("quality"))
      .orderBy("doc_id")

  val qualityScoreOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
      |         CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
      |         len(list_distinct(t)) / CAST(len(t) AS DOUBLE) AS ttr_raw,
      |         len(list_filter(t, x -> x = 'the' OR x = 'a')) / CAST(len(t) AS DOUBLE) AS stop_raw
      |  FROM t
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, n_distinct,
      |       CAST(round(ttr_raw, 4) AS DOUBLE) AS ttr,
      |       CAST(round(stop_raw, 4) AS DOUBLE) AS stop_ratio,
      |       CAST(round(0.4 * ttr_raw + 0.3 * (1.0 - stop_raw)
      |            + 0.3 * least(1.0, n_tokens / 100.0), 4) AS DOUBLE) AS quality
      |FROM m ORDER BY doc_id""".stripMargin

  /** Token accounting: whitespace tokens, BPE-ish subword estimate
    * (⌈len/4⌉ pieces per token), characters.
    */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"), toks.as("t"), length(col("text")).as("chars"))
      .select(
        col("doc_id").cast("long"),
        size(col("t")).cast("long").as("ws_tokens"),
        aggregate(transform(col("t"), x => ceil(length(x) / lit(4.0)).cast("long")),
          lit(0L), (acc, v) => acc + v).cast("long").as("subwords"),
        col("chars").cast("long"))
      .orderBy("doc_id")

  val tokenCountOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t,
      |         length(text) AS chars
      |  FROM documents
      |)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(len(t) AS BIGINT) AS ws_tokens,
      |       CAST(list_sum([CAST(ceil(length(x) / 4.0) AS BIGINT) FOR x IN t]) AS BIGINT) AS subwords,
      |       CAST(chars AS BIGINT) AS chars
      |FROM t ORDER BY doc_id""".stripMargin

  /** Document fingerprint: md5 of the sorted distinct token set (the
    * cross-engine form) + a rolling order-sensitive 64-bit hash
    * (JVM-only; excluded from the oracle columns).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        md5(array_join(array_sort(array_distinct(toks)), " ")).as("fingerprint"))
      .select(col("doc_id").cast("long"), col("fingerprint"))
      .orderBy("doc_id")

  val fingerprintOracleSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       md5(array_to_string(list_sort(list_distinct(
      |         list_filter(string_split(lower(text), ' '), x -> x <> ''))), ' ')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin
}
