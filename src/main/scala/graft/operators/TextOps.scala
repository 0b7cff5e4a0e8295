package graft.operators

import graft.analysis.{TextHash, Tokenizer}
import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** [[docs]] rebalanced to the session's default parallelism BEFORE
    * any per-row derivation. A single-file corpus is ONE scan split,
    * and every narrow transform (tokenize, shingle, explode, window)
    * inherits that partitioning — without this the whole derivation
    * chain, and every localCheckpoint taken from it, runs on one task
    * (the serialization jaccardPairs' comment documents; measured up
    * to ~7× on the substring/shingle family, r6). The repartition is
    * scale-adaptive (defaultParallelism, never a constant) and moves
    * only the raw text — at cluster scale a many-split input makes it
    * a cheap rebalance rather than a bottleneck fix.
    *
    * Integer/string-derivation operators only: float-sum operators
    * (langId's log-likelihood sums) deliberately keep the scan
    * partitioning so partial-aggregation order — and with it last-ulp
    * rounding — stays exactly as oracled.
    */
  private def docsPar(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).repartition(spark.sparkContext.defaultParallelism)

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
    docShinglesFrom(docs(spark, sfDir))

  /** Injectable-docs form — callers that need the derivation itself to
    * run parallel pass a [[docsPar]]-rebalanced frame.
    */
  private[graft] def docShinglesFrom(docsDf: DataFrame): DataFrame =
    docsDf
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

  /** Document-frequency cap for the inverted shingle self-join: a
    * shingle shared by B docs emits B² candidate pairs, so one hot
    * boilerplate shingle ("click here to subscribe") makes the join
    * quadratic at web scale. Shingles with df > cap are dropped BEFORE
    * the join (standard near-dup practice; the oracle applies the same
    * cap, so the gate still hash-matches). Recall trade: a true pair is
    * missed only if ALL its shared shingles are boilerplate-hot — such
    * pairs are template dupes, which MinHash (q14, uncapped
    * verification) and exact dedup (q12) still cover. At fixture scale
    * the cap is df-neutral for real near-dups (J ≥ 0.5 pairs share many
    * rare shingles); at 10^12 docs set it as a fraction-of-corpus.
    */
  val ShingleDfCap = 64

  /** Exact n-gram Jaccard near-dup pairs (J ≥ tau, a < b): the
    * df-capped inverted shingle join GENERATES candidates (see
    * [[ShingleDfCap]]), then the emitted Jaccard is exact-verified over
    * the FULL shingle sets — the two-pointer `intersectionsize` kernel
    * (/root/reference/src/dist/sets.jl:11-29) as a relational plan.
    * Emitted values are therefore true Jaccards; the cap only bounds
    * which pairs can become candidates.
    */
  def jaccardPairs(spark: SparkSession, sfDir: String, tau: Double = 0.5,
      dfCap: Int = ShingleDfCap): DataFrame = {
    // materialize the shingle table ONCE (localCheckpoint = eager,
    // lineage-truncated): it feeds five downstream references (df agg,
    // both sides of the self-join, both verify joins) and tokenization
    // is the dominant linear cost — without this the plan re-tokenizes
    // the corpus per reference (measured ~5× on the whole operator).
    // The rebalance matters as much as the reuse, and it sits BEFORE
    // the derivation ([[docsPar]]): repartitioning the derived frame
    // would leave tokenize+shingle itself on the one scan split and
    // pay a second, wider shuffle of the shingle arrays.
    // At cluster scale the same reuse is a persist(DISK)/table write.
    val sh = docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint()
    val invAll = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    // the HOT side is the small one: shingles with df > cap are by
    // definition few (web boilerplate), so broadcast them and strip
    // their rows with a map-side anti-join — hot rows never reach a
    // reducer, which is the actual skew defense at web scale (a plain
    // equi-join on shingle would still route a boilerplate shingle's
    // 10^9 rows to one task before dropping them). df itself aggregates
    // with map-side combine, so the hot computation is skew-free too.
    val hot = invAll.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("shingle")
    val inv = invAll.join(broadcast(hot), Seq("shingle"), "left_anti")
    // shared-RARE-shingle count per pair: long-only rows through the
    // map-side-combinable groupBy — NO shingle arrays cross this join
    // (the naive candidates→array_intersect form paid ~50-element array
    // intersections on every one of the >10^6 pairs sharing ANY shingle)
    val pairs = inv.as("x").join(inv.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("ir"))
    // per-doc totals: n = |shingles|, nr = |rare shingles| ⇒ hot count n−nr
    val stats = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
      .join(inv.groupBy("doc_id").agg(count(lit(1)).as("nr")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n"), coalesce(col("nr"), lit(0L)).as("nr"))
    // Jaccard upper bound: true inter ≤ ir + min(hot_a, hot_b) and the
    // union shrinks accordingly — prefilter keeps a SUPERSET of every
    // pair whose ROUNDED exact Jaccard can reach tau (1e-4 slack covers
    // the round-up at the grid boundary), then the few survivors get the
    // exact array verification. With no hot shingles the bound IS the
    // exact Jaccard, so the verify set ≈ the output set.
    val pre = pairs
      .join(stats.select(col("doc_id").as("a"), col("n").as("na"), col("nr").as("ra")), "a")
      .join(stats.select(col("doc_id").as("b"), col("n").as("nb"), col("nr").as("rb")), "b")
      .withColumn("m", least(col("na") - col("ra"), col("nb") - col("rb")))
      .filter((col("ir") + col("m")).cast("double") >=
        lit(tau - 1e-4) * (col("na") + col("nb") - col("ir") - col("m")))
      .select("a", "b")
    verifyJaccard(pre, sh, tau).orderBy("a", "b")
  }

  /** Exact-Jaccard verification of candidate (a, b) pairs against the
    * full shingle sets (shared by [[jaccardPairs]] and [[minhashLsh]]).
    */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, tau: Double): DataFrame =
    cands
      .join(sh.select(col("doc_id").as("a"), col("shingles").as("sa")), "a")
      .join(sh.select(col("doc_id").as("b"), col("shingles").as("sb")), "b")
      .select(col("a").cast("long"), col("b").cast("long"),
        round(size(array_intersect(col("sa"), col("sb"))) /
          (size(col("sa")) + size(col("sb")) -
            size(array_intersect(col("sa"), col("sb")))), 4)
          .cast("double").as("jaccard"))
      .filter(col("jaccard") >= tau)

  /** Oracle: candidate pairs through the SAME df-capped inverted join
    * (or uncapped for the MinHash gate, whose banding is df-blind),
    * Jaccard from the full shingle lists.
    */
  def jaccardPairsOracleSql(tau: Double = 0.5,
      dfCap: Option[Int] = Some(ShingleDfCap)): String = {
    val capFilter = dfCap
      .map(c => s"WHERE shingle IN (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) <= $c)")
      .getOrElse("")
    s"""WITH sh AS ($duckShinglesSql),
       |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |inv AS (SELECT doc_id, shingle FROM inv0 $capFilter),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM inv x JOIN inv y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |),
       |pairs AS (
       |  SELECT a, b,
       |         len(list_intersect(sa.shingles, sb.shingles)) AS inter,
       |         szA.n AS na, szB.n AS nb
       |  FROM cands
       |  JOIN sh sa ON sa.doc_id = a JOIN sh sb ON sb.doc_id = b
       |  JOIN sizes szA ON szA.doc_id = a JOIN sizes szB ON szB.doc_id = b
       |)
       |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       |       CAST(round(inter / (na + nb - inter), 4) AS DOUBLE) AS jaccard
       |FROM pairs
       |WHERE round(inter / (na + nb - inter), 4) >= $tau
       |ORDER BY a, b""".stripMargin
  }

  // ---------------------------------------------------------------- minhash LSH

  val MinhashHashes = 128
  val MinhashBands = 32 // 32 bands × 4 rows: P(miss | J=0.8) ≈ 5e-8

  /** MinHash + LSH banding near-dup: signature → band buckets → bucket
    * join → exact-Jaccard verification ≥ tau. The sketch only
    * GENERATES candidates; the emitted pairs are exact-verified, so at
    * high tau the output coincides with [[jaccardPairs]] (the DuckDB
    * oracle) with failure probability ≪ 1e-8 on this corpus.
    */
  def minhashLsh(spark: SparkSession, sfDir: String, tau: Double = 0.5): DataFrame =
    // one materialization feeds both the signature pass and verification
    // (rebalance BEFORE derivation — see jaccardPairs / [[docsPar]])
    minhashLshFrom(spark,
      docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint(),
      tau)

  /** Injectable-shingle form, for callers that already hold a
    * materialized (doc_id, shingles) frame — [[cleanPipeline]] shares
    * ONE checkpointed frame between this and [[decontaminateFrom]]
    * rather than tokenizing + shingling the corpus twice.
    */
  private[graft] def minhashLshFrom(spark: SparkSession, shDf: DataFrame,
      tau: Double): DataFrame = {
    import spark.implicits._
    val nh = MinhashHashes
    val bands = MinhashBands
    val rowsPerBand = nh / bands
    val sh = shDf.as[(Long, Seq[String])]
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
    verifyJaccard(cands, shDf, tau).orderBy("a", "b")
  }

  // ---------------------------------------------------------------- simhash

  /** Per-doc 64-bit SimHash signature as TWO 32-bit halves (hi, lo) —
    * a PURE RELATIONAL plan: term hash = first/second 8 hex chars of
    * md5(term) (identical built-in in both engines), bit b's vote is
    * the tf-weighted ±1 sum, signature bit = vote > 0. Halves keep all
    * arithmetic inside signed-64 non-overflow range on both engines.
    * Explode factor is 32 bit-rows per (doc, term) — a linear,
    * shuffle-friendly map cost paid once per corpus.
    */
  def simhashSigs(spark: SparkSession, sfDir: String): DataFrame = {
    // rebalance before the explode ([[docsPar]]); all sums here are
    // integer (tf counts, ±tf votes), so partitioning cannot move a bit
    val tf = docsPar(spark, sfDir)
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val hashed = tf.select(col("doc_id"), col("tf"),
      conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(md5(col("term")), 9, 8), 16, 10).cast("long").as("lo"))
    hashed
      .select(col("doc_id"), col("tf"), col("hi"), col("lo"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("tf * (2 * (shiftright(lo, b) & 1) - 1)")).as("s_lo"),
        sum(expr("tf * (2 * (shiftright(hi, b) & 1) - 1)")).as("s_hi"))
      .groupBy("doc_id")
      .agg(sum(expr("IF(s_lo > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))")).as("sig_lo"),
        sum(expr("IF(s_hi > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))")).as("sig_hi"))
  }

  /** DuckDB fragment mirroring [[simhashSigs]]: (doc_id, sig_hi, sig_lo). */
  private val duckSimhashSigsSql: String =
    """SELECT doc_id,
      |  sum(CASE WHEN s_hi > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig_hi,
      |  sum(CASE WHEN s_lo > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS sig_lo
      |FROM (
      |  SELECT doc_id, b,
      |    sum(tf * (2 * ((lo >> b) & 1) - 1)) AS s_lo,
      |    sum(tf * (2 * ((hi >> b) & 1) - 1)) AS s_hi
      |  FROM (
      |    SELECT doc_id, tf,
      |      ('0x' || substr(md5(term), 1, 8))::BIGINT AS hi,
      |      ('0x' || substr(md5(term), 9, 8))::BIGINT AS lo
      |    FROM (
      |      SELECT doc_id, t.term, count(*) AS tf
      |      FROM documents, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t(term)
      |      GROUP BY doc_id, t.term
      |    )
      |  ), range(0, 32) r(b)
      |  GROUP BY doc_id, b
      |)
      |GROUP BY doc_id""".stripMargin

  /** SimHash near-dup: candidates via chunk banding with `maxHamming+1`
    * 16-bit chunks (pigeonhole: ≤ h bit flips leave at least one of h+1
    * chunks intact — EXACT recall), exact Hamming filter, plus the
    * reference's bit-distance family over the signatures: Hamming,
    * RogersTanimoto `1 − (tt+ff)/(tt+ff+2(tf+ft))`, RussellRao
    * `1 − tt/n` (/root/reference/src/dist/bits.jl:18-79). The oracle is
    * the unbanded n² form — the gate proves the banding loses nothing.
    */
  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64)
    val sigs = simhashSigs(spark, sfDir)
    // chunk c covers logical bits [c·64/(h+1), (c+1)·64/(h+1)) of the
    // 64-bit signature; bits 0..31 live in sig_lo, 32..63 in sig_hi —
    // a chunk spanning the boundary stitches both halves
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    def mask(w: Int): Long = if (w >= 64) -1L else (1L << w) - 1L
    val chunkCols = (0 until nChunks).map { c =>
      val s = bounds(c)
      val e = bounds(c + 1)
      val loBits = math.max(0, math.min(e, 32) - s)
      val hiBits = math.max(0, e - math.max(s, 32))
      val loPart = if (loBits > 0)
        Some(shiftrightunsigned(col("sig_lo"), s).bitwiseAND(lit(mask(loBits)))) else None
      val hiPart = if (hiBits > 0)
        Some(shiftrightunsigned(col("sig_hi"), math.max(s, 32) - 32)
          .bitwiseAND(lit(mask(hiBits)))) else None
      val v = (loPart, hiPart) match {
        case (Some(l), Some(h)) => l.bitwiseOR(shiftleft(h, loBits))
        case (Some(l), None) => l
        case (None, Some(h)) => h
        case _ => lit(0L)
      }
      struct(lit(c).as("chunk"), v.as("v"))
    }
    val chunks = sigs.select(col("doc_id"), col("sig_hi"), col("sig_lo"),
      explode(array(chunkCols: _*)).as("ck"))
      .select(col("doc_id"), col("sig_hi"), col("sig_lo"), col("ck.chunk"), col("ck.v"))
    val cands = chunks.as("x").join(chunks.as("y"), Seq("chunk", "v"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.sig_hi").as("ha"), col("x.sig_lo").as("la"),
        col("y.doc_id").as("b"), col("y.sig_hi").as("hb"), col("y.sig_lo").as("lb"))
      .distinct()
    val h = (bit_count(col("ha").bitwiseXOR(col("hb"))) +
      bit_count(col("la").bitwiseXOR(col("lb")))).cast("int")
    val tt = bit_count(col("ha").bitwiseAND(col("hb"))) +
      bit_count(col("la").bitwiseAND(col("lb")))
    cands
      .select(col("a").cast("long"), col("b").cast("long"),
        h.as("hamming"),
        round(lit(1.0) - (lit(64) - h) / (lit(64) + h).cast("double"), 4)
          .cast("double").as("rt_bits"),
        round(lit(1.0) - tt / lit(64.0), 4).cast("double").as("rr_bits"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  def simhashPairsOracleSql(maxHamming: Int = 3): String =
    s"""WITH sigs AS ($duckSimhashSigsSql),
       |p AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b,
       |         bit_count(xor(x.sig_hi, y.sig_hi)) + bit_count(xor(x.sig_lo, y.sig_lo)) AS h,
       |         bit_count(x.sig_hi & y.sig_hi) + bit_count(x.sig_lo & y.sig_lo) AS tt
       |  FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
       |)
       |SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       |       CAST(h AS INTEGER) AS hamming,
       |       CAST(round(1.0 - (64 - h) / CAST(64 + h AS DOUBLE), 4) AS DOUBLE) AS rt_bits,
       |       CAST(round(1.0 - tt / 64.0, 4) AS DOUBLE) AS rr_bits
       |FROM p WHERE h <= $maxHamming ORDER BY a, b""".stripMargin

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
    // argmax via min_by on (−score, lang) ≡ (score DESC, lang ASC) —
    // partial aggregation; the per-doc group is |langs| rows, but the
    // window form still sorted every group through one state store
    scored.groupBy(col("doc_id"))
      .agg(min_by(struct(col("lang"), col("score")),
        struct(negate(col("score")), col("lang"))).as("m"))
      .select(col("doc_id").cast("long"), col("m.lang").as("pred_lang"),
        col("m.score").cast("double").as("score"))
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
    docsPar(spark, sfDir)
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

  // ---------------------------------------------------------------- dup clusters

  /** Edge-count ceiling for broadcasting the pair graph. The honest
    * budget is the broadcast HASH RELATION, not raw field bytes: two
    * longs become ~24 B of UnsafeRow plus BytesToBytesMap overhead and
    * a driver-side collect, so 2M edges land near ~100 MB resident on
    * the driver and every executor — safe even at default driver
    * sizing. Past the cap the propagation join falls back to a shuffle
    * join on an edge set hash-partitioned ONCE (see below) — the
    * duplicate-pair set of a 10^12-doc corpus is corpus-relatively
    * tiny but absolutely large, the same reasoning as
    * [[NearDupSeq.BroadcastCapRows]].
    */
  val EdgeBroadcastCap = 2000000L

  /** Connected components over a near-dup pair graph: every document
    * mapped to the min doc_id of its duplicate component (singletons
    * map to themselves) — the cluster assignment a fuzzy-dedup
    * pipeline groups by to pick one representative per duplicate set.
    *
    * Iterative min-label propagation: each round joins the edge set
    * (the VERIFIED near-dup pairs — only the duplicate pairs, never
    * the corpus) against the current labels and takes the per-doc min
    * over {own label} ∪ {neighbor labels}. Under [[EdgeBroadcastCap]]
    * the edge side is broadcast; past it, it is hash-partitioned on
    * the join key ONCE and checkpointed, so every round's join reuses
    * that partitioning instead of re-shuffling the multi-GB edge
    * table per iteration. Converges in O(component diameter) rounds —
    * web duplicate clusters are shallow (most are 2–3 docs; the
    * alternating large-star/small-star contraction is the documented
    * upgrade if diameters ever grow). `localCheckpoint` cuts the
    * per-round lineage so the plan does not deepen with the iteration
    * count.
    */
  private[graft] def dupClustersFrom(allDocs: DataFrame, pairs: DataFrame): DataFrame = {
    val edgesRaw =
      pairs.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
        .union(pairs.select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
        .localCheckpoint()
    val edges =
      if (edgesRaw.count() <= EdgeBroadcastCap) broadcast(edgesRaw)
      // checkpoint AFTER the repartition: LogicalRDD keeps the output
      // partitioning, so the per-round join sees edges pre-clustered
      // on dst and only ever exchanges the labels side
      else edgesRaw.repartition(col("dst")).localCheckpoint()
    var labels = allDocs.select(col("doc_id").cast("long"),
      col("doc_id").cast("long").as("lbl")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, edges("dst") === labels("doc_id"))
        .select(col("src").as("doc_id"), col("lbl"))
      val next = labels.union(prop)
        .groupBy("doc_id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "doc_id")
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      labels = next
    }
    labels.select(col("doc_id"), col("lbl").as("cluster_id")).orderBy("doc_id")
  }

  /** Registry form: components over the [[minhashLsh]] verified pairs
    * (bucket → verify → cluster, the end-to-end fuzzy-dedup shape).
    */
  def dupClusters(spark: SparkSession, sfDir: String, tau: Double = 0.5): DataFrame =
    dupClustersFrom(
      docs(spark, sfDir).select(col("doc_id")),
      minhashLsh(spark, sfDir, tau).select(col("a"), col("b")))

  /** DuckDB oracle: the exact uncapped Jaccard pair set (the q14
    * oracle's CTE chain, banding-blind like the MinHash gate) closed
    * transitively by a recursive reachability CTE, min label per
    * component.
    */
  def dupClustersOracleSql(tau: Double = 0.5): String =
    s"""WITH RECURSIVE sh AS ($duckShinglesSql),
       |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM inv x JOIN inv y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
       |),
       |pairs AS (
       |  SELECT a, b,
       |         len(list_intersect(sa.shingles, sb.shingles)) AS inter,
       |         szA.n AS na, szB.n AS nb
       |  FROM cands
       |  JOIN sh sa ON sa.doc_id = a JOIN sh sb ON sb.doc_id = b
       |  JOIN sizes szA ON szA.doc_id = a JOIN sizes szB ON szB.doc_id = b
       |),
       |p AS (SELECT a, b FROM pairs WHERE round(inter / (na + nb - inter), 4) >= $tau),
       |edges AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
       |d AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
       |reach(a, b) AS (
       |  SELECT doc_id, doc_id FROM d
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
       |)
       |SELECT CAST(a AS BIGINT) AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- decontamination

  /** Held-out benchmark stride: docs with `doc_id % stride == 0` play
    * the role of the evaluation benchmark whose n-grams must not leak
    * into the training corpus. Derived deterministically from the
    * corpus itself so the operator and its DuckDB oracle see the same
    * split at every scale — in production the benchmark side is an
    * external table (MMLU/GSM8K/held-out eval suites), which only makes
    * the broadcast side SMALLER.
    */
  val BenchmarkIdStride = 97

  /** Benchmark decontamination — the training-data hygiene pass every
    * large-scale pipeline runs before training (n-gram overlap against
    * the eval suites, the GPT-3 appendix-C / PaLM "contamination"
    * check): a corpus doc is contaminated if it shares ≥ `minHits`
    * distinct token shingles with any benchmark doc. Returns
    * (doc_id, bench_hits) for contaminated docs.
    *
    * Scale shape: the benchmark shingle set is tiny relative to the
    * corpus (benchmarks are MBs against 100 TB), so it is BROADCAST —
    * the corpus side is one generate-shingles scan plus a map-side
    * combinable per-doc count; no corpus-sized shuffle anywhere. The
    * same shape holds when the benchmark side is an external table.
    */
  def decontaminate(spark: SparkSession, sfDir: String,
      minHits: Int = 1, stride: Int = BenchmarkIdStride): DataFrame =
    // checkpointed arrays: decontaminateFrom explodes the frame twice
    // (benchmark + corpus sides), and an unmaterialized frame would pay
    // the inferred-generate re-derivation each time (windowFrame doc)
    decontaminateFrom(docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint(),
      minHits, stride)

  /** Injectable-shingle form (see [[minhashLshFrom]]). */
  private[graft] def decontaminateFrom(sh: DataFrame,
      minHits: Int = 1, stride: Int = BenchmarkIdStride): DataFrame = {
    val bench = sh.filter(col("doc_id") % stride === 0)
      .select(explode(col("shingles")).as("shingle")).distinct()
    val corpus = sh.filter(col("doc_id") % stride =!= 0)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    corpus.join(broadcast(bench), "shingle")
      // shingles are distinct per doc, so count(*) IS the distinct
      // overlap size — no count(distinct) shuffle needed
      .groupBy("doc_id").agg(count(lit(1)).as("bench_hits"))
      .filter(col("bench_hits") >= minHits)
      .select(col("doc_id").cast("long"), col("bench_hits").cast("long"))
      .orderBy("doc_id")
  }

  def decontaminateOracleSql(minHits: Int = 1,
      stride: Int = BenchmarkIdStride): String =
    s"""WITH sh AS ($duckShinglesSql),
       |bench AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh
       |          WHERE doc_id % $stride = 0),
       |corpus AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
       |           WHERE doc_id % $stride <> 0)
       |SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       |       CAST(count(*) AS BIGINT) AS bench_hits
       |FROM corpus c JOIN bench b USING (shingle)
       |GROUP BY c.doc_id HAVING count(*) >= $minHits
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- repetition metrics

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1:
    * "duplicate n-gram fraction" / "top n-gram fraction" — the
    * repetition filters a quality pipeline applies after [[qualityScore]]'s
    * lexical ones): per doc, over its token 2-grams,
    * the fraction of 2-gram occurrences that are repeats and the share
    * held by the single most frequent 2-gram.
    *
    * Scale shape: pure per-row computation — the 2-gram multiset is
    * sorted and folded in ONE higher-order-function pass (run-length
    * over the sorted array gives distinct count and max multiplicity),
    * so the operator is a single corpus scan with NO shuffle at all;
    * the explode→groupBy(doc, gram) alternative shuffles one row per
    * token of the corpus. O(dl log dl) per doc, embarrassingly parallel.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame =
    repetitionFrom(docsPar(spark, sfDir))

  private[graft] def repetitionFrom(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        sort_array(when(size(col("t")) >= 2,
          expr("transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i]))"))
          .otherwise(array().cast("array<string>"))).as("g"))
      .select(col("doc_id"), size(col("g")).as("n2"),
        // run-length fold over the sorted grams: dst = distinct grams,
        // mx = longest run = max multiplicity (mx is updated on every
        // step, so a run completed earlier is already folded in)
        expr("""aggregate(g,
          struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS mx, 0L AS dst),
          (s, x) -> IF(s.prev IS NOT NULL AND x = s.prev,
            struct(x AS prev, s.run + 1L AS run,
                   greatest(s.mx, s.run + 1L) AS mx, s.dst AS dst),
            struct(x AS prev, 1L AS run,
                   greatest(s.mx, 1L) AS mx, s.dst + 1L AS dst)),
          s -> struct(s.mx AS top, s.dst AS dst))""").as("r"))
      .select(
        col("doc_id").cast("long"),
        col("n2").cast("long").as("n_2grams"),
        col("r.dst").as("distinct_2grams"),
        // ratios rounded from RAW doubles (see qualityScore's composite
        // note: pre-rounded terms land on .00005 boundaries)
        when(col("n2") === 0, lit(0.0)).otherwise(
          round((col("n2") - col("r.dst")) / col("n2").cast("double"), 4))
          .as("dup_2gram_frac"),
        when(col("n2") === 0, lit(0.0)).otherwise(
          round(col("r.top") / col("n2").cast("double"), 4))
          .as("top_2gram_frac"))
      .orderBy("doc_id")

  val repetitionOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]
      |    ELSE [] END AS g
      |  FROM t
      |), e AS (SELECT doc_id, unnest(g) AS gram FROM g WHERE len(g) > 0),
      |c AS (SELECT doc_id, gram, count(*) AS c FROM e GROUP BY 1, 2),
      |m AS (SELECT doc_id, sum(c) AS n2, count(*) AS d2, max(c) AS top
      |      FROM c GROUP BY 1)
      |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
      |       CAST(coalesce(m.n2, 0) AS BIGINT) AS n_2grams,
      |       CAST(coalesce(m.d2, 0) AS BIGINT) AS distinct_2grams,
      |       CAST(CASE WHEN coalesce(m.n2, 0) = 0 THEN 0.0
      |            ELSE round((m.n2 - m.d2) / CAST(m.n2 AS DOUBLE), 4) END
      |            AS DOUBLE) AS dup_2gram_frac,
      |       CAST(CASE WHEN coalesce(m.n2, 0) = 0 THEN 0.0
      |            ELSE round(m.top / CAST(m.n2 AS DOUBLE), 4) END
      |            AS DOUBLE) AS top_2gram_frac
      |FROM t LEFT JOIN m ON m.doc_id = t.doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- substring duplication

  /** Window width (tokens) for [[substringDup]]. Small enough to fire
    * on the fixture's 10–99-token docs; the production value (Lee et
    * al. use 50 BPE tokens) is a dial, the plan shape is identical.
    */
  val SubstringWindow = 5

  /** Exact substring-duplication coverage (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the exact-substring counterpart of the document-level sketches
    * q13–q15): a positional w-token window is DUPLICATED if its
    * string occurs ≥ 2 times anywhere in the corpus (another doc or a
    * second site in the same doc — the suffix-array criterion). Per
    * doc: window count, duplicated-window count, and the fraction of
    * the doc's tokens covered by the union of its duplicated windows
    * (the span a substring-dedup pass would cut).
    *
    * Scale shape: explode positional windows (one row per corpus
    * token) → map-side-combinable count per window string → equi-join
    * the duplicated set back to positions (join OUTPUT is bounded by
    * corpus positions — never pairwise like q13's candidate join) →
    * per-doc sorted-position fold for the interval union, the same
    * one-pass run-length trick as [[repetition]]. A hot boilerplate
    * window inflates only the combined count, not a reducer's row
    * count; AQE's skew split handles the join side. The window frame
    * is materialized once (localCheckpoint — it feeds both the dup
    * derivation and the position join; recomputing it would tokenize
    * the corpus twice).
    */
  def substringDup(spark: SparkSession, sfDir: String,
      w: Int = SubstringWindow): DataFrame =
    substringDupFrom(docs(spark, sfDir), w)

  /** Positional w-token window frame (doc_id, pos, win) — one row per
    * corpus token position that can start a window. Shared by the
    * measurement pass ([[substringDup]]) and the removal pass
    * ([[substringDedup]]).
    *
    * The window ARRAY column is localCheckpoint'ed BEFORE the explode.
    * This is load-bearing, not hygiene: `InferFiltersFromGenerate`
    * synthesizes `size(ws) > 0 AND isnotnull(ws)` from the explode and
    * pushes it through every intermediate project down to the scan —
    * where `ws` is no longer a column but the full inlined
    * tokenize+window expression (each slice(t, …) re-deriving t, i.e.
    * re-splitting the text per element), evaluated INTERPRETED
    * (higher-order functions are codegen-fallback) twice per row on
    * the pre-exchange split. Measured on the shingle twin of this
    * frame at sf0.1: 10.1 s → 0.19 s once the checkpoint blocks the
    * pushdown and the filter runs on the materialized array instead
    * (r6 SliceProbe; the same mechanism cost q56/q58/q59/q60/q64 their
    * r5 "weak" ratings). Callers get the exploded frame as a cheap
    * view — re-exploding the checkpointed arrays costs ~0.1 s, so the
    * exploded frame itself no longer needs its own checkpoint.
    */
  private def windowFrame(docsDf: DataFrame, w: Int): DataFrame =
    docsDf.select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"),
        when(size(col("t")) >= w, expr(
          s"transform(sequence(0, size(t) - $w), " +
            s"i -> struct(i AS pos, concat_ws(' ', slice(t, i + 1, $w)) AS win))"))
          .otherwise(expr("array()").cast("array<struct<pos:int,win:string>>"))
          .as("ws"))
      .localCheckpoint()
      .select(col("doc_id"), explode(col("ws")).as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.win").as("win"))

  private[graft] def substringDupFrom(docsDf0: DataFrame, w: Int): DataFrame = {
    // rebalance BEFORE the window derivation: a single-split input
    // serializes windowFrame, the checkpoint it feeds, and (via
    // checkpoint partitioning) every downstream map side — the r5
    // plan bug that put this family 5–10× over the q13 cost class
    val docsDf = docsDf0.repartition(
      docsDf0.sparkSession.sparkContext.defaultParallelism)
    val d = docsDf.select(col("doc_id"), toks.as("t"))
    val dims = d.select(col("doc_id"), size(col("t")).as("dl"),
      greatest(size(col("t")) - lit(w - 1), lit(0)).as("n_windows"))
    // windowFrame checkpoints its ARRAY column (see its scaladoc); the
    // exploded view is cheap to recompute for both references below
    val pos = windowFrame(docsDf, w)
    val dup = pos.groupBy("win").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("win")
    val perDoc = pos.join(dup, "win")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_windows"),
        sort_array(collect_list(col("pos"))).as("ps"))
      // interval-union length of [pos, pos+w) over sorted starts:
      // first window contributes w, each next min(w, gap)
      .select(col("doc_id"), col("dup_windows"),
        expr(s"""aggregate(ps,
          struct(CAST(-1 AS INT) AS prev, CAST(0 AS BIGINT) AS cov),
          (s, x) -> struct(x AS prev,
            s.cov + IF(s.prev < 0, CAST($w AS BIGINT),
                       least(CAST($w AS BIGINT), CAST(x - s.prev AS BIGINT)))),
          s -> s.cov)""").as("cov"))
    dims.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long"),
        col("n_windows").cast("long"),
        coalesce(col("dup_windows"), lit(0L)).cast("long").as("dup_windows"),
        when(col("dl") === 0, lit(0.0)).otherwise(
          round(coalesce(col("cov"), lit(0L)) / col("dl").cast("double"), 4))
          .as("dup_token_frac"))
      .orderBy("doc_id")
  }

  def substringDupOracleSql(w: Int = SubstringWindow): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents
       |),
       |dims AS (SELECT doc_id, len(t) AS dl,
       |                greatest(len(t) - ${w - 1}, 0) AS n_windows FROM t),
       |p AS (
       |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+${w - 1}], ' ') AS win
       |  FROM t, unnest(range(1, len(t) - $w + 2)) AS r(i)
       |  WHERE len(t) >= $w
       |),
       |dup AS (SELECT win FROM p GROUP BY win HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM p JOIN dup USING (win)),
       |agg AS (SELECT doc_id, count(*) AS dup_windows, list_sort(list(pos)) AS ps
       |        FROM dp GROUP BY doc_id),
       |cov AS (SELECT doc_id, dup_windows,
       |  $w + coalesce(list_sum([least($w, ps[i+1] - ps[i]) FOR i IN range(1, len(ps))]), 0) AS cov
       |  FROM agg)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |       CAST(d.n_windows AS BIGINT) AS n_windows,
       |       CAST(coalesce(c.dup_windows, 0) AS BIGINT) AS dup_windows,
       |       CAST(CASE WHEN d.dl = 0 THEN 0.0
       |            ELSE round(coalesce(c.cov, 0) / CAST(d.dl AS DOUBLE), 4) END
       |            AS DOUBLE) AS dup_token_frac
       |FROM dims d LEFT JOIN cov c USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- substring dedup (removal)

  /** The ACTIONABLE twin of [[substringDup]] — the substring-dedup
    * removal pass itself (Lee et al. 2022 cut all but one occurrence
    * of every duplicated span; q56 only measures what this cuts):
    * for each duplicated w-token window the canonical occurrence is
    * the lexicographically smallest (doc_id, pos); every OTHER
    * occurrence marks its token span [pos, pos+w) for removal, and
    * the cleaned doc is its surviving tokens in position order.
    * Output per doc: token count, removed-token count, cleaned text
    * (whitespace-normalized — all integer/string columns, so the
    * cross-engine gate is trivially bit-stable).
    *
    * Scale shape — fully relational, no per-row quadratic step: the
    * shared [[windowFrame]] (one row per corpus token) → per-window
    * count + min-struct canonical (ONE map-side-combinable aggregate,
    * no Window node) → non-canonical occurrences explode w drop
    * positions each (≤ w× corpus tokens, w a small constant) → LEFT
    * ANTI join against the posexploded token frame (the dedup itself)
    * → per-doc sort-collect rebuild. A naive per-doc mask loop would
    * be O(len·drops) per row — the tail doc (fully duplicated, 10k
    * tokens) turns quadratic; the anti-join shape stays linear in
    * corpus tokens no matter how duplicated one document is.
    */
  def substringDedup(spark: SparkSession, sfDir: String,
      w: Int = SubstringWindow): DataFrame =
    substringDedupFrom(docs(spark, sfDir), w)

  private[graft] def substringDedupFrom(docsDf0: DataFrame, w: Int): DataFrame = {
    // rebalance before derivation — see substringDupFrom
    val docsDf = docsDf0.repartition(
      docsDf0.sparkSession.sparkContext.defaultParallelism)
    val pos = windowFrame(docsDf, w) // array-checkpointed inside
    val canon = pos.groupBy("win")
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("c") >= 2)
      .select(col("win"), col("canon"))
    // duplicate right-side keys are harmless under an anti join, so
    // the overlapping drop spans need no distinct() shuffle
    val dropPos = pos.join(canon, "win")
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("pos") === col("canon.pos")))
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${w - 1})")).as("p"))
    val tokPos = docsDf
      .select(col("doc_id"), posexplode(toks).as(Seq("p", "tok")))
    val kept = tokPos.join(dropPos, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("clean_text"))
    docsDf.select(col("doc_id"), size(toks).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long"),
        col("n_tokens").cast("long"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  def substringDedupOracleSql(w: Int = SubstringWindow): String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+${w - 1}], ' ') AS win
       |  FROM t, unnest(range(1, len(t) - $w + 2)) AS r(i)
       |  WHERE len(t) >= $w
       |),
       |c AS (SELECT win, min(doc_id) AS cd FROM p GROUP BY win HAVING count(*) >= 2),
       |c2 AS (SELECT p.win, c.cd, min(p.pos) AS cp
       |       FROM p JOIN c ON p.win = c.win AND p.doc_id = c.cd
       |       GROUP BY p.win, c.cd),
       |drops AS (
       |  SELECT p.doc_id, r.pp AS pp
       |  FROM p JOIN c2 USING (win), unnest(range(p.pos, p.pos + $w)) AS r(pp)
       |  WHERE NOT (p.doc_id = c2.cd AND p.pos = c2.cp)
       |),
       |tok AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
       |        FROM t, unnest(range(1, len(t) + 1)) AS r(i)),
       |kept AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(tok, ' ' ORDER BY p) AS clean_text
       |  FROM tok k
       |  WHERE NOT EXISTS (SELECT 1 FROM drops d
       |                    WHERE d.doc_id = k.doc_id AND d.pp = k.p)
       |  GROUP BY doc_id
       |)
       |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       |       CAST(len(t.t) AS BIGINT) AS n_tokens,
       |       CAST(len(t.t) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
       |       coalesce(k.clean_text, '') AS clean_text
       |FROM t LEFT JOIN kept k USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- stratified sampling

  /** Per-language keep rates for [[sampleMix]] — the data-mixing dial
    * (up-weight high-resource quality strata, down-weight the rest).
    * Literal doubles parse identically on both engines.
    */
  val MixRates: Seq[(String, Double)] =
    Seq("en" -> 0.5, "fr" -> 0.4, "es" -> 0.4, "de" -> 0.25, "zh" -> 0.25)
  val MixDefaultRate = 0.1

  /** Salt for the sampling hash stream — a distinct stream per mixing
    * run (re-mixing with a new salt draws an independent sample). */
  val MixSalt = "mix1:"

  /** Deterministic stratified sampling — the data-mixing pass that
    * turns a filtered corpus into a training mix (per-language /
    * per-source rates, the GPT-3/LLaMA "sampling proportions" table):
    * keep doc iff u(doc_id) < rate(lang), where u ∈ [0,1) is the top
    * 52 bits of md5(salt ‖ doc_id) — a pure function of the row, so
    * the sample is reproducible run-to-run, engine-to-engine, and
    * STABLE under corpus growth (adding docs never flips an existing
    * doc's decision, unlike sample-by-rank schemes; Spark's own
    * `sample()` is partitioning-dependent, which is why it is not
    * used here).
    *
    * Scale shape: one scan, zero shuffle — a per-row filter of
    * codegen'd built-ins (md5 → hex prefix → integer). 52 bits keeps
    * the value exactly representable in a double, so u and the
    * comparison are bit-identical across engines (the splitmix64
    * family is NOT usable in a column here: its multiplies wrap mod
    * 2^64, which ANSI-mode long arithmetic rejects — the LSH planes
    * sidestep that by tabulating on the driver).
    */
  def sampleMix(spark: SparkSession, sfDir: String): DataFrame = {
    val h = conv(substring(md5(concat(lit(MixSalt), col("doc_id").cast("string"))), 1, 13),
      16, 10).cast("long")
    val u = h.cast("double") / lit(4503599627370496.0) // 2^52
    val rate = MixRates.foldLeft[Column](lit(MixDefaultRate)) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Corpus.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), u.as("u"), rate.as("rate"))
      .filter(col("u") < col("rate"))
      .select(col("doc_id").cast("long"), col("lang"), round(col("u"), 6).as("u"))
      .orderBy("doc_id")
  }

  def sampleMixOracleSql: String = {
    val rateCase = MixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""WITH u AS (
       |  SELECT doc_id, lang,
       |         CAST(CAST(concat('0x', substr(md5(concat('$MixSalt', CAST(doc_id AS VARCHAR))), 1, 13))
       |              AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS u
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, lang, u,
       |         CAST(CASE lang $rateCase ELSE $MixDefaultRate END AS DOUBLE) AS rate
       |  FROM u
       |)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |       CAST(round(u, 6) AS DOUBLE) AS u
       |FROM r WHERE u < rate ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- shingle novelty

  /** Corpus-level boilerplate/novelty signal: per doc, over its
    * distinct 3-token shingles, the mean corpus document frequency
    * (high = formulaic — template/boilerplate text shared by many
    * pages) and the fraction of shingles unique to this doc (high =
    * novel content). The corpus-statistics complement of the PER-ROW
    * quality heuristics (q17/q55): those see one doc, this sees the
    * doc against the collection — the cheap stand-in for a
    * perplexity filter, with integer-exact arithmetic instead of a
    * transcendental (cross-engine log ulp drift can flip a rounded
    * digit; integer df sums cannot).
    *
    * Scale shape: shingle explode → map-side-combinable df count
    * (shingles are distinct per doc so count(*) IS document
    * frequency) → equi-join df back to the exploded rows (output
    * bounded by corpus shingle occurrences) → per-doc integer sums.
    */
  def shingleNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    // rebalance before derivation ([[docsPar]]), checkpoint the ARRAY
    // frame — not the exploded one: the explode's inferred not-empty
    // filter otherwise re-derives the whole shingle expression at the
    // scan, interpreted, per row (see windowFrame's scaladoc; this was
    // r5's slowest bench entry at 10–24 s, ~1.3 s after the fix). The
    // exploded view is recomputed cheaply for its two consumers.
    val sh = docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint()
    val e = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val df = e.groupBy("shingle").agg(count(lit(1)).as("df"))
    val agg = e.join(df, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("df").as("s"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("u"))
    docs(spark, sfDir).select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_shingles"),
        when(coalesce(col("n"), lit(0L)) === 0, lit(0.0)).otherwise(
          round(col("s") / col("n").cast("double"), 4)).as("mean_shingle_df"),
        // a shingle-less doc is trivially all-novel
        when(coalesce(col("n"), lit(0L)) === 0, lit(1.0)).otherwise(
          round(col("u") / col("n").cast("double"), 4)).as("novelty"))
      .orderBy("doc_id")
  }

  val shingleNoveltyOracleSql: String =
    s"""WITH sh AS ($duckShinglesSql),
       |e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |df AS (SELECT shingle, count(*) AS df FROM e GROUP BY shingle),
       |agg AS (SELECT e.doc_id, count(*) AS n, sum(f.df) AS s,
       |        sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS u
       |        FROM e JOIN df f USING (shingle) GROUP BY e.doc_id)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_shingles,
       |  CAST(CASE WHEN coalesce(a.n, 0) = 0 THEN 0.0
       |       ELSE round(a.s / CAST(a.n AS DOUBLE), 4) END AS DOUBLE) AS mean_shingle_df,
       |  CAST(CASE WHEN coalesce(a.n, 0) = 0 THEN 1.0
       |       ELSE round(a.u / CAST(a.n AS DOUBLE), 4) END AS DOUBLE) AS novelty
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- source overlap

  /** Cross-source contamination matrix: for every pair of sources,
    * the count of 3-token shingles both emit and the Jaccard of their
    * shingle vocabularies — the crawl-curation audit that says WHICH
    * feeds duplicate each other (mirror sites, syndication networks)
    * before any per-document pass runs. Pairs with zero shared
    * shingles are omitted (their Jaccard is 0 by definition and at
    * web scale the absent-pair set is the quadratic bulk).
    *
    * Scale shape: the pair space is SOURCES², not documents² — a
    * catalog-sized constant (a crawl has thousands of feeds, not
    * billions). Distinct (source, shingle) via one hash-agg, then a
    * self equi-join on shingle whose per-key output is bounded by
    * sources² regardless of how many documents share the shingle —
    * the unbounded-df hazard of the q13 doc-level join does not exist
    * here, so no df cap is needed. AQE's skew split handles the
    * all-sources boilerplate shingles.
    */
  def sourceOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Corpus.documents(spark, sfDir).select(col("doc_id"), col("source"))
    // rebalance before derivation ([[docsPar]]) and checkpoint the
    // shingle ARRAYS before the explode (see windowFrame's scaladoc —
    // the inferred-generate filter otherwise re-derives the shingle
    // expression at the scan); the source join stays a broadcast of
    // the (doc_id, source) side
    val e = docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint()
      .join(src, "doc_id")
      .select(col("source"), explode(col("shingles")).as("shingle"))
      .distinct()
      .localCheckpoint() // feeds totals + both join sides; one derivation
    val tot = e.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = e.as("a").join(e.as("b"), "shingle")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(tot.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(tot.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared").cast("long"),
        round(col("shared") / (col("na") + col("nb") - col("shared")), 4)
          .cast("double").as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  val sourceOverlapOracleSql: String =
    s"""WITH sh AS ($duckShinglesSql),
       |e AS (
       |  SELECT DISTINCT d.source, s.shingle
       |  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh) s
       |  JOIN documents d USING (doc_id)
       |),
       |tot AS (SELECT source, count(*) AS n FROM e GROUP BY source),
       |shared AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
       |  FROM e a JOIN e b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY a.source, b.source
       |)
       |SELECT s.src_a, s.src_b, CAST(s.shared AS BIGINT) AS shared,
       |       CAST(round(s.shared / (ta.n + tb.n - s.shared), 4) AS DOUBLE) AS jaccard
       |FROM shared s
       |JOIN tot ta ON ta.source = s.src_a
       |JOIN tot tb ON tb.source = s.src_b
       |ORDER BY src_a, src_b""".stripMargin

  // ---------------------------------------------------------------- line-level boilerplate removal

  /** Body tokens per synthesized line (see [[lineFrame]]). */
  val LineLen = 12

  /** Corpus doc-frequency at or above which a line is boilerplate.
    * At fixture scale each source holds ≥ 25 docs, so the synthesized
    * per-source header/footer clears this while genuine body lines
    * (df ≤ the exact-duplicate multiplicity, 2–3) never do.
    */
  val BoilerplateDf = 10

  /** Deterministic line synthesis: the fixture text is one flat token
    * run, so the line structure this operator exists for — a shared
    * per-source header and footer around distinct body lines — is
    * rebuilt per row as a pure function of (doc_id, source, text): one
    * subscribe-header, the body chunked into [[LineLen]]-token lines,
    * one copyright-footer. The DuckDB oracle reconstructs the identical
    * frame. Output: (doc_id, pos, line), one row per line occurrence.
    */
  private def lineFrame(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), col("source"), toks.as("t"))
      .select(col("doc_id"),
        concat(
          array(concat(lit("subscribe to the "), col("source"), lit(" newsletter"))),
          when(size(col("t")) > 0, expr(
            s"transform(sequence(1, (size(t) + ${LineLen - 1}) div $LineLen), " +
              s"i -> concat_ws(' ', slice(t, (i - 1) * $LineLen + 1, $LineLen)))"))
            .otherwise(expr("array()").cast("array<string>")),
          array(concat(lit("copyright "), col("source"), lit(" all rights reserved"))))
          .as("lines"))
      // checkpoint the line ARRAYS before the explode — same inferred-
      // generate re-derivation hazard as windowFrame (see its scaladoc)
      .localCheckpoint()
      .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))

  /** q64: line-frequency boilerplate removal — the CCNet/RefinedWeb
    * line-dedup pass: a line occurring in ≥ [[BoilerplateDf]] distinct
    * documents is boilerplate (navigation, subscribe prompts,
    * copyright footers) and every occurrence is cut; the cleaned doc
    * is its surviving lines in order. Complements [[substringDedup]]
    * (which keeps one canonical occurrence of long duplicated SPANS):
    * boilerplate lines are short, line-aligned, and wanted ZERO times.
    *
    * Scale shape: line synthesis is per-row; the doc-frequency pass is
    * ONE hash aggregation keyed by line (count-distinct doc_id — the
    * partial-agg two-phase shape); the boilerplate set joins back via
    * LEFT ANTI on the line frame (join output bounded by corpus lines
    * — never pairwise), then a per-doc sort-collect rebuild, the same
    * fold as [[substringDedup]]. The boilerplate relation is
    * corpus-relatively tiny (each member is by definition shared by
    * ≥ [[BoilerplateDf]] docs, so it has ≤ lines/df members) but can be
    * absolutely large at 10^12 docs, so it is NOT force-broadcast —
    * AQE decides, exactly the [[EdgeBroadcastCap]] reasoning. A single
    * mega-hot line (a site-wide footer) skews only the count aggregate,
    * which the map-side partials absorb.
    */
  def lineDedup(spark: SparkSession, sfDir: String): DataFrame =
    lineDedupFrom(Corpus.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")))

  private[graft] def lineDedupFrom(docsDf0: DataFrame): DataFrame = {
    // rebalance before derivation — see substringDupFrom
    val docsDf = docsDf0.repartition(
      docsDf0.sparkSession.sparkContext.defaultParallelism)
    val lf = lineFrame(docsDf) // array-checkpointed inside; cheap view
    val boiler = lf.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= BoilerplateDf)
      .select("line")
    val kept = lf.join(boiler, Seq("line"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("clean_text"))
    lf.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id").cast("long"),
        col("n_lines").cast("long"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  def lineDedupOracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |  FROM documents
       |),
       |l AS (
       |  SELECT doc_id,
       |    ['subscribe to the ' || source || ' newsletter'] ||
       |    [array_to_string(t[(i - 1) * $LineLen + 1 : i * $LineLen], ' ')
       |     FOR i IN range(1, (len(t) + ${LineLen - 1}) // $LineLen + 1)] ||
       |    ['copyright ' || source || ' all rights reserved'] AS lines
       |  FROM t
       |),
       |lf AS (SELECT doc_id, i - 1 AS pos, lines[i] AS line
       |       FROM l, unnest(range(1, len(lines) + 1)) AS r(i)),
       |b AS (SELECT line FROM lf GROUP BY line
       |      HAVING count(DISTINCT doc_id) >= $BoilerplateDf),
       |kept AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(line, chr(10) ORDER BY pos) AS clean_text
       |  FROM lf WHERE line NOT IN (SELECT line FROM b)
       |  GROUP BY doc_id
       |),
       |dims AS (SELECT doc_id, count(*) AS n_lines FROM lf GROUP BY doc_id)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |       CAST(d.n_lines AS BIGINT) AS n_lines,
       |       CAST(d.n_lines - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
       |       coalesce(k.clean_text, '') AS clean_text
       |FROM dims d LEFT JOIN kept k USING (doc_id) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- end-to-end clean pipeline

  /** Quality floor / repetition cap for [[cleanPipeline]] — fixture
    * dials (the fixture's quality range is 0.55–0.74 and its
    * dup-2gram fractions top out near 0.13; production values — e.g.
    * Gopher's 0.2 duplicate-2-gram cap — are the same dial turned for
    * real web text).
    */
  val CleanQualityFloor = 0.6
  val CleanRepetitionCap = 0.1

  /** q65: the end-to-end corpus-cleaning verdict — the composition
    * every training-data pipeline actually runs, stage by stage, with
    * the FIRST failing stage as each document's drop reason:
    * benchmark split-out → exact dedup (non-canonical copies) →
    * fuzzy dedup (non-representative cluster members) → benchmark
    * decontamination → quality floor → repetition cap → kept. Each
    * stage IS the already-oracled operator (q12, q53, q54, q17, q55)
    * — this query exists to prove the pieces compose into one plan,
    * not to re-implement them.
    *
    * Scale shape: five stage frames joined on doc_id — every join is
    * an equi-join on the corpus key (no pair space beyond what the
    * member stages already bound), and the verdict is one per-row
    * CASE. The expensive stages (LSH clustering, decontamination)
    * keep their own documented shapes; composition adds only
    * doc_id-keyed joins that AQE plans as broadcasts once the stage
    * outputs are filtered small.
    */
  def cleanPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir).select(col("doc_id").cast("long"))
    // ONE checkpointed shingle frame feeds both shingle consumers —
    // fuzzy dedup (LSH + verify) and decontamination; composing the
    // public entry points instead would tokenize + shingle the corpus
    // twice (the cost docShingles' own comment quantifies)
    val sh = docShinglesFrom(docsPar(spark, sfDir)).localCheckpoint()
    val exact = dedupExact(spark, sfDir)
    val clus = dupClustersFrom(d,
      minhashLshFrom(spark, sh, tau = 0.5).select(col("a"), col("b")))
    val cont = decontaminateFrom(sh)
    val qual = qualityScore(spark, sfDir).select(col("doc_id"), col("quality"))
    val rep = repetition(spark, sfDir)
      .select(col("doc_id"), col("dup_2gram_frac"))
    d.join(exact, Seq("doc_id"))
      .join(clus, Seq("doc_id"))
      .join(cont, Seq("doc_id"), "left")
      .join(qual, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") % BenchmarkIdStride === 0, lit("benchmark"))
          .when(col("canonical_id") =!= col("doc_id"), lit("exact_dup"))
          .when(col("cluster_id") =!= col("doc_id"), lit("near_dup"))
          .when(coalesce(col("bench_hits"), lit(0L)) >= 1, lit("contaminated"))
          .when(col("quality") < CleanQualityFloor, lit("low_quality"))
          .when(col("dup_2gram_frac") > CleanRepetitionCap, lit("repetitive"))
          .otherwise(lit("kept")).as("verdict"))
      .orderBy("doc_id")
  }

  /** DuckDB twin: the member queries' own oracle SQL, verbatim, as
    * subqueries — the oracle composes exactly the way the operator
    * does.
    */
  def cleanPipelineOracleSql: String =
    s"""WITH exact AS (SELECT * FROM ($dedupExactOracleSql) _e),
       |clus AS (SELECT * FROM (${dupClustersOracleSql()}) _c),
       |cont AS (SELECT * FROM (${decontaminateOracleSql()}) _x),
       |qual AS (SELECT * FROM ($qualityScoreOracleSql) _q),
       |rep AS (SELECT * FROM ($repetitionOracleSql) _r)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       |  CASE WHEN d.doc_id % $BenchmarkIdStride = 0 THEN 'benchmark'
       |       WHEN e.canonical_id <> d.doc_id THEN 'exact_dup'
       |       WHEN c.cluster_id <> d.doc_id THEN 'near_dup'
       |       WHEN coalesce(ct.bench_hits, 0) >= 1 THEN 'contaminated'
       |       WHEN q.quality < $CleanQualityFloor THEN 'low_quality'
       |       WHEN r.dup_2gram_frac > $CleanRepetitionCap THEN 'repetitive'
       |       ELSE 'kept' END AS verdict
       |FROM documents d
       |JOIN exact e USING (doc_id)
       |JOIN clus c USING (doc_id)
       |LEFT JOIN cont ct USING (doc_id)
       |JOIN qual q USING (doc_id)
       |JOIN rep r USING (doc_id)
       |ORDER BY doc_id""".stripMargin
}
