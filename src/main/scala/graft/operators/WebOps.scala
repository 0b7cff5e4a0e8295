package graft.operators

import graft.corpus.Corpus
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-curation operators over the north-rule page shape (url,
  * warc_ts, …): URL canonicalization + capture dedup, and re-crawl
  * change detection. These are the URL-keyed complement of the
  * content-keyed dedup family in [[TextOps]] (the reference's neardup
  * assigns items to a COVER element, /root/reference/src/neardup.jl:40-118;
  * here the cover key is the canonical URL and the kept element is the
  * newest capture — the standard crawl rule).
  *
  * The fixture corpus has exactly one clean URL per document
  * ([[Corpus.pages]]), so the messy reality these operators exist for —
  * tracking parameters, shouting hosts, default ports, fragments,
  * share-link trailing slashes, re-crawled captures — is synthesized
  * DETERMINISTICALLY per row by [[captures]] (pure function of doc_id;
  * the DuckDB oracles rebuild the identical capture set in SQL).
  *
  * Scale shapes: canonicalization is per-row codegen'd string/regex
  * built-ins (no UDF, no shuffle); both operators then take ONE
  * map-side-combinable hash aggregation keyed by canonical URL. No
  * joins, no windows, no pair space — at 10^12 captures the only
  * shuffle is the per-URL aggregate, and URL keys are near-unique so
  * there is no skew to salt.
  */
object WebOps {

  /** Deterministic crawl-capture synthesis: for every document the
    * clean base capture, plus for doc_id % 3 == 0 a LATER re-crawl
    * (+1 day) through a shouting-case host, explicit default port,
    * tracking query and fragment — with CHANGED content — and for
    * doc_id % 5 == 0 a share-link capture (+1 hour; trailing slash +
    * ref param, same content). Columns: doc_id, url, ts (epoch
    * seconds), text.
    */
  def captures(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Corpus.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val h = (col("doc_id") % 10).cast("string")
    val id = col("doc_id").cast("string")
    val e = lit(Corpus.WarcEpochSeconds)
    val base = d.select(col("doc_id"),
      concat(lit("https://host"), h, lit(".example/p"), id).as("url"),
      (e + col("doc_id")).cast("long").as("ts"), col("text"))
    val recrawl = d.filter(col("doc_id") % 3 === 0).select(col("doc_id"),
      concat(lit("HTTPS://HOST"), h, lit(".EXAMPLE:443/p"), id,
        lit("?utm_source=rss&utm_medium=feed#top")).as("url"),
      (e + col("doc_id") + 86400).cast("long").as("ts"),
      concat(col("text"), lit(" updated")).as("text"))
    val shared = d.filter(col("doc_id") % 5 === 0).select(col("doc_id"),
      concat(lit("https://host"), h, lit(".example/p"), id,
        lit("/?ref=share")).as("url"),
      (e + col("doc_id") + 3600).cast("long").as("ts"), col("text"))
    base.unionByName(recrawl).unionByName(shared)
  }

  /** The same capture set as a DuckDB CTE body (over `documents`). */
  private def capturesSql: String = {
    val e = Corpus.WarcEpochSeconds
    s"""SELECT doc_id,
       |       'https://host' || CAST(doc_id % 10 AS VARCHAR) || '.example/p' ||
       |         CAST(doc_id AS VARCHAR) AS url,
       |       CAST($e + doc_id AS BIGINT) AS ts, text
       |FROM documents
       |UNION ALL
       |SELECT doc_id,
       |       'HTTPS://HOST' || CAST(doc_id % 10 AS VARCHAR) || '.EXAMPLE:443/p' ||
       |         CAST(doc_id AS VARCHAR) || '?utm_source=rss&utm_medium=feed#top',
       |       CAST($e + doc_id + 86400 AS BIGINT), text || ' updated'
       |FROM documents WHERE doc_id % 3 = 0
       |UNION ALL
       |SELECT doc_id,
       |       'https://host' || CAST(doc_id % 10 AS VARCHAR) || '.example/p' ||
       |         CAST(doc_id AS VARCHAR) || '/?ref=share',
       |       CAST($e + doc_id + 3600 AS BIGINT), text
       |FROM documents WHERE doc_id % 5 = 0""".stripMargin
  }

  /** URL canonicalization, the industry-standard normalizations that
    * never change what a well-behaved server serves:
    * scheme+authority lowercased (path/query case is preserved — it is
    * significant), default port stripped (:443 on https, :80 on http —
    * and ONLY on those schemes; other schemes keep their port),
    * fragment stripped, tracking parameters removed (utm_*, ref —
    * anchored to a [?&] parameter boundary so `href=`/`xref=` and
    * path segments never match) with separator cleanup, trailing PATH
    * slashes dropped (the rest is split at the first '?' so query
    * values containing '/' or '?' are never rewritten). Pure per-row
    * built-ins (regexp is RE2-compatible: no lookarounds, no backrefs,
    * so the DuckDB twin is the same pattern text; only the group
    * backreference syntax differs — `$1` vs `\1`).
    */
  def canonicalizeUrl(u: Column): Column = {
    val pre0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest0 = u.substr(length(pre0) + lit(1), length(u))
    val preLo = lower(pre0)
    val pre = when(preLo.startsWith("https://"),
        regexp_replace(preLo, ":443$", ""))
      .when(preLo.startsWith("http://"),
        regexp_replace(preLo, ":80$", ""))
      .otherwise(preLo)
    val noFrag = regexp_replace(rest0, "#.*$", "")
    val noTrack =
      regexp_replace(noFrag, "([?&])(utm_[a-z]+|ref)=[^&#]*", "$1")
    val tidy = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "&&+", "&"), "\\?&+", "?"),
      "[?&]+$", "")
    // trailing-slash strip on the PATH only: split at the first '?'
    val path0 = regexp_extract(tidy, "^[^?]*", 0)
    val qs = tidy.substr(length(path0) + lit(1), length(tidy))
    concat(pre, regexp_replace(path0, "/+$", ""), qs)
  }

  /** The identical chain as DuckDB SQL over a column named `url`
    * (DuckDB regexp_replace is first-match unless flagged 'g'; Spark's
    * is always global — every multi-hit-capable pattern carries 'g').
    */
  private val canonicalizeSqlSteps: String =
    """c1 AS (SELECT *, regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*') AS pre,
      |              substr(url, length(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) + 1) AS rest
      |       FROM cap),
      |c2 AS (SELECT * EXCLUDE (pre, rest),
      |              CASE WHEN lower(pre) LIKE 'https://%'
      |                   THEN regexp_replace(lower(pre), ':443$', '')
      |                   WHEN lower(pre) LIKE 'http://%'
      |                   THEN regexp_replace(lower(pre), ':80$', '')
      |                   ELSE lower(pre) END AS pre,
      |              regexp_replace(rest, '#.*$', '') AS rest
      |       FROM c1),
      |c3 AS (SELECT * EXCLUDE (rest),
      |              regexp_replace(rest, '([?&])(utm_[a-z]+|ref)=[^&#]*', '\1', 'g') AS rest
      |       FROM c2),
      |c4 AS (SELECT * EXCLUDE (rest),
      |              regexp_replace(regexp_replace(regexp_replace(rest, '&&+', '&', 'g'), '\?&+', '?', 'g'), '[?&]+$', '') AS rest
      |       FROM c3),
      |canon AS (SELECT * EXCLUDE (url, pre, rest),
      |                 pre || regexp_replace(regexp_extract(rest, '^[^?]*'), '/+$', '') ||
      |                 substr(rest, length(regexp_extract(rest, '^[^?]*')) + 1) AS url
      |          FROM c4)""".stripMargin

  /** q61: URL-canonicalization dedup — one surviving capture per
    * canonical URL, the NEWEST by warc_ts (crawl freshness rule).
    * Output per canonical URL: owning doc, capture count, kept
    * timestamp. All integer/string columns — bit-stable by
    * construction.
    */
  def urlDedup(spark: SparkSession, sfDir: String): DataFrame =
    captures(spark, sfDir)
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("url"), col("ts"))
      .groupBy("url")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_captures"),
        max("ts").as("kept_ts"))
      .select(col("doc_id").cast("long"), col("url"),
        col("n_captures").cast("long"), col("kept_ts").cast("long"))
      .orderBy("doc_id")

  def urlDedupOracleSql: String =
    s"""WITH cap AS ($capturesSql),
       |$canonicalizeSqlSteps
       |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, url,
       |       CAST(count(*) AS BIGINT) AS n_captures,
       |       CAST(max(ts) AS BIGINT) AS kept_ts
       |FROM canon GROUP BY url ORDER BY doc_id""".stripMargin

  /** q62: re-crawl change detection — per canonical URL the capture
    * count, the number of DISTINCT content versions (by content hash),
    * and the capture-time span. n_versions > 1 is the freshness
    * signal: the page changed between crawls, so only the kept-newest
    * text should enter training data (q61 performs that cut).
    */
  def captureDiff(spark: SparkSession, sfDir: String): DataFrame =
    captures(spark, sfDir)
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("url"),
        col("ts"), md5(col("text")).as("h"))
      .groupBy("url")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_captures"),
        countDistinct(col("h")).as("n_versions"),
        min("ts").as("first_ts"), max("ts").as("last_ts"))
      .select(col("doc_id").cast("long"), col("url"),
        col("n_captures").cast("long"), col("n_versions").cast("long"),
        col("first_ts").cast("long"), col("last_ts").cast("long"))
      .orderBy("doc_id")

  def captureDiffOracleSql: String =
    s"""WITH cap AS ($capturesSql),
       |$canonicalizeSqlSteps
       |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, url,
       |       CAST(count(*) AS BIGINT) AS n_captures,
       |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_versions,
       |       CAST(min(ts) AS BIGINT) AS first_ts,
       |       CAST(max(ts) AS BIGINT) AS last_ts
       |FROM canon GROUP BY url ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- PII scrub

  /** PII patterns, shared verbatim by the Spark columns and the DuckDB
    * oracle (RE2-compatible subset: no lookarounds, no backrefs —
    * `\b`/`\d`/bounded `{m,n}` parse identically in Java regex and
    * RE2). Greedy `+` backtracking and leftmost-first alternation
    * agree between the engines on these patterns because no pattern
    * contains an alternation whose branches overlap.
    */
  val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val Ipv4Re = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val PhoneRe = """\+1-555-\d{4}"""

  /** Deterministic PII-laced text: every doc gains a contact email,
    * doc_id % 4 == 0 a second email, doc_id % 3 == 0 an IPv4 server
    * line, doc_id % 5 == 0 a phone number — pure function of
    * (doc_id, text), rebuilt identically by [[piiTextSql]]. The fixture
    * text itself contains no digits or '@' (verified against the
    * generator output), so the synthesized occurrences are exactly the
    * pattern population.
    */
  private def piiText: Column = {
    val id = col("doc_id").cast("string")
    concat(col("text"),
      lit(" contact user"), id, lit("@mail"),
      (col("doc_id") % 10).cast("string"), lit(".example for details"),
      when(col("doc_id") % 4 === 0,
        concat(lit(" or admin"), id, lit("@ops.example"))).otherwise(lit("")),
      when(col("doc_id") % 3 === 0,
        concat(lit(" server 10."), (col("doc_id") % 256).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"), lit("."),
          (col("doc_id") % 254 + 1).cast("string"), lit(" logged")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
  }

  /** The identical synthesis as a DuckDB expression over `documents`. */
  private def piiTextSql: String =
    """text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' ||
      |  CAST(doc_id % 10 AS VARCHAR) || '.example for details' ||
      |  CASE WHEN doc_id % 4 = 0
      |       THEN ' or admin' || CAST(doc_id AS VARCHAR) || '@ops.example' ELSE '' END ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
      |            CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
      |            CAST(doc_id % 254 + 1 AS VARCHAR) || ' logged' ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |       ELSE '' END""".stripMargin

  /** q63: PII redaction — the standard pre-training scrub (emails,
    * IPv4 addresses, phone numbers replaced by typed placeholder
    * tokens, with per-type counts for the removal report). The
    * reference curates vector corpora, not text, so this operator is
    * pure pipeline surface; its redaction rule is the C4/FineWeb
    * class: regex-match, replace with a stable token, count what was
    * cut.
    *
    * Scale shape: entirely per-row codegen'd regexp built-ins — no
    * UDF, no join, no aggregate, no shuffle beyond the final orderBy
    * (which exists only for the oracle gate; the pipeline form is the
    * unordered projection). At 10^12 docs this is a map-only pass that
    * fuses into whatever scan feeds it. Scrub order (email → ip →
    * phone) is fixed but immaterial: the patterns cannot overlap, and
    * counts are taken on the PRE-scrub text.
    */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.documents(spark, sfDir)
      .select(col("doc_id"), piiText.as("pii"))
      .select(col("doc_id").cast("long"),
        size(regexp_extract_all(col("pii"), lit(EmailRe), lit(0)))
          .cast("long").as("n_email"),
        size(regexp_extract_all(col("pii"), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ip"),
        size(regexp_extract_all(col("pii"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phone"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("pii"), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>").as("clean_text"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- per-domain stats

  /** q66: per-domain crawl rollup — the blocklist/allowlist decision
    * table every crawl-curation pipeline maintains: for each host
    * (authority of the canonical URL, port and scheme stripped) the
    * capture count, distinct documents, distinct content versions,
    * and the mean quality of its docs ([[TextOps.qualityScore]]'s
    * composite). A domain whose docs are low-quality or whose
    * captures are all one boilerplate version is cut wholesale — at
    * the domain level, not per doc.
    *
    * Scale shape: host extraction is per-row regexp; the rollup is
    * ONE hash aggregate keyed by host (map-side combinable — count,
    * count distinct over md5, sum/count for the mean); the quality
    * join is doc_id-keyed, bounded by captures. Hosts are the classic
    * skew key (one mega-domain), but the skewed operation here is a
    * partial-aggregated count — no per-host row explosion anywhere.
    */
  def domainStats(spark: SparkSession, sfDir: String): DataFrame = {
    // quality re-scaled to an exact integer (it is round(·,4) per doc,
    // so ×10000 is integral up to float ulp): the per-host mean is then
    // an INTEGER sum ÷ count — bit-stable under any partitioning, where
    // avg(double) would depend on partial-aggregation order
    val q = graft.operators.TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"),
        round(col("quality") * 10000, 0).cast("long").as("q4"))
    captures(spark, sfDir)
      .select(col("doc_id"), col("text"),
        regexp_extract(lower(canonicalizeUrl(col("url"))),
          "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1).as("host"))
      .join(q, "doc_id")
      .groupBy("host")
      .agg(count(lit(1)).as("n_captures"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_versions"),
        sum(col("q4")).as("sq4"))
      .select(col("host"), col("n_captures").cast("long"),
        col("n_docs").cast("long"), col("n_versions").cast("long"),
        round(col("sq4") / (col("n_captures") * 10000.0), 4)
          .cast("double").as("mean_quality"))
      .orderBy("host")
  }

  def domainStatsOracleSql: String =
    s"""WITH cap AS ($capturesSql),
       |$canonicalizeSqlSteps,
       |q AS (
       |  SELECT doc_id,
       |    CAST(round(round(0.4 * (len(list_distinct(t)) / CAST(len(t) AS DOUBLE))
       |      + 0.3 * (1.0 - len(list_filter(t, x -> x = 'the' OR x = 'a')) / CAST(len(t) AS DOUBLE))
       |      + 0.3 * least(1.0, len(t) / 100.0), 4) * 10000, 0) AS BIGINT) AS q4
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
       |        FROM documents)
       |),
       |h AS (
       |  SELECT c.doc_id, c.text,
       |         regexp_extract(lower(c.url), '^[a-z][a-z0-9+.-]*://([^/:?#]*)', 1) AS host
       |  FROM canon c
       |)
       |SELECT h.host, CAST(count(*) AS BIGINT) AS n_captures,
       |       CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT md5(h.text)) AS BIGINT) AS n_versions,
       |       CAST(round(sum(q.q4) / (count(*) * 10000.0), 4) AS DOUBLE) AS mean_quality
       |FROM h JOIN q USING (doc_id)
       |GROUP BY h.host ORDER BY host""".stripMargin

  /** DuckDB twin (regexp_replace needs the 'g' flag — DuckDB is
    * first-match by default where Spark is always global).
    */
  def piiScrubOracleSql: String =
    s"""WITH pii AS (SELECT doc_id, $piiTextSql AS pii FROM documents)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |       CAST(len(regexp_extract_all(pii, '$EmailRe')) AS BIGINT) AS n_email,
       |       CAST(len(regexp_extract_all(pii, '$Ipv4Re')) AS BIGINT) AS n_ip,
       |       CAST(len(regexp_extract_all(pii, '$PhoneRe')) AS BIGINT) AS n_phone,
       |       regexp_replace(regexp_replace(regexp_replace(pii,
       |         '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
       |         '$PhoneRe', '<PHONE>', 'g') AS clean_text
       |FROM pii ORDER BY doc_id""".stripMargin
}
