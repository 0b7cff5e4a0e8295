package graft

import graft.operators.WebOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization + capture dedup / change detection: golden
  * canonicalization cases, the keep-newest rule, version counting, and
  * the single-aggregation plan shape.
  */
class WebOpsSpec extends AnyFunSuite {
  private val dir = TestSpark.Sf0001
  private val E = graft.corpus.Corpus.WarcEpochSeconds

  test("canonicalizeUrl golden cases") {
    val spark = TestSpark.spark
    import spark.implicits._
    val cases = Seq(
      // scheme+host lowercase, default port, tracking params, fragment,
      // trailing slash — the full gauntlet
      "HTTPS://HOST3.EXAMPLE:443/p9?utm_source=rss&utm_medium=feed#top"
        -> "https://host3.example/p9",
      "https://host1.example/p21/?ref=share" -> "https://host1.example/p21",
      // path case is significant and preserved
      "https://Host.Example/CaseSensitive/Path" -> "https://host.example/CaseSensitive/Path",
      // http default port; non-default port survives
      "HTTP://a.example:80/x" -> "http://a.example/x",
      "https://a.example:8443/x" -> "https://a.example:8443/x",
      // a real (non-tracking) param survives, tracking neighbors go
      "https://a.example/x?id=7&utm_campaign=z" -> "https://a.example/x?id=7",
      "https://a.example/x?utm_campaign=z&id=7" -> "https://a.example/x?id=7",
      // untouched urls stay untouched
      "https://a.example/x?id=7" -> "https://a.example/x?id=7",
      // tracking match is anchored to a param boundary: href/xref and
      // path segments that merely CONTAIN "ref=" survive
      "https://a.example/x?href=7" -> "https://a.example/x?href=7",
      "https://a.example/x?xref=1&id=2" -> "https://a.example/x?xref=1&id=2",
      "https://a.example/ref=abc/page" -> "https://a.example/ref=abc/page",
      // :80 is default ONLY for http — other schemes keep their port
      "ftp://h.example:80/x" -> "ftp://h.example:80/x",
      // trailing-slash strip is path-only: query values keep '/' and '?'
      "https://a.example/x/?next=/a/" -> "https://a.example/x?next=/a/",
      "https://a.example/x?next=/a/?z=1" -> "https://a.example/x?next=/a/?z=1")
    val got = cases.map(_._1).toDF("url")
      .select(WebOps.canonicalizeUrl(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2), s"canonicalization mismatch: $got")
  }

  test("urlDedup: one row per doc, newest capture kept, counts by residue") {
    val spark = TestSpark.spark
    val rows = WebOps.urlDedup(spark, dir).collect()
    val n = graft.corpus.Corpus.documents(spark, dir).count()
    assert(rows.length == n, "every doc keeps exactly one canonical url")
    rows.foreach { r =>
      val (id, url, caps, kept) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      assert(url == s"https://host${id % 10}.example/p$id")
      val expCaps = 1 + (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(caps == expCaps, s"doc $id captures")
      // newest wins: re-crawl (+1d) > share link (+1h) > base
      val expKept =
        if (id % 3 == 0) E + id + 86400
        else if (id % 5 == 0) E + id + 3600
        else E + id
      assert(kept == expKept, s"doc $id kept_ts")
    }
  }

  test("captureDiff: versions flag exactly the re-crawled (changed) docs") {
    val spark = TestSpark.spark
    val rows = WebOps.captureDiff(spark, dir).collect()
    rows.foreach { r =>
      val (id, caps, vers, first, last) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expVers = if (id % 3 == 0) 2 else 1
      assert(vers == expVers, s"doc $id versions")
      assert(first == E + id, s"doc $id first_ts is the base capture")
      assert(last >= first && caps >= vers)
    }
  }

  test("captures' base capture is exactly the north-rule page table row") {
    val spark = TestSpark.spark
    // the clean base capture must stay tied to Corpus.pages (url + ts):
    // captures/capturesSql synthesize the same shape independently, so
    // this anti-join is the tripwire against silent drift — every
    // north-rule page row must appear verbatim among the captures
    val caps = WebOps.captures(spark, dir).select(col("url"), col("ts"))
    val pages = graft.corpus.Corpus.pages(spark, dir)
      .select(col("url"), unix_timestamp(col("warc_ts")).as("ts"))
    assert(pages.join(caps, Seq("url", "ts"), "left_anti").count() == 0,
      "a Corpus.pages row has no matching base capture — shapes drifted")
  }

  test("domain stats: per-host rollup matches the capture synthesis residues") {
    val spark = TestSpark.spark
    val docs = graft.corpus.Corpus.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = WebOps.domainStats(spark, dir).collect()
    assert(rows.length == 10, "ten synthesized hosts")
    val byHost = docs.groupBy(_._1 % 10)
    val capsByHost = byHost.view.mapValues(_.map { case (id, _) =>
      1 + (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0) }.sum).toMap
    // versions = DISTINCT texts over the host's captures (exact-dup
    // docs share text, so per-doc summing would overcount)
    val versByHost = byHost.view.mapValues(ds =>
      (ds.map(_._2) ++ ds.collect { case (id, t) if id % 3 == 0 => t + " updated" })
        .distinct.size).toMap
    rows.foreach { r =>
      val h = r.getString(0)
      assert(h.matches("host\\d\\.example"), s"host shape: $h")
      val residue = h.drop(4).takeWhile(_.isDigit).toLong
      assert(r.getLong(1) == capsByHost(residue), s"$h capture count")
      assert(r.getLong(2) == byHost(residue).length, s"$h doc count")
      assert(r.getLong(3) == versByHost(residue), s"$h version count")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0, s"$h mean quality")
    }
    // one aggregation, doc-keyed quality join, no pair space
    val plan = WebOps.domainStats(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "domain stats plan is pair-free")
  }

  test("pii scrub: counts by residue, placeholders substituted, nothing leaks") {
    val spark = TestSpark.spark
    val rows = WebOps.piiScrub(spark, dir).collect()
    val n = graft.corpus.Corpus.documents(spark, dir).count()
    assert(rows.length == n)
    val ipRe = """\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}""".r
    rows.foreach { r =>
      val (id, ct) = (r.getLong(0), r.getString(4))
      assert(r.getLong(1) == 1 + (if (id % 4 == 0) 1 else 0), s"doc $id emails")
      assert(r.getLong(2) == (if (id % 3 == 0) 1 else 0), s"doc $id ips")
      assert(r.getLong(3) == (if (id % 5 == 0) 1 else 0), s"doc $id phones")
      // every planted item redacted, none of the raw forms survive
      assert(!ct.contains("@") && !ct.contains("+1-555"), s"doc $id leaked: $ct")
      assert(ipRe.findFirstIn(ct).isEmpty, s"doc $id leaked an ip")
      assert(ct.contains("<EMAIL>"))
      assert((id % 3 == 0) == ct.contains("<IP>"))
      assert((id % 5 == 0) == ct.contains("<PHONE>"))
    }
  }

  test("pii scrub plan: map-only — no join, no aggregate, no window") {
    val spark = TestSpark.spark
    val plan = WebOps.piiScrub(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate") &&
      !plan.contains("Window"),
      "pii scrub must stay a per-row projection (orderBy is the only exchange)")
  }

  test("plan shape: per-row canonicalization + one aggregation, no joins") {
    val spark = TestSpark.spark
    for (df <- Seq(WebOps.urlDedup(spark, dir), WebOps.captureDiff(spark, dir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), "no cartesian")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
        "no join anywhere — the capture union feeds one hash aggregate")
      assert(!plan.contains("Window"), "no window node")
    }
  }
}
