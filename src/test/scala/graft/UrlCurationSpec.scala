package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.UrlCuration

class UrlCurationSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val nDocs = docs.count()

  test("urlCanonicalize: the synthetic corpus is messy and the canonical form is clean") {
    val c = UrlCuration.urlCanonicalize(docs)
    val rows = c.collect()
    assert(rows.length == nDocs)
    val raw = rows.map(_.getString(1))
    // the synthesizer must exercise every normalization the
    // canonicalizer claims to perform
    assert(raw.exists(_.contains("#top")), "some raw URLs carry fragments")
    assert(raw.exists(_.contains("WWW.")), "some raw URLs carry uppercase www")
    assert(raw.exists(_.contains(":80/")), "some raw URLs carry default ports")
    assert(raw.exists(_.contains(":8080")), "some raw URLs carry real ports")
    assert(raw.forall(_.contains("utm_source")), "tracking params everywhere")
    assert(raw.forall(_.contains("//docs/")), "duplicate slashes everywhere")
    val canon = rows.map(_.getString(2))
    canon.foreach { u =>
      assert(!u.contains("#"), s"fragment survived: $u")
      assert(!u.contains("utm_"), s"tracking param survived: $u")
      assert(!u.contains("www."), s"www prefix survived: $u")
      assert(!u.contains(":80/") && !u.contains(":443/"), s"default port survived: $u")
      val path = u.substring(u.indexOf("://") + 3)
      assert(!path.contains("//"), s"duplicate slash survived: $u")
      assert(!path.endsWith("/"), s"trailing slash survived: $u")
      assert(u == u.toLowerCase.replace(u.substring(u.indexOf("?") max 0),
        u.substring(u.indexOf("?") max 0)), "host/scheme lowercased")
      // params sorted: a= before z=
      val q = u.substring(u.indexOf("?") + 1)
      assert(q.split("&").sorted.sameElements(q.split("&")), s"params unsorted: $u")
    }
    // non-default ports are KEPT
    assert(canon.exists(_.contains(":8080")), "the :8080 port must survive")
    val domains = rows.map(_.getString(4)).toSet
    assert(domains == Set("example.com", "example.org"), domains.toString)
  }

  test("perHostCap: mirror and cap accounting is exact and conserves the corpus") {
    val r = UrlCuration.perHostCap(docs, cap = 8).collect()
    assert(r.length == 20, s"one row per host, got ${r.length}")
    var totDocs = 0L
    r.foreach { row =>
      val (nd, np, nk, nm, nc) = (row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5))
      assert(nd == np + nm, s"docs = pages + mirror drops: $row")
      assert(np == nk + nc, s"pages = kept + cap drops: $row")
      assert(nk <= 8, s"cap respected: $row")
      totDocs += nd
    }
    assert(totDocs == nDocs, "every doc lands in exactly one host")
    // the mirror synthesis is real: copies exist to drop
    assert(r.map(_.getLong(4)).sum > 0, "mirror duplicates must exist")
    assert(r.map(_.getLong(5)).sum > 0, "cap drops must exist")
  }

  test("hostShareAudit: exact bp shares, monotone cumulative, dense rank") {
    val r = UrlCuration.hostShareAudit(docs).collect()
    assert(r.length == 20)
    assert(r.map(_.getLong(1)).sum == nDocs)
    // integer-floor shares: sum ≤ 10000, each row consistent
    assert(r.map(_.getLong(3)).sum <= 10000L)
    assert(r.map(_.getInt(5)).toSeq == (1 to 20), "size_rank is 1..n in order")
    val cum = r.map(_.getLong(6))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b }, "cum monotone")
    assert(cum.last == r.map(_.getLong(3)).sum, "cum closes on the total")
    // n_docs non-increasing down the rank
    val nd = r.map(_.getLong(1))
    assert(nd.zip(nd.tail).forall { case (a, b) => a >= b })
    val tiers = r.map(_.getString(7)).toSet
    assert(tiers.subsetOf(Set("head", "torso", "tail")))
  }

  test("mirror pages collapse: same page served under different schemes/ports/params dedups") {
    // docs 0 and 40 share (section 0, page 0, source src0) → one
    // page_key; their CANON urls may differ (scheme kept), but q232
    // counts them as copies of one page. Verified through the public
    // surface: total pages < total docs by exactly the mirror-drop sum
    val cap = UrlCuration.perHostCap(docs, cap = 1000000).collect()
    val pages = cap.map(_.getLong(2)).sum
    val mirrors = cap.map(_.getLong(4)).sum
    assert(pages + mirrors == nDocs)
    assert(pages < nDocs, "canonicalization must merge mirror copies")
    // with an unbounded cap nothing is cap-dropped
    assert(cap.map(_.getLong(5)).sum == 0)
  }

  test("urlGateKeepers: doc-level filter reconciles with the q232 report") {
    // the gate's survivor count IS the report's n_kept sum — one is
    // the filter, the other the audit of the same decision
    val keepers = UrlCuration.urlGateKeepers(docs, cap = 8)
    val report = UrlCuration.perHostCap(docs, cap = 8).collect()
    assert(keepers.count() == report.map(_.getLong(3)).sum,
      "keeper docs must equal the per-host n_kept sum")
    // keepers are distinct real doc_ids
    assert(keepers.distinct().count() == keepers.count())
    assert(keepers.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    // with an unbounded cap the gate keeps exactly one doc per page
    val all = UrlCuration.urlGateKeepers(docs, cap = 1000000)
    assert(all.count() == report.map(_.getLong(2)).sum)
  }

  test("q242 hostQualityAudit: totals reconcile with the share audit and the gate") {
    val res = UrlCuration.hostQualityAudit(docs).collect()
    // one row per host, same host set as the share audit
    val shareHosts = UrlCuration.hostShareAudit(docs).collect()
      .map(_.getString(0)).toSet
    assert(res.map(_.getString(0)).toSet == shareHosts)
    assert(res.map(_.getLong(1)).sum == nDocs)
    assert(res.map(_.getLong(3)).sum ==
      graft.operators.TextAnalysis.gopherGateFilter(docs).count())
    res.foreach { r =>
      val (n, mq, g, gr) = (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(g <= n && mq >= 0.0 && mq <= 1.0, r.toString)
      assert(gr == math.floor(g.toDouble * 1e4 / n + 0.5) / 1e4, r.toString)
    }
  }

  test("q236 urlPipelineFunnel: per-source rows are monotone non-increasing") {
    val evalSet = docs.filter(col("doc_id") % 10 === 0)
    val rows = UrlCuration.urlPipelineFunnel(docs, evalSet).collect()
    assert(rows.nonEmpty)
    var input = 0L; var url = 0L; var kept = 0L
    rows.foreach { r =>
      val (ni, nu, ng, nd, nk) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
      assert(ni >= nu && nu >= ng && ng >= nd && nd >= nk,
        s"stage order violated: $r")
      input += ni; url += nu; kept += nk
    }
    assert(input == nDocs, "funnel must account every input doc")
    // a single SOURCE may legitimately lose everything to
    // decontamination on the tiny fixture; the corpus must not
    assert(kept > 0, "the whole corpus shipped nothing")
    // the URL stage must actually drop something on this corpus (it
    // has real mirrors), and the total matches the gate filter
    assert(url == UrlCuration.urlGateKeepers(docs, cap = 8).count())
    assert(url < input)
  }
}
