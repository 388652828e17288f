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
}
